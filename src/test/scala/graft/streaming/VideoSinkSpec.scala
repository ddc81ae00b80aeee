package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Writer-pool semantics, mirroring the reference's only
  * integration-grade suite (tests/test_video_finalization_concurrency)
  * against the stub container. */
class VideoSinkSpec extends AnyFunSuite {

  private def tmp() = Files.createTempDirectory("graft-sink")

  test("single video: append + finalize produces a verifiable container") {
    val pool = new VideoSink.WriterPool(tmp())
    (0 until 10).foreach(i => pool.append("v1", Array.fill(16)(i.toByte)))
    val p = pool.finalizeVideo("v1").get
    assert(VideoSink.verify(p))
    assert(p.getFileName.toString == "v1_with_heatmaps.mp4")
  }

  test("finalize is idempotent: second close is a no-op") {
    val pool = new VideoSink.WriterPool(tmp())
    pool.append("v1", Array[Byte](1))
    assert(pool.finalizeVideo("v1").isDefined)
    assert(pool.finalizeVideo("v1").isEmpty)
  }

  test("multi-video init/write/finalize under external synchronization") {
    // Contract note: a WriterPool is owned by ONE task (it lives
    // inside mapPartitions); its internal map is deliberately not
    // thread-safe. This test's pool.synchronized models a caller
    // that shares one pool across threads — publish-time exclusivity
    // across INDEPENDENT pools is what the race test below pins.
    val dir = tmp()
    val pool = new VideoSink.WriterPool(dir)
    val threads = (0 until 4).map { t =>
      new Thread(() => (0 until 50).foreach { i =>
        pool.synchronized(pool.append(s"v$t", Array.fill(8)((t * 50 + i).toByte)))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val paths = pool.finalizeAll()
    assert(paths.size == 4)
    assert(paths.forall(VideoSink.verify))
    assert(pool.openCount == 0)
  }

  test("name collision bumps suffix (reference video_writer.py:44-58)") {
    val dir = tmp()
    val pool1 = new VideoSink.WriterPool(dir)
    pool1.append("v1", Array[Byte](1)); pool1.finalizeAll()
    val pool2 = new VideoSink.WriterPool(dir)
    pool2.append("v1", Array[Byte](2))
    val p = pool2.finalizeVideo("v1").get
    assert(p.getFileName.toString == "v1_with_heatmaps_1.mp4")
  }

  test("concurrent publishers of one video land on distinct names, none lost") {
    // rename(2) REPLACES an existing target on POSIX, so a move-based
    // claim would let one publisher silently overwrite the other's
    // published container; the hard-link claim makes the race a
    // suffix bump. Race two pools (a task and its speculative twin)
    // over the same video many times.
    val dir = tmp()
    (0 until 20).foreach { r =>
      val a = new VideoSink.WriterPool(dir)
      val b = new VideoSink.WriterPool(dir)
      a.append(s"v$r", Array[Byte](1)); b.append(s"v$r", Array[Byte](2))
      val results = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
      val ts = Seq(a, b).map(p => new Thread(() => results.add(p.finalizeVideo(s"v$r").get)))
      ts.foreach(_.start()); ts.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val paths = results.asScala.toSeq
      assert(paths.distinct.size == 2, s"round $r: both publishers claimed ${paths.head}")
      assert(paths.forall(p => Files.exists(p) && VideoSink.verify(p)))
    }
  }

  test("task retry: dead attempt's partial file never holds the canonical name") {
    val dir = tmp()
    val dead = new VideoSink.WriterPool(dir)
    dead.append("v1", Array.fill(100)(1.toByte)) // attempt dies mid-write: no finalize
    val retry = new VideoSink.WriterPool(dir)
    retry.append("v1", Array[Byte](7))
    val p = retry.finalizeVideo("v1").get
    // the retry's verified container claims the canonical name — no bump
    assert(p.getFileName.toString == "v1_with_heatmaps.mp4")
    assert(VideoSink.verify(p))
    // the dead attempt's leftover is janitor garbage, not published output
    val leftovers = Files.list(dir).toArray.map(_.toString).filter(_.contains("inprogress"))
    assert(leftovers.nonEmpty)
    assert(leftovers.forall(l => Paths.get(l).getFileName.toString.startsWith(".")))
  }

  test("codec probe follows the reference chain order") {
    assert(VideoSink.probeCodec(_ => true).contains("hevc"))
    assert(VideoSink.probeCodec(Set("mp4v")).contains("mp4v"))
    assert(VideoSink.probeCodec(Set("avc1", "mp4v")).contains("avc1"))
    assert(VideoSink.probeCodec(_ => false).isEmpty)
  }

  test("truncated file fails verification (moov-probe analog)") {
    val dir = tmp()
    val pool = new VideoSink.WriterPool(dir)
    pool.append("v1", Array.fill(100)(1.toByte))
    val p = pool.finalizeVideo("v1").get
    val bytes = Files.readAllBytes(p)
    Files.write(p, bytes.dropRight(3)) // chop the footer
    assert(!VideoSink.verify(p))
  }

  test("vacuumOrphans deletes only stale in-progress files") {
    val dir = tmp()
    // published container + a LIVE attempt's temp + a crashed
    // attempt's stale temp
    val pool = new VideoSink.WriterPool(dir)
    pool.append("v1", Array.fill(10)(1.toByte))
    val published = pool.finalizeVideo("v1").get
    val live = dir.resolve(".v2_with_heatmaps.mp4.inprogress-aaaa1111")
    val stale = dir.resolve(".v3_with_heatmaps.mp4.inprogress-bbbb2222")
    Files.write(live, Array[Byte](1))
    Files.write(stale, Array[Byte](2))
    val now = System.currentTimeMillis
    stale.toFile.setLastModified(now - 7200_000L) // 2h old
    val deleted = VideoSink.vacuumOrphans(dir, olderThanMs = 3600_000L, now = now)
    assert(deleted == Seq(stale))
    assert(Files.exists(live) && Files.exists(published))
    assert(!Files.exists(stale))
  }
}
