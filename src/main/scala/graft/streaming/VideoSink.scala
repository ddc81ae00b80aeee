package graft.streaming

import java.io.{DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable

/** Per-video MP4 sink (SURVEY.md §2.1 S12/S13), restructured for
  * distributed execution: open writer handles cannot live in
  * checkpointed state, so a partition-local writer pool keyed by
  * video_id lives in the sink (`foreachBatch`), with partition
  * affinity guaranteed upstream by the video_id hash partitioning.
  *
  * The actual MP4 muxing is STUBBED (no JavaCV/ffmpeg in this
  * container): `StubContainerWriter` writes a deterministic
  * length-prefixed frame container with a footer, and `finalize`
  * re-opens the file to verify the footer — the moov-atom probe
  * analog (reference streams/pipeline/video_writer.py:92-167). The
  * pool/finalize/idempotency semantics are real and tested; the
  * reflection-resolved [[graft.adapters.RuntimeAdapters.JavaCvContainerWriter]]
  * implements [[ContainerWriter]] against FFmpegFrameRecorder and
  * plugs into [[WriterPool]] via its `mkWriter` seam.
  */
object VideoSink {

  val Magic = 0x47524654 // "GRFT"
  val FooterMagic = 0x454e4421 // "END!"

  /** Codec preference chain, mirroring the reference's probe order
    * (streams/pipeline/video_writer.py:20-42). The stub accepts the
    * first; a real muxer would try each until one opens. */
  val codecChain: Seq[String] = Seq("hevc", "hvc1", "avc1", "H264", "mp4v")

  def probeCodec(available: String => Boolean): Option[String] =
    codecChain.find(available)

  trait ContainerWriter {
    def append(frame: Array[Byte]): Unit
    def framesWritten: Long
    def close(): Unit
    /** Post-close integrity probe for THIS writer's container format —
      * part of the contract so [[WriterPool.finalizeVideo]] verifies
      * whatever container the seam actually wrote (the stub's footer,
      * a real muxer's moov atom) instead of hard-coding the stub's. */
    def verify(path: Path): Boolean
  }

  final class StubContainerWriter(path: Path, codec: String) extends ContainerWriter {
    private val out = new DataOutputStream(new FileOutputStream(path.toFile))
    out.writeInt(Magic)
    out.writeUTF(codec)
    private var n = 0L
    def append(frame: Array[Byte]): Unit = {
      out.writeInt(frame.length); out.write(frame); n += 1
    }
    def framesWritten: Long = n
    def close(): Unit = { out.writeLong(n); out.writeInt(FooterMagic); out.close() }
    def verify(p: Path): Boolean = VideoSink.verify(p)
  }

  /** Partition-local pool of open writers keyed by video_id
    * (reference's video_writers dict, streams/stream.py:104-121).
    * `mkWriter` is the muxer seam: the default stub writes the
    * length-prefixed test container; on a jar-equipped cluster pass
    * `(p, _) => new RuntimeAdapters.JavaCvContainerWriter(p, w, h, fps)`
    * and every pool/finalize/publish semantic is unchanged.
    *
    * Task-commit discipline: frames stream into a per-attempt hidden
    * temp file; only a CLOSED, VERIFIED container is atomically moved
    * to its canonical name (suffix-bumped on genuine collision,
    * video_writer.py:44-58). A task retry or speculative twin
    * therefore can never leave a truncated file holding the canonical
    * name the upload path resolves — the dead attempt's `.inprogress-*`
    * leftover is janitor garbage, never published output.
    *
    * Threading contract: one pool per task (it lives inside
    * mapPartitions/foreachBatch) — the internal writer map is NOT
    * thread-safe; callers sharing a pool across threads must
    * synchronize. Publish-time exclusivity across DIFFERENT pools
    * (the retry/speculation race) is what the hard-link claim
    * guarantees. */
  final class WriterPool(
      outDir: Path,
      mkWriter: (Path, String) => ContainerWriter =
        (p, codec) => new StubContainerWriter(p, codec)) {
    Files.createDirectories(outDir)
    // One nonce per pool = per task attempt: a retry and the attempt
    // it replaces (or a speculative twin) write disjoint temp files.
    private val nonce = java.util.UUID.randomUUID().toString.take(8)
    private val open = mutable.Map.empty[String, (Path, ContainerWriter)]

    private def tmpFor(videoId: String): Path =
      outDir.resolve(s".${videoId}_with_heatmaps.mp4.inprogress-$nonce")

    def append(videoId: String, frame: Array[Byte]): Unit = {
      val (_, w) = open.getOrElseUpdate(videoId, {
        val codec = probeCodec(_ => true).get
        val p = tmpFor(videoId)
        (p, mkWriter(p, codec))
      })
      w.append(frame)
    }

    /** Atomically claim the canonical name, bumping the suffix past
      * files that already exist. The claim is a hard LINK, not a move:
      * link(2) is atomic-exclusive (fails if the target exists), while
      * rename(2) — what ATOMIC_MOVE maps to on POSIX — silently
      * REPLACES an existing target, so a move-based claim would let a
      * speculative twin overwrite an already-published container
      * instead of bumping the suffix. */
    private def publish(tmp: Path, videoId: String): Path = {
      var i = 0
      while (true) {
        val target =
          if (i == 0) outDir.resolve(s"${videoId}_with_heatmaps.mp4")
          else outDir.resolve(s"${videoId}_with_heatmaps_$i.mp4")
        try {
          Files.createLink(target, tmp)
          Files.deleteIfExists(tmp)
          return target
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => () // bump
          // UnsupportedOperationException: filesystem without hard
          // links. FileSystemException: filesystems that advertise
          // link(2) but refuse it at runtime (EPERM/EXDEV on
          // fuse/object-store mounts). FileAlreadyExistsException is a
          // FileSystemException subclass but is matched above, so it
          // keeps bumping the suffix. Either way degrade to the racy
          // exists+move — still verified-before-publish, just without
          // the exclusive claim guarantee.
          case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
            if (!Files.exists(target))
              return Files.move(tmp, target,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        i += 1
      }
      sys.error("unreachable")
    }

    /** Finalize + verify + publish. Close-once semantics: the writer
      * is removed from the pool on the first call, so a second
      * finalize of the same video returns None (no double-close, no
      * double-publish — the pool-level analog of reference
      * test_video_finalization_concurrency:404-426). Verification runs
      * BEFORE the publish, so a corrupt container never reaches a
      * canonical name. */
    def finalizeVideo(videoId: String): Option[Path] = open.remove(videoId).map {
      case (tmp, w) =>
        w.close()
        require(w.verify(tmp), s"container verification failed for $tmp")
        publish(tmp, videoId)
    }

    def finalizeAll(): Seq[Path] = open.keys.toSeq.sorted.flatMap(finalizeVideo)

    def openCount: Int = open.size
  }

  /** Post-finalize integrity check — the moov-atom probe analog. */
  def verify(p: Path): Boolean = {
    val raf = new RandomAccessFile(p.toFile, "r")
    try {
      if (raf.length < 16) return false
      raf.seek(0)
      if (raf.readInt() != Magic) return false
      raf.seek(raf.length - 4)
      raf.readInt() == FooterMagic
    } finally raf.close()
  }

  /** Janitor for crashed/speculative attempts: a dead task's
    * `.{id}...inprogress-{nonce}` temp file is never published (the
    * retry writes under its own nonce), so it sits in the output dir
    * until someone deletes it. Removes in-progress files older than
    * `olderThanMs` — the TTL is what protects LIVE attempts, so size
    * it well above the longest expected task (published containers are
    * never touched: they carry no `.inprogress-` suffix). Returns the
    * deleted paths.
    */
  def vacuumOrphans(dir: Path, olderThanMs: Long,
      now: Long = System.currentTimeMillis): Seq[Path] = {
    require(olderThanMs > 0, "olderThanMs must be positive")
    val d = dir.toFile
    if (!d.isDirectory) return Seq.empty
    // listFiles() returns null if the directory vanished between the
    // isDirectory check and the list (concurrent session cleanup).
    Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter { f =>
        f.isFile && f.getName.startsWith(".") &&
          f.getName.contains(".inprogress-") &&
          now - f.lastModified() > olderThanMs
      }
      .flatMap { f =>
        val p = f.toPath
        if (Files.deleteIfExists(p)) Some(p) else None
      }
  }

  /** Object-storage upload (S14): a Hadoop FileSystem copy, so the
    * same code serves file:// locally and s3a:// on a cluster —
    * no vendor SDK. */
  def uploadTo(spark: org.apache.spark.sql.SparkSession, local: Path, destUri: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(destUri)
    val fs = dst.getFileSystem(conf)
    fs.copyFromLocalFile(false, true, new org.apache.hadoop.fs.Path(local.toUri), dst)
    destUri
  }
}
