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
