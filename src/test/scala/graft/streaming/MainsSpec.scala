package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The spark-submit entry points chained end-to-end on disk: binary
  * files → IngestMain (sampled msgpack frames) → DetectMain
  * (detections + completions) — the reference's producer → stream
  * processor pipeline with parquet standing in for the Kafka hop. */
class MainsSpec extends SparkSpec {

  test("ingest → detect pipeline runs end-to-end through parquet") {
    val base = Files.createTempDirectory("graft_mains").toString
    val videos = s"$base/videos"
    Files.createDirectories(java.nio.file.Paths.get(videos))
    // two fake "video files": 10 chunks of 4096 bytes each
    for (v <- Seq("vidA", "vidB")) {
      val bytes = Array.tabulate(10 * 4096)(i => (i % 251).toByte)
      Files.write(java.nio.file.Paths.get(s"$videos/$v.mp4"), bytes)
    }

    IngestMain.run(spark, videos, s"$base/frames", interval = 2)
    val frames = spark.read.parquet(s"$base/frames")
    // 10 chunks sampled every 2nd → 5 frames per video, keyed by stem
    assert(frames.count() == 10)
    assert(frames.select("key").distinct().collect().map(_.getString(0)).sorted.toSeq
      == Seq("vidA", "vidB"))
    // kafka-record shape: per-partition offsets are dense from 0, so
    // the inspection main consumes the same parquet "topic"
    assert(frames.columns.toSet ==
      Set("key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))
    val status = KafkaIO.topicStatus(frames).collect()
    assert(status.map(_.getLong(3)).sum == 10)
    assert(status.forall(_.getLong(1) == 0L)) // first_offset dense from 0
    InspectMain.run(spark, s"$base/frames", 3) // prints; must resolve the schema

    DetectMain.run(spark, s"$base/frames", s"$base/out")
    val det = spark.read.parquet(s"$base/out/detections")
    val comp = spark.read.parquet(s"$base/out/completions")
    assert(det.count() == 10)
    // frame numbers survive the msgpack hop: sampled 0,2,4,6,8
    assert(det.where(col("video_id") === "vidA").select("frame_number")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 2, 4, 6, 8))
    assert(comp.select("video_id").collect().map(_.getString(0)).sorted.toSeq
      == Seq("vidA", "vidB"))
    assert(comp.select("stats.total_frames").collect().forall(_.getLong(0) == 5L))
  }
}
