package graft.streaming

import graft.Sessions
import graft.streaming.VideoSessionProcessor.FrameIn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** spark-submit-able entry points mirroring the reference's three
  * processes (SURVEY.md §3): ingest (producer), detect (stream
  * processor), inspect (kafka_inspect). A reference user's
  * `python3 producer/video_producer.py`, `python3 -m streams`, and
  * `python3 scripts/kafka_inspect.py` become
  * `spark-submit --class graft.streaming.{IngestMain,DetectMain,InspectMain}`.
  *
  * Local parquet stands in for the Kafka hop in this container (no
  * connector jar): IngestMain writes kafka-record-shaped rows (key,
  * value, topic, partition, offset, timestamp) so DetectMain and
  * InspectMain consume exactly what a broker would deliver. On a
  * cluster the same frames flow through `KafkaIO.framesSource` /
  * `toKafkaRecords` with `format("kafka")` readers/writers — the
  * transforms are identical either way.
  */
object Mains {
  private[streaming] def usage(msg: String): Nothing = {
    System.err.println(msg)
    sys.exit(2)
  }
}

/** §3.1: binary video files → sampled, msgpack-encoded, kafka-shaped
  * frame records. Args: <inputDir> <outDir> [extractionInterval].
  * The codec seam is the fixed-size splitter stub in this container
  * (JavaCV grabber on a cluster — same flatMap shape). */
object IngestMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2)
      Mains.usage("usage: IngestMain <inputDir> <outDir> [extractionInterval]")
    val spark = Sessions.build("graft-ingest")
    run(spark, args(0), args(1), args.lift(2).map(_.toInt).getOrElse(1))
    spark.stop()
  }

  def run(spark: SparkSession, inputDir: String, outDir: String, interval: Int): Unit = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(inputDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        // video_id = file stem: strip only the LAST extension (the
        // reference's Path.stem) — truncating at the first dot would
        // collide camera1.front.mp4 and camera1.back.mp4 into one key
        val name = path.split('/').last
        val dot = name.lastIndexOf('.')
        (if (dot > 0) name.substring(0, dot) else name, bytes)
      }
    val chunk = 4096 // stub frame splitter: fixed-size payload chunks
    val frames = Jobs.ingest(files,
      bytes => bytes.grouped(chunk).toSeq, extractionInterval = interval)
    // kafka-record shape, as the broker would deliver it: 6 partitions
    // keyed by video (the reference's topic layout), offsets per
    // partition, deterministic timestamps off the offset.
    val w = Window.partitionBy(col("partition"))
      .orderBy(col("key"), monotonically_increasing_id())
    frames.toDF("key", "value")
      .withColumn("topic", lit("video-frames"))
      .withColumn("partition", pmod(hash(col("key")), lit(6)).cast("int"))
      .withColumn("offset", (row_number().over(w) - 1).cast("long"))
      .withColumn("timestamp", timestamp_millis(lit(1700000000000L) + col("offset") * 10))
      .withColumn("timestampType", lit(0))
      .write.mode("overwrite").parquet(outDir)
  }
}

/** §3.2: frame records → detections + completions.
  * Args: <framesParquet> <outDir>. Input schema: either kafka-shaped
  * (value = msgpack) records from IngestMain or typed
  * (video_id, frame_number, timestamp_us) rows. */
object DetectMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) Mains.usage("usage: DetectMain <framesParquet> <outDir>")
    val spark = Sessions.build("graft-detect")
    run(spark, args(0), args(1))
    spark.stop()
  }

  def run(spark: SparkSession, framesPath: String, outDir: String): Unit = {
    import spark.implicits._
    val raw = spark.read.parquet(framesPath)
    val frames =
      if (raw.columns.contains("value"))
        FrameSerde.decodeMsgpackDF(raw)
          .select(col("video_id"), col("frame_number"),
            unix_micros(col("timestamp")).as("timestamp_us"))
          .as[FrameIn]
      else raw.select("video_id", "frame_number", "timestamp_us").as[FrameIn]
    // both sinks consume the stateful pass — materialize it once
    val events = VideoSessionProcessor.processBatch(frames).toDF().cache()
    try {
      val out = Jobs.split(events)
      out.detections.write.mode("overwrite").parquet(s"$outDir/detections")
      out.completions.write.mode("overwrite").parquet(s"$outDir/completions")
    } finally events.unpersist()
  }
}

/** S16/S17: topic inspection over any kafka-schema batch (such as
  * IngestMain's output). Args: <kafkaBatchParquet> [tailLimit]. */
object InspectMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 1) Mains.usage("usage: InspectMain <kafkaBatchParquet> [tailLimit]")
    val spark = Sessions.build("graft-inspect")
    run(spark, args(0), args.lift(1).map(_.toInt).getOrElse(10))
    spark.stop()
  }

  def run(spark: SparkSession, path: String, limit: Int): Unit = {
    val batch = spark.read.parquet(path)
    KafkaIO.topicStatus(batch).show(truncate = false)
    KafkaIO.topicTail(batch, limit).show(truncate = false)
  }
}
