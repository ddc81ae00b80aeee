package graft.streaming

import graft.streaming.VideoSessionProcessor.FrameIn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit-able entry points mirroring the reference's three
  * processes (SURVEY.md §3): ingest (producer), detect (stream
  * processor), inspect (kafka_inspect). A reference user's
  * `python3 producer/video_producer.py`, `python3 -m streams`, and
  * `python3 scripts/kafka_inspect.py` become
  * `spark-submit --class graft.streaming.{IngestMain,DetectMain,InspectMain}`.
  *
  * Local parquet stands in for the Kafka hop in this container (no
  * connector jar); on a cluster the same frames flow through
  * `KafkaIO.framesSource` / `toKafkaRecords` with `format("kafka")`
  * readers/writers — the transforms are identical either way.
  */
object Mains {
  private[streaming] def session(app: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName(app)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}

/** §3.1: binary video files → sampled, msgpack-encoded frame records.
  * Args: <inputDir> <outDir> [extractionInterval]. The codec seam is
  * the fixed-size splitter stub in this container (JavaCV grabber on
  * a cluster — same flatMap shape). */
object IngestMain {
  def main(args: Array[String]): Unit = {
    val Array(inputDir, outDir, rest @ _*) = args: @unchecked
    val spark = Mains.session("graft-ingest")
    run(spark, inputDir, outDir, rest.headOption.map(_.toInt).getOrElse(1))
    spark.stop()
  }

  def run(spark: SparkSession, inputDir: String, outDir: String, interval: Int): Unit = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(inputDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        (path.split('/').last.takeWhile(_ != '.'), bytes) // video_id = file stem
      }
    val chunk = 4096 // stub frame splitter: fixed-size payload chunks
    val frames = Jobs.ingest(files,
      bytes => bytes.grouped(chunk).toSeq, extractionInterval = interval)
    frames.toDF("key", "value").write.mode("overwrite").parquet(outDir)
  }
}

/** §3.2: frame records → detections + completions.
  * Args: <framesParquet> <outDir>. Input schema: either raw
  * (key, value=msgpack) records from IngestMain or typed
  * (video_id, frame_number, timestamp_us) rows. */
object DetectMain {
  def main(args: Array[String]): Unit = {
    val Array(framesPath, outDir) = args: @unchecked
    val spark = Mains.session("graft-detect")
    run(spark, framesPath, outDir)
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
    val out = Jobs.detect(frames)
    out.detections.write.mode("overwrite").parquet(s"$outDir/detections")
    out.completions.write.mode("overwrite").parquet(s"$outDir/completions")
  }
}

/** S16/S17: topic inspection over any kafka-schema batch.
  * Args: <kafkaBatchParquet> [tailLimit]. */
object InspectMain {
  def main(args: Array[String]): Unit = {
    val Array(path, rest @ _*) = args: @unchecked
    val spark = Mains.session("graft-inspect")
    run(spark, path, rest.headOption.map(_.toInt).getOrElse(10))
    spark.stop()
  }

  def run(spark: SparkSession, path: String, limit: Int): Unit = {
    val batch = spark.read.parquet(path)
    KafkaIO.topicStatus(batch).show(truncate = false)
    KafkaIO.topicTail(batch, limit).show(truncate = false)
  }
}
