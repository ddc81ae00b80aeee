package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** Kafka wiring (SURVEY.md §2.1 S6/S7/S10/S11/S15/S16/S17).
  *
  * On a cluster this binds to `format("kafka")` (spark-sql-kafka
  * connector); this container ships no connector jar, so these
  * builders are exercised by compile + option-assembly tests and the
  * jobs accept any DataFrame source (memory/file/kafka) — the
  * pipeline is source-agnostic by construction.
  *
  * Tuning carried over from the reference:
  *  - producer: acks=1, gzip, batch 16384, linger 10 ms
  *    (producer/video_producer.py:57-67) — passed through as
  *    `kafka.*` options on the sink;
  *  - consumer: `startingOffsets=earliest`, fetch sizing via
  *    maxOffsetsPerTrigger (streams/stream.py:70-83); offset commits /
  *    commit cadence (A9) are subsumed by checkpointing;
  *  - per-video ordering: key = video_id (partitioner-preserved),
  *    matching docs/ARCHITECTURE.md:488-489.
  */
object KafkaIO {

  final case class Topics(
      frames: String = "video-frames",
      detections: String = "fire-detections",
      completions: String = "video-completions")

  val producerOptions: Map[String, String] = Map(
    "kafka.acks" -> "1",
    "kafka.compression.type" -> "gzip",
    "kafka.batch.size" -> "16384",
    "kafka.linger.ms" -> "10",
    "kafka.max.in.flight.requests.per.connection" -> "5")

  def framesSource(
      spark: SparkSession,
      bootstrap: String,
      topic: String,
      maxOffsetsPerTrigger: Long = 300L * 6): DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)

  /** Keyed publish: key = video_id so per-video order survives the
    * broker (the sink needs `.option("topic", …)` + checkpoint). */
  def toKafkaRecords(df: DataFrame, keyCol: String, valueJson: org.apache.spark.sql.Column): DataFrame =
    df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      valueJson.cast("binary").as("value"))

  /** Batch end-offset scan per partition (S16, kafka_inspect
    * topic-status) — works over any DataFrame with kafka's
    * (partition, offset) columns. */
  def topicStatus(kafkaBatch: DataFrame): DataFrame =
    kafkaBatch.groupBy(col("partition"))
      .agg(
        min(col("offset")).as("first_offset"),
        max(col("offset")).as("last_offset"),
        count(lit(1)).as("n_messages"))
      .orderBy("partition")

  /** Tail scan with limit (S17, kafka_inspect messages --limit). */
  def topicTail(kafkaBatch: DataFrame, limit: Int): DataFrame =
    kafkaBatch.orderBy(desc("timestamp"), desc("offset")).limit(limit)
}
