package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kafka-shaped ops over synthetic records (no broker/connector in
  * this container): offset inspection (S16/S17), keyed-record
  * assembly (S6/S10), and the JSON legacy transport round-trip
  * (S5/S8). */
class KafkaIOSpec extends SparkSpec {

  import spark.implicits._

  private def kafkaBatch = Seq(
    // (partition, offset, timestamp)
    (0, 0L, Timestamp.valueOf("2024-01-01 00:00:00")),
    (0, 1L, Timestamp.valueOf("2024-01-01 00:00:01")),
    (0, 2L, Timestamp.valueOf("2024-01-01 00:00:02")),
    (1, 5L, Timestamp.valueOf("2024-01-01 00:00:03")),
    (1, 6L, Timestamp.valueOf("2024-01-01 00:00:04")))
    .toDF("partition", "offset", "timestamp")

  test("topicStatus reports per-partition offset ranges (S16)") {
    val rows = KafkaIO.topicStatus(kafkaBatch).collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0, 0L, 2L, 3L), (1, 5L, 6L, 2L)))
  }

  test("topicTail returns the newest N messages (S17)") {
    val rows = KafkaIO.topicTail(kafkaBatch, 2).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(6L, 5L))
  }

  test("toKafkaRecords produces keyed binary records (S6/S10)") {
    val df = Seq(("v1", 1), ("v2", 2)).toDF("vid", "n")
    val recs = KafkaIO.toKafkaRecords(df, "vid", to_json(struct(col("n"))))
      .collect()
    assert(recs.map(r => new String(r.getAs[Array[Byte]]("key"))).toSeq == Seq("v1", "v2"))
    assert(new String(recs.head.getAs[Array[Byte]]("value")) == """{"n":1}""")
  }

  test("JSON legacy transport round-trips a frame (S5/S8)") {
    val frame = struct(
      lit("v1").as("video_id"), lit(7).as("frame_number"),
      lit(Timestamp.valueOf("2024-01-01 00:00:00")).as("timestamp"),
      lit(29.97).as("fps"),
      lit(Array[Byte](1, 2, 3)).as("frame_data"),
      lit(640).as("width"), lit(480).as("height"))
    val wire = spark.range(1).select(FrameSerde.encodeJson(frame).as("value"))
    val back = wire.select(FrameSerde.decodeJson(col("value")).as("f")).select("f.*").head()
    assert(back.getAs[String]("video_id") == "v1")
    assert(back.getAs[Int]("frame_number") == 7)
    assert(back.getAs[Double]("fps") == 29.97)
    assert(back.getAs[Array[Byte]]("frame_data").toSeq == Seq[Byte](1, 2, 3))
    assert(back.getAs[Int]("width") == 640 && back.getAs[Int]("height") == 480)
  }
}
