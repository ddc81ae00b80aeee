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

  test("msgpack kafka round-trip drives the state machine end-to-end (S6/S7/S10/S11/S15)") {
    import graft.streaming.Schemas.FrameMessage
    import graft.streaming.VideoSessionProcessor.FrameIn
    // Producer side, as the broker would deliver it: two interleaved
    // videos, key = video_id (per-video ordering via the partitioner,
    // docs/ARCHITECTURE.md:488-489), one partition per key here.
    val frames = for { i <- 0 until 12; v <- Seq("vA", "vB") } yield
      FrameMessage(v, i, new Timestamp(1700000000000L + i * 1000L), 30.0,
        Array[Byte](i.toByte), 4, 4)
    val kafka = frames.zipWithIndex.map { case (f, off) =>
      (f.video_id.getBytes("UTF-8"), FrameSerde.encodeMsgpack(f), "video-frames",
        if (f.video_id == "vA") 0 else 1, off.toLong,
        new Timestamp(1700000100000L + off * 10L), 0)
    }.toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")

    // S7/S15 consume: wire value → typed frame; key must equal the
    // decoded video_id on every record (the ordering invariant the
    // sink wrote — checked via the native decode expression).
    val keyCheck = kafka.select(
      col("key").cast("string").as("k"),
      graft.expressions.MsgpackDecodeFrame(col("value")).getField("video_id").as("vid"))
    assert(keyCheck.where(col("k") =!= col("vid")).count() == 0)

    // state machine over the decoded stream
    val fin = FrameSerde.decodeMsgpackDF(kafka)
      .select(col("video_id"), col("frame_number"),
        unix_micros(col("timestamp")).as("timestamp_us"))
      .as[FrameIn]
    val out = Jobs.detect(fin)
    val det = out.detections
      .select("video_id", "frame_number", "session_index").collect()
    assert(det.length == 24)
    for (v <- Seq("vA", "vB")) {
      val rows = det.filter(_.getString(0) == v).sortBy(_.getLong(2))
      // per-video frame order is intact through decode + state machine
      assert(rows.map(_.getInt(1)).toSeq == (0 until 12))
    }
    val comp = out.completions.select("video_id", "stats.total_frames").collect()
    assert(comp.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("vA", 12L), ("vB", 12L)))

    // S10/S11 produce: detections back to keyed binary records
    val recs = KafkaIO.toKafkaRecords(out.detections, "video_id",
      to_json(struct(col("frame_number"), col("has_fire")))).collect()
    assert(recs.length == 24)
    assert(recs.map(r => new String(r.getAs[Array[Byte]]("key"))).toSet == Set("vA", "vB"))

    // S16 inspection over the same fake batch
    val status = KafkaIO.topicStatus(kafka).collect()
    assert(status.map(r => (r.getInt(0), r.getLong(3))).toSeq ==
      Seq((0, 12L), (1, 12L)))
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
