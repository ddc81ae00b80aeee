package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-maintained MV must equal a from-scratch batch
  * aggregation over every row ever streamed — after each micro-batch,
  * across restarts of nothing in particular — and re-applying a batch
  * id that already published (the foreachBatch at-least-once replay)
  * must be a no-op.
  */
class IncrMvStreamSpec extends SparkSpec {

  import StreamJoins.Purchase

  private def p(user: Long, sec: Long, amt: Double) =
    Purchase(user, new Timestamp(sec * 1000), amt)

  private def batchExpected(rows: Seq[Purchase]): Map[Long, (Long, BigDecimal)] = {
    import spark.implicits._
    rows.toDS()
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(col("amount").cast("decimal(18,6)")).cast("decimal(18,6)").as("total"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2)))))
      .toMap
  }

  private def readMvMap(mv: String): Map[Long, (Long, BigDecimal)] =
    IncrMvStream.readMv(spark, mv).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2)))))
      .toMap

  test("MV tracks the batch aggregate across micro-batches; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("incr_mv").toString
    val mv = s"$dir/mv"
    val b1 = Seq(p(1, 100, 10.0), p(1, 110, 5.5), p(2, 120, 7.25))
    val b2 = Seq(p(2, 200, 2.75), p(3, 210, 40.0))
    val b3 = Seq(p(1, 300, 0.5))

    val in = MemoryStream[Purchase]
    val q = IncrMvStream.start(in.toDS(), mv, s"$dir/ckpt")
    try {
      in.addData(b1); q.processAllAvailable()
      assert(readMvMap(mv) == batchExpected(b1))
      in.addData(b2); q.processAllAvailable()
      assert(readMvMap(mv) == batchExpected(b1 ++ b2))
      in.addData(b3); q.processAllAvailable()
      assert(readMvMap(mv) == batchExpected(b1 ++ b2 ++ b3))
    } finally q.stop()

    // at-least-once replay: re-apply an old batch id directly — the
    // idempotency guard must refuse it and the MV must not change
    val before = readMvMap(mv)
    IncrMvStream.applyBatch(b1.toDF(), mv, batchId = 0L)
    assert(readMvMap(mv) == before, "replayed batch was double-applied")

    // a FRESH id with the same rows IS applied (that's an append)
    IncrMvStream.applyBatch(b3.toDF(), mv, batchId = 99L)
    assert(readMvMap(mv) == batchExpected(b1 ++ b2 ++ b3 ++ b3))

    // retention vacuum: keeps the newest versions (always including
    // the published pointer) and the MV still reads identically
    val before2 = readMvMap(mv)
    val dropped = IncrMvStream.vacuum(spark, mv, keepLast = 1)
    assert(dropped.nonEmpty, "expected old versions to be vacuumed")
    assert(!dropped.contains(99L), "vacuum removed the current version")
    assert(readMvMap(mv) == before2, "vacuum changed the readable MV")
  }

  test("lost _LATEST pointer resolves to the max committed version, not an empty MV") {
    // Simulates the HDFS delete+rename publish window: a crash after
    // the pointer delete leaves committed v=* dirs but no _LATEST.
    // readLatest must resolve to the newest _SUCCESS-marked version so
    // accumulated state (and the replay guard) survives; a torn
    // version dir without _SUCCESS must never be chosen.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("incr_mv_ptr").toString
    val mv = s"$dir/mv"
    val rows = Seq(p(1, 100, 10.0), p(2, 120, 7.25))
    IncrMvStream.applyBatch(rows.toDF(), mv, batchId = 0L)
    IncrMvStream.applyBatch(Seq(p(1, 200, 1.0)).toDF(), mv, batchId = 1L)
    val healthy = readMvMap(mv)

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(mv), spark.sparkContext.hadoopConfiguration)
    // a torn half-written v=7 (no _SUCCESS) must be ignored
    fs.mkdirs(new org.apache.hadoop.fs.Path(mv, "v=7"))
    // crash window: pointer gone
    fs.delete(new org.apache.hadoop.fs.Path(mv, "_LATEST"), false)

    assert(IncrMvStream.readLatest(spark, mv).contains(1L),
      "missing pointer must resolve to max committed version")
    assert(readMvMap(mv) == healthy, "pointer loss must not empty the MV")

    // the replay guard still holds without the pointer file
    val before = readMvMap(mv)
    IncrMvStream.applyBatch(rows.toDF(), mv, batchId = 1L)
    assert(readMvMap(mv) == before, "replay was double-applied after pointer loss")

    // the next real batch re-publishes the pointer and merges on top
    IncrMvStream.applyBatch(Seq(p(3, 300, 2.0)).toDF(), mv, batchId = 2L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(mv, "_LATEST")),
      "next publish must restore the pointer")
    assert(readMvMap(mv) == batchExpected(rows ++ Seq(p(1, 200, 1.0), p(3, 300, 2.0))))
  }

  test("empty MV reads as an empty frame with the MV schema") {
    val dir = java.nio.file.Files.createTempDirectory("incr_mv_empty").toString
    val df = IncrMvStream.readMv(spark, s"$dir/none")
    assert(df.schema == IncrMvStream.mvSchema)
    assert(df.count() == 0)
  }
}
