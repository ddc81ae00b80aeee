package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming CDC compaction must produce EXACTLY the batch
  * q_cdc_apply result. Because its state merge is commutative (max
  * (ts, eid) record + count), parity must hold even when micro-
  * batches arrive OUT OF ORDER — the third test shuffles rows across
  * batches deterministically and still demands exact equality, a
  * stronger guarantee than the sequential twins (EWMA/Kalman) can
  * make.
  */
class CdcStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def batchRows(): Seq[(Long, String, Double, Long, Long)] = {
    import spark.implicits._
    graft.Tables(spark, dir, "events")
      .where(col("user_id") % 10 === 1)
      .select(col("user_id"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"),
        col("value"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[(Long, String, Double, Long, Long)]
      .collect().toSeq
  }

  private def expected(): Map[Long, (Long, String, Boolean, Double, Long)] =
    SparkEntry.queries("q_cdc_apply")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getBoolean(3), r.getDouble(4), r.getLong(5)))
      .toMap

  private def runStream(batches: Seq[Seq[(Long, String, Double, Long, Long)]])
      : Map[Long, (Long, String, Boolean, Double, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double, Long, Long)]
    val q = CdcStream(input.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode(CdcStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("cdc_out")
        .collect()
        .zipWithIndex
        .map { case (r, i) => (r.getLong(0),
          (r.getLong(1), r.getString(2), r.getBoolean(3), r.getDouble(4), r.getLong(5)), i) }
        .groupBy(_._1)
        .map { case (k, vs) => k -> vs.maxBy(_._3)._2 }
    } finally q.stop()
  }

  private def assertParity(got: Map[Long, (Long, String, Boolean, Double, Long)]): Unit = {
    val exp = expected()
    assert(got.keySet == exp.keySet)
    for ((k, e) <- exp) assert(got(k) == e, s"user $k: ${got(k)} vs $e")
  }

  test("one micro-batch reproduces the batch q_cdc_apply exactly") {
    assertParity(runStream(Seq(batchRows())))
  }

  test("time-ordered multi-batch arrival carries state to the same result") {
    val rows = batchRows().sortBy(r => (r._4, r._5))
    val third = rows.size / 3
    assertParity(runStream(Seq(
      rows.slice(0, third), rows.slice(third, 2 * third),
      rows.slice(2 * third, rows.size))))
  }

  test("OUT-OF-ORDER arrival still compacts to the same result (commutative state)") {
    // deterministic shuffle: bucket by event_id residue, so late rows
    // (higher ts) routinely land in earlier micro-batches
    val rows = batchRows()
    val parts = rows.groupBy(_._5 % 3)
    assertParity(runStream(Seq(parts.getOrElse(2L, Nil),
      parts.getOrElse(0L, Nil), parts.getOrElse(1L, Nil))))
  }
}
