package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming EWMA must produce EXACTLY the batch q_ewma result —
  * same recurrence, same seed, same (us, event_id) ordering — whether
  * the events arrive in one micro-batch or split across several in
  * time order. This is the batch/streaming parity proof for a numeric
  * recurrence (the video pipeline's proof covers the session state
  * machine).
  */
class EwmaStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def batchRows(): Seq[(Long, Long, Long, Double)] = {
    import spark.implicits._
    graft.Tables(spark, dir, "events")
      .where(col("user_id") % 10 === 0)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .collect().toSeq.sortBy(r => (r._2, r._3))
  }

  private def expected(): Map[Long, (Long, Double)] =
    SparkEntry.queries("q_ewma")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private def runStream(batches: Seq[Seq[(Long, Long, Long, Double)]]): Map[Long, (Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double)]
    val q = EwmaStream(input.toDS(), 0.3)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(EwmaStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // last update per key wins (Update mode appends to the memory sink)
      spark.table("ewma_out")
        .collect()
        .zipWithIndex
        .map { case (r, i) => (r.getLong(0), (r.getLong(1), r.getDouble(2)), i) }
        .groupBy(_._1)
        .map { case (k, vs) => k -> vs.maxBy(_._3)._2 }
    } finally q.stop()
  }

  test("one micro-batch reproduces the batch q_ewma exactly") {
    val exp = expected()
    val got = runStream(Seq(batchRows()))
    assert(got.keySet == exp.keySet)
    for ((k, (n, e)) <- exp) {
      val (gn, ge) = got(k)
      assert(gn == n, s"user $k count $gn vs $n")
      assert(math.abs(math.rint(ge * 1e6) / 1e6 - e) <= 1e-9,
        s"user $k ewma $ge vs $e")
    }
  }

  test("time-ordered multi-batch arrival carries state to the same result") {
    val rows = batchRows()
    val cut1 = rows.size / 3
    val cut2 = 2 * rows.size / 3
    val got = runStream(Seq(
      rows.slice(0, cut1), rows.slice(cut1, cut2), rows.slice(cut2, rows.size)))
    val exp = expected()
    assert(got.keySet == exp.keySet)
    for ((k, (n, e)) <- exp) {
      val (gn, ge) = got(k)
      assert(gn == n, s"user $k count $gn vs $n")
      assert(math.abs(math.rint(ge * 1e6) / 1e6 - e) <= 1e-9,
        s"user $k ewma $ge vs $e")
    }
  }
}
