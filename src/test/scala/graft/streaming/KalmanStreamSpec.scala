package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming Kalman filter must produce EXACTLY the batch
  * q_kalman_1d result — same recurrence, seed, and ordering — whether
  * the rows arrive in one micro-batch or split across several in time
  * order (the same parity contract as EwmaStreamSpec, for a
  * two-variable state).
  */
class KalmanStreamSpec extends SparkSpec {

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

  private def expected(): Map[Long, (Long, Double, Double)] =
    SparkEntry.queries("q_kalman_1d")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap

  private def runStream(batches: Seq[Seq[(Long, Long, Long, Double)]])
      : Map[Long, (Long, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double)]
    val q = KalmanStream(input.toDS())
      .writeStream.format("memory").queryName("kalman_out")
      .outputMode(KalmanStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("kalman_out")
        .collect()
        .zipWithIndex
        .map { case (r, i) =>
          (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)), i) }
        .groupBy(_._1)
        .map { case (k, vs) => k -> vs.maxBy(_._3)._2 }
    } finally q.stop()
  }

  private def assertParity(got: Map[Long, (Long, Double, Double)]): Unit = {
    val exp = expected()
    assert(got.keySet == exp.keySet)
    for ((k, (n, x, p)) <- exp) {
      val (gn, gx, gp) = got(k)
      assert(gn == n, s"user $k count $gn vs $n")
      assert(math.abs(math.rint(gx * 1e6) / 1e6 - x) <= 1e-9,
        s"user $k x_hat $gx vs $x")
      assert(math.abs(math.rint(gp * 1e6) / 1e6 - p) <= 1e-9,
        s"user $k p_var $gp vs $p")
    }
  }

  test("one micro-batch reproduces the batch q_kalman_1d exactly") {
    assertParity(runStream(Seq(batchRows())))
  }

  test("time-ordered multi-batch arrival carries state to the same result") {
    val rows = batchRows()
    val cut1 = rows.size / 3
    val cut2 = 2 * rows.size / 3
    assertParity(runStream(Seq(
      rows.slice(0, cut1), rows.slice(cut1, cut2), rows.slice(cut2, rows.size))))
  }
}
