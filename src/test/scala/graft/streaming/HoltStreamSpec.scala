package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming Holt fold must produce EXACTLY the batch
  * q_holt_forecast result — same recurrence shapes, seed, and per-day
  * ordering — whether the daily series arrives in one micro-batch or
  * split across several in time order (the KalmanStreamSpec parity
  * contract, for the level+trend state pair).
  */
class HoltStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def batchRows(): Seq[(String, Long, Double)] = {
    import spark.implicits._
    graft.Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("y"))
      .select(col("event_type"), datediff(col("day"), lit("1970-01-01")).cast("long"),
        col("y"))
      .as[(String, Long, Double)]
      .collect().toSeq.sortBy(r => (r._2, r._1))
  }

  private def expected(): Map[String, (Long, Double, Double, Double)] =
    SparkEntry.queries("q_holt_forecast")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  private def runStream(batches: Seq[Seq[(String, Long, Double)]])
      : Map[String, (Long, Double, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val q = HoltStream(input.toDS())
      .writeStream.format("memory").queryName("holt_out")
      .outputMode(HoltStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("holt_out")
        .collect()
        .zipWithIndex
        .map { case (r, i) =>
          (r.getString(0),
            (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)), i) }
        .groupBy(_._1)
        .map { case (k, vs) => k -> vs.maxBy(_._3)._2 }
    } finally q.stop()
  }

  private def assertParity(
      got: Map[String, (Long, Double, Double, Double)]): Unit = {
    val exp = expected()
    assert(got.keySet == exp.keySet)
    for ((k, (n, l, b, f)) <- exp) {
      val (gn, gl, gb, gf) = got(k)
      assert(gn == n, s"series $k n_days $gn vs $n")
      assert(math.abs(math.rint(gl * 1e6) / 1e6 - l) <= 1e-9,
        s"series $k level $gl vs $l")
      assert(math.abs(math.rint(gb * 1e6) / 1e6 - b) <= 1e-9,
        s"series $k trend $gb vs $b")
      assert(math.abs(math.rint(gf * 1e6) / 1e6 - f) <= 1e-9,
        s"series $k fc_1 $gf vs $f")
    }
  }

  test("one micro-batch reproduces the batch q_holt_forecast exactly") {
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
