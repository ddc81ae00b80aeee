package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming Croston fold must produce EXACTLY the batch
  * q_croston result — same dual-EWMA recurrence, seeds, and per-day
  * ordering — whether a part's demand history arrives in one
  * micro-batch or split across several in time order (the
  * HoltStreamSpec parity contract, for the intermittent-demand state).
  */
class CrostonStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def batchRows(): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    val li = Tables(spark, dir, "lineitem")
    val mn = li.agg(min(to_date(col("l_shipdate"))).as("d0"))
    li.crossJoin(broadcast(mn))
      .groupBy(col("l_partkey"),
        (datediff(to_date(col("l_shipdate")), col("d0")) + 1).cast("long")
          .as("off"))
      .agg(sum(col("l_quantity").cast("long")).cast("double").as("q"))
      .select(col("l_partkey"), col("off"), col("q"))
      .as[(Long, Long, Double)]
      .collect().toSeq.sortBy(r => (r._2, r._1))
  }

  private def expected(): Map[Long, (Long, Double, Double, Double)] =
    SparkEntry.queries("q_croston")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("part") ->
        ((r.getAs[Long]("n_occ"), r.getAs[Double]("size_z"),
          r.getAs[Double]("interval_p"), r.getAs[Double]("fc_croston"))))
      .toMap

  private def runStream(batches: Seq[Seq[(Long, Long, Double)]])
      : Map[Long, (Long, Double, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val q = CrostonStream(input.toDS())
      .writeStream.format("memory").queryName("croston_out")
      .outputMode(CrostonStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("croston_out")
        .collect()
        .zipWithIndex
        .map { case (r, i) =>
          (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4)), i) }
        .groupBy(_._1)
        .map { case (k, vs) => k -> vs.maxBy(_._3)._2 }
    } finally q.stop()
  }

  private def assertParity(
      got: Map[Long, (Long, Double, Double, Double)]): Unit = {
    val exp = expected()
    assert(got.keySet == exp.keySet)
    for ((k, (n, z, p, fc)) <- exp) {
      val (gn, gz, gp, gfc) = got(k)
      assert(gn == n, s"part $k n_occ $gn vs $n")
      assert(math.abs(math.rint(gz * 1e6) / 1e6 - z) <= 1e-9,
        s"part $k z $gz vs $z")
      assert(math.abs(math.rint(gp * 1e6) / 1e6 - p) <= 1e-9,
        s"part $k p $gp vs $p")
      assert(math.abs(math.rint(gfc * 1e6) / 1e6 - fc) <= 1e-9,
        s"part $k fc $gfc vs $fc")
    }
  }

  test("one micro-batch reproduces the batch q_croston exactly") {
    assertParity(runStream(Seq(batchRows())))
  }

  test("time-ordered multi-batch arrival carries state to the same result") {
    val rows = batchRows()
    val cut1 = rows.size / 3
    val cut2 = 2 * rows.size / 3
    assertParity(runStream(Seq(rows.take(cut1),
      rows.slice(cut1, cut2), rows.drop(cut2))))
  }
}
