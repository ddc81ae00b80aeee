package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming Page–Hinkley detector must produce EXACTLY the batch
  * q_page_hinkley result — same prefix-mean recurrence, burn-in λ, and
  * per-day ordering — whether the daily series arrives in one
  * micro-batch or split across several in time order (the
  * HoltStreamSpec parity contract, for the drift-detector state). A
  * synthetic mean-shift series additionally pins the detector's
  * BEHAVIOR: quiet on a flat series, alarms after a jump.
  */
class PageHinkleyStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def batchRows(): Seq[(String, Long, Long)] = {
    import spark.implicits._
    graft.Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01")).cast("long"), col("c"))
      .as[(String, Long, Long)]
      .collect().toSeq.sortBy(r => (r._2, r._1))
  }

  private def expected(): Map[String, (Long, Double, Long, Long, Double)] =
    SparkEntry.queries("q_page_hinkley")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap

  private def runStream(batches: Seq[Seq[(String, Long, Long)]])
      : Map[String, (Long, Double, Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = PageHinkleyStream(input.toDS())
      .writeStream.format("memory").queryName("ph_out")
      .outputMode(PageHinkleyStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("ph_out")
        .collect()
        .zipWithIndex
        .map { case (r, i) =>
          (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3),
            r.getLong(4), r.getDouble(5)), i) }
        .groupBy(_._1)
        .map { case (k, vs) => k -> vs.maxBy(_._3)._2 }
    } finally q.stop()
  }

  private def assertParity(
      got: Map[String, (Long, Double, Long, Long, Double)]): Unit = {
    val exp = expected()
    assert(got.keySet == exp.keySet)
    for ((k, (n, lam, na, fa, mph)) <- exp) {
      val (gn, glam, gna, gfa, gmph) = got(k)
      assert(gn == n, s"series $k n_days $gn vs $n")
      assert(math.abs(math.rint(glam * 1e6) / 1e6 - lam) <= 1e-9,
        s"series $k lambda $glam vs $lam")
      assert(gna == na, s"series $k n_alarms $gna vs $na")
      assert(gfa == fa, s"series $k first_alarm $gfa vs $fa")
      assert(math.abs(math.rint(gmph * 1e6) / 1e6 - mph) <= 1e-9,
        s"series $k max_ph $gmph vs $mph")
    }
  }

  test("one micro-batch reproduces the batch q_page_hinkley exactly") {
    assertParity(runStream(Seq(batchRows())))
  }

  test("time-ordered multi-batch arrival carries state to the same result") {
    val rows = batchRows()
    val cut1 = rows.size / 3
    val cut2 = 2 * rows.size / 3
    assertParity(runStream(Seq(rows.take(cut1),
      rows.slice(cut1, cut2), rows.drop(cut2))))
  }

  test("series shorter than the burn-in are suppressed, not NaN") {
    // batch q_page_hinkley inner-joins on the t = 10 row, so a 6-day
    // series never appears there; the stream must present the same
    // surface (no lambda = NaN rows). Once the series crosses the
    // burn-in in a LATER batch it must appear with full-history state.
    val short = (1L to 6L).map(d => ("short", 2000 + d, 40L))
    assert(!runStream(Seq(short)).contains("short"),
      "sub-burn-in series leaked into the output")
    val rest = (7L to 15L).map(d => ("short", 2000 + d, 40L))
    val got = runStream(Seq(short, rest))
    assert(got.contains("short"), "series crossing burn-in must emit")
    assert(got("short")._1 == 15L, s"n_days ${got("short")._1} vs 15")
    assert(!got("short")._2.isNaN, "lambda must be seeded, not NaN")
  }

  test("behavior: quiet on a flat series, alarms after a mean shift") {
    // flat: constant 50/day for 30 days; shifted: 50/day for 20 days
    // then 150/day — the detector must arm at day 10 and fire only on
    // the shifted series, with the first alarm at/after the jump
    val flat = (1L to 30L).map(d => ("flat", 1000 + d, 50L))
    val shift = (1L to 30L).map(d =>
      ("shift", 1000 + d, if (d <= 20) 50L else 150L))
    val got = runStream(Seq(flat ++ shift))
    assert(got("flat")._3 == 0L, s"flat series alarmed: ${got("flat")}")
    assert(got("shift")._3 > 0L, "shifted series must alarm")
    assert(got("shift")._4 >= 1021L,
      s"first alarm ${got("shift")._4} before the shift day")
  }
}
