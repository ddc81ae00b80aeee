package graft

import org.apache.spark.sql.functions._

/** The approx-default profiling mode (VERDICT r5 ask #3): the default
  * `StatsQueries.profileStats` must be the 100-TB shape — ONE corpus
  * pass, no Expand — and its HLL distinct estimates must track the
  * exact twin. The exact mode stays oracle-hash-checked as
  * q_profile_stats; the approx contract is oracle-enforced via
  * q_profile_stats_approx's nd_ok flag.
  */
class ProfileStatsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("approx default is a single-pass plan: one scan, no Expand") {
    // plan-shape assertions below count InMemoryRelation/scan nodes —
    // cached plan-identical subtrees left by earlier suites in the
    // shared session would perturb the counts (the cache manager
    // substitutes matching subtrees into NEW plans)
    spark.catalog.clearCache()
    val df = operators.StatsQueries.profileStats(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx profile plan contains Expand:\n" + plan)
    // the union's 4 branches must reuse ONE cached aggregation of ONE
    // scan. Textually each branch repeats the InMemoryRelation subtree
    // (which embeds the file scan), so "one corpus pass" reads as:
    // every file scan sits under an InMemoryRelation, and every branch
    // reads through an InMemoryTableScan.
    val fileScans = "Scan parquet".r.findAllIn(plan).size
    val cachedRels = "InMemoryRelation".r.findAllIn(plan).size
    assert(plan.contains("InMemoryTableScan"),
      "approx profile branches bypass the cache:\n" + plan)
    assert(fileScans == cachedRels,
      s"approx profile has a file scan outside the cache ($fileScans scans, $cachedRels cached):\n" + plan)
  }

  test("exact mode has no Expand either (split-distinct, not fused)") {
    spark.catalog.clearCache()
    val plan = operators.StatsQueries.profileStats(spark, sf, approx = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "exact profile plan contains Expand:\n" + plan)
  }

  test("approx n_distinct within 3-sigma of exact; all other columns identical") {
    def byCol(approx: Boolean) =
      operators.StatsQueries.profileStats(spark, sf, approx)
        .collect().map(r => r.getString(0) -> r).toMap
    val ap = byCol(true)
    val ex = byCol(false)
    assert(ap.keySet == ex.keySet && ap.size == 4)
    ex.foreach { case (c, e) =>
      val a = ap(c)
      // cols: col_name, n_values, n_nulls, n_distinct, min, max, avg
      assert(a.getLong(1) == e.getLong(1), s"$c n_values")
      assert(a.getLong(2) == e.getLong(2), s"$c n_nulls")
      Seq(4, 5, 6).foreach(i => assert(a.getDouble(i) == e.getDouble(i), s"$c col $i"))
      val (nd, nde) = (a.getLong(3), e.getLong(3))
      assert(math.abs(nd - nde) <= math.max(1.0, 0.06 * nde),
        s"$c: approx n_distinct $nd vs exact $nde")
    }
  }

  test("q_profile_stats_approx emits all-true nd_ok at this scale") {
    val flags = SparkEntry.queries("q_profile_stats_approx")(spark, sf)
      .select($"nd_ok").as[Boolean].collect()
    assert(flags.length == 4 && flags.forall(identity))
  }
}
