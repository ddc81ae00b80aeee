package graft

import org.apache.spark.sql.functions._

/** The Misra–Gries batch guarantees behind q_mg_heavy_hitters
  * (operators/AggregateQueries.mgPartition), pinned under adversarial
  * partitionings — the oracle row only proves the final set; these
  * tests prove WHY that set is partition-invariant:
  *  - superset: every token with true count > n/(k+1) appears in the
  *    merged candidate set, for every repartitioning tried;
  *  - undercount-only: each merged lower bound ≤ the true count, and
  *    true − lower ≤ n/(k+1) (the summed per-partition decrements);
  *  - size: every partition's summary holds ≤ k counters.
  */
class MgBatchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def words = Tables(spark, sf, "documents")
    .select(explode(graft.functions.TextFunctions.tokens(col("text")))
      .as("token"))

  test("MG candidates cover all true heavy hitters under every partitioning") {
    import spark.implicits._
    val k = 64
    val exact = words.groupBy("token").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val trueHH = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(trueHH.nonEmpty, "fixture has no heavy hitters — test is vacuous")
    for (parts <- Seq(1, 3, 17, 32)) {
      val partials = words.as[String].repartition(parts)
        .mapPartitions(it =>
          operators.AggregateQueries.mgPartition(it, k).iterator)
        .collect()
      val candidates = partials.map(_._1).toSet
      assert(trueHH.subsetOf(candidates),
        s"parts=$parts lost HHs: ${(trueHH -- candidates).take(5)}")
      // merged lower bounds: undercount-only, within the MG error
      val merged = partials.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      merged.foreach { case (tok, lower) =>
        val truth = exact(tok)
        assert(lower <= truth, s"$tok overcounted: $lower > $truth")
        assert(truth - lower <= n / (k + 1) + 1,
          s"$tok bound blown: $truth - $lower > n/(k+1)")
      }
    }
  }

  test("per-partition summaries stay within k counters") {
    import spark.implicits._
    val k = 16
    val sizes = words.as[String].repartition(5)
      .mapPartitions(it =>
        Iterator(operators.AggregateQueries.mgPartition(it, k).size))
      .collect()
    assert(sizes.forall(_ <= k), s"summary overflow: ${sizes.toSeq}")
  }

  test("q_mg_heavy_hitters output is exactly the provable heavy-hitter set") {
    import spark.implicits._
    val got = SparkEntry.queries("q_mg_heavy_hitters")(spark, sf)
      .select("token", "n_occurrences").as[(String, Long)].collect().toMap
    val exact = words.groupBy("token").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val expected = exact.filter { case (_, c) => c * 257 > n }
    assert(got == expected,
      s"only-got=${(got.keySet -- expected.keySet).take(3)} " +
        s"only-exp=${(expected.keySet -- got.keySet).take(3)}")
  }
}
