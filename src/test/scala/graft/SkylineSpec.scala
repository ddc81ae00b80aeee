package graft

import java.nio.file.Files

/** q_skyline must equal the strict-dominance definition — "no other
  * row is both ≤-price and ≥-qty with one strict" — on data built to
  * break prefix-max shortcuts: same-price co-max ties, exact duplicate
  * frontier points, an equal-qty cheaper dominator, and a
  * globally-max-qty row at a non-minimal price. The oracle SQL shares
  * the grouped-prefix rewrite (the NOT EXISTS form is quadratic), so
  * THIS spec is what proves the rewrite.
  */
class SkylineSpec extends SparkSpec {

  private def bruteForceSkyline(rows: Seq[(Long, Long, Double, Double)]) =
    rows.filterNot { r =>
      rows.exists(s => s._3 <= r._3 && s._4 >= r._4 &&
        (s._3 < r._3 || s._4 > r._4))
    }.map { case (ok, ln, p, q) => (ok, ln, p, q) }
      .sortBy(t => (t._3, t._1, t._2))

  test("skyline equals brute-force strict dominance on adversarial ties") {
    val rows = Seq[(Long, Long, Double, Double)](
      (1L, 1L, 10.0, 5.0),   // frontier
      (2L, 1L, 10.0, 5.0),   // exact duplicate — must ALSO survive
      (3L, 1L, 10.0, 3.0),   // same price, lower qty → dominated
      (4L, 1L, 12.0, 5.0),   // equal qty, more expensive → dominated by #1
      (5L, 1L, 12.0, 7.0),   // frontier (pays more, gets more)
      (6L, 1L, 15.0, 7.0),   // equal qty, more expensive → dominated by #5
      (7L, 1L, 20.0, 9.0),   // frontier: global max qty at the top price
      (8L, 1L, 20.0, 9.0),   // duplicate of the global max — survives
      (9L, 1L, 8.0, 1.0),    // frontier: cheapest row
      (10L, 1L, 9.0, 1.0))   // equal qty, pricier than #9 → dominated
    val dir = Files.createTempDirectory("graft-skyline").toString
    import spark.implicits._
    rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")

    val got = SparkEntry.queries("q_skyline")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == bruteForceSkyline(rows),
      s"got ${got.mkString(",")} want ${bruteForceSkyline(rows).mkString(",")}")
  }
}
