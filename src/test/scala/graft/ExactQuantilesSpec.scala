package graft

import org.apache.spark.sql.functions._

/** The sketch-guided exact-quantile core must equal Spark's exact
  * `percentile` (≡ DuckDB quantile_cont) on EVERY input size — the
  * large-n path through the guaranteed GK bracket, and the small-n
  * path through the detected-fallback (the regime where the sketch's
  * minimum 1-rank tolerance exceeds the band width and the selection
  * would otherwise go NaN: reproduced at odd n ≤ ~499 before the
  * guard existed, review find r7).
  */
class ExactQuantilesSpec extends SparkSpec {

  import operators.ExactQuantiles

  private def check(values: Seq[Double], qs: Seq[Double]): Unit = {
    import spark.implicits._
    val df = values.toDF("x")
    val names = qs.indices.map(i => s"q$i")
    val got = ExactQuantiles(df, "x", qs, names).collect()(0)
    val exp = df.agg(count(lit(1)).as("n"),
      qs.zipWithIndex.map { case (q, i) =>
        expr(s"percentile(x, $q)").as(s"q$i") }: _*).collect()(0)
    assert(got.getLong(0) == exp.getLong(0), s"n for $qs over ${values.size}")
    qs.indices.foreach { i =>
      val (g, e) = (got.getDouble(i + 1), exp.getDouble(i + 1))
      assert(java.lang.Double.isFinite(g), s"non-finite q=${qs(i)} n=${values.size}")
      assert(math.abs(g - e) < 1e-9,
        s"q=${qs(i)} over n=${values.size}: $g vs $e")
    }
  }

  test("median matches exact percentile across the small-n fallback regime") {
    val rnd = new scala.util.Random(7)
    // odd and even n straddling the bracket-holds threshold,
    // including the reproduced NaN sizes 21/101/499
    for (n <- Seq(1, 2, 3, 21, 101, 499, 500, 2000, 20001))
      check(Seq.fill(n)(rnd.nextDouble() * 1000 - 500), Seq(0.5))
  }

  test("multi-quantile selection matches exact percentiles") {
    val rnd = new scala.util.Random(11)
    val vs = Seq.fill(30000)(rnd.nextGaussian() * 40 + 7)
    check(vs, Seq(0.01, 0.99))
    check(vs, Seq(0.5, 0.9, 0.99))
  }

  test("point masses and ties select exactly") {
    // heavy ties: the grouped pass must keep rank spans exact when
    // one value carries most of the mass
    val vs = Seq.fill(10000)(42.0) ++ Seq.fill(4000)(1.0) ++ Seq.fill(4000)(99.0)
    check(vs, Seq(0.5))
    check(vs, Seq(0.01, 0.99))
  }

  test("null rows are ignored (quantile_cont semantics), not ranked") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vals = Seq.fill(3000)(rnd.nextDouble() * 100)
    // half the rows null: n must count only non-null values and every
    // quantile must equal the nulls-excluded exact percentile (the
    // pre-fix behavior inflated n, shifted every rank, and the finite
    // gap-midpoint groups could absorb the shift undetected)
    val df = (vals.map(Option(_)) ++ Seq.fill(3000)(Option.empty[Double]))
      .toDF("x")
    val got = ExactQuantiles(df, "x", Seq(0.25, 0.75), Seq("p25", "p75"))
      .collect()(0)
    val exp = vals.toDF("x").agg(
      expr("percentile(x, 0.25)").as("p25"),
      expr("percentile(x, 0.75)").as("p75")).collect()(0)
    assert(got.getLong(0) == 3000L, s"n must exclude nulls: ${got.getLong(0)}")
    assert(math.abs(got.getDouble(1) - exp.getDouble(0)) < 1e-9)
    assert(math.abs(got.getDouble(2) - exp.getDouble(1)) < 1e-9)
  }

  test("empty input yields n=0 and null quantiles") {
    import spark.implicits._
    val out = ExactQuantiles(Seq.empty[Double].toDF("x"), "x",
      Seq(0.5), Seq("med")).collect()(0)
    assert(out.getLong(0) == 0L && out.isNullAt(1))
  }
}
