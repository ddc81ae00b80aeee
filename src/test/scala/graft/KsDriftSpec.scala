package graft

import org.apache.spark.sql.functions._

import graft.operators.StatsQueries

/** Property checks for the reusable two-sample KS operator — the
  * oracle hash-match on q_ks_drift proves engine parity on ONE input;
  * these pin the statistic's defining properties on adversarial
  * shapes (ties within and across samples, disjoint supports).
  */
class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ks(a: Seq[Double], b: Seq[Double]) =
    StatsQueries.ksTest(a.toDF("x"), b.toDF("x"), col("x")).collect()(0)

  test("identical samples: D = 0, no rejection") {
    val r = ks(Seq(1.0, 2, 2, 3, 5), Seq(1.0, 2, 2, 3, 5))
    assert(r.getAs[Long]("ks_num") == 0L)
    assert(r.getAs[Double]("ks_stat") == 0.0)
    assert(r.getAs[Int]("reject_05") == 0)
  }

  test("disjoint supports: D = 1, rejected at alpha=0.05") {
    val a = (1 to 10).map(_.toDouble)
    val b = (101 to 110).map(_.toDouble)
    val r = ks(a, b)
    assert(r.getAs[Double]("ks_stat") == 1.0)
    // c(0.05)·sqrt(20/100) ≈ 0.607 < 1
    assert(r.getAs[Int]("reject_05") == 1)
  }

  test("matches a brute-force CDF sweep incl. cross-sample ties") {
    val a = Seq(1.0, 2.0, 2.0, 3.0, 5.0, 7.0, 7.0, 9.0)
    val b = Seq(2.0, 3.0, 3.0, 4.0, 7.0, 8.0)
    val pts = (a ++ b).distinct.sorted
    val brute = pts.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.size -
        b.count(_ <= x).toDouble / b.size)
    }.max
    val r = ks(a, b)
    assert(r.getAs[Long]("n1") == a.size && r.getAs[Long]("n2") == b.size)
    val d = r.getAs[Long]("ks_num").toDouble / (a.size.toLong * b.size)
    assert(math.abs(d - brute) < 1e-12, s"engine D=$d brute D=$brute")
  }

  private def auc(pos: Seq[Double], neg: Seq[Double]) =
    StatsQueries.mannWhitney(pos.toDF("x"), neg.toDF("x"), col("x")).collect()(0)

  test("mannWhitney: perfect separation gives AUC 1, reversed gives 0") {
    val hi = Seq(10.0, 11, 12, 13)
    val lo = Seq(1.0, 2, 3)
    assert(auc(hi, lo).getAs[Double]("auc") == 1.0)
    assert(auc(lo, hi).getAs[Double]("auc") == 0.0)
  }

  test("mannWhitney: identical samples (all ties) give AUC 0.5") {
    val r = auc(Seq(5.0, 5, 7, 7), Seq(5.0, 5, 7, 7))
    assert(r.getAs[Double]("auc") == 0.5)
    assert(r.getAs[Double]("z_approx") == 0.0)
  }

  test("mannWhitney: matches brute-force pair counting with ties") {
    val pos = Seq(1.0, 3.0, 3.0, 6.0, 8.0)
    val neg = Seq(2.0, 3.0, 5.0, 8.0, 9.0, 9.0)
    val pairs = for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    val brute = pairs.sum / (pos.size * neg.size)
    val r = auc(pos, neg)
    val engine = r.getAs[Long]("u1_x2").toDouble / (2.0 * pos.size * neg.size)
    assert(math.abs(engine - brute) < 1e-12, s"engine $engine brute $brute")
  }

  test("randomized brute-force parity: 12 seeded cases, tie-heavy domains") {
    // Fixed seed: deterministic cases, zero flake. Values drawn from a
    // SMALL integer domain (then /4) so within- and cross-sample ties
    // are dense — the hard regime for rank/CDF bookkeeping.
    val rnd = new scala.util.Random(20260813L)
    (1 to 12).foreach { i =>
      val a = Seq.fill(3 + rnd.nextInt(40))(rnd.nextInt(12) / 4.0)
      val b = Seq.fill(3 + rnd.nextInt(40))(rnd.nextInt(12) / 4.0)
      // KS vs brute-force CDF sweep
      val pts = (a ++ b).distinct.sorted
      val bruteD = pts.map { x =>
        math.abs(a.count(_ <= x).toDouble / a.size -
          b.count(_ <= x).toDouble / b.size)
      }.max
      val kr = ks(a, b)
      val engineD = kr.getAs[Long]("ks_num").toDouble / (a.size.toLong * b.size)
      assert(math.abs(engineD - bruteD) < 1e-12, s"case $i KS: $engineD vs $bruteD")
      // AUC vs brute-force pair counting
      val pairs = for (p <- a; n <- b) yield
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0
      val bruteAuc = pairs.sum / (a.size * b.size)
      val ar = auc(a, b)
      val engineAuc = ar.getAs[Long]("u1_x2").toDouble / (2.0 * a.size * b.size)
      assert(math.abs(engineAuc - bruteAuc) < 1e-12, s"case $i AUC: $engineAuc vs $bruteAuc")
    }
  }

  test("asymmetric sizes and null handling") {
    // nulls are ignored, not counted in n
    val a = Seq[java.lang.Double](1.0, null, 3.0, null, 5.0)
      .toDF("x").select(col("x").cast("double").as("x"))
    val b = Seq[java.lang.Double](2.0, 4.0)
      .toDF("x").select(col("x").cast("double").as("x"))
    val r = StatsQueries.ksTest(a, b, col("x")).collect()(0)
    assert(r.getAs[Long]("n1") == 3L)
    assert(r.getAs[Long]("n2") == 2L)
  }
}
