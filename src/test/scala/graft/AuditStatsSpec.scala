package graft

/** Independent verification for the audit statistics whose DuckDB
  * oracle SHARES the relational rewrite (the SkylineSpec/GraphSpec
  * convention): recompute chi-squared and Jensen–Shannon from
  * collected raw rows with plain Scala arithmetic — no Spark, no SQL,
  * no shared formula structure — and compare against the registered
  * queries at sf0.001.
  */
class AuditStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_chi2_independence matches an in-memory contingency computation") {
    val rows = Tables(spark, sf, "documents")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toDouble
    val byLang = rows.groupBy(_._1).view.mapValues(_.length).toMap
    val bySrc = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val obs = rows.groupBy(identity).view.mapValues(_.length).toMap
    val chi2 = (for {
      (l, rl) <- byLang.toSeq
      (s2, cs) <- bySrc.toSeq
    } yield {
      val e = rl * cs / n
      val o = obs.getOrElse((l, s2), 0).toDouble
      (o - e) * (o - e) / e
    }).sum
    val dof = (byLang.size - 1).toLong * (bySrc.size - 1)

    val r = SparkEntry.queries("q_chi2_independence")(spark, sf).collect()(0)
    assert(r.getAs[Long]("dof") == dof)
    assert(r.getAs[Long]("n") == rows.length.toLong)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-3,
      s"engine ${r.getAs[Double]("chi2")} vs independent $chi2")
  }

  test("q_js_divergence matches an in-memory distribution computation") {
    val docs = Tables(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def counts(src: String): Map[String, Long] = docs
      .filter(_._1 == src).flatMap(_._2.split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (ca, cb) = (counts("src1"), counts("src2"))
    val (n1, n2) = (ca.values.sum.toDouble, cb.values.sum.toDouble)
    val vocab = (ca.keySet ++ cb.keySet)
    val jsdNats = vocab.toSeq.map { tok =>
      val p = ca.getOrElse(tok, 0L) / n1
      val q = cb.getOrElse(tok, 0L) / n2
      val m = (p + q) / 2.0
      (if (p > 0) p * math.log(p / m) else 0.0) +
        (if (q > 0) q * math.log(q / m) else 0.0)
    }.sum / 2.0
    val jsdBits = jsdNats / math.log(2.0)

    val r = SparkEntry.queries("q_js_divergence")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n1") == n1.toLong && r.getAs[Long]("n2") == n2.toLong)
    assert(r.getAs[Long]("vocab") == vocab.size.toLong)
    assert(math.abs(r.getAs[Double]("jsd_bits") - jsdBits) < 1e-6,
      s"engine ${r.getAs[Double]("jsd_bits")} vs independent $jsdBits")
    // JSD in bits is bounded [0, 1]
    assert(r.getAs[Double]("jsd_bits") >= 0.0 && r.getAs[Double]("jsd_bits") <= 1.0)
  }
}
