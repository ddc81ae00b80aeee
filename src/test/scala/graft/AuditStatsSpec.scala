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

  test("q_assoc_rules matches in-memory basket pair statistics") {
    val baskets = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val n = baskets.map(_._1).distinct.length.toDouble
    val sup = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = baskets.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2)
    val got = SparkEntry.queries("q_assoc_rules")(spark, sf).collect()
    assert(got.length == math.min(25, pairs.size))
    got.foreach { r =>
      val (p1, p2) = (r.getAs[Long]("p1"), r.getAs[Long]("p2"))
      val both = pairs((p1, p2))
      assert(r.getAs[Long]("n_both") == both)
      assert(math.abs(r.getAs[Double]("support") - both / n) < 1e-5)
      assert(math.abs(r.getAs[Double]("confidence") - both.toDouble / sup(p1)) < 1e-5)
      assert(math.abs(r.getAs[Double]("lift")
        - both * n / (sup(p1).toDouble * sup(p2))) < 1e-4)
    }
  }

  test("q_zipf_fit matches an in-memory least-squares fit") {
    val freqs = Tables(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(500)
    val pts = freqs.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble))
    }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val (sx2, sy2) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._2 * p._2).sum)
    val slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    val intercept = (sy - slope * sx) / n
    val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
    val r = SparkEntry.queries("q_zipf_fit")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n") == pts.length.toLong)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-5)
    assert(math.abs(r.getAs[Double]("intercept") - intercept) < 1e-5)
    assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-5)
  }

  test("q_corpus_diversity matches in-memory entropy/Simpson indices") {
    val rows = Tables(spark, sf, "documents")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = SparkEntry.queries("q_corpus_diversity")(spark, sf).collect()
    assert(got.map(_.getAs[String]("lang")).toSet == rows.map(_._1).toSet)
    got.foreach { r =>
      val lang = r.getAs[String]("lang")
      val srcs = rows.filter(_._1 == lang).map(_._2)
      val nLang = srcs.length.toDouble
      val ps = srcs.groupBy(identity).values.map(_.length / nLang)
      val shannon = -ps.map(p => p * math.log(p)).sum
      val simpson = 1.0 - ps.map(p => p * p).sum
      assert(r.getAs[Long]("n_docs") == srcs.length.toLong)
      assert(r.getAs[Long]("n_sources") == ps.size.toLong)
      assert(math.abs(r.getAs[Double]("shannon") - shannon) < 1e-5)
      assert(math.abs(r.getAs[Double]("simpson") - simpson) < 1e-5)
      assert(math.abs(r.getAs[Double]("eff_sources") - math.exp(shannon)) < 1e-4)
    }
  }
}
