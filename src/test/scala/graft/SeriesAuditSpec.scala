package graft

/** Independent in-memory verification for the series/audit operators
  * whose DuckDB oracle shares the relational rewrite (the
  * SkylineSpec/GraphSpec/AuditStatsSpec convention): recompute each
  * statistic from collected raw rows with plain Scala arithmetic — the
  * textbook sequential definition, not the windowed/pair-join rewrite
  * — and compare at sf0.001.
  */
class SeriesAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** First 32 md5 bits of s as an unsigned long — the repo's portable
    * h32 convention, recomputed independently for parity checks. */
  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
  }


  /** Daily sums of a timestamp/value pair, keyed by epoch day. */
  private def dailySeries(table: String, tsCol: String, vCol: String): Seq[(Long, Double)] =
    Tables(spark, sf, table)
      .select(org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col(tsCol)),
          org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("1970-01-01")))
        .cast("long").as("d"),
        org.apache.spark.sql.functions.col(vCol).cast("decimal(18,6)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getDecimal(1)))
      .groupBy(_._1).view
      .mapValues(_.map(_._2.asInstanceOf[java.math.BigDecimal])
        .reduce(_ add _).doubleValue)
      .toSeq.sortBy(_._1)

  test("q_changepoint_cusum matches the direct max(0,·) recurrence") {
    val daily = dailySeries("events", "ts", "value")
    val xs = daily.map(_._2)
    val n = xs.length
    val mu = xs.sum / n
    val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
    val k = 0.5 * sigma
    // the textbook sequential recurrence — NOT the cumsum-minus-runmin
    // rewrite the query (and oracle) use
    var (sp, sm) = (0.0, 0.0)
    val expected = xs.map { x =>
      sp = math.max(0.0, sp + (x - mu - k))
      sm = math.max(0.0, sm + (mu - k - x))
      (sp, sm)
    }
    val got = SparkEntry.queries("q_changepoint_cusum")(spark, sf)
      .orderBy("d").collect()
    assert(got.length == n)
    got.zip(expected).foreach { case (r, (esp, esm)) =>
      assert(math.abs(r.getAs[Double]("cusum_pos") - esp) < 1e-4,
        s"day ${r.getAs[Long]("d")}: ${r.getAs[Double]("cusum_pos")} vs $esp")
      assert(math.abs(r.getAs[Double]("cusum_neg") - esm) < 1e-4)
    }
  }

  test("q_mann_kendall matches the brute-force pair statistic") {
    // recomputed over BigDecimal day sums so ties are exact, matching
    // the engine's DECIMAL collapse
    val daily = Tables(spark, sf, "orders")
      .groupBy(org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("o_orderdate")),
          org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("1970-01-01")))
        .cast("long").as("d"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("o_totalprice").cast("decimal(18,6)"))
        .cast("decimal(15,4)").as("rev"))
      .collect()
      .map(r => (r.getLong(0), r.getDecimal(1)))
      .sortBy(_._1)
    val n = daily.length
    var s = 0L
    for (i <- 0 until n; j <- i + 1 until n) {
      val c = daily(j)._2.compareTo(daily(i)._2)
      s += (if (c > 0) 1 else if (c < 0) -1 else 0)
    }
    val ties = daily.groupBy(_._2).values.map(_.size.toLong).filter(_ > 1)
    val tt = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - tt) / 18.0
    val z =
      if (s > 0) (s - 1) / math.sqrt(varS)
      else if (s < 0) (s + 1) / math.sqrt(varS)
      else 0.0

    val r = SparkEntry.queries("q_mann_kendall")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[Long]("s") == s)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5,
      s"engine ${r.getAs[Double]("z")} vs independent $z")
  }

  test("q_seasonal_dow components reconstruct and match a direct moving average") {
    val daily = dailySeries("events", "ts", "value")
    val trend = daily.indices.map { i =>
      val lo = math.max(0, i - 3)
      val hi = math.min(daily.length - 1, i + 3)
      (lo to hi).map(daily(_)._2).sum / (hi - lo + 1)
    }
    val got = SparkEntry.queries("q_seasonal_dow")(spark, sf)
      .orderBy("d").collect()
    assert(got.length == daily.length)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getAs[Double]("trend") - trend(i)) < 1e-4)
      // decomposition identity: rev = trend + seasonal + resid
      val back = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(back - daily(i)._2) < 1e-4)
      assert(r.getAs[Long]("dow") == (daily(i)._1 + 3) % 7)
    }
  }

  test("q_benford chi2 matches an in-memory first-digit computation") {
    val prices = Tables(spark, sf, "orders")
      .select("o_totalprice").collect().map(_.getDouble(0)).filter(_ > 0)
    val digits = prices.map(p =>
      new java.math.BigDecimal(p)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .toPlainString.dropWhile(c => !('1' to '9').contains(c)).head.asDigit)
    val n = digits.length.toDouble
    val chi2 = (1 to 9).map { d =>
      val p = math.log10(1 + 1.0 / d)
      val obs = digits.count(_ == d).toDouble
      (obs - n * p) * (obs - n * p) / (n * p)
    }.sum
    val rows = SparkEntry.queries("q_benford")(spark, sf).collect()
    assert(rows.length == 9)
    assert(rows.map(_.getAs[Long]("obs")).sum == digits.length.toLong)
    assert(math.abs(rows.head.getAs[Double]("chi2") - chi2) < 1e-3,
      s"engine ${rows.head.getAs[Double]("chi2")} vs independent $chi2")
  }

  test("q_kanonymity suppression rate matches an in-memory group count") {
    val rows = Tables(spark, sf, "customer")
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1),
        math.floor(r.getDouble(2) / 2000).toLong))
    val groups = rows.groupBy(identity).view.mapValues(_.length).toMap
    val risky = groups.values.filter(_ < 5).sum.toDouble
    val rate = risky / rows.length
    val got = SparkEntry.queries("q_kanonymity")(spark, sf).collect()
    assert(got.map(r => r.getAs[Long]("n_rows")).sum == rows.length.toLong)
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("suppression_rate") - rate) < 1e-5)
      assert(r.getAs[Boolean]("risky") == (r.getAs[Long]("k") < 5))
    }
  }

  test("q_open_intervals matches a brute-force per-day interval count") {
    val intervals = Tables(spark, sf, "orders")
      .select(org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("o_orderdate")),
          org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("1970-01-01")))
        .cast("long").as("d0"),
        org.apache.spark.sql.functions.col("o_orderpriority"))
      .collect()
      .map { r =>
        val dur = r.getString(1) match {
          case "1-URGENT" => 7L; case "2-HIGH" => 14L; case _ => 21L
        }
        (r.getLong(0), r.getLong(0) + dur)
      }
    val got = SparkEntry.queries("q_open_intervals")(spark, sf)
      .orderBy("d").collect()
    // brute force: for each output day, count intervals with s ≤ d < e
    val expected = got.map(_.getAs[Long]("d"))
      .map(d => intervals.count(iv => iv._1 <= d && d < iv._2).toLong)
    assert(got.map(_.getAs[Long]("open_n")).toSeq == expected.toSeq)
    val mx = expected.max
    got.foreach(r =>
      assert(r.getAs[Boolean]("is_peak") == (r.getAs[Long]("open_n") == mx)))
  }

  test("q_dsir_weights matches an in-memory two-model importance computation") {
    val target = Set("src1", "src2", "src3")
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, src, text) =>
      text.split(" ", -1).map(t => (id, src, h32(t) % 4096))
    }
    val cr = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ct = toks.filter(t => target(t._2)).groupBy(_._3).view
      .mapValues(_.length.toLong).toMap
    val nr = toks.length.toLong
    val nt = toks.count(t => target(t._2)).toLong
    val weights = toks.groupBy(_._1).view.mapValues { ts =>
      ts.map { case (_, _, b) =>
        math.log(((ct.getOrElse(b, 0L) + 1) * (nr + 4096)).toDouble /
          ((cr(b) + 1) * (nt + 4096)))
      }.sum
    }.toMap
    val top = weights.toSeq.sortBy { case (id, w) => (-w, id) }.take(20)
    val got = SparkEntry.queries("q_dsir_weights")(spark, sf).collect()
    assert(got.length == 20)
    got.zip(top).foreach { case (r, (id, w)) =>
      assert(r.getAs[Long]("doc_id") == id,
        s"rank order: got ${r.getAs[Long]("doc_id")} expected $id")
      assert(math.abs(r.getAs[Double]("weight") - w) < 1e-4)
    }
  }

  test("q_survival_km matches the direct sequential product-limit estimate") {
    val rows = Tables(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    def day(t: java.sql.Timestamp): Long =
      t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
    val byUser = rows.groupBy(_._1)
    val endDay = day(rows.map(_._3).maxBy(_.getTime))
    val durations = byUser.values.map { es =>
      val first = day(es.map(_._3).minBy(_.getTime))
      val convs = es.filter(_._2 == "purchase").map(_._3)
      if (convs.nonEmpty) (day(convs.minBy(_.getTime)) - first, true)
      else (endDay - first, false)
    }.toSeq
    // textbook product-limit walk over distinct times
    var atRisk = durations.size.toLong
    var surv = 1.0
    val expected = durations.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (t, group) =>
        val d = group.count(_._2).toLong
        val out = if (d > 0) {
          val risk = atRisk
          surv *= (1.0 - d.toDouble / risk)
          Some((t, risk, d, surv))
        } else None
        atRisk -= group.size
        out
    }
    val got = SparkEntry.queries("q_survival_km")(spark, sf)
      .orderBy("t_days").collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (t, risk, d, sv)) =>
      assert(r.getAs[Long]("t_days") == t)
      assert(r.getAs[Long]("n_risk") == risk)
      assert(r.getAs[Long]("n_events") == d)
      assert(math.abs(r.getAs[Double]("survival") - sv) < 1e-5,
        s"t=$t: ${r.getAs[Double]("survival")} vs $sv")
    }
  }

  test("q_burst_detect flags exactly the hours above the Poisson 3-sigma line") {
    val hours = Tables(spark, sf, "events")
      .select("ts").collect()
      .map(r => r.getTimestamp(0).getTime / 3600000L)
    val counts = hours.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val span = counts.keys.max - counts.keys.min + 1
    val mu = hours.length.toDouble / span
    val expected = counts.filter { case (_, c) => c > mu + 3 * math.sqrt(mu) }
    val got = SparkEntry.queries("q_burst_detect")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val h = r.getAs[java.sql.Timestamp]("hr").getTime / 3600000L
      val c = expected(h)
      assert(r.getAs[Long]("c") == c)
      assert(math.abs(r.getAs[Double]("z") - (c - mu) / math.sqrt(mu)) < 1e-3)
    }
  }

  test("q_interarrival matches in-memory gap percentiles") {
    val evs = Tables(spark, sf, "events")
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    // epoch µs: getTime's millis component duplicates the top of
    // getNanos — take whole seconds from getTime, fraction from nanos
    def us(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val gaps = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (us(e._3), e._2)).toSeq
      sorted.zip(sorted.tail).map { case (a, b) => (us(b._3) - us(a._3)) / 1e6 }
    }.toSeq.sorted
    def pct(p: Double): Double = {
      val idx = p * (gaps.length - 1)
      val lo = idx.toInt
      if (lo == gaps.length - 1) gaps(lo)
      else gaps(lo) + (idx - lo) * (gaps(lo + 1) - gaps(lo))
    }
    val r = SparkEntry.queries("q_interarrival")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_gaps") == gaps.length.toLong)
    assert(math.abs(r.getAs[Double]("mean_s") - gaps.sum / gaps.length) < 1e-3)
    assert(math.abs(r.getAs[Double]("p50_s") - pct(0.5)) < 1e-3)
    assert(math.abs(r.getAs[Double]("p90_s") - pct(0.9)) < 1e-3)
    assert(math.abs(r.getAs[Double]("p99_s") - pct(0.99)) < 1e-3)
  }

  test("q_theil_sen matches the in-memory median-of-slopes (exact selection check)") {
    val daily = Tables(spark, sf, "orders")
      .groupBy(org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("o_orderdate")),
          org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("1970-01-01")))
        .cast("long").as("d"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("o_totalprice").cast("decimal(18,6)"))
        .cast("decimal(15,4)").as("rev"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1).doubleValue))
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2) / (daily(j)._1 - daily(i)._1)).sorted
    def med(xs: Seq[Double]): Double = {
      val idx = 0.5 * (xs.length - 1)
      val lo = idx.toInt
      if (lo == xs.length - 1) xs(lo)
      else xs(lo) + (idx - lo) * (xs(lo + 1) - xs(lo))
    }
    val icepts = daily.map { case (d, rev) => rev - med(slopes) * d }.sorted
    val r = SparkEntry.queries("q_theil_sen")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
    assert(math.abs(r.getAs[Double]("slope_per_day") - med(slopes)) < 1e-4,
      s"engine ${r.getAs[Double]("slope_per_day")} vs independent ${med(slopes)}")
    assert(math.abs(r.getAs[Double]("intercept") - med(icepts.toIndexedSeq)) < 1e-2)
  }

  test("q_winsorize matches in-memory clipped means") {
    val rows = Tables(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val sorted = rows.map(_._2).sorted
    def pct(p: Double): Double = {
      val idx = p * (sorted.length - 1)
      val lo = idx.toInt
      if (lo == sorted.length - 1) sorted(lo)
      else sorted(lo) + (idx - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val (p01, p99) = (pct(0.01), pct(0.99))
    val got = SparkEntry.queries("q_winsorize")(spark, sf).collect()
    assert(got.map(_.getAs[Long]("n")).sum == rows.length.toLong)
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val vs = rows.filter(_._1 == et).map(_._2)
      val ws = vs.map(v => math.min(math.max(v, p01), p99))
      assert(math.abs(r.getAs[Double]("raw_mean") - vs.sum / vs.length) < 1e-3)
      assert(math.abs(r.getAs[Double]("wins_mean") - ws.sum / ws.length) < 1e-3)
      assert(r.getAs[Long]("n_clipped") == vs.count(v => v < p01 || v > p99).toLong)
      assert(math.abs(r.getAs[Double]("p01") - p01) < 1e-3)
      assert(math.abs(r.getAs[Double]("p99") - p99) < 1e-3)
    }
  }

  test("q_holt_linear matches the direct sequential recurrence") {
    // the query rounds day sums to DECIMAL(15,4) before the double
    // conversion — mirror that here or x comparisons drift at 5e-5
    val daily = dailySeries("events", "ts", "value")
      .map { case (d, v) => (d, BigDecimal(v)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    val xs = daily.map(_._2)
    var l = xs(0)
    var b = if (xs.length > 1) xs(1) - xs(0) else 0.0
    val expected = xs.zipWithIndex.map { case (x, i) =>
      if (i > 0) {
        val l2 = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (l2 - l) + 0.7 * b
        l = l2
      }
      (l, b)
    }
    val got = SparkEntry.queries("q_holt_linear")(spark, sf)
      .orderBy("d").collect()
    assert(got.length == daily.length)
    got.zip(expected).zip(daily).foreach { case ((r, (el, eb)), (d, x)) =>
      assert(r.getAs[Long]("d") == d)
      assert(math.abs(r.getAs[Double]("x") - x) < 1e-6)
      assert(math.abs(r.getAs[Double]("level") - el) < 1e-4)
      assert(math.abs(r.getAs[Double]("trend") - eb) < 1e-4)
      assert(math.abs(r.getAs[Double]("forecast_next") - (el + eb)) < 1e-3)
    }
  }

  test("q_delta_method matches an in-memory per-user ratio variance") {
    val rows = Tables(spark, sf, "events")
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val perUser = rows.groupBy(_._1).map { case (uid, es) =>
      val x = es.filter(_._2 == "purchase")
        .map(e => BigDecimal(e._3).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      (h32(uid.toString) % 2, x, es.length.toDouble)
    }.toSeq
    val got = SparkEntry.queries("q_delta_method")(spark, sf).collect()
    assert(got.length == 2)
    got.foreach { r =>
      val v = r.getAs[Long]("variant")
      val us = perUser.filter(_._1 == v)
      val n = us.length.toDouble
      val (mx, my) = (us.map(_._2).sum / n, us.map(_._3).sum / n)
      val ratio = us.map(_._2).sum / us.map(_._3).sum
      val varX = us.map(u => u._2 * u._2).sum / n - mx * mx
      val varY = us.map(u => u._3 * u._3).sum / n - my * my
      val covXY = us.map(u => u._2 * u._3).sum / n - mx * my
      val se = math.sqrt(math.max(0.0,
        (varX + ratio * ratio * varY - 2 * ratio * covXY) / (my * my)) / n)
      assert(r.getAs[Long]("n") == us.length.toLong)
      assert(math.abs(r.getAs[Double]("ratio") - ratio) < 1e-5)
      assert(math.abs(r.getAs[Double]("se_delta") - se) < 1e-5,
        s"variant $v: ${r.getAs[Double]("se_delta")} vs $se")
    }
  }

  test("q_holt_winters matches the direct sequential triple-smoothing recurrence") {
    val daily = dailySeries("events", "ts", "value")
      .map { case (d, v) => (d, BigDecimal(v)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    val sl = Array.fill(7)(0.0)
    var l = daily(0)._2
    var b = daily(1)._2 - daily(0)._2
    val expected = daily.zipWithIndex.map { case ((d, x), i) =>
      if (i > 0) {
        val slot = ((d + 3) % 7).toInt
        val sOld = sl(slot)
        val lnew = 0.5 * (x - sOld) + 0.5 * (l + b)
        b = 0.3 * (lnew - l) + 0.7 * b
        sl(slot) = 0.4 * (x - lnew) + 0.6 * sOld
        l = lnew
      }
      (l, b, l + b + sl(((d + 1 + 3) % 7).toInt))
    }
    val got = SparkEntry.queries("q_holt_winters")(spark, sf)
      .orderBy("d").collect()
    assert(got.length == daily.length)
    got.zip(expected).foreach { case (r, (el, eb, ef)) =>
      assert(math.abs(r.getAs[Double]("level") - el) < 1e-4)
      assert(math.abs(r.getAs[Double]("trend") - eb) < 1e-4)
      assert(math.abs(r.getAs[Double]("forecast_next") - ef) < 1e-3)
    }
  }

  test("q_xcorr_lagged matches in-memory Pearson correlations per lag") {
    val rows = Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("ts")),
          org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("1970-01-01")))
        .cast("long").as("d"), org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value").cast("decimal(15,4)").as("v"))
      .collect()
    val byDay = rows.groupBy(_.getLong(0))
    val x = byDay.view.mapValues(rs => rs
      .filter(_.getString(1) == "purchase")
      .map(r => BigDecimal(r.getDecimal(2))).sum.toDouble).toMap
    val y = byDay.view.mapValues(rs =>
      rs.count(_.getString(1) == "view").toDouble).toMap
    def pearson(ps: Seq[(Double, Double)]): Double = {
      val n = ps.length
      val (sx, sy) = (ps.map(_._1).sum, ps.map(_._2).sum)
      val sxy = ps.map(p => p._1 * p._2).sum
      val sx2 = ps.map(p => p._1 * p._1).sum
      val sy2 = ps.map(p => p._2 * p._2).sum
      (n * sxy - sx * sy) /
        math.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
    }
    val got = SparkEntry.queries("q_xcorr_lagged")(spark, sf).collect()
    assert(got.length == 8)
    got.foreach { r =>
      val lag = r.getAs[Long]("lag_d")
      val ps = x.keys.toSeq.sorted.flatMap(d =>
        y.get(d + lag).map(yv => (x(d), yv)))
      assert(r.getAs[Long]("n_days") == ps.length)
      assert(math.abs(r.getAs[Double]("r") - pearson(ps)) < 1e-6,
        s"lag $lag: ${r.getAs[Double]("r")} vs ${pearson(ps)}")
    }
  }

  test("q_ols_multi matches an in-memory normal-equations solve per group") {
    val rows = Tables(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val got = SparkEntry.queries("q_ols_multi")(spark, sf).collect()
    assert(got.length == rows.map(_._1).distinct.length)
    got.foreach { r =>
      val rf = r.getAs[String]("rf")
      val g = rows.filter(_._1 == rf)
      val n = g.length.toDouble
      val (s1, s2, sy) = (g.map(_._2).sum, g.map(_._3).sum, g.map(_._4).sum)
      val s11 = g.map(t => t._2 * t._2).sum
      val s12 = g.map(t => t._2 * t._3).sum
      val s22 = g.map(t => t._3 * t._3).sum
      val s1y = g.map(t => t._2 * t._4).sum
      val s2y = g.map(t => t._3 * t._4).sum
      val syy = g.map(t => t._4 * t._4).sum
      val (a11, a12, a22) =
        (n * s11 - s1 * s1, n * s12 - s1 * s2, n * s22 - s2 * s2)
      val (b1, b2) = (n * s1y - s1 * sy, n * s2y - s2 * sy)
      val det = a11 * a22 - a12 * a12
      val beta1 = (b1 * a22 - b2 * a12) / det
      val beta2 = (a11 * b2 - a12 * b1) / det
      val beta0 = (sy - beta1 * s1 - beta2 * s2) / n
      val r2 = (beta1 * b1 + beta2 * b2) / (n * syy - sy * sy)
      assert(math.abs(r.getAs[Double]("beta0") - beta0) < 1e-3, s"$rf beta0")
      assert(math.abs(r.getAs[Double]("beta1") - beta1) < 1e-4, s"$rf beta1")
      assert(math.abs(r.getAs[Double]("beta2") - beta2) < 1e-2, s"$rf beta2")
      assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-6, s"$rf r2")
    }
  }

  test("q_growth_accounting matches in-memory lifecycle classification") {
    val uw = Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("ts")),
          org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / 7)).distinct
    val byUser = uw.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val maxW = uw.map(_._2).max
    val weeks = uw.map(_._2).distinct
    def cnt(f: (Set[Long], Long) => Boolean, w: Long) =
      byUser.values.count(ws => f(ws, w)).toLong
    val got = SparkEntry.queries("q_growth_accounting")(spark, sf)
      .collect().map(r => r.getAs[Long]("w") ->
        ((r.getAs[Long]("new_u"), r.getAs[Long]("retained"),
          r.getAs[Long]("resurrected"), r.getAs[Long]("churned")))).toMap
    // every activity week AND every week the query emitted (gap weeks
    // can appear as churn-only rows), all within the corpus horizon
    val allW = (weeks ++ got.keys).distinct.filter(_ <= maxW)
    allW.foreach { w =>
      val nw = cnt((ws, w) => ws.contains(w) && ws.min == w, w)
      val ret = cnt((ws, w) => ws.contains(w) && ws.contains(w - 1), w)
      val res = cnt((ws, w) =>
        ws.contains(w) && !ws.contains(w - 1) && ws.min < w, w)
      val chu = cnt((ws, w) => ws.contains(w - 1) && !ws.contains(w), w)
      val g = got.getOrElse(w, (0L, 0L, 0L, 0L))
      assert(g == ((nw, ret, res, chu)), s"week $w: $g vs ${(nw, ret, res, chu)}")
    }
    assert(!got.keys.exists(_ > maxW), "churn attributed past the horizon")
  }

  test("q_forecast_eval matches a direct sequential backtest walk") {
    val rev = Tables(spark, sf, "events")
      .where(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select(org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("ts")),
          org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("1970-01-01")))
        .cast("long").as("d"),
        org.apache.spark.sql.functions.col("value").cast("decimal(18,6)").as("v"))
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => BigDecimal(r.getDecimal(1))).sum
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .toSeq.sortBy(_._1).map(_._2)
    def metrics(pairs: Seq[(Double, Double)]): (Long, Double, Double, Double) = {
      val n = pairs.length
      val errs = pairs.map { case (a, f) => a - f }
      (n.toLong, errs.map(math.abs).sum / n,
        math.sqrt(errs.map(e => e * e).sum / n),
        pairs.zip(errs).map { case ((a, _), e) => math.abs(e) / a }.sum * 100 / n)
    }
    val naive = metrics((1 until rev.length).map(i => (rev(i), rev(i - 1))))
    val ma = metrics((7 until rev.length).map(i =>
      (rev(i), rev.slice(i - 7, i).sum / 7)))
    val got = SparkEntry.queries("q_forecast_eval")(spark, sf)
      .collect().map(r => r.getAs[String]("model") ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("mae"),
          r.getAs[Double]("rmse"), r.getAs[Double]("mape")))).toMap
    for ((name, exp) <- Seq("naive" -> naive, "ma7" -> ma)) {
      val g = got(name)
      assert(g._1 == exp._1, s"$name n_days")
      assert(math.abs(g._2 - exp._2) < 1e-3, s"$name mae ${g._2} vs ${exp._2}")
      assert(math.abs(g._3 - exp._3) < 1e-3, s"$name rmse")
      assert(math.abs(g._4 - exp._4) < 1e-4, s"$name mape")
    }
  }

  test("q_eval_prf matches in-memory confusion counts") {
    val rows = Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("ts")),
          org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long").as("d"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect()
      .map(r => (r.getLong(1), h32(r.getLong(0).toString) % 1000 >= 500,
        r.getString(2) == "purchase"))
    val got = SparkEntry.queries("q_eval_prf")(spark, sf).collect()
    assert(got.length == rows.map(_._1).distinct.length)
    got.foreach { r =>
      val d = r.getAs[Long]("d")
      val g = rows.filter(_._1 == d)
      val tp = g.count(t => t._2 && t._3).toLong
      val fp = g.count(t => t._2 && !t._3).toLong
      val fn = g.count(t => !t._2 && t._3).toLong
      val tn = g.count(t => !t._2 && !t._3).toLong
      assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn")) == ((tp, fp, fn, tn)), s"day $d")
      assert(math.abs(r.getAs[Double]("f1")
        - 2.0 * tp / (2 * tp + fp + fn)) < 1e-6)
    }
  }

  test("q_decile_lift matches in-memory decile aggregation") {
    val rows = Tables(spark, sf, "events")
      .select("event_id", "event_type").collect()
      .map(r => (h32(r.getLong(0).toString) % 1000 / 100,
        r.getString(1) == "purchase"))
    val nn = rows.length.toDouble
    val pp = rows.count(_._2).toDouble
    val got = SparkEntry.queries("q_decile_lift")(spark, sf)
      .orderBy(org.apache.spark.sql.functions.desc("decile")).collect()
    assert(got.length == 10)
    var cum = 0L
    got.foreach { r =>
      val dec = r.getAs[Long]("decile")
      val g = rows.filter(_._1 == dec)
      val pos = g.count(_._2).toLong
      cum += pos
      assert(r.getAs[Long]("n") == g.length && r.getAs[Long]("pos") == pos)
      assert(math.abs(r.getAs[Double]("lift") - pos * nn / (g.length * pp)) < 1e-6)
      assert(math.abs(r.getAs[Double]("cum_capture") - cum / pp) < 1e-6)
    }
  }

  test("q_dp_noise equals count plus the Laplace draw from the same md5 seed") {
    val counts = Tables(spark, sf, "events")
      .select("event_type").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q_dp_noise")(spark, sf).collect()
    assert(got.length == counts.size)
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val u = (h32(et + ":dp") % 1000000L + 0.5) / 1000000.0
      val noise = -2.0 * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val expected = BigDecimal(counts(et) + noise)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("noisy_count") - expected) < 1e-9,
        s"$et: ${r.getAs[Double]("noisy_count")} vs $expected")
      assert(r.getAs[Double]("epsilon") == 0.5)
    }
  }
}
