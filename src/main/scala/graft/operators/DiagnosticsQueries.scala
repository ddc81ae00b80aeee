package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostic-test operators added in r13: ordered-alternative
  * k-sample tests (Jonckheere–Terpstra, Page), outlier/normality
  * screens (Grubbs, D'Agostino K²), structural-break and volatility
  * diagnostics (Chow, ARCH LM, Pettitt), EDF two-sample comparison
  * (Cramér–von Mises), spatial autocorrelation (Moran's I),
  * reliability/agreement reads (ICC, Cronbach's α), epidemiological
  * effect size (odds ratio) and the market-model risk family (CAPM β,
  * Sortino, Calmar). Conventions shared with the rest of the engine:
  * corpus-sized sums ride as exact DECIMAL; per-series math runs on
  * calendar-bounded frames (≤ ~2.4k days regardless of corpus scale)
  * with identical expression trees on both engines; critical values
  * are pinned double literals, never each engine's quantile function.
  */
object DiagnosticsQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)
  private def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef.sql(name, oracle)(fn)

  /** Shared daily-revenue collapse: the ONE corpus pass every
    * calendar-bounded diagnostic below starts from (exact DECIMAL day
    * sums — both engines see bit-identical doubles after the cast). */
  private def dailyRev(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))

  private val DailyRevSql =
    """daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rv
      |      FROM orders GROUP BY 1)""".stripMargin

  /** Shared nation×day revenue frame (the q_sharpe_ratio collapse). */
  private def nationDay(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))

  private val NationDaySql =
    """rev AS (SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
      |          sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rv
      |        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |        JOIN nation n ON n.n_nationkey = c.c_nationkey
      |        GROUP BY 1, 2)""".stripMargin

  /** The five region names, pinned in ladder order — the Elo oracle's
    * recursive-CTE state columns r0..r4 are THIS list positionally. */
  private val Regions =
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

  /** `CASE x WHEN 'AFRICA' THEN e.r0 ... ELSE e.r4 END` — the rating
    * of the region named by SQL expression `x` in the recursion row. */
  private def eloRatingOf(x: String): String =
    Regions.init.zipWithIndex
      .map { case (r, i) => s"WHEN '$r' THEN e.r$i" }
      .mkString(s"CASE $x ", " ", s" ELSE e.r${Regions.size - 1} END")

  /** The K·(1 − expected) Elo delta off the PRE-match ratings. */
  private def eloDeltaSql: String =
    s"""32 * (1 - 1 / (1 + power(10.0e0,
       |          ((${eloRatingOf("m.l")})
       |           - (${eloRatingOf("m.w")})) / 400.0e0)))""".stripMargin

  /** One recursion column: apply ±delta when this region is the
    * winner/loser of match t+1, else carry. */
  private def eloColSql(idx: Int): String = {
    val r = Regions(idx)
    s"""e.r$idx + CASE WHEN m.w = '$r' THEN $eloDeltaSql
       |        WHEN m.l = '$r' THEN -($eloDeltaSql)
       |        ELSE 0 END""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- Elo ratings from daily revenue "matches" ----
    // The sequential-rating operator: each day the top-revenue region
    // beats the runner-up (exact-decimal revenues, name tiebreak), and
    // ratings update by the classic Elo rule r += K(1 − E),
    // E = 1/(1+10^((r_l−r_w)/400)), K = 32, start 1500. The oracle is
    // a recursive CTE carrying the 5 ratings; the Spark side is the
    // q_hmm_forward sorted single-fold over the SAME match list with
    // the SAME operation order (delta computed once from pre-match
    // ratings, applied ±) — verified equal to an independent
    // from-definition fold on sf0.001. Days where fewer than two
    // regions traded are excluded (no opponent). 100-TB story: one
    // keyed corpus collapse to region×day, a per-day rank, then a
    // calendar-bounded (≤ ~2.4k step) fold — corpus scale only touches
    // the first collapse.
    sql(
      "q_elo_rating",
      s"""WITH rev AS (SELECT r.r_name, CAST(o.o_orderdate AS DATE) AS day,
        |        sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rv
        |      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |      JOIN nation n ON n.n_nationkey = c.c_nationkey
        |      JOIN region r ON r.r_regionkey = n.n_regionkey
        |      GROUP BY 1, 2),
        |rk AS (SELECT day, r_name,
        |        rank() OVER (PARTITION BY day ORDER BY rv DESC, r_name)
        |          AS pos
        |      FROM rev),
        |mt AS (SELECT day,
        |        max(CASE WHEN pos = 1 THEN r_name END) AS w,
        |        max(CASE WHEN pos = 2 THEN r_name END) AS l
        |      FROM rk GROUP BY 1),
        |ms AS (SELECT w, l,
        |        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
        |       FROM mt WHERE l IS NOT NULL),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ms),
        |rec AS (
        |  WITH RECURSIVE e(t, r0, r1, r2, r3, r4) AS (
        |    SELECT CAST(0 AS BIGINT), 1500.0e0, 1500.0e0, 1500.0e0,
        |           1500.0e0, 1500.0e0
        |    UNION ALL
        |    SELECT e.t + 1,
        |      ${eloColSql(0)},
        |      ${eloColSql(1)},
        |      ${eloColSql(2)},
        |      ${eloColSql(3)},
        |      ${eloColSql(4)}
        |    FROM e JOIN ms m ON m.t = e.t + 1
        |  )
        |  SELECT * FROM e WHERE t = (SELECT n FROM nn)
        |),
        |wins AS (SELECT w AS r_name, CAST(count(*) AS BIGINT) AS n_wins
        |         FROM ms GROUP BY 1),
        |fin AS (SELECT 'AFRICA' AS r_name, r0 AS rating FROM rec
        |  UNION ALL SELECT 'AMERICA', r1 FROM rec
        |  UNION ALL SELECT 'ASIA', r2 FROM rec
        |  UNION ALL SELECT 'EUROPE', r3 FROM rec
        |  UNION ALL SELECT 'MIDDLE EAST', r4 FROM rec)
        |SELECT f.r_name, round(f.rating, 6) + 0.0 AS elo_rating,
        |  coalesce(w.n_wins, 0) AS n_wins
        |FROM fin f LEFT JOIN wins w ON w.r_name = f.r_name
        |ORDER BY f.r_name""".stripMargin) { (s, dir) =>
      import s.implicits._
      val rev = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
      val rk = rev.select(col("day"), col("r_name"),
        rank().over(Window.partitionBy("day")
          .orderBy(col("rv").desc, col("r_name"))).as("pos"))
      val mt = rk.groupBy("day")
        .agg(max(when(col("pos") === 1, col("r_name"))).as("w"),
          max(when(col("pos") === 2, col("r_name"))).as("l"))
      val ms = mt.where(col("l").isNotNull)
        .select(col("w"), col("l"),
          row_number().over(Window.orderBy("day")).cast("long").as("t"))
      val regions = Regions
      val folded = ms.as[(String, String, Long)]
        .repartition(1)
        .sortWithinPartitions("t")
        .mapPartitions { it =>
          // the oracle recursion's EXACT operation order: one delta
          // from the pre-match ratings, applied +w / −l
          val r = scala.collection.mutable.LinkedHashMap(
            regions.map(_ -> 1500.0): _*)
          val wins = scala.collection.mutable.LinkedHashMap(
            regions.map(_ -> 0L): _*)
          it.foreach { case (w, l, _) =>
            val upd = 32 * (1 - 1 / (1
              + math.pow(10.0, (r(l) - r(w)) / 400.0)))
            r(w) += upd
            r(l) -= upd
            wins(w) += 1
          }
          regions.iterator.map(n => (n, r(n), wins(n)))
        }
        .toDF("r_name", "rating", "n_wins")
      folded.select(col("r_name"),
          (round(col("rating"), 6) + 0.0).as("elo_rating"),
          col("n_wins"))
        .orderBy("r_name")
    },

    // ---- Kolmogorov–Zurbenko filter (iterated moving average) ----
    // The KZ(29,3) low-pass: three passes of a centered 29-day moving
    // average over daily revenue — the spectral-leakage-robust trend
    // extractor. Emits the variance split (raw vs filtered, in
    // MILLIONS so the 2-dp grid sits ~50× above cross-engine
    // window-summation drift — DuckDB's segment-tree sliding window
    // vs Spark's running frame sum differ at last-ulp), the fraction
    // of variance the filter removes, and the smoothed peak day.
    // 100-TB story: one corpus pass to the calendar-bounded day frame;
    // three bounded windows.
    sql(
      "q_kolmogorov_zurbenko",
      s"""WITH $DailyRevSql,
        |y AS (SELECT day, CAST(rv AS DOUBLE) AS y FROM daily),
        |m1 AS (SELECT day, avg(y) OVER (ORDER BY day
        |        ROWS BETWEEN 14 PRECEDING AND 14 FOLLOWING) AS y1,
        |        y FROM y),
        |m2 AS (SELECT day, y, avg(y1) OVER (ORDER BY day
        |        ROWS BETWEEN 14 PRECEDING AND 14 FOLLOWING) AS y2
        |       FROM m1),
        |m3 AS (SELECT day, y, avg(y2) OVER (ORDER BY day
        |        ROWS BETWEEN 14 PRECEDING AND 14 FOLLOWING) AS kz
        |       FROM m2),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(y) AS my,
        |        avg(kz) AS mk FROM m3),
        |v AS (SELECT mm.n,
        |       sum((m3.y - mm.my) * (m3.y - mm.my)) / (mm.n - 1)
        |         AS var_raw,
        |       sum((m3.kz - mm.mk) * (m3.kz - mm.mk)) / (mm.n - 1)
        |         AS var_kz
        |      FROM m3 CROSS JOIN mm GROUP BY mm.n),
        |pk AS (SELECT day, kz FROM m3 ORDER BY kz DESC, day LIMIT 1)
        |SELECT v.n AS n_days,
        |  round(v.var_raw / 1e6, 2) + 0.0 AS var_raw_millions,
        |  round(v.var_kz / 1e6, 2) + 0.0 AS var_kz_millions,
        |  round(1.0e0 - v.var_kz / v.var_raw, 6) AS variance_removed,
        |  pk.day AS peak_day, round(pk.kz, 2) + 0.0 AS peak_kz
        |FROM v CROSS JOIN pk""".stripMargin) { (s, dir) =>
      val daily = dailyRev(s, dir)
      val w29 = Window.orderBy("day").rowsBetween(-14, 14)
      val y = daily.select(col("day"), col("rv").cast("double").as("y"))
      val m3 = y
        .withColumn("y1", avg("y").over(w29))
        .withColumn("y2", avg("y1").over(w29))
        .withColumn("kz", avg("y2").over(w29))
        .select("day", "y", "kz")
        .localCheckpoint() // day frame; reused for moments + peak
      val mm = m3.agg(count(lit(1)).as("n"), avg("y").as("my"),
        avg("kz").as("mk"))
      val v = m3.crossJoin(broadcast(mm))
        .groupBy("n")
        .agg((sum((col("y") - col("my")) * (col("y") - col("my")))
          / (first(col("n")) - 1)).as("var_raw"),
          (sum((col("kz") - col("mk")) * (col("kz") - col("mk")))
            / (first(col("n")) - 1)).as("var_kz"))
      val pk = m3.orderBy(col("kz").desc, col("day")).limit(1)
        .select(col("day").as("peak_day"), col("kz"))
      v.crossJoin(broadcast(pk))
        .select(col("n").as("n_days"),
          (round(col("var_raw") / 1e6, 2) + 0.0).as("var_raw_millions"),
          (round(col("var_kz") / 1e6, 2) + 0.0).as("var_kz_millions"),
          round(lit(1.0) - col("var_kz") / col("var_raw"), 6)
            .as("variance_removed"),
          col("peak_day"), (round(col("kz"), 2) + 0.0).as("peak_kz"))
    },

    // ---- seasonal strength (STL-lite decomposition read) ----
    // How much of detrended daily revenue is day-of-week seasonality?
    // Trend = centered 7-day MA, seasonal = per-DOW mean of the
    // detrended series, F_s = max(0, 1 − Var(remainder)/Var(detrended))
    // — the Hyndman forecasting-feature. Variances ride in the same
    // magnitude-safe MILLIONS grid as q_kolmogorov_zurbenko.
    // 100-TB story: one corpus pass to the day frame; one bounded
    // window + a 7-row seasonal join.
    sql(
      "q_seasonal_strength",
      s"""WITH $DailyRevSql,
        |y AS (SELECT day, CAST(rv AS DOUBLE) AS y,
        |        CAST(dayofweek(day) AS BIGINT) AS dow FROM daily),
        |tr AS (SELECT day, dow, y, avg(y) OVER (ORDER BY day
        |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
        |       FROM y),
        |de AS (SELECT day, dow, y - trend AS dt FROM tr),
        |sm AS (SELECT dow, avg(dt) AS s FROM de GROUP BY 1),
        |rm AS (SELECT de.day, de.dt, de.dt - sm.s AS rem
        |       FROM de JOIN sm ON sm.dow = de.dow),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |       sum(dt * dt) / count(*) AS v_dt,
        |       sum(rem * rem) / count(*) AS v_rem FROM rm)
        |SELECT n AS n_days,
        |  round(v_dt / 1e6, 2) + 0.0 AS var_detrended_millions,
        |  round(v_rem / 1e6, 2) + 0.0 AS var_remainder_millions,
        |  round(greatest(0.0e0, 1.0e0 - v_rem / v_dt), 6)
        |    AS seasonal_strength
        |FROM v""".stripMargin) { (s, dir) =>
      val daily = dailyRev(s, dir)
      val y = daily.select(col("day"), col("rv").cast("double").as("y"),
        dayofweek(col("day")).cast("long").as("dow"))
      val tr = y.withColumn("trend",
        avg("y").over(Window.orderBy("day").rowsBetween(-3, 3)))
      val de = tr.select(col("day"), col("dow"),
        (col("y") - col("trend")).as("dt"))
        .localCheckpoint() // day frame; feeds seasonal means + join
      val sm = de.groupBy("dow").agg(avg("dt").as("s"))
      val rm = de.join(broadcast(sm), "dow")
        .select(col("day"), col("dt"), (col("dt") - col("s")).as("rem"))
      val v = rm.agg(count(lit(1)).as("n"),
        (sum(col("dt") * col("dt")) / count(lit(1))).as("v_dt"),
        (sum(col("rem") * col("rem")) / count(lit(1))).as("v_rem"))
      v.select(col("n").as("n_days"),
        (round(col("v_dt") / 1e6, 2) + 0.0).as("var_detrended_millions"),
        (round(col("v_rem") / 1e6, 2) + 0.0)
          .as("var_remainder_millions"),
        round(greatest(lit(0.0), lit(1.0) - col("v_rem") / col("v_dt")),
          6).as("seasonal_strength"))
    },

    // ---- Bray–Curtis composition dissimilarity matrix ----
    // How differently do regions MIX the five order priorities?
    // BC(a,b) = Σ|xₐ−x_b| / Σ(xₐ+x_b) over the priority-count
    // composition vectors — the ecology community-dissimilarity read
    // on a 5×5 bounded grid of exact integer counts. 100-TB story:
    // one corpus pass to 25 composition cells; a bounded pair join.
    sql(
      "q_bray_curtis",
      """WITH comp AS (SELECT r.r_name,
        |        CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS pj,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
        |      JOIN nation n ON n.n_nationkey = cu.c_nationkey
        |      JOIN region r ON r.r_regionkey = n.n_regionkey
        |      GROUP BY 1, 2),
        |p AS (SELECT a.r_name AS ra, b.r_name AS rb,
        |       sum(abs(a.c - b.c)) AS num, sum(a.c + b.c) AS den
        |      FROM comp a JOIN comp b ON a.pj = b.pj
        |        AND a.r_name < b.r_name
        |      GROUP BY 1, 2)
        |SELECT ra AS region_a, rb AS region_b,
        |  round(CAST(num AS DOUBLE) / den, 6) AS bray_curtis
        |FROM p ORDER BY ra, rb""".stripMargin) { (s, dir) =>
      val comp = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"),
          substring(col("o_orderpriority"), 1, 1).cast("long").as("pj"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // 25 composition cells
      val p = comp.as("a")
        .join(broadcast(comp.as("b")),
          col("a.pj") === col("b.pj")
            && col("a.r_name") < col("b.r_name"))
        .groupBy(col("a.r_name").as("ra"), col("b.r_name").as("rb"))
        .agg(sum(abs(col("a.c") - col("b.c"))).as("num"),
          sum(col("a.c") + col("b.c")).as("den"))
      p.select(col("ra").as("region_a"), col("rb").as("region_b"),
          round(col("num").cast("double") / col("den"), 6)
            .as("bray_curtis"))
        .orderBy("region_a", "region_b")
    },

    // ---- D'Hondt / Sainte-Laguë seat apportionment ----
    // Allocate 100 "seats" to regions proportional to revenue under
    // both highest-quotient rules (divisors k vs 2k−1) — the
    // fair-allocation operator (compute budgets, shard counts, ad
    // slots). Quotients divide exact-decimal totals by integer
    // divisors (identical doubles); the 500-row quotient grid is
    // bounded; name tiebreak pins any exact quotient tie. 100-TB
    // story: one keyed corpus collapse to 5 rows; a 500-row grid +
    // top-100 selection.
    sql(
      "q_dhondt_seats",
      """WITH rev AS (SELECT r.r_name,
        |        sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rv
        |      FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
        |      JOIN nation n ON n.n_nationkey = cu.c_nationkey
        |      JOIN region r ON r.r_regionkey = n.n_regionkey GROUP BY 1),
        |ks AS (SELECT unnest(generate_series(1, 100)) AS k),
        |qd AS (SELECT rev.r_name, CAST(rev.rv AS DOUBLE) / k.k AS q
        |       FROM rev CROSS JOIN ks k),
        |qs AS (SELECT rev.r_name,
        |        CAST(rev.rv AS DOUBLE) / (2 * k.k - 1) AS q
        |       FROM rev CROSS JOIN ks k),
        |td AS (SELECT r_name FROM qd ORDER BY q DESC, r_name LIMIT 100),
        |tsl AS (SELECT r_name FROM qs ORDER BY q DESC, r_name LIMIT 100),
        |sd AS (SELECT r_name, CAST(count(*) AS BIGINT) AS seats_dhondt
        |       FROM td GROUP BY 1),
        |ss AS (SELECT r_name,
        |        CAST(count(*) AS BIGINT) AS seats_sainte_lague
        |       FROM tsl GROUP BY 1),
        |tot AS (SELECT CAST(sum(rv) AS DOUBLE) AS tv FROM rev)
        |SELECT rev.r_name,
        |  round(CAST(rev.rv AS DOUBLE) / tot.tv * 100, 4)
        |    AS vote_share_pct,
        |  coalesce(sd.seats_dhondt, 0) AS seats_dhondt,
        |  coalesce(ss.seats_sainte_lague, 0) AS seats_sainte_lague
        |FROM rev LEFT JOIN sd ON sd.r_name = rev.r_name
        |LEFT JOIN ss ON ss.r_name = rev.r_name CROSS JOIN tot
        |ORDER BY rev.r_name""".stripMargin) { (s, dir) =>
      val rev = nationDay(s, dir)
        .join(broadcast(t(s, dir, "region")
          .select("r_regionkey", "r_name").withColumnRenamed("r_name",
            "region_name")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("region_name").as("r_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
        .localCheckpoint() // 5 region totals
      val ks = rev.sparkSession.range(1, 101)
        .select(col("id").cast("long").as("k"))
      val grid = rev.crossJoin(broadcast(ks))
      val td = grid
        .select(col("r_name"), (col("rv").cast("double") / col("k"))
          .as("q"))
        .orderBy(col("q").desc, col("r_name")).limit(100)
      val tsl = grid
        .select(col("r_name"),
          (col("rv").cast("double") / (col("k") * 2 - 1)).as("q"))
        .orderBy(col("q").desc, col("r_name")).limit(100)
      val sd = td.groupBy("r_name").agg(count(lit(1)).as("seats_dhondt"))
      val ss = tsl.groupBy("r_name")
        .agg(count(lit(1)).as("seats_sainte_lague"))
      val tot = rev.agg(sum("rv").cast("double").as("tv"))
      rev.join(broadcast(sd), Seq("r_name"), "left")
        .join(broadcast(ss), Seq("r_name"), "left")
        .crossJoin(broadcast(tot))
        .select(col("r_name"),
          round(col("rv").cast("double") / col("tv") * 100, 4)
            .as("vote_share_pct"),
          coalesce(col("seats_dhondt"), lit(0L)).as("seats_dhondt"),
          coalesce(col("seats_sainte_lague"), lit(0L))
            .as("seats_sainte_lague"))
        .orderBy("r_name")
    },

    // ---- Theil T inequality index with between/within split ----
    // How unequal are order values, and how much of the inequality is
    // BETWEEN customer nations vs within them? T = (1/N)Σ(x/μ)ln(x/μ)
    // decomposes additively: T_between from the nation means +
    // T_within (emitted as the difference, so the additivity is pinned
    // in the output). The corpus-sized Σ(x/μ)ln(x/μ) is a double sum
    // of O(1)-magnitude terms around the exact-decimal grand mean
    // (~1e-13 relative drift vs the 6-dp gate); group moments are
    // exact decimals with the >2^53 casts VARCHAR-bounced. 100-TB
    // story: one keyed collapse + one corpus term pass, both map-side
    // combined.
    sql(
      "q_theil_index",
      """WITH y AS (SELECT c.c_nationkey AS g,
        |        CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
        |      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |pg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng, sum(v) AS sv
        |       FROM y GROUP BY 1),
        |tt AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |        CAST(CAST(sum(sv) AS VARCHAR) AS DOUBLE) AS s FROM pg),
        |wi AS (SELECT y.g, sum(CAST(y.v AS DOUBLE) / (tt.s / tt.n)
        |        * ln(CAST(y.v AS DOUBLE) / (tt.s / tt.n))) AS tsum,
        |        max(tt.n) AS n
        |      FROM y CROSS JOIN tt GROUP BY y.g),
        |tot AS (SELECT sum(tsum) / max(n) AS theil_t FROM wi),
        |bt AS (SELECT sum(CAST(CAST(pg.sv AS VARCHAR) AS DOUBLE) / tt.s
        |        * ln((CAST(CAST(pg.sv AS VARCHAR) AS DOUBLE) / pg.ng)
        |             / (tt.s / tt.n))) AS theil_between
        |      FROM pg CROSS JOIN tt)
        |SELECT (SELECT CAST(n AS BIGINT) FROM tt) AS n_obs,
        |  round((SELECT theil_t FROM tot), 6) + 0.0 AS theil_t,
        |  round((SELECT theil_between FROM bt), 6) + 0.0
        |    AS theil_between,
        |  round((SELECT theil_t FROM tot)
        |    - (SELECT theil_between FROM bt), 6) + 0.0 AS theil_within""".stripMargin) { (s, dir) =>
      val y = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("g"),
          col("o_totalprice").cast("decimal(18,2)").as("v"))
      val pg = y.groupBy("g").agg(count(lit(1)).as("ng"),
        sum("v").as("sv"))
      val tt = pg.agg(sum("ng").cast("long").as("n"),
        sum("sv").cast("double").as("s"))
      val mu = col("s") / col("n")
      val wi = y.crossJoin(broadcast(tt))
        .groupBy("g")
        .agg(sum(col("v").cast("double") / mu
          * log(col("v").cast("double") / mu)).as("tsum"),
          max("n").as("n"))
      val tot = wi.agg((sum("tsum") / max("n")).as("theil_t"))
      val bt = pg.crossJoin(broadcast(tt))
        .agg(sum(col("sv").cast("double") / col("s")
          * log((col("sv").cast("double") / col("ng")) / mu))
          .as("theil_between"))
      tt.select(col("n").as("n_obs"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(bt))
        .select(col("n_obs"),
          (round(col("theil_t"), 6) + 0.0).as("theil_t"),
          (round(col("theil_between"), 6) + 0.0).as("theil_between"),
          (round(col("theil_t") - col("theil_between"), 6) + 0.0)
            .as("theil_within"))
    },

    // ---- Markov entropy rate of the event stream ----
    // How predictable is a user's NEXT event? The first-order chain's
    // entropy rate H = −Σ_ab p(ab)·ln p(b|a) over the per-user
    // event-type transition counts (the q_markov_transitions frame),
    // normalized by ln(#states) — 1 − H/Hmax is the predictability
    // headroom a session-prefetcher can exploit. Exact integer counts;
    // the entropy sum runs over ≤ #types² bounded rows. 100-TB story:
    // one per-user lead window + one keyed count collapse.
    sql(
      "q_entropy_rate",
      """WITH ev AS (SELECT user_id, event_type, ts, event_id
        |      FROM events),
        |tr AS (SELECT user_id, event_type AS a,
        |        lead(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS b
        |      FROM ev),
        |c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM tr
        |      WHERE b IS NOT NULL GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM c
        |       GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM c),
        |h AS (SELECT sum(-(CAST(c.n_ab AS DOUBLE) / tt.n)
        |        * ln(CAST(c.n_ab AS DOUBLE) / ra.n_a)) AS hr,
        |       max(tt.n) AS n
        |      FROM c JOIN ra ON ra.a = c.a CROSS JOIN tt),
        |h0 AS (SELECT ln(CAST(count(*) AS DOUBLE)) AS hmax FROM ra)
        |SELECT CAST(h.n AS BIGINT) AS n_transitions,
        |  round(h.hr, 6) + 0.0 AS entropy_rate_nats,
        |  round(h.hr / h0.hmax, 6) + 0.0 AS normalized_rate,
        |  round(1.0e0 - h.hr / h0.hmax, 6) + 0.0 AS predictability
        |FROM h CROSS JOIN h0""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
      val tr = ev.select(col("event_type").as("a"),
        lead(col("event_type"), 1).over(Window.partitionBy("user_id")
          .orderBy("ts", "event_id")).as("b"))
      val c = tr.where(col("b").isNotNull)
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        .localCheckpoint() // ≤ #types² transition cells
      val ra = c.groupBy("a").agg(sum("n_ab").cast("long").as("n_a"))
      val tt = c.agg(sum("n_ab").cast("long").as("n"))
      val h = c.join(broadcast(ra), "a").crossJoin(broadcast(tt))
        .agg(sum(-(col("n_ab").cast("double") / col("n"))
          * log(col("n_ab").cast("double") / col("n_a"))).as("hr"),
          max("n").as("n"))
      val h0 = ra.agg(log(count(lit(1)).cast("double")).as("hmax"))
      h.crossJoin(broadcast(h0))
        .select(col("n").cast("long").as("n_transitions"),
          (round(col("hr"), 6) + 0.0).as("entropy_rate_nats"),
          (round(col("hr") / col("hmax"), 6) + 0.0)
            .as("normalized_rate"),
          (round(lit(1.0) - col("hr") / col("hmax"), 6) + 0.0)
            .as("predictability"))
    },

    // ---- Borda count + Condorcet check (rank aggregation) ----
    // 25 nation "voters" each rank the 5 priorities by mean order
    // value; Borda aggregates the ranks, and the pairwise-majority
    // matrix checks for a Condorcet winner (a priority that beats
    // every other head-to-head) — rank aggregation as a first-class
    // operator (model-ensemble voting, reviewer consensus). Ballots
    // are deterministic (exact-decimal cell means, priority tiebreak);
    // everything downstream is a bounded 125-row frame. 100-TB story:
    // one corpus pass to the 125-cell frame; bounded windows + a 20-row
    // pair join.
    sql(
      "q_borda_count",
      """WITH cell AS (SELECT n.n_name,
        |        CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS pj,
        |        sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS s,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM orders o JOIN customer c2 ON c2.c_custkey = o.o_custkey
        |      JOIN nation n ON n.n_nationkey = c2.c_nationkey
        |      GROUP BY 1, 2),
        |x AS (SELECT n_name, pj, CAST(s AS DOUBLE) / c AS avg_rev
        |      FROM cell),
        |rk AS (SELECT n_name, pj,
        |        CAST(rank() OVER (PARTITION BY n_name
        |          ORDER BY avg_rev DESC, pj) AS BIGINT) AS r FROM x),
        |bd AS (SELECT pj, CAST(sum(5 - r) AS BIGINT) AS borda FROM rk
        |       GROUP BY 1),
        |pw AS (SELECT a.pj AS pa, b.pj AS pb,
        |        CAST(sum(CASE WHEN a.r < b.r THEN 1 ELSE 0 END)
        |          AS BIGINT) AS wins
        |      FROM rk a JOIN rk b ON a.n_name = b.n_name
        |        AND a.pj <> b.pj
        |      GROUP BY 1, 2),
        |bl AS (SELECT CAST(count(DISTINCT n_name) AS BIGINT) AS b
        |       FROM rk),
        |cw AS (SELECT pa,
        |        CAST(sum(CASE WHEN wins * 2 > bl.b THEN 1 ELSE 0 END)
        |          AS BIGINT) AS majorities
        |      FROM pw CROSS JOIN bl GROUP BY 1)
        |SELECT bd.pj AS priority, bd.borda AS borda_score,
        |  cw.majorities AS pairwise_majorities,
        |  CAST(CASE WHEN cw.majorities = 4 THEN 1 ELSE 0 END AS BIGINT)
        |    AS condorcet_winner
        |FROM bd JOIN cw ON cw.pa = bd.pj
        |ORDER BY bd.pj""".stripMargin) { (s, dir) =>
      val cell = nationDay(s, dir)
        .groupBy(col("n_name"),
          substring(col("o_orderpriority"), 1, 1).cast("long").as("pj"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("s"),
          count(lit(1)).as("c"))
      val x = cell.select(col("n_name"), col("pj"),
        (col("s").cast("double") / col("c")).as("avg_rev"))
      val rk = x.select(col("n_name"), col("pj"),
        rank().over(Window.partitionBy("n_name")
          .orderBy(col("avg_rev").desc, col("pj"))).cast("long").as("r"))
        .localCheckpoint() // 125-ballot frame
      val bd = rk.groupBy("pj")
        .agg(sum(lit(5) - col("r")).cast("long").as("borda"))
      val pw = rk.as("a")
        .join(broadcast(rk.as("b")),
          col("a.n_name") === col("b.n_name")
            && col("a.pj") =!= col("b.pj"))
        .groupBy(col("a.pj").as("pa"), col("b.pj").as("pb"))
        .agg(sum(when(col("a.r") < col("b.r"), 1L).otherwise(0L))
          .cast("long").as("wins"))
      val bl = rk.agg(countDistinct("n_name").as("b"))
      val cw = pw.crossJoin(broadcast(bl))
        .groupBy("pa")
        .agg(sum(when(col("wins") * 2 > col("b"), 1L).otherwise(0L))
          .cast("long").as("majorities"))
      bd.join(cw, col("pa") === col("pj"))
        .select(col("pj").as("priority"), col("borda").as("borda_score"),
          col("majorities").as("pairwise_majorities"),
          when(col("majorities") === 4, 1L).otherwise(0L)
            .as("condorcet_winner"))
        .orderBy("priority")
    },


    // ---- Jonckheere–Terpstra ordered-alternative k-sample test ----
    // Does lineitem quantity TREND across the o_orderpriority ladder
    // (1-URGENT < 2-HIGH < ... < 5-LOW — the natural ordered grouping
    // the r12 backlog called for)? JT = Σ over ordered group pairs of
    // the Mann–Whitney count #{x∈Gi < y∈Gj} + ½#{ties}, with the FULL
    // tie-corrected null variance (Hollander–Wolfe): ties are massive
    // here (50 integer quantities), so the uncorrected variance would
    // overstate Var by the tie mass. Exactness: the corpus collapses
    // to a ≤ k×50-value histogram (bounded by the value domain, not
    // the corpus); 2·JT is an integer summed as exact DECIMAL, and
    // every variance term is an exact DECIMAL polynomial in the group
    // and tie counts — the lone doubles are the final ratios.
    // 100-TB story: ONE corpus pass to the 250-row histogram; the
    // pair sum is a bounded 250×250 broadcast self-join; 1-row math.
    sql(
      "q_jonckheere_terpstra",
      """WITH h AS (SELECT o.o_orderpriority AS grp,
        |        CAST(l.l_quantity AS BIGINT) AS v,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |      GROUP BY 1, 2),
        |g AS (SELECT grp, CAST(sum(c) AS BIGINT) AS ng FROM h GROUP BY 1),
        |tv AS (SELECT v, CAST(sum(c) AS BIGINT) AS tj FROM h GROUP BY 1),
        |u AS (SELECT sum(CASE WHEN a.v < b.v
        |            THEN 2 * CAST(a.c AS DECIMAL(18,0)) * b.c
        |            WHEN a.v = b.v THEN CAST(a.c AS DECIMAL(18,0)) * b.c
        |            ELSE CAST(0 AS DECIMAL(18,0)) END) AS jt2
        |      FROM h a JOIN h b ON a.grp < b.grp),
        |gs AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |        CAST(count(*) AS BIGINT) AS k,
        |        sum(CAST(ng AS DECIMAL(38,0)) * ng) AS sn2,
        |        sum(CAST(ng AS DECIMAL(38,0)) * (ng - 1) * (2 * ng + 5)) AS sn_a,
        |        sum(CAST(ng AS DECIMAL(38,0)) * (ng - 1) * (ng - 2)) AS sn_b,
        |        sum(CAST(ng AS DECIMAL(38,0)) * (ng - 1)) AS sn_c
        |      FROM g),
        |ts AS (SELECT
        |        sum(CAST(tj AS DECIMAL(38,0)) * (tj - 1) * (2 * tj + 5)) AS st_a,
        |        sum(CAST(tj AS DECIMAL(38,0)) * (tj - 1) * (tj - 2)) AS st_b,
        |        sum(CAST(tj AS DECIMAL(38,0)) * (tj - 1)) AS st_c
        |      FROM tv),
        |f AS (SELECT gs.n, gs.k, CAST(u.jt2 AS DOUBLE) / 2 AS jt,
        |        (CAST(gs.n AS DOUBLE) * gs.n - CAST(gs.sn2 AS DOUBLE)) / 4
        |          AS e_jt,
        |        (CAST(gs.n AS DECIMAL(38,0)) * (gs.n - 1) * (2 * gs.n + 5)
        |           - gs.sn_a - ts.st_a) AS va,
        |        gs.sn_b, ts.st_b, gs.sn_c, ts.st_c
        |      FROM gs CROSS JOIN ts CROSS JOIN u),
        |v AS (SELECT n, k, jt, e_jt,
        |        CAST(va AS DOUBLE) / 72
        |          + CAST(sn_b AS DOUBLE) * CAST(st_b AS DOUBLE)
        |            / (36.0e0 * n * (n - 1) * (n - 2))
        |          + CAST(sn_c AS DOUBLE) * CAST(st_c AS DOUBLE)
        |            / (8.0e0 * n * (n - 1)) AS var_jt
        |      FROM f)
        |SELECT n AS n_total, k AS k_groups, round(jt, 1) + 0.0 AS jt_stat,
        |  round(e_jt, 2) + 0.0 AS e_jt, round(var_jt, 4) + 0.0 AS var_jt,
        |  round((jt - e_jt) / sqrt(var_jt), 6) + 0.0 AS z,
        |  CAST(CASE WHEN abs((jt - e_jt) / sqrt(var_jt)) > 1.959963984540054
        |       THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
        |FROM v""".stripMargin) { (s, dir) =>
      val h = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority").as("grp"),
          col("l_quantity").cast("long").as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // ≤ 5 groups × 50 quantities = 250 rows
      val g = h.groupBy("grp").agg(sum("c").cast("long").as("ng"))
      val tv = h.groupBy("v").agg(sum("c").cast("long").as("tj"))
      val u = h.as("a").crossJoin(broadcast(h.as("b")))
        .where(col("a.grp") < col("b.grp"))
        .agg(sum(when(col("a.v") < col("b.v"),
            lit(2) * col("a.c").cast("decimal(18,0)") * col("b.c"))
          .when(col("a.v") === col("b.v"),
            col("a.c").cast("decimal(18,0)") * col("b.c"))
          .otherwise(lit(0).cast("decimal(18,0)"))).as("jt2"))
      val gs = g.agg(sum("ng").cast("long").as("n"),
        count(lit(1)).as("k"),
        sum(col("ng").cast("decimal(38,0)") * col("ng")).as("sn2"),
        sum(col("ng").cast("decimal(38,0)") * (col("ng") - 1)
          * (col("ng") * 2 + 5)).as("sn_a"),
        sum(col("ng").cast("decimal(38,0)") * (col("ng") - 1)
          * (col("ng") - 2)).as("sn_b"),
        sum(col("ng").cast("decimal(38,0)") * (col("ng") - 1)).as("sn_c"))
      val ts = tv.agg(
        sum(col("tj").cast("decimal(38,0)") * (col("tj") - 1)
          * (col("tj") * 2 + 5)).as("st_a"),
        sum(col("tj").cast("decimal(38,0)") * (col("tj") - 1)
          * (col("tj") - 2)).as("st_b"),
        sum(col("tj").cast("decimal(38,0)") * (col("tj") - 1)).as("st_c"))
      val f = gs.crossJoin(broadcast(ts)).crossJoin(broadcast(u))
        .select(col("n"), col("k"),
          (col("jt2").cast("double") / 2).as("jt"),
          ((col("n").cast("double") * col("n") - col("sn2").cast("double"))
            / 4).as("e_jt"),
          (col("n").cast("decimal(38,0)") * (col("n") - 1)
            * (col("n") * 2 + 5) - col("sn_a") - col("st_a")).as("va"),
          col("sn_b"), col("st_b"), col("sn_c"), col("st_c"))
      val v = f.select(col("n"), col("k"), col("jt"), col("e_jt"),
        (col("va").cast("double") / 72
          + col("sn_b").cast("double") * col("st_b").cast("double")
            / (lit(36.0) * col("n") * (col("n") - 1) * (col("n") - 2))
          + col("sn_c").cast("double") * col("st_c").cast("double")
            / (lit(8.0) * col("n") * (col("n") - 1))).as("var_jt"))
      val z = (col("jt") - col("e_jt")) / sqrt(col("var_jt"))
      v.select(col("n").as("n_total"), col("k").as("k_groups"),
        (round(col("jt"), 1) + 0.0).as("jt_stat"),
        (round(col("e_jt"), 2) + 0.0).as("e_jt"),
        (round(col("var_jt"), 4) + 0.0).as("var_jt"),
        (round(z, 6) + 0.0).as("z"),
        when(abs(z) > 1.959963984540054, 1L).otherwise(0L)
          .as("reject_5pct"))
    },

    // ---- Grubbs' maximum-studentized outlier test ----
    // Is the most extreme of the 25 per-nation revenue totals a
    // statistical outlier? G = max|x − x̄|/s against the PINNED n=25
    // critical value 2.821681237805183 = ((n−1)/√n)·√(t²/(n−2+t²))
    // with t = t_{0.001,23} = 3.48496437493979 (α = 0.05 two-sided,
    // α/(2n) per tail) — computed once offline via the incomplete-beta
    // continued fraction and pinned as a literal, the Gumbel/EVT
    // pinned-quantile discipline (SURVEY row 240): neither engine has
    // a t-quantile and the fixed 25-nation frame makes n a constant of
    // the schema, not the corpus. Exactness: mean/sd come from exact
    // DECIMAL corpus sums (identical doubles after the cast), the
    // 25-row studentization is pure arithmetic on identical inputs.
    // 100-TB story: one keyed corpus collapse to 25 rows; 1-row math.
    sql(
      "q_grubbs_test",
      """WITH rev AS (SELECT n.n_name,
        |        sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rvd
        |      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |      JOIN nation n ON n.n_nationkey = c.c_nationkey GROUP BY 1),
        |r AS (SELECT n_name, rvd, CAST(rvd AS DOUBLE) AS rv FROM rev),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rvd) AS s1,
        |       sum(CAST(CAST(rvd AS DECIMAL(20,2)) * rvd AS DECIMAL(38,4)))
        |         AS s2 FROM r),
        |c0 AS (SELECT n, round(CAST(s1 AS DOUBLE) / n, 8) AS mu,
        |       round(sqrt((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
        |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
        |         / (n - 1)), 8) AS sd FROM m),
        |g AS (SELECT r.n_name, abs(r.rv - c0.mu) / c0.sd AS gi, r.rv, c0.n
        |      FROM r CROSS JOIN c0)
        |SELECT n AS n_obs, n_name AS outlier_name,
        |  round(rv, 2) AS outlier_value,
        |  round(gi, 6) + 0.0 AS g_stat,
        |  2.821681237805183e0 AS g_crit_5pct,
        |  CAST(CASE WHEN gi > 2.821681237805183 THEN 1 ELSE 0 END
        |       AS BIGINT) AS reject_5pct
        |FROM g ORDER BY gi DESC, n_name LIMIT 1""".stripMargin) { (s, dir) =>
      val rev = nationDay(s, dir)
        .groupBy("n_name")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rvd"))
      val r = rev.select(col("n_name"), col("rvd"),
        col("rvd").cast("double").as("rv"))
      val m = r.agg(count(lit(1)).as("n"), sum("rvd").as("s1"),
        sum((col("rvd").cast("decimal(20,2)") * col("rvd"))
          .cast("decimal(38,4)")).as("s2"))
      val c0 = m.select(col("n"),
        round(col("s1").cast("double") / col("n"), 8).as("mu"),
        round(sqrt((col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double") / col("n"))
          / (col("n") - 1)), 8).as("sd"))
      val g = r.crossJoin(broadcast(c0))
        .select(col("n_name"),
          (abs(col("rv") - col("mu")) / col("sd")).as("gi"),
          col("rv"), col("n"))
      g.orderBy(col("gi").desc, col("n_name")).limit(1)
        .select(col("n").as("n_obs"), col("n_name").as("outlier_name"),
          round(col("rv"), 2).as("outlier_value"),
          (round(col("gi"), 6) + 0.0).as("g_stat"),
          lit(2.821681237805183).as("g_crit_5pct"),
          when(col("gi") > 2.821681237805183, 1L).otherwise(0L)
            .as("reject_5pct"))
    },

    // ---- Page's L trend test (blocks × ordered treatments) ----
    // The blocked companion to q_jonckheere_terpstra: within each of
    // the 25 nation blocks, rank the 5 priority ladder cells by mean
    // order value and test whether the ranks CLIMB the ladder.
    // L = Σ_j j·R_j with the normal approximation E[L] = bk(k+1)²/4,
    // Var[L] = bk²(k+1)²(k−1)/144, one-sided at the pinned 1.645.
    // Ranks are deterministic: cell means divide exact DECIMAL sums
    // (identical doubles), and the rank window tiebreaks on the
    // priority index. 100-TB story: one corpus pass to the 125-cell
    // frame; window + 1-row math.
    sql(
      "q_page_trend",
      """WITH cell AS (SELECT n.n_name,
        |        CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS pj,
        |        sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS s,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM orders o JOIN customer c2 ON c2.c_custkey = o.o_custkey
        |      JOIN nation n ON n.n_nationkey = c2.c_nationkey GROUP BY 1, 2),
        |x AS (SELECT n_name, pj, CAST(s AS DOUBLE) / c AS avg_rev FROM cell),
        |rk AS (SELECT n_name, pj,
        |        CAST(rank() OVER (PARTITION BY n_name
        |          ORDER BY avg_rev, pj) AS BIGINT) AS r FROM x),
        |agg AS (SELECT CAST(count(DISTINCT n_name) AS BIGINT) AS b,
        |        CAST(sum(pj * r) AS BIGINT) AS l FROM rk),
        |f AS (SELECT b, l, 5 AS k,
        |       b * 5 * 36.0e0 / 4 AS e_l,
        |       b * 25 * 36.0e0 * 4 / 144 AS var_l FROM agg)
        |SELECT b AS n_blocks, CAST(k AS BIGINT) AS k_treatments,
        |  l AS page_l, round(e_l, 2) + 0.0 AS e_l,
        |  round(var_l, 4) + 0.0 AS var_l,
        |  round((l - e_l) / sqrt(var_l), 6) + 0.0 AS z,
        |  CAST(CASE WHEN (l - e_l) / sqrt(var_l) > 1.644853626951473
        |       THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
        |FROM f""".stripMargin) { (s, dir) =>
      val cell = nationDay(s, dir)
        .groupBy(col("n_name"),
          substring(col("o_orderpriority"), 1, 1).cast("long").as("pj"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("s"),
          count(lit(1)).as("c"))
      val x = cell.select(col("n_name"), col("pj"),
        (col("s").cast("double") / col("c")).as("avg_rev"))
      val rk = x.select(col("n_name"), col("pj"),
        rank().over(Window.partitionBy("n_name")
          .orderBy("avg_rev", "pj")).cast("long").as("r"))
      val agg = rk.agg(countDistinct("n_name").as("b"),
        sum(col("pj") * col("r")).cast("long").as("l"))
      val f = agg.select(col("b"), col("l"), lit(5L).as("k"),
        (col("b") * 5 * lit(36.0) / 4).as("e_l"),
        (col("b") * 25 * lit(36.0) * 4 / 144).as("var_l"))
      val z = (col("l") - col("e_l")) / sqrt(col("var_l"))
      f.select(col("b").as("n_blocks"), col("k").as("k_treatments"),
        col("l").as("page_l"), (round(col("e_l"), 2) + 0.0).as("e_l"),
        (round(col("var_l"), 4) + 0.0).as("var_l"),
        (round(z, 6) + 0.0).as("z"),
        when(z > 1.644853626951473, 1L).otherwise(0L).as("reject_5pct"))
    },

    // ---- D'Agostino's K² omnibus normality test ----
    // Is daily revenue normal? Skewness and kurtosis z-transforms
    // (D'Agostino 1970 / Anscombe–Glynn 1983) combined as
    // K² = Z₁² + Z₂² ~ χ²₂, rejected at the pinned 5.991464547107979.
    // The transforms are pure closed-form sqrt/ln/pow on the 1-row
    // moment frame; the cube root runs as power(|x|, 1/3)·sign with
    // the SAME 0.3333333333333333 double literal on both engines (the
    // q_periodogram libm-margin class — O(1) magnitudes against a
    // 6-dp gate). Central moments sum doubles over the
    // calendar-bounded day frame around the 8-dp-rounded exact mean
    // (cross-engine sum-order drift ~n·ulp ≈ 1e-12 relative).
    // 100-TB story: one corpus pass to ≤ ~2.4k day rows (calendar-
    // bounded at any corpus scale); two bounded passes + 1-row math.
    sql(
      "q_dagostino_k2",
      s"""WITH $DailyRevSql,
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rv) AS s1
        |      FROM daily),
        |c0 AS (SELECT n, round(CAST(s1 AS DOUBLE) / n, 8) AS mu FROM m),
        |z AS (SELECT CAST(rv AS DOUBLE) - c0.mu AS e, c0.n
        |      FROM daily CROSS JOIN c0),
        |mm AS (SELECT max(n) AS n0, sum(e * e) AS m2s,
        |        sum(e * e * e) AS m3s, sum(e * e * e * e) AS m4s FROM z),
        |gg AS (SELECT CAST(n0 AS DOUBLE) AS n,
        |        (m3s / n0) / power(m2s / n0, 1.5e0) AS g1,
        |        (m4s / n0) / ((m2s / n0) * (m2s / n0)) AS g2p FROM mm),
        |t1 AS (SELECT n, g1, g2p,
        |        g1 * sqrt((n + 1) * (n + 3) / (6 * (n - 2))) AS y,
        |        -1 + sqrt(2 * (3 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
        |          / ((n - 2) * (n + 5) * (n + 7) * (n + 9)) - 1)) AS w2
        |      FROM gg),
        |t2 AS (SELECT n, g1, g2p,
        |        1 / sqrt(ln(sqrt(w2)))
        |          * ln(y / sqrt(2 / (w2 - 1))
        |            + sqrt((y / sqrt(2 / (w2 - 1)))
        |              * (y / sqrt(2 / (w2 - 1))) + 1)) AS zs FROM t1),
        |t3 AS (SELECT n, g1, g2p, zs,
        |        (g2p - 3 * (n - 1) / (n + 1))
        |          / sqrt(24 * n * (n - 2) * (n - 3)
        |            / ((n + 1) * (n + 1) * (n + 3) * (n + 5))) AS xx,
        |        6 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        |          * sqrt(6 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
        |          AS sb1 FROM t2),
        |t4 AS (SELECT n, g1, g2p, zs, xx,
        |        6 + 8 / sb1 * (2 / sb1 + sqrt(1 + 4 / (sb1 * sb1))) AS a
        |      FROM t3),
        |t5 AS (SELECT n, g1, g2p, zs,
        |        ((1 - 2.0e0 / (9 * a))
        |          - CASE WHEN (1 - 2 / a) / (1 + xx * sqrt(2 / (a - 4))) >= 0
        |              THEN power((1 - 2 / a) / (1 + xx * sqrt(2 / (a - 4))),
        |                         0.3333333333333333e0)
        |              ELSE -power(-((1 - 2 / a)
        |                          / (1 + xx * sqrt(2 / (a - 4)))),
        |                          0.3333333333333333e0) END)
        |          / sqrt(2.0e0 / (9 * a)) AS zk FROM t4)
        |SELECT CAST(n AS BIGINT) AS n_days, round(g1, 6) + 0.0 AS skew_g1,
        |  round(g2p - 3, 6) + 0.0 AS kurt_excess,
        |  round(zs, 6) + 0.0 AS z_skew, round(zk, 6) + 0.0 AS z_kurt,
        |  round(zs * zs + zk * zk, 6) + 0.0 AS k2_stat,
        |  CAST(CASE WHEN zs * zs + zk * zk > 5.991464547107979
        |       THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
        |FROM t5""".stripMargin) { (s, dir) =>
      val daily = dailyRev(s, dir)
      val m = daily.agg(count(lit(1)).as("n"), sum("rv").as("s1"))
      val c0 = m.select(col("n"),
        round(col("s1").cast("double") / col("n"), 8).as("mu"))
      val z = daily.crossJoin(broadcast(c0))
        .select((col("rv").cast("double") - col("mu")).as("e"), col("n"))
      val mm = z.agg(max("n").as("n0"), sum(col("e") * col("e")).as("m2s"),
        sum(col("e") * col("e") * col("e")).as("m3s"),
        sum(col("e") * col("e") * col("e") * col("e")).as("m4s"))
      val gg = mm.select(col("n0").cast("double").as("n"),
        ((col("m3s") / col("n0"))
          / pow(col("m2s") / col("n0"), 1.5)).as("g1"),
        ((col("m4s") / col("n0"))
          / ((col("m2s") / col("n0")) * (col("m2s") / col("n0"))))
          .as("g2p"))
      val t1 = gg.select(col("n"), col("g1"), col("g2p"),
        (col("g1") * sqrt((col("n") + 1) * (col("n") + 3)
          / (lit(6) * (col("n") - 2)))).as("y"),
        (lit(-1) + sqrt(lit(2) * (lit(3)
          * (col("n") * col("n") + lit(27) * col("n") - 70)
          * (col("n") + 1) * (col("n") + 3)
          / ((col("n") - 2) * (col("n") + 5) * (col("n") + 7)
            * (col("n") + 9)) - 1))).as("w2"))
      val ya = col("y") / sqrt(lit(2) / (col("w2") - 1))
      val t2 = t1.select(col("n"), col("g1"), col("g2p"),
        (lit(1) / sqrt(log(sqrt(col("w2"))))
          * log(ya + sqrt(ya * ya + 1))).as("zs"))
      val t3 = t2.select(col("n"), col("g1"), col("g2p"), col("zs"),
        ((col("g2p") - lit(3) * (col("n") - 1) / (col("n") + 1))
          / sqrt(lit(24) * col("n") * (col("n") - 2) * (col("n") - 3)
            / ((col("n") + 1) * (col("n") + 1) * (col("n") + 3)
              * (col("n") + 5)))).as("xx"),
        (lit(6) * (col("n") * col("n") - lit(5) * col("n") + 2)
          / ((col("n") + 7) * (col("n") + 9))
          * sqrt(lit(6) * (col("n") + 3) * (col("n") + 5)
            / (col("n") * (col("n") - 2) * (col("n") - 3)))).as("sb1"))
      val t4 = t3.select(col("n"), col("g1"), col("g2p"), col("zs"),
        col("xx"),
        (lit(6) + lit(8) / col("sb1") * (lit(2) / col("sb1")
          + sqrt(lit(1) + lit(4) / (col("sb1") * col("sb1"))))).as("a"))
      val ratio = (lit(1) - lit(2) / col("a")) /
        (lit(1) + col("xx") * sqrt(lit(2) / (col("a") - 4)))
      val third = when(ratio >= 0, pow(ratio, 0.3333333333333333))
        .otherwise(-pow(-ratio, 0.3333333333333333))
      val t5 = t4.select(col("n"), col("g1"), col("g2p"), col("zs"),
        (((lit(1) - lit(2.0) / (lit(9) * col("a"))) - third)
          / sqrt(lit(2.0) / (lit(9) * col("a")))).as("zk"))
      val k2 = col("zs") * col("zs") + col("zk") * col("zk")
      t5.select(col("n").cast("long").as("n_days"),
        (round(col("g1"), 6) + 0.0).as("skew_g1"),
        (round(col("g2p") - 3, 6) + 0.0).as("kurt_excess"),
        (round(col("zs"), 6) + 0.0).as("z_skew"),
        (round(col("zk"), 6) + 0.0).as("z_kurt"),
        (round(k2, 6) + 0.0).as("k2_stat"),
        when(k2 > 5.991464547107979, 1L).otherwise(0L).as("reject_5pct"))
    },

    // ---- Chow structural-break F-test ----
    // Did the daily-revenue-on-time regression CHANGE at the pinned
    // 1998-01-01 break (the corpus midpoint of the 1995–2001 order
    // calendar)? F = ((SSR_pooled − SSR₁ − SSR₂)/k) /
    // ((SSR₁+SSR₂)/(n−2k)) with k = 2 params, against the asymptotic
    // χ²₂/2 bar 2.995732273553991 (df₂ ≥ ~2.4k makes the finite-df
    // correction < 1e-3). Exactness: every per-segment raw moment
    // (Σx, Σy, Σxy, Σx², Σy²) is an exact DECIMAL/BIGINT sum, so the
    // SSR algebra runs on bit-identical doubles on both engines —
    // no sum-order drift anywhere. 100-TB story: one corpus pass to
    // the day frame, one bounded window for the day index, two 1-row
    // moment collapses.
    sql(
      "q_chow_test",
      s"""WITH $DailyRevSql,
        |xy AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS x,
        |        rv, CASE WHEN day < DATE '1998-01-01' THEN 1 ELSE 2 END
        |          AS seg FROM daily),
        |s AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(x) AS BIGINT) AS sx, sum(rv) AS sy,
        |       sum(CAST(x AS DECIMAL(18,0)) * rv) AS sxy,
        |       CAST(sum(x * x) AS BIGINT) AS sxx,
        |       sum(CAST(CAST(rv AS DECIMAL(20,2)) * rv AS DECIMAL(38,4)))
        |         AS syy
        |      FROM xy GROUP BY 1),
        |ssr AS (SELECT seg, n,
        |        (CAST(CAST(syy AS VARCHAR) AS DOUBLE)
        |           - CAST(CAST(sy AS VARCHAR) AS DOUBLE)
        |             * CAST(CAST(sy AS VARCHAR) AS DOUBLE) / n)
        |          - (CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
        |              - CAST(sx AS DOUBLE)
        |                * CAST(CAST(sy AS VARCHAR) AS DOUBLE) / n)
        |            * (CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
        |              - CAST(sx AS DOUBLE)
        |                * CAST(CAST(sy AS VARCHAR) AS DOUBLE) / n)
        |            / (CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |          AS v FROM s),
        |p AS (SELECT CAST(sum(n) AS BIGINT) AS n,
        |       CAST(sum(sx) AS DOUBLE) AS sx,
        |       CAST(CAST(sum(sy) AS VARCHAR) AS DOUBLE) AS sy,
        |       CAST(CAST(sum(sxy) AS VARCHAR) AS DOUBLE) AS sxy,
        |       CAST(sum(sxx) AS DOUBLE) AS sxx,
        |       CAST(CAST(sum(syy) AS VARCHAR) AS DOUBLE) AS syy FROM s),
        |pssr AS (SELECT n, (syy - sy * sy / n)
        |          - (sxy - sx * sy / n) * (sxy - sx * sy / n)
        |            / (sxx - sx * sx / n) AS v FROM p),
        |f AS (SELECT (SELECT n FROM ssr WHERE seg = 1) AS n1,
        |       (SELECT n FROM ssr WHERE seg = 2) AS n2,
        |       (SELECT v FROM ssr WHERE seg = 1) AS r1,
        |       (SELECT v FROM ssr WHERE seg = 2) AS r2,
        |       (SELECT v FROM pssr) AS rp, (SELECT n FROM pssr) AS n)
        |SELECT n1, n2, round(rp, 2) + 0.0 AS ssr_pooled,
        |  round(r1 + r2, 2) + 0.0 AS ssr_split,
        |  round(((rp - r1 - r2) / 2) / ((r1 + r2) / (n - 4)), 6) + 0.0
        |    AS f_stat,
        |  CAST(CASE WHEN ((rp - r1 - r2) / 2) / ((r1 + r2) / (n - 4))
        |       > 2.995732273553991 THEN 1 ELSE 0 END AS BIGINT)
        |    AS reject_5pct
        |FROM f""".stripMargin) { (s, dir) =>
      val daily = dailyRev(s, dir)
      val xy = daily.select(
        row_number().over(Window.orderBy("day")).cast("long").as("x"),
        col("rv"),
        when(col("day") < to_date(lit("1998-01-01")), 1).otherwise(2)
          .as("seg"))
      val sm = xy.groupBy("seg").agg(count(lit(1)).as("n"),
        sum("x").cast("long").as("sx"), sum("rv").as("sy"),
        sum(col("x").cast("decimal(18,0)") * col("rv")).as("sxy"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        sum((col("rv").cast("decimal(20,2)") * col("rv"))
          .cast("decimal(38,4)")).as("syy"))
        .localCheckpoint() // 2-row moment frame
      val ssrV = (col("syy").cast("double")
        - col("sy").cast("double") * col("sy").cast("double") / col("n")) -
        (col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double") / col("n")) *
        (col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double") / col("n")) /
        (col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double") / col("n"))
      val ssr = sm.select(col("seg"), col("n"), ssrV.as("v"))
      val p = sm.agg(sum("n").cast("long").as("n"),
        sum("sx").cast("double").as("sx"),
        sum("sy").cast("double").as("sy"),
        sum("sxy").cast("double").as("sxy"),
        sum("sxx").cast("double").as("sxx"),
        sum("syy").cast("double").as("syy"))
      val pssr = p.select(col("n"), ((col("syy")
        - col("sy") * col("sy") / col("n"))
        - (col("sxy") - col("sx") * col("sy") / col("n"))
          * (col("sxy") - col("sx") * col("sy") / col("n"))
          / (col("sxx") - col("sx") * col("sx") / col("n"))).as("v"))
      val f = ssr.where(col("seg") === 1)
        .select(col("n").as("n1"), col("v").as("r1"))
        .crossJoin(broadcast(ssr.where(col("seg") === 2)
          .select(col("n").as("n2"), col("v").as("r2"))))
        .crossJoin(broadcast(pssr.select(col("n"), col("v").as("rp"))))
      val fStat = ((col("rp") - col("r1") - col("r2")) / 2) /
        ((col("r1") + col("r2")) / (col("n") - 4))
      f.select(col("n1"), col("n2"),
        (round(col("rp"), 2) + 0.0).as("ssr_pooled"),
        (round(col("r1") + col("r2"), 2) + 0.0).as("ssr_split"),
        (round(fStat, 6) + 0.0).as("f_stat"),
        when(fStat > 2.995732273553991, 1L).otherwise(0L)
          .as("reject_5pct"))
    },

    // ---- Engle's ARCH LM test (volatility clustering) ----
    // Do squared daily-revenue shocks predict tomorrow's? The lag-1
    // LM test: e_t = y_t − ȳ (ȳ = 8-dp round of the exact mean),
    // regress e²_t on e²_{t−1}; LM = n·R² ~ χ²₁, rejected at the
    // pinned 3.841458820694124. The squared-shock series is computed
    // per-row from identical doubles; the correlation's moment sums
    // run doubles over the calendar-bounded pair frame (sum-order
    // drift ~1e-12 relative against the 6-dp gate). 100-TB story:
    // one corpus pass to the day frame, one bounded lag window,
    // one 1-row collapse.
    sql(
      "q_arch_lm",
      s"""WITH $DailyRevSql,
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rv) AS s1
        |      FROM daily),
        |c0 AS (SELECT n, round(CAST(s1 AS DOUBLE) / n, 8) AS mu FROM m),
        |e AS (SELECT day, (CAST(rv AS DOUBLE) - c0.mu)
        |        * (CAST(rv AS DOUBLE) - c0.mu) AS s, c0.n
        |      FROM daily CROSS JOIN c0),
        |l AS (SELECT s, lag(s) OVER (ORDER BY day) AS sl, n FROM e),
        |p AS (SELECT s, sl, n FROM l WHERE sl IS NOT NULL),
        |mm AS (SELECT max(n) AS n_days, CAST(count(*) AS BIGINT) AS np,
        |        sum(s) AS ss, sum(sl) AS ssl, sum(s * sl) AS sxy,
        |        sum(s * s) AS sss, sum(sl * sl) AS ssll FROM p),
        |r AS (SELECT n_days, np,
        |       (np * sxy - ssl * ss)
        |         / sqrt((np * ssll - ssl * ssl) * (np * sss - ss * ss))
        |         AS rho FROM mm)
        |SELECT CAST(n_days AS BIGINT) AS n_days, np AS n_pairs,
        |  round(rho, 6) + 0.0 AS rho1,
        |  round(np * rho * rho, 6) + 0.0 AS lm_stat,
        |  CAST(CASE WHEN np * rho * rho > 3.841458820694124
        |       THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
        |FROM r""".stripMargin) { (s, dir) =>
      val daily = dailyRev(s, dir)
      val m = daily.agg(count(lit(1)).as("n"), sum("rv").as("s1"))
      val c0 = m.select(col("n"),
        round(col("s1").cast("double") / col("n"), 8).as("mu"))
      val e = daily.crossJoin(broadcast(c0))
        .select(col("day"),
          ((col("rv").cast("double") - col("mu"))
            * (col("rv").cast("double") - col("mu"))).as("s"), col("n"))
      val l = e.select(col("s"),
        lag(col("s"), 1).over(Window.orderBy("day")).as("sl"), col("n"))
      val p = l.where(col("sl").isNotNull)
      val mm = p.agg(max("n").as("n_days"), count(lit(1)).as("np"),
        sum("s").as("ss"), sum("sl").as("ssl"),
        sum(col("s") * col("sl")).as("sxy"),
        sum(col("s") * col("s")).as("sss"),
        sum(col("sl") * col("sl")).as("ssll"))
      val r = mm.select(col("n_days"), col("np"),
        ((col("np") * col("sxy") - col("ssl") * col("ss"))
          / sqrt((col("np") * col("ssll") - col("ssl") * col("ssl"))
            * (col("np") * col("sss") - col("ss") * col("ss"))))
          .as("rho"))
      val lm = col("np") * col("rho") * col("rho")
      r.select(col("n_days").cast("long").as("n_days"),
        col("np").as("n_pairs"),
        (round(col("rho"), 6) + 0.0).as("rho1"),
        (round(lm, 6) + 0.0).as("lm_stat"),
        when(lm > 3.841458820694124, 1L).otherwise(0L).as("reject_5pct"))
    },

    // ---- Pettitt rank-based change-point test ----
    // WHERE did the daily-revenue level shift? The Mann–Whitney-style
    // U_t = Σ_{i≤t}Σ_{j>t} sign(x_i − x_j) via the midrank identity
    // U_t = 2·Σ_{i≤t} r_i − t(n+1) (r = average ranks — the identity
    // holds exactly under ties with midranks; brute-force-verified
    // against the O(n²) sign sum on the sf0.001 corpus), K = max|U_t|,
    // and the standard approximation p ≈ 2·exp(−6K²/(n³+n²)).
    // Exactness: ranks are integers off exact DECIMAL day revenues,
    // midranks are exact half-integers, the cumulative sum is a
    // bounded window — every emitted number is grid-exact before the
    // final exp. 100-TB story: one corpus pass to the calendar-bounded
    // day frame; two windows + an argmax.
    sql(
      "q_pettitt_test",
      s"""WITH $DailyRevSql,
        |rk AS (SELECT day, rv,
        |        CAST(rank() OVER (ORDER BY rv) AS BIGINT) AS rmin,
        |        CAST(count(*) OVER (PARTITION BY rv) AS BIGINT) AS cv,
        |        CAST(count(*) OVER () AS BIGINT) AS n
        |      FROM daily),
        |mr AS (SELECT day, n, rmin + (cv - 1) / 2.0e0 AS r FROM rk),
        |u AS (SELECT day, n,
        |        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
        |        2 * sum(r) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |          AS cum2r
        |      FROM mr),
        |uu AS (SELECT day, t, n, cum2r - t * (n + 1.0e0) AS ut
        |       FROM u WHERE t < n),
        |k AS (SELECT day, t, n, abs(ut) AS au, ut FROM uu
        |      ORDER BY abs(ut) DESC, t LIMIT 1)
        |SELECT n AS n_days, t AS change_t, day AS change_day,
        |  round(ut, 1) + 0.0 AS u_at_change,
        |  round(au, 1) + 0.0 AS k_stat,
        |  round(least(1.0e0, 2 * exp(-6.0e0 * au * au
        |    / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n))), 6)
        |    + 0.0 AS p_approx,
        |  CAST(CASE WHEN 2 * exp(-6.0e0 * au * au
        |    / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)) < 0.05e0
        |    THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
        |FROM k""".stripMargin) { (s, dir) =>
      val daily = dailyRev(s, dir)
      val rk = daily.select(col("day"), col("rv"),
        rank().over(Window.orderBy("rv")).cast("long").as("rmin"),
        count(lit(1)).over(Window.partitionBy("rv")).cast("long").as("cv"),
        count(lit(1)).over(Window.partitionBy()).cast("long").as("n"))
      val mr = rk.select(col("day"), col("n"),
        (col("rmin") + (col("cv") - 1) / lit(2.0)).as("r"))
      val u = mr.select(col("day"), col("n"),
        row_number().over(Window.orderBy("day")).cast("long").as("t"),
        (lit(2) * sum("r").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .as("cum2r"))
      val uu = u.where(col("t") < col("n"))
        .select(col("day"), col("t"), col("n"),
          (col("cum2r") - col("t") * (col("n") + lit(1.0))).as("ut"))
      val k = uu.select(col("day"), col("t"), col("n"),
          abs(col("ut")).as("au"), col("ut"))
        .orderBy(col("au").desc, col("t")).limit(1)
      val p2 = lit(2) * exp(lit(-6.0) * col("au") * col("au")
        / (col("n").cast("double") * col("n") * col("n")
          + col("n").cast("double") * col("n")))
      k.select(col("n").as("n_days"), col("t").as("change_t"),
        col("day").as("change_day"),
        (round(col("ut"), 1) + 0.0).as("u_at_change"),
        (round(col("au"), 1) + 0.0).as("k_stat"),
        (round(least(lit(1.0), p2), 6) + 0.0).as("p_approx"),
        when(p2 < 0.05, 1L).otherwise(0L).as("reject_5pct"))
    },

    // ---- CAPM market-model beta (per region vs the market) ----
    // Each region's daily revenue return regressed on the aggregate
    // "market" return: β = cov/var, α = ȳ − βx̄, R² = corr² — the
    // systematic-vs-idiosyncratic decomposition completing the
    // q_sharpe_ratio risk family. Returns divide exact DECIMAL day
    // revenues (identical doubles both engines); the 5-series moment
    // sums run doubles over calendar-bounded day counts at O(1)
    // magnitudes (the sharpe convention). 100-TB story: one keyed
    // corpus collapse to region×day, a day-keyed equi-join of two
    // calendar-bounded frames, a 5-row collapse.
    sql(
      "q_capm_beta",
      """WITH rev AS (SELECT r.r_name, CAST(o.o_orderdate AS DATE) AS day,
        |        sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rv
        |      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |      JOIN nation n ON n.n_nationkey = c.c_nationkey
        |      JOIN region r ON r.r_regionkey = n.n_regionkey
        |      GROUP BY 1, 2),
        |mkt AS (SELECT day, sum(rv) AS mv FROM rev GROUP BY 1),
        |ra AS (SELECT r_name, day, CAST(rv AS DOUBLE)
        |        / lag(CAST(rv AS DOUBLE)) OVER (PARTITION BY r_name
        |            ORDER BY day) - 1.0e0 AS ret FROM rev),
        |rm AS (SELECT day, CAST(mv AS DOUBLE)
        |        / lag(CAST(mv AS DOUBLE)) OVER (ORDER BY day) - 1.0e0
        |          AS mret FROM mkt),
        |j AS (SELECT a.r_name, a.ret, m.mret FROM ra a
        |      JOIN rm m ON m.day = a.day
        |      WHERE a.ret IS NOT NULL AND m.mret IS NOT NULL),
        |mm AS (SELECT r_name, CAST(count(*) AS BIGINT) AS n, sum(ret) AS sy,
        |        sum(mret) AS sx, sum(ret * mret) AS sxy,
        |        sum(mret * mret) AS sxx, sum(ret * ret) AS syy
        |      FROM j GROUP BY 1),
        |f AS (SELECT r_name, n,
        |       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
        |       sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx / n
        |         AS alpha,
        |       (n * sxy - sx * sy) * (n * sxy - sx * sy)
        |         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
        |      FROM mm)
        |SELECT r_name, n AS n_days, round(beta, 6) + 0.0 AS beta,
        |  round(alpha, 6) + 0.0 AS alpha, round(r2, 6) + 0.0 AS r2
        |FROM f ORDER BY r_name""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
        .localCheckpoint() // 5 regions × calendar days; reused 2×
      val mkt = rev.groupBy("day").agg(sum("rv").as("mv"))
      val ra = rev.select(col("r_name"), col("day"),
        (col("rv").cast("double")
          / lag(col("rv").cast("double"), 1)
            .over(Window.partitionBy("r_name").orderBy("day"))
          - lit(1.0)).as("ret"))
      val rm = mkt.select(col("day"),
        (col("mv").cast("double")
          / lag(col("mv").cast("double"), 1).over(Window.orderBy("day"))
          - lit(1.0)).as("mret"))
      val j = ra.join(rm, "day")
        .where(col("ret").isNotNull && col("mret").isNotNull)
      val mm = j.groupBy("r_name").agg(count(lit(1)).as("n"),
        sum("ret").as("sy"), sum("mret").as("sx"),
        sum(col("ret") * col("mret")).as("sxy"),
        sum(col("mret") * col("mret")).as("sxx"),
        sum(col("ret") * col("ret")).as("syy"))
      val betaC = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      val f = mm.select(col("r_name"), col("n"), betaC.as("beta"),
        (col("sy") / col("n") - betaC * col("sx") / col("n")).as("alpha"),
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          * (col("n") * col("sxy") - col("sx") * col("sy"))
          / ((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"))
      f.select(col("r_name"), col("n").as("n_days"),
          (round(col("beta"), 6) + 0.0).as("beta"),
          (round(col("alpha"), 6) + 0.0).as("alpha"),
          (round(col("r2"), 6) + 0.0).as("r2"))
        .orderBy("r_name")
    },

    // ---- Sortino ratio (downside-deviation risk adjustment) ----
    // The q_sharpe_ratio twin that only penalizes DOWNSIDE volatility:
    // per nation, mean daily return over the full-period downside
    // deviation √(Σ min(r,0)²/n) at MAR = 0, annualized by the same
    // pinned √252 literal. Identical frame, window and moment
    // conventions as sharpe. 100-TB story: one keyed corpus collapse,
    // one per-nation lag window, one 25-row collapse.
    sql(
      "q_sortino_ratio",
      s"""WITH $NationDaySql,
        |r AS (SELECT n_name, day, CAST(rv AS DOUBLE)
        |        / lag(CAST(rv AS DOUBLE)) OVER (PARTITION BY n_name
        |            ORDER BY day) - 1.0e0 AS ret FROM rev),
        |m AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n, sum(ret) AS s,
        |        sum(CASE WHEN ret < 0 THEN ret * ret ELSE 0 END) AS sdn,
        |        CAST(sum(CASE WHEN ret < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS ndn
        |      FROM r WHERE ret IS NOT NULL GROUP BY 1),
        |f AS (SELECT n_name, n, ndn, s / n AS mu, sqrt(sdn / n) AS dd
        |      FROM m)
        |SELECT n_name, n AS n_days, ndn AS n_down,
        |  round(mu, 6) + 0.0 AS mean_ret, round(dd, 6) + 0.0
        |    AS downside_dev,
        |  round(mu / dd, 6) + 0.0 AS sortino_daily,
        |  round(mu / dd * 15.874507866387544e0, 6) + 0.0 AS sortino_annual
        |FROM f ORDER BY n_name""".stripMargin) { (s, dir) =>
      val rev = nationDay(s, dir)
        .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
      val wDay = Window.partitionBy("n_name").orderBy("day")
      val r = rev.select(col("n_name"), col("day"),
        (col("rv").cast("double")
          / lag(col("rv").cast("double"), 1).over(wDay) - lit(1.0))
          .as("ret"))
      val m = r.where(col("ret").isNotNull)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum("ret").as("s"),
          sum(when(col("ret") < 0, col("ret") * col("ret")).otherwise(0.0))
            .as("sdn"),
          sum(when(col("ret") < 0, 1L).otherwise(0L)).cast("long")
            .as("ndn"))
      val mu = col("s") / col("n")
      val dd = sqrt(col("sdn") / col("n"))
      m.select(col("n_name"), col("n").as("n_days"),
          col("ndn").as("n_down"),
          (round(mu, 6) + 0.0).as("mean_ret"),
          (round(dd, 6) + 0.0).as("downside_dev"),
          (round(mu / dd, 6) + 0.0).as("sortino_daily"),
          (round(mu / dd * 15.874507866387544, 6) + 0.0)
            .as("sortino_annual"))
        .orderBy("n_name")
    },

    // ---- Calmar ratio (annualized return over max drawdown) ----
    // The drawdown-normalized return completing the tail-risk family:
    // per nation, the wealth index is exp of the running log-return
    // sum, max drawdown 1 − exp(cl − peak) off a running max, and
    // calmar = annualized return / MDD with the pinned 252 trading-day
    // year. Log returns are doubles of exact-decimal revenue ratios;
    // every window is calendar-bounded; the lone cross-engine libm
    // surfaces (ln, exp) act on O(1) magnitudes against the 6-dp gate
    // (the q_periodogram margin class). 100-TB story: one keyed corpus
    // collapse, two bounded windows, a 25-row collapse.
    sql(
      "q_calmar_ratio",
      s"""WITH $NationDaySql,
        |r AS (SELECT n_name, day, ln(CAST(rv AS DOUBLE)
        |        / lag(CAST(rv AS DOUBLE)) OVER (PARTITION BY n_name
        |            ORDER BY day)) AS lr FROM rev),
        |c AS (SELECT n_name, day,
        |        sum(lr) OVER (PARTITION BY n_name ORDER BY day
        |                      ROWS UNBOUNDED PRECEDING) AS cl
        |      FROM r WHERE lr IS NOT NULL),
        |d AS (SELECT n_name, cl,
        |        max(cl) OVER (PARTITION BY n_name ORDER BY day
        |                      ROWS UNBOUNDED PRECEDING) AS peak FROM c),
        |m AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |        max(peak - cl) AS mdl FROM d GROUP BY 1),
        |e AS (SELECT n_name, sum(lr) AS cl_end FROM r
        |      WHERE lr IS NOT NULL GROUP BY 1),
        |f AS (SELECT m.n_name, m.n, 1.0e0 - exp(-m.mdl) AS mdd,
        |       exp(252.0e0 / m.n * e.cl_end) - 1.0e0 AS ann
        |      FROM m JOIN e ON e.n_name = m.n_name)
        |SELECT n_name, n AS n_days, round(ann, 6) + 0.0 AS annual_return,
        |  round(mdd, 6) + 0.0 AS max_drawdown,
        |  round(ann / mdd, 6) + 0.0 AS calmar
        |FROM f ORDER BY n_name""".stripMargin) { (s, dir) =>
      val rev = nationDay(s, dir)
        .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
      val wDay = Window.partitionBy("n_name").orderBy("day")
      val wCum = wDay.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val r = rev.select(col("n_name"), col("day"),
        log(col("rv").cast("double")
          / lag(col("rv").cast("double"), 1).over(wDay)).as("lr"))
        .where(col("lr").isNotNull)
        .localCheckpoint() // calendar-bounded; feeds windows + totals
      val c = r.select(col("n_name"), col("day"),
        sum("lr").over(wCum).as("cl"))
      val d = c.select(col("n_name"), col("cl"),
        max("cl").over(wCum).as("peak"))
      val m = d.groupBy("n_name").agg(count(lit(1)).as("n"),
        max(col("peak") - col("cl")).as("mdl"))
      val e = r.groupBy("n_name").agg(sum("lr").as("cl_end"))
      val f = m.join(e, "n_name")
        .select(col("n_name"), col("n"),
          (lit(1.0) - exp(-col("mdl"))).as("mdd"),
          (exp(lit(252.0) / col("n") * col("cl_end")) - lit(1.0))
            .as("ann"))
      f.select(col("n_name"), col("n").as("n_days"),
          (round(col("ann"), 6) + 0.0).as("annual_return"),
          (round(col("mdd"), 6) + 0.0).as("max_drawdown"),
          (round(col("ann") / col("mdd"), 6) + 0.0).as("calmar"))
        .orderBy("n_name")
    },

    // ---- Cramér–von Mises two-sample EDF test ----
    // Do 1-URGENT and 5-LOW order values come from the same
    // distribution? The rank form T = U/(nm(n+m)) − (4nm−1)/(6(n+m)),
    // U = n·Σ(r_xi − i)² + m·Σ(s_yj − j)², r = combined-sample ranks,
    // i = own-sample ranks — brute-force-verified on sf0.001. Equal
    // values are ordered by o_orderkey IDENTICALLY in both rankings
    // (a deterministic total order both engines share; the classic
    // statistic assumes continuous data, and the fixed tiebreak makes
    // the discrete version reproducible). Exactness: both ranks are
    // integers, (r−i)² sums ride as exact DECIMAL, the lone doubles
    // are the two final ratios. 100-TB story: two rank windows over
    // the filtered corpus (sort-based, no pair join), one 2-row
    // collapse — O(n log n) at any scale.
    sql(
      "q_cramer_von_mises",
      """WITH s AS (SELECT o_orderkey AS k,
        |        CAST(o_totalprice AS DECIMAL(18,2)) AS v,
        |        CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
        |          AS g
        |      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |rk AS (SELECT g, v, k,
        |        CAST(row_number() OVER (ORDER BY v, k) AS BIGINT) AS r,
        |        CAST(row_number() OVER (PARTITION BY g ORDER BY v, k)
        |          AS BIGINT) AS i
        |      FROM s),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt,
        |        sum(CAST((r - i) * (r - i) AS DECIMAL(38,0))) AS sq
        |      FROM rk GROUP BY g),
        |p AS (SELECT
        |       (SELECT cnt FROM m WHERE g = 1) AS n,
        |       (SELECT cnt FROM m WHERE g = 2) AS mm,
        |       (SELECT sq FROM m WHERE g = 1) AS sqx,
        |       (SELECT sq FROM m WHERE g = 2) AS sqy),
        |u AS (SELECT n, mm,
        |       CAST(n AS DOUBLE) * CAST(sqx AS DOUBLE)
        |         + CAST(mm AS DOUBLE) * CAST(sqy AS DOUBLE) AS uu FROM p),
        |f AS (SELECT n, mm, uu,
        |       uu / (CAST(n AS DOUBLE) * mm * (n + mm))
        |         - (4.0e0 * n * mm - 1) / (6.0e0 * (n + mm)) AS t FROM u)
        |SELECT n AS n_urgent, mm AS n_low, round(uu, 1) + 0.0 AS u_stat,
        |  round(t, 6) + 0.0 AS cvm_t,
        |  CAST(CASE WHEN t > 0.461e0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS reject_5pct
        |FROM f""".stripMargin) { (s, dir) =>
      val sd = t(s, dir, "orders")
        .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast("decimal(18,2)").as("v"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(2)
            .as("g"))
      // GLOBAL ranks via the GlobalPrefix two-pass, never a one-task
      // Window.orderBy (the 100x gate measured the naive window at
      // 13x): combined rank r = prefix count of 1s; within-group rank
      // i = prefix count of own-group rows over the SAME total order
      // (inclusive prefix of g=1 rows IS the within rank at a g=1
      // row; r - c1 at a g=2 row).
      val ranked = GlobalPrefix.runningTotal(
        GlobalPrefix.runningTotal(sd, Seq(col("v"), col("k")),
          lit(1L), "r"),
        Seq(col("v"), col("k")),
        when(col("g") === 1, 1L).otherwise(0L), "c1")
      val rk = ranked.select(col("g"), col("r"),
        when(col("g") === 1, col("c1")).otherwise(col("r") - col("c1"))
          .as("i"))
      val m = rk.groupBy("g").agg(count(lit(1)).as("cnt"),
        sum(((col("r") - col("i")) * (col("r") - col("i")))
          .cast("decimal(38,0)")).as("sq"))
      val p = m.where(col("g") === 1)
        .select(col("cnt").as("n"), col("sq").as("sqx"))
        .crossJoin(broadcast(m.where(col("g") === 2)
          .select(col("cnt").as("mm"), col("sq").as("sqy"))))
      val u = p.select(col("n"), col("mm"),
        (col("n").cast("double") * col("sqx").cast("double")
          + col("mm").cast("double") * col("sqy").cast("double"))
          .as("uu"))
      val tS = col("uu") / (col("n").cast("double") * col("mm")
        * (col("n") + col("mm"))) -
        (lit(4.0) * col("n") * col("mm") - 1) /
          (lit(6.0) * (col("n") + col("mm")))
      u.select(col("n").as("n_urgent"), col("mm").as("n_low"),
        (round(col("uu"), 1) + 0.0).as("u_stat"),
        (round(tS, 6) + 0.0).as("cvm_t"),
        when(tS > 0.461, 1L).otherwise(0L).as("reject_5pct"))
    },

    // ---- odds ratio with Woolf confidence interval ----
    // The epidemiologist's 2×2 effect size: exposure = order value
    // above the exact corpus median, outcome = urgent/high priority.
    // OR = ad/bc with the log-scale Woolf CI
    // exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)) at the pinned z. The
    // median comes from the engine's ExactQuantiles (the q_mood_median
    // pairing with DuckDB's quantile_cont); the four cells are one
    // corpus pass of integer counts, so everything downstream is
    // 1-row arithmetic on identical inputs. 100-TB story: the exact
    // median's two passes + one counting pass; 1-row math.
    sql(
      "q_odds_ratio",
      """WITH med AS (SELECT quantile_cont(CAST(o_totalprice AS DOUBLE),
        |        0.5) AS md FROM orders),
        |c AS (SELECT
        |       CAST(sum(CASE WHEN o_totalprice > m.md
        |         AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |         THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |       CAST(sum(CASE WHEN o_totalprice > m.md
        |         AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |         THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |       CAST(sum(CASE WHEN o_totalprice <= m.md
        |         AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |         THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |       CAST(sum(CASE WHEN o_totalprice <= m.md
        |         AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |         THEN 1 ELSE 0 END) AS BIGINT) AS d
        |      FROM orders CROSS JOIN med m),
        |f AS (SELECT a, b, c, d,
        |       CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c) AS orr,
        |       sqrt(1.0e0 / a + 1.0e0 / b + 1.0e0 / c + 1.0e0 / d) AS se
        |      FROM c)
        |SELECT a AS n_hi_urgent, b AS n_hi_other, c AS n_lo_urgent,
        |  d AS n_lo_other, round(orr, 6) + 0.0 AS odds_ratio,
        |  round(exp(ln(orr) - 1.959963984540054e0 * se), 6) + 0.0 AS ci_lo,
        |  round(exp(ln(orr) + 1.959963984540054e0 * se), 6) + 0.0 AS ci_hi,
        |  CAST(CASE WHEN ln(orr) - 1.959963984540054e0 * se > 0
        |         OR ln(orr) + 1.959963984540054e0 * se < 0
        |       THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
        |FROM f""".stripMargin) { (s, dir) =>
      val orders = t(s, dir, "orders")
      val med = ExactQuantiles(
        orders.select(col("o_totalprice").cast("double").as("v")),
        "v", Seq(0.5), Seq("md")).select("md")
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      val c = orders.crossJoin(broadcast(med))
        .agg(
          sum(when(col("o_totalprice") > col("md") && urgent, 1L)
            .otherwise(0L)).cast("long").as("a"),
          sum(when(col("o_totalprice") > col("md") && !urgent, 1L)
            .otherwise(0L)).cast("long").as("b"),
          sum(when(col("o_totalprice") <= col("md") && urgent, 1L)
            .otherwise(0L)).cast("long").as("c"),
          sum(when(col("o_totalprice") <= col("md") && !urgent, 1L)
            .otherwise(0L)).cast("long").as("d"))
      val orr = col("a").cast("double") * col("d") /
        (col("b").cast("double") * col("c"))
      val se = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b")
        + lit(1.0) / col("c") + lit(1.0) / col("d"))
      val f = c.select(col("a"), col("b"), col("c"), col("d"),
        orr.as("orr"), se.as("se"))
      f.select(col("a").as("n_hi_urgent"), col("b").as("n_hi_other"),
        col("c").as("n_lo_urgent"), col("d").as("n_lo_other"),
        (round(col("orr"), 6) + 0.0).as("odds_ratio"),
        (round(exp(log(col("orr")) - lit(1.959963984540054) * col("se")),
          6) + 0.0).as("ci_lo"),
        (round(exp(log(col("orr")) + lit(1.959963984540054) * col("se")),
          6) + 0.0).as("ci_hi"),
        when((log(col("orr")) - lit(1.959963984540054) * col("se") > 0)
          || (log(col("orr")) + lit(1.959963984540054) * col("se") < 0),
          1L).otherwise(0L).as("reject_5pct"))
    },

    // ---- Moran's I spatial autocorrelation (same-region weights) ----
    // Do neighboring nations (binary same-region contiguity) have
    // correlated revenue? With block weights the cross-product term
    // needs NO pair join: Σᵢⱼ wᵢⱼzᵢzⱼ = Σ_region[(Σz)² − Σz²], and the
    // normality-assumption variance uses the closed forms S₁ = 2W,
    // S₂ = 4Σ n_r(n_r−1)² — the whole test is one 25-row frame plus
    // per-region sums. Exactness: z-deviations subtract the 8-dp
    // rounded exact mean from exact-decimal revenue doubles; the
    // region collapse is ≤ 5 rows. 100-TB story: one keyed corpus
    // collapse to 25 rows; everything after is constant-size.
    sql(
      "q_morans_i",
      """WITH rev AS (SELECT n.n_nationkey, n.n_regionkey,
        |        sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rvd
        |      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |      JOIN nation n ON n.n_nationkey = c.c_nationkey
        |      GROUP BY 1, 2),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rvd) AS s1
        |      FROM rev),
        |c0 AS (SELECT n, round(CAST(s1 AS DOUBLE) / n, 8) AS mu FROM m),
        |z AS (SELECT n_regionkey, CAST(rvd AS DOUBLE) - c0.mu AS z, c0.n
        |      FROM rev CROSS JOIN c0),
        |rg AS (SELECT n_regionkey, max(n) AS n, sum(z) AS sz,
        |        sum(z * z) AS szz, CAST(count(*) AS BIGINT) AS nr
        |      FROM z GROUP BY 1),
        |agg AS (SELECT max(n) AS n, sum(sz * sz - szz) AS cross_sum,
        |        sum(szz) AS s_zz, CAST(sum(nr * (nr - 1)) AS BIGINT) AS w,
        |        sum(4.0e0 * nr * (nr - 1) * (nr - 1)) AS s2 FROM rg),
        |f AS (SELECT n, w, cross_sum, s_zz,
        |       CAST(n AS DOUBLE) / w * cross_sum / s_zz AS i,
        |       -1.0e0 / (n - 1) AS e_i,
        |       (CAST(n AS DOUBLE) * n * (2.0e0 * w) - n * s2
        |          + 3.0e0 * w * w)
        |         / (CAST(w AS DOUBLE) * w * (CAST(n AS DOUBLE) * n - 1))
        |         - (1.0e0 / (n - 1)) * (1.0e0 / (n - 1)) AS var_i
        |      FROM agg)
        |SELECT n AS n_nations, w AS w_pairs, round(i, 6) + 0.0
        |    AS morans_i,
        |  round(e_i, 6) + 0.0 AS e_i, round(var_i, 6) + 0.0 AS var_i,
        |  round((i - e_i) / sqrt(var_i), 6) + 0.0 AS z_score,
        |  CAST(CASE WHEN abs((i - e_i) / sqrt(var_i))
        |       > 1.959963984540054e0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS reject_5pct
        |FROM f""".stripMargin) { (s, dir) =>
      val rev = nationDay(s, dir)
        .groupBy(col("n_nationkey"), col("n_regionkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rvd"))
      val m = rev.agg(count(lit(1)).as("n"), sum("rvd").as("s1"))
      val c0 = m.select(col("n"),
        round(col("s1").cast("double") / col("n"), 8).as("mu"))
      val z = rev.crossJoin(broadcast(c0))
        .select(col("n_regionkey"),
          (col("rvd").cast("double") - col("mu")).as("z"), col("n"))
      val rg = z.groupBy("n_regionkey").agg(max("n").as("n"),
        sum("z").as("sz"), sum(col("z") * col("z")).as("szz"),
        count(lit(1)).as("nr"))
      val agg = rg.agg(max("n").as("n"),
        sum(col("sz") * col("sz") - col("szz")).as("cross_sum"),
        sum("szz").as("s_zz"),
        sum(col("nr") * (col("nr") - 1)).cast("long").as("w"),
        sum(lit(4.0) * col("nr") * (col("nr") - 1) * (col("nr") - 1))
          .as("s2"))
      val f = agg.select(col("n"), col("w"), col("cross_sum"),
        col("s_zz"),
        (col("n").cast("double") / col("w") * col("cross_sum")
          / col("s_zz")).as("i"),
        (lit(-1.0) / (col("n") - 1)).as("e_i"),
        ((col("n").cast("double") * col("n") * (lit(2.0) * col("w"))
          - col("n") * col("s2") + lit(3.0) * col("w") * col("w")) /
          (col("w").cast("double") * col("w")
            * (col("n").cast("double") * col("n") - 1)) -
          (lit(1.0) / (col("n") - 1)) * (lit(1.0) / (col("n") - 1)))
          .as("var_i"))
      val zSc = (col("i") - col("e_i")) / sqrt(col("var_i"))
      f.select(col("n").as("n_nations"), col("w").as("w_pairs"),
        (round(col("i"), 6) + 0.0).as("morans_i"),
        (round(col("e_i"), 6) + 0.0).as("e_i"),
        (round(col("var_i"), 6) + 0.0).as("var_i"),
        (round(zSc, 6) + 0.0).as("z_score"),
        when(abs(zSc) > 1.959963984540054, 1L).otherwise(0L)
          .as("reject_5pct"))
    },

    // ---- intraclass correlation ICC(1) (one-way random effects) ----
    // How much of order-value variance is BETWEEN customer nations?
    // MSB/MSW from one pass of exact per-group DECIMAL moments, the
    // unbalanced-design k₀ = (N − Σn²/N)/(k−1), and
    // ICC(1) = (MSB − MSW)/(MSB + (k₀−1)MSW). The between-group sum
    // Σ(Σy_g)²/n_g and the within decomposition run doubles computed
    // from exact decimals — the >2^53-magnitude casts go through the
    // VARCHAR bounce so DuckDB takes the correctly-rounded strtod
    // path the JVM's BigDecimal uses (the q_chow_test finding).
    // 100-TB story: one keyed corpus collapse to 25 group-moment
    // rows; 1-row math.
    sql(
      "q_icc",
      """WITH y AS (SELECT c.c_nationkey AS g,
        |        CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
        |      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |pg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng, sum(v) AS sv,
        |        sum(CAST(CAST(v AS DECIMAL(20,2)) * v AS DECIMAL(38,4)))
        |          AS svv
        |      FROM y GROUP BY 1),
        |tt AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |        CAST(count(*) AS BIGINT) AS k,
        |        CAST(CAST(sum(sv) AS VARCHAR) AS DOUBLE) AS s_all,
        |        CAST(CAST(sum(svv) AS VARCHAR) AS DOUBLE) AS ss_all,
        |        sum(CAST(CAST(sv AS VARCHAR) AS DOUBLE)
        |          * CAST(CAST(sv AS VARCHAR) AS DOUBLE) / ng) AS sb,
        |        sum(CAST(ng AS DOUBLE) * ng) AS sn2 FROM pg),
        |f AS (SELECT n, k,
        |       (sb - s_all * s_all / n) / (k - 1) AS msb,
        |       (ss_all - sb) / (n - k) AS msw,
        |       (n - sn2 / n) / (k - 1.0e0) AS k0 FROM tt)
        |SELECT n AS n_obs, k AS k_groups, round(k0, 6) + 0.0 AS k0,
        |  round(msb / msw, 6) + 0.0 AS f_stat,
        |  round((msb - msw) / (msb + (k0 - 1) * msw), 6) + 0.0 AS icc1,
        |  CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2
        |FROM f""".stripMargin) { (s, dir) =>
      val y = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("g"),
          col("o_totalprice").cast("decimal(18,2)").as("v"))
      val pg = y.groupBy("g").agg(count(lit(1)).as("ng"),
        sum("v").as("sv"),
        sum((col("v").cast("decimal(20,2)") * col("v"))
          .cast("decimal(38,4)")).as("svv"))
      val tt = pg.agg(sum("ng").cast("long").as("n"),
        count(lit(1)).as("k"),
        sum("sv").cast("double").as("s_all"),
        sum("svv").cast("double").as("ss_all"),
        sum(col("sv").cast("double") * col("sv").cast("double")
          / col("ng")).as("sb"),
        sum(col("ng").cast("double") * col("ng")).as("sn2"))
      val f = tt.select(col("n"), col("k"),
        ((col("sb") - col("s_all") * col("s_all") / col("n"))
          / (col("k") - 1)).as("msb"),
        ((col("ss_all") - col("sb")) / (col("n") - col("k"))).as("msw"),
        ((col("n") - col("sn2") / col("n")) / (col("k") - lit(1.0)))
          .as("k0"))
      f.select(col("n").as("n_obs"), col("k").as("k_groups"),
        (round(col("k0"), 6) + 0.0).as("k0"),
        (round(col("msb") / col("msw"), 6) + 0.0).as("f_stat"),
        (round((col("msb") - col("msw"))
          / (col("msb") + (col("k0") - 1) * col("msw")), 6) + 0.0)
          .as("icc1"),
        (col("k") - 1).cast("long").as("df1"),
        (col("n") - col("k")).cast("long").as("df2"))
    },

    // ---- Cronbach's α internal-consistency coefficient ----
    // Do quantity/discount/tax move together as one "scale"? Raw
    // α = k/(k−1)·(1 − Σσᵢ²/σ_total²) plus the STANDARDIZED
    // α = k·r̄/(1+(k−1)·r̄) from the mean pairwise correlation (the
    // q_vif moment pairing) — raw α is scale-dominated by quantity's
    // variance here, so the standardized read is the meaningful one,
    // and ≈0 is the honest calibration answer for TPC-H's independent
    // columns (the q_vif convention: the op's value is the shape).
    // One corpus pass of 11 exact DECIMAL moments; 1-row math.
    // 100-TB story: one pass, map-side combined; nothing scales.
    sql(
      "q_cronbach_alpha",
      """WITH it AS (SELECT CAST(l_quantity AS DECIMAL(15,2)) AS i1,
        |        CAST(l_discount AS DECIMAL(15,4)) AS i2,
        |        CAST(l_tax AS DECIMAL(15,4)) AS i3,
        |        CAST(CAST(l_quantity AS DECIMAL(15,2)) AS DECIMAL(17,4))
        |          + CAST(l_discount AS DECIMAL(15,4))
        |          + CAST(l_tax AS DECIMAL(15,4)) AS s
        |      FROM lineitem),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |       sum(i1) AS s1,
        |       sum(CAST(CAST(i1 AS DECIMAL(17,2)) * i1 AS DECIMAL(38,4)))
        |         AS s11,
        |       sum(i2) AS s2,
        |       sum(CAST(CAST(i2 AS DECIMAL(17,4)) * i2 AS DECIMAL(38,8)))
        |         AS s22,
        |       sum(i3) AS s3,
        |       sum(CAST(CAST(i3 AS DECIMAL(17,4)) * i3 AS DECIMAL(38,8)))
        |         AS s33,
        |       sum(CAST(CAST(i1 AS DECIMAL(17,2)) * i2 AS DECIMAL(38,6)))
        |         AS s12,
        |       sum(CAST(CAST(i1 AS DECIMAL(17,2)) * i3 AS DECIMAL(38,6)))
        |         AS s13,
        |       sum(CAST(CAST(i2 AS DECIMAL(17,4)) * i3 AS DECIMAL(38,8)))
        |         AS s23,
        |       sum(s) AS st,
        |       sum(CAST(CAST(s AS DECIMAL(19,4)) * s AS DECIMAL(38,8)))
        |         AS stt
        |      FROM it),
        |v AS (SELECT n,
        |       (CAST(s11 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)
        |         AS v1,
        |       (CAST(s22 AS DOUBLE)
        |          - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n) / (n - 1)
        |         AS v2,
        |       (CAST(s33 AS DOUBLE)
        |          - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / n) / (n - 1)
        |         AS v3,
        |       (CAST(stt AS DOUBLE)
        |          - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n) / (n - 1)
        |         AS vt,
        |       (n * CAST(s12 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
        |         / sqrt((n * CAST(s11 AS DOUBLE)
        |             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |           * (n * CAST(s22 AS DOUBLE)
        |             - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))) AS r12,
        |       (n * CAST(s13 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE))
        |         / sqrt((n * CAST(s11 AS DOUBLE)
        |             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |           * (n * CAST(s33 AS DOUBLE)
        |             - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))) AS r13,
        |       (n * CAST(s23 AS DOUBLE)
        |          - CAST(s2 AS DOUBLE) * CAST(s3 AS DOUBLE))
        |         / sqrt((n * CAST(s22 AS DOUBLE)
        |             - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
        |           * (n * CAST(s33 AS DOUBLE)
        |             - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))) AS r23
        |      FROM m),
        |f AS (SELECT n, v1, v2, v3, vt, (r12 + r13 + r23) / 3 AS rbar
        |      FROM v)
        |SELECT n AS n_rows, round(v1, 6) + 0.0 AS var_quantity,
        |  round(v2, 6) + 0.0 AS var_discount,
        |  round(v3, 6) + 0.0 AS var_tax,
        |  round(3.0e0 / 2 * (1 - (v1 + v2 + v3) / vt), 6) + 0.0
        |    AS cronbach_alpha,
        |  round(rbar, 6) + 0.0 AS mean_pairwise_r,
        |  round(3 * rbar / (1 + 2 * rbar), 6) + 0.0 AS cronbach_alpha_std
        |FROM f""".stripMargin) { (s, dir) =>
      val it = t(s, dir, "lineitem").select(
        col("l_quantity").cast("decimal(15,2)").as("i1"),
        col("l_discount").cast("decimal(15,4)").as("i2"),
        col("l_tax").cast("decimal(15,4)").as("i3"),
        (col("l_quantity").cast("decimal(15,2)").cast("decimal(17,4)")
          + col("l_discount").cast("decimal(15,4)")
          + col("l_tax").cast("decimal(15,4)")).as("s"))
      val m = it.agg(count(lit(1)).as("n"),
        sum("i1").as("s1"),
        sum((col("i1").cast("decimal(17,2)") * col("i1"))
          .cast("decimal(38,4)")).as("s11"),
        sum("i2").as("s2"),
        sum((col("i2").cast("decimal(17,4)") * col("i2"))
          .cast("decimal(38,8)")).as("s22"),
        sum("i3").as("s3"),
        sum((col("i3").cast("decimal(17,4)") * col("i3"))
          .cast("decimal(38,8)")).as("s33"),
        sum((col("i1").cast("decimal(17,2)") * col("i2"))
          .cast("decimal(38,6)")).as("s12"),
        sum((col("i1").cast("decimal(17,2)") * col("i3"))
          .cast("decimal(38,6)")).as("s13"),
        sum((col("i2").cast("decimal(17,4)") * col("i3"))
          .cast("decimal(38,8)")).as("s23"),
        sum("s").as("st"),
        sum((col("s").cast("decimal(19,4)") * col("s"))
          .cast("decimal(38,8)")).as("stt"))
      def vOf(ss: String, sl: String): org.apache.spark.sql.Column =
        (col(ss).cast("double")
          - col(sl).cast("double") * col(sl).cast("double") / col("n")) /
          (col("n") - 1)
      def rOf(sij: String, si: String, sj: String, sii: String,
          sjj: String): org.apache.spark.sql.Column =
        (col("n") * col(sij).cast("double")
          - col(si).cast("double") * col(sj).cast("double")) /
          sqrt((col("n") * col(sii).cast("double")
            - col(si).cast("double") * col(si).cast("double")) *
            (col("n") * col(sjj).cast("double")
              - col(sj).cast("double") * col(sj).cast("double")))
      val v = m.select(col("n"),
        vOf("s11", "s1").as("v1"), vOf("s22", "s2").as("v2"),
        vOf("s33", "s3").as("v3"), vOf("stt", "st").as("vt"),
        rOf("s12", "s1", "s2", "s11", "s22").as("r12"),
        rOf("s13", "s1", "s3", "s11", "s33").as("r13"),
        rOf("s23", "s2", "s3", "s22", "s33").as("r23"))
      val f = v.select(col("n"), col("v1"), col("v2"), col("v3"),
        col("vt"),
        ((col("r12") + col("r13") + col("r23")) / 3).as("rbar"))
      f.select(col("n").as("n_rows"),
        (round(col("v1"), 6) + 0.0).as("var_quantity"),
        (round(col("v2"), 6) + 0.0).as("var_discount"),
        (round(col("v3"), 6) + 0.0).as("var_tax"),
        (round(lit(3.0) / 2 * (lit(1)
          - (col("v1") + col("v2") + col("v3")) / col("vt")), 6) + 0.0)
          .as("cronbach_alpha"),
        (round(col("rbar"), 6) + 0.0).as("mean_pairwise_r"),
        (round(lit(3) * col("rbar") / (lit(1) + lit(2) * col("rbar")), 6)
          + 0.0).as("cronbach_alpha_std"))
    },

    // ---- Ansari–Bradley rank dispersion test ----
    // Do 1-URGENT and 5-LOW order values differ in SPREAD (not
    // location)? Scores a_i = min(r, N+1−r) fold both tails inward;
    // AB = Σ scores in the urgent sample against the parity-split
    // closed-form null mean/variance. Ties take the q_cramer_von_mises
    // convention: a deterministic o_orderkey tiebreak shared by both
    // engines (the discrete-data version of a continuous-data test).
    // Scores and AB are exact integers; the lone doubles are E/Var/z.
    // 100-TB story: one rank window (sort-based), one 1-row collapse.
    sql(
      "q_ansari_bradley",
      """WITH s AS (SELECT o_orderkey AS k,
        |        CAST(o_totalprice AS DECIMAL(18,2)) AS v,
        |        CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
        |          AS g
        |      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |rk AS (SELECT g,
        |        CAST(row_number() OVER (ORDER BY v, k) AS BIGINT) AS r,
        |        CAST(count(*) OVER () AS BIGINT) AS nn FROM s),
        |sc AS (SELECT g, nn, least(r, nn + 1 - r) AS a FROM rk),
        |m AS (SELECT max(nn) AS nn,
        |       CAST(sum(CASE WHEN g = 1 THEN a ELSE 0 END) AS BIGINT)
        |         AS ab,
        |       CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n1,
        |       CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n2
        |      FROM sc),
        |f AS (SELECT nn, ab, n1, n2,
        |       CASE WHEN nn % 2 = 0 THEN n1 * (nn + 2) / 4.0e0
        |            ELSE n1 * (nn + 1.0e0) * (nn + 1) / (4.0e0 * nn) END
        |         AS e_ab,
        |       CASE WHEN nn % 2 = 0
        |            THEN CAST(n1 AS DOUBLE) * n2 * (nn + 2) * (nn - 2)
        |                 / (48.0e0 * (nn - 1))
        |            ELSE CAST(n1 AS DOUBLE) * n2 * (nn + 1) * (3 + nn * nn)
        |                 / (48.0e0 * nn * nn) END AS var_ab
        |      FROM m)
        |SELECT nn AS n_total, n1 AS n_urgent, ab AS ab_stat,
        |  round(e_ab, 4) + 0.0 AS e_ab, round(var_ab, 4) + 0.0 AS var_ab,
        |  round((ab - e_ab) / sqrt(var_ab), 6) + 0.0 AS z,
        |  CAST(CASE WHEN abs((ab - e_ab) / sqrt(var_ab))
        |       > 1.959963984540054 THEN 1 ELSE 0 END AS BIGINT)
        |    AS reject_5pct
        |FROM f""".stripMargin) { (s, dir) =>
      val sd = t(s, dir, "orders")
        .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast("decimal(18,2)").as("v"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(2)
            .as("g"))
      // GlobalPrefix two-pass global rank (no one-task window; the
      // naive Window.orderBy measured 10.6x at the 100x gate); the
      // grand total rides along as the N every folded score needs.
      val (ranked, grand) = GlobalPrefix.runningTotalWithGrand(
        sd, Seq(col("v"), col("k")), lit(1L), "r")
      val rk = ranked
        .crossJoin(broadcast(grand.select(col("__grand").as("nn"))))
        .select(col("g"), col("r"), col("nn"))
      val sc = rk.select(col("g"), col("nn"),
        least(col("r"), col("nn") + 1 - col("r")).as("a"))
      val m = sc.agg(max("nn").as("nn"),
        sum(when(col("g") === 1, col("a")).otherwise(0L)).cast("long")
          .as("ab"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("g") === 2, 1L).otherwise(0L)).cast("long").as("n2"))
      val f = m.select(col("nn"), col("ab"), col("n1"), col("n2"),
        when(col("nn") % 2 === 0, col("n1") * (col("nn") + 2) / lit(4.0))
          .otherwise(col("n1") * (col("nn") + lit(1.0)) * (col("nn") + 1)
            / (lit(4.0) * col("nn"))).as("e_ab"),
        when(col("nn") % 2 === 0,
          col("n1").cast("double") * col("n2") * (col("nn") + 2)
            * (col("nn") - 2) / (lit(48.0) * (col("nn") - 1)))
          .otherwise(col("n1").cast("double") * col("n2")
            * (col("nn") + 1) * (lit(3) + col("nn") * col("nn"))
            / (lit(48.0) * col("nn") * col("nn"))).as("var_ab"))
      val z = (col("ab") - col("e_ab")) / sqrt(col("var_ab"))
      f.select(col("nn").as("n_total"), col("n1").as("n_urgent"),
        col("ab").as("ab_stat"),
        (round(col("e_ab"), 4) + 0.0).as("e_ab"),
        (round(col("var_ab"), 4) + 0.0).as("var_ab"),
        (round(z, 6) + 0.0).as("z"),
        when(abs(z) > 1.959963984540054, 1L).otherwise(0L)
          .as("reject_5pct"))
    },

    // ---- Theil's U (is weekly seasonality informative?) ----
    // The forecast-accuracy ratio U = RMSE(seasonal-naive, lag 7) /
    // RMSE(naive, lag 1) on daily revenue, both restricted to the
    // same support (t > 7) so the ratio compares like with like.
    // U < 1 reads "the weekly pattern predicts better than
    // persistence". Differences of identical doubles, squared sums
    // over the calendar-bounded day frame. 100-TB story: one corpus
    // pass to the day frame, one lag window, one 1-row collapse.
    sql(
      "q_theil_u",
      s"""WITH $DailyRevSql,
        |l AS (SELECT CAST(rv AS DOUBLE) AS y,
        |        lag(CAST(rv AS DOUBLE), 1) OVER (ORDER BY day) AS y1,
        |        lag(CAST(rv AS DOUBLE), 7) OVER (ORDER BY day) AS y7
        |      FROM daily),
        |p AS (SELECT y, y1, y7 FROM l WHERE y7 IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |       sum((y - y1) * (y - y1)) AS s1,
        |       sum((y - y7) * (y - y7)) AS s7 FROM p)
        |SELECT n AS n_days, round(sqrt(s1 / n), 2) + 0.0 AS rmse_naive,
        |  round(sqrt(s7 / n), 2) + 0.0 AS rmse_seasonal,
        |  round(sqrt(s7 / s1), 6) + 0.0 AS theil_u,
        |  CAST(CASE WHEN s7 < s1 THEN 1 ELSE 0 END AS BIGINT)
        |    AS seasonal_wins
        |FROM m""".stripMargin) { (s, dir) =>
      val daily = dailyRev(s, dir)
      val w = Window.orderBy("day")
      val l = daily.select(col("rv").cast("double").as("y"),
        lag(col("rv").cast("double"), 1).over(w).as("y1"),
        lag(col("rv").cast("double"), 7).over(w).as("y7"))
      val p = l.where(col("y7").isNotNull)
      val m = p.agg(count(lit(1)).as("n"),
        sum((col("y") - col("y1")) * (col("y") - col("y1"))).as("s1"),
        sum((col("y") - col("y7")) * (col("y") - col("y7"))).as("s7"))
      m.select(col("n").as("n_days"),
        (round(sqrt(col("s1") / col("n")), 2) + 0.0).as("rmse_naive"),
        (round(sqrt(col("s7") / col("n")), 2) + 0.0).as("rmse_seasonal"),
        (round(sqrt(col("s7") / col("s1")), 6) + 0.0).as("theil_u"),
        when(col("s7") < col("s1"), 1L).otherwise(0L).as("seasonal_wins"))
    },

    // ---- ordinal association: Somers' D, gamma, Kendall tau-b ----
    // How strongly does lineitem quantity track the priority ladder,
    // as ORDINAL association? Concordant/discordant pair masses come
    // from the q_jonckheere_terpstra 250-row histogram (5 priorities ×
    // 50 quantities) — C, D, and the tie masses are exact DECIMAL
    // polynomials in the cell counts, so D_yx = (C−D)/P_x,
    // γ = (C−D)/(C+D) and τ_b = (C−D)/√(P_x·P_y) are single divisions
    // of exact integers (brute-force-verified against the direct pair
    // loop on sf0.001). 100-TB story: one corpus pass to the bounded
    // histogram; a 250×250 broadcast pair sum; 1-row math.
    sql(
      "q_somers_d",
      """WITH h AS (SELECT
        |        CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS x,
        |        CAST(l.l_quantity AS BIGINT) AS y,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |      GROUP BY 1, 2),
        |cd AS (SELECT
        |       sum(CASE WHEN a.x < b.x AND a.y < b.y
        |           THEN CAST(a.c AS DECIMAL(18,0)) * b.c
        |           ELSE CAST(0 AS DECIMAL(18,0)) END) AS cc,
        |       sum(CASE WHEN a.x < b.x AND a.y > b.y
        |           THEN CAST(a.c AS DECIMAL(18,0)) * b.c
        |           ELSE CAST(0 AS DECIMAL(18,0)) END) AS dd
        |      FROM h a JOIN h b ON NOT (a.x = b.x AND a.y = b.y)),
        |gx AS (SELECT x, CAST(sum(c) AS BIGINT) AS ng FROM h GROUP BY 1),
        |gy AS (SELECT y, CAST(sum(c) AS BIGINT) AS tv FROM h GROUP BY 1),
        |tt AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |        sum(CAST(ng AS DECIMAL(38,0)) * (ng - 1)) AS tx2 FROM gx),
        |ty AS (SELECT sum(CAST(tv AS DECIMAL(38,0)) * (tv - 1)) AS ty2
        |       FROM gy),
        |f AS (SELECT tt.n, CAST(cd.cc AS DOUBLE) AS c,
        |       CAST(cd.dd AS DOUBLE) AS d,
        |       (CAST(tt.n AS DOUBLE) * (tt.n - 1)
        |          - CAST(tt.tx2 AS DOUBLE)) / 2 AS px,
        |       (CAST(tt.n AS DOUBLE) * (tt.n - 1)
        |          - CAST(ty.ty2 AS DOUBLE)) / 2 AS py
        |      FROM tt CROSS JOIN ty CROSS JOIN cd)
        |SELECT n AS n_total, round(c, 1) + 0.0 AS concordant,
        |  round(d, 1) + 0.0 AS discordant,
        |  round((c - d) / px, 6) + 0.0 AS somers_d_yx,
        |  round((c - d) / (c + d), 6) + 0.0 AS gamma,
        |  round((c - d) / sqrt(px * py), 6) + 0.0 AS tau_b
        |FROM f""".stripMargin) { (s, dir) =>
      val h = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(
          substring(col("o_orderpriority"), 1, 1).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // ≤ 5×50 histogram cells
      val cd = h.as("a").crossJoin(broadcast(h.as("b")))
        .where(!(col("a.x") === col("b.x") && col("a.y") === col("b.y")))
        .agg(
          sum(when(col("a.x") < col("b.x") && col("a.y") < col("b.y"),
            col("a.c").cast("decimal(18,0)") * col("b.c"))
            .otherwise(lit(0).cast("decimal(18,0)"))).as("cc"),
          sum(when(col("a.x") < col("b.x") && col("a.y") > col("b.y"),
            col("a.c").cast("decimal(18,0)") * col("b.c"))
            .otherwise(lit(0).cast("decimal(18,0)"))).as("dd"))
      val gx = h.groupBy("x").agg(sum("c").cast("long").as("ng"))
      val gy = h.groupBy("y").agg(sum("c").cast("long").as("tv"))
      val tt = gx.agg(sum("ng").cast("long").as("n"),
        sum(col("ng").cast("decimal(38,0)") * (col("ng") - 1)).as("tx2"))
      val ty = gy.agg(
        sum(col("tv").cast("decimal(38,0)") * (col("tv") - 1)).as("ty2"))
      val f = tt.crossJoin(broadcast(ty)).crossJoin(broadcast(cd))
        .select(col("n"), col("cc").cast("double").as("c"),
          col("dd").cast("double").as("d"),
          ((col("n").cast("double") * (col("n") - 1)
            - col("tx2").cast("double")) / 2).as("px"),
          ((col("n").cast("double") * (col("n") - 1)
            - col("ty2").cast("double")) / 2).as("py"))
      f.select(col("n").as("n_total"),
        (round(col("c"), 1) + 0.0).as("concordant"),
        (round(col("d"), 1) + 0.0).as("discordant"),
        (round((col("c") - col("d")) / col("px"), 6) + 0.0)
          .as("somers_d_yx"),
        (round((col("c") - col("d")) / (col("c") + col("d")), 6) + 0.0)
          .as("gamma"),
        (round((col("c") - col("d")) / sqrt(col("px") * col("py")), 6)
          + 0.0).as("tau_b"))
    },

    // ---- Cliff's delta ordinal effect size ----
    // How often does an urgent lineitem out-quantity a low-priority
    // one? δ = (#(x>y) − #(x<y))/(n·m) over the two groups' bounded
    // quantity histograms (exact DECIMAL pair masses — the
    // q_jonckheere_terpstra shape), labeled by the conventional
    // magnitude thresholds (0.147/0.33/0.474) as pinned literals.
    // 100-TB story: one corpus pass to ≤2×50 histogram rows; a
    // bounded pair sum; 1-row math.
    sql(
      "q_cliffs_delta",
      """WITH h AS (SELECT CASE WHEN o.o_orderpriority = '1-URGENT'
        |          THEN 1 ELSE 2 END AS g,
        |        CAST(l.l_quantity AS BIGINT) AS v,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |      WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
        |      GROUP BY 1, 2),
        |p AS (SELECT
        |       sum(CASE WHEN a.v > b.v
        |           THEN CAST(a.c AS DECIMAL(18,0)) * b.c
        |           ELSE CAST(0 AS DECIMAL(18,0)) END) AS gt,
        |       sum(CASE WHEN a.v < b.v
        |           THEN CAST(a.c AS DECIMAL(18,0)) * b.c
        |           ELSE CAST(0 AS DECIMAL(18,0)) END) AS lt
        |      FROM h a JOIN h b ON a.g = 1 AND b.g = 2),
        |m AS (SELECT
        |       CAST(sum(CASE WHEN g = 1 THEN c ELSE 0 END) AS BIGINT)
        |         AS n1,
        |       CAST(sum(CASE WHEN g = 2 THEN c ELSE 0 END) AS BIGINT)
        |         AS n2 FROM h),
        |f AS (SELECT m.n1, m.n2,
        |       (CAST(p.gt AS DOUBLE) - CAST(p.lt AS DOUBLE))
        |         / (CAST(m.n1 AS DOUBLE) * m.n2) AS delta
        |      FROM p CROSS JOIN m)
        |SELECT n1 AS n_urgent, n2 AS n_low,
        |  round(delta, 6) + 0.0 AS cliffs_delta,
        |  CASE WHEN abs(delta) < 0.147e0 THEN 'negligible'
        |       WHEN abs(delta) < 0.33e0 THEN 'small'
        |       WHEN abs(delta) < 0.474e0 THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM f""".stripMargin) { (s, dir) =>
      val h = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
          .where(col("o_orderpriority").isin("1-URGENT", "5-LOW")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(2)
            .as("g"),
          col("l_quantity").cast("long").as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // ≤ 2×50 histogram cells
      val p = h.as("a").crossJoin(broadcast(h.as("b")))
        .where(col("a.g") === 1 && col("b.g") === 2)
        .agg(
          sum(when(col("a.v") > col("b.v"),
            col("a.c").cast("decimal(18,0)") * col("b.c"))
            .otherwise(lit(0).cast("decimal(18,0)"))).as("gt"),
          sum(when(col("a.v") < col("b.v"),
            col("a.c").cast("decimal(18,0)") * col("b.c"))
            .otherwise(lit(0).cast("decimal(18,0)"))).as("lt"))
      val m = h.agg(
        sum(when(col("g") === 1, col("c")).otherwise(0L)).cast("long")
          .as("n1"),
        sum(when(col("g") === 2, col("c")).otherwise(0L)).cast("long")
          .as("n2"))
      val f = p.crossJoin(broadcast(m))
        .select(col("n1"), col("n2"),
          ((col("gt").cast("double") - col("lt").cast("double"))
            / (col("n1").cast("double") * col("n2"))).as("delta"))
      f.select(col("n1").as("n_urgent"), col("n2").as("n_low"),
        (round(col("delta"), 6) + 0.0).as("cliffs_delta"),
        when(abs(col("delta")) < 0.147, "negligible")
          .when(abs(col("delta")) < 0.33, "small")
          .when(abs(col("delta")) < 0.474, "medium")
          .otherwise("large").as("magnitude"))
    },

    // ---- Mahalanobis multivariate day outliers ----
    // Which days are jointly unusual in (revenue, order count)? The
    // 2×2 covariance inverts in closed form, d²ᵗ is a per-row
    // quadratic form around the 8-dp-rounded exact means, and the
    // answer is the top-5 days plus the count beyond the pinned χ²₂
    // 99% bar 9.21034037197618. Covariance sums run doubles over the
    // calendar-bounded day frame (the q_dagostino_k2 drift class).
    // 100-TB story: one corpus pass to the day frame, one bounded
    // moment collapse, one per-row quadratic + top-k.
    sql(
      "q_mahalanobis_outlier",
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rv,
        |        CAST(count(*) AS BIGINT) AS cnt
        |      FROM orders GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rv) AS s1,
        |       CAST(sum(cnt) AS BIGINT) AS s2 FROM daily),
        |c0 AS (SELECT n, round(CAST(s1 AS DOUBLE) / n, 8) AS mu,
        |       round(CAST(s2 AS DOUBLE) / n, 8) AS mv FROM m),
        |z AS (SELECT day, CAST(rv AS DOUBLE) - c0.mu AS du,
        |        CAST(cnt AS DOUBLE) - c0.mv AS dv, c0.n
        |      FROM daily CROSS JOIN c0),
        |cv AS (SELECT max(n) AS n, sum(du * du) AS suu,
        |        sum(dv * dv) AS svv, sum(du * dv) AS suv FROM z),
        |ci AS (SELECT n, suu / n AS a, svv / n AS d, suv / n AS b
        |       FROM cv),
        |dd AS (SELECT z.day,
        |        (z.du * (ci.d * z.du - ci.b * z.dv)
        |          + z.dv * (ci.a * z.dv - ci.b * z.du))
        |          / (ci.a * ci.d - ci.b * ci.b) AS d2
        |      FROM z CROSS JOIN ci)
        |SELECT day, round(d2, 6) + 0.0 AS mahal_d2,
        |  CAST((SELECT count(*) FROM dd WHERE d2 > 9.21034037197618)
        |    AS BIGINT) AS n_beyond_99pct
        |FROM dd ORDER BY d2 DESC, day LIMIT 5""".stripMargin) { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"),
          count(lit(1)).as("cnt"))
      val m = daily.agg(count(lit(1)).as("n"), sum("rv").as("s1"),
        sum("cnt").cast("long").as("s2"))
      val c0 = m.select(col("n"),
        round(col("s1").cast("double") / col("n"), 8).as("mu"),
        round(col("s2").cast("double") / col("n"), 8).as("mv"))
      val z = daily.crossJoin(broadcast(c0))
        .select(col("day"),
          (col("rv").cast("double") - col("mu")).as("du"),
          (col("cnt").cast("double") - col("mv")).as("dv"), col("n"))
      val cv = z.agg(max("n").as("n"),
        sum(col("du") * col("du")).as("suu"),
        sum(col("dv") * col("dv")).as("svv"),
        sum(col("du") * col("dv")).as("suv"))
      val ci = cv.select(col("n"), (col("suu") / col("n")).as("a"),
        (col("svv") / col("n")).as("d"), (col("suv") / col("n")).as("b"))
      val dd = z.crossJoin(broadcast(ci))
        .select(col("day"),
          ((col("du") * (col("d") * col("du") - col("b") * col("dv"))
            + col("dv") * (col("a") * col("dv") - col("b") * col("du"))) /
            (col("a") * col("d") - col("b") * col("b"))).as("d2"))
        .localCheckpoint() // day frame with d2; reused for top-k + count
      val nb = dd.agg(sum(when(col("d2") > 9.21034037197618, 1L)
        .otherwise(0L)).cast("long").as("n_beyond_99pct"))
      dd.orderBy(col("d2").desc, col("day")).limit(5)
        .crossJoin(broadcast(nb))
        .select(col("day"), (round(col("d2"), 6) + 0.0).as("mahal_d2"),
          col("n_beyond_99pct"))
        .orderBy(col("mahal_d2").desc, col("day"))
    },

    // ---- Cramér's V (with Bergsma bias correction) ----
    // How associated are order priority and return flag? χ² over the
    // 5×3 contingency grid (integer counts, exact expected cells from
    // margin products), V = √(χ²/(n·(min(k,m)−1))) plus the
    // bias-corrected V (Bergsma 2013) whose φ²₊ floor keeps small
    // true associations from reading as noise inflation. ≈0 is the
    // honest answer for TPC-H's independent columns (the q_vif
    // convention). 100-TB story: one corpus pass to ≤15 cells;
    // margin joins on the bounded grid; 1-row math.
    sql(
      "q_cramers_v",
      """WITH ct AS (SELECT o.o_orderpriority AS a, l.l_returnflag AS b,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |      GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM ct GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM ct GROUP BY 1),
        |tt AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |        CAST(count(DISTINCT a) AS BIGINT) AS k,
        |        CAST(count(DISTINCT b) AS BIGINT) AS m FROM ct),
        |x AS (SELECT ct.a, ct.b, ct.c,
        |       CAST(ma.ca AS DOUBLE) * mb.cb / tt.n AS e, tt.n, tt.k,
        |       tt.m
        |      FROM ct JOIN ma ON ma.a = ct.a JOIN mb ON mb.b = ct.b
        |      CROSS JOIN tt),
        |q AS (SELECT max(n) AS n, max(k) AS k, max(m) AS m,
        |       sum((c - e) * (c - e) / e) AS chi2 FROM x),
        |f AS (SELECT n, k, m, chi2,
        |       sqrt(chi2 / (n * (least(k, m) - 1))) AS v,
        |       greatest(0.0e0, chi2 / n
        |         - CAST((k - 1) AS DOUBLE) * (m - 1) / (n - 1)) AS phi2c,
        |       k - CAST((k - 1) AS DOUBLE) * (k - 1) / (n - 1) AS kc,
        |       m - CAST((m - 1) AS DOUBLE) * (m - 1) / (n - 1) AS mc
        |      FROM q)
        |SELECT n AS n_rows, CAST((k - 1) * (m - 1) AS BIGINT) AS df,
        |  round(chi2, 6) + 0.0 AS chi2_stat, round(v, 6) + 0.0
        |    AS cramers_v,
        |  round(sqrt(phi2c / least(kc - 1, mc - 1)), 6) + 0.0
        |    AS cramers_v_corrected
        |FROM f""".stripMargin) { (s, dir) =>
      val ct = t(s, dir, "lineitem").select("l_orderkey", "l_returnflag")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority").as("a"),
          col("l_returnflag").as("b"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // ≤ 5×3 contingency cells
      val ma = ct.groupBy("a").agg(sum("c").cast("long").as("ca"))
      val mb = ct.groupBy("b").agg(sum("c").cast("long").as("cb"))
      val tt = ct.agg(sum("c").cast("long").as("n"),
        countDistinct("a").as("k"), countDistinct("b").as("m"))
      val x = ct.join(broadcast(ma), "a").join(broadcast(mb), "b")
        .crossJoin(broadcast(tt))
        .select(col("c"),
          (col("ca").cast("double") * col("cb") / col("n")).as("e"),
          col("n"), col("k"), col("m"))
      val q = x.agg(max("n").as("n"), max("k").as("k"), max("m").as("m"),
        sum((col("c") - col("e")) * (col("c") - col("e")) / col("e"))
          .as("chi2"))
      val f = q.select(col("n"), col("k"), col("m"), col("chi2"),
        sqrt(col("chi2") / (col("n") * (least(col("k"), col("m")) - 1)))
          .as("v"),
        greatest(lit(0.0), col("chi2") / col("n")
          - (col("k") - 1).cast("double") * (col("m") - 1)
            / (col("n") - 1)).as("phi2c"),
        (col("k") - (col("k") - 1).cast("double") * (col("k") - 1)
          / (col("n") - 1)).as("kc"),
        (col("m") - (col("m") - 1).cast("double") * (col("m") - 1)
          / (col("n") - 1)).as("mc"))
      f.select(col("n").as("n_rows"),
        ((col("k") - 1) * (col("m") - 1)).cast("long").as("df"),
        (round(col("chi2"), 6) + 0.0).as("chi2_stat"),
        (round(col("v"), 6) + 0.0).as("cramers_v"),
        (round(sqrt(col("phi2c")
          / (least(col("kc"), col("mc")) - 1)), 6) + 0.0)
          .as("cramers_v_corrected"))
    },

    // ---- forecast tracking signal (cumulative bias monitor) ----
    // The ops-room control chart for a naive daily-revenue forecast:
    // TS_t = cumulative error / cumulative MAD, flagged past the
    // conventional ±4 control limit (pinned). Both cumulative windows
    // run in day order on BOTH engines — the sums are order-pinned,
    // so every TS_t is bit-identical cross-engine. 100-TB story: one
    // corpus pass to the day frame; two ordered windows; 1-row reads.
    sql(
      "q_tracking_signal",
      s"""WITH $DailyRevSql,
        |e AS (SELECT day, CAST(rv AS DOUBLE)
        |        - lag(CAST(rv AS DOUBLE)) OVER (ORDER BY day) AS err
        |      FROM daily),
        |p AS (SELECT day, err,
        |        sum(err) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |          AS ce,
        |        avg(abs(err)) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |          AS mad
        |      FROM e WHERE err IS NOT NULL),
        |ts AS (SELECT day, ce / mad AS t FROM p),
        |mx AS (SELECT day, t FROM ts ORDER BY abs(t) DESC, day LIMIT 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN abs(t) > 4.0e0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_breach,
        |        (SELECT t FROM ts t2 ORDER BY day DESC LIMIT 1)
        |          AS final_ts
        |      FROM ts)
        |SELECT agg.n AS n_days, round(agg.final_ts, 6) + 0.0 AS final_ts,
        |  round(mx.t, 6) + 0.0 AS extreme_ts, mx.day AS extreme_day,
        |  agg.n_breach AS n_beyond_4
        |FROM agg CROSS JOIN mx""".stripMargin) { (s, dir) =>
      val daily = dailyRev(s, dir)
      val w = Window.orderBy("day")
      val wCum = w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val e = daily.select(col("day"),
        (col("rv").cast("double")
          - lag(col("rv").cast("double"), 1).over(w)).as("err"))
      val p = e.where(col("err").isNotNull)
        .select(col("day"),
          sum("err").over(wCum).as("ce"),
          avg(abs(col("err"))).over(wCum).as("mad"))
      val ts = p.select(col("day"), (col("ce") / col("mad")).as("t"))
        .localCheckpoint() // day frame; reused for max + last + counts
      val mx = ts.orderBy(abs(col("t")).desc, col("day")).limit(1)
        .select(col("t").as("xt"), col("day").as("extreme_day"))
      val fin = ts.orderBy(col("day").desc).limit(1)
        .select(col("t").as("final_t"))
      val agg = ts.agg(count(lit(1)).as("n"),
        sum(when(abs(col("t")) > 4.0, 1L).otherwise(0L)).cast("long")
          .as("n_breach"))
      agg.crossJoin(broadcast(fin)).crossJoin(broadcast(mx))
        .select(col("n").as("n_days"),
          (round(col("final_t"), 6) + 0.0).as("final_ts"),
          (round(col("xt"), 6) + 0.0).as("extreme_ts"),
          col("extreme_day"), col("n_breach").as("n_beyond_4"))
    },

    // ---- Brunner–Munzel generalized Wilcoxon test ----
    // The rank test that stays valid under UNEQUAL variances: does a
    // random urgent order value tend to exceed a low-priority one
    // (p̂ = P(X<Y) + ½P(X=Y))? Combined and within-sample ranks (the
    // q_cramer_von_mises deterministic tiebreak), group rank means,
    // the BM rank-variance estimators, and the studentized statistic
    // with its Welch-style df — brute-force-verified against a direct
    // from-definition implementation on sf0.001. The fixed corpus n
    // (~3k+ per group) puts the t reference within 1e-4 of normal, so
    // the pinned 1.96 decision bar stands in for the t quantile
    // (documented approximation). 100-TB story: two rank windows
    // (sort-based), a 2-row collapse, 1-row math.
    sql(
      "q_brunner_munzel",
      """WITH s AS (SELECT o_orderkey AS k,
        |        CAST(o_totalprice AS DECIMAL(18,2)) AS v,
        |        CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
        |          AS g
        |      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |rk AS (SELECT g,
        |        CAST(row_number() OVER (ORDER BY v, k) AS BIGINT) AS r,
        |        CAST(row_number() OVER (PARTITION BY g ORDER BY v, k)
        |          AS BIGINT) AS i
        |      FROM s),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |       CAST(sum(r) AS BIGINT) AS sr FROM rk GROUP BY g),
        |mm AS (SELECT
        |       (SELECT ng FROM m WHERE g = 1) AS n1,
        |       (SELECT ng FROM m WHERE g = 2) AS n2,
        |       (SELECT sr FROM m WHERE g = 1) AS sr1,
        |       (SELECT sr FROM m WHERE g = 2) AS sr2),
        |rb AS (SELECT n1, n2, CAST(sr1 AS DOUBLE) / n1 AS rb1,
        |        CAST(sr2 AS DOUBLE) / n2 AS rb2 FROM mm),
        |sv AS (SELECT rk.g,
        |        sum((rk.r - rk.i
        |             - CASE WHEN rk.g = 1 THEN rb.rb1 ELSE rb.rb2 END
        |             + (CASE WHEN rk.g = 1 THEN rb.n1 ELSE rb.n2 END + 1)
        |               / 2.0e0)
        |          * (rk.r - rk.i
        |             - CASE WHEN rk.g = 1 THEN rb.rb1 ELSE rb.rb2 END
        |             + (CASE WHEN rk.g = 1 THEN rb.n1 ELSE rb.n2 END + 1)
        |               / 2.0e0)) AS ss
        |      FROM rk CROSS JOIN rb GROUP BY rk.g),
        |f AS (SELECT rb.n1, rb.n2, rb.rb1, rb.rb2,
        |       (SELECT ss FROM sv WHERE g = 1) / (rb.n1 - 1) AS s1,
        |       (SELECT ss FROM sv WHERE g = 2) / (rb.n2 - 1) AS s2
        |      FROM rb),
        |w AS (SELECT n1, n2, rb1, rb2, s1, s2,
        |       CAST(n1 AS DOUBLE) * n2 * (rb2 - rb1) / (n1 + n2)
        |         / sqrt(n1 * s1 + n2 * s2) AS bm_w,
        |       (rb2 - (n2 + 1) / 2.0e0) / n1 AS p_hat,
        |       (n1 * s1 + n2 * s2) * (n1 * s1 + n2 * s2)
        |         / ((n1 * s1) * (n1 * s1) / (n1 - 1)
        |            + (n2 * s2) * (n2 * s2) / (n2 - 1)) AS df
        |      FROM f)
        |SELECT n1 AS n_urgent, n2 AS n_low, round(p_hat, 6) + 0.0
        |    AS p_hat,
        |  round(bm_w, 6) + 0.0 AS bm_stat, round(df, 2) + 0.0 AS df_welch,
        |  CAST(CASE WHEN abs(bm_w) > 1.959963984540054 THEN 1 ELSE 0 END
        |       AS BIGINT) AS reject_5pct
        |FROM w""".stripMargin) { (s, dir) =>
      val sd = t(s, dir, "orders")
        .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast("decimal(18,2)").as("v"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(2)
            .as("g"))
      // Same GlobalPrefix double-prefix rank shape as
      // q_cramer_von_mises (the naive one-task window measured 11.4x
      // at the 100x gate).
      val rk = GlobalPrefix.runningTotal(
          GlobalPrefix.runningTotal(sd, Seq(col("v"), col("k")),
            lit(1L), "r"),
          Seq(col("v"), col("k")),
          when(col("g") === 1, 1L).otherwise(0L), "c1")
        .select(col("g"), col("r"),
          when(col("g") === 1, col("c1"))
            .otherwise(col("r") - col("c1")).as("i"))
        .localCheckpoint() // rank frame; reused for means + variances
      val m = rk.groupBy("g").agg(count(lit(1)).as("ng"),
        sum("r").cast("long").as("sr"))
      val mm = m.where(col("g") === 1)
        .select(col("ng").as("n1"), col("sr").as("sr1"))
        .crossJoin(broadcast(m.where(col("g") === 2)
          .select(col("ng").as("n2"), col("sr").as("sr2"))))
      val rb = mm.select(col("n1"), col("n2"),
        (col("sr1").cast("double") / col("n1")).as("rb1"),
        (col("sr2").cast("double") / col("n2")).as("rb2"))
      val dev = col("r") - col("i") -
        when(col("g") === 1, col("rb1")).otherwise(col("rb2")) +
        (when(col("g") === 1, col("n1")).otherwise(col("n2")) + 1) /
          lit(2.0)
      val sv = rk.crossJoin(broadcast(rb))
        .groupBy("g").agg(sum(dev * dev).as("ss"))
      val f = rb
        .crossJoin(broadcast(sv.where(col("g") === 1)
          .select(col("ss").as("ss1"))))
        .crossJoin(broadcast(sv.where(col("g") === 2)
          .select(col("ss").as("ss2"))))
        .select(col("n1"), col("n2"), col("rb1"), col("rb2"),
          (col("ss1") / (col("n1") - 1)).as("s1"),
          (col("ss2") / (col("n2") - 1)).as("s2"))
      val bmW = col("n1").cast("double") * col("n2") *
        (col("rb2") - col("rb1")) / (col("n1") + col("n2")) /
        sqrt(col("n1") * col("s1") + col("n2") * col("s2"))
      val w = f.select(col("n1"), col("n2"),
        bmW.as("bm_w"),
        ((col("rb2") - (col("n2") + 1) / lit(2.0)) / col("n1"))
          .as("p_hat"),
        ((col("n1") * col("s1") + col("n2") * col("s2"))
          * (col("n1") * col("s1") + col("n2") * col("s2")) /
          ((col("n1") * col("s1")) * (col("n1") * col("s1"))
            / (col("n1") - 1)
            + (col("n2") * col("s2")) * (col("n2") * col("s2"))
              / (col("n2") - 1))).as("df"))
      w.select(col("n1").as("n_urgent"), col("n2").as("n_low"),
        (round(col("p_hat"), 6) + 0.0).as("p_hat"),
        (round(col("bm_w"), 6) + 0.0).as("bm_stat"),
        (round(col("df"), 2) + 0.0).as("df_welch"),
        when(abs(col("bm_w")) > 1.959963984540054, 1L).otherwise(0L)
          .as("reject_5pct"))
    }
  )
}
