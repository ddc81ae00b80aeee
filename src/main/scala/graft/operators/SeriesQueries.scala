package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / resampled-statistics operators over the `events` and
  * `orders` streams: trailing-window distinct counting, series
  * autocorrelation, and Poisson-bootstrap confidence intervals — the
  * monitoring / metric-evaluation shapes a training-data platform runs
  * daily over its telemetry.
  *
  * Scale designs (the whole point of each entry):
  *  - sliding distinct: the naive form re-counts a 7-day window per
  *    day (O(days·window) passes, or a giant range join). Instead the
  *    corpus collapses ONCE to distinct (user, day), merges each
  *    user's activity into coverage intervals (a per-user window over
  *    its own activity days), and turns interval endpoints into ±1
  *    diff events — the trailing-distinct series is then a prefix sum
  *    over the tiny calendar grid. One corpus shuffle total.
  *  - autocorrelation: corpus → #days rows in one aggregation; all
  *    seven lag joins run on the collapsed frame. Cross-sums
  *    accumulate in DECIMAL (order-independent — the money-sum idiom,
  *    NOTES r6) so the Pearson arithmetic is bit-identical to the
  *    oracle's regardless of merge order.
  *  - bootstrap: the classic resample-the-dataset bootstrap cannot
  *    scale (R copies of the corpus through a sampler with shared
  *    state); the Poisson bootstrap (per-row independent Poisson(1)
  *    weights — Chamandy et al., "Estimating Uncertainty for Massive
  *    Data Streams", Google 2012) needs ONE pass: each row carries 32
  *    deterministic hash-seeded weights and partial aggregation
  *    collapses everything map-side to 32 replicate rows.
  */
object SeriesQueries {

  import QueryDef.sql
  import graft.functions.TextFunctions.h32Salted

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Day number since 1970-01-01 — the shared TimeFunctions convention. */
  private def dayNum(ts: Column): Column =
    graft.functions.TimeFunctions.dayNum(ts)

  /** Calendar collapse shared by the daily-series operators: one
    * corpus aggregation to (d, rev DECIMAL(15,4)) — exact sums so
    * downstream moments are merge-order-independent — checkpointed
    * because every consumer reads it at least twice. */
  private def dailyDecimal(df: org.apache.spark.sql.DataFrame,
      tsCol: String, vCol: String): org.apache.spark.sql.DataFrame =
    df.groupBy(dayNum(col(tsCol)).as("d"))
      .agg(sum(col(vCol).cast("decimal(18,6)"))
        .cast("decimal(15,4)").as("rev"))
      .localCheckpoint()

  /** Inverse-CDF Poisson(1) from a uniform — cumulative probabilities
    * as pinned double literals so Spark and DuckDB walk the identical
    * ladder (P(k) = e⁻¹/k!, capped at 8: P(X>8) < 1e-9). */
  private val PoissonCum = Seq(
    0.36787944117144233, 0.73575888234288466, 0.91969860292860582,
    0.98101184312384621, 0.99634015317265631, 0.99940581518241833,
    0.99991675885071200, 0.99998975080332538)

  private def poissonW(u: Column): Column =
    PoissonCum.zipWithIndex.foldRight(lit(8): Column) { case ((c, k), els) =>
      when(u < lit(c), k).otherwise(els)
    }

  private val poissonCaseSql: String =
    PoissonCum.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** Exact trailing-`windowDays` distinct users per calendar day via
    * the interval-coverage rewrite (one corpus shuffle — see
    * q_sliding_distinct's scaladoc; shared with the sketch twin's
    * verification path and the DAU/MAU stickiness ratio). Returns
    * (d, users). */
  private def slidingDistinctExact(ev: org.apache.spark.sql.DataFrame,
      windowDays: Int = 7): org.apache.spark.sql.DataFrame =
    slidingDistinctFromDaily(
      ev.select(col("user_id"), dayNum(col("ts")).as("d")).distinct(),
      windowDays)

  /** Same, off a pre-collapsed distinct (user_id, d) frame — so a
    * caller that also needs the daily frame (q_stickiness) pays for
    * the corpus collapse once. */
  private def slidingDistinctFromDaily(a: org.apache.spark.sql.DataFrame,
      windowDays: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("d")
    // new coverage island when the gap from the previous activity
    // day exceeds the window length (prev interval ends at
    // prev + windowDays − 1)
    val isl = a
      .withColumn("brk",
        when(col("d") - lag("d", 1).over(w) > windowDays - 1
          || lag("d", 1).over(w).isNull, 1).otherwise(0))
      .withColumn("isl", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    // iv is tiny (#user-islands) and feeds BOTH the deltas and the
    // calendar-grid bounds — checkpoint it so the corpus distinct +
    // window pipeline runs exactly once
    val iv = isl.groupBy("user_id", "isl")
      .agg(min("d").as("s"), max("d").as("e"))
      .localCheckpoint()
    val deltas = iv
      .select(explode(array(
        struct(col("s").as("d"), lit(1L).as("x")),
        struct((col("e") + windowDays).as("d"), lit(-1L).as("x")))).as("z"))
      .select(col("z.d").as("d"), col("z.x").as("x"))
      .groupBy("d").agg(sum("x").as("net"))
    // calendar grid: tiny (#days) — bounds from the checkpointed islands
    val grid = iv.agg(min("s").as("lo"), max("e").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    grid.join(deltas, Seq("d"), "left")
      .withColumn("users",
        sum(coalesce(col("net"), lit(0L))).over(
          // the one intentionally tiny global window (#days rows)
          Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("d"), col("users"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- trailing 7-day distinct users per day (rolling MAU shape) ----
    // Sliding-window COUNT(DISTINCT) has no algebraic decomposition —
    // the standard rewrite is interval coverage: a user counts on day
    // d iff d lies in one of their merged [activity, activity+6]
    // intervals; merged intervals per user never overlap, so the
    // per-day count is the prefix sum of interval-endpoint ±1 deltas.
    sql(
      "q_sliding_distinct",
      """WITH a AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |g AS (SELECT unnest(generate_series((SELECT min(d) FROM a),
        |                                    (SELECT max(d) FROM a))) AS d)
        |SELECT g.d AS d, count(DISTINCT a.user_id) AS users
        |FROM g LEFT JOIN a ON a.d BETWEEN g.d - 6 AND g.d
        |GROUP BY g.d ORDER BY d""".stripMargin) { (s, dir) =>
      slidingDistinctExact(t(s, dir, "events")).orderBy("d")
    },

    // ---- sketch twin: trailing distinct via mergeable per-day HLLs ----
    // The 100-TB rolling-MAU form: the exact interval rewrite still
    // carries per-user state; the sketch form collapses the corpus to
    // ONE HLL per day (mergeable, partial-agg friendly), then each
    // trailing window is a union of 7 tiny sketches — recomputable for
    // any window length from the same daily sketches, which is why
    // production metric stores materialize exactly this. Oracle gate =
    // the q_approx_distinct pattern: exact counts hash-matched, the
    // sketch estimate value-bounded by an est_ok flag the oracle pins
    // TRUE (3σ of HLL lgK=12 RSE, floored at 5 for tiny counts).
    sql(
      "q_sliding_distinct_approx",
      """WITH a AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |g AS (SELECT unnest(generate_series((SELECT min(d) FROM a),
        |                                    (SELECT max(d) FROM a))) AS d)
        |SELECT g.d AS d, count(DISTINCT a.user_id) AS users, TRUE AS est_ok
        |FROM g LEFT JOIN a ON a.d BETWEEN g.d - 6 AND g.d
        |GROUP BY g.d ORDER BY d""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val daily = ev
        .select(col("user_id"), dayNum(col("ts")).as("d"))
        .groupBy("d").agg(hll_sketch_agg(col("user_id")).as("sk"))
      val est = daily
        .withColumn("td", explode(sequence(col("d"), col("d") + 6)))
        .groupBy("td")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      // LEFT join: a calendar day whose whole trailing window is
      // activity-free has NO daily sketches to union (est row absent)
      // but must still report users=0 — an inner join would silently
      // drop zero days on gapped data (review find, r7)
      slidingDistinctExact(ev)
        .join(est, col("d") === col("td"), "left")
        .select(col("d"), col("users"),
          (abs(coalesce(col("est"), lit(0.0)) - col("users")) <=
            greatest(lit(5.0), lit(3 * 0.0163) * col("users"))).as("est_ok"))
        .orderBy("d")
    },

    // ---- autocorrelation of daily revenue at lags 1..7 ----
    // Weekly seasonality / drift fingerprint of a metric series. The
    // corpus collapses to #days rows first; the per-lag Pearson sums
    // run DECIMAL-exact so both engines agree bit-for-bit.
    sql(
      "q_autocorr",
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |lags AS (SELECT unnest(generate_series(1, 7)) AS k),
        |p AS (SELECT l.k AS k, a.rev AS x, b.rev AS y,
        |             CAST(a.rev AS DECIMAL(19,4)) AS xw,
        |             CAST(b.rev AS DECIMAL(19,4)) AS yw
        |      FROM daily a CROSS JOIN lags l
        |      JOIN daily b ON b.d = a.d + l.k),
        |m AS (SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*yw) AS sxy, sum(x*xw) AS sx2, sum(y*yw) AS sy2
        |      FROM p GROUP BY k)
        |SELECT k, CAST(n AS BIGINT) AS n_pairs,
        |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |            * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        |  THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |              * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  ELSE NULL END AS acf
        |FROM m ORDER BY k""".stripMargin) { (s, dir) =>
      // #days rows, consumed by both the x and the lagged-y branch —
      // checkpoint so the corpus aggregation runs once
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate", "o_totalprice")
      val x = daily
        .withColumn("k", explode(sequence(lit(1L), lit(7L))))
        .select(col("k"), col("d"), col("rev").as("x"))
      val y = daily.select(col("d").as("d2"), col("rev").as("y"))
      // Asymmetric product widths, deliberately: (15,4)×(19,4).
      // DuckDB multiplies in the WIDEST OPERAND's physical type — two
      // (15,4)s run in int64 and overflow at ~1e19 scaled units, so one
      // side must be ≥ DECIMAL(19) to force int128. Spark caps
      // p1+p2+1 at 38 by TRUNCATING scale — two (19,4)s become (38,7)
      // and drop a digit DuckDB keeps. 15+19+1 = 35 ≤ 38 satisfies
      // both engines exactly (the q_js_divergence precision-cap
      // pitfall, NOTES r7).
      val wide = (c: Column) => c.cast("decimal(19,4)")
      val m = x.join(y, col("d2") === col("d") + col("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * wide(col("y"))).as("sxy"),
          sum(col("x") * wide(col("x"))).as("sx2"),
          sum(col("y") * wide(col("y"))).as("sy2"))
      val (n, sx, sy, sxy, sx2, sy2) =
        (col("n").cast("double"), col("sx").cast("double"),
          col("sy").cast("double"), col("sxy").cast("double"),
          col("sx2").cast("double"), col("sy2").cast("double"))
      val den = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
      m.select(col("k"), col("n").as("n_pairs"),
          when(den > 0, round((n * sxy - sx * sy) / sqrt(den), 6))
            .otherwise(lit(null).cast("double")).as("acf"))
        .orderBy("k")
    },

    // ---- Poisson-bootstrap CI of the purchase-value mean ----
    // R=32 replicates in ONE corpus pass: per (row, r) a deterministic
    // md5-uniform feeds the pinned Poisson(1) inverse-CDF ladder; the
    // ×32 generator fan-out collapses map-side (partial aggregation)
    // to 32 (Σw·x, Σw) rows. Weighted sums ride DECIMAL so replicate
    // means are merge-order-exact; the final CI math is scalar double
    // over 32 values.
    sql(
      "q_bootstrap_ci",
      s"""WITH base AS (
         |  SELECT event_id, CAST(value AS DECIMAL(15,4)) AS xd
         |  FROM events WHERE event_type = 'purchase'),
         |tot AS (SELECT count(*) AS n, sum(xd) AS sx FROM base),
         |rep AS (SELECT r, xd, $poissonCaseSql AS w FROM (
         |  SELECT b.xd, r.r AS r,
         |    (('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' ||
         |        CAST(b.event_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
         |      + 0.5) / 1000000.0 AS u
         |  FROM base b CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS r) r) s),
         |means AS (SELECT r, CAST(sum(w) AS BIGINT) AS n_eff,
         |    CAST(sum(CAST(w AS DECIMAL(2,0)) * xd) AS DOUBLE)
         |      / CAST(sum(w) AS BIGINT) AS m
         |  FROM rep GROUP BY r),
         |se AS (SELECT sum(m) AS sm, sum(m*m) AS sm2 FROM means)
         |SELECT r, n_eff, round(m, 6) AS boot_mean,
         |  round(CAST((SELECT sx FROM tot) AS DOUBLE)
         |        / (SELECT n FROM tot), 6) AS point_mean,
         |  round(sqrt(((SELECT sm2 FROM se)
         |              - (SELECT sm FROM se) * (SELECT sm FROM se) / 32.0)
         |             / 31.0), 4) AS se_boot,
         |  round(CAST((SELECT sx FROM tot) AS DOUBLE) / (SELECT n FROM tot)
         |        - 1.96 * sqrt(((SELECT sm2 FROM se)
         |                       - (SELECT sm FROM se) * (SELECT sm FROM se) / 32.0)
         |                      / 31.0), 4) AS lo95,
         |  round(CAST((SELECT sx FROM tot) AS DOUBLE) / (SELECT n FROM tot)
         |        + 1.96 * sqrt(((SELECT sm2 FROM se)
         |                       - (SELECT sm FROM se) * (SELECT sm FROM se) / 32.0)
         |                      / 31.0), 4) AS hi95
         |FROM means ORDER BY r""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("value").cast("decimal(15,4)").as("xd"))
      // 1-row eager totals: ride the final projection (see ksTest)
      val tot = base.agg(count(lit(1)).as("n"), sum("xd").as("sx"))
        .localCheckpoint()
      val rep = base
        .withColumn("r", explode(sequence(lit(0), lit(31))))
        .withColumn("u",
          (h32Salted(col("r"), col("event_id").cast("string")) % 1000000L
            + 0.5) / 1000000.0)
        .withColumn("w", poissonW(col("u")))
      // 32 rows materialized once: the se aggregate AND the final
      // projection both consume them — without the checkpoint the
      // x32-explode corpus aggregation runs twice
      val means = rep.groupBy("r")
        .agg(sum("w").as("n_eff"),
          sum(col("w").cast("decimal(2,0)") * col("xd")).as("swx"))
        .select(col("r").cast("long").as("r"), col("n_eff"),
          (col("swx").cast("double") / col("n_eff")).as("m"))
        .localCheckpoint()
      val se = means.agg(sum("m").as("sm"), sum(col("m") * col("m")).as("sm2"))
      val seBoot = sqrt((col("sm2") - col("sm") * col("sm") / 32.0) / 31.0)
      val pointMean = col("sx").cast("double") / col("n")
      means.crossJoin(broadcast(se)).crossJoin(broadcast(tot))
        .select(col("r"), col("n_eff"), round(col("m"), 6).as("boot_mean"),
          round(pointMean, 6).as("point_mean"),
          round(seBoot, 4).as("se_boot"),
          round(pointMean - lit(1.96) * seBoot, 4).as("lo95"),
          round(pointMean + lit(1.96) * seBoot, 4).as("hi95"))
        .orderBy("r")
    },

    // ---- CUPED variance-reduced A/B readout ----
    // Deng et al. 2013: adjust the experiment metric by a pre-period
    // covariate — Ŷ_cv = Ȳ_v − θ·(X̄_v − X̄), θ = cov(X,Y)/var(X) —
    // cutting metric variance by the pre/post correlation ρ². Shape:
    // the corpus collapses to one row PER USER (x = pre-period spend,
    // y = experiment-period spend, variant = hash split), then
    // everything is moments — per-variant means plus one pooled
    // (Σx, Σy, Σxy, Σx²) row. No per-row adjusted pass exists at all:
    // the adjusted mean is pure algebra over the aggregates. DECIMAL
    // cross-sums with the q_autocorr (15,4)×(19,4) width pairing.
    sql(
      "q_cuped",
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |                  THEN CAST(value AS DECIMAL(15,4))
        |                  ELSE CAST(0 AS DECIMAL(15,4)) END) AS DECIMAL(15,4)) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |                  THEN CAST(value AS DECIMAL(15,4))
        |                  ELSE CAST(0 AS DECIMAL(15,4)) END) AS DECIMAL(15,4)) AS y,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS variant
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |pool AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |                sum(x * CAST(y AS DECIMAL(19,4))) AS sxy,
        |                sum(x * CAST(x AS DECIMAL(19,4))) AS sx2,
        |                sum(y * CAST(y AS DECIMAL(19,4))) AS sy2
        |         FROM u),
        |th AS (SELECT
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / ((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |       * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho2,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
        |  FROM pool)
        |SELECT variant, count(*) AS n,
        |  round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS mean_y,
        |  round(CAST(sum(y) AS DOUBLE) / count(*)
        |        - (SELECT theta FROM th)
        |          * (CAST(sum(x) AS DOUBLE) / count(*)
        |             - (SELECT xbar FROM th)), 6) AS mean_y_cuped,
        |  round((SELECT theta FROM th), 6) AS theta,
        |  round((SELECT rho2 FROM th), 6) AS rho2
        |FROM u GROUP BY variant ORDER BY variant""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      val zero = lit(0).cast("decimal(15,4)")
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
      val u = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(
          sum(when(col("ts") < cut, col("value").cast("decimal(15,4)"))
            .otherwise(zero)).cast("decimal(15,4)").as("x"),
          sum(when(col("ts") >= cut, col("value").cast("decimal(15,4)"))
            .otherwise(zero)).cast("decimal(15,4)").as("y"))
        .withColumn("variant", h32(col("user_id").cast("string")) % 2)
        // #users rows feeding the pooled moments AND the per-variant
        // aggregation — one corpus pass, not two
        .localCheckpoint()
      val wide = (c: Column) => c.cast("decimal(19,4)")
      // 1-row pooled moments: eager so the scalar rides both the theta
      // computation and the final projection without re-aggregating
      val pool = u.agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum("y").as("sy"), sum(col("x") * wide(col("y"))).as("sxy"),
          sum(col("x") * wide(col("x"))).as("sx2"),
          sum(col("y") * wide(col("y"))).as("sy2"))
        .localCheckpoint()
      val (n, sx, sy, sxy, sx2, sy2) =
        (col("n").cast("double"), col("sx").cast("double"),
          col("sy").cast("double"), col("sxy").cast("double"),
          col("sx2").cast("double"), col("sy2").cast("double"))
      val covNum = n * sxy - sx * sy
      val theta = covNum / (n * sx2 - sx * sx)
      val rho2 = covNum * covNum /
        ((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
      val xbar = sx / n
      u.groupBy("variant")
        .agg(count(lit(1)).as("n_v"), sum("x").as("vx"), sum("y").as("vy"))
        .crossJoin(broadcast(pool))
        .select(col("variant"), col("n_v").as("n"),
          round(col("vy").cast("double") / col("n_v"), 6).as("mean_y"),
          round(col("vy").cast("double") / col("n_v")
            - theta * (col("vx").cast("double") / col("n_v") - xbar), 6)
            .as("mean_y_cuped"),
          round(theta, 6).as("theta"),
          round(rho2, 6).as("rho2"))
        .orderBy("variant")
    },

    // ---- sample-ratio-mismatch check ----
    // The first A/B hygiene gate: a 50/50 hash split whose observed
    // counts fail a df=1 chi-squared test means the assignment or
    // logging pipeline is dropping one arm — every downstream readout
    // is invalid. One distinct-user aggregation; the statistic
    // simplifies to (nA−nB)²/(nA+nB), exact integers until one final
    // double division.
    sql(
      "q_srm_check",
      """WITH v AS (SELECT DISTINCT user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS variant
        |  FROM events),
        |c AS (SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |      FROM v)
        |SELECT na, nb,
        |  round(CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb), 6) AS chi2,
        |  CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb) > 3.841 AS srm
        |FROM c""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      t(s, dir, "events")
        .select(col("user_id")).distinct()
        .withColumn("variant", h32(col("user_id").cast("string")) % 2)
        .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("nb"))
        .select(col("na"), col("nb"),
          round(((col("na") - col("nb")) * (col("na") - col("nb")))
            .cast("double") / (col("na") + col("nb")), 6).as("chi2"),
          (((col("na") - col("nb")) * (col("na") - col("nb")))
            .cast("double") / (col("na") + col("nb")) > 3.841).as("srm"))
    },

    // ---- join-key skew audit ----
    // The pre-join hygiene check at scale: per-key fanout quantiles of
    // the fact table's join key. A max/p50 ratio in the hundreds means
    // the plain shuffle join will straggle on one task — the signal to
    // reach for the salted join (q_join_salted) or AQE skew split.
    // Corpus collapses to one row per key in a single partial-agg
    // shuffle; the quantile pass runs on the collapsed frame (exact
    // interpolated percentiles — the q_psi parity).
    sql(
      "q_skew_audit",
      """WITH k AS (SELECT l_orderkey, count(*) AS c
        |          FROM lineitem GROUP BY l_orderkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(sum(c) AS BIGINT) AS n_rows,
        |       CAST(max(c) AS BIGINT) AS max_fan,
        |       round(quantile_cont(c, 0.5), 4) AS p50,
        |       round(quantile_cont(c, 0.9), 4) AS p90,
        |       round(quantile_cont(c, 0.99), 4) AS p99,
        |       round(CAST(max(c) AS DOUBLE) / quantile_cont(c, 0.5), 4) AS skew_ratio
        |FROM k""".stripMargin) { (s, dir) =>
      val k = t(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(count(lit(1)).as("c"))
      k.agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
          max("c").as("max_fan"),
          expr("percentile(c, 0.5)").as("q50"),
          expr("percentile(c, 0.9)").as("q90"),
          expr("percentile(c, 0.99)").as("q99"))
        .select(col("n_keys"), col("n_rows"), col("max_fan"),
          round(col("q50"), 4).as("p50"), round(col("q90"), 4).as("p90"),
          round(col("q99"), 4).as("p99"),
          round(col("max_fan").cast("double") / col("q50"), 4).as("skew_ratio"))
    },

    // ---- calibration curve + expected calibration error ----
    // Reliability diagram for a scored binary outcome: decile bins of
    // the score, per-bin mean score vs observed positive rate, ECE =
    // Σ (n_b/N)·|rate−mean_score|. The score is a deterministic
    // md5-uniform "model" (exact rational (k+0.5)/1000 ⇒ DECIMAL(5,4)
    // sums are order-exact); the label is event_type='purchase'. One
    // corpus aggregation to 10 bins; ECE rides a 1-row broadcast.
    sql(
      "q_calibration",
      """WITH s AS (SELECT
        |    (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 1000
        |     + 0.5) / 1000.0 AS p,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |b AS (SELECT CAST(floor(p * 10) AS BIGINT) AS bin,
        |             CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(CAST(p AS DECIMAL(5,4))) AS DECIMAL(18,4)) AS sp,
        |             CAST(sum(y) AS BIGINT) AS pos
        |      FROM s GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |               sum(CAST(n AS DOUBLE) / (SELECT sum(n) FROM b)
        |                   * abs(CAST(pos AS DOUBLE) / n
        |                         - CAST(sp AS DOUBLE) / n)) AS ece
        |        FROM b)
        |SELECT bin, n, round(CAST(sp AS DOUBLE) / n, 6) AS mean_score,
        |       round(CAST(pos AS DOUBLE) / n, 6) AS pos_rate,
        |       round((SELECT ece FROM tot), 6) AS ece
        |FROM b ORDER BY bin""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      val sc = t(s, dir, "events")
        .select(((h32(col("event_id").cast("string")) % 1000 + 0.5) / 1000.0).as("p"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      // 10 bin rows materialized once — N, ECE, and the final output
      // all derive from this frame; checkpointing the DERIVED scalars
      // instead would re-run the corpus aggregation per consumer
      val b = sc.groupBy(floor(col("p") * 10).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("p").cast("decimal(5,4)")).cast("decimal(18,4)").as("sp"),
          sum("y").as("pos"))
        .localCheckpoint()
      val nn = b.agg(sum("n").as("nn"))
      val tot = b.crossJoin(broadcast(nn))
        .agg(sum(col("n").cast("double") / col("nn")
          * abs(col("pos").cast("double") / col("n")
            - col("sp").cast("double") / col("n"))).as("ece"))
      b.crossJoin(broadcast(tot))
        .select(col("bin"), col("n"),
          round(col("sp").cast("double") / col("n"), 6).as("mean_score"),
          round(col("pos").cast("double") / col("n"), 6).as("pos_rate"),
          round(col("ece"), 6).as("ece"))
        .orderBy("bin")
    },

    // ---- population stability index (binned drift) ----
    // The credit-risk / model-monitoring drift standard, complementing
    // KS (max CDF gap) and JSD (distribution divergence): decile bin
    // edges fitted on the REFERENCE period (exact interpolated
    // percentiles — Spark `percentile` and DuckDB `quantile_cont`
    // share the interpolation formula, the q_rolling_median parity),
    // then PSI = Σ (pc−pr)·ln(pc/pr) over the 10 bins with pinned
    // +0.5/+5 Laplace smoothing so an empty current bin cannot produce
    // ±∞. Two slice aggregations to 10 rows each; the 9-edge bin
    // assignment is a tiny array HOF over a broadcast literal.
    sql(
      "q_psi",
      """WITH ref AS (SELECT value FROM events
        |            WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |cur AS (SELECT value FROM events
        |        WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |e AS (SELECT quantile_cont(value,
        |        [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges FROM ref),
        |rb AS (SELECT len(list_filter((SELECT edges FROM e), x -> value >= x)) AS bin,
        |              count(*) AS c FROM ref GROUP BY 1),
        |cb AS (SELECT len(list_filter((SELECT edges FROM e), x -> value >= x)) AS bin,
        |              count(*) AS c FROM cur GROUP BY 1),
        |g AS (SELECT unnest(generate_series(0, 9)) AS bin),
        |j AS (SELECT g.bin AS bin,
        |             CAST(coalesce(rb.c, 0) AS BIGINT) AS ref_n,
        |             CAST(coalesce(cb.c, 0) AS BIGINT) AS cur_n,
        |             CAST((SELECT sum(c) FROM rb) AS BIGINT) AS rn,
        |             CAST((SELECT sum(c) FROM cb) AS BIGINT) AS cn
        |      FROM g LEFT JOIN rb ON rb.bin = g.bin
        |             LEFT JOIN cb ON cb.bin = g.bin),
        |terms AS (SELECT bin, ref_n, cur_n,
        |    ((cur_n + 0.5) / (cn + 5.0) - (ref_n + 0.5) / (rn + 5.0))
        |    * ln(((cur_n + 0.5) / (cn + 5.0)) / ((ref_n + 0.5) / (rn + 5.0))) AS term
        |  FROM j)
        |SELECT bin, ref_n, cur_n, round(term, 6) AS psi_term,
        |       round((SELECT sum(term) FROM terms), 6) AS psi
        |FROM terms ORDER BY bin""".stripMargin) { (s, dir) =>
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
      val ev = t(s, dir, "events")
      val ref = ev.where(col("ts") < cut).select("value")
      val cur = ev.where(col("ts") >= cut).select("value")
      // 9 interpolated decile edges of the reference — 1-row broadcast
      val edges = ref.agg(expr(
        "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("edges")).localCheckpoint()
      def binned(df: org.apache.spark.sql.DataFrame, out: String) =
        df.crossJoin(broadcast(edges))
          .select(size(filter(col("edges"),
            x => col("value") >= x)).cast("long").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as(out))
      val rb = binned(ref, "ref_n")
      val cb = binned(cur, "cur_n")
      val g = edges.select(explode(sequence(lit(0L), lit(9L))).as("bin"))
      // 10 grid rows materialized once — totals, the PSI sum, and the
      // final select all read them; without this, each slice scan
      // would re-run per consumer
      val j = g.join(rb, Seq("bin"), "left").join(cb, Seq("bin"), "left")
        .select(col("bin"),
          coalesce(col("ref_n"), lit(0L)).as("ref_n"),
          coalesce(col("cur_n"), lit(0L)).as("cur_n"))
        .localCheckpoint()
      val tots = j.agg(sum("ref_n").as("rn"), sum("cur_n").as("cn"))
      val pr = (col("ref_n") + 0.5) / (col("rn") + 5.0)
      val pc = (col("cur_n") + 0.5) / (col("cn") + 5.0)
      val terms = j.crossJoin(broadcast(tots))
        .select(col("bin"), col("ref_n"), col("cur_n"),
          ((pc - pr) * log(pc / pr)).as("term"))
      val psi = terms.agg(sum("term").as("psi"))
      terms.crossJoin(broadcast(psi))
        .select(col("bin"), col("ref_n"), col("cur_n"),
          round(col("term"), 6).as("psi_term"), round(col("psi"), 6).as("psi"))
        .orderBy("bin")
    },

    // ---- Lorenz curve deciles + Gini coefficient ----
    // Concentration audit (revenue here; token-count concentration
    // over documents is the same query): how unequal is the corpus?
    // Needs a GLOBAL rank over order value — the GlobalPrefix
    // two-pass (sampled-boundary buckets, no materialization), never
    // a one-task window. Gini from the closed form
    // G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) with i·xᵢ in exact DECIMAL
    // — BIGINT rank cast to DECIMAL(19,0) so DuckDB multiplies in
    // int128 while Spark's 19+15+1 = 35 ≤ 38 keeps the scale intact
    // (the q_autocorr width pairing).
    sql(
      "q_lorenz_gini",
      """WITH o AS (SELECT o_orderkey,
        |                  CAST(o_totalprice AS DECIMAL(15,4)) AS x FROM orders),
        |r AS (SELECT x,
        |             CAST(row_number() OVER (ORDER BY x, o_orderkey) AS DECIMAL(19,0)) AS i
        |      FROM o),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |             sum(i * x) AS six FROM r),
        |d AS (SELECT CAST(floor((CAST(i AS DOUBLE) - 1) * 10
        |                        / (SELECT n FROM t)) AS BIGINT) AS decile,
        |             CAST(count(*) AS BIGINT) AS n_d, sum(x) AS rev
        |      FROM r GROUP BY 1)
        |SELECT decile, n_d,
        |       round(CAST(rev AS DOUBLE) / (SELECT CAST(sx AS DOUBLE) FROM t), 6)
        |         AS rev_share,
        |       round((2.0 * (SELECT CAST(six AS DOUBLE) FROM t)
        |              - ((SELECT n FROM t) + 1.0)
        |                * (SELECT CAST(sx AS DOUBLE) FROM t))
        |             / (CAST((SELECT n FROM t) AS DOUBLE)
        |                * (SELECT CAST(sx AS DOUBLE) FROM t)), 6) AS gini
        |FROM d ORDER BY decile""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").cast("decimal(15,4)").as("x"))
      val ranked = GlobalPrefix.runningTotal(
        o, Seq(col("x"), col("o_orderkey")), lit(1L), "rk")
      val r = ranked.select(col("x"), col("rk").cast("decimal(19,0)").as("i"))
      val tot = r.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("i") * col("x")).as("six")).localCheckpoint()
      val d = r.crossJoin(broadcast(tot))
        .groupBy(floor((col("i").cast("double") - 1) * 10 / col("n"))
          .cast("long").as("decile"))
        .agg(count(lit(1)).as("n_d"), sum("x").as("rev"))
      val gini = (lit(2.0) * col("six").cast("double")
        - (col("n") + lit(1.0)) * col("sx").cast("double")) /
        (col("n").cast("double") * col("sx").cast("double"))
      d.crossJoin(broadcast(tot))
        .select(col("decile"), col("n_d"),
          round(col("rev").cast("double") / col("sx").cast("double"), 6)
            .as("rev_share"),
          round(gini, 6).as("gini"))
        .orderBy("decile")
    },

    // ---- Pareto 80/20 concentration readout ----
    // The scalar companions of q_lorenz_gini's curve: what fraction of
    // users carries 80% of purchase revenue, and what share the top 1%
    // takes. One corpus collapse to per-user revenue, then TWO bounded
    // GlobalPrefix passes over the same (x, user) order (rank and
    // cumulative revenue — the sampled-boundary core, no one-task
    // window); the 80% line is the integer-scaled exact compare
    // 5·cum > total, so no fractional threshold ever rounds. "Top
    // set" = users strictly above the 20% cumulative-from-bottom
    // line (boundary user excluded — deterministic, mirrored).
    sql(
      "q_pareto_8020",
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |r AS (SELECT user_id, x,
        |        CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS rk,
        |        sum(x) OVER (ORDER BY x, user_id) AS cumx
        |      FROM u),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS DECIMAL(38,4)) AS sx FROM u),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN 5 * cumx > (SELECT sx FROM t)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_top80,
        |    CAST(sum(CASE WHEN rk > (SELECT n FROM t)
        |                           - CAST(ceil(CAST((SELECT n FROM t) AS DOUBLE)
        |                                       / 100) AS BIGINT)
        |             THEN x ELSE CAST(0 AS DECIMAL(15,4)) END)
        |         AS DECIMAL(38,4)) AS top1_rev
        |  FROM r)
        |SELECT (SELECT n FROM t) AS n_users,
        |  CAST((SELECT sx FROM t) AS DOUBLE) AS total_rev,
        |  n_top80,
        |  round(CAST(n_top80 AS DOUBLE) / (SELECT n FROM t), 6) AS frac_users_80,
        |  round(CAST(top1_rev AS DOUBLE)
        |        / CAST((SELECT sx FROM t) AS DOUBLE), 6) AS top1pct_share
        |FROM m""".stripMargin) { (s, dir) =>
      val u = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(15,4)").as("x"))
      val keys = Seq(col("x"), col("user_id"))
      val r = GlobalPrefix.runningTotal(
        GlobalPrefix.runningTotal(u, keys, lit(1L), "rk"),
        keys, col("x"), "cumx")
        .localCheckpoint() // #users rows: feeds totals + both metrics
      val tot = r.agg(count(lit(1)).as("n"),
        sum("x").cast("decimal(38,4)").as("sx")).localCheckpoint()
      val m = r.crossJoin(broadcast(tot))
        .agg(
          sum(when(col("cumx") * 5 > col("sx"), 1L).otherwise(0L)).as("n_top80"),
          sum(when(col("rk") > col("n")
            - ceil(col("n").cast("double") / 100).cast("long"), col("x"))
            .otherwise(lit(0).cast("decimal(15,4)")))
            .cast("decimal(38,4)").as("top1_rev"))
      m.crossJoin(broadcast(tot))
        .select(col("n").as("n_users"),
          col("sx").cast("double").as("total_rev"),
          col("n_top80"),
          round(col("n_top80").cast("double") / col("n"), 6).as("frac_users_80"),
          round(col("top1_rev").cast("double") / col("sx").cast("double"), 6)
            .as("top1pct_share"))
    },

    // ---- decision-stump split finder (Gini impurity scan) ----
    // One level of a decision tree, trained relationally: bin the
    // feature (fixed-width, capped), scan every bin edge as a split,
    // and score each by weighted Gini impurity of the two sides — the
    // feature-screening / single-rule-baseline primitive. The corpus
    // collapses to 20 bin rows in ONE aggregation; the cumulative scan
    // and impurity math run entirely on that frame; the best split is
    // flagged against the broadcast minimum of the ROUNDED score so a
    // last-ulp double cannot move the flag. Splits leaving an empty
    // side drop on both engines.
    sql(
      "q_stump_split",
      """WITH s AS (SELECT least(CAST(floor(value / 20) AS BIGINT), 19) AS b,
        |                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |           FROM events),
        |g AS (SELECT b, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
        |      FROM s GROUP BY b),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |             CAST(sum(pos) AS BIGINT) AS pp FROM g),
        |c AS (SELECT b, CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS nl,
        |             CAST(sum(pos) OVER (ORDER BY b) AS BIGINT) AS pl
        |      FROM g),
        |sp AS (SELECT b, nl, pl,
        |         (SELECT nn FROM t) - nl AS nr, (SELECT pp FROM t) - pl AS pr
        |       FROM c WHERE nl > 0 AND (SELECT nn FROM t) - nl > 0),
        |sc AS (SELECT b, nl, pl,
        |         CAST(nl AS DOUBLE) / (SELECT nn FROM t)
        |           * (1 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
        |              - (CAST(nl - pl AS DOUBLE) / nl)
        |                * (CAST(nl - pl AS DOUBLE) / nl))
        |         + CAST(nr AS DOUBLE) / (SELECT nn FROM t)
        |           * (1 - (CAST(pr AS DOUBLE) / nr) * (CAST(pr AS DOUBLE) / nr)
        |              - (CAST(nr - pr AS DOUBLE) / nr)
        |                * (CAST(nr - pr AS DOUBLE) / nr)) AS gini
        |       FROM sp),
        |mn AS (SELECT min(round(gini, 6)) AS mg FROM sc)
        |SELECT CAST((b + 1) * 20 AS DOUBLE) AS split_at, nl, pl,
        |       round(gini, 6) AS gini_split,
        |       round(gini, 6) = (SELECT mg FROM mn) AS is_best
        |FROM sc ORDER BY split_at""".stripMargin) { (s, dir) =>
      val sc0 = t(s, dir, "events")
        .select(least(floor(col("value") / 20).cast("long"), lit(19L)).as("b"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      val g = sc0.groupBy("b")
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
        .localCheckpoint() // 20 rows: totals + cumulative scan
      val tot = g.agg(sum("n").as("nn"), sum("pos").as("pp"))
      // the one intentionally tiny global window (≤ 20 rows)
      val wCum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
      val c = g.select(col("b"),
        sum("n").over(wCum).as("nl"), sum("pos").over(wCum).as("pl"))
      val sp = c.crossJoin(broadcast(tot))
        .where(col("nl") > 0 && col("nn") - col("nl") > 0)
        .withColumn("nr", col("nn") - col("nl"))
        .withColumn("pr", col("pp") - col("pl"))
      def gini(p: Column, q: Column) =
        lit(1) - (p.cast("double") / q) * (p.cast("double") / q) -
          ((q - p).cast("double") / q) * ((q - p).cast("double") / q)
      val scored = sp.withColumn("gini",
        col("nl").cast("double") / col("nn") * gini(col("pl"), col("nl"))
          + col("nr").cast("double") / col("nn") * gini(col("pr"), col("nr")))
        .localCheckpoint() // ≤ 19 rows: min + output
      val mn = scored.agg(min(round(col("gini"), 6)).as("mg"))
      scored.crossJoin(broadcast(mn))
        .select(((col("b") + 1) * 20).cast("double").as("split_at"),
          col("nl"), col("pl"),
          round(col("gini"), 6).as("gini_split"),
          (round(col("gini"), 6) === col("mg")).as("is_best"))
        .orderBy("split_at")
    },

    // ---- information-gain feature ranking (entropy screening) ----
    // The mutual-information complement to q_stump_split's Gini scan:
    // rank candidate features by IG = H(y) − H(y|feature) against the
    // purchase label — the feature-selection pass a training pipeline
    // runs before fitting anything. Three bucketed features melt into
    // one (feature, bucket, y) stream via a 3-element explode, so the
    // whole screen is ONE corpus-proportional hash aggregation down to
    // ≤ 3×24 bucket rows; every entropy term is computed on that tiny
    // frame from exact integer counts, and per-feature bucket terms
    // accumulate as DECIMAL(38,12) (combiner-order-free — the KN/
    // perplexity convention) before the final rounding. H(y) rides a
    // 1-row broadcast. Empty/pure buckets contribute exactly 0 on both
    // engines via the CASE guard.
    sql(
      "q_info_gain",
      """WITH e AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
        |             least(CAST(floor(value / 50) AS BIGINT), 9) AS vbin,
        |             CAST(hour(ts) AS BIGINT) AS hr,
        |             user_id % 10 AS ub
        |           FROM events),
        |m AS (SELECT 'value_bin' AS feature, vbin AS v, y FROM e
        |      UNION ALL SELECT 'hour', hr, y FROM e
        |      UNION ALL SELECT 'user_bucket', ub, y FROM e),
        |g AS (SELECT feature, v, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(y) AS BIGINT) AS pos
        |      FROM m GROUP BY 1, 2),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(y) AS BIGINT) AS pp
        |      FROM e),
        |ce AS (SELECT feature, CAST(count(*) AS BIGINT) AS n_buckets,
        |         CAST(sum(CAST((CAST(n AS DOUBLE) / (SELECT nn FROM t)) *
        |           (CASE WHEN pos = 0 OR pos = n THEN 0e0
        |                 ELSE -(CAST(pos AS DOUBLE) / n) * log2(CAST(pos AS DOUBLE) / n)
        |                      - (CAST(n - pos AS DOUBLE) / n) * log2(CAST(n - pos AS DOUBLE) / n)
        |            END) AS DECIMAL(38,12))) AS DOUBLE) AS hcond
        |       FROM g GROUP BY 1),
        |hy AS (SELECT CASE WHEN pp = 0 OR pp = nn THEN 0e0
        |              ELSE -(CAST(pp AS DOUBLE) / nn) * log2(CAST(pp AS DOUBLE) / nn)
        |                   - (CAST(nn - pp AS DOUBLE) / nn) * log2(CAST(nn - pp AS DOUBLE) / nn)
        |              END AS h FROM t)
        |SELECT feature, n_buckets,
        |       round((SELECT h FROM hy) - hcond, 6) AS info_gain,
        |       CAST(row_number() OVER (ORDER BY round((SELECT h FROM hy) - hcond, 6) DESC,
        |                               feature) AS BIGINT) AS rank
        |FROM ce ORDER BY feature""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
          least(floor(col("value") / 50).cast("long"), lit(9L)).as("vbin"),
          hour(col("ts")).cast("long").as("hr"),
          (col("user_id") % 10).as("ub"))
      val m = e.select(col("y"),
          explode(array(
            struct(lit("value_bin").as("feature"), col("vbin").as("v")),
            struct(lit("hour").as("feature"), col("hr").as("v")),
            struct(lit("user_bucket").as("feature"), col("ub").as("v")))).as("f"))
        .select(col("f.feature").as("feature"), col("f.v").as("v"), col("y"))
      val g = m.groupBy("feature", "v")
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      val tot = e.agg(count(lit(1)).as("nn"), sum("y").as("pp"))
      def h2(p: Column, q: Column) = // binary entropy of p/q, guarded
        when(p === 0 || p === q, lit(0.0))
          .otherwise(-(p.cast("double") / q) * log2(p.cast("double") / q)
            - ((q - p).cast("double") / q) * log2((q - p).cast("double") / q))
      val ce = g.crossJoin(broadcast(tot))
        .groupBy("feature")
        .agg(count(lit(1)).as("n_buckets"),
          sum(((col("n").cast("double") / col("nn")) * h2(col("pos"), col("n")))
            .cast("decimal(38,12)")).cast("double").as("hcond"),
          first(col("nn")).as("nn"), first(col("pp")).as("pp"))
      val scored = ce
        .select(col("feature"), col("n_buckets"),
          round(h2(col("pp"), col("nn")) - col("hcond"), 6).as("info_gain"))
      // ≤ 3 rows: the rank window is intentionally tiny
      val w = Window.orderBy(col("info_gain").desc, col("feature"))
      scored.select(col("feature"), col("n_buckets"), col("info_gain"),
          row_number().over(w).cast("long").as("rank"))
        .orderBy("feature")
    },

    // ---- Kendall's τ-b between two daily series (concordance) ----
    // The rank-concordance complement to q_spearman_by_type and the
    // two-series sibling of q_mann_kendall's trend-vs-time S: τ-b
    // between daily revenue and daily event count, tie-corrected —
    // (C − D)/√((n₀−T₁)(n₀−T₂)). The corpus collapses to the #days
    // frame in ONE pass (revenue as an exact DECIMAL sum, so tie
    // comparisons are exact, not float-fuzzy); all pair work runs on
    // the calendar-bounded broadcast self-join (≤ days²/2 pairs —
    // the q_mann_kendall convention, bounded by calendar, not
    // corpus); C/D/tie counts are exact integers, the only doubles
    // are the final closed form.
    sql(
      "q_kendall_tau",
      """WITH d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |             sum(CAST(value AS DECIMAL(18,6))) AS rev,
        |             CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1),
        |p AS (SELECT CASE WHEN (a.rev < b.rev AND a.cnt < b.cnt)
        |               OR (a.rev > b.rev AND a.cnt > b.cnt) THEN 1 ELSE 0 END AS c,
        |             CASE WHEN (a.rev < b.rev AND a.cnt > b.cnt)
        |               OR (a.rev > b.rev AND a.cnt < b.cnt) THEN 1 ELSE 0 END AS dd,
        |             CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END AS tx,
        |             CASE WHEN a.cnt = b.cnt THEN 1 ELSE 0 END AS ty
        |      FROM d a JOIN d b ON a.day < b.day),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |             CAST(sum(c) AS BIGINT) AS conc,
        |             CAST(sum(dd) AS BIGINT) AS disc,
        |             CAST(sum(tx) AS BIGINT) AS t1,
        |             CAST(sum(ty) AS BIGINT) AS t2
        |      FROM p)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
        |       n0 AS n_pairs, conc AS concordant, disc AS discordant,
        |       round((conc - disc) / (sqrt(CAST(n0 - t1 AS DOUBLE))
        |         * sqrt(CAST(n0 - t2 AS DOUBLE))), 6) AS tau_b
        |FROM m""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("rev"),
          count(lit(1)).as("cnt"))
        .localCheckpoint() // #days rows: feeds the pair join AND n_days
      val a = d.select(col("day").as("da"), col("rev").as("ra"), col("cnt").as("ca"))
      val b = d.select(col("day").as("db"), col("rev").as("rb"), col("cnt").as("cb"))
      val p = a.join(broadcast(b), col("da") < col("db"))
        .select(
          when((col("ra") < col("rb") && col("ca") < col("cb"))
            || (col("ra") > col("rb") && col("ca") > col("cb")), 1L)
            .otherwise(0L).as("c"),
          when((col("ra") < col("rb") && col("ca") > col("cb"))
            || (col("ra") > col("rb") && col("ca") < col("cb")), 1L)
            .otherwise(0L).as("dd"),
          when(col("ra") === col("rb"), 1L).otherwise(0L).as("tx"),
          when(col("ca") === col("cb"), 1L).otherwise(0L).as("ty"))
      val m = p.agg(count(lit(1)).as("n0"), sum("c").as("conc"),
        sum("dd").as("disc"), sum("tx").as("t1"), sum("ty").as("t2"))
      val nd = d.agg(count(lit(1)).as("n_days"))
      m.crossJoin(broadcast(nd))
        .select(col("n_days"), col("n0").as("n_pairs"),
          col("conc").as("concordant"), col("disc").as("discordant"),
          round((col("conc") - col("disc"))
            / (sqrt((col("n0") - col("t1")).cast("double"))
              * sqrt((col("n0") - col("t2")).cast("double"))), 6).as("tau_b"))
    },

    // ---- CUSUM changepoint detection over daily revenue ----
    // Page's CUSUM: S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k)), mirrored
    // for S⁻, alarm when either exceeds h = 4σ (k = σ/2, the standard
    // tuning). The max(0,·) recurrence is NOT a plain running sum, but
    // it unrolls exactly: S⁺_t = C_t − min(0, min_{j≤t} C_j) with
    // C = cumsum(x − μ − k) — two ordered windows over the collapsed
    // #days frame, no sequential fold. Running doubles accumulate in
    // frame order (ORDER BY-defined) so both engines walk the same
    // sequence; μ/σ come from DECIMAL moments (merge-order-exact).
    sql(
      "q_changepoint_cusum",
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rev) AS sx,
        |             sum(rev * CAST(rev AS DECIMAL(19,4))) AS sx2 FROM daily),
        |s AS (SELECT CAST(sx AS DOUBLE) / n AS mu,
        |             sqrt((n * CAST(sx2 AS DOUBLE)
        |                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |                  / (CAST(n AS DOUBLE) * (n - 1))) AS sigma FROM m),
        |c AS (SELECT d, CAST(rev AS DOUBLE) AS x,
        |        sum(CAST(rev AS DOUBLE) - (SELECT mu FROM s)
        |            - 0.5 * (SELECT sigma FROM s))
        |          OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cp,
        |        sum((SELECT mu FROM s) - 0.5 * (SELECT sigma FROM s)
        |            - CAST(rev AS DOUBLE))
        |          OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cm
        |      FROM daily),
        |r AS (SELECT d, x,
        |        cp - least(0, min(cp) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)) AS sp,
        |        cm - least(0, min(cm) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)) AS sm
        |      FROM c)
        |SELECT d, round(x, 2) AS rev, round(sp, 6) AS cusum_pos,
        |       round(sm, 6) AS cusum_neg,
        |       sp > 4 * (SELECT sigma FROM s)
        |         OR sm > 4 * (SELECT sigma FROM s) AS alarm
        |FROM r ORDER BY d""".stripMargin) { (s, dir) =>
      // corpus → #days rows once; the moments AND the window pass both
      // read this frame
      val daily = dailyDecimal(t(s, dir, "events"), "ts", "value")
      val wide = col("rev") * col("rev").cast("decimal(19,4)")
      val m = daily.agg(count(lit(1)).as("n"), sum("rev").as("sx"),
          sum(wide).as("sx2"))
        .select(
          (col("sx").cast("double") / col("n")).as("mu"),
          sqrt((col("n") * col("sx2").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            / (col("n").cast("double") * (col("n") - 1))).as("sigma"))
        .localCheckpoint()
      // the one intentionally tiny global window (#days rows)
      val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
      val x = col("rev").cast("double")
      val c = daily.crossJoin(broadcast(m))
        .withColumn("cp", sum(x - col("mu") - lit(0.5) * col("sigma")).over(w))
        .withColumn("cm", sum(col("mu") - lit(0.5) * col("sigma") - x).over(w))
        .withColumn("sp", col("cp") - least(lit(0), min("cp").over(w)))
        .withColumn("sm", col("cm") - least(lit(0), min("cm").over(w)))
      c.select(col("d"), round(x, 2).as("rev"),
          round(col("sp"), 6).as("cusum_pos"),
          round(col("sm"), 6).as("cusum_neg"),
          (col("sp") > lit(4) * col("sigma")
            || col("sm") > lit(4) * col("sigma")).as("alarm"))
        .orderBy("d")
    },

    // ---- Mann-Kendall trend test on daily revenue ----
    // The nonparametric monotone-trend standard: S = Σ_{i<j}
    // sign(x_j − x_i), Var(S) with the tie correction, z with the
    // ±1 continuity correction. The corpus collapses FIRST to the
    // calendar-bounded #days frame (~2.4k rows at any corpus size), so
    // the O(D²) pair join is bounded by the calendar, not the data —
    // 2.9M sign evaluations over a broadcast side, independent of
    // corpus rows. (A multi-decade calendar would switch to the
    // O(D log D) inversion-count form; at D ≤ 10⁴ the pair join is
    // cheaper than its shuffle.) Exact integers until Var's /18.
    sql(
      "q_mann_kendall",
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |p AS (SELECT CAST(sum(CASE WHEN b.rev > a.rev THEN 1
        |                           WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s
        |      FROM daily a JOIN daily b ON b.d > a.d),
        |ties AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tt
        |         FROM (SELECT CAST(count(*) AS BIGINT) AS t
        |               FROM daily GROUP BY rev HAVING count(*) > 1) z),
        |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |v AS (SELECT (n * (n - 1) * (2 * n + 5) - (SELECT tt FROM ties)) / 18.0 AS var_s
        |      FROM n0),
        |zz AS (SELECT CASE WHEN (SELECT s FROM p) > 0
        |                   THEN ((SELECT s FROM p) - 1) / sqrt((SELECT var_s FROM v))
        |                   WHEN (SELECT s FROM p) < 0
        |                   THEN ((SELECT s FROM p) + 1) / sqrt((SELECT var_s FROM v))
        |                   ELSE 0.0 END AS z)
        |SELECT (SELECT n FROM n0) AS n_days, (SELECT s FROM p) AS s,
        |       round((SELECT var_s FROM v), 4) AS var_s,
        |       round((SELECT z FROM zz), 6) AS z,
        |       CASE WHEN (SELECT z FROM zz) > 1.959964 THEN 'increasing'
        |            WHEN (SELECT z FROM zz) < -1.959964 THEN 'decreasing'
        |            ELSE 'no_trend' END AS trend""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate", "o_totalprice")
      val b = daily.select(col("d").as("d2"), col("rev").as("rev2"))
      // calendar-bounded pair join: the broadcast side is #days rows
      val p = daily.join(broadcast(b), col("d2") > col("d"))
        .agg(sum(when(col("rev2") > col("rev"), 1L)
          .when(col("rev2") < col("rev"), -1L)
          .otherwise(0L)).as("s"))
      val ties = daily.groupBy("rev").agg(count(lit(1)).as("tc"))
        .where(col("tc") > 1)
        .agg(coalesce(
          sum(col("tc") * (col("tc") - 1) * (lit(2) * col("tc") + 5)),
          lit(0L)).as("tt"))
      val n0 = daily.agg(count(lit(1)).as("n"))
      val joined = p.crossJoin(broadcast(ties)).crossJoin(broadcast(n0))
        .withColumn("var_s",
          (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tt"))
            / lit(18.0))
        .withColumn("z",
          when(col("s") > 0, (col("s") - 1) / sqrt(col("var_s")))
            .when(col("s") < 0, (col("s") + 1) / sqrt(col("var_s")))
            .otherwise(lit(0.0)))
      joined.select(col("n").as("n_days"), col("s"),
        round(col("var_s"), 4).as("var_s"), round(col("z"), 6).as("z"),
        when(col("z") > 1.959964, "increasing")
          .when(col("z") < -1.959964, "decreasing")
          .otherwise("no_trend").as("trend"))
    },

    // ---- additive seasonal decomposition (day-of-week) ----
    // The monitoring-series split: trend = 7-day centered moving
    // average, seasonal = day-of-week mean minus grand mean, residual
    // = observed − trend − seasonal (the anomaly input — a residual
    // spike is a real deviation, not a weekend effect). Every
    // component derives from exact DECIMAL sums divided once into
    // doubles, so per-row outputs are bit-identical cross-engine. DOW
    // comes from day-number arithmetic ((d+3) mod 7, 0 = Monday) —
    // no engine dayofweek() convention involved.
    sql(
      "q_seasonal_dow",
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM events GROUP BY 1),
        |tr AS (SELECT d, rev, (d + 3) % 7 AS dow,
        |         CAST(sum(rev) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
        |                             AND 3 FOLLOWING) AS DOUBLE)
        |           / count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
        |                            AND 3 FOLLOWING) AS trend
        |       FROM daily),
        |g AS (SELECT CAST(sum(rev) AS DOUBLE) / count(*) AS gmean FROM daily),
        |dm AS (SELECT (d + 3) % 7 AS dow,
        |              CAST(sum(rev) AS DOUBLE) / count(*) AS dmean
        |       FROM daily GROUP BY 1)
        |SELECT t.d AS d, t.dow AS dow, round(CAST(t.rev AS DOUBLE), 2) AS rev,
        |       round(t.trend, 6) AS trend,
        |       round(dm.dmean - (SELECT gmean FROM g), 6) AS seasonal,
        |       round(CAST(t.rev AS DOUBLE) - t.trend
        |             - (dm.dmean - (SELECT gmean FROM g)), 6) AS resid
        |FROM tr t JOIN dm ON dm.dow = t.dow ORDER BY d""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "events"), "ts", "value")
      // the one intentionally tiny global window (#days rows)
      val w = Window.orderBy("d").rowsBetween(-3, 3)
      val tr = daily
        .withColumn("dow", (col("d") + 3) % 7)
        .withColumn("trend",
          sum("rev").over(w).cast("double") / count(lit(1)).over(w))
      val g = daily.agg(
        (sum("rev").cast("double") / count(lit(1))).as("gmean"))
      val dm = daily.groupBy(((col("d") + 3) % 7).as("dow"))
        .agg((sum("rev").cast("double") / count(lit(1))).as("dmean"))
      tr.join(dm, Seq("dow")).crossJoin(broadcast(g))
        .select(col("d"), col("dow"),
          round(col("rev").cast("double"), 2).as("rev"),
          round(col("trend"), 6).as("trend"),
          round(col("dmean") - col("gmean"), 6).as("seasonal"),
          round(col("rev").cast("double") - col("trend")
            - (col("dmean") - col("gmean")), 6).as("resid"))
        .orderBy("d")
    },

    // ---- concurrent open intervals (sweep line) ----
    // How many orders are open on each calendar day (open =
    // [orderdate, orderdate + priority-dependent fulfilment window))
    // — the capacity-planning shape. The naive form range-joins every
    // interval against the calendar grid (O(intervals·span)); the
    // sweep-line rewrite emits one +1 at start / −1 at end per
    // interval, collapses to per-day nets in ONE corpus shuffle, and
    // prefix-sums the calendar-bounded grid. Peak days come from a
    // 1-row broadcast max.
    sql(
      "q_open_intervals",
      """WITH o AS (SELECT date_diff('day', DATE '1970-01-01',
        |                            CAST(o_orderdate AS DATE)) AS d0,
        |                  CASE WHEN o_orderpriority = '1-URGENT' THEN 7
        |                       WHEN o_orderpriority = '2-HIGH' THEN 14
        |                       ELSE 21 END AS dur
        |           FROM orders),
        |dd AS (SELECT d, sum(x) AS net FROM (
        |         SELECT d0 AS d, 1 AS x FROM o
        |         UNION ALL SELECT d0 + dur AS d, -1 AS x FROM o) u
        |       GROUP BY d),
        |g AS (SELECT unnest(generate_series((SELECT min(d) FROM dd),
        |                                    (SELECT max(d) FROM dd))) AS d),
        |r AS (SELECT g.d AS d,
        |        CAST(sum(coalesce(dd.net, 0))
        |             OVER (ORDER BY g.d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_n
        |      FROM g LEFT JOIN dd ON dd.d = g.d),
        |mx AS (SELECT max(open_n) AS mo FROM r)
        |SELECT d, open_n, open_n = (SELECT mo FROM mx) AS is_peak
        |FROM r ORDER BY d""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
        .select(dayNum(col("o_orderdate")).as("d0"),
          when(col("o_orderpriority") === "1-URGENT", 7L)
            .when(col("o_orderpriority") === "2-HIGH", 14L)
            .otherwise(21L).as("dur"))
      // ±1 endpoint deltas → per-day nets: the one corpus shuffle;
      // calendar-bounded (~#days rows) from here on
      val dd = o
        .select(explode(array(
          struct(col("d0").as("d"), lit(1L).as("x")),
          struct((col("d0") + col("dur")).as("d"), lit(-1L).as("x")))).as("z"))
        .select(col("z.d").as("d"), col("z.x").as("x"))
        .groupBy("d").agg(sum("x").as("net"))
        .localCheckpoint()
      val grid = dd.agg(min("d").as("lo"), max("d").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      // the one intentionally tiny global window (#days rows)
      val r = grid.join(dd, Seq("d"), "left")
        .withColumn("open_n",
          sum(coalesce(col("net"), lit(0L))).over(
            Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("d"), col("open_n"))
        .localCheckpoint()
      val mx = r.agg(max("open_n").as("mo"))
      r.crossJoin(broadcast(mx))
        .select(col("d"), col("open_n"), (col("open_n") === col("mo")).as("is_peak"))
        .orderBy("d")
    },

    // ---- inter-arrival time distribution ----
    // The empirical basis for choosing a sessionization gap: per-user
    // gaps between consecutive events, summarized as mean + exact
    // interpolated percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`, the q_rolling_median parity). One keyed window
    // over the per-user exchange; gap seconds are exact-integer µs
    // diffs divided once; the mean accumulates in DECIMAL.
    sql(
      "q_interarrival",
      """WITH g AS (SELECT user_id, epoch_us(ts) AS us,
        |             lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                     ORDER BY ts, event_id) AS pus
        |           FROM events),
        |d AS (SELECT (us - pus) / 1000000.0 AS gap_s FROM g WHERE pus IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_gaps,
        |  round(CAST(sum(CAST(gap_s AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4)
        |    AS mean_s,
        |  round(quantile_cont(gap_s, 0.5), 4) AS p50_s,
        |  round(quantile_cont(gap_s, 0.9), 4) AS p90_s,
        |  round(quantile_cont(gap_s, 0.99), 4) AS p99_s
        |FROM d""".stripMargin) { (s, dir) =>
      // ordering by us ≡ by ts (unix_micros is monotone), same tiebreak
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      // checkpoint the gap set: the quantile core and the mean agg
      // together read it three times
      val d = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("pus", lag("us", 1).over(w))
        .where(col("pus").isNotNull)
        .select(((col("us") - col("pus")) / 1000000.0).as("gap_s"))
        .localCheckpoint()
      // exact interpolated percentiles via the sketch-guided selection
      // core — a plain exact percentile() buffers the corpus-sized gap
      // set (one row per event) in ONE task (review find, r7)
      val qn = ExactQuantiles(d, "gap_s", Seq(0.5, 0.9, 0.99),
        Seq("q50", "q90", "q99"))
      d.agg(count(lit(1)).as("n_gaps"),
          sum(col("gap_s").cast("decimal(18,6)")).as("sdec"))
        .crossJoin(broadcast(qn))
        .select(col("n_gaps"),
          round(col("sdec").cast("double") / col("n_gaps"), 4).as("mean_s"),
          round(col("q50"), 4).as("p50_s"), round(col("q90"), 4).as("p90_s"),
          round(col("q99"), 4).as("p99_s"))
    },

    // ---- Theil–Sen robust trend (the Mann-Kendall companion) ----
    // Median of all pairwise slopes over the daily series — immune to
    // outlier days that wreck least squares. Same calendar-bounded
    // pair frame as q_mann_kendall (#days² pairs regardless of corpus
    // size); slopes are exact DECIMAL differences divided once; the
    // median is the exact interpolated percentile (quantile_cont
    // parity). Intercept = median(y − m·x) over the #days frame. At a
    // multi-decade calendar the exact percentile over D² slopes would
    // swap for approx_percentile; at D ≤ ~2.4k it is 2.9M doubles in
    // one aggregation.
    sql(
      "q_theil_sen",
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |sl AS (SELECT CAST(b.rev - a.rev AS DOUBLE) / (b.d - a.d) AS m
        |       FROM daily a JOIN daily b ON b.d > a.d),
        |ms AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |              quantile_cont(m, 0.5) AS slope FROM sl),
        |ic AS (SELECT quantile_cont(CAST(rev AS DOUBLE)
        |                            - (SELECT slope FROM ms) * d, 0.5) AS icpt
        |       FROM daily)
        |SELECT (SELECT n_pairs FROM ms) AS n_pairs,
        |       round((SELECT slope FROM ms), 6) AS slope_per_day,
        |       round((SELECT icpt FROM ic), 4) AS intercept""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate", "o_totalprice")
      val b = daily.select(col("d").as("d2"), col("rev").as("rev2"))
      // ExactQuantiles reads the pair set twice; re-deriving this
      // cheap broadcast join twice beats materializing 2.9M rows
      val sl = daily.join(broadcast(b), col("d2") > col("d"))
        .select(((col("rev2") - col("rev")).cast("double")
          / (col("d2") - col("d"))).as("m"))
      val ms = ExactQuantiles(sl, "m", Seq(0.5), Seq("med"))
        .select(col("n").as("n_pairs"), col("med").as("slope"))
        .localCheckpoint()
      val ic2 = daily.crossJoin(broadcast(ms))
        .withColumn("rev_d", col("rev").cast("double"))
        .agg(expr("percentile(rev_d - slope * d, 0.5)").as("icpt"))
      ic2.crossJoin(broadcast(ms))
        .select(col("n_pairs"), round(col("slope"), 6).as("slope_per_day"),
          round(col("icpt"), 4).as("intercept"))
    },

    // ---- exponential time-decay aggregation ----
    // The metric-store "current value" shape: every observation
    // weighted e^(−λ·age) against the corpus horizon (λ = 0.1/day ⇒
    // ~7-day half-life), so recent activity dominates without a hard
    // window cliff. One pass: the horizon rides a 1-row broadcast,
    // per-row weights are codegen'd exp over exact-integer µs ages,
    // and the weighted sums accumulate in DECIMAL so merge order
    // can't move the rounded output. The decayed sum is mergeable
    // across time (old_sum·e^(−λΔ) + new) — the same property that
    // makes it incremental-update-friendly at 100 TB.
    sql(
      "q_decay_agg",
      """WITH mx AS (SELECT max(ts) AS m FROM events),
        |t AS (SELECT event_type, value,
        |        exp(-0.1 * (epoch_us((SELECT m FROM mx)) - epoch_us(ts))
        |            / 86400000000.0) AS w
        |      FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(w * value AS DECIMAL(38,18))) AS DOUBLE), 4)
        |    AS decayed_sum,
        |  round(CAST(sum(CAST(w AS DECIMAL(38,18))) AS DOUBLE), 4) AS eff_n,
        |  round(CAST(sum(CAST(w * value AS DECIMAL(38,18))) AS DOUBLE)
        |        / CAST(sum(CAST(w AS DECIMAL(38,18))) AS DOUBLE), 6)
        |    AS decayed_mean
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val mx = ev.agg(max("ts").as("m")).localCheckpoint()
      val w = exp(lit(-0.1) * (unix_micros(col("m")) - unix_micros(col("ts")))
        / 86400000000.0)
      ev.crossJoin(broadcast(mx))
        .select(col("event_type"), (w * col("value")).as("wv"), w.as("w"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("wv").cast("decimal(38,18)")).cast("double").as("swv"),
          sum(col("w").cast("decimal(38,18)")).cast("double").as("sw"))
        .select(col("event_type"), col("n"),
          round(col("swv"), 4).as("decayed_sum"),
          round(col("sw"), 4).as("eff_n"),
          round(col("swv") / col("sw"), 6).as("decayed_mean"))
        .orderBy("event_type")
    },

    // ---- Holt linear (double exponential) smoothing + 1-step forecast ----
    // The trend-aware EWMA: level l' = α·x + (1−α)(l+b), trend
    // b' = β(l'−l) + (1−β)b — the capacity-forecast shape. The
    // recurrence is inherently sequential, but it runs on the
    // CALENDAR-BOUNDED daily collapse (the corpus shuffles once into
    // #days rows), so the single-task fold is over ≤ a few thousand
    // rows at any corpus size — same contract as the other tiny
    // global windows here. α/β pinned; per-step arithmetic mirrors
    // the oracle's recursive CTE operation-for-operation.
    sql(
      "q_holt_linear",
      """WITH RECURSIVE daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |         CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(15,4))
        |              AS DOUBLE) AS x
        |  FROM events GROUP BY 1),
        |arr AS (SELECT list(x ORDER BY d) AS xs, list(d ORDER BY d) AS ds
        |        FROM daily),
        |h(i, l, b) AS (
        |  SELECT 1, (SELECT xs[1] FROM arr),
        |         (SELECT xs[2] FROM arr) - (SELECT xs[1] FROM arr)
        |  UNION ALL
        |  SELECT i + 1,
        |         0.5 * (SELECT xs[i+1] FROM arr) + 0.5 * (l + b),
        |         0.3 * ((0.5 * (SELECT xs[i+1] FROM arr) + 0.5 * (l + b)) - l)
        |           + 0.7 * b
        |  FROM h WHERE i < (SELECT len(xs) FROM arr))
        |SELECT (SELECT ds[i] FROM arr) AS d, (SELECT xs[i] FROM arr) AS x,
        |       round(l, 6) AS level, round(b, 6) AS trend,
        |       round(l + b, 6) AS forecast_next
        |FROM h ORDER BY d""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (alpha, beta) = (0.5, 0.3)
      val daily = dailyDecimal(t(s, dir, "events"), "ts", "value")
        .select(col("d"), col("rev").cast("double").as("x"))
      daily.as[(Long, Double)]
        .coalesce(1) // calendar-bounded frame; the fold is sequential
        .sortWithinPartitions("d")
        .mapPartitions { it =>
          val buf = it.toIndexedSeq
          if (buf.isEmpty) Iterator.empty
          // single-day series: the oracle's b₁ = xs[2] − xs[1] is NULL
          // (no second day) — mirror it or the engines diverge on the
          // degenerate-but-legal input (review find, r7)
          else if (buf.length == 1)
            Iterator.single((buf(0)._1, buf(0)._2, buf(0)._2,
              Option.empty[Double]))
          else {
            var l = buf(0)._2
            var b = buf(1)._2 - buf(0)._2
            buf.iterator.zipWithIndex.map { case ((d, x), i) =>
              if (i > 0) {
                val l2 = alpha * x + (1 - alpha) * (l + b)
                b = beta * (l2 - l) + (1 - beta) * b
                l = l2
              }
              (d, x, l, Some(b))
            }
          }
        }
        .toDF("d", "x", "level", "trend")
        .select(col("d"), col("x"), round(col("level"), 6).as("level"),
          round(col("trend"), 6).as("trend"),
          round(col("level") + col("trend"), 6).as("forecast_next"))
        .orderBy("d")
    },

    // ---- Holt–Winters additive (level + trend + DOW seasonality) ----
    // The third rung of the forecasting ladder (EWMA → Holt → HW):
    // l' = α(x − s_dow) + (1−α)(l+b), b' = β(l'−l) + (1−β)b,
    // s'_dow = γ(x − l') + (1−γ)s_dow over a 7-slot seasonal state
    // (additive, zero-initialized — the pinned convention both
    // engines share). Same calendar-bounded contract as q_holt_linear:
    // the recurrence folds on the ≤#days daily collapse; the oracle's
    // recursive CTE carries the seasonal LIST and is mirrored
    // operation-for-operation (DuckDB traps found on the way: lambdas
    // reject subqueries — feed the step through an indexed join — and
    // bare 0.4 literals type as DECIMAL(2,1) inside lambdas, casting
    // the whole seasonal list — pin ::DOUBLE).
    sql(
      "q_holt_winters",
      """WITH RECURSIVE daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |         CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(15,4))
        |              AS DOUBLE) AS x
        |  FROM events GROUP BY 1),
        |idx AS (SELECT row_number() OVER (ORDER BY d) AS i, d, x,
        |               CAST((d + 3) % 7 AS INT) + 1 AS slot
        |        FROM daily),
        |h(i, l, b, sl) AS (
        |  SELECT 1, (SELECT x FROM idx WHERE i = 1),
        |         (SELECT x FROM idx WHERE i = 2) - (SELECT x FROM idx WHERE i = 1),
        |         list_transform(range(1, 8), z -> 0.0::DOUBLE)
        |  UNION ALL
        |  SELECT t.i, t.lnew,
        |         0.3::DOUBLE * (t.lnew - t.l) + 0.7::DOUBLE * t.b,
        |         list_transform(t.sl, (v, ix) -> CASE WHEN ix = t.slot
        |           THEN 0.4::DOUBLE * (t.x - t.lnew) + 0.6::DOUBLE * v ELSE v END)
        |  FROM (SELECT n.i, n.x, n.slot, h.l, h.b, h.sl,
        |               0.5::DOUBLE * (n.x - h.sl[n.slot])
        |                 + 0.5::DOUBLE * (h.l + h.b) AS lnew
        |        FROM h JOIN idx n ON n.i = h.i + 1) t)
        |SELECT n2.d AS d, n2.x AS x, round(h.l, 6) AS level,
        |       round(h.b, 6) AS trend,
        |       round(h.l + h.b
        |             + h.sl[CAST((n2.d + 1 + 3) % 7 AS INT) + 1], 6)
        |         AS forecast_next
        |FROM h JOIN idx n2 ON n2.i = h.i ORDER BY d""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (alpha, beta, gamma) = (0.5, 0.3, 0.4)
      val daily = dailyDecimal(t(s, dir, "events"), "ts", "value")
        .select(col("d"), col("rev").cast("double").as("x"))
      daily.as[(Long, Double)]
        .coalesce(1) // calendar-bounded frame; the fold is sequential
        .sortWithinPartitions("d")
        .mapPartitions { it =>
          val buf = it.toIndexedSeq
          if (buf.isEmpty) Iterator.empty
          else if (buf.length == 1)
            // single-day: the oracle's b₁ = x₂ − x₁ is NULL (q_holt
            // parity convention)
            Iterator.single((buf(0)._1, buf(0)._2, buf(0)._2,
              Option.empty[Double], Option.empty[Double]))
          else {
            val sl = Array.fill(7)(0.0)
            var l = buf(0)._2
            var b = buf(1)._2 - buf(0)._2
            buf.iterator.zipWithIndex.map { case ((d, x), i) =>
              if (i > 0) {
                val slot = ((d + 3) % 7).toInt
                val sOld = sl(slot)
                val lnew = alpha * (x - sOld) + (1 - alpha) * (l + b)
                b = beta * (lnew - l) + (1 - beta) * b
                sl(slot) = gamma * (x - lnew) + (1 - gamma) * sOld
                l = lnew
              }
              val nextSlot = ((d + 1 + 3) % 7).toInt
              (d, x, l, Some(b), Some(l + b + sl(nextSlot)))
            }
          }
        }
        .toDF("d", "x", "level", "trend", "fc")
        .select(col("d"), col("x"), round(col("level"), 6).as("level"),
          round(col("trend"), 6).as("trend"),
          round(col("fc"), 6).as("forecast_next"))
        .orderBy("d")
    },

    // ---- Poisson burst detection over hourly counts ----
    // The monitoring alarm: hours whose event count exceeds the
    // homogeneous-Poisson baseline by 3σ (σ = √μ). The corpus
    // collapses to hourly counts in one shuffle; the baseline divides
    // the exact total by the DENSE hour span (absent hours count as
    // zero load, not missing data); only bursts are emitted.
    sql(
      "q_burst_detect",
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr,
        |                  CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |b AS (SELECT CAST(min(hr) AS TIMESTAMP) AS lo,
        |             CAST(max(hr) AS TIMESTAMP) AS hi,
        |             CAST(sum(c) AS BIGINT) AS tot FROM h),
        |m AS (SELECT CAST(tot AS DOUBLE)
        |             / (date_diff('hour', lo, hi) + 1) AS mu FROM b)
        |SELECT hr, c,
        |       round((c - (SELECT mu FROM m)) / sqrt((SELECT mu FROM m)), 4) AS z
        |FROM h WHERE c > (SELECT mu FROM m) + 3 * sqrt((SELECT mu FROM m))
        |ORDER BY hr""".stripMargin) { (s, dir) =>
      // hourly counts feed the baseline AND the filter — materialize
      // the corpus collapse once
      val h = t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val m = h.agg(min("hr").as("lo"), max("hr").as("hi"), sum("c").as("tot"))
        .select((col("tot").cast("double") /
          ((unix_micros(col("hi")) - unix_micros(col("lo"))) / 3600000000L + 1))
          .as("mu"))
      h.crossJoin(broadcast(m))
        .where(col("c") > col("mu") + lit(3) * sqrt(col("mu")))
        .select(col("hr"), col("c"),
          round((col("c") - col("mu")) / sqrt(col("mu")), 4).as("z"))
        .orderBy("hr")
    },

    // ---- lagged cross-correlation ----
    // CCF between two daily series (purchase revenue leading view
    // counts by 0..7 days) — the lead-indicator screen run before any
    // causal claim about one metric driving another. The corpus
    // collapses ONCE to the #days frame carrying BOTH metrics (a
    // conditional-sum groupBy, the q_drift_timeline shape); all eight
    // lag alignments are equi-joins of that tiny frame against itself
    // on d+lag, so the corpus is read once at any scale. Pearson
    // cross-moments accumulate in DECIMAL with the (15,4)×(19,4)
    // product pairing — bit-identical on both engines regardless of
    // merge order — and go double only for the final r.
    sql(
      "q_xcorr_lagged",
      """WITH dd AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |                  THEN CAST(value AS DECIMAL(15,4))
        |                  ELSE CAST(0 AS DECIMAL(15,4)) END)
        |         AS DECIMAL(15,4)) AS x,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |l AS (SELECT CAST(range AS BIGINT) AS lag_d FROM range(0, 8)),
        |p AS (SELECT l.lag_d, a.x, b.y
        |      FROM dd a JOIN l ON TRUE JOIN dd b ON b.d = a.d + l.lag_d),
        |m AS (SELECT lag_d, count(*) AS n,
        |        sum(x) AS sx, sum(CAST(y AS DECIMAL(15,4))) AS sy,
        |        sum(x * CAST(y AS DECIMAL(19,4))) AS sxy,
        |        sum(x * CAST(x AS DECIMAL(19,4))) AS sx2,
        |        sum(CAST(y AS DECIMAL(15,4)) * CAST(y AS DECIMAL(19,4))) AS sy2
        |      FROM p GROUP BY lag_d)
        |SELECT lag_d, CAST(n AS BIGINT) AS n_days,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |               * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
        |FROM m ORDER BY lag_d""".stripMargin) { (s, dir) =>
      val zero = lit(0).cast("decimal(15,4)")
      val dd = t(s, dir, "events")
        .groupBy(dayNum(col("ts")).as("d"))
        .agg(
          sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(15,4)")).otherwise(zero))
            .cast("decimal(15,4)").as("x"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
        .localCheckpoint() // #days rows, read by both join sides
      val lags = dd.sparkSession.range(0, 8).select(col("id").as("lag_d"))
      val a = dd.select(col("d"), col("x")).crossJoin(broadcast(lags))
      val b = dd.select(col("d").as("db"), col("y"))
      val d15 = (c: Column) => c.cast("decimal(15,4)")
      val d19 = (c: Column) => c.cast("decimal(19,4)")
      val m = a.join(b, col("db") === col("d") + col("lag_d"))
        .groupBy("lag_d")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(d15(col("y"))).as("sy"),
          sum(col("x") * d19(col("y"))).as("sxy"),
          sum(col("x") * d19(col("x"))).as("sx2"),
          sum(d15(col("y")) * d19(col("y"))).as("sy2"))
      val dbl = (n: String) => col(n).cast("double")
      m.select(col("lag_d"), col("n").as("n_days"),
          round((dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy"))
            / sqrt((dbl("n") * dbl("sx2") - dbl("sx") * dbl("sx"))
              * (dbl("n") * dbl("sy2") - dbl("sy") * dbl("sy"))), 6).as("r"))
        .orderBy("lag_d")
    },

    // ---- SLO error-budget burn (SRE readout) ----
    // The availability ledger over the event stream: per day, the
    // error rate against a 99% SLO, the burn rate (rate / budget — 1×
    // means the budget exactly lasts the window), and the cumulative
    // fraction of the period's error budget consumed. ONE corpus
    // aggregation to #days rows; the cumulative sweep and the
    // period-budget scalar run on that frame. Exact integer counts
    // divided once; the budget denominator (1% of period traffic)
    // rides a 1-row broadcast.
    sql(
      "q_slo_burn",
      """WITH d AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS errs
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn FROM d),
        |c AS (SELECT d, n, errs,
        |        CAST(sum(errs) OVER (ORDER BY d) AS BIGINT) AS cum_errs
        |      FROM d)
        |SELECT d, n, errs,
        |  round(CAST(errs AS DOUBLE) / n, 6) AS err_rate,
        |  round(CAST(errs AS DOUBLE) / n / CAST(0.01 AS DOUBLE), 6) AS burn_rate,
        |  round(CAST(cum_errs AS DOUBLE)
        |        / (CAST(0.01 AS DOUBLE) * (SELECT tn FROM tot)), 6)
        |    AS budget_consumed
        |FROM c ORDER BY d""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events")
        .groupBy(dayNum(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errs"))
        .localCheckpoint() // #days rows: feeds total + window + output
      val tot = d.agg(sum("n").as("tn"))
      // the one intentionally tiny global window (#days rows)
      val wCum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
      d.withColumn("cum_errs", sum("errs").over(wCum))
        .crossJoin(broadcast(tot))
        .select(col("d"), col("n"), col("errs"),
          round(col("errs").cast("double") / col("n"), 6).as("err_rate"),
          round(col("errs").cast("double") / col("n") / 0.01, 6).as("burn_rate"),
          round(col("cum_errs").cast("double") / (lit(0.01) * col("tn")), 6)
            .as("budget_consumed"))
        .orderBy("d")
    },

    // ---- A/B test power analysis (required sample size) ----
    // The pre-experiment sizing table: per relative MDE, the per-arm n
    // for a two-sample z-test at α=0.05 / power 0.80 — n =
    // 2σ²(z_{α/2}+z_β)²/δ² with δ = μ·mde. μ and σ² come from ONE
    // corpus moments pass (exact DECIMAL sums, the q_cuped pairing);
    // the 4-row MDE ladder is a literal frame crossJoined against the
    // 1-row broadcast moments. z constants are pinned 17-digit
    // literals so both engines square the identical double.
    sql(
      "q_power_analysis",
      """WITH m AS (SELECT count(*) AS n,
        |    sum(CAST(value AS DECIMAL(15,4))) AS sx,
        |    sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(19,4))) AS sxx
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS var
        |  FROM m),
        |l AS (SELECT * FROM (VALUES (1), (2), (5), (10)) AS t(mde_pct))
        |SELECT l.mde_pct,
        |  round(v.mu * l.mde_pct / 100, 6) AS delta,
        |  CAST(ceil(2 * v.var
        |    * (1.9599639845400545 + 0.8416212335729143)
        |    * (1.9599639845400545 + 0.8416212335729143)
        |    / ((v.mu * l.mde_pct / 100) * (v.mu * l.mde_pct / 100)))
        |    AS BIGINT) AS n_per_arm
        |FROM l, v ORDER BY l.mde_pct""".stripMargin) { (s, dir) =>
      import s.implicits._
      val d15 = (c: Column) => c.cast("decimal(15,4)")
      val d19 = (c: Column) => c.cast("decimal(19,4)")
      val m = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .agg(count(lit(1)).as("n"), sum(d15(col("value"))).as("sx"),
          sum(d15(col("value")) * d19(col("value"))).as("sxx"))
      val nD = col("n").cast("double")
      val v = m.select(
        (col("sx").cast("double") / nD).as("mu"),
        ((nD * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
          / (nD * (nD - 1))).as("var"))
      val z = lit(1.9599639845400545 + 0.8416212335729143)
      val delta = col("mu") * col("mde_pct") / 100
      Seq(1, 2, 5, 10).toDF("mde_pct")
        .crossJoin(broadcast(v))
        .select(col("mde_pct"),
          round(delta, 6).as("delta"),
          ceil(lit(2) * col("var") * z * z / (delta * delta))
            .cast("long").as("n_per_arm"))
        .orderBy("mde_pct")
    },

    // ---- forecast backtest (naive vs moving-average, MAE/RMSE/MAPE) ----
    // One-step-ahead backtest over the daily revenue series: the lag-1
    // naive forecast vs the trailing-7-observation mean, each scored
    // with MAE/RMSE/MAPE on the days where it is defined (naive needs
    // one prior activity day; MA needs a full 7 — standard warmup
    // exclusion). The model-selection sanity check run before any
    // smoother ships. The corpus collapses ONCE to the #days DECIMAL
    // frame; forecasts are two ordered windows over it; per-day error
    // terms go double then accumulate in DECIMAL(38,18) (the chi²
    // idiom) so the three metrics are merge-order-independent. MA is
    // sum/count with an explicit double division — windowed avg()
    // types differ between engines (Spark widens DECIMAL, DuckDB
    // returns DOUBLE), so neither engine's avg is used.
    sql(
      "q_forecast_eval",
      """WITH dd AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |f AS (SELECT d, rev,
        |    lag(rev) OVER (ORDER BY d) AS naive_fc,
        |    CAST(sum(rev) OVER (ORDER BY d
        |         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS DOUBLE)
        |      / count(rev) OVER (ORDER BY d
        |         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS ma_fc,
        |    count(rev) OVER (ORDER BY d
        |         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS ma_n
        |  FROM dd),
        |e AS (SELECT 'naive' AS model,
        |        CAST(rev AS DOUBLE) - CAST(naive_fc AS DOUBLE) AS err,
        |        CAST(rev AS DOUBLE) AS actual
        |      FROM f WHERE naive_fc IS NOT NULL
        |      UNION ALL
        |      SELECT 'ma7',
        |        CAST(rev AS DOUBLE) - ma_fc,
        |        CAST(rev AS DOUBLE)
        |      FROM f WHERE ma_n = 7)
        |SELECT model, CAST(count(*) AS BIGINT) AS n_days,
        |  round(CAST(sum(CAST(abs(err) AS DECIMAL(38,18))) AS DOUBLE)
        |        / count(*), 6) AS mae,
        |  round(sqrt(CAST(sum(CAST(err * err AS DECIMAL(38,18))) AS DOUBLE)
        |        / count(*)), 6) AS rmse,
        |  round(CAST(sum(CAST(abs(err) / actual AS DECIMAL(38,18))) AS DOUBLE)
        |        * 100 / count(*), 6) AS mape
        |FROM e GROUP BY model ORDER BY model""".stripMargin) { (s, dir) =>
      // purchase-active days only: MAPE divides by the actual, and a
      // zero-revenue day would blow it up on both engines
      val dd = dailyDecimal(
        t(s, dir, "events").where(col("event_type") === "purchase"),
        "ts", "value")
      val wOrd = Window.orderBy("d") // #days rows — intentionally tiny
      val wMa = wOrd.rowsBetween(-7, -1)
      val f = dd
        .withColumn("naive_fc", lag("rev", 1).over(wOrd))
        .withColumn("ma_sum", sum("rev").over(wMa))
        .withColumn("ma_n", count("rev").over(wMa))
        .withColumn("ma_fc", col("ma_sum").cast("double") / col("ma_n"))
        .localCheckpoint() // feeds both model branches
      val naive = f.where(col("naive_fc").isNotNull)
        .select(lit("naive").as("model"),
          (col("rev").cast("double") - col("naive_fc").cast("double")).as("err"),
          col("rev").cast("double").as("actual"))
      val ma = f.where(col("ma_n") === 7)
        .select(lit("ma7").as("model"),
          (col("rev").cast("double") - col("ma_fc")).as("err"),
          col("rev").cast("double").as("actual"))
      naive.unionByName(ma)
        .groupBy("model")
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("err")).cast("decimal(38,18)")).as("sae"),
          sum((col("err") * col("err")).cast("decimal(38,18)")).as("sse"),
          sum((abs(col("err")) / col("actual")).cast("decimal(38,18)")).as("sape"))
        .select(col("model"), col("n_days"),
          round(col("sae").cast("double") / col("n_days"), 6).as("mae"),
          round(sqrt(col("sse").cast("double") / col("n_days")), 6).as("rmse"),
          round(col("sape").cast("double") * 100 / col("n_days"), 6).as("mape"))
        .orderBy("model")
    },

    // ---- DAU/MAU stickiness ratio ----
    // The engagement-intensity ratio product dashboards lead with:
    // daily actives over trailing-28-day actives, per calendar day.
    // Both counts derive from ONE corpus collapse to distinct
    // (user, day): DAU is a groupBy of that frame; MAU is the shared
    // interval-coverage rewrite (slidingDistinctFromDaily, windowDays
    // = 28) — never a days×28 range join, one corpus shuffle total.
    // Gap days (grid rows with no activity) report DAU 0 against a
    // nonzero trailing MAU, exactly like the naive definition.
    sql(
      "q_stickiness",
      """WITH a AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |g AS (SELECT unnest(generate_series((SELECT min(d) FROM a),
        |                                    (SELECT max(d) FROM a))) AS d),
        |mau AS (SELECT g.d AS d, count(DISTINCT a.user_id) AS mau
        |        FROM g LEFT JOIN a ON a.d BETWEEN g.d - 27 AND g.d
        |        GROUP BY g.d),
        |dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM a GROUP BY d)
        |SELECT m.d AS d, coalesce(dau.dau, 0) AS dau, m.mau AS mau,
        |  round(CAST(coalesce(dau.dau, 0) AS DOUBLE) / m.mau, 6) AS stickiness
        |FROM mau m LEFT JOIN dau ON dau.d = m.d
        |ORDER BY m.d""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "events")
        .select(col("user_id"), dayNum(col("ts")).as("d"))
        .distinct()
        .localCheckpoint() // feeds BOTH the daily counts and the MAU rewrite
      val mau = slidingDistinctFromDaily(a, 28)
        .withColumnRenamed("users", "mau")
      val dau = a.groupBy("d").agg(count(lit(1)).as("dau"))
      mau.join(dau, Seq("d"), "left")
        .select(col("d"), coalesce(col("dau"), lit(0L)).as("dau"), col("mau"),
          round(coalesce(col("dau"), lit(0L)).cast("double") / col("mau"), 6)
            .as("stickiness"))
        .orderBy("d")
    },

    // ---- growth accounting (new / retained / resurrected / churned) ----
    // The standard weekly user-lifecycle ledger: every active user-week
    // is NEW (first activity), RETAINED (also active the prior week) or
    // RESURRECTED (returning after a gap); CHURNED counts users active
    // in w−1 but not w, attributed to w. The corpus collapses ONCE to
    // distinct (user, week); classification is lag/lead over each
    // user's own activity weeks (per-user windows — partitioned, never
    // global); weekly counts aggregate the classified frame. Weeks are
    // day-number div 7 so no engine week-of-year convention is
    // involved. Churn needs the corpus horizon (a user's last activity
    // week cannot churn INTO a week past the data) — a 1-row broadcast.
    sql(
      "q_growth_accounting",
      """WITH a AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS w
        |  FROM events),
        |mx AS (SELECT max(w) AS maxw FROM a),
        |c AS (SELECT user_id, w,
        |    lag(w) OVER (PARTITION BY user_id ORDER BY w) AS pw,
        |    lead(w) OVER (PARTITION BY user_id ORDER BY w) AS nw
        |  FROM a),
        |act AS (SELECT w,
        |    CAST(sum(CASE WHEN pw IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS new_u,
        |    CAST(sum(CASE WHEN pw = w - 1 THEN 1 ELSE 0 END) AS BIGINT) AS retained,
        |    CAST(sum(CASE WHEN pw IS NOT NULL AND pw < w - 1
        |             THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        |  FROM c GROUP BY w),
        |ch AS (SELECT w + 1 AS w, CAST(count(*) AS BIGINT) AS churned
        |  FROM c WHERE (nw IS NULL OR nw > w + 1)
        |    AND w + 1 <= (SELECT maxw FROM mx)
        |  GROUP BY w + 1)
        |SELECT coalesce(act.w, ch.w) AS w,
        |  coalesce(new_u, 0) AS new_u, coalesce(retained, 0) AS retained,
        |  coalesce(resurrected, 0) AS resurrected,
        |  coalesce(churned, 0) AS churned
        |FROM act FULL JOIN ch ON ch.w = act.w
        |ORDER BY w""".stripMargin) { (s, dir) =>
      val act0 = t(s, dir, "events")
        .select(col("user_id"),
          dayNum(col("ts")).as("d"))
        .select(col("user_id"), expr("d div 7").as("w"))
        .distinct()
      val wUser = Window.partitionBy("user_id").orderBy("w")
      // classified frame feeds BOTH weekly aggregations — materialize
      // the corpus distinct + window pipeline once
      val c = act0
        .withColumn("pw", lag("w", 1).over(wUser))
        .withColumn("nw", lead("w", 1).over(wUser))
        .localCheckpoint()
      val mx = c.agg(max("w").as("maxw"))
      val act = c.groupBy("w")
        .agg(sum(when(col("pw").isNull, 1L).otherwise(0L)).as("new_u"),
          sum(when(col("pw") === col("w") - 1, 1L).otherwise(0L)).as("retained"),
          sum(when(col("pw").isNotNull && col("pw") < col("w") - 1, 1L)
            .otherwise(0L)).as("resurrected"))
      val ch = c.crossJoin(broadcast(mx))
        .where((col("nw").isNull || col("nw") > col("w") + 1)
          && col("w") + 1 <= col("maxw"))
        .groupBy((col("w") + 1).as("w"))
        .agg(count(lit(1)).as("churned"))
      act.join(ch, Seq("w"), "full")
        .select(col("w"),
          coalesce(col("new_u"), lit(0L)).as("new_u"),
          coalesce(col("retained"), lit(0L)).as("retained"),
          coalesce(col("resurrected"), lit(0L)).as("resurrected"),
          coalesce(col("churned"), lit(0L)).as("churned"))
        .orderBy("w")
    },

    // ---- decile lift / gains table ----
    // The model-targeting readout beside q_calibration and q_auc: rank
    // the population by score decile (highest first), report per-decile
    // response rate, lift vs the base rate, and cumulative capture of
    // all positives. Because the md5-uniform score is an exact integer
    // in [0,1000), deciles are integer division — no ranking pass at
    // all; the corpus collapses to 10 rows in ONE aggregation and the
    // cumulative sweep is a tiny ordered window over those 10 rows.
    // Every ratio is exact-integer until one double division.
    sql(
      "q_decile_lift",
      """WITH s AS (SELECT
        |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 1000 AS k,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |g AS (SELECT k // 100 AS decile, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(y) AS BIGINT) AS pos
        |      FROM s GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |               CAST(sum(pos) AS BIGINT) AS pp FROM g),
        |r AS (SELECT decile, n, pos,
        |        sum(pos) OVER (ORDER BY decile DESC
        |          ROWS UNBOUNDED PRECEDING) AS cum_pos
        |      FROM g)
        |SELECT decile, n, pos,
        |  round(CAST(pos AS DOUBLE) / n, 6) AS rate,
        |  round(CAST(pos AS DOUBLE) * (SELECT nn FROM tot)
        |        / (CAST(n AS DOUBLE) * (SELECT pp FROM tot)), 6) AS lift,
        |  round(CAST(cum_pos AS DOUBLE) / (SELECT pp FROM tot), 6) AS cum_capture
        |FROM r ORDER BY decile DESC""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      val g = t(s, dir, "events")
        .select((h32(col("event_id").cast("string")) % 1000).as("k"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy(expr("k div 100").as("decile"))
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
        .localCheckpoint() // 10 rows feeding totals + window + output
      val tot = g.agg(sum("n").as("nn"), sum("pos").as("pp"))
      // the one intentionally tiny global window (10 rows)
      val wCum = Window.orderBy(desc("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      g.withColumn("cum_pos", sum("pos").over(wCum))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n"), col("pos"),
          round(col("pos").cast("double") / col("n"), 6).as("rate"),
          round(col("pos").cast("double") * col("nn")
            / (col("n").cast("double") * col("pp")), 6).as("lift"),
          round(col("cum_pos").cast("double") / col("pp"), 6).as("cum_capture"))
        .orderBy(desc("decile"))
    },

    // ---- confusion matrix + precision/recall/F1 ----
    // Per-day classifier eval readout (the slice-wise companion of
    // q_calibration / q_auc_sliced): the deterministic md5-uniform
    // score thresholded at 0.5 against the purchase label, confusion
    // cells from ONE conditional-sum corpus aggregation, and the
    // derived metrics as exact-integer ratios divided once. F1 uses
    // the 2tp/(2tp+fp+fn) form — algebraically equal to the harmonic
    // mean but with a single division, so there is no intermediate
    // precision/recall rounding to drift between engines.
    sql(
      "q_eval_prf",
      """WITH s AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
        |              % 1000 >= 500 THEN 1 ELSE 0 END AS pred,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |c AS (SELECT d,
        |    CAST(sum(pred * y) AS BIGINT) AS tp,
        |    CAST(sum(pred * (1 - y)) AS BIGINT) AS fp,
        |    CAST(sum((1 - pred) * y) AS BIGINT) AS fn,
        |    CAST(sum((1 - pred) * (1 - y)) AS BIGINT) AS tn
        |  FROM s GROUP BY d)
        |SELECT d, tp, fp, fn, tn,
        |  round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS acc,
        |  round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS prec,
        |  round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS rec,
        |  round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1
        |FROM c ORDER BY d""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      val sc = t(s, dir, "events")
        .select(dayNum(col("ts")).as("d"),
          when(h32(col("event_id").cast("string")) % 1000 >= 500, 1L)
            .otherwise(0L).as("pred"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      sc.groupBy("d")
        .agg(sum(col("pred") * col("y")).as("tp"),
          sum(col("pred") * (lit(1) - col("y"))).as("fp"),
          sum((lit(1) - col("pred")) * col("y")).as("fn"),
          sum((lit(1) - col("pred")) * (lit(1) - col("y"))).as("tn"))
        .select(col("d"), col("tp"), col("fp"), col("fn"), col("tn"),
          round((col("tp") + col("tn")).cast("double")
            / (col("tp") + col("fp") + col("fn") + col("tn")), 6).as("acc"),
          round(col("tp").cast("double") / (col("tp") + col("fp")), 6).as("prec"),
          round(col("tp").cast("double") / (col("tp") + col("fn")), 6).as("rec"),
          round((lit(2) * col("tp")).cast("double")
            / (lit(2) * col("tp") + col("fp") + col("fn")), 6).as("f1"))
        .orderBy("d")
    },

    // ---- SAX symbolization (PAA + Gaussian-breakpoint alphabet) ----
    // Lin et al.'s Symbolic Aggregate approXimation: each user's
    // value series is z-normalized, piecewise-aggregate-approximated
    // over 8-event segments, and mapped to a 4-symbol alphabet at the
    // N(0,1) quartile breakpoints (±0.6745, 0) — the discretization
    // that turns raw telemetry into motif-minable strings. Scale:
    // the per-user rank, the per-(user, segment) PAA aggregation and
    // the per-user moments all shuffle on the SAME key prefix
    // (user_id), so the plan is one corpus sort plus co-partitioned
    // aggregations; all z-arithmetic runs from exact DECIMAL moments
    // so the symbols are bit-identical across engines.
    sql(
      "q_sax",
      """WITH o AS (SELECT user_id, CAST(value AS DECIMAL(18,6)) AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE user_id % 10 = 0),
        |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(y) AS DECIMAL(38,6)) AS s,
        |         CAST(sum(y * y) AS DECIMAL(38,12)) AS s2
        |       FROM o GROUP BY user_id),
        |paa AS (SELECT user_id, (rn - 1) // 8 AS seg,
        |          CAST(count(*) AS BIGINT) AS k,
        |          CAST(sum(y) AS DECIMAL(38,6)) AS sy
        |        FROM o GROUP BY 1, 2),
        |z AS (SELECT p.user_id, p.seg,
        |        (CAST(p.sy AS DOUBLE) / p.k
        |         - CAST(t.s AS DOUBLE) / t.n)
        |        / sqrt(CAST(t.s2 AS DOUBLE) / t.n
        |               - (CAST(t.s AS DOUBLE) / t.n) * (CAST(t.s AS DOUBLE) / t.n))
        |          AS zv
        |      FROM paa p JOIN st t ON t.user_id = p.user_id
        |      WHERE p.k = 8)
        |SELECT user_id, seg, round(zv, 4) AS paa_z,
        |  CASE WHEN zv < -0.6745 THEN 'a' WHEN zv < 0 THEN 'b'
        |       WHEN zv < 0.6745 THEN 'c' ELSE 'd' END AS symbol
        |FROM z ORDER BY user_id, seg""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "events")
        .where(col("user_id") % 10 === 0)
        .select(col("user_id"), col("value").cast("decimal(18,6)").as("y"),
          row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")).as("rn"))
        .localCheckpoint() // feeds per-user moments AND per-segment PAA
      val st = o.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum("y").cast("decimal(38,6)").as("s"),
          sum(col("y") * col("y")).cast("decimal(38,12)").as("s2"))
      val paa = o
        .groupBy(col("user_id"), ((col("rn") - 1) / 8).cast("long").as("seg"))
        .agg(count(lit(1)).as("k"), sum("y").cast("decimal(38,6)").as("sy"))
      val mean = col("s").cast("double") / col("n")
      val z = paa.join(st, "user_id")
        .where(col("k") === 8)
        .select(col("user_id"), col("seg"),
          ((col("sy").cast("double") / col("k") - mean)
            / sqrt(col("s2").cast("double") / col("n") - mean * mean)).as("zv"))
      z.select(col("user_id"), col("seg"), round(col("zv"), 4).as("paa_z"),
          when(col("zv") < -0.6745, "a").when(col("zv") < 0, "b")
            .when(col("zv") < 0.6745, "c").otherwise("d").as("symbol"))
        .orderBy("user_id", "seg")
    },

    // ---- 1-D Kalman filter (local-level model) per key ----
    // The optimal recursive smoother for noisy level telemetry
    // (state x, variance P; process noise q=1, observation noise
    // r=4): P' = P+q; K = P'/(P'+r); x += K(z−x); P = (1−K)P'. Like
    // q_ewma this is inherently SEQUENTIAL — no window frame — so it
    // runs as the same secondary-sort mapPartitions fold (key-local
    // runs, O(rows), two doubles of state). The DuckDB oracle folds
    // the identically-ordered list with a STRUCT accumulator through
    // list_reduce (x and P together), seeded x₀=z₀, P₀=1 on both
    // sides — bit-identical double recurrences.
    sql(
      "q_kalman_1d",
      """WITH l AS (SELECT user_id,
        |             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS xs
        |           FROM events WHERE user_id % 10 = 0
        |           GROUP BY user_id),
        |k AS (SELECT user_id, CAST(len(xs) AS BIGINT) AS n_events,
        |        list_reduce(
        |          list_transform(xs, z -> {'x': z, 'p': CAST(1.0 AS DOUBLE)}),
        |          (acc, el) -> {
        |            'x': acc.x + ((acc.p + 1.0) / (acc.p + 1.0 + 4.0))
        |                         * (el.x - acc.x),
        |            'p': (1.0 - (acc.p + 1.0) / (acc.p + 1.0 + 4.0))
        |                 * (acc.p + 1.0)}) AS st
        |      FROM l)
        |SELECT user_id, n_events,
        |       round(CAST(st.x AS DOUBLE), 6) AS x_hat,
        |       round(CAST(st.p AS DOUBLE), 6) AS p_var
        |FROM k ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      t(s, dir, "events")
        .where(col("user_id") % 10 === 0)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("value"))
        .as[(Long, Long, Long, Double)]
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "us", "event_id")
        .mapPartitions { it =>
          new Iterator[(Long, Long, Double, Double)] {
            private var pending: Option[(Long, Long, Long, Double)] =
              if (it.hasNext) Some(it.next()) else None
            def hasNext: Boolean = pending.isDefined
            def next(): (Long, Long, Double, Double) = {
              val (uid, _, _, v0) = pending.get
              var x = v0
              var p = 1.0
              var cnt = 1L
              pending = None
              while (pending.isEmpty && it.hasNext) {
                val r = it.next()
                if (r._1 == uid) {
                  val pp = p + 1.0
                  val k = pp / (pp + 4.0)
                  x = x + k * (r._4 - x)
                  p = (1.0 - k) * pp
                  cnt += 1
                } else pending = Some(r)
              }
              (uid, cnt, x, p)
            }
          }
        }
        .toDF("user_id", "n_events", "x", "p")
        .select(col("user_id"), col("n_events"),
          round(col("x"), 6).as("x_hat"), round(col("p"), 6).as("p_var"))
        .orderBy("user_id")
    },

    // ---- deseasonalized anomaly detection (STL residual + MAD) ----
    // Anomalies scored AFTER removing trend (±3-day centered MA) and
    // day-of-week seasonality — the screen that doesn't page on
    // weekends. Residuals come from the q_seasonal_dow decomposition;
    // the robust threshold is median ± 3·1.4826·MAD of the residuals
    // (two exact medians over the #days frame — the corpus was
    // collapsed to days in ONE pass; everything after is
    // calendar-bounded). The flag is computed on ROUNDED residuals so
    // the threshold compare is bit-stable across engines.
    sql(
      "q_anomaly_deseasonalized",
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM events GROUP BY 1),
        |tr AS (SELECT d, rev, (d + 3) % 7 AS dow,
        |         CAST(sum(rev) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
        |                             AND 3 FOLLOWING) AS DOUBLE)
        |           / count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
        |                            AND 3 FOLLOWING) AS trend
        |       FROM daily),
        |g AS (SELECT CAST(sum(rev) AS DOUBLE) / count(*) AS gmean FROM daily),
        |dm AS (SELECT (d + 3) % 7 AS dow,
        |              CAST(sum(rev) AS DOUBLE) / count(*) AS dmean
        |       FROM daily GROUP BY 1),
        |r AS (SELECT t.d,
        |        round(CAST(t.rev AS DOUBLE) - t.trend
        |              - (dm.dmean - (SELECT gmean FROM g)), 4) AS resid
        |      FROM tr t JOIN dm ON dm.dow = t.dow),
        |m AS (SELECT CAST(quantile_cont(resid, 0.5) AS DOUBLE) AS med FROM r),
        |a AS (SELECT CAST(quantile_cont(abs(resid - (SELECT med FROM m)), 0.5)
        |             AS DOUBLE) AS mad FROM r)
        |SELECT d, resid,
        |  round(abs(resid - (SELECT med FROM m))
        |        / (1.4826 * (SELECT mad FROM a)), 4) AS score,
        |  CAST(abs(resid - (SELECT med FROM m))
        |       > 3 * 1.4826 * (SELECT mad FROM a) AS BOOLEAN) AS is_anomaly
        |FROM r ORDER BY d""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "events"), "ts", "value")
      // the one intentionally tiny global window (#days rows)
      val w = Window.orderBy("d").rowsBetween(-3, 3)
      val tr = daily
        .withColumn("dow", (col("d") + 3) % 7)
        .withColumn("trend",
          sum("rev").over(w).cast("double") / count(lit(1)).over(w))
      val g = daily.agg(
        (sum("rev").cast("double") / count(lit(1))).as("gmean"))
      val dm = daily.groupBy(((col("d") + 3) % 7).as("dow"))
        .agg((sum("rev").cast("double") / count(lit(1))).as("dmean"))
      val r = tr.join(broadcast(dm), "dow").crossJoin(broadcast(g))
        .select(col("d"),
          round(col("rev").cast("double") - col("trend")
            - (col("dmean") - col("gmean")), 4).as("resid"))
        .localCheckpoint() // #days rows: feeds median, MAD and output
      val m = r.agg(expr("percentile(resid, 0.5)").cast("double").as("med"))
      val a = r.crossJoin(broadcast(m))
        .agg(expr("percentile(abs(resid - med), 0.5)").cast("double").as("mad"))
      r.crossJoin(broadcast(m)).crossJoin(broadcast(a))
        .select(col("d"), col("resid"),
          round(abs(col("resid") - col("med"))
            / (lit(1.4826) * col("mad")), 4).as("score"),
          (abs(col("resid") - col("med"))
            > lit(3) * lit(1.4826) * col("mad")).as("is_anomaly"))
        .orderBy("d")
    },

    // ---- Holt linear-trend forecast (double exponential smoothing) ----
    // Holt 1957: per-series level+trend recursion
    //   l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
    //   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    // (α=0.5, β=0.3 pinned; init l₁=y₁, b₁=0), forecast ŷ_{T+h} =
    // l_T + h·b_T — the capacity-planning "where is this metric going"
    // fold, and the trend-aware upgrade of q_ema's single smoothing.
    // Scale shape (the q_kalman_1d secondary-sort pattern): the corpus
    // collapses ONCE to the (#series × #days) day frame in a single
    // hash aggregation (daily y summed as DECIMAL — exact, so both
    // engines fold identical doubles); the inherently sequential
    // recursion then runs per series inside mapPartitions over a
    // series-key repartition + in-partition (series, day) sort — no
    // window over the corpus, no driver collect, and the fold input is
    // day-frame-sized at any corpus scale. Both engines evaluate the
    // SAME IEEE expression shapes in the same order (the recursive
    // CTE's step columns ≡ the iterator fold; the trend update is the
    // expanded 0.3·(0.5y − 0.5l + 0.5b) + 0.7b form on BOTH sides —
    // DuckDB's list_reduce mutates the accumulator struct field-by-
    // field, so a struct fold is NOT usable as an oracle here), hence
    // level/trend match bitwise before the 6-dp rounding.
    sql(
      "q_holt_forecast",
      """WITH RECURSIVE d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
        |           FROM events GROUP BY 1, 2),
        |i AS (SELECT event_type, y,
        |        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |             AS BIGINT) AS rn
        |      FROM d),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |      FROM i GROUP BY 1),
        |f AS (SELECT event_type, rn, y AS l, CAST(0.0 AS DOUBLE) AS b
        |      FROM i WHERE rn = 1
        |      UNION ALL
        |      SELECT i.event_type, i.rn,
        |             0.5 * i.y + 0.5 * (f.l + f.b),
        |             0.3 * (0.5 * i.y - 0.5 * f.l + 0.5 * f.b) + 0.7 * f.b
        |      FROM f JOIN i ON i.event_type = f.event_type
        |                   AND i.rn = f.rn + 1)
        |SELECT f.event_type, n.n_days,
        |       round(f.l, 6) AS level, round(f.b, 6) AS trend,
        |       round(f.l + 1 * f.b, 6) AS fc_1,
        |       round(f.l + 2 * f.b, 6) AS fc_2,
        |       round(f.l + 3 * f.b, 6) AS fc_3
        |FROM f JOIN n ON n.event_type = f.event_type AND f.rn = n.n_days
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("y"))
        .select(col("event_type"), col("day"), col("y"))
        .as[(String, java.sql.Date, Double)]
        .repartition(col("event_type"))
        .sortWithinPartitions("event_type", "day")
        .mapPartitions { it =>
          new Iterator[(String, Long, Double, Double)] {
            private var pending: Option[(String, java.sql.Date, Double)] =
              if (it.hasNext) Some(it.next()) else None
            def hasNext: Boolean = pending.isDefined
            def next(): (String, Long, Double, Double) = {
              val (et, _, y0) = pending.get
              var l = y0
              var b = 0.0
              var n = 1L
              pending = None
              while (pending.isEmpty && it.hasNext) {
                val r = it.next()
                if (r._1 == et) {
                  // expanded trend form — must stay shape-identical to
                  // the oracle CTE's step expressions (bitwise parity)
                  val lp = 0.5 * r._3 + 0.5 * (l + b)
                  val bp = 0.3 * (0.5 * r._3 - 0.5 * l + 0.5 * b) + 0.7 * b
                  l = lp
                  b = bp
                  n += 1
                } else pending = Some(r)
              }
              (et, n, l, b)
            }
          }
        }
        .toDF("event_type", "n_days", "l", "b")
        .select(col("event_type"), col("n_days"),
          round(col("l"), 6).as("level"), round(col("b"), 6).as("trend"),
          round(col("l") + lit(1) * col("b"), 6).as("fc_1"),
          round(col("l") + lit(2) * col("b"), 6).as("fc_2"),
          round(col("l") + lit(3) * col("b"), 6).as("fc_3"))
        .orderBy("event_type")
    },

    // ---- Theta-method forecast (Assimakopoulos & Nikolopoulos 2000) ----
    // The M3-competition winner and the benchmark every new forecast
    // method is still judged against (Hyndman & Billah 2003 showed it
    // is SES-with-drift): decompose the series into θ-lines, here the
    // classic pair θ=0 (the pure linear trend) and θ=2
    // (z_t = 2·y_t − trend_t, curvature doubled), SES the θ=2 line,
    // and average the two lines' forecasts. Sits between
    // q_holt_forecast (recursive trend) and q_ar2_forecast (mean
    // reversion) on the ladder: the trend here is the GLOBAL OLS fit,
    // so one bad recent day cannot bend it. Cross-engine exactness:
    // trend moments are EXACT (DECIMAL(6,0)·DECIMAL(28,6) products —
    // 6+28+1 = 35 ≤ 38 on both engines, the q_ols_multi pairing), so
    // a/b doubles agree bitwise; the θ-line and its α=0.5 SES fold run
    // the SAME IEEE expression shapes in the same sequential order
    // (the q_holt_forecast recursive-CTE ≡ mapPartitions-fold parity
    // argument; 0.5 multiplies are exact). Scale shape: ONE corpus
    // collapse to the (#series × #days) day frame; the moment
    // aggregation is per-series (5 rows broadcast back); the fold is
    // a per-series in-partition walk — no corpus window, no collect.
    sql(
      "q_theta_forecast",
      """WITH RECURSIVE d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
        |               AS yd
        |           FROM events GROUP BY 1, 2),
        |i0 AS (SELECT event_type, yd,
        |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |              AS BIGINT) AS rn
        |       FROM d),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(rn) AS BIGINT) AS sx,
        |        CAST(sum(rn * rn) AS BIGINT) AS sxx,
        |        CAST(sum(yd) AS DECIMAL(38,6)) AS sy,
        |        CAST(sum(CAST(rn AS DECIMAL(6,0)) * CAST(yd AS DECIMAL(28,6)))
        |          AS DECIMAL(38,6)) AS sxy
        |      FROM i0 GROUP BY 1),
        |ab AS (SELECT event_type, n, sx, sy,
        |         (n * CAST(sxy AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) AS b
        |       FROM m),
        |ab2 AS (SELECT event_type, n, b,
        |          CAST(sy AS DOUBLE) / n - b * (CAST(sx AS DOUBLE) / n) AS a
        |        FROM ab),
        |i AS (SELECT i0.event_type, i0.rn,
        |        2 * CAST(i0.yd AS DOUBLE) - (ab2.a + ab2.b * i0.rn) AS z
        |      FROM i0 JOIN ab2 ON ab2.event_type = i0.event_type),
        |f AS (SELECT event_type, rn, z AS l FROM i WHERE rn = 1
        |      UNION ALL
        |      SELECT i.event_type, i.rn, 0.5 * i.z + 0.5 * f.l
        |      FROM f JOIN i ON i.event_type = f.event_type
        |                   AND i.rn = f.rn + 1)
        |SELECT f.event_type, ab2.n AS n_days,
        |  round(ab2.a, 6) + 0.0 AS trend_a, round(ab2.b, 6) + 0.0 AS trend_b,
        |  round(f.l, 6) + 0.0 AS ses_theta2,
        |  round(0.5 * (ab2.a + ab2.b * (ab2.n + 1)) + 0.5 * f.l, 6) + 0.0
        |    AS fc_1,
        |  round(0.5 * (ab2.a + ab2.b * (ab2.n + 2)) + 0.5 * f.l, 6) + 0.0
        |    AS fc_2,
        |  round(0.5 * (ab2.a + ab2.b * (ab2.n + 3)) + 0.5 * f.l, 6) + 0.0
        |    AS fc_3
        |FROM f JOIN ab2 ON ab2.event_type = f.event_type AND f.rn = ab2.n
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val day = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("yd"))
        .localCheckpoint() // day frame: moments AND the fold read it
      val i0 = day.withColumn("rn", row_number()
        .over(Window.partitionBy("event_type").orderBy("day")).cast("long"))
      val m = i0.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("rn").cast("long").as("sx"),
          sum(col("rn") * col("rn")).cast("long").as("sxx"),
          sum("yd").cast("decimal(38,6)").as("sy"),
          sum(col("rn").cast("decimal(6,0)")
            * col("yd").cast("decimal(28,6)"))
            .cast("decimal(38,6)").as("sxy"))
      val bCol = (col("n") * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double")) /
        (col("n") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx"))
      val ab2 = m.select(col("event_type").as("et"), col("n"),
          bCol.as("b"), col("sx"), col("sy"))
        .select(col("et"), col("n"), col("b"),
          (col("sy").cast("double") / col("n")
            - col("b") * (col("sx").cast("double") / col("n"))).as("a"))
        .localCheckpoint() // 5 series rows: joins the fold input AND output
      val z = i0.join(broadcast(ab2), col("event_type") === col("et"))
        .select(col("event_type"), col("day"),
          (lit(2) * col("yd").cast("double")
            - (col("a") + col("b") * col("rn"))).as("z"))
        .as[(String, java.sql.Date, Double)]
        .repartition(col("event_type"))
        .sortWithinPartitions("event_type", "day")
        .mapPartitions { it =>
          new Iterator[(String, Long, Double)] {
            private var pending: Option[(String, java.sql.Date, Double)] =
              if (it.hasNext) Some(it.next()) else None
            def hasNext: Boolean = pending.isDefined
            def next(): (String, Long, Double) = {
              val (et, _, z0) = pending.get
              var l = z0
              var n = 1L
              pending = None
              while (pending.isEmpty && it.hasNext) {
                val r = it.next()
                if (r._1 == et) {
                  // the oracle CTE's step expression, shape-identical
                  l = 0.5 * r._3 + 0.5 * l
                  n += 1
                } else pending = Some(r)
              }
              (et, n, l)
            }
          }
        }
        .toDF("event_type", "n_days", "l")
      z.join(broadcast(ab2), col("event_type") === col("et"))
        .select(col("event_type"), col("n_days"),
          (round(col("a"), 6) + 0.0).as("trend_a"),
          (round(col("b"), 6) + 0.0).as("trend_b"),
          (round(col("l"), 6) + 0.0).as("ses_theta2"),
          (round(lit(0.5) * (col("a") + col("b") * (col("n_days") + 1))
            + lit(0.5) * col("l"), 6) + 0.0).as("fc_1"),
          (round(lit(0.5) * (col("a") + col("b") * (col("n_days") + 2))
            + lit(0.5) * col("l"), 6) + 0.0).as("fc_2"),
          (round(lit(0.5) * (col("a") + col("b") * (col("n_days") + 3))
            + lit(0.5) * col("l"), 6) + 0.0).as("fc_3"))
        .orderBy("event_type")
    },

    // ---- AR(2) fit + forecast via Yule–Walker (per series) ----
    // The autoregressive rung of the forecasting ladder (EWMA → Holt →
    // HW → AR): fit x_t = μ + φ₁(x_{t−1}−μ) + φ₂(x_{t−2}−μ) by the
    // Yule–Walker closed form — φ₁ = r₁(1−r₂)/(1−r₁²),
    // φ₂ = (r₂−r₁²)/(1−r₁²) from the biased autocovariances
    // c_k = Σ(x_t−μ)(x_{t−k}−μ) (divide-by-n convention cancels in
    // the ratios) — and read the 1-step forecast. Captures the
    // oscillation/mean-reversion Holt's monotone trend cannot. Scale
    // shape: the SAME one-shot (#series × #days) collapse as
    // q_holt_forecast; lags are per-series windows on the bounded day
    // frame; cross-moment sums accumulate as DECIMAL(28,12)-quantized
    // products of exact per-day values (order-free — identical on
    // both engines), closed-form solve on the #series-row frame.
    sql(
      "q_ar2_forecast",
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
        |           FROM events GROUP BY 1, 2),
        |mu AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mu
        |       FROM d GROUP BY 1),
        |l AS (SELECT event_type, y,
        |        lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
        |        lag(y, 2) OVER (PARTITION BY event_type ORDER BY day) AS y2,
        |        row_number() OVER (PARTITION BY event_type ORDER BY day DESC) AS rnd
        |      FROM d),
        |c AS (SELECT l.event_type, max(mu.n) AS n, max(mu.mu) AS mu,
        |        CAST(sum(CAST((y - mu.mu) * (y - mu.mu) AS DECIMAL(28,12)))
        |             AS DOUBLE) AS c0,
        |        CAST(sum(CASE WHEN y1 IS NOT NULL THEN
        |               CAST((y - mu.mu) * (y1 - mu.mu) AS DECIMAL(28,12)) END)
        |             AS DOUBLE) AS c1,
        |        CAST(sum(CASE WHEN y2 IS NOT NULL THEN
        |               CAST((y - mu.mu) * (y2 - mu.mu) AS DECIMAL(28,12)) END)
        |             AS DOUBLE) AS c2,
        |        max(CASE WHEN rnd = 1 THEN y END) AS yt,
        |        max(CASE WHEN rnd = 2 THEN y END) AS yt1
        |      FROM l JOIN mu ON mu.event_type = l.event_type GROUP BY 1),
        |r AS (SELECT event_type, n, mu, yt, yt1, c1 / c0 AS r1, c2 / c0 AS r2
        |      FROM c)
        |SELECT event_type, n AS n_days, round(mu, 6) AS mu,
        |  round(r1 * (1 - r2) / (1 - r1 * r1), 6) AS phi1,
        |  round((r2 - r1 * r1) / (1 - r1 * r1), 6) AS phi2,
        |  round(mu + r1 * (1 - r2) / (1 - r1 * r1) * (yt - mu)
        |           + (r2 - r1 * r1) / (1 - r1 * r1) * (yt1 - mu), 6) AS fc_next
        |FROM r ORDER BY event_type""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("y"))
      val mu = d.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (sum(col("y").cast("decimal(18,6)")).cast("double")
            / count(lit(1))).as("mu"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val wd = Window.partitionBy("event_type").orderBy(desc("day"))
      val l = d.select(col("event_type"), col("y"),
        lag("y", 1).over(w).as("y1"), lag("y", 2).over(w).as("y2"),
        row_number().over(wd).as("rnd"))
      def dsum(e: Column) = sum(e.cast("decimal(28,12)")).cast("double")
      val cm = l.join(mu, "event_type")
        .groupBy("event_type")
        .agg(max("n").as("n"), max("mu").as("mu"),
          dsum((col("y") - col("mu")) * (col("y") - col("mu"))).as("c0"),
          dsum(when(col("y1").isNotNull,
            (col("y") - col("mu")) * (col("y1") - col("mu")))).as("c1"),
          dsum(when(col("y2").isNotNull,
            (col("y") - col("mu")) * (col("y2") - col("mu")))).as("c2"),
          max(when(col("rnd") === 1, col("y"))).as("yt"),
          max(when(col("rnd") === 2, col("y"))).as("yt1"))
      val r1 = col("c1") / col("c0")
      val r2 = col("c2") / col("c0")
      val phi1 = r1 * (lit(1) - r2) / (lit(1) - r1 * r1)
      val phi2 = (r2 - r1 * r1) / (lit(1) - r1 * r1)
      cm.select(col("event_type"), col("n").as("n_days"),
          round(col("mu"), 6).as("mu"),
          round(phi1, 6).as("phi1"), round(phi2, 6).as("phi2"),
          round(col("mu") + phi1 * (col("yt") - col("mu"))
            + phi2 * (col("yt1") - col("mu")), 6).as("fc_next"))
        .orderBy("event_type")
    },

    // ---- RANSAC robust line fit (daily revenue trend) ----
    // Fischler & Bolles 1981, the consensus complement of Theil–Sen:
    // 32 deterministic md5-seeded day PAIRS each propose a line; the
    // line with the largest inlier consensus (|residual| ≤ τ = 25 %
    // of the mean daily level, smallest candidate id on ties) wins
    // and is REFIT by OLS on its inliers — the trend estimate a few
    // gross outlier days cannot drag, with the all-days OLS slope
    // riding for contrast. Per the repo's seeded-randomness
    // convention the samples are md5 draws keyed on the candidate id
    // (the second index drawn from n−1 values to exclude the first),
    // so the consensus search is reproducible cross-engine. Scale
    // shape: the corpus collapses ONCE to the calendar-bounded day
    // frame; the 32-candidate consensus scan is a 32-row broadcast
    // against that frame; moments are exact DECIMAL so the closed-form
    // refit is bit-identical on both engines.
    sql(
      "q_ransac_line",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |i AS (SELECT d, rev,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(rev) AS DOUBLE) / count(*) * 0.25 AS tau
        |       FROM i),
        |c0 AS (SELECT c,
        |    ('0x' || substr(md5('ra:' || CAST(c AS VARCHAR)), 1, 8))::BIGINT
        |      % (SELECT n FROM st) + 1 AS ri,
        |    ('0x' || substr(md5('rb:' || CAST(c AS VARCHAR)), 1, 8))::BIGINT
        |      % ((SELECT n FROM st) - 1) AS rj0
        |  FROM (SELECT unnest(range(0, 32)) AS c)),
        |cd AS (SELECT c, ri,
        |         CASE WHEN rj0 + 1 < ri THEN rj0 + 1 ELSE rj0 + 2 END AS rj
        |       FROM c0),
        |ln0 AS (SELECT cd.c, a.d AS xi, CAST(a.rev AS DOUBLE) AS yi,
        |          (CAST(b.rev AS DOUBLE) - CAST(a.rev AS DOUBLE))
        |            / (b.d - a.d) AS m
        |        FROM cd JOIN i a ON a.rn = cd.ri JOIN i b ON b.rn = cd.rj),
        |inl AS (SELECT l.c, CAST(count(*) AS BIGINT) AS n_inl
        |        FROM ln0 l CROSS JOIN i
        |        WHERE abs(CAST(i.rev AS DOUBLE) - (l.yi + l.m * (i.d - l.xi)))
        |              <= (SELECT tau FROM st)
        |        GROUP BY 1),
        |win AS (SELECT c, n_inl FROM (
        |          SELECT c, n_inl, row_number() OVER (ORDER BY n_inl DESC, c) AS r
        |          FROM inl) WHERE r = 1),
        |wl AS (SELECT l.* FROM ln0 l JOIN win ON win.c = l.c),
        |fit AS (SELECT CAST(count(*) AS BIGINT) AS fn,
        |          CAST(sum(i.d) AS DOUBLE) AS sx,
        |          CAST(sum(i.rev) AS DOUBLE) AS sy,
        |          CAST(sum(CAST(i.rev AS DECIMAL(30,4)) * i.d) AS DOUBLE) AS sxy,
        |          CAST(sum(i.d * i.d) AS DOUBLE) AS sxx
        |        FROM i CROSS JOIN wl
        |        WHERE abs(CAST(i.rev AS DOUBLE) - (wl.yi + wl.m * (i.d - wl.xi)))
        |              <= (SELECT tau FROM st)),
        |af AS (SELECT CAST(count(*) AS BIGINT) AS an,
        |         CAST(sum(d) AS DOUBLE) AS asx,
        |         CAST(sum(rev) AS DOUBLE) AS asy,
        |         CAST(sum(CAST(rev AS DECIMAL(30,4)) * d) AS DOUBLE) AS asxy,
        |         CAST(sum(d * d) AS DOUBLE) AS asxx
        |       FROM i)
        |SELECT (SELECT n FROM st) AS n_days, win.c AS best_candidate,
        |  win.n_inl AS n_inliers,
        |  round(CAST(win.n_inl AS DOUBLE) / (SELECT n FROM st), 6) AS inlier_share,
        |  round((fn * sxy - sx * sy) / (fn * sxx - sx * sx), 6) AS slope,
        |  round((sy - (fn * sxy - sx * sy) / (fn * sxx - sx * sx) * sx) / fn, 6)
        |    AS intercept,
        |  round((an * asxy - asx * asy) / (an * asxx - asx * asx), 6)
        |    AS ols_slope_all
        |FROM win, fit, af""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate", "o_totalprice")
      val i = daily.withColumn("rn",
        row_number().over(Window.orderBy("d")).cast("long"))
        .localCheckpoint() // calendar-bounded; feeds candidates + scans
      val st = i.agg(count(lit(1)).as("n"),
        (sum("rev").cast("double") / count(lit(1)) * 0.25).as("tau"))
        .localCheckpoint()
      val c0 = s.range(0, 32).select(col("id").as("c"))
        .crossJoin(broadcast(st))
        .select(col("c"), col("n"), col("tau"),
          (h32(concat(lit("ra:"), col("c").cast("string"))) % col("n") + 1)
            .as("ri"),
          (h32(concat(lit("rb:"), col("c").cast("string"))) % (col("n") - 1))
            .as("rj0"))
      val cd = c0.select(col("c"), col("tau"), col("ri"),
        when(col("rj0") + 1 < col("ri"), col("rj0") + 1)
          .otherwise(col("rj0") + 2).as("rj"))
      val ln0 = cd
        .join(i.select(col("rn").as("ri"), col("d").as("xi"),
          col("rev").cast("double").as("yi")), "ri")
        .join(i.select(col("rn").as("rj"), col("d").as("xj"),
          col("rev").cast("double").as("yj")), "rj")
        .select(col("c"), col("tau"), col("xi"), col("yi"),
          ((col("yj") - col("yi")) / (col("xj") - col("xi"))).as("m"))
        .localCheckpoint() // 32 lines feed the consensus scan + refit
      def resid = abs(col("rev").cast("double")
        - (col("yi") + col("m") * (col("d") - col("xi"))))
      val inl = i.crossJoin(broadcast(ln0))
        .where(resid <= col("tau"))
        .groupBy("c").agg(count(lit(1)).as("n_inl"))
      val win = inl.withColumn("r",
          row_number().over(Window.orderBy(desc("n_inl"), col("c"))))
        .where(col("r") === 1).drop("r")
        .join(ln0, "c")
        .localCheckpoint() // the winning line (1 row)
      val fit = i.crossJoin(broadcast(win))
        .where(resid <= col("tau"))
        .agg(count(lit(1)).as("fn"),
          sum("d").cast("double").as("sx"),
          sum("rev").cast("double").as("sy"),
          sum(col("rev").cast("decimal(30,4)") * col("d")).cast("double")
            .as("sxy"),
          sum(col("d") * col("d")).cast("double").as("sxx"))
      val af = i.agg(count(lit(1)).as("an"),
        sum("d").cast("double").as("asx"),
        sum("rev").cast("double").as("asy"),
        sum(col("rev").cast("decimal(30,4)") * col("d")).cast("double")
          .as("asxy"),
        sum(col("d") * col("d")).cast("double").as("asxx"))
      val slope = (col("fn") * col("sxy") - col("sx") * col("sy"))
        ./(col("fn") * col("sxx") - col("sx") * col("sx"))
      val slopeAll = (col("an") * col("asxy") - col("asx") * col("asy"))
        ./(col("an") * col("asxx") - col("asx") * col("asx"))
      win.select(col("c").as("best_candidate"), col("n_inl").as("n_inliers"))
        .crossJoin(broadcast(st.select(col("n"))))
        .crossJoin(broadcast(fit)).crossJoin(broadcast(af))
        .select(col("n").as("n_days"), col("best_candidate"),
          col("n_inliers"),
          round(col("n_inliers").cast("double") / col("n"), 6)
            .as("inlier_share"),
          round(slope, 6).as("slope"),
          round((col("sy") - slope * col("sx")) / col("fn"), 6).as("intercept"),
          round(slopeAll, 6).as("ols_slope_all"))
    },

    // ---- Granger causality (lag-1, both directions) ----
    // Granger (1969): x Granger-causes y if x's lag improves the
    // autoregressive fit of y. Lag 1 keeps the unrestricted model at
    // two features (own lag + other's lag) — EXACTLY q_ols_multi's
    // closed-form Cramer solve off one DECIMAL moment collapse — and
    // the restricted model (own lag only) falls out of the SAME
    // moments (β_r = b1/a11), so F = (RSS_r − RSS_u)/(RSS_u/(T−3))
    // costs zero extra passes. Both causal directions ride one frame:
    // the lagged day series unions into a (direction, y, x1=own lag,
    // x2=cross lag) long format and a single groupBy(direction)
    // computes all 10 moments per arm. Series = the orders calendar
    // collapse (daily revenue + order count); lags are previous
    // OBSERVED day (TPC-H dates are dense; the business-series
    // convention). The day-frame window is calendar-bounded — ≤ ~2.4k
    // rows at ANY corpus scale, the q_mann_kendall class. 100-TB
    // story: one corpus aggregation to the day frame; everything
    // after is day-frame-sized; the moment collapse makes the two
    // OLS solves free projections.
    sql(
      "q_granger_causality",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |l AS (SELECT rev, cnt,
        |        lag(rev) OVER (ORDER BY d) AS rl,
        |        lag(cnt) OVER (ORDER BY d) AS cl
        |      FROM daily),
        |f AS (SELECT rev, cnt, rl, CAST(cl AS DECIMAL(15,4)) AS cl
        |      FROM l WHERE rl IS NOT NULL),
        |dirs AS (SELECT 'orders_to_revenue' AS direction,
        |           rev AS y, rl AS x1, cl AS x2 FROM f
        |         UNION ALL
        |         SELECT 'revenue_to_orders',
        |           CAST(cnt AS DECIMAL(15,4)), cl, rl FROM f),
        |m AS (SELECT direction, count(*) AS n,
        |    sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
        |    sum(x1 * CAST(x1 AS DECIMAL(19,4))) AS s11,
        |    sum(x1 * CAST(x2 AS DECIMAL(19,4))) AS s12,
        |    sum(x2 * CAST(x2 AS DECIMAL(19,4))) AS s22,
        |    sum(x1 * CAST(y AS DECIMAL(19,4))) AS s1y,
        |    sum(x2 * CAST(y AS DECIMAL(19,4))) AS s2y,
        |    sum(y * CAST(y AS DECIMAL(19,4))) AS syy
        |  FROM dirs GROUP BY 1),
        |c AS (SELECT direction, n,
        |    CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS a11,
        |    CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a12,
        |    CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
        |      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a22,
        |    CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS b1,
        |    CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
        |      - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS b2,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS syc
        |  FROM m),
        |b AS (SELECT direction, n, a11, b1, b2, syc,
        |    (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) AS beta1,
        |    (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12) AS beta2
        |  FROM c),
        |r AS (SELECT direction, n, beta1, beta2,
        |    syc - beta1 * b1 - beta2 * b2 AS nrss_u,
        |    syc - b1 * b1 / a11 AS nrss_r,
        |    (beta1 * b1 + beta2 * b2) / syc AS r2_u,
        |    b1 * b1 / (a11 * syc) AS r2_r
        |  FROM b)
        |SELECT direction, CAST(n AS BIGINT) AS t_rows,
        |  round(beta1, 6) AS beta_own, round(beta2, 6) AS beta_cross,
        |  round(r2_r, 6) AS r2_restricted, round(r2_u, 6) AS r2_unrestricted,
        |  round((nrss_r - nrss_u) / (nrss_u / (n - 3)), 6) AS f_stat,
        |  CAST(n - 3 AS BIGINT) AS df2
        |FROM r ORDER BY direction""".stripMargin) { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(dayNum(col("o_orderdate")).as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(15,4)").as("rev"),
          count(lit(1)).as("cnt"))
      // calendar-bounded single-partition window (q_mann_kendall class)
      val w = Window.orderBy("d")
      val f = daily
        .select(col("rev"), col("cnt"),
          lag("rev", 1).over(w).as("rl"),
          lag("cnt", 1).over(w).cast("decimal(15,4)").as("cl"))
        .where(col("rl").isNotNull)
      val dirs = f.select(lit("orders_to_revenue").as("direction"),
          col("rev").as("y"), col("rl").as("x1"), col("cl").as("x2"))
        .unionByName(f.select(lit("revenue_to_orders").as("direction"),
          col("cnt").cast("decimal(15,4)").as("y"),
          col("cl").as("x1"), col("rl").as("x2")))
      val d19 = (c: Column) => c.cast("decimal(19,4)")
      val m = dirs.groupBy("direction")
        .agg(count(lit(1)).as("n"),
          sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
          sum(col("x1") * d19(col("x1"))).as("s11"),
          sum(col("x1") * d19(col("x2"))).as("s12"),
          sum(col("x2") * d19(col("x2"))).as("s22"),
          sum(col("x1") * d19(col("y"))).as("s1y"),
          sum(col("x2") * d19(col("y"))).as("s2y"),
          sum(col("y") * d19(col("y"))).as("syy"))
      val dbl = (n: String) => col(n).cast("double")
      val nD = dbl("n")
      val a11 = nD * dbl("s11") - dbl("s1") * dbl("s1")
      val a12 = nD * dbl("s12") - dbl("s1") * dbl("s2")
      val a22 = nD * dbl("s22") - dbl("s2") * dbl("s2")
      val b1 = nD * dbl("s1y") - dbl("s1") * dbl("sy")
      val b2 = nD * dbl("s2y") - dbl("s2") * dbl("sy")
      val syc = nD * dbl("syy") - dbl("sy") * dbl("sy")
      val det = a11 * a22 - a12 * a12
      val r = m.select(col("direction"), col("n"),
        a11.as("a11"), b1.as("b1"), b2.as("b2"), syc.as("syc"),
        ((b1 * a22 - b2 * a12) / det).as("beta1"),
        ((a11 * b2 - a12 * b1) / det).as("beta2"))
      val nrssU = col("syc") - col("beta1") * col("b1") -
        col("beta2") * col("b2")
      val nrssR = col("syc") - col("b1") * col("b1") / col("a11")
      r.select(col("direction"), col("n").cast("long").as("t_rows"),
          round(col("beta1"), 6).as("beta_own"),
          round(col("beta2"), 6).as("beta_cross"),
          round(col("b1") * col("b1") / (col("a11") * col("syc")), 6)
            .as("r2_restricted"),
          round((col("beta1") * col("b1") + col("beta2") * col("b2"))
            / col("syc"), 6).as("r2_unrestricted"),
          round((nrssR - nrssU) / (nrssU / (col("n").cast("double") - 3)), 6)
            .as("f_stat"),
          (col("n") - 3).cast("long").as("df2"))
        .orderBy("direction")
    },

    // ---- Page–Hinkley drift detector (per-type daily volumes) ----
    // Page (1954) / Hinkley (1971), the ONLINE mean-shift detector the
    // stream-mining libraries (MOA, river) ship: unlike
    // q_changepoint_cusum (which references the series' GLOBAL μ/σ —
    // unknowable online), PH tracks m_t = Σ(x_i − x̄_i − δ) against its
    // running minimum, needing only O(1) state per series — which is
    // why it gets a streaming twin ([[graft.streaming.PageHinkleyStream]],
    // the 18th batch/stream pair). Batch form: the recurrence is
    // window-expressible with NO recursion — x̄_i = S_i/i off the exact
    // BIGINT prefix sum, m = the ORDERED cumulative sum of
    // (x_i − x̄_i), PH = m − running-min(m); ordered accumulation is
    // sequential in BOTH engines, so the doubles agree bitwise.
    // Alarm threshold λ = 5·√(burn-in mean) — Poisson-scaled from the
    // first 10 days per series, so the query is scale-factor-portable
    // (volumes 10× → λ √10×); alarms only score past the burn-in.
    // 100-TB story: one corpus aggregation to (type, day) counts;
    // every window runs per-type on ≤ calendar-bounded frames.
    sql(
      "q_page_hinkley",
      """WITH dd AS (SELECT event_type AS ty,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |o AS (SELECT ty, d, c,
        |        CAST(row_number() OVER w AS BIGINT) AS t,
        |        CAST(sum(c) OVER w AS BIGINT) AS s
        |      FROM dd WINDOW w AS (PARTITION BY ty ORDER BY d)),
        |c2 AS (SELECT ty, d, t,
        |         c - CAST(s AS DOUBLE) / t AS cterm FROM o),
        |m0 AS (SELECT ty, d, t,
        |         sum(cterm) OVER (PARTITION BY ty ORDER BY d) AS m FROM c2),
        |ph0 AS (SELECT ty, d, t, m,
        |         m - min(m) OVER (PARTITION BY ty ORDER BY d) AS ph FROM m0),
        |lam AS (SELECT ty, 5.0e0 * sqrt(CAST(s AS DOUBLE) / 10) AS lambda
        |        FROM o WHERE t = 10),
        |a AS (SELECT ph0.ty, lam.lambda,
        |        CAST(count(*) AS BIGINT) AS n_days,
        |        CAST(sum(CASE WHEN t > 10 AND ph > lambda
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
        |        CAST(coalesce(min(CASE WHEN t > 10 AND ph > lambda
        |                          THEN d END), -1) AS BIGINT) AS first_alarm_d,
        |        max(ph) AS max_ph
        |      FROM ph0 JOIN lam ON lam.ty = ph0.ty GROUP BY 1, 2)
        |SELECT ty AS event_type, n_days, round(lambda, 6) AS lambda,
        |  n_alarms, first_alarm_d, round(max_ph, 6) AS max_ph
        |FROM a ORDER BY event_type""".stripMargin) { (s, dir) =>
      val dd = t(s, dir, "events")
        .groupBy(col("event_type").as("ty"), dayNum(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("ty").orderBy("d")
      val o = dd.select(col("ty"), col("d"), col("c"),
          row_number().over(w).cast("long").as("t"),
          sum("c").over(w).cast("long").as("s"))
        .localCheckpoint() // feeds the PH walk AND the burn-in scalar
      val m0 = o.select(col("ty"), col("d"), col("t"),
        (col("c") - col("s").cast("double") / col("t")).as("cterm"))
        .withColumn("m", sum("cterm").over(w))
      val ph0 = m0.withColumn("ph", col("m") - min("m").over(w))
      val lam = o.where(col("t") === 10)
        .select(col("ty"),
          (lit(5.0) * sqrt(col("s").cast("double") / 10)).as("lambda"))
      val alarm = col("t") > 10 && col("ph") > col("lambda")
      ph0.join(broadcast(lam), "ty")
        .groupBy("ty", "lambda")
        .agg(count(lit(1)).as("n_days"),
          sum(when(alarm, 1L).otherwise(0L)).cast("long").as("n_alarms"),
          coalesce(min(when(alarm, col("d"))), lit(-1L)).cast("long")
            .as("first_alarm_d"),
          max("ph").as("max_ph"))
        .select(col("ty").as("event_type"), col("n_days"),
          round(col("lambda"), 6).as("lambda"), col("n_alarms"),
          col("first_alarm_d"), round(col("max_ph"), 6).as("max_ph"))
        .orderBy("event_type")
    },

    // ---- rolling-origin forecast backtest (one-step, 3 baselines) ----
    // The M-competition evaluation discipline applied to the daily
    // revenue series: every forecaster is scored on ROLLING one-step
    // forecasts (each day predicted using only its past), not on an
    // in-sample fit — the eval a forecasting platform runs before any
    // model ships. Three window-expressible baselines: naive (carry
    // yesterday), seasonal-naive (carry the value 7 days back), and
    // the 7-day rolling mean. The error ALGEBRA stays exact DECIMAL —
    // naive/snaive errors are DECIMAL(15,4) differences, and the
    // rolling-mean error is kept ×7 (7·y_t − S7, exactly integral in
    // quarter-scale) then un-scaled only inside the final double
    // metrics — so MAE/RMSE accumulate as exact DECIMAL sums,
    // order-independent at any parallelism, and MASE (the
    // scale-free skill score vs naive, Hyndman & Koehler 2006) is a
    // pure 1-row projection. All models score only where every model
    // is defined (day ≥ 8 of the series) so the comparison is fair.
    // 100-TB story: one corpus collapse to the calendar-bounded day
    // frame; lags/windows are per-frame; metrics are 3-row math.
    sql(
      "q_forecast_backtest",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |l AS (SELECT d, rev,
        |        CAST(row_number() OVER w AS BIGINT) AS t,
        |        lag(rev, 1) OVER w AS l1,
        |        lag(rev, 7) OVER w AS l7,
        |        sum(rev) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING
        |                       AND 1 PRECEDING) AS s7
        |      FROM daily WINDOW w AS (ORDER BY d)),
        |e AS (SELECT rev - l1 AS e_naive, rev - l7 AS e_snaive,
        |        7 * rev - s7 AS e_rm7_x7
        |      FROM l WHERE t >= 8),
        |m AS (SELECT 'naive' AS model, count(*) AS n,
        |        sum(abs(e_naive)) AS sae,
        |        sum(e_naive * CAST(e_naive AS DECIMAL(19,4))) AS sse,
        |        1 AS scale FROM e
        |      UNION ALL
        |      SELECT 'snaive7', count(*), sum(abs(e_snaive)),
        |        sum(e_snaive * CAST(e_snaive AS DECIMAL(19,4))), 1 FROM e
        |      UNION ALL
        |      SELECT 'rollmean7', count(*), sum(abs(e_rm7_x7)),
        |        sum(e_rm7_x7 * CAST(e_rm7_x7 AS DECIMAL(19,4))), 7 FROM e),
        |nv AS (SELECT CAST(sae AS DOUBLE) / n AS mae_naive FROM m
        |       WHERE model = 'naive')
        |SELECT model, CAST(n AS BIGINT) AS n_evals,
        |  round(CAST(sae AS DOUBLE) / scale / n, 6) AS mae,
        |  round(sqrt(CAST(sse AS DOUBLE) / (CAST(scale AS DOUBLE) * scale)
        |    / n), 6) AS rmse,
        |  round(CAST(sae AS DOUBLE) / scale / n / mae_naive, 6) AS mase
        |FROM m CROSS JOIN nv ORDER BY model""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      // calendar-bounded single-partition windows (q_mann_kendall class)
      val w = Window.orderBy("d")
      val l = daily.select(col("d"), col("rev"),
          row_number().over(w).cast("long").as("t"),
          lag("rev", 1).over(w).as("l1"),
          lag("rev", 7).over(w).as("l7"),
          sum("rev").over(w.rowsBetween(-7, -1)).as("s7"))
        .where(col("t") >= 8)
        .select((col("rev") - col("l1")).as("e_naive"),
          (col("rev") - col("l7")).as("e_snaive"),
          (col("rev") * 7 - col("s7")).as("e_rm7_x7"))
        .localCheckpoint() // error frame, read by three model arms
      def arm(model: String, e: String, scale: Int) =
        l.agg(count(lit(1)).as("n"),
          sum(abs(col(e))).as("sae"),
          sum(col(e) * col(e).cast("decimal(19,4)")).as("sse"))
          .select(lit(model).as("model"), col("n"), col("sae"), col("sse"),
            lit(scale).as("scale"))
      val m = arm("naive", "e_naive", 1)
        .unionByName(arm("snaive7", "e_snaive", 1))
        .unionByName(arm("rollmean7", "e_rm7_x7", 7))
        .localCheckpoint() // 3-row metric frame
      val nv = m.where(col("model") === "naive")
        .select((col("sae").cast("double") / col("n")).as("mae_naive"))
      val saeD = col("sae").cast("double")
      m.crossJoin(broadcast(nv))
        .select(col("model"), col("n").cast("long").as("n_evals"),
          round(saeD / col("scale") / col("n"), 6).as("mae"),
          round(sqrt(col("sse").cast("double")
            / (col("scale").cast("double") * col("scale")) / col("n")), 6)
            .as("rmse"),
          round(saeD / col("scale") / col("n") / col("mae_naive"), 6)
            .as("mase"))
        .orderBy("model")
    },

    // ---- Croston's method (intermittent demand, per part) ----
    // Croston (1972), the forecaster the smooth-series ladder
    // (EWMA/Holt/AR2/Kalman) is WRONG for: a part that sells 30 days
    // out of 2 400 has a demand process that is mostly zeros, and
    // exponential smoothing of the raw series decays toward zero
    // between orders. Croston smooths TWO series instead — nonzero
    // demand sizes z and inter-arrival intervals p (α = 0.2, seeds
    // z₁ = q₁ and p₁ = days-to-first-demand) — and forecasts z/p
    // demand per period; the Syntetos–Boylan (2005) bias-corrected
    // (1 − α/2)·z/p rides next to it. Execution is the per-series
    // secondary-sort fold (the q_holt_forecast/q_kalman_1d shape:
    // repartition by part, in-partition sort, one sequential pass,
    // zero per-group buffering) and the oracle is the per-part
    // recursive CTE stepping occurrence rank — recursion DEPTH is the
    // max occurrences per part, which replication leaves CONSTANT
    // (new parts, not longer histories). 100-TB story: one corpus
    // collapse to (part, day) demands, then embarrassingly parallel
    // per-part folds.
    sql(
      "q_croston",
      """WITH RECURSIVE mn AS (SELECT min(CAST(l_shipdate AS DATE)) AS d0
        |  FROM lineitem),
        |d AS (SELECT l_partkey AS part,
        |        date_diff('day', mn.d0, CAST(l_shipdate AS DATE)) + 1 AS off,
        |        CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS q
        |      FROM lineitem CROSS JOIN mn GROUP BY 1, 2),
        |i AS (SELECT part, q,
        |        CAST(off - coalesce(lag(off) OVER
        |          (PARTITION BY part ORDER BY off), 0) AS DOUBLE) AS iv,
        |        CAST(row_number() OVER (PARTITION BY part ORDER BY off)
        |             AS BIGINT) AS rn
        |      FROM d),
        |n AS (SELECT part, CAST(count(*) AS BIGINT) AS n_occ FROM i GROUP BY 1),
        |f AS (SELECT part, rn, q AS z, iv AS p FROM i WHERE rn = 1
        |      UNION ALL
        |      SELECT i.part, i.rn,
        |             0.2 * i.q + 0.8 * f.z,
        |             0.2 * i.iv + 0.8 * f.p
        |      FROM f JOIN i ON i.part = f.part AND i.rn = f.rn + 1)
        |SELECT f.part AS part, n.n_occ,
        |       round(f.z, 6) AS size_z, round(f.p, 6) AS interval_p,
        |       round(f.z / f.p, 6) AS fc_croston,
        |       round(0.9 * (f.z / f.p), 6) AS fc_sba
        |FROM f JOIN n ON n.part = f.part AND f.rn = n.n_occ
        |ORDER BY f.part""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val mn = li.agg(min(to_date(col("l_shipdate"))).as("d0"))
      li.crossJoin(broadcast(mn))
        .groupBy(col("l_partkey").as("part"),
          (datediff(to_date(col("l_shipdate")), col("d0")) + 1).as("off"))
        .agg(sum(col("l_quantity").cast("long")).cast("double").as("q"))
        .select(col("part"), col("off").cast("long"), col("q"))
        .as[(Long, Long, Double)]
        .repartition(col("part"))
        .sortWithinPartitions("part", "off")
        .mapPartitions { it =>
          new Iterator[(Long, Long, Double, Double)] {
            private var pending: Option[(Long, Long, Double)] =
              if (it.hasNext) Some(it.next()) else None
            def hasNext: Boolean = pending.isDefined
            def next(): (Long, Long, Double, Double) = {
              val (part, off0, q0) = pending.get
              // seeds: z = first size, p = days to first demand —
              // shape-identical to the oracle CTE's anchor row
              var z = q0
              var p = off0.toDouble
              var prev = off0
              var n = 1L
              pending = None
              while (pending.isEmpty && it.hasNext) {
                val r = it.next()
                if (r._1 == part) {
                  z = 0.2 * r._3 + 0.8 * z
                  p = 0.2 * (r._2 - prev).toDouble + 0.8 * p
                  prev = r._2
                  n += 1
                } else pending = Some(r)
              }
              (part, n, z, p)
            }
          }
        }
        .toDF("part", "n_occ", "z", "p")
        .select(col("part"), col("n_occ"),
          round(col("z"), 6).as("size_z"),
          round(col("p"), 6).as("interval_p"),
          round(col("z") / col("p"), 6).as("fc_croston"),
          round(lit(0.9) * (col("z") / col("p")), 6).as("fc_sba"))
        .orderBy("part")
    },

    // ---- Cook's distance (influential-observation audit) ----
    // The diagnostic behind "which days are driving this trend line":
    // for the daily-revenue-on-day OLS, Cook's D_i = e_i²·h_i /
    // (p·s²·(1−h_i)²) combines residual size with leverage h_i = 1/n +
    // (d_i−d̄)²/S_dd — a point can be influential by being extreme in
    // EITHER. Top-10 by D, with residual and leverage riding, is the
    // "remove-and-refit" shortlist q_ransac_line's consensus and
    // q_theil_sen's median slope defend against wholesale. Exact
    // moments (the ransac af pattern); s² accumulates as per-term
    // HUNDREDTH-rounded BIGINTs so the only cross-engine-fragile
    // double sum is order-independent by construction (the
    // q_pps_sampling trick). 100-TB story: one corpus collapse to the
    // calendar-bounded day frame; everything after is frame-side.
    sql(
      "q_cooks_distance",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(d) AS DOUBLE) AS sx,
        |         CAST(sum(rev) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(rev AS DECIMAL(30,4)) * d) AS DOUBLE) AS sxy,
        |         CAST(sum(d * d) AS DOUBLE) AS sxx
        |       FROM daily),
        |fit AS (SELECT n, sx, sxx,
        |          (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
        |          (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
        |            AS a
        |        FROM mo),
        |r AS (SELECT daily.d, CAST(daily.rev AS DOUBLE) AS rev,
        |        CAST(daily.rev AS DOUBLE) - (f.a + f.b * daily.d) AS e,
        |        1.0e0 / f.n
        |          + (daily.d - f.sx / f.n) * (daily.d - f.sx / f.n)
        |            / (f.sxx - f.sx * f.sx / f.n) AS h,
        |        f.n
        |      FROM daily CROSS JOIN fit f),
        |s2 AS (SELECT sum(CAST(round(e * e) AS DECIMAL(28,0))) AS sse_u
        |       FROM r)
        |SELECT d AS day_num, round(rev, 4) AS rev,
        |  round(e, 4) AS residual, round(h, 6) AS leverage,
        |  round(e * e * h
        |        / (2.0e0 * (CAST(sse_u AS DOUBLE) / (n - 2))
        |           * (1 - h) * (1 - h)), 6) AS cooks_d
        |FROM r CROSS JOIN s2
        |ORDER BY cooks_d DESC, day_num LIMIT 10""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val mo = daily.agg(count(lit(1)).as("n"),
        sum("d").cast("double").as("sx"),
        sum("rev").cast("double").as("sy"),
        sum(col("rev").cast("decimal(30,4)") * col("d")).cast("double")
          .as("sxy"),
        sum(col("d") * col("d")).cast("double").as("sxx"))
      val b = (col("n") * col("sxy") - col("sx") * col("sy"))
        ./(col("n") * col("sxx") - col("sx") * col("sx"))
      val fit = mo.select(col("n"), col("sx"), col("sxx"), b.as("b"),
        ((col("sy") - b * col("sx")) / col("n")).as("a"))
        .localCheckpoint() // 1-row fit frame, read by two passes
      val r = daily.crossJoin(broadcast(fit))
        .select(col("d"), col("rev").cast("double").as("rev"),
          (col("rev").cast("double") - (col("a") + col("b") * col("d")))
            .as("e"),
          (lit(1.0) / col("n")
            + (col("d") - col("sx") / col("n"))
              * (col("d") - col("sx") / col("n"))
              / (col("sxx") - col("sx") * col("sx") / col("n"))).as("h"),
          col("n"))
        .localCheckpoint() // day frame with residuals, read twice
      // unit-rounded terms summed as DECIMAL: a BIGINT sum overflowed
      // at the 10x corpus (e^2 ~ 1e16 per day there)
      val s2 = r.agg(sum(round(col("e") * col("e")).cast("decimal(28,0)"))
        .as("sse_u"))
      r.crossJoin(broadcast(s2))
        .select(col("d").as("day_num"), round(col("rev"), 4).as("rev"),
          round(col("e"), 4).as("residual"),
          round(col("h"), 6).as("leverage"),
          round(col("e") * col("e") * col("h")
            / (lit(2.0) * (col("sse_u").cast("double") / (col("n") - 2))
              * (lit(1) - col("h")) * (lit(1) - col("h"))), 6).as("cooks_d"))
        .orderBy(desc("cooks_d"), col("day_num"))
        .limit(10)
    },

    // ---- Durbin–Watson statistic (residual autocorrelation) ----
    // The companion diagnostic: a trend line over a day series with
    // autocorrelated residuals has UNDERSTATED standard errors — DW =
    // Σ(e_t − e_{t−1})²/Σe_t² near 2 means independent residuals,
    // toward 0 positive autocorrelation (ρ̂ ≈ 1 − DW/2 rides). Same
    // daily OLS as q_cooks_distance; both residual sums accumulate as
    // per-term hundredth-rounded BIGINTs (order-independent), the lag
    // runs on the calendar-bounded ordered day frame, and the only
    // doubles are the final ratio. 100-TB story: one corpus collapse
    // to the day frame.
    sql(
      "q_durbin_watson",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(d) AS DOUBLE) AS sx,
        |         CAST(sum(rev) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(rev AS DECIMAL(30,4)) * d) AS DOUBLE) AS sxy,
        |         CAST(sum(d * d) AS DOUBLE) AS sxx
        |       FROM daily),
        |r AS (SELECT d,
        |        CAST(rev AS DOUBLE)
        |          - ((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
        |             + (n * sxy - sx * sy) / (n * sxx - sx * sx) * d) AS e
        |      FROM daily CROSS JOIN mo),
        |l AS (SELECT e, lag(e) OVER (ORDER BY d) AS ep FROM r),
        |a AS (SELECT
        |    sum(CAST(round(e * e) AS DECIMAL(28,0))) AS sse_u,
        |    sum(CASE WHEN ep IS NULL THEN CAST(0 AS DECIMAL(28,0))
        |             ELSE CAST(round((e - ep) * (e - ep)) AS DECIMAL(28,0))
        |             END) AS sdiff_u,
        |    CAST(count(*) AS BIGINT) AS n_days
        |  FROM l)
        |SELECT n_days,
        |  round(CAST(sdiff_u AS DOUBLE) / CAST(sse_u AS DOUBLE), 6) AS dw,
        |  round(1 - CAST(sdiff_u AS DOUBLE) / CAST(sse_u AS DOUBLE) / 2, 6)
        |    AS rho_approx
        |FROM a""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val mo = daily.agg(count(lit(1)).as("n"),
        sum("d").cast("double").as("sx"),
        sum("rev").cast("double").as("sy"),
        sum(col("rev").cast("decimal(30,4)") * col("d")).cast("double")
          .as("sxy"),
        sum(col("d") * col("d")).cast("double").as("sxx"))
      val b = (col("n") * col("sxy") - col("sx") * col("sy"))
        ./(col("n") * col("sxx") - col("sx") * col("sx"))
      val r = daily.crossJoin(broadcast(mo))
        .select(col("d"),
          (col("rev").cast("double")
            - ((col("sy") - b * col("sx")) / col("n") + b * col("d")))
            .as("e"))
      val l = r.withColumn("ep", lag("e", 1).over(Window.orderBy("d")))
      // unit-rounded DECIMAL sums (the q_cooks_distance overflow fix)
      l.agg(
          sum(round(col("e") * col("e")).cast("decimal(28,0)")).as("sse_u"),
          sum(when(col("ep").isNull, lit(0).cast("decimal(28,0)"))
            .otherwise(round((col("e") - col("ep"))
              * (col("e") - col("ep"))).cast("decimal(28,0)")))
            .as("sdiff_u"),
          count(lit(1)).as("n_days"))
        .select(col("n_days"),
          round(col("sdiff_u").cast("double") / col("sse_u").cast("double"),
            6).as("dw"),
          round(lit(1) - col("sdiff_u").cast("double")
            / col("sse_u").cast("double") / 2, 6).as("rho_approx"))
    },

    // ---- matrix profile: motifs & discords (w = 7 days) ----
    // Yeh et al. (ICDM 2016): the all-pairs z-normalized subsequence
    // distance profile — its minima are MOTIFS (the series' most
    // repeated weekly shape) and the maxima of each subsequence's
    // nearest-neighbor distance are DISCORDS (the week least like any
    // other: the anomaly-hunting primitive q_anomaly_* point tests
    // can't give, because a discord is only anomalous as a SHAPE).
    // Exact-friendly construction: each length-7 window carries its
    // seven lead values as explicit columns, so the cross dot product
    // is a fixed 7-term expression (identical association order in
    // both engines — no array codepath divergence), window moments
    // come from exact DECIMAL sums, and the z-distance uses the
    // closed form d² = 2w(1 − (q − wμaμb)/(wσaσb)), clamped and
    // rounded to 6dp BEFORE ranking so cross-engine ulps can't flip
    // the argmin. The pair join is calendar-bounded (≤ ~2.4k² / 2
    // pairs at ANY corpus scale — the q_mann_kendall class, with a
    // 7-day exclusion zone so trivial self-overlaps don't fake
    // motifs). 100-TB story: one corpus collapse to the day frame;
    // the profile is frame-side and scale-constant.
    sql(
      "q_matrix_profile",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT d, rev,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |v0 AS (SELECT rn, d, rev AS l0,
        |        lead(rev, 1) OVER w AS l1, lead(rev, 2) OVER w AS l2,
        |        lead(rev, 3) OVER w AS l3, lead(rev, 4) OVER w AS l4,
        |        lead(rev, 5) OVER w AS l5, lead(rev, 6) OVER w AS l6
        |      FROM o WINDOW w AS (ORDER BY rn)),
        |v AS (SELECT rn, d,
        |        CAST(l0 AS DOUBLE) AS x0, CAST(l1 AS DOUBLE) AS x1,
        |        CAST(l2 AS DOUBLE) AS x2, CAST(l3 AS DOUBLE) AS x3,
        |        CAST(l4 AS DOUBLE) AS x4, CAST(l5 AS DOUBLE) AS x5,
        |        CAST(l6 AS DOUBLE) AS x6,
        |        CAST(l0 + l1 + l2 + l3 + l4 + l5 + l6 AS DOUBLE) / 7 AS mu,
        |        greatest(sqrt(CAST(l0 * CAST(l0 AS DECIMAL(19,4))
        |              + l1 * CAST(l1 AS DECIMAL(19,4))
        |              + l2 * CAST(l2 AS DECIMAL(19,4))
        |              + l3 * CAST(l3 AS DECIMAL(19,4))
        |              + l4 * CAST(l4 AS DECIMAL(19,4))
        |              + l5 * CAST(l5 AS DECIMAL(19,4))
        |              + l6 * CAST(l6 AS DECIMAL(19,4)) AS DOUBLE) / 7
        |             - (CAST(l0 + l1 + l2 + l3 + l4 + l5 + l6 AS DOUBLE) / 7)
        |               * (CAST(l0 + l1 + l2 + l3 + l4 + l5 + l6 AS DOUBLE) / 7)),
        |          1e-9) AS sg
        |      FROM v0 WHERE l6 IS NOT NULL),
        |p AS (SELECT a.rn AS ai, b.rn AS bi, a.d AS da, b.d AS db,
        |        round(greatest(
        |          14 * (1 - ((a.x0 * b.x0 + a.x1 * b.x1 + a.x2 * b.x2
        |                      + a.x3 * b.x3 + a.x4 * b.x4 + a.x5 * b.x5
        |                      + a.x6 * b.x6) - 7 * a.mu * b.mu)
        |                    / (7 * a.sg * b.sg)), 0), 6) AS d2
        |      FROM v a JOIN v b ON b.rn >= a.rn + 7),
        |mot AS (SELECT 'motif' AS kind,
        |          CAST(row_number() OVER (ORDER BY d2, ai, bi) AS BIGINT)
        |            AS rank,
        |          da AS day_i, db AS day_j, d2
        |        FROM p ORDER BY d2, ai, bi LIMIT 3),
        |u AS (SELECT ai AS i, da AS di, bi AS j, db AS dj, d2 FROM p
        |      UNION ALL
        |      SELECT bi, db, ai, da, d2 FROM p),
        |nn AS (SELECT i, di, min(d2) AS nnd FROM u GROUP BY 1, 2),
        |dsc0 AS (SELECT nn.i, nn.di, nn.nnd,
        |           min(u.dj) AS dj
        |         FROM nn JOIN u ON u.i = nn.i AND u.d2 = nn.nnd
        |         GROUP BY 1, 2, 3),
        |dsc AS (SELECT 'discord' AS kind,
        |          CAST(row_number() OVER (ORDER BY nnd DESC, i) AS BIGINT)
        |            AS rank,
        |          di AS day_i, dj AS day_j, nnd AS d2
        |        FROM dsc0 ORDER BY nnd DESC, i LIMIT 3)
        |SELECT kind, rank, day_i, day_j, round(sqrt(d2), 6) AS z_dist
        |FROM (SELECT * FROM mot UNION ALL SELECT * FROM dsc)
        |ORDER BY kind, rank""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val w = Window.orderBy("rn")
      val o = daily.withColumn("rn",
        row_number().over(Window.orderBy("d")).cast("long"))
      val ls = (1 to 6).map(k => lead("rev", k).over(w).as(s"l$k"))
      val v0 = o.select(Seq(col("rn"), col("d"), col("rev").as("l0"))
        ++ ls: _*)
      val sumL = (0 to 6).map(k => col(s"l$k")).reduce(_ + _)
      val s2 = (0 to 6).map(k =>
        col(s"l$k") * col(s"l$k").cast("decimal(19,4)")).reduce(_ + _)
      val mu = sumL.cast("double") / 7
      val v = v0.where(col("l6").isNotNull)
        .select(Seq(col("rn"), col("d")) ++
          (0 to 6).map(k => col(s"l$k").cast("double").as(s"x$k")) ++
          Seq(mu.as("mu"),
            // sg = 0 on a constant week would give d2 = NaN and could
            // mask a discord (r10 ADVICE); clamp identically both sides
            greatest(sqrt(s2.cast("double") / 7 - mu * mu), lit(1e-9))
              .as("sg")): _*)
        .localCheckpoint() // subsequence frame, both sides of the join
      val a = v.columns.foldLeft(v)((df, c) => df.withColumnRenamed(c, s"a_$c"))
      val b = v.columns.foldLeft(v)((df, c) => df.withColumnRenamed(c, s"b_$c"))
      val q = (0 to 6).map(k => col(s"a_x$k") * col(s"b_x$k")).reduce(_ + _)
      val d2 = round(greatest(
        lit(14) * (lit(1) - (q - lit(7) * col("a_mu") * col("b_mu"))
          / (lit(7) * col("a_sg") * col("b_sg"))), lit(0)), 6)
      val p = a.join(b, col("b_rn") >= col("a_rn") + 7)
        .select(col("a_rn").as("ai"), col("b_rn").as("bi"),
          col("a_d").as("da"), col("b_d").as("db"), d2.as("d2"))
        .localCheckpoint() // pair frame: motifs + both discord passes
      val mot = p.orderBy(col("d2"), col("ai"), col("bi")).limit(3)
        .select(lit("motif").as("kind"),
          row_number().over(Window.orderBy(col("d2"), col("ai"), col("bi")))
            .cast("long").as("rank"),
          col("da").as("day_i"), col("db").as("day_j"), col("d2"))
      // r13 optimization (guide §2.4): the old discord pass
      // checkpointed the DOUBLED pair frame (2× ~2.9M rows) and then
      // re-joined it against its own per-i min to recover the argmin
      // neighbor. min(struct(d2, dj)) is the lexicographic minimum —
      // (min d2, then min dj among the min-d2 achievers) — exactly the
      // old two-step's tie rule, in ONE aggregation with map-side
      // partials and no materialization of the doubled frame.
      val u = p.select(col("ai").as("i"), col("da").as("di"),
          col("db").as("dj"), col("d2"))
        .unionByName(p.select(col("bi").as("i"), col("db").as("di"),
          col("da").as("dj"), col("d2")))
      val dsc0 = u.groupBy(col("i").as("i2"), col("di").as("ndi"))
        .agg(min(struct(col("d2"), col("dj"))).as("mn"))
        .select(col("i2"), col("ndi"), col("mn.d2").as("nnd"),
          col("mn.dj").as("dj"))
      val dsc = dsc0.orderBy(desc("nnd"), col("i2")).limit(3)
        .select(lit("discord").as("kind"),
          row_number().over(Window.orderBy(desc("nnd"), col("i2")))
            .cast("long").as("rank"),
          col("ndi").as("day_i"), col("dj").as("day_j"),
          col("nnd").as("d2"))
      mot.unionByName(dsc)
        .select(col("kind"), col("rank"), col("day_i"), col("day_j"),
          round(sqrt(col("d2")), 6).as("z_dist"))
        .orderBy("kind", "rank")
    },

    // ---- Ljung–Box portmanteau test (autocorrelation up to lag 7) ----
    // Ljung & Box (1978): the residual-whiteness test every fitted
    // forecast model (holt/theta/ar2/kalman up-ladder) should be
    // followed by — Q(m) = n(n+2)·Σ_{k≤m} r_k²/(n−k), here over the
    // raw daily revenue series so the test doubles as the "is there
    // ANY linear structure" screen. Unlike q_autocorr's per-lag
    // pairwise Pearson, r_k is the Box–Jenkins ACF: GLOBAL mean and a
    // COMMON denominator Σ(y−ȳ)², the convention Q's χ² calibration
    // assumes. Exactness: y in micro-unit BIGINT; lagged cross sums
    // C_k, head/tail sums H_k/T_k, and the global moments are exact
    // (DECIMAL(38,0) pairings); r_k assembles in doubles with explicit
    // association, and Q accumulates over the ORDERED 7-row lag frame
    // (ordered accumulation — the q_page_hinkley parity argument).
    // Each output row is the valid LB test at max-lag k, so the 7-row
    // table is the whole test family. 100-TB story: one corpus
    // collapse to the day frame; 7 lag self-joins on that bounded
    // frame; everything downstream is a 7-row projection.
    sql(
      "q_ljung_box",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT CAST(rev * 10000 AS BIGINT) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(y) AS DECIMAL(38,0)) AS sy,
        |        CAST(sum(y * CAST(y AS DECIMAL(28,0))) AS DECIMAL(38,0))
        |          AS syy
        |      FROM o),
        |lags AS (SELECT unnest(generate_series(1, 7)) AS k),
        |p AS (SELECT l.k AS k,
        |        CAST(count(*) AS BIGINT) AS npair,
        |        CAST(sum(a.y * CAST(b.y AS DECIMAL(28,0))) AS DECIMAL(38,0))
        |          AS ck,
        |        CAST(sum(a.y) AS DECIMAL(38,0)) AS hk,
        |        CAST(sum(b.y) AS DECIMAL(38,0)) AS tk
        |      FROM o a CROSS JOIN lags l
        |      JOIN o b ON b.rn = a.rn + l.k
        |      GROUP BY 1),
        |r AS (SELECT p.k, p.npair, g.n,
        |        (CAST(p.ck AS DOUBLE)
        |           - (CAST(g.sy AS DOUBLE) / g.n)
        |             * (CAST(p.hk AS DOUBLE) + CAST(p.tk AS DOUBLE))
        |           + (g.n - p.k) * ((CAST(g.sy AS DOUBLE) / g.n)
        |             * (CAST(g.sy AS DOUBLE) / g.n)))
        |        / (CAST(g.syy AS DOUBLE)
        |           - (CAST(g.sy AS DOUBLE) * CAST(g.sy AS DOUBLE)) / g.n)
        |          AS rk
        |      FROM p CROSS JOIN g),
        |q AS (SELECT k, npair, n, rk,
        |        n * (n + 2.0e0) * sum((rk * rk) / (n - k))
        |          OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS lbq
        |      FROM r)
        |SELECT k, npair AS n_pairs, n AS n_days,
        |  round(rk, 6) + 0.0 AS acf,
        |  round(lbq, 6) + 0.0 AS lb_q,
        |  CAST(k AS BIGINT) AS df
        |FROM q ORDER BY k""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val o = daily
        .select((col("rev") * 10000).cast("long").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
        .localCheckpoint() // day frame: global moments + 7 lag joins
      val g = o.agg(count(lit(1)).as("n"),
        sum("y").cast("decimal(38,0)").as("sy"),
        sum(col("y") * col("y").cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("syy"))
      val a = o.withColumn("k", explode(sequence(lit(1L), lit(7L))))
        .select(col("k"), col("rn"), col("y").as("ya"))
      val b = o.select(col("rn").as("rn2"), col("y").as("yb"))
      val p = a.join(b, col("rn2") === col("rn") + col("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("npair"),
          sum(col("ya") * col("yb").cast("decimal(28,0)"))
            .cast("decimal(38,0)").as("ck"),
          sum("ya").cast("decimal(38,0)").as("hk"),
          sum("yb").cast("decimal(38,0)").as("tk"))
      val ybar = col("sy").cast("double") / col("n")
      val rk = ((col("ck").cast("double")
        - ybar * (col("hk").cast("double") + col("tk").cast("double"))
        + (col("n") - col("k")) * (ybar * ybar))
        / (col("syy").cast("double")
          - (col("sy").cast("double") * col("sy").cast("double"))
            / col("n"))).as("rk")
      val r = p.crossJoin(broadcast(g))
        .select(col("k"), col("npair"), col("n"), rk)
      val wAll = Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
      r.withColumn("lbq",
          col("n") * (col("n") + lit(2.0))
            * sum((col("rk") * col("rk")) / (col("n") - col("k"))).over(wAll))
        .select(col("k"), col("npair").as("n_pairs"), col("n").as("n_days"),
          (round(col("rk"), 6) + 0.0).as("acf"),
          (round(col("lbq"), 6) + 0.0).as("lb_q"),
          col("k").cast("long").as("df"))
        .orderBy("k")
    },

    // ---- Dickey–Fuller unit-root test (is the series stationary?) ----
    // Dickey & Fuller (1979), the DF(0) regression Δy_t = α + ρ·y_{t−1}
    // + ε: ρ significantly below 0 ⇒ mean reversion (stationarity);
    // ρ ≈ 0 ⇒ a random walk, where every q_rolling_* and forecast op's
    // confidence story changes. The t-statistic's null distribution is
    // NOT Student-t — the 5 % critical value −2.86 (constant-only DF
    // tables, n→∞) rides as a pinned literal and the verdict is a 0/1
    // column. Mean-reversion half-life −ln2/ln(1+ρ) rides for the
    // product read. Exactness: the (y_{t−1}, Δy_t) pair moments are
    // exact DECIMAL ((28,0) pairings); the OLS solve + t-stat are
    // doubles with explicit association. 100-TB story: one corpus
    // collapse to the day frame, one adjacent-day self-join on it,
    // ONE moment row.
    sql(
      "q_dickey_fuller",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT CAST(rev * 10000 AS BIGINT) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |pr AS (SELECT a.y AS x, b.y - a.y AS dy
        |       FROM o a JOIN o b ON b.rn = a.rn + 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS DECIMAL(38,0)) AS sx,
        |        CAST(sum(x * CAST(x AS DECIMAL(28,0))) AS DECIMAL(38,0))
        |          AS sxx,
        |        CAST(sum(dy) AS DECIMAL(38,0)) AS sd,
        |        CAST(sum(x * CAST(dy AS DECIMAL(28,0))) AS DECIMAL(38,0))
        |          AS sxd,
        |        CAST(sum(dy * CAST(dy AS DECIMAL(28,0))) AS DECIMAL(38,0))
        |          AS sdd
        |      FROM pr),
        |c AS (SELECT n,
        |        CAST(sxx AS DOUBLE)
        |          - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n AS sxxc,
        |        CAST(sxd AS DOUBLE)
        |          - (CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE)) / n AS sxdc,
        |        CAST(sdd AS DOUBLE)
        |          - (CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) / n AS sddc,
        |        CAST(sd AS DOUBLE) / n AS mdy,
        |        CAST(sx AS DOUBLE) / n AS mx
        |      FROM m),
        |f AS (SELECT n, sxdc / sxxc AS rho,
        |        mdy - (sxdc / sxxc) * mx AS alpha_u,
        |        (sddc - (sxdc / sxxc) * sxdc) / (n - 2) AS s2, sxxc
        |      FROM c)
        |SELECT n AS n_pairs,
        |  round(rho, 6) + 0.0 AS rho,
        |  round(alpha_u / 10000, 6) + 0.0 AS alpha_dollars,
        |  round(rho / sqrt(s2 / sxxc), 6) + 0.0 AS df_t_stat,
        |  CAST(CASE WHEN rho / sqrt(s2 / sxxc) < -2.86 THEN 1 ELSE 0 END
        |    AS BIGINT) AS reject_unit_root_5pct,
        |  CASE WHEN rho > -1 AND rho < 0
        |       THEN round(-0.6931471805599453 / ln(1 + rho), 6) + 0.0
        |       ELSE -1.0e0 END AS half_life_days
        |FROM f""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val o = daily
        .select((col("rev") * 10000).cast("long").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
      val a = o.select(col("rn"), col("y").as("x"))
      val b = o.select(col("rn").as("rn2"), col("y").as("y2"))
      val pr = a.join(b, col("rn2") === col("rn") + 1)
        .select(col("x"), (col("y2") - col("x")).as("dy"))
      val m = pr.agg(count(lit(1)).as("n"),
        sum("x").cast("decimal(38,0)").as("sx"),
        sum(col("x") * col("x").cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("sxx"),
        sum("dy").cast("decimal(38,0)").as("sd"),
        sum(col("x") * col("dy").cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("sxd"),
        sum(col("dy") * col("dy").cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("sdd"))
      val c = m.select(col("n"),
        (col("sxx").cast("double")
          - (col("sx").cast("double") * col("sx").cast("double"))
            / col("n")).as("sxxc"),
        (col("sxd").cast("double")
          - (col("sx").cast("double") * col("sd").cast("double"))
            / col("n")).as("sxdc"),
        (col("sdd").cast("double")
          - (col("sd").cast("double") * col("sd").cast("double"))
            / col("n")).as("sddc"),
        (col("sd").cast("double") / col("n")).as("mdy"),
        (col("sx").cast("double") / col("n")).as("mx"))
      val f = c.select(col("n"), (col("sxdc") / col("sxxc")).as("rho"),
        (col("mdy") - (col("sxdc") / col("sxxc")) * col("mx")).as("alpha_u"),
        ((col("sddc") - (col("sxdc") / col("sxxc")) * col("sxdc"))
          / (col("n") - 2)).as("s2"),
        col("sxxc"))
      f.select(col("n").as("n_pairs"),
        (round(col("rho"), 6) + 0.0).as("rho"),
        (round(col("alpha_u") / 10000, 6) + 0.0).as("alpha_dollars"),
        (round(col("rho") / sqrt(col("s2") / col("sxxc")), 6) + 0.0)
          .as("df_t_stat"),
        when(col("rho") / sqrt(col("s2") / col("sxxc")) < -2.86, 1L)
          .otherwise(0L).as("reject_unit_root_5pct"),
        when(col("rho") > -1 && col("rho") < 0,
          round(lit(-0.6931471805599453) / log(lit(1) + col("rho")), 6)
            + 0.0).otherwise(lit(-1.0))
          .as("half_life_days"))
    },

    // ---- KPSS stationarity test (the DF null, reversed) ----
    // Kwiatkowski, Phillips, Schmidt & Shin (1992): the complement the
    // unit-root pair NEEDS — q_dickey_fuller's null is "unit root"
    // (non-rejection is uninformative on short series); KPSS nulls
    // "level-stationary", so running BOTH gives the four-quadrant
    // read (reject/reject = misspecified, etc.). η = n⁻²·Σ_t S_t²/σ̂²
    // with S_t the partial sums of demeaned y and σ̂² the l=0
    // long-run variance (the iid-residual form — consistent here
    // because q_ljung_box reads this series as white). The 5 %
    // critical value 0.463 (level case) is a pinned literal; partial
    // sums come from EXACT DECIMAL prefix cums with the per-row
    // double demeaning, and Σ S_t² accumulates over the ORDERED day
    // frame (the q_page_hinkley parity argument). 100-TB story: one
    // corpus collapse to the day frame; two ordered windows on it.
    sql(
      "q_kpss_test",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT CAST(rev * 10000 AS BIGINT) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(y) AS DECIMAL(38,0)) AS sy,
        |        CAST(sum(y * CAST(y AS DECIMAL(28,0))) AS DECIMAL(38,0))
        |          AS syy
        |      FROM o),
        |p AS (SELECT rn,
        |        CAST(sum(y) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING)
        |          AS DECIMAL(38,0)) AS cy
        |      FROM o),
        |s AS (SELECT p.rn,
        |        CAST(p.cy AS DOUBLE) - p.rn * (CAST(g.sy AS DOUBLE) / g.n)
        |          AS st
        |      FROM p CROSS JOIN g),
        |c AS (SELECT rn,
        |        sum(st * st) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING)
        |          AS cs2
        |      FROM s),
        |f AS (SELECT g.n, c.cs2,
        |        (CAST(g.syy AS DOUBLE)
        |           - (CAST(g.sy AS DOUBLE) * CAST(g.sy AS DOUBLE)) / g.n)
        |          / g.n AS sig2
        |      FROM c CROSS JOIN g WHERE c.rn = g.n)
        |SELECT n AS n_days,
        |  round(cs2 / ((CAST(n AS DOUBLE) * n) * sig2), 6) + 0.0
        |    AS kpss_eta,
        |  CAST(CASE WHEN cs2 / ((CAST(n AS DOUBLE) * n) * sig2) > 0.463
        |       THEN 1 ELSE 0 END AS BIGINT) AS reject_stationary_5pct,
        |  round(sqrt(sig2) / 10000, 4) + 0.0 AS resid_sd
        |FROM f""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val o = daily
        .select((col("rev") * 10000).cast("long").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
        .localCheckpoint() // day frame: global moments + the prefix walk
      val g = o.agg(count(lit(1)).as("n"),
        sum("y").cast("decimal(38,0)").as("sy"),
        sum(col("y") * col("y").cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("syy"))
      val wCum = Window.orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
      val p = o.select(col("rn"),
        sum("y").over(wCum).cast("decimal(38,0)").as("cy"))
      val st = p.crossJoin(broadcast(g))
        .select(col("rn"), col("n"), col("sy"), col("syy"),
          (col("cy").cast("double")
            - col("rn") * (col("sy").cast("double") / col("n"))).as("st"))
      val c = st.withColumn("cs2",
        sum(col("st") * col("st")).over(wCum))
      val f = c.where(col("rn") === col("n"))
        .select(col("n"), col("cs2"),
          (((col("syy").cast("double")
            - (col("sy").cast("double") * col("sy").cast("double"))
              / col("n"))) / col("n")).as("sig2"))
      val eta = col("cs2")
        ./((col("n").cast("double") * col("n")) * col("sig2"))
      f.select(col("n").as("n_days"),
        (round(eta, 6) + 0.0).as("kpss_eta"),
        when(eta > 0.463, 1L).otherwise(0L).as("reject_stationary_5pct"),
        (round(sqrt(col("sig2")) / 10000, 4) + 0.0).as("resid_sd"))
    },

    // ---- detrended fluctuation analysis (DFA-1) ----
    // Peng et al. (1994): the modern long-memory estimator next to
    // q_hurst_exponent's classic R/S — DFA detrends each block of the
    // cumulative profile with its own OLS line before measuring
    // fluctuation, so a deterministic trend can't masquerade as
    // memory (the failure mode R/S is famous for). α ≈ 0.5 white,
    // > 0.5 persistent; the R/S + DFA PAIR agreeing (.568/.539 here)
    // is itself the audit. Numerics (two 10×-gate lessons baked in):
    // (1) block-OLS SSE is invariant to adding any intercept+slope
    // term, so the mean-subtracted FLOAT profile is mathematically
    // redundant — the profile is the raw INTEGER cumulative sum of
    // whole-dollar daily revenue (floor() both engines, the CAST
    // gotcha), and every block moment is exact; (2) the centered
    // moments s·Σy²−(Σy)², s·Σxy−Σx·Σy CANCEL IN DECIMAL (38-digit
    // exact, width-paired products) BEFORE any double conversion —
    // cancelling in double after a >2⁵³ decimal→double cast left a
    // 1-ulp engine gap that the 10× hash gate caught twice. Σpos and
    // Σpos² are closed-form in s. F(s) = √(mean SSE/s), α = the
    // 5-point log-log slope (the q_hurst_exponent fit shape).
    // 100-TB story: one corpus collapse to the day frame; the
    // profile is ONE ordered integer prefix window; the ×5 fan-out
    // is day-frame-sized; headroom to ~1000× inside DECIMAL(38).
    sql(
      "q_dfa_alpha",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT CAST(floor(rev) AS BIGINT) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |pr AS (SELECT o.rn,
        |         CAST(sum(o.y) OVER (ORDER BY o.rn ROWS UNBOUNDED PRECEDING)
        |           AS BIGINT) AS cy
        |       FROM o),
        |sizes AS (SELECT CAST(unnest([16, 32, 64, 128, 256]) AS BIGINT) AS s),
        |e AS (SELECT sizes.s, (pr.rn - 1) // sizes.s AS blk,
        |        CAST(pr.rn - sizes.s * ((pr.rn - 1) // sizes.s) AS BIGINT)
        |          AS pos,
        |        pr.cy
        |      FROM pr CROSS JOIN sizes CROSS JOIN g
        |      WHERE pr.rn <= sizes.s * (g.n // sizes.s)),
        |bm AS (SELECT s, blk,
        |         CAST(sum(cy) AS DECIMAL(18,0)) AS scy,
        |         CAST(sum(pos * CAST(cy AS DECIMAL(22,0)))
        |           AS DECIMAL(38,0)) AS spcy,
        |         CAST(sum(CAST(cy AS DECIMAL(15,0))
        |                  * CAST(cy AS DECIMAL(19,0)))
        |           AS DECIMAL(34,0)) AS scy2
        |       FROM e GROUP BY 1, 2),
        |cm AS (SELECT s, blk,
        |         CAST(CAST(scy2 AS DECIMAL(34,0)) * CAST(s AS DECIMAL(3,0))
        |              - CAST(scy AS DECIMAL(18,0)) * CAST(scy AS DECIMAL(19,0))
        |           AS DECIMAL(38,0)) AS syyc,
        |         CAST(CAST(spcy AS DECIMAL(34,0)) * CAST(s AS DECIMAL(3,0))
        |              - CAST((s * (s + 1)) // 2 AS DECIMAL(5,0))
        |                * CAST(scy AS DECIMAL(32,0))
        |           AS DECIMAL(38,0)) AS sxyc,
        |         (s * s * (s * s - 1)) // 12 AS sxxc
        |       FROM bm),
        |sse AS (SELECT s, blk,
        |          (CAST(syyc AS DOUBLE)
        |             - (CAST(sxyc AS DOUBLE) * CAST(sxyc AS DOUBLE))
        |               / CAST(sxxc AS DOUBLE))
        |          / (CAST(s AS DOUBLE) * s) AS f2
        |        FROM cm),
        |fs AS (SELECT s, CAST(count(*) AS BIGINT) AS n_blocks,
        |         sqrt(CAST(sum(CAST(f2 AS DECIMAL(38,6))) AS DOUBLE)
        |              / count(*)) AS f_s
        |       FROM sse GROUP BY 1),
        |lg AS (SELECT s, n_blocks, f_s,
        |         ln(CAST(s AS DOUBLE)) AS lx, ln(f_s) AS ly
        |       FROM fs),
        |fm AS (SELECT CAST(count(*) AS BIGINT) AS np,
        |         CAST(sum(CAST(lx * ly AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(lx AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(ly AS DECIMAL(38,18))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(lx * lx AS DECIMAL(38,18))) AS DOUBLE) AS sxx
        |       FROM lg),
        |fit AS (SELECT (np * sxy - sx * sy) / (np * sxx - sx * sx) AS a
        |        FROM fm)
        |SELECT lg.s AS block_size, lg.n_blocks,
        |  round(lg.f_s, 6) + 0.0 AS f_s,
        |  round(fit.a, 6) + 0.0 AS dfa_alpha,
        |  CAST(CASE WHEN fit.a > 0.6 THEN 1
        |            WHEN fit.a < 0.4 THEN -1
        |            ELSE 0 END AS BIGINT) AS memory_verdict
        |FROM lg CROSS JOIN fit ORDER BY block_size""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val o = daily
        .select(floor(col("rev")).cast("long").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
      val g = o.agg(count(lit(1)).as("n"))
      val wCum = Window.orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
      val pr = o.select(col("rn"),
        sum("y").over(wCum).cast("long").as("cy"))
      val sizes = s.range(1).select(explode(array(
        lit(16L), lit(32L), lit(64L), lit(128L), lit(256L))).as("s"))
      val e = pr.crossJoin(broadcast(sizes)).crossJoin(broadcast(g))
        .where(col("rn") <= col("s") * expr("n div s"))
        .select(col("s"), expr("(rn - 1) div s").as("blk"),
          (col("rn") - col("s") * expr("(rn - 1) div s")).cast("long")
            .as("pos"),
          col("cy"))
      val bm = e.groupBy("s", "blk")
        .agg(sum("cy").cast("decimal(18,0)").as("scy"),
          sum(col("pos") * col("cy").cast("decimal(22,0)"))
            .cast("decimal(38,0)").as("spcy"),
          sum(col("cy").cast("decimal(15,0)")
            * col("cy").cast("decimal(19,0)"))
            .cast("decimal(34,0)").as("scy2"))
      val cm = bm.select(col("s"), col("blk"),
        (col("scy2").cast("decimal(34,0)") * col("s").cast("decimal(3,0)")
          - col("scy").cast("decimal(18,0)")
            * col("scy").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("syyc"),
        (col("spcy").cast("decimal(34,0)") * col("s").cast("decimal(3,0)")
          - expr("(s * (s + 1)) div 2").cast("decimal(5,0)")
            * col("scy").cast("decimal(32,0)"))
          .cast("decimal(38,0)").as("sxyc"),
        expr("(s * s * (s * s - 1)) div 12").as("sxxc"))
      val sse = cm.select(col("s"), col("blk"),
        ((col("syyc").cast("double")
          - ((col("sxyc").cast("double") * col("sxyc").cast("double"))
            / col("sxxc").cast("double")))
          / (col("s").cast("double") * col("s"))).as("f2"))
      val fs = sse.groupBy("s")
        .agg(count(lit(1)).as("n_blocks"),
          sqrt(sum(col("f2").cast("decimal(38,6)")).cast("double")
            / count(lit(1))).as("f_s"))
      val lg = fs.select(col("s"), col("n_blocks"), col("f_s"),
          log(col("s").cast("double")).as("lx"),
          log(col("f_s")).as("ly"))
        .localCheckpoint() // 5-row frame: the fit + the output
      val fm = lg.agg(count(lit(1)).as("np"),
        sum((col("lx") * col("ly")).cast("decimal(38,18)"))
          .cast("double").as("sxy"),
        sum(col("lx").cast("decimal(38,18)")).cast("double").as("sx"),
        sum(col("ly").cast("decimal(38,18)")).cast("double").as("sy"),
        sum((col("lx") * col("lx")).cast("decimal(38,18)"))
          .cast("double").as("sxx"))
      val fit = fm.select(((col("np") * col("sxy") - col("sx") * col("sy"))
        / (col("np") * col("sxx") - col("sx") * col("sx"))).as("a"))
      lg.crossJoin(broadcast(fit))
        .select(col("s").as("block_size"), col("n_blocks"),
          (round(col("f_s"), 6) + 0.0).as("f_s"),
          (round(col("a"), 6) + 0.0).as("dfa_alpha"),
          when(col("a") > 0.6, 1L).when(col("a") < 0.4, -1L)
            .otherwise(0L).as("memory_verdict"))
        .orderBy("block_size")
    },

    // ---- EWMA control chart (per event type, daily volumes) ----
    // Roberts (1959) / Lucas & Saccucci (1990): the small-shift
    // detector Shewhart misses — z_t = λx_t + (1−λ)z_{t−1} (λ = 0.2)
    // against time-varying limits μ ± 3σ√(λ/(2−λ)·(1−(1−λ)^{2t})).
    // The power (1−λ)^{2t} is CARRIED THROUGH THE RECURSION as
    // v_t = (1−λ)²·v_{t−1} (exact IEEE multiplication both engines —
    // no pow(), the chi²/libm non-choice), so the whole chart is the
    // q_holt_forecast recursive-CTE ≡ mapPartitions-fold parity
    // pattern with a 2-field state. μ/σ are the series' own exact
    // integer moments (Phase-I-on-self convention, like
    // q_control_chart). Output: per (type, day) z, limits, breach
    // flag; Σ breaches is the verdict. 100-TB story: one corpus
    // collapse to the (#series × #days) day frame; the fold is a
    // per-series in-partition walk.
    sql(
      "q_ewma_chart",
      """WITH RECURSIVE dd AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |             CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |i AS (SELECT event_type, c,
        |        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |             AS BIGINT) AS rn
        |      FROM dd),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(c) AS BIGINT) AS sc,
        |        CAST(sum(c * c) AS BIGINT) AS scc
        |      FROM i GROUP BY 1),
        |ms AS (SELECT event_type, n, CAST(sc AS DOUBLE) / n AS mu,
        |         sqrt((n * CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * sc)
        |              / (CAST(n AS DOUBLE) * n - n)) AS sg
        |       FROM m),
        |f AS (SELECT i.event_type, i.rn,
        |        ms.mu + 0.2e0 * (i.c - ms.mu) AS z,
        |        0.64e0 AS v
        |      FROM i JOIN ms ON ms.event_type = i.event_type
        |      WHERE i.rn = 1
        |      UNION ALL
        |      SELECT i.event_type, i.rn,
        |             0.2e0 * i.c + 0.8e0 * f.z,
        |             0.64e0 * f.v
        |      FROM f JOIN i ON i.event_type = f.event_type
        |                   AND i.rn = f.rn + 1)
        |SELECT f.event_type, f.rn AS t,
        |  round(f.z, 6) + 0.0 AS ewma,
        |  round(ms.mu, 6) + 0.0 AS center,
        |  round(ms.mu - 3 * (ms.sg * sqrt(0.2e0 / 1.8e0 * (1 - f.v))), 6)
        |    + 0.0 AS lcl,
        |  round(ms.mu + 3 * (ms.sg * sqrt(0.2e0 / 1.8e0 * (1 - f.v))), 6)
        |    + 0.0 AS ucl,
        |  CAST(CASE WHEN f.z < ms.mu - 3 * (ms.sg * sqrt(0.2e0 / 1.8e0 * (1 - f.v)))
        |             OR f.z > ms.mu + 3 * (ms.sg * sqrt(0.2e0 / 1.8e0 * (1 - f.v)))
        |       THEN 1 ELSE 0 END AS BIGINT) AS breach
        |FROM f JOIN ms ON ms.event_type = f.event_type
        |ORDER BY f.event_type, t""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dd = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // day frame: moments + the fold
      val m = dd.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").cast("long").as("sc"),
          sum(col("c") * col("c")).cast("long").as("scc"))
      val ms = m.select(col("event_type").as("et"), col("n"),
          (col("sc").cast("double") / col("n")).as("mu"),
          sqrt((col("n") * col("scc").cast("double")
            - col("sc").cast("double") * col("sc"))
            / (col("n").cast("double") * col("n") - col("n"))).as("sg"))
        .localCheckpoint() // 5 rows: fold seed + the limit join
      val folded = dd.join(broadcast(ms), col("event_type") === col("et"))
        .select(col("event_type"), col("day"),
          col("c").cast("double").as("x"), col("mu"))
        .as[(String, java.sql.Date, Double, Double)]
        .repartition(col("event_type"))
        .sortWithinPartitions("event_type", "day")
        .mapPartitions { it =>
          new Iterator[(String, Long, Double, Double)] {
            private var pending: Option[(String, java.sql.Date, Double, Double)] =
              if (it.hasNext) Some(it.next()) else None
            val out = scala.collection.mutable.Queue.empty[(String, Long, Double, Double)]
            private def fill(): Unit = while (out.isEmpty && pending.isDefined) {
              val (et, _, x0, mu) = pending.get
              // seed: z1 = mu + lambda*(x1 - mu); v1 = (1-lambda)^2
              var z = mu + 0.2 * (x0 - mu)
              var v = 0.64
              var rn = 1L
              out += ((et, rn, z, v))
              pending = None
              var done = false
              while (!done && it.hasNext) {
                val r = it.next()
                if (r._1 == et) {
                  // the oracle CTE's step expressions, shape-identical
                  z = 0.2 * r._3 + 0.8 * z
                  v = 0.64 * v
                  rn += 1
                  out += ((et, rn, z, v))
                } else { pending = Some(r); done = true }
              }
            }
            def hasNext: Boolean = { fill(); out.nonEmpty }
            def next(): (String, Long, Double, Double) = { fill(); out.dequeue() }
          }
        }
        .toDF("event_type", "t", "z", "v")
      val lim = col("sg") * sqrt(lit(0.2) / 1.8 * (lit(1) - col("v")))
      folded.join(broadcast(ms), col("event_type") === col("et"))
        .select(col("event_type"), col("t"),
          (round(col("z"), 6) + 0.0).as("ewma"),
          (round(col("mu"), 6) + 0.0).as("center"),
          (round(col("mu") - lit(3) * lim, 6) + 0.0).as("lcl"),
          (round(col("mu") + lit(3) * lim, 6) + 0.0).as("ucl"),
          when(col("z") < col("mu") - lit(3) * lim, 1L)
            .when(col("z") > col("mu") + lit(3) * lim, 1L)
            .otherwise(0L).as("breach"))
        .orderBy("event_type", "t")
    },

    // ---- tabular CUSUM control chart (per event type) ----
    // Page (1954), the decision-interval form every SPC text pairs
    // with the EWMA chart: C⁺ = max(0, x − (μ + kσ) + C⁺₋₁),
    // C⁻ = max(0, (μ − kσ) − x + C⁻₋₁), alarm when either exceeds
    // h·σ (k = 0.5, h = 4 — the standard design for 1σ shifts).
    // Differs from q_changepoint_cusum (global-mean replay) and
    // q_page_hinkley (running-mean drift): this is the CALIBRATED
    // two-sided chart with named design constants. Same recursion
    // discipline as q_ewma_chart: recursive-CTE oracle ≡ sequential
    // fold, max() is exact in IEEE, μ/σ from exact integer moments.
    // 100-TB story: one corpus collapse to the day frame; per-series
    // in-partition walk.
    sql(
      "q_cusum_chart",
      """WITH RECURSIVE dd AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |             CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |i AS (SELECT event_type, c,
        |        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |             AS BIGINT) AS rn
        |      FROM dd),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(c) AS BIGINT) AS sc,
        |        CAST(sum(c * c) AS BIGINT) AS scc
        |      FROM i GROUP BY 1),
        |ms AS (SELECT event_type, CAST(sc AS DOUBLE) / n AS mu,
        |         sqrt((n * CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * sc)
        |              / (CAST(n AS DOUBLE) * n - n)) AS sg
        |       FROM m),
        |f AS (SELECT i.event_type, i.rn,
        |        greatest(0, i.c - (ms.mu + 0.5e0 * ms.sg)) AS cp,
        |        greatest(0, (ms.mu - 0.5e0 * ms.sg) - i.c) AS cm
        |      FROM i JOIN ms ON ms.event_type = i.event_type
        |      WHERE i.rn = 1
        |      UNION ALL
        |      SELECT i.event_type, i.rn,
        |             greatest(0, i.c - (ms.mu + 0.5e0 * ms.sg) + f.cp),
        |             greatest(0, (ms.mu - 0.5e0 * ms.sg) - i.c + f.cm)
        |      FROM f JOIN i ON i.event_type = f.event_type
        |                   AND i.rn = f.rn + 1
        |      JOIN ms ON ms.event_type = i.event_type)
        |SELECT f.event_type, f.rn AS t,
        |  round(f.cp, 6) + 0.0 AS cusum_hi,
        |  round(f.cm, 6) + 0.0 AS cusum_lo,
        |  round(4 * ms.sg, 6) + 0.0 AS h_limit,
        |  CAST(CASE WHEN f.cp > 4 * ms.sg OR f.cm > 4 * ms.sg
        |       THEN 1 ELSE 0 END AS BIGINT) AS alarm
        |FROM f JOIN ms ON ms.event_type = f.event_type
        |ORDER BY f.event_type, t""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dd = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val m = dd.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").cast("long").as("sc"),
          sum(col("c") * col("c")).cast("long").as("scc"))
      val ms = m.select(col("event_type").as("et"),
          (col("sc").cast("double") / col("n")).as("mu"),
          sqrt((col("n") * col("scc").cast("double")
            - col("sc").cast("double") * col("sc"))
            / (col("n").cast("double") * col("n") - col("n"))).as("sg"))
        .localCheckpoint()
      val folded = dd.join(broadcast(ms), col("event_type") === col("et"))
        .select(col("event_type"), col("day"),
          col("c").cast("double").as("x"), col("mu"), col("sg"))
        .as[(String, java.sql.Date, Double, Double, Double)]
        .repartition(col("event_type"))
        .sortWithinPartitions("event_type", "day")
        .mapPartitions { it =>
          new Iterator[(String, Long, Double, Double)] {
            private var pending: Option[(String, java.sql.Date, Double, Double, Double)] =
              if (it.hasNext) Some(it.next()) else None
            val out = scala.collection.mutable.Queue.empty[(String, Long, Double, Double)]
            private def fill(): Unit = while (out.isEmpty && pending.isDefined) {
              val (et, _, x0, mu, sg) = pending.get
              // the oracle CTE's step expressions, shape-identical
              var cp = math.max(0.0, x0 - (mu + 0.5 * sg))
              var cm = math.max(0.0, (mu - 0.5 * sg) - x0)
              var rn = 1L
              out += ((et, rn, cp, cm))
              pending = None
              var done = false
              while (!done && it.hasNext) {
                val r = it.next()
                if (r._1 == et) {
                  cp = math.max(0.0, r._3 - (mu + 0.5 * sg) + cp)
                  cm = math.max(0.0, (mu - 0.5 * sg) - r._3 + cm)
                  rn += 1
                  out += ((et, rn, cp, cm))
                } else { pending = Some(r); done = true }
              }
            }
            def hasNext: Boolean = { fill(); out.nonEmpty }
            def next(): (String, Long, Double, Double) = { fill(); out.dequeue() }
          }
        }
        .toDF("event_type", "t", "cp", "cm")
      folded.join(broadcast(ms), col("event_type") === col("et"))
        .select(col("event_type"), col("t"),
          (round(col("cp"), 6) + 0.0).as("cusum_hi"),
          (round(col("cm"), 6) + 0.0).as("cusum_lo"),
          (round(lit(4) * col("sg"), 6) + 0.0).as("h_limit"),
          when(col("cp") > lit(4) * col("sg"), 1L)
            .when(col("cm") > lit(4) * col("sg"), 1L)
            .otherwise(0L).as("alarm"))
        .orderBy("event_type", "t")
    },

    // ---- Hurst exponent via rescaled-range analysis ----
    // Hurst (1951) / Mandelbrot & Wallis (1969): the long-memory
    // readout the stationarity pair can't give — DF/KPSS ask IF the
    // series reverts, H asks HOW ITS FLUCTUATIONS SCALE: H ≈ .5
    // random walk increments, H > .5 persistent (trends feed
    // themselves), H < .5 anti-persistent. Classic R/S: for block
    // sizes s ∈ {16..256}, each complete block's rescaled range
    // (max−min of the cumulative demeaned walk, over the population
    // σ), averaged per size, then H = the log-log OLS slope (the
    // q_zipf_fit log-log-fit convention — ln enters only 5-row
    // regression inputs). Cross-engine: block sums/squares are exact
    // BIGINT/DECIMAL; the in-block walk accumulates through the
    // ORDERED window (sequential both engines); per-size averages
    // accumulate as DECIMAL(38,18) casts (combiner-order-free).
    // 100-TB story: one corpus collapse to the day frame; the ×5
    // size fan-out is day-frame-sized; everything else is block- and
    // 5-row-frame math.
    sql(
      "q_hurst_exponent",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT CAST(rev * 10000 AS BIGINT) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |sizes AS (SELECT CAST(unnest([16, 32, 64, 128, 256]) AS BIGINT) AS s),
        |e AS (SELECT sizes.s, (o.rn - 1) // sizes.s AS blk,
        |        o.rn - sizes.s * ((o.rn - 1) // sizes.s) AS pos, o.y
        |      FROM o CROSS JOIN sizes CROSS JOIN g
        |      WHERE o.rn <= sizes.s * (g.n // sizes.s)),
        |bm AS (SELECT s, blk, CAST(sum(y) AS BIGINT) AS bsum,
        |         CAST(sum(y * CAST(y AS DECIMAL(28,0))) AS DECIMAL(38,0))
        |           AS bss
        |       FROM e GROUP BY 1, 2),
        |z AS (SELECT e.s, e.blk,
        |        CAST(sum(e.y) OVER (PARTITION BY e.s, e.blk ORDER BY e.pos
        |            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |          - e.pos * (CAST(bm.bsum AS DOUBLE) / e.s) AS zt,
        |        CAST(bm.bss AS DOUBLE) / e.s
        |          - (CAST(bm.bsum AS DOUBLE) / e.s)
        |            * (CAST(bm.bsum AS DOUBLE) / e.s) AS v2
        |      FROM e JOIN bm ON bm.s = e.s AND bm.blk = e.blk),
        |rsb AS (SELECT s, blk,
        |          (max(zt) - min(zt)) / sqrt(max(v2)) AS rs
        |        FROM z GROUP BY 1, 2 HAVING max(v2) > 0),
        |rss AS (SELECT s, CAST(count(*) AS BIGINT) AS n_blocks,
        |          CAST(sum(CAST(rs AS DECIMAL(38,18))) AS DOUBLE)
        |            / count(*) AS rs_mean
        |        FROM rsb GROUP BY 1),
        |lg AS (SELECT s, n_blocks, rs_mean,
        |         ln(CAST(s AS DOUBLE)) AS lx, ln(rs_mean) AS ly
        |       FROM rss),
        |fm AS (SELECT CAST(count(*) AS BIGINT) AS np,
        |         CAST(sum(CAST(lx * ly AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(lx AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(ly AS DECIMAL(38,18))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(lx * lx AS DECIMAL(38,18))) AS DOUBLE) AS sxx
        |       FROM lg),
        |fit AS (SELECT (np * sxy - sx * sy) / (np * sxx - sx * sx) AS h
        |        FROM fm)
        |SELECT lg.s AS block_size, lg.n_blocks,
        |  round(lg.rs_mean, 6) + 0.0 AS rs_mean,
        |  round(fit.h, 6) + 0.0 AS hurst_h,
        |  CAST(CASE WHEN fit.h > 0.6 THEN 1
        |            WHEN fit.h < 0.4 THEN -1
        |            ELSE 0 END AS BIGINT) AS memory_verdict
        |FROM lg CROSS JOIN fit ORDER BY block_size""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val o = daily
        .select((col("rev") * 10000).cast("long").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
      val g = o.agg(count(lit(1)).as("n"))
      val sizes = s.range(1).select(explode(array(
        lit(16L), lit(32L), lit(64L), lit(128L), lit(256L))).as("s"))
      val e = o.crossJoin(broadcast(sizes)).crossJoin(broadcast(g))
        .where(col("rn") <= col("s") * expr("n div s"))
        .select(col("s"), expr("(rn - 1) div s").as("blk"),
          (col("rn") - col("s") * expr("(rn - 1) div s")).as("pos"),
          col("y"))
        .localCheckpoint() // (day × 5 sizes) frame: moments + the walk
      val bm = e.groupBy("s", "blk")
        .agg(sum("y").cast("long").as("bsum"),
          sum(col("y") * col("y").cast("decimal(28,0)"))
            .cast("decimal(38,0)").as("bss"))
      val wBlk = Window.partitionBy("s", "blk").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
      val z = e.join(bm, Seq("s", "blk"))
        .select(col("s"), col("blk"),
          (sum("y").over(wBlk).cast("double")
            - col("pos") * (col("bsum").cast("double") / col("s")))
            .as("zt"),
          (col("bss").cast("double") / col("s")
            - (col("bsum").cast("double") / col("s"))
              * (col("bsum").cast("double") / col("s"))).as("v2"))
      val rsb = z.groupBy("s", "blk")
        .agg(((max("zt") - min("zt")) / sqrt(max("v2"))).as("rs"),
          max("v2").as("mv2"))
        .where(col("mv2") > 0)
      val rss = rsb.groupBy("s")
        .agg(count(lit(1)).as("n_blocks"),
          (sum(col("rs").cast("decimal(38,18)")).cast("double")
            / count(lit(1))).as("rs_mean"))
      val lg = rss.select(col("s"), col("n_blocks"), col("rs_mean"),
          log(col("s").cast("double")).as("lx"),
          log(col("rs_mean")).as("ly"))
        .localCheckpoint() // 5-row frame: the fit + the output
      val fm = lg.agg(count(lit(1)).as("np"),
        sum((col("lx") * col("ly")).cast("decimal(38,18)"))
          .cast("double").as("sxy"),
        sum(col("lx").cast("decimal(38,18)")).cast("double").as("sx"),
        sum(col("ly").cast("decimal(38,18)")).cast("double").as("sy"),
        sum((col("lx") * col("lx")).cast("decimal(38,18)"))
          .cast("double").as("sxx"))
      val fit = fm.select(((col("np") * col("sxy") - col("sx") * col("sy"))
        / (col("np") * col("sxx") - col("sx") * col("sx"))).as("h"))
      lg.crossJoin(broadcast(fit))
        .select(col("s").as("block_size"), col("n_blocks"),
          (round(col("rs_mean"), 6) + 0.0).as("rs_mean"),
          (round(col("h"), 6) + 0.0).as("hurst_h"),
          when(col("h") > 0.6, 1L)
            .when(col("h") < 0.4, -1L)
            .otherwise(0L).as("memory_verdict"))
        .orderBy("block_size")
    },

    // ---- negative-binomial fit (overdispersed daily counts) ----
    // The count-model rung q_benford/q_burst_detect point at but never
    // fit: per event type, daily event COUNTS are Poisson only if
    // Var = Mean; real streams are overdispersed, and the
    // method-of-moments NB fit r = m²/(v−m), p = m/v (Anscombe 1950)
    // is the planning distribution for queue sizing and anomaly
    // thresholds. The dispersion index D = v/m and a large-sample
    // Poisson dispersion test (χ² = (n−1)·v/m vs its normal
    // approximation z = √(2χ²) − √(2df−1), pinned 1.645) ride as the
    // verdict. Integer daily counts ⇒ EXACT BIGINT moments; the only
    // doubles are the final ratios. Falls back to sentinel r/p = −1
    // when v ≤ m (underdispersed ⇒ NB undefined), identically both
    // engines. 100-TB story: one corpus collapse to (type, day)
    // counts, one 3-moment collapse per type, per-type projection.
    sql(
      "q_negbin_fit",
      """WITH dd AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(c) AS BIGINT) AS sc,
        |        CAST(sum(c * c) AS BIGINT) AS scc
        |      FROM dd GROUP BY 1),
        |f AS (SELECT event_type, n, sc,
        |        CAST(sc AS DOUBLE) / n AS mean_c,
        |        (n * CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * n - n) AS var_c
        |      FROM m)
        |SELECT event_type, n AS n_days, sc AS n_events,
        |  round(mean_c, 4) + 0.0 AS mean_daily,
        |  round(var_c, 4) + 0.0 AS var_daily,
        |  round(var_c / mean_c, 6) + 0.0 AS dispersion,
        |  CASE WHEN var_c > mean_c
        |       THEN round((mean_c * mean_c) / (var_c - mean_c), 6) + 0.0
        |       ELSE -1.0e0 END AS nb_r,
        |  CASE WHEN var_c > mean_c
        |       THEN round(mean_c / var_c, 6) + 0.0
        |       ELSE -1.0e0 END AS nb_p,
        |  round(sqrt(2 * ((n - 1) * (var_c / mean_c)))
        |        - sqrt(2.0e0 * (n - 1) - 1), 6) + 0.0 AS poisson_z,
        |  CAST(CASE WHEN sqrt(2 * ((n - 1) * (var_c / mean_c)))
        |                 - sqrt(2.0e0 * (n - 1) - 1) > 1.6448536269514722
        |       THEN 1 ELSE 0 END AS BIGINT) AS overdispersed_5pct
        |FROM f ORDER BY event_type""".stripMargin) { (s, dir) =>
      val dd = t(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
        .agg(count(lit(1)).as("c"))
      val m = dd.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").cast("long").as("sc"),
          sum(col("c") * col("c")).cast("long").as("scc"))
      val f = m.select(col("event_type"), col("n"), col("sc"),
        (col("sc").cast("double") / col("n")).as("mean_c"),
        ((col("n") * col("scc").cast("double")
          - col("sc").cast("double") * col("sc").cast("double"))
          / (col("n").cast("double") * col("n") - col("n"))).as("var_c"))
      val z = sqrt(lit(2) * ((col("n") - 1) * (col("var_c") / col("mean_c")))) -
        sqrt(lit(2.0) * (col("n") - 1) - 1)
      f.select(col("event_type"), col("n").as("n_days"),
          col("sc").as("n_events"),
          (round(col("mean_c"), 4) + 0.0).as("mean_daily"),
          (round(col("var_c"), 4) + 0.0).as("var_daily"),
          (round(col("var_c") / col("mean_c"), 6) + 0.0).as("dispersion"),
          when(col("var_c") > col("mean_c"),
            round((col("mean_c") * col("mean_c"))
              / (col("var_c") - col("mean_c")), 6) + 0.0)
            .otherwise(lit(-1.0)).as("nb_r"),
          when(col("var_c") > col("mean_c"),
            round(col("mean_c") / col("var_c"), 6) + 0.0)
            .otherwise(lit(-1.0)).as("nb_p"),
          (round(z, 6) + 0.0).as("poisson_z"),
          when(z > 1.6448536269514722, 1L).otherwise(0L)
            .as("overdispersed_5pct"))
        .orderBy("event_type")
    },

    // ---- Shewhart X-bar / R control chart (weekly subgroups) ----
    // The SPC classic (Shewhart 1931) the anomaly family reports TO:
    // q_anomaly_* flags points, a control chart decides whether the
    // PROCESS is in control. Daily revenue in 7-day subgroups; center
    // lines x̄̄ and R̄, limits x̄̄ ± A₂·R̄ and D₃·R̄/D₄·R̄ with the
    // n=7 chart constants PINNED (A₂ = 0.419, D₃ = 0.076, D₄ = 1.924
    // — tabulated values, the pinned-literal convention). Output: one
    // row per complete subgroup (means/ranges as exact micro-unit
    // integers scaled at the edge) with the limits riding and the
    // out-of-control flags (rule 1: beyond 3σ limits) — Σ flags is
    // the process verdict. 100-TB story: one corpus collapse to the
    // day frame, one week-grain collapse, 1-row limits broadcast back.
    sql(
      "q_control_chart",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |wk AS (SELECT d // 7 AS w, CAST(count(*) AS BIGINT) AS nd,
        |         CAST(sum(CAST(rev * 10000 AS BIGINT)) AS BIGINT) AS sv,
        |         max(CAST(rev * 10000 AS BIGINT))
        |           - min(CAST(rev * 10000 AS BIGINT)) AS rng
        |       FROM daily GROUP BY 1 HAVING count(*) = 7),
        |cl AS (SELECT CAST(count(*) AS BIGINT) AS n_weeks,
        |         CAST(sum(sv) AS DOUBLE) / (7 * count(*)) AS xbb,
        |         CAST(sum(rng) AS DOUBLE) / count(*) AS rbar
        |       FROM wk)
        |SELECT wk.w AS week, round(CAST(wk.sv AS DOUBLE) / 7 / 10000, 4)
        |    + 0.0 AS xbar,
        |  round(CAST(wk.rng AS DOUBLE) / 10000, 4) + 0.0 AS r_range,
        |  round(cl.xbb / 10000, 4) + 0.0 AS center,
        |  round((cl.xbb - 0.419e0 * cl.rbar) / 10000, 4) + 0.0 AS lcl,
        |  round((cl.xbb + 0.419e0 * cl.rbar) / 10000, 4) + 0.0 AS ucl,
        |  round(0.076e0 * cl.rbar / 10000, 4) + 0.0 AS r_lcl,
        |  round(1.924e0 * cl.rbar / 10000, 4) + 0.0 AS r_ucl,
        |  CAST(CASE WHEN CAST(wk.sv AS DOUBLE) / 7
        |                 < cl.xbb - 0.419e0 * cl.rbar
        |             OR CAST(wk.sv AS DOUBLE) / 7
        |                 > cl.xbb + 0.419e0 * cl.rbar
        |       THEN 1 ELSE 0 END AS BIGINT) AS out_of_control,
        |  CAST(CASE WHEN CAST(wk.rng AS DOUBLE) < 0.076e0 * cl.rbar
        |             OR CAST(wk.rng AS DOUBLE) > 1.924e0 * cl.rbar
        |       THEN 1 ELSE 0 END AS BIGINT) AS range_out,
        |  cl.n_weeks
        |FROM wk CROSS JOIN cl ORDER BY week""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val v = (col("rev") * 10000).cast("long")
      val wk = daily.groupBy(expr("d div 7").as("w"))
        .agg(count(lit(1)).as("nd"), sum(v).cast("long").as("sv"),
          (max(v) - min(v)).as("rng"))
        .where(col("nd") === 7)
        .localCheckpoint() // complete-week frame: limits + the chart
      val cl = wk.agg(count(lit(1)).as("n_weeks"),
        (sum("sv").cast("double") / (lit(7) * count(lit(1)))).as("xbb"),
        (sum("rng").cast("double") / count(lit(1))).as("rbar"))
      val xbar = col("sv").cast("double") / 7
      wk.crossJoin(broadcast(cl))
        .select(col("w").as("week"),
          (round(xbar / 10000, 4) + 0.0).as("xbar"),
          (round(col("rng").cast("double") / 10000, 4) + 0.0).as("r_range"),
          (round(col("xbb") / 10000, 4) + 0.0).as("center"),
          (round((col("xbb") - lit(0.419) * col("rbar")) / 10000, 4) + 0.0)
            .as("lcl"),
          (round((col("xbb") + lit(0.419) * col("rbar")) / 10000, 4) + 0.0)
            .as("ucl"),
          (round(lit(0.076) * col("rbar") / 10000, 4) + 0.0).as("r_lcl"),
          (round(lit(1.924) * col("rbar") / 10000, 4) + 0.0).as("r_ucl"),
          when(xbar < col("xbb") - lit(0.419) * col("rbar"), 1L)
            .when(xbar > col("xbb") + lit(0.419) * col("rbar"), 1L)
            .otherwise(0L).as("out_of_control"),
          when(col("rng").cast("double") < lit(0.076) * col("rbar"), 1L)
            .when(col("rng").cast("double") > lit(1.924) * col("rbar"), 1L)
            .otherwise(0L).as("range_out"),
          col("n_weeks"))
        .orderBy("week")
    },

    // ---- Wald–Wolfowitz runs test (sequence randomness) ----
    // Wald & Wolfowitz (1940): is the SEQUENCE of above/below-median
    // days random, or do highs/lows clump? Catches serial structure
    // in SIGN that Ljung–Box's linear ACF can miss (and vice versa) —
    // the q_runs_islands machinery turned into an actual hypothesis
    // test. The split point is the LOWER MEDIAN as an exact order
    // statistic (row_number = (n+1) div 2 over (y, rn) — a
    // deterministic integer selection, no percentile interpolation to
    // drift cross-engine); ties go below. Runs count via the ordered
    // lag window (exact integer), then the normal approximation
    // z = (R − μ)/σ with μ = 2n₁n₂/n + 1 — doubles with explicit
    // association. 100-TB story: one corpus collapse to the day
    // frame; one sort-rank, one lag window, 1-row math.
    sql(
      "q_runs_test",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT CAST(rev * 10000 AS BIGINT) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |md AS (SELECT y AS med FROM
        |         (SELECT y, row_number() OVER (ORDER BY y, rn) AS rk FROM o)
        |       CROSS JOIN g WHERE rk = (g.n + 1) // 2),
        |b AS (SELECT o.rn,
        |        CASE WHEN o.y > md.med THEN 1 ELSE 0 END AS s
        |      FROM o CROSS JOIN md),
        |tr AS (SELECT s,
        |         CASE WHEN lag(s) OVER (ORDER BY rn) IS NULL THEN 1
        |              WHEN s <> lag(s) OVER (ORDER BY rn) THEN 1
        |              ELSE 0 END AS brk
        |       FROM b),
        |agg AS (SELECT CAST(sum(s) AS BIGINT) AS n1,
        |          CAST(sum(1 - s) AS BIGINT) AS n2,
        |          CAST(sum(brk) AS BIGINT) AS runs
        |        FROM tr),
        |f AS (SELECT n1, n2, runs, n1 + n2 AS n,
        |        (2.0e0 * n1 * n2) / (n1 + n2) + 1 AS mu,
        |        sqrt(((2.0e0 * n1 * n2) * (2.0e0 * n1 * n2 - (n1 + n2)))
        |             / ((CAST(n1 + n2 AS DOUBLE) * (n1 + n2))
        |                * (n1 + n2 - 1))) AS sg
        |      FROM agg)
        |SELECT n AS n_days, n1 AS n_above, n2 AS n_below, runs,
        |  round(mu, 6) + 0.0 AS expected_runs,
        |  round((runs - mu) / sg, 6) + 0.0 AS z_score,
        |  CAST(CASE WHEN abs((runs - mu) / sg) > 1.959963984540054
        |       THEN 1 ELSE 0 END AS BIGINT) AS reject_random_5pct
        |FROM f""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val o = daily
        .select((col("rev") * 10000).cast("long").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
        .localCheckpoint() // day frame: median rank + the sign walk
      val g = o.agg(count(lit(1)).as("n"))
      val md = o.withColumn("rk",
          row_number().over(Window.orderBy("y", "rn")).cast("long"))
        .crossJoin(broadcast(g))
        .where(expr("rk = (n + 1) div 2"))
        .select(col("y").as("med"))
      val b = o.crossJoin(broadcast(md))
        .select(col("rn"), when(col("y") > col("med"), 1L).otherwise(0L)
          .as("s"))
      val lagS = lag("s", 1).over(Window.orderBy("rn"))
      val tr = b.select(col("s"),
        when(lagS.isNull, 1L).when(col("s") =!= lagS, 1L)
          .otherwise(0L).as("brk"))
      val agg = tr.agg(sum("s").cast("long").as("n1"),
        sum(lit(1) - col("s")).cast("long").as("n2"),
        sum("brk").cast("long").as("runs"))
      val f = agg.select(col("n1"), col("n2"), col("runs"),
        (col("n1") + col("n2")).as("n"),
        ((lit(2.0) * col("n1") * col("n2")) / (col("n1") + col("n2")) + 1)
          .as("mu"),
        sqrt(((lit(2.0) * col("n1") * col("n2"))
          * (lit(2.0) * col("n1") * col("n2") - (col("n1") + col("n2"))))
          / (((col("n1") + col("n2")).cast("double")
            * (col("n1") + col("n2"))) * (col("n1") + col("n2") - 1)))
          .as("sg"))
      f.select(col("n").as("n_days"), col("n1").as("n_above"),
        col("n2").as("n_below"), col("runs"),
        (round(col("mu"), 6) + 0.0).as("expected_runs"),
        (round((col("runs") - col("mu")) / col("sg"), 6) + 0.0)
          .as("z_score"),
        when(abs((col("runs") - col("mu")) / col("sg"))
          > 1.959963984540054, 1L).otherwise(0L).as("reject_random_5pct"))
    },

    // ---- block-maxima extreme-value fit (Gumbel, weekly blocks) ----
    // The block-maxima side of extreme-value theory (Gumbel 1958;
    // Fisher–Tippett–Gnedenko), complementing q_hill_tail's
    // peaks-over-threshold view: weekly maxima of daily revenue fitted
    // to the Gumbel (GEV ξ=0) law by method of moments — β̂ = s·√6/π,
    // μ̂ = x̄ − γ·β̂ — and read out as RETURN LEVELS, the capacity
    // question ("the weekly peak exceeded once a year/two years is X")
    // that no percentile op answers because it extrapolates past the
    // sample. The Gumbel quantile factors −ln(−ln(1−1/T)) and √6/π
    // and Euler's γ are PINNED double literals (the PoissonCum
    // convention — libm's ln is not correctly-rounded, and a last-ulp
    // wobble scaled by β would reach the 6th decimal), so both engines
    // walk identical IEEE arithmetic from exact DECIMAL moments. The
    // empirical exceedance count of the 1-year level rides as the
    // self-audit (≈ n_blocks/52 if the fit holds). 100-TB story: one
    // corpus collapse to the day frame, one week-grain max collapse,
    // ONE moment row.
    sql(
      "q_block_maxima_evt",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |wk AS (SELECT d // 7 AS w,
        |         max(CAST(rev * 10000 AS BIGINT)) AS mx
        |       FROM daily GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS nb,
        |        CAST(sum(mx) AS DECIMAL(38,0)) AS sm,
        |        CAST(sum(mx * CAST(mx AS DECIMAL(28,0))) AS DECIMAL(38,0))
        |          AS smm
        |      FROM wk),
        |c AS (SELECT nb, CAST(sm AS DOUBLE) / nb AS mean_u,
        |        sqrt((CAST(smm AS DOUBLE)
        |              - (CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)) / nb)
        |             / (nb - 1)) AS sd_u
        |      FROM m),
        |g AS (SELECT nb, mean_u, sd_u,
        |        sd_u * 0.779696801233676 AS beta_u,
        |        mean_u - 0.5772156649015329 * (sd_u * 0.779696801233676)
        |          AS mu_u
        |      FROM c),
        |rl AS (SELECT nb, mean_u, sd_u, beta_u, mu_u,
        |         mu_u + beta_u * 3.9415503865226063 AS rl52_u,
        |         mu_u + beta_u * 4.639563833370918 AS rl104_u
        |       FROM g),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS exceed_1yr
        |       FROM wk CROSS JOIN rl WHERE CAST(wk.mx AS DOUBLE) > rl.rl52_u)
        |SELECT rl.nb AS n_blocks,
        |  round(rl.mean_u / 10000, 4) + 0.0 AS block_mean,
        |  round(rl.sd_u / 10000, 4) + 0.0 AS block_sd,
        |  round(rl.mu_u / 10000, 4) + 0.0 AS gumbel_mu,
        |  round(rl.beta_u / 10000, 4) + 0.0 AS gumbel_beta,
        |  round(rl.rl52_u / 10000, 4) + 0.0 AS return_level_1yr,
        |  round(rl.rl104_u / 10000, 4) + 0.0 AS return_level_2yr,
        |  ex.exceed_1yr
        |FROM rl CROSS JOIN ex""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val wk = daily.groupBy(expr("d div 7").as("w"))
        .agg(max((col("rev") * 10000).cast("long")).as("mx"))
        .localCheckpoint() // week frame: moments + the exceedance audit
      val m = wk.agg(count(lit(1)).as("nb"),
        sum("mx").cast("decimal(38,0)").as("sm"),
        sum(col("mx") * col("mx").cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("smm"))
      val c = m.select(col("nb"),
        (col("sm").cast("double") / col("nb")).as("mean_u"),
        sqrt((col("smm").cast("double")
          - (col("sm").cast("double") * col("sm").cast("double"))
            / col("nb")) / (col("nb") - 1)).as("sd_u"))
      val g = c.select(col("nb"), col("mean_u"), col("sd_u"),
        (col("sd_u") * 0.779696801233676).as("beta_u"),
        (col("mean_u") - lit(0.5772156649015329)
          * (col("sd_u") * 0.779696801233676)).as("mu_u"))
      val rl = g.select(col("nb"), col("mean_u"), col("sd_u"),
          col("beta_u"), col("mu_u"),
          (col("mu_u") + col("beta_u") * 3.9415503865226063).as("rl52_u"),
          (col("mu_u") + col("beta_u") * 4.639563833370918).as("rl104_u"))
        .localCheckpoint() // 1 row: exceedance probe + output
      val ex = wk.crossJoin(broadcast(rl.select("rl52_u")))
        .where(col("mx").cast("double") > col("rl52_u"))
        .agg(count(lit(1)).as("exceed_1yr"))
      rl.crossJoin(broadcast(ex))
        .select(col("nb").as("n_blocks"),
          (round(col("mean_u") / 10000, 4) + 0.0).as("block_mean"),
          (round(col("sd_u") / 10000, 4) + 0.0).as("block_sd"),
          (round(col("mu_u") / 10000, 4) + 0.0).as("gumbel_mu"),
          (round(col("beta_u") / 10000, 4) + 0.0).as("gumbel_beta"),
          (round(col("rl52_u") / 10000, 4) + 0.0).as("return_level_1yr"),
          (round(col("rl104_u") / 10000, 4) + 0.0).as("return_level_2yr"),
          col("exceed_1yr"))
    },

    // ---- structural break: sup-F (Quandt) over the revenue trend ----
    // Quandt (1960) / Andrews (1993): the supremum of per-candidate
    // Chow (1960) F statistics over all interior break dates — the
    // econometric "did the data-generating process CHANGE, and when?"
    // test that q_changepoint_cusum (mean shift vs global μ) and
    // q_event_study (KNOWN event date) both sidestep: here the break
    // date is estimated, trend included. Model rev_t = a + b·t per
    // segment; for each candidate τ in the 15–85 % trimmed range
    // (Andrews' trimming), F(τ) = ((SSE_pooled − SSE₁ − SSE₂)/2) /
    // ((SSE₁+SSE₂)/(n−4)). The whole sweep is O(days): ordered prefix
    // sums give every segment's 5 moments by subtraction, so each τ
    // is a per-row projection — the q_pps_sampling cumulative-
    // selection shape, never a per-τ scan. Moments are EXACT (micro-
    // unit BIGINT y; DECIMAL(38,0) cross sums); the double algebra
    // runs with explicit association identical in both engines, F
    // rounds to 6dp BEFORE the argmax (ties → smallest τ), so the
    // winner cannot flip cross-engine. The known-date Chow F at the
    // series midpoint rides as a sanity column. 100-TB story: one
    // corpus collapse to the calendar-bounded day frame; the sweep is
    // frame-side and scale-constant.
    sql(
      "q_structural_break",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT d, CAST(rev * 10000 AS BIGINT) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |p AS (SELECT d, rn, y,
        |        CAST(sum(rn) OVER w AS BIGINT) AS cx,
        |        CAST(sum(rn * rn) OVER w AS BIGINT) AS cxx,
        |        CAST(sum(y) OVER w AS DECIMAL(38,0)) AS cy,
        |        CAST(sum(rn * CAST(y AS DECIMAL(28,0))) OVER w
        |          AS DECIMAL(38,0)) AS cxy,
        |        CAST(sum(y * CAST(y AS DECIMAL(28,0))) OVER w
        |          AS DECIMAL(38,0)) AS cyy
        |      FROM o WINDOW w AS (ORDER BY rn ROWS UNBOUNDED PRECEDING)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(rn) AS BIGINT) AS tx,
        |          CAST(sum(rn * rn) AS BIGINT) AS txx,
        |          CAST(sum(y) AS DECIMAL(38,0)) AS ty,
        |          CAST(sum(rn * CAST(y AS DECIMAL(28,0)))
        |            AS DECIMAL(38,0)) AS txy,
        |          CAST(sum(y * CAST(y AS DECIMAL(28,0)))
        |            AS DECIMAL(38,0)) AS tyy
        |        FROM o),
        |f0 AS (SELECT d, rn, tot.n,
        |         CAST(cxx AS DOUBLE) - (CAST(cx AS DOUBLE) * cx) / rn AS sxx1,
        |         CAST(cxy AS DOUBLE)
        |           - (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)) / rn AS sxy1,
        |         CAST(cyy AS DOUBLE)
        |           - (CAST(cy AS DOUBLE) * CAST(cy AS DOUBLE)) / rn AS syy1,
        |         CAST(tot.txx - cxx AS DOUBLE)
        |           - (CAST(tot.tx - cx AS DOUBLE) * (tot.tx - cx))
        |             / (tot.n - rn) AS sxx2,
        |         CAST(tot.txy - cxy AS DOUBLE)
        |           - (CAST(tot.tx - cx AS DOUBLE)
        |              * CAST(tot.ty - cy AS DOUBLE)) / (tot.n - rn) AS sxy2,
        |         CAST(tot.tyy - cyy AS DOUBLE)
        |           - (CAST(tot.ty - cy AS DOUBLE)
        |              * CAST(tot.ty - cy AS DOUBLE)) / (tot.n - rn) AS syy2,
        |         CAST(tot.txx AS DOUBLE)
        |           - (CAST(tot.tx AS DOUBLE) * tot.tx) / tot.n AS sxxp,
        |         CAST(tot.txy AS DOUBLE)
        |           - (CAST(tot.tx AS DOUBLE) * CAST(tot.ty AS DOUBLE))
        |             / tot.n AS sxyp,
        |         CAST(tot.tyy AS DOUBLE)
        |           - (CAST(tot.ty AS DOUBLE) * CAST(tot.ty AS DOUBLE))
        |             / tot.n AS syyp
        |       FROM p CROSS JOIN tot
        |       WHERE rn >= (15 * tot.n + 99) // 100
        |         AND rn <= (85 * tot.n) // 100),
        |f1 AS (SELECT d, rn, n,
        |         syy1 - (sxy1 * sxy1) / sxx1 AS sse1,
        |         syy2 - (sxy2 * sxy2) / sxx2 AS sse2,
        |         syyp - (sxyp * sxyp) / sxxp AS ssep,
        |         sxy1 / sxx1 AS b1, sxy2 / sxx2 AS b2
        |       FROM f0),
        |f2 AS (SELECT d, rn, n, b1, b2,
        |         round(((ssep - (sse1 + sse2)) / 2)
        |               / ((sse1 + sse2) / (n - 4)), 6) AS f6
        |       FROM f1),
        |win AS (SELECT * FROM f2 ORDER BY f6 DESC, rn LIMIT 1),
        |mid AS (SELECT f6 AS fmid FROM f2 WHERE rn = n // 2)
        |SELECT win.n AS n_days, win.rn AS tau, win.d AS break_day,
        |  win.f6 + 0.0 AS f_sup,
        |  round(win.b1 / 10000, 6) + 0.0 AS slope_pre,
        |  round(win.b2 / 10000, 6) + 0.0 AS slope_post,
        |  mid.fmid + 0.0 AS chow_mid_f
        |FROM win CROSS JOIN mid""".stripMargin) { (s, dir) =>
      val daily = dailyDecimal(t(s, dir, "orders"), "o_orderdate",
        "o_totalprice")
      val o = daily
        .select(col("d"), (col("rev") * 10000).cast("long").as("y"))
        .withColumn("rn", row_number().over(Window.orderBy("d")).cast("long"))
        .localCheckpoint() // day frame: prefix pass + total collapse
      val w = Window.orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
      val p = o.select(col("d"), col("rn"),
        sum("rn").over(w).cast("long").as("cx"),
        sum(col("rn") * col("rn")).over(w).cast("long").as("cxx"),
        sum("y").over(w).cast("decimal(38,0)").as("cy"),
        sum(col("rn") * col("y").cast("decimal(28,0)")).over(w)
          .cast("decimal(38,0)").as("cxy"),
        sum(col("y") * col("y").cast("decimal(28,0)")).over(w)
          .cast("decimal(38,0)").as("cyy"))
      val tot = o.agg(count(lit(1)).as("n"),
        sum("rn").cast("long").as("tx"),
        sum(col("rn") * col("rn")).cast("long").as("txx"),
        sum("y").cast("decimal(38,0)").as("ty"),
        sum(col("rn") * col("y").cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("txy"),
        sum(col("y") * col("y").cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("tyy"))
      // association order mirrors the oracle EXACTLY: doubles from
      // exact moments are then bitwise-identical cross-engine
      val f0 = p.crossJoin(broadcast(tot))
        .where(expr("rn >= (15 * n + 99) div 100")
          && expr("rn <= (85 * n) div 100"))
        .select(col("d"), col("rn"), col("n"),
          (col("cxx").cast("double")
            - (col("cx").cast("double") * col("cx")) / col("rn")).as("sxx1"),
          (col("cxy").cast("double")
            - (col("cx").cast("double") * col("cy").cast("double"))
              / col("rn")).as("sxy1"),
          (col("cyy").cast("double")
            - (col("cy").cast("double") * col("cy").cast("double"))
              / col("rn")).as("syy1"),
          ((col("txx") - col("cxx")).cast("double")
            - ((col("tx") - col("cx")).cast("double")
              * (col("tx") - col("cx"))) / (col("n") - col("rn")))
            .as("sxx2"),
          ((col("txy") - col("cxy")).cast("double")
            - ((col("tx") - col("cx")).cast("double")
              * (col("ty") - col("cy")).cast("double"))
              / (col("n") - col("rn"))).as("sxy2"),
          ((col("tyy") - col("cyy")).cast("double")
            - ((col("ty") - col("cy")).cast("double")
              * (col("ty") - col("cy")).cast("double"))
              / (col("n") - col("rn"))).as("syy2"),
          (col("txx").cast("double")
            - (col("tx").cast("double") * col("tx")) / col("n")).as("sxxp"),
          (col("txy").cast("double")
            - (col("tx").cast("double") * col("ty").cast("double"))
              / col("n")).as("sxyp"),
          (col("tyy").cast("double")
            - (col("ty").cast("double") * col("ty").cast("double"))
              / col("n")).as("syyp"))
      val f1 = f0.select(col("d"), col("rn"), col("n"),
        (col("syy1") - (col("sxy1") * col("sxy1")) / col("sxx1")).as("sse1"),
        (col("syy2") - (col("sxy2") * col("sxy2")) / col("sxx2")).as("sse2"),
        (col("syyp") - (col("sxyp") * col("sxyp")) / col("sxxp")).as("ssep"),
        (col("sxy1") / col("sxx1")).as("b1"),
        (col("sxy2") / col("sxx2")).as("b2"))
      val f2 = f1.select(col("d"), col("rn"), col("n"), col("b1"),
          col("b2"),
          round(((col("ssep") - (col("sse1") + col("sse2"))) / 2)
            / ((col("sse1") + col("sse2")) / (col("n") - 4)), 6).as("f6"))
        .localCheckpoint() // trimmed candidate frame, read twice
      val win = f2.orderBy(desc("f6"), col("rn")).limit(1)
      val mid = f2.where(expr("rn = n div 2"))
        .select(col("f6").as("fmid"))
      win.crossJoin(broadcast(mid))
        .select(col("n").as("n_days"), col("rn").as("tau"),
          col("d").as("break_day"), (col("f6") + 0.0).as("f_sup"),
          (round(col("b1") / 10000, 6) + 0.0).as("slope_pre"),
          (round(col("b2") / 10000, 6) + 0.0).as("slope_post"),
          (col("fmid") + 0.0).as("chow_mid_f"))
    }
  )
}
