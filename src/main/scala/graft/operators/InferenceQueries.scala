package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regression-inference operators added in r12: robust/quantile
  * regression, heteroscedasticity and serial-correlation corrections,
  * survival regression, k-sample dispersion/location tests, tail-risk
  * measures, and fixed-depth sequential models. Shares the engine's
  * established exactness conventions: corpus-sized sums ride as exact
  * DECIMAL (weights quantized to a fixed scale first, so both engines
  * sum identical rationals in any order), per-round coefficients are
  * rounded to a fixed grid before re-entering the data pass, and only
  * bounded-size frames carry free-floating doubles.
  */
object InferenceQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)
  private def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef.sql(name, oracle)(fn)

  /** One unrolled IRLS round of the median-regression oracle: weights
    * from round p's coefficients (quantized to DECIMAL(14,10)), exact
    * decimal weighted moments, closed-form WLS coefficients rounded to
    * the 8-dp grid. */
  private def irlsRoundSql(r: Int): String = {
    val p = r - 1
    s"""w$r AS (SELECT xd, yd, x, y, abs(y - c.a - c.b * x) AS ae,
       |    CAST(round(1.0e0 / greatest(0.01e0, abs(y - c.a - c.b * x)), 10)
       |         AS DECIMAL(14,10)) AS wq
       |    FROM xy CROSS JOIN c$p c),
       |u$r AS (SELECT ae, yd, xd,
       |     CAST(CAST(wq AS DECIMAL(20,10)) * xd AS DECIMAL(20,12)) AS wx,
       |     CAST(CAST(wq AS DECIMAL(20,10)) * yd AS DECIMAL(32,12)) AS wy,
       |     wq FROM w$r),
       |s$r AS (SELECT round(sum(ae) / count(*), 6) AS mae_prev,
       |     sum(wq) AS sw, sum(wx) AS swx, sum(wy) AS swy,
       |     sum(CAST(CAST(wx AS DECIMAL(22,12)) * xd AS DECIMAL(36,14))) AS swxx,
       |     sum(CAST(CAST(wx AS DECIMAL(22,12)) * yd AS DECIMAL(36,14))) AS swxy
       |     FROM u$r),
       |c$r AS (SELECT round((CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
       |             - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
       |       / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
       |             - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)), 8) AS b,
       |     round((CAST(swy AS DOUBLE) - (CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
       |             - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
       |       / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
       |             - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE))
       |         * CAST(swx AS DOUBLE)) / CAST(sw AS DOUBLE), 8) AS a,
       |     mae_prev FROM s$r)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- median (tau = 0.5) quantile regression via bounded IRLS ----
    // The L1 companion to q_ols_multi (Koenker & Bassett 1978 via
    // iteratively-reweighted least squares): minimize sum |y - a - bx|
    // over lineitem (y = extendedprice, x = quantity) by 5 WLS rounds
    // with w_i = 1 / max(0.01, |r_i|), OLS init. Bounded-round IRLS is
    // the engine's iterative-estimator convention (q_theta_forecast,
    // q_logistic_train): DETERMINISTIC rounds, not convergence-tested.
    // Cross-engine exactness: per-row residuals are IEEE-identical
    // (coefficients re-enter each pass rounded to the 8-dp grid from
    // EXACT decimal moments), weights are quantized to DECIMAL(14,10)
    // before the weighted sums, so every corpus-sized sum is an exact
    // decimal both engines agree on bit-for-bit regardless of
    // summation order; the lone double sum (the L1 objective) has
    // ~1e-10 absolute error against a 5e-7 rounding boundary. Output:
    // the full iteration trace (step 0 = OLS) with the objective under
    // each step's coefficients — pins every round, not just the last.
    // 100-TB story: 7 linear passes over a 4-column projected frame
    // (checkpointed once), each collapsing map-side to ONE row;
    // coefficient frames are 1-row broadcasts; no corpus shuffle at
    // all. Decade cost = 7 x scan.
    sql(
      "q_quantile_reg",
      s"""WITH xy AS (SELECT CAST(l_quantity AS DECIMAL(15,2)) AS xd,
         |            CAST(l_extendedprice AS DECIMAL(15,2)) AS yd,
         |            CAST(l_quantity AS DOUBLE) AS x,
         |            CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem),
         |m0 AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(xd) AS sx,
         |        sum(yd) AS sy,
         |        sum(CAST(CAST(xd AS DECIMAL(17,2)) * xd AS DECIMAL(32,4))) AS sxx,
         |        sum(CAST(CAST(xd AS DECIMAL(17,2)) * yd AS DECIMAL(32,4))) AS sxy
         |       FROM xy),
         |c0 AS (SELECT round((n * CAST(sxy AS DOUBLE)
         |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |       / (n * CAST(sxx AS DOUBLE)
         |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 8) AS b,
         |     round((CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE)
         |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |       / (n * CAST(sxx AS DOUBLE)
         |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |         * CAST(sx AS DOUBLE)) / n, 8) AS a
         |       FROM m0),
         |${(1 to 5).map(irlsRoundSql).mkString(",\n")},
         |f AS (SELECT round(sum(abs(y - c.a - c.b * x)) / count(*), 6) AS mae
         |      FROM xy CROSS JOIN c5 c)
         |SELECT step, a + 0.0 AS a, b + 0.0 AS b, mae_next + 0.0 AS mae_next
         |FROM (
         |  SELECT CAST(0 AS BIGINT) AS step, a, b,
         |         (SELECT mae_prev FROM c1) AS mae_next FROM c0
         |  UNION ALL SELECT 1, a, b, (SELECT mae_prev FROM c2) FROM c1
         |  UNION ALL SELECT 2, a, b, (SELECT mae_prev FROM c3) FROM c2
         |  UNION ALL SELECT 3, a, b, (SELECT mae_prev FROM c4) FROM c3
         |  UNION ALL SELECT 4, a, b, (SELECT mae_prev FROM c5) FROM c4
         |  UNION ALL SELECT 5, a, b, (SELECT mae FROM f) FROM c5
         |) ORDER BY step""".stripMargin) { (s, dir) =>
      // Repartitioned BEFORE the checkpoint: the sf0.1 parquet scan
      // yields 3 row-group splits, and the per-pass BigDecimal moment
      // math (wide decimals run off the compact-Long path) would
      // otherwise grind on 3 tasks for all 7 passes — one cheap
      // round-robin exchange buys full-width CPU for every pass.
      val xy = t(s, dir, "lineitem")
        .select(col("l_quantity").cast("decimal(15,2)").as("xd"),
          col("l_extendedprice").cast("decimal(15,2)").as("yd"),
          col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").cast("double").as("y"))
        .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .localCheckpoint() // 7 one-row collapses read this projection
      val m0 = xy.agg(count(lit(1)).as("n"),
        sum("xd").as("sx"), sum("yd").as("sy"),
        sum((col("xd").cast("decimal(17,2)") * col("xd"))
          .cast("decimal(32,4)")).as("sxx"),
        sum((col("xd").cast("decimal(17,2)") * col("yd"))
          .cast("decimal(32,4)")).as("sxy"))
      val b0 = (col("n") * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double")) /
        (col("n") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
      val c0 = m0.select(round(b0, 8).as("b"),
        round((col("sy").cast("double") - b0 * col("sx").cast("double"))
          / col("n"), 8).as("a"))
        .localCheckpoint() // break the pass chain: 1-row frames
      // 5 IRLS rounds; each coef frame is checkpointed so round r's
      // plan holds ONE corpus pass, not a nest of all prior rounds
      val coefs = scala.collection.mutable.ArrayBuffer(c0)
      for (_ <- 1 to 5) {
        val w = xy.crossJoin(broadcast(coefs.last.select("a", "b")))
          .withColumn("ae", abs(col("y") - col("a") - col("b") * col("x")))
          .withColumn("wq",
            round(lit(1.0) / greatest(lit(0.01), col("ae")), 10)
              .cast("decimal(14,10)"))
          .withColumn("wx", (col("wq").cast("decimal(20,10)") * col("xd"))
            .cast("decimal(20,12)"))
          .withColumn("wy", (col("wq").cast("decimal(20,10)") * col("yd"))
            .cast("decimal(32,12)"))
        val sr = w.agg(
          round(sum("ae") / count(lit(1)), 6).as("mae_prev"),
          sum("wq").as("sw"), sum("wx").as("swx"), sum("wy").as("swy"),
          sum((col("wx").cast("decimal(22,12)") * col("xd"))
            .cast("decimal(36,14)")).as("swxx"),
          sum((col("wx").cast("decimal(22,12)") * col("yd"))
            .cast("decimal(36,14)")).as("swxy"))
        val bR = (col("sw").cast("double") * col("swxy").cast("double")
          - col("swx").cast("double") * col("swy").cast("double")) /
          (col("sw").cast("double") * col("swxx").cast("double")
            - col("swx").cast("double") * col("swx").cast("double"))
        coefs += sr.select(round(bR, 8).as("b"),
          round((col("swy").cast("double") - bR * col("swx").cast("double"))
            / col("sw").cast("double"), 8).as("a"),
          col("mae_prev"))
          .localCheckpoint()
      }
      val fin = xy.crossJoin(broadcast(coefs.last.select("a", "b")))
        .agg(round(sum(abs(col("y") - col("a") - col("b") * col("x")))
          / count(lit(1)), 6).as("mae"))
      val rows = (0 to 5).map { r =>
        val m =
          if (r < 5) coefs(r + 1).select(col("mae_prev").as("mae_next"))
          else fin.select(col("mae").as("mae_next"))
        coefs(r).select(col("a"), col("b")).crossJoin(broadcast(m))
          .select(lit(r.toLong).as("step"), col("a"), col("b"),
            col("mae_next"))
      }
      rows.reduce(_ unionAll _)
        .select(col("step"), (col("a") + 0.0).as("a"),
          (col("b") + 0.0).as("b"), (col("mae_next") + 0.0).as("mae_next"))
        .orderBy("step")
    },

    // ---- Cox proportional hazards (one binary covariate) ----
    // The regression member of the survival family (q_survival_km /
    // q_nelson_aalen / q_logrank_test): Breslow partial likelihood
    // over the SAME death-time frame as q_logrank_test (duration =
    // signup→conversion days, covariate = the user-cohort split), 3
    // Newton rounds from beta = 0. With a binary covariate the risk
    // sums collapse to EXACT INTEGER risk counts — S0 = n0 + n1·e^b,
    // S1 = n1·e^b — so each round is per-distinct-time double math on
    // integers plus one tiny sum; beta re-enters each round rounded
    // to the 8-dp grid (sum noise ~1e-13 vs the 5e-9 boundary).
    // Newton step 1 from beta=0 IS the logrank score test — the trace
    // pins that identity as data. Output per round: beta, the score
    // U(beta_prev), information I(beta_prev), hazard ratio e^beta,
    // se = 1/sqrt(I), Wald z. 100-TB story: one corpus pass to the
    // per-user frame, one keyed collapse to the death-time frame
    // (≤ horizon days rows, checkpointed once), then 3 one-row
    // collapses on it — corpus cost identical to q_logrank_test.
    sql(
      "q_cox_ph",
      s"""WITH u AS (SELECT user_id, min(ts) AS first_ts,
         |        min(CASE WHEN event_type = 'purchase' THEN ts END) AS conv_ts
         |      FROM events GROUP BY 1),
         |h AS (SELECT CAST(max(ts) AS TIMESTAMP) AS endt FROM events),
         |s AS (SELECT user_id % 2 AS grp,
         |        CASE WHEN conv_ts IS NOT NULL
         |             THEN CAST(date_diff('day', CAST(first_ts AS DATE),
         |                                 CAST(conv_ts AS DATE)) AS BIGINT)
         |             ELSE CAST(date_diff('day', CAST(first_ts AS DATE),
         |                                 CAST(h.endt AS DATE)) AS BIGINT)
         |             END AS dur,
         |        CASE WHEN conv_ts IS NOT NULL THEN 1 ELSE 0 END AS died
         |      FROM u CROSS JOIN h),
         |t AS (SELECT dur, CAST(sum(died) AS BIGINT) AS d,
         |        CAST(sum(CASE WHEN grp = 1 THEN died ELSE 0 END) AS BIGINT)
         |          AS d1,
         |        CAST(count(*) AS BIGINT) AS ev,
         |        CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |          AS ev1
         |      FROM s GROUP BY 1),
         |tot AS (SELECT CAST(sum(ev) AS BIGINT) AS n_all,
         |          CAST(sum(ev1) AS BIGINT) AS n1_all FROM t),
         |r AS (SELECT dur, d, d1,
         |        tot.n_all - CAST(coalesce(sum(ev) OVER (ORDER BY dur
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS BIGINT) AS n_risk,
         |        tot.n1_all - CAST(coalesce(sum(ev1) OVER (ORDER BY dur
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS BIGINT) AS n_risk1
         |      FROM t CROSS JOIN tot),
         |e AS (SELECT dur, d, d1, n_risk1 AS n1, n_risk - n_risk1 AS n0
         |      FROM r WHERE d > 0),
         |b0 AS (SELECT 0.0e0 AS beta),
         |${(1 to 3).map(coxRoundSql).mkString(",\n")}
         |SELECT step, beta + 0.0 AS beta, u_score + 0.0 AS u_score,
         |  info + 0.0 AS info,
         |  round(exp(beta), 6) + 0.0 AS hazard_ratio,
         |  round(1.0e0 / sqrt(info_raw), 6) + 0.0 AS se,
         |  round(beta * sqrt(info_raw), 6) + 0.0 AS wald_z
         |FROM (
         |  SELECT CAST(1 AS BIGINT) AS step, beta, u_score, info,
         |         (SELECT info FROM g1) AS info_raw FROM b1
         |  UNION ALL SELECT 2, beta, u_score, info,
         |         (SELECT info FROM g2) FROM b2
         |  UNION ALL SELECT 3, beta, u_score, info,
         |         (SELECT info FROM g3) FROM b3
         |) ORDER BY step""".stripMargin) { (s, dir) =>
      val u = t(s, dir, "events")
        .groupBy("user_id")
        .agg(min("ts").as("first_ts"),
          min(when(col("event_type") === "purchase", col("ts")))
            .as("conv_ts"))
      val h = t(s, dir, "events").agg(max("ts").as("endt"))
      val sdf = u.crossJoin(broadcast(h))
        .select((col("user_id") % 2).as("grp"),
          when(col("conv_ts").isNotNull,
            datediff(to_date(col("conv_ts")), to_date(col("first_ts"))))
            .otherwise(datediff(to_date(col("endt")),
              to_date(col("first_ts"))))
            .cast("long").as("dur"),
          when(col("conv_ts").isNotNull, 1L).otherwise(0L).as("died"))
      val tt = sdf.groupBy("dur")
        .agg(sum("died").cast("long").as("d"),
          sum(when(col("grp") === 1, col("died")).otherwise(0L))
            .cast("long").as("d1"),
          count(lit(1)).as("ev"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).cast("long")
            .as("ev1"))
      val tot = tt.agg(sum("ev").cast("long").as("n_all"),
        sum("ev1").cast("long").as("n1_all"))
      val wPrev = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
      val e = tt.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("n_all") - coalesce(sum("ev").over(wPrev), lit(0L))
            .cast("long"))
        .withColumn("n_risk1",
          col("n1_all") - coalesce(sum("ev1").over(wPrev), lit(0L))
            .cast("long"))
        .where(col("d") > 0)
        .select(col("dur"), col("d"), col("d1"),
          col("n_risk1").as("n1"), (col("n_risk") - col("n_risk1")).as("n0"))
        .localCheckpoint() // death-time frame: 3 Newton passes read it
      // 3 Newton rounds; each round's (beta, u, info) is a 1-row
      // checkpoint so round k's plan holds one tiny pass, not a nest
      var betas = Vector(
        e.sparkSession.range(1).select(lit(0.0).as("beta")))
      val trace = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.DataFrame]
      for (_ <- 1 to 3) {
        val p = e.crossJoin(broadcast(betas.last.select("beta")))
          .withColumn("pr", (col("n1") * exp(col("beta")))
            / (col("n0") + col("n1") * exp(col("beta"))))
        val g = p.agg(
          sum(col("d1") - col("d") * col("pr")).as("u_raw"),
          sum(col("d") * col("pr") * (lit(1.0) - col("pr"))).as("info_raw"),
          first(col("beta")).as("beta_prev"))
        val bNew = g.select(
          round(col("beta_prev") + col("u_raw") / col("info_raw"), 8)
            .as("beta"),
          round(col("u_raw"), 6).as("u_score"),
          round(col("info_raw"), 6).as("info"),
          col("info_raw"))
          .localCheckpoint()
        trace += bNew
        betas :+= bNew.select("beta")
      }
      val rows = trace.zipWithIndex.map { case (b, i) =>
        b.select(lit((i + 1).toLong).as("step"), col("beta"),
          col("u_score"), col("info"), col("info_raw"))
      }
      rows.reduce(_ unionAll _)
        .select(col("step"), (col("beta") + 0.0).as("beta"),
          (col("u_score") + 0.0).as("u_score"),
          (col("info") + 0.0).as("info"),
          (round(exp(col("beta")), 6) + 0.0).as("hazard_ratio"),
          (round(lit(1.0) / sqrt(col("info_raw")), 6) + 0.0).as("se"),
          (round(col("beta") * sqrt(col("info_raw")), 6) + 0.0)
            .as("wald_z"))
        .orderBy("step")
    },

    // ---- Breusch–Pagan heteroscedasticity test ----
    // The residual-variance audit that must run before q_ols_multi's
    // standard errors are trusted (Breusch & Pagan 1979): regress the
    // squared OLS residuals on the regressor; LM = n·R²_aux ~ χ²(1)
    // under homoscedasticity. The OLS line comes from EXACT decimal
    // moments rounded to the 8-dp grid (the q_quantile_reg init), so
    // per-row residuals are IEEE-identical cross-engine; the aux
    // moments are double sums whose ~1e-12 relative noise meets a
    // 10-dp rounding of R² (O(1)) with 500x margin, and LM multiplies
    // the ROUNDED R² by the exact n — deterministic at every decade,
    // where rounding n·R² directly would not be. TPC-H's quantity →
    // extendedprice line is near-homoscedastic in the aux-linear
    // sense; the op's value is the shape. 100-TB story: two linear
    // passes (moments, aux moments), each collapsing to one row.
    sql(
      "q_breusch_pagan",
      """WITH xy AS (SELECT CAST(l_quantity AS DECIMAL(15,2)) AS xd,
        |            CAST(l_extendedprice AS DECIMAL(15,2)) AS yd,
        |            CAST(l_quantity AS DOUBLE) AS x,
        |            CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem),
        |m0 AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(xd) AS sx,
        |        sum(yd) AS sy,
        |        sum(CAST(CAST(xd AS DECIMAL(17,2)) * xd AS DECIMAL(32,4))) AS sxx,
        |        sum(CAST(CAST(xd AS DECIMAL(17,2)) * yd AS DECIMAL(32,4))) AS sxy
        |       FROM xy),
        |c0 AS (SELECT n, round((n * CAST(sxy AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / (n * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 8) AS b,
        |     round((CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / (n * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * CAST(sx AS DOUBLE)) / n, 8) AS a
        |       FROM m0),
        |g AS (SELECT x, (y - c.a - c.b * x) * (y - c.a - c.b * x) AS g2
        |      FROM xy CROSS JOIN c0 c),
        |ms AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |        sum(g2) AS sg, sum(x*x) AS sxx2, sum(x*g2) AS sxg,
        |        sum(g2*g2) AS sgg FROM g),
        |rr AS (SELECT n, round(((n*sxg - sx*sg) * (n*sxg - sx*sg))
        |        / ((n*sxx2 - sx*sx) * (n*sgg - sg*sg)), 10) AS r2 FROM ms)
        |SELECT n, r2 + 0.0 AS r2_aux, round(n * r2, 6) + 0.0 AS lm_stat,
        |  CAST(1 AS BIGINT) AS df,
        |  CAST(CASE WHEN n * r2 > 3.841458820694124 THEN 1 ELSE 0 END
        |       AS BIGINT) AS reject_5pct
        |FROM rr""".stripMargin) { (s, dir) =>
      val xy = t(s, dir, "lineitem")
        .select(col("l_quantity").cast("decimal(15,2)").as("xd"),
          col("l_extendedprice").cast("decimal(15,2)").as("yd"),
          col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").cast("double").as("y"))
        .localCheckpoint() // two one-row collapses read this projection
      val m0 = xy.agg(count(lit(1)).as("n"),
        sum("xd").as("sx"), sum("yd").as("sy"),
        sum((col("xd").cast("decimal(17,2)") * col("xd"))
          .cast("decimal(32,4)")).as("sxx"),
        sum((col("xd").cast("decimal(17,2)") * col("yd"))
          .cast("decimal(32,4)")).as("sxy"))
      val b0 = (col("n") * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double")) /
        (col("n") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
      val c0 = m0.select(col("n"), round(b0, 8).as("b"),
        round((col("sy").cast("double") - b0 * col("sx").cast("double"))
          / col("n"), 8).as("a"))
      val g = xy.crossJoin(broadcast(c0.select("a", "b")))
        .select(col("x"),
          ((col("y") - col("a") - col("b") * col("x"))
            * (col("y") - col("a") - col("b") * col("x"))).as("g2"))
      val ms = g.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("g2").as("sg"), sum(col("x") * col("x")).as("sxx2"),
        sum(col("x") * col("g2")).as("sxg"),
        sum(col("g2") * col("g2")).as("sgg"))
      val r2 = round(((col("n") * col("sxg") - col("sx") * col("sg"))
        * (col("n") * col("sxg") - col("sx") * col("sg")))
        / ((col("n") * col("sxx2") - col("sx") * col("sx"))
          * (col("n") * col("sgg") - col("sg") * col("sg"))), 10)
      ms.select(col("n"), (r2 + 0.0).as("r2_aux"),
        (round(col("n") * r2, 6) + 0.0).as("lm_stat"),
        lit(1L).as("df"),
        when(col("n") * r2 > 3.841458820694124, 1L).otherwise(0L)
          .as("reject_5pct"))
    },

    // ---- Bartlett's test (k-sample variance homogeneity) ----
    // The parametric sibling of q_levene_test (Bartlett 1937): are the
    // five event-type value variances equal? T = [(N−k)·ln s²_pooled −
    // Σ(n_j−1)·ln s²_j] / C with the Box correction C. Per-type
    // moments ride as EXACT DECIMAL (the q_theta_forecast (18,6)
    // quantization of the double value column — both engines round
    // the same doubles to the same decimals), so the five variances
    // are IEEE-identical; the k-row collapse is double math at O(1)
    // magnitudes. χ²₍₄,.05₎ rides as the family's pinned literal.
    // 100-TB story: one corpus pass to 5 rows, 1-row math.
    sql(
      "q_bartlett_test",
      """WITH v AS (SELECT event_type, CAST(value AS DECIMAL(18,6)) AS vd
        |           FROM events),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nj, sum(vd) AS s,
        |        sum(CAST(CAST(vd AS DECIMAL(19,6)) * vd AS DECIMAL(37,12)))
        |          AS s2
        |      FROM v GROUP BY 1),
        |gv AS (SELECT event_type, nj,
        |        (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nj)
        |          / (nj - 1) AS var_j
        |       FROM g),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |         CAST(sum(nj) AS BIGINT) AS n_all,
        |         sum((nj - 1) * var_j) AS ssw,
        |         sum((nj - 1) * ln(var_j)) AS slnv,
        |         sum(1.0e0 / (nj - 1)) AS sinv
        |        FROM gv),
        |st AS (SELECT k, n_all,
        |        ((n_all - k) * ln(ssw / (n_all - k)) - slnv)
        |        / (1.0e0 + (sinv - 1.0e0 / (n_all - k)) / (3.0e0 * (k - 1)))
        |          AS t_stat
        |       FROM agg)
        |SELECT k, n_all, round(t_stat, 6) + 0.0 AS bartlett_t,
        |  CAST(k - 1 AS BIGINT) AS df,
        |  CAST(CASE WHEN t_stat > 9.487729036781154 THEN 1 ELSE 0 END
        |       AS BIGINT) AS reject_5pct
        |FROM st""".stripMargin) { (s, dir) =>
      val g = t(s, dir, "events")
        .select(col("event_type"), col("value").cast("decimal(18,6)").as("vd"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("nj"), sum("vd").as("s"),
          sum((col("vd").cast("decimal(19,6)") * col("vd"))
            .cast("decimal(37,12)")).as("s2"))
      val varJ = (col("s2").cast("double")
        - col("s").cast("double") * col("s").cast("double") / col("nj"))
        ./(col("nj") - 1)
      val agg = g.select(col("nj"), varJ.as("var_j"))
        .agg(count(lit(1)).as("k"), sum("nj").cast("long").as("n_all"),
          sum((col("nj") - 1) * col("var_j")).as("ssw"),
          sum((col("nj") - 1) * log(col("var_j"))).as("slnv"),
          sum(lit(1.0) / (col("nj") - 1)).as("sinv"))
      val tStat = ((col("n_all") - col("k"))
        * log(col("ssw") / (col("n_all") - col("k"))) - col("slnv")) /
        (lit(1.0) + (col("sinv") - lit(1.0) / (col("n_all") - col("k")))
          / (lit(3.0) * (col("k") - 1)))
      agg.select(col("k"), col("n_all"),
        (round(tStat, 6) + 0.0).as("bartlett_t"),
        (col("k") - 1).cast("long").as("df"),
        when(tStat > 9.487729036781154, 1L).otherwise(0L).as("reject_5pct"))
    },

    // ---- Mood's median test (k-sample location on counts) ----
    // The distribution-free sibling of q_kruskal_wallis: classify each
    // event value as above/below the GLOBAL median and Pearson-χ² the
    // resulting 2×k table. The median is the engine's sketch-guided
    // exact selection ([[ExactQuantiles]] — quantile_cont semantics,
    // the same interpolation formula DuckDB's quantile_cont uses, so
    // the cut point is the identical double on both engines); all
    // counts are exact integers and the χ² collapse is k-row double
    // math. 100-TB story: the ExactQuantiles two-pass selection plus
    // one counting pass — no global sort ever materializes.
    sql(
      "q_mood_median",
      """WITH m AS (SELECT quantile_cont(value, 0.5) AS med FROM events),
        |c AS (SELECT e.event_type, CAST(count(*) AS BIGINT) AS nj,
        |        CAST(sum(CASE WHEN e.value > m.med THEN 1 ELSE 0 END)
        |          AS BIGINT) AS aj
        |      FROM events e CROSS JOIN m GROUP BY 1),
        |tt AS (SELECT CAST(sum(nj) AS BIGINT) AS n_all,
        |        CAST(sum(aj) AS BIGINT) AS a_all,
        |        CAST(count(*) AS BIGINT) AS k FROM c),
        |x AS (SELECT c.event_type, c.nj, c.aj,
        |        CAST(c.nj AS DOUBLE) * tt.a_all / tt.n_all AS e_j,
        |        tt.n_all, tt.a_all, tt.k FROM c CROSS JOIN tt),
        |q AS (SELECT max(k) AS k, max(n_all) AS n_all, max(a_all) AS a_all,
        |        sum((aj - e_j) * (aj - e_j)
        |          / (e_j * (1.0e0 - CAST(a_all AS DOUBLE) / n_all))) AS chi2
        |      FROM x)
        |SELECT c.event_type, c.nj, c.aj, round(x.e_j, 6) + 0.0
        |    AS expected_above,
        |  round(q.chi2, 6) + 0.0 AS chi2_stat, CAST(q.k - 1 AS BIGINT) AS df,
        |  CAST(CASE WHEN q.chi2 > 9.487729036781154 THEN 1 ELSE 0 END
        |       AS BIGINT) AS reject_5pct
        |FROM c JOIN x ON x.event_type = c.event_type CROSS JOIN q
        |ORDER BY c.event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val m = ExactQuantiles(ev, "value", Seq(0.5), Seq("med"))
        .select("med")
      val c = ev.crossJoin(broadcast(m))
        .groupBy("event_type")
        .agg(count(lit(1)).as("nj"),
          sum(when(col("value") > col("med"), 1L).otherwise(0L))
            .cast("long").as("aj"))
        .localCheckpoint() // 5-row table: totals + chi2 read it
      val tt = c.agg(sum("nj").cast("long").as("n_all"),
        sum("aj").cast("long").as("a_all"), count(lit(1)).as("k"))
      val x = c.crossJoin(broadcast(tt))
        .withColumn("e_j",
          col("nj").cast("double") * col("a_all") / col("n_all"))
      val q = x.agg(max("k").as("k"), max("n_all").as("n_all"),
        max("a_all").as("a_all"),
        sum((col("aj") - col("e_j")) * (col("aj") - col("e_j"))
          / (col("e_j") * (lit(1.0)
            - col("a_all").cast("double") / col("n_all")))).as("chi2"))
      x.select(col("event_type"), col("nj"), col("aj"),
          (round(col("e_j"), 6) + 0.0).as("expected_above"))
        .crossJoin(broadcast(q))
        .select(col("event_type"), col("nj"), col("aj"),
          col("expected_above"),
          (round(col("chi2"), 6) + 0.0).as("chi2_stat"),
          (col("k") - 1).cast("long").as("df"),
          when(col("chi2") > 9.487729036781154, 1L).otherwise(0L)
            .as("reject_5pct"))
        .orderBy("event_type")
    },

    // ---- Weibull fit (median-rank regression on durations) ----
    // The parametric-lifetime complement to q_survival_km: fit the
    // signup→conversion durations to a Weibull by the reliability
    // engineer's median-rank regression — ln t against
    // ln(−ln(1 − F_i)), F_i = (i − 0.3)/(n + 0.4) (Bernard's
    // approximation), slope = shape k, scale = exp(−intercept/k).
    // Ranks are deterministic (order by dur, user_id), F is an exact
    // rational per row, the log-log frame is O(converted users) with
    // O(1)-magnitude values — double moment sums meet the 6-dp round
    // with 1e6x margin. shape > 1 reads as "conversion hazard rises
    // with age". 100-TB story: one corpus pass to per-user durations,
    // a rank window over the converted subset, one 1-row collapse.
    sql(
      "q_weibull_fit",
      """WITH u AS (SELECT user_id, min(ts) AS first_ts,
        |        min(CASE WHEN event_type = 'purchase' THEN ts END) AS conv_ts
        |      FROM events GROUP BY 1),
        |s AS (SELECT user_id,
        |        CAST(date_diff('day', CAST(first_ts AS DATE),
        |                       CAST(conv_ts AS DATE)) AS BIGINT) AS dur
        |      FROM u WHERE conv_ts IS NOT NULL),
        |d AS (SELECT user_id, dur FROM s WHERE dur > 0),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_obs FROM d),
        |o AS (SELECT dur, CAST(row_number() OVER (ORDER BY dur, user_id)
        |        AS BIGINT) AS rn FROM d),
        |p AS (SELECT ln(CAST(dur AS DOUBLE)) AS lx,
        |        ln(-ln(1.0e0 - (rn - 0.3e0) / (nn.n_obs + 0.4e0))) AS ly
        |      FROM o CROSS JOIN nn),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_obs, sum(lx) AS sx,
        |        sum(ly) AS sy, sum(lx*lx) AS sxx, sum(lx*ly) AS sxy FROM p),
        |c AS (SELECT n_obs, (n_obs*sxy - sx*sy) / (n_obs*sxx - sx*sx)
        |          AS shape_k,
        |        ((sy - (n_obs*sxy - sx*sy) / (n_obs*sxx - sx*sx) * sx)
        |          / n_obs) AS icpt FROM m)
        |SELECT n_obs, round(shape_k, 6) + 0.0 AS shape_k,
        |  round(exp(-icpt / shape_k), 6) + 0.0 AS scale_days
        |FROM c""".stripMargin) { (s, dir) =>
      val u = t(s, dir, "events")
        .groupBy("user_id")
        .agg(min("ts").as("first_ts"),
          min(when(col("event_type") === "purchase", col("ts")))
            .as("conv_ts"))
      val d = u.where(col("conv_ts").isNotNull)
        .select(col("user_id"),
          datediff(to_date(col("conv_ts")), to_date(col("first_ts")))
            .cast("long").as("dur"))
        .where(col("dur") > 0)
        .localCheckpoint() // converted-user frame: count + rank window
      val nn = d.agg(count(lit(1)).as("n_obs"))
      val o = d.withColumn("rn",
        row_number().over(Window.orderBy("dur", "user_id")).cast("long"))
      val p = o.crossJoin(broadcast(nn))
        .select(log(col("dur").cast("double")).as("lx"),
          log(-log(lit(1.0) - (col("rn") - lit(0.3))
            / (col("n_obs") + lit(0.4)))).as("ly"))
      val m = p.agg(count(lit(1)).as("n_obs"), sum("lx").as("sx"),
        sum("ly").as("sy"), sum(col("lx") * col("lx")).as("sxx"),
        sum(col("lx") * col("ly")).as("sxy"))
      val shapeK = (col("n_obs") * col("sxy") - col("sx") * col("sy")) /
        (col("n_obs") * col("sxx") - col("sx") * col("sx"))
      val icpt = (col("sy") - shapeK * col("sx")) / col("n_obs")
      m.select(col("n_obs"), (round(shapeK, 6) + 0.0).as("shape_k"),
        (round(exp(-icpt / shapeK), 6) + 0.0).as("scale_days"))
    },

    // ---- expected shortfall / CVaR (per-nation daily revenue) ----
    // The coherent tail-risk measure q_percentile cannot express: per
    // nation, the 5% Value-at-Risk of day-over-day revenue returns by
    // EXACT nearest-rank selection (rank ceil(0.05·n) by return asc,
    // day as the deterministic tiebreak) and the expected shortfall =
    // mean of the returns at-or-below that rank. Returns divide two
    // exact decimal day revenues — identical doubles cross-engine;
    // the tail mean sums ≤ ceil(0.05·n) O(1) doubles. 100-TB story:
    // one keyed collapse to the nation×day frame, per-nation windows
    // on bounded day counts — the corpus never globally sorts.
    sql(
      "q_expected_shortfall",
      """WITH rev AS (SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
        |          sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rv
        |        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |        JOIN nation n ON n.n_nationkey = c.c_nationkey
        |        GROUP BY 1, 2),
        |r AS (SELECT n_name, day, CAST(rv AS DOUBLE)
        |        / lag(CAST(rv AS DOUBLE)) OVER (PARTITION BY n_name
        |            ORDER BY day) - 1.0e0 AS ret
        |      FROM rev),
        |rr AS (SELECT n_name, day, ret FROM r WHERE ret IS NOT NULL),
        |k AS (SELECT n_name, CAST(count(*) AS BIGINT) AS cnt FROM rr
        |      GROUP BY 1),
        |o2 AS (SELECT rr.n_name, rr.ret,
        |        CAST(row_number() OVER (PARTITION BY rr.n_name
        |            ORDER BY rr.ret, rr.day) AS BIGINT) AS rn
        |       FROM rr),
        |pick AS (SELECT k.n_name, k.cnt,
        |          CAST(ceil(0.05e0 * k.cnt) AS BIGINT) AS tail_n FROM k),
        |tails AS (SELECT o2.n_name, o2.ret, p.cnt, p.tail_n, o2.rn
        |          FROM o2 JOIN pick p ON p.n_name = o2.n_name
        |          WHERE o2.rn <= p.tail_n)
        |SELECT n_name, max(cnt) AS n_days, max(tail_n) AS tail_n,
        |  round(max(CASE WHEN rn = tail_n THEN ret END), 6) + 0.0
        |    AS var_5pct,
        |  round(sum(ret) / max(tail_n), 6) + 0.0 AS es_5pct
        |FROM tails GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
      val wDay = Window.partitionBy("n_name").orderBy("day")
      val rr = rev
        .withColumn("ret", col("rv").cast("double")
          / lag(col("rv").cast("double"), 1).over(wDay) - lit(1.0))
        .where(col("ret").isNotNull)
        .select("n_name", "day", "ret")
        .localCheckpoint() // nation×day frame: counts + rank window
      val k = rr.groupBy("n_name").agg(count(lit(1)).as("cnt"))
      val o2 = rr.withColumn("rn",
        row_number().over(Window.partitionBy("n_name")
          .orderBy("ret", "day")).cast("long"))
      val pick = k.select(col("n_name").as("pn"), col("cnt"),
        ceil(lit(0.05) * col("cnt")).cast("long").as("tail_n"))
      o2.join(broadcast(pick), col("n_name") === col("pn"))
        .where(col("rn") <= col("tail_n"))
        .groupBy("n_name")
        .agg(max("cnt").as("n_days"), max("tail_n").as("tail_n"),
          (round(max(when(col("rn") === col("tail_n"), col("ret"))), 6)
            + 0.0).as("var_5pct"),
          (round(sum("ret") / max("tail_n"), 6) + 0.0).as("es_5pct"))
        .orderBy("n_name")
    },

    // ---- partial autocorrelation (Durbin–Levinson to lag 4) ----
    // The AR-order-selection companion to q_ljung_box: PACF via the
    // Durbin–Levinson recursion unrolled to lag 4, on the SAME
    // micro-unit exact-decimal ACF machinery (daily revenue in
    // 10⁻⁴-unit BIGINTs, lag cross-products as DECIMAL(38,0)) — the
    // r_k inputs are bit-identical cross-engine, so the fixed-depth
    // recursion (pure +/×/÷ on a 1-row frame) is too. An AR(p) series
    // shows PACF cutting off after lag p where the ACF tails — the
    // pair q_pacf/q_ljung_box is the Box–Jenkins identification page.
    // 100-TB story: one keyed collapse to the day frame, 4 bounded
    // lag joins on it, 1-row math.
    sql(
      "q_pacf",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4))
        |      AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT CAST(rev * 10000 AS BIGINT) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(y) AS DECIMAL(38,0)) AS sy,
        |        CAST(sum(y * CAST(y AS DECIMAL(28,0))) AS DECIMAL(38,0))
        |          AS syy
        |      FROM o),
        |lags AS (SELECT unnest(generate_series(1, 4)) AS k),
        |p AS (SELECT l.k AS k,
        |        CAST(sum(a.y * CAST(b.y AS DECIMAL(28,0))) AS DECIMAL(38,0))
        |          AS ck,
        |        CAST(sum(a.y) AS DECIMAL(38,0)) AS hk,
        |        CAST(sum(b.y) AS DECIMAL(38,0)) AS tk
        |      FROM o a CROSS JOIN lags l
        |      JOIN o b ON b.rn = a.rn + l.k GROUP BY 1),
        |r AS (SELECT p.k,
        |        (CAST(p.ck AS DOUBLE)
        |           - (CAST(g.sy AS DOUBLE) / g.n)
        |             * (CAST(p.hk AS DOUBLE) + CAST(p.tk AS DOUBLE))
        |           + (g.n - p.k) * ((CAST(g.sy AS DOUBLE) / g.n)
        |             * (CAST(g.sy AS DOUBLE) / g.n)))
        |        / (CAST(g.syy AS DOUBLE)
        |           - (CAST(g.sy AS DOUBLE) * CAST(g.sy AS DOUBLE)) / g.n)
        |          AS rk
        |      FROM p CROSS JOIN g),
        |w AS (SELECT max(CASE WHEN k=1 THEN rk END) AS r1,
        |       max(CASE WHEN k=2 THEN rk END) AS r2,
        |       max(CASE WHEN k=3 THEN rk END) AS r3,
        |       max(CASE WHEN k=4 THEN rk END) AS r4,
        |       (SELECT n FROM g) AS n FROM r),
        |dl AS (SELECT n, r1, r2, r3, r4, r1 AS f11,
        |        (r2 - r1 * r1) / (1.0e0 - r1 * r1) AS f22 FROM w),
        |d2 AS (SELECT *, r1 - f22 * r1 AS f21 FROM dl),
        |d3 AS (SELECT *, (r3 - f21 * r2 - f22 * r1)
        |        / (1.0e0 - f21 * r1 - f22 * r2) AS f33 FROM d2),
        |d4 AS (SELECT *, f21 - f33 * f22 AS f31, f22 - f33 * f21 AS f32
        |       FROM d3),
        |d5 AS (SELECT *, (r4 - f31 * r3 - f32 * r2 - f33 * r1)
        |        / (1.0e0 - f31 * r1 - f32 * r2 - f33 * r3) AS f44 FROM d4)
        |SELECT CAST(k AS BIGINT) AS k, n AS n_days,
        |  round(acf, 6) + 0.0 AS acf, round(pacf, 6) + 0.0 AS pacf
        |FROM (
        |  SELECT 1 AS k, n, r1 AS acf, f11 AS pacf FROM d5
        |  UNION ALL SELECT 2, n, r2, f22 FROM d5
        |  UNION ALL SELECT 3, n, r3, f33 FROM d5
        |  UNION ALL SELECT 4, n, r4, f44 FROM d5) ORDER BY k""".stripMargin) {
      (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(datediff(to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))).as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(15,4)").as("rev"))
      val o = daily
        .select((col("rev") * 10000).cast("long").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
        .localCheckpoint() // day frame: global moments + 4 lag joins
      val g = o.agg(count(lit(1)).as("n"),
        sum("y").cast("decimal(38,0)").as("sy"),
        sum(col("y") * col("y").cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("syy"))
      val lagsDf = o.sparkSession.range(1, 5)
        .select(col("id").cast("long").as("k"))
      val a = o.select(col("y").as("ya"), col("rn").as("rna"))
      val b = o.select(col("y").as("yb"), col("rn").as("rnb"))
      val p = a.crossJoin(broadcast(lagsDf))
        .join(b, col("rnb") === col("rna") + col("k"))
        .groupBy("k")
        .agg(sum(col("ya") * col("yb").cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("ck"),
          sum("ya").cast("decimal(38,0)").as("hk"),
          sum("yb").cast("decimal(38,0)").as("tk"))
      val r = p.crossJoin(broadcast(g))
        .select(col("k"), col("n"),
          ((col("ck").cast("double")
            - (col("sy").cast("double") / col("n"))
              * (col("hk").cast("double") + col("tk").cast("double"))
            + (col("n") - col("k")) * ((col("sy").cast("double") / col("n"))
              * (col("sy").cast("double") / col("n"))))
            / (col("syy").cast("double")
              - (col("sy").cast("double") * col("sy").cast("double"))
                / col("n"))).as("rk"))
      val w = r.agg(
        max(when(col("k") === 1, col("rk"))).as("r1"),
        max(when(col("k") === 2, col("rk"))).as("r2"),
        max(when(col("k") === 3, col("rk"))).as("r3"),
        max(when(col("k") === 4, col("rk"))).as("r4"),
        max("n").as("n"))
      val d5 = w
        .withColumn("f11", col("r1"))
        .withColumn("f22", (col("r2") - col("r1") * col("r1"))
          / (lit(1.0) - col("r1") * col("r1")))
        .withColumn("f21", col("r1") - col("f22") * col("r1"))
        .withColumn("f33",
          (col("r3") - col("f21") * col("r2") - col("f22") * col("r1"))
            / (lit(1.0) - col("f21") * col("r1") - col("f22") * col("r2")))
        .withColumn("f31", col("f21") - col("f33") * col("f22"))
        .withColumn("f32", col("f22") - col("f33") * col("f21"))
        .withColumn("f44",
          (col("r4") - col("f31") * col("r3") - col("f32") * col("r2")
            - col("f33") * col("r1"))
            / (lit(1.0) - col("f31") * col("r1") - col("f32") * col("r2")
              - col("f33") * col("r3")))
      val rows = Seq(
        d5.select(lit(1L).as("k"), col("n"), col("r1").as("acf"),
          col("f11").as("pacf")),
        d5.select(lit(2L).as("k"), col("n"), col("r2").as("acf"),
          col("f22").as("pacf")),
        d5.select(lit(3L).as("k"), col("n"), col("r3").as("acf"),
          col("f33").as("pacf")),
        d5.select(lit(4L).as("k"), col("n"), col("r4").as("acf"),
          col("f44").as("pacf")))
      rows.reduce(_ unionAll _)
        .select(col("k"), col("n").as("n_days"),
          (round(col("acf"), 6) + 0.0).as("acf"),
          (round(col("pacf"), 6) + 0.0).as("pacf"))
        .orderBy("k")
    },

    // ---- Anderson–Darling exponentiality (interarrival times) ----
    // The tail-weighted one-sample GOF test next to q_ks_drift's
    // two-sample KS: are purchase interarrivals exponential (the
    // Poisson-process read a queueing model starts from)? A² in its
    // order-statistic form with the exponential null F(x) = 1−e^(−x/μ̂)
    // — ln(1−F) = −x/μ̂ EXACTLY, so the classic two-orderings sum
    // collapses to ONE rank window: A² = −n − (1/n)[Σ(2i−1)·ln F₍ᵢ₎ −
    // Σ(2n−2i+1)·z₍ᵢ₎]. Gaps are exact BIGINT micros (ties carry equal
    // weights, so tie order cannot move the sum), μ̂ divides two exact
    // integers, and the modified statistic's 5% critical value 1.321
    // (Stephens 1974, estimated-mean case D'Agostino table) rides as
    // the pinned literal. 100-TB story: the two rank windows are the
    // exact-order-statistic cost (the q_lorenz_gini class) — at
    // cluster scale this runs on the range-partitioned sort, and
    // everything else is one-pass.
    sql(
      "q_anderson_darling",
      """WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        |        FROM events WHERE event_type = 'purchase'),
        |gp AS (SELECT us - lag(us) OVER (ORDER BY us, event_id) AS gap
        |       FROM ev),
        |g AS (SELECT CAST(gap AS BIGINT) AS gap FROM gp WHERE gap > 0),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(gap) AS BIGINT) AS sg FROM g),
        |z AS (SELECT CAST(gap AS DOUBLE) / (CAST(nn.sg AS DOUBLE) / nn.n)
        |          AS z,
        |        CAST(row_number() OVER (ORDER BY gap) AS BIGINT) AS rn,
        |        nn.n
        |      FROM g CROSS JOIN nn),
        |a AS (SELECT max(n) AS n,
        |        sum((2 * rn - 1) * ln(1.0e0 - exp(-z))) AS s1,
        |        sum((2 * n - 2 * rn + 1) * z) AS s2 FROM z),
        |f AS (SELECT n, -CAST(n AS DOUBLE) - (s1 - s2) / n AS a2 FROM a)
        |SELECT n AS n_gaps, round(a2, 6) + 0.0 AS a2_stat,
        |  round(a2 * (1.0e0 + 0.6e0 / n), 6) + 0.0 AS a2_modified,
        |  CAST(CASE WHEN a2 * (1.0e0 + 0.6e0 / n) > 1.321e0 THEN 1 ELSE 0
        |       END AS BIGINT) AS reject_5pct
        |FROM f""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(unix_micros(col("ts")).as("us"), col("event_id"))
      val g = ev
        .withColumn("gap",
          col("us") - lag("us", 1).over(Window.orderBy("us", "event_id")))
        .where(col("gap") > 0)
        .select(col("gap").cast("long").as("gap"))
        .localCheckpoint() // gap frame: mean + rank window read it
      val nn = g.agg(count(lit(1)).as("n"), sum("gap").cast("long").as("sg"))
      val z = g.crossJoin(broadcast(nn))
        .select((col("gap").cast("double")
          / (col("sg").cast("double") / col("n"))).as("z"),
          row_number().over(Window.orderBy("gap")).cast("long").as("rn"),
          col("n"))
      val a = z.agg(max("n").as("n"),
        sum((lit(2) * col("rn") - 1)
          * log(lit(1.0) - exp(-col("z")))).as("s1"),
        sum((lit(2) * col("n") - lit(2) * col("rn") + 1) * col("z"))
          .as("s2"))
      val a2 = -col("n").cast("double") - (col("s1") - col("s2")) / col("n")
      a.select(col("n").as("n_gaps"),
        (round(a2, 6) + 0.0).as("a2_stat"),
        (round(a2 * (lit(1.0) + lit(0.6) / col("n")), 6) + 0.0)
          .as("a2_modified"),
        when(a2 * (lit(1.0) + lit(0.6) / col("n")) > 1.321, 1L)
          .otherwise(0L).as("reject_5pct"))
    },

    // ---- Prais–Winsten AR(1) FGLS (serial-correlation-robust OLS) ----
    // The estimator q_durbin_watson's diagnosis calls for: estimate
    // rho from the OLS residual lag regression, quasi-difference the
    // day-frame trend regression (y*_t = y_t − rho·y_{t−1}, both
    // design columns transformed, the FIRST row kept via the
    // sqrt(1−rho²) Prais–Winsten scaling instead of Cochrane–Orcutt's
    // drop), and re-fit by the closed-form two-regressor normal
    // equations. OLS init from exact decimal moments on the 6/8-dp
    // grid → residuals IEEE-identical; rho and the transformed moments
    // are bounded-day-frame double sums (~2400 terms, error ~1e-10 vs
    // 5e-7 boundaries). TPC-H daily revenue is near-iid (rho ≈ −0.016)
    // so b_pw ≈ b_ols — the honest calibration read, like q_vif.
    // 100-TB story: one keyed collapse to the day frame, lag windows
    // and 1-row math on it.
    sql(
      "q_prais_winsten",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,4))
        |      AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT rev, CAST(rev AS DOUBLE) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rn) AS BIGINT)
        |          AS sx,
        |        CAST(sum(rn*rn) AS BIGINT) AS sxx, sum(rev) AS syd,
        |        sum(CAST(CAST(rn AS DECIMAL(10,0)) * rev AS DECIMAL(32,4)))
        |          AS sxyd
        |      FROM o),
        |c0 AS (SELECT n, round((n * CAST(sxyd AS DOUBLE)
        |            - sx * CAST(syd AS DOUBLE))
        |          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 8)
        |          AS b,
        |        round((CAST(syd AS DOUBLE) - (n * CAST(sxyd AS DOUBLE)
        |            - sx * CAST(syd AS DOUBLE))
        |          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * sx)
        |          / n, 6) AS a
        |       FROM m),
        |e AS (SELECT o.rn, o.y, y - c.a - c.b * rn AS e
        |      FROM o CROSS JOIN c0 c),
        |el AS (SELECT rn, y, e, lag(e) OVER (ORDER BY rn) AS ep,
        |        lag(y) OVER (ORDER BY rn) AS yp FROM e),
        |rh AS (SELECT round(sum(e * ep) / sum(ep * ep), 8) AS rho
        |       FROM el WHERE ep IS NOT NULL),
        |tr AS (SELECT
        |        CASE WHEN el.yp IS NULL
        |             THEN sqrt(1.0e0 - r.rho * r.rho) * el.y
        |             ELSE el.y - r.rho * el.yp END AS ys,
        |        CASE WHEN el.yp IS NULL THEN sqrt(1.0e0 - r.rho * r.rho)
        |             ELSE 1.0e0 - r.rho END AS cs,
        |        CASE WHEN el.yp IS NULL
        |             THEN sqrt(1.0e0 - r.rho * r.rho) * el.rn
        |             ELSE el.rn - r.rho * (el.rn - 1) END AS xs
        |       FROM el CROSS JOIN rh r),
        |m2 AS (SELECT sum(cs*cs) AS scc, sum(cs*xs) AS scx,
        |        sum(cs*ys) AS scy, sum(xs*xs) AS sxx2, sum(xs*ys) AS sxy2
        |       FROM tr),
        |cp AS (SELECT (scc * sxy2 - scx * scy) / (scc * sxx2 - scx * scx)
        |          AS b_pw, scc, scx, scy FROM m2)
        |SELECT (SELECT n FROM c0) AS n_days,
        |  (SELECT rho FROM rh) + 0.0 AS rho,
        |  (SELECT b FROM c0) + 0.0 AS b_ols,
        |  round(b_pw, 6) + 0.0 AS b_pw,
        |  (SELECT a FROM c0) + 0.0 AS a_ols,
        |  round((scy - scx * b_pw) / scc, 6) + 0.0 AS a_pw
        |FROM cp""".stripMargin) { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(datediff(to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))).as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(18,4)").as("rev"))
      val o = daily
        .select(col("rev"), col("rev").cast("double").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
        .localCheckpoint() // day frame: moments + residual windows
      val m = o.agg(count(lit(1)).as("n"), sum("rn").cast("long").as("sx"),
        sum(col("rn") * col("rn")).cast("long").as("sxx"),
        sum("rev").as("syd"),
        sum((col("rn").cast("decimal(10,0)") * col("rev"))
          .cast("decimal(32,4)")).as("sxyd"))
      val bE = (col("n") * col("sxyd").cast("double")
        - col("sx") * col("syd").cast("double")) /
        (col("n") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx"))
      val c0 = m.select(col("n"), round(bE, 8).as("b"),
        round((col("syd").cast("double") - bE * col("sx")) / col("n"), 6)
          .as("a"))
      val wRn = Window.orderBy("rn")
      val el = o.crossJoin(broadcast(c0))
        .withColumn("e", col("y") - col("a") - col("b") * col("rn"))
        .withColumn("ep", lag("e", 1).over(wRn))
        .withColumn("yp", lag("y", 1).over(wRn))
        .localCheckpoint() // lagged frame: rho + the transform read it
      val rh = el.where(col("ep").isNotNull)
        .agg(round(sum(col("e") * col("ep")) / sum(col("ep") * col("ep")),
          8).as("rho"))
      val tr = el.crossJoin(broadcast(rh))
        .select(
          when(col("yp").isNull,
            sqrt(lit(1.0) - col("rho") * col("rho")) * col("y"))
            .otherwise(col("y") - col("rho") * col("yp")).as("ys"),
          when(col("yp").isNull, sqrt(lit(1.0) - col("rho") * col("rho")))
            .otherwise(lit(1.0) - col("rho")).as("cs"),
          when(col("yp").isNull,
            sqrt(lit(1.0) - col("rho") * col("rho")) * col("rn"))
            .otherwise(col("rn") - col("rho") * (col("rn") - 1)).as("xs"))
      val m2 = tr.agg(sum(col("cs") * col("cs")).as("scc"),
        sum(col("cs") * col("xs")).as("scx"),
        sum(col("cs") * col("ys")).as("scy"),
        sum(col("xs") * col("xs")).as("sxx2"),
        sum(col("xs") * col("ys")).as("sxy2"))
      val bPw = (col("scc") * col("sxy2") - col("scx") * col("scy")) /
        (col("scc") * col("sxx2") - col("scx") * col("scx"))
      m2.select((round(bPw, 6) + 0.0).as("b_pw"),
          (round((col("scy") - col("scx") * bPw) / col("scc"), 6) + 0.0)
            .as("a_pw"))
        .crossJoin(broadcast(c0.select(col("n"),
          (col("b") + 0.0).as("b_ols"), (col("a") + 0.0).as("a_ols"))))
        .crossJoin(broadcast(rh.select((col("rho") + 0.0).as("rho_v"))))
        .select(col("n").as("n_days"), col("rho_v").as("rho"),
          col("b_ols"), col("b_pw"), col("a_ols"), col("a_pw"))
    },

    // ---- Newey–West HAC standard error (Bartlett kernel, L = 5) ----
    // The serial-correlation/heteroscedasticity-robust slope SE for
    // the same day-frame trend regression: Ω = S₀ + 2Σₗ(1 − l/(L+1))Sₗ
    // over the score series u_t = e_t·(t − t̄), Var(b) = Ω / S_xx².
    // Reported next to the iid OLS SE — the ratio IS the Newey–West
    // correction a practitioner quotes. Same exactness ladder as
    // q_prais_winsten (grid-rounded OLS init → identical residuals;
    // bounded-frame double sums). 100-TB story: one keyed collapse to
    // the day frame, 5 bounded lag joins, 1-row math.
    sql(
      "q_newey_west",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,4))
        |      AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT rev, CAST(rev AS DOUBLE) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rn) AS BIGINT)
        |          AS sx,
        |        CAST(sum(rn*rn) AS BIGINT) AS sxx, sum(rev) AS syd,
        |        sum(CAST(CAST(rn AS DECIMAL(10,0)) * rev AS DECIMAL(32,4)))
        |          AS sxyd
        |      FROM o),
        |c0 AS (SELECT n, round((n * CAST(sxyd AS DOUBLE)
        |            - sx * CAST(syd AS DOUBLE))
        |          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 8)
        |          AS b,
        |        round((CAST(syd AS DOUBLE) - (n * CAST(sxyd AS DOUBLE)
        |            - sx * CAST(syd AS DOUBLE))
        |          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * sx)
        |          / n, 6) AS a
        |       FROM m),
        |e AS (SELECT o.rn, y - c.a - c.b * rn AS e, c.n
        |      FROM o CROSS JOIN c0 c),
        |u AS (SELECT rn, e, e * (rn - (n + 1.0e0) / 2) AS u, n FROM e),
        |s0 AS (SELECT sum(u*u) AS s0, sum(e*e) AS see FROM u),
        |sl AS (SELECT l.l, sum(a.u * b.u) AS sl
        |       FROM u a CROSS JOIN (SELECT unnest(generate_series(1,5)) AS l)
        |          l
        |       JOIN u b ON b.rn = a.rn - l.l GROUP BY 1),
        |om AS (SELECT (SELECT s0 FROM s0)
        |        + 2 * sum((1.0e0 - l / 6.0e0) * sl) AS omega FROM sl),
        |sxc AS (SELECT sum((rn - (SELECT (n + 1.0e0) / 2 FROM c0))
        |         * (rn - (SELECT (n + 1.0e0) / 2 FROM c0))) AS sxc FROM o)
        |SELECT (SELECT n FROM c0) AS n_days,
        |  (SELECT b FROM c0) + 0.0 AS b_trend,
        |  round(sqrt(((SELECT see FROM s0) / ((SELECT n FROM c0) - 2.0e0))
        |    / (SELECT sxc FROM sxc)), 6) + 0.0 AS se_ols,
        |  round(sqrt((SELECT omega FROM om)
        |    / ((SELECT sxc FROM sxc) * (SELECT sxc FROM sxc))), 6) + 0.0
        |    AS se_hac,
        |  round(sqrt((SELECT omega FROM om)
        |      / ((SELECT sxc FROM sxc) * (SELECT sxc FROM sxc)))
        |    / sqrt(((SELECT see FROM s0) / ((SELECT n FROM c0) - 2.0e0))
        |      / (SELECT sxc FROM sxc)), 6) + 0.0 AS hac_ratio
        |""".stripMargin) { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(datediff(to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))).as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(18,4)").as("rev"))
      val o = daily
        .select(col("rev"), col("rev").cast("double").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
        .localCheckpoint() // day frame: moments + score lags read it
      val m = o.agg(count(lit(1)).as("n"), sum("rn").cast("long").as("sx"),
        sum(col("rn") * col("rn")).cast("long").as("sxx"),
        sum("rev").as("syd"),
        sum((col("rn").cast("decimal(10,0)") * col("rev"))
          .cast("decimal(32,4)")).as("sxyd"))
      val bE = (col("n") * col("sxyd").cast("double")
        - col("sx") * col("syd").cast("double")) /
        (col("n") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx"))
      val c0 = m.select(col("n"), round(bE, 8).as("b"),
        round((col("syd").cast("double") - bE * col("sx")) / col("n"), 6)
          .as("a"))
      val u = o.crossJoin(broadcast(c0))
        .withColumn("e", col("y") - col("a") - col("b") * col("rn"))
        .withColumn("u",
          col("e") * (col("rn") - (col("n") + lit(1.0)) / 2))
        .select("rn", "e", "u", "n")
        .localCheckpoint() // score frame: S0 + 5 lag joins read it
      val s0 = u.agg(sum(col("u") * col("u")).as("s0"),
        sum(col("e") * col("e")).as("see"))
      val lagsDf = u.sparkSession.range(1, 6)
        .select(col("id").cast("long").as("l"))
      val ua = u.select(col("u").as("uu"), col("rn").as("rna"))
      val ub = u.select(col("u").as("ub"), col("rn").as("rnb"))
      val sl = ua.crossJoin(broadcast(lagsDf))
        .join(ub, col("rnb") === col("rna") - col("l"))
        .groupBy("l").agg(sum(col("uu") * col("ub")).as("sl"))
      val om = sl.crossJoin(broadcast(s0))
        .agg((first("s0") + lit(2)
          * sum((lit(1.0) - col("l") / lit(6.0)) * col("sl"))).as("omega"))
      val sxc = u // the score frame already carries n
        .agg(sum((col("rn") - (col("n") + lit(1.0)) / 2)
          * (col("rn") - (col("n") + lit(1.0)) / 2)).as("sxc"))
      val seOls = sqrt((col("see") / (col("n") - lit(2.0))) / col("sxc"))
      val seHac = sqrt(col("omega") / (col("sxc") * col("sxc")))
      c0.select(col("n"), (col("b") + 0.0).as("b_trend"))
        .crossJoin(broadcast(s0)).crossJoin(broadcast(om))
        .crossJoin(broadcast(sxc))
        .select(col("n").as("n_days"), col("b_trend"),
          (round(seOls, 6) + 0.0).as("se_ols"),
          (round(seHac, 6) + 0.0).as("se_hac"),
          (round(seHac / seOls, 6) + 0.0).as("hac_ratio"))
    },

    // ---- 2-state HMM forward pass (regime posterior timeline) ----
    // The hidden-regime companion to q_markov_transitions: a pinned
    // 2-state HMM (persistence .9/.8, emissions .8/.3 for a
    // high-revenue day) filtered over the daily revenue sequence —
    // the forward algorithm's normalized alpha recursion, emitting
    // P(high-regime | obs so far) per day. The recursion re-normalizes
    // each step so probabilities stay O(1): pure +/×/÷ on identical
    // doubles (obs thresholds on the exact-decimal day mean) — the
    // recursive-CTE oracle and the sorted mapPartitions fold run the
    // SAME expression order, so parity is bit-level before the 6-dp
    // round (the q_theta_forecast twin discipline). 100-TB story: one
    // keyed collapse to the bounded day frame, then a single-partition
    // fold over ≤ calendar-horizon rows.
    sql(
      "q_hmm_forward",
      """WITH RECURSIVE daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,4))
        |      AS rev
        |  FROM orders GROUP BY 1),
        |mu AS (SELECT CAST(sum(rev) AS DOUBLE) / count(*) AS mu FROM daily),
        |o AS (SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
        |        d, CASE WHEN CAST(rev AS DOUBLE) > m.mu THEN 1 ELSE 0 END
        |          AS obs
        |      FROM daily CROSS JOIN mu m),
        |f AS (SELECT rn, d, obs,
        |        (CASE WHEN obs = 1 THEN 0.8e0 ELSE 0.2e0 END) * 0.5e0 AS a1r,
        |        (CASE WHEN obs = 1 THEN 0.3e0 ELSE 0.7e0 END) * 0.5e0 AS a2r
        |      FROM o WHERE rn = 1
        |      UNION ALL
        |      SELECT o.rn, o.d, o.obs,
        |        (CASE WHEN o.obs = 1 THEN 0.8e0 ELSE 0.2e0 END)
        |          * ((f.a1r / (f.a1r + f.a2r)) * 0.9e0
        |             + (f.a2r / (f.a1r + f.a2r)) * 0.2e0),
        |        (CASE WHEN o.obs = 1 THEN 0.3e0 ELSE 0.7e0 END)
        |          * ((f.a1r / (f.a1r + f.a2r)) * 0.1e0
        |             + (f.a2r / (f.a1r + f.a2r)) * 0.8e0)
        |      FROM f JOIN o ON o.rn = f.rn + 1)
        |SELECT rn AS t, CAST(obs AS BIGINT) AS obs,
        |  round(a1r / (a1r + a2r), 6) + 0.0 AS p_high
        |FROM f ORDER BY t""".stripMargin) { (s, dir) =>
      import s.implicits._
      val daily = t(s, dir, "orders")
        .groupBy(datediff(to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))).as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(18,4)").as("rev"))
        .localCheckpoint() // day frame: mean + the fold read it
      val mu = daily.agg(
        (sum("rev").cast("double") / count(lit(1))).as("mu"))
      val o = daily.crossJoin(broadcast(mu))
        .select(row_number().over(Window.orderBy("d")).cast("long")
          .as("rn"),
          when(col("rev").cast("double") > col("mu"), 1L).otherwise(0L)
            .as("obs"))
      o.as[(Long, Long)]
        .repartition(1)
        .sortWithinPartitions("rn")
        .mapPartitions { it =>
          // the oracle recursion's EXACT operation order: normalize
          // the previous alphas, mix with the pinned transitions,
          // scale by the pinned emission for today's observation
          var a1 = 0.0; var a2 = 0.0; var started = false
          it.map { case (rn, obs) =>
            val b1 = if (obs == 1) 0.8 else 0.2
            val b2 = if (obs == 1) 0.3 else 0.7
            if (!started) { a1 = b1 * 0.5; a2 = b2 * 0.5; started = true }
            else {
              val s0 = a1 + a2
              val p1 = a1 / s0; val p2 = a2 / s0
              val n1 = b1 * (p1 * 0.9 + p2 * 0.2)
              val n2 = b2 * (p1 * 0.1 + p2 * 0.8)
              a1 = n1; a2 = n2
            }
            (rn, obs, a1 / (a1 + a2))
          }
        }
        .toDF("t", "obs", "p_raw")
        .select(col("t"), col("obs"),
          (round(col("p_raw"), 6) + 0.0).as("p_high"))
        .orderBy("t")
    },

    // ---- Engle–Granger cointegration (two region revenue series) ----
    // The spurious-regression guard q_granger_causality assumes away:
    // regress region-1 daily revenue on region-0 (exact decimal
    // moments, grid-rounded), then Dickey–Fuller the residual
    // (Δe_t = φ·e_{t−1}, t-stat on φ) against the Engle–Granger 5%
    // critical value −3.34 (2 variables, constant; pinned literal,
    // which is MacKinnon's asymptotic table — NOT the plain DF value,
    // because the residual is estimated). Both series here are
    // stationary around their means, so the null is rejected
    // trivially — the honest calibration read; the operator's value
    // is the shape. 100-TB story: one keyed collapse per region to
    // bounded day frames, an aligned join on day, 1-row math.
    sql(
      "q_cointegration",
      """WITH rev AS (SELECT n.n_regionkey AS rk,
        |          date_diff('day', DATE '1970-01-01',
        |                    CAST(o.o_orderdate AS DATE)) AS d,
        |          CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6)))
        |            AS DECIMAL(18,4)) AS rv
        |        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |        JOIN nation n ON n.n_nationkey = c.c_nationkey
        |        WHERE n.n_regionkey IN (0, 1) GROUP BY 1, 2),
        |al AS (SELECT a.d, CAST(a.rv AS DOUBLE) AS x,
        |         CAST(b.rv AS DOUBLE) AS y, a.rv AS xd, b.rv AS yd
        |       FROM rev a JOIN rev b ON b.d = a.d AND a.rk = 0
        |         AND b.rk = 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(xd) AS sx,
        |        sum(yd) AS sy,
        |        sum(CAST(CAST(xd AS DECIMAL(20,4)) * xd AS DECIMAL(38,8)))
        |          AS sxx,
        |        sum(CAST(CAST(xd AS DECIMAL(20,4)) * yd AS DECIMAL(38,8)))
        |          AS sxy
        |      FROM al),
        |c0 AS (SELECT n, round((n * CAST(sxy AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |          / (n * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 8) AS b,
        |        round((CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |          / (n * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |          * CAST(sx AS DOUBLE)) / n, 6) AS a
        |       FROM m),
        |e AS (SELECT d, y - c.a - c.b * x AS e,
        |        row_number() OVER (ORDER BY d) AS rn
        |      FROM al CROSS JOIN c0 c),
        |de AS (SELECT a.e - b.e AS dlt, b.e AS ep
        |       FROM e a JOIN e b ON b.rn = a.rn - 1),
        |ph AS (SELECT sum(dlt * ep) / sum(ep * ep) AS phi,
        |        sum(dlt * dlt) AS sdd, sum(dlt * ep) AS sde,
        |        sum(ep * ep) AS see, CAST(count(*) AS BIGINT) AS m FROM de),
        |st AS (SELECT m, phi,
        |        sqrt(((sdd - phi * sde) / (m - 1)) / see) AS se FROM ph)
        |SELECT (SELECT n FROM c0) AS n_days,
        |  (SELECT b FROM c0) + 0.0 AS coint_b,
        |  round(phi, 8) + 0.0 AS adf_phi, round(phi / se, 6) + 0.0 AS adf_t,
        |  CAST(CASE WHEN phi / se < -3.34e0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS cointegrated_5pct
        |FROM st""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .where(col("n_regionkey").isin(0, 1))
        .groupBy(col("n_regionkey").as("rk"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(18,4)").as("rv"))
        .localCheckpoint() // region-day frame: both join sides read it
      val al = rev.where(col("rk") === 0)
        .select(col("d"), col("rv").cast("double").as("x"),
          col("rv").as("xd"))
        .join(rev.where(col("rk") === 1)
          .select(col("d"), col("rv").cast("double").as("y"),
            col("rv").as("yd")), "d")
        .localCheckpoint() // aligned frame: moments + residual windows
      val m = al.agg(count(lit(1)).as("n"), sum("xd").as("sx"),
        sum("yd").as("sy"),
        sum((col("xd").cast("decimal(20,4)") * col("xd"))
          .cast("decimal(38,8)")).as("sxx"),
        sum((col("xd").cast("decimal(20,4)") * col("yd"))
          .cast("decimal(38,8)")).as("sxy"))
      val bE = (col("n") * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double")) /
        (col("n") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
      val c0 = m.select(col("n"), round(bE, 8).as("b"),
        round((col("sy").cast("double") - bE * col("sx").cast("double"))
          / col("n"), 6).as("a"))
      val e = al.crossJoin(broadcast(c0))
        .select(col("d"), (col("y") - col("a") - col("b") * col("x"))
          .as("e"))
        .withColumn("rn", row_number().over(Window.orderBy("d")))
      val de = e.select(col("e").as("ea"), col("rn").as("rna"))
        .join(e.select(col("e").as("eb"), col("rn").as("rnb")),
          col("rnb") === col("rna") - 1)
        .select((col("ea") - col("eb")).as("dlt"), col("eb").as("ep"))
      val ph = de.agg(
        (sum(col("dlt") * col("ep")) / sum(col("ep") * col("ep")))
          .as("phi"),
        sum(col("dlt") * col("dlt")).as("sdd"),
        sum(col("dlt") * col("ep")).as("sde"),
        sum(col("ep") * col("ep")).as("see"), count(lit(1)).as("m"))
      val se = sqrt(((col("sdd") - col("phi") * col("sde"))
        / (col("m") - 1)) / col("see"))
      ph.crossJoin(broadcast(c0.select(col("n"), (col("b") + 0.0)
          .as("coint_b"))))
        .select(col("n").as("n_days"), col("coint_b"),
          (round(col("phi"), 8) + 0.0).as("adf_phi"),
          (round(col("phi") / se, 6) + 0.0).as("adf_t"),
          when(col("phi") / se < -3.34, 1L).otherwise(0L)
            .as("cointegrated_5pct"))
    },

    // ---- Schuster periodogram (12 harmonics of the day sequence) ----
    // The frequency-domain read next to q_seasonal_dow's calendar
    // buckets: normalized spectral power P(k) = (2/n)[(Σz·cos ω_k t)²
    // + (Σz·sin ω_k t)²] at the first 12 Fourier harmonics of the
    // standardized daily revenue (under white noise each P(k) ~ χ²₂ ≈
    // mean 2 — values well above that flag a cycle at n/k days).
    // Cross-engine: z is identical (mean/sd from exact decimal
    // moments, rounded to the 8-dp grid); cos/sin come from each
    // engine's libm and may differ in the last ulp, which perturbs the
    // O(√n) trig sums by ~1e-14 against a 5e-7 rounding boundary —
    // margin ~1e7 (the first operator in the engine to rely on this,
    // deliberately measured before shipping: DuckDB ≡ independent
    // replication at 6 dp). The engine's first trig-over-corpus shape.
    // 100-TB story: one keyed collapse to the bounded day frame, a
    // 12-way broadcast fan-out over it, one k-row collapse.
    sql(
      "q_periodogram",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,4))
        |      AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT rev, CAST(rev AS DOUBLE) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rev) AS sd,
        |        sum(CAST(CAST(rev AS DECIMAL(20,4)) * rev AS DECIMAL(38,8)))
        |          AS sdd
        |      FROM o),
        |c0 AS (SELECT n, round(CAST(sd AS DOUBLE) / n, 8) AS mu,
        |        round(sqrt((CAST(sdd AS DOUBLE)
        |          - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / n)
        |          / (n - 1)), 8) AS sd0 FROM m),
        |z AS (SELECT rn, (y - c.mu) / c.sd0 AS z, c.n
        |      FROM o CROSS JOIN c0 c),
        |k AS (SELECT unnest(generate_series(1, 12)) AS k),
        |p AS (SELECT k.k, max(z.n) AS n,
        |        sum(z.z * cos(6.283185307179586e0 * k.k * z.rn / z.n))
        |          AS cc,
        |        sum(z.z * sin(6.283185307179586e0 * k.k * z.rn / z.n))
        |          AS ss
        |      FROM z CROSS JOIN k GROUP BY k.k)
        |SELECT CAST(k AS BIGINT) AS k, n AS n_days,
        |  round(CAST(n AS DOUBLE) / k, 2) AS period_days,
        |  round((cc * cc + ss * ss) * 2 / n, 6) + 0.0 AS power_norm
        |FROM p ORDER BY k""".stripMargin) { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(datediff(to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))).as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(18,4)").as("rev"))
      val o = daily
        .select(col("rev"), col("rev").cast("double").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
        .localCheckpoint() // day frame: moments + the harmonic fan-out
      val m = o.agg(count(lit(1)).as("n"), sum("rev").as("sd"),
        sum((col("rev").cast("decimal(20,4)") * col("rev"))
          .cast("decimal(38,8)")).as("sdd"))
      val c0 = m.select(col("n"),
        round(col("sd").cast("double") / col("n"), 8).as("mu"),
        round(sqrt((col("sdd").cast("double")
          - col("sd").cast("double") * col("sd").cast("double") / col("n"))
          / (col("n") - 1)), 8).as("sd0"))
      val z = o.crossJoin(broadcast(c0))
        .select(col("rn"), ((col("y") - col("mu")) / col("sd0")).as("z"),
          col("n"))
      val ks = z.sparkSession.range(1, 13)
        .select(col("id").cast("long").as("k"))
      val arg = lit(6.283185307179586) * col("k") * col("rn") / col("n")
      val p = z.crossJoin(broadcast(ks))
        .groupBy("k")
        .agg(max("n").as("n"),
          sum(col("z") * cos(arg)).as("cc"),
          sum(col("z") * sin(arg)).as("ss"))
      p.select(col("k"), col("n").as("n_days"),
          round(col("n").cast("double") / col("k"), 2).as("period_days"),
          (round((col("cc") * col("cc") + col("ss") * col("ss")) * 2
            / col("n"), 6) + 0.0).as("power_norm"))
        .orderBy("k")
    },

    // ---- turning-points randomness test (day sequence) ----
    // The cheapest seq-randomness screen next to q_runs_test
    // (Kendall): count local extrema of the daily revenue sequence;
    // under iid the count is asymptotically N(2(n−2)/3, (16n−29)/90).
    // Pure integer counting over three-point windows on identical
    // doubles — no numeric-drift surface at all; the z and the ±1.96
    // verdict are 1-row math. 100-TB story: one keyed collapse to the
    // bounded day frame, one ordered window, two 1-row aggregates.
    sql(
      "q_turning_points",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,4))
        |      AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT CAST(rev AS DOUBLE) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |w AS (SELECT rn, lag(y) OVER (ORDER BY rn) AS a, y AS b,
        |        lead(y) OVER (ORDER BY rn) AS c FROM o),
        |tps AS (SELECT CAST(count(*) AS BIGINT) AS t_cnt
        |        FROM w WHERE a IS NOT NULL AND c IS NOT NULL
        |          AND ((b > a AND b > c) OR (b < a AND b < c))),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |st AS (SELECT t_cnt, n, 2.0e0 * (n - 2) / 3 AS mu,
        |        (16.0e0 * n - 29) / 90 AS v FROM tps CROSS JOIN nn)
        |SELECT n AS n_days, t_cnt AS turning_points,
        |  round(mu, 6) + 0.0 AS expected_tp,
        |  round((t_cnt - mu) / sqrt(v), 6) + 0.0 AS z_stat,
        |  CAST(CASE WHEN abs((t_cnt - mu) / sqrt(v)) > 1.959963984540054e0
        |       THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
        |FROM st""".stripMargin) { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(datediff(to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))).as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(18,4)").as("rev"))
      val o = daily
        .select(col("rev").cast("double").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
        .localCheckpoint() // day frame: count + the extrema window
      val wRn = Window.orderBy("rn")
      val w = o.select(col("rn"), lag("y", 1).over(wRn).as("a"),
        col("y").as("b"), lead("y", 1).over(wRn).as("c"))
      val tps = w.where(col("a").isNotNull && col("c").isNotNull
          && ((col("b") > col("a") && col("b") > col("c"))
            || (col("b") < col("a") && col("b") < col("c"))))
        .agg(count(lit(1)).as("t_cnt"))
      val nn = o.agg(count(lit(1)).as("n"))
      val mu = lit(2.0) * (col("n") - 2) / 3
      val v = (lit(16.0) * col("n") - 29) / 90
      val z = (col("t_cnt") - mu) / sqrt(v)
      tps.crossJoin(broadcast(nn))
        .select(col("n").as("n_days"), col("t_cnt").as("turning_points"),
          (round(mu, 6) + 0.0).as("expected_tp"),
          (round(z, 6) + 0.0).as("z_stat"),
          when(abs(z) > 1.959963984540054, 1L).otherwise(0L)
            .as("reject_5pct"))
    },

    // ---- maximum drawdown (per-nation cumulative return) ----
    // The path-dependent risk read next to q_expected_shortfall's
    // static tail: running peak of the cumulative day-over-day return
    // per nation, max peak-to-trough depth. The running sum and
    // running max are ORDERED in-partition folds — both engines fold
    // the identical doubles in the identical day order, so the
    // result is deterministic without any decimal machinery. 100-TB
    // story: one keyed collapse to the nation×day frame, two stacked
    // per-nation ordered windows on bounded day counts.
    sql(
      "q_max_drawdown",
      """WITH rev AS (SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
        |          sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rv
        |        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |        JOIN nation n ON n.n_nationkey = c.c_nationkey
        |        GROUP BY 1, 2),
        |r AS (SELECT n_name, day, CAST(rv AS DOUBLE)
        |        / lag(CAST(rv AS DOUBLE)) OVER (PARTITION BY n_name
        |            ORDER BY day) - 1.0e0 AS ret FROM rev),
        |cum AS (SELECT n_name, day,
        |         sum(ret) OVER (PARTITION BY n_name ORDER BY day
        |             ROWS UNBOUNDED PRECEDING) AS eq
        |        FROM r WHERE ret IS NOT NULL),
        |pk AS (SELECT n_name, day, eq,
        |        max(eq) OVER (PARTITION BY n_name ORDER BY day
        |            ROWS UNBOUNDED PRECEDING) AS peak FROM cum),
        |ddw AS (SELECT n_name, eq - peak AS dd FROM pk)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_days,
        |  round(min(dd), 6) + 0.0 AS max_drawdown
        |FROM ddw GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
      val wDay = Window.partitionBy("n_name").orderBy("day")
      val wRun = Window.partitionBy("n_name").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      rev
        .withColumn("ret", col("rv").cast("double")
          / lag(col("rv").cast("double"), 1).over(wDay) - lit(1.0))
        .where(col("ret").isNotNull)
        .withColumn("eq", sum("ret").over(wRun))
        .withColumn("peak", max("eq").over(wRun))
        .select(col("n_name"), (col("eq") - col("peak")).as("dd"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_days"),
          (round(min("dd"), 6) + 0.0).as("max_drawdown"))
        .orderBy("n_name")
    },

    // ---- Kendall's W (concordance of k event-type day rankings) ----
    // The k-rater extension of q_spearman_by_type and the continuous
    // sibling of q_friedman_test: do the five event types rank the
    // shared calendar days the same way by daily value? Ranks are
    // tie-free by construction (ORDER BY value, day — deterministic
    // on both engines), so W = 12·S / (k²(n³−n)) needs no tie
    // correction; only days carrying ALL k types enter, so every
    // rank-sum row has exactly k addends. χ² = k(n−1)W rides with
    // the verdict df. 100-TB story: one corpus pass to the
    // (type, day) grain, per-type rank windows on bounded day
    // counts, a day-level collapse, 1-row math.
    sql(
      "q_kendall_w",
      """WITH dt AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,4))
        |            AS v
        |        FROM events GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
        |       FROM events),
        |full_d AS (SELECT day FROM dt CROSS JOIN kk GROUP BY day, kk.k
        |           HAVING count(DISTINCT event_type) = max(kk.k)),
        |rk AS (SELECT dt.event_type, dt.day,
        |        CAST(rank() OVER (PARTITION BY dt.event_type
        |            ORDER BY dt.v, dt.day) AS BIGINT) AS r
        |       FROM dt JOIN full_d f ON f.day = dt.day),
        |rs AS (SELECT day, CAST(sum(r) AS BIGINT) AS rsum FROM rk
        |       GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rs),
        |st AS (SELECT k.k, nn.n,
        |        sum((rs.rsum - k.k * (nn.n + 1.0e0) / 2)
        |          * (rs.rsum - k.k * (nn.n + 1.0e0) / 2)) AS s
        |       FROM rs CROSS JOIN kk k CROSS JOIN nn GROUP BY 1, 2)
        |SELECT k AS k_raters, n AS n_days,
        |  round(12.0e0 * s / (CAST(k AS DOUBLE) * k
        |    * (CAST(n AS DOUBLE) * n * n - n)), 6) + 0.0 AS kendall_w,
        |  round(k * (n - 1) * (12.0e0 * s / (CAST(k AS DOUBLE) * k
        |    * (CAST(n AS DOUBLE) * n * n - n))), 6) + 0.0 AS chi2_stat
        |FROM st""".stripMargin) { (s, dir) =>
      val dt = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,4)").as("v"))
        .localCheckpoint() // (type, day) grain: coverage + ranks
      val kk = t(s, dir, "events")
        .agg(count_distinct(col("event_type")).cast("long").as("k"))
      val fullD = dt.crossJoin(broadcast(kk))
        .groupBy("day", "k")
        .agg(count_distinct(col("event_type")).as("ct"))
        .where(col("ct") === col("k"))
        .select("day")
      val rk = dt.join(fullD, "day")
        .select(col("event_type"), col("day"),
          rank().over(Window.partitionBy("event_type")
            .orderBy("v", "day")).cast("long").as("r"))
      val rs = rk.groupBy("day").agg(sum("r").cast("long").as("rsum"))
        .localCheckpoint() // day-level rank sums: count + S read it
      val nn = rs.agg(count(lit(1)).as("n"))
      val st = rs.crossJoin(broadcast(kk)).crossJoin(broadcast(nn))
        .groupBy("k", "n")
        .agg(sum((col("rsum") - col("k") * (col("n") + lit(1.0)) / 2)
          * (col("rsum") - col("k") * (col("n") + lit(1.0)) / 2)).as("s"))
      val wExpr = lit(12.0) * col("s") / (col("k").cast("double") * col("k")
        * (col("n").cast("double") * col("n") * col("n") - col("n")))
      st.select(col("k").as("k_raters"), col("n").as("n_days"),
        (round(wExpr, 6) + 0.0).as("kendall_w"),
        (round(col("k") * (col("n") - 1) * wExpr, 6) + 0.0).as("chi2_stat"))
    },

    // ---- spectral entropy + dominant period (periodogram read-out) ----
    // The one-number regularity summary of q_periodogram's harmonic
    // table: normalize the 12 spectral powers to a distribution,
    // report its Shannon entropy / ln 12 (1 = white-noise flat, → 0 =
    // one dominant cycle) and the argmax harmonic with its period.
    // Powers are rounded to the 10-dp grid BEFORE normalization, so
    // the distribution, the entropy and the deterministic argmax
    // (power desc, k asc) are identical cross-engine regardless of
    // each engine's last-ulp trig. 100-TB story: identical to
    // q_periodogram plus 12-row math.
    sql(
      "q_spectral_entropy",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,4))
        |      AS rev
        |  FROM orders GROUP BY 1),
        |o AS (SELECT rev, CAST(rev AS DOUBLE) AS y,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |      FROM daily),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rev) AS sd,
        |        sum(CAST(CAST(rev AS DECIMAL(20,4)) * rev AS DECIMAL(38,8)))
        |          AS sdd FROM o),
        |c0 AS (SELECT n, round(CAST(sd AS DOUBLE) / n, 8) AS mu,
        |        round(sqrt((CAST(sdd AS DOUBLE)
        |          - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / n)
        |          / (n - 1)), 8) AS sd0 FROM m),
        |z AS (SELECT rn, (y - c.mu) / c.sd0 AS z, c.n
        |      FROM o CROSS JOIN c0 c),
        |k AS (SELECT unnest(generate_series(1, 12)) AS k),
        |p AS (SELECT k.k, max(z.n) AS n,
        |        sum(z.z * cos(6.283185307179586e0 * k.k * z.rn / z.n))
        |          AS cc,
        |        sum(z.z * sin(6.283185307179586e0 * k.k * z.rn / z.n))
        |          AS ss
        |      FROM z CROSS JOIN k GROUP BY k.k),
        |pw AS (SELECT k, n, round((cc * cc + ss * ss) * 2 / n, 10) AS pwr
        |       FROM p),
        |tt AS (SELECT max(n) AS n, sum(pwr) AS tot FROM pw),
        |pr AS (SELECT pw.k, pw.pwr / tt.tot AS pk, tt.n, tt.tot
        |       FROM pw CROSS JOIN tt),
        |h AS (SELECT max(n) AS n, max(tot) AS tot,
        |       -sum(pk * ln(pk)) / ln(12.0e0) AS hn FROM pr WHERE pk > 0),
        |dom AS (SELECT k AS dom_k FROM pr ORDER BY pk DESC, k LIMIT 1)
        |SELECT h.n AS n_days, round(h.tot, 6) + 0.0 AS total_power,
        |  round(h.hn, 6) + 0.0 AS spectral_entropy,
        |  (SELECT dom_k FROM dom) AS dominant_k,
        |  round(CAST(h.n AS DOUBLE) / (SELECT dom_k FROM dom), 2)
        |    AS dominant_period_days
        |FROM h""".stripMargin) { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(datediff(to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))).as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(18,4)").as("rev"))
      val o = daily
        .select(col("rev"), col("rev").cast("double").as("y"),
          row_number().over(Window.orderBy("d")).cast("long").as("rn"))
        .localCheckpoint()
      val m = o.agg(count(lit(1)).as("n"), sum("rev").as("sd"),
        sum((col("rev").cast("decimal(20,4)") * col("rev"))
          .cast("decimal(38,8)")).as("sdd"))
      val c0 = m.select(col("n"),
        round(col("sd").cast("double") / col("n"), 8).as("mu"),
        round(sqrt((col("sdd").cast("double")
          - col("sd").cast("double") * col("sd").cast("double") / col("n"))
          / (col("n") - 1)), 8).as("sd0"))
      val z = o.crossJoin(broadcast(c0))
        .select(col("rn"), ((col("y") - col("mu")) / col("sd0")).as("z"),
          col("n"))
      val ks = z.sparkSession.range(1, 13)
        .select(col("id").cast("long").as("k"))
      val arg = lit(6.283185307179586) * col("k") * col("rn") / col("n")
      val pw = z.crossJoin(broadcast(ks))
        .groupBy("k")
        .agg(max("n").as("n"),
          sum(col("z") * cos(arg)).as("cc"),
          sum(col("z") * sin(arg)).as("ss"))
        .select(col("k"), col("n"),
          round((col("cc") * col("cc") + col("ss") * col("ss")) * 2
            / col("n"), 10).as("pwr"))
        .localCheckpoint() // 12-row harmonic table: totals + argmax
      val tt = pw.agg(max("n").as("n"), sum("pwr").as("tot"))
      val pr = pw.crossJoin(broadcast(tt.select("tot")))
        .select(col("k"), (col("pwr") / col("tot")).as("pk"))
      // pk = 0 guard (r12 ADVICE): a harmonic whose power rounds to 0
      // at the 10-dp grid would make DuckDB's 0*ln(0) a NaN while
      // Spark's log() returns NULL (term silently dropped) — filter
      // pk > 0 IDENTICALLY on both engines before the entropy sum so
      // the zero-power term is excluded the same way everywhere
      // (lim p→0 p·ln p = 0, so the entropy value is unchanged).
      val h = pr.filter(col("pk") > 0)
        .agg((-sum(col("pk") * log(col("pk"))) / log(lit(12.0)))
        .as("hn"))
      val dom = pr.orderBy(col("pk").desc, col("k")).limit(1)
        .select(col("k").as("dom_k"))
      tt.crossJoin(broadcast(h)).crossJoin(broadcast(dom))
        .select(col("n").as("n_days"),
          (round(col("tot"), 6) + 0.0).as("total_power"),
          (round(col("hn"), 6) + 0.0).as("spectral_entropy"),
          col("dom_k").as("dominant_k"),
          round(col("n").cast("double") / col("dom_k"), 2)
            .as("dominant_period_days"))
    },

    // ---- Sharpe ratio (per-nation daily revenue returns) ----
    // The risk-ADJUSTED return read completing the q_expected_
    // shortfall / q_max_drawdown family: per nation, mean and sd of
    // the day-over-day returns and their ratio, annualized by the
    // pinned √252 trading-day literal (15.874507866387544 — one
    // double constant on both engines, not each engine's sqrt).
    // Returns divide exact decimal day revenues (identical doubles);
    // the moment sums run over bounded day counts at O(1) magnitudes.
    // 100-TB story: one keyed collapse to the nation×day frame, a
    // per-nation lag window, one 25-row moment collapse.
    sql(
      "q_sharpe_ratio",
      """WITH rev AS (SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
        |          sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rv
        |        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |        JOIN nation n ON n.n_nationkey = c.c_nationkey
        |        GROUP BY 1, 2),
        |r AS (SELECT n_name, day, CAST(rv AS DOUBLE)
        |        / lag(CAST(rv AS DOUBLE)) OVER (PARTITION BY n_name
        |            ORDER BY day) - 1.0e0 AS ret FROM rev),
        |m AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n, sum(ret) AS s,
        |        sum(ret * ret) AS s2 FROM r WHERE ret IS NOT NULL
        |      GROUP BY 1),
        |f AS (SELECT n_name, n, s / n AS mu,
        |        sqrt((s2 - s * s / n) / (n - 1)) AS sd FROM m)
        |SELECT n_name, n AS n_days, round(mu, 6) + 0.0 AS mean_ret,
        |  round(sd, 6) + 0.0 AS sd_ret,
        |  round(mu / sd, 6) + 0.0 AS sharpe_daily,
        |  round(mu / sd * 15.874507866387544e0, 6) + 0.0 AS sharpe_annual
        |FROM f ORDER BY n_name""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
      val wDay = Window.partitionBy("n_name").orderBy("day")
      val m = rev
        .withColumn("ret", col("rv").cast("double")
          / lag(col("rv").cast("double"), 1).over(wDay) - lit(1.0))
        .where(col("ret").isNotNull)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum("ret").as("s"),
          sum(col("ret") * col("ret")).as("s2"))
      val mu = col("s") / col("n")
      val sd = sqrt((col("s2") - col("s") * col("s") / col("n"))
        / (col("n") - 1))
      m.select(col("n_name"), col("n").as("n_days"),
          (round(mu, 6) + 0.0).as("mean_ret"),
          (round(sd, 6) + 0.0).as("sd_ret"),
          (round(mu / sd, 6) + 0.0).as("sharpe_daily"),
          (round(mu / sd * 15.874507866387544, 6) + 0.0)
            .as("sharpe_annual"))
        .orderBy("n_name")
    }
  )

  /** One unrolled Newton round of the Cox partial-likelihood oracle:
    * risk probabilities from round p's beta, score/information sums,
    * beta update rounded to the 8-dp grid. */
  private def coxRoundSql(k: Int): String = {
    val p = k - 1
    s"""p$k AS (SELECT e.d, e.d1, (e.n1 * exp(b.beta))
       |        / (e.n0 + e.n1 * exp(b.beta)) AS pr
       |      FROM e CROSS JOIN b$p b),
       |g$k AS (SELECT sum(d1 - d * pr) AS u_score,
       |        sum(d * pr * (1.0e0 - pr)) AS info FROM p$k),
       |b$k AS (SELECT round((SELECT beta FROM b$p) + u_score / info, 8)
       |          AS beta,
       |        round(u_score, 6) AS u_score, round(info, 6) AS info
       |        FROM g$k)""".stripMargin
  }
}
