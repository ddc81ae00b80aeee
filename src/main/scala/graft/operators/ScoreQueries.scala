package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation and feature-engineering operators — the scoring
  * shapes an ML-platform team runs over event telemetry when a model
  * ships: gains/lift tables, leakage-safe target encoding, pairwise
  * mutual information for feature screening, cumulative-hazard
  * survival, and per-key rolling trend slopes.
  *
  * Scale designs:
  *  - gains table: the corpus collapses ONCE to a per-user
  *    (score, outcome) frame; deciling and the cumulative-capture
  *    windows run over that already-aggregated frame (#users rows,
  *    not #events). At 100 TB the global ntile would be the next
  *    bottleneck — the [[GlobalPrefix]] sampled-boundary rewrite is
  *    the documented escape hatch (same pattern as q_decile_lift).
  *  - target encoding: out-of-fold means need (total − own-fold) per
  *    category — ONE groupBy(category, fold) shuffle, then the
  *    per-category totals come from a window over the tiny
  *    (categories × folds) frame. No second corpus pass, no join
  *    back to the corpus (the encoder table broadcasts at apply
  *    time).
  *  - MI matrix: all three pairwise joints AND all marginals come
  *    from ONE `groupingSets` pass (Spark 4 Dataset.groupingSets —
  *    a single shuffle producing 7 grouping sets); the MI arithmetic
  *    runs on the ≤|A|·|B| joint frames with broadcast marginal
  *    lookups. The naive form is 3 joint + 3 marginal corpus scans.
  *  - Nelson–Aalen: same one-row-per-user → one-row-per-duration
  *    collapse as q_survival_km (StatsQueries.scala), then the
  *    cumulative hazard is a prefix sum over the ≤#days frame. The
  *    two estimators intentionally share their risk-set algebra so
  *    KM vs NA differences are estimator differences, not plumbing.
  *  - rolling slope: closed-form OLS over a 10-row window — window
  *    sums accumulate in DECIMAL (exact, order-independent) so the
  *    per-row slope is bit-identical across engines; x is the
  *    in-window row index (exact small ints), never a wall-clock
  *    float.
  */
object ScoreQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  def defs: Seq[QueryDef] = Seq(

    // ---- gains / lift table (decile capture of a behavioral score) ----
    // Score each user by first-half activity volume, observe whether
    // they purchase in the second half, decile by score, and report
    // the cumulative capture rate, lift, and the KS separation per
    // decile — the table every targeting model ships with.
    sql(
      "q_gains_table",
      """WITH b AS (SELECT epoch_us(min(ts))
        |                  + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS mid
        |           FROM events),
        |u AS (SELECT user_id,
        |        CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS score,
        |        CAST(max(CASE WHEN event_type = 'purchase' AND value > 150
        |                      AND epoch_us(ts) >= (SELECT mid FROM b)
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS converted
        |      FROM events GROUP BY user_id),
        |d AS (SELECT score, converted,
        |             ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
        |      FROM u),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(converted) AS BIGINT) AS conv
        |      FROM d GROUP BY decile),
        |c AS (SELECT decile, n, conv,
        |        CAST(sum(conv) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_conv,
        |        CAST(sum(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
        |        CAST(sum(conv) OVER () AS BIGINT) AS tot_conv,
        |        CAST(sum(n) OVER () AS BIGINT) AS tot_n
        |      FROM g)
        |SELECT decile, n, conv,
        |  round(CAST(cum_conv AS DOUBLE) / tot_conv, 4) AS capture,
        |  round((CAST(cum_conv AS DOUBLE) / cum_n)
        |        / (CAST(tot_conv AS DOUBLE) / tot_n), 4) AS lift,
        |  round(CAST(cum_conv AS DOUBLE) / tot_conv
        |        - CAST(cum_n - cum_conv AS DOUBLE) / (tot_n - tot_conv), 4) AS ks
        |FROM c ORDER BY decile""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val b = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
        .select((unix_micros(col("t0"))
          + expr("(unix_micros(t1) - unix_micros(t0)) div 2")).as("mid_us"))
      // one corpus pass → per-user frame; everything downstream is #users
      val u = ev.crossJoin(broadcast(b))
        .groupBy("user_id", "mid_us")
        .agg(
          sum(when(unix_micros(col("ts")) < col("mid_us"), 1L).otherwise(0L))
            .as("score"),
          max(when(col("event_type") === "purchase" && col("value") > 150
            && unix_micros(col("ts")) >= col("mid_us"), 1L).otherwise(0L))
            .as("converted"))
      val d = u.select(col("score"), col("converted"),
        ntile(10).over(Window.orderBy(desc("score"), col("user_id")))
          .cast("long").as("decile"))
      val g = d.groupBy("decile")
        .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
      val wCum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val c = g
        .withColumn("cum_conv", sum("conv").over(wCum))
        .withColumn("cum_n", sum("n").over(wCum))
        .withColumn("tot_conv", sum("conv").over(wAll))
        .withColumn("tot_n", sum("n").over(wAll))
      c.select(col("decile"), col("n"), col("conv"),
          round(col("cum_conv").cast("double") / col("tot_conv"), 4).as("capture"),
          round((col("cum_conv").cast("double") / col("cum_n"))
            / (col("tot_conv").cast("double") / col("tot_n")), 4).as("lift"),
          round(col("cum_conv").cast("double") / col("tot_conv")
            - (col("cum_n") - col("cum_conv")).cast("double")
              / (col("tot_n") - col("tot_conv")), 4).as("ks"))
        .orderBy("decile")
    },

    // ---- leakage-safe K-fold target encoding ----
    // Encode c_nationkey by the out-of-fold mean of c_acctbal: each
    // (category, fold) cell gets (Σ_total − Σ_fold)/(n_total − n_fold)
    // so a row never sees its own fold's target — the standard
    // high-cardinality categorical encoder, built leakage-safe.
    // DECIMAL sums keep the subtraction exact across engines.
    sql(
      "q_target_encode",
      """WITH f AS (SELECT c_nationkey AS cat, c_custkey % 5 AS fold,
        |                  CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s
        |           FROM customer GROUP BY 1, 2),
        |w AS (SELECT cat, fold, n, s,
        |        CAST(sum(n) OVER (PARTITION BY cat) AS BIGINT) AS n_tot,
        |        CAST(sum(s) OVER (PARTITION BY cat) AS DECIMAL(38,6)) AS s_tot
        |      FROM f)
        |SELECT cat, fold, n,
        |  round(CAST(s_tot - s AS DOUBLE) / (n_tot - n), 4) AS enc,
        |  round(CAST(s_tot AS DOUBLE) / n_tot, 4) AS enc_naive
        |FROM w WHERE n_tot > n
        |ORDER BY cat, fold""".stripMargin) { (s, dir) =>
      val f = t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("cat"), (col("c_custkey") % 5).as("fold"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(18,6)"))
            .cast("decimal(38,6)").as("s"))
      val wCat = Window.partitionBy("cat")
      val w = f
        .withColumn("n_tot", sum("n").over(wCat))
        .withColumn("s_tot", sum("s").over(wCat).cast("decimal(38,6)"))
      w.where(col("n_tot") > col("n"))
        .select(col("cat"), col("fold"), col("n"),
          round((col("s_tot") - col("s")).cast("double")
            / (col("n_tot") - col("n")), 4).as("enc"),
          round(col("s_tot").cast("double") / col("n_tot"), 4).as("enc_naive"))
        .orderBy("cat", "fold")
    },

    // ---- pairwise mutual information (feature screening matrix) ----
    // MI in bits between the three categorical views of an event
    // (type, day-of-week, value bucket) — the feature-redundancy
    // screen run before training. ONE Dataset.groupingSets pass
    // (Spark 4) produces all three pairwise joints, all three
    // marginals, and the grand total in a single shuffle; the MI sums
    // then run over the tiny joint frames with broadcast marginals.
    sql(
      "q_mi_matrix",
      """WITH e AS (SELECT event_type AS et,
        |                  CAST(dayofweek(ts) AS BIGINT) AS dw,
        |                  CASE WHEN value < 20 THEN 'lo'
        |                       WHEN value < 70 THEN 'mid'
        |                       ELSE 'hi' END AS vb
        |           FROM events),
        |g AS (SELECT et, dw, vb, CAST(count(*) AS BIGINT) AS c
        |      FROM e GROUP BY GROUPING SETS ((et, dw), (et, vb), (dw, vb),
        |                                     (et), (dw), (vb), ())),
        |tot AS (SELECT c AS n FROM g
        |        WHERE et IS NULL AND dw IS NULL AND vb IS NULL),
        |met AS (SELECT et, c FROM g
        |        WHERE et IS NOT NULL AND dw IS NULL AND vb IS NULL),
        |mdw AS (SELECT dw, c FROM g
        |        WHERE dw IS NOT NULL AND et IS NULL AND vb IS NULL),
        |mvb AS (SELECT vb, c FROM g
        |        WHERE vb IS NOT NULL AND et IS NULL AND dw IS NULL),
        |p1 AS (SELECT 'et~dw' AS pair,
        |         sum((CAST(j.c AS DOUBLE) / (SELECT n FROM tot))
        |             * log2(CAST(j.c AS DOUBLE) * (SELECT n FROM tot)
        |                    / (CAST(x.c AS DOUBLE) * y.c))) AS mi
        |       FROM (SELECT et, dw, c FROM g
        |             WHERE et IS NOT NULL AND dw IS NOT NULL AND vb IS NULL) j
        |       JOIN met x ON j.et = x.et JOIN mdw y ON j.dw = y.dw),
        |p2 AS (SELECT 'et~vb' AS pair,
        |         sum((CAST(j.c AS DOUBLE) / (SELECT n FROM tot))
        |             * log2(CAST(j.c AS DOUBLE) * (SELECT n FROM tot)
        |                    / (CAST(x.c AS DOUBLE) * y.c))) AS mi
        |       FROM (SELECT et, vb, c FROM g
        |             WHERE et IS NOT NULL AND vb IS NOT NULL AND dw IS NULL) j
        |       JOIN met x ON j.et = x.et JOIN mvb y ON j.vb = y.vb),
        |p3 AS (SELECT 'dw~vb' AS pair,
        |         sum((CAST(j.c AS DOUBLE) / (SELECT n FROM tot))
        |             * log2(CAST(j.c AS DOUBLE) * (SELECT n FROM tot)
        |                    / (CAST(x.c AS DOUBLE) * y.c))) AS mi
        |       FROM (SELECT dw, vb, c FROM g
        |             WHERE dw IS NOT NULL AND vb IS NOT NULL AND et IS NULL) j
        |       JOIN mdw x ON j.dw = x.dw JOIN mvb y ON j.vb = y.vb)
        |SELECT pair, round(mi, 6) AS mi_bits
        |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |      UNION ALL SELECT * FROM p3)
        |ORDER BY pair""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events").select(
        col("event_type").as("et"),
        dayofweek(col("ts")).cast("long").as("dw"),
        when(col("value") < 20, "lo").when(col("value") < 70, "mid")
          .otherwise("hi").as("vb"))
      // ONE shuffle for joints + marginals + total (7 grouping sets)
      val g = e.groupingSets(
          Seq(Seq(col("et"), col("dw")), Seq(col("et"), col("vb")),
            Seq(col("dw"), col("vb")), Seq(col("et")), Seq(col("dw")),
            Seq(col("vb")), Seq()),
          col("et"), col("dw"), col("vb"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // 7 consumers below, all tiny
      val tot = g.where(col("et").isNull && col("dw").isNull && col("vb").isNull)
        .select(col("c").as("n"))
      def marg(k: String, others: Seq[String]) =
        g.where(others.map(col(_).isNull).reduce(_ && _)
          && col(k).isNotNull).select(col(k), col("c"))
      val met = marg("et", Seq("dw", "vb"))
      val mdw = marg("dw", Seq("et", "vb"))
      val mvb = marg("vb", Seq("et", "dw"))
      def pairMi(name: String, x: String, y: String, nullCol: String,
          mx: org.apache.spark.sql.DataFrame, my: org.apache.spark.sql.DataFrame) = {
        val j = g.where(col(x).isNotNull && col(y).isNotNull && col(nullCol).isNull)
          .select(col(x), col(y), col("c"))
        j.join(broadcast(mx.withColumnRenamed("c", "cx")), x)
          .join(broadcast(my.withColumnRenamed("c", "cy")), y)
          .crossJoin(broadcast(tot))
          .agg(sum((col("c").cast("double") / col("n"))
            * log2(col("c").cast("double") * col("n")
              / (col("cx").cast("double") * col("cy")))).as("mi"))
          .select(lit(name).as("pair"), col("mi"))
      }
      pairMi("et~dw", "et", "dw", "vb", met, mdw)
        .unionByName(pairMi("et~vb", "et", "vb", "dw", met, mvb))
        .unionByName(pairMi("dw~vb", "dw", "vb", "et", mdw, mvb))
        .select(col("pair"), round(col("mi"), 6).as("mi_bits"))
        .orderBy("pair")
    },

    // ---- Nelson–Aalen cumulative hazard (+ Fleming–Harrington S) ----
    // The hazard-scale twin of q_survival_km (StatsQueries.scala):
    // same time-to-conversion frame (first event → first purchase,
    // right-censored at corpus end), but H(t) = Σ d/n_risk — additive,
    // so its prefix sum needs no absorbing-zero guard — and the
    // Fleming–Harrington survival exp(−H) rides the same window.
    sql(
      "q_nelson_aalen",
      """WITH u AS (SELECT user_id, min(ts) AS first_ts,
        |             min(CASE WHEN event_type = 'purchase' THEN ts END) AS conv_ts,
        |             max(ts) AS last_ts
        |           FROM events GROUP BY 1),
        |e AS (SELECT CAST(max(last_ts) AS TIMESTAMP) AS endt FROM u),
        |s AS (SELECT user_id,
        |        CASE WHEN conv_ts IS NOT NULL
        |             THEN CAST(date_diff('day', CAST(first_ts AS DATE),
        |                                 CAST(conv_ts AS DATE)) AS BIGINT)
        |             ELSE CAST(date_diff('day', CAST(first_ts AS DATE),
        |                                 CAST((SELECT endt FROM e) AS DATE)) AS BIGINT)
        |             END AS dur,
        |        CASE WHEN conv_ts IS NOT NULL THEN 1 ELSE 0 END AS died
        |      FROM u),
        |t AS (SELECT dur, CAST(sum(died) AS BIGINT) AS d,
        |             CAST(count(*) AS BIGINT) AS ev FROM s GROUP BY dur),
        |r AS (SELECT dur, d,
        |        CAST((SELECT count(*) FROM s) AS BIGINT)
        |          - CAST(coalesce(sum(ev) OVER (ORDER BY dur
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            AS BIGINT) AS n_risk
        |      FROM t),
        |k AS (SELECT dur, d, n_risk,
        |        sum(CAST(d AS DOUBLE) / n_risk)
        |          OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS cumhaz
        |      FROM r)
        |SELECT dur AS t_days, n_risk, d AS n_events,
        |       round(cumhaz, 6) AS cum_hazard,
        |       round(exp(-cumhaz), 6) AS survival_fh
        |FROM k WHERE d > 0 ORDER BY t_days""".stripMargin) { (s, dir) =>
      val u = t(s, dir, "events")
        .groupBy("user_id")
        .agg(min("ts").as("first_ts"),
          min(when(col("event_type") === "purchase", col("ts"))).as("conv_ts"),
          max("ts").as("last_ts"))
        .localCheckpoint()
      val e = u.agg(max("last_ts").as("endt"))
      val sdf = u.crossJoin(broadcast(e))
        .select(
          when(col("conv_ts").isNotNull,
            datediff(to_date(col("conv_ts")), to_date(col("first_ts"))))
            .otherwise(datediff(to_date(col("endt")), to_date(col("first_ts"))))
            .cast("long").as("dur"),
          when(col("conv_ts").isNotNull, 1L).otherwise(0L).as("died"))
      val tt = sdf.groupBy("dur")
        .agg(sum("died").as("d"), count(lit(1)).as("ev"))
        .localCheckpoint()
      val n0 = tt.agg(sum("ev").as("total"))
      val wAll = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
      val wPrev = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
      val r = tt.crossJoin(broadcast(n0))
        .withColumn("n_risk",
          col("total") - coalesce(sum("ev").over(wPrev), lit(0L)))
        .withColumn("cumhaz",
          sum(col("d").cast("double") / col("n_risk")).over(wAll))
      r.where(col("d") > 0)
        .select(col("dur").as("t_days"), col("n_risk"),
          col("d").as("n_events"),
          round(col("cumhaz"), 6).as("cum_hazard"),
          round(exp(-col("cumhaz")), 6).as("survival_fh"))
        .orderBy("t_days")
    },

    // ---- rolling regression slope (per-key windowed trend) ----
    // Per-user OLS slope of value over the last 10 events, closed
    // form from window sums: x is the in-window row index (exact
    // ints), y accumulates in DECIMAL — the per-row slope is then
    // bit-identical across engines regardless of merge order. The
    // per-row trend detector for noisy telemetry; one per-key
    // shuffle+sort total.
    // With in-window x = 0..9: Σx = 45, Σx² = 285, so the denominator
    // is 10·285 − 45² = 825, and Σxy = Σ(rnⱼ·yⱼ) − (rnᵢ−9)·Σyⱼ shifts
    // the raw rn-weighted sum into window coordinates.
    sql(
      "q_rolling_slope",
      """WITH o AS (SELECT user_id, event_id,
        |    CAST(value AS DECIMAL(18,6)) AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE user_id % 20 = 0),
        |w AS (SELECT user_id, event_id, rn,
        |    CAST(sum(y) OVER (PARTITION BY user_id ORDER BY rn
        |          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS sy,
        |    CAST(sum(y * rn) OVER (PARTITION BY user_id ORDER BY rn
        |          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS sxy
        |  FROM o)
        |SELECT user_id, event_id,
        |  round((10.0 * (CAST(sxy AS DOUBLE) - (rn - 9) * CAST(sy AS DOUBLE))
        |         - 45.0 * CAST(sy AS DOUBLE)) / 825.0, 4) AS slope
        |FROM w WHERE rn >= 10
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val wOrd = Window.partitionBy("user_id").orderBy("rn")
        .rowsBetween(-9, 0)
      val o = t(s, dir, "events")
        .where(col("user_id") % 20 === 0)
        .select(col("user_id"), col("event_id"),
          col("value").cast("decimal(18,6)").as("y"),
          row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")).as("rn"))
      val w = o
        .withColumn("sy", sum("y").over(wOrd).cast("decimal(38,6)"))
        .withColumn("sxy", sum(col("y") * col("rn")).over(wOrd).cast("decimal(38,6)"))
      w.where(col("rn") >= 10)
        .select(col("user_id"), col("event_id"),
          round((lit(10.0) * (col("sxy").cast("double")
            - (col("rn") - 9) * col("sy").cast("double"))
            - lit(45.0) * col("sy").cast("double")) / lit(825.0), 4)
            .as("slope"))
        .orderBy("user_id", "event_id")
    },

    // ---- gradient-boosted stumps (2 unrolled boosting rounds) ----
    // The trainer extension of q_stump_split: squared-loss gradient
    // boosting with depth-1 trees over (l_quantity, l_discount)
    // predicting l_extendedprice, learning rate 0.5. Each round is
    // ONE groupingSets corpus pass — both features' per-value
    // residual partials AND the global MSE come from a single
    // shuffle; the split search (cumulative sums + argmax of
    // SL²/nL + SR²/nR) runs on the ≤62-row value ladder, and the
    // chosen stump re-enters the next pass as a 1-row broadcast.
    // mse_after descends monotonically by construction — the
    // in-output training audit.
    sql(
      "q_gbdt_stumps",
      """WITH b AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sy
        |  FROM lineitem),
        |m AS (SELECT n, CAST(sy AS DOUBLE) / n AS mu FROM b),
        |e0 AS (SELECT l_quantity AS vq, l_discount AS vd,
        |    l_extendedprice - (SELECT mu FROM m) AS e FROM lineitem),
        |vq1 AS (SELECT 'q' AS feat, vq AS v, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CAST(e AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS se
        |  FROM e0 GROUP BY 2),
        |vd1 AS (SELECT 'd' AS feat, vd AS v, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CAST(e AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS se
        |  FROM e0 GROUP BY 2),
        |t0 AS (SELECT CAST(sum(CAST(e * e AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS see,
        |    CAST(count(*) AS BIGINT) AS n FROM e0),
        |c1 AS (SELECT feat, v,
        |    sum(cnt) OVER (PARTITION BY feat ORDER BY v) AS nl,
        |    sum(se) OVER (PARTITION BY feat ORDER BY v) AS sl,
        |    sum(cnt) OVER (PARTITION BY feat) AS nt,
        |    sum(se) OVER (PARTITION BY feat) AS st
        |  FROM (SELECT * FROM vq1 UNION ALL SELECT * FROM vd1) v1),
        |bs1 AS (SELECT feat, v, CAST(sl AS DOUBLE) / nl AS wl,
        |    CAST(st - sl AS DOUBLE) / (nt - nl) AS wr,
        |    round(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl
        |          + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
        |            / (nt - nl), 6) AS gain
        |  FROM c1 WHERE nt - nl > 0
        |  ORDER BY gain DESC, feat, v LIMIT 1),
        |e1 AS (SELECT vq, vd, e - 0.5 * (CASE WHEN (SELECT feat FROM bs1) = 'q'
        |      THEN CASE WHEN vq <= (SELECT v FROM bs1) THEN (SELECT wl FROM bs1)
        |                ELSE (SELECT wr FROM bs1) END
        |      ELSE CASE WHEN vd <= (SELECT v FROM bs1) THEN (SELECT wl FROM bs1)
        |                ELSE (SELECT wr FROM bs1) END END) AS e
        |  FROM e0),
        |vq2 AS (SELECT 'q' AS feat, vq AS v, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CAST(e AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS se
        |  FROM e1 GROUP BY 2),
        |vd2 AS (SELECT 'd' AS feat, vd AS v, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CAST(e AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS se
        |  FROM e1 GROUP BY 2),
        |t1 AS (SELECT CAST(sum(CAST(e * e AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS see,
        |    CAST(count(*) AS BIGINT) AS n FROM e1),
        |c2 AS (SELECT feat, v,
        |    sum(cnt) OVER (PARTITION BY feat ORDER BY v) AS nl,
        |    sum(se) OVER (PARTITION BY feat ORDER BY v) AS sl,
        |    sum(cnt) OVER (PARTITION BY feat) AS nt,
        |    sum(se) OVER (PARTITION BY feat) AS st
        |  FROM (SELECT * FROM vq2 UNION ALL SELECT * FROM vd2) v2),
        |bs2 AS (SELECT feat, v, CAST(sl AS DOUBLE) / nl AS wl,
        |    CAST(st - sl AS DOUBLE) / (nt - nl) AS wr,
        |    round(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl
        |          + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
        |            / (nt - nl), 6) AS gain
        |  FROM c2 WHERE nt - nl > 0
        |  ORDER BY gain DESC, feat, v LIMIT 1),
        |e2 AS (SELECT e - 0.5 * (CASE WHEN (SELECT feat FROM bs2) = 'q'
        |      THEN CASE WHEN vq <= (SELECT v FROM bs2) THEN (SELECT wl FROM bs2)
        |                ELSE (SELECT wr FROM bs2) END
        |      ELSE CASE WHEN vd <= (SELECT v FROM bs2) THEN (SELECT wl FROM bs2)
        |                ELSE (SELECT wr FROM bs2) END END) AS e
        |  FROM e1),
        |t2 AS (SELECT CAST(sum(CAST(e * e AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS see,
        |    CAST(count(*) AS BIGINT) AS n FROM e2)
        |SELECT CAST(1 AS BIGINT) AS round, feat AS feature,
        |  round(v, 4) AS threshold, round(wl, 6) AS w_left,
        |  round(wr, 6) AS w_right, round(gain, 2) AS gain,
        |  round(CAST((SELECT see FROM t0) AS DOUBLE) / (SELECT n FROM t0), 4)
        |    AS mse_before,
        |  round(CAST((SELECT see FROM t1) AS DOUBLE) / (SELECT n FROM t1), 4)
        |    AS mse_after
        |FROM bs1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), feat, round(v, 4), round(wl, 6),
        |  round(wr, 6), round(gain, 2),
        |  round(CAST((SELECT see FROM t1) AS DOUBLE) / (SELECT n FROM t1), 4),
        |  round(CAST((SELECT see FROM t2) AS DOUBLE) / (SELECT n FROM t2), 4)
        |FROM bs2
        |ORDER BY round""".stripMargin) { (s, dir) =>
      // r13 optimization (guide §1.2/§6): the single-row-group corpus
      // parquet decodes in ONE task, and the old shape paid that
      // serial decode FOUR times (mean pass + two per-round collapses
      // + final MSE). Cache the 3-column projection once — every
      // later pass is a 32-way in-memory scan of ~600k skinny rows.
      // Values are bit-identical: the cache stores the exact source
      // columns, and every downstream aggregate is a DECIMAL sum
      // (merge-order-free). Measured at sf0.1: 3.75 s → see
      // OPTIMIZATION_r13.md (4 parquet passes → 1).
      val li = t(s, dir, "lineitem")
        .select(col("l_quantity").as("vq"), col("l_discount").as("vd"),
          col("l_extendedprice").as("y"))
        // hash exchange BEFORE the checkpoint (the q_quantile_reg
        // lesson): the single-row-group scan yields a 1-partition
        // cache, and every later pass would deserialize 600k rows
        // single-threaded — worse than re-scanning parquet (measured:
        // 5.8 s vs 3.6 s baseline). Hash partitioning on the row
        // values (deterministic, high-cardinality — guide §2.5)
        // instead of round-robin: keyless repartition pays a serial
        // sort-before-repartition of the whole corpus inside the one
        // scan task (SPARK-23207). One cheap exchange buys full-width
        // CPU for all four passes.
        .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
          col("vq"), col("vd"), col("y"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val b = li.agg(count(lit(1)).as("n"),
        sum(col("y").cast("decimal(18,4)"))
          .cast("decimal(38,4)").as("sy"))
        .select(col("n"), (col("sy").cast("double") / col("n")).as("mu"))
        .localCheckpoint()
      val e0 = li.crossJoin(broadcast(b.select("mu")))
        .select(col("vq"), col("vd"), (col("y") - col("mu")).as("e"))
      // one plain (vq, vd) cell collapse per round — ≤ |dom(q)|·|dom(d)|
      // groups (≈550 here), perfect map-side combine, no Expand
      // triplication (a groupingSets variant measured 3.5× slower at
      // the 10× decade: Expand pushes every corpus row through the
      // DECIMAL aggregators three times). Both feature ladders AND the
      // global MSE are re-aggregations of the tiny cell frame.
      // Continuous features would pre-bucket into the same shape.
      def collapse(e: DataFrame) =
        e.groupBy("vq", "vd")
          .agg(count(lit(1)).as("cnt"),
            sum(col("e").cast("decimal(28,12)"))
              .cast("decimal(38,12)").as("se"),
            sum((col("e") * col("e")).cast("decimal(38,12)"))
              .cast("decimal(38,12)").as("see"))
          .localCheckpoint() // ≤550 cells — ladder + mse consumers
      def bestSplit(gs: DataFrame) = {
        def ladderOf(feat: String, v: String) = gs.groupBy(col(v))
          .agg(sum("cnt").as("cnt"),
            sum("se").cast("decimal(38,12)").as("se"))
          .select(lit(feat).as("feat"), col(v).cast("double").as("v"),
            col("cnt"), col("se"))
        val ladder = ladderOf("q", "vq").unionByName(ladderOf("d", "vd"))
        val wCum = Window.partitionBy("feat").orderBy("v")
        val wAll = Window.partitionBy("feat")
        val c = ladder
          .withColumn("nl", sum("cnt").over(wCum))
          .withColumn("sl", sum("se").over(wCum))
          .withColumn("nt", sum("cnt").over(wAll))
          .withColumn("st", sum("se").over(wAll))
        c.where(col("nt") - col("nl") > 0)
          .select(col("feat"), col("v"),
            (col("sl").cast("double") / col("nl")).as("wl"),
            ((col("st") - col("sl")).cast("double")
              / (col("nt") - col("nl"))).as("wr"),
            round(col("sl").cast("double") * col("sl").cast("double") / col("nl")
              + (col("st") - col("sl")).cast("double")
                * (col("st") - col("sl")).cast("double")
                / (col("nt") - col("nl")), 6).as("gain"))
          .orderBy(desc("gain"), col("feat"), col("v"))
          .limit(1)
          .localCheckpoint() // the stump, re-broadcast into the next pass
      }
      def mseOf(gs: DataFrame) = gs
        .agg(sum("see").cast("decimal(38,12)").as("see"),
          sum("cnt").as("cnt"))
        .select((col("see").cast("double") / col("cnt")).as("mse"))
      def boost(e: DataFrame, best: DataFrame) = {
        val pred = when(col("feat") === "q",
          when(col("vq") <= col("v"), col("wl")).otherwise(col("wr")))
          .otherwise(
            when(col("vd") <= col("v"), col("wl")).otherwise(col("wr")))
        e.crossJoin(broadcast(best))
          .select(col("vq"), col("vd"), (col("e") - lit(0.5) * pred).as("e"))
      }
      val gs1 = collapse(e0)
      val bs1 = bestSplit(gs1)
      val e1 = boost(e0, bs1)
      val gs2 = collapse(e1)
      val bs2 = bestSplit(gs2)
      val e2 = boost(e1, bs2)
      val t2m = e2.agg((sum((col("e") * col("e")).cast("decimal(38,12)"))
        .cast("decimal(38,12)").cast("double") / count(lit(1))).as("mse"))
      def row(rnd: Int, bs: DataFrame, before: DataFrame, after: DataFrame) =
        bs.crossJoin(broadcast(before.select(col("mse").as("mse_b"))))
          .crossJoin(broadcast(after.select(col("mse").as("mse_a"))))
          .select(lit(rnd.toLong).as("round"), col("feat").as("feature"),
            round(col("v"), 4).as("threshold"), round(col("wl"), 6).as("w_left"),
            round(col("wr"), 6).as("w_right"), round(col("gain"), 2).as("gain"),
            round(col("mse_b"), 4).as("mse_before"),
            round(col("mse_a"), 4).as("mse_after"))
      row(1, bs1, mseOf(gs1), mseOf(gs2))
        .unionByName(row(2, bs2, mseOf(gs2), t2m))
        .orderBy("round")
    },

    // ---- one ALS round (matrix factorization as joins) ----
    // The recommender trainer: rank-2 factors for the user×event_type
    // rating matrix (per-user mean value), one full alternating-
    // least-squares round with ridge λ=0.1. Item factors seed
    // deterministically (y = (1, rank/K)); the USER solve is a
    // per-user 2×2 closed form against the K-row broadcast of item
    // factors; the ITEM solve transposes it against the user-factor
    // frame (a user-keyed hash join — the user frame never
    // broadcasts). The corpus collapses ONCE to (user, item) means;
    // every later stage works on rating-matrix-sized frames. RMSE is
    // measured after the user half-step and after the full round —
    // the in-output descent audit.
    sql(
      "q_als_round",
      """WITH um AS (SELECT user_id, event_type,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS r
        |  FROM events GROUP BY 1, 2),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |k AS (SELECT CAST(count(*) AS BIGINT) AS kk FROM ty),
        |y0 AS (SELECT event_type, 1.0 AS y1,
        |    CAST(row_number() OVER (ORDER BY event_type) AS DOUBLE)
        |      / (SELECT kk FROM k) AS y2
        |  FROM ty),
        |ux AS (SELECT u.user_id,
        |    CAST(sum(CAST(y.y1 * y.y1 AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS a11,
        |    CAST(sum(CAST(y.y1 * y.y2 AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS a12,
        |    CAST(sum(CAST(y.y2 * y.y2 AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS a22,
        |    CAST(sum(CAST(y.y1 * u.r AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS b1,
        |    CAST(sum(CAST(y.y2 * u.r AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS b2
        |  FROM um u JOIN y0 y USING (event_type) GROUP BY 1),
        |x AS (SELECT user_id,
        |    ((CAST(a22 AS DOUBLE) + 0.1) * CAST(b1 AS DOUBLE)
        |     - CAST(a12 AS DOUBLE) * CAST(b2 AS DOUBLE))
        |      / ((CAST(a11 AS DOUBLE) + 0.1) * (CAST(a22 AS DOUBLE) + 0.1)
        |         - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)) AS x1,
        |    ((CAST(a11 AS DOUBLE) + 0.1) * CAST(b2 AS DOUBLE)
        |     - CAST(a12 AS DOUBLE) * CAST(b1 AS DOUBLE))
        |      / ((CAST(a11 AS DOUBLE) + 0.1) * (CAST(a22 AS DOUBLE) + 0.1)
        |         - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)) AS x2
        |  FROM ux),
        |r0 AS (SELECT sqrt(CAST(sum(CAST((u.r - (x.x1 * y.y1 + x.x2 * y.y2))
        |        * (u.r - (x.x1 * y.y1 + x.x2 * y.y2)) AS DECIMAL(28,12)))
        |      AS DOUBLE) / count(*)) AS rmse
        |  FROM um u JOIN x USING (user_id) JOIN y0 y USING (event_type)),
        |iy AS (SELECT u.event_type, CAST(count(*) AS BIGINT) AS n_ratings,
        |    CAST(sum(CAST(x.x1 * x.x1 AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS a11,
        |    CAST(sum(CAST(x.x1 * x.x2 AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS a12,
        |    CAST(sum(CAST(x.x2 * x.x2 AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS a22,
        |    CAST(sum(CAST(x.x1 * u.r AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS b1,
        |    CAST(sum(CAST(x.x2 * u.r AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS b2
        |  FROM um u JOIN x USING (user_id) GROUP BY 1),
        |y1t AS (SELECT event_type, n_ratings,
        |    ((CAST(a22 AS DOUBLE) + 0.1) * CAST(b1 AS DOUBLE)
        |     - CAST(a12 AS DOUBLE) * CAST(b2 AS DOUBLE))
        |      / ((CAST(a11 AS DOUBLE) + 0.1) * (CAST(a22 AS DOUBLE) + 0.1)
        |         - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)) AS y1,
        |    ((CAST(a11 AS DOUBLE) + 0.1) * CAST(b2 AS DOUBLE)
        |     - CAST(a12 AS DOUBLE) * CAST(b1 AS DOUBLE))
        |      / ((CAST(a11 AS DOUBLE) + 0.1) * (CAST(a22 AS DOUBLE) + 0.1)
        |         - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)) AS y2
        |  FROM iy),
        |r1 AS (SELECT sqrt(CAST(sum(CAST((u.r - (x.x1 * y.y1 + x.x2 * y.y2))
        |        * (u.r - (x.x1 * y.y1 + x.x2 * y.y2)) AS DECIMAL(28,12)))
        |      AS DOUBLE) / count(*)) AS rmse
        |  FROM um u JOIN x USING (user_id) JOIN y1t y USING (event_type))
        |SELECT y.event_type, y.n_ratings, round(y.y1, 6) AS y1,
        |  round(y.y2, 6) AS y2, round(r0.rmse, 6) AS rmse_half,
        |  round(r1.rmse, 6) AS rmse_after,
        |  CAST(r1.rmse < r0.rmse AS BOOLEAN) AS improved
        |FROM y1t y CROSS JOIN r0 CROSS JOIN r1
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val um = ev.groupBy("user_id", "event_type")
        .agg((sum(col("value").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("r"))
        .localCheckpoint() // the rating matrix — 4 consumers below
      val ty = um.select("event_type").distinct()
      val kk = ty.agg(count(lit(1)).as("kk"))
      val y0 = ty
        .withColumn("rn", row_number().over(Window.orderBy("event_type")))
        .crossJoin(broadcast(kk))
        .select(col("event_type"), lit(1.0).as("y1"),
          (col("rn").cast("double") / col("kk")).as("y2"))
        .localCheckpoint() // K-row item factors
      def d28(c: Column) = c.cast("decimal(28,12)")
      val lam = lit(0.1)
      def solve(pfx: String) = {
        def dd(c: String) = col(c).cast("double")
        val det = (dd("a11") + lam) * (dd("a22") + lam) - dd("a12") * dd("a12")
        Seq(((dd("a22") + lam) * dd("b1") - dd("a12") * dd("b2")) / det,
          ((dd("a11") + lam) * dd("b2") - dd("a12") * dd("b1")) / det)
          .zip(Seq(pfx + "1", pfx + "2"))
      }
      val ux = um.join(broadcast(y0), "event_type")
        .groupBy("user_id").agg(
          sum(d28(col("y1") * col("y1"))).cast("decimal(38,12)").as("a11"),
          sum(d28(col("y1") * col("y2"))).cast("decimal(38,12)").as("a12"),
          sum(d28(col("y2") * col("y2"))).cast("decimal(38,12)").as("a22"),
          sum(d28(col("y1") * col("r"))).cast("decimal(38,12)").as("b1"),
          sum(d28(col("y2") * col("r"))).cast("decimal(38,12)").as("b2"))
      val x = ux.select(col("user_id") +:
          solve("x").map { case (e, n) => e.as(n) }: _*)
        .localCheckpoint() // user factors — item solve + 2 RMSE passes
      def rmse(yf: DataFrame) = {
        val err = col("r") - (col("x1") * col("y1") + col("x2") * col("y2"))
        um.join(x, "user_id").join(broadcast(yf), "event_type")
          .agg(sqrt(sum(d28(err * err)).cast("double") / count(lit(1)))
            .as("rmse"))
      }
      val iy = um.join(x, "user_id").groupBy("event_type").agg(
        count(lit(1)).as("n_ratings"),
        sum(d28(col("x1") * col("x1"))).cast("decimal(38,12)").as("a11"),
        sum(d28(col("x1") * col("x2"))).cast("decimal(38,12)").as("a12"),
        sum(d28(col("x2") * col("x2"))).cast("decimal(38,12)").as("a22"),
        sum(d28(col("x1") * col("r"))).cast("decimal(38,12)").as("b1"),
        sum(d28(col("x2") * col("r"))).cast("decimal(38,12)").as("b2"))
      val y1t = iy.select(col("event_type") +: col("n_ratings") +:
          solve("y").map { case (e, n) => e.as(n) }: _*)
        .localCheckpoint()
      val r0 = rmse(y0)
      val r1 = rmse(y1t.select(col("event_type"), col("y1"), col("y2")))
      y1t.crossJoin(broadcast(r0.select(col("rmse").as("rmse_half"))))
        .crossJoin(broadcast(r1.select(col("rmse").as("rmse_after"))))
        .select(col("event_type"), col("n_ratings"),
          round(col("y1"), 6).as("y1"), round(col("y2"), 6).as("y2"),
          round(col("rmse_half"), 6).as("rmse_half"),
          round(col("rmse_after"), 6).as("rmse_after"),
          (col("rmse_after") < col("rmse_half")).as("improved"))
        .orderBy("event_type")
    },

    // ---- Brier score Murphy decomposition ----
    // Forecast-quality accounting beyond q_calibration's curve: the
    // Brier score of a probabilistic quality classifier (logistic of
    // n_chars predicting the lexical-diversity label) split into
    // reliability - resolution + uncertainty over 10 probability
    // bins, closed EXACTLY by the two within-bin terms:
    // BS = REL - RES + UNC + WBV - 2*COV (WBV = within-bin forecast
    // variance, COV = within-bin forecast/outcome covariance), with
    // the identity as a value-checked flag. ONE corpus pass to the
    // 10-bin frame; every term rides 1-row broadcasts of the totals.
    sql(
      "q_brier_decomposition",
      """WITH f AS (SELECT
        |    1.0 / (1.0 + exp(-(n_chars - 300) / 100.0)) AS p,
        |    CASE WHEN len(list_distinct(list_filter(string_split(text, ' '),
        |           x -> length(x) > 0)))
        |         > 0.46 * len(list_filter(string_split(text, ' '),
        |           x -> length(x) > 0)) THEN 1 ELSE 0 END AS o
        |  FROM documents),
        |b AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(sum(CAST(p AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS sp,
        |    CAST(sum(o) AS BIGINT) AS so,
        |    CAST(sum(CAST(p * p AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS spp,
        |    CAST(sum(CAST(p * o AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS spo,
        |    CAST(sum(CAST((p - o) * (p - o) AS DECIMAL(28,12)))
        |         AS DECIMAL(38,12)) AS sqerr
        |  FROM f GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_b) AS BIGINT) AS n,
        |    CAST(sum(so) AS BIGINT) AS oall,
        |    CAST(sum(sqerr) AS DECIMAL(38,12)) AS sq,
        |    sum(CAST(n_b AS DOUBLE)
        |        * (CAST(sp AS DOUBLE) / n_b - CAST(so AS DOUBLE) / n_b)
        |        * (CAST(sp AS DOUBLE) / n_b - CAST(so AS DOUBLE) / n_b)) AS rel_n,
        |    sum(CAST(n_b AS DOUBLE)
        |        * (CAST(sp AS DOUBLE) / n_b) * (CAST(sp AS DOUBLE) / n_b)) AS spb2,
        |    sum(CAST(n_b AS DOUBLE)
        |        * (CAST(sp AS DOUBLE) / n_b) * (CAST(so AS DOUBLE) / n_b)) AS spbob,
        |    CAST(sum(spp) AS DECIMAL(38,12)) AS sppall,
        |    CAST(sum(spo) AS DECIMAL(38,12)) AS spoall
        |  FROM b),
        |rs AS (SELECT sum(CAST(b.n_b AS DOUBLE)
        |      * (CAST(b.so AS DOUBLE) / b.n_b - CAST(tt.oall AS DOUBLE) / tt.n)
        |      * (CAST(b.so AS DOUBLE) / b.n_b - CAST(tt.oall AS DOUBLE) / tt.n))
        |      AS res_n
        |   FROM b CROSS JOIN tt),
        |d AS (SELECT n,
        |    CAST(sq AS DOUBLE) / n AS brier,
        |    rel_n / n AS reliability,
        |    (SELECT res_n FROM rs) / n AS resolution,
        |    (CAST(oall AS DOUBLE) / n) * (1 - CAST(oall AS DOUBLE) / n)
        |      AS uncertainty,
        |    (CAST(sppall AS DOUBLE) - spb2) / n AS wb_var,
        |    (CAST(spoall AS DOUBLE) - spbob) / n AS wb_cov
        |  FROM tt)
        |SELECT b.bin, b.n_b, round(CAST(b.sp AS DOUBLE) / b.n_b, 6) AS p_mean,
        |  round(CAST(b.so AS DOUBLE) / b.n_b, 6) AS o_rate,
        |  round(d.brier, 6) AS brier, round(d.reliability, 6) AS reliability,
        |  round(d.resolution, 6) AS resolution,
        |  round(d.uncertainty, 6) AS uncertainty,
        |  round(d.wb_var, 6) AS within_bin_var,
        |  round(d.wb_cov, 6) AS within_bin_cov,
        |  CAST(abs(d.brier - (d.reliability - d.resolution + d.uncertainty
        |                      + d.wb_var - 2 * d.wb_cov)) < 1e-9 AS BOOLEAN)
        |    AS identity_ok
        |FROM b CROSS JOIN d ORDER BY b.bin""".stripMargin) { (s, dir) =>
      val words = filter(split(col("text"), " "), x => length(x) > 0)
      val f = t(s, dir, "documents").select(
        (lit(1.0) / (lit(1.0)
          + exp((col("n_chars") - 300).unary_- / lit(100.0)))).as("p"),
        when(size(array_distinct(words)).cast("double")
          > lit(0.46) * size(words), 1L).otherwise(0L).as("o"))
      def d28(c: Column) = c.cast("decimal(28,12)")
      val b = f.groupBy(least(floor(col("p") * 10).cast("long"), lit(9L))
          .as("bin"))
        .agg(count(lit(1)).as("n_b"),
          sum(d28(col("p"))).cast("decimal(38,12)").as("sp"),
          sum("o").cast("long").as("so"),
          sum(d28(col("p") * col("p"))).cast("decimal(38,12)").as("spp"),
          sum(d28(col("p") * col("o"))).cast("decimal(38,12)").as("spo"),
          sum(d28((col("p") - col("o")) * (col("p") - col("o"))))
            .cast("decimal(38,12)").as("sqerr"))
        .localCheckpoint() // the 10-bin frame -- 3 consumers
      def pb = col("sp").cast("double") / col("n_b")
      def ob = col("so").cast("double") / col("n_b")
      val tt = b.agg(sum("n_b").cast("long").as("n"),
        sum("so").cast("long").as("oall"),
        sum("sqerr").cast("decimal(38,12)").as("sq"),
        sum(col("n_b").cast("double") * (pb - ob) * (pb - ob)).as("rel_n"),
        sum(col("n_b").cast("double") * pb * pb).as("spb2"),
        sum(col("n_b").cast("double") * pb * ob).as("spbob"),
        sum("spp").cast("decimal(38,12)").as("sppall"),
        sum("spo").cast("decimal(38,12)").as("spoall"))
        .localCheckpoint() // 1-row grand totals
      val res = b.crossJoin(broadcast(tt))
        .agg(sum(col("n_b").cast("double")
          * (ob - col("oall").cast("double") / col("n"))
          * (ob - col("oall").cast("double") / col("n"))).as("res_n"))
      val obar = col("oall").cast("double") / col("n")
      val d = tt.crossJoin(broadcast(res)).select(col("n"),
        (col("sq").cast("double") / col("n")).as("brier"),
        (col("rel_n") / col("n")).as("reliability"),
        (col("res_n") / col("n")).as("resolution"),
        (obar * (lit(1) - obar)).as("uncertainty"),
        ((col("sppall").cast("double") - col("spb2")) / col("n")).as("wb_var"),
        ((col("spoall").cast("double") - col("spbob")) / col("n")).as("wb_cov"))
      b.crossJoin(broadcast(d))
        .select(col("bin"), col("n_b"), round(pb, 6).as("p_mean"),
          round(ob, 6).as("o_rate"), round(col("brier"), 6).as("brier"),
          round(col("reliability"), 6).as("reliability"),
          round(col("resolution"), 6).as("resolution"),
          round(col("uncertainty"), 6).as("uncertainty"),
          round(col("wb_var"), 6).as("within_bin_var"),
          round(col("wb_cov"), 6).as("within_bin_cov"),
          (abs(col("brier") - (col("reliability") - col("resolution")
            + col("uncertainty") + col("wb_var") - lit(2) * col("wb_cov")))
            < 1e-9).as("identity_ok"))
        .orderBy("bin")
    },

    // ---- isotonic calibration (pool-adjacent-violators) ----
    // The calibration-curve FIXER next to the Brier/reliability
    // readouts: fit the best monotone (nondecreasing) conversion rate
    // over 20 score bins — the weighted-L2 isotonic regression every
    // production score is post-processed with (Zadrozny & Elkan 2002).
    // Computed by the closed max-min characterization
    //   iso_i = max_{j≤i} min_{k≥i} mean(conv over bins j..k)
    // which equals the PAV stack fit exactly (Ayer et al. 1955) —
    // AccuracySpec replays the classic stack algorithm against it.
    // Scale shape: the corpus collapses ONCE to the per-user
    // (score, converted) frame (the q_gains_table machinery), bins
    // via one ntile window on that frame, and the O(B³)=8000-cell
    // max-min evaluation runs entirely on the 20-row bin frame
    // (range sums from one bounded non-equi join — exact BIGINT, so
    // the range means are cross-engine-identical doubles).
    sql(
      "q_isotonic_calibration",
      """WITH b AS (SELECT epoch_us(min(ts))
        |                  + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS mid
        |           FROM events),
        |u AS (SELECT user_id,
        |        CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS score,
        |        CAST(max(CASE WHEN event_type = 'purchase' AND value > 150
        |                      AND epoch_us(ts) >= (SELECT mid FROM b)
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS converted
        |      FROM events GROUP BY user_id),
        |d AS (SELECT converted,
        |             CAST(ntile(20) OVER (ORDER BY score, user_id) AS BIGINT) AS bin
        |      FROM u),
        |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(converted) AS BIGINT) AS conv
        |      FROM d GROUP BY bin),
        |r AS (SELECT j.bin AS j, k.bin AS k,
        |        CAST(sum(m.conv) AS DOUBLE) / sum(m.n) AS mean_rate
        |      FROM g j JOIN g k ON j.bin <= k.bin
        |      JOIN g m ON m.bin BETWEEN j.bin AND k.bin
        |      GROUP BY 1, 2),
        |m1 AS (SELECT r.j, i.bin AS i, min(r.mean_rate) AS mn
        |       FROM r JOIN g i ON r.j <= i.bin AND r.k >= i.bin
        |       GROUP BY 1, 2),
        |iso AS (SELECT i AS bin, max(mn) AS iso_rate FROM m1 GROUP BY 1)
        |SELECT g.bin, g.n, g.conv,
        |       round(CAST(g.conv AS DOUBLE) / g.n, 6) AS raw_rate,
        |       round(iso.iso_rate, 6) AS iso_rate
        |FROM g JOIN iso ON iso.bin = g.bin
        |ORDER BY g.bin""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val b = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
        .select((unix_micros(col("t0"))
          + expr("(unix_micros(t1) - unix_micros(t0)) div 2")).as("mid_us"))
      val u = ev.crossJoin(broadcast(b))
        .groupBy("user_id", "mid_us")
        .agg(
          sum(when(unix_micros(col("ts")) < col("mid_us"), 1L).otherwise(0L))
            .as("score"),
          max(when(col("event_type") === "purchase" && col("value") > 150
            && unix_micros(col("ts")) >= col("mid_us"), 1L).otherwise(0L))
            .as("converted"))
      val g = u.select(col("converted"),
          ntile(20).over(Window.orderBy(col("score"), col("user_id")))
            .cast("long").as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("converted").cast("long").as("conv"))
        // 20-row frame feeds the range join, the min/max grid, AND the
        // output join — materialize once
        .localCheckpoint()
      val r = g.select(col("bin").as("j")).join(g.select(col("bin").as("k")),
          col("j") <= col("k"))
        .join(g.select(col("bin").as("m"), col("n"), col("conv")),
          col("m").between(col("j"), col("k")))
        .groupBy("j", "k")
        .agg((sum("conv").cast("double") / sum("n")).as("mean_rate"))
      val m1 = r.join(g.select(col("bin").as("i")),
          col("j") <= col("i") && col("k") >= col("i"))
        .groupBy("j", "i")
        .agg(min("mean_rate").as("mn"))
      val iso = m1.groupBy(col("i").as("bin"))
        .agg(max("mn").as("iso_rate"))
      g.join(iso, "bin")
        .select(col("bin"), col("n"), col("conv"),
          round(col("conv").cast("double") / col("n"), 6).as("raw_rate"),
          round(col("iso_rate"), 6).as("iso_rate"))
        .orderBy("bin")
    }
  )
}
