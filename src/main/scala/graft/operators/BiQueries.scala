package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse BI / monitoring operators — the report shapes an
  * analytics team runs daily over the fact tables: period-over-period
  * rank movement, ABC inventory classification, market-concentration
  * indices, funnel step latency, robust outlier fences, and
  * sequential-pattern support.
  *
  * Scale designs:
  *  - every op collapses the corpus ONCE to an entity frame (per
  *    part, per supplier, per user) in a single hash aggregation;
  *    ranks/shares/fences then run on that bounded frame. Global
  *    windows only ever see already-aggregated entity rows — at a
  *    scale where even the entity frame outgrows one task, the
  *    [[GlobalPrefix]] sampled-boundary rewrite applies unchanged.
  *  - sequence support counts DISTINCT users per adjacent event-type
  *    pair — the lag window runs on the user-key partitioning the
  *    per-user analytics family already shares, and the distinct
  *    collapses map-side (user, pair) before the tiny pair agg.
  *  - Tukey fences use the repo's exact-percentile convention
  *    (interpolation identical in Spark and DuckDB, proven by
  *    q_rolling_median/q_winsorize) on the value-collapsed frame.
  */
object BiQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  def defs: Seq[QueryDef] = Seq(

    // ---- period-over-period rank movers (top-10 by rank delta) ----
    // Revenue rank by part across the 1997→1998 year boundary; the
    // "what moved" report. One conditional-sum pass collapses the
    // corpus to per-part (r97, r98); dense ranks + the mover ordering
    // run on the part frame. Revenues are emitted as INTEGER CENTS
    // (DECIMAL(12,2)·100 per row, summed as BIGINT): the per-row
    // product is exactly integral, so truncation and rounding agree
    // across engines and the output carries no decimal rendering —
    // the same de-rendering construction as q_table_fingerprint.
    sql(
      "q_top_movers",
      """WITH g AS (SELECT l_partkey AS pk,
        |    sum(CASE WHEN date_part('year', l_shipdate) = 1997
        |             THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |             ELSE 0 END) AS r97_cents,
        |    sum(CASE WHEN date_part('year', l_shipdate) = 1998
        |             THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |             ELSE 0 END) AS r98_cents
        |  FROM lineitem WHERE date_part('year', l_shipdate) IN (1997, 1998)
        |  GROUP BY 1 HAVING sum(CASE WHEN date_part('year', l_shipdate) = 1997
        |                        THEN 1 ELSE 0 END) > 0
        |            AND sum(CASE WHEN date_part('year', l_shipdate) = 1998
        |                    THEN 1 ELSE 0 END) > 0),
        |r AS (SELECT pk, r97_cents, r98_cents,
        |        CAST(rank() OVER (ORDER BY r97_cents DESC, pk) AS BIGINT) AS rank97,
        |        CAST(rank() OVER (ORDER BY r98_cents DESC, pk) AS BIGINT) AS rank98
        |      FROM g)
        |SELECT pk, CAST(r97_cents AS BIGINT) AS r97_cents,
        |       CAST(r98_cents AS BIGINT) AS r98_cents, rank97, rank98,
        |       rank97 - rank98 AS rank_gain
        |FROM r ORDER BY rank_gain DESC, pk LIMIT 10""".stripMargin) { (s, dir) =>
      def yr(y: Int, c: Column) =
        sum(when(year(col("l_shipdate")) === y,
          (c.cast("decimal(12,2)") * 100).cast("long"))
          .otherwise(lit(0L)))
      val g = t(s, dir, "lineitem")
        .where(year(col("l_shipdate")).isin(1997, 1998))
        .groupBy(col("l_partkey").as("pk"))
        .agg(yr(1997, col("l_extendedprice")).as("r97_cents"),
          yr(1998, col("l_extendedprice")).as("r98_cents"),
          sum(when(year(col("l_shipdate")) === 1997, 1).otherwise(0)).as("n97"),
          sum(when(year(col("l_shipdate")) === 1998, 1).otherwise(0)).as("n98"))
        .where(col("n97") > 0 && col("n98") > 0)
      val r = g.select(col("pk"), col("r97_cents"), col("r98_cents"),
        rank().over(Window.orderBy(desc("r97_cents"), col("pk"))).cast("long").as("rank97"),
        rank().over(Window.orderBy(desc("r98_cents"), col("pk"))).cast("long").as("rank98"))
      r.withColumn("rank_gain", col("rank97") - col("rank98"))
        .orderBy(desc("rank_gain"), col("pk"))
        .limit(10)
    },

    // ---- ABC classification (cumulative-share inventory classes) ----
    // Parts ranked by revenue; A = parts covering the first 70% of
    // cumulative revenue, B to 90%, C the tail — the inventory
    // prioritization cut. The corpus collapses to per-part revenue
    // (exact DECIMAL); the cumulative share is one window over the
    // part frame; the output is the per-class summary (classes are
    // assigned per part but reported aggregated — the report a
    // planner actually reads).
    sql(
      "q_abc_classification",
      """WITH g AS (SELECT l_partkey AS pk,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT pk, rev,
        |    CAST(sum(rev) OVER (ORDER BY rev DESC, pk
        |         ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,2)) AS cum,
        |    CAST(sum(rev) OVER () AS DECIMAL(38,2)) AS tot
        |  FROM g),
        |k AS (SELECT pk, rev,
        |    CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.70 THEN 'A'
        |         WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.90 THEN 'B'
        |         ELSE 'C' END AS cls
        |  FROM c)
        |SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(sum(rev) AS DECIMAL(38,2)) AS revenue,
        |       round(CAST(sum(rev) AS DOUBLE) / CAST(max(tot2) AS DOUBLE), 4)
        |         AS rev_share
        |FROM (SELECT k.*, (SELECT CAST(sum(rev) AS DECIMAL(38,2)) FROM g) AS tot2
        |      FROM k)
        |GROUP BY cls ORDER BY cls""".stripMargin) { (s, dir) =>
      val g = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,6)"))
          .cast("decimal(18,2)").as("rev"))
      val wCum = Window.orderBy(desc("rev"), col("pk"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy(desc("rev"), col("pk"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val c = g
        .withColumn("cum", sum("rev").over(wCum).cast("decimal(38,2)"))
        .withColumn("tot", sum("rev").over(wAll).cast("decimal(38,2)"))
      val share = col("cum").cast("double") / col("tot").cast("double")
      c.withColumn("cls",
          when(share <= 0.70, "A").when(share <= 0.90, "B").otherwise("C"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_parts"),
          sum("rev").cast("decimal(38,2)").as("revenue"),
          (sum("rev").cast("double") / max("tot").cast("double")).as("sh"))
        .select(col("cls"), col("n_parts"), col("revenue"),
          round(col("sh"), 4).as("rev_share"))
        .orderBy("cls")
    },

    // ---- market concentration (HHI + CR4 per order priority) ----
    // Herfindahl–Hirschman index and 4-firm concentration ratio of
    // supplier revenue within each priority segment — the
    // concentration screen. One (segment, supplier) aggregation;
    // shares, the share-square sum and the top-4 cut all run on that
    // frame. Share arithmetic from exact DECIMAL sums.
    sql(
      "q_hhi_concentration",
      """WITH g AS (SELECT o.o_orderpriority AS seg, l.l_suppkey AS sk,
        |    CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,2)) AS rev
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2),
        |s AS (SELECT seg, sk, rev,
        |    CAST(sum(rev) OVER (PARTITION BY seg) AS DECIMAL(38,2)) AS tot,
        |    row_number() OVER (PARTITION BY seg ORDER BY rev DESC, sk) AS rn
        |  FROM g)
        |SELECT seg, CAST(count(*) AS BIGINT) AS n_suppliers,
        |  round(sum(power(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 2)) * 10000, 2)
        |    AS hhi,
        |  round(sum(CASE WHEN rn <= 4 THEN CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE)
        |            ELSE 0 END), 4) AS cr4
        |FROM s GROUP BY seg ORDER BY seg""".stripMargin) { (s, dir) =>
      // r13 (guide §2.5, Tables.wide): orders auto-broadcasts, so the
      // probe-side join + partial agg ran inside the serial one-task
      // lineitem scan
      val g = graft.Tables.wide(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice")),
          col("l_orderkey"))
        .join(t(s, dir, "orders"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority").as("seg"), col("l_suppkey").as("sk"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,6)"))
          .cast("decimal(38,2)").as("rev"))
      val wSeg = Window.partitionBy("seg")
      val wRn = Window.partitionBy("seg").orderBy(desc("rev"), col("sk"))
      val sh = g
        .withColumn("tot", sum("rev").over(wSeg).cast("decimal(38,2)"))
        .withColumn("rn", row_number().over(wRn))
        .withColumn("share", col("rev").cast("double") / col("tot").cast("double"))
      sh.groupBy("seg")
        .agg(count(lit(1)).as("n_suppliers"),
          round(sum(pow(col("share"), 2)) * 10000, 2).as("hhi"),
          round(sum(when(col("rn") <= 4, col("share")).otherwise(0.0)), 4)
            .as("cr4"))
        .orderBy("seg")
    },

    // ---- funnel step latency (view→click→purchase dwell times) ----
    // Per-user first-touch funnel with exact latency percentiles per
    // step transition — the "where do users stall" readout. The
    // corpus collapses to one row per user (three conditional mins);
    // the percentile aggregation runs over the user frame. Exact
    // `percentile` (interpolating) matches DuckDB's quantile_cont
    // value-for-value.
    sql(
      "q_funnel_dropoff_time",
      """WITH u AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
        |  FROM events GROUP BY 1),
        |d AS (SELECT
        |    CASE WHEN t_click > t_view THEN t_click - t_view END AS vc_us,
        |    CASE WHEN t_buy > t_click THEN t_buy - t_click END AS cb_us
        |  FROM u)
        |SELECT 'click_to_buy' AS step, CAST(count(cb_us) AS BIGINT) AS n,
        |  round(CAST(quantile_cont(cb_us, 0.5) AS DOUBLE) / 3600000000.0, 4) AS p50_hours,
        |  round(CAST(quantile_cont(cb_us, 0.9) AS DOUBLE) / 3600000000.0, 4) AS p90_hours
        |FROM d
        |UNION ALL
        |SELECT 'view_to_click', CAST(count(vc_us) AS BIGINT),
        |  round(CAST(quantile_cont(vc_us, 0.5) AS DOUBLE) / 3600000000.0, 4),
        |  round(CAST(quantile_cont(vc_us, 0.9) AS DOUBLE) / 3600000000.0, 4)
        |FROM d
        |ORDER BY step""".stripMargin) { (s, dir) =>
      val u = t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", unix_micros(col("ts")))).as("t_view"),
          min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t_click"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t_buy"))
      val d = u.select(
        when(col("t_click") > col("t_view"), col("t_click") - col("t_view")).as("vc_us"),
        when(col("t_buy") > col("t_click"), col("t_buy") - col("t_click")).as("cb_us"))
        .localCheckpoint() // user frame: feeds both step rows
      def step(name: String, c: String) =
        d.agg(count(col(c)).as("n"),
          round(expr(s"percentile($c, 0.5)").cast("double") / 3600000000.0, 4)
            .as("p50_hours"),
          round(expr(s"percentile($c, 0.9)").cast("double") / 3600000000.0, 4)
            .as("p90_hours"))
          .select(lit(name).as("step"), col("n"), col("p50_hours"), col("p90_hours"))
      step("click_to_buy", "cb_us").unionByName(step("view_to_click", "vc_us"))
        .orderBy("step")
    },

    // ---- Tukey-fence outlier audit (IQR robust monitoring) ----
    // Per event type: exact quartiles, the 1.5·IQR fences, and the
    // count/share of rows outside them — the robust anomaly screen
    // that doesn't assume normality (complement to q_anomaly_mad).
    // Two passes over the same hash partitioning: quartiles per type,
    // then a conditional count against the broadcast fence frame.
    sql(
      "q_tukey_outlier",
      """WITH q AS (SELECT event_type,
        |    CAST(quantile_cont(value, 0.25) AS DOUBLE) AS q1,
        |    CAST(quantile_cont(value, 0.75) AS DOUBLE) AS q3
        |  FROM events GROUP BY 1),
        |f AS (SELECT event_type, q1, q3,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
        |  FROM q)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(f.q1, 4) AS q1, round(f.q3, 4) AS q3,
        |  CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi
        |             THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS outlier_rate
        |FROM events e JOIN f ON f.event_type = e.event_type
        |GROUP BY e.event_type, f.q1, f.q3
        |ORDER BY e.event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val f = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.25)").cast("double").as("q1"),
          expr("percentile(value, 0.75)").cast("double").as("q3"))
        .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
        .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      val out = when(col("value") < col("lo") || col("value") > col("hi"), 1L)
        .otherwise(0L)
      ev.join(broadcast(f), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(count(lit(1)).as("n"), sum(out).as("n_outliers"))
        .select(col("event_type"), col("n"),
          round(col("q1"), 4).as("q1"), round(col("q3"), 4).as("q3"),
          col("n_outliers"),
          round(col("n_outliers").cast("double") / col("n"), 6).as("outlier_rate"))
        .orderBy("event_type")
    },

    // ---- sequential-pattern support (adjacent pairs by user reach) ----
    // The sequence-mining counterpart to q_markov_transitions: that
    // query counts TRANSITIONS (a heavy user dominates); this one
    // counts DISTINCT USERS exhibiting each adjacent event-type pair
    // (support), plus confidence (share of users with the prefix who
    // continue) and lift vs the consequent's own reach. The (user,
    // pair) distinct collapses map-side before the tiny pair agg;
    // marginal user-reach frames broadcast back.
    sql(
      "q_sequence_support",
      """WITH o AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events),
        |up AS (SELECT DISTINCT user_id, prev, event_type AS next
        |       FROM o WHERE prev IS NOT NULL),
        |pc AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS sup
        |       FROM up GROUP BY 1, 2),
        |pm AS (SELECT prev, CAST(count(DISTINCT user_id) AS BIGINT) AS sup_a
        |       FROM up GROUP BY 1),
        |nm AS (SELECT next, CAST(count(DISTINCT user_id) AS BIGINT) AS sup_b
        |       FROM up GROUP BY 1),
        |tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n
        |        FROM up)
        |SELECT pc.prev, pc.next, pc.sup,
        |  round(CAST(pc.sup AS DOUBLE) / pm.sup_a, 4) AS confidence,
        |  round(CAST(pc.sup AS DOUBLE) * (SELECT n FROM tot)
        |        / (CAST(pm.sup_a AS DOUBLE) * nm.sup_b), 4) AS lift
        |FROM pc JOIN pm ON pm.prev = pc.prev JOIN nm ON nm.next = pc.next
        |ORDER BY pc.prev, pc.next""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val up = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .where(col("prev").isNotNull)
        .select(col("user_id"), col("prev"), col("event_type").as("next"))
        .distinct()
        .localCheckpoint() // (user, pair) frame: 4 consumers below
      val pc = up.groupBy("prev", "next").agg(count(lit(1)).as("sup"))
      val pm = up.groupBy("prev").agg(countDistinct("user_id").as("sup_a"))
      val nm = up.groupBy("next").agg(countDistinct("user_id").as("sup_b"))
      val tot = up.agg(countDistinct("user_id").as("n"))
      pc.join(broadcast(pm), "prev").join(broadcast(nm), "next")
        .crossJoin(broadcast(tot))
        .select(col("prev"), col("next"), col("sup"),
          round(col("sup").cast("double") / col("sup_a"), 4).as("confidence"),
          round(col("sup").cast("double") * col("n")
            / (col("sup_a").cast("double") * col("sup_b")), 4).as("lift"))
        .orderBy("prev", "next")
    },

    // ---- ABC × XYZ inventory matrix ----
    // The planning cross-classification q_abc_classification is half
    // of: ABC ranks parts by revenue concentration (WHERE the money
    // is), XYZ ranks them by demand VARIABILITY (how forecastable
    // they are — the axis q_croston exists for): X = steady
    // (CV ≤ 0.5), Y = variable (≤ 1.0), Z = erratic. A-X parts get
    // safety-stock formulas, A-Z parts get Croston + human review —
    // the 9-cell matrix IS the operating decision. CV is computed
    // over the part's MONTHLY demand including zero months (the
    // sparse-frame trick: zero months add nothing to ΣQ/ΣQ², so exact
    // integer moments over nonzero rows + the global month count M
    // give mean = ΣQ/M and var = (ΣQ² − (ΣQ)²/M)/(M−1) with zeros
    // priced in). Revenue is integer cents. 100-TB story: one corpus
    // pass to the (part, month) frame, one to part grain; the matrix
    // is a 9-row collapse.
    sql(
      "q_abc_xyz",
      """WITH pm AS (SELECT l_partkey AS pk,
        |    date_trunc('month', CAST(l_shipdate AS DATE)) AS mo,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |             AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |mm AS (SELECT CAST(count(DISTINCT mo) AS BIGINT) AS m FROM pm),
        |p AS (SELECT pk, CAST(sum(q) AS BIGINT) AS sq,
        |        CAST(sum(q * q) AS BIGINT) AS sqq,
        |        CAST(sum(rev) AS BIGINT) AS rev
        |      FROM pm GROUP BY 1),
        |x AS (SELECT pk, rev,
        |        sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / m)
        |             / (m - 1))
        |          / (CAST(sq AS DOUBLE) / m) AS cv
        |      FROM p CROSS JOIN mm),
        |a AS (SELECT pk, rev, cv,
        |        CAST(sum(rev) OVER (ORDER BY rev DESC, pk) AS BIGINT) AS cum,
        |        CAST(sum(rev) OVER () AS BIGINT) AS tot
        |      FROM x),
        |k AS (SELECT rev, tot,
        |        CASE WHEN CAST(cum AS DOUBLE) / tot <= 0.70 THEN 'A'
        |             WHEN CAST(cum AS DOUBLE) / tot <= 0.90 THEN 'B'
        |             ELSE 'C' END AS abc,
        |        CASE ntile(3) OVER (ORDER BY cv, pk)
        |             WHEN 1 THEN 'X' WHEN 2 THEN 'Y' ELSE 'Z' END AS xyz
        |      FROM a)
        |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(rev) AS BIGINT) AS revenue_cents,
        |  round(CAST(sum(rev) AS DOUBLE) / max(tot), 6) AS rev_share
        |FROM k GROUP BY 1, 2 ORDER BY abc, xyz""".stripMargin) { (s, dir) =>
      val pm = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"),
          date_trunc("month", to_date(col("l_shipdate"))).as("mo"))
        .agg(sum(col("l_quantity").cast("long")).cast("long").as("q"),
          sum((col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("long")).cast("long").as("rev"))
      val mm = pm.agg(countDistinct("mo").as("m"))
      val p = pm.groupBy("pk").agg(sum("q").cast("long").as("sq"),
        sum(col("q") * col("q")).cast("long").as("sqq"),
        sum("rev").cast("long").as("rev"))
      val cv = sqrt((col("sqq").cast("double")
        - col("sq").cast("double") * col("sq") / col("m")) / (col("m") - 1))
        ./(col("sq").cast("double") / col("m"))
      val x = p.crossJoin(broadcast(mm))
        .select(col("pk"), col("rev"), cv.as("cv"))
      // part-dimension-bounded ranking windows (q_abc_classification)
      val wCum = Window.orderBy(desc("rev"), col("pk"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy(desc("rev"), col("pk"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val a = x.withColumn("cum", sum("rev").over(wCum).cast("long"))
        .withColumn("tot", sum("rev").over(wAll).cast("long"))
      val share = col("cum").cast("double") / col("tot")
      // tercile-based XYZ: this corpus's demand is intermittent for
      // EVERY part (mostly-zero months -> CV > 1 across the board), so
      // the absolute 0.5/1.0 bands collapse to one class — the
      // practitioner fallback is quantile banding, which stays
      // deterministic here via the (cv, pk) total order
      val wX = Window.orderBy(col("cv"), col("pk"))
      a.withColumn("abc",
          when(share <= 0.70, "A").when(share <= 0.90, "B").otherwise("C"))
        .withColumn("xyz",
          when(ntile(3).over(wX) === 1, "X")
            .when(ntile(3).over(wX) === 2, "Y").otherwise("Z"))
        .groupBy("abc", "xyz")
        .agg(count(lit(1)).as("n_parts"),
          sum("rev").cast("long").as("revenue_cents"),
          (sum("rev").cast("double") / max("tot")).as("sh"))
        .select(col("abc"), col("xyz"), col("n_parts"), col("revenue_cents"),
          round(col("sh"), 6).as("rev_share"))
        .orderBy("abc", "xyz")
    }
  )
}
