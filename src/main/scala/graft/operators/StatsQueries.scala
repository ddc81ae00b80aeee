package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical aggregates, pivot, exact percentiles, positional
  * explode, range-frame windows, join-strategy hints, and
  * edit-distance fuzzy matching — widening SURVEY.md §2.2's scalar/
  * aggregate/window families.
  */
object StatsQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Data-profiling core: per-column (n_values, n_nulls, n_distinct,
    * min, max, avg) over lineitem's numeric columns.
    *
    * `approx = true` is the DEFAULT and the 100-TB path: everything —
    * including n_distinct via `approx_count_distinct` (rsd 0.02) —
    * rides ONE wide aggregation, i.e. one corpus pass with mergeable
    * fixed-size HLL sketches and no Expand. `approx = false` is the
    * exact twin the DuckDB oracle can value-match: non-distinct stats
    * in the wide agg, each exact distinct count as its own
    * distinct→count branch (a fused multi-countDistinct Expand was
    * measured 2.2× slower at sf0.1), branches recombined via 1-row
    * crossJoins. ProfileStatsSpec pins the approx plan to a single
    * scan with no Expand and bounds its estimates against exact.
    */
  /** Two-sample Kolmogorov–Smirnov test as a reusable operator:
    * D = max_x |F_a(x) − F_b(x)| over `v`, returned as one row
    * (n1, n2, ks_num, ks_stat, reject_05). Exact integer arithmetic
    * end-to-end: ties collapse in one groupBy, the running CDF
    * difference is ONE GlobalPrefix prefix sum of c1·n2 − c2·n1
    * (so max|R| = D·n1·n2 exactly, order-independent), and the only
    * double division happens on the 1-row result. BIGINT headroom
    * |R| ≤ n1·n2 holds through ~3e9 rows per side; past that, scale
    * the weights to DECIMAL. `reject_05` uses the asymptotic
    * c(0.05) = 1.358 critical value. Null values are ignored
    * (CDF over observed values only). */
  def ksTest(a: DataFrame, b: DataFrame, v: Column): DataFrame = {
    val tagged = a.select(v.as("v"), lit(1L).as("t"))
      .where(col("v").isNotNull)
      .unionByName(b.select(v.as("v"), lit(0L).as("t"))
        .where(col("v").isNotNull))
    val u = tagged.groupBy("v")
      .agg(sum(col("t")).as("c1"), sum(lit(1L) - col("t")).as("c2"))
    // 1-row eager materialization: tot rides the plan twice (weight
    // construction + the final select); without the checkpoint each
    // use re-aggregates the corpus from scratch.
    val tot = u.agg(sum("c1").as("n1"), sum("c2").as("n2")).localCheckpoint()
    val weighted = u.crossJoin(broadcast(tot)) // 1-row totals scalar
      .withColumn("w", col("c1") * col("n2") - col("c2") * col("n1"))
    val run = GlobalPrefix.runningTotal(weighted, Seq(col("v")), col("w"), "rdiff")
    val ks = run.agg(max(abs(col("rdiff"))).as("ks_num"))
    ks.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"), col("ks_num"),
        round(col("ks_num") / (col("n1") * col("n2")), 6).as("ks_stat"),
        when(col("ks_num") / (col("n1") * col("n2")) >
            lit(1.358) * sqrt((col("n1") + col("n2")) / (col("n1") * col("n2"))),
          1).otherwise(0).cast("int").as("reject_05"))
  }

  /** Mann–Whitney U / AUC as a reusable operator: one row
    * (n1, n2, u1_x2, auc, z_approx) where auc = P(pos score > neg
    * score) + ½P(tie) — the ROC AUC of `v` as a classifier score.
    * Tie-corrected rank sums in exact integer arithmetic (2·R1 =
    * Σ c1·(2·prev + c + 1) clears the average-rank half); the Σ(c³−c)
    * tie term accumulates in DOUBLE — c³ would overflow BIGINT at a
    * ~2.1M-row tie block, and the term only feeds the double sigma
    * (terms stay exact integers in double through c ≈ 2e5·tie blocks,
    * so the oracle hash is unaffected at any testable scale). Nulls
    * ignored. Rank-sum BIGINT headroom 2·R1 ≤ 2N² holds through ~2e9
    * pooled rows. */
  def mannWhitney(pos: DataFrame, neg: DataFrame, v: Column): DataFrame = {
    val tagged = pos.select(v.as("v"), lit(1L).as("pos"))
      .where(col("v").isNotNull)
      .unionByName(neg.select(v.as("v"), lit(0L).as("pos"))
        .where(col("v").isNotNull))
    val u = tagged.groupBy("v")
      .agg(sum(col("pos")).as("c1"), count(lit(1)).as("c"))
    // 1-row eager totals: ride the plan twice (see ksTest)
    // tie term in DOUBLE: c³ overflows BIGINT at a ~2.1M-row tie block
    // (far below the 2·R1 ≤ 2N² rank-sum headroom); the term only ever
    // feeds the double sigma, and both engines cube the identical
    // doubles (review find, r7)
    val tot = u.agg(sum("c1").as("n1"), sum(col("c") - col("c1")).as("n2"),
      sum(col("c").cast("double") * col("c") * col("c") - col("c"))
        .as("tie_term"))
      .localCheckpoint()
    val ranked = GlobalPrefix.runningTotal(u, Seq(col("v")), col("c"), "incl")
      .withColumn("prev", col("incl") - col("c"))
    val rs = ranked
      .agg(sum(col("c1") * (lit(2L) * col("prev") + col("c") + 1L)).as("r1_x2"))
    val u1x2 = col("r1_x2") - col("n1") * (col("n1") + 1L)
    val sigma = lit(2.0) * sqrt((col("n1").cast("double") * col("n2") / lit(12.0))
      * ((col("n1") + col("n2") + 1L)
        - col("tie_term") / ((col("n1") + col("n2")).cast("double")
          * (col("n1") + col("n2") - 1L))))
    rs.crossJoin(broadcast(tot)) // 1-row totals scalar riding the plan
      .select(col("n1"), col("n2"), u1x2.as("u1_x2"),
        round(u1x2 / (lit(2L) * col("n1") * col("n2")).cast("double"), 6).as("auc"),
        round((u1x2 - col("n1") * col("n2")) / sigma, 4).as("z_approx"))
  }

  def profileStats(s: SparkSession, dir: String, approx: Boolean = true): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = t(s, dir, "lineitem").select(cols.map(col): _*)
    val joined =
      if (approx) {
        li.agg(
          count(lit(1)).as("n_rows"),
          cols.flatMap(c => Seq(
            count(col(c)).as(s"${c}_n"),
            approx_count_distinct(col(c), 0.02).as(s"${c}_nd"),
            round(min(col(c)), 4).as(s"${c}_min"),
            round(max(col(c)), 4).as(s"${c}_max"),
            round(avg(col(c)), 4).as(s"${c}_avg"))): _*)
          .cache() // 1 row; consumed by one union branch per column
      } else {
        val wide = li.agg(
          count(lit(1)).as("n_rows"),
          cols.flatMap(c => Seq(
            count(col(c)).as(s"${c}_n"),
            round(min(col(c)), 4).as(s"${c}_min"),
            round(max(col(c)), 4).as(s"${c}_max"),
            round(avg(col(c)), 4).as(s"${c}_avg"))): _*)
        val nds = cols.map(c =>
          li.select(col(c)).where(col(c).isNotNull).distinct()
            .agg(count(lit(1)).as(s"${c}_nd")))
        // 1-row result feeds one union branch per column — materialize
        // or each branch re-runs the corpus aggregation
        (wide +: nds).reduce(_ crossJoin _).cache()
      }
    cols.map { c =>
      joined.select(
        lit(c).as("col_name"),
        col(s"${c}_n").as("n_values"),
        (col("n_rows") - col(s"${c}_n")).as("n_nulls"),
        col(s"${c}_nd").as("n_distinct"),
        col(s"${c}_min").as("min_val"),
        col(s"${c}_max").as("max_val"),
        col(s"${c}_avg").as("avg_val"))
    }.reduce(_ unionByName _)
      .orderBy("col_name")
  }

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo,
    * SIGMOD'95), shared by the edit-distance and Jaro-Winkler fuzzy
    * matchers: block on the leading 8 chars, sort each block by the
    * 40-char prefix, and pair every doc with its next W sort-order
    * neighbors via lead() — join-free, exactly W·N candidates at any
    * corpus size. The result is repartitioned to 2× the configured
    * shuffle width before the caller's per-pair scorer runs: locally
    * the corpus is one parquet split (one task), and AQE would
    * otherwise concentrate the expensive residual into few tasks.
    * Columns: da0 (left id), pa (left prefix), n.db0 / n.pb (right).
    */
  private def snmCandidates(s: SparkSession, dir: String, W: Int) = {
    val p = t(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("pre"),
        substring(col("text"), 1, 8).as("blk"))
    val wn = Window.partitionBy(col("blk")).orderBy(col("pre"), col("doc_id"))
    // each row carries its W sort-successors (nulls past the block
    // end drop in the explode) — the oracle's rn-range self-join
    // expressed joinlessly: one window shuffle, W·N candidate rows
    p.withColumn("nxt", array(
        (1 to W).map(i => struct(
          lead(col("doc_id"), i).over(wn).as("db0"),
          lead(col("pre"), i).over(wn).as("pb"))): _*))
      .select(col("doc_id").as("da0"), col("pre").as("pa"), explode(col("nxt")).as("n"))
      .where(col("n.db0").isNotNull)
      .repartition(
        s.conf.get("spark.sql.shuffle.partitions").toInt * 2, col("da0"))
  }

  /** Co-purchase pair-mining core shared by q_assoc_rules and
    * GraphQueries.q_kcore: ONE corpus shuffle collects each order's
    * distinct sorted part basket (checkpointed — it feeds pair
    * generation plus supports/totals), then i<j pairs come from a
    * codegen'd array transform — fan-out Σ basket²/2 bounded by the
    * per-order line cap, never corpus-quadratic, and no second corpus
    * exchange. Returns (baskets(l_orderkey, ps), pairs(p1, p2,
    * n_both)) — UNFILTERED pair counts; consumers apply their own
    * support thresholds. */
  /** All i<j element pairs of a sorted array, as a struct array — the
    * codegen'd pair-mining inner transform shared by basketPairCounts
    * and q_audience_overlap (one copy of the 1-based element_at index
    * arithmetic — review find, r7). */
  def ijPairs(arr: Column, aName: String, bName: String): Column =
    flatten(transform(sequence(lit(0), size(arr) - 2),
      i => transform(sequence(i + 1, size(arr) - 1),
        j => struct(element_at(arr, i + 1).as(aName),
          element_at(arr, j + 1).as(bName)))))

  def basketPairCounts(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // serialized, disk-spillable checkpoint: per-order ARRAY rows
    // cached deserialized cost ~10× their serialized size in object
    // headers, and at the 100× decade that cache starved downstream
    // aggregations (the q_kcore OOM) — serialized costs one decode per
    // read of a frame that is read 2-3 times
    // r13 optimization (guide §2.5 input skew): the single-row-group
    // corpus parquet scans in ONE task, so the basket groupBy's
    // partial collect_set used to hash all 600k rows single-threaded
    // inside the scan task. Repartitioning by the group key FIRST
    // moves only raw 16-byte pairs through the scan task (partition +
    // serialize, no agg work) and runs the whole aggregation at
    // shuffle width. collect_set + sort_array is arrival-order-
    // invariant, so the baskets are bit-identical.
    val baskets = t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
        col("l_orderkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val pairs = baskets
      .where(size(col("ps")) >= 2)
      .select(explode(ijPairs(col("ps"), "p1", "p2")).as("z"))
      .select(col("z.p1").as("p1"), col("z.p2").as("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_both"))
    (baskets, pairs)
  }

  /** The matching oracle CTE text (b = distinct order/part, pairs =
    * p1<p2 pair counts) — shared verbatim by the co-purchase oracles
    * so the pair derivation can never drift between them. */
  val basketPairsSqlCtes: String =
    """b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (SELECT a.l_partkey AS p1, c.l_partkey AS p2,
      |                 CAST(count(*) AS BIGINT) AS n_both
      |          FROM b a JOIN b c ON c.l_orderkey = a.l_orderkey
      |                           AND c.l_partkey > a.l_partkey
      |          GROUP BY 1, 2)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- statistical aggregates (sample variance family + bool aggs) ----
    sql(
      "q_stats_agg",
      """SELECT event_type,
        |       round(stddev(value), 4) AS sd,
        |       round(var_samp(value), 4) AS var,
        |       round(corr(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS corr_vk,
        |       round(covar_samp(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS cov_vk,
        |       bool_and(value >= 0) AS all_nonneg,
        |       bool_or(value > 480) AS any_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      // Project the JSON-extracted k ONCE before the aggregate:
      // referencing the get_json_object expression inside two agg
      // expressions parses the props JSON twice per row.
      val k = col("k")
      t(s, dir, "events")
        .select(col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("double").as("k"))
        .groupBy("event_type")
        .agg(
          round(stddev(col("value")), 4).as("sd"),
          round(var_samp(col("value")), 4).as("var"),
          round(corr(col("value"), k), 6).as("corr_vk"),
          round(covar_samp(col("value"), k), 4).as("cov_vk"),
          bool_and(col("value") >= 0).as("all_nonneg"),
          bool_or(col("value") > 480).as("any_high"))
        .orderBy("event_type")
    },

    // ---- exact percentiles (linear interpolation both engines) ----
    sql(
      "q_percentile",
      """SELECT event_type,
        |       round(CAST(quantile_cont(value, 0.25) AS DOUBLE), 4) AS p25,
        |       round(CAST(quantile_cont(value, 0.5)  AS DOUBLE), 4) AS p50,
        |       round(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.25)"), 4).as("p25"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
        .orderBy("event_type")
    },

    // ---- robust outlier detection: per-group median/MAD z-score
    // (|x - med| > 3·1.4826·MAD) — the data-quality screen that
    // survives the outliers it hunts, unlike mean/stddev. Two exact
    // per-group percentile aggregations, each joined back via
    // broadcast (the per-group table is #groups rows); at 100 TB the
    // exact percentile swaps for approx_percentile with the same
    // plan shape.
    sql(
      "q_anomaly_mad",
      """WITH med AS (SELECT event_type,
        |                    CAST(quantile_cont(value, 0.5) AS DOUBLE) AS med
        |             FROM events GROUP BY event_type),
        |dev AS (SELECT e.event_type, e.value, m.med,
        |               abs(e.value - m.med) AS ad
        |        FROM events e JOIN med m ON e.event_type = m.event_type),
        |mad AS (SELECT event_type,
        |               CAST(quantile_cont(ad, 0.5) AS DOUBLE) AS mad
        |        FROM dev GROUP BY event_type)
        |SELECT d.event_type,
        |       count(*) AS n,
        |       CAST(sum(CASE WHEN d.ad > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anom,
        |       round(max(d.med), 4) AS med,
        |       round(max(m.mad), 4) AS mad
        |FROM dev d JOIN mad m ON d.event_type = m.event_type
        |GROUP BY d.event_type
        |ORDER BY d.event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events").select("event_type", "value")
      // The per-group frames are #groups rows — localCheckpoint them
      // (lazily, so plan-only consumers trigger no jobs) so the
      // expensive exact-percentile aggregations run ONCE each instead
      // of re-executing under every downstream branch (Spark shares
      // plan-identical subtrees only through the cache manager).
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
        .localCheckpoint(false)
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(ad, 0.5)").as("mad"))
        .localCheckpoint(false)
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("ad") > lit(3) * 1.4826 * col("mad"), 1L).otherwise(0L)).as("n_anom"),
          round(max(col("med")), 4).as("med"),
          round(max(col("mad")), 4).as("mad"))
        .orderBy("event_type")
    },

    // ---- A/B experiment analysis: Welch's t-statistic per metric
    // group between two hash-assigned variants. ONE pass computes all
    // per-(group, variant) moments; the variant pair join runs on the
    // #groups×2-row aggregate, broadcast. At 100 TB the shape is
    // unchanged — the corpus collapses before any join.
    sql(
      "q_ab_ttest",
      """WITH v AS (SELECT event_type,
        |                  CAST(json_extract_string(props, '$.k') AS INT) % 2 AS variant,
        |                  value
        |           FROM events),
        |s AS (SELECT event_type, variant, count(*) AS n,
        |             avg(value) AS m, var_samp(value) AS v2
        |      FROM v GROUP BY event_type, variant)
        |SELECT a.event_type, a.n AS n_a, b.n AS n_b,
        |       round(a.m, 4) AS mean_a, round(b.m, 4) AS mean_b,
        |       round((a.m - b.m) / sqrt(nullif(a.v2 / a.n + b.v2 / b.n, 0)), 6) AS t_welch
        |FROM s a JOIN s b
        |  ON a.event_type = b.event_type AND a.variant = 0 AND b.variant = 1
        |ORDER BY a.event_type""".stripMargin) { (s, dir) =>
      val v = t(s, dir, "events")
        .select(col("event_type"),
          (get_json_object(col("props"), "$.k").cast("int") % 2).as("variant"),
          col("value"))
      val stats = v.groupBy("event_type", "variant")
        .agg(count(lit(1)).as("n"), avg(col("value")).as("m"),
          var_samp(col("value")).as("v2"))
      val a = stats.where(col("variant") === 0)
        .select(col("event_type"), col("n").as("n_a"),
          col("m").as("m_a"), col("v2").as("v2_a"))
      val b = stats.where(col("variant") === 1)
        .select(col("event_type").as("et_b"), col("n").as("n_b"),
          col("m").as("m_b"), col("v2").as("v2_b"))
      a.join(broadcast(b), col("event_type") === col("et_b"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          round(col("m_a"), 4).as("mean_a"),
          round(col("m_b"), 4).as("mean_b"),
          // nullif guards the zero-variance degenerate case: Spark's
          // non-ANSI x/0 is NULL while DuckDB's IEEE division is ±inf,
          // so an unguarded constant-valued group would silently break
          // oracle parity. Both sides emit NULL there instead.
          round((col("m_a") - col("m_b"))
            / sqrt(nullif(col("v2_a") / col("n_a") + col("v2_b") / col("n_b"),
              lit(0))), 6)
            .as("t_welch"))
        .orderBy("event_type")
    },

    // ---- mSPRT sequential A/B monitor (Johari/Pekelis/Walsh,
    //      "Peeking at A/B Tests", KDD'17 — always-valid p-values) ----
    // The t-test above is only valid at ONE pre-registered look; a
    // dashboard that is watched daily needs a sequential test. The
    // mixture SPRT with a normal prior (τ² = 0.1) admits a closed
    // form: Λ_n = √(Vₙ/(Vₙ+τ²))·exp(θ̂²τ²/(2Vₙ(Vₙ+τ²))) with
    // Vₙ = s²(1/n_a + 1/n_b), and the always-valid p is the running
    // min of 1/Λ — i.e. 1/(running max Λ). Relationally: per-day
    // per-variant partials (count + DECIMAL sum/sum-of-squares —
    // mergeable, so at 100 TB the daily partials are the stored
    // table and each new day is one tiny merge), cumulative windows
    // per variant, the scalar formula on the ~days-sized frame, and
    // one more running-max window. Every float derives from exact
    // DECIMAL cumulative sums, so both engines evaluate the same
    // expression on the same inputs; the reject flag compares the
    // ROUNDED p (no raw-float threshold to disagree on).
    sql(
      "q_msprt",
      """WITH v AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                  CAST(json_extract_string(props, '$.k') AS INT) % 2 AS variant,
        |                  CAST(value AS DECIMAL(18,6)) AS x
        |           FROM events),
        |d AS (SELECT day, variant, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS DECIMAL(38,6)) AS s,
        |             CAST(sum(x * x) AS DECIMAL(38,12)) AS ss
        |      FROM v GROUP BY 1, 2),
        |c AS (SELECT day, variant,
        |             CAST(sum(n) OVER w AS BIGINT) AS cn,
        |             CAST(sum(s) OVER w AS DECIMAL(38,6)) AS cs,
        |             CAST(sum(ss) OVER w AS DECIMAL(38,12)) AS css
        |      FROM d
        |      WINDOW w AS (PARTITION BY variant ORDER BY day
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |j AS (SELECT a.day, a.cn AS n_a, b.cn AS n_b,
        |             CAST(b.cs AS DOUBLE) / b.cn - CAST(a.cs AS DOUBLE) / a.cn AS theta,
        |             (CAST(a.css AS DOUBLE) - CAST(a.cs AS DOUBLE) * CAST(a.cs AS DOUBLE) / a.cn
        |              + CAST(b.css AS DOUBLE) - CAST(b.cs AS DOUBLE) * CAST(b.cs AS DOUBLE) / b.cn)
        |             / (a.cn + b.cn - 2) AS s2
        |      FROM c a JOIN c b ON a.day = b.day AND a.variant = 0 AND b.variant = 1
        |      WHERE a.cn >= 2 AND b.cn >= 2),
        |l AS (SELECT day, n_a, n_b, theta,
        |             s2 * (1.0 / n_a + 1.0 / n_b) AS vn
        |      FROM j),
        |lam AS (SELECT day, n_a, n_b, theta,
        |               sqrt(vn / (vn + 0.1))
        |                 * exp(theta * theta * 0.1 / (2 * vn * (vn + 0.1))) AS lambda
        |        FROM l),
        |p AS (SELECT day, n_a, n_b, theta, lambda,
        |             least(1.0, 1.0 / max(lambda) OVER (ORDER BY day
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_av
        |      FROM lam)
        |SELECT day, n_a, n_b, round(theta, 6) AS theta,
        |       round(lambda, 6) AS lambda,
        |       round(p_av, 6) AS p_always_valid,
        |       round(p_av, 6) <= 0.05 AS reject_h0
        |FROM p ORDER BY day""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tau2 = lit(0.1)
      val v = t(s, dir, "events")
        .select(date_trunc("day", col("ts")).as("day"),
          (get_json_object(col("props"), "$.k").cast("int") % 2).as("variant"),
          col("value").cast("decimal(18,6)").as("x"))
      val d = v.groupBy("day", "variant")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("decimal(38,6)").as("s"),
          sum(col("x") * col("x")).cast("decimal(38,12)").as("ss"))
      val wc = Window.partitionBy("variant").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = d.select(col("day"), col("variant"),
        sum("n").over(wc).as("cn"),
        sum("s").over(wc).cast("decimal(38,6)").as("cs"),
        sum("ss").over(wc).cast("decimal(38,12)").as("css"))
      val a = c.where(col("variant") === 0).select(col("day"),
        col("cn").as("n_a"), col("cs").as("cs_a"), col("css").as("css_a"))
      val b = c.where(col("variant") === 1).select(col("day").as("day_b"),
        col("cn").as("n_b"), col("cs").as("cs_b"), col("css").as("css_b"))
      def dd(c: Column) = c.cast("double")
      val j = a.join(b, col("day") === col("day_b"))
        .where(col("n_a") >= 2 && col("n_b") >= 2)
        .select(col("day"), col("n_a"), col("n_b"),
          (dd(col("cs_b")) / col("n_b") - dd(col("cs_a")) / col("n_a")).as("theta"),
          ((dd(col("css_a")) - dd(col("cs_a")) * dd(col("cs_a")) / col("n_a")
            + dd(col("css_b")) - dd(col("cs_b")) * dd(col("cs_b")) / col("n_b"))
            / (col("n_a") + col("n_b") - 2)).as("s2"))
      val l = j.withColumn("vn",
        col("s2") * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      val lam = l.select(col("day"), col("n_a"), col("n_b"), col("theta"),
        (sqrt(col("vn") / (col("vn") + tau2))
          * exp(col("theta") * col("theta") * tau2
            / (lit(2) * col("vn") * (col("vn") + tau2)))).as("lambda"))
      val wp = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lam.withColumn("p_av", least(lit(1.0), lit(1.0) / max("lambda").over(wp)))
        .select(col("day"), col("n_a"), col("n_b"),
          round(col("theta"), 6).as("theta"),
          round(col("lambda"), 6).as("lambda"),
          round(col("p_av"), 6).as("p_always_valid"),
          (round(col("p_av"), 6) <= 0.05).as("reject_h0"))
        .orderBy("day")
    },

    // ---- split-conformal prediction intervals (Vovk; Lei et al.
    //      JASA'18 "distribution-free predictive inference") ----
    // The uncertainty-quantification rung of the modeling family:
    // train/calibration/test by deterministic md5 hash (the
    // q_split_assign convention), point predictor = per-type train
    // mean (CAST(exact DECIMAL sum AS DOUBLE)/n — avg()'s float
    // merge order never enters), conformal radius qhat = the
    // ⌈(1−α)(n_cal+1)⌉-th smallest calibration residual with the
    // rank INTEGER-computed ((9(n+1)+9)//10 for α = 0.1 — no float
    // ceil at the boundary), and the finite-sample marginal-coverage
    // guarantee audited on the held-out test split (empirical
    // coverage ≈ 0.9 per type on this corpus). Scale: two
    // hash-partitioned aggregations + one per-type rank window over
    // the CALIBRATION split only (a fixed fraction; at 100 TB the
    // k-th order statistic swaps in the ExactQuantiles GK-bracketed
    // selection, same as q_theil_sen's median).
    sql(
      "q_conformal_interval",
      """WITH e AS (SELECT event_type, value,
        |             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 10 AS b
        |           FROM events),
        |tr AS (SELECT event_type,
        |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS pred
        |       FROM e WHERE b <= 5 GROUP BY 1),
        |cal AS (SELECT e.event_type, abs(e.value - tr.pred) AS r
        |        FROM e JOIN tr USING (event_type) WHERE b IN (6, 7)),
        |calr AS (SELECT event_type, r,
        |           row_number() OVER (PARTITION BY event_type ORDER BY r) AS rn,
        |           count(*) OVER (PARTITION BY event_type) AS ncal
        |         FROM cal),
        |q AS (SELECT event_type, CAST(ncal AS BIGINT) AS n_cal, r AS qhat
        |      FROM calr WHERE rn = (9 * (ncal + 1) + 9) // 10),
        |tst AS (SELECT e.event_type, abs(e.value - tr.pred) AS r
        |        FROM e JOIN tr USING (event_type) WHERE b >= 8),
        |cov AS (SELECT t.event_type, CAST(count(*) AS BIGINT) AS n_test,
        |          CAST(sum(CASE WHEN t.r <= q.qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        |        FROM tst t JOIN q USING (event_type) GROUP BY 1)
        |SELECT q.event_type, q.n_cal, cov.n_test, cov.n_covered,
        |       round(q.qhat, 6) AS qhat,
        |       round(CAST(n_covered AS DOUBLE) / n_test, 4) AS coverage
        |FROM q JOIN cov USING (event_type) ORDER BY q.event_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "events")
        .select(col("event_type"), col("value"),
          (graft.functions.TextFunctions.h32(col("event_id").cast("string")) % 10).as("b"))
      val tr = e.where(col("b") <= 5).groupBy("event_type")
        .agg((sum(col("value").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("pred"))
      def resid = abs(col("value") - col("pred"))
      val cal = e.where(col("b").isin(6, 7)).join(tr, "event_type")
        .select(col("event_type"), resid.as("r"))
      val wt = Window.partitionBy("event_type")
      val calr = cal
        .withColumn("rn", row_number().over(wt.orderBy("r")))
        .withColumn("ncal", count(lit(1)).over(wt))
      val q = calr
        .where(col("rn") === floor((lit(9) * (col("ncal") + 1) + 9) / 10))
        .select(col("event_type"), col("ncal").cast("long").as("n_cal"),
          col("r").as("qhat"))
      val cov = e.where(col("b") >= 8).join(tr, "event_type")
        .select(col("event_type"), resid.as("r"))
        .join(broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("r") <= col("qhat"), 1).otherwise(0)).cast("long")
            .as("n_covered"))
      q.join(cov, "event_type")
        .select(col("event_type"), col("n_cal"), col("n_test"), col("n_covered"),
          round(col("qhat"), 6).as("qhat"),
          round(col("n_covered").cast("double") / col("n_test"), 4).as("coverage"))
        .orderBy("event_type")
    },

    // ---- k-fold cross-validation (leave-fold-out evaluation) ----
    // The model-selection primitive conformal's single split doesn't
    // give: 5 deterministic md5 folds, the per-type mean predictor
    // trained on the OTHER four folds, per-fold held-out RMSE. The
    // scale trick is that leave-fold-out training needs NO 5x rescan:
    // per-(type, fold) partial DECIMAL sums from ONE corpus pass give
    // every fold's out-of-fold mean by subtraction (total - fold) —
    // the mergeable-moments pattern (q_corr_matrix, q_ols_by_group)
    // applied to CV. Scoring re-joins the corpus against the
    // (type x fold)-sized prediction table (broadcastable at any
    // corpus size); squared residuals accumulate as DECIMAL(38,12) so
    // the per-fold RMSE is combiner-order-free. The degenerate
    // one-fold-owns-a-type case (n == nf) drops out of the prediction
    // table identically on both engines.
    sql(
      "q_crossval_rmse",
      """WITH e AS (SELECT event_type, value,
        |             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 5 AS fold
        |           FROM events),
        |pf AS (SELECT event_type, fold, sum(CAST(value AS DECIMAL(18,6))) AS sf,
        |              CAST(count(*) AS BIGINT) AS nf
        |       FROM e GROUP BY 1, 2),
        |tot AS (SELECT event_type, sum(sf) AS s, CAST(sum(nf) AS BIGINT) AS n
        |        FROM pf GROUP BY 1),
        |mu AS (SELECT pf.event_type, pf.fold,
        |         CAST(tot.s - pf.sf AS DOUBLE) / (tot.n - pf.nf) AS pred
        |       FROM pf JOIN tot USING (event_type) WHERE tot.n > pf.nf),
        |r AS (SELECT e.fold, CAST(count(*) AS BIGINT) AS n_test,
        |        CAST(sum(CAST((e.value - mu.pred) * (e.value - mu.pred)
        |                      AS DECIMAL(38,12))) AS DOUBLE) AS sse
        |      FROM e JOIN mu ON mu.event_type = e.event_type AND mu.fold = e.fold
        |      GROUP BY 1)
        |SELECT fold, n_test, round(sqrt(sse / n_test), 6) AS rmse
        |FROM r ORDER BY fold""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_type"), col("value"),
          (graft.functions.TextFunctions.h32(col("event_id").cast("string")) % 5)
            .as("fold"))
      val pf = e.groupBy("event_type", "fold")
        .agg(sum(col("value").cast("decimal(18,6)")).as("sf"),
          count(lit(1)).as("nf"))
        .localCheckpoint() // (type x 5) rows: feeds totals AND the LOO means
      val tot = pf.groupBy("event_type")
        .agg(sum("sf").as("s"), sum("nf").cast("long").as("n"))
      val mu = pf.join(tot, "event_type")
        .where(col("n") > col("nf"))
        .select(col("event_type"), col("fold"),
          ((col("s") - col("sf")).cast("double") / (col("n") - col("nf")))
            .as("pred"))
      e.join(broadcast(mu), Seq("event_type", "fold"))
        .groupBy("fold")
        .agg(count(lit(1)).as("n_test"),
          sum(((col("value") - col("pred")) * (col("value") - col("pred")))
            .cast("decimal(38,12)")).cast("double").as("sse"))
        .select(col("fold"), col("n_test"),
          round(sqrt(col("sse") / col("n_test")), 6).as("rmse"))
        .orderBy("fold")
    },

    // ---- Spearman rank correlation per segment (tie-corrected) ----
    // The monotone-association complement to q_corr_matrix's Pearson:
    // per-event-type Spearman between value and minute-of-day,
    // exact under ties via fractional (average) ranks. The exactness
    // trick: DOUBLED ranks — 2·rank + ties − 1 — are INTEGERS equal
    // to twice the average rank, and Pearson is affine-invariant, so
    // every moment (Σr, Σr², Σrxry) is exact integer arithmetic
    // accumulated as DECIMAL(38,0) (a 100×-decade per-type n of ~2M
    // pushes Σrxry past BIGINT) and both engines produce
    // bit-identical rho with no float summation anywhere before the
    // final closed-form division. Scale shape: two rank windows
    // hash-partitioned BY TYPE (no global sort — the per-partition
    // sort is the honest cost of exact ranks; the sketch relaxation
    // is GlobalPrefix), then one aggregation to #types rows.
    sql(
      "q_spearman_by_type",
      """WITH e AS (SELECT event_type, value,
        |             CAST(hour(ts) * 60 + minute(ts) AS BIGINT) AS mnt
        |           FROM events),
        |r AS (SELECT event_type,
        |        2 * rank() OVER (PARTITION BY event_type ORDER BY value)
        |          + count(*) OVER (PARTITION BY event_type, value) - 1 AS rx,
        |        2 * rank() OVER (PARTITION BY event_type ORDER BY mnt)
        |          + count(*) OVER (PARTITION BY event_type, mnt) - 1 AS ry
        |      FROM e),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(rx AS DECIMAL(38,0))) AS sx,
        |        sum(CAST(ry AS DECIMAL(38,0))) AS sy,
        |        sum(CAST(rx * ry AS DECIMAL(38,0))) AS sxy,
        |        sum(CAST(rx * rx AS DECIMAL(38,0))) AS sxx,
        |        sum(CAST(ry * ry AS DECIMAL(38,0))) AS syy
        |      FROM r GROUP BY 1)
        |SELECT event_type, n,
        |       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |            * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
        |         6) AS spearman_rho
        |FROM m ORDER BY event_type""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_type"), col("value"),
          (hour(col("ts")) * 60 + minute(col("ts"))).cast("long").as("mnt"))
      val wx = Window.partitionBy("event_type").orderBy("value")
      val wxT = Window.partitionBy("event_type", "value")
      val wy = Window.partitionBy("event_type").orderBy("mnt")
      val wyT = Window.partitionBy("event_type", "mnt")
      val r = e.select(col("event_type"),
        (lit(2) * rank().over(wx) + count(lit(1)).over(wxT) - 1)
          .cast("long").as("rx"),
        (lit(2) * rank().over(wy) + count(lit(1)).over(wyT) - 1)
          .cast("long").as("ry"))
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val m = r.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(d38(col("rx"))).as("sx"), sum(d38(col("ry"))).as("sy"),
          sum(d38(col("rx") * col("ry"))).as("sxy"),
          sum(d38(col("rx") * col("rx"))).as("sxx"),
          sum(d38(col("ry") * col("ry"))).as("syy"))
      m.select(col("event_type"), col("n"),
          round((col("n") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
            / (sqrt(col("n") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double"))
              * sqrt(col("n") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))), 6)
            .as("spearman_rho"))
        .orderBy("event_type")
    },

    // ---- difference-in-differences (2×2 panel estimator) ----
    // The panel-causal complement to q_cuped/q_uplift_segments:
    // DiD = (μ_treat,post − μ_treat,pre) − (μ_ctrl,post − μ_ctrl,pre)
    // with the delta-method SE √(Σ_g s²_g/n_g) over the four
    // independent cells. Treatment is the deterministic user_id
    // parity split (the q_ab_ttest convention); the pre/post boundary
    // is the corpus's own midpoint DATE (exact integer day arithmetic
    // from min/max, riding as a 1-row broadcast — no wall-clock, no
    // config). ONE corpus pass collapses everything to 12 conditional
    // DECIMAL moments in a single row: at 100 TB the estimator is
    // still one map-side-combined aggregation. Squares use the
    // (18,6)×(19,6) pairing (exact at p=38, the q_autocorr
    // convention).
    sql(
      "q_did_estimator",
      """WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS mn,
        |    CAST(floor((date_diff('day', min(CAST(ts AS DATE)),
        |                          max(CAST(ts AS DATE))) + 1) / 2.0) AS BIGINT) AS half
        |  FROM events),
        |e AS (SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS tr,
        |        CASE WHEN date_diff('day', b.mn, CAST(ts AS DATE)) >= b.half
        |             THEN 1 ELSE 0 END AS post,
        |        CAST(value AS DECIMAL(18,6)) AS v
        |      FROM events CROSS JOIN bounds b),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN tr = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
        |    sum(CASE WHEN tr = 1 AND post = 1 THEN v END) AS s_tp,
        |    sum(CASE WHEN tr = 1 AND post = 1 THEN v * CAST(v AS DECIMAL(19,6)) END) AS q_tp,
        |    CAST(sum(CASE WHEN tr = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
        |    sum(CASE WHEN tr = 1 AND post = 0 THEN v END) AS s_tr,
        |    sum(CASE WHEN tr = 1 AND post = 0 THEN v * CAST(v AS DECIMAL(19,6)) END) AS q_tr,
        |    CAST(sum(CASE WHEN tr = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
        |    sum(CASE WHEN tr = 0 AND post = 1 THEN v END) AS s_cp,
        |    sum(CASE WHEN tr = 0 AND post = 1 THEN v * CAST(v AS DECIMAL(19,6)) END) AS q_cp,
        |    CAST(sum(CASE WHEN tr = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cr,
        |    sum(CASE WHEN tr = 0 AND post = 0 THEN v END) AS s_cr,
        |    sum(CASE WHEN tr = 0 AND post = 0 THEN v * CAST(v AS DECIMAL(19,6)) END) AS q_cr
        |  FROM e)
        |SELECT n_tp, n_tr, n_cp, n_cr,
        |  round(CAST(s_tp AS DOUBLE) / n_tp, 6) AS mean_treat_post,
        |  round(CAST(s_tr AS DOUBLE) / n_tr, 6) AS mean_treat_pre,
        |  round(CAST(s_cp AS DOUBLE) / n_cp, 6) AS mean_ctrl_post,
        |  round(CAST(s_cr AS DOUBLE) / n_cr, 6) AS mean_ctrl_pre,
        |  round((CAST(s_tp AS DOUBLE) / n_tp - CAST(s_tr AS DOUBLE) / n_tr)
        |    - (CAST(s_cp AS DOUBLE) / n_cp - CAST(s_cr AS DOUBLE) / n_cr), 6) AS did,
        |  round(sqrt(
        |      (CAST(q_tp AS DOUBLE) - CAST(s_tp AS DOUBLE) * CAST(s_tp AS DOUBLE) / n_tp) / (n_tp - 1) / n_tp
        |    + (CAST(q_tr AS DOUBLE) - CAST(s_tr AS DOUBLE) * CAST(s_tr AS DOUBLE) / n_tr) / (n_tr - 1) / n_tr
        |    + (CAST(q_cp AS DOUBLE) - CAST(s_cp AS DOUBLE) * CAST(s_cp AS DOUBLE) / n_cp) / (n_cp - 1) / n_cp
        |    + (CAST(q_cr AS DOUBLE) - CAST(s_cr AS DOUBLE) * CAST(s_cr AS DOUBLE) / n_cr) / (n_cr - 1) / n_cr), 6) AS se
        |FROM m""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val bounds = ev.agg(min(to_date(col("ts"))).as("mn"),
        floor((datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
          / 2.0).cast("long").as("half"))
      val e = ev.crossJoin(broadcast(bounds))
        .select(
          when(col("user_id") % 2 === 1, 1).otherwise(0).as("tr"),
          when(datediff(to_date(col("ts")), col("mn")) >= col("half"), 1)
            .otherwise(0).as("post"),
          col("value").cast("decimal(18,6)").as("v"))
      def cell(trV: Int, postV: Int, tag: String) = {
        val c = col("tr") === trV && col("post") === postV
        Seq(sum(when(c, 1L).otherwise(0L)).as(s"n_$tag"),
          sum(when(c, col("v"))).as(s"s_$tag"),
          sum(when(c, col("v") * col("v").cast("decimal(19,6)"))).as(s"q_$tag"))
      }
      val aggs = cell(1, 1, "tp") ++ cell(1, 0, "tr") ++
        cell(0, 1, "cp") ++ cell(0, 0, "cr")
      val m = e.agg(aggs.head, aggs.tail: _*)
      def mean(tag: String) =
        col(s"s_$tag").cast("double") / col(s"n_$tag")
      def varOverN(tag: String) =
        (col(s"q_$tag").cast("double")
          - col(s"s_$tag").cast("double") * col(s"s_$tag").cast("double")
            / col(s"n_$tag")) / (col(s"n_$tag") - 1) / col(s"n_$tag")
      m.select(col("n_tp"), col("n_tr"), col("n_cp"), col("n_cr"),
        round(mean("tp"), 6).as("mean_treat_post"),
        round(mean("tr"), 6).as("mean_treat_pre"),
        round(mean("cp"), 6).as("mean_ctrl_post"),
        round(mean("cr"), 6).as("mean_ctrl_pre"),
        round((mean("tp") - mean("tr")) - (mean("cp") - mean("cr")), 6).as("did"),
        round(sqrt(varOverN("tp") + varOverN("tr")
          + varOverN("cp") + varOverN("cr")), 6).as("se"))
    },

    // ---- sharp regression discontinuity (local linear, both sides) ----
    // The third member of the causal family (DiD above, IPW below):
    // when treatment switches deterministically at a threshold of a
    // running variable, the effect is the JUMP of the outcome at the
    // cutoff — estimated by two separate local linear fits inside a
    // bandwidth and differencing their intercepts AT the cutoff.
    // Running variable x = value − 250 (centered, so each side's OLS
    // intercept IS its boundary limit), bandwidth |x| ≤ 100, outcome =
    // the props.k payload. Both fits are CLOSED-FORM slopes from five
    // exact DECIMAL moments per side, collapsed in ONE corpus pass
    // (map-side combine to a single row — the q_did_estimator scale
    // shape); on the synthetic corpus the true jump is ~0, which the
    // oracle pins exactly. `+ 0.0` canonicalizes signed zeros on the
    // rounded doubles (slopes near 0 round to −0.0 engine-dependently).
    sql(
      "q_regression_discontinuity",
      """WITH e AS (SELECT CAST(value - 250 AS DECIMAL(18,6)) AS x,
        |        CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE)
        |             AS DECIMAL(18,6)) AS y,
        |        CASE WHEN value >= 250 THEN 1 ELSE 0 END AS r
        |      FROM events
        |      WHERE value >= 150 AND value <= 350
        |        AND json_extract_string(props, '$.k') IS NOT NULL),
        |m AS (SELECT r, CAST(count(*) AS BIGINT) AS n,
        |        sum(x) AS sx, sum(y) AS sy,
        |        sum(x * CAST(y AS DECIMAL(19,6))) AS sxy,
        |        sum(x * CAST(x AS DECIMAL(19,6))) AS sxx
        |      FROM e GROUP BY r),
        |f AS (SELECT r, n,
        |        (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |        CAST(sy AS DOUBLE) / n
        |          - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |            / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |            * CAST(sx AS DOUBLE) / n AS a
        |      FROM m)
        |SELECT l.n AS n_left, rt.n AS n_right,
        |       round(l.a, 6) + 0.0 AS a_left, round(l.b, 6) + 0.0 AS b_left,
        |       round(rt.a, 6) + 0.0 AS a_right, round(rt.b, 6) + 0.0 AS b_right,
        |       round(rt.a - l.a, 6) + 0.0 AS tau
        |FROM (SELECT * FROM f WHERE r = 0) l,
        |     (SELECT * FROM f WHERE r = 1) rt""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .where(col("value") >= 150 && col("value") <= 350
          && get_json_object(col("props"), "$.k").isNotNull)
        .select((col("value") - 250).cast("decimal(18,6)").as("x"),
          get_json_object(col("props"), "$.k").cast("double")
            .cast("decimal(18,6)").as("y"),
          when(col("value") >= 250, 1).otherwise(0).as("r"))
      val m = e.groupBy("r").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y").cast("decimal(19,6)")).as("sxy"),
        sum(col("x") * col("x").cast("decimal(19,6)")).as("sxx"))
      val b = (col("n") * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double")) /
        (col("n") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
      val a = col("sy").cast("double") / col("n") -
        b * col("sx").cast("double") / col("n")
      val f = m.select(col("r"), col("n"), a.as("a"), b.as("b"))
        .localCheckpoint() // 2 rows feeding both sides of the pivot
      val l = f.where(col("r") === 0)
        .select(col("n").as("n_left"), col("a").as("al"), col("b").as("bl"))
      val rt = f.where(col("r") === 1)
        .select(col("n").as("n_right"), col("a").as("ar"), col("b").as("br"))
      l.crossJoin(broadcast(rt))
        .select(col("n_left"), col("n_right"),
          (round(col("al"), 6) + 0.0).as("a_left"),
          (round(col("bl"), 6) + 0.0).as("b_left"),
          (round(col("ar"), 6) + 0.0).as("a_right"),
          (round(col("br"), 6) + 0.0).as("b_right"),
          (round(col("ar") - col("al"), 6) + 0.0).as("tau"))
    },

    // ---- stratified propensity / IPW treatment-effect estimate ----
    // The observational-causal complement to q_did_estimator: stratify
    // users on a PRE-period covariate (pre-period spend, fixed-width
    // strata — data-independent boundaries, so no quantile estimation
    // and no cross-engine percentile drift), estimate the propensity
    // p̂_s = share treated within each stratum, and report per-stratum
    // arm means plus the stratum-size-weighted ATE (within a stratum
    // the IPW weights 1/p̂, 1/(1−p̂) are constant, so the stratified
    // IPW estimator reduces to exactly this — the reduction is the
    // point: no per-row weight column survives to the output). ONE
    // corpus pass collapses events to per-user (pre_total, post mean);
    // one keyed aggregation collapses users to ≤ 5 stratum rows; the
    // ATE rides back as a 1-row broadcast. Per-user post means are
    // doubles, so stratum means DECIMAL(38,18)-accumulate the cast
    // (combiner-order-free); stratum ids come from floor() on the
    // exact-DECIMAL pre_total cast to double (same IEEE ops both
    // engines). Degenerate one-arm strata are excluded from the ATE
    // by the 0 < n_treat < n guard — identically on both sides.
    sql(
      "q_propensity_ipw",
      """WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS mn,
        |    CAST(floor((date_diff('day', min(CAST(ts AS DATE)),
        |                          max(CAST(ts AS DATE))) + 1) / 2.0) AS BIGINT) AS half
        |  FROM events),
        |u AS (SELECT user_id,
        |        CAST(user_id % 2 AS BIGINT) AS tr,
        |        sum(CASE WHEN date_diff('day', b.mn, CAST(ts AS DATE)) < b.half
        |                 THEN CAST(value AS DECIMAL(18,6)) END) AS pre_total,
        |        sum(CASE WHEN date_diff('day', b.mn, CAST(ts AS DATE)) >= b.half
        |                 THEN CAST(value AS DECIMAL(18,6)) END) AS post_sum,
        |        CAST(count(CASE WHEN date_diff('day', b.mn, CAST(ts AS DATE)) >= b.half
        |                        THEN 1 END) AS BIGINT) AS post_n
        |      FROM events CROSS JOIN bounds b GROUP BY 1, 2),
        |y AS (SELECT user_id, tr,
        |        greatest(least(CAST(floor(CAST(coalesce(pre_total, 0) AS DOUBLE)
        |          / 400) AS BIGINT) - 2, 4), 0) AS stratum,
        |        CAST(post_sum AS DOUBLE) / post_n AS yv
        |      FROM u WHERE post_n > 0),
        |st AS (SELECT stratum,
        |         CAST(count(*) AS BIGINT) AS n_users,
        |         CAST(sum(tr) AS BIGINT) AS n_treat,
        |         CAST(sum(CASE WHEN tr = 1
        |           THEN CAST(yv AS DECIMAL(38,18)) END) AS DOUBLE) AS syt,
        |         CAST(sum(CASE WHEN tr = 0
        |           THEN CAST(yv AS DECIMAL(38,18)) END) AS DOUBLE) AS syc
        |       FROM y GROUP BY 1),
        |sd AS (SELECT stratum, n_users, n_treat,
        |         CAST(n_treat AS DOUBLE) / n_users AS p_treat,
        |         syt / n_treat AS my_t,
        |         syc / (n_users - n_treat) AS my_c
        |       FROM st WHERE n_treat > 0 AND n_treat < n_users),
        |ate AS (SELECT CAST(sum(CAST(n_users * (my_t - my_c) AS DECIMAL(38,18)))
        |          AS DOUBLE) / sum(n_users) AS v
        |        FROM sd)
        |SELECT stratum, n_users, n_treat,
        |       round(p_treat, 6) AS p_treat,
        |       round(my_t, 6) AS mean_y_treated,
        |       round(my_c, 6) AS mean_y_control,
        |       round(my_t - my_c, 6) AS diff,
        |       round((SELECT v FROM ate), 6) AS ate_stratified
        |FROM sd ORDER BY stratum""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val bounds = ev.agg(min(to_date(col("ts"))).as("mn"),
        floor((datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
          / 2.0).cast("long").as("half"))
      val isPost = datediff(to_date(col("ts")), col("mn")) >= col("half")
      val u = ev.crossJoin(broadcast(bounds))
        .groupBy(col("user_id"), (col("user_id") % 2).as("tr"))
        .agg(
          sum(when(!isPost, col("value").cast("decimal(18,6)"))).as("pre_total"),
          sum(when(isPost, col("value").cast("decimal(18,6)"))).as("post_sum"),
          sum(when(isPost, 1L).otherwise(0L)).as("post_n"))
      val y = u.where(col("post_n") > 0)
        .select(col("tr"),
          greatest(least(floor(coalesce(col("pre_total"), lit(0))
            .cast("double") / 400).cast("long") - 2, lit(4L)), lit(0L))
            .as("stratum"),
          (col("post_sum").cast("double") / col("post_n")).as("yv"))
      val st = y.groupBy("stratum")
        .agg(count(lit(1)).as("n_users"),
          sum("tr").cast("long").as("n_treat"),
          sum(when(col("tr") === 1, col("yv").cast("decimal(38,18)")))
            .cast("double").as("syt"),
          sum(when(col("tr") === 0, col("yv").cast("decimal(38,18)")))
            .cast("double").as("syc"))
      val sd = st.where(col("n_treat") > 0 && col("n_treat") < col("n_users"))
        .select(col("stratum"), col("n_users"), col("n_treat"),
          (col("n_treat").cast("double") / col("n_users")).as("p_treat"),
          (col("syt") / col("n_treat")).as("my_t"),
          (col("syc") / (col("n_users") - col("n_treat"))).as("my_c"))
        .localCheckpoint() // ≤ 5 stratum rows: feeds the ATE AND the output
      val ate = sd.agg((sum((col("n_users") * (col("my_t") - col("my_c")))
          .cast("decimal(38,18)")).cast("double") / sum("n_users")).as("v"))
      sd.crossJoin(broadcast(ate))
        .select(col("stratum"), col("n_users"), col("n_treat"),
          round(col("p_treat"), 6).as("p_treat"),
          round(col("my_t"), 6).as("mean_y_treated"),
          round(col("my_c"), 6).as("mean_y_control"),
          round(col("my_t") - col("my_c"), 6).as("diff"),
          round(col("v"), 6).as("ate_stratified"))
        .orderBy("stratum")
    },

    // ---- AIPW doubly-robust treatment effect ----
    // Robins, Rotnitzky & Zhao (1994) / the modern DoubleML default:
    // the 5th causal estimator (after DiD, stratified IPW, RDD, PSM),
    // and the one that AUDITS the other two — augmented IPW combines
    // an OUTCOME model m_t(x) (here: per-arm OLS of post-mean spend on
    // the continuous pre-period covariate — deliberately NOT saturated
    // per stratum, otherwise the augmentation is identically zero and
    // the estimator degenerates to q_propensity_ipw's) with the
    // stratum PROPENSITY p̂_s (q_propensity_ipw's fixed-width strata),
    // τ̂ = N⁻¹ Σ [m₁(xᵢ)−m₀(xᵢ) + Tᵢ(Yᵢ−m₁(xᵢ))/p̂ − (1−Tᵢ)(Yᵢ−m₀(xᵢ))/(1−p̂)].
    // Consistent if EITHER model is right (double robustness); the
    // output carries all three estimates side by side (outcome-model-
    // only, IPW-only, AIPW) so the doubly-robust number shows its
    // work. Users in degenerate one-arm strata leave every term AND N
    // (identically both engines). Cross-engine exactness: OLS moments
    // are exact DECIMAL ((18,6)×(19,6) = 38-precision products, the
    // q_ols_multi pairing); per-user term sums accumulate as
    // DECIMAL(38,18) casts (combiner-order-free, the q_propensity_ipw
    // convention). 100-TB story: one corpus pass to the user grain,
    // one user-grain aggregation per moment set, ≤ 5-row strata and
    // 1-row fits broadcast back — no per-row weight column survives.
    sql(
      "q_aipw_estimator",
      """WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS mn,
        |    CAST(floor((date_diff('day', min(CAST(ts AS DATE)),
        |                          max(CAST(ts AS DATE))) + 1) / 2.0) AS BIGINT) AS half
        |  FROM events),
        |u AS (SELECT user_id,
        |        CAST(user_id % 2 AS BIGINT) AS tr,
        |        sum(CASE WHEN date_diff('day', b.mn, CAST(ts AS DATE)) < b.half
        |                 THEN CAST(value AS DECIMAL(18,6)) END) AS pre_total,
        |        sum(CASE WHEN date_diff('day', b.mn, CAST(ts AS DATE)) >= b.half
        |                 THEN CAST(value AS DECIMAL(18,6)) END) AS post_sum,
        |        CAST(count(CASE WHEN date_diff('day', b.mn, CAST(ts AS DATE)) >= b.half
        |                        THEN 1 END) AS BIGINT) AS post_n
        |      FROM events CROSS JOIN bounds b GROUP BY 1, 2),
        |y AS (SELECT tr,
        |        CAST(coalesce(pre_total, 0) AS DECIMAL(18,6)) AS x,
        |        greatest(least(CAST(floor(CAST(coalesce(pre_total, 0) AS DOUBLE)
        |          / 400) AS BIGINT) - 2, 4), 0) AS stratum,
        |        CAST(post_sum AS DOUBLE) / post_n AS yv
        |      FROM u WHERE post_n > 0),
        |st AS (SELECT stratum, CAST(count(*) AS BIGINT) AS ns,
        |         CAST(sum(tr) AS BIGINT) AS nt FROM y GROUP BY 1),
        |sp AS (SELECT stratum, CAST(nt AS DOUBLE) / ns AS p
        |       FROM st WHERE nt > 0 AND nt < ns),
        |spc AS (SELECT CAST(count(*) AS BIGINT) AS strata_used FROM sp),
        |yy AS (SELECT y.tr, y.x, y.yv, sp.p
        |       FROM y JOIN sp ON sp.stratum = y.stratum),
        |m AS (SELECT tr, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS DECIMAL(38,6)) AS sx,
        |        CAST(sum(x * CAST(x AS DECIMAL(19,6))) AS DECIMAL(38,12))
        |          AS sxx,
        |        CAST(sum(CAST(yv AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sy,
        |        CAST(sum(CAST(CAST(x AS DOUBLE) * yv AS DECIMAL(38,18)))
        |          AS DECIMAL(38,18)) AS sxy
        |      FROM yy GROUP BY 1),
        |ab AS (SELECT tr, n, sx, sy,
        |         (n * CAST(sxy AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (n * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
        |       FROM m),
        |ab2 AS (SELECT tr, n, b,
        |          CAST(sy AS DOUBLE) / n - b * (CAST(sx AS DOUBLE) / n) AS a
        |        FROM ab),
        |fits AS (SELECT
        |    max(CASE WHEN tr = 1 THEN a END) AS a1,
        |    max(CASE WHEN tr = 1 THEN b END) AS b1,
        |    max(CASE WHEN tr = 0 THEN a END) AS a0,
        |    max(CASE WHEN tr = 0 THEN b END) AS b0
        |  FROM ab2),
        |t AS (SELECT yy.tr, yy.yv, yy.p,
        |        f.a1 + f.b1 * CAST(yy.x AS DOUBLE) AS m1,
        |        f.a0 + f.b0 * CAST(yy.x AS DOUBLE) AS m0,
        |        f.a1, f.b1, f.a0, f.b0
        |      FROM yy CROSS JOIN fits f),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |          CAST(sum(tr) AS BIGINT) AS n_treated,
        |          max(a1) AS a1, max(b1) AS b1, max(a0) AS a0, max(b0) AS b0,
        |          CAST(sum(CAST(m1 - m0 AS DECIMAL(38,18))) AS DOUBLE) AS s_om,
        |          CAST(sum(CAST(CASE WHEN tr = 1 THEN (yv - m1) / p
        |                     ELSE -((yv - m0) / (1 - p)) END
        |                AS DECIMAL(38,18))) AS DOUBLE) AS s_aug,
        |          CAST(sum(CAST(CASE WHEN tr = 1 THEN yv / p
        |                     ELSE -(yv / (1 - p)) END
        |                AS DECIMAL(38,18))) AS DOUBLE) AS s_ipw
        |        FROM t)
        |SELECT n_users, n_treated, spc.strata_used,
        |  round(a1, 6) + 0.0 AS a_treated, round(b1, 6) + 0.0 AS b_treated,
        |  round(a0, 6) + 0.0 AS a_control, round(b0, 6) + 0.0 AS b_control,
        |  round(s_om / n_users, 6) + 0.0 AS tau_outcome_model,
        |  round(s_ipw / n_users, 6) + 0.0 AS tau_ipw,
        |  round((s_om + s_aug) / n_users, 6) + 0.0 AS tau_aipw
        |FROM agg CROSS JOIN spc""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val bounds = ev.agg(min(to_date(col("ts"))).as("mn"),
        floor((datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
          / 2.0).cast("long").as("half"))
      val isPost = datediff(to_date(col("ts")), col("mn")) >= col("half")
      val u = ev.crossJoin(broadcast(bounds))
        .groupBy(col("user_id"), (col("user_id") % 2).as("tr"))
        .agg(
          sum(when(!isPost, col("value").cast("decimal(18,6)"))).as("pre_total"),
          sum(when(isPost, col("value").cast("decimal(18,6)"))).as("post_sum"),
          sum(when(isPost, 1L).otherwise(0L)).as("post_n"))
      val y = u.where(col("post_n") > 0)
        .select(col("tr"),
          coalesce(col("pre_total"), lit(0)).cast("decimal(18,6)").as("x"),
          greatest(least(floor(coalesce(col("pre_total"), lit(0))
            .cast("double") / 400).cast("long") - 2, lit(4L)), lit(0L))
            .as("stratum"),
          (col("post_sum").cast("double") / col("post_n")).as("yv"))
      val st = y.groupBy("stratum").agg(count(lit(1)).as("ns"),
        sum("tr").cast("long").as("nt"))
      val sp = st.where(col("nt") > 0 && col("nt") < col("ns"))
        .select(col("stratum"), (col("nt").cast("double") / col("ns")).as("p"))
        .localCheckpoint() // ≤ 5 rows: user join + strata_used count
      val spc = sp.agg(count(lit(1)).as("strata_used"))
      val yy = y.join(broadcast(sp), "stratum")
        .select(col("tr"), col("x"), col("yv"), col("p"))
        .localCheckpoint() // user frame: moment pass + term pass
      val m = yy.groupBy("tr").agg(count(lit(1)).as("n"),
        sum("x").cast("decimal(38,6)").as("sx"),
        sum(col("x") * col("x").cast("decimal(19,6)"))
          .cast("decimal(38,12)").as("sxx"),
        sum(col("yv").cast("decimal(38,18)"))
          .cast("decimal(38,18)").as("sy"),
        sum((col("x").cast("double") * col("yv")).cast("decimal(38,18)"))
          .cast("decimal(38,18)").as("sxy"))
      val bCol = (col("n") * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double")) /
        (col("n") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
      val ab2 = m.select(col("tr"), col("n"), col("sx"), col("sy"),
          bCol.as("b"))
        .select(col("tr"), col("b"),
          (col("sy").cast("double") / col("n")
            - col("b") * (col("sx").cast("double") / col("n"))).as("a"))
      val fits = ab2.agg(
        max(when(col("tr") === 1, col("a"))).as("a1"),
        max(when(col("tr") === 1, col("b"))).as("b1"),
        max(when(col("tr") === 0, col("a"))).as("a0"),
        max(when(col("tr") === 0, col("b"))).as("b0"))
      val tt = yy.crossJoin(broadcast(fits))
        .select(col("tr"), col("yv"), col("p"),
          (col("a1") + col("b1") * col("x").cast("double")).as("m1"),
          (col("a0") + col("b0") * col("x").cast("double")).as("m0"),
          col("a1"), col("b1"), col("a0"), col("b0"))
      val agg = tt.agg(count(lit(1)).as("n_users"),
        sum("tr").cast("long").as("n_treated"),
        max("a1").as("a1"), max("b1").as("b1"),
        max("a0").as("a0"), max("b0").as("b0"),
        sum((col("m1") - col("m0")).cast("decimal(38,18)"))
          .cast("double").as("s_om"),
        sum(when(col("tr") === 1, (col("yv") - col("m1")) / col("p"))
          .otherwise(-((col("yv") - col("m0")) / (lit(1) - col("p"))))
          .cast("decimal(38,18)")).cast("double").as("s_aug"),
        sum(when(col("tr") === 1, col("yv") / col("p"))
          .otherwise(-(col("yv") / (lit(1) - col("p"))))
          .cast("decimal(38,18)")).cast("double").as("s_ipw"))
      agg.crossJoin(broadcast(spc))
        .select(col("n_users"), col("n_treated"), col("strata_used"),
          (round(col("a1"), 6) + 0.0).as("a_treated"),
          (round(col("b1"), 6) + 0.0).as("b_treated"),
          (round(col("a0"), 6) + 0.0).as("a_control"),
          (round(col("b0"), 6) + 0.0).as("b_control"),
          (round(col("s_om") / col("n_users"), 6) + 0.0)
            .as("tau_outcome_model"),
          (round(col("s_ipw") / col("n_users"), 6) + 0.0).as("tau_ipw"),
          (round((col("s_om") + col("s_aug")) / col("n_users"), 6) + 0.0)
            .as("tau_aipw"))
    },

    // ---- 1-NN caliper propensity-score matching (ATT) ----
    // The FOURTH causal estimator (DiD / IPW / RDD / matching): match
    // each treated user to its nearest control on the PRE-period
    // covariate (1-NN with replacement, caliper 400 — the stratum
    // width q_propensity_ipw uses; ties break on control id) and read
    // the ATT off the matched pairs, with the unmatched naive arm
    // difference riding for contrast. Uses the IPW query's exact user
    // frame so the two estimators differ only in estimator, not
    // plumbing. Scale shape: the corpus collapses ONCE to the
    // per-user frame; the match itself is the UNION-WINDOW AS-OF
    // (the q_asof_join shape): controls collapse to one min-cid
    // representative per DISTINCT score, both arms union into one
    // score-ordered frame, and each treated's nearest control is
    // provably one of {previous, next} control score in that order —
    // two window passes, ZERO pair join (the first cut was a banded
    // bucket join and the 10× decade gate caught its per-band
    // quadratic: 23.3× — bands hold 10× the users on both sides).
    // The argmin (distance, cid) semantics are preserved exactly
    // (per-score representative = min cid; cross-side ties pick the
    // smaller cid) — the oracle keeps the readable banded form and
    // the AccuracySpec replica pins the equivalence brute-force.
    // Scores stay exact DECIMAL(18,6) so distances and the caliper
    // compare are bit-deterministic; pair deltas DECIMAL-accumulate.
    // The global score-order window is the q_gains_table class (user
    // frame; the GlobalPrefix sampled-boundary rewrite is the
    // documented 100-TB escape hatch).
    sql(
      "q_psm_matching",
      """WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS mn,
        |    CAST(floor((date_diff('day', min(CAST(ts AS DATE)),
        |                          max(CAST(ts AS DATE))) + 1) / 2.0) AS BIGINT) AS half
        |  FROM events),
        |u AS (SELECT user_id,
        |        CAST(user_id % 2 AS BIGINT) AS tr,
        |        sum(CASE WHEN date_diff('day', b.mn, CAST(ts AS DATE)) < b.half
        |                 THEN CAST(value AS DECIMAL(18,6)) END) AS pre_total,
        |        sum(CASE WHEN date_diff('day', b.mn, CAST(ts AS DATE)) >= b.half
        |                 THEN CAST(value AS DECIMAL(18,6)) END) AS post_sum,
        |        CAST(count(CASE WHEN date_diff('day', b.mn, CAST(ts AS DATE)) >= b.half
        |                        THEN 1 END) AS BIGINT) AS post_n
        |      FROM events CROSS JOIN bounds b GROUP BY 1, 2),
        |y AS (SELECT user_id, tr,
        |        CAST(coalesce(pre_total, 0) AS DECIMAL(18,6)) AS score,
        |        CAST(floor(CAST(coalesce(pre_total, 0) AS DOUBLE) / 400)
        |             AS BIGINT) AS bkt,
        |        CAST(post_sum AS DOUBLE) / post_n AS yv
        |      FROM u WHERE post_n > 0),
        |cand AS (SELECT t.user_id AS tid, t.yv AS yt, c.user_id AS cid,
        |           c.yv AS yc, abs(t.score - c.score) AS d
        |         FROM (SELECT * FROM y WHERE tr = 1) t
        |         CROSS JOIN (SELECT unnest(range(-1, 2)) AS o) o
        |         JOIN (SELECT * FROM y WHERE tr = 0) c ON c.bkt = t.bkt + o.o
        |         WHERE abs(t.score - c.score) <= 400),
        |m AS (SELECT tid, yt, cid, yc FROM (
        |        SELECT cand.*, row_number() OVER (PARTITION BY tid
        |                 ORDER BY d, cid) AS rn
        |        FROM cand) WHERE rn = 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_matched,
        |          CAST(sum(CAST(yt - yc AS DECIMAL(38,18))) AS DOUBLE)
        |            / count(*) AS att
        |        FROM m),
        |tot AS (SELECT CAST(sum(tr) AS BIGINT) AS n_treated,
        |          CAST(count(*) - sum(tr) AS BIGINT) AS n_control,
        |          CAST(sum(CASE WHEN tr = 1
        |            THEN CAST(yv AS DECIMAL(38,18)) END) AS DOUBLE) / sum(tr)
        |          - CAST(sum(CASE WHEN tr = 0
        |            THEN CAST(yv AS DECIMAL(38,18)) END) AS DOUBLE)
        |            / (count(*) - sum(tr)) AS naive
        |        FROM y)
        |SELECT tot.n_treated, tot.n_control, agg.n_matched,
        |  round(CAST(agg.n_matched AS DOUBLE) / tot.n_treated, 6) AS match_rate,
        |  round(agg.att, 6) AS att_matched,
        |  round(tot.naive, 6) AS naive_diff
        |FROM tot, agg""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val bounds = ev.agg(min(to_date(col("ts"))).as("mn"),
        floor((datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
          / 2.0).cast("long").as("half"))
      val isPost = datediff(to_date(col("ts")), col("mn")) >= col("half")
      val u = ev.crossJoin(broadcast(bounds))
        .groupBy(col("user_id"), (col("user_id") % 2).as("tr"))
        .agg(
          sum(when(!isPost, col("value").cast("decimal(18,6)"))).as("pre_total"),
          sum(when(isPost, col("value").cast("decimal(18,6)"))).as("post_sum"),
          sum(when(isPost, 1L).otherwise(0L)).as("post_n"))
      val y = u.where(col("post_n") > 0)
        .select(col("user_id"), col("tr"),
          coalesce(col("pre_total"), lit(0)).cast("decimal(18,6)").as("score"),
          (col("post_sum").cast("double") / col("post_n")).as("yv"))
        .localCheckpoint() // user frame feeds both arms + the naive agg
      // one min-cid representative per distinct control score: ties on
      // distance within a score resolve to this cid by construction
      val ctrl = y.where(col("tr") === 0)
        .groupBy("score")
        .agg(min(struct(col("user_id").as("cid"), col("yv").as("yc")))
          .as("c0"))
        .select(col("score"),
          struct(col("score").as("cscore"), col("c0.cid").as("cid"),
            col("c0.yc").as("yc")).as("c"))
      val uni = y.where(col("tr") === 1)
        .select(col("score"), lit("t").as("kind"),
          col("user_id").as("tid"), col("yv").as("yt"),
          lit(null).cast(ctrl.schema("c").dataType).as("c"))
        .unionByName(ctrl.select(col("score"), lit("c").as("kind"),
          lit(null).cast("long").as("tid"), lit(null).cast("double").as("yt"),
          col("c")))
      // 'c' < 't': an equal-score control sorts BEFORE its treated row
      // and is picked up by the preceding window at distance 0. BOTH
      // windows are RUNNING frames (the next-control side runs over
      // the reverse ordering, which is the same row set as
      // [current, +∞) forward) — Spark re-evaluates an
      // unbounded-FOLLOWING frame from scratch per row (O(n²); the
      // first cut measured 174 s at the 100× decade, 44×), while
      // running frames stream in O(n).
      val wPrev = Window.orderBy(col("score"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wNextRev = Window.orderBy(col("score").desc, col("kind").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val near = uni
        .withColumn("pc", last(col("c"), ignoreNulls = true).over(wPrev))
        .withColumn("nc", last(col("c"), ignoreNulls = true).over(wNextRev))
        .where(col("kind") === "t")
      val dPrev = col("score") - col("pc.cscore")
      val dNext = col("nc.cscore") - col("score")
      val pickPrev = col("pc").isNotNull && (col("nc").isNull ||
        dPrev < dNext || (dPrev === dNext && col("pc.cid") < col("nc.cid")))
      val m = near
        .select(col("tid"), col("yt"),
          when(pickPrev, col("pc")).otherwise(col("nc")).as("ch"),
          when(pickPrev, dPrev).otherwise(dNext).as("d"))
        .where(col("ch").isNotNull && col("d") <= 400)
      val agg = m.agg(count(lit(1)).as("n_matched"),
        (sum((col("yt") - col("ch.yc")).cast("decimal(38,18)")).cast("double")
          / count(lit(1))).as("att"))
      val tot = y.agg(sum("tr").cast("long").as("n_treated"),
        (count(lit(1)) - sum("tr")).cast("long").as("n_control"),
        (sum(when(col("tr") === 1, col("yv").cast("decimal(38,18)")))
          .cast("double") / sum("tr")
          - sum(when(col("tr") === 0, col("yv").cast("decimal(38,18)")))
            .cast("double") / (count(lit(1)) - sum("tr"))).as("naive"))
      tot.crossJoin(broadcast(agg))
        .select(col("n_treated"), col("n_control"), col("n_matched"),
          round(col("n_matched").cast("double") / col("n_treated"), 6)
            .as("match_rate"),
          round(col("att"), 6).as("att_matched"),
          round(col("naive"), 6).as("naive_diff"))
    },

    // ---- pivot (wide aggregation; fixed value set so it's one pass) ----
    sql(
      "q_pivot",
      """SELECT user_id % 10 AS bucket,
        |       round(coalesce(sum(CASE WHEN event_type = 'click'    THEN value END), 0), 2) AS click,
        |       round(coalesce(sum(CASE WHEN event_type = 'error'    THEN value END), 0), 2) AS error,
        |       round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0), 2) AS purchase,
        |       round(coalesce(sum(CASE WHEN event_type = 'signup'   THEN value END), 0), 2) AS signup,
        |       round(coalesce(sum(CASE WHEN event_type = 'view'     THEN value END), 0), 2) AS view
        |FROM events GROUP BY user_id % 10 ORDER BY bucket""".stripMargin) { (s, dir) =>
      // Explicit value list → single-pass pivot (no distinct-values job).
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("bucket"))
        .pivot("event_type", types)
        .agg(sum(col("value")))
      types.foldLeft(p)((d, ty) => d.withColumn(ty, round(coalesce(col(ty), lit(0)), 2)))
        .orderBy("bucket")
    },

    // ---- unpivot/melt: wide → long (inverse of q_pivot) ----
    sql(
      "q_unpivot",
      """WITH p AS (SELECT user_id % 10 AS bucket,
        |           round(coalesce(sum(CASE WHEN event_type = 'click' THEN value END), 0), 2) AS click,
        |           round(coalesce(sum(CASE WHEN event_type = 'view'  THEN value END), 0), 2) AS view
        |           FROM events GROUP BY 1)
        |SELECT bucket, metric, v
        |FROM p UNPIVOT (v FOR metric IN (click, view))
        |ORDER BY bucket, metric""".stripMargin) { (s, dir) =>
      val p = t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(
          round(coalesce(sum(when(col("event_type") === "click", col("value"))), lit(0)), 2)
            .as("click"),
          round(coalesce(sum(when(col("event_type") === "view", col("value"))), lit(0)), 2)
            .as("view"))
      p.unpivot(Array(col("bucket")), Array(col("click"), col("view")), "metric", "v")
        .orderBy("bucket", "metric")
    },

    // ---- positional explode (ordinality) ----
    sql(
      "q_posexplode",
      """SELECT doc_id,
        |       CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos,
        |       unnest(string_split(text, ' ')) AS word
        |FROM documents
        |WHERE doc_id % 97 = 0
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      // Spark posexplode is 0-based; ordinality convention is 1-based.
      t(s, dir, "documents")
        .where(col("doc_id") % 97 === 0)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).cast("int").as("pos"), col("col").as("word"))
        .orderBy("doc_id", "pos")
    },

    // ---- range-frame window (value-based frame, not row-based) ----
    sql(
      "q_window_range_frame",
      """SELECT event_id,
        |       count(*) OVER (PARTITION BY event_type ORDER BY value
        |                      RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS n_near,
        |       round(sum(value) OVER (PARTITION BY event_type ORDER BY value
        |                      RANGE BETWEEN 10 PRECEDING AND CURRENT ROW), 2) AS v_near
        |FROM events
        |WHERE event_id % 5 = 0
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
        .rangeBetween(-10, Window.currentRow)
      t(s, dir, "events")
        .where(col("event_id") % 5 === 0)
        .select(
          col("event_id"),
          count(lit(1)).over(w).as("n_near"),
          round(sum(col("value")).over(w), 2).as("v_near"))
        .orderBy("event_id")
    },

    // ---- join-strategy hints: same semantics, explicit physical pick.
    //      (broadcast is hinted in q_join_inner; here merge + shuffle_hash.)
    sql(
      "q_join_hints",
      // Money sum per ~25 nation groups is corpus-proportional →
      // decimal accumulation (order-independent; see q_agg_pricing).
      """SELECT n.n_name, count(*) AS n_cust,
        |       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS bal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").hint("shuffle_merge")
      val n = t(s, dir, "nation").hint("shuffle_hash")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"),
          round(sum(col("c_acctbal").cast("decimal(18,6)")), 2)
            .cast("double").as("bal"))
        .orderBy("n_name")
    },

    // ---- manual salted skew join: the fact side salts its key, the
    //      dimension side explodes across all salts — a hot key's rows
    //      spread over 8 partitions instead of one. Value-identical to
    //      the plain join (the oracle IS the plain join); AQE handles
    //      this automatically (ScaleBehaviorSpec), the manual pattern
    //      is for engines/paths where it can't. ----
    sql(
      "q_join_salted",
      // 5 mktsegment groups × whole-orders money sum (~1e10+ above the
      // 10× corpus) → decimal accumulation, order-independent at any
      // scale (see q_agg_pricing).
      """SELECT c.c_mktsegment, count(*) AS n_orders,
        |       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS rev
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin) { (s, dir) =>
      val salts = 8
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
        .withColumn("salt", pmod(hash(col("o_totalprice")), lit(salts)))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      o.join(c, o("o_custkey") === c("c_custkey") && o("salt") === c("salt"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double").as("rev"))
        .orderBy("c_mktsegment")
    },

    // ---- edit-distance fuzzy near-dup, FULL corpus, via the
    //      sorted-neighborhood method (Hernández & Stolfo, SIGMOD'95):
    //      block on the leading 8 chars, sort each block by the
    //      40-char prefix, and pair every doc with only its next
    //      W = 8 neighbors in sort order — `lead()` windows, NO join,
    //      so the candidate count is EXACTLY W·N at any corpus size.
    //      Round 4's 10× ScaleCheck motivated this twice over: the
    //      uncapped 4-char block scaled 58× (Σ block² is quadratic in
    //      block size), and the df-capped variant that replaced it
    //      still scaled 16.9× (capped-quadratic between cap
    //      crossings — and at 100× every block would cross the cap
    //      and be DROPPED, a recall collapse). SNM keeps hot blocks,
    //      costs W·|block| in them, and its one skew surface (a
    //      mega-block is one window partition's sort) sub-blocks with
    //      a longer prefix at cluster scale. Recall trade, by design:
    //      a pair is found iff ≤ W−1 other docs sort between it —
    //      edit-close 40-char prefixes sort adjacently, and >W-deep
    //      boilerplate runs are what exact/MinHash dedup already
    //      catches upstream. ----
    sql(
      "q_dedup_levenshtein",
      """WITH p AS (SELECT doc_id, substr(text, 1, 40) AS pre,
        |                  substr(text, 1, 8) AS blk FROM documents),
        |r AS (SELECT doc_id, pre, blk,
        |             row_number() OVER (PARTITION BY blk ORDER BY pre, doc_id) AS rn
        |      FROM p)
        |SELECT least(a.doc_id, b.doc_id) AS da,
        |       greatest(a.doc_id, b.doc_id) AS db,
        |       CAST(levenshtein(a.pre, b.pre) AS INT) AS dist
        |FROM r a JOIN r b ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 8
        |WHERE levenshtein(a.pre, b.pre) <= 12
        |ORDER BY da, db""".stripMargin) { (s, dir) =>
      // Thresholded levenshtein: banded O(len·k) with early exit
      // (returns -1 past the threshold) instead of the full O(len²)
      // table — for kept rows the value equals the plain distance,
      // so the DuckDB oracle is unchanged. Pair ids normalize to
      // (min, max): sort position and id order can disagree.
      snmCandidates(s, dir, W = 8)
        .withColumn("dist", levenshtein(col("pa"), col("n.pb"), 12).cast("int"))
        .where(col("dist").between(0, 12))
        .select(least(col("da0"), col("n.db0")).as("da"),
          greatest(col("da0"), col("n.db0")).as("db"), col("dist"))
        .orderBy("da", "db")
    },

    // ---- record linkage via the native Jaro-Winkler expression —
    //      the fuzzy-match metric for names/short strings where
    //      Levenshtein over-penalizes transpositions. Same SNM
    //      blocking as above (W = 4 lead-window neighbors, join-free
    //      W·N candidates); the scorer is the codegen'd
    //      `expressions.JaroWinkler`, fuzz-locked to DuckDB's
    //      jaro_winkler_similarity (3000-case parity sweep: boost
    //      threshold 0.7, prefix cap 4, empty → 0). ----
    sql(
      "q_dedup_jarowinkler",
      """WITH p AS (SELECT doc_id, substr(text, 1, 40) AS pre,
        |                  substr(text, 1, 8) AS blk FROM documents),
        |r AS (SELECT doc_id, pre, blk,
        |             row_number() OVER (PARTITION BY blk ORDER BY pre, doc_id) AS rn
        |      FROM p)
        |SELECT least(a.doc_id, b.doc_id) AS da,
        |       greatest(a.doc_id, b.doc_id) AS db,
        |       round(jaro_winkler_similarity(a.pre, b.pre), 6) AS sim
        |FROM r a JOIN r b ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 4
        |WHERE jaro_winkler_similarity(a.pre, b.pre) >= 0.92
        |ORDER BY da, db""".stripMargin) { (s, dir) =>
      snmCandidates(s, dir, W = 4)
        .withColumn("sim", graft.expressions.JaroWinkler(col("pa"), col("n.pb")))
        .where(col("sim") >= 0.92)
        .select(least(col("da0"), col("n.db0")).as("da"),
          greatest(col("da0"), col("n.db0")).as("db"),
          round(col("sim"), 6).as("sim"))
        .orderBy("da", "db")
    },

    // ---- data profiling: per-column null/distinct/min/max/avg ----
    // The describe/data-quality primitive a pipeline runs before
    // training. This oracle query is [[profileStats]]'s EXACT mode
    // (the value-verifiable twin); the operator's default is the
    // approx single-pass mode — see q_profile_stats_approx below and
    // the profileStats scaladoc (VERDICT r5 ask #3).
    sql(
      "q_profile_stats",
      """WITH agg AS (
        |  SELECT count(*) AS n_rows,
        |         count(l_quantity) AS q_n, CAST(count(DISTINCT l_quantity) AS BIGINT) AS q_nd,
        |           round(min(l_quantity), 4) AS q_min, round(max(l_quantity), 4) AS q_max,
        |           round(avg(l_quantity), 4) AS q_avg,
        |         count(l_extendedprice) AS p_n, CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS p_nd,
        |           round(min(l_extendedprice), 4) AS p_min, round(max(l_extendedprice), 4) AS p_max,
        |           round(avg(l_extendedprice), 4) AS p_avg,
        |         count(l_discount) AS d_n, CAST(count(DISTINCT l_discount) AS BIGINT) AS d_nd,
        |           round(min(l_discount), 4) AS d_min, round(max(l_discount), 4) AS d_max,
        |           round(avg(l_discount), 4) AS d_avg,
        |         count(l_tax) AS t_n, CAST(count(DISTINCT l_tax) AS BIGINT) AS t_nd,
        |           round(min(l_tax), 4) AS t_min, round(max(l_tax), 4) AS t_max,
        |           round(avg(l_tax), 4) AS t_avg
        |  FROM lineitem)
        |SELECT 'l_quantity' AS col_name, q_n AS n_values, n_rows - q_n AS n_nulls,
        |       q_nd AS n_distinct, q_min AS min_val, q_max AS max_val, q_avg AS avg_val FROM agg
        |UNION ALL
        |SELECT 'l_extendedprice', p_n, n_rows - p_n, p_nd, p_min, p_max, p_avg FROM agg
        |UNION ALL
        |SELECT 'l_discount', d_n, n_rows - d_n, d_nd, d_min, d_max, d_avg FROM agg
        |UNION ALL
        |SELECT 'l_tax', t_n, n_rows - t_n, t_nd, t_min, t_max, t_avg FROM agg
        |ORDER BY col_name""".stripMargin) { (s, dir) =>
      profileStats(s, dir, approx = false)
    },

    // ---- data profiling, approx-default oracle gate: the exact
    // deterministic columns hash-match DuckDB while `nd_ok` asserts
    // the approx single-pass n_distinct lands within max(6%, 1) of
    // exact — the approx profile's accuracy contract enforced
    // value-wise by the driver's hash compare (VERDICT r5 asks #3+#5).
    // The plan runs BOTH modes (exact branches feed the flag), so
    // Bench times q_profile_stats for the exact cost and
    // ProfileStatsSpec pins the pure approx mode's one-pass plan. ----
    sql(
      "q_profile_stats_approx",
      """WITH agg AS (
        |  SELECT count(*) AS n_rows,
        |         count(l_quantity) AS q_n, CAST(count(DISTINCT l_quantity) AS BIGINT) AS q_nd,
        |           round(min(l_quantity), 4) AS q_min, round(max(l_quantity), 4) AS q_max,
        |           round(avg(l_quantity), 4) AS q_avg,
        |         count(l_extendedprice) AS p_n, CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS p_nd,
        |           round(min(l_extendedprice), 4) AS p_min, round(max(l_extendedprice), 4) AS p_max,
        |           round(avg(l_extendedprice), 4) AS p_avg,
        |         count(l_discount) AS d_n, CAST(count(DISTINCT l_discount) AS BIGINT) AS d_nd,
        |           round(min(l_discount), 4) AS d_min, round(max(l_discount), 4) AS d_max,
        |           round(avg(l_discount), 4) AS d_avg,
        |         count(l_tax) AS t_n, CAST(count(DISTINCT l_tax) AS BIGINT) AS t_nd,
        |           round(min(l_tax), 4) AS t_min, round(max(l_tax), 4) AS t_max,
        |           round(avg(l_tax), 4) AS t_avg
        |  FROM lineitem)
        |SELECT 'l_quantity' AS col_name, q_n AS n_values, n_rows - q_n AS n_nulls,
        |       q_nd AS n_distinct, true AS nd_ok,
        |       q_min AS min_val, q_max AS max_val, q_avg AS avg_val FROM agg
        |UNION ALL
        |SELECT 'l_extendedprice', p_n, n_rows - p_n, p_nd, true, p_min, p_max, p_avg FROM agg
        |UNION ALL
        |SELECT 'l_discount', d_n, n_rows - d_n, d_nd, true, d_min, d_max, d_avg FROM agg
        |UNION ALL
        |SELECT 'l_tax', t_n, n_rows - t_n, t_nd, true, t_min, t_max, t_avg FROM agg
        |ORDER BY col_name""".stripMargin) { (s, dir) =>
      val exact = profileStats(s, dir, approx = false)
      val ap = profileStats(s, dir, approx = true)
        .select(col("col_name"), col("n_distinct").as("nd_approx"))
      exact.join(broadcast(ap), "col_name") // 4 rows × 4 rows, keyed
        .select(col("col_name"), col("n_values"), col("n_nulls"),
          col("n_distinct"),
          (abs(col("nd_approx") - col("n_distinct")) <=
            greatest(col("n_distinct") * 0.06, lit(1.0))).as("nd_ok"),
          col("min_val"), col("max_val"), col("avg_val"))
        .orderBy("col_name")
    },

    // ---- equal-frequency binning: global ntile without the global
    //      window ----
    // Quantile bucketing over a corpus-wide order (length-bucketed
    // batching, score-quartile curricula). ntile's allocation — the
    // first N mod k buckets take one extra row — is reproduced exactly
    // from the GlobalPrefix global rank and a broadcast row count, so
    // the plan stays all-parallel where Window.orderBy(...) would
    // funnel the corpus through one task.
    sql(
      "q_equi_bins",
      """WITH r AS (SELECT l_extendedprice AS p,
        |                  ntile(4) OVER (ORDER BY l_extendedprice,
        |                                 l_orderkey, l_linenumber) AS bin
        |           FROM lineitem)
        |SELECT bin, count(*) AS n,
        |       round(min(p), 2) AS p_min,
        |       round(max(p), 2) AS p_max,
        |       round(avg(p), 4) AS p_avg
        |FROM r GROUP BY bin ORDER BY bin""".stripMargin) { (s, dir) =>
      val k = 4
      val li = t(s, dir, "lineitem")
        .select(col("l_extendedprice").as("p"),
          col("l_orderkey"), col("l_linenumber"))
      val (ranked, grand) = GlobalPrefix.runningTotalWithGrand(
        li, Seq(col("p"), col("l_orderkey"), col("l_linenumber")),
        lit(1L), "rk")
      // ntile's exact allocation from (rank, N): the first rem = N%k
      // buckets hold q+1 = N/k+1 rows, the rest q. Column `/` is
      // double division, so ceil(a/b) is floor((a+b-1)/b) — exact in
      // a double for any realistic N (< 2^53). BIGINT to match
      // DuckDB's ntile type.
      val n = col("n_total")
      val q = floor(n / k).cast("long")
      val rem = n % k
      val cut = rem * (q + 1)
      val bin = when(col("rk") <= cut,
          floor((col("rk") + q) / (q + 1)))
        .otherwise(rem + floor((col("rk") - cut + q - 1) / greatest(q, lit(1L))))
        .cast("long")
      ranked.crossJoin(broadcast(grand.select(col("__grand").as("n_total"))))
        .withColumn("bin", bin)
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          round(min(col("p")), 2).as("p_min"),
          round(max(col("p")), 2).as("p_max"),
          round(avg(col("p")), 4).as("p_avg"))
        .orderBy("bin")
    },

    // ---- skyline / Pareto frontier (strict dominance) ----
    // Rows no other row STRICTLY dominates (s.price ≤ r.price ∧
    // s.qty ≥ r.qty with one inequality strict). Computed exactly:
    // collapse to per-price max qty (a row below its price's max is
    // dominated by that same-price max row), then a price survives iff
    // its max beats the EXCLUSIVE prefix max over strictly-cheaper
    // prices (equality = dominated by the cheaper equal-qty row), and
    // the surviving (price, max) pairs join back to recover every
    // achieving row — co-max ties and exact duplicates all survive, as
    // strict dominance requires. The prefix runs over DISTINCT prices
    // (post-aggregation), so the GlobalPrefix pass is tiny; the naive
    // NOT EXISTS dominance probe is corpus×corpus (92 s in DuckDB at
    // sf0.01 vs <1 s for this form — SkylineSpec pins the equivalence
    // on adversarial ties instead). Frontier join-back broadcasts
    // (a 2-D frontier is bounded by the distinct qty count).
    sql(
      "q_skyline",
      """WITH o AS (SELECT l_orderkey, l_linenumber,
        |                  l_extendedprice AS price, l_quantity AS qty
        |           FROM lineitem),
        |g AS (SELECT price, max(qty) AS gmax FROM o GROUP BY price),
        |m AS (SELECT *, max(gmax) OVER (ORDER BY price
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
        |      FROM g),
        |f AS (SELECT price, gmax FROM m WHERE best_prev IS NULL OR gmax > best_prev)
        |SELECT o.l_orderkey, o.l_linenumber,
        |       round(o.price, 2) AS price, round(o.qty, 2) AS qty
        |FROM o JOIN f ON o.price = f.price AND o.qty = f.gmax
        |ORDER BY price, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("price"), col("l_quantity").as("qty"))
      val g = o.groupBy("price").agg(max(col("qty")).as("gmax"))
      val frontier = GlobalPrefix.runningMaxExclusive(
          g, Seq(col("price")), col("gmax"), "best_prev")
        .where(col("best_prev").isNull || col("gmax") > col("best_prev"))
        .select(col("price").as("f_price"), col("gmax"))
      o.join(broadcast(frontier),
          col("price") === col("f_price") && col("qty") === col("gmax"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("price"), 2).as("price"), round(col("qty"), 2).as("qty"))
        .orderBy("price", "l_orderkey", "l_linenumber")
    },

    // ---- heavy hitters: single-pass frequent-token sketch ----
    // Spark's native freqItems (a Karp–Shenker–Papadimitriou /
    // Misra–Gries family counter): ONE pass, O(1/support) state per
    // partition, mergeable partials — the shape that finds hot tokens
    // in 100 TB without a full token-frequency aggregation. The
    // guarantee is one-sided (every token with true count > support·N
    // is a candidate; extras allowed), so the candidate list alone is
    // sketch-dependent — but candidates FILTERED by exact count >
    // support·N are deterministically THE heavy-hitter set, which the
    // oracle verifies value-for-value. The filter join doubles as a
    // per-run proof of the no-false-negative property (a missed heavy
    // hitter ⇒ a missing output row ⇒ hash mismatch); AccuracySpec
    // additionally pins the guarantee against exact counts directly.
    // At scale the exact-count verification leg is optional; the
    // sketch leg alone is the O(1/support)-state production path.
    sql(
      "q_freq_items",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT w, count(*) AS cnt FROM w GROUP BY w),
        |t AS (SELECT count(*) AS n FROM w)
        |SELECT c.w AS token, c.cnt FROM c, t
        |WHERE c.cnt > 0.01 * t.n
        |ORDER BY token""".stripMargin) { (s, dir) =>
      val words = t(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      val candidates = words.stat.freqItems(Seq("w"), 0.01)
        .select(explode(col("w_freqItems")).as("tok"))
        .select(col("tok").cast("string").as("token"))
      val counts = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      val total = words.agg(count(lit(1)).as("n_total"))
      counts.join(broadcast(candidates), col("w") === col("token"))
        .crossJoin(broadcast(total)) // 1-row corpus scalar riding the plan
        .where(col("cnt") > lit(0.01) * col("n_total"))
        .select(col("token"), col("cnt"))
        .orderBy("token")
    },

    // ---- drift timeline: day-over-day JSD of the event-type mix ----
    // The monitoring query behind a "did today's traffic mix shift?"
    // dashboard: Jensen–Shannon divergence between each day's
    // event-type distribution and the previous day's, one row per
    // day. Scale shape: the corpus collapses to a (#days × #types)
    // grid in ONE aggregation; everything after — dense grid from two
    // broadcast dims (zero cells included), the day-vs-prev join, the
    // per-day term sums — runs on that collapsed grid. Terms from
    // exact integers; per-day sums accumulate in DECIMAL(30,15) (see
    // q_js_divergence for why not (38,18)); ln(2) pinned to the same
    // double literal on both engines.
    sql(
      "q_drift_timeline",
      """WITH c AS (SELECT CAST(ts AS DATE) AS d, event_type AS et,
        |                  count(*) AS c FROM events GROUP BY 1, 2),
        |t AS (SELECT d, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY d),
        |grid AS (SELECT dd.d, ty.et
        |         FROM (SELECT DISTINCT d FROM c) dd
        |         CROSS JOIN (SELECT DISTINCT et FROM c) ty),
        |j AS (SELECT g.d, g.et,
        |             coalesce(ca.c, 0) AS c1, coalesce(cb.c, 0) AS c2
        |      FROM grid g
        |      LEFT JOIN c ca ON ca.d = g.d AND ca.et = g.et
        |      LEFT JOIN c cb ON cb.d = g.d - 1 AND cb.et = g.et),
        |jt AS (SELECT j.d, j.c1, j.c2, ta.n AS n1, tb.n AS n2
        |       FROM j JOIN t ta ON ta.d = j.d
        |       JOIN t tb ON tb.d = j.d - 1),
        |terms AS (SELECT d, n1, n2,
        |    CASE WHEN c1 > 0 THEN CAST((c1 / CAST(n1 AS DOUBLE))
        |         * ln((c1 / CAST(n1 AS DOUBLE))
        |              / ((c1 / CAST(n1 AS DOUBLE) + c2 / CAST(n2 AS DOUBLE))
        |                 / CAST(2 AS DOUBLE))) AS DECIMAL(30,15))
        |         ELSE CAST(0 AS DECIMAL(30,15)) END AS pa,
        |    CASE WHEN c2 > 0 THEN CAST((c2 / CAST(n2 AS DOUBLE))
        |         * ln((c2 / CAST(n2 AS DOUBLE))
        |              / ((c1 / CAST(n1 AS DOUBLE) + c2 / CAST(n2 AS DOUBLE))
        |                 / CAST(2 AS DOUBLE))) AS DECIMAL(30,15))
        |         ELSE CAST(0 AS DECIMAL(30,15)) END AS pb
        |    FROM jt)
        |SELECT d, max(n1) AS n_day, max(n2) AS n_prev,
        |       round(CAST(sum(pa + pb) AS DOUBLE) / CAST(2 AS DOUBLE)
        |             / CAST(0.6931471805599453 AS DOUBLE), 6) AS jsd_bits
        |FROM terms GROUP BY d ORDER BY d""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "events")
        .select(col("ts").cast("date").as("d"), col("event_type").as("et"))
        .groupBy("d", "et").agg(count(lit(1)).as("c"))
        .localCheckpoint() // grid feeds 4 consumers (days/types/ca/cb)
      val tt = c.groupBy("d").agg(sum("c").as("n"))
      val days = c.select("d").distinct()
      val types = c.select("et").distinct()
      val grid = days.crossJoin(broadcast(types))
      val ca = c.select(col("d").as("ad"), col("et").as("aet"), col("c").as("c1"))
      val cb = c.select(col("d").as("bd"), col("et").as("bet"), col("c").as("c2"))
      val j = grid
        .join(ca, col("d") === col("ad") && col("et") === col("aet"), "left")
        .join(cb, date_sub(col("d"), 1) === col("bd") && col("et") === col("bet"), "left")
        .na.fill(0L, Seq("c1", "c2"))
        .select(col("d"), col("c1"), col("c2"))
      val ta = tt.select(col("d").as("tad"), col("n").as("n1"))
      val tb = tt.select(col("d").as("tbd"), col("n").as("n2"))
      val jt = j.join(ta, col("d") === col("tad"))
        .join(tb, date_sub(col("d"), 1) === col("tbd"))
      val p = col("c1") / col("n1").cast("double")
      val q = col("c2") / col("n2").cast("double")
      val m = (p + q) / lit(2.0)
      val dec = "decimal(30,15)"
      jt.select(col("d"), col("n1"), col("n2"),
          when(col("c1") > 0, (p * log(p / m)).cast(dec))
            .otherwise(lit(0).cast(dec)).as("pa"),
          when(col("c2") > 0, (q * log(q / m)).cast(dec))
            .otherwise(lit(0).cast(dec)).as("pb"))
        .groupBy("d")
        .agg(max(col("n1")).as("n_day"), max(col("n2")).as("n_prev"),
          round(sum(col("pa") + col("pb")).cast("double") / lit(2.0)
            / lit(0.6931471805599453), 6).as("jsd_bits"))
        .orderBy("d")
    },

    // ---- ranking quality: Mann–Whitney U / AUC ----
    // "Does `value` rank purchases above views?" — exactly the AUC of
    // `value` as a classifier score, which equals U1/(n1·n2) from the
    // tie-corrected rank sum. Same scale shape as q_ks_drift: ONE
    // groupBy collapses ties, ONE GlobalPrefix prefix sum provides
    // each tie block's preceding-count, and the rank-sum accumulates
    // in EXACT integers (2·R1 = Σ c1·(2·prev + c + 1), so doubling
    // clears the average-rank half). The tie-corrected normal
    // z-statistic is derived from the same exact integers (Σ(c³−c)
    // tie term) with identical double ops on both engines. BIGINT
    // headroom: 2·R1 ≤ 2N², fine through ~2e9 pooled rows.
    sql(
      "q_auc_mannwhitney",
      """WITH s AS (SELECT value AS v,
        |                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |           FROM events
        |           WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
        |u AS (SELECT v, CAST(sum(pos) AS BIGINT) AS c1,
        |             CAST(count(*) AS BIGINT) AS c FROM s GROUP BY v),
        |r AS (SELECT v, c1, c,
        |             CAST(sum(c) OVER (ORDER BY v) AS BIGINT) - c AS prev FROM u),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c - c1) AS BIGINT) AS n2,
        |             sum(CAST(c AS DOUBLE) * c * c - c) AS tie_term FROM u),
        |rs AS (SELECT CAST(sum(c1 * (2 * prev + c + 1)) AS BIGINT) AS r1_x2 FROM r)
        |SELECT t.n1, t.n2, rs.r1_x2 - t.n1 * (t.n1 + 1) AS u1_x2,
        |       round((rs.r1_x2 - t.n1 * (t.n1 + 1))
        |             / CAST(2 * t.n1 * t.n2 AS DOUBLE), 6) AS auc,
        |       round((rs.r1_x2 - t.n1 * (t.n1 + 1) - t.n1 * t.n2)
        |             / (2 * sqrt((CAST(t.n1 AS DOUBLE) * t.n2 / CAST(12 AS DOUBLE))
        |                * ((t.n1 + t.n2 + 1)
        |                   - tie_term / (CAST(t.n1 + t.n2 AS DOUBLE)
        |                                 * (t.n1 + t.n2 - 1))))), 4) AS z_approx
        |FROM rs, t""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
        .where(col("event_type").isin("view", "purchase") && col("value").isNotNull)
      mannWhitney(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "view"),
        col("value"))
    },

    // ---- sliced ranking quality: per-day AUC ----
    // The slice-wise eval shape ("is the score good on EVERY day /
    // segment, not just overall?"): q_auc_mannwhitney's exact
    // rank-sum arithmetic, but ranks come from an ordinary
    // PARTITIONED window (partition = slice) instead of GlobalPrefix —
    // each slice's distinct values sort within its own partition, so
    // the whole computation is one shuffle on the slice key and scales
    // with slices × values. Slices missing either class are dropped
    // (AUC undefined), exactly like the oracle's HAVING.
    sql(
      "q_auc_sliced",
      """WITH s AS (SELECT CAST(ts AS DATE) AS d, value AS v,
        |                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |           FROM events
        |           WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
        |u AS (SELECT d, v, CAST(sum(pos) AS BIGINT) AS c1,
        |             CAST(count(*) AS BIGINT) AS c FROM s GROUP BY d, v),
        |r AS (SELECT d, c1, c,
        |             CAST(sum(c) OVER (PARTITION BY d ORDER BY v) AS BIGINT) - c AS prev
        |      FROM u),
        |g AS (SELECT d, CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c - c1) AS BIGINT) AS n2,
        |             CAST(sum(c1 * (2 * prev + c + 1)) AS BIGINT) AS r1_x2
        |      FROM r GROUP BY d
        |      HAVING sum(c1) > 0 AND sum(c - c1) > 0)
        |SELECT d, n1, n2,
        |       round((r1_x2 - n1 * (n1 + 1))
        |             / CAST(2 * n1 * n2 AS DOUBLE), 6) AS auc
        |FROM g ORDER BY d""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
        .where(col("event_type").isin("view", "purchase") && col("value").isNotNull)
        .select(col("ts").cast("date").as("d"), col("value").as("v"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val u = ev.groupBy("d", "v")
        .agg(sum(col("pos")).as("c1"), count(lit(1)).as("c"))
      val w = Window.partitionBy("d").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val r = u.withColumn("prev", sum(col("c")).over(w) - col("c"))
      r.groupBy("d")
        .agg(sum(col("c1")).as("n1"), sum(col("c") - col("c1")).as("n2"),
          sum(col("c1") * (lit(2L) * col("prev") + col("c") + 1L)).as("r1_x2"))
        .where(col("n1") > 0 && col("n2") > 0)
        .select(col("d"), col("n1"), col("n2"),
          round((col("r1_x2") - col("n1") * (col("n1") + 1L))
            / (lit(2L) * col("n1") * col("n2")).cast("double"), 6).as("auc"))
        .orderBy("d")
    },

    // ---- distribution drift: two-sample Kolmogorov–Smirnov ----
    // Training-data QA: is the `value` distribution of one event slice
    // drifting from another (snapshot-to-snapshot / source-to-source)?
    // D = max_x |F1(x) − F2(x)|. Scale shape: ONE groupBy collapses
    // ties, then the running CDF difference is a single GlobalPrefix
    // two-pass prefix sum over distinct values — no one-task global
    // window, no per-sample second pass. The statistic is computed in
    // EXACT integer arithmetic (running sum of c1·n2 − c2·n1, so
    // max|R| = D·n1·n2 exactly) — order-independent, hash-stable; the
    // one double division happens once on the 1-row result. BIGINT
    // headroom: |R| ≤ n1·n2, fine through ~3e9 rows per side; past
    // that, scale the weights to DECIMAL. Rejection flag at α=0.05
    // (c(α)=1.358 asymptotic).
    sql(
      "q_ks_drift",
      """WITH s AS (SELECT value AS v,
        |                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a
        |           FROM events
        |           WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
        |u AS (SELECT v, CAST(sum(a) AS BIGINT) AS c1,
        |             CAST(sum(1 - a) AS BIGINT) AS c2 FROM s GROUP BY v),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c2) AS BIGINT) AS n2 FROM u),
        |r AS (SELECT CAST(sum(c1) OVER w AS BIGINT) AS r1,
        |             CAST(sum(c2) OVER w AS BIGINT) AS r2
        |      FROM u WINDOW w AS (ORDER BY v)),
        |d AS (SELECT max(abs(r1 * t.n2 - r2 * t.n1)) AS ks_num FROM r, t)
        |SELECT t.n1, t.n2, d.ks_num,
        |       round(d.ks_num / (t.n1 * t.n2), 6) AS ks_stat,
        |       CAST(CASE WHEN d.ks_num / (t.n1 * t.n2) >
        |                      1.358 * sqrt((t.n1 + t.n2) / (t.n1 * t.n2))
        |                 THEN 1 ELSE 0 END AS INT) AS reject_05
        |FROM d, t""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
        .where(col("event_type").isin("view", "purchase") && col("value").isNotNull)
      ksTest(
        ev.where(col("event_type") === "view"),
        ev.where(col("event_type") === "purchase"),
        col("value"))
    },

    // ---- corpus audit: chi-squared independence (lang × source) ----
    // Is document language independent of source? A skewed cell here
    // means a source is over/under-contributing a language — the
    // mixture-drift check a curation pipeline runs before reweighting
    // (pair with q_domain_mix). Scale shape: three hash aggregations
    // over the corpus (cells, row totals, column totals — each one
    // shuffle, mergeable), then ALL remaining math happens on the
    // #langs × #sources cell grid built from two broadcast dim
    // aggregates (zero-count cells included via the left join — they
    // still contribute (0−e)²/e). Per-cell terms are double; the SUM
    // accumulates in DECIMAL(38,18) (the NOTES money-sum idiom) so the
    // final rounded statistic is independent of Spark's merge order.
    sql(
      "q_chi2_independence",
      """WITH d AS (SELECT lang, source FROM documents),
        |o AS (SELECT lang, source, count(*) AS o FROM d GROUP BY 1, 2),
        |rl AS (SELECT lang, count(*) AS rl FROM d GROUP BY 1),
        |cs AS (SELECT source, count(*) AS cs FROM d GROUP BY 1),
        |t AS (SELECT count(*) AS n FROM d),
        |cells AS (SELECT rl.rl, cs.cs, coalesce(o.o, 0) AS o
        |          FROM rl CROSS JOIN cs
        |          LEFT JOIN o ON o.lang = rl.lang AND o.source = cs.source),
        |terms AS (SELECT CAST((o - rl * cs / CAST(t.n AS DOUBLE))
        |                      * (o - rl * cs / CAST(t.n AS DOUBLE))
        |                      / (rl * cs / CAST(t.n AS DOUBLE)) AS DECIMAL(38,18)) AS term
        |          FROM cells, t)
        |SELECT CAST(((SELECT count(*) FROM rl) - 1)
        |            * ((SELECT count(*) FROM cs) - 1) AS BIGINT) AS dof,
        |       round(CAST(sum(term) AS DOUBLE), 4) AS chi2,
        |       (SELECT CAST(n AS BIGINT) FROM t) AS n
        |FROM terms""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select("lang", "source")
      val obs = d.groupBy("lang", "source").agg(count(lit(1)).as("o"))
      // dim/total aggregates are tiny (#langs, #sources, 1 rows) but
      // each RIDES THE PLAN more than once (grid build + dof + n);
      // eager-materialize so the corpus is scanned once per aggregate,
      // not once per use (the anomaly_mad pattern).
      val rl = d.groupBy("lang").agg(count(lit(1)).as("rl")).localCheckpoint()
      val cs = d.groupBy("source").agg(count(lit(1)).as("cs")).localCheckpoint()
      val tot = d.agg(count(lit(1)).as("n")).localCheckpoint()
      // double division on BOTH sides (DuckDB's bare `1.0` would be
      // DECIMAL and silently switch the oracle to decimal division)
      val e = col("rl") * col("cs") / col("n").cast("double")
      val terms = rl.crossJoin(broadcast(cs)) // #langs × #sources grid
        .join(obs, Seq("lang", "source"), "left")
        .na.fill(0L, Seq("o"))
        .crossJoin(broadcast(tot)) // 1-row corpus count
        .withColumn("term",
          ((col("o") - e) * (col("o") - e) / e).cast("decimal(38,18)"))
      val dims = rl.agg(count(lit(1)).as("nl"))
        .crossJoin(broadcast(cs.agg(count(lit(1)).as("ns"))))
      terms.agg(sum(col("term")).as("chi2_dec"))
        .crossJoin(broadcast(dims))
        .crossJoin(broadcast(tot))
        .select(((col("nl") - 1) * (col("ns") - 1)).cast("bigint").as("dof"),
          round(col("chi2_dec").cast("double"), 4).as("chi2"),
          col("n").cast("bigint").as("n"))
    },

    // ---- association rules (market-basket pair mining) ----
    // Support/confidence/lift for part pairs co-bought in one order —
    // the retail twin of the text PMI query. Candidate pairs come
    // from a SELF EQUI-JOIN on the basket key with p2 > p1 as a
    // residual: fan-out is Σ basket² per order, bounded by the
    // per-order line cap (TPC-H ≤ 7), never corpus-quadratic. Item
    // supports are a #parts-row aggregate hash-joined back; the
    // basket total rides a 1-row broadcast; all stats are exact-int
    // ratios divided once. Top-25 by (lift, p1, p2) total order via
    // TakeOrderedAndProject.
    sql(
      "q_assoc_rules",
      s"""WITH $basketPairsSqlCtes,
        |n0 AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM b),
        |sup AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS s FROM b GROUP BY 1)
        |SELECT p.p1, p.p2, p.n_both, s1.s AS s1, s2.s AS s2,
        |  round(CAST(p.n_both AS DOUBLE) / (SELECT n FROM n0), 6) AS support,
        |  round(CAST(p.n_both AS DOUBLE) / s1.s, 6) AS confidence,
        |  round(CAST(p.n_both AS DOUBLE) * (SELECT n FROM n0)
        |        / (CAST(s1.s AS DOUBLE) * s2.s), 6) AS lift
        |FROM pairs p JOIN sup s1 ON s1.l_partkey = p.p1
        |             JOIN sup s2 ON s2.l_partkey = p.p2
        |WHERE p.n_both >= 2
        |ORDER BY lift DESC, p1, p2 LIMIT 25""".stripMargin) { (s, dir) =>
      // Pair derivation = the shared basketPairCounts core (one corpus
      // shuffle, codegen'd i<j array transform — see its scaladoc; the
      // first cut self-joined the distinct pair list: 3 corpus
      // shuffles, 8.4× at the 10× corpus). Supports and the basket
      // total derive from the SAME collapsed basket frame.
      val (baskets, rawPairs) = basketPairCounts(s, dir)
      val n0 = baskets.agg(count(lit(1)).as("n"))
      val sup = baskets
        .select(explode(col("ps")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("s"))
      val pairs = rawPairs.where(col("n_both") >= 2)
      // mirror the oracle's operation order exactly: both·n and s1·s2
      // are exact small-int double products, one division each
      val lift = (col("n_both").cast("double") * col("n")) /
        (col("s1").cast("double") * col("s2"))
      pairs
        .join(sup.select(col("p").as("p1"), col("s").as("s1")), Seq("p1"))
        .join(sup.select(col("p").as("p2"), col("s").as("s2")), Seq("p2"))
        .crossJoin(broadcast(n0))
        // round BEFORE ordering: DuckDB's ORDER BY lift binds to the
        // round(...,6) OUTPUT alias, so raw lifts that collide at 6
        // decimals are ties there — ordering by the raw double would
        // pick different LIMIT-boundary rows (review find, r7)
        .withColumn("lift_raw", lift)
        .orderBy(round(col("lift_raw"), 6).desc, col("p1"), col("p2"))
        .limit(25)
        .select(col("p1"), col("p2"), col("n_both"), col("s1"), col("s2"),
          round(col("n_both").cast("double") / col("n"), 6).as("support"),
          round(col("n_both").cast("double") / col("s1"), 6).as("confidence"),
          round(col("lift_raw"), 6).as("lift"))
    },

    // ---- pairwise correlation matrix (EDA screen) ----
    // Pearson r for every pair of lineitem's numeric measures from ONE
    // corpus aggregation carrying all 4 sums + 10 cross-products as
    // exact DECIMAL moments (the q_ols_multi (15,4)×(19,4) pairing);
    // the 6 output rows are pure projections of that 1-row frame. The
    // first-look collinearity screen before any modeling — and the
    // moment layout is exactly what a 100-TB feature-stats job
    // materializes once and reuses for every downstream pair.
    {
      val cm = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val momentsSql = cm.zipWithIndex.map { case (c, i) =>
        s"sum(CAST($c AS DECIMAL(15,4))) AS s$i" }.mkString(",\n        |    ") +
        ",\n        |    " +
        (for (i <- cm.indices; j <- i until cm.size) yield
          s"sum(CAST(${cm(i)} AS DECIMAL(15,4)) * CAST(${cm(j)} AS DECIMAL(19,4))) AS p${i}_$j")
          .mkString(",\n        |    ")
      def rSql(i: Int, j: Int) =
        s"""round((CAST(n AS DOUBLE) * CAST(p${i}_$j AS DOUBLE)
           |         - CAST(s$i AS DOUBLE) * CAST(s$j AS DOUBLE))
           |        / sqrt((CAST(n AS DOUBLE) * CAST(p${i}_$i AS DOUBLE)
           |                - CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE))
           |               * (CAST(n AS DOUBLE) * CAST(p${j}_$j AS DOUBLE)
           |                  - CAST(s$j AS DOUBLE) * CAST(s$j AS DOUBLE))), 6)"""
          .stripMargin
      val rowsSql = (for (i <- cm.indices; j <- (i + 1) until cm.size) yield
        s"SELECT '${cm(i)}' AS col_a, '${cm(j)}' AS col_b,\n        |  ${rSql(i, j)} AS r FROM m")
        .mkString("\n        |UNION ALL ")
      sql(
        "q_corr_matrix",
        s"""WITH m AS (SELECT count(*) AS n,
          |    $momentsSql
          |  FROM lineitem)
          |SELECT col_a, col_b, r FROM ($rowsSql)
          |ORDER BY col_a, col_b""".stripMargin) { (s, dir) =>
        val d15 = (c: Column) => c.cast("decimal(15,4)")
        val d19 = (c: Column) => c.cast("decimal(19,4)")
        val aggs = cm.zipWithIndex.map { case (c, i) =>
          sum(d15(col(c))).as(s"s$i") } ++
          (for (i <- cm.indices; j <- i until cm.size) yield
            sum(d15(col(cm(i))) * d19(col(cm(j)))).as(s"p${i}_$j"))
        // r13 (guide §2.5, Tables.wide): the 10 decimal moment
        // products used to accumulate inside the serial one-task scan
        val m = Tables.wide(t(s, dir, "lineitem").select(cm.map(col): _*),
            cm.map(col): _*)
          .agg(count(lit(1)).as("n"), aggs: _*)
          .localCheckpoint() // 1 row, projected 6× below
        val dbl = (nm: String) => col(nm).cast("double")
        def rCol(i: Int, j: Int) =
          round((dbl("n") * dbl(s"p${i}_$j") - dbl(s"s$i") * dbl(s"s$j"))
            / sqrt((dbl("n") * dbl(s"p${i}_$i") - dbl(s"s$i") * dbl(s"s$i"))
              * (dbl("n") * dbl(s"p${j}_$j") - dbl(s"s$j") * dbl(s"s$j"))), 6)
        (for (i <- cm.indices; j <- (i + 1) until cm.size) yield
          m.select(lit(cm(i)).as("col_a"), lit(cm(j)).as("col_b"),
            rCol(i, j).as("r")))
          .reduce(_ unionByName _)
          .orderBy("col_a", "col_b")
      }
    },

    // ---- grouped simple regression (per-segment OLS line) ----
    // The per-SEGMENT companion to q_corr_matrix/q_ols_multi: slope,
    // intercept and R² of extendedprice on quantity per returnflag —
    // the "price per unit by segment" trend a feature-stats job emits
    // for every (segment, x, y) triple. Same exact-moment design as
    // the corr matrix (DECIMAL(15,4) × DECIMAL(19,4) products —
    // precision 34 ≤ 38, order-independent sums), but GROUPED: one
    // hash-partitioned aggregation to k rows, closed-form line math
    // on that frame. At 100 TB this is one shuffle of 6 decimals per
    // group — the grouped moments are also the incremental-update
    // state (mergeable), so daily maintenance is a partials merge,
    // not a rescan.
    sql(
      "q_ols_by_group",
      """WITH m AS (SELECT l_returnflag AS rf, CAST(count(*) AS BIGINT) AS n,
        |                  sum(CAST(l_quantity AS DECIMAL(15,4))) AS sx,
        |                  sum(CAST(l_extendedprice AS DECIMAL(15,4))) AS sy,
        |                  sum(CAST(l_quantity AS DECIMAL(15,4))
        |                      * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy,
        |                  sum(CAST(l_quantity AS DECIMAL(15,4))
        |                      * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
        |                  sum(CAST(l_extendedprice AS DECIMAL(15,4))
        |                      * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy
        |           FROM lineitem GROUP BY 1)
        |SELECT rf, n,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
        |  round((CAST(sy AS DOUBLE)
        |         - CAST(sx AS DOUBLE)
        |           * ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |              / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
        |        / n, 6) AS intercept,
        |  round(pow(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
        |        / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |           * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        |FROM m ORDER BY rf""".stripMargin) { (s, dir) =>
      val d15 = (c: Column) => c.cast("decimal(15,4)")
      val d19 = (c: Column) => c.cast("decimal(19,4)")
      val (x, y) = (col("l_quantity"), col("l_extendedprice"))
      val m = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("rf"))
        .agg(count(lit(1)).as("n"),
          sum(d15(x)).as("sx"), sum(d15(y)).as("sy"),
          sum(d15(x) * d19(y)).as("sxy"),
          sum(d15(x) * d19(x)).as("sxx"),
          sum(d15(y) * d19(y)).as("syy"))
      def dbl(nm: String) = col(nm).cast("double")
      val sxxN = col("n") * dbl("sxx") - dbl("sx") * dbl("sx")
      val sxyN = col("n") * dbl("sxy") - dbl("sx") * dbl("sy")
      val syyN = col("n") * dbl("syy") - dbl("sy") * dbl("sy")
      val slope = sxyN / sxxN
      m.select(col("rf"), col("n"),
          round(slope, 6).as("slope"),
          round((dbl("sy") - dbl("sx") * slope) / col("n"), 6).as("intercept"),
          round(pow(sxyN, 2) / (sxxN * syyN), 6).as("r2"))
        .orderBy("rf")
    },

    // ---- weighted quantiles (revenue-weighted order size) ----
    // "What quantity does the TYPICAL DOLLAR buy?" — the
    // weight-by-importance quantile family ExactQuantiles' unweighted
    // core can't express: the weighted p-quantile is the smallest
    // value whose cumulative weight reaches p·W. The corpus collapses
    // FIRST to the distinct value domain (≤ 50 quantities) with exact
    // DECIMAL weight sums, so the running-weight window is a
    // ~50-row frame at any corpus size. The p·W comparisons are
    // integer-scaled (4·cum ≥ W, 2·cum ≥ W, 4·cum ≥ 3·W) — exact
    // decimal multiplies, no fractional threshold to round.
    sql(
      "q_weighted_median",
      """WITH g AS (SELECT l_quantity AS q,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS w
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT q, w, sum(w) OVER (ORDER BY q) AS cum FROM g),
        |tot AS (SELECT CAST(sum(w) AS DECIMAL(38,2)) AS tw FROM g)
        |SELECT
        |  min(CASE WHEN 4 * cum >= (SELECT tw FROM tot) THEN q END) AS p25_w,
        |  min(CASE WHEN 2 * cum >= (SELECT tw FROM tot) THEN q END) AS p50_w,
        |  min(CASE WHEN 4 * cum >= 3 * (SELECT tw FROM tot) THEN q END) AS p75_w,
        |  (SELECT tw FROM tot) AS total_weight
        |FROM c""".stripMargin) { (s, dir) =>
      val g = t(s, dir, "lineitem")
        .groupBy(col("l_quantity").as("q"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,6)"))
          .cast("decimal(18,2)").as("w"))
        .localCheckpoint() // ≤ 50 rows: feeds the window AND the total
      // the one intentionally tiny global window (value-domain rows)
      val cum = g.withColumn("cum",
        sum("w").over(Window.orderBy("q")
          .rowsBetween(Window.unboundedPreceding, 0)))
      val tot = g.agg(sum("w").cast("decimal(38,2)").as("tw"))
      cum.crossJoin(broadcast(tot))
        .agg(
          min(when(col("cum") * 4 >= col("tw"), col("q"))).as("p25_w"),
          min(when(col("cum") * 2 >= col("tw"), col("q"))).as("p50_w"),
          min(when(col("cum") * 4 >= col("tw") * 3, col("q"))).as("p75_w"),
          first(col("tw")).as("total_weight"))
    },

    // ---- one-way ANOVA (between-group variance test) ----
    // Does the metric differ across segments at all? The F-test run
    // before any pairwise comparison (the k-group generalization of
    // q_ab_ttest): SSB/SSW from per-group exact DECIMAL moments —
    // ONE corpus aggregation to k rows, the partition math on that
    // frame with per-group terms DECIMAL-accumulated (k-row sums must
    // be merge-order-exact too), doubles only in the final F. Also
    // reports η² = SSB/SST, the effect size.
    sql(
      "q_anova_oneway",
      """WITH g AS (SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(15,4))) AS sx,
        |    sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(19,4))) AS sxx
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, sum(sx) AS s,
        |               CAST(count(*) AS BIGINT) AS k,
        |               sum(CAST(sxx AS DECIMAL(38,8))) AS sxx_t,
        |               sum(CAST(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |                        / n AS DECIMAL(38,10))) AS sb
        |        FROM g)
        |SELECT k, nn AS n,
        |  round(CAST(sb AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nn, 4) AS ssb,
        |  round(CAST(sxx_t AS DOUBLE) - CAST(sb AS DOUBLE), 4) AS ssw,
        |  k - 1 AS df1, nn - k AS df2,
        |  round((CAST(sb AS DOUBLE)
        |         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nn) / (k - 1)
        |        / ((CAST(sxx_t AS DOUBLE) - CAST(sb AS DOUBLE)) / (nn - k)), 6)
        |    AS f_stat,
        |  round((CAST(sb AS DOUBLE)
        |         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nn)
        |        / (CAST(sxx_t AS DOUBLE)
        |           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nn), 6) AS eta2
        |FROM tot""".stripMargin) { (s, dir) =>
      val d15 = (c: Column) => c.cast("decimal(15,4)")
      val d19 = (c: Column) => c.cast("decimal(19,4)")
      val g = t(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(d15(col("value"))).as("sx"),
          sum(d15(col("value")) * d19(col("value"))).as("sxx"))
      val tot = g.agg(sum("n").as("nn"), sum("sx").as("s"),
        count(lit(1)).as("k"),
        sum(col("sxx").cast("decimal(38,8)")).as("sxx_t"),
        sum((col("sx").cast("double") * col("sx").cast("double") / col("n"))
          .cast("decimal(38,10)")).as("sb"))
      val (sb, sD, sxxT) = (col("sb").cast("double"),
        col("s").cast("double"), col("sxx_t").cast("double"))
      val ssb = sb - sD * sD / col("nn")
      val ssw = sxxT - sb
      val sst = sxxT - sD * sD / col("nn")
      tot.select(col("k"), col("nn").as("n"),
        round(ssb, 4).as("ssb"), round(ssw, 4).as("ssw"),
        (col("k") - 1).as("df1"), (col("nn") - col("k")).as("df2"),
        round(ssb / (col("k") - 1) / (ssw / (col("nn") - col("k"))), 6)
          .as("f_stat"),
        round(ssb / sst, 6).as("eta2"))
    },

    // ---- audience overlap matrix (segment co-membership) ----
    // For every pair of behavior segments (users who did event type X
    // vs type Y): exact audience sizes, intersection, Jaccard, and the
    // overlap coefficient — the audience-dedup readout an ads/growth
    // stack runs before merging segments. The corpus collapses ONCE to
    // distinct (user, type); pair intersections come from the same
    // sorted-set i<j array transform as the basket miner (≤ T(T−1)/2
    // pairs per user at T=5 types), so there is ONE corpus shuffle and
    // the pair math runs on a 10-row frame. All ratios exact-integer
    // until one double division.
    sql(
      "q_audience_overlap",
      """WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
        |sup AS (SELECT event_type, CAST(count(*) AS BIGINT) AS s
        |        FROM b GROUP BY 1),
        |pairs AS (SELECT a.event_type AS ta, c.event_type AS tb,
        |                 CAST(count(*) AS BIGINT) AS n_both
        |          FROM b a JOIN b c ON c.user_id = a.user_id
        |                           AND c.event_type > a.event_type
        |          GROUP BY 1, 2)
        |SELECT p.ta, p.tb, s1.s AS n_a, s2.s AS n_b, p.n_both,
        |  round(CAST(p.n_both AS DOUBLE) / (s1.s + s2.s - p.n_both), 6)
        |    AS jaccard,
        |  round(CAST(p.n_both AS DOUBLE) / least(s1.s, s2.s), 6)
        |    AS overlap_coef
        |FROM pairs p JOIN sup s1 ON s1.event_type = p.ta
        |             JOIN sup s2 ON s2.event_type = p.tb
        |ORDER BY ta, tb""".stripMargin) { (s, dir) =>
      val baskets = t(s, dir, "events")
        .groupBy("user_id")
        .agg(sort_array(collect_set(col("event_type"))).as("ts"))
        .localCheckpoint() // feeds supports AND pair generation
      val sup = baskets.select(explode(col("ts")).as("event_type"))
        .groupBy("event_type").agg(count(lit(1)).as("s"))
      val pairs = baskets
        .where(size(col("ts")) >= 2)
        .select(explode(ijPairs(col("ts"), "ta", "tb")).as("z"))
        .select(col("z.ta").as("ta"), col("z.tb").as("tb"))
        .groupBy("ta", "tb")
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(sup.select(col("event_type").as("ta"),
          col("s").as("n_a"))), Seq("ta"))
        .join(broadcast(sup.select(col("event_type").as("tb"),
          col("s").as("n_b"))), Seq("tb"))
        .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("n_both"),
          round(col("n_both").cast("double")
            / (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"),
          round(col("n_both").cast("double")
            / least(col("n_a"), col("n_b")), 6).as("overlap_coef"))
        .orderBy("ta", "tb")
    },

    // ---- item-item collaborative filtering (cosine neighbors) ----
    // The recommender primitive one step past q_assoc_rules' lift:
    // cosine similarity of parts' order-membership vectors, which for
    // 0/1 baskets collapses to n_both/√(s_i·s_j) — so the WHOLE
    // computation rides the shared basketPairCounts core (one corpus
    // shuffle) plus a #parts support aggregate broadcast back. Top-3
    // neighbors per item from the symmetrized pair list via a
    // partitioned window; ranking uses the ROUNDED cosine (tiebreak
    // neighbor id) so a last-ulp sqrt difference can never flip the
    // cut.
    sql(
      "q_item_cf",
      s"""WITH $basketPairsSqlCtes,
        |sup AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS s FROM b GROUP BY 1),
        |e AS (SELECT p1 AS src, p2 AS dst, n_both FROM pairs WHERE n_both >= 2
        |      UNION ALL
        |      SELECT p2, p1, n_both FROM pairs WHERE n_both >= 2),
        |sc AS (SELECT e.src, e.dst, e.n_both,
        |         round(CAST(e.n_both AS DOUBLE)
        |               / sqrt(CAST(s1.s AS DOUBLE) * s2.s), 6) AS cosine
        |       FROM e JOIN sup s1 ON s1.l_partkey = e.src
        |              JOIN sup s2 ON s2.l_partkey = e.dst)
        |SELECT src, dst, n_both, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY src
        |             ORDER BY cosine DESC, dst) AS rn
        |  FROM sc)
        |WHERE rn <= 3 ORDER BY src, cosine DESC, dst""".stripMargin) { (s, dir) =>
      val (baskets, rawPairs) = basketPairCounts(s, dir)
      val sup = baskets.select(explode(col("ps")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("s"))
      val p2 = rawPairs.where(col("n_both") >= 2)
      val e = p2.select(col("p1").as("src"), col("p2").as("dst"), col("n_both"))
        .unionByName(
          p2.select(col("p2").as("src"), col("p1").as("dst"), col("n_both")))
      val sc = e
        .join(sup.select(col("p").as("src"), col("s").as("s1")), Seq("src"))
        .join(sup.select(col("p").as("dst"), col("s").as("s2")), Seq("dst"))
        .select(col("src"), col("dst"), col("n_both"),
          round(col("n_both").cast("double")
            / sqrt(col("s1").cast("double") * col("s2")), 6).as("cosine"))
      val rk = Window.partitionBy("src").orderBy(desc("cosine"), col("dst"))
      sc.withColumn("rn", row_number().over(rk))
        .where(col("rn") <= 3)
        .select(col("src"), col("dst"), col("n_both"), col("cosine"))
        .orderBy(col("src"), desc("cosine"), col("dst"))
    },

    // ---- delta-method ratio-metric readout (A/B suite) ----
    // Revenue-per-event is a RATIO of per-user sums, so its variance
    // is NOT the t-test's: Var(X̄/Ȳ) ≈ (σx² + r²σy² − 2rσxy)/(μy²·n)
    // by the delta method — the standard correction every experiment
    // platform applies to ratio metrics (per-user correlation between
    // numerator and denominator is exactly what the naive SE misses).
    // One corpus collapse to per-user (x, y), one moments row per
    // variant; cross-moments ride the mixed-width DECIMAL pairing.
    sql(
      "q_delta_method",
      """WITH u AS (SELECT user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2
        |      AS variant,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |                  THEN CAST(value AS DECIMAL(15,4))
        |                  ELSE CAST(0 AS DECIMAL(15,4)) END)
        |         AS DECIMAL(15,4)) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |m AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |        sum(x) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        sum(x * CAST(x AS DECIMAL(19,4))) AS sxx,
        |        sum(x * CAST(y AS DECIMAL(19,0))) AS sxy,
        |        CAST(sum(y * y) AS BIGINT) AS syy
        |      FROM u GROUP BY variant)
        |SELECT variant, n,
        |  round(CAST(sx AS DOUBLE) / sy, 6) AS ratio,
        |  round(sqrt(greatest(0.0,
        |      (CAST(sxx AS DOUBLE) / n
        |       - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
        |        / ((CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
        |      + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
        |        * (CAST(syy AS DOUBLE) / n
        |           - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
        |        / ((CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
        |      - 2 * (CAST(sx AS DOUBLE) / sy)
        |        * (CAST(sxy AS DOUBLE) / n
        |           - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
        |        / ((CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))) / n), 6)
        |    AS se_delta
        |FROM m ORDER BY variant""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      val zero = lit(0).cast("decimal(15,4)")
      val u = t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(15,4)")).otherwise(zero))
            .cast("decimal(15,4)").as("x"),
          count(lit(1)).as("y"))
        .withColumn("variant", h32(col("user_id").cast("string")) % 2)
      val m = u.groupBy("variant")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x").cast("decimal(19,4)")).as("sxx"),
          sum(col("x") * col("y").cast("decimal(19,0)")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
      val (n, sx, sy, sxx, sxy, syy) =
        (col("n"), col("sx").cast("double"), col("sy").cast("double"),
          col("sxx").cast("double"), col("sxy").cast("double"),
          col("syy").cast("double"))
      val r = sx / sy
      val my2 = (sy / n) * (sy / n)
      val varDelta =
        (sxx / n - (sx / n) * (sx / n)) / my2 +
          r * r * (syy / n - (sy / n) * (sy / n)) / my2 -
          lit(2) * r * (sxy / n - (sx / n) * (sy / n)) / my2
      m.select(col("variant"), col("n"),
          round(r, 6).as("ratio"),
          round(sqrt(greatest(lit(0.0), varDelta) / n), 6).as("se_delta"))
        .orderBy("variant")
    },

    // ---- winsorized robust aggregation ----
    // Clip the metric at its global [p1, p99] before aggregating —
    // the standard defense against a single corrupt row dragging a
    // mean (heavy-tailed `value` here). Bounds are exact interpolated
    // percentiles on a 1-row broadcast; clipping is per-row codegen;
    // raw and winsorized means accumulate in DECIMAL so the rounded
    // comparison is merge-order-exact.
    sql(
      "q_winsorize",
      """WITH p AS (SELECT quantile_cont(value, 0.01) AS lo,
        |                  quantile_cont(value, 0.99) AS hi FROM events),
        |w AS (SELECT event_type, value,
        |        least(greatest(value, (SELECT lo FROM p)), (SELECT hi FROM p)) AS wv
        |      FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4)
        |    AS raw_mean,
        |  round(CAST(sum(CAST(wv AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4)
        |    AS wins_mean,
        |  CAST(sum(CASE WHEN wv <> value THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  round((SELECT lo FROM p), 4) AS p01,
        |  round((SELECT hi FROM p), 4) AS p99
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      // exact p1/p99 via the sketch-guided selection core — a plain
      // exact percentile() buffers every value in one task (review
      // find, r7; ExactQuantiles scaladoc has the contract)
      val p = ExactQuantiles(ev, "value", Seq(0.01, 0.99), Seq("lo", "hi"))
        .select("lo", "hi")
      val w = ev.crossJoin(broadcast(p))
        .withColumn("wv", least(greatest(col("value"), col("lo")), col("hi")))
      w.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).as("sr"),
          sum(col("wv").cast("decimal(18,6)")).as("sw"),
          sum(when(col("wv") =!= col("value"), 1L).otherwise(0L)).as("n_clipped"),
          first("lo").as("lo"), first("hi").as("hi"))
        .select(col("event_type"), col("n"),
          round(col("sr").cast("double") / col("n"), 4).as("raw_mean"),
          round(col("sw").cast("double") / col("n"), 4).as("wins_mean"),
          col("n_clipped"),
          round(col("lo"), 4).as("p01"), round(col("hi"), 4).as("p99"))
        .orderBy("event_type")
    },

    // ---- Kaplan–Meier time-to-conversion survival curve ----
    // Survival analysis over the event stream: time from a user's
    // first event to their first purchase, right-censored at corpus
    // end for users who never convert. S(t) = Π_{u≤t} (1 − d_u/n_u);
    // the product runs as exp(Σ ln) over the ordered ≤#days frame
    // (ln terms are exact-rational inputs, frame-order accumulation —
    // deterministic on both engines), with an explicit absorbing-zero
    // guard for the step where the whole remaining risk set converts
    // (ln(0) would throw under ANSI). Corpus collapses to one row per
    // user, then to one row per distinct duration; censoring counts
    // ride the same frame.
    sql(
      "q_survival_km",
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
        |        CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
        |                  OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) = 1 THEN 0.0
        |             ELSE exp(sum(CASE WHEN d > 0 AND d < n_risk
        |                  THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk) ELSE 0.0 END)
        |                OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)) END AS surv
        |      FROM r)
        |SELECT dur AS t_days, n_risk, d AS n_events, round(surv, 6) AS survival
        |FROM k WHERE d > 0 ORDER BY t_days""".stripMargin) { (s, dir) =>
      // one row per user — feeds the censor horizon AND the durations
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
      // the one intentionally tiny global window (≤ #days rows)
      val wAll = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
      val wPrev = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
      val r = tt.crossJoin(broadcast(n0))
        .withColumn("n_risk",
          col("total") - coalesce(sum("ev").over(wPrev), lit(0L)))
      val k = r
        .withColumn("hit_zero",
          max(when(col("d") >= col("n_risk"), 1).otherwise(0)).over(wAll))
        .withColumn("surv",
          when(col("hit_zero") === 1, lit(0.0))
            .otherwise(exp(sum(
              when(col("d") > 0 && col("d") < col("n_risk"),
                log(lit(1.0) - col("d").cast("double") / col("n_risk")))
                .otherwise(lit(0.0))).over(wAll))))
      k.where(col("d") > 0)
        .select(col("dur").as("t_days"), col("n_risk"),
          col("d").as("n_events"), round(col("surv"), 6).as("survival"))
        .orderBy("t_days")
    },

    // ---- two-group log-rank test (Mantel–Cox) ----
    // The hypothesis test the survival pair (q_survival_km curve,
    // q_nelson_aalen hazard) was missing: are two arms' time-to-event
    // distributions the same? Mantel (1966)/Cox (1972): at each death
    // time, group 1's observed deaths vs the hypergeometric
    // expectation d·n₁/n given the risk sets; χ² = (O₁−E₁)²/V with
    // V = Σ d·n₁·(n−n₁)·(n−d)/(n²·(n−1)). Arms are the user-id parity
    // split (the q_ab_ttest convention), duration = days to first
    // purchase, right-censored at the corpus horizon (the
    // q_survival_km collapse, carried per arm). Output: one row per
    // death time (risk sets + deaths per arm, all BIGINT) with the
    // RUNNING O₁/E₁/V and χ² riding via ordered windows — ordered
    // accumulation is sequential in BOTH engines (the q_page_hinkley
    // parity argument), so the doubles agree bitwise; E/V terms are
    // single-expression products with EXPLICIT association order,
    // identical in both engines. Risk-set products go through DOUBLE
    // before multiplying (at 10⁶+ users the integer product d·n₁·
    // (n−n₁)·(n−d) would overflow BIGINT; doubles lose exactness but
    // identically on both sides). 100-TB story: one user-grain
    // collapse (partial+final agg), then every window runs on the
    // calendar-bounded death-time frame (≤ horizon days rows).
    sql(
      "q_logrank_test",
      """WITH u AS (SELECT user_id, min(ts) AS first_ts,
        |             min(CASE WHEN event_type = 'purchase' THEN ts END)
        |               AS conv_ts
        |           FROM events GROUP BY 1),
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
        |lr AS (SELECT dur, d, d1, n_risk, n_risk1,
        |         (CAST(d AS DOUBLE) * n_risk1) / n_risk AS e1,
        |         CASE WHEN n_risk > 1 THEN
        |           (((CAST(d AS DOUBLE) * n_risk1) * (n_risk - n_risk1))
        |              * (n_risk - d))
        |           / ((CAST(n_risk AS DOUBLE) * n_risk) * (n_risk - 1))
        |         ELSE 0.0e0 END AS vt
        |       FROM r WHERE d > 0),
        |f AS (SELECT dur, d, d1, n_risk, n_risk1,
        |        CAST(sum(d1) OVER w AS BIGINT) AS o1_cum,
        |        sum(e1) OVER w AS e1_cum,
        |        sum(vt) OVER w AS v_cum
        |      FROM lr WINDOW w AS (ORDER BY dur ROWS UNBOUNDED PRECEDING))
        |SELECT dur AS t_days, n_risk1, n_risk, d1 AS d1_events,
        |  d AS d_events, o1_cum, round(e1_cum, 6) AS e1_cum,
        |  round(v_cum, 6) AS v_cum,
        |  round((o1_cum - e1_cum) * (o1_cum - e1_cum) / v_cum, 6)
        |    AS chi2_running
        |FROM f ORDER BY t_days""".stripMargin) { (s, dir) =>
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
        .localCheckpoint() // death-time frame: ≤ horizon days rows
      val tot = tt.agg(sum("ev").cast("long").as("n_all"),
        sum("ev1").cast("long").as("n1_all"))
      val wPrev = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
      val r = tt.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("n_all") - coalesce(sum("ev").over(wPrev), lit(0L))
            .cast("long"))
        .withColumn("n_risk1",
          col("n1_all") - coalesce(sum("ev1").over(wPrev), lit(0L))
            .cast("long"))
      // association order matches the oracle expression exactly —
      // double products are IEEE-deterministic given the same order
      val e1 = (col("d").cast("double") * col("n_risk1")) / col("n_risk")
      val vt = when(col("n_risk") > 1,
        (((col("d").cast("double") * col("n_risk1"))
          * (col("n_risk") - col("n_risk1"))) * (col("n_risk") - col("d")))
          / ((col("n_risk").cast("double") * col("n_risk"))
            * (col("n_risk") - 1)))
        .otherwise(lit(0.0))
      val wAll = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, 0)
      val f = r.where(col("d") > 0)
        .withColumn("e1", e1).withColumn("vt", vt)
        .withColumn("o1_cum", sum("d1").over(wAll).cast("long"))
        .withColumn("e1_cum", sum("e1").over(wAll))
        .withColumn("v_cum", sum("vt").over(wAll))
      f.select(col("dur").as("t_days"), col("n_risk1"), col("n_risk"),
          col("d1").as("d1_events"), col("d").as("d_events"),
          col("o1_cum"), round(col("e1_cum"), 6).as("e1_cum"),
          round(col("v_cum"), 6).as("v_cum"),
          round((col("o1_cum") - col("e1_cum"))
            * (col("o1_cum") - col("e1_cum")) / col("v_cum"), 6)
            .as("chi2_running"))
        .orderBy("t_days")
    },

    // ---- Cochran's Q (k correlated binary treatments) ----
    // Cochran (1950): the k-sample extension of q_mcnemar and the
    // BINARY sibling of q_friedman_test — do the k event types have
    // the same per-user incidence, given each user is their own
    // block? The binary outcome is "type j is OVER-represented for
    // user i" (k·c_ij > R_i, strictly above the user's own mean
    // across types — integer-only, and non-degenerate by construction
    // on a corpus where every user touches every type, which had made
    // raw did-user-ever-emit incidence all-ones and Q's denominator
    // exactly zero). Q = (k−1)·(k·ΣC_j² − T²)/(k·T − ΣR_i²) — every
    // term is an exact BIGINT, ONE final division; χ²₍₄,.05₎ =
    // 9.487729036781154 rides as a pinned literal with the verdict as
    // a 0/1 column. A (user, type) pair with no events has no row and
    // an implicit x = 0 — identical on both engines. 100-TB story:
    // one corpus pass to the (user, type) grain, two keyed collapses,
    // 1-row math.
    sql(
      "q_cochran_q",
      """WITH c AS (SELECT user_id, event_type,
        |             CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1, 2),
        |kg AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS kg
        |       FROM events),
        |r AS (SELECT user_id, CAST(sum(cnt) AS BIGINT) AS rtot
        |      FROM c GROUP BY 1),
        |x AS (SELECT c.user_id, c.event_type,
        |        CASE WHEN kg.kg * c.cnt > r.rtot THEN 1 ELSE 0 END AS x
        |      FROM c JOIN r ON r.user_id = c.user_id CROSS JOIN kg),
        |rr AS (SELECT user_id, CAST(sum(x) AS BIGINT) AS ri
        |       FROM x GROUP BY 1),
        |cc AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS cj
        |       FROM x GROUP BY 1),
        |ag AS (SELECT CAST(sum(cj) AS BIGINT) AS t_all,
        |         CAST(sum(cj * cj) AS BIGINT) AS sc2,
        |         CAST(count(*) AS BIGINT) AS k FROM cc),
        |ar AS (SELECT CAST(sum(ri * ri) AS BIGINT) AS sr2,
        |         CAST(count(*) AS BIGINT) AS n_users FROM rr)
        |SELECT ag.k, ar.n_users, ag.t_all, ag.sc2, ar.sr2,
        |  round(((ag.k - 1) * CAST(ag.k * ag.sc2 - ag.t_all * ag.t_all
        |           AS DOUBLE)) / (ag.k * ag.t_all - ar.sr2), 6) + 0.0
        |    AS q_stat,
        |  CAST(ag.k - 1 AS BIGINT) AS df,
        |  CAST(CASE
        |       WHEN ag.k <> 5 THEN CAST(error(
        |         'q_cochran_q: chi2 reject literal pinned for k=5') AS BIGINT)
        |       WHEN ((ag.k - 1) * CAST(ag.k * ag.sc2
        |                    - ag.t_all * ag.t_all AS DOUBLE))
        |                 / (ag.k * ag.t_all - ar.sr2) > 9.487729036781154
        |       THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
        |FROM ag CROSS JOIN ar""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // (user, type) grain: row totals + x pass
      val r = c.groupBy("user_id").agg(sum("cnt").cast("long").as("rtot"))
      // The over-representation multiplier is the DATA's own type
      // cardinality (r11 ADVICE), so x always means "above the user's
      // own mean across types" — a hardcoded 5 would silently change
      // meaning if the corpus ever carried a different event-type set.
      val kg = t(s, dir, "events")
        .agg(count_distinct(col("event_type")).cast("long").as("kg"))
      val x = c.join(r, "user_id").crossJoin(broadcast(kg))
        .select(col("user_id"), col("event_type"),
          when(col("kg") * col("cnt") > col("rtot"), 1L)
            .otherwise(0L).as("x"))
        .localCheckpoint() // binary frame: both marginal collapses
      val rr = x.groupBy("user_id").agg(sum("x").cast("long").as("ri"))
      val cc = x.groupBy("event_type").agg(sum("x").cast("long").as("cj"))
      val ag = cc.agg(sum("cj").cast("long").as("t_all"),
        sum(col("cj") * col("cj")).cast("long").as("sc2"),
        count(lit(1)).as("k"))
      val ar = rr.agg(sum(col("ri") * col("ri")).cast("long").as("sr2"),
        count(lit(1)).as("n_users"))
      val q = ((col("k") - 1) * (col("k") * col("sc2")
        - col("t_all") * col("t_all")).cast("double"))
        ./((col("k") * col("t_all") - col("sr2")))
      // The reject literal is χ²(4, .05): if the type cardinality is
      // ever not 5, FAIL the query on both engines (the oracle SQL
      // carries the same guard via error()) instead of emitting a
      // verdict against the wrong null distribution.
      ag.crossJoin(broadcast(ar))
        .select(col("k"), col("n_users"), col("t_all"), col("sc2"),
          col("sr2"),
          (round(q, 6) + 0.0).as("q_stat"),
          (col("k") - 1).cast("long").as("df"),
          when(col("k") =!= 5, raise_error(
              lit("q_cochran_q: chi2 reject literal pinned for k=5")))
            .when(q > 9.487729036781154, lit(1L)).otherwise(lit(0L))
            .cast("long").as("reject_5pct"))
    },

    // ---- TOST equivalence test (two one-sided tests) ----
    // Schuirmann (1987): the test q_ab_ttest CANNOT give — failing to
    // reject "no difference" is not evidence of equivalence; TOST
    // nulls NON-equivalence (|Δ| ≥ δ) and rejects it only when BOTH
    // one-sided statistics clear the bound, the launch-gate read for
    // "the new variant does no harm within δ". Margin δ = 5 % of the
    // pooled mean (data-derived but deterministic — exact DECIMAL
    // total / count, the corpus's own scale); arms are the
    // q_ab_ttest parity split, per event type. With n ≈ corpus-sized
    // arms the one-sided t is normal to machine precision — the
    // z critical 1.6448536269514722 rides as a pinned literal (the
    // pinned-constant convention). Moments are exact DECIMAL; the
    // Welch SE and both t's are doubles with explicit association.
    // 100-TB story: one corpus pass to 2×#types moment rows, per-type
    // projection math.
    sql(
      "q_tost_equivalence",
      """WITH v AS (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS INT) % 2
        |               AS variant,
        |             CAST(value AS DECIMAL(18,6)) AS x
        |           FROM events),
        |s AS (SELECT event_type, variant, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS DECIMAL(38,6)) AS sx,
        |        CAST(sum(x * CAST(x AS DECIMAL(19,6))) AS DECIMAL(38,12))
        |          AS sxx
        |      FROM v GROUP BY 1, 2),
        |w AS (SELECT event_type, variant, n,
        |        CAST(sx AS DOUBLE) / n AS m,
        |        (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * n - n) AS v2
        |      FROM s),
        |p AS (SELECT a.event_type, a.n AS n_a, b.n AS n_b, a.m AS m_a,
        |        b.m AS m_b,
        |        0.05e0 * ((a.m * a.n + b.m * b.n) / (a.n + b.n)) AS delta,
        |        sqrt(a.v2 / a.n + b.v2 / b.n) AS se
        |      FROM w a JOIN w b
        |        ON a.event_type = b.event_type
        |       AND a.variant = 0 AND b.variant = 1)
        |SELECT event_type, n_a, n_b,
        |  round(m_a, 4) + 0.0 AS mean_a, round(m_b, 4) + 0.0 AS mean_b,
        |  round(m_b - m_a, 6) + 0.0 AS diff,
        |  round(delta, 6) + 0.0 AS delta_margin,
        |  round(((m_b - m_a) + delta) / se, 6) + 0.0 AS t_lower,
        |  round(((m_b - m_a) - delta) / se, 6) + 0.0 AS t_upper,
        |  CAST(CASE WHEN ((m_b - m_a) + delta) / se > 1.6448536269514722
        |             AND ((m_b - m_a) - delta) / se < -1.6448536269514722
        |       THEN 1 ELSE 0 END AS BIGINT) AS equivalent_5pct
        |FROM p ORDER BY event_type""".stripMargin) { (s, dir) =>
      val v = t(s, dir, "events")
        .select(col("event_type"),
          (get_json_object(col("props"), "$.k").cast("int") % 2)
            .as("variant"),
          col("value").cast("decimal(18,6)").as("x"))
      val sm = v.groupBy("event_type", "variant")
        .agg(count(lit(1)).as("n"),
          sum("x").cast("decimal(38,6)").as("sx"),
          sum(col("x") * col("x").cast("decimal(19,6)"))
            .cast("decimal(38,12)").as("sxx"))
      val w = sm.select(col("event_type"), col("variant"), col("n"),
        (col("sx").cast("double") / col("n")).as("m"),
        ((col("n") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
          / (col("n").cast("double") * col("n") - col("n"))).as("v2"))
        .localCheckpoint() // 2×#types rows, both sides of the pivot
      val a = w.where(col("variant") === 0)
        .select(col("event_type"), col("n").as("n_a"), col("m").as("m_a"),
          col("v2").as("v2_a"))
      val b = w.where(col("variant") === 1)
        .select(col("event_type").as("et_b"), col("n").as("n_b"),
          col("m").as("m_b"), col("v2").as("v2_b"))
      val p = a.join(b, col("event_type") === col("et_b"))
        .select(col("event_type"), col("n_a"), col("n_b"), col("m_a"),
          col("m_b"),
          (lit(0.05) * ((col("m_a") * col("n_a") + col("m_b") * col("n_b"))
            / (col("n_a") + col("n_b")))).as("delta"),
          sqrt(col("v2_a") / col("n_a") + col("v2_b") / col("n_b"))
            .as("se"))
      val tLo = ((col("m_b") - col("m_a")) + col("delta")) / col("se")
      val tHi = ((col("m_b") - col("m_a")) - col("delta")) / col("se")
      p.select(col("event_type"), col("n_a"), col("n_b"),
          (round(col("m_a"), 4) + 0.0).as("mean_a"),
          (round(col("m_b"), 4) + 0.0).as("mean_b"),
          (round(col("m_b") - col("m_a"), 6) + 0.0).as("diff"),
          (round(col("delta"), 6) + 0.0).as("delta_margin"),
          (round(tLo, 6) + 0.0).as("t_lower"),
          (round(tHi, 6) + 0.0).as("t_upper"),
          when(tLo > 1.6448536269514722 && tHi < -1.6448536269514722, 1L)
            .otherwise(0L).as("equivalent_5pct"))
        .orderBy("event_type")
    },

    // ---- multivariate OLS via normal equations ----
    // Two-feature linear regression (extendedprice ~ quantity +
    // discount, per returnflag) solved in closed form from sufficient
    // statistics: ONE corpus aggregation collapses each group to its
    // 10 exact DECIMAL moments (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2²,
    // Σx1y, Σx2y, Σy²); the 2×2 centered normal system solves by
    // Cramer's rule in a per-group projection. This is THE scalable
    // regression shape — at 100 TB the moment vector is still 10
    // numbers per group and the solve is free; no per-row second pass,
    // no gradient iterations. Cross-products use the (15,4)×(19,4)
    // decimal pairing (q_autocorr parity note: DuckDB widens to the
    // widest operand's physical type, Spark truncates scale past
    // p=38 — 15+19+1=35 is exact on both engines), so the double
    // arithmetic on both sides starts from bit-identical moments.
    sql(
      "q_ols_multi",
      """WITH m AS (SELECT l_returnflag AS rf, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))) AS s1,
        |    sum(CAST(l_discount AS DECIMAL(15,4))) AS s2,
        |    sum(CAST(l_extendedprice AS DECIMAL(15,4))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))
        |        * CAST(l_quantity AS DECIMAL(19,4))) AS s11,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))
        |        * CAST(l_discount AS DECIMAL(19,4))) AS s12,
        |    sum(CAST(l_discount AS DECIMAL(15,4))
        |        * CAST(l_discount AS DECIMAL(19,4))) AS s22,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))
        |        * CAST(l_extendedprice AS DECIMAL(19,4))) AS s1y,
        |    sum(CAST(l_discount AS DECIMAL(15,4))
        |        * CAST(l_extendedprice AS DECIMAL(19,4))) AS s2y,
        |    sum(CAST(l_extendedprice AS DECIMAL(15,4))
        |        * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT rf, n,
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
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS syc,
        |    CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
        |    CAST(sy AS DOUBLE) AS dy
        |  FROM m),
        |b AS (SELECT rf, n, d1, d2, dy, b1, b2, syc,
        |    (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) AS beta1,
        |    (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12) AS beta2
        |  FROM c)
        |SELECT rf, CAST(n AS BIGINT) AS n,
        |  round((dy - beta1 * d1 - beta2 * d2) / CAST(n AS DOUBLE), 6) AS beta0,
        |  round(beta1, 6) AS beta1, round(beta2, 6) AS beta2,
        |  round((beta1 * b1 + beta2 * b2) / syc, 6) AS r2
        |FROM b ORDER BY rf""".stripMargin) { (s, dir) =>
      val d15 = (c: Column) => c.cast("decimal(15,4)")
      val d19 = (c: Column) => c.cast("decimal(19,4)")
      val x1 = col("l_quantity"); val x2 = col("l_discount")
      val y = col("l_extendedprice")
      // r13 (guide §2.5, Tables.wide): 10 decimal moment products per
      // row ran inside the serial one-task scan
      val lin = Tables.wide(
        t(s, dir, "lineitem").select(col("l_returnflag"), x1, x2, y),
        x1, x2, y)
      val m = lin.groupBy(col("l_returnflag").as("rf"))
        .agg(count(lit(1)).as("n"),
          sum(d15(x1)).as("s1"), sum(d15(x2)).as("s2"), sum(d15(y)).as("sy"),
          sum(d15(x1) * d19(x1)).as("s11"), sum(d15(x1) * d19(x2)).as("s12"),
          sum(d15(x2) * d19(x2)).as("s22"), sum(d15(x1) * d19(y)).as("s1y"),
          sum(d15(x2) * d19(y)).as("s2y"), sum(d15(y) * d19(y)).as("syy"))
      val dbl = (n: String) => col(n).cast("double")
      val nD = dbl("n")
      val a11 = nD * dbl("s11") - dbl("s1") * dbl("s1")
      val a12 = nD * dbl("s12") - dbl("s1") * dbl("s2")
      val a22 = nD * dbl("s22") - dbl("s2") * dbl("s2")
      val b1 = nD * dbl("s1y") - dbl("s1") * dbl("sy")
      val b2 = nD * dbl("s2y") - dbl("s2") * dbl("sy")
      val syc = nD * dbl("syy") - dbl("sy") * dbl("sy")
      val det = a11 * a22 - a12 * a12
      val c0 = m.select(col("rf"), col("n"), dbl("s1").as("d1"),
        dbl("s2").as("d2"), dbl("sy").as("dy"), b1.as("b1"), b2.as("b2"),
        syc.as("syc"),
        ((b1 * a22 - b2 * a12) / det).as("beta1"),
        ((a11 * b2 - a12 * b1) / det).as("beta2"))
      c0.select(col("rf"), col("n"),
          round((col("dy") - col("beta1") * col("d1")
            - col("beta2") * col("d2")) / col("n").cast("double"), 6).as("beta0"),
          round(col("beta1"), 6).as("beta1"), round(col("beta2"), 6).as("beta2"),
          round((col("beta1") * col("b1") + col("beta2") * col("b2"))
            / col("syc"), 6).as("r2"))
        .orderBy("rf")
    },

    // ---- ridge regularization path (standardized closed form) ----
    // q_ols_multi with an L2 penalty on the STANDARDIZED system: the
    // centered moments are reduced to correlations (r12, r1y, r2y),
    // ridge adds λ to the unit diagonal — [1+λ, r; r, 1+λ]·β* = rhs,
    // solved by Cramer — and standardized coefficients map back
    // through √(Syy/Sxx). Standardizing makes λ ∈ {0, 0.5, 2}
    // meaningful at EVERY corpus size (the raw centered system grows
    // like n², so a raw-scale λ would silently stop regularizing at
    // 100×); λ = 0 reproduces OLS exactly, pinning the path's anchor
    // against q_ols_multi's already-verified solve. Same one-pass
    // DECIMAL moment collapse — the λ ladder is a 3-row broadcast
    // fan-out over the 1-row moment frame, so the whole path costs
    // ONE corpus aggregation regardless of how many λs ride it.
    sql(
      "q_ridge_path",
      """WITH m AS (SELECT count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))) AS s1,
        |    sum(CAST(l_discount AS DECIMAL(15,4))) AS s2,
        |    sum(CAST(l_extendedprice AS DECIMAL(15,4))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))
        |        * CAST(l_quantity AS DECIMAL(19,4))) AS s11,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))
        |        * CAST(l_discount AS DECIMAL(19,4))) AS s12,
        |    sum(CAST(l_discount AS DECIMAL(15,4))
        |        * CAST(l_discount AS DECIMAL(19,4))) AS s22,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))
        |        * CAST(l_extendedprice AS DECIMAL(19,4))) AS s1y,
        |    sum(CAST(l_discount AS DECIMAL(15,4))
        |        * CAST(l_extendedprice AS DECIMAL(19,4))) AS s2y,
        |    sum(CAST(l_extendedprice AS DECIMAL(15,4))
        |        * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy
        |  FROM lineitem),
        |c AS (SELECT CAST(n AS BIGINT) AS n,
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
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS syc,
        |    CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
        |    CAST(sy AS DOUBLE) AS dy
        |  FROM m),
        |r AS (SELECT n, d1, d2, dy, a11, a22, syc,
        |    a12 / (sqrt(a11) * sqrt(a22)) AS r12,
        |    b1 / (sqrt(a11) * sqrt(syc)) AS r1y,
        |    b2 / (sqrt(a22) * sqrt(syc)) AS r2y
        |  FROM c),
        |lam(lambda) AS (VALUES (0e0), (0.5e0), (2e0)),
        |sol AS (SELECT lambda, n, d1, d2, dy, a11, a22, syc,
        |    ((1 + lambda) * r1y - r12 * r2y)
        |      / ((1 + lambda) * (1 + lambda) - r12 * r12) AS bs1,
        |    ((1 + lambda) * r2y - r12 * r1y)
        |      / ((1 + lambda) * (1 + lambda) - r12 * r12) AS bs2
        |  FROM r CROSS JOIN lam)
        |SELECT lambda, round(bs1, 6) AS beta1_std, round(bs2, 6) AS beta2_std,
        |  round(bs1 * (sqrt(syc) / sqrt(a11)), 6) AS beta1,
        |  round(bs2 * (sqrt(syc) / sqrt(a22)), 6) AS beta2,
        |  round((dy - (bs1 * (sqrt(syc) / sqrt(a11))) * d1
        |            - (bs2 * (sqrt(syc) / sqrt(a22))) * d2) / CAST(n AS DOUBLE), 6) AS beta0
        |FROM sol ORDER BY lambda""".stripMargin) { (s, dir) =>
      val d15 = (c: Column) => c.cast("decimal(15,4)")
      val d19 = (c: Column) => c.cast("decimal(19,4)")
      val x1 = col("l_quantity"); val x2 = col("l_discount")
      val y = col("l_extendedprice")
      // r13 (guide §2.5, Tables.wide): shuffle-width moment pass
      val m = Tables.wide(t(s, dir, "lineitem").select(x1, x2, y), x1, x2, y)
        .agg(count(lit(1)).as("n"),
          sum(d15(x1)).as("s1"), sum(d15(x2)).as("s2"), sum(d15(y)).as("sy"),
          sum(d15(x1) * d19(x1)).as("s11"), sum(d15(x1) * d19(x2)).as("s12"),
          sum(d15(x2) * d19(x2)).as("s22"), sum(d15(x1) * d19(y)).as("s1y"),
          sum(d15(x2) * d19(y)).as("s2y"), sum(d15(y) * d19(y)).as("syy"))
      val dbl = (nm: String) => col(nm).cast("double")
      val nD = dbl("n")
      val c0 = m.select(col("n").cast("long").as("n"),
        (nD * dbl("s11") - dbl("s1") * dbl("s1")).as("a11"),
        (nD * dbl("s12") - dbl("s1") * dbl("s2")).as("a12"),
        (nD * dbl("s22") - dbl("s2") * dbl("s2")).as("a22"),
        (nD * dbl("s1y") - dbl("s1") * dbl("sy")).as("b1"),
        (nD * dbl("s2y") - dbl("s2") * dbl("sy")).as("b2"),
        (nD * dbl("syy") - dbl("sy") * dbl("sy")).as("syc"),
        dbl("s1").as("d1"), dbl("s2").as("d2"), dbl("sy").as("dy"))
      val r = c0.select(col("n"), col("d1"), col("d2"), col("dy"),
        col("a11"), col("a22"), col("syc"),
        (col("a12") / (sqrt(col("a11")) * sqrt(col("a22")))).as("r12"),
        (col("b1") / (sqrt(col("a11")) * sqrt(col("syc")))).as("r1y"),
        (col("b2") / (sqrt(col("a22")) * sqrt(col("syc")))).as("r2y"))
      val lam = s.range(1).select(
        explode(array(lit(0.0), lit(0.5), lit(2.0))).as("lambda"))
      // NB: operator must end the line — a leading `-` on the
      // continuation line parses as a separate unary-minus statement
      // and silently drops the r12² term (caught by the oracle gate:
      // λ=0 stopped reproducing OLS)
      val det = (lit(1) + col("lambda")) * (lit(1) + col("lambda")) -
        col("r12") * col("r12")
      val sol = broadcast(r).crossJoin(lam)
        .select(col("lambda"), col("n"), col("d1"), col("d2"), col("dy"),
          col("a11"), col("a22"), col("syc"),
          (((lit(1) + col("lambda")) * col("r1y") - col("r12") * col("r2y"))
            / det).as("bs1"),
          (((lit(1) + col("lambda")) * col("r2y") - col("r12") * col("r1y"))
            / det).as("bs2"))
      val sc1 = sqrt(col("syc")) / sqrt(col("a11"))
      val sc2 = sqrt(col("syc")) / sqrt(col("a22"))
      sol.select(col("lambda"),
          round(col("bs1"), 6).as("beta1_std"),
          round(col("bs2"), 6).as("beta2_std"),
          round(col("bs1") * sc1, 6).as("beta1"),
          round(col("bs2") * sc2, 6).as("beta2"),
          round((col("dy") - col("bs1") * sc1 * col("d1")
            - col("bs2") * sc2 * col("d2")) / col("n").cast("double"), 6)
            .as("beta0"))
        .orderBy("lambda")
    },

    // ---- Wilcoxon signed-rank (paired two-sample test) ----
    // The PAIRED complement to q_auc_mannwhitney's unpaired U: each
    // user contributes one before/after difference (first-half vs
    // second-half mean event value); |d| is ranked with average ranks
    // (rank + (ties−1)/2 — exact integer window arithmetic on the
    // ROUND-6 d, the repo's tie-stability convention), W⁺ sums the
    // positive-d ranks, and the normal approximation carries the
    // tie-correction term Σ(t³−t)/48. Corpus collapses ONCE to a
    // per-user pair; the ranking runs on the #users frame.
    sql(
      "q_wilcoxon_signed_rank",
      """WITH b AS (SELECT epoch_us(min(ts))
        |                  + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS mid
        |           FROM events),
        |u AS (SELECT user_id,
        |        CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
        |                 THEN CAST(value AS DECIMAL(18,6))
        |                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS s1,
        |        CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |        CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b)
        |                 THEN CAST(value AS DECIMAL(18,6))
        |                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS s2,
        |        CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b)
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |      FROM events GROUP BY user_id),
        |d AS (SELECT round(CAST(s2 AS DOUBLE) / n2
        |             - CAST(s1 AS DOUBLE) / n1, 6) AS d
        |      FROM u WHERE n1 > 0 AND n2 > 0),
        |nz AS (SELECT d, abs(d) AS ad FROM d WHERE d <> 0),
        |r AS (SELECT d, ad,
        |        rank() OVER (ORDER BY ad) AS rk,
        |        CAST(count(*) OVER (PARTITION BY ad) AS BIGINT) AS t
        |      FROM nz),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        sum(CASE WHEN d > 0 THEN rk + (t - 1) / 2.0 ELSE 0 END) AS wp,
        |        sum(CASE WHEN d < 0 THEN rk + (t - 1) / 2.0 ELSE 0 END) AS wm
        |      FROM r),
        |tc AS (SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tie
        |       FROM (SELECT ad, CAST(count(*) AS BIGINT) AS t
        |             FROM nz GROUP BY ad) g WHERE t > 1)
        |SELECT n, round(wp, 1) AS w_plus, round(wm, 1) AS w_minus,
        |  round((wp - n * (n + 1) / 4.0)
        |        / sqrt(n * (n + 1) * (2 * n + 1) / 24.0
        |               - (SELECT tie FROM tc) / 48.0), 6) AS z_approx
        |FROM a""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val b = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
        .select((unix_micros(col("t0"))
          + expr("(unix_micros(t1) - unix_micros(t0)) div 2")).as("mid_us"))
      val dz = lit(0).cast("decimal(18,6)")
      val pre = unix_micros(col("ts")) < col("mid_us")
      val u = ev.crossJoin(broadcast(b))
        .groupBy("user_id")
        .agg(sum(when(pre, col("value").cast("decimal(18,6)")).otherwise(dz))
          .cast("decimal(38,6)").as("s1"),
          sum(when(pre, 1L).otherwise(0L)).as("n1"),
          sum(when(!pre, col("value").cast("decimal(18,6)")).otherwise(dz))
            .cast("decimal(38,6)").as("s2"),
          sum(when(!pre, 1L).otherwise(0L)).as("n2"))
      val d = u.where(col("n1") > 0 && col("n2") > 0)
        .select(round(col("s2").cast("double") / col("n2")
          - col("s1").cast("double") / col("n1"), 6).as("d"))
        .where(col("d") =!= 0)
        .withColumn("ad", abs(col("d")))
        .localCheckpoint() // #users rows: ranks + tie groups
      val r = d
        .withColumn("rk", rank().over(Window.orderBy("ad")))
        .withColumn("t", count(lit(1)).over(Window.partitionBy("ad")).cast("long"))
      val avgRk = col("rk") + (col("t") - 1) / 2.0
      val a = r.agg(count(lit(1)).as("n"),
        sum(when(col("d") > 0, avgRk).otherwise(0.0)).as("wp"),
        sum(when(col("d") < 0, avgRk).otherwise(0.0)).as("wm"))
      val tc = d.groupBy("ad").agg(count(lit(1)).as("t"))
        .where(col("t") > 1)
        .agg(coalesce(sum(col("t") * col("t") * col("t") - col("t")), lit(0L))
          .cast("long").as("tie"))
      a.crossJoin(broadcast(tc))
        .select(col("n"), round(col("wp"), 1).as("w_plus"),
          round(col("wm"), 1).as("w_minus"),
          round((col("wp") - col("n") * (col("n") + 1) / 4.0)
            / sqrt(col("n") * (col("n") + 1) * (lit(2) * col("n") + 1) / 24.0
              - col("tie") / 48.0), 6).as("z_approx"))
    },

    // ---- partial correlation (controlling for a covariate) ----
    // r(quantity, price | discount) and r(discount, price | quantity)
    // from ONE corpus pass of exact DECIMAL moments — does the
    // quantity–price relationship survive controlling for discount?
    // The raw pairwise r's ride along so the collider/confounder
    // story is readable from the row. Same one-pass-moments design
    // as q_corr_matrix; the partial-corr algebra runs on a 1-row
    // frame.
    sql(
      "q_partial_corr",
      """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(15,4))) AS DECIMAL(38,4)) AS s1,
        |    CAST(sum(CAST(l_discount AS DECIMAL(15,4))) AS DECIMAL(38,4)) AS s2,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4))) AS DECIMAL(38,4)) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(15,4))
        |             * CAST(l_quantity AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s11,
        |    CAST(sum(CAST(l_discount AS DECIMAL(15,4))
        |             * CAST(l_discount AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s22,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4))
        |             * CAST(l_extendedprice AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(15,4))
        |             * CAST(l_discount AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s12,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(15,4))
        |             * CAST(l_extendedprice AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s1y,
        |    CAST(sum(CAST(l_discount AS DECIMAL(15,4))
        |             * CAST(l_extendedprice AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s2y
        |  FROM lineitem),
        |c AS (SELECT
        |    (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / n)
        |      / sqrt((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
        |             * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)) AS r1y,
        |    (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / n)
        |      / sqrt((CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
        |             * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)) AS r2y,
        |    (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
        |      / sqrt((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
        |             * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)) AS r12
        |  FROM m)
        |SELECT round(r1y, 6) AS r_qty_price, round(r2y, 6) AS r_disc_price,
        |  round(r12, 6) AS r_qty_disc,
        |  round((r1y - r12 * r2y) / sqrt((1 - r12 * r12) * (1 - r2y * r2y)), 6)
        |    AS partial_qty_price,
        |  round((r2y - r12 * r1y) / sqrt((1 - r12 * r12) * (1 - r1y * r1y)), 6)
        |    AS partial_disc_price
        |FROM c""".stripMargin) { (s, dir) =>
      // d15 × d19 keeps DuckDB's decimal multiply on the int128 path
      // (18,6 × 18,6 overflows its int64 fast path — the q_corr_matrix
      // width convention)
      def d15(c: Column) = c.cast("decimal(15,4)")
      def d19(c: Column) = c.cast("decimal(19,4)")
      // r13 (guide §2.5, Tables.wide): shuffle-width moment pass
      val m = Tables.wide(t(s, dir, "lineitem")
          .select(col("l_quantity"), col("l_discount"), col("l_extendedprice")),
          col("l_quantity"), col("l_discount"), col("l_extendedprice")).agg(
        count(lit(1)).as("n"),
        sum(d15(col("l_quantity"))).cast("decimal(38,4)").as("s1"),
        sum(d15(col("l_discount"))).cast("decimal(38,4)").as("s2"),
        sum(d15(col("l_extendedprice"))).cast("decimal(38,4)").as("sy"),
        sum(d15(col("l_quantity")) * d19(col("l_quantity")))
          .cast("decimal(38,8)").as("s11"),
        sum(d15(col("l_discount")) * d19(col("l_discount")))
          .cast("decimal(38,8)").as("s22"),
        sum(d15(col("l_extendedprice")) * d19(col("l_extendedprice")))
          .cast("decimal(38,8)").as("syy"),
        sum(d15(col("l_quantity")) * d19(col("l_discount")))
          .cast("decimal(38,8)").as("s12"),
        sum(d15(col("l_quantity")) * d19(col("l_extendedprice")))
          .cast("decimal(38,8)").as("s1y"),
        sum(d15(col("l_discount")) * d19(col("l_extendedprice")))
          .cast("decimal(38,8)").as("s2y"))
      def cen(sxy: String, sx: String, sy: String) =
        col(sxy).cast("double") - col(sx).cast("double") * col(sy).cast("double") / col("n")
      def cor(sxy: String, sx: String, sxx: String, sy: String, syy: String) =
        cen(sxy, sx, sy) / sqrt(
          (col(sxx).cast("double") - col(sx).cast("double") * col(sx).cast("double") / col("n"))
            * (col(syy).cast("double") - col(sy).cast("double") * col(sy).cast("double") / col("n")))
      val c = m.select(
        cor("s1y", "s1", "s11", "sy", "syy").as("r1y"),
        cor("s2y", "s2", "s22", "sy", "syy").as("r2y"),
        cor("s12", "s1", "s11", "s2", "s22").as("r12"))
      c.select(round(col("r1y"), 6).as("r_qty_price"),
        round(col("r2y"), 6).as("r_disc_price"),
        round(col("r12"), 6).as("r_qty_disc"),
        round((col("r1y") - col("r12") * col("r2y"))
          / sqrt((lit(1) - col("r12") * col("r12"))
            * (lit(1) - col("r2y") * col("r2y"))), 6).as("partial_qty_price"),
        round((col("r2y") - col("r12") * col("r1y"))
          / sqrt((lit(1) - col("r12") * col("r12"))
            * (lit(1) - col("r1y") * col("r1y"))), 6).as("partial_disc_price"))
    },

    // ---- Jarque–Bera normality test (per event type) ----
    // Skewness/kurtosis-based normality screen from one pass of four
    // exact DECIMAL moments per group: JB = n/6·(S² + K²/4) with
    // excess kurtosis K — the cheap "is this metric Gaussian enough
    // for the z-tests downstream" gate. The moment collapse is the
    // whole corpus cost; the JB algebra is a per-group projection.
    sql(
      "q_jarque_bera",
      """WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))
        |             * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS s2,
        |    CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |             * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS s3,
        |    CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |             * CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
        |         AS DECIMAL(38,12)) AS s4
        |  FROM events GROUP BY 1),
        |c AS (SELECT event_type, n,
        |    CAST(s1 AS DOUBLE) / n AS mu,
        |    CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS v,
        |    CAST(s2 AS DOUBLE) AS m2r, CAST(s3 AS DOUBLE) AS m3r,
        |    CAST(s4 AS DOUBLE) AS m4r, CAST(s1 AS DOUBLE) AS m1r
        |  FROM m),
        |k AS (SELECT event_type, n, mu, v,
        |    (m3r / n - 3 * mu * (m2r / n) + 2 * mu * mu * mu) / power(v, 1.5) AS skew,
        |    (m4r / n - 4 * mu * (m3r / n) + 6 * mu * mu * (m2r / n)
        |     - 3 * mu * mu * mu * mu) / (v * v) - 3 AS exkurt
        |  FROM c)
        |SELECT event_type, n, round(skew, 6) AS skewness,
        |  round(exkurt, 6) AS excess_kurtosis,
        |  round(n / 6.0 * (skew * skew + exkurt * exkurt / 4.0), 4) AS jb_stat,
        |  CAST(n / 6.0 * (skew * skew + exkurt * exkurt / 4.0) > 5.991 AS BOOLEAN)
        |    AS reject_normal
        |FROM k ORDER BY event_type""".stripMargin) { (s, dir) =>
      def d6(c: Column) = c.cast("decimal(18,6)")
      val v = d6(col("value"))
      val m = t(s, dir, "events").groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(v).cast("decimal(38,6)").as("s1"),
        sum(v * v).cast("decimal(38,12)").as("s2"),
        sum(v * v * v).cast("decimal(38,12)").as("s3"),
        sum(v * v * v * v).cast("decimal(38,12)").as("s4"))
      val mu = col("s1").cast("double") / col("n")
      val vr = col("s2").cast("double") / col("n") - mu * mu
      val skew = (col("s3").cast("double") / col("n")
        - lit(3) * mu * (col("s2").cast("double") / col("n"))
        + lit(2) * mu * mu * mu) / pow(vr, 1.5)
      val exk = (col("s4").cast("double") / col("n")
        - lit(4) * mu * (col("s3").cast("double") / col("n"))
        + lit(6) * mu * mu * (col("s2").cast("double") / col("n"))
        - lit(3) * mu * mu * mu * mu) / (vr * vr) - lit(3)
      val k = m.select(col("event_type"), col("n"),
        skew.as("skew"), exk.as("exkurt"))
      val jb = col("n") / 6.0 * (col("skew") * col("skew")
        + col("exkurt") * col("exkurt") / 4.0)
      k.select(col("event_type"), col("n"),
          round(col("skew"), 6).as("skewness"),
          round(col("exkurt"), 6).as("excess_kurtosis"),
          round(jb, 4).as("jb_stat"),
          (jb > 5.991).as("reject_normal"))
        .orderBy("event_type")
    },

    // ---- Benjamini–Hochberg FDR across a metric family ----
    // The multiple-comparisons gate every experimentation platform
    // needs: one two-sample z-test per event_type (arms split by
    // user_id parity), then BH step-up at α=0.10 across the family.
    // Φ is the Bowling (2009) logistic approximation — identical
    // closed-form arithmetic in both engines (neither has erf).
    // ONE corpus pass to the per-type conditional moments; every
    // rank/threshold step runs on the #types frame.
    sql(
      "q_bh_fdr",
      """WITH m AS (SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS s0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS s1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0
        |             THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(38,12)) END) AS DECIMAL(38,12)) AS q0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1
        |             THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(38,12)) END) AS DECIMAL(38,12)) AS q1
        |  FROM events GROUP BY 1),
        |z AS (SELECT event_type, n0, n1,
        |    (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
        |      / sqrt((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / n0)
        |               / (n0 - 1) / n0
        |             + (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
        |               / (n1 - 1) / n1) AS zs
        |  FROM m),
        |p AS (SELECT event_type, n0, n1, zs,
        |    round(2.0 / (1.0 + exp(0.07056 * abs(zs) * abs(zs) * abs(zs)
        |                           + 1.5976 * abs(zs))), 6) AS p6
        |  FROM z),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY p6, event_type) AS BIGINT) AS i,
        |        CAST(count(*) OVER () AS BIGINT) AS fam
        |      FROM p),
        |k AS (SELECT coalesce(max(CASE WHEN p6 <= i * 0.10 / fam THEN i END), 0) AS kmax
        |      FROM r)
        |SELECT event_type, n0, n1, round(zs, 6) AS z_stat, p6 AS p_approx,
        |  i AS p_rank, round(i * 0.10 / fam, 6) AS bh_cutoff,
        |  CAST(i <= (SELECT kmax FROM k) AS BOOLEAN) AS reject
        |FROM r ORDER BY event_type""".stripMargin) { (s, dir) =>
      val d6v = col("value").cast("decimal(18,6)")
      val dz6 = lit(0).cast("decimal(18,6)")
      val dz12 = lit(0).cast("decimal(38,12)")
      val a0 = col("user_id") % 2 === 0
      val m = t(s, dir, "events").groupBy("event_type").agg(
        sum(when(a0, 1L).otherwise(0L)).as("n0"),
        sum(when(!a0, 1L).otherwise(0L)).as("n1"),
        sum(when(a0, d6v).otherwise(dz6)).cast("decimal(38,6)").as("s0"),
        sum(when(!a0, d6v).otherwise(dz6)).cast("decimal(38,6)").as("s1"),
        sum(when(a0, d6v * d6v).otherwise(dz12)).cast("decimal(38,12)").as("q0"),
        sum(when(!a0, d6v * d6v).otherwise(dz12)).cast("decimal(38,12)").as("q1"))
      def dd(c: String) = col(c).cast("double")
      val se = sqrt((dd("q0") - dd("s0") * dd("s0") / col("n0"))
          / (col("n0") - 1) / col("n0")
        + (dd("q1") - dd("s1") * dd("s1") / col("n1"))
          / (col("n1") - 1) / col("n1"))
      val zs = (dd("s1") / col("n1") - dd("s0") / col("n0")) / se
      val az = abs(col("zs"))
      val p = m.select(col("event_type"), col("n0"), col("n1"), zs.as("zs"))
        .withColumn("p6",
          round(lit(2.0) / (lit(1.0) + exp(lit(0.07056) * az * az * az
            + lit(1.5976) * az)), 6))
        .localCheckpoint() // #types rows — ranked and re-joined below
      val r = p
        .withColumn("i", row_number()
          .over(Window.orderBy("p6", "event_type")).cast("long"))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("fam"))))
      val kmax = r.agg(coalesce(
        max(when(col("p6") <= col("i") * 0.10 / col("fam"), col("i"))),
        lit(0L)).as("kmax"))
      r.crossJoin(broadcast(kmax))
        .select(col("event_type"), col("n0"), col("n1"),
          round(col("zs"), 6).as("z_stat"), col("p6").as("p_approx"),
          col("i").as("p_rank"),
          round(col("i") * 0.10 / col("fam"), 6).as("bh_cutoff"),
          (col("i") <= col("kmax")).as("reject"))
        .orderBy("event_type")
    },

    // ---- Huber M-estimator (robust mean, 2 unrolled IRLS rounds) ----
    // The outlier-robust location estimate per event_type: start at
    // the mean, tuning constant k = 1.345·sd (the textbook 95%%-
    // efficiency choice, stddev-scaled — documented; MAD scaling
    // would cost two extra corpus passes), then two reweighted-mean
    // rounds with w = min(1, k/|x−μ|). Per-term DECIMAL(28,12)
    // quantization keeps the weighted sums combiner-order-free. Each
    // round is one corpus pass fanned by the 5-row broadcast of the
    // previous center.
    sql(
      "q_huber_mean",
      """WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))
        |             * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS s2
        |  FROM events GROUP BY 1),
        |c0 AS (SELECT event_type, n, CAST(s1 AS DOUBLE) / n AS mu0,
        |    1.345 * sqrt((CAST(s2 AS DOUBLE)
        |                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)) AS k
        |  FROM m),
        |r1 AS (SELECT e.event_type,
        |    CAST(sum(CAST((CASE WHEN abs(e.value - c.mu0) <= c.k THEN 1.0
        |                   ELSE c.k / abs(e.value - c.mu0) END) * e.value
        |                  AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS swx,
        |    CAST(sum(CAST(CASE WHEN abs(e.value - c.mu0) <= c.k THEN 1.0
        |                  ELSE c.k / abs(e.value - c.mu0) END
        |                  AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS sw
        |  FROM events e JOIN c0 c USING (event_type) GROUP BY 1),
        |c1 AS (SELECT event_type, CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS mu1
        |       FROM r1),
        |r2 AS (SELECT e.event_type,
        |    CAST(sum(CAST((CASE WHEN abs(e.value - c.mu1) <= k.k THEN 1.0
        |                   ELSE k.k / abs(e.value - c.mu1) END) * e.value
        |                  AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS swx,
        |    CAST(sum(CAST(CASE WHEN abs(e.value - c.mu1) <= k.k THEN 1.0
        |                  ELSE k.k / abs(e.value - c.mu1) END
        |                  AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS sw
        |  FROM events e JOIN c1 c USING (event_type) JOIN c0 k USING (event_type)
        |  GROUP BY 1)
        |SELECT c0.event_type, c0.n, round(c0.mu0, 6) AS mean,
        |  round(c0.k, 6) AS huber_k, round(c1.mu1, 6) AS mu_round1,
        |  round(CAST(r2.swx AS DOUBLE) / CAST(r2.sw AS DOUBLE), 6) AS mu_round2,
        |  round(CAST(r2.swx AS DOUBLE) / CAST(r2.sw AS DOUBLE) - c0.mu0, 6) AS shift
        |FROM c0 JOIN c1 USING (event_type) JOIN r2 USING (event_type)
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val d6v = col("value").cast("decimal(18,6)")
      val m = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(d6v).cast("decimal(38,6)").as("s1"),
        sum(d6v * d6v).cast("decimal(38,12)").as("s2"))
      val c0 = m.select(col("event_type"), col("n"),
          (col("s1").cast("double") / col("n")).as("mu0"),
          (lit(1.345) * sqrt((col("s2").cast("double")
            - col("s1").cast("double") * col("s1").cast("double") / col("n"))
            / (col("n") - 1))).as("k"))
        .localCheckpoint() // 5 rows — broadcast into both IRLS passes
      def irls(center: DataFrame, mu: String) = {
        val d = abs(col("value") - col(mu))
        val w = when(d <= col("k"), lit(1.0)).otherwise(col("k") / d)
        ev.join(broadcast(center), "event_type")
          .groupBy("event_type")
          .agg(sum((w * col("value")).cast("decimal(28,12)"))
            .cast("decimal(38,12)").as("swx"),
            sum(w.cast("decimal(28,12)")).cast("decimal(38,12)").as("sw"))
          .select(col("event_type"),
            (col("swx").cast("double") / col("sw").cast("double")).as(mu + "n"))
      }
      val c1 = irls(c0.select(col("event_type"), col("mu0"), col("k")), "mu0")
        .withColumnRenamed("mu0n", "mu1").localCheckpoint()
      val c2 = irls(c1.join(broadcast(c0.select(col("event_type"), col("k"))),
        "event_type"), "mu1").withColumnRenamed("mu1n", "mu2")
      c0.join(c1, "event_type").join(c2, "event_type")
        .select(col("event_type"), col("n"), round(col("mu0"), 6).as("mean"),
          round(col("k"), 6).as("huber_k"), round(col("mu1"), 6).as("mu_round1"),
          round(col("mu2"), 6).as("mu_round2"),
          round(col("mu2") - col("mu0"), 6).as("shift"))
        .orderBy("event_type")
    },

    // ---- Neyman optimal stratified-sample allocation ----
    // Survey-sampling planning: given a total budget of 1000 draws
    // over strata = event_type, allocate n_h ∝ N_h·S_h (Neyman) vs
    // n_h ∝ N_h (proportional), and report each stratum's share and
    // the variance ratio of the two designs. One corpus pass to the
    // per-stratum moments; the allocation algebra runs on the 5-row
    // frame with totals riding a 1-row broadcast.
    sql(
      "q_neyman_allocation",
      """WITH m AS (SELECT event_type AS stratum, CAST(count(*) AS BIGINT) AS n_h,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))
        |             * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS s2
        |  FROM events GROUP BY 1),
        |c AS (SELECT stratum, n_h,
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_h)
        |         / (n_h - 1)) AS sd
        |  FROM m),
        |tt AS (SELECT sum(n_h * sd) AS tot_ns, CAST(sum(n_h) AS BIGINT) AS tot_n,
        |         sum(n_h * sd * sd) AS tot_nss
        |       FROM c)
        |SELECT stratum, n_h, round(sd, 6) AS sd_h,
        |  round(1000.0 * n_h * sd / (SELECT tot_ns FROM tt), 2) AS neyman_n,
        |  round(1000.0 * n_h / (SELECT tot_n FROM tt), 2) AS prop_n,
        |  round(((SELECT tot_ns FROM tt) / (SELECT tot_n FROM tt))
        |        * ((SELECT tot_ns FROM tt) / (SELECT tot_n FROM tt))
        |        / ((SELECT tot_nss FROM tt) / (SELECT tot_n FROM tt)), 6)
        |    AS neyman_var_ratio
        |FROM c ORDER BY stratum""".stripMargin) { (s, dir) =>
      val d6v = col("value").cast("decimal(18,6)")
      val m = t(s, dir, "events").groupBy(col("event_type").as("stratum")).agg(
        count(lit(1)).as("n_h"),
        sum(d6v).cast("decimal(38,6)").as("s1"),
        sum(d6v * d6v).cast("decimal(38,12)").as("s2"))
      val c = m.select(col("stratum"), col("n_h"),
          sqrt((col("s2").cast("double")
            - col("s1").cast("double") * col("s1").cast("double") / col("n_h"))
            / (col("n_h") - 1)).as("sd"))
        .localCheckpoint() // 5 rows, consumed twice (totals + output)
      val tt = c.agg(sum(col("n_h") * col("sd")).as("tot_ns"),
        sum("n_h").cast("long").as("tot_n"),
        sum(col("n_h") * col("sd") * col("sd")).as("tot_nss"))
      c.crossJoin(broadcast(tt))
        .select(col("stratum"), col("n_h"), round(col("sd"), 6).as("sd_h"),
          round(lit(1000.0) * col("n_h") * col("sd") / col("tot_ns"), 2)
            .as("neyman_n"),
          round(lit(1000.0) * col("n_h") / col("tot_n"), 2).as("prop_n"),
          round((col("tot_ns") / col("tot_n")) * (col("tot_ns") / col("tot_n"))
            / (col("tot_nss") / col("tot_n")), 6).as("neyman_var_ratio"))
        .orderBy("stratum")
    },

    // ---- Hill tail-index estimator (heavy-tail audit) ----
    // Is order revenue power-law-tailed, and how heavy? The Hill
    // estimator over the top k=500 order statistics:
    // γ̂ = mean(ln x_(i) − ln x_(k+1)), α̂ = 1/γ̂. The corpus cost is
    // ONE sort+limit (TakeOrdered — a per-partition top-k then a
    // 501-row merge, no global sort); all log algebra runs on the
    // 501-row frame with per-term DECIMAL quantization.
    sql(
      "q_hill_tail",
      """WITH r AS (SELECT o_totalprice AS x,
        |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS i
        |  FROM orders QUALIFY i <= 501),
        |xk AS (SELECT x AS xkv FROM r WHERE i = 501),
        |g AS (SELECT CAST(sum(CAST(ln(x / (SELECT xkv FROM xk))
        |                      AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS slog,
        |        CAST(count(*) AS BIGINT) AS k
        |      FROM r WHERE i <= 500)
        |SELECT k, round((SELECT xkv FROM xk), 2) AS x_k1,
        |  round(CAST(slog AS DOUBLE) / k, 6) AS gamma_hat,
        |  round(k / CAST(slog AS DOUBLE), 6) AS alpha_hat
        |FROM g""".stripMargin) { (s, dir) =>
      val top = t(s, dir, "orders")
        .select(col("o_totalprice").as("x"), col("o_orderkey"))
        .orderBy(desc("x"), col("o_orderkey"))
        .limit(501)
        .withColumn("i", row_number()
          .over(Window.orderBy(desc("x"), col("o_orderkey"))))
        .localCheckpoint() // 501 rows
      val xk = top.where(col("i") === 501).select(col("x").as("xkv"))
      val g = top.where(col("i") <= 500)
        .crossJoin(broadcast(xk))
        .agg(sum(log(col("x") / col("xkv")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("slog"),
          count(lit(1)).as("k"),
          first("xkv").as("xkv"))
      g.select(col("k"), round(col("xkv"), 2).as("x_k1"),
        round(col("slog").cast("double") / col("k"), 6).as("gamma_hat"),
        round(col("k") / col("slog").cast("double"), 6).as("alpha_hat"))
    },

    // ---- Bradley–Terry preference strengths (3 MM rounds) ----
    // The pairwise-preference fit behind RLHF reward-data audits and
    // ranker evaluation: each user "prefers" the event_type with the
    // higher mean value, pairwise wins aggregate into a K×K game
    // matrix, and three minorization–maximization rounds
    // sᵢ ← Wᵢ / Σⱼ nᵢⱼ/(sᵢ+sⱼ) (Hunter 2004) fit the strengths,
    // renormalized to sum K. The corpus collapses ONCE to (user,
    // type) means; the per-user type self-join fans out ≤ K²/2; every
    // MM round runs on the ≤ K² game frame. Per-term DECIMAL
    // quantization keeps denominators combiner-order-free.
    sql(
      "q_bradley_terry",
      """WITH um AS (SELECT user_id, event_type,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*) AS m
        |  FROM events GROUP BY 1, 2),
        |cmp AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |    CASE WHEN a.m > b.m THEN 1 ELSE 0 END AS wa
        |  FROM um a JOIN um b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  WHERE a.m <> b.m),
        |sym AS (SELECT i, j, CAST(count(*) AS BIGINT) AS nij,
        |          CAST(sum(w) AS BIGINT) AS wij
        |        FROM (SELECT ta AS i, tb AS j, wa AS w FROM cmp
        |              UNION ALL
        |              SELECT tb AS i, ta AS j, 1 - wa AS w FROM cmp) u
        |        GROUP BY 1, 2),
        |s0 AS (SELECT i AS et, CAST(sum(nij) AS BIGINT) AS games,
        |         CAST(sum(wij) AS BIGINT) AS wins, 1.0 AS s
        |       FROM sym GROUP BY 1),
        |r1 AS (SELECT g.et, g.games, g.wins, g.wins
        |         / CAST(sum(CAST(y.nij / (g.s + sj.s) AS DECIMAL(28,12)))
        |                AS DOUBLE) AS s
        |       FROM s0 g JOIN sym y ON y.i = g.et JOIN s0 sj ON sj.et = y.j
        |       GROUP BY 1, 2, 3, g.s),
        |n1 AS (SELECT et, games, wins, s * (SELECT count(*) FROM r1)
        |         / CAST((SELECT sum(CAST(s AS DECIMAL(28,12))) FROM r1)
        |                AS DOUBLE) AS s FROM r1),
        |r2 AS (SELECT g.et, g.games, g.wins, g.wins
        |         / CAST(sum(CAST(y.nij / (g.s + sj.s) AS DECIMAL(28,12)))
        |                AS DOUBLE) AS s
        |       FROM n1 g JOIN sym y ON y.i = g.et JOIN n1 sj ON sj.et = y.j
        |       GROUP BY 1, 2, 3, g.s),
        |n2 AS (SELECT et, games, wins, s * (SELECT count(*) FROM r2)
        |         / CAST((SELECT sum(CAST(s AS DECIMAL(28,12))) FROM r2)
        |                AS DOUBLE) AS s FROM r2),
        |r3 AS (SELECT g.et, g.games, g.wins, g.wins
        |         / CAST(sum(CAST(y.nij / (g.s + sj.s) AS DECIMAL(28,12)))
        |                AS DOUBLE) AS s
        |       FROM n2 g JOIN sym y ON y.i = g.et JOIN n2 sj ON sj.et = y.j
        |       GROUP BY 1, 2, 3, g.s),
        |n3 AS (SELECT et, games, wins, s * (SELECT count(*) FROM r3)
        |         / CAST((SELECT sum(CAST(s AS DECIMAL(28,12))) FROM r3)
        |                AS DOUBLE) AS s FROM r3)
        |SELECT et AS event_type, games, wins, round(s, 6) AS strength,
        |  CAST(row_number() OVER (ORDER BY s DESC, et) AS BIGINT) AS pref_rank
        |FROM n3 ORDER BY event_type""".stripMargin) { (s, dir) =>
      val um = t(s, dir, "events")
        .groupBy("user_id", "event_type")
        .agg((sum(col("value").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("m"))
      val a = um.select(col("user_id").as("uida"),
        col("event_type").as("ta"), col("m").as("ma"))
      val b = um.select(col("user_id").as("uidb"),
        col("event_type").as("tb"), col("m").as("mb"))
      val cmp = a.join(b, col("uida") === col("uidb") && col("ta") < col("tb"))
        .where(col("ma") =!= col("mb"))
        .select(col("ta"), col("tb"),
          when(col("ma") > col("mb"), 1L).otherwise(0L).as("wa"))
      val sym = cmp.select(col("ta").as("i"), col("tb").as("j"), col("wa").as("w"))
        .unionByName(cmp.select(col("tb").as("i"), col("ta").as("j"),
          (lit(1L) - col("wa")).as("w")))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("nij"), sum("w").cast("long").as("wij"))
        .localCheckpoint() // ≤ K² rows — the whole MM state
      val s0 = sym.groupBy(col("i").as("et"))
        .agg(sum("nij").cast("long").as("games"),
          sum("wij").cast("long").as("wins"))
        .withColumn("s", lit(1.0))
        .localCheckpoint()
      def mmRound(cur: DataFrame): DataFrame = {
        val si = cur.select(col("et"), col("games"), col("wins"), col("s"))
        val sj = cur.select(col("et").as("jt"), col("s").as("sjv"))
        val upd = sym.join(broadcast(si), sym("i") === si("et"))
          .join(broadcast(sj), sym("j") === col("jt"))
          .groupBy(col("et"), col("games"), col("wins"))
          .agg(sum((col("nij") / (col("s") + col("sjv"))).cast("decimal(28,12)"))
            .cast("double").as("den"))
          .select(col("et"), col("games"), col("wins"),
            (col("wins") / col("den")).as("s"))
        val norm = upd.agg(count(lit(1)).as("kk"),
          sum(col("s").cast("decimal(28,12)")).cast("double").as("ssum"))
        upd.crossJoin(broadcast(norm))
          .select(col("et"), col("games"), col("wins"),
            (col("s") * col("kk") / col("ssum")).as("s"))
          .localCheckpoint()
      }
      val fit = mmRound(mmRound(mmRound(s0)))
      fit.select(col("et").as("event_type"), col("games"), col("wins"),
          round(col("s"), 6).as("strength"),
          row_number().over(Window.orderBy(desc("s"), col("et")))
            .cast("long").as("pref_rank"))
        .orderBy("event_type")
    },

    // ---- Cochran–Mantel–Haenszel pooled odds ratio ----
    // The stratified-confounding audit: exposure (user parity) vs
    // outcome (value > 50) in a 2×2 table PER event_type stratum,
    // pooled with the CMH estimator ORₘₕ = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ),
    // against the crude OR of the collapsed table — with the
    // Simpson-reversal flag ((crude−1)·(cmh−1) < 0) in the output.
    // ONE corpus pass to the per-stratum 2×2 counts; CMH terms
    // quantize to DECIMAL so the pooled sums are order-free.
    sql(
      "q_mantel_haenszel",
      """WITH m AS (SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND value <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM events GROUP BY 1),
        |tt AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
        |    CAST(sum(c) AS BIGINT) AS tc, CAST(sum(d) AS BIGINT) AS td,
        |    CAST(sum(CAST(CAST(a AS DOUBLE) * d / (a + b + c + d)
        |                  AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS sad,
        |    CAST(sum(CAST(CAST(b AS DOUBLE) * c / (a + b + c + d)
        |                  AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS sbc
        |  FROM m)
        |SELECT event_type, a, b, c, d,
        |  round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6) AS or_stratum,
        |  round(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 6) AS cmh_or,
        |  round(CAST(ta AS DOUBLE) * td / (CAST(tb AS DOUBLE) * tc), 6) AS crude_or,
        |  CAST((CAST(ta AS DOUBLE) * td / (CAST(tb AS DOUBLE) * tc) - 1)
        |       * (CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE) - 1) < 0
        |       AS BOOLEAN) AS simpson_flip
        |FROM m CROSS JOIN tt ORDER BY event_type""".stripMargin) { (s, dir) =>
      val e1 = col("user_id") % 2 === 1
      val y1 = col("value") > 50
      val m = t(s, dir, "events").groupBy("event_type").agg(
        sum(when(e1 && y1, 1L).otherwise(0L)).as("a"),
        sum(when(e1 && !y1, 1L).otherwise(0L)).as("b"),
        sum(when(!e1 && y1, 1L).otherwise(0L)).as("c"),
        sum(when(!e1 && !y1, 1L).otherwise(0L)).as("d"))
        .localCheckpoint() // #strata rows, consumed twice
      val n = col("a") + col("b") + col("c") + col("d")
      val tt = m.agg(sum("a").cast("long").as("ta"),
        sum("b").cast("long").as("tb"), sum("c").cast("long").as("tc"),
        sum("d").cast("long").as("td"),
        sum((col("a").cast("double") * col("d") / n).cast("decimal(28,12)"))
          .cast("decimal(38,12)").as("sad"),
        sum((col("b").cast("double") * col("c") / n).cast("decimal(28,12)"))
          .cast("decimal(38,12)").as("sbc"))
      val cmh = col("sad").cast("double") / col("sbc").cast("double")
      val crude = (col("ta").cast("double") * col("td")
        / (col("tb").cast("double") * col("tc")))
      m.crossJoin(broadcast(tt))
        .select(col("event_type"), col("a"), col("b"), col("c"), col("d"),
          round(col("a").cast("double") * col("d")
            / (col("b").cast("double") * col("c")), 6).as("or_stratum"),
          round(cmh, 6).as("cmh_or"), round(crude, 6).as("crude_or"),
          ((crude - 1) * (cmh - 1) < 0).as("simpson_flip"))
        .orderBy("event_type")
    },

    // ---- 2-component Gaussian mixture, 2 unrolled EM rounds ----
    // The distributional-unmixing trainer per event_type: moments
    // seed μ = mean∓sd, σ = sd, π = ½; each EM round is ONE corpus
    // pass — E-step responsibilities against the 5-row broadcast of
    // the previous parameters, M-step as weighted DECIMAL moments of
    // the same pass (σ via the E[x²]−μ² shortcut, so no second pass
    // per round). The final log-likelihood pass makes EM's
    // monotonicity auditable in-output.
    sql(
      "q_mixture_em",
      """WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))
        |             * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS s2
        |  FROM events GROUP BY 1),
        |p0 AS (SELECT event_type, n, CAST(s1 AS DOUBLE) / n AS mu,
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
        |         / (n - 1)) AS sd
        |  FROM m),
        |i0 AS (SELECT event_type, n, mu - sd AS mu1, mu + sd AS mu2,
        |    sd AS sg1, sd AS sg2, 0.5 AS pi2 FROM p0),
        |em1 AS (SELECT e.event_type,
        |    CAST(sum(CAST(rr AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS sr,
        |    CAST(sum(CAST(rr * e.value AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS srx,
        |    CAST(sum(CAST(rr * e.value * e.value AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS srxx,
        |    CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sx,
        |    CAST(sum(CAST(e.value AS DECIMAL(18,6))
        |             * CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS sxx,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT e.event_type, e.value,
        |      p.pi2 * (exp(-(e.value - p.mu2) * (e.value - p.mu2)
        |                   / (2 * p.sg2 * p.sg2)) / p.sg2)
        |      / ((1 - p.pi2) * (exp(-(e.value - p.mu1) * (e.value - p.mu1)
        |                            / (2 * p.sg1 * p.sg1)) / p.sg1)
        |         + p.pi2 * (exp(-(e.value - p.mu2) * (e.value - p.mu2)
        |                        / (2 * p.sg2 * p.sg2)) / p.sg2)) AS rr
        |    FROM events e JOIN i0 p USING (event_type)) e
        |  GROUP BY 1),
        |i1 AS (SELECT event_type,
        |    CAST(sr AS DOUBLE) / n AS pi2,
        |    (CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
        |      / (n - CAST(sr AS DOUBLE)) AS mu1,
        |    CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE) AS mu2,
        |    sqrt((CAST(sxx AS DOUBLE) - CAST(srxx AS DOUBLE))
        |           / (n - CAST(sr AS DOUBLE))
        |         - ((CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
        |            / (n - CAST(sr AS DOUBLE)))
        |           * ((CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
        |              / (n - CAST(sr AS DOUBLE)))) AS sg1,
        |    sqrt(CAST(srxx AS DOUBLE) / CAST(sr AS DOUBLE)
        |         - (CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE))
        |           * (CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE))) AS sg2,
        |    n
        |  FROM em1),
        |em2 AS (SELECT e.event_type,
        |    CAST(sum(CAST(rr AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS sr,
        |    CAST(sum(CAST(rr * e.value AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS srx,
        |    CAST(sum(CAST(rr * e.value * e.value AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS srxx,
        |    CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sx,
        |    CAST(sum(CAST(e.value AS DECIMAL(18,6))
        |             * CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS sxx,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT e.event_type, e.value,
        |      p.pi2 * (exp(-(e.value - p.mu2) * (e.value - p.mu2)
        |                   / (2 * p.sg2 * p.sg2)) / p.sg2)
        |      / ((1 - p.pi2) * (exp(-(e.value - p.mu1) * (e.value - p.mu1)
        |                            / (2 * p.sg1 * p.sg1)) / p.sg1)
        |         + p.pi2 * (exp(-(e.value - p.mu2) * (e.value - p.mu2)
        |                        / (2 * p.sg2 * p.sg2)) / p.sg2)) AS rr
        |    FROM events e JOIN i1 p USING (event_type)) e
        |  GROUP BY 1),
        |i2 AS (SELECT event_type,
        |    CAST(sr AS DOUBLE) / n AS pi2,
        |    (CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
        |      / (n - CAST(sr AS DOUBLE)) AS mu1,
        |    CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE) AS mu2,
        |    sqrt((CAST(sxx AS DOUBLE) - CAST(srxx AS DOUBLE))
        |           / (n - CAST(sr AS DOUBLE))
        |         - ((CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
        |            / (n - CAST(sr AS DOUBLE)))
        |           * ((CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
        |              / (n - CAST(sr AS DOUBLE)))) AS sg1,
        |    sqrt(CAST(srxx AS DOUBLE) / CAST(sr AS DOUBLE)
        |         - (CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE))
        |           * (CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE))) AS sg2,
        |    n
        |  FROM em2),
        |ll AS (SELECT e.event_type,
        |    CAST(sum(CAST(ln(((1 - p.pi2) * (exp(-(e.value - p.mu1) * (e.value - p.mu1)
        |                            / (2 * p.sg1 * p.sg1)) / p.sg1)
        |        + p.pi2 * (exp(-(e.value - p.mu2) * (e.value - p.mu2)
        |                       / (2 * p.sg2 * p.sg2)) / p.sg2))
        |        / sqrt(2 * pi())) AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS s
        |  FROM events e JOIN i2 p USING (event_type) GROUP BY 1)
        |SELECT i2.event_type, i2.n, round(i0.mu1, 6) AS init_mu1,
        |  round(i0.mu2, 6) AS init_mu2, round(i2.pi2, 6) AS pi2,
        |  round(i2.mu1, 6) AS mu1, round(i2.mu2, 6) AS mu2,
        |  round(i2.sg1, 6) AS sigma1, round(i2.sg2, 6) AS sigma2,
        |  round(CAST(ll.s AS DOUBLE) / i2.n, 6) AS avg_loglik
        |FROM i2 JOIN i0 USING (event_type) JOIN ll USING (event_type)
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val d6v = col("value").cast("decimal(18,6)")
      val m = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(d6v).cast("decimal(38,6)").as("s1"),
        sum(d6v * d6v).cast("decimal(38,12)").as("s2"))
      val i0 = m.select(col("event_type"), col("n"),
          (col("s1").cast("double") / col("n")).as("mu"),
          sqrt((col("s2").cast("double")
            - col("s1").cast("double") * col("s1").cast("double") / col("n"))
            / (col("n") - 1)).as("sd"))
        .select(col("event_type"), col("n"),
          (col("mu") - col("sd")).as("mu1"), (col("mu") + col("sd")).as("mu2"),
          col("sd").as("sg1"), col("sd").as("sg2"), lit(0.5).as("pi2"))
        .localCheckpoint() // 5 rows — the EM parameter state
      def dens(mu: Column, sg: Column) =
        exp((col("value") - mu) * (col("value") - mu)
          * lit(-1.0) / (lit(2) * sg * sg)) / sg
      def emRound(params: DataFrame): DataFrame = {
        // match the oracle's operand order exactly: -(x-mu)² / (2σ²)
        def d1 = exp((col("value") - col("mu1")) * (col("value") - col("mu1"))
          .unary_- / (lit(2) * col("sg1") * col("sg1"))) / col("sg1")
        def d2 = exp((col("value") - col("mu2")) * (col("value") - col("mu2"))
          .unary_- / (lit(2) * col("sg2") * col("sg2"))) / col("sg2")
        val rr = col("pi2") * d2 / ((lit(1) - col("pi2")) * d1 + col("pi2") * d2)
        val e = ev.join(broadcast(params), "event_type")
          .select(col("event_type"), col("value"), rr.as("rr"))
        val agg = e.groupBy("event_type").agg(
          sum(col("rr").cast("decimal(28,12)")).cast("decimal(38,12)").as("sr"),
          sum((col("rr") * col("value")).cast("decimal(28,12)"))
            .cast("decimal(38,12)").as("srx"),
          sum((col("rr") * col("value") * col("value")).cast("decimal(38,12)"))
            .cast("decimal(38,12)").as("srxx"),
          sum(d6v).cast("decimal(38,6)").as("sx"),
          sum(d6v * d6v).cast("decimal(38,12)").as("sxx"),
          count(lit(1)).as("n"))
        def dd(c: String) = col(c).cast("double")
        val mu1n = (dd("sx") - dd("srx")) / (col("n") - dd("sr"))
        val mu2n = dd("srx") / dd("sr")
        agg.select(col("event_type"),
            (dd("sr") / col("n")).as("pi2"), mu1n.as("mu1"), mu2n.as("mu2"),
            sqrt((dd("sxx") - dd("srxx")) / (col("n") - dd("sr"))
              - ((dd("sx") - dd("srx")) / (col("n") - dd("sr")))
                * ((dd("sx") - dd("srx")) / (col("n") - dd("sr")))).as("sg1"),
            sqrt(dd("srxx") / dd("sr")
              - (dd("srx") / dd("sr")) * (dd("srx") / dd("sr"))).as("sg2"),
            col("n"))
          .localCheckpoint()
      }
      val i1 = emRound(i0)
      val i2 = emRound(i1)
      def d1f = exp((col("value") - col("mu1")) * (col("value") - col("mu1"))
        .unary_- / (lit(2) * col("sg1") * col("sg1"))) / col("sg1")
      def d2f = exp((col("value") - col("mu2")) * (col("value") - col("mu2"))
        .unary_- / (lit(2) * col("sg2") * col("sg2"))) / col("sg2")
      val ll = ev.join(broadcast(i2), "event_type")
        .select(col("event_type"),
          log(((lit(1) - col("pi2")) * d1f + col("pi2") * d2f)
            / sqrt(lit(2) * lit(Math.PI))).as("l"))
        .groupBy("event_type")
        .agg(sum(col("l").cast("decimal(28,12)")).cast("decimal(38,12)").as("s"))
      i2.join(i0.select(col("event_type"), col("mu1").as("imu1"),
          col("mu2").as("imu2")), "event_type")
        .join(ll, "event_type")
        .select(col("event_type"), col("n"), round(col("imu1"), 6).as("init_mu1"),
          round(col("imu2"), 6).as("init_mu2"), round(col("pi2"), 6).as("pi2"),
          round(col("mu1"), 6).as("mu1"), round(col("mu2"), 6).as("mu2"),
          round(col("sg1"), 6).as("sigma1"), round(col("sg2"), 6).as("sigma2"),
          round(col("s").cast("double") / col("n"), 6).as("avg_loglik"))
        .orderBy("event_type")
    },

    // ---- 10% trimmed mean (the order-statistics robust center) ----
    // The complement to q_winsorize (clip) and q_huber_mean (reweight):
    // DROP the k = ⌊0.1·n⌋ smallest and largest values per event_type
    // and average the rest. Exact rank semantics via one per-type
    // window pass (deterministic (value, event_id) total order); the
    // kept-range mean accumulates in DECIMAL. The shift column makes
    // the tail asymmetry readable from the row.
    sql(
      "q_trimmed_mean",
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value, event_id) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM events),
        |k AS (SELECT event_type, value, rn, n,
        |        CAST(floor(n / 10.0) AS BIGINT) AS kk FROM r)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(kk) AS BIGINT) AS k_each_side,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / max(n), 6)
        |    AS mean,
        |  round(CAST(sum(CASE WHEN rn > kk AND rn <= n - kk
        |                 THEN CAST(value AS DECIMAL(18,6))
        |                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |        / (max(n) - 2 * max(kk)), 6) AS trimmed_mean,
        |  round(CAST(sum(CASE WHEN rn > kk AND rn <= n - kk
        |                 THEN CAST(value AS DECIMAL(18,6))
        |                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |        / (max(n) - 2 * max(kk))
        |        - CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / max(n), 6)
        |    AS shift
        |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      val wAll = Window.partitionBy("event_type")
      val r = t(s, dir, "events")
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll).cast("long"))
        .withColumn("kk", floor(col("n") / 10.0).cast("long"))
      val d6v = col("value").cast("decimal(18,6)")
      val dz = lit(0).cast("decimal(18,6)")
      val kept = when(col("rn") > col("kk") && col("rn") <= col("n") - col("kk"),
        d6v).otherwise(dz)
      val g = r.groupBy("event_type").agg(
        max("n").cast("long").as("n"), max("kk").cast("long").as("k_each_side"),
        sum(d6v).as("sv"), sum(kept).as("st"))
      val mean = col("sv").cast("double") / col("n")
      val tmean = col("st").cast("double")
        ./(col("n") - lit(2) * col("k_each_side"))
      g.select(col("event_type"), col("n"), col("k_each_side"),
          round(mean, 6).as("mean"), round(tmean, 6).as("trimmed_mean"),
          round(tmean - mean, 6).as("shift"))
        .orderBy("event_type")
    },

    // ---- group-sequential monitoring (O'Brien–Fleming, 5 looks) ----
    // The interim-analysis design next to q_msprt's always-valid
    // sequential test: the experiment's time range splits into 5
    // equal calendar spans, each look computes the cumulative
    // two-sample z (arms = user parity) and compares it against the
    // standard two-sided α=0.05 OBF boundary ladder
    // (4.8769/3.3569/2.6803/2.2898/2.0310 — Lan–DeMets). ONE corpus
    // pass to per-look conditional moments; the cumulative z and the
    // boundary join run on the 5-row look frame.
    sql(
      "q_group_sequential",
      """WITH b AS (SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1
        |           FROM events),
        |f AS (SELECT CAST(least(floor((epoch_us(ts) - (SELECT t0 FROM b))
        |        / (((SELECT t1 FROM b) - (SELECT t0 FROM b)) / 5.0)), 4)
        |        AS BIGINT) + 1 AS look,
        |    user_id % 2 AS arm, value
        |  FROM events),
        |m AS (SELECT look,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 0 THEN CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS s0,
        |    CAST(sum(CASE WHEN arm = 1 THEN CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS s1,
        |    CAST(sum(CASE WHEN arm = 0
        |             THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(38,12)) END) AS DECIMAL(38,12)) AS q0,
        |    CAST(sum(CASE WHEN arm = 1
        |             THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(38,12)) END) AS DECIMAL(38,12)) AS q1
        |  FROM f GROUP BY 1),
        |c AS (SELECT look,
        |    CAST(sum(n0) OVER w AS BIGINT) AS n0,
        |    CAST(sum(n1) OVER w AS BIGINT) AS n1,
        |    CAST(sum(s0) OVER w AS DECIMAL(38,6)) AS s0,
        |    CAST(sum(s1) OVER w AS DECIMAL(38,6)) AS s1,
        |    CAST(sum(q0) OVER w AS DECIMAL(38,12)) AS q0,
        |    CAST(sum(q1) OVER w AS DECIMAL(38,12)) AS q1
        |  FROM m WINDOW w AS (ORDER BY look ROWS UNBOUNDED PRECEDING)),
        |z AS (SELECT look, n0, n1,
        |    (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
        |      / sqrt((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / n0)
        |               / (n0 - 1) / n0
        |             + (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
        |               / (n1 - 1) / n1) AS zs
        |  FROM c),
        |ob AS (SELECT * FROM (VALUES (1, 4.8769), (2, 3.3569), (3, 2.6803),
        |         (4, 2.2898), (5, 2.0310)) AS t(look, bound))
        |SELECT z.look, z.n0, z.n1,
        |  round(CAST(z.n0 + z.n1 AS DOUBLE)
        |        / (SELECT max(n0 + n1) FROM z), 4) AS info_frac,
        |  round(z.zs, 6) AS z_stat, CAST(ob.bound AS DOUBLE) AS obf_bound,
        |  CAST(abs(z.zs) > ob.bound AS BOOLEAN) AS crossed
        |FROM z JOIN ob ON ob.look = z.look ORDER BY z.look""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val b = ev.agg(unix_micros(min("ts")).as("t0"),
        unix_micros(max("ts")).as("t1"))
      val look = (least(floor((unix_micros(col("ts")) - col("t0"))
        / ((col("t1") - col("t0")) / 5.0)), lit(4.0)).cast("long") + 1)
        .as("look")
      val d6v = col("value").cast("decimal(18,6)")
      val dz6 = lit(0).cast("decimal(18,6)")
      val dz12 = lit(0).cast("decimal(38,12)")
      val a0 = col("user_id") % 2 === 0
      val m = ev.crossJoin(broadcast(b))
        .select(look, col("user_id"), col("value"))
        .groupBy("look").agg(
          sum(when(a0, 1L).otherwise(0L)).as("pn0"),
          sum(when(!a0, 1L).otherwise(0L)).as("pn1"),
          sum(when(a0, d6v).otherwise(dz6)).cast("decimal(38,6)").as("ps0"),
          sum(when(!a0, d6v).otherwise(dz6)).cast("decimal(38,6)").as("ps1"),
          sum(when(a0, d6v * d6v).otherwise(dz12)).cast("decimal(38,12)")
            .as("pq0"),
          sum(when(!a0, d6v * d6v).otherwise(dz12)).cast("decimal(38,12)")
            .as("pq1"))
      val w = Window.orderBy("look").rowsBetween(Window.unboundedPreceding, 0)
      val c = m.select(col("look"),
        sum("pn0").over(w).cast("long").as("n0"),
        sum("pn1").over(w).cast("long").as("n1"),
        sum("ps0").over(w).cast("decimal(38,6)").as("s0"),
        sum("ps1").over(w).cast("decimal(38,6)").as("s1"),
        sum("pq0").over(w).cast("decimal(38,12)").as("q0"),
        sum("pq1").over(w).cast("decimal(38,12)").as("q1"))
      def dd(c0: String) = col(c0).cast("double")
      val zs = (dd("s1") / col("n1") - dd("s0") / col("n0")) / sqrt(
        (dd("q0") - dd("s0") * dd("s0") / col("n0")) / (col("n0") - 1) / col("n0")
          + (dd("q1") - dd("s1") * dd("s1") / col("n1")) / (col("n1") - 1)
            / col("n1"))
      val z = c.select(col("look"), col("n0"), col("n1"), zs.as("zs"))
        .localCheckpoint() // 5 rows
      val ob = s.createDataFrame(Seq((1L, 4.8769), (2L, 3.3569), (3L, 2.6803),
        (4L, 2.2898), (5L, 2.0310))).toDF("blook", "bound")
      val tot = z.agg(max(col("n0") + col("n1")).as("ntot"))
      z.join(broadcast(ob), col("blook") === col("look"))
        .crossJoin(broadcast(tot))
        .select(col("look"), col("n0"), col("n1"),
          round((col("n0") + col("n1")).cast("double") / col("ntot"), 4)
            .as("info_frac"),
          round(col("zs"), 6).as("z_stat"), col("bound").as("obf_bound"),
          (abs(col("zs")) > col("bound")).as("crossed"))
        .orderBy("look")
    },

    // ---- instrumental-variable (Wald) estimator ----
    // The observational-causal complement to q_propensity_ipw: with
    // user parity as an as-if-random instrument z, first-half
    // activity count as the endogenous exposure x, and second-half
    // spend as the outcome y, the Wald/IV slope is
    // β = (E[y|z=1]−E[y|z=0]) / (E[x|z=1]−E[x|z=0]) — intent-to-treat
    // over first-stage. The naive OLS slope rides along so the
    // confounding gap is readable from the row. ONE corpus pass to
    // the per-user (z, x, y) frame; every moment re-aggregates it.
    sql(
      "q_iv_wald",
      """WITH b AS (SELECT epoch_us(min(ts))
        |                  + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS mid
        |           FROM events),
        |u AS (SELECT user_id, CAST(user_id % 2 AS BIGINT) AS z,
        |        CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |        CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b)
        |                 THEN CAST(value AS DECIMAL(18,6))
        |                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS y
        |      FROM events GROUP BY 1, 2),
        |arm AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(z) AS BIGINT) AS n1,
        |    CAST(sum(z * x) AS BIGINT) AS sx1,
        |    CAST(sum((1 - z) * x) AS BIGINT) AS sx0,
        |    CAST(sum(CASE WHEN z = 1 THEN y ELSE CAST(0 AS DECIMAL(38,6)) END)
        |         AS DECIMAL(38,6)) AS sy1,
        |    CAST(sum(CASE WHEN z = 0 THEN y ELSE CAST(0 AS DECIMAL(38,6)) END)
        |         AS DECIMAL(38,6)) AS sy0,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS DECIMAL(38,6)) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS DECIMAL(38,6)) AS sxy
        |  FROM u),
        |e AS (SELECT n, n1, n - n1 AS n0,
        |    CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / (n - n1) AS itt,
        |    CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / (n - n1) AS fs,
        |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
        |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |      AS ols
        |  FROM arm)
        |SELECT n AS n_users, n1, n0, round(itt, 6) AS itt,
        |  round(fs, 6) AS first_stage, round(itt / fs, 6) AS beta_iv,
        |  round(ols, 6) AS beta_ols,
        |  round(itt / fs - ols, 6) AS confounding_gap
        |FROM e""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val b = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
        .select((unix_micros(col("t0"))
          + expr("(unix_micros(t1) - unix_micros(t0)) div 2")).as("mid_us"))
      val pre = unix_micros(col("ts")) < col("mid_us")
      val dz = lit(0).cast("decimal(18,6)")
      val u = ev.crossJoin(broadcast(b))
        .groupBy(col("user_id"), (col("user_id") % 2).as("z"))
        .agg(sum(when(pre, 1L).otherwise(0L)).as("x"),
          sum(when(!pre, col("value").cast("decimal(18,6)")).otherwise(dz))
            .cast("decimal(38,6)").as("y"))
      val dz38 = lit(0).cast("decimal(38,6)")
      val arm = u.agg(count(lit(1)).as("n"), sum("z").cast("long").as("n1"),
        sum(col("z") * col("x")).cast("long").as("sx1"),
        sum((lit(1) - col("z")) * col("x")).cast("long").as("sx0"),
        sum(when(col("z") === 1, col("y")).otherwise(dz38))
          .cast("decimal(38,6)").as("sy1"),
        sum(when(col("z") === 0, col("y")).otherwise(dz38))
          .cast("decimal(38,6)").as("sy0"),
        sum("x").cast("long").as("sx"),
        sum("y").cast("decimal(38,6)").as("sy"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        sum(col("x") * col("y")).cast("decimal(38,6)").as("sxy"))
      def dd(c: String) = col(c).cast("double")
      val itt = dd("sy1") / col("n1") - dd("sy0") / (col("n") - col("n1"))
      val fs = dd("sx1") / col("n1") - dd("sx0") / (col("n") - col("n1"))
      val ols = (dd("sxy") - dd("sx") * dd("sy") / col("n"))
        ./(dd("sxx") - dd("sx") * dd("sx") / col("n"))
      arm.select(col("n").as("n_users"), col("n1"),
        (col("n") - col("n1")).as("n0"), round(itt, 6).as("itt"),
        round(fs, 6).as("first_stage"), round(itt / fs, 6).as("beta_iv"),
        round(ols, 6).as("beta_ols"),
        round(itt / fs - ols, 6).as("confounding_gap"))
    },

    // ---- multiple-testing procedure comparison (Bonferroni/Holm/BH) ----
    // The same per-type z-test family as q_bh_fdr, adjudicated by all
    // three standard procedures side by side: Bonferroni (p ≤ α/m),
    // Holm step-down (reject while p_(i) ≤ α/(m−i+1) — the cumulative-
    // AND over the sorted family), and BH step-up — the FWER-vs-FDR
    // power ladder made visible per metric. Corpus cost is the one
    // conditional-moment pass; every procedure runs on the #types
    // frame.
    sql(
      "q_holm_bonferroni",
      """WITH m AS (SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS s0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS s1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0
        |             THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(38,12)) END) AS DECIMAL(38,12)) AS q0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1
        |             THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(38,12)) END) AS DECIMAL(38,12)) AS q1
        |  FROM events GROUP BY 1),
        |p AS (SELECT event_type,
        |    round(2.0 / (1.0 + exp(0.07056 * abs(zs) * abs(zs) * abs(zs)
        |                           + 1.5976 * abs(zs))), 6) AS p6
        |  FROM (SELECT event_type,
        |      (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
        |        / sqrt((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / n0)
        |                 / (n0 - 1) / n0
        |               + (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
        |                 / (n1 - 1) / n1) AS zs
        |    FROM m) z),
        |r AS (SELECT event_type, p6,
        |    CAST(row_number() OVER (ORDER BY p6, event_type) AS BIGINT) AS i,
        |    CAST(count(*) OVER () AS BIGINT) AS fam
        |  FROM p),
        |h AS (SELECT *,
        |    CASE WHEN p6 <= 0.10 / fam THEN 1 ELSE 0 END AS bonf,
        |    min(CASE WHEN p6 <= 0.10 / (fam - i + 1) THEN 1 ELSE 0 END)
        |      OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS holm
        |  FROM r),
        |k AS (SELECT coalesce(max(CASE WHEN p6 <= i * 0.10 / fam THEN i END), 0)
        |        AS kmax FROM r)
        |SELECT event_type, p6 AS p_approx, i AS p_rank,
        |  CAST(bonf = 1 AS BOOLEAN) AS bonferroni_reject,
        |  CAST(holm = 1 AS BOOLEAN) AS holm_reject,
        |  CAST(i <= (SELECT kmax FROM k) AS BOOLEAN) AS bh_reject
        |FROM h ORDER BY event_type""".stripMargin) { (s, dir) =>
      val d6v = col("value").cast("decimal(18,6)")
      val dz6 = lit(0).cast("decimal(18,6)")
      val dz12 = lit(0).cast("decimal(38,12)")
      val a0 = col("user_id") % 2 === 0
      val m = t(s, dir, "events").groupBy("event_type").agg(
        sum(when(a0, 1L).otherwise(0L)).as("n0"),
        sum(when(!a0, 1L).otherwise(0L)).as("n1"),
        sum(when(a0, d6v).otherwise(dz6)).cast("decimal(38,6)").as("s0"),
        sum(when(!a0, d6v).otherwise(dz6)).cast("decimal(38,6)").as("s1"),
        sum(when(a0, d6v * d6v).otherwise(dz12)).cast("decimal(38,12)").as("q0"),
        sum(when(!a0, d6v * d6v).otherwise(dz12)).cast("decimal(38,12)").as("q1"))
      def dd(c: String) = col(c).cast("double")
      val zs = (dd("s1") / col("n1") - dd("s0") / col("n0")) / sqrt(
        (dd("q0") - dd("s0") * dd("s0") / col("n0")) / (col("n0") - 1) / col("n0")
          + (dd("q1") - dd("s1") * dd("s1") / col("n1")) / (col("n1") - 1)
            / col("n1"))
      val az = abs(col("zs"))
      val p = m.select(col("event_type"), zs.as("zs"))
        .withColumn("p6", round(lit(2.0) / (lit(1.0)
          + exp(lit(0.07056) * az * az * az + lit(1.5976) * az)), 6))
        .localCheckpoint() // #types rows
      val r = p
        .withColumn("i", row_number()
          .over(Window.orderBy("p6", "event_type")).cast("long"))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("fam"))))
        .localCheckpoint()
      val holm = min(when(col("p6") <= lit(0.10) / (col("fam") - col("i") + 1),
        1).otherwise(0))
        .over(Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0))
      val kmax = r.agg(coalesce(
        max(when(col("p6") <= col("i") * 0.10 / col("fam"), col("i"))),
        lit(0L)).as("kmax"))
      r.withColumn("holm", holm)
        .crossJoin(broadcast(kmax))
        .select(col("event_type"), col("p6").as("p_approx"),
          col("i").as("p_rank"),
          (col("p6") <= lit(0.10) / col("fam")).as("bonferroni_reject"),
          (col("holm") === 1).as("holm_reject"),
          (col("i") <= col("kmax")).as("bh_reject"))
        .orderBy("event_type")
    },

    // ---- Kruskal–Wallis rank test (K-group nonparametric ANOVA) ----
    // The K>2 complement to q_auc_mannwhitney, in the repo's exact-
    // rank house style: values collapse to the tie-group domain in
    // ONE shuffle, average ranks come from a cumulative window over
    // the distinct-value frame (exact half-integer arithmetic in
    // DECIMAL), H carries the Σ(t³−t) tie correction, and the only
    // doubles appear in the final 1-row projection. Rejects at the
    // χ²(K−1, 0.05) = 9.488 critical value for K=5.
    sql(
      "q_kruskal_wallis",
      """WITH v AS (SELECT value AS x, event_type AS g FROM events),
        |u AS (SELECT x, g, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |d AS (SELECT x, CAST(sum(c) AS BIGINT) AS t FROM u GROUP BY 1),
        |w AS (SELECT x, t,
        |    CAST(coalesce(sum(t) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before
        |  FROM d),
        |ar AS (SELECT x, t, cum_before,
        |    CAST(cum_before AS DECIMAL(28,6)) + CAST(t + 1 AS DECIMAL(28,6)) / 2
        |      AS avg_rank
        |  FROM w),
        |gr AS (SELECT u.g, CAST(sum(u.c) AS BIGINT) AS n_g,
        |    CAST(sum(u.c * ar.avg_rank) AS DECIMAL(38,6)) AS rsum
        |  FROM u JOIN ar ON ar.x = u.x GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(CAST(CAST(rsum AS DOUBLE) * CAST(rsum AS DOUBLE) / n_g
        |              AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS sr2,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM gr),
        |tc AS (SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS ties
        |       FROM d WHERE t > 1),
        |h AS (SELECT n, k,
        |    (12.0 / (CAST(n AS DOUBLE) * (n + 1)) * CAST(sr2 AS DOUBLE)
        |     - 3.0 * (n + 1))
        |      / (1.0 - CAST((SELECT ties FROM tc) AS DOUBLE)
        |               / (CAST(n AS DOUBLE) * n * n - n)) AS hstat
        |  FROM tt)
        |SELECT n, k AS n_groups, round(hstat, 6) AS h_stat,
        |  CAST(hstat > 9.488 AS BOOLEAN) AS reject_05
        |FROM h""".stripMargin) { (s, dir) =>
      val u = t(s, dir, "events")
        .select(col("value").as("x"), col("event_type").as("g"))
        .groupBy("x", "g").agg(count(lit(1)).as("c"))
        .localCheckpoint() // tie-domain collapse — rank + group consumers
      val d = u.groupBy("x").agg(sum("c").cast("long").as("t"))
      val wCum = Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ar = d
        .withColumn("cum_before",
          coalesce(sum("t").over(wCum), lit(0L)).cast("long"))
        .select(col("x"),
          (col("cum_before").cast("decimal(28,6)")
            + (col("t") + 1).cast("decimal(28,6)") / 2).as("avg_rank"),
          col("t"))
      val gr = u.join(ar.select(col("x"), col("avg_rank")), "x")
        .groupBy("g").agg(sum("c").cast("long").as("n_g"),
          sum(col("c") * col("avg_rank")).cast("decimal(38,6)").as("rsum"))
      val tt = gr.agg(sum("n_g").cast("long").as("n"),
        sum((col("rsum").cast("double") * col("rsum").cast("double")
          / col("n_g")).cast("decimal(38,6)")).cast("decimal(38,6)").as("sr2"),
        count(lit(1)).as("k"))
      val tc = d.where(col("t") > 1)
        .agg(coalesce(sum(col("t") * col("t") * col("t") - col("t")), lit(0L))
          .cast("long").as("ties"))
      val hstat = (lit(12.0) / (col("n").cast("double") * (col("n") + 1))
        * col("sr2").cast("double") - lit(3.0) * (col("n") + 1))
        ./(lit(1.0) - col("ties").cast("double")
          / (col("n").cast("double") * col("n") * col("n") - col("n")))
      tt.crossJoin(broadcast(tc))
        .select(col("n"), col("k").as("n_groups"),
          round(hstat, 6).as("h_stat"),
          (hstat > 9.488).as("reject_05"))
    },

    // ---- permutation test (two-sample mean difference, B=32) ----
    // The exact-null complement of q_ab_ttest's Welch t: instead of a
    // normal approximation, re-randomize the group labels B times and
    // read the p-value off the permutation distribution of the mean
    // difference — the assumption-free A/B significance test a
    // skewed-metric experiment needs. Per the repo's seeded-randomness
    // convention every replicate's labels are deterministic md5 coins
    // keyed (replicate, event_id), so the permutation distribution is
    // reproducible cross-engine; p uses the add-one convention
    // (1 + #{|T_b| ≥ |T_obs|}) / (B+1) (Phipson & Smyth 2010). Scale
    // shape: the q_bootstrap_ci ×B fan-out — ONE corpus pass explodes
    // each row into 32 (replicate, coin) rows and partial aggregation
    // collapses everything map-side to 32 replicate rows; the observed
    // statistic rides as a 1-row broadcast. Exact DECIMAL group sums +
    // integer counts make every T identical on both engines, so the
    // |T_b| ≥ |T_obs| comparisons are bit-deterministic.
    sql(
      "q_permutation_test",
      """WITH base AS (
        |  SELECT event_id, CAST(value AS DECIMAL(15,4)) AS xd,
        |         CAST(json_extract_string(props, '$.k') AS INT) % 2 AS g
        |  FROM events WHERE event_type = 'purchase'),
        |obs AS (SELECT
        |    CAST(sum(CASE WHEN g = 0 THEN xd END) AS DOUBLE)
        |      / sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)
        |    - CAST(sum(CASE WHEN g = 1 THEN xd END) AS DOUBLE)
        |      / sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS t_obs
        |  FROM base),
        |rep AS (SELECT r.r AS r, b.xd,
        |    ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' ||
        |        CAST(b.event_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS g
        |  FROM base b CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS r) r),
        |perms AS (SELECT r,
        |    CAST(sum(CASE WHEN g = 0 THEN xd END) AS DOUBLE)
        |      / sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)
        |    - CAST(sum(CASE WHEN g = 1 THEN xd END) AS DOUBLE)
        |      / sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS t_perm
        |  FROM rep GROUP BY r),
        |p AS (SELECT CAST(sum(CASE WHEN abs(t_perm) >= abs((SELECT t_obs FROM obs))
        |                      THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
        |      FROM perms)
        |SELECT CAST(r AS BIGINT) AS r, round(t_perm, 6) AS t_perm,
        |       round((SELECT t_obs FROM obs), 6) AS t_obs,
        |       round((1.0 + (SELECT n_ge FROM p)) / 33.0, 6) AS p_value
        |FROM perms ORDER BY r""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32Salted
      val base = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("value").cast("decimal(15,4)").as("xd"),
          (get_json_object(col("props"), "$.k").cast("int") % 2).as("g"))
      def meanDiff(d: DataFrame, grp: Column) = d
        .agg((sum(when(grp === 0, col("xd"))).cast("double")
            / sum(when(grp === 0, 1L).otherwise(0L))
          - sum(when(grp === 1, col("xd"))).cast("double")
            / sum(when(grp === 1, 1L).otherwise(0L))).as("t"))
      val obs = meanDiff(base, col("g")).localCheckpoint()
      val perms = base
        .withColumn("r", explode(sequence(lit(0), lit(31))))
        .withColumn("gp",
          h32Salted(col("r"), col("event_id").cast("string")) % 2)
        .groupBy("r")
        .agg((sum(when(col("gp") === 0, col("xd"))).cast("double")
            / sum(when(col("gp") === 0, 1L).otherwise(0L))
          - sum(when(col("gp") === 1, col("xd"))).cast("double")
            / sum(when(col("gp") === 1, 1L).otherwise(0L))).as("t_perm"))
        // 32 rows feed both the p aggregate and the output projection
        .localCheckpoint()
      val p = perms.crossJoin(broadcast(obs))
        .agg(sum(when(abs(col("t_perm")) >= abs(col("t")), 1L)
          .otherwise(0L)).as("n_ge"))
      perms.crossJoin(broadcast(obs)).crossJoin(broadcast(p))
        .select(col("r").cast("long").as("r"),
          round(col("t_perm"), 6).as("t_perm"),
          round(col("t"), 6).as("t_obs"),
          round((lit(1.0) + col("n_ge")) / 33.0, 6).as("p_value"))
        .orderBy("r")
    },

    // ---- Friedman test (blocked rank test, + Kendall's W) ----
    // Friedman (1937): the nonparametric repeated-measures complement
    // of q_kruskal_wallis — does day-of-week move daily revenue when
    // WEEKS are the blocks? Blocks = epoch-week (dayNum div 7 — both
    // engines compute the identical integer; no locale/ISO-week
    // divergence surface), treatments = dayNum mod 7, value = the
    // daily revenue collapse; only complete 7-day blocks enter (the
    // test requires complete blocks). Ranks within a block use the
    // midrank convention computed as INTEGERS — 2·midrank = 2·min-rank
    // + (tie count − 1) — so the per-treatment rank sums, their
    // squares, and the tie masses Σ(t³−t) are all exact BIGINTs and
    // the χ² (= 3/(b·k(k+1)) · Σ(2R_j)²/4... folded to integer-exact
    // form below), its tie-adjusted version, and Kendall's W are pure
    // projections of integer sums. 100-TB story: one corpus
    // aggregation to the day frame; blocks/ranks live on the ≤ ~350-
    // row week×dow frame.
    sql(
      "q_friedman_test",
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS rev
        |  FROM orders GROUP BY 1),
        |wd AS (SELECT d // 7 AS wk, d % 7 AS dw, rev FROM daily),
        |cb AS (SELECT wk FROM wd GROUP BY wk HAVING count(*) = 7),
        |r0 AS (SELECT wd.wk, wd.dw,
        |         CAST(2 * rank() OVER (PARTITION BY wd.wk ORDER BY wd.rev)
        |           + count(*) OVER (PARTITION BY wd.wk, wd.rev) - 1 AS BIGINT)
        |           AS r2
        |       FROM wd JOIN cb ON cb.wk = wd.wk),
        |tj AS (SELECT CAST(coalesce(sum(tc * tc * tc - tc), 0) AS BIGINT) AS ties
        |       FROM (SELECT count(*) AS tc FROM wd JOIN cb ON cb.wk = wd.wk
        |             GROUP BY wd.wk, wd.rev) WHERE tc > 1),
        |rs AS (SELECT dw, CAST(sum(r2) AS BIGINT) AS r2sum FROM r0 GROUP BY dw),
        |ag AS (SELECT CAST(sum(r2sum * r2sum) AS BIGINT) AS ssq,
        |         CAST(count(*) AS BIGINT) AS k FROM rs),
        |bb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM cb),
        |st AS (SELECT b, k, ssq, ties,
        |         3.0e0 * ssq / (b * k * (k + 1))
        |           - 3.0e0 * b * (k + 1) AS chi2_raw,
        |         1.0e0 - CAST(ties AS DOUBLE) / (b * k * (k * k - 1)) AS cf
        |       FROM ag, bb, tj)
        |SELECT b AS b_blocks, k, ties AS tie_mass,
        |       round(chi2_raw, 6) AS chi2,
        |       round(chi2_raw / cf, 6) AS chi2_tie_adj,
        |       round(chi2_raw / (b * (k - 1)), 6) AS kendall_w,
        |       CAST(k - 1 AS BIGINT) AS df
        |FROM st""".stripMargin) { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(graft.functions.TimeFunctions.dayNum(col("o_orderdate"))
          .as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(15,4)").as("rev"))
      val wd = daily.selectExpr("d div 7 AS wk", "d % 7 AS dw", "rev")
      val cb = wd.groupBy("wk").agg(count(lit(1)).as("nd"))
        .where(col("nd") === 7).select("wk")
      val full = wd.join(cb, "wk").localCheckpoint() // week×dow frame
      val r0 = full.select(col("dw"),
        (lit(2) * rank().over(Window.partitionBy("wk").orderBy("rev"))
          + count(lit(1)).over(Window.partitionBy("wk", "rev")) - 1)
          .cast("long").as("r2"))
      val tj = full.groupBy("wk", "rev").agg(count(lit(1)).as("tc"))
        .where(col("tc") > 1)
        .agg(coalesce(sum(col("tc") * col("tc") * col("tc") - col("tc")),
          lit(0L)).cast("long").as("ties"))
      val rs = r0.groupBy("dw").agg(sum("r2").cast("long").as("r2sum"))
      val ag = rs.agg(sum(col("r2sum") * col("r2sum")).cast("long").as("ssq"),
        count(lit(1)).as("k"))
      val bb = cb.agg(count(lit(1)).as("b"))
      val st = ag.crossJoin(broadcast(bb)).crossJoin(broadcast(tj))
      val kD = col("k").cast("double")
      val bD = col("b").cast("double")
      val chi2 = lit(3.0) * col("ssq") / (bD * kD * (kD + 1)) -
        lit(3.0) * bD * (kD + 1)
      val cf = lit(1.0) -
        col("ties").cast("double") / (bD * kD * (kD * kD - 1))
      st.select(col("b").as("b_blocks"), col("k"),
        col("ties").as("tie_mass"),
        round(chi2, 6).as("chi2"),
        round(chi2 / cf, 6).as("chi2_tie_adj"),
        round(chi2 / (bD * (kD - 1)), 6).as("kendall_w"),
        (col("k") - 1).cast("long").as("df"))
    },

    // ---- Brown–Forsythe (median-centered Levene) variance test ----
    // Levene (1960) / Brown & Forsythe (1974): are the l_quantity
    // spreads equal across return flags? The robust median-centered
    // form, kept INTEGER-EXACT end to end: quantity is integral, the
    // per-group median comes off the bounded (flag × 50-value) count
    // frame as v_lo + v_hi (twice the median — the even/odd split
    // without a .5), the deviation is |2q − med2| (= 2|q − med|, an
    // integer), and the one-way ANOVA on those deviations needs only
    // Σz and Σz² per group — exact BIGINTs — so W is a pure double
    // projection of integer moments (the common 2× scale cancels in
    // the F ratio). 100-TB story: ONE corpus aggregation to the
    // (flag, quantity) count frame (≤ 150 cells at any scale), one
    // more for the z moments; medians and W are frame-side math.
    sql(
      "q_levene_test",
      """WITH g AS (SELECT l_returnflag AS rf, CAST(l_quantity AS BIGINT) AS q
        |           FROM lineitem),
        |cnt AS (SELECT rf, q, CAST(count(*) AS BIGINT) AS c
        |        FROM g GROUP BY 1, 2),
        |cum AS (SELECT rf, q, c,
        |          CAST(sum(c) OVER (PARTITION BY rf ORDER BY q) AS BIGINT) AS cm,
        |          CAST(sum(c) OVER (PARTITION BY rf) AS BIGINT) AS ng
        |        FROM cnt),
        |med AS (SELECT rf,
        |          min(CASE WHEN cm >= (ng + 1) // 2 THEN q END)
        |            + min(CASE WHEN cm >= ng // 2 + 1 THEN q END) AS med2
        |        FROM cum GROUP BY rf),
        |z AS (SELECT g.rf, abs(2 * g.q - med.med2) AS z
        |      FROM g JOIN med ON med.rf = g.rf),
        |mo AS (SELECT rf, CAST(count(*) AS BIGINT) AS n_g,
        |         CAST(sum(z) AS BIGINT) AS sz,
        |         CAST(sum(z * z) AS BIGINT) AS szz
        |       FROM z GROUP BY rf),
        |gt AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |         CAST(sum(sz) AS BIGINT) AS szt,
        |         CAST(count(*) AS BIGINT) AS k,
        |         sum(CAST(sz AS DOUBLE) * sz / n_g) AS ssb_part,
        |         CAST(sum(szz) AS BIGINT) AS szzt
        |       FROM mo),
        |w AS (SELECT n, k,
        |        (ssb_part - CAST(szt AS DOUBLE) * szt / n) / (k - 1) AS msb,
        |        (szzt - ssb_part) / (n - k) AS msw
        |      FROM gt)
        |SELECT mo.rf, mo.n_g, med.med2 AS median_x2, mo.sz AS sum_absdev_x2,
        |       round(w.msb / w.msw, 6) AS w_stat,
        |       CAST(w.k - 1 AS BIGINT) AS df1, CAST(w.n - w.k AS BIGINT) AS df2
        |FROM mo JOIN med ON med.rf = mo.rf CROSS JOIN w
        |ORDER BY mo.rf""".stripMargin) { (s, dir) =>
      val g = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"),
          col("l_quantity").cast("long").as("q"))
      val cnt = g.groupBy("rf", "q").agg(count(lit(1)).as("c"))
      val cum = cnt.select(col("rf"), col("q"), col("c"),
          sum("c").over(Window.partitionBy("rf").orderBy("q")).as("cm"),
          sum("c").over(Window.partitionBy("rf")).as("ng"))
        // integer rank targets — Column./ is DOUBLE division (the
        // ExactQuantiles pitfall), so the (n+1)/2 split uses `div`
        .withColumn("lo", expr("(ng + 1) div 2"))
        .withColumn("hi", expr("ng div 2 + 1"))
      val med = cum.groupBy("rf").agg(
        (min(when(col("cm") >= col("lo"), col("q")))
          + min(when(col("cm") >= col("hi"), col("q")))).as("med2"))
      val z = g.join(med, "rf").select(col("rf"),
        abs(lit(2) * col("q") - col("med2")).as("z"))
      val mo = z.groupBy("rf").agg(count(lit(1)).as("n_g"),
        sum("z").cast("long").as("sz"),
        sum(col("z") * col("z")).cast("long").as("szz"))
        .localCheckpoint() // 3-row group-moment frame
      val gt = mo.agg(sum("n_g").cast("long").as("n"),
        sum("sz").cast("long").as("szt"),
        count(lit(1)).as("k"),
        sum(col("sz").cast("double") * col("sz") / col("n_g")).as("ssb_part"),
        sum("szz").cast("long").as("szzt"))
      val w = gt.select(col("n"), col("k"),
        ((col("ssb_part") - col("szt").cast("double") * col("szt") / col("n"))
          / (col("k") - 1)).as("msb"),
        ((col("szzt") - col("ssb_part")) / (col("n") - col("k"))).as("msw"))
      mo.join(med, "rf").crossJoin(broadcast(w))
        .select(col("rf"), col("n_g"), col("med2").as("median_x2"),
          col("sz").as("sum_absdev_x2"),
          round(col("msb") / col("msw"), 6).as("w_stat"),
          (col("k") - 1).cast("long").as("df1"),
          (col("n") - col("k")).cast("long").as("df2"))
        .orderBy("rf")
    },

    // ---- Wilson score intervals for per-type rates ----
    // Wilson (1927): the rate interval that behaves at small n and
    // extreme p̂ where the Wald interval collapses — the estimator a
    // CTR/conversion dashboard should use. Success = event value ≥ 50
    // (a fixed threshold both engines apply to the same doubles);
    // z = 1.96 pinned as a literal. Both the Wilson and Wald bounds
    // ride per type, so the output itself documents the difference.
    // Everything is a pure projection of the per-type (n, s) integer
    // counts — sqrt on identical doubles is IEEE-correctly-rounded in
    // both engines. 100-TB story: one partial+final count aggregation;
    // the interval math is a #types-row projection.
    sql(
      "q_wilson_interval",
      """WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS s
        |  FROM events GROUP BY 1),
        |p AS (SELECT event_type, n, s,
        |        CAST(s AS DOUBLE) / n AS ph, 1.96e0 AS z FROM c),
        |w AS (SELECT event_type, n, s, ph, z,
        |        (ph + z * z / (2 * n)) / (1 + z * z / n) AS center,
        |        z / (1 + z * z / n)
        |          * sqrt(ph * (1 - ph) / n + z * z / (4.0e0 * n * n)) AS hw
        |      FROM p)
        |SELECT event_type, n, s, round(ph, 6) AS rate,
        |       round(center - hw, 6) AS wilson_lo,
        |       round(center + hw, 6) AS wilson_hi,
        |       round(ph - z * sqrt(ph * (1 - ph) / n), 6) AS wald_lo,
        |       round(ph + z * sqrt(ph * (1 - ph) / n), 6) AS wald_hi
        |FROM w ORDER BY event_type""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "events").groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") >= 50, 1L).otherwise(0L)).cast("long").as("s"))
      val nD = col("n").cast("double")
      val ph = col("s").cast("double") / nD
      val z = lit(1.96)
      val center = (ph + z * z / (lit(2.0) * nD)) / (lit(1.0) + z * z / nD)
      val hw = (z / (lit(1.0) + z * z / nD))
        .*(sqrt(ph * (lit(1) - ph) / nD + z * z / (lit(4.0) * nD * nD)))
      val wald = z * sqrt(ph * (lit(1) - ph) / nD)
      c.select(col("event_type"), col("n"), col("s"),
          round(ph, 6).as("rate"),
          round(center - hw, 6).as("wilson_lo"),
          round(center + hw, 6).as("wilson_hi"),
          round(ph - wald, 6).as("wald_lo"),
          round(ph + wald, 6).as("wald_hi"))
        .orderBy("event_type")
    },

    // ---- standardized effect sizes (d, g, Glass, CLES, Cliff) ----
    // The reporting layer q_ab_ttest/q_power_analysis assume: a t-stat
    // says "significant", an effect size says "how big" — no experiment
    // readout ships without one. Arms = the q_ab_ttest variant split.
    // Everything is computed INTEGER-EXACTLY off cent-quantized values
    // (values ≤ ~$500 → ≤ ~49k distinct cents, DOMAIN-bounded at any
    // corpus scale): the standardized moments are scale-invariant, so
    // quantizing both arms identically moves d/g/Glass only by the
    // quantization itself (applied identically in both engines), and
    // the rank statistics get exact ×2 midranks off the bounded
    // (type, cents) count frame — Cliff's δ and the common-language
    // effect size are pure projections of a BIGINT U. Cohen (1988) d
    // with pooled sd; Hedges (1981) small-sample correction
    // g = d·(1 − 3/(4N−9)); Glass's Δ on the CONTROL arm's sd;
    // CLES = P(a > b) + ½P(a = b) = U_a/(n_a·n_b); δ = 2·CLES − 1.
    // 100-TB story: one corpus pass to the count frame; every window
    // runs on the ≤ 49k-row domain-bounded support per type.
    sql(
      "q_effect_sizes",
      """WITH v AS (SELECT event_type AS ty,
        |    CAST(json_extract_string(props, '$.k') AS INT) % 2 AS arm,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |cnt AS (SELECT ty, vc,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM v GROUP BY 1, 2),
        |mr AS (SELECT ty, vc, c0, c1,
        |    CAST(2 * (sum(c0 + c1) OVER (PARTITION BY ty ORDER BY vc)
        |              - (c0 + c1)) + (c0 + c1) + 1 AS BIGINT) AS mr2
        |  FROM cnt),
        |mo AS (SELECT ty,
        |    CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c0 * vc) AS BIGINT) AS s0,
        |    CAST(sum(c1 * vc) AS BIGINT) AS s1,
        |    CAST(sum(c0 * vc * vc) AS BIGINT) AS ss0,
        |    CAST(sum(c1 * vc * vc) AS BIGINT) AS ss1,
        |    CAST(sum(c0 * mr2) AS BIGINT) AS r0_x2
        |  FROM mr GROUP BY 1),
        |e AS (SELECT ty, n0, n1,
        |    CAST(s0 AS DOUBLE) / n0 AS m0, CAST(s1 AS DOUBLE) / n1 AS m1,
        |    (n0 * CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0)
        |      / (CAST(n0 AS DOUBLE) * (n0 - 1)) AS v0,
        |    (n1 * CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
        |      / (CAST(n1 AS DOUBLE) * (n1 - 1)) AS v1,
        |    r0_x2 - n0 * (n0 + 1) AS u0_x2
        |  FROM mo),
        |f AS (SELECT ty, n0, n1, u0_x2,
        |    (m0 - m1) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1)
        |                     / (n0 + n1 - 2)) AS d,
        |    (m0 - m1) / sqrt(v1) AS glass,
        |    CAST(u0_x2 AS DOUBLE) / (2.0e0 * n0 * n1) AS cles
        |  FROM e)
        |SELECT ty AS event_type, n0 AS n_a, n1 AS n_b, u0_x2 AS u_a_x2,
        |  round(d, 6) AS cohen_d,
        |  round(d * (1 - 3.0e0 / (4 * (n0 + n1) - 9)), 6) AS hedges_g,
        |  round(glass, 6) AS glass_delta,
        |  round(cles, 6) AS cles,
        |  round(2 * cles - 1, 6) AS cliff_delta
        |FROM f ORDER BY event_type""".stripMargin) { (s, dir) =>
      val v = t(s, dir, "events")
        .select(col("event_type").as("ty"),
          (get_json_object(col("props"), "$.k").cast("int") % 2).as("arm"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("vc"))
      val cnt = v.groupBy("ty", "vc")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("c0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long").as("c1"))
      // domain-bounded support window (≤ ~49k cents per type)
      val ct = col("c0") + col("c1")
      val mr = cnt.withColumn("mr2",
        (lit(2) * (sum(ct).over(Window.partitionBy("ty").orderBy("vc")) - ct)
          + ct + 1).cast("long"))
      val mo = mr.groupBy("ty").agg(
        sum("c0").cast("long").as("n0"), sum("c1").cast("long").as("n1"),
        sum(col("c0") * col("vc")).cast("long").as("s0"),
        sum(col("c1") * col("vc")).cast("long").as("s1"),
        sum(col("c0") * col("vc") * col("vc")).cast("long").as("ss0"),
        sum(col("c1") * col("vc") * col("vc")).cast("long").as("ss1"),
        sum(col("c0") * col("mr2")).cast("long").as("r0_x2"))
      val m0 = col("s0").cast("double") / col("n0")
      val m1 = col("s1").cast("double") / col("n1")
      val v0 = (col("n0") * col("ss0").cast("double")
        - col("s0").cast("double") * col("s0"))
        ./(col("n0").cast("double") * (col("n0") - 1))
      val v1 = (col("n1") * col("ss1").cast("double")
        - col("s1").cast("double") * col("s1"))
        ./(col("n1").cast("double") * (col("n1") - 1))
      val e = mo.select(col("ty"), col("n0"), col("n1"),
        m0.as("m0"), m1.as("m1"), v0.as("v0"), v1.as("v1"),
        (col("r0_x2") - col("n0") * (col("n0") + 1)).as("u0_x2"))
      val d = (col("m0") - col("m1")) /
        sqrt(((col("n0") - 1) * col("v0") + (col("n1") - 1) * col("v1"))
          / (col("n0") + col("n1") - 2))
      val glass = (col("m0") - col("m1")) / sqrt(col("v1"))
      val cles = col("u0_x2").cast("double") /
        (lit(2.0) * col("n0") * col("n1"))
      e.select(col("ty").as("event_type"), col("n0").as("n_a"),
          col("n1").as("n_b"), col("u0_x2").as("u_a_x2"),
          round(d, 6).as("cohen_d"),
          round(d * (lit(1) - lit(3.0)
            / (lit(4) * (col("n0") + col("n1")) - 9)), 6).as("hedges_g"),
          round(glass, 6).as("glass_delta"),
          round(cles, 6).as("cles"),
          round(cles * 2 - 1, 6).as("cliff_delta"))
        .orderBy("event_type")
    },

    // ---- Yuen's trimmed-mean robust t-test ----
    // Yuen (1974): the Welch t built on 20 %-trimmed means and
    // winsorized variances — the robust two-sample test that keeps its
    // level under heavy tails, where q_ab_ttest's Welch t loses power.
    // Integer-exact trimming off the same cent-quantized domain-
    // bounded count frame as q_effect_sizes: per arm, g = ⌊0.2n⌋, a
    // value's TRIMMED weight is the overlap of its rank span with
    // (g, n−g] (min(cum, n−g) − max(cum−c, g), clamped — no per-row
    // sort survives to the plan), the winsorized value clamps to the
    // rank-(g+1)/(n−g) order statistics read off the same cumulative
    // frame, and all moment sums are BIGINTs. t and the Welch–
    // Satterthwaite df are pure projections: d_i = (n_i−1)·s²_wi /
    // (h_i·(h_i−1)), t = (tm₀−tm₁)/√(d₀+d₁). 100-TB story: one corpus
    // pass to the count frame; per-arm windows run on ≤ ~49k
    // domain-bounded rows.
    sql(
      "q_yuen_ttest",
      """WITH v AS (SELECT event_type AS ty,
        |    CAST(json_extract_string(props, '$.k') AS INT) % 2 AS arm,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |cnt AS (SELECT ty, arm, vc, CAST(count(*) AS BIGINT) AS c
        |        FROM v GROUP BY 1, 2, 3),
        |cum AS (SELECT ty, arm, vc, c,
        |          CAST(sum(c) OVER (PARTITION BY ty, arm ORDER BY vc)
        |            AS BIGINT) AS cm,
        |          CAST(sum(c) OVER (PARTITION BY ty, arm) AS BIGINT) AS n
        |        FROM cnt),
        |gg AS (SELECT ty, arm, vc, c, cm, n, n // 5 AS g FROM cum),
        |bd AS (SELECT ty, arm,
        |         min(CASE WHEN cm >= g + 1 THEN vc END) AS vlo,
        |         min(CASE WHEN cm >= n - g THEN vc END) AS vhi
        |       FROM gg GROUP BY 1, 2),
        |tw AS (SELECT gg.ty, gg.arm, gg.n, gg.g,
        |         CASE WHEN (CASE WHEN gg.cm < gg.n - gg.g THEN gg.cm
        |                         ELSE gg.n - gg.g END)
        |                 - (CASE WHEN gg.cm - gg.c > gg.g THEN gg.cm - gg.c
        |                         ELSE gg.g END) > 0
        |              THEN (CASE WHEN gg.cm < gg.n - gg.g THEN gg.cm
        |                         ELSE gg.n - gg.g END)
        |                 - (CASE WHEN gg.cm - gg.c > gg.g THEN gg.cm - gg.c
        |                         ELSE gg.g END)
        |              ELSE 0 END AS tc,
        |         CASE WHEN gg.vc < bd.vlo THEN bd.vlo
        |              WHEN gg.vc > bd.vhi THEN bd.vhi
        |              ELSE gg.vc END AS wv,
        |         gg.c
        |       FROM gg JOIN bd ON bd.ty = gg.ty AND bd.arm = gg.arm),
        |mo AS (SELECT ty, arm, n, g, n - 2 * g AS h,
        |         CAST(sum(tc * wv) AS BIGINT) AS st,
        |         CAST(sum(c * wv) AS BIGINT) AS sw,
        |         CAST(sum(c * wv * wv) AS BIGINT) AS sww
        |       FROM tw GROUP BY 1, 2, 3, 4, 5),
        |ar AS (SELECT ty, arm, n, h,
        |         CAST(st AS DOUBLE) / h AS tm,
        |         (n * CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE) * sw)
        |           / (CAST(n AS DOUBLE) * (n - 1)) AS vw
        |       FROM mo),
        |j AS (SELECT a.ty, a.n AS n_a, b.n AS n_b, a.h AS h_a, b.h AS h_b,
        |        a.tm AS tm_a, b.tm AS tm_b,
        |        (a.n - 1) * a.vw / (CAST(a.h AS DOUBLE) * (a.h - 1)) AS d0,
        |        (b.n - 1) * b.vw / (CAST(b.h AS DOUBLE) * (b.h - 1)) AS d1
        |      FROM ar a JOIN ar b ON a.ty = b.ty AND a.arm = 0 AND b.arm = 1)
        |SELECT ty AS event_type, n_a, n_b, h_a, h_b,
        |  round(tm_a / 100, 6) AS trimmed_mean_a,
        |  round(tm_b / 100, 6) AS trimmed_mean_b,
        |  round((tm_a - tm_b) / sqrt(d0 + d1), 6) AS t_yuen,
        |  round((d0 + d1) * (d0 + d1)
        |        / (d0 * d0 / (h_a - 1) + d1 * d1 / (h_b - 1)), 2) AS df
        |FROM j ORDER BY event_type""".stripMargin) { (s, dir) =>
      val v = t(s, dir, "events")
        .select(col("event_type").as("ty"),
          (get_json_object(col("props"), "$.k").cast("int") % 2).as("arm"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("vc"))
      val cnt = v.groupBy("ty", "arm", "vc").agg(count(lit(1)).as("c"))
      val wA = Window.partitionBy("ty", "arm")
      val cum = cnt.select(col("ty"), col("arm"), col("vc"), col("c"),
        sum("c").over(wA.orderBy("vc")).as("cm"),
        sum("c").over(wA).as("n"))
      val gg = cum.withColumn("g", expr("n div 5")).localCheckpoint()
      val bd = gg.groupBy("ty", "arm").agg(
        min(when(col("cm") >= col("g") + 1, col("vc"))).as("vlo"),
        min(when(col("cm") >= col("n") - col("g"), col("vc"))).as("vhi"))
      val hiCap = least(col("cm"), col("n") - col("g"))
      val loCap = greatest(col("cm") - col("c"), col("g"))
      val tw = gg.join(bd, Seq("ty", "arm"))
        .select(col("ty"), col("arm"), col("n"), col("g"), col("c"),
          greatest(hiCap - loCap, lit(0L)).as("tc"),
          when(col("vc") < col("vlo"), col("vlo"))
            .when(col("vc") > col("vhi"), col("vhi"))
            .otherwise(col("vc")).as("wv"))
      val mo = tw.groupBy(col("ty"), col("arm"), col("n"), col("g"),
          (col("n") - col("g") * 2).as("h"))
        .agg(sum(col("tc") * col("wv")).cast("long").as("st"),
          sum(col("c") * col("wv")).cast("long").as("sw"),
          sum(col("c") * col("wv") * col("wv")).cast("long").as("sww"))
      val ar = mo.select(col("ty"), col("arm"), col("n"), col("h"),
        (col("st").cast("double") / col("h")).as("tm"),
        ((col("n") * col("sww").cast("double")
          - col("sw").cast("double") * col("sw"))
          / (col("n").cast("double") * (col("n") - 1))).as("vw"))
        .localCheckpoint() // 10-row arm-moment frame
      def dTerm(n: Column, vw: Column, h: Column) =
        (n - 1) * vw / (h.cast("double") * (h - 1))
      val a = ar.where(col("arm") === 0)
        .select(col("ty"), col("n").as("n_a"), col("h").as("h_a"),
          col("tm").as("tm_a"), dTerm(col("n"), col("vw"), col("h")).as("d0"))
      val b = ar.where(col("arm") === 1)
        .select(col("ty").as("ty_b"), col("n").as("n_b"), col("h").as("h_b"),
          col("tm").as("tm_b"), dTerm(col("n"), col("vw"), col("h")).as("d1"))
      a.join(broadcast(b), col("ty") === col("ty_b"))
        .select(col("ty").as("event_type"), col("n_a"), col("n_b"),
          col("h_a"), col("h_b"),
          round(col("tm_a") / 100, 6).as("trimmed_mean_a"),
          round(col("tm_b") / 100, 6).as("trimmed_mean_b"),
          round((col("tm_a") - col("tm_b")) / sqrt(col("d0") + col("d1")), 6)
            .as("t_yuen"),
          round((col("d0") + col("d1")) * (col("d0") + col("d1"))
            / (col("d0") * col("d0") / (col("h_a") - 1)
              + col("d1") * col("d1") / (col("h_b") - 1)), 2).as("df"))
        .orderBy("event_type")
    },

    // ---- 1-D Wasserstein (earth-mover) distance between arms ----
    // The L1 companion to q_ks_drift's sup-norm: W₁ = ∫|F_a − F_b| is
    // the drift metric that SEES magnitude (a small shift of the whole
    // mass moves W₁ proportionally but barely moves KS), which is why
    // distribution-shift monitors report both. Same integer-exact
    // construction as the KS machinery: per type, both arms' CDFs live
    // on the shared cent support, the running difference is the exact
    // BIGINT cum_a·n_b − cum_b·n_a, each support gap contributes
    // |diff|·gap_width exactly, and the only doubles are the two final
    // normalizations (÷ n_a·n_b·100 for original units). The max of
    // the same |diff| rides as the KS numerator, so the two metrics
    // are computed from ONE pass and can be read against each other.
    // 100-TB story: one corpus pass to the (type, cents) count frame;
    // windows on the ≤ ~49k-row domain-bounded support.
    sql(
      "q_wasserstein_1d",
      """WITH v AS (SELECT event_type AS ty,
        |    CAST(json_extract_string(props, '$.k') AS INT) % 2 AS arm,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |cnt AS (SELECT ty, vc,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM v GROUP BY 1, 2),
        |cum AS (SELECT ty, vc,
        |    CAST(sum(c0) OVER w AS BIGINT) AS m0,
        |    CAST(sum(c1) OVER w AS BIGINT) AS m1,
        |    CAST(sum(c0) OVER (PARTITION BY ty) AS BIGINT) AS n0,
        |    CAST(sum(c1) OVER (PARTITION BY ty) AS BIGINT) AS n1,
        |    lead(vc) OVER w AS nxt
        |  FROM cnt WINDOW w AS (PARTITION BY ty ORDER BY vc)),
        |d AS (SELECT ty, n0, n1,
        |        abs(m0 * n1 - m1 * n0) AS ad,
        |        CASE WHEN nxt IS NULL THEN 0 ELSE nxt - vc END AS gap
        |      FROM cum),
        |a AS (SELECT ty, n0, n1,
        |        CAST(sum(ad * gap) AS BIGINT) AS w1_scaled,
        |        CAST(max(ad) AS BIGINT) AS ks_scaled
        |      FROM d GROUP BY 1, 2, 3)
        |SELECT ty AS event_type, n0 AS n_a, n1 AS n_b, w1_scaled, ks_scaled,
        |  round(CAST(w1_scaled AS DOUBLE) / n0 / n1 / 100, 6) AS w1,
        |  round(CAST(ks_scaled AS DOUBLE) / n0 / n1, 6) AS ks_stat
        |FROM a ORDER BY event_type""".stripMargin) { (s, dir) =>
      val v = t(s, dir, "events")
        .select(col("event_type").as("ty"),
          (get_json_object(col("props"), "$.k").cast("int") % 2).as("arm"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("vc"))
      val cnt = v.groupBy("ty", "vc")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("c0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long").as("c1"))
      val w = Window.partitionBy("ty").orderBy("vc")
      val wT = Window.partitionBy("ty")
      val cum = cnt.select(col("ty"), col("vc"),
        sum("c0").over(w).as("m0"), sum("c1").over(w).as("m1"),
        sum("c0").over(wT).as("n0"), sum("c1").over(wT).as("n1"),
        lead("vc", 1).over(w).as("nxt"))
      val d = cum.select(col("ty"), col("n0"), col("n1"),
        abs(col("m0") * col("n1") - col("m1") * col("n0")).as("ad"),
        when(col("nxt").isNull, 0L).otherwise(col("nxt") - col("vc"))
          .as("gap"))
      d.groupBy("ty", "n0", "n1")
        .agg(sum(col("ad") * col("gap")).cast("long").as("w1_scaled"),
          max("ad").cast("long").as("ks_scaled"))
        .select(col("ty").as("event_type"), col("n0").as("n_a"),
          col("n1").as("n_b"), col("w1_scaled"), col("ks_scaled"),
          round(col("w1_scaled").cast("double") / col("n0") / col("n1")
            / 100, 6).as("w1"),
          round(col("ks_scaled").cast("double") / col("n0") / col("n1"), 6)
            .as("ks_stat"))
        .orderBy("event_type")
    },

    // ---- Cramér–von Mises two-sample statistic ----
    // The L2 member completing the distribution-test trio (q_ks_drift
    // sup-norm, q_wasserstein_1d L1-in-value, this L2-in-probability):
    // T = (n_a·n_b/N²)·Σ over all N pooled observations of
    // (F_a − F_b)², the omnibus test with better power than KS against
    // dispersed alternatives (Anderson 1962's two-sample form). Same
    // integer-exact construction off the cent-support count frame: at
    // each support value the CDF gap is the exact BIGINT
    // D = cum_a·n_b − cum_b·n_a, each pooled observation at that value
    // contributes D², and the sum Σ ct·D² accumulates as DECIMAL(38,0)
    // (D² alone reaches ~1.6e17 at the 10× corpus — BIGINT would
    // overflow two decades out, DECIMAL(38,0) holds to 1e38). The
    // statistic T = Σ/(n_a·n_b·N²) is one final double division.
    // 100-TB story: identical to q_wasserstein_1d — one corpus pass to
    // the domain-bounded count frame, windows on ≤ ~49k rows.
    sql(
      "q_cvm_twosample",
      """WITH v AS (SELECT event_type AS ty,
        |    CAST(json_extract_string(props, '$.k') AS INT) % 2 AS arm,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |cnt AS (SELECT ty, vc,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM v GROUP BY 1, 2),
        |cum AS (SELECT ty, c0 + c1 AS ct,
        |    CAST(sum(c0) OVER w AS BIGINT) AS m0,
        |    CAST(sum(c1) OVER w AS BIGINT) AS m1,
        |    CAST(sum(c0) OVER (PARTITION BY ty) AS BIGINT) AS n0,
        |    CAST(sum(c1) OVER (PARTITION BY ty) AS BIGINT) AS n1
        |  FROM cnt WINDOW w AS (PARTITION BY ty ORDER BY vc)),
        |a AS (SELECT ty, n0, n1,
        |        sum(CAST(ct * (m0 * n1 - m1 * n0) AS DECIMAL(19,0))
        |            * CAST(m0 * n1 - m1 * n0 AS DECIMAL(19,0))) AS s
        |      FROM cum GROUP BY 1, 2, 3)
        |SELECT ty AS event_type, n0 AS n_a, n1 AS n_b,
        |  round(CAST(s AS DOUBLE) / n0 / n1
        |        / ((n0 + n1) * CAST(n0 + n1 AS DOUBLE)), 6) AS cvm_t
        |FROM a ORDER BY event_type""".stripMargin) { (s, dir) =>
      val v = t(s, dir, "events")
        .select(col("event_type").as("ty"),
          (get_json_object(col("props"), "$.k").cast("int") % 2).as("arm"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("vc"))
      val cnt = v.groupBy("ty", "vc")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("c0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long").as("c1"))
      val w = Window.partitionBy("ty").orderBy("vc")
      val wT = Window.partitionBy("ty")
      val cum = cnt.select(col("ty"), (col("c0") + col("c1")).as("ct"),
        sum("c0").over(w).as("m0"), sum("c1").over(w).as("m1"),
        sum("c0").over(wT).as("n0"), sum("c1").over(wT).as("n1"))
      // (ct·D) × D, each factor in DECIMAL(19,0): the naive ct·D·D
      // chain overflowed DuckDB's INT64 decimal kernel at the 10×
      // corpus (D² alone ~4e19 there); ct·D stays ≤ ~4e15 two decades
      // out and the single (19,0)×(19,0) product widens to (38,0)
      val ddRaw = col("m0") * col("n1") - col("m1") * col("n0")
      val a = cum.groupBy("ty", "n0", "n1")
        .agg(sum((col("ct") * ddRaw).cast("decimal(19,0)")
          * ddRaw.cast("decimal(19,0)")).as("s"))
      a.select(col("ty").as("event_type"), col("n0").as("n_a"),
          col("n1").as("n_b"),
          round(col("s").cast("double") / col("n0") / col("n1")
            / ((col("n0") + col("n1"))
              * (col("n0") + col("n1")).cast("double")), 6).as("cvm_t"))
        .orderBy("event_type")
    },

    // ---- event-study leads & lags (dynamic DiD) ----
    // q_did_estimator collapses the design to one 2×2; the modern
    // causal-inference workflow plots the WHOLE dynamic path — per
    // relative period p, β_p = (treat−control)_p − (treat−control)_ref
    // with the last PRE period as the reference, so β_{−1} ≡ 0 by
    // construction (emitted and hash-pinned as the built-in
    // self-check) and the pre-period β's are the parallel-trends
    // diagnostic a DiD is not credible without (Angrist & Pischke;
    // the sixth causal estimator next to DiD/IPW/RDD/IV/PSM). Same
    // design conventions as q_did_estimator (treatment = user_id
    // parity, event at the corpus midpoint, DECIMAL(18,6) moments);
    // relative WEEKS bucket the day offsets so every period has mass
    // at any scale factor. The per-period Welch SE rides so lags can
    // be read against noise. max|β_pre| rides as the single-number
    // pre-trend audit. 100-TB story: ONE corpus pass to the
    // (rel_week × arm) moment frame; the reference join and the
    // pre-trend scalar are frame-side.
    sql(
      "q_event_study",
      """WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS mn,
        |    CAST(floor((date_diff('day', min(CAST(ts AS DATE)),
        |                          max(CAST(ts AS DATE))) + 1) / 2.0) AS BIGINT)
        |      AS half
        |  FROM events),
        |e AS (SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS tr,
        |        CAST(floor((date_diff('day', b.mn, CAST(ts AS DATE)) - b.half)
        |                   / 7.0) AS BIGINT) AS rw,
        |        CAST(value AS DECIMAL(18,6)) AS v
        |      FROM events CROSS JOIN bounds b),
        |m AS (SELECT rw,
        |    CAST(sum(tr) AS BIGINT) AS n_t,
        |    sum(CASE WHEN tr = 1 THEN v END) AS s_t,
        |    sum(CASE WHEN tr = 1 THEN v * CAST(v AS DECIMAL(19,6)) END) AS q_t,
        |    CAST(sum(1 - tr) AS BIGINT) AS n_c,
        |    sum(CASE WHEN tr = 0 THEN v END) AS s_c,
        |    sum(CASE WHEN tr = 0 THEN v * CAST(v AS DECIMAL(19,6)) END) AS q_c
        |  FROM e GROUP BY 1),
        |d AS (SELECT rw, n_t, n_c,
        |    CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c AS diff,
        |    sqrt((CAST(q_t AS DOUBLE)
        |          - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / n_t)
        |           / (n_t - 1) / n_t
        |       + (CAST(q_c AS DOUBLE)
        |          - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / n_c)
        |           / (n_c - 1) / n_c) AS se
        |  FROM m),
        |ref AS (SELECT diff AS ref_diff FROM d WHERE rw = -1),
        |pre AS (SELECT max(abs(diff - ref_diff)) AS max_pre_beta
        |        FROM d CROSS JOIN ref WHERE rw < -1)
        |SELECT rw AS rel_week, n_t, n_c, round(diff, 6) AS diff,
        |  round(diff - ref_diff, 6) AS beta,
        |  round(se, 6) AS se_diff,
        |  CAST(CASE WHEN rw < 0 THEN 1 ELSE 0 END AS BIGINT) AS is_pre,
        |  round(max_pre_beta, 6) AS max_pre_beta
        |FROM d CROSS JOIN ref CROSS JOIN pre
        |ORDER BY rel_week""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val bounds = ev.agg(min(to_date(col("ts"))).as("mn"),
        floor((datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
          / 2.0).cast("long").as("half"))
      val e = ev.crossJoin(broadcast(bounds))
        .select((col("user_id") % 2).cast("int").as("tr"),
          floor((datediff(to_date(col("ts")), col("mn")) - col("half")) / 7.0)
            .cast("long").as("rw"),
          col("value").cast("decimal(18,6)").as("v"))
      val m = e.groupBy("rw").agg(
        sum("tr").cast("long").as("n_t"),
        sum(when(col("tr") === 1, col("v"))).as("s_t"),
        sum(when(col("tr") === 1,
          col("v") * col("v").cast("decimal(19,6)"))).as("q_t"),
        sum(lit(1) - col("tr")).cast("long").as("n_c"),
        sum(when(col("tr") === 0, col("v"))).as("s_c"),
        sum(when(col("tr") === 0,
          col("v") * col("v").cast("decimal(19,6)"))).as("q_c"))
      def dbl(n: String) = col(n).cast("double")
      val d = m.select(col("rw"), col("n_t"), col("n_c"),
        (dbl("s_t") / col("n_t") - dbl("s_c") / col("n_c")).as("diff"),
        sqrt((dbl("q_t") - dbl("s_t") * dbl("s_t") / col("n_t"))
          / (col("n_t") - 1) / col("n_t")
          + (dbl("q_c") - dbl("s_c") * dbl("s_c") / col("n_c"))
          / (col("n_c") - 1) / col("n_c")).as("se"))
        .localCheckpoint() // rel-week frame, read by three passes
      val ref = d.where(col("rw") === -1)
        .select(col("diff").as("ref_diff"))
      val pre = d.crossJoin(broadcast(ref)).where(col("rw") < -1)
        .agg(max(abs(col("diff") - col("ref_diff"))).as("max_pre_beta"))
      d.crossJoin(broadcast(ref)).crossJoin(broadcast(pre))
        .select(col("rw").as("rel_week"), col("n_t"), col("n_c"),
          round(col("diff"), 6).as("diff"),
          round(col("diff") - col("ref_diff"), 6).as("beta"),
          round(col("se"), 6).as("se_diff"),
          when(col("rw") < 0, 1L).otherwise(0L).as("is_pre"),
          round(col("max_pre_beta"), 6).as("max_pre_beta"))
        .orderBy("rel_week")
    },

    // ---- upper-tail dependence (joint-exceedance audit) ----
    // The copula-flavored question a marginal drift monitor can't
    // answer: when one measure is extreme, how often is the other?
    // Empirical upper-tail dependence λ̂_U(q) = P(Y > y_q | X > x_q)
    // (Sibuya 1960; the λ_U of extreme-value copula theory), compared
    // against the ≈(1−q) independence baseline that rides next to it —
    // here on the genuinely dependent (l_quantity, l_extendedprice)
    // pair. INTEGER-EXACT: the X threshold is the exact rank-⌈qn⌉
    // order statistic off the 50-value quantity domain; the Y
    // threshold is the q_hdr_quantiles BUCKET LOWER BOUND at the same
    // rank (the portable sketch quantile — both engines recompute the
    // identical integer, and the threshold is EMITTED so the statistic
    // is fully specified by its own output); exceedance counts are one
    // conditional aggregation. 100-TB story: two bounded-frame
    // threshold reads + one corpus counting pass.
    sql(
      "q_tail_dependence",
      """WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |qs AS (SELECT CAST(p AS BIGINT) AS p, (p * n.n + 99) // 100 AS r
        |       FROM (SELECT unnest([90, 95]) AS p), n),
        |xc AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
        |xcum AS (SELECT x, CAST(sum(c) OVER (ORDER BY x) AS BIGINT) AS cm
        |         FROM xc),
        |xq AS (SELECT qs.p, qs.r, min(xcum.x) AS xq
        |       FROM qs JOIN xcum ON xcum.cm >= qs.r GROUP BY 1, 2),
        |ye AS (SELECT y, length(bin(y)) AS bl FROM v),
        |yx AS (SELECT y, CASE WHEN bl <= 7 THEN y
        |                 ELSE bl * 64 + (y >> (bl - 7)) - 64 END AS idx,
        |              CASE WHEN bl <= 7 THEN y
        |                 ELSE (y >> (bl - 7)) << (bl - 7) END AS lb
        |       FROM ye),
        |yh AS (SELECT idx, lb, CAST(count(*) AS BIGINT) AS c
        |       FROM yx GROUP BY 1, 2),
        |ycum AS (SELECT idx, lb,
        |           CAST(sum(c) OVER (ORDER BY idx) AS BIGINT) AS cm FROM yh),
        |yq AS (SELECT qs.p, min_by(ycum.lb, ycum.idx) AS yq
        |       FROM qs JOIN ycum ON ycum.cm >= qs.r GROUP BY 1),
        |cnts AS (SELECT xq.p, xq.xq, yq.yq,
        |    CAST(sum(CASE WHEN v.x > xq.xq THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_x_exc,
        |    CAST(sum(CASE WHEN v.y > yq.yq THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_y_exc,
        |    CAST(sum(CASE WHEN v.x > xq.xq AND v.y > yq.yq
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_joint
        |  FROM v CROSS JOIN xq JOIN yq ON yq.p = xq.p
        |  GROUP BY 1, 2, 3)
        |SELECT c.p AS q_pct, c.xq AS x_threshold, c.yq AS y_threshold_lb,
        |  c.n_x_exc, c.n_y_exc, c.n_joint,
        |  round(CAST(c.n_joint AS DOUBLE) / c.n_x_exc, 6) AS lambda_u,
        |  round(CAST(c.n_y_exc AS DOUBLE) / n.n, 6) AS indep_baseline
        |FROM cnts c CROSS JOIN n ORDER BY q_pct""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val v = t(s, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("x"),
          (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
            .as("y"))
      val n = v.agg(count(lit(1)).as("n")).localCheckpoint()
      val qs = s.range(1)
        .select(explode(array(lit(90), lit(95))).as("p"))
        .crossJoin(broadcast(n))
        .selectExpr("CAST(p AS BIGINT) AS p", "(p * n + 99) div 100 AS r")
      val xcum = v.groupBy("x").agg(count(lit(1)).as("c"))
        .withColumn("cm", sum("c").over(Window.orderBy("x")))
      val xq = broadcast(qs).join(xcum, col("cm") >= col("r"))
        .groupBy("p", "r").agg(min("x").as("xq"))
      def shr(c: Column, bits: Column) =
        call_function("shiftright", c, bits.cast("int"))
      def shl(c: Column, bits: Column) =
        call_function("shiftleft", c, bits.cast("int"))
      val yx = v.withColumn("bl", length(bin(col("y"))))
        .select(
          when(col("bl") <= 7, col("y"))
            .otherwise(col("bl").cast("long") * 64
              + shr(col("y"), col("bl") - 7) - 64).as("idx"),
          when(col("bl") <= 7, col("y"))
            .otherwise(shl(shr(col("y"), col("bl") - 7), col("bl") - 7))
            .as("lb"))
      val ycum = yx.groupBy("idx", "lb").agg(count(lit(1)).as("c"))
        .withColumn("cm", sum("c").over(Window.orderBy("idx")))
      val yq = broadcast(qs).join(ycum, col("cm") >= col("r"))
        .groupBy("p").agg(min_by(col("lb"), col("idx")).as("yq"))
      val thr = xq.join(yq, "p").localCheckpoint() // 2 rows
      val cnts = v.crossJoin(broadcast(thr))
        .groupBy("p", "xq", "yq")
        .agg(sum(when(col("x") > col("xq"), 1L).otherwise(0L)).cast("long")
          .as("n_x_exc"),
          sum(when(col("y") > col("yq"), 1L).otherwise(0L)).cast("long")
            .as("n_y_exc"),
          sum(when(col("x") > col("xq") && col("y") > col("yq"), 1L)
            .otherwise(0L)).cast("long").as("n_joint"))
      cnts.crossJoin(broadcast(n))
        .select(col("p").as("q_pct"), col("xq").as("x_threshold"),
          col("yq").as("y_threshold_lb"), col("n_x_exc"), col("n_y_exc"),
          col("n_joint"),
          round(col("n_joint").cast("double") / col("n_x_exc"), 6)
            .as("lambda_u"),
          round(col("n_y_exc").cast("double") / col("n"), 6)
            .as("indep_baseline"))
        .orderBy("q_pct")
    },

    // ---- systematic PPS sampling + Horvitz–Thompson estimate ----
    // The survey-sampling primitive the q_neyman_allocation /
    // q_ipf_raking family was missing: probability-proportional-to-
    // size selection (Madow 1949's systematic method — DETERMINISTIC
    // with a pinned zero start, no RNG: a unit is hit once per
    // revenue-scaled boundary ⌊cum·m/T⌋ it crosses, computable as one
    // integer-division difference off the cumulative frame — large
    // units can be hit multiple times, which is exactly PPS-with-
    // replacement's multiplicity) and the Horvitz–Thompson estimator
    // read off the draw: the pps-weighted QUANTITY estimate
    // Σ hits·q_i·T/(m·y_i) against the true corpus total, so the
    // output itself shows how close one systematic draw lands. (The
    // revenue total estimates as exactly T by construction — that
    // identity is the method's self-check and rides as ht_rev_exact.)
    // 100-TB story: one corpus collapse to the part frame; the
    // cumulative window is part-dimension-sized; selection is a
    // projection.
    sql(
      "q_pps_sampling",
      """WITH y AS (SELECT l_partkey AS part,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |             AS BIGINT)) AS BIGINT) AS rev,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1),
        |tt AS (SELECT CAST(sum(rev) AS BIGINT) AS t,
        |         CAST(sum(qty) AS BIGINT) AS true_qty,
        |         CAST(count(*) AS BIGINT) AS n_parts FROM y),
        |c AS (SELECT part, rev, qty, t, true_qty, n_parts,
        |        CAST(sum(rev) OVER (ORDER BY part) AS BIGINT) AS cum
        |      FROM y CROSS JOIN tt),
        |s AS (SELECT part, rev, qty, t, true_qty, n_parts,
        |        (cum * 100) // t - ((cum - rev) * 100) // t AS hits
        |      FROM c),
        |a AS (SELECT CAST(max(t) AS BIGINT) AS t,
        |        CAST(max(true_qty) AS BIGINT) AS true_qty,
        |        CAST(max(n_parts) AS BIGINT) AS n_parts,
        |        CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_selected,
        |        CAST(sum(hits) AS BIGINT) AS total_hits,
        |        CAST(sum(CASE WHEN hits > 0
        |            THEN CAST(round(hits * CAST(qty AS DOUBLE) * t
        |                            / (100.0e0 * rev) * 1000000) AS BIGINT)
        |            ELSE 0 END) AS BIGINT) AS ht_qty_u6
        |      FROM s)
        |SELECT n_parts, CAST(100 AS BIGINT) AS m_draws, n_selected,
        |  total_hits, t AS total_rev_cents, true_qty, ht_qty_u6,
        |  round(CAST(ht_qty_u6 AS DOUBLE) / 1000000 / true_qty, 6)
        |    AS ht_ratio,
        |  CAST(CASE WHEN total_hits = 100 THEN 1 ELSE 0 END AS BIGINT)
        |    AS ht_rev_exact
        |FROM a""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val y = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("part"))
        .agg(sum((col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long")).cast("long").as("rev"),
          sum(col("l_quantity").cast("long")).cast("long").as("qty"))
      val tt = y.agg(sum("rev").cast("long").as("t"),
        sum("qty").cast("long").as("true_qty"),
        count(lit(1)).as("n_parts"))
      // part-dimension-sized cumulative window (bounded by #parts)
      val c = y.crossJoin(broadcast(tt))
        .withColumn("cum", sum("rev").over(Window.orderBy("part")))
      val sel = c.selectExpr("part", "rev", "qty", "t", "true_qty",
        "n_parts",
        "(cum * 100) div t - ((cum - rev) * 100) div t AS hits")
      // per-term micro-unit rounding makes the HT sum a BIGINT —
      // order-independent at any parallelism (a raw double sum's
      // accumulation order differs between engines)
      val term = round(col("hits") * col("qty").cast("double") * col("t")
        / (lit(100.0) * col("rev")) * 1000000).cast("long")
      sel.agg(max("t").cast("long").as("t"),
          max("true_qty").cast("long").as("true_qty"),
          max("n_parts").cast("long").as("n_parts"),
          sum(when(col("hits") > 0, 1L).otherwise(0L)).cast("long")
            .as("n_selected"),
          sum("hits").cast("long").as("total_hits"),
          sum(when(col("hits") > 0, term).otherwise(0L)).cast("long")
            .as("ht_qty_u6"))
        .select(col("n_parts"), lit(100L).as("m_draws"), col("n_selected"),
          col("total_hits"), col("t").as("total_rev_cents"),
          col("true_qty"), col("ht_qty_u6"),
          round(col("ht_qty_u6").cast("double") / 1000000 / col("true_qty"),
            6).as("ht_ratio"),
          when(col("total_hits") === 100, 1L).otherwise(0L)
            .as("ht_rev_exact"))
    },

    // ---- capture–recapture population estimation ----
    // Lincoln–Petersen / Chapman (1951): estimate a population's size
    // from two overlapping "captures" — the coverage-estimation trick
    // a data platform uses when NO source sees everything (how many
    // total users exist, given two logs that each saw some?). Capture
    // 1 = users who clicked, capture 2 = users who purchased; the
    // overlap m calibrates the estimate N̂ = n₁n₂/m (Chapman's
    // (n₁+1)(n₂+1)/(m+1) − 1 corrects the small-m bias). Because this
    // corpus DOES record the truth (distinct users over all events),
    // the true N and the estimate error ride in the output — the
    // estimator audits itself. Integer counts end-to-end, two final
    // divisions. 100-TB story: one user-grain collapse with two
    // conditional max flags, then 1-row math.
    sql(
      "q_capture_recapture",
      """WITH b AS (SELECT min(CAST(ts AS DATE)) AS mn FROM events),
        |u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'click'
        |              AND date_diff('day', b.mn, CAST(ts AS DATE)) < 3
        |             THEN 1 ELSE 0 END) AS c1,
        |    max(CASE WHEN event_type = 'click'
        |              AND date_diff('day', b.mn, CAST(ts AS DATE)) >= 27
        |             THEN 1 ELSE 0 END) AS c2
        |  FROM events CROSS JOIN b GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS true_n,
        |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |    CAST(sum(c1 * c2) AS BIGINT) AS m_both
        |  FROM u)
        |SELECT n1, n2, m_both, true_n,
        |  round(CAST(n1 AS DOUBLE) * n2 / m_both, 2) AS lincoln_petersen,
        |  round((CAST(n1 + 1 AS DOUBLE)) * (n2 + 1) / (m_both + 1) - 1, 2)
        |    AS chapman,
        |  round(((CAST(n1 + 1 AS DOUBLE)) * (n2 + 1) / (m_both + 1) - 1
        |         - true_n) / true_n, 6) AS chapman_rel_err
        |FROM m""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val b = ev.agg(min(to_date(col("ts"))).as("mn"))
      // the two captures are the FIRST and LAST 3 days' clickers —
      // overlapping but partial samples of the user population, so
      // the estimate is non-degenerate (every user has every event
      // type over the full month, which made whole-corpus captures
      // trivially complete)
      val off = datediff(to_date(col("ts")), col("mn"))
      val u = ev.crossJoin(broadcast(b)).groupBy("user_id")
        .agg(max(when(col("event_type") === "click" && off < 3, 1L)
          .otherwise(0L)).as("c1"),
          max(when(col("event_type") === "click" && off >= 27, 1L)
            .otherwise(0L)).as("c2"))
      val m = u.agg(count(lit(1)).as("true_n"),
        sum("c1").cast("long").as("n1"), sum("c2").cast("long").as("n2"),
        sum(col("c1") * col("c2")).cast("long").as("m_both"))
      val chapman = (col("n1") + 1).cast("double") * (col("n2") + 1)
        ./(col("m_both") + 1) - 1
      m.select(col("n1"), col("n2"), col("m_both"), col("true_n"),
        round(col("n1").cast("double") * col("n2") / col("m_both"), 2)
          .as("lincoln_petersen"),
        round(chapman, 2).as("chapman"),
        round((chapman - col("true_n")) / col("true_n"), 6)
          .as("chapman_rel_err"))
    },

    // ---- Chao1 vocabulary-richness estimate ----
    // Chao (1984): the nonparametric lower bound on how many DISTINCT
    // tokens the full population holds, from just the singleton/
    // doubleton counts of the sample — the "how much vocabulary would
    // a 100-TB crawl add" planning number next to q_heaps_law's
    // growth-curve fit (Chao1 needs no fit, and Good's coverage
    // estimate Ĉ = 1 − f₁/N rides as the fraction of the population's
    // token MASS the sample already saw — the Good–Turing view of the
    // same spectrum). Bias-corrected form D + f₁(f₁−1)/(2(f₂+1)).
    // Integer spectrum counts, two final divisions. 100-TB story: one
    // tokenize pass → frequency spectrum (map-side combined), 1-row
    // math.
    sql(
      "q_chao1_richness",
      """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT unnest(list_transform(range(1, len(w)),
        |                     i -> hash(w[i], w[i + 1]))) AS token
        |       FROM t),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1),
        |sp AS (SELECT CAST(sum(n) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS d_distinct,
        |    CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM c)
        |SELECT n_tokens, d_distinct, f1, f2,
        |  round(d_distinct
        |        + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0e0 * (f2 + 1)), 2)
        |    AS chao1,
        |  round(1.0e0 - CAST(f1 AS DOUBLE) / n_tokens, 6) AS good_coverage
        |FROM sp""".stripMargin) { (s, dir) =>
      // BIGRAM spectrum: the unigram lexicon of this corpus is only
      // ~31 high-frequency words (f1 = f2 = 0 — Chao1 degenerates to
      // D), while the bigram space is genuinely open-vocabulary.
      // r11 (VERDICT #1): the spectrum only consumes COUNTS, never the
      // bigram text — hash each (w_i, w_i+1) pair to a digest BEFORE
      // the groupBy. No per-bigram string concat (the old shape
      // allocated one string per corpus bigram — the GC churn that
      // made this query the sweep's most inflation-sensitive), and the
      // spectrum shuffle carries fixed-width longs instead of text.
      // r13 (r12 VERDICT #1): BOTH engines hash — the oracle groups on
      // DuckDB's multi-arg 64-bit hash(w1, w2) (position-sensitive, no
      // separator ambiguity), the Spark side on ONE xxhash64(w1, w2).
      // The collision argument is now cross-engine-SYMMETRIC: each
      // engine partitions the bigram multiset by its own 64-bit
      // digest, so each carries the same ~n²/2⁶⁵ birthday risk (~4e-9
      // at this corpus's ~1e3 distinct bigrams; prevalidated exactly
      // collision-free on both engines at sf0.01 AND sf0.1 — distinct
      // digests == distinct exact strings == 916/931), and no engine
      // holds an exact-string advantage the other lacks. This removes
      // r12's second (salted) xxhash64 per bigram, halving the
      // per-bigram hash work and restoring the fixed-8-byte shuffle.
      // PERF (the r12 4.1 s regression, root-caused): transform/
      // element_at are interpreted (CodegenFallback), so inlining the
      // split() into the lambda re-tokenized each doc ~4×(len−1)
      // times (~1M regex splits at sf0.1). Materializing the token
      // array in its OWN projection (CollapseProject keeps a non-cheap
      // expr referenced 3× un-inlined) tokenizes each doc exactly
      // once; the lambda then does O(1) array reads.
      val toks = t(s, dir, "documents")
        .select(graft.functions.TextFunctions.tokens(col("text")).as("w"))
      val c = toks
        .select(explode(transform(sequence(lit(1), size(col("w")) - 1),
          i => xxhash64(element_at(col("w"), i),
            element_at(col("w"), i + 1)))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
      c.agg(sum("n").cast("long").as("n_tokens"),
          count(lit(1)).as("d_distinct"),
          sum(when(col("n") === 1, 1L).otherwise(0L)).cast("long").as("f1"),
          sum(when(col("n") === 2, 1L).otherwise(0L)).cast("long").as("f2"))
        .select(col("n_tokens"), col("d_distinct"), col("f1"), col("f2"),
          round(col("d_distinct") + col("f1").cast("double")
            * (col("f1") - 1) / (lit(2.0) * (col("f2") + 1)), 2).as("chao1"),
          round(lit(1.0) - col("f1").cast("double") / col("n_tokens"), 6)
            .as("good_coverage"))
    },

    // ---- variance inflation factors (multicollinearity audit) ----
    // The regression diagnostic that must run BEFORE q_ols_multi's
    // coefficients are trusted: VIF_j = 1/(1 − R²_j) where R²_j is
    // feature j regressed on the others — VIF ≳ 5-10 means the
    // coefficient's sign/size is an artifact of collinearity, not
    // signal. For three features the R²'s are closed-form in the
    // pairwise correlations (R²₁ = (r₁₂² + r₁₃² − 2r₁₂r₁₃r₂₃) /
    // (1 − r₂₃²)), so the whole audit is ONE DECIMAL moment collapse
    // (the q_corr_matrix pairing) + 1-row math. TPC-H's quantity /
    // discount / tax are independent by construction — VIF ≈ 1 is the
    // honest calibration read, and the op's value is the shape, not
    // this corpus's answer. 100-TB story: one corpus pass, 9 moments.
    sql(
      "q_vif",
      """WITH m AS (SELECT count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))) AS s1,
        |    sum(CAST(l_discount AS DECIMAL(15,4))) AS s2,
        |    sum(CAST(l_tax AS DECIMAL(15,4))) AS s3,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))
        |        * CAST(l_quantity AS DECIMAL(19,4))) AS s11,
        |    sum(CAST(l_discount AS DECIMAL(15,4))
        |        * CAST(l_discount AS DECIMAL(19,4))) AS s22,
        |    sum(CAST(l_tax AS DECIMAL(15,4))
        |        * CAST(l_tax AS DECIMAL(19,4))) AS s33,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))
        |        * CAST(l_discount AS DECIMAL(19,4))) AS s12,
        |    sum(CAST(l_quantity AS DECIMAL(15,4))
        |        * CAST(l_tax AS DECIMAL(19,4))) AS s13,
        |    sum(CAST(l_discount AS DECIMAL(15,4))
        |        * CAST(l_tax AS DECIMAL(19,4))) AS s23
        |  FROM lineitem),
        |c AS (SELECT CAST(n AS BIGINT) AS n,
        |    (n * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2)
        |      / sqrt((n * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
        |             * (n * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2))
        |      AS r12,
        |    (n * CAST(s13 AS DOUBLE) - CAST(s1 AS DOUBLE) * s3)
        |      / sqrt((n * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
        |             * (n * CAST(s33 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3))
        |      AS r13,
        |    (n * CAST(s23 AS DOUBLE) - CAST(s2 AS DOUBLE) * s3)
        |      / sqrt((n * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2)
        |             * (n * CAST(s33 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3))
        |      AS r23
        |  FROM m)
        |SELECT n, round(r12, 6) AS r12, round(r13, 6) AS r13,
        |  round(r23, 6) AS r23,
        |  round(1 / (1 - (r12 * r12 + r13 * r13 - 2 * r12 * r13 * r23)
        |                 / (1 - r23 * r23)), 6) AS vif_quantity,
        |  round(1 / (1 - (r12 * r12 + r23 * r23 - 2 * r12 * r23 * r13)
        |                 / (1 - r13 * r13)), 6) AS vif_discount,
        |  round(1 / (1 - (r13 * r13 + r23 * r23 - 2 * r13 * r23 * r12)
        |                 / (1 - r12 * r12)), 6) AS vif_tax
        |FROM c""".stripMargin) { (s, dir) =>
      val d15 = (c: Column) => c.cast("decimal(15,4)")
      val d19 = (c: Column) => c.cast("decimal(19,4)")
      val (x1, x2, x3) = (col("l_quantity"), col("l_discount"), col("l_tax"))
      // r13 (guide §2.5, Tables.wide): shuffle-width moment pass
      val m = Tables.wide(t(s, dir, "lineitem").select(x1, x2, x3),
          x1, x2, x3).agg(count(lit(1)).as("n"),
        sum(d15(x1)).as("s1"), sum(d15(x2)).as("s2"), sum(d15(x3)).as("s3"),
        sum(d15(x1) * d19(x1)).as("s11"), sum(d15(x2) * d19(x2)).as("s22"),
        sum(d15(x3) * d19(x3)).as("s33"), sum(d15(x1) * d19(x2)).as("s12"),
        sum(d15(x1) * d19(x3)).as("s13"), sum(d15(x2) * d19(x3)).as("s23"))
      def dbl(n: String) = col(n).cast("double")
      val nD = col("n")
      def corr(sjk: String, sj: String, sk: String, sjj: String,
          skk: String) =
        (nD * dbl(sjk) - dbl(sj) * col(sk)) /
          sqrt((nD * dbl(sjj) - dbl(sj) * col(sj))
            * (nD * dbl(skk) - dbl(sk) * col(sk)))
      val c = m.select(col("n").cast("long").as("n"),
        corr("s12", "s1", "s2", "s11", "s22").as("r12"),
        corr("s13", "s1", "s3", "s11", "s33").as("r13"),
        corr("s23", "s2", "s3", "s22", "s33").as("r23"))
      def vif(a: String, b: String, c0: String) =
        round(lit(1) / (lit(1) - (col(a) * col(a) + col(b) * col(b)
          - lit(2) * col(a) * col(b) * col(c0))
          / (lit(1) - col(c0) * col(c0))), 6)
      c.select(col("n"), round(col("r12"), 6).as("r12"),
        round(col("r13"), 6).as("r13"), round(col("r23"), 6).as("r23"),
        vif("r12", "r13", "r23").as("vif_quantity"),
        vif("r12", "r23", "r13").as("vif_discount"),
        vif("r13", "r23", "r12").as("vif_tax"))
    },

    // ---- recommender coverage & intra-list diversity ----
    // The system-level eval q_item_cf's per-list accuracy numbers
    // can't give (Ge et al. 2010): a recommender that shows everyone
    // the same 3 blockbusters scores fine per-list and is useless as
    // a SYSTEM. Catalog coverage (share of the catalog that appears
    // in ANY top-3 list), aggregate reach, the most-recommended
    // item's list share (popularity concentration), and intra-list
    // similarity (mean pairwise co-purchase cosine INSIDE a list —
    // high ILS = redundant lists; unscored pairs count 0) — computed
    // over exactly q_item_cf's rec lists, re-derived from the shared
    // basket-pair core so the two queries cannot drift. 100-TB
    // story: the rec build is q_item_cf's bounded pair shape; the
    // eval adds a ≤ 3-pairs-per-list self-join on the rec frame and
    // two dimension-sized collapses.
    sql(
      "q_rec_coverage",
      s"""WITH $basketPairsSqlCtes,
        |sup AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS s FROM b GROUP BY 1),
        |e AS (SELECT p1 AS src, p2 AS dst, n_both FROM pairs WHERE n_both >= 2
        |      UNION ALL
        |      SELECT p2, p1, n_both FROM pairs WHERE n_both >= 2),
        |sc AS (SELECT e.src, e.dst,
        |         round(CAST(e.n_both AS DOUBLE)
        |               / sqrt(CAST(s1.s AS DOUBLE) * s2.s), 6) AS cosine
        |       FROM e JOIN sup s1 ON s1.l_partkey = e.src
        |              JOIN sup s2 ON s2.l_partkey = e.dst),
        |rec AS (SELECT src, dst, cosine FROM (
        |          SELECT *, row_number() OVER (PARTITION BY src
        |                    ORDER BY cosine DESC, dst) AS rn
        |          FROM sc) WHERE rn <= 3),
        |cat AS (SELECT CAST(count(*) AS BIGINT) AS n_catalog FROM sup),
        |lists AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n_lists,
        |            CAST(count(DISTINCT dst) AS BIGINT) AS n_recommended
        |          FROM rec),
        |topi AS (SELECT CAST(max(cnt) AS BIGINT) AS top_item_lists FROM
        |           (SELECT dst, count(*) AS cnt FROM rec GROUP BY 1)),
        |pr AS (SELECT a.src, a.dst AS d1, b2.dst AS d2
        |       FROM rec a JOIN rec b2 ON b2.src = a.src AND b2.dst > a.dst),
        |ils AS (SELECT count(*) AS n_pairs,
        |          CAST(sum(CAST(coalesce(sc.cosine, 0) AS DECIMAL(9,6)))
        |               AS DOUBLE) / count(*) AS ils
        |        FROM pr LEFT JOIN sc ON sc.src = pr.d1 AND sc.dst = pr.d2)
        |SELECT n_lists, n_recommended, n_catalog,
        |  round(CAST(n_recommended AS DOUBLE) / n_catalog, 6) AS coverage,
        |  top_item_lists,
        |  round(CAST(top_item_lists AS DOUBLE) / n_lists, 6) AS top_share,
        |  CAST(n_pairs AS BIGINT) AS n_intra_pairs,
        |  round(ils, 6) AS intra_list_sim
        |FROM lists CROSS JOIN cat CROSS JOIN topi CROSS JOIN ils"""
        .stripMargin) { (s, dir) =>
      val (baskets, rawPairs) = basketPairCounts(s, dir)
      val sup = baskets.select(explode(col("ps")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("s"))
      val p2 = rawPairs.where(col("n_both") >= 2)
      val e = p2.select(col("p1").as("src"), col("p2").as("dst"),
          col("n_both"))
        .unionByName(
          p2.select(col("p2").as("src"), col("p1").as("dst"), col("n_both")))
      val sc = e
        .join(sup.select(col("p").as("src"), col("s").as("s1")), Seq("src"))
        .join(sup.select(col("p").as("dst"), col("s").as("s2")), Seq("dst"))
        .select(col("src"), col("dst"),
          round(col("n_both").cast("double")
            / sqrt(col("s1").cast("double") * col("s2")), 6).as("cosine"))
        .localCheckpoint() // scored pair frame: rec build + ILS lookups
      val rk = Window.partitionBy("src").orderBy(desc("cosine"), col("dst"))
      val rec = sc.withColumn("rn", row_number().over(rk))
        .where(col("rn") <= 3).drop("rn")
        .localCheckpoint() // rec lists, read three ways
      val cat = sup.agg(count(lit(1)).as("n_catalog"))
      val lists = rec.agg(countDistinct("src").as("n_lists"),
        countDistinct("dst").as("n_recommended"))
      val topi = rec.groupBy("dst").agg(count(lit(1)).as("cnt"))
        .agg(max("cnt").as("top_item_lists"))
      val pr = rec.select(col("src"), col("dst").as("d1"))
        .join(rec.select(col("src"), col("dst").as("d2")), Seq("src"))
        .where(col("d2") > col("d1"))
      // 6dp cosines sum EXACTLY as DECIMAL(9,6) — a raw double avg's
      // accumulation order differs between engines
      val ils = pr
        .join(sc.select(col("src").as("d1"), col("dst").as("d2"),
          col("cosine")), Seq("d1", "d2"), "left")
        .agg(count(lit(1)).as("n_pairs"),
          (sum(coalesce(col("cosine"), lit(0.0)).cast("decimal(9,6)"))
            .cast("double") / count(lit(1))).as("ils"))
      lists.crossJoin(broadcast(cat)).crossJoin(broadcast(topi))
        .crossJoin(broadcast(ils))
        .select(col("n_lists"), col("n_recommended"), col("n_catalog"),
          round(col("n_recommended").cast("double") / col("n_catalog"), 6)
            .as("coverage"),
          col("top_item_lists"),
          round(col("top_item_lists").cast("double") / col("n_lists"), 6)
            .as("top_share"),
          col("n_pairs").cast("long").as("n_intra_pairs"),
          round(col("ils"), 6).as("intra_list_sim"))
    }
  )
}
