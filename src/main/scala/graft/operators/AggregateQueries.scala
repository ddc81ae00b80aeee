package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Aggregation surface: hash agg, distinct agg, rollup/cube/grouping
  * sets, approximate distinct, and a typed `Aggregator` UDAF that
  * reimplements the reference's per-video stats triple
  * (frames, fire-count, max-probability — /root/reference
  * streams/stream.py:380-386) as one partial-aggregable function.
  *
  * Scale notes: all of these are partial+final hash aggregates —
  * map-side combine happens before the shuffle, so the shuffle volume
  * is O(groups), not O(rows). `count_distinct` over two columns
  * expands; at 100 TB prefer `approx_count_distinct` (HLL, fixed-size
  * sketch, mergeable) — both are exposed below.
  */
object AggregateQueries {

  import QueryDef.{rowsOnly, sql}

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Mirrors the reference's per-key stats dict: (frames, fires, max prob). */
  final case class StatsBuf(n: Long, nHot: Long, maxV: Double)

  /** Typed partial-aggregable UDAF: count / conditional count / max in
    * one pass. `hot` threshold plays the role of the fire threshold. */
  class HotStatsAgg(threshold: Double) extends Aggregator[Double, StatsBuf, StatsBuf] {
    def zero: StatsBuf = StatsBuf(0L, 0L, Double.NegativeInfinity)
    def reduce(b: StatsBuf, v: Double): StatsBuf =
      StatsBuf(b.n + 1, b.nHot + (if (v > threshold) 1 else 0), math.max(b.maxV, v))
    def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
      StatsBuf(a.n + b.n, a.nHot + b.nHot, math.max(a.maxV, b.maxV))
    def finish(b: StatsBuf): StatsBuf = b
    def bufferEncoder = Encoders.product[StatsBuf]
    def outputEncoder = Encoders.product[StatsBuf]
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- TPC-H Q1 pricing summary (multi-aggregate hash agg) ----
    sql(
      "q_agg_pricing",
      // Money sums accumulate in DECIMAL(18,6): a double sum over
      // millions of ~1e4 terms carries summation-order error that
      // lands on round()'s half-ulp boundary at 1e11 magnitudes (the
      // 10× corpus sweep caught sum_charge off by the last cent), and
      // Spark's final-merge order isn't even run-deterministic. The
      // per-row product stays double (bit-identical in both engines);
      // only the ACCUMULATION is exact, so the result is
      // order-independent at any scale. Integral sums (quantity) are
      // exact in double below 2^53 and stay as-is.
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2)                                        AS sum_qty,
        |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
        |            AS DOUBLE)                                                  AS sum_base,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |            AS DECIMAL(18,6))), 2) AS DOUBLE)                           AS sum_disc,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |            AS DECIMAL(18,6))), 2) AS DOUBLE)                           AS sum_charge,
        |       round(avg(l_quantity), 4)                                        AS avg_qty,
        |       count(*)                                                         AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      def dsum(c: Column) = sum(c.cast("decimal(18,6)"))
      // r13 (guide §2.5, Tables.wide): three decimal product sums per
      // row ran inside the serial one-task scan; the shipdate filter
      // still pushes to the scan below the exchange
      graft.Tables.wide(t(s, dir, "lineitem")
          .where(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax")),
          col("l_extendedprice"), col("l_quantity"), col("l_discount"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(dsum(col("l_extendedprice")), 2).cast("double").as("sum_base"),
          round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .cast("double").as("sum_disc"),
          round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 2).cast("double").as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- distinct aggregates ----
    sql(
      "q_count_distinct",
      """SELECT l_returnflag,
        |       count(DISTINCT l_suppkey) AS n_supp,
        |       count(DISTINCT l_partkey) AS n_part,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // ---- approximate distinct (HLL sketch; the 100 TB-scale path).
    // Sketch values are engine-specific (Spark HLL++ vs DuckDB's
    // sketch) so the raw estimate can never hash-match an oracle.
    // Instead the accuracy CONTRACT is emitted as data: exact counts
    // plus `*_ok` booleans asserting |approx − exact| ≤ 3σ (rsd =
    // 0.02 → 6%). DuckDB reproduces the exact columns and literal
    // `true` flags, so the driver's value-hash gate now enforces the
    // HLL bound itself (VERDICT r5 ask #5); AccuracySpec keeps
    // bounding the raw estimates.
    //
    // Split-distinct shape: two DISTINCTs on DIFFERENT columns in one
    // agg make Spark Expand-triple every row before the shuffle; each
    // exact count instead dedups only its own narrow (flag, key)
    // pairs, the HLL pass stays Expand-free, and the three 5-row
    // results broadcast-join back together (same plan family as
    // q_profile_stats — measured 5.9 s → ~2 s at sf0.1). ----
    sql(
      "q_approx_distinct",
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |       true AS parts_ok, true AS orders_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_returnflag", "l_partkey", "l_orderkey")
      val nParts = li.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_parts"))
      val nOrders = li.select("l_returnflag", "l_orderkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_orders"))
      val approx = li.groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
      nParts
        .join(broadcast(nOrders), "l_returnflag")
        .join(broadcast(approx), "l_returnflag")
        .select(col("l_returnflag"), col("n_parts"), col("n_orders"),
          (abs(col("ap") - col("n_parts")) <= col("n_parts") * 0.06).as("parts_ok"),
          (abs(col("ao") - col("n_orders")) <= col("n_orders") * 0.06).as("orders_ok"))
        .orderBy("l_returnflag")
    },

    // ---- arg-extremum (min_by/max_by on a UNIQUE ordering key — ties
    //      would be engine-dependent) and bitwise aggregates (floor
    //      before the int cast: CAST rounds in DuckDB, truncates in
    //      Spark) ----
    sql(
      "q_arg_minmax",
      """SELECT event_type,
        |       min_by(user_id, event_id) AS first_user,
        |       max_by(user_id, event_id) AS last_user,
        |       CAST(bit_and(CAST(floor(value) AS BIGINT)) AS BIGINT) AS v_and,
        |       CAST(bit_or(CAST(floor(value) AS BIGINT)) AS BIGINT) AS v_or,
        |       CAST(bit_xor(CAST(floor(value) AS BIGINT)) AS BIGINT) AS v_xor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val v = floor(col("value")).cast("bigint")
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          min_by(col("user_id"), col("event_id")).as("first_user"),
          max_by(col("user_id"), col("event_id")).as("last_user"),
          bit_and(v).as("v_and"), bit_or(v).as("v_or"), bit_xor(v).as("v_xor"))
        .orderBy("event_type")
    },

    // ---- approximate percentile (mergeable digest — exact
    //      percentiles need a full sort per group; this is what runs
    //      at 100 TB). Digest picks are engine-specific, so the
    //      oracle checks the CONTRACT: exact interpolated percentiles
    //      (q_percentile parity) plus `*_ok` booleans asserting each
    //      digest value lies inside the exact [p−0.01, p+0.01]
    //      quantile band — vastly wider than the digest's rank-ε
    //      guarantee (ε = 1/10000) yet still a value-level check the
    //      hash gate enforces (VERDICT r5 ask #5). AccuracySpec keeps
    //      the tight rank-ε band on the raw digest values. ----
    sql(
      "q_approx_percentile",
      """SELECT event_type,
        |       round(CAST(quantile_cont(value, 0.25) AS DOUBLE), 4) AS p25,
        |       round(CAST(quantile_cont(value, 0.5)  AS DOUBLE), 4) AS p50,
        |       round(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4) AS p95,
        |       true AS p25_ok, true AS p50_ok, true AS p95_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ex = expr(
        "percentile(value, array(0.24D, 0.25D, 0.26D, 0.49D, 0.5D, 0.51D, 0.94D, 0.95D, 0.96D))")
      def okFlag(lo: Int, ap: Int, hi: Int) =
        element_at(col("ap"), ap)
          .between(element_at(col("ex"), lo), element_at(col("ex"), hi))
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          ex.as("ex"),
          percentile_approx(
            col("value"), array(lit(0.25), lit(0.5), lit(0.95)), lit(10000)).as("ap"))
        .select(col("event_type"),
          round(element_at(col("ex"), 2), 4).as("p25"),
          round(element_at(col("ex"), 5), 4).as("p50"),
          round(element_at(col("ex"), 8), 4).as("p95"),
          okFlag(1, 1, 3).as("p25_ok"),
          okFlag(4, 2, 6).as("p50_ok"),
          okFlag(7, 3, 9).as("p95_ok"))
        .orderBy("event_type")
    },

    // ---- HLL sketch lifecycle (DataSketches, Spark 3.5+): build one
    //      sketch per source partition, STORE the sketch bytes, and
    //      union them later for the global estimate — the pattern that
    //      lets a 100 TB pipeline maintain distinct counts
    //      incrementally without ever rescanning history. Sketch
    //      encoding is engine-private, so the oracle checks exact
    //      distinct counts plus an `est_ok` boolean asserting the
    //      estimate (including the one that went through the sketch
    //      UNION) lands within max(6%, 1) of exact — the hash gate
    //      enforces the estimate's contract value-wise (VERDICT r5
    //      ask #5); AccuracySpec keeps bounding the raw estimates. ----
    sql(
      "q_hll_sketch_union",
      """SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, true AS est_ok
        |FROM documents GROUP BY source
        |UNION ALL
        |SELECT 'ALL' AS source, CAST(count(DISTINCT lang) AS BIGINT), true FROM documents
        |ORDER BY source""".stripMargin) { (s, dir) =>
      val perSource = t(s, dir, "documents")
        .groupBy("source")
        .agg(hll_sketch_agg(col("lang")).as("sk"),
          countDistinct(col("lang")).as("n_langs"))
        .cache() // consumed per-source and by the union
      val per = perSource.select(col("source"), col("n_langs"),
        hll_sketch_estimate(col("sk")).as("est"))
      val overallExact = t(s, dir, "documents")
        .agg(countDistinct(col("lang")).as("n_langs"))
      val overall = perSource.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .crossJoin(broadcast(overallExact)) // 1 row × 1 row
        .select(lit("ALL").as("source"), col("n_langs"), col("est"))
      per.unionByName(overall)
        .select(col("source"), col("n_langs"),
          (abs(col("est") - col("n_langs")) <=
            greatest(col("n_langs") * 0.06, lit(1.0))).as("est_ok"))
        .orderBy("source")
    },

    // ---- rollup (nation within region hierarchy) ----
    sql(
      "q_rollup",
      """SELECT coalesce(r.r_name, 'ALL') AS region_name,
        |       CASE WHEN r.r_name IS NULL THEN 'ALL'
        |            ELSE coalesce(n.n_name, 'ALL') END AS nation_name,
        |       count(c.c_custkey) AS n_cust,
        |       round(sum(c.c_acctbal), 2) AS bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r.r_name, n.n_name)
        |ORDER BY region_name, nation_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"), round(sum(col("c_acctbal")), 2).as("bal"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region_name"),
          when(col("r_name").isNull, lit("ALL"))
            .otherwise(coalesce(col("n_name"), lit("ALL"))).as("nation_name"),
          col("n_cust"), col("bal"))
        .orderBy("region_name", "nation_name")
    },

    // ---- cube ----
    sql(
      "q_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("qty"))
        .orderBy("flag", "status")
    },

    // ---- explicit grouping sets ----
    sql(
      "q_grouping_sets",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin) { (s, dir) =>
      // Native Dataset API (Spark 4 groupingSets) — not a SQL-string
      // passthrough, which would only test Spark's parser against
      // DuckDB's and leak a temp view into the shared session.
      // Decimal accumulation for the money sum: the '()' grand-total
      // set aggregates the whole table, where double summation order
      // hits round()'s last-cent boundary at the 10× corpus.
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double").as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    },

    // ---- typed Aggregator UDAF (reference A4 stats triple) ----
    sql(
      "q_udaf_stats",
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
        |       round(max(value), 2) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val agg = udaf(new HotStatsAgg(400.0), Encoders.scalaDouble)
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(agg(col("value")).as("stats"))
        .select(
          col("event_type"),
          col("stats.n").as("n"),
          col("stats.nHot").as("n_hot"),
          round(col("stats.maxV"), 2).as("max_v"))
        .orderBy("event_type")
    },

    // ---- salted two-phase aggregation (skew pattern).
    //      events has only 5 event_type values → a direct groupBy puts
    //      each hot key on one reducer. Salting spreads the partial
    //      aggregation across 16 sub-keys; the final combine touches
    //      only 5×16 rows. Result is identical to the direct groupBy
    //      (which is what the oracle runs). ----
    sql(
      "q_agg_salted",
      // Decimal accumulation is doubly load-bearing here: beyond the
      // corpus-proportional 5-group sum, the salted two-phase order
      // STRUCTURALLY differs from the oracle's direct sum — only an
      // order-independent accumulator makes them exactly equal.
      """SELECT event_type, count(*) AS n,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS v_sum,
        |       round(max(value), 2) AS v_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val partial = t(s, dir, "events")
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(18,6)")).as("pv"),
          max(col("value")).as("pm"))
      partial.groupBy("event_type")
        .agg(
          sum(col("pn")).as("n"),
          round(sum(col("pv")), 2).cast("double").as("v_sum"),
          round(max(col("pm")), 2).as("v_max"))
        .orderBy("event_type")
    },

    // ---- having-style post-aggregation filter ----
    sql(
      "q_having",
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spent
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 3
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("spent"))
        .where(col("n_orders") >= 3)
        .orderBy("o_custkey")
    },

    // ---- incremental aggregation: mergeable partial states ----
    // The materialized-view-maintenance primitive: aggregate state
    // computed over yesterday's base and today's delta MERGES into the
    // state of the union — sum/count/min/max are mergeable as-is, avg
    // derives from (sum, count) at read time. At 100 TB the base
    // state table is a few rows per group that never get re-scanned;
    // only the delta pays a pass. The oracle aggregates the full
    // table directly — merged state must equal the from-scratch
    // answer exactly.
    sql(
      "q_incr_agg",
      """SELECT l_returnflag,
        |       count(*) AS n,
        |       round(sum(l_quantity), 2) AS q_sum,
        |       round(min(l_quantity), 2) AS q_min,
        |       round(max(l_quantity), 2) AS q_max,
        |       round(sum(l_quantity) / count(*), 6) AS q_avg
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"), col("l_quantity"), col("l_orderkey"))
      def state(part: org.apache.spark.sql.DataFrame) = part
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("pn"), sum(col("l_quantity")).as("ps"),
          min(col("l_quantity")).as("pmin"), max(col("l_quantity")).as("pmax"))
      // base = the standing snapshot's state, delta = today's batch
      val base = state(li.where(col("l_orderkey") % 10 < 9))
      val delta = state(li.where(col("l_orderkey") % 10 === 9))
      base.unionByName(delta)
        .groupBy("l_returnflag")
        .agg(
          sum(col("pn")).as("n"),
          round(sum(col("ps")), 2).as("q_sum"),
          round(min(col("pmin")), 2).as("q_min"),
          round(max(col("pmax")), 2).as("q_max"),
          round(sum(col("ps")) / sum(col("pn")), 6).as("q_avg"))
        .orderBy("l_returnflag")
    },

    // ---- deterministic per-group mode ----
    // Engine mode() functions return an ARBITRARY value on frequency
    // ties (Spark's is explicitly non-deterministic), which makes the
    // raw function un-oracle-able and flaky in production reruns. The
    // deterministic rewrite — most frequent value, ties broken by
    // smallest value — is one count aggregation + a row_number over
    // the (group, #distinct-values) frame, the standard production
    // form. Reported with its frequency and share.
    sql(
      "q_mode_per_group",
      """WITH c AS (SELECT l_returnflag AS rf, l_quantity AS q,
        |             CAST(count(*) AS BIGINT) AS cnt
        |           FROM lineitem GROUP BY 1, 2),
        |tot AS (SELECT rf, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY rf)
        |SELECT c.rf, c.q AS mode_value, c.cnt AS mode_n,
        |       round(CAST(c.cnt AS DOUBLE) / t.n, 6) AS share
        |FROM (SELECT *, row_number() OVER (PARTITION BY rf
        |        ORDER BY cnt DESC, q) AS rn FROM c) c
        |JOIN tot t ON t.rf = c.rf
        |WHERE c.rn = 1 ORDER BY c.rf""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("rf"), col("l_quantity").as("q"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // (group × value-domain) rows: ranked + totaled
      val tot = c.groupBy("rf").agg(sum("cnt").as("n"))
      val rk = org.apache.spark.sql.expressions.Window
        .partitionBy("rf").orderBy(desc("cnt"), col("q"))
      c.withColumn("rn", row_number().over(rk))
        .where(col("rn") === 1)
        .join(broadcast(tot), Seq("rf"))
        .select(col("rf"), col("q").as("mode_value"), col("cnt").as("mode_n"),
          round(col("cnt").cast("double") / col("n"), 6).as("share"))
        .orderBy("rf")
    },

    // ---- Count-Min sketch build + point-query audit ----
    // The third sketch class after HLL (distinct) and Misra-Gries
    // (heavy hitters): CMS answers point frequency queries from d×w
    // counters — THE mergeable shape for per-key counts when the key
    // space is too wide to materialize. Build: each token increments
    // one bucket per hash row (d=4 portable salted h32 rows, w=1024),
    // ONE aggregation whose map-side combine collapses the ×4 fan-out
    // before the shuffle; the sketch is 4096 counters at ANY corpus
    // size and unions by addition. Audit: the top-15 exact words'
    // estimates (min over rows of their buckets) against exact counts
    // — CMS guarantees est ≥ exact (never undercounts) and bounds the
    // overcount by collision mass; the flag column makes the guarantee
    // a value-checked oracle row, not a comment.
    sql(
      "q_countmin",
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |rows_ AS (SELECT CAST(range AS BIGINT) AS r FROM range(0, 4)),
        |cells AS (SELECT r.r,
        |            ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || t.w), 1, 8))::BIGINT
        |              % 1024 AS b,
        |            CAST(count(*) AS BIGINT) AS c
        |          FROM tok t JOIN rows_ r ON TRUE GROUP BY 1, 2),
        |exact AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok
        |          GROUP BY w ORDER BY n DESC, w LIMIT 15),
        |est AS (SELECT e.w, e.n, min(c.c) AS est
        |        FROM exact e
        |        JOIN rows_ r ON TRUE
        |        JOIN cells c ON c.r = r.r
        |          AND c.b = ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || e.w), 1, 8))::BIGINT
        |                    % 1024
        |        GROUP BY e.w, e.n)
        |SELECT w, n AS exact_n, est, est >= n AS no_undercount,
        |       CAST(est - n AS BIGINT) AS overcount
        |FROM est ORDER BY exact_n DESC, w""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.{h32Salted, tokens}
      // serialized checkpoint: the exploded token frame is corpus-
      // proportional — the deserialized default starved third-decade
      // aggregations in the basket family (same lesson, NOTES r7)
      val tok = t(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("w"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        // feeds the sketch build AND the exact top-k
      val rows = s.range(0, 4).select(col("id").as("r"))
      // sketch build: one agg, ×4 row fan-out collapsed map-side
      val cells = tok.crossJoin(broadcast(rows))
        .groupBy(col("r"), (h32Salted(col("r"), col("w")) % 1024).as("b"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // the 4096-counter sketch, probed 4× below
      val exact = tok.groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("w")).limit(15)
      val probed = exact.crossJoin(broadcast(rows.withColumnRenamed("r", "pr")))
        .withColumn("pb", h32Salted(col("pr"), col("w")) % 1024)
        .join(cells, col("r") === col("pr") && col("b") === col("pb"))
        .groupBy("w", "n").agg(min(col("c")).as("est"))
      probed.select(col("w"), col("n").as("exact_n"), col("est"),
          (col("est") >= col("n")).as("no_undercount"),
          (col("est") - col("n")).cast("long").as("overcount"))
        .orderBy(desc("exact_n"), col("w"))
    },

    // ---- Bloom-filter false-positive-rate audit ----
    // The membership sketch measured, not assumed: build an m=16384-
    // bit / k=4 Bloom filter over the distinct user keys RELATIONALLY
    // (set bits = distinct hash positions — a Bloom filter IS a
    // distinct aggregation), probe a provably-disjoint shifted key
    // set, and report the observed false-positive rate against the
    // (1−e^(−kn/m))^k theory line. This is the sizing table read
    // before wiring a bloom join or a BloomDedupStream horizon; the
    // probe side proves the k-of-k semantics end-to-end. Theory term
    // raised by explicit multiplies, not pow() (glibc vs Math.pow
    // last-ulp divergence — the chi² non-choice).
    sql(
      "q_bloom_fpr",
      """WITH u AS (SELECT DISTINCT user_id AS key FROM events),
        |rows_ AS (SELECT CAST(range AS BIGINT) AS r FROM range(0, 4)),
        |bits AS (SELECT DISTINCT
        |    ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
        |                        || CAST(u.key AS VARCHAR)), 1, 8))::BIGINT
        |      % 16384 AS b
        |  FROM u JOIN rows_ r ON TRUE),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        |bs AS (SELECT CAST(count(*) AS BIGINT) AS set_bits FROM bits),
        |ph AS (SELECT u.key + 10000000 AS pkey, r.r,
        |    ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
        |                        || CAST(u.key + 10000000 AS VARCHAR)), 1, 8))::BIGINT
        |      % 16384 AS b
        |  FROM u JOIN rows_ r ON TRUE),
        |hits AS (SELECT pkey, CAST(count(*) AS BIGINT) AS inb
        |         FROM ph JOIN bits ON bits.b = ph.b GROUP BY pkey),
        |fp AS (SELECT CAST(sum(CASE WHEN inb = 4 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_fp FROM hits),
        |ov AS (SELECT CAST(count(*) AS BIGINT) AS n_overlap
        |       FROM u a JOIN u b ON b.key = a.key + 10000000),
        |th AS (SELECT 1 - exp(-CAST(4 AS DOUBLE) * (SELECT n FROM nn) / 16384)
        |         AS t1)
        |SELECT (SELECT n FROM nn) AS n_keys,
        |  CAST(16384 AS BIGINT) AS m_bits, CAST(4 AS BIGINT) AS k_hashes,
        |  (SELECT set_bits FROM bs) AS set_bits,
        |  (SELECT n_fp FROM fp) AS n_false_pos,
        |  (SELECT n_overlap FROM ov) AS probe_overlap,
        |  round(CAST((SELECT n_fp FROM fp) AS DOUBLE)
        |        / (SELECT n FROM nn), 6) AS observed_fpr,
        |  round((SELECT t1 * t1 * t1 * t1 FROM th), 6) AS theoretical_fpr
        |FROM nn LIMIT 1""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32Salted
      val u = t(s, dir, "events").select(col("user_id").as("key")).distinct()
        .localCheckpoint() // feeds insert positions, count, and probes
      val rows = s.range(0, 4).select(col("id").as("r"))
      val bits = u.crossJoin(broadcast(rows))
        .select((h32Salted(col("r"), col("key").cast("string")) % 16384).as("b"))
        .distinct()
        .localCheckpoint() // the filter itself (≤ m rows), probed below
      val nn = u.agg(count(lit(1)).as("n")).localCheckpoint()
      val bs = bits.agg(count(lit(1)).as("set_bits"))
      val ph = u.crossJoin(broadcast(rows))
        .select((col("key") + 10000000L).as("pkey"), col("r"))
        .withColumn("b", h32Salted(col("r"), col("pkey").cast("string")) % 16384)
      val hits = ph.join(bits, Seq("b")).groupBy("pkey")
        .agg(count(lit(1)).as("inb"))
      val fp = hits.agg(sum(when(col("inb") === 4, 1L).otherwise(0L)).as("n_fp"))
      // probe-disjointness as a value-checked column, not a comment:
      // any member key colliding with a shifted probe key would count
      // real members as "false" positives (review find, r7)
      val ov = u.join(u.select((col("key") + 10000000L).as("key")), Seq("key"))
        .agg(count(lit(1)).as("probe_overlap"))
      val t1 = lit(1.0) - exp(lit(-4.0).cast("double") * col("n") / 16384)
      nn.crossJoin(broadcast(bs)).crossJoin(broadcast(fp))
        .crossJoin(broadcast(ov))
        .select(col("n").as("n_keys"),
          lit(16384L).as("m_bits"), lit(4L).as("k_hashes"),
          col("set_bits"), col("n_fp").as("n_false_pos"),
          col("probe_overlap"),
          round(col("n_fp").cast("double") / col("n"), 6).as("observed_fpr"),
          round(t1 * t1 * t1 * t1, 6).as("theoretical_fpr"))
    },

    // ---- KMV bottom-k sketch (deterministic sample + distinct est) ----
    // The k-minimum-values sketch (Bar-Yossef 2002): the k smallest
    // md5-uniform hashes of the distinct user keys are simultaneously
    // (a) a deterministic, merge-able uniform sample of the key space
    // and (b) a distinct-count estimator n̂ = (k−1)/u_(k). Both sides
    // of a cross-cluster reconciliation can exchange just the k
    // hashes. The engine path is a per-partition top-k merge
    // (TakeOrdered over the distinct-key frame), never a global sort;
    // the exact count rides along as the audit the oracle pins.
    sql(
      "q_bottomk_sample",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |h AS (SELECT user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |      / 1152921504606846976.0 AS hu
        |  FROM u),
        |k AS (SELECT user_id, hu, row_number() OVER (ORDER BY hu, user_id) AS r
        |      FROM h QUALIFY r <= 100),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS k, max(hu) AS uk,
        |          CAST(sum(user_id) AS BIGINT) AS sample_id_sum
        |        FROM k),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM u)
        |SELECT k, round(uk, 6) AS kth_hash,
        |  round((k - 1) / uk, 2) AS est_distinct, exact_distinct,
        |  round(abs((k - 1) / uk - exact_distinct) / exact_distinct, 4)
        |    AS rel_err, sample_id_sum
        |FROM agg CROSS JOIN ex""".stripMargin) { (s, dir) =>
      val u = t(s, dir, "events").select(col("user_id")).distinct()
        .localCheckpoint() // distinct-key frame feeds sketch + exact audit
      val h = u.select(col("user_id"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long") / lit(1152921504606846976.0)).as("hu"))
      val bottom = h.orderBy(col("hu"), col("user_id")).limit(100)
      val agg = bottom.agg(count(lit(1)).as("k"), max("hu").as("uk"),
        sum("user_id").cast("long").as("sample_id_sum"))
      val ex = u.agg(count(lit(1)).as("exact_distinct"))
      agg.crossJoin(broadcast(ex))
        .select(col("k"), round(col("uk"), 6).as("kth_hash"),
          round((col("k") - 1) / col("uk"), 2).as("est_distinct"),
          col("exact_distinct"),
          round(abs((col("k") - 1) / col("uk") - col("exact_distinct"))
            / col("exact_distinct"), 4).as("rel_err"),
          col("sample_id_sum"))
    },

    // ---- portable HyperLogLog (cross-engine-exact registers) ----
    // The repo's other HLL paths (q_hll_sketch_union, DistinctStream)
    // go through the DataSketches library — engine-private bits, so
    // their oracles pin bound flags. This is the PORTABLE twin: a
    // from-scratch Flajolet-Durand-Gandouet HLL whose registers both
    // engines recompute bit-for-bit — m=64 buckets over a 60-bit
    // md5-derived hash (bucket = h mod 64, ρ = leading-zeros+1 of the
    // remaining 54 bits via the bin()-length identity, which is
    // string-exact in both engines; log2() is NOT — Spark computes it
    // as ln(x)/ln(2) and floor() flips at exact powers). The harmonic
    // denominator is summed as SCALED INTEGERS (Σ 2^(55−M_j), max
    // 64·2^55 < 2^62) so the only float ops are one division and the
    // small-range ln — float SUMMATION order can differ cross-engine
    // and 2^-55..2^0 terms don't fit one mantissa. α₆₄ = 0.709; the
    // ≤2.5m small-range correction m·ln(m/zeros) kicks in exactly when
    // both engines see the same integer (raw, zeros), so the branch
    // can't diverge. 100-TB story: ONE corpus pass, map-side
    // max-combine into 64 registers (mergeable by construction — the
    // cross-cluster distinct-count reconciliation primitive next to
    // q_bottomk_sample's KMV); exact distinct rides as the audit.
    sql(
      "q_hll_portable",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |h AS (SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |      FROM u),
        |b AS (SELECT h % 64 AS bucket, h // 64 AS rest FROM h),
        |r0 AS (SELECT bucket,
        |         max(CASE WHEN rest = 0 THEN 55
        |                  ELSE 55 - length(bin(rest)) END) AS m
        |       FROM b GROUP BY 1),
        |spine AS (SELECT unnest(range(0, 64)) AS bucket),
        |reg AS (SELECT s.bucket, coalesce(r0.m, 0) AS m
        |        FROM spine s LEFT JOIN r0 ON r0.bucket = s.bucket),
        |agg AS (SELECT CAST(sum(m) AS BIGINT) AS register_sum,
        |          CAST(max(m) AS BIGINT) AS register_max,
        |          CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros,
        |          CAST(sum(1::BIGINT << (55 - m)) AS BIGINT) AS denom_scaled
        |        FROM reg),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM u),
        |est AS (SELECT register_sum, register_max, zeros, exact_distinct,
        |          CASE WHEN 0.709e0 * 4096e0 * 36028797018963968e0 / denom_scaled <= 160
        |                AND zeros > 0
        |               THEN 64e0 * ln(64e0 / zeros)
        |               ELSE 0.709e0 * 4096e0 * 36028797018963968e0 / denom_scaled
        |          END AS e
        |        FROM agg CROSS JOIN ex)
        |SELECT register_sum, register_max, zeros,
        |       round(e, 2) AS est_distinct, exact_distinct,
        |       round(abs(e - exact_distinct) / exact_distinct, 4) AS rel_err
        |FROM est""".stripMargin) { (s, dir) =>
      val u = t(s, dir, "events").select(col("user_id")).distinct()
        .localCheckpoint() // feeds the sketch AND the exact audit
      val h = u.select(conv(substring(md5(col("user_id").cast("string")), 1, 15),
        16, 10).cast("long").as("h"))
      val b = h.select((col("h") % 64).as("bucket"),
        call_function("shiftright", col("h"), lit(6)).as("rest"))
      val r0 = b.groupBy("bucket")
        .agg(max(when(col("rest") === 0, 55)
          .otherwise(lit(55) - length(bin(col("rest"))))).as("m"))
      val spine = s.range(0, 64).select(col("id").as("bucket"))
      val reg = spine.join(r0, Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("m"), lit(0)).as("m"))
      val agg = reg.agg(
        sum("m").cast("long").as("register_sum"),
        max("m").cast("long").as("register_max"),
        sum(when(col("m") === 0, 1L).otherwise(0L)).cast("long").as("zeros"),
        sum(call_function("shiftleft", lit(1L), (lit(55) - col("m")).cast("int")))
          .cast("long").as("denom_scaled"))
      val ex = u.agg(count(lit(1)).as("exact_distinct"))
      val raw = lit(0.709) * 4096 * lit(36028797018963968.0) / col("denom_scaled")
      val e = when(raw <= 160 && col("zeros") > 0,
        lit(64.0) * log(lit(64.0) / col("zeros"))).otherwise(raw)
      agg.crossJoin(broadcast(ex))
        .select(col("register_sum"), col("register_max"), col("zeros"),
          round(e, 2).as("est_distinct"), col("exact_distinct"),
          round(abs(e - col("exact_distinct")) / col("exact_distinct"), 4)
            .as("rel_err"))
    },

    // ---- portable-HLL UNION (merge = per-bucket max, exactly) ----
    // The property that makes HLL the cross-cluster reconciliation
    // sketch: registers built per SHARD (here: per event_type) and
    // merged by per-bucket max are IDENTICAL — not approximately,
    // identically — to registers built over the pooled distinct set,
    // because max over a union is the max of per-shard maxes. This
    // query computes both sides and emits the bucket-equality count
    // (= 64), both register sums, and the shared estimate — so the
    // merge theorem is hash-checked as data, per engine, not assumed.
    // At 100 TB: each shard ships 64 bytes; the merge is a 64-row max.
    sql(
      "q_hll_union_portable",
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        |h AS (SELECT event_type,
        |        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |      FROM u),
        |b AS (SELECT event_type, h % 64 AS bucket, h // 64 AS rest FROM h),
        |pt AS (SELECT event_type, bucket,
        |         max(CASE WHEN rest = 0 THEN 55
        |                  ELSE 55 - length(bin(rest)) END) AS m
        |       FROM b GROUP BY 1, 2),
        |mg AS (SELECT bucket, max(m) AS m FROM pt GROUP BY bucket),
        |pl AS (SELECT bucket,
        |         max(CASE WHEN rest = 0 THEN 55
        |                  ELSE 55 - length(bin(rest)) END) AS m
        |       FROM (SELECT DISTINCT h % 64 AS bucket, h // 64 AS rest FROM h)
        |       GROUP BY bucket),
        |cmp AS (SELECT CAST(count(*) AS BIGINT) AS buckets_present,
        |          CAST(sum(CASE WHEN mg.m = pl.m THEN 1 ELSE 0 END) AS BIGINT)
        |            AS buckets_equal,
        |          CAST(sum(mg.m) AS BIGINT) AS merged_sum,
        |          CAST(sum(pl.m) AS BIGINT) AS pooled_sum
        |        FROM mg JOIN pl ON pl.bucket = mg.bucket),
        |ns AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_sources
        |       FROM events)
        |SELECT n_sources, buckets_present, buckets_equal,
        |       merged_sum, pooled_sum,
        |       merged_sum = pooled_sum AS merge_exact
        |FROM cmp, ns""".stripMargin) { (s, dir) =>
      val h = t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
        .select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val rho = max(when(col("rest") === 0, 55)
        .otherwise(lit(55) - length(bin(col("rest"))))).as("m")
      val b = h.select(col("event_type"), (col("h") % 64).as("bucket"),
        call_function("shiftright", col("h"), lit(6)).as("rest"))
      val pt = b.groupBy("event_type", "bucket").agg(rho)
      val mg = pt.groupBy("bucket").agg(max("m").as("mm"))
      val pl = b.select("bucket", "rest").distinct()
        .groupBy("bucket").agg(rho)
      val cmp = mg.join(pl, "bucket")
        .agg(count(lit(1)).as("buckets_present"),
          sum(when(col("mm") === col("m"), 1L).otherwise(0L)).as("buckets_equal"),
          sum("mm").cast("long").as("merged_sum"),
          sum("m").cast("long").as("pooled_sum"))
      val ns = h.select("event_type").distinct().agg(count(lit(1)).as("n_sources"))
      cmp.crossJoin(broadcast(ns))
        .select(col("n_sources"), col("buckets_present"), col("buckets_equal"),
          col("merged_sum"), col("pooled_sum"),
          (col("merged_sum") === col("pooled_sum")).as("merge_exact"))
    },

    // ---- theta sketch set operations (audience intersection) ----
    // The set-ops sketch next to q_hll_sketch_union's union-only HLL:
    // DataSketches theta sketches support INTERSECTION, the "overlap
    // of two huge audiences" primitive (users who click AND purchase)
    // that HLL fundamentally can't answer. Build: one mapPartitions
    // corpus pass emitting ≤ #partitions×2 compact partials (theta
    // state is a pure function of the value set — mergeable, order-
    // proof), then a per-type union and a 1-row intersection. The
    // exact twins ride the same query; the oracle pins the exacts and
    // the estimate-accuracy bound flags (the q_hll_sketch_union
    // bound-flag pattern — ±5% marginals at 3σ of the k=4096 theta
    // RSE, ±15% for the Jaccard-deflated intersection).
    sql(
      "q_theta_sketch_setops",
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
        |  FROM events GROUP BY 1)
        |SELECT CAST(sum(hc) AS BIGINT) AS exact_click,
        |  CAST(sum(hp) AS BIGINT) AS exact_purchase,
        |  CAST(sum(hc * hp) AS BIGINT) AS exact_both,
        |  round(CAST(sum(hc * hp) AS DOUBLE)
        |        / (sum(hc) + sum(hp) - sum(hc * hp)), 6) AS jaccard,
        |  TRUE AS click_est_ok, TRUE AS purchase_est_ok, TRUE AS both_est_ok
        |FROM u""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.datasketches.memory.Memory
      import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}
      val ev = t(s, dir, "events")
      val pairs = ev.where(col("event_type").isin("click", "purchase"))
        .select(col("event_type"), col("user_id")).as[(String, Long)]
      val partials = pairs.mapPartitions { it =>
        val m = scala.collection.mutable.Map[String, UpdateSketch]()
        it.foreach { case (ty, u) =>
          m.getOrElseUpdate(ty, UpdateSketch.builder().build()).update(u)
        }
        m.iterator.map { case (ty, sk) => (ty, sk.compact().toByteArray) }
      }
      val merged = partials.groupByKey(_._1).mapGroups { (ty, it) =>
        val un = SetOperation.builder().buildUnion()
        it.foreach { case (_, b) => un.union(Sketches.wrapSketch(Memory.wrap(b))) }
        (ty, un.getResult.toByteArray)
      }.toDF("ty", "bytes").localCheckpoint() // 2 rows
      val est = merged.where(col("ty") === "click")
        .select(col("bytes").as("bc"))
        .crossJoin(merged.where(col("ty") === "purchase")
          .select(col("bytes").as("bp")))
        .as[(Array[Byte], Array[Byte])]
        .map { case (bc, bp) =>
          val sc = Sketches.wrapSketch(Memory.wrap(bc))
          val sp = Sketches.wrapSketch(Memory.wrap(bp))
          val ix = SetOperation.builder().buildIntersection()
          ix.intersect(sc); ix.intersect(sp)
          (sc.getEstimate, sp.getEstimate, ix.getResult.getEstimate)
        }.toDF("est_c", "est_p", "est_b")
      val exact = ev.groupBy("user_id").agg(
          max(when(col("event_type") === "click", 1L).otherwise(0L)).as("hc"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("hp"))
        .agg(sum("hc").cast("long").as("exact_click"),
          sum("hp").cast("long").as("exact_purchase"),
          sum(col("hc") * col("hp")).cast("long").as("exact_both"))
      def ok(est: String, ex: String, tol: Double) =
        abs(col(est) - col(ex)) / col(ex) <= tol
      exact.crossJoin(broadcast(est))
        .select(col("exact_click"), col("exact_purchase"), col("exact_both"),
          round(col("exact_both").cast("double")
            / (col("exact_click") + col("exact_purchase") - col("exact_both")),
            6).as("jaccard"),
          ok("est_c", "exact_click", 0.05).as("click_est_ok"),
          ok("est_p", "exact_purchase", 0.05).as("purchase_est_ok"),
          ok("est_b", "exact_both", 0.15).as("both_est_ok"))
    },

    // ---- Misra–Gries mergeable heavy-hitter partials ----
    // The batch twin of `streaming/HeavyHittersStream` (completes the
    // third sketch's batch/stream pair alongside CountMin and Bloom):
    // every input partition folds its tokens into an O(k)-memory MG
    // summary ([[mgPartition]] — the stream's chunked batched-decrement
    // fold), the ≤ P·k partial rows merge by counter-ADD (Agarwal et
    // al., "Mergeable Summaries", PODS'12: summing lower bounds keeps
    // the undercount-only guarantee), and ONE bounded exact-count pass
    // over the merged candidate set promotes the provable heavy
    // hitters. Guarantee shipped as data: every token with true count
    // > n/(k+1) survives every partitioning (per partition p the total
    // decrement d_p ≤ n_p/(k+1); Σc_p > Σn_p/(k+1) ≥ Σd_p forces a
    // positive counter somewhere), so the emitted set — candidates
    // re-counted EXACTLY and thresholded with the integer comparison
    // cnt·(k+1) > n — is partition-invariant and oracle-pinnable,
    // while the partial summaries themselves stay O(P·k).
    // `MgBatchSpec` pins the superset guarantee and the undercount
    // bound under adversarial repartitionings. Scale: the only
    // corpus-sized motions are the mapPartitions fold (no shuffle) and
    // the exact-count pass for ≤ P·k candidates (broadcast semi-join →
    // one partial+final agg); no full token-frequency table ever
    // materializes — the memory story a 100-TB vocabulary needs.
    sql(
      "q_mg_heavy_hitters",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS token
        |           FROM documents),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
        |      FROM w GROUP BY token),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM w)
        |SELECT c.token, c.n_occurrences, t.n_tokens,
        |       CAST(256 AS BIGINT) AS k, CAST(1 AS BIGINT) AS guaranteed
        |FROM c, t WHERE c.n_occurrences * 257 > t.n_tokens
        |ORDER BY token""".stripMargin) { (s, dir) =>
      import s.implicits._
      val k = 256
      val words = t(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("token"))
      val partials = words.as[String]
        .mapPartitions(it => mgPartition(it, k).iterator)
        .toDF("token", "mg_lower")
      // merged candidate set: ≤ partitions·k rows, broadcast-sized by
      // construction at any corpus scale (P grows, k stays fixed)
      val cands = partials.groupBy("token")
        .agg(sum("mg_lower").as("mg_lower"))
        .select(col("token"))
      val total = words.agg(count(lit(1)).as("n_tokens"))
      words.join(broadcast(cands), "token")
        .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
        .crossJoin(broadcast(total))
        .where(col("n_occurrences") * (k + 1) > col("n_tokens"))
        .select(col("token"), col("n_occurrences"), col("n_tokens"),
          lit(k.toLong).as("k"), lit(1L).as("guaranteed"))
        .orderBy("token")
    },

    // ---- portable HDR-histogram quantile sketch ----
    // The 4th cross-engine sketch family (after portable HLL, MG, and
    // KMV): mergeable QUANTILES. Log-bucketed relative-error histograms
    // are the published shape (DDSketch — Masson, Lee & Canon, VLDB'19;
    // HdrHistogram — Tene), but DDSketch's ceil(log_γ x) bucketing
    // rides libm's ln(), whose last-ulp can flip a boundary value's
    // bucket BETWEEN engines — the exact failure class the portable
    // HLL avoided by trading log2() for the bin()-length identity. So
    // this is the base-2/HdrHistogram variant, ALL-INTEGER by
    // construction: value = integer cents, bucket = (bitlen(v), next
    // s=6 bits), i.e. idx = bl·64 + (v >> (bl−7)) − 64, giving
    // guaranteed relative error ≤ 2⁻⁶ = 1.5625 % with ≤ 64·57 counters
    // over the whole BIGINT range (values < 2⁷ get exact singleton
    // buckets). Three checks ride as data: (1) the merge theorem —
    // per-shard histograms summed per bucket equal the pooled
    // histogram, the property that makes this the cross-cluster
    // quantile-reconciliation primitive (each shard ships O(buckets)
    // counters, never values); (2) sketch-BRACKETED exact rank
    // selection — the chosen bucket [lb, ub] provably contains the
    // rank-r order statistic, so the exact value is recovered by
    // ranking ONLY the rows of that one bucket (the ExactQuantiles
    // sketch-guided-selection shape, with a deterministic bracket
    // instead of GK): in_bucket = 1 is the guarantee, hash-checked;
    // (3) every output column is BIGINT — rendering-proof by the r10
    // de-render construction. 100-TB story: the histogram build is one
    // partial+final hash agg (map-side combine into ≤ a few hundred
    // live counters — shuffle volume O(buckets), not O(rows)); the
    // exact audit's per-bucket rank window is bounded by one bucket's
    // row count (≤ 1.6 % of a uniform corpus slice); the bucket-frame
    // cumsum window is a few-hundred-row frame. Three 2-column pruned
    // corpus scans total (pooled hist, shard hists kept INDEPENDENT so
    // the merge check is a real cross-aggregation equality, exact
    // audit); at production scale the pooled side would derive from
    // the merged shards and the audit would be sampled.
    sql(
      "q_hdr_quantiles",
      """WITH v AS (SELECT l_returnflag AS shard,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        |  FROM lineitem),
        |e AS (SELECT shard, v, length(bin(v)) AS bl FROM v),
        |x AS (SELECT shard, v,
        |    CASE WHEN bl <= 7 THEN v
        |         ELSE bl * 64 + (v >> (bl - 7)) - 64 END AS idx,
        |    CASE WHEN bl <= 7 THEN v
        |         ELSE (v >> (bl - 7)) << (bl - 7) END AS lb,
        |    CASE WHEN bl <= 7 THEN v
        |         ELSE (((v >> (bl - 7)) + 1) << (bl - 7)) - 1 END AS ub
        |  FROM e),
        |hist AS (SELECT idx, lb, ub, CAST(count(*) AS BIGINT) AS c
        |         FROM x GROUP BY 1, 2, 3),
        |sh AS (SELECT shard, idx, CAST(count(*) AS BIGINT) AS c
        |       FROM x GROUP BY 1, 2),
        |mg AS (SELECT idx, CAST(sum(c) AS BIGINT) AS c FROM sh GROUP BY 1),
        |mc AS (SELECT CAST(count(*) AS BIGINT) AS buckets_used,
        |         CAST(sum(CASE WHEN h.c = mg.c THEN 1 ELSE 0 END) AS BIGINT)
        |           AS merge_equal_buckets
        |       FROM hist h JOIN mg ON mg.idx = h.idx),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
        |ch AS (SELECT idx, lb, ub, c,
        |         CAST(sum(c) OVER (ORDER BY idx) AS BIGINT) AS cum FROM hist),
        |pr AS (SELECT CAST(p AS BIGINT) AS p, (p * n.n + 99) // 100 AS r
        |       FROM (SELECT unnest([50, 90, 95, 99]) AS p), n),
        |tgt AS (SELECT pr.p, pr.r, min(ch.idx) AS bucket_idx
        |        FROM pr JOIN ch ON ch.cum >= pr.r GROUP BY 1, 2),
        |tb AS (SELECT t.p, t.r, t.bucket_idx, h.lb, h.ub,
        |         h.cum - h.c AS nbefore
        |       FROM tgt t JOIN ch h ON h.idx = t.bucket_idx),
        |inb AS (SELECT tb.p, x.v, CAST(count(*) AS BIGINT) AS cv
        |        FROM tb JOIN x ON x.idx = tb.bucket_idx GROUP BY 1, 2),
        |cin AS (SELECT p, v,
        |          CAST(sum(cv) OVER (PARTITION BY p ORDER BY v) AS BIGINT)
        |            AS cumv
        |        FROM inb),
        |ex AS (SELECT c.p, min(c.v) AS exact_cents
        |       FROM cin c JOIN tb ON tb.p = c.p
        |       WHERE tb.nbefore + c.cumv >= tb.r GROUP BY 1)
        |SELECT tb.p AS p, n.n AS n, tb.r AS rank_r, tb.bucket_idx,
        |       tb.lb AS bucket_lb, tb.ub AS bucket_ub, ex.exact_cents,
        |       CAST(CASE WHEN ex.exact_cents BETWEEN tb.lb AND tb.ub
        |            THEN 1 ELSE 0 END AS BIGINT) AS in_bucket,
        |       mc.buckets_used, mc.merge_equal_buckets
        |FROM tb JOIN ex ON ex.p = tb.p CROSS JOIN n CROSS JOIN mc
        |ORDER BY p""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val cents = (col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
      def shr(c: Column, bits: Column) =
        call_function("shiftright", c, bits.cast("int"))
      def shl(c: Column, bits: Column) =
        call_function("shiftleft", c, bits.cast("int"))
      // r13 note (measured, kept OUT): caching the bucketed frame once
      // (round-robin repartition + serialized localCheckpoint) for the
      // three consumers measured 2.8 s → 3.7-4.7 s in matched subset
      // A/B at sf0.1 — the keyless repartition pays a serial
      // sort-before-repartition of 600k rows in the one-task scan
      // (SPARK-23207) and three serialized-cache reads cost more than
      // three cheap columnar parquet decodes. The three passes stand.
      val x = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("shard"), cents.as("v"))
        .withColumn("bl", length(bin(col("v"))))
        .select(col("shard"), col("v"),
          when(col("bl") <= 7, col("v"))
            .otherwise(col("bl").cast("long") * 64
              + shr(col("v"), col("bl") - 7) - 64).as("idx"),
          when(col("bl") <= 7, col("v"))
            .otherwise(shl(shr(col("v"), col("bl") - 7), col("bl") - 7))
            .as("lb"),
          when(col("bl") <= 7, col("v"))
            .otherwise(shl(shr(col("v"), col("bl") - 7) + 1, col("bl") - 7) - 1)
            .as("ub"))
      val hist = x.groupBy("idx", "lb", "ub").agg(count(lit(1)).as("c"))
        .localCheckpoint() // bucket frame: a few hundred rows
      val sh = x.groupBy("shard", "idx").agg(count(lit(1)).as("c"))
      val mg = sh.groupBy("idx").agg(sum("c").cast("long").as("mc"))
      val mc = hist.join(mg, "idx")
        .agg(count(lit(1)).as("buckets_used"),
          sum(when(col("c") === col("mc"), 1L).otherwise(0L))
            .as("merge_equal_buckets"))
      val n = hist.agg(sum("c").cast("long").as("n"))
      // bounded global window: the bucket frame, never the corpus
      val ch = hist.withColumn("cum",
        sum("c").over(Window.orderBy("idx")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val pr = s.range(1)
        .select(explode(array(lit(50), lit(90), lit(95), lit(99))).as("p"))
        .crossJoin(broadcast(n))
        .selectExpr("CAST(p AS BIGINT) AS p", "(p * n + 99) div 100 AS r")
      val tgt = broadcast(pr)
        .join(ch, col("cum") >= col("r"))
        .groupBy("p", "r").agg(min("idx").as("bucket_idx"))
      val tb = tgt.join(ch, col("idx") === col("bucket_idx"))
        .select(col("p"), col("r"), col("bucket_idx"), col("lb"), col("ub"),
          (col("cum") - col("c")).as("nbefore"))
        .localCheckpoint() // 4 rows, read by two passes below
      val inb = x.join(broadcast(tb.select("p", "bucket_idx", "nbefore", "r")),
          col("idx") === col("bucket_idx"))
        .groupBy("p", "v").agg(count(lit(1)).as("cv"))
      val cin = inb.withColumn("cumv",
        sum("cv").over(Window.partitionBy("p").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val ex = cin.join(broadcast(tb.select("p", "nbefore", "r")), Seq("p"))
        .where(col("nbefore") + col("cumv") >= col("r"))
        .groupBy("p").agg(min("v").as("exact_cents"))
      tb.join(ex, Seq("p"))
        .crossJoin(broadcast(n)).crossJoin(broadcast(mc))
        .select(col("p"), col("n"), col("r").as("rank_r"), col("bucket_idx"),
          col("lb").as("bucket_lb"), col("ub").as("bucket_ub"),
          col("exact_cents"),
          when(col("exact_cents").between(col("lb"), col("ub")), 1L)
            .otherwise(0L).as("in_bucket"),
          col("buckets_used").cast("long").as("buckets_used"),
          col("merge_equal_buckets"))
        .orderBy("p")
    },

    // ---- portable mergeable ε-rank summary (KLL family) ----
    // The 5th cross-engine sketch family: mergeable quantiles with a
    // RANK-domain guarantee — the complement of q_hdr_quantiles, whose
    // bucketing bounds VALUE-relative error (a p50 answer is within
    // 1.56 % of the true value, but its rank can be anywhere inside a
    // fat bucket); here the answer's RANK is within ε·n of target,
    // whatever the value distribution does. The published line is
    // GK (Greenwald–Khanna '01) → Mergeable Summaries (Agarwal,
    // Cormode, Huang, Phillips, Wei, Yi — PODS'12) → KLL (Karnin,
    // Lang, Liberty — FOCS'16). KLL itself compacts with random coin
    // flips over ARRIVAL order — two engines cannot reproduce it
    // bitwise, the portable-HLL lesson — so this is the family's
    // deterministic, multiset-invariant member: per shard, keep each
    // value where the exact cumulative count crosses a multiple of the
    // stride s_i = ⌈n_i/k⌉ (k = 64 ⇒ ε = 1/k), plus the shard max.
    // Each kept value carries its EXACT local rank, so merging shard
    // summaries is pure addition: est_rank(v) = Σ_i (largest kept
    // local cum ≤ v), and the per-shard deficit is < s_i by the
    // crossing rule — total rank error < Σ_i s_i ≈ ε·n, the PODS'12
    // additive-merge theorem, which rides in the output as data
    // (max_rank_err over every kept value vs the exact global rank,
    // merge_ok = 1). Quantile answers a_p = min kept v with
    // est_rank ≥ r_p satisfy #(≤ a_p) ≥ r_p and #(< a_p) < r_p + ε·n
    // (rank_ok = 1, hash-checked per p). All-BIGINT output —
    // rendering-proof by the r10 de-render construction.
    // 100-TB story: ONE corpus pass (partial+final hash agg to the
    // per-shard value histogram — shuffle O(distinct values), never
    // O(rows)); cum/crossing ride per-shard windows on that bounded
    // frame; summaries are ≤ k+1 rows/shard, so the merge estimation
    // is a ≤200×200 broadcast range join at ANY corpus scale — each
    // production shard ships k counters, never values. The exact-rank
    // audit reuses the SAME value-histogram frame (no second corpus
    // scan); at production scale it would be sampled.
    sql(
      "q_rank_sketch",
      """WITH v AS (SELECT l_returnflag AS shard,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        |  FROM lineitem),
        |vc AS (SELECT shard, v, CAST(count(*) AS BIGINT) AS c
        |       FROM v GROUP BY 1, 2),
        |sn AS (SELECT shard, CAST(sum(c) AS BIGINT) AS n_i,
        |         (CAST(sum(c) AS BIGINT) + 63) // 64 AS s
        |       FROM vc GROUP BY 1),
        |cu AS (SELECT vc.shard, vc.v, vc.c, sn.s, sn.n_i,
        |         CAST(sum(vc.c) OVER (PARTITION BY vc.shard ORDER BY vc.v)
        |           AS BIGINT) AS cum
        |       FROM vc JOIN sn ON sn.shard = vc.shard),
        |sk AS (SELECT shard, v, cum FROM cu
        |       WHERE cum // s > (cum - c) // s OR cum = n_i),
        |eb AS (SELECT CAST(sum(s) AS BIGINT) AS eps_bound FROM sn),
        |kv AS (SELECT DISTINCT v FROM sk),
        |er AS (SELECT m.v, CAST(sum(m.mx) AS BIGINT) AS est_rank
        |       FROM (SELECT kv.v, sk.shard, max(sk.cum) AS mx
        |             FROM kv JOIN sk ON sk.v <= kv.v GROUP BY 1, 2) m
        |       GROUP BY 1),
        |g AS (SELECT v, CAST(sum(c) AS BIGINT) AS c FROM vc GROUP BY 1),
        |gc AS (SELECT v, c,
        |         CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cumg FROM g),
        |ex AS (SELECT er.v, er.est_rank, gc.cumg AS exact_le,
        |         gc.cumg - gc.c AS exact_lt
        |       FROM er JOIN gc ON gc.v = er.v),
        |mm AS (SELECT CAST(max(exact_le - est_rank) AS BIGINT)
        |         AS max_rank_err FROM ex),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g),
        |ssz AS (SELECT CAST(count(*) AS BIGINT) AS summary_rows FROM sk),
        |pr AS (SELECT CAST(p AS BIGINT) AS p, (p * nn.n + 99) // 100 AS r
        |       FROM (SELECT unnest([50, 90, 95, 99]) AS p), nn),
        |a AS (SELECT pr.p, pr.r, min(ex.v) AS answer_cents
        |      FROM pr JOIN ex ON ex.est_rank >= pr.r GROUP BY 1, 2),
        |f AS (SELECT a.p, a.r, a.answer_cents, ex.exact_le, ex.exact_lt
        |      FROM a JOIN ex ON ex.v = a.answer_cents)
        |SELECT f.p, nn.n, f.r AS rank_r, f.answer_cents, f.exact_le,
        |  f.exact_lt,
        |  CAST(CASE WHEN f.exact_le >= f.r
        |             AND f.exact_lt < f.r + eb.eps_bound
        |       THEN 1 ELSE 0 END AS BIGINT) AS rank_ok,
        |  ssz.summary_rows, eb.eps_bound, mm.max_rank_err,
        |  CAST(CASE WHEN mm.max_rank_err < eb.eps_bound
        |       THEN 1 ELSE 0 END AS BIGINT) AS merge_ok
        |FROM f, nn, eb, mm, ssz
        |ORDER BY p""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val k = 64
      val cents = (col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
      // ONE corpus pass: per-(shard, value) counts — the frame every
      // downstream step (summary build, merge audit, exact ranks)
      // reads; value-histogram-scale, checkpointed once
      val vc = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("shard"), cents.as("v"))
        .groupBy("shard", "v").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val sn = vc.groupBy("shard").agg(sum("c").cast("long").as("n_i"))
        .selectExpr("shard", "n_i", "(n_i + 63) div 64 AS s")
      val cu = vc.join(broadcast(sn), "shard")
        .withColumn("cum", sum("c").over(Window.partitionBy("shard")
          .orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      // stride-crossing rule + forced shard max: ≤ k+1 rows per shard
      val sk = cu.where(expr("cum div s > (cum - c) div s OR cum = n_i"))
        .select(col("shard"), col("v"), col("cum"))
        .localCheckpoint() // the sketch itself: ~200 rows at any scale
      val eb = sn.agg(sum("s").cast("long").as("eps_bound"))
      val kv = sk.select("v").distinct()
      // merged rank estimation: kept-value × summary range join —
      // both sides are k-bounded, broadcast by construction
      val er = kv.join(broadcast(sk.select(col("shard"),
            col("v").as("sv"), col("cum"))), col("sv") <= col("v"))
        .groupBy("v", "shard").agg(max("cum").as("mx"))
        .groupBy("v").agg(sum("mx").cast("long").as("est_rank"))
      val g = vc.groupBy("v").agg(sum("c").cast("long").as("c"))
      val gc = g.withColumn("cumg", sum("c").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      val ex = er.join(gc, "v")
        .select(col("v"), col("est_rank"), col("cumg").as("exact_le"),
          (col("cumg") - col("c")).as("exact_lt"))
        .localCheckpoint() // audit frame: read by mm, a, and f
      val mm = ex.agg(max(col("exact_le") - col("est_rank")).cast("long")
        .as("max_rank_err"))
      val nn = g.agg(sum("c").cast("long").as("n"))
      val ssz = sk.agg(count(lit(1)).as("summary_rows"))
      val pr = s.range(1)
        .select(explode(array(lit(50), lit(90), lit(95), lit(99))).as("p"))
        .crossJoin(broadcast(nn))
        .selectExpr("CAST(p AS BIGINT) AS p", "(p * n + 99) div 100 AS r")
      val a = broadcast(pr).join(ex, col("est_rank") >= col("r"))
        .groupBy("p", "r").agg(min("v").as("answer_cents"))
      val f = a.join(ex.select(col("v"), col("exact_le"), col("exact_lt")),
        col("v") === col("answer_cents"))
      f.crossJoin(broadcast(nn)).crossJoin(broadcast(eb))
        .crossJoin(broadcast(mm)).crossJoin(broadcast(ssz))
        .select(col("p"), col("n"), col("r").as("rank_r"),
          col("answer_cents"), col("exact_le"), col("exact_lt"),
          when(col("exact_le") >= col("r")
            && col("exact_lt") < col("r") + col("eps_bound"), 1L)
            .otherwise(0L).as("rank_ok"),
          col("summary_rows"), col("eps_bound"), col("max_rank_err"),
          when(col("max_rank_err") < col("eps_bound"), 1L)
            .otherwise(0L).as("merge_ok"))
        .orderBy("p")
    }
  )

  /** One partition's Misra–Gries fold: ≤ k surviving (token, lower)
    * counters, O(k + chunk) memory. Chunked batched decrement — the
    * exact per-chunk counts merge into the summary, then ONE collective
    * subtraction of the (k+1)-largest value prunes back to ≤ k (the
    * `HeavyHittersStream` per-batch shape, here over fixed-size
    * iterator chunks). Public for MgBatchSpec. */
  def mgPartition(it: Iterator[String], k: Int): Seq[(String, Long)] = {
    val acc = scala.collection.mutable.HashMap.empty[String, Long]
    val chunk = 4096
    while (it.hasNext) {
      val batch = scala.collection.mutable.HashMap.empty[String, Long]
      var i = 0
      while (it.hasNext && i < chunk) {
        val tok = it.next()
        batch.update(tok, batch.getOrElse(tok, 0L) + 1L)
        i += 1
      }
      batch.foreach { case (tok, c) =>
        acc.update(tok, acc.getOrElse(tok, 0L) + c)
      }
      if (acc.size > k) {
        val cut = acc.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        acc.filterInPlace((_, c) => c > cut)
        acc.mapValuesInPlace((_, c) => c - cut)
      }
    }
    acc.toSeq
  }
}
