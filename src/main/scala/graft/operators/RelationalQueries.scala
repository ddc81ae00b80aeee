package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projection / filter / join / set-op / sort surface (SURVEY.md §2.2).
  *
  * Scale notes (100 TB): every query projects only the columns it
  * needs (column pruning reaches the parquet scan) and filters before
  * joining (predicate pushdown). Dimension sides of joins (region,
  * nation, supplier, customer-at-small-SF) are explicitly
  * `broadcast()`-hinted where they are bounded-size in the data model;
  * fact-fact joins are left to Catalyst/AQE which picks sort-merge with
  * runtime skew handling.
  */
object RelationalQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- projection, cast, rename, IN / BETWEEN / LIKE / modulo filters ----
    sql(
      "q_proj_filter",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(floor(l_quantity) AS INT) AS qty_int,
        |       l_returnflag AS flag,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R')
        |  AND l_quantity BETWEEN 10 AND 30
        |  AND l_linenumber % 2 = 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_returnflag").isin("A", "R")
          && col("l_quantity").between(10, 30)
          && col("l_linenumber") % 2 === 1)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("int").as("qty_int"),
          col("l_returnflag").as("flag"),
          col("l_shipdate").cast("date").as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    sql(
      "q_like_rlike",
      """SELECT p_partkey, p_name, p_brand
        |FROM part
        |WHERE p_name LIKE '%widget%' OR regexp_matches(p_name, '^(red|blue) ')
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .where(col("p_name").like("%widget%") || col("p_name").rlike("^(red|blue) "))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    },

    // ---- inner equi join + aggregation (TPC-H Q3 shape; flagship) ----
    sql(
      "q_join_inner",
      """SELECT l.l_orderkey,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |       CAST(o.o_orderdate AS DATE) AS order_date
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
        |GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = t(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      // The filtered one-column customer side is the small side, but
      // it is SF-proportional (a 1/5 segment of an SF-scaled table) —
      // no hard broadcast hint: AQE broadcasts it while it fits and
      // degrades to a shuffle join past the limit at cluster scale.
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select("l_orderkey", "revenue", "order_date")
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(20)
    },

    // ---- left outer join (keep customers with zero orders) ----
    sql(
      "q_join_left",
      """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
        |       round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey
        |ORDER BY c.c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").select("c_custkey")
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0)), 2).as("total_spent"))
        .orderBy("c_custkey")
    },

    // ---- right outer join ----
    sql(
      "q_join_right",
      """SELECT n.n_nationkey, n.n_name, count(s.s_suppkey) AS n_suppliers
        |FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_nationkey, n.n_name
        |ORDER BY n.n_nationkey""".stripMargin) { (s, dir) =>
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val n = t(s, dir, "nation").select("n_nationkey", "n_name")
      sup.join(n, sup("s_nationkey") === n("n_nationkey"), "right")
        .groupBy("n_nationkey", "n_name")
        .agg(count(col("s_suppkey")).as("n_suppliers"))
        .orderBy("n_nationkey")
    },

    // ---- full outer join of two aggregates keyed by nation ----
    sql(
      "q_join_full",
      """WITH cust AS (SELECT c_nationkey AS nk, count(*) AS n_cust
        |              FROM customer GROUP BY c_nationkey),
        |     supp AS (SELECT s_nationkey AS nk, count(*) AS n_supp
        |              FROM supplier GROUP BY s_nationkey)
        |SELECT coalesce(cust.nk, supp.nk) AS nk,
        |       coalesce(n_cust, 0) AS n_cust,
        |       coalesce(n_supp, 0) AS n_supp
        |FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer").groupBy(col("c_nationkey").as("cnk"))
        .agg(count(lit(1)).as("n_cust"))
      val supp = t(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("n_supp"))
      cust.join(supp, cust("cnk") === supp("snk"), "full")
        .select(
          coalesce(col("cnk"), col("snk")).as("nk"),
          coalesce(col("n_cust"), lit(0)).as("n_cust"),
          coalesce(col("n_supp"), lit(0)).as("n_supp"))
        .orderBy("nk")
    },

    // ---- left-semi (EXISTS) ----
    sql(
      "q_join_semi",
      """SELECT o_orderkey, round(o_totalprice, 2) AS total
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val l = t(s, dir, "lineitem").where(col("l_quantity") > 45).select("l_orderkey")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
        .orderBy("o_orderkey")
    },

    // ---- left-anti (NOT EXISTS) ----
    sql(
      "q_join_anti",
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").select("c_custkey", "c_name")
      val o = t(s, dir, "orders").select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .orderBy("c_custkey")
    },

    // ---- cross join (bounded dims only — never cross-join facts) ----
    sql(
      "q_join_cross",
      """SELECT r.r_name, n.n_name
        |FROM region r CROSS JOIN nation n
        |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "region").select("r_name")
        .crossJoin(broadcast(t(s, dir, "nation").select("n_name")))
        .orderBy("r_name", "n_name")
    },

    // ---- theta / banded join (equi key + range residual) ----
    sql(
      "q_join_range",
      """SELECT p.p_partkey, count(*) AS n_lines,
        |       round(sum(l.l_extendedprice), 2) AS price_sum
        |FROM part p JOIN lineitem l
        |  ON l.l_partkey = p.p_partkey
        | AND l.l_quantity BETWEEN p.p_size AND p.p_size + 10
        |GROUP BY p.p_partkey
        |ORDER BY p.p_partkey""".stripMargin) { (s, dir) =>
      val p = t(s, dir, "part").select("p_partkey", "p_size")
      val l = t(s, dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
      // Equi component carries the shuffle; the band predicate is a
      // cheap post-join residual (never a nested-loop cross product).
      // part is SF-scaled, so no hard broadcast hint — AQE picks
      // broadcast at small SF, shuffle hash/SMJ on p_partkey at scale.
      l.join(p,
          l("l_partkey") === p("p_partkey")
            && l("l_quantity").between(p("p_size"), p("p_size") + 10))
        .groupBy("p_partkey")
        .agg(count(lit(1)).as("n_lines"), round(sum(col("l_extendedprice")), 2).as("price_sum"))
        .orderBy("p_partkey")
    },

    // ---- set ops ----
    sql(
      "q_union_all",
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier
        |) GROUP BY nk ORDER BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .unionByName(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("n"))
        .orderBy("nk")
    },

    sql(
      "q_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    sql(
      "q_except",
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    // ---- global sort + limit (top-k shipped as a single reduction) ----
    sql(
      "q_sort_limit",
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM lineitem
        |ORDER BY price DESC, l_orderkey, l_linenumber
        |LIMIT 25""".stripMargin) { (s, dir) =>
      // orderBy+limit compiles to TakeOrderedAndProject — per-partition
      // top-k then a single driver-side merge; no global sort at scale.
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy(desc("price"), col("l_orderkey"), col("l_linenumber"))
        .limit(25)
    },

    // ---- null handling: null-safe equality, coalesce, nullif ----
    sql(
      "q_null_safe",
      """WITH t AS (SELECT o_orderkey,
        |                  nullif(o_orderstatus, 'P') AS st,
        |                  CASE WHEN o_totalprice > 200000 THEN NULL
        |                       ELSE o_orderpriority END AS pri
        |           FROM orders)
        |SELECT coalesce(st, '?') AS status,
        |       count(*) AS n,
        |       count(pri) AS n_pri,
        |       CAST(sum(CASE WHEN st IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_eq
        |FROM t GROUP BY coalesce(st, '?') ORDER BY status""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "orders").select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("st"),
        when(col("o_totalprice") > 200000, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")).as("pri"))
      base.groupBy(coalesce(col("st"), lit("?")).as("status"))
        .agg(
          count(lit(1)).as("n"),
          count(col("pri")).as("n_pri"),
          sum(when(col("st") <=> lit(null.asInstanceOf[String]), 1).otherwise(0)).as("n_null_eq"))
        .orderBy("status")
    },

    // ---- MERGE / upsert: the incremental-snapshot primitive ----
    // A corpus refresh merges a re-crawl batch into the current
    // snapshot: matched keys take the update, unmatched updates
    // insert, untouched rows carry over. Realized as ONE full-outer
    // shuffle join on the merge key + coalesce — the relational core
    // of Delta/Iceberg MERGE INTO. At 100 TB the base side stays
    // partitioned on the key (no re-shuffle when bucketed), a small
    // delta broadcast-joins instead, and AQE handles hot-key skew;
    // the coalesce/action logic is unchanged.
    sql(
      "q_merge_upsert",
      """WITH base AS (SELECT doc_id, source, n_chars FROM documents),
        |upd AS (
        |  SELECT doc_id, upper(source) AS source, n_chars + 1 AS n_chars
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, source, n_chars
        |  FROM documents WHERE doc_id % 10 = 9)
        |SELECT coalesce(u.doc_id, b.doc_id) AS doc_id,
        |       coalesce(u.source, b.source) AS source,
        |       coalesce(u.n_chars, b.n_chars) AS n_chars,
        |       CASE WHEN b.doc_id IS NULL THEN 'insert'
        |            WHEN u.doc_id IS NULL THEN 'keep'
        |            ELSE 'update' END AS action
        |FROM base b FULL JOIN upd u ON b.doc_id = u.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val base = docs.select(
        col("doc_id").as("b_id"), col("source").as("b_src"),
        col("n_chars").as("b_nc"))
      val upd = docs.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("u_id"), upper(col("source")).as("u_src"),
          (col("n_chars") + 1).as("u_nc"))
        .unionByName(docs.where(col("doc_id") % 10 === 9)
          .select((col("doc_id") + 1000000).as("u_id"),
            col("source").as("u_src"), col("n_chars").as("u_nc")))
      base.join(upd, col("b_id") === col("u_id"), "full_outer")
        .select(
          coalesce(col("u_id"), col("b_id")).as("doc_id"),
          coalesce(col("u_src"), col("b_src")).as("source"),
          coalesce(col("u_nc"), col("b_nc")).as("n_chars"),
          when(col("b_id").isNull, lit("insert"))
            .when(col("u_id").isNull, lit("keep"))
            .otherwise(lit("update")).as("action"))
        .orderBy("doc_id")
    },

    // ---- bloom-filter pre-filtered join ----
    // THE shuffle-reduction pattern when the selective side is too big
    // to broadcast but still filters most of the fact: aggregate a
    // bloom filter over the build side's join keys (a few MB at any
    // row count), broadcast the 1-row filter, and drop non-matching
    // fact rows BEFORE the shuffle. False positives survive the
    // pre-filter but the real equi-join removes them, so the result is
    // value-IDENTICAL to the plain join — which is exactly what the
    // oracle checks (its SQL is the plain join; the bloom is invisible
    // to semantics). Spark's own InjectRuntimeFilter does this
    // opportunistically; this operator is the explicit form for when
    // the planner can't see the selectivity (e.g. the build side is a
    // separately-produced key list). Uses the same internal
    // BloomFilterAggregate/BloomFilterMightContain expressions the
    // runtime filter uses, composed via the Bridge — hashed through
    // xxhash64 like the planner's own filters.
    sql(
      "q_join_bloom",
      """SELECT l.l_orderkey, o.o_orderdate,
        |       CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      import org.apache.spark.sql.graftbridge.Bridge
      val sel = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      // ~1/5 of orders: plausibly past the broadcast threshold at real
      // scale, selective enough that the pre-filter pays for itself
      val bfAgg = Bridge.column(new BloomFilterAggregate(
        Bridge.expression(xxhash64(col("o_orderkey"))),
        Literal(1000000L), Literal(8388608L)).toAggregateExpression())
      // might_contain requires its filter to be a CONSTANT (or scalar
      // subquery) — collect the 1-row ~1 MB filter and embed it as a
      // literal, the broadcast-variable pattern (bounded by numBits,
      // never by build-side row count; the sanctioned bounded collect)
      val bfBytes = sel.agg(bfAgg.as("bf")).head.getAs[Array[Byte]](0)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val probed = li
        .where(Bridge.column(BloomFilterMightContain(
          Bridge.expression(lit(bfBytes)),
          Bridge.expression(xxhash64(col("l_orderkey"))))))
      probed.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(count(lit(1)).as("n_lines"),
          // round the exact DECIMAL sum, then cast (the q_tpch_q1
          // idiom): rounding a DOUBLE sum flips on half-cent-boundary
          // groups — this query's group set hits one at BOTH SFs
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")), 2).cast("double").as("revenue"))
        .orderBy("l_orderkey")
    },

    // ---- join-cardinality estimation (optimizer-stats audit) ----
    // Predict a join's output size BEFORE running it: |A ⋈ B| =
    // Σ_k cA(k)·cB(k) over the key histograms — two per-side
    // aggregations plus a #keys-sized join, orders of magnitude
    // cheaper than the join it sizes (the check run before committing
    // a cluster to a fact-fact join; q_skew_audit's companion). The
    // per-key products accumulate in DECIMAL (order-exact), the top-10
    // contributing keys are reported with their share, and the actual
    // join count is computed alongside — Σ cA·cB is EXACT, so
    // predicted = actual is a value-checked oracle column, not a
    // claim.
    sql(
      "q_join_cardinality_est",
      """WITH a AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS ca
        |           FROM events GROUP BY 1),
        |b AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS cb
        |      FROM orders GROUP BY 1),
        |p AS (SELECT a.k, a.ca, b.cb,
        |             CAST(a.ca AS DECIMAL(19,0)) * b.cb AS pairs
        |      FROM a JOIN b ON b.k = a.k),
        |tot AS (SELECT CAST(sum(pairs) AS DECIMAL(38,0)) AS predicted FROM p),
        |act AS (SELECT CAST(count(*) AS BIGINT) AS actual
        |        FROM events e JOIN orders o ON o.o_custkey = e.user_id)
        |SELECT k, ca, cb, CAST(pairs AS BIGINT) AS pairs,
        |  round(CAST(pairs AS DOUBLE)
        |        / CAST((SELECT predicted FROM tot) AS DOUBLE), 6) AS share,
        |  CAST((SELECT predicted FROM tot) AS BIGINT) AS predicted_total,
        |  (SELECT actual FROM act) AS actual_total,
        |  (SELECT predicted FROM tot) = (SELECT actual FROM act) AS exact_match
        |FROM p ORDER BY pairs DESC, k LIMIT 10""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "events")
        .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("ca"))
      val b = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("cb"))
      val p = a.join(b, Seq("k"))
        .withColumn("pairs", col("ca").cast("decimal(19,0)") * col("cb"))
        .localCheckpoint() // #keys rows: feeds totals + top-k
      val tot = p.agg(sum("pairs").cast("decimal(38,0)").as("predicted"))
      val act = t(s, dir, "events").select(col("user_id"))
        .join(t(s, dir, "orders").select(col("o_custkey")),
          col("o_custkey") === col("user_id"))
        .agg(count(lit(1)).as("actual"))
      p.crossJoin(broadcast(tot)).crossJoin(broadcast(act))
        .select(col("k"), col("ca"), col("cb"),
          col("pairs").cast("long").as("pairs"),
          round(col("pairs").cast("double")
            / col("predicted").cast("double"), 6).as("share"),
          col("predicted").cast("long").as("predicted_total"),
          col("actual").as("actual_total"),
          (col("predicted") === col("actual")).as("exact_match"))
        .orderBy(desc("pairs"), col("k"))
        .limit(10)
    },

    // ---- right-to-be-forgotten purge simulation ----
    // The GDPR/CCPA deletion ledger: given a deterministic purge set
    // (5% of users by hash — production passes the real request list),
    // the rows each table loses, including the CASCADE through the
    // order→lineitem FK chain (lineitem has no user column — its purge
    // rides a semi join on the purged orders). Anti/semi joins +
    // conditional counts only — the same plan a real purge's DELETE
    // predicate would drive, so the ledger doubles as the purge's
    // pre-flight row-count audit.
    sql(
      "q_user_purge",
      """WITH purge AS (SELECT DISTINCT user_id FROM events
        |  WHERE ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |        % 20 = 0),
        |ev AS (SELECT CAST(count(*) AS BIGINT) AS before,
        |         CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS purged
        |       FROM events e LEFT JOIN purge p ON p.user_id = e.user_id),
        |oo AS (SELECT CAST(count(*) AS BIGINT) AS before,
        |         CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS purged
        |       FROM orders o LEFT JOIN purge p ON p.user_id = o.o_custkey),
        |li AS (SELECT CAST(count(*) AS BIGINT) AS before,
        |         CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS purged
        |       FROM lineitem l
        |       JOIN orders o ON o.o_orderkey = l.l_orderkey
        |       LEFT JOIN purge p ON p.user_id = o.o_custkey),
        |r AS (SELECT 'events' AS tbl, before, purged FROM ev
        |      UNION ALL SELECT 'orders', before, purged FROM oo
        |      UNION ALL SELECT 'lineitem', before, purged FROM li)
        |SELECT tbl, before AS rows_before, purged AS rows_purged,
        |       before - purged AS rows_after
        |FROM r ORDER BY tbl""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      val purge = t(s, dir, "events")
        .select(col("user_id")).distinct()
        .where(h32(col("user_id").cast("string")) % 20 === 0)
        .localCheckpoint() // the request list: probed by all 3 ledgers
      def ledger(df: DataFrame, key: org.apache.spark.sql.Column) =
        df.join(broadcast(purge.select(col("user_id").as("pu"))),
            key === col("pu"), "left")
          .agg(count(lit(1)).as("before"),
            sum(when(col("pu").isNotNull, 1L).otherwise(0L)).as("purged"))
      val ev = ledger(t(s, dir, "events"), col("user_id"))
      val oo = ledger(t(s, dir, "orders"), col("o_custkey"))
      val li = ledger(
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
            col("o_orderkey") === col("l_orderkey")),
        col("o_custkey"))
      ev.select(lit("events").as("tbl"), col("before"), col("purged"))
        .unionByName(oo.select(lit("orders").as("tbl"), col("before"),
          col("purged")))
        .unionByName(li.select(lit("lineitem").as("tbl"), col("before"),
          col("purged")))
        .select(col("tbl"), col("before").as("rows_before"),
          col("purged").as("rows_purged"),
          (col("before") - col("purged")).as("rows_after"))
        .orderBy("tbl")
    }
  )
}
