package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-shaped flagship queries (VERDICT r5 ask #6): the operator
  * surface is proven piecewise by the per-operator oracle queries;
  * these compose it — multi-join + aggregation + order/limit in one
  * plan, the workload shape reference users actually bring — adapted
  * to the columns the driver testdata carries (no o_shippriority /
  * returns table, so Q3 carries o_orderpriority and Q18's threshold is
  * sized to this data's per-order quantity distribution).
  *
  * Scale shapes under audit in PlanAuditSpec: Q1 is a single
  * partial+final hash agg over a pushed-down scan (shuffle = O(4
  * groups)); Q3 broadcasts the filtered customer dim into the
  * orders⋈lineitem shuffle join and ends in TakeOrderedAndProject
  * (top-10 never sorts the full result); Q18's HAVING subquery is a
  * map-side-combined agg whose survivors semi-join lineitem BEFORE
  * the wide customer/orders joins.
  */
object TpchQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- Q1: pricing summary report — the canonical wide-agg scan.
    // All eight aggregates ride one partial+final hash aggregate; the
    // shipdate filter is pushed to the parquet scan. Money sums and
    // the non-integral averages accumulate in DECIMAL(18,6): double
    // summation order hits round()'s last-cent boundary at 1e11
    // magnitudes (caught by the 10× corpus sweep on q_agg_pricing),
    // and decimal accumulation is order-independent at any scale.
    // Averages divide the exact decimal sum by the count in double —
    // identical inputs give identical division results in both
    // engines, unlike avg(double)'s order-dependent running sum. ----
    sql(
      "q_tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
        |         AS sum_base_price,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |         AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |         AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |         / count(*), 4) AS avg_price,
        |       round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
        |         / count(*), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      def dsum(c: Column) = sum(c.cast("decimal(18,6)"))
      // r13 (guide §2.5, Tables.wide): shuffle-width decimal sums;
      // the shipdate filter still pushes to the scan below the exchange
      graft.Tables.wide(t(s, dir, "lineitem")
          .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax")),
          col("l_extendedprice"), col("l_quantity"), col("l_discount"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(dsum(col("l_extendedprice")), 2).cast("double").as("sum_base_price"),
          round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .cast("double").as("sum_disc_price"),
          round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 2).cast("double").as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(dsum(col("l_extendedprice")).cast("double") / count(lit(1)), 4)
            .as("avg_price"),
          round(dsum(col("l_discount")).cast("double") / count(lit(1)), 4)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- Q3: shipping-priority top-10 — selective dim broadcast into
    // a fact⋈fact shuffle join, then agg + TakeOrderedAndProject.
    // o_orderkey added to the sort for a deterministic oracle under
    // revenue ties. ----
    sql(
      "q_tpch_q3",
      """SELECT l_orderkey,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |         AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |       o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = t(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")), 2).cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // ---- Q5: local-supplier volume — the 6-table join chain.
    // region→nation collapses to a ≤25-row broadcast that prunes BOTH
    // fact-side dimensions (supplier and customer) before the big
    // lineitem⋈orders shuffle; the c_nationkey = s_nationkey residual
    // rides the supplier equi-join. Revenue per ≤25 nation groups is
    // corpus-proportional → decimal accumulation (see q_agg_pricing). ----
    sql(
      "q_tpch_q5",
      """SELECT n_name,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |         AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val rn = t(s, dir, "nation")
        .join(t(s, dir, "region").where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(rn), col("s_nationkey") === col("n_nationkey"))
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")), 2).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- Q6: forecasting revenue change — the pure scan-and-reduce
    // query: three pushed-down range predicates, ONE global sum, no
    // shuffle beyond the single-row final combine. A whole-corpus
    // single-group money sum is the maximal case for the decimal
    // accumulation idiom (1e12+ magnitude at scale). ----
    sql(
      "q_tpch_q6",
      """SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
        |         AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(
          round(sum((col("l_extendedprice") * col("l_discount"))
            .cast("decimal(18,6)")), 2).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // ---- Q14: promotion effect — conditional aggregation over the
    // lineitem⋈part join. part is SF-scaled so no hard broadcast hint
    // (AQE broadcasts while it fits, q_join_range-style); both ratio
    // terms are decimal-exact sums, divided in double AFTER the agg so
    // the quotient is computed once from order-independent inputs. ----
    sql(
      "q_tpch_q14",
      """SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |         THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |         AS DECIMAL(18,6))) AS DOUBLE)
        |       / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |         AS DECIMAL(18,6))) AS DOUBLE), 4) AS promo_revenue_pct,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin) { (s, dir) =>
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(t(s, dir, "part").select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100.0)
            * sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0))
                .cast("decimal(18,6)")).cast("double")
            / sum(disc.cast("decimal(18,6)")).cast("double"), 4)
            .as("promo_revenue_pct"),
          count(lit(1)).as("n_lines"))
    },

    // ---- Q10: returned-item reporting — per-customer revenue lost to
    // returns, top 20. Per-customer groups are key-bounded, so the
    // money sum stays double; the returnflag + date filters push to
    // the scans, nation broadcasts, and the top-20 is
    // TakeOrderedAndProject (never a full sort). ----
    sql(
      "q_tpch_q10",
      """SELECT c_custkey, c_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       round(c_acctbal, 2) AS acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val c = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val n = t(s, dir, "nation").select("n_nationkey", "n_name")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          round(col("c_acctbal"), 2).as("acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ---- Q18: large-volume customers — HAVING-subquery semi-join.
    // The per-order quantity agg is map-side combined; its few
    // survivors broadcast-semi-join lineitem BEFORE the customer and
    // orders joins, so the wide joins only see qualifying orders.
    // Threshold 150 ≈ the top few % of orders on this data
    // (max per-order sum ≈ 380–460 at test SFs). ----
    sql(
      "q_tpch_q18",
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("sq"))
        .where(col("sq") > 150)
        .select(col("l_orderkey").as("big_orderkey"))
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        .join(broadcast(big), col("l_orderkey") === col("big_orderkey"), "left_semi")
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = t(s, dir, "customer").select("c_custkey", "c_name")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    },

    // ---- Q4: order-priority checking — the EXISTS shape. The
    // correlated subquery is a LEFT SEMI join on the order key with
    // the late-shipment range predicate riding the join condition; no
    // order ever duplicates no matter how many late lineitems it has.
    // (Testdata has no l_commitdate/l_receiptdate, so "late" = shipped
    // more than 90 days after the order date.) ----
    sql(
      "q_tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l,
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // ---- Q13: customer order-count distribution — the outer-join
    // histogram. The priority filter lives ON the join (not a WHERE,
    // which would turn the outer join inner and drop zero-order
    // customers); the per-customer count is key-bounded, and the
    // second agg's keyspace is tiny (distinct counts), so the heavy
    // shuffle is only the first. ----
    sql(
      "q_tpch_q13",
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) cnts
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").select("c_custkey")
      val o = t(s, dir, "orders")
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ---- Q15: top supplier — the scalar-subquery-equality shape.
    // Per-supplier revenue is rounded to cents INSIDE the CTE so the
    // max-equality compares identical values in both engines
    // (per-supplier sums are key-bounded, so double + round is exact
    // enough; see q_tpch_q10). The max rides a 1-row broadcast and the
    // ≤handful of survivors broadcast into the supplier join — the
    // full revenue table is never shuffled twice. ----
    sql(
      "q_tpch_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
      val top = rev.crossJoin(broadcast(mx))
        .where(col("total_revenue") === col("max_rev"))
        .select("l_suppkey", "total_revenue")
      t(s, dir, "supplier").select("s_suppkey", "s_name")
        .join(broadcast(top), col("s_suppkey") === col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // ---- Q17: small-quantity-order revenue — the correlated-average
    // shape, decorrelated: the per-part average joins back to the
    // brand-filtered lineitems on the part key (both sides
    // brand-bounded, equi-join — never a per-row subquery). The
    // 0.5·avg threshold is exact across engines because quantities are
    // integral, so double sums/averages are bit-identical regardless
    // of order; the final whole-brand money sum is corpus-proportional
    // → decimal accumulation. ----
    sql(
      "q_tpch_q17",
      """SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
        |         AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#13'
        |  AND l_quantity < (
        |    SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, dir) =>
      val pb = t(s, dir, "part").where(col("p_brand") === "Brand#13")
        .select("p_partkey")
      val l = t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(pb, col("l_partkey") === col("p_partkey"))
      val halfAvg = l.groupBy(col("l_partkey").as("a_partkey"))
        .agg((lit(0.5) * avg(col("l_quantity"))).as("half_avg"))
      l.join(halfAvg, col("l_partkey") === col("a_partkey"))
        .where(col("l_quantity") < col("half_avg"))
        .agg(
          round(sum(col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double") / 7.0, 2).cast("double").as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },

    // ---- Q19: discounted revenue — the disjunctive-predicate join.
    // The oracle keeps the pure OR; the Spark side ALSO states the
    // OR's implied conjuncts (brand ∈ {...}, quantity ∈ [1,35])
    // explicitly so they push to the parquet scans as range/IN
    // filters — semantically redundant, but the scan then skips
    // everything outside the union of the three branches before the
    // join. ----
    sql(
      "q_tpch_q19",
      """SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |         AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
        |         AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 25
        |         AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 40
        |         AND l_quantity BETWEEN 20 AND 35)""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem")
        .where(col("l_quantity").between(1, 35))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val p = t(s, dir, "part")
        .where(col("p_brand").isin("Brand#13", "Brand#20", "Brand#7"))
        .select("p_partkey", "p_brand", "p_size")
      val branch = (b: String, s0: Int, s1: Int, q0: Int, q1: Int) =>
        col("p_brand") === b && col("p_size").between(s0, s1) &&
          col("l_quantity").between(q0, q1)
      l.join(p, col("l_partkey") === col("p_partkey"))
        .where(branch("Brand#13", 1, 10, 1, 15)
          || branch("Brand#20", 10, 25, 10, 25)
          || branch("Brand#7", 20, 40, 20, 35))
        .agg(
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")), 2).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // ---- Q22: global-sales opportunity — the anti-join + scalar-
    // broadcast shape. The positive-balance average rides a 1-row
    // broadcast; "no recent orders" is a LEFT ANTI against the
    // date-filtered order keys (testdata customers all have SOME
    // order, so the reference's "no orders at all" would be empty —
    // the recency window keeps the anti-join load-bearing). Five
    // segment groups × corpus-proportional balance sums → decimal
    // accumulation. ----
    sql(
      "q_tpch_q22",
      """SELECT c_mktsegment, count(*) AS numcust,
        |       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
        |         AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val avgBal = c.where(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      val recent = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
      c.crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal").cast("decimal(18,6)")), 2).cast("double")
            .as("totacctbal"))
        .orderBy("c_mktsegment")
    },

    // ---- Q7: volume shipping between two nations — the dual-dim
    // star. BOTH nation dims pre-filter to the two names and broadcast
    // into supplier/customer before any fact-table join, so the big
    // lineitem⋈orders shuffle carries only rows whose BOTH endpoints
    // survive; the (N1,N1)/(N2,N2) combos fall to the pair predicate
    // after the joins. 4 groups × corpus-proportional money → decimal
    // accumulation. ----
    sql(
      "q_tpch_q7",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |         AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |  AND c_custkey = o_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1997-12-31 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val pair = t(s, dir, "nation")
        .where(col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(pair), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(pair), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val l = t(s, dir, "lineitem")
        .where(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
        .select("l_orderkey", "l_suppkey", "l_shipdate",
          "l_extendedprice", "l_discount")
      l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")), 2).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // ---- Q8: national market share — the conditional-share agg over
    // an 8-table star. Region filters the CUSTOMER's nation (market),
    // the SUPPLIER's nation names the share subject; both ride
    // broadcast dim chains. Numerator and denominator both accumulate
    // in decimal so the ratio divides two exact, order-independent
    // sums — round(double/double, 4) is then engine-identical. ----
    sql(
      "q_tpch_q8",
      """SELECT o_year,
        |       round(CAST(sum(CAST(CASE WHEN nation = 'NATION_3' THEN volume
        |                                ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
        |           / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 4)
        |         AS mkt_share,
        |       count(*) AS n_lines
        |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |             l_extendedprice * (1 - l_discount) AS volume,
        |             n2.n_name AS nation
        |      FROM part, lineitem, supplier, orders, customer,
        |           nation n1, nation n2, region
        |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |        AND c_nationkey = n1.n_nationkey
        |        AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |        AND s_nationkey = n2.n_nationkey
        |        AND p_type = 'PROMO') t
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin) { (s, dir) =>
      val asiaNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").where(col("r_name") === "ASIA")
          .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("mkt_nationkey"))
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(asiaNations), col("c_nationkey") === col("mkt_nationkey"))
        .select("c_custkey")
      val supNation = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val promo = t(s, dir, "part").where(col("p_type") === "PROMO")
        .select("p_partkey")
      val vol = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          round(
            sum(when(col("nation") === "NATION_3", vol).otherwise(lit(0))
              .cast("decimal(18,6)")).cast("double")
              / sum(vol.cast("decimal(18,6)")).cast("double"), 4)
            .as("mkt_share"),
          count(lit(1)).as("n_lines"))
        .orderBy("o_year")
    },

    // ---- Q9: product-type profit by nation and year. No supplycost
    // column in the testdata, so cost = p_retailprice · quantity (the
    // same per-row double arithmetic in both engines). The name LIKE
    // prunes part BEFORE it broadcasts into lineitem; 25 nations × 7
    // years of corpus-proportional sums → decimal accumulation. ----
    sql(
      "q_tpch_q9",
      """SELECT nation, o_year,
        |       CAST(round(sum(CAST(amount AS DECIMAL(18,6))), 2) AS DOUBLE)
        |         AS sum_profit,
        |       count(*) AS n_lines
        |FROM (SELECT n_name AS nation,
        |             CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |             l_extendedprice * (1 - l_discount)
        |               - p_retailprice * l_quantity AS amount
        |      FROM part, supplier, lineitem, orders, nation
        |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |        AND p_name LIKE '%gear%') t
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
      val gearParts = t(s, dir, "part")
        .where(col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
      val supNation = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
        .join(broadcast(gearParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("amount",
          col("l_extendedprice") * (lit(1) - col("l_discount"))
            - col("p_retailprice") * col("l_quantity"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(
          round(sum(col("amount").cast("decimal(18,6)")), 2).cast("double")
            .as("sum_profit"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // ---- Q16: supplier counts per part attribute — the
    // distinct-count histogram. The testdata has no partsupp relation,
    // so lineitem IS the observed supplier×part catalog (reference
    // semantics: how many distinct suppliers can serve this part
    // class). The attribute filters prune part before the broadcast;
    // countDistinct shuffles (group, suppkey) pairs — bounded by the
    // true catalog size, never the lineitem row count. ----
    sql(
      "q_tpch_q16",
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, dir) =>
      val p = t(s, dir, "part")
        .where(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // ---- Q20: dominant suppliers of red parts — the nested-agg
    // semi-join chain. partsupp's availqty threshold becomes "shipped
    // more than half of this part's 1997 red-part volume": per
    // (part, supplier) sums roll up to per-part totals, join back on
    // the part key (both sides key-bounded), and the qualifying
    // supplier keys semi-join supplier. Quantities are integral, so
    // double sums are exact and the 0.5· threshold is
    // engine-identical. ----
    sql(
      "q_tpch_q20",
      """WITH sp AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_partkey, l_suppkey),
        |tot AS (
        |  SELECT l_partkey AS t_partkey, sum(qty) AS total_qty
        |  FROM sp GROUP BY l_partkey)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM sp JOIN tot ON l_partkey = t_partkey
        |  WHERE qty > 0.5 * total_qty)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val redParts = t(s, dir, "part").where(col("p_name").like("red%"))
        .select("p_partkey")
      val sp = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity")).as("qty"))
      val tot = sp.groupBy(col("l_partkey").as("t_partkey"))
        .agg(sum(col("qty")).as("total_qty"))
      val dominant = sp.join(tot, col("l_partkey") === col("t_partkey"))
        .where(col("qty") > lit(0.5) * col("total_qty"))
        .select("l_suppkey")
      t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    },

    // ---- Q2: min-cost supplier — the per-group min-equality
    // join-back (Q15's shape, but keyed per part instead of global).
    // No partsupp, so an "offer" is the min OBSERVED unit price per
    // (part, supplier) among region suppliers; per-line rounding
    // happens BEFORE either min so both engines compare identical
    // doubles. The best-price table is key-bounded (one row per
    // part) and joins back on (partkey, price equality); the part
    // attribute filter stays OUT of the best-price computation,
    // mirroring Q2's unfiltered inner subquery. ----
    sql(
      "q_tpch_q2",
      """WITH eu_offers AS (
        |  SELECT l_partkey, l_suppkey,
        |         min(round(l_extendedprice / l_quantity, 4)) AS min_price
        |  FROM lineitem, supplier, nation, region
        |  WHERE s_suppkey = l_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  GROUP BY l_partkey, l_suppkey),
        |best AS (
        |  SELECT l_partkey AS b_partkey, min(min_price) AS best_price
        |  FROM eu_offers GROUP BY l_partkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, min_price
        |FROM part, eu_offers, best, supplier, nation
        |WHERE p_partkey = l_partkey AND b_partkey = l_partkey
        |  AND s_suppkey = l_suppkey AND s_nationkey = n_nationkey
        |  AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
        |  AND min_price = best_price
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val euNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").where(col("r_name") === "EUROPE")
          .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("eu_nationkey"), col("n_name"))
      val euSup = t(s, dir, "supplier")
        .join(broadcast(euNations), col("s_nationkey") === col("eu_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val offers = t(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(broadcast(euSup.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(round(col("l_extendedprice") / col("l_quantity"), 4))
          .as("min_price"))
      val best = offers.groupBy(col("l_partkey").as("b_partkey"))
        .agg(min(col("min_price")).as("best_price"))
      val parts = t(s, dir, "part")
        .where(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select("p_partkey", "p_type")
      offers
        .join(best, col("l_partkey") === col("b_partkey")
          && col("min_price") === col("best_price"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(euSup), col("l_suppkey") === col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
          "min_price")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // ---- Q21: suppliers who kept orders waiting — semi AND anti on
    // the same fact. No commit/receipt dates, so "late" = shipped >60
    // days after the order date; the blamed supplier is late on a
    // multi-supplier order where NO other supplier was also late.
    // Both the EXISTS and NOT EXISTS are equi-joins on the order key
    // with the supplier inequality as a join residual — never a
    // per-row subquery — and the late set is computed once and
    // reused for both sides of the anti. ----
    sql(
      "q_tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val late = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
      val others = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey"))
      val lateOthers = late
        .select(col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey"))
      late
        .join(others, col("o2_orderkey") === col("l_orderkey")
          && col("o2_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(lateOthers, col("o3_orderkey") === col("l_orderkey")
          && col("o3_suppkey") =!= col("l_suppkey"), "left_anti")
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // ---- Q11: important stock — the HAVING-vs-scalar-subquery
    // shape. No partsupp, so "stock value" is a nation's observed
    // line revenue per part. Per-part and grand totals BOTH
    // accumulate in decimal, then BOTH cast to double before the
    // 0.001· threshold compare — each engine derives both comparands
    // from the same exact sums, so the boundary cannot flip on
    // summation order. The grand total rides a 1-row broadcast. ----
    sql(
      "q_tpch_q11",
      """WITH natline AS (
        |  SELECT l_partkey,
        |         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS val
        |  FROM lineitem, supplier, nation
        |  WHERE s_suppkey = l_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_7')
        |SELECT l_partkey, CAST(round(sum(val), 2) AS DOUBLE) AS value
        |FROM natline
        |GROUP BY l_partkey
        |HAVING CAST(sum(val) AS DOUBLE) >
        |  (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM natline)
        |ORDER BY value DESC, l_partkey""".stripMargin) { (s, dir) =>
      val natSup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(t(s, dir, "nation")
          .where(col("n_name") === "NATION_7").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val natline = t(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast(natSup), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)").as("val"))
      val perPart = natline.groupBy("l_partkey")
        .agg(sum(col("val")).as("part_val"))
      val total = natline.agg(
        (sum(col("val")).cast("double") * 0.001).as("threshold"))
      perPart.crossJoin(broadcast(total))
        .where(col("part_val").cast("double") > col("threshold"))
        .select(col("l_partkey"),
          round(col("part_val"), 2).cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },

    // ---- Q12: priority histogram — the conditional two-way count.
    // No l_shipmode, so l_linestatus stands in for the mode axis and
    // "late" is a shipdate window off the order date; the two CASE
    // sums ride one partial+final hash aggregate over the join. ----
    sql(
      "q_tpch_q12",
      """SELECT l_linestatus,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate < o_orderdate + INTERVAL 120 DAY
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(t(s, dir, "lineitem")
          .select("l_orderkey", "l_linestatus", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS")
          && col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 120 DAYS"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(isHigh, 1).otherwise(0)).as("high_line_count"),
          sum(when(!isHigh, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_linestatus")
    })
}
