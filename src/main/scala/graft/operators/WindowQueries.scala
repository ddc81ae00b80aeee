package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface: ranking, analytic (lag/lead/first/last),
  * frame-bounded aggregates, per-group top-k, and the as-of join
  * (latest event at-or-before a time) built from a window — the Spark
  * realization of "latest state per key" lookups.
  *
  * Scale notes: a window partitioned by a key is one shuffle on that
  * key; all functions over the same (partitionBy, orderBy) share a
  * single sort. Per-group top-k uses row_number + filter — the filter
  * is applied during the sorted scan, never materializing full groups.
  * The as-of join shuffles both sides once on the join key (union-style
  * window trick) instead of an O(n·m) range cross-join.
  */
object WindowQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- positional value functions over an explicit rows frame ----
    sql(
      "q_window_nth",
      """SELECT event_id,
        |       round(first_value(value) OVER w, 2) AS v_first,
        |       round(nth_value(value, 3) OVER w, 2) AS v_third,
        |       round(last_value(value) OVER w, 2) AS v_last
        |FROM events
        |WHERE event_id % 11 = 0
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(-2, 2)
      t(s, dir, "events")
        .where(col("event_id") % 11 === 0)
        .select(
          col("event_id"),
          round(first(col("value")).over(w), 2).as("v_first"),
          round(nth_value(col("value"), 3).over(w), 2).as("v_third"),
          round(last(col("value")).over(w), 2).as("v_last"))
        .orderBy("event_id")
    },

    // ---- ranking family over one shared sort ----
    sql(
      "q_window_rank",
      """SELECT c_nationkey, c_custkey,
        |       round(c_acctbal, 2) AS bal,
        |       row_number() OVER w AS rn,
        |       rank()       OVER w AS rk,
        |       dense_rank() OVER w AS drk,
        |       ntile(4)     OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(desc("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(
          col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("bal"),
          row_number().over(w).cast("bigint").as("rn"),
          rank().over(w).cast("bigint").as("rk"),
          dense_rank().over(w).cast("bigint").as("drk"),
          ntile(4).over(w).cast("bigint").as("quartile"))
        .orderBy("c_nationkey", "rn")
    },

    // ---- distribution functions: percent_rank / cume_dist ----
    sql(
      "q_window_pct",
      """SELECT s_suppkey,
        |       round(percent_rank() OVER w, 6) AS prk,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM supplier
        |WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      // Global percent_rank/cume_dist WITHOUT the global window: a
      // naive Window.orderBy(...) puts the whole SF-scaled table in
      // ONE task (Spark even warns). The scalable two-pass prefix-sum
      // lives in [[GlobalPrefix]] (shared with q_token_budget): the
      // global rank is the running count over the total order. The
      // full sort key (acctbal, suppkey) is UNIQUE, so rank() ≡
      // row_number() and the closed forms are exact:
      // prk = (rank-1)/(N-1), cd = rank/N — same arithmetic Spark's
      // window functions evaluate, oracle unchanged.
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_acctbal")
      val (ranked, grand) = GlobalPrefix.runningTotalWithGrand(
        sup, Seq(col("s_acctbal"), col("s_suppkey")), lit(1L), "rk")
      ranked
        .crossJoin(broadcast(grand.select(col("__grand").as("n_total"))))
        .select(
          col("s_suppkey"),
          // greatest(...,1): a 1-row table is prk=0 (0/1), matching
          // percent_rank's internal n==1 guard instead of ANSI 0/0
          round((col("rk") - 1) /
            greatest(col("n_total") - 1, lit(1L)).cast("double"), 6).as("prk"),
          round(col("rk") / col("n_total").cast("double"), 6).as("cd"))
        .orderBy("s_suppkey")
    },

    // ---- analytic functions: lag / lead / first / last ----
    sql(
      "q_window_lag",
      """SELECT user_id, event_id,
        |       round(value, 2) AS v,
        |       round(coalesce(lag(value)  OVER w, -1), 2) AS prev_v,
        |       round(coalesce(lead(value) OVER w, -1), 2) AS next_v,
        |       round(first_value(value) OVER w, 2) AS first_v,
        |       round(last_value(value)  OVER w, 2) AS last_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(
          col("user_id"), col("event_id"),
          round(col("value"), 2).as("v"),
          round(coalesce(lag(col("value"), 1).over(w), lit(-1)), 2).as("prev_v"),
          round(coalesce(lead(col("value"), 1).over(w), lit(-1)), 2).as("next_v"),
          round(first(col("value")).over(w), 2).as("first_v"),
          round(last(col("value")).over(w), 2).as("last_v"))
        .orderBy("user_id", "event_id")
    },

    // ---- frame-bounded aggregates: running total + moving average ----
    sql(
      "q_window_frames",
      """SELECT user_id, event_id,
        |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
        |       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg,
        |       count(*) OVER (PARTITION BY user_id) AS n_user
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(
          col("user_id"), col("event_id"),
          round(sum(col("value"))
            .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running"),
          round(avg(col("value"))
            .over(ord.rowsBetween(-2, Window.currentRow)), 4).as("mov_avg"),
          count(lit(1)).over(Window.partitionBy(col("user_id"))).as("n_user"))
        .orderBy("user_id", "event_id")
    },

    // ---- per-group top-k ----
    sql(
      "q_topk_per_group",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total"),
          row_number().over(w).cast("bigint").as("rn"))
        .where(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // ---- as-of join: for each order of a user, the latest event of
    //      that user at-or-before the order date ----
    sql(
      "q_asof_join",
      """SELECT o_orderkey, user_id, event_id AS asof_event, round(v, 2) AS asof_value
        |FROM (
        |  SELECT o.o_orderkey, o.o_custkey AS user_id, e.event_id, e.value AS v,
        |         row_number() OVER (PARTITION BY o.o_orderkey
        |                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM orders o JOIN events e
        |    ON e.user_id = o.o_custkey
        |   AND e.ts <= o.o_orderdate + INTERVAL 9000 DAY)
        |WHERE rn = 1
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // Order dates (1995-2001) predate event timestamps (2024), so the
      // as-of point is shifted forward; the mechanics are unchanged.
      //
      // Union-style as-of: tag events and order-probes, sort both
      // streams together per user, and carry the latest event forward
      // with last(ignoreNulls) — ONE shuffle + window over |e| + |o|
      // rows. The per-key range join the oracle spells out would
      // materialize events×orders rows per user before rn=1 prunes
      // (measured ~65× fan-out at sf0.01, quadratic in per-key
      // density) — the classic as-of scale trap. Probes sort AFTER
      // events at an equal timestamp (isProbe tiebreak) so the ≤ of
      // the as-of predicate stays inclusive; events at equal ts sort
      // by event_id so the window's last() agrees with the oracle's
      // ts DESC, event_id DESC rn=1 pick.
      val o = t(s, dir, "orders").select(
        col("o_custkey").as("user_id"),
        (col("o_orderdate") + expr("INTERVAL 9000 DAY")).as("ts"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"),
        col("o_orderkey"),
        lit(1).as("is_probe"))
      val e = t(s, dir, "events").select(
        col("user_id"), col("ts"), col("event_id"), col("value"),
        lit(null).cast("long").as("o_orderkey"),
        lit(0).as("is_probe"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_probe"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // (event_id, value) ride as ONE struct through a single
      // last(ignoreNulls): the carried value always belongs to the
      // picked event, even if an event row has a NULL value (a
      // value-only last() would skip past it to an older event,
      // diverging from the oracle's rn=1 pick).
      e.unionByName(o)
        .withColumn("ev",
          when(col("is_probe") === 0, struct(col("event_id"), col("value"))))
        .withColumn("asof", last(col("ev"), ignoreNulls = true).over(w))
        .where(col("is_probe") === 1 && col("asof").isNotNull)
        .select(
          col("o_orderkey"), col("user_id"),
          col("asof.event_id").as("asof_event"),
          round(col("asof.value"), 2).as("asof_value"))
        .orderBy("o_orderkey")
    },

    // ---- forward as-of join: for each order of a user, the EARLIEST
    //      event of that user at-or-after the order date ----
    // The mirror of q_asof_join (same union-style one-shuffle rewrite,
    // same 65×-fan-out range-join trap avoided); forward as-of is the
    // "next reading after the probe" lookup — next sensor sample after
    // a command, next price tick after an order. Probes sort BEFORE
    // events at an equal timestamp (is_probe DESC tiebreak) so the ≥
    // stays inclusive, and the carried struct comes from
    // first(ignoreNulls) over the FOLLOWING frame, agreeing with the
    // oracle's ts ASC, event_id ASC rn=1 pick.
    sql(
      "q_asof_forward",
      """SELECT o_orderkey, user_id, event_id AS next_event, round(v, 2) AS next_value
        |FROM (
        |  SELECT o.o_orderkey, o.o_custkey AS user_id, e.event_id, e.value AS v,
        |         row_number() OVER (PARTITION BY o.o_orderkey
        |                            ORDER BY e.ts, e.event_id) AS rn
        |  FROM orders o JOIN events e
        |    ON e.user_id = o.o_custkey
        |   AND e.ts >= o.o_orderdate + INTERVAL 9000 DAY)
        |WHERE rn = 1
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders").select(
        col("o_custkey").as("user_id"),
        (col("o_orderdate") + expr("INTERVAL 9000 DAY")).as("ts"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"),
        col("o_orderkey"),
        lit(1).as("is_probe"))
      val e = t(s, dir, "events").select(
        col("user_id"), col("ts"), col("event_id"), col("value"),
        lit(null).cast("long").as("o_orderkey"),
        lit(0).as("is_probe"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), desc("is_probe"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      e.unionByName(o)
        .withColumn("ev",
          when(col("is_probe") === 0, struct(col("event_id"), col("value"))))
        .withColumn("nxt", first(col("ev"), ignoreNulls = true).over(w))
        .where(col("is_probe") === 1 && col("nxt").isNotNull)
        .select(
          col("o_orderkey"), col("user_id"),
          col("nxt.event_id").as("next_event"),
          round(col("nxt.value"), 2).as("next_value"))
        .orderBy("o_orderkey")
    }
  )
}
