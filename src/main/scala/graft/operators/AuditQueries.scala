package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality / privacy audit operators — the release gates a
  * training-data platform runs before a corpus (or an aggregate
  * readout over it) leaves the pipeline:
  *
  *  - Benford first-digit conformance: fabricated or clipped numeric
  *    columns drift from the log-curve; one corpus aggregation to 9
  *    rows, chi-squared against pinned expected frequencies.
  *  - k-anonymity: quasi-identifier group-size distribution plus the
  *    suppression rate at k=5 — the re-identification risk screen.
  *    One hash-partitioned groupBy; everything after runs on the
  *    #groups frame.
  *  - ε-differentially-private counts: Laplace(Δf/ε) noise on released
  *    aggregates via the inverse-CDF transform. The uniform is a
  *    deterministic md5 draw (the repo's seeded-randomness convention,
  *    cf. q_weighted_sample/q_bootstrap_ci) so the release is
  *    reproducible AND cross-engine checkable; a production deployment
  *    would swap the salt for a secret per-release nonce — the plan
  *    shape (pure projection over the aggregate) is identical.
  *
  * All three collapse the corpus in ONE partial-agg shuffle and do
  * their statistics on bounded frames — nothing here grows with rows
  * at 100 TB except the first aggregation.
  */
object AuditQueries {

  import QueryDef.sql
  import graft.functions.TextFunctions.h32

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private def dayNum(ts: Column): Column =
    graft.functions.TimeFunctions.dayNum(ts)

  /** Benford expected first-digit probabilities log10(1+1/d), d=1..9,
    * pinned as literals so neither engine's log10 is in the loop. */
  private val BenfordP = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  private val benfordCaseSql: String =
    BenfordP.zipWithIndex
      .map { case (p, i) => s"WHEN g.d = ${i + 1} THEN $p" }
      .mkString("CASE ", " ", " END")

  val defs: Seq[QueryDef] = Seq(

    // ---- Benford first-digit audit of order totals ----
    // First significant digit via DECIMAL→string (deterministic
    // rendering on both engines — no log10 boundary exposure at exact
    // powers of ten). Per-digit chi² terms are scalar doubles from
    // exact integers; the total accumulates in DECIMAL(38,18) so the
    // merge order can't move the rounded statistic (the
    // q_chi2_independence idiom).
    sql(
      "q_benford",
      s"""WITH dg AS (SELECT CAST(regexp_extract(
         |      CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR),
         |      '([1-9])', 1) AS BIGINT) AS d
         |  FROM orders WHERE o_totalprice > 0),
         |o AS (SELECT d, CAST(count(*) AS BIGINT) AS obs FROM dg GROUP BY d),
         |g AS (SELECT unnest(generate_series(1, 9)) AS d),
         |j AS (SELECT g.d AS d, CAST(coalesce(o.obs, 0) AS BIGINT) AS obs,
         |             CAST($benfordCaseSql AS DOUBLE) AS p
         |      FROM g LEFT JOIN o ON o.d = g.d),
         |n0 AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM j),
         |terms AS (SELECT d, obs, p, (SELECT n FROM n0) * p AS exp_n,
         |    (obs - (SELECT n FROM n0) * p) * (obs - (SELECT n FROM n0) * p)
         |      / ((SELECT n FROM n0) * p) AS term
         |  FROM j),
         |tot AS (SELECT CAST(sum(CAST(term AS DECIMAL(38,18))) AS DOUBLE) AS chi2
         |        FROM terms)
         |SELECT d AS digit, obs, round(exp_n, 4) AS exp_n,
         |       round(term, 6) AS chi2_term,
         |       round((SELECT chi2 FROM tot), 6) AS chi2
         |FROM terms ORDER BY digit""".stripMargin) { (s, dir) =>
      val dg = t(s, dir, "orders")
        .where(col("o_totalprice") > 0)
        .select(regexp_extract(
          col("o_totalprice").cast("decimal(15,2)").cast("string"),
          "([1-9])", 1).cast("long").as("d"))
      val o = dg.groupBy("d").agg(count(lit(1)).as("obs"))
      // dense 1..9 grid: a digit with zero observations must still
      // contribute its full expected count to the statistic
      val g = o.sparkSession.range(1, 10).select(col("id").as("d"))
      val p = BenfordP.zipWithIndex.foldLeft(lit(null).cast("double")) {
        case (els, (pd, i)) => when(col("d") === (i + 1), pd).otherwise(els)
      }
      // 9 rows materialized once — N, the chi² total, and the final
      // projection all read this frame
      val j = g.join(o, Seq("d"), "left")
        .select(col("d"), coalesce(col("obs"), lit(0L)).as("obs"), p.as("p"))
        .localCheckpoint()
      val n0 = j.agg(sum("obs").as("n"))
      val terms = j.crossJoin(broadcast(n0))
        .withColumn("exp_n", col("n") * col("p"))
        .withColumn("term",
          (col("obs") - col("exp_n")) * (col("obs") - col("exp_n")) / col("exp_n"))
      val tot = terms.agg(
        sum(col("term").cast("decimal(38,18)")).cast("double").as("chi2"))
      terms.crossJoin(broadcast(tot))
        .select(col("d").as("digit"), col("obs"),
          round(col("exp_n"), 4).as("exp_n"),
          round(col("term"), 6).as("chi2_term"),
          round(col("chi2"), 6).as("chi2"))
        .orderBy("digit")
    },

    // ---- k-anonymity audit over customer quasi-identifiers ----
    // QID = (nation, market segment, account-balance band): the
    // group-size histogram plus the k=5 suppression rate — how many
    // rows sit in groups small enough to re-identify. The corpus
    // collapses to #QID-groups in one shuffle; the histogram and
    // totals run on that frame.
    sql(
      "q_kanonymity",
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |                  CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bucket,
        |                  CAST(count(*) AS BIGINT) AS k
        |           FROM customer GROUP BY 1, 2, 3),
        |h AS (SELECT k, CAST(count(*) AS BIGINT) AS n_groups,
        |             CAST(sum(k) AS BIGINT) AS n_rows
        |      FROM g GROUP BY k),
        |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS nr,
        |               CAST(sum(CASE WHEN k < 5 THEN n_rows ELSE 0 END) AS BIGINT) AS rr
        |        FROM h)
        |SELECT k, n_groups, n_rows, k < 5 AS risky,
        |       round(CAST((SELECT rr FROM tot) AS DOUBLE)
        |             / (SELECT nr FROM tot), 6) AS suppression_rate
        |FROM h ORDER BY k""".stripMargin) { (s, dir) =>
      val g = t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_bucket"))
        .agg(count(lit(1)).as("k"))
      // #distinct-group-sizes rows (tiny) feeding totals + output
      val h = g.groupBy("k")
        .agg(count(lit(1)).as("n_groups"), sum("k").as("n_rows"))
        .localCheckpoint()
      val tot = h.agg(sum("n_rows").as("nr"),
        sum(when(col("k") < 5, col("n_rows")).otherwise(0L)).as("rr"))
      h.crossJoin(broadcast(tot))
        .select(col("k"), col("n_groups"), col("n_rows"),
          (col("k") < 5).as("risky"),
          round(col("rr").cast("double") / col("nr"), 6).as("suppression_rate"))
        .orderBy("k")
    },

    // ---- ε-DP released counts (Laplace mechanism) ----
    // Count queries have sensitivity Δf = 1; ε = 0.5 ⇒ scale b = 2.
    // Inverse-CDF Laplace from a (0,1) uniform:
    // noise = −b·sign(u−½)·ln(1−2|u−½|). The uniform is an md5 draw
    // keyed on the released cell (deterministic, cross-engine) — the
    // +0.5/10⁶ offset keeps u strictly inside (0,1) so the log never
    // sees 0.
    sql(
      "q_dp_noise",
      """WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1),
        |u AS (SELECT event_type, cnt,
        |        (('0x' || substr(md5(event_type || ':dp'), 1, 8))::BIGINT
        |           % 1000000 + 0.5) / 1000000.0 AS u
        |      FROM c)
        |SELECT event_type,
        |  round(cnt + -2.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 4)
        |    AS noisy_count,
        |  CAST(0.5 AS DOUBLE) AS epsilon
        |FROM u ORDER BY event_type""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      val u = ((h32(concat(col("event_type"), lit(":dp"))) % 1000000L + 0.5)
        / 1000000.0)
      c.withColumn("u", u)
        .select(col("event_type"),
          round(col("cnt") + lit(-2.0) * signum(col("u") - 0.5)
            * log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)), 4)
            .as("noisy_count"),
          lit(0.5).as("epsilon"))
        .orderBy("event_type")
    },

    // ---- data-quality constraint suite (Deequ-style checks) ----
    // The expectation gate a pipeline runs before publishing a table:
    // uniqueness (PK duplicate count), referential integrity (orphan
    // facts via anti join), completeness (null counts), and range/
    // domain violations — one row per named check with the violation
    // count and a pass flag. Per-table checks FUSE into one
    // conditional-sum aggregation per table (one corpus pass each, not
    // one per check); the FK check is a broadcast-able anti join. All
    // counts exact integers; thresholds are zero-violation.
    sql(
      "q_dq_checks",
      """WITH ev AS (SELECT
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
        |    CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
        |    CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_value,
        |    CAST(sum(CASE WHEN event_type NOT IN ('view','click','purchase','error','signup')
        |             THEN 1 ELSE 0 END) AS BIGINT) AS bad_type
        |  FROM events),
        |li AS (SELECT
        |    CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
        |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
        |             THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc
        |  FROM lineitem),
        |pk AS (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |         AS dup_pk FROM orders),
        |fk AS (SELECT CAST(count(*) AS BIGINT) AS orphans FROM lineitem l
        |       WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                         WHERE o.o_orderkey = l.l_orderkey)),
        |r AS (
        |  SELECT 'events_value_not_null' AS check_name, null_value AS violations FROM ev
        |  UNION ALL SELECT 'events_props_not_null', null_props FROM ev
        |  UNION ALL SELECT 'events_value_nonnegative', neg_value FROM ev
        |  UNION ALL SELECT 'events_type_in_domain', bad_type FROM ev
        |  UNION ALL SELECT 'lineitem_quantity_positive', bad_qty FROM li
        |  UNION ALL SELECT 'lineitem_discount_in_range', bad_disc FROM li
        |  UNION ALL SELECT 'orders_pk_unique', dup_pk FROM pk
        |  UNION ALL SELECT 'lineitem_fk_orders', orphans FROM fk)
        |SELECT check_name, violations, violations = 0 AS pass
        |FROM r ORDER BY check_name""".stripMargin) { (s, dir) =>
      val okTypes = Seq("view", "click", "purchase", "error", "signup")
      val ev = t(s, dir, "events").agg(
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_value"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("neg_value"),
        sum(when(!col("event_type").isin(okTypes: _*), 1L).otherwise(0L))
          .as("bad_type"))
      val li = t(s, dir, "lineitem").agg(
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("bad_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.5, 1L)
          .otherwise(0L)).as("bad_disc"))
      val pk = t(s, dir, "orders").agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_pk"))
      val fk = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
      def row(name: String, from: DataFrame, c: String) =
        from.select(lit(name).as("check_name"), col(c).as("violations"))
      row("events_value_not_null", ev, "null_value")
        .unionByName(row("events_props_not_null", ev, "null_props"))
        .unionByName(row("events_value_nonnegative", ev, "neg_value"))
        .unionByName(row("events_type_in_domain", ev, "bad_type"))
        .unionByName(row("lineitem_quantity_positive", li, "bad_qty"))
        .unionByName(row("lineitem_discount_in_range", li, "bad_disc"))
        .unionByName(row("orders_pk_unique", pk, "dup_pk"))
        .unionByName(row("lineitem_fk_orders", fk, "orphans"))
        .select(col("check_name"), col("violations"),
          (col("violations") === 0).as("pass"))
        .orderBy("check_name")
    },

    // ---- l-diversity audit ----
    // k-anonymity's blind spot: a group can be large (k-safe) yet
    // carry only ONE sensitive value, so membership still reveals it.
    // Over a released (day, hour, value-band) aggregation of the event
    // log, l = distinct sensitive values (event_type) per QID group;
    // the histogram of l plus the share of ROWS in groups failing
    // l ≥ 3. One corpus collapse to QID groups (single-distinct
    // aggregate), then the tiny histogram math.
    sql(
      "q_ldiversity",
      """WITH g AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(date_part('hour', ts) AS BIGINT) AS hr,
        |    CAST(floor(value / 50) AS BIGINT) AS vband,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS l,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |h AS (SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
        |             CAST(sum(n) AS BIGINT) AS n_rows
        |      FROM g GROUP BY l),
        |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS nr,
        |          CAST(sum(CASE WHEN l < 3 THEN n_rows ELSE 0 END) AS BIGINT) AS rr
        |        FROM h)
        |SELECT l, n_groups, n_rows, l < 3 AS risky,
        |       round(CAST((SELECT rr FROM tot) AS DOUBLE)
        |             / (SELECT nr FROM tot), 6) AS exposure_rate
        |FROM h ORDER BY l""".stripMargin) { (s, dir) =>
      val g = t(s, dir, "events")
        .groupBy(dayNum(col("ts")).as("d"),
          hour(col("ts")).cast("long").as("hr"),
          floor(col("value") / 50).cast("long").as("vband"))
        .agg(countDistinct(col("event_type")).as("l"), count(lit(1)).as("n"))
      val h = g.groupBy("l")
        .agg(count(lit(1)).as("n_groups"), sum("n").as("n_rows"))
        .localCheckpoint() // tiny histogram feeding totals + output
      val tot = h.agg(sum("n_rows").as("nr"),
        sum(when(col("l") < 3, col("n_rows")).otherwise(0L)).as("rr"))
      h.crossJoin(broadcast(tot))
        .select(col("l"), col("n_groups"), col("n_rows"),
          (col("l") < 3).as("risky"),
          round(col("rr").cast("double") / col("nr"), 6).as("exposure_rate"))
        .orderBy("l")
    },

    // ---- order-independent table fingerprint (replication audit) ----
    // Cross-cluster dataset equality without moving rows: each row
    // canonicalizes to a stable string (integer CENTS for numerics +
    // epoch-µs timestamps — double→string formatting is NOT portable
    // across engines, and even decimal→string rendering differs by
    // engine build, so the canonical form is pure integers:
    // DECIMAL(12,2)*100 is exactly integral, and an integral decimal
    // casts to the same BIGINT under truncation and rounding alike),
    // hashes through h32, and
    // the table fingerprint is the SUM of row hashes — commutative,
    // so partition order, shuffle order and file layout can't change
    // it, and a single flipped row flips the sum. One map-side pass
    // per table, a 1-row result — the cheapest possible 100-TB
    // "did the copy land intact" gate, and the per-table row counts
    // ride along for the fast-path mismatch diagnosis.
    sql(
      "q_table_fingerprint",
      """WITH li AS (SELECT ('0x' || substr(md5(
        |      CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR)
        |      || '|' || CAST(l_suppkey AS VARCHAR)
        |      || '|' || CAST(l_linenumber AS VARCHAR)
        |      || '|' || CAST(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR)
        |      || '|' || CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR)
        |      || '|' || CAST(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR)
        |      || '|' || l_returnflag || '|' || l_linestatus
        |      || '|' || CAST(epoch_us(l_shipdate) AS VARCHAR)), 1, 8))::BIGINT AS h
        |      FROM lineitem),
        |od AS (SELECT ('0x' || substr(md5(
        |      CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
        |      || '|' || o_orderstatus
        |      || '|' || CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR)
        |      || '|' || CAST(epoch_us(o_orderdate) AS VARCHAR)
        |      || '|' || o_orderpriority), 1, 8))::BIGINT AS h
        |      FROM orders)
        |SELECT 'lineitem' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(h) AS BIGINT) AS fingerprint FROM li
        |UNION ALL
        |SELECT 'orders', CAST(count(*) AS BIGINT),
        |       CAST(sum(h) AS BIGINT) FROM od
        |ORDER BY tbl""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      // integer cents: DECIMAL(12,2)*100 is exactly integral, so the
      // BIGINT cast is the same value whether an engine truncates or
      // rounds, and integers render identically everywhere
      def dec(c: Column) =
        (c.cast("decimal(12,2)") * 100).cast("long").cast("string")
      val li = t(s, dir, "lineitem").select(h32(concat_ws("|",
        col("l_orderkey").cast("string"), col("l_partkey").cast("string"),
        col("l_suppkey").cast("string"), col("l_linenumber").cast("string"),
        dec(col("l_quantity")), dec(col("l_extendedprice")),
        dec(col("l_discount")), col("l_returnflag"), col("l_linestatus"),
        unix_micros(col("l_shipdate")).cast("string"))).as("h"))
      val od = t(s, dir, "orders").select(h32(concat_ws("|",
        col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
        col("o_orderstatus"), dec(col("o_totalprice")),
        unix_micros(col("o_orderdate")).cast("string"),
        col("o_orderpriority"))).as("h"))
      // h is a 32-bit value, so even a 2-billion-row table keeps the
      // sum inside int64 — the fingerprint is emitted as plain BIGINT
      // (no decimal rendering anywhere in the output)
      def fp(name: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n_rows"),
          sum(col("h")).cast("long").as("fingerprint"))
          .select(lit(name).as("tbl"), col("n_rows"), col("fingerprint"))
      fp("lineitem", li).unionByName(fp("orders", od)).orderBy("tbl")
    },

    // ---- snapshot diff (table-version data-diff audit) ----
    // The row-level complement to q_table_fingerprint: when the
    // fingerprints disagree, diff two table versions into
    // added/removed/changed/unchanged counts. v1 is a deterministic
    // synthetic mutation of orders (keys %100=7 deleted, %100=13
    // repriced, %100=21 cloned under a shifted key) so the expected
    // diff is known by construction. ONE full-outer join on the
    // primary key comparing canonical row hashes — at 100 TB both
    // sides hash-partition on the key and the diff never compares
    // more than each key's pair; output is 4 counters.
    sql(
      "q_snapshot_diff",
      """WITH v0 AS (SELECT o_orderkey AS k,
        |    md5(o_orderstatus || '|'
        |        || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
        |        || '|' || o_orderpriority) AS h
        |  FROM orders),
        |v1 AS (SELECT o_orderkey AS k,
        |    md5(o_orderstatus || '|'
        |        || CAST(CAST(CASE WHEN o_orderkey % 100 = 13
        |                     THEN o_totalprice + 10 ELSE o_totalprice END
        |               AS DECIMAL(12,2)) AS VARCHAR)
        |        || '|' || o_orderpriority) AS h
        |  FROM orders WHERE o_orderkey % 100 <> 7
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000,
        |    md5(o_orderstatus || '|'
        |        || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
        |        || '|' || o_orderpriority)
        |  FROM orders WHERE o_orderkey % 100 = 21),
        |d AS (SELECT
        |    CASE WHEN v0.k IS NULL THEN 'added'
        |         WHEN v1.k IS NULL THEN 'removed'
        |         WHEN v0.h <> v1.h THEN 'changed'
        |         ELSE 'unchanged' END AS change_type
        |  FROM v0 FULL OUTER JOIN v1 ON v1.k = v0.k)
        |SELECT change_type, CAST(count(*) AS BIGINT) AS n
        |FROM d GROUP BY change_type ORDER BY change_type""".stripMargin) { (s, dir) =>
      def rowHash(price: Column) = md5(concat_ws("|",
        col("o_orderstatus"), price.cast("decimal(12,2)").cast("string"),
        col("o_orderpriority")))
      val orders = t(s, dir, "orders")
      val v0 = orders.select(col("o_orderkey").as("k"),
        rowHash(col("o_totalprice")).as("h"))
      val v1 = orders.where(col("o_orderkey") % 100 =!= 7)
        .select(col("o_orderkey").as("k"),
          rowHash(when(col("o_orderkey") % 100 === 13,
            col("o_totalprice") + 10).otherwise(col("o_totalprice"))).as("h"))
        .unionByName(orders.where(col("o_orderkey") % 100 === 21)
          .select((col("o_orderkey") + 1000000000L).as("k"),
            rowHash(col("o_totalprice")).as("h")))
      v0.withColumnRenamed("h", "h0")
        .join(v1.withColumnRenamed("h", "h1")
          .withColumnRenamed("k", "k1"), col("k1") === col("k"), "full")
        .select(when(col("k").isNull, "added")
          .when(col("k1").isNull, "removed")
          .when(col("h0") =!= col("h1"), "changed")
          .otherwise("unchanged").as("change_type"))
        .groupBy("change_type").agg(count(lit(1)).as("n"))
        .orderBy("change_type")
    },

    // ---- local-DP frequency estimation (randomized response) ----
    // k-ary randomized response (Warner'65 / RAPPOR's direct-encoding
    // mode): each event reports its true category with probability
    // p = 0.75, otherwise a uniformly random category; the server
    // DEBIASES the noisy histogram with π̂ = (c/n − (1−p)/k) / (p −
    // (1−p)/k)... using the standard unbiased estimator for
    // report = truth w.p. p + (1−p)/k. Per the repo's seeded-
    // randomness convention (q_dp_noise) the coins are deterministic
    // md5 draws, so the release is reproducible and cross-engine
    // checkable. ONE corpus pass builds both the true and reported
    // histograms (the per-row perturbation is a pure projection —
    // this is the aggregation pattern of any LDP collector at scale).
    sql(
      "q_ldp_frequency",
      """WITH r AS (SELECT event_type,
        |    (('0x' || substr(md5('ldp:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
        |       % 1000000 + 0.5) / 1000000.0 AS u,
        |    ['click','error','purchase','signup','view']
        |      [CAST(('0x' || substr(md5('ldpc:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
        |            % 5 AS INT) + 1] AS alt
        |  FROM events),
        |o AS (SELECT event_type,
        |             CASE WHEN u < 0.75 THEN event_type ELSE alt END AS reported
        |      FROM r),
        |tc AS (SELECT event_type AS et, CAST(count(*) AS BIGINT) AS n_true
        |       FROM o GROUP BY 1),
        |rc AS (SELECT reported AS et, CAST(count(*) AS BIGINT) AS n_reported
        |       FROM o GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o)
        |SELECT tc.et AS event_type, tc.n_true, rc.n_reported,
        |  round((CAST(rc.n_reported AS DOUBLE) / (SELECT n FROM tot) - 0.05)
        |        / 0.80 * (SELECT n FROM tot), 2) AS n_debiased,
        |  round(abs((CAST(rc.n_reported AS DOUBLE) / (SELECT n FROM tot) - 0.05)
        |        / 0.80 * (SELECT n FROM tot) - tc.n_true)
        |        / tc.n_true, 4) AS rel_err
        |FROM tc JOIN rc ON rc.et = tc.et
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      // report = truth w.p. p + (1−p)/k = 0.75 + 0.05 = 0.80; uniform
      // floor (1−p)/k = 0.05 — the debias constants below
      val cats = array(Seq("click", "error", "purchase", "signup", "view")
        .map(lit): _*)
      val r = t(s, dir, "events").select(col("event_type"),
        ((h32(concat(lit("ldp:"), col("event_id").cast("string"))) % 1000000L
          + 0.5) / 1000000.0).as("u"),
        element_at(cats,
          (h32(concat(lit("ldpc:"), col("event_id").cast("string"))) % 5L)
            .cast("int") + 1).as("alt"))
      val o = r.select(col("event_type"),
        when(col("u") < 0.75, col("event_type")).otherwise(col("alt"))
          .as("reported"))
        .localCheckpoint() // feeds true + reported histograms + total
      val tc = o.groupBy(col("event_type").as("et")).agg(count(lit(1)).as("n_true"))
      val rc = o.groupBy(col("reported").as("et")).agg(count(lit(1)).as("n_reported"))
      val tot = o.agg(count(lit(1)).as("n"))
      val est =
        ((col("n_reported").cast("double") / col("n") - 0.05) / 0.80) * col("n")
      tc.join(rc, "et").crossJoin(broadcast(tot))
        .select(col("et").as("event_type"), col("n_true"), col("n_reported"),
          round(est, 2).as("n_debiased"),
          round(abs(est - col("n_true")) / col("n_true"), 4).as("rel_err"))
        .orderBy("event_type")
    },

    // ---- functional-dependency conformance audit ----
    // The profiling question behind schema inference and DQ
    // contracts: does X → Y hold, and how badly is it violated? For
    // each declared FD the violating-row count is the minimum number
    // of rows to delete for the FD to hold exactly:
    // Σ_x (n_x − max_y n_xy). Three FDs over three tables, each ONE
    // (x, y) hash aggregation (the corpus pass) with all the audit
    // arithmetic on the per-key frame.
    sql(
      "q_fd_audit",
      """WITH d1 AS (SELECT source AS x, lang AS y FROM documents),
        |d2 AS (SELECT CAST(user_id AS VARCHAR) AS x, event_type AS y FROM events),
        |d3 AS (SELECT CAST(o_custkey AS VARCHAR) AS x, o_orderpriority AS y
        |       FROM orders),
        |u AS (SELECT 'documents: source->lang' AS fd, x, y FROM d1
        |      UNION ALL SELECT 'events: user_id->event_type', x, y FROM d2
        |      UNION ALL SELECT 'orders: custkey->priority', x, y FROM d3),
        |xy AS (SELECT fd, x, y, CAST(count(*) AS BIGINT) AS c
        |       FROM u GROUP BY 1, 2, 3),
        |k AS (SELECT fd, x, CAST(sum(c) AS BIGINT) AS n_x,
        |        CAST(max(c) AS BIGINT) AS max_y,
        |        CAST(count(*) AS BIGINT) AS n_y
        |      FROM xy GROUP BY 1, 2)
        |SELECT fd, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(n_x) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS violating_keys,
        |  CAST(sum(n_x - max_y) AS BIGINT) AS violating_rows,
        |  round(1.0 - CAST(sum(n_x - max_y) AS DOUBLE) / sum(n_x), 6)
        |    AS conformance
        |FROM k GROUP BY fd ORDER BY fd""".stripMargin) { (s, dir) =>
      def fdOf(df: DataFrame, name: String, x: Column, y: Column) =
        df.select(lit(name).as("fd"), x.cast("string").as("x"), y.as("y"))
      val u = fdOf(t(s, dir, "documents"), "documents: source->lang",
          col("source"), col("lang"))
        .unionByName(fdOf(t(s, dir, "events"), "events: user_id->event_type",
          col("user_id"), col("event_type")))
        .unionByName(fdOf(t(s, dir, "orders"), "orders: custkey->priority",
          col("o_custkey"), col("o_orderpriority")))
      val xy = u.groupBy("fd", "x", "y").agg(count(lit(1)).as("c"))
      val k = xy.groupBy("fd", "x").agg(sum("c").cast("long").as("n_x"),
        max("c").cast("long").as("max_y"), count(lit(1)).as("n_y"))
      k.groupBy("fd").agg(count(lit(1)).as("n_keys"),
          sum("n_x").cast("long").as("n_rows"),
          sum(when(col("n_y") > 1, 1L).otherwise(0L)).as("violating_keys"),
          sum(col("n_x") - col("max_y")).cast("long").as("violating_rows"))
        .select(col("fd"), col("n_keys"), col("n_rows"), col("violating_keys"),
          col("violating_rows"),
          round(lit(1.0) - col("violating_rows").cast("double") / col("n_rows"),
            6).as("conformance"))
        .orderBy("fd")
    },

    // ---- join-key skew audit (the salting-decision input) ----
    // The pre-flight check for every large join: how skewed is the
    // key? Per candidate key, the frequency distribution's shape —
    // top-1 share, exact p50/p99 key frequency, and the salt flag
    // (top key exceeding 1/32 of rows would overload one of this
    // session's 32 shuffle partitions). One (key) hash aggregation
    // per table — the corpus cost — with all order statistics on the
    // per-key frame.
    sql(
      "q_skew_audit_multi",
      """WITH f1 AS (SELECT 'lineitem.l_orderkey' AS key_name,
        |    CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY l_orderkey),
        |f2 AS (SELECT 'orders.o_custkey', CAST(count(*) AS BIGINT)
        |       FROM orders GROUP BY o_custkey),
        |f3 AS (SELECT 'events.user_id', CAST(count(*) AS BIGINT)
        |       FROM events GROUP BY user_id),
        |u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2
        |      UNION ALL SELECT * FROM f3)
        |SELECT key_name, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(c) AS BIGINT) AS n_rows, CAST(max(c) AS BIGINT) AS max_freq,
        |  round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top1_share,
        |  round(CAST(quantile_cont(c, 0.5) AS DOUBLE), 4) AS p50_freq,
        |  round(CAST(quantile_cont(c, 0.99) AS DOUBLE), 4) AS p99_freq,
        |  round(CAST(quantile_cont(c, 0.99) AS DOUBLE)
        |        / CAST(quantile_cont(c, 0.5) AS DOUBLE), 4) AS p99_over_p50,
        |  CAST(CAST(max(c) AS DOUBLE) / sum(c) > 1.0 / 32 AS BOOLEAN)
        |    AS salt_recommended
        |FROM u GROUP BY key_name ORDER BY key_name""".stripMargin) { (s, dir) =>
      def freqs(df: DataFrame, name: String, k: Column) =
        df.groupBy(k.as("k")).agg(count(lit(1)).as("c"))
          .select(lit(name).as("key_name"), col("c"))
      val u = freqs(t(s, dir, "lineitem"), "lineitem.l_orderkey", col("l_orderkey"))
        .unionByName(freqs(t(s, dir, "orders"), "orders.o_custkey",
          col("o_custkey")))
        .unionByName(freqs(t(s, dir, "events"), "events.user_id",
          col("user_id")))
      u.groupBy("key_name").agg(count(lit(1)).as("n_keys"),
          sum("c").cast("long").as("n_rows"), max("c").cast("long").as("max_freq"),
          percentile(col("c"), lit(0.5)).as("p50"),
          percentile(col("c"), lit(0.99)).as("p99"))
        .select(col("key_name"), col("n_keys"), col("n_rows"), col("max_freq"),
          round(col("max_freq").cast("double") / col("n_rows"), 6)
            .as("top1_share"),
          round(col("p50"), 4).as("p50_freq"), round(col("p99"), 4).as("p99_freq"),
          round(col("p99") / col("p50"), 4).as("p99_over_p50"),
          (col("max_freq").cast("double") / col("n_rows") > lit(1.0) / 32)
            .as("salt_recommended"))
        .orderBy("key_name")
    }
  )
}
