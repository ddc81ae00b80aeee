package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph computation — PageRank over the trade graph
  * (customer nation → supplier nation, weighted by line items).
  * Complements the dedup connected-components operator with the other
  * canonical iterative-join pattern: crawl-frontier prioritization at
  * corpus scale ranks domains exactly this way before fetch budgeting.
  *
  * Scale notes: the edge build is the expensive part — two fact-table
  * joins collapsed by one (src, dst) aggregation; the dimension joins
  * broadcast. Each of the K iterations is one hash join on src + one
  * aggregation on dst, both partitioned on node id, so a 1e9-node
  * graph runs the same plan with bigger shuffles. Ranks are
  * `localCheckpoint`ed per round — iterative lineage otherwise makes
  * analysis itself exponential (see NOTES pitfalls). The damping
  * constant 0.85 and K=5 are fixed so the DuckDB oracle can unroll
  * the identical recurrence.
  */
object GraphQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** One unrolled oracle iteration: rank(node) = 0.15/n + 0.85·Σ_in p·pr. */
  private def oracleIter(k: Int): String =
    s"""r$k AS (SELECT u.node,
       |             0.15 / (SELECT nn FROM n)
       |             + 0.85 * coalesce(sum(en.p * rp.pr), 0) AS pr
       |      FROM r0 u
       |      LEFT JOIN en ON en.dst = u.node
       |      LEFT JOIN r${k - 1} rp ON rp.node = en.src
       |      GROUP BY u.node)""".stripMargin

  /** Shared damped-PageRank iteration: K rounds of join+aggregate on
    * node id over normalized edge probabilities `en(src,dst,p)`, rank
    * floor 0.15/nn from the 1-row broadcast `n(nn)`. Rounds 1..K-1
    * localCheckpoint (iterative lineage — NOTES pitfalls); the LAST
    * round stays un-checkpointed so the returned plan exposes one full
    * iteration body to PlanAuditSpec. */
  private def pagerankIterate(en: DataFrame, nodes: DataFrame,
      n: DataFrame, rounds: Int): DataFrame = {
    var pr: DataFrame = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("nn")).as("pr"))
    for (iter <- 1 to rounds) {
      val contrib = en
        .join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("p") * col("pr")).as("in_mass"))
      pr = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(n))
        .select(col("node"),
          (lit(0.15) / col("nn")
            + lit(0.85) * coalesce(col("in_mass"), lit(0.0))).as("pr"))
      if (iter < rounds) pr = pr.localCheckpoint()
    }
    pr
  }

  /** Shared corpus collapse for the word-association queries
    * (q_textrank, q_graph_triangles): distinct (doc, word) presence,
    * the top-50-df vocabulary (checkpointed — it feeds the presence
    * join plus the node list and 1-row counts), and the co-occurrence
    * pair counts with both endpoints' document frequencies. One
    * derivation, so tokenization / vocab tie-breaks / the doc-keyed
    * self-join can never drift between the twin graph queries. */
  private def cooccurParts(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import graft.functions.TextFunctions.tokens
    // the corpus-scale tokenize+explode+distinct feeds 2-3 consumers
    // (df agg, presence join, triangles' doc count) — materialize it
    // once, like every other multi-consumer explode in the repo
    // (review find, r7)
    // serialized storage: this frame is corpus-proportional, and the
    // deserialized default is the exact pattern that starved
    // third-decade aggregations (AGGREGATE_OUT_OF_MEMORY — same fix
    // as q_countmin/basketPairCounts/q_kcore, NOTES r7)
    val ex = t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .distinct()
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val dfq = ex.groupBy("word").agg(count(lit(1)).as("c"))
    val voc = dfq.orderBy(desc("c"), col("word")).limit(50).localCheckpoint()
    val ev = ex.join(broadcast(voc), "word")
    val a = ev.select(col("doc_id"), col("word").as("wa"), col("c").as("ca"))
    val b = ev.select(col("doc_id").as("doc_b"), col("word").as("wb"),
      col("c").as("cb"))
    val pairs = a
      .join(b, col("doc_id") === col("doc_b") && col("wa") < col("wb"))
      .groupBy("wa", "wb")
      .agg(max("ca").as("ca"), max("cb").as("cb"), count(lit(1)).as("cab"))
    (ex, voc, pairs)
  }

  /** The matching oracle CTE text (ex/dfq/voc/ev/pairs) — shared
    * verbatim by both graph oracles. */
  private val cooccurSqlCtes =
    """ex AS (SELECT DISTINCT doc_id, word FROM
      |            (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |             FROM documents)),
      |dfq AS (SELECT word, count(*) AS c FROM ex GROUP BY word),
      |voc AS (SELECT word, c FROM dfq ORDER BY c DESC, word LIMIT 50),
      |ev AS (SELECT ex.doc_id, ex.word, voc.c FROM ex
      |       JOIN voc ON ex.word = voc.word),
      |pairs AS (SELECT a.word AS wa, b.word AS wb,
      |                 max(a.c) AS ca, max(b.c) AS cb, count(*) AS cab
      |          FROM ev a JOIN ev b
      |            ON a.doc_id = b.doc_id AND a.word < b.word
      |          GROUP BY a.word, b.word)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    sql(
      "q_pagerank",
      s"""WITH e AS (
         |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) * 1.0 AS w
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  GROUP BY 1, 2),
         |outw AS (SELECT src, sum(w) AS tw FROM e GROUP BY src),
         |en AS (SELECT e.src, e.dst, e.w / o.tw AS p
         |       FROM e JOIN outw o ON e.src = o.src),
         |n AS (SELECT count(*) * 1.0 AS nn FROM nation),
         |r0 AS (SELECT n_nationkey AS node, 1.0 / (SELECT nn FROM n) AS pr
         |       FROM nation),
         |${(1 to 5).map(oracleIter).mkString(",\n")}
         |SELECT node, round(pr, 6) AS pr
         |FROM r5 ORDER BY node""".stripMargin) { (s, dir) =>
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val lineitem = t(s, dir, "lineitem")
      val supplier = t(s, dir, "supplier")
      val nation = t(s, dir, "nation")

      val edges = orders
        .join(broadcast(customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg((count(lit(1)) * 1.0).as("w"))
      val outw = edges.groupBy("src").agg(sum(col("w")).as("tw"))
      // Out-weight-normalized transition probabilities, materialized
      // once — every iteration re-reads this, not the fact tables.
      // EAGER checkpoints, deliberately: the lazy (eager=false) form
      // measured 2× slower end-to-end at sf0.1 (3.4 s vs 1.8 s; the
      // per-round broadcast-collect jobs race to compute not-yet-
      // persisted blocks), at the cost of running the pipeline when
      // the DataFrame is merely constructed — inherent to iterative
      // queries.
      val en = edges.join(outw, "src")
        .select(col("src"), col("dst"), (col("w") / col("tw")).as("p"))
        .localCheckpoint()

      // Node-count rides the plan as a broadcast 1-row aggregate — no
      // driver-side count, and the same nn feeds init + every round.
      val n = nation.agg((count(lit(1)) * 1.0).as("nn"))
      val nodes = nation.select(col("n_nationkey").as("node"))

      pagerankIterate(en, nodes, n, rounds = 5)
        .select(col("node"), round(col("pr"), 6).as("pr")).orderBy("node")
    },

    // ---- TextRank keyword extraction ----
    // Mihalcea & Tarau 2004: rank words by damped PageRank over the
    // word co-occurrence graph — the unsupervised keyword extractor.
    // Same iteration core as q_pagerank (shared pagerankIterate), but
    // the graph is the top-50-df co-occurrence graph with edge weight
    // = co-occurrence count, symmetrized (TextRank's graph is
    // undirected: each edge contributes both directions before the
    // out-weight normalization). The corpus collapses to ≤V(V−1)/2
    // weighted pairs first; every iteration runs on the tiny graph.
    // A vocab word with no co-occurrence edges keeps the damping
    // floor 0.15/|V| (the left-join coalesce), matching the oracle.
    sql(
      "q_textrank",
      s"""WITH $cooccurSqlCtes,
         |e AS (SELECT wa AS src, wb AS dst, CAST(cab AS DOUBLE) AS w FROM pairs
         |      UNION ALL SELECT wb, wa, CAST(cab AS DOUBLE) FROM pairs),
         |outw AS (SELECT src, sum(w) AS tw FROM e GROUP BY src),
         |en AS (SELECT e.src, e.dst, e.w / o.tw AS p
         |       FROM e JOIN outw o ON e.src = o.src),
         |n AS (SELECT count(*) * 1.0 AS nn FROM voc),
         |r0 AS (SELECT word AS node, 1.0 / (SELECT nn FROM n) AS pr FROM voc),
         |${(1 to 5).map(oracleIter).mkString(",\n")}
         |SELECT node AS word, round(pr, 6) AS rank
         |FROM r5 ORDER BY rank DESC, word LIMIT 20""".stripMargin) { (s, dir) =>
      val (_, voc, pairs) = cooccurParts(s, dir)
      val pw = pairs.select(col("wa"), col("wb"), col("cab").cast("double").as("w"))
      val e = pw.select(col("wa").as("src"), col("wb").as("dst"), col("w"))
        .unionByName(pw.select(col("wb").as("src"), col("wa").as("dst"), col("w")))
      val outw = e.groupBy("src").agg(sum("w").as("tw"))
      val en = e.join(outw, "src")
        .select(col("src"), col("dst"), (col("w") / col("tw")).as("p"))
        .localCheckpoint()
      val n = voc.agg((count(lit(1)) * 1.0).as("nn"))
      val nodes = voc.select(col("word").as("node"))
      pagerankIterate(en, nodes, n, rounds = 5)
        .select(col("node").as("word"), round(col("pr"), 6).as("rank"))
        .orderBy(desc("rank"), col("word")).limit(20)
    },

    // ---- triangle counting with degree-ordered orientation ----
    // Per-node triangle participation over the word-association graph
    // (top-50-df vocabulary, edge iff observed co-occurrence exceeds
    // the independence expectation: cab·N > ca·cb, exact integer
    // arithmetic). Triangle counting is THE local-clustering audit for
    // dedup/similarity pair graphs; the naive 3-way edge self-join is
    // O(Σ deg(v)²) over hub nodes. Orientation by the (degree, name)
    // total order — each undirected edge stored once, low endpoint →
    // high — bounds wedge generation to O(m^{3/2}) regardless of hubs
    // (every src enumerates only HIGHER-degree neighbors), the
    // standard Latapy/Schank-Wagner bound, expressed here as two
    // equi-joins Catalyst can shuffle on src / (dst,dst). The corpus
    // collapse (doc-keyed self-join over a broadcast vocabulary)
    // reuses q_cooccur_pmi's bounded-fan-out derivation; on this
    // synthetic near-random corpus the association graph is dense, but
    // the operator's cost model is driven by the orientation, not the
    // corpus.
    sql(
      "q_graph_triangles",
      s"""WITH $cooccurSqlCtes,
        |n AS (SELECT count(DISTINCT doc_id) AS nd FROM ex),
        |e AS (SELECT wa, wb FROM pairs, n WHERE cab * nd > ca * cb),
        |deg AS (SELECT w, count(*) AS dg FROM
        |        (SELECT wa AS w FROM e UNION ALL SELECT wb AS w FROM e)
        |        GROUP BY w),
        |o AS (SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.wa < e.wb)
        |               THEN e.wa ELSE e.wb END AS src,
        |             CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.wa < e.wb)
        |               THEN e.wb ELSE e.wa END AS dst,
        |             CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.wa < e.wb)
        |               THEN db.dg ELSE da.dg END AS dd
        |      FROM e JOIN deg da ON da.w = e.wa JOIN deg db ON db.w = e.wb),
        |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |        FROM o e1 JOIN o e2 ON e1.src = e2.src
        |          AND (e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst))
        |        JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst)
        |SELECT word, CAST(count(*) AS BIGINT) AS tri FROM
        |  (SELECT a AS word FROM tri UNION ALL SELECT b FROM tri
        |   UNION ALL SELECT c FROM tri)
        |GROUP BY word ORDER BY tri DESC, word""".stripMargin) { (s, dir) =>
      val (ex, _, pairs) = cooccurParts(s, dir)
      val nd = ex.agg(countDistinct(col("doc_id")).as("nd"))
      // association edge: integer lift test, no floating point
      val e = pairs.crossJoin(broadcast(nd))
        .where(col("cab") * col("nd") > col("ca") * col("cb"))
        .select("wa", "wb")
        .localCheckpoint() // consumed 3× below (degree + both endpoints)
      val deg = e.select(col("wa").as("w"))
        .unionAll(e.select(col("wb").as("w")))
        .groupBy("w").agg(count(lit(1)).as("dg"))
      val ed = e
        .join(broadcast(deg.select(col("w").as("wa"), col("dg").as("da"))), "wa")
        .join(broadcast(deg.select(col("w").as("wb"), col("dg").as("db"))), "wb")
      val aLow = col("da") < col("db") ||
        (col("da") === col("db") && col("wa") < col("wb"))
      val o = ed.select(
        when(aLow, col("wa")).otherwise(col("wb")).as("src"),
        when(aLow, col("wb")).otherwise(col("wa")).as("dst"),
        when(aLow, col("db")).otherwise(col("da")).as("dd"))
      val e1 = o.select(col("src"), col("dst").as("b"), col("dd").as("dd1"))
      val e2 = o.select(col("src"), col("dst").as("c"), col("dd").as("dd2"))
      val wedges = e1.join(e2,
        Seq("src"),
        "inner")
        .where(col("dd1") < col("dd2")
          || (col("dd1") === col("dd2") && col("b") < col("c")))
      val closing = o.select(col("src").as("b"), col("dst").as("c"))
      val tri = wedges.join(closing, Seq("b", "c"))
        .select(col("src").as("a"), col("b"), col("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("tri"))
        .orderBy(desc("tri"), col("word"))
    },

    // ---- k-core decomposition (iterative peeling) ----
    // The cohesion audit for candidate-pair graphs: nodes surviving
    // repeated removal of low-degree vertices form the k-core — on a
    // dedup/LSH pair graph a large dense core means template spam, on
    // a co-purchase graph it is the stable product community. Graph =
    // the co-purchase part graph (shared basketPairCounts core, one
    // corpus shuffle); k = ceil(p75 of initial degree) so the
    // threshold adapts to corpus density (Spark `percentile` ≡ DuckDB
    // `quantile_cont`, the established parity). Six peeling rounds,
    // unrolled identically in the oracle: each round is two
    // broadcast-hash semi-joins of the (tiny) survivor set against the
    // directed edge list plus one degree aggregation partitioned on
    // node id — the edge list is never re-shuffled, so a 1e9-edge
    // graph runs the same plan with bigger hash joins. Survivor sets
    // localCheckpoint per round (iterative-lineage pitfall).
    sql(
      "q_kcore",
      s"""WITH ${graft.operators.StatsQueries.basketPairsSqlCtes},
        |ed AS (SELECT p1 AS src, p2 AS dst FROM pairs
        |       UNION ALL SELECT p2, p1 FROM pairs),
        |d0 AS (SELECT src, CAST(count(*) AS BIGINT) AS dg FROM ed GROUP BY src),
        |kv AS (SELECT CAST(ceil(quantile_cont(dg, 0.75)) AS BIGINT) AS k FROM d0),
        |s0 AS (SELECT src FROM d0 WHERE dg >= (SELECT k FROM kv)),
        |${(1 to 6).map(i =>
          s"""s$i AS (SELECT e.src FROM ed e
             |       JOIN s${i - 1} a ON a.src = e.src
             |       JOIN s${i - 1} b2 ON b2.src = e.dst
             |       GROUP BY e.src
             |       HAVING count(*) >= (SELECT k FROM kv))""".stripMargin)
          .mkString(",\n")}
        |SELECT e.src AS part, CAST(count(*) AS BIGINT) AS deg_core,
        |       (SELECT k FROM kv) AS k
        |FROM ed e JOIN s6 a ON a.src = e.src JOIN s6 b2 ON b2.src = e.dst
        |GROUP BY e.src ORDER BY part""".stripMargin) { (s, dir) =>
      val (_, pairs) = graft.operators.StatsQueries.basketPairCounts(s, dir)
      // materialize the UNDIRECTED pair list once, SERIALIZED and
      // disk-spillable — every peeling round re-reads it, not the
      // fact table. Checkpointing the 2× directed list deserialized
      // (the first cut) starved the pair aggregation itself at the
      // 100× decade (~180M cached rows → AGGREGATE_OUT_OF_MEMORY);
      // the directed view is a cheap per-read map over half the rows.
      val pairsCk = pairs.select(col("p1"), col("p2"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val ed = pairsCk.select(col("p1").as("src"), col("p2").as("dst"))
        .unionByName(pairsCk.select(col("p2").as("src"), col("p1").as("dst")))
      val d0 = ed.groupBy("src").agg(count(lit(1)).as("dg"))
      val kv = d0.agg(ceil(expr("percentile(dg, 0.75)")).cast("long").as("k"))
        .localCheckpoint() // 1-row threshold, read every round
      var surv = d0.crossJoin(broadcast(kv))
        .where(col("dg") >= col("k")).select("src")
      for (_ <- 1 to 6) {
        surv = ed
          .join(broadcast(surv), "src")
          .join(broadcast(surv.select(col("src").as("dst"))), "dst")
          .groupBy("src").agg(count(lit(1)).as("dg"))
          .crossJoin(broadcast(kv))
          .where(col("dg") >= col("k")).select("src")
          .localCheckpoint()
      }
      ed.join(broadcast(surv), "src")
        .join(broadcast(surv.select(col("src").as("dst"))), "dst")
        .groupBy(col("src").as("part"))
        .agg(count(lit(1)).as("deg_core"))
        .crossJoin(broadcast(kv))
        .select(col("part"), col("deg_core"), col("k"))
        .orderBy("part")
    }
  )
}
