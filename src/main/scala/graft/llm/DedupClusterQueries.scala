package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-group assignment: connected components over the MinHash-LSH
  * near-dup pair graph — turns pairwise similarity into dedup groups
  * (each doc labeled with the minimum doc_id of its component, the
  * canonical "keeper").
  *
  * Spark realization: iterative min-label propagation over the edge
  * list (a Pregel round as a join+aggregate). Components produced by
  * LSH banding are small cliques/chains, so the iteration count is a
  * small constant; each round is one shuffle on a pair list that is
  * already collision-bounded by the banding. The DuckDB oracle
  * recomputes the same components with a recursive CTE.
  */
object DedupClusterQueries {

  import QueryDef.sql

  private val MaxRounds = 12 // pointer jumping doubles reach per round: 2^12 ≫ any component

  /** (doc_id, component) for every doc that appears in the LSH pair
    * graph — the min-label propagation shared by `q_dedup_components`
    * (which emits it directly) and `q_split_leakproof` (which buckets
    * on it so near-dups can never straddle a train/test boundary).
    */
  def componentLabels(s: SparkSession, dir: String): DataFrame = {
      // The pair graph is orders of magnitude smaller than the corpus:
      // collapse it to a few partitions so the iteration pays per-task
      // overhead proportional to the graph, not the corpus scan. The
      // pair derivation is MinhashPipeline — plan-identical to
      // q_dedup_minhash_lsh's, so in a sweep the cached signatures are
      // computed once and reused here by the cache manager.
      val pairs = MinhashPipeline.pairs(s, dir)
        .select("da", "db").coalesce(4).cache()
      val edges = pairs.select(col("da").as("a"), col("db").as("b"))
        .unionByName(pairs.select(col("db").as("a"), col("da").as("b")))
        .repartition(4, col("b"))
        .cache()
      var labels = edges.select(col("a").as("id")).distinct()
        .withColumn("comp", col("id"))
        .repartition(4, col("id"))
        .localCheckpoint()
      // Min-label propagation with pointer jumping: each round takes
      // the min over neighbors, then replaces comp with comp's comp —
      // reach doubles per round. Rounds run until a fixpoint (no label
      // changed), so arbitrarily-long chain components converge
      // correctly; MaxRounds (reach 2^12) is a loud-failure backstop,
      // never the exit path. The convergence probe is one extra tiny
      // action per round on the 4-partition checkpointed labels — and
      // lets typical LSH graphs (small cliques) exit after 2-3 rounds
      // instead of a fixed worst-case count. Every round is
      // localCheckpoint'ed: without the lineage cut, chained join+agg
      // plans make analysis itself exponential (on a real cluster:
      // reliable checkpoint to the distributed FS).
      var converged = false
      var round = 0
      while (!converged && round < MaxRounds) {
        round += 1
        val fromNeighbors = edges
          .join(labels, edges("b") === labels("id"))
          .select(edges("a").as("id"), col("comp"))
        val stepped = labels.unionByName(fromNeighbors)
          .groupBy("id").agg(min(col("comp")).as("comp"))
        // pointer jump: comp values are node ids, so the join is total
        val parents = stepped.select(col("id").as("pid"), col("comp").as("pcomp"))
        val next = stepped.join(parents, stepped("comp") === parents("pid"))
          .select(stepped("id"), col("pcomp").as("comp"))
          .localCheckpoint()
        val prev = labels.select(col("id").as("qid"), col("comp").as("qcomp"))
        converged = next.join(prev, next("id") === prev("qid"))
          .where(next("comp") =!= col("qcomp"))
          .limit(1).count() == 0
        labels = next
      }
      require(converged, s"label propagation did not converge in $MaxRounds rounds")
      labels.select(col("id").as("doc_id"), col("comp").as("component"))
  }

  private val componentsSqlCtes =
    s"""${MinhashPipeline.pairsSqlCte},
       |edges AS (SELECT da AS a, db AS b FROM pairs
       |          UNION ALL SELECT db, da FROM pairs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |walk(id, root) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.b, wk.root FROM walk wk JOIN edges e ON e.a = wk.id),
       |comp AS (SELECT id, min(root) AS component FROM walk GROUP BY id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    sql(
      "q_dedup_components",
      s"""WITH RECURSIVE
         |$componentsSqlCtes
         |SELECT id AS doc_id, component
         |FROM comp
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      componentLabels(s, dir).orderBy("doc_id")
    },

    // ---- dedup-cluster size distribution ----
    // The dedup AUDIT readout: how many near-dup groups exist at each
    // size, and how much of the pair-graph mass sits in the largest
    // ones? A sudden fat tail here is the canary for an LSH banding
    // misconfiguration (band collisions gluing unrelated docs) or a
    // template-heavy crawl — operators watch this distribution before
    // trusting a dedup run. Everything after componentLabels runs on
    // the tiny (#docs-in-graph) label frame: two nested aggregations.
    sql(
      "q_dedup_cluster_stats",
      s"""WITH RECURSIVE
         |$componentsSqlCtes,
         |sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY component)
         |SELECT CAST(sz AS BIGINT) AS size, CAST(count(*) AS BIGINT) AS n_groups,
         |       CAST(sz * count(*) AS BIGINT) AS docs
         |FROM sizes GROUP BY sz ORDER BY size""".stripMargin) { (s, dir) =>
      componentLabels(s, dir)
        .groupBy("component").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_groups"))
        .select(col("size"), col("n_groups"),
          (col("size") * col("n_groups")).as("docs"))
        .orderBy("size")
    },

    // ---- leakage-safe train/val/test split: bucket by DEDUP GROUP,
    //      not by doc ----
    // A per-doc hash split (q_split_assign) leaks: near-duplicate
    // pairs land on opposite sides of the train/test boundary and the
    // eval set scores memorization. Here the split key is the
    // connected-component label of the LSH near-dup graph (singleton
    // docs are their own component), so every near-dup group moves as
    // a unit — co-location is CONSTRUCTIVE (split is a function of
    // component), not a post-hoc filter. The DuckDB oracle recomputes
    // the components with a recursive CTE and must reproduce the same
    // doc→component→bucket mapping bit-for-bit. n_docs and n_groups
    // come from separate aggs joined back (6 rows) — two grains in
    // one agg would Expand-double the corpus scan. ----
    sql(
      "q_split_leakproof",
      s"""WITH RECURSIVE
         |$componentsSqlCtes,
         |assigned AS (
         |  SELECT d.doc_id, d.source,
         |         coalesce(c.component, d.doc_id) AS component
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         |b AS (
         |  SELECT source, component,
         |         ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8))::BIGINT
         |           % 100 AS bkt
         |  FROM assigned)
         |SELECT source,
         |       CASE WHEN bkt < 90 THEN 'train'
         |            WHEN bkt < 95 THEN 'val' ELSE 'test' END AS split,
         |       count(*) AS n_docs,
         |       CAST(count(DISTINCT component) AS BIGINT) AS n_groups
         |FROM b GROUP BY source, split
         |ORDER BY source, split""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      val comp = componentLabels(s, dir)
        .select(col("doc_id").as("cid"), col("component"))
      val assigned = Tables(s, dir, "documents").select("doc_id", "source")
        .join(comp, col("doc_id") === col("cid"), "left")
        .select(col("source"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .withColumn("split",
          when(h32(col("component").cast("string")) % 100 < 90, "train")
            .when(h32(col("component").cast("string")) % 100 < 95, "val")
            .otherwise("test"))
      val nDocs = assigned.groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"))
      val nGroups = assigned.select("source", "split", "component").distinct()
        .groupBy("source", "split").agg(count(lit(1)).as("n_groups"))
      nDocs.join(broadcast(nGroups), Seq("source", "split"))
        .orderBy("source", "split")
    },

    // ---- quality-aware canonical selection per dup cluster ----
    // The step between detecting dup clusters and writing the deduped
    // corpus: pick WHICH member survives. Min-id (q_dedup_exact's
    // keeper) is arbitrary; production pipelines keep the best-quality
    // member — here the longest text (n_chars desc, doc_id asc tie),
    // the standard "longest representative" heuristic. Everything
    // after componentLabels runs on the pair-graph-sized member frame:
    // one documents join for the scores, one per-component argmax
    // (struct-max), one per-component rollup. The dropped_chars column
    // is the dedup-savings audit a storage owner reads.
    sql(
      "q_dedup_keep_best",
      s"""WITH RECURSIVE
         |$componentsSqlCtes,
         |mem AS (SELECT c.component, c.id AS doc_id, d.n_chars
         |        FROM comp c JOIN documents d ON d.doc_id = c.id),
         |k AS (SELECT component, doc_id AS keeper, n_chars AS keeper_chars
         |      FROM (SELECT component, doc_id, n_chars,
         |              row_number() OVER (PARTITION BY component
         |                ORDER BY n_chars DESC, doc_id) AS rn
         |            FROM mem) WHERE rn = 1)
         |SELECT m.component, k.keeper,
         |       CAST(count(*) AS BIGINT) AS n_members,
         |       CAST(k.keeper_chars AS BIGINT) AS keeper_chars,
         |       CAST(sum(m.n_chars) - k.keeper_chars AS BIGINT) AS dropped_chars
         |FROM mem m JOIN k ON k.component = m.component
         |GROUP BY m.component, k.keeper, k.keeper_chars
         |ORDER BY m.component""".stripMargin) { (s, dir) =>
      val mem = componentLabels(s, dir)
        .join(Tables(s, dir, "documents").select("doc_id", "n_chars"), "doc_id")
      // argmax by (n_chars desc, doc_id asc) ≡ max(struct(n_chars, -doc_id))
      val k = mem.groupBy("component")
        .agg(max(struct(col("n_chars"), (-col("doc_id")).as("nd"))).as("m"))
        .select(col("component"), (-col("m.nd")).as("keeper"),
          col("m.n_chars").as("keeper_chars"))
      mem.groupBy("component")
        .agg(count(lit(1)).as("n_members"), sum("n_chars").as("tot_chars"))
        .join(broadcast(k), "component")
        .select(col("component"), col("keeper"), col("n_members"),
          col("keeper_chars").cast("long").as("keeper_chars"),
          (col("tot_chars") - col("keeper_chars")).cast("long")
            .as("dropped_chars"))
        .orderBy("component")
    },

    // ---- near-duplication rate per source ----
    // The crawl-hygiene audit: which sources ship template spam? A
    // doc is "near-dup" when its LSH component has size > 1; rate =
    // near-dup docs / docs per source. The component labels are the
    // shared min-label-propagation core (cached/plan-identical across
    // the dedup sweep); everything else is one left join + a per-source
    // aggregation.
    sql(
      "q_dup_rate_by_source",
      s"""WITH RECURSIVE
         |$componentsSqlCtes,
         |dup AS (SELECT id AS doc_id FROM comp)
         |SELECT d.source AS source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |         AS n_neardup,
         |       round(CAST(sum(CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END)
         |                  AS DOUBLE) / count(*), 6) AS dup_rate
         |FROM documents d LEFT JOIN dup ON dup.doc_id = d.doc_id
         |GROUP BY d.source ORDER BY source""".stripMargin) { (s, dir) =>
      // every node in the pair graph has ≥1 partner, so every
      // component has size ≥ 2 — a size>1 filter would be dead logic
      // and an extra shuffle (review find, r7)
      val dup = componentLabels(s, dir)
        .select(col("doc_id").as("dup_id"))
      Tables(s, dir, "documents").select("doc_id", "source")
        .join(broadcast(dup), col("doc_id") === col("dup_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("dup_id").isNull, 0L).otherwise(1L)).as("n_neardup"))
        .select(col("source"), col("n_docs"), col("n_neardup"),
          round(col("n_neardup").cast("double") / col("n_docs"), 6).as("dup_rate"))
        .orderBy("source")
    }
  )
}
