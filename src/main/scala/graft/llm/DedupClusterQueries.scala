package graft.llm

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
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

  private val K = 12
  private val BANDS = 4
  private val MaxRounds = 12 // pointer jumping doubles reach per round: 2^12 ≫ any component

  /** Near-dup pairs (da < db), identical to q_dedup_minhash_lsh's. */
  private def lshPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("words"))
      .where(size(col("words")) >= 3)
    val hs = docs.select(col("doc_id"), shingleHashes(shingles(col("words"), 3)).as("hl"))
    val mh = hs.select(col("doc_id"), minhashesFromHashes(col("hl"), K).as("m")).cache()
    val bands = mh
      .select(col("doc_id"), col("m"), explode(sequence(lit(0), lit(BANDS - 1))).as("b"))
      .select(col("doc_id"), col("b"), bandSignature(col("m"), col("b"), 3).as("sig"))
    val a = bands.select(col("doc_id").as("da"), col("b").as("ba"), col("sig").as("siga"))
    val c = bands.select(col("doc_id").as("db"), col("b").as("bb"), col("sig").as("sigb"))
    val cand = a.join(c, a("siga") === c("sigb") && a("ba") === c("bb") && a("da") < c("db"))
      .select("da", "db").distinct()
    val x = mh.select(col("doc_id").as("xid"), col("m").as("ma"))
    val y = mh.select(col("doc_id").as("yid"), col("m").as("mb"))
    val matches = size(filter(sequence(lit(1), lit(K)),
      i => element_at(col("ma"), i) === element_at(col("mb"), i)))
    cand.join(x, col("da") === col("xid")).join(y, col("db") === col("yid"))
      .where(matches / lit(K.toDouble) >= 0.5)
      .select("da", "db")
  }

  /** The same pair derivation as SQL (shared with q_dedup_minhash_lsh). */
  private def pairsSql: String = {
    val perms = (0 until K).map(i =>
      s"list_min(list_transform(hl, h -> (${MinhashA(i)} * h + ${MinhashB(i)}) % $MinhashP))")
      .mkString("[", ",\n                ", "]")
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |sh AS (SELECT doc_id,
       |              list_distinct(list_transform(range(1, greatest(len(words) - 1, 1)),
       |                            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sgl
       |       FROM w WHERE len(words) >= 3),
       |hs AS (SELECT doc_id,
       |              list_transform(sgl, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % $MinhashP) AS hl
       |       FROM sh),
       |mh AS (SELECT doc_id, $perms AS m
       |       FROM hs),
       |bands AS (SELECT doc_id, b,
       |                 md5(m[3*b+1] || ',' || m[3*b+2] || ',' || m[3*b+3]) AS sig
       |          FROM mh, range(0, $BANDS) t(b)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, c.doc_id AS db
       |         FROM bands a JOIN bands c ON a.sig = c.sig AND a.b = c.b
       |                                  AND a.doc_id < c.doc_id),
       |pairs AS (SELECT da, db
       |          FROM cand JOIN mh x ON x.doc_id = da JOIN mh y ON y.doc_id = db
       |          WHERE len(list_filter(range(1, ${K + 1}), i -> x.m[i] = y.m[i])) / $K.0 >= 0.5)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    sql(
      "q_dedup_components",
      s"""WITH RECURSIVE
         |$pairsSql,
         |edges AS (SELECT da AS a, db AS b FROM pairs
         |          UNION ALL SELECT db, da FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |walk(id, root) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.b, wk.root FROM walk wk JOIN edges e ON e.a = wk.id)
         |SELECT id AS doc_id, min(root) AS component
         |FROM walk GROUP BY id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // The pair graph is orders of magnitude smaller than the corpus:
      // collapse it to a few partitions so the iteration pays per-task
      // overhead proportional to the graph, not the corpus scan.
      val pairs = lshPairs(s, dir).coalesce(4).cache()
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
        .orderBy("doc_id")
    }
  )
}
