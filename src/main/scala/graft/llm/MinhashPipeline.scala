package graft.llm

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared MinHash+LSH near-dup pipeline: signatures → band
  * candidates → verified pairs. Both `q_dedup_minhash_lsh` (the pair
  * report) and `q_dedup_components` (connected components over the
  * pair graph) consume THIS builder, so a sweep computes the
  * signatures once: the plans are identical subtrees and the cached
  * signature table is reused by Spark's cache manager across the two
  * queries (at cluster scale: one persisted intermediate table).
  *
  * Signatures are a single native codegen'd expression
  * ([[graft.expressions.MinhashSignature]]): one md5 per shingle and
  * K fused multiply-mod-min updates per row — the interpreted
  * HOF chain it replaces was the dedup family's residual cost.
  *
  * Scale design (100 TB): the only shuffle is the band-signature
  * self-join whose key space is collision-bounded by the banding;
  * candidate verification touches candidate pairs only — never the
  * O(n²) cross product.
  */
object MinhashPipeline {

  val K = 12 // signature length
  val Bands = 4 // 4 bands × 3 rows
  val Rows = 3
  val JaccardMin = 0.5

  /** (doc_id, m): the K-slot signature per ≥3-word doc, cached — it
    * feeds four consumers (two band sides, two estimate sides). */
  def signatures(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      // r13 (guide §2.5): the single-row-group corpus scan is ONE
      // task, and the signature build (one md5 per shingle — ~2.5M
      // md5s at sf0.1) used to run serially inside it, leaving a
      // 1-partition cache for every downstream consumer. A ~600 KB
      // hash exchange of the raw doc rows buys full-width signature
      // computation and a shuffle-width cache. Deterministic hash
      // partitioning (not round-robin: keyless repartition pays a
      // serial sort-before-repartition, SPARK-23207); per-doc
      // signatures are row-local, so values are unchanged.
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
        col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("words"))
      .where(size(col("words")) >= 3)
      .select(col("doc_id"),
        graft.expressions.MinhashSignature(col("words"), 3, K).as("m"))
      .cache()

  /** (doc_id, b, sig): the LSH band signatures per doc — the index an
    * incremental (new-batch-vs-corpus) dedup probes. */
  def bandSignatures(s: SparkSession, dir: String): DataFrame =
    signatures(s, dir)
      .select(col("doc_id"), col("m"), explode(sequence(lit(0), lit(Bands - 1))).as("b"))
      .select(col("doc_id"), col("b"), bandSignature(col("m"), col("b"), Rows).as("sig"))

  /** Verified near-dup pairs (da < db, est_jaccard ≥ [[JaccardMin]]).
    * Candidates come from the band-signature equi-join only. */
  def pairs(s: SparkSession, dir: String): DataFrame = {
    val mh = signatures(s, dir)
    val bands = bandSignatures(s, dir)
    val a = bands.select(col("doc_id").as("da"), col("b").as("ba"), col("sig").as("siga"))
    val c = bands.select(col("doc_id").as("db"), col("b").as("bb"), col("sig").as("sigb"))
    val cand = a.join(c, a("siga") === c("sigb") && a("ba") === c("bb") && a("da") < c("db"))
      .select("da", "db").distinct()
    val x = mh.select(col("doc_id").as("xid"), col("m").as("ma"))
    val y = mh.select(col("doc_id").as("yid"), col("m").as("mb"))
    val matches = size(filter(sequence(lit(1), lit(K)),
      i => element_at(col("ma"), i) === element_at(col("mb"), i)))
    cand.join(x, col("da") === col("xid")).join(y, col("db") === col("yid"))
      .withColumn("est_jaccard", matches / lit(K.toDouble))
      .where(col("est_jaccard") >= JaccardMin)
      .select("da", "db", "est_jaccard")
  }

  /** DuckDB CTE chain ending in `bands(doc_id, b, sig)` — the SQL twin
    * of [[bandSignatures]]. */
  def bandsSqlCte: String = {
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
       |          FROM mh, range(0, $Bands) t(b))""".stripMargin
  }

  /** The identical pair derivation as a DuckDB CTE chain ending in
    * `pairs(da, db, est_jaccard)` — shared by the dedup oracle SQLs. */
  def pairsSqlCte: String =
    s"""$bandsSqlCte,
       |cand AS (SELECT DISTINCT a.doc_id AS da, c.doc_id AS db
       |         FROM bands a JOIN bands c ON a.sig = c.sig AND a.b = c.b
       |                                  AND a.doc_id < c.doc_id),
       |pairs AS (SELECT da, db,
       |                 len(list_filter(range(1, ${K + 1}), i -> x.m[i] = y.m[i])) / $K.0 AS est_jaccard
       |          FROM cand JOIN mh x ON x.doc_id = da JOIN mh y ON y.doc_id = db
       |          WHERE len(list_filter(range(1, ${K + 1}), i -> x.m[i] = y.m[i])) / $K.0 >= $JaccardMin)""".stripMargin
}
