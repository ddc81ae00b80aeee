package graft.llm

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY.md §2.2
  * north-star set): brute-force cosine top-k as the correctness
  * baseline, a sign-LSH bucketed ANN and a trained IVF (k-means
  * coarse quantizer) as the scale paths, plus normalization and
  * blocked near-duplicate detection.
  *
  * Scale design (100 TB): brute force is O(queries × corpus) — fine
  * for a bounded query set against a broadcast corpus partition, wrong
  * as an all-pairs op. The ANN variant buckets both sides by a
  * deterministic 8-bit sign signature so the join only compares
  * within-bucket (256-way partition of the corpus); recall is traded
  * via bucket bits. Near-dup uses label blocking for the same reason.
  * All math is double-precision sequential folds (zip_with/aggregate,
  * codegen'd) matching the oracle's list_dot_product semantics.
  */
object SimilarityQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Promote an ANN core from rows-only to full hash-match (r7 VERDICT
    * ask #5): the registered output is an oracle-EXACT audit frame —
    * one row per audit query with its brute-force best cosine (DuckDB
    * recomputes both columns bit-identically) — plus a Spark-computed
    * `recall_ok` bound flag the oracle pins TRUE, so a silent recall
    * regression flips the flag and fails the driver's hash gate (the
    * same bound-flag design that promoted q_approx_distinct).
    *
    * The ground-truth batch is CAPPED (vec_id % 25 == 0 && < 1000 —
    * the full query set at sf ≤ 0.01, 40 queries at sf0.1): recall
    * estimation needs a bounded sample, and an uncapped brute-force
    * audit would scale with queries × corpus — the exact quadratic
    * shape the ScaleCheck 100× decade exists to reject. The capped
    * audit is queries-constant, so it stays linear in the corpus.
    * The floor compare is integer math (hits·den ≥ total·num), not
    * `recall >= 0.8` — 60·0.8 in binary is 48.0000…003, which would
    * fail an exactly-at-floor run.
    */
  private def annRecallAudit(s: SparkSession, dir: String,
      ann: org.apache.spark.sql.DataFrame, floorNum: Int, floorDen: Int) = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.where(col("vec_id") % 25 === 0 && col("vec_id") < 1000)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("v").as("cv"))
    val pairs = q.join(c, col("cid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    // ground-truth top-3: same rank rule as q_knn_bruteforce /
    // AccuracySpec (round-6 sim desc, cid tie-break)
    val w = Window.partitionBy(col("qid")).orderBy(desc("rsim"), col("cid"))
    val gt3 = pairs.withColumn("rsim", round(col("sim"), 6))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("qid"), col("cid"))
    val flag = gt3
      .join(ann.select(col("qid"), col("cid")).withColumn("hit", lit(1)),
        Seq("qid", "cid"), "left")
      .agg((sum(coalesce(col("hit"), lit(0))) * floorDen >=
        count(lit(1)) * floorNum).as("recall_ok"))
    // best_sim = round(max raw cosine): max is fold-order-free, and
    // the per-pair cosine fold already hash-matches DuckDB's
    // list_dot_product (q_knn_bruteforce)
    pairs.groupBy("qid").agg(round(max(col("sim")), 6).as("best_sim"))
      .crossJoin(broadcast(flag))
      .select(col("qid"), col("best_sim"), col("recall_ok"))
      .orderBy("qid")
  }

  /** Oracle twin of [[annRecallAudit]]'s exact columns; the flag is
    * pinned TRUE — the engine side computes it from ground truth.
    * (lazy: `cosineSql` is declared below — a strict val here would
    * interpolate null during object init.) */
  private lazy val annAuditSql =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT q.vec_id AS qid, max($cosineSql) AS ms
       |      FROM e q JOIN e c ON c.vec_id <> q.vec_id
       |      WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000
       |      GROUP BY 1)
       |SELECT qid, round(ms, 6) AS best_sim, true AS recall_ok
       |FROM p ORDER BY qid""".stripMargin

  private val cosineSql =
    "list_dot_product(q.v, c.v) / sqrt(list_dot_product(q.v, q.v) * list_dot_product(c.v, c.v))"

  /** IVF ANN core: top-3 neighbors per query (qid, cid, sim).
    * Registered through the recall-audit wrapper below;
    * AccuracySpec pins its recall@3 against brute force directly. */
  def ivfTop3(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("vn", l2Normalize(col("v")))
      .cache() // feeds the count, the fit sample + both join sides
    // index geometry from the corpus size (cells ~ √(N/8), probes
    // k/4 — PqIndex scaladoc; the count is one job on the cache,
    // the same N any index build must know)
    val cells = PqIndex.cellsFor(e.count())
    val NProbe = PqIndex.nprobeFor(cells)
    // driver-side Lloyd over a bounded hash-ordered sample (see
    // PqIndex scaladoc for why this beats an in-query MLlib fit);
    // assignment is a pure codegen'd argmin projection
    val coarse = PqIndex.fitCoarse(e, cells)
    val assigned = e.withColumn("cell", PqIndex.nearestCentroid(col("vn"), coarse))
    // squared norms computed ONCE PER ROW on each side — the naive
    // per-pair cosine recomputes both self-dots per candidate pair,
    // tripling the hot join's arithmetic (same values either way:
    // dot(a,a) is dot(a,a) wherever it's evaluated). The probe rank
    // itself runs THIN — (qid, qvn) only — and the 130-double query
    // payload joins back on qid after the k-way cross join + window
    // discard nprobe/k of the rows, instead of riding through them.
    // FIXED-SIZE query batch over a GROWING index — the production
    // ANN shape. Without the id cap the query set scales with the
    // corpus (vec_id % 25 ⇒ N/25 queries) and, since recall on this
    // near-random corpus forces probing a constant corpus fraction
    // (nprobe = cells/4 ⇒ ~N/4 candidates/query), the benchmark's
    // TOTAL work went quadratic — the 100× ScaleCheck caught it at
    // 58× for 10× data. ScaleCheck replica key-shifts are multiples
    // of 25, so base ids keep their residue and the cap selects the
    // same ORIGINAL vectors at every replication level; sf ≤ 0.1
    // corpora (ids < 50k) are unaffected, as is AccuracySpec.
    val qset = assigned.where(col("vec_id") % 25 === 0 && col("vec_id") < 50000)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("vn").as("qvn"),
        dot(col("v"), col("v")).as("qn2"))
    val probes = PqIndex.probeCells(
        qset.select(col("qid"), col("qvn")), "qid", "qvn", coarse, NProbe)
      .select(col("qid").as("pqid"), col("ccell"))
      .join(broadcast(qset.select(col("qid"), col("qv"), col("qn2"))),
        col("pqid") === col("qid"))
      .select(col("qid"), col("qv"), col("qn2"), col("ccell"))
    val c = assigned.select(col("vec_id").as("cid"), col("v").as("cv"),
      dot(col("v"), col("v")).as("cn2"), col("cell").as("cc"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("sim"), col("cid"))
    probes.join(c, col("ccell") === col("cc") && col("cid") =!= col("qid"))
      .withColumn("sim",
        round(dot(col("qv"), col("cv")) / sqrt(col("qn2") * col("cn2")), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("qid", "cid", "sim")
      .orderBy(col("qid"), desc("sim"), col("cid"))
  }

  /** IVF-PQ ANN core: top-3 per query after ADC shortlist + exact
    * rerank (qid, cid, sim, adc_dist). Registered through the
    * recall-audit wrapper; AccuracySpec pins recall@3 >= 0.6. */
  def pqTop3(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import PqIndex.{M, SubDim}
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("vn", l2Normalize(col("v")))
    val subCols = (0 until M).map(m =>
      slice(col("vn"), m * SubDim + 1, SubDim).as(s"sub$m"))
    val sub = e.select(Seq(col("vec_id"), col("v"), col("vn")) ++ subCols: _*)
      .cache() // feeds the count, fit samples, encode pass, query side
    // same corpus-sized geometry as q_knn_ivf (cells ~ √(N/8));
    // shortlist scales with the corpus (PqIndex.shortlistFor scaladoc)
    val n = sub.count()
    val cells = PqIndex.cellsFor(n)
    val NProbe = PqIndex.nprobeFor(cells)
    val Shortlist = PqIndex.shortlistFor(n)
    // coarse quantizer: same spherical cells as q_knn_ivf; PQ
    // codebooks per subspace — all driver-side Lloyd over ONE
    // bounded hash-ordered sample job (PqIndex scaladoc), so the
    // query pays no per-fit Spark-job overhead
    val (coarse, books) = PqIndex.fitAll(sub, cells)
    // encode: each corpus vector → cell + M small codes, all pure
    // codegen'd argmin projections. MATERIALIZED: the encode feeds
    // the candidate join, and CollapseProject would otherwise inline
    // the 128-dot argmin chains past the join and re-evaluate them
    // once per candidate PAIR instead of once per corpus row
    // (measured 5× the whole query's cost at the 10× corpus; at
    // cluster scale this is the persisted PQ-codes table an IVF-PQ
    // index stores anyway)
    val enc = books.zipWithIndex.foldLeft(
        sub.withColumn("cell", PqIndex.nearestCentroid(col("vn"), coarse))
          .select(Seq(col("vec_id"), col("cell")) ++ (0 until M).map(m => col(s"sub$m")): _*)) {
      case (df, (book, m)) =>
        df.withColumn(s"code$m", PqIndex.nearestCentroid(col(s"sub$m"), book))
    }.cache()
    // query set probes its top-nprobe cells via the k-row broadcast.
    // Fixed-size batch via the id cap — same rationale and same
    // replication-invariance argument as q_knn_ivf above.
    val queries = sub.where(col("vec_id") % 25 === 0 && col("vec_id") < 50000)
      .select(Seq(col("vec_id").as("qid"), col("v").as("qv"), col("vn").as("qvn")) ++
        (0 until M).map(m => col(s"sub$m").as(s"qsub$m")): _*)
    val probes = PqIndex.probeCells(
        queries.select(col("qid"), col("qvn")), "qid", "qvn", coarse, NProbe)
      .select(col("qid").as("pqid"), col("ccell"))
    // per-(query, subspace, code) ADC distance table: melt query
    // subvectors, equi-join the M×Codes broadcast codebook table
    val pcents = books.zipWithIndex.flatMap { case (book, m) =>
      PqIndex.centroidRows(book).map { case (k, c) => (m, k, c) }
    }.toDF("cm", "ccode", "cbvec")
    val melted = (0 until M).map(m =>
        queries.select(col("qid"), lit(m).as("qm"), col(s"qsub$m").as("qsub")))
      .reduce(_ unionByName _)
    val sq = graft.functions.VectorFunctions.sqL2(col("qsub"), col("cbvec"))
    val dtab = melted.join(broadcast(pcents), col("qm") === col("cm"))
      .select(col("qid").as("dqid"), col("qm").as("dm"), col("ccode").as("dcode"),
        sq.as("d"))
    // candidates = probed-cell equi-join; melt their codes and look
    // up. Everything bounded-by-the-query-set broadcasts (probes,
    // the ADC table, the shortlist) — the corpus-sized encode
    // streams through map-side joins and is never shuffled.
    val cand = enc
      .select(col("vec_id").as("cid"), col("cell").as("ccid"),
        array((0 until M).map(m => col(s"code$m")): _*).as("codes"))
      .join(broadcast(probes), col("ccid") === col("ccell"))
      .where(col("cid") =!= col("pqid"))
      .select(col("pqid").as("qid"), col("cid"), col("codes"))
    val scored = cand
      .select(col("qid"), col("cid"), posexplode(col("codes")))
      .join(broadcast(dtab), col("qid") === col("dqid") && col("pos") === col("dm")
        && col("col") === col("dcode"))
      .groupBy("qid", "cid").agg(sum(col("d")).as("adc"))
    // wide ADC shortlist, exact-cosine rerank to top-3
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc"), col("cid"))
    val shortlist = scored.withColumn("arn", row_number().over(wAdc))
      .where(col("arn") <= Shortlist)
      .join(broadcast(queries.select(col("qid").as("q2"), col("qv"))),
        col("qid") === col("q2"))
    val wSim = Window.partitionBy(col("qid")).orderBy(desc("sim"), col("cid"))
    sub.select(col("vec_id").as("c2"), col("v").as("cv")) // cached — no re-scan
      .join(broadcast(shortlist), col("c2") === col("cid"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(wSim))
      .where(col("rn") <= 3)
      .select(col("qid"), col("cid"), col("sim"), round(col("adc"), 6).as("adc_dist"))
      .orderBy(col("qid"), desc("sim"), col("cid"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- embedding normalization (L2 norms) ----
    sql(
      "q_embed_norm",
      """SELECT vec_id, label,
        |       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2,
        |       CAST(len(embedding) AS INT) AS dim
        |FROM embeddings
        |WHERE vec_id % 10 = 0
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .where(col("vec_id") % 10 === 0)
        .select(
          col("vec_id"), col("label"),
          round(l2Norm(asDouble(col("embedding"))), 6).as("l2"),
          size(col("embedding")).as("dim"))
        .orderBy("vec_id")
    },

    // ---- brute-force cosine top-k (correctness baseline) ----
    sql(
      "q_knn_bruteforce",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |             round($cosineSql, 6) AS sim
         |      FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
         |SELECT qid, cid, sim FROM
         |  (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
         |   FROM p)
         |WHERE rn <= 5
         |ORDER BY qid, sim DESC, cid""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.where(col("vec_id") < 8).select(col("vec_id").as("qid"), col("v").as("qv"))
      val c = e.select(col("vec_id").as("cid"), col("v").as("cv"))
      val w = Window.partitionBy(col("qid")).orderBy(desc("sim"), col("cid"))
      q.join(c, col("cid") =!= col("qid"))
        .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select("qid", "cid", "sim")
        .orderBy(col("qid"), desc("sim"), col("cid"))
    },

    // ---- bucketed ANN: deterministic sign-LSH coarse quantizer ----
    sql(
      "q_knn_signlsh",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |                  list_sum(list_transform(range(0, 8),
         |                    i -> CASE WHEN embedding[i+1] > 0
         |                              THEN (1::BIGINT << i) ELSE 0 END)) AS bkt
         |           FROM embeddings),
         |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |             round($cosineSql, 6) AS sim
         |      FROM e q JOIN e c ON q.bkt = c.bkt AND c.vec_id <> q.vec_id
         |      WHERE q.vec_id % 25 = 0)
         |SELECT qid, cid, sim FROM
         |  (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
         |   FROM p)
         |WHERE rn <= 3
         |ORDER BY qid, sim DESC, cid""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bkt", signBucket(col("v")))
      val q = e.where(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("bkt").as("qb"))
      val c = e.select(col("vec_id").as("cid"), col("v").as("cv"), col("bkt").as("cb"))
      val w = Window.partitionBy(col("qid")).orderBy(desc("sim"), col("cid"))
      q.join(c, col("qb") === col("cb") && col("cid") =!= col("qid"))
        .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("qid", "cid", "sim")
        .orderBy(col("qid"), desc("sim"), col("cid"))
    },

    // ---- IVF ANN: trained k-means coarse quantizer (the second ANN
    //      rung after sign-LSH). Vectors are L2-NORMALIZED before
    //      clustering and assignment — the ranking metric is cosine,
    //      and on the unit sphere squared L2 is 2 - 2·cos, so cell
    //      membership agrees with the metric the query ranks by
    //      (unnormalized IVF cells cost ~2× the recall: measured in
    //      AccuracySpec's ground-truth harness). Every vector joins
    //      its nearest-centroid inverted list; a query multi-probes
    //      its top-nprobe cells via the k-row broadcast centroid
    //      table — candidates are an equi-join on cell id, never a
    //      corpus scan. Index geometry scales with the corpus:
    //      cells = √(N/8) (per-cell size stays ~√(8N) — the bounded-
    //      task-size property the inverted index exists for), probes
    //      = cells/4. The floor (k=8, nprobe=4 at sf0.01's 500
    //      near-random vectors — the hardest case) is recall-
    //      calibrated: recall@3 ≈ 0.9, asserted ≥ 0.8 in AccuracySpec;
    //      nprobe is a recall tunable, and structured real corpora
    //      reach the same recall at far smaller nprobe/k than random
    //      ones. Training is a driver-side
    //      seeded Lloyd on a bounded sample; assignment is a pure
    //      codegen'd argmin projection (PqIndex scaladoc). k-means
    //      internals stay engine-specific, so the REGISTERED output
    //      is the annRecallAudit frame (oracle-exact best_sim rows +
    //      pinned recall_ok bound flag) — full hash-match; the core's
    //      raw top-3 is still pinned by AccuracySpec. ----
    sql("q_knn_ivf", annAuditSql) { (s, dir) =>
      annRecallAudit(s, dir, ivfTop3(s, dir), 4, 5) // floor 0.8
    },

    // ---- IVF-PQ ANN: the SAME normalized k-means coarse index as
    //      q_knn_ivf (k=CoarseK cells, nprobe-cell multi-probe) with
    //      product-quantized asymmetric-distance scoring + exact
    //      rerank. The corpus is stored as M=8 codes of 4 bits' worth
    //      each (16-way k-means per 8-dim subspace of the UNIT
    //      vector) — at 100 TB that is the index that fits: 8 nibbles
    //      per vector instead of 256 bytes. Scoring a candidate is M
    //      table lookups (the per-query distance table is M×Codes =
    //      128 rows), realized relationally as melt → equi-join →
    //      sum; the top-[[PqIndex.Shortlist]] by ADC are reranked
    //      with the exact cosine. Every join is an equi-join (cell,
    //      subspace id, code, vec id) — no scan is ever O(n²).
    //      Parameters are recall-calibrated in AccuracySpec (≥ 0.6
    //      against brute-force ground truth; ADC quantization noise
    //      on this near-random corpus is what the wide shortlist
    //      absorbs). k-means codebooks are engine-private, so the
    //      REGISTERED output is the annRecallAudit frame (full
    //      hash-match); the core's raw top-3 stays AccuracySpec-pinned.
    //      (Round 3's version used an 8-bit sign-LSH coarse index:
    //      256 buckets over a 500-vector corpus left ~2 candidates
    //      per query — recall 0.02. The shared IVF cells fix the
    //      candidate starvation; the recall spec now pins it.) ----
    sql("q_knn_pq", annAuditSql) { (s, dir) =>
      annRecallAudit(s, dir, pqTop3(s, dir), 3, 5) // floor 0.6
    },

    // ---- int8 symmetric quantization: the storage path for vectors
    //      at 100 TB (4× smaller than float32, 8× than float64).
    //      Per-vector scale = max|x|/127; rounding is floor(x/s + .5)
    //      so both engines use the identical deterministic rule (no
    //      HALF_UP vs HALF_EVEN ambiguity). The fidelity columns
    //      (RMSE, cosine of original vs dequantized) are what a
    //      curation pipeline monitors before swapping the index. ----
    sql(
      "q_embed_quantized",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |           WHERE vec_id % 10 = 0),
        |s AS (SELECT vec_id, v,
        |             greatest(list_max(list_transform(v, x -> abs(x))) / 127, 1e-300) AS scale
        |      FROM e),
        |q AS (SELECT vec_id, v, scale,
        |             list_transform(v, x -> floor(x / scale + 0.5) * scale) AS dq
        |      FROM s),
        |d AS (SELECT vec_id, v, scale, dq,
        |             list_transform(range(1, len(v) + 1), i -> v[i] - dq[i]) AS dif
        |      FROM q)
        |SELECT vec_id, CAST(len(v) AS INT) AS dim,
        |       round(scale, 6) AS scale,
        |       round(sqrt(list_dot_product(dif, dif) / len(v)), 6) AS rmse,
        |       round(list_dot_product(v, dq) /
        |             sqrt(list_dot_product(v, v) * list_dot_product(dq, dq)), 6) AS cos_fidelity
        |FROM d ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .where(col("vec_id") % 10 === 0)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // floor at 1e-300 (mirrored in the oracle SQL): an all-zero
      // embedding would otherwise quantize as x/0 → NaN fidelity stats
      val scale = greatest(aggregate(transform(col("v"), x => abs(x)), lit(0.0),
        (m, x) => greatest(m, x)) / 127, lit(1e-300)).as("scale")
      val sdf = e.select(col("vec_id"), col("v"), scale)
      val qdf = sdf.select(col("vec_id"), col("v"), col("scale"),
        transform(col("v"), x => floor(x / col("scale") + 0.5) * col("scale")).as("dq"))
        .withColumn("dif", zip_with(col("v"), col("dq"), (x, y) => x - y))
      qdf.select(
          col("vec_id"),
          size(col("v")).as("dim"),
          round(col("scale"), 6).as("scale"),
          round(sqrt(dot(col("dif"), col("dif")) / size(col("v"))), 6).as("rmse"),
          round(cosine(col("v"), col("dq")), 6).as("cos_fidelity"))
        .orderBy("vec_id")
    },

    // ---- embedding near-dup: label-blocked high-cosine pairs ----
    sql(
      "q_embed_neardup",
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT q.vec_id AS da, c.vec_id AS db,
         |       round($cosineSql, 6) AS sim
         |FROM e q JOIN e c ON q.label = c.label AND q.vec_id < c.vec_id
         |WHERE q.vec_id % 20 = 0 AND $cosineSql >= 0.35
         |ORDER BY da, db""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      val q = e.where(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("da"), col("label").as("la"), col("v").as("qv"))
      val c = e.select(col("vec_id").as("db"), col("label").as("lb"), col("v").as("cv"))
      q.join(c, col("la") === col("lb") && col("da") < col("db"))
        .withColumn("simraw", cosine(col("qv"), col("cv")))
        .where(col("simraw") >= 0.35)
        .select(col("da"), col("db"), round(col("simraw"), 6).as("sim"))
        .orderBy("da", "db")
    },

    // ---- semantic balance: density-flattening sample rates over
    //      embedding-space buckets (the SemDeDup-style counterpart to
    //      q_domain_mix's metadata domains — dense semantic regions
    //      get downsampled to the mean bucket density, tail regions
    //      kept whole, plus the same temperature mixture weights).
    //      Bucketing is the portable 8-bit sign signature (cross-
    //      engine checkable, unlike k-means cells); one hash
    //      aggregation collapses the corpus to ≤256 bucket rows and
    //      the windows run over those. At cluster scale swap the sign
    //      signature for the trained IVF cells — same query shape. ----
    sql(
      "q_semantic_balance",
      """WITH e AS (SELECT vec_id,
        |                  CAST(list_sum(list_transform(range(0, 8),
        |                    i -> CASE WHEN embedding[i+1] > 0
        |                              THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS bkt
        |           FROM embeddings),
        |d AS (SELECT bkt, CAST(count(*) AS BIGINT) AS n_vecs FROM e GROUP BY bkt),
        |s AS (SELECT bkt, n_vecs,
        |             n_vecs / CAST(sum(n_vecs) OVER () AS DOUBLE) AS raw_share,
        |             pow(n_vecs / CAST(sum(n_vecs) OVER () AS DOUBLE), 0.5) AS scaled,
        |             sum(n_vecs) OVER () / CAST(count(*) OVER () AS DOUBLE) AS mean_n
        |      FROM d)
        |SELECT bkt, n_vecs,
        |       round(raw_share, 6) AS raw_share,
        |       round(scaled / sum(scaled) OVER (), 6) AS mix_weight,
        |       round(least(1.0, mean_n / n_vecs), 4) AS keep_rate
        |FROM s ORDER BY bkt""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "embeddings")
        .select(signBucket(asDouble(col("embedding"))).as("bkt"))
        .groupBy("bkt")
        .agg(count(lit(1)).as("n_vecs"))
      val meanN = Balance.totalOver(col("n_vecs")) / Balance.countOver.cast("double")
      Balance.temperatureMix(d, "n_vecs")
        .withColumn("mean_n", meanN)
        .select(col("bkt"), col("n_vecs"),
          round(col("raw_share"), 6).as("raw_share"),
          round(col("mix_weight"), 6).as("mix_weight"),
          round(least(lit(1.0), col("mean_n") / col("n_vecs")), 4).as("keep_rate"))
        .orderBy("bkt")
    },

    // ---- per-label embedding centroids + drift vs global ----
    // The embedding-space health readout: each label's centroid norm
    // and its cosine to the global centroid — a label whose centroid
    // swings away from the corpus mean signals a clustering/labeling
    // drift. ONE corpus pass: posexplode to (label, dim) cells with
    // DECIMAL element sums (exact), then the global centroid derives
    // from the SAME per-label sums by exact decimal addition — no
    // second corpus aggregation, and bit-equality with a direct global
    // mean is algebraic, not numeric luck. Everything after runs on
    // #labels×64 rows.
    sql(
      "q_embed_centroids",
      """WITH ex AS (SELECT label, embedding,
        |              unnest(generate_series(1, len(embedding))) AS i
        |            FROM embeddings),
        |x AS (SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v FROM ex),
        |cl0 AS (SELECT label, i, sum(CAST(v AS DECIMAL(38,18))) AS sdec,
        |               CAST(count(*) AS BIGINT) AS n
        |        FROM x GROUP BY label, i),
        |cl AS (SELECT label, i, CAST(sdec AS DOUBLE) / n AS c, n FROM cl0),
        |cg AS (SELECT i, CAST(sum(sdec) AS DOUBLE) / sum(n) AS g
        |       FROM cl0 GROUP BY i),
        |m AS (SELECT cl.label AS label, max(cl.n) AS n_vecs,
        |        CAST(sum(CAST(cl.c * cg.g AS DECIMAL(38,18))) AS DOUBLE) AS dot,
        |        CAST(sum(CAST(cl.c * cl.c AS DECIMAL(38,18))) AS DOUBLE) AS nc,
        |        CAST(sum(CAST(cg.g * cg.g AS DECIMAL(38,18))) AS DOUBLE) AS ng
        |      FROM cl JOIN cg ON cg.i = cl.i GROUP BY cl.label)
        |SELECT label, n_vecs, round(sqrt(nc), 6) AS centroid_norm,
        |       round(dot / (sqrt(nc) * sqrt(ng)), 6) AS cos_to_global
        |FROM m ORDER BY label""".stripMargin) { (s, dir) =>
      val x = t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("p", "v0")))
        .select(col("label"), (col("p") + 1).as("i"),
          col("v0").cast("double").as("v"))
      // per-(label, dim) exact sums — the one corpus aggregation;
      // the global centroid re-derives from these by decimal addition
      val cl0 = x.groupBy("label", "i")
        .agg(sum(col("v").cast("decimal(38,18)")).as("sdec"),
          count(lit(1)).as("n"))
        .localCheckpoint()
      val cl = cl0.select(col("label"), col("i"),
        (col("sdec").cast("double") / col("n")).as("c"), col("n"))
      val cg = cl0.groupBy("i")
        .agg((sum("sdec").cast("double") / sum("n")).as("g"))
      def dsum(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,18)")).cast("double")
      val m = cl.join(cg, Seq("i"))
        .groupBy("label")
        .agg(max("n").as("n_vecs"), dsum(col("c") * col("g")).as("dot"),
          dsum(col("c") * col("c")).as("nc"), dsum(col("g") * col("g")).as("ng"))
      m.select(col("label"), col("n_vecs"),
          round(sqrt(col("nc")), 6).as("centroid_norm"),
          round(col("dot") / (sqrt(col("nc")) * sqrt(col("ng"))), 6)
            .as("cos_to_global"))
        .orderBy("label")
    },

    // ---- embedding effective dimension (collapse detection) ----
    // Participation ratio of the covariance spectrum WITHOUT an
    // eigensolve: (Σλ)²/Σλ² = trace(C)²/‖C‖²_F, because for symmetric
    // C the squared Frobenius norm IS the sum of squared eigenvalues.
    // An embedding model collapsing to a few directions shows
    // eff_dim ≪ dim long before downstream retrieval degrades — the
    // embedding-space health gauge next to q_embed_centroids' drift.
    // Shape: the d×d Gram accumulates from a join-free DOUBLE
    // posexplode (per-row fan-out d², collapsed map-side to ≤d²
    // cells); means ride the same exploded frame; everything after is
    // arithmetic on the 4096-cell grid.
    sql(
      "q_embed_effdim",
      """WITH ex AS (SELECT vec_id, embedding,
        |              unnest(generate_series(1, len(embedding))) AS i
        |            FROM embeddings),
        |x AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v FROM ex),
        |n0 AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM x),
        |mu AS (SELECT i, sum(v) / (SELECT n FROM n0) AS m
        |       FROM x GROUP BY i),
        |p AS (SELECT a.i AS i, b.i AS j,
        |        sum(a.v * b.v) / (SELECT n FROM n0) AS exy
        |      FROM x a JOIN x b ON b.vec_id = a.vec_id
        |      GROUP BY a.i, b.i),
        |c AS (SELECT p.i, p.j, p.exy - ma.m * mb.m AS cij
        |      FROM p JOIN mu ma ON ma.i = p.i JOIN mu mb ON mb.i = p.j),
        |s AS (SELECT sum(CASE WHEN i = j THEN cij ELSE 0.0 END) AS tr,
        |             sum(cij * cij) AS frob2
        |      FROM c)
        |SELECT (SELECT CAST(max(len(embedding)) AS BIGINT) FROM embeddings) AS dim,
        |       (SELECT n FROM n0) AS n_vecs,
        |       round(tr, 6) AS cov_trace, round(frob2, 6) AS cov_frob2,
        |       round(tr * tr / frob2, 4) AS eff_dim
        |FROM s""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      // TWO corpus reads total: (1) the Gram pass — each vec row
      // fans to d rows carrying the array, a second posexplode fans
      // to d² (vi·vj) cells, no self-join; per-(i,j) partial agg
      // collapses map-side, and the per-dim sums ride the SAME
      // aggregation (Σvi is identical in every (i, j) group, so the
      // j = 0 slice of the grid IS the mean vector — no separate
      // mean scan); (2) one count/dim agg. n counts DISTINCT
      // non-empty vec rows, matching the oracle's exploded-frame
      // count exactly (a NULL or empty embedding contributes nothing
      // to the sums on either engine and must not inflate the
      // divisor — review find, r7).
      val x1 = emb.select(col("vec_id"), col("embedding"),
        posexplode(col("embedding")).as(Seq("pi", "vi")))
      val cells = x1.select(col("vec_id"), col("pi"),
          col("vi").cast("double").as("vi"),
          posexplode(col("embedding")).as(Seq("pj", "vj")))
        .select(col("pi"), col("pj"), col("vi"),
          col("vj").cast("double").as("vj"))
      val stats = emb.agg(
        countDistinct(when(col("embedding").isNotNull
          && size(col("embedding")) > 0, col("vec_id"))).as("n"),
        max(size(col("embedding"))).cast("long").as("dim"))
        .localCheckpoint()
      val n0 = stats.select("n")
      // Gram sums accumulate in DOUBLE deliberately, unlike the
      // money/ratio queries: float products are continuous with no
      // systematic rounding-boundary alignment, the summation error
      // (~1e-14 relative) sits eight orders under the round(6)
      // output grain, and the DECIMAL path costs a per-cell
      // conversion on the d²-fanned corpus (12.9 s vs ~2 s measured)
      val p = cells.groupBy("pi", "pj")
        .agg(sum(col("vi") * col("vj")).as("sxy"),
          sum(col("vi")).as("svi_g"))
        .localCheckpoint()
      val mu = p.where(col("pj") === 0)
        .select(col("pi"), col("svi_g").as("sv"))
      // 4096-cell grid + d-row means, all broadcast-sized from here
      val c = p
        .join(broadcast(mu.select(col("pi").as("mi"), col("sv").as("svi"))),
          col("pi") === col("mi"))
        .join(broadcast(mu.select(col("pi").as("mj"), col("sv").as("svj"))),
          col("pj") === col("mj"))
        .crossJoin(broadcast(n0))
        .select(col("pi"), col("pj"),
          (col("sxy") / col("n")
            - (col("svi") / col("n")) * (col("svj") / col("n"))).as("cij"))
      val sAgg = c.agg(
        sum(when(col("pi") === col("pj"), col("cij")).otherwise(lit(0.0))).as("tr"),
        sum(col("cij") * col("cij")).as("frob2"))
      sAgg.crossJoin(broadcast(stats))
        .select(col("dim"), col("n").as("n_vecs"),
          round(col("tr"), 6).as("cov_trace"),
          round(col("frob2"), 6).as("cov_frob2"),
          round(col("tr") * col("tr") / col("frob2"), 4).as("eff_dim"))
    },

    // ---- dominant direction via power iteration ----
    // The eigensolve q_embed_effdim deliberately avoids, as its own
    // operator: the top eigenvalue/eigenvector of the embedding
    // second-moment matrix G = Σvvᵀ/n — the "is one direction eating
    // the space?" collapse diagnostic (λ₁ vs trace), and the direction
    // to project out for whitening. The corpus is read ONCE to build
    // the d×d Gram (the effdim double-posexplode, no self-join); the
    // five unrolled power-iteration rounds then run entirely on the
    // d²-cell frame — a 1e9-vector corpus changes only the Gram pass.
    // Matvec and norm sums accumulate in DECIMAL(38,18) (the frames
    // are tiny, so order-independence costs nothing here, unlike the
    // Gram pass — see the effdim note) and the iteration is started
    // from the deterministic 1/√d vector, so both engines walk the
    // identical float sequence. Output: λ₁ (Rayleigh quotient) + the
    // top-8 squared loadings (sign-free, so no eigenvector sign
    // ambiguity exists in the result).
    sql(
      "q_embed_top_eigen",
      s"""WITH ex AS (SELECT vec_id, embedding,
        |              unnest(generate_series(1, len(embedding))) AS i
        |            FROM embeddings),
        |x AS (SELECT vec_id, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS v FROM ex),
        |n0 AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM x),
        |g AS (SELECT a.i AS i, b.i AS j,
        |        sum(a.v * b.v) / (SELECT n FROM n0) AS gij
        |      FROM x a JOIN x b ON b.vec_id = a.vec_id GROUP BY a.i, b.i),
        |dims AS (SELECT DISTINCT i FROM x),
        |d0 AS (SELECT CAST(count(*) AS BIGINT) AS d FROM dims),
        |w0 AS (SELECT i, CAST(1 AS DOUBLE) / sqrt((SELECT d FROM d0)) AS w
        |       FROM dims),
        |${(1 to 5).map(k =>
          s"""mv$k AS (SELECT g.i,
             |    CAST(sum(CAST(g.gij * w.w AS DECIMAL(38,18))) AS DOUBLE) AS m
             |  FROM g JOIN w${k - 1} w ON w.i = g.j GROUP BY g.i),
             |nr$k AS (SELECT sqrt(CAST(sum(CAST(m * m AS DECIMAL(38,18)))
             |                          AS DOUBLE)) AS z FROM mv$k),
             |w$k AS (SELECT i, m / (SELECT z FROM nr$k) AS w FROM mv$k)"""
            .stripMargin).mkString(",\n")},
        |mv6 AS (SELECT g.i,
        |    CAST(sum(CAST(g.gij * w.w AS DECIMAL(38,18))) AS DOUBLE) AS m
        |  FROM g JOIN w5 w ON w.i = g.j GROUP BY g.i),
        |ray AS (SELECT CAST(sum(CAST(w.w * mv.m AS DECIMAL(38,18))) AS DOUBLE)
        |          AS lam
        |        FROM w5 w JOIN mv6 mv ON mv.i = w.i)
        |SELECT w.i AS dim, round(w.w * w.w, 6) AS loading2,
        |       round((SELECT lam FROM ray), 4) AS top_eigen
        |FROM w5 w
        |ORDER BY round(w.w * w.w, 6) DESC, dim LIMIT 8""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val cells = emb.select(col("vec_id"), col("embedding"),
          posexplode(col("embedding")).as(Seq("pi", "vi")))
        .select(col("vec_id"), col("pi"), col("vi").cast("double").as("vi"),
          posexplode(col("embedding")).as(Seq("pj", "vj")))
        .select(col("pi"), col("pj"), col("vi"),
          col("vj").cast("double").as("vj"))
      val n0 = emb.agg(
        countDistinct(when(col("embedding").isNotNull
          && size(col("embedding")) > 0, col("vec_id"))).as("n"))
      // one corpus pass → the d² Gram frame; every iteration reads
      // THIS, not the embeddings (Gram sums double — effdim note)
      val g = cells.groupBy("pi", "pj")
        .agg(sum(col("vi") * col("vj")).as("sxy"))
        .crossJoin(broadcast(n0))
        .select(col("pi"), col("pj"), (col("sxy") / col("n")).as("gij"))
        .localCheckpoint()
      val dims = g.select(col("pi")).distinct()
      val d0 = dims.agg(count(lit(1)).as("d"))
      val dec = (c: Column) => c.cast("decimal(38,18)")
      var w = dims.crossJoin(broadcast(d0))
        .select(col("pi").as("i"), (lit(1.0) / sqrt(col("d"))).as("w"))
        .localCheckpoint()
      def matvec(wf: org.apache.spark.sql.DataFrame) = g
        .join(broadcast(wf.select(col("i").as("pj"), col("w"))), Seq("pj"))
        .groupBy(col("pi").as("i"))
        .agg(sum(dec(col("gij") * col("w"))).cast("double").as("m"))
      for (_ <- 1 to 5) {
        val mv = matvec(w).localCheckpoint()
        val nrm = mv.agg(sqrt(sum(dec(col("m") * col("m"))).cast("double")).as("z"))
        w = mv.crossJoin(broadcast(nrm))
          .select(col("i"), (col("m") / col("z")).as("w"))
          .localCheckpoint()
      }
      val mv6 = matvec(w).localCheckpoint()
      val ray = w.join(mv6, Seq("i"))
        .agg(sum(dec(col("w") * col("m"))).cast("double").as("lam"))
      w.crossJoin(broadcast(ray))
        .select(col("i").cast("long").as("dim"),
          round(col("w") * col("w"), 6).as("loading2"),
          round(col("lam"), 4).as("top_eigen"))
        .orderBy(desc("loading2"), col("dim"))
        .limit(8)
    },

    // ---- distributed Lloyd k-means (full-corpus, 2 rounds) ----
    // The cluster-scale complement to PqIndex's driver-side Lloyd
    // (which fits on a bounded SAMPLE): here every round touches the
    // whole corpus, exactly the MLlib KMeans execution shape — the k
    // centroids are collected to the driver (k×d doubles, trivially
    // broadcastable) and re-enter the plan as LITERAL arrays, so
    // assignment is a pure codegen'd projection (k sequential-fold
    // dot products per row, argmin via array_min over (dist, id)
    // structs — NO join, NO shuffle); the recompute is one groupBy of
    // the corpus×d exploded cells that map-side combines into ≤ k×d
    // partial cells, so the shuffle is partitions×k×d rows regardless
    // of corpus size. Cross-engine parity pins every float op: seeds
    // are the k smallest md5(vec_id) rows (TakeOrdered, no global
    // window), distances compose |v|²−2·v·c+|c|² from three
    // list_dot_product-parity folds rounded to 6, centroid means and
    // the inertia accumulate as DECIMAL (order-free), and ties break
    // on cluster id. An empty cluster simply drops out of the next
    // round on both engines.
    {
      val K = 8
      def roundSql(r: Int): String = {
        val p = r - 1
        s"""d$r AS (SELECT e.vec_id, e.v, c.cluster,
           |          round(list_dot_product(e.v, e.v)
           |                - 2e0 * list_dot_product(e.v, c.c)
           |                + list_dot_product(c.c, c.c), 6) AS dist
           |        FROM e CROSS JOIN c$p c),
           |a$r AS (SELECT vec_id, v, cluster, dist FROM
           |          (SELECT *, row_number() OVER
           |             (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
           |           FROM d$r) WHERE rn = 1),
           |x$r AS (SELECT cluster, i,
           |          CAST(sum(CAST(v[i] AS DECIMAL(38,18))) AS DOUBLE)
           |            / count(*) AS cx
           |        FROM a$r, unnest(generate_series(1, len(v))) AS t(i)
           |        GROUP BY 1, 2),
           |c$r AS (SELECT cluster, list(cx ORDER BY i) AS c FROM x$r GROUP BY 1)"""
          .stripMargin
      }
      sql(
        "q_kmeans_lloyd",
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |c0 AS (SELECT cluster, c FROM
           |         (SELECT row_number() OVER
           |            (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cluster,
           |            v AS c FROM e) WHERE cluster < $K),
           |${Seq(1, 2).map(roundSql).mkString(",\n")},
           |d3 AS (SELECT e.vec_id, e.v, c.cluster,
           |          round(list_dot_product(e.v, e.v)
           |                - 2e0 * list_dot_product(e.v, c.c)
           |                + list_dot_product(c.c, c.c), 6) AS dist
           |       FROM e CROSS JOIN c2 c),
           |a3 AS (SELECT vec_id, cluster, dist FROM
           |         (SELECT *, row_number() OVER
           |            (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
           |          FROM d3) WHERE rn = 1)
           |SELECT CAST(cluster AS INT) AS cluster, CAST(count(*) AS BIGINT) AS n_vecs,
           |       CAST(sum(vec_id) AS BIGINT) AS vec_id_sum,
           |       round(CAST(sum(CAST(dist AS DECIMAL(38,12))) AS DOUBLE), 4) AS inertia
           |FROM a3 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), asDouble(col("embedding")).as("v"))
          .cache() // seed scan + one full pass per round
        def assign(cents: Array[(Int, Seq[Double])]) = {
          val ds = cents.sortBy(_._1).map { case (j, c) =>
            val lc = typedLit(c)
            struct(
              round(dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), lc)
                + dot(lc, lc), 6).as("d"),
              lit(j).as("j"))
          }
          e.withColumn("best", array_min(array(ds.toIndexedSeq: _*)))
            .select(col("vec_id"), col("v"),
              col("best.j").as("cluster"), col("best.d").as("dist"))
        }
        def recompute(a: org.apache.spark.sql.DataFrame): Array[(Int, Seq[Double])] = a
          .select(col("cluster"), posexplode(col("v")).as(Seq("p", "x")))
          .groupBy(col("cluster"), (col("p") + 1).as("i"))
          .agg(sum(col("x").cast("decimal(38,18)")).as("sx"), count(lit(1)).as("n"))
          .select(col("cluster"), col("i"),
            (col("sx").cast("double") / col("n")).as("cx"))
          .groupBy("cluster")
          .agg(transform(array_sort(collect_list(struct(col("i"), col("cx")))),
            x => x.getField("cx")).as("c"))
          .collect()
          .map(r => (r.getAs[Int]("cluster"), r.getSeq[Double](1)))
        val seeds = e.withColumn("h", md5(col("vec_id").cast("string")))
          .orderBy("h", "vec_id").limit(K)
          .select(col("v")).collect() // TakeOrdered: k rows, sorted
        var cents = seeds.zipWithIndex.map { case (r, j) => (j, r.getSeq[Double](0)) }
        for (_ <- 1 to 2) cents = recompute(assign(cents))
        assign(cents)
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_vecs"),
            sum("vec_id").as("vec_id_sum"),
            round(sum(col("dist").cast("decimal(38,12)")).cast("double"), 4)
              .as("inertia"))
          .orderBy("cluster")
      }
    },

    // ---- embedding two-sample drift: MMD (linear + RBF probe) ----
    // The distribution test the embedding family was missing: is the
    // label<5 half of the corpus distributed like the label≥5 half?
    // Two estimators, two scale regimes. (1) LINEAR-kernel MMD² =
    // ‖μ_A − μ_B‖² — EXACT at any corpus size: per-dimension means by
    // the q_embed_centroids explode (DECIMAL(38,18) sums), then a
    // d-row join. This is the honest 100-TB default. (2) RBF-kernel
    // MMD² (unbiased U-statistic, bandwidth 2σ² = 2d — fixed, not the
    // median heuristic, so both engines agree without a pair-median
    // pass) on a DETERMINISTIC BOUNDED PROBE: the 256 lowest
    // md5-ordered vec_ids per side, so the three pair blocks are
    // ≤ 256² each — probe-constant, never corpus-quadratic (the
    // ANN-audit capping convention). Kernel sums accumulate as
    // DECIMAL(38,18); dot products are the codegen'd fold that
    // already hash-matches list_dot_product (q_knn_bruteforce).
    sql(
      "q_embed_mmd",
      """WITH e AS (SELECT vec_id, label < 5 AS is_a, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |ex AS (SELECT is_a, unnest(generate_series(1, len(v))) AS i, v FROM e),
        |mu AS (SELECT is_a, i,
        |         CAST(sum(CAST(v[i] AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS m
        |       FROM ex GROUP BY 1, 2),
        |lin AS (SELECT CAST(sum(CAST((a.m - b.m) * (a.m - b.m) AS DECIMAL(38,18)))
        |                 AS DOUBLE) AS mmd2_linear
        |        FROM mu a JOIN mu b ON a.i = b.i AND a.is_a AND NOT b.is_a),
        |pr AS (SELECT vec_id, is_a, v,
        |         row_number() OVER (PARTITION BY is_a ORDER BY
        |           ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
        |           vec_id) AS rn
        |       FROM e),
        |p AS (SELECT vec_id, is_a, v, list_dot_product(v, v) AS sq,
        |             CAST(len(v) AS DOUBLE) AS d
        |      FROM pr WHERE rn <= 256),
        |kaa AS (SELECT CAST(sum(CAST(exp(-((a.sq + b.sq
        |            - 2 * list_dot_product(a.v, b.v)) / (2 * a.d)))
        |            AS DECIMAL(38,18))) AS DOUBLE) AS s,
        |          CAST(count(*) AS BIGINT) AS np
        |        FROM p a JOIN p b ON a.is_a AND b.is_a AND a.vec_id <> b.vec_id),
        |kbb AS (SELECT CAST(sum(CAST(exp(-((a.sq + b.sq
        |            - 2 * list_dot_product(a.v, b.v)) / (2 * a.d)))
        |            AS DECIMAL(38,18))) AS DOUBLE) AS s,
        |          CAST(count(*) AS BIGINT) AS np
        |        FROM p a JOIN p b ON NOT a.is_a AND NOT b.is_a
        |                         AND a.vec_id <> b.vec_id),
        |kab AS (SELECT CAST(sum(CAST(exp(-((a.sq + b.sq
        |            - 2 * list_dot_product(a.v, b.v)) / (2 * a.d)))
        |            AS DECIMAL(38,18))) AS DOUBLE) AS s,
        |          CAST(count(*) AS BIGINT) AS np
        |        FROM p a JOIN p b ON a.is_a AND NOT b.is_a),
        |cnt AS (SELECT CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |               CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
        |        FROM p)
        |SELECT cnt.na AS n_probe_a, cnt.nb AS n_probe_b,
        |       round(lin.mmd2_linear, 8) AS mmd2_linear,
        |       round(kaa.s / kaa.np + kbb.s / kbb.np - 2 * (kab.s / kab.np), 8)
        |         AS mmd2_rbf
        |FROM lin CROSS JOIN kaa CROSS JOIN kbb CROSS JOIN kab CROSS JOIN cnt""".stripMargin) {
      (s, dir) =>
      import graft.functions.TextFunctions.h32
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), (col("label") < 5).as("is_a"),
          asDouble(col("embedding")).as("v"))
      val ex = e.select(col("is_a"), posexplode(col("v")).as(Seq("p", "x")))
      val mu = ex.groupBy(col("is_a"), (col("p") + 1).as("i"))
        .agg((sum(col("x").cast("decimal(38,18)")).cast("double")
          / count(lit(1))).as("m"))
      val lin = mu.where(col("is_a")).select(col("i"), col("m").as("ma"))
        .join(mu.where(!col("is_a")).select(col("i"), col("m").as("mb")), "i")
        .agg(sum(((col("ma") - col("mb")) * (col("ma") - col("mb")))
          .cast("decimal(38,18)")).cast("double").as("mmd2_linear"))
      val wS = Window.partitionBy("is_a")
        .orderBy(h32(col("vec_id").cast("string")), col("vec_id"))
      val probe = e.withColumn("rn", row_number().over(wS))
        .where(col("rn") <= 256)
        .select(col("vec_id"), col("is_a"), col("v"),
          dot(col("v"), col("v")).as("sq"),
          size(col("v")).cast("double").as("d"))
        .localCheckpoint() // bounded: ≤ 512 rows by construction
      def kblock(cond: Column, aliasN: String) = {
        val a = probe.select(col("vec_id").as("ia"), col("is_a").as("aa"),
          col("v").as("va"), col("sq").as("sqa"), col("d"))
        val b = probe.select(col("vec_id").as("ib"), col("is_a").as("ab"),
          col("v").as("vb"), col("sq").as("sqb"))
        a.join(broadcast(b), cond)
          .agg(sum(exp(-((col("sqa") + col("sqb")
              - lit(2) * dot(col("va"), col("vb"))) / (lit(2) * col("d"))))
            .cast("decimal(38,18)")).cast("double").as(s"s_$aliasN"),
            count(lit(1)).as(s"np_$aliasN"))
      }
      val kaa = kblock(col("aa") && col("ab") && col("ia") =!= col("ib"), "aa")
      val kbb = kblock(!col("aa") && !col("ab") && col("ia") =!= col("ib"), "bb")
      val kab = kblock(col("aa") && !col("ab"), "ab")
      val cnt = probe.agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("is_a"), 0L).otherwise(1L)).as("nb"))
      lin.crossJoin(broadcast(kaa)).crossJoin(broadcast(kbb))
        .crossJoin(broadcast(kab)).crossJoin(broadcast(cnt))
        .select(col("na").as("n_probe_a"), col("nb").as("n_probe_b"),
          round(col("mmd2_linear"), 8).as("mmd2_linear"),
          round(col("s_aa") / col("np_aa") + col("s_bb") / col("np_bb")
            - lit(2) * (col("s_ab") / col("np_ab")), 8).as("mmd2_rbf"))
    },

    // ---- external cluster validation: purity / NMI / ARI ----
    // How good is a clustering against ground-truth labels? Scored on
    // the deterministic sign-LSH 8-bit bucket assignment (the
    // oracle-replicable quantizer q_knn_signlsh already hash-matches)
    // vs the label column — the evaluation harness is the operator;
    // swap in any other assignment column at no structural cost. ONE
    // corpus pass collapses to the ≤ 256×#labels contingency frame;
    // every metric is computed there: purity (per-cluster max over
    // exact integer counts), NMI (mutual information over the
    // contingency with DECIMAL(38,18)-accumulated p·ln terms, entropy
    // normalization √(H(U)H(V))), and the adjusted Rand index (all
    // pair-combination sums as exact DECIMAL(38,0) integers —
    // n·(n−1) per cell, /2 deferred to one double op — so the
    // permutation-model correction is float-free until the final
    // closed form). Margins and the 1-row total ride as broadcasts.
    sql(
      "q_cluster_metrics",
      """WITH e AS (SELECT list_sum(list_transform(range(0, 8),
        |             i -> CASE WHEN embedding[i+1] > 0
        |                       THEN (1::BIGINT << i) ELSE 0 END)) AS bkt,
        |           label
        |           FROM embeddings),
        |ct AS (SELECT bkt, label, CAST(count(*) AS BIGINT) AS nij
        |       FROM e GROUP BY 1, 2),
        |am AS (SELECT bkt, CAST(sum(nij) AS BIGINT) AS ai FROM ct GROUP BY 1),
        |bm AS (SELECT label, CAST(sum(nij) AS BIGINT) AS bj FROM ct GROUP BY 1),
        |tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
        |               CAST(count(*) AS BIGINT) AS n_cells FROM ct),
        |pur AS (SELECT CAST(sum(mx) AS BIGINT) AS hits,
        |               CAST(count(*) AS BIGINT) AS n_clusters
        |        FROM (SELECT bkt, max(nij) AS mx FROM ct GROUP BY 1)),
        |mi AS (SELECT CAST(sum(CAST((CAST(nij AS DOUBLE) / tot.n)
        |           * ln((CAST(tot.n AS DOUBLE) * nij)
        |                / (CAST(am.ai AS DOUBLE) * bm.bj))
        |           AS DECIMAL(38,18))) AS DOUBLE) AS i
        |       FROM ct JOIN am USING (bkt) JOIN bm USING (label) CROSS JOIN tot),
        |hu AS (SELECT CAST(sum(CAST(-(CAST(ai AS DOUBLE) / tot.n)
        |           * ln(CAST(ai AS DOUBLE) / tot.n) AS DECIMAL(38,18)))
        |           AS DOUBLE) AS h
        |       FROM am CROSS JOIN tot),
        |hv AS (SELECT CAST(sum(CAST(-(CAST(bj AS DOUBLE) / tot.n)
        |           * ln(CAST(bj AS DOUBLE) / tot.n) AS DECIMAL(38,18)))
        |           AS DOUBLE) AS h
        |       FROM bm CROSS JOIN tot),
        |pc AS (SELECT
        |    CAST(sum(CAST(nij * (nij - 1) AS DECIMAL(38,0))) AS DOUBLE) / 2 AS sij
        |  FROM ct),
        |pa AS (SELECT
        |    CAST(sum(CAST(ai * (ai - 1) AS DECIMAL(38,0))) AS DOUBLE) / 2 AS sa
        |  FROM am),
        |pb AS (SELECT
        |    CAST(sum(CAST(bj * (bj - 1) AS DECIMAL(38,0))) AS DOUBLE) / 2 AS sb
        |  FROM bm)
        |SELECT tot.n, pur.n_clusters, tot.n_cells,
        |  round(CAST(pur.hits AS DOUBLE) / tot.n, 6) AS purity,
        |  round(mi.i / (sqrt(hu.h) * sqrt(hv.h)), 6) AS nmi,
        |  round((pc.sij - (pa.sa * pb.sb)
        |           / ((CAST(tot.n AS DOUBLE) * (tot.n - 1)) / 2))
        |        / ((pa.sa + pb.sb) / 2 - (pa.sa * pb.sb)
        |           / ((CAST(tot.n AS DOUBLE) * (tot.n - 1)) / 2)), 6) AS ari
        |FROM tot CROSS JOIN pur CROSS JOIN mi CROSS JOIN hu
        |     CROSS JOIN hv CROSS JOIN pc CROSS JOIN pa CROSS JOIN pb""".stripMargin) {
      (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(signBucket(asDouble(col("embedding"))).as("bkt"), col("label"))
      val ct = e.groupBy("bkt", "label").agg(count(lit(1)).as("nij"))
        .localCheckpoint() // contingency frame: feeds all three metrics
      val am = ct.groupBy("bkt").agg(sum("nij").cast("long").as("ai"))
      val bm = ct.groupBy("label").agg(sum("nij").cast("long").as("bj"))
      val tot = ct.agg(sum("nij").cast("long").as("n"),
        count(lit(1)).as("n_cells"))
      val pur = ct.groupBy("bkt").agg(max("nij").as("mx"))
        .agg(sum("mx").cast("long").as("hits"), count(lit(1)).as("n_clusters"))
      val d18 = (c: Column) => c.cast("decimal(38,18)")
      val mi = ct.join(am, "bkt").join(bm, "label").crossJoin(broadcast(tot))
        .agg(sum(d18((col("nij").cast("double") / col("n"))
            * log((col("n").cast("double") * col("nij"))
              / (col("ai").cast("double") * col("bj")))))
          .cast("double").as("i"))
      def entropy(margin: org.apache.spark.sql.DataFrame, cnt: String) =
        margin.crossJoin(broadcast(tot))
          .agg(sum(d18(-(col(cnt).cast("double") / col("n"))
              * log(col(cnt).cast("double") / col("n"))))
            .cast("double").as("h"))
      val hu = entropy(am, "ai"); val hv = entropy(bm, "bj")
      def pairSum(df: org.apache.spark.sql.DataFrame, cnt: String, out: String) =
        df.agg((sum((col(cnt) * (col(cnt) - 1)).cast("decimal(38,0)"))
          .cast("double") / 2).as(out))
      val pc = pairSum(ct, "nij", "sij")
      val pa = pairSum(am, "ai", "sa"); val pb = pairSum(bm, "bj", "sb")
      val nPairs = (col("n").cast("double") * (col("n") - 1)) / 2
      tot.crossJoin(broadcast(pur)).crossJoin(broadcast(mi))
        .crossJoin(broadcast(hu.select(col("h").as("hu"))))
        .crossJoin(broadcast(hv.select(col("h").as("hv"))))
        .crossJoin(broadcast(pc)).crossJoin(broadcast(pa))
        .crossJoin(broadcast(pb))
        .select(col("n"), col("n_clusters"), col("n_cells"),
          round(col("hits").cast("double") / col("n"), 6).as("purity"),
          round(col("i") / (sqrt(col("hu")) * sqrt(col("hv"))), 6).as("nmi"),
          round((col("sij") - (col("sa") * col("sb")) / nPairs)
            / ((col("sa") + col("sb")) / 2
              - (col("sa") * col("sb")) / nPairs), 6).as("ari"))
    },

    // ---- internal cluster validation: centroid silhouette ----
    // q_cluster_metrics' internal twin — no ground truth consumed,
    // only geometry: per-label centroids (the label column stands in
    // as the assignment under audit), each vector's a = distance to
    // its OWN centroid and b = min distance to any OTHER, silhouette
    // s = (b − a)/max(a, b), reported per label with the overall mean
    // riding as a 1-row broadcast. This is the CENTROID silhouette
    // (Rousseeuw's pairwise a/b is O(n²) — the centroid form is the
    // standard any-scale relaxation): one k-row broadcast of ordered
    // centroid arrays, a k-fan-out projection per vector (k dot
    // products, never a corpus self-join), one keyed collapse.
    // Distances use the algebraic |v|² − 2vc + |c|² rounded to 6dp —
    // the q_kmeans_lloyd parity convention (the fold form drifts in
    // the last ulps vs list_dot_product); per-label silhouette means
    // DECIMAL(38,18)-accumulate. Zero-distance degenerate pairs guard
    // through the 1e-300 floor identically on both engines.
    sql(
      "q_silhouette",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |ex AS (SELECT label, unnest(generate_series(1, len(v))) AS i, v FROM e),
        |cl AS (SELECT label, i,
        |         CAST(sum(CAST(v[i] AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS c
        |       FROM ex GROUP BY 1, 2),
        |ca AS (SELECT label AS clab, list(c ORDER BY i) AS carr FROM cl GROUP BY 1),
        |p AS (SELECT e.vec_id, e.label, ca.clab,
        |        round(list_dot_product(e.v, e.v)
        |              - 2e0 * list_dot_product(e.v, ca.carr)
        |              + list_dot_product(ca.carr, ca.carr), 6) AS d2
        |      FROM e CROSS JOIN ca),
        |sv0 AS (SELECT vec_id, label,
        |          max(CASE WHEN clab = label THEN d2 END) AS a2,
        |          min(CASE WHEN clab <> label THEN d2 END) AS b2
        |        FROM p GROUP BY 1, 2),
        |sv AS (SELECT label,
        |         (sqrt(b2) - sqrt(a2))
        |           / greatest(sqrt(a2), sqrt(b2), 1e-300) AS sil
        |       FROM sv0),
        |ag AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |         CAST(sum(CAST(sil AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS ms
        |       FROM sv GROUP BY 1),
        |ov AS (SELECT CAST(sum(CAST(sil AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS v
        |       FROM sv)
        |SELECT label, n_vecs, round(ms, 6) AS silhouette,
        |       round((SELECT v FROM ov), 6) AS silhouette_overall
        |FROM ag ORDER BY label""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      val ex = e.select(col("label"), posexplode(col("v")).as(Seq("p", "x")))
      val ca = ex.groupBy(col("label"), (col("p") + 1).as("i"))
        .agg((sum(col("x").cast("decimal(38,18)")).cast("double")
          / count(lit(1))).as("c"))
        .groupBy(col("label").as("clab"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
          x => x.getField("c")).as("carr"))
      val p = e.crossJoin(broadcast(ca))
        .select(col("vec_id"), col("label"), col("clab"),
          round(dot(col("v"), col("v"))
            - lit(2.0) * dot(col("v"), col("carr"))
            + dot(col("carr"), col("carr")), 6).as("d2"))
      val sv0 = p.groupBy("vec_id", "label")
        .agg(max(when(col("clab") === col("label"), col("d2"))).as("a2"),
          min(when(col("clab") =!= col("label"), col("d2"))).as("b2"))
      val sv = sv0.select(col("label"),
        ((sqrt(col("b2")) - sqrt(col("a2")))
          / greatest(sqrt(col("a2")), sqrt(col("b2")), lit(1e-300))).as("sil"))
        .localCheckpoint() // feeds the per-label means AND the overall
      val ag = sv.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          (sum(col("sil").cast("decimal(38,18)")).cast("double")
            / count(lit(1))).as("ms"))
      val ov = sv.agg((sum(col("sil").cast("decimal(38,18)")).cast("double")
        / count(lit(1))).as("v"))
      ag.crossJoin(broadcast(ov))
        .select(col("label"), col("n_vecs"),
          round(col("ms"), 6).as("silhouette"),
          round(col("v"), 6).as("silhouette_overall"))
        .orderBy("label")
    },

    // ---- kNN-distance anomaly score (distance to the 5th neighbor) ----
    // The density-based outlier primitive (the distance leg of LOF):
    // a vector whose 5th-nearest cosine neighbor is far sits in a
    // sparse region of embedding space — the screen for corrupt /
    // out-of-distribution embeddings before they pollute a training
    // mix. Same CAPPED probe-set discipline as annRecallAudit
    // (vec_id % 25, id < 1000): the audit is queries-constant so the
    // probe×corpus product stays linear in the corpus; the scale path
    // for scoring EVERY vector is the IVF cell structure (q_knn_ivf),
    // not a wider brute force. Rank rule = round-6 sim desc, cid —
    // the repo-wide ANN tie-break.
    sql(
      "q_knn_dist_outlier",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |        round($cosineSql, 6) AS s
         |      FROM e q JOIN e c ON c.vec_id <> q.vec_id
         |      WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000),
         |r AS (SELECT qid, s,
         |        row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn
         |      FROM p)
         |SELECT qid, round(1.0 - s, 6) AS knn_dist,
         |       CAST(1.0 - s > 0.72 AS BOOLEAN) AS is_outlier
         |FROM r WHERE rn = 5 ORDER BY qid""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.where(col("vec_id") % 25 === 0 && col("vec_id") < 1000)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val c = e.select(col("vec_id").as("cid"), col("v").as("cv"))
      val w = Window.partitionBy("qid").orderBy(desc("s"), col("cid"))
      q.join(c, col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"),
          round(cosine(col("qv"), col("cv")), 6).as("s"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 5)
        .select(col("qid"), round(lit(1.0) - col("s"), 6).as("knn_dist"),
          (lit(1.0) - col("s") > 0.72).as("is_outlier"))
        .orderBy("qid")
    },

    // ---- grid-density clustering cells (DBSCAN core/border/noise) ----
    // The grid formulation of DBSCAN (cell width = ε): bucket the
    // first two embedding coordinates into a fixed grid, classify
    // each occupied cell as core (n ≥ minPts), border (a non-core
    // cell 8-adjacent to a core) or noise. Everything after the ONE
    // corpus aggregation runs on the #cells frame — the neighbor
    // check is a 9-way offset explode + equi-join on cell keys, never
    // a pairwise distance join; at 100 TB the cell frame is still
    // tiny and the corpus is touched exactly once.
    sql(
      "q_dbscan_cells",
      """WITH g AS (SELECT
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.1) AS BIGINT) AS cx,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.1) AS BIGINT) AS cy,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM embeddings GROUP BY 1, 2),
        |core AS (SELECT cx, cy FROM g WHERE n >= 8),
        |nb AS (SELECT DISTINCT g.cx, g.cy
        |       FROM g
        |       CROSS JOIN (SELECT unnest(range(-1, 2)) AS dx) x
        |       CROSS JOIN (SELECT unnest(range(-1, 2)) AS dy) y
        |       JOIN core c ON c.cx = g.cx + x.dx AND c.cy = g.cy + y.dy)
        |SELECT g.cx, g.cy, g.n,
        |  CASE WHEN g.n >= 8 THEN 'core'
        |       WHEN nb.cx IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS cls
        |FROM g LEFT JOIN nb ON nb.cx = g.cx AND nb.cy = g.cy
        |ORDER BY g.cx, g.cy""".stripMargin) { (s, dir) =>
      val g = t(s, dir, "embeddings")
        .select(
          floor(element_at(col("embedding"), 1).cast("double") / 0.1)
            .cast("long").as("cx"),
          floor(element_at(col("embedding"), 2).cast("double") / 0.1)
            .cast("long").as("cy"))
        .groupBy("cx", "cy").agg(count(lit(1)).as("n"))
        .localCheckpoint() // #cells rows: feeds core set + neighbor join
      val core = g.where(col("n") >= 8).select(col("cx").as("kx"), col("cy").as("ky"))
      val offs = Seq(-1L, 0L, 1L)
      val nb = g.select(col("cx"), col("cy"),
          explode(array(offs.flatMap(dx => offs.map(dy =>
            struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)).as("o"))
        .select(col("cx"), col("cy"),
          (col("cx") + col("o.dx")).as("kx"), (col("cy") + col("o.dy")).as("ky"))
        .join(broadcast(core), Seq("kx", "ky"))
        .select("cx", "cy").distinct()
        .withColumn("near_core", lit(1))
      g.join(broadcast(nb), Seq("cx", "cy"), "left")
        .select(col("cx"), col("cy"), col("n"),
          when(col("n") >= 8, "core")
            .when(col("near_core").isNotNull, "border")
            .otherwise("noise").as("cls"))
        .orderBy("cx", "cy")
    },

    // ---- DBSCAN cluster expansion (grid cells → cluster labels) ----
    // The expansion step q_dbscan_cells stops short of: connect
    // 8-adjacent CORE cells into clusters (3 unrolled rounds of
    // min-label propagation over the core-cell adjacency — labels are
    // the 3-hop neighborhood minimum, well-defined at any round count;
    // the repo's LPA/dedup_components convention) and assign each
    // border cell to the smallest adjacent core label. Output: one row
    // per cluster with core/border cell counts and total member
    // points — the per-cluster inventory a density-clustering run is
    // read by. Scale shape: ONE corpus aggregation to the cell frame;
    // adjacency is the 9-way offset explode + equi-join on cell keys
    // (never a pairwise distance join); every propagation round is a
    // join on the tiny core-cell frame.
    sql(
      "q_dbscan_clusters",
      """WITH g AS (SELECT
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.1) AS BIGINT) AS cx,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.1) AS BIGINT) AS cy,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM embeddings GROUP BY 1, 2),
        |core AS (SELECT cx, cy, n,
        |           (cx + 1000000) * 4000001 + (cy + 1000000) AS k
        |         FROM g WHERE n >= 8),
        |off AS (SELECT x.dx, y.dy FROM (SELECT unnest(range(-1, 2)) AS dx) x
        |        CROSS JOIN (SELECT unnest(range(-1, 2)) AS dy) y),
        |adj AS (SELECT a.k AS ka, b.k AS kb
        |        FROM core a CROSS JOIN off
        |        JOIN core b ON b.cx = a.cx + off.dx AND b.cy = a.cy + off.dy),
        |l0 AS (SELECT k, k AS lab FROM core),
        |l1 AS (SELECT adj.ka AS k, min(l0.lab) AS lab FROM adj
        |       JOIN l0 ON l0.k = adj.kb GROUP BY 1),
        |l2 AS (SELECT adj.ka AS k, min(l1.lab) AS lab FROM adj
        |       JOIN l1 ON l1.k = adj.kb GROUP BY 1),
        |l3 AS (SELECT adj.ka AS k, min(l2.lab) AS lab FROM adj
        |       JOIN l2 ON l2.k = adj.kb GROUP BY 1),
        |bord AS (SELECT g.cx, g.cy, max(g.n) AS n, min(l3.lab) AS lab
        |         FROM g CROSS JOIN off
        |         JOIN core c ON c.cx = g.cx + off.dx AND c.cy = g.cy + off.dy
        |         JOIN l3 ON l3.k = c.k
        |         WHERE g.n < 8 GROUP BY 1, 2),
        |cc AS (SELECT l3.lab AS cluster, CAST(count(*) AS BIGINT) AS n_core_cells,
        |              CAST(sum(core.n) AS BIGINT) AS pts
        |       FROM core JOIN l3 ON l3.k = core.k GROUP BY 1),
        |bb AS (SELECT lab AS cluster, CAST(count(*) AS BIGINT) AS n_border_cells,
        |              CAST(sum(n) AS BIGINT) AS pts
        |       FROM bord GROUP BY 1)
        |SELECT cc.cluster, cc.n_core_cells,
        |       CAST(coalesce(bb.n_border_cells, 0) AS BIGINT) AS n_border_cells,
        |       CAST(cc.pts + coalesce(bb.pts, 0) AS BIGINT) AS n_points
        |FROM cc LEFT JOIN bb ON bb.cluster = cc.cluster
        |ORDER BY cc.cluster""".stripMargin) { (s, dir) =>
      val g = t(s, dir, "embeddings")
        .select(
          floor(element_at(col("embedding"), 1).cast("double") / 0.1)
            .cast("long").as("cx"),
          floor(element_at(col("embedding"), 2).cast("double") / 0.1)
            .cast("long").as("cy"))
        .groupBy("cx", "cy").agg(count(lit(1)).as("n"))
        .localCheckpoint() // #cells rows: feeds core set + every round
      val core = g.where(col("n") >= 8)
        .select(col("cx"), col("cy"), col("n"),
          ((col("cx") + 1000000L) * 4000001L + (col("cy") + 1000000L)).as("k"))
        .localCheckpoint() // core frame feeds adjacency + 3 rounds + rollup
      val offs = Seq(-1L, 0L, 1L)
      val offCol = explode(array(offs.flatMap(dx => offs.map(dy =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)).as("o")
      val adj = core.select(col("k").as("ka"), col("cx"), col("cy"), offCol)
        .join(core.select(col("cx").as("bx"), col("cy").as("by"),
          col("k").as("kb")),
          col("bx") === col("cx") + col("o.dx")
            && col("by") === col("cy") + col("o.dy"))
        .select("ka", "kb")
      var lab = core.select(col("k"), col("k").as("lab"))
      for (_ <- 1 to 3)
        lab = adj.join(lab.select(col("k").as("kb"), col("lab")), "kb")
          .groupBy(col("ka").as("k")).agg(min("lab").as("lab"))
      val bordLab = g.where(col("n") < 8)
        .select(col("cx"), col("cy"), col("n"), offCol)
        .join(core.select(col("cx").as("bx"), col("cy").as("by"),
          col("k").as("kb")),
          col("bx") === col("cx") + col("o.dx")
            && col("by") === col("cy") + col("o.dy"))
        .join(lab.select(col("k").as("kb"), col("lab")), "kb")
        .groupBy("cx", "cy").agg(max("n").as("n"), min("lab").as("lab"))
      val cc = core.join(lab, "k")
        .groupBy(col("lab").as("cluster"))
        .agg(count(lit(1)).as("n_core_cells"), sum("n").as("pts"))
      val bb = bordLab.groupBy(col("lab").as("cluster"))
        .agg(count(lit(1)).as("n_border_cells"), sum("n").as("bpts"))
      cc.join(bb, Seq("cluster"), "left")
        .select(col("cluster"), col("n_core_cells"),
          coalesce(col("n_border_cells"), lit(0L)).cast("long")
            .as("n_border_cells"),
          (col("pts") + coalesce(col("bpts"), lit(0L))).cast("long")
            .as("n_points"))
        .orderBy("cluster")
    },

    // ---- Johnson–Lindenstrauss ±1 projection + distortion audit ----
    // The dimensionality-reduction step before any large-scale ANN:
    // project 64-dim embeddings to k=16 with a deterministic ±1
    // matrix (sign = md5(i·16+j) parity, scaled 1/√k) and MEASURE the
    // JL guarantee — the squared-distance ratio d'²/d² over an
    // md5-capped probe-pair block (≤128 per side, the q_embed_mmd
    // cap, so the pair volume is bounded at ANY corpus size).
    // Projection is a (vec, dim) explode joined to the 1024-row
    // broadcast sign table — k·d work per vector, no pairwise stage
    // touches the full corpus.
    sql(
      "q_jl_projection",
      """WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS r
        |  FROM embeddings WHERE vec_id % 2 = 0 QUALIFY r <= 128),
        |b AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS r
        |  FROM embeddings WHERE vec_id % 2 = 1 QUALIFY r <= 128),
        |sg AS (SELECT i, j, CASE WHEN ('0x' || substr(md5(CAST(i * 16 + j
        |      AS VARCHAR)), 1, 8))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
        |  FROM range(64) t1(i) CROSS JOIN range(16) t2(j)),
        |ex AS (SELECT vec_id, i, v[i + 1] AS x, 'a' AS side FROM a,
        |         range(64) t(i)
        |       UNION ALL SELECT vec_id, i, v[i + 1], 'b' FROM b, range(64) t(i)),
        |pj AS (SELECT side, vec_id, j,
        |    CAST(sum(CAST(x * s AS DECIMAL(28,12))) AS DOUBLE) / 4.0 AS y
        |  FROM ex JOIN sg USING (i) GROUP BY 1, 2, 3),
        |pd AS (SELECT pa.vec_id AS qa, pb.vec_id AS qb,
        |    CAST(sum(CAST((pa.y - pb.y) * (pa.y - pb.y) AS DECIMAL(28,12)))
        |         AS DOUBLE) AS d2p
        |  FROM pj pa JOIN pj pb ON pa.j = pb.j AND pa.side = 'a' AND pb.side = 'b'
        |  GROUP BY 1, 2),
        |od AS (SELECT ea.vec_id AS qa, eb.vec_id AS qb,
        |    CAST(sum(CAST((ea.x - eb.x) * (ea.x - eb.x) AS DECIMAL(28,12)))
        |         AS DOUBLE) AS d2o
        |  FROM ex ea JOIN ex eb ON ea.i = eb.i AND ea.side = 'a' AND eb.side = 'b'
        |  GROUP BY 1, 2),
        |rt AS (SELECT p.d2p / o.d2o AS ratio
        |  FROM pd p JOIN od o ON p.qa = o.qa AND p.qb = o.qb
        |  WHERE o.d2o > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs, CAST(16 AS BIGINT) AS k_dims,
        |  round(CAST(sum(CAST(ratio AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6)
        |    AS mean_ratio,
        |  round(CAST(quantile_cont(ratio, 0.05) AS DOUBLE), 6) AS p05_ratio,
        |  round(CAST(quantile_cont(ratio, 0.95) AS DOUBLE), 6) AS p95_ratio,
        |  round(CAST(sum(CASE WHEN abs(ratio - 1) <= 0.25 THEN 1 ELSE 0 END)
        |        AS DOUBLE) / count(*), 4) AS frac_within_25pct
        |FROM rt""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      def side(parity: Int, tag: String) = e
        .where(col("vec_id") % 2 === parity)
        .withColumn("r", row_number().over(
          Window.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))))
        .where(col("r") <= 128)
        .select(col("vec_id"), col("v"), lit(tag).as("side"))
      val ab = side(0, "a").unionByName(side(1, "b"))
      val ex = ab.select(col("side"), col("vec_id"),
          posexplode(col("v")).as(Seq("i", "x")))
        .localCheckpoint() // ≤256×64 rows — feeds projection + exact d²
      val signs = s.range(64).select(col("id").as("i"))
        .crossJoin(s.range(16).select(col("id").as("j")))
        .select(col("i"), col("j"),
          when(conv(substring(md5((col("i") * 16 + col("j")).cast("string")),
            1, 8), 16, 10).cast("long") % 2 === 0, lit(1.0))
            .otherwise(lit(-1.0)).as("s"))
      val pj = ex.join(broadcast(signs), "i")
        .groupBy("side", "vec_id", "j")
        .agg((sum((col("x") * col("s")).cast("decimal(28,12)")).cast("double")
          / 4.0).as("y"))
      val pa = pj.where(col("side") === "a")
        .select(col("vec_id").as("qa"), col("j").as("ja"), col("y").as("ya"))
      val pb = pj.where(col("side") === "b")
        .select(col("vec_id").as("qb"), col("j").as("jb"), col("y").as("yb"))
      val pd = pa.join(pb, col("ja") === col("jb"))
        .groupBy("qa", "qb")
        .agg(sum(((col("ya") - col("yb")) * (col("ya") - col("yb")))
          .cast("decimal(28,12)")).cast("double").as("d2p"))
      val ea = ex.where(col("side") === "a")
        .select(col("vec_id").as("qa"), col("i").as("ia"), col("x").as("xa"))
      val eb = ex.where(col("side") === "b")
        .select(col("vec_id").as("qb"), col("i").as("ib"), col("x").as("xb"))
      val od = ea.join(eb, col("ia") === col("ib"))
        .groupBy("qa", "qb")
        .agg(sum(((col("xa") - col("xb")) * (col("xa") - col("xb")))
          .cast("decimal(28,12)")).cast("double").as("d2o"))
      val rt = pd.join(od, Seq("qa", "qb")).where(col("d2o") > 0)
        .select((col("d2p") / col("d2o")).as("ratio"))
      rt.agg(count(lit(1)).as("n_pairs"),
          sum(col("ratio").cast("decimal(28,12)")).cast("double").as("sr"),
          percentile(col("ratio"), lit(0.05)).as("p05"),
          percentile(col("ratio"), lit(0.95)).as("p95"),
          sum(when(abs(col("ratio") - 1) <= 0.25, 1L).otherwise(0L)).as("w"))
        .select(col("n_pairs"), lit(16L).as("k_dims"),
          round(col("sr") / col("n_pairs"), 6).as("mean_ratio"),
          round(col("p05"), 6).as("p05_ratio"),
          round(col("p95"), 6).as("p95_ratio"),
          round(col("w").cast("double") / col("n_pairs"), 4)
            .as("frac_within_25pct"))
    },

    // ---- top-2 spectral pair via deflation ----
    // Extends q_embed_top_eigen to the second eigenpair of the
    // embedding second-moment matrix: power-iterate v₁ (5 rounds),
    // deflate G₂ = G − λ₁v₁v₁ᵀ on the d² frame, power-iterate v₂, and
    // report both Rayleigh eigenvalues, their trace shares, the
    // spectral ratio, and the v₁·v₂ orthogonality check — the
    // effective-dimension detail behind whitening and PCA-k choices.
    // ONE corpus pass builds the d² Gram; every iteration (and the
    // deflation) is d²-frame math with d-row broadcast vectors.
    sql(
      "q_pca_top2",
      s"""WITH ex AS (SELECT vec_id, embedding,
        |              unnest(generate_series(1, len(embedding))) AS i
        |            FROM embeddings),
        |x AS MATERIALIZED (SELECT vec_id, i - 1 AS i,
        |       CAST(embedding[i] AS DOUBLE) AS v FROM ex),
        |n0 AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM x),
        |g AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
        |        sum(a.v * b.v) / (SELECT n FROM n0) AS gij
        |      FROM x a JOIN x b ON b.vec_id = a.vec_id GROUP BY a.i, b.i),
        |dims AS (SELECT DISTINCT i FROM x),
        |d0 AS (SELECT CAST(count(*) AS BIGINT) AS d FROM dims),
        |wa0 AS (SELECT i, CAST(1 AS DOUBLE) / sqrt((SELECT d FROM d0)) AS w
        |        FROM dims),
        |${(1 to 5).map(k =>
          s"""mva$k AS (SELECT g.i,
             |    CAST(sum(CAST(g.gij * w.w AS DECIMAL(38,18))) AS DOUBLE) AS m
             |  FROM g JOIN wa${k - 1} w ON w.i = g.j GROUP BY g.i),
             |nra$k AS (SELECT sqrt(CAST(sum(CAST(m * m AS DECIMAL(38,18)))
             |                          AS DOUBLE)) AS z FROM mva$k),
             |wa$k AS (SELECT i, m / (SELECT z FROM nra$k) AS w FROM mva$k)"""
            .stripMargin).mkString(",\n")},
        |mva6 AS (SELECT g.i,
        |    CAST(sum(CAST(g.gij * w.w AS DECIMAL(38,18))) AS DOUBLE) AS m
        |  FROM g JOIN wa5 w ON w.i = g.j GROUP BY g.i),
        |raya AS (SELECT CAST(sum(CAST(w.w * mv.m AS DECIMAL(38,18))) AS DOUBLE)
        |           AS lam
        |         FROM wa5 w JOIN mva6 mv ON mv.i = w.i),
        |g2 AS MATERIALIZED (SELECT g.i, g.j,
        |         g.gij - (SELECT lam FROM raya) * wi.w * wj.w AS gij
        |       FROM g JOIN wa5 wi ON wi.i = g.i JOIN wa5 wj ON wj.i = g.j),
        |wb0 AS (SELECT i, CAST(1 AS DOUBLE) / sqrt((SELECT d FROM d0)) AS w
        |        FROM dims),
        |${(1 to 5).map(k =>
          s"""mvb$k AS (SELECT g.i,
             |    CAST(sum(CAST(g.gij * w.w AS DECIMAL(38,18))) AS DOUBLE) AS m
             |  FROM g2 g JOIN wb${k - 1} w ON w.i = g.j GROUP BY g.i),
             |nrb$k AS (SELECT sqrt(CAST(sum(CAST(m * m AS DECIMAL(38,18)))
             |                          AS DOUBLE)) AS z FROM mvb$k),
             |wb$k AS (SELECT i, m / (SELECT z FROM nrb$k) AS w FROM mvb$k)"""
            .stripMargin).mkString(",\n")},
        |mvb6 AS (SELECT g.i,
        |    CAST(sum(CAST(g.gij * w.w AS DECIMAL(38,18))) AS DOUBLE) AS m
        |  FROM g2 g JOIN wb5 w ON w.i = g.j GROUP BY g.i),
        |rayb AS (SELECT CAST(sum(CAST(w.w * mv.m AS DECIMAL(38,18))) AS DOUBLE)
        |           AS lam
        |         FROM wb5 w JOIN mvb6 mv ON mv.i = w.i),
        |tr AS (SELECT CAST(sum(CAST(gij AS DECIMAL(38,18))) AS DOUBLE) AS t
        |       FROM g WHERE i = j),
        |dt AS (SELECT CAST(sum(CAST(a.w * b.w AS DECIMAL(38,18))) AS DOUBLE)
        |         AS d12
        |       FROM wa5 a JOIN wb5 b ON b.i = a.i)
        |SELECT round((SELECT lam FROM raya), 4) AS lambda1,
        |  round((SELECT lam FROM rayb), 4) AS lambda2,
        |  round((SELECT lam FROM rayb) / (SELECT lam FROM raya), 6)
        |    AS spectral_ratio,
        |  round((SELECT lam FROM raya) / (SELECT t FROM tr), 6) AS share1,
        |  round((SELECT lam FROM rayb) / (SELECT t FROM tr), 6) AS share2,
        |  round(abs((SELECT d12 FROM dt)), 6) AS v1_dot_v2,
        |  CAST(abs((SELECT d12 FROM dt)) < 1e-6 AS BOOLEAN) AS ortho_ok"""
        .stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val cells = emb.select(col("vec_id"), col("embedding"),
          posexplode(col("embedding")).as(Seq("pi", "vi")))
        .select(col("vec_id"), col("pi"), col("vi").cast("double").as("vi"),
          posexplode(col("embedding")).as(Seq("pj", "vj")))
        .select(col("pi"), col("pj"), col("vi"),
          col("vj").cast("double").as("vj"))
      val n0 = emb.agg(countDistinct(when(col("embedding").isNotNull
        && size(col("embedding")) > 0, col("vec_id"))).as("n"))
      val g = cells.groupBy("pi", "pj")
        .agg(sum(col("vi") * col("vj")).as("sxy"))
        .crossJoin(broadcast(n0))
        .select(col("pi"), col("pj"), (col("sxy") / col("n")).as("gij"))
        .localCheckpoint() // the d² Gram — both chains + trace read this
      val dims = g.select(col("pi")).distinct()
      val d0 = dims.agg(count(lit(1)).as("d"))
      val dec = (c: Column) => c.cast("decimal(38,18)")
      val w0 = dims.crossJoin(broadcast(d0))
        .select(col("pi").as("i"), (lit(1.0) / sqrt(col("d"))).as("w"))
        .localCheckpoint()
      def matvec(gf: DataFrame, wf: DataFrame) = gf
        .join(broadcast(wf.select(col("i").as("pj"), col("w"))), Seq("pj"))
        .groupBy(col("pi").as("i"))
        .agg(sum(dec(col("gij") * col("w"))).cast("double").as("m"))
      def power(gf: DataFrame): (DataFrame, DataFrame) = {
        var w = w0
        for (_ <- 1 to 5) {
          val mv = matvec(gf, w).localCheckpoint()
          val nrm = mv.agg(sqrt(sum(dec(col("m") * col("m"))).cast("double"))
            .as("z"))
          w = mv.crossJoin(broadcast(nrm))
            .select(col("i"), (col("m") / col("z")).as("w"))
            .localCheckpoint()
        }
        val mv6 = matvec(gf, w).localCheckpoint()
        val ray = w.join(mv6, Seq("i"))
          .agg(sum(dec(col("w") * col("m"))).cast("double").as("lam"))
          .localCheckpoint()
        (w, ray)
      }
      val (wa, raya) = power(g)
      val g2 = g
        .join(broadcast(wa.select(col("i").as("pi"), col("w").as("wi"))), Seq("pi"))
        .join(broadcast(wa.select(col("i").as("pj"), col("w").as("wj"))), Seq("pj"))
        .crossJoin(broadcast(raya.select(col("lam").as("lam1"))))
        .select(col("pi"), col("pj"),
          (col("gij") - col("lam1") * col("wi") * col("wj")).as("gij"))
        .localCheckpoint() // deflated Gram, d² rows
      val (wb, rayb) = power(g2)
      val tr = g.where(col("pi") === col("pj"))
        .agg(sum(dec(col("gij"))).cast("double").as("t"))
      val dt = wa.select(col("i"), col("w").as("w1"))
        .join(wb.select(col("i"), col("w").as("w2")), Seq("i"))
        .agg(sum(dec(col("w1") * col("w2"))).cast("double").as("d12"))
      raya.select(col("lam").as("lam1"))
        .crossJoin(broadcast(rayb.select(col("lam").as("lam2"))))
        .crossJoin(broadcast(tr)).crossJoin(broadcast(dt))
        .select(round(col("lam1"), 4).as("lambda1"),
          round(col("lam2"), 4).as("lambda2"),
          round(col("lam2") / col("lam1"), 6).as("spectral_ratio"),
          round(col("lam1") / col("t"), 6).as("share1"),
          round(col("lam2") / col("t"), 6).as("share2"),
          round(abs(col("d12")), 6).as("v1_dot_v2"),
          (abs(col("d12")) < 1e-6).as("ortho_ok"))
    },

    // ---- linear CKA: does int8 quantization preserve the REPRESENTATION? ----
    // q_embed_quantized answers per-vector fidelity (cosine, RMSE);
    // this answers the representation-level question a model owner
    // actually cares about: do the two embedding sets span the same
    // structure? Linear centered kernel alignment (Kornblith et al.
    // 2019): CKA = ‖C_xy‖²_F / (‖C_xx‖_F · ‖C_yy‖_F) over the
    // per-dim-centered features, X = raw embeddings, Y = their int8
    // dequantization (the q_embed_quantized scale convention,
    // 1e-300-floored). One cells self-join on vec_id builds ALL THREE
    // d² Grams in a single (i,j)-grouped aggregation — the q_pca_top2
    // plan class (corpus×d² work, d-row broadcast means, never
    // pairwise in n); Frobenius norms are DECIMAL-accumulated squares
    // of the d² frame. CKA ∈ [0,1]; ≈1 here — the quantization-
    // fidelity readout at the structure level.
    sql(
      "q_embed_cka",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))) / 127,
        |                 1e-300) AS scale
        |      FROM e),
        |c0 AS (SELECT vec_id, i, CAST(v[i] AS DOUBLE) AS x,
        |         floor(v[i] / scale + 0.5) * scale AS y
        |       FROM s, unnest(generate_series(1, len(v))) t(i)),
        |m AS (SELECT i,
        |        CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS mx,
        |        CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS my
        |      FROM c0 GROUP BY i),
        |c AS (SELECT c0.vec_id, c0.i, c0.x - m.mx AS xc, c0.y - m.my AS yc
        |      FROM c0 JOIN m ON m.i = c0.i),
        |g AS (SELECT a.i AS i, b.i AS j,
        |        sum(a.xc * b.xc) AS gxx,
        |        sum(a.xc * b.yc) AS gxy,
        |        sum(a.yc * b.yc) AS gyy
        |      FROM c a JOIN c b ON a.vec_id = b.vec_id
        |      GROUP BY a.i, b.i),
        |f AS (SELECT
        |        CAST(sum(CAST(gxy * gxy AS DECIMAL(38,18))) AS DOUBLE) AS hxy,
        |        CAST(sum(CAST(gxx * gxx AS DECIMAL(38,18))) AS DOUBLE) AS hxx,
        |        CAST(sum(CAST(gyy * gyy AS DECIMAL(38,18))) AS DOUBLE) AS hyy
        |      FROM g),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM e)
        |SELECT n_vecs, 64 AS dim,
        |  round(hxy / sqrt(hxx * hyy), 6) AS cka,
        |  round(sqrt(hxx), 4) AS norm_xx, round(sqrt(hyy), 4) AS norm_yy
        |FROM f, n""".stripMargin) { (s, dir) =>
      def dsum(c: Column) = sum(c.cast("decimal(38,18)")).cast("double")
      val e = t(s, dir, "embeddings")
        // r13 (guide §2.5): same serial-scan fix as q_geometric_median
        // — the d² Gram expansion below reads this via a cache that
        // would otherwise hold one partition
        .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
          col("vec_id"))
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val scale = greatest(aggregate(transform(col("v"), x => abs(x)), lit(0.0),
        (m, x) => greatest(m, x)) / 127, lit(1e-300)).as("scale")
      val c0 = e.select(col("vec_id"), col("v"), scale)
        .select(col("vec_id"), col("scale"),
          posexplode(col("v")).as(Seq("p", "x")))
        .select(col("vec_id"), (col("p") + 1).as("i"), col("x"),
          (floor(col("x") / col("scale") + 0.5) * col("scale")).as("y"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val m = c0.groupBy("i").agg(
        (dsum(col("x")) / count(lit(1))).as("mx"),
        (dsum(col("y")) / count(lit(1))).as("my"))
      val c = c0.join(broadcast(m), "i")
        .select(col("vec_id"), col("i"),
          (col("x") - col("mx")).as("xc"), (col("y") - col("my")).as("yc"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val a = c.select(col("vec_id"), col("i"), col("xc").as("xa"), col("yc").as("ya"))
      val b = c.select(col("vec_id"), col("i").as("j"), col("xc").as("xb"), col("yc").as("yb"))
      // Gram sums stay DOUBLE (the q_pca_top2 convention): the d²
      // expansion is the hot corpus×d² stage and Int128 accumulation
      // there measured 27.7 s vs ~3 s; summation jitter is ~1e-13
      // relative on both engines and the output rounds at 6. The
      // 4096-row Frobenius stage below keeps DECIMAL accumulation.
      val g = a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(sum(col("xa") * col("xb")).as("gxx"),
          sum(col("xa") * col("yb")).as("gxy"),
          sum(col("ya") * col("yb")).as("gyy"))
      val f = g.agg(dsum(col("gxy") * col("gxy")).as("hxy"),
        dsum(col("gxx") * col("gxx")).as("hxx"),
        dsum(col("gyy") * col("gyy")).as("hyy"))
      val n = e.agg(count(lit(1)).as("n_vecs"))
      f.crossJoin(broadcast(n))
        .select(col("n_vecs"), lit(64).as("dim"),
          round(col("hxy") / sqrt(col("hxx") * col("hyy")), 6).as("cka"),
          round(sqrt(col("hxx")), 4).as("norm_xx"),
          round(sqrt(col("hyy")), 4).as("norm_yy"))
    },

    // ---- geometric median of the embedding cloud (2 Weiszfeld rounds) ----
    // The ROBUST center next to q_embed_centroids' mean: the point
    // minimizing Σ‖v − x‖ — outlier embeddings (corrupt docs, wrong-
    // modality rows) drag a mean arbitrarily far but barely move the
    // geometric median, so this is the center a drift monitor or a
    // whitening step should anchor on. Two Weiszfeld (1937) rounds
    // from the mean: x' = Σ(v/d) / Σ(1/d), d = ‖v − x‖; coincident
    // points (d = 0) are skipped (the standard practical guard). The
    // objective Σd is evaluated at all three iterates and its descent
    // rides as data. Numerics: sqrt is IEEE-exact so distances are
    // cross-engine bitwise given exact inputs; every 64-term and
    // corpus-sized sum accumulates DECIMAL(38,18) (order-proof); the
    // per-row v/d divisions are identical doubles. Scale: each round
    // is one corpus×64 cell pass joined with a 64-row broadcast center
    // — k·d work per vector, no pairwise anything.
    sql(
      "q_geometric_median",
      """WITH x AS (SELECT vec_id, i, CAST(emb[i] AS DOUBLE) AS v
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS emb,
        |          unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings)),
        |nv AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM x),
        |x0 AS (SELECT i, CAST(sum(CAST(v AS DECIMAL(38,18))) AS DOUBLE)
        |                 / count(*) AS c FROM x GROUP BY i),
        |d1 AS (SELECT x.vec_id, sqrt(CAST(sum(CAST((x.v - x0.c) * (x.v - x0.c)
        |          AS DECIMAL(38,18))) AS DOUBLE)) AS d
        |       FROM x JOIN x0 ON x0.i = x.i GROUP BY x.vec_id),
        |o0 AS (SELECT CAST(sum(CAST(d AS DECIMAL(38,18))) AS DOUBLE) AS obj FROM d1),
        |n1 AS (SELECT x.i, CAST(sum(CAST(x.v / d1.d AS DECIMAL(38,18))) AS DOUBLE) AS num
        |       FROM x JOIN d1 USING (vec_id) WHERE d1.d > 0 GROUP BY x.i),
        |dn1 AS (SELECT CAST(sum(CAST(1e0 / d AS DECIMAL(38,18))) AS DOUBLE) AS den
        |        FROM d1 WHERE d > 0),
        |x1 AS (SELECT i, num / (SELECT den FROM dn1) AS c FROM n1),
        |d2 AS (SELECT x.vec_id, sqrt(CAST(sum(CAST((x.v - x1.c) * (x.v - x1.c)
        |          AS DECIMAL(38,18))) AS DOUBLE)) AS d
        |       FROM x JOIN x1 ON x1.i = x.i GROUP BY x.vec_id),
        |o1 AS (SELECT CAST(sum(CAST(d AS DECIMAL(38,18))) AS DOUBLE) AS obj FROM d2),
        |n2 AS (SELECT x.i, CAST(sum(CAST(x.v / d2.d AS DECIMAL(38,18))) AS DOUBLE) AS num
        |       FROM x JOIN d2 USING (vec_id) WHERE d2.d > 0 GROUP BY x.i),
        |dn2 AS (SELECT CAST(sum(CAST(1e0 / d AS DECIMAL(38,18))) AS DOUBLE) AS den
        |        FROM d2 WHERE d > 0),
        |x2 AS (SELECT i, num / (SELECT den FROM dn2) AS c FROM n2),
        |d3 AS (SELECT x.vec_id, sqrt(CAST(sum(CAST((x.v - x2.c) * (x.v - x2.c)
        |          AS DECIMAL(38,18))) AS DOUBLE)) AS d
        |       FROM x JOIN x2 ON x2.i = x.i GROUP BY x.vec_id),
        |o2 AS (SELECT CAST(sum(CAST(d AS DECIMAL(38,18))) AS DOUBLE) AS obj FROM d3),
        |cc AS (SELECT max(CASE WHEN i = 1 THEN c END) AS c1,
        |              max(CASE WHEN i = 2 THEN c END) AS c2,
        |              max(CASE WHEN i = 3 THEN c END) AS c3,
        |              max(CASE WHEN i = 4 THEN c END) AS c4
        |       FROM x2)
        |SELECT (SELECT n FROM nv) AS n_vecs,
        |  round((SELECT obj FROM o0), 4) AS obj_mean,
        |  round((SELECT obj FROM o1), 4) AS obj_w1,
        |  round((SELECT obj FROM o2), 4) AS obj_w2,
        |  (SELECT obj FROM o1) <= (SELECT obj FROM o0) + 1e-9 AS descent1,
        |  (SELECT obj FROM o2) <= (SELECT obj FROM o1) + 1e-9 AS descent2,
        |  round(c1, 6) + 0.0 AS c1, round(c2, 6) + 0.0 AS c2,
        |  round(c3, 6) + 0.0 AS c3, round(c4, 6) + 0.0 AS c4
        |FROM cc""".stripMargin) { (s, dir) =>
      def dsum(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,18)")).cast("double")
      val x = t(s, dir, "embeddings")
        // r13 (guide §2.5): hash-repartition the vectors before the
        // 64-way cell explode — the one-task scan otherwise leaves a
        // single-partition cache and every Weiszfeld pass (2 per
        // round × 3 objective reads) walks 128k cells single-threaded
        .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
          col("vec_id"))
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "v0")))
        .select(col("vec_id"), (col("p") + 1).as("i"),
          col("v0").cast("double").as("v"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      // (distance pass, numerator pass) per round against a 64-row
      // broadcast center; d frames are corpus-keyed and feed both the
      // objective and the next numerators — checkpoint each
      def distances(ctr: org.apache.spark.sql.DataFrame) = x
        .join(broadcast(ctr), "i")
        .groupBy("vec_id")
        .agg(sqrt(dsum((col("v") - col("c")) * (col("v") - col("c")))).as("d"))
        .localCheckpoint()
      def objective(d: org.apache.spark.sql.DataFrame) =
        d.agg(dsum(col("d")).as("obj"))
      def step(d: org.apache.spark.sql.DataFrame) = {
        val num = x.join(d, "vec_id").where(col("d") > 0)
          .groupBy("i").agg(dsum(col("v") / col("d")).as("num"))
        val den = d.where(col("d") > 0).agg(dsum(lit(1.0) / col("d")).as("den"))
        num.crossJoin(broadcast(den))
          .select(col("i"), (col("num") / col("den")).as("c"))
          .localCheckpoint() // 64 rows; broadcast into the next passes
      }
      val x0 = x.groupBy("i")
        .agg((sum(col("v").cast("decimal(38,18)")).cast("double")
          / count(lit(1))).as("c"))
        .localCheckpoint()
      val d1 = distances(x0)
      val x1 = step(d1)
      val d2 = distances(x1)
      val x2 = step(d2)
      val d3 = distances(x2)
      val nv = x.agg(countDistinct("vec_id").as("n"))
      val cc = x2.agg(
        max(when(col("i") === 1, col("c"))).as("c1"),
        max(when(col("i") === 2, col("c"))).as("c2"),
        max(when(col("i") === 3, col("c"))).as("c3"),
        max(when(col("i") === 4, col("c"))).as("c4"))
      objective(d1).select(col("obj").as("o0"))
        .crossJoin(broadcast(objective(d2).select(col("obj").as("o1"))))
        .crossJoin(broadcast(objective(d3).select(col("obj").as("o2"))))
        .crossJoin(broadcast(nv)).crossJoin(broadcast(cc))
        .select(col("n").as("n_vecs"),
          round(col("o0"), 4).as("obj_mean"),
          round(col("o1"), 4).as("obj_w1"),
          round(col("o2"), 4).as("obj_w2"),
          (col("o1") <= col("o0") + 1e-9).as("descent1"),
          (col("o2") <= col("o1") + 1e-9).as("descent2"),
          (round(col("c1"), 6) + 0.0).as("c1"),
          (round(col("c2"), 6) + 0.0).as("c2"),
          (round(col("c3"), 6) + 0.0).as("c3"),
          (round(col("c4"), 6) + 0.0).as("c4"))
    },

    // ---- multi-probe sign-LSH retrieval (Hamming-1 bucket probing) ----
    // The standard production fix for LSH's recall cliff (Lv et al.
    // 2007): instead of widening the index (more tables = more
    // memory), probe the query's OWN bucket plus its 8 Hamming-1
    // neighbors — near-misses land in buckets differing by one sign
    // bit far more often than chance. This query runs BOTH retrievals
    // against the same exact-cosine truth and reports recall@10 and
    // candidate volume side by side — the recall-vs-cost tradeoff
    // table an ANN operator reads before picking a probe width. Same
    // md5-capped ≤128-probe core as q_map_at_k (corpus-linear by
    // construction); the multi-probe candidate join is an EQUI-join on
    // bucket after a 9-way probe-list explode — at 100 TB the bucket
    // index is hash-partitioned once and each probe is a lookup, never
    // a scan.
    sql(
      "q_knn_multiprobe",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |                  list_sum(list_transform(range(0, 8),
        |                    i -> CASE WHEN embedding[i+1] > 0
        |                              THEN (1::BIGINT << i) ELSE 0 END)) AS bkt
        |           FROM embeddings),
        |qs AS (SELECT qid, v, bkt FROM (
        |    SELECT vec_id AS qid, v, bkt,
        |      row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
        |        AS pr
        |    FROM e WHERE vec_id % 25 = 0) WHERE pr <= 128),
        |probes AS (SELECT qid, v, CASE WHEN i = 0 THEN bkt
        |                               ELSE xor(bkt, 1::BIGINT << (i - 1))
        |                          END AS pbkt
        |           FROM qs, range(0, 9) t(i)),
        |tr AS (SELECT qid, cid FROM (
        |    SELECT q.qid, c.vec_id AS cid,
        |      row_number() OVER (PARTITION BY q.qid
        |        ORDER BY round($cosineSql, 6) DESC, c.vec_id) AS rn
        |    FROM qs q JOIN e c ON c.vec_id <> q.qid)
        |  WHERE rn <= 10),
        |s1 AS (SELECT qid, cid FROM (
        |    SELECT q.qid, c.vec_id AS cid,
        |      row_number() OVER (PARTITION BY q.qid
        |        ORDER BY round($cosineSql, 6) DESC, c.vec_id) AS rn
        |    FROM qs q JOIN e c ON c.bkt = q.bkt AND c.vec_id <> q.qid)
        |  WHERE rn <= 10),
        |mc AS (SELECT DISTINCT p.qid, p.v, c.vec_id AS cid, c.v AS cv
        |       FROM probes p JOIN e c ON c.bkt = p.pbkt
        |       WHERE c.vec_id <> p.qid),
        |sm AS (SELECT qid, cid FROM (
        |    SELECT q.qid, q.cid,
        |      row_number() OVER (PARTITION BY q.qid
        |        ORDER BY round(list_dot_product(q.v, q.cv)
        |          / sqrt(list_dot_product(q.v, q.v)
        |               * list_dot_product(q.cv, q.cv)), 6)
        |          DESC, q.cid) AS rn
        |    FROM mc q)
        |  WHERE rn <= 10),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS cand_single
        |       FROM qs q JOIN e c ON c.bkt = q.bkt AND c.vec_id <> q.qid),
        |nm AS (SELECT CAST(count(*) AS BIGINT) AS cand_multi FROM mc),
        |h1 AS (SELECT CAST(count(*) AS BIGINT) AS hits_single
        |       FROM s1 JOIN tr USING (qid, cid)),
        |hm AS (SELECT CAST(count(*) AS BIGINT) AS hits_multi
        |       FROM sm JOIN tr USING (qid, cid)),
        |nq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qs)
        |SELECT n AS n_queries,
        |  round(CAST(hits_single AS DOUBLE) / (n * 10), 6) AS recall_single,
        |  round(CAST(hits_multi AS DOUBLE) / (n * 10), 6) AS recall_multiprobe,
        |  cand_single, cand_multi,
        |  round(CAST(cand_multi AS DOUBLE) / cand_single, 4) AS cost_ratio
        |FROM nq, h1, hm, n1, nm""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"),
          signBucket(asDouble(col("embedding"))).as("bkt"))
      val qs = e.where(col("vec_id") % 25 === 0)
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(128)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("bkt").as("qb"))
        .localCheckpoint() // probe set feeds truth, single, multi, count
      val c = e.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("bkt").as("cb"))
      val w = Window.partitionBy("qid").orderBy(desc("sim"), col("cid"))
      val tr = qs.join(c, col("cid") =!= col("qid"))
        .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10)
        .select(col("qid").as("tqid"), col("cid").as("tcid"))
        .localCheckpoint() // truth joined by both retrieval arms
      val single = qs.join(c, col("cb") === col("qb") && col("cid") =!= col("qid"))
        .localCheckpoint() // candidate frame feeds count + ranking
      val s1 = single
        .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10).select("qid", "cid")
      // probe list: own bucket + the 8 Hamming-1 neighbors, exploded
      // into an EQUI-join key (the scale path — no IN-list scan)
      val probeBkts = qs.select(col("qid"), col("qv"), col("qb"),
          explode(sequence(lit(0), lit(8))).as("i"))
        .select(col("qid"), col("qv"),
          when(col("i") === 0, col("qb"))
            .otherwise(expr("qb ^ shiftleft(1L, i - 1)")).as("pbkt"))
      val mc = probeBkts
        .join(c, col("cb") === col("pbkt") && col("cid") =!= col("qid"))
        .select("qid", "qv", "cid", "cv").distinct()
        .localCheckpoint() // multi-probe candidates: count + ranking
      val sm = mc
        .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10).select("qid", "cid")
      val n1 = single.agg(count(lit(1)).as("cand_single"))
      val nm = mc.agg(count(lit(1)).as("cand_multi"))
      val h1 = s1.join(tr, col("tqid") === col("qid")
        && col("tcid") === col("cid")).agg(count(lit(1)).as("hits_single"))
      val hm = sm.join(tr, col("tqid") === col("qid")
        && col("tcid") === col("cid")).agg(count(lit(1)).as("hits_multi"))
      val nq = qs.agg(count(lit(1)).as("n"))
      nq.crossJoin(broadcast(h1)).crossJoin(broadcast(hm))
        .crossJoin(broadcast(n1)).crossJoin(broadcast(nm))
        .select(col("n").as("n_queries"),
          round(col("hits_single").cast("double") / (col("n") * 10), 6)
            .as("recall_single"),
          round(col("hits_multi").cast("double") / (col("n") * 10), 6)
            .as("recall_multiprobe"),
          col("cand_single"), col("cand_multi"),
          round(col("cand_multi").cast("double") / col("cand_single"), 4)
            .as("cost_ratio"))
    },

    // ---- NDCG@10 of the sign-LSH retrieval (graded ranking eval) ----
    // MAP (below) treats every true neighbor as equally relevant;
    // NDCG grades them — a retrieved doc that was the probe's TRUE
    // NEAREST neighbor is worth more than its 10th. Gain = 11 − (exact
    // cosine truth rank); DCG discounts by 1/log₂(r+1); IDCG is the
    // probe's own ideal ordering, so NDCG∈[0,1] and equals 1 iff the
    // bucket ranking reproduces the exact top-10 in order. Same
    // md5-capped ≤128-probe core as q_map_at_k (the eval stays
    // corpus-linear). Cross-engine determinism: the 10 discount
    // weights are PINNED 9-decimal literals shared by both engines
    // (log2() is a transcendental whose last ulp is libm-specific —
    // the HLL/bin() lesson), and per-probe sums run in rank order
    // through a cumulative window, so every double op sees bitwise-
    // identical inputs in the same order on both sides.
    sql(
      "q_ndcg_at_k",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |                  list_sum(list_transform(range(0, 8),
        |                    i -> CASE WHEN embedding[i+1] > 0
        |                              THEN (1::BIGINT << i) ELSE 0 END)) AS bkt
        |           FROM embeddings),
        |qs AS (SELECT qid, v, bkt FROM (
        |    SELECT vec_id AS qid, v, bkt,
        |      row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
        |        AS pr
        |    FROM e WHERE vec_id % 25 = 0) WHERE pr <= 128),
        |wd AS (SELECT * FROM (VALUES (1, 1.0e0), (2, 0.630929754e0),
        |    (3, 0.5e0), (4, 0.430676558e0), (5, 0.386852807e0),
        |    (6, 0.356207187e0), (7, 0.333333333e0), (8, 0.315464877e0),
        |    (9, 0.301029996e0), (10, 0.289064826e0)) t(rn, w)),
        |tr AS (SELECT qid, cid, rn AS trank FROM (
        |    SELECT q.qid, c.vec_id AS cid,
        |      row_number() OVER (PARTITION BY q.qid
        |        ORDER BY round($cosineSql, 6) DESC, c.vec_id) AS rn
        |    FROM qs q JOIN e c ON c.vec_id <> q.qid)
        |  WHERE rn <= 10),
        |rv AS (SELECT qid, cid, rn FROM (
        |    SELECT q.qid, c.vec_id AS cid,
        |      row_number() OVER (PARTITION BY q.qid
        |        ORDER BY round($cosineSql, 6) DESC, c.vec_id) AS rn
        |    FROM qs q JOIN e c ON c.bkt = q.bkt AND c.vec_id <> q.qid)
        |  WHERE rn <= 10),
        |dg AS (SELECT r.qid,
        |    sum(CASE WHEN t.trank IS NOT NULL THEN (11 - t.trank) * wd.w
        |             ELSE 0e0 END) OVER (PARTITION BY r.qid ORDER BY r.rn
        |      ROWS UNBOUNDED PRECEDING) AS dcg,
        |    row_number() OVER (PARTITION BY r.qid ORDER BY r.rn DESC) AS lastr
        |  FROM rv r JOIN wd ON wd.rn = r.rn
        |  LEFT JOIN tr t ON t.qid = r.qid AND t.cid = r.cid),
        |dcgq AS (SELECT qid, dcg FROM dg WHERE lastr = 1),
        |ig AS (SELECT t.qid,
        |    sum((11 - t.trank) * wd.w) OVER (PARTITION BY t.qid
        |      ORDER BY t.trank ROWS UNBOUNDED PRECEDING) AS idcg,
        |    row_number() OVER (PARTITION BY t.qid ORDER BY t.trank DESC) AS lastr
        |  FROM tr t JOIN wd ON wd.rn = t.trank),
        |idcgq AS (SELECT qid, idcg FROM ig WHERE lastr = 1),
        |nd AS (SELECT q.qid,
        |    coalesce(d.dcg, 0e0) AS dcg, i.idcg,
        |    CASE WHEN i.idcg > 0 THEN coalesce(d.dcg, 0e0) / i.idcg
        |         ELSE 0e0 END AS ndcg
        |  FROM (SELECT qid FROM qs) q
        |  LEFT JOIN dcgq d ON d.qid = q.qid
        |  JOIN idcgq i ON i.qid = q.qid),
        |nq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qs)
        |SELECT (SELECT n FROM nq) AS n_queries,
        |  round(CAST(sum(CAST(ndcg AS DECIMAL(28,12))) AS DOUBLE)
        |        / (SELECT n FROM nq), 6) AS mean_ndcg_at10,
        |  CAST(sum(CASE WHEN ndcg >= 0.999999 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS perfect_queries,
        |  round(CAST(sum(CAST(dcg AS DECIMAL(28,12))) AS DOUBLE)
        |        / (SELECT n FROM nq), 4) AS mean_dcg_at10
        |FROM nd""".stripMargin) { (s, dir) =>
      // the q_map_at_k probe/truth core, verbatim (lambda-capture
      // convention: derive HOF lambdas from the raw column)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"),
          signBucket(asDouble(col("embedding"))).as("bkt"))
      val qs = e.where(col("vec_id") % 25 === 0)
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(128)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("bkt").as("qb"))
      val c = e.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("bkt").as("cb"))
      val w = Window.partitionBy("qid").orderBy(desc("sim"), col("cid"))
      val tr = qs.join(c, col("cid") =!= col("qid"))
        .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("trank", row_number().over(w))
        .where(col("trank") <= 10)
        .select(col("qid").as("tqid"), col("cid").as("tcid"), col("trank"))
        .localCheckpoint() // truth feeds the DCG join AND the IDCG
      val rv = qs.join(c, col("cb") === col("qb") && col("cid") =!= col("qid"))
        .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10).select("qid", "cid", "rn")
      // the 10 discount weights as a broadcast literal frame — the
      // SAME 9-decimal constants as the oracle's VALUES table
      import s.implicits._
      val wd = broadcast(Seq(
        (1, 1.0), (2, 0.630929754), (3, 0.5), (4, 0.430676558),
        (5, 0.386852807), (6, 0.356207187), (7, 0.333333333),
        (8, 0.315464877), (9, 0.301029996), (10, 0.289064826))
        .toDF("wrn", "w"))
      // per-probe DCG: cumulative window in rank order = sequential
      // left-to-right double summation, same order both engines
      val wCum = Window.partitionBy("qid").orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wLast = Window.partitionBy("qid").orderBy(desc("rn"))
      val dg = rv.join(wd, col("wrn") === col("rn"))
        .join(tr, col("tqid") === col("qid") && col("tcid") === col("cid"),
          "left")
        .select(col("qid"), col("rn"),
          when(col("trank").isNotNull, (lit(11) - col("trank")) * col("w"))
            .otherwise(0.0).as("g"))
        .withColumn("dcg", sum("g").over(wCum))
        .withColumn("lastr", row_number().over(wLast))
        .where(col("lastr") === 1).select("qid", "dcg")
      val wCumI = Window.partitionBy("tqid").orderBy("trank")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wLastI = Window.partitionBy("tqid").orderBy(desc("trank"))
      val ig = tr.join(wd, col("wrn") === col("trank"))
        .select(col("tqid"), col("trank"),
          ((lit(11) - col("trank")) * col("w")).as("g"))
        .withColumn("idcg", sum("g").over(wCumI))
        .withColumn("lastr", row_number().over(wLastI))
        .where(col("lastr") === 1).select(col("tqid"), col("idcg"))
      val nd = qs.select(col("qid"))
        .join(dg, Seq("qid"), "left")
        .join(ig.withColumnRenamed("tqid", "qid"), Seq("qid"))
        .select(col("qid"), coalesce(col("dcg"), lit(0.0)).as("dcg"),
          when(col("idcg") > 0,
            coalesce(col("dcg"), lit(0.0)) / col("idcg"))
            .otherwise(0.0).as("ndcg"))
      val nq = qs.agg(count(lit(1)).as("n"))
      nd.agg(sum(col("ndcg").cast("decimal(28,12)")).cast("double").as("sn"),
          sum(when(col("ndcg") >= 0.999999, 1L).otherwise(0L))
            .as("perfect_queries"),
          sum(col("dcg").cast("decimal(28,12)")).cast("double").as("sd"))
        .crossJoin(broadcast(nq))
        .select(col("n").as("n_queries"),
          round(col("sn") / col("n"), 6).as("mean_ndcg_at10"),
          col("perfect_queries"),
          round(col("sd") / col("n"), 4).as("mean_dcg_at10"))
    },

    // ---- MAP@10 of the sign-LSH retrieval vs exact ground truth ----
    // The ranking-quality closer of the ANN ladder: recall flags say
    // WHETHER the neighbors were found; mean average precision says
    // WHERE in the list. Truth = exact cosine top-10 per probe (the
    // q_knn_bruteforce shape — bounded probe set × corpus), retrieved
    // = the sign-LSH bucket ranking's top-10; AP@10 per probe from
    // the running-precision window, averaged over ALL probes (an
    // empty bucket scores 0, not skipped). Fully oracle-replicable —
    // both rankings are deterministic SQL.
    sql(
      "q_map_at_k",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |                  list_sum(list_transform(range(0, 8),
        |                    i -> CASE WHEN embedding[i+1] > 0
        |                              THEN (1::BIGINT << i) ELSE 0 END)) AS bkt
        |           FROM embeddings),
        |qs AS (SELECT qid, v, bkt FROM (
        |    SELECT vec_id AS qid, v, bkt,
        |      row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
        |        AS pr
        |    FROM e WHERE vec_id % 25 = 0) WHERE pr <= 128),
        |tr AS (SELECT qid, cid FROM (
        |    SELECT q.qid, c.vec_id AS cid,
        |      row_number() OVER (PARTITION BY q.qid
        |        ORDER BY round($cosineSql, 6) DESC, c.vec_id) AS rn
        |    FROM qs q JOIN e c ON c.vec_id <> q.qid)
        |  WHERE rn <= 10),
        |rv AS (SELECT qid, cid, rn FROM (
        |    SELECT q.qid, c.vec_id AS cid,
        |      row_number() OVER (PARTITION BY q.qid
        |        ORDER BY round($cosineSql, 6) DESC, c.vec_id) AS rn
        |    FROM qs q JOIN e c ON c.bkt = q.bkt AND c.vec_id <> q.qid)
        |  WHERE rn <= 10),
        |rel AS (SELECT r.qid, r.rn,
        |    CASE WHEN t.cid IS NOT NULL THEN 1 ELSE 0 END AS rel
        |  FROM rv r LEFT JOIN tr t ON t.qid = r.qid AND t.cid = r.cid),
        |pr AS (SELECT qid, rn, rel,
        |    CAST(sum(rel) OVER (PARTITION BY qid ORDER BY rn
        |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / rn AS prec
        |  FROM rel),
        |ap AS (SELECT qid,
        |    CAST(sum(CAST(rel * prec AS DECIMAL(28,12))) AS DOUBLE) / 10.0 AS ap,
        |    CAST(sum(rel) AS BIGINT) AS hits
        |  FROM pr GROUP BY 1),
        |nq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qs)
        |SELECT (SELECT n FROM nq) AS n_queries,
        |  round(CAST(sum(CAST(ap AS DECIMAL(28,12))) AS DOUBLE)
        |        / (SELECT n FROM nq), 6) AS map_at10,
        |  round(CAST(sum(hits) AS DOUBLE) / ((SELECT n FROM nq) * 10), 6)
        |    AS recall_at10,
        |  CAST(sum(CASE WHEN ap >= 0.999999 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS perfect_queries
        |FROM ap""".stripMargin) { (s, dir) =>
      // ONE projection off the raw column: signBucket's lambda
      // captures its argument, and capturing a PROJECTED alias across
      // a collapsed projection goes stale under this query's nested
      // self-joins (ATTRIBUTE_NOT_FOUND at bind time — the NOTES
      // outer-lambda pitfall). Derived from `embedding` directly,
      // the capture survives every re-alias.
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"),
          signBucket(asDouble(col("embedding"))).as("bkt"))
      // md5-capped probe set (<=128 at ANY corpus size — the
      // q_embed_mmd cap): the truth stage is probes × corpus, so an
      // uncapped %25 probe population would make the eval itself
      // super-linear (measured 9.2× at the 10× decade before the cap)
      // sort+limit = TakeOrdered (per-partition top-k merge), not a
      // single-task global rank window
      val qs = e.where(col("vec_id") % 25 === 0)
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(128)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("bkt").as("qb"))
      val c = e.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("bkt").as("cb"))
      val w = Window.partitionBy("qid").orderBy(desc("sim"), col("cid"))
      val tr = qs.join(c, col("cid") =!= col("qid"))
        .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10).select(col("qid").as("tqid"),
          col("cid").as("tcid"))
      val rv = qs.join(c, col("cb") === col("qb") && col("cid") =!= col("qid"))
        .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10).select("qid", "cid", "rn")
      val rel = rv.join(tr, col("tqid") === col("qid")
          && col("tcid") === col("cid"), "left")
        .select(col("qid"), col("rn"),
          when(col("tcid").isNotNull, 1L).otherwise(0L).as("rel"))
      val wCum = Window.partitionBy("qid").orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
      val pr = rel.withColumn("prec",
        sum("rel").over(wCum).cast("double") / col("rn"))
      val ap = pr.groupBy("qid")
        .agg((sum((col("rel") * col("prec")).cast("decimal(28,12)"))
          .cast("double") / 10.0).as("ap"),
          sum("rel").cast("long").as("hits"))
      val nq = qs.agg(count(lit(1)).as("n"))
      ap.agg(sum(col("ap").cast("decimal(28,12)")).cast("double").as("sap"),
          sum("hits").cast("long").as("shits"),
          sum(when(col("ap") >= 0.999999, 1L).otherwise(0L))
            .as("perfect_queries"))
        .crossJoin(broadcast(nq))
        .select(col("n").as("n_queries"),
          round(col("sap") / col("n"), 6).as("map_at10"),
          round(col("shits").cast("double") / (col("n") * 10), 6)
            .as("recall_at10"),
          col("perfect_queries"))
    },

    // ---- SemDeDup: semantic dedup inside k-means clusters ----
    // Abbas et al. 2023 ("SemDeDup: data-efficient learning at
    // web-scale through semantic deduplication"): cluster the
    // embeddings, then deduplicate ONLY within clusters — candidate
    // pairs are cluster-bounded, and k scales with n so cluster sizes
    // stay constant (the paper's own scaling argument; the third
    // bounded-candidate shape in this repo next to LSH bands and
    // DBSCAN cells). Clustering is `q_kmeans_lloyd`'s deterministic
    // assignment VERBATIM (md5-ordered seeds, 2 Lloyd rounds,
    // DECIMAL(38,18) centroid means, round(dist,6) ties to the lower
    // cluster) so the two queries' cluster populations must agree —
    // AccuracySpec pins that equality. Within a cluster the keep rule
    // is the paper's scan made deterministic: a vector is DROPPED iff
    // some LOWER-id cluster-mate has cosine ≥ τ = 0.35 (the
    // q_embed_neardup corpus threshold; cosine rounded to 6dp before
    // the comparison so no cross-engine ulp can flip a boundary pair).
    // The min-id vector of every cluster is kept by construction.
    // 100-TB story: one embeddings pass to assign (k×d broadcast
    // centroids), pair generation is an equi-join on cluster with
    // per-cluster volume (n/k)² held constant by k ∝ n.
    sql(
      "q_semdedup",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c0 AS (SELECT cluster, c FROM
        |         (SELECT row_number() OVER
        |            (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cluster,
        |            v AS c FROM e) WHERE cluster < 8),
        |d1 AS (SELECT e.vec_id, e.v, c.cluster,
        |          round(list_dot_product(e.v, e.v)
        |                - 2e0 * list_dot_product(e.v, c.c)
        |                + list_dot_product(c.c, c.c), 6) AS dist
        |        FROM e CROSS JOIN c0 c),
        |a1 AS (SELECT vec_id, v, cluster FROM
        |         (SELECT *, row_number() OVER
        |            (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        |          FROM d1) WHERE rn = 1),
        |x1 AS (SELECT cluster, i,
        |         CAST(sum(CAST(v[i] AS DECIMAL(38,18))) AS DOUBLE)
        |           / count(*) AS cx
        |       FROM a1, unnest(generate_series(1, len(v))) AS t(i)
        |       GROUP BY 1, 2),
        |c1 AS (SELECT cluster, list(cx ORDER BY i) AS c FROM x1 GROUP BY 1),
        |d2 AS (SELECT e.vec_id, e.v, c.cluster,
        |          round(list_dot_product(e.v, e.v)
        |                - 2e0 * list_dot_product(e.v, c.c)
        |                + list_dot_product(c.c, c.c), 6) AS dist
        |        FROM e CROSS JOIN c1 c),
        |a2 AS (SELECT vec_id, v, cluster FROM
        |         (SELECT *, row_number() OVER
        |            (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        |          FROM d2) WHERE rn = 1),
        |x2 AS (SELECT cluster, i,
        |         CAST(sum(CAST(v[i] AS DECIMAL(38,18))) AS DOUBLE)
        |           / count(*) AS cx
        |       FROM a2, unnest(generate_series(1, len(v))) AS t(i)
        |       GROUP BY 1, 2),
        |c2 AS (SELECT cluster, list(cx ORDER BY i) AS c FROM x2 GROUP BY 1),
        |d3 AS (SELECT e.vec_id, e.v, c.cluster,
        |          round(list_dot_product(e.v, e.v)
        |                - 2e0 * list_dot_product(e.v, c.c)
        |                + list_dot_product(c.c, c.c), 6) AS dist
        |        FROM e CROSS JOIN c2 c),
        |a3 AS (SELECT vec_id, v, cluster FROM
        |         (SELECT *, row_number() OVER
        |            (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        |          FROM d3) WHERE rn = 1),
        |p AS (SELECT x.cluster, x.vec_id,
        |        max(CASE WHEN round(list_dot_product(x.v, y.v)
        |                / sqrt(list_dot_product(x.v, x.v)
        |                       * list_dot_product(y.v, y.v)), 6) >= 0.35
        |              THEN 1 ELSE 0 END) AS dropped
        |      FROM a3 x JOIN a3 y ON y.cluster = x.cluster
        |                         AND y.vec_id < x.vec_id
        |      GROUP BY 1, 2),
        |k AS (SELECT a3.cluster, a3.vec_id, coalesce(p.dropped, 0) AS dropped
        |      FROM a3 LEFT JOIN p ON p.vec_id = a3.vec_id)
        |SELECT CAST(cluster AS INT) AS cluster,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(dropped) AS BIGINT) AS n_dropped,
        |  CAST(count(*) - sum(dropped) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN dropped = 0 THEN vec_id ELSE 0 END) AS BIGINT)
        |    AS kept_id_sum,
        |  round(CAST(sum(dropped) AS DOUBLE) / count(*), 6) AS drop_rate
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .cache() // seed scan + one full pass per round + the pair join
      // --- q_kmeans_lloyd's deterministic assignment, verbatim ---
      def assign(cents: Array[(Int, Seq[Double])]) = {
        val ds = cents.sortBy(_._1).map { case (j, c) =>
          val lc = typedLit(c)
          struct(
            round(dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), lc)
              + dot(lc, lc), 6).as("d"),
            lit(j).as("j"))
        }
        e.withColumn("best", array_min(array(ds.toIndexedSeq: _*)))
          .select(col("vec_id"), col("v"), col("best.j").as("cluster"))
      }
      def recompute(a: org.apache.spark.sql.DataFrame): Array[(Int, Seq[Double])] = a
        .select(col("cluster"), posexplode(col("v")).as(Seq("p", "x")))
        .groupBy(col("cluster"), (col("p") + 1).as("i"))
        .agg(sum(col("x").cast("decimal(38,18)")).as("sx"), count(lit(1)).as("n"))
        .select(col("cluster"), col("i"),
          (col("sx").cast("double") / col("n")).as("cx"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("cx")))),
          x => x.getField("cx")).as("c"))
        .collect()
        .map(r => (r.getAs[Int]("cluster"), r.getSeq[Double](1)))
      val seeds = e.withColumn("h", md5(col("vec_id").cast("string")))
        .orderBy("h", "vec_id").limit(8)
        .select(col("v")).collect() // TakeOrdered: k rows, sorted
      var cents = seeds.zipWithIndex.map { case (r, j) => (j, r.getSeq[Double](0)) }
      for (_ <- 1 to 2) cents = recompute(assign(cents))
      val a3 = assign(cents).localCheckpoint() // assignment, read twice
      // --- the SemDeDup scan: dropped iff a lower-id cluster-mate is
      // within τ (6dp-rounded cosine so the boundary can't flip) ---
      val x = a3.select(col("cluster"), col("vec_id"), col("v"))
      val y = a3.select(col("cluster").as("y_cl"), col("vec_id").as("y_id"),
        col("v").as("yv"))
      val p = x.join(y, col("cluster") === col("y_cl")
          && col("y_id") < col("vec_id"))
        .groupBy("cluster", "vec_id")
        .agg(max(when(round(cosine(col("v"), col("yv")), 6) >= 0.35, 1L)
          .otherwise(0L)).as("dropped"))
      val k = a3.select(col("cluster"), col("vec_id"))
        .join(p.select(col("vec_id"), col("dropped")), Seq("vec_id"), "left")
        .select(col("cluster"), col("vec_id"),
          coalesce(col("dropped"), lit(0L)).as("dropped"))
      k.groupBy("cluster")
        .agg(count(lit(1)).as("n_vecs"),
          sum("dropped").cast("long").as("n_dropped"),
          (count(lit(1)) - sum("dropped")).cast("long").as("n_kept"),
          sum(when(col("dropped") === 0, col("vec_id")).otherwise(0L))
            .cast("long").as("kept_id_sum"),
          round(sum("dropped").cast("double") / count(lit(1)), 6)
            .as("drop_rate"))
        .orderBy("cluster")
    }
  )
}
