package graft.llm

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md
  * §2.2 north-star set): exact hash dedup, canonical-fingerprint
  * dedup, MinHash+LSH near-dup, n-gram Jaccard, and SimHash.
  *
  * Scale design (100 TB):
  *  - exact/fingerprint dedup = one hash-partitioned aggregation on a
  *    16-byte digest — shuffle carries (digest, doc_id), never text;
  *  - MinHash+LSH: see [[MinhashPipeline]] — native codegen'd
  *    signatures, band-signature equi-join candidates only;
  *  - SimHash: per-doc 64-bit sketches; FULL-corpus pair scan via
  *    4×16-bit band equi-join (Manku et al., WWW'07): Hamming ≤ 3
  *    over 4 bands means at least one band is identical (pigeonhole),
  *    so banding is exact — candidates share a band, never O(n²);
  *  - all hashes derive from md5 (cross-engine reproducible), so the
  *    DuckDB oracle checks the *values*, not just row counts. The
  *    MLlib MinHashLSH variant (engine-private seeds) is kept as the
  *    rows-only demonstration of the MLlib path.
  */
object DedupQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Max Hamming distance for simhash near-dup; band count must
    * exceed it for the pigeonhole guarantee (4 bands > 3). */
  private val SimhashMaxDist = 3
  private val BandMask = 0xFFFFL // 16-bit bands

  /** Shared 64-bit-sketch near-dup tail: 4×16-bit band equi-join over
    * a (doc_id, h0, h1) frame → (da, db, dist) pairs with Hamming ≤
    * [[SimhashMaxDist]]. Pigeonhole-exact for the distance predicate
    * (a pair within distance 3 matches in at least one of 4 bands) —
    * candidates always share a band, never O(n²). One pipeline, two
    * sketch families: simhash (q_dedup_simhash) and the perceptual
    * aHash (q_multimodal_ahash_neardup). */
  private def bandedHammingPairs(sh: org.apache.spark.sql.DataFrame) = {
    val banded = sh.select(col("doc_id"), col("h0"), col("h1"),
      posexplode(array(
        col("h0").bitwiseAND(lit(BandMask)),
        call_function("shiftright", col("h0"), lit(16)).bitwiseAND(lit(BandMask)),
        col("h1").bitwiseAND(lit(BandMask)),
        call_function("shiftright", col("h1"), lit(16)).bitwiseAND(lit(BandMask)))))
      .select(col("doc_id"), col("h0"), col("h1"), col("pos").as("b"), col("col").as("v"))
    val a = banded.select(col("doc_id").as("da"), col("h0").as("a0"),
      col("h1").as("a1"), col("b").as("ba"), col("v").as("va"))
    val c = banded.select(col("doc_id").as("db"), col("h0").as("b0"),
      col("h1").as("b1"), col("b").as("bb"), col("v").as("vb"))
    // Sketches ride along the candidate join (functionally dependent
    // on the ids), so no re-join with the sketch table is needed.
    val cand = a.join(c,
        a("ba") === c("bb") && a("va") === c("vb") && a("da") < c("db"))
      .select("da", "db", "a0", "a1", "b0", "b1").distinct()
    val dist = (hamming(col("a0"), col("b0")) + hamming(col("a1"), col("b1"))).cast("int")
    cand.withColumn("dist", dist)
      .where(col("dist") <= SimhashMaxDist)
      .select("da", "db", "dist")
      .orderBy("da", "db")
  }

  /** Exact prefix-filter pair core (PPJoin-style, τ = 0.5 over 5-gram
    * shingles hashed to 60-bit digests): (da, db, ni, na, nb) for
    * every candidate pair that shares a prefix shingle — the τ
    * predicate (3·ni ≥ na+nb) is left to the caller so audits can
    * see the raw intersection counts. Shared by
    * q_dedup_prefix_filter and the q_blocking_quality audit. */
  def prefixFilterPairs(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = t(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      // r13 (guide §2.5, the MinhashPipeline.signatures fix): hash-
      // repartition the raw doc rows FIRST — tokenize + 5-gram explode
      // + one md5 per shingle (~2.5M at sf0.1) used to run inside the
      // serial one-task scan, and the checkpoint it fed was a single
      // partition that every one of the FIVE downstream consumers
      // (df agg, sizes, rank, both intersection sides) re-read
      // single-threaded. Per-doc shingling is row-local: values
      // unchanged.
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
        col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("words"))
      .where(size(col("words")) >= 5)
      .select(col("doc_id"),
        explode(graft.expressions.ShinglesArray(col("words"), 5)).as("tk0"))
      .select(col("doc_id"),
        conv(substring(md5(col("tk0")), 1, 15), 16, 10).cast("long").as("tk"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val dfq = ex.groupBy("tk").agg(count(lit(1)).as("d"))
    val sz = ex.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val rk = ex.join(dfq, "tk")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("d"), col("tk"))))
    val pf = rk.join(sz, "doc_id")
      .where(col("rn") <= floor(col("n") / 2) + 1)
      .select(col("doc_id"), col("tk"))
    val cand = pf.select(col("doc_id").as("da"), col("tk"))
      .join(pf.select(col("doc_id").as("db"), col("tk")), "tk")
      .where(col("da") < col("db"))
      .select("da", "db").distinct()
    val inter = cand
      .join(ex.select(col("doc_id").as("da"), col("tk")), Seq("da"))
      .join(ex.select(col("doc_id").as("db"), col("tk")), Seq("db", "tk"))
      .groupBy("da", "db").agg(count(lit(1)).as("ni"))
    inter
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
  }

  /** Oracle twin of [[prefixFilterPairs]]: CTE chain ending in
    * `<p>pairs(da, db, ni, na, nb)`; every CTE name carries the `p`
    * prefix so the chain composes with other CTE chains (the
    * blocking audit stacks it after the minhash band CTEs). */
  def prefixPairsSqlCte(p: String): String =
    s"""${p}w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |${p}sh AS (SELECT doc_id,
       |              list_distinct(list_transform(range(1, greatest(len(words) - 3, 1)),
       |                            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
       |                                 words[i+3] || ' ' || words[i+4])) AS sgl
       |       FROM ${p}w WHERE len(words) >= 5),
       |-- (continuation lines above keep '||' at LINE END: this chain
       |-- is embedded into callers' stripMargin strings, and a line
       |-- starting with '||' would lose one pipe to the outer strip)
       |${p}ex AS (SELECT doc_id, ('0x' || substr(md5(tk0), 1, 15))::BIGINT AS tk
       |       FROM (SELECT doc_id, unnest(sgl) AS tk0 FROM ${p}sh)),
       |${p}df AS (SELECT tk, CAST(count(*) AS BIGINT) AS d FROM ${p}ex GROUP BY tk),
       |${p}sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ${p}ex GROUP BY doc_id),
       |${p}rk AS (SELECT e.doc_id, e.tk,
       |              row_number() OVER (PARTITION BY e.doc_id ORDER BY d.d, e.tk) AS rn
       |       FROM ${p}ex e JOIN ${p}df d USING (tk)),
       |${p}pf AS (SELECT r.doc_id, r.tk FROM ${p}rk r JOIN ${p}sz USING (doc_id)
       |       WHERE rn <= n // 2 + 1),
       |${p}cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |         FROM ${p}pf a JOIN ${p}pf b ON a.tk = b.tk AND a.doc_id < b.doc_id),
       |${p}inter AS (SELECT c.da, c.db, CAST(count(*) AS BIGINT) AS ni
       |          FROM ${p}cand c JOIN ${p}ex x ON x.doc_id = c.da
       |                      JOIN ${p}ex y ON y.doc_id = c.db AND y.tk = x.tk
       |          GROUP BY 1, 2),
       |${p}pairs AS (SELECT i.da, i.db, i.ni, sa.n AS na, sb.n AS nb
       |          FROM ${p}inter i JOIN ${p}sz sa ON sa.doc_id = i.da
       |                           JOIN ${p}sz sb ON sb.doc_id = i.db)""".stripMargin

  /** Oracle twin of [[bandedHammingPairs]]: the CTE tail + final
    * SELECT, appended after a CTE `src`(doc_id, h0, h1). */
  private def bandedHammingSql(src: String): String =
    s"""bands AS (SELECT doc_id, h0, h1, b,
       |  CASE b WHEN 0 THEN h0 & $BandMask WHEN 1 THEN (h0 >> 16) & $BandMask
       |         WHEN 2 THEN h1 & $BandMask ELSE (h1 >> 16) & $BandMask END AS v
       |  FROM $src, range(0, 4) t(b)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, c.doc_id AS db,
       |                a.h0 AS a0, a.h1 AS a1, c.h0 AS b0, c.h1 AS b1
       |         FROM bands a JOIN bands c ON a.b = c.b AND a.v = c.v
       |                                  AND a.doc_id < c.doc_id)
       |SELECT da, db,
       |       CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) AS INT) AS dist
       |FROM cand
       |WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) <= $SimhashMaxDist
       |ORDER BY da, db""".stripMargin

  /** MLlib MinHashLSH pair core (da, db, dist): even doc_ids, 3-gram
    * shingles hashed binary into 2^18 features, 4 hash tables, seeded
    * approxSimilarityJoin at Jaccard distance ≤ 0.35. Deterministic
    * per Spark build but seed-private to the engine — consumed by the
    * q_dedup_minhash_mllib agreement summary (oracle-checked) and by
    * AccuracySpec (distance-vs-true-Jaccard and 0.9+-recall bounds). */
  def mllibMinhashPairs(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val docs = t(s, dir, "documents")
      .where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"))
      // r13 (guide §2.5): full-width tokenize/shingle + a 32-partition
      // featurized cache instead of serial work in the one-task scan
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
        col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("words"))
      .where(size(col("words")) >= 3)
      .select(col("doc_id"), graft.expressions.ShinglesArray(col("words"), 3).as("sgl"))
    val tf = new HashingTF().setInputCol("sgl").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42L)
    // fit + both join sides consume the featurized docs — barrier it
    val featC = feat.cache()
    val model = lsh.fit(featC)
    model.approxSimilarityJoin(featC, featC, 0.35, "dist")
      .select(
        col("datasetA.doc_id").as("da"),
        col("datasetB.doc_id").as("db"),
        round(col("dist"), 4).as("dist"))
      .where(col("da") < col("db"))
      .orderBy("da", "db")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- exact dedup: content hash → keeper + copy count ----
    sql(
      "q_dedup_exact",
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)
        |ORDER BY keeper""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("keeper")
    },

    // ---- canonical-fingerprint dedup (normalize → hash) ----
    sql(
      "q_dedup_fingerprint",
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |       min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents
        |GROUP BY 1 ORDER BY keeper""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("keeper")
    },

    // ---- MinHash + LSH banding near-dup (portable hashes); the
    //      signature → band → verify pipeline is shared with
    //      q_dedup_components via MinhashPipeline ----
    sql(
      "q_dedup_minhash_lsh",
      s"""WITH ${MinhashPipeline.pairsSqlCte}
         |SELECT da, db, round(est_jaccard, 4) AS est_jaccard
         |FROM pairs
         |ORDER BY da, db""".stripMargin) { (s, dir) =>
      MinhashPipeline.pairs(s, dir)
        .select(col("da"), col("db"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy("da", "db")
    },

    // ---- per-document n-gram novelty ----
    // The curation complement of dedup: what fraction of a doc's
    // distinct 3-gram shingles appears NOWHERE else in the corpus?
    // Boilerplate-heavy docs score near 0, original content near 1 —
    // the novelty signal data-mixing recipes weight by. One shingle
    // explode, one document-frequency aggregation (bounded by shingle
    // cardinality, hash-partitioned), one join back — all standard
    // shuffles; df == 1 is the strictest df cutoff, so the frame is
    // the same shape the df-capped dedup family already scales.
    sql(
      "q_ngram_novelty",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct(list_transform(range(1, greatest(len(words) - 1, 1)),
        |           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sgl
        |       FROM w WHERE len(words) >= 3),
        |ex AS (SELECT doc_id, unnest(sgl) AS s FROM sh),
        |df AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM ex GROUP BY s)
        |SELECT ex.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  round(CAST(sum(CASE WHEN df.d = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 4) AS novel_frac
        |FROM ex JOIN df ON df.s = ex.s
        |GROUP BY ex.doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.{shingles, tokens}
      // (doc, shingle) pairs feed the df aggregation AND the join
      // probe — materialize the explode once
      val ex = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(col("words")) >= 3)
        .select(col("doc_id"), explode(shingles(col("words"), 3)).as("s"))
        .localCheckpoint()
      val df = ex.groupBy("s").agg(count(lit(1)).as("d"))
      ex.join(df, Seq("s"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("d") === 1, 1L).otherwise(0L)).as("novel"))
        .select(col("doc_id"), col("n_shingles"),
          round(col("novel").cast("double") / col("n_shingles"), 4)
            .as("novel_frac"))
        .orderBy("doc_id")
    },

    // ---- asymmetric containment on the LSH candidate pairs ----
    // Jaccard misses INCLUSION: a boilerplate page embedded inside a
    // longer doc has low symmetric similarity but containment
    // |A∩B|/|A| ≈ 1 — the signal for sub-document duplication and
    // quotation. Exact shingle-set intersection runs ONLY on the
    // band-verified pair set (bounded by the banding, never all
    // pairs); ratios are exact-integer divisions.
    sql(
      "q_minhash_containment",
      s"""WITH ${MinhashPipeline.pairsSqlCte}
         |SELECT p.da, p.db,
         |  CAST(len(list_intersect(x.sgl, y.sgl)) AS BIGINT) AS n_common,
         |  round(CAST(len(list_intersect(x.sgl, y.sgl)) AS DOUBLE)
         |        / len(x.sgl), 4) AS c_a,
         |  round(CAST(len(list_intersect(x.sgl, y.sgl)) AS DOUBLE)
         |        / len(y.sgl), 4) AS c_b,
         |  round(CAST(len(list_intersect(x.sgl, y.sgl)) AS DOUBLE)
         |        / (len(x.sgl) + len(y.sgl)
         |           - len(list_intersect(x.sgl, y.sgl))), 4) AS jaccard_exact
         |FROM pairs p JOIN sh x ON x.doc_id = p.da
         |             JOIN sh y ON y.doc_id = p.db
         |ORDER BY da, db""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.{shingles, tokens}
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(col("words")) >= 3)
        .select(col("doc_id"), shingles(col("words"), 3).as("sgl"))
      val x = sh.select(col("doc_id").as("xid"), col("sgl").as("sgla"))
      val y = sh.select(col("doc_id").as("yid"), col("sgl").as("sglb"))
      val inter = size(array_intersect(col("sgla"), col("sglb")))
      MinhashPipeline.pairs(s, dir)
        .join(x, col("da") === col("xid"))
        .join(y, col("db") === col("yid"))
        // materialize the intersection size once; without this the
        // array_intersect HOF re-evaluates per consuming expression
        .withColumn("n_common", inter.cast("long"))
        .select(col("da"), col("db"), col("n_common"),
          round(col("n_common").cast("double") / size(col("sgla")), 4).as("c_a"),
          round(col("n_common").cast("double") / size(col("sglb")), 4).as("c_b"),
          round(col("n_common").cast("double")
            / (size(col("sgla")) + size(col("sglb")) - col("n_common")), 4)
            .as("jaccard_exact"))
        .orderBy("da", "db")
    },

    // ---- fuzzy join via idf-weighted token overlap ----
    // Entity matching ACROSS datasets (the dedup family is WITHIN one
    // corpus): every probe document (doc_id % 50 = 0 stands in for the
    // incoming batch) is matched to its best target-corpus document by
    // idf-weighted overlap of distinct tokens — the classic
    // record-linkage blocking+scoring join. Candidates come from the
    // df-capped inverted token index (df ≤ 50, the q_dedup_ngram
    // bound), so candidate volume is Σdf² over capped tokens — never
    // probes × targets. Scores accumulate per-term ln(N/df) in
    // DECIMAL(38,18) (order-independent — a double sum's merge order
    // could flip the top-1 pick at the rounding boundary) and the
    // top-1 is picked per probe by the ROUNDED score (the assoc_rules
    // lesson), tiebreak on match_id. n_shared counts the df-capped
    // shared tokens — hub tokens carry no signal and no cost.
    sql(
      "q_fuzzy_join_token",
      """WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS words
        |           FROM documents),
        |ex AS (SELECT doc_id, unnest(words) AS tk FROM w),
        |tg AS (SELECT * FROM ex WHERE doc_id % 50 <> 0),
        |pr AS (SELECT * FROM ex WHERE doc_id % 50 = 0),
        |nt AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tg),
        |df AS (SELECT tk, CAST(count(*) AS BIGINT) AS d FROM tg
        |       GROUP BY tk HAVING count(*) <= 50),
        |cand AS (SELECT pr.doc_id AS probe_id, tg.doc_id AS match_id,
        |           CAST(count(*) AS BIGINT) AS n_shared,
        |           CAST(sum(CAST(ln(CAST((SELECT n FROM nt) AS DOUBLE) / df.d)
        |                         AS DECIMAL(38,18))) AS DOUBLE) AS score
        |         FROM pr JOIN df ON df.tk = pr.tk JOIN tg ON tg.tk = pr.tk
        |         GROUP BY 1, 2),
        |r AS (SELECT probe_id, match_id, n_shared, round(score, 6) AS score,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(score, 6) DESC, match_id) AS rn
        |      FROM cand)
        |SELECT probe_id, match_id, n_shared, score
        |FROM r WHERE rn = 1 ORDER BY probe_id""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.tokens
      import org.apache.spark.sql.expressions.Window
      val ex = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(tokens(col("text")))).as("tk"))
        .localCheckpoint() // feeds targets, probes, df, and N
      val tg = ex.where(col("doc_id") % 50 =!= 0)
      val pr = ex.where(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("probe_id"), col("tk"))
      val nt = tg.agg(countDistinct(col("doc_id")).as("n"))
      val df = tg.groupBy("tk").agg(count(lit(1)).as("d"))
        .where(col("d") <= 50)
      val cand = pr
        .join(df, Seq("tk"))
        .join(tg.select(col("doc_id").as("match_id"), col("tk")), Seq("tk"))
        .crossJoin(broadcast(nt)) // 1-row target-corpus count
        .groupBy("probe_id", "match_id")
        .agg(count(lit(1)).as("n_shared"),
          sum(log(col("n").cast("double") / col("d")).cast("decimal(38,18)"))
            .cast("double").as("score"))
      val rk = Window.partitionBy("probe_id")
        .orderBy(round(col("score"), 6).desc, col("match_id"))
      cand.withColumn("rn", row_number().over(rk))
        .where(col("rn") === 1)
        .select(col("probe_id"), col("match_id"), col("n_shared"),
          round(col("score"), 6).as("score"))
        .orderBy("probe_id")
    },

    // ---- LSH precision curve (threshold calibration audit) ----
    // Before a dedup run ships with "drop pairs above τ", this is the
    // table that picks τ: for each candidate threshold, how many LSH
    // candidate pairs the SKETCH flags, what fraction of those the
    // EXACT shingle Jaccard confirms (precision), and the sketch's
    // mean absolute error on the flagged set. Ground truth runs only
    // on the band-verified candidate pairs (bounded by the banding —
    // recall beyond the candidate set needs labeled truth, which LSH
    // theory bounds analytically instead). One pair frame materialized
    // once, a 5-row threshold ladder broadcast over it; error sums
    // DECIMAL-accumulated. Thresholds with zero flagged pairs drop
    // (HAVING, mirrored) so no division guards are needed.
    sql(
      "q_lsh_pr_curve",
      s"""WITH ${MinhashPipeline.pairsSqlCte},
         |ev AS (SELECT p.est_jaccard AS est,
         |         CAST(len(list_intersect(x.sgl, y.sgl)) AS DOUBLE)
         |           / (len(x.sgl) + len(y.sgl)
         |              - len(list_intersect(x.sgl, y.sgl))) AS exact
         |       FROM pairs p JOIN sh x ON x.doc_id = p.da
         |                    JOIN sh y ON y.doc_id = p.db),
         |th AS (SELECT CAST(t AS DOUBLE) / 10 AS t
         |       FROM (VALUES (5), (6), (7), (8), (9)) AS v(t))
         |SELECT th.t AS threshold,
         |  CAST(count(*) AS BIGINT) AS n_flagged,
         |  CAST(sum(CASE WHEN ev.exact >= th.t THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_confirmed,
         |  round(CAST(sum(CASE WHEN ev.exact >= th.t THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*), 6) AS precision_at_t,
         |  round(CAST(sum(CAST(abs(ev.est - ev.exact) AS DECIMAL(38,18)))
         |             AS DOUBLE) / count(*), 6) AS mean_abs_err
         |FROM ev JOIN th ON ev.est >= th.t
         |GROUP BY th.t HAVING count(*) > 0
         |ORDER BY threshold""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.{shingles, tokens}
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(col("words")) >= 3)
        .select(col("doc_id"), shingles(col("words"), 3).as("sgl"))
      val inter = size(array_intersect(col("sgla"), col("sglb")))
      val ev = MinhashPipeline.pairs(s, dir)
        .join(sh.select(col("doc_id").as("xid"), col("sgl").as("sgla")),
          col("da") === col("xid"))
        .join(sh.select(col("doc_id").as("yid"), col("sgl").as("sglb")),
          col("db") === col("yid"))
        .withColumn("ni", inter.cast("long")) // HOF evaluated once
        .select(col("est_jaccard").as("est"),
          (col("ni").cast("double")
            / (size(col("sgla")) + size(col("sglb")) - col("ni"))).as("exact"))
        .localCheckpoint() // bounded by the banding; read by all 5 thresholds
      val th = s.range(5, 10).select((col("id").cast("double") / 10).as("t"))
      ev.join(broadcast(th), col("est") >= col("t"))
        .groupBy(col("t").as("threshold"))
        .agg(count(lit(1)).as("n_flagged"),
          sum(when(col("exact") >= col("t"), 1L).otherwise(0L))
            .as("n_confirmed"),
          sum(abs(col("est") - col("exact")).cast("decimal(38,18)")).as("sae"))
        .where(col("n_flagged") > 0)
        .select(col("threshold"), col("n_flagged"), col("n_confirmed"),
          round(col("n_confirmed").cast("double") / col("n_flagged"), 6)
            .as("precision_at_t"),
          round(col("sae").cast("double") / col("n_flagged"), 6)
            .as("mean_abs_err"))
        .orderBy("threshold")
    },

    // ---- exact n-gram Jaccard on a sampled query set, candidates
    //      via inverted shingle index (no cross product) ----
    sql(
      "q_dedup_ngram_jaccard",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT doc_id,
        |              list_distinct(list_transform(range(1, greatest(len(words) - 1, 1)),
        |                            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sgl
        |       FROM w WHERE len(words) >= 3),
        |ex AS (SELECT doc_id, unnest(sgl) AS g FROM sh),
        |rare AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 100),
        |exr AS (SELECT ex.doc_id, ex.g FROM ex JOIN rare ON ex.g = rare.g),
        |sizes AS (SELECT doc_id, count(*) AS n FROM exr GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |          FROM exr a JOIN exr b ON a.g = b.g AND b.doc_id <> a.doc_id
        |          WHERE a.doc_id % 50 = 0
        |          GROUP BY a.doc_id, b.doc_id)
        |SELECT da, db, round(ni / (sa.n + sb.n - ni), 4) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        |WHERE ni / (sa.n + sb.n - ni) >= 0.3
        |ORDER BY da, db""".stripMargin) { (s, dir) =>
      // Jaccard over the RARE-shingle space (doc-frequency cap 100 —
      // standard stop-shingle removal): a shingle shared by thousands
      // of docs would quadratically explode the inverted-index pair
      // space at scale while carrying no dedup signal. The pair count
      // aggregates directly on the join (no arrays shuffled).
      // Shingling is the native ShinglesArray expression (tight loop,
      // codegen'd); materialize doc→shingles once — it feeds four
      // consumers (df counts, sizes, both join sides) and would
      // re-execute per consumer otherwise. At cluster scale this is a
      // persisted intermediate table.
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        // r13 (guide §2.5): same serial-scan fix as prefixFilterPairs
        .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
          col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(col("words")) >= 3)
        .select(col("doc_id"), graft.expressions.ShinglesArray(col("words"), 3).as("sgl"))
        .cache()
      val ex = sh.select(col("doc_id"), explode(col("sgl")).as("g"))
      val rare = ex.groupBy("g").agg(count(lit(1)).as("df")).where(col("df") <= 100)
        .select("g")
      // The rare-shingle filter join carries NO broadcast hint: the
      // df cap bounds per-shingle pair fanout, not the distinct-
      // shingle set size — in a real corpus nearly every distinct
      // shingle is rare, so that side grows with the corpus. AQE
      // broadcasts it while it fits and falls back to a shuffle join
      // on g past that (df cap keeps the skew bounded). The 2% query
      // sample keeps its hint; at cluster scale with an unbounded
      // query set, drop it too.
      val exr = ex.join(rare, "g")
      val sizes = exr.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val aS = exr.where(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("da"), col("g").as("ga"))
      val bS = exr.select(col("doc_id").as("db"), col("g").as("gb"))
      val inter = broadcast(aS).join(bS, col("ga") === col("gb") && col("db") =!= col("da"))
        .groupBy("da", "db").agg(count(lit(1)).as("ni"))
      val jac = col("ni") / (col("na") + col("nb") - col("ni"))
      inter
        .join(sizes.select(col("doc_id").as("da2"), col("n").as("na")), col("da") === col("da2"))
        .join(sizes.select(col("doc_id").as("db2"), col("n").as("nb")), col("db") === col("db2"))
        .where(jac >= 0.3)
        .select(col("da"), col("db"), round(jac, 4).as("jaccard"))
        .orderBy("da", "db")
    },

    // ---- prefix-filtered set-similarity self-join (PPJoin-style,
    //      Xiao et al. WWW'08 / Chaudhuri ICDE'06 prefix filter) ----
    // The THIRD candidate-generation family next to LSH banding and
    // the df-capped inverted index: order each doc's distinct
    // shingles by global rarity (df asc, shingle asc — one total
    // order both engines agree on), keep only the first
    // ⌊n/2⌋+1 = n − ⌈τ·n⌉ + 1 rarest as its PREFIX (τ = 0.5), and
    // join docs on shared PREFIX shingles only. Exactness guarantee:
    // two sets with Jaccard ≥ τ must overlap in ≥ ⌈τ·n⌉ elements, so
    // skipping the ⌈τ·n⌉−1 most-common shingles of each cannot skip
    // ALL shared ones — every qualifying pair shares a prefix
    // shingle. Unlike the df-cap this needs no tuning constant and
    // unlike LSH it is exact, not probabilistic. Candidate volume is
    // driven by the df of PREFIX shingles — the rarest per doc — so
    // the FEATURE SPACE must carry enough entropy that rare shingles
    // exist: 3-gram shingles saturate on this bounded-vocab corpus
    // (at the 10× replica even prefix shingles reach mean df ≈ 89 →
    // 53M candidates, a measured 116× scale blow-up), while 5-grams
    // keep prefix dfs ≈ 1 and candidates LINEAR through both decades
    // (25 → 256 → 2.5k at 1×/10×/100× docs) with precision ≈ 1.
    // Shingle width is the operator's declared similarity space —
    // the τ-losslessness proof is width-independent. (Token-space
    // prefixes are worse still: 1.1M candidates at sf0.01.)
    // Verification is the exact Jaccard as an INTEGER predicate
    // (3·ni ≥ na+nb ⟺ jac ≥ 0.5 — no float threshold to disagree
    // on). The shingle explode is materialized serialized: it feeds
    // df, sizes, the rank pass, and both intersection sides.
    sql(
      "q_dedup_prefix_filter",
      s"""WITH ${prefixPairsSqlCte("")}
        |SELECT da, db, ni,
        |       round(CAST(ni AS DOUBLE) / (na + nb - ni), 4) AS jaccard
        |FROM pairs
        |WHERE 3 * ni >= na + nb
        |ORDER BY da, db""".stripMargin) { (s, dir) =>
      prefixFilterPairs(s, dir)
        .where(col("ni") * 3 >= col("na") + col("nb"))
        .select(col("da"), col("db"), col("ni"),
          round(col("ni").cast("double") / (col("na") + col("nb") - col("ni")), 4)
            .as("jaccard"))
        .orderBy("da", "db")
    },

    // ---- blocking-scheme quality audit (record-linkage reduction
    //      ratio + pair completeness — Christen's blocking metrics) ----
    // Before a dedup run trusts its LSH banding, this is the table
    // that says whether the BLOCKING (not the verifier — that is
    // q_lsh_pr_curve's precision side) is any good: of all strong
    // near-dup pairs an EXACT lossless method finds (the 5-gram τ=0.5
    // prefix-filter set — computable at scale, unlike all-pairs
    // truth), what fraction does the minhash band candidate set
    // contain (pair completeness), and what fraction of the n·(n−1)/2
    // comparison space did banding eliminate (reduction ratio)?
    // Everything is exact integer counts riding 1-row broadcast
    // aggregates; the heavy inputs are the two already-scale-proven
    // pair cores, reused verbatim.
    sql(
      "q_blocking_quality",
      s"""WITH ${MinhashPipeline.bandsSqlCte},
         |bcand AS (SELECT DISTINCT a.doc_id AS da, c.doc_id AS db
         |         FROM bands a JOIN bands c ON a.sig = c.sig AND a.b = c.b
         |                                  AND a.doc_id < c.doc_id),
         |${prefixPairsSqlCte("t")},
         |truth AS (SELECT da, db FROM tpairs WHERE 3 * ni >= na + nb),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM mh),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM bcand),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
         |ng AS (SELECT CAST(count(*) AS BIGINT) AS n_caught
         |       FROM truth JOIN bcand USING (da, db))
         |SELECT n_docs, n_docs * (n_docs - 1) / 2 AS n_pairs_possible,
         |       n_candidates, n_truth, n_caught,
         |       round(CAST(n_caught AS DOUBLE) / n_truth, 4) AS completeness,
         |       round(1.0 - CAST(n_candidates AS DOUBLE)
         |             / (n_docs * (n_docs - 1) / 2), 6) AS reduction_ratio
         |FROM nd, nc, nt, ng""".stripMargin) { (s, dir) =>
      val bands = MinhashPipeline.bandSignatures(s, dir)
      val a = bands.select(col("doc_id").as("da"), col("b").as("ba"), col("sig").as("siga"))
      val c = bands.select(col("doc_id").as("db"), col("b").as("bb"), col("sig").as("sigb"))
      val bcand = a.join(c, a("siga") === c("sigb") && a("ba") === c("bb")
          && a("da") < c("db"))
        .select("da", "db").distinct()
        .cache() // feeds its own count AND the completeness semi-join
      val truth = prefixFilterPairs(s, dir)
        .where(col("ni") * 3 >= col("na") + col("nb"))
        .select("da", "db")
        .cache() // same: counted once, semi-joined once
      val nd = MinhashPipeline.signatures(s, dir)
        .agg(count(lit(1)).as("n_docs"))
      val nc = bcand.agg(count(lit(1)).as("n_candidates"))
      val nt = truth.agg(count(lit(1)).as("n_truth"))
      val ng = truth.join(bcand, Seq("da", "db"), "left_semi")
        .agg(count(lit(1)).as("n_caught"))
      val possible = col("n_docs") * (col("n_docs") - 1) / 2
      nd.crossJoin(broadcast(nc)).crossJoin(broadcast(nt)).crossJoin(broadcast(ng))
        .select(col("n_docs"), possible.as("n_pairs_possible"),
          col("n_candidates"), col("n_truth"), col("n_caught"),
          round(col("n_caught").cast("double") / col("n_truth"), 4)
            .as("completeness"),
          round(lit(1.0) - col("n_candidates").cast("double") / possible, 6)
            .as("reduction_ratio"))
    },

    // ---- SimHash (64-bit as two portable 32-bit halves), FULL-corpus
    //      near-dup via 4×16-bit band equi-join. Pigeonhole: a pair
    //      within Hamming distance 3 differs in at most 3 of the 4
    //      bands, so at least one band matches exactly — banding is a
    //      complete (not approximate) candidate generator for the
    //      distance-3 predicate, and the join is an equi-join on
    //      (band index, band value): no nested-loop scan anywhere. ----
    sql(
      "q_dedup_simhash",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |wh AS (SELECT doc_id,
         |  list_transform(words, t -> ('0x' || substr(md5(0 || ':' || t), 1, 8))::BIGINT) AS h0s,
         |  list_transform(words, t -> ('0x' || substr(md5(1 || ':' || t), 1, 8))::BIGINT) AS h1s
         |FROM w),
         |sh AS (SELECT doc_id,
         |  list_sum(list_transform(range(0, 32), b -> CASE WHEN
         |    list_sum(list_transform(h0s, h -> CASE WHEN ((h >> b) & 1) = 1
         |      THEN 1 ELSE -1 END)) > 0 THEN (1::BIGINT << b) ELSE 0 END)) AS h0,
         |  list_sum(list_transform(range(0, 32), b -> CASE WHEN
         |    list_sum(list_transform(h1s, h -> CASE WHEN ((h >> b) & 1) = 1
         |      THEN 1 ELSE -1 END)) > 0 THEN (1::BIGINT << b) ELSE 0 END)) AS h1
         |FROM wh),
         |${bandedHammingSql("sh")}""".stripMargin) { (s, dir) =>
      // Sketches via native codegen'd expressions (graft.expressions.*)
      // — value-identical to the HOF formulation (asserted in spec).
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        // r13 (guide §2.5): the two salted per-word hash passes are
        // the sketch cost — run them at shuffle width, not in the
        // serial one-task scan
        .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
          col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .select(col("doc_id"),
          graft.expressions.SaltedH32Array(col("words"), 0).as("wh0"),
          graft.expressions.SaltedH32Array(col("words"), 1).as("wh1"))
        .select(col("doc_id"),
          graft.expressions.Simhash32FromHashes(col("wh0")).as("h0"),
          graft.expressions.Simhash32FromHashes(col("wh1")).as("h1"))
        // both self-join sides consume the sketches; without the
        // barrier the scan + per-word salted md5 passes run twice
        .cache()
      bandedHammingPairs(sh)
    },

    // ---- perceptual-hash (aHash) near-dup over the multimodal
    //      payload column ----
    // The image-dedup rung of the multimodal family: average-hash =
    // threshold each cell of a fixed grid against the image mean, a
    // 64-bit sketch whose Hamming distance tracks visual similarity.
    // The decode+resize-to-8×8 stage is the multimodal stub
    // convention (payloads here are the documents' UTF-8 bytes, so
    // the "grid" is the first 64 bytes and the ORACLE recomputes the
    // hash value-for-value); a real pipeline swaps the byte window
    // for an 8×8 grayscale resize (ImageIoMedia has the real
    // bilinear resize — AdaptersSpec) and every line after the
    // 64-value array is UNCHANGED: mean-threshold bit-pack into two
    // portable 32-bit halves, then the SAME 4×16-bit band equi-join
    // as simhash — pigeonhole-exact for Hamming ≤ 3, candidates
    // always share a band, never O(n²). The mean divides by 64
    // (a power of two, exact in binary FP) so the strict `>`
    // threshold compares identical doubles on both engines.
    sql(
      "q_multimodal_ahash_neardup",
      s"""WITH a AS (SELECT doc_id,
         |             list_transform(range(1, 65), i -> ascii(substr(text, CAST(i AS INT), 1))) AS bs
         |           FROM documents WHERE len(text) >= 64),
         |mu AS (SELECT doc_id, bs, list_sum(bs) / 64.0 AS mu FROM a),
         |h AS (SELECT doc_id,
         |        list_sum(list_transform(range(0, 32), b -> CASE WHEN bs[b + 1] > mu
         |          THEN (1::BIGINT << b) ELSE 0 END)) AS h0,
         |        list_sum(list_transform(range(0, 32), b -> CASE WHEN bs[b + 33] > mu
         |          THEN (1::BIGINT << b) ELSE 0 END)) AS h1
         |      FROM mu),
         |${bandedHammingSql("h")}""".stripMargin) { (s, dir) =>
      // byte window as an array column ONCE, then element_at refs —
      // inlining 64 ascii(substr) exprs into every bit term would
      // evaluate the window 64× per bit
      val bs = transform(sequence(lit(1), lit(64)),
        i => ascii(col("text").substr(i, lit(1))).cast("long"))
      val mu = (aggregate(col("bs"), lit(0L), (acc, x) => acc + x)
        .cast("double") / 64.0).as("mu")
      def half(off: Int) = (0 until 32)
        .map(b => when(element_at(col("bs"), off + b + 1) > col("mu"),
          lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      val sh = t(s, dir, "documents")
        .where(length(col("text")) >= 64)
        .select(col("doc_id"), bs.as("bs"))
        .select(col("doc_id"), col("bs"), mu)
        .select(col("doc_id"), half(0).as("h0"), half(32).as("h1"))
        .cache() // both self-join sides consume the sketches
      bandedHammingPairs(sh)
    },

    // ---- substring-style dedup via long-shingle collisions: the
    //      map-reduce approximation of suffix-array dedup (docs
    //      sharing ≥3 distinct 8-word shingles share long spans).
    //      Same inverted-index shape as n-gram Jaccard — candidates
    //      only from shingle-key collisions, df-capped for skew. ----
    sql(
      "q_dedup_substring",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT doc_id,
        |              list_distinct(list_transform(range(1, greatest(len(words) - 6, 1)),
        |                            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
        |                                 words[i+3] || ' ' || words[i+4] || ' ' || words[i+5] || ' ' ||
        |                                 words[i+6] || ' ' || words[i+7])) AS sgl
        |       FROM w WHERE len(words) >= 8),
        |ex AS (SELECT doc_id, unnest(sgl) AS g FROM sh),
        |rare AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 50),
        |exr AS (SELECT ex.doc_id, ex.g FROM ex JOIN rare ON ex.g = rare.g)
        |SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_shared
        |FROM exr a JOIN exr b ON a.g = b.g AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING count(*) >= 3
        |ORDER BY da, db""".stripMargin) { (s, dir) =>
      val ex = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(col("words")) >= 8)
        .select(col("doc_id"), explode(graft.expressions.ShinglesArray(col("words"), 8)).as("g"))
      // `rare` (df-capped shingles) is corpus-proportional — nearly all
      // distinct long shingles of a real corpus are rare — so no
      // broadcast hint: AQE picks broadcast at small scale and a
      // shuffled hash join once the set outgrows the broadcast limit.
      val rare = ex.groupBy("g").agg(count(lit(1)).as("df")).where(col("df") <= 50)
        .select("g")
      val exr = ex.join(rare, "g")
      val a = exr.select(col("doc_id").as("da"), col("g").as("ga"))
      val b = exr.select(col("doc_id").as("db"), col("g").as("gb"))
      a.join(b, col("ga") === col("gb") && col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 3)
        .orderBy("da", "db")
    },

    // ---- decontamination: flag training docs sharing long n-grams
    //      with a held-out benchmark set (doc_id % 50 = 0 stands in
    //      for the eval suite). The benchmark shingle set is bounded
    //      → broadcast; the training side streams through one
    //      map-side semi-join + count. Same inverted-index shape as
    //      substring dedup, but corpus-vs-reference instead of
    //      corpus-vs-itself. ----
    sql(
      "q_decontaminate",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT doc_id,
        |              list_distinct(list_transform(range(1, greatest(len(words) - 6, 1)),
        |                            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
        |                                 words[i+3] || ' ' || words[i+4] || ' ' || words[i+5] || ' ' ||
        |                                 words[i+6] || ' ' || words[i+7])) AS sgl
        |       FROM w WHERE len(words) >= 8),
        |bench AS (SELECT DISTINCT unnest(sgl) AS g FROM sh WHERE doc_id % 50 = 0),
        |ex AS (SELECT doc_id, unnest(sgl) AS g FROM sh WHERE doc_id % 50 <> 0)
        |SELECT ex.doc_id, count(*) AS n_contaminated_shingles
        |FROM ex JOIN bench ON ex.g = bench.g
        |GROUP BY ex.doc_id
        |ORDER BY ex.doc_id""".stripMargin) { (s, dir) =>
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(col("words")) >= 8)
        .select(col("doc_id"), graft.expressions.ShinglesArray(col("words"), 8).as("sgl"))
      val bench = sh.where(col("doc_id") % 50 === 0)
        .select(explode(col("sgl")).as("g")).distinct()
      sh.where(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), explode(col("sgl")).as("g"))
        .join(broadcast(bench), "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated_shingles"))
        .orderBy("doc_id")
    },

    // ---- dedup materialization: greedy pairwise prune — any doc with
    //      a smaller near-duplicate is dropped; the kept corpus is the
    //      LEFT ANTI join against the pair list (transitively-exact
    //      group pruning is q_dedup_components' min-label output) ----
    sql(
      "q_dedup_prune",
      s"""WITH ${MinhashPipeline.pairsSqlCte}
         |SELECT d.doc_id, d.source
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT db FROM pairs)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      // the pair-victim set scales with the corpus's duplication rate —
      // no broadcast hint; AQE broadcasts while it fits and falls back
      // to a shuffled anti join beyond the limit
      val nonKeepers = MinhashPipeline.pairs(s, dir).select("db").distinct()
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .join(nonKeepers, col("doc_id") === col("db"), "left_anti")
        .orderBy("doc_id")
    },

    // ---- hybrid text+embedding dedup: MinHash-LSH candidates
    //      cross-checked against embedding cosine (the multimodal
    //      confirmation pass — lexical near-dups whose embeddings
    //      disagree are usually template pages with different payloads).
    //      Pair list is bounded by the banding, so the embedding join
    //      is candidate-sized, never corpus². ----
    sql(
      "q_dedup_hybrid",
      s"""WITH ${MinhashPipeline.pairsSqlCte},
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT da, db, round(est_jaccard, 4) AS est_jaccard,
         |       round(list_dot_product(x.v, y.v) /
         |             sqrt(list_dot_product(x.v, x.v) * list_dot_product(y.v, y.v)), 6) AS cos_sim,
         |       CASE WHEN list_dot_product(x.v, y.v) /
         |                 sqrt(list_dot_product(x.v, x.v) * list_dot_product(y.v, y.v)) >= 0.2
         |            THEN 1 ELSE 0 END AS confirmed
         |FROM pairs JOIN e x ON x.vec_id = da JOIN e y ON y.vec_id = db
         |ORDER BY da, db""".stripMargin) { (s, dir) =>
      import graft.functions.VectorFunctions.{asDouble, cosine}
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val x = e.select(col("vec_id").as("xid"), col("v").as("xv"))
      val y = e.select(col("vec_id").as("yid"), col("v").as("yv"))
      MinhashPipeline.pairs(s, dir)
        .join(x, col("da") === col("xid")).join(y, col("db") === col("yid"))
        .withColumn("cosr", cosine(col("xv"), col("yv")))
        .select(
          col("da"), col("db"),
          round(col("est_jaccard"), 4).as("est_jaccard"),
          round(col("cosr"), 6).as("cos_sim"),
          when(col("cosr") >= 0.2, 1).otherwise(0).as("confirmed"))
        .orderBy("da", "db")
    },

    // ---- incremental dedup: the daily-ingest shape — a NEW batch
    //      (doc_id % 10 = 9 stands in for today's crawl) probes the
    //      existing corpus index by exact fingerprint and by LSH band
    //      collision. At 100 TB the index side is a persisted
    //      (fingerprint) / (band, sig) table; the probe is two
    //      hash joins sized by the new batch. ----
    sql(
      "q_dedup_incremental",
      s"""WITH ${MinhashPipeline.bandsSqlCte},
         |fps AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         |               source
         |        FROM documents),
         |idx AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 <> 9),
         |nb AS (SELECT * FROM fps WHERE doc_id % 10 = 9),
         |idxb AS (SELECT DISTINCT b, sig FROM bands WHERE doc_id % 10 <> 9),
         |hits AS (SELECT DISTINCT n.doc_id
         |         FROM bands n JOIN idxb i ON n.b = i.b AND n.sig = i.sig
         |         WHERE n.doc_id % 10 = 9)
         |SELECT nb.doc_id, nb.source,
         |       CASE WHEN idx.fp IS NULL THEN 0 ELSE 1 END AS is_exact_dup,
         |       CASE WHEN hits.doc_id IS NULL THEN 0 ELSE 1 END AS near_dup_candidate
         |FROM nb LEFT JOIN idx ON nb.fp = idx.fp
         |        LEFT JOIN hits ON hits.doc_id = nb.doc_id
         |ORDER BY nb.doc_id""".stripMargin) { (s, dir) =>
      val fps = t(s, dir, "documents")
        .select(col("doc_id"), fingerprint(col("text")).as("fp"), col("source"))
      val idx = fps.where(col("doc_id") % 10 =!= 9).select(col("fp").as("ifp")).distinct()
      val nb = fps.where(col("doc_id") % 10 === 9)
      val bands = MinhashPipeline.bandSignatures(s, dir)
      val idxb = bands.where(col("doc_id") % 10 =!= 9)
        .select(col("b").as("ib"), col("sig").as("isig")).distinct()
      val hits = bands.where(col("doc_id") % 10 === 9)
        .join(idxb, col("b") === col("ib") && col("sig") === col("isig"), "left_semi")
        .select(col("doc_id").as("hid")).distinct()
      nb.join(idx, col("fp") === col("ifp"), "left")
        .join(hits, col("doc_id") === col("hid"), "left")
        .select(
          col("doc_id"), col("source"),
          when(col("ifp").isNull, 0).otherwise(1).as("is_exact_dup"),
          when(col("hid").isNull, 0).otherwise(1).as("near_dup_candidate"))
        .orderBy("doc_id")
    },

    // ---- MLlib MinHashLSH: the packaged, approxSimilarityJoin-based
    //      scale path, promoted to a FULL hash-match (r8 VERDICT #3).
    //      The raw pair list depends on MLlib's engine-private hash
    //      seeds, so it can never be recomputed by DuckDB; what CAN be
    //      pinned is the pair-set agreement against the repo's
    //      portable-banding pipeline on the same domain (even doc_ids;
    //      exactly the q_blocking_quality audit shape). The oracle
    //      checks the portable pair count EXACTLY and pins the
    //      agreement/nonempty flags TRUE; the bound has measured
    //      margin (pair-set Jaccard agreement is exactly 1.0 at
    //      sf0.001/0.01/0.1 — 12/12, 6/6, 67/67 identical pairs —
    //      flag at ≥ 0.5 because the two families use different
    //      thresholds (est_jaccard ≥ 0.5 on 12 perms vs exact
    //      feature-Jaccard ≥ 0.65 on 4 tables) and are only obliged
    //      to agree on the planted near-dup mass). AccuracySpec still
    //      bounds the raw pair list's distances via
    //      [[mllibMinhashPairs]]. ----
    sql(
      "q_dedup_minhash_mllib",
      s"""WITH ${MinhashPipeline.pairsSqlCte}
        |SELECT CAST(count(*) AS BIGINT) AS n_portable,
        |       true AS agreement_ok, true AS mllib_nonempty
        |FROM pairs WHERE da % 2 = 0 AND db % 2 = 0""".stripMargin) { (s, dir) =>
      val ml = mllibMinhashPairs(s, dir).select("da", "db")
        .cache() // counted once, intersected once
      val port = MinhashPipeline.pairs(s, dir)
        .where(col("da") % 2 === 0 && col("db") % 2 === 0)
        .select("da", "db")
        .cache() // same
      val np = port.agg(count(lit(1)).as("n_portable"))
      val nm = ml.agg(count(lit(1)).as("n_mllib"))
      val ni = port.join(ml, Seq("da", "db"), "left_semi")
        .agg(count(lit(1)).as("n_inter"))
      np.crossJoin(broadcast(nm)).crossJoin(broadcast(ni))
        .select(col("n_portable"),
          (col("n_inter").cast("double") /
            (col("n_portable") + col("n_mllib") - col("n_inter"))
            >= 0.5).as("agreement_ok"),
          (col("n_mllib") > 0).as("mllib_nonempty"))
    },

    // ---- Fellegi–Sunter linkage weights ----
    // The probabilistic record-linkage trainer (Fellegi & Sunter
    // 1969): per-comparator m = P(agree | match) and u = P(agree |
    // non-match) estimated from two labeled pair sets — matches = the
    // LSH-verified near-dup pairs (MinhashPipeline, band-bounded),
    // non-matches = an md5-capped even×odd pair block (≤64 per side,
    // bounded at ANY corpus size, minus any accidental matches) —
    // with Laplace-smoothed probabilities and the log-likelihood
    // agreement/disagreement weights ln(m/u), ln((1−m)/(1−u)) a
    // linkage scorer would sum per field. Four comparators: same
    // source, same lang, length within 20%, token-Jaccard ≥ 0.3.
    // Both pair sets are bounded, so the attribute joins and the
    // per-pair set math never touch a corpus² stage.
    sql(
      "q_fellegi_sunter",
      s"""WITH ${MinhashPipeline.pairsSqlCte},
        |at AS (SELECT doc_id, source, lang, n_chars,
        |    list_distinct(list_filter(string_split(text, ' '),
        |      x -> length(x) > 0)) AS tk
        |  FROM documents),
        |ue AS (SELECT doc_id, row_number() OVER (ORDER BY
        |         md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
        |       FROM documents WHERE doc_id % 2 = 0 QUALIFY r <= 64),
        |uo AS (SELECT doc_id, row_number() OVER (ORDER BY
        |         md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
        |       FROM documents WHERE doc_id % 2 = 1 QUALIFY r <= 64),
        |up AS (SELECT least(e.doc_id, o.doc_id) AS da,
        |         greatest(e.doc_id, o.doc_id) AS db
        |       FROM ue e CROSS JOIN uo o),
        |un AS (SELECT u.da, u.db FROM up u
        |       LEFT JOIN pairs p ON p.da = u.da AND p.db = u.db
        |       WHERE p.da IS NULL),
        |fm AS (SELECT p.da, p.db,
        |    CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS f1,
        |    CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END AS f2,
        |    CASE WHEN abs(a.n_chars - b.n_chars)
        |         <= 0.2 * greatest(a.n_chars, b.n_chars) THEN 1 ELSE 0 END AS f3,
        |    CASE WHEN CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x)))
        |           AS DOUBLE)
        |         / (len(a.tk) + len(b.tk)
        |            - len(list_filter(a.tk, x -> list_contains(b.tk, x))))
        |         >= 0.3 THEN 1 ELSE 0 END AS f4
        |  FROM pairs p JOIN at a ON a.doc_id = p.da JOIN at b ON b.doc_id = p.db),
        |fu AS (SELECT u.da, u.db,
        |    CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS f1,
        |    CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END AS f2,
        |    CASE WHEN abs(a.n_chars - b.n_chars)
        |         <= 0.2 * greatest(a.n_chars, b.n_chars) THEN 1 ELSE 0 END AS f3,
        |    CASE WHEN CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x)))
        |           AS DOUBLE)
        |         / (len(a.tk) + len(b.tk)
        |            - len(list_filter(a.tk, x -> list_contains(b.tk, x))))
        |         >= 0.3 THEN 1 ELSE 0 END AS f4
        |  FROM un u JOIN at a ON a.doc_id = u.da JOIN at b ON b.doc_id = u.db),
        |sm AS (SELECT CAST(count(*) AS BIGINT) AS nm,
        |    CAST(sum(f1) AS BIGINT) AS m1, CAST(sum(f2) AS BIGINT) AS m2,
        |    CAST(sum(f3) AS BIGINT) AS m3, CAST(sum(f4) AS BIGINT) AS m4
        |  FROM fm),
        |su AS (SELECT CAST(count(*) AS BIGINT) AS nu,
        |    CAST(sum(f1) AS BIGINT) AS u1, CAST(sum(f2) AS BIGINT) AS u2,
        |    CAST(sum(f3) AS BIGINT) AS u3, CAST(sum(f4) AS BIGINT) AS u4
        |  FROM fu),
        |j AS (SELECT * FROM sm CROSS JOIN su)
        |SELECT * FROM (
        |  SELECT 'f1_same_source' AS field, nm AS n_match_pairs,
        |    nu AS n_nonmatch_pairs,
        |    round((m1 + 0.5) / (nm + 1.0), 6) AS m_prob,
        |    round((u1 + 0.5) / (nu + 1.0), 6) AS u_prob,
        |    round(ln(((m1 + 0.5) / (nm + 1.0)) / ((u1 + 0.5) / (nu + 1.0))), 6)
        |      AS w_agree,
        |    round(ln((1 - (m1 + 0.5) / (nm + 1.0))
        |             / (1 - (u1 + 0.5) / (nu + 1.0))), 6) AS w_disagree
        |  FROM j
        |  UNION ALL SELECT 'f2_same_lang', nm, nu,
        |    round((m2 + 0.5) / (nm + 1.0), 6), round((u2 + 0.5) / (nu + 1.0), 6),
        |    round(ln(((m2 + 0.5) / (nm + 1.0)) / ((u2 + 0.5) / (nu + 1.0))), 6),
        |    round(ln((1 - (m2 + 0.5) / (nm + 1.0))
        |             / (1 - (u2 + 0.5) / (nu + 1.0))), 6) FROM j
        |  UNION ALL SELECT 'f3_len_within_20pct', nm, nu,
        |    round((m3 + 0.5) / (nm + 1.0), 6), round((u3 + 0.5) / (nu + 1.0), 6),
        |    round(ln(((m3 + 0.5) / (nm + 1.0)) / ((u3 + 0.5) / (nu + 1.0))), 6),
        |    round(ln((1 - (m3 + 0.5) / (nm + 1.0))
        |             / (1 - (u3 + 0.5) / (nu + 1.0))), 6) FROM j
        |  UNION ALL SELECT 'f4_jaccard_030', nm, nu,
        |    round((m4 + 0.5) / (nm + 1.0), 6), round((u4 + 0.5) / (nu + 1.0), 6),
        |    round(ln(((m4 + 0.5) / (nm + 1.0)) / ((u4 + 0.5) / (nu + 1.0))), 6),
        |    round(ln((1 - (m4 + 0.5) / (nm + 1.0))
        |             / (1 - (u4 + 0.5) / (nu + 1.0))), 6) FROM j)
        |ORDER BY field""".stripMargin) { (s, dir) =>
      val mPairs = MinhashPipeline.pairs(s, dir).select("da", "db")
        .localCheckpoint() // band-bounded labeled matches
      val docs = t(s, dir, "documents")
      val at = docs.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"),
        array_distinct(filter(split(col("text"), " "),
          x => length(x) > 0)).as("tk"))
      def side(parity: Int, out: String) = docs
        .where(col("doc_id") % 2 === parity)
        .withColumn("r", row_number().over(
          Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        .where(col("r") <= 64)
        .select(col("doc_id").as(out))
      val up = side(0, "ea").crossJoin(broadcast(side(1, "ob")))
        .select(least(col("ea"), col("ob")).as("da"),
          greatest(col("ea"), col("ob")).as("db"))
      val un = up.join(mPairs, Seq("da", "db"), "left_anti")
      def fields(pairs: DataFrame) = {
        val a = at.select(col("doc_id").as("da"), col("source").as("sa"),
          col("lang").as("la"), col("n_chars").as("ca"), col("tk").as("tka"))
        val b = at.select(col("doc_id").as("db"), col("source").as("sb"),
          col("lang").as("lb"), col("n_chars").as("cb"), col("tk").as("tkb"))
        val inter = size(array_intersect(col("tka"), col("tkb")))
        val jac = inter.cast("double")
          ./(size(col("tka")) + size(col("tkb")) - inter)
        pairs.join(a, "da").join(b, "db")
          .select(when(col("sa") === col("sb"), 1L).otherwise(0L).as("f1"),
            when(col("la") === col("lb"), 1L).otherwise(0L).as("f2"),
            when(abs(col("ca") - col("cb"))
              <= lit(0.2) * greatest(col("ca"), col("cb")), 1L)
              .otherwise(0L).as("f3"),
            when(jac >= 0.3, 1L).otherwise(0L).as("f4"))
          .agg(count(lit(1)).as("n"), sum("f1").as("s1"), sum("f2").as("s2"),
            sum("f3").as("s3"), sum("f4").as("s4"))
      }
      val sm = fields(mPairs).select(col("n").as("nm"), col("s1").as("m1"),
        col("s2").as("m2"), col("s3").as("m3"), col("s4").as("m4"))
      val su = fields(un).select(col("n").as("nu"), col("s1").as("u1"),
        col("s2").as("u2"), col("s3").as("u3"), col("s4").as("u4"))
      val j = sm.crossJoin(broadcast(su)).localCheckpoint() // 1 row
      val names = Seq("f1_same_source" -> ("m1", "u1"),
        "f2_same_lang" -> ("m2", "u2"),
        "f3_len_within_20pct" -> ("m3", "u3"),
        "f4_jaccard_030" -> ("m4", "u4"))
      names.map { case (nm, (mc, uc)) =>
        val mp = (col(mc) + 0.5) / (col("nm") + 1.0)
        val upr = (col(uc) + 0.5) / (col("nu") + 1.0)
        j.select(lit(nm).as("field"), col("nm").as("n_match_pairs"),
          col("nu").as("n_nonmatch_pairs"),
          round(mp, 6).as("m_prob"), round(upr, 6).as("u_prob"),
          round(log(mp / upr), 6).as("w_agree"),
          round(log((lit(1) - mp) / (lit(1) - upr)), 6).as("w_disagree"))
      }.reduce(_ unionByName _).orderBy("field")
    }
  )
}
