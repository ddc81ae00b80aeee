package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring — the canonical corpus-statistics operator for
  * text curation (keyword extraction, quality weighting).
  *
  * Scale notes: tf is a per-doc aggregation, df one hash aggregation
  * over (word) — both partial+final; the doc-count is a broadcast
  * scalar. Top-k terms per sampled doc via row_number, never a global
  * sort of the full term matrix.
  */
object TfIdfQueries {

  import QueryDef.sql

  /** (doc_id, words) corpus projection shared by both scorers. */
  private def wordsByDoc(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("words"))

  /** Exploded postings (doc_id, word, dl) off a wordsByDoc frame. */
  private def postings(w: DataFrame): DataFrame =
    w.select(col("doc_id"), explode(col("words")).as("word"),
      size(col("words")).as("dl"))

  /** Document frequency per word off a postings frame. */
  private def docFreq(ex: DataFrame): DataFrame =
    ex.groupBy("word").agg(countDistinct(col("doc_id")).as("dfc"))

  /** Every doc scored by BOTH rankers for the corpus's top-3-cf query
    * (BM25 k1=1.2 b=0.75; Dirichlet QL μ=2000) — the shared core of
    * q_rank_agreement and q_team_draft. Returns (sc: doc_id/ql/bm,
    * q: the 3-row query-term frame, tf: (doc_id, word, tf) postings
    * counts). One explode pass; query statistics ride a 3-row
    * broadcast; per-doc sums accumulate in DECIMAL(28,12) so the
    * double scores are merge-order-independent. */
  private def qlBmScores(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val w = wordsByDoc(s, dir)
    val p = postings(w)
    val tf = p.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val cf = p.groupBy("word")
      .agg(count(lit(1)).as("cf"), countDistinct("doc_id").as("df"))
    val tot = p.agg(count(lit(1)).as("ctot"))
    val dlen = w.select(col("doc_id"), size(col("words")).cast("long").as("dl"))
    val ndf = dlen.agg(count(lit(1)).as("nd"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val q = cf
      .withColumn("r", row_number().over(Window.orderBy(desc("cf"), col("word"))))
      .where(col("r") <= 3)
      .crossJoin(broadcast(tot)).crossJoin(broadcast(ndf))
      .select(col("word"), col("cf"), col("df"), col("ctot"), col("nd"),
        col("avgdl"))
      .localCheckpoint() // 3-row query + corpus scalars
    val fan = dlen.crossJoin(broadcast(q))
    val tfv = coalesce(col("tf"), lit(0L))
    val ql = log((tfv + lit(2000.0) * col("cf") / col("ctot"))
      / (col("dl") + lit(2000.0)))
    val bm = log(((col("nd") - col("df") + 0.5) / (col("df") + 0.5)) + 1.0)
      .*(tfv * 2.2)
      ./(tfv + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val sc = fan.join(tf.select(col("doc_id").as("tdoc"),
        col("word").as("tword"), col("tf")),
        col("tdoc") === fan("doc_id") && col("tword") === col("word"), "left")
      .groupBy(fan("doc_id").as("doc_id"))
      .agg(sum(ql.cast("decimal(28,12)")).cast("double").as("ql"),
        sum(bm.cast("decimal(28,12)")).cast("double").as("bm"))
    (sc, q.select(col("word")), tf)
  }

  /** First-8-hex-chars md5 coin, the JVM-side twin of the repo's h32
    * SQL convention (('0x' || substr(md5(s),1,8))::BIGINT). */
  def md5Coin(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      d.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
  }

  val defs: Seq[QueryDef] = Seq(

    sql(
      "q_tfidf_top_terms",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |tot AS (SELECT count(*) AS n FROM w),
        |ex AS (SELECT doc_id, unnest(words) AS word, len(words) AS dl FROM w),
        |tf AS (SELECT doc_id, word, count(*) * 1.0 / max(dl) AS tf
        |       FROM ex GROUP BY doc_id, word),
        |df AS (SELECT word, count(DISTINCT doc_id) AS dfc FROM ex GROUP BY word),
        |sc AS (SELECT tf.doc_id, tf.word,
        |              round(tf.tf * ln((SELECT n FROM tot) * 1.0 / df.dfc), 6) AS score
        |       FROM tf JOIN df ON tf.word = df.word
        |       WHERE tf.doc_id % 50 = 0)
        |SELECT doc_id, word, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY score DESC, word) AS rn
        |  FROM sc)
        |WHERE rn <= 3
        |ORDER BY doc_id, score DESC, word""".stripMargin) { (s, dir) =>
      val w = wordsByDoc(s, dir)
      // Doc count stays IN the plan (broadcast 1-row aggregate joined
      // cross) — a driver-side w.count() would be a second full corpus
      // scan before the main job even starts.
      val tot = w.agg(count(lit(1)).as("n_docs"))
      val ex = postings(w)
      val tf = ex.groupBy("doc_id", "word")
        .agg((count(lit(1)) * 1.0 / max(col("dl"))).as("tf"))
      val df = docFreq(ex)
      val win = Window.partitionBy(col("doc_id")).orderBy(desc("score"), col("word"))
      tf.where(col("doc_id") % 50 === 0)
        .join(df, "word")
        .crossJoin(broadcast(tot))
        .withColumn("score", round(col("tf") * log(col("n_docs") * 1.0 / col("dfc")), 6))
        .withColumn("rn", row_number().over(win))
        .where(col("rn") <= 3)
        .select(col("doc_id"), col("word"), col("score"))
        .orderBy(col("doc_id"), desc("score"), col("word"))
    },

    // ---- BM25 retrieval scoring (Okapi k1=1.2 b=0.75) for a fixed
    // query-term set — the standard lexical ranker for corpus search
    // and contamination triage. The term filter lands before the tf/df
    // aggregations, so the shuffled term matrix holds only query
    // terms; n_docs/avgdl ride as a broadcast 1-row aggregate.
    sql(
      "q_bm25",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |stats AS (SELECT count(*) * 1.0 AS n_docs, avg(len(words)) AS avgdl FROM w),
        |ex AS (SELECT doc_id, unnest(words) AS word, len(words) AS dl FROM w),
        |tf AS (SELECT doc_id, word, count(*) * 1.0 AS tf, max(dl) AS dl
        |       FROM ex WHERE word IN ('spark', 'merge', 'vector')
        |       GROUP BY doc_id, word),
        |df AS (SELECT word, count(DISTINCT doc_id) AS dfc FROM ex
        |       WHERE word IN ('spark', 'merge', 'vector') GROUP BY word),
        |sc AS (SELECT tf.doc_id,
        |              ln(((SELECT n_docs FROM stats) - df.dfc + 0.5) / (df.dfc + 0.5) + 1.0)
        |                * tf.tf * 2.2
        |                / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / (SELECT avgdl FROM stats))) AS s
        |       FROM tf JOIN df ON tf.word = df.word)
        |SELECT doc_id, round(sum(s), 6) AS bm25
        |FROM sc GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin) { (s, dir) =>
      val qTerms = Seq("spark", "merge", "vector")
      val w = wordsByDoc(s, dir)
      val stats = w.agg(
        (count(lit(1)) * 1.0).as("n_docs"),
        avg(size(col("words"))).as("avgdl"))
      // tf and df both branch off the filtered postings; the branch
      // recompute (scan + explode + isin) measures CHEAPER at bench
      // scale than a localCheckpoint materialization (0.86 s vs
      // 1.35 s), so the recompute stays. At a 100 TB corpus the
      // tradeoff flips — persist/checkpoint `ex` there.
      val ex = postings(w).where(col("word").isin(qTerms: _*))
      val tf = ex.groupBy("doc_id", "word")
        .agg((count(lit(1)) * 1.0).as("tf"), max(col("dl")).as("dl"))
      val df = docFreq(ex)
      tf.join(broadcast(df), "word")
        .crossJoin(broadcast(stats))
        .withColumn("s",
          log((col("n_docs") - col("dfc") + 0.5) / (col("dfc") + 0.5) + 1.0)
            * col("tf") * 2.2
            / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy("doc_id")
        .agg(round(sum(col("s")), 6).as("bm25"))
        .orderBy(desc("bm25"), col("doc_id"))
        .limit(15)
    },

    // ---- reciprocal rank fusion ----
    // RRF (Cormack et al. 2009) — the standard way to merge rankings
    // from heterogeneous retrieval/curation signals without score
    // calibration: score(d) = Σ_r 1/(60 + rank_r(d)). Fused here over
    // three per-language document rankings (chars, whitespace tokens,
    // distinct vocabulary), top-5 per language. The rankings PARTITION
    // BY lang — per-slice windows, no global sort (a corpus-wide RRF
    // would rank through GlobalPrefix instead). All three signals and
    // the distinct-vocab count derive from ONE token pass + the base
    // table; each 1/(60+r) term is an exact small rational summed in
    // a fixed-order projection, so the fused score is bit-identical
    // on both engines and the top-5 cut cannot flip. Ties (distinct
    // rank triples CAN sum to equal scores — permutations) break by
    // doc_id on both sides.
    sql(
      "q_rrf_fusion",
      """WITH base AS (SELECT doc_id, lang, n_chars,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |      FROM documents),
        |dt AS (SELECT doc_id, CAST(count(DISTINCT word) AS BIGINT) AS n_dis
        |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |             FROM documents) GROUP BY doc_id),
        |j AS (SELECT b.doc_id, b.lang, b.n_chars, b.n_tok, dt.n_dis
        |      FROM base b JOIN dt ON dt.doc_id = b.doc_id),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY n_chars DESC, doc_id) AS r1,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY n_tok DESC, doc_id) AS r2,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY n_dis DESC, doc_id) AS r3
        |      FROM j),
        |f AS (SELECT doc_id, lang, r1, r2, r3,
        |        CAST(1 AS DOUBLE) / (60 + r1) + CAST(1 AS DOUBLE) / (60 + r2)
        |        + CAST(1 AS DOUBLE) / (60 + r3) AS rrf
        |      FROM r)
        |SELECT lang, doc_id, r1, r2, r3, round(rrf, 6) AS rrf
        |FROM (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY rrf DESC, doc_id) AS rk FROM f)
        |WHERE rk <= 5 ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      val w = wordsByDoc(s, dir)
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          graft.functions.TextFunctions.tokens(col("text"))
            .as("words"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(col("words")).cast("long").as("n_tok"))
      val dt = postings(w).select("doc_id", "word").distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_dis"))
      val j = base.join(dt, Seq("doc_id"))
      def rk(sig: String) = row_number().over(
        Window.partitionBy("lang").orderBy(desc(sig), col("doc_id")))
        .cast("long")
      val r = j.select(col("doc_id"), col("lang"),
        rk("n_chars").as("r1"), rk("n_tok").as("r2"), rk("n_dis").as("r3"))
      val f = r.withColumn("rrf",
        lit(1).cast("double") / (lit(60) + col("r1"))
          + lit(1).cast("double") / (lit(60) + col("r2"))
          + lit(1).cast("double") / (lit(60) + col("r3")))
      f.withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(desc("rrf"), col("doc_id"))))
        .where(col("rk") <= 5)
        .select(col("lang"), col("doc_id"), col("r1"), col("r2"), col("r3"),
          round(col("rrf"), 6).as("rrf"))
        .orderBy("lang", "doc_id")
    },

    // ---- Dirichlet-smoothed query likelihood (LM retrieval) ----
    // The language-model retrieval scorer next to q_bm25 (Zhai &
    // Lafferty 2001): score(d) = Σ_t ln((tf_td + μ·p(t|C)) / (|d|+μ)),
    // μ = 2000, over a deterministic 3-term query (the corpus's top-3
    // tokens by collection frequency). One explode pass builds the
    // postings; the collection LM is vocabulary-sized; the query is a
    // 3-row broadcast fanning the doc-length frame (docs missing a
    // term still contribute the smoothing-only term — LEFT join, not
    // inner). Top-20 by score.
    sql(
      "q_dirichlet_ql",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |p AS (SELECT doc_id, unnest(words) AS word, len(words) AS dl FROM w),
        |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf,
        |         CAST(max(dl) AS BIGINT) AS dl
        |       FROM p GROUP BY 1, 2),
        |cf AS (SELECT word, CAST(count(*) AS BIGINT) AS cf FROM p GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS ctot FROM p),
        |q AS (SELECT word, cf, row_number() OVER (ORDER BY cf DESC, word) AS r
        |      FROM cf QUALIFY r <= 3),
        |dlen AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |         FROM documents),
        |fan AS (SELECT d.doc_id, d.dl, q.word, q.cf FROM dlen d CROSS JOIN q),
        |sc AS (SELECT f.doc_id,
        |    CAST(sum(CAST(ln((coalesce(t.tf, 0) + 2000.0 * f.cf
        |                      / (SELECT ctot FROM tot)) / (f.dl + 2000.0))
        |                  AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS s
        |  FROM fan f LEFT JOIN tf t ON t.doc_id = f.doc_id AND t.word = f.word
        |  GROUP BY 1)
        |SELECT doc_id, round(CAST(s AS DOUBLE), 6) AS ql_score,
        |  CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank
        |FROM sc QUALIFY rank <= 20 ORDER BY rank""".stripMargin) { (s, dir) =>
      val w = wordsByDoc(s, dir)
      val p = postings(w)
      val tf = p.groupBy("doc_id", "word")
        .agg(count(lit(1)).as("tf"), max("dl").cast("long").as("dl"))
      val cf = p.groupBy("word").agg(count(lit(1)).as("cf"))
      val tot = p.agg(count(lit(1)).as("ctot"))
      val q = cf
        .withColumn("r", row_number().over(Window.orderBy(desc("cf"), col("word"))))
        .where(col("r") <= 3)
        .crossJoin(broadcast(tot))
        .select(col("word"), col("cf"), col("ctot"))
        .localCheckpoint() // the 3-row query + collection total
      val dlen = w.select(col("doc_id"), size(col("words")).cast("long").as("dl"))
      val fan = dlen.crossJoin(broadcast(q))
      val term = log((coalesce(col("tf"), lit(0L)) + lit(2000.0) * col("cf")
        / col("ctot")) / (col("dl") + lit(2000.0)))
      val sc = fan.join(tf.select(col("doc_id").as("tdoc"),
          col("word").as("tword"), col("tf")),
          col("tdoc") === fan("doc_id") && col("tword") === col("word"), "left")
        .groupBy(fan("doc_id").as("doc_id"))
        .agg(sum(term.cast("decimal(28,12)")).cast("decimal(38,12)").as("s"))
      sc.withColumn("rank", row_number()
          .over(Window.orderBy(desc("s"), col("doc_id"))).cast("long"))
        .where(col("rank") <= 20)
        .select(col("doc_id"), round(col("s").cast("double"), 6).as("ql_score"),
          col("rank"))
        .orderBy("rank")
    },

    // ---- retrieval-ranker agreement (BM25 vs Dirichlet QL) ----
    // Do the two scorers order the corpus the same way? Both score
    // EVERY doc for the same top-3-cf query (BM25 k1=1.2 b=0.75;
    // QL μ=2000), rank deterministically on the rounded scores, and
    // the output is the exact tie-free Spearman ρ between the two
    // rankings (doubled-rank-free: row_number ranks, integer d²
    // accumulated in DECIMAL(38,0) — overflow-proof at any n) plus
    // the top-20 overlap. The scorer-swap regression gate for a
    // retrieval stack. One explode pass; the query statistics ride a
    // 3-row broadcast.
    sql(
      "q_rank_agreement",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |p AS (SELECT doc_id, unnest(words) AS word, len(words) AS dl FROM w),
        |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
        |       FROM p GROUP BY 1, 2),
        |cf AS (SELECT word, CAST(count(*) AS BIGINT) AS cf,
        |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM p GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS ctot FROM p),
        |dlen AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |         FROM documents),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |       FROM dlen),
        |q AS (SELECT word, cf, df, row_number() OVER (ORDER BY cf DESC, word) AS r
        |      FROM cf QUALIFY r <= 3),
        |fan AS (SELECT d.doc_id, d.dl, q.word, q.cf, q.df FROM dlen d CROSS JOIN q),
        |sc AS (SELECT f.doc_id,
        |    CAST(sum(CAST(ln((coalesce(t.tf, 0) + 2000.0 * f.cf
        |                      / (SELECT ctot FROM tot)) / (f.dl + 2000.0))
        |                  AS DECIMAL(28,12))) AS DOUBLE) AS ql,
        |    CAST(sum(CAST(ln(((SELECT nd FROM nd) - f.df + 0.5) / (f.df + 0.5) + 1.0)
        |                  * (coalesce(t.tf, 0) * 2.2)
        |                  / (coalesce(t.tf, 0) + 1.2 * (0.25 + 0.75 * f.dl
        |                      / (SELECT avgdl FROM nd)))
        |                  AS DECIMAL(28,12))) AS DOUBLE) AS bm
        |  FROM fan f LEFT JOIN tf t ON t.doc_id = f.doc_id AND t.word = f.word
        |  GROUP BY 1),
        |r AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY round(ql, 6) DESC, doc_id) AS BIGINT) AS rq,
        |    CAST(row_number() OVER (ORDER BY round(bm, 6) DESC, doc_id) AS BIGINT) AS rb
        |  FROM sc)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  round(1.0 - 6.0 * CAST(sum(CAST((rq - rb) * (rq - rb) AS DECIMAL(38,0)))
        |          AS DOUBLE)
        |        / (CAST(count(*) AS DOUBLE)
        |           * (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) - 1)), 6)
        |    AS spearman,
        |  CAST(sum(CASE WHEN rq <= 20 AND rb <= 20 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS top20_overlap
        |FROM r""".stripMargin) { (s, dir) =>
      val (sc, _, _) = qlBmScores(s, dir)
      val r = sc
        .withColumn("rq", row_number()
          .over(Window.orderBy(round(col("ql"), 6).desc, col("doc_id")))
          .cast("long"))
        .withColumn("rb", row_number()
          .over(Window.orderBy(round(col("bm"), 6).desc, col("doc_id")))
          .cast("long"))
      val nD = count(lit(1)).cast("double")
      r.agg(count(lit(1)).as("n_docs"),
          sum(((col("rq") - col("rb")) * (col("rq") - col("rb")))
            .cast("decimal(38,0)")).as("sd2"),
          sum(when(col("rq") <= 20 && col("rb") <= 20, 1L).otherwise(0L))
            .as("top20_overlap"))
        .select(col("n_docs"),
          round(lit(1.0) - lit(6.0) * col("sd2").cast("double")
            / (col("n_docs").cast("double")
              * (col("n_docs").cast("double") * col("n_docs").cast("double")
                - 1)), 6).as("spearman"),
          col("top20_overlap"))
    },

    // ---- team-draft interleaving (online ranker A/B evaluation) ----
    // Radlinski, Kurup & Joachims, CIKM 2008: to compare two rankers
    // on live traffic, interleave their top lists like schoolyard team
    // captains — the team with fewer picks (fair coin on ties) drafts
    // its highest-ranked not-yet-picked doc — and credit each click to
    // the team that drafted the clicked doc; the ranker with more
    // clicked picks is preferred. Run here over the repo's two lexical
    // rankers (Dirichlet QL = team A, BM25 = team B) on the corpus's
    // top-3-cf query, to interleave depth 10 from each ranker's
    // top-20. Per the repo's seeded-randomness convention the tie
    // coins are md5 draws keyed on position, and the click model is
    // deterministic: a doc is clicked iff it contains ALL three query
    // terms AND its md5 click coin passes (2-in-3) — relevance-
    // conditioned noisy clicks, reproducible cross-engine. Scale
    // shape: both rankings come from the ONE shared scoring pass
    // (qlBmScores); the top-20s are TakeOrdered (no global sort); the
    // draft itself folds over 40 collected rows INSIDE an executor
    // (flatMap on a 1-row Dataset — not a driver loop), and the click
    // join broadcasts the 10-row interleaved list both ways. Output:
    // the full interleaved list with per-team click totals and the
    // preference verdict riding every row.
    sql(
      "q_team_draft",
      """WITH RECURSIVE
        |w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |p AS (SELECT doc_id, unnest(words) AS word, len(words) AS dl FROM w),
        |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
        |       FROM p GROUP BY 1, 2),
        |cf AS (SELECT word, CAST(count(*) AS BIGINT) AS cf,
        |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM p GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS ctot FROM p),
        |dlen AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |         FROM documents),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |       FROM dlen),
        |q AS (SELECT word, cf, df, row_number() OVER (ORDER BY cf DESC, word) AS r
        |      FROM cf QUALIFY r <= 3),
        |fan AS (SELECT d.doc_id, d.dl, q.word, q.cf, q.df FROM dlen d CROSS JOIN q),
        |sc AS (SELECT f.doc_id,
        |    CAST(sum(CAST(ln((coalesce(t.tf, 0) + 2000.0 * f.cf
        |                      / (SELECT ctot FROM tot)) / (f.dl + 2000.0))
        |                  AS DECIMAL(28,12))) AS DOUBLE) AS ql,
        |    CAST(sum(CAST(ln(((SELECT nd FROM nd) - f.df + 0.5) / (f.df + 0.5) + 1.0)
        |                  * (coalesce(t.tf, 0) * 2.2)
        |                  / (coalesce(t.tf, 0) + 1.2 * (0.25 + 0.75 * f.dl
        |                      / (SELECT avgdl FROM nd)))
        |                  AS DECIMAL(28,12))) AS DOUBLE) AS bm
        |  FROM fan f LEFT JOIN tf t ON t.doc_id = f.doc_id AND t.word = f.word
        |  GROUP BY 1),
        |ta AS (SELECT doc_id, CAST(row_number() OVER
        |         (ORDER BY round(ql, 6) DESC, doc_id) AS BIGINT) AS rank
        |       FROM sc QUALIFY rank <= 20),
        |tb AS (SELECT doc_id, CAST(row_number() OVER
        |         (ORDER BY round(bm, 6) DESC, doc_id) AS BIGINT) AS rank
        |       FROM sc QUALIFY rank <= 20),
        |rel AS (SELECT doc_id FROM (
        |         SELECT t.doc_id, count(DISTINCT t.word) AS nq
        |         FROM tf t JOIN q ON q.word = t.word GROUP BY 1)
        |        WHERE nq >= 3
        |          AND ('0x' || substr(md5('click:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 3 < 2),
        |it AS (
        |  SELECT CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS doc_id,
        |         '' AS team, []::BIGINT[] AS picked,
        |         CAST(0 AS BIGINT) AS na, CAST(0 AS BIGINT) AS nb
        |  UNION ALL
        |  SELECT pos + 1, d,
        |         CASE WHEN isa THEN 'A' ELSE 'B' END,
        |         list_append(picked, d),
        |         na + CASE WHEN isa THEN 1 ELSE 0 END,
        |         nb + CASE WHEN isa THEN 0 ELSE 1 END
        |  FROM (
        |    SELECT x.*,
        |      CASE WHEN isa THEN (SELECT min_by(t.doc_id, t.rank) FROM ta t
        |                          WHERE NOT list_contains(x.picked, t.doc_id))
        |           ELSE (SELECT min_by(t.doc_id, t.rank) FROM tb t
        |                 WHERE NOT list_contains(x.picked, t.doc_id)) END AS d
        |    FROM (SELECT it.*,
        |            (na < nb OR (na = nb AND
        |               ('0x' || substr(md5('td:' || CAST(pos + 1 AS VARCHAR)), 1, 8))::BIGINT % 2 = 0))
        |              AS isa
        |          FROM it WHERE pos < 10) x
        |  )
        |),
        |res AS (SELECT pos, doc_id, team,
        |          CASE WHEN doc_id IN (SELECT doc_id FROM rel)
        |               THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS clicked
        |        FROM it WHERE pos >= 1),
        |tl AS (SELECT CAST(sum(CASE WHEN team = 'A' THEN clicked ELSE 0 END) AS BIGINT) AS clicks_a,
        |              CAST(sum(CASE WHEN team = 'B' THEN clicked ELSE 0 END) AS BIGINT) AS clicks_b
        |       FROM res)
        |SELECT r.pos, r.doc_id, r.team, r.clicked, tl.clicks_a, tl.clicks_b,
        |       CASE WHEN tl.clicks_a > tl.clicks_b THEN 'A'
        |            WHEN tl.clicks_b > tl.clicks_a THEN 'B' ELSE 'tie' END AS preferred
        |FROM res r, tl ORDER BY r.pos""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (sc, qTerms, tf) = qlBmScores(s, dir)
      def top20(score: String) = sc
        .orderBy(round(col(score), 6).desc, col("doc_id"))
        .limit(20)
        .withColumn("rank", row_number()
          .over(Window.orderBy(round(col(score), 6).desc, col("doc_id"))))
        .select(col("rank"), col("doc_id"))
      val aArr = top20("ql")
        .agg(sort_array(collect_list(
          struct(col("rank").as("_1"), col("doc_id").as("_2")))).as("a"))
      val bArr = top20("bm")
        .agg(sort_array(collect_list(
          struct(col("rank").as("_1"), col("doc_id").as("_2")))).as("b"))
      // the draft: a 40-element executor-side fold on the 1-row frame
      val inter = aArr.crossJoin(bArr)
        .as[(Seq[(Int, Long)], Seq[(Int, Long)])]
        .flatMap { case (a, b) =>
          val aDocs = a.map(_._2)
          val bDocs = b.map(_._2)
          val picked = scala.collection.mutable.HashSet.empty[Long]
          var (na, nb) = (0, 0)
          (1 to 10).map { pos =>
            val isA = na < nb ||
              (na == nb && md5Coin(s"td:$pos") % 2 == 0)
            val d = (if (isA) aDocs else bDocs).find(!picked.contains(_)).get
            picked += d
            if (isA) na += 1 else nb += 1
            (pos.toLong, d, if (isA) "A" else "B")
          }
        }
        .toDF("pos", "doc_id", "team")
      // clicked docs among the 10 shown: relevance (all 3 terms) AND
      // the 2-in-3 click coin; both joins broadcast the 10-row side
      import graft.functions.TextFunctions.h32
      val rel = tf.join(broadcast(qTerms), "word")
        .groupBy("doc_id").agg(countDistinct("word").as("nq"))
        .where(col("nq") >= 3 &&
          h32(concat(lit("click:"), col("doc_id").cast("string"))) % 3 < 2)
        .join(broadcast(inter.select("doc_id")), "doc_id", "leftsemi")
        .select(col("doc_id"), lit(1L).as("clicked1"))
      val res = inter.join(broadcast(rel), Seq("doc_id"), "left")
        .select(col("pos"), col("doc_id"), col("team"),
          coalesce(col("clicked1"), lit(0L)).as("clicked"))
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      res
        .withColumn("clicks_a", sum(when(col("team") === "A", col("clicked"))
          .otherwise(0L)).over(wAll).cast("long"))
        .withColumn("clicks_b", sum(when(col("team") === "B", col("clicked"))
          .otherwise(0L)).over(wAll).cast("long"))
        .withColumn("preferred", when(col("clicks_a") > col("clicks_b"), "A")
          .when(col("clicks_b") > col("clicks_a"), "B").otherwise("tie"))
        .orderBy("pos")
    }
  )
}
