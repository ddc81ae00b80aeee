package graft.llm

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation (SURVEY.md §2.2
  * north-star set): token counting (whitespace + regex), quality
  * scoring, stopword-profile language ID, and document
  * fingerprinting. All per-row codegen'd column math — embarrassingly
  * parallel, no shuffles beyond the final aggregation where present.
  */
object TextAnalysisQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)



  /** One BPE merge round as DuckDB CTEs (consumes s{r-1}, defines
    * p/pc/b/mt/kp/s for round r) — shared by the trainer and apply
    * oracles. */
  private def bpeRoundSql(r: Int): String = {
        val p = r - 1
        s"""p$r AS (SELECT word, cnt, pos, sym,
           |         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
           |         FROM s$p),
           |pc$r AS (SELECT sym AS s1, nxt AS s2, CAST(sum(cnt) AS BIGINT) AS c
           |          FROM p$r WHERE nxt IS NOT NULL GROUP BY 1, 2),
           |b$r AS (SELECT s1, s2, c FROM pc$r ORDER BY c DESC, s1, s2 LIMIT 1),
           |mt$r AS (SELECT p.word, p.pos,
           |            row_number() OVER (PARTITION BY p.word ORDER BY p.pos) AS rn
           |          FROM p$r p, b$r b WHERE p.sym = b.s1 AND p.nxt = b.s2),
           |kp$r AS (SELECT word, pos FROM
           |           (SELECT word, pos,
           |              row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS ri
           |            FROM mt$r)
           |          WHERE ri % 2 = 1),
           |s$r AS (SELECT word, cnt,
           |           CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT) AS pos,
           |           sym FROM (
           |             SELECT p.word, p.cnt, p.pos,
           |               CASE WHEN k.pos IS NOT NULL THEN p.sym || p.nxt ELSE p.sym END AS sym
           |             FROM p$r p
           |             LEFT JOIN kp$r k ON k.word = p.word AND k.pos = p.pos
           |             LEFT JOIN kp$r d ON d.word = p.word AND d.pos = p.pos - 1
           |             WHERE d.pos IS NULL))""".stripMargin
  }

  /** BPE base CTEs (word dict + char symbol table s0); raw-margin
    * text for interpolation into a caller's stripMargin string. */
  private val bpeBaseSql: String =
    s"""wd AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM
           |        (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           |        WHERE word <> '' GROUP BY 1),
           |s0 AS (SELECT word, cnt, CAST(i AS BIGINT) AS pos, substr(word, CAST(i AS INT), 1) AS sym
           |       FROM wd, unnest(range(1, len(word) + 1)) AS t(i)
           |       UNION ALL SELECT word, cnt, len(word) + 1, '</w>' FROM wd)"""

  /** Shared BPE trainer (3 rounds on the word-count dictionary):
    * (per-round 1-row merge-rule frames, LAZY final symbol table) —
    * the final table is not materialized here; q_bpe_merge never
    * executes it, q_bpe_apply does. */
  def bpeTrain(s: SparkSession, dir: String)
      : (Seq[org.apache.spark.sql.DataFrame], org.apache.spark.sql.DataFrame) = {
    var lastMerged: org.apache.spark.sql.DataFrame = null
        import org.apache.spark.sql.expressions.Window
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    // empty tokens (split artifacts of doubled spaces) are
    // excluded on BOTH sides: Spark's sequence(1, 0) would emit a
    // DESCENDING [1, 0] position array for the empty word while
    // the oracle's range(1, 1) emits nothing — a latent engine
    // divergence plus duplicate positions under the per-word
    // windows (review find, r8)
    val wd = t(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val s0 = wd
      .select(col("word"), col("cnt"),
        posexplode(transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))))
      .select(col("word"), col("cnt"),
        (col("pos") + 1).cast("long").as("pos"), col("col").as("sym"))
      .unionByName(wd.select(col("word"), col("cnt"),
        (length(col("word")) + 1).cast("long").as("pos"), lit("</w>").as("sym")))
    val worder = Window.partitionBy("word").orderBy("pos")
    var seq0 = s0.localCheckpoint(true, ser)
    val rules = (1 to 3).map { r =>
      val p = seq0.withColumn("nxt", lead("sym", 1).over(worder))
        .localCheckpoint(true, ser) // feeds counts, match, rebuild
      val pc = p.where(col("nxt").isNotNull)
        .groupBy(col("sym").as("s1"), col("nxt").as("s2"))
        .agg(sum("cnt").cast("long").as("c"))
      val b = pc.orderBy(desc("c"), col("s1"), col("s2")).limit(1)
        .localCheckpoint() // 1 row, consumed by the rule AND the match join
      val mt = p.join(broadcast(b),
          col("sym") === col("s1") && col("nxt") === col("s2"))
        .select(col("word"), col("pos"))
        .withColumn("rn", row_number().over(worder))
      val kp = mt.withColumn("ri", row_number().over(
          Window.partitionBy(col("word"), col("pos") - col("rn")).orderBy("pos")))
        .where(col("ri") % 2 === 1).select(col("word"), col("pos"))
      val merged = p
        .join(kp.withColumn("k", lit(1)), Seq("word", "pos"), "left")
        .join(kp.select(col("word"), (col("pos") + 1).as("pos"), lit(1).as("d")),
          Seq("word", "pos"), "left")
        .where(col("d").isNull)
        .select(col("word"), col("cnt"), col("pos"),
          when(col("k").isNotNull, concat(col("sym"), col("nxt")))
            .otherwise(col("sym")).as("sym"))
      val rebuilt = merged
        .withColumn("pos2", row_number().over(worder).cast("long"))
        .select(col("word"), col("cnt"), col("pos2").as("pos"), col("sym"))
      // intermediate rounds checkpoint (they feed the next round's
      // windows); the LAST round stays lazy — q_bpe_merge never runs
      // it, q_bpe_apply does (review find, r8)
      if (r < 3) seq0 = rebuilt.localCheckpoint(true, ser)
      else lastMerged = rebuilt
      b.select(lit(r).as("round"), col("s1"), col("s2"), col("c"))
    }
    (rules, lastMerged)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- one PLSA EM round (2-topic mixture, deterministic init) ----
    // The topic-model rung of the LM family (Hofmann 1999): factor the
    // doc-word count matrix into p(w|z)·p(z|d) — the corpus-structure
    // readout behind domain-mix audits and soft clustering. One
    // EXACTLY-unrollable EM round: init θ₀(d,0) ∈ {0.3, 0.7} by doc
    // parity and φ₀(w,z) ∝ 1+((h32(w)+z) mod 3) (both engines compute
    // the identical integers, so every E-step double is bitwise
    // shared); E-step responsibilities p(z|d,w) = θφ/Σθφ ride the
    // (d,w) count frame; M-step numerators/denominators accumulate as
    // DECIMAL(28,12) of per-row doubles (order-proof, the house
    // convention). Output: top-10 words per topic by the updated
    // φ₁(w,z) (exact-DECIMAL tie order) + topic masses. Scale: ONE
    // corpus tokenize/explode collapses to the (d,w) count frame; the
    // E/M steps are vocabulary-joined map math + two aggregations —
    // at 100 TB this is TF-IDF-shaped work, no new join class.
    sql(
      "q_plsa_round",
      """WITH ndw AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0 GROUP BY 1, 2),
        |voc AS (SELECT DISTINCT word FROM ndw),
        |g AS (SELECT word,
        |        1 + ((('0x' || substr(md5(word), 1, 8))::BIGINT) % 3) AS g0,
        |        1 + ((('0x' || substr(md5(word), 1, 8))::BIGINT + 1) % 3) AS g1
        |      FROM voc),
        |gt AS (SELECT CAST(sum(g0) AS BIGINT) AS t0,
        |              CAST(sum(g1) AS BIGINT) AS t1 FROM g),
        |phi0 AS (SELECT word,
        |           CAST(g0 AS DOUBLE) / (SELECT t0 FROM gt) AS f0,
        |           CAST(g1 AS DOUBLE) / (SELECT t1 FROM gt) AS f1
        |         FROM g),
        |e AS (SELECT ndw.doc_id, ndw.word, ndw.n, p.f0, p.f1,
        |        0.3e0 + 0.4e0 * (ndw.doc_id % 2) AS th0
        |      FROM ndw JOIN phi0 p ON p.word = ndw.word),
        |r AS (SELECT doc_id, word, n,
        |        th0 * f0 / (th0 * f0 + (1e0 - th0) * f1) AS p0,
        |        (1e0 - th0) * f1 / (th0 * f0 + (1e0 - th0) * f1) AS p1
        |      FROM e),
        |m AS (SELECT word,
        |        sum(CAST(n * p0 AS DECIMAL(28,12))) AS m0,
        |        sum(CAST(n * p1 AS DECIMAL(28,12))) AS m1
        |      FROM r GROUP BY 1),
        |z AS (SELECT sum(m0) AS z0, sum(m1) AS z1 FROM m),
        |phi1 AS (SELECT 0 AS topic, word, m0 AS mz,
        |           CAST(m0 AS DOUBLE) / CAST((SELECT z0 FROM z) AS DOUBLE) AS phi,
        |           CAST((SELECT z0 FROM z) AS DOUBLE)
        |             / (CAST((SELECT z0 FROM z) AS DOUBLE)
        |                + CAST((SELECT z1 FROM z) AS DOUBLE)) AS mass
        |         FROM m
        |         UNION ALL
        |         SELECT 1, word, m1,
        |           CAST(m1 AS DOUBLE) / CAST((SELECT z1 FROM z) AS DOUBLE),
        |           CAST((SELECT z1 FROM z) AS DOUBLE)
        |             / (CAST((SELECT z0 FROM z) AS DOUBLE)
        |                + CAST((SELECT z1 FROM z) AS DOUBLE))
        |         FROM m),
        |tk AS (SELECT topic, word, phi, mass,
        |         row_number() OVER (PARTITION BY topic
        |           ORDER BY mz DESC, word) AS rnk
        |       FROM phi1)
        |SELECT CAST(topic AS BIGINT) AS topic, CAST(rnk AS BIGINT) AS rnk,
        |       word, round(phi, 6) AS phi, round(mass, 6) AS topic_mass
        |FROM tk WHERE rnk <= 10
        |ORDER BY topic, rnk""".stripMargin) { (s, dir) =>
      val ndw = t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .where(length(col("word")) > 0)
        .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val g = ndw.select("word").distinct()
        .select(col("word"),
          (lit(1) + h32(col("word")) % 3).as("g0"),
          (lit(1) + (h32(col("word")) + 1) % 3).as("g1"))
      val gt = g.agg(sum("g0").cast("long").as("t0"),
        sum("g1").cast("long").as("t1"))
      val phi0 = g.crossJoin(broadcast(gt))
        .select(col("word"),
          (col("g0").cast("double") / col("t0")).as("f0"),
          (col("g1").cast("double") / col("t1")).as("f1"))
      val th0 = lit(0.3) + lit(0.4) * (col("doc_id") % 2)
      val denom = col("th0") * col("f0") + (lit(1.0) - col("th0")) * col("f1")
      val r = ndw.join(phi0, "word")
        .withColumn("th0", th0)
        .select(col("word"), col("n"),
          (col("th0") * col("f0") / denom).as("p0"),
          ((lit(1.0) - col("th0")) * col("f1") / denom).as("p1"))
      val m = r.groupBy("word")
        .agg(sum((col("n") * col("p0")).cast("decimal(28,12)")).as("m0"),
          sum((col("n") * col("p1")).cast("decimal(28,12)")).as("m1"))
        .localCheckpoint() // vocab-sized; feeds totals + both topic arms
      val z = m.agg(sum("m0").as("z0"), sum("m1").as("z1"))
      val phi1 = m.crossJoin(broadcast(z))
        .select(lit(0L).as("topic"), col("word"), col("m0").as("mz"),
          (col("m0").cast("double") / col("z0").cast("double")).as("phi"),
          (col("z0").cast("double")
            / (col("z0").cast("double") + col("z1").cast("double"))).as("mass"))
        .unionByName(m.crossJoin(broadcast(z))
          .select(lit(1L).as("topic"), col("word"), col("m1").as("mz"),
            (col("m1").cast("double") / col("z1").cast("double")).as("phi"),
            (col("z1").cast("double")
              / (col("z0").cast("double") + col("z1").cast("double"))).as("mass")))
      val wTop = Window.partitionBy("topic").orderBy(desc("mz"), col("word"))
      phi1.withColumn("rnk", row_number().over(wTop).cast("long"))
        .where(col("rnk") <= 10)
        .select(col("topic"), col("rnk"), col("word"),
          round(col("phi"), 6).as("phi"),
          round(col("mass"), 6).as("topic_mass"))
        .orderBy("topic", "rnk")
    },

    // ---- token counting: whitespace + regex (BPE-ish subword bound) ----
    sql(
      "q_token_counts",
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
        |       CAST(len(list_filter(string_split_regex(text, '[^a-z0-9]+'),
        |                       x -> length(x) > 0)) AS INT) AS n_re_tokens,
        |       CAST(list_sum(list_transform(string_split(text, ' '),
        |                     w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
        |       n_chars
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val words = tokens(col("text"))
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          size(words).as("n_ws_tokens"),
          size(filter(split(col("text"), "[^a-z0-9]+"), x => length(x) > 0)).as("n_re_tokens"),
          aggregate(transform(words, w => ceil(length(w) / 4.0)), lit(0L),
            (acc, x) => acc + x).as("n_subwords"),
          col("n_chars"))
        .orderBy("doc_id")
    },

    // ---- quality scoring: length/stopword/uniqueness signals ----
    sql(
      s"""q_text_quality""",
      s"""WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS words FROM documents)
         |SELECT doc_id,
         |       CAST(len(words) AS INT) AS n_tokens,
         |       round(n_chars / len(words), 4) AS chars_per_token,
         |       round(len(list_filter(words, x -> list_contains(${sqlList(stopEn)}, x)))
         |             / len(words), 4) AS stop_ratio,
         |       round(len(list_distinct(words)) / len(words), 4) AS uniq_ratio,
         |       CASE WHEN len(words) >= 10
         |             AND len(list_distinct(words)) / len(words) >= 0.3
         |            THEN 1 ELSE 0 END AS keep
         |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val words = col("words")
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), tokens(col("text")).as("words"))
        .select(
          col("doc_id"),
          size(words).as("n_tokens"),
          round(col("n_chars") / size(words), 4).as("chars_per_token"),
          round(stopwordCount(words, stopEn) / size(words).cast("double"), 4).as("stop_ratio"),
          round(size(array_distinct(words)) / size(words).cast("double"), 4).as("uniq_ratio"),
          when(size(words) >= 10
            && size(array_distinct(words)) / size(words).cast("double") >= 0.3, 1)
            .otherwise(0).as("keep"))
        .orderBy("doc_id")
    },

    // ---- language ID: stopword-profile scoring with argmax ----
    sql(
      "q_lang_id",
      s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
         |sc AS (SELECT doc_id, lang,
         |              len(list_filter(words, x -> list_contains(${sqlList(stopEn)}, x))) AS s_en,
         |              len(list_filter(words, x -> list_contains(${sqlList(stopEs)}, x))) AS s_es,
         |              len(list_filter(words, x -> list_contains(${sqlList(stopDe)}, x))) AS s_de
         |       FROM w)
         |SELECT doc_id, lang AS labeled_lang,
         |       CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en > 0 THEN 'en'
         |            WHEN s_es >= s_de AND s_es > 0 THEN 'es'
         |            WHEN s_de > 0 THEN 'de'
         |            ELSE 'und' END AS detected_lang,
         |       CAST(s_en AS INT) AS s_en, CAST(s_es AS INT) AS s_es,
         |       CAST(s_de AS INT) AS s_de
         |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val sc = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("words"))
        .select(
          col("doc_id"), col("lang"),
          stopwordCount(col("words"), stopEn).as("s_en"),
          stopwordCount(col("words"), stopEs).as("s_es"),
          stopwordCount(col("words"), stopDe).as("s_de"))
      sc.select(
          col("doc_id"), col("lang").as("labeled_lang"),
          when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") > 0, "en")
            .when(col("s_es") >= col("s_de") && col("s_es") > 0, "es")
            .when(col("s_de") > 0, "de")
            .otherwise("und").as("detected_lang"),
          col("s_en"), col("s_es"), col("s_de"))
        .orderBy("doc_id")
    },

    // ---- document fingerprinting: canonical md5 + 32-bit numeric ----
    sql(
      "q_doc_fingerprint",
      """SELECT doc_id,
        |       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |       ('0x' || substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 8))::BIGINT AS fp32,
        |       source
        |FROM documents
        |WHERE doc_id % 5 = 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .where(col("doc_id") % 5 === 0)
        .select(
          col("doc_id"),
          fingerprint(col("text")).as("fp"),
          h32(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp32"),
          col("source"))
        .orderBy("doc_id")
    },

    // ---- winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    //      SIGMOD'03 — the MOSS local document fingerprinting) ----
    // Position-aware near-dup/plagiarism fingerprints with a
    // GUARANTEE the md5-canonical fingerprint lacks: any shared
    // substring of ≥ w+k−1 words produces at least one shared
    // (fingerprint, offset-invariant) selection, because every
    // w-window of k-gram hashes selects its rightmost minimum and
    // matching text spans have matching windows. k = 3 (the corpus
    // shingle convention), w = 4. Relationally: positional k-gram
    // hashes via two lead() columns (one window pass, no HOF
    // re-execution), the per-window min/count in a second ROWS
    // BETWEEN 3 PRECEDING pass, and the rightmost-attaining position
    // by an equi-join on (doc, h = window-min) restricted to the
    // 4-position band — fanout ≤ w, never corpus-quadratic. All
    // per-doc work: partitions by doc_id, no cross-doc shuffle until
    // the final distinct. Hashes are the portable 32-bit md5 prefix
    // (q_doc_fingerprint's fp32), so the oracle checks VALUES. The
    // 10% doc sample bounds output size only — selection is per-doc,
    // so the sample changes no kept row.
    sql(
      "q_winnowing",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents
        |           WHERE doc_id % 10 = 0),
        |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |             ('0x' || substr(md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2]), 1, 8))::BIGINT AS h
        |      FROM w, unnest(range(1, greatest(len(words) - 1, 1))) AS t(i)
        |      WHERE len(words) >= 3),
        |m AS (SELECT doc_id, pos, h,
        |             min(h) OVER win AS wmin,
        |             count(*) OVER win AS wn
        |      FROM g
        |      WINDOW win AS (PARTITION BY doc_id ORDER BY pos
        |                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)),
        |sel AS (SELECT m.doc_id, m.pos AS wend, m.wmin AS fp, max(g2.pos) AS pos
        |        FROM m JOIN g g2 ON g2.doc_id = m.doc_id AND g2.h = m.wmin
        |                 AND g2.pos BETWEEN m.pos - 3 AND m.pos
        |        WHERE m.wn = 4
        |        GROUP BY 1, 2, 3)
        |SELECT doc_id, pos, fp FROM sel GROUP BY 1, 2, 3
        |ORDER BY doc_id, pos, fp""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wd = Window.partitionBy("doc_id").orderBy("pos")
      // positional k-grams: posexplode + two lead()s in ONE window
      // pass (ShinglesArray dedupes, so it can't carry positions)
      val g = t(s, dir, "documents")
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), posexplode(tokens(col("text"))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("w0"))
        .withColumn("w1", lead("w0", 1).over(wd))
        .withColumn("w2", lead("w0", 2).over(wd))
        .where(col("w2").isNotNull)
        .select(col("doc_id"), col("pos"),
          h32(concat_ws(" ", col("w0"), col("w1"), col("w2"))).as("h"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        // feeds the window-min pass AND the rightmost-position join
      val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
      val m = g
        .withColumn("wmin", min("h").over(win))
        .withColumn("wn", count(lit(1)).over(win))
        .where(col("wn") === 4)
        .select(col("doc_id"), col("pos").as("wend"), col("wmin"))
      // (doc, h) as explicit EQUI keys — with doc_id alone the join
      // would fan out len² per doc before the band filter
      val g2 = g.select(col("doc_id").as("gdoc"), col("pos").as("gpos"), col("h"))
      m.join(g2, col("gdoc") === col("doc_id") && col("h") === col("wmin")
          && col("gpos").between(col("wend") - 3, col("wend")))
        .groupBy(col("doc_id"), col("wend"), col("wmin").as("fp"))
        .agg(max(col("gpos")).as("pos"))
        .select(col("doc_id"), col("pos"), col("fp")).distinct()
        .orderBy("doc_id", "pos", "fp")
    },

    // ---- LM-perplexity quality scoring (CCNet-style) ----
    // Corpus-trained add-k bigram LM scores each document in
    // bits-per-token; high-perplexity docs are the classic "remove
    // from training data" candidates. Everything is hash-partitioned
    // group-bys and equi-joins on token keys: the unigram/bigram count
    // tables shuffle on well-distributed word keys, the vocabulary
    // size rides a 1-row broadcast aggregate (the TF-IDF doc-count
    // pattern), and scoring is one shuffle join of bigrams against
    // the LM. At 100 TB the LM table gets a min-count prune (CCNet
    // prunes singletons for exactly this reason) — the join shape is
    // unchanged.
    sql(
      "q_perplexity_bigram",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |bg AS (SELECT doc_id, words[g] AS w1, words[g + 1] AS w2
        |       FROM w, unnest(range(1, len(words))) AS t(g)),
        |uni AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |bi  AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |v   AS (SELECT count(*) AS vsz FROM uni)
        |SELECT bg.doc_id,
        |       CAST(count(*) AS INT) AS n_bigrams,
        |       round(avg(-log2((c2 + 0.5) / (c1 + 0.5 * vsz))), 4) AS bits_per_token,
        |       round(pow(2, avg(-log2((c2 + 0.5) / (c1 + 0.5 * vsz)))), 4) AS ppl
        |FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
        |GROUP BY bg.doc_id
        |ORDER BY bg.doc_id""".stripMargin) { (s, dir) =>
      val words = col("words")
      // bg feeds three consumers (unigram LM, bigram LM, the scoring
      // probe) — materialize it, or the tokenize + interpreted
      // zip_with/explode re-executes per consumer (the
      // q_dedup_ngram_jaccard convention; a persisted intermediate
      // table at cluster scale).
      val bg = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(words) >= 2)
        .select(col("doc_id"),
          explode(zip_with(
            slice(words, lit(1), size(words) - 1),
            slice(words, lit(2), size(words) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .cache()
      val uni = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
      // Smoothing denominator: vsz = |distinct CONTEXT words| (words
      // that start a bigram — doc-final-only tokens are excluded).
      // That is a deliberate, self-consistent choice shared verbatim
      // with the oracle, not the full unigram vocabulary; it falls
      // out of uni's row count — a count over the small LM table, not
      // a second distinct-shuffle over the corpus-sized bigram stream.
      val vocab = uni.agg(count(lit(1)).as("vsz"))
      val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      // Assemble per-bigram bits on the LM side FIRST (bi ⋈ uni is
      // LM-sized — distinct bigrams, not corpus occurrences), so the
      // corpus-sized bigram stream pays ONE shuffle join instead of
      // two. Measured ~20% faster at sf0.1; at 100 TB the saved join
      // is the dominant shuffle.
      val lm = bi.join(uni, Seq("w1")).crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
          (-log2((col("c2") + 0.5) / (col("c1") + col("vsz") * 0.5))).as("bits"))
      bg.join(lm, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_bigrams"), avg(col("bits")).as("b"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("b"), 4).as("bits_per_token"),
          round(pow(lit(2.0), col("b")), 4).as("ppl"))
        .orderBy("doc_id")
    },

    // ---- interpolated Kneser–Ney bigram scoring (KenLM-style) ----
    // The production corpus-quality scorer (CCNet filters on a KenLM
    // n-gram model) uses Kneser–Ney smoothing, not add-k: absolute
    // discount D on the bigram count plus the backed-off CONTINUATION
    // probability (how many distinct contexts a word follows — "San
    // Francisco" makes "Francisco" frequent but poorly-continuing).
    // Same plan shape as q_perplexity_bigram: the three smoothing
    // statistics (context tokens c1, distinct continuations fw,
    // distinct preceding contexts bw) are all one-pass aggregates of
    // the DISTINCT-bigram table, so the LM assembly is LM-sized; the
    // corpus-sized bigram stream pays exactly one shuffle join against
    // the assembled LM. Per-doc bits accumulate as DECIMAL(38,12) —
    // order-free exact addition, no float merge-order exposure (the
    // stricter convention vs q_perplexity_bigram's avg; at 1000
    // executors the combiner tree order is nondeterministic). Double
    // literals are pinned `e0` in the oracle so DuckDB doesn't
    // silently run the probability in DECIMAL arithmetic.
    sql(
      "q_kneser_ney",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |bg AS (SELECT doc_id, words[g] AS w1, words[g + 1] AS w2
        |       FROM w, unnest(range(1, len(words))) AS t(g)),
        |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
        |               CAST(count(*) AS BIGINT) AS fw FROM bi GROUP BY 1),
        |bwt AS (SELECT w2, CAST(count(*) AS BIGINT) AS bw FROM bi GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM bi),
        |lm AS (SELECT w1, w2,
        |         -log2((c2 - 0.75e0) / c1 + 0.75e0 * fw / c1 * (bw / CAST(t AS DOUBLE))) AS bits
        |       FROM bi JOIN uni USING (w1) JOIN bwt USING (w2) CROSS JOIN tt)
        |SELECT bg.doc_id, CAST(count(*) AS INT) AS n_bigrams,
        |       round(CAST(sum(CAST(bits AS DECIMAL(38,12))) AS DOUBLE) / count(*), 4) AS kn_bits_per_token,
        |       round(pow(2, CAST(sum(CAST(bits AS DECIMAL(38,12))) AS DOUBLE) / count(*)), 4) AS kn_ppl
        |FROM bg JOIN lm USING (w1, w2)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val words = col("words")
      // bg feeds the LM build and the scoring probe (perplexity
      // convention: materialize the corpus-sized tokenize once)
      val bg = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(words) >= 2)
        .select(col("doc_id"),
          explode(zip_with(
            slice(words, lit(1), size(words) - 1),
            slice(words, lit(2), size(words) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .cache()
      val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        .localCheckpoint() // feeds uni, bwt, tt and the LM assembly
      val uni = bi.groupBy("w1")
        .agg(sum("c2").cast("long").as("c1"), count(lit(1)).as("fw"))
      val bwt = bi.groupBy("w2").agg(count(lit(1)).as("bw"))
      val tt = bi.agg(count(lit(1)).as("t"))
      // expression composition pinned to the oracle's exact double ops:
      // (c2-D)/c1 + D*fw/c1 * (bw/t), left-associated
      val lm = bi.join(uni, Seq("w1")).join(bwt, Seq("w2"))
        .crossJoin(broadcast(tt))
        .select(col("w1"), col("w2"),
          (-log2((col("c2") - lit(0.75)) / col("c1")
            + lit(0.75) * col("fw") / col("c1")
              * (col("bw") / col("t").cast("double")))).as("bits"))
      bg.join(lm, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_bigrams"),
          sum(col("bits").cast("decimal(38,12)")).as("sb"),
          count(lit(1)).as("n"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("sb").cast("double") / col("n"), 4).as("kn_bits_per_token"),
          round(pow(lit(2.0), col("sb").cast("double") / col("n")), 4).as("kn_ppl"))
        .orderBy("doc_id")
    },

    // ---- Unicode NFC normalization: native expression vs DuckDB ----
    // Composed vs decomposed strings (é vs e+U+0301) must dedup/join
    // identically, so normalization runs before any fingerprint. Spark
    // has no built-in; graft.expressions.NfcNormalize is a codegen'd
    // wrapper over Unicode canonical composition and DuckDB's
    // nfc_normalize is the oracle twin — the HASH compare proves the
    // two implementations compose identically. Decomposed sequences
    // are synthesized deterministically (corpus text is ASCII).
    sql(
      "q_normalize_nfc",
      """WITH r AS (SELECT doc_id,
        |  substr(text, 1, 20) || ' caf' || chr(101) || chr(769) ||
        |  ' No' || chr(101) || chr(776) || 'l' AS raw
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id,
        |       nfc_normalize(raw) AS norm,
        |       CAST(length(raw) AS BIGINT) AS len_raw,
        |       CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_norm
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val raw = concat(
        substring(col("text"), 1, 20),
        // NB: these literals are DECOMPOSED (e + combining mark, like
        // the oracle's chr(101)||chr(769)) — an editor "fixing" them
        // to composed chars would break len_raw
        lit(" caf"), lit("é"), lit(" No"), lit("ë"), lit("l"))
      val norm = graft.expressions.NfcNormalize(col("raw"))
      t(s, dir, "documents")
        .where(col("doc_id") % 5 === 0)
        .select(col("doc_id"), raw.as("raw"))
        .select(
          col("doc_id"),
          norm.as("norm"),
          length(col("raw")).cast("long").as("len_raw"),
          length(norm).cast("long").as("len_norm"))
        .orderBy("doc_id")
    },

    // ---- corpus-level rollup: tokens & quality per source × lang ----
    sql(
      "q_corpus_stats",
      """WITH w AS (SELECT source, lang, n_chars,
        |                  len(string_split(text, ' ')) AS n_tokens
        |           FROM documents)
        |SELECT source, lang, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       round(avg(n_tokens), 4) AS avg_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM w GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("source"), col("lang"), col("n_chars"),
          size(tokens(col("text"))).as("n_tokens"))
        .groupBy("source", "lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          round(avg(col("n_tokens")), 4).as("avg_tokens"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("source", "lang")
    },

    // ---- token-distribution Shannon entropy per doc (vocabulary
    // diversity — low entropy flags boilerplate/spam for curation).
    // H = log2(n) - (Σ c·ln c)/(n·ln 2) folds the whole computation
    // into ONE aggregation over (doc, word) counts — no join back for
    // the doc total. Per-doc work only; a single shuffle on doc_id.
    sql(
      "q_token_entropy",
      """WITH ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |            FROM documents),
        |cnt AS (SELECT doc_id, word, count(*) * 1.0 AS c
        |        FROM ex GROUP BY doc_id, word)
        |SELECT doc_id,
        |       CAST(sum(c) AS INT) AS n_tokens,
        |       CAST(count(*) AS INT) AS n_distinct,
        |       round((ln(sum(c)) - sum(c * ln(c)) / sum(c)) / ln(2), 6) AS entropy
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .groupBy("doc_id", "word")
        .agg((count(lit(1)) * 1.0).as("c"))
        .groupBy("doc_id")
        .agg(
          sum(col("c")).cast("int").as("n_tokens"),
          count(lit(1)).cast("int").as("n_distinct"),
          round((log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c")))
            / log(lit(2.0)), 6).as("entropy"))
        .orderBy("doc_id")
    },

    // ---- BPE merge candidates: adjacent character-pair counts within
    // words across the corpus — the inner statistic of byte-pair
    // tokenizer training. The pair generation is a per-row codegen'd
    // transform over sequence(1, len-1); the only shuffle is the final
    // count aggregation on pair (map-side partials collapse it).
    sql(
      "q_bpe_pairs",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |p AS (SELECT unnest(list_transform(generate_series(1, length(word) - 1),
        |                                   i -> substring(word, CAST(i AS INT), 2))) AS pair
        |      FROM w WHERE length(word) >= 2)
        |SELECT pair, count(*) AS cnt
        |FROM p GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("word"))
        .where(length(col("word")) >= 2)
        .select(explode(
          expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
          .as("pair"))
        .groupBy("pair")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("pair"))
        .limit(20)
    },

    // ---- BPE trainer merge rounds (Sennrich et al., ACL'16) ----
    // q_bpe_pairs above computes ONE round's pair statistic; this is
    // the actual trainer loop, unrolled 3 rounds: argmax pair →
    // greedy leftmost non-overlapping merge → recount, exactly the
    // reference algorithm (train on the WORD-COUNT DICTIONARY, not
    // the raw corpus — the corpus collapses to (word, cnt) in one
    // aggregation and every subsequent round runs on the vocabulary-
    // sized symbol table, which is the whole reason BPE training
    // scales). Greedy overlap semantics ("aaaa" merges positions 1-2
    // and 3-4, not 2-3) fall out of the runs-islands trick: matching
    // positions in one word form consecutive runs (pos − rn
    // constant), and keeping odd in-run ranks IS leftmost
    // non-overlapping. Ties on the argmax break (count desc, s1,
    // s2) — deterministic on both engines. Each round's symbol table
    // is checkpointed: the lineage would otherwise double per round.
    // Output = the 3 learned merge rules with their counts; a wrong
    // merge anywhere cascades into every later round, so 3 rows pin
    // the full pipeline.
    sql(
      "q_bpe_merge",
      s"""WITH $bpeBaseSql,
         |${Seq(1, 2, 3).map(bpeRoundSql).mkString(",\n")}
         |SELECT * FROM (
         |SELECT 1 AS round, s1, s2, c FROM b1
         |UNION ALL SELECT 2, s1, s2, c FROM b2
         |UNION ALL SELECT 3, s1, s2, c FROM b3) ORDER BY round""".stripMargin) { (s, dir) =>
      bpeTrain(s, dir)._1.reduce(_ unionByName _).orderBy("round")
    },

    // ---- BPE apply (encode with the learned merges) ----
    // The trainer's other half: score the corpus with the 3 learned
    // rules. KEY INSIGHT that makes this scale: applying word-level
    // BPE to a corpus never touches the corpus text — the final
    // symbol table already says how many tokens each DICTIONARY word
    // encodes to, so apply = one corpus tokenize + an equi-join to
    // the (vocabulary-sized, broadcastable) per-word token counts.
    // Output is the per-doc token accounting a packing/budget stage
    // consumes (n_bpe_tokens counts the </w> marker per word, the
    // standard convention). 10% doc sample bounds output rows only.
    sql(
      "q_bpe_apply",
      s"""WITH $bpeBaseSql,
         |${Seq(1, 2, 3).map(bpeRoundSql).mkString(",\n")},
         |wt AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sym FROM s3 GROUP BY 1),
         |dx AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |       FROM documents WHERE doc_id % 10 = 0)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
         |       round(CAST(sum(n_sym) AS DOUBLE) / count(*), 4) AS tokens_per_word
         |FROM dx JOIN wt USING (word)
         |WHERE word <> ''
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val wt = bpeTrain(s, dir)._2
        .groupBy("word").agg(count(lit(1)).as("n_sym"))
      t(s, dir, "documents")
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .where(col("word") =!= "")
        .join(wt, "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("n_sym").cast("long").as("n_bpe_tokens"))
        .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
          round(col("n_bpe_tokens").cast("double") / col("n_words"), 4)
            .as("tokens_per_word"))
        .orderBy("doc_id")
    },

    // ---- word co-occurrence PMI (collocation mining / embedding
    // context statistics): ln(c_ab·N / (c_a·c_b)) over document-level
    // co-occurrence, vocabulary bounded to the top-30 df words so the
    // per-doc pair fan-out is ≤ V(V−1)/2 regardless of corpus size —
    // the self-join is doc_id-keyed (one shuffle) with the vocabulary
    // broadcast, so the plan is linear in docs at constant V.
    sql(
      "q_cooccur_pmi",
      """WITH ex AS (SELECT DISTINCT doc_id, word FROM
        |            (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |             FROM documents)),
        |dfq AS (SELECT word, count(*) AS c FROM ex GROUP BY word),
        |voc AS (SELECT word, c FROM dfq ORDER BY c DESC, word LIMIT 30),
        |n AS (SELECT count(DISTINCT doc_id) * 1.0 AS nd FROM ex),
        |ev AS (SELECT ex.doc_id, ex.word, voc.c FROM ex
        |       JOIN voc ON ex.word = voc.word),
        |pairs AS (SELECT a.word AS wa, b.word AS wb,
        |                 max(a.c) AS ca, max(b.c) AS cb, count(*) AS cab
        |          FROM ev a JOIN ev b
        |            ON a.doc_id = b.doc_id AND a.word < b.word
        |          GROUP BY a.word, b.word)
        |SELECT wa, wb, cab,
        |       round(ln(cab * (SELECT nd FROM n) / (ca * cb)), 6) AS pmi
        |FROM pairs
        |ORDER BY pmi DESC, wa, wb LIMIT 20""".stripMargin) { (s, dir) =>
      val ex = t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .distinct()
      val dfq = ex.groupBy("word").agg(count(lit(1)).as("c"))
      val voc = dfq.orderBy(desc("c"), col("word")).limit(30)
      val n = ex.agg((countDistinct(col("doc_id")) * 1.0).as("nd"))
      val ev = ex.join(broadcast(voc), "word")
      val a = ev.select(col("doc_id"), col("word").as("wa"), col("c").as("ca"))
      val b = ev.select(col("doc_id").as("doc_b"), col("word").as("wb"), col("c").as("cb"))
      a.join(b, col("doc_id") === col("doc_b") && col("wa") < col("wb"))
        .groupBy("wa", "wb")
        .agg(max(col("ca")).as("ca"), max(col("cb")).as("cb"),
          count(lit(1)).as("cab"))
        .crossJoin(broadcast(n))
        .select(col("wa"), col("wb"), col("cab"),
          round(log(col("cab") * col("nd") / (col("ca") * col("cb"))), 6).as("pmi"))
        .orderBy(desc("pmi"), col("wa"), col("wb"))
        .limit(20)
    },

    // ---- corpus comparison: Jensen–Shannon divergence ----
    // How far apart are two sources' token DISTRIBUTIONS? The standard
    // symmetric, bounded ([0,1] bit) corpus-drift metric for training
    // mixes (pairs with q_domain_mix/q_ks_drift: KS compares a scalar
    // column, JSD compares whole vocabularies). Scale shape: one
    // explode+groupBy collapses each side to per-token counts (union
    // vocabulary via conditional sums — one shuffle), 1-row totals
    // eager-materialized, then every per-token term is computed from
    // exact integers and accumulated in DECIMAL(30,15) (merge-order-
    // independent, the money-sum idiom). ln parity between engines is
    // already load-bearing for q_token_entropy/q_perplexity_bigram/
    // q_cooccur_pmi; the ln(2) bits-conversion constant is pinned to
    // the same double literal on both sides rather than each engine's
    // ln(2) evaluation.
    sql(
      "q_js_divergence",
      """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents WHERE source IN ('src1', 'src2')),
        |c AS (SELECT tok,
        |             CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |             CAST(sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |      FROM w GROUP BY tok),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c2) AS BIGINT) AS n2,
        |             count(*) AS vocab FROM c),
        |terms AS (SELECT
        |    CASE WHEN c1 > 0 THEN CAST((c1 / CAST(t.n1 AS DOUBLE))
        |         * ln((c1 / CAST(t.n1 AS DOUBLE))
        |              / ((c1 / CAST(t.n1 AS DOUBLE) + c2 / CAST(t.n2 AS DOUBLE))
        |                 / CAST(2 AS DOUBLE))) AS DECIMAL(30,15))
        |         ELSE CAST(0 AS DECIMAL(30,15)) END AS pa,
        |    CASE WHEN c2 > 0 THEN CAST((c2 / CAST(t.n2 AS DOUBLE))
        |         * ln((c2 / CAST(t.n2 AS DOUBLE))
        |              / ((c1 / CAST(t.n1 AS DOUBLE) + c2 / CAST(t.n2 AS DOUBLE))
        |                 / CAST(2 AS DOUBLE))) AS DECIMAL(30,15))
        |         ELSE CAST(0 AS DECIMAL(30,15)) END AS pb
        |    FROM c, t)
        |SELECT (SELECT n1 FROM t) AS n1, (SELECT n2 FROM t) AS n2,
        |       (SELECT vocab FROM t) AS vocab,
        |       round(CAST(sum(pa + pb) AS DOUBLE) / CAST(2 AS DOUBLE)
        |             / CAST(0.6931471805599453 AS DOUBLE), 6) AS jsd_bits
        |FROM terms""".stripMargin) { (s, dir) =>
      val w = t(s, dir, "documents")
        .where(col("source").isin("src1", "src2"))
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
      val c = w.groupBy("tok").agg(
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("c1"),
        sum(when(col("source") === "src2", 1L).otherwise(0L)).as("c2"))
      // 1-row eager totals: ride the plan in every term (see ksTest)
      val tot = c.agg(sum("c1").as("n1"), sum("c2").as("n2"),
        count(lit(1)).as("vocab")).localCheckpoint()
      val p = col("c1") / col("n1").cast("double")
      val q = col("c2") / col("n2").cast("double")
      val m = (p + q) / lit(2.0)
      val dec = "decimal(30,15)"
      val terms = c.crossJoin(broadcast(tot))
        .select(
          when(col("c1") > 0, (p * log(p / m)).cast(dec))
            .otherwise(lit(0).cast(dec)).as("pa"),
          when(col("c2") > 0, (q * log(q / m)).cast(dec))
            .otherwise(lit(0).cast(dec)).as("pb"))
      terms.agg(sum(col("pa") + col("pb")).as("jsd_dec"))
        .crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"), col("vocab"),
          round(col("jsd_dec").cast("double") / lit(2.0)
            / lit(0.6931471805599453), 6).as("jsd_bits"))
    },

    // ---- Zipf rank-frequency fit (vocabulary health) ----
    // Least-squares slope of ln(freq) vs ln(rank) over the top-500
    // vocabulary: natural corpora sit near slope −1; template spam or
    // truncated vocabularies bend the curve. The corpus collapses to
    // the vocab in one shuffle; top-k by (freq, word) is
    // TakeOrderedAndProject; ranks come from one window over the ≤500
    // surviving rows; regression moments accumulate in DECIMAL so
    // merge order can't move the rounded fit.
    sql(
      "q_zipf_fit",
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |f AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM f
        |      ORDER BY c DESC, w LIMIT 500),
        |l AS (SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM r),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |             CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
        |             CAST(sum(CAST(x*y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
        |             CAST(sum(CAST(x*x AS DECIMAL(38,18))) AS DOUBLE) AS sx2,
        |             CAST(sum(CAST(y*y AS DECIMAL(38,18))) AS DOUBLE) AS sy2
        |      FROM l)
        |SELECT n, round((n*sxy - sx*sy) / (n*sx2 - sx*sx), 6) AS slope,
        |       round((sy - (n*sxy - sx*sy) / (n*sx2 - sx*sx) * sx) / n, 6)
        |         AS intercept,
        |       round((n*sxy - sx*sy) * (n*sxy - sx*sy)
        |             / ((n*sx2 - sx*sx) * (n*sy2 - sy*sy)), 6) AS r2
        |FROM m""".stripMargin) { (s, dir) =>
      val f = t(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val top = f.orderBy(col("c").desc, col("w")).limit(500)
      // ranks over the ≤500-row survivor frame (tiny global window)
      val rkw = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("w"))
      val r = top.withColumn("rk", row_number().over(rkw))
      val l = r.select(log(col("rk").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
      def dsum(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,18)")).cast("double")
      val m = l.agg(count(lit(1)).as("n"), dsum(col("x")).as("sx"),
        dsum(col("y")).as("sy"), dsum(col("x") * col("y")).as("sxy"),
        dsum(col("x") * col("x")).as("sx2"), dsum(col("y") * col("y")).as("sy2"))
      val (n, sx, sy, sxy, sx2, sy2) =
        (col("n"), col("sx"), col("sy"), col("sxy"), col("sx2"), col("sy2"))
      val slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
      m.select(n.as("n"), round(slope, 6).as("slope"),
        round((sy - slope * sx) / n, 6).as("intercept"),
        round((n * sxy - sx * sy) * (n * sxy - sx * sy)
          / ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6).as("r2"))
    },

    // ---- corpus diversity indices per language ----
    // Shannon entropy, Gini–Simpson index, and the effective source
    // count (exp H) of each language's source mix — the curation
    // audit for "is this slice dominated by one crawl?". One corpus
    // aggregation to the #langs×#sources grid; per-cell entropy terms
    // are doubles from exact integer ratios, accumulated in DECIMAL.
    sql(
      "q_corpus_diversity",
      """WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |           FROM documents GROUP BY 1, 2),
        |t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS k FROM c GROUP BY lang),
        |e AS (SELECT c.lang AS lang,
        |        CAST(sum(CAST(CAST(c.c AS DOUBLE) / t.n
        |                      * ln(CAST(c.c AS DOUBLE) / t.n)
        |                      AS DECIMAL(38,18))) AS DOUBLE) AS negh,
        |        CAST(sum(CAST(CAST(c.c AS DOUBLE) / t.n
        |                      * (CAST(c.c AS DOUBLE) / t.n)
        |                      AS DECIMAL(38,18))) AS DOUBLE) AS simp
        |      FROM c JOIN t ON t.lang = c.lang GROUP BY c.lang)
        |SELECT e.lang AS lang, t.n AS n_docs, t.k AS n_sources,
        |       round(-e.negh, 6) AS shannon,
        |       round(1.0 - e.simp, 6) AS simpson,
        |       round(exp(-e.negh), 6) AS eff_sources
        |FROM e JOIN t ON t.lang = e.lang ORDER BY lang""".stripMargin) { (s, dir) =>
      // #langs×#sources grid (~100 rows) feeds totals and terms
      val c = t(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val tt = c.groupBy("lang")
        .agg(sum("c").as("n"), count(lit(1)).as("k"))
      val p = col("c").cast("double") / col("n")
      val e = c.join(tt, Seq("lang"))
        .groupBy("lang")
        .agg(
          sum((p * log(p)).cast("decimal(38,18)")).cast("double").as("negh"),
          sum((p * p).cast("decimal(38,18)")).cast("double").as("simp"))
      e.join(tt, Seq("lang"))
        .select(col("lang"), col("n").as("n_docs"), col("k").as("n_sources"),
          round(-col("negh"), 6).as("shannon"),
          round(lit(1.0) - col("simp"), 6).as("simpson"),
          round(exp(-col("negh")), 6).as("eff_sources"))
        .orderBy("lang")
    },

    // ---- lexical complexity audit (readability-style heuristics) ----
    // Per-language word-level complexity profile: average word length,
    // syllables-per-word (vowel-group count — the standard cheap
    // syllable proxy), share of "complex" ≥3-syllable words, and a
    // Gunning-Fog-style score with words-per-document standing in for
    // sentence length (the corpus has no sentence punctuation). The
    // readability family is a stock quality-filter signal for training
    // corpora. ONE token-explode aggregation carries every per-word
    // metric as an exact integer sum; the doc counts come from a
    // #langs-row aggregate joined on lang; the only doubles are the
    // final divisions. Syllable counting is two regexp_replace passes
    // (collapse vowel groups to a marker, strip the rest, take the
    // length) — array-free, codegen'd, and the DuckDB twin carries the
    // explicit 'g' flag (DuckDB regexp_replace is first-match-only by
    // default; Spark's is global).
    sql(
      "q_lexical_complexity",
      """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
        |        CAST(sum(length(word)) AS BIGINT) AS sum_len,
        |        CAST(sum(length(regexp_replace(regexp_replace(word,
        |          '[aeiou]+', 'V', 'g'), '[^V]', '', 'g'))) AS BIGINT) AS sum_syl,
        |        CAST(sum(CASE WHEN length(regexp_replace(regexp_replace(word,
        |          '[aeiou]+', 'V', 'g'), '[^V]', '', 'g')) >= 3
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_complex
        |      FROM w GROUP BY lang),
        |d AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |      FROM documents GROUP BY lang)
        |SELECT m.lang, d.n_docs, m.n_words,
        |  round(CAST(sum_len AS DOUBLE) / n_words, 6) AS avg_word_len,
        |  round(CAST(sum_syl AS DOUBLE) / n_words, 6) AS syl_per_word,
        |  round(CAST(n_complex AS DOUBLE) * 100 / n_words, 6) AS pct_complex,
        |  round(CAST(4 AS DOUBLE) / 10
        |        * (CAST(n_words AS DOUBLE) / n_docs
        |           + CAST(n_complex AS DOUBLE) * 100 / n_words), 6) AS fog
        |FROM m JOIN d ON d.lang = m.lang ORDER BY m.lang""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.tokens
      val syl = length(regexp_replace(
        regexp_replace(col("word"), "[aeiou]+", "V"), "[^V]", ""))
      val m = t(s, dir, "documents")
        .select(col("lang"), explode(tokens(col("text"))).as("word"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("word")).cast("long")).as("sum_len"),
          sum(syl.cast("long")).as("sum_syl"),
          sum(when(syl >= 3, 1L).otherwise(0L)).as("n_complex"))
      val d = t(s, dir, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      m.join(broadcast(d), Seq("lang"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          round(col("sum_len").cast("double") / col("n_words"), 6)
            .as("avg_word_len"),
          round(col("sum_syl").cast("double") / col("n_words"), 6)
            .as("syl_per_word"),
          round(col("n_complex").cast("double") * 100 / col("n_words"), 6)
            .as("pct_complex"),
          round((lit(4).cast("double") / 10)
            * (col("n_words").cast("double") / col("n_docs")
              + col("n_complex").cast("double") * 100 / col("n_words")), 6)
            .as("fog"))
        .orderBy("lang")
    },

    // ---- multinomial Naive Bayes: train + apply + confusion ----
    // The probabilistic-classifier complement to q_quality_logistic /
    // q_logistic_train: a Laplace-smoothed (α=1) multinomial NB
    // language classifier trained on the corpus's own token counts and
    // applied back to it, reporting the actual × predicted confusion
    // matrix. The scale decomposition is the one every distributed NB
    // (MLlib's included) uses: the MODEL is LM-sized — per-(lang, tok)
    // counts, per-lang token totals, the context vocabulary — all
    // one-pass aggregates; scoring is ONE corpus-sized token stream
    // fanned out by the 5-row broadcast lang table and LEFT-joined
    // against the model (unseen (lang, tok) pairs take the smoothing
    // floor via coalesce — they must score, not drop). Per-(doc, lang)
    // log-likelihoods accumulate as DECIMAL(38,12) (combiner-order-
    // free); the per-doc argmax is a hash-partitioned window with the
    // deterministic (score desc, lang asc) tie rule. Resubstitution
    // scoring is the point: the confusion matrix doubles as a
    // train-quality audit the oracle can value-match.
    sql(
      "q_naive_bayes",
      """WITH d AS (SELECT doc_id, lang AS actual,
        |             unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |cnt AS (SELECT actual AS lang, tok, CAST(count(*) AS BIGINT) AS c
        |        FROM d GROUP BY 1, 2),
        |nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_l FROM cnt GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vsz FROM cnt),
        |pri AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |        FROM documents GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS total_docs FROM documents),
        |sc AS (SELECT d.doc_id, d.actual, nl.lang,
        |         sum(CAST(ln((COALESCE(cnt.c, 0) + 1)
        |                     / CAST(nl.n_l + (SELECT vsz FROM v) AS DOUBLE))
        |             AS DECIMAL(38,12))) AS s
        |       FROM d CROSS JOIN nl
        |         LEFT JOIN cnt ON cnt.tok = d.tok AND cnt.lang = nl.lang
        |       GROUP BY 1, 2, 3),
        |tot AS (SELECT sc.doc_id, sc.actual, sc.lang,
        |          CAST(s AS DOUBLE)
        |            + ln(pri.n_docs / CAST((SELECT total_docs FROM nd) AS DOUBLE)) AS score
        |        FROM sc JOIN pri ON pri.lang = sc.lang),
        |pred AS (SELECT doc_id, actual, lang AS predicted,
        |           row_number() OVER (PARTITION BY doc_id
        |                              ORDER BY score DESC, lang) AS rn
        |         FROM tot)
        |SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
        |FROM pred WHERE rn = 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.tokens
      val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      // the corpus-sized token stream feeds the model build AND the
      // scoring pass — materialize once, serialized + spillable
      // r13 (guide §2.5): repartition the 5k-doc frame BEFORE the
      // explode — the single-row-group scan is one task, so the old
      // cache materialized ~500k token rows in ONE partition and the
      // 5-lang × token scoring fan-out below ran single-threaded off
      // it. A ~600 KB doc-row shuffle buys full-width tokenize AND a
      // 32-partition cache for the scoring pass.
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("actual"), col("text"))
        .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
          col("doc_id"))
        .select(col("doc_id"), col("actual"),
          explode(tokens(col("text"))).as("tok"))
        .localCheckpoint(true, ser)
      val cnt = d.groupBy(col("actual").as("lang"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true, ser) // model: feeds n_l, V, and scoring
      val nl = cnt.groupBy("lang").agg(sum("c").cast("long").as("n_l"))
      val v = cnt.select("tok").distinct().agg(count(lit(1)).as("vsz"))
      val pri = t(s, dir, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val nd = t(s, dir, "documents").agg(count(lit(1)).as("total_docs"))
      val sc0 = d
        .crossJoin(broadcast(nl)) // 5 langs: constant fan-out
        .join(cnt, Seq("tok", "lang"), "left")
        .crossJoin(broadcast(v))
        .groupBy("doc_id", "actual", "lang")
        .agg(sum(log((coalesce(col("c"), lit(0L)) + 1)
            / (col("n_l") + col("vsz")).cast("double"))
          .cast("decimal(38,12)")).as("s"))
      val scored = sc0.join(broadcast(pri), Seq("lang"))
        .crossJoin(broadcast(nd))
        .select(col("doc_id"), col("actual"), col("lang"),
          (col("s").cast("double")
            + log(col("n_docs") / col("total_docs").cast("double"))).as("score"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("lang"))
      scored.select(col("actual"), col("lang").as("predicted"),
          row_number().over(w).as("rn"))
        .where(col("rn") === 1)
        .groupBy("actual", "predicted")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("actual", "predicted")
    },

    // ---- RAKE keyphrase extraction (top corpus keyphrases) ----
    // Rapid Automatic Keyword Extraction (Rose et al. 2010): phrases
    // are maximal stopword-free token runs (the runs-islands trick:
    // island id = pos − dense position among kept tokens, one
    // per-doc window); each word scores deg/freq where freq counts
    // occurrences and deg sums the lengths of phrases containing it;
    // a phrase scores the sum of its words' scores. Scale shape: two
    // doc-partitioned windows (no global sort), word stats collapse
    // to a vocabulary-sized table whose join back is the only
    // corpus-sized shuffle, per-phrase scores accumulate as
    // DECIMAL(38,12) (identical word multiset ⇒ bit-identical sum, so
    // duplicate phrase texts agree exactly and min() is a no-op
    // collapse), and the corpus-wide top-15 is a TakeOrdered with a
    // (score, phrase) total tie rule. Stopword list = the
    // TextFunctions.stopEn seven, shared verbatim with the oracle.
    sql(
      "q_rake_keyphrases",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tk AS (SELECT doc_id, g AS pos, toks[g] AS w
        |       FROM w, unnest(range(1, len(toks) + 1)) AS t(g)),
        |nz AS (SELECT doc_id, pos, w,
        |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |       FROM tk
        |       WHERE w NOT IN ('the', 'a', 'of', 'to', 'and', 'is', 'in')),
        |ph AS (SELECT doc_id, isl, w,
        |         CAST(count(*) OVER (PARTITION BY doc_id, isl) AS BIGINT) AS plen
        |       FROM nz),
        |wst AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
        |          CAST(sum(plen) AS BIGINT) AS deg
        |        FROM ph GROUP BY 1),
        |sc AS (SELECT ph.doc_id, ph.isl,
        |         CAST(sum(CAST(CAST(wst.deg AS DOUBLE) / wst.freq
        |                       AS DECIMAL(38,12))) AS DOUBLE) AS score
        |       FROM ph JOIN wst USING (w) GROUP BY 1, 2),
        |tx AS (SELECT doc_id, isl, string_agg(w, ' ' ORDER BY pos) AS phrase,
        |         CAST(count(*) AS BIGINT) AS plen
        |       FROM nz GROUP BY 1, 2),
        |ag AS (SELECT tx.phrase, tx.plen, CAST(count(*) AS BIGINT) AS n_occur,
        |         min(sc.score) AS score
        |       FROM tx JOIN sc ON sc.doc_id = tx.doc_id AND sc.isl = tx.isl
        |       GROUP BY 1, 2)
        |SELECT phrase, plen AS n_words, n_occur, round(score, 6) AS rake_score
        |FROM ag ORDER BY round(score, 6) DESC, phrase LIMIT 15""".stripMargin) {
      (s, dir) =>
      val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      val tk = t(s, dir, "documents")
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p0", "w")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("w"))
      val nz = tk.where(!col("w").isInCollection(stopEn))
        .withColumn("isl", col("pos") - row_number().over(
          Window.partitionBy("doc_id").orderBy("pos")))
        .localCheckpoint(true, ser) // feeds word stats AND phrase texts
      val ph = nz.withColumn("plen",
        count(lit(1)).over(Window.partitionBy("doc_id", "isl")).cast("long"))
      val wst = ph.groupBy("w")
        .agg(count(lit(1)).as("freq"), sum("plen").cast("long").as("deg"))
      val sc0 = ph.join(wst, "w")
        .groupBy("doc_id", "isl")
        .agg(sum((col("deg").cast("double") / col("freq"))
          .cast("decimal(38,12)")).cast("double").as("score"))
      val tx = nz.groupBy("doc_id", "isl")
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")), " ").as("phrase"),
          count(lit(1)).as("plen"))
      tx.join(sc0, Seq("doc_id", "isl"))
        .groupBy("phrase", "plen")
        .agg(count(lit(1)).as("n_occur"), min("score").as("score"))
        .select(col("phrase"), col("plen").as("n_words"), col("n_occur"),
          round(col("score"), 6).as("rake_score"))
        .orderBy(col("rake_score").desc, col("phrase"))
        .limit(15)
    },

    // ---- Heaps' law vocabulary-growth fit (V = K·N^β) ----
    // The corpus-scaling diagnostic that tells a pipeline how
    // vocabulary (and so tokenizer/index size) grows with ingested
    // tokens: evaluate cumulative (tokens N, distinct vocabulary V)
    // at 20 doc-id checkpoints and fit ln V = ln K + β·ln N by OLS.
    // The vocabulary UNIT is the word TRIGRAM: this synthetic corpus
    // has only ~31 word types (unigram vocabulary saturates in the
    // first checkpoint — β ≡ 0, caught by the replica spec's
    // 0 < β < 1 gate), while trigram types keep appearing through
    // all 20 bins, which is the regime the diagnostic exists for.
    // The cumulative-distinct trap at scale: a naive running-distinct
    // needs an ordered scan of the corpus. Instead each trigram's
    // FIRST doc (one min() aggregation) turns "V at checkpoint b"
    // into a plain count of first-appearances ≤ b — two corpus passes
    // total (trigram explode → min-doc; per-doc trigram counts → bin
    // sums), then everything else lives on the 20-row checkpoint
    // frame: the cumulative windows, the DECIMAL(38,18)-accumulated
    // log moments (exact BIGINT counts → bit-identical ln() on both
    // engines), and the closed-form fit riding back as a 1-row
    // broadcast. Bins are equal-width doc-id ranges from broadcast
    // min/max — exact integer arithmetic (floor()ed: DuckDB CAST
    // rounds where Spark truncates), no percentile estimation.
    {
      sql(
        "q_heaps_law",
        """WITH bd AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
          |dc AS (SELECT doc_id,
          |         CAST(greatest(len(string_split(text, ' ')) - 2, 0) AS BIGINT) AS c
          |       FROM documents),
          |db AS (SELECT least(CAST(floor((dc.doc_id - bd.mn) * 20
          |                         / (bd.mx - bd.mn + 1)) AS BIGINT), 19) AS bin,
          |              dc.c
          |       FROM dc CROSS JOIN bd),
          |tb AS (SELECT bin, sum(c) AS toks FROM db GROUP BY 1),
          |ft AS (SELECT tok, min(doc_id) AS fd FROM (
          |         SELECT doc_id,
          |           unnest(list_transform(range(1, len(w) - 1),
          |             i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS tok
          |         FROM (SELECT doc_id, string_split(text, ' ') AS w
          |               FROM documents)) GROUP BY 1),
          |fb AS (SELECT least(CAST(floor((ft.fd - bd.mn) * 20
          |                         / (bd.mx - bd.mn + 1)) AS BIGINT), 19) AS bin,
          |               CAST(count(*) AS BIGINT) AS newv
          |        FROM ft CROSS JOIN bd GROUP BY 1),
          |cum AS (SELECT tb.bin,
          |          CAST(sum(tb.toks) OVER (ORDER BY tb.bin
          |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cum,
          |          CAST(sum(coalesce(fb.newv, 0)) OVER (ORDER BY tb.bin
          |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v_cum
          |        FROM tb LEFT JOIN fb ON fb.bin = tb.bin),
          |mo AS (SELECT CAST(count(*) AS BIGINT) AS np,
          |         CAST(sum(CAST(ln(n_cum) AS DECIMAL(38,18))) AS DOUBLE) AS sx,
          |         CAST(sum(CAST(ln(v_cum) AS DECIMAL(38,18))) AS DOUBLE) AS sy,
          |         CAST(sum(CAST(ln(n_cum) * ln(v_cum) AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
          |         CAST(sum(CAST(ln(n_cum) * ln(n_cum) AS DECIMAL(38,18))) AS DOUBLE) AS sxx
          |       FROM cum),
          |fit AS (SELECT (np * sxy - sx * sy) / (np * sxx - sx * sx) AS beta,
          |               sx, sy, np FROM mo)
          |SELECT cum.bin, cum.n_cum AS tokens_cum, cum.v_cum AS vocab_cum,
          |       round(fit.beta, 6) AS heaps_beta,
          |       round(exp((fit.sy - fit.beta * fit.sx) / fit.np), 6) AS heaps_k
          |FROM cum CROSS JOIN fit ORDER BY cum.bin""".stripMargin) { (s, dir) =>
        val docs = t(s, dir, "documents")
        val bd = docs.agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
        def binOf(d: Column) =
          least(floor((d - col("mn")) * 20 / (col("mx") - col("mn") + 1))
            .cast("long"), lit(19L))
        val tb = docs
          .select(col("doc_id"),
            greatest(size(tokens(col("text"))) - 2, lit(0))
              .cast("long").as("c"))
          .crossJoin(broadcast(bd))
          .groupBy(binOf(col("doc_id")).as("bin"))
          .agg(sum("c").as("toks"))
        // word trigrams; sequence(1, n) DESCENDS when n < 1, so the
        // short-doc case must be guarded to an empty array explicitly
        val w3 = col("w")
        val tris = when(size(w3) >= 3,
          transform(sequence(lit(1), size(w3) - 2),
            i => concat_ws(" ", element_at(w3, i),
              element_at(w3, i + 1), element_at(w3, i + 2))))
          .otherwise(array())
        val ft = docs
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .select(col("doc_id"), explode(tris).as("tok"))
          .groupBy("tok").agg(min("doc_id").as("fd"))
        val fb = ft.crossJoin(broadcast(bd))
          .groupBy(binOf(col("fd")).as("bin"))
          .agg(count(lit(1)).as("newv"))
        // the one intentionally tiny global window (20 checkpoint rows)
        val wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        val cum = tb.join(fb, Seq("bin"), "left")
          .select(col("bin"),
            sum("toks").over(wc).cast("long").as("n_cum"),
            sum(coalesce(col("newv"), lit(0L))).over(wc).cast("long").as("v_cum"))
          .localCheckpoint() // 20 rows: feeds the fit AND the output
        val d18 = (c: Column) => c.cast("decimal(38,18)")
        val lx = log(col("n_cum")); val ly = log(col("v_cum"))
        val mo = cum.agg(count(lit(1)).as("np"),
          sum(d18(lx)).cast("double").as("sx"),
          sum(d18(ly)).cast("double").as("sy"),
          sum(d18(lx * ly)).cast("double").as("sxy"),
          sum(d18(lx * lx)).cast("double").as("sxx"))
        val fit = mo.select(
          ((col("np") * col("sxy") - col("sx") * col("sy"))
            / (col("np") * col("sxx") - col("sx") * col("sx"))).as("beta"),
          col("sx"), col("sy"), col("np"))
        cum.crossJoin(broadcast(fit))
          .select(col("bin"), col("n_cum").as("tokens_cum"),
            col("v_cum").as("vocab_cum"),
            round(col("beta"), 6).as("heaps_beta"),
            round(exp((col("sy") - col("beta") * col("sx")) / col("np")), 6)
              .as("heaps_k"))
          .orderBy("bin")
      }
    },

    // ---- readability indices (Flesch reading ease / FK grade) ----
    // The curation-pipeline readability gate. Syllables ≈ vowel
    // groups per word (floor 1) — the standard heuristic; the
    // synthetic corpus carries no sentence punctuation, so sentence
    // count is the documented fixed-15-words-per-sentence convention
    // (the formula plumbing — per-word regexp count folded corpus-
    // wide in one pass — is what transfers to a real corpus).
    // Grouped by source so the output is a per-slice quality profile.
    QueryDef.sql(
      "q_readability",
      """WITH w AS (SELECT doc_id, source,
        |             list_filter(string_split(text, ' '),
        |                         x -> length(x) > 0) AS words
        |           FROM documents),
        |d AS (SELECT source,
        |        CAST(len(words) AS BIGINT) AS n_words,
        |        CAST(list_sum(list_transform(words, x ->
        |          greatest(1, len(regexp_extract_all(x, '[aeiouy]+')))))
        |          AS BIGINT) AS n_syll,
        |        CAST(list_sum(list_transform(words, x ->
        |          CASE WHEN len(regexp_extract_all(x, '[aeiouy]+')) >= 3
        |               THEN 1 ELSE 0 END)) AS BIGINT) AS n_poly
        |      FROM w),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n_words) AS BIGINT) AS words,
        |             CAST(sum(n_syll) AS BIGINT) AS syll,
        |             CAST(sum(n_poly) AS BIGINT) AS poly,
        |             CAST(sum(CAST(ceil(n_words / 15.0) AS BIGINT)) AS BIGINT) AS sents
        |      FROM d GROUP BY source)
        |SELECT source, n_docs, words, syll,
        |  round(206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
        |        - 84.6 * (CAST(syll AS DOUBLE) / words), 3) AS flesch_ease,
        |  round(0.39 * (CAST(words AS DOUBLE) / sents)
        |        + 11.8 * (CAST(syll AS DOUBLE) / words) - 15.59, 3) AS fk_grade,
        |  round(CAST(poly AS DOUBLE) / words, 4) AS poly_ratio
        |FROM g ORDER BY source""".stripMargin) { (s, dir) =>
      val words = filter(split(col("text"), " "), x => length(x) > 0)
      val syllOf = (x: Column) =>
        greatest(lit(1), size(regexp_extract_all(x, lit("[aeiouy]+"), lit(0))))
      val d = t(s, dir, "documents")
        .select(col("source"), words.as("words"))
        .select(col("source"),
          size(col("words")).cast("long").as("n_words"),
          aggregate(transform(col("words"), syllOf), lit(0L),
            (a, x) => a + x).as("n_syll"),
          aggregate(transform(col("words"), x =>
            when(size(regexp_extract_all(x, lit("[aeiouy]+"), lit(0))) >= 3, 1L)
              .otherwise(0L)), lit(0L), (a, x) => a + x).as("n_poly"))
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").as("words"), sum("n_syll").as("syll"),
          sum("n_poly").as("poly"),
          sum(ceil(col("n_words") / 15.0).cast("long")).as("sents"))
        .select(col("source"), col("n_docs"), col("words"), col("syll"),
          round(lit(206.835) - lit(1.015) * (col("words").cast("double") / col("sents"))
            - lit(84.6) * (col("syll").cast("double") / col("words")), 3)
            .as("flesch_ease"),
          round(lit(0.39) * (col("words").cast("double") / col("sents"))
            + lit(11.8) * (col("syll").cast("double") / col("words")) - lit(15.59), 3)
            .as("fk_grade"),
          round(col("poly").cast("double") / col("words"), 4).as("poly_ratio"))
        .orderBy("source")
    },

    // ---- Good–Turing frequency spectrum (vocabulary smoothing) ----
    // The count-of-counts table and the GT-smoothed count
    // r* = (r+1)·N_{r+1}/N_r — the language-modeling estimate of how
    // much probability mass the unseen vocabulary holds (P₀ = N₁/N).
    // Corpus collapses ONCE to per-token counts, the spectrum is a
    // second ≤max-count-row aggregation, and the (r+1) lookup is a
    // lead() over the ordered spectrum with an explicit adjacency
    // check (count gaps → no smoothed estimate, not a wrong one).
    QueryDef.sql(
      "q_good_turing",
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |c AS (SELECT w, CAST(count(*) AS BIGINT) AS r FROM tok
        |      WHERE length(w) > 0 GROUP BY w),
        |spec AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM c GROUP BY r),
        |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n FROM spec),
        |l AS (SELECT r, n_r,
        |        lead(r) OVER (ORDER BY r) AS r_next,
        |        lead(n_r) OVER (ORDER BY r) AS n_next
        |      FROM spec)
        |SELECT r, n_r,
        |  CASE WHEN r_next = r + 1
        |       THEN round((r + 1.0) * n_next / n_r, 6) END AS r_star,
        |  round(CAST(r AS DOUBLE) * n_r / (SELECT n FROM tot), 6) AS mass
        |FROM l ORDER BY r""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("r"))
      val spec = c.groupBy("r").agg(count(lit(1)).as("n_r"))
        .localCheckpoint() // ≤ max-count rows: feeds total + spectrum
      val tot = spec.agg(sum(col("r") * col("n_r")).as("n"))
      // the one intentionally tiny global window (spectrum rows)
      val wOrd = Window.orderBy("r")
      val l = spec
        .withColumn("r_next", lead("r", 1).over(wOrd))
        .withColumn("n_next", lead("n_r", 1).over(wOrd))
      l.crossJoin(broadcast(tot))
        .select(col("r"), col("n_r"),
          when(col("r_next") === col("r") + 1,
            round((col("r") + lit(1.0)) * col("n_next") / col("n_r"), 6))
            .as("r_star"),
          round(col("r").cast("double") * col("n_r") / col("n"), 6).as("mass"))
        .orderBy("r")
    },

    // ---- language-ID confusion matrix (detector evaluation) ----
    // The evaluation layer over q_lang_id: cross the corpus's labeled
    // language against the stopword-detector's prediction and report
    // the confusion cells with per-label recall shares — the QA
    // readout that decides whether the cheap detector is good enough
    // to route a corpus slice. Shares divide exact integer counts by
    // the label marginal (a window over the ≤ |langs|² cell frame).
    QueryDef.sql(
      "q_langid_confusion",
      s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
         |sc AS (SELECT doc_id, lang,
         |              len(list_filter(words, x -> list_contains(${sqlList(stopEn)}, x))) AS s_en,
         |              len(list_filter(words, x -> list_contains(${sqlList(stopEs)}, x))) AS s_es,
         |              len(list_filter(words, x -> list_contains(${sqlList(stopDe)}, x))) AS s_de
         |       FROM w),
         |p AS (SELECT lang AS labeled_lang,
         |        CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en > 0 THEN 'en'
         |             WHEN s_es >= s_de AND s_es > 0 THEN 'es'
         |             WHEN s_de > 0 THEN 'de'
         |             ELSE 'und' END AS detected_lang
         |      FROM sc),
         |c AS (SELECT labeled_lang, detected_lang,
         |             CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2)
         |SELECT labeled_lang, detected_lang, n,
         |  round(CAST(n AS DOUBLE)
         |        / sum(n) OVER (PARTITION BY labeled_lang), 4) AS label_share,
         |  CAST(labeled_lang = detected_lang AS BOOLEAN) AS is_correct
         |FROM c ORDER BY labeled_lang, detected_lang""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val sc = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("words"))
        .select(col("lang"),
          stopwordCount(col("words"), stopEn).as("s_en"),
          stopwordCount(col("words"), stopEs).as("s_es"),
          stopwordCount(col("words"), stopDe).as("s_de"))
      val p = sc.select(col("lang").as("labeled_lang"),
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") > 0, "en")
          .when(col("s_es") >= col("s_de") && col("s_es") > 0, "es")
          .when(col("s_de") > 0, "de")
          .otherwise("und").as("detected_lang"))
      val c = p.groupBy("labeled_lang", "detected_lang")
        .agg(count(lit(1)).as("n"))
      c.select(col("labeled_lang"), col("detected_lang"), col("n"),
          round(col("n").cast("double")
            / sum("n").over(Window.partitionBy("labeled_lang")), 4)
            .as("label_share"),
          (col("labeled_lang") === col("detected_lang")).as("is_correct"))
        .orderBy("labeled_lang", "detected_lang")
    },

    // ---- Cohen's kappa (chance-corrected rater agreement) ----
    // Agreement between two independent document-quality raters —
    // a length rule (n_chars > 300) and a lexical-diversity rule
    // (distinct-token ratio > 0.46, both median splits) — corrected
    // for chance: κ = (p_o − p_e)/(1 − p_e). The calibration step
    // before replacing an expensive labeler with a cheap rule. ONE
    // corpus pass to the 2×2 table (four conditional sums); all κ
    // algebra on the 1-row frame.
    QueryDef.sql(
      "q_cohens_kappa",
      """WITH f AS (SELECT
        |    CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS r1,
        |    CASE WHEN len(list_distinct(list_filter(string_split(text, ' '),
        |           x -> length(x) > 0)))
        |         > 0.46 * len(list_filter(string_split(text, ' '),
        |           x -> length(x) > 0)) THEN 1 ELSE 0 END AS r2
        |  FROM documents),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(r1 * r2) AS BIGINT) AS n11,
        |        CAST(sum(r1 * (1 - r2)) AS BIGINT) AS n10,
        |        CAST(sum((1 - r1) * r2) AS BIGINT) AS n01,
        |        CAST(sum((1 - r1) * (1 - r2)) AS BIGINT) AS n00
        |      FROM f),
        |k AS (SELECT n, n11, n10, n01, n00,
        |        CAST(n11 + n00 AS DOUBLE) / n AS po,
        |        (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
        |         + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / (CAST(n AS DOUBLE) * n) AS pe
        |      FROM c)
        |SELECT n, n11, n10, n01, n00, round(po, 6) AS p_observed,
        |  round(pe, 6) AS p_expected,
        |  round((po - pe) / (1 - pe), 6) AS kappa
        |FROM k""".stripMargin) { (s, dir) =>
      val words = filter(split(col("text"), " "), x => length(x) > 0)
      val f = t(s, dir, "documents").select(
        when(col("n_chars") > 300, 1L).otherwise(0L).as("r1"),
        when(size(array_distinct(words)).cast("double")
          > lit(0.46) * size(words), 1L).otherwise(0L).as("r2"))
      val c = f.agg(count(lit(1)).as("n"),
        sum(col("r1") * col("r2")).as("n11"),
        sum(col("r1") * (lit(1) - col("r2"))).as("n10"),
        sum((lit(1) - col("r1")) * col("r2")).as("n01"),
        sum((lit(1) - col("r1")) * (lit(1) - col("r2"))).as("n00"))
      val po = (col("n11") + col("n00")).cast("double") / col("n")
      val pe = ((col("n11") + col("n10")).cast("double") * (col("n11") + col("n01"))
        + (col("n01") + col("n00")).cast("double") * (col("n10") + col("n00")))
        ./(col("n").cast("double") * col("n"))
      c.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        round(po, 6).as("p_observed"), round(pe, 6).as("p_expected"),
        round((po - pe) / (lit(1) - pe), 6).as("kappa"))
    },

    // ---- BLEU-2 n-gram overlap between adjacent docs per source ----
    // The generation-eval primitive (clipped modified n-gram
    // precision + brevity penalty, Papineni 2002) run as a corpus
    // self-similarity audit: candidate = each doc, reference = the
    // next doc of the same source by doc_id (deterministic pairing,
    // exactly N−#sources pairs — never quadratic). The engine path is
    // the 100-TB shape: explode each side to (pair, token) counts and
    // equi-join — clipping never compares texts pairwise. Per-pair
    // BLEU quantizes to DECIMAL before the per-source mean.
    QueryDef.sql(
      "q_bleu_overlap",
      """WITH p AS (SELECT source, doc_id,
        |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS tc,
        |    list_filter(string_split(lead(text) OVER
        |        (PARTITION BY source ORDER BY doc_id), ' '),
        |      x -> length(x) > 0) AS tr
        |  FROM documents),
        |pp AS (SELECT source, doc_id AS pid, tc, tr,
        |    list_transform(range(len(tc) - 1),
        |      i -> tc[i + 1] || ' ' || tc[i + 2]) AS bc,
        |    list_transform(range(len(tr) - 1),
        |      i -> tr[i + 1] || ' ' || tr[i + 2]) AS br
        |  FROM p WHERE tr IS NOT NULL),
        |sc AS (SELECT source, pid, len(tc) AS lc, len(tr) AS lr,
        |    CAST(list_sum(list_transform(list_distinct(tc),
        |      t -> least(len(list_filter(tc, x -> x = t)),
        |                 len(list_filter(tr, x -> x = t))))) AS BIGINT) AS clip1,
        |    len(bc) AS nb,
        |    CAST(coalesce(list_sum(list_transform(list_distinct(bc),
        |      t -> least(len(list_filter(bc, x -> x = t)),
        |                 len(list_filter(br, x -> x = t))))), 0) AS BIGINT) AS clip2
        |  FROM pp),
        |bl AS (SELECT source,
        |    CASE WHEN clip1 > 0 AND clip2 > 0 AND nb > 0 THEN
        |      least(1.0, exp(1.0 - CAST(lr AS DOUBLE) / lc))
        |        * exp(0.5 * (ln(CAST(clip1 AS DOUBLE) / lc)
        |                     + ln(CAST(clip2 AS DOUBLE) / nb)))
        |    ELSE 0.0 END AS bleu
        |  FROM sc)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(CAST(bleu AS DECIMAL(28,12))) AS DOUBLE)
        |        / count(*), 6) AS avg_bleu2,
        |  round(max(bleu), 6) AS max_bleu2
        |FROM bl GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val toks = filter(split(col("text"), " "), x => length(x) > 0)
      val w = Window.partitionBy("source").orderBy("doc_id")
      def bigrams(c: Column) = when(size(c) >= 2,
        transform(sequence(lit(0), size(c) - 2),
          i => concat(element_at(c, i + 1), lit(" "), element_at(c, i + 2))))
        .otherwise(array().cast("array<string>"))
      val p = t(s, dir, "documents")
        .select(col("source"), col("doc_id"), toks.as("tc"),
          lead(toks, 1).over(w).as("tr"))
        .where(col("tr").isNotNull)
        .select(col("source"), col("doc_id").as("pid"), col("tc"), col("tr"),
          bigrams(col("tc")).as("bc"), bigrams(col("tr")).as("br"))
        .localCheckpoint() // pairs frame feeds 4 explode streams
      // 100-TB shape: clip via (pair, gram) count join, never a
      // per-pair pairwise scan
      def clipped(cand: String, ref: String) = {
        val c = p.select(col("source"), col("pid"), explode(col(cand)).as("g"))
          .groupBy("source", "pid", "g").agg(count(lit(1)).as("cc"))
        val r = p.select(col("pid").as("rpid"), explode(col(ref)).as("rg"))
          .groupBy("rpid", "rg").agg(count(lit(1)).as("cr"))
        c.join(r, col("pid") === col("rpid") && col("g") === col("rg"), "left")
          .groupBy("source", "pid")
          .agg(sum(least(col("cc"), coalesce(col("cr"), lit(0L)))).as("clip"),
            sum("cc").as("tot"))
      }
      val u = clipped("tc", "tr")
        .select(col("source"), col("pid"), col("clip").as("clip1"), col("tot").as("lc"))
      val bgr = clipped("bc", "br")
        .select(col("pid").as("bpid"), col("clip").as("clip2"), col("tot").as("nb"))
      val lens = p.select(col("pid").as("lpid"), size(col("tr")).cast("long").as("lr"))
      val sc = u.join(bgr, col("pid") === col("bpid"), "left")
        .join(lens, col("pid") === col("lpid"))
        .select(col("source"), col("pid"), col("clip1"), col("lc"),
          coalesce(col("clip2"), lit(0L)).as("clip2"),
          coalesce(col("nb"), lit(0L)).as("nb"), col("lr"))
      val bleu = when(col("clip1") > 0 && col("clip2") > 0 && col("nb") > 0,
        least(lit(1.0), exp(lit(1.0) - col("lr").cast("double") / col("lc")))
          * exp(lit(0.5) * (log(col("clip1").cast("double") / col("lc"))
            + log(col("clip2").cast("double") / col("nb")))))
        .otherwise(lit(0.0))
      sc.select(col("source"), bleu.as("bleu"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("bleu").cast("decimal(28,12)")).cast("double")
            / count(lit(1)), 6).as("avg_bleu2"),
          round(max(col("bleu")), 6).as("max_bleu2"))
        .orderBy("source")
    },

    // ---- McNemar paired test (rater disagreement direction) ----
    // The significance companion to q_cohens_kappa on the SAME two
    // document-quality raters: does the length rule flag documents
    // the diversity rule misses more often than vice versa? Only the
    // discordant cells matter: χ² = (b−c)²/(b+c), with the
    // continuity-corrected variant alongside; reject at the 3.841
    // (1 df, α=.05) critical value. One corpus pass to two integers.
    QueryDef.sql(
      "q_mcnemar",
      """WITH f AS (SELECT
        |    CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS r1,
        |    CASE WHEN len(list_distinct(list_filter(string_split(text, ' '),
        |           x -> length(x) > 0)))
        |         > 0.46 * len(list_filter(string_split(text, ' '),
        |           x -> length(x) > 0)) THEN 1 ELSE 0 END AS r2
        |  FROM documents),
        |c AS (SELECT CAST(sum(r1 * (1 - r2)) AS BIGINT) AS b,
        |        CAST(sum((1 - r1) * r2) AS BIGINT) AS c
        |      FROM f)
        |SELECT b AS n_discordant_10, c AS n_discordant_01,
        |  round(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6) AS mcnemar_stat,
        |  round((abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c), 6)
        |    AS mcnemar_cc,
        |  CAST(CAST((b - c) * (b - c) AS DOUBLE) / (b + c) > 3.841 AS BOOLEAN)
        |    AS reject_05
        |FROM c""".stripMargin) { (s, dir) =>
      val words = filter(split(col("text"), " "), x => length(x) > 0)
      val f = t(s, dir, "documents").select(
        when(col("n_chars") > 300, 1L).otherwise(0L).as("r1"),
        when(size(array_distinct(words)).cast("double")
          > lit(0.46) * size(words), 1L).otherwise(0L).as("r2"))
      val c = f.agg(sum(col("r1") * (lit(1) - col("r2"))).as("b"),
        sum((lit(1) - col("r1")) * col("r2")).as("c"))
      val stat = ((col("b") - col("c")) * (col("b") - col("c")))
        .cast("double") / (col("b") + col("c"))
      c.select(col("b").as("n_discordant_10"), col("c").as("n_discordant_01"),
        round(stat, 6).as("mcnemar_stat"),
        round((abs(col("b") - col("c")) - 1.0)
          * (abs(col("b") - col("c")) - 1.0) / (col("b") + col("c")), 6)
          .as("mcnemar_cc"),
        (stat > 3.841).as("reject_05"))
    },

    // ---- term burstiness (per-term overdispersion) ----
    // Church & Gale (1995): content words are BURSTY — once a
    // document mentions a term it tends to mention it again — while
    // function words arrive near-Poisson. The dispersion index
    // D = Var(c)/E(c) over per-document counts (zeros included via
    // the sparse-moment trick: Σc/Σc² over occurring docs + the
    // global doc count N) separates the two: D ≈ 1 Poisson, D ≫ 1
    // bursty — the statistic behind stopword screens and
    // q_dsir_weights-style term informativeness, complementing
    // q_zipf_fit's corpus-level law with a per-term view. Top-20
    // terms by occurrence count; integer moments, two final
    // divisions each. 100-TB story: one tokenize pass to (doc, term)
    // counts, one term-grain collapse, a 20-row head.
    sql(
      "q_term_burstiness",
      """WITH dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |            FROM documents),
        |c AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
        |      FROM dt GROUP BY 1, 2),
        |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
        |       FROM documents),
        |tm AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
        |         CAST(sum(c) AS BIGINT) AS occ,
        |         CAST(sum(c * c) AS BIGINT) AS socc2
        |       FROM c GROUP BY 1),
        |d AS (SELECT term, df, occ,
        |        (CAST(socc2 AS DOUBLE) - CAST(occ AS DOUBLE) * occ / n)
        |          / (n - 1) / (CAST(occ AS DOUBLE) / n) AS dispersion,
        |        CAST(occ AS DOUBLE) / df AS mean_in_doc
        |      FROM tm CROSS JOIN nn)
        |SELECT term, occ AS n_occurrences, df AS n_docs,
        |  round(mean_in_doc, 6) AS mean_when_present,
        |  round(dispersion, 6) AS dispersion
        |FROM d ORDER BY n_occurrences DESC, term LIMIT 20""".stripMargin) {
      (s, dir) =>
        val c = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
        val nn = t(s, dir, "documents")
          .agg(countDistinct("doc_id").as("n"))
        val tm = c.groupBy("term").agg(count(lit(1)).as("df"),
          sum("c").cast("long").as("occ"),
          sum(col("c") * col("c")).cast("long").as("socc2"))
        val disp = (col("socc2").cast("double")
          - col("occ").cast("double") * col("occ") / col("n"))
          ./(col("n") - 1)./(col("occ").cast("double") / col("n"))
        tm.crossJoin(broadcast(nn))
          .select(col("term"), col("occ").as("n_occurrences"),
            col("df").as("n_docs"),
            round(col("occ").cast("double") / col("df"), 6)
              .as("mean_when_present"),
            round(disp, 6).as("dispersion"))
          .orderBy(desc("n_occurrences"), col("term"))
          .limit(20)
    }
  )
}
