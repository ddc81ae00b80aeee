package graft.llm

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond scoring (SURVEY.md §2.2 north-star
  * set, widened): rule-based quality filtering with drop reasons
  * (Gopher-style bounds), repetition signals (C4-style duplicate
  * n-gram fractions), PII detection/redaction, deterministic
  * train/val/test assignment, and per-stratum hash sampling.
  *
  * Scale design (100 TB): everything except the repetition top-word
  * count is per-row codegen'd column math (no shuffle at all); the
  * repetition query's one shuffle is a (doc_id, word) hash aggregation
  * whose partial combine collapses each doc's counts map-side. Splits
  * and samples hash the KEY, not a random() — re-runs, backfills, and
  * multi-table joins agree on membership with zero coordination.
  */
object CurationQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)


  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  val defs: Seq[QueryDef] = Seq(

    // ---- rule-based quality filter with drop reasons (Gopher-style
    //      bounds; first failing rule names the drop) ----
    sql(
      "q_quality_filter",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |sig AS (SELECT doc_id,
         |               len(words) AS n,
         |               list_sum(list_transform(words, x -> length(x))) / len(words) AS mwl,
         |               len(list_filter(words, x -> list_contains(${sqlList(stopEn)}, x))) AS stops,
         |               len(list_distinct(words)) / len(words) AS uniq
         |        FROM w)
         |SELECT doc_id, CAST(n AS INT) AS n_tokens,
         |       round(mwl, 4) AS mean_word_len,
         |       CAST(stops AS INT) AS n_stopwords,
         |       round(uniq, 4) AS uniq_ratio,
         |       CASE WHEN n < 5 OR n > 5000 THEN 'length'
         |            WHEN mwl < 2 OR mwl > 12 THEN 'word_len'
         |            WHEN stops < 1 THEN 'no_stopwords'
         |            WHEN uniq < 0.2 THEN 'repetitive'
         |            ELSE 'keep' END AS verdict
         |FROM sig ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val words = col("words")
      val n = size(words)
      val mwl = aggregate(transform(words, w => length(w).cast("long")), lit(0L),
        (acc, x) => acc + x) / n
      val stops = stopwordCount(words, stopEn)
      val uniq = size(array_distinct(words)) / n.cast("double")
      t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .select(col("doc_id"), n.as("n"), mwl.as("mwl"), stops.as("stops"), uniq.as("uniq"))
        .select(
          col("doc_id"),
          col("n").cast("int").as("n_tokens"),
          round(col("mwl"), 4).as("mean_word_len"),
          col("stops").cast("int").as("n_stopwords"),
          round(col("uniq"), 4).as("uniq_ratio"),
          when(col("n") < 5 || col("n") > 5000, "length")
            .when(col("mwl") < 2 || col("mwl") > 12, "word_len")
            .when(col("stops") < 1, "no_stopwords")
            .when(col("uniq") < 0.2, "repetitive")
            .otherwise("keep").as("verdict"))
        .orderBy("doc_id")
    },

    // ---- repetition signals: duplicate word/bigram fractions and the
    //      top-word share (C4/Gopher-style repetition gates) ----
    sql(
      "q_repetition",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |base AS (SELECT doc_id, len(words) AS n,
        |                len(list_distinct(list_transform(range(1, len(words)),
        |                    i -> words[i] || ' ' || words[i+1]))) AS dbg,
        |                len(list_distinct(words)) AS dw
        |         FROM w WHERE len(words) >= 2),
        |ex AS (SELECT doc_id, unnest(words) AS word FROM w),
        |wc AS (SELECT doc_id, word, count(*) AS c FROM ex GROUP BY doc_id, word),
        |tw AS (SELECT doc_id, max(c) AS top FROM wc GROUP BY doc_id)
        |SELECT b.doc_id, CAST(b.n AS INT) AS n_tokens,
        |       round(tw.top / b.n, 4) AS top_word_frac,
        |       round(1 - b.dw / b.n, 4) AS dup_word_frac,
        |       round(1 - b.dbg / (b.n - 1), 4) AS dup_bigram_frac,
        |       CASE WHEN tw.top / b.n > 0.2 OR 1 - b.dbg / (b.n - 1) > 0.5
        |            THEN 1 ELSE 0 END AS repetitive
        |FROM base b JOIN tw ON tw.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
      // Array signals are per-row (native shingles for the distinct
      // bigram count); only the top-word share needs the (doc_id, word)
      // aggregation — partial combine keeps the shuffle at one row per
      // distinct word per doc.
      val w = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(col("words")) >= 2)
      val base = w.select(
        col("doc_id"), size(col("words")).as("n"),
        size(graft.expressions.ShinglesArray(col("words"), 2)).as("dbg"),
        size(array_distinct(col("words"))).as("dw"))
      val tw = w.select(col("doc_id"), explode(col("words")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("top"))
      base.join(tw, "doc_id")
        .select(
          col("doc_id"),
          col("n").cast("int").as("n_tokens"),
          round(col("top") / col("n"), 4).as("top_word_frac"),
          round(lit(1) - col("dw") / col("n"), 4).as("dup_word_frac"),
          round(lit(1) - col("dbg") / (col("n") - 1), 4).as("dup_bigram_frac"),
          when(col("top") / col("n") > 0.2
            || lit(1) - col("dbg") / (col("n") - 1) > 0.5, 1).otherwise(0).as("repetitive"))
        .orderBy("doc_id")
    },

    // ---- PII detection + redaction. The corpus is synthetic, so PII
    //      is injected deterministically per doc; the operator is the
    //      regex detect/mask pipeline itself (patterns restricted to
    //      the Java∩RE2 regex subset so both engines agree). ----
    sql(
      "q_pii_redact",
      s"""WITH aug AS (SELECT doc_id,
         |  'contact u' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.' ||
         |  CAST(doc_id % 256 AS VARCHAR) || '.7 ' || text AS t
         |  FROM documents WHERE doc_id % 4 = 0)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$IpRe')) AS INT) AS n_ips,
         |  substr(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
         |                        '$IpRe', '<IP>', 'g'), 1, 80) AS redacted_prefix
         |FROM aug ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val aug = concat(
        lit("contact u"), col("doc_id").cast("string"),
        lit("@example.com from 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".7 "), col("text"))
      t(s, dir, "documents")
        .where(col("doc_id") % 4 === 0)
        .select(col("doc_id"), aug.as("t"))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(IpRe), lit(0))).as("n_ips"),
          substring(
            regexp_replace(regexp_replace(col("t"), EmailRe, "<EMAIL>"), IpRe, "<IP>"),
            1, 80).as("redacted_prefix"))
        .orderBy("doc_id")
    },

    // ---- document chunking: fixed-size token windows with overlap
    //      (window 32, stride 24 → 8-token overlap) — the core
    //      context-length prep op for LLM training. Pure per-row
    //      array math + one generator; chunk identity is the md5 of
    //      the joined tokens so the oracle checks content, not just
    //      shape. Tail chunks shorter than 8 tokens are dropped
    //      (standard minimum-fill policy). ----
    sql(
      "q_doc_chunks",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents
        |           WHERE doc_id % 5 = 0),
        |st AS (SELECT doc_id, words, unnest(range(0, len(words), 24)) AS start
        |       FROM w),
        |ch AS (SELECT doc_id, CAST(start // 24 AS INT) AS chunk_idx,
        |              words[start + 1 : least(start + 32, len(words))] AS chunk
        |       FROM st)
        |SELECT doc_id, chunk_idx,
        |       CAST(len(chunk) AS INT) AS chunk_tokens,
        |       md5(array_to_string(chunk, ' ')) AS chunk_md5
        |FROM ch
        |WHERE len(chunk) >= 8
        |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .where(col("doc_id") % 5 === 0)
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .select(col("doc_id"), col("words"),
          posexplode(sequence(lit(0), size(col("words")) - 1, lit(24))))
        .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
          slice(col("words"), col("col") + 1, lit(32)).as("chunk"))
        .where(size(col("chunk")) >= 8)
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).as("chunk_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- URL parsing: host/path/param extraction (the provenance
    //      fields a web-corpus pipeline filters and groups on). URLs
    //      are synthesized deterministically (corpus has none); Spark
    //      runs the native parse_url expression, the oracle the
    //      equivalent regexes. ----
    sql(
      "q_url_extract",
      """WITH u AS (SELECT doc_id,
        |  'https://w' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/' || source ||
        |  '/' || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&p=' ||
        |  CAST(doc_id % 13 AS VARCHAR) AS url
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id,
        |       regexp_extract(url, 'https?://([^/]+)', 1) AS host,
        |       regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
        |       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
        |       regexp_extract(url, '[?&]p=([^&]*)', 1) AS p_param
        |FROM u ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val url = concat(
        lit("https://w"), (col("doc_id") % 7).cast("string"),
        lit(".example.org/"), col("source"), lit("/"), col("doc_id").cast("string"),
        lit("?lang="), col("lang"), lit("&p="), (col("doc_id") % 13).cast("string"))
      t(s, dir, "documents")
        .where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), url.as("url"))
        .select(
          col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"),
          parse_url(col("url"), lit("QUERY"), lit("p")).as("p_param"))
        .orderBy("doc_id")
    },

    // ---- URL canonicalization dedup: the crawl-frontier primitive.
    //      Each doc yields a clean URL and a messy twin (scheme/host
    //      case, :443 default port, tracking params, shuffled param
    //      order, trailing slash, fragment); canonicalization must
    //      collapse exactly the twins and nothing else. Pure per-row
    //      regex column math + one hash aggregation — no shuffle
    //      beyond the group-by at any scale. Regex steps are shared
    //      verbatim with the oracle (Java∩RE2 subset, (?i) inline
    //      flag), so both engines canonicalize identically. ----
    sql(
      "q_url_canonical",
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://w' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/' || source ||
        |    '/' || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&p=' ||
        |    CAST(doc_id % 13 AS VARCHAR) AS url
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id,
        |    'HTTPS://W' || CAST(doc_id % 7 AS VARCHAR) || '.EXAMPLE.ORG:443/' || source ||
        |    '/' || CAST(doc_id AS VARCHAR) || '/?p=' || CAST(doc_id % 13 AS VARCHAR) ||
        |    '&utm_source=feed&lang=' || lang || '#top' AS url
        |  FROM documents WHERE doc_id % 3 = 0),
        |c AS (SELECT doc_id,
        |  'https://' || lower(regexp_extract(url, '(?i)https?://([^/:?#]+)', 1)) ||
        |  regexp_replace(regexp_extract(url, '(?i)https?://[^/?#]+(/[^?#]*)', 1), '/+$', '') ||
        |  '?lang=' || regexp_extract(url, '[?&]lang=([^&#]*)', 1) ||
        |  '&p=' || regexp_extract(url, '[?&]p=([^&#]*)', 1) AS curl
        |  FROM u)
        |SELECT curl, count(*) AS n_variants,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       min(doc_id) AS min_doc
        |FROM c GROUP BY curl ORDER BY curl""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").where(col("doc_id") % 3 === 0)
      val clean = docs.select(col("doc_id"), concat(
        lit("https://w"), (col("doc_id") % 7).cast("string"),
        lit(".example.org/"), col("source"), lit("/"), col("doc_id").cast("string"),
        lit("?lang="), col("lang"), lit("&p="), (col("doc_id") % 13).cast("string"))
        .as("url"))
      val messy = docs.select(col("doc_id"), concat(
        lit("HTTPS://W"), (col("doc_id") % 7).cast("string"),
        lit(".EXAMPLE.ORG:443/"), col("source"), lit("/"), col("doc_id").cast("string"),
        lit("/?p="), (col("doc_id") % 13).cast("string"),
        lit("&utm_source=feed&lang="), col("lang"), lit("#top")).as("url"))
      val u = clean.unionByName(messy)
      val curl = concat(
        lit("https://"),
        lower(regexp_extract(col("url"), "(?i)https?://([^/:?#]+)", 1)),
        regexp_replace(
          regexp_extract(col("url"), "(?i)https?://[^/?#]+(/[^?#]*)", 1),
          "/+$", ""),
        lit("?lang="), regexp_extract(col("url"), "[?&]lang=([^&#]*)", 1),
        lit("&p="), regexp_extract(col("url"), "[?&]p=([^&#]*)", 1))
      u.select(col("doc_id"), curl.as("curl"))
        .groupBy("curl")
        .agg(count(lit(1)).as("n_variants"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("min_doc"))
        .orderBy("curl")
    },

    // ---- deterministic train/val/test assignment: hash of the KEY,
    //      not random() — re-runs and joins agree on membership ----
    sql(
      "q_split_assign",
      """WITH s AS (SELECT doc_id, source,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        |  FROM documents)
        |SELECT source,
        |       CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM s GROUP BY source, split
        |ORDER BY source, split""".stripMargin) { (s, dir) =>
      val b = h32(col("doc_id").cast("string")) % 100
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), b.as("b"))
        .select(col("doc_id"), col("source"),
          when(col("b") < 90, "train").when(col("b") < 95, "val")
            .otherwise("test").as("split"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy("source", "split")
    },

    // ---- stratified hash sampling: per-stratum rates (the data-mixing
    //      primitive — downsample dominant strata deterministically) ----
    sql(
      "q_stratified_sample",
      """WITH r AS (SELECT event_id, event_type,
        |  ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        |  FROM events)
        |SELECT event_type, count(*) AS n_sampled,
        |       min(event_id) AS min_id, max(event_id) AS max_id
        |FROM r
        |WHERE b < CASE event_type WHEN 'view' THEN 5 WHEN 'click' THEN 20 ELSE 100 END
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val b = h32(col("event_id").cast("string")) % 100
      val rate = when(col("event_type") === "view", 5)
        .when(col("event_type") === "click", 20).otherwise(100)
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"), b.as("b"))
        .where(col("b") < rate)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_sampled"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .orderBy("event_type")
    },

    // ---- sequence packing: the training-batch prep step — fill
    //      fixed-token-budget sequences with documents (sequential
    //      fill: pack id = exclusive-prefix-sum(tokens) div budget —
    //      a pack's tokens can exceed the budget by up to one
    //      document's length, the straddler belongs to the pack it
    //      STARTED in; consumers chunk or truncate the straddler,
    //      pack_tokens is the pre-split accounting). Packing is
    //      inherently ORDER-dependent, so the scalable shape shards
    //      first (deterministic hash, the q_split_assign convention)
    //      and packs each shard independently: the window partitions
    //      by shard — parallelism = shard count, no global sort, no
    //      single-partition window. At cluster scale shards ∝ cores
    //      and each pack's doc list is written out; here the oracle
    //      checks the per-pack accounting. ----
    sql(
      "q_pack_sequences",
      """WITH d AS (SELECT doc_id,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (SELECT doc_id, shard, n_tok,
        |  COALESCE(CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    // 2048 AS pack FROM d)
        |SELECT shard, pack, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY shard, pack ORDER BY shard, pack""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
        .select(col("doc_id"),
          (h32(col("doc_id").cast("string")) % 8).as("shard"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      d.withColumn("pack",
          floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / 2048).cast("long"))
        .groupBy("shard", "pack")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("pack_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("shard", "pack")
    },

    // ---- domain mixture weights: temperature-scaled sampling rates
    //      (the Pile / DoReMi-style α=0.5 reweighting — upsample the
    //      tail, damp the dominant domain) plus expected epochs per
    //      domain under a fixed token budget. One corpus aggregation
    //      (hash-partitioned on source) collapses 100 TB to one row
    //      per domain; the windows run over that domain-count-sized
    //      result — driver-trivial at any corpus scale. ----
    sql(
      "q_domain_mix",
      """WITH d AS (SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |s AS (SELECT source, n_docs, n_tokens,
        |  n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE) AS raw_share,
        |  pow(n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE), 0.5) AS scaled
        |  FROM d)
        |SELECT source, n_docs, n_tokens,
        |       round(raw_share, 6) AS raw_share,
        |       round(scaled / sum(scaled) OVER (), 6) AS mix_weight,
        |       round((scaled / sum(scaled) OVER ()) * 1000000 / n_tokens, 4) AS epochs_at_1m
        |FROM s ORDER BY source""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("source"), size(tokens(col("text"))).as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("n_tokens"))
      Balance.temperatureMix(d, "n_tokens")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("raw_share"), 6).as("raw_share"),
          round(col("mix_weight"), 6).as("mix_weight"),
          round(col("mix_weight") * 1000000 / col("n_tokens"), 4).as("epochs_at_1m"))
        .orderBy("source")
    },

    // ---- token-budget cut: keep the top of the corpus (by priority
    //      order) until a global token budget is exhausted ----
    // The "train on the best 60%" curation step. The global running
    // token total over a corpus-wide priority order is the classic
    // one-task-window trap; [[graft.operators.GlobalPrefix]] computes
    // it as a two-pass range-partitioned prefix sum (shared with
    // q_window_pct), so the cut stays all-parallel at 100 TB. The
    // budget threshold rides a 1-row broadcast of the grand total —
    // no second corpus pass.
    sql(
      "q_token_budget",
      """WITH d AS (SELECT doc_id,
        |                  CAST(ceil(n_chars / 4.0) AS BIGINT) AS toks
        |           FROM documents),
        |c AS (SELECT doc_id, toks,
        |             CAST(sum(toks) OVER (ORDER BY toks DESC, doc_id
        |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM d),
        |tot AS (SELECT CAST(sum(toks) AS BIGINT) AS t FROM d)
        |SELECT doc_id, toks, cum
        |FROM c CROSS JOIN tot WHERE cum <= 0.6 * t
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), ceil(col("n_chars") / 4.0).cast("long").as("toks"))
      val (c, grand) = graft.operators.GlobalPrefix.runningTotalWithGrand(
        d, Seq(col("toks").desc, col("doc_id")), col("toks"), "cum")
      c.crossJoin(broadcast(grand.select(col("__grand").as("t"))))
        .where(col("cum") <= lit(0.6) * col("t"))
        .select(col("doc_id"), col("toks"), col("cum"))
        .orderBy("doc_id")
    },

    // ---- weighted sampling without replacement (Efraimidis–Spirakis
    // A-Res): per-row key u^(1/w) with u a DETERMINISTIC md5-uniform —
    // the top-k by key IS a w-weighted sample, reproducible across
    // re-runs/backfills with zero coordination (same property as the
    // hash splits above). Expressed in ln-space (-ln u / w ascending)
    // for numeric spread; w is chars/1000 so keys stay O(1). One
    // codegen'd pass + a TakeOrderedAndProject top-k — no shuffle of
    // the corpus, no random().
    sql(
      "q_weighted_sample",
      """WITH s AS (SELECT doc_id, n_chars,
        |  (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 + 0.5)
        |    / 1000000.0 AS u
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |       round(-ln(u) / (n_chars / 1000.0), 6) AS sk
        |FROM s ORDER BY sk, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      val u = (h32(col("doc_id").cast("string")) % 1000000 + 0.5) / 1000000.0
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), u.as("u"))
        .select(col("doc_id"), col("n_chars"),
          round(-log(col("u")) / (col("n_chars") / 1000.0), 6).as("sk"))
        .orderBy(col("sk"), col("doc_id"))
        .limit(20)
    },

    // ---- DSIR importance weights (Xie et al. 2023, "Data Selection
    // via Importance Resampling") ----
    // Rank raw-corpus docs by how target-like they are: two hashed
    // unigram bag-of-words models (target = a curated source subset,
    // raw = everything), per-doc weight = Σ_tokens ln(p_t/p_r) with
    // add-1 smoothing over the V=4096 hash buckets. The per-token
    // term is ln of an exact-integer ratio ((c_t+1)(N_r+V) over
    // (c_r+1)(N_t+V)) so both engines feed ln identical doubles;
    // per-doc sums accumulate in DECIMAL (merge-order-exact).
    // Scale: one token-explode shuffle collapses to ≤V=4096 LM rows
    // per model (broadcast back), totals are 1-row broadcasts, the
    // per-doc weight is a map-side partial agg, and top-k is
    // TakeOrderedAndProject — nothing but the first aggregation
    // touches corpus-sized data twice.
    sql(
      "q_dsir_weights",
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS b
        |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)),
        |ct AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM toks
        |       WHERE source IN ('src1','src2','src3') GROUP BY b),
        |cr AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY b),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks
        |       WHERE source IN ('src1','src2','src3')),
        |nr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
        |terms AS (
        |  SELECT t.doc_id, t.source,
        |    ln(CAST(coalesce(ct.c, 0) + 1 AS DOUBLE)
        |       * CAST((SELECT n FROM nr) + 4096 AS DOUBLE)
        |       / (CAST(cr.c + 1 AS DOUBLE)
        |          * CAST((SELECT n FROM nt) + 4096 AS DOUBLE))) AS term
        |  FROM toks t JOIN cr ON cr.b = t.b LEFT JOIN ct ON ct.b = t.b),
        |w AS (SELECT doc_id, any_value(source) AS source,
        |             CAST(count(*) AS BIGINT) AS n_tokens,
        |             CAST(sum(CAST(term AS DECIMAL(38,18))) AS DOUBLE) AS wt
        |      FROM terms GROUP BY doc_id)
        |SELECT doc_id, source, n_tokens, round(wt, 6) AS weight
        |FROM w ORDER BY wt DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      val target = Seq("src1", "src2", "src3")
      // one explode; bucket ids materialized once (the toks frame
      // feeds both LM counts, both totals, and the term join)
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(tokens(col("text"))).as("tok"))
        .select(col("doc_id"), col("source"),
          (h32(col("tok")) % 4096).as("b"))
        .localCheckpoint()
      val isTarget = col("source").isInCollection(target)
      val ct = toks.where(isTarget).groupBy("b").agg(count(lit(1)).as("c_t"))
      val cr = toks.groupBy("b").agg(count(lit(1)).as("c_r"))
      val tots = toks.agg(
        sum(when(isTarget, 1L).otherwise(0L)).as("n_t"),
        count(lit(1)).as("n_r"))
      // LM tables are ≤4096 rows: broadcast them back over the corpus
      val terms = toks
        .join(broadcast(cr), Seq("b"))
        .join(broadcast(ct), Seq("b"), "left")
        .crossJoin(broadcast(tots))
        // factors cast to double BEFORE multiplying: a BIGINT product
        // (c+1)·(N+V) overflows at ~6e11 total tokens — doubles carry
        // the ratio exactly as far as ln cares at any corpus size
        // (review find, r7)
        .select(col("doc_id"), col("source"),
          log((coalesce(col("c_t"), lit(0L)) + 1).cast("double")
            * (col("n_r") + 4096).cast("double")
            / ((col("c_r") + 1).cast("double")
              * (col("n_t") + 4096).cast("double"))).as("term"))
      terms.groupBy("doc_id")
        .agg(first("source").as("source"), count(lit(1)).as("n_tokens"),
          sum(col("term").cast("decimal(38,18)")).cast("double").as("wt"))
        .orderBy(col("wt").desc, col("doc_id"))  // TakeOrderedAndProject top-k
        .limit(20)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          round(col("wt"), 6).as("weight"))
    },

    // ---- class-balanced downsampling ----
    // The imbalanced-training prep step: downsample every class to the
    // minority class's size with DETERMINISTIC per-row hash gates —
    // keep iff h32(event_id) % 10⁶ < ceil(min_n·10⁶ / class_n) — the
    // integer-CEIL threshold (floor zeroes out any class more than
    // 10⁶× the minority instead of sampling it; review find, r7) — so membership is reproducible
    // across reruns/backfills with zero coordination (the
    // q_split_assign convention) and the achieved rate concentrates
    // tightly around min_n/class_n. Class counts ride a #classes-row
    // broadcast; one corpus pass counts, one filters — no shuffle of
    // the data itself.
    sql(
      "q_class_balance_sample",
      """WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1),
        |mn AS (SELECT min(n) AS min_n FROM c),
        |th AS (SELECT event_type, n,
        |         CAST((min_n * 1000000 + n - 1) // n AS BIGINT) AS thr
        |       FROM c, mn),
        |k AS (SELECT e.event_type, CAST(count(*) AS BIGINT) AS kept
        |      FROM events e JOIN th ON th.event_type = e.event_type
        |      WHERE ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
        |            % 1000000 < th.thr
        |      GROUP BY e.event_type)
        |SELECT th.event_type, th.n AS n_before, th.thr AS threshold,
        |       coalesce(k.kept, 0) AS n_after,
        |       round(CAST(coalesce(k.kept, 0) AS DOUBLE) / th.n, 6) AS rate
        |FROM th LEFT JOIN k ON k.event_type = th.event_type
        |ORDER BY th.event_type""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      val c = t(s, dir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .localCheckpoint() // #classes rows: feeds min + thresholds
      val mn = c.agg(min("n").as("min_n"))
      val th = c.crossJoin(broadcast(mn))
        .select(col("event_type"), col("n"),
          expr("(min_n * 1000000 + n - 1) div n").as("thr"))
      val k = t(s, dir, "events")
        .join(broadcast(th), Seq("event_type"))
        .where(h32(col("event_id").cast("string")) % 1000000 < col("thr"))
        .groupBy("event_type").agg(count(lit(1)).as("kept"))
      th.join(k, Seq("event_type"), "left")
        .select(col("event_type"), col("n").as("n_before"),
          col("thr").as("threshold"),
          coalesce(col("kept"), lit(0L)).as("n_after"),
          round(coalesce(col("kept"), lit(0L)).cast("double") / col("n"), 6)
            .as("rate"))
        .orderBy("event_type")
    },

    // ---- logistic quality classifier (fasttext-style model APPLY) ----
    // The other half of quality filtering: q_quality_filter is the
    // hand-rule gate; production pipelines ALSO apply a trained linear
    // classifier over cheap text features (the CCNet/fasttext quality
    // model pattern). This operator is the APPLY step: features from
    // one codegen'd projection (chars/token, stopword ratio, distinct
    // ratio, log-length), score = σ(w·x) with the weight vector pinned
    // as literals (a trained model would broadcast its weights —
    // identical plan), keep = score ≥ 0.5. Zero shuffles: the whole
    // thing is per-row column math, the same cost as a filter at
    // 100 TB. Weights chosen so the corpus splits non-trivially.
    sql(
      "q_quality_logistic",
      s"""WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS words
         |           FROM documents),
         |f AS (SELECT doc_id,
         |        n_chars / len(words) AS cpt,
         |        len(list_filter(words, x -> list_contains(${sqlList(stopEn)}, x)))
         |          / len(words) AS stopr,
         |        len(list_distinct(words)) / len(words) AS uniqr,
         |        ln(1 + len(words)) AS loglen
         |      FROM w)
         |SELECT doc_id,
         |  round(1 / (1 + exp(-(-6.0 + 0.2 * cpt + 4.0 * stopr + 5.0 * uniqr
         |                       + 0.3 * loglen))), 6) AS score,
         |  1 / (1 + exp(-(-6.0 + 0.2 * cpt + 4.0 * stopr + 5.0 * uniqr
         |                 + 0.3 * loglen))) >= 0.5 AS keep
         |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val words = col("words")
      val f = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), tokens(col("text")).as("words"))
        .select(col("doc_id"),
          (col("n_chars") / size(words)).as("cpt"),
          (stopwordCount(words, stopEn) / size(words).cast("double")).as("stopr"),
          (size(array_distinct(words)) / size(words).cast("double")).as("uniqr"),
          log(lit(1) + size(words)).as("loglen"))
      val z = lit(-6.0) + lit(0.2) * col("cpt") + lit(4.0) * col("stopr") +
        lit(5.0) * col("uniqr") + lit(0.3) * col("loglen")
      val score = lit(1) / (lit(1) + exp(-z))
      f.select(col("doc_id"),
          round(score, 6).as("score"),
          (score >= 0.5).as("keep"))
        .orderBy("doc_id")
    },

    // ---- logistic quality classifier (distributed model TRAIN) ----
    // The training half of q_quality_logistic's apply: full-batch
    // gradient descent on σ(w·x) for a lang='en' target from the same
    // parity-proven features (distinct-token ratio, chars/token), 3
    // unrolled steps from w=0, η=0.1 (0.5 overshoots on the unscaled
    // chars/token feature — loss RISES step 2; the monotone-descent
    // spec caught it; 0.1 descends monotonically at every SF). The scale shape is the one
    // every distributed GLM trainer (MLlib LBFGS/SGD included) uses:
    // per-step cost is ONE corpus aggregation of per-row gradient
    // terms that map-side combines to a single row, and the weights
    // re-enter the next step as a 1-row broadcast riding the plan —
    // no driver round-trip in-plan, no per-row state. Gradient and
    // loss sums accumulate as DECIMAL(38,18) (order-free: a combiner
    // tree on 1000 executors sums in nondeterministic order, and the
    // ulp noise would feed FORWARD through 3 steps); per-step loss is
    // reported pre-update, weights post-update, so the 3 rows pin the
    // whole trajectory.
    {
      def stepSql(r: Int): String = {
        val p = r - 1
        s"""g$r AS (SELECT a, b, c,
           |    CAST(sum(CAST((1 / (1 + exp(-(a + b * x1 + c * x2))) - y)
           |                  AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS g0,
           |    CAST(sum(CAST(((1 / (1 + exp(-(a + b * x1 + c * x2))) - y) * x1)
           |                  AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS g1,
           |    CAST(sum(CAST(((1 / (1 + exp(-(a + b * x1 + c * x2))) - y) * x2)
           |                  AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS g2,
           |    CAST(sum(CAST(-(y * ln(1 / (1 + exp(-(a + b * x1 + c * x2))))
           |                    + (1 - y) * ln(1 - 1 / (1 + exp(-(a + b * x1 + c * x2)))))
           |                  AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS loss
           |  FROM f CROSS JOIN w$p GROUP BY a, b, c),
           |w$r AS (SELECT a - 0.1e0 * g0 AS a, b - 0.1e0 * g1 AS b,
           |               c - 0.1e0 * g2 AS c, loss FROM g$r)""".stripMargin
      }
      sql(
        "q_logistic_train",
        s"""WITH d AS (SELECT lang, n_chars, string_split(text, ' ') AS words
           |           FROM documents),
           |f AS (SELECT CASE WHEN lang = 'en' THEN 1e0 ELSE 0e0 END AS y,
           |        len(list_distinct(words)) / len(words) AS x1,
           |        n_chars / len(words) AS x2
           |      FROM d),
           |w0 AS (SELECT 0e0 AS a, 0e0 AS b, 0e0 AS c),
           |${Seq(1, 2, 3).map(stepSql).mkString(",\n")}
           |SELECT * FROM (
           |SELECT 1 AS step, round(a, 8) AS w0, round(b, 8) AS w1,
           |       round(c, 8) AS w2, round(loss, 6) AS loss_before FROM w1
           |UNION ALL SELECT 2, round(a, 8), round(b, 8), round(c, 8),
           |       round(loss, 6) FROM w2
           |UNION ALL SELECT 3, round(a, 8), round(b, 8), round(c, 8),
           |       round(loss, 6) FROM w3) ORDER BY step""".stripMargin) { (s, dir) =>
        val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
        val words = col("words")
        val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,18)")
        // featurize ONCE, serialized + spillable: every step re-reads
        // this 3-double frame, never the text
        val f = t(s, dir, "documents")
          .select(col("lang"), col("n_chars"), tokens(col("text")).as("words"))
          .select(
            when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"),
            (size(array_distinct(words)) / size(words).cast("double")).as("x1"),
            (col("n_chars") / size(words)).as("x2"))
          .localCheckpoint(true, ser)
        var w = f.sparkSession.range(1)
          .select(lit(0.0).as("a"), lit(0.0).as("b"), lit(0.0).as("c"))
          .localCheckpoint()
        val steps = (1 to 3).map { r =>
          val z = col("a") + col("b") * col("x1") + col("c") * col("x2")
          val sig = lit(1) / (lit(1) + exp(-z))
          val n = count(lit(1))
          val g = f.crossJoin(broadcast(w))
            .groupBy("a", "b", "c")
            .agg(
              (sum(dec(sig - col("y"))).cast("double") / n).as("g0"),
              (sum(dec((sig - col("y")) * col("x1"))).cast("double") / n).as("g1"),
              (sum(dec((sig - col("y")) * col("x2"))).cast("double") / n).as("g2"),
              (sum(dec(-(col("y") * log(sig)
                + (lit(1) - col("y")) * log(lit(1) - sig)))).cast("double") / n)
                .as("loss"))
          w = g.select(
              (col("a") - lit(0.1) * col("g0")).as("a"),
              (col("b") - lit(0.1) * col("g1")).as("b"),
              (col("c") - lit(0.1) * col("g2")).as("c"),
              col("loss"))
            .localCheckpoint() // 1 row: next step's broadcast + output
          w.select(lit(r).as("step"), round(col("a"), 8).as("w0"),
            round(col("b"), 8).as("w1"), round(col("c"), 8).as("w2"),
            round(col("loss"), 6).as("loss_before"))
        }
        steps.reduce(_ unionByName _).orderBy("step")
      }
    },

    // ---- quantile normalization across sources (batch effects) ----
    // The batch-effect-removal op (microarray QN, applied here to
    // per-source document-length distributions): rank within each
    // source, average the value at each rank ACROSS sources, remap
    // every row to its rank's cross-source mean — afterwards every
    // source has the IDENTICAL distribution, which the output proves:
    // mean/min/max_norm agree across all 20 sources while mean_raw
    // differs. Equal-depth contract: ranks beyond the smallest
    // source's depth are dropped identically on both engines (the
    // classic QN equal-n assumption made explicit). Scale shape: the
    // rank window is hash-partitioned BY SOURCE (no global sort); the
    // reference distribution is depth-sized (corpus/#sources) and
    // keyed by rank, so the remap is a rank-keyed shuffle join; the
    // audit means accumulate as DECIMAL (order-free). At 100 TB the
    // per-source sort is the honest cost of EXACT QN — the relaxation
    // is the same sampled-boundary two-pass GlobalPrefix uses, with
    // sketch quantiles replacing exact ranks.
    sql(
      "q_quantile_normalize",
      """WITH r AS (SELECT source, n_chars,
        |             row_number() OVER (PARTITION BY source
        |                                ORDER BY n_chars, doc_id) AS rk
        |           FROM documents),
        |gs AS (SELECT source, CAST(count(*) AS BIGINT) AS ng FROM r GROUP BY 1),
        |mn AS (SELECT min(ng) AS depth FROM gs),
        |k AS (SELECT source, n_chars, rk FROM r
        |      WHERE rk <= (SELECT depth FROM mn)),
        |ref AS (SELECT rk,
        |          CAST(sum(CAST(n_chars AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS ref_val
        |        FROM k GROUP BY 1),
        |nx AS (SELECT k.source, k.n_chars, ref.ref_val
        |       FROM k JOIN ref USING (rk))
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(n_chars AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS mean_raw,
        |  round(CAST(sum(CAST(ref_val AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS mean_norm,
        |  round(min(ref_val), 6) AS min_norm,
        |  round(max(ref_val), 6) AS max_norm
        |FROM nx GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
      val r = t(s, dir, "documents")
        .select(col("source"), col("n_chars"), row_number().over(w).as("rk"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val mn = r.groupBy("source").agg(count(lit(1)).as("ng"))
        .agg(min("ng").as("depth"))
      val k = r.crossJoin(broadcast(mn)).where(col("rk") <= col("depth"))
        .select("source", "n_chars", "rk")
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val ref = k.groupBy("rk")
        .agg((sum(col("n_chars").cast("decimal(18,4)")).cast("double")
          / count(lit(1))).as("ref_val"))
      k.join(ref, Seq("rk"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          round(sum(col("n_chars").cast("decimal(18,4)")).cast("double")
            / count(lit(1)), 6).as("mean_raw"),
          round(sum(col("ref_val").cast("decimal(38,12)")).cast("double")
            / count(lit(1)), 6).as("mean_norm"),
          round(min("ref_val"), 6).as("min_norm"),
          round(max("ref_val"), 6).as("max_norm"))
        .orderBy("source")
    },

    // ---- empirical-Bayes rate shrinkage (beta-binomial) ----
    // The small-sample stabilizer every per-source quality dashboard
    // needs: a source's raw lang='en' rate k/n is noisy when n is
    // small, so shrink it toward the corpus prior with a
    // method-of-moments Beta(α, β) fit (Efron–Morris / the classic
    // CTR-smoothing recipe): m and v from the per-source rate
    // distribution, α = m(m(1−m)/v − 1), β = (1−m)(m(1−m)/v − 1),
    // posterior mean (k+α)/(n+α+β). Scale shape: ONE corpus pass
    // collapses to the #sources frame; prior moments come from that
    // tiny frame with double→DECIMAL(38,18) cast-then-sum (combiner-
    // order-free — a 1000-executor tree must not ulp-shift the
    // prior); α/β ride back as a 1-row broadcast. The degenerate
    // v = 0 / overdispersed m(1−m) ≤ v cases fall back to α = β = 1
    // (uniform prior) identically on both engines. shrink_frac =
    // (α+β)/(n+α+β) exposes exactly how much each source was pulled.
    sql(
      "q_eb_shrinkage",
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |           FROM documents GROUP BY 1),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS ns,
        |         CAST(sum(CAST(CAST(k AS DOUBLE) / n AS DECIMAL(38,18))) AS DOUBLE) AS sr,
        |         CAST(sum(CAST((CAST(k AS DOUBLE) / n) * (CAST(k AS DOUBLE) / n)
        |                       AS DECIMAL(38,18))) AS DOUBLE) AS sr2
        |       FROM s),
        |pm AS (SELECT sr / ns AS m,
        |              (sr2 - sr * sr / ns) / (ns - 1) AS v FROM mo),
        |ab AS (SELECT CASE WHEN v > 0 AND m * (1 - m) > v
        |                THEN m * (m * (1 - m) / v - 1) ELSE 1e0 END AS a,
        |              CASE WHEN v > 0 AND m * (1 - m) > v
        |                THEN (1 - m) * (m * (1 - m) / v - 1) ELSE 1e0 END AS b
        |       FROM pm)
        |SELECT source, n, k,
        |       round(CAST(k AS DOUBLE) / n, 6) AS rate_raw,
        |       round((k + a) / (n + a + b), 6) AS rate_smoothed,
        |       round((a + b) / (n + a + b), 6) AS shrink_frac
        |FROM s CROSS JOIN ab ORDER BY source""".stripMargin) { (s, dir) =>
      val src = t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("k"))
        .localCheckpoint() // #sources rows: feeds the prior AND the output
      val rate = col("k").cast("double") / col("n")
      val mo = src.agg(count(lit(1)).as("ns"),
        sum(rate.cast("decimal(38,18)")).cast("double").as("sr"),
        sum((rate * rate).cast("decimal(38,18)")).cast("double").as("sr2"))
      val pm = mo.select((col("sr") / col("ns")).as("m"),
        ((col("sr2") - col("sr") * col("sr") / col("ns")) / (col("ns") - 1))
          .as("v"))
      val fit = col("v") > 0 && col("m") * (lit(1) - col("m")) > col("v")
      val gm = col("m") * (lit(1) - col("m")) / col("v") - 1
      val ab = pm.select(
        when(fit, col("m") * gm).otherwise(lit(1.0)).as("a"),
        when(fit, (lit(1) - col("m")) * gm).otherwise(lit(1.0)).as("b"))
      src.crossJoin(broadcast(ab))
        .select(col("source"), col("n"), col("k"),
          round(rate, 6).as("rate_raw"),
          round((col("k") + col("a")) / (col("n") + col("a") + col("b")), 6)
            .as("rate_smoothed"),
          round((col("a") + col("b")) / (col("n") + col("a") + col("b")), 6)
            .as("shrink_frac"))
        .orderBy("source")
    },

    // ---- lexicon safety screen (blocklist hit rates per source) ----
    // The curation-pipeline safety filter in its simplest honest
    // form: a term blocklist, per-document hit counts, per-source hit
    // rates, and the block decision at a hit threshold (≥ 3) — the
    // shape any lexicon-based screen (toxicity, PII keywords, spam
    // vocab) runs before the expensive model-based pass. The per-doc
    // count is a pure array fold (no explode — the corpus never
    // re-shuffles on tokens); the per-source rollup is one hash agg.
    sql(
      "q_lexicon_screen",
      """WITH d AS (SELECT source,
        |    len(list_filter(string_split(text, ' '),
        |        x -> list_contains(['slow', 'big', 'dup'], x))) AS hits
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit,
        |  CAST(sum(hits) AS BIGINT) AS total_hits,
        |  CAST(sum(CASE WHEN hits >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS docs_blocked,
        |  round(CAST(sum(CASE WHEN hits >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 4) AS block_rate
        |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val lex = Seq("slow", "big", "dup")
      val hits = size(filter(split(col("text"), " "),
        x => lex.map(w => x === w).reduce(_ || _)))
      val d = t(s, dir, "documents").select(col("source"), hits.as("hits"))
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("hits") > 0, 1L).otherwise(0L)).as("docs_hit"),
          sum("hits").cast("long").as("total_hits"),
          sum(when(col("hits") >= 3, 1L).otherwise(0L)).as("docs_blocked"))
        .select(col("source"), col("n_docs"), col("docs_hit"),
          col("total_hits"), col("docs_blocked"),
          round(col("docs_blocked").cast("double") / col("n_docs"), 4)
            .as("block_rate"))
        .orderBy("source")
    },

    // ---- IPF raking (iterative proportional fitting) ----
    // Rake the (source × lang) corpus contingency table to uniform
    // marginal targets — the survey-weighting / corpus-rebalancing
    // primitive: 3 row/column scaling rounds produce per-cell
    // weights whose weighted table matches both marginals (up to the
    // empty-cell residual). The corpus collapses ONCE to the ≤100-
    // cell frame; every IPF round is two window passes there. The
    // window sums quantize per-term to DECIMAL(28,12) so the scaling
    // factors are combiner-order-free in both engines.
    sql(
      "q_ipf_raking",
      """WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
        |          CAST(count(DISTINCT source) AS BIGINT) AS nr,
        |          CAST(count(DISTINCT lang) AS BIGINT) AS nc
        |        FROM cells),
        |s0 AS (SELECT c.source, c.lang, c.n, CAST(t AS DOUBLE) / nr AS rt,
        |         CAST(t AS DOUBLE) / nc AS ct, 1.0 AS w
        |       FROM cells c CROSS JOIN tot),
        |r1 AS (SELECT source, lang, n, rt, ct, w * rt
        |         / CAST(sum(CAST(n * w AS DECIMAL(28,12)))
        |                OVER (PARTITION BY source) AS DOUBLE) AS w2 FROM s0),
        |c1 AS (SELECT source, lang, n, rt, ct, w2 * ct
        |         / CAST(sum(CAST(n * w2 AS DECIMAL(28,12)))
        |                OVER (PARTITION BY lang) AS DOUBLE) AS w FROM r1),
        |r2 AS (SELECT source, lang, n, rt, ct, w * rt
        |         / CAST(sum(CAST(n * w AS DECIMAL(28,12)))
        |                OVER (PARTITION BY source) AS DOUBLE) AS w2 FROM c1),
        |c2 AS (SELECT source, lang, n, rt, ct, w2 * ct
        |         / CAST(sum(CAST(n * w2 AS DECIMAL(28,12)))
        |                OVER (PARTITION BY lang) AS DOUBLE) AS w FROM r2),
        |r3 AS (SELECT source, lang, n, rt, ct, w * rt
        |         / CAST(sum(CAST(n * w AS DECIMAL(28,12)))
        |                OVER (PARTITION BY source) AS DOUBLE) AS w2 FROM c2),
        |c3 AS (SELECT source, lang, n, rt, ct, w2 * ct
        |         / CAST(sum(CAST(n * w2 AS DECIMAL(28,12)))
        |                OVER (PARTITION BY lang) AS DOUBLE) AS w FROM r3)
        |SELECT source, lang, n, round(w, 6) AS weight,
        |  round(n * w, 4) AS fitted
        |FROM c3 ORDER BY source, lang""".stripMargin) { (s, dir) =>
      val cells = t(s, dir, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("n"))
        .localCheckpoint() // ≤100 cells — the whole IPF state
      val tot = cells.agg(sum("n").cast("long").as("t"),
        countDistinct("source").as("nr"), countDistinct("lang").as("nc"))
      val s0 = cells.crossJoin(broadcast(tot))
        .select(col("source"), col("lang"), col("n"),
          (col("t").cast("double") / col("nr")).as("rt"),
          (col("t").cast("double") / col("nc")).as("ct"),
          lit(1.0).as("w"))
      def scale(df: DataFrame, target: String, by: String) =
        df.withColumn("w", col("w") * col(target)
          / sum((col("n") * col("w")).cast("decimal(28,12)"))
            .over(Window.partitionBy(by)).cast("double"))
      val fit = Seq.fill(3)(()).foldLeft(s0) { (d, _) =>
        scale(scale(d, "rt", "source"), "ct", "lang")
      }
      fit.select(col("source"), col("lang"), col("n"),
          round(col("w"), 6).as("weight"),
          round(col("n") * col("w"), 4).as("fitted"))
        .orderBy("source", "lang")
    },

    // ---- deterministic negative sampling (contrastive pairs) ----
    // The contrastive-training data builder: each user's POSITIVE is
    // their top event_type by mean value; 2 NEGATIVES come from the
    // remaining vocabulary by smallest md5(user:type) — deterministic,
    // so re-runs, backfills, and distributed workers agree on every
    // pair with zero coordination (the same hash-not-random() rule as
    // the split/sample family). Output is the (pos, neg) pair matrix
    // with each negative type's share vs the uniform expectation —
    // the sampler-bias audit. Corpus collapses ONCE to (user, type)
    // means; the candidate fan-out is the K-row type vocabulary.
    sql(
      "q_negative_sampling",
      """WITH um AS (SELECT user_id, event_type,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS m
        |  FROM events GROUP BY 1, 2),
        |pos AS (SELECT user_id, event_type AS pos_type FROM (
        |    SELECT user_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |                         ORDER BY m DESC, event_type) AS r
        |    FROM um) WHERE r = 1),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |neg AS (SELECT p.user_id, p.pos_type, t.event_type AS neg_type,
        |    row_number() OVER (PARTITION BY p.user_id
        |      ORDER BY md5(CAST(p.user_id AS VARCHAR) || ':' || t.event_type),
        |               t.event_type) AS nr
        |  FROM pos p CROSS JOIN ty t WHERE t.event_type <> p.pos_type),
        |pairs AS (SELECT pos_type, neg_type, CAST(count(*) AS BIGINT) AS n_pairs
        |          FROM neg WHERE nr <= 2 GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS n FROM pairs)
        |SELECT pos_type, neg_type, n_pairs,
        |  round(CAST(n_pairs AS DOUBLE) / (SELECT n FROM tot), 4) AS pair_share,
        |  round(CAST(sum(n_pairs) OVER (PARTITION BY neg_type) AS DOUBLE)
        |        / (SELECT n FROM tot), 4) AS neg_share
        |FROM pairs ORDER BY pos_type, neg_type""".stripMargin) { (s, dir) =>
      val um = t(s, dir, "events").groupBy("user_id", "event_type")
        .agg((sum(col("value").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("m"))
      val pos = um
        .withColumn("r", row_number().over(Window.partitionBy("user_id")
          .orderBy(desc("m"), col("event_type"))))
        .where(col("r") === 1)
        .select(col("user_id"), col("event_type").as("pos_type"))
      val ty = t(s, dir, "events").select("event_type").distinct()
        .withColumnRenamed("event_type", "cand")
      val neg = pos.crossJoin(broadcast(ty))
        .where(col("cand") =!= col("pos_type"))
        .withColumn("nr", row_number().over(Window.partitionBy("user_id")
          .orderBy(md5(concat(col("user_id").cast("string"), lit(":"),
            col("cand"))), col("cand"))))
        .where(col("nr") <= 2)
      val pairs = neg.groupBy(col("pos_type"), col("cand").as("neg_type"))
        .agg(count(lit(1)).as("n_pairs"))
        .localCheckpoint() // ≤ K² rows
      val tot = pairs.agg(sum("n_pairs").cast("long").as("n"))
      pairs.crossJoin(broadcast(tot))
        .withColumn("neg_tot",
          sum("n_pairs").over(Window.partitionBy("neg_type")))
        .select(col("pos_type"), col("neg_type"), col("n_pairs"),
          round(col("n_pairs").cast("double") / col("n"), 4).as("pair_share"),
          round(col("neg_tot").cast("double") / col("n"), 4).as("neg_share"))
        .orderBy("pos_type", "neg_type")
    },

    // ---- sequence packing (context-window fill accounting) ----
    // THE pretraining batch-prep operator: concatenate documents into
    // fixed-size context windows (C = 512 tokens, docs truncated to C,
    // no cross-window splitting) with the greedy sequential packer
    // every streaming tokenizer shard runs — a doc that doesn't fit
    // the open window closes it and starts the next. Reported per
    // source shard: windows used, fill rate, waste — the numbers that
    // size a training run's step count and its padding bill. Scale
    // shape: packing is embarrassingly parallel per shard exactly as
    // production packers run it (each shard packs its own doc stream
    // in doc_id order) — the q_kalman_1d secondary-sort fold per
    // source key; token counts collapse map-side before the fold, so
    // the shuffled rows are (source, doc_id, len) triples, never text.
    // Both engines fold the identical integer recurrence (recursive-
    // CTE oracle), so the output is exact at any scale.
    sql(
      "q_sequence_packing",
      """WITH RECURSIVE d AS (
        |  SELECT source, doc_id,
        |         least(len(string_split(text, ' ')), 512) AS l
        |  FROM documents),
        |i AS (SELECT source, l,
        |        CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |             AS BIGINT) AS rn
        |      FROM d),
        |n AS (SELECT source, CAST(count(*) AS BIGINT) AS nd,
        |             CAST(sum(l) AS BIGINT) AS tot
        |      FROM i GROUP BY 1),
        |f AS (SELECT source, rn, l AS used, CAST(1 AS BIGINT) AS bins
        |      FROM i WHERE rn = 1
        |      UNION ALL
        |      SELECT i.source, i.rn,
        |        CASE WHEN f.used + i.l <= 512 THEN f.used + i.l ELSE i.l END,
        |        f.bins + CASE WHEN f.used + i.l <= 512 THEN 0 ELSE 1 END
        |      FROM f JOIN i ON i.source = f.source AND i.rn = f.rn + 1)
        |SELECT f.source, n.nd AS n_docs, n.tot AS total_tokens,
        |       f.bins AS n_windows,
        |       round(CAST(n.tot AS DOUBLE) / (f.bins * 512), 6) AS fill_rate,
        |       CAST(f.bins * 512 - n.tot AS BIGINT) AS waste_tokens
        |FROM f JOIN n ON n.source = f.source AND f.rn = n.nd
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val C = 512
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          least(size(tokens(col("text"))), lit(C)).cast("long").as("l"))
        .as[(String, Long, Long)]
        .repartition(col("source"))
        .sortWithinPartitions("source", "doc_id")
        .mapPartitions { it =>
          new Iterator[(String, Long, Long, Long)] {
            private var pending: Option[(String, Long, Long)] =
              if (it.hasNext) Some(it.next()) else None
            def hasNext: Boolean = pending.isDefined
            def next(): (String, Long, Long, Long) = {
              val (src, _, l0) = pending.get
              var used = l0
              var bins = 1L
              var nd = 1L
              var tot = l0
              pending = None
              while (pending.isEmpty && it.hasNext) {
                val r = it.next()
                if (r._1 == src) {
                  if (used + r._3 <= C) used += r._3
                  else { bins += 1; used = r._3 }
                  nd += 1; tot += r._3
                } else pending = Some(r)
              }
              (src, nd, tot, bins)
            }
          }
        }
        .toDF("source", "n_docs", "total_tokens", "n_windows")
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("n_windows"),
          round(col("total_tokens").cast("double")
            / (col("n_windows") * C), 6).as("fill_rate"),
          (col("n_windows") * C - col("total_tokens")).cast("long")
            .as("waste_tokens"))
        .orderBy("source")
    }
  )
}
