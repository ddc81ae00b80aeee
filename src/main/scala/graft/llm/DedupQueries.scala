package graft.llm

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md
  * §2.2 north-star set): exact hash dedup, canonical-fingerprint
  * dedup, MinHash+LSH near-dup, n-gram Jaccard, and SimHash.
  *
  * Scale design (100 TB):
  *  - exact/fingerprint dedup = one hash-partitioned aggregation on a
  *    16-byte digest — shuffle carries (digest, doc_id), never text;
  *  - MinHash+LSH: signatures are computed scan-side with codegen'd
  *    higher-order functions (no explode of shingles), the only
  *    shuffle is the band-signature self-join whose key space is
  *    collision-bounded; candidate verification touches candidate
  *    pairs only — never the O(n²) cross product;
  *  - SimHash: per-doc 64-bit sketches; pair scan restricted to a
  *    sampled query set (full-scale variant would band on simhash
  *    prefixes exactly like LSH);
  *  - all hashes derive from md5 (cross-engine reproducible), so the
  *    DuckDB oracle checks the *values*, not just row counts. The
  *    MLlib MinHashLSH variant (engine-private seeds) is kept as the
  *    rows-only demonstration of the MLlib path.
  */
object DedupQueries {

  import QueryDef.{rowsOnly, sql}

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private val K = 12 // minhash signature length
  private val BANDS = 4 // 4 bands × 3 rows

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

    // ---- MinHash + LSH banding near-dup (portable hashes).
    //      One md5 per shingle; the K signature slots are arithmetic
    //      permutations (a_k*h+b_k mod p) of the base hash. ----
    sql(
      "q_dedup_minhash_lsh", {
        import graft.functions.TextFunctions.{MinhashA, MinhashB, MinhashP}
        val perms = (0 until K).map(i =>
          s"list_min(list_transform(hl, h -> (${MinhashA(i)} * h + ${MinhashB(i)}) % $MinhashP))")
          .mkString("[", ",\n                ", "]")
        s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
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
           |                                  AND a.doc_id < c.doc_id)
           |SELECT da, db,
           |       round(len(list_filter(range(1, ${K + 1}), i -> x.m[i] = y.m[i])) / $K.0, 4) AS est_jaccard
           |FROM cand JOIN mh x ON x.doc_id = da JOIN mh y ON y.doc_id = db
           |WHERE len(list_filter(range(1, ${K + 1}), i -> x.m[i] = y.m[i])) / $K.0 >= 0.5
           |ORDER BY da, db""".stripMargin
      }) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(col("words")) >= 3)
      // Materialize the signatures: four consumers (two band sides, two
      // estimate sides) would otherwise each recompute shingling + md5.
      val hs = docs.select(col("doc_id"), shingleHashes(shingles(col("words"), 3)).as("hl"))
      val mh = hs.select(col("doc_id"), minhashesFromHashes(col("hl"), K).as("m")).cache()
      val bands = mh
        .select(col("doc_id"), col("m"), explode(sequence(lit(0), lit(BANDS - 1))).as("b"))
        .select(col("doc_id"), col("b"), bandSignature(col("m"), col("b"), 3).as("sig"))
      val a = bands.select(col("doc_id").as("da"), col("b").as("ba"), col("sig").as("siga"))
      val c = bands.select(col("doc_id").as("db"), col("b").as("bb"), col("sig").as("sigb"))
      val cand = a.join(c,
          a("siga") === c("sigb") && a("ba") === c("bb") && a("da") < c("db"))
        .select("da", "db").distinct()
      val x = mh.select(col("doc_id").as("xid"), col("m").as("ma"))
      val y = mh.select(col("doc_id").as("yid"), col("m").as("mb"))
      val matches = size(filter(sequence(lit(1), lit(K)),
        i => element_at(col("ma"), i) === element_at(col("mb"), i)))
      cand.join(x, col("da") === col("xid")).join(y, col("db") === col("yid"))
        .withColumn("est_jaccard", matches / lit(K.toDouble))
        .where(col("est_jaccard") >= 0.5)
        .select(col("da"), col("db"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy("da", "db")
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
      // Materialize doc→shingles once: it feeds four consumers (df
      // counts, sizes, both join sides), and without a barrier the
      // shingle pipeline re-executes per consumer — worse, explode's
      // pushed size()>0 filter and CollapseProject inline split(text)
      // into every element_at, making the interpreted HOF chain
      // quadratic-ish per row (measured ~20 s vs ~3 s at sf0.1). At
      // cluster scale this is a persisted intermediate table.
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(col("words")) >= 3)
        .select(col("doc_id"), shingles(col("words"), 3).as("sgl"))
        .cache()
      val ex = sh.select(col("doc_id"), explode(col("sgl")).as("g"))
      val rare = ex.groupBy("g").agg(count(lit(1)).as("df")).where(col("df") <= 100)
        .select("g")
      // Broadcast the bounded sides: the rare-shingle set (df-capped)
      // and the 2% query sample. The full inverted index then never
      // shuffles — it streams map-side through both joins. (At cluster
      // scale with an unbounded query set, drop the aS hint and let
      // AQE pick SMJ on g — the df cap keeps that join's skew bounded.)
      val exr = ex.join(broadcast(rare), "g")
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

    // ---- SimHash (64-bit as two portable 32-bit halves) ----
    sql(
      "q_dedup_simhash",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
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
        |FROM wh)
        |SELECT a.doc_id AS da, b.doc_id AS db,
        |       CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1)) AS INT) AS dist
        |FROM sh a JOIN sh b ON a.doc_id % 100 = 0 AND b.doc_id <> a.doc_id
        |WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1)) <= 12
        |ORDER BY da, db""".stripMargin) { (s, dir) =>
      // Native codegen'd expressions (graft.expressions.*) — value-
      // identical to the HOF formulation (asserted in spec) but run as
      // tight loops instead of interpreted lambda chains.
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .select(col("doc_id"),
          graft.expressions.SaltedH32Array(col("words"), 0).as("wh0"),
          graft.expressions.SaltedH32Array(col("words"), 1).as("wh1"))
        .select(col("doc_id"),
          graft.expressions.Simhash32FromHashes(col("wh0")).as("h0"),
          graft.expressions.Simhash32FromHashes(col("wh1")).as("h1"))
        // sketches feed both sides of the pair scan — compute once
        .cache()
      val a = sh.where(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("da"), col("h0").as("a0"), col("h1").as("a1"))
      val b = sh.select(col("doc_id").as("db"), col("h0").as("b0"), col("h1").as("b1"))
      val dist = (hamming(col("a0"), col("b0")) + hamming(col("a1"), col("b1"))).cast("int")
      a.join(b, col("db") =!= col("da"))
        .withColumn("dist", dist)
        .where(col("dist") <= 12)
        .select("da", "db", "dist")
        .orderBy("da", "db")
    },

    // ---- MLlib MinHashLSH (engine-private seeds → rows-only check):
    //      the packaged, approxSimilarityJoin-based scale path ----
    rowsOnly("q_dedup_minhash_mllib") { (s, dir) =>
      import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
      // Demonstrates the packaged MLlib path on a deterministic sample;
      // the portable q_dedup_minhash_lsh above is the full-corpus op.
      val docs = t(s, dir, "documents")
        .where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), tokens(col("text")).as("words"))
        .where(size(col("words")) >= 3)
        .select(col("doc_id"), shingles(col("words"), 3).as("sgl"))
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
  )
}
