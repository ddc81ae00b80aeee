package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Value-level validation for the seven rows-only oracle queries — the
  * ones whose engine-private internals (HLL/digest sketch encodings,
  * MLlib hash seeds, k-means centroids) admit no DuckDB hash-compare.
  * Each check here pins the query's OUTPUT quality against a
  * deterministic exact twin computed in-spec, so a bug that returned
  * plausibly-shaped wrong answers (wrong neighbors, wildly-off
  * estimates) fails a test instead of sailing through a rows-only
  * count:
  *
  *  - ANN recall@3 vs brute-force ground truth (IVF ≥ 0.8, PQ ≥ 0.6
  *    pre-rerank bound per VERDICT r3 #1);
  *  - approx_count_distinct within the 3σ HLL++ bound (rsd = 0.02);
  *  - percentile_approx within the digest's rank-ε guarantee;
  *  - DataSketches HLL union within 3σ of exact distinct counts;
  *  - MLlib MinHashLSH distances ≈ true Jaccard, and no high-Jaccard
  *    pair missed by the banding;
  *  - freqItems heavy hitters: no token above the support threshold
  *    missing from the candidate list.
  *
  * All inputs are the fixed sf0.01 parquet tables and every estimator
  * is seeded, so these are deterministic checks, not flaky tolerances.
  */
class AccuracySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  import spark.implicits._

  /** (qid, cid) pairs ranked top-k by exact cosine for exactly the
    * query set the ANN queries use (vec_id % 25 == 0). */
  private def bruteForceTopK(k: Int): Set[(Long, Long)] = {
    import graft.functions.VectorFunctions.{asDouble, cosine}
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.where(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("v").as("cv"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("sim"), col("cid"))
    q.join(c, col("cid") =!= col("qid"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("qid", "cid")
      .as[(Long, Long)].collect().toSet
  }

  private def returnedPairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("qid").cast("long"), col("cid").cast("long"))
      .as[(Long, Long)].collect().toSet

  // The REGISTERED q_knn_ivf/q_knn_pq queries now emit the recall-
  // audit frame (full hash-match vs DuckDB, flag pinned TRUE); these
  // specs keep pinning the raw ANN cores' top-3 independently of the
  // in-query flag formula — same both-gates design as
  // q_approx_distinct.
  test("q_knn_ivf core recall@3 vs brute-force ground truth >= 0.8") {
    val truth = bruteForceTopK(3)
    val ivf = returnedPairs(graft.llm.SimilarityQueries.ivfTop3(spark, sf))
    val recall = (ivf & truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"IVF recall@3 = $recall (hits ${(ivf & truth).size}/${truth.size})")
  }

  test("q_knn_pq core recall@3 vs brute-force ground truth >= 0.6") {
    val truth = bruteForceTopK(3)
    val pq = returnedPairs(graft.llm.SimilarityQueries.pqTop3(spark, sf))
    val recall = (pq & truth).size.toDouble / truth.size
    assert(recall >= 0.6, s"PQ recall@3 = $recall (hits ${(pq & truth).size}/${truth.size})")
  }

  test("registered q_knn_ivf/q_knn_pq audit frames report recall_ok = true") {
    for (name <- Seq("q_knn_ivf", "q_knn_pq")) {
      val rows = SparkEntry.queries(name)(spark, sf)
        .select(col("recall_ok")).distinct().as[Boolean].collect().toSeq
      assert(rows == Seq(true), s"$name recall_ok values: $rows")
    }
  }

  test("q_approx_distinct estimates within the 3-sigma HLL++ bound of exact counts") {
    // rsd = 0.02 is the requested standard error; 3σ = 6% relative.
    // The query now emits the bound as `*_ok` flags (so the DuckDB
    // hash gate enforces it); this spec keeps bounding the RAW
    // estimates independently of the flag formula.
    val approx = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_orderkey")).as("o"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (p, o)) =>
      val (ap, ao) = approx(flag)
      assert(math.abs(ap - p).toDouble / p <= 0.06, s"$flag parts: approx $ap vs exact $p")
      assert(math.abs(ao - o).toDouble / o <= 0.06, s"$flag orders: approx $ao vs exact $o")
    }
    val flags = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .select($"parts_ok" && $"orders_ok").as[Boolean].collect()
    assert(flags.nonEmpty && flags.forall(identity), "q_approx_distinct bound flag false")
  }

  test("q_approx_percentile values sit within the digest's rank-epsilon band") {
    // accuracy = 10000 ⇒ rank error ε = 1/10000 of the group size; the
    // check is rank-based (the estimator returns a member of the group,
    // not an interpolated value, so value-compare against an
    // interpolating exact percentile would be the wrong test).
    // raw digest values, independent of the query's [p±0.01] ok-flags
    val approx = Tables(spark, sf, "events")
      .groupBy("event_type")
      .agg(percentile_approx($"value",
        array(lit(0.25), lit(0.5), lit(0.95)), lit(10000)).as("ap"))
      .select($"event_type",
        element_at($"ap", 1).cast("double"),
        element_at($"ap", 2).cast("double"),
        element_at($"ap", 3).cast("double"))
      .as[(String, Double, Double, Double)].collect()
    val groups = Tables(spark, sf, "events")
      .select($"event_type", $"value".cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    approx.foreach { case (et, p25, p50, p95) =>
      val vs = groups(et)
      val n = vs.length
      Seq(0.25 -> p25, 0.5 -> p50, 0.95 -> p95).foreach { case (q, est) =>
        // rank window the digest guarantees
        val lo = math.max(math.floor((q - 1.0 / 10000) * n).toInt - 1, 0)
        val hi = math.min(math.ceil((q + 1.0 / 10000) * n).toInt + 1, n - 1)
        assert(est >= vs(lo) && est <= vs(hi),
          s"$et q=$q: estimate $est outside value band [${vs(lo)}, ${vs(hi)}] (ranks $lo..$hi of $n)")
      }
    }
    val flags = SparkEntry.queries("q_approx_percentile")(spark, sf)
      .select($"p25_ok" && $"p50_ok" && $"p95_ok").as[Boolean].collect()
    assert(flags.nonEmpty && flags.forall(identity), "q_approx_percentile band flag false")
  }

  test("q_hll_sketch_union estimates match exact distinct counts within 3 sigma") {
    // DataSketches HLL at the default lgK=12 has rse ≈ 1.04/√4096 ≈
    // 1.6%; the per-source lang cardinalities here are tiny (sparse
    // mode — near-exact), so 3σ = 5% with a floor of 1 absorbs both
    // regimes.
    // raw estimates rebuilt here (the query now emits exact counts +
    // an est_ok flag for the hash gate; the raw sketch numbers stay
    // spec-bounded independently)
    val docs = Tables(spark, sf, "documents")
    val perSource = docs.groupBy("source").agg(hll_sketch_agg($"lang").as("sk"))
    val est = perSource
      .select($"source", hll_sketch_estimate($"sk").cast("double").as("e"))
      .unionByName(perSource.agg(
        hll_sketch_estimate(hll_union_agg($"sk")).cast("double").as("e"))
        .select(lit("ALL").as("source"), $"e"))
      .as[(String, Double)].collect().toMap
    val exactPer = docs.groupBy("source").agg(countDistinct($"lang").as("n"))
      .as[(String, Long)].collect().toMap
    val exactAll = docs.agg(countDistinct($"lang")).as[Long].head()
    (exactPer + ("ALL" -> exactAll)).foreach { case (src, n) =>
      val e = est(src)
      assert(math.abs(e - n) <= math.max(1.0, 0.05 * n),
        s"$src: HLL estimate $e vs exact $n")
    }
    val flags = SparkEntry.queries("q_hll_sketch_union")(spark, sf)
      .select($"est_ok").as[Boolean].collect()
    assert(flags.nonEmpty && flags.forall(identity), "q_hll_sketch_union bound flag false")
  }

  test("q_dedup_levenshtein SNM finds every true edit-close pair on this corpus") {
    // ground truth: the UNBLOCKED all-pairs scan (the O(n²) the
    // operator exists to avoid — affordable once, in a spec, at
    // sf0.01). The sorted-neighborhood recall trade is real in
    // general (a pair needs ≤ W-1 docs sorting between it inside its
    // block); this pins how it cashes out here, and that every
    // returned pair is a true pair (precision 1.0 by construction —
    // the residual filter recomputes the true distance).
    val p = Tables(spark, sf, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("pre"))
    val a = p.select(col("doc_id").as("da"), col("pre").as("pa"))
    val b = p.select(col("doc_id").as("db"), col("pre").as("pb"))
    val truth = a.join(b, col("da") < col("db"))
      .where(levenshtein(col("pa"), col("pb"), 12).between(0, 12))
      .select("da", "db").as[(Long, Long)].collect().toSet
    val found = SparkEntry.queries("q_dedup_levenshtein")(spark, sf)
      .select(col("da").cast("long"), col("db").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(found.subsetOf(truth), s"false pairs: ${(found -- truth).take(5)}")
    assert(truth.nonEmpty, "vacuous corpus: no edit-close pairs to find")
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"SNM recall $recall (${(truth -- found).size} missed of ${truth.size})")
  }

  test("q_dedup_minhash_mllib distances track true Jaccard and miss no 0.9+ pair") {
    import graft.functions.TextFunctions.tokens
    // the query's own input population: even doc_ids, >= 3 words
    val sgl = Tables(spark, sf, "documents")
      .where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), tokens(col("text")).as("words"))
      .where(size(col("words")) >= 3)
      .select(col("doc_id"), graft.expressions.ShinglesArray(col("words"), 3).as("sgl"))
    val a = sgl.select(col("doc_id").as("da"), col("sgl").as("sa"))
    val b = sgl.select(col("doc_id").as("db"), col("sgl").as("sb"))
    // exact pairwise Jaccard on the 3-shingle sets (few hundred docs —
    // the all-pairs scan is the point of a ground-truth computation)
    val trueJ = a.join(b, col("da") < col("db"))
      .select(col("da"), col("db"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("j"))
      .where(col("j") > 0)
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, j) => (x, y) -> j }.toMap
    // the raw pair core (the REGISTERED query now emits the
    // oracle-pinnable agreement summary; the distances live here)
    val returned = graft.llm.DedupQueries.mllibMinhashPairs(spark, sf)
      .select($"da".cast("long"), $"db".cast("long"), $"dist".cast("double"))
      .as[(Long, Long, Double)].collect()
    assert(returned.nonEmpty)
    returned.foreach { case (da, db, dist) =>
      val j = trueJ.getOrElse((da, db), 0.0)
      // MLlib's keyDistance is exact Jaccard over the 2^18-bucket
      // hashed shingle space — collisions only tighten distance, so
      // the reported distance may only slightly UNDERSTATE 1 - J.
      assert(math.abs((1.0 - dist) - j) <= 0.05,
        s"pair ($da,$db): dist $dist vs true Jaccard $j")
    }
    // completeness: every true near-identical pair must be caught (at
    // J >= 0.9 the per-table miss probability is (1-J)^4 <= 1e-4, and
    // the run is seeded — this is deterministic, not probabilistic)
    val returnedSet = returned.map { case (x, y, _) => (x, y) }.toSet
    val mustCatch = trueJ.filter(_._2 >= 0.9).keySet
    val missed = mustCatch -- returnedSet
    assert(missed.isEmpty, s"LSH missed high-Jaccard pairs: $missed")
  }

  test("q_freq_items misses no token above the support threshold") {
    // The freqItems guarantee is one-sided: every item with true
    // frequency > support·N must be returned (false positives are
    // allowed, false negatives are not). Pin it against exact counts.
    import graft.functions.TextFunctions.tokens
    val words = Tables(spark, sf, "documents")
      .select(explode(tokens(col("text"))).as("w"))
    val n = words.count()
    val mustHave = words.groupBy("w").count()
      .where(col("count") > 0.01 * n)
      .select("w").as[String].collect().toSet
    val got = SparkEntry.queries("q_freq_items")(spark, sf)
      .select("token").as[String].collect().toSet
    assert(got.nonEmpty)
    val missed = mustHave -- got
    assert(missed.isEmpty,
      s"freqItems missed ${missed.size} above-threshold tokens: " +
        missed.take(5).mkString(","))
  }

  test("q_weighted_sample selection frequency follows the weights across salts") {
    // The oracle hash-match proves determinism, not SAMPLING
    // correctness (the SQL shares the A-Res formula). Re-run the
    // selection under 20 independent salted uniforms and check the
    // statistical property the formula exists for: inclusion
    // frequency must track the weight (n_chars). Deterministic —
    // the salted hashes are fixed functions of the data.
    import graft.functions.TextFunctions.h32Salted
    val docs = Tables(spark, sf, "documents").select("doc_id", "n_chars")
    val corpusMean = docs.agg(avg(col("n_chars"))).head.getDouble(0)
    val perSalt = (0 until 20).map { salt =>
      val u = (h32Salted(lit(salt.toString), col("doc_id").cast("string"))
        % 1000000 + 0.5) / 1000000.0
      docs.select(col("doc_id"), col("n_chars"),
          (-log(u) / (col("n_chars") / 1000.0)).as("sk"))
        .orderBy(col("sk"), col("doc_id")).limit(20)
        .agg(avg(col("n_chars"))).head.getDouble(0)
    }
    // every salt's selected set must skew heavier than the corpus
    perSalt.zipWithIndex.foreach { case (m, i) =>
      assert(m > corpusMean,
        s"salt $i: selected mean n_chars $m <= corpus mean $corpusMean")
    }
  }

  test("q_split_leakproof never places an LSH near-dup pair across splits") {
    // The oracle hash pins doc→component→bucket; this pins the
    // PROPERTY the operator exists for: every near-dup pair the LSH
    // graph knows about lands in ONE split. q_split_assign (per-doc
    // hashing) must violate it on the same corpus, or the comparison
    // is vacuous.
    import graft.functions.TextFunctions.h32
    def splitOf(component: org.apache.spark.sql.Column) = {
      val b = h32(component.cast("string")) % 100
      when(b < 90, "train").when(b < 95, "val").otherwise("test")
    }
    val comp = llm.DedupClusterQueries.componentLabels(spark, sf)
    val assigned = Tables(spark, sf, "documents").select("doc_id")
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        splitOf(coalesce(col("component"), col("doc_id"))).as("split"))
    val pairs = llm.MinhashPipeline.pairs(spark, sf).select("da", "db")
    val sa = assigned.select(col("doc_id").as("da"), col("split").as("sa"))
    val sb = assigned.select(col("doc_id").as("db"), col("split").as("sb"))
    val crossing = pairs.join(sa, "da").join(sb, "db")
      .where(col("sa") =!= col("sb")).count()
    assert(crossing == 0, s"$crossing near-dup pairs straddle splits")

    // counter-witness: naive per-doc hashing leaks on this corpus
    val perDoc = Tables(spark, sf, "documents")
      .select(col("doc_id"), splitOf(col("doc_id")).as("split"))
    val na = perDoc.select(col("doc_id").as("da"), col("split").as("sa"))
    val nb = perDoc.select(col("doc_id").as("db"), col("split").as("sb"))
    val naiveCrossing = pairs.join(na, "da").join(nb, "db")
      .where(col("sa") =!= col("sb")).count()
    assert(naiveCrossing > 0,
      "corpus has no cross-split near-dup pairs under per-doc hashing — property check is vacuous")
  }

  test("q_dedup_prefix_filter finds EXACTLY the Jaccard >= 0.5 pairs (prefix filter is lossless)") {
    import graft.functions.TextFunctions.tokens
    // Unlike LSH/SNM, prefix filtering carries an exactness proof
    // (two sets with J >= τ must share a prefix element), so the spec
    // asserts set EQUALITY against the all-pairs scan, not a recall
    // floor. Integer predicate 3·ni >= na+nb and the 5-gram shingle
    // space mirror the query.
    val sgl = Tables(spark, sf, "documents")
      .select(col("doc_id"), tokens(col("text")).as("words"))
      .where(size(col("words")) >= 5)
      .select(col("doc_id"), graft.expressions.ShinglesArray(col("words"), 5).as("sgl"))
    val a = sgl.select(col("doc_id").as("da"), col("sgl").as("sa"))
    val b = sgl.select(col("doc_id").as("db"), col("sgl").as("sb"))
    val truth = a.join(b, col("da") < col("db"))
      .select(col("da"), col("db"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("ni"),
        size(col("sa")).cast("long").as("na"), size(col("sb")).cast("long").as("nb"))
      .where(col("ni") * 3 >= col("na") + col("nb"))
      .select("da", "db").as[(Long, Long)].collect().toSet
    val found = SparkEntry.queries("q_dedup_prefix_filter")(spark, sf)
      .select(col("da").cast("long"), col("db").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "vacuous corpus: no J >= 0.5 pairs to find")
    assert(found == truth,
      s"prefix filter not exact: missed ${(truth -- found).take(5)}, extra ${(found -- truth).take(5)}")
  }

  test("q_winnowing matches a from-scratch reference implementation per doc") {
    import graft.functions.TextFunctions.tokens
    // Straight-line Scala winnowing (k=3, w=4, rightmost-min rule)
    // over a sample of the query's own doc population; the query's
    // rows for those docs must match EXACTLY — pinning the hash, the
    // window arithmetic, the tie rule, and the dedupe all at once.
    def h32ref(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    def winnow(words: Array[String]): Set[(Long, Long)] = {
      if (words.length < 3) return Set.empty
      val hs = (0 to words.length - 3)
        .map(i => h32ref(s"${words(i)} ${words(i + 1)} ${words(i + 2)}")).toArray
      (3 until hs.length).flatMap { end =>
        val win = (end - 3) to end
        val mn = win.map(hs).min
        val pos = win.filter(p => hs(p) == mn).max
        Some((pos + 1).toLong -> hs(pos)) // 1-based positions
      }.toSet
    }
    val docs = Tables(spark, sf, "documents")
      .where(col("doc_id") % 10 === 0 && col("doc_id") < 300)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .as[(Long, Array[String])].collect().toMap
    assert(docs.nonEmpty)
    val expected = docs.flatMap { case (id, w) =>
      winnow(w).map { case (p, h) => (id, p, h) } }.toSet
    val got = SparkEntry.queries("q_winnowing")(spark, sf)
      .where(col("doc_id") < 300)
      .select(col("doc_id").cast("long"), col("pos").cast("long"), col("fp").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    assert(got == expected,
      s"winnowing mismatch: missing ${(expected -- got).take(5)}, extra ${(got -- expected).take(5)}")
  }

  test("q_bpe_merge rules match a from-scratch BPE trainer on the word dictionary") {
    import graft.functions.TextFunctions.tokens
    // Reference trainer: the textbook Sennrich loop over the word-
    // count dict — count adjacent pairs weighted by word count, take
    // the (count desc, pair asc) argmax, merge greedily left-to-right
    // (non-overlapping), three rounds. Pins the relational version's
    // runs-islands overlap semantics and tie rule exactly.
    val wordCounts = Tables(spark, sf, "documents")
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    var dict: Seq[(List[String], Long)] =
      wordCounts.toSeq.map { case (w, c) => (w.map(_.toString).toList :+ "</w>") -> c }
    val expected = (1 to 3).map { r =>
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      dict.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => pairCounts(p) = pairCounts.getOrElse(p, 0L) + c)
      }
      val (bp, bc) = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      dict = dict.map { case (syms, c) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && (syms(i), syms(i + 1)) == bp) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toList, c)
      }
      (r, bp._1, bp._2, bc)
    }
    val got = SparkEntry.queries("q_bpe_merge")(spark, sf)
      .select(col("round").cast("int"), col("s1"), col("s2"), col("c").cast("long"))
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == expected, s"BPE rules: got $got, expected $expected")
  }

  test("q_conformal_interval holds the finite-sample coverage guarantee per type") {
    // Split conformal guarantees E[coverage] >= 1 - alpha (= 0.9)
    // marginally; the oracle pins the exact VALUES, this pins the
    // SEMANTICS — a wrong rank formula (off-by-one, floor-vs-ceil)
    // shifts empirical coverage visibly outside the sampling band
    // around 0.9 while still hash-matching a same-wrong oracle.
    val rows = SparkEntry.queries("q_conformal_interval")(spark, sf)
      .select(col("event_type"), col("coverage"), col("n_test"))
      .as[(String, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, cov, n) =>
      assert(cov >= 0.85 && cov <= 0.97,
        s"$t: empirical coverage $cov (n_test=$n) outside the 0.9 guarantee band")
    }
  }

  test("q_kmeans_lloyd improves on the seed assignment (Lloyd monotonicity)") {
    // Lloyd's invariant: each assign+recompute round can only lower
    // total within-cluster squared distance. The oracle pins exact
    // values; this pins the SEMANTICS against a from-scratch driver
    // recomputation of the SEED-assignment inertia — a bug that
    // scrambled the recompute or argmin (while hash-matching a
    // same-wrong oracle) would not beat the k seed embeddings as
    // centroids.
    import graft.functions.VectorFunctions.asDouble
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect()
    val seeds = vecs
      .sortBy { case (id, _) =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, id)
      }
      .take(8).map(_._2)
    def sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val seedInertia = vecs.map { case (_, v) => seeds.map(sq(v, _)).min }.sum
    val out = SparkEntry.queries("q_kmeans_lloyd")(spark, sf)
      .select(col("n_vecs"), col("inertia")).as[(Long, Double)].collect()
    assert(out.map(_._1).sum === vecs.length.toLong,
      "every vector must land in exactly one cluster")
    val finalInertia = out.map(_._2).sum
    assert(finalInertia <= seedInertia + 1e-6,
      s"2 Lloyd rounds ($finalInertia) must not exceed seed-assignment inertia ($seedInertia)")
  }

  test("q_kneser_ney bits match a from-scratch scorer and probabilities are proper") {
    // Independent driver-side recomputation of the interpolated KN
    // model from the raw text (plain Scala maps, no shared DataFrame
    // code), plus the distribution identity that pins the smoothing
    // algebra: for every context w1, summing P(w2|w1) over the FULL
    // vocabulary of continuations gives exactly 1 — discount mass
    // D*fw/c1 exactly re-enters through the continuation distribution
    // (sum over w2 of N1+(.,w2) = |distinct bigrams| = T). A swapped
    // statistic (fw/bw), a wrong denominator, or a dropped max() all
    // break one of the two checks.
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val bigrams = docs.flatMap { case (d, txt) =>
      val w = txt.split(" ", -1)
      w.sliding(2).collect { case Array(a, b) => (d, a, b) }
    }
    val c2 = bigrams.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.length.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val fw = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val bw = c2.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val T = c2.size.toDouble
    val D = 0.75
    def p(w1: String, w2: String): Double =
      (c2((w1, w2)) - D) / c1(w1) + D * fw(w1) / c1(w1) * (bw(w2) / T)
    // distribution identity over the full continuation vocabulary
    val vocabW2 = bw.keys.toSeq
    c1.keys.take(50).foreach { w1 =>
      val full = vocabW2.map { w2 =>
        c2.get((w1, w2)).map(c => (c - D) / c1(w1)).getOrElse(0.0) +
          D * fw(w1) / c1(w1) * (bw(w2) / T)
      }.sum
      assert(math.abs(full - 1.0) < 1e-9, s"sum_w2 P(w2|'$w1') = $full, expected 1")
    }
    // per-doc bits vs the registered query
    val expected = bigrams.groupBy(_._1).map { case (d, bs) =>
      d -> bs.map { case (_, a, b) => -math.log(p(a, b)) / math.log(2.0) }
    }
    val got = SparkEntry.queries("q_kneser_ney")(spark, sf)
      .select(col("doc_id"), col("kn_bits_per_token")).as[(Long, Double)].collect()
    assert(got.length === expected.size)
    got.foreach { case (d, bits) =>
      val ref = expected(d).sum / expected(d).length
      assert(math.abs(bits - ref) < 1e-4, s"doc $d: engine $bits vs reference $ref")
    }
  }

  test("q_logistic_train starts at ln(2) loss and descends monotonically") {
    // Two invariants a same-wrong oracle cannot fake: with w = 0 every
    // prediction is sigma(0) = 0.5, so the step-1 pre-update loss is
    // exactly ln 2 regardless of data; and full-batch GD at this
    // learning rate on a convex loss must be non-increasing across
    // the reported trajectory.
    val rows = SparkEntry.queries("q_logistic_train")(spark, sf)
      .select(col("step"), col("loss_before")).as[(Int, Double)].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3))
    assert(math.abs(rows.head._2 - math.log(2.0)) < 1e-6,
      s"step-1 loss ${rows.head._2} != ln 2")
    rows.sliding(2).foreach { case Array((s1, l1), (s2, l2)) =>
      assert(l2 <= l1 + 1e-9, s"loss rose from step $s1 ($l1) to step $s2 ($l2)")
    }
  }

  test("q_crossval_rmse matches a from-scratch leave-fold-out evaluation") {
    // Plain-Scala recomputation: md5-fold every event, train the
    // per-type mean on the other four folds by direct summation (no
    // subtraction trick), score the held-out fold. Catches a wrong
    // fold hash, a leaked test row, or a swapped numerator that
    // same-shape SQL on both engines would hide.
    val ev = Tables(spark, sf, "events")
      .select(col("event_id").cast("string"), col("event_type"), col("value"))
      .as[(String, String, Double)].collect()
    def fold(id: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 5
    }
    val tagged = ev.map { case (id, t, v) => (fold(id), t, v) }
    val expected = (0L until 5L).map { f =>
      val train = tagged.filter(_._1 != f).groupBy(_._2)
        .map { case (t, rs) => t -> rs.map(_._3).sum / rs.length }
      val test = tagged.filter(r => r._1 == f && train.contains(r._2))
      val sse = test.map { case (_, t, v) => math.pow(v - train(t), 2) }.sum
      f -> ((test.length.toLong, math.sqrt(sse / test.length)))
    }.toMap
    val got = SparkEntry.queries("q_crossval_rmse")(spark, sf)
      .select(col("fold"), col("n_test"), col("rmse"))
      .as[(Long, Long, Double)].collect()
    assert(got.length === 5)
    got.foreach { case (f, n, rmse) =>
      val (en, ermse) = expected(f)
      assert(n === en, s"fold $f: n_test $n vs $en")
      assert(math.abs(rmse - ermse) < 1e-4, s"fold $f: rmse $rmse vs $ermse")
    }
  }

  test("q_info_gain matches a from-scratch entropy computation") {
    // Textbook IG recomputed in plain Scala from the raw events —
    // catches a swapped conditional-entropy weight or a bucket-edge
    // drift that same-shape SQL on both engines would hide.
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"), col("value"),
        hour(col("ts")).cast("long"), col("user_id"))
      .as[(String, Double, Long, Long)].collect()
    def h(pos: Long, n: Long): Double =
      if (pos == 0 || pos == n) 0.0
      else {
        val p = pos.toDouble / n
        -p * (math.log(p) / math.log(2)) -
          (1 - p) * (math.log(1 - p) / math.log(2))
      }
    val rows = ev.map { case (t, v, hr, u) =>
      (if (t == "purchase") 1L else 0L,
        math.min(math.floor(v / 50).toLong, 9L), hr, u % 10)
    }
    val n = rows.length.toLong
    val hy = h(rows.map(_._1).sum, n)
    def ig(key: ((Long, Long, Long, Long)) => Long): Double =
      hy - rows.groupBy(key).values.map { g =>
        (g.length.toDouble / n) * h(g.map(_._1).sum, g.length.toLong)
      }.sum
    val expected = Map(
      "value_bin" -> ig(_._2), "hour" -> ig(_._3), "user_bucket" -> ig(_._4))
    val got = SparkEntry.queries("q_info_gain")(spark, sf)
      .select(col("feature"), col("info_gain"), col("rank"))
      .as[(String, Double, Long)].collect()
    assert(got.length === 3)
    got.foreach { case (f, v, _) =>
      assert(math.abs(v - expected(f)) < 1e-5, s"$f: $v vs ${expected(f)}")
    }
    // the rank column must agree with the recomputed ordering
    val byRank = got.sortBy(_._3).map(_._1).toSeq
    val expOrder = expected.toSeq.sortBy { case (f, v) =>
      (-math.rint(v * 1e6) / 1e6, f) }.map(_._1)
    assert(byRank === expOrder)
  }

  test("q_naive_bayes matches a from-scratch NB classifier and beats the prior") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    val toks = docs.map { case (id, l, t) => (id, l, t.split(" ", -1).toSeq) }
    val cnt = new scala.collection.mutable.HashMap[(String, String), Long]()
    toks.foreach { case (_, l, ws) =>
      ws.foreach(w => cnt((l, w)) = cnt.getOrElse((l, w), 0L) + 1) }
    val nl = cnt.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val vsz = cnt.keys.map(_._2).toSet.size.toLong
    val priors = docs.groupBy(_._2).map { case (l, ds) => l -> ds.length.toLong }
    val langs = priors.keys.toSeq.sorted
    val total = docs.length.toLong
    val expected = toks.map { case (_, actual, ws) =>
      // same accumulation discipline as the engine: per-token log
      // probs summed as BigDecimal(38,12)-truncated values
      val best = langs.map { l =>
        val s = ws.map { w =>
          BigDecimal(math.log((cnt.getOrElse((l, w), 0L) + 1).toDouble
            / (nl(l) + vsz))).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        (s.toDouble + math.log(priors(l).toDouble / total), l)
      }.minBy { case (sc, l) => (-sc, l) }._2
      (actual, best)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = SparkEntry.queries("q_naive_bayes")(spark, sf)
      .select(col("actual"), col("predicted"), col("n_docs"))
      .as[(String, String, Long)].collect()
      .map { case (a, p, c) => (a, p) -> c }.toMap
    assert(got === expected)
    // resubstitution accuracy must beat the majority-class prior
    val correct = got.collect { case ((a, p), c) if a == p => c }.sum
    val majority = priors.values.max
    assert(correct > majority,
      s"NB resubstitution $correct/$total no better than prior $majority")
  }

  test("q_quantile_normalize equalizes every source's distribution") {
    // The QN invariant IS the test: after remapping, every source's
    // normalized mean/min/max are identical (equal-depth contract),
    // and the shared mean equals the cross-source mean of rank means.
    val out = SparkEntry.queries("q_quantile_normalize")(spark, sf)
      .select(col("source"), col("n"), col("mean_raw"), col("mean_norm"),
        col("min_norm"), col("max_norm"))
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(out.length > 1)
    assert(out.map(_._2).distinct.length === 1, "unequal depths kept")
    assert(out.map(_._4).distinct.length === 1, "mean_norm differs by source")
    assert(out.map(_._5).distinct.length === 1, "min_norm differs by source")
    assert(out.map(_._6).distinct.length === 1, "max_norm differs by source")
    // raw means must NOT all collapse to one value (else the test is vacuous)
    assert(out.map(_._3).distinct.length > 1, "raw means already equal")
    val docs = Tables(spark, sf, "documents")
      .select(col("source"), col("n_chars"), col("doc_id"))
      .as[(String, Long, Long)].collect()
    val bySrc = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.sortBy(d => (d._2, d._3)).map(_._2) }
    val depth = bySrc.values.map(_.length).min
    val refMean = (0 until depth).map { rk =>
      bySrc.values.map(_(rk).toDouble).sum / bySrc.size }
    val expectedMean = refMean.sum / depth
    assert(math.abs(out.head._4 - expectedMean) < 1e-4,
      s"mean_norm ${out.head._4} vs recomputed $expectedMean")
  }

  test("q_markov_stationary matches an in-memory power iteration") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)].collect()
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._3.getTime, e._4)).map(_._2)
      o.zip(o.drop(1))
    }.toSeq
    val cnt = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val outTot = cnt.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val pr = cnt.map { case ((p, nx), c) => (p, nx) -> c.toDouble / outTot(p) }
    val states = outTot.keys.toSeq.sorted
    var pi = states.map(_ -> 1.0 / states.size).toMap
    for (_ <- 1 to 5) {
      pi = pr.groupBy(_._1._2).map { case (nx, m) =>
        nx -> m.map { case ((p, _), t) =>
          BigDecimal(pi(p) * t).setScale(18, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
      }
    }
    val z = pi.values.map(BigDecimal(_).setScale(18,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val got = SparkEntry.queries("q_markov_stationary")(spark, sf)
      .select(col("state"), col("p_stationary"), col("mass_check"))
      .as[(String, Double, Double)].collect()
    assert(got.map(_._1).sorted.toSeq === states)
    got.foreach { case (st, p, mc) =>
      assert(math.abs(p - pi(st) / z) < 1e-5, s"$st: $p vs ${pi(st) / z}")
      assert(math.abs(mc - 1.0) < 1e-3, s"mass leaked: $mc")
    }
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-4)
  }

  test("q_rake_keyphrases matches a from-scratch RAKE extraction") {
    val stop = graft.functions.TextFunctions.stopEn.toSet
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // phrases: maximal stopword-free runs, in order
    val phrases = docs.flatMap { case (_, text) =>
      val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      text.split(" ", -1).foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) { out += cur.toSeq; cur = cur.take(0) } }
        else cur += w
      }
      if (cur.nonEmpty) out += cur.toSeq
      out
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = phrases.flatMap(p => p.map(_ -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def wscore(w: String) = deg(w).toDouble / freq(w)
    val scored = phrases.map(p => (p.mkString(" "), p.length.toLong,
      p.map(w => BigDecimal(wscore(w)).setScale(12,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble))
    val agg = scored.groupBy(s => (s._1, s._2)).map { case ((t, l), os) =>
      (t, l, os.length.toLong, os.head._3) }.toSeq
    val expected = agg
      .sortBy { case (t, _, _, s) => (-math.rint(s * 1e6) / 1e6, t) }.take(15)
    val got = SparkEntry.queries("q_rake_keyphrases")(spark, sf)
      .select(col("phrase"), col("n_words"), col("n_occur"), col("rake_score"))
      .as[(String, Long, Long, Double)].collect()
    assert(got.length === 15)
    got.zip(expected).foreach { case ((p, nw, no, sc), (ep, enw, eno, esc)) =>
      assert(p === ep, s"phrase $p vs $ep")
      assert(nw === enw && no === eno, s"$p: ($nw,$no) vs ($enw,$eno)")
      assert(math.abs(sc - esc) < 1e-5, s"$p: $sc vs $esc")
    }
  }

  test("q_spearman_by_type matches a from-scratch tie-corrected Spearman") {
    // Recompute fractional (average) ranks and Pearson-on-ranks in
    // plain collections: catches a wrong tie correction, a swapped
    // axis, or a rank window partitioned on the wrong key. The engine
    // is exact integer arithmetic; the replica is double, so 1e-9.
    val rows = Tables(spark, sf, "events")
      .select(col("event_type"), col("value"),
        (hour(col("ts")) * 60 + minute(col("ts"))).cast("long").as("mnt"))
      .as[(String, Double, Long)].collect()
    def fracRanks[T](xs: Seq[T])(implicit o: Ordering[T]): Seq[Double] = {
      val sorted = xs.sorted
      val first = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => (g.map(_._2).min + 1, g.length)).toMap
      xs.map { v => val (r, t) = first(v); r + (t - 1) / 2.0 }
    }
    val expected = rows.groupBy(_._1).map { case (tpe, es) =>
      val rx = fracRanks(es.toSeq.map(_._2))
      val ry = fracRanks(es.toSeq.map(_._3))
      val n = es.length.toDouble
      val (sx, sy) = (rx.sum, ry.sum)
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (rx.map(a => a * a).sum, ry.map(b => b * b).sum)
      tpe -> (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val got = SparkEntry.queries("q_spearman_by_type")(spark, sf)
      .select(col("event_type"), col("spearman_rho"))
      .as[(String, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (tpe, rho) =>
      assert(math.abs(rho) <= 1.0, s"$tpe: |rho| > 1: $rho")
      assert(math.abs(rho - expected(tpe)) < 1e-6,
        s"$tpe: $rho vs ${expected(tpe)}")
    }
  }

  test("q_eb_shrinkage matches a from-scratch beta-binomial posterior") {
    // Recompute the method-of-moments Beta prior and posterior means
    // in plain doubles; additionally pin the shrinkage DIRECTION —
    // every smoothed rate must sit between the raw rate and the prior
    // mean (the whole point of the estimator).
    val src = Tables(spark, sf, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("k"))
      .as[(String, Long, Long)].collect()
    val rates = src.map { case (_, n, k) => k.toDouble / n }
    val ns = rates.length
    val m = rates.sum / ns
    val v = (rates.map(r => r * r).sum - rates.sum * rates.sum / ns) / (ns - 1)
    val (a, b) =
      if (v > 0 && m * (1 - m) > v) {
        val g = m * (1 - m) / v - 1
        (m * g, (1 - m) * g)
      } else (1.0, 1.0)
    val got = SparkEntry.queries("q_eb_shrinkage")(spark, sf)
      .select(col("source"), col("n"), col("k"),
        col("rate_raw"), col("rate_smoothed"), col("shrink_frac"))
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(got.length == src.length)
    got.foreach { case (s0, n, k, raw, sm, sf0) =>
      val eSm = (k + a) / (n + a + b)
      assert(math.abs(sm - eSm) < 1e-6, s"$s0: $sm vs $eSm")
      assert(math.abs(sf0 - (a + b) / (n + a + b)) < 1e-6, s"$s0 shrink_frac")
      // direction: smoothed between raw and the prior mean (tolerance
      // for the 6dp rounding of both endpoints)
      val lo = math.min(raw, m) - 1e-6
      val hi = math.max(raw, m) + 1e-6
      assert(sm >= lo && sm <= hi, s"$s0: $sm outside [$lo, $hi]")
    }
  }

  test("q_kendall_tau matches a from-scratch pair enumeration") {
    // Exact integer C/D/tie counts from an in-memory day-pair loop
    // (revenue compared as exact BigDecimal, mirroring the engine's
    // DECIMAL sums): catches a swapped concordance sign, a missing
    // tie correction, or a float-fuzzed equality.
    val days = Tables(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("rev"),
        count(lit(1)).as("cnt"))
      .select(col("day").cast("long"), col("rev"), col("cnt"))
      .as[(Long, java.math.BigDecimal, Long)].collect()
    var (conc, disc, t1, t2, n0) = (0L, 0L, 0L, 0L, 0L)
    for (i <- days.indices; j <- days.indices if days(i)._1 < days(j)._1) {
      val cr = days(i)._2.compareTo(days(j)._2)
      val cc = days(i)._3.compare(days(j)._3)
      n0 += 1
      if (cr != 0 && cc != 0) { if (cr == cc) conc += 1 else disc += 1 }
      if (cr == 0) t1 += 1
      if (cc == 0) t2 += 1
    }
    val eTau = (conc - disc) /
      (math.sqrt((n0 - t1).toDouble) * math.sqrt((n0 - t2).toDouble))
    val r = SparkEntry.queries("q_kendall_tau")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_days") == days.length.toLong)
    assert(r.getAs[Long]("n_pairs") == n0)
    assert(r.getAs[Long]("concordant") == conc)
    assert(r.getAs[Long]("discordant") == disc)
    assert(math.abs(r.getAs[Double]("tau_b") - eTau) < 1e-6)
  }

  test("q_did_estimator matches a from-scratch 2x2 computation") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string"), col("value"))
      .as[(Long, String, Double)].collect()
    val dates = ev.map(_._2).distinct.sorted
    import java.time.LocalDate
    val mn = LocalDate.parse(dates.head)
    val half = math.floor(
      (java.time.temporal.ChronoUnit.DAYS.between(mn,
        LocalDate.parse(dates.last)) + 1) / 2.0).toLong
    def cellOf(u: Long, d: String) =
      (if (u % 2 == 1) 1 else 0,
        if (java.time.temporal.ChronoUnit.DAYS.between(mn,
          LocalDate.parse(d)) >= half) 1 else 0)
    val cells = ev.groupBy { case (u, d, _) => cellOf(u, d) }
      .view.mapValues { rows =>
        // mirror the engine's DECIMAL(18,6) per-row quantization
        val vs = rows.map(r => BigDecimal(r._3).setScale(6,
          BigDecimal.RoundingMode.HALF_UP))
        val n = vs.length
        val m = (vs.sum / n).toDouble
        val s2 = (vs.map(v => v * v.setScale(6)).sum.toDouble
          - vs.sum.toDouble * vs.sum.toDouble / n) / (n - 1)
        (n.toLong, m, s2)
      }.toMap
    val r = SparkEntry.queries("q_did_estimator")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_tp") == cells((1, 1))._1)
    assert(r.getAs[Long]("n_cr") == cells((0, 0))._1)
    val eDid = (cells((1, 1))._2 - cells((1, 0))._2) -
      (cells((0, 1))._2 - cells((0, 0))._2)
    assert(math.abs(r.getAs[Double]("did") - eDid) < 1e-5,
      s"did ${r.getAs[Double]("did")} vs $eDid")
    val eSe = math.sqrt(Seq((1, 1), (1, 0), (0, 1), (0, 0))
      .map { k => val (n, _, s2) = cells(k); s2 / n }.sum)
    assert(math.abs(r.getAs[Double]("se") - eSe) < 1e-5)
  }

  test("q_ridge_path anchors to OLS at lambda=0 and shrinks monotonically") {
    val rows = SparkEntry.queries("q_ridge_path")(spark, sf)
      .orderBy("lambda").collect()
    assert(rows.length == 3)
    // λ=0 must reproduce the ungrouped OLS solve (independent
    // from-scratch moments in plain doubles; 1e-3 because the
    // replica's float summation order differs from DECIMAL)
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_quantity").cast("double"),
        col("l_discount").cast("double"),
        col("l_extendedprice").cast("double"))
      .as[(Double, Double, Double)].collect()
    val n = li.length.toDouble
    val (s1, s2, sy) = (li.map(_._1).sum, li.map(_._2).sum, li.map(_._3).sum)
    val s11 = li.map(r => r._1 * r._1).sum; val s12 = li.map(r => r._1 * r._2).sum
    val s22 = li.map(r => r._2 * r._2).sum; val s1y = li.map(r => r._1 * r._3).sum
    val s2y = li.map(r => r._2 * r._3).sum
    val a11 = n * s11 - s1 * s1; val a12 = n * s12 - s1 * s2
    val a22 = n * s22 - s2 * s2
    val b1 = n * s1y - s1 * sy; val b2 = n * s2y - s2 * sy
    val det = a11 * a22 - a12 * a12
    val be1 = (b1 * a22 - b2 * a12) / det
    val be2 = (a11 * b2 - a12 * b1) / det
    val r0 = rows(0)
    assert(r0.getAs[Double]("lambda") == 0.0)
    assert(math.abs(r0.getAs[Double]("beta1") - be1) < 1e-3,
      s"OLS anchor beta1: ${r0.getAs[Double]("beta1")} vs $be1")
    assert(math.abs(r0.getAs[Double]("beta2") / be2 - 1.0) < 1e-6,
      s"OLS anchor beta2: ${r0.getAs[Double]("beta2")} vs $be2")
    // shrinkage: standardized |β| strictly decreasing in λ
    val b1s = rows.map(_.getAs[Double]("beta1_std").abs)
    val b2s = rows.map(_.getAs[Double]("beta2_std").abs)
    assert(b1s(0) > b1s(1) && b1s(1) > b1s(2), s"beta1_std path ${b1s.toSeq}")
    assert(b2s(0) > b2s(1) && b2s(1) > b2s(2), s"beta2_std path ${b2s.toSeq}")
  }

  test("q_scd2_build is a well-formed versioned dimension") {
    // Structural SCD2 contract per user: versions are 1..k dense,
    // exactly one current row, intervals chain (eff_to == next
    // eff_from), and consecutive versions actually CHANGE type —
    // plus a from-scratch change-count check against the raw stream.
    val got = SparkEntry.queries("q_scd2_build")(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"),
        r.getAs[String]("event_type"), r.getAs[Long]("eff_from_us"),
        r.getAs[Long]("eff_to_us"), r.getAs[Boolean]("is_current")))
      .groupBy(_._1)
    val raw = Tables(spark, sf, "events")
      .where(col("user_id") % 10 === 3)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("event_id"))
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._3, r._4))).toMap
    assert(got.keySet == raw.keySet)
    got.foreach { case (u, vsUnsorted) =>
      val vs = vsUnsorted.sortBy(_._2)
      assert(vs.map(_._2).toSeq == (1L to vs.length).toSeq, s"user $u versions")
      assert(vs.count(_._6) == 1 && vs.last._6, s"user $u current flag")
      vs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 == b._4, s"user $u: interval chain broken")
          assert(a._3 != b._3, s"user $u: no-op version")
        case _ =>
      }
      assert(vs.last._5 == -1L, s"user $u: open interval sentinel")
      // change count from the raw stream
      val types = raw(u).map(_._2)
      val changes = 1 + types.sliding(2).count {
        case Array(a, b) => a != b; case _ => false }
      assert(vs.length == changes, s"user $u: ${vs.length} vs $changes")
    }
  }

  test("q_heaps_law matches a from-scratch vocabulary-growth fit") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val mn = docs.map(_._1).min; val mx = docs.map(_._1).max
    def binOf(d: Long) =
      math.min(math.floor((d - mn) * 20.0 / (mx - mn + 1)).toLong, 19L)
    def tris(tx: String): Seq[String] =
      tx.split(" ", -1).toSeq.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq
    val toksPerBin = docs.groupBy(d => binOf(d._1))
      .view.mapValues(_.map(d =>
        math.max(d._2.split(" ", -1).length - 2, 0).toLong).sum).toMap
    val firstBin = docs.flatMap { case (id, tx) => tris(tx).map(_ -> id) }
      .groupBy(_._1).view.mapValues(v => binOf(v.map(_._2).min)).toMap
    val newvPerBin = firstBin.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bins = toksPerBin.keySet.toSeq.sorted
    var (nc, vc) = (0L, 0L)
    val cum = bins.map { b =>
      nc += toksPerBin(b); vc += newvPerBin.getOrElse(b, 0L); (b, nc, vc) }
    val xs = cum.map(c => math.log(c._2.toDouble))
    val ys = cum.map(c => math.log(c._3.toDouble))
    val np = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val eBeta = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    val eK = math.exp((sy - eBeta * sx) / np)
    val got = SparkEntry.queries("q_heaps_law")(spark, sf)
      .orderBy("bin").collect()
    assert(got.length == cum.length)
    got.zip(cum).foreach { case (r, (b, en, ev)) =>
      assert(r.getAs[Long]("bin") == b)
      assert(r.getAs[Long]("tokens_cum") == en, s"bin $b tokens")
      assert(r.getAs[Long]("vocab_cum") == ev, s"bin $b vocab")
      assert(math.abs(r.getAs[Double]("heaps_beta") - eBeta) < 1e-6)
      assert(math.abs(r.getAs[Double]("heaps_k") - eK) < 1e-5)
    }
    // Heaps exponent sanity: sub-linear vocabulary growth
    assert(eBeta > 0 && eBeta < 1, s"beta $eBeta")
  }

  test("q_embed_mmd matches a from-scratch MMD computation") {
    // Linear-kernel MMD from in-memory per-dimension means; RBF
    // U-statistic from the same deterministic md5-ordered probe
    // selection. Catches a wrong probe cap, a biased (diagonal-
    // including) U-statistic, or a swapped kernel sign.
    import graft.functions.TextFunctions
    val rows = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"),
        TextFunctions.h32(col("vec_id").cast("string")).as("h"))
      .as[(Long, Int, Seq[Double], Long)].collect()
    val (aAll, bAll) = rows.partition(_._2 < 5)
    val d = rows.head._3.length
    // linear: squared distance between the group mean vectors
    def mean(g: Array[(Long, Int, Seq[Double], Long)]) =
      (0 until d).map(i => g.map(_._3(i)).sum / g.length)
    val (ma, mb) = (mean(aAll), mean(bAll))
    val eLin = ma.zip(mb).map { case (x, y) => (x - y) * (x - y) }.sum
    // probe: 256 lowest (h32, vec_id) per side
    def probe(g: Array[(Long, Int, Seq[Double], Long)]) =
      g.sortBy(r => (r._4, r._1)).take(256).map(r => (r._1, r._3))
    val (pa, pb) = (probe(aAll), probe(bAll))
    def k(x: Seq[Double], y: Seq[Double]) = {
      val sq = x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
      math.exp(-sq / (2.0 * d))
    }
    def uStat(g: Array[(Long, Seq[Double])]) =
      (for (a <- g; b <- g if a._1 != b._1) yield k(a._2, b._2)).sum /
        (g.length.toLong * (g.length - 1))
    val cross = (for (a <- pa; b <- pb) yield k(a._2, b._2)).sum /
      (pa.length.toLong * pb.length)
    val eRbf = uStat(pa) + uStat(pb) - 2 * cross
    val r = SparkEntry.queries("q_embed_mmd")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_probe_a") == pa.length.toLong)
    assert(r.getAs[Long]("n_probe_b") == pb.length.toLong)
    assert(math.abs(r.getAs[Double]("mmd2_linear") - eLin) < 1e-6,
      s"linear ${r.getAs[Double]("mmd2_linear")} vs $eLin")
    assert(math.abs(r.getAs[Double]("mmd2_rbf") - eRbf) < 1e-6,
      s"rbf ${r.getAs[Double]("mmd2_rbf")} vs $eRbf")
  }

  test("q_format_roundtrip rows agree across formats and with parquet") {
    val got = SparkEntry.queries("q_format_roundtrip")(spark, sf).collect()
    assert(got.map(_.getAs[String]("fmt")).toSeq == Seq("csv", "json", "orc"))
    // every non-format column identical across the three formats
    val bodies = got.map(r => (r.getAs[Long]("n_rows"),
      r.getAs[Long]("sum_qty_e4"), r.getAs[Long]("sum_price_e4"),
      r.getAs[Long]("n_flags"), r.getAs[Long]("key_sum"))).distinct
    assert(bodies.length == 1, s"formats disagree: ${bodies.toSeq}")
    // and with the parquet original (qty in integer ten-thousandths)
    val p = Tables(spark, sf, "lineitem")
      .where(col("l_orderkey") % 97 === 0)
      .agg(count(lit(1)),
        sum((col("l_quantity").cast("decimal(15,4)") * 10000).cast("long")),
        sum(col("l_orderkey") + col("l_linenumber")).cast("long"))
      .collect()(0)
    assert(bodies(0)._1 == p.getLong(0))
    assert(bodies(0)._2 == p.getLong(1))
    assert(bodies(0)._5 == p.getLong(2))
  }

  test("q_propensity_ipw matches a from-scratch stratified estimate") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string"), col("value"))
      .as[(Long, String, Double)].collect()
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit.DAYS
    val dates = ev.map(_._2).distinct.sorted
    val mn = LocalDate.parse(dates.head)
    val half = math.floor(
      (DAYS.between(mn, LocalDate.parse(dates.last)) + 1) / 2.0).toLong
    def post(dt: String) = DAYS.between(mn, LocalDate.parse(dt)) >= half
    val users = ev.groupBy(_._1).flatMap { case (u, es) =>
      // mirror the engine's DECIMAL(18,6) quantization
      def q6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val pre = es.filter(e => !post(e._2)).map(e => q6(e._3)).sum
      val ps = es.filter(e => post(e._2))
      if (ps.isEmpty) None
      else Some((u % 2, math.max(math.min(
        math.floor(pre.toDouble / 400).toLong - 2, 4L), 0L),
        ps.map(e => q6(e._3)).sum.toDouble / ps.length))
    }.toSeq
    val strata = users.groupBy(_._2).view.mapValues { g =>
      val (t, c) = g.partition(_._1 == 1)
      (g.size.toLong, t.size.toLong,
        t.map(_._3).sum / t.size, c.map(_._3).sum / c.size)
    }.toMap.filter { case (_, (n, nt, _, _)) => nt > 0 && nt < n }
    val eAte = strata.values.map { case (n, _, mt, mc) => n * (mt - mc) }.sum /
      strata.values.map(_._1).sum
    val got = SparkEntry.queries("q_propensity_ipw")(spark, sf).collect()
    assert(got.map(_.getAs[Long]("stratum")).toSet == strata.keySet)
    got.foreach { r =>
      val (n, nt, mt, mc) = strata(r.getAs[Long]("stratum"))
      assert(r.getAs[Long]("n_users") == n)
      assert(r.getAs[Long]("n_treat") == nt)
      assert(math.abs(r.getAs[Double]("mean_y_treated") - mt) < 1e-5)
      assert(math.abs(r.getAs[Double]("mean_y_control") - mc) < 1e-5)
      assert(math.abs(r.getAs[Double]("ate_stratified") - eAte) < 1e-5)
    }
  }

  test("q_cluster_metrics matches from-scratch purity/NMI/ARI") {
    val rows = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .as[(Long, Int, Seq[Double])].collect()
    val assign = rows.map { case (_, lab, v) =>
      val bkt = (0 until 8).map(i => if (v(i) > 0) 1L << i else 0L).sum
      (bkt, lab)
    }
    val n = assign.length.toDouble
    val ct = assign.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val am = assign.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val bm = assign.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // .toSeq: mapping over the key SET would dedupe equal maxima
    val purity = am.keys.toSeq.map(b =>
      ct.filter(_._1._1 == b).values.max).sum / n
    val i = ct.map { case ((b, l), nij) =>
      (nij / n) * math.log(n * nij / (am(b).toDouble * bm(l))) }.sum
    def h(m: Map[_, Long]) =
      m.values.map(c => -(c / n) * math.log(c / n)).sum
    val nmi = i / (math.sqrt(h(am)) * math.sqrt(h(bm)))
    def c2(xs: Iterable[Long]) = xs.map(x => x * (x - 1) / 2.0).sum
    val (sij, sa, sb) = (c2(ct.values), c2(am.values), c2(bm.values))
    val nPairs = n * (n - 1) / 2
    val ari = (sij - sa * sb / nPairs) / ((sa + sb) / 2 - sa * sb / nPairs)
    val r = SparkEntry.queries("q_cluster_metrics")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n") == assign.length.toLong)
    assert(r.getAs[Long]("n_clusters") == am.size.toLong)
    assert(math.abs(r.getAs[Double]("purity") - purity) < 1e-6)
    assert(math.abs(r.getAs[Double]("nmi") - nmi) < 1e-6, s"nmi vs $nmi")
    assert(math.abs(r.getAs[Double]("ari") - ari) < 1e-6, s"ari vs $ari")
    // sanity: all three live in their proper ranges
    assert(purity > 0 && purity <= 1 && nmi >= 0 && nmi <= 1 && ari <= 1)
  }

  test("q_silhouette matches a from-scratch centroid silhouette") {
    val rows = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .as[(Long, Int, Seq[Double])].collect()
    val d = rows.head._3.length
    val cents = rows.groupBy(_._2).view.mapValues { g =>
      (0 until d).map(i => g.map(_._3(i)).sum / g.length)
    }.toMap
    def d2(v: Seq[Double], c: Seq[Double]) = {
      val raw = v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
      math.rint(raw * 1e6) / 1e6 // mirror the engine's 6dp rounding
    }
    val sils = rows.map { case (_, lab, v) =>
      val a = math.sqrt(d2(v, cents(lab)))
      val b = math.sqrt(cents.filter(_._1 != lab).values.map(d2(v, _)).min)
      lab -> (b - a) / math.max(math.max(a, b), 1e-300)
    }
    val perLabel = sils.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum / g.length)).toMap
    val eOverall = sils.map(_._2).sum / sils.length
    val got = SparkEntry.queries("q_silhouette")(spark, sf).collect()
    assert(got.map(_.getAs[Int]("label")).toSet == perLabel.keySet)
    got.foreach { r =>
      val (n, ms) = perLabel(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n_vecs") == n)
      assert(math.abs(r.getAs[Double]("silhouette") - ms) < 1e-5,
        s"label ${r.getAs[Int]("label")}: ${r.getAs[Double]("silhouette")} vs $ms")
      assert(math.abs(r.getAs[Double]("silhouette_overall") - eOverall) < 1e-5)
      assert(r.getAs[Double]("silhouette") >= -1
        && r.getAs[Double]("silhouette") <= 1)
    }
  }

  test("q_bradley_terry matches a from-scratch MM fit") {
    // In-memory Hunter-2004 minorization-maximization on the same
    // pairwise wins the engine derives: catches a transposed game
    // matrix, a missed normalization, or a denominator built from
    // stale strengths.
    val um = Tables(spark, sf, "events")
      .groupBy("user_id", "event_type")
      .agg((sum(col("value").cast("decimal(18,6)")).cast("double")
        / count(lit(1))).as("m"))
      .as[(Long, String, Double)].collect()
    val byUser = um.groupBy(_._1)
    val games = scala.collection.mutable.Map[(String, String), Long]()
    val wins = scala.collection.mutable.Map[(String, String), Long]()
    for (g <- byUser.values; a <- g; b <- g
         if a._2 < b._2 && a._3 != b._3) {
      for ((i, j, w) <- Seq((a._2, b._2, if (a._3 > b._3) 1L else 0L),
        (b._2, a._2, if (b._3 > a._3) 1L else 0L))) {
        games((i, j)) = games.getOrElse((i, j), 0L) + 1L
        wins((i, j)) = wins.getOrElse((i, j), 0L) + w
      }
    }
    val types = games.keys.map(_._1).toSeq.distinct.sorted
    val bigW = types.map(t => t -> types.filter(_ != t)
      .map(j => wins.getOrElse((t, j), 0L)).sum).toMap
    var s = types.map(t => t -> 1.0).toMap
    for (_ <- 1 to 3) {
      val upd = types.map { i =>
        val den = types.filter(_ != i)
          .map(j => games.getOrElse((i, j), 0L) / (s(i) + s(j))).sum
        i -> bigW(i) / den
      }.toMap
      val norm = types.size / upd.values.sum
      s = upd.view.mapValues(_ * norm).toMap
    }
    val got = SparkEntry.queries("q_bradley_terry")(spark, sf).collect()
    assert(got.map(_.getAs[String]("event_type")).toSet == types.toSet)
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("wins") == bigW(et))
      assert(math.abs(r.getAs[Double]("strength") - s(et)) < 1e-5,
        s"$et: ${r.getAs[Double]("strength")} vs ${s(et)}")
    }
    // a strength fit that ignored the games entirely would stay at 1.0
    assert(got.map(_.getAs[Double]("strength")).distinct.length > 1)
  }

  test("q_ipf_raking matches a from-scratch IPF and hits the column marginals") {
    val cells = Tables(spark, sf, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    val total = cells.map(_._3).sum
    val rt = total.toDouble / cells.map(_._1).distinct.length
    val ct = total.toDouble / cells.map(_._2).distinct.length
    var w = cells.map { case (s0, l, n) => ((s0, l), 1.0) }.toMap
    val nOf = cells.map(c => ((c._1, c._2), c._3)).toMap
    for (_ <- 1 to 3) {
      val rowSum = cells.groupBy(_._1).view.mapValues(
        _.map(c => nOf((c._1, c._2)) * w((c._1, c._2))).sum).toMap
      w = w.map { case (k, v) => k -> v * rt / rowSum(k._1) }
      val colSum = cells.groupBy(_._2).view.mapValues(
        _.map(c => nOf((c._1, c._2)) * w((c._1, c._2))).sum).toMap
      w = w.map { case (k, v) => k -> v * ct / colSum(k._2) }
    }
    val got = SparkEntry.queries("q_ipf_raking")(spark, sf).collect()
    assert(got.length == cells.length)
    got.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
      assert(math.abs(r.getAs[Double]("weight") - w(k)) < 1e-5,
        s"$k: ${r.getAs[Double]("weight")} vs ${w(k)}")
    }
    // the final scaling pass is column-wise: every lang marginal of
    // the fitted table must match its target exactly (to rounding)
    val colFit = got.groupBy(_.getAs[String]("lang")).view
      .mapValues(_.map(_.getAs[Double]("fitted")).sum)
    colFit.foreach { case (l, v) =>
      assert(math.abs(v - ct) < 1e-2, s"lang $l marginal $v vs $ct")
    }
  }

  test("q_huber_mean matches a from-scratch IRLS and damps an injected outlier") {
    val vals = Tables(spark, sf, "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    val byType = vals.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = SparkEntry.queries("q_huber_mean")(spark, sf).collect()
    got.foreach { r =>
      val xs = byType(r.getAs[String]("event_type"))
      val n = xs.length
      val mu0 = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mu0) * (x - mu0)).sum / (n - 1))
      val k = 1.345 * sd
      def irls(mu: Double) = {
        val ws = xs.map(x => if (math.abs(x - mu) <= k) 1.0
          else k / math.abs(x - mu))
        ws.zip(xs).map { case (wv, x) => wv * x }.sum / ws.sum
      }
      val mu2 = irls(irls(mu0))
      assert(math.abs(r.getAs[Double]("mu_round2") - mu2) < 1e-4,
        s"${r.getAs[String]("event_type")}: ${r.getAs[Double]("mu_round2")} vs $mu2")
      // robustness property: the Huber center moves less than the mean
      // when one huge outlier is injected into the replica
      val polluted = xs :+ (mu0 + 1000 * sd)
      val pm = polluted.sum / polluted.length
      def irlsP(mu: Double) = {
        val ws = polluted.map(x => if (math.abs(x - mu) <= k) 1.0
          else k / math.abs(x - mu))
        ws.zip(polluted).map { case (wv, x) => wv * x }.sum / ws.sum
      }
      val pH = irlsP(irlsP(pm))
      assert(math.abs(pH - mu2) < math.abs(pm - mu0),
        "Huber center must move less than the mean under a 1000-sigma outlier")
    }
  }

  test("q_shapley_attribution matches a from-scratch coalition game and is efficient") {
    // In-memory zeta transform + exact factorial-weighted marginal
    // sums over all 16 coalitions; also pins the EFFICIENCY axiom
    // (Σ shapley = v(full) − v(∅)) that the weighted sum must satisfy
    // by construction — a wrong weight table or a transposed subset
    // join breaks it immediately.
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
      .as[(Long, String, Long)].collect()
    val chans = Seq("click", "error", "signup", "view")
    val byUser = ev.groupBy(_._1)
    val cells = scala.collection.mutable.Map[Int, Long]()
    byUser.values.foreach { g =>
      val pts = g.filter(_._2 == "purchase").map(_._3)
      val conv = pts.nonEmpty
      if (conv) {
        val p = pts.min
        val mask = chans.zipWithIndex.map { case (c, i) =>
          if (g.exists(e => e._2 == c && e._3 < p)) 1 << i else 0
        }.sum
        cells(mask) = cells.getOrElse(mask, 0L) + 1L
      }
    }
    val v = (0 until 16).map(sS =>
      sS -> cells.filter { case (m, _) => (m & sS) == m }.values.sum).toMap
    val w24 = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
    val shap = chans.zipWithIndex.map { case (c, i) =>
      val bit = 1 << i
      c -> (0 until 16).filter(sS => (sS & bit) == 0)
        .map(sS => w24(Integer.bitCount(sS)) * (v(sS + bit) - v(sS))).sum / 24.0
    }.toMap
    val got = SparkEntry.queries("q_shapley_attribution")(spark, sf).collect()
    assert(got.map(_.getAs[String]("channel")).toSet == chans.toSet)
    got.foreach { r =>
      val c = r.getAs[String]("channel")
      assert(math.abs(r.getAs[Double]("shapley_conv") - shap(c)) < 1e-3,
        s"$c: ${r.getAs[Double]("shapley_conv")} vs ${shap(c)}")
      assert(r.getAs[Long]("conv_total") == v(15))
      assert(r.getAs[Long]("conv_no_channel") == v(0))
    }
    // efficiency axiom
    assert(math.abs(shap.values.sum - (v(15) - v(0))) < 1e-9)
  }

  test("q_mixture_em matches a from-scratch 2-round EM") {
    val vals = Tables(spark, sf, "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    val byType = vals.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = SparkEntry.queries("q_mixture_em")(spark, sf).collect()
    assert(got.map(_.getAs[String]("event_type")).toSet == byType.keySet)
    got.foreach { r =>
      val xs = byType(r.getAs[String]("event_type"))
      val n = xs.length
      val mean = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      var (mu1, mu2, sg1, sg2, pi2) = (mean - sd, mean + sd, sd, sd, 0.5)
      for (_ <- 1 to 2) {
        val rr = xs.map { x =>
          val d1 = math.exp(-(x - mu1) * (x - mu1) / (2 * sg1 * sg1)) / sg1
          val d2 = math.exp(-(x - mu2) * (x - mu2) / (2 * sg2 * sg2)) / sg2
          pi2 * d2 / ((1 - pi2) * d1 + pi2 * d2)
        }
        val sr = rr.sum
        val srx = rr.zip(xs).map { case (w, x) => w * x }.sum
        val srxx = rr.zip(xs).map { case (w, x) => w * x * x }.sum
        val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
        pi2 = sr / n
        mu1 = (sx - srx) / (n - sr); mu2 = srx / sr
        sg1 = math.sqrt((sxx - srxx) / (n - sr) - mu1 * mu1)
        sg2 = math.sqrt(srxx / sr - mu2 * mu2)
      }
      assert(math.abs(r.getAs[Double]("pi2") - pi2) < 1e-4)
      assert(math.abs(r.getAs[Double]("mu1") - mu1) < 1e-3,
        s"mu1 ${r.getAs[Double]("mu1")} vs $mu1")
      assert(math.abs(r.getAs[Double]("mu2") - mu2) < 1e-3)
      assert(r.getAs[Double]("sigma1") > 0 && r.getAs[Double]("sigma2") > 0)
      assert(r.getAs[Double]("mu1") < r.getAs[Double]("mu2"),
        "components seeded apart must not cross in 2 rounds on this corpus")
    }
  }

  test("q_als_round matches a from-scratch alternating solve and descends") {
    val um = Tables(spark, sf, "events")
      .groupBy("user_id", "event_type")
      .agg((sum(col("value").cast("decimal(18,6)")).cast("double")
        / count(lit(1))).as("r"))
      .as[(Long, String, Double)].collect()
    val types = um.map(_._2).distinct.sorted
    val kk = types.length
    val y0 = types.zipWithIndex
      .map { case (t, i) => t -> (1.0, (i + 1).toDouble / kk) }.toMap
    val lam = 0.1
    def solve(rows: Seq[(Double, Double, Double)]) = { // (f1, f2, r)
      val a11 = rows.map(t => t._1 * t._1).sum + lam
      val a12 = rows.map(t => t._1 * t._2).sum
      val a22 = rows.map(t => t._2 * t._2).sum + lam
      val b1 = rows.map(t => t._1 * t._3).sum
      val b2 = rows.map(t => t._2 * t._3).sum
      val det = a11 * a22 - a12 * a12
      ((a22 * b1 - a12 * b2) / det, (a11 * b2 - a12 * b1) / det)
    }
    val x = um.groupBy(_._1).view.mapValues { g =>
      solve(g.map(t => (y0(t._2)._1, y0(t._2)._2, t._3)).toSeq)
    }.toMap
    val y1 = um.groupBy(_._2).view.mapValues { g =>
      solve(g.map(t => (x(t._1)._1, x(t._1)._2, t._3)).toSeq)
    }.toMap
    def rmse(y: Map[String, (Double, Double)]) = math.sqrt(um.map { t =>
      val e = t._3 - (x(t._1)._1 * y(t._2)._1 + x(t._1)._2 * y(t._2)._2)
      e * e
    }.sum / um.length)
    val got = SparkEntry.queries("q_als_round")(spark, sf).collect()
    assert(got.map(_.getAs[String]("event_type")).toSet == types.toSet)
    got.foreach { r =>
      val (ey1, ey2) = y1(r.getAs[String]("event_type"))
      assert(math.abs(r.getAs[Double]("y1") - ey1) < 1e-4,
        s"${r.getAs[String]("event_type")} y1 ${r.getAs[Double]("y1")} vs $ey1")
      assert(math.abs(r.getAs[Double]("y2") - ey2) < 1e-4)
      assert(math.abs(r.getAs[Double]("rmse_half") - rmse(y0)) < 1e-4)
      assert(math.abs(r.getAs[Double]("rmse_after") - rmse(y1.toMap)) < 1e-4)
      assert(r.getAs[Boolean]("improved"),
        "the item half-step must not increase RMSE")
    }
  }

  test("q_hll_portable registers and estimate equal a from-scratch HLL") {
    // Recompute every register in plain Scala from the same md5-derived
    // 60-bit hash — catches a wrong bucket split, an off-by-one in the
    // rho width, a missed empty-bucket spine row, or a denominator
    // summed in floats instead of scaled integers.
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val users = Tables(spark, sf, "events").select("user_id")
      .distinct().as[Long].collect()
    val reg = new Array[Int](64)
    users.foreach { u =>
      val h = java.lang.Long.parseLong(md5hex(u.toString).take(15), 16)
      val bucket = (h % 64).toInt
      val rest = h >>> 6
      val rho = if (rest == 0) 55
        else 55 - java.lang.Long.toBinaryString(rest).length
      if (rho > reg(bucket)) reg(bucket) = rho
    }
    val zeros = reg.count(_ == 0)
    val denomScaled = reg.map(m => 1L << (55 - m)).sum
    val raw = 0.709 * 4096 * 36028797018963968.0 / denomScaled
    val est = if (raw <= 160 && zeros > 0) 64.0 * math.log(64.0 / zeros) else raw
    val r = SparkEntry.queries("q_hll_portable")(spark, sf).collect().head
    assert(r.getAs[Long]("register_sum") == reg.map(_.toLong).sum, "register sum")
    assert(r.getAs[Long]("register_max") == reg.max.toLong, "register max")
    assert(r.getAs[Long]("zeros") == zeros.toLong, "empty buckets")
    assert(math.abs(r.getAs[Double]("est_distinct") - est) <= 0.01,
      s"estimate ${r.getAs[Double]("est_distinct")} vs replica $est")
    assert(r.getAs[Long]("exact_distinct") == users.length.toLong)
    // m=64 standard error is 1.04/8 = 13%; 3 sigma = 39%
    assert(r.getAs[Double]("rel_err") <= 0.39,
      s"HLL estimate ${r.getAs[Double]("rel_err")} outside 3-sigma")
  }

  test("q_knn_multiprobe candidate superset strictly helps recall") {
    // The Hamming-1 probe set CONTAINS the single-bucket probe (i=0),
    // so the candidate count must dominate and recall must not drop
    // by more than one rounding step; the headline claim — probing
    // neighbors finds more of the exact top-10 — is checked as a
    // strict improvement on this corpus (measured 0.019 → 0.109).
    val r = SparkEntry.queries("q_knn_multiprobe")(spark, sf).collect().head
    assert(r.getAs[Long]("cand_multi") >= r.getAs[Long]("cand_single"),
      "multi-probe candidates must be a superset")
    assert(r.getAs[Double]("recall_multiprobe") >
      r.getAs[Double]("recall_single"),
      s"multi-probe recall ${r.getAs[Double]("recall_multiprobe")} did not " +
        s"beat single-bucket ${r.getAs[Double]("recall_single")}")
    assert(r.getAs[Double]("cost_ratio") >= 1.0)
  }

  test("q_plsa_round equals a from-scratch EM step") {
    import graft.functions.TextFunctions.tokens
    // replicate init, E-step and M-step in plain Scala — catches a
    // swapped topic hash salt, a theta/phi mixup, or a denominator
    // summed over the wrong grain
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val ndw = Tables(spark, sf, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect()
    val vocab = ndw.map(_._2).distinct
    val g0 = vocab.map(w => w -> (1 + (h32(w) % 3))).toMap
    val g1 = vocab.map(w => w -> (1 + ((h32(w) + 1) % 3))).toMap
    val (t0, t1) = (g0.values.sum.toDouble, g1.values.sum.toDouble)
    val m0 = collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    val m1 = collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    ndw.foreach { case (d, w, n) =>
      val th0 = 0.3 + 0.4 * (d % 2)
      val f0 = g0(w) / t0; val f1 = g1(w) / t1
      val den = th0 * f0 + (1.0 - th0) * f1
      m0(w) += n * th0 * f0 / den
      m1(w) += n * (1.0 - th0) * f1 / den
    }
    val (z0, z1) = (m0.values.sum, m1.values.sum)
    val top0 = m0.toSeq.sortBy { case (w, v) => (-v, w) }.take(10)
    val top1 = m1.toSeq.sortBy { case (w, v) => (-v, w) }.take(10)
    val got = SparkEntry.queries("q_plsa_round")(spark, sf).collect()
    assert(got.length == 20)
    got.foreach { r =>
      val (topic, rnk) = (r.getAs[Long]("topic"), r.getAs[Long]("rnk"))
      val (ew, ev, ez) = if (topic == 0)
        (top0((rnk - 1).toInt)._1, top0((rnk - 1).toInt)._2, z0)
      else (top1((rnk - 1).toInt)._1, top1((rnk - 1).toInt)._2, z1)
      assert(r.getAs[String]("word") == ew,
        s"topic $topic rank $rnk: ${r.getAs[String]("word")} vs $ew")
      assert(math.abs(r.getAs[Double]("phi") - ev / ez) <= 1e-5,
        s"topic $topic rank $rnk phi")
      assert(math.abs(r.getAs[Double]("topic_mass")
        - (if (topic == 0) z0 else z1) / (z0 + z1)) <= 1e-5)
    }
  }

  test("q_ndcg_at_k equals a from-scratch graded eval and bounds hold") {
    import graft.functions.VectorFunctions.{asDouble, cosine}
    // replicate probes, exact + bucket rankings, and NDCG with the
    // SAME pinned 9-decimal discounts on the sf0.01 corpus
    val weights = Array(1.0, 0.630929754, 0.5, 0.430676558, 0.386852807,
      0.356207187, 0.333333333, 0.315464877, 0.301029996, 0.289064826)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def bucket(v: Seq[Double]): Long =
      (0 until 8).map(i => if (v(i) > 0) 1L << i else 0L).sum
    val bkt = emb.view.mapValues(bucket).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val probes = emb.keys.filter(_ % 25 == 0).toSeq
      .sortBy(q => (md5hex(q.toString), q)).take(128)
    var sumN = 0.0
    var perfect = 0
    probes.foreach { q =>
      def top10(pool: Iterable[Long]): Seq[Long] = pool.toSeq
        .map(c => (c, r6(cos(emb(q), emb(c)))))
        .sortBy { case (c, s) => (-s, c) }.take(10).map(_._1)
      val truth = top10(emb.keys.filter(_ != q))
      val trank = truth.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
      val retrieved = top10(emb.keys.filter(c => c != q && bkt(c) == bkt(q)))
      val dcg = retrieved.zipWithIndex.map { case (c, i) =>
        trank.get(c).map(t => (11 - t) * weights(i)).getOrElse(0.0) }.sum
      val idcg = truth.indices.map(i => (11 - (i + 1)) * weights(i)).sum
      val ndcg = if (idcg > 0) dcg / idcg else 0.0
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-12, s"probe $q ndcg $ndcg")
      sumN += ndcg
      if (ndcg >= 0.999999) perfect += 1
    }
    val r = SparkEntry.queries("q_ndcg_at_k")(spark, sf).collect().head
    assert(r.getAs[Long]("n_queries") == probes.size.toLong)
    assert(math.abs(r.getAs[Double]("mean_ndcg_at10") - sumN / probes.size) <= 1e-6,
      s"mean ndcg ${r.getAs[Double]("mean_ndcg_at10")} vs replica ${sumN / probes.size}")
    assert(r.getAs[Long]("perfect_queries") == perfect.toLong)
  }

  test("q_holt_forecast matches a from-scratch Holt fold per series") {
    import spark.implicits._
    val daily = Tables(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("y"))
      .as[(String, java.sql.Date, Double)].collect()
    val expected = daily.groupBy(_._1).view.mapValues { rows =>
      val ys = rows.sortBy(_._2.toString).map(_._3)
      var l = ys.head; var b = 0.0
      ys.tail.foreach { y =>
        val lp = 0.5 * y + 0.5 * (l + b)
        val bp = 0.3 * (0.5 * y - 0.5 * l + 0.5 * b) + 0.7 * b
        l = lp; b = bp
      }
      (ys.length.toLong, l, b)
    }.toMap
    val got = SparkEntry.queries("q_holt_forecast")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, l, b) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_days") == n)
      assert(math.abs(r.getAs[Double]("level") - l) <= 1e-6)
      assert(math.abs(r.getAs[Double]("trend") - b) <= 1e-6)
      assert(math.abs(r.getAs[Double]("fc_3") - (l + 3 * b)) <= 1e-6)
    }
  }

  test("q_team_draft drafts fairly, without repeats, in ranking order") {
    val rows = SparkEntry.queries("q_team_draft")(spark, sf).collect()
    assert(rows.length == 10)
    val docs = rows.map(_.getAs[Long]("doc_id"))
    assert(docs.distinct.length == 10, "a doc was drafted twice")
    // team balance: after every prefix the pick counts differ by <= 1
    var (na, nb) = (0, 0)
    rows.sortBy(_.getAs[Long]("pos")).foreach { r =>
      if (r.getAs[String]("team") == "A") na += 1 else nb += 1
      assert(math.abs(na - nb) <= 1, s"unfair draft at pos ${r.getAs[Long]("pos")}")
    }
    assert(na == 5 && nb == 5)
    // verdict consistency: preferred matches the click totals
    val (ca, cb) = (rows.head.getAs[Long]("clicks_a"), rows.head.getAs[Long]("clicks_b"))
    val sumA = rows.filter(_.getAs[String]("team") == "A").map(_.getAs[Long]("clicked")).sum
    val sumB = rows.filter(_.getAs[String]("team") == "B").map(_.getAs[Long]("clicked")).sum
    assert(ca == sumA && cb == sumB)
    val want = if (ca > cb) "A" else if (cb > ca) "B" else "tie"
    assert(rows.forall(_.getAs[String]("preferred") == want))
  }

  test("q_permutation_test p-value is consistent with its own replicate rows") {
    val rows = SparkEntry.queries("q_permutation_test")(spark, sf).collect()
    assert(rows.length == 32)
    val tObs = rows.head.getAs[Double]("t_obs")
    assert(rows.forall(_.getAs[Double]("t_obs") == tObs))
    // recompute p from the (rounded) replicate statistics; rounding at
    // 6dp can flip a boundary comparison only if |t_perm| is within
    // 5e-7 of |t_obs| — assert no replicate sits in that window, then
    // the recomputation is exact
    val ts = rows.map(_.getAs[Double]("t_perm"))
    assert(!ts.exists(t => math.abs(math.abs(t) - math.abs(tObs)) < 5e-7 &&
      math.abs(t) != math.abs(tObs)))
    val nGe = ts.count(t => math.abs(t) >= math.abs(tObs))
    val p = rows.head.getAs[Double]("p_value")
    assert(math.abs(p - math.rint((1.0 + nGe) / 33.0 * 1e6) / 1e6) <= 1e-9,
      s"p $p vs recomputed ${(1.0 + nGe) / 33.0} (n_ge=$nGe)")
  }

  test("q_zipf_fit matches a from-scratch log-log OLS on the top-500 head") {
    import spark.implicits._
    val freqs = Tables(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    val head = freqs.sortBy { case (w, c) => (-c, w) }.take(500)
    val xs = head.indices.map(i => math.log((i + 1).toDouble))
    val ys = head.map { case (_, c) => math.log(c.toDouble) }
    val n = head.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val syy = ys.map(y => y * y).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r = SparkEntry.queries("q_zipf_fit")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n") == head.length.toLong)
    assert(math.abs(r.getAs[Double]("slope") - slope) <= 1e-5,
      s"slope ${r.getAs[Double]("slope")} vs $slope")
    assert(r.getAs[Double]("slope") < 0, "Zipf slope must be negative")
    val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(r.getAs[Double]("r2") - r2) <= 1e-5)
  }

  test("q_ar2_forecast matches a from-scratch Yule-Walker fit per series") {
    import spark.implicits._
    val daily = Tables(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("y"))
      .as[(String, java.sql.Date, Double)].collect()
    val got = SparkEntry.queries("q_ar2_forecast")(spark, sf).collect()
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val ys = daily.filter(_._1 == et).sortBy(_._2.toString).map(_._3)
      val mu = ys.sum / ys.length
      def cov(k: Int) =
        (k until ys.length).map(t => (ys(t) - mu) * (ys(t - k) - mu)).sum
      val (c0, c1, c2) = (cov(0), cov(1), cov(2))
      val (r1, r2) = (c1 / c0, c2 / c0)
      val phi1 = r1 * (1 - r2) / (1 - r1 * r1)
      val phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
      val fc = mu + phi1 * (ys.last - mu) + phi2 * (ys(ys.length - 2) - mu)
      assert(r.getAs[Long]("n_days") == ys.length.toLong)
      assert(math.abs(r.getAs[Double]("phi1") - phi1) <= 1e-5)
      assert(math.abs(r.getAs[Double]("phi2") - phi2) <= 1e-5)
      assert(math.abs(r.getAs[Double]("fc_next") - fc) <= 1e-4)
    }
  }

  test("q_isotonic_calibration equals the classic PAV stack algorithm") {
    val rows = SparkEntry.queries("q_isotonic_calibration")(spark, sf).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(rows.length == 20)
    // classic pool-adjacent-violators over the same (n, conv) bins
    case class Block(n: Long, conv: Long, bins: Int) {
      def rate: Double = conv.toDouble / n
    }
    val stack = scala.collection.mutable.Stack.empty[Block]
    rows.foreach { r =>
      var b = Block(r.getAs[Long]("n"), r.getAs[Long]("conv"), 1)
      while (stack.nonEmpty && stack.top.rate >= b.rate) {
        val t = stack.pop()
        b = Block(t.n + b.n, t.conv + b.conv, t.bins + b.bins)
      }
      stack.push(b)
    }
    val perBin = stack.toSeq.reverse.flatMap(b => Seq.fill(b.bins)(b.rate))
    assert(perBin.length == 20)
    rows.zip(perBin).foreach { case (r, exp) =>
      val got = r.getAs[Double]("iso_rate")
      assert(math.abs(got - math.rint(exp * 1e6) / 1e6) <= 1e-9,
        s"bin ${r.getAs[Long]("bin")}: iso $got vs PAV $exp")
    }
    // monotone by construction
    val isoSeq = rows.map(_.getAs[Double]("iso_rate"))
    assert(isoSeq.zip(isoSeq.tail).forall { case (a, b) => a <= b + 1e-12 })
  }

  test("q_sequence_packing matches a from-scratch greedy packer per source") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        least(size(graft.functions.TextFunctions.tokens(col("text"))), lit(512))
          .cast("long").as("l"))
      .as[(String, Long, Long)].collect()
    val got = SparkEntry.queries("q_sequence_packing")(spark, sf).collect()
    val bySrc = docs.groupBy(_._1)
    assert(got.length == bySrc.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val ls = bySrc(src).sortBy(_._2).map(_._3)
      var (used, bins) = (0L, 0L)
      ls.foreach { l =>
        if (bins == 0L || used + l > 512) { bins += 1; used = l }
        else used += l
      }
      assert(r.getAs[Long]("n_docs") == ls.length.toLong)
      assert(r.getAs[Long]("total_tokens") == ls.sum)
      assert(r.getAs[Long]("n_windows") == bins, s"$src windows")
      assert(r.getAs[Long]("waste_tokens") == bins * 512 - ls.sum)
    }
  }

  test("q_dbscan_clusters partitions exactly the core+border cells of q_dbscan_cells") {
    val cells = SparkEntry.queries("q_dbscan_cells")(spark, sf).collect()
    val clusters = SparkEntry.queries("q_dbscan_clusters")(spark, sf).collect()
    val coreCells = cells.count(_.getAs[String]("cls") == "core")
    val borderCells = cells.count(_.getAs[String]("cls") == "border")
    assert(clusters.map(_.getAs[Long]("n_core_cells")).sum == coreCells.toLong,
      "core cells must partition across clusters")
    assert(clusters.map(_.getAs[Long]("n_border_cells")).sum == borderCells.toLong,
      "each border cell joins exactly one (min-label) cluster")
    // labels are canonical: every cluster id is one of its member core
    // cell keys, and the 3-round propagation makes ids distinct minima
    val ids = clusters.map(_.getAs[Long]("cluster"))
    assert(ids.distinct.length == ids.length)
    // points roll up: cluster points = core+border member points
    val cellN = cells.map(r => ((r.getAs[Long]("cx"), r.getAs[Long]("cy")),
      (r.getAs[Long]("n"), r.getAs[String]("cls")))).toMap
    val totalPts = cellN.values.collect {
      case (n, c) if c == "core" || c == "border" => n }.sum
    assert(clusters.map(_.getAs[Long]("n_points")).sum == totalPts)
  }

  test("q_ransac_line matches a from-scratch consensus search") {
    import spark.implicits._
    val daily = Tables(spark, sf, "orders")
      .groupBy(graft.functions.TimeFunctions.dayNum(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
        .cast("decimal(15,4)").as("rev"))
      .as[(Long, java.math.BigDecimal)].collect()
      .map { case (d, r) => (d, r.doubleValue) }.sortBy(_._1)
    val n = daily.length
    val tau = daily.map(_._2).sum / n * 0.25
    def coin(s: String) = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    val cands = (0 until 32).map { c =>
      val ri = (coin(s"ra:$c") % n + 1).toInt
      val rj0 = (coin(s"rb:$c") % (n - 1)).toInt
      val rj = if (rj0 + 1 < ri) rj0 + 1 else rj0 + 2
      val (xi, yi) = daily(ri - 1)
      val (xj, yj) = daily(rj - 1)
      val m = (yj - yi) / (xj - xi)
      val inl = daily.count { case (x, y) => math.abs(y - (yi + m * (x - xi))) <= tau }
      (c, inl)
    }
    val (bestC, bestInl) = cands.maxBy { case (c, inl) => (inl, -c) }
    val r = SparkEntry.queries("q_ransac_line")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[Long]("best_candidate") == bestC.toLong,
      s"winner ${r.getAs[Long]("best_candidate")} vs $bestC")
    assert(r.getAs[Long]("n_inliers") == bestInl.toLong)
    // the refit slope must beat the proposal line on its own inliers
    assert(r.getAs[Double]("inlier_share") > 0.2, "consensus degenerate")
  }

  test("q_psm_matching matches a from-scratch 1-NN caliper match") {
    import spark.implicits._
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string"), col("value"))
      .as[(Long, String, Double)].collect()
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit.DAYS
    val dates = ev.map(_._2).distinct.sorted
    val mn = LocalDate.parse(dates.head)
    val half = math.floor(
      (DAYS.between(mn, LocalDate.parse(dates.last)) + 1) / 2.0).toLong
    def post(dt: String) = DAYS.between(mn, LocalDate.parse(dt)) >= half
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val users = ev.groupBy(_._1).flatMap { case (uid, es) =>
      val pre = es.filter(e => !post(e._2)).map(e => q6(e._3)).sum
      val ps = es.filter(e => post(e._2))
      if (ps.isEmpty) None
      else Some((uid, uid % 2, pre, ps.map(e => q6(e._3)).sum.toDouble / ps.length))
    }.toSeq
    val treated = users.filter(_._2 == 1)
    val controls = users.filter(_._2 == 0)
    val matches = treated.flatMap { case (tid, _, ts, yt) =>
      val cands = controls.filter { case (_, _, cs, _) => (ts - cs).abs <= 400 }
      if (cands.isEmpty) None
      else {
        val (cid, _, _, yc) = cands.minBy { case (cid, _, cs, _) => ((ts - cs).abs, cid) }
        Some(yt - yc)
      }
    }
    val r = SparkEntry.queries("q_psm_matching")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_treated") == treated.length.toLong)
    assert(r.getAs[Long]("n_control") == controls.length.toLong)
    assert(r.getAs[Long]("n_matched") == matches.length.toLong)
    val att = matches.sum / matches.length
    assert(math.abs(r.getAs[Double]("att_matched") - att) <= 1e-6,
      s"att ${r.getAs[Double]("att_matched")} vs $att")
  }

  test("q_hdr_quantiles brackets the true order statistics exactly") {
    import spark.implicits._
    import graft.streaming.HdrSketchStream.{bucketOf, rankOf}
    val cents = Tables(spark, sf, "lineitem")
      .select((col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")).as[Long].collect().sorted
    val n = cents.length.toLong
    val rows = SparkEntry.queries("q_hdr_quantiles")(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val p = r.getAs[Long]("p").toInt
      val rank = rankOf(p, n)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("rank_r") == rank, s"rank at p$p")
      // the true rank-r order statistic, from a full in-memory sort
      val exact = cents((rank - 1).toInt)
      assert(r.getAs[Long]("exact_cents") == exact, s"exact at p$p")
      // the sketch bucket brackets it, and the bucket is bucketOf's
      val (idx, lb, ub) = bucketOf(exact)
      assert(r.getAs[Long]("bucket_idx") == idx, s"bucket at p$p")
      assert(r.getAs[Long]("bucket_lb") == lb
        && r.getAs[Long]("bucket_ub") == ub, s"bounds at p$p")
      assert(r.getAs[Long]("in_bucket") == 1L)
      assert((ub - lb).toDouble / lb <= 1.0 / 64, s"rel-err bound at p$p")
      assert(r.getAs[Long]("merge_equal_buckets")
        == r.getAs[Long]("buckets_used"), "merge theorem")
    }
  }

  test("q_zorder_layout matches a from-scratch layout simulation") {
    import spark.implicits._
    val rows0 = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .as[(Long, Long, Long)].collect()
    def spread(x: Long): Long = {
      var s = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      s = (s | (s << 8)) & 0x00FF00FF00FF00FFL
      s = (s | (s << 4)) & 0x0F0F0F0F0F0F0F0FL
      s = (s | (s << 2)) & 0x3333333333333333L
      (s | (s << 1)) & 0x5555555555555555L
    }
    val (mPk, mSk) = (rows0.map(_._2).max, rows0.map(_._3).max)
    val (nPk, nSk) = (rows0.map(_._2).min, rows0.map(_._3).min)
    // min-max-scaled 16-bit coordinates (the 100x key-width fix)
    val zs = rows0.map { case (_, pk, sk) =>
      spread((pk - nPk) * 65535 / (mPk - nPk)) |
        (spread((sk - nSk) * 65535 / (mSk - nSk)) << 1)
    }
    val (zmin, zmax) = (zs.min, zs.max)
    val maxOk = rows0.map(_._1).max
    val (maxPk, maxSk) = (rows0.map(_._2).max, rows0.map(_._3).max)
    val (pkLo, pkHi) = (maxPk / 4, maxPk / 4 + maxPk / 8)
    val (skLo, skHi) = (maxSk / 4, maxSk / 4 + maxSk / 8)
    def scanned(assign: Int => Long): (Long, Long, Long, Long) = {
      val byFile = rows0.indices.groupBy(assign)
      val stats = byFile.values.map { is =>
        (is.map(rows0(_)._2).min, is.map(rows0(_)._2).max,
          is.map(rows0(_)._3).min, is.map(rows0(_)._3).max)
      }
      (byFile.size.toLong,
        stats.count(s => s._1 <= pkHi && s._2 >= pkLo).toLong,
        stats.count(s => s._3 <= skHi && s._4 >= skLo).toLong,
        stats.count(s => s._1 <= pkHi && s._2 >= pkLo
          && s._3 <= skHi && s._4 >= skLo).toLong)
    }
    val lin = scanned(i => (rows0(i)._1 - 1) / ((maxOk - 1) / 64 + 1))
    val zor = scanned(i => (zs(i) - zmin) / ((zmax - zmin) / 64 + 1))
    val got = SparkEntry.queries("q_zorder_layout")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got("linear") == lin, s"linear ${got("linear")} vs $lin")
    assert(got("zorder") == zor, s"zorder ${got("zorder")} vs $zor")
    // the point of the op: the z layout prunes where linear can't
    assert(zor._4 < lin._4, "z-order must scan fewer files for the box")
  }

  /** Shared from-scratch day series (d -> (revenue, order count)),
    * revenue at the queries' DECIMAL(15,4) quantization. */
  private def daySeries(): Seq[(Long, Double, Long)] = {
    import spark.implicits._
    Tables(spark, sf, "orders")
      .select(datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
        .cast("long"), col("o_totalprice"))
      .as[(Long, Double)].collect()
      .groupBy(_._1).toSeq.map { case (d, rows) =>
        val rev = rows.map(r => BigDecimal(r._2).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        (d, rev.toDouble, rows.size.toLong)
      }.sortBy(_._1)
  }

  test("q_granger_causality matches a from-scratch lag-1 OLS F-test") {
    val s = daySeries()
    // observed-day lag pairs: (y, own lag x1, cross lag x2)
    def fstat(ys: Seq[Double], x1s: Seq[Double], x2s: Seq[Double])
        : (Double, Double) = {
      val n = ys.size.toDouble
      def dot(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).map { case (u, v) => u * v }.sum
      val (s1, s2, sy) = (x1s.sum, x2s.sum, ys.sum)
      val a11 = n * dot(x1s, x1s) - s1 * s1
      val a12 = n * dot(x1s, x2s) - s1 * s2
      val a22 = n * dot(x2s, x2s) - s2 * s2
      val b1 = n * dot(x1s, ys) - s1 * sy
      val b2 = n * dot(x2s, ys) - s2 * sy
      val syc = n * dot(ys, ys) - sy * sy
      val det = a11 * a22 - a12 * a12
      val (beta1, beta2) = ((b1 * a22 - b2 * a12) / det,
        (a11 * b2 - a12 * b1) / det)
      val nrssU = syc - beta1 * b1 - beta2 * b2
      val nrssR = syc - b1 * b1 / a11
      ((nrssR - nrssU) / (nrssU / (n - 3)), beta2)
    }
    val rev = s.map(_._2); val cnt = s.map(_._3.toDouble)
    val (fOR, _) = fstat(rev.tail, rev.init, cnt.init)
    val (fRO, _) = fstat(cnt.tail, cnt.init, rev.init)
    val got = SparkEntry.queries("q_granger_causality")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("f_stat")).toMap
    assert(math.abs(got("orders_to_revenue") - fOR) <= 1e-4,
      s"${got("orders_to_revenue")} vs $fOR")
    assert(math.abs(got("revenue_to_orders") - fRO) <= 1e-4,
      s"${got("revenue_to_orders")} vs $fRO")
  }

  test("q_friedman_test matches a from-scratch blocked rank fold") {
    val s = daySeries()
    val byWeek = s.groupBy(_._1 / 7).filter(_._2.size == 7)
    val b = byWeek.size
    // midranks within each complete week
    val rankSums = scala.collection.mutable.Map.empty[Long, Double]
    byWeek.values.foreach { wk =>
      val sorted = wk.map(_._2).sorted
      wk.foreach { case (d, rev, _) =>
        val lo = sorted.indexWhere(_ == rev) + 1
        val hi = sorted.lastIndexWhere(_ == rev) + 1
        val mid = (lo + hi) / 2.0
        rankSums(d % 7) = rankSums.getOrElse(d % 7, 0.0) + mid
      }
    }
    val k = 7
    val chi2 = 12.0 / (b * k * (k + 1)) *
      rankSums.values.map(r => r * r).sum - 3.0 * b * (k + 1)
    val r = SparkEntry.queries("q_friedman_test")(spark, sf).collect()(0)
    assert(r.getAs[Long]("b_blocks") == b.toLong)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) <= 1e-4,
      s"${r.getAs[Double]("chi2")} vs $chi2")
    assert(math.abs(r.getAs[Double]("kendall_w")
      - chi2 / (b * (k - 1))) <= 1e-4)
  }

  test("q_levene_test matches a from-scratch Brown-Forsythe fold") {
    import spark.implicits._
    val qs = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .as[(String, Long)].collect()
    val groups = qs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val zs = groups.map { case (rf, v) =>
      val sorted = v.sorted
      val med2 = sorted((v.length - 1) / 2) + sorted(v.length / 2)
      rf -> v.map(q => math.abs(2 * q - med2).toDouble)
    }
    val k = zs.size; val n = zs.values.map(_.length).sum
    val grand = zs.values.flatten.sum / n
    val ssb = zs.values.map { z =>
      val m = z.sum / z.length; z.length * (m - grand) * (m - grand)
    }.sum
    val ssw = zs.values.map { z =>
      val m = z.sum / z.length; z.map(x => (x - m) * (x - m)).sum
    }.sum
    val w = (ssb / (k - 1)) / (ssw / (n - k))
    val r = SparkEntry.queries("q_levene_test")(spark, sf).collect()(0)
    assert(math.abs(r.getAs[Double]("w_stat") - w) <= 1e-4,
      s"${r.getAs[Double]("w_stat")} vs $w")
    assert(r.getAs[Long]("df2") == (n - k).toLong)
  }

  test("q_wilson_interval matches the closed form and its guarantees") {
    val rows = SparkEntry.queries("q_wilson_interval")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getAs[Long]("n").toDouble, r.getAs[Long]("s").toDouble)
      val (ph, z) = (s / n, 1.96)
      val center = (ph + z * z / (2 * n)) / (1 + z * z / n)
      val hw = z / (1 + z * z / n) *
        math.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n))
      assert(math.abs(r.getAs[Double]("wilson_lo") - (center - hw)) <= 1e-5)
      assert(math.abs(r.getAs[Double]("wilson_hi") - (center + hw)) <= 1e-5)
      // structural guarantees: the interval brackets the rate, and the
      // Wilson center is pulled toward 1/2 relative to the Wald center
      assert(r.getAs[Double]("wilson_lo") < ph && ph < r.getAs[Double]("wilson_hi"))
      assert((center - ph) * (0.5 - ph) >= 0, "center shifts toward 1/2")
    }
  }

  test("q_forecast_backtest matches a from-scratch rolling-origin fold") {
    val rev = daySeries().map(_._2)
    // one-step errors from day 8 (all three models defined)
    val idx = 7 until rev.size
    val eN = idx.map(i => rev(i) - rev(i - 1))
    val eS = idx.map(i => rev(i) - rev(i - 7))
    val eM = idx.map(i => rev(i) - rev.slice(i - 7, i).sum / 7)
    def mae(e: Seq[Double]) = e.map(math.abs).sum / e.size
    def rmse(e: Seq[Double]) = math.sqrt(e.map(x => x * x).sum / e.size)
    val got = SparkEntry.queries("q_forecast_backtest")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getAs[Double]("mae"),
        r.getAs[Double]("rmse"), r.getAs[Double]("mase")))).toMap
    val exp = Map("naive" -> eN, "snaive7" -> eS, "rollmean7" -> eM)
    for ((m, e) <- exp) {
      val (n, gmae, grmse, gmase) = got(m)
      assert(n == e.size.toLong, s"$m n")
      assert(math.abs(gmae - mae(e)) <= 1e-3, s"$m mae $gmae vs ${mae(e)}")
      assert(math.abs(grmse - rmse(e)) <= 1e-3, s"$m rmse")
      assert(math.abs(gmase - mae(e) / mae(eN)) <= 1e-6, s"$m mase")
    }
    // one-step evals only use the PAST: MASE of naive is exactly 1
    assert(got("naive")._4 == 1.0)
  }

  /** Shared from-scratch arm split: (event_type, arm, cents). */
  private def armCents(): Map[(String, Int), Seq[Long]] = {
    import spark.implicits._
    Tables(spark, sf, "events")
      .select(col("event_type"),
        (get_json_object(col("props"), "$.k").cast("int") % 2),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Int, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).toSeq).toMap
  }

  test("q_effect_sizes matches brute-force pairwise and moment folds") {
    val arms = armCents()
    val rows = SparkEntry.queries("q_effect_sizes")(spark, sf).collect()
    rows.foreach { r =>
      val ty = r.getString(0)
      val (a, b) = (arms((ty, 0)), arms((ty, 1)))
      // Cliff/CLES via literal pairwise comparison (U counts ties half)
      val ux2 = a.iterator.map(x =>
        2L * b.count(_ < x) + b.count(_ == x)).sum
      assert(r.getAs[Long]("u_a_x2") == ux2, s"$ty U")
      val cles = ux2.toDouble / (2.0 * a.size * b.size)
      assert(math.abs(r.getAs[Double]("cles") - cles) <= 1e-6, s"$ty cles")
      assert(math.abs(r.getAs[Double]("cliff_delta") - (2 * cles - 1)) <= 1e-6)
      def mv(x: Seq[Long]) = {
        val m = x.sum.toDouble / x.size
        (m, x.map(v => (v - m) * (v - m)).sum / (x.size - 1))
      }
      val ((ma, va), (mb, vb)) = (mv(a), mv(b))
      val sp = math.sqrt(((a.size - 1) * va + (b.size - 1) * vb)
        / (a.size + b.size - 2.0))
      assert(math.abs(r.getAs[Double]("cohen_d") - (ma - mb) / sp) <= 1e-5,
        s"$ty d")
      assert(math.abs(r.getAs[Double]("glass_delta")
        - (ma - mb) / math.sqrt(vb)) <= 1e-5, s"$ty glass")
    }
  }

  test("q_yuen_ttest matches a from-scratch trim/winsorize fold") {
    val arms = armCents()
    def yuenArm(x: Seq[Long]): (Long, Double, Double) = {
      val s = x.sorted; val n = s.size; val g = n / 5; val h = n - 2 * g
      val tm = s.slice(g, n - g).sum.toDouble / h
      val (vlo, vhi) = (s(g), s(n - g - 1))
      val w = s.map(v => math.min(math.max(v, vlo), vhi))
      val m = w.sum.toDouble / n
      val vw = w.map(v => (v - m) * (v - m)).sum / (n - 1.0)
      (h.toLong, tm, (n - 1) * vw / (h.toDouble * (h - 1)))
    }
    SparkEntry.queries("q_yuen_ttest")(spark, sf).collect().foreach { r =>
      val ty = r.getString(0)
      val (ha, tma, d0) = yuenArm(arms((ty, 0)))
      val (hb, tmb, d1) = yuenArm(arms((ty, 1)))
      assert(r.getAs[Long]("h_a") == ha && r.getAs[Long]("h_b") == hb, s"$ty h")
      assert(math.abs(r.getAs[Double]("trimmed_mean_a") - tma / 100) <= 1e-5)
      assert(math.abs(r.getAs[Double]("trimmed_mean_b") - tmb / 100) <= 1e-5)
      assert(math.abs(r.getAs[Double]("t_yuen")
        - (tma - tmb) / math.sqrt(d0 + d1)) <= 1e-5, s"$ty t")
    }
  }

  test("q_wasserstein_1d matches a from-scratch CDF-gap walk") {
    val arms = armCents()
    SparkEntry.queries("q_wasserstein_1d")(spark, sf).collect().foreach { r =>
      val ty = r.getString(0)
      val (a, b) = (arms((ty, 0)), arms((ty, 1)))
      val support = (a ++ b).distinct.sorted
      var (m0, m1, w1s, kss) = (0L, 0L, 0L, 0L)
      support.zipWithIndex.foreach { case (v, i) =>
        m0 += a.count(_ == v); m1 += b.count(_ == v)
        val ad = math.abs(m0 * b.size - m1 * a.size)
        kss = math.max(kss, ad)
        if (i + 1 < support.size) w1s += ad * (support(i + 1) - v)
      }
      assert(r.getAs[Long]("w1_scaled") == w1s, s"$ty w1 scaled")
      assert(r.getAs[Long]("ks_scaled") == kss, s"$ty ks scaled")
      // sanity: both metrics positive — the two arms genuinely differ
      assert(w1s > 0 && kss > 0)
    }
  }

  test("q_cvm_twosample matches a from-scratch CDF walk") {
    val arms = armCents()
    SparkEntry.queries("q_cvm_twosample")(spark, sf).collect().foreach { r =>
      val ty = r.getString(0)
      val (a, b) = (arms((ty, 0)), arms((ty, 1)))
      val support = (a ++ b).distinct.sorted
      var (m0, m1) = (0L, 0L)
      var s = BigInt(0)
      support.foreach { v =>
        val (c0, c1) = (a.count(_ == v).toLong, b.count(_ == v).toLong)
        m0 += c0; m1 += c1
        val dd = BigInt(m0 * b.size - m1 * a.size)
        s += BigInt(c0 + c1) * dd * dd
      }
      val n = (a.size + b.size).toDouble
      val t = s.toDouble / a.size / b.size / (n * n)
      assert(math.abs(r.getAs[Double]("cvm_t") - t) <= 1e-5,
        s"$ty cvm ${r.getAs[Double]("cvm_t")} vs $t")
    }
  }

  test("q_graph_assortativity matches a from-scratch Pearson over edges") {
    import spark.implicits._
    val baskets = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val pairs = baskets.flatMap(ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j)))
      .toSet // distinct undirected pairs, the basketPairCounts contract
    val ed = pairs.toSeq.flatMap { case (p, q) => Seq((p, q), (q, p)) }
    val deg = ed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (xs, ys) = ed.map { case (p, q) => (deg(p), deg(q)) }.unzip
    val mEdges = ed.size.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
    val sxx = xs.map(x => x * x).sum.toDouble
    val syy = ys.map(y => y * y).sum.toDouble
    val want = (mEdges * sxy - sx * sy) /
      math.sqrt((mEdges * sxx - sx * sx) * (mEdges * syy - sy * sy))
    val r = SparkEntry.queries("q_graph_assortativity")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_directed_edges") == ed.size.toLong)
    assert(r.getAs[Long]("degree_sum") == xs.sum)
    assert(math.abs(r.getAs[Double]("assortativity") - want) <= 1e-5,
      s"${r.getAs[Double]("assortativity")} vs $want")
    assert(r.getAs[Long]("sym_ok") == 1L)
  }

  test("q_semdedup clusters agree with q_kmeans_lloyd and drop consistently") {
    val km = SparkEntry.queries("q_kmeans_lloyd")(spark, sf).collect()
      .map(r => r.getAs[Int]("cluster") -> r.getAs[Long]("n_vecs")).toMap
    val sd = SparkEntry.queries("q_semdedup")(spark, sf).collect()
    // identical deterministic Lloyd assignment → identical populations
    assert(sd.map(r => r.getAs[Int]("cluster") -> r.getAs[Long]("n_vecs"))
      .toMap == km, "cluster populations must match q_kmeans_lloyd")
    sd.foreach { r =>
      val (n, d, k) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("n_kept"))
      assert(d + k == n, "kept + dropped = cluster size")
      assert(k >= 1, "the min-id vector of a cluster is always kept")
      assert(math.abs(r.getAs[Double]("drop_rate") - d.toDouble / n) <= 1e-6)
    }
    // the op does real work on this corpus: some cluster drops vectors
    assert(sd.map(_.getAs[Long]("n_dropped")).sum > 0)
  }

  test("q_event_study matches a from-scratch per-period fold") {
    import spark.implicits._
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit.DAYS
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string"), col("value"))
      .as[(Long, String, Double)].collect()
    val dates = ev.map(_._2)
    val mn = LocalDate.parse(dates.min)
    val half = math.floor(
      (DAYS.between(mn, LocalDate.parse(dates.max)) + 1) / 2.0).toLong
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val byP = ev.groupBy { case (_, dt, _) =>
      math.floor((DAYS.between(mn, LocalDate.parse(dt)) - half) / 7.0).toLong
    }
    val diffs = byP.map { case (rw, rows) =>
      val (tr, ct) = rows.partition(_._1 % 2 == 1)
      rw -> (tr.map(r => q6(r._3)).sum.toDouble / tr.size
        - ct.map(r => q6(r._3)).sum.toDouble / ct.size)
    }
    val got = SparkEntry.queries("q_event_study")(spark, sf).collect()
    assert(got.map(_.getAs[Long]("rel_week")).toSet == diffs.keySet)
    got.foreach { r =>
      val rw = r.getAs[Long]("rel_week")
      assert(math.abs(r.getAs[Double]("diff") - diffs(rw)) <= 1e-5, s"rw $rw")
      assert(math.abs(r.getAs[Double]("beta")
        - (diffs(rw) - diffs(-1L))) <= 1e-5, s"beta $rw")
    }
    // the reference period's beta is zero by construction
    assert(got.find(_.getAs[Long]("rel_week") == -1L)
      .get.getAs[Double]("beta") == 0.0)
  }

  test("q_tail_dependence matches a from-scratch exceedance count") {
    import spark.implicits._
    import graft.streaming.HdrSketchStream.{bucketOf, rankOf}
    val rows = Tables(spark, sf, "lineitem")
      .select(col("l_quantity").cast("long"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
      .as[(Long, Long)].collect()
    val n = rows.length.toLong
    val (xs, ys) = (rows.map(_._1).sorted, rows.map(_._2).sorted)
    SparkEntry.queries("q_tail_dependence")(spark, sf).collect().foreach { r =>
      val p = r.getAs[Long]("q_pct").toInt
      val rank = rankOf(p, n)
      val xq = xs((rank - 1).toInt)
      // Y threshold = the HDR bucket LOWER BOUND at the same rank
      val yq = bucketOf(ys((rank - 1).toInt))._2
      assert(r.getAs[Long]("x_threshold") == xq, s"p$p xq")
      assert(r.getAs[Long]("y_threshold_lb") == yq, s"p$p yq")
      val nx = rows.count(_._1 > xq).toLong
      val ny = rows.count(_._2 > yq).toLong
      val nj = rows.count(t => t._1 > xq && t._2 > yq).toLong
      assert(r.getAs[Long]("n_x_exc") == nx && r.getAs[Long]("n_y_exc") == ny
        && r.getAs[Long]("n_joint") == nj, s"p$p counts")
      assert(math.abs(r.getAs[Double]("lambda_u") - nj.toDouble / nx) <= 1e-6)
    }
  }

  test("q_croston matches a from-scratch dual-EWMA fold") {
    import spark.implicits._
    val rows = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), to_date(col("l_shipdate")).cast("string"),
        col("l_quantity").cast("long"))
      .as[(Long, String, Long)].collect()
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit.DAYS
    val d0 = LocalDate.parse(rows.map(_._2).min)
    val byPart = rows.groupBy(_._1).view.mapValues(g =>
      g.groupBy(r => DAYS.between(d0, LocalDate.parse(r._2)) + 1)
        .map { case (off, rs) => (off, rs.map(_._3).sum.toDouble) }
        .toSeq.sortBy(_._1)).toMap
    val got = SparkEntry.queries("q_croston")(spark, sf).collect()
      .map(r => r.getAs[Long]("part") ->
        ((r.getAs[Long]("n_occ"), r.getAs[Double]("size_z"),
          r.getAs[Double]("interval_p"), r.getAs[Double]("fc_croston"))))
      .toMap
    assert(got.keySet == byPart.keySet)
    byPart.foreach { case (part, occ) =>
      var z = occ.head._2
      var p = occ.head._1.toDouble
      var prev = occ.head._1
      occ.tail.foreach { case (off, q) =>
        z = 0.2 * q + 0.8 * z
        p = 0.2 * (off - prev).toDouble + 0.8 * p
        prev = off
      }
      val (n, gz, gp, gfc) = got(part)
      assert(n == occ.size.toLong, s"part $part n_occ")
      assert(math.abs(gz - z) <= 1e-5, s"part $part z $gz vs $z")
      assert(math.abs(gp - p) <= 1e-5, s"part $part p")
      assert(math.abs(gfc - z / p) <= 1e-5, s"part $part fc")
    }
  }

  test("q_pps_sampling matches a from-scratch systematic PPS walk") {
    import spark.implicits._
    val parts = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).toSeq.map { case (p, g) =>
        (p, g.map(_._2).sum, g.map(_._3).sum)
      }.sortBy(_._1)
    val tRev = parts.map(_._2).sum
    var cum = 0L
    var (nSel, totHits, htU6) = (0L, 0L, 0L)
    parts.foreach { case (_, rev, qty) =>
      val before = cum * 100 / tRev
      cum += rev
      val hits = cum * 100 / tRev - before
      if (hits > 0) {
        nSel += 1; totHits += hits
        // HALF_UP to match both engines' round() (math.rint is
        // half-to-even and would fail on an exact .5 µ-unit tie)
        htU6 += BigDecimal(
          hits * qty.toDouble * tRev / (100.0 * rev) * 1000000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
    val r = SparkEntry.queries("q_pps_sampling")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_selected") == nSel)
    assert(r.getAs[Long]("total_hits") == totHits
      && totHits == 100L && r.getAs[Long]("ht_rev_exact") == 1L)
    assert(r.getAs[Long]("ht_qty_u6") == htU6,
      s"${r.getAs[Long]("ht_qty_u6")} vs $htU6")
    // HT on one systematic draw should land near the truth
    assert(math.abs(r.getAs[Double]("ht_ratio") - 1.0) <= 0.15)
  }

  test("q_capture_recapture matches a from-scratch two-window count") {
    import spark.implicits._
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit.DAYS
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        to_date(col("ts")).cast("string"))
      .as[(Long, String, String)].collect()
    val mn = LocalDate.parse(ev.map(_._3).min)
    def off(d: String) = DAYS.between(mn, LocalDate.parse(d))
    val c1 = ev.filter(e => e._2 == "click" && off(e._3) < 3).map(_._1).toSet
    val c2 = ev.filter(e => e._2 == "click" && off(e._3) >= 27).map(_._1).toSet
    val both = (c1 & c2).size
    val r = SparkEntry.queries("q_capture_recapture")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n1") == c1.size.toLong)
    assert(r.getAs[Long]("n2") == c2.size.toLong)
    assert(r.getAs[Long]("m_both") == both.toLong)
    assert(r.getAs[Long]("true_n") == ev.map(_._1).distinct.length.toLong)
    val chapman = (c1.size + 1.0) * (c2.size + 1) / (both + 1) - 1
    assert(math.abs(r.getAs[Double]("chapman") - chapman) <= 0.01)
    // the estimator must be non-degenerate AND near the truth here
    assert(both < c1.size && both < c2.size)
    assert(math.abs(r.getAs[Double]("chapman_rel_err")) <= 0.10)
  }

  test("q_chao1_richness matches a from-scratch bigram spectrum") {
    import spark.implicits._
    val bigrams = Tables(spark, sf, "documents")
      .select(col("text")).as[String].collect()
      .flatMap(t => t.split(" ", -1).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")))
    val spec = bigrams.groupBy(identity).view.mapValues(_.length).toMap
    val (d, f1, f2) = (spec.size.toLong,
      spec.count(_._2 == 1).toLong, spec.count(_._2 == 2).toLong)
    val r = SparkEntry.queries("q_chao1_richness")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_tokens") == bigrams.length.toLong)
    assert(r.getAs[Long]("d_distinct") == d)
    assert(r.getAs[Long]("f1") == f1 && r.getAs[Long]("f2") == f2)
    val chao1 = d + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1))
    assert(math.abs(r.getAs[Double]("chao1") - chao1) <= 0.01)
    // the bigram space is genuinely open: the estimator adds mass
    assert(f1 > 0 && r.getAs[Double]("chao1") > d)
  }

  test("q_vif matches a from-scratch correlation computation") {
    import spark.implicits._
    val rows = Tables(spark, sf, "lineitem")
      .select(col("l_quantity"), col("l_discount"), col("l_tax"))
      .as[(Double, Double, Double)].collect()
    def q4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val (x1, x2, x3) = (rows.map(r => q4(r._1)), rows.map(r => q4(r._2)),
      rows.map(r => q4(r._3)))
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val (sa, sb) = (a.sum, b.sum)
      (n * a.zip(b).map { case (u, v) => u * v }.sum - sa * sb) /
        math.sqrt((n * a.map(u => u * u).sum - sa * sa)
          * (n * b.map(v => v * v).sum - sb * sb))
    }
    val (r12, r13, r23) = (corr(x1, x2), corr(x1, x3), corr(x2, x3))
    val vif1 = 1 / (1 - (r12 * r12 + r13 * r13 - 2 * r12 * r13 * r23)
      / (1 - r23 * r23))
    val r = SparkEntry.queries("q_vif")(spark, sf).collect()(0)
    assert(math.abs(r.getAs[Double]("r12") - r12) <= 1e-5)
    assert(math.abs(r.getAs[Double]("vif_quantity") - vif1) <= 1e-5)
    // the TPC-H numerics are independent: every VIF sits at ~1
    Seq("vif_quantity", "vif_discount", "vif_tax").foreach { c =>
      assert(math.abs(r.getAs[Double](c) - 1.0) <= 0.01, s"$c inflated")
    }
  }

  /** Shared from-scratch daily OLS: (days, residuals) in day order. */
  private def dailyResiduals(): (Seq[Long], Seq[Double]) = {
    val s = daySeries()
    val (ds, ys) = (s.map(_._1.toDouble), s.map(_._2))
    val n = ds.size.toDouble
    val (sx, sy) = (ds.sum, ys.sum)
    val sxy = ds.zip(ys).map { case (d, y) => y * d }.sum
    val sxx = ds.map(d => d * d).sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    (s.map(_._1), ds.zip(ys).map { case (d, y) => y - (a + b * d) })
  }

  test("q_cooks_distance matches a from-scratch influence fold") {
    val (days, es) = dailyResiduals()
    val s = daySeries()
    val n = days.size.toDouble
    val sx = days.map(_.toDouble).sum
    val sxx = days.map(d => d.toDouble * d).sum
    val sse = es.map(e => math.rint(e * e)).sum
    val s2 = sse / (n - 2)
    val dsByD = days.zip(es).map { case (d, e) =>
      val h = 1.0 / n + (d - sx / n) * (d - sx / n) / (sxx - sx * sx / n)
      (d, e, h, e * e * h / (2.0 * s2 * (1 - h) * (1 - h)))
    }
    val top = dsByD.sortBy(t => (-t._4, t._1)).take(10)
    val got = SparkEntry.queries("q_cooks_distance")(spark, sf).collect()
    assert(got.length == 10)
    got.zip(top).foreach { case (r, (d, e, h, cd)) =>
      assert(r.getAs[Long]("day_num") == d, s"day order")
      assert(math.abs(r.getAs[Double]("residual") - e) <= 1e-3)
      assert(math.abs(r.getAs[Double]("leverage") - h) <= 1e-6)
      assert(math.abs(r.getAs[Double]("cooks_d") - cd) <= 1e-5)
    }
    assert(s.nonEmpty)
  }

  test("q_durbin_watson matches a from-scratch residual walk") {
    val (_, es) = dailyResiduals()
    val sse = es.map(e => math.rint(e * e)).sum
    val sdiff = es.sliding(2).collect { case Seq(a, b) =>
      math.rint((b - a) * (b - a)) }.sum
    val dw = sdiff / sse
    val r = SparkEntry.queries("q_durbin_watson")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_days") == es.size.toLong)
    assert(math.abs(r.getAs[Double]("dw") - dw) <= 1e-5,
      s"${r.getAs[Double]("dw")} vs $dw")
    assert(math.abs(r.getAs[Double]("rho_approx") - (1 - dw / 2)) <= 1e-5)
    // the synthetic day series has independent residuals: DW near 2
    assert(math.abs(r.getAs[Double]("dw") - 2.0) <= 0.3)
  }

  test("q_abc_xyz matches a from-scratch classification fold") {
    import spark.implicits._
    val rows = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM"),
        col("l_quantity").cast("long"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
      .as[(Long, String, Long, Long)].collect()
    val mTotal = rows.map(_._2).distinct.length
    val parts = rows.groupBy(_._1).toSeq.map { case (pk, g) =>
      val monthly = g.groupBy(_._2).values.map(_.map(_._3).sum).toSeq
      val sq = monthly.sum.toDouble
      val sqq = monthly.map(q => q.toDouble * q).sum
      val cv = math.sqrt((sqq - sq * sq / mTotal) / (mTotal - 1)) /
        (sq / mTotal)
      (pk, g.map(_._4).sum, cv)
    }
    val tot = parts.map(_._2).sum
    val byRev = parts.sortBy(p => (-p._2, p._1))
    val abc = byRev.zip(byRev.scanLeft(0L)(_ + _._2).tail).map {
      case ((pk, rev, _), cum) =>
        pk -> (if (cum.toDouble / tot <= 0.70) "A"
               else if (cum.toDouble / tot <= 0.90) "B" else "C")
    }.toMap
    val byCv = parts.sortBy(p => (p._3, p._1)).map(_._1)
    val n = byCv.size
    val xyz = byCv.zipWithIndex.map { case (pk, i) =>
      // ntile(3) semantics: first ceil buckets get the extra rows
      val bucket = i * 3 / n + 1
      pk -> (if (bucket == 1) "X" else if (bucket == 2) "Y" else "Z")
    }.toMap
    val want = parts.groupBy(p => (abc(p._1), xyz(p._1)))
      .view.mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val got = SparkEntry.queries("q_abc_xyz")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_parts"), r.getAs[Long]("revenue_cents")))).toMap
    assert(got == want, s"matrix $got vs $want")
    // all nine cells populated — the tercile banding is non-degenerate
    assert(got.size == 9)
  }

  test("q_term_burstiness matches a from-scratch dispersion fold") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val nDocs = docs.length
    val counts = docs.flatMap { case (d, t) =>
      t.split(" ", -1).map(w => (d, w)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byTerm = counts.groupBy(_._1._2).view.mapValues(_.values.toSeq)
    val got = SparkEntry.queries("q_term_burstiness")(spark, sf).collect()
    assert(got.length == 20)
    got.foreach { r =>
      val cs = byTerm(r.getString(0))
      val occ = cs.sum
      assert(r.getAs[Long]("n_occurrences") == occ)
      assert(r.getAs[Long]("n_docs") == cs.size.toLong)
      val mu = occ.toDouble / nDocs
      val varAll = (cs.map(c => c.toDouble * c).sum
        - occ.toDouble * occ / nDocs) / (nDocs - 1)
      assert(math.abs(r.getAs[Double]("dispersion") - varAll / mu) <= 1e-5)
      // content terms repeat within documents: dispersion above Poisson
      assert(r.getAs[Double]("dispersion") > 1.0)
    }
  }

  test("q_rec_coverage is consistent with q_item_cf's own lists") {
    val rec = SparkEntry.queries("q_item_cf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Double]("cosine")))
    val r = SparkEntry.queries("q_rec_coverage")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_lists") == rec.map(_._1).distinct.length.toLong)
    assert(r.getAs[Long]("n_recommended")
      == rec.map(_._2).distinct.length.toLong)
    val topShare = rec.groupBy(_._2).values.map(_.size).max.toDouble /
      rec.map(_._1).distinct.length
    assert(math.abs(r.getAs[Double]("top_share") - topShare) <= 1e-6)
    assert(math.abs(r.getAs[Double]("coverage")
      - r.getAs[Long]("n_recommended").toDouble
        / r.getAs[Long]("n_catalog")) <= 1e-6)
    // ILS: intra-list pairs scored by the SAME cosine table (q_item_cf
    // rows give each list's member cosines to src, not member-member —
    // recompute member-member from the lists via the rec rows' sims
    // being symmetric entries of one sc frame is not derivable here,
    // so pin the pair count and the [0, 1] range instead)
    val nPairs = rec.groupBy(_._1).values
      .map(g => g.size * (g.size - 1) / 2).sum.toLong
    assert(r.getAs[Long]("n_intra_pairs") == nPairs)
    val ils = r.getAs[Double]("intra_list_sim")
    assert(ils >= 0.0 && ils <= 1.0)
  }

  test("q_matrix_profile matches a from-scratch all-pairs profile") {
    val s0 = daySeries()
    val (days, xs) = (s0.map(_._1), s0.map(_._2))
    val n = xs.size
    val w = 7
    val m = n - w + 1
    val mus = (0 until m).map(i => xs.slice(i, i + w).sum / w)
    val sgs = (0 until m).map { i =>
      val win = xs.slice(i, i + w)
      math.sqrt(win.map(x => x * x).sum / w - mus(i) * mus(i))
    }
    def d2(i: Int, j: Int): Double = {
      val q = (0 until w).map(k => xs(i + k) * xs(j + k)).sum
      val raw = 14 * (1 - (q - 7 * mus(i) * mus(j)) / (7 * sgs(i) * sgs(j)))
      math.rint(math.max(raw, 0) * 1e6) / 1e6
    }
    val pairs = for (i <- 0 until m; j <- (i + w) until m) yield (i, j, d2(i, j))
    val motif = pairs.minBy(p => (p._3, p._1, p._2))
    val nnOf = Array.fill(m)(Double.MaxValue)
    pairs.foreach { case (i, j, d) =>
      nnOf(i) = math.min(nnOf(i), d); nnOf(j) = math.min(nnOf(j), d)
    }
    val discord = (0 until m).maxBy(i => (nnOf(i), -i))
    val got = SparkEntry.queries("q_matrix_profile")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("day_i"), r.getAs[Long]("day_j"),
          r.getAs[Double]("z_dist")))).toMap
    val (mi, mj, md) = got(("motif", 1L))
    assert(mi == days(motif._1) && mj == days(motif._2),
      s"motif ($mi,$mj) vs (${days(motif._1)},${days(motif._2)})")
    assert(math.abs(md - math.sqrt(motif._3)) <= 1e-5)
    val (di, _, dd) = got(("discord", 1L))
    assert(di == days(discord), s"discord $di vs ${days(discord)}")
    assert(math.abs(dd - math.sqrt(nnOf(discord))) <= 1e-5)
    // shape sanity: the top motif is far tighter than the top discord
    assert(md < dd / 2)
  }
}
