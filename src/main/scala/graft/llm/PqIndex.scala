package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The vector-index trainer shared by the ANN queries (`q_knn_ivf`,
  * `q_knn_pq`) and their recall specs — the [[MinhashPipeline]]
  * pattern applied to the vector index: one reusable fit so every
  * consumer trains identically.
  *
  * Training runs a seeded Lloyd's k-means ON THE DRIVER over a
  * BOUNDED hash-ordered sample (`ORDER BY xxhash64(vec_id) LIMIT n`
  * plans as TakeOrderedAndProject: one corpus scan with a k-row heap
  * per partition — no full sort, no full-corpus collect). This is the
  * deliberate, documented exception to the no-driver-loops rule:
  * k-means needs a REPRESENTATIVE sample, not the corpus (FAISS
  * trains PQ on 10k–1M vectors regardless of index size), the sample
  * is hard-capped at [[SampleRows]] rows, and driver-side Lloyd on it
  * costs milliseconds — where the previous MLlib formulation paid
  * ~40 scheduled Spark jobs of fixed overhead per query (measured
  * ~6 s at any sf).
  *
  * ASSIGNMENT stays fully distributed and codegen'd: nearest-centroid
  * is argmin_j (−2·v·c_j + ‖c_j‖²) with each v·c_j a native
  * [[graft.expressions.DotProduct]] against a literal centroid — a
  * pure projection, no MLlib transform, no shuffle.
  */
object PqIndex {

  // Coarse (IVF) stage — shared by q_knn_ivf and q_knn_pq. k ≈ √N at
  // scale; nprobe is recall-calibrated against brute-force ground
  // truth in AccuracySpec (this synthetic corpus is near-random — the
  // hardest recall case — so nprobe = k/2; structured corpora reach
  // the same recall at much smaller nprobe/k).
  val CoarseK = 8 // minimum inverted-list cells
  val NProbe = 4 // minimum cells a query probes
  val CoarseIters = 20
  val CoarseSeed = 7L
  val MaxCells = 64 // local cap: assignment is a k-wide codegen'd argmin

  /** Cell count scales as √(N/8) (FAISS's ~√N guidance) so per-cell
    * size stays ~√(8N) instead of N/k — the bounded-task-size property
    * an inverted index exists for. Round 4's 10× ScaleCheck measured
    * the fixed-k=8 version at 12.4× (each probe scanned 10×-bigger
    * cells). Floor = the sf0.01 recall-calibrated k (AccuracySpec);
    * cap = what a literal-centroid argmin projection comfortably
    * codegens — a cluster deployment raises it with a broadcast
    * centroid-table assign. */
  def cellsFor(n: Long): Int =
    math.min(MaxCells, math.max(CoarseK, math.ceil(math.sqrt(n / 8.0)).toInt))

  /** Probe count: a constant FRACTION of the cells (cells/2), not a
    * constant count. On a near-random corpus recall tracks the probed
    * fraction — r8's audit-frame promotion caught the cells/4 version
    * flipping recall_ok=false at sf0.1 (25 cells, 6 probed = 24% of
    * the corpus → recall ≈ 0.5, vs 4-of-8 = 50% → 0.9 at sf0.01).
    * Candidates per query stay ~N/2 · querySetSize — linear in the
    * corpus with the capped query batch, so the ScaleCheck decades
    * are unaffected. At scale nprobe is a recall-target tunable;
    * clustered real corpora reach the same recall probing far less
    * (that is the whole IVF bet — random data is its worst case). */
  def nprobeFor(cells: Int): Int = math.max(NProbe, cells / 2)

  // PQ stage
  val M = 8 // subspaces
  val SubDim = 8 // dims per subspace (M × SubDim = embedding dim)
  val Codes = 16 // centroids per subspace (4 bits' worth)
  val Shortlist = 50 // minimum ADC shortlist width before the exact rerank

  /** ADC shortlist width scales with the corpus (4%, floored at
    * [[Shortlist]]): with ~N/2 candidates per query after the coarse
    * probe, a FIXED width shrinks as a fraction of the candidate set
    * and ADC quantization noise (large on this near-random corpus)
    * pushes true neighbors outside it — r8's audit promotion measured
    * PQ recall@3 < 0.6 at sf0.1 with the constant 50. Rerank cost is
    * 0.04·N exact cosines per audit query — linear in the corpus with
    * the capped query batch, which is what the ScaleCheck decades
    * require. */
  def shortlistFor(n: Long): Int = math.max(Shortlist, math.ceil(n / 25.0).toInt)
  val SampleRows = 4096 // fit-sample cap (k-means sees at most this)
  val PqIters = 8
  val PqSeed = 100L

  /** Deterministic Lloyd's k-means (k-means++-style greedy seeding by
    * hash order is unnecessary — the sample is already hash-shuffled,
    * so the first k DISTINCT points seed it; distinctness matters on
    * dedup-shaped corpora, where exact-duplicate vectors in the first
    * k sample slots would seed identical centroids that the empty-
    * cell keep-old rule then preserves forever — fewer effective
    * cells than cellsFor(n) promised) over driver-local rows. */
  def lloyd(points: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs a non-empty sample")
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    val order = rnd.shuffle(points.indices.toList)
    val seedPts = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val seenPts = scala.collection.mutable.HashSet.empty[Seq[Double]]
    val it0 = order.iterator
    while (seedPts.length < k && it0.hasNext) {
      val p = points(it0.next())
      if (seenPts.add(p.toSeq)) seedPts += p.clone()
    }
    val cents = seedPts.toArray // < k only if the sample has < k distinct points
    val kk = cents.length
    val assign = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      var p = 0
      while (p < points.length) { // assign
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < kk) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = points(p)(i) - cents(j)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        assign(p) = best
        p += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      p = 0
      while (p < points.length) { // update
        val a = assign(p); counts(a) += 1
        var i = 0
        while (i < dim) { sums(a)(i) += points(p)(i); i += 1 }
        p += 1
      }
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          var i = 0
          while (i < dim) { cents(j)(i) = sums(j)(i) / counts(j); i += 1 }
        } // empty cell: keep the old centroid (deterministic)
        j += 1
      }
      it += 1
    }
    cents
  }

  /** Bounded deterministic training sample of a double-array column. */
  def sample(df: DataFrame, vecCol: String, idCol: String): Array[Array[Double]] =
    df.select(col(vecCol))
      .orderBy(xxhash64(col(idCol)))
      .limit(SampleRows)
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Coarse spherical centroids (train on the normalized vectors). */
  def fitCoarse(df: DataFrame, cells: Int, vnCol: String = "vn", idCol: String = "vec_id")
      : Array[Array[Double]] =
    lloyd(sample(df, vnCol, idCol), cells, CoarseIters, CoarseSeed)

  /** Coarse quantizer AND all M PQ codebooks from ONE sample job:
    * collect the hash-ordered normalized-vector sample once, slice
    * the per-subspace training points driver-side (`sub m` IS
    * `vn[m·SubDim, (m+1)·SubDim)`, so the slices are exactly what a
    * per-column sample would collect — same rows, same hash order).
    * The separate-per-column formulation scheduled 1 + M
    * TakeOrderedAndProject jobs; their fixed overhead was most of
    * q_knn_pq's bench cost. */
  def fitAll(df: DataFrame, cells: Int, vnCol: String = "vn", idCol: String = "vec_id")
      : (Array[Array[Double]], Seq[Array[Array[Double]]]) = {
    val vns = sample(df, vnCol, idCol)
    val coarse = lloyd(vns, cells, CoarseIters, CoarseSeed)
    val books = (0 until M).map { m =>
      val pts = vns.map(v => java.util.Arrays.copyOfRange(v, m * SubDim, (m + 1) * SubDim))
      lloyd(pts, Codes, PqIters, PqSeed + m)
    }
    (coarse, books)
  }

  private def sumSq(c: Array[Double]): Double = { var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s }

  /** Nearest-centroid id as a pure codegen'd projection:
    * argmin_j (−2·v·c_j + ‖c_j‖²), each v·c_j a native DotProduct
    * against the literal centroid. ‖v‖² is constant across j, so it
    * drops out of the argmin. */
  def nearestCentroid(v: Column, cents: Array[Array[Double]]): Column = {
    import graft.expressions.DotProduct
    val dists = cents.map { c =>
      (DotProduct(v, typedLit(c.toSeq)) * -2.0 + lit(sumSq(c)))
    }
    val arr = array(dists: _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  /** (cell/code id, centroid) rows for broadcast-side distance tables. */
  def centroidRows(cents: Array[Array[Double]]): Seq[(Int, Array[Double])] =
    cents.zipWithIndex.map { case (c, j) => (j, c) }.toSeq

  /** The multi-probe step both ANN queries share: rank the k-row
    * broadcast centroid table per query row by squared L2 on the
    * normalized vector (deterministic cell-id tie-break) and keep the
    * top `nprobe`. Returns the query frame's columns + `ccell`, one
    * row per (query, probed cell) — so a probe-rule change lands in
    * one place instead of drifting between q_knn_ivf and q_knn_pq. */
  def probeCells(queries: DataFrame, qidCol: String, qvnCol: String,
      cents: Array[Array[Double]], nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = queries.sparkSession
    import spark.implicits._
    val cdf = centroidRows(cents).toDF("ccell", "cvec")
    val wq = Window.partitionBy(col(qidCol)).orderBy(col("cdist"), col("ccell"))
    queries
      .crossJoin(broadcast(cdf))
      .withColumn("cdist", graft.functions.VectorFunctions.sqL2(col(qvnCol), col("cvec")))
      .withColumn("crn", row_number().over(wq))
      .where(col("crn") <= nprobe)
      .drop("cvec", "cdist", "crn")
  }
}
