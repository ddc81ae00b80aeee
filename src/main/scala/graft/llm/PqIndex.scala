package graft.llm

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The product-quantization codebook trainer shared by the PQ ANN
  * query (`q_knn_pq`) and its recall spec — the [[MinhashPipeline]]
  * pattern applied to the vector index: the fitted artifact is built
  * by one reusable function so every consumer trains it the same way.
  *
  * Scale design (100 TB): k-means codebooks need a REPRESENTATIVE
  * sample, not the corpus — FAISS trains PQ on ~10k–1M vectors
  * regardless of index size. `fitCodebooks` therefore bounds its fit
  * input to [[SampleRows]] rows picked by hash order
  * (`ORDER BY xxhash64(vec_id) LIMIT n` plans as TakeOrderedAndProject:
  * one corpus scan with a k-row heap per partition — no full sort, no
  * full-corpus `coalesce(1)`), so the written query is the scale-safe
  * one verbatim. The M per-subspace fits are independent and run as
  * concurrent Spark jobs over the one cached sample.
  */
object PqIndex {

  // Coarse (IVF) stage — shared by q_knn_ivf and q_knn_pq. k ≈ √N at
  // scale; nprobe is recall-calibrated against brute-force ground
  // truth in AccuracySpec (this synthetic corpus is near-random — the
  // hardest recall case — so nprobe = k/2; structured corpora reach
  // the same recall at much smaller nprobe/k).
  val CoarseK = 8 // inverted-list cells
  val NProbe = 4 // cells a query probes

  // PQ stage
  val M = 8 // subspaces
  val SubDim = 8 // dims per subspace (M × SubDim = embedding dim)
  val Codes = 16 // centroids per subspace (4 bits' worth)
  val Shortlist = 50 // ADC shortlist width before the exact rerank
  val SampleRows = 4096 // fit-sample cap (k-means sees at most this)

  /** Fit the M per-subspace codebooks from a frame carrying
    * `vec_id, sub0..sub{M-1}` columns. Deterministic: hash-ordered
    * sample + fixed seeds. */
  def fitCodebooks(sub: DataFrame): Seq[KMeansModel] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.DurationInt
    val fitInput = sub
      .select(Seq(col("vec_id")) ++ (0 until M).map(m => col(s"sub$m")): _*)
      .orderBy(xxhash64(col("vec_id"))) // deterministic pseudo-random pick
      .limit(SampleRows) // bounded: the single post-limit partition is ≤ SampleRows rows
      .cache()
    val fitted = Await.result(Future.sequence((0 until M).map(m => Future {
      new KMeans().setK(Codes).setSeed(100L + m).setMaxIter(5).setInitMode("random")
        .setFeaturesCol("fv").setPredictionCol(s"code$m")
        .fit(fitInput.select(array_to_vector(col(s"sub$m")).as("fv")))
    })), 10.minutes)
    fitInput.unpersist()
    fitted
  }
}
