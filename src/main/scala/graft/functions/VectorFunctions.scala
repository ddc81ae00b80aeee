package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding math over `array<float>` columns, computed with
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no
  * UDFs, no MLlib Vector conversions, no shuffles. Inputs are cast to
  * double once so accumulation happens in double precision (stable
  * and cross-engine reproducible: a sequential left fold, matching
  * the DuckDB oracle's list_dot_product).
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product of two double arrays — a native
    * codegen'd expression ([[graft.expressions.DotProduct]]), value-
    * identical to `aggregate(zip_with(a,b,_*_), 0.0, _+_)` (same
    * accumulation order; parity asserted in ExpressionsSpec). The HOF
    * form walks the interpreted lambda evaluator twice per element —
    * measured 20× slower at ANN-candidate volume. */
  def dot(a: Column, b: Column): Column = graft.expressions.DotProduct(a, b)

  /** The HOF formulation (kept for the parity spec). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Unit-normalize (zero-norm guarded): on the unit sphere squared L2
    * is 2 - 2·cos, so L2-metric structures (k-means cells, PQ
    * codebooks) agree with cosine ranking. Native one-pass expression —
    * the HOF form re-evaluates the norm subtree per ELEMENT (O(dim²)
    * per row; parity asserted in ExpressionsSpec). */
  def l2Normalize(v: Column): Column = graft.expressions.L2Normalize(v)

  /** The HOF formulation (kept for the parity spec). */
  def l2NormalizeHof(v: Column): Column = {
    val n = greatest(l2Norm(v), lit(1e-300))
    transform(v, x => x / n)
  }

  /** Cosine similarity, dot/(sqrt(|a|^2*|b|^2)) — same association as
    * the oracle formula so doubles match bit-for-bit. The denominator
    * floors at 1e-300 (the l2Normalize guard): a zero vector would be
    * 0/0, which under Spark 4's default ANSI mode is not NaN but a
    * DIVIDE_BY_ZERO error killing the whole query. Non-zero vectors
    * are unaffected (their norm product is far above the floor). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / greatest(sqrt(dot(a, a) * dot(b, b)), lit(1e-300))

  /** Elementwise squared-L2 fold. HOF on purpose: its only callers
    * rank BOUNDED volumes (query × broadcast centroid table), and the
    * elementwise sequential accumulation is the value both the recall
    * calibration and any oracle replica reproduce exactly — the
    * algebraic |a|²−2ab+|b|² form drifts in the last ulps. */
  def sqL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** 8-bit sign-signature LSH bucket from the first 8 dimensions:
    * bit i set iff v[i] > 0. A deterministic, training-free coarse
    * quantizer — the bucketed ANN path joins within buckets only.
    * The size guard short-circuits before element_at: under ANSI mode
    * (Spark 4 default) an out-of-bounds element_at THROWS rather than
    * returning null, so a truncated vector would abort the job. */
  def signBucket(v: Column, bits: Int = 8): Column =
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)),
        i => when(size(v) > i && element_at(v, i + 1) > 0,
          call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
}
