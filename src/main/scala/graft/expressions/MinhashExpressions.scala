package graft.expressions

import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the MinHash hot path (the dedup family's
  * residual cost after SimHash went native in round 2). The
  * higher-order-function formulation — shingles → array_distinct →
  * per-shingle md5 → K array_min/transform folds — walks the
  * interpreted expression evaluator once per lambda step per element;
  * these run the identical math as one tight JVM loop per row and stay
  * inside whole-stage codegen via static calls.
  *
  * Value compatibility: bit-identical to the HOF forms in
  * [[graft.functions.TextFunctions]] (asserted in
  * `ExpressionsSpec`) and to the DuckDB oracle SQL, which is
  * unchanged. Shingle multiplicity cannot affect a min, so the
  * array_distinct step of the HOF pipeline is skipped here.
  */

/** Distinct word n-gram shingles of a token array, first-occurrence
  * order — value-identical to
  * `array_distinct(transform(...concat_ws(" ", …)))` including the
  * `size(words) < n` → empty-array case. */
case class ShinglesArray(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // ExpectsInputTypes: a wrong-typed argument (e.g. an unsplit string
  // at the SQL registration) fails analysis, not with a runtime
  // ClassCastException inside the codegen'd static call.
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_array"

  // n < 1 would loop forever in compute (i + n <= nw never advances
  // past nw for n <= 0) — reject at analysis, where the SQL-registered
  // shingles(words, n) can reach it.
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"shingle width n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess
  }

  protected override def nullSafeEval(input: Any): Any =
    ShinglesArray.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShinglesArray.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesArray =
    copy(child = newChild)
}

object ShinglesArray {
  private val Space = UTF8String.fromString(" ")

  def compute(words: ArrayData, n: Int): ArrayData = {
    val nw = words.numElements()
    if (nw < n) return new GenericArrayData(Array.empty[Any])
    // concatWs allocates fresh UTF8Strings, so the set never aliases
    // the (reused) input row buffer.
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= nw) {
      var j = 0
      while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(ShinglesArray(Bridge.expression(c), n))
}

/** Full K-slot MinHash signature straight from the token array:
  * for each word n-gram shingle s, h = H32(s) mod p; signature slot k
  * is min over shingles of (a_k*h + b_k) mod p — one md5 per shingle
  * and K fused multiply-mod-min updates, no intermediate arrays.
  *
  * Degenerate input (< n words, so zero shingles) yields NULL — the
  * same value the HOF pipeline's `array_min` produces on an empty
  * shingle array. A sentinel signature here would band-collide every
  * short doc with every other as an est_jaccard=1.0 near-dup through
  * the SQL-registered `minhash_signature`, where no size(words) >= n
  * guard is enforced. */
case class MinhashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  // Only 12 hash-permutation coefficient pairs exist; an
  // out-of-range k through the SQL-registered minhash_signature
  // would otherwise AIOOBE per row mid-job. Fail analysis instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"shingle width n must be >= 1, got $n")
    else if (k < 1 || k > TextFunctions.MinhashA.length)
      TypeCheckResult.TypeCheckFailure(
        s"signature size k must be in 1..${TextFunctions.MinhashA.length}, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  protected override def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.MinhashSignature.compute($c, $n, $k);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  private val Space = UTF8String.fromString(" ")
  private val P = TextFunctions.MinhashP
  private val A = TextFunctions.MinhashA.toArray
  private val B = TextFunctions.MinhashB.toArray

  def compute(words: ArrayData, n: Int, k: Int): ArrayData = {
    val nw = words.numElements()
    if (nw < n) return null // zero shingles: null, like array_min([])
    val out = Array.fill(k)(P)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= nw) {
      var j = 0
      while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
      val h = H32.hash(UTF8String.concatWs(Space, parts: _*)) % P
      var t = 0
      while (t < k) {
        val v = (A(t) * h + B(t)) % P // a < p, h < p ⇒ product < 2^62: no overflow
        if (v < out(t)) out(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int, k: Int): Column =
    Bridge.column(MinhashSignature(Bridge.expression(c), n, k))
}
