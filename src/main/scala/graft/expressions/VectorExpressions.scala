package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native dot product over `array<double>` — the embedding family's
  * hot inner loop. The HOF form (`aggregate(zip_with(a, b, _*_), 0,
  * _+_)`) walks the interpreted lambda evaluator twice per element;
  * at ANN-candidate volume (10⁷ pairs × 64 dims) that interpretation
  * dominated the whole query (measured 104 s of a 110 s q_knn_ivf run
  * at the 10× ScaleCheck corpus). This is the identical math — one
  * sequential left-fold in a tight JVM loop, bit-for-bit the HOF's
  * result (same accumulation order) — inside whole-stage codegen via
  * a static call.
  *
  * Mirrors the HOF's null semantics: a null array yields null, and
  * length-mismatched arrays yield null (zip_with pads with null,
  * which poisons the sum). Parity + CODEGEN_ONLY coverage in
  * `ExpressionsSpec`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("dotRes")
      s"""
      java.lang.Double $res = graft.expressions.DotProduct.compute($a, $b);
      ${ev.isNull} = $res == null;
      ${ev.value} = ${ev.isNull} ? -1.0 : $res.doubleValue();"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Sequential left-fold Σ a(i)·b(i); null on length mismatch (the
    * zip_with-pads-null analog) and on any null ELEMENT (a null
    * product poisons the HOF sum — ArrayData.getDouble would silently
    * read a null slot as 0.0). Boxed return so null is expressible —
    * one box per ROW, against 2·dim interpreted lambda frames saved. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}

/** Unit-normalize an `array<double>` in one pass: x / max(‖x‖, 1e-300)
  * (the zero-norm guard keeps all-zero vectors finite). The HOF form
  * (`transform(v, x => x / greatest(sqrt(dot(v,v)), eps))`) embeds the
  * norm subtree in the lambda BODY, and higher-order functions
  * re-evaluate the whole body per element with no loop-invariant
  * hoisting — O(dim²) multiply-adds per row, corpus-wide in the ANN
  * queries. Here the norm is computed once, then one divide per
  * element. A null ELEMENT nulls the result (the norm is poisoned —
  * same rule as [[DotProduct]]); a null array is null.
  */
case class L2Normalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "l2_normalize"

  protected override def nullSafeEval(v: Any): Any =
    L2Normalize.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("l2nRes")
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $res =
        graft.expressions.L2Normalize.compute($v);
      ${ev.isNull} = $res == null;
      ${ev.value} = $res;"""
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i)
      s += x * x
      i += 1
    }
    val norm = math.max(math.sqrt(s), 1e-300)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(v: Column): Column = Bridge.column(L2Normalize(Bridge.expression(v)))
}
