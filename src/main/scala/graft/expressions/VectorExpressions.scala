package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
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
    * zip_with-pads-null analog). Boxed return so null is expressible —
    * one box per ROW, against 2·dim interpreted lambda frames saved. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
