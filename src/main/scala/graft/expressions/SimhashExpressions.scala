package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the SimHash hot path. The higher-order-
  * function formulation (transform/aggregate) is interpreted — every
  * lambda step goes through the expression evaluator — and measured
  * as the residual cost of the dedup sketches. These run the same
  * math as tight JVM loops and stay codegen-compatible via static
  * calls, producing bit-identical values to the HOF versions (and to
  * the DuckDB oracle, which is unchanged).
  */

/** Salted 32-bit hashes of every element of a string array:
  * out[i] = H32(salt || ':' || words[i]). A null ELEMENT raises a
  * descriptive error (the SQL-registered path; internal callers feed
  * split() output, which has no null slots) — silent alternatives are
  * worse: UnsafeArrayData would read the slot as garbage and an NPE
  * names nothing. */
case class SaltedH32Array(child: Expression, salt: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "salted_h32_array"

  // The salt prefix is plan-time constant: build it once per
  // expression instance, not per row on the dedup hot path.
  @transient private lazy val prefix = UTF8String.fromString(salt.toString + ":")

  protected override def nullSafeEval(input: Any): Any =
    SaltedH32Array.compute(input.asInstanceOf[ArrayData], prefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("saltPrefix", prefix,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.expressions.SaltedH32Array.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): SaltedH32Array =
    copy(child = newChild)
}

object SaltedH32Array {
  def compute(arr: ArrayData, prefix: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i),
        s"salted_h32_array: null array element at $i — filter nulls first")
      out(i) = H32.hash(UTF8String.concat(prefix, arr.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, salt: Int): Column =
    Bridge.column(SaltedH32Array(Bridge.expression(c), salt))
}

/** 32-bit simhash from an array of hashes: bit b set iff the count of
  * elements with bit b set exceeds half (sum of ±1 positive). A null
  * element raises a descriptive error — ArrayData.getLong would
  * silently read a null slot as 0 and skew the sketch. */
case class Simhash32FromHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  protected override def nullSafeEval(input: Any): Any =
    Simhash32FromHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Simhash32FromHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash32FromHashes =
    copy(child = newChild)
}

object Simhash32FromHashes {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i),
        s"simhash32: null hash element at $i — filter nulls first")
      val h = arr.getLong(i)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def apply(c: Column): Column =
    Bridge.column(Simhash32FromHashes(Bridge.expression(c)))
}
