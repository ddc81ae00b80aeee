package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * text-pipeline step that makes visually-identical strings (composed
  * é vs e + U+0301) hash/dedup/join identically. Spark has no
  * built-in; DuckDB's `nfc_normalize` is the oracle twin, and both
  * implement Unicode canonical composition, so results hash-match.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that is true
  * for virtually all real text (pure ASCII short-circuits
  * immediately), so the allocating normalize runs only on rows that
  * actually need composing. `doGenCode` emits a static call — the
  * companion helper is named `compute`, NOT `eval` (a same-named class
  * member makes Janino resolve the instance method, fail, and silently
  * fall back to the interpreter — the round-2 simhash lesson;
  * `ExpressionsSpec`'s CODEGEN_ONLY guard would catch it).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** SQL registration: `SELECT nfc_normalize(col)` in spark.sql. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
}
