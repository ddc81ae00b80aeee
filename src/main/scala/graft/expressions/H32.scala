package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 32-bit hash:
  * the first 32 bits of md5(s) as an unsigned value in a LongType —
  * exactly `('0x'||substr(md5(s),1,8))::BIGINT` in the DuckDB oracle
  * and `conv(substr(md5(s),1,8),16,10)` in Spark SQL.
  *
  * The Column-composed form (`conv(substring(md5(...)))`) allocates a
  * 32-char hex string and re-parses it per call; this expression
  * digests the raw bytes and reads the first word directly, and
  * `doGenCode` emits a static call so the operator stays inside
  * whole-stage codegen (no CodegenFallback, no UDF ser/de).
  */
case class H32(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {

  // analysis inserts the implicit cast for e.g. h32(bigint_col) —
  // without this, codegen emits H32.hash(long) with no overload and
  // the projection silently degrades to the interpreter, where the
  // cast fails per row instead of at analysis
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "h32"

  protected override def nullSafeEval(input: Any): Any =
    H32.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.H32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): H32 =
    copy(child = newChild)
}

object H32 {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes, big-endian, as an unsigned 32-bit value. */
  def hash(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
  }

  def apply(c: Column): Column = Bridge.column(H32(Bridge.expression(c)))

  /** SQL registration: `SELECT h32(col)` in spark.sql. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "h32", exprs => H32(exprs.head), "scala_udf")
}
