package graft

import graft.expressions.{H32, MsgpackDecodeFrame}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or spark.sql.extensions=graft.GraftExtensions via config
  * }}}
  *
  * No analyzer rules or planner strategies are injected: SURVEY.md §4
  * concluded none are required for parity (built-ins + expressions
  * cover the surface); this class is the seam where they would go.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      e.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("h32"),
      new ExpressionInfo(classOf[H32].getName, "h32"),
      (exprs: Seq[Expression]) => H32(exprs.head)),
    (FunctionIdentifier("msgpack_decode_frame"),
      new ExpressionInfo(classOf[MsgpackDecodeFrame].getName, "msgpack_decode_frame"),
      (exprs: Seq[Expression]) => MsgpackDecodeFrame(exprs.head)))
}
