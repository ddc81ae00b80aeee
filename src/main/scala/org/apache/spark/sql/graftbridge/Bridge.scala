package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(expr)/Column.expr bridge; the
  * supported converters live in `classic.ExpressionUtils`, which is
  * private[sql]. This shim (inside the sql package, the standard
  * extension technique) re-exports just the two conversions the
  * engine's custom expressions need. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Decompose a possibly-sort-ordered Column (Spark 4 backs Column
    * with a ColumnNode, so `.desc` wraps an
    * `org.apache.spark.sql.internal.SortOrder` node — NOT the catalyst
    * SortOrder, which `expression(c)` only surfaces lazily inside an
    * unevaluable ColumnNodeExpression). Returns
    * (value column, ascending?, default null ordering?); a plain
    * column parses as (itself, true, true). */
  def parseSortOrder(c: Column): (Column, Boolean, Boolean) = {
    import org.apache.spark.sql.internal.{SortOrder => NodeSortOrder}
    c.node match {
      case so: NodeSortOrder =>
        val asc = so.sortDirection == NodeSortOrder.Ascending
        val defaultNulls =
          if (asc) so.nullOrdering == NodeSortOrder.NullsFirst
          else so.nullOrdering == NodeSortOrder.NullsLast
        (new Column(so.child), asc, defaultNulls)
      case _ => (c, true, true)
    }
  }

  /** `AbstractDataType` went private[sql] in Spark 4; expressions
    * outside the sql package need the alias to declare
    * `ExpectsInputTypes.inputTypes`. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Register a SQL function on an ALREADY-BUILT session. The
    * supported path is `spark.sql.extensions=graft.GraftExtensions`
    * at build time (which `graft.Sessions` sets); this is for hosts
    * that hand the engine a session they built themselves — the
    * function registry hangs off `sessionState`, private[sql] on the
    * classic session. */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
