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

  /** `AbstractDataType` went private[sql] in Spark 4; expressions
    * outside the sql package need the alias to declare
    * `ExpectsInputTypes.inputTypes`. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
