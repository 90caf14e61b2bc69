package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters — the classic
  * (non-Connect) API for exposing custom Catalyst expressions as Columns
  * (Spark 4 moved Column onto implementation-agnostic ColumnNodes, so
  * library code needs this hop; functionally equivalent to registering a
  * builder in the session FunctionRegistry, without the session coupling). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
