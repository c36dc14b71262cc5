package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters — the
  * standard pattern for extension libraries that construct native
  * Catalyst expressions directly (Spark 4 wraps Column around ColumnNode,
  * so `new Column(expr)` no longer exists). Kept to exactly these two
  * calls.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
