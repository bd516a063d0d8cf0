package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters (the
  * Spark 4 Column wraps a ColumnNode, not an Expression, so plugging a
  * custom Catalyst expression into the DSL needs the classic converters).
  * Lives inside the org.apache.spark.sql namespace for access — the
  * conventional pattern for Spark-native extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
