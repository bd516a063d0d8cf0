package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters (the
  * Spark 4 Column wraps a ColumnNode, not an Expression, so plugging a
  * custom Catalyst expression into the DSL needs the classic converters).
  * Lives inside the org.apache.spark.sql namespace for access — the
  * conventional pattern for Spark-native extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Lazy wrapper (ColumnNodeExpression) — fine inside plans that go back
    * through classic API entry points, which convert eagerly.
    */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly-converted catalyst expression. Required when the expression is
    * stored in a custom logical/physical node: the analyzer does not visit
    * ColumnNodeExpression wrappers inside foreign nodes, so the raw (non-
    * serializable) ColumnNode would ride into task closures.
    */
  def eagerExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** DataFrame from a (possibly custom) logical plan — `Dataset.ofRows` is
    * likewise `private[sql]` in Spark 4's classic API.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
