package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placement bridge to the `private[sql]` Column↔Expression
  * converters (Spark 4 moved them behind `classic.ExpressionUtils`).
  * Same pattern as public extension libraries use for `Dataset#apply`
  * (see SNIPPETS.md §[3], Qbeast's `DatasetFactory`): a minimal object
  * inside `org.apache.spark.sql` exposing just the two calls graft
  * needs for its custom Catalyst expressions.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
