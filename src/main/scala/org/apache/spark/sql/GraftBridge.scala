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

  /** Dataset from a hand-built LogicalPlan (SNIPPETS.md §[1]/§[3]
    * pattern) — used by graft's custom operators (as-of join). */
  def dataset(spark: SparkSession,
              plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Stable, collision-free session identifier (private[sql] in Spark 4). */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** The session's effective Hadoop configuration
    * (`sessionState.newHadoopConf()` — core-site/spark.hadoop.* merged;
    * `sessionState` is private[sql] in Spark 4). The netcdf DSv2 source
    * captures this at plan/write-build time instead of `new
    * Configuration()`, so per-session fs settings (s3a credentials
    * etc.) reach its listings, readers, and committers. */
  def sessionHadoopConf(spark: SparkSession): org.apache.hadoop.conf.Configuration =
    spark.asInstanceOf[classic.SparkSession].sessionState.newHadoopConf()
}
