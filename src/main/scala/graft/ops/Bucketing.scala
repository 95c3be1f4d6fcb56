package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SURVEY §7.4: "co-locate joins via
  * bucketing or pre-partitioning").
  *
  * Writing both join sides bucketed by the join key into the warehouse
  * lets Spark plan a SortMergeJoin with ZERO Exchange on either side —
  * at 100 TB the repeated fact⋈fact joins (lineitem⋈orders here) are
  * where pre-bucketing pays for itself on the second join, because the
  * shuffle was paid once at write time.
  *
  * Verified in BucketingSpec: the bucketed join plan contains no
  * Exchange operator and matches the plain join row-for-row.
  */
object Bucketing {

  /** Persist a DataFrame bucketed+sorted by `key` as a managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two pre-bucketed tables on their bucket key — shuffle-free
    * when both sides used the same bucket count. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True when the executed plan needs no shuffle (the point of
    * bucketing). Matches shuffle exchanges specifically — a
    * BroadcastExchange moves no partitioned data and is not a shuffle. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("ShuffleExchange") &&
      !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning") &&
      !df.queryExecution.executedPlan.toString.contains("Exchange rangepartitioning")
}
