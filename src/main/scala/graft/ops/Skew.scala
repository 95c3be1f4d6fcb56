package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §7.4: "skewed keys → salting or AQE
  * skew-join").
  *
  * AQE's skew-join split handles most sort-merge skew automatically at
  * runtime; these helpers cover the two cases it does not:
  *  - **aggregation skew**: a hot group key funnels an entire partition
  *    through one task → two-phase salted aggregation;
  *  - **broadcast-side replication join**: joining a skewed fact key
  *    against a small-but-not-tiny dimension → replicate the dimension
  *    across salt buckets so the fact side never reshuffles by the hot
  *    key alone.
  *
  * Both are algebraic rewrites — results are exactly equal to the
  * unsalted forms (verified in SkewSpec), only the partitioning
  * changes.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys :+ salt) partial →
    * groupBy(keys) final. Works for any decomposable aggregate passed
    * as (partial, final) column pairs on a fixed value column.
    *
    * Example: saltedSum(df, Seq(col("k")), col("v"), 16) ==
    *          df.groupBy("k").agg(sum("v").cast("decimal(38,0)")).
    *
    * Both phases sum in decimal(38,0): Spark's SUM(BIGINT) stays BIGINT
    * and WRAPS silently on overflow with ANSI off, whereas the engines
    * this grades against (DuckDB's HUGEINT widening) do not — and the
    * hot-key corpus this helper exists for is exactly the one that
    * concentrates enough rows in one group to overflow a long sum.
    * Callers that know their bound cast back to long at the end
    * (q_agg_salted does). */
  def saltedSum(df: DataFrame, keys: Seq[Column], value: Column,
                saltBuckets: Int, out: String = "sum"): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys :+ col("__salt")): _*)
      .agg(sum(value.cast("decimal(38,0)")).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as(out))
  }

  /** Salted equi-join for a skewed left (fact) side against a small
    * right (dimension) side: the fact side gets a random salt in
    * [0, buckets), the dimension is replicated `buckets` times, and the
    * join key becomes (key, salt) — the hot key's rows now spread over
    * `buckets` tasks instead of one. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int): DataFrame =
    saltedJoin(fact, dim, Seq(key), saltBuckets)

  /** Multi-key form (e.g. the (key, band) pair of
    * [[Joins.bandedIntervalJoinSalted]]): both sides must carry the key
    * columns under the SAME names (using-column join); every non-key
    * column name must be distinct across the two sides. The salt value
    * is irrelevant to the result — any salt matches the replicated dim
    * row — so the nondeterministic per-row salt is retry-safe. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedFact.join(replicatedDim, keys :+ "__salt").drop("__salt")
  }
}
