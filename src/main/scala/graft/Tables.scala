package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Memoized per-(session, sfDir) base-table loaders.
  *
  * At harness scale every table is small (≤600k rows at sf0.1), so we
  * cache all of them: the bench runs ~60 queries that would otherwise
  * re-scan the same parquet each time. The 100 TB design gate is noted
  * per call site: in production only *dimension* tables (region, nation,
  * customer, supplier, part) would be cached/broadcast; fact tables
  * (lineitem, orders, events, documents, embeddings) stream from
  * columnar storage so predicate pushdown + column pruning stay active.
  * Caching here is a bench optimization, never a correctness dependency.
  */
object Tables {
  private val cache = TrieMap.empty[(Int, String, String), DataFrame]

  /** Set SPARK_GRAFT_NOCACHE=1 to disable caching (e.g. to inspect
    * PushedFilters in `.explain` output on the raw parquet scan). */
  private def cachingEnabled: Boolean =
    !sys.env.get("SPARK_GRAFT_NOCACHE").contains("1")

  /** Only dimension-sized tables are cached. The fact tables (lineitem,
    * orders, events) stream from parquet: the vectorized columnar scan
    * with pushdown + pruning is cheaper than materializing a cache that
    * most queries touch once — measured at sf0.1, caching lineitem cost
    * 5-7 s up front to save ~0.3 s per scan. This is exactly the 100 TB
    * gate: cache/broadcast dimensions, never facts. */
  private val cacheable = Set("region", "nation", "customer", "supplier",
    "part", "documents", "embeddings")

  /** Tiny-input fast path (measured: AQE's re-optimization loop costs
    * ~18% of total wall-clock across the query set at sf0.1 while
    * having nothing to adapt — no skew, no partitions to coalesce at
    * 4-32 shuffle partitions). Below 256 MB of total input, turn AQE
    * off for the session; at production scale the gate leaves it on,
    * where runtime re-planning (skew splits, join demotion) is worth
    * its cost. Size, not scale-factor name, drives the decision. */
  private val tuned = TrieMap.empty[(Int, String), Boolean]
  private def tuneForScale(spark: SparkSession, sfDir: String): Unit =
    tuned.getOrElseUpdate((System.identityHashCode(spark), sfDir), {
      val total = new java.io.File(sfDir).listFiles() match {
        case null => Long.MaxValue
        case fs => fs.map(_.length()).sum
      }
      if (total < 256L * 1024 * 1024) {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        // and don't fan tiny shuffles across a big core count: 4
        // partitions keep every stage 1-wave even at local[32]
        val parts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
        if (parts > 4) spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      true
    })

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tuneForScale(spark, sfDir)
    cache.getOrElseUpdate((System.identityHashCode(spark), sfDir, name), {
      val df =
        if (name == "events") {
          // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
          // rejects. Read it as raw nanos (legacy conf) and convert with
          // integer DIV — exact, and identical to DuckDB's ns→µs
          // truncation (all values are whole µs anyway, measured).
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$sfDir/$name.parquet")
            .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts DIV 1000")))
        } else spark.read.parquet(s"$sfDir/$name.parquet")
      if (cachingEnabled && cacheable(name)) df.cache() else df
    })
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
