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
  // keyed by sessionUUID (collision-free and stable, unlike
  // identityHashCode which can collide or be reused after GC); the
  // UUID lives on the classic SparkSession in Spark 4
  private val cache = TrieMap.empty[(String, String, String), DataFrame]

  private def uuid(spark: SparkSession): String =
    org.apache.spark.sql.GraftBridge.sessionUUID(spark)

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
  /** Set SPARK_GRAFT_NOTUNE=1 to leave AQE/partition confs untouched. */
  private val dirSize = TrieMap.empty[String, Long]
  private val sessionDefaults = TrieMap.empty[String, (String, String)]

  private def dirBytes(f: java.io.File): Long =
    if (f.isDirectory) Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
    else f.length()

  // synchronized: the conf writes are session-global, so two threads
  // loading dirs of different sizes concurrently would interleave the
  // AQE/partition settings (harness is single-threaded; the lock makes
  // the library safe for concurrent callers at negligible cost)
  private def tuneForScale(spark: SparkSession, sfDir: String): Unit = synchronized {
    // env for operators; system property for in-process tools (AqeProbe)
    if (sys.env.get("SPARK_GRAFT_NOTUNE").contains("1")
      || sys.props.get("graft.notune").contains("1")) return
    // size measured RECURSIVELY (Spark-written tables are directories of
    // part files — a flat sum would see ~4 KB per table and misfire the
    // gate on production-scale data) and memoized per dir; the conf is
    // re-applied on every call so interleaving a tiny and a large dir in
    // one session always runs each query under its own dir's regime.
    val total = dirSize.getOrElseUpdate(sfDir, {
      val root = new java.io.File(sfDir)
      if (root.exists()) dirBytes(root) else Long.MaxValue
    })
    val defaults = sessionDefaults.getOrElseUpdate(uuid(spark), (
      spark.conf.get("spark.sql.adaptive.enabled"),
      spark.conf.get("spark.sql.shuffle.partitions")))
    if (total < 256L * 1024 * 1024) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // don't fan tiny shuffles across a big core count: 4 partitions
      // keep every stage 1-wave even at local[32]
      if (defaults._2.toInt > 4)
        spark.conf.set("spark.sql.shuffle.partitions", "4")
    } else {
      // large input: the session's own settings apply (AQE on, operator
      // parallelism as configured) — and restore them if a tiny dir was
      // loaded earlier in this session
      spark.conf.set("spark.sql.adaptive.enabled", defaults._1)
      spark.conf.set("spark.sql.shuffle.partitions", defaults._2)
    }
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tuneForScale(spark, sfDir)
    cache.getOrElseUpdate((uuid(spark), sfDir, name), {
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
