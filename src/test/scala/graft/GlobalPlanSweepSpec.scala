package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Blanket scale-regression net over the ENTIRE declared contract: no
  * key's physical plan may contain a CartesianProduct, ever — except
  * the one key whose SEMANTICS are a cross join (q_join_cross, a
  * declared 5×25 product). PlanAuditSpec pins precise shapes for the
  * load-bearing keys; this sweep catches the silent catastrophe class
  * on every OTHER key: a future edit that drops a join predicate, or a
  * type change that stops an equi-key from matching, turns an O(n)
  * shuffle join into an O(n²) product — invisible at sf0.001, fatal at
  * 100 TB. Plans are built (and for construction-eager keys, their
  * prep jobs run) at the smallest tier; nothing is fully executed.
  *
  * BroadcastNestedLoopJoin is NOT globally banned: the watermark /
  * quantile / vocabulary 1-row-scalar broadcasts are legitimate BNLJs
  * (bounded side provably ≤ a few rows). Those are individually
  * shape-pinned in PlanAuditSpec; banning them here would just force
  * noisier equivalents.
  */
class GlobalPlanSweepSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  override def afterAll(): Unit = {
    // constructing every key caches the dimension tables AND registers
    // tracked operator caches; the CacheManager is shared across every
    // suite on this SparkContext (cache lookups match by analyzed
    // plan), so drain on teardown rather than leak cached plans into
    // whoever runs next
    ops.Text.clearMhMd5Cache()
    ops.Climate.clearEnsembleCache()
    spark.catalog.clearCache()
    super.afterAll()
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  // q_join_cross: its SEMANTICS are a cross join. q_stream_upsert:
  // constructing it runs the whole 4-batch streaming replay and its
  // returned plan is just the final snapshot read — the cost buys no
  // coverage here (its join shape is pinned in UpsertSinkSpec).
  private val exempt = Set("q_join_cross", "q_stream_upsert")

  test("no key's plan contains a CartesianProduct (declared cross join excepted)") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (exempt(name)) None
      else {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(name) else None
      }
    }
    assert(offenders.isEmpty,
      s"plans degenerated to cartesian products: ${offenders.mkString(", ")}")
  }
}
