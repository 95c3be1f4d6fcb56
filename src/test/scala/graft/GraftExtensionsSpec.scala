package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must install the strategy + SQL functions into
  * a session built with withExtensions — the spark-submit deployment
  * path. Extensions are per-session, so the suite clears the shared
  * default-session handle to force a fresh session (same SparkContext). */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // getOrCreate returns any pre-existing default session (shared by
    // other suites in this JVM) and silently DROPS withExtensions —
    // clear the active/default handles so a genuinely new session
    // (reusing the shared SparkContext) is built with the extensions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("SQL functions and as-of strategy install via withExtensions") {
    val c = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c," +
        " dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(c.getDouble(0) == 1.0 && c.getDouble(1) == 11.0)
    // float arrays auto-cast through the injected wrapper too
    val f = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS c").head()
    assert(f.getDouble(0) == 1.0)
    // the strategy is present without any AsOf.join call having run
    assert(spark.sessionState.planner.strategies
      .exists(_.getClass.getName.contains("AsOfStrategy")) ||
      spark.sessionState.planner.extraPlanningStrategies
        .exists(_.getClass.getName.contains("AsOfStrategy")))
  }

  test("cms_sketch aggregate works from plain SQL") {
    val sk = spark.sql(
      """SELECT cms_sketch(h, 3, 64) AS sk FROM VALUES (1L), (2L), (2L) t(h)""")
      .head().getSeq[Long](0)
    assert(sk.length == 3 * 64)
    // total mass per row == input rows; max counter == the repeated item
    (0 until 3).foreach(d => assert(sk.slice(d * 64, d * 64 + 64).sum == 3L))
    assert(sk.max == 2L)
  }

  test("minhash_sig aggregate works from plain SQL") {
    val sig = spark.sql(
      """SELECT minhash_sig(h, 4) AS sig FROM VALUES (1L), (2L), (3L) t(h)""")
      .head().getSeq[Long](0)
    assert(sig.length == 4)
    // a second run over the same values is identical (deterministic)
    val sig2 = spark.sql(
      """SELECT minhash_sig(h, 4) AS sig FROM VALUES (1L), (2L), (3L) t(h)""")
      .head().getSeq[Long](0)
    assert(sig == sig2)
  }
}
