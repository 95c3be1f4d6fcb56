package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bucketing

/** Bucketed join must be shuffle-free and result-identical. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(rmrf)
    p.delete()
  }

  test("a reused exchange counts once — its subtree is not re-walked") {
    // the r5 ADVICE double-count: shuffleExchanges used to descend
    // into ReusedExchangeExec.child, re-counting every shuffle under
    // the original exchange site. Build an exchange whose SUBTREE
    // itself holds two shuffles (a repartition over a sort-merge
    // join), self-join it so the planner reuses that exchange, and
    // assert the count equals the physical truth: 3 original shuffles
    // + 1 reused read = 4 (the old walk said 6).
    import org.apache.spark.sql.functions.col
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = Tables.orders(spark, dir)
        .select(col("o_custkey").as("k"), col("o_orderkey"))
      val b = Tables.customer(spark, dir)
        .select(col("c_custkey").as("k"), col("c_mktsegment"))
      // the join must see IDENTICAL subtrees on both sides (any
      // asymmetric projection lets column pruning de-duplicate only
      // the leaf exchanges, which never double-counted) — so join g
      // with g itself, duplicate output names and all
      val g = a.join(b, "k").repartition(col("o_orderkey"))
      val self = g.join(g, "o_orderkey")
      val plan = self.queryExecution.executedPlan
      val reuses = plan.collect {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
      }
      assert(reuses.nonEmpty,
        "planner no longer reuses the identical exchange — rebuild the shape:\n" + plan)
      assert(Bucketing.shuffleExchanges(self).size == 4,
        "reuse double-count — plan:\n" + plan)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("bucketed lineitem⋈orders has no Exchange and matches plain join") {
    // the session may be shared across suites (getOrCreate) with a
    // default warehouse; clear orphan locations from previous JVMs and
    // pin the plan-shape confs at runtime (builder confs don't apply to
    // a reused session): AQE off so the final plan is inspectable,
    // broadcast off so the join is the bucketed SortMergeJoin
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("li_b", "o_b").foreach(t => rmrf(new java.io.File(wh, t)))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    Bucketing.writeBucketed(
      Tables.lineitem(spark, dir).withColumnRenamed("l_orderkey", "okey"),
      "li_b", "okey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "okey"),
      "o_b", "okey", 8)
    val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "okey")
    // tree-typed assertion: zero ShuffleExchangeLike NODES (not a
    // string match) anywhere in the executed plan
    assert(Bucketing.shuffleExchanges(joined).isEmpty,
      "expected no shuffle exchange in:\n" + joined.queryExecution.executedPlan)
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
    // positive control: the same join over the UN-bucketed parquet
    // must shuffle BOTH sides here (broadcast is off) — proving the
    // detector sees shuffles when they exist, so the zero above is
    // evidence, not a blind spot
    assert(Bucketing.shuffleExchanges(plain).size >= 2,
      "detector control failed — plain join plan:\n" +
        plain.queryExecution.executedPlan)
    assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
