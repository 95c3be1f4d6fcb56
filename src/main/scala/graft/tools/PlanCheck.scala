package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints plan-shape evidence for the scale-critical queries: parquet
  * pushdown/pruning, broadcast joins, TakeOrderedAndProject fusion,
  * whole-stage codegen coverage. Run with SPARK_GRAFT_NOCACHE=1 so the
  * raw scans (not InMemoryRelation) are visible. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("q_scan_pushdown", "q_join_multiway",
      "q_join_broadcast", "q_limit_topk", "q_join_range")
    interesting.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      def has(s: String) = if (plan.contains(s)) s"HAS $s" else s"NO $s"
      println(s"== $name: " + Seq("PushedFilters: [", "BroadcastHashJoin",
        "BroadcastNestedLoopJoin", "TakeOrderedAndProject", "WholeStageCodegen")
        .map(has).mkString(" | "))
      // show the scan lines (pushdown + read schema evidence)
      plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .take(4).foreach(l => println("   " + l.trim.take(200)))
    }
    spark.stop()
  }
}
