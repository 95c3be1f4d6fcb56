package graft.tools

import org.apache.spark.sql.SparkSession

/** Audit: which keys plan an `Exchange SinglePartition`? Each hit is a
  * deliberate bounded reduction — a single-row global aggregate, a
  * scalar watermark/threshold gate, a provably-tiny hot-set — never a
  * full-table funnel (those are banned structurally: cartesians and
  * global windows by GlobalPlanSweepSpec, per-key shapes by
  * PlanAuditSpec). Run after adding keys; a NEW name here must be
  * argued bounded or fixed. Output recorded in BASELINE.md (r10). */
object SinglePartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (name != "q_stream_upsert") {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        if (p.contains("Exchange SinglePartition")) println(s"SP: $name")
      }
    }
    spark.stop()
  }
}
