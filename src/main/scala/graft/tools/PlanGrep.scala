package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared engine for the plan-fragment audits ([[SinglePartProbe]],
  * [[BnljProbe]]): build every key's physical plan at the smallest
  * tier and print `<label>: <key>` for each plan containing
  * `fragment`. One copy of the session setup / unbuilt-key skip /
  * loop, so the probes cannot drift apart (r11 review find). The
  * findings feed the GlobalPlanSweepSpec allowlists — run a probe
  * after adding keys; a NEW name must be argued bounded (and added to
  * the matching allowlist) or fixed. */
object PlanGrep {
  // q_stream_upsert: constructing it runs the whole 4-batch streaming
  // replay and its returned plan is just the final snapshot read
  private val unbuilt = Set("q_stream_upsert")

  def scan(fragment: String, label: String, args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!unbuilt(name)) {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        if (p.contains(fragment)) println(s"$label: $name")
      }
    }
    spark.stop()
  }
}
