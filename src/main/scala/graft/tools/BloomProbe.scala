package graft.tools
import org.apache.spark.sql.SparkSession
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // dir from args or env — the probe has no business hardcoding a
    // fixture path (the plan pin itself lives in PlanAuditSpec; this
    // tool remains for ad-hoc conf experiments on arbitrary data)
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error(
        "usage: BloomProbe <sfDir>  (or set SPARK_GRAFT_SF_DIR)"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
    val j = li.join(o, li("l_orderkey") === o("o_orderkey"))
    val plan = j.queryExecution.optimizedPlan.toString
    println("HAS_BLOOM=" + (plan.toLowerCase.contains("bloom")))
    val pplan = j.queryExecution.executedPlan.toString
    println("PHYS_BLOOM=" + (pplan.toLowerCase.contains("bloom")))
    spark.stop()
  }
}
