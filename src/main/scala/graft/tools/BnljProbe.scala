package graft.tools
import org.apache.spark.sql.SparkSession
object BnljProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (name != "q_stream_upsert") {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        if (p.contains("BroadcastNestedLoopJoin")) println(s"BNLJ: $name")
      }
    }
    spark.stop()
  }
}
