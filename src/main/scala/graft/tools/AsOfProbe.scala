package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AsOfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.AsOf.register(spark); graft.plans.AsOf.register(spark)
    println("strategies=" + spark.experimental.extraStrategies.size)
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val p = e.filter(col("event_type") === "purchase").select(col("event_id"), col("user_id"), col("ts"))
    val s = e.filter(col("event_type") === "signup").select(col("user_id").as("su"), col("ts").as("st"))
    val j = graft.plans.AsOf.join(spark, p, s, "user_id", "su", "ts", "st")
    println("asof rows=" + j.count() + " matched=" + j.filter(col("st").isNotNull).count())
    spark.stop()
  }
}
