package graft.tools
import org.apache.spark.sql.SparkSession
/** Times the full query set twice in a warm JVM, AQE on vs off, to
  * separate fixed planning overhead from data work. */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    // without this, Tables.tuneForScale would re-disable AQE inside
    // every query and both timed passes would measure the same config
    sys.props("graft.notune") = "1"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def runAll(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => }
      }
      (System.nanoTime() - t0) / 1e9
    }
    runAll() // warm-up pass (JIT + caches)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val on = runAll()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val off = runAll()
    println(f"[aqe] warm totals: aqe_on=$on%.1fs aqe_off=$off%.1fs")
    spark.stop()
  }
}
