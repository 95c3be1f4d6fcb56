package graft.tools
import org.apache.spark.sql.SparkSession
/** Per-key warm-pass cost attribution: one warm-up pass, then a timed
  * pass printing every key over 200 ms — the tool behind the per-round
  * "warm heavy tail" rows in BASELINE.md. */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    sys.props("graft.notune") = "1"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default stays local[4] so warm totals remain comparable with the
    // r1-r10 records; set SPARK_GRAFT_CPUS=32 to profile the production
    // default (Bench/Verify moved to local[32] in the r10 continuation)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pass(report: Boolean): Double = {
      var total = 0.0
      graft.SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        // a throwing key must be VISIBLE — silently swallowed, its
        // near-zero time would fake a flat profile
        try fn(spark, sfDir).count() catch {
          case e: Throwable => println(s"[warm] FAILED $name: ${e.getMessage}")
        }
        val s = (System.nanoTime() - t0) / 1e9
        total += s
        if (report && s > 0.2) println(f"[warm] $s%6.2f  $name")
      }
      total
    }
    pass(report = false)
    val t = pass(report = true)
    println(f"[warm] total=$t%.1fs")
    spark.stop()
  }
}
