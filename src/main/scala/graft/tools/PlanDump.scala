package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Write `.explain("formatted")` output for the named keys (or every
  * key) to `<outDir>/<key>_<tag>.txt` — the optimization-round evidence
  * files under plans/r17/. Mirrors Bench's session (same
  * SPARK_GRAFT_CPUS / shuffle-partition contract) so the dumped plan is
  * the one the bench executes; SPARK_GRAFT_NOCACHE=1 additionally
  * exposes the raw parquet scans (PushedFilters/ReadSchema) instead of
  * InMemoryRelation for the cached dimension tables.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> [key ...]
  */
object PlanDump {
  // q_stream_upsert's DataFrame is just the final snapshot read; building
  // it runs the whole 4-batch streaming replay (same rule as PlanGrep)
  private val unbuilt = Set("q_stream_upsert")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [key ...]")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    val keys = if (args.length > 2) args.drop(2).toSeq else all.keys.toSeq.sorted
    keys.foreach { name =>
      if (!all.contains(name)) System.err.println(s"[plandump] unknown key $name")
      else if (unbuilt(name)) System.err.println(s"[plandump] skipping $name (replay-on-build)")
      else {
        val txt = try {
          all(name)(spark, sfDir).queryExecution.explainString(FormattedMode)
        } catch { case e: Throwable => s"FAILED to build: $e" }
        Files.write(outDir.resolve(s"${name}_$tag.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        println(s"[plandump] wrote ${name}_$tag.txt")
      }
    }
    spark.stop()
  }
}
