package graft.tools

import org.apache.spark.sql.SparkSession

/** Re-dump NAMED SparkEntry keys for a tier into a diffcheck-ready
  * dir (per-key parquet + filtered oracle_sql.json) — the audit tool
  * for retrying individual oracle comparisons (e.g. after a DuckDB
  * resource failure, or to grade keys added after a long tier run)
  * without repeating the full 156-key Verify. */
object RetryKeys {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, keysCsv) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val keys = keysCsv.split(",").toSeq
    keys.foreach { k =>
      val df = graft.SparkEntry.queries(k)(spark, sfDir)
      // coalesce(1) like Verify: diffcheck reads a SINGLE part file, so
      // a multi-part dump silently compares a fraction of the rows
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$k")
      println(s"[retry] wrote $k")
    }
    val oracles = keys.flatMap(k =>
      graft.SparkEntry.oracleSql.get(k).map(k -> _)).toMap
    val json = oracles.map { case (k, v) =>
      "\"" + k + "\": " + com.fasterxml.jackson.databind.json.JsonMapper
        .builder().build().writeValueAsString(v)
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
