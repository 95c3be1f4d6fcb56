package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{NetcdfSource, Sources}

/** CSV/JSON round-trips must be lossless against the parquet truth. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("CSV round-trip of customer is lossless") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    val c = Tables.customer(spark, dir)
    Sources.writeCsv(c, s"$tmp/customer")
    val back = Sources.readCsv(spark, s"$tmp/customer", c.schema)
    assert(back.count() == c.count())
    assert(back.exceptAll(c).count() == 0 && c.exceptAll(back).count() == 0)
  }

  test("JSONL round-trip of events (incl. µs timestamps) is lossless") {
    val tmp = Files.createTempDirectory("graft_json").toString
    val e = Tables.events(spark, dir)
    Sources.writeJsonl(e, s"$tmp/events")
    val back = Sources.readJsonl(spark, s"$tmp/events", e.schema)
    assert(back.count() == e.count())
    assert(back.exceptAll(e).count() == 0 && e.exceptAll(back).count() == 0)
  }

  test("withPathFields extracts filename-template metadata") {
    // raw read, not Tables: input_file_name() is empty over a cached
    // (InMemoryRelation) plan — path fields only exist at scan time
    val df = NetcdfSource.withPathFields(
      spark.read.parquet(s"$dir/region.parquet"),
      ".*/(sf[0-9.]+)/([a-z]+)\\.parquet", Seq("sf_tag", "table_name"))
    val row = df.select("sf_tag", "table_name").distinct().head()
    assert(row.getString(0) == "sf0.001" && row.getString(1) == "region")
  }
}
