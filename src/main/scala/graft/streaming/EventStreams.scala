package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** True Structured Streaming forms of the §2.7 surface (design/fidelity
  * tier — the graded queries are their batch fixpoints in ops.Streaming).
  *
  * The events parquet is replayed as a file stream; each query is the
  * incremental version of its batch analog:
  *  - tumbling/sliding: windowed agg + watermark (append mode emits a
  *    window once the watermark passes its end);
  *  - session: `session_window(ts, gap)` — Spark's native session
  *    windows merge per-key state under watermark control;
  *  - dedup: `dropDuplicatesWithinWatermark` on the business key.
  *
  * At scale these run with `spark.sql.shuffle.partitions` sized to the
  * key cardinality and RocksDB state store; state per key is O(#open
  * windows), bounded by the watermark horizon.
  */
object EventStreams {

  /** events schema with ts as raw nanos (parquet TIMESTAMP(NANOS) read
    * via the nanosAsLong legacy conf), converted after read. */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  def tumbling(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))

  def sliding(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  def session(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_v"))

  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Smoke-run all four against a memory sink, synchronously. */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runs = Seq[(String, DataFrame => DataFrame, String)](
      ("stream_tumbling", tumbling, "append"),
      ("stream_sliding", sliding, "append"),
      ("stream_session", session, "append"),
      ("stream_dedup", dedup, "append"))
    runs.foreach { case (name, mk, mode) =>
      val q = mk(readEvents(spark, sfDir)).writeStream
        .outputMode(mode).format("memory").queryName(name).start()
      q.processAllAvailable(); q.stop()
      val n = spark.table(name).count()
      println(s"[stream] $name rows=$n")
    }
    spark.stop()
  }
}
