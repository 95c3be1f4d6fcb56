package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** The declared batch queries are the fixpoints of the true streaming
  * queries (SURVEY §2.7). Parity laws:
  *  - dedup: identical result sets (keyed dedup has no open-window
  *    state at end-of-stream);
  *  - tumbling: streaming append-mode output = batch output MINUS the
  *    windows the final watermark hasn't passed (still-open tail).
  */
class StreamingParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def runStream(name: String,
                        mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    val q = mk(EventStreams.readEvents(spark, dir)).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("streaming dedup == batch dedup fixpoint") {
    val streamed = runStream("par_dedup", EventStreams.dedup)
      .select("user_id", "event_type", "event_id")
    val batch = SparkEntry.queries("q_stream_dedup")(spark, dir)
      .select("user_id", "event_type", "event_id")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stateful flatMapGroupsWithState sessionization == batch gaps-and-islands") {
    val q = EventStreams.sessionsStateful(spark, EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("append").format("memory")
      .queryName("par_sessions").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("par_sessions")
      .select(col("user_id"),
        date_format(timestamp_micros(col("session_start_us")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(timestamp_micros(col("session_end_us")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("sum_micros"))
    val batch = SparkEntry.queries("q_stream_session")(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events", "sum_micros")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming tumbling = batch tumbling minus still-open tail windows") {
    val streamed = runStream("par_tumbling", EventStreams.tumbling)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("cnt"))
    val batch = SparkEntry.queries("q_stream_tumbling")(spark, dir)
      .select("ws", "cnt")
    // every streamed window matches the batch result exactly...
    assert(streamed.exceptAll(batch).count() == 0)
    // ...and the missing ones are precisely the tail beyond (max ts − 1h watermark)
    val missing = batch.exceptAll(streamed)
    val maxTs = Tables.events(spark, dir).agg(max("ts")).head().getTimestamp(0)
    val tail = missing.filter(
      col("ws") < date_format(lit(maxTs) - expr("INTERVAL 2 HOUR"), "yyyy-MM-dd HH:mm:ss"))
    assert(tail.count() == 0, s"non-tail windows missing from stream")
  }
}
