package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** r18 (VERDICT r17 #3): per-batch cost attribution for the
  * q_stream_upsert replay — the single heaviest declared key (5.3 s
  * min-profile). Attaches a StreamingQueryListener BEFORE running the
  * untouched production body (`ops.Streaming.streamUpsertFixpoint`),
  * so the graded path is not instrumented or altered; the listener
  * dumps each micro-batch's durationMs breakdown (triggerExecution,
  * queryPlanning, getBatch, addBatch = the foreachBatch merge+write,
  * walCommit, commitOffsets, ...). Repeats split first-touch
  * (codegen/chunk-write) cost from the steady replay.
  * SPARK_GRAFT_SF_DIR selects the tier (default sf0.1). */
object UpsertProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
        println(s"[upsert-probe] batch=${p.batchId} rows=${p.numInputRows} $d")
      }
    })
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.ops.Streaming.streamUpsertFixpoint(spark, sfDir).count()
      println(f"[upsert-probe] pass $i total ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
