package graft.tools
import org.apache.spark.sql.SparkSession
/** Single-key cost attribution: run the named keys IN ARGV ORDER in one
  * fresh JVM, timing each pass. Repeating a key times its warm pass;
  * ordering two keys that share a memoized intermediate (e.g. the md5
  * MinHash candidate cache behind q_dedup_minhash_md5 /
  * q_dedup_clusters_md5) splits first-touch build cost from the key's
  * own work — the attribution WarmProbe's fixed all-keys sweep can't
  * give. SPARK_GRAFT_SF_DIR selects the tier (default sf0.1). */
object KeyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.minPartitionNum", sys.env.getOrElse("GRAFT_MINPART", "1"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[key] ${(System.nanoTime() - t0) / 1e9}%6.2f s  $name ($n rows)")
    }
    spark.stop()
  }
}
