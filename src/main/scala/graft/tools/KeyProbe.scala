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
    // validate BEFORE building the session: a typo'd key used to throw a
    // bare NoSuchElementException after the full JVM/Spark spin-up with
    // no hint of valid names (r11 review advice)
    val known = graft.SparkEntry.queries.keySet
    val unknown = args.filterNot(known)
    if (unknown.nonEmpty) {
      unknown.foreach { u =>
        val close = known.toSeq.sorted
          .filter(k => k.contains(u.stripPrefix("q_")) || u.contains(k.stripPrefix("q_")))
          .take(5)
        System.err.println(s"unknown key '$u'" +
          (if (close.nonEmpty) s" — did you mean: ${close.mkString(", ")}?" else ""))
      }
      System.err.println(s"available keys:\n  ${known.toSeq.sorted.mkString("\n  ")}")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // mirror Bench's session exactly (same SPARK_GRAFT_CPUS contract,
    // no extra confs by default) so attributions reproduce what the
    // bench actually pays; GRAFT_MINPART optionally forces
    // spark.sql.files.minPartitionNum for input-split experiments
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("GRAFT_MINPART")
      .fold(b0)(n => b0.config("spark.sql.files.minPartitionNum", n))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[key] ${(System.nanoTime() - t0) / 1e9}%6.2f s  $name ($n rows)")
    }
    spark.stop()
  }
}
