package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm the session + table cache
    t("warmup table")(Tables.embeddings(spark, dir).count())
    val corpus = Tables.embeddings(spark, dir).filter(col("vec_id") >= 10)
    val idx = t("buildIndex")(ops.Ann.buildIndex(corpus, nlist = 16))
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    t("search1")(ops.Ann.ivfSearch(spark, idx.assigned, idx.centroids, q, 5, 8).count())
    t("search2")(ops.Ann.ivfSearch(spark, idx.assigned, idx.centroids, q, 5, 8).count())
    t("full query key (memoized)")(SparkEntry.queries("q_vec_ann_ivf")(spark, dir).count())
    spark.stop()
  }
}
