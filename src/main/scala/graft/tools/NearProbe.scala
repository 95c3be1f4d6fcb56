package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object NearProbe {
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
    t("warm documents")(Tables.documents(spark, dir).count())
    t("shingles() count")(ops.Dedup.shingles(Tables.documents(spark, dir)).count())
    // old shape: posexplode + lead window
    t("window-shingles count") {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .withColumn("t1", lead(col("tok"), 1).over(w))
        .withColumn("t2", lead(col("tok"), 2).over(w))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"), col("lang"),
          concat(col("tok"), lit(" "), col("t1"), lit(" "), col("t2")).as("sh"))
        .distinct().count()
    }
    t("nearDuplicates (hash) run1")(ops.Text.nearDuplicates(Tables.documents(spark, dir), 0.8).count())
    t("nearDuplicates (hash) run2")(ops.Text.nearDuplicates(Tables.documents(spark, dir), 0.8).count())
    spark.stop()
  }
}
