package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.debug._
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val df = e.withColumn("c", graft.expressions.VectorExpressions.cosine_sim(col("v"), col("v")))
    val code = df.queryExecution.debug.codegenToSeq().map(_._2).mkString("\n")
    println("HAS_LOOP=" + code.contains("java.lang.Math.sqrt"))
    println("ROWS=" + df.filter(col("c") > 0.99).count())
    spark.stop()
  }
}
