package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** Salting rewrites must be result-identical to the unsalted forms. */
class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("saltedSum(cents) == plain groupBy sum") {
    val l = Tables.lineitem(spark, dir)
      .withColumn("qc", Det.cents(col("l_quantity")))
    val plain = l.groupBy(col("l_returnflag")).agg(sum(col("qc")).as("sum"))
    val salted = Skew.saltedSum(l, Seq(col("l_returnflag")), col("qc"), 16)
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin == plain join (same row multiset)") {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderstatus")
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = o.join(c, "o_custkey")
    val salted = Skew.saltedJoin(o, c, "o_custkey", 8)
      .select(plain.columns.map(col): _*)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }
}
