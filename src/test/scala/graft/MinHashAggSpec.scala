package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass MinHash UDAF must be bit-identical to the composed
  * numPerm-min-aggregates form it replaces. */
class MinHashAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val numPerm = 16

  test("UDAF signature == composed min(xxhash64(p, h0)) signatures on real docs") {
    val docs = Tables.documents(spark, dir)
    val viaAgg = ops.Dedup.shingleHashes(docs)
      .groupBy(col("doc_id"))
      .agg(expressions.MinHashAgg.minhash_sig(col("h0"), numPerm).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = ops.Dedup.minHashSignatures(docs, numPerm)
      .collect().map(r => r.getLong(0) -> (1 to numPerm).map(r.getLong).toSeq)
      .toMap
    assert(viaAgg.keySet == composed.keySet)
    viaAgg.foreach { case (id, sig) =>
      assert(sig == composed(id), s"doc $id signature mismatch")
    }
  }

  test("SimHashAgg == composed two-stage simHash on real docs") {
    val docs = Tables.documents(spark, dir)
    val viaAgg = ops.Dedup.simHashAgg(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = ops.Dedup.simHash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == composed)
  }

  test("partial/final merge path: multi-partition input gives the same signature") {
    import spark.implicits._
    val hashes = (1L to 10000L).map(h => (1L, h * 2654435761L))
      .toDF("doc_id", "h0").repartition(8)
    val sig = hashes.groupBy(col("doc_id"))
      .agg(expressions.MinHashAgg.minhash_sig(col("h0"), numPerm).as("sig"))
      .head().getSeq[Long](1)
    val single = hashes.coalesce(1).groupBy(col("doc_id"))
      .agg(expressions.MinHashAgg.minhash_sig(col("h0"), numPerm).as("sig"))
      .head().getSeq[Long](1)
    assert(sig == single) // merge order can't matter for elementwise min
    assert(sig.length == numPerm && sig.forall(_ != Long.MaxValue))
  }
}
