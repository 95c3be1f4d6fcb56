package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.VectorExpressions.cosine_sim

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to ops.Dedup's hyperplane LSH (the prompt's "IVF or
  * LSH-bucketed variant"):
  *
  *  1. TRAIN: k-means (seeded, deterministic) over a sample → nlist
  *     coarse centroids — the only driver-held state, O(nlist·dim).
  *  2. INDEX: assign every vector to its nearest centroid (one
  *     broadcast of the centroid array, one codegen'd pass) →
  *     `cell` column; at scale this is also the partition/bucket key,
  *     so a cell's vectors are co-located.
  *  3. PROBE: a query searches only its `nprobe` closest cells —
  *     candidates = nprobe/nlist of the corpus instead of all of it —
  *     then exact cosine within candidates.
  *
  * Recall/latency dial: nprobe (1 = fastest, nlist = exact brute
  * force). Deterministic given the seed; not DuckDB-expressible
  * (k-means) → rows-only query key.
  */
object Ann {

  /** Train centroids; returns (vec_id → cell) assignments plus the
    * centroid table for probing. */
  def ivfIndex(embeddings: DataFrame, nlist: Int, seed: Long = 42L)
      : (DataFrame, Array[Vector]) = {
    val vecs = embeddings
      .withColumn("features", array_to_vector(
        transform(col("embedding"), x => x.cast("double"))))
      .cache() // k-means iterates over this ~6x, then assignment reads it again
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(6)
      .fit(vecs.select("features"))
    val assigned = model.transform(vecs)
      .select(col("vec_id"), col("features"), col("prediction").as("cell"))
    (assigned, model.clusterCenters)
  }

  /** Top-k cosine neighbors per query vector, probing nprobe cells. */
  def ivfSearch(spark: SparkSession, assigned: DataFrame,
                centroids: Array[Vector], queries: DataFrame,
                k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // per query: the nprobe nearest cells (centroid table is tiny →
    // literal array crossed on the driver side of the plan, no shuffle)
    val centArr = centroids.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val centDf = spark.createDataFrame(centArr).toDF("cell", "centroid")
    val qCells = queries
      .crossJoin(broadcast(centDf))
      .withColumn("dist", cosine_sim(col("qv"), col("centroid")))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("dist").desc, col("cell"))))
      .filter(col("cell_rank") <= nprobe)
      .select(col("q_id"), col("qv"), col("cell"))
    // exact cosine only within probed cells
    val cands = assigned
      .select(col("cell"), col("vec_id").as("c_id"),
        vector_to_array(col("features")).as("cv"))
    qCells.join(cands, "cell")
      .withColumn("cos4", round(cosine_sim(col("qv"), col("cv")), 4))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos4").desc, col("c_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cos4"), col("rn").cast("long").as("rn"))
  }

  /** Rows-only query: IVF top-5 for the same 10 queries as q_vec_knn
    * (nlist=16, nprobe=4 → searches ~1/4 of the corpus). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vec_ann_ivf" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val (assigned, centroids) = ivfIndex(e, nlist = 16)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"),
          transform(col("embedding"), x => x.cast("double")).as("qv"))
      ivfSearch(s, assigned.filter(col("vec_id") >= 10), centroids, q,
        k = 5, nprobe = 4)
        .orderBy(col("q_id"), col("rn"))
    }
  )
}
