package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (LLM-data pipeline tier).
  *
  * Model: media is an opaque `BINARY` payload column plus a typed
  * metadata struct `(mime STRING, width INT, height INT, duration_ms
  * BIGINT)`. The Spark-side plumbing — schema, partitioning, batch
  * iteration shape — is real; the *decoder* is a clearly-marked
  * deterministic STUB (no image/audio libraries exist in this
  * container). In production the stub body is replaced by a JNI/FFI
  * call (or, in PySpark, `mapInPandas` with PIL/ffmpeg) with the exact
  * same batch signature; nothing else changes.
  *
  * Scale notes: payloads stay columnar-compressed in parquet; decode is
  * a mapPartitions pass (one decoder init per partition, not per row —
  * the same reason mapInPandas batches); feature vectors come out as
  * ArrayType(FloatType) ready for ops.Vectors / ops.Dedup ANN.
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, n_bytes: Long, feature: Array[Float])

  /** Build a media table from documents: the text bytes stand in for an
    * opaque payload (the harness ships no binary media), with plausible
    * typed metadata derived deterministically. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms")).as("meta"))

  /** STUB DECODER — deterministic fake. Replace with a real decoder
    * (libjpeg/ffmpeg via FFI) keeping this exact per-partition batch
    * signature. Emits an 8-dim "feature" from payload bytes. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) { f(i % 8) += (payload(i) & 0xff) / 255.0f; i += 1 }
    f
  }

  /** The real plumbing: partition-wise decode with one "decoder init"
    * per partition (mapPartitions ≙ mapInPandas batching). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder init would happen here, once per partition
        it.map { case (id, bytes) =>
          MediaFeatures(id, bytes.length.toLong, decodeStub(bytes))
        }
      }
  }

  /** Frame sampling: split the payload into `n` equal byte ranges
    * ("frames" — for video this is the keyframe stride, for audio the
    * window hop), emitted one row per frame. Pure column ops: the
    * payload bytes never leave the executor, and the explode keeps the
    * shuffle key narrow (media_id, frame_idx). */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    val len = length(col("payload"))
    media.select(col("media_id"), col("meta"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => substring(col("payload"),
            (i * len / n + 1).cast("int"),
            greatest((len / n).cast("int"), lit(1)))))
          .as(Seq("frame_idx", "frame_bytes")))
  }

  /** "Resize" for feature vectors: average-pool an Array[Float] feature
    * down to `outDim` buckets — the standard embedding-downsample, as a
    * higher-order expression (no UDF). */
  def resizeFeature(feature: org.apache.spark.sql.Column, outDim: Int)
      : org.apache.spark.sql.Column = {
    val f = transform(feature, x => x.cast("double"))
    val n = size(feature)
    transform(sequence(lit(0), lit(outDim - 1)), b => {
      val lo = (b * n / outDim)
      val hi = ((b + 1) * n / outDim)
      aggregate(slice(f, lo + 1, greatest(hi - lo, lit(1))),
        lit(0.0), (acc, x) => acc + x) / greatest(hi - lo, lit(1))
    })
  }

  /** Rows-only queries: media schema → partitioned decode / frame
    * sampling / feature resize. (Oracle-less: the binary/mapPartitions
    * path has no DuckDB analog.) */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> { (s, dir) =>
      val media = mediaTable(s, dir)
      val feats = decodeFeatures(s, media).toDF()
      media.join(feats, "media_id")
        .select(col("media_id"), col("meta.mime").as("mime"),
          col("meta.width").as("width"), col("n_bytes"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"))
        .orderBy(col("media_id"))
    },

    // frame-sample the payload, decode per frame (stub), resize the
    // 8-dim frame feature down to 4 buckets — the full media pipeline
    // shape: sample → decode → pool.
    "q_multimodal_frames" -> { (s, dir) =>
      val frames = frameSample(mediaTable(s, dir), n = 4)
        .withColumn("frame_len", length(col("frame_bytes")).cast("long"))
      frames
        .select(col("media_id"), col("frame_idx"), col("frame_len"),
          round(element_at(
            resizeFeature(transform(sequence(lit(1), col("frame_len")),
              i => (i % 256).cast("float")), 4), 1), 4).as("pooled0"))
        .orderBy(col("media_id"), col("frame_idx"))
    }
  )
}
