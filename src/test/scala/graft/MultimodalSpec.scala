package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth checks for the two multimodal rows-only keys: the
  * plumbing (schema, batch shape, frame math, pooling math) is real
  * and testable even though the decoder itself is a documented stub. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("decode emits exactly one feature row per media row, n_bytes = payload size") {
    val media = ops.Multimodal.mediaTable(spark, dir)
    val feats = ops.Multimodal.decodeFeatures(spark, media).toDF()
    assert(feats.count() == media.count())
    // payload is the UTF-8 text; n_chars counts characters, so bytes ≥ chars
    val bad = feats.join(Tables.documents(spark, dir)
        .select(col("doc_id").as("media_id"), col("n_chars")), "media_id")
      .filter(col("n_bytes") < col("n_chars")).count()
    assert(bad == 0)
  }

  test("stub decoder is deterministic byte-fold: known payload → known feature") {
    val media = Seq((1L, "ab".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val f = ops.Multimodal.decodeFeatures(spark, media).head().feature
    assert(math.abs(f(0) - 'a'.toInt / 255.0f) < 1e-6)
    assert(math.abs(f(1) - 'b'.toInt / 255.0f) < 1e-6)
    assert(f.drop(2).forall(_ == 0.0f))
  }

  test("frame sampling: n rows per media, frames tile the payload (tail may drop)") {
    val media = ops.Multimodal.mediaTable(spark, dir)
    val frames = ops.Multimodal.frameSample(media, n = 4)
      .withColumn("flen", length(col("frame_bytes")).cast("long"))
    assert(frames.count() == media.count() * 4)
    val bad = frames.groupBy("media_id").agg(sum("flen").as("covered"))
      .join(media.select(col("media_id"), length(col("payload")).cast("long").as("plen")),
        "media_id")
      // 4 equal strides cover all but at most 3 remainder bytes
      .filter(col("covered") < col("plen") - 3 || col("covered") > col("plen"))
      .count()
    assert(bad == 0)
  }

  test("resizeFeature average-pools exact bucket means") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f, 7.0f, 8.0f)))
      .toDF("feature")
    val out = df.select(ops.Multimodal.resizeFeature(col("feature"), 4).as("p"))
      .head().getSeq[Double](0)
    assert(out == Seq(1.5, 3.5, 5.5, 7.5))
  }
}
