package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Zarr v2 LOCAL-STORE reader/writer — the cloud-native chunked-array
  * format modern climate archives (CMIP6 cloud mirrors, Pangeo) are
  * migrating to, completing the grid-format family next to
  * [[NetcdfClassic]] and [[Hdf5Classic]]. Hand-built from the PUBLIC
  * Zarr v2 storage spec (zarr-specs, v2 core protocol: per-array
  * `.zarray` JSON metadata + C-order chunk files named by dot-joined
  * grid indices, missing chunks ≡ fill_value) the way Hdf5Classic
  * derives from the HDF5 format spec; the xarray interop conventions
  * (`_ARRAY_DIMENSIONS` in `.zattrs`, CF time units) follow xarray's
  * public Zarr encoding, so an xarray-written store reads and our
  * stores read back in xarray.
  *
  * Scope — named rejections, never a silent wrong read:
  *  - compressor: null (raw), `zlib`, `gzip` (both JDK-decodable).
  *    `blosc` — numcodecs' default, a natively-framed codec — rejects
  *    BY NAME (write with `{"id": "zlib"}` for JVM interop).
  *  - filters: none (a non-empty chain rejects by name)
  *  - order: "C" only; dimension_separator: "." only
  *  - dtype: f8/f4, i1/i2/i4/i8, u1 in either endianness; strings,
  *    complex, and datetime dtypes reject by name
  *
  * Scale shape mirrors the HDF5 reader: metadata + coordinate axes
  * are driver-side planning data (axis-sized, the NcCatalog
  * allowlist); the DATA chunks are listed by pure name arithmetic —
  * bounds prune non-intersecting chunks from the manifest WITHOUT
  * opening them — and decoded one task per chunk through the
  * binaryFile source, so parallelism is the chunk grid, exactly the
  * unit dask assigns. */
object ZarrStore {

  // ---------- minimal JSON (objects, arrays, strings, numbers,
  // true/false/null — the full grammar a .zarray file can use) -------
  private[graft] object ZJson {
    def parse(s: String): Any = {
      val p = new P(s); val v = p.value(); p.ws()
      require(p.i >= s.length, s"trailing JSON content at ${p.i}")
      v
    }
    private final class P(val s: String) {
      var i = 0
      def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      def value(): Any = {
        ws()
        require(i < s.length, "unexpected end of JSON")
        s.charAt(i) match {
          case '{' => obj()
          case '[' => arr()
          case '"' => str()
          case 't' => lit("true", true)
          case 'f' => lit("false", false)
          case 'n' => lit("null", null)
          case _ => num()
        }
      }
      def lit(w: String, v: Any): Any = {
        require(s.regionMatches(i, w, 0, w.length), s"bad JSON literal at $i")
        i += w.length; v
      }
      def obj(): Map[String, Any] = {
        i += 1; ws()
        val b = scala.collection.mutable.LinkedHashMap.empty[String, Any]
        if (i < s.length && s.charAt(i) == '}') { i += 1; return b.toMap }
        while (true) {
          ws(); val k = str(); ws()
          require(s.charAt(i) == ':', s"expected ':' at $i"); i += 1
          b(k) = value(); ws()
          s.charAt(i) match {
            case ',' => i += 1
            case '}' => i += 1; return b.toMap
            case c => throw new IllegalArgumentException(s"bad JSON object char '$c' at $i")
          }
        }
        b.toMap
      }
      def arr(): Vector[Any] = {
        i += 1; ws()
        val b = Vector.newBuilder[Any]
        if (i < s.length && s.charAt(i) == ']') { i += 1; return b.result() }
        while (true) {
          b += value(); ws()
          s.charAt(i) match {
            case ',' => i += 1
            case ']' => i += 1; return b.result()
            case c => throw new IllegalArgumentException(s"bad JSON array char '$c' at $i")
          }
        }
        b.result()
      }
      def str(): String = {
        require(s.charAt(i) == '"', s"expected string at $i"); i += 1
        val b = new StringBuilder
        while (s.charAt(i) != '"') {
          if (s.charAt(i) == '\\') {
            i += 1
            s.charAt(i) match {
              case '"' => b += '"'; case '\\' => b += '\\'
              case '/' => b += '/'; case 'b' => b += '\b'
              case 'f' => b += '\f'; case 'n' => b += '\n'
              case 'r' => b += '\r'; case 't' => b += '\t'
              case 'u' =>
                b += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
                i += 4
              case c => throw new IllegalArgumentException(s"bad escape '\\$c'")
            }
          } else b += s.charAt(i)
          i += 1
        }
        i += 1; b.result()
      }
      def num(): Double = {
        val st = i
        while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
        s.substring(st, i).toDouble
      }
    }

    /** Pre-rendered JSON spliced verbatim (nested objects). */
    final case class Raw(json: String)

    /** Deterministic rendering (insertion order of the Seq). */
    def render(v: Any): String = v match {
      case null => "null"
      case Raw(j) => j
      case b: Boolean => b.toString
      case s: String => "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case '\n' => "\\n"; case c => c.toString } + "\""
      case i: Int => i.toString
      case l: Long => l.toString
      case d: Double =>
        if (d.isNaN) "\"NaN\""
        else if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString
        else d.toString
      case xs: Seq[_] => xs.map(render).mkString("[", ", ", "]")
      case _ => throw new IllegalArgumentException(s"unrenderable $v")
    }
    def renderObj(fields: Seq[(String, Any)]): String =
      fields.map { case (k, v) => render(k) + ": " + render(v) }
        .mkString("{", ", ", "}")
  }

  // ---------- .zarray metadata --------------------------------------
  final case class ZArrayMeta(shape: Seq[Int], chunks: Seq[Int],
                              dtype: String, compressor: Option[String],
                              fill: Option[Double]) {
    def rank: Int = shape.length
    def chunkElems: Int = chunks.product
    /** chunk-grid extent per axis: ceil(shape/chunks). */
    def gridShape: Seq[Int] =
      shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
  }

  private[graft] def parseArrayMeta(json: String): ZArrayMeta = {
    val m = ZJson.parse(json).asInstanceOf[Map[String, Any]]
    require(m.get("zarr_format").contains(2.0),
      s"unsupported zarr_format ${m.get("zarr_format")} (v2 only)")
    val shape = m("shape").asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Double].toInt)
    val chunks = m("chunks").asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Double].toInt)
    require(shape.length == chunks.length && chunks.forall(_ > 0),
      s"shape/chunks mismatch: $shape vs $chunks")
    val dtype = m("dtype").asInstanceOf[String]
    require(dtype.length == 3 && "<>|".contains(dtype.charAt(0)) &&
      Set("f8", "f4", "i8", "i4", "i2", "i1", "u1")
        .contains(dtype.substring(1)),
      s"unsupported zarr dtype '$dtype' (numeric f/i/u only)")
    val comp = m.getOrElse("compressor", null) match {
      case null => None
      case c: Map[String, Any] @unchecked =>
        val id = c.getOrElse("id", "?").asInstanceOf[String]
        require(id == "zlib" || id == "gzip",
          s"unsupported zarr compressor '$id' (null/zlib/gzip only — " +
            "blosc is a native codec; re-encode with zlib for JVM interop)")
        Some(id)
    }
    m.getOrElse("filters", null) match {
      case null =>
      case f: Vector[Any] @unchecked if f.isEmpty =>
      case f => throw new IllegalArgumentException(
        s"unsupported zarr filter chain $f (none supported)")
    }
    val order = m.getOrElse("order", "C")
    require(order == "C", s"unsupported zarr order '$order' (C only)")
    val sep = m.getOrElse("dimension_separator", ".")
    require(sep == ".",
      s"unsupported dimension_separator '$sep' ('.' only)")
    val fill = m.getOrElse("fill_value", null) match {
      case null => None
      case d: Double => Some(d)
      case "NaN" => Some(Double.NaN)
      case "Infinity" => Some(Double.PositiveInfinity)
      case "-Infinity" => Some(Double.NegativeInfinity)
      case other => throw new IllegalArgumentException(
        s"unsupported fill_value $other")
    }
    ZArrayMeta(shape, chunks, dtype, comp, fill)
  }

  // ---------- chunk codec -------------------------------------------
  private[sources] def decompress(bytes: Array[Byte],
                                  compressor: Option[String],
                                  rawLen: Int): Array[Byte] =
    compressor match {
      case None => bytes
      case Some("zlib") =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(bytes)
        val out = new Array[Byte](rawLen)
        var off = 0
        while (off < rawLen && !inf.finished()) {
          val n = inf.inflate(out, off, rawLen - off)
          require(n > 0 || inf.finished(), "truncated zlib chunk")
          off += n
        }
        inf.end()
        require(off == rawLen, s"zlib chunk inflated to $off, want $rawLen")
        out
      case Some("gzip") =>
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val out = new Array[Byte](rawLen)
        var off = 0
        var n = 0
        while (off < rawLen && n >= 0) {
          n = in.read(out, off, rawLen - off)
          if (n > 0) off += n
        }
        require(off == rawLen, s"gzip chunk yielded $off, want $rawLen")
        out
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported compressor $other")
    }

  private def elemSize(dtype: String): Int = dtype.substring(2).toInt

  /** Decode one (decompressed) chunk to doubles in C order. */
  private[sources] def decodeChunk(raw: Array[Byte],
                                   meta: ZArrayMeta): Array[Double] = {
    val es = elemSize(meta.dtype)
    val n = meta.chunkElems
    require(raw.length >= n * es,
      s"chunk holds ${raw.length} bytes, want ${n * es}")
    val bb = ByteBuffer.wrap(raw).order(
      if (meta.dtype.charAt(0) == '>') ByteOrder.BIG_ENDIAN
      else ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](n)
    meta.dtype.substring(1) match {
      case "f8" => var i = 0; while (i < n) { out(i) = bb.getDouble(i * 8); i += 1 }
      case "f4" => var i = 0; while (i < n) { out(i) = bb.getFloat(i * 4).toDouble; i += 1 }
      case "i8" => var i = 0; while (i < n) { out(i) = bb.getLong(i * 8).toDouble; i += 1 }
      case "i4" => var i = 0; while (i < n) { out(i) = bb.getInt(i * 4).toDouble; i += 1 }
      case "i2" => var i = 0; while (i < n) { out(i) = bb.getShort(i * 2).toDouble; i += 1 }
      case "i1" => var i = 0; while (i < n) { out(i) = raw(i).toDouble; i += 1 }
      case "u1" => var i = 0; while (i < n) { out(i) = (raw(i) & 0xff).toDouble; i += 1 }
    }
    out
  }

  private[sources] def compressZlib(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    // stored-block worst case: deflate can expand ~5 bytes / 16 KiB
    val buf = new Array[Byte](raw.length + raw.length / 1000 + 64)
    val n = d.deflate(buf)
    require(d.finished(), "deflate buffer undersized")
    d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  // ---------- driver-side store access ------------------------------
  private def readFile(p: String): Array[Byte] = Files.readAllBytes(Paths.get(p))
  private def readText(p: String): String =
    new String(readFile(p), java.nio.charset.StandardCharsets.UTF_8)

  private[graft] def arrayMeta(store: String, name: String): ZArrayMeta =
    parseArrayMeta(readText(s"$store/$name/.zarray"))

  /** `.zattrs` of one array (empty map when absent). */
  private[sources] def arrayAttrs(store: String, name: String): Map[String, Any] = {
    val p = Paths.get(s"$store/$name/.zattrs")
    if (Files.exists(p)) ZJson.parse(readText(p.toString))
      .asInstanceOf[Map[String, Any]]
    else Map.empty
  }

  /** Read a full (small — coordinate-axis-sized) 1-D array driver-side. */
  private[sources] def read1D(store: String, name: String): Array[Double] = {
    val meta = arrayMeta(store, name)
    require(meta.rank == 1, s"$name is not 1-D")
    val es = elemSize(meta.dtype)
    val out = new Array[Double](meta.shape.head)
    val nChunks = meta.gridShape.head
    for (ci <- 0 until nChunks) {
      val p = Paths.get(s"$store/$name/$ci")
      if (Files.exists(p)) {
        val vals = decodeChunk(
          decompress(readFile(p.toString), meta.compressor,
            meta.chunkElems * es), meta)
        var k = 0
        while (k < meta.chunks.head && ci * meta.chunks.head + k < out.length) {
          out(ci * meta.chunks.head + k) = vals(k); k += 1
        }
      } else {
        val f = meta.fill.getOrElse(throw new IllegalArgumentException(
          s"$name: chunk $ci missing and fill_value is null"))
        var k = 0
        while (k < meta.chunks.head && ci * meta.chunks.head + k < out.length) {
          out(ci * meta.chunks.head + k) = f; k += 1
        }
      }
    }
    out
  }

  /** The chunk files of `name` that can intersect `keep` (per-axis
    * boolean keep masks over global indices) — PURE NAME ARITHMETIC:
    * a chunk outside the kept hyperslab is pruned from the manifest
    * without ever being opened. */
  private[graft] def planChunks(store: String, name: String,
                                meta: ZArrayMeta,
                                keep: Seq[Array[Boolean]]): Seq[String] = {
    require(keep.length == meta.rank, "one keep mask per axis")
    // per axis: which chunk indices contain at least one kept element
    val chunkKeep: Seq[Array[Boolean]] = meta.shape.indices.map { ax =>
      val ck = new Array[Boolean](meta.gridShape(ax))
      var g = 0
      while (g < meta.shape(ax)) {
        if (keep(ax)(g)) ck(g / meta.chunks(ax)) = true
        g += 1
      }
      ck
    }
    def rec(ax: Int, prefix: List[Int]): Seq[Seq[Int]] =
      if (ax == meta.rank) Seq(prefix.reverse)
      else (0 until meta.gridShape(ax)).filter(chunkKeep(ax))
        .flatMap(ci => rec(ax + 1, ci :: prefix))
    rec(0, Nil).map(ix => s"$store/$name/${ix.mkString(".")}")
  }

  private def keepAll(n: Int): Array[Boolean] = Array.fill(n)(true)

  // ---------- distributed grid read ---------------------------------
  /** Zarr store → long-form DataFrame, the [[NetcdfSource.readGrid]]
    * twin: supports (time, lat, lon) and (lat, lon) variables (axis
    * names from the xarray `_ARRAY_DIMENSIONS` attribute), CF time
    * units on the time axis, mask-and-scale semantics (fill_value and
    * NaN cells drop; `scale_factor`/`add_offset` honored), and
    * `bounds` pruning that removes non-intersecting CHUNKS from the
    * manifest before anything is opened. One task per surviving
    * chunk. */
  def readGrid(spark: SparkSession, storePath: String, varName: String,
               bounds: Option[NetcdfSource.GridBounds] = None): DataFrame = {
    import spark.implicits._
    val store = storePath.stripSuffix("/")
    val ds = store.substring(store.lastIndexOf('/') + 1)
    val meta = arrayMeta(store, varName)
    val attrs = arrayAttrs(store, varName)
    val dims = attrs.get("_ARRAY_DIMENSIONS") match {
      case Some(v: Vector[Any] @unchecked) => v.map(_.asInstanceOf[String])
      case _ => if (meta.rank == 3) Seq("time", "lat", "lon")
                else Seq("lat", "lon")
    }
    require(meta.rank == 2 || meta.rank == 3,
      s"$varName is ${meta.rank}-D (grid reads support 2-D/3-D)")
    val lats = read1D(store, dims(meta.rank - 2))
    val lons = read1D(store, dims(meta.rank - 1))
    val timesMicros: Array[Long] =
      if (meta.rank == 3) {
        val tName = dims.head
        val units = arrayAttrs(store, tName).get("units") match {
          case Some(u: String) => u
          case _ => throw new IllegalArgumentException(
            s"time axis '$tName' has no CF units attribute")
        }
        val (base, step) = NetcdfSource.cfTimeBase(units)
        read1D(store, tName).map(t => base + math.round(t * step))
      } else Array.emptyLongArray
    val scale = attrs.get("scale_factor") match {
      case Some(d: Double) => d; case _ => 1.0 }
    val offset = attrs.get("add_offset") match {
      case Some(d: Double) => d; case _ => 0.0 }
    val fill = meta.fill

    val b = bounds.getOrElse(NetcdfSource.GridBounds())
    def inT(us: Long): Boolean =
      b.timeMin.forall(t => us >= t.getTime * 1000L +
        (t.getNanos / 1000 % 1000)) &&
        b.timeMax.forall(t => us <= t.getTime * 1000L +
          (t.getNanos / 1000 % 1000))
    val keep: Seq[Array[Boolean]] = {
      val kLat =
        if (bounds.isEmpty) keepAll(lats.length)
        else lats.map(v => v >= b.latMin && v <= b.latMax)
      val kLon =
        if (bounds.isEmpty) keepAll(lons.length)
        else lons.map(v => v >= b.lonMin && v <= b.lonMax)
      if (meta.rank == 3) {
        val kT = if (bounds.isEmpty) keepAll(timesMicros.length)
                 else timesMicros.map(inT)
        Seq(kT, kLat, kLon)
      } else Seq(kLat, kLon)
    }
    val candidates = planChunks(store, varName, meta, keep)
    // a missing chunk is ALL fill_value — legal (and masked out below)
    // only when the array declares a fill; with fill null it's a
    // corrupt store, rejected by name
    val (paths, missing) =
      candidates.partition(p => Files.exists(Paths.get(p)))
    require(missing.isEmpty || meta.fill.isDefined,
      s"$varName: ${missing.length} chunk file(s) missing (e.g. " +
        s"${missing.head}) and fill_value is null")
    if (paths.isEmpty)
      return spark.emptyDataset[NetcdfSource.GridRow].toDF()

    val chunks = meta.chunks
    val shape = meta.shape
    val comp = meta.compressor
    val rank = meta.rank
    val es = elemSize(meta.dtype)
    val m = meta
    // axis-sized state rides as ONE broadcast, not a task-closure
    // capture: with one task per chunk, a captured time axis (~10⁷
    // steps on a long climate record = ~80 MB of longs) would be
    // re-serialized into EVERY task; a broadcast ships it once per
    // executor (ADVICE r17 self-review item, applied this round).
    val sc = spark.sparkContext
    val axesB = sc.broadcast((lats, lons, timesMicros, keep))
    spark.read.format("binaryFile").load(paths: _*)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val (lats, lons, timesMicros, keep) = axesB.value
        val cix = path.substring(path.lastIndexOf('/') + 1)
          .split('.').map(_.toInt)
        val vals = decodeChunk(decompress(bytes, comp, m.chunkElems * es), m)
        val rows = Iterator.range(0, vals.length).flatMap { li =>
          // local C-order index → per-axis local then global indices
          var rem = li
          val g = new Array[Int](rank)
          var ax = rank - 1
          while (ax >= 0) {
            g(ax) = cix(ax) * chunks(ax) + rem % chunks(ax)
            rem /= chunks(ax)
            ax -= 1
          }
          val inShape = (0 until rank).forall(a => g(a) < shape(a))
          if (!inShape) Iterator.empty
          else {
            val raw = vals(li)
            val masked = raw.isNaN ||
              fill.exists(f => raw == f || (f.isNaN && raw.isNaN))
            val kept = (0 until rank).forall(a => keep(a)(g(a)))
            if (masked || !kept) Iterator.empty
            else {
              val (ti, la, lo) =
                if (rank == 3) (g(0), g(1), g(2)) else (-1, g(0), g(1))
              val ts =
                if (ti < 0) null
                else {
                  val us = timesMicros(ti)
                  val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
                  t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
                  t
                }
              Iterator.single(NetcdfSource.GridRow(ds, varName, ts,
                lats(la), lons(lo), raw * scale + offset))
            }
          }
        }
        rows
      }
      .toDF()
  }

  // ---------- write path --------------------------------------------
  private def writeArray(dir: java.io.File, dtype: String,
                         shape: Seq[Int], chunks: Seq[Int],
                         dims: Seq[String], fillNaN: Boolean,
                         extraAttrs: Seq[(String, Any)],
                         chunkBytes: Seq[(Seq[Int], Array[Byte])]): Unit = {
    dir.mkdirs()
    val metaJson = ZJson.renderObj(Seq(
      "zarr_format" -> 2,
      "shape" -> shape,
      "chunks" -> chunks,
      "dtype" -> dtype,
      // zlib on every array we write: the JVM-interop codec
      "compressor" -> ZJson.Raw("{\"id\": \"zlib\", \"level\": 6}"),
      "fill_value" -> (if (fillNaN) Double.NaN else null),
      "order" -> "C",
      "filters" -> null))
    Files.write(dir.toPath.resolve(".zarray"),
      metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val attrsJson = ZJson.renderObj(
      ("_ARRAY_DIMENSIONS" -> (dims: Any)) +: extraAttrs)
    Files.write(dir.toPath.resolve(".zattrs"),
      attrsJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    chunkBytes.foreach { case (ix, raw) =>
      Files.write(dir.toPath.resolve(ix.mkString(".")), compressZlib(raw))
    }
  }

  private def doubleBytes(v: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(v.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    v.foreach(bb.putDouble); bb.array()
  }
  private def longBytes(v: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(v.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    v.foreach(bb.putLong); bb.array()
  }

  /** ONE member's Zarr store from its long-form cells — the
    * [[NetcdfSource.buildMemberBytes]] twin: axes are the distinct
    * sorted coordinates, absent cells NaN (= the declared fill, so
    * write→read is the identity on sparse grids), times stored as
    * epoch-µs `<i8` with CF units, data chunked one-time-step-per-
    * chunk (`(1, nlat, nlon)`) so a time-bounded read prunes whole
    * chunk files, everything zlib level 6. */
  private[sources] def writeMemberStore(
      destDir: String, ds: String,
      cells: Seq[(Long, Double, Double, Double)], varName: String): Unit = {
    require(!ds.contains('/') && !ds.contains(java.io.File.separatorChar),
      s"member tag '$ds' is not a path-safe store basename")
    require(varName.nonEmpty && !varName.contains('/') &&
      !Seq("time", "lat", "lon").contains(varName),
      s"variable name '$varName' collides with an axis or contains '/'")
    val times = cells.map(_._1).distinct.sorted
    val is2d = times == Seq(NetcdfSource.NoTime)
    require(is2d || !times.contains(NetcdfSource.NoTime),
      s"member '$ds' mixes null and non-null times")
    val lats = cells.map(_._2).distinct.sorted
    val lons = cells.map(_._3).distinct.sorted
    val tIx = times.zipWithIndex.toMap
    val laIx = lats.zipWithIndex.toMap
    val loIx = lons.zipWithIndex.toMap
    val nPlane = lats.length * lons.length
    val grid = Array.fill((if (is2d) 1 else times.length) * nPlane)(Double.NaN)
    val seen = new java.util.HashSet[Integer](cells.length * 2)
    cells.foreach { case (t, la, lo, v) =>
      val ti = if (is2d) 0 else tIx(t)
      val i = (ti * lats.length + laIx(la)) * lons.length + loIx(lo)
      require(seen.add(i),
        s"member '$ds' has duplicate rows for one (time, lat, lon) cell")
      grid(i) = v
    }
    val root = new java.io.File(destDir, s"$ds.zarr")
    root.mkdirs()
    Files.write(root.toPath.resolve(".zgroup"),
      "{\"zarr_format\": 2}".getBytes)
    Files.write(root.toPath.resolve(".zattrs"), "{}".getBytes)
    writeArray(new java.io.File(root, "lat"), "<f8",
      Seq(lats.length), Seq(lats.length), Seq("lat"), fillNaN = false,
      Seq("units" -> "degrees_north"),
      Seq(Seq(0) -> doubleBytes(lats.toArray)))
    writeArray(new java.io.File(root, "lon"), "<f8",
      Seq(lons.length), Seq(lons.length), Seq("lon"), fillNaN = false,
      Seq("units" -> "degrees_east"),
      Seq(Seq(0) -> doubleBytes(lons.toArray)))
    if (is2d)
      writeArray(new java.io.File(root, varName), "<f8",
        Seq(lats.length, lons.length), Seq(lats.length, lons.length),
        Seq("lat", "lon"), fillNaN = true, Seq.empty,
        Seq(Seq(0, 0) -> doubleBytes(grid)))
    else {
      writeArray(new java.io.File(root, "time"), "<i8",
        Seq(times.length), Seq(times.length), Seq("time"), fillNaN = false,
        Seq("units" -> "microseconds since 1970-01-01"),
        Seq(Seq(0) -> longBytes(times.toArray)))
      writeArray(new java.io.File(root, varName), "<f8",
        Seq(times.length, lats.length, lons.length),
        Seq(1, lats.length, lons.length),
        Seq("time", "lat", "lon"), fillNaN = true, Seq.empty,
        times.indices.map(ti => Seq(ti, 0, 0) ->
          doubleBytes(java.util.Arrays.copyOfRange(
            grid, ti * nPlane, (ti + 1) * nPlane))))
    }
  }

  /** bcdp's `to_zarr`-style terminal: one Zarr store per member, the
    * [[NetcdfSource.writeGrid]] skeleton (repartition by member, one
    * task assembles one member's dense grid — peak task memory is one
    * member, the same bound the read side imposes). */
  def writeGrid(df: DataFrame, destDir: String,
                varName: String = "value"): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    new java.io.File(destDir).mkdirs()
    df.select(col("dataset"), col("time"), col("lat"), col("lon"),
        col("value"))
      .repartition(col("dataset"))
      .sortWithinPartitions(col("dataset"))
      .foreachPartition { (rows: Iterator[Row]) =>
        var cur: String = null
        var buf = Vector.empty[(Long, Double, Double, Double)]
        def flush(): Unit = if (cur != null) {
          writeMemberStore(destDir, cur, buf, varName)
          buf = Vector.empty
        }
        rows.foreach { r =>
          val ds = r.getString(0)
          if (ds != cur) { flush(); cur = ds }
          val t = if (r.isNullAt(1)) NetcdfSource.NoTime
            else r.getTimestamp(1).getTime * 1000L +
              (r.getTimestamp(1).getNanos / 1000L) % 1000L
          buf :+= ((t, r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        }
        flush()
      }
  }
}
