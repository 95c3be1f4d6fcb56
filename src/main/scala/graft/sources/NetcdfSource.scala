package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** NetCDF ingestion (bcdp R1 analog).
  *
  * The reference loads ensembles of gridded NetCDF files
  * (`open_mfdataset` + filename-template metadata extraction). No
  * NetCDF *library* ships in this offline container — but NetCDF-3
  * CLASSIC is a small public binary spec, so round 2 ships a
  * dependency-free parser ([[NetcdfClassic]]) and [[readClassic]], a
  * REAL distributed loader: Spark's `binaryFile` source hands each
  * task whole files (the per-file granularity NetCDF forces — a
  * multi-TB ensemble is thousands of files, so parallelism comes from
  * the file count, exactly like dask's per-file chunks in the
  * reference), each task parses its file and emits long-form rows, and
  * everything downstream (subset pushdown on the emitted frame,
  * regrid, climatology) is ordinary engine code.
  *
  * NetCDF-4/HDF5 files (magic `\x89HDF`) load through the same
  * pipeline via [[Hdf5Classic]] (r12): superblocks v0–v3, v1 and
  * v2/OHDR object headers, symbol-table and compact-link groups,
  * contiguous/compact/chunked layouts (v1 raw-data-chunk B-tree), and
  * the standard compression pipeline — deflate via the JDK's built-in
  * `java.util.zip.Inflater`, byte shuffle, fletcher32, per-chunk
  * filter masks — all dependency-free, so ordinary compressed
  * netCDF-4 archives load, and (r14) the NBIT and SCALEOFFSET
  * bit-manipulation filters decode too (packed-integer sensor data,
  * D-scaled floats). Only szip (a genuinely native codec) rejects
  * with a NAMED error. [[readGrid]] auto-detects the format per
  * file.
  */
object NetcdfSource {

  final case class GridRow(dataset: String, variable: String,
                           time: java.sql.Timestamp,
                           lat: Double, lon: Double, value: Double)

  /** CF time decoding: "<unit> since <date>[ <time>][ <tz>]" →
    * (epoch-µs base, µs per step). Handles the CF spec's full shape —
    * non-zero-padded dates ("days since 1850-1-1", common in CMIP),
    * fractional seconds, and UTC offsets ("... 15:15:42.5 -6:00", the
    * conventions' own canonical example). */
  private[graft] def cfTimeBase(units: String): (Long, Long) = {
    val re = ("(microseconds|milliseconds|seconds|minutes|hours|days) since " +
      "(\\d{1,4})-(\\d{1,2})-(\\d{1,2})" +
      "(?:[ T](\\d{1,2}):(\\d{2}):(\\d{2})(\\.\\d+)?)?" +
      "(?: ?(Z|UTC|[+-]\\d{1,2}(?::?\\d{2})?))?\\s*").r
    units match {
      case re(u, y, mo, d, h, mi, se, frac, tz) =>
        val ldt = java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt,
          if (h == null) 0 else h.toInt,
          if (mi == null) 0 else mi.toInt,
          if (se == null) 0 else se.toInt)
        val fracUs = if (frac == null) 0L
          else math.round(frac.toDouble * 1000000L)
        // the stated clock is in the given offset; UTC instant = local − offset
        val offsetUs: Long = tz match {
          case null | "Z" | "UTC" => 0L
          case o =>
            val sign = if (o.startsWith("-")) -1L else 1L
            val parts = o.drop(1).split(":")
            val (hh, mm) =
              if (parts.length == 2) (parts(0).toInt, parts(1).toInt)
              else if (parts(0).length > 2)
                (parts(0).dropRight(2).toInt, parts(0).takeRight(2).toInt)
              else (parts(0).toInt, 0)
            sign * (hh * 3600L + mm * 60L) * 1000000L
        }
        val base = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          fracUs - offsetUs
        val step = u match {
          case "microseconds" => 1L
          case "milliseconds" => 1000L
          case "seconds" => 1000000L
          case "minutes" => 60L * 1000000
          case "hours" => 3600L * 1000000
          case "days" => 86400L * 1000000
        }
        (base, step)
      case _ => throw new IllegalArgumentException(
        s"unsupported CF time units '$units'")
    }
  }

  /** Epoch-µs → Timestamp with full microsecond precision (floor
    * semantics for pre-1970 instants — truncating division would shift
    * negative epochs 1 ms late). */
  private def microsToTimestamp(us: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  /** The two self-describing grid container formats behind ONE view:
    * axis names of a variable, raw values, and an attribute lookup.
    * NetCDF-3 names axes via dim ids; NetCDF-4/HDF5 via DIMENSION_LIST
    * dimension scales (see [[Hdf5Classic]]). */
  /** Coordinate-space hyperslab bounds for [[readGrid]] (r13): closed
    * intervals on lat/lon and optional closed time endpoints. The
    * bounded read produces EXACTLY the rows `readGrid(...).filter`
    * would with the same predicates (time bounds drop null-time
    * static-grid rows, matching SQL comparison-with-NULL semantics) —
    * but on chunked/compressed HDF5 the non-intersecting chunks are
    * pruned BEFORE decompression ([[Hdf5Classic.H5File.readSlab]]),
    * the scan-level pushdown a 100-TB `subset(bounds)` needs. */
  final case class GridBounds(
      latMin: Double = Double.NegativeInfinity,
      latMax: Double = Double.PositiveInfinity,
      lonMin: Double = Double.NegativeInfinity,
      lonMax: Double = Double.PositiveInfinity,
      timeMin: Option[java.sql.Timestamp] = None,
      timeMax: Option[java.sql.Timestamp] = None)

  private[sources] sealed trait GridView {
    /** Every dataset/variable name in the file (coordinates included) —
      * the DSv2 source's variable discovery walks this. */
    def varNames: Seq[String]
    def dimsOf(v: String): Seq[String]
    def read(v: String): Array[Double]
    /** Dense row-major hyperslab; `shape` is the variable's full shape
      * (axis lengths the caller already holds). Chunk-pruned for HDF5;
      * decode-then-gather for classic (NetCDF-3 stores uncompressed, so
      * there is no filter work to skip). */
    def readSlab(v: String, starts: Seq[Long], counts: Seq[Long],
                 shape: Seq[Long]): Array[Double]
    def attrs(v: String): Seq[NetcdfClassic.NcAttr]
    final def unitsOf(v: String): Option[String] =
      attrs(v).collectFirst {
        case NetcdfClassic.NcAttr("units", s: String) => s
      }
    /** First value of a numeric attribute (scalar by convention). */
    final def numAttr(v: String, a: String): Option[Double] =
      attrs(v).collectFirst {
        case NetcdfClassic.NcAttr(`a`, ds: Array[Double]) if ds.nonEmpty => ds.head
        case NetcdfClassic.NcAttr(`a`, ls: Array[Long]) if ls.nonEmpty => ls.head.toDouble
      }
  }
  private final class ClassicView(nc: NetcdfClassic.NcFile) extends GridView {
    def varNames: Seq[String] = nc.vars.map(_.name)
    def dimsOf(v: String): Seq[String] =
      nc.variable(v).dimIds.map(nc.dim(_).name)
    def read(v: String): Array[Double] = nc.read(v)
    def readSlab(v: String, starts: Seq[Long], counts: Seq[Long],
                 shape: Seq[Long]): Array[Double] = {
      // r13: true byte-range slab — only the requested elements are
      // decoded (per-run, see NcFile.readHyperslab), the classic-format
      // analog of the HDF5 chunk pruning
      val declared = nc.variable(v).dimIds.map(d =>
        if (nc.dim(d).length == 0) nc.numRecs.toLong else nc.dim(d).length.toLong)
      require(declared == shape,
        s"'$v': caller shape ${shape.mkString("x")} != file shape " +
          declared.mkString("x"))
      nc.readHyperslab(v, starts, counts)
    }
    def attrs(v: String): Seq[NetcdfClassic.NcAttr] = nc.variable(v).attrs
  }
  private final class Hdf5View(h5: Hdf5Classic.H5File) extends GridView {
    def varNames: Seq[String] = h5.vars.map(_.name)
    def dimsOf(v: String): Seq[String] = h5.dimNames(v)
    def read(v: String): Array[Double] = h5.read(v)
    def readSlab(v: String, starts: Seq[Long], counts: Seq[Long],
                 shape: Seq[Long]): Array[Double] = {
      require(h5.variable(v).shape == shape,
        s"'$v': caller shape ${shape.mkString("x")} != file shape " +
          h5.variable(v).shape.mkString("x"))
      h5.readSlab(v, starts, counts)
    }
    def attrs(v: String): Seq[NetcdfClassic.NcAttr] = h5.variable(v).attrs
  }

  private[sources] def openGrid(bytes: Array[Byte]): GridView =
    if (bytes.length >= 4 && bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F')
      new ClassicView(NetcdfClassic.parse(bytes))
    else new Hdf5View(Hdf5Classic.parse(bytes)) // parse names bad magic

  /** Shared long-form emitter: one file's (time,lat,lon) or (lat,lon)
    * variable → GridRow iterator (row-major, records outermost).
    *
    * Applies the CF mask-and-scale conventions the reference applies
    * by default (xarray `open_dataset(mask_and_scale=True)`): cells
    * equal to `_FillValue` (or the legacy `missing_value`) are MISSING
    * and emit NO row — the Spark-native representation of a masked
    * cell, and what makes [[writeGrid]] → read a true inverse on
    * sparse grids — and packed data unpacks as
    * `raw * scale_factor + add_offset` (CMIP obs archives short-pack
    * routinely). */
  private def emitRows(g: GridView, path: String, varName: String,
                       latVar: String, lonVar: String, timeVar: String,
                       bounds: Option[GridBounds] = None): Iterator[GridRow] = {
    val dimNames = g.dimsOf(varName)
    val lats = g.read(latVar)
    val lons = g.read(lonVar)
    val ds = path.substring(path.lastIndexOf('/') + 1)
    val scale = g.numAttr(varName, "scale_factor").getOrElse(1.0)
    val offset = g.numAttr(varName, "add_offset").getOrElse(0.0)
    val fill = g.numAttr(varName, "_FillValue")
      .orElse(g.numAttr(varName, "missing_value"))
    def present(raw: Double): Boolean =
      fill.forall(f => !(raw == f || (f.isNaN && raw.isNaN)))
    // bounds=None keeps the ORIGINAL whole-variable path verbatim: no
    // per-axis predicates (a NaN coordinate still emits — Java's
    // NaN >= -Inf is false, so routing the default through the bounded
    // predicates would silently drop it; r13 review find) and no
    // full-cover gather copy on the hot default scan.
    // With bounds SET, the per-row predicates below match what
    // `readGrid(...).filter` computes on every input including NaN
    // coordinates: Java `NaN >= lo && NaN <= hi` is false, and in
    // Spark's NaN-greatest total order a NaN coordinate passes `>= lo`
    // but fails `<= hi` for every non-NaN hi (+Infinity included) —
    // both drop the row, so the equivalence law holds.
    dimNames match {
      case Seq(`timeVar`, `latVar`, `lonVar`) =>
        val units = g.unitsOf(timeVar)
          .getOrElse(throw new IllegalArgumentException(
            s"time variable '$timeVar' has no units attribute"))
        val (base, step) = cfTimeBase(units)
        val times = g.read(timeVar).map(t =>
          microsToTimestamp(base + math.round(t * step)))
        bounds match {
          case None =>
            val data = g.read(varName)
            for {
              ti <- times.indices.iterator
              li <- lats.indices
              oi <- lons.indices
              raw = data((ti * lats.length + li) * lons.length + oi)
              if present(raw)
            } yield GridRow(ds, varName, times(ti), lats(li), lons(oi),
              raw * scale + offset)
          case Some(b) =>
            // in-bounds index set per axis, and its covering contiguous
            // range: the slab read fetches the cover (exact for the
            // monotonic axes every real grid has), the per-row
            // predicate re-filters exactly, so non-monotonic axes stay
            // CORRECT, just less pruned
            def inLat(i: Int) = lats(i) >= b.latMin && lats(i) <= b.latMax
            def inLon(i: Int) = lons(i) >= b.lonMin && lons(i) <= b.lonMax
            def inT(i: Int) =
              b.timeMin.forall(t => !times(i).before(t)) &&
                b.timeMax.forall(t => !times(i).after(t))
            val laIdx = lats.indices.filter(inLat)
            val loIdx = lons.indices.filter(inLon)
            val tIdx = times.indices.filter(inT)
            if (tIdx.isEmpty || laIdx.isEmpty || loIdx.isEmpty)
              return Iterator.empty
            val (t0, t1) = (tIdx.min, tIdx.max)
            val (a0, a1) = (laIdx.min, laIdx.max)
            val (o0, o1) = (loIdx.min, loIdx.max)
            val (nLa, nLo) = (a1 - a0 + 1, o1 - o0 + 1)
            val data = g.readSlab(varName,
              Seq(t0, a0, o0), Seq(t1 - t0 + 1, nLa, nLo),
              Seq(times.length, lats.length, lons.length))
            for {
              ti <- (t0 to t1).iterator if inT(ti)
              li <- a0 to a1 if inLat(li)
              oi <- o0 to o1 if inLon(oi)
              raw = data(((ti - t0) * nLa + (li - a0)) * nLo + (oi - o0))
              if present(raw)
            } yield GridRow(ds, varName, times(ti), lats(li), lons(oi),
              raw * scale + offset)
        }
      case Seq(`latVar`, `lonVar`) =>
        bounds match {
          case None =>
            val data = g.read(varName)
            for {
              li <- lats.indices.iterator
              oi <- lons.indices
              raw = data(li * lons.length + oi)
              if present(raw)
            } yield GridRow(ds, varName, null, lats(li), lons(oi),
              raw * scale + offset)
          case Some(b) =>
            def inLat(i: Int) = lats(i) >= b.latMin && lats(i) <= b.latMax
            def inLon(i: Int) = lons(i) >= b.lonMin && lons(i) <= b.lonMax
            val laIdx = lats.indices.filter(inLat)
            val loIdx = lons.indices.filter(inLon)
            // a static (lat, lon) field has NULL time: a time bound
            // drops every row, exactly like a SQL comparison with NULL
            if (b.timeMin.nonEmpty || b.timeMax.nonEmpty ||
                laIdx.isEmpty || loIdx.isEmpty)
              return Iterator.empty
            val (a0, a1) = (laIdx.min, laIdx.max)
            val (o0, o1) = (loIdx.min, loIdx.max)
            val (nLa, nLo) = (a1 - a0 + 1, o1 - o0 + 1)
            val data = g.readSlab(varName, Seq(a0, o0), Seq(nLa, nLo),
              Seq(lats.length, lons.length))
            for {
              li <- (a0 to a1).iterator if inLat(li)
              oi <- o0 to o1 if inLon(oi)
              raw = data((li - a0) * nLo + (oi - o0))
              if present(raw)
            } yield GridRow(ds, varName, null, lats(li), lons(oi),
              raw * scale + offset)
        }
      case other => throw new IllegalArgumentException(
        s"unsupported dim layout $other for '$varName' " +
          s"(expected ($timeVar, $latVar, $lonVar) or ($latVar, $lonVar))")
    }
  }

  /** Distributed grid-file ensemble → long-form DataFrame, format
    * auto-detected PER FILE from the magic bytes (a mixed NetCDF-3 /
    * NetCDF-4 archive — common mid-migration — loads in one call).
    * Supports (time, lat, lon) and (lat, lon) variables; `dataset` is
    * the file basename (compose with [[withPathFields]] for template
    * fields). Parallelism comes from the file count, exactly like
    * dask's per-file chunks in the reference.
    *
    * `bounds` (r13) pushes a coordinate hyperslab INTO the scan: rows
    * outside it never materialize, and on chunked/compressed HDF5 the
    * non-intersecting chunks are never even decompressed
    * ([[Hdf5Classic.H5File.readSlab]]) — identical rows to
    * `readGrid(...).filter(...)`, pinned by the NetcdfSpec pruning
    * law, at a fraction of the scan work. */
  def readGrid(spark: SparkSession, pathGlob: String, varName: String,
               latVar: String = "lat", lonVar: String = "lon",
               timeVar: String = "time",
               bounds: Option[GridBounds] = None): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        emitRows(openGrid(bytes), path, varName, latVar, lonVar, timeVar,
          bounds)
      }
      .toDF()
  }

  /** Multi-variable grid load (xarray `Dataset` fidelity: a real CMIP
    * file carries several data variables on shared axes). Each file is
    * parsed ONCE and emits rows for every requested variable; the
    * long-form `variable` column distinguishes them, so downstream
    * per-variable pipelines are ordinary `filter`/`groupBy("variable")`
    * plans. Format auto-detected per file like [[readGrid]]. */
  def readGridVars(spark: SparkSession, pathGlob: String,
                   varNames: Seq[String],
                   latVar: String = "lat", lonVar: String = "lon",
                   timeVar: String = "time",
                   bounds: Option[GridBounds] = None): DataFrame = {
    require(varNames.nonEmpty, "readGridVars needs at least one variable")
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val g = openGrid(bytes)
        varNames.iterator.flatMap(v =>
          emitRows(g, path, v, latVar, lonVar, timeVar, bounds))
      }
      .toDF()
  }

  /** Distributed NetCDF-3 classic → long-form DataFrame (rejects HDF5
    * files with the classic parser's magic error — use [[readHdf5]] or
    * [[readGrid]] for NetCDF-4). */
  def readClassic(spark: SparkSession, pathGlob: String, varName: String,
                  latVar: String = "lat", lonVar: String = "lon",
                  timeVar: String = "time"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        emitRows(new ClassicView(NetcdfClassic.parse(bytes)), path,
          varName, latVar, lonVar, timeVar)
      }
      .toDF()
  }

  /** Distributed NetCDF-4/HDF5 (contiguous, compact, and chunked incl.
    * deflate/shuffle/fletcher32 — see [[Hdf5Classic]] for the precise
    * scope and the remaining named rejections) → long-form DataFrame. */
  def readHdf5(spark: SparkSession, pathGlob: String, varName: String,
               latVar: String = "lat", lonVar: String = "lon",
               timeVar: String = "time"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        emitRows(new Hdf5View(Hdf5Classic.parse(bytes)), path,
          varName, latVar, lonVar, timeVar)
      }
      .toDF()
  }
  val longFormSchema: StructType = StructType(Seq(
    StructField("dataset", StringType),
    StructField("variable", StringType),
    StructField("time", TimestampType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("lev", DoubleType),
    StructField("value", DoubleType),
    StructField("attrs", MapType(StringType, StringType))))

  /** bcdp's `to_netcdf` terminal (the reference pipeline's export
    * step): write a long-form ensemble back out as ONE grid file per
    * member — NetCDF-3 classic or NetCDF-4/HDF5 per `hdf5`.
    *
    * Distributed by the same granularity the READ side uses (one task
    * ⇔ one member's file): `repartition(dataset)` co-locates each
    * member, `sortWithinPartitions` makes members contiguous, and each
    * task streams its partition once, assembling one member grid at a
    * time — peak task memory is ONE member's dense grid, the same
    * bound parsing imposes. `destDir` must be a path every executor
    * can write (shared FS at cluster scale; local FS on local[n]).
    *
    * Grid semantics: axes are the member's distinct sorted lat/lon/
    * time values; cells absent from the input are filled NaN; times
    * are written CF "microseconds since 1970-01-01" (a CF-legal unit;
    * every epoch-µs value below 2^53 ≈ year 2255 is an integral double,
    * so the write→read round-trip is exact at full µs precision — r13,
    * replacing the seconds-with-fraction encoding whose sub-second
    * values drifted ±1 µs past ~2041). A member
    * whose rows ALL have a null time (the (lat, lon) static-grid form
    * emitRows produces) writes a 2-D file; mixing null and non-null
    * times in one member is a caller error, rejected by name, as is a
    * duplicate (time, lat, lon) cell (pass ONE variable at a time — a
    * readGridVars frame must be filtered or pivoted first; silent
    * last-write-wins would lose data). Member tags become file
    * basenames and must be path-safe. */
  /** Sentinel for a null timestamp (2-D static-grid member). */
  private[sources] val NoTime = Long.MinValue

  /** ONE member's on-disk bytes from its long-form cells — the single
    * implementation behind [[writeGrid]] and the DSv2 writer
    * ([[NetcdfV2]]), so a grid-encoding fix can never reach one sink
    * and miss the other. Cells are (epoch-µs | NoTime, lat, lon, value);
    * axes are the distinct sorted coordinates, absent cells NaN-filled
    * and declared `_FillValue` so both mask-and-scale readers drop
    * them (write→read is the identity on sparse grids). */
  private[sources] def buildMemberBytes(
      ds: String, buf: Seq[(Long, Double, Double, Double)],
      varName: String, hdf5: Boolean): Array[Byte] =
    buildMemberBytesMulti(ds,
      buf.map { case (t, la, lo, v) => (varName, t, la, lo, v) }, hdf5)

  /** Multi-variable member (xarray `Dataset` fidelity — the DSv2
    * writer's input is the full long form incl. `variable`): ALL the
    * member's variables share the UNION of the observed axes; cells a
    * variable does not cover stay NaN (= declared fill, masked on
    * read), so write→read is the identity on the long form. */
  private[sources] def buildMemberBytesMulti(
      ds: String, cells: Seq[(String, Long, Double, Double, Double)],
      hdf5: Boolean): Array[Byte] = {
    require(!ds.contains('/') && !ds.contains(java.io.File.separatorChar),
      s"member tag '$ds' is not a path-safe file basename")
    val varNames = cells.map(_._1).distinct.sorted
    varNames.foreach { v =>
      require(v != null && v.nonEmpty && !v.contains('/') &&
        !Seq("time", "lat", "lon").contains(v),
        s"member '$ds': variable name '$v' collides with an axis, is " +
          "empty, or contains '/' (the reader's group separator)")
    }
    val times = cells.map(_._2).distinct.sorted
    val is2d = times == Seq(NoTime)
    require(is2d || !times.contains(NoTime),
      s"member '$ds' mixes null and non-null times — a grid file is " +
        "either a (time, lat, lon) series or a static (lat, lon) field")
    val lats = cells.map(_._3).distinct.sorted
    val lons = cells.map(_._4).distinct.sorted
    val tIx = times.zipWithIndex.toMap
    val laIx = lats.zipWithIndex.toMap
    val loIx = lons.zipWithIndex.toMap
    val nCell = times.length * lats.length * lons.length
    val grids = varNames.map(_ -> Array.fill(nCell)(Double.NaN)).toMap
    val seen = new java.util.HashSet[(String, Integer)](cells.length * 2)
    cells.foreach { case (vn, t, la, lo, v) =>
      val i = (tIx(t) * lats.length + laIx(la)) * lons.length + loIx(lo)
      require(seen.add((vn, i)),
        s"member '$ds' has duplicate rows for one (variable, time, lat, " +
          "lon) cell — last-write-wins would lose data")
      grids(vn)(i) = v
    }
    val (dims, coordVars) =
      if (is2d)
        (Seq(NetcdfClassic.NcDim("lat", lats.length),
          NetcdfClassic.NcDim("lon", lons.length)),
          Seq(
            ("lat", Seq(0),
              Seq(NetcdfClassic.NcAttr("units", "degrees_north")), lats.toArray),
            ("lon", Seq(1),
              Seq(NetcdfClassic.NcAttr("units", "degrees_east")), lons.toArray)))
      else
        (Seq(NetcdfClassic.NcDim("time", times.length),
          NetcdfClassic.NcDim("lat", lats.length),
          NetcdfClassic.NcDim("lon", lons.length)),
          Seq(
            ("time", Seq(0),
              Seq(NetcdfClassic.NcAttr("units", "microseconds since 1970-01-01")),
              times.map(_.toDouble).toArray),
            ("lat", Seq(1),
              Seq(NetcdfClassic.NcAttr("units", "degrees_north")), lats.toArray),
            ("lon", Seq(2),
              Seq(NetcdfClassic.NcAttr("units", "degrees_east")), lons.toArray)))
    // declare the NaN fill so readers (ours via mask-and-scale,
    // xarray via mask_and_scale=True) drop absent cells — the
    // write→read pair is then the identity on SPARSE grids too
    val vars = coordVars ++ varNames.map(vn => (vn, dims.indices.toSeq,
      Seq(NetcdfClassic.NcAttr("_FillValue", Array(Double.NaN))), grids(vn)))
    // r17: HDF5 members ship deflate+shuffle chunked data variables —
    // the real-archive norm (an uncompressed sink pays 3-10×
    // storage/IO at 100 TB). NetCDF-3 classic has no compression in
    // the format; it stays raw by definition.
    if (hdf5) Hdf5Classic.write(dims, vars, compress = true)
    else NetcdfClassic.write(dims, vars)
  }

  def writeGrid(df: DataFrame, destDir: String, varName: String = "value",
                hdf5: Boolean = false): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    new java.io.File(destDir).mkdirs()
    val ext = if (hdf5) "h5" else "nc"
    df.select(col("dataset"), col("time"), col("lat"), col("lon"), col("value"))
      .repartition(col("dataset"))
      .sortWithinPartitions(col("dataset"))
      .foreachPartition { (rows: Iterator[Row]) =>
        def flush(ds: String, buf: Seq[(Long, Double, Double, Double)]): Unit =
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$destDir/$ds.$ext"),
            buildMemberBytes(ds, buf, varName, hdf5))
        var cur: String = null
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Double, Double, Double)]
        rows.foreach { r =>
          val ds = r.getString(0)
          if (ds != cur && cur != null) { flush(cur, buf.toSeq); buf.clear() }
          cur = ds
          val ts = if (r.isNullAt(1)) NoTime
            else r.getTimestamp(1).getTime * 1000L +
              (r.getTimestamp(1).getNanos / 1000L) % 1000L
          buf += ((ts, r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        }
        if (cur != null) flush(cur, buf.toSeq)
      }
  }

  /** Filename-template metadata extraction, e.g.
    * "{model}_{variable}_{start}.nc" — the R1 path-parsing feature as a
    * pure-Column transform usable on any file-based source. */
  def withPathFields(df: DataFrame, pattern: String, fields: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    fields.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
      d.withColumn(f, regexp_extract(input_file_name(), pattern, i + 1))
    }
  }

  /** Long-form parquet fallback (pre-exported NetCDF-4 data, or the
    * output of a one-time `readClassic → parquet` normalization). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(longFormSchema).parquet(path)
}
