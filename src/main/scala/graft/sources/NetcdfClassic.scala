package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Dependency-free reader/writer for NetCDF-3 CLASSIC files — the
  * format every CMIP/obs archive can emit and the one bcdp's
  * `open_mfdataset` reads most often. The classic format is a small,
  * stable, public specification (Unidata "NetCDF Classic Format Spec"):
  * a big-endian header (magic `CDF\x01`/`\x02`, dim list, attribute
  * list, variable list with data offsets) followed by row-major
  * big-endian array data, 4-byte aligned. No library needed — this
  * parser is ~200 lines, which is why it can ship in an offline
  * container where netcdf-java cannot.
  *
  * Scope: full header (v1 4-byte and v2 8-byte offsets), all six
  * classic types (byte, char, short, int, float, double), fixed AND
  * record variables (including the single-record-variable no-padding
  * special case). NetCDF-4/HDF5 is out of scope (that genuinely needs
  * the HDF5 library); writer emits v1 fixed-size files — enough to
  * round-trip grids and to produce test fixtures.
  */
object NetcdfClassic {

  final case class NcDim(name: String, length: Int) // length 0 = record dim
  final case class NcAttr(name: String, values: Any) // String | Array[String] (HDF5 rank>0 vlen-string) | Array[Double] | Array[Long] | Hdf5Classic.H5Refs
  final case class NcVar(name: String, dimIds: Seq[Int], attrs: Seq[NcAttr],
                         ncType: Int, vsize: Int, begin: Long)
  final case class NcFile(numRecs: Int, dims: Seq[NcDim], gattrs: Seq[NcAttr],
                          vars: Seq[NcVar], bytes: Array[Byte]) {
    def dim(id: Int): NcDim = dims(id)
    def variable(name: String): NcVar = vars.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"no variable '$name'; file has ${vars.map(_.name).mkString(", ")}"))

    /** All values of a variable as doubles (row-major, records first). */
    def read(name: String): Array[Double] = {
      val v = variable(name)
      val isRecord = v.dimIds.headOption.exists(d => dims(d).length == 0)
      val fixedShape = v.dimIds.map(dims(_).length).filter(_ > 0)
      val perSlab = fixedShape.product max 1
      if (!isRecord) {
        readSlab(v.begin, v.ncType, perSlab)
      } else {
        // record data: one slab per record at begin + r * recSize;
        // recSize = Σ record-var vsizes, EXCEPT with exactly one record
        // variable, where the slab is unpadded (spec special case)
        val recVars = vars.filter(_.dimIds.headOption.exists(d => dims(d).length == 0))
        val recSize =
          if (recVars.length == 1) typeSize(v.ncType) * perSlab
          else recVars.map(_.vsize).sum
        val out = new Array[Double](numRecs * perSlab)
        var r = 0
        while (r < numRecs) {
          val slab = readSlab(v.begin + r.toLong * recSize, v.ncType, perSlab)
          System.arraycopy(slab, 0, out, r * perSlab, perSlab)
          r += 1
        }
        out
      }
    }

    /** Hyperslab read (r13): decode ONLY the requested elements — the
      * slab is a set of contiguous innermost-dimension runs, each
      * decoded straight from its byte range, so a bounds subset of a
      * large classic file never pays the per-element decode of
      * out-of-slab cells (the classic-format analog of the HDF5
      * reader's chunk pruning; there is no compression here, decode IS
      * the scan cost). Row-major, records outermost, identical values
      * to read-then-slice. */
    def readHyperslab(name: String, starts: Seq[Long],
                      counts: Seq[Long]): Array[Double] = {
      val v = variable(name)
      val isRecord = v.dimIds.headOption.exists(d => dims(d).length == 0)
      val shape: Seq[Long] = v.dimIds.map(d =>
        if (dims(d).length == 0) numRecs.toLong else dims(d).length.toLong)
      val rank = shape.length
      require(starts.length == rank && counts.length == rank,
        s"'$name': slab rank ${starts.length}/${counts.length} != $rank")
      (0 until rank).foreach(d => require(starts(d) >= 0 && counts(d) >= 0 &&
        starts(d) + counts(d) <= shape(d),
        s"'$name': slab [${starts(d)}, ${starts(d) + counts(d)}) out of " +
          s"bounds for dim $d of length ${shape(d)}"))
      if (rank == 0) return readSlab(v.begin, v.ncType, 1)
      require(counts.product <= Int.MaxValue,
        s"'$name': slab of ${counts.product} elements exceeds the 2^31 " +
          "in-memory limit (read a smaller hyperslab)") // r14, ADVICE r13
      val nOut = counts.product.toInt
      val out = new Array[Double](nOut)
      if (nOut == 0) return out
      val ts = typeSize(v.ncType)
      // element strides WITHIN one record block (dims 1..rank-1 for a
      // record var; all dims otherwise)
      val innerFrom = if (isRecord) 1 else 0
      val estride = new Array[Long](rank)
      var acc = 1L
      for (d <- (rank - 1) to innerFrom by -1) { estride(d) = acc; acc *= shape(d) }
      val recSize: Long = if (!isRecord) 0L else {
        val recVars = vars.filter(_.dimIds.headOption.exists(d => dims(d).length == 0))
        val perSlab = (innerFrom until rank).foldLeft(1L)((a, d) => a * shape(d))
        if (recVars.length == 1) ts * perSlab else recVars.map(_.vsize.toLong).sum
      }
      // a rank-1 RECORD variable's elements are NOT contiguous when
      // other record variables interleave (stride = recSize between
      // consecutive records) — one element per record, never a run
      if (isRecord && rank == 1) {
        var i = 0
        while (i < nOut) {
          out(i) = readSlab(v.begin + (starts(0) + i) * recSize, v.ncType, 1)(0)
          i += 1
        }
        return out
      }
      val runLen = counts(rank - 1).toInt
      if (runLen == 0) return out
      val nRuns = nOut / runLen
      // row-major strides over the OUTER slab dims (0..rank-2), for
      // unflattening a run index into absolute coordinates
      val outerStride = new Array[Long](math.max(rank - 1, 1))
      var oa = 1L
      for (i <- (rank - 2) to 0 by -1) { outerStride(i) = oa; oa *= counts(i) }
      val coord = new Array[Long](rank)
      coord(rank - 1) = starts(rank - 1)
      var run = 0
      var o = 0
      while (run < nRuns) {
        var rem = run.toLong
        for (i <- 0 until rank - 1) {
          coord(i) = starts(i) + rem / outerStride(i)
          rem = rem % outerStride(i)
        }
        var within = 0L
        (innerFrom until rank).foreach(i => within += coord(i) * estride(i))
        val rec = if (isRecord) coord(0) else 0L
        val slab = readSlab(v.begin + rec * recSize + within * ts,
          v.ncType, runLen)
        System.arraycopy(slab, 0, out, o, runLen)
        o += runLen
        run += 1
      }
      out
    }

    private def readSlab(at: Long, ncType: Int, n: Int): Array[Double] = {
      val bb = ByteBuffer.wrap(bytes, at.toInt, n * typeSize(ncType))
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = ncType match {
          case 1 => bb.get().toDouble          // NC_BYTE
          case 2 => (bb.get() & 0xff).toDouble // NC_CHAR (raw)
          case 3 => bb.getShort().toDouble
          case 4 => bb.getInt().toDouble
          case 5 => bb.getFloat().toDouble
          case 6 => bb.getDouble()
          case t => throw new IllegalArgumentException(s"nc_type $t")
        }
        i += 1
      }
      out
    }
  }

  private val NC_DIMENSION = 0x0A
  private val NC_VARIABLE = 0x0B
  private val NC_ATTRIBUTE = 0x0C

  def typeSize(ncType: Int): Int = ncType match {
    case 1 | 2 => 1
    case 3 => 2
    case 4 | 5 => 4
    case 6 => 8
    case t => throw new IllegalArgumentException(s"nc_type $t")
  }

  private def pad4(n: Int): Int = (n + 3) & ~3

  // ---------------------------------------------------------------- read
  def parse(bytes: Array[Byte]): NcFile = {
    val bb = ByteBuffer.wrap(bytes)
    require(bb.get() == 'C' && bb.get() == 'D' && bb.get() == 'F',
      "not a NetCDF classic file (bad magic; NetCDF-4/HDF5 starts \\x89HDF)")
    val version = bb.get()
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    val numRecsRaw = bb.getInt() // may be the STREAMING sentinel (-1)

    def readName(): String = {
      val n = bb.getInt()
      val raw = new Array[Byte](pad4(n))
      bb.get(raw)
      new String(raw, 0, n, StandardCharsets.UTF_8)
    }

    def readTaggedCount(expectedTag: Int): Int = {
      val tag = bb.getInt(); val n = bb.getInt()
      require(tag == expectedTag || (tag == 0 && n == 0),
        s"bad list tag $tag (expected $expectedTag)")
      n
    }

    def readAttrs(): Seq[NcAttr] = {
      (0 until readTaggedCount(NC_ATTRIBUTE)).map { _ =>
        val name = readName()
        val t = bb.getInt(); val n = bb.getInt()
        val values: Any = t match {
          case 2 => // char attr = string
            val raw = new Array[Byte](pad4(n)); bb.get(raw)
            new String(raw, 0, n, StandardCharsets.UTF_8)
          case 1 | 3 | 4 =>
            val vs = Array.fill(n)(t match {
              case 1 => bb.get().toLong
              case 3 => bb.getShort().toLong
              case 4 => bb.getInt().toLong
            })
            // skip padding to 4-byte boundary
            val used = n * typeSize(t); bb.position(bb.position() + (pad4(used) - used))
            vs
          case 5 => Array.fill(n)(bb.getFloat().toDouble)
          case 6 => Array.fill(n)(bb.getDouble())
          case other => throw new IllegalArgumentException(
            s"attribute '$name' has invalid nc_type $other (corrupt header?)")
        }
        NcAttr(name, values)
      }
    }

    val dims = (0 until readTaggedCount(NC_DIMENSION)).map { _ =>
      NcDim(readName(), bb.getInt())
    }
    val gattrs = readAttrs()
    val vars = (0 until readTaggedCount(NC_VARIABLE)).map { _ =>
      val name = readName()
      val ndims = bb.getInt()
      val dimIds = Seq.fill(ndims)(bb.getInt())
      val attrs = readAttrs()
      val ncType = bb.getInt()
      val vsize = bb.getInt()
      val begin = if (version == 1) bb.getInt().toLong else bb.getLong()
      NcVar(name, dimIds, attrs, ncType, vsize, begin)
    }
    // STREAMING sentinel: the writer didn't know the record count —
    // derive it from the file length (spec-sanctioned recovery)
    val numRecs =
      if (numRecsRaw >= 0) numRecsRaw
      else {
        val recVars = vars.filter(_.dimIds.headOption.exists(d => dims(d).length == 0))
        if (recVars.isEmpty) 0
        else {
          val recSize =
            if (recVars.length == 1)
              typeSize(recVars.head.ncType) *
                (recVars.head.dimIds.map(dims(_).length).filter(_ > 0).product max 1)
            else recVars.map(_.vsize).sum
          ((bytes.length - recVars.map(_.begin).min) / recSize).toInt
        }
      }
    NcFile(numRecs, dims, gattrs, vars, bytes)
  }

  // --------------------------------------------------------------- write
  /** Minimal v1 writer: fixed-size double variables over the given
    * dims. Enough to export grids and build test fixtures. */
  def write(dims: Seq[NcDim], vars: Seq[(String, Seq[Int], Seq[NcAttr], Array[Double])],
            gattrs: Seq[NcAttr] = Nil): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)

    def writeName(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      (b.length until pad4(b.length)).foreach(_ => out.writeByte(0))
    }
    def writeAttrs(as: Seq[NcAttr]): Unit = {
      if (as.isEmpty) { out.writeInt(0); out.writeInt(0) }
      else {
        out.writeInt(NC_ATTRIBUTE); out.writeInt(as.length)
        as.foreach { a =>
          writeName(a.name)
          a.values match {
            case s: String =>
              val b = s.getBytes(StandardCharsets.UTF_8)
              out.writeInt(2); out.writeInt(b.length); out.write(b)
              (b.length until pad4(b.length)).foreach(_ => out.writeByte(0))
            case ds: Array[Double] =>
              out.writeInt(6); out.writeInt(ds.length); ds.foreach(out.writeDouble)
            case ls: Array[Long] =>
              // classic has no 64-bit attr type — refuse to corrupt
              ls.foreach(l => require(l >= Int.MinValue && l <= Int.MaxValue,
                s"attr '${a.name}' value $l exceeds NC_INT range"))
              out.writeInt(4); out.writeInt(ls.length); ls.foreach(l => out.writeInt(l.toInt))
            case other => throw new IllegalArgumentException(
              s"attr '${a.name}': ${other.getClass.getSimpleName} is not " +
                "writable as a classic attribute (classic text attrs are " +
                "ONE char array — a multi-valued string attribute from an " +
                "HDF5 source has no classic representation)")
          }
        }
      }
    }

    // header sizing pass: compute each var's begin offset
    def nameBytes(s: String) = 4 + pad4(s.getBytes(StandardCharsets.UTF_8).length)
    def attrBytes(as: Seq[NcAttr]): Int = 8 + as.map { a =>
      nameBytes(a.name) + 8 + (a.values match {
        case s: String => pad4(s.getBytes(StandardCharsets.UTF_8).length)
        case ds: Array[Double] => ds.length * 8
        case ls: Array[Long] => ls.length * 4
        case other => throw new IllegalArgumentException(
          s"attr '${a.name}': ${other.getClass.getSimpleName} is not " +
            "writable as a classic attribute (String, Array[Double], " +
            "Array[Long] only)")
      })
    }.sum
    val headerSize = 4 + 4 + // magic + numrecs
      8 + dims.map(d => nameBytes(d.name) + 4).sum +
      attrBytes(gattrs) +
      8 + vars.map { case (n, ds, as, _) =>
        nameBytes(n) + 4 + ds.length * 4 + attrBytes(as) + 12
      }.sum

    val begins = vars.scanLeft(headerSize.toLong) { case (off, (_, _, _, data)) =>
      off + data.length * 8L
    }

    out.writeBytes("CDF"); out.writeByte(1)
    out.writeInt(0) // numrecs: fixed vars only
    out.writeInt(NC_DIMENSION); out.writeInt(dims.length)
    dims.foreach { d => writeName(d.name); out.writeInt(d.length) }
    writeAttrs(gattrs)
    out.writeInt(NC_VARIABLE); out.writeInt(vars.length)
    vars.zipWithIndex.foreach { case ((n, dimIds, as, data), i) =>
      writeName(n)
      out.writeInt(dimIds.length); dimIds.foreach(out.writeInt)
      writeAttrs(as)
      out.writeInt(6) // NC_DOUBLE
      out.writeInt(data.length * 8)
      out.writeInt(begins(i).toInt)
    }
    vars.foreach { case (_, _, _, data) => data.foreach(out.writeDouble) }
    out.flush()
    bos.toByteArray
  }
}
