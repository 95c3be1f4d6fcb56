package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-backed catalog/manifest layer over the grid formats — the
  * LOCAL shape of an ESGF-style remote loader (reference R2), which is
  * a catalog query (facets → member list) followed by per-member
  * fetches. Zero-egress rules out the network half; everything an
  * ESGF client does AFTER the HTTP GET is here:
  *
  *  1. [[buildManifest]] — a DISTRIBUTED sweep over a grid archive
  *     (one task per member, the binaryFile granularity every grid
  *     reader in this codebase uses) parses each member's
  *     self-describing header and records its envelope: data
  *     variables, lat/lon extents, CF-decoded time range, byte size.
  *     The manifest is plain JSONL — the durable catalog artifact a
  *     100 TB archive maintains incrementally instead of re-listing
  *     and re-opening thousands of members per query.
  *  2. [[catalog]] — the manifest as a queryable DataFrame.
  *  3. [[select]] — facet query (variable, coordinate/time bounds,
  *     dataset pattern): members whose RECORDED envelope cannot
  *     intersect the request are pruned at PLANNING time — never
  *     opened, exactly like the DSv2 source's dataset-equality file
  *     pruning but driven by metadata the scan itself cannot know
  *     without opening the file. Survivors load through the DSv2
  *     `netcdf` format (multi-path form) with the SAME predicates
  *     pushed into the scan, so the result is row-identical to the
  *     unpruned read + filter (law-pinned in NetcdfV2Spec).
  *
  * The member list is collected on the driver — bounded by the
  * archive's member COUNT (thousands at 100 TB), the same planning-
  * time listing the DSv2 scan and every Spark file source performs.
  */
object NcCatalog {

  /** One manifest row: the member's path, tag, and envelope. Times are
    * epoch MICROSECONDS (nullable — a static (lat, lon) member has no
    * time axis), so the JSONL round-trip is exact and timezone-free. */
  final case class MemberMeta(path: String, dataset: String,
                              variables: Seq[String],
                              time_min_us: Option[Long],
                              time_max_us: Option[Long],
                              lat_min: Double, lat_max: Double,
                              lon_min: Double, lon_max: Double,
                              bytes: Long)

  /** Distributed manifest build: glob → per-member envelope rows →
    * JSONL under `manifestDir`. Re-running overwrites; see
    * [[updateManifest]] for the incremental refresh. `manifestDir`
    * must live OUTSIDE the member glob — inside it, the manifest's
    * own JSON part files would match the glob and fail the header
    * parse by name on the next build/update. */
  def buildManifest(spark: SparkSession, pathGlob: String,
                    manifestDir: String,
                    latVar: String = "lat", lonVar: String = "lon",
                    timeVar: String = "time"): Unit = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"), col("length"))
      .as[(String, Array[Byte], Long)]
      .map { case (path, bytes, len) =>
        memberMeta(path, bytes, len, latVar, lonVar, timeVar)
      }
      .write.mode("overwrite").json(manifestDir)
  }

  /** The envelope of ONE member, from its self-describing header. */
  private[graft] def memberMeta(path: String, bytes: Array[Byte], len: Long,
                                latVar: String, lonVar: String,
                                timeVar: String): MemberMeta = {
    val g = NetcdfSource.openGrid(bytes)
    val axes = Set(latVar, lonVar, timeVar)
    val dataVars = g.varNames.filterNot(axes).filter { v =>
      scala.util.Try(g.dimsOf(v)).toOption.exists(d =>
        d == Seq(timeVar, latVar, lonVar) || d == Seq(latVar, lonVar))
    }.sorted
    require(dataVars.nonEmpty,
      s"$path: no (time, lat, lon) or (lat, lon) data variable — not a " +
        "grid member this catalog indexes")
    val lats = g.read(latVar)
    val lons = g.read(lonVar)
    // time range only when SOME indexed variable carries the time axis
    val timed = dataVars.exists(v => g.dimsOf(v).headOption.contains(timeVar))
    val tRange: Option[(Long, Long)] =
      if (!timed) None
      else {
        val units = g.unitsOf(timeVar).getOrElse(throw new
            IllegalArgumentException(s"$path: time axis lacks CF units"))
        val (base, step) = NetcdfSource.cfTimeBase(units)
        val ts = g.read(timeVar).map(v => base + (v * step).toLong)
        if (ts.isEmpty) None else Some((ts.min, ts.max))
      }
    val name = path.substring(path.lastIndexOf('/') + 1)
    MemberMeta(path, name, dataVars,
      tRange.map(_._1), tRange.map(_._2),
      if (lats.isEmpty) Double.NaN else lats.min,
      if (lats.isEmpty) Double.NaN else lats.max,
      if (lons.isEmpty) Double.NaN else lons.min,
      if (lons.isEmpty) Double.NaN else lons.max,
      len)
  }

  /** The manifest as a DataFrame (schema from [[MemberMeta]]). */
  def catalog(spark: SparkSession, manifestDir: String): DataFrame =
    spark.read.schema(org.apache.spark.sql.Encoders
      .product[MemberMeta].schema).json(manifestDir)

  /** Incremental refresh: index ONLY members the manifest does not
    * know yet (path equality) and append their envelopes — the daily
    * shape for a growing 100 TB archive, where a full [[buildManifest]]
    * re-opens every member. The probe pass projects (path, length)
    * only, so binaryFile's column pruning keeps known members' BYTES
    * unread (law-pinned: a corrupted already-indexed member does not
    * fail the update). A removed file keeps its row — catalogs
    * tombstone externally; rebuild to compact. Returns the newly
    * indexed paths. */
  def updateManifest(spark: SparkSession, pathGlob: String,
                     manifestDir: String,
                     latVar: String = "lat", lonVar: String = "lon",
                     timeVar: String = "time"): Seq[String] = {
    import spark.implicits._
    val known = catalog(spark, manifestDir).select("path")
    // member-COUNT-bounded collect, like select's planning listing
    val fresh = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"))
      .join(known, Seq("path"), "left_anti")
      .as[String].collect().sorted.toIndexedSeq
    if (fresh.nonEmpty)
      spark.read.format("binaryFile").load(fresh: _*)
        .select(col("path"), col("content"), col("length"))
        .as[(String, Array[Byte], Long)]
        .map { case (path, bytes, len) =>
          memberMeta(path, bytes, len, latVar, lonVar, timeVar)
        }
        .write.mode("append").json(manifestDir)
    fresh
  }

  /** Facet query → planning-time member pruning → DSv2 read with the
    * same predicates pushed into the scan. `variable` must be carried
    * by the member; `bounds` prunes on envelope OVERLAP (a member
    * whose recorded lat/lon/time box cannot intersect the request is
    * never opened; time bounds exclude static members, matching
    * [[NetcdfSource.GridBounds]]' null-time comparison semantics);
    * `datasetPattern` is a Java regex over the member tag. */
  def select(spark: SparkSession, manifestDir: String,
             variable: Option[String] = None,
             bounds: Option[NetcdfSource.GridBounds] = None,
             datasetPattern: Option[String] = None): DataFrame = {
    val cat = catalog(spark, manifestDir)
    val pruned = Seq[DataFrame => DataFrame](
      df => variable.fold(df)(v =>
        df.filter(array_contains(col("variables"), v))),
      df => datasetPattern.fold(df)(p => df.filter(col("dataset").rlike(p))),
      df => bounds.fold(df) { b =>
        val latLon = col("lat_max") >= b.latMin && col("lat_min") <= b.latMax &&
          col("lon_max") >= b.lonMin && col("lon_min") <= b.lonMax
        val time = (b.timeMin, b.timeMax) match {
          case (None, None) => lit(true)
          case (tMin, tMax) =>
            // any time bound excludes static members (null range)
            col("time_min_us").isNotNull &&
              tMin.fold(lit(true))(t => col("time_max_us") >=
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .fromJavaTimestamp(t)) &&
              tMax.fold(lit(true))(t => col("time_min_us") <=
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .fromJavaTimestamp(t))
        }
        df.filter(latLon && time)
      }
    ).foldLeft(cat)((df, f) => f(df))
    // member COUNT-bounded driver collect — the catalog-client shape
    val paths = pruned.select("path").collect().map(_.getString(0)).sorted
    if (paths.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], NetcdfV2.schema)
    val base = spark.read.format("netcdf").load(paths.toIndexedSeq: _*)
    val filtered = Seq[DataFrame => DataFrame](
      df => variable.fold(df)(v => df.filter(col("variable") === v)),
      df => datasetPattern.fold(df)(p => df.filter(col("dataset").rlike(p))),
      df => bounds.fold(df) { b =>
        var c = col("lat") >= b.latMin && col("lat") <= b.latMax &&
          col("lon") >= b.lonMin && col("lon") <= b.lonMax
        b.timeMin.foreach(t => c = c && col("time") >= lit(t))
        b.timeMax.foreach(t => c = c && col("time") <= lit(t))
        df.filter(c)
      }
    ).foldLeft(base)((df, f) => f(df))
    filtered
  }
}
