package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Det, Tables}
import Det._

/** bcdp's operator surface (SURVEY §2.1 R3–R12) re-expressed as Spark
  * transforms over the canonical long-form climate frame
  * `(dataset STRING, time TIMESTAMP, lat DOUBLE, lon DOUBLE, value DOUBLE)`
  * — one row per grid cell, an Ensemble being the union of its members
  * tagged by `dataset`.
  *
  * Design notes (vs the reference, which is xarray/dask-based [P]):
  *  - every op is a declarative DataFrame transform, so Catalyst pushes
  *    subset predicates into the scan and fuses chained ops into one
  *    codegen stage — the dask task graph's role is played by the
  *    Catalyst plan;
  *  - regridding to a uniform target grid is bin-and-aggregate
  *    (conservative/nearest) — a single partial+final aggregation, no
  *    shuffle of the grid definition; bilinear would be a broadcast
  *    range-join against the (small) target-grid cell table;
  *  - NetCDF-3 classic ingestion (R1) is REAL as of round 2:
  *    `sources.NetcdfClassic` + `NetcdfSource.readClassic` /
  *    `Ensemble.loadNetcdf` emit this long form distributed; parquet
  *    remains the graded source, NetCDF-4/HDF5 remains jar-blocked.
  */
object ClimateOps {
  /** R3 homogenize: rename dims to convention, wrap lon to [-180,180). */
  def homogenize(df: DataFrame, renames: Map[String, String]): DataFrame = {
    val renamed = renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
    renamed.withColumn("lon", ((col("lon") + 180.0) % 360.0 + 360.0) % 360.0 - 180.0)
  }

  /** R5 subset(bounds): conjunctive range predicate — pushdown-friendly.
    * A lon range with lonMin > lonMax crosses the antimeridian (e.g.
    * 170 → −170 selects the Pacific strip) and becomes a disjunction,
    * exactly bcdp's Bounds semantics for dateline-spanning regions. */
  def subset(df: DataFrame, latMin: Double, latMax: Double,
             lonMin: Double, lonMax: Double,
             tMin: String, tMax: String): DataFrame = {
    val lonPred =
      if (lonMin <= lonMax) col("lon").between(lonMin, lonMax)
      else col("lon") >= lonMin || col("lon") <= lonMax
    df.filter(col("lat").between(latMin, latMax)
      && lonPred
      && col("time").between(lit(tMin).cast("timestamp"), lit(tMax).cast("timestamp")))
  }

  /** R6 select_season: keep timesteps whose month is in the season
    * (DJF-style wrap is just the month set {12,1,2}). */
  def selectSeason(df: DataFrame, months: Seq[Int]): DataFrame =
    df.filter(month(col("time")).isin(months: _*))

  /** Pooling choice for the gridded reductions — xarray's
    * `.resample(...).mean()` / `.sum()` pair. "mean" is the default
    * downsampling; "sum" is the mass-conserving (integral-preserving)
    * form — and the one a cross-engine-graded COMPOSITION should ride,
    * because a sum of exact integers is order-free while a chained
    * mean-of-mean accumulates summation-order ulps at every stage. */
  private def pool(agg: String): Column => Column = agg match {
    case "mean" => (c: Column) => avg(c)
    case "sum"  => (c: Column) => sum(c)
    case other  => throw new IllegalArgumentException(
      s"resample/regrid agg must be 'mean' or 'sum', got '$other'")
  }

  /** R8 resample: temporal downsampling to `unit` (e.g. "day", "month"). */
  def resample(df: DataFrame, unit: String, agg: String = "mean"): DataFrame =
    df.groupBy(col("dataset"), date_trunc(unit, col("time")).as("time"),
        col("lat"), col("lon"))
      .agg(pool(agg)(col("value")).as("value"))

  /** R9 climatology: mean annual cycle — per (dataset, cell, month-of-year). */
  def climatology(df: DataFrame): DataFrame =
    df.groupBy(col("dataset"), month(col("time")).as("moy"), col("lat"), col("lon"))
      .agg(avg(col("value")).as("clim"))

  /** R10 anomaly: value − its month-of-year climatology, via window (no
    * self-join with the climatology table). */
  def anomaly(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("dataset"), month(col("time")), col("lat"), col("lon"))
    df.withColumn("anomaly", col("value") - avg(col("value")).over(w))
  }

  /** R7 regrid onto a uniform res° mesh: agg="mean" is bin-average
    * (the plotting default); agg="sum" is the conservative form proper
    * — total mass over the domain is preserved exactly. */
  def regridBin(df: DataFrame, latRes: Double, lonRes: Double,
                agg: String = "mean"): DataFrame =
    df.groupBy(col("dataset"), col("time"),
        (floor(col("lat") / latRes) * latRes).as("lat_bin"),
        (floor(col("lon") / lonRes) * lonRes).as("lon_bin"))
      .agg(pool(agg)(col("value")).as("value"), count(lit(1)).as("n_cells"))

  /** Per-(dataset, time) uniform target mesh (tlat, tlon) shared by the
    * regrid interpolators. The +1e-9 matters: an exact-span quotient
    * like 0.3/0.1 lands just BELOW the integer in doubles (2.999…96) —
    * without the epsilon the latMax/lonMax row of the mesh silently
    * disappears. */
  private def targetMesh(df: DataFrame, latMin: Double, latMax: Double,
                         lonMin: Double, lonMax: Double,
                         dstLatRes: Double, dstLonRes: Double): DataFrame = {
    val spark = df.sparkSession
    val nLat = math.floor((latMax - latMin) / dstLatRes + 1e-9).toLong
    val nLon = math.floor((lonMax - lonMin) / dstLonRes + 1e-9).toLong
    val mesh = spark.range(nLat + 1)
      .select((lit(latMin) + col("id") * dstLatRes).as("tlat"))
      .crossJoin(spark.range(nLon + 1)
        .select((lit(lonMin) + col("id") * dstLonRes).as("tlon")))
    df.select("dataset", "time").distinct().crossJoin(mesh)
  }

  /** R7 regrid, method=linear: bilinear interpolation of a uniform
    * source grid onto a uniform target mesh.
    *
    * Shape (the 100 TB path): each target node is exploded into its ≤4
    * surrounding source-corner references carrying the bilinear weight,
    * then ONE equi-join against the source on exact corner coordinates
    * (snapped to integer microdegrees so double keys join reliably),
    * then one aggregation per target node: Σ(w·v)/Σ(w). The
    * renormalization makes boundary nodes (fewer than 4 corners
    * present) interpolate from the corners that exist — xarray/xesmf's
    * behavior for unmapped edges. No cross join of data with data: the
    * mesh is tiny and the join co-partitions on corner coords.
    *
    * The Σ over ≤4 doubles is a hash-agg (order not guaranteed) →
    * fine for the library op, but the oracle analog below uses a
    * fixed-association 4-join formula instead. */
  def regridBilinear(df: DataFrame, srcLatRes: Double, srcLonRes: Double,
                     latMin: Double, latMax: Double,
                     lonMin: Double, lonMax: Double,
                     dstLatRes: Double, dstLonRes: Double): DataFrame = {
    // Det.micros: exact integer-microdegree join keys
    val targets = targetMesh(df, latMin, latMax, lonMin, lonMax, dstLatRes, dstLonRes)
    // corner references: (lat0|lat1, lon0|lon1) with bilinear weights
    val lat0 = floor(col("tlat") / srcLatRes) * srcLatRes
    val lon0 = floor(col("tlon") / srcLonRes) * srcLonRes
    val fl = (col("tlat") - lat0) / srcLatRes
    val fo = (col("tlon") - lon0) / srcLonRes
    val corners = targets
      .withColumn("c", explode(array(
        struct(micros(lat0).as("klat"), micros(lon0).as("klon"),
          ((lit(1.0) - fl) * (lit(1.0) - fo)).as("w")),
        struct(micros(lat0).as("klat"), micros(lon0 + srcLonRes).as("klon"),
          ((lit(1.0) - fl) * fo).as("w")),
        struct(micros(lat0 + srcLatRes).as("klat"), micros(lon0).as("klon"),
          (fl * (lit(1.0) - fo)).as("w")),
        struct(micros(lat0 + srcLatRes).as("klat"), micros(lon0 + srcLonRes).as("klon"),
          (fl * fo).as("w")))))
      .select(col("dataset"), col("time"), col("tlat"), col("tlon"),
        col("c.klat"), col("c.klon"), col("c.w"))
      .filter(col("w") > 0.0) // interior nodes keep ≤4, on-node keeps 1
    val src = df.select(col("dataset"), col("time"),
      micros(col("lat")).as("klat"), micros(col("lon")).as("klon"), col("value"))
    corners.join(src, Seq("dataset", "time", "klat", "klon"))
      .groupBy(col("dataset"), col("time"), col("tlat"), col("tlon"))
      .agg((sum(col("w") * col("value")) / sum(col("w"))).as("value"))
  }

  /** R7 regrid, method=nearest, for ARBITRARY source node layouts —
    * including 2-D curvilinear grids (rotated-pole / tripolar ocean
    * meshes), which bin-average and bilinear can't index because node
    * coordinates aren't separable functions of (i,j). Treats the source
    * as a scatter of (lat, lon, value) nodes:
    *
    *  1. block the plane into blockDeg° tiles;
    *  2. explode each TARGET node into its 3×3 neighbor tiles (targets
    *     are the small side — a mesh, not the data);
    *  3. one equi-join on the tile key against the source scatter;
    *  4. per target node, keep the minimum-distance source node
    *     (squared-degree metric, (lat, lon) tie-break — total order).
    *
    * Work is O(|targets|·9·occupancy), never all-pairs. The search
    * radius is exactly blockDeg: every node within that distance lies
    * in the 3×3 tiles (guaranteed seen), and candidates beyond it are
    * filtered out — so the result is the TRUE nearest within blockDeg,
    * or no row (xesmf's unmapped-point mask). Choose blockDeg ≥ the max
    * expected node spacing. */
  def regridNearest(df: DataFrame, latMin: Double, latMax: Double,
                    lonMin: Double, lonMax: Double,
                    dstLatRes: Double, dstLonRes: Double,
                    blockDeg: Double = 2.0): DataFrame =
    blockedRanked(df, latMin, latMax, lonMin, lonMax, dstLatRes, dstLonRes, blockDeg)
      .filter(col("rn") === 1)
      .select(col("dataset"), col("time"), col("tlat"), col("tlon"), col("value"))

  /** Shared tile-blocked candidate ranking for the scatter regridders:
    * each target node sees every source node within blockDeg via its
    * 3×3 neighbor tiles, ranked by squared distance with (lat, lon)
    * tie-break. Emits (dataset, time, tlat, tlon, lat, lon, value, d2,
    * rn). */
  private def blockedRanked(df: DataFrame, latMin: Double, latMax: Double,
                            lonMin: Double, lonMax: Double,
                            dstLatRes: Double, dstLonRes: Double,
                            blockDeg: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val targets = targetMesh(df, latMin, latMax, lonMin, lonMax, dstLatRes, dstLonRes)
    val offsets = array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
      struct(lit(dy).as("dy"), lit(dx).as("dx")))): _*)
    val cands = targets
      .withColumn("o", explode(offsets))
      .select(col("dataset"), col("time"), col("tlat"), col("tlon"),
        (floor(col("tlat") / blockDeg) + col("o.dy")).as("blat"),
        (floor(col("tlon") / blockDeg) + col("o.dx")).as("blon"))
    val src = df.select(col("dataset"), col("time"),
      floor(col("lat") / blockDeg).as("blat"),
      floor(col("lon") / blockDeg).as("blon"),
      col("lat"), col("lon"), col("value"))
    val d2 = (col("lat") - col("tlat")) * (col("lat") - col("tlat")) +
      (col("lon") - col("tlon")) * (col("lon") - col("tlon"))
    val w = Window.partitionBy(col("dataset"), col("time"), col("tlat"), col("tlon"))
      .orderBy(col("d2"), col("lat"), col("lon"))
    cands.join(src, Seq("dataset", "time", "blat", "blon"))
      .withColumn("d2", d2)
      // radius guard: the 3×3 tiles see EVERY node within blockDeg of
      // the target but only SOME nodes beyond it, so without this
      // filter a target whose true nearest lies just outside the tiles
      // would silently get a farther in-tile node. Capping at blockDeg
      // makes the contract exact: the true nearest within blockDeg, or
      // no row.
      .filter(col("d2") <= blockDeg * blockDeg)
      .withColumn("rn", row_number().over(w))
  }

  /** R7 regrid, method=linear, for CURVILINEAR source grids (the
    * limitation regridBilinear documents: its corner snapping assumes
    * uniform source spacing). On a rotated-pole/tripolar mesh node
    * coordinates aren't separable functions of (i, j), so corner
    * arithmetic is impossible without the mesh topology — the standard
    * scatter-data fallback (and what ESMF's nearest-neighbor family
    * degrades to `[P]` SURVEY §2.1 R7) is inverse-distance weighting
    * over the k nearest nodes: value = Σ(vᵢ/d²ᵢ)/Σ(1/d²ᵢ), a true
    * interpolator (exact on nodes, continuous, local). Same
    * tile-blocked candidate shape as [[regridNearest]] — work stays
    * O(|targets|·9·occupancy), never all-pairs; targets with no node
    * within blockDeg stay unmapped (no row), targets sitting exactly
    * on a node take that node's value (the d² → 0 limit). */
  def regridIdw(df: DataFrame, latMin: Double, latMax: Double,
                lonMin: Double, lonMax: Double,
                dstLatRes: Double, dstLonRes: Double,
                k: Int = 3, blockDeg: Double = 2.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    blockedRanked(df, latMin, latMax, lonMin, lonMax, dstLatRes, dstLonRes, blockDeg)
      .filter(col("rn") <= k)
      .groupBy(col("dataset"), col("time"), col("tlat"), col("tlon"))
      .agg(
        // exact node hit: IDW's 1/d² divides by zero at d²=0 (ANSI mode
        // throws) — keep those rows out of the sums and take the node
        // value directly (min() for a deterministic pick among
        // coincident duplicate nodes)
        min(when(col("d2") === 0.0, col("value"))).as("_exact"),
        (sum(when(col("d2") > 0.0, col("value") / col("d2")))
          / sum(when(col("d2") > 0.0, lit(1.0) / col("d2")))).as("_idw"))
      .select(col("dataset"), col("time"), col("tlat"), col("tlon"),
        coalesce(col("_exact"), col("_idw")).as("value"))
  }

  /** R7 regrid, method=conservative — TRUE first-order conservative
    * remapping (ESMF/xesmf semantics, r17): each target cell's value
    * is the overlap-area-weighted mean of every source cell it
    * intersects, value_t = Σ_s v_s·A(s∩t) / Σ_s A(s∩t). Unlike
    * [[regridBin]] (exact only when source cells NEST inside target
    * cells) this weights every source cell by its FRACTIONAL overlap,
    * so non-nested grids (src 1.5° → dst 1°, offset grids, …)
    * conserve mass: Σ_t value_t·A_t equals Σ_s v_s·A_s over the
    * covered domain, by construction (law-pinned in ClimateOpsSpec).
    *
    * Conventions: (lat, lon) are cell CENTERS (the xarray/CF norm) —
    * source cell s spans lat±srcLatRes/2 × lon±srcLonRes/2; the
    * target mesh tiles [latMin, latMax)×[lonMin, lonMax) with
    * dstLatRes×dstLonRes cells and the output (tlat, tlon) are the
    * target CENTERS. `spherical=true` (default) weights by true
    * sphere area, (sin φ_hi − sin φ_lo)·Δλ over the overlap
    * rectangle — what ESMF computes; `spherical=false` uses planar
    * degree² areas, which with integer-scaled bounds and values is
    * EXACT integer arithmetic end to end (the hash-graded form).
    *
    * Shape: on rectilinear grids s∩t decomposes into a product of
    * two 1-D interval overlaps, so the covering target indices come
    * from pure ARITHMETIC on the source bounds — each source row
    * explodes into the ≤(⌈srcLatRes/dstLatRes⌉+1)·(⌈srcLonRes/
    * dstLonRes⌉+1) cells it can touch and ONE groupBy(target cell)
    * reduces. No join, no all-pairs, no mesh broadcast: at 100 TB the
    * only shuffle is the final aggregation, keyed by the target cell
    * (cardinality = the OUTPUT grid). Bounds are compared in exact
    * integer microdegrees (Det.micros' per-row rounding contract), so
    * a cell edge that lands exactly on a target edge contributes to
    * exactly one side — no double counting, no dropped slivers. */
  def regridConservative(df: DataFrame,
                         srcLatRes: Double, srcLonRes: Double,
                         latMin: Double, latMax: Double,
                         lonMin: Double, lonMax: Double,
                         dstLatRes: Double, dstLonRes: Double,
                         spherical: Boolean = true): DataFrame = {
    require(srcLatRes > 0 && srcLonRes > 0 && dstLatRes > 0 && dstLonRes > 0,
      "regridConservative: resolutions must be positive")
    val nLat = math.round((latMax - latMin) / dstLatRes)
    val nLon = math.round((lonMax - lonMin) / dstLonRes)
    require(nLat >= 1 && nLon >= 1,
      "regridConservative: target domain shorter than one cell")
    // exact integer microdegree bounds: target edge k sits at
    // latMinµ + k·dstµ; source cell spans [cµ − resµ/2, cµ + resµ/2)
    val latMinU = math.round(latMin * 1e6); val dstLatU = math.round(dstLatRes * 1e6)
    val lonMinU = math.round(lonMin * 1e6); val dstLonU = math.round(dstLonRes * 1e6)
    val sLatHalf = math.round(srcLatRes * 1e6) / 2
    val sLonHalf = math.round(srcLonRes * 1e6) / 2
    def cover(cU: Column, half: Long, minU: Long, dU: Long, n: Long)
        : (Column, Column, Column) = {
      val lo = cU - half; val hi = cU + half
      // floorDiv semantics (pmod trick): indices of the first/last
      // target cell the source interval [lo, hi) can overlap, clipped
      // to the mesh — a cell wholly outside yields an EMPTY range and
      // explode drops the row (xesmf's unmapped-source behavior)
      def fdiv(x: Column, d: Long): Column =
        ((x - pmod(x, lit(d))) / d).cast("long")
      val i0 = greatest(fdiv(lo - minU, dU), lit(0L))
      val i1 = least(fdiv(hi - lit(1L) - minU, dU), lit(n - 1))
      (lo, hi, when(i1 >= i0, sequence(i0, i1)).otherwise(
        array().cast("array<long>")))
    }
    val srcU = df.select(col("dataset"), col("time"), col("value"),
      micros(col("lat")).as("clatU"), micros(col("lon")).as("clonU"))
    val (laLo, laHi, laIdx) = cover(col("clatU"), sLatHalf, latMinU, dstLatU, nLat)
    val (loLo, loHi, loIdx) = cover(col("clonU"), sLonHalf, lonMinU, dstLonU, nLon)
    val exploded = srcU
      .withColumn("slaLo", laLo).withColumn("slaHi", laHi)
      .withColumn("sloLo", loLo).withColumn("sloHi", loHi)
      .withColumn("i", explode(laIdx))
      .withColumn("j", explode(loIdx))
    // 1-D overlaps in exact µdeg; /1e6 is one correctly-rounded IEEE
    // division (exact whenever the overlap is a round binary fraction
    // of a degree — in particular for whole-degree test grids)
    val ovLaLoU = greatest(col("slaLo"), lit(latMinU) + col("i") * dstLatU)
    val ovLaHiU = least(col("slaHi"), lit(latMinU) + (col("i") + 1) * dstLatU)
    val ovLonDeg = (least(col("sloHi"), lit(lonMinU) + (col("j") + 1) * dstLonU) -
      greatest(col("sloLo"), lit(lonMinU) + col("j") * dstLonU)).cast("double") / 1e6
    val w =
      if (spherical)
        (sin(radians(ovLaHiU.cast("double") / 1e6)) -
          sin(radians(ovLaLoU.cast("double") / 1e6))) * ovLonDeg
      else ((ovLaHiU - ovLaLoU).cast("double") / 1e6) * ovLonDeg
    exploded
      .withColumn("w", w)
      .groupBy(col("dataset"), col("time"), col("i"), col("j"))
      .agg((sum(col("value") * col("w")) / sum(col("w"))).as("value"),
        sum(col("w")).as("w_sum"))
      .select(col("dataset"), col("time"),
        ((lit(latMinU) + (col("i").cast("double") + 0.5) * dstLatU) / 1e6).as("tlat"),
        ((lit(lonMinU) + (col("j").cast("double") + 0.5) * dstLonU) / 1e6).as("tlon"),
        col("value"), col("w_sum"))
  }

  /** R11 zonal mean: collapse the lon axis. */
  def zonalMean(df: DataFrame): DataFrame =
    df.groupBy(col("dataset"), col("time"), col("lat"))
      .agg(avg(col("value")).as("value"))

  /** R11 area-weighted spatial mean: Σ value·cos(lat) / Σ cos(lat) per
    * (dataset, time). On a uniform lat/lon mesh a cell's area shrinks
    * with cos(latitude), so the unweighted mean over-counts the poles —
    * this is THE standard global-mean reduction in climate analysis
    * (xarray's `weighted(cos(lat)).mean()`). One aggregation.
    *
    * `weights` (r16): an optional explicit per-row weight expression
    * replacing the default in-plan cos(radians(lat)). A caller that
    * wants CROSS-ENGINE bit determinism computes its weights ONCE
    * driver-side and passes integer-quantized literals (e.g. a CASE
    * over round(cos·1e6) — the graded q_climate_spatial_weighted key):
    * with integer-valued weights and values, every product and both
    * sums stay exact, and the single terminal division is correctly
    * rounded in every engine. The default cos path is kept for callers
    * who want the true weights (libm cos is not bit-portable across
    * engines, so that form has no hash oracle; spec'd against
    * hand-computed fixtures instead). */
  def spatialMeanWeighted(df: DataFrame,
                          weights: Option[Column] = None): DataFrame = {
    val w = weights.getOrElse(cos(radians(col("lat"))))
    df.groupBy(col("dataset"), col("time"))
      .agg((sum(col("value") * w) / sum(w)).as("value"))
  }

  /** R12 unit conversion: value*k + b (e.g. K→°C is k=1, b=-273.15). */
  def convertUnits(df: DataFrame, k: Double, b: Double): DataFrame =
    df.withColumn("value", col("value") * k + b)

  /** Empirical QUANTILE-MAPPING bias correction (r16) — the
    * downscaling staple (xclim's EmpiricalQuantileMapping shape):
    * corrected(x) = Q_obs(F_model(x)) per group. Deterministic
    * construction from exact building blocks:
    *  - F_model(x) = k/(n_m−1), k the 0-based rank of x in the model
    *    group ordered by (value, idCol) — ties break on the unique id,
    *    so the rank (and thus the correction) is total-order stable;
    *  - Q_obs at r interpolates linearly between the obs order
    *    statistics: h = r·(n_o−1), corrected = v⌊h⌋ + (h−⌊h⌋)·(v⌊h⌋₊₁
    *    − v⌊h⌋) — the standard type-7 quantile.
    * NULL values are excluded on both sides; model rows in groups with
    * NO reference data are DROPPED (no correction is definable).
    * Scale shape: one window pass per side partitioned by the group
    * key, then two group-keyed equi-joins (obs counts, then the ⌊h⌋
    * order statistic) — no broadcast of the reference, no all-pairs.
    * GROUP-CARDINALITY REQUIREMENT (r17): each group is sorted in ONE
    * task by the rank windows, so `groupCols` must partition the data
    * into groups that (a) individually fit an executor's sort buffer
    * and (b) grow in COUNT as data grows (a month/region band, not a
    * 5-value category) — the same contract as packSequences' sharding;
    * PlanAuditSpec pins the graded key's windows to the full key.
    * Cross-engine exactness (the graded key): integer-valued inputs
    * make every order statistic exact; r, h, and the interpolation are
    * the same fixed IEEE sequence both engines evaluate. */
  def quantileMap(model: DataFrame, obs: DataFrame, groupCols: Seq[String],
                  valueCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    def ranked(df: DataFrame) = {
      val ord = Window.partitionBy(g: _*)
        .orderBy(col(valueCol), col(idCol))
      val whole = Window.partitionBy(g: _*)
      df.filter(col(valueCol).isNotNull)
        .withColumn("__rk", row_number().over(ord) - 1)
        .withColumn("__n", count(lit(1)).over(whole))
        .withColumn("__vnext", lead(col(valueCol), 1).over(ord))
    }
    // NOT cached (r17 optimization round, measured and rejected): the
    // ranked obs feeds both the order-statistic table and the
    // per-group counts, which LOOKS like a duplicated window subtree —
    // but column pruning deletes the unused window from the counts
    // branch (it degenerates to scan + partial/final count), so the
    // "second evaluation" is one cheap aggregation pass. A cache here
    // A/B-measured ~60% SLOWER at sf0.1 (min-of-3 alternating fresh
    // JVMs: 2.4 s → 3.9 s) — the InMemoryRelation materialization of
    // the obs-sized rank table costs more than the scan it saves.
    val o = ranked(obs)
    // renamed group keys on the order-statistic side: obs and model
    // usually derive from one lineage, so bare-name join keys would be
    // ambiguous attributes
    val obsStats = o.select(
      (groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__rk").as("__j") :+
        col(valueCol).as("__vlo") :+ col("__vnext")): _*)
    val obsCounts = o.groupBy(g: _*).agg(count(lit(1)).as("__no"))
    val m = ranked(model).drop("__vnext")
      .join(obsCounts, groupCols)
      .withColumn("__r", when(col("__n") === 1, lit(0.0))
        .otherwise(col("__rk").cast("double") /
          (col("__n") - 1).cast("double")))
      .withColumn("__h", col("__r") * (col("__no") - 1).cast("double"))
      .withColumn("__jlo", floor(col("__h")))
    val cond = groupCols.map(c => col(c) === col(s"__g_$c")).reduce(_ && _) &&
      col("__jlo") === col("__j")
    m.join(obsStats, cond, "inner")
      .withColumn("corrected",
        col("__vlo") + (col("__h") - col("__jlo").cast("double")) *
          (coalesce(col("__vnext"), col("__vlo")) - col("__vlo")))
      .drop((groupCols.map(c => s"__g_$c") ++
        Seq("__rk", "__n", "__no", "__r", "__h", "__jlo", "__j",
          "__vlo", "__vnext")): _*)
  }

  /** xarray `interpolate_na(method="linear")` (r16): fill NULL gaps in
    * `valueCol` by linear interpolation between the nearest non-null
    * neighbors along the numeric `axisCol`, independently per
    * `partCols` series. Leading/trailing NULLs (no neighbor on one
    * side) stay NULL — xarray's default. One shuffle on the series
    * key; two frames over ONE partition sort (preceding + following),
    * never a global window. Cross-engine exactness: with integer
    * values and axis, vp/vn/tp/tn are exact, and the fill is the
    * fixed IEEE sequence vp + (vn−vp)·((t−tp)/(tn−tp)) — one division,
    * one multiply, one add, identically parenthesized in the graded
    * oracle. */
  def interpolateNa(df: DataFrame, partCols: Seq[String], axisCol: String,
                    valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Window.partitionBy(partCols.map(col): _*).orderBy(col(axisCol))
    val before = base.rowsBetween(Window.unboundedPreceding, -1)
    val after = base.rowsBetween(1, Window.unboundedFollowing)
    val v = col(valueCol)
    val t = col(axisCol)
    val tp = last(when(v.isNotNull, t), ignoreNulls = true).over(before)
    val vp = last(when(v.isNotNull, v), ignoreNulls = true).over(before)
    val tn = first(when(v.isNotNull, t), ignoreNulls = true).over(after)
    val vn = first(when(v.isNotNull, v), ignoreNulls = true).over(after)
    df.withColumn(valueCol,
      when(v.isNotNull, v.cast("double")).otherwise(
        vp.cast("double") + (vn.cast("double") - vp.cast("double")) *
          ((t - tp).cast("double") / (tn - tp).cast("double"))))
  }

  /** Run-length SPELL detection (r17) — the gaps-and-islands staple
    * behind the climate duration indices (xclim's
    * `maximum_consecutive_dry_days` / WSDI family): maximal runs of
    * CONSECUTIVE axis steps (difference exactly 1) in `df`, which the
    * caller has already filtered to the QUALIFYING rows (days above a
    * threshold, wet days, …). One row per spell: first/last axis
    * value, length, and the value sum over the run.
    * Island id = axis − row_number ordered by axis within the series —
    * constant exactly across a consecutive run, strictly dropping at
    * every gap; a pure projection over the window's partition sort.
    * Scale shape: ONE shuffle on the series key (the window), then a
    * hash groupBy on (series, island) with map-side partial
    * aggregation — no self-join, no lag-chain. The per-series sort
    * carries quantileMap's group-cardinality contract: `groupCols`
    * must split the data into many bounded series (a cell, a
    * station×season), not a 5-value category.
    * Exactness: with an integer axis and integer values everything is
    * exact long arithmetic — hash-gradeable verbatim. */
  def spells(df: DataFrame, groupCols: Seq[String], axisCol: String,
             valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(axisCol))
    df.withColumn("__isl", col(axisCol) - row_number().over(w))
      .groupBy(g :+ col("__isl"): _*)
      .agg(min(col(axisCol)).as("spell_start"),
        max(col(axisCol)).as("spell_end"),
        count(lit(1)).as("spell_len"),
        sum(col(valueCol)).as("spell_sum"))
      .drop("__isl")
  }

  /** Per-group Pearson correlation from EXACT integer moments (r17) —
    * the pattern-correlation / teleconnection primitive (per-cell
    * corr of two co-located variables across time). Inputs must be
    * integer-valued (micros-quantize first): Σx, Σy, Σx², Σy², Σxy
    * accumulate as DECIMAL(38,0) — order-free exact at any scale —
    * and the final r = (nΣxy − ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))
    * is ONE fixed IEEE sequence over the cast moments — no
    * summation-order noise anywhere (the r17 detrend boundary lesson,
    * applied proactively; the built-in corr() carries ~1e-11
    * order noise). The one residual cross-engine hazard: moments
    * above 2^53 convert int→double CORRECTLY ROUNDED in Spark
    * (BigDecimal) but DOUBLE-ROUNDED through DuckDB's hugeint
    * two-half reconstruction — observed 1-ulp moment differences at
    * decade-2 magnitudes, i.e. a ~1e-15 relative noise floor on the
    * result. `corr` therefore rounds to 6 dp: nine orders of margin
    * above the floor (boundary-hit probability ~1e-9 per group — the
    * detrend-class robustness argument, with the noise floor pushed
    * from 1e-11 to 1e-15). Zero variance in either series → NULL.
    * One partial+final aggregation; group count scales with the cell
    * mesh. */
  def corrExact(df: DataFrame, groupCols: Seq[String], xCol: String,
                yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val xd = col(xCol).cast(dec); val yd = col(yCol).cast(dec)
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("n"),
        sum(xd).cast("double").as("sx"),
        sum(yd).cast("double").as("sy"),
        sum(xd * xd).cast("double").as("sxx"),
        sum(yd * yd).cast("double").as("syy"),
        sum(xd * yd).cast("double").as("sxy"))
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("corr",
        when(col("vx") <= 0.0 || col("vy") <= 0.0, lit(null))
          .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("vx")) * sqrt(col("vy"))), 6)))
      .select(groupCols.map(col) :+ col("n").cast("long").as("n_obs") :+
        col("corr"): _*)
  }

  /** Per-group OLS TREND from exact integer moments (r17) — the
    * trend-map primitive (warming trend per grid cell, xclim's
    * `linregress` shape): slope and intercept of integer-valued
    * `yCol` over integer-valued `tCol` per group, moments as
    * DECIMAL(38,0) (order-free exact), the final arithmetic one fixed
    * IEEE sequence — [[corrExact]]'s machinery with the regression
    * read-out. Emits RAW doubles (deterministic up to the ~1e-15
    * hugeint→double conversion floor at >2^53 moments); a graded
    * consumer rescales to O(1)-magnitude units and rounds so its grid
    * sits orders above that floor — rounding magnitude-1e11 micros
    * intercepts directly would put the grid BELOW the absolute noise.
    * A single distinct time (zero variance in t) → NULL slope and
    * intercept. */
  def trendExact(df: DataFrame, groupCols: Seq[String], tCol: String,
                 yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val td = col(tCol).cast(dec); val yd = col(yCol).cast(dec)
    df.filter(col(tCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("n"),
        sum(td).cast("double").as("st"),
        sum(yd).cast("double").as("sy"),
        sum(td * td).cast("double").as("st2"),
        sum(td * yd).cast("double").as("sty"))
      .withColumn("dd", col("n") * col("st2") - col("st") * col("st"))
      .withColumn("slope", when(col("dd") <= 0.0, lit(null))
        .otherwise((col("n") * col("sty") - col("st") * col("sy")) /
          col("dd")))
      .withColumn("icept",
        (col("sy") - col("slope") * col("st")) / col("n"))
      .select(groupCols.map(col) :+ col("n").cast("long").as("n_obs") :+
        col("slope") :+ col("icept"): _*)
  }

  /** §1.1 multi-variable Datasets: an xarray.Dataset holds several
    * variables over shared dims; the long form adds a `variable`
    * discriminator column. melt (wide → long) is a pure projection via
    * `stack` — no shuffle, codegen'd; [[pivotVariables]] inverts it. */
  def meltVariables(df: DataFrame, varCols: Seq[String]): DataFrame = {
    require(varCols.nonEmpty, "meltVariables needs at least one variable column")
    val keys = df.columns.filterNot(varCols.contains)
    val stackArgs = varCols.map(v => s"'$v', `$v`").mkString(", ")
    df.select(keys.map(col) :+
      expr(s"stack(${varCols.length}, $stackArgs) AS (variable, value)"): _*)
  }

  /** Long → wide: one value column per variable. `first` is
    * deterministic here because the long form has exactly one row per
    * (cell, variable). One shuffle on the cell key.
    *
    * `values` (r15): when the caller knows the variable set (it
    * usually does — it melted them), passing it pins the output
    * schema WITHOUT the eager distinct-discovery job Spark's
    * valueless `pivot` runs first — at 100 TB that job is a full
    * extra scan — and keeps the schema stable on an empty input
    * (discovery over zero rows yields NO variable columns at all).
    *
    * DROP SEMANTICS (r15 advice): a non-empty `values` list also
    * means long-form rows whose `variable` is NOT in the list are
    * SILENTLY dropped — standard Spark pivot behavior. A stale or
    * partial list therefore loses data without an error; pass the
    * exact melted set (or omit `values` to pay the discovery scan and
    * keep every variable). */
  def pivotVariables(df: DataFrame, values: Seq[String] = Seq.empty): DataFrame = {
    val g = df.groupBy(col("dataset"), col("time"), col("lat"), col("lon"))
    (if (values.nonEmpty) g.pivot("variable", values)
     else g.pivot("variable"))
      .agg(first(col("value")))
  }

  /** R4 normalize_times: map a (year, day-of-year) pair from a noleap
    * (365-day) calendar onto the proleptic Gregorian axis by skipping
    * Feb 29 — the standard alignment trick, as a pure expression. */
  def noleapToTimestamp(yearCol: Column, doyCol: Column): Column = {
    val isLeap = (yearCol % 4 === 0 && yearCol % 100 =!= 0) || (yearCol % 400 === 0)
    val adjDoy = when(isLeap && doyCol >= 60, doyCol + 1).otherwise(doyCol)
    to_timestamp(concat(yearCol, lit("-01-01"))) + make_dt_interval(adjDoy - 1)
  }

  /** R4 normalize_times, 360-day calendar (HadGEM-style: every month is
    * exactly 30 days, doy ∈ [1, 360]). Month = (doy-1)/30 + 1, day =
    * (doy-1)%30 + 1; days 29/30 of a "February" overflow the Gregorian
    * month and are clamped to its last real day (cftime's standard
    * convert-calendar behavior: nearest valid date, never a month
    * shift). Pure expression, codegen-friendly. */
  def cal360ToTimestamp(yearCol: Column, doyCol: Column): Column = {
    val y = yearCol.cast("int")
    val m = (((doyCol - 1) / 30).cast("int") + 1)
    val d = ((doyCol - 1) % 30).cast("int") + 1
    val dClamped = least(d, dayofmonth(last_day(make_date(y, m, lit(1)))))
    to_timestamp(make_date(y, m, dClamped))
  }

  /** xarray `.rolling(time=k).mean()` — the rolling-statistics surface
    * (trailing k-STEP window per cell over the observed axis, ROWS
    * frame; a gapped axis rolls over observed steps, xarray's
    * positional semantics). Emits the exact-integer window sum and
    * non-null count plus the mean — the ONE division of exact longs,
    * correctly rounded identically in both engines, so the mean grades
    * unrounded (the pipeline_nc precedent). `minPeriods` nulls the
    * mean until enough non-null samples arrive (xarray's min_periods).
    * One shuffle on the group key; both window functions share the
    * frame. */
  def rollingMean(df: DataFrame, groupCols: Seq[String], axisCol: String,
                  valCol: String, k: Int, minPeriods: Int = 1): DataFrame = {
    require(k >= 1 && minPeriods >= 1 && minPeriods <= k,
      s"need 1 <= minPeriods <= k, got k=$k minPeriods=$minPeriods")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(axisCol)).rowsBetween(-(k - 1), 0)
    df.withColumn("n_win", count(col(valCol)).over(w))
      .withColumn("roll_sum", sum(col(valCol)).over(w))
      .withColumn("roll_mean", when(col("n_win") >= minPeriods,
        col("roll_sum").cast("double") / col("n_win").cast("double")))
  }

  // ---- EOF analysis (r17) ------------------------------------------
  /** Densified, quantized ANOMALY field for EOF analysis over a
    * long-form `(t, i, x)` frame — t the time-step key, i a bounded
    * integer cell index, x the exact-integer field value. Missing
    * (t, i) combos densify to 0; the per-cell time mean is removed by
    * CROSS-MULTIPLICATION (a = n·x − Σ_t x — scaling all anomalies by
    * n preserves eigenvectors exactly, so the mean removal is pure
    * long arithmetic); the scaled anomaly then re-quantizes to the
    * 1e6 grid by the global max via the ONE shared IEEE sequence
    * floor(a/max·1e6 + 0.5) (m = 0 keeps a unscaled). Overflow audit:
    * |a| ≤ 2·n·max|x| — at decade-2 (n = 30 days, cell-day micros
    * sums ≤ ~1e13) that is ~6e14, four orders inside 2⁶³; a
    * multi-decade daily axis at 100 TB (n ~ 1e4, sums ~ 1e15)
    * approaches the edge — rescale micros → millis upstream there.
    *
    * Scale shape: days × cells cross join is (time steps × bounded
    * grid) — the dense field itself, not a blowup; per-cell totals
    * and the global n/max enter as broadcast 1-row/grid-sized
    * aggregates, never a window funnel. */
  private[graft] def eofAnomalyQuant(base: DataFrame): DataFrame = {
    val days = base.select(col("t")).distinct()
    val cells = base.select(col("i")).distinct()
    val n1 = days.agg(count(lit(1)).as("n"))
    val tot = base.groupBy(col("i"))
      .agg(coalesce(sum(col("x")), lit(0L)).as("s"))
    val dense = days.crossJoin(cells)
      .join(base, Seq("t", "i"), "left")
      .withColumn("xv", coalesce(col("x"), lit(0L)))
      .join(tot, Seq("i"))
      .crossJoin(n1)
      .withColumn("a", col("n") * col("xv") - col("s"))
    val am1 = dense.agg(max(abs(col("a"))).as("am"))
    dense.crossJoin(am1)
      .withColumn("aq", when(col("am") === 0L, col("a")).otherwise(
        floor(col("a").cast("double") / col("am").cast("double")
          * 1000000.0 + 0.5).cast("long")))
      .select(col("t"), col("i"), col("aq"))
  }

  private val eofCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int), (Seq[Int], IndexedSeq[Long])]

  /** Leading EOF (Empirical Orthogonal Function) of the field — THE
    * canonical climate-analysis decomposition (the `eofs` package's
    * core op; NAO/ENSO patterns are its leading modes): the first
    * eigenvector of the spatial covariance of the time-mean-removed
    * field. Runs [[Vectors.powerIterate]] — the IDENTICAL quantized
    * power iteration the PCA keys grade — on the cell×cell Gram of
    * [[eofAnomalyQuant]]'s exact-integer anomaly field. The Gram is
    * bounded by the GRID (cells²), never the corpus, so the driver
    * collect is the MLlib PCA shape (the pcaLoadings allowlist
    * entry); aq products ≤ 1e12 keep the distributed sums exact to
    * ~9e6 time steps. Returns (observed cell indices, loading vector
    * indexed by cell id); memoized per (session, input plan, iters)
    * so the loading-map and PC-series keys share one Gram job. */
  private[graft] def eofLoadings(base: DataFrame,
                                 iters: Int = 3): (Seq[Int], IndexedSeq[Long]) =
    eofCache.getOrElseUpdate(
      (org.apache.spark.sql.GraftBridge.sessionUUID(base.sparkSession),
        base.queryExecution.analyzed.semanticHash(), iters), {
        // the Gram self-join reads aq twice and aq reads `base` three
        // times — cache the (time × grid)-bounded quantized field for
        // the one action instead of re-running the events aggregate
        // ~6× inside one plan (r17 bench find)
        val aq = eofAnomalyQuant(base).cache()
        val g = try {
          aq.select(col("t"), col("i").as("ai"), col("aq").as("av"))
            .join(aq.select(col("t"), col("i").as("bi"), col("aq").as("bv")),
              "t")
            .groupBy(col("ai"), col("bi"))
            .agg(sum(col("av") * col("bv")).as("cij"))
            .collect()
        } finally aq.unpersist()
        val entries = g.map(r =>
          (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
        // observed cells = indices with a Gram row (every observed
        // cell has its self-pair); gap indices stay out of the output
        (entries.map(_._1).distinct.sorted.toSeq,
          Vectors.powerIterate(entries.toSeq, iters))
      })
}

/** SURVEY §2.9 family G — the climate surface exercised on harness data
  * (events plays the role of the cell table: ts=time, user_id=lat-like,
  * value=variable), each an oracle-matched analog of R6–R11.
  */
object Climate {

  /** One cached member union per (session, dir, stage): alignMembers
    * reads it three times per invocation and repeated invocations
    * reuse one materialized cells table (the shingleCache pattern);
    * call [[clearEnsembleCache]] on session teardown. The stage tag
    * separates the q_climate_ensemble union from the q_climate_pipeline
    * pre-align grid. */
  private val ensembleCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), DataFrame]

  /** Unpersist and drop the memoized ensemble unions. */
  def clearEnsembleCache(): Unit = {
    ensembleCache.values.foreach { df =>
      try df.unpersist() catch { case _: Exception => () }
    }
    ensembleCache.clear()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R6 select_season analog: "season" = days-of-month {1..3} ∪ {29..31}
    // (month-boundary wrap, like DJF spanning the year edge).
    "q_climate_season" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(dayofmonth(col("ts")) <= 3 || dayofmonth(col("ts")) >= 29)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("cnt"),
          sum(micros(col("value"))).cast("long").as("sum_micros"))
        .orderBy(col("event_type"))
    },

    // R8 resample('1D') analog: daily mean/min/max.
    "q_climate_resample" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(micros(col("value"))).cast("long").as("sum_micros"),
          min(micros(col("value"))).cast("long").as("min_micros"),
          max(micros(col("value"))).cast("long").as("max_micros"))
        .select(tstr(col("day")).as("day"), col("n"),
          (col("sum_micros").cast("double") / 1000000.0 / col("n")).as("mean_v"),
          col("min_micros"), col("max_micros"))
        .orderBy(col("day"))
    },

    // R9 climatology analog: hour-of-day plays month-of-year.
    "q_climate_climatology" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(micros(col("value"))).cast("long").as("sum_micros"))
        .select(col("hr"), col("n"),
          (col("sum_micros").cast("double") / 1000000.0 / col("n")).as("mean_v"))
        .orderBy(col("hr"))
    },

    // R10 anomaly analog: value − hour-of-day mean. Two-pass shape:
    // groupBy(hour) reduces to 24 exact-integer (sum, count) rows that
    // broadcast-join back onto the fact rows. A window partitioned by
    // hour computes the same numbers but funnels 1/24th of the table
    // through each sort task — at 100× scale that single-reducer sort
    // is the bottleneck; the partial-agg + broadcast form touches each
    // row once with no per-group sort and is exactly how the
    // climatology key already aggregates (identical integer math ⇒
    // identical hash).
    "q_climate_anomaly" -> { (s, dir) =>
      val hourly = Tables.events(s, dir)
        .groupBy(hour(col("ts")).as("_hr"))
        .agg(sum(micros(col("value"))).as("sw"), count(lit(1)).as("cw"))
      Tables.events(s, dir)
        .withColumn("m", micros(col("value")))
        // null-safe: the oracle's window keeps NULL-ts rows as their
        // own hour group; a null-unsafe join would silently drop them
        .join(broadcast(hourly), hour(col("ts")) <=> col("_hr"))
        // No rounding: every operand is an exact integer, so the double
        // result is bit-identical across engines (identical IEEE op
        // sequence) — rounding would only *introduce* a decimal-vs-binary
        // half-way ambiguity (observed: -38.93975 rounds differently).
        .select(col("event_id"), hour(col("ts")).cast("long").as("hr"),
          ((col("m").cast("double") - col("sw").cast("double") / col("cw"))
            / 1000000.0).as("anom"))
        .orderBy(col("event_id"))
    },

    // Linear DETRENDING (r5; EXACT-MOMENTS rebuild r17) — the
    // climate-analysis staple the anomaly key doesn't cover: remove
    // each series' OLS trend over time (xarray's polyfit/polyval
    // detrend shape), here per event_type. Until r17 this rode
    // regr_slope/intercept, whose streaming moment updates carry
    // ~1e-11 summation-ORDER noise — "far inside the 4-dp grid"
    // except on the measure-zero rounding boundaries, and the r17
    // decade-2 sweep (48.6M rows, seed 7) finally landed ONE residual
    // on a boundary (spark 32.4041 vs duck 32.4042). Rebuilt on the
    // exact-integer-moments form: t = micros since a fixed reference
    // (exact long), y = exact micros; Σt, Σt², Σy, Σty accumulate as
    // DECIMAL(38,0) (order-free exact; DuckDB mirrors via HUGEINT),
    // and slope/intercept/residual are ONE fixed IEEE sequence over
    // the deterministically-cast moments — bit-identical at ANY scale
    // and summation order, so the 4-dp round can never diverge.
    // d = 0 (a single distinct time, the --one tier) yields NULL
    // slope → NULL residuals, regr_slope's behavior.
    "q_climate_detrend" -> { (s, dir) =>
      val refMicros = 1704067200000000L // 2024-01-01T00:00:00Z
      val dec = "decimal(38,0)"
      val ev = Tables.events(s, dir)
        .withColumn("t", unix_micros(col("ts")) - lit(refMicros))
      val fit = ev.filter(col("value").isNotNull)
        .withColumn("ym", micros(col("value")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("t").cast(dec)).cast("double").as("st"),
          sum(col("t").cast(dec) * col("t").cast(dec)).cast("double").as("st2"),
          sum(col("ym").cast(dec)).cast("double").as("sy"),
          sum(col("t").cast(dec) * col("ym").cast(dec)).cast("double").as("sty"))
        .withColumn("dd", col("n") * col("st2") - col("st") * col("st"))
        .withColumn("bm", when(col("dd") === 0.0, lit(null))
          .otherwise((col("n") * col("sty") - col("st") * col("sy")) / col("dd")))
        .withColumn("am", (col("sy") - col("bm") * col("st")) / col("n"))
        .select(col("event_type"), col("bm"), col("am"))
      ev.join(broadcast(fit), "event_type")
        .select(col("event_id"), col("event_type"),
          r4(col("value") -
            (col("bm") * col("t").cast("double") + col("am")) / 1000000.0)
            .as("resid"))
        .orderBy(col("event_id"))
    },

    // Ensemble member-algebra GRADED end-to-end (r6, VERDICT r5 #5) —
    // bcdp's core container workflow (load members → align on common
    // cells → model-vs-model bias), run through the ACTUAL Ensemble
    // API (of/addMember/alignMembers), not a hand-inlined copy: two
    // "model" members are derived deterministically from events
    // (even/odd event_id) as (day, user-band, hour) cell means, the
    // union-tagged long-form ensemble aligns via alignMembers()'s
    // distinct-count semi-filter, and the bias diff pivots the two
    // members back side by side. Determinism: each member value is
    // exact-integer sums → the resample key's division shape; bias is
    // one further IEEE subtraction of bit-identical doubles. In
    // DuckDB the same workflow is two grouped CTEs and an inner join
    // (alignment on 2 members == presence in both).
    "q_climate_ensemble" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("m", micros(col("value")))
        .withColumn("time", tstr(date_trunc("day", col("ts"))))
        .withColumn("lat", floor(col("user_id") / 10).cast("long"))
        .withColumn("lon", hour(col("ts")).cast("long"))
      // ONE events pass (r17 optimization round, guide §2.4): the
      // member split used to run filter(par)+groupBy TWICE and union —
      // two full fact scans for rows one aggregate keyed by (par,
      // cell) already separates. r18 (ADVICE r17): the tag keys on
      // par ∈ {0, 1} explicitly — Spark's % keeps the dividend's sign,
      // so a negative odd event_id yields par = -1, which the old
      // filter(=== 1) DROPPED but a bare otherwise("mb") would keep;
      // isin(0, 1) also covers the NULL drop.
      val tagged = ensembleCache.getOrElseUpdate(
        (org.apache.spark.sql.GraftBridge.sessionUUID(s), dir, "ensemble"), {
          ev.groupBy((col("event_id") % 2).as("par"),
              col("time"), col("lat"), col("lon"))
            .agg(sum(col("m")).as("sm"), count(lit(1)).as("n"))
            .filter(col("par").isin(0, 1))
            .select(col("time"), col("lat"), col("lon"),
              (col("sm").cast("double") / 1000000.0 / col("n")).as("value"),
              when(col("par") === 0, lit("ma")).otherwise(lit("mb"))
                .as("dataset"))
            .cache() // align reads the union 3×; it is |cells|-sized
        })
      graft.Ensemble.of(tagged)
        // declared count 2: member(1) can be legitimately EMPTY (a
        // single-event corpus has no odd event_ids) and inference
        // cannot see an empty member (r11 single-row-tier find) —
        // alignment must then be empty, like the oracle's inner join
        .alignMembers(declaredMembers = 2)
        .df
        .groupBy(col("time"), col("lat"), col("lon"))
        .agg(max(when(col("dataset") === "ma", col("value"))).as("va"),
          max(when(col("dataset") === "mb", col("value"))).as("vb"))
        .withColumn("bias", col("va") - col("vb"))
        .orderBy(col("time"), col("lat"), col("lon"))
    },

    // R7 method=linear analog: bilinear interpolation on the
    // (user-band × hour) grid of mean values, sampled at the fractional
    // offset (+0.25, +0.25) inside each complete cell. Weights 9/16,
    // 3/16, 3/16, 1/16 are exact binary fractions, the blend is written
    // as ONE fixed-association expression (w00·v00 + w01·v01 + w10·v10
    // + w11·v11) on both engines — no aggregation order in the FP path,
    // so the unrounded double is bit-stable. Incomplete edge cells
    // (glon=23, max glat) drop out of the inner 4-join on both sides.
    "q_climate_regrid_bilinear" -> { (s, dir) =>
      val src = Tables.events(s, dir)
        .withColumn("m", micros(col("value")))
        .groupBy(floor(col("user_id") / 10).cast("long").as("glat"),
          hour(col("ts")).cast("long").as("glon"))
        .agg(sum(col("m")).as("sm"), count(lit(1)).as("n"))
        .select(col("glat"), col("glon"),
          (col("sm").cast("double") / 1000000.0 / col("n")).as("v"))
      // ONE pass (r17 optimization round, guide §2.4): the previous
      // form derived four shifted copies of `src` and inner-joined
      // them — four full events scans + aggregations of the SAME
      // subtree (AQE's exchange reuse is off below the tiny-input
      // gate, and at scale four passes is four passes). Equivalent
      // algebra: each src cell scatters its value into the ≤4 target
      // keys it serves as a corner of (tagged), then ONE groupBy
      // pivots the tags back into v00..v11; nc = 4 reproduces the
      // inner-join semantics exactly (src keys are unique post-agg,
      // so each tag appears at most once per target). Null keys
      // filtered explicitly — the USING join never matched them, while
      // groupBy would have grouped them (glat−1 stays NULL).
      val tagged = src
        .filter(col("glat").isNotNull && col("glon").isNotNull)
        .select(explode(array(
          struct(col("glat"), col("glon"), lit(0).as("c"), col("v")),
          struct(col("glat"), (col("glon") - 1).as("glon"), lit(1).as("c"), col("v")),
          struct((col("glat") - 1).as("glat"), col("glon"), lit(2).as("c"), col("v")),
          struct((col("glat") - 1).as("glat"), (col("glon") - 1).as("glon"),
            lit(3).as("c"), col("v")))).as("e"))
        .select(col("e.glat").as("glat"), col("e.glon").as("glon"),
          col("e.c").as("c"), col("e.v").as("v"))
      tagged.groupBy(col("glat"), col("glon"))
        .agg(count(lit(1)).as("nc"),
          max(when(col("c") === 0, col("v"))).as("v00"),
          max(when(col("c") === 1, col("v"))).as("v01"),
          max(when(col("c") === 2, col("v"))).as("v10"),
          max(when(col("c") === 3, col("v"))).as("v11"))
        .filter(col("nc") === 4)
        .select(col("glat"), col("glon"),
          (lit(0.5625) * col("v00") + lit(0.1875) * col("v01")
            + lit(0.1875) * col("v10") + lit(0.0625) * col("v11")).as("interp_v"))
        .orderBy(col("glat"), col("glon"))
    },

    // R7 method=nearest analog (the curvilinear-capable path): treat
    // the distinct (user_id, hour) pairs as an irregular scatter of
    // source nodes and snap a 10×10 target mesh to each node's nearest
    // source by blocked NN — target nodes explode into 3×3 neighbor
    // tiles (block=16), one equi-join, rank by squared distance with
    // (sx, sy) tie-break. ALL-INTEGER math end to end: coordinates,
    // distances and values are BIGINTs, so the hash match is exact by
    // construction. Both engines compute the same bounded-radius
    // algorithm (tile join expressed as BETWEEN in SQL).
    "q_climate_regrid_nearest" -> { (s, dir) =>
      val src = Tables.events(s, dir)
        .groupBy(col("user_id").as("sx"), hour(col("ts")).cast("long").as("sy"))
        .agg(count(lit(1)).cast("long").as("v"))
        .select(floor(col("sx") / 16).cast("long").as("bx"),
          floor(col("sy") / 16).cast("long").as("by"),
          col("sx"), col("sy"), col("v"))
      val tgt = s.range(10).select((col("id") * 15 + 7).as("tx"))
        .crossJoin(s.range(10).select((col("id") * 2 + 1).as("ty")))
      val offsets = array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
        struct(lit(dy.toLong).as("dy"), lit(dx.toLong).as("dx")))): _*)
      val cands = tgt.withColumn("o", explode(offsets))
        .select(col("tx"), col("ty"),
          (floor(col("tx") / 16).cast("long") + col("o.dy")).as("bx"),
          (floor(col("ty") / 16).cast("long") + col("o.dx")).as("by"))
      val d2 = (col("sx") - col("tx")) * (col("sx") - col("tx")) +
        (col("sy") - col("ty")) * (col("sy") - col("ty"))
      val w = Window.partitionBy(col("tx"), col("ty"))
        .orderBy(col("d2"), col("sx"), col("sy"))
      cands.join(src, Seq("bx", "by"))
        .withColumn("d2", d2)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("tx"), col("ty"), col("sx"), col("sy"), col("v"), col("d2"))
        .orderBy(col("tx"), col("ty"))
    },

    // R7 method=linear on a CURVILINEAR scatter (ClimateOps.regridIdw
    // analog): 3-nearest inverse-distance-weighted interpolation over
    // the same blocked integer scatter as the nearest key. The ≤3
    // neighbors pivot into FIXED slots (rn=1,2,3), and the blend is one
    // fixed-association expression ((t1+t2)+t3)/((w1+w2)+w3) over
    // exact-integer v and d² — identical IEEE op sequence in both
    // engines, so the unrounded double hash-matches (the bilinear key's
    // discipline). Exact node hits (d²=0) short-circuit to the node
    // value — ANSI Spark throws on the 0-divisor otherwise.
    "q_climate_regrid_idw" -> { (s, dir) =>
      val src = Tables.events(s, dir)
        .groupBy(col("user_id").as("sx"), hour(col("ts")).cast("long").as("sy"))
        .agg(count(lit(1)).cast("long").as("v"))
        .select(floor(col("sx") / 16).cast("long").as("bx"),
          floor(col("sy") / 16).cast("long").as("by"),
          col("sx"), col("sy"), col("v"))
      val tgt = s.range(10).select((col("id") * 15 + 7).as("tx"))
        .crossJoin(s.range(10).select((col("id") * 2 + 1).as("ty")))
      val offsets = array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
        struct(lit(dy.toLong).as("dy"), lit(dx.toLong).as("dx")))): _*)
      val cands = tgt.withColumn("o", explode(offsets))
        .select(col("tx"), col("ty"),
          (floor(col("tx") / 16).cast("long") + col("o.dx")).as("bx"),
          (floor(col("ty") / 16).cast("long") + col("o.dy")).as("by"))
      val ndE = (col("sx") - col("tx")) * (col("sx") - col("tx")) +
        (col("sy") - col("ty")) * (col("sy") - col("ty"))
      val w = Window.partitionBy(col("tx"), col("ty"))
        .orderBy(col("nd"), col("sx"), col("sy"))
      cands.join(src, Seq("bx", "by"))
        .withColumn("nd", ndE)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy(col("tx"), col("ty"))
        .agg(
          max(when(col("rn") === 1, col("nd"))).as("d1"),
          max(when(col("rn") === 1, col("v"))).as("v1"),
          max(when(col("rn") === 2, col("nd"))).as("d2s"),
          max(when(col("rn") === 2, col("v"))).as("v2"),
          max(when(col("rn") === 3, col("nd"))).as("d3"),
          max(when(col("rn") === 3, col("v"))).as("v3"))
        .select(col("tx"), col("ty"),
          when(col("d1") === 0, col("v1").cast("double"))
            .otherwise(
              (col("v1") / col("d1") + coalesce(col("v2") / col("d2s"), lit(0.0))
                + coalesce(col("v3") / col("d3"), lit(0.0)))
              / (lit(1.0) / col("d1") + coalesce(lit(1.0) / col("d2s"), lit(0.0))
                + coalesce(lit(1.0) / col("d3"), lit(0.0)))).as("idw_v"))
        .orderBy(col("tx"), col("ty"))
    },

    // The canonical bcdp WORKFLOW graded end-to-end (r7, VERDICT r6
    // #1): load → homogenize → subset → selectSeason → regridBin →
    // resample → convertUnits → alignMembers → anomaly/climatology,
    // every stage through the REAL chained Ensemble API (the script
    // tools/ClimatePipelineDemo.scala runs), so the COMPOSITION — not
    // just the individually-oracled operators — hash-matches DuckDB's
    // CTE chain. Members: even/odd event_id. Cells: time = hour-trunc
    // ts shifted by (user_id%12)·30 days (exact day-interval math, so
    // the month-filtering stages do real work on one-month event
    // data), lat = user band, lon = (user_id%36)·10 ∈ [0,350] (so
    // homogenize's antimeridian wrap does real work). Determinism: the
    // gridded stages ride the MASS-CONSERVING pooling (regridBin/
    // resample agg="sum" — xarray's .resample().sum(), the
    // integral-preserving regrid form), so every intermediate `value`
    // is an exact INTEGER micros sum carried in doubles: order-free in
    // both engines, zero accumulated ulps. The first chained-mean
    // draft failed sf0.1 on a .00005 rounding tie (spark −24.2918 vs
    // duck −24.2917) — avg-of-avg summation-order noise is real, and
    // the sum form is the cross-engine-gradeable composition (the mean
    // forms stay individually graded by q_climate_regrid/resample).
    // The only division is terminal: the anomaly window's one
    // correctly-rounded avg over exact sums — so value/anomaly/clim
    // are BIT-IDENTICAL doubles both engines and grade UNROUNDED on
    // the micros scale (the q_win_percentrank precedent). They must:
    // a second draft that r4'd a 1e6 de-scaling failed sf0.1 on a
    // .00005 ROUND tie — micros-grain decimals land on ties often,
    // and Spark (BigDecimal HALF_UP) vs DuckDB (nearbyint half-even)
    // disagree there. No rounding, no ties. Integer envelope: Σ micros
    // at sf0.1 ≈ 1e15 < 2^53; at 100 TB the member build rides
    // decimal(38,0) like Skew.saltedSum (documented, not graded).
    "q_climate_pipeline" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("m", micros(col("value")))
        .withColumn("time", date_trunc("hour", col("ts")) +
          expr("make_dt_interval(CAST((user_id % 12) * 30 AS INT))"))
        .withColumn("lat", floor(col("user_id") / 10).cast("double"))
        .withColumn("lon", ((col("user_id") % 36) * 10).cast("double"))
      // ONE events pass for the member split (r17 optimization round,
      // guide §2.4 — the q_climate_ensemble move): one aggregate keyed
      // by (par, cell) + a when() tag replaces filter+groupBy per
      // member (two full fact scans) and the union. isin(0, 1)
      // reproduces the old filters' drop of negative-odd par = -1
      // rows (and NULLs) — see the q_climate_ensemble note.
      val cells = ev
        .groupBy((col("event_id") % 2).as("par"),
          col("time"), col("lat"), col("lon"))
        .agg(sum(col("m")).as("sm"))
        .filter(col("par").isin(0, 1))
        .select(col("time"), col("lat"), col("lon"),
          col("sm").cast("double").as("value"),
          when(col("par") === 0, lit("ma")).otherwise(lit("mb")).as("dataset"))
      // Cache at the align boundary: by here the chain has reduced to
      // the coarse (dataset, day, 5°×60° cell) grid — alignMembers
      // reads its input 3× (member count, per-cell counts, semi base),
      // and uncached each read re-executes the full event scan per
      // read (at 100 TB that's the difference between re-scanning the
      // archive thrice and re-reading a few thousand materialized
      // grid rows).
      val pre = graft.Ensemble.of(cells)
        .homogenize()
        .subset(1, 13, -150, 150, "2024-01-05 00:00:00", "2024-12-20 00:00:00")
        .selectSeason(Seq(12, 1, 2)) // DJF
        .regridBin(5.0, 60.0, agg = "sum")
        .resample("day", agg = "sum")
        .convertUnits(2.0, 1.0)
      val preDf = ensembleCache.getOrElseUpdate(
        (org.apache.spark.sql.GraftBridge.sessionUUID(s), dir, "pipeline"),
        pre.df.cache())
      val out = graft.Ensemble.of(preDf).alignMembers(declaredMembers = 2)
      // clim = value − anomaly re-derives the windowed climatology
      // through the SAME two-subtraction op sequence the oracle runs
      // (value − (value − avg) is NOT bitwise avg — both engines must
      // compute it identically, not simplify it).
      out.anomaly()
        .select(col("dataset"), tstr(col("time")).as("time"),
          col("lat"), col("lon"),
          col("value").cast("long").as("value_mu"),
          col("anomaly").as("anomaly_mu"),
          (col("value") - col("anomaly")).as("clim_mu"))
        .orderBy(col("dataset"), col("time"), col("lat"), col("lon"))
    },

    // R4 calendar normalization GRADED (r7, VERDICT r6 #2): both
    // non-Gregorian model calendars — 360-day (HadGEM) and noleap
    // (365-day) — mapped onto the real timestamp axis by the ACTUAL
    // library expressions (ClimateOps.cal360ToTimestamp /
    // noleapToTimestamp) over a planted (year, day-index) fixture
    // derived from event_id. Years 2023..2025 cover a leap year
    // (2024), so the noleap Feb-29 skip and the 360-cal Feb-29/30
    // clamp both exercise their branch. Output is formatted strings —
    // pure integer/date-part arithmetic, exact in both engines.
    "q_climate_calendar" -> { (s, dir) =>
      val fx = Tables.events(s, dir)
        .select((lit(2023) + col("event_id") % 3).as("y"),
          (lit(1) + col("event_id") % 360).as("doy360"),
          (lit(1) + col("event_id") % 365).as("doy365"))
        .distinct()
      fx.select(col("y"), col("doy360"), col("doy365"),
          tstr(ClimateOps.cal360ToTimestamp(col("y"), col("doy360"))).as("t360"),
          tstr(ClimateOps.noleapToTimestamp(col("y"), col("doy365"))).as("t365"))
        .orderBy(col("y"), col("doy360"), col("doy365"))
    },

    // R7/R11 regrid-bin analog: (user-band × value-band) 2-D binning
    // with per-bin count + mean — conservative regrid onto a coarse mesh.
    "q_climate_regrid" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("m", micros(col("value")))
        .groupBy(
          floor(col("user_id") / 10).cast("long").as("ubin"),
          least(floor(col("m") / 50000000.0), lit(9.0)).cast("long").as("vbin"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("m")).cast("long").as("sum_micros"))
        .select(col("ubin"), col("vbin"), col("n"),
          (col("sum_micros").cast("double") / 1000000.0 / col("n")).as("mean_v"))
        .orderBy(col("ubin"), col("vbin"))
    },

    // R9 zonalMean GRADED (r15): the last spec-only Ensemble reduction
    // with exact cross-engine semantics gets a hash grade. The member
    // grid rides the standard events mapping (day × user-band lat ×
    // (user_id%36)·10 lon, value = exact integer micros sum); zonalMean
    // collapses the lon axis per (dataset, time, lat). Determinism: the
    // per-cell values are exact integer micros in doubles, so the avg's
    // sum is order-free and the one division is correctly rounded
    // identically in both engines — graded UNROUNDED (the
    // q_climate_pipeline anomaly precedent).
    "q_climate_zonal" -> { (s, dir) =>
      val g = Tables.events(s, dir)
        .withColumn("m", micros(col("value")))
        .groupBy(date_trunc("day", col("ts")).as("time"),
          floor(col("user_id") / 10).cast("double").as("lat"),
          ((col("user_id") % 36) * 10).cast("double").as("lon"))
        .agg(sum(col("m")).cast("double").as("value"))
        .withColumn("dataset", lit("m0"))
      graft.Ensemble.of(g).zonalMean()
        .select(col("dataset"), tstr(col("time")).as("time"), col("lat"),
          col("value").as("zmean_mu"))
        .orderBy(col("dataset"), col("time"), col("lat"))
    },

    // §1.1 multi-variable Dataset GRADED, melt direction (r15): a wide
    // two-variable frame (tas = exact micros sum, psl = count) through
    // the REAL meltVariables (codegen'd stack, no shuffle) — the long
    // form must carry one row per (cell, variable) with the wide value,
    // vs the oracle's UNION ALL. An all-NULL tas cell stays a row with
    // a NULL value in both engines (stack does not drop NULLs).
    "q_climate_melt" -> { (s, dir) =>
      ClimateOps.meltVariables(wideVars(s, dir), Seq("tas", "psl"))
        .select(col("dataset"), tstr(col("time")).as("time"),
          col("lat"), col("lon"), col("variable"), col("value"))
        .orderBy(col("dataset"), col("time"), col("lat"), col("lon"),
          col("variable"))
    },

    // §1.1 pivot direction (r15): the SAME long form back through
    // pivotVariables (groupBy cell + pivot + first — one shuffle; first
    // is deterministic because the long form has exactly one row per
    // (cell, variable)) — the wide frame must survive the round trip,
    // vs the oracle computing the wide frame DIRECTLY from events.
    // Equality holds iff melt ∘ pivot is the identity cross-engine.
    "q_climate_pivot" -> { (s, dir) =>
      ClimateOps.pivotVariables(
          ClimateOps.meltVariables(wideVars(s, dir), Seq("tas", "psl")),
          values = Seq("psl", "tas"))
        .select(col("dataset"), tstr(col("time")).as("time"),
          col("lat"), col("lon"), col("psl"), col("tas"))
        .orderBy(col("dataset"), col("time"), col("lat"), col("lon"))
    },

    // R11 spatialMeanWeighted GRADED (r16, VERDICT r15 #2) — the last
    // ungraded Ensemble reduction. The cos-lat weights are computed
    // ONCE driver-side, integer-quantized (round(cos·1e6)), and the
    // IDENTICAL literals are inlined into both plans — a CASE over the
    // 19 lat bands here, the same CASE text in the DuckDB oracle — so
    // the weights stop being a libm portability question entirely.
    // Cell values are exact integer counts; every product and both
    // sums are therefore exact longs, and the one terminal division is
    // correctly rounded identically in both engines (the zonal/anomaly
    // argument). Lat bands -81..81 step 9 keep every weight strictly
    // positive (no 0/0 pole group); an out-of-table band (negative or
    // NULL user_id artifacts) falls to weight 1 in BOTH engines.
    "q_climate_spatial_weighted" -> { (s, dir) =>
      val cells = Tables.events(s, dir)
        .groupBy(col("event_type").as("dataset"),
          date_trunc("day", col("ts")).as("time"),
          ((col("user_id") % 19 - 9) * 9).cast("double").as("lat"))
        .agg(count(lit(1)).as("value"))
      val w = swLats.tail
        .foldLeft(when(col("lat") === swLats.head, lit(swWq(swLats.head)))) {
          (acc, l) => acc.when(col("lat") === l, lit(swWq(l)))
        }.otherwise(lit(1L))
      graft.Ensemble.of(cells).spatialMeanWeighted(Some(w))
        .select(col("dataset"), tstr(col("time")).as("time"),
          col("value").as("wmean"))
        .orderBy(col("dataset"), col("time"))
    },

    // xarray interpolate_na GRADED (r16): linear gap fill between the
    // nearest non-null neighbors along the event_id axis, per user
    // series — deterministic planted gaps (event_id % 7, the q_win_fill
    // convention; the --nulls tier adds real value NULLs, mirrored
    // because both sides derive vm identically). Exactness: vm and the
    // axis are exact integers, so the fill is one identically-
    // parenthesized IEEE division/multiply/add in both engines;
    // leading/trailing gaps stay NULL in both.
    "q_climate_interp_na" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("vm", when(col("event_id") % 7 === 0, lit(null))
          .otherwise(micros(col("value"))))
        .select(col("event_id"), col("user_id"), col("vm"))
      ClimateOps.interpolateNa(ev, Seq("user_id"), "event_id", "vm")
        .select(col("event_id"), col("user_id"), col("vm").as("v_interp"))
        .orderBy(col("event_id"))
    },

    // Empirical QUANTILE-MAPPING bias correction GRADED (r16): per
    // (event_type, user band) — the group key carries the cardinality
    // the op's scale shape needs (per-group sorts are inherent to
    // exact empirical QM; in climate use the group is the (cell,
    // season), thousands of groups — a bare 5-value event_type window
    // would be the r2-verdict funnel class). Even-id events play the
    // reference series, odd-id events the model; each model value maps
    // to the obs quantile at its own empirical rank (type-7
    // interpolation between order statistics). Exactness: micros
    // values are exact integers, ranks/counts exact, and r, h, and the
    // interpolation are the identical IEEE sequence in both engines
    // (ties broken on event_id, so the rank itself is total-order
    // stable). NULL values are excluded on both sides identically; the
    // --one tier empties one series and yields zero rows both sides.
    "q_climate_qmap" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("m", micros(col("value")).cast("double"))
        .withColumn("band", (col("user_id") % 50).cast("long"))
      ClimateOps.quantileMap(
          model = ev.filter(col("event_id") % 2 === 1),
          obs = ev.filter(col("event_id") % 2 === 0),
          groupCols = Seq("event_type", "band"),
          valueCol = "m", idCol = "event_id")
        .select(col("event_id"), col("event_type"), col("band"), col("m"),
          col("corrected"))
        .orderBy(col("event_id"))
    },

    // R7 method=conservative (r17): TRUE fractional-overlap remap
    // through the real ClimateOps.regridConservative — a 20×24 grid of
    // 3-unit source cells (per-cell event counts) onto a 2-unit target
    // mesh. 3 vs 2 never nests, so every interior target blends 2 or 4
    // sources with weights {1,2,4} — exact integers (planar mode), the
    // sums stay exact longs-in-doubles, and the one terminal division
    // is correctly rounded in both engines: hash-exact by
    // construction, and w_sum grades the WEIGHTS themselves, not just
    // the blend.
    "q_climate_regrid_conserv" -> { (s, dir) =>
      val src = Tables.events(s, dir)
        .groupBy((col("user_id") % 20).cast("long").as("glat"),
          hour(col("ts")).cast("long").as("glon"))
        .agg(count(lit(1)).cast("double").as("value"))
        .select(lit("m").as("dataset"),
          lit("2000-01-01 00:00:00").cast("timestamp").as("time"),
          (col("glat") * 3.0 + 1.5).as("lat"),
          (col("glon") * 3.0 + 1.5).as("lon"), col("value"))
      ClimateOps.regridConservative(src, 3.0, 3.0, 0.0, 60.0, 0.0, 72.0,
          2.0, 2.0, spherical = false)
        .select(col("tlat"), col("tlon"), col("value"), col("w_sum"))
        .orderBy(col("tlat"), col("tlon"))
    },

    // Per-cell TREND MAP graded (r17): the classic climate product —
    // per (lat-band, lon-band) OLS slope/intercept of daily exact
    // micros volume over the day index, via trendExact's exact
    // integer moments. The key rescales micros → value units BEFORE
    // the 6-dp round so the grid sits ~4 orders above the 1e-15
    // conversion floor even on decade-2 magnitudes (see trendExact's
    // scaladoc); the t axis is CENTERED at a fixed reference day
    // (2024-01-01 = epoch day 19723) — an uncentered epoch-day axis
    // would make the intercept a huge-cancellation extrapolation to
    // 1970 whose ulp exceeds the grid; centered, Σt/Σt² stay small
    // exact ints and the intercept is the reference-day level.
    "q_climate_trend" -> { (s, dir) =>
      val cells = Tables.events(s, dir)
        .groupBy((unix_date(to_date(col("ts"))) - lit(19723)).cast("long")
            .as("d"),
          floor(col("user_id") / 10).cast("long").as("glat"),
          (col("user_id") % 36).cast("long").as("glon"))
        .agg(sum(micros(col("value"))).as("x"))
      ClimateOps.trendExact(cells, Seq("glat", "glon"), "d", "x")
        .select(col("glat"), col("glon"), col("n_obs"),
          round(col("slope") / 1000000.0, 6).as("slope_v"),
          round(col("icept") / 1000000.0, 6).as("icept_v"))
        .orderBy(col("glat"), col("glon"))
    },

    // Per-cell PATTERN CORRELATION graded UNROUNDED (r17): daily
    // (micros volume, event count) per (lat-band, lon-band) cell,
    // correlated across days per cell via corrExact's exact integer
    // moments — the first graded floating-point statistic with NO
    // than the r4 stats keys (the exact-moments noise floor is ~1e-15;
    // the detrend exact-moments rebuild generalized into an op).
    "q_climate_corr_field" -> { (s, dir) =>
      val cells = Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("time"),
          floor(col("user_id") / 10).cast("long").as("glat"),
          (col("user_id") % 36).cast("long").as("glon"))
        .agg(sum(micros(col("value"))).as("x"), count(lit(1)).as("y"))
      ClimateOps.corrExact(cells, Seq("glat", "glon"), "x", "y")
        .orderBy(col("glat"), col("glon"))
    },

    // Spell / run-length detection GRADED (r17): per (event_type ×
    // 8 bands) daily series, a day QUALIFIES when its exact micros
    // daily sum exceeds the series' MEAN daily sum — compared by
    // integer cross-multiplication (s·n_days > Σs), so the predicate
    // is exact, scale-free (≈half the days qualify at EVERY tier —
    // a fixed threshold would saturate at decade 2), and the xclim
    // "days above climatology" shape. The qualifying window shares
    // the spells window's partitioning: ONE shuffle total. All-NULL
    // days carry s = NULL and drop identically in both engines
    // (NULL·n > Σ is NULL). --one: the lone day equals its own mean,
    // strict > yields zero rows both sides.
    "q_climate_spell" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          (col("user_id") % 8).cast("long").as("band"),
          unix_date(to_date(col("ts"))).cast("long").as("d"))
        .agg(sum(micros(col("value"))).as("sv"))
      val gw = Window.partitionBy(col("event_type"), col("band"))
      val qual = daily
        .withColumn("__tot", sum(col("sv")).over(gw))
        .withColumn("__nd", count(col("sv")).over(gw))
        .filter(col("sv") * col("__nd") > col("__tot"))
        .drop("__tot", "__nd")
      ClimateOps.spells(qual, Seq("event_type", "band"), "d", "sv")
        .orderBy(col("event_type"), col("band"), col("spell_start"))
    },

    // Rolling 7-day mean graded UNROUNDED (r17): q_climate_spell's
    // exact daily series through ClimateOps.rollingMean with
    // min_periods = 7 — sums/counts exact longs, the mean their one
    // IEEE division (identical in both engines on exact inputs; the
    // sums stay far below 2^53 so no conversion floor either).
    "q_climate_rolling" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          (col("user_id") % 8).cast("long").as("band"),
          unix_date(to_date(col("ts"))).cast("long").as("d"))
        .agg(sum(micros(col("value"))).as("sv"))
      ClimateOps.rollingMean(daily, Seq("event_type", "band"), "d", "sv",
          k = 7, minPeriods = 7)
        .select(col("event_type"), col("band"), col("d"),
          col("n_win"), col("roll_sum"), col("roll_mean"))
        .orderBy(col("event_type"), col("band"), col("d"))
    },

    // Leading EOF graded end-to-end (r17): the daily field over a
    // FIXED 10×12 cell grid (bounded by design — the spatial
    // resolution, never the corpus), time-mean removed by exact
    // cross-multiplication, quantized power iteration on the
    // cell×cell Gram — the identical integer/IEEE chain q_vec_pca
    // grades, re-derived by the oracle from the same events.
    "q_climate_eof" -> { (s, dir) =>
      val (cells, x) = ClimateOps.eofLoadings(eofBase(s, dir))
      import s.implicits._
      cells.map(i => (i.toLong / 12L, i.toLong % 12L, x(i)))
        .toDF("glat", "glon", "loading")
        .orderBy(col("glat"), col("glon"))
    },

    // The EOF's principal-component TIME SERIES (the NAO/ENSO index
    // shape): score(t) = ⟨aq(t,·), loading⟩ with the fitted loadings
    // inlined as a literal array — one exact-integer dot per time
    // step, sharing the memoized fit and the quantized anomaly field.
    "q_climate_eof_pc" -> { (s, dir) =>
      val base = eofBase(s, dir)
      val (_, x) = ClimateOps.eofLoadings(base)
      if (x.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("d",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("score",
              org.apache.spark.sql.types.LongType))))
      else {
        val arr = array(x.map(v => lit(v)): _*)
        ClimateOps.eofAnomalyQuant(base)
          .groupBy(col("t"))
          .agg(sum(col("aq") *
            element_at(arr, (col("i") + 1).cast("int"))).as("score"))
          .select(col("t").as("d"), col("score"))
          .orderBy(col("d"))
      }
    }
  )

  /** The shared EOF input frame: exact daily micros volume per cell of
    * the fixed 10×12 (user_id%10, user_id%12) grid — events playing
    * the gridded field, the corr_field/trend convention. */
  private def eofBase(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(unix_date(to_date(col("ts"))).cast("long").as("t"),
        ((col("user_id") % 10) * 12 + (col("user_id") % 12))
          .cast("long").as("i"))
      .agg(sum(micros(col("value"))).as("x"))
      // (days × grid)-bounded aggregate read 3× by the PC-scores
      // key's anomaly plan; cached like Tables.cacheable's dimension
      // tables (≤ ~26k rows at decade-2, keyed per tier by plan)
      .cache()

  /** Driver-computed integer cos-lat weights shared by the graded
    * weighted-mean key and its oracle: lat band ↦ round(cos(lat)·1e6).
    * Bands -81..81 step 9 — strictly positive weights (156434..1e6). */
  private val swLats: Seq[Double] = (0 to 18).map(i => (i - 9) * 9.0)
  private val swWq: Map[Double, Long] =
    swLats.map(l => l -> math.round(math.cos(math.toRadians(l)) * 1e6)).toMap

  /** The identical weight CASE, rendered as DuckDB SQL. */
  private def swCaseSql: String =
    "CASE " + swLats.map(l => s"WHEN lat = $l THEN ${swWq(l)}")
      .mkString(" ") + " ELSE 1 END"

  /** The shared wide two-variable frame for the melt/pivot keys:
    * tas = exact integer micros sum (NULL for an all-NULL cell),
    * psl = row count — both order-free exact. */
  private def wideVars(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("time"),
        floor(col("user_id") / 10).cast("double").as("lat"),
        ((col("user_id") % 36) * 10).cast("double").as("lon"))
      .agg(sum(micros(col("value"))).cast("double").as("tas"),
        count(lit(1)).cast("double").as("psl"))
      .withColumn("dataset", lit("m0"))

  private val m = "CAST(ROUND(value*1000000) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    "q_climate_season" ->
      s"""SELECT event_type,
         |  CAST(COUNT(*) AS BIGINT) AS cnt,
         |  CAST(SUM($m) AS BIGINT) AS sum_micros
         |FROM events
         |WHERE day(ts) <= 3 OR day(ts) >= 29
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin,

    "q_climate_resample" ->
      s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($m) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_v,
         |  CAST(MIN($m) AS BIGINT) AS min_micros,
         |  CAST(MAX($m) AS BIGINT) AS max_micros
         |FROM events
         |GROUP BY date_trunc('day', ts)
         |ORDER BY day""".stripMargin,

    "q_climate_climatology" ->
      s"""SELECT CAST(hour(ts) AS BIGINT) AS hr,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($m) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_v
         |FROM events
         |GROUP BY hour(ts)
         |ORDER BY hr""".stripMargin,

    "q_climate_anomaly" ->
      s"""SELECT event_id, CAST(hour(ts) AS BIGINT) AS hr,
         |  (CAST($m AS DOUBLE) - CAST(SUM($m) OVER w AS DOUBLE) / (COUNT(*) OVER w))
         |        / 1000000.0 AS anom
         |FROM events
         |WINDOW w AS (PARTITION BY hour(ts))
         |ORDER BY event_id""".stripMargin,

    // exact HUGEINT moments mirroring the DECIMAL(38,0) sums, then the
    // identical fixed IEEE slope/intercept/residual sequence
    "q_climate_detrend" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, value,
        |    epoch_us(ts) - 1704067200000000 AS t
        |  FROM events),
        |fit AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(t AS HUGEINT)) AS DOUBLE) AS st,
        |    CAST(SUM(CAST(t AS HUGEINT) * t) AS DOUBLE) AS st2,
        |    CAST(SUM(CAST(CAST(ROUND(value*1000000) AS BIGINT) AS HUGEINT))
        |      AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(t AS HUGEINT) * CAST(ROUND(value*1000000) AS BIGINT))
        |      AS DOUBLE) AS sty
        |  FROM ev WHERE value IS NOT NULL GROUP BY event_type),
        |f2 AS (
        |  SELECT event_type, n, st, sy,
        |    CASE WHEN n * st2 - st * st = 0 THEN NULL
        |         ELSE (n * sty - st * sy) / (n * st2 - st * st) END AS bm
        |  FROM fit),
        |f3 AS (
        |  SELECT event_type, bm, (sy - bm * st) / n AS am FROM f2)
        |SELECT event_id, ev.event_type,
        |  ROUND(value - (bm * CAST(t AS DOUBLE) + am) / 1000000.0, 4) AS resid
        |FROM ev JOIN f3 ON ev.event_type = f3.event_type
        |ORDER BY event_id""".stripMargin,

    "q_climate_ensemble" ->
      s"""WITH ev AS (
         |  SELECT event_id,
         |    strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS time,
         |    CAST(FLOOR(user_id / 10) AS BIGINT) AS lat,
         |    CAST(hour(ts) AS BIGINT) AS lon,
         |    $m AS mv
         |  FROM events),
         |ma AS (
         |  SELECT time, lat, lon,
         |    CAST(SUM(mv) AS DOUBLE) / 1000000.0 / COUNT(*) AS va
         |  FROM ev WHERE event_id % 2 = 0 GROUP BY 1, 2, 3),
         |mb AS (
         |  SELECT time, lat, lon,
         |    CAST(SUM(mv) AS DOUBLE) / 1000000.0 / COUNT(*) AS vb
         |  FROM ev WHERE event_id % 2 = 1 GROUP BY 1, 2, 3)
         |SELECT ma.time, ma.lat, ma.lon, va, vb, va - vb AS bias
         |FROM ma JOIN mb USING (time, lat, lon)
         |ORDER BY ma.time, ma.lat, ma.lon""".stripMargin,

    "q_climate_regrid_bilinear" ->
      s"""WITH src AS (
         |  SELECT CAST(FLOOR(user_id / 10) AS BIGINT) AS glat,
         |         CAST(hour(ts) AS BIGINT) AS glon,
         |         CAST(SUM($m) AS DOUBLE) / 1000000.0 / COUNT(*) AS v
         |  FROM events GROUP BY 1, 2)
         |SELECT a.glat, a.glon,
         |  0.5625 * a.v + 0.1875 * b.v + 0.1875 * c.v + 0.0625 * d.v AS interp_v
         |FROM src a
         |JOIN src b ON b.glat = a.glat     AND b.glon = a.glon + 1
         |JOIN src c ON c.glat = a.glat + 1 AND c.glon = a.glon
         |JOIN src d ON d.glat = a.glat + 1 AND d.glon = a.glon + 1
         |ORDER BY a.glat, a.glon""".stripMargin,

    "q_climate_regrid_nearest" ->
      """WITH src AS (
        |  SELECT user_id AS sx, CAST(hour(ts) AS BIGINT) AS sy,
        |         CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2
        |), tgt AS (
        |  SELECT tu.i * 15 + 7 AS tx, th.i * 2 + 1 AS ty
        |  FROM range(0, 10) tu(i) CROSS JOIN range(0, 10) th(i)
        |), cand AS (
        |  SELECT t.tx, t.ty, s.sx, s.sy, s.v,
        |    (s.sx - t.tx) * (s.sx - t.tx) + (s.sy - t.ty) * (s.sy - t.ty) AS d2
        |  FROM tgt t JOIN src s
        |    ON CAST(FLOOR(s.sx / 16) AS BIGINT)
        |         BETWEEN CAST(FLOOR(t.tx / 16) AS BIGINT) - 1
        |             AND CAST(FLOOR(t.tx / 16) AS BIGINT) + 1
        |   AND CAST(FLOOR(s.sy / 16) AS BIGINT)
        |         BETWEEN CAST(FLOOR(t.ty / 16) AS BIGINT) - 1
        |             AND CAST(FLOOR(t.ty / 16) AS BIGINT) + 1
        |)
        |SELECT tx, ty, sx, sy, v, d2 FROM (
        |  SELECT tx, ty, sx, sy, v, d2,
        |    ROW_NUMBER() OVER (PARTITION BY tx, ty ORDER BY d2, sx, sy) AS rn
        |  FROM cand) r
        |WHERE rn = 1
        |ORDER BY tx, ty""".stripMargin,

    "q_climate_regrid_idw" ->
      """WITH src AS (
        |  SELECT user_id AS sx, CAST(hour(ts) AS BIGINT) AS sy,
        |         CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2
        |), tgt AS (
        |  SELECT tu.i * 15 + 7 AS tx, th.i * 2 + 1 AS ty
        |  FROM range(0, 10) tu(i) CROSS JOIN range(0, 10) th(i)
        |), cand AS (
        |  SELECT t.tx, t.ty, s.sx, s.sy, s.v,
        |    (s.sx - t.tx) * (s.sx - t.tx) + (s.sy - t.ty) * (s.sy - t.ty) AS nd
        |  FROM tgt t JOIN src s
        |    ON CAST(FLOOR(s.sx / 16) AS BIGINT)
        |         BETWEEN CAST(FLOOR(t.tx / 16) AS BIGINT) - 1
        |             AND CAST(FLOOR(t.tx / 16) AS BIGINT) + 1
        |   AND CAST(FLOOR(s.sy / 16) AS BIGINT)
        |         BETWEEN CAST(FLOOR(t.ty / 16) AS BIGINT) - 1
        |             AND CAST(FLOOR(t.ty / 16) AS BIGINT) + 1
        |), ranked AS (
        |  SELECT tx, ty, sx, sy, v, nd,
        |    ROW_NUMBER() OVER (PARTITION BY tx, ty ORDER BY nd, sx, sy) AS rn
        |  FROM cand
        |), slots AS (
        |  SELECT tx, ty,
        |    MAX(CASE WHEN rn = 1 THEN nd END) AS d1,
        |    MAX(CASE WHEN rn = 1 THEN v END) AS v1,
        |    MAX(CASE WHEN rn = 2 THEN nd END) AS d2s,
        |    MAX(CASE WHEN rn = 2 THEN v END) AS v2,
        |    MAX(CASE WHEN rn = 3 THEN nd END) AS d3,
        |    MAX(CASE WHEN rn = 3 THEN v END) AS v3
        |  FROM ranked WHERE rn <= 3 GROUP BY tx, ty
        |)
        |SELECT tx, ty,
        |  CASE WHEN d1 = 0 THEN CAST(v1 AS DOUBLE)
        |       ELSE (v1 / d1 + COALESCE(v2 / d2s, 0) + COALESCE(v3 / d3, 0))
        |            / (1.0 / d1 + COALESCE(1.0 / d2s, 0) + COALESCE(1.0 / d3, 0)) END
        |    AS idw_v
        |FROM slots
        |ORDER BY tx, ty""".stripMargin,

    "q_climate_pipeline" ->
      s"""WITH ev AS (
         |  SELECT event_id % 2 AS par,
         |    date_trunc('hour', ts) + to_days(CAST((user_id % 12) * 30 AS INT)) AS time,
         |    CAST(FLOOR(user_id / 10) AS DOUBLE) AS lat,
         |    CAST((user_id % 36) * 10 AS DOUBLE) AS lon,
         |    $m AS mv
         |  FROM events),
         |members AS (
         |  SELECT CASE WHEN par = 0 THEN 'ma' ELSE 'mb' END AS dataset,
         |    time, lat, lon,
         |    CAST(SUM(mv) AS DOUBLE) AS value
         |  FROM ev GROUP BY 1, 2, 3, 4),
         |homog AS (
         |  SELECT dataset, time, lat,
         |    ((lon + 180.0) % 360.0 + 360.0) % 360.0 - 180.0 AS lon, value
         |  FROM members),
         |sub AS (
         |  SELECT * FROM homog
         |  WHERE lat BETWEEN 1 AND 13 AND lon BETWEEN -150 AND 150
         |    AND time BETWEEN TIMESTAMP '2024-01-05 00:00:00'
         |                 AND TIMESTAMP '2024-12-20 00:00:00'),
         |season AS (SELECT * FROM sub WHERE month(time) IN (12, 1, 2)),
         |regrid AS (
         |  SELECT dataset, time,
         |    FLOOR(lat / 5.0) * 5.0 AS lat, FLOOR(lon / 60.0) * 60.0 AS lon,
         |    SUM(value) AS value
         |  FROM season GROUP BY 1, 2, 3, 4),
         |resamp AS (
         |  SELECT dataset, date_trunc('day', time) AS time, lat, lon,
         |    SUM(value) AS value
         |  FROM regrid GROUP BY 1, 2, 3, 4),
         |conv AS (
         |  SELECT dataset, time, lat, lon, value * 2.0 + 1.0 AS value FROM resamp),
         |common AS (
         |  -- DECLARED member count (2), not COUNT(DISTINCT dataset)
         |  -- inference: a member the subset/season filters drained to
         |  -- zero rows is invisible to inference, and the Spark side
         |  -- aligns on the declared count (r11, alignMembers scaladoc)
         |  SELECT time, lat, lon FROM conv
         |  GROUP BY 1, 2, 3
         |  HAVING COUNT(DISTINCT dataset) = 2),
         |aligned AS (
         |  SELECT c.dataset, c.time, c.lat, c.lon, c.value
         |  FROM conv c JOIN common u USING (time, lat, lon))
         |SELECT dataset, strftime(time, '%Y-%m-%d %H:%M:%S') AS time, lat, lon,
         |  CAST(value AS BIGINT) AS value_mu,
         |  (value - AVG(value) OVER w) AS anomaly_mu,
         |  (value - (value - AVG(value) OVER w)) AS clim_mu
         |FROM aligned
         |WINDOW w AS (PARTITION BY dataset, month(time), lat, lon)
         |ORDER BY dataset, time, lat, lon""".stripMargin,

    "q_climate_calendar" ->
      """WITH fx AS (
        |  SELECT DISTINCT CAST(2023 + event_id % 3 AS BIGINT) AS y,
        |    CAST(1 + event_id % 360 AS BIGINT) AS doy360,
        |    CAST(1 + event_id % 365 AS BIGINT) AS doy365
        |  FROM events),
        |c360 AS (
        |  SELECT y, doy360, doy365,
        |    CAST(FLOOR((doy360 - 1) / 30) AS INT) + 1 AS m360,
        |    CAST((doy360 - 1) % 30 + 1 AS INT) AS d360
        |  FROM fx)
        |SELECT y, doy360, doy365,
        |  strftime(CAST(make_date(CAST(y AS INT), m360,
        |      LEAST(d360, day(last_day(make_date(CAST(y AS INT), m360, 1)))))
        |    AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS t360,
        |  strftime(CAST(make_date(CAST(y AS INT), 1, 1) AS TIMESTAMP)
        |    + to_days(CAST(CASE WHEN ((y % 4 = 0 AND y % 100 <> 0) OR y % 400 = 0)
        |                          AND doy365 >= 60
        |                        THEN doy365 ELSE doy365 - 1 END AS INT)),
        |    '%Y-%m-%d %H:%M:%S') AS t365
        |FROM c360
        |ORDER BY y, doy360, doy365""".stripMargin,

    "q_climate_regrid" ->
      s"""SELECT CAST(FLOOR(user_id / 10) AS BIGINT) AS ubin,
         |  CAST(LEAST(FLOOR($m / 50000000.0), 9) AS BIGINT) AS vbin,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($m) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_v
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY ubin, vbin""".stripMargin,

    "q_climate_zonal" ->
      s"""WITH g AS (
         |  SELECT date_trunc('day', ts) AS time,
         |    CAST(FLOOR(user_id / 10) AS DOUBLE) AS lat,
         |    CAST((user_id % 36) * 10 AS DOUBLE) AS lon,
         |    CAST(SUM($m) AS DOUBLE) AS value
         |  FROM events GROUP BY 1, 2, 3)
         |SELECT 'm0' AS dataset, strftime(time, '%Y-%m-%d %H:%M:%S') AS time,
         |  lat, AVG(value) AS zmean_mu
         |FROM g
         |GROUP BY time, lat
         |ORDER BY dataset, time, lat""".stripMargin,

    "q_climate_melt" ->
      s"""WITH w AS (
         |  SELECT date_trunc('day', ts) AS time,
         |    CAST(FLOOR(user_id / 10) AS DOUBLE) AS lat,
         |    CAST((user_id % 36) * 10 AS DOUBLE) AS lon,
         |    CAST(SUM($m) AS DOUBLE) AS tas,
         |    CAST(COUNT(*) AS DOUBLE) AS psl
         |  FROM events GROUP BY 1, 2, 3)
         |SELECT 'm0' AS dataset, strftime(time, '%Y-%m-%d %H:%M:%S') AS time,
         |  lat, lon, variable, value
         |FROM (
         |  SELECT time, lat, lon, 'tas' AS variable, tas AS value FROM w
         |  UNION ALL
         |  SELECT time, lat, lon, 'psl' AS variable, psl AS value FROM w)
         |ORDER BY dataset, time, lat, lon, variable""".stripMargin,

    "q_climate_pivot" ->
      s"""WITH w AS (
         |  SELECT date_trunc('day', ts) AS time,
         |    CAST(FLOOR(user_id / 10) AS DOUBLE) AS lat,
         |    CAST((user_id % 36) * 10 AS DOUBLE) AS lon,
         |    CAST(SUM($m) AS DOUBLE) AS tas,
         |    CAST(COUNT(*) AS DOUBLE) AS psl
         |  FROM events GROUP BY 1, 2, 3)
         |SELECT 'm0' AS dataset, strftime(time, '%Y-%m-%d %H:%M:%S') AS time,
         |  lat, lon, psl, tas
         |FROM w
         |ORDER BY dataset, time, lat, lon""".stripMargin,

    "q_climate_spatial_weighted" ->
      s"""WITH cells AS (
         |  SELECT event_type AS dataset, date_trunc('day', ts) AS time,
         |    CAST((user_id % 19 - 9) * 9 AS DOUBLE) AS lat,
         |    CAST(COUNT(*) AS BIGINT) AS value
         |  FROM events GROUP BY 1, 2, 3),
         |w AS (
         |  SELECT dataset, time, value, $swCaseSql AS wt FROM cells)
         |SELECT dataset, strftime(time, '%Y-%m-%d %H:%M:%S') AS time,
         |  CAST(SUM(value * wt) AS DOUBLE) / CAST(SUM(wt) AS DOUBLE) AS wmean
         |FROM w
         |GROUP BY dataset, time
         |ORDER BY dataset, time""".stripMargin,

    "q_climate_interp_na" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_id % 7 = 0 THEN NULL
        |         ELSE CAST(ROUND(value*1000000) AS BIGINT) END AS vm
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, vm,
        |    LAST_VALUE(CASE WHEN vm IS NOT NULL THEN event_id END IGNORE NULLS)
        |      OVER pw AS tp,
        |    LAST_VALUE(CASE WHEN vm IS NOT NULL THEN vm END IGNORE NULLS)
        |      OVER pw AS vp,
        |    FIRST_VALUE(CASE WHEN vm IS NOT NULL THEN event_id END IGNORE NULLS)
        |      OVER fw AS tn,
        |    FIRST_VALUE(CASE WHEN vm IS NOT NULL THEN vm END IGNORE NULLS)
        |      OVER fw AS vn
        |  FROM e
        |  WINDOW pw AS (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    fw AS (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        |  CASE WHEN vm IS NOT NULL THEN CAST(vm AS DOUBLE)
        |       ELSE CAST(vp AS DOUBLE) + (CAST(vn AS DOUBLE) - CAST(vp AS DOUBLE))
        |            * (CAST(event_id - tp AS DOUBLE) / CAST(tn - tp AS DOUBLE))
        |  END AS v_interp
        |FROM w
        |ORDER BY event_id""".stripMargin,

    "q_climate_qmap" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(user_id % 50 AS BIGINT) AS band,
        |    CAST(CAST(ROUND(value*1000000) AS BIGINT) AS DOUBLE) AS m
        |  FROM events WHERE value IS NOT NULL),
        |obs AS (
        |  SELECT event_type, band, m, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, band
        |      ORDER BY m, event_id) - 1 AS j,
        |    LEAD(m) OVER (PARTITION BY event_type, band
        |      ORDER BY m, event_id) AS vnext
        |  FROM ev WHERE event_id % 2 = 0),
        |oc AS (SELECT event_type, band, CAST(COUNT(*) AS BIGINT) AS no
        |  FROM ev WHERE event_id % 2 = 0 GROUP BY 1, 2),
        |mdl AS (
        |  SELECT event_id, event_type, band, m,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, band
        |      ORDER BY m, event_id) - 1 AS k,
        |    COUNT(*) OVER (PARTITION BY event_type, band) AS nm
        |  FROM ev WHERE event_id % 2 = 1),
        |mh AS (
        |  SELECT mdl.event_id, mdl.event_type, mdl.band, mdl.m,
        |    (CASE WHEN nm = 1 THEN 0.0
        |          ELSE CAST(k AS DOUBLE) / CAST(nm - 1 AS DOUBLE) END)
        |      * CAST(oc.no - 1 AS DOUBLE) AS h
        |  FROM mdl JOIN oc USING (event_type, band))
        |SELECT mh.event_id, mh.event_type, mh.band, mh.m,
        |  o.m + (mh.h - CAST(FLOOR(mh.h) AS BIGINT))
        |      * (COALESCE(o.vnext, o.m) - o.m) AS corrected
        |FROM mh JOIN obs o
        |  ON mh.event_type = o.event_type AND mh.band = o.band
        |  AND CAST(FLOOR(mh.h) AS BIGINT) = o.j
        |ORDER BY mh.event_id""".stripMargin,

    "q_climate_regrid_conserv" ->
      """WITH src AS (
        |  SELECT CAST(user_id % 20 AS BIGINT) AS glat,
        |         CAST(hour(ts) AS BIGINT) AS glon,
        |         CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |ov AS (
        |  SELECT ti.i AS i, tj.i AS j, v,
        |    (LEAST(glat*3+3, ti.i*2+2) - GREATEST(glat*3, ti.i*2)) *
        |    (LEAST(glon*3+3, tj.i*2+2) - GREATEST(glon*3, tj.i*2)) AS w
        |  FROM src
        |  JOIN range(0, 30) ti(i)
        |    ON ti.i*2+2 > glat*3 AND ti.i*2 < glat*3+3
        |  JOIN range(0, 36) tj(i)
        |    ON tj.i*2+2 > glon*3 AND tj.i*2 < glon*3+3)
        |SELECT CAST(i*2+1 AS DOUBLE) AS tlat, CAST(j*2+1 AS DOUBLE) AS tlon,
        |  CAST(SUM(v*w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS value,
        |  CAST(SUM(w) AS DOUBLE) AS w_sum
        |FROM ov GROUP BY i, j
        |ORDER BY tlat, tlon""".stripMargin,

    // trendExact's moment chain with the regression read-out; the
    // centered day axis and the micros→value rescale before ROUND
    // keep the 6-dp grid orders above the conversion floor
    "q_climate_trend" ->
      """WITH cells AS (
        |  SELECT DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      - 19723 AS d,
        |    CAST(FLOOR(user_id / 10) AS BIGINT) AS glat,
        |    CAST(user_id % 36 AS BIGINT) AS glon,
        |    CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2, 3),
        |f AS (
        |  SELECT glat, glon,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(d AS HUGEINT)) AS DOUBLE) AS st,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(d AS HUGEINT) * d) AS DOUBLE) AS st2,
        |    CAST(SUM(CAST(d AS HUGEINT) * x) AS DOUBLE) AS sty
        |  FROM cells WHERE d IS NOT NULL AND x IS NOT NULL
        |  GROUP BY glat, glon),
        |f2 AS (
        |  SELECT glat, glon, n, st, sy,
        |    CASE WHEN n * st2 - st * st <= 0 THEN NULL
        |         ELSE (n * sty - st * sy) / (n * st2 - st * st) END AS slope
        |  FROM f)
        |SELECT glat, glon, CAST(n AS BIGINT) AS n_obs,
        |  ROUND(slope / 1000000.0, 6) AS slope_v,
        |  ROUND(((sy - slope * st) / n) / 1000000.0, 6) AS icept_v
        |FROM f2 ORDER BY glat, glon""".stripMargin,

    // exact HUGEINT moments mirroring corrExact's DECIMAL sums, the
    // identical fixed IEEE sequence — graded at 6 dp
    "q_climate_corr_field" ->
      """WITH cells AS (
        |  SELECT date_trunc('day', ts) AS time,
        |    CAST(FLOOR(user_id / 10) AS BIGINT) AS glat,
        |    CAST(user_id % 36 AS BIGINT) AS glon,
        |    CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS x,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2, 3),
        |f AS (
        |  SELECT glat, glon,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        |  FROM cells WHERE x IS NOT NULL AND y IS NOT NULL
        |  GROUP BY glat, glon)
        |SELECT glat, glon, CAST(n AS BIGINT) AS n_obs,
        |  CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
        |       THEN NULL
        |       ELSE ROUND((n * sxy - sx * sy) /
        |            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
        |  END AS corr
        |FROM f ORDER BY glat, glon""".stripMargin,

    "q_climate_spell" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(user_id % 8 AS BIGINT) AS band,
        |    DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events GROUP BY 1, 2, 3),
        |qual AS (
        |  SELECT event_type, band, d, sv FROM (
        |    SELECT event_type, band, d, sv,
        |      SUM(sv) OVER (PARTITION BY event_type, band) AS tot,
        |      COUNT(sv) OVER (PARTITION BY event_type, band) AS nd
        |    FROM daily)
        |  WHERE sv * nd > tot),
        |isl AS (
        |  SELECT event_type, band, d, sv,
        |    d - ROW_NUMBER() OVER (PARTITION BY event_type, band
        |      ORDER BY d) AS g
        |  FROM qual)
        |SELECT event_type, band,
        |  MIN(d) AS spell_start, MAX(d) AS spell_end,
        |  CAST(COUNT(*) AS BIGINT) AS spell_len,
        |  CAST(SUM(sv) AS BIGINT) AS spell_sum
        |FROM isl GROUP BY event_type, band, g
        |ORDER BY event_type, band, spell_start""".stripMargin,

    // the same exact daily series as the spell oracle; window SUM
    // widens to HUGEINT → CAST back (§2.8 rule 4); the mean divides
    // the BIGINT-cast sum (≪ 2^53, so the double is exact) by the
    // count — the identical IEEE division Spark performs
    "q_climate_rolling" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(user_id % 8 AS BIGINT) AS band,
        |    DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events GROUP BY 1, 2, 3),
        |r AS (
        |  SELECT event_type, band, d,
        |    CAST(COUNT(sv) OVER w AS BIGINT) AS n_win,
        |    CAST(SUM(sv) OVER w AS BIGINT) AS roll_sum
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type, band ORDER BY d
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, band, d, n_win, roll_sum,
        |  CASE WHEN n_win >= 7
        |    THEN CAST(roll_sum AS DOUBLE) / CAST(n_win AS DOUBLE) END
        |    AS roll_mean
        |FROM r ORDER BY event_type, band, d""".stripMargin,

    // the quantized-power-iteration chain over the densified anomaly
    // field: exact cross-multiplied mean removal, global-max requant
    // (the one shared IEEE sequence), Gram, three (multiply, max,
    // requant) rounds — step-identical with eofAnomalyQuant +
    // Vectors.powerIterate (Vectors.pcaCte's step(k) shape)
    "q_climate_eof" ->
      s"""WITH $eofCte
         |SELECT CAST(i // 12 AS BIGINT) AS glat,
         |  CAST(i % 12 AS BIGINT) AS glon, xv AS loading
         |FROM x3 ORDER BY glat, glon""".stripMargin,

    "q_climate_eof_pc" ->
      s"""WITH $eofCte
         |SELECT CAST(aq.t AS BIGINT) AS d,
         |  CAST(SUM(aq.aq * x3.xv) AS BIGINT) AS score
         |FROM aq JOIN x3 ON aq.i = x3.i
         |GROUP BY 1 ORDER BY d""".stripMargin
  )

  /** Shared EOF CTE chain — the single DuckDB copy of the anomaly
    * densify/quantize + power-iteration math that must stay
    * step-identical with [[ClimateOps.eofAnomalyQuant]] +
    * [[Vectors.powerIterate]]. Emits `aq(t, i, aq)` and the final
    * iterate `x3(i, xv)`. */
  private lazy val eofCte: String = {
    def step(k: Int): String =
      s"""y$k AS (
         |  SELECT ai AS i, CAST(SUM(cqv * xv) AS BIGINT) AS yv
         |  FROM cq JOIN x${k - 1} ON bi = x${k - 1}.i GROUP BY ai),
         |m$k AS (SELECT CAST(MAX(ABS(yv)) AS DOUBLE) AS m FROM y$k),
         |x$k AS (
         |  SELECT i, CASE WHEN m = 0 THEN yv
         |    ELSE CAST(FLOOR(CAST(yv AS DOUBLE) / m * 1000000 + 0.5)
         |      AS BIGINT) END AS xv
         |  FROM y$k, m$k)""".stripMargin
    s"""base AS (
       |  SELECT DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
       |    CAST((user_id % 10) * 12 + (user_id % 12) AS BIGINT) AS i,
       |    CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |days AS (SELECT DISTINCT t FROM base),
       |cells AS (SELECT DISTINCT i FROM base),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM days),
       |tot AS (SELECT i, CAST(COALESCE(SUM(x), 0) AS BIGINT) AS s
       |        FROM base GROUP BY 1),
       |dense AS (
       |  SELECT dy.t, cl.i, COALESCE(b.x, 0) AS xv
       |  FROM days dy CROSS JOIN cells cl
       |  LEFT JOIN base b ON b.t = dy.t AND b.i = cl.i),
       |av AS (
       |  SELECT t, i, n * xv - s AS a
       |  FROM dense JOIN tot USING (i) CROSS JOIN nn),
       |am AS (SELECT CAST(MAX(ABS(a)) AS DOUBLE) AS m FROM av),
       |aq AS (
       |  SELECT t, i, CASE WHEN m = 0 THEN a
       |    ELSE CAST(FLOOR(CAST(a AS DOUBLE) / m * 1000000 + 0.5)
       |      AS BIGINT) END AS aq
       |  FROM av, am),
       |c AS (
       |  SELECT a.i AS ai, b.i AS bi,
       |    CAST(SUM(a.aq * b.aq) AS BIGINT) AS cij
       |  FROM aq a JOIN aq b USING (t) GROUP BY 1, 2),
       |mc AS (SELECT CAST(MAX(ABS(cij)) AS DOUBLE) AS m FROM c),
       |cq AS (
       |  SELECT ai, bi, CASE WHEN m = 0 THEN cij
       |    ELSE CAST(FLOOR(CAST(cij AS DOUBLE) / m * 1000000 + 0.5)
       |      AS BIGINT) END AS cqv
       |  FROM c, mc),
       |x0 AS (SELECT DISTINCT ai AS i, CAST(1000000 AS BIGINT) AS xv FROM c),
       |${step(1)},
       |${step(2)},
       |${step(3)}""".stripMargin
  }
}
