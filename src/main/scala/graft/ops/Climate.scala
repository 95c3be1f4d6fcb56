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
  *  - NetCDF ingestion (R1) is out of scope offline: the design is a
  *    DataSourceV2 `FileFormat` emitting this long form; parquet is the
  *    graded source (SURVEY §7.5).
  */
object ClimateOps {
  /** R3 homogenize: rename dims to convention, wrap lon to [-180,180). */
  def homogenize(df: DataFrame, renames: Map[String, String]): DataFrame = {
    val renamed = renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
    renamed.withColumn("lon", ((col("lon") + 180.0) % 360.0 + 360.0) % 360.0 - 180.0)
  }

  /** R5 subset(bounds): conjunctive range predicate — pushdown-friendly. */
  def subset(df: DataFrame, latMin: Double, latMax: Double,
             lonMin: Double, lonMax: Double,
             tMin: String, tMax: String): DataFrame =
    df.filter(col("lat").between(latMin, latMax)
      && col("lon").between(lonMin, lonMax)
      && col("time").between(lit(tMin).cast("timestamp"), lit(tMax).cast("timestamp")))

  /** R6 select_season: keep timesteps whose month is in the season
    * (DJF-style wrap is just the month set {12,1,2}). */
  def selectSeason(df: DataFrame, months: Seq[Int]): DataFrame =
    df.filter(month(col("time")).isin(months: _*))

  /** R8 resample: temporal downsampling to `unit` (e.g. "day", "month"). */
  def resample(df: DataFrame, unit: String): DataFrame =
    df.groupBy(col("dataset"), date_trunc(unit, col("time")).as("time"),
        col("lat"), col("lon"))
      .agg(avg(col("value")).as("value"))

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

  /** R7 regrid (conservative ≈ bin-average onto a uniform res° mesh). */
  def regridBin(df: DataFrame, latRes: Double, lonRes: Double): DataFrame =
    df.groupBy(col("dataset"), col("time"),
        (floor(col("lat") / latRes) * latRes).as("lat_bin"),
        (floor(col("lon") / lonRes) * lonRes).as("lon_bin"))
      .agg(avg(col("value")).as("value"), count(lit(1)).as("n_cells"))

  /** R11 zonal mean: collapse the lon axis. */
  def zonalMean(df: DataFrame): DataFrame =
    df.groupBy(col("dataset"), col("time"), col("lat"))
      .agg(avg(col("value")).as("value"))

  /** R12 unit conversion: value*k + b (e.g. K→°C is k=1, b=-273.15). */
  def convertUnits(df: DataFrame, k: Double, b: Double): DataFrame =
    df.withColumn("value", col("value") * k + b)

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
}

/** SURVEY §2.9 family G — the climate surface exercised on harness data
  * (events plays the role of the cell table: ts=time, user_id=lat-like,
  * value=variable), each an oracle-matched analog of R6–R11.
  */
object Climate {

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

    // R10 anomaly analog: value − hour-of-day mean, via window (exact
    // integer sums inside; one double division at the end, identical
    // formula text on both sides).
    "q_climate_anomaly" -> { (s, dir) =>
      val w = Window.partitionBy(hour(col("ts")))
      Tables.events(s, dir)
        .withColumn("m", micros(col("value")))
        .withColumn("sw", sum(col("m")).over(w))
        .withColumn("cw", count(lit(1)).over(w))
        // No rounding: every operand is an exact integer, so the double
        // result is bit-identical across engines (identical IEEE op
        // sequence) — rounding would only *introduce* a decimal-vs-binary
        // half-way ambiguity (observed: -38.93975 rounds differently).
        .select(col("event_id"), hour(col("ts")).cast("long").as("hr"),
          ((col("m").cast("double") - col("sw").cast("double") / col("cw"))
            / 1000000.0).as("anom"))
        .orderBy(col("event_id"))
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
    }
  )

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

    "q_climate_regrid" ->
      s"""SELECT CAST(FLOOR(user_id / 10) AS BIGINT) AS ubin,
         |  CAST(LEAST(FLOOR($m / 50000000.0), 9) AS BIGINT) AS vbin,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($m) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_v
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY ubin, vbin""".stripMargin
  )
}
