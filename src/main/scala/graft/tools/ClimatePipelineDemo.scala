package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Ensemble

/** The reference's canonical workflow end-to-end on the Spark-native
  * engine — what a bcdp user's script becomes:
  *
  *   ens = bcdp.load_local(paths)
  *   ens = ens.homogenize().subset(bnds).select_season('DJF')
  *   ens = ens.regrid(grid_from_res(5.0)).resample('MS')
  *   clim = ens.climatology(); anom = ens.anomaly()
  *
  * Runs on a synthetic 2-member ensemble (model + obs) over a 1°
  * mesh × 24 months, regridded onto a 5° DSv2 GridSource target.
  */
object ClimatePipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // synthetic member: value = seasonal cycle + latitude gradient (+bias)
    def member(name: String, bias: Double) = {
      val months = (0 until 24).map(m => f"${2000 + m / 12}-${m % 12 + 1}%02d-15 00:00:00")
      val grid = spark.read.format("graft.sources.GridSource")
        .option("latMin", "-30").option("latMax", "30")
        .option("lonMin", "0").option("lonMax", "40")
        .option("latRes", "1").option("lonRes", "1").load()
      grid.crossJoin(months.toDF("t"))
        .select(lit(name).as("dataset"),
          col("t").cast("timestamp").as("time"), col("lat"), col("lon"),
          (sin(month(col("t").cast("timestamp")) * math.Pi / 6) * 10.0
            + col("lat") * 0.5 + bias).as("value"))
    }

    val ens = Ensemble.of(member("modelA", 1.5).unionByName(member("obs", 0.0)))
      .homogenize()
      .subset(-25, 25, 5, 35, "2000-01-01 00:00:00", "2001-12-31 00:00:00")
      .selectSeason(Seq(12, 1, 2))        // DJF
      .regridBin(5.0, 5.0)                // onto the coarse mesh
      .convertUnits(1.0, 273.15)          // °C → K offset, say
      .transform(_.cache())               // six actions below share the lineage

    println(s"[demo] members=${ens.members.mkString(",")} cells=${ens.df.count()}")

    val clim = ens.climatology()
    val anom = ens.anomaly()
    val zonal = ens.zonalMean()
    println(s"[demo] climatology rows=${clim.count()} " +
      s"anomaly rows=${anom.count()} zonal rows=${zonal.count()}")

    // model-vs-obs bias on the common grid: the Ensemble-algebra payoff
    val bias = ens.df.groupBy("time", "lat", "lon")
      .pivot("dataset", Seq("modelA", "obs"))
      .agg(first("value"))
      .withColumn("bias", col("modelA") - col("obs"))
      .agg(round(avg("bias"), 4).as("mean_bias"))
      .head().getDouble(0)
    println(s"[demo] mean model-obs bias=$bias (planted 1.5)")
    spark.stop()
  }
}
