package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}
import Det._

/** SURVEY §2.9 families A (scan/filter/project), B (joins),
  * C (aggregation), D (windows/sort/limit/set ops).
  *
  * Every query: pure `(SparkSession, sfDir) => DataFrame`, built-in
  * Catalyst expressions only (whole-stage codegen'd), ends in a total
  * ORDER BY (§2.8), aggregates partial+final via groupBy (no
  * groupByKey), joins keyed or broadcast-by-dimension — the shapes that
  * survive a 1000-executor 100 TB scale-up.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- C. Aggregation ------------------------------------------------
    // TPC-H Q1 shape (bcdp analog: grouped reduction over the long table).
    // Money kept in exact integer cents end-to-end; averages derived from
    // the integer sums so both engines divide the same exact integers.
    "q_agg_groupby" -> { (s, dir) =>
      val l = Tables.lineitem(s, dir)
      l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).cast("long").as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).cast("long").as("sum_base_cents"),
          sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .cast("long").as("sum_disc_c4"),
          sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
            * (lit(100L) + cents(col("l_tax")))).cast("long").as("sum_charge_c6"),
          count(lit(1)).cast("long").as("cnt"))
        .select(
          col("l_returnflag"), col("l_linestatus"),
          col("sum_qty_cents"), col("sum_base_cents"),
          col("sum_disc_c4"), col("sum_charge_c6"),
          round(col("sum_qty_cents").cast("double") / 100.0 / col("cnt"), 4).as("avg_qty"),
          round(col("sum_base_cents").cast("double") / 100.0 / col("cnt"), 4).as("avg_price"),
          col("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_c4,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_c6,
        |  ROUND(CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*), 4) AS avg_price,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
