package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Det, Tables}
import Det._

/** SURVEY §2.9 family D — window functions, sort/limit, set ops.
  *
  * Determinism: every window spec orders by a key set made unique with
  * an id tie-break, so row_number-class functions are reproducible;
  * rank/dense_rank additionally get a deliberately coarse (tie-rich)
  * ordering where the tie semantics themselves are under test.
  * Scale notes: all windows are partitioned (per-customer/per-user) so
  * state is bounded per key — except ntile, which is inherently global
  * (single-partition sort); at 100 TB that becomes a range-partitioned
  * percentile computation and is flagged as such here.
  */
object Windows {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rank" -> { (s, dir) =>
      val wFine = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wCoarse = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderpriority"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          cents(col("o_totalprice")).as("price_cents"),
          row_number().over(wFine).cast("long").as("rn"),
          rank().over(wCoarse).cast("long").as("rnk"),
          dense_rank().over(wCoarse).cast("long").as("drnk"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    "q_win_topk_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          cents(col("o_totalprice")).as("price_cents"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    "q_win_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          tstr(col("o_orderdate")).as("odate"),
          count(lit(1)).over(w).cast("long").as("running_n"),
          sum(cents(col("o_totalprice"))).over(w).cast("long").as("running_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // 4-row moving average over exact integer micro-units: the windowed
    // sum is order-independent integer math, divided once at the end.
    // Emitted UNROUNDED: identical IEEE op sequence on exact integers is
    // bit-stable across engines, while ROUND(x,4) on a x.xxxx5 value
    // flips between Spark (BigDecimal HALF_UP) and DuckDB (scaled
    // double) — the SURVEY §2.8 hazard q_climate_anomaly documents.
    "q_win_sliding" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          (sum(micros(col("value"))).over(w).cast("double") / 1000000.0
            / count(lit(1)).over(w)).as("mavg"))
        .orderBy(col("event_id"))
    },

    "q_win_lag_lead" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            .cast("long").as("prev_gap_us"),
          (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
            .cast("long").as("next_gap_us"))
        .orderBy(col("event_id"))
    },

    // ntile over a global ordering — inherently single-partition; fine
    // at dimension-table size, a range-partitioned quantile at 100 TB.
    "q_win_ntile" -> { (s, dir) =>
      val w = Window.orderBy(cents(col("c_acctbal")).desc, col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          cents(col("c_acctbal")).as("bal_cents"),
          ntile(4).over(w).cast("long").as("tile"))
        .orderBy(col("c_custkey"))
    },

    // percent_rank/cume_dist: ratios of exact integer ranks over a
    // total order → bit-identical doubles in both engines, no rounding.
    "q_win_percentrank" -> { (s, dir) =>
      val w = Window.orderBy(cents(col("c_acctbal")), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          cents(col("c_acctbal")).as("bal_cents"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("c_custkey"))
    },

    // RANGE frame: how many same-status orders are within $500 below —
    // value-based frames are deterministic even under order ties.
    "q_win_range_frame" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("price_cents"))
        .rangeBetween(-50000L, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("price_cents", cents(col("o_totalprice")))
        .select(col("o_orderkey"), col("o_orderstatus"), col("price_cents"),
          count(lit(1)).over(w).cast("long").as("n_within_500"))
        .orderBy(col("o_orderkey"))
    },

    // Value window functions over the full partition frame; one row per
    // customer after DISTINCT (all rows in a partition agree).
    "q_win_value" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_custkey"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(w).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
        .distinct()
        .orderBy(col("o_custkey"))
    },

    // Forward-fill (gap-fill) — the time-series repair shape: carry
    // the last observed value across NULL gaps per series. IGNORE
    // NULLS `last` over a running frame, partitioned by the series
    // key (thousands of users → parallel; never a global window).
    // Gaps are PLANTED (event_id % 5, same CASE in the oracle) since
    // the fixture has no NULLs — non-empty evidence at every SF; rows
    // before a series' first observation stay NULL by design.
    "q_win_fill" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("vm",
          when(col("event_id") % 5 === 0, lit(null)).otherwise(micros(col("value"))))
        .select(col("event_id"), col("user_id"), col("vm"),
          last(col("vm"), ignoreNulls = true).over(w).as("ffill"))
        .orderBy(col("event_id"))
    },

    // BATCH sessionization (r17) — the gaps-and-islands companion to
    // the streaming session window (q_stream_session grades the
    // watermark path; this is the backfill/batch path every pipeline
    // also needs): a new session starts at the first event or when the
    // gap since the previous event exceeds 30 min. Session seq = the
    // running sum of start flags over ONE per-user window sort (epoch
    // micros — exact longs); the per-session rollup groups on
    // (user_id, session seq) and reuses the window's partitioning.
    // user_id carries input-scaling cardinality (no sort funnel).
    "q_win_sessionize" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("new_s",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(run))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          min(col("us")).as("t_first"),
          max(col("us")).as("t_last"),
          sum(micros(col("value"))).cast("long").as("sum_micros"))
        .orderBy(col("user_id"), col("sid"))
    },

    "q_sort_multi" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          cents(col("o_totalprice")).as("price_cents"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("price_cents").desc, col("o_orderkey"))
        .limit(500)
    },

    // Global top-k → Spark fuses into TakeOrderedAndProject (no full sort).
    "q_limit_topk" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("okey"),
          col("l_linenumber").cast("long").as("lnum"),
          cents(col("l_extendedprice")).as("price_cents"))
        .orderBy(col("price_cents").desc, col("okey"), col("lnum"))
        .limit(100)
    },

    "q_set_union_all" -> { (s, dir) =>
      val a = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val b = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      a.unionByName(b).orderBy(col("custkey"))
    },

    "q_set_union" -> { (s, dir) =>
      val a = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val b = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      a.unionByName(b).distinct().orderBy(col("custkey"))
    },

    // Multiset (bag) semantics: multiplicity = min / difference of the
    // two sides' multiplicities. Duplicate output rows are identical,
    // so the ORDER BY stays a total order over distinct row values.
    "q_set_intersect_all" -> { (s, dir) =>
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val highValue = Tables.orders(s, dir).filter(col("o_totalprice") > 150000.0)
        .select(col("o_custkey").as("custkey"))
      urgent.intersectAll(highValue).orderBy(col("custkey"))
    },

    "q_set_except_all" -> { (s, dir) =>
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val highValue = Tables.orders(s, dir).filter(col("o_totalprice") > 150000.0)
        .select(col("o_custkey").as("custkey"))
      urgent.exceptAll(highValue).orderBy(col("custkey"))
    },

    "q_set_intersect" -> { (s, dir) =>
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val frequent = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 5)
        .select(col("o_custkey").as("custkey"))
      urgent.intersect(frequent).orderBy(col("custkey"))
    },

    // EXCEPT vs the custkeys holding a RECENT order: against the full
    // orders set every customer appeared on the right, so the key
    // hash-matched on an empty result at every tested SF — vacuous
    // evidence. 1998-06-01 keeps 3/8/142 survivors at sf0.001/0.01/0.1.
    "q_set_except" -> { (s, dir) =>
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1998-06-01").cast("timestamp"))
      Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
        .except(recent.select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
        |  CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS BIGINT) AS rnk,
        |  CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS BIGINT) AS drnk
        |FROM orders
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_win_topk_group" ->
      """SELECT o_custkey, o_orderkey, price_cents, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS running_n,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER w AS BIGINT) AS running_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_sliding" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) OVER w AS DOUBLE) / 1000000.0
        |        / (COUNT(*) OVER w) AS mavg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_win_lag_lead" ->
      """SELECT event_id, user_id,
        |  CAST(epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) AS BIGINT) AS prev_gap_us,
        |  CAST(epoch_us(LEAD(ts, 1) OVER w) - epoch_us(ts) AS BIGINT) AS next_gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_custkey,
        |  CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_cents,
        |  CAST(NTILE(4) OVER (ORDER BY CAST(ROUND(c_acctbal*100) AS BIGINT) DESC, c_custkey) AS BIGINT) AS tile
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_win_percentrank" ->
      """SELECT c_custkey,
        |  CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_cents,
        |  PERCENT_RANK() OVER w AS pr,
        |  CUME_DIST() OVER w AS cd
        |FROM customer
        |WINDOW w AS (ORDER BY CAST(ROUND(c_acctbal*100) AS BIGINT), c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_set_intersect_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY custkey""".stripMargin,

    "q_set_except_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY custkey""".stripMargin,

    "q_win_range_frame" ->
      """SELECT o_orderkey, o_orderstatus, price_cents,
        |  CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY price_cents
        |    RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_500
        |FROM (SELECT o_orderkey, o_orderstatus,
        |        CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
        |      FROM orders) t
        |ORDER BY o_orderkey""".stripMargin,

    "q_win_value" ->
      """SELECT DISTINCT o_custkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_ok,
        |  LAST_VALUE(o_orderkey) OVER w AS last_ok,
        |  NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey""".stripMargin,

    "q_win_fill" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_id % 5 = 0 THEN NULL
        |         ELSE CAST(ROUND(value*1000000) AS BIGINT) END AS vm
        |  FROM events)
        |SELECT event_id, user_id, vm,
        |  LAST_VALUE(vm IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill
        |FROM e
        |ORDER BY event_id""".stripMargin,

    // the 30-min-gap flag chain: epoch micros are exact longs, the
    // session seq a running sum of flags, the rollup CAST per §2.8
    // rule 4 (window/group SUM widens to HUGEINT)
    "q_win_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(ROUND(value*1000000) AS BIGINT) AS m
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, us, m,
        |    CASE WHEN LAG(us) OVER w IS NULL
        |           OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT user_id, us, m,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS sid
        |  FROM f)
        |SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  MIN(us) AS t_first, MAX(us) AS t_last,
        |  CAST(SUM(m) AS BIGINT) AS sum_micros
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, sid""".stripMargin,

    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders
        |ORDER BY o_orderstatus ASC NULLS FIRST, price_cents DESC, o_orderkey
        |LIMIT 500""".stripMargin,

    "q_limit_topk" ->
      """SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS lnum,
        |  CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_cents
        |FROM lineitem
        |ORDER BY price_cents DESC, okey, lnum
        |LIMIT 100""".stripMargin,

    "q_set_union_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin,

    "q_set_union" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin,

    "q_set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5
        |ORDER BY custkey""".stripMargin,

    "q_set_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01'
        |ORDER BY custkey""".stripMargin
  )
}
