package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Det, Tables}
import Det._

/** SURVEY §2.9 family B — joins.
  *
  * Scale design notes (100 TB, §7.4):
  *  - equi-joins stay declarative so Catalyst/AQE pick broadcast vs
  *    shuffled-hash vs sort-merge from actual sizes;
  *  - dimension sides (region/nation/customer/band tables) are
  *    explicitly `broadcast()` where the dimension is known small —
  *    the fact table is never shuffled for those joins;
  *  - the theta/band join broadcasts the tiny band table (BNLJ over a
  *    broadcast is the right physical shape; at scale a range-bucketed
  *    equi-join prefix would be added);
  *  - the as-of join is a partitioned window (single shuffle on the
  *    partition key, no self-join blowup) — the standard scalable
  *    emulation; DuckDB's ASOF JOIN or the same window algebra oracles it.
  */
object Joins {

  private def revC4 = // l_extendedprice*(1-l_discount) in exact 1e-4 dollars
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_inner" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"), "inner")
        .groupBy(col("o_orderstatus"))
        .agg(sum(revC4).cast("long").as("rev_c4"),
          count(lit(1)).cast("long").as("cnt"))
        .orderBy(col("o_orderstatus"))
    },

    // 5-way star: fact → orders → customer → nation → region. The three
    // rightmost are true dimensions → broadcast; AQE may reorder.
    "q_join_multiway" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum(revC4).cast("long").as("rev_c4"),
          count(lit(1)).cast("long").as("cnt"))
        .orderBy(col("r_name"))
    },

    "q_join_broadcast" -> { (s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          sum(cents(col("o_totalprice"))).cast("long").as("sum_price_cents"))
        .orderBy(col("c_mktsegment"))
    },

    // Left outer keeps orderless customers; count(col) skips the NULLs
    // the outer join manufactures, COALESCE pins the empty-group sum.
    "q_join_left" -> { (s, dir) =>
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      Tables.customer(s, dir)
        .join(recent, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).cast("long").as("n_recent"),
          coalesce(sum(cents(col("o_totalprice"))), lit(0L)).cast("long").as("sum_cents"))
        .orderBy(col("c_custkey"))
    },

    // Mirror of q_join_left through the physical right-outer path.
    "q_join_right" -> { (s, dir) =>
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      recent
        .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).cast("long").as("n_recent"),
          coalesce(sum(cents(col("o_totalprice"))), lit(0L)).cast("long").as("sum_cents"))
        .orderBy(col("c_custkey"))
    },

    // Full outer of two small aggregates (per-nation customer vs
    // supplier counts); at sf0.001 some nations lack suppliers → the
    // NULL-filling path is genuinely exercised.
    "q_join_full" -> { (s, dir) =>
      val cc = Tables.customer(s, dir).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).cast("long").as("c_cnt"))
      val sc = Tables.supplier(s, dir).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).cast("long").as("s_cnt"))
      cc.join(sc, col("c_nationkey") === col("s_nationkey"), "full")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("c_cnt"), lit(0L)).as("customers"),
          coalesce(col("s_cnt"), lit(0L)).as("suppliers"))
        .orderBy(col("nationkey"))
    },

    "q_join_semi" -> { (s, dir) =>
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Customers with no RECENT order (anti vs a date-filtered orders
    // set): the unfiltered form returned 0 rows at every tested SF
    // (every customer has some order), making the oracle match vacuous
    // — 1998-06-01 yields 3/8/142 rows at sf0.001/0.01/0.1, so the
    // anti-join path is exercised on non-empty output everywhere.
    "q_join_anti" -> { (s, dir) =>
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1998-06-01").cast("timestamp"))
      Tables.customer(s, dir)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    "q_join_cross" -> { (s, dir) =>
      Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Theta/band join: orders against a tiny derived band table on a
    // range predicate → BroadcastNestedLoopJoin (bcdp R7 bilinear
    // analog: value lands in the grid cell whose bounds contain it).
    "q_join_range" -> { (s, dir) =>
      import s.implicits._
      val bands = Seq(
        (0.0, 50000.0, "b0_under_50k"),
        (50000.0, 150000.0, "b1_50k_150k"),
        (150000.0, 300000.0, "b2_150k_300k"),
        (300000.0, 1.0e9, "b3_over_300k")).toDF("lo", "hi", "band")
      Tables.orders(s, dir)
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          sum(cents(col("o_totalprice"))).cast("long").as("sum_price_cents"))
        .orderBy(col("band"))
    },

    // Same task through the custom tier-(c) operator (plans.AsOfJoin):
    // (bandedIntervalJoin below is the BIG-BIG form of this family)
    // merge-pass exec with O(1) state instead of a window carrying the
    // signup column through every row. Shares q_join_asof's oracle —
    // the two implementations must hash-match the same DuckDB result.
    "q_join_asof_native" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      graft.plans.AsOf.join(s, purchases, signups, "user_id", "s_user", "ts", "s_ts")
        .select(col("event_id"), col("user_id"),
          tstr(col("ts")).as("purchase_ts"),
          tstr(col("s_ts")).as("signup_ts"))
        .orderBy(col("event_id"))
    },

    // As-of join via partitioned window: for each purchase, the most
    // recent strictly-prior signup ts of the same user. One shuffle on
    // user_id, no self-join — the shape that scales.
    "q_join_asof" -> { (s, dir) =>
      purchasesWithPriorSignup(s, dir)
        .select(col("event_id"), col("user_id"),
          tstr(col("ts")).as("purchase_ts"),
          tstr(col("prior_signup")).as("signup_ts"))
        .orderBy(col("event_id"))
    },

    // Correlated LATERAL join (SQL:1999 lateral derived table; Spark
    // plans it via DecorrelateInnerQuery → a ranked window under the
    // hood, so the per-group LIMIT never becomes a nested loop): top-2
    // customers by balance per nation. Exact integer cents; LIMIT
    // tie-broken by key on both engines. Dataset-API form
    // (Dataset.lateralJoin + Column.outer(), Spark 4) — no temp-view
    // registration, so the query fn is side-effect-free like the other
    // map entries; the decorrelated plan is identical to the SQL form
    // (WindowGroupLimit-Partial pin in PlanAuditSpec).
    "q_join_lateral" -> { (s, dir) =>
      val top2 = Tables.customer(s, dir)
        .where(col("c_nationkey") === col("n_nationkey").outer())
        .select(col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"))
        .orderBy(col("bal_cents").desc, col("c_custkey"))
        .limit(2)
      Tables.nation(s, dir).lateralJoin(top2)
        .select(col("n_name"), col("c_custkey"), col("bal_cents"))
        .orderBy(col("n_name"), col("bal_cents").desc, col("c_custkey"))
    },

    // Big-big interval join, GRADED: purchases × same-user clicks in
    // the prior 24 h through bandedIntervalJoin (the equi-join rewrite
    // below), aggregated per purchase with order-independent aggregates
    // (count + max). DedupScaleSpec proves the rewrite lossless against
    // the theta form; this row grades it end-to-end against DuckDB's
    // plain range-predicate join.
    "q_join_interval" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("p_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          unix_micros(col("ts")).as("c_us"))
      bandedIntervalJoin(purchases, clicks, "user_id", "c_user", "p_us", "c_us",
          beforeUs = 24L * 3600 * 1000000)
        .groupBy(col("event_id"), col("user_id"), col("ts"))
        .agg(count(lit(1)).cast("long").as("n_clicks"),
          max(col("c_ts")).as("last_click"))
        .select(col("event_id"), col("user_id"),
          tstr(col("ts")).as("purchase_ts"),
          col("n_clicks"),
          tstr(col("last_click")).as("last_click_ts"))
        .orderBy(col("event_id"))
    },

    // As-of with TOLERANCE (pandas merge_asof(tolerance=...)): the
    // prior signup only counts if it is within the 24 h lookback;
    // older matches yield the null fill. Same window emulation plus a
    // bounded-age gate — also AsOfJoinSpec proves plans.AsOf.join with
    // tolerance agrees with this oracle-matched form on this (tie-free)
    // data.
    "q_join_asof_tol" -> { (s, dir) =>
      purchasesWithPriorSignup(s, dir)
        .withColumn("recent_signup",
          when(col("prior_signup") >= col("ts") - expr("INTERVAL 24 HOURS"),
            col("prior_signup")))
        .select(col("event_id"), col("user_id"),
          tstr(col("ts")).as("purchase_ts"),
          tstr(col("recent_signup")).as("signup_ts"))
        .orderBy(col("event_id"))
    },

    // FORWARD as-of (r5) — pandas merge_asof(direction='forward'): for
    // each purchase, the EARLIEST strictly-later signup of the same
    // user. Exact mirror of purchasesWithPriorSignup: min over a
    // 1-FOLLOWING..UNBOUNDED frame on the same (ts, event_id) order,
    // so the backward and forward keys can never drift in tie-break.
    // Same scale shape: one shuffle on user_id, no self-join.
    "q_join_asof_fwd" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      Tables.events(s, dir)
        .withColumn("next_signup",
          min(when(col("event_type") === "signup", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          tstr(col("ts")).as("purchase_ts"),
          tstr(col("next_signup")).as("signup_ts"))
        .orderBy(col("event_id"))
    },

    // MERGE / upsert (r5) — the lakehouse writer's core operation:
    // apply a changes table (insert / update / delete ops) to a base
    // table in ONE full-outer hash join on the key, with the op flag
    // deciding survival and value. OSS Spark has no MERGE INTO without
    // a table format; this is the engine-level batch form, and the
    // 100 TB shape — one shuffle of both sides on the key, no driver
    // involvement, no per-row lookups. Changes are PLANTED from the
    // base (the q_text_pii precedent, mirrored literally in the
    // oracle): key%10==0 → delete, %10 in 1..3 → update (+12345
    // cents), %10==7 → insert under key+10⁷ (collision-free above
    // every fixture tier's key range).
    "q_merge_upsert" -> { (s, dir) =>
      val base = Tables.part(s, dir)
        .select(col("p_partkey").as("key"),
          cents(col("p_retailprice")).as("price_cents"))
      val ud = base.filter(col("key") % 10 <= 3)
        .select(col("key").as("c_key"),
          when(col("key") % 10 === 0, lit("D")).otherwise(lit("U")).as("op"),
          (col("price_cents") + 12345L).as("new_price_cents"))
      val ins = base.filter(col("key") % 10 === 7)
        .select((col("key") + 10000000L).as("c_key"), lit("I").as("op"),
          (col("price_cents") + 777L).as("new_price_cents"))
      val changes = ud.unionByName(ins)
      base.join(changes, col("key") === col("c_key"), "full_outer")
        .filter(coalesce(col("op"), lit("=")) =!= "D")
        .select(coalesce(col("key"), col("c_key")).as("key"),
          when(col("op").isin("U", "I"), col("new_price_cents"))
            .otherwise(col("price_cents")).as("price_cents"),
          coalesce(col("op"), lit("=")).as("src"))
        .orderBy(col("key"))
    },

    // TYPE-2 SCD history graded through its per-key rollup (r17): the
    // full 8M-version decade-2 history would swamp the compare, so the
    // key grades (n_versions, n_events, first/last opening, exact
    // micros-offset signatures over every valid_from/valid_to, open
    // count) per user — sums that pin every version boundary.
    // Signature base 2024-01-01 keeps |Σ Δµs| ≤ ~2e17 at decade-2
    // (and ≤ ~1e17 under epoch-extreme fuzz timestamps), five orders
    // inside 2⁶³.
    "q_merge_scd2" -> { (s, dir) =>
      val hist = scd2History(Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id")),
        "user_id", "event_type", "ts", "event_id")
      val base = lit(1704067200000000L) // 2024-01-01T00:00:00Z in µs
      hist.groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_versions"),
          sum(col("n_events")).cast("long").as("n_events"),
          tstr(min(col("valid_from"))).as("first_from"),
          tstr(max(col("valid_from"))).as("last_from"),
          sum(unix_micros(col("valid_from")) - base).cast("long")
            .as("from_sig"),
          sum(unix_micros(col("valid_to")) - base).cast("long")
            .as("to_sig"),
          (count(lit(1)) - count(col("valid_to"))).cast("long")
            .as("n_open"))
        .orderBy(col("user_id"))
    }
  )

  /** TYPE-2 slowly-changing-dimension history build — the warehouse
    * companion to MERGE (q_merge_upsert): collapse an ordered change
    * stream into versioned validity intervals, one row per version:
    * `(key, ver, value, valid_from, n_events, valid_to)`. A version
    * opens at the key's first event or whenever the tracked value
    * changes (NULL-safe compare, so NULL is a real trackable state);
    * `valid_from` is the version's first event timestamp, `valid_to`
    * the next version's `valid_from` (NULL = the current version —
    * half-open [from, to) intervals, the standard SCD2 convention).
    * `tieCol` must make (tsCol, tieCol) a total order per key or
    * version boundaries are layout-dependent.
    *
    * Scale shape: ONE shuffle on the key — the change flag, the
    * running version counter, the per-version rollup, and the
    * valid_to lead all reuse the same partitioning; no join, no
    * driver state. */
  def scd2History(df: DataFrame, keyCol: String, valCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__chg", when(col("__rn") === 1 ||
        !(col(valCol) <=> lag(col(valCol), 1).over(w)), 1L).otherwise(0L))
      .withColumn("ver", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("ver"))
      .agg(min(col(valCol)).as(valCol), // constant within a version
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(col("ver"))))
  }

  /** Shared emulation body for the two as-of keys: purchases annotated
    * with the most recent strictly-prior signup ts per user — one
    * window definition, so the frame/tie-break can never drift between
    * the plain and tolerance variants. */
  private def purchasesWithPriorSignup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("prior_signup",
        max(when(col("event_type") === "signup", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
  }

  private val revC4Sql =
    "CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))"

  val oracle: Map[String, String] = Map(
    "q_join_inner" ->
      s"""SELECT o_orderstatus,
         |  CAST(SUM($revC4Sql) AS BIGINT) AS rev_c4,
         |  CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,

    "q_join_multiway" ->
      s"""SELECT r_name,
         |  CAST(SUM($revC4Sql) AS BIGINT) AS rev_c4,
         |  CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM lineitem
         |  JOIN orders   ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation   ON c_nationkey = n_nationkey
         |  JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name
         |ORDER BY r_name""".stripMargin,

    "q_join_broadcast" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey,
        |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_recent,
        |  CAST(COALESCE(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)), 0) AS BIGINT) AS sum_cents
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01') o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey,
        |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_recent,
        |  CAST(COALESCE(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)), 0) AS BIGINT) AS sum_cents
        |FROM (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01') o
        |RIGHT JOIN customer ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_join_full" ->
      """SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |  CAST(COALESCE(c_cnt, 0) AS BIGINT) AS customers,
        |  CAST(COALESCE(s_cnt, 0) AS BIGINT) AS suppliers
        |FROM (SELECT c_nationkey, COUNT(*) AS c_cnt FROM customer GROUP BY c_nationkey) cc
        |FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS s_cnt FROM supplier GROUP BY s_nationkey) sc
        |  ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1998-06-01')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_range" ->
      """SELECT band,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM orders
        |JOIN (VALUES (0.0, 50000.0, 'b0_under_50k'),
        |             (50000.0, 150000.0, 'b1_50k_150k'),
        |             (150000.0, 300000.0, 'b2_150k_300k'),
        |             (300000.0, 1e9, 'b3_over_300k')) AS b(lo, hi, band)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band
        |ORDER BY band""".stripMargin,

    // DuckDB's native ASOF JOIN has the operator's exact inclusive
    // (right.on <= left.on) semantics, so this oracle stays correct
    // even under equal-timestamp ties, where the window-emulation
    // oracle's (ts, event_id) tie-break would diverge.
    "q_join_asof_native" ->
      """SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(s.s_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id AS s_user, ts AS s_ts FROM events
        |                WHERE event_type = 'signup') s
        |  ON p.user_id = s.s_user AND p.ts >= s.s_ts
        |ORDER BY p.event_id""".stripMargin,
    "q_join_asof" -> asofOracle,

    "q_join_asof_fwd" ->
      """SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(next_signup, '%Y-%m-%d %H:%M:%S') AS signup_ts
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_signup
        |  FROM events) t
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT p_partkey AS key,
        |    CAST(ROUND(p_retailprice*100) AS BIGINT) AS price_cents
        |  FROM part),
        |changes AS (
        |  SELECT key AS c_key,
        |    CASE WHEN key % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    price_cents + 12345 AS new_price_cents
        |  FROM base WHERE key % 10 <= 3
        |  UNION ALL
        |  SELECT key + 10000000 AS c_key, 'I' AS op,
        |    price_cents + 777 AS new_price_cents
        |  FROM base WHERE key % 10 = 7)
        |SELECT COALESCE(key, c_key) AS key,
        |  CASE WHEN op IN ('U','I') THEN new_price_cents
        |       ELSE price_cents END AS price_cents,
        |  COALESCE(op, '=') AS src
        |FROM base FULL JOIN changes ON key = c_key
        |WHERE COALESCE(op, '=') <> 'D'
        |ORDER BY key""".stripMargin,

    // the version counter over the same (ts, event_id) total order;
    // IS DISTINCT FROM mirrors Spark's null-safe <=>; every SUM CAST
    // back from HUGEINT (§2.8 rule 4); DATE_DIFF µs mirrors
    // unix_micros minus the 2024-01-01 base exactly
    "q_merge_scd2" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts,
        |    ROW_NUMBER() OVER w AS rn,
        |    LAG(event_type) OVER w AS pv
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (
        |  SELECT user_id, event_type, ts,
        |    SUM(CASE WHEN rn = 1 OR event_type IS DISTINCT FROM pv
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
        |  FROM o),
        |h AS (
        |  SELECT user_id, ver, MIN(ts) AS valid_from,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM f GROUP BY 1, 2),
        |h2 AS (
        |  SELECT user_id, valid_from, n_events,
        |    LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY ver)
        |      AS valid_to
        |  FROM h)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_versions,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  strftime(MIN(valid_from), '%Y-%m-%d %H:%M:%S') AS first_from,
        |  strftime(MAX(valid_from), '%Y-%m-%d %H:%M:%S') AS last_from,
        |  CAST(SUM(DATE_DIFF('microsecond', TIMESTAMP '2024-01-01',
        |    valid_from)) AS BIGINT) AS from_sig,
        |  CAST(SUM(DATE_DIFF('microsecond', TIMESTAMP '2024-01-01',
        |    valid_to)) AS BIGINT) AS to_sig,
        |  CAST(COUNT(*) - COUNT(valid_to) AS BIGINT) AS n_open
        |FROM h2 GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_join_lateral" ->
      """SELECT n.n_name, c.c_custkey, c.bal_cents
        |FROM nation n,
        |LATERAL (SELECT c_custkey,
        |           CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_cents
        |         FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY bal_cents DESC, c_custkey
        |         LIMIT 2) c
        |ORDER BY n.n_name, c.bal_cents DESC, c.c_custkey""".stripMargin,

    // Plain range-predicate join: DuckDB plans this directly (IEJoin);
    // Spark runs the banded equi-join rewrite — same rows by the
    // losslessness argument at bandedIntervalJoin's doc.
    "q_join_interval" ->
      """SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  CAST(COUNT(*) AS BIGINT) AS n_clicks,
        |  strftime(MAX(c.c_ts), '%Y-%m-%d %H:%M:%S') AS last_click_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id AS c_user, ts AS c_ts FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.c_user AND c.c_ts <= p.ts
        | AND c.c_ts >= p.ts - INTERVAL 24 HOURS
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_join_asof_tol" ->
      """SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(CASE WHEN prior_signup >= ts - INTERVAL 24 HOURS
        |           THEN prior_signup END, '%Y-%m-%d %H:%M:%S') AS signup_ts
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    MAX(CASE WHEN event_type = 'signup' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_signup
        |  FROM events) t
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin
  )

  private lazy val asofOracle =
      """SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(prior_signup, '%Y-%m-%d %H:%M:%S') AS signup_ts
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    MAX(CASE WHEN event_type = 'signup' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_signup
        |  FROM events) t
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin

  /** Big-big interval join: left rows (key, tUs) matched to right rows
    * (key, tUs2) with `tUs2 ∈ [tUs − beforeUs, tUs]`.
    *
    * The theta form (`range` predicate in the join condition) plans as
    * a nested-loop join — fine when one side broadcasts (q_join_range's
    * band table), fatal when BOTH sides are fact tables. Banding turns
    * it into an equi-join: band = tUs div bandUs; each LEFT row
    * explodes into the ⌈beforeUs/bandUs⌉+1 bands its window spans, the
    * join runs on (key, band) — a plain shuffled hash/sort-merge join —
    * and the exact interval predicate filters residually. With
    * bandUs = beforeUs (the default) each left row lands in ≤2 bands,
    * so join input is ≤2×|L| + |R| rows; every true match shares a band
    * by construction, so the rewrite is lossless. The right side is
    * NOT exploded — it is the bigger side in the typical
    * events-vs-events case, and banding one side suffices.
    *
    * Skew: a hot key (one user with millions of events) concentrates
    * its rows in a few (key, band) join partitions. Because the plan is
    * a plain shuffled equi-join, AQE's skew-join split handles exactly
    * this at runtime (splits oversized partitions, replicates the other
    * side) — which is why the rewrite targets an equi-join shape rather
    * than anything custom; for AQE-off deployments use
    * [[bandedIntervalJoinSalted]], the Skew.saltedJoin composition on
    * the banded keys (result-equality pinned in SkewSpec under an
    * AQE-off half-the-events-on-one-user distribution). */
  def bandedIntervalJoin(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTimeUs: String, rightTimeUs: String,
                         beforeUs: Long,
                         bandUs: Long = 0L): DataFrame = {
    val (l, r) = bandSides(left, right, leftTimeUs, rightTimeUs, beforeUs, bandUs)
    l.join(r,
        l(leftKey) === r(rightKey) && l("_band") === r("_band")
          && r(rightTimeUs) <= l(leftTimeUs)
          && r(rightTimeUs) >= l(leftTimeUs) - beforeUs)
      .drop("_band")
  }

  /** The shared banding step of the interval-join rewrite: the LEFT
    * side exploded into every band its lookback window spans, the RIGHT
    * side assigned its single band. */
  private def bandSides(left: DataFrame, right: DataFrame,
                        leftTimeUs: String, rightTimeUs: String,
                        beforeUs: Long, bandUs: Long): (DataFrame, DataFrame) = {
    require(beforeUs >= 0, s"beforeUs must be non-negative, got $beforeUs")
    val w = if (bandUs > 0) bandUs else beforeUs
    require(w > 0,
      "band width is zero: pass bandUs > 0 when beforeUs == 0 (exact-instant window)")
    val nBands = (beforeUs / w).toInt + 1
    val l = left.withColumn("_band", explode(
        transform(sequence(lit(0), lit(nBands)),
          i => (col(leftTimeUs) - col(leftTimeUs) % w) / w - i)))
      .filter(col("_band") >= (col(leftTimeUs) - beforeUs - (col(leftTimeUs) - beforeUs) % w) / w)
    val r = right.withColumn("_band", (col(rightTimeUs) - col(rightTimeUs) % w) / w)
    (l, r)
  }

  /** [[bandedIntervalJoin]] for AQE-OFF deployments with a hot key: the
    * literal Skew.saltedJoin composition the doc above promises. The
    * (bigger) right side is the salted fact, the exploded left side is
    * replicated across `saltBuckets`, the equi-join runs on
    * (key, band, salt), and the exact interval predicate filters
    * residually — so a hot (key, band) partition spreads over
    * `saltBuckets` tasks. Identical rows to the unsalted form (the salt
    * is matched by construction; SkewSpec pins equality), though column
    * ORDER differs (using-join: right side first). Both sides must have
    * disjoint column names. */
  def bandedIntervalJoinSalted(left: DataFrame, right: DataFrame,
                               leftKey: String, rightKey: String,
                               leftTimeUs: String, rightTimeUs: String,
                               beforeUs: Long, saltBuckets: Int,
                               bandUs: Long = 0L): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    val (l0, r0) = bandSides(left, right, leftTimeUs, rightTimeUs, beforeUs, bandUs)
    // using-column join keys must share names across the two sides
    val l = l0.withColumn("_jk", col(leftKey))
    val r = r0.withColumn("_jk", col(rightKey))
    Skew.saltedJoin(r, l, Seq("_jk", "_band"), saltBuckets)
      .filter(col(rightTimeUs) <= col(leftTimeUs)
        && col(rightTimeUs) >= col(leftTimeUs) - beforeUs)
      .drop("_jk", "_band")
  }
}
