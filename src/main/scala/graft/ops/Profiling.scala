package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}
import Det._

/** Pipeline utilities every large-scale training-data job needs:
  * deterministic sampling and table profiling — both as declarative,
  * oracle-matched queries.
  *
  *  - Deterministic sampling: filter on a content-hash prefix of the
  *    primary key (md5 here because both engines compute identical
  *    digests — at 100 TB you'd use xxhash64 for speed). Unlike
  *    TABLESAMPLE / rand(), the sample is stable across runs, engines,
  *    partitionings and cluster sizes — reproducibility is the point.
  *  - Profiling: one aggregation pass computing row counts, key
  *    cardinalities, null counts, and value ranges — the
  *    `df.summary()` analog, written explicitly so it hash-matches.
  */
object Profiling {

  /** Data-quality expectations (the Deequ / Great-Expectations shape):
    * named row-level predicates evaluated in ONE aggregation pass —
    * each expectation becomes a conditional count, so 20 checks cost
    * the same scan as one. A predicate that evaluates NULL counts as a
    * VIOLATION (a NULL quantity failing a range check must not slip a
    * `viol == 0` gate). Returns a single row of violation counts. */
  def expect(df: DataFrame,
             expectations: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val aggs = expectations.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).cast("long").as(s"viol_$name")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Deterministic STRATIFIED sampling: exactly `n` rows per stratum
    * (language, source, label...), chosen by content-hash rank — the
    * balanced-subset builder of every training-data pipeline
    * ("20k docs per language"), stable across engines, partitionings
    * and cluster sizes, unlike sampleBy's Bernoulli draw which is
    * neither exact-count nor reproducible cross-engine. One window
    * pass. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains("rn"),
      "stratifiedSample adds an 'rn' rank column; rename the existing one first")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 20 docs per language, content-hash ranked.
    "q_sample_stratified" -> { (s, dir) =>
      stratifiedSample(Tables.documents(s, dir), "lang", "doc_id", 20)
        .select(col("lang"), col("doc_id"), col("rn"))
        .orderBy(col("lang"), col("rn"))
    },

    // One-pass expectation suite over lineitem (all pass on the
    // harness data — the zero row IS the assertion) + an orphan count
    // via anti-join for the referential check.
    "q_profile_expect" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val checks = expect(li, Seq(
        "qty_range" -> col("l_quantity").between(0.0, 100.0),
        "price_positive" -> (col("l_extendedprice") > 0.0),
        "flag_domain" -> col("l_returnflag").isin("A", "N", "R"),
        "status_domain" -> col("l_linestatus").isin("F", "O"),
        "keys_nonnull" -> (col("l_orderkey").isNotNull && col("l_partkey").isNotNull)))
      val orphans = li.join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).cast("long").as("viol_orphan_orderkey"))
      checks.crossJoin(orphans)
    },

    // ~1/16 deterministic sample of lineitem keyed on the PK digest.
    "q_sample_det" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(substring(md5(concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string"))), 1, 1) === "0")
        .select(col("l_orderkey").as("okey"),
          col("l_linenumber").cast("long").as("lnum"),
          cents(col("l_quantity")).as("qty_cents"))
        // total order over output values ((okey, lnum) has dups)
        .orderBy(col("okey"), col("lnum"), col("qty_cents"))
    },

    "q_profile_stats" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .agg(
          count(lit(1)).cast("long").as("n_rows"),
          countDistinct(col("l_orderkey")).cast("long").as("nd_orderkey"),
          countDistinct(col("l_partkey")).cast("long").as("nd_partkey"),
          countDistinct(col("l_returnflag")).cast("long").as("nd_returnflag"),
          sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).cast("long").as("nulls_returnflag"),
          min(cents(col("l_quantity"))).cast("long").as("min_qty_cents"),
          max(cents(col("l_quantity"))).cast("long").as("max_qty_cents"),
          min(tstr(col("l_shipdate"))).as("min_ship"),
          max(tstr(col("l_shipdate"))).as("max_ship"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_sample_stratified" ->
      """SELECT lang, doc_id, rn FROM (
        |  SELECT lang, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |  FROM documents) t
        |WHERE rn <= 20
        |ORDER BY lang, rn""".stripMargin,

    "q_profile_expect" ->
      """SELECT
        |  CAST(SUM(CASE WHEN (l_quantity BETWEEN 0.0 AND 100.0) THEN 0 ELSE 1 END) AS BIGINT) AS viol_qty_range,
        |  CAST(SUM(CASE WHEN (l_extendedprice > 0.0) THEN 0 ELSE 1 END) AS BIGINT) AS viol_price_positive,
        |  CAST(SUM(CASE WHEN (l_returnflag IN ('A','N','R')) THEN 0 ELSE 1 END) AS BIGINT) AS viol_flag_domain,
        |  CAST(SUM(CASE WHEN (l_linestatus IN ('F','O')) THEN 0 ELSE 1 END) AS BIGINT) AS viol_status_domain,
        |  CAST(SUM(CASE WHEN (l_orderkey IS NOT NULL AND l_partkey IS NOT NULL) THEN 0 ELSE 1 END) AS BIGINT) AS viol_keys_nonnull,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |    AS viol_orphan_orderkey
        |FROM lineitem""".stripMargin,

    "q_sample_det" ->
      """SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS lnum,
        |  CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_cents
        |FROM lineitem
        |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 1) = '0'
        |ORDER BY okey, lnum, qty_cents""".stripMargin,

    "q_profile_stats" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nd_orderkey,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd_partkey,
        |  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS nd_returnflag,
        |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_returnflag,
        |  CAST(MIN(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS min_qty_cents,
        |  CAST(MAX(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS max_qty_cents,
        |  MIN(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')) AS min_ship,
        |  MAX(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')) AS max_ship
        |FROM lineitem""".stripMargin
  )
}
