package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}
import Det._

/** SURVEY §2.9 family E — scalar function surface (§2.5), one query per
  * family, each exercising ≥5 functions present in both Spark 4.1 and
  * DuckDB 1.0. All per-row expressions (identical IEEE/Unicode ops per
  * row in both engines → deterministic without rounding tricks, except
  * real-valued math which is round-4).
  *
  * Cross-engine alignments (measured this session):
  *  - Spark dayofweek is 1=Sunday, DuckDB 0=Sunday → Spark emits -1;
  *  - length/levenshtein/ranking ints cast BIGINT on both sides;
  *  - array elements are float32: cast to DOUBLE before any arithmetic
  *    (§2.8 rule 7b), folds written left-assoc identically.
  */
object Functions {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_string" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 8).as("sub8"),
          length(col("p_name")).cast("long").as("len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("cat"),
          regexp_replace(col("p_type"), lit(" "), lit("_")).as("rep"),
          lpad(col("p_brand"), 12, "*").as("pad"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trm"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("rex"),
          levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"),
          md5(col("p_name")).as("md5h"),
          when(col("p_name").like("%red%"), 1L).otherwise(0L).as("has_red"))
        .orderBy(col("p_partkey"))
    },

    "q_fn_date" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow0"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          tstr(date_trunc("month", col("o_orderdate"))).as("month_start"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
          datediff(lit("2000-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to_y2k"))
        .orderBy(col("o_orderkey"))
    },

    "q_fn_math" -> { (s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          floor(col("c_acctbal")).cast("long").as("flr"),
          ceil(col("c_acctbal")).cast("long").as("cl"),
          abs(cents(col("c_acctbal"))).as("abs_cents"),
          (cents(col("c_acctbal")) % 97).as("mod97"),
          pow(col("c_custkey") % 10, 2).cast("long").as("pow2"),
          r4(sqrt(abs(col("c_acctbal")))).as("sqrt_abs"),
          r4(log(abs(cents(col("c_acctbal"))) + lit(1))).as("ln_c"),
          r4(log10(abs(cents(col("c_acctbal"))) + lit(1))).as("log10_c"),
          signum(col("c_acctbal")).cast("long").as("sgn"))
        .orderBy(col("c_custkey"))
    },

    // Higher-order functions over the float32 embedding (no UDFs): the
    // fold is written left-assoc and the oracle spells the identical
    // chain of +, so both engines sum in index order (§2.8 rule 7b).
    "q_fn_array" -> { (s, dir) =>
      val emb = transform(col("embedding"), x => x.cast("double"))
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("alen"),
          r4(element_at(emb, 1)).as("e1"),
          r4(element_at(emb, -1)).as("elast"),
          r4(aggregate(slice(emb, 1, 8), lit(0.0), (acc, x) => acc + x)).as("sum8"),
          r4(element_at(transform(emb, x => x * 2), 3)).as("dbl3"))
        .orderBy(col("vec_id"))
    },

    "q_fn_json" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("cnt"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).cast("long").as("min_k"),
          max(col("k")).cast("long").as("max_k"))
        .orderBy(col("event_type"))
    },

    // Map family (§2.5 row 7, closed in r4): a MAP column itself can't
    // ride to the oracle (DuckDB map literals don't round-trip parquet
    // identically — the original exclusion reason), so the map is built
    // and consumed IN-QUERY — from_json to map, map_from_entries over
    // sorted entries, then map_keys / element_at / map_filter /
    // map_concat / size — and only flat columns leave. The oracle
    // computes the same semantics relationally, exactly like every
    // other equivalence-form oracle in this file. Entries are sorted
    // before map_from_entries, so map_keys order is deterministic.
    "q_fn_map" -> { (s, dir) =>
      val propsMap = from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
      val counts = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          element_at(propsMap, "k").as("k"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("cnt"),
          sum(col("k")).cast("long").as("sum_k_part"))
      counts.groupBy(col("user_id"))
        .agg(
          map_from_entries(array_sort(
            collect_list(struct(col("event_type"), col("cnt"))))).as("m"),
          sum(col("sum_k_part")).cast("long").as("sum_k"))
        .select(
          col("user_id"),
          size(col("m")).cast("long").as("n_types"),
          concat_ws(",", map_keys(col("m"))).as("types_csv"),
          coalesce(element_at(col("m"), lit("purchase")), lit(0L)).as("n_purchase"),
          size(map_filter(col("m"), (_, v) => v >= 5)).cast("long").as("n_hot"),
          size(map_concat(col("m"), map(lit("_total"), lit(-1L)))).cast("long").as("n_concat"),
          col("sum_k"))
        .orderBy(col("user_id"))
    },

    // URL family (r4): Spark's real parse_url (codegen'd) over
    // in-query-constructed well-formed URLs — the domain-extraction /
    // URL-keyed-dedup shape of a crawl pipeline. DuckDB has no
    // parse_url, so the oracle re-derives each part with RE2-safe
    // regexp_extract; on URLs of this constructed shape (no userinfo,
    // no port, no fragment, single ?) the two definitions coincide
    // exactly — same equivalence-form oracle pattern as q_fn_map.
    "q_fn_url" -> { (s, dir) =>
      val url = concat(lit("https://"), lower(col("c_mktsegment")),
        lit(".example.com/u/"), col("c_custkey").cast("string"),
        lit("/orders?page="), (col("c_custkey") % 13).cast("string"),
        lit("&ref=mail"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), url.as("url"))
        .select(col("c_custkey"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("page")).cast("long").as("page"))
        .orderBy(col("c_custkey"))
    },

    // ANSI error-safe family (r4): Spark 4 runs ANSI mode by default,
    // where bad casts / division by zero / out-of-range element_at
    // THROW — the try_* forms give the per-row NULL semantics a dirty
    // corpus needs. Oracle equivalences: TRY_CAST is native DuckDB;
    // try_divide ↔ x / NULLIF(y, 0) (both engines' / on integers is
    // IEEE double division — exact on these magnitudes); out-of-range
    // try_element_at ↔ DuckDB list indexing, which is NULL-total.
    // Corrupt strings PLANTED via o_orderkey % 3 (same CASE in the
    // oracle) so every branch exercises non-vacuously at every SF.
    "q_fn_try" -> { (s, dir) =>
      val id = col("o_orderkey")
      val str = when(id % 3 === 0, concat(lit("x"), id.cast("string")))
        .otherwise(id.cast("string"))
      Tables.orders(s, dir)
        .select(id.as("okey"), str.as("s"))
        .select(col("okey"),
          expr("try_cast(s AS BIGINT)").as("cast_ok"),
          try_divide(col("okey"), col("okey") % 7).as("ratio"),
          try_element_at(array(col("okey")), lit(5)).as("elem"))
        .orderBy(col("okey"))
    },

    // Bitwise function family (r5): &, |, xor, shifts, popcount over
    // BIGINT keys — the hash/bucket/bitmask primitives every
    // partitioning scheme leans on (zorderValue composes exactly
    // these). Two's-complement BIGINT semantics are identical in both
    // engines; DuckDB spells xor as xor(a,b) and popcount as
    // bit_count, Spark as ^ and bit_count.
    "q_fn_bitwise" -> { (s, dir) =>
      val k = col("o_orderkey")
      Tables.orders(s, dir)
        .select(k.as("okey"),
          k.bitwiseAND(lit(255L)).as("band"),
          k.bitwiseOR(lit(4096L)).as("bor"),
          k.bitwiseXOR(col("o_custkey")).as("bxor"),
          shiftleft(k, 3).as("shl"),
          shiftright(k, 2).as("shr"),
          expr("bit_count(o_orderkey)").cast("long").as("nbits"))
        .orderBy(col("okey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  substr(p_name, 1, 8) AS sub8,
        |  CAST(length(p_name) AS BIGINT) AS len,
        |  concat(p_brand, '#', p_type) AS cat,
        |  replace(p_type, ' ', '_') AS rep,
        |  lpad(p_brand, 12, '*') AS pad,
        |  trim('  ' || p_brand || '  ') AS trm,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS rex,
        |  CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
        |  md5(p_name) AS md5h,
        |  CAST(CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS BIGINT) AS has_red
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q_fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mon,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q_fn_math" ->
      """SELECT c_custkey,
        |  CAST(floor(c_acctbal) AS BIGINT) AS flr,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS cl,
        |  abs(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS abs_cents,
        |  CAST(ROUND(c_acctbal*100) AS BIGINT) % 97 AS mod97,
        |  CAST(power(c_custkey % 10, 2) AS BIGINT) AS pow2,
        |  ROUND(sqrt(abs(c_acctbal)), 4) AS sqrt_abs,
        |  ROUND(ln(abs(CAST(ROUND(c_acctbal*100) AS BIGINT)) + 1), 4) AS ln_c,
        |  ROUND(log10(abs(CAST(ROUND(c_acctbal*100) AS BIGINT)) + 1), 4) AS log10_c,
        |  CAST(sign(c_acctbal) AS BIGINT) AS sgn
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_fn_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS alen,
        |  ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e1,
        |  ROUND(CAST(embedding[-1] AS DOUBLE), 4) AS elast,
        |  ROUND(0.0 + CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
        |      + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)
        |      + CAST(embedding[5] AS DOUBLE) + CAST(embedding[6] AS DOUBLE)
        |      + CAST(embedding[7] AS DOUBLE) + CAST(embedding[8] AS DOUBLE), 4) AS sum8,
        |  ROUND(CAST(embedding[3] AS DOUBLE) * 2, 4) AS dbl3
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "q_fn_json" ->
      """SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // Relational equivalence form of the map semantics: per-user
    // distinct-type count (size/map_keys), sorted-key concat, the
    // 'purchase' lookup (element_at), the cnt>=5 entry count
    // (map_filter), size after a disjoint-key map_concat (+1), and the
    // summed props lookup.
    "q_fn_map" ->
      """WITH c AS (
        |  SELECT user_id, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k_part
        |  FROM events
        |  GROUP BY 1, 2
        |)
        |SELECT user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  string_agg(event_type, ',' ORDER BY event_type) AS types_csv,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN cnt END), 0) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN cnt >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
        |  CAST(COUNT(*) + 1 AS BIGINT) AS n_concat,
        |  CAST(SUM(sum_k_part) AS BIGINT) AS sum_k
        |FROM c
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_fn_url" ->
      """WITH u AS (
        |  SELECT c_custkey,
        |    'https://' || lower(c_mktsegment) || '.example.com/u/' ||
        |    CAST(c_custkey AS VARCHAR) || '/orders?page=' ||
        |    CAST(c_custkey % 13 AS VARCHAR) || '&ref=mail' AS url
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_extract(url, '^([a-z]+):', 1) AS proto,
        |  regexp_extract(url, '^[a-z]+://([^/?]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '[?](.*)$', 1) AS query,
        |  CAST(regexp_extract(url, '[?&]page=([0-9]+)', 1) AS BIGINT) AS page
        |FROM u
        |ORDER BY c_custkey""".stripMargin,

    "q_fn_try" ->
      """SELECT o_orderkey AS okey,
        |  TRY_CAST(CASE WHEN o_orderkey % 3 = 0
        |    THEN 'x' || CAST(o_orderkey AS VARCHAR)
        |    ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS cast_ok,
        |  o_orderkey / NULLIF(o_orderkey % 7, 0) AS ratio,
        |  ([o_orderkey])[5] AS elem
        |FROM orders
        |ORDER BY okey""".stripMargin,

    "q_fn_bitwise" ->
      """SELECT o_orderkey AS okey,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 4096 AS bor,
        |  xor(o_orderkey, o_custkey) AS bxor,
        |  o_orderkey << 3 AS shl,
        |  o_orderkey >> 2 AS shr,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS nbits
        |FROM orders
        |ORDER BY okey""".stripMargin
  )
}
