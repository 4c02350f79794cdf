package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Out.SmallOrderOps

import graft.core.Tables
import graft.functions.StableAgg

/** The declared parity query set from SURVEY.md §2.9 (Q1–Q10), expressed
  * Spark-first with the DataFrame API so Catalyst gets a fully declarative
  * plan: filters and projections push into the parquet scan, ORDER BY+LIMIT
  * collapses to TakeOrderedAndProject, aggregates get map-side partials.
  *
  * Every computed column is aliased identically to the DuckDB oracle SQL
  * (SparkEntry.oracleSql) — the driver's compare sorts columns by name.
  *
  * Reference semantics cited per query; see /root/reference/query.js and
  * README.md via SURVEY.md §2.
  */
object Declared {

  /** Q1 — projection+filter+order+limit, the core reference query shape
    * (reference README.md:158; rewriter path query.js:162–170). */
  def q1(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 100000 && col("o_orderstatus") === "O")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  /** Q2 — LIKE predicate (reference README.md:158 `payload LIKE '%INVITE%'`). */
  def q2(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .filter(col("p_name").like("%red%"))
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
      .limit(50)

  /** Q3 — scalar aggregates without GROUP BY (reference loopback_test.sh:46). */
  def q3(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .agg(
        count(lit(1)).as("cnt"),
        StableAgg.avgScaledLong(col("l_quantity"), 100).as("avg_qty_x100"),
        StableAgg.sumMicros(col("l_extendedprice")).as("sum_price_micros"),
        min(col("l_shipdate")).as("min_d"),
        max(col("l_shipdate")).as("max_d"))

  /** Q4 — GROUP BY + aliases (reference README.md:216; tier [D] — the
    * reference rewriter drops GROUP BY, we implement documented intent). */
  def q4(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        StableAgg.sumMicros(col("l_quantity")).as("s_qty_micros"))
      .orderAgg("l_returnflag", "l_linestatus")

  /** Q5 — time-range predicate, strict vs non-strict ops preserved
    * (reference query.js:88–108 conflates them; we keep them distinct). */
  def q5(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .filter(col("ts") >= lit("2024-01-01 00:00:00").cast("timestamp") &&
              col("ts") <  lit("2024-06-01 00:00:00").cast("timestamp"))
      .select("event_id", "event_type")
      .orderBy("event_id")
      .limit(100)

  /** Q6 — IN / BETWEEN (declared predicate surface, SURVEY §2.2). */
  def q6(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
              col("o_totalprice").between(1000, 50000))
      .select("o_orderkey")
      .orderBy("o_orderkey")
      .limit(100)

  /** Q7 — string functions (declared scalar surface, SURVEY §2.6). */
  def q7(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("un"),
        length(col("c_mktsegment")).as("ln"),
        substring(col("c_name"), 1, 8).as("pfx"))
      .orderBy("c_custkey")
      .limit(50)

  /** Q8 — date_trunc + GROUP BY on a derived column. DuckDB's
    * date_trunc('month') yields DATE; Spark's yields TIMESTAMP — both sides
    * normalized to DATE so the oracle hash compares like-for-like. */
  def q8(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(trunc(col("o_orderdate"), "month").as("m"))
      .agg(count(lit(1)).as("cnt"))
      .orderAgg("m")

  /** Q9 — CASE / math (declared scalar surface). */
  def q9(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        when(col("l_discount") > 0.05, "HI").otherwise("LO").as("band"),
        StableAgg.scaledLong(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 100).as("net_x100"))
      // (l_orderkey, l_linenumber) is NOT unique at sf0.1 — order by every
      // output column so the LIMIT prefix is total (caught by a 10x-scale
      // oracle spot-check in round 2).
      .orderBy("l_orderkey", "l_linenumber", "net_x100", "band")
      .limit(100)

  /** Q10a — count(DISTINCT). */
  def q10CountDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .agg(countDistinct(col("o_custkey")).as("u"))

  /** Q10b — LIMIT/OFFSET paging (reference README.md:135; tier [D] — the
    * reference regex drops OFFSET, we implement documented intent). */
  def q10Offset(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select("o_orderkey")
      .orderBy("o_orderkey")
      .offset(10)
      .limit(10)

  /** Q11 — remaining string family: lower/concat/trim/replace (SURVEY
    * §2.6 declared subset, [P] passthrough tier). */
  def q11(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("lo"),
        concat(col("c_mktsegment"), lit("-"), col("c_name")).as("cc"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("tr"),
        regexp_replace(col("c_name"), lit("Customer"), lit("C")).as("rep"))
      .orderBy("c_custkey")
      .limit(50)

  /** Q12 — remaining date family: extract year/month/day (SURVEY §2.6). */
  def q12(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"))
      .orderBy("o_orderkey")
      .limit(100)

  /** Q13 — conditional family: coalesce/nullif (SURVEY §2.6). */
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("X")).as("rf"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc"))
      .orderBy("l_orderkey", "l_linenumber", "disc", "rf")
      .limit(100)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q11_string_funcs2"     -> (q11 _),
    "q12_date_extract"      -> (q12 _),
    "q13_conditional"       -> (q13 _),
    "q1_filter_order_limit" -> (q1 _),
    "q2_like"               -> (q2 _),
    "q3_scalar_agg"         -> (q3 _),
    "q4_group_by"           -> (q4 _),
    "q5_time_range"         -> (q5 _),
    "q6_in_between"         -> (q6 _),
    "q7_string_funcs"       -> (q7 _),
    "q8_date_trunc_group"   -> (q8 _),
    "q9_case_math"          -> (q9 _),
    "q10_count_distinct"    -> (q10CountDistinct _),
    "q10_limit_offset"      -> (q10Offset _))

  val oracleSql: Map[String, String] = Map(
    "q11_string_funcs2" ->
      """SELECT c_custkey, lower(c_name) AS lo,
        |concat(c_mktsegment, '-', c_name) AS cc,
        |trim(concat('  ', c_name, '  ')) AS tr,
        |regexp_replace(c_name, 'Customer', 'C') AS rep
        |FROM customer ORDER BY c_custkey LIMIT 50""".stripMargin,
    "q12_date_extract" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |day(o_orderdate) AS d FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q13_conditional" ->
      """SELECT l_orderkey, l_linenumber,
        |coalesce(nullif(l_returnflag, 'N'), 'X') AS rf,
        |coalesce(nullif(l_discount, 0.0), -1.0) AS disc
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, disc, rf LIMIT 100""".stripMargin,
    "q1_filter_order_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q2_like" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%red%' ORDER BY p_partkey LIMIT 50",
    "q3_scalar_agg" ->
      """SELECT count(*) AS cnt,
        |CAST(round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity) * 100) AS BIGINT) AS avg_qty_x100,
        |CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_price_micros,
        |min(l_shipdate) AS min_d, max(l_shipdate) AS max_d FROM lineitem""".stripMargin,
    "q4_group_by" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS s_qty_micros
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q5_time_range" ->
      """SELECT event_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-06-01 00:00:00'
        |ORDER BY event_id LIMIT 100""".stripMargin,
    "q6_in_between" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_totalprice BETWEEN 1000 AND 50000
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q7_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS un, length(c_mktsegment) AS ln,
        |substring(c_name, 1, 8) AS pfx FROM customer ORDER BY c_custkey LIMIT 50""".stripMargin,
    "q8_date_trunc_group" ->
      """SELECT date_trunc('month', o_orderdate) AS m, count(*) AS cnt
        |FROM orders GROUP BY date_trunc('month', o_orderdate) ORDER BY m""".stripMargin,
    "q9_case_math" ->
      """SELECT l_orderkey, l_linenumber,
        |CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS band,
        |CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS net_x100
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, net_x100, band LIMIT 100""".stripMargin,
    "q10_count_distinct" ->
      "SELECT count(DISTINCT o_custkey) AS u FROM orders",
    "q10_limit_offset" ->
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 10")
}
