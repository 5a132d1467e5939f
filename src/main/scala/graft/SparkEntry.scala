package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.{Incremental, SnapshotExec}
import graft.functions.Fns
import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
import graft.mat.{Materializer, SeedLoader}

/** Driver contract: `queries` exercises every operator in SURVEY.md §2 (and
  * the LLM-pipeline extensions) end-to-end on the driver's testdata;
  * `oracleSql` holds the DuckDB-equivalent SQL for the correctness gate.
  * Column names/aliases are kept identical on both sides (the driver's
  * compare sorts columns by name and hashes values).
  *
  * Determinism rules used throughout:
  *  - aggregates over floating columns go through DECIMAL (exact, order-
  *    independent) and cast the final result to DOUBLE;
  *  - every result carries an ORDER BY;
  *  - timestamps are emitted at second precision or as DATE (the `events`
  *    table is nanosecond-precision parquet, which engines truncate
  *    differently).
  */
object SparkEntry {

  // ------------------------------------------------------------- helpers

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** Sum a double column exactly: decimal-cast, sum, back to double. */
  private def dsum(c: Column, p: Int = 18, sc: Int = 2): Column =
    sum(c.cast(s"decimal($p,$sc)")).cast("double")

  private def freshDb(s: SparkSession, db: String): Unit = {
    s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    s.sql(s"CREATE DATABASE $db")
  }

  /** Flagship query (Tutorial `customers` model: 3 CTEs, left join, agg —
    * reference docs/Tutorial.md:96-118) on sf=0.001; driver smoke-checks
    * rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val customers = t(spark, dir, "customer")
    val orderStats = t(spark, dir, "orders").groupBy(col("o_custkey")).agg(
      count(lit(1)).as("number_of_orders"),
      min(col("o_orderdate").cast("date")).as("first_order"),
      max(col("o_orderdate").cast("date")).as("most_recent_order"),
      dsum(col("o_totalprice")).as("total_amount"))
    customers
      .join(orderStats, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("number_of_orders"),
        col("first_order"), col("most_recent_order"), col("total_amount"))
      .orderBy(col("c_custkey"))
  }

  // =====================================================================
  // §2.2 relational operators
  // =====================================================================

  private def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(8,2)") - col("l_discount").cast("decimal(8,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |       (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def q02(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
    val n = t(s, dir, "nation"); val r = t(s, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q02Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders, COUNT(DISTINCT c_custkey) AS n_customers
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-03-01").cast("timestamp") &&
        col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate").cast("date").as("ship_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q03Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  CAST(l_shipdate AS DATE) AS ship_date
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-03-01'
      |  AND l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  private def q04(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    o.join(c, o("o_custkey") === c("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  private val q04Sql =
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private def q05(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1993-01-01").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  private val q05Sql =
    """SELECT c_mktsegment, COUNT(*) AS n FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE o_orderdate < TIMESTAMP '1993-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct().orderBy(col("o_orderstatus"), col("o_orderpriority"))

  private val q06Sql =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY 1, 2""".stripMargin

  private def q07(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "orders").select(col("o_custkey").as("id"), lit("ord").as("src"))
    val b = t(s, dir, "customer").select(col("c_custkey").as("id"), lit("cust").as("src"))
    a.unionByName(b).groupBy(col("src"))
      .agg(count(lit(1)).as("n"), countDistinct(col("id")).as("n_ids"))
      .orderBy(col("src"))
  }

  private val q07Sql =
    """SELECT src, COUNT(*) AS n, COUNT(DISTINCT id) AS n_ids FROM (
      |  SELECT o_custkey AS id, 'ord' AS src FROM orders
      |  UNION ALL SELECT c_custkey AS id, 'cust' AS src FROM customer
      |) GROUP BY 1 ORDER BY 1""".stripMargin

  private def q08(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    val b = t(s, dir, "orders").select(col("o_custkey").as("k"))
    a.intersect(b).orderBy(col("k"))
  }

  private val q08Sql =
    """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT SELECT o_custkey AS k FROM orders ORDER BY 1""".stripMargin

  private def q09(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "customer").select(col("c_custkey").as("k"))
    val b = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1993-01-01").cast("timestamp"))
      .select(col("o_custkey").as("k"))
    a.except(b).orderBy(col("k"))
  }

  private val q09Sql =
    """SELECT c_custkey AS k FROM customer
      |EXCEPT SELECT o_custkey AS k FROM orders
      |       WHERE o_orderdate < TIMESTAMP '1993-01-01' ORDER BY 1""".stripMargin

  private def q10(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders").filter(col("o_custkey") <= 200)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q10Sql =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, rn
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS rn
      |      FROM orders WHERE o_custkey <= 200)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  private def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(Fns.listaggOrdered(col("c_name"), "|", col("c_name")).as("names"),
        count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))

  private val q11Sql =
    """SELECT c_nationkey, string_agg(c_name, '|' ORDER BY c_name) AS names,
      |  COUNT(*) AS n
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  private def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O",
          col("o_totalprice").cast("decimal(18,2)")).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("open_total"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  private val q12Sql =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2))
      |           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS open_total,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  private def q13(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val m = o.agg(max(col("o_totalprice")).as("max_price"))
    o.crossJoin(broadcast(m))
      .filter(col("o_totalprice") > col("max_price") * 0.5)
      .agg(count(lit(1)).as("n_above"), max(col("max_price")).as("max_price"))
  }

  private val q13Sql =
    """SELECT COUNT(*) AS n_above,
      |  (SELECT MAX(o_totalprice) FROM orders) AS max_price
      |FROM orders
      |WHERE o_totalprice > 0.5 * (SELECT MAX(o_totalprice) FROM orders)""".stripMargin

  private def q14(s: SparkSession, dir: String): DataFrame =
    s.range(1).select(explode(Fns.dateSpineCol("day",
        lit("1995-01-01").cast("date"), lit("1995-06-30").cast("date"))).as("d"))
      .select(col("d"),
        Fns.dateTrunc("month", col("d")).cast("date").as("month_start"),
        Fns.dateTrunc("week", col("d")).cast("date").as("week_start"),
        Fns.lastDayOf(col("d"), "month").as("month_end"))
      .orderBy(col("d"))

  private val q14Sql =
    """SELECT CAST(gs AS DATE) AS d,
      |  CAST(date_trunc('month', gs) AS DATE) AS month_start,
      |  CAST(date_trunc('week', gs) AS DATE) AS week_start,
      |  last_day(CAST(gs AS DATE)) AS month_end
      |FROM generate_series(DATE '1995-01-01', DATE '1995-06-30', INTERVAL 1 DAY) t(gs)
      |WHERE gs < DATE '1995-06-30'
      |ORDER BY 1""".stripMargin

  private def q15(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events").filter(col("user_id") <= 50)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_sec",
        unix_timestamp(date_trunc("second", col("ts"))) -
        unix_timestamp(date_trunc("second", col("prev_ts"))))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(col("gap_sec")).as("max_gap_sec"),
        min(col("gap_sec")).as("min_gap_sec"))
      .orderBy(col("user_id"))
  }

  private val q15Sql =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(MAX(gap_sec) AS BIGINT) AS max_gap_sec,
      |  CAST(MIN(gap_sec) AS BIGINT) AS min_gap_sec
      |FROM (SELECT user_id,
      |        epoch(date_trunc('second', ts)) -
      |        epoch(date_trunc('second', lag(ts, 1) OVER
      |          (PARTITION BY user_id ORDER BY ts, event_id))) AS gap_sec
      |      FROM events WHERE user_id <= 50)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // =====================================================================
  // §2.3 function surface
  // =====================================================================

  private def f01(s: SparkSession, dir: String): DataFrame = {
    val ref = lit("1996-06-15").cast("timestamp")
    t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"),
        Fns.dateDiff("day", col("o_orderdate"), ref).as("dd_day"),
        Fns.dateDiff("week", col("o_orderdate"), ref).as("dd_week"),
        Fns.dateDiff("month", col("o_orderdate"), ref).as("dd_month"),
        Fns.dateDiff("quarter", col("o_orderdate"), ref).as("dd_quarter"),
        Fns.dateDiff("year", col("o_orderdate"), ref).as("dd_year"),
        Fns.dateDiff("hour", col("o_orderdate"), ref).as("dd_hour"))
      .orderBy(col("o_orderkey"))
  }

  private val f01Sql =
    """SELECT o_orderkey,
      |  date_diff('day', o_orderdate, TIMESTAMP '1996-06-15') AS dd_day,
      |  date_diff('week', o_orderdate, TIMESTAMP '1996-06-15') AS dd_week,
      |  date_diff('month', o_orderdate, TIMESTAMP '1996-06-15') AS dd_month,
      |  date_diff('quarter', o_orderdate, TIMESTAMP '1996-06-15') AS dd_quarter,
      |  date_diff('year', o_orderdate, TIMESTAMP '1996-06-15') AS dd_year,
      |  date_diff('hour', o_orderdate, TIMESTAMP '1996-06-15') AS dd_hour
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY 1""".stripMargin

  private def f02(s: SparkSession, dir: String): DataFrame = {
    val a = lit("1999-12-31 23:59:59.999999").cast("timestamp")
    val b = lit("2000-01-01 00:00:00").cast("timestamp")
    s.range(1).select(
      Fns.dateDiff("year", a, b).as("dd_year"),
      Fns.dateDiff("quarter", a, b).as("dd_quarter"),
      Fns.dateDiff("month", a, b).as("dd_month"),
      Fns.dateDiff("week", a, b).as("dd_week"),
      Fns.dateDiff("day", a, b).as("dd_day"),
      Fns.dateDiff("hour", a, b).as("dd_hour"),
      Fns.dateDiff("minute", a, b).as("dd_minute"),
      Fns.dateDiff("second", a, b).as("dd_second"),
      Fns.dateDiff("millisecond", a, b).as("dd_ms"),
      Fns.dateDiff("microsecond", a, b).as("dd_us"))
  }

  private val f02Sql =
    """SELECT
      |  date_diff('year', a, b) AS dd_year, date_diff('quarter', a, b) AS dd_quarter,
      |  date_diff('month', a, b) AS dd_month, date_diff('week', a, b) AS dd_week,
      |  date_diff('day', a, b) AS dd_day, date_diff('hour', a, b) AS dd_hour,
      |  date_diff('minute', a, b) AS dd_minute, date_diff('second', a, b) AS dd_second,
      |  date_diff('millisecond', a, b) AS dd_ms, date_diff('microsecond', a, b) AS dd_us
      |FROM (SELECT TIMESTAMP '1999-12-31 23:59:59.999999' AS a,
      |             TIMESTAMP '2000-01-01 00:00:00' AS b)""".stripMargin

  private def f03(s: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"),
        Fns.dateAddDate("day", 7, d).as("plus_7d"),
        Fns.dateAddDate("week", 2, d).as("plus_2w"),
        Fns.dateAddDate("month", 3, d).as("plus_3m"),
        Fns.dateAddDate("quarter", 1, d).as("plus_1q"),
        Fns.dateAddDate("year", -1, d).as("minus_1y"),
        Fns.dateAdd("hour", 6, d).cast("timestamp_ntz").as("plus_6h"),
        Fns.lastDayOf(d, "month").as("eom"),
        Fns.lastDayOf(d, "year").as("eoy"),
        Fns.lastDayOf(d, "week").as("eow"))
      .orderBy(col("o_orderkey"))
  }

  private val f03Sql =
    """SELECT o_orderkey,
      |  CAST(d + INTERVAL 7 DAY AS DATE) AS plus_7d,
      |  CAST(d + INTERVAL 14 DAY AS DATE) AS plus_2w,
      |  CAST(d + INTERVAL 3 MONTH AS DATE) AS plus_3m,
      |  CAST(d + INTERVAL 3 MONTH AS DATE) AS plus_1q,
      |  CAST(d - INTERVAL 12 MONTH AS DATE) AS minus_1y,
      |  CAST(d AS TIMESTAMP) + INTERVAL 6 HOUR AS plus_6h,
      |  last_day(d) AS eom,
      |  CAST(date_trunc('year', d) + INTERVAL 1 YEAR - INTERVAL 1 DAY AS DATE) AS eoy,
      |  CAST(date_trunc('week', d) + INTERVAL 7 DAY - INTERVAL 1 DAY AS DATE) AS eow
      |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
      |      WHERE o_orderkey <= 2000) ORDER BY 1""".stripMargin

  private def f04(s: SparkSession, dir: String): DataFrame = {
    val n = col("c_name")
    t(s, dir, "customer").filter(col("c_custkey") <= 500)
      .select(col("c_custkey"),
        Fns.splitPart(n, "#", 1).as("sp1"),
        Fns.splitPart(n, "#", 2).as("sp2"),
        Fns.splitPart(n, "#", -1).as("sp_last"),
        Fns.positionOf("#", n).as("pos_hash"),
        Fns.rightN(n, lit(3)).as("r3"),
        Fns.rightN(n, lit(0)).as("r0"),
        Fns.rightN(n, length(n)).as("r_full"),
        length(n).cast("bigint").as("len"),
        regexp_replace(n, "Customer", "C").as("rep"),
        concat(n, lit("-"), col("c_mktsegment")).as("cat"),
        lower(n).as("lo"), upper(n).as("up"))
      .orderBy(col("c_custkey"))
  }

  private val f04Sql =
    """SELECT c_custkey,
      |  split_part(c_name, '#', 1) AS sp1,
      |  split_part(c_name, '#', 2) AS sp2,
      |  split_part(c_name, '#', -1) AS sp_last,
      |  CAST(position('#' IN c_name) AS INT) AS pos_hash,
      |  right(c_name, 3) AS r3, right(c_name, 0) AS r0,
      |  right(c_name, CAST(length(c_name) AS INT)) AS r_full,
      |  length(c_name) AS len,
      |  replace(c_name, 'Customer', 'C') AS rep,
      |  c_name || '-' || c_mktsegment AS cat,
      |  lower(c_name) AS lo, upper(c_name) AS up
      |FROM customer WHERE c_custkey <= 500 ORDER BY 1""".stripMargin

  private def f05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") <= 3000)
      .select(col("o_orderkey"),
        Fns.hashNull(nullif(col("o_orderpriority"), lit("1-URGENT"))).as("h_nullable"),
        Fns.hashNull(col("o_orderstatus")).as("h_status"),
        Fns.scdId(col("o_orderkey"), col("o_orderstatus")).as("scd_id"))
      .orderBy(col("o_orderkey"))

  private val f05Sql =
    """SELECT o_orderkey,
      |  CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NULL THEN md5('')
      |       ELSE md5(nullif(o_orderpriority, '1-URGENT')) END AS h_nullable,
      |  md5(o_orderstatus) AS h_status,
      |  md5(concat_ws('|', coalesce(CAST(o_orderkey AS VARCHAR), ''),
      |                     coalesce(o_orderstatus, ''))) AS scd_id
      |FROM orders WHERE o_orderkey <= 3000 ORDER BY 1""".stripMargin

  private def f06(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("p_type"), " ")
    t(s, dir, "part").filter(col("p_partkey") <= 500)
      .select(col("p_partkey"),
        array_join(toks, ",").as("type_csv"),
        size(toks).cast("bigint").as("n_toks"),
        array_join(Fns.arrayAppend(toks, col("p_brand")), ",").as("appended"),
        array_join(Fns.arrayConcat(toks, split(col("p_name"), " ")), ",").as("concatenated"),
        size(Fns.arrayConstruct("int")).cast("bigint").as("empty_arr_size"),
        element_at(toks, 1).as("first_tok"),
        array_join(array_sort(toks), ",").as("sorted_csv"))
      .orderBy(col("p_partkey"))
  }

  private val f06Sql =
    """SELECT p_partkey,
      |  array_to_string(string_split(p_type, ' '), ',') AS type_csv,
      |  len(string_split(p_type, ' ')) AS n_toks,
      |  array_to_string(list_append(string_split(p_type, ' '), p_brand), ',') AS appended,
      |  array_to_string(list_concat(string_split(p_type, ' '),
      |                              string_split(p_name, ' ')), ',') AS concatenated,
      |  CAST(0 AS BIGINT) AS empty_arr_size,
      |  string_split(p_type, ' ')[1] AS first_tok,
      |  array_to_string(list_sort(string_split(p_type, ' ')), ',') AS sorted_csv
      |FROM part WHERE p_partkey <= 500 ORDER BY 1""".stripMargin

  private def f07(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_custkey") <= 500)
      .select(col("c_custkey"),
        Fns.castBoolToText(col("c_acctbal") > 0).as("is_positive"),
        Fns.safeCast(col("c_mktsegment"), "int").as("bad_int"),
        Fns.safeCast(col("c_custkey").cast("string"), "int").as("good_int"),
        Fns.makeDateCol(lit(2024), lit(2), lit(1)).as("made_date"))
      .orderBy(col("c_custkey"))

  private val f07Sql =
    """SELECT c_custkey,
      |  lower(CAST(c_acctbal > 0 AS VARCHAR)) AS is_positive,
      |  try_cast(c_mktsegment AS INT) AS bad_int,
      |  try_cast(CAST(c_custkey AS VARCHAR) AS INT) AS good_int,
      |  make_date(2024, 2, 1) AS made_date
      |FROM customer WHERE c_custkey <= 500 ORDER BY 1""".stripMargin

  /** Window-function depth: rank family, ntile, lead/lag, running and
    * framed aggregates over a deterministic total order. */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders").filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(running)
          .cast("double").as("running_total"),
        count(lit(1)).over(running).as("running_n"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  private val q18Sql =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
      |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  lag(o_orderkey, 1) OVER w AS prev_key,
      |  lead(o_orderkey, 1) OVER w AS next_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  COUNT(*) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
      |FROM orders WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rnk""".stripMargin

  /** Distinct-count sketches: per-group HLL sketch agg + estimate, plus a
    * union across groups (mergeable-sketch property — the thing that makes
    * approximate distinct counts cheap at 100 TB: partial sketches combine
    * without a global shuffle of raw values). Estimates are engine-specific
    * ⇒ rows-only check; the exact count rides along as a sanity anchor. */
  /** HLL sketches, SELF-VERIFYING: per event_type (and for the MERGED
    * all-types sketch — exercising hll_union_agg mergeability) the query
    * emits the exact distinct count and |approx−exact|/exact ≤ 5% as a
    * boolean; DuckDB reproduces both relationally, so the sketch's error
    * bound is hash-checked (HLL lgConfigK=12 ⇒ ~1.6% standard error). */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val perType = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact_users"))
    val allExact = e.agg(countDistinct(col("user_id")).as("exact_users"))
    def gated(eventType: Column, approx: Column, exact: Column) = Seq(
      eventType.as("event_type"), exact.as("exact_users"),
      (abs(approx - exact).cast("double") / exact <= 0.05).as("err_ok"))
    perType.select(gated(col("event_type"),
        hll_sketch_estimate(col("sk")), col("exact_users")): _*)
      .unionByName(
        perType.agg(hll_union_agg(col("sk")).as("sk"))
          .crossJoin(allExact)
          .select(gated(lit("__all__"),
            hll_sketch_estimate(col("sk")), col("exact_users")): _*))
      .orderBy(col("event_type"))
  }

  private val q17Sql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      |       TRUE AS err_ok
      |FROM events GROUP BY 1
      |UNION ALL
      |SELECT '__all__', COUNT(DISTINCT user_id), TRUE FROM events
      |ORDER BY 1""".stripMargin

  /** Multi-column tuple-IN semi-join — the reference's composite unique_key
    * form `(k1,k2) IN (SELECT …)` (merge.sql:72-83). */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val hot = e.filter(col("value") > 190)
      .select(col("user_id"), col("event_type")).distinct()
    e.join(hot, Seq("user_id", "event_type"), "left_semi")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  private val q16Sql =
    """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      |FROM events e
      |WHERE EXISTS (SELECT 1 FROM events h WHERE h.value > 190
      |              AND h.user_id = e.user_id AND h.event_type = e.event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private def f08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        // any_value over a group-constant expression ⇒ deterministic
        Fns.anyValue(substring(col("o_orderpriority"), 1, 1)).as("prio_digit"),
        Fns.boolOr(col("o_orderstatus") === "F").as("has_f"),
        Fns.boolOr(col("o_orderstatus") === "X").as("has_x"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  private val f08Sql =
    """SELECT o_orderpriority,
      |  any_value(substring(o_orderpriority, 1, 1)) AS prio_digit,
      |  bool_or(o_orderstatus = 'F') AS has_f,
      |  bool_or(o_orderstatus = 'X') AS has_x,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // =====================================================================
  // exported maps (filled further in Part 2: materializations + LLM ops)
  // =====================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pricing" -> (q01 _),
    "q02_join_revenue" -> (q02 _),
    "q03_filter_project" -> (q03 _),
    "q04_semi_join" -> (q04 _),
    "q05_anti_join" -> (q05 _),
    "q06_distinct" -> (q06 _),
    "q07_union_all" -> (q07 _),
    "q08_intersect" -> (q08 _),
    "q09_except" -> (q09 _),
    "q10_window_topk" -> (q10 _),
    "q11_listagg" -> (q11 _),
    "q12_case_agg" -> (q12 _),
    "q13_scalar_subquery" -> (q13 _),
    "q14_date_spine" -> (q14 _),
    "q15_events_window" -> (q15 _),
    "q16_tuple_in_semi" -> (q16 _),
    "q17_hll_sketches" -> (q17 _),
    "q18_window_depth" -> (q18 _),
    "f01_datediff_parts" -> (f01 _),
    "f02_datediff_boundary" -> (f02 _),
    "f03_dateadd_lastday" -> (f03 _),
    "f04_strings" -> (f04 _),
    "f05_hash" -> (f05 _),
    "f06_arrays" -> (f06 _),
    "f07_casts" -> (f07 _),
    "f08_agg_fns" -> (f08 _)
  ) ++ MatQueries.queries ++ LlmQueries.queries ++ DepthQueries.queries

  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" -> q01Sql,
    "q02_join_revenue" -> q02Sql,
    "q03_filter_project" -> q03Sql,
    "q04_semi_join" -> q04Sql,
    "q05_anti_join" -> q05Sql,
    "q06_distinct" -> q06Sql,
    "q07_union_all" -> q07Sql,
    "q08_intersect" -> q08Sql,
    "q09_except" -> q09Sql,
    "q10_window_topk" -> q10Sql,
    "q11_listagg" -> q11Sql,
    "q12_case_agg" -> q12Sql,
    "q13_scalar_subquery" -> q13Sql,
    "q14_date_spine" -> q14Sql,
    "q15_events_window" -> q15Sql,
    "q16_tuple_in_semi" -> q16Sql,
    "q17_hll_sketches" -> q17Sql,
    "q18_window_depth" -> q18Sql,
    "f01_datediff_parts" -> f01Sql,
    "f02_datediff_boundary" -> f02Sql,
    "f03_dateadd_lastday" -> f03Sql,
    "f04_strings" -> f04Sql,
    "f05_hash" -> f05Sql,
    "f06_arrays" -> f06Sql,
    "f07_casts" -> f07Sql,
    "f08_agg_fns" -> f08Sql
  ) ++ MatQueries.oracleSql ++ LlmQueries.oracleSql ++ DepthQueries.oracleSql
}
