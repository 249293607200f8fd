package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Third relational batch: exact percentiles/medians, the scalar string
  * function surface, and calendar/date-part functions (SURVEY §2.10) — each
  * mapped to its DuckDB twin with engine-difference adjustments noted
  * inline. */
object Relational3 {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  // ---------------------------------------------------------------- q41
  /** Exact interpolated percentiles per group (Spark `percentile` ↔ DuckDB
    * `quantile_cont` — same linear-interpolation definition). */
  def q41(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.95)").as("p95"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderstatus"))
  val q41Sql: String =
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.5) AS median_price,
      |  quantile_cont(o_totalprice, 0.25) AS p25,
      |  quantile_cont(o_totalprice, 0.95) AS p95,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q42
  /** Scalar string-function surface over part names: substr, split_part,
    * regexp_extract, pad, translate, position, repeat/reverse, case ops. */
  def q42(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        element_at(split(col("p_type"), " ", -1), 1).as("type_first"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("name_last_word"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        translate(col("p_brand"), "#", "B").as("brand_tr"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        reverse(col("p_brand")).as("brand_rev"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))
  val q42Sql: String =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_u,
      |  lower(p_type) AS type_l,
      |  substr(p_name, 1, 8) AS name_prefix,
      |  split_part(p_type, ' ', 1) AS type_first,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS name_last_word,
      |  lpad(p_brand, 12, '*') AS brand_pad,
      |  translate(p_brand, '#', 'B') AS brand_tr,
      |  strpos(p_name, 'a') AS first_a,
      |  reverse(p_brand) AS brand_rev,
      |  length(p_name) AS name_len,
      |  concat_ws('/', p_brand, p_type) AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q43
  /** Calendar/date-part surface (engine deltas handled: Spark dayofweek is
    * 1=Sunday..7, DuckDB is 0=Sunday..6 → subtract 1 on the Spark side). */
  def q43(s: SparkSession, d: String): DataFrame = {
    val od = col("o_orderdate").cast("timestamp")
    t(s, d, "orders")
      .select(col("o_orderkey"),
        year(od).cast("long").as("y"), month(od).cast("long").as("m"),
        dayofmonth(od).cast("long").as("dom"),
        (dayofweek(od) - 1).cast("long").as("dow"),
        dayofyear(od).cast("long").as("doy"),
        weekofyear(od).cast("long").as("woy"),
        quarter(od).cast("long").as("q"),
        date_format(od, "yyyy-MM").as("ym"),
        unix_micros(date_trunc("month", od)).as("month_start_us"),
        datediff(lit("1998-01-01").cast("date"), od.cast("date")).cast("long").as("days_to_98"))
      .orderBy(col("o_orderkey"))
  }
  val q43Sql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y, month(o_orderdate) AS m, dayofmonth(o_orderdate) AS dom,
      |  dayofweek(o_orderdate) AS dow,
      |  dayofyear(o_orderdate) AS doy,
      |  weekofyear(o_orderdate) AS woy,
      |  quarter(o_orderdate) AS q,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
      |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q41_percentiles"    -> ((q41 _, Some(q41Sql))),
    "q42_string_funcs"   -> ((q42 _, Some(q42Sql))),
    "q43_datetime_funcs" -> ((q43 _, Some(q43Sql))))
}
