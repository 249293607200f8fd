package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Second relational batch: super-aggregates (CUBE / GROUPING SETS), outer
  * joins, a bucketed range join (the scalable inequality-join pattern),
  * window frames, and ranking/distribution functions. Same parity rules as
  * `Relational` (decimal-exact sums, epoch-µs timestamps, total ORDER BY). */
object Relational2 {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // ---------------------------------------------------------------- q34
  /** CUBE over two order dimensions with grouping_id. */
  def q34(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("gid"), asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  val q34Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q35
  /** FULL OUTER join of two derived per-customer views (order counts vs
    * high-balance flags) with COALESCE-normalized output. */
  def q35(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_f_orders"))
    val b = t(s, d, "customer").filter(col("c_acctbal") > 7000.0)
      .select(col("c_custkey"), col("c_acctbal"))
    a.join(b, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        coalesce(col("n_f_orders"), lit(0L)).as("n_f_orders"),
        coalesce(col("c_acctbal"), lit(-1.0)).as("acctbal"))
      .orderBy(col("custkey"))
  }
  val q35Sql: String =
    """WITH a AS (SELECT o_custkey, COUNT(*) AS n_f_orders FROM orders
      |           WHERE o_orderstatus = 'F' GROUP BY o_custkey),
      |     b AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 7000.0)
      |SELECT COALESCE(o_custkey, c_custkey) AS custkey,
      |  COALESCE(n_f_orders, 0) AS n_f_orders,
      |  COALESCE(c_acctbal, -1.0) AS acctbal
      |FROM a FULL OUTER JOIN b ON o_custkey = c_custkey
      |ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Range join, bucketed (SURVEY §2.3 "range join for events"): count each
    * user's events within ±1 day of each of their orders.
    *
    * Scale-first shape: instead of the quadratic inequality join the oracle
    * states, explode each order into its 3 candidate day buckets and
    * equi-join on (user, day) — shuffle volume is O(3·orders + events), the
    * classic banded range-join. At 1000 executors the bucket key spreads
    * uniformly; no replicated fact side. */
  def q36(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts_us"), (col("ts_us") / dayUs).cast("long").as("day"))
    val ord = t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
              unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
      .withColumn("day0", (col("od_us") / dayUs).cast("long"))
      .withColumn("day", explode(array(col("day0") - 1, col("day0"), col("day0") + 1)))
    ord.join(ev, ord("o_custkey") === ev("user_id") && ord("day") === ev("day"), "left")
      .filter(col("ts_us").isNull || abs(col("ts_us") - col("od_us")) <= dayUs)
      .groupBy(col("o_orderkey"))
      .agg(count(col("ts_us")).as("n_nearby"))
      .orderBy(col("o_orderkey"))
  }
  val q36Sql: String =
    """SELECT o.o_orderkey, count(e.event_id) AS n_nearby
      |FROM orders o LEFT JOIN events e
      |  ON e.user_id = o.o_custkey
      | AND abs(epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(o.o_orderdate)) <= 86400000000
      |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Window frames: running exact sum and a 3-row moving average per user. */
  def q37(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val moving = w.rowsBetween(-2, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        sum(col("value").cast(DecimalType(18, 6))).over(running).cast("double").as("running_sum"),
        (sum(col("value").cast(DecimalType(18, 6))).over(moving).cast("double") /
          count(lit(1)).over(moving)).as("moving_avg3"))
      .orderBy(col("event_id"))
  }
  val q37Sql: String =
    """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_run AS DOUBLE) AS running_sum,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_mov AS DOUBLE)
      |    / COUNT(*) OVER w_mov AS moving_avg3
      |FROM events
      |WINDOW
      |  w_run AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  w_mov AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
      |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q38
  /** first/last/nth value over explicit full-partition frames. */
  def q38(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(full).as("first_order"),
        last(col("o_orderkey")).over(full).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_order"))
      .orderBy(col("o_orderkey"))
  }
  val q38Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  first_value(o_orderkey) OVER w AS first_order,
      |  last_value(o_orderkey) OVER w AS last_order,
      |  nth_value(o_orderkey, 2) OVER w AS second_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Ranking & distribution functions under a total per-partition order. */
  def q39(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
      .orderBy(col("o_orderkey"))
  }
  val q39Sql: String =
    """SELECT o_orderkey, o_orderstatus,
      |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS prank, cume_dist() OVER w AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q40
  /** GROUPING SETS via the Spark SQL surface (temp view + spark.sql). */
  def q40(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |  COUNT(*) AS n
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        |""".stripMargin)
  }
  val q40Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q34_cube"            -> ((q34 _, Some(q34Sql))),
    "q35_full_outer_join" -> ((q35 _, Some(q35Sql))),
    "q36_range_join_bucketed" -> ((q36 _, Some(q36Sql))),
    "q37_window_frames"   -> ((q37 _, Some(q37Sql))),
    "q38_first_last_nth"  -> ((q38 _, Some(q38Sql))),
    "q39_ranking_funcs"   -> ((q39 _, Some(q39Sql))),
    "q40_grouping_sets"   -> ((q40 _, Some(q40Sql))))
}
