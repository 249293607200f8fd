package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Core relational operator surface, oracle-checked against DuckDB.
  *
  * Cross-engine parity rules used throughout (see also `scripts/selfcheck.py`):
  *   - SUM over DOUBLE goes through an exact DECIMAL cast and back to DOUBLE,
  *     so shuffle/aggregation order can never flip low bits. Per-row products
  *     are computed in DOUBLE (bit-deterministic given identical operands) and
  *     only then cast to DECIMAL for the exact sum.
  *   - Timestamps are never emitted raw: they become epoch-µs BIGINT columns
  *     (`unix_micros` ↔ DuckDB `epoch_us`), sidestepping INT96/ns-unit issues.
  *   - Every query ends in a total deterministic ORDER BY mirrored in the SQL.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Exact sum of a DOUBLE expression: cast to DECIMAL(18,scale), sum, back. */
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-shaped aggregation (SURVEY §2.4): group-by with exact sums,
    * computed measures, avg via sum/count. Map-side partial aggregation +
    * one shuffle on the (tiny-cardinality) group keys — scales linearly. */
  def q01(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge    = col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(discPrice, 6).as("sum_disc_price"),
        dsum(charge, 6).as("sum_charge"),
        (sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Filter + projection with a computed column (SURVEY §2.2). Predicates and
    * the 6-column projection push into the parquet scan. */
  def q02(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_quantity") > lit(45.0))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
              unix_micros(col("l_shipdate").cast("timestamp")).as("shipdate_us"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  l_extendedprice * (1.0 - l_discount) AS revenue,
      |  epoch_us(l_shipdate) AS shipdate_us
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_quantity > 45.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Star-schema dimension join (SURVEY §2.3): customer ⋈ nation ⋈ region with
    * explicit broadcast of both dims — no shuffle of the fact side. */
  def q03(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  val q03Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Fact ⋈ dim ⋈ dim rollup to nation revenue; deterministic order on the
    * exact-decimal revenue. Dims broadcast; single shuffle for the group-by. */
  def q04(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("n_name"))
  val q04Sql: String =
    """SELECT n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q05
  /** TPC-H Q3-shaped 3-way join + aggregate + top-k (SURVEY §2.3, §2.6). */
  def q05(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1996-06-01").cast("timestamp")
    val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord  = t(s, d, "orders").filter(col("o_orderdate") < cutoff)
    val li   = t(s, d, "lineitem").filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .select(col("l_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("orderdate_us"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }
  val q05Sql: String =
    """SELECT l_orderkey, epoch_us(o_orderdate) AS orderdate_us,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-06-01' AND l_shipdate > TIMESTAMP '1996-06-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Windowed top-k per group (SURVEY §2.5): row_number over a deterministic
    * (totalprice DESC, orderkey) order, keep top 3 orders per customer. */
  def q06(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn").cast("long").as("rn"),
              col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }
  val q06Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q07
  /** lag/lead analytics on the event stream (SURVEY §2.5): per-user ordered
    * deltas. Single shuffle on user_id; per-row DOUBLE subtraction is
    * bit-deterministic. */
  def q07(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("ts_us"),
              (col("value") - col("prev_value")).as("delta"))
      .orderBy(col("event_id"))
  }
  val q07Sql: String =
    """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |  value - lag(value) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS delta
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q08
  /** The reference's adjacent-overlap flag (O21, pa.py:311-330) transplanted
    * onto the events table: within a user's ts-ordered stream, flag BOTH rows
    * of an adjacent pair whose boundary token matches — lag and lead, exactly
    * as SURVEY §2.5 prescribes. */
  def q08(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .withColumn("overlap_flag",
        coalesce(lag(col("event_type"), 1).over(w) === col("event_type"), lit(false)) ||
        coalesce(lead(col("event_type"), 1).over(w) === col("event_type"), lit(false)))
      .select(col("event_id"), col("user_id"), col("event_type"), col("overlap_flag"))
      .orderBy(col("event_id"))
  }
  val q08Sql: String =
    """SELECT event_id, user_id, event_type,
      |  COALESCE(lag(event_type) OVER w = event_type, FALSE)
      |    OR COALESCE(lead(event_type) OVER w = event_type, FALSE) AS overlap_flag
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q09
  /** First-writer-wins dedup (O24, INSERT OR IGNORE semantics, pa.py:378):
    * keep the earliest order per customer under a total deterministic order. */
  def q09(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
              unix_micros(col("o_orderdate").cast("timestamp")).as("first_order_us"))
      .orderBy(col("o_custkey"))
  }
  val q09Sql: String =
    """SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS first_order_us FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Left-anti join = the NOT-EXISTS side of INSERT OR IGNORE (SURVEY §2.3,
    * §2.9): customers with no large order (threshold keeps the anti-set
    * non-empty in the test data — all customers have *some* order). */
  def q10(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 400000.0),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  val q10Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Left-semi join (EXISTS): customers with at least one finished order. */
  def q11(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  val q11Sql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Global top-k (SURVEY §2.6): Spark's sort+limit runs as a per-partition
    * TakeOrdered then a driver-side merge of k×partitions rows — no full sort. */
  def q12(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  val q12Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Set operations (SURVEY §2.6): UNION / INTERSECT / EXCEPT over two
    * customer-key sets, reduced to tagged counts. */
  def q13(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "customer").filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    val b = t(s, d, "customer").filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
    val u = a.union(b).distinct().agg(count(lit(1)).as("cnt")).withColumn("op", lit("union"))
    val i = a.intersect(b).agg(count(lit(1)).as("cnt")).withColumn("op", lit("intersect"))
    val e = a.except(b).agg(count(lit(1)).as("cnt")).withColumn("op", lit("except"))
    u.union(i).union(e).select(col("op"), col("cnt")).orderBy(col("op"))
  }
  val q13Sql: String =
    """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
      |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
      |SELECT 'union' AS op, COUNT(*) AS cnt FROM (SELECT * FROM a UNION SELECT * FROM b)
      |UNION ALL
      |SELECT 'intersect', COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      |UNION ALL
      |SELECT 'except', COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      |ORDER BY op""".stripMargin

  // ---------------------------------------------------------------- q14
  /** ROLLUP super-aggregates (SURVEY §2.4) with grouping_id; NULLS FIRST
    * ordering made explicit for DuckDB parity (its default is NULLS LAST). */
  def q14(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("gid"), asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
  val q14Sql: String =
    """SELECT n_name, c_mktsegment, GROUPING(n_name, c_mktsegment) AS gid, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, c_mktsegment)
      |ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q15
  /** As-of join (SURVEY §2.3): for each order, the latest event of the same
    * user at-or-before the order date, plus the count of prior events.
    *
    * Scale-first implementation: instead of an inequality join (quadratic
    * blow-up risk), tag and UNION the two streams, then a single running
    * window per user computes the as-of state — one shuffle, linear work,
    * the standard distributed as-of pattern. The DuckDB oracle states the
    * same semantics declaratively with an inequality LEFT JOIN. */
  def q15(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts_us"), lit(0).as("tag"), col("event_id").as("row_id"))
    val ord = t(s, d, "orders")
      .select(col("o_custkey").as("user_id"), unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
              lit(1).as("tag"), col("o_orderkey").as("row_id"))
    // events sort before orders at equal ts (tag 0 < 1) => "<=" as-of semantics
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("tag"), col("row_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.union(ord)
      .withColumn("last_event_us", max(when(col("tag") === 0, col("ts_us"))).over(w))
      .withColumn("n_prior", count(when(col("tag") === 0, lit(1))).over(w))
      .filter(col("tag") === 1)
      .select(col("row_id").as("o_orderkey"), col("user_id"), col("last_event_us"), col("n_prior"))
      .orderBy(col("o_orderkey"))
  }
  val q15Sql: String =
    """SELECT o.o_orderkey, o.o_custkey AS user_id,
      |  max(epoch_us(CAST(e.ts AS TIMESTAMP))) AS last_event_us,
      |  count(e.event_id) AS n_prior
      |FROM orders o LEFT JOIN events e
      |  ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) <= o.o_orderdate
      |GROUP BY o.o_orderkey, o.o_custkey ORDER BY o.o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Exact distinct counting (SURVEY §2.4). (approx_count_distinct exists in
    * the engine surface but is not oracle-comparable across engines.) */
  def q16(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  val q16Sql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Conditional aggregation: CASE-WHEN measures, min/max timestamps as
    * epoch-µs, avg via exact sum / count. */
  def q17(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"),
        sum(when(substring(col("o_orderpriority"), 1, 1) === "1", 1L).otherwise(0L)).as("n_urgent"),
        (sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double") / count(lit(1))).as("avg_price"),
        unix_micros(min(col("o_orderdate")).cast("timestamp")).as("min_date_us"),
        unix_micros(max(col("o_orderdate")).cast("timestamp")).as("max_date_us"))
      .orderBy(col("o_orderstatus"))
  val q17Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  CAST(SUM(CASE WHEN substr(o_orderpriority,1,1) = '1' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  epoch_us(MIN(o_orderdate)) AS min_date_us,
      |  epoch_us(MAX(o_orderdate)) AS max_date_us
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Gap-based sessionization (gaps-and-islands; the SQL-expressible sibling
    * of the reference's span-based merge O8 — see Sessionize.spanMerge for the
    * faithful span-based one). Gap = 30 min. */
  def q18(s: SparkSession, d: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val wOrder = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(wOrder) > gapUs, 1L).otherwise(0L))
      .withColumn("sess_idx",
        sum(col("new_sess")).over(wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_idx"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts_us")).as("start_us"),
           max(col("ts_us")).as("end_us"),
           dsum(col("value"), 6).as("sum_value"))
      .orderBy(col("user_id"), col("sess_idx"))
  }
  val q18Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sessions AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
      |  FROM flagged)
      |SELECT user_id, sess_idx, COUNT(*) AS n_events, MIN(ts_us) AS start_us,
      |  MAX(ts_us) AS end_us,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM sessions GROUP BY user_id, sess_idx ORDER BY user_id, sess_idx""".stripMargin

  /** name -> (query, oracle) registry for this module. */
  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q01_agg_tpch_q1"        -> ((q01 _, Some(q01Sql))),
    "q02_filter_project"     -> ((q02 _, Some(q02Sql))),
    "q03_join_dims_broadcast"-> ((q03 _, Some(q03Sql))),
    "q04_join_fact_agg"      -> ((q04 _, Some(q04Sql))),
    "q05_tpch_q3_topk"       -> ((q05 _, Some(q05Sql))),
    "q06_window_topk_group"  -> ((q06 _, Some(q06Sql))),
    "q07_window_lag_delta"   -> ((q07 _, Some(q07Sql))),
    "q08_overlap_flag"       -> ((q08 _, Some(q08Sql))),
    "q09_dedup_first_writer" -> ((q09 _, Some(q09Sql))),
    "q10_anti_join"          -> ((q10 _, Some(q10Sql))),
    "q11_semi_join"          -> ((q11 _, Some(q11Sql))),
    "q12_sort_limit_topk"    -> ((q12 _, Some(q12Sql))),
    "q13_set_ops"            -> ((q13 _, Some(q13Sql))),
    "q14_rollup"             -> ((q14 _, Some(q14Sql))),
    "q15_asof_join"          -> ((q15 _, Some(q15Sql))),
    "q16_distinct_count"     -> ((q16 _, Some(q16Sql))),
    "q17_conditional_agg"    -> ((q17 _, Some(q17Sql))),
    "q18_sessionize_gap"     -> ((q18 _, Some(q18Sql))))
}
