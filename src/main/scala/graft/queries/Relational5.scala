package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Fifth relational batch: subquery shapes — HAVING, uncorrelated scalar
  * subquery, IN-subquery, and the TPC-H Q18 "join back to a filtered
  * aggregate" pattern. */
object Relational5 {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // ---------------------------------------------------------------- q52
  /** GROUP BY ... HAVING: customers with 12+ orders. */
  def q52(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .filter(col("n_orders") >= 12)
      .orderBy(col("o_custkey"))
  val q52Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Uncorrelated scalar subquery: orders priced above 1.5x the global
    * average (exact decimal average on both sides). The scalar aggregate is
    * broadcast-cross-joined — fully lazy, no driver round-trip. */
  def q53(s: SparkSession, d: String): DataFrame = {
    val ord = t(s, d, "orders")
    val avg = ord
      .agg((sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double") / count(lit(1)))
        .as("avg_price"))
    ord.crossJoin(broadcast(avg))
      .filter(col("o_totalprice") > col("avg_price") * 1.5)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }
  val q53Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 1.5 * (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |  FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q54
  /** IN-subquery: lineitems whose part is large (p_size >= 45) — semi join
    * under the hood, aggregated to keep the output compact. */
  def q54(s: SparkSession, d: String): DataFrame = {
    val bigParts = t(s, d, "part").filter(col("p_size") >= 45).select(col("p_partkey"))
    t(s, d, "lineitem")
      .join(bigParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }
  val q54Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 45)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q55
  /** TPC-H Q18 shape: find large orders (sum qty > threshold) then join back
    * for customer context — aggregate-filter-joinback, two shuffles. */
  def q55(s: SparkSession, d: String): DataFrame = {
    val bigOrders = t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 100.0)
    t(s, d, "orders")
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
              unix_micros(col("o_orderdate").cast("timestamp")).as("orderdate_us"),
              col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_orderkey"))
  }
  val q55Sql: String =
    """SELECT c_name, o_orderkey, epoch_us(o_orderdate) AS orderdate_us,
      |  o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 100.0) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q52_having"          -> ((q52 _, Some(q52Sql))),
    "q53_scalar_subquery" -> ((q53 _, Some(q53Sql))),
    "q54_in_subquery"     -> ((q54 _, Some(q54Sql))),
    "q55_tpch_q18_joinback" -> ((q55 _, Some(q55Sql))))
}
