package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Ninth relational batch — the five classic TPC-H shapes not yet on the
  * board: Q9 (q260), Q20 (q261), Q2 (q262), Q11 (q263), Q16 (q264),
  * closing the suite at 22/22 shapes. The testdata star schema has no
  * `partsupp` table, so wherever the classic query reads partsupp the
  * adaptation derives the supplies relation from lineitem itself
  * (distinct (l_partkey, l_suppkey) grain) or substitutes a
  * deterministic cost/availability expression over columns both engines
  * see — the JOIN TREE and decorrelation shape of each classic are
  * preserved exactly, which is what these entries exercise.
  *
  * The reference (/root/reference/process_audio.py) has no relational
  * surface; these belong to the driver-mandated warehouse extension.
  * Float discipline per Relational.scala's header: doubles never enter a
  * SUM un-cast, and threshold comparisons between aggregates stay in
  * exact DECIMAL on both engine sides.
  */
object Relational9 {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Exact cross-engine double sum (see Relational.scala's header). */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // ---------------------------------------------------------------- q260
  /** TPC-H Q9 (product-type profit): profit by supplier nation and order
    * year over the biggest join tree in the suite — lineitem joined to
    * part, supplier, nation, AND orders (two fact-sized inputs). The
    * classic reads ps_supplycost from partsupp; this schema has none, so
    * unit cost is the deterministic 0.6 × p_retailprice (both engines
    * compute it from the same column; the profit expression is one IEEE
    * multiply/subtract chain per row, identical on both sides, then the
    * decimal-exact sum).
    *
    * At 100 TB: the part filter prunes the part side BEFORE its join
    * (name predicate pushes to the scan); supplier and nation broadcast;
    * the only big exchanges are lineitem⋈part (part is ~1/30 of
    * lineitem — shuffle at full scale, AQE may still broadcast the
    * filtered side) and the fact-fact lineitem⋈orders on orderkey.
    * Aggregation grain (nation × year) is tiny, so partial aggregation
    * collapses map-side. */
  def q260(s: SparkSession, d: String): DataFrame = {
    val prof = t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(t(s, d, "part").filter(col("p_name").contains("bolt"))
          .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "nation").select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")).as("amount"))
    prof.groupBy(col("nation"), col("o_year"))
      .agg(dsum(col("amount"), 6).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }
  val q260Sql: String =
    """SELECT n_name AS nation,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |                - 0.6 * p_retailprice * l_quantity
      |            AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%bolt%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------- q261
  /** TPC-H Q20 (potential part promotion): suppliers of 'red' parts who
    * shipped a DOMINANT share of a part's 1996 volume — the nested
    * semi-join chain. The classic compares ps_availqty against half the
    * year's shipped quantity; without partsupp, a (part, supplier) pair
    * qualifies when its 1996 shipped quantity exceeds 0.3 × the part's
    * TOTAL 1996 shipped quantity, which keeps both correlated aggregates
    * (per-pair sum, per-part sum) and the two-level semi-join chain
    * (pairs → qualifying parts → suppliers) intact.
    *
    * Exactness: quantities are doubles, and double sums are
    * order-dependent across engines — so both aggregates sum in
    * DECIMAL(18,4) and the 0.3× threshold compares as 10·qty_ps > 3·qty_p
    * in exact decimal; no float exists anywhere in the predicate.
    *
    * At 100 TB: the year filter pushes to the lineitem scan; the pair
    * grain aggregation is ONE shuffle and the per-part total
    * re-aggregates the pair grain (never a second corpus pass); the part
    * name filter broadcasts as a semi join; the final supplier semi join
    * is supplier-cardinality-sized. */
  def q261(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val pairQty = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).as("qty_ps"))
    val partQty = pairQty.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("qty_ps")).as("qty_p"))
    val redParts = t(s, d, "part")
      .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
    val qualifying = pairQty
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(partQty, col("l_partkey") === col("pk"))
      .filter(col("qty_ps") * lit(10) > col("qty_p") * lit(3))
      .select(col("l_suppkey"))
    t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_3")
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_name"))
  }
  val q261Sql: String =
    """WITH pair_qty AS (
      |  SELECT l_partkey, l_suppkey,
      |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_ps
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1, 2),
      |part_qty AS (
      |  SELECT l_partkey AS pk, SUM(qty_ps) AS qty_p FROM pair_qty GROUP BY 1),
      |qualifying AS (
      |  SELECT l_suppkey
      |  FROM pair_qty JOIN part_qty ON l_partkey = pk
      |  WHERE qty_ps * 10 > qty_p * 3
      |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'))
      |SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
      |  AND s_suppkey IN (SELECT l_suppkey FROM qualifying)
      |ORDER BY s_name""".stripMargin

  // ---------------------------------------------------------------- q262
  /** TPC-H Q2 (minimum-cost supplier): for every SMALL-type part of size
    * 15, the EUROPE supplier offering it at minimum cost — the correlated
    * scalar-min subquery, decorrelated into a per-part min joined back.
    * The classic's ps_supplycost becomes the pair's minimum observed
    * l_extendedprice (min of doubles is order-independent — exact on both
    * engines with no decimal detour).
    *
    * At 100 TB: the pair-grain min is the only corpus-scale shuffle; the
    * part filter and the region-qualified supplier set both broadcast;
    * the per-part min re-aggregates the (already pair-grain) offers and
    * broadcasts back. Top-100 is a bounded TakeOrdered, never a global
    * sort. */
  def q262(s: SparkSession, d: String): DataFrame = {
    val eurSupp = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation")
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val parts = t(s, d, "part")
      .filter(col("p_type") === "SMALL" && col("p_size") === 15)
      .select(col("p_partkey"), col("p_brand"))
    val offers = t(s, d, "lineitem")
      .join(broadcast(parts.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(eurSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("cost"))
    val minCost = offers.groupBy(col("l_partkey").as("mp"))
      .agg(min(col("cost")).as("min_cost"))
    offers
      .join(broadcast(minCost),
        col("l_partkey") === col("mp") && col("cost") === col("min_cost"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_brand"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }
  val q262Sql: String =
    """WITH eur_supp AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |parts AS (
      |  SELECT p_partkey, p_brand FROM part
      |  WHERE p_type = 'SMALL' AND p_size = 15),
      |offers AS (
      |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM parts)
      |    AND l_suppkey IN (SELECT s_suppkey FROM eur_supp)
      |  GROUP BY 1, 2),
      |min_cost AS (
      |  SELECT l_partkey AS mp, MIN(cost) AS min_cost FROM offers GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, o.l_partkey AS p_partkey, p_brand, cost
      |FROM offers o
      |JOIN min_cost ON o.l_partkey = mp AND o.cost = min_cost
      |JOIN parts ON o.l_partkey = p_partkey
      |JOIN eur_supp ON o.l_suppkey = s_suppkey
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q263
  /** TPC-H Q11 (important stock): the parts whose traded value through
    * NATION_7 suppliers is disproportionate — the group-by gated by a
    * global-scalar subquery. The classic's ps_supplycost × ps_availqty
    * becomes the lineitem notional l_extendedprice × l_quantity (one
    * IEEE multiply per row, identical both engines, then decimal-exact
    * sums). The classic's fixed 0.01%/SF fraction is cardinality-scaled
    * here (TPC-H divides it by SF for the same reason): a part is
    * important when its value exceeds 2× the MEAN part value, compared
    * as n_parts × value > 2 × total in exact DECIMAL/BIGINT — the
    * selectivity is stable at every scale and the global total
    * re-aggregates the part grain, never the corpus.
    *
    * At 100 TB: nation-qualified suppliers broadcast as a semi join, one
    * corpus shuffle to part grain, and the scalar total is a 1-row
    * broadcast; the final sort is part-grain-sized. */
  def q263(s: SparkSession, d: String): DataFrame = {
    val natSupp = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_7")
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey"))
    val partVal = t(s, d, "lineitem")
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * col("l_quantity"))
        .cast(DecimalType(18, 2))).as("value_d"))
    val total = partVal.agg(sum(col("value_d")).as("total_d"),
      count(lit(1)).as("n_parts"))
    partVal.join(broadcast(total))
      .filter(col("value_d") * col("n_parts") > col("total_d") * lit(2))
      .select(col("l_partkey").as("p_partkey"),
        col("value_d").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }
  val q263Sql: String =
    """WITH nat_supp AS (
      |  SELECT s_suppkey FROM supplier
      |  WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_7')),
      |part_val AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS value_d
      |  FROM lineitem
      |  WHERE l_suppkey IN (SELECT s_suppkey FROM nat_supp)
      |  GROUP BY 1),
      |tot AS (SELECT SUM(value_d) AS total_d, COUNT(*) AS n_parts FROM part_val)
      |SELECT l_partkey AS p_partkey, CAST(value_d AS DOUBLE) AS value
      |FROM part_val, tot
      |WHERE value_d * n_parts > total_d * 2
      |ORDER BY value DESC, p_partkey""".stripMargin

  // ---------------------------------------------------------------- q264
  /** TPC-H Q16 (parts/supplier relationship): how many DISTINCT
    * suppliers ship each (brand, type, size) bucket, excluding
    * overdrawn suppliers (s_acctbal < 0 — the schema's stand-in for the
    * classic's customer-complaints exclusion) and the high-volume
    * ECONOMY/Brand#2 segments. The supplies relation is the distinct
    * (l_partkey, l_suppkey) grain of lineitem (the classic reads it from
    * partsupp). The anti join + distinct-count aggregate is the shape
    * under test.
    *
    * At 100 TB: the pair grain is ONE corpus shuffle (distinct), the
    * excluded-supplier anti join broadcasts (supplier-sized), the part
    * filter broadcasts, and the count-distinct re-shuffles only the
    * pair grain. */
  def q264(s: SparkSession, d: String): DataFrame = {
    val badSupp = t(s, d, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = t(s, d, "part")
      .filter(col("p_brand") =!= "Brand#2" &&
        !col("p_type").startsWith("ECONOMY") &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    t(s, d, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }
  val q264Sql: String =
    """WITH supplies AS (
      |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM supplies
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |  AND p_brand <> 'Brand#2'
      |  AND p_type NOT LIKE 'ECONOMY%'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q260_tpch_q9"  -> ((q260 _, Some(q260Sql))),
    "q261_tpch_q20" -> ((q261 _, Some(q261Sql))),
    "q262_tpch_q2"  -> ((q262 _, Some(q262Sql))),
    "q263_tpch_q11" -> ((q263 _, Some(q263Sql))),
    "q264_tpch_q16" -> ((q264 _, Some(q264Sql))))
}
