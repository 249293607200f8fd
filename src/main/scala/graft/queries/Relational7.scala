package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Seventh batch: the data-management surfaces a training-data pipeline
  * leans on daily — deterministic dataset splitting, gap forward-fill,
  * null-safe joins, multiset set-ops, histogramming, and the null-handling
  * scalar family. All oracle-checked.
  */
object Relational7 {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Exact cross-engine double sum: per-row DOUBLE, decimal-cast for the
    * (order-independent) sum, DOUBLE out — see Relational.scala's header. */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // ---------------------------------------------------------------- q60
  /** Deterministic train/validation/test split by content-stable hash
    * (md5 of the key, 60-bit int, mod 100): the standard reproducible
    * holdout assignment — no RNG, stable across engines/runs/cluster
    * layouts, and any engine can recompute membership. */
  def q60(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        (expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)") % 100)
          .as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  val q60Sql: String =
    """SELECT doc_id,
      |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket,
      |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80 THEN 'train'
      |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'validation'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Gap forward-fill (time-series imputation): a sparsified measure
    * carries its last observed value forward per user — last(IGNORE NULLS)
    * over a running frame. Values pass through untouched, so cross-engine
    * parity is exact. */
  def q61(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("sparse", when(col("event_id") % 5 === 0, col("value")))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("sparse"),
        last(col("sparse"), ignoreNulls = true).over(w).as("filled"))
      .orderBy(col("event_id"))
  }
  val q61Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    CASE WHEN event_id % 5 = 0 THEN value END AS sparse
      |  FROM events)
      |SELECT event_id, user_id, ts_us, sparse,
      |  last_value(sparse IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM e ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): suppliers with
    * a nulled-out nation key still match the correspondingly nulled nation
    * row — the semantics ordinary equi-joins silently drop. */
  def q62(s: SparkSession, d: String): DataFrame = {
    val sup = t(s, d, "supplier")
      .select(col("s_suppkey"), expr("nullif(s_nationkey, 5)").as("nk"))
    val nat = t(s, d, "nation")
      .select(expr("nullif(n_nationkey, 5)").as("nk2"), col("n_name"))
    sup.join(nat, col("nk") <=> col("nk2"))
      .select(col("s_suppkey"), col("nk"), col("n_name"))
      .orderBy(col("s_suppkey"), col("n_name"))
  }
  val q62Sql: String =
    """SELECT s.s_suppkey, nullif(s.s_nationkey, 5) AS nk, n.n_name
      |FROM supplier s JOIN nation n
      |  ON nullif(s.s_nationkey, 5) IS NOT DISTINCT FROM nullif(n.n_nationkey, 5)
      |ORDER BY s_suppkey, n_name""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Multiset set operations (INTERSECT ALL / EXCEPT ALL): multiplicity-
    * preserving, unlike the distinct-set q13 — the difference matters
    * whenever rows are observations, not identities. */
  def q63(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderpriority").as("p"))
    val b = t(s, d, "orders").filter(col("o_totalprice") > 150000)
      .select(col("o_orderpriority").as("p"))
    a.intersectAll(b).withColumn("tag", lit("in_both"))
      .unionByName(a.exceptAll(b).withColumn("tag", lit("only_f")))
      .select(col("tag"), col("p"))
      .orderBy(col("tag"), col("p"))
  }
  val q63Sql: String =
    """WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'),
      |b AS (SELECT o_orderpriority AS p FROM orders WHERE o_totalprice > 150000)
      |SELECT 'in_both' AS tag, p FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b)
      |UNION ALL
      |SELECT 'only_f' AS tag, p FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b)
      |ORDER BY tag, p""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Fixed-width histogram over order totals: bucket arithmetic written
    * identically in both engines (floor of a double division — same IEEE
    * op), counts + exact decimal sums per bucket. */
  def q64(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .withColumn("bucket", floor(col("o_totalprice") / 25000.0).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double").as("sum_price"))
      .orderBy(col("bucket"))
  val q64Sql: String =
    """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q65
  /** Null-handling scalar family: nullif / coalesce / greatest / least and
    * the null-dispatch CASE, exercised together over part. */
  def q65(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"),
        coalesce(expr("nullif(p_size, 25)"), lit(-1)).as("size_or"),
        greatest(col("p_size").cast("long"), length(col("p_name")).cast("long")).as("gx"),
        least(col("p_size").cast("long"), length(col("p_name")).cast("long")).as("lx"),
        when(expr("nullif(p_size, 25)").isNull, "masked").otherwise("kept").as("tag"))
      .orderBy(col("p_partkey"))
  val q65Sql: String =
    """SELECT p_partkey,
      |  coalesce(nullif(p_size, 25), -1) AS size_or,
      |  greatest(CAST(p_size AS BIGINT), length(p_name)) AS gx,
      |  least(CAST(p_size AS BIGINT), length(p_name)) AS lx,
      |  CASE WHEN nullif(p_size, 25) IS NULL THEN 'masked' ELSE 'kept' END AS tag
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q66
  /** Top-3 orders per customer through the NATIVE TopKPerGroup operator
    * (custom LogicalPlan + SparkStrategy + bounded-heap SparkPlan —
    * graft.plans.TopKPerGroup): the same row set as the q06 window
    * formulation, without sorting any group. The oracle is the window SQL —
    * the two must agree exactly because the ordering is total. */
  def q66(s: SparkSession, d: String): DataFrame =
    graft.plans.TopK.topKPerGroup(
      t(s, d, "orders"),
      groupCols = Seq(col("o_custkey")),
      orderCols = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  val q66Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Correlated EXISTS / NOT EXISTS subqueries (the remaining subquery
    * shape next to q52-q55): customers holding an urgent order but no
    * in-progress one. Spark plans both as semi/anti joins. */
  def q67(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer").createOrReplaceTempView("customer_v")
    t(s, d, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority LIKE '1%')
        |  AND NOT EXISTS (SELECT 1 FROM orders_v o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)
  }
  val q67Sql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority LIKE '1%')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q68
  /** UNPIVOT (wide → long, the inverse of q46's pivot) via the native
    * Dataset.unpivot API; the oracle states the equivalent UNION ALL, which
    * is exactly what unpivot desugars to. */
  def q68(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
               Array(col("p_size"), col("p_retailprice")), "metric", "val")
      .orderBy(col("p_partkey"), col("metric"))
  val q68Sql: String =
    """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
      |ORDER BY p_partkey, metric""".stripMargin

  // ---------------------------------------------------------------- q71
  /** NATIVE session windows (`session_window`, 30-min gap): Spark's built-in
    * gap sessionization — the API-level sibling of q18's manual
    * gaps-and-islands. Window start = first event, end = last event + gap;
    * the oracle re-states exactly that from the island decomposition. */
  def q71(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("ts_t", expr("timestamp_micros(ts_us)"))
      .groupBy(session_window(col("ts_t"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           dsum(col("value"), 6).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("start_us"))
  val q71Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sessions AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
      |  FROM flagged)
      |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) + 1800000000 AS end_us,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM sessions GROUP BY user_id, sess_idx ORDER BY user_id, start_us""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Bitwise-operator surface over 60-bit md5-derived integers (exact in
    * both engines): AND / OR / XOR / shifts / popcount — the primitives
    * under the SimHash and LSH banding operators, exposed directly. */
  def q73(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") < 2000)
      .withColumn("h",
        expr("cast(conv(substring(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint)"))
      .select(col("event_id"),
        expr("h & 255").as("and8"),
        expr("h | 15").as("or4"),
        expr("h ^ shiftright(h, 13)").as("mix"),
        expr("shiftleft(h & 1048575, 8)").as("shl"),
        bit_count(col("h")).cast("long").as("pop"))
      .orderBy(col("event_id"))
  val q73Sql: String =
    """WITH h AS (
      |  SELECT event_id,
      |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events WHERE event_id < 2000)
      |SELECT event_id, h & 255 AS and8, h | 15 AS or4,
      |  xor(h, h >> 13) AS mix,
      |  (h & 1048575) << 8 AS shl,
      |  CAST(bit_count(h) AS BIGINT) AS pop
      |FROM h ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q75
  /** Approximate aggregates ON the correctness board (round-3 verdict #2:
    * they lived only in ScaleSpec): HyperLogLog++ distinct counting and
    * t-digest-style quantile sketching next to their exact twins, with the
    * error bound asserted AS A COLUMN. The oracle emits the exact values
    * plus literal TRUE for each bound, so a sketch drifting out of bound
    * flips the Spark boolean and hash-fails the row — the driver's gate
    * genuinely checks the approximation contract, not just row shape.
    * Booleans (not sketch outputs) cross engines because sketch merge order
    * is partitioning-dependent; the bound holds under any merge order.
    * At 100 TB these are THE cardinality/quantile operators: fixed-size
    * sketch buffers, map-side partial merge, one tiny row shuffled. */
  def q75(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.agg(
        countDistinct(col("l_partkey")).as("exact_distinct_parts"),
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col("l_partkey")).as("acd"),
        expr("percentile(l_extendedprice, 0.5)").as("p50x"),
        expr("percentile(l_extendedprice, 0.9)").as("p90x"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50a"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("p90a"))
      .select(
        col("exact_distinct_parts"), col("n_rows"),
        (abs(col("acd") - col("exact_distinct_parts")).cast("double") /
          col("exact_distinct_parts") <= 0.15).as("acd_within_15pct"),
        (abs(col("p50a") - col("p50x")) / col("p50x") <= 0.05).as("p50_within_5pct"),
        (abs(col("p90a") - col("p90x")) / col("p90x") <= 0.05).as("p90_within_5pct"))
  }
  val q75Sql: String =
    """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct_parts,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  TRUE AS acd_within_15pct, TRUE AS p50_within_5pct, TRUE AS p90_within_5pct
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q100
  /** LATERAL correlated subquery with per-row LIMIT — "each customer's two
    * most expensive orders" stated as the SQL-standard lateral join. The
    * interesting part is what Catalyst does with it: the per-row
    * correlated LIMIT decorrelates into a WindowGroupLimit (bounded heap
    * per o_custkey) + plain equi-join — i.e. the optimizer derives q66's
    * top-k-per-group shape from the lateral formulation, so the "run a
    * subquery per outer row" semantics costs one group-limit pass and one
    * join at any scale (PlanCheck pins that derivation). Both engines
    * execute the identical SQL text. */
  def q100(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(q100Sql)
  }
  val q100Sql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q101
  /** Calendar densification via a RECURSIVE CTE (Spark 4's WITH RECURSIVE):
    * build the complete month spine from MIN to MAX order month by
    * recursive +1-month steps, left-join the monthly aggregate, zero-fill
    * gaps — the standard "no missing buckets in the report" warehouse pass.
    * The spine is bounds-driven (the recursion carries its own stop month),
    * so the same query adapts to any date range; months emit as strings
    * (never raw timestamps — cross-engine parity rule). The recursion depth
    * is months-between (~80 here), far under Spark's recursion-level guard;
    * at scale the spine is rows-of-months (trivial) and the join is a
    * broadcast of the spine onto the aggregate. */
  def q101(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """WITH RECURSIVE bounds AS (
        |  SELECT to_date(date_trunc('MONTH', MIN(o_orderdate))) AS mn,
        |         to_date(date_trunc('MONTH', MAX(o_orderdate))) AS mx
        |  FROM orders),
        |spine(mon, mx) AS (
        |  SELECT mn, mx FROM bounds
        |  UNION ALL
        |  SELECT add_months(mon, 1), mx FROM spine WHERE mon < mx),
        |agg AS (
        |  SELECT to_date(date_trunc('MONTH', o_orderdate)) AS mon,
        |         COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |  FROM orders GROUP BY 1)
        |SELECT date_format(s.mon, 'yyyy-MM') AS month,
        |  coalesce(a.n_orders, 0L) AS n_orders,
        |  coalesce(a.sum_price, 0.0D) AS sum_price
        |FROM spine s LEFT JOIN agg a ON a.mon = s.mon
        |ORDER BY month""".stripMargin)
  }
  val q101Sql: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS mn,
      |         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS mx
      |  FROM orders),
      |spine(mon, mx) AS (
      |  SELECT mn, mx FROM bounds
      |  UNION ALL
      |  SELECT CAST(mon + INTERVAL 1 MONTH AS DATE), mx FROM spine WHERE mon < mx),
      |agg AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
      |         COUNT(*) AS n_orders,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |  FROM orders GROUP BY 1)
      |SELECT strftime(s.mon, '%Y-%m') AS month,
      |  coalesce(a.n_orders, 0) AS n_orders,
      |  coalesce(a.sum_price, 0.0) AS sum_price
      |FROM spine s LEFT JOIN agg a ON a.mon = s.mon
      |ORDER BY month""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q101_month_spine"   -> ((q101 _, Some(q101Sql))),
    "q100_lateral_topk"  -> ((q100 _, Some(q100Sql))),
    "q75_approx_aggregates" -> ((q75 _, Some(q75Sql))),
    "q66_topk_native"    -> ((q66 _, Some(q66Sql))),
    "q67_exists_subqueries" -> ((q67 _, Some(q67Sql))),
    "q68_unpivot"        -> ((q68 _, Some(q68Sql))),
    "q71_session_window" -> ((q71 _, Some(q71Sql))),
    "q73_bit_ops"        -> ((q73 _, Some(q73Sql))),
    "q60_hash_split"     -> ((q60 _, Some(q60Sql))),
    "q61_gap_fill"       -> ((q61 _, Some(q61Sql))),
    "q62_null_safe_join" -> ((q62 _, Some(q62Sql))),
    "q63_set_ops_all"    -> ((q63 _, Some(q63Sql))),
    "q64_histogram"      -> ((q64 _, Some(q64Sql))),
    "q65_null_funcs"     -> ((q65 _, Some(q65Sql))))
}
