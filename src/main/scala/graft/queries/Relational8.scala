package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Eighth batch: the classic multiway star join (TPC-H Q5 shape, q115),
  * robust per-group outlier detection (median/MAD, q116), and a
  * Deequ-style single-pass data-quality constraint audit (q117).
  */
object Relational8 {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Exact cross-engine double sum (see Relational.scala's header). */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // ---------------------------------------------------------------- q115
  /** TPC-H Q5 shape — the 6-table star join with a cross-dimension
    * correlation (supplier and customer must share a nation): the classic
    * join-order stress test. Region filters nation (broadcast), nation
    * qualifies both customer and supplier sides; the fact-side chain is
    * lineitem→orders→customer with the supplier join carrying the
    * n_nationkey correlation. At 100 TB: region/nation/supplier broadcast,
    * orders' date filter pushes to its scan and prunes before the fact
    * join, and the only big exchanges are the two fact-side equi-joins. */
  def q115(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val nat = t(s, d, "nation")
      .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val ord = t(s, d, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }
  val q115Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q116
  /** Robust per-group outlier detection — median/MAD, the anomaly gate
    * that survives the outliers it hunts (mean/stddev do not): an event is
    * an outlier when its absolute deviation from its user's median exceeds
    * 3× the user's median absolute deviation. Exact interpolated medians
    * (q41's percentile ↔ quantile_cont parity); the two per-user stat
    * tables are user-cardinality-sized and broadcast back onto the event
    * stream, so the corpus shuffles only for the two stat aggregations. */
  def q116(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("value"))
    val med = ev.groupBy(col("user_id"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("user_id"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("user_id"))
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("value"),
        (col("adev") > lit(3.0) * col("mad")).as("is_outlier"))
      .orderBy(col("event_id"))
  }
  val q116Sql: String =
    """WITH med AS (
      |  SELECT user_id, quantile_cont(value, 0.5) AS med FROM events GROUP BY user_id),
      |dev AS (
      |  SELECT e.event_id, e.user_id, e.value, abs(e.value - m.med) AS adev
      |  FROM events e JOIN med m USING (user_id)),
      |mad AS (
      |  SELECT user_id, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY user_id)
      |SELECT d.event_id, d.user_id, d.value, d.adev > 3.0 * m.mad AS is_outlier
      |FROM dev d JOIN mad m USING (user_id) ORDER BY d.event_id""".stripMargin

  // ---------------------------------------------------------------- q117
  /** Data-quality constraint audit (the Deequ pattern): one row of
    * dataset-level verdicts over orders — row count, key uniqueness, null
    * fraction of the FK, domain conformance of the status column, a
    * value-range check, and referential integrity against customer. The
    * main metrics are ONE aggregation pass over the scan; RI is one anti-
    * join (at 100 TB: broadcast the distinct FK side or bloom-prefilter).
    * This is the audit every ingest runs before promoting a snapshot —
    * here its metrics are themselves oracle-checked. */
  def q117(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val base = o.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_orderkey")).as("n_keys"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
      sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)).as("bad_status"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("neg_price"))
    val orphans = o.join(t(s, d, "customer"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_orders"))
    base.crossJoin(orphans)
      .select(col("n_rows"), col("n_keys"),
        (col("n_rows") === col("n_keys")).as("key_unique"),
        col("null_custkey"), col("bad_status"), col("neg_price"),
        col("orphan_orders"),
        (col("orphan_orders") === 0L).as("ri_ok"))
  }
  val q117Sql: String =
    """WITH base AS (
      |  SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_keys,
      |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
      |    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
      |    CAST(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_price
      |  FROM orders),
      |orph AS (
      |  SELECT COUNT(*) AS orphan_orders FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |SELECT b.n_rows, b.n_keys, b.n_rows = b.n_keys AS key_unique,
      |  b.null_custkey, b.bad_status, b.neg_price,
      |  o.orphan_orders, o.orphan_orders = 0 AS ri_ok
      |FROM base b, orph o""".stripMargin

  // ---------------------------------------------------------------- q118
  /** Exact cross-engine linear regression + correlation per group —
    * value regressed on the event's day, stated entirely through exact
    * sufficient statistics: n and Σx/Σx² are integer sums (x is the day
    * number centered to single digits, so every product stays far inside
    * exact-double range), Σy/Σxy/Σy² are the repo's standard DECIMAL-
    * quantized sums. The slope/intercept/corr formulas then run on exact
    * inputs as identical double arithmetic — which is the only way
    * cross-engine `corr`/`regr_slope` parity can be bit-exact (the
    * built-ins use order-dependent streaming moments). At 100 TB: one
    * partial-aggregated pass; the DECIMAL(18,6) sums swap to (38,6) when
    * row counts push the bound. */
  def q118(s: SparkSession, d: String): DataFrame = {
    // day 19723 = 2024-01-01 — centering x keeps n·Σx² within 2^53
    val x = expr("ts_us div 86400000000") - lit(19723L)
    val y = col("value")
    Tables.events(s, d)
      .select(col("event_type"), x.as("x"), y.as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y").cast(DecimalType(18, 6))).as("sy_d"),
        sum((col("x").cast("double") * col("y")).cast(DecimalType(18, 6))).as("sxy_d"),
        sum(col("x") * col("x")).as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(18, 6))).as("syy_d"))
      .select(col("event_type"), col("n"),
        ((col("n").cast("double") * col("sxy_d").cast("double")
          - col("sx").cast("double") * col("sy_d").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))).as("slope"),
        ((col("n").cast("double") * col("sxy_d").cast("double")
          - col("sx").cast("double") * col("sy_d").cast("double"))
          / (sqrt(col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
            * sqrt(col("n").cast("double") * col("syy_d").cast("double")
              - col("sy_d").cast("double") * col("sy_d").cast("double")))).as("corr"))
      .orderBy(col("event_type"))
  }
  val q118Sql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 - 19723 AS x,
      |    value AS y
      |  FROM events),
      |m AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
      |    SUM(CAST(y AS DECIMAL(18,6))) AS sy_d,
      |    SUM(CAST(CAST(x AS DOUBLE) * y AS DECIMAL(18,6))) AS sxy_d,
      |    SUM(x * x) AS sxx,
      |    SUM(CAST(y * y AS DECIMAL(18,6))) AS syy_d
      |  FROM e GROUP BY event_type)
      |SELECT event_type, n,
      |  (CAST(n AS DOUBLE) * CAST(sxy_d AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy_d AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
      |  (CAST(n AS DOUBLE) * CAST(sxy_d AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy_d AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |       * sqrt(CAST(n AS DOUBLE) * CAST(syy_d AS DOUBLE) - CAST(sy_d AS DOUBLE) * CAST(sy_d AS DOUBLE))) AS corr
      |FROM m ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q119
  /** Ordered funnel analysis (view → click → purchase): each user's
    * furthest funnel stage, requiring strict temporal progression (the
    * click must FOLLOW the first view, the purchase must follow that
    * click) — the product-analytics query that a naive per-type count
    * gets wrong. Three conditional-min aggregations chained by joins on
    * user_id; per-user stage tables are user-cardinality-sized. Output is
    * the stage histogram. */
  def q119(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts_us"))
    val u = e.select(col("user_id")).distinct()
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("tv"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts_us") > col("tv"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("tc"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts_us") > col("tc"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("tp"))
    u.join(v.withColumn("hv", lit(1)), Seq("user_id"), "left")
      .join(c.withColumn("hc", lit(1)), Seq("user_id"), "left")
      .join(p.withColumn("hp", lit(1)), Seq("user_id"), "left")
      .select(when(col("hp").isNotNull, 3L)
        .when(col("hc").isNotNull, 2L)
        .when(col("hv").isNotNull, 1L)
        .otherwise(0L).as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))
  }
  val q119Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |u AS (SELECT DISTINCT user_id FROM e),
      |v AS (SELECT user_id, MIN(ts_us) AS tv FROM e WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts_us) AS tc FROM e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts_us > v.tv GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts_us) AS tp FROM e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts_us > c.tc GROUP BY e.user_id)
      |SELECT stage, COUNT(*) AS n_users FROM (
      |  SELECT CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
      |              WHEN c.user_id IS NOT NULL THEN 2
      |              WHEN v.user_id IS NOT NULL THEN 1
      |              ELSE 0 END AS BIGINT) AS stage
      |  FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |  LEFT JOIN p USING (user_id))
      |GROUP BY stage ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- q120
  /** Cohort retention — users grouped by first-activity week, tracked by
    * distinct activity in each subsequent week offset: the standard
    * retention triangle. Week arithmetic is pure integer division on
    * epoch-microseconds, so both engines agree exactly; the cohort
    * assignment table is user-cardinality-sized and joins back onto the
    * event stream. */
  def q120(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), expr("ts_us div 86400000000 div 7").as("wk"))
    val f = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    e.join(broadcast(f), Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort_wk"), col("offset_wk"))
  }
  val q120Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 // 7 AS wk
      |  FROM events),
      |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id)
      |SELECT f.cohort_wk, e.wk - f.cohort_wk AS offset_wk,
      |  COUNT(DISTINCT e.user_id) AS active_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q122
  /** SCD2 interval build — turn an event stream of attribute observations
    * into the slowly-changing-dimension shape every warehouse maintains:
    * one validity interval [valid_from, valid_to) per observation, closed
    * by the user's next observation, open (null valid_to, is_current) on
    * the latest. One window pass per user; event_id breaks timestamp ties
    * deterministically. At 100 TB this runs per natural key with the same
    * single user-keyed exchange. */
  def q122(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts_us").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }
  val q122Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      |  FROM events)
      |SELECT user_id, event_id, value, ts_us AS valid_from,
      |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to,
      |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL AS is_current
      |FROM e ORDER BY user_id, valid_from, event_id""".stripMargin

  // ---------------------------------------------------------------- q124
  /** Hopping (sliding) window aggregation — the batch twin of streaming's
    * overlapping windows: 10-minute windows sliding every 5, so each event
    * lands in exactly two. The Spark side uses the native `window()`
    * generator; the oracle states the same assignment as integer epoch
    * arithmetic (two candidate starts per event) — cross-checking Spark's
    * window alignment semantics against an independent formulation.
    * At scale: the window struct is a per-row 2-element generator feeding
    * a partial-aggregated groupBy; no self-join, no range join. */
  def q124(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts_t"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .select(unix_micros(col("w.start").cast("timestamp")).as("w_start_us"),
        col("n"), col("sum_value"))
      .orderBy(col("w_start_us"))
  val q124Sql: String =
    """WITH e AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
      |x AS (
      |  SELECT ts_us, value,
      |    ((ts_us // 300000000) - u.k) * 300000000 AS w_start
      |  FROM e, unnest(range(0, 2)) AS u(k)),
      |f AS (SELECT * FROM x WHERE ts_us >= w_start AND ts_us < w_start + 600000000)
      |SELECT w_start AS w_start_us, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM f GROUP BY w_start ORDER BY w_start""".stripMargin

  // ---------------------------------------------------------------- q245
  /** TPC-H Q7 shape (volume shipping): revenue between a nation PAIR in
    * both directions, grouped by (supp_nation, cust_nation, ship year).
    * The self-joined dimension (nation as n1 AND n2) with a disjunctive
    * cross-side predicate is the classic optimizer case the board
    * lacked next to Q5's correlated star. At 100 TB: both nation copies
    * and supplier broadcast; the ship-date range pushes into the
    * lineitem scan; the pair predicate prunes BEFORE the fact joins
    * (supplier and customer are filtered to the two nations first, so
    * the big joins carry only qualifying rows). */
  def q245(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1995-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val pair = Seq("NATION_3", "NATION_7")
    val n1 = t(s, d, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
    val n2 = t(s, d, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
    val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(n1), col("s_nationkey") === col("nk1"))
    val cst = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(n2), col("c_nationkey") === col("nk2"))
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cst, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }
  val q245Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |  AND l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q246
  /** TPC-H Q10 shape (returned items): per-customer lost revenue over
    * returned lineitems in a quarter, top 20 — the join-then-top-k
    * reporting query. At 100 TB: the order-date quarter and the
    * R-return-flag both push into their scans BEFORE the fact join;
    * nation broadcasts; and the top 20 is a TakeOrdered bounded heap,
    * never a global sort of the customer rollup. */
  def q246(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1995-01-01").cast("timestamp")
    val hi = lit("1995-04-01").cast("timestamp")
    val ord = t(s, d, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    t(s, d, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation").select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }
  val q246Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1995-04-01'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q248
  /** TPC-H Q4 shape (order-priority checking): count orders per priority
    * that have at least one LATE lineitem (shipped after the order date
    * — the schema's stand-in for Q4's commit<receipt), stated as EXISTS.
    * The decorrelation story is the point: Catalyst plans the EXISTS as
    * a left-semi HASH join (never a per-row subquery), the quarter
    * filter pushes to the orders scan, and the rollup is 5 groups. */
  def q248(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-07-01").cast("timestamp")
    val ord = t(s, d, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"), col("o_orderdate"))
    val late = t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    ord.join(late,
        ord("o_orderkey") === late("l_orderkey") && late("l_shipdate") > ord("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }
  val q248Sql: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q249
  /** TPC-H Q12 shape (priority-class counting): per lineitem group
    * (return flag standing in for the schema-absent ship mode), count
    * lines of high-priority (1/2) vs other orders via conditional
    * aggregation after the fact join — Q12's CASE-inside-SUM pattern.
    * At 100 TB the ship-date year pushes to the lineitem scan and the
    * rollup is flag-grain. */
  def q249(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val hi2 = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(hi2, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi2, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }
  val q249Sql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q250
  /** TPC-H Q14 shape (promotion effect): promo revenue share of one
    * ship-month. Both the promo and total revenues are decimal-exact
    * sums (the repo's cross-engine recipe); the share is then ONE
    * correctly-rounded double division of those two exact operands —
    * the q138 precedent — so nothing floats before the gate. Part
    * broadcasts onto the month's lineitems. */
  def q250(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1996-03-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(18, 6))
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(18, 6))))
          .cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (lit(100.0) * col("promo_revenue") / col("total_revenue")).as("promo_share"))
  }
  val q250Sql: String =
    """WITH m AS (
      |  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
      |            THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
      |            ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_revenue,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
      |         AS DOUBLE) AS total_revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01')
      |SELECT promo_revenue, total_revenue,
      |  100.0 * promo_revenue / total_revenue AS promo_share
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- q251
  /** TPC-H Q19 shape (discounted revenue over DISJUNCTIVE predicates):
    * three (brand, size-range, quantity-range) alternatives OR-ed across
    * the part join — the filter-pushdown stress case: the part-side
    * conjuncts prune the broadcast build side, the common l_quantity
    * bound pushes to the lineitem scan, and the OR evaluates post-join
    * without ever falling back to a cartesian. */
  def q251(s: SparkSession, d: String): DataFrame = {
    val l = t(s, d, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
    val p = t(s, d, "part").select(col("p_partkey"), col("p_brand"), col("p_size"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
  }
  val q251Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
      |       AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |        AND l_quantity BETWEEN 1 AND 11)
      |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |        AND l_quantity BETWEEN 10 AND 20)
      |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 20 AND 30))
      |  AND l_quantity BETWEEN 1 AND 30""".stripMargin

  // ---------------------------------------------------------------- q252
  /** TPC-H Q6 (forecasting revenue change): the pure scan-side
    * aggregation — every predicate (ship year, discount band, quantity
    * cap) pushes into the parquet scan, no join anywhere; the board's
    * cleanest full-pushdown witness among the classics. */
  def q252(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"))
  }
  val q252Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
      |       AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q253
  /** TPC-H Q15 (top supplier): quarter revenue per supplier, then the
    * suppliers AT the maximum — the view + global-scalar join-back
    * shape. At 100 TB: one supplier-grain rollup; the max is a 1-row
    * scalar broadcast back onto the (already metadata-sized) rollup,
    * never a second pass over lineitem. */
  def q253(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val rev = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("total_revenue"))
      .localCheckpoint() // the view feeds both the max and the join-back
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(mx), col("total_revenue") === col("mx"))
      .join(broadcast(t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }
  val q253Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
      |         AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q254
  /** TPC-H Q17 (small-quantity-order revenue): lineitems of one brand
    * whose quantity is under 0.2× that part's average quantity — the
    * correlated scalar-aggregate subquery, decorrelated into a
    * per-part aggregate joined back. Cross-engine float discipline: the
    * per-part average is a decimal-exact sum divided ONCE by the exact
    * count, and the 0.2× threshold is one more multiply — identical
    * IEEE ops both sides of the gate, so the comparison can never flip
    * on an ulp. */
  def q254(s: SparkSession, d: String): DataFrame = {
    val brandParts = t(s, d, "part")
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val l = t(s, d, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val avgQ = l.groupBy(col("l_partkey").as("ap"))
      .agg((sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double") /
        count(lit(1))).as("avg_q"))
    l.join(broadcast(avgQ), col("l_partkey") === col("ap"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_q"))
      .agg((dsum(col("l_extendedprice"), 4) / lit(7.0)).as("avg_yearly"))
  }
  val q254Sql: String =
    """WITH l AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#23'),
      |a AS (
      |  SELECT l_partkey AS ap,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_q
      |  FROM l GROUP BY 1)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
      |       AS avg_yearly
      |FROM l JOIN a ON l_partkey = ap
      |WHERE l_quantity < 0.2 * avg_q""".stripMargin

  // ---------------------------------------------------------------- q255
  /** TPC-H Q21 shape (suppliers who kept orders waiting): supplier S is
    * CULPABLE for an order when S shipped late (> 60 days after the
    * order date), ANOTHER supplier contributed to the same order, and
    * NO other contributor shipped late — the EXISTS + NOT-EXISTS
    * double-correlation, planned as a semi join stacked on an anti
    * join. Top 10 suppliers by culpable-order count, TakeOrdered. */
  def q255(s: SparkSession, d: String): DataFrame = {
    val l = t(s, d, "lineitem")
      .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
      .localCheckpoint() // feeds the base and both correlated sides
    val base = l.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val others = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val lateOthers = l.filter(col("late"))
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    base
      .join(others, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
        "left_semi")
      .join(lateOthers, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"),
        "left_anti")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("l_suppkey"))
      .limit(10)
  }
  val q255Sql: String =
    """WITH l AS (
      |  SELECT l_orderkey, l_suppkey,
      |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |base AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE late)
      |SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM base b
      |WHERE EXISTS (SELECT 1 FROM l WHERE l.l_orderkey = b.l_orderkey
      |              AND l.l_suppkey <> b.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l WHERE l.l_orderkey = b.l_orderkey
      |                  AND l.l_suppkey <> b.l_suppkey AND l.late)
      |GROUP BY 1
      |ORDER BY numwait DESC, l_suppkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q256
  /** TPC-H Q22 shape (global sales opportunity): per market segment,
    * the customers with above-average positive balances and no RECENT orders (none since 2000) —
    * the anti join gated by a global scalar (decimal-exact sum / exact
    * count, one division — the q254 discipline). At 100 TB the scalar
    * broadcasts, the anti join is the only exchange pair. */
  def q256(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val avgPos = cust.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double") /
        count(lit(1))).as("avg_bal"))
    cust.join(broadcast(avgPos)).filter(col("c_acctbal") > col("avg_bal"))
      .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }
  val q256Sql: String =
    """WITH a AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |         AS avg_bal
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer, a
      |WHERE c_acctbal > avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q257
  /** TPC-H Q13 (customer distribution): how many customers placed k
    * orders, INCLUDING k = 0 — the LEFT OUTER join whose unmatched side
    * must survive into the count, then a histogram of the counts. At
    * 100 TB: one outer join on the customer key, one customer-grain
    * count, and the k-histogram is a tiny second rollup. */
  def q257(s: SparkSession, d: String): DataFrame = {
    val perCust = t(s, d, "customer").select(col("c_custkey"))
      .join(t(s, d, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count")) // count skips the null side
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }
  val q257Sql: String =
    """WITH per AS (
      |  SELECT c_custkey, COUNT(o_custkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY 1)
      |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM per GROUP BY 1
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q258
  /** TPC-H Q8 shape (national market share): one nation's share of a
    * region's yearly revenue — the two-level aggregate where the share
    * is a DIVISION of two same-group sums. Both sums are decimal-exact
    * (conditional numerator via CASE inside the same aggregation), the
    * share is one correctly-rounded double division per year — the
    * repo's float-at-the-gate discipline. Dims broadcast; the fact
    * chain shuffles twice. */
  def q258(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1995-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val dec = DecimalType(18, 6)
    val asiaCust = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(t(s, d, "nation")
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    t(s, d, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        col("o_orderkey") === col("l_orderkey"))
      .withColumn("vol", (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("n_name") === "NATION_5", col("vol"))
          .otherwise(lit(0).cast(dec))).cast("double").as("nation_volume"),
        sum(col("vol")).cast("double").as("region_volume"))
      .select(col("o_year"), col("nation_volume"), col("region_volume"),
        (col("nation_volume") / col("region_volume")).as("mkt_share"))
      .orderBy(col("o_year"))
  }
  val q258Sql: String =
    """WITH vols AS (
      |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year, n_name,
      |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)) AS vol
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate < TIMESTAMP '1997-01-01'),
      |g AS (
      |  SELECT o_year,
      |    CAST(SUM(CASE WHEN n_name = 'NATION_5' THEN vol
      |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS nation_volume,
      |    CAST(SUM(vol) AS DOUBLE) AS region_volume
      |  FROM vols GROUP BY 1)
      |SELECT o_year, nation_volume, region_volume,
      |  nation_volume / region_volume AS mkt_share
      |FROM g ORDER BY o_year""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q257_tpch_q13"       -> ((q257 _, Some(q257Sql))),
    "q258_tpch_q8"        -> ((q258 _, Some(q258Sql))),
    "q252_tpch_q6"        -> ((q252 _, Some(q252Sql))),
    "q253_tpch_q15"       -> ((q253 _, Some(q253Sql))),
    "q254_tpch_q17"       -> ((q254 _, Some(q254Sql))),
    "q255_tpch_q21"       -> ((q255 _, Some(q255Sql))),
    "q256_tpch_q22"       -> ((q256 _, Some(q256Sql))),
    "q248_tpch_q4"        -> ((q248 _, Some(q248Sql))),
    "q249_tpch_q12"       -> ((q249 _, Some(q249Sql))),
    "q250_tpch_q14"       -> ((q250 _, Some(q250Sql))),
    "q251_tpch_q19"       -> ((q251 _, Some(q251Sql))),
    "q245_tpch_q7"        -> ((q245 _, Some(q245Sql))),
    "q246_tpch_q10"       -> ((q246 _, Some(q246Sql))),
    "q122_scd2_intervals" -> ((q122 _, Some(q122Sql))),
    "q124_hopping_window" -> ((q124 _, Some(q124Sql))),
    "q115_tpch_q5"        -> ((q115 _, Some(q115Sql))),
    "q116_outlier_mad"    -> ((q116 _, Some(q116Sql))),
    "q117_constraint_audit" -> ((q117 _, Some(q117Sql))),
    "q118_exact_regression" -> ((q118 _, Some(q118Sql))),
    "q119_funnel"         -> ((q119 _, Some(q119Sql))),
    "q120_cohort_retention" -> ((q120 _, Some(q120Sql))))
}
