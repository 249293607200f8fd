package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** SPATIAL operators (SURVEY §2 north-star extension, round 9): the
  * grid-bucketed radius join — the canonical "find everything within
  * distance R" shape a curation pipeline runs for geo-tagged corpora
  * (dedupe capture sites, join sensors to assets, cluster POIs).
  *
  * The at-scale design is the standard uniform-grid spatial join: bucket
  * both sides into square cells of side = R, replicate the PROBE side into
  * its 3×3 cell neighborhood (a constant ×9 blow-up, NOT data-sized), then
  * a plain equi-join on the cell key followed by the exact distance
  * predicate. Every candidate pair shares a cell key, so the pair space is
  * Σ_cell |A_cell|·|B_cell| — never |A|·|B| — and the join is an ordinary
  * shuffle/broadcast hash join Catalyst can plan, salt, and AQE-split like
  * any other (PlanCheck pins: hash join on the cell key, no
  * CartesianProduct/BroadcastNestedLoopJoin anywhere). Cell side = R makes
  * the 3×3 neighborhood SOUND: any pair within L2 distance R differs by
  * < R per axis, hence by at most one cell index per axis. Skew = cell
  * occupancy, bounded by data density, and the explode factor is constant,
  * so the shape survives 100 TB by construction.
  *
  * Coordinates are synthesized DETERMINISTICALLY from the TPC-H keys with
  * integer congruential mixes (the testdata carries no geo columns), and
  * the whole query — coordinates, distances, aggregates — stays in exact
  * BIGINT arithmetic (squared distances; no sqrt, no trig), so the DuckDB
  * oracle (which states the same join as a naive cross-join + filter, the
  * plan this one exists to refuse) hash-matches bit-exactly.
  */
object SpatialOps {

  private val span = 100000L // coordinate domain [0, span) on each axis
  private val r2   = 1000000L // radius² — R = 1000 units
  private val cell = 1000L // grid cell side = R (soundness requirement)

  /** Deterministic synthetic planar coordinates from an integer key:
    * (key·a mod span, key·b mod span) with odd multipliers — identical
    * integer arithmetic on both engines (keys are positive, so `%` agrees
    * across Spark/DuckDB). */
  private def coords(df: DataFrame, key: String, ax: Long, ay: Long,
                     x: String, y: String): DataFrame =
    df.select(col(key),
      ((col(key) * ax) % span).as(x),
      ((col(key) * ay) % span).as(y))

  // ---------------------------------------------------------------- q273
  /** All suppliers within distance R of each customer, aggregated per
    * customer: match count, min/sum of squared distances. Customers with
    * no supplier in range are absent (inner-join semantics — the radius
    * join's natural output). */
  def q273(s: SparkSession, d: String): DataFrame = {
    val cust = coords(Tables.customer(s, d), "c_custkey", 48271L, 69621L, "cx", "cy")
    val supp = coords(Tables.supplier(s, d), "s_suppkey", 40503L, 65537L, "sx", "sy")
      .withColumn("gx", expr(s"sx div $cell"))
      .withColumn("gy", expr(s"sy div $cell"))
    val offsets = typedLit(for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy))
    val probes = cust
      .withColumn("o", explode(offsets)) // constant ×9, not data-sized
      .withColumn("gx", expr(s"cx div $cell") + col("o._1"))
      .withColumn("gy", expr(s"cy div $cell") + col("o._2"))
      .drop("o")
    val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
             (col("cy") - col("sy")) * (col("cy") - col("sy"))
    probes.join(supp, Seq("gx", "gy")) // equi-join on the cell key
      .withColumn("d2", d2)
      .filter(col("d2") <= r2) // exact verify on candidates only
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_within"),
           min(col("d2")).as("min_d2"),
           sum(col("d2")).as("sum_d2"))
      .orderBy(col("c_custkey"))
  }
  val q273Sql: String =
    s"""WITH c AS (
       |  SELECT c_custkey,
       |    (c_custkey * 48271) % $span AS cx,
       |    (c_custkey * 69621) % $span AS cy
       |  FROM customer),
       |s AS (
       |  SELECT s_suppkey,
       |    (s_suppkey * 40503) % $span AS sx,
       |    (s_suppkey * 65537) % $span AS sy
       |  FROM supplier),
       |p AS (
       |  SELECT c_custkey,
       |    (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS d2
       |  FROM c CROSS JOIN s
       |  WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= $r2)
       |SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_within,
       |  CAST(MIN(d2) AS BIGINT) AS min_d2, CAST(SUM(d2) AS BIGINT) AS sum_d2
       |FROM p GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q276
  /** Radius-bounded kNN join: the k nearest suppliers WITHIN distance R of
    * each customer (k = 3), ties broken by supplier key — the spatial
    * retrieval shape next to q273's set-valued radius join. The radius
    * bound is what keeps kNN exact AND distributed: candidates come from
    * the same 3×3 grid equi-join (sound for any pair within R), and the
    * per-customer top-k is a bounded heap, not a sort — the
    * WindowTopKRewrite rule turns the row_number ≤ k idiom into the
    * O(keys×k)-memory heap operator, so no per-customer sort ever runs.
    * Unbounded exact kNN (no radius) needs expanding-ring probes with a
    * data-dependent round count — the documented trade: bound the radius
    * and the plan is one join + one heap, at any scale. */
  def q276(s: SparkSession, d: String): DataFrame = {
    val cust = coords(Tables.customer(s, d), "c_custkey", 48271L, 69621L, "cx", "cy")
    val supp = coords(Tables.supplier(s, d), "s_suppkey", 40503L, 65537L, "sx", "sy")
      .withColumn("gx", expr(s"sx div $cell"))
      .withColumn("gy", expr(s"sy div $cell"))
    val offsets = typedLit(for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy))
    val probes = cust
      .withColumn("o", explode(offsets))
      .withColumn("gx", expr(s"cx div $cell") + col("o._1"))
      .withColumn("gy", expr(s"cy div $cell") + col("o._2"))
      .drop("o")
    val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
             (col("cy") - col("sy")) * (col("cy") - col("sy"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_custkey"))
      .orderBy(col("d2"), col("s_suppkey"))
    probes.join(supp, Seq("gx", "gy"))
      .withColumn("d2", d2)
      .filter(col("d2") <= r2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("c_custkey"), col("rank").cast("long").as("rank"),
        col("s_suppkey"), col("d2"))
      .orderBy(col("c_custkey"), col("rank"))
  }
  val q276Sql: String =
    s"""WITH c AS (
       |  SELECT c_custkey,
       |    (c_custkey * 48271) % $span AS cx,
       |    (c_custkey * 69621) % $span AS cy
       |  FROM customer),
       |s AS (
       |  SELECT s_suppkey,
       |    (s_suppkey * 40503) % $span AS sx,
       |    (s_suppkey * 65537) % $span AS sy
       |  FROM supplier),
       |p AS (
       |  SELECT c_custkey, s_suppkey,
       |    (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS d2
       |  FROM c CROSS JOIN s
       |  WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= $r2),
       |r AS (
       |  SELECT c_custkey, s_suppkey, d2,
       |    ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY d2, s_suppkey) AS rank
       |  FROM p)
       |SELECT c_custkey, CAST(rank AS BIGINT) AS rank, s_suppkey,
       |  CAST(d2 AS BIGINT) AS d2
       |FROM r WHERE rank <= 3
       |ORDER BY c_custkey, rank""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q273_grid_radius_join" -> ((q273 _, Some(q273Sql))),
    "q276_spatial_knn_join" -> ((q276 _, Some(q276Sql))))
}
