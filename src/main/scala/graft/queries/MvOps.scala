package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.plans.MvRewrite
import graft.plans.MvRewrite.{MvDef, MvMeasure}

/** Materialized-view query routing (q278): the optimizer-rule surface that
  * answers fact-table aggregations from a precomputed aggregate table —
  * see [[graft.plans.MvRewrite]] for the rewrite rule itself.
  *
  * The board entry builds a (l_returnflag, l_linestatus) MV over lineitem
  * (COUNT + decimal SUM(l_quantity) + MIN/MAX(l_extendedprice) partials),
  * registers it, and probes the three rewrite shapes that make MV routing
  * useful plus one negative control:
  *
  *   - `exact`:    the MV's own grouping — answered row-for-row from the MV
  *   - `rollup`:   a COARSER grouping (l_returnflag only) — COUNT re-sums
  *                 cnt, SUM re-sums sum partials, MIN/MAX re-fold extrema;
  *                 the algebra that makes one MV serve a grouping lattice
  *   - `filtered`: a key-column predicate — commutes through the grouping,
  *                 so it prunes MV GROUPS (at scale: partition-pruned MV
  *                 files), never fact rows
  *   - `control`:  aggregates NOT covered by the MV (sum of l_discount,
  *                 max of l_tax) — the rule must leave the plan alone
  *
  * Each face carries `mv_used`, read FROM THE OPTIMIZED PLAN (does it scan
  * the MV path and not the base path?), and the oracle states TRUE for the
  * three rewritable faces and FALSE for the control — so both the routing
  * decision and the rewritten results are hash-gated against DuckDB
  * computing every face directly over lineitem.
  *
  * Scale shape: the three rewritten faces aggregate the ≤ |rf×ls| = 6-row
  * MV — the fact table is scanned ONCE (to build the MV), not four times;
  * on a 100 TB deployment the MV build is amortized across every dashboard
  * query in the grouping lattice, kept current by the incremental-view
  * machinery (q202/q209/q231).
  */
object MvOps {

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Seq.empty[String]
      }
    }.flatten

  def q278(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d) // also ensures the rule is live on s
    val basePath = s"$d/lineitem.parquet"
    val mvDir = java.nio.file.Files.createTempDirectory("graft_q278_mv").toString
    val mvPath = s"$mvDir/mv"

    val dec = DecimalType(18, 4)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("l_quantity").cast(dec)).as("sum_qty"),
           min(col("l_extendedprice")).as("min_price"),
           max(col("l_extendedprice")).as("max_price"))
      .coalesce(1).write.mode("overwrite").parquet(mvPath)

    MvRewrite.register(MvDef(
      basePath = basePath, mvPath = mvPath,
      keys = Seq("l_returnflag", "l_linestatus"), cntCol = "cnt",
      measures = Seq(
        MvMeasure("sum", "l_quantity", Some(dec), "sum_qty"),
        MvMeasure("min", "l_extendedprice", None, "min_price"),
        MvMeasure("max", "l_extendedprice", None, "max_price"))))
    try {
      val exact = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
             max(col("l_extendedprice")).as("extreme"))
        .select(lit("exact").as("face"), col("l_returnflag").as("rf"),
                col("l_linestatus").as("ls"), col("n"), col("sum_qty"), col("extreme"))
      val rollup = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
             min(col("l_extendedprice")).as("extreme"))
        .select(lit("rollup").as("face"), col("l_returnflag").as("rf"),
                lit(null).cast("string").as("ls"), col("n"), col("sum_qty"), col("extreme"))
      val filtered = li.filter(col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
             max(col("l_extendedprice")).as("extreme"))
        .select(lit("filtered").as("face"), col("l_returnflag").as("rf"),
                lit(null).cast("string").as("ls"), col("n"), col("sum_qty"), col("extreme"))
      // negative control: sum/max of columns the MV does not carry —
      // the rule must refuse (a partial rewrite would be wrong)
      val control = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(col("l_discount").cast(dec)).cast("double").as("sum_qty"),
             max(col("l_tax")).as("extreme"))
        .select(lit("control").as("face"), col("l_returnflag").as("rf"),
                lit(null).cast("string").as("ls"), col("n"), col("sum_qty"), col("extreme"))

      // the routing decision, read from each face's optimized plan: the MV
      // path replaced the base path (or, for the control, did not)
      def routed(df: DataFrame): Boolean = {
        val ps = scanPaths(df)
        ps.contains(s"$mvPath") && !ps.exists(_.endsWith("lineitem.parquet"))
      }
      val faces = Seq(exact, rollup, filtered, control)
      val flags = faces.map(routed) // exact, rollup, filtered: true; control: false
      // EXECUTE inside the registration window — the returned DataFrame is
      // lazy, and the registry must not leak past this query (a later
      // aggregate on the same base path would silently route to a stale
      // MV). The faces are ≤ 15 aggregate rows (metadata-sized, the ledger
      // pattern): the real, MV-routed plans run HERE; the caller re-reads
      // a LocalRelation. A deployment keeps the MV registered session-wide
      // instead — this window-then-materialize is the board's hygiene.
      val tagged = faces.zip(flags).map { case (f, used) =>
        f.withColumn("mv_used", lit(used)) }
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      tagged.foreach(f => f.collect().foreach(rows.add))
      s.createDataFrame(rows, tagged.head.schema)
        .orderBy(col("face"), col("rf"), col("ls"))
    } finally MvRewrite.unregister(basePath)
  }

  val q278Sql: String =
    """SELECT * FROM (
      |  SELECT 'exact' AS face, l_returnflag AS rf, l_linestatus AS ls,
      |         COUNT(*) AS n,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |         MAX(l_extendedprice) AS extreme, TRUE AS mv_used
      |  FROM lineitem GROUP BY 2, 3
      |  UNION ALL
      |  SELECT 'rollup', l_returnflag, NULL, COUNT(*),
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE),
      |         MIN(l_extendedprice), TRUE
      |  FROM lineitem GROUP BY 2
      |  UNION ALL
      |  SELECT 'filtered', l_returnflag, NULL, COUNT(*),
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE),
      |         MAX(l_extendedprice), TRUE
      |  FROM lineitem WHERE l_linestatus = 'F' GROUP BY 2
      |  UNION ALL
      |  SELECT 'control', l_returnflag, NULL, COUNT(*),
      |         CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE),
      |         MAX(l_tax), FALSE
      |  FROM lineitem GROUP BY 2
      |) ORDER BY face, rf, ls""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q278_mv_rewrite" -> ((q278 _, Some(q278Sql))))
}
