package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator surface: one entry per implemented
  * operator from SURVEY.md §2 (plus the LLM-data-pipeline extensions). Each
  * entry with SQL in `oracleSql` is hash-compared against DuckDB at sf0.01;
  * entries without SQL get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped exact aggregation over lineitem (SURVEY §7.3). */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_tpch_q1")(spark, "/root/testdata/sf0.001")

  private def allDefs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    graft.queries.Relational.defs ++
      graft.queries.Relational2.defs ++
      graft.queries.Relational3.defs ++
      graft.queries.Relational4.defs ++
      graft.queries.Relational5.defs ++
      graft.queries.Relational6.defs ++
      graft.queries.Relational7.defs ++
      graft.queries.Relational8.defs ++
      graft.queries.Relational9.defs ++
      graft.queries.TextOps.defs ++
      graft.queries.TextOps.defs2 ++
      graft.queries.DedupSim.defs ++
      graft.queries.DedupSim.defs2 ++
      graft.queries.LlmOps.defs ++
      graft.queries.DataOps.defs ++
      graft.queries.AnalyticsOps.defs ++
      graft.queries.LayoutOps.defs ++
      graft.queries.GovernOps.defs ++
      graft.queries.CorpusOps.defs ++
      graft.queries.TxnOps.defs ++
      graft.queries.SpatialOps.defs ++ // q273/q276 spatial family
      graft.queries.MvOps.defs ++      // q278 materialized-view routing
      graft.queries.CatalogOps.defs ++ // q289/q292 SQL catalog front door
      graft.queries.ImageQueries.defs ++ // q293/q294 image multimodal
      graft.queries.SqlFnOps.defs ++   // q305 SQL-function front door
      graft.queries.PipelineQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (k, (fn, _)) => k -> fn }

  def oracleSql: Map[String, String] =
    allDefs.collect { case (k, (_, Some(sql))) => k -> sql }
}
