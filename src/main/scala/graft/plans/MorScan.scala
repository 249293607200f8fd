package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Command, CreateTableAsSelect, DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, ReplaceTableAsSelect, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.io.TxnLog
import graft.sources.GraftSqlTable

/** MERGE-ON-READ SQL SCANS (Delta's deletion-vector read path): a catalog
  * table with PENDING delete / scoped-update vectors becomes readable
  * from plain SQL — `SELECT` serves the table's exact rowset by inlining
  * [[TxnLog.read]]'s plan (native parquet scan + broadcast-sized
  * anti-joins) in place of the DSv2 relation, instead of refusing until
  * a compact materializes the vectors. At 100 TB this is the difference
  * between "a one-row GDPR erasure makes the table unreadable until a
  * full rewrite" and "reads keep working; compaction is a background
  * concern".
  *
  * WHY AN ANALYSIS RULE: Spark's scan pushdown (`V2ScanRelationPushDown`)
  * runs in the optimizer BEFORE user-provided optimizer rules, and it is
  * the step that calls `newScanBuilder` — which must refuse a raw file
  * scan over vectored snapshots (serving deleted rows silently is the
  * one unacceptable outcome). Rewriting during RESOLUTION replaces the
  * relation before pushdown ever sees it. Sessions built without the
  * extensions keep the loud refusal — the documented fallback contract.
  *
  * Scope discipline:
  *   - DML statement roots pass through UNTOUCHED — [[SqlDml]] owns
  *     DELETE/UPDATE/MERGE lowering and matches the raw relation (the
  *     txn-log writers handle pending vectors themselves).
  *   - Write commands rewrite only their QUERY side (`InsertIntoStatement`
  *     holds the target relation as a child — rewriting a write TARGET
  *     into a read plan would corrupt the write).
  *   - A pending column mapping (rename/drop) still refuses: physical-
  *     name translation under arbitrary SQL stays the compact-first
  *     reader-version contract (q297).
  *
  * Attribute identity: the inlined plan's output realigns to the
  * relation's attributes BY NAME with the relation's own exprIds, so
  * every parent reference stays valid; a metadata-only ADDed column no
  * file stores yet serves NULL, exactly like the plain scan path. */
object MorScan extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case _: DeleteFromTable | _: UpdateTable | _: MergeIntoTable => plan
    case i: InsertIntoStatement => i.copy(query = rewriteIn(i.query))
    case c: CreateTableAsSelect => c.copy(query = rewriteIn(c.query))
    case r: ReplaceTableAsSelect => r.copy(query = rewriteIn(r.query))
    case w: V2WriteCommand => w.mapChildren(rewriteIn) // child = query only
    case c: Command => c // other commands: leave targets alone
    case p => rewriteIn(p)
  }

  // transformWithSubqueries, not transform: a vectored table referenced
  // only inside IN/EXISTS/scalar subqueries must inline too, or the
  // advertised "vectored tables readable from SQL" contract breaks with
  // the raw-scan refusal exactly when the reference hides in a subquery
  private def rewriteIn(plan: LogicalPlan): LogicalPlan =
    plan.transformWithSubqueries {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftSqlTable if g.vectorMergeOnRead => inline(r, g)
        case _ => r
      }
    }

  private def inline(r: DataSourceV2Relation, g: GraftSqlTable): LogicalPlan = {
    val spark = SparkSession.active
    val mor = TxnLog.read(spark, g.tableDir, g.timeTravel)
      .queryExecution.analyzed
    val res = spark.sessionState.conf.resolver
    Project(r.output.map { a =>
      mor.output.find(o => res(o.name, a.name)) match {
        case Some(src) =>
          val e = if (src.dataType == a.dataType) src else Cast(src, a.dataType)
          Alias(e, a.name)(exprId = a.exprId)
        case None => // metadata-only ADDed column: no file stores it yet
          Alias(Literal(null, a.dataType), a.name)(exprId = a.exprId)
      }
    }, mor)
  }
}
