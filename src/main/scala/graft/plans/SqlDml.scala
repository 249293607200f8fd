package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions.{coalesce, lit, not}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.io.TxnLog
import graft.sources.GraftSqlTable

/** SQL row-level DML over the engine's txn-log tables — the statement
  * half of the SQL front door ([[graft.sources.GraftCatalog]] is the
  * query half). Lowers the three resolved DML plans on a catalog table
  * to the TxnLog primitives, the way Delta's analysis rules lower the
  * same statements to its own commands:
  *
  *   - `DELETE FROM g.db.t WHERE p`  → [[TxnLog.deleteWhere]] (file-
  *     granular CoW: only files containing a matching row rewrite)
  *   - `UPDATE g.db.t SET ... WHERE p` → [[TxnLog.updateWhere]] (same
  *     touched-file discovery; simultaneous SETs)
  *   - `MERGE INTO g.db.t USING s ON ... WHEN ...` →
  *     [[TxnLog.mergeGrammar]] (one semi-join finds touched files; `X`
  *     exchange; duplicate source keys refused loudly)
  *
  * Registered like the other plan rewrites: post-build through
  * `spark.experimental.extraOptimizations` ([[SqlDml.ensure]], idempotent
  * — no session-build config needed) or at build time via
  * `GraftExtensions`. The optimizer phase is the right hook: Spark's own
  * row-level machinery only claims these plans for tables implementing
  * `SupportsRowLevelOperations`, so they reach the user batch intact, and
  * the planner (where "table does not support deletes" would otherwise
  * throw) never sees them.
  *
  * Scope (refused loudly, never silently misplanned): MERGE needs an
  * equality-conjunction ON clause (the file-granular path keys on it), at
  * most one UPDATE and one DELETE among the matched clauses (their SQL
  * first-clause-wins order is encoded into the grammar), no
  * NOT MATCHED BY SOURCE clauses, no schema evolution; DML against a
  * time-travel resolution is refused like the write path. */
object SqlDml extends Rule[LogicalPlan] {

  /** Idempotent post-build injection (the TopKStrategy pattern). */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(SqlDml)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SqlDml
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case DeleteFromTable(target, cond) =>
      graftTable(target).fold(plan) { tbl =>
        requireWritable(tbl, "DELETE")
        GraftDeleteCommand(tbl.tableDir,
          toCol(cond, bareNames(target)))
      }
    case UpdateTable(target, assignments, cond) =>
      graftTable(target).fold(plan) { tbl =>
        requireWritable(tbl, "UPDATE")
        val names = bareNames(target)
        // analysis aligns assignments to the full schema with identity
        // entries for untouched columns — drop those, keep real SETs
        val sets = assignments.collect {
          case Assignment(k: AttributeReference, v) if !v.semanticEquals(k) =>
            names(k.exprId) -> toCol(v, names)
        }
        // the statement's resolved schema rides along: after a
        // metadata-only ADD COLUMN the touched files may predate the
        // column, and the rewrite must serve (and write) the table's
        // declared width — this is how `UPDATE ... SET newcol = ...`
        // BACKFILLS a column added without rewriting anything
        val declared = org.apache.spark.sql.types.StructType(target.output.map(a =>
          org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
        GraftUpdateCommand(tbl.tableDir, sets,
          cond.map(toCol(_, names)).getOrElse(lit(true)), declared)
      }
    case m: MergeIntoTable =>
      graftTable(m.targetTable).fold(plan) { tbl =>
        requireWritable(tbl, "MERGE INTO")
        lowerMerge(m, tbl)
      }
    case _ => plan
  }

  // ------------------------------------------------------------------
  // plan shape helpers
  // ------------------------------------------------------------------

  /** The target of a resolved DML statement, when it is a graft catalog
    * table — tolerant of aliases and of the scan-pushdown rewrite that
    * may have run before the user batch. */
  private def graftTable(p: LogicalPlan): Option[GraftSqlTable] = p match {
    case SubqueryAlias(_, child)      => graftTable(child)
    case r: DataSourceV2Relation      => asGraft(r.table)
    case s: DataSourceV2ScanRelation  => asGraft(s.relation.table)
    case _                            => None
  }
  private def asGraft(t: AnyRef): Option[GraftSqlTable] = t match {
    case g: GraftSqlTable => Some(g)
    case _                => None
  }

  /** DML needs a writable head resolution, never a pinned snapshot. */
  private[graft] def requireWritable(tbl: GraftSqlTable, stmt: String): Unit =
    require(tbl.timeTravel.isEmpty,
      s"$stmt against a time-travel snapshot is not allowed (resolve the " +
        "table without VERSION/TIMESTAMP AS OF)")

  private def bareNames(p: LogicalPlan): Map[ExprId, String] =
    p.output.map(a => a.exprId -> a.name).toMap

  /** Resolved expression → Column over the rewrite's column scope: every
    * attribute re-anchors by name (bare target names, `src_`-prefixed
    * source names), everything else — casts, functions, literals — rides
    * along unchanged. */
  private def toCol(e: Expression, names: Map[ExprId, String]): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference =>
        UnresolvedAttribute.quoted(names.getOrElse(a.exprId,
          throw new IllegalArgumentException(
            s"SQL DML references a column outside the statement's scope: $a")))
    })

  // ------------------------------------------------------------------
  // MERGE lowering
  // ------------------------------------------------------------------

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  private def lowerMerge(m: MergeIntoTable, tbl: GraftSqlTable): LogicalPlan = {
    require(m.notMatchedBySourceActions.isEmpty,
      "MERGE ... WHEN NOT MATCHED BY SOURCE is not supported on graft " +
        "tables (express it as a separate DELETE/UPDATE statement)")
    require(!m.withSchemaEvolution,
      "MERGE WITH SCHEMA EVOLUTION is not supported through SQL (use " +
        "TxnLog.merge(evolveSchema = true))")
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet

    // ON must be an equality conjunction target-col = source-col: that is
    // what keys the one-semi-join touched-file discovery. Each pair's key
    // takes the TARGET name; the source column renames to match. The
    // analyzer wraps a narrower side in a coercion Cast — strip it; the
    // grammar's own key equality re-coerces identically.
    def bare(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => bare(c.child)
      case x => x
    }
    val keyPairs = conjuncts(m.mergeCondition).map(c => (c, c)).map {
      case (EqualTo(l, r), orig) => (bare(l), bare(r), orig)
      case (other, _) => throw new IllegalArgumentException(
        "MERGE ON must be a conjunction of target-column = source-column " +
          s"equalities for graft tables, got: ${other.sql}")
    }.map {
      case (a: AttributeReference, b: AttributeReference, _)
          if tOut.contains(a) && sOut.contains(b) => (a, b)
      case (b: AttributeReference, a: AttributeReference, _)
          if tOut.contains(a) && sOut.contains(b) => (a, b)
      case (_, _, orig) => throw new IllegalArgumentException(
        "MERGE ON must be a conjunction of target-column = source-column " +
          s"equalities for graft tables, got: ${orig.sql}")
    }
    val keyRename = keyPairs.map { case (t, s) => s.exprId -> t.name }.toMap
    val srcFinalNames = m.sourceTable.output.map(a =>
      keyRename.getOrElse(a.exprId, a.name))
    require(srcFinalNames.distinct.size == srcFinalNames.size,
      s"MERGE source columns collide after key renaming: $srcFinalNames")
    val tNames = bareNames(m.targetTable)
    val sNames = m.sourceTable.output.zip(srcFinalNames)
      .map { case (a, n) => a.exprId -> s"src_$n" }.toMap
    val names = tNames ++ sNames

    // matched clauses: at most one UPDATE and one DELETE; SQL applies the
    // FIRST matching clause, so when UPDATE precedes DELETE the delete
    // condition picks up "and not the update's"
    val (updates, others) = m.matchedActions.partition(_.isInstanceOf[UpdateAction])
    val deletes = others.map {
      case d: DeleteAction => d
      case a => throw new IllegalArgumentException(
        s"unsupported WHEN MATCHED action on graft tables: $a")
    }
    require(updates.size <= 1 && deletes.size <= 1,
      "at most one WHEN MATCHED UPDATE and one WHEN MATCHED DELETE clause " +
        "is supported on graft tables")
    val upd = updates.headOption.map(_.asInstanceOf[UpdateAction])
    val del = deletes.headOption
    val updWhen = upd.flatMap(_.condition).map(toCol(_, names))
    val delWhen = del.map { d =>
      val own = d.condition.map(toCol(_, names)).getOrElse(lit(true))
      val updateFirst = upd.exists(u =>
        m.matchedActions.indexOf(u) < m.matchedActions.indexOf(d))
      if (updateFirst)
        own && not(coalesce(updWhen.getOrElse(lit(true)), lit(false)))
      else own
    }
    val updSet = upd.map(_.assignments.collect {
      case Assignment(k: AttributeReference, v) if !v.semanticEquals(k) =>
        tNames(k.exprId) -> toCol(v, names)
    })

    val ins = m.notMatchedActions match {
      case Seq()                  => None
      case Seq(ia: InsertAction)  =>
        Some((ia.condition.map(toCol(_, names)),
          ia.assignments.map {
            case Assignment(k: AttributeReference, v) =>
              tNames(k.exprId) -> toCol(v, names)
            case a => throw new IllegalArgumentException(
              s"unsupported INSERT assignment target: ${a.key.sql}")
          }))
      case as => throw new IllegalArgumentException(
        s"at most one WHEN NOT MATCHED INSERT clause is supported, got ${as.size}")
    }

    GraftMergeCommand(tbl.tableDir, m.sourceTable, srcFinalNames,
      keyPairs.map(_._1.name).distinct,
      TxnLog.MergeGrammar(
        deleteWhen = delWhen,
        updateWhen = updWhen,
        updateSet = updSet.filter(_.nonEmpty),
        insert = ins))
  }
}

/** `DELETE FROM <graft table> WHERE p` — file-granular CoW delete. */
case class GraftDeleteCommand(dir: String, cond: Column)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    TxnLog.deleteWhere(session, dir, cond)
    Seq.empty
  }
}

/** `UPDATE <graft table> SET ... WHERE p` — file-granular CoW update,
  * serving (and writing) the statement's declared schema so it can
  * backfill metadata-added columns. */
case class GraftUpdateCommand(dir: String, set: Seq[(String, Column)],
                              cond: Column,
                              declared: org.apache.spark.sql.types.StructType)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (set.nonEmpty)
      TxnLog.updateWhere(session, dir, set, cond, widenTo = Some(declared))
    Seq.empty
  }
}

/** `MERGE INTO <graft table> USING src ON ... WHEN ...` — the source plan
  * executes at run time (its columns renamed so each merge key carries
  * the target's name), then the grammar drives the file-granular merge. */
case class GraftMergeCommand(dir: String, sourcePlan: LogicalPlan,
                             srcNames: Seq[String], keyCols: Seq[String],
                             grammar: TxnLog.MergeGrammar)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(sourcePlan)
  override def run(session: SparkSession): Seq[Row] = {
    val src = ColumnBridge.ofRows(session, sourcePlan).toDF(srcNames: _*)
    TxnLog.mergeGrammar(session, dir, src, keyCols, grammar)
    Seq.empty
  }
}
