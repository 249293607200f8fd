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
  * MERGE carries the full Delta-style clause surface: any number of
  * conditional WHEN MATCHED UPDATE/DELETE clauses (first matching clause
  * wins, per SQL), any number of WHEN NOT MATCHED INSERT clauses, and
  * WHEN NOT MATCHED BY SOURCE UPDATE/DELETE (target rows with no source
  * match; an unconditional clause touches every file by construction).
  *
  * Scope (refused loudly, never silently misplanned): MERGE needs an
  * equality-conjunction ON clause (the file-granular path keys on it),
  * no schema evolution through SQL; nested-field SET targets are refused;
  * DML against a time-travel resolution is refused like the write path. */
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
        // Vector routing (Delta's DV-write mode, opted in per table):
        // with `graft.dml.useVectors=true` + `graft.keys=k1[,k2]` in
        // TBLPROPERTIES, DELETE commits the matching rows' KEY VALUES as
        // a delete vector — a metadata-sized commit instead of a CoW
        // rewrite (a one-row GDPR erasure on a 100 TB table writes one
        // tiny file; MorScan keeps the table readable; compaction
        // materializes later). The policy travels WITH the table.
        val props = GraftSqlTable.storedProps(tbl.tableDir)
        if (props.get("graft.dml.useVectors").contains("true")) {
          val keys = props.getOrElse("graft.keys",
            throw new IllegalArgumentException(
              "graft.dml.useVectors=true needs graft.keys='k1[,k2]' in " +
                "TBLPROPERTIES (the vector's anti-join key columns)"))
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          GraftDeleteVectorCommand(tbl.tableDir,
            ColumnBridge.expression(toCol(cond, bareNames(target))).sql, keys)
        } else
          // the declared schema rides along for the same reason as
          // UPDATE's: after a metadata-only ADD COLUMN the touched files
          // mix schemas, and the rewrite must merge footers (not
          // single-footer-infer) or files that DO store the added column
          // would lose its values
          GraftDeleteCommand(tbl.tableDir,
            toCol(cond, bareNames(target)), declaredSchema(target))
      }
    case UpdateTable(target, assignments, cond) =>
      graftTable(target).fold(plan) { tbl =>
        requireWritable(tbl, "UPDATE")
        val names = bareNames(target)
        val sets = collectSets(assignments, names, names, "UPDATE")
        val props = GraftSqlTable.storedProps(tbl.tableDir)
        if (props.get("graft.dml.useVectors").contains("true")) {
          // vector routing, the UPDATE half of the DELETE policy above:
          // one atomic `U` commit carries the key vector + replacement
          // rows ([[TxnLog.update]]) — a one-row update writes one key
          // file + one row file, no touched-file rewrite. The replacement
          // rows land at read()'s width (metadata-ADDed columns reconcile
          // to NULL by name, like every other file that predates them).
          val keys = props.getOrElse("graft.keys",
            throw new IllegalArgumentException(
              "graft.dml.useVectors=true needs graft.keys='k1[,k2]' in " +
                "TBLPROPERTIES (the vector's anti-join key columns)"))
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          GraftUpdateVectorCommand(tbl.tableDir,
            cond.map(c => ColumnBridge.expression(toCol(c, names)).sql)
              .getOrElse("true"),
            sets.map { case (c, v) => c -> ColumnBridge.expression(v).sql },
            keys)
        } else
          // the statement's resolved schema rides along: after a
          // metadata-only ADD COLUMN the touched files may predate the
          // column, and the rewrite must serve (and write) the table's
          // declared width — this is how `UPDATE ... SET newcol = ...`
          // BACKFILLS a column added without rewriting anything
          GraftUpdateCommand(tbl.tableDir, sets,
            cond.map(toCol(_, names)).getOrElse(lit(true)), declaredSchema(target))
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

  /** The statement's resolved view of the target table. */
  private def declaredSchema(p: LogicalPlan): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(p.output.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))

  /** SET assignments → (column, value) pairs. Analysis aligns assignments
    * to the full schema with identity entries for untouched columns —
    * those drop; real SETs keep. A key that is not a top-level column
    * (nested-field assignment, `SET s.x = 1`) is REFUSED loudly — the
    * file-granular rewrite sets whole columns, and silently dropping the
    * assignment would partially apply the statement. */
  private def collectSets(assignments: Seq[Assignment],
                          keyNames: Map[ExprId, String],
                          scopeNames: Map[ExprId, String],
                          stmt: String): Seq[(String, Column)] =
    assignments.flatMap {
      case Assignment(k: AttributeReference, v) =>
        if (v.semanticEquals(k)) None
        else Some(keyNames(k.exprId) -> toCol(v, scopeNames))
      case a => throw new IllegalArgumentException(
        s"$stmt SET target must be a top-level column of the graft table, " +
          s"got: ${a.key.sql} (nested-field assignment is not supported)")
    }

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

    // the full Delta-style clause surface, preserved in statement order —
    // MergeGrammar encodes first-matching-clause-wins within each family
    def rowClause(a: org.apache.spark.sql.catalyst.plans.logical.MergeAction,
                  family: String): (Option[Column], Option[Seq[(String, Column)]]) =
      a match {
        case d: DeleteAction =>
          (d.condition.map(toCol(_, names)), None)
        case u: UpdateAction =>
          (u.condition.map(toCol(_, names)),
            Some(collectSets(u.assignments, tNames, names, s"MERGE $family UPDATE")))
        case other => throw new IllegalArgumentException(
          s"unsupported $family action on graft tables: $other")
      }
    val matched = m.matchedActions.map(rowClause(_, "WHEN MATCHED"))
    // BY SOURCE conditions/SETs see target columns only (the analyzer
    // refuses source references there) — the bare tNames scope enforces it
    val bySource = m.notMatchedBySourceActions.map {
      case d: DeleteAction =>
        (d.condition.map(toCol(_, tNames)), None)
      case u: UpdateAction =>
        (u.condition.map(toCol(_, tNames)),
          Some(collectSets(u.assignments, tNames, tNames,
            "MERGE WHEN NOT MATCHED BY SOURCE UPDATE")))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED BY SOURCE action on graft tables: $other")
    }
    val inserts = m.notMatchedActions.map {
      case ia: InsertAction =>
        (ia.condition.map(toCol(_, names)),
          ia.assignments.map {
            case Assignment(k: AttributeReference, v) =>
              tNames(k.exprId) -> toCol(v, names)
            case a => throw new IllegalArgumentException(
              s"unsupported INSERT assignment target: ${a.key.sql}")
          })
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED action on graft tables: $other")
    }

    GraftMergeCommand(tbl.tableDir, m.sourceTable, srcFinalNames,
      keyPairs.map(_._1.name).distinct,
      TxnLog.MergeGrammar(
        matched = matched,
        notMatched = inserts,
        notMatchedBySource = bySource),
      declaredSchema(m.targetTable))
  }
}

/** `DELETE FROM <graft table> WHERE p` — file-granular CoW delete. The
  * declared schema rides along so the rewrite merges footers on a
  * mixed-schema (post-ADD-COLUMN) table instead of single-footer
  * inference silently dropping stored values of the added column. */
case class GraftDeleteCommand(dir: String, cond: Column,
                              declared: org.apache.spark.sql.types.StructType)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    TxnLog.deleteWhere(session, dir, cond, widenTo = Some(declared),
      partitionBy = GraftSqlTable.storedPartCols(dir))
    Seq.empty
  }
}

/** `DELETE FROM <graft table> WHERE p` under the table's
  * `graft.dml.useVectors` policy — merge-on-read: commits the matching
  * rows' distinct key values ([[TxnLog.deleteVector]]) instead of
  * rewriting files. */
case class GraftDeleteVectorCommand(dir: String, predicate: String,
                                    keys: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    TxnLog.deleteVector(session, dir, predicate, keys)
    Seq.empty
  }
}

/** `UPDATE <graft table> SET ... WHERE p` under `graft.dml.useVectors`
  * — atomic merge-on-read update ([[TxnLog.update]]): one `U` commit
  * carries the key vector and the replacement rows. */
case class GraftUpdateVectorCommand(dir: String, predicate: String,
                                    set: Seq[(String, String)],
                                    keys: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    TxnLog.update(session, dir, predicate, set, keys)
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
      TxnLog.updateWhere(session, dir, set, cond, widenTo = Some(declared),
        partitionBy = GraftSqlTable.storedPartCols(dir))
    Seq.empty
  }
}

/** `MERGE INTO <graft table> USING src ON ... WHEN ...` — the source plan
  * executes at run time (its columns renamed so each merge key carries
  * the target's name), then the grammar drives the file-granular merge. */
case class GraftMergeCommand(dir: String, sourcePlan: LogicalPlan,
                             srcNames: Seq[String], keyCols: Seq[String],
                             grammar: TxnLog.MergeGrammar,
                             declared: org.apache.spark.sql.types.StructType)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(sourcePlan)
  override def run(session: SparkSession): Seq[Row] = {
    val src = ColumnBridge.ofRows(session, sourcePlan).toDF(srcNames: _*)
    TxnLog.mergeGrammar(session, dir, src, keyCols, grammar,
      widenTo = Some(declared),
      partitionBy = GraftSqlTable.storedPartCols(dir))
    Seq.empty
  }
}
