package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType}

/** MATERIALIZED-VIEW REWRITE (the `injectOptimizerRule` extension point,
  * SURVEY §4): transparently answer aggregate queries over a fact table from
  * a precomputed aggregate table — the classic OLAP routing move (Oracle
  * query rewrite, Calcite/Hive `ALTER MV ... REBUILD`, BigQuery MV routing).
  * At 100 TB this is the difference between a full fact scan and a scan of a
  * few thousand MV rows: the rollup the user asks for nightly should never
  * touch the fact table twice.
  *
  * A registered [[MvDef]] declares: the base table (by its scan root path —
  * the one identity a LogicalPlan exposes), the MV's grouping keys, a row
  * count column, and SUM/MIN/MAX measure columns. The rule rewrites
  *
  * {{{ Aggregate(G, aggs, [Project] [Filter(p)] Scan(base)) }}}
  *
  * when (a) every grouping expression is a bare base-table column ⊆ MV keys,
  * (b) every filter predicate is deterministic and references only MV keys
  * (such a predicate COMMUTES with the grouping: it drops whole MV groups,
  * never rows within one), and (c) every aggregate is derivable from MV
  * partials:
  *
  *   - `COUNT(<non-null literal>)`  → `SUM(mv.cnt)`        (same LongType)
  *   - `COUNT(col)` / `COUNT(CAST(col AS t))` → `SUM(mv.cnt_col)` where the
  *     MV declares a per-group NON-NULL count partial for that column (an
  *     `agg = "cnt"` measure) — COUNT(*) cannot stand in, the base column
  *     may hold nulls the MV's row count would miscount
  *   - `SUM(col)` / `SUM(CAST(col AS t))` → `SUM(mv.sum_col)` re-aggregated,
  *     CAST back to the original result type (sum-of-sums widens decimal
  *     precision by 10; the values are the same numbers, so the cast is
  *     exact) — SUM is what makes rollup-from-partials sound: a sum of
  *     group sums is the group sum of the coarser grouping
  *   - `AVG(col)` → `SUM(mv.sum_col) / SUM(mv.cnt_col)` when BOTH partials
  *     are declared, through a division tree mirroring `Average`'s own
  *     `evaluateExpression` node-for-node (same operand types, same
  *     `Divide` eval mode). Rounding contract, stated precisely: for
  *     DECIMAL children both paths are exact — bit-identical always. For
  *     long/double children Spark's own Average accumulates a DOUBLE
  *     buffer in partition order, so its direct result is itself
  *     order-dependent once intermediate sums leave exact-double range
  *     (> 2⁵³ for longs, any rounding for doubles); the derived value is
  *     the correctly-rounded quotient of the EXACT declared partials —
  *     inside exact-double range the two coincide bit-for-bit (the
  *     oracle-gated q278 case), beyond it the rewrite is at least as
  *     accurate as any one ordering of the direct plan, not a bit-copy
  *     of one particular run
  *   - `MIN(col)` / `MAX(col)`      → `MIN(mv.min_col)` / `MAX(mv.max_col)`
  *
  * A GLOBAL aggregate (empty GROUP BY) whose key predicate matches no MV
  * group must still return a row: COUNT over the base is 0 there, but SUM
  * over zero MV rows is NULL — so derived counts are wrapped in
  * `coalesce(..., 0)` exactly when the grouping is empty (grouped
  * aggregates just drop the group, matching the base).
  *
  * Anything else — DISTINCT aggregates, FILTER clauses, expressions over
  * group keys, predicates on non-key columns — leaves the plan untouched:
  * the rewrite is strictly opt-in per shape, never lossy.
  *
  * Output attribute `ExprId`s are PINNED to the original aggregate's output
  * (aliases re-use the original ids), so every parent operator — the
  * post-aggregation casts, sorts, unions of a real query — resolves against
  * the rewritten node byte-identically.
  *
  * Freshness is the registrant's contract (register the MV, run, clear —
  * the board query rebuilds the MV immediately before registering; a
  * production deployment pairs this with the incremental-view maintenance
  * family, q202/q209/q231, to keep MV partials current). The registry is
  * empty outside an explicit registration window, making the rule a no-op
  * for every other query on the session.
  */
object MvRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** One derivable measure: `agg(baseCol)` (optionally through a cast to
    * `castTo`) is answered by re-aggregating MV column `mvCol`. */
  final case class MvMeasure(agg: String, baseCol: String,
                             castTo: Option[DataType], mvCol: String)

  /** A registered materialized view over `basePath` (the base table's scan
    * root path), stored at `mvPath`, grouped by `keys`, with a COUNT(*)
    * partial in `cntCol` and SUM/MIN/MAX partials in `measures`. The MV
    * must have been built over the FULL base table (no filter) — that is
    * what makes key-predicate commuting and rollup re-aggregation sound.
    *
    * `exactRoots` is the MULTI-FILE form (a txn-log table read is a scan
    * over the snapshot's file list, not one directory): when set, the
    * rewrite fires only on a scan whose root-path set EQUALS it — the
    * file set doubles as the FRESHNESS TOKEN, since any commit changes
    * the visible files and silently un-matches a stale MV. */
  final case class MvDef(basePath: String, mvPath: String, keys: Seq[String],
                         cntCol: String, measures: Seq[MvMeasure],
                         exactRoots: Option[Set[String]] = None)

  /** Several MVs may cover one base (a grouping LATTICE — the (rf) rollup
    * next to the (rf, ls) one); candidates are tried coarsest-first, so a
    * query grouped by (rf) is answered from the rf-grained MV when both
    * are eligible — fewer MV rows, same answer. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, List[MvDef]]()

  /** Normalized path identity: scheme-free absolute path, so
    * `/x/lineitem.parquet` and `file:/x/lineitem.parquet` match. */
  private def norm(p: String): String = new org.apache.hadoop.fs.Path(p).toUri.getPath

  def register(d: MvDef): Unit =
    registry.merge(norm(d.basePath), List(d), (a, b) => b ::: a)
  def unregister(basePath: String): Unit = registry.remove(norm(basePath))
  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Strip attribute-only Projects and collect Filters down to a parquet
    * scan; anything else (joins, other relations, row-generating ops) bails. */
  private def stripToScan(p: LogicalPlan,
                          conds: Seq[Expression]): Option[(LogicalRelation, Seq[Expression])] =
    p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        stripToScan(c, conds)
      case Filter(cond, c)  => stripToScan(c, conds ++ splitConjunctivePredicates(cond))
      case r: LogicalRelation => Some((r, conds))
      case _ => None
    }

  private def scanRoots(r: LogicalRelation): Option[Set[String]] = r.relation match {
    case fs: HadoopFsRelation if fs.location.rootPaths.nonEmpty =>
      Some(fs.location.rootPaths.map(p => norm(p.toString)).toSet)
    case _ => None
  }

  /** The registered MVs this scan is allowed to answer, COARSEST first
    * (fewest grouping keys = fewest MV rows): single-root defs match a
    * one-directory scan on the normalized path; exact-root defs match iff
    * the scan's file set EQUALS the registered snapshot's. */
  private def defsFor(roots: Set[String]): Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    val byPath =
      if (roots.size == 1)
        Option(registry.get(roots.head)).getOrElse(Nil).filter(_.exactRoots.isEmpty)
      else Nil
    val byFileSet = registry.values.asScala.flatten
      .filter(_.exactRoots.contains(roots)).toSeq
    (byPath ++ byFileSet).sortBy(_.keys.length)
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = for {
    (scan, conds) <- stripToScan(agg.child, Nil)
    roots         <- scanRoots(scan)
    rewritten     <- defsFor(roots).view
                       .flatMap(mv => rewriteOnto(agg, conds, mv)).headOption
  } yield rewritten

  private def rewriteOnto(agg: Aggregate, conds: Seq[Expression],
                          mv: MvDef): Option[LogicalPlan] = {
    val keySet = mv.keys.toSet

    // (a) bare key columns only in GROUP BY
    val groupAttrs: Seq[AttributeReference] = agg.groupingExpressions.map {
      case a: AttributeReference if keySet.contains(a.name) => a
      case _ => return None
    }
    // (b) deterministic key-only predicates (commute with the grouping)
    if (!conds.forall(c => c.deterministic &&
          c.references.forall(a => keySet.contains(a.name)))) return None

    // Fresh MV relation per rewrite: a query with several rewritable
    // aggregates (the board query unions three) must not share ExprIds
    // across subtrees.
    val mvPlan = SparkSession.active.read.parquet(mv.mvPath).queryExecution.analyzed
    def mvAttr(name: String): Option[Attribute] = mvPlan.output.find(_.name == name)

    def measureFor(fn: String, child: Expression): Option[Attribute] = {
      val (col, cast) = child match {
        case a: AttributeReference => (a.name, None)
        case c: Cast => c.child match {
          case a: AttributeReference => (a.name, Some(c.dataType))
          case _ => return None
        }
        case _ => return None
      }
      mv.measures.find(m => m.agg == fn && m.baseCol == col && m.castTo == cast)
        .flatMap(m => mvAttr(m.mvCol))
    }

    /** A derived count: SUM over MV count partials. Per MV group the SUM
      * is never null (MV groups are non-empty) — but a GLOBAL aggregate
      * whose filter dropped every MV group sums zero rows → NULL, where
      * COUNT over the base says 0. Coalesce exactly in that shape. */
    def countFrom(ae: AggregateExpression, cntAttr: Attribute): Expression = {
      val summed: Expression = ae.copy(aggregateFunction = Sum(cntAttr),
                                       resultId = NamedExpression.newExprId)
      if (agg.groupingExpressions.isEmpty) Coalesce(Seq(summed, Literal(0L)))
      else summed
    }

    /** Derive one aggregate call from MV partials, or None. */
    def derive(ae: AggregateExpression): Option[Expression] = {
      if (ae.mode != Complete || ae.isDistinct || ae.filter.nonEmpty) return None
      ae.aggregateFunction match {
        case c: Count if c.children.nonEmpty &&
            c.children.forall(ch => ch.foldable && ch.eval(EmptyRow) != null) =>
          // COUNT of rows → SUM of per-group counts (LongType both ways)
          mvAttr(mv.cntCol).map(countFrom(ae, _))
        case c: Count if c.children.sizeIs == 1 =>
          // COUNT(col): needs the column's declared NON-NULL count partial
          // (COUNT(*) would miscount if the base column holds nulls)
          measureFor("cnt", c.children.head).map(countFrom(ae, _))
        case av: Average =>
          // AVG(col) = SUM(sum partials) / SUM(count partials), through a
          // division tree mirroring Average.evaluateExpression — same
          // operand types, same LEGACY Divide. Decimal children: exact =
          // bit-identical. Long/double children: exact partials, so
          // identical inside exact-double range and strictly better-
          // conditioned beyond it, where Spark's own double buffer is
          // partition-order-dependent (contract in the header). Empty-
          // group behavior matches for free: AVG over no rows is NULL on
          // both paths.
          for {
            sumAttr <- measureFor("sum", av.child)
            cntAttr <- measureFor("cnt", av.child)
          } yield {
            def sumAgg(a: Attribute) =
              ae.copy(aggregateFunction = Sum(a),
                      resultId = NamedExpression.newExprId)
            av.child.dataType match {
              case dt: DecimalType =>
                val (p, s) = (dt.precision, dt.scale)
                // Average's internal sum buffer is Decimal(p+10, s); our
                // sum-of-sums widens further, so cast back (exact — it is
                // the same total Average itself would hold)
                val sumT = DecimalType(math.min(p + 10, DecimalType.MAX_PRECISION), s)
                Cast(Divide(Cast(sumAgg(sumAttr), sumT),
                            Cast(sumAgg(cntAttr), DecimalType(20, 0)),
                            EvalMode.LEGACY),
                     av.dataType)
              case _ =>
                Divide(Cast(sumAgg(sumAttr), DoubleType),
                       Cast(sumAgg(cntAttr), DoubleType), EvalMode.LEGACY)
            }
          }
        case s: Sum =>
          measureFor("sum", s.child).map { m =>
            val re = ae.copy(aggregateFunction = s.copy(child = m),
                             resultId = NamedExpression.newExprId)
            // sum-of-sums widens decimals; cast back to the query's type
            if (re.dataType == ae.dataType) re else Cast(re, ae.dataType)
          }
        case mn: Min =>
          measureFor("min", mn.child).map(m =>
            ae.copy(aggregateFunction = Min(m),
                    resultId = NamedExpression.newExprId))
        case mx: Max =>
          measureFor("max", mx.child).map(m =>
            ae.copy(aggregateFunction = Max(m),
                    resultId = NamedExpression.newExprId))
        case _ => None
      }
    }

    // (c) every output expression derivable: each output is an arbitrary
    // deterministic tree over aggregate calls and group-key references
    // (e.g. `CAST(SUM(...) AS DOUBLE)`) — translate bottom-up, bailing on
    // the first underivable node.
    final class BailException extends RuntimeException
    def translate(e: Expression): Expression = e match {
      case ae: AggregateExpression =>
        derive(ae).getOrElse(throw new BailException)
      case a: AttributeReference if keySet.contains(a.name) =>
        mvAttr(a.name).getOrElse(throw new BailException)
      case _: AttributeReference => throw new BailException
      case other if other.deterministic =>
        other.withNewChildren(other.children.map(translate))
      case _ => throw new BailException
    }
    val newAggExprs: Seq[NamedExpression] =
      try agg.aggregateExpressions.map {
        case a: AttributeReference if keySet.contains(a.name) =>
          Alias(mvAttr(a.name).getOrElse(return None), a.name)(exprId = a.exprId)
        case al @ Alias(child, name) =>
          Alias(translate(child), name)(exprId = al.exprId)
        case _ => return None
      } catch { case _: BailException => return None }

    val remap: Expression => Expression = _.transform {
      case a: AttributeReference => mvAttr(a.name).getOrElse(return None)
    }
    val newGroup = groupAttrs.map(a => mvAttr(a.name).getOrElse(return None))
    val filtered = conds.foldLeft(mvPlan)((p, c) => Filter(remap(c), p))
    // prune the MV scan to what the rewritten aggregate touches (this rule
    // runs after the main optimizer's column pruning, so do it here)
    val needed = (newGroup ++ newAggExprs.flatMap(_.references) ++
      conds.flatMap(c => remap(c).references)).map(_.exprId).toSet
    val pruned = Project(mvPlan.output.filter(a => needed.contains(a.exprId)), filtered)
    Some(Aggregate(newGroup, newAggExprs, pruned))
  }
}
