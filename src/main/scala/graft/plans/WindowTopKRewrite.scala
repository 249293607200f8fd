package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Optimizer rule: accelerate the universal top-k-per-group idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W.partitionBy(g).orderBy(o)))
  *      .filter(col("rn") <= k) }}}
  *
  * by inserting the bounded-heap [[TopKPerGroup]] operator UNDER the Window:
  *
  * {{{ Filter(rn <= k, Window(row_number, g, o, child))
  *     ⇒ Filter(rn <= k, Window(row_number, g, o, TopKPerGroup(g, o, k, child))) }}}
  *
  * The heap pre-pass caps what the exchange carries at keys × k rows per
  * input partition and what the window sorts at k rows per key; the Window
  * node is KEPT, re-ranking the ≤ k survivors, so the rank column and every
  * downstream reference are byte-identical to the unrewritten plan. Catalyst
  * inserts no extra exchange: the final heap's required distribution
  * (clustered on g) is exactly the Window's, so both ride one shuffle.
  *
  * Spark's own `InferWindowGroupLimit` (3.5+) already targets this idiom,
  * but its `WindowGroupLimitExec` declares `requiredChildOrdering` — each
  * map task fully SORTS its partition (spillably) before the streaming
  * limit. The heap needs no sort: O(n log k) comparisons and k rows of
  * state per key against sort's O(n log n) and n rows. When the built-in
  * rule has already placed a logical [[WindowGroupLimit]] under the Window,
  * this rule REPLACES it (same partition/order spec, row_number only) —
  * stacking both would sort anyway and limit twice.
  *
  * Fires only on `row_number` — for `rank`/`dense_rank` a k-bounded heap
  * could drop tied rows that rank within k, changing the result. With a
  * non-total ordering the rewritten plan picks the same *class* of valid
  * top-k answer as the window formulation (both tie-break arbitrarily);
  * with a total ordering (every oracle-gated query here) it is exact.
  *
  * k is capped: the heap holds keys-per-task × k rows outside the task
  * memory manager (TopKPerGroup's documented contract, no spill path), so
  * a huge-k filter keeps the spillable sort instead.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Above this the full-sort formulation (which spills) is the safer plan. */
  private val MaxK = 1024L

  /** The filter-side rank attribute, possibly re-cast by comparison coercion. */
  private def isRank(e: Expression, rn: Attribute): Boolean = e match {
    case a: Attribute => a.exprId == rn.exprId
    case c: Cast      => isRank(c.child, rn)
    case _            => false
  }

  private def intLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType)  => Some(v.toLong)
    case Literal(v: Long, LongType)    => Some(v)
    case Literal(v: Short, ShortType)  => Some(v.toLong)
    case _                             => None
  }

  /** Tightest upper bound on rn among the top-level conjuncts, if any. */
  private def rankBound(cond: Expression, rn: Attribute): Option[Long] = {
    val bounds = splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(a, l) if isRank(a, rn)    => intLit(l)
      case LessThan(a, l) if isRank(a, rn)           => intLit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a) if isRank(a, rn) => intLit(l)
      case GreaterThan(l, a) if isRank(a, rn)        => intLit(l).map(_ - 1)
      case EqualTo(a, l) if isRank(a, rn)            => intLit(l)
      case EqualTo(l, a) if isRank(a, rn)            => intLit(l)
      case _                                         => None
    }
    if (bounds.isEmpty) None else Some(bounds.min)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
                   part, order, child, _))
        if part.nonEmpty && order.nonEmpty &&
           !child.isInstanceOf[TopKPerGroup] &&
           part.forall(_.deterministic) && order.forall(_.deterministic) =>
      rankBound(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 && k <= MaxK =>
          // subsume the built-in group-limit if InferWindowGroupLimit got
          // here first: its sort-then-limit is what the heap replaces. Its
          // limit can only be the same bound (both rules read one filter),
          // but take the min defensively.
          val (core, kk) = child match {
            case wgl @ WindowGroupLimit(ps, os, _: RowNumber, limit, grandchild)
                if ps.length == part.length && os.length == order.length &&
                   ps.zip(part).forall { case (a, b) => a.semanticEquals(b) } &&
                   os.zip(order).forall { case (a, b) => a.semanticEquals(b) } =>
              (grandchild, math.min(k, limit.toLong))
            case c => (c, k)
          }
          f.copy(child = w.copy(child = TopKPerGroup(part, order, kk.toInt, core)))
        case _ => f
      }
  }
}

/** Session wiring for the plans package: idempotently registers the
  * [[TopKStrategy]] planner strategy and the [[WindowTopKRewrite]] optimizer
  * rule on a session built WITHOUT `spark.sql.extensions` (the driver's
  * Verify/Bench sessions). Strategy and rule must travel together — a plan
  * carrying [[TopKPerGroup]] is unplannable without the strategy. */
object GraftPlanner {
  def ensure(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(WindowTopKRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ WindowTopKRewrite
    }
    if (!spark.experimental.extraOptimizations.contains(MvRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewrite
    }
  }
}
