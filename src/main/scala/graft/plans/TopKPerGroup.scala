package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator Catalyst extension (SURVEY §2.10 preference tier (c):
  * custom LogicalPlan + SparkStrategy + SparkPlan): exact top-k rows per
  * group with a BOUNDED HEAP per key instead of a full per-group sort.
  *
  * The standard formulation — row_number() over a window, filter rn <= k —
  * shuffles on the group key and then SORTS EVERY GROUP COMPLETELY before
  * discarding all but k rows. This operator keeps the same shuffle
  * (requiredChildDistribution = clustered on the group key, so Catalyst
  * inserts the exchange) but replaces the sort with one k-bounded heap per
  * key: O(keys × k) memory, O(rows × log k) comparisons, no sort spill. At
  * 100 TB with millions of rows per hot key and k in the tens, the sort is
  * the bottleneck this removes — the per-group sibling of what
  * TakeOrderedAndProject already does globally.
  *
  * Row-set semantics are identical to the window formulation whenever the
  * ordering is total (ties broken), which is also what makes it
  * oracle-checkable (q66). Output order within a group is unspecified —
  * callers order downstream, exactly as after any aggregation.
  */
final case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
                              k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

/** Planner strategy: lowers the logical node to a partial (pre-shuffle) +
  * final (post-shuffle) heap pair — the top-k analog of partial
  * aggregation. Any row in a key's global top-k is necessarily in its
  * partition-local top-k, so the partial pass losslessly caps what the
  * exchange carries at keys × k rows per input partition. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Heap pass over one partition's rows: k-bounded max-heap per key (peek()
  * is the WORST kept row, evicted when a better one arrives). Shared by the
  * partial and final passes — identical logic, different distribution. */
private object HeapPass extends Serializable {
  def apply(iter: Iterator[InternalRow], childOutput: Seq[Attribute],
            gExprs: Seq[Expression], ord: Seq[SortOrder], k: Int): Iterator[InternalRow] = {
    val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
    val keyProj = UnsafeProjection.create(gExprs, childOutput)
    val ordering = new LazilyGeneratedOrdering(ord, childOutput)
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
    while (iter.hasNext) {
      val row = iter.next() match {
        case u: UnsafeRow => u
        case r => toUnsafe(r)
      }
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        // small initial capacity: PriorityQueue grows as needed, so memory
        // tracks actual rows kept — preallocating k+1 slots per key would
        // make sparse groups cost Theta(keys x k) before storing anything
        heap = new java.util.PriorityQueue[UnsafeRow](
          math.min(k, 16) + 1, (a: UnsafeRow, b: UnsafeRow) => ordering.compare(b, a))
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add(row.copy())
      else if (ordering.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.add(row.copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.values().iterator().asScala
      .flatMap(h => h.iterator().asScala.map(_.asInstanceOf[InternalRow]))
  }
}

final case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                                  k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(groupExprs) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val ord = order
    val kk = k
    child.execute().mapPartitions(
      iter => HeapPass(iter, childOutput, gExprs, ord, kk),
      preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** User-facing API. The strategy self-registers on the session's
  * experimental strategies (idempotent), so no session-build config is
  * required; GraftExtensions also injects it for the
  * `spark.sql.extensions` deployment path.
  *
  * ==Memory bound (deployment contract)==
  * Each task holds (distinct keys in its partition) × k rows on the JVM
  * heap, OUTSIDE Spark's task memory manager — there is no spill path.
  * The partial pass caps what the exchange CARRIES at keys × k rows per
  * input partition, but the per-task map itself scales with key
  * cardinality, so size the shuffle (`spark.sql.shuffle.partitions`, or
  * AQE advisory partition size) so that keys-per-task × k × rowSize fits
  * in executor memory — e.g. 10M keys × k=10 × ~50 B ≈ 5 GB split over
  * 256 tasks ≈ 20 MB/task. TopKSpec's high-cardinality case (1M keys,
  * k=10, one task per core) demonstrates the bound in practice. Workloads
  * with effectively unbounded key cardinality should either raise the
  * partition count (the map shrinks linearly) or fall back to the window
  * formulation, which sorts but spills; a spillable
  * `BytesToBytesMap`-backed heap table is the upgrade path if both are
  * ever needed at once. */
object TopK {
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
                   orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    // Spark 4's Column nodes resolve lazily through the Dataset API, not
    // inside custom operators — so harvest RESOLVED expressions from
    // throwaway analyzed plans: a non-global Sort for the SortOrders (its
    // child is exactly df's analyzed plan) and a Project for the group keys.
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    val sorted = df.sortWithinPartitions(orderCols: _*)
      .queryExecution.analyzed.asInstanceOf[Sort]
    val o: Seq[SortOrder] = sorted.order
    val g: Seq[Expression] = df.select(groupCols: _*)
      .queryExecution.analyzed.asInstanceOf[Project].projectList.map {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
        case e => e
      }
    ColumnBridge.ofRows(spark, TopKPerGroup(g, o, k, sorted.child))
  }
}
