package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftPlanner

/** Specs for the Window→TopKPerGroup optimizer rule: the row_number top-k
  * idiom must silently get the bounded-heap plan, with the rank column and
  * row set byte-identical to the unrewritten formulation. */
class WindowTopKRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftPlanner.ensure(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** Same data in two sessions: `spark` carries the rule, `vanilla` (a
    * sibling SessionState over the same context) does not — its plans are
    * the untouched window formulation. */
  private lazy val vanilla = spark.newSession()

  private def data(s: SparkSession): DataFrame = {
    import s.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 5000).map(i => (i % 53, rnd.nextDouble() * 100, i.toLong))
      .toDF("key", "score", "id")
  }

  private def topk(s: SparkSession, k: Int): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    data(s).withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def rows(df: DataFrame): Set[(Int, Double, Long, Int)] =
    df.collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet

  test("rewrite fires on the row_number idiom and keeps the Window") {
    val p = topk(spark, 5).queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupPartial"), s"no partial heap in:\n$p")
    assert(p.contains("Window"), s"Window must survive (rank recompute):\n$p")
    // heap UNDER the window: render order Window ... heap
    assert(p.indexOf("Window") < p.indexOf("TopKPerGroupPartial"))
    // the built-in sort-then-limit is SUBSUMED, not stacked: its exec would
    // force a full local sort below the heap, re-adding the cost we removed
    assert(!p.contains("WindowGroupLimit"), s"built-in group limit must be replaced:\n$p")
  }

  test("rewritten rows and ranks are identical to the window formulation") {
    assert(rows(topk(spark, 5)) == rows(topk(vanilla, 5)))
    assert(rows(topk(spark, 1)) == rows(topk(vanilla, 1)))
  }

  test("rn = 1 dedup idiom fires with a k=1 heap") {
    val w = Window.partitionBy(col("key")).orderBy(col("id"))
    val first = data(spark).withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val p = first.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupPartial"), s"k=1 must fire:\n$p")
    assert(first.count() == 53)
  }

  test("extra conjuncts ride along unchanged") {
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    def q(s: SparkSession) = data(s)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("score") > 10.0)
    val p = q(spark).queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupPartial"))
    assert(rows(q(spark)) == rows(q(vanilla)))
  }

  test("rank(), huge k, and disjunctions are left alone") {
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    val viaRank = data(spark).withColumn("rn", rank().over(w)).filter(col("rn") <= 5)
    assert(!viaRank.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "rank() can tie past k — must not rewrite")
    val hugeK = data(spark).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 100000)
    assert(!hugeK.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "k beyond the heap-memory cap must keep the spillable sort")
    val disj = data(spark).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 || col("score") > 99.0)
    assert(!disj.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "a disjunctive bound is not a bound")
  }
}
