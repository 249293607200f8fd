package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK

/** Specs for the whole-operator Catalyst extension (custom LogicalPlan +
  * SparkStrategy + bounded-heap SparkPlan). */
class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def df = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 20000).map(i => (i.toLong % 97, rnd.nextDouble() * 1000, i.toLong))
      .toDF("key", "score", "id")
  }

  test("topKPerGroup returns exactly the window-formulation row set") {
    val d = df
    val native = TopK.topKPerGroup(d, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), 5)
      .select("key", "score", "id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val windowed = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id"))
      d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("key", "score", "id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    }
    assert(native == windowed && native.size == 97 * 5)
  }

  test("physical plan uses the bounded-heap exec with NO sort") {
    // AQE wraps the plan, so assert on the rendered tree (which includes
    // the inner adaptive plan) rather than node traversal
    val s = TopK.topKPerGroup(df, Seq(col("key")), Seq(col("score").desc), 3)
      .queryExecution.executedPlan.toString
    assert(s.contains("TopKPerGroup"))
    assert(s.contains("Exchange hashpartitioning(key"))
    assert(!s.contains("Sort ")) // the whole point: no per-group sort
    // partial pass BELOW the exchange (map-side shuffle reduction), final
    // pass above: final ... Exchange ... partial in render order
    val iFinal = s.indexOf("TopKPerGroup ")
    val iEx = s.indexOf("Exchange hashpartitioning(key")
    val iPartial = s.indexOf("TopKPerGroupPartial")
    assert(iFinal >= 0 && iPartial >= 0 && iFinal < iEx && iEx < iPartial,
      s"expected final < exchange < partial in:\n$s")
  }

  test("k larger than any group degenerates to identity per group") {
    val d = df.filter(col("key") < 3)
    val out = TopK.topKPerGroup(d, Seq(col("key")), Seq(col("id").asc), 1000000)
    assert(out.count() == d.count())
  }

  test("high key cardinality: 1M keys x k=10 completes within the documented bound") {
    // the O(keys-per-task x k) heap-map bound from TopK's scaladoc, driven
    // at 1M distinct keys: 2M rows, 2 per key, k=10 keeps both -> exact
    // row count proves no key's heap was dropped or double-counted
    val d = spark.range(2000000L)
      .selectExpr("id % 1000000 AS key", "id AS v")
    val out = TopK.topKPerGroup(d, Seq(col("key")), Seq(col("v").desc), 10)
    assert(out.count() == 2000000L)
    // and with eviction pressure: 5 rows per key, k=2 keeps the top 2 —
    // checks the heap actually bounds per-key retention at scale, plus a
    // per-key spot check of WHICH rows survive
    val d2 = spark.range(1000000L).selectExpr("id % 200000 AS key", "id AS v")
    val out2 = TopK.topKPerGroup(d2, Seq(col("key")), Seq(col("v").desc), 2)
    assert(out2.count() == 400000L)
    val k0 = out2.filter(col("key") === 0).select("v").collect().map(_.getLong(0)).toSet
    assert(k0 == Set(800000L, 600000L)) // top-2 v for key 0
  }

  test("expression group keys and compound orderings resolve") {
    val out = TopK.topKPerGroup(df, Seq((col("key") % 10).as("bucket")),
      Seq(col("score").asc, col("id").desc), 2)
    // 10 buckets x 2 rows
    assert(out.count() == 20)
  }
}
