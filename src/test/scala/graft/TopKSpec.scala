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

  test("expression group keys and compound orderings resolve") {
    val out = TopK.topKPerGroup(df, Seq((col("key") % 10).as("bucket")),
      Seq(col("score").asc, col("id").desc), 2)
    // 10 buckets x 2 rows
    assert(out.count() == 20)
  }
}
