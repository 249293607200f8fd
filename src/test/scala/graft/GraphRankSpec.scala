package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphRank

/** GraphRank (fixed-point PageRank): exact agreement with an
  * independent in-memory reference on irregular graphs, the no-inflow
  * and dangling-node conventions, parallel-edge weighting, and
  * parameter validation. */
class GraphRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The update law, restated independently (plain Scala, adjacency
    * lists) — any floor/ordering slip in the distributed form breaks
    * the exact comparison. */
  private def reference(n: Int, edges: Seq[(Int, Int)], iters: Int): Seq[Long] = {
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = Array.fill(n)(1000000L)
    (1 to iters).foreach { _ =>
      val infl = Array.fill(n)(0L)
      edges.foreach { case (u, v) => infl(v) += r(u) / outDeg(u) }
      r = infl.map(x => 150000L + (x * 850000L) / 1000000L)
    }
    r.toSeq
  }

  private def run(n: Int, edges: Seq[(Int, Int)], iters: Int): Seq[Long] = {
    import spark.implicits._
    val nodes = (0 until n).map(_.toLong).toDF("node")
    val e = edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
    GraphRank.pageRankFixedPoint(nodes, e, iterations = iters)
      .orderBy(col("node")).collect().map(_.getLong(1)).toSeq
  }

  test("exact agreement with the reference on an irregular graph") {
    val edges = Seq(0 -> 1, 0 -> 2, 1 -> 2, 2 -> 0, 3 -> 2, 3 -> 2, 4 -> 0)
    for (iters <- Seq(1, 3, 8)) {
      assert(run(5, edges, iters) == reference(5, edges, iters), s"iters=$iters")
    }
  }

  test("no-inflow nodes settle at basePpm; dangling nodes leak mass") {
    // 3 has no in-edges; 2 is dangling (keeps receiving, sends nothing)
    val edges = Seq(0 -> 2, 1 -> 2, 3 -> 0)
    val got = run(4, edges, 4)
    assert(got == reference(4, edges, 4))
    assert(got(1) == 150000L, "node 1 has no in-edges after warmup")
    assert(got(2) > got(0), "the sink accumulates")
  }

  test("parallel edges count double (the multiplicity convention)") {
    val single = run(3, Seq(0 -> 1, 2 -> 1), 2)
    val doubled = run(3, Seq(0 -> 1, 0 -> 1, 2 -> 1), 2)
    // doubling 0->1 splits 0's mass over outdeg 2 but sends both halves
    // to 1 — identical inflow; the reference agrees on both
    assert(doubled == reference(3, Seq(0 -> 1, 0 -> 1, 2 -> 1), 2))
    assert(single == doubled)
    // whereas an extra edge to a DIFFERENT target halves 1's inflow —
    // visible at ONE iteration (later iterations re-route the mass via
    // node 2): single = 150000+850000·2 = 1850000, split = 1425000
    val split1 = run(3, Seq(0 -> 1, 0 -> 2, 2 -> 1), 1)
    assert(split1 == reference(3, Seq(0 -> 1, 0 -> 2, 2 -> 1), 1))
    assert(split1(1) == 1425000L)
    assert(run(3, Seq(0 -> 1, 2 -> 1), 1)(1) == 1850000L)
  }

  test("validation: iteration and damping ranges") {
    import spark.implicits._
    val nodes = Seq(0L).toDF("node")
    val e = Seq((0L, 0L)).toDF("src", "dst")
    assert(intercept[IllegalArgumentException](
      GraphRank.pageRankFixedPoint(nodes, e, iterations = 0))
      .getMessage.contains("iteration"))
    assert(intercept[IllegalArgumentException](
      GraphRank.pageRankFixedPoint(nodes, e, dampPpm = 2000000L))
      .getMessage.contains("ppm"))
  }
}
