package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The grid radius join's soundness argument, proven rather than assumed:
  * with cell side = R, a 3×3 neighborhood candidate set loses NO pair
  * within L2 distance R — the grid plan must equal the naive cross-join
  * on every input, including the adversarial boundary cases (pairs at
  * exactly distance R, points sitting on cell boundaries, pairs whose
  * cells differ by exactly one index). */
class SpatialOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("grid plan equals the naive cross-join on the testdata") {
    val d = "/root/testdata/sf0.001"
    val grid = graft.queries.SpatialOps.q273(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // oracle: same synthesis, naive all-pairs
    val c = spark.read.parquet(s"$d/customer.parquet")
      .selectExpr("c_custkey", "(c_custkey * 48271) % 100000 AS cx",
        "(c_custkey * 69621) % 100000 AS cy")
    val s = spark.read.parquet(s"$d/supplier.parquet")
      .selectExpr("s_suppkey", "(s_suppkey * 40503) % 100000 AS sx",
        "(s_suppkey * 65537) % 100000 AS sy")
    val naive = c.crossJoin(s)
      .withColumn("d2", expr("(cx-sx)*(cx-sx) + (cy-sy)*(cy-sy)"))
      .filter(col("d2") <= 1000000L)
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("n"), min("d2").as("mn"), sum("d2").as("sm"))
      .orderBy("c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(grid.nonEmpty && grid.toSeq == naive.toSeq)
  }

  test("boundary exactness: distance exactly R and cell-edge points survive") {
    import spark.implicits._
    val r = 1000L
    // probe at a cell corner; neighbors at exactly R along each axis and
    // just inside/outside on the diagonal — the pairs a sloppy
    // neighborhood or a strict inequality would lose
    val probes = Seq((1L, 5000L, 5000L)).toDF("c_custkey", "cx", "cy")
    val sites = Seq(
      (10L, 5000L + r, 5000L),       // exactly R, next cell east
      (11L, 5000L, 5000L - r),       // exactly R, cell south
      (12L, 5000L + 707L, 5000L + 707L), // inside: 707²·2 = 999 698
      (13L, 5000L + 708L, 5000L + 708L), // outside: 708²·2 = 1 002 528
      (14L, 5999L, 5999L),           // same-ish diagonal cell, outside
      (15L, 4000L, 4000L)            // corner-touching cell, d2 = 2r² out
    ).toDF("s_suppkey", "sx", "sy")
    val cell = 1000L
    val offsets = typedLit(for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy))
    val cand = probes
      .withColumn("o", explode(offsets))
      .withColumn("gx", expr(s"cx div $cell") + col("o._1"))
      .withColumn("gy", expr(s"cy div $cell") + col("o._2"))
      .join(sites
        .withColumn("gx", expr(s"sx div $cell"))
        .withColumn("gy", expr(s"sy div $cell")), Seq("gx", "gy"))
      .withColumn("d2", expr("(cx-sx)*(cx-sx) + (cy-sy)*(cy-sy)"))
      .filter(col("d2") <= r * r)
      .select("s_suppkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(cand == Seq(10L, 11L, 12L), s"got $cand")
  }
}
