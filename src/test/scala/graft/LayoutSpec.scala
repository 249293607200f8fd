package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Claims behind ops/Layout beyond q151's arithmetic gate: Z-order
  * clustering actually buys two-dimensional locality, and the
  * range-layout writer actually produces disjoint per-file key ranges
  * (the property parquet footer min/max pruning depends on). */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val d = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("z-order: a second-dimension predicate prunes z-chunks, not x-sorted chunks") {
    // the pruning claim, measured the way a reader would experience it: a
    // predicate on y (the dimension a single-column x-sort does NOT
    // cluster) skips a file iff the file's [min_y, max_y] misses the
    // predicate range. Count how many 100-row chunks a y-slice touches
    // under each layout — x-sort leaves y unconstrained per chunk (every
    // chunk intersects), z-order bounds both dimensions.
    val g = graft.core.Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_orderkey"),
        least(lit(255L), floor(col("o_totalprice") / 2000.0).cast("long")).as("x"),
        least(lit(255L),
          expr("datediff(cast(o_orderdate as date), date'1995-01-01') div 10")
            .cast("long")).as("y"))
      .withColumn("z", graft.ops.Layout.zValue(col("x"), col("y"), 8))
    def touchedChunks(sortCol: String): (Long, Long) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col(sortCol), col("o_orderkey"))
      val boxes = g.withColumn("rn", row_number().over(w))
        .withColumn("chunk", expr("rn div 100"))
        .groupBy("chunk").agg(min("y").as("min_y"), max("y").as("max_y"))
      val total = boxes.count()
      val hit = boxes.filter(col("min_y") <= 110L && col("max_y") >= 100L).count()
      (hit, total)
    }
    val (zHit, zTotal) = touchedChunks("z")
    val (xHit, xTotal) = touchedChunks("x")
    assert(zTotal == xTotal && zTotal >= 50)
    assert(xHit * 10 >= xTotal * 9,
      s"x-sort should leave y unclustered (expected ~all chunks hit): $xHit/$xTotal")
    assert(zHit * 2 <= zTotal,
      s"z-order should prune over half the chunks for a y-slice: $zHit/$zTotal")
  }

  test("range layout writes disjoint, ordered per-file key ranges") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_layout_spec"
    graft.ops.Layout.writeRangeLayout(
      graft.core.Tables.orders(spark, d).select(col("o_orderkey"), col("o_totalprice")),
      sortCols = Seq(col("o_totalprice")), files = 8,
      maxRecordsPerFile = 1000000L, path = path)
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 4, s"expected multiple range files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_totalprice"), max("o_totalprice")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file ranges overlap: [$hi] > [$lo2] — footer pruning impossible")
      case _ =>
    }
  }
}
