package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the DataSource V2 connector (sources/GenSource.scala)
  * beyond q141's oracle gate: pushdown folding, empty ranges, split
  * boundaries, and md5 parity with Spark's own expression. */
class GenSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def gen(rows: Long, slices: Int) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("full scan yields exactly `rows` rows across all splits") {
    assert(gen(1000, 7).count() == 1000L)
    assert(gen(5, 16).count() == 5L) // more slices than rows: empty splits dropped
  }

  test("equality pushdown folds to a single row; contradictions to zero") {
    val one = gen(1000, 4).filter(col("id") === 42L).collect()
    assert(one.length == 1 && one(0).getLong(0) == 42L)
    assert(gen(1000, 4).filter(col("id") > 900L && col("id") < 100L).count() == 0L)
    assert(gen(1000, 4).filter(col("id") >= 1000L).count() == 0L)
  }

  test("generated md5 matches Spark's md5 expression row-for-row") {
    val bad = gen(256, 4)
      .withColumn("expect", md5(col("id").cast("string")))
      .filter(col("h") =!= col("expect"))
    assert(bad.count() == 0L)
    val bb = gen(256, 4).filter(col("bucket") =!= col("id") % 64)
    assert(bb.count() == 0L)
  }

  test("aggregate pushdown: empty range gives count 0 and null min/max") {
    val r = gen(1000, 4).filter(col("id") >= 500L && col("id") < 100L)
      .agg(count(lit(1)), min(col("id")), max(col("id"))).collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("aggregate pushdown declines group-by and non-id aggregates; results still correct") {
    // grouped: falls back to a normal Spark aggregation over generated rows
    val g = gen(128, 4).groupBy(col("bucket")).agg(count(lit(1)).as("n")).collect()
    assert(g.length == 64 && g.forall(_.getLong(1) == 2L))
    val plan = gen(128, 4).groupBy(col("bucket")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("GenAggScan"))
    // sum is not translatable -> declined, computed by Spark
    val sm = gen(100, 4).agg(sum(col("id"))).collect()(0).getLong(0)
    assert(sm == 4950L)
  }

  test("micro-batch stream drains the table in batchRows-sized batches, no dup/loss") {
    val q = spark.readStream.format("graft.sources.GenSource")
      .option("rows", "100").option("batchRows", "30").option("slices", "2").load()
      .select(col("id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("gen_stream_spec").start()
    q.processAllAvailable()
    val batches = q.recentProgress.map(_.batchId).distinct.length
    q.stop()
    val ids = spark.table("gen_stream_spec").collect().map(_.getLong(0)).sorted
    assert(ids.length == 100 && ids.sameElements(0L until 100L),
      "stream must deliver each id exactly once")
    assert(batches >= 4, s"expected >=4 micro-batches for 100 rows @30/batch, saw $batches")
  }

  test("residual (non-id) filters still apply after pushdown") {
    val n = gen(1000, 4)
      .filter(col("id") >= 100L && col("id") < 200L && col("bucket") === 3L)
      .count()
    // ids 100..199: bucket 3 hits at 131 and 195
    assert(n == 2L)
  }
}
