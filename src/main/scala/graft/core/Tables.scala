package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's parquet test tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — filters/projections authored on top
  * of these compose into the scan via Catalyst pushdown, so a metadata-only
  * query never materializes columns it does not read.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every board query reads through here, so this is the one choke point
    // that guarantees the plans-package strategy + optimizer rule are live
    // on driver sessions built without spark.sql.extensions
    graft.plans.GraftPlanner.ensure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw
    * nanos via the legacy conf and derive:
    *   - `ts_us`: epoch microseconds (LONG) — integer `div` to keep exact
    *     precision (a double division would corrupt 1.7e18-scale nanos), and
    *     matching DuckDB's `CAST(ts AS TIMESTAMP)` ns→µs truncation;
    *   - `ts_t`: a µs-precision TIMESTAMP for window/time-bucket operations.
    * The conf is runtime-settable so this works under the driver's session.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
  }
}
