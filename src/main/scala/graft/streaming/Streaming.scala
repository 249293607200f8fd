package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming ingest mode (SURVEY §2.8 north-star extension): the
  * same windowed aggregation the batch query q32 runs, expressed over an
  * unbounded file source with a watermark. `runOnce` drives it synchronously
  * over the static test parquet (memory sink + processAllAvailable) so the
  * streaming path is testable offline; on a cluster the identical plan runs
  * against an arriving-file directory with `writeStream.trigger(...)`.
  */
object Streaming {

  /** events.parquet schema with ts as raw nanos (see Tables.events). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Unbounded source → event-time tumbling window + watermark aggregation.
    * State is bounded by the watermark (10 min past event time), the
    * requirement for 100 TB continuous ingest. `streamDir` is a DIRECTORY
    * into which event parquet files arrive (FileStreamSource contract). */
  def windowedCounts(spark: SparkSession, streamDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .parquet(streamDir)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_t", "10 minutes")
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
              col("event_type"), col("n"), col("sum_value"))
  }

  /** Drive the stream to completion over the static snapshot; returns the
    * final in-memory table (complete output mode). Stages the single events
    * file into a scratch directory — the file-source contract wants a
    * directory that files arrive into. */
  def runOnce(spark: SparkSession, dir: String, queryName: String = "graft_stream"): DataFrame = {
    val staged = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val q = windowedCounts(spark, staged.toString)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
