package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

/** Streaming as-of join: cross-batch state (versions from trigger 1
  * answering probes from trigger 2), the equal-timestamp rule
  * (version visible), unmatched probes, same-ts version overwrite,
  * and agreement with the batch operator on the same inputs. */
class StreamingAsOfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def versionsDf(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_us", "payload")
      .select(col("user_id"), col("ts_us"), lit(0).as("kind"),
        col("payload"), lit(-1L).as("probe_id"))
  }
  private def probesDf(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_us", "probe_id")
      .select(col("user_id"), col("ts_us"), lit(1).as("kind"),
        lit(-1L).as("payload"), col("probe_id"))
  }

  test("cross-batch: trigger-1 versions answer trigger-2 probes; " +
       "equal ts sees the version; before-any-version is unmatched") {
    val out = Streaming.asOfJoinTwoWaves(spark,
      versionsDf(Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 7L, 300L))),
      probesDf(Seq((1L, 10L, 900L), (1L, 25L, 901L), (2L, 5L, 902L),
        (2L, 40L, 903L), (3L, 99L, 904L))),
      queryName = "asof_spec_1")
      .collect().map(r => r.getLong(1) ->
        (r.getBoolean(3), r.getLong(4))).toMap
    assert(out(900L) == ((true, 100L)))  // equal ts: same-instant version
    assert(out(901L) == ((true, 200L)))  // latest at-or-before, not first
    assert(out(902L) == ((false, -1L)))  // before any version
    assert(out(903L) == ((true, 300L)))
    assert(out(904L) == ((false, -1L)))  // key with no versions
  }

  test("agrees with the batch operator row-for-row on a dense instance") {
    import spark.implicits._
    val vs = (0 until 40).map(i => ((i % 5).toLong, (i * 17 % 101).toLong, (1000 + i).toLong))
      .groupBy(v => (v._1, v._2)).map(_._2.maxBy(_._3)).toSeq
    val ps = (0 until 200).map(i => ((i % 5).toLong, (i * 13 % 127).toLong, i.toLong))
    val streamed = Streaming.asOfJoinTwoWaves(spark, versionsDf(vs), probesDf(ps),
      queryName = "asof_spec_2")
      .collect().map(r => r.getLong(1) ->
        (if (r.getBoolean(3)) r.getLong(4) else -1L)).toMap
    val batch = graft.ops.AsOfJoin.asOfLeft(
      ps.toDF("user_id", "ts_us", "probe_id"),
      vs.toDF("user_id", "ts_us", "ver"),
      key = "user_id", ts = "ts_us", payload = Seq("ver"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(streamed == batch)
  }

  test("same-ts version redelivery overwrites DETERMINISTICALLY " +
       "(ascending payload order: the largest payload wins)") {
    val out = Streaming.asOfJoinTwoWaves(spark,
      versionsDf(Seq((1L, 10L, 100L), (1L, 10L, 111L))),
      probesDf(Seq((1L, 15L, 900L))),
      queryName = "asof_spec_3").collect()
    assert(out.length == 1)
    assert(out.head.getLong(4) == 111L)
    // and the version list holds ONE entry for ts=10: a second probe at
    // the same ts agrees with the first
    val out2 = Streaming.asOfJoinTwoWaves(spark,
      versionsDf(Seq((2L, 10L, 100L), (2L, 10L, 100L))),
      probesDf(Seq((2L, 10L, 905L))),
      queryName = "asof_spec_4").collect()
    assert(out2.length == 1 && out2.head.getLong(4) == 100L)
  }
}
