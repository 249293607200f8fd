package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

/** As-of join: at-or-before semantics (incl. the equal-timestamp case),
  * left-join NULLs before any version, multiple payload columns,
  * per-key isolation, input validation, and the plan-shape guarantee
  * (one exchange, no nested loop). */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def left() = {
    import spark.implicits._
    Seq((1L, 10L, "a"), (1L, 25L, "b"), (1L, 10L, "d"), (2L, 5L, "c"),
        (2L, 40L, "e"), (3L, 99L, "f"))
      .toDF("k", "ts", "tag")
  }
  private def right() = {
    import spark.implicits._
    Seq((1L, 10L, 100L, "x"), (1L, 20L, 200L, "y"), (2L, 7L, 300L, "z"))
      .toDF("k", "ts", "v", "label")
  }

  test("at-or-before per key: equal ts matches; earlier left rows NULL") {
    val out = AsOfJoin.asOfLeft(left(), right(), "k", "ts", Seq("v", "label"))
      .orderBy(col("k"), col("ts"), col("tag"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) "-" else r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, "a", 100L, "x"), // equal ts: the same-instant version is visible
      (1L, 10L, "d", 100L, "x"), // duplicate left rows each match independently
      (1L, 25L, "b", 200L, "y"), // picks the LATEST at-or-before, not the first
      (2L, 5L, "c", -1L, "-"),   // before any version: left-join NULL
      (2L, 40L, "e", 300L, "z"),
      (3L, 99L, "f", -1L, "-"))) // key with no versions at all
  }

  test("multi-payload match is ATOMIC: a NULL in the matched version stays " +
       "NULL, never stitched from an older version") {
    import spark.implicits._
    // version t2 has a=NULL, b=5; a torn per-column carry would emit
    // (a=1, b=5). Native ASOF (the q330 oracle) returns the t2 row whole.
    val l = Seq((1L, 30L)).toDF("k", "ts")
    val r = Seq((1L, 10L, Option(1L), Option(2L)),
                (1L, 20L, None, Option(5L))).toDF("k", "ts", "a", "b")
    val row = AsOfJoin.asOfLeft(l, r, "k", "ts", Seq("a", "b")).head()
    assert(row.isNullAt(2), s"torn version: got a=${row.get(2)}")
    assert(row.getLong(3) == 5L)
  }

  test("versions never leak across keys") {
    import spark.implicits._
    val l = Seq((1L, 50L, "a"), (2L, 50L, "b")).toDF("k", "ts", "tag")
    val r = Seq((1L, 10L, 7L)).toDF("k", "ts", "v")
    val out = AsOfJoin.asOfLeft(l, r, "k", "ts", Seq("v"))
      .orderBy(col("k")).collect()
    assert(out(0).getLong(3) == 7L && out(1).isNullAt(3))
  }

  test("plan: exactly one exchange, no BroadcastNestedLoop/CartesianProduct") {
    val df = AsOfJoin.asOfLeft(left(), right(), "k", "ts", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"want 1 exchange, got $exchanges in:\n$plan")
  }

  test("validation: missing columns, payload collisions, empty payload") {
    assert(intercept[IllegalArgumentException](
      AsOfJoin.asOfLeft(left(), right(), "nope", "ts", Seq("v")))
      .getMessage.contains("nope"))
    assert(intercept[IllegalArgumentException](
      AsOfJoin.asOfLeft(left(), right(), "k", "ts", Seq("absent")))
      .getMessage.contains("absent"))
    assert(intercept[IllegalArgumentException](
      AsOfJoin.asOfLeft(left(), right(), "k", "ts", Seq("ts")))
      .getMessage.contains("collide"))
    assert(intercept[IllegalArgumentException](
      AsOfJoin.asOfLeft(left(), right(), "k", "ts", Seq.empty))
      .getMessage.contains("at least one"))
  }

  test("oracle-shape agreement on a bigger deterministic instance") {
    // engine result vs an independent in-memory reference computation
    import spark.implicits._
    val l = (0 until 500).map(i => ((i % 7).toLong, (i * 13 % 211).toLong, i.toLong))
      .toDF("k", "ts", "row_id")
    val r = (0 until 60).map(i => ((i % 7).toLong, (i * 31 % 199).toLong, (1000 + i).toLong))
      .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, ts)
      .toDF("k", "ts", "ver")
    val got = AsOfJoin.asOfLeft(l, r, "k", "ts", Seq("ver"))
      .select(col("row_id"), col("ver")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val versions = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    (0 until 500).foreach { i =>
      val (k, ts) = ((i % 7).toLong, (i * 13 % 211).toLong)
      val want = versions.filter(v => v._1 == k && v._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3).getOrElse(-1L)
      assert(got(i.toLong) == want, s"row $i k=$k ts=$ts")
    }
  }
}
