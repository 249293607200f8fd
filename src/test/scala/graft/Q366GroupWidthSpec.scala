package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q366's two-level prefix sum, pinned G-independent (round 17, closing
  * the r16 weak): the group width G is now DERIVED at runtime from the
  * doc_id range (G = max(64, round(√range))), and the output must be
  * identical for EVERY G — the oracle hash at sf0.01 only exercises one
  * G, so this spec forces the degenerate extremes (G=1: one doc per
  * group, the level-2 table IS the corpus; G=range: one group, the
  * level-3 window IS the sequential scan) plus the deployment √range
  * and the old fixed 64, and asserts all four equal the hand-computed
  * sequential cumsum. Sparse ids included — scalegen's k·10^7 shifts
  * are exactly the id shape that broke fixture arithmetic before
  * (round-workflow memory, q331). */
class Q366GroupWidthSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docsDf = {
    import spark.implicits._
    // sparse, unordered insert order; token counts straddle the 2048
    // boundary: 2050 forces a straddle, 0-token doc pins greatest(n-1,0)
    Seq(
      (3L, "a b c"),
      (10000007L, Seq.fill(2050)("tok").mkString(" ")),
      (12L, ""),
      (20000001L, Seq.fill(100)("x").mkString(" ")),
      (5L, Seq.fill(2048)("y").mkString(" ")),
      (20000002L, "one two")
    ).toDF("doc_id", "text")
  }

  test("output is identical for G in {1, 64, sqrt(range), range}") {
    val docs = docsDf
    val range = 20000002L - 3L + 1L
    val gs = Seq(1L, 64L, math.round(math.sqrt(range.toDouble)), range)
    val outs = gs.map { g =>
      graft.queries.TextOps.q366Assembly(docs, g)
        .collect().map(_.toString).toSeq
    }
    outs.tail.foreach { o => assert(o == outs.head,
      "two-level scan must be G-independent") }
  }

  test("two-level scan equals the sequential exclusive cumsum definition") {
    val docs = docsDf
    val out = graft.queries.TextOps.q366Assembly(docs, 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // hand-computed: order by doc_id, exclusive prefix of token counts
    val seq = Seq((3L, 3L), (5L, 2048L), (12L, 0L), (10000007L, 2050L),
      (20000001L, 100L), (20000002L, 2L))
    var off = 0L
    val expect = seq.map { case (id, n) =>
      val row = (id, n, off, off / 2048L,
        (off + math.max(n - 1L, 0L)) / 2048L, off % 2048L)
      off += n
      row
    }
    assert(out.toSeq == expect)
  }

  test("footer statistics agree with the aggregate on real testdata, " +
       "and the footer path is what q366 uses (no row read)") {
    val d = "/root/testdata/sf0.001"
    val fromFooter = graft.io.ParquetStats
      .minMaxLong(s"$d/documents.parquet", "doc_id")
    val agg = graft.core.Tables.documents(spark, d)
      .agg(org.apache.spark.sql.functions.min("doc_id"),
           org.apache.spark.sql.functions.max("doc_id")).head()
    assert(fromFooter.contains((agg.getLong(0), agg.getLong(1))),
      s"footer stats $fromFooter must equal the aggregate " +
        s"(${agg.getLong(0)}, ${agg.getLong(1)})")
    // a column with no stats (or a missing path) falls back cleanly
    assert(graft.io.ParquetStats.minMaxLong("/nonexistent", "doc_id").isEmpty)
    assert(graft.io.ParquetStats
      .minMaxLong(s"$d/documents.parquet", "no_such_col").isEmpty)
  }

  test("group width derives from the id range with a floor of 64") {
    import spark.implicits._
    def width(ids: Seq[Long]) = graft.queries.TextOps.q366GroupWidth(
      ids.map(i => (i, "t")).toDF("doc_id", "text"))
    // tiny range → floor
    assert(width(Seq(1L, 50L)) == 64L)
    // 10^8 range → 10^4 groups-width: the level-2 table is √N-sized,
    // NOT N/64 — the r16 weak this derivation closes
    assert(width(Seq(0L, 100000000L - 1L)) == 10000L)
    // empty corpus → floor, no NPE
    assert(graft.queries.TextOps.q366GroupWidth(
      Seq.empty[(Long, String)].toDF("doc_id", "text")) == 64L)
  }
}
