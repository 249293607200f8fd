package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q352's hot-cap guard, pinned beyond the gate corpus: at sf0.01 no
  * chunk fingerprint is shared by more than 3 documents (cap 64), so
  * the DuckDB hash gate alone would keep passing with the guard
  * deleted. This spec drives the factored pair pipeline with a
  * synthetic fan-out ABOVE the cap and asserts the boilerplate
  * fingerprint is excluded while normal collisions survive. */
class ChunkPairsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("fingerprints above the hot cap are excluded; normal ones pair") {
    import spark.implicits._
    val cap = graft.queries.TextOps.Q352HotCap
    // "hot": shared by cap+6 docs (boilerplate chunk — must NOT pair);
    // "ok": shared by docs 1 and 2 (a real near-dup — must pair);
    // every doc also has one unique chunk so n_chunks > shared
    val hotDocs = (1L to (cap + 6).toLong).map(i => (i, "hot"))
    val uniq = (1L to (cap + 6).toLong).map(i => (i, s"uniq$i"))
    val ok = Seq((1L, "ok"), (2L, "ok"))
    val ch = (hotDocs ++ uniq ++ ok).toDF("doc_id", "chunk_fp")
    val out = graft.queries.TextOps.chunkCollisionPairs(ch)
      .orderBy("doc_a", "doc_b").collect()
    // ONLY the (1,2) pair from "ok" — with the guard deleted this would
    // be (cap+6 choose 2) + 1 rows
    assert(out.length == 1, s"expected 1 pair, got ${out.length}")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L, "shared_chunks must count only 'ok'")
    // doc 1 and doc 2 each hold 3 distinct chunks (hot + uniq + ok) —
    // n_chunks counts the UNGUARDED table, so containment stays honest
    assert(r.getLong(3) == 3L && r.getLong(4) == 3L)
    assert(r.getLong(5) == 1000000L / 3L)
  }

  test("count joins produce identical pairs under broadcast AND shuffle " +
       "strategies (the r15 weak-#2 size gate is AQE's, not a forced hint)") {
    import spark.implicits._
    // a pair table big enough to be meaningful, fanned out from shared fps
    val ch = (1L to 200L).flatMap { i =>
      Seq((i, s"fp${i % 40}"), (i, s"uniq$i")) }.toDF("doc_id", "chunk_fp")
    def run(): Array[String] =
      graft.queries.TextOps.chunkCollisionPairs(ch)
        .orderBy("doc_a", "doc_b").collect().map(_.toString)
    val defaults = run()
    val (k1, k2) = ("spark.sql.autoBroadcastJoinThreshold",
                    "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val (p1, p2) = (spark.conf.getOption(k1), spark.conf.getOption(k2))
    val forced = try {
      spark.conf.set(k1, "-1"); spark.conf.set(k2, "-1")
      val df = graft.queries.TextOps.chunkCollisionPairs(ch)
        .orderBy("doc_a", "doc_b")
      val rows = df.collect().map(_.toString)
      // no hint forces a broadcast: with the thresholds off the count
      // joins must be shuffled joins (at 100 TB the pair table is
      // O(duplicated docs) — a forced broadcast would OOM the driver)
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "thresholds disabled: the count joins must not broadcast")
      rows
    } finally {
      p1.fold(spark.conf.unset(k1))(spark.conf.set(k1, _))
      p2.fold(spark.conf.unset(k2))(spark.conf.set(k2, _))
    }
    assert(defaults.nonEmpty && defaults.sameElements(forced),
      "broadcast and shuffle strategies must agree row-for-row")
  }

  test("q357: a one-token edit that blinds q352's exact collision still " +
       "bands together under chunk MinHash") {
    import spark.implicits._
    val base = (1 to 64).map(i => s"tok$i")
    val edited = base.updated(31, "EDITED")
    val chunks = Seq(
      (1L, 0L, base),
      (2L, 0L, edited),
      (3L, 0L, (1 to 64).map(i => s"other$i"))) // unrelated: must NOT pair
    val out = graft.queries.TextOps.chunkMinhashPairs(
      chunks.toDF("doc_id", "chunk_id", "toks"))
      .orderBy("doc_a", "doc_b").collect()
    assert(out.length == 1, s"expected exactly the (1,2) pair, got ${out.length}")
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L &&
      out.head.getLong(2) == 1L)
    // and the exact-collision operator is blind to the same input — the
    // gap q357 exists to close
    val fp = Seq((1L, "fp_base"), (2L, "fp_edited"))
      .toDF("doc_id", "chunk_fp")
    assert(graft.queries.TextOps.chunkCollisionPairs(fp).count() == 0)
  }

  test("q357: band buckets above the hot cap are excluded; chunks under " +
       "3 tokens carry no signature") {
    import spark.implicits._
    val cap = graft.queries.TextOps.Q357HotCap
    val boiler = (1 to 64).map(i => s"b$i")
    val hot = (1L to (cap + 6).toLong).map(i => (i, 0L, boiler))
    val ok = Seq((1000L, 0L, (1 to 64).map(i => s"u$i")),
                 (1001L, 0L, (1 to 64).map(i => s"u$i")))
    val short = Seq((2000L, 0L, Seq("a", "b"))) // < 3 tokens: no shingles
    val out = graft.queries.TextOps.chunkMinhashPairs(
      (hot ++ ok ++ short).toDF("doc_id", "chunk_id", "toks"))
      .orderBy("doc_a", "doc_b").collect()
    // the boilerplate bucket (cap+6 identical chunks) must produce ZERO
    // pairs; the normal duplicate pair survives
    assert(out.length == 1, s"expected 1 pair, got ${out.length}")
    assert(out.head.getLong(0) == 1000L && out.head.getLong(1) == 1001L)
  }

  test("q362: an oversize sentence gets its own chunk, never split " +
       "(the branch no gate-corpus sentence reaches)") {
    val cap = graft.queries.TextOps.Q362Cap
    val oversize = (1 to cap + 4).map(i => s"w$i").mkString(" ") // cap+4 toks
    val packed = graft.queries.TextOps.greedyPackSentences(
      Seq("a b c", oversize, "d e"), cap)
    assert(packed.map(_._1) == Seq(0L, 1L, 2L),
      "oversize sentence must open its own chunk and close it")
    assert(packed(1)._2 == Seq(oversize) && packed(1)._3 == (cap + 4).toLong,
      "the oversize sentence is never split and keeps its full token count")
    assert(packed(0)._3 == 3L && packed(2)._3 == 2L)
    // boundary: a chunk may fill to EXACTLY cap before closing
    val exact = graft.queries.TextOps.greedyPackSentences(
      Seq("a b c d", "e f g h", "i"), cap)
    assert(exact.map(_._1) == Seq(0L, 1L) && exact.head._3 == cap.toLong &&
      exact.head._2.size == 2)
  }

  test("a fingerprint at exactly the cap still pairs (boundary is >cap)") {
    import spark.implicits._
    val cap = graft.queries.TextOps.Q352HotCap
    val atCap = (1L to cap.toLong).map(i => (i, "edge"))
    val ch = atCap.toDF("doc_id", "chunk_fp")
    val n = graft.queries.TextOps.chunkCollisionPairs(ch).count()
    assert(n == cap.toLong * (cap - 1) / 2,
      s"cap-sized fan-out must still pair (got $n)")
  }
}
