package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q354's empty/whitespace-document row, pinned beyond the gate corpus
  * (which contains no token-less documents): the lexical-diversity
  * output must stay truly per-document — a doc that tokenizes to
  * nothing gets counts 0 and NULL ratios, never a silently missing
  * row (the docs a richness signal most needs to flag). */
class LexicalDiversitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("empty and whitespace-only docs keep a row with 0 counts, NULL ratios") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c"),  // 4 tokens, 3 types, hapax {b, c}
      (2L, ""),         // empty
      (3L, "   \t  "),  // whitespace-only
      (4L, "x x x")     // 3 tokens, 1 type, 0 hapax
    ).toDF("doc_id", "text")
    val out = graft.queries.TextOps.lexicalDiversity(docs)
      .orderBy("doc_id").collect()
    assert(out.length == 4, "every document must keep a row")
    val r1 = out(0)
    assert(r1.getLong(1) == 4L && r1.getLong(2) == 3L && r1.getLong(3) == 2L)
    assert(r1.getLong(4) == 3L * 1000000L / 4L)
    assert(r1.getLong(5) == 2L * 1000000L / 3L)
    Seq(out(1), out(2)).foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L,
        s"doc ${r.getLong(0)}: token-less doc must carry zero counts")
      assert(r.isNullAt(4) && r.isNullAt(5),
        s"doc ${r.getLong(0)}: ratios of a token-less doc must be NULL")
    }
    val r4 = out(3)
    assert(r4.getLong(1) == 3L && r4.getLong(2) == 1L && r4.getLong(3) == 0L)
    assert(r4.getLong(4) == 1000000L / 3L && r4.getLong(5) == 0L)
  }

  test("q355 self-entropy shares q354's row universe: token-less docs " +
       "keep a row with 0 counts, NULL bits (round-16 advice)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c"), // n=4: bits(4)=2; c_a=2 → 2·(2−1)=2; b,c → 2·2 = 6 bits
      (2L, ""),
      (3L, "   \t  "),
      (4L, "x x x")    // n=3: bits(3)=1, c_x=3 → 3·(1−1)=0 bits (pure repetition)
    ).toDF("doc_id", "text")
    val out = graft.queries.TextOps.unigramEntropy(docs)
      .orderBy("doc_id").collect()
    assert(out.length == 4, "every document must keep a row")
    val r1 = out(0)
    assert(r1.getLong(1) == 4L && r1.getLong(2) == 3L && r1.getLong(3) == 6L)
    assert(r1.getLong(4) == 6L * 1000000L / 4L)
    Seq(out(1), out(2)).foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L,
        s"doc ${r.getLong(0)}: token-less doc must carry zero counts")
      assert(r.isNullAt(3) && r.isNullAt(4),
        s"doc ${r.getLong(0)}: bits of a token-less doc must be NULL")
    }
    val r4 = out(3)
    assert(r4.getLong(1) == 3L && r4.getLong(2) == 1L && r4.getLong(3) == 0L &&
      r4.getLong(4) == 0L, "pure repetition must read zero self-entropy")
    // row universes agree doc-for-doc with q354 — the join consumers rely on
    val lhs = graft.queries.TextOps.lexicalDiversity(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(lhs.sameElements(out.map(_.getLong(0)).sorted))
  }
}
