package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BpeTrainer

/** BPE trainer: exact agreement with an independent greedy reference
  * (including the overlap-chain rule on runs like "aaaa"), the
  * deterministic tie-break, delimiter wrapping, empty/degenerate docs,
  * and the exhaustion refusal. */
class BpeTrainerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Independent reference: token lists + greedy left-to-right merge. */
  private def reference(docs: Seq[(Long, String)], k: Int)
      : (Seq[(Int, String, String, Long)], Map[Long, Seq[String]]) = {
    var toks: Map[Long, Seq[String]] =
      docs.map { case (d, t) => d -> (t.map(_.toString).toList: Seq[String]) }.toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    (1 to k).foreach { rank =>
      val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
      toks.values.foreach { l =>
        l.sliding(2).filter(_.size == 2).foreach { p =>
          cnt((p(0), p(1))) = cnt.getOrElse((p(0), p(1)), 0L) + 1
        }
      }
      val ((a, b), n) = cnt.toSeq.sortBy { case ((x, y), m) => (-m, x, y) }.head
      merges += ((rank, a, b, n))
      toks = toks.map { case (d, l) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < l.size) {
          if (i + 1 < l.size && l(i) == a && l(i + 1) == b) { out += (a + b); i += 2 }
          else { out += l(i); i += 1 }
        }
        (d, out.toSeq)
      }
    }
    (merges.toSeq, toks)
  }

  private def run(docs: Seq[(Long, String)], k: Int)
      : (Seq[(Int, String, String, Long)], Map[Long, Seq[String]]) = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "txt")
      .select(col("doc_id"), BpeTrainer.delimited(col("txt")).as("s"))
    val (merges, fin) = BpeTrainer.train(spark, df, k)
    val toks = fin.collect().map { r =>
      r.getLong(0) -> r.getString(1).split("\\|").filter(_.nonEmpty).toSeq
    }.toMap
    (merges.map(m => (m.rank, m.left, m.right, m.count)), toks)
  }

  test("exact agreement with the reference, incl. the aaaa overlap chain") {
    val docs = Seq(0L -> "aabab", 1L -> "abab", 2L -> "aaaa", 3L -> "banana band")
    for (k <- Seq(1, 3, 6)) {
      val (gm, gt) = run(docs, k)
      val (rm, rt) = reference(docs, k)
      assert(gm == rm, s"k=$k merges")
      assert(gt == rt, s"k=$k tokenizations")
    }
    // the chain rule specifically: after merge (a,a), "aaaa" is (aa)(aa)
    val (m1, t1) = run(Seq(0L -> "aaaa"), 1)
    assert(m1.head._2 == "a" && m1.head._3 == "a")
    assert(t1(0L) == Seq("aa", "aa"))
  }

  test("tie-break is (count DESC, left ASC, right ASC)") {
    // "xy" and "ab" both occur once; 'a' < 'x' wins
    val (m, _) = run(Seq(0L -> "xy", 1L -> "ab"), 1)
    assert(m.head._2 == "a" && m.head._3 == "b")
  }

  test("delimiter wrapping and empty docs") {
    import spark.implicits._
    val s = Seq("ab c").toDF("t")
      .select(BpeTrainer.delimited(col("t"))).head().getString(0)
    assert(s == "|a||b|| ||c|")
    val empty = Seq("").toDF("t")
      .select(BpeTrainer.delimited(col("t"))).head().getString(0)
    assert(empty == "")
    // empty docs ride along without contributing pairs
    val (m, t) = run(Seq(0L -> "abab", 1L -> ""), 1)
    assert(m.head._2 == "a" && m.head._3 == "b")
    assert(t(1L) == Seq.empty)
  }

  test("exhaustion refuses loudly instead of looping") {
    // one single-char doc: no adjacent pairs exist
    val e = intercept[IllegalArgumentException](run(Seq(0L -> "a"), 1))
    assert(e.getMessage.contains("exhausted"))
  }
}
