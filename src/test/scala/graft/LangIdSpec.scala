package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q356's Cavnar–Trenkle classifier, pinned for MEANING beyond the hash
  * gate: the oracle replays the same algebra, so a profile/distance bug
  * that misclassifies every Spanish doc as Portuguese would still hash-
  * match. These rows assert the decisions themselves: each Latin test
  * shape classifies to its true language, and non-Latin shapes route by
  * script without entering the classifier. */
class LangIdSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("every Latin shape classifies to its true language; CJK shapes " +
       "route by script") {
    val out = graft.queries.TextOps.q356(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 500, "one row per document")
    val expected = Map(0L -> "en", 1L -> "es", 2L -> "de",
      3L -> "fr", 4L -> "it", 5L -> "pt", 6L -> "han", 7L -> "hangul")
    out.foreach { r =>
      val (id, shape, route, lang) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))
      assert(lang == expected(shape),
        s"doc $id shape $shape: expected ${expected(shape)}, got $lang")
      if (shape >= 6) {
        assert(route == "script" && r.isNullAt(4),
          s"doc $id: non-Latin docs must route by script with NULL dist")
      } else {
        assert(route == "ct" && !r.isNullAt(4) && r.getLong(4) > 0,
          s"doc $id: Latin docs must carry a positive CT distance")
      }
    }
  }

  test("profiles are exactly K ranked grams per language, ranks 1..K") {
    val k = graft.queries.TextOps.Q356K
    val profs = graft.queries.TextOps.q356Profiles
    val byLang = profs.groupBy(_._1)
    assert(byLang.keySet == Set("de", "en", "es", "fr", "it", "pt"))
    byLang.foreach { case (lang, rows) =>
      assert(rows.map(_._3).sorted == (1 to k), s"$lang ranks must be 1..$k")
      assert(rows.map(_._2).distinct.size == k, s"$lang grams must be unique")
    }
  }

  test("q369's real-corpus decision is majority English (the corpus IS " +
       "English keyword text), every doc routed Latin -> ct") {
    val out = graft.queries.TextOps.q369(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 500, "one row per document")
    assert(out.forall(_.getString(1) == "ct"), "gate corpus is all-Latin")
    val en = out.count(_.getString(2) == "en")
    assert(en * 2 > out.length,
      s"majority must read en on English keyword text, got $en/${out.length}")
  }
}
