package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GopherQuality

/** Gopher repetition rules: exact ppm arithmetic, the 2-gram argmax
  * tie-break, overlapping-duplicate 5-gram coverage, every threshold
  * boundary, and degenerate inputs. */
class GopherQualitySpec extends AnyFunSuite {

  test("word count, mean length, empty/degenerate inputs") {
    val s = GopherQuality.stats("ab abc abcd")
    assert(s.nWords == 3)
    assert(s.meanLenPpm == 9L * 1000000 / 3) // (2+3+4)/3 = 3.0 chars
    assert(!s.kept) // 3 words < the 50-word floor
    assert(GopherQuality.stats("").nWords == 0)
    assert(!GopherQuality.stats("").kept)
    assert(GopherQuality.stats("a  b").nWords == 2) // double space filtered
  }

  test("top 2-gram coverage: counts, char math, lexicographic tie-break") {
    // "x y x y z": grams (x y)x2, (y x)x1, (y z)x1 -> top is 'x y', cov 2*3
    val s = GopherQuality.stats("x y x y z")
    assert(s.top2Ppm == 2L * 3 * 1000000 / 9)
    // all grams tie at 1 -> lexicographically smallest wins ('a b' vs 'b c')
    val t = GopherQuality.stats("b c a b")
    // grams: 'b c','c a','a b' each x1 -> 'a b' chosen, cov 3
    assert(t.top2Ppm == 3L * 1000000 / 7)
  }

  test("duplicated 5-gram coverage counts every occurrence") {
    // 'a b c d e' twice in a row: 5-grams at positions 0..5; the gram
    // 'a b c d e' occurs at 0 and 5 -> dup coverage = 2 * 9 chars
    val text = "a b c d e a b c d e"
    val s = GopherQuality.stats(text)
    assert(s.dup5Ppm == 2L * 9 * 1000000 / text.length)
    // no duplicates -> zero
    assert(GopherQuality.stats("a b c d e f g h i j").dup5Ppm == 0L)
  }

  test("verdict boundaries: each rule flips kept independently") {
    def words(n: Int, w: String = "abcd") = Seq.fill(n)(w).mkString(" ")
    // 50 distinct-ish words, mean 4, no repetition beyond the rules:
    val clean = (0 until 50).map(i => f"wd$i%03d").mkString(" ")
    assert(GopherQuality.stats(clean).kept)
    assert(!GopherQuality.stats((0 until 49).map(i => f"wd$i%03d").mkString(" ")).kept)
    // mean word length below 3 fails
    assert(!GopherQuality.stats(Seq.fill(60)("ab").mkString(" ")).kept)
    // heavy 2-gram repetition fails even at good length/width
    assert(!GopherQuality.stats(words(60)).kept)
    val s = GopherQuality.stats(words(60))
    assert(s.top2Ppm > 200000L && s.dup5Ppm > 150000L)
  }
}
