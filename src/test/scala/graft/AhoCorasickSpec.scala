package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AhoCorasick

/** ops/AhoCorasick contracts: all-occurrences counting (overlaps
  * included) against a brute-force oracle, the classic failure-link
  * fixture, early-exit membership, and broadcast serializability. */
class AhoCorasickSpec extends AnyFunSuite {

  private def brute(text: String, pat: String): Long =
    (0 to text.length - pat.length).count(i => text.startsWith(pat, i)).toLong

  test("classic fixture: he/she/his/hers over 'ushers'") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    assert(ac.countAll("ushers").toSeq == Seq(1L, 1L, 0L, 1L))
  }

  test("overlapping occurrences are all counted") {
    val ac = AhoCorasick.build(Seq("aba", "aa"))
    assert(ac.countAll("ababa").toSeq == Seq(2L, 0L))
    assert(ac.countAll("aaaa").toSeq == Seq(0L, 3L))
  }

  test("randomized property: counts equal brute force") {
    val rnd = new scala.util.Random(42)
    val pats = Seq("ab", "ba", "aab", "bba", "abab", "b")
    val ac = AhoCorasick.build(pats)
    (1 to 200).foreach { _ =>
      val text = Array.fill(rnd.nextInt(80) + 1)(
        if (rnd.nextBoolean()) 'a' else 'b').mkString
      val got = ac.countAll(text).toSeq
      val want = pats.map(brute(text, _))
      assert(got == want, s"text=$text got=$got want=$want")
    }
  }

  test("containsAny early-exits correctly") {
    val ac = AhoCorasick.build(Seq("needle", "pin"))
    assert(ac.containsAny("haystack with a needle inside"))
    assert(ac.containsAny("pinpoint"))
    assert(!ac.containsAny("nothing to see"))
  }

  test("survives java serialization (the broadcast path)") {
    val ac = AhoCorasick.build(Seq("table", "value", "spark a"))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(ac)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[AhoCorasick]
    val t = "spark a table of value value"
    assert(back.countAll(t).toSeq == ac.countAll(t).toSeq)
  }
}
