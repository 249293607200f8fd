package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Uax29

/** UAX #29 segmentation (q347's operator): word boundaries and extended
  * grapheme clusters over multi-script shapes. The q-entry gates the
  * full shape sweep against chr()-stated oracle literals; these rows pin
  * the boundary RULES the sweep relies on, one rule per assertion. */
class Uax29Spec extends AnyFunSuite {

  test("runtime JDK/Unicode version matches the oracle-literal pin " +
       "(JDK 17 / Unicode 13.0)") {
    // q347/q348/q350's DuckDB oracles state BreakIterator word/sentence
    // boundaries, \X grapheme clusters, and Character.UnicodeScript
    // counts as FROZEN literals, probed empirically on JDK 17 (Unicode
    // 13.0). A JDK upgrade ships newer UCD tables (e.g. Unicode 15.1's
    // GB9c conjunct-cluster rule changes Devanagari grapheme counts) and
    // would silently move the Spark side while the literals stay put —
    // this assertion turns that gate break into a named diagnosis
    // (constant staleness, not an engine bug): re-probe the literals
    // with the scripts in the q347/q348/q350 scaladocs, then re-pin here.
    assert(Runtime.version().feature() == 17,
      s"oracle literals pinned against JDK 17 (Unicode 13.0); running " +
      s"JDK ${Runtime.version().feature()} — re-probe q347/q348/q350 " +
      "oracle constants and update this pin")
  }

  test("MidLetter and MidNum keep contractions and numbers whole") {
    assert(Uax29.words("don't stop, it's 3.14 or 1,000") ==
      Vector("don't", "stop", "it's", "3.14", "or", "1,000"))
  }

  test("punctuation and whitespace segments drop; letters/digits survive") {
    assert(Uax29.words("a -- b!! 7?") == Vector("a", "b", "7"))
    assert(Uax29.words("...") == Vector.empty)
    assert(Uax29.words("") == Vector.empty)
  }

  test("combining marks extend their base: NFD accent stays in the word") {
    val nfd = "cafe\u0301 au lait"
    assert(Uax29.words(nfd) == Vector("cafe\u0301", "au", "lait"))
    // the NFD pair is ONE grapheme: 13 UTF-16 units, 12 clusters
    assert(Uax29.graphemeCount(nfd) == 12L)
  }

  test("format characters never split a word (ZWSP inside)") {
    assert(Uax29.words("x\u200By") == Vector("x\u200By"))
    // …but the ZWSP is its own grapheme cluster
    assert(Uax29.graphemeCount("x\u200By") == 3L)
  }

  test("ZWJ emoji family is one grapheme cluster (8 UTF-16 units)") {
    val fam = "\uD83D\uDC68\u200D\uD83D\uDC69\u200D\uD83D\uDC67"
    assert(fam.length == 8)
    assert(Uax29.graphemeCount(fam) == 1L)
    // not letter/digit → filtered from the word list
    assert(Uax29.words(s"hi $fam ok") == Vector("hi", "ok"))
  }

  test("Devanagari virama clusters: 11 codepoints, 6 graphemes, 2 words") {
    val s = "\u0939\u093F\u0928\u094D\u0926\u0940 \u092D\u093E\u0937\u093E"
    assert(s.codePointCount(0, s.length) == 11)
    assert(Uax29.words(s).size == 2)
    assert(Uax29.graphemeCount(s) == 6L)
  }

  test("Hangul syllables segment on space; Han run groups with its number") {
    assert(Uax29.words("\uD55C\uAD6D\uC5B4 \uBB38\uC11C") ==
      Vector("\uD55C\uAD6D\uC5B4", "\uBB38\uC11C"))
    assert(Uax29.words("\u4EF7\u683C\u662F1,000\u5143") ==
      Vector("\u4EF7\u683C\u662F", "1,000", "\u5143"))
  }
}
