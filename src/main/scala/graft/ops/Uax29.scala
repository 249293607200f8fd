package graft.ops

import java.text.BreakIterator
import java.util.Locale

/** UAX #29 text segmentation — the tokenizer-grade splitter next to
  * q49's regex pre-tokenizer: word boundaries and extended grapheme
  * clusters per the published Unicode standard (UAX #29), via two JDK
  * surfaces that implement it:
  *
  *  - WORDS: `java.text.BreakIterator.getWordInstance` (root locale),
  *    keeping only segments that contain a letter or digit — the
  *    standard "word-like" filter, so punctuation and whitespace
  *    segments drop while MidLetter (`don't`) and MidNum (`3.14`,
  *    `1,000`) sequences stay whole, combining marks extend their
  *    base (NFD `cafe`+U+0301 is ONE word), and format characters
  *    (ZWSP) never split a word;
  *  - GRAPHEMES: `java.util.regex` `\X` (extended grapheme clusters),
  *    so an NFD accent pair, a Devanagari virama cluster, or a
  *    ZWJ-joined emoji family each count as ONE user-perceived
  *    character where `length()` sees 2, 3, or 8.
  *
  * Pure, deterministic, per-row; q347 gates both surfaces closed-form
  * over multi-script shapes (Latin, Han, Hangul, Devanagari, emoji
  * ZWJ, NFD accents, zero-width space) with chr()-stated expectations
  * in the oracle — q344's recipe applied to segmentation. */
object Uax29 {

  private val Grapheme = java.util.regex.Pattern.compile("\\X")

  /** UAX #29 word segments containing at least one letter or digit. */
  def words(s: String): Vector[String] = {
    val bi = BreakIterator.getWordInstance(Locale.ROOT)
    bi.setText(s)
    val out = Vector.newBuilder[String]
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      val w = s.substring(start, end)
      if (w.codePoints().anyMatch((cp: Int) => Character.isLetterOrDigit(cp)))
        out += w
      start = end
      end = bi.next()
    }
    out.result()
  }

  /** Extended grapheme cluster count per UAX #29. */
  def graphemeCount(s: String): Long = {
    val m = Grapheme.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  /** UAX #29 sentence segments (JDK BreakIterator, root locale), each
    * trimmed of surrounding whitespace. The DEFAULT rules have no
    * abbreviation list — "Dr. Smith" splits after "Dr." while
    * "5 p.m. sharp" holds (the next word is lowercase); "No... maybe."
    * holds through the ellipsis. q348 pins the behavior closed-form. */
  def sentences(s: String): Vector[String] = {
    val bi = BreakIterator.getSentenceInstance(Locale.ROOT)
    bi.setText(s)
    val out = Vector.newBuilder[String]
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      out += s.substring(start, end).trim
      start = end
      end = bi.next()
    }
    out.result()
  }
}
