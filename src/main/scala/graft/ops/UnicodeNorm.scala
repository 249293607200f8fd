package graft.ops

/** Unicode text normalization — the ingest step every LLM corpus runs
  * before tokenization: web text arrives with decomposed accents,
  * compatibility ligatures/fullwidth forms, non-breaking spaces and
  * invisible formatting characters, and a tokenizer that sees `ﬁ` and
  * `fi` (or `café` in NFC and NFD) as different strings fragments its
  * vocabulary and poisons dedup.
  *
  * Scope (all from the published Unicode standard, via the JDK's
  * built-in `java.text.Normalizer` — UAX #15):
  *  - NFKC normalization: canonical composition (NFD `e`+U+0301 →
  *    `é`) plus compatibility folding (ligature ﬁ → fi, fullwidth
  *    Ｘ → X, superscript ² → 2, NBSP → space);
  *  - removal of the default-ignorable formatting characters NFKC
  *    keeps: ZERO WIDTH SPACE/NON-JOINER/JOINER (U+200B..U+200D),
  *    BOM/ZWNBSP (U+FEFF), and SOFT HYPHEN (U+00AD) — the invisible
  *    dedup-poisoners.
  *
  * Pure, deterministic, per-row — q344 gates the outputs closed-form
  * against chr()-stated expectations in the oracle. */
object UnicodeNorm {

  private val Strip: Set[Char] = Set(
    '\u200B', // ZERO WIDTH SPACE
    '\u200C', // ZERO WIDTH NON-JOINER
    '\u200D', // ZERO WIDTH JOINER
    '\uFEFF', // ZERO WIDTH NO-BREAK SPACE / BOM
    '\u00AD') // SOFT HYPHEN
  def nfkcClean(s: String): String = {
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (!Strip.contains(c)) sb.append(c)
      i += 1
    }
    sb.toString
  }
}
