package graft.ops

/** The Gopher repetition/quality rules (Rae et al. 2021, table A1 —
  * the published filter set behind MassiveText, reused by RefinedWeb/
  * FineWeb-class pipelines): documents dominated by repeated n-grams
  * are SEO spam and boilerplate, not prose, and survive simpler
  * length/punctuation gates. Implemented here, integer-exact:
  *
  *  - word count within [50, 100000];
  *  - mean word length within [3, 10] chars;
  *  - fraction of characters in the MOST FREQUENT word 2-gram ≤ 0.20
  *    (tie-break: lexicographically smallest gram — the determinism
  *    real pipelines need for reproducible corpora);
  *  - fraction of characters in DUPLICATED 5-grams (count ≥ 2) ≤ 0.15.
  *
  * Definitions stated exactly (the paper leaves them loose): a gram's
  * text is its words joined by single spaces; its character coverage
  * is `occurrences × length(gram)`; fractions are ppm of the
  * document's total character length, floor-divided — so every number
  * is a BIGINT both engines compute identically, and q339 gates the
  * whole rule set over the REAL corpus text with no synthetic fixture
  * at all. Coverage may exceed 1.0 for pathologically repetitive text
  * (overlapping occurrences each count); the thresholds are far below
  * that regime. Per-document, per-row, shuffle-free.
  *
  * The symbol-ratio / bullet-line / alpha-word rules of A1 are
  * line-and-punctuation shaped and live with the C4 set (q338) —
  * this operator is the REPETITION half. */
object GopherQuality {

  final case class Stats(nWords: Int, meanLenPpm: Long, top2Ppm: Long,
                         dup5Ppm: Long, kept: Boolean)

  def stats(text: String): Stats = {
    val words = text.split(" ").filter(_.nonEmpty)
    val n = words.length
    val totalChars = text.length.toLong
    if (n == 0 || totalChars == 0L) return Stats(0, 0L, 0L, 0L, kept = false)
    val meanLenPpm = words.map(_.length.toLong).sum * 1000000L / n
    def gramAt(i: Int, k: Int): String = words.slice(i, i + k).mkString(" ")
    def fracPpm(k: Int, dupOnly: Boolean): Long = {
      if (n < k) return 0L
      val counts = scala.collection.mutable.Map.empty[String, Int]
      var i = 0
      while (i + k <= n) { val g = gramAt(i, k); counts(g) = counts.getOrElse(g, 0) + 1; i += 1 }
      val covered: Long =
        if (dupOnly)
          counts.iterator.collect { case (g, c) if c >= 2 => c.toLong * g.length }.sum
        else {
          // most frequent gram, ties to the lexicographically smallest
          val (g, c) = counts.toSeq.minBy { case (gr, ct) => (-ct, gr) }
          c.toLong * g.length
        }
      covered * 1000000L / totalChars
    }
    val top2 = fracPpm(2, dupOnly = false)
    val dup5 = fracPpm(5, dupOnly = true)
    val kept = n >= 50 && n <= 100000 &&
      meanLenPpm >= 3000000L && meanLenPpm <= 10000000L &&
      top2 <= 200000L && dup5 <= 150000L
    Stats(n, meanLenPpm, top2, dup5, kept)
  }
}
