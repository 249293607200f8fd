package graft.ops

/** The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning…", §2.2 — the published heuristics behind the C4
  * corpus, reused by most web-scale text pipelines since):
  *
  *  LINE level — a line survives only if it
  *   1. ends in terminal punctuation (`.` `!` `?` `"`),
  *   2. carries at least 5 words,
  *   3. does not mention "javascript" (case-insensitive — the cookie/
  *      enable-JS boilerplate tell);
  *
  *  PAGE level — the whole page drops if it
  *   4. contains "lorem ipsum" (case-insensitive) or a curly brace
  *      (`{` — code, not prose),
  *   5. retains fewer than 3 lines after the line rules (the
  *      three-sentence floor, stated here on kept lines).
  *
  * Pure string logic (trim, suffix test, whitespace word count,
  * substring search) — per-row, shuffle-free, and exactly restatable
  * in SQL, which is how q338 gates it over pages built from the REAL
  * corpus words rather than synthetic strings. */
object C4Clean {

  final case class Cleaned(pageKept: Boolean, nLines: Int, nKept: Int,
                           cleaned: String)

  private val Terminal = Set('.', '!', '?', '"')

  def keepLine(line: String): Boolean = {
    val t = line.trim
    t.nonEmpty && Terminal(t.last) &&
      t.split("\\s+").length >= 5 &&
      !t.toLowerCase.contains("javascript")
  }

  def clean(page: String): Cleaned = {
    val pageDrop = page.toLowerCase.contains("lorem ipsum") || page.contains("{")
    val lines = page.split("\n", -1)
    val kept = lines.filter(keepLine)
    val pageKept = !pageDrop && kept.length >= 3
    Cleaned(pageKept, lines.length, kept.length,
      if (pageKept) kept.mkString("\n") else "")
  }
}
