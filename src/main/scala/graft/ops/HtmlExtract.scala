package graft.ops

/** HTML → training text extraction — the step every web-scale corpus
  * (Common Crawl WET, C4, RefinedWeb) runs first: strip markup, drop
  * script/style/comment payloads, decode entities, collapse
  * whitespace, and measure LINK DENSITY (anchor-text share — the
  * classic boilerplate/navigation signal: link-heavy pages are menus,
  * not prose). The reference pipeline never faces HTML; its north-star
  * generalization does, because scraped speech/text corpora arrive as
  * pages.
  *
  * This is a real single-pass TAG WALKER, not a regex pile: quoted
  * attribute values may contain `>`, `<script>`/`<style>` bodies are
  * skipped to their case-insensitive closers, `<!-- -->` comments are
  * skipped whole, every other tag becomes a word boundary, and the
  * five named entities plus decimal/hex numeric references decode.
  * Anchor depth is tracked so the extractor reports how many of the
  * emitted characters sat inside `<a>` — link density with zero extra
  * passes. Per-row, shuffle-free; at 100 TB it rides the scan like the
  * codecs.
  *
  * Conventions (stated, spec-pinned): all non-skipped text is kept
  * (title included); unknown `&entity;` stays literal; whitespace runs
  * collapse to one space and the result is trimmed; character counts
  * are NON-SPACE output chars. */
object HtmlExtract {

  final case class Extracted(text: String, chars: Int, anchorChars: Int) {
    /** Link density in ppm of non-space chars (0 for empty pages). */
    def linkDensityPpm: Long =
      if (chars == 0) 0L else anchorChars.toLong * 1000000L / chars
  }

  private val Entities = Map("amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'')

  def extract(html: String): Extracted = {
    val out = new StringBuilder
    var chars = 0
    var anchorChars = 0
    var anchorDepth = 0
    var pendingSpace = false
    def emit(c: Char): Unit = {
      if (c.isWhitespace) { if (out.nonEmpty) pendingSpace = true }
      else {
        if (pendingSpace) { out += ' '; pendingSpace = false }
        out += c
        chars += 1
        if (anchorDepth > 0) anchorChars += 1
      }
    }
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          if (out.nonEmpty) pendingSpace = true // comments bound words too
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3 // unterminated comment: drop rest
        } else {
          // scan the tag, honoring quoted attribute values (which may
          // hold '>'); name = leading letters after '<' or '</'
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && html.charAt(j).isLetter) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // quote state only opens at an ATTRIBUTE-VALUE position (right
          // after '='): a bare apostrophe in an unquoted value
          // (title=O'Brien) must not swallow the rest of the document
          var quote: Char = 0
          var expectVal = false
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val cj = html.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if (cj == '=') expectVal = true
            else if (expectVal && (cj == '"' || cj == '\'')) { quote = cj; expectVal = false }
            else if (expectVal && !cj.isWhitespace) expectVal = false
            j += 1
          }
          val selfClosed = !closing && j - 1 > nameStart && html.charAt(j - 1) == '/'
          val tagEnd = if (j < n) j + 1 else n // unclosed tag: drop rest
          if (out.nonEmpty) pendingSpace = true // every tag is a word boundary
          if (!closing && (name == "script" || name == "style")) {
            // skip the raw payload to the case-insensitive closer
            val closer = s"</$name"
            var k = tagEnd
            var found = -1
            while (found < 0 && k + closer.length <= n) {
              if (html.regionMatches(true, k, closer, 0, closer.length)) found = k
              else k += 1
            }
            i = if (found < 0) n
                else math.max(found, html.indexOf('>', found)) + 1
          } else {
            if (name == "a" && !selfClosed) {
              if (closing) anchorDepth = math.max(0, anchorDepth - 1)
              else anchorDepth += 1
            }
            i = tagEnd
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val body = if (semi > i && semi - i <= 10) html.substring(i + 1, semi) else null
        // astral code points (&#128512;) expand to their surrogate PAIR —
        // Int.toChar truncation would emit private-use garbage. Counting
        // convention: UTF-16 units (Java string length semantics).
        def codepoint(cp: Int): Option[String] =
          if (cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
            Some(new String(Character.toChars(cp)))
          else None
        val decoded: Option[String] =
          if (body == null) None
          else if (Entities.contains(body)) Some(Entities(body).toString)
          else if (body.startsWith("#x") || body.startsWith("#X"))
            scala.util.Try(Integer.parseInt(body.drop(2), 16)).toOption.flatMap(codepoint)
          else if (body.startsWith("#"))
            scala.util.Try(body.drop(1).toInt).toOption.flatMap(codepoint)
          else None
        decoded match {
          case Some(s) => s.foreach(emit); i = semi + 1
          case None => emit('&'); i += 1 // unknown/invalid entity stays literal
        }
      } else {
        emit(c)
        i += 1
      }
    }
    Extracted(out.result(), chars, anchorChars)
  }
}
