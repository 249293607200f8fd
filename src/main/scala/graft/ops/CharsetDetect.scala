package graft.ops

/** Charset detection/decoding — the step between a fetched byte body
  * (WARC, q337) and text processing (HtmlExtract, q335): real web
  * bytes are a mix of UTF-8 and legacy windows-1252, headers lie, and
  * decoding everything as UTF-8 turns smart quotes into mojibake that
  * poisons tokenizers. The web convention (whatwg encoding standard):
  * honor a UTF-8 BOM, accept STRICT UTF-8, otherwise fall back to
  * windows-1252 (which never fails — every byte maps).
  *
  * Strict UTF-8 validation is the RFC 3629 state machine: correct
  * continuation structure, NO overlong encodings (C0 80 is not NUL),
  * no surrogate code points, nothing above U+10FFFF — exactly the
  * forms attackers use to smuggle bytes past validators. The CP1252
  * high half (0x80–0x9F) is the published table (unicode.org
  * CP1252.TXT); the five unmapped bytes (81 8D 8F 90 9D) decode to
  * their C1 controls per the whatwg standard, and 0xA0–0xFF is
  * Latin-1 identity. Pure functions, per-row, shuffle-free. */
object CharsetDetect {

  /** CP1252 0x80–0x9F → Unicode (unicode.org CP1252.TXT; unmapped
    * bytes keep their C1 control value per whatwg). */
  private[graft] val Cp1252High: Array[Int] = Array(
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178)

  /** Strict RFC 3629 validation: structure, overlongs, surrogates,
    * the U+10FFFF ceiling. */
  def validUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else {
        val (len, min) =
          if (c >= 0xC2 && c <= 0xDF) (2, 0x80)
          else if (c >= 0xE0 && c <= 0xEF) (3, 0x800)
          else if (c >= 0xF0 && c <= 0xF4) (4, 0x10000)
          else return false // C0/C1 (overlong leads), F5+ and bare continuations
        if (i + len > n) return false
        var cp = c & (0x3f >> (len - 1))
        var k = 1
        while (k < len) {
          val cc = b(i + k) & 0xff
          if ((cc & 0xc0) != 0x80) return false
          cp = (cp << 6) | (cc & 0x3f)
          k += 1
        }
        if (cp < min || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF))
          return false
        i += len
      }
    }
    true
  }

  private def cp1252(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length)
    b.foreach { x =>
      val v = x & 0xff
      sb += (if (v >= 0x80 && v <= 0x9F) Cp1252High(v - 0x80).toChar else v.toChar)
    }
    sb.result()
  }

  /** (text, charset): charset ∈ utf-8-bom / utf-8 / windows-1252. A
    * BOM with an INVALID body falls back to windows-1252 over the
    * whole input (BOM bytes included — they were not a BOM). */
  def decode(bytes: Array[Byte]): (String, String) = {
    val hasBom = bytes.length >= 3 && (bytes(0) & 0xff) == 0xEF &&
      (bytes(1) & 0xff) == 0xBB && (bytes(2) & 0xff) == 0xBF
    if (hasBom) {
      val body = java.util.Arrays.copyOfRange(bytes, 3, bytes.length)
      if (validUtf8(body)) return (new String(body, "UTF-8"), "utf-8-bom")
    } else if (validUtf8(bytes)) {
      return (new String(bytes, "UTF-8"), "utf-8")
    }
    (cp1252(bytes), "windows-1252")
  }
}
