package graft.ops

/** URL canonicalization — the crawl-dedup primitive: the same page
  * arrives under `HTTP://Host:80/a/../b#x` and `http://host/b`, and a
  * corpus that doesn't canonicalize before URL-dedup keeps both (and
  * every `utm_*`-tagged variant) as "distinct" documents. Rules are
  * RFC 3986 §6 syntax-based normalization plus the one curation-side
  * convention every crawl pipeline adds:
  *
  *  - scheme and host lowercase (userinfo, path, query stay
  *    case-sensitive per the RFC);
  *  - default ports dropped (`:80` http, `:443` https);
  *  - fragment dropped;
  *  - percent-escapes of UNRESERVED characters decoded (`%41`→`A`,
  *    `%7E`→`~`); all surviving escapes uppercased (`%2f`→`%2F`);
  *  - dot-segments resolved (`/a/b/../c` → `/a/c`, never above root),
  *    trailing-slash intent preserved;
  *  - empty path → `/`;
  *  - tracking parameters stripped (`utm_*`, `gclid`, `fbclid` — the
  *    curation convention), remaining query order PRESERVED (sorting
  *    is not RFC-safe); an emptied query drops its `?`.
  *
  * Non-http(s) inputs pass through unchanged (a crawl pipeline routes
  * them elsewhere); malformed escapes stay literal. Pure string → the
  * q336 oracle states every expected output closed-form. */
object UrlOps {

  private def unreserved(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || c == '-' || c == '.' || c == '_' || c == '~'

  /** Decode unreserved %XX, uppercase the rest; malformed stays as-is. */
  private[graft] def normalizeEscapes(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (unreserved(v.toChar)) out += v.toChar
        else { out += '%'; out += Character.toUpperCase(s.charAt(i + 1))
               out += Character.toUpperCase(s.charAt(i + 2)) }
        i += 3
      } else { out += c; i += 1 }
    }
    out.result()
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** RFC 3986 §5.2.4 remove_dot_segments — faithfully: EMPTY segments
    * are segments (`/a//b` stays `/a//b`; two syntactically distinct
    * URLs must not canonicalize together, and `..` next to `//` pops
    * the empty segment, so `/a//../b` → `/a/b`). Never pops above
    * root; a trailing `.`/`..` leaves the directory slash. */
  private[graft] def resolveDots(path: String): String = {
    if (path.isEmpty) return "/"
    val body = if (path.startsWith("/")) path.substring(1) else path
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var dirish = false // last op implies a directory (trailing slash)
    body.split("/", -1).foreach {
      case "." => dirish = true
      case ".." =>
        if (out.nonEmpty) out.remove(out.length - 1)
        dirish = true
      case s => out += s; dirish = false
    }
    "/" + out.mkString("/") + (if (dirish && out.nonEmpty) "/" else "")
  }

  private val TrackingExact = Set("gclid", "fbclid")

  def normalize(url: String): String = {
    val t = url.trim
    val sep = t.indexOf("://")
    if (sep <= 0) return t
    val scheme = t.substring(0, sep).toLowerCase
    if (scheme != "http" && scheme != "https") return t
    val rest = t.substring(sep + 3)
    var authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (authEnd < 0) authEnd = rest.length
    val auth0 = rest.substring(0, authEnd)
    // userinfo stays case-sensitive; host (+port) lowercases
    val at = auth0.lastIndexOf('@')
    val (userinfo, hostPort) =
      if (at >= 0) (auth0.substring(0, at + 1), auth0.substring(at + 1).toLowerCase)
      else ("", auth0.toLowerCase)
    val defaultPort = if (scheme == "http") ":80" else ":443"
    val host =
      if (hostPort.endsWith(defaultPort))
        hostPort.substring(0, hostPort.length - defaultPort.length)
      else hostPort
    val tail = rest.substring(authEnd)
    val hash = tail.indexOf('#')
    val noFrag = if (hash >= 0) tail.substring(0, hash) else tail
    val q = noFrag.indexOf('?')
    val rawPath = if (q >= 0) noFrag.substring(0, q) else noFrag
    val rawQuery = if (q >= 0) noFrag.substring(q + 1) else null
    val path = resolveDots(normalizeEscapes(rawPath))
    val query =
      if (rawQuery == null) null
      else {
        val kept = normalizeEscapes(rawQuery).split("&", -1).filter { p =>
          val key = p.takeWhile(_ != '=')
          !(key.startsWith("utm_") || TrackingExact(key))
        }
        if (kept.isEmpty) null else kept.mkString("&")
      }
    s"$scheme://$userinfo$host$path" + (if (query != null) s"?$query" else "")
  }
}
