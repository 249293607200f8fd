package graft.ops

/** robots.txt evaluation (RFC 9309 / the Google REP spec) — crawl
  * POLITENESS: a pipeline that ingests WARC archives (q337) but cannot
  * answer "was this fetch allowed?" cannot audit its own corpus for
  * compliance, and exclusion auditing is a standard curation report.
  *
  * Semantics implemented (all from the published spec):
  *  - groups: consecutive `User-agent:` lines head a group; `Allow:` /
  *    `Disallow:` rules bind to the nearest preceding group; `#`
  *    comments and unknown directives are ignored; `Sitemap:` lines
  *    are group-independent and collected;
  *  - group selection: the agent token that is the LONGEST
  *    case-insensitive prefix of the crawler's product token wins;
  *    `*` is the fallback (specificity below every literal token);
  *    ALL groups matching at the winning specificity combine into one
  *    rule union (RFC 9309 §2.2.1 — repeated `User-agent: *` groups
  *    are legal and must not shadow each other);
  *  - rule matching: patterns match path PREFIXES, `*` matches any
  *    char sequence, a trailing `$` anchors the end;
  *  - precedence: the longest matching pattern wins (specificity =
  *    the written pattern's length, `$` included — stated since the
  *    spec counts octets loosely); an Allow/Disallow TIE resolves to
  *    Allow; no matching rule means allowed.
  *
  * Pure string logic, deterministic — q340 gates verdicts closed-form
  * across group selection, longest-match, the allow tie, wildcards,
  * anchors, and the fallback. */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule])
  final case class Robots(groups: Seq[Group], sitemaps: Seq[String])

  def parse(text: String): Robots = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    }
    text.linesIterator.foreach { raw =>
      // comments strip to end of line; takeWhile (not split) so a line
      // that is ONLY '#'s — a bare separator, common in real files —
      // yields an empty string instead of an empty split array
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { flush(); inRules = false }
            agents += value.toLowerCase
          case "allow" | "disallow" =>
            inRules = true
            // an empty Disallow means "allow everything" per spec —
            // representable as a rule that never matches; skip it
            if (value.nonEmpty) rules += Rule(key == "allow", value)
          case "sitemap" => sitemaps += value
          case _ => () // unknown directives are ignored per spec
        }
      }
    }
    flush()
    Robots(groups.toSeq, sitemaps.toSeq)
  }

  /** `*` wildcard / trailing-`$` anchor pattern match against `path`.
    * An UNANCHORED pattern matches a path PREFIX, which is exactly
    * `pattern + "*"` matched in full — so both cases run through one
    * linear two-pointer glob (backtracking to the last star only:
    * O(|path|·|pattern|) worst case, never exponential — robots.txt
    * content is remote-controlled input at crawl scale, and a
    * recursive matcher with nested stars is a DoS surface). */
  private[graft] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = (if (anchored) pattern.dropRight(1) else pattern + "*")
    glob(pat, path)
  }

  private def glob(pat: String, s: String): Boolean = {
    var pi = 0; var si = 0
    var star = -1; var mark = 0
    while (si < s.length) {
      if (pi < pat.length && pat.charAt(pi) == '*') { star = pi; mark = si; pi += 1 }
      else if (pi < pat.length && pat.charAt(pi) == s.charAt(si)) { pi += 1; si += 1 }
      else if (star >= 0) { pi = star + 1; mark += 1; si = mark }
      else return false
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** The effective rule set for `agent`: longest agent-token prefix
    * match picks the winning specificity, `*` is the fallback, and —
    * per RFC 9309 §2.2.1 — ALL groups matching at that specificity
    * COMBINE (two `User-agent: *` groups are legal and common; their
    * rules evaluate as one union). None when nothing applies. */
  private[graft] def selectGroup(r: Robots, agent: String): Option[Group] = {
    val a = agent.toLowerCase
    val candidates = r.groups.flatMap { g =>
      g.agents.collect {
        case t if t == "*" => (-1, g)
        case t if a.startsWith(t) => (t.length, g)
      }
    }
    if (candidates.isEmpty) None
    else {
      val best = candidates.map(_._1).max
      val merged =
        candidates.filter(_._1 == best).map(_._2).distinct.flatMap(_.rules)
      Some(Group(Seq(a), merged))
    }
  }

  def isAllowed(r: Robots, agent: String, path: String): Boolean =
    selectGroup(r, agent) match {
      case None => true
      case Some(g) =>
        val hits = g.rules.filter(rl => matches(rl.pattern, path))
        if (hits.isEmpty) true
        else {
          val best = hits.map(_.pattern.length).max
          // tie at max specificity resolves to Allow
          hits.exists(rl => rl.pattern.length == best && rl.allow)
        }
    }
}
