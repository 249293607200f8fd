package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RobotsTxt

/** robots.txt: parsing (groups, comments, unknown directives, empty
  * Disallow), group selection by longest agent prefix, pattern
  * wildcards and anchors, longest-match precedence with the Allow
  * tie, and the permissive defaults. */
class RobotsTxtSpec extends AnyFunSuite {

  private val txt =
    """# corpus crawler policy
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/pub$
      |Disallow: /tmp*
      |Crawl-delay: 10
      |
      |User-agent: graftbot
      |User-agent: graftbot-image
      |Allow: /data/
      |Disallow: /data/secret/
      |Disallow:
      |
      |Sitemap: https://h.example.com/sitemap.xml
      |""".stripMargin

  private val r = RobotsTxt.parse(txt)

  test("parse: groups, multi-agent headers, comments, unknown keys, sitemaps") {
    assert(r.groups.length == 2)
    assert(r.groups(0).agents == Seq("*") && r.groups(0).rules.length == 3)
    assert(r.groups(1).agents == Seq("graftbot", "graftbot-image"))
    assert(r.groups(1).rules.length == 2) // the empty Disallow is a no-op
    assert(r.sitemaps == Seq("https://h.example.com/sitemap.xml"))
  }

  test("group selection: longest agent-token prefix; * fallback; none = allowed") {
    // the merged group carries the crawler identity; assert on which
    // RULES won — graftbot-image (14) beats graftbot (8) beats * (-1)
    assert(RobotsTxt.selectGroup(r, "GraftBot-Image/2.0").get.rules ==
      r.groups(1).rules)
    assert(RobotsTxt.selectGroup(r, "otherbot").get.rules == r.groups(0).rules)
    val noStar = RobotsTxt.parse("User-agent: onlybot\nDisallow: /\n")
    assert(RobotsTxt.selectGroup(noStar, "unrelated").isEmpty)
    assert(RobotsTxt.isAllowed(noStar, "unrelated", "/anything"))
    assert(!RobotsTxt.isAllowed(noStar, "onlybot-v2", "/anything"))
  }

  test("pattern matching: prefix, * wildcard, $ anchor") {
    assert(RobotsTxt.matches("/a/", "/a/b"))
    assert(!RobotsTxt.matches("/a/", "/ab"))
    assert(RobotsTxt.matches("/tmp*", "/tmpfile"))
    assert(RobotsTxt.matches("/*/x", "/any/deep/x"))
    assert(RobotsTxt.matches("/p$", "/p"))
    assert(!RobotsTxt.matches("/p$", "/pq"))
    assert(RobotsTxt.matches("/a*b$", "/a-quite-long-b"))
    assert(!RobotsTxt.matches("/a*b$", "/a-quite-long-bc"))
    // multi-star shapes stay linear (the matcher backtracks to the last
    // star only) and correct
    assert(RobotsTxt.matches("/*a*b*c$", "/xxaxxbxxc"))
    assert(!RobotsTxt.matches("/*a*b*c$", "/xxaxxbxxd"))
    val hostile = "/" + "a*" * 30 + "b$"
    assert(!RobotsTxt.matches(hostile, "/" + "a" * 200)) // returns fast
    assert(RobotsTxt.matches(hostile, "/" + "a" * 200 + "b"))
  }

  test("precedence: longest pattern wins; exact tie resolves to Allow") {
    // /private/pub matches Allow '/private/pub$' (13) > Disallow '/private/' (9)
    assert(RobotsTxt.isAllowed(r, "otherbot", "/private/pub"))
    assert(!RobotsTxt.isAllowed(r, "otherbot", "/private/pubx")) // anchor fails
    assert(!RobotsTxt.isAllowed(r, "otherbot", "/private/other"))
    assert(!RobotsTxt.isAllowed(r, "otherbot", "/tmpanything"))
    assert(RobotsTxt.isAllowed(r, "otherbot", "/ok"))
    // selected group EXCLUDES the * rules: graftbot sees no /private/ rule
    assert(RobotsTxt.isAllowed(r, "graftbot", "/private/anything"))
    assert(!RobotsTxt.isAllowed(r, "graftbot", "/data/secret/f"))
    assert(RobotsTxt.isAllowed(r, "graftbot", "/data/open"))
    // explicit tie: same-length Allow and Disallow
    val tie = RobotsTxt.parse("User-agent: *\nAllow: /dir/\nDisallow: /dir/\n")
    assert(RobotsTxt.isAllowed(tie, "any", "/dir/x"))
  }

  test("comment-only lines: a bare '#' or '#####' separator must parse") {
    // "#".split("#") is an EMPTY array in Java — the old split-based
    // comment stripper crashed on exactly this remote-controlled shape
    val sep = RobotsTxt.parse(
      "#\n#####\nUser-agent: *\n#####\nDisallow: /a/\n# tail\n")
    assert(!RobotsTxt.isAllowed(sep, "any", "/a/x"))
    assert(RobotsTxt.isAllowed(sep, "any", "/b"))
  }

  test("RFC 9309 2.2.1: all groups at the winning specificity combine") {
    // two `User-agent: *` groups — legal, common; the second must not
    // be shadowed by the first
    val multi = RobotsTxt.parse(
      """User-agent: *
        |Disallow: /one/
        |User-agent: bot
        |Allow: /
        |User-agent: *
        |Disallow: /two/
        |""".stripMargin)
    assert(!RobotsTxt.isAllowed(multi, "other", "/one/x"))
    assert(!RobotsTxt.isAllowed(multi, "other", "/two/x")) // union, not first-wins
    assert(RobotsTxt.isAllowed(multi, "other", "/three/x"))
    // the literal-token group still shadows BOTH * groups
    assert(RobotsTxt.isAllowed(multi, "bot", "/one/x"))
    assert(RobotsTxt.isAllowed(multi, "bot", "/two/x"))
    // two groups matching the same literal specificity also combine
    val twoLit = RobotsTxt.parse(
      "User-agent: bot\nDisallow: /p/\nUser-agent: bot\nDisallow: /q/\n")
    assert(!RobotsTxt.isAllowed(twoLit, "bot/1.0", "/p/x"))
    assert(!RobotsTxt.isAllowed(twoLit, "bot/1.0", "/q/x"))
  }
}
