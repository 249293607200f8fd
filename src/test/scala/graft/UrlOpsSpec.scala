package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.UrlOps

/** URL canonicalization: RFC 3986 syntax normalization (case, default
  * ports, escapes, dot segments, fragments), the tracking-param
  * convention, pass-through scope, and idempotence. */
class UrlOpsSpec extends AnyFunSuite {

  private def n(u: String) = UrlOps.normalize(u)

  test("scheme/host case, default ports, fragments") {
    assert(n("HTTP://Example.COM:80/a#frag") == "http://example.com/a")
    assert(n("https://WWW.Site.ORG:443/x") == "https://www.site.org/x")
    assert(n("http://h.io:8080/x") == "http://h.io:8080/x") // non-default kept
    assert(n("https://h.io:80/x") == "https://h.io:80/x")   // :80 not https default
    // userinfo stays case-sensitive; host after '@' lowercases
    assert(n("http://User:PW@Host.COM/p") == "http://User:PW@host.com/p")
  }

  test("dot segments resolve per RFC, never above root; slash intent kept") {
    assert(n("http://h.io/a/b/c/./../../g") == "http://h.io/a/g")
    assert(n("http://h.io/../../x") == "http://h.io/x")
    assert(n("http://h.io/a/b/..") == "http://h.io/a/")
    assert(n("http://h.io/a/./") == "http://h.io/a/")
    assert(n("http://h.io") == "http://h.io/") // empty path
  }

  test("empty segments are segments: '//' preserved, '..' pops the empty one") {
    // two syntactically distinct resources must not canonicalize together
    assert(n("http://h.io/a//b") == "http://h.io/a//b")
    assert(n("http://h.io/a//b") != n("http://h.io/a/b"))
    // RFC remove_dot_segments: '..' pops the EMPTY segment, not 'a'
    assert(n("http://h.io/a//../b") == "http://h.io/a/b")
    assert(n("http://h.io/a//.") == "http://h.io/a//")
    assert(n("http://h.io/../") == "http://h.io/")
  }

  test("percent escapes: unreserved decode, reserved uppercase, malformed literal") {
    assert(n("https://h.io/%7Euser/%41bc") == "https://h.io/~user/Abc")
    assert(n("https://h.io/a%2fb") == "https://h.io/a%2Fb") // '/' stays escaped
    assert(n("https://h.io/a%2") == "https://h.io/a%2")     // malformed literal
    assert(n("https://h.io/a%GG") == "https://h.io/a%GG")
  }

  test("tracking params strip; remaining order preserved; emptied query drops '?'") {
    assert(n("http://h.io/p?utm_source=tw&q=2&utm_campaign=c&z=1") ==
      "http://h.io/p?q=2&z=1")
    assert(n("http://h.io/p?gclid=g&fbclid=f") == "http://h.io/p")
    assert(n("http://h.io/p?b=2&a=1") == "http://h.io/p?b=2&a=1") // never sorted
  }

  test("scope: non-http(s) passes through unchanged; idempotence") {
    assert(n("ftp://Other.Host/Z") == "ftp://Other.Host/Z")
    assert(n("mailto:a@b.c") == "mailto:a@b.c")
    for (u <- Seq("HTTP://Example.COM:80/a/b/../c?x=1#f",
                  "https://h.io/%7Ea%2fb?utm_source=x&k=v")) {
      val once = n(u)
      assert(n(once) == once, s"not idempotent on $u")
    }
  }
}
