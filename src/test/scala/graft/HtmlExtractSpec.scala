package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HtmlExtract

/** HTML extraction: tag stripping as word boundaries, script/style/
  * comment payload skipping (case-insensitive closers), quoted '>' in
  * attributes, entity decoding (named + numeric), anchor-depth link
  * accounting, whitespace collapse, and malformed-input behavior. */
class HtmlExtractSpec extends AnyFunSuite {

  private def t(html: String) = HtmlExtract.extract(html)

  test("tags strip to word boundaries; whitespace collapses; trim holds") {
    assert(t("<p>hello</p><p>world</p>").text == "hello world")
    assert(t("  <div> a \n\t b </div>  ").text == "a b")
    assert(t("a<b>c</b>d").text == "a c d") // boundary, not concatenation
    assert(t("").text == "" && t("").chars == 0)
  }

  test("script/style payloads are skipped whole, case-insensitive") {
    assert(t("x<script>var a = '<p>not text</p>';</script>y").text == "x y")
    assert(t("x<SCRIPT TYPE='x'>if (a<b>c) {}</SCRIPT>y").text == "x y")
    assert(t("x<style>.c > .d { color: red }</style>y").text == "x y")
    // unterminated script drops the remainder, never leaks payload
    assert(t("x<script>var a = 1;").text == "x")
  }

  test("comments skip whole; quoted '>' inside attributes is not a close") {
    assert(t("a<!-- <p>gone</p> -->b").text == "a b")
    assert(t("a<!-- unterminated").text == "a")
    assert(t("""a<a href="/x?q>1">link</a>b""").text == "a link b")
    assert(t("""<img src='y>z'/>w""").text == "w")
  }

  test("entities: five named, decimal, hex; unknown stays literal") {
    assert(t("&amp;&lt;&gt;&quot;&apos;").text == "&<>\"'")
    assert(t("&#65;&#x42;&#x63;").text == "ABc")
    assert(t("a &nope; b").text == "a &nope; b")
    assert(t("a & b").text == "a & b") // bare ampersand
  }

  test("astral numeric references decode to surrogate pairs, not truncated chars") {
    val e = t("a &#128512; b") // 😀
    assert(e.text == "a 😀 b")
    assert(e.chars == 4) // UTF-16 units: a + 2 surrogates + b
    assert(t("&#x1F600;").text == "😀")
    // out-of-range and lone-surrogate references stay literal
    assert(t("&#1114112;").text == "&#1114112;") // 0x110000
    assert(t("&#xD800;").text == "&#xD800;")
  }

  test("unquoted attribute values with bare quotes never swallow the page") {
    assert(t("<p>keep <a title=O'Brien>x</a> rest of page</p>").text ==
      "keep x rest of page")
    assert(t("""<div data-x=a"b>text</div>""").text == "text")
  }

  test("anchor accounting: nested markup inside <a> counts; depth balanced") {
    val e = t("""<p>menu</p><a href="/"><b>home</b> page</a><p>body text here</p>""")
    assert(e.text == "menu home page body text here")
    assert(e.anchorChars == "homepage".length)
    assert(e.chars == "menuhomepagebodytexthere".length)
    assert(e.linkDensityPpm == "homepage".length.toLong * 1000000L / e.chars)
    // self-closed <a/> must not open a depth; </a> without <a> clamps at 0
    assert(t("<a/>x</a>y<a>z</a>").anchorChars == 1)
  }

  test("unclosed trailing tag drops the tail; empty page density is 0") {
    assert(t("ok<div class=").text == "ok")
    assert(t("<p></p>").linkDensityPpm == 0L)
  }
}
