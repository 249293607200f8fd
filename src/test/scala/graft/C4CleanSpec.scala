package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.C4Clean

/** C4 cleaning rules: each published rule pinned on its boundary —
  * terminal punctuation set, the 5-word floor, the javascript line
  * drop, lorem-ipsum/brace page drops, the 3-kept-lines floor, and the
  * cleaned-text join. */
class C4CleanSpec extends AnyFunSuite {

  private val good = "one two three four five."

  test("line rule 1: terminal punctuation set, exactly") {
    assert(C4Clean.keepLine(good))
    assert(C4Clean.keepLine("one two three four five!"))
    assert(C4Clean.keepLine("one two three four five?"))
    assert(C4Clean.keepLine("one two three four \"five\""))
    assert(!C4Clean.keepLine("one two three four five"))
    assert(!C4Clean.keepLine("one two three four five:"))
    assert(!C4Clean.keepLine("")) // empty line
    assert(!C4Clean.keepLine("   ")) // whitespace-only
  }

  test("line rule 2: the 5-word floor sits exactly at 5") {
    assert(!C4Clean.keepLine("one two three four."))
    assert(C4Clean.keepLine("one two three four five."))
    // trim + whitespace-run splitting: padding never changes the count
    assert(C4Clean.keepLine("  one  two   three four five.  "))
  }

  test("line rule 3: javascript drops the line case-insensitively") {
    assert(!C4Clean.keepLine("please enable JavaScript to continue here."))
    assert(!C4Clean.keepLine("please enable JAVASCRIPT to continue here."))
    assert(C4Clean.keepLine("java and script are separate words here."))
  }

  test("page rules: lorem ipsum / brace drop; three-kept-lines floor") {
    val threeGood = Seq(good, good, good).mkString("\n")
    assert(C4Clean.clean(threeGood).pageKept)
    assert(C4Clean.clean(threeGood).cleaned == threeGood)
    // only two survivors -> page dropped, cleaned empty
    val twoGood = Seq(good, "no punct line", good).mkString("\n")
    val c2 = C4Clean.clean(twoGood)
    assert(!c2.pageKept && c2.nKept == 2 && c2.cleaned == "")
    // page-level poison beats perfect lines
    assert(!C4Clean.clean(threeGood + "\nfine Lorem Ipsum text here.").pageKept)
    assert(!C4Clean.clean(threeGood + "\ncode { block } here okay.").pageKept)
    // counters survive the drop
    val cp = C4Clean.clean(threeGood + "\nx {")
    assert(cp.nLines == 4 && cp.nKept == 3 && !cp.pageKept)
  }
}
