package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Align

/** Forced alignment: DP optimality vs exhaustive path enumeration,
  * span structure invariants, the tie-break convention, traceback cost
  * consistency, and the scope refusals. */
class AlignSpec extends AnyFunSuite {

  /** All monotonic alignments enumerated — ground truth on small grids. */
  private def bruteBest(nT: Int, nF: Int, lc: (Int, Int) => Long): Long = {
    var best = Long.MaxValue
    def rec(f: Int, t: Int, acc: Long): Unit = {
      val a = acc + lc(t, f)
      if (f == nF - 1) { if (t == nT - 1 && a < best) best = a }
      else {
        rec(f + 1, t, a)
        if (t + 1 < nT) rec(f + 1, t + 1, a)
      }
    }
    rec(0, 0, 0L)
    best
  }

  test("DP total equals exhaustive enumeration on every small grid") {
    for (nT <- 1 to 4; nF <- nT to 8; salt <- Seq(0, 5, 11)) {
      val lc = (t: Int, f: Int) => ((f * 7 + t * 13 + salt) % 101).toLong
      val (total, spans) = Align.forcedAlign(nT, nF, lc)
      assert(total == bruteBest(nT, nF, lc), s"nT=$nT nF=$nF salt=$salt")
      // the traceback's spans re-sum to the reported total
      val resum = spans.map(s =>
        (s.startFrame to s.endFrame).map(f => lc(s.token, f)).sum).sum
      assert(resum == total, s"nT=$nT nF=$nF salt=$salt traceback mismatch")
    }
  }

  test("spans partition the frames: contiguous, non-empty, in order") {
    val lc = (t: Int, f: Int) => ((f * 3 + t * 17) % 53).toLong
    val (_, spans) = Align.forcedAlign(6, 40, lc)
    assert(spans.length == 6)
    assert(spans.head.startFrame == 0 && spans.last.endFrame == 39)
    spans.foreach(s => assert(s.endFrame >= s.startFrame, s"empty span $s"))
    spans.sliding(2).foreach { case Array(a, b) =>
      assert(b.startFrame == a.endFrame + 1, s"gap between $a and $b")
      assert(b.token == a.token + 1)
    }
  }

  test("tie-break: per-cell STAY preference → earliest boundaries on ties") {
    // constant cost: every path ties. A cell keeps its stay-path unless
    // advancing is strictly cheaper, so cells first become reachable via
    // the FORCED advance at frame t — the traceback lands on the
    // earliest-boundary alignment (slack on the last token).
    val (total, spans) = Align.forcedAlign(3, 10, (_, _) => 4L)
    assert(total == 40L)
    assert(spans.toSeq == Seq(Align.TokenSpan(0, 0, 0),
      Align.TokenSpan(1, 1, 1), Align.TokenSpan(2, 2, 9)))
  }

  test("degenerate shapes: one token takes all; nF == nT is one-each") {
    val lc = (t: Int, f: Int) => (t + f).toLong
    val (_, one) = Align.forcedAlign(1, 12, lc)
    assert(one.toSeq == Seq(Align.TokenSpan(0, 0, 11)))
    val (_, tight) = Align.forcedAlign(5, 5, lc)
    assert(tight.zipWithIndex.forall { case (s, i) =>
      s.startFrame == i && s.endFrame == i })
  }

  test("refusals: infeasible grid, zero tokens, out-of-range cost") {
    assert(intercept[IllegalArgumentException](
      Align.forcedAlign(5, 4, (_, _) => 1L)).getMessage.contains("infeasible"))
    assert(intercept[IllegalArgumentException](
      Align.forcedAlign(0, 4, (_, _) => 1L)).getMessage.contains("token"))
    assert(intercept[IllegalArgumentException](
      Align.forcedAlign(2, 4, (_, _) => -1L)).getMessage.contains("out of range"))
    assert(intercept[IllegalArgumentException](
      Align.forcedAlign(2, 4, (_, _) => Align.Inf)).getMessage.contains("out of range"))
    // per-cell costs near the sentinel would let ACCUMULATED path costs
    // cross Inf and corrupt reachability — refused up front via Inf/nFrames
    assert(intercept[IllegalArgumentException](
      Align.forcedAlign(2, 3, (_, _) => 600000000000000L))
      .getMessage.contains("out of range"))
    // just under the per-cell cap: feasible, exact, no corruption
    val cap = Align.Inf / 3 - 1
    val (bigTotal, bigSpans) = Align.forcedAlign(2, 3, (_, _) => cap)
    assert(bigTotal == 3 * cap && bigSpans.length == 2)
  }
}
