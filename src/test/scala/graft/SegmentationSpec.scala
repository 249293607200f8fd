package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Segmentation
import graft.ops.Segmentation.Interval

/** Boundary + property tests for the interval algebra (SURVEY §5.1-5.2).
  * Properties use raw ScalaCheck generators with a fixed seed walk (the
  * scalatest-scalacheck bridge artifact is not among the pinned deps). */
class SegmentationSpec extends AnyFunSuite {

  /** Deterministic 200-case property driver. */
  private def forAllSampled[A](gen: Gen[A])(check: A => Unit): Unit =
    (0 until 200).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  test("splitLong: exactly 15 s is NOT split") {
    assert(Segmentation.splitLong(Seq(Interval(0, 15000))) == Seq(Interval(0, 15000)))
  }

  test("splitLong: 15 s + 1 ms splits into 15 s + 1 ms chunks") {
    assert(Segmentation.splitLong(Seq(Interval(0, 15001))) ==
      Seq(Interval(0, 15000), Interval(15000, 15001)))
  }

  test("splitLong: 40 s splits into 15/15/10") {
    assert(Segmentation.splitLong(Seq(Interval(500, 40500))) ==
      Seq(Interval(500, 15500), Interval(15500, 30500), Interval(30500, 40500)))
  }

  test("mergeGreedy: gap counts toward the 15 s span budget (pa.py:140)") {
    // two 7 s intervals with a 2 s gap: span 16 s > 15 s => NOT merged
    val r = Segmentation.mergeGreedy(Seq(Interval(0, 7000), Interval(9000, 16000)))
    assert(r == Seq(Interval(0, 7000), Interval(9000, 16000)))
    // with a 1 s gap: span 15 s => merged
    val m = Segmentation.mergeGreedy(Seq(Interval(0, 7000), Interval(8000, 15000)))
    assert(m == Seq(Interval(0, 15000)))
  }

  test("mergeGreedy: trailing short segment dropped (pa.py:131)") {
    val r = Segmentation.mergeGreedy(Seq(Interval(0, 5000), Interval(20000, 21000)))
    assert(r == Seq(Interval(0, 5000)))
  }

  test("mergeGreedy: single short interval dropped, single long kept") {
    assert(Segmentation.mergeGreedy(Seq(Interval(0, 2999))).isEmpty)
    assert(Segmentation.mergeGreedy(Seq(Interval(0, 3000))) == Seq(Interval(0, 3000)))
    assert(Segmentation.mergeGreedy(Nil).isEmpty)
  }

  test("mergeGreedy: merged run of shorts that individually fail the minimum") {
    // 1 s intervals every 2 s: all merge within 15 s span, total span >= 3 s
    val in = (0 until 5).map(i => Interval(i * 2000L, i * 2000L + 1000))
    assert(Segmentation.mergeGreedy(in) == Seq(Interval(0, 9000)))
  }

  test("pad: clamps to [0, len]") {
    assert(Segmentation.pad(Interval(100, 14900), 15000) == Interval(0, 15000))
    assert(Segmentation.pad(Interval(500, 1000), 20000) == Interval(300, 1200))
  }

  private val intervalsGen: Gen[List[Interval]] = for {
    n <- Gen.choose(0, 30)
    starts <- Gen.listOfN(n, Gen.choose(0L, 100000L))
    durs <- Gen.listOfN(n, Gen.choose(1L, 20000L))
  } yield {
    // strictly ordered, non-overlapping, as VAD guarantees
    var cursor = 0L
    starts.sorted.zip(durs).map { case (s, d) =>
      val st = math.max(s, cursor + 1)
      cursor = st + d
      Interval(st, st + d)
    }
  }

  test("property: merged output intervals have span in [3000, +inf) and respect ordering") {
    forAllSampled(intervalsGen) { in =>
      val out = Segmentation.mergeGreedy(Segmentation.splitLong(in))
      out.foreach { iv => assert(iv.endMs - iv.startMs >= 3000) }
      out.sliding(2).foreach {
        case Seq(a, b) => assert(a.endMs <= b.startMs || a.startMs < b.startMs)
        case _ =>
      }
      // outputs are clipped unions of inputs: bounds come from input endpoints
      val starts = in.flatMap(iv => Segmentation.splitLong(Seq(iv))).map(_.startMs).toSet
      out.foreach(iv => assert(starts.contains(iv.startMs)))
    }
  }

  test("property: splitLong output durations never exceed 15 s and cover the input") {
    forAllSampled(intervalsGen) { in =>
      val out = Segmentation.splitLong(in)
      out.foreach(iv => assert(iv.endMs - iv.startMs <= 15000 && iv.endMs > iv.startMs))
      assert(out.map(iv => iv.endMs - iv.startMs).sum == in.map(iv => iv.endMs - iv.startMs).sum)
    }
  }

  test("detectNonSilent: silence-only returns empty; all-loud returns whole") {
    val rate = 16000
    val silence = new Array[Float](rate * 2)
    assert(Segmentation.detectNonSilent(silence, rate).isEmpty)
    val loud = Array.fill(rate * 2)(0.5f)
    assert(Segmentation.detectNonSilent(loud, rate) == Seq(Interval(0, 2000)))
  }

  test("detectNonSilent: clip shorter than the window is wholly non-silent") {
    val rate = 16000
    val short = Array.fill(rate / 10)(0.5f) // 100 ms
    assert(Segmentation.detectNonSilent(short, rate) == Seq(Interval(0, 100)))
  }

  test("detectNonSilent: finds a loud burst inside silence") {
    val rate = 16000
    val n = rate * 3
    val s = new Array[Float](n)
    // 1 s burst at t=1 s
    (rate until 2 * rate).foreach(i => s(i) = (0.5 * math.sin(2 * math.Pi * 440 * i / rate)).toFloat)
    val r = Segmentation.detectNonSilent(s, rate)
    assert(r.size == 1)
    val iv = r.head
    // pydub-style boundaries land within one window of the true burst edges
    assert(math.abs(iv.startMs - 1000) <= 300 && math.abs(iv.endMs - 2000) <= 300)
  }
}
