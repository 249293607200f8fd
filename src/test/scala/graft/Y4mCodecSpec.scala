package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Y4mCodec
import Y4mCodec.{Clip, Frame}

/** Y4M codec: header grammar (defaults, tolerated params), roundtrips
  * across colorspaces, the BT.601 integer vectors, temporal sampling,
  * and the scope refusals (interlace, foreign colorspaces, truncation,
  * unknown parameters). */
class Y4mCodecSpec extends AnyFunSuite {

  private def mkFrames(n: Int, ySize: Int, cSize: Int): Vector[Frame] =
    (0 until n).map { f =>
      Frame(Array.tabulate(ySize)(i => (i * 3 + f).toByte),
            Array.tabulate(cSize)(i => (i * 5 + f).toByte),
            Array.tabulate(cSize)(i => (i * 7 + f).toByte))
    }.toVector

  test("C420 roundtrip: header fields, frame count, plane bytes exact") {
    val clip = Clip(16, 8, 30, 1, "C420jpeg", mkFrames(3, 128, 32))
    val dec = Y4mCodec.decode(Y4mCodec.encode(clip))
    assert(dec.width == 16 && dec.height == 8 &&
      dec.fpsNum == 30 && dec.fpsDen == 1 && dec.frames.length == 3)
    clip.frames.zip(dec.frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.y, b.y))
      assert(java.util.Arrays.equals(a.u, b.u))
      assert(java.util.Arrays.equals(a.v, b.v))
    }
  }

  test("C444 and Cmono roundtrip; per-frame params tolerated") {
    val c444 = Clip(5, 3, 24, 1, "C444", mkFrames(2, 15, 15))
    assert(Y4mCodec.decode(Y4mCodec.encode(c444)).frames.length == 2)
    val mono = Clip(5, 3, 24, 1, "Cmono", mkFrames(2, 15, 0))
    val dm = Y4mCodec.decode(Y4mCodec.encode(mono))
    assert(dm.frames.length == 2 && dm.frames.head.u.isEmpty)
    // a FRAME line carrying a parameter must still parse
    val withParam = new String(Y4mCodec.encode(mono), "ISO-8859-1")
      .replaceFirst("FRAME\n", "FRAME Xtag=1\n").getBytes("ISO-8859-1")
    assert(Y4mCodec.decode(withParam).frames.length == 2)
  }

  test("header defaults: missing C is C420jpeg; A and X tolerated") {
    val body = mkFrames(1, 4, 1)
    val bytes = ("YUV4MPEG2 W2 H2 F25:1 A4:3 Xconverted\n" +
      "FRAME\n").getBytes("ISO-8859-1") ++ body.head.y ++ body.head.u ++ body.head.v
    val dec = Y4mCodec.decode(bytes)
    assert(dec.colorspace == "C420jpeg" && dec.frames.length == 1)
  }

  test("BT.601 integer vectors: black, white, primary red; clipping") {
    assert(Y4mCodec.yuvToRgb(16, 128, 128) == ((0, 0, 0)))
    assert(Y4mCodec.yuvToRgb(235, 128, 128) == ((255, 255, 255)))
    assert(Y4mCodec.yuvToRgb(81, 90, 240) == ((255, 0, 0))) // the classic red
    // below-range Y clips to 0, never negative
    assert(Y4mCodec.yuvToRgb(0, 128, 128) == ((0, 0, 0)))
  }

  test("temporal sampling is pure index arithmetic") {
    assert(Y4mCodec.sampleIndices(7, 2) == Seq(0, 2, 4, 6))
    assert(Y4mCodec.sampleIndices(7, 3, offset = 1) == Seq(1, 4))
    assert(Y4mCodec.sampleIndices(0, 2) == Seq.empty)
    assert(intercept[IllegalArgumentException](
      Y4mCodec.sampleIndices(5, 0)).getMessage.contains("sampling"))
  }

  test("refusals: interlace, foreign colorspace, odd 4:2:0 dims, unknown " +
       "param, bad magic, truncation, garbage between frames") {
    def hdr(s: String) = (s + "\nFRAME\n").getBytes("ISO-8859-1") ++ new Array[Byte](6)
    assert(intercept[IllegalArgumentException](Y4mCodec.decode(
      hdr("YUV4MPEG2 W2 H2 F25:1 It"))).getMessage.contains("interlaced"))
    assert(intercept[IllegalArgumentException](Y4mCodec.decode(
      hdr("YUV4MPEG2 W2 H2 F25:1 C422"))).getMessage.contains("C422"))
    assert(intercept[IllegalArgumentException](Y4mCodec.decode(
      hdr("YUV4MPEG2 W3 H2 F25:1 C420jpeg"))).getMessage.contains("even"))
    assert(intercept[IllegalArgumentException](Y4mCodec.decode(
      hdr("YUV4MPEG2 W2 H2 F25:1 Q9"))).getMessage.contains("unknown"))
    assert(intercept[IllegalArgumentException](Y4mCodec.decode(
      hdr("YUV4MPEG3 W2 H2 F25:1"))).getMessage.contains("magic"))
    val good = Y4mCodec.encode(Clip(4, 4, 25, 1, "C420jpeg", mkFrames(2, 16, 4)))
    assert(intercept[IllegalArgumentException](
      Y4mCodec.decode(good.take(good.length - 3))).getMessage.contains("truncated"))
    val corrupted = good.clone()
    // overwrite the second FRAME marker with junk
    val second = new String(good, "ISO-8859-1").indexOf("FRAME", 20)
    corrupted(second) = 'G'
    assert(intercept[IllegalArgumentException](
      Y4mCodec.decode(corrupted)).getMessage.contains("FRAME marker"))
  }
}
