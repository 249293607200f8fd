package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.JpegCodec
import graft.io.PngCodec.Image
import graft.ops.ImageOps

/** Baseline JPEG codec: exactness where the math promises it, bounded
  * loss elsewhere, in-stream tables proven live, scope refusals. */
class JpegCodecSpec extends AnyFunSuite {

  private def maxDiff(a: Image, b: Image): Int = {
    require(a.pixels.length == b.pixels.length)
    a.pixels.indices.map(i => math.abs((a.pixels(i) & 0xff) - (b.pixels(i) & 0xff))).max
  }

  test("flat 8x8-aligned gray content roundtrips EXACTLY (DC-only blocks)") {
    for (v <- Seq(0, 1, 42, 128, 200, 255)) {
      val img = Image(32, 16, 1, Array.fill[Byte](32 * 16)(v.toByte))
      val dec = JpegCodec.decode(JpegCodec.encode(img))
      assert(dec.width == 32 && dec.height == 16 && dec.channels == 1)
      assert(maxDiff(img, dec) == 0, s"flat $v not exact")
    }
  }

  test("smooth content roundtrips with tightly bounded error") {
    val grad = ImageOps.synth(48, 40, 0)
    val d1 = JpegCodec.decode(JpegCodec.encode(grad))
    assert(maxDiff(grad, d1) <= 6, s"gradient err ${maxDiff(grad, d1)}")
    val rgb = ImageOps.synth(33, 41, 3) // odd dims: edge-replication padding
    val d2 = JpegCodec.decode(JpegCodec.encode(rgb))
    assert(d2.width == 33 && d2.height == 41 && d2.channels == 3)
    assert(maxDiff(rgb, d2) <= 24, s"rgb err ${maxDiff(rgb, d2)}") // chroma transform cost
  }

  test("hard content (checker, noise) stays bounded; dims/channels survive") {
    val checker = ImageOps.synth(24, 24, 2)
    val dc = JpegCodec.decode(JpegCodec.encode(checker))
    assert(maxDiff(checker, dc) <= 48, s"checker err ${maxDiff(checker, dc)}")
    var s = 7L
    val noise = Image(17, 23, 3, Array.fill[Byte](17 * 23 * 3) {
      s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 40).toByte
    })
    val dn = JpegCodec.decode(JpegCodec.encode(noise))
    assert(dn.width == 17 && dn.height == 23 && dn.channels == 3)
  }

  test("decode is deterministic (golden-oracle precondition)") {
    val img = ImageOps.synth(40, 24, 3)
    val enc = JpegCodec.encode(img)
    val a = JpegCodec.decode(enc).pixels
    val b = JpegCodec.decode(JpegCodec.encode(img)).pixels
    assert(java.util.Arrays.equals(a, b))
  }

  test("quantization tables are READ FROM THE STREAM, not assumed") {
    val img = ImageOps.synth(32, 32, 0)
    val enc = JpegCodec.encode(img)
    val base = JpegCodec.decode(enc).pixels.clone()
    // find the DQT segment (FF DB), coarsen every AC entry in-place —
    // JPEG has no checksums, so a conformant decoder must honor the edit
    var p = 2
    var dqt = -1
    while (dqt < 0) {
      val m = enc(p + 1) & 0xff
      if (m == 0xdb) dqt = p + 5 // skip marker, len, PqTq
      else p += 2 + (((enc(p + 2) & 0xff) << 8) | (enc(p + 3) & 0xff))
    }
    val patched = enc.clone()
    for (i <- 1 until 64)
      patched(dqt + i) = math.min(255, (patched(dqt + i) & 0xff) * 4).toByte
    val coarse = JpegCodec.decode(patched).pixels
    assert(!java.util.Arrays.equals(base, coarse),
      "decoder ignored the in-stream quantization table")
  }

  test("unsupported shapes are refused, never mis-decoded") {
    val enc = JpegCodec.encode(ImageOps.synth(16, 16, 3))
    def patch(f: Array[Byte] => Unit): Array[Byte] = {
      val b = enc.clone(); f(b); b
    }
    // locate SOF0
    var p = 2
    while ((enc(p + 1) & 0xff) != 0xc0)
      p += 2 + (((enc(p + 2) & 0xff) << 8) | (enc(p + 3) & 0xff))
    val sofBody = p + 4
    val e1 = intercept[IllegalArgumentException](
      JpegCodec.decode(patch(_(p + 1) = 0xc2.toByte))) // progressive
    assert(e1.getMessage.contains("progressive"))
    val e2 = intercept[IllegalArgumentException](
      JpegCodec.decode(patch(_(sofBody + 7) = 0x22.toByte))) // 2x2 subsampling
    assert(e2.getMessage.contains("subsampling"))
    val e3 = intercept[IllegalArgumentException](
      JpegCodec.decode(patch(_(sofBody) = 12.toByte))) // 12-bit
    assert(e3.getMessage.contains("8-bit"))
    val bad = enc.clone(); bad(1) = 0x00
    intercept[IllegalArgumentException](JpegCodec.decode(bad)) // no SOI
    intercept[Exception](
      JpegCodec.decode(java.util.Arrays.copyOf(enc, enc.length / 2))) // truncated
  }

  test("encoder Huffman tables are canonical and 16-bit-capped") {
    // skewed frequencies force long codes; the cap + all-ones reservation
    // must still yield a decodable stream (roundtrip proves both sides)
    val w = 64; val h = 64
    var s = 1L
    val px = Array.tabulate[Byte](w * h) { i =>
      s = s * 2862933555777941757L + 3037000493L
      if (i % 97 == 0) (s >>> 40).toByte else (i % 7 * 3).toByte
    }
    val img = Image(w, h, 1, px)
    val dec = JpegCodec.decode(JpegCodec.encode(img))
    assert(dec.pixels.length == img.pixels.length)
  }
}
