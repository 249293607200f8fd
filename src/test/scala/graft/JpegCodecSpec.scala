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
    // SOF2 is SUPPORTED now — but relabeling a BASELINE stream as
    // progressive yields an interleaved Ss=0,Se=63 scan, which is
    // malformed under SOF2 and must refuse, never mis-decode
    val e1 = intercept[IllegalArgumentException](
      JpegCodec.decode(patch(_(p + 1) = 0xc2.toByte)))
    assert(e1.getMessage.contains("Se=0"))
    val e2 = intercept[IllegalArgumentException](
      JpegCodec.decode(patch(_(sofBody + 7) = 0x50.toByte))) // H=5: out of spec
    assert(e2.getMessage.contains("sampling factors"))
    val e3 = intercept[IllegalArgumentException](
      JpegCodec.decode(patch(_(sofBody) = 12.toByte))) // 12-bit
    assert(e3.getMessage.contains("8-bit"))
    val bad = enc.clone(); bad(1) = 0x00
    intercept[IllegalArgumentException](JpegCodec.decode(bad)) // no SOI
    intercept[Exception](
      JpegCodec.decode(java.util.Arrays.copyOf(enc, enc.length / 2))) // truncated
  }

  test("4:2:0 chroma subsampling: luma near-exact, chroma bounded, dims survive") {
    // smooth RGB gradients: subsampled chroma is a box mean of a gentle
    // ramp, so the reconstruction stays within a tight envelope
    for ((w, h) <- Seq((32, 32), (33, 41), (17, 23), (48, 40))) {
      val rgb = ImageOps.synth(w, h, 3)
      val enc = JpegCodec.encode(rgb, subsample = true)
      val dec = JpegCodec.decode(enc)
      assert(dec.width == w && dec.height == h && dec.channels == 3)
      assert(maxDiff(rgb, dec) <= 40, s"4:2:0 ${w}x$h err ${maxDiff(rgb, dec)}")
    }
    // the stream really IS subsampled: SOF declares 2x2 luma / 1x1 chroma
    // (size comparisons are content-dependent — a block-aligned checker is
    // DC-only at 4:4:4 but AC-dense at half-res — so pin the structure)
    val enc420 = JpegCodec.encode(ImageOps.synth(48, 64, 3), subsample = true)
    var p = 2
    while ((enc420(p + 1) & 0xff) != 0xc0)
      p += 2 + (((enc420(p + 2) & 0xff) << 8) | (enc420(p + 3) & 0xff))
    assert((enc420(p + 4 + 7) & 0xff) == 0x22, "SOF must declare 2x2 luma")
    assert((enc420(p + 4 + 10) & 0xff) == 0x11, "SOF must declare 1x1 chroma")
    // and a smooth gradient — the honest size case — does get smaller
    val smooth = ImageOps.synth(64, 48, 3)
    // kind 3's third channel is a checker; build an all-gradient RGB
    val rgbSmooth = Image(64, 48, 3, Array.tabulate[Byte](64 * 48 * 3) { i =>
      val pix = i / 3; val c = i % 3
      val x = pix % 64; val y = pix / 64
      (if (c == 0) x * 255 / 63 else if (c == 1) y * 255 / 47
       else (x * 255 / 63 + y * 255 / 47) / 2).toByte
    })
    assert(smooth.channels == 3)
    val s444 = JpegCodec.encode(rgbSmooth).length
    val s420 = JpegCodec.encode(rgbSmooth, subsample = true).length
    assert(s420 < s444, s"4:2:0 ($s420) not smaller than 4:4:4 ($s444) on smooth RGB")
    // GRAY content through 4:2:0: chroma planes are flat 128 (DC-only),
    // so the luma path alone decides — matches the 1-channel bound
    val grayRgb = {
      val g = ImageOps.synth(40, 32, 0)
      Image(40, 32, 3, Array.tabulate[Byte](40 * 32 * 3)(i => g.pixels(i / 3)))
    }
    assert(maxDiff(grayRgb, JpegCodec.decode(JpegCodec.encode(grayRgb,
      subsample = true))) <= 8)
  }

  test("4:2:2 (horizontal-only) subsampling: the (2,1) decode path on real streams") {
    for ((w, h) <- Seq((32, 32), (33, 41), (17, 23))) {
      val rgb = ImageOps.synth(w, h, 3)
      val enc = JpegCodec.encode(rgb, subsample = true, chroma = "422")
      // SOF declares 2x1 luma / 1x1 chroma
      var p = 2
      while ((enc(p + 1) & 0xff) != 0xc0)
        p += 2 + (((enc(p + 2) & 0xff) << 8) | (enc(p + 3) & 0xff))
      assert((enc(p + 4 + 7) & 0xff) == 0x21, "SOF must declare 2x1 luma")
      assert((enc(p + 4 + 10) & 0xff) == 0x11, "SOF must declare 1x1 chroma")
      val dec = JpegCodec.decode(enc)
      assert(dec.width == w && dec.height == h && dec.channels == 3)
      // horizontal-only averaging loses less than 4:2:0 on these fixtures
      assert(maxDiff(rgb, dec) <= 40, s"4:2:2 ${w}x$h err ${maxDiff(rgb, dec)}")
    }
    // 4:2:2 composes with restart intervals like every other layout
    val rgb = ImageOps.synth(48, 40, 3)
    val a = JpegCodec.decode(JpegCodec.encode(rgb, subsample = true, chroma = "422"))
    val b = JpegCodec.decode(JpegCodec.encode(rgb, subsample = true,
      chroma = "422", restartInterval = 3))
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
  }

  test("restart intervals: DRI/RSTn streams decode identically to unrestarted") {
    for (kind <- 0 to 3; ri <- Seq(1, 2, 7)) {
      val img = ImageOps.synth(33, 41, kind)
      val plain = JpegCodec.decode(JpegCodec.encode(img))
      val rst = JpegCodec.decode(JpegCodec.encode(img, restartInterval = ri))
      assert(java.util.Arrays.equals(plain.pixels, rst.pixels),
        s"kind=$kind ri=$ri decode differs from unrestarted")
    }
    // restarts compose with 4:2:0 (the camera-JPEG shape)
    val rgb = ImageOps.synth(48, 40, 3)
    val a = JpegCodec.decode(JpegCodec.encode(rgb, subsample = true))
    val b = JpegCodec.decode(JpegCodec.encode(rgb, subsample = true,
      restartInterval = 2))
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
  }

  test("restart resync: a corrupted MCU run damages ONLY its interval") {
    // 64x64 gray gradient, 1 MCU per restart interval: 64 intervals
    val img = ImageOps.synth(64, 64, 1)
    val enc = JpegCodec.encode(img, restartInterval = 1)
    val clean = JpegCodec.decode(enc)
    // find the 5th RSTn marker and trash the bytes AFTER it (interval 5's
    // entropy data) up to (not including) the 6th marker
    def rstPositions(b: Array[Byte]): Vector[Int] =
      (0 until b.length - 1).collect {
        case i if (b(i) & 0xff) == 0xff &&
          (b(i + 1) & 0xff) >= 0xd0 && (b(i + 1) & 0xff) <= 0xd7 => i
      }.toVector
    val rsts = rstPositions(enc)
    assert(rsts.size >= 10, s"expected many restart markers, got ${rsts.size}")
    val bad = enc.clone()
    var i = rsts(4) + 2
    while (i < rsts(5)) { bad(i) = 0x55; i += 1 } // no 0xFF: markers intact
    val dec = JpegCodec.decode(bad)
    assert(dec.width == 64 && dec.height == 64)
    // intervals 0-4 and 6.. must match the clean decode EXACTLY (the DC
    // predictor reset at each RSTn is what makes interval 6 recoverable);
    // interval 5 = MCU (row 0, col 5) → pixels x∈[40,48), y∈[0,8)
    val w = 64
    def damaged(x: Int, y: Int): Boolean = y < 8 && x >= 40 && x < 48
    for (y <- 0 until 64; x <- 0 until w) {
      val idx = y * w + x
      if (!damaged(x, y))
        assert(dec.pixels(idx) == clean.pixels(idx),
          s"resync corrupted pixel outside the damaged interval at ($x,$y)")
    }
    // the damaged block differs from clean somewhere (the corruption is real)
    assert((0 until 8).exists(y => (40 until 48).exists(x =>
      dec.pixels(y * w + x) != clean.pixels(y * w + x))))
  }

  test("defaults are byte-stable: no DRI segment, 1x1 factors (golden compat)") {
    val enc = JpegCodec.encode(ImageOps.synth(24, 16, 3))
    // no DRI marker anywhere in the headers
    var p = 2
    var sawDri = false
    var sof = -1
    while (sof < 0) {
      val m = enc(p + 1) & 0xff
      if (m == 0xdd) sawDri = true
      if (m == 0xc0) sof = p + 4
      else p += 2 + (((enc(p + 2) & 0xff) << 8) | (enc(p + 3) & 0xff))
    }
    assert(!sawDri, "default encode must not emit DRI")
    for (c <- 0 until 3)
      assert((enc(sof + 7 + 3 * c) & 0xff) == 0x11,
        "default encode must keep 1x1 sampling")
  }

  test("progressive (SOF2) decodes BIT-IDENTICALLY to the baseline stream") {
    // the gate is exact by construction: both streams transmit the SAME
    // quantized coefficient matrix, so decoded pixels must be equal —
    // any defect in spectral selection, successive approximation, EOB
    // runs, or refinement correction bits breaks the equality
    for (kind <- 0 to 3; (w, h) <- Seq((32, 32), (33, 41), (17, 23))) {
      val img = ImageOps.synth(w, h, kind)
      val base = JpegCodec.decode(JpegCodec.encode(img))
      val prog = JpegCodec.decode(JpegCodec.encode(img, progressive = true))
      assert(java.util.Arrays.equals(base.pixels, prog.pixels),
        s"progressive decode differs from baseline for kind=$kind ${w}x$h")
    }
    // noise stresses the refinement entropy paths (dense corrections,
    // ZRLs inside runs, short EOB runs) far harder than the gradients
    var s = 7L
    val noise = Image(41, 26, 3, Array.fill[Byte](41 * 26 * 3) {
      s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 40).toByte
    })
    assert(java.util.Arrays.equals(
      JpegCodec.decode(JpegCodec.encode(noise)).pixels,
      JpegCodec.decode(JpegCodec.encode(noise, progressive = true)).pixels),
      "progressive decode differs on noise content")
    // progressive composes with both subsampling layouts
    for (ch <- Seq("420", "422")) {
      val rgb = ImageOps.synth(48, 40, 3)
      val b = JpegCodec.decode(JpegCodec.encode(rgb, subsample = true, chroma = ch))
      val p = JpegCodec.decode(JpegCodec.encode(rgb, subsample = true,
        chroma = ch, progressive = true))
      assert(java.util.Arrays.equals(b.pixels, p.pixels),
        s"progressive+$ch differs from baseline+$ch")
    }
    // structure: SOF2 present, multi-scan script
    val enc = JpegCodec.encode(ImageOps.synth(24, 24, 3), progressive = true)
    assert((0 until enc.length - 1).exists(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc2), "missing SOF2")
    val nScans = (0 until enc.length - 1).count(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xda)
    assert(nScans >= 8, s"expected a multi-scan script, got $nScans SOS markers")
  }

  test("missing tables fail loudly even under DRI (resync covers entropy damage only)") {
    // strip every DHT segment from a DRI stream: a structural header
    // defect must stay terminal — before the fix the per-interval resync
    // catch swallowed it in EVERY interval and the image "decoded" to
    // all-mid-gray silently
    val enc = JpegCodec.encode(ImageOps.synth(32, 32, 1), restartInterval = 2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(enc, 0, 2) // SOI
    var p = 2
    var done = false
    while (!done) {
      val m = enc(p + 1) & 0xff
      val len = ((enc(p + 2) & 0xff) << 8) | (enc(p + 3) & 0xff)
      if (m == 0xda) { // SOS: copy the rest verbatim (entropy + EOI)
        out.write(enc, p, enc.length - p); done = true
      } else {
        if (m != 0xc4) out.write(enc, p, 2 + len)
        p += 2 + len
      }
    }
    val e = intercept[IllegalArgumentException](JpegCodec.decode(out.toByteArray))
    assert(e.getMessage.contains("Huffman table"), e.getMessage)
  }

  test("systematic corruption of EVERY interval refuses instead of decoding gray") {
    // all-ones entropy bits (FF 00 stuffed pairs) hit the reserved
    // all-ones codeword in every interval — zero intervals survive, and
    // the decoder must refuse the all-mid-gray result rather than return
    // it as a "successful" decode
    val enc = JpegCodec.encode(ImageOps.synth(32, 32, 1), restartInterval = 1)
    // walk headers to the SOS entropy start
    var p = 2
    while ((enc(p + 1) & 0xff) != 0xda)
      p += 2 + (((enc(p + 2) & 0xff) << 8) | (enc(p + 3) & 0xff))
    val entropyStart = p + 2 + (((enc(p + 2) & 0xff) << 8) | (enc(p + 3) & 0xff))
    val bad = enc.clone()
    // overwrite every entropy region (between RST markers) with FF 00
    // pairs; markers themselves stay intact so resync CAN find them
    var i = entropyStart
    var phase = 0
    while (i < bad.length - 2) {
      val isMarker = (bad(i) & 0xff) == 0xff && {
        val n = bad(i + 1) & 0xff
        (n >= 0xd0 && n <= 0xd7) || n == 0xd9
      }
      if (isMarker) { i += 2; phase = 0 }
      else {
        // trailing byte before a marker must not be a bare FF
        val nextIsMarker = (bad(i + 1) & 0xff) == 0xff && i + 2 < bad.length && {
          val n = bad(i + 2) & 0xff
          (n >= 0xd0 && n <= 0xd7) || n == 0xd9
        }
        bad(i) = if (phase == 0 && !nextIsMarker) 0xff.toByte else 0x00.toByte
        phase ^= 1
        i += 1
      }
    }
    val e = intercept[IllegalArgumentException](JpegCodec.decode(bad))
    assert(e.getMessage.contains("every restart interval"), e.getMessage)
  }

  test("pixel bound is caller-tunable (maxPixels), refusal names the dial") {
    val enc = JpegCodec.encode(ImageOps.synth(64, 48, 3))
    val e = intercept[IllegalArgumentException](
      JpegCodec.decode(enc, maxPixels = 1000L))
    assert(e.getMessage.contains("unreasonable dimensions") &&
      e.getMessage.contains("maxPixels"), e.getMessage)
    // raising the bound admits the same stream
    val img = JpegCodec.decode(enc, maxPixels = 64L * 48)
    assert(img.width == 64 && img.height == 48)
  }

  test("CMYK/YCCK (Adobe APP14): roundtrips bounded, flat exact, untagged refused") {
    // deterministic 4-channel CMYK fixture (stored ink-inverted values)
    def mk(w: Int, h: Int): graft.io.PngCodec.Image = {
      val px = new Array[Byte](w * h * 4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val base = (y * w + x) * 4
          px(base) = (x * 255 / (w - 1)).toByte          // C'
          px(base + 1) = (y * 255 / (h - 1)).toByte      // M'
          px(base + 2) = ((x / 8 + y / 8) % 2 * 255).toByte // Y'
          px(base + 3) = (255 - (x + y) % 64).toByte     // K'
          x += 1
        }
        y += 1
      }
      graft.io.PngCodec.Image(w, h, 4, px)
    }
    for (transform <- Seq(0, 2)) {
      val src = mk(32, 24)
      val enc = JpegCodec.encode(src, cmykTransform = transform)
      // the stream declares 4 components and carries the Adobe tag
      val dec = JpegCodec.decode(enc)
      assert(dec.width == 32 && dec.height == 24 && dec.channels == 4)
      var maxDiff = 0
      var i = 0
      while (i < src.pixels.length) {
        maxDiff = math.max(maxDiff,
          math.abs((src.pixels(i) & 0xff) - (dec.pixels(i) & 0xff)))
        i += 1
      }
      assert(maxDiff <= 40, s"transform=$transform maxDiff=$maxDiff")
    }
    // flat 8x8-aligned CMYK: transform 0 reconstructs EXACTLY (all four
    // planes ride the luma table — the DC-only contract); transform 2's
    // chroma-table DC rounding costs at most a couple of code values
    // (the same reason the flat-exact contract is stated for GRAY)
    val flat = graft.io.PngCodec.Image(16, 16,
      4, Array.tabulate[Byte](16 * 16 * 4)(i => Seq[Byte](100, (150).toByte,
        (200).toByte, (250).toByte)(i % 4)))
    val dec0 = JpegCodec.decode(JpegCodec.encode(flat, cmykTransform = 0))
    assert(java.util.Arrays.equals(dec0.pixels, flat.pixels),
      "flat CMYK must be exact under transform 0")
    val dec2 = JpegCodec.decode(JpegCodec.encode(flat, cmykTransform = 2))
    val flatDiff = flat.pixels.indices.map(i =>
      math.abs((flat.pixels(i) & 0xff) - (dec2.pixels(i) & 0xff))).max
    assert(flatDiff <= 4, s"flat YCCK drifted $flatDiff")
    // stripping APP14 makes the stream ambiguous → loud refusal
    val enc = JpegCodec.encode(mk(16, 16))
    val out = new java.io.ByteArrayOutputStream()
    out.write(enc, 0, 2)
    var p = 2
    var done = false
    while (!done) {
      val m = enc(p + 1) & 0xff
      val len = ((enc(p + 2) & 0xff) << 8) | (enc(p + 3) & 0xff)
      if (m == 0xda) { out.write(enc, p, enc.length - p); done = true }
      else { if (m != 0xee) out.write(enc, p, 2 + len); p += 2 + len }
    }
    val e = intercept[IllegalArgumentException](JpegCodec.decode(out.toByteArray))
    assert(e.getMessage.contains("APP14"), e.getMessage)
    // 4-component progressive is out of scope on the encode side
    intercept[IllegalArgumentException](
      JpegCodec.encode(mk(16, 16), progressive = true))
    // the composite kernel: integer contract R = C'*K'/255
    val comp = graft.ops.ImageOps.cmykToRgb(flat)
    assert(comp.channels == 3)
    assert((comp.pixels(0) & 0xff) == 100 * 250 / 255)
    assert((comp.pixels(1) & 0xff) == 150 * 250 / 255)
    assert((comp.pixels(2) & 0xff) == 200 * 250 / 255)
  }

  test("EXIF orientation: embedded APP1 reads back; absence reads None") {
    val img = ImageOps.synth(24, 16, 3)
    for (o <- 1 to 8) {
      val enc = JpegCodec.encode(img, exifOrientation = o)
      assert(JpegCodec.exifOrientation(enc).contains(o), s"orientation $o")
      // the tag is metadata-only: pixels decode identically to untagged
      val plain = JpegCodec.decode(JpegCodec.encode(img))
      val tagged = JpegCodec.decode(enc)
      assert(java.util.Arrays.equals(plain.pixels, tagged.pixels))
    }
    assert(JpegCodec.exifOrientation(JpegCodec.encode(img)).isEmpty)
    assert(JpegCodec.exifOrientation(Array[Byte](1, 2, 3)).isEmpty)
    // composes with the other stream features (restarts, subsampling)
    val enc2 = JpegCodec.encode(ImageOps.synth(48, 32, 3), subsample = true,
      restartInterval = 2, exifOrientation = 6)
    assert(JpegCodec.exifOrientation(enc2).contains(6))
    assert(JpegCodec.decode(enc2).width == 48)
  }

  test("applyOrientation: all 8 EXIF transpositions on a hand vector") {
    // 3x2 gray [a b c / d e f] — every orientation's result is stated
    // literally from the EXIF/TIFF tag-274 definitions
    val (a, b, c, d, e, f) = (10: Byte, 20: Byte, 30: Byte, 40: Byte, 50: Byte, 60: Byte)
    val img = Image(3, 2, 1, Array(a, b, c, d, e, f))
    def run(o: Int): (Int, Int, Seq[Byte]) = {
      val r = ImageOps.applyOrientation(img, o)
      (r.width, r.height, r.pixels.toSeq)
    }
    assert(run(1) == ((3, 2, Seq(a, b, c, d, e, f))))
    assert(run(2) == ((3, 2, Seq(c, b, a, f, e, d)))) // mirror horizontal
    assert(run(3) == ((3, 2, Seq(f, e, d, c, b, a)))) // rotate 180
    assert(run(4) == ((3, 2, Seq(d, e, f, a, b, c)))) // mirror vertical
    assert(run(5) == ((2, 3, Seq(a, d, b, e, c, f)))) // transpose
    assert(run(6) == ((2, 3, Seq(d, a, e, b, f, c)))) // rotate 90 CW
    assert(run(7) == ((2, 3, Seq(f, c, e, b, d, a)))) // transverse
    assert(run(8) == ((2, 3, Seq(c, f, b, e, a, d)))) // rotate 270 CW
    // involutions undo themselves; 6 and 8 invert each other; channels
    // travel together (RGB pixel stays one unit)
    for (o <- Seq(2, 3, 4, 5, 7)) {
      val twice = ImageOps.applyOrientation(ImageOps.applyOrientation(img, o), o)
      assert(twice.pixels.toSeq == img.pixels.toSeq, s"orientation $o twice")
    }
    val back = ImageOps.applyOrientation(ImageOps.applyOrientation(img, 6), 8)
    assert(back.pixels.toSeq == img.pixels.toSeq)
    val rgb = ImageOps.synth(24, 16, 3)
    val r6 = ImageOps.applyOrientation(rgb, 6)
    assert(r6.width == 16 && r6.height == 24 && r6.channels == 3)
    // corner pixel: source (0, h-1) lands at (0, 0) under 90 CW
    assert((0 until 3).forall(ci =>
      r6.pixels(ci) == rgb.pixels(((16 - 1) * 24 + 0) * 3 + ci)))
    intercept[IllegalArgumentException](ImageOps.applyOrientation(img, 0))
    intercept[IllegalArgumentException](ImageOps.applyOrientation(img, 9))
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

  // ------------------------------------------------------------------
  // 12-bit extended sequential (SOF1) — the deep-color class
  // ------------------------------------------------------------------

  import graft.io.PngCodec.Image16

  test("12-bit: flat 8x8-aligned gray reconstructs EXACTLY at full width") {
    for (v <- Seq(0, 1, 2048, 3000, 4095)) {
      val img = Image16(32, 16, 1, Array.fill[Short](32 * 16)(v.toShort))
      val dec = JpegCodec.decode12(JpegCodec.encode12(img))
      assert(dec.width == 32 && dec.height == 16 && dec.channels == 1)
      assert(dec.samples.forall(x => (x & 0xffff) == v), s"flat 12-bit $v not exact")
    }
    // per-block flat values: every block its own DC, still exact
    val w = 40; val h = 24
    val smp = Array.tabulate[Short](w * h) { p =>
      val bx = (p % w) / 8; val by = (p / w) / 8
      (((bx * 7 + by * 5) % 60) * 68 + 5).toShort
    }
    val dec = JpegCodec.decode12(JpegCodec.encode12(Image16(w, h, 1, smp)))
    assert(java.util.Arrays.equals(dec.samples, smp), "blockwise flat not exact")
  }

  test("12-bit: noisy gray roundtrips with bounded error; dims/channels exact") {
    var s = 7L
    val smp = Array.fill[Short](40 * 24) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40) % 4096).toShort
    }
    val img = Image16(40, 24, 1, smp)
    val dec = JpegCodec.decode12(JpegCodec.encode12(img))
    assert(dec.width == 40 && dec.height == 24 && dec.channels == 1)
    val err = smp.indices.map(i =>
      math.abs((smp(i) & 0xffff) - (dec.samples(i) & 0xffff))).max
    // the quantization tables are the 8-bit encoder's — at 12-bit input
    // range the same absolute coefficient loss applies, so the bound is
    // the 8-bit noise bound's magnitude, not 16x it
    assert(err <= 220, s"12-bit noise err $err")
  }

  test("12-bit: flat RGB color roundtrips within the DC rounding envelope") {
    val w = 24; val h = 16
    val smp = new Array[Short](w * h * 3)
    var p = 0
    while (p < w * h) {
      smp(p * 3) = 3000; smp(p * 3 + 1) = 1234; smp(p * 3 + 2) = 77
      p += 1
    }
    val dec = JpegCodec.decode12(JpegCodec.encode12(Image16(w, h, 3, smp)))
    val err = smp.indices.map(i =>
      math.abs((smp(i) & 0xffff) - (dec.samples(i) & 0xffff))).max
    // flat color: each YCbCr plane is flat so only the DC rounds (<= 0.5
    // per plane pre-inverse); the inverse transform mixes three planes
    assert(err <= 3, s"flat RGB err $err")
  }

  test("12-bit: the two decode surfaces refuse each other's precision by name") {
    val deep = JpegCodec.encode12(Image16(8, 8, 1,
      Array.fill[Short](64)(1000)))
    val e = intercept[IllegalArgumentException](JpegCodec.decode(deep))
    assert(e.getMessage.contains("decode12"))
    val shallow = JpegCodec.encode(Image(8, 8, 1, Array.fill[Byte](64)(10)))
    val e2 = intercept[IllegalArgumentException](JpegCodec.decode12(shallow))
    assert(e2.getMessage.contains("8-bit"))
  }

  test("SOF1 at 8-bit precision decodes identically to the same stream as SOF0") {
    // extended sequential is a superset of baseline: relabeling the SOF
    // marker must not change one pixel (same entropy data, same tables)
    val img = ImageOps.synth(32, 24, 2)
    val base = JpegCodec.encode(img)
    val sofAt = {
      var pos = 2; var at = -1
      while (at < 0) {
        val m = base(pos + 1) & 0xff
        if (m == 0xc0) at = pos
        else pos += 2 + (((base(pos + 2) & 0xff) << 8) | (base(pos + 3) & 0xff))
      }
      at
    }
    val relabeled = base.clone(); relabeled(sofAt + 1) = 0xc1.toByte
    val a = JpegCodec.decode(base); val b = JpegCodec.decode(relabeled)
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
  }

  test("12-bit progressive refuses loudly; out-of-range samples refuse at encode") {
    val deep = JpegCodec.encode12(Image16(8, 8, 1, Array.fill[Short](64)(9)))
    val sofAt = {
      var pos = 2; var at = -1
      while (at < 0) {
        val m = deep(pos + 1) & 0xff
        if (m == 0xc1) at = pos
        else pos += 2 + (((deep(pos + 2) & 0xff) << 8) | (deep(pos + 3) & 0xff))
      }
      at
    }
    val relabeled = deep.clone(); relabeled(sofAt + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.decode12(relabeled))
    assert(e.getMessage.contains("precision"))
    val e2 = intercept[IllegalArgumentException](
      JpegCodec.encode12(Image16(8, 8, 1, Array.fill[Short](64)(4096))))
    assert(e2.getMessage.contains("12-bit range"))
  }

  test("precisionProbe reads the SOF byte from segment lengths alone") {
    val img = ImageOps.synth(24, 16, 5)
    assert(JpegCodec.precisionProbe(JpegCodec.encode(img)) == 8)
    assert(JpegCodec.precisionProbe(
      JpegCodec.encode(img, progressive = true)) == 8)
    assert(JpegCodec.precisionProbe(JpegCodec.encode12(
      Image16(8, 8, 1, Array.fill[Short](64)(700)))) == 12)
    // inconclusive inputs answer 8 — the routed decode validates
    assert(JpegCodec.precisionProbe(Array[Byte](0xff.toByte, 0xd8.toByte)) == 8)
    assert(JpegCodec.precisionProbe(Array.fill[Byte](16)(0x55)) == 8)
    assert(JpegCodec.precisionProbe(Array.empty[Byte]) == 8)
  }
}
