package graft

import java.util.zip.{CRC32, Inflater}

import org.scalatest.funsuite.AnyFunSuite

import graft.io.PngCodec
import graft.io.PngCodec.Image
import graft.ops.ImageOps

/** PNG codec: roundtrip fidelity across color types and content shapes,
  * filter coverage, CRC/structure validation, scope refusals. */
class PngCodecSpec extends AnyFunSuite {

  /** Deterministic LCG noise — worst case for filters, best for coverage. */
  private def noise(w: Int, h: Int, ch: Int, seed: Long): Image = {
    var s = seed
    val px = Array.fill[Byte](w * h * ch) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    }
    Image(w, h, ch, px)
  }

  private def roundtrip(img: Image): Unit = {
    val dec = PngCodec.decode(PngCodec.encode(img))
    assert(dec.width == img.width && dec.height == img.height &&
      dec.channels == img.channels)
    assert(java.util.Arrays.equals(dec.pixels, img.pixels))
  }

  test("roundtrip: noise, every supported color type") {
    roundtrip(noise(33, 17, 1, 1L))  // gray, odd dims
    roundtrip(noise(24, 24, 3, 2L))  // RGB
    roundtrip(noise(19, 31, 4, 3L))  // RGBA
  }

  test("roundtrip: structured content (gradients, checker, flat)") {
    roundtrip(ImageOps.synth(48, 64, 0))
    roundtrip(ImageOps.synth(16, 16, 1))
    roundtrip(ImageOps.synth(40, 24, 2))
    roundtrip(ImageOps.synth(33, 41, 3))
    roundtrip(Image(7, 5, 3, Array.fill[Byte](7 * 5 * 3)(42)))
    roundtrip(Image(1, 1, 1, Array[Byte](0))) // hmm: 1x1 is legal PNG
  }

  test("adaptive encoder exercises multiple filter types (decode proves them)") {
    // mixed content: flat rows favor Up, gradients favor Sub, noise Paeth/None
    val w = 32; val h = 24
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) =
          (if (y < 8) 100                      // flat
           else if (y < 16) x * 8              // gradient
           else (x * 2654435761L >>> 28).toInt // noisy
          ).toByte
        x += 1
      }
      y += 1
    }
    val img = Image(w, h, 1, px)
    val png = PngCodec.encode(img)
    roundtrip(img)
    // parse the container in-test (public format): pull IDAT, inflate,
    // collect the per-row filter bytes the adaptive heuristic chose
    var pos = 8
    val idat = new java.io.ByteArrayOutputStream()
    while (pos < png.length) {
      val len = ((png(pos) & 0xff) << 24) | ((png(pos + 1) & 0xff) << 16) |
        ((png(pos + 2) & 0xff) << 8) | (png(pos + 3) & 0xff)
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(png, pos + 8, len)
      pos += 12 + len
    }
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte]((w + 1) * h)
    var off = 0
    while (!inf.finished() && off < raw.length)
      off += inf.inflate(raw, off, raw.length - off)
    val filters = (0 until h).map(y2 => raw(y2 * (w + 1)).toInt).toSet
    assert(filters.size >= 3, s"expected ≥3 distinct filters, got $filters")
  }

  test("corrupted chunk CRC is rejected") {
    val png = PngCodec.encode(noise(16, 16, 1, 7L))
    val bad = png.clone()
    bad(40) = (bad(40) ^ 0x01).toByte // inside IHDR data or IDAT
    val e = intercept[IllegalArgumentException](PngCodec.decode(bad))
    assert(e.getMessage.toLowerCase.contains("crc") ||
      e.getMessage.toLowerCase.contains("bad"))
  }

  test("unsupported shapes are refused, never mis-decoded") {
    // flip the interlace byte (IHDR data offset 12 → absolute 8+8+12=28)
    // and restore the CRC so ONLY the scope check can object
    val png = PngCodec.encode(noise(16, 16, 1, 9L))
    def withIhdrByte(off: Int, v: Byte): Array[Byte] = {
      val b = png.clone()
      b(16 + off) = v
      val crc = new CRC32()
      crc.update(b, 12, 4 + 13) // type + IHDR data
      val cv = crc.getValue.toInt
      b(29) = (cv >>> 24).toByte; b(30) = (cv >>> 16).toByte
      b(31) = (cv >>> 8).toByte; b(32) = cv.toByte
      b
    }
    // interlace is SUPPORTED now — but relabeling a PLAIN stream as
    // Adam7 makes its pass structure a lie (wrong decompressed size):
    // it must refuse, never mis-decode
    val e1 = intercept[IllegalArgumentException](
      PngCodec.decode(withIhdrByte(12, 1)))
    assert(e1.getMessage.contains("expected"))
    val e2 = intercept[IllegalArgumentException](
      PngCodec.decode(withIhdrByte(8, 3))) // depth 3 is illegal everywhere
    assert(e2.getMessage.contains("bit depth"))
    // relabeling a depth-8 stream as 16 lies about the raw size: the
    // structural check refuses before any pixel is served
    val e2b = intercept[IllegalArgumentException](
      PngCodec.decode16(withIhdrByte(8, 16)))
    assert(e2b.getMessage.contains("expected"))
    // palette is SUPPORTED now — but relabeling a gray stream as
    // color type 3 leaves it without a PLTE: loud refusal
    val e3 = intercept[IllegalArgumentException](
      PngCodec.decode(withIhdrByte(9, 3)))
    assert(e3.getMessage.contains("PLTE"))
    // bad signature
    val sig = png.clone(); sig(0) = 0
    intercept[IllegalArgumentException](PngCodec.decode(sig))
  }

  test("Adam7 interlaced and palette streams decode BIT-EXACTLY (PNG is lossless)") {
    for ((w, h, ch, seed) <- Seq((16, 16, 1, 3L), (33, 41, 3, 7L),
        (17, 23, 4, 11L), (7, 5, 3, 13L), (1, 9, 1, 17L), (9, 1, 3, 19L))) {
      val img = noise(w, h, ch, seed)
      val plain = PngCodec.decode(PngCodec.encode(img))
      val inter = PngCodec.decode(PngCodec.encode(img, interlaced = true))
      assert(java.util.Arrays.equals(plain.pixels, inter.pixels),
        s"Adam7 differs from plain for ${w}x$h ch=$ch")
      // the interlaced stream really declares Adam7
      assert((PngCodec.encode(img, interlaced = true)(16 + 12) & 0xff) == 1)
    }
    // palette: a <=256-color image roundtrips exactly, expanded to RGB
    val checker = graft.ops.ImageOps.synth(24, 24, 2) // 2 colors, 1 channel
    val viaPal = PngCodec.decode(PngCodec.encode(checker, palette = true))
    assert(viaPal.channels == 3)
    (0 until 24 * 24).foreach { p =>
      val g = checker.pixels(p)
      assert(viaPal.pixels(p * 3) == g && viaPal.pixels(p * 3 + 1) == g &&
        viaPal.pixels(p * 3 + 2) == g)
    }
    // an RGB image with few colors survives palette + Adam7 COMBINED
    val rgb = PngCodec.Image(16, 12, 3, Array.tabulate[Byte](16 * 12 * 3) { i =>
      val p = i / 3; (((p % 16) / 4 * 40 + (i % 3) * 7) & 0x7f).toByte
    })
    val both = PngCodec.decode(PngCodec.encode(rgb, interlaced = true, palette = true))
    assert(java.util.Arrays.equals(both.pixels, rgb.pixels),
      "palette+Adam7 roundtrip not exact")
    // too many distinct colors refuses loudly
    val many = noise(32, 32, 3, 23L)
    val e = intercept[IllegalArgumentException](PngCodec.encode(many, palette = true))
    assert(e.getMessage.contains("256"))
  }

  test("gray+alpha (color type 4) roundtrips bit-exactly, plain and Adam7") {
    for (seed <- Seq(21L, 22L); (w, h) <- Seq((17, 23), (8, 8), (1, 5))) {
      val img = noise(w, h, 2, seed)
      roundtrip(img)
      val inter = PngCodec.decode(PngCodec.encode(img, interlaced = true))
      assert(inter.channels == 2 &&
        java.util.Arrays.equals(inter.pixels, img.pixels))
    }
    // the stream really declares color type 4
    assert((PngCodec.encode(noise(4, 4, 2, 23L))(16 + 9) & 0xff) == 4)
  }

  test("palette+tRNS: RGBA web graphic roundtrips; tRNS truncates after last non-opaque") {
    // 6 distinct RGBA colors, two transparent/translucent
    val colors = Array(
      Array[Byte](10, 20, 30, 0),            // fully transparent
      Array[Byte](40, 50, 60, 127.toByte),   // translucent
      Array[Byte](70, 80, 90, 255.toByte),
      Array[Byte](1, 2, 3, 255.toByte),
      Array[Byte](200.toByte, 100, 50, 255.toByte),
      Array[Byte](0, 0, 0, 255.toByte))
    val w = 24; val h = 16
    val px = new Array[Byte](w * h * 4)
    for (p <- 0 until w * h; c <- 0 until 4)
      px(p * 4 + c) = colors((p * 7 + p / w) % colors.length)(c)
    val img = Image(w, h, 4, px)
    val enc = PngCodec.encode(img, palette = true)
    assert((enc(16 + 9) & 0xff) == 3, "must declare color type 3")
    // walk chunks: PLTE and tRNS both present, tRNS SHORTER than PLTE
    def chunks(b: Array[Byte]): Seq[(String, Int)] = {
      var pos = 8; val out = Seq.newBuilder[(String, Int)]
      while (pos < b.length) {
        val len = ((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
          ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        out += ((new String(b, pos + 4, 4, "US-ASCII"), len))
        pos += 12 + len
      }
      out.result()
    }
    val cs = chunks(enc).toMap
    assert(cs.contains("tRNS") && cs("tRNS") == 2,
      s"tRNS must cover exactly the 2 non-opaque entries, got ${cs.get("tRNS")}")
    assert(cs("PLTE") == 6 * 3)
    // decode restores the FULL RGBA data (alpha is data, never dropped)
    val dec = PngCodec.decode(enc)
    assert(dec.channels == 4 && java.util.Arrays.equals(dec.pixels, px))
    // and composes with Adam7
    val decI = PngCodec.decode(PngCodec.encode(img, interlaced = true, palette = true))
    assert(decI.channels == 4 && java.util.Arrays.equals(decI.pixels, px))
    // all-opaque RGBA palettizes with NO tRNS (pure type 3, reads RGB)
    val opaque = Image(4, 4, 4, Array.tabulate[Byte](64)(i =>
      if (i % 4 == 3) 255.toByte else (i * 3).toByte))
    val encO = PngCodec.encode(opaque, palette = true)
    assert(!chunks(encO).exists(_._1 == "tRNS"))
    assert(PngCodec.decode(encO).channels == 3)
  }

  /** Splice a tRNS chunk (correct CRC) immediately before the first IDAT
    * of an encoded stream — builds the color-key layouts the encoder
    * doesn't emit, from the outside, like a real file would carry them. */
  private def withTrns(png: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    var pos = 8
    while (new String(png, pos + 4, 4, "US-ASCII") != "IDAT")
      pos += 12 + (((png(pos) & 0xff) << 24) | ((png(pos + 1) & 0xff) << 16) |
        ((png(pos + 2) & 0xff) << 8) | (png(pos + 3) & 0xff))
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, pos)
    val lenB = Array[Byte]((payload.length >>> 24).toByte,
      (payload.length >>> 16).toByte, (payload.length >>> 8).toByte,
      payload.length.toByte)
    out.write(lenB)
    val typB = "tRNS".getBytes("US-ASCII")
    out.write(typB)
    out.write(payload)
    val crc = new CRC32(); crc.update(typB); crc.update(payload)
    val cv = crc.getValue.toInt
    out.write(Array[Byte]((cv >>> 24).toByte, (cv >>> 16).toByte,
      (cv >>> 8).toByte, cv.toByte))
    out.write(png, pos, png.length - pos)
    out.toByteArray
  }

  test("tRNS color key: gray reads gray+alpha, RGB reads RGBA, keyed pixels transparent") {
    // gray: key value 77 — every 77 sample must read alpha 0
    val gpx = Array.tabulate[Byte](12 * 5)(i => if (i % 3 == 0) 77 else (i * 11).toByte)
    val gray = Image(12, 5, 1, gpx)
    val gdec = PngCodec.decode(withTrns(PngCodec.encode(gray), Array[Byte](0, 77)))
    assert(gdec.channels == 2)
    for (p <- 0 until 12 * 5) {
      assert(gdec.pixels(p * 2) == gpx(p), "gray sample must survive")
      val expA = if ((gpx(p) & 0xff) == 77) 0 else 255
      assert((gdec.pixels(p * 2 + 1) & 0xff) == expA, s"alpha at $p")
    }
    // RGB: key (5, 6, 7)
    val rpx = Array.tabulate[Byte](9 * 4 * 3) { i =>
      val p = i / 3
      if (p % 4 == 0) Seq[Byte](5, 6, 7)(i % 3) else (i * 13).toByte
    }
    val rgb = Image(9, 4, 3, rpx)
    val rdec = PngCodec.decode(
      withTrns(PngCodec.encode(rgb), Array[Byte](0, 5, 0, 6, 0, 7)))
    assert(rdec.channels == 4)
    for (p <- 0 until 9 * 4) {
      for (c <- 0 until 3)
        assert(rdec.pixels(p * 4 + c) == rpx(p * 3 + c))
      val keyed = (rpx(p * 3) & 0xff) == 5 && (rpx(p * 3 + 1) & 0xff) == 6 &&
        (rpx(p * 3 + 2) & 0xff) == 7
      assert((rdec.pixels(p * 4 + 3) & 0xff) == (if (keyed) 0 else 255))
    }
    // tRNS is FORBIDDEN where alpha already exists (types 4 and 6)
    val e4 = intercept[IllegalArgumentException](PngCodec.decode(
      withTrns(PngCodec.encode(noise(4, 4, 2, 31L)), Array[Byte](0, 1))))
    assert(e4.getMessage.contains("forbidden"))
    val e6 = intercept[IllegalArgumentException](PngCodec.decode(
      withTrns(PngCodec.encode(noise(4, 4, 4, 32L)), Array[Byte](0, 1))))
    assert(e6.getMessage.contains("forbidden"))
    // malformed payload lengths refuse loudly
    val eLen = intercept[IllegalArgumentException](PngCodec.decode(
      withTrns(PngCodec.encode(gray), Array[Byte](77))))
    assert(eLen.getMessage.contains("tRNS length"))
  }

  test("pixel bound is caller-tunable (maxPixels), refusal names the dial") {
    val enc = PngCodec.encode(noise(64, 48, 3, 9L))
    val e = intercept[IllegalArgumentException](
      PngCodec.decode(enc, maxPixels = 1000L))
    assert(e.getMessage.contains("unreasonable dimensions") &&
      e.getMessage.contains("maxPixels"), e.getMessage)
    val img = PngCodec.decode(enc, maxPixels = 64L * 48)
    assert(img.width == 64 && img.height == 48)
  }

  test("image kernels: integer contracts") {
    // stats on a known tiny image
    val img = Image(2, 2, 1, Array[Byte](0, 127.toByte, 255.toByte, 64))
    val (sum, clip, wsum) = ImageOps.stats(img)
    assert(sum == 0 + 127 + 255 + 64)
    assert(clip == 1)
    // wsum = Σ v(x+1)(3y+7)(c+1): (0,0)=0·1·7, (1,0)=127·2·7, (0,1)=255·1·10, (1,1)=64·2·10
    assert(wsum == 127L * 2 * 7 + 255L * 10 + 64L * 2 * 10)
    // nearest resize maps sx = i*w/W exactly
    val rz = ImageOps.resizeNearest(img, 4, 2)
    assert((rz.pixels(0) & 0xff) == 0 && (rz.pixels(1) & 0xff) == 0 &&
      (rz.pixels(2) & 0xff) == 127 && (rz.pixels(3) & 0xff) == 127)
    // dhash: horizontal gradient is all-ones at ANY size; vertical all-zeros
    assert(ImageOps.dhash(ImageOps.synth(16, 16, 0)) == "1" * 64)
    assert(ImageOps.dhash(ImageOps.synth(48, 64, 0)) == "1" * 64)
    assert(ImageOps.dhash(ImageOps.synth(24, 40, 1)) == "0" * 64)
    // box downscale: each output cell is the exact integer mean of the
    // source pixels it partitions (inverse floor map i = x·W/w)
    val box = ImageOps.resizeBox(
      Image(4, 2, 1, Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)), 2, 1)
    assert((box.pixels(0) & 0xff) == (10 + 20 + 50 + 60) / 4 &&
      (box.pixels(1) & 0xff) == (30 + 40 + 70 + 80) / 4)
    // channels average independently
    val rgbBox = ImageOps.resizeBox(Image(2, 1, 3,
      Array[Byte](10, 100, 200.toByte, 20, 110, 210.toByte)), 1, 1)
    assert(rgbBox.pixels.map(_ & 0xff).toSeq == Seq(15, 105, 205))
    // downscale-only contract
    intercept[IllegalArgumentException](
      ImageOps.resizeBox(ImageOps.synth(8, 8, 0), 16, 4))
  }

  // ------------------------------------------------------------------
  // bit depths beyond 8 (round 12): sub-byte gray/palette, 16-bit
  // ------------------------------------------------------------------

  /** Gray image whose values sit exactly on depth-d's replication
    * lattice (multiples of 255/(2^d−1)) — the invertibility condition. */
  private def grayLattice(w: Int, h: Int, depth: Int): Image = {
    val step = 255 / ((1 << depth) - 1)
    val px = Array.tabulate[Byte](w * h) { p =>
      val x = p % w; val y = p / w
      (((x * 5 + y * 3) % (1 << depth)) * step).toByte
    }
    Image(w, h, 1, px)
  }

  test("sub-byte gray roundtrips bit-exactly at depths 1/2/4, plain and Adam7") {
    for (d <- Seq(1, 2, 4); il <- Seq(false, true);
         (w, h) <- Seq((33, 17), (8, 8), (1, 7), (9, 1))) {
      val img = grayLattice(w, h, d)
      val png = PngCodec.encode(img, interlaced = il, bitDepth = d)
      assert((png(24) & 0xff) == d, s"IHDR depth at d=$d") // byte 8 of IHDR
      val dec = PngCodec.decode(png)
      assert(dec.channels == 1 && dec.width == w && dec.height == h)
      assert(java.util.Arrays.equals(dec.pixels, img.pixels),
        s"d=$d il=$il ${w}x$h")
    }
  }

  test("sub-byte palette roundtrips bit-exactly at depths 1/2/4") {
    for (d <- Seq(1, 2, 4); il <- Seq(false, true)) {
      val n = 1 << d
      val px = new Array[Byte](21 * 13 * 3)
      var p = 0
      while (p < 21 * 13) {
        val ci = (p * 7 + p / 21) % n
        px(p * 3) = (ci * 40 + 10).toByte
        px(p * 3 + 1) = (255 - ci * 30).toByte
        px(p * 3 + 2) = (ci * ci * 11 % 256).toByte
        p += 1
      }
      val img = Image(21, 13, 3, px)
      val png = PngCodec.encode(img, interlaced = il, palette = true, bitDepth = d)
      val dec = PngCodec.decode(png)
      assert(java.util.Arrays.equals(dec.pixels, img.pixels), s"d=$d il=$il")
    }
  }

  test("16-bit roundtrips bit-exactly, every sample layout, plain and Adam7") {
    var s = 99L
    for (ch <- Seq(1, 2, 3, 4); il <- Seq(false, true)) {
      val (w, h) = (19, 11)
      val smp = Array.fill[Short](w * h * ch) {
        s = s * 6364136223846793005L + 1442695040888963407L
        (s >>> 37).toShort
      }
      val img = PngCodec.Image16(w, h, ch, smp)
      val dec = PngCodec.decode16(PngCodec.encode16(img, interlaced = il))
      assert(dec.channels == ch)
      assert(java.util.Arrays.equals(dec.samples, img.samples), s"ch=$ch il=$il")
    }
  }

  test("the two decode surfaces refuse each other's depths, by name") {
    val deep = PngCodec.encode16(PngCodec.Image16(4, 4, 1,
      Array.tabulate[Short](16)(i => (i * 4111).toShort)))
    val e = intercept[IllegalArgumentException](PngCodec.decode(deep))
    assert(e.getMessage.contains("decode16"))
    val shallow = PngCodec.encode(noise(4, 4, 1, 5L))
    val e2 = intercept[IllegalArgumentException](PngCodec.decode16(shallow))
    assert(e2.getMessage.contains("decode()"))
    // Image16.toEight is the explicit (lossy) bridge
    val eight = PngCodec.decode16(deep).toEight
    assert(eight.pixels.zipWithIndex.forall { case (b, i) =>
      (b & 0xff) == ((i * 4111) & 0xffff) >>> 8 })
  }

  test("sub-byte encode refuses unrepresentable input instead of quantizing") {
    val img = Image(4, 4, 1, Array.fill[Byte](16)(100)) // 100 not a ×17
    val e = intercept[IllegalArgumentException](PngCodec.encode(img, bitDepth = 4))
    assert(e.getMessage.contains("not representable"))
    // palette with more colors than the depth holds
    val five = Image(5, 1, 3, Array.tabulate[Byte](15)(i => (i / 3 * 50).toByte))
    val e2 = intercept[IllegalArgumentException](
      PngCodec.encode(five, palette = true, bitDepth = 2))
    assert(e2.getMessage != null)
    // RGB at sub-byte depth is illegal, full stop
    val e3 = intercept[IllegalArgumentException](
      PngCodec.encode(noise(4, 4, 3, 6L), bitDepth = 4))
    assert(e3.getMessage.contains("grayscale or palette"))
  }

  test("sub-byte gray expansion equals the 8-bit encode of the same values") {
    // the left-bit-replication contract, cross-checked through BOTH paths
    val img = grayLattice(24, 16, 2)
    val viaSub = PngCodec.decode(PngCodec.encode(img, bitDepth = 2))
    val viaEight = PngCodec.decode(PngCodec.encode(img))
    assert(java.util.Arrays.equals(viaSub.pixels, viaEight.pixels))
  }

  test("16-bit tRNS color keys expand with full-width comparison") {
    // gray key: craft a stream by encoding, then splicing a tRNS chunk
    // is overkill — drive the key path through RGB 16 via raw chunks
    val w = 3; val h = 1
    val smp = Array[Short](1000, 2000, 3000, 0x7fff, 0x0101, 0x0202, 1000, 2000, 3001)
    val base = PngCodec.encode16(PngCodec.Image16(w, h, 3, smp))
    // splice tRNS (kr=1000,kg=2000,kb=3000) before IDAT
    val trns = new java.io.ByteArrayOutputStream()
    val payload = Array[Byte](
      (1000 >> 8).toByte, (1000 & 0xff).toByte,
      (2000 >> 8).toByte, (2000 & 0xff).toByte,
      (3000 >> 8).toByte, (3000 & 0xff).toByte)
    val idatAt = {
      var pos = 8; var found = -1
      while (found < 0) {
        val len = ((base(pos) & 0xff) << 24) | ((base(pos + 1) & 0xff) << 16) |
          ((base(pos + 2) & 0xff) << 8) | (base(pos + 3) & 0xff)
        val typ = new String(base, pos + 4, 4, "US-ASCII")
        if (typ == "IDAT") found = pos else pos += 12 + len
      }
      found
    }
    trns.write(base, 0, idatAt)
    val lenB = Array[Byte](0, 0, 0, 6)
    trns.write(lenB)
    val typB = "tRNS".getBytes("US-ASCII")
    trns.write(typB)
    trns.write(payload)
    val crc = new CRC32(); crc.update(typB); crc.update(payload)
    val cv = crc.getValue.toInt
    trns.write(Array[Byte]((cv >>> 24).toByte, (cv >>> 16).toByte,
      (cv >>> 8).toByte, cv.toByte))
    trns.write(base, idatAt, base.length - idatAt)
    val dec = PngCodec.decode16(trns.toByteArray)
    assert(dec.channels == 4)
    val a = (p: Int) => dec.samples(p * 4 + 3) & 0xffff
    assert(a(0) == 0)        // exact key match → transparent
    assert(a(1) == 0xffff)   // different pixel
    assert(a(2) == 0xffff)   // off-by-one in the LOW byte still opaque
  }
}
