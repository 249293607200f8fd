package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.TiffCodec
import graft.io.PngCodec.{Image, Image16}

/** TIFF codec: bit-exact roundtrips across byte orders, compressions,
  * depths and strip layouts; scope refusals; structural validation. */
class TiffCodecSpec extends AnyFunSuite {

  private def noise(w: Int, h: Int, ch: Int, seed: Long): Image = {
    var s = seed
    Image(w, h, ch, Array.fill[Byte](w * h * ch) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    })
  }

  test("8-bit roundtrips bit-exactly: gray/RGB x none/deflate x II/MM") {
    for (ch <- Seq(1, 3); defl <- Seq(false, true); be <- Seq(false, true)) {
      // h = 40 -> 3 strips at 16 rows/strip (the strip walk is real);
      // odd width exercises non-aligned row math
      val img = noise(33, 40, ch, ch * 100L + (if (defl) 7 else 1))
      val dec = TiffCodec.decode(TiffCodec.encode(img, defl, be))
      assert(dec.width == 33 && dec.height == 40 && dec.channels == ch)
      assert(java.util.Arrays.equals(dec.pixels, img.pixels),
        s"ch=$ch deflate=$defl bigEndian=$be")
    }
  }

  test("16-bit roundtrips bit-exactly, sample bytes in the FILE's order") {
    var s = 5L
    for (ch <- Seq(1, 3); be <- Seq(false, true)) {
      val smp = Array.fill[Short](21 * 19 * ch) {
        s = s * 6364136223846793005L + 1442695040888963407L
        (s >>> 37).toShort
      }
      val img = Image16(21, 19, ch, smp)
      val dec = TiffCodec.decode16(TiffCodec.encode16(img, deflate = true, be))
      assert(java.util.Arrays.equals(dec.samples, img.samples),
        s"ch=$ch bigEndian=$be")
    }
  }

  // -------------------------------------------------------- PackBits
  test("PackBits matches hand-derived spec vectors, incl. the -128 no-op") {
    // TIFF 6.0 §9's worked shapes: a replicate run, a literal run, and
    // the no-op header a conformant decoder must skip
    def dec(z: Array[Byte], expect: Int): Seq[Byte] =
      TiffCodec.packbitsDecompress(z, 0, z.length, expect).toSeq
    // -3 => 4 copies of 0xAA; 2 => literal 0x80 0x00 0x2A
    assert(dec(Array[Byte](-3, 0xAA.toByte, 2, 0x80.toByte, 0x00, 0x2A), 7) ==
      Seq[Byte](0xAA.toByte, 0xAA.toByte, 0xAA.toByte, 0xAA.toByte,
        0x80.toByte, 0x00, 0x2A))
    // -128 no-op between two runs
    assert(dec(Array[Byte](-1, 5, -128.toByte, 0, 9), 3) == Seq[Byte](5, 5, 9))
    // encoder: a long run splits at 128; rows pack SEPARATELY (a run
    // spanning the row boundary must emit two headers)
    val run = Array.fill[Byte](130)(7)
    val z = TiffCodec.packbitsCompress(run, rowBytes = 130)
    assert(z.toSeq == Seq[Byte](-127, 7, -1, 7))
    val twoRows = TiffCodec.packbitsCompress(Array.fill[Byte](8)(3), rowBytes = 4)
    assert(twoRows.toSeq == Seq[Byte](-3, 3, -3, 3))
    // decoder validation: truncated literal, output overrun, short stream
    assert(intercept[IllegalArgumentException](dec(Array[Byte](5, 1, 2), 6))
      .getMessage.contains("overruns the strip"))
    assert(intercept[IllegalArgumentException](dec(Array[Byte](-9, 1), 4))
      .getMessage.contains("overruns the region"))
    assert(intercept[IllegalArgumentException](dec(Array[Byte](-1, 5), 7))
      .getMessage.contains("produced"))
  }

  test("PackBits roundtrips bit-exactly: depths, channels, orders, tiles, predictor") {
    for (ch <- Seq(1, 3); be <- Seq(false, true)) {
      val img = noise(33, 40, ch, ch * 31L + (if (be) 5 else 0))
      val dec = TiffCodec.decode(TiffCodec.encode(img, bigEndian = be, packbits = true))
      assert(java.util.Arrays.equals(dec.pixels, img.pixels), s"ch=$ch be=$be")
      // flat regions (the format's home turf) + predictor + tiled layout
      val flat = Image(40, 36, ch, Array.tabulate[Byte](40 * 36 * ch)(i => ((i / 160) * 3).toByte))
      val z = TiffCodec.encode(flat, packbits = true, predictor = true, tileSize = 16)
      assert(java.util.Arrays.equals(TiffCodec.decode(z).pixels, flat.pixels))
      // vs the SAME container uncompressed: the data actually shrinks
      val raw = TiffCodec.encode(flat, tileSize = 16)
      assert(z.length < raw.length - 40 * 36 * ch / 2,
        s"flat content must actually compress: $z.length vs ${raw.length}")
    }
    var s = 11L
    val smp = Array.fill[Short](21 * 19)(
      { s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 37).toShort })
    val img16 = Image16(21, 19, 1, smp)
    val dec16 = TiffCodec.decode16(
      TiffCodec.encode16(img16, bigEndian = true, packbits = true, predictor = true))
    assert(java.util.Arrays.equals(dec16.samples, img16.samples))
  }

  // ------------------------------------------------------------- LZW
  test("LZW bitstream matches the hand-derived spec vector") {
    // input [7,7,7,8]: Clear, 7, 258 (the just-learned "77"), 8, EOI —
    // five 9-bit codes MSB-packed: 100000000 000000111 100000010
    // 000001000 100000001 + zero pad
    val z = TiffCodec.lzwCompress(Array[Byte](7, 7, 7, 8))
    assert(z.toSeq == Seq(0x80, 0x01, 0xE0, 0x40, 0x88, 0x08).map(_.toByte), {
      z.map(b => f"${b & 0xff}%02x").mkString(" ")
    })
    assert(TiffCodec.lzwDecompress(z, 0, z.length, 4).toSeq == Seq[Byte](7, 7, 7, 8))
  }

  test("LZW round-trips across EVERY code-width boundary and the 4094 reset") {
    var s = 17L
    def rnd(n: Int, span: Int): Array[Byte] = Array.fill[Byte](n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % span).toByte
    }
    // noise grows the table ~1 entry/byte: 1 KiB crosses 511, 2 KiB
    // crosses 1023, 8 KiB crosses 2047, 32 KiB forces the mid-stream
    // Clear at 4094; low-span data exercises long matches + KwKwK
    for ((n, span) <- Seq((300, 256), (1024, 256), (2048, 256), (8192, 256),
                          (40000, 256), (40000, 4), (5000, 2), (1, 256), (0, 256))) {
      val raw = rnd(n, span)
      val z = TiffCodec.lzwCompress(raw)
      val back = TiffCodec.lzwDecompress(z, 0, z.length, n)
      assert(java.util.Arrays.equals(back, raw), s"n=$n span=$span")
    }
    // compressible content actually compresses
    val flat = Array.fill[Byte](10000)(42)
    assert(TiffCodec.lzwCompress(flat).length < 500)
  }

  test("LZW strips refuse truncation and garbage codes") {
    val raw = Array.tabulate[Byte](500)(i => (i * 31).toByte)
    val z = TiffCodec.lzwCompress(raw)
    intercept[IllegalArgumentException](
      TiffCodec.lzwDecompress(z, 0, z.length / 2, 500))
    // a code far beyond the table: craft 9-bit [Clear, 7, 300]
    // 100000000 000000111 100101100 -> bytes
    val bad = Array[Byte](0x80.toByte, 0x01, 0xE5.toByte, 0x80.toByte)
    val e = intercept[IllegalArgumentException](
      TiffCodec.lzwDecompress(bad, 0, bad.length, 10))
    assert(e.getMessage.contains("beyond table"))
  }

  test("LZW + horizontal predictor roundtrip bit-exactly at 8 and 16 bit") {
    for (ch <- Seq(1, 3); be <- Seq(false, true); pred <- Seq(false, true)) {
      val img = noise(33, 40, ch, ch * 1000L + (if (pred) 13 else 3))
      val tif = TiffCodec.encode(img, bigEndian = be, lzw = true,
        predictor = pred)
      // the compression tag really says 5; predictor tag present iff used
      assert(TiffCodec.bitsProbe(tif) == 8)
      val dec = TiffCodec.decode(tif)
      assert(java.util.Arrays.equals(dec.pixels, img.pixels),
        s"ch=$ch be=$be pred=$pred")
    }
    var s = 99L
    for (be <- Seq(false, true); ch <- Seq(1, 3)) {
      val smp = Array.fill[Short](21 * 37 * ch) {
        s = s * 6364136223846793005L + 1442695040888963407L
        (s >>> 37).toShort
      }
      val img = Image16(21, 37, ch, smp)
      val dec = TiffCodec.decode16(TiffCodec.encode16(img, bigEndian = be,
        lzw = true, predictor = true))
      assert(java.util.Arrays.equals(dec.samples, img.samples),
        s"16-bit ch=$ch be=$be")
    }
    // predictor composes with deflate too (tag 317 is orthogonal to 259)
    val img = noise(20, 20, 3, 8L)
    val dec = TiffCodec.decode(TiffCodec.encode(img, deflate = true,
      predictor = true))
    assert(java.util.Arrays.equals(dec.pixels, img.pixels))
    // smooth content is where the predictor pays: gradient rows delta to
    // near-constant strings, so LZW-with-predictor beats LZW-without
    val grad = Image(64, 64, 1,
      Array.tabulate[Byte](64 * 64)(i => ((i % 64) * 3 + i / 64).toByte))
    val withP = TiffCodec.encode(grad, lzw = true, predictor = true).length
    val withoutP = TiffCodec.encode(grad, lzw = true).length
    assert(withP < withoutP, s"predictor $withP !< plain $withoutP")
  }

  // ------------------------------------------------------------- tiles
  test("tiled layout roundtrips bit-exactly across compressions and depths") {
    // 33x40 at 16px tiles -> 3x3 grid with BOTH edge paddings exercised
    for (ch <- Seq(1, 3); be <- Seq(false, true);
         (defl, lz) <- Seq((false, false), (true, false), (false, true));
         pred <- Seq(false, true)) {
      val img = noise(33, 40, ch, ch * 31L + (if (pred) 5 else 0) +
        (if (lz) 11 else 0) + (if (defl) 17 else 0))
      val tif = TiffCodec.encode(img, deflate = defl, bigEndian = be,
        lzw = lz, predictor = pred, tileSize = 16)
      val dec = TiffCodec.decode(tif)
      assert(dec.width == 33 && dec.height == 40 && dec.channels == ch)
      assert(java.util.Arrays.equals(dec.pixels, img.pixels),
        s"ch=$ch be=$be defl=$defl lzw=$lz pred=$pred")
    }
    var s = 3L
    val smp = Array.fill[Short](21 * 19)(
      { s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 37).toShort })
    val deep = TiffCodec.encode16(Image16(21, 19, 1, smp),
      lzw = true, predictor = true, bigEndian = true, tileSize = 16)
    assert(java.util.Arrays.equals(
      TiffCodec.decode16(deep).samples, smp))
    // exact-multiple dims: no padding path
    val ex = noise(32, 32, 1, 77L)
    assert(java.util.Arrays.equals(
      TiffCodec.decode(TiffCodec.encode(ex, tileSize = 32)).pixels, ex.pixels))
  }

  test("tiled scope validation: dims, counts, conflicting tags") {
    intercept[IllegalArgumentException](
      TiffCodec.encode(noise(20, 20, 1, 1L), tileSize = 10)) // not mult of 16
    val good = TiffCodec.encode(noise(40, 40, 1, 2L), tileSize = 16)
    // patch TileWidth (322) to a non-multiple: decode refuses by name
    def patch(tag: Int, v: Int): Array[Byte] = {
      val c = good.clone()
      def u16(p: Int) = (c(p) & 0xff) | ((c(p + 1) & 0xff) << 8)
      val ifd = (c(4) & 0xff) | ((c(5) & 0xff) << 8)
      var i = 0; var at = -1
      while (i < u16(ifd) && at < 0) {
        val e = ifd + 2 + i * 12
        if (u16(e) == tag) at = e
        i += 1
      }
      require(at > 0)
      c(at + 8) = (v & 0xff).toByte; c(at + 9) = ((v >> 8) & 0xff).toByte
      c(at + 10) = 0; c(at + 11) = 0
      c
    }
    val e = intercept[IllegalArgumentException](TiffCodec.decode(patch(322, 10)))
    assert(e.getMessage.contains("tile"))
    // oversized tile dims refuse on the pixel budget before allocating
    val e2 = intercept[IllegalArgumentException](
      TiffCodec.decode(patch(322, 0x8000), maxPixels = 1 << 20))
    assert(e2.getMessage.contains("tile") || e2.getMessage.contains("px"))
  }

  test("bitsProbe reads depth from the IFD alone; never throws") {
    for (be <- Seq(false, true)) {
      assert(TiffCodec.bitsProbe(TiffCodec.encode(noise(9, 7, 3, 2L),
        deflate = false, be)) == 8)
      assert(TiffCodec.bitsProbe(TiffCodec.encode16(
        Image16(9, 7, 1, Array.tabulate[Short](63)(i => (i * 991).toShort)),
        deflate = true, be)) == 16)
    }
    // inconclusive inputs answer 8 (the routed decode validates):
    assert(TiffCodec.bitsProbe(Array[Byte]('I', 'I', 42, 0)) == 8)
    assert(TiffCodec.bitsProbe(Array.fill[Byte](32)(0x4d)) == 8)
    assert(TiffCodec.bitsProbe(Array.empty[Byte]) == 8)
  }

  test("the two decode surfaces refuse each other's depths by name") {
    val deep = TiffCodec.encode16(Image16(4, 4, 1,
      Array.tabulate[Short](16)(i => (i * 4111).toShort)))
    val e = intercept[IllegalArgumentException](TiffCodec.decode(deep))
    assert(e.getMessage.contains("decode16"))
    val shallow = TiffCodec.encode(noise(4, 4, 1, 9L))
    val e2 = intercept[IllegalArgumentException](TiffCodec.decode16(shallow))
    assert(e2.getMessage.contains("8-bit"))
  }

  test("scope refusals are loud and specific") {
    val base = TiffCodec.encode(noise(16, 16, 1, 3L))
    // find the IFD entry for a tag and overwrite its inline value
    def patchTagValue(bytes: Array[Byte], tag: Int, v: Int): Array[Byte] = {
      val c = bytes.clone()
      def u16(p: Int) = (c(p) & 0xff) | ((c(p + 1) & 0xff) << 8)
      val ifd = (c(4) & 0xff) | ((c(5) & 0xff) << 8)
      val n = u16(ifd)
      var i = 0; var at = -1
      while (i < n && at < 0) {
        val e = ifd + 2 + i * 12
        if (u16(e) == tag) at = e
        i += 1
      }
      require(at > 0, s"tag $tag not in fixture")
      c(at + 8) = (v & 0xff).toByte; c(at + 9) = ((v >> 8) & 0xff).toByte
      c
    }
    val e1 = intercept[IllegalArgumentException](
      TiffCodec.decode(patchTagValue(base, 259, 2))) // CCITT group 3
    assert(e1.getMessage.contains("compression"))
    val e1b = intercept[IllegalArgumentException](
      TiffCodec.decode(patchTagValue(base, 259, 7))) // JPEG-in-TIFF
    assert(e1b.getMessage.contains("compression"))
    val e2 = intercept[IllegalArgumentException](
      TiffCodec.decode(patchTagValue(base, 262, 3))) // palette photometric
    assert(e2.getMessage.contains("photometric"))
    // the floating-point predictor stays off-scope (horizontal is in)
    val predBase = TiffCodec.encode(noise(16, 16, 1, 4L), lzw = true,
      predictor = true)
    val e3 = intercept[IllegalArgumentException](
      TiffCodec.decode(patchTagValue(predBase, 317, 3)))
    assert(e3.getMessage.contains("predictor"))
    // bad magic / order mark
    val bad = base.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException](TiffCodec.decode(bad))
    val badMagic = base.clone(); badMagic(2) = 41
    intercept[IllegalArgumentException](TiffCodec.decode(badMagic))
  }

  test("strip accounting is validated: counts, spans, inflation bounds") {
    val base = TiffCodec.encode(noise(16, 40, 1, 4L), deflate = true)
    // truncating mid-strip-data must refuse, never return a short image
    val cut = base.take(base.length - 8)
    val e = intercept[Exception](TiffCodec.decode(cut))
    assert(e.getMessage != null)
  }
}
