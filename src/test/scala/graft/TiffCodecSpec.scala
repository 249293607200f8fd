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
      TiffCodec.decode(patchTagValue(base, 259, 5))) // LZW
    assert(e1.getMessage.contains("compression"))
    val e2 = intercept[IllegalArgumentException](
      TiffCodec.decode(patchTagValue(base, 262, 3))) // palette photometric
    assert(e2.getMessage.contains("photometric"))
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
