package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{ImageCodecs, JpegCodec, Mp4Mjpeg}
import graft.ops.{ImageOps, Multimodal}

/** MJPEG-in-MP4: mux → sample-table demux → own-codec decode. The spec
  * pins byte-exact sample recovery through uneven stsc runs, full-
  * fidelity JPEG decode of the extracted samples, the non-JPEG refusal
  * boundary, and container-probe agreement. */
class Mp4MjpegSpec extends AnyFunSuite {

  private def frames(n: Int, w: Int = 24, h: Int = 16): Vector[Array[Byte]] =
    Vector.tabulate(n)(f => JpegCodec.encode(ImageOps.synth(w, h, f % 4)))

  test("mux → mp4Samples recovers every sample byte-exactly (uneven chunks)") {
    val fs = frames(7)
    val mp4 = Mp4Mjpeg.mux(fs, Seq(3, 2, 1, 1)) // three distinct stsc runs
    val got = Multimodal.mp4Samples(mp4).getOrElse(fail("demux returned None"))
    assert(got.length == 7)
    got.zip(fs).zipWithIndex.foreach { case ((g, f), i) =>
      assert(java.util.Arrays.equals(g, f), s"sample $i corrupted in transit")
    }
    // the probe reads the same file's box structure
    val p = Multimodal.probeContainer(mp4)
    assert(p.format == "mp4" && p.brand == "isom")
    assert(p.chunks.map(_.id) == Seq("ftyp", "moov", "mdat"))
  }

  test("extracted samples decode through the engine's own JpegCodec") {
    val src = ImageOps.synth(32, 24, 3)
    val jpg = JpegCodec.encode(src)
    val mp4 = Mp4Mjpeg.mux(Vector(jpg, jpg, jpg), Seq(2, 1))
    val got = Multimodal.mp4Samples(mp4).get
    // decoding a demuxed sample equals decoding the original stream:
    // the container added or dropped NOTHING
    val direct = JpegCodec.decode(jpg)
    got.foreach { s =>
      val dec = ImageCodecs.decodeAny(s) match {
        case Left(i) => i
        case Right(_) => fail("8-bit MJPEG dispatched deep")
      }
      assert(dec.width == 32 && dec.height == 24 && dec.channels == 3)
      assert(java.util.Arrays.equals(dec.pixels, direct.pixels))
    }
  }

  test("non-JPEG sample payloads refuse loudly at decode (pinned boundary)") {
    // an H.26x-style Annex-B payload: starts 00 00 00 01 — not a magic
    // the image front door knows, so decode refuses by name instead of
    // mis-decoding; the DEMUX still serves the bytes (extraction needs
    // no codec)
    val nal = Array[Byte](0, 0, 0, 1, 0x65, 0x42, 7, 7, 7, 7)
    val mp4 = Mp4Mjpeg.mux(Vector(nal, nal), Seq(2))
    val got = Multimodal.mp4Samples(mp4).get
    assert(got.length == 2 && java.util.Arrays.equals(got.head, nal))
    val e = intercept[IllegalArgumentException](ImageCodecs.decodeAny(got.head))
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("strict demux refuses foreign codecs BY FOURCC NAME (round 14, " +
       "the Ogg Opus/Speex/Theora convention)") {
    val nal = Array[Byte](0, 0, 0, 1, 0x65, 0x42, 7, 7, 7, 7)
    for ((cc, name) <- Seq("avc1" -> "H.264", "hvc1" -> "H.265",
                           "mp4a" -> "AAC", "av01" -> "AV1")) {
      val mp4 = Mp4Mjpeg.mux(Vector(nal), Seq(1), sampleEntry = cc)
      // the tolerant demux still serves bytes (FuzzSpec's never-throw
      // contract); the STRICT decode-path demux names the codec
      assert(Multimodal.mp4Samples(mp4).get.length == 1)
      val e = intercept[IllegalArgumentException](
        Multimodal.mp4SamplesStrict(mp4))
      assert(e.getMessage.contains(s"'$cc'") && e.getMessage.contains(name),
        s"$cc: ${e.getMessage}")
    }
    // our own sample entry passes strict; an UNKNOWN fourcc passes too
    // (the per-sample magic sniff still guards it)
    val jpg = frames(1).head
    assert(Multimodal.mp4SamplesStrict(
      Mp4Mjpeg.mux(Vector(jpg), Seq(1))).get.length == 1)
    assert(Multimodal.mp4SamplesStrict(
      Mp4Mjpeg.mux(Vector(nal), Seq(1), sampleEntry = "zzzz")).get.length == 1)
    // sample-entry inspector reads the stsd fourcc
    assert(Multimodal.mp4SampleEntry(
      Mp4Mjpeg.mux(Vector(jpg), Seq(1))).contains("jpeg"))
  }

  test("strict demux inspects EVERY trak: a timecode-first file cannot " +
       "smuggle its avc1 media track past the boundary") {
    // minimal two-trak ISO-BMFF: ftyp + moov(trak(tmcd), trak(avc1)) —
    // no sample tables needed; the strict check reads only the stsd
    // entries, which is the point (refusal BEFORE any demux work)
    def be32(v: Long): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(id: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8L + body.length) ++ id.getBytes("ASCII") ++ body
    }
    def trakOf(cc: String): Array[Byte] =
      box("trak", box("mdia", box("minf", box("stbl",
        box("stsd", be32(0), be32(1), box(cc, new Array[Byte](8)))))))
    val mp4 = box("ftyp", "isom".getBytes("ASCII"), be32(0)) ++
      box("moov", trakOf("tmcd"), trakOf("avc1"))
    assert(Multimodal.mp4SampleEntries(mp4) == Seq("tmcd", "avc1"))
    val e = intercept[IllegalArgumentException](
      Multimodal.mp4SamplesStrict(mp4))
    assert(e.getMessage.contains("'avc1'"))
  }

  test("a 'jpeg' media track with an mp4a AUDIO side-track passes strict " +
       "(real MJPEG corpora mux audio; the demux never touches it)") {
    val fs = frames(2)
    val mp4 = Mp4Mjpeg.mux(fs, Seq(2), postTraks = Seq("mp4a"))
    assert(Multimodal.mp4SampleEntries(mp4) == Seq("jpeg", "mp4a"))
    val got = Multimodal.mp4SamplesStrict(mp4).get
    assert(got.length == 2 && java.util.Arrays.equals(got.head, fs.head))
    // but an AUDIO-LED file (first/chosen trak is mp4a) refuses by name
    val audioLed = Mp4Mjpeg.mux(fs, Seq(2), sampleEntry = "mp4a")
    val e = intercept[IllegalArgumentException](
      Multimodal.mp4SamplesStrict(audioLed))
    assert(e.getMessage.contains("'mp4a'"))
  }

  test("a timecode-FIRST file demuxes its 'jpeg' media track (the demux " +
       "prefers the jpeg trak, not blindly trak 1)") {
    val fs = frames(3)
    val mp4 = Mp4Mjpeg.mux(fs, Seq(2, 1), preTraks = Seq("tmcd"))
    assert(Multimodal.mp4SampleEntries(mp4) == Seq("tmcd", "jpeg"))
    val got = Multimodal.mp4SamplesStrict(mp4).get
    assert(got.length == 3)
    fs.indices.foreach(i => assert(java.util.Arrays.equals(got(i), fs(i))))
    // and the decoded pixels are intact through the preferred-trak path
    val dec = JpegCodec.decode(got.head)
    assert(dec.width > 0 && dec.height > 0)
  }

  test("mux validates its inputs") {
    intercept[IllegalArgumentException](Mp4Mjpeg.mux(Vector.empty, Seq.empty))
    intercept[IllegalArgumentException](Mp4Mjpeg.mux(frames(3), Seq(2, 2)))
    intercept[IllegalArgumentException](Mp4Mjpeg.mux(frames(3), Seq(3, 0)))
  }

  test("flat-block MJPEG frames ride MP4 bit-exactly (the q322 contract)") {
    // same content discipline as the board entry: decoded pixels must
    // EQUAL the closed form, not approximate it
    val w = 32; val h = 16
    val px = Array.tabulate[Byte](w * h) { p =>
      val bx = (p % w) / 8; val by = (p / w) / 8
      ((((bx * 7 + by * 13 + 5 * 11) % 32) * 8 + 3)).toByte
    }
    val mp4 = Mp4Mjpeg.mux(
      Vector(JpegCodec.encode(graft.io.PngCodec.Image(w, h, 1, px))), Seq(1))
    val dec = JpegCodec.decode(Multimodal.mp4Samples(mp4).get.head)
    assert(java.util.Arrays.equals(dec.pixels, px))
  }
}
