package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{G711Codec, LegacyAudio, WavCodec}
import LegacyAudio.{Aiff, Au, Sphere}

/** The legacy speech-corpus containers (AIFF/AIFC, AU, NIST SPHERE):
  * exact round trips per profile, the 80-bit extended sample-rate
  * field, byte-order and signedness spec points, magic dispatch through
  * WavCodec, header-edge and truncation refusals, and the named
  * refusals for off-scope compressions (ima4, G.721, Shorten). */
class LegacyAudioSpec extends AnyFunSuite {

  private def pcm(n: Int, seed: Int = 7): Array[Short] =
    Array.tabulate(n)(i => (((i * 31 + seed) * 997) % 65536 - 32768).toShort)

  private def roundTrip(bytes: Array[Byte], expect: Array[Short],
                        channels: Int, rate: Int): Unit = {
    val d = WavCodec.decode(bytes) // through the magic front door
    assert(d.channels == channels && d.sampleRate == rate)
    assert(d.samples.length == expect.length)
    expect.indices.foreach { i =>
      assert(math.round(d.samples(i) * 32768f) == expect(i).toInt,
        s"sample $i: ${d.samples(i)} vs ${expect(i)}")
    }
  }

  // ------------------------------------------------------------- AIFF
  test("AIFF: 80-bit extended float parses the real sample rates exactly") {
    for (r <- Seq(8000, 11025, 16000, 22050, 32000, 44100, 48000, 96000)) {
      val out = new java.io.ByteArrayOutputStream()
      Aiff.writeExtended80(out, r.toDouble)
      val b = out.toByteArray
      assert(b.length == 10)
      assert(Aiff.extended80(b, 0) == r.toDouble, s"rate $r")
    }
    // zero encodes as all-zero exponent+mantissa → 0.0 (degenerate header)
    assert(Aiff.extended80(new Array[Byte](10), 0) == 0.0)
  }

  test("AIFF big-endian PCM16 round trips bit-exactly via the front door") {
    val s = pcm(777)
    roundTrip(Aiff.encodePcm16(s, 1, 44100), s, 1, 44100)
  }

  test("AIFC sowt (little-endian PCM16) round trips; stereo shape kept") {
    val s = pcm(600, seed = 3)
    roundTrip(Aiff.encodePcm16(s, 2, 22050, sowt = true), s, 2, 22050)
  }

  test("AIFF PCM8 is SIGNED (the WAV-unsigned trap) and PCM24/32/fl32 decode") {
    // hand-build a minimal AIFF with 8-bit data: values are raw signed bytes
    val vals = Array[Byte](-128, -1, 0, 1, 127)
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def be32(v: Int): Unit = { be16(v >>> 16); be16(v & 0xffff) }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val dataLen = vals.length + (vals.length & 1) // word-aligned chunk
    cc("FORM"); be32(4 + 26 + 16 + dataLen + 1); cc("AIFF")
    cc("COMM"); be32(18); be16(1); be32(vals.length); be16(8)
    Aiff.writeExtended80(out, 8000.0)
    cc("SSND"); be32(8 + vals.length); be32(0); be32(0)
    out.write(vals); if ((vals.length & 1) == 1) out.write(0)
    val d = Aiff.decode(out.toByteArray)
    assert(d.samples.toSeq == vals.toSeq.map(_ / 128.0f))
  }

  test("AIFC ulaw rides G711Codec; unknown compression refuses by name") {
    val codes = Array.tabulate(64)(i => (i * 4 + 1).toByte)
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def be32(v: Int): Unit = { be16(v >>> 16); be16(v & 0xffff) }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def build(comp: String): Array[Byte] = {
      out.reset()
      cc("FORM"); be32(4 + 32 + 16 + codes.length); cc("AIFC")
      cc("COMM"); be32(24); be16(1); be32(codes.length); be16(8)
      Aiff.writeExtended80(out, 8000.0)
      cc(comp); be16(0) // empty pstring, padded
      cc("SSND"); be32(8 + codes.length); be32(0); be32(0)
      out.write(codes)
      out.toByteArray
    }
    val d = Aiff.decode(build("ulaw"))
    codes.indices.foreach { i =>
      assert(math.round(d.samples(i) * 32768f) ==
        G711Codec.muLawDecodeSample(codes(i)).toInt)
    }
    val e = intercept[IllegalArgumentException](Aiff.decode(build("ima4")))
    assert(e.getMessage.contains("ima4"))
  }

  test("AIFF refusals: bad magic, overrunning chunk, missing COMM/SSND") {
    val good = Aiff.encodePcm16(pcm(32), 1, 8000)
    val badForm = good.clone(); badForm(8) = 'W'
    assert(intercept[IllegalArgumentException](Aiff.decode(badForm))
      .getMessage.contains("not AIFF"))
    // truncating mid-SSND makes the chunk overrun the file
    assert(intercept[IllegalArgumentException](
      Aiff.decode(good.take(good.length - 10))).getMessage.contains("overruns"))
    // a FORM wrapping only a COMM has no SSND
    val noSsnd = good.take(12 + 8 + 18)
    val b = java.nio.ByteBuffer.wrap(noSsnd)
    b.putInt(4, noSsnd.length - 8)
    assert(intercept[IllegalArgumentException](Aiff.decode(noSsnd))
      .getMessage.contains("SSND"))
  }

  // --------------------------------------------------------------- AU
  test("AU PCM16 BE round trips via the front door") {
    val s = pcm(500, seed = 11)
    roundTrip(Au.encode(s, 1, 16000, encoding = 3), s, 1, 16000)
  }

  test("AU PCM8 is SIGNED and µ-law rides G711Codec") {
    val s: Array[Short] = Array(-32768, -256, 0, 256, 32512).map(_.toShort)
    val d8 = WavCodec.decode(Au.encode(s, 1, 8000, encoding = 2))
    assert(d8.samples.toSeq == s.toSeq.map(v => (v >> 8).toByte / 128.0f))
    val dmu = WavCodec.decode(Au.encode(s, 1, 8000, encoding = 1))
    s.indices.foreach { i =>
      val code = G711Codec.muLawEncodeSample(s(i))
      assert(math.round(dmu.samples(i) * 32768f) ==
        G711Codec.muLawDecodeSample(code).toInt)
    }
  }

  test("AU unknown data size (0xFFFFFFFF) reads to EOF; G.721 refuses by name") {
    val s = pcm(300)
    val bytes = Au.encode(s, 1, 8000, encoding = 3)
    val buf = java.nio.ByteBuffer.wrap(bytes)
    buf.putInt(8, 0xffffffff)
    roundTrip(bytes, s, 1, 8000)
    buf.putInt(12, 23) // G.721 ADPCM
    val e = intercept[IllegalArgumentException](Au.decode(bytes))
    assert(e.getMessage.contains("G.721"))
  }

  test("AU refusals: short header, bad offset, declared size overrun") {
    assert(intercept[IllegalArgumentException](
      Au.decode(".snd".getBytes("US-ASCII"))).getMessage.contains("too short"))
    val s = pcm(50)
    val bytes = Au.encode(s, 1, 8000)
    val buf = java.nio.ByteBuffer.wrap(bytes)
    buf.putInt(4, bytes.length + 4) // offset past EOF
    assert(intercept[IllegalArgumentException](Au.decode(bytes))
      .getMessage.contains("offset"))
    buf.putInt(4, 28)
    buf.putInt(8, bytes.length) // declared > available
    assert(intercept[IllegalArgumentException](Au.decode(bytes))
      .getMessage.contains("overruns"))
  }

  // ----------------------------------------------------------- SPHERE
  test("SPHERE PCM16 round trips in BOTH byte orders via the front door") {
    val s = pcm(444, seed = 5)
    roundTrip(Sphere.encodePcm16(s, 1, 16000, bigEndian = false), s, 1, 16000)
    roundTrip(Sphere.encodePcm16(s, 1, 16000, bigEndian = true), s, 1, 16000)
  }

  test("SPHERE header: 1024-byte fixed region, sample_count trims tail pad") {
    val s = pcm(100)
    val bytes = Sphere.encodePcm16(s, 1, 8000)
    assert(bytes.length == 1024 + 200)
    assert(new String(bytes, 0, 16, "US-ASCII") == "NIST_1A\n   1024\n")
    // appended trailing junk beyond sample_count*2 is trimmed, not decoded
    val padded = bytes ++ Array[Byte](9, 9, 9, 9)
    val d = Sphere.decode(padded)
    assert(d.samples.length == 100)
    // but a SHORT file (fewer frames than declared) refuses
    assert(intercept[IllegalArgumentException](
      Sphere.decode(bytes.take(1024 + 150))).getMessage.contains("truncated"))
  }

  test("SPHERE ulaw coding decodes through G711; shorten refuses by name") {
    val codes = Array.tabulate(80)(i => (i * 3 + 2).toByte)
    def build(coding: String, nBytes: Int, data: Array[Byte]): Array[Byte] = {
      val head = s"channel_count -i 1\nsample_count -i ${data.length / nBytes}\n" +
        s"sample_rate -i 8000\nsample_n_bytes -i $nBytes\n" +
        s"sample_coding -s${coding.length} $coding\nend_head\n"
      val out = new java.io.ByteArrayOutputStream()
      out.write("NIST_1A\n   1024\n".getBytes("US-ASCII"))
      out.write(head.getBytes("US-ASCII"))
      (0 until (1024 - 16 - head.length)).foreach(_ => out.write(' '))
      out.write(data)
      out.toByteArray
    }
    val d = Sphere.decode(build("ulaw", 1, codes))
    codes.indices.foreach { i =>
      assert(math.round(d.samples(i) * 32768f) ==
        G711Codec.muLawDecodeSample(codes(i)).toInt)
    }
    val e = intercept[IllegalArgumentException](
      Sphere.decode(build("pcm,embedded-shorten-v2.00", 2, new Array[Byte](8))))
    assert(e.getMessage.contains("shorten"))
    val w = intercept[IllegalArgumentException](
      Sphere.decode(build("pcm,embedded-wavpack", 2, new Array[Byte](8))))
    assert(w.getMessage.contains("wavpack"))
  }

  test("SPHERE refusals: bad magic, bad header length, missing fields") {
    assert(intercept[IllegalArgumentException](
      Sphere.decode("NIST_2B\n   1024\n".getBytes("US-ASCII") ++ new Array[Byte](16)))
      .getMessage.contains("NIST_1A"))
    assert(intercept[IllegalArgumentException](
      Sphere.decode("NIST_1A\n  99999\n".getBytes("US-ASCII") ++ new Array[Byte](16)))
      .getMessage.contains("header length"))
    val noRate = {
      val head = "channel_count -i 1\nend_head\n"
      val out = new java.io.ByteArrayOutputStream()
      out.write("NIST_1A\n   1024\n".getBytes("US-ASCII"))
      out.write(head.getBytes("US-ASCII"))
      (0 until (1024 - 16 - head.length)).foreach(_ => out.write(' '))
      out.toByteArray
    }
    assert(intercept[IllegalArgumentException](Sphere.decode(noRate))
      .getMessage.contains("sample_rate"))
  }

  // ------------------------------------------------ determinism + fuzz
  test("encoders are byte-deterministic; random truncations never mis-decode") {
    val s = pcm(256)
    for (mk <- Seq[() => Array[Byte]](
      () => Aiff.encodePcm16(s, 1, 16000),
      () => Aiff.encodePcm16(s, 1, 16000, sowt = true),
      () => Au.encode(s, 1, 16000),
      () => Sphere.encodePcm16(s, 1, 16000))) {
      val a = mk(); val b = mk()
      assert(java.util.Arrays.equals(a, b))
      // every truncation point either decodes a PREFIX of the samples
      // exactly or refuses — never silently corrupt values
      for (cut <- Seq(3, 9, 17, a.length / 2, a.length - 1)) {
        try {
          val d = WavCodec.decode(a.take(cut))
          d.samples.zipWithIndex.foreach { case (v, i) =>
            assert(math.round(v * 32768f) == s(i).toInt, s"cut=$cut idx=$i")
          }
        } catch { case _: IllegalArgumentException | _: RuntimeException => () }
      }
    }
  }
}
