package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{G711Codec, WavCodec}

/** io/G711Codec contracts beyond q243's hash gate: known-value pins from
  * the ITU-T tables, code-space idempotence (encode∘decode = identity on
  * all codes, minus µ-law's collapsed negative zero), bounded
  * reconstruction error on arbitrary PCM, and container dispatch. */
class G711CodecSpec extends AnyFunSuite {

  test("known-value pins") {
    assert(G711Codec.muLawDecodeSample(0xff.toByte) == 0)    // +0
    assert(G711Codec.muLawDecodeSample(0x7f.toByte) == 0)    // −0 collapses
    assert(G711Codec.muLawDecodeSample(0x00.toByte) == -32124) // max negative
    assert(G711Codec.muLawDecodeSample(0x80.toByte) == 32124)  // max positive
    assert(G711Codec.aLawDecodeSample(0xd5.toByte) == 8)     // smallest positive
    assert(G711Codec.aLawDecodeSample(0x55.toByte) == -8)
    assert(G711Codec.aLawDecodeSample(0xaa.toByte) == 32256) // max positive
  }

  test("encode∘decode is the identity on the code space") {
    (0 until 256).foreach { c =>
      val b = c.toByte
      if (c != 0x7f) // µ-law −0 decodes to 0, which re-encodes as +0 (0xFF)
        assert(G711Codec.muLawEncodeSample(G711Codec.muLawDecodeSample(b)) == b,
          f"mu-law code 0x$c%02x")
      assert(G711Codec.aLawEncodeSample(G711Codec.aLawDecodeSample(b)) == b,
        f"a-law code 0x$c%02x")
    }
  }

  test("bounded reconstruction error on arbitrary PCM") {
    val pcm = Array.tabulate(4000)(i => (30000 * math.sin(i / 17.0)).toShort)
    for (aLaw <- Seq(false, true)) {
      val dec = WavCodec.decode(G711Codec.encodeWav(pcm, 8000, aLaw))
      assert(dec.samples.length == pcm.length && dec.sampleRate == 8000)
      val maxErr = pcm.zip(dec.samples).map { case (a, f) =>
        math.abs(a - math.round(f * 32768f))
      }.max
      // logarithmic companding: top-segment step is 1024 — error < one step
      assert(maxErr <= 1024, s"aLaw=$aLaw maxErr=$maxErr")
    }
  }

  test("container dispatch: fmt 7/6 through WavCodec, fields intact") {
    val codes = Array.tabulate(300)(i => (i * 37 % 256).toByte)
    val mu = WavCodec.decode(G711Codec.wrapWav(codes, 16000, aLaw = false))
    assert(mu.channels == 1 && mu.sampleRate == 16000 && mu.samples.length == 300)
    assert(mu.samples.toSeq == codes.map(b =>
      G711Codec.muLawDecodeSample(b) / 32768.0f).toSeq)
    val al = WavCodec.decode(G711Codec.wrapWav(codes, 8000, aLaw = true))
    assert(al.samples.toSeq == codes.map(b =>
      G711Codec.aLawDecodeSample(b) / 32768.0f).toSeq)
  }

  test("PCM24 and PCM32 WAV decode exactly (studio capture widths)") {
    def wav(fmt: Int, bits: Int, data: Array[Byte]): Array[Byte] = {
      val hdr = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hdr.putInt(0x46464952); hdr.putInt(36 + data.length)
      hdr.putInt(0x45564157); hdr.putInt(0x20746d66); hdr.putInt(16)
      hdr.putShort(fmt.toShort); hdr.putShort(1)
      hdr.putInt(16000); hdr.putInt(16000 * bits / 8)
      hdr.putShort((bits / 8).toShort); hdr.putShort(bits.toShort)
      hdr.putInt(0x61746164); hdr.putInt(data.length)
      hdr.array() ++ data
    }
    val v24 = Seq(-8388608, -1, 0, 1, 8388607, 4242424, -333333)
    val d24 = v24.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)).toArray
    val dec24 = WavCodec.decode(wav(1, 24, d24))
    assert(dec24.samples.toSeq == v24.map(_ / 8388608.0f))
    val v32 = Seq(Int.MinValue, -1, 0, 1, Int.MaxValue, 987654321)
    val b32 = java.nio.ByteBuffer.allocate(v32.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    v32.foreach(b32.putInt)
    val dec32 = WavCodec.decode(wav(1, 32, b32.array()))
    assert(dec32.samples.toSeq == v32.map(v => (v / 2147483648.0).toFloat))
    // an unsupported pairing still refuses loudly
    val e = intercept[IllegalArgumentException](
      WavCodec.decode(wav(1, 12, new Array[Byte](12))))
    assert(e.getMessage.contains("unsupported wav format"))
  }
}
