package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.AdpcmCodec

/** io/AdpcmCodec contracts beyond q235's hash gate: the exact-signal
  * class round-trips sample-for-sample, arbitrary signals decode with
  * the quantizer's bounded error, the container fields parse back, the
  * bitstream layout is frozen by a byte-level golden, and malformed
  * streams fail loudly. */
class AdpcmCodecSpec extends AnyFunSuite {

  private def walk(n: Int, salt: Int, base: Int): Array[Short] = {
    val pcm = new Array[Short](n)
    var v = base
    pcm(0) = v.toShort
    var i = 1
    while (i < n) { v += ((i * 7 + salt) % 3) - 1; pcm(i) = v.toShort; i += 1 }
    pcm
  }

  test("±1-step signals round-trip exactly across block boundaries") {
    for (n <- Seq(1, 2, 504, 505, 506, 1300); salt <- Seq(0, 5)) {
      val pcm = walk(n, salt, base = -200)
      val wav = AdpcmCodec.encodeWav(pcm, 16000, blockAlign = 256)
      val (info, got) = AdpcmCodec.decodeWav(wav)
      assert(info.totalSamples == n && info.sampleRate == 16000)
      assert(info.samplesPerBlock == 505)
      assert(got.toSeq == pcm.toSeq, s"n=$n salt=$salt diverged")
    }
  }

  test("arbitrary signals decode length-exact with bounded error") {
    val n = 2000
    val pcm = Array.tabulate(n)(i =>
      (8000 * math.sin(i / 23.0) + 3000 * math.sin(i / 7.0)).toShort)
    val (_, got) = AdpcmCodec.decodeWav(AdpcmCodec.encodeWav(pcm, 8000))
    assert(got.length == n)
    val errs = pcm.zip(got).map { case (a, b) => math.abs(a - b) }
    // the signal opens at max slope against the minimum step, so the
    // first samples carry the quantizer's adaptation lag; once the step
    // has tracked up, error settles to step-size scale
    assert(errs.max <= 4000, s"max reconstruction error ${errs.max}")
    val settled = errs.drop(200).max
    assert(settled <= 2000, s"post-adaptation error $settled")
    // every block's first sample is stored verbatim (header predictor)
    val spb = 505
    (0 until n by spb).foreach(i => assert(got(i) == pcm(i), s"block head $i"))
  }

  test("full-scale steps clamp instead of wrapping") {
    val pcm = Array[Short](0, 32767, -32768, 32767, -32768, 0, 0, 0)
    val (_, got) = AdpcmCodec.decodeWav(AdpcmCodec.encodeWav(pcm, 8000))
    assert(got.length == pcm.length)
    assert(got.forall(v => v >= -32768 && v <= 32767))
  }

  test("compression is 4:1-class over raw int16") {
    val pcm = walk(5050, salt = 3, base = 0)
    val wav = AdpcmCodec.encodeWav(pcm, 16000, blockAlign = 256)
    // 10 full blocks of 256 bytes + ~60 container bytes vs 10100 raw
    assert(wav.length < 2 * pcm.length / 3,
      s"${wav.length} bytes for ${2 * pcm.length} raw")
  }

  test("bitstream layout is frozen (byte-level golden)") {
    // blockAlign 8 → 9 samples/block: 12 samples = 1 full + 1 padded block
    val pcm = Array[Short](10, 11, 11, 10, 9, 9, 10, 11, 12, 12, 11, 10)
    val wav = AdpcmCodec.encodeWav(pcm, 8000, blockAlign = 8)
    val hex = wav.map("%02x".format(_)).mkString
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(wav).map("%02x".format(_)).mkString
    // hand-verified: block1 = pred 10, idx 0, nibbles 1,0,9,9,0,1,1,1
    // packed low-first (01 99 10 11); block2 = pred 12, nibbles 9,9 (99)
    // + 3 pad bytes; fact = 12
    assert(md5 == "c7701ac02e25c013d6a04ecfb3f9a08f",
      s"bitstream changed: md5=$md5 hex=$hex")
    val (info, got) = AdpcmCodec.decodeWav(wav)
    assert(info.blockAlign == 8 && info.samplesPerBlock == 9)
    assert(got.toSeq == pcm.toSeq)
  }

  test("WavCodec dispatches format 0x11 through the ADPCM block layer") {
    val pcm = walk(700, salt = 2, base = 100) // exact class: decode is lossless
    val wav = AdpcmCodec.encodeWav(pcm, 16000)
    val dec = graft.io.WavCodec.decode(wav)
    assert(dec.channels == 1 && dec.sampleRate == 16000)
    assert(dec.samples.length == 700)
    assert(dec.samples.toSeq == pcm.map(_ / 32768.0f).toSeq)
  }

  test("malformed streams fail loudly") {
    val ok = AdpcmCodec.encodeWav(walk(100, 1, 0), 8000)
    intercept[IllegalArgumentException](AdpcmCodec.decodeWav(ok.take(40))) // no data
    val wrongTag = ok.clone(); wrongTag(20) = 1 // wFormatTag -> PCM
    intercept[IllegalArgumentException](AdpcmCodec.decodeWav(wrongTag))
    val truncated = ok.take(ok.length - 10)
    intercept[IllegalArgumentException](AdpcmCodec.decodeWav(truncated))
    intercept[IllegalArgumentException](
      AdpcmCodec.decodeWav("not a wav".getBytes("US-ASCII")))
  }
}
