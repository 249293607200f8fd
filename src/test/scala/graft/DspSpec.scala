package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dsp
import graft.io.WavCodec

class DspSpec extends AnyFunSuite {

  private def sine(freq: Double, ms: Int, rate: Int, amp: Double): Array[Float] =
    Array.tabulate(rate * ms / 1000)(i => (amp * math.sin(2 * math.Pi * freq * i / rate)).toFloat)

  test("peakNormalize brings peak to ~0.9886 (0.1 dB headroom) and keeps silence") {
    val s = sine(440, 100, 16000, 0.25)
    val n = Dsp.peakNormalize(s)
    val peak = n.map(math.abs).max
    assert(math.abs(peak - math.pow(10, -0.1 / 20)) < 1e-3)
    val z = new Array[Float](100)
    assert(Dsp.peakNormalize(z).forall(_ == 0f))
  }

  test("downmixMono averages channels") {
    val interleaved = Array(1f, 0f, 0.5f, -0.5f, -1f, 1f)
    assert(Dsp.downmixMono(interleaved, 2).toSeq == Seq(0.5f, 0f, 0f))
    assert(Dsp.downmixMono(interleaved, 1) eq interleaved)
  }

  test("resampleLinear halves/keeps sample counts and preserves a DC signal") {
    val dc = Array.fill(4410)(0.3f)
    val out = Dsp.resampleLinear(dc, 44100, 16000)
    assert(out.length == 4410L * 16000 / 44100)
    assert(out.forall(v => math.abs(v - 0.3f) < 1e-6))
    assert(Dsp.resampleLinear(dc, 16000, 16000) eq dc)
  }

  test("rmsInt16 of a full-scale square is ~32767, of silence 0") {
    val sq = Array.fill(1600)(1.0f)
    assert(math.abs(Dsp.rmsInt16(sq) - 32767.0) < 1e-6)
    assert(Dsp.rmsInt16(new Array[Float](100)) == 0.0)
    // sine rms = amp/sqrt(2)
    val s = sine(100, 1000, 16000, 0.5)
    assert(math.abs(Dsp.rmsInt16(s) - 0.5 * 32767 / math.sqrt(2)) < 40)
  }

  test("clippingPercent counts |x| >= 0.98") {
    val s = Array(0.99f, -0.99f, 0.5f, 0.979f)
    assert(Dsp.clippingPercent(s) == 50.0)
  }

  test("low/high pass split energy by band") {
    val rate = 16000
    val lo = sine(50, 500, rate, 0.5)
    val hi = sine(6000, 500, rate, 0.5)
    // low-pass at 80 Hz keeps most of the 50 Hz tone, kills the 6 kHz tone
    assert(Dsp.rmsInt16(Dsp.lowPass(lo, 80, rate)) > 0.3 * Dsp.rmsInt16(lo))
    assert(Dsp.rmsInt16(Dsp.lowPass(hi, 80, rate)) < 0.1 * Dsp.rmsInt16(hi))
    // high-pass at 8 kHz: suppresses 50 Hz
    assert(Dsp.rmsInt16(Dsp.highPass(lo, 8000, rate)) < 0.2 * Dsp.rmsInt16(lo))
  }

  test("musicRatio: speech-band content low, band-extreme content high") {
    val rate = 16000
    val speech = sine(300, 1000, rate, 0.4).lazyZip(sine(1200, 1000, rate, 0.3)).map(_ + _).toArray
    val music = sine(50, 1000, rate, 0.45).lazyZip(sine(7900, 1000, rate, 0.45)).map(_ + _).toArray
    assert(Dsp.musicRatio(speech, rate) < 2.0)
    assert(Dsp.musicRatio(music, rate) > 2.0)
  }

  test("wav codec roundtrip PCM16 mono") {
    val s = sine(440, 200, 16000, 0.5)
    val bytes = WavCodec.encodeMono16(s, 16000)
    val dec = WavCodec.decode(bytes)
    assert(dec.channels == 1 && dec.sampleRate == 16000)
    assert(dec.samples.length == s.length)
    dec.samples.zip(s).foreach { case (a, b) => assert(math.abs(a - b) < 1.0 / 32000) }
  }

  test("wav codec rejects garbage and truncated input") {
    intercept[IllegalArgumentException](WavCodec.decode(Array.fill[Byte](10)(42)))
    intercept[IllegalArgumentException](
      WavCodec.decode(Array.tabulate[Byte](1024)(i => (i * 37 % 251).toByte)))
  }

  test("wav codec clamps out-of-range samples on encode") {
    val s = Array(1.5f, -1.5f, 0f)
    val dec = WavCodec.decode(WavCodec.encodeMono16(s, 16000))
    assert(math.abs(dec.samples(0) - 32767f / 32768f) < 1e-4)
    assert(math.abs(dec.samples(1) + 32767f / 32768f) < 1e-4)
  }
}
