package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.WavCodec
import graft.ops.{Dsp, Segmentation}

/** Pydub-parity goldens (round-5 verdict item 4; pa.py:87-89, 104-109).
  *
  * `scripts/pydub_mirror.py` re-implements pydub's published
  * detect_nonsilent / normalize algorithms — audioop integer RMS,
  * max_possible_amplitude = 32768, `<=` threshold, ms slicing — and freezes
  * their outputs over the deterministic AudioSynth corpus into
  * src/test/resources/pydub_golden.json. These tests assert the Scala
  * kernels' float-PCM formulations land on EXACTLY the same intervals and
  * gains, pinning the boundary behavior a user porting a real pydub corpus
  * would hit. (The analytic bridge: WavCodec decodes s/32768, msEnergies
  * scales by 32767, and dbfs divides by 32767 — the scales cancel to
  * pydub's rms/32768 dBFS definition.)
  */
class PydubParitySpec extends AnyFunSuite {

  private lazy val corpus: java.nio.file.Path = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_audio_fixture", "wavs")
    graft.fixtures.AudioSynth.writeCorpus(base.toString)
    base
  }

  private lazy val golden: Map[String, com.fasterxml.jackson.databind.JsonNode] = {
    val in = getClass.getResourceAsStream("/pydub_golden.json")
    require(in != null, "pydub_golden.json missing from test resources")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    val it = root.fields()
    val b = Map.newBuilder[String, com.fasterxml.jackson.databind.JsonNode]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  test("golden corpus covers the expected fixtures") {
    assert(golden.keySet == Set(
      "bass_treble_music.wav", "clipped_square.wav", "long_utterance.wav",
      "short_utterances.wav", "silence_only.wav", "stereo_speech_441.wav",
      "tone_speechlike.wav", "whisper_quiet.wav"))
  }

  test("peakNormalize gain matches pydub.effects.normalize on every fixture") {
    golden.foreach { case (name, g) =>
      val dec = WavCodec.decode(java.nio.file.Files.readAllBytes(corpus.resolve(name)))
      val pyGain = g.get("gain").asDouble()
      val norm = Dsp.peakNormalize(dec.samples)
      if (pyGain == 0.0) {
        // pydub returns silent input unchanged; so do we
        assert(norm.toSeq == dec.samples.toSeq, s"$name: silent input mutated")
      } else {
        // recover the applied linear gain from a nonzero sample
        val i = dec.samples.indexWhere(math.abs(_) > 1e-6f)
        assert(i >= 0, s"$name: no nonzero sample")
        val scalaGain = norm(i).toDouble / dec.samples(i).toDouble
        assert(math.abs(scalaGain - pyGain) / pyGain < 1e-6,
          s"$name: gain $scalaGain vs pydub $pyGain")
      }
    }
  }

  test("peak sample value matches pydub's integer peak on every fixture") {
    golden.foreach { case (name, g) =>
      val dec = WavCodec.decode(java.nio.file.Files.readAllBytes(corpus.resolve(name)))
      val pyPeak = g.get("peak").asLong()
      // decode is s/32768, exactly invertible
      val peak = dec.samples.map(f => math.abs(math.round(f * 32768.0f))).max
      assert(peak.toLong == pyPeak, s"$name: peak $peak vs pydub $pyPeak")
    }
  }

  test("detectNonSilent matches pydub.silence.detect_nonsilent on every mono fixture") {
    golden.filter(_._2.has("nonsilent")).foreach { case (name, g) =>
      val dec = WavCodec.decode(java.nio.file.Files.readAllBytes(corpus.resolve(name)))
      assert(dec.channels == 1 && dec.sampleRate % 1000 == 0, s"$name unexpected format")
      val got = Segmentation.detectNonSilent(dec.samples, dec.sampleRate)
        .map(iv => (iv.startMs, iv.endMs))
      val want = {
        val arr = g.get("nonsilent")
        (0 until arr.size()).map { i =>
          (arr.get(i).get(0).asLong(), arr.get(i).get(1).asLong())
        }
      }
      assert(got == want, s"$name: $got vs pydub $want")
    }
  }
}
