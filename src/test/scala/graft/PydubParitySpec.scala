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

  /** exact int16 samples back out of the float decode (s/32768 is lossless) */
  private def int16Of(samples: Array[Float]): Array[Int] =
    samples.map(f => math.round(f * 32768.0f))

  private def md5Le(vals: Array[Int]): String = {
    val buf = java.nio.ByteBuffer.allocate(vals.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(v => buf.putShort(v.toShort))
    java.security.MessageDigest.getInstance("MD5").digest(buf.array())
      .map(b => f"$b%02x").mkString
  }

  test("resampleRatecv matches audioop.ratecv bit-exactly on every fixture (O5)") {
    golden.foreach { case (name, g) =>
      val dec = WavCodec.decode(java.nio.file.Files.readAllBytes(corpus.resolve(name)))
      val mono =
        if (dec.channels == 2) {
          // pydub order (pa.py:88-89): set_channels(1) precedes
          // set_frame_rate — and the int downmix must match audioop.tomono
          val m = Dsp.tomonoInt16(int16Of(dec.samples))
          assert(m.length == g.get("tomono_n").asInt(), s"$name tomono length")
          assert(md5Le(m) == g.get("tomono_md5").asText(), s"$name tomono md5")
          m
        } else int16Of(dec.samples)
      val cases = g.get("resample")
      (0 until cases.size()).foreach { i =>
        val c = cases.get(i)
        val to = c.get("to").asInt()
        val got = Dsp.resampleRatecv(mono, dec.sampleRate, to)
        assert(got.length == c.get("n").asInt(),
          s"$name->$to: length ${got.length} vs ${c.get("n").asInt()}")
        val head = c.get("head")
        (0 until head.size()).foreach { j =>
          assert(got(j) == head.get(j).asInt(), s"$name->$to: head sample $j")
        }
        assert(md5Le(got) == c.get("md5").asText(), s"$name->$to: md5 mismatch")
      }
    }
  }

  test("resampleLinear deviation vs ratecv is bounded: exact at 2:1, <=2 LSB otherwise") {
    golden.foreach { case (name, g) =>
      val dec = WavCodec.decode(java.nio.file.Files.readAllBytes(corpus.resolve(name)))
      if (dec.channels == 1) {
        val ints = int16Of(dec.samples)
        val cases = g.get("resample")
        (0 until cases.size()).foreach { i =>
          val c = cases.get(i)
          val to = c.get("to").asInt()
          val ratecv = Dsp.resampleRatecv(ints, dec.sampleRate, to)
          val lin = Dsp.resampleLinear(dec.samples, dec.sampleRate, to)
          assert(math.abs(lin.length - ratecv.length) <= 1,
            s"$name->$to: lengths ${lin.length} vs ${ratecv.length}")
          val n = math.min(lin.length, ratecv.length)
          var worst = 0.0
          var j = 0
          while (j < n) {
            val d = math.abs(lin(j) * 32768.0 - ratecv(j))
            if (d > worst) worst = d
            j += 1
          }
          // 16k->8k is sample-picking for both kernels: exact. Non-integer
          // ratios differ only in interpolation phase: the documented
          // <=2-LSB bound (Dsp.resampleLinear scaladoc)
          val bound = if (dec.sampleRate % to == 0) 0.5 else 2.0
          assert(worst <= bound, s"$name->$to: worst deviation $worst int16 LSB")
        }
      }
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
