package graft.fixtures

import java.nio.file.{Files, Path, Paths}

import graft.io.WavCodec

/** Deterministic synthesized WAV corpus (FIXTURES.md §A.1): pure tones,
  * silence gaps, clipped squares, band-extreme "music", garbage bytes —
  * every branch of the audio pipeline has a fixture that exercises it.
  * Seedless: everything is a closed-form function of time, so the corpus is
  * bit-identical across runs and machines.
  */
object AudioSynth {

  val Rate = 16000

  private def sine(freqHz: Double, ms: Int, amp: Double = 0.5): Array[Float] = {
    val n = Rate * ms / 1000
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * freqHz * i / Rate)).toFloat)
  }

  private def silence(ms: Int): Array[Float] = new Array[Float](Rate * ms / 1000)

  private def square(freqHz: Double, ms: Int, amp: Double): Array[Float] = {
    val n = Rate * ms / 1000
    Array.tabulate(n) { i =>
      val phase = (freqHz * i / Rate) % 1.0
      (if (phase < 0.5) amp else -amp).toFloat
    }
  }

  private def concat(parts: Array[Float]*): Array[Float] = {
    val out = new Array[Float](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p => System.arraycopy(p, 0, out, off, p.length); off += p.length }
    out
  }

  /** Speech-like burst: 300 Hz + 1.2 kHz mix under a slow amplitude envelope.
    * The envelope keeps the crest factor high (few samples near the peak), so
    * peak normalization does NOT push >1% of samples above the 0.98 clipping
    * threshold — pure constant-amplitude tones would fail the clipping filter
    * after normalization (they spend >3% of samples near their peak). */
  private def speechBurst(ms: Int): Array[Float] = {
    val n = Rate * ms / 1000
    Array.tabulate(n) { i =>
      val t = i.toDouble / Rate
      val env = 0.2 + 0.8 * math.abs(math.sin(math.Pi * i.toDouble / n))
      (env * (0.55 * math.sin(2 * math.Pi * 300 * t) +
              0.3 * math.sin(2 * math.Pi * 1200 * t))).toFloat
    }
  }

  private def bursts(durationsMs: Seq[Int], gapMs: Int = 400): Array[Float] = {
    val parts = durationsMs.flatMap(d => Seq(speechBurst(d), silence(gapMs)))
    concat(parts: _*)
  }

  /** Bump whenever ANY fixture definition below changes: the reuse check is
    * keyed on this stamp, so a stale on-disk corpus from older code is
    * regenerated instead of silently reused (the amplitudes are knife-edge
    * tuned — serving old bytes under new goldens would corrupt q30/specs). */
  private val CorpusVersion = 2

  /** Write the full corpus into `dir`; returns the file list. Content is
    * deterministic, so a corpus already stamped with the current
    * CorpusVersion is returned as-is (repeated q30/bench/verify runs skip
    * re-synthesis); any other state — missing files, empty files, older or
    * absent stamp (e.g. a crashed half-written run) — regenerates. */
  def writeCorpus(dir: String): Seq[Path] = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val expected = Seq("tone_speechlike.wav", "long_utterance.wav",
      "short_utterances.wav", "whisper_quiet.wav", "clipped_square.wav",
      "bass_treble_music.wav", "silence_only.wav", "stereo_speech_441.wav",
      "not_a_wav.wav").map(d.resolve)
    val stamp = d.resolve(s".corpus_v$CorpusVersion")
    if (Files.exists(stamp) &&
        expected.forall(p => Files.exists(p) && Files.size(p) > 0))
      return expected
    Files.deleteIfExists(stamp) // invalidate while (re)writing
    def put(name: String, samples: Array[Float]): Path = {
      val p = d.resolve(name)
      Files.write(p, WavCodec.encodeMono16(samples, Rate))
      p
    }
    val files = Seq(
      // VAD pass-path: 4-8 s utterances, clean gaps
      put("tone_speechlike.wav", bursts(Seq(4000, 6000, 8000))),
      // pass-1 split: 40 s continuous utterance
      put("long_utterance.wav", concat(silence(500), speechBurst(40000), silence(500))),
      // pass-2 merge + <3 s drop: 1-2 s bursts
      put("short_utterances.wav", bursts(Seq(1000, 1500, 2000, 1200, 1800))),
      // RMS reject: two quiet 1 s bursts whose windows sit just above the
      // -35 dBFS VAD floor (-34.5 dB), diluted by the 11 s in-segment gap so
      // the merged segment's overall RMS lands near 242 < MIN_RMS 250. A
      // far-away full-scale spike pins the normalization gain at ~1 so the
      // bursts stay quiet after peak normalization; the spike itself is a
      // <3 s segment and is dropped by the merge.
      put("whisper_quiet.wav", {
        val burst = sine(500, 1000, 0.0265)
        concat(silence(1000), burst, silence(11000), burst,
               silence(15000), square(100, 100, 0.9886), silence(400))
      }),
      // clipping reject: full-scale square
      put("clipped_square.wav", concat(square(220, 5000, 1.0), silence(400))),
      // music reject: bass <80 Hz + treble >8 kHz dominated, enveloped so it
      // fails the MUSIC filter specifically rather than clipping
      put("bass_treble_music.wav", {
        val n = Rate * 6
        val m = Array.tabulate(n) { i =>
          val t = i.toDouble / Rate
          val env = 0.2 + 0.8 * math.abs(math.sin(math.Pi * i.toDouble / n))
          (env * (0.45 * math.sin(2 * math.Pi * 50 * t) +
                  0.45 * math.sin(2 * math.Pi * 7900 * t))).toFloat
        }
        concat(m, silence(400))
      }),
      // empty-VAD early return: silence only
      put("silence_only.wav", silence(10000)))
    // decode-path coverage: STEREO 44.1 kHz input exercises downmix (O4) and
    // resample (O5) through the real pipeline before segmentation
    val stereo441 = {
      val r = 44100
      val n = r * 5
      val burst = Array.tabulate(n) { i =>
        val t = i.toDouble / r
        val env = 0.2 + 0.8 * math.abs(math.sin(math.Pi * i.toDouble / n))
        (env * (0.55 * math.sin(2 * math.Pi * 300 * t) +
                0.3 * math.sin(2 * math.Pi * 1200 * t))).toFloat
      }
      val mono = burst ++ new Array[Float](r / 2)
      val inter = new Array[Float](mono.length * 2)
      var i = 0
      while (i < mono.length) {
        inter(2 * i) = mono(i)            // L
        inter(2 * i + 1) = mono(i) * 0.8f // R
        i += 1
      }
      val p = d.resolve("stereo_speech_441.wav")
      Files.write(p, WavCodec.encodePcm16(inter, 2, r))
      p
    }
    // per-file error-skip: garbage bytes
    val garbage = d.resolve("not_a_wav.wav")
    Files.write(garbage, Array.tabulate[Byte](1024)(i => (i * 37 % 251).toByte))
    // stamp LAST: only a fully-written corpus is ever reused
    Files.write(stamp, Array.emptyByteArray)
    files ++ Seq(stereo441, garbage)
  }

  private def toPcm16(samples: Array[Float]): Array[Short] =
    samples.map(f => math.max(-32768, math.min(32767, math.round(f * 32767f))).toShort)

  private val CompressedCorpusVersion = 1

  /** COMPRESSED fixture corpus (q259): the same deterministic speech-like
    * content as the PCM corpus, but landed as µ-law, A-law, and IMA-ADPCM
    * WAVs — what a call-center / telephony ingest actually delivers. The
    * codecs are lossy, but deterministic: encoder and decoder are pure
    * functions, so the pipeline's metadata over the round-tripped audio
    * freezes into a golden exactly like q30's. */
  def writeCompressedCorpus(dir: String): Seq[Path] = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val expected = Seq("mulaw_speech.wav", "alaw_speech.wav",
      "adpcm_speech.wav").map(d.resolve)
    val stamp = d.resolve(s".corpus_comp_v$CompressedCorpusVersion")
    if (Files.exists(stamp) &&
        expected.forall(p => Files.exists(p) && Files.size(p) > 0))
      return expected
    Files.deleteIfExists(stamp)
    Files.write(d.resolve("mulaw_speech.wav"),
      graft.io.G711Codec.encodeWav(toPcm16(bursts(Seq(4000, 6000))), Rate))
    Files.write(d.resolve("alaw_speech.wav"),
      graft.io.G711Codec.encodeWav(toPcm16(bursts(Seq(5000, 3500))), Rate, aLaw = true))
    Files.write(d.resolve("adpcm_speech.wav"),
      graft.io.AdpcmCodec.encodeWav(toPcm16(bursts(Seq(7000))), Rate))
    Files.write(stamp, Array.emptyByteArray)
    expected
  }

  private val VorbisCorpusVersion = 2

  /** LOSSY-format fixture corpus (q268): deterministic speech-like
    * content landed as Ogg Vorbis — the MP3/Vorbis-class ingest the
    * reference receives transparently through pydub/ffmpeg
    * (`README.md:3`). Same contract as the compressed corpus: the
    * encoder and decoder are pure functions, so pipeline metadata over
    * the round-tripped audio freezes into a golden. A CRC-corrupted
    * stream rides along to keep the per-file error-skip on trial
    * against a plausible (not garbage) broken file. */
  def writeVorbisCorpus(dir: String): Seq[Path] = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val expected = Seq("vorbis_speech_a.ogg", "vorbis_speech_b.ogg",
      "vorbis_speech_c.ogg", "vorbis_corrupt.ogg").map(d.resolve)
    val stamp = d.resolve(s".corpus_vorbis_v$VorbisCorpusVersion")
    if (Files.exists(stamp) &&
        expected.forall(p => Files.exists(p) && Files.size(p) > 0))
      return expected
    Files.deleteIfExists(stamp)
    Files.write(d.resolve("vorbis_speech_a.ogg"),
      graft.io.VorbisCodec.encode(bursts(Seq(4000, 6000)), Rate))
    Files.write(d.resolve("vorbis_speech_b.ogg"),
      graft.io.VorbisCodec.encode(bursts(Seq(5500)), Rate))
    Files.write(d.resolve("vorbis_speech_c.ogg"),
      graft.io.VorbisCodec.encode(bursts(Seq(3200, 4100)), Rate))
    val corrupt = graft.io.VorbisCodec.encode(bursts(Seq(1500)), Rate)
    corrupt(200) = (corrupt(200) ^ 0x55).toByte // breaks a page CRC
    Files.write(d.resolve("vorbis_corrupt.ogg"), corrupt)
    Files.write(stamp, Array.emptyByteArray)
    expected
  }

  private val Mp3CorpusVersion = 1

  /** MP3 fixtures (round 13): speech-burst content upsampled to 32 kHz
    * (MPEG-1's lowest rate) and encoded through [[graft.io.Mp3Codec]] —
    * one plain stream, one ID3v2-TAGGED stream (the form scraped
    * podcasts actually arrive in; the dispatch must skip the tag), and
    * one truncated mid-frame (the per-file error-skip trial, the q259
    * garbage-wav / q268 corrupt-ogg convention). */
  def writeMp3Corpus(dir: String): Seq[Path] = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val expected = Seq("mp3_speech_a.mp3", "mp3_speech_b.mp3",
      "mp3_tagged.mp3", "mp3_truncated.mp3").map(d.resolve)
    val stamp = d.resolve(s".corpus_mp3_v$Mp3CorpusVersion")
    if (Files.exists(stamp) &&
        expected.forall(p => Files.exists(p) && Files.size(p) > 0))
      return expected
    Files.deleteIfExists(stamp)
    def mp3Of(durationsMs: Seq[Int]): Array[Byte] = {
      val up = graft.ops.Dsp.resampleLinear(bursts(durationsMs), Rate, 32000)
      graft.io.Mp3Codec.encode(up, 32000)
    }
    Files.write(d.resolve("mp3_speech_a.mp3"), mp3Of(Seq(4200, 5800)))
    Files.write(d.resolve("mp3_speech_b.mp3"), mp3Of(Seq(5100)))
    val tagged = mp3Of(Seq(3400, 4600))
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 64) ++
      new Array[Byte](64)
    Files.write(d.resolve("mp3_tagged.mp3"), id3 ++ tagged)
    val whole = mp3Of(Seq(2600))
    Files.write(d.resolve("mp3_truncated.mp3"),
      whole.take(whole.length / 2 + 7)) // mid-frame cut → decode refuses
    Files.write(stamp, Array.emptyByteArray)
    expected
  }

  private val Mp3GeneralCorpusVersion = 2 // v2: + LSF 16 kHz

  /** MP3 GENERAL-PROFILE fixtures (round 14): the decoder surfaces real
    * found-data streams use beyond the original mono long-block profile
    * — M/S joint stereo, L/R stereo with 2-bit magnitudes through
    * big-values Huffman tables 2/3, the window-switching sequence
    * (long→start→short→stop), count1 table A, and the coarse
    * `scalefac_scale` ladder — each through [[graft.io.Mp3Codec.encodeEx]]
    * and back through the same magic dispatch + downmix chain. */
  def writeMp3GeneralCorpus(dir: String): Seq[Path] = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val expected = Seq("mp3g_ms.mp3", "mp3g_lr_mag2.mp3", "mp3g_short.mp3",
      "mp3g_count1a.mp3", "mp3g_sfs1.mp3", "mp3g_lsf16k.mp3").map(d.resolve)
    val stamp = d.resolve(s".corpus_mp3g_v$Mp3GeneralCorpusVersion")
    if (Files.exists(stamp) &&
        expected.forall(p => Files.exists(p) && Files.size(p) > 0))
      return expected
    Files.deleteIfExists(stamp)
    import graft.io.Mp3Codec
    import graft.io.Mp3Codec.EncOpts
    def up(x: Array[Float]): Array[Float] =
      graft.ops.Dsp.resampleLinear(x, Rate, 32000)
    // stereo pairs: correlated but unequal channels, so both the mid
    // AND side (or both L and R) carry real content
    val a = up(bursts(Seq(4600, 3800)))
    Files.write(d.resolve("mp3g_ms.mp3"),
      Mp3Codec.encodeEx(Seq(a, a.map(v => 0.6f * v)), 32000,
        EncOpts(stereoMode = 1)))
    val b = up(bursts(Seq(5200)))
    Files.write(d.resolve("mp3g_lr_mag2.mp3"),
      Mp3Codec.encodeEx(Seq(b, b.map(v => 0.7f * v)), 32000,
        EncOpts(stereoMode = 0, maxMag = 2)))
    Files.write(d.resolve("mp3g_short.mp3"),
      Mp3Codec.encodeEx(Seq(up(bursts(Seq(3600, 2900)))), 32000,
        EncOpts(shortBlocks = true)))
    Files.write(d.resolve("mp3g_count1a.mp3"),
      Mp3Codec.encodeEx(Seq(up(bursts(Seq(4100)))), 32000,
        EncOpts(count1TableA = true)))
    Files.write(d.resolve("mp3g_sfs1.mp3"),
      Mp3Codec.encodeEx(Seq(up(bursts(Seq(3300, 4400)))), 32000,
        EncOpts(scalefacScale = 1)))
    // MPEG-2 LSF at 16 kHz — the speech-archive rate (one granule per
    // frame, 9-byte side info, lsfSlens scalefactor layout); the
    // pipeline's resampler sees a native-16k stream for once
    Files.write(d.resolve("mp3g_lsf16k.mp3"),
      Mp3Codec.encodeEx(Seq(bursts(Seq(4900, 3100))), 16000, EncOpts()))
    Files.write(stamp, Array.emptyByteArray)
    expected
  }

  private val MixedCorpusVersion = 2 // v2: + AIFF / AU / SPHERE legacy containers

  /** MIXED-FORMAT corpus (round 13, q326 — the audio sibling of the
    * image front door q320): ONE directory carrying every format class
    * the engine owns — plain PCM WAV, µ-law WAV (telephony), IMA-ADPCM
    * WAV, native FLAC (lossless), Ogg Vorbis and MP3 (lossy) — plus a
    * mislabeled garbage file. Real scraped corpora arrive exactly like
    * this, with unreliable extensions; the `WavCodec.decode` magic
    * dispatch must route every file by CONTENT. */
  def writeMixedCorpus(dir: String): Seq[Path] = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val expected = Seq("mix_pcm.wav", "mix_mulaw.wav", "mix_adpcm.wav",
      "mix_lossless.flac", "mix_vorbis.ogg", "mix_speech.mp3",
      "mix_studio.aiff", "mix_next.au", "mix_corpus.sph",
      "mix_garbage.wav").map(d.resolve)
    val stamp = d.resolve(s".corpus_mixed_v$MixedCorpusVersion")
    if (Files.exists(stamp) &&
        expected.forall(p => Files.exists(p) && Files.size(p) > 0))
      return expected
    Files.deleteIfExists(stamp)
    Files.write(d.resolve("mix_pcm.wav"),
      graft.io.WavCodec.encodeMono16(bursts(Seq(4800)), Rate))
    Files.write(d.resolve("mix_mulaw.wav"),
      graft.io.G711Codec.encodeWav(toPcm16(bursts(Seq(3900, 2700))), Rate))
    Files.write(d.resolve("mix_adpcm.wav"),
      graft.io.AdpcmCodec.encodeWav(toPcm16(bursts(Seq(5600))), Rate))
    Files.write(d.resolve("mix_lossless.flac"),
      graft.io.FlacCodec.encode(toPcm16(bursts(Seq(4400))), Rate))
    Files.write(d.resolve("mix_vorbis.ogg"),
      graft.io.VorbisCodec.encode(bursts(Seq(3000, 3300)), Rate))
    Files.write(d.resolve("mix_speech.mp3"), graft.io.Mp3Codec.encode(
      graft.ops.Dsp.resampleLinear(bursts(Seq(4700)), Rate, 32000), 32000))
    // the legacy speech-corpus containers (AIFF studio capture, Sun/NeXT
    // AU, NIST SPHERE — the TIMIT-class distribution format)
    Files.write(d.resolve("mix_studio.aiff"),
      graft.io.LegacyAudio.Aiff.encodePcm16(toPcm16(bursts(Seq(4100))), 1, Rate))
    Files.write(d.resolve("mix_next.au"),
      graft.io.LegacyAudio.Au.encode(toPcm16(bursts(Seq(3500, 2200))), 1, Rate))
    Files.write(d.resolve("mix_corpus.sph"),
      graft.io.LegacyAudio.Sphere.encodePcm16(
        toPcm16(bursts(Seq(5100))), 1, Rate, bigEndian = true))
    Files.write(d.resolve("mix_garbage.wav"),
      "definitely not audio at all, wrong extension too".getBytes("UTF-8"))
    Files.write(stamp, Array.emptyByteArray)
    expected
  }
}
