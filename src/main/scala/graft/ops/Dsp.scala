package graft.ops

/** Pure-Scala DSP kernels used by the audio operators. No Spark dependency —
  * these run inside expressions/UDFs on executors and are unit-tested
  * directly.
  *
  * Semantics follow the reference pipeline (process_audio.py, abbreviated
  * pa.py) via pydub's documented algorithms; values are float PCM in [-1, 1],
  * mono. Citations are to pa.py lines.
  */
object Dsp {

  /** Peak normalization (pa.py:87, pydub.effects.normalize, 0.1 dB headroom):
    * scale so the peak sits at 10^(-0.1/20) of full scale. Silent input is
    * returned unchanged. */
  def peakNormalize(samples: Array[Float], headroomDb: Double = 0.1): Array[Float] = {
    var peak = 0f
    var i = 0
    while (i < samples.length) {
      val a = math.abs(samples(i)); if (a > peak) peak = a; i += 1
    }
    if (peak <= 0f) return samples
    val target = math.pow(10.0, -headroomDb / 20.0)
    val gain = (target / peak).toFloat
    val out = new Array[Float](samples.length)
    i = 0
    while (i < samples.length) { out(i) = samples(i) * gain; i += 1 }
    out
  }

  /** Downmix interleaved multi-channel PCM to mono by channel average
    * (pa.py:88, pydub set_channels(1)). */
  def downmixMono(interleaved: Array[Float], channels: Int): Array[Float] = {
    if (channels <= 1) return interleaved
    val n = interleaved.length / channels
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      var acc = 0f
      var c = 0
      while (c < channels) { acc += interleaved(i * channels + c); c += 1 }
      out(i) = acc / channels
      i += 1
    }
    out
  }

  /** Linear-interpolation resample (pa.py:89, set_frame_rate(16000)). Linear
    * is deterministic and dependency-free; the operator contract (mono PCM at
    * the target rate) is what downstream stages rely on. */
  def resampleLinear(samples: Array[Float], fromRate: Int, toRate: Int): Array[Float] = {
    if (fromRate == toRate || samples.isEmpty) return samples
    val outLen = math.max(1, (samples.length.toLong * toRate / fromRate).toInt)
    val out = new Array[Float](outLen)
    val step = fromRate.toDouble / toRate
    var i = 0
    while (i < outLen) {
      val pos = i * step
      val i0 = pos.toInt
      val i1 = math.min(i0 + 1, samples.length - 1)
      val frac = (pos - i0).toFloat
      out(i) = samples(i0) * (1 - frac) + samples(i1) * frac
      i += 1
    }
    out
  }

  /** RMS on the int16 scale (pa.py:182, pydub's `audio.rms` over int16
    * samples — MIN_RMS=250 is calibrated to that scale, SURVEY §2.4). */
  def rmsInt16(samples: Array[Float]): Double = {
    if (samples.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toDouble * 32767.0
      acc += v * v
      i += 1
    }
    math.sqrt(acc / samples.length)
  }

  /** Clipping percentage (pa.py:184-189): share of |sample| >= 0.98, in %. */
  def clippingPercent(samples: Array[Float]): Double = {
    if (samples.isEmpty) return 0.0
    var n = 0
    var i = 0
    while (i < samples.length) { if (math.abs(samples(i)) >= 0.98f) n += 1; i += 1 }
    n.toDouble / samples.length * 100.0
  }

  /** Single-pole RC low-pass filter (pydub low_pass_filter semantics). */
  def lowPass(samples: Array[Float], cutoffHz: Double, rate: Int): Array[Float] = {
    if (samples.isEmpty) return samples
    val rc = 1.0 / (2 * math.Pi * cutoffHz)
    val dt = 1.0 / rate
    val alpha = (dt / (rc + dt)).toFloat
    val out = new Array[Float](samples.length)
    out(0) = samples(0) // pydub seeds the recursion with the raw first sample
    var i = 1
    while (i < samples.length) {
      out(i) = out(i - 1) + alpha * (samples(i) - out(i - 1))
      i += 1
    }
    out
  }

  /** Single-pole RC high-pass filter (pydub high_pass_filter semantics). */
  def highPass(samples: Array[Float], cutoffHz: Double, rate: Int): Array[Float] = {
    if (samples.isEmpty) return samples
    val rc = 1.0 / (2 * math.Pi * cutoffHz)
    val dt = 1.0 / rate
    val alpha = (rc / (rc + dt)).toFloat
    val out = new Array[Float](samples.length)
    out(0) = samples(0)
    var i = 1
    while (i < samples.length) {
      out(i) = alpha * (out(i - 1) + samples(i) - samples(i - 1))
      i += 1
    }
    out
  }

  /** Music-ratio heuristic (O12, pa.py:191-210): band-limit to speech range
    * (HP 100 Hz → LP 7.5 kHz), then compare out-of-band (bass < 80 Hz +
    * treble > 8 kHz) energy against in-band energy, with the reference's
    * numeric-stability floors preserved verbatim (total_rms >= 1,
    * speech_energy >= 1 — int16 scale). Errors map to the -1.0 sentinel at
    * the caller. */
  def musicRatio(samples: Array[Float], rate: Int): Double = {
    val calc = lowPass(highPass(samples, 100.0, rate), 7500.0, rate)
    var totalRms = rmsInt16(calc)
    if (totalRms < 1) totalRms = 1
    val bassRms = rmsInt16(lowPass(calc, 80.0, rate))
    val trebleRms = rmsInt16(highPass(calc, 8000.0, rate))
    val nonSpeech = bassRms + trebleRms
    val speech = math.max(1.0, totalRms - nonSpeech)
    nonSpeech / speech
  }

  /** dBFS of a window, pydub-style: 20*log10(rms / fullScale); -inf for
    * silence. Operates on the int16 scale for parity with `rmsInt16`. */
  def dbfs(rms: Double): Double =
    if (rms <= 0) Double.NegativeInfinity else 20.0 * math.log10(rms / 32767.0)
}
