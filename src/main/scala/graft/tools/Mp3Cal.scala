package graft.tools

import graft.io.Mp3Codec

/** Dev calibration for the MP3 filterbank: prints the DC cascade gain,
  * the raw analysis→synthesis delay and SNR, and the full-codec
  * round-trip stats used to bake `Mp3Codec.CodecDelay`. */
object Mp3Cal {
  def main(args: Array[String]): Unit = {
    // 1) DC settling (aliasing must cancel for this to be constant)
    println(s"CascadeGain = ${Mp3Codec.CascadeGain}")
    val an = new Mp3Codec.Analysis
    val syn = new Mp3Codec.Synthesis(Mp3Codec.CascadeGain)
    val dcOut = (0 until 60).flatMap { _ =>
      syn.step(an.step(Array.fill(32)(1.0))).toSeq
    }
    println(s"DC tail (want ~1.0 constant): ${dcOut.takeRight(8).map(v => f"$v%.6f").mkString(", ")}")
    val ripple = dcOut.drop(1400).map(v => math.abs(v - 1.0)).max
    println(f"DC ripple after settle: $ripple%.2e")

    // 2) impulse delay of the raw cascade
    val an2 = new Mp3Codec.Analysis
    val syn2 = new Mp3Codec.Synthesis(Mp3Codec.CascadeGain)
    val imp = new Array[Double](64 * 32)
    imp(0) = 1.0
    val out = imp.grouped(32).flatMap(s => syn2.step(an2.step(s.toArray)).toSeq).toArray
    val peak = out.indices.maxBy(i => math.abs(out(i)))
    println(s"filterbank impulse peak at $peak (value ${out(peak)})")

    // 3) sine through the raw cascade: SNR after delay compensation
    val rate = 32000.0
    for (freq <- Seq(100.0, 250.0, 440.0, 600.0, 750.0, 900.0, 1200.0, 1750.0, 3300.0, 5250.0, 15250.0, 15800.0)) {
      val n = 8192
      val in = Array.tabulate(n)(i => math.sin(2 * math.Pi * freq * i / rate))
      val an3 = new Mp3Codec.Analysis
      val syn3 = new Mp3Codec.Synthesis(Mp3Codec.CascadeGain)
      val got = in.grouped(32).flatMap(s => syn3.step(an3.step(s.toArray)).toSeq).toArray
      val d = peak
      var se = 0.0; var sp = 0.0
      var i = 2048
      while (i < n - d) {
        val e = got(i + d) - in(i)
        se += e * e; sp += in(i) * in(i)
        i += 1
      }
      println(f"cascade SNR @ $freq%.0f Hz: ${10 * math.log10(sp / se)}%.1f dB")
    }


    // 3b) spectral probe: where does the energy actually land?
    for (freq <- Seq(250.0, 750.0, 440.0)) {
      val n = 8192
      val in = Array.tabulate(n)(i => math.sin(2 * math.Pi * freq * i / rate))
      val an4 = new Mp3Codec.Analysis
      val syn4 = new Mp3Codec.Synthesis(Mp3Codec.CascadeGain)
      val got = in.grouped(32).flatMap(s => syn4.step(an4.step(s.toArray)).toSeq).toArray
      def mag(f: Double): Double = {
        var c = 0.0; var sn = 0.0; var i = 2048
        while (i < n) { val w = 2 * math.Pi * f * i / rate
          c += got(i) * math.cos(w); sn += got(i) * math.sin(w); i += 1 }
        2 * math.sqrt(c * c + sn * sn) / (n - 2048)
      }
      val band = (freq / 500.0).toInt
      val mirror = (2 * band + 1) * 500.0 - freq
      var rms = 0.0; var i = 2048
      while (i < n) { rms += got(i) * got(i); i += 1 }
      println(f"probe $freq%.0f Hz: mag(f)=${mag(freq)}%.4f mag(mirror=$mirror%.0f)=${mag(mirror)}%.4f rms=${math.sqrt(rms / (n - 2048))}%.4f")
    }
    // 4) full codec round trip
    for (freq <- Seq(440.0, 1700.0)) {
      val n = 9000
      val pcm = Array.tabulate(n)(i =>
        (0.5 * math.sin(2 * math.Pi * freq * i / rate)).toFloat)
      val mp3 = Mp3Codec.encode(pcm, 32000)
      val (info, got) = Mp3Codec.decode(mp3)
      println(s"codec @$freq: frames=${info.frames} br=${info.bitrateKbps} " +
        s"len=${got.length} (want $n)")
      // cross-correlate around 0 to check CodecDelay alignment
      val best = (-900 to 900).maxBy { lag =>
        var s = 0.0; var i = math.max(0, -lag)
        while (i < math.min(n, got.length) - math.abs(lag)) {
          s += got(math.min(got.length - 1, i + lag)) * pcm(i); i += 1
        }
        s
      }
      var dot = 0.0; var na = 0.0; var nb = 0.0; var maxErr = 0.0
      var i = 0
      while (i < math.min(n, got.length)) {
        dot += got(i) * pcm(i); na += pcm(i) * pcm(i); nb += got(i) * got(i)
        maxErr = math.max(maxErr, math.abs(got(i) - pcm(i)))
        i += 1
      }
      println(f"  bestLag=$best corr=${dot / math.sqrt(na * nb)}%.4f maxErr=$maxErr%.4f")
    }
  }
}
