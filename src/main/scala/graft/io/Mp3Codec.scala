package graft.io

/** MPEG-1 Audio Layer III (MP3) codec — pure JVM, deterministic, the
  * compressed-audio class real voice corpora (podcasts, audiobooks,
  * scraped speech) overwhelmingly arrive in. The reference's pydub/
  * ffmpeg front end ingests MP3 with a config change
  * (`/root/reference/README.md:3,5`); this engine decodes it natively,
  * through the same `WavCodec.decode` magic dispatch the Vorbis/FLAC/
  * G.711/ADPCM classes ride. Everything derives from the PUBLISHED
  * ISO/IEC 11172-3 structure — no memorized binary tables beyond the
  * small spec constants stated below.
  *
  * == Scope (documented like the other codecs) ==
  *
  * DECODER: MPEG-1 (version bits 11), Layer III, MONO, 32/44.1/48 kHz,
  * CBR or VBR frame sequences, optional CRC-16 frames (the 2 CRC bytes
  * are skipped, not verified), ID3v2 prefix skipped via its syncsafe
  * length. LONG BLOCKS only (`window_switching_flag` = 1 refuses by
  * name — short-block/mixed windows are the attack-transient layout,
  * off-scope this round). Big-values Huffman tables 0 and 1 plus the
  * count1 table B are implemented (table 1 and table B are the two
  * whose code assignments the spec states simply enough to restate:
  * table 1 = {1, 001, 01, 000} for (x,y) in row-major order; table B =
  * fixed 4-bit codes, the one's complement of the vwxy quadruple);
  * any other `table_select` / count1 table A refuses loudly by table
  * number, never mis-decodes. Layer I/II, MPEG-2/2.5 LSF, free-format
  * bitrate, and stereo modes refuse by name.
  *
  * ENCODER (fixture writer, the [[VorbisCodec]] pattern): emits exactly
  * the decoder's profile — mono CBR long blocks, `big_values` = 0 with
  * the whole spectrum in the count1 region (quadruples of {-1, 0, +1}),
  * per-band amplitude carried by SCALEFACTORS (`scalefac_compress` = 15
  * → slen 4/3, `scalefac_scale` = 0 → 2^(sf/2) ≈ 1.5 dB steps) under a
  * per-granule `global_gain`, no bit reservoir (`main_data_begin` = 0).
  * This is a real, conformant bitstream layout — a 1-bit-magnitude
  * quantizer with per-band gains, the same shape real encoders use with
  * more magnitude levels.
  *
  * == Filterbank note (the one documented divergence) ==
  *
  * The 512-tap polyphase window (ISO Table B.3) is TABULATED in the
  * spec, not formula-defined. This engine derives its own near-perfect-
  * reconstruction prototype from the published pseudo-QMF construction
  * (Kaiser-windowed sinc at cutoff π/64, the textbook design the ISO
  * window approximates) and uses it on BOTH sides, so encode→decode
  * round trips are clean; a third-party decoder reading our streams
  * (or our decoder reading a foreign stream, had the Huffman scope
  * allowed one) would see a small spectral tilt from the window
  * mismatch — stated here rather than hidden. Every other stage
  * (header/side-info layout, scalefactor bit packing, Huffman coding,
  * requantization power law, alias reduction, IMDCT + sine window +
  * overlap-add, frequency inversion) follows the spec exactly.
  *
  * Gapless length: MP3 frames carry no sample count, so the encoder
  * writes a 6-byte `GL` + u32 original-length tag as the FIRST frame's
  * leading ancillary bytes (the LAME/Xing gapless-info convention, in
  * this codec's terms) and the decoder trims the filterbank delay and
  * tail padding from it; streams without the tag decode in full. */
object Mp3Codec {

  final case class Info(sampleRate: Int, frames: Int, bitrateKbps: Int)

  // ------------------------------------------------------------------
  // spec constants (ISO/IEC 11172-3)
  // ------------------------------------------------------------------

  /** Layer III bitrates, kbit/s, index 1..14 (0 = free format, refused). */
  private[graft] val Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** sampling_frequency field values 0..2. */
  private[graft] val SampleRates = Array(44100, 48000, 32000)

  /** Long-block scalefactor band boundaries (23 edges → 22 bands; bands
    * 0..20 carry scalefactors, band 21 rides global_gain alone) —
    * Table B.8. */
  private[graft] val SfbLong: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90,
      110, 134, 162, 196, 238, 288, 342, 418, 576),
    48000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88,
      106, 128, 156, 190, 230, 276, 330, 384, 576),
    32000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102,
      126, 156, 194, 240, 296, 364, 448, 550, 576))

  /** scalefac_compress → (slen1 for bands 0-10, slen2 for bands 11-20). */
  private[graft] val Slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private[graft] val Slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  /** Alias-reduction butterfly coefficients (Table B.9). */
  private[graft] val Ci =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  private[graft] val Cs = Ci.map(c => 1.0 / math.sqrt(1.0 + c * c))
  private[graft] val Ca = Ci.map(c => c / math.sqrt(1.0 + c * c))

  /** Big-values Huffman table 1 (Table B.7): (x, y) → (hlen, hcod) for
    * x, y ∈ {0, 1}: (0,0)="1", (0,1)="001", (1,0)="01", (1,1)="000". */
  private[graft] val Tab1: Array[Array[(Int, Int)]] =
    Array(Array((1, 1), (3, 1)), Array((2, 1), (3, 0)))

  /** count1 table B: every quadruple codes in exactly 4 bits, the one's
    * complement of (v<<3 | w<<2 | x<<1 | y). */
  private[graft] def count1BCode(q: Int): Int = (~q) & 0xF

  private val GranuleSamples = 576
  private val FrameSamples = 1152

  // ------------------------------------------------------------------
  // MSB-first bit I/O (MP3 packs big-endian, unlike Ogg)
  // ------------------------------------------------------------------

  private[graft] final class MsbWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L; private var n = 0
    def write(v: Int, bits: Int): Unit = {
      require(bits >= 0 && bits <= 24, s"bad width $bits")
      acc = (acc << bits) | (v & ((1L << bits) - 1)); n += bits
      while (n >= 8) { out.write(((acc >>> (n - 8)) & 0xff).toInt); n -= 8 }
    }
    def bitsWritten: Long = out.size().toLong * 8 + n
    def padToByte(): Unit = if (n > 0) write(0, 8 - n)
    def toBytes: Array[Byte] = { padToByte(); out.toByteArray }
  }

  /** Absolute-position reader: `seek` exists because Layer III main data
    * is BIT-addressed by part2_3_length — a count1 quadruple that
    * straddles the boundary is discarded and the next granule starts at
    * EXACTLY start + part2_3_length, whatever the overhang read. */
  private[graft] final class MsbReader(bytes: Array[Byte], startByte: Int,
                                       endByte: Int) {
    private var bitPos = 0L // bits past startByte*8
    def consumed: Long = bitPos
    def seek(absBits: Long): Unit = { bitPos = absBits }
    def read(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) {
        val p = startByte + (bitPos >> 3).toInt
        require(p < endByte, "truncated MP3 main data")
        v = (v << 1) | ((bytes(p) >> (7 - (bitPos & 7L).toInt)) & 1)
        bitPos += 1; i += 1
      }
      v
    }
    def read1(): Int = read(1)
  }

  // ------------------------------------------------------------------
  // Polyphase filterbank — 32 bands, 512-tap prototype (see scope note)
  // ------------------------------------------------------------------

  /** Root-raised-cosine prototype at the −3 dB point π/64, 512 taps —
    * the published pseudo-QMF construction ISO Table B.3 approximates.
    * The analysis·synthesis cascade gain is Σ_k |P(ω − kπ/32)|², so the
    * prototype must be POWER-complementary across band edges: the RRC's
    * cos(π/2·t) amplitude transition gives cos² + sin² = 1 exactly
    * (a plain windowed sinc crosses at −6 dB and doubles the gain at
    * band centers — measured before this design replaced it). Taps come
    * from the closed-form inverse transform of the piecewise response
    * (flat to a = π/64 − Δ, cosine transition to b = π/64 + Δ), so
    * class-init is O(N), no numeric integration. Near-PR: residual
    * ~−90 dB mid-band (pinned in spec). */
  private[graft] val Proto: Array[Double] = {
    val N = 512
    val delta = 0.9 * math.Pi / 64.0
    val a = math.Pi / 64.0 - delta
    val b = math.Pi / 64.0 + delta
    val c = math.Pi / (2.0 * (b - a))
    Array.tabulate(N) { nn =>
      val m = nn - (N - 1) / 2.0
      def seg(k: Double, phi: Double): Double = // ∫_a^b cos(ωk + φ) dω
        if (math.abs(k) < 1e-9) math.cos(phi) * (b - a)
        else (math.sin(b * k + phi) - math.sin(a * k + phi)) / k
      val i1 = if (math.abs(m) < 1e-9) a else math.sin(a * m) / m
      val i2 = 0.5 * (seg(m + c, -c * a) + seg(m - c, c * a))
      (i1 + i2) / math.Pi
    }
  }

  /** The ISO windows C/D fold the modulation's 64-sample period into the
    * stored table: cos((2sb+1)(n−16)π/64) over n = m + 64j equals
    * (−1)^j · cos((2sb+1)(m−16)π/64), so the window applied inside the
    * mod-64 fold must carry the (−1)^⌊n/64⌋ factor the flattened filter
    * p(n)·cos(...) demands. ONE folded table serves both sides: the real
    * ISO C and D differ only by a ×32 scale, which this design folds
    * into the init-time gain calibration instead. */
  private[graft] val WinC: Array[Double] =
    Array.tabulate(512)(n => Proto(n) * (if ((n / 64) % 2 == 0) 1.0 else -1.0))
  private[graft] val WinD: Array[Double] = WinC

  /** Analysis: shift 32 samples into a 512 fifo (newest first, the
    * spec's Figure C.4 order), window, fold mod 64, modulate by
    * cos((2sb+1)(k−16)π/64). */
  private[graft] final class Analysis {
    private val x = new Array[Double](512)
    private val M = Array.tabulate(32, 64)((sb, k) =>
      math.cos((2 * sb + 1) * (k - 16) * math.Pi / 64.0))
    def step(in32: Array[Double]): Array[Double] = {
      System.arraycopy(x, 0, x, 32, 480)
      var i = 0
      while (i < 32) { x(31 - i) = in32(i); i += 1 }
      val y = new Array[Double](64)
      var k = 0
      while (k < 64) {
        var j = 0; var acc = 0.0
        while (j < 8) { acc += x(k + 64 * j) * WinC(k + 64 * j); j += 1 }
        y(k) = acc; k += 1
      }
      val s = new Array[Double](32)
      var sb = 0
      while (sb < 32) {
        var acc = 0.0; var kk = 0
        while (kk < 64) { acc += M(sb)(kk) * y(kk); kk += 1 }
        s(sb) = acc; sb += 1
      }
      s
    }
  }

  /** Synthesis: matrix by cos((16+i)(2k+1)π/64) into a 1024 fifo, pick
    * the U vector with the spec's V-index pattern, window by D, sum the
    * 16 taps (the spec's Figure 3-A.2 flow):
    *   out(i) = Σ_{j=0}^{7} V(128j+i)·D(64j+i) + V(128j+96+i)·D(64j+32+i)
    */
  private[graft] final class Synthesis(gain: Double) {
    private val v = new Array[Double](1024)
    private val N = Array.tabulate(64, 32)((i, k) =>
      math.cos((16 + i) * (2 * k + 1) * math.Pi / 64.0))
    def step(s32: Array[Double]): Array[Double] = {
      System.arraycopy(v, 0, v, 64, 960)
      var i = 0
      while (i < 64) {
        var acc = 0.0; var k = 0
        while (k < 32) { acc += N(i)(k) * s32(k); k += 1 }
        v(i) = acc; i += 1
      }
      val out = new Array[Double](32)
      var i2 = 0
      while (i2 < 32) {
        var acc = 0.0
        var j = 0
        while (j < 8) {
          acc += v(128 * j + i2) * WinD(64 * j + i2) +
            v(128 * j + 96 + i2) * WinD(64 * j + 32 + i2)
          j += 1
        }
        out(i2) = acc / gain
        i2 += 1
      }
      out
    }
  }

  /** Deterministic unit-gain calibration: a DC input through
    * analysis → synthesis settles to a constant; dividing by it makes
    * the cascade gain exactly 1 at DC (and ~1 across the band — the
    * pseudo-QMF flatness the round-trip spec pins). */
  private[graft] val CascadeGain: Double = {
    val an = new Analysis
    val syn = new Synthesis(1.0)
    var last = 0.0
    val in = Array.fill(32)(1.0)
    var t = 0
    while (t < 80) { // 80 slices ≫ the 2×512-tap transient
      val s = an.step(in)
      val out = syn.step(s)
      last = out(16)
      t += 1
    }
    last
  }

  // ------------------------------------------------------------------
  // MDCT stage — 36-point, sine window, 50% overlap (long blocks)
  // ------------------------------------------------------------------

  private[graft] val MdctWin: Array[Double] =
    Array.tabulate(36)(i => math.sin(math.Pi / 36.0 * (i + 0.5)))

  private val MdctCos = Array.tabulate(18, 36)((k, i) =>
    math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1)))

  /** 36 windowed time samples → 18 lines (scaled so IMDCT+OLA is PR). */
  private[graft] def mdct(z: Array[Double]): Array[Double] = {
    val out = new Array[Double](18)
    var k = 0
    while (k < 18) {
      var acc = 0.0; var i = 0
      while (i < 36) { acc += z(i) * MdctWin(i) * MdctCos(k)(i); i += 1 }
      out(k) = acc * (2.0 / 36.0) // 4/N split evenly across the pair
      k += 1
    }
    out
  }

  /** 18 lines → 36 windowed time samples (caller overlap-adds halves). */
  private[graft] def imdct(xk: Array[Double]): Array[Double] = {
    val out = new Array[Double](36)
    var i = 0
    while (i < 36) {
      var acc = 0.0; var k = 0
      while (k < 18) { acc += xk(k) * MdctCos(k)(i); k += 1 }
      out(i) = acc * 2.0 * MdctWin(i) // ×2: the other half of 4/N
      i += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  /** Measured analysis→synthesis cascade delay in samples (filterbank
    * transient 481 + one MDCT granule 576): the decoder drops this many
    * leading samples. Pinned by the round-trip alignment spec. */
  private[graft] val CodecDelay = 1057

  def encode(pcm: Array[Float], sampleRate: Int): Array[Byte] = {
    require(SampleRates.contains(sampleRate),
      s"MPEG-1 Layer III carries 32000/44100/48000 Hz, got $sampleRate")
    val sfb = SfbLong(sampleRate)
    // frames: content + enough flush to push the tail past the delay
    val nFrames = math.max(1, (pcm.length + FrameSamples - 1) / FrameSamples) +
      (CodecDelay + FrameSamples - 1) / FrameSamples
    val an = new Analysis
    // previous granule's subband samples per band (MDCT 50% overlap)
    val prev = Array.ofDim[Double](32, 18)
    // each granule payload: (globalGain, scalefacs(21), lines(576 of -1/0/1))
    final case class G(gg: Int, sf: Array[Int], ix: Array[Int])
    val granules = Vector.newBuilder[G]
    var g = 0
    val totalGranules = nFrames * 2
    while (g < totalGranules) {
      // 18 slices of 32 input samples
      val s = Array.ofDim[Double](32, 18)
      var t = 0
      while (t < 18) {
        val in = new Array[Double](32)
        var i = 0
        while (i < 32) {
          val idx = g * GranuleSamples + t * 32 + i
          in(i) = if (idx < pcm.length) pcm(idx).toDouble else 0.0
          i += 1
        }
        val bands = an.step(in)
        var sb = 0
        while (sb < 32) { s(sb)(t) = bands(sb); sb += 1 }
        t += 1
      }
      // frequency inversion (odd bands, odd samples) then MDCT per band
      val lines = new Array[Double](576)
      var sb = 0
      while (sb < 32) {
        val z = new Array[Double](36)
        var i = 0
        while (i < 18) { z(i) = prev(sb)(i); z(18 + i) = s(sb)(i); i += 1 }
        if (sb % 2 == 1) {
          var ii = 1
          while (ii < 36) { z(ii) = -z(ii); ii += 2 }
        }
        val xk = mdct(z)
        System.arraycopy(xk, 0, lines, sb * 18, 18)
        System.arraycopy(s(sb), 0, prev(sb), 0, 18)
        sb += 1
      }
      // quantize: per-band scalefactors under one global gain, ix ∈ {±1,0}
      var gmax = 1e-12
      var li = 0
      while (li < 576) { gmax = math.max(gmax, math.abs(lines(li))); li += 1 }
      val a = math.ceil(math.log(gmax) / math.log(2.0) * 4.0) / 4.0
      val gg = math.max(0, math.min(255, 210 + math.round(4.0 * a).toInt))
      val aQ = (gg - 210) / 4.0 // the A the decoder will use
      val sf = new Array[Int](21)
      val ix = new Array[Int](576)
      var b = 0
      while (b < 22) {
        val lo = sfb(b); val hi = sfb(b + 1)
        var bmax = 0.0
        var i = lo
        while (i < hi) { bmax = math.max(bmax, math.abs(lines(i))); i += 1 }
        val sfMax = if (b < 11) 15 else if (b < 21) 7 else 0
        if (bmax > 1e-9) {
          // per-band Lloyd fit for the {0, ±A} alphabet: the optimal A
          // is the mean |x| of the kept lines and the optimal keep
          // boundary is A/2 — two rounds converge on band-sized sets
          var amp = bmax
          var it = 0
          while (it < 3) {
            var s = 0.0; var n = 0
            i = lo
            while (i < hi) {
              if (math.abs(lines(i)) >= amp / 2) { s += math.abs(lines(i)); n += 1 }
              i += 1
            }
            if (n > 0) amp = s / n
            it += 1
          }
          // snap A to the scalefactor ladder 2^(aQ − sf/2)
          val want = 2.0 * (aQ - math.log(amp) / math.log(2.0))
          val sfv = math.max(0, math.min(sfMax, math.round(want).toInt))
          if (b < 21) sf(b) = sfv
          val ampQ = math.pow(2.0, aQ - (if (b < 21) sfv else 0) / 2.0)
          i = lo
          while (i < hi) {
            if (math.abs(lines(i)) >= ampQ / 2)
              ix(i) = if (lines(i) < 0) -1 else 1
            i += 1
          }
        }
        b += 1
      }
      granules += G(gg, sf, ix)
      g += 1
    }
    val gs = granules.result()

    // pack each granule's main data bits (scalefactors + count1 codes)
    def granuleBits(gr: G): (Array[Byte], Int, Int) = {
      val w = new MsbWriter
      var b = 0
      while (b < 21) { w.write(gr.sf(b), if (b < 11) 4 else 3); b += 1 }
      var last = 575
      while (last >= 0 && gr.ix(last) == 0) last -= 1
      val quads = (last + 2 + 3) / 4 // ceil((last+1)/4), 0 if empty
      var q = 0
      while (q < quads) {
        var mags = 0
        var j = 0
        while (j < 4) {
          val v = math.abs(gr.ix(q * 4 + j))
          mags = (mags << 1) | v
          j += 1
        }
        w.write(count1BCode(mags), 4)
        j = 0
        while (j < 4) { // sign bit per nonzero: 1 = negative
          val v = gr.ix(q * 4 + j)
          if (v != 0) w.write(if (v < 0) 1 else 0, 1)
          j += 1
        }
        q += 1
      }
      val bits = w.bitsWritten.toInt
      (w.toBytes, bits, quads)
    }
    val packed = gs.map(granuleBits)

    // CBR frame size: smallest standard bitrate that fits EVERY frame
    // (granules pack CONTIGUOUSLY at the bit level — granule 1 starts
    // mid-byte when part2_3_length isn't byte-aligned, as in any real
    // stream — so the byte need is the bit sum rounded up once)
    val srIdx = SampleRates.indexOf(sampleRate)
    val maxMain = (0 until nFrames).map { f =>
      (packed(2 * f)._2 + packed(2 * f + 1)._2 + 7) / 8
    }.max
    val need = 4 + 17 + maxMain + 6 // header + side info + gapless tag
    val brIdx = (1 to 14).find(i =>
      144 * Bitrates(i) * 1000 / sampleRate >= need).getOrElse(
      throw new IllegalStateException(s"frame payload $need exceeds 320 kbps"))
    val frameBytes = 144 * Bitrates(brIdx) * 1000 / sampleRate

    val out = new java.io.ByteArrayOutputStream(nFrames * frameBytes)
    var f = 0
    while (f < nFrames) {
      val h = new MsbWriter
      h.write(0x7FF, 11) // sync
      h.write(3, 2)      // version: MPEG-1
      h.write(1, 2)      // layer III
      h.write(1, 1)      // protection: none
      h.write(brIdx, 4)
      h.write(srIdx, 2)
      h.write(0, 1)      // padding
      h.write(0, 1)      // private
      h.write(3, 2)      // mode: single channel
      h.write(0, 2); h.write(0, 1); h.write(0, 1); h.write(0, 2)
      // side info (mono, 17 bytes)
      h.write(0, 9) // main_data_begin: no reservoir
      h.write(0, 5) // private
      h.write(0, 4) // scfsi
      var grI = 0
      while (grI < 2) {
        val (_, bits, _) = packed(2 * f + grI)
        h.write(bits, 12)         // part2_3_length
        h.write(0, 9)             // big_values
        h.write(gs(2 * f + grI).gg, 8)
        h.write(15, 4)            // scalefac_compress → slen (4, 3)
        h.write(0, 1)             // window_switching_flag: long blocks
        h.write(1, 5); h.write(1, 5); h.write(1, 5) // table_select ×3 (unused: big_values=0)
        h.write(0, 4)             // region0_count
        h.write(0, 3)             // region1_count
        h.write(0, 1)             // preflag
        h.write(0, 1)             // scalefac_scale → multiplier 1/2
        h.write(1, 1)             // count1 table B
        grI += 1
      }
      val hdr = h.toBytes
      require(hdr.length == 21, s"header+side info ${hdr.length}")
      out.write(hdr)
      // main data: both granules bit-contiguous, then byte-pad, then the
      // gapless tag (frame 0) and zero ancillary fill
      val bw = new MsbWriter
      var grJ = 0
      while (grJ < 2) {
        val (gb, gbits, _) = packed(2 * f + grJ)
        var bi = 0
        while (bi < gbits) {
          bw.write((gb(bi / 8) >> (7 - bi % 8)) & 1, 1)
          bi += 1
        }
        grJ += 1
      }
      val body = new java.io.ByteArrayOutputStream(frameBytes - 21)
      body.write(bw.toBytes)
      if (f == 0) { // gapless tag: 'G' 'L' + u32 original sample count
        body.write('G'); body.write('L')
        body.write((pcm.length >>> 24) & 0xff); body.write((pcm.length >>> 16) & 0xff)
        body.write((pcm.length >>> 8) & 0xff); body.write(pcm.length & 0xff)
      }
      while (body.size() < frameBytes - 21) body.write(0)
      require(body.size() == frameBytes - 21,
        s"frame $f main data ${body.size()} exceeds ${frameBytes - 21}")
      out.write(body.toByteArray)
      f += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  def decode(bytes: Array[Byte]): (Info, Array[Float]) = {
    var at = 0
    // ID3v2 prefix: "ID3" + version(2) + flags + syncsafe u28 length
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val len = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      at = 10 + len
      require(at < bytes.length, "ID3v2 tag covers the whole file")
    }
    require(bytes.length - at >= 4, "too short for an MP3 frame")

    val syn = new Synthesis(CascadeGain)
    val prevHalf = Array.ofDim[Double](32, 18)
    val pcm = new java.io.ByteArrayOutputStream() // int16 LE scratch
    var sampleRate = -1
    var bitrateK = -1
    var frames = 0
    var gaplessLen = -1L

    var trailerDone = false
    while (!trailerDone && at + 4 <= bytes.length) {
      // trailing ID3v1 block ('TAG' + 125 bytes) — near-universal in
      // scraped MP3s; everything after it would be past end-of-audio
      if (bytes.length - at == 128 && bytes(at) == 'T' &&
          bytes(at + 1) == 'A' && bytes(at + 2) == 'G') trailerDone = true
      else {
      require((bytes(at) & 0xff) == 0xff && (bytes(at + 1) & 0xe0) == 0xe0,
        f"lost frame sync at byte $at (0x${bytes(at) & 0xff}%02x)")
      val b1 = bytes(at + 1) & 0xff; val b2 = bytes(at + 2) & 0xff
      val b3 = bytes(at + 3) & 0xff
      val version = (b1 >> 3) & 3
      require(version == 3,
        s"unsupported MPEG version bits $version (MPEG-1 only; 2/2.5 LSF off-scope)")
      val layer = (b1 >> 1) & 3
      require(layer == 1, s"unsupported layer bits $layer (Layer III only)")
      val crcPresent = (b1 & 1) == 0
      val brIdx = (b2 >> 4) & 0xf
      require(brIdx >= 1 && brIdx <= 14,
        s"unsupported bitrate index $brIdx (free-format/bad)")
      val srIdx = (b2 >> 2) & 3
      require(srIdx < 3, s"bad sampling_frequency $srIdx")
      val padding = (b2 >> 1) & 1
      val mode = (b3 >> 6) & 3
      require(mode == 3, s"unsupported mode $mode (mono streams only)")
      val sr = SampleRates(srIdx)
      require(sampleRate < 0 || sr == sampleRate, "sample rate changes mid-stream")
      sampleRate = sr; bitrateK = Bitrates(brIdx)
      val frameLen = 144 * Bitrates(brIdx) * 1000 / sr + padding
      require(at + frameLen <= bytes.length,
        s"truncated MP3: frame at $at wants $frameLen bytes")
      var p = at + 4
      if (crcPresent) p += 2 // CRC-16 skipped, not verified

      // ---- side info (mono: 17 bytes) ----
      val si = new MsbReader(bytes, p, p + 17)
      val mainDataBegin = si.read(9)
      require(mainDataBegin == 0,
        "bit-reservoir streams (main_data_begin > 0) are off-scope")
      si.read(5) // private
      val scfsi = si.read(4)
      require(scfsi == 0,
        "scfsi scalefactor reuse is off-scope (granule 1 would omit " +
          "reused bands' bits; decoding them blind would misparse)")
      final case class Gr(part23: Int, bigValues: Int, gg: Int, sfc: Int,
                          tables: Array[Int], region0: Int, region1: Int)
      val grs = Array.tabulate(2) { _ =>
        val part23 = si.read(12)
        val bigValues = si.read(9)
        require(bigValues <= 288,
          s"big_values $bigValues exceeds the spec bound 288")
        val gg = si.read(8)
        val sfc = si.read(4)
        val wsf = si.read(1)
        require(wsf == 0,
          "window_switching_flag = 1 (short/mixed blocks) is off-scope")
        val tables = Array(si.read(5), si.read(5), si.read(5))
        val region0 = si.read(4); val region1 = si.read(3)
        val preflag = si.read(1)
        require(preflag == 0, "preflag pretab emphasis is off-scope")
        val sfScale = si.read(1)
        require(sfScale == 0, "scalefac_scale = 1 not emitted by this profile")
        val c1t = si.read(1)
        require(c1t == 1,
          "count1 table A is off-scope (table B streams only)")
        Gr(part23, bigValues, gg, sfc, tables, region0, region1)
      }
      p += 17

      // ---- main data (both granules, then ancillary) ----
      val md = new MsbReader(bytes, p, at + frameLen)
      val sfbEdges = SfbLong(sr)
      var grI = 0
      while (grI < 2) {
        val gr = grs(grI)
        val start = md.consumed
        // scalefactors
        val s1 = Slen1(gr.sfc); val s2 = Slen2(gr.sfc)
        val sf = new Array[Int](22)
        var b = 0
        while (b < 21) { sf(b) = md.read(if (b < 11) s1 else s2); b += 1 }
        // Huffman: big values (tables 0/1 only), then count1 (table B).
        // Region boundaries follow the spec's long-block derivation:
        // region0 ends at sfb edge (region0_count + 1), region1 at edge
        // (region0_count + region1_count + 2), region2 runs to
        // big_values·2 — each region decodes with ITS OWN table_select,
        // and an off-scope table refuses by number only when its region
        // actually contains pairs.
        val ix = new Array[Int](576)
        val bvEnd = gr.bigValues * 2
        val r0End = math.min(bvEnd, sfbEdges(math.min(gr.region0 + 1, 22)))
        val r1End = math.min(bvEnd,
          sfbEdges(math.min(gr.region0 + gr.region1 + 2, 22)))
        var li = 0
        while (li < bvEnd) {
          val region = if (li < r0End) 0 else if (li < r1End) 1 else 2
          val tbl = gr.tables(region)
          require(tbl == 0 || tbl == 1,
            s"Huffman table $tbl (region $region) is off-scope (0/1 implemented)")
          if (tbl == 0) { ix(li) = 0; ix(li + 1) = 0 }
          else {
            // table 1: walk the 4 codes bit by bit
            var x = -1; var y = -1
            val first = md.read1()
            if (first == 1) { x = 0; y = 0 }
            else {
              val second = md.read1()
              if (second == 1) { x = 1; y = 0 }
              else { val third = md.read1(); if (third == 1) { x = 0; y = 1 } else { x = 1; y = 1 } }
            }
            if (x != 0) { if (md.read1() == 1) x = -x }
            if (y != 0) { if (md.read1() == 1) y = -y }
            ix(li) = x; ix(li + 1) = y
          }
          li += 2
        }
        // the spec's straddle rule: a quadruple that would read PAST
        // part2_3_length is discarded — its bits belong to the next
        // granule. Decided WITHOUT reading the overhang (fit-check on
        // the fixed 4-bit code, then on the sign count), because when
        // part2_3_length ends exactly at the frame's last main-data
        // byte the overhang bits don't physically exist and a
        // read-then-discard would abort a conformant stream.
        var straddled = false
        while (!straddled && md.consumed - start < gr.part23 && li + 3 < 576) {
          val inPart = gr.part23 - (md.consumed - start)
          if (inPart < 4) straddled = true // the code itself would cross
          else {
            val code = md.read(4)
            val mags = (~code) & 0xF
            if (4 + Integer.bitCount(mags) > inPart) straddled = true
            else {
              var j = 0
              while (j < 4) {
                val m = (mags >> (3 - j)) & 1
                if (m == 1) ix(li + j) = if (md.read1() == 1) -1 else 1
                j += 1
              }
              li += 4
            }
          }
        }
        // align to part2_3_length exactly (skips stuffing AND rewinds a
        // discarded straddling quadruple's overhang)
        md.seek(start + gr.part23)
        // requantize: xr = ±|ix|^{4/3} · 2^{(gg−210)/4 − sf/2}
        val xr = new Array[Double](576)
        b = 0
        var i = 0
        while (i < 576) {
          while (b < 21 && i >= sfbEdges(b + 1)) b += 1
          if (ix(i) != 0) {
            val a = (gr.gg - 210) / 4.0 - (if (b < 21) sf(b) else 0) / 2.0
            val mag = math.pow(math.abs(ix(i)).toDouble, 4.0 / 3.0) *
              math.pow(2.0, a)
            xr(i) = if (ix(i) < 0) -mag else mag
          }
          i += 1
        }
        // alias reduction between adjacent subbands
        var sb = 1
        while (sb < 32) {
          var k = 0
          while (k < 8) {
            val lo = sb * 18 - 1 - k
            val hi = sb * 18 + k
            val d1 = xr(lo); val d2 = xr(hi)
            xr(lo) = d1 * Cs(k) - d2 * Ca(k)
            xr(hi) = d2 * Cs(k) + d1 * Ca(k)
            k += 1
          }
          sb += 1
        }
        // IMDCT + overlap-add + frequency inversion per subband
        val sOut = Array.ofDim[Double](32, 18)
        sb = 0
        while (sb < 32) {
          val xk = new Array[Double](18)
          System.arraycopy(xr, sb * 18, xk, 0, 18)
          val tb = imdct(xk)
          var t = 0
          while (t < 18) {
            sOut(sb)(t) = tb(t) + prevHalf(sb)(t)
            prevHalf(sb)(t) = tb(18 + t)
            t += 1
          }
          if (sb % 2 == 1) {
            t = 1
            while (t < 18) { sOut(sb)(t) = -sOut(sb)(t); t += 2 }
          }
          sb += 1
        }
        // synthesis: one 32-wide slice per time index
        var t = 0
        while (t < 18) {
          val slice = new Array[Double](32)
          sb = 0
          while (sb < 32) { slice(sb) = sOut(sb)(t); sb += 1 }
          val o = syn.step(slice)
          var i2 = 0
          while (i2 < 32) {
            val v = math.max(-1.0, math.min(1.0, o(i2)))
            val s16 = math.round(v * 32767.0).toInt
            pcm.write(s16 & 0xff); pcm.write((s16 >> 8) & 0xff)
            i2 += 1
          }
          t += 1
        }
        grI += 1
      }
      // gapless tag in the first frame's leading ancillary bytes
      if (frames == 0) {
        val ancAt = p + ((md.consumed + 7) / 8).toInt
        if (ancAt + 6 <= at + frameLen && bytes(ancAt) == 'G' &&
            bytes(ancAt + 1) == 'L') {
          gaplessLen = ((bytes(ancAt + 2) & 0xffL) << 24) |
            ((bytes(ancAt + 3) & 0xffL) << 16) |
            ((bytes(ancAt + 4) & 0xffL) << 8) | (bytes(ancAt + 5) & 0xffL)
        }
      }
      frames += 1
      at += frameLen
      }
    }
    require(frames > 0, "no MP3 frames decoded")
    val raw = pcm.toByteArray
    val total = raw.length / 2
    val want =
      if (gaplessLen >= 0) math.min(gaplessLen, (total - CodecDelay).toLong).toInt
      else total - math.min(total, CodecDelay)
    val out = new Array[Float](math.max(0, want))
    var i = 0
    while (i < out.length) {
      val o = (CodecDelay + i) * 2
      out(i) = ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort / 32768.0f
      i += 1
    }
    (Info(sampleRate, frames, bitrateK), out)
  }
}
