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
  * DECODER (general profile, round 14): MPEG-1 (version bits 11),
  * Layer III, 32/44.1/48 kHz, CBR or VBR frame sequences, optional
  * CRC-16 frames (the 2 CRC bytes are skipped, not verified), ID3v2
  * prefix skipped via its syncsafe length, ID3v1 trailer tolerated.
  * ALL stereo modes: L/R stereo, dual channel, joint stereo with M/S
  * and/or intensity (is_pos via the right channel's scalefactors,
  * tan(is_pos·π/12) ratio split; is_pos = 7 falls back to M/S or
  * pass-through per spec). ALL window layouts except mixed: long,
  * start (1), SHORT (2, with subblock_gain, short scalefactor triples
  * and the written→natural reorder), stop (3); `mixed_block_flag = 1`
  * refuses by name. Bit reservoir (`main_data_begin` > 0) through a
  * rolling 511-byte main-data buffer. scfsi scalefactor reuse, preflag
  * pretab emphasis, and both `scalefac_scale` multipliers decode.
  * Huffman: big-values tables 0–3 and BOTH count1 tables (A and B) —
  * tables 1/2/3, A, and B are restated from the published ISO 11172-3
  * listings and validated structurally (each is a COMPLETE prefix
  * code: Kraft sum exactly 1, pinned in spec). Big-values tables 5–15
  * and the linbits ESC tables 16–31 refuse by table number: their code
  * assignments are large tabulated spec data this build cannot restate
  * with verified provenance, and a mis-recalled code table would
  * silently garble foreign streams — refusal is the honest boundary.
  * Layer I/II, MPEG-2/2.5 LSF, and free-format bitrate refuse by name.
  *
  * ENCODER (fixture writer, the [[VorbisCodec]] pattern): the frozen
  * [[encode]] emits the original mono long-block count1-B profile
  * byte-identically (golden oracles pin its output); [[encodeEx]]
  * generalizes to every decoder surface the corpus gates need — L/R,
  * dual-channel and M/S joint stereo, the window-switching sequence
  * long→start→short→stop, 2-bit magnitudes through big-values tables
  * 2/3 (chosen per granule by coded cost), count1 table A, and
  * `scalefac_scale` = 1. Both are conformant bitstream layouts — a
  * small-alphabet quantizer with per-band gains, the same shape real
  * encoders use with more magnitude levels.
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

  final case class Info(sampleRate: Int, frames: Int, bitrateKbps: Int,
                        channels: Int = 1)

  // ------------------------------------------------------------------
  // spec constants (ISO/IEC 11172-3)
  // ------------------------------------------------------------------

  /** Layer III bitrates, kbit/s, index 1..14 (0 = free format, refused). */
  private[graft] val Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-2 LSF Layer III bitrates, kbit/s (ISO 13818-3). */
  private[graft] val BitratesLsf =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** sampling_frequency field values 0..2. */
  private[graft] val SampleRates = Array(44100, 48000, 32000)

  /** MPEG-2 LSF sampling_frequency values 0..2 (half the MPEG-1 set). */
  private[graft] val SampleRatesLsf = Array(22050, 24000, 16000)

  /** LSF scalefactor layout (ISO 13818-3, non-intensity channel): the
    * 9-bit scalefac_compress maps to FOUR slens over four band groups;
    * preflag is IMPLIED by the ≥500 branch, not a side-info bit.
    * Returns (slens, bands-per-group, preflag). */
  private[graft] def lsfSlens(sfc: Int): (Array[Int], Array[Int], Int) =
    if (sfc < 400)
      (Array((sfc >> 4) / 5, (sfc >> 4) % 5, (sfc & 15) >> 2, sfc & 3),
        Array(6, 5, 5, 5), 0)
    else if (sfc < 500) {
      val v = sfc - 400
      (Array((v >> 2) / 5, (v >> 2) % 5, v & 3, 0), Array(6, 5, 7, 3), 0)
    } else {
      val v = sfc - 500
      (Array(v / 3, v % 3, 0, 0), Array(11, 10, 0, 0), 1)
    }

  /** Long-block scalefactor band boundaries (23 edges → 22 bands; bands
    * 0..20 carry scalefactors, band 21 rides global_gain alone) —
    * Table B.8. */
  private[graft] val SfbLong: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90,
      110, 134, 162, 196, 238, 288, 342, 418, 576),
    48000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88,
      106, 128, 156, 190, 230, 276, 330, 384, 576),
    32000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102,
      126, 156, 194, 240, 296, 364, 448, 550, 576),
    // MPEG-2 LSF long tables (ISO 13818-3 Table B.2; 16 kHz shares
    // 22.05 kHz's edges) — restated like the MPEG-1 set, structurally
    // validated in spec (23 ascending edges 0→576, 6-wide low bands)
    22050 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
      168, 200, 238, 284, 336, 396, 464, 522, 576),
    24000 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136,
      162, 194, 232, 278, 332, 394, 464, 540, 576),
    16000 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
      168, 200, 238, 284, 336, 396, 464, 522, 576))

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

  /** Big-values Huffman table 2 (Table B.7, 3×3): (x,y) → (hlen, hcod).
    * Restated from the published ISO 11172-3 listing; structurally
    * validated in spec (complete prefix code — Kraft sum exactly 1). */
  private[graft] val Tab2: Array[Array[(Int, Int)]] = Array(
    Array((1, 1), (3, 2), (6, 1)),
    Array((3, 3), (3, 1), (5, 1)),
    Array((5, 3), (5, 2), (6, 0)))

  /** Big-values Huffman table 3 (Table B.7, 3×3) — same provenance and
    * validation as [[Tab2]]. */
  private[graft] val Tab3: Array[Array[(Int, Int)]] = Array(
    Array((2, 3), (2, 2), (6, 1)),
    Array((3, 1), (2, 1), (5, 1)),
    Array((5, 3), (5, 2), (6, 0)))

  /** All decodable big-values tables by table_select number. Tables
    * 5–15 and the linbits ESC tables 16–31 remain off-scope: their code
    * assignments are spec-tabulated data this build cannot restate with
    * verified provenance (the 3×3 tables above Kraft-check exactly;
    * the larger listings do not reconstruct reliably). */
  private[graft] val BvTables: Map[Int, Array[Array[(Int, Int)]]] =
    Map(1 -> Tab1, 2 -> Tab2, 3 -> Tab3)

  /** count1 table A (Table B.7): (hlen, hcod) per quadruple value
    * v<<3|w<<2|x<<1|y. Restated from the published listing; complete
    * prefix code (Kraft sum 1), validated in spec. */
  private[graft] val Count1A: Array[(Int, Int)] = Array(
    (1, 1), (4, 5), (4, 4), (5, 5), (4, 6), (6, 5), (5, 4), (6, 4),
    (4, 7), (5, 3), (5, 6), (6, 0), (5, 7), (6, 2), (6, 3), (6, 1))

  /** Decode maps: (hlen, hcod) → value, built once per table. */
  private def decodeMap2(t: Array[Array[(Int, Int)]]): Map[(Int, Int), (Int, Int)] =
    (for (x <- t.indices; y <- t(x).indices) yield (t(x)(y), (x, y))).toMap
  private[graft] val BvDecode: Map[Int, Map[(Int, Int), (Int, Int)]] =
    BvTables.map { case (k, t) => k -> decodeMap2(t) }
  private[graft] val Count1ADecode: Map[(Int, Int), Int] =
    Count1A.zipWithIndex.map { case (c, q) => c -> q }.toMap
  private[graft] val Count1AMaxLen = Count1A.map(_._1).max

  /** Short-block scalefactor band edges (Table B.8 short): 14 edges →
    * 13 bands per window; ×3 windows = 576 lines. */
  private[graft] val SfbShort: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000 -> Array(0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000 -> Array(0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192))

  /** preflag pretab (Table B.6): high-band scalefactor emphasis added
    * when preflag is set; band 21 carries none. */
  private[graft] val Pretab: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

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
  private[graft] def imdct(xk: Array[Double]): Array[Double] =
    imdctWin(xk, MdctWin)

  private[graft] def imdctWin(xk: Array[Double], win: Array[Double]): Array[Double] = {
    val out = new Array[Double](36)
    var i = 0
    while (i < 36) {
      var acc = 0.0; var k = 0
      while (k < 18) { acc += xk(k) * MdctCos(k)(i); k += 1 }
      out(i) = acc * 2.0 * win(i) // ×2: the other half of 4/N
      i += 1
    }
    out
  }

  private[graft] def mdctWin(z: Array[Double], win: Array[Double]): Array[Double] = {
    val out = new Array[Double](18)
    var k = 0
    while (k < 18) {
      var acc = 0.0; var i = 0
      while (i < 36) { acc += z(i) * win(i) * MdctCos(k)(i); i += 1 }
      out(k) = acc * (2.0 / 36.0)
      k += 1
    }
    out
  }

  // ---- window-switching windows (ISO 2.4.3.4.10.3, block types 1-3) ----

  /** START window (block_type 1): long rise, flat top, short fall, zero
    * tail — the transition INTO a short-block granule. */
  private[graft] val WinStart: Array[Double] = Array.tabulate(36) { i =>
    if (i < 18) math.sin(math.Pi / 36.0 * (i + 0.5))
    else if (i < 24) 1.0
    else if (i < 30) math.sin(math.Pi / 12.0 * (i - 18 + 0.5))
    else 0.0
  }

  /** STOP window (block_type 3): zero head, short rise, flat, long fall
    * — the transition OUT of a short-block granule. */
  private[graft] val WinStop: Array[Double] = Array.tabulate(36) { i =>
    if (i < 6) 0.0
    else if (i < 12) math.sin(math.Pi / 12.0 * (i - 6 + 0.5))
    else if (i < 18) 1.0
    else math.sin(math.Pi / 36.0 * (i + 0.5))
  }

  /** 12-sample sine window for the three short blocks. */
  private[graft] val WinShort: Array[Double] =
    Array.tabulate(12)(i => math.sin(math.Pi / 12.0 * (i + 0.5)))

  private val Mdct12Cos = Array.tabulate(6, 12)((k, i) =>
    math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1)))

  /** 12 windowed time samples → 6 lines (one short block). */
  private[graft] def mdct12(z: Array[Double]): Array[Double] = {
    val out = new Array[Double](6)
    var k = 0
    while (k < 6) {
      var acc = 0.0; var i = 0
      while (i < 12) { acc += z(i) * WinShort(i) * Mdct12Cos(k)(i); i += 1 }
      out(k) = acc * (2.0 / 12.0)
      k += 1
    }
    out
  }

  /** 6 lines → 12 windowed time samples (one short block). */
  private[graft] def imdct12(xk: Array[Double]): Array[Double] = {
    val out = new Array[Double](12)
    var i = 0
    while (i < 12) {
      var acc = 0.0; var k = 0
      while (k < 6) { acc += xk(k) * Mdct12Cos(k)(i); k += 1 }
      out(i) = acc * 2.0 * WinShort(i)
      i += 1
    }
    out
  }

  /** Short-granule inverse: 18 lines per subband in NATURAL (reordered)
    * order — window w's coefficient k sits at 3k+w — through three
    * IMDCT-12s overlap-added at offsets 6/12/18 inside the 36-frame
    * (zeros outside), which then rides the standard 18-sample granule
    * OLA: the within-frame sums complete the short-window TDAC chain
    * and the frame halves splice against the neighboring start/stop
    * (or short) granules. */
  private[graft] def imdctShort(nat18: Array[Double]): Array[Double] = {
    val out = new Array[Double](36)
    var w = 0
    while (w < 3) {
      val xk = new Array[Double](6)
      var k = 0
      while (k < 6) { xk(k) = nat18(3 * k + w); k += 1 }
      val tb = imdct12(xk)
      var i = 0
      while (i < 12) { out(6 + 6 * w + i) += tb(i); i += 1 }
      w += 1
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
  // encode, general profile
  // ------------------------------------------------------------------

  /** [[encodeEx]] options. `stereoMode` is the header mode field
    * (0 = L/R stereo, 1 = joint stereo coded as M/S, 2 = dual channel,
    * 3 = mono); `maxMag` = 2 routes the spectrum through big-values
    * Huffman tables 2/3 (per-granule cost choice) instead of the
    * count1-only layout; `shortBlocks` emits the window-switching
    * sequence long→start→short→short→stop→long on repeat. */
  final case class EncOpts(stereoMode: Int = 3, maxMag: Int = 1,
                           shortBlocks: Boolean = false,
                           count1TableA: Boolean = false,
                           scalefacScale: Int = 0)

  /** General-profile encoder: every decoder surface the corpus gates
    * need, as a real conformant bitstream. The frozen [[encode]] stays
    * byte-identical for the golden oracles; this one generalizes. */
  def encodeEx(chans: Seq[Array[Float]], sampleRate: Int,
               opts: EncOpts): Array[Byte] = {
    val lsf = SampleRatesLsf.contains(sampleRate)
    require(lsf || SampleRates.contains(sampleRate),
      s"Layer III carries 32000/44100/48000 Hz (MPEG-1) or " +
        s"16000/22050/24000 Hz (MPEG-2 LSF), got $sampleRate")
    require(!lsf || !opts.shortBlocks,
      "LSF window switching is off-scope (long blocks only)")
    val nch = if (opts.stereoMode == 3) 1 else 2
    require(chans.length == nch,
      s"mode ${opts.stereoMode} wants $nch channels, got ${chans.length}")
    require(nch == 1 || chans(0).length == chans(1).length,
      "stereo channels must be the same length")
    require(opts.maxMag == 1 || opts.maxMag == 2,
      "maxMag 1 (count1) or 2 (big-values tables 2/3)")
    val srcLen = chans(0).length
    // joint M/S: encode the rotated pair; the decoder's (m±s)/√2 undoes it
    val inv = 1.0 / math.sqrt(2.0)
    val enc: Array[Array[Float]] =
      if (opts.stereoMode == 1)
        Array(
          Array.tabulate(srcLen)(i => ((chans(0)(i) + chans(1)(i)) * inv).toFloat),
          Array.tabulate(srcLen)(i => ((chans(0)(i) - chans(1)(i)) * inv).toFloat))
      else chans.toArray
    val sfbL = SfbLong(sampleRate)
    val sfbS = if (lsf) SfbShort(32000) else SfbShort(sampleRate) // unused in LSF
    val mult = if (opts.scalefacScale == 0) 0.5 else 1.0
    val gpf = if (lsf) 1 else 2 // granules per frame
    val frameSamples = GranuleSamples * gpf
    val nFrames = math.max(1, (srcLen + frameSamples - 1) / frameSamples) +
      (CodecDelay + frameSamples - 1) / frameSamples
    val totalGranules = nFrames * gpf
    // block-type schedule (same for every channel — joint stereo needs
    // matching layouts): the legal switching chain on repeat
    val cycle = Array(0, 1, 2, 2, 3, 0)
    def blockTypeOf(g: Int): Int = if (opts.shortBlocks) cycle(g % 6) else 0

    // per-granule-channel payload
    final case class P(gg: Int, wsf: Boolean, blockType: Int,
                       bigValues: Int, tableSel: Int, c1A: Boolean,
                       bits: Array[Byte], nBits: Int)
    val payload = Array.ofDim[P](totalGranules, nch)

    var chI = 0
    while (chI < nch) {
      val an = new Analysis
      val prev = Array.ofDim[Double](32, 18)
      val pcm = enc(chI)
      var g = 0
      while (g < totalGranules) {
        val bt = blockTypeOf(g)
        // 18 slices of 32 input samples through the analysis filterbank
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
        // MDCT per subband with the granule's window; short granules
        // produce coefficients in NATURAL order then map to the written
        // (band-major, window-inner) order
        val lines = new Array[Double](576) // written order
        var sb = 0
        while (sb < 32) {
          val z = new Array[Double](36)
          var i = 0
          while (i < 18) { z(i) = prev(sb)(i); z(18 + i) = s(sb)(i); i += 1 }
          if (sb % 2 == 1) {
            var ii = 1
            while (ii < 36) { z(ii) = -z(ii); ii += 2 }
          }
          if (bt == 2) {
            var w = 0
            while (w < 3) {
              val zw = new Array[Double](12)
              var k = 0
              while (k < 12) { zw(k) = z(6 + 6 * w + k); k += 1 }
              val xk = mdct12(zw)
              // natural coefficient j = 6·sb + k lives at written
              // position: band b with S(b) <= j < S(b+1), offset
              // 3·S(b) + w·len + (j − S(b))
              k = 0
              while (k < 6) {
                val j = 6 * sb + k
                var b = 0
                while (sfbS(b + 1) <= j) b += 1
                val len = sfbS(b + 1) - sfbS(b)
                lines(3 * sfbS(b) + w * len + (j - sfbS(b))) = xk(k)
                k += 1
              }
              w += 1
            }
          } else {
            val win = bt match {
              case 1 => WinStart
              case 3 => WinStop
              case _ => MdctWin
            }
            val xk = mdctWin(z, win)
            System.arraycopy(xk, 0, lines, sb * 18, 18)
          }
          System.arraycopy(s(sb), 0, prev(sb), 0, 18)
          sb += 1
        }
        // ---- quantize: per-band scalefactors under one global gain ----
        var gmax = 1e-12
        var li = 0
        while (li < 576) { gmax = math.max(gmax, math.abs(lines(li))); li += 1 }
        val aTop = math.ceil(math.log(gmax) / math.log(2.0) * 4.0) / 4.0
        val gg = math.max(0, math.min(255, 210 + math.round(4.0 * aTop).toInt))
        val aQ = (gg - 210) / 4.0
        val ix = new Array[Int](576)
        // band segmentation in WRITTEN order: (lo, hi, sfMax, slen)
        val segs: Seq[(Int, Int, Int, Int)] =
          if (bt == 2)
            for (b <- 0 until 13; w <- 0 until 3) yield {
              val len = sfbS(b + 1) - sfbS(b)
              val sfMax = if (b < 6) 15 else if (b < 12) 7 else 0
              val slen = if (b < 6) 4 else if (b < 12) 3 else 0
              (3 * sfbS(b) + w * len, 3 * sfbS(b) + (w + 1) * len, sfMax, slen)
            }
          else (0 until 22).map { b =>
            val sfMax = if (b < 11) 15 else if (b < 21) 7 else 0
            val slen = if (b < 11) 4 else if (b < 21) 3 else 0
            (sfbL(b), sfbL(b + 1), sfMax, slen)
          }
        val sfs = new Array[Int](segs.length)
        segs.zipWithIndex.foreach { case ((lo, hi, sfMax, _), bi) =>
          var bmax = 0.0
          var i = lo
          while (i < hi) { bmax = math.max(bmax, math.abs(lines(i))); i += 1 }
          if (bmax > 1e-9) {
            // pick the scalefactor so the band max quantizes near the
            // top magnitude: |ix| = (|x|·2^-a)^(3/4) → target maxMag
            val want = (aQ - math.log(bmax) / math.log(2.0) +
              4.0 / 3.0 * math.log(opts.maxMag + 0.2) / math.log(2.0)) / mult
            val sfv = math.max(0, math.min(sfMax, math.round(want).toInt))
            sfs(bi) = if (sfMax > 0) sfv else 0
            val a = aQ - mult * sfs(bi)
            val scale = math.pow(2.0, -a)
            i = lo
            while (i < hi) {
              val q = math.round(
                math.pow(math.abs(lines(i)) * scale, 0.75)).toInt
              val qq = math.min(opts.maxMag, q)
              ix(i) = if (lines(i) < 0) -qq else qq
              i += 1
            }
          }
        }
        // ---- pack: scalefactors, then Huffman ----
        val w = new MsbWriter
        segs.zipWithIndex.foreach { case ((_, _, _, slen), bi) =>
          if (slen > 0) w.write(sfs(bi), slen)
        }
        var last = 575
        while (last >= 0 && ix(last) == 0) last -= 1
        var bigValues = 0
        var tableSel = 1
        if (opts.maxMag == 2 && last >= 0) {
          // whole nonzero span as big-values pairs; table 2 vs 3 by cost
          bigValues = (last + 2) / 2
          def cost(tab: Array[Array[(Int, Int)]]): Int = {
            var bits = 0; var i = 0
            while (i < bigValues * 2) {
              val x = math.abs(ix(i)); val y = math.abs(ix(i + 1))
              bits += tab(x)(y)._1 + (if (x != 0) 1 else 0) + (if (y != 0) 1 else 0)
              i += 2
            }
            bits
          }
          tableSel = if (cost(Tab2) <= cost(Tab3)) 2 else 3
          val tab = if (tableSel == 2) Tab2 else Tab3
          var i = 0
          while (i < bigValues * 2) {
            val x = ix(i); val y = ix(i + 1)
            val (hlen, hcod) = tab(math.abs(x))(math.abs(y))
            w.write(hcod, hlen)
            if (x != 0) w.write(if (x < 0) 1 else 0, 1)
            if (y != 0) w.write(if (y < 0) 1 else 0, 1)
            i += 2
          }
        } else if (last >= 0) {
          // count1-only: quadruples of {-1, 0, +1} via table A or B
          val quads = (last + 1 + 3) / 4
          var q = 0
          while (q < quads) {
            var mags = 0
            var j = 0
            while (j < 4) { mags = (mags << 1) | math.abs(ix(q * 4 + j)); j += 1 }
            if (opts.count1TableA) {
              val (hlen, hcod) = Count1A(mags)
              w.write(hcod, hlen)
            } else w.write(count1BCode(mags), 4)
            j = 0
            while (j < 4) {
              val v = ix(q * 4 + j)
              if (v != 0) w.write(if (v < 0) 1 else 0, 1)
              j += 1
            }
            q += 1
          }
        }
        payload(g)(chI) = P(gg, bt != 0, bt, bigValues, tableSel,
          opts.count1TableA, w.toBytes, w.bitsWritten.toInt)
        g += 1
      }
      chI += 1
    }

    // ---- CBR frame size: smallest standard bitrate fitting every frame ----
    val sideBytes =
      if (lsf) (if (nch == 1) 9 else 17) else (if (nch == 1) 17 else 32)
    val srIdx = (if (lsf) SampleRatesLsf else SampleRates).indexOf(sampleRate)
    val brTable = if (lsf) BitratesLsf else Bitrates
    val frameFactor = if (lsf) 72 else 144
    val maxMain = (0 until nFrames).map { f =>
      val bits = (for (g <- 0 until gpf; c <- 0 until nch)
        yield payload(gpf * f + g)(c).nBits).sum
      (bits + 7) / 8
    }.max
    val need = 4 + sideBytes + maxMain + 6
    val brIdx = (1 to 14).find(i =>
      frameFactor * brTable(i) * 1000 / sampleRate >= need).getOrElse(
      throw new IllegalStateException(s"frame payload $need exceeds the top rate"))
    val frameBytes = frameFactor * brTable(brIdx) * 1000 / sampleRate

    val out = new java.io.ByteArrayOutputStream(nFrames * frameBytes)
    var f = 0
    while (f < nFrames) {
      val h = new MsbWriter
      h.write(0x7FF, 11); h.write(if (lsf) 2 else 3, 2); h.write(1, 2); h.write(1, 1)
      h.write(brIdx, 4); h.write(srIdx, 2)
      h.write(0, 1); h.write(0, 1)
      h.write(opts.stereoMode, 2)
      h.write(if (opts.stereoMode == 1) 2 else 0, 2) // mode_extension: M/S
      h.write(0, 1); h.write(0, 1); h.write(0, 2)
      h.write(0, if (lsf) 8 else 9)      // main_data_begin: no reservoir
      h.write(0,
        if (lsf) (if (nch == 1) 1 else 2)
        else (if (nch == 1) 5 else 3))   // private
      if (!lsf) (0 until nch).foreach(_ => h.write(0, 4)) // scfsi
      var grI = 0
      while (grI < gpf) {
        var c = 0
        while (c < nch) {
          val pl = payload(gpf * f + grI)(c)
          h.write(pl.nBits, 12)
          h.write(pl.bigValues, 9)
          h.write(pl.gg, 8)
          // scalefac_compress: MPEG-1's 15 → slen (4, 3); LSF's 399 →
          // lsfSlens (4,4,3,3) over (6,5,5,5) — the SAME per-band widths
          if (lsf) h.write(399, 9) else h.write(15, 4)
          if (pl.wsf) {
            h.write(1, 1)
            h.write(pl.blockType, 2)
            h.write(0, 1) // mixed_block_flag
            h.write(pl.tableSel, 5); h.write(pl.tableSel, 5)
            h.write(0, 3); h.write(0, 3); h.write(0, 3) // subblock_gain
          } else {
            h.write(0, 1)
            h.write(pl.tableSel, 5); h.write(pl.tableSel, 5); h.write(pl.tableSel, 5)
            h.write(0, 4) // region0_count
            h.write(0, 3) // region1_count
          }
          if (!lsf) h.write(0, 1) // preflag (LSF: implied by sfc < 500)
          h.write(opts.scalefacScale, 1)
          h.write(if (pl.c1A) 0 else 1, 1) // count1table_select
          c += 1
        }
        grI += 1
      }
      val hdr = h.toBytes
      require(hdr.length == 4 + sideBytes, s"header+side info ${hdr.length}")
      out.write(hdr)
      val bw = new MsbWriter
      var grJ = 0
      while (grJ < gpf) {
        var c = 0
        while (c < nch) {
          val pl = payload(gpf * f + grJ)(c)
          var bi = 0
          while (bi < pl.nBits) {
            bw.write((pl.bits(bi / 8) >> (7 - bi % 8)) & 1, 1)
            bi += 1
          }
          c += 1
        }
        grJ += 1
      }
      val body = new java.io.ByteArrayOutputStream(frameBytes - 4 - sideBytes)
      body.write(bw.toBytes)
      if (f == 0) { // gapless tag: 'G' 'L' + u32 per-channel sample count
        body.write('G'); body.write('L')
        body.write((srcLen >>> 24) & 0xff); body.write((srcLen >>> 16) & 0xff)
        body.write((srcLen >>> 8) & 0xff); body.write(srcLen & 0xff)
      }
      while (body.size() < frameBytes - 4 - sideBytes) body.write(0)
      require(body.size() == frameBytes - 4 - sideBytes,
        s"frame $f main data ${body.size()} exceeds ${frameBytes - 4 - sideBytes}")
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

    var sampleRate = -1
    var bitrateK = -1
    var frames = 0
    var gaplessLen = -1L
    var channels = -1

    // per-channel synthesis state, allocated on the first frame
    var synths: Array[Synthesis] = null
    var prevHalves: Array[Array[Array[Double]]] = null
    var prevSfLong: Array[Array[Int]] = null // granule-0 sfs for scfsi reuse
    var chPcm: Array[java.io.ByteArrayOutputStream] = null

    // bit reservoir: Layer III main data is a byte stream of its own —
    // a frame's granules may begin main_data_begin bytes BEFORE the
    // frame's own main bytes, inside ancillary space of earlier frames.
    // `res` holds that stream's tail (trimmed to the 9-bit pointer's
    // 511-byte reach after every frame, so memory is O(1) per stream).
    var res = new Array[Byte](0)

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
      require(version == 3 || version == 2,
        if (version == 0)
          "MPEG-2.5 (version bits 0) is off-scope: a non-ISO extension " +
            "whose 8/11.025/12 kHz scalefactor tables this build cannot " +
            "restate with verified provenance"
        else s"reserved MPEG version bits $version")
      val lsf = version == 2
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
      val modeExt = (b3 >> 4) & 3
      val nch = if (mode == 3) 1 else 2
      val msOn = mode == 1 && (modeExt & 2) != 0
      val intensityOn = mode == 1 && (modeExt & 1) != 0
      require(!(lsf && intensityOn),
        "LSF intensity stereo is off-scope (its is_pos coding differs " +
          "from MPEG-1's; M/S and L/R decode)")
      require(channels < 0 || nch == channels,
        "channel count changes mid-stream")
      channels = nch
      if (synths == null) {
        synths = Array.fill(nch)(new Synthesis(CascadeGain))
        prevHalves = Array.fill(nch)(Array.ofDim[Double](32, 18))
        prevSfLong = Array.fill(nch)(new Array[Int](21))
        chPcm = Array.fill(nch)(new java.io.ByteArrayOutputStream())
      }
      val sr = (if (lsf) SampleRatesLsf else SampleRates)(srIdx)
      require(sampleRate < 0 || sr == sampleRate, "sample rate changes mid-stream")
      sampleRate = sr
      bitrateK = (if (lsf) BitratesLsf else Bitrates)(brIdx)
      // LSF frames carry ONE granule (576 samples) → half the slot size
      val gpf = if (lsf) 1 else 2
      val frameLen = (if (lsf) 72 else 144) * bitrateK * 1000 / sr + padding
      require(at + frameLen <= bytes.length,
        s"truncated MP3: frame at $at wants $frameLen bytes")
      var p = at + 4
      if (crcPresent) p += 2 // CRC-16 skipped, not verified

      // ---- side info (MPEG-1: 17/32 bytes; LSF: 9/17) ----
      val sideBytes =
        if (lsf) (if (nch == 1) 9 else 17) else (if (nch == 1) 17 else 32)
      val si = new MsbReader(bytes, p, p + sideBytes)
      val mainDataBegin = si.read(if (lsf) 8 else 9)
      si.read(
        if (lsf) (if (nch == 1) 1 else 2)
        else (if (nch == 1) 5 else 3)) // private bits
      val scfsi = if (lsf) Array.fill(nch)(0) else Array.fill(nch)(si.read(4))
      val gcs = Array.tabulate(gpf, nch) { (_, _) =>
        val part23 = si.read(12)
        val bigValues = si.read(9)
        require(bigValues <= 288,
          s"big_values $bigValues exceeds the spec bound 288")
        val gg = si.read(8)
        val sfc = si.read(if (lsf) 9 else 4)
        val wsf = si.read(1) == 1
        require(!(lsf && wsf),
          "LSF window switching (short blocks) is off-scope this round")
        var blockType = 0
        val tables = new Array[Int](3)
        var region0 = 0; var region1 = 0
        val sbg = new Array[Int](3)
        if (wsf) {
          blockType = si.read(2)
          require(blockType != 0,
            "window_switching_flag = 1 with block_type 0 is forbidden")
          val mixed = si.read(1) == 1
          require(!mixed,
            "mixed_block_flag = 1 (mixed long/short granules) is off-scope")
          tables(0) = si.read(5); tables(1) = si.read(5)
          sbg(0) = si.read(3); sbg(1) = si.read(3); sbg(2) = si.read(3)
        } else {
          tables(0) = si.read(5); tables(1) = si.read(5); tables(2) = si.read(5)
          region0 = si.read(4); region1 = si.read(3)
        }
        // LSF has NO preflag bit — it is implied by scalefac_compress
        // (the ≥500 branch of lsfSlens)
        val preflag = if (lsf) lsfSlens(sfc)._3 else si.read(1)
        val sfScale = si.read(1)
        val c1A = si.read(1) == 0 // count1table_select: 0 = A, 1 = B
        Gc(part23, bigValues, gg, sfc, wsf, blockType, tables,
          region0, region1, sbg, preflag, sfScale, c1A)
      }
      // scfsi only applies when BOTH granules of the channel are long
      var chS = 0
      while (chS < nch && !lsf) {
        require(scfsi(chS) == 0 ||
          (gcs(0)(chS).blockType != 2 && gcs(1)(chS).blockType != 2),
          "scfsi with a short-block granule is forbidden by the spec")
        chS += 1
      }
      p += sideBytes

      // ---- main data through the bit reservoir ----
      val frameMain = java.util.Arrays.copyOfRange(bytes, p, at + frameLen)
      require(mainDataBegin <= res.length,
        s"bit-reservoir underrun: main_data_begin $mainDataBegin with " +
          s"${res.length} buffered bytes (stream cut before its reservoir)")
      val startByteInRes = res.length - mainDataBegin
      val merged = new Array[Byte](res.length + frameMain.length)
      System.arraycopy(res, 0, merged, 0, res.length)
      System.arraycopy(frameMain, 0, merged, res.length, frameMain.length)
      val frameMainStart = res.length // where THIS frame's bytes begin
      res = merged
      val md = new MsbReader(res, 0, res.length)
      md.seek(startByteInRes.toLong * 8)

      val sfbEdges = SfbLong(sr)
      // LSF short blocks refuse at side-info parse; the table is never
      // consulted there (MPEG-1 rates only carry short layouts here)
      val sfbS = SfbShort.getOrElse(sr, SfbShort(32000))
      var grI = 0
      while (grI < gpf) {
        val xrs = Array.ofDim[Double](nch, 576) // Huffman (written) order
        val nzEnd = new Array[Int](nch)
        // per-window intensity bound for short blocks: 1 + the highest
        // scalefactor band with a nonzero right-channel line in THAT
        // window (ISO 11172-3 derives the zero-part boundary per short
        // window, not granule-wide — round-15 advice fix)
        val nzBandW = Array.ofDim[Int](nch, 3)
        val sfLongCh = Array.ofDim[Int](nch, 22)
        val sfShortCh = Array.ofDim[Int](nch, 13, 3)
        var ch = 0
        while (ch < nch) {
          val gc = gcs(grI)(ch)
          val start = md.consumed
          // MPEG-1's 4-bit sfc indexes the slen pair tables; LSF's 9-bit
          // sfc derives four slens via lsfSlens instead
          val s1 = if (lsf) 0 else Slen1(gc.sfc)
          val s2 = if (lsf) 0 else Slen2(gc.sfc)
          val isShort = gc.wsf && gc.blockType == 2
          // ---- scalefactors ----
          if (isShort) {
            var b = 0
            while (b < 12) {
              var w = 0
              while (w < 3) {
                sfShortCh(ch)(b)(w) = md.read(if (b < 6) s1 else s2); w += 1
              }
              b += 1
            }
          } else if (lsf) {
            // LSF long: four slens over four band groups (lsfSlens)
            val (slens, groups, _) = lsfSlens(gc.sfc)
            val sf = sfLongCh(ch)
            var b = 0
            var g = 0
            while (g < 4) {
              var k = 0
              while (k < groups(g)) {
                sf(b) = if (slens(g) > 0) md.read(slens(g)) else 0
                b += 1; k += 1
              }
              g += 1
            }
          } else {
            val sf = sfLongCh(ch)
            var b = 0
            while (b < 21) {
              // scfsi group g covers bands {0-5, 6-10, 11-15, 16-20};
              // its bit (MSB-first) set on granule 1 → REUSE granule 0's
              // value, and the stream carries no bits for that band
              val g = if (b < 6) 0 else if (b < 11) 1 else if (b < 16) 2 else 3
              if (grI == 1 && ((scfsi(ch) >> (3 - g)) & 1) == 1)
                sf(b) = prevSfLong(ch)(b)
              else sf(b) = md.read(if (b < 11) s1 else s2)
              b += 1
            }
            if (grI == 0) System.arraycopy(sf, 0, prevSfLong(ch), 0, 21)
          }
          // ---- Huffman: big values ----
          val ix = new Array[Int](576)
          val bvEnd = gc.bigValues * 2
          // region boundaries: with window switching the split is fixed
          // (region0 = the first 36 lines, region1 = the rest, region2
          // unused — the spec's implied region0_count); otherwise the
          // written counts index the long sfb edges
          val r0End =
            if (gc.wsf) math.min(bvEnd, 36)
            else math.min(bvEnd, sfbEdges(math.min(gc.region0 + 1, 22)))
          val r1End =
            if (gc.wsf) bvEnd
            else math.min(bvEnd,
              sfbEdges(math.min(gc.region0 + gc.region1 + 2, 22)))
          var li = 0
          while (li < bvEnd) {
            val region = if (li < r0End) 0 else if (li < r1End) 1 else 2
            val tbl = gc.tables(region)
            if (tbl == 0) { ix(li) = 0; ix(li + 1) = 0 }
            else {
              val dec = BvDecode.getOrElse(tbl,
                throw new IllegalArgumentException(
                  s"Huffman table $tbl (region $region) is off-scope " +
                    "(0-3 implemented; 5-15 and the linbits ESC tables " +
                    "16-31 refuse by number)"))
              var len = 0; var code = 0
              var hit: (Int, Int) = null
              while (hit == null) {
                code = (code << 1) | md.read1(); len += 1
                require(len <= 8, s"Huffman walk overran table $tbl")
                hit = dec.getOrElse((len, code), null)
              }
              var x = hit._1; var y = hit._2
              if (x != 0 && md.read1() == 1) x = -x
              if (y != 0 && md.read1() == 1) y = -y
              ix(li) = x; ix(li + 1) = y
            }
            li += 2
          }
          require(md.consumed - start <= gc.part23,
            "big-values region overran part2_3_length")
          // ---- count1 (table A variable-length or table B fixed 4-bit);
          // the straddle rule: a quadruple that would read PAST
          // part2_3_length is discarded WITHOUT reading the overhang
          // (those bits may not physically exist at frame end) ----
          var straddled = false
          while (!straddled && md.consumed - start < gc.part23 && li + 3 < 576) {
            val inPart = gc.part23 - (md.consumed - start)
            if (gc.c1A) {
              var len = 0; var code = 0; var q = -1
              var bitsLeft = inPart
              while (q < 0 && !straddled) {
                if (bitsLeft <= 0) straddled = true
                else {
                  code = (code << 1) | md.read1(); len += 1; bitsLeft -= 1
                  q = Count1ADecode.getOrElse((len, code), -1)
                  if (q < 0 && len >= Count1AMaxLen) straddled = true
                }
              }
              if (!straddled) {
                if (Integer.bitCount(q) > bitsLeft) straddled = true
                else {
                  var j = 0
                  while (j < 4) {
                    if (((q >> (3 - j)) & 1) == 1)
                      ix(li + j) = if (md.read1() == 1) -1 else 1
                    j += 1
                  }
                  li += 4
                }
              }
            } else {
              if (inPart < 4) straddled = true
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
          }
          // the channel's zero part begins after the highest NONZERO
          // line, not after the Huffman decode end — a table_select-0
          // region decodes zeros inside the coded span, and ISO's
          // intensity bound is "at or above the highest scalefactor
          // band with a non-zero value" (round-14 review finding)
          var nz = li
          while (nz > 0 && ix(nz - 1) == 0) nz -= 1
          nzEnd(ch) = nz
          if (isShort && ch == 1 && intensityOn) {
            // only the RIGHT channel's per-window bound is ever consulted,
            // and only when intensity stereo is on — skip the 13-band ×
            // 3-window scan otherwise (round-16 advice: dead work per
            // short-block granule)
            // written order groups lines band-major: band b window w
            // occupies [3·sfbS(b) + w·len, …+len)
            var bb = 0
            while (bb < 13) {
              val len = sfbS(bb + 1) - sfbS(bb)
              var w = 0
              while (w < 3) {
                val lo = 3 * sfbS(bb) + w * len
                var k = 0
                while (k < len) {
                  if (ix(lo + k) != 0) { nzBandW(ch)(w) = bb + 1; k = len }
                  else k += 1
                }
                w += 1
              }
              bb += 1
            }
          }
          // align to part2_3_length exactly (skips stuffing AND rewinds
          // a discarded straddling quadruple's overhang)
          md.seek(start + gc.part23)
          // ---- requantize (in Huffman order) ----
          val xr = xrs(ch)
          val mult = if (gc.sfScale == 0) 0.5 else 1.0
          if (isShort) {
            var pos = 0
            var b = 0
            while (b < 13) {
              val len = sfbS(b + 1) - sfbS(b)
              var w = 0
              while (w < 3) {
                val sfv = if (b < 12) sfShortCh(ch)(b)(w) else 0
                val a = (gc.gg - 210 - 8 * gc.sbg(w)) / 4.0 - mult * sfv
                val scale = math.pow(2.0, a)
                var k = 0
                while (k < len) {
                  val v = ix(pos)
                  if (v != 0)
                    xr(pos) = (if (v < 0) -1.0 else 1.0) *
                      math.pow(math.abs(v).toDouble, 4.0 / 3.0) * scale
                  pos += 1; k += 1
                }
                w += 1
              }
              b += 1
            }
          } else {
            var b = 0
            var i = 0
            while (i < 576) {
              while (b < 21 && i >= sfbEdges(b + 1)) b += 1
              if (ix(i) != 0) {
                val sfv = if (b < 21) sfLongCh(ch)(b) else 0
                val a = (gc.gg - 210) / 4.0 -
                  mult * (sfv + gc.preflag * Pretab(b))
                val mag = math.pow(math.abs(ix(i)).toDouble, 4.0 / 3.0) *
                  math.pow(2.0, a)
                xr(i) = if (ix(i) < 0) -mag else mag
              }
              i += 1
            }
          }
          ch += 1
        }

        // ---- stereo processing (on the decoded pair, Huffman order) ----
        if (nch == 2 && (msOn || intensityOn)) {
          val gc0 = gcs(grI)(0); val gc1 = gcs(grI)(1)
          require(gc0.wsf == gc1.wsf && gc0.blockType == gc1.blockType,
            "joint-stereo granule with mismatched block types is off-scope")
          val isShort = gc0.wsf && gc0.blockType == 2
          val inv = 1.0 / math.sqrt(2.0)
          def msRange(lo: Int, hi: Int): Unit = {
            var i = lo
            while (i < hi) {
              val m = xrs(0)(i); val s = xrs(1)(i)
              xrs(0)(i) = (m + s) * inv
              xrs(1)(i) = (m - s) * inv
              i += 1
            }
          }
          // intensity applies to the bands at/above the RIGHT channel's
          // zero part; is_pos rides the right channel's scalefactor.
          // Long blocks test the line index against the granule-wide
          // zero-part start; short blocks test the band against the
          // PER-WINDOW bound (ISO 11172-3 derives the boundary per
          // window — round-15 advice fix: a right channel with content
          // in only one window no longer suppresses intensity in the
          // lower bands of the other two windows).
          val istart = if (intensityOn) nzEnd(1) else 576
          val ranges: Seq[(Int, Int, Int, Int)] =
            if (isShort)
              for (b <- 0 until 13; w <- 0 until 3) yield {
                val len = sfbS(b + 1) - sfbS(b)
                (3 * sfbS(b) + w * len, 3 * sfbS(b) + (w + 1) * len, b, w)
              }
            else (0 until 22).map(b => (sfbEdges(b), sfbEdges(b + 1), b, -1))
          ranges.foreach { case (lo, hi, b, w) =>
            val inIntensityRegion =
              if (isShort) intensityOn && b >= nzBandW(1)(w)
              else intensityOn && lo >= istart
            if (inIntensityRegion) {
              // the last band carries no scalefactor: ISO assigns it the
              // previous band's is_pos
              val isPos =
                if (isShort) sfShortCh(1)(math.min(b, 11))(w)
                else sfLongCh(1)(math.min(b, 20))
              if (isPos == 6) {
                // tan(6·π/12) = tan(π/2) is a pole: the limit of the
                // ratio split is an exact full-left hard pan — write
                // exact zeros right instead of riding Math.PI rounding
                // through a ~1.6e16 tan (round-15 advice fix)
                var i = lo
                while (i < hi) { xrs(1)(i) = 0.0; i += 1 }
              } else if (isPos != 7) {
                val ratio = math.tan(isPos * math.Pi / 12.0)
                var i = lo
                while (i < hi) {
                  val v = xrs(0)(i)
                  xrs(0)(i) = v * (ratio / (1.0 + ratio))
                  xrs(1)(i) = v * (1.0 / (1.0 + ratio))
                  i += 1
                }
              } else if (msOn) msRange(lo, hi)
              // is_pos = 7 without MS: illegal position — pass through
            } else if (msOn) msRange(lo, hi)
          }
        }

        // ---- per channel: reorder, alias, IMDCT, OLA, synthesis ----
        var ch2 = 0
        while (ch2 < nch) {
          val gc = gcs(grI)(ch2)
          val isShort = gc.wsf && gc.blockType == 2
          val xr =
            if (!isShort) xrs(ch2)
            else {
              // reorder short blocks from written [band][window][k] to
              // NATURAL order: window w's global coefficient j sits at
              // 3j + w, which the per-subband IMDCT-12 strides expect
              val nat = new Array[Double](576)
              var pos = 0
              var b = 0
              while (b < 13) {
                val len = sfbS(b + 1) - sfbS(b)
                var w = 0
                while (w < 3) {
                  var k = 0
                  while (k < len) {
                    nat(3 * (sfbS(b) + k) + w) = xrs(ch2)(pos)
                    pos += 1; k += 1
                  }
                  w += 1
                }
                b += 1
              }
              nat
            }
          if (!isShort) {
            // alias reduction between adjacent subbands (long transforms
            // only — pure short granules skip it per spec)
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
          }
          val prevHalf = prevHalves(ch2)
          val sOut = Array.ofDim[Double](32, 18)
          var sb = 0
          while (sb < 32) {
            val xk = new Array[Double](18)
            System.arraycopy(xr, sb * 18, xk, 0, 18)
            val tb =
              if (isShort) imdctShort(xk)
              else if (gc.wsf && gc.blockType == 1) imdctWin(xk, WinStart)
              else if (gc.wsf && gc.blockType == 3) imdctWin(xk, WinStop)
              else imdct(xk)
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
          val syn = synths(ch2)
          val pcm = chPcm(ch2)
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
          ch2 += 1
        }
        grI += 1
      }
      // gapless tag in the first frame's leading ancillary bytes
      if (frames == 0) {
        val ancRel = ((md.consumed + 7) / 8).toInt - frameMainStart
        val ancAt = p + ancRel
        if (ancAt + 6 <= at + frameLen && ancRel >= 0 &&
            bytes(ancAt) == 'G' && bytes(ancAt + 1) == 'L') {
          gaplessLen = ((bytes(ancAt + 2) & 0xffL) << 24) |
            ((bytes(ancAt + 3) & 0xffL) << 16) |
            ((bytes(ancAt + 4) & 0xffL) << 8) | (bytes(ancAt + 5) & 0xffL)
        }
      }
      frames += 1
      at += frameLen
      // trim the reservoir to the pointer's 511-byte reach
      if (res.length > 511)
        res = java.util.Arrays.copyOfRange(res, res.length - 511, res.length)
      }
    }
    require(frames > 0, "no MP3 frames decoded")
    val chRaw = chPcm.map(_.toByteArray)
    val total = chRaw(0).length / 2
    val want =
      if (gaplessLen >= 0) math.min(gaplessLen, (total - CodecDelay).toLong).toInt
      else total - math.min(total, CodecDelay)
    val n = math.max(0, want)
    val out = new Array[Float](n * channels)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < channels) {
        val o = (CodecDelay + i) * 2
        val raw = chRaw(c)
        out(i * channels + c) =
          ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort / 32768.0f
        c += 1
      }
      i += 1
    }
    (Info(sampleRate, frames, bitrateK, channels), out)
  }

  /** Per-granule-per-channel side info. */
  private final case class Gc(part23: Int, bigValues: Int, gg: Int,
    sfc: Int, wsf: Boolean, blockType: Int, tables: Array[Int],
    region0: Int, region1: Int, sbg: Array[Int], preflag: Int,
    sfScale: Int, c1A: Boolean)
}
