package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Mp3Codec, WavCodec}

/** The MP3 codec's contracts: the spec constants, filterbank
  * near-perfect-reconstruction, MDCT/overlap-add exactness, bitstream
  * layout (header/side-info fields read back), encode→decode round
  * trips with bounded error and exact gapless length, byte-level
  * determinism, the WavCodec magic dispatch (bare sync + ID3v2), and
  * the scope refusals. */
class Mp3CodecSpec extends AnyFunSuite {

  // ---------------------------------------------------------- constants
  test("spec constants: slen pairs, sfb edges, alias coefficients") {
    // scalefac_compress table: 16 published (slen1, slen2) pairs
    assert(Mp3Codec.Slen1.toSeq == Seq(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4))
    assert(Mp3Codec.Slen2.toSeq == Seq(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3))
    // long-block sfb tables: 23 ascending edges from 0 to 576, starting
    // with the 4-wide low bands every rate shares
    for (sr <- Seq(32000, 44100, 48000)) {
      val t = Mp3Codec.SfbLong(sr)
      assert(t.length == 23 && t.head == 0 && t.last == 576)
      assert(t.sliding(2).forall(p => p(1) > p(0)), s"$sr not ascending")
      assert(t.take(7).toSeq == Seq(0, 4, 8, 12, 16, 20, 24))
    }
    // alias-reduction butterflies: cs² + ca² = 1 and ca/cs = ci
    (0 until 8).foreach { k =>
      val s = Mp3Codec.Cs(k) * Mp3Codec.Cs(k) + Mp3Codec.Ca(k) * Mp3Codec.Ca(k)
      assert(math.abs(s - 1.0) < 1e-12)
      assert(math.abs(Mp3Codec.Ca(k) / Mp3Codec.Cs(k) - Mp3Codec.Ci(k)) < 1e-12)
    }
    // count1 table B: fixed 4-bit codes, one's complement of the quadruple
    (0 until 16).foreach(q => assert(Mp3Codec.count1BCode(q) == (~q & 0xF)))
    assert((0 until 16).map(Mp3Codec.count1BCode).distinct.length == 16)
    // big-values table 1: the four published codes, prefix-free
    val codes = for (x <- 0 to 1; y <- 0 to 1) yield Mp3Codec.Tab1(x)(y)
    assert(codes.toSet == Set((1, 1), (3, 1), (2, 1), (3, 0)))
    def bitstring(c: (Int, Int)) =
      (c._2.toBinaryString.reverse.padTo(c._1, '0')).reverse
    val strs = codes.map(bitstring)
    for (a <- strs; b <- strs if a != b) assert(!b.startsWith(a), s"$a prefixes $b")
  }

  test("MDCT window satisfies Princen-Bradley; MDCT→IMDCT+OLA reconstructs") {
    val w = Mp3Codec.MdctWin
    (0 until 18).foreach { i =>
      assert(math.abs(w(i) * w(i) + w(i + 18) * w(i + 18) - 1.0) < 1e-12)
    }
    // three consecutive 18-sample blocks through the lapped transform:
    // the middle block must come back exactly
    var s = 7L
    def blk(): Array[Double] = Array.fill(18) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 40).toDouble / (1L << 23).toDouble - 0.5
    }
    val (b0, b1, b2) = (blk(), blk(), blk())
    val x1 = Mp3Codec.mdct(b0 ++ b1)
    val x2 = Mp3Codec.mdct(b1 ++ b2)
    val t1 = Mp3Codec.imdct(x1)
    val t2 = Mp3Codec.imdct(x2)
    (0 until 18).foreach { i =>
      val rec = t1(18 + i) + t2(i)
      assert(math.abs(rec - b1(i)) < 1e-9, s"OLA sample $i: $rec vs ${b1(i)}")
    }
  }

  test("polyphase cascade is near-PR: unit DC gain, flat band, 481 delay") {
    // DC settles to 1.0 (the deterministic init-time calibration)
    val an = new Mp3Codec.Analysis
    val syn = new Mp3Codec.Synthesis(Mp3Codec.CascadeGain)
    val dc = (0 until 60).flatMap(_ => syn.step(an.step(Array.fill(32)(1.0))).toSeq)
    assert(dc.drop(1400).forall(v => math.abs(v - 1.0) < 0.02))
    // impulse peaks at the classic 481-sample cascade delay
    val an2 = new Mp3Codec.Analysis
    val syn2 = new Mp3Codec.Synthesis(Mp3Codec.CascadeGain)
    val imp = new Array[Double](2048); imp(0) = 1.0
    val out = imp.grouped(32).flatMap(sl => syn2.step(an2.step(sl.toArray)).toSeq).toArray
    assert(out.indices.maxBy(i => math.abs(out(i))) == 481)
    // mid-band sine survives at ≥30 dB (the window-design contract; the
    // quantizer, not the filterbank, bounds codec fidelity)
    for (freq <- Seq(440.0, 1200.0, 5250.0, 15250.0)) {
      val n = 8192
      val in = Array.tabulate(n)(i => math.sin(2 * math.Pi * freq * i / 32000.0))
      val a = new Mp3Codec.Analysis
      val sy = new Mp3Codec.Synthesis(Mp3Codec.CascadeGain)
      val got = in.grouped(32).flatMap(sl => sy.step(a.step(sl.toArray)).toSeq).toArray
      var se = 0.0; var sp = 0.0
      var i = 2048
      while (i < n - 481) {
        val e = got(i + 481) - in(i); se += e * e; sp += in(i) * in(i); i += 1
      }
      val snr = 10 * math.log10(sp / se)
      assert(snr > 30.0, s"$freq Hz cascade SNR $snr dB")
    }
  }

  // --------------------------------------------------------- round trip
  private def sine(freqHz: Double, rate: Int, n: Int,
                   amp: Double = 0.5): Array[Float] =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * freqHz * i / rate)).toFloat)

  test("encode→decode round-trips a sine: exact length, aligned, bounded") {
    val rate = 32000
    val pcm = sine(440.0, rate, 9000)
    val mp3 = Mp3Codec.encode(pcm, rate)
    val (info, got) = Mp3Codec.decode(mp3)
    assert(info.sampleRate == rate)
    assert(got.length == pcm.length, s"gapless trim: ${got.length} vs ${pcm.length}")
    // 1-bit magnitudes under per-band scalefactors: the tone must
    // SURVIVE (strong correlation at zero lag), with the quantizer's
    // honest error envelope
    var dot = 0.0; var na = 0.0; var nb = 0.0; var maxErr = 0.0
    pcm.indices.foreach { i =>
      dot += got(i).toDouble * pcm(i); na += pcm(i).toDouble * pcm(i)
      nb += got(i).toDouble * got(i)
      maxErr = math.max(maxErr, math.abs(got(i) - pcm(i)))
    }
    assert(dot / math.sqrt(na * nb) > 0.85, s"correlation ${dot / math.sqrt(na * nb)}")
    assert(maxErr < 0.5, s"round-trip error $maxErr")
  }

  test("all three MPEG-1 rates round-trip at exact length") {
    for (rate <- Seq(32000, 44100, 48000); len <- Seq(1, 575, 1152, 5000)) {
      val pcm = sine(700.0, rate, len, amp = 0.3)
      val (info, got) = Mp3Codec.decode(Mp3Codec.encode(pcm, rate))
      assert(info.sampleRate == rate && got.length == len,
        s"rate $rate len $len decoded ${got.length}")
    }
    intercept[IllegalArgumentException](Mp3Codec.encode(new Array[Float](100), 16000))
  }

  test("silence encodes through all-zero granules and decodes to silence") {
    val (info, got) = Mp3Codec.decode(Mp3Codec.encode(new Array[Float](3000), 48000))
    assert(got.length == 3000)
    assert(got.forall(v => math.abs(v) < 1e-3), s"max ${got.map(math.abs).max}")
    assert(info.bitrateKbps == 32) // nothing to code → smallest CBR fits
  }

  test("encode is deterministic: byte-identical across calls") {
    val pcm = sine(1234.5, 44100, 4000, amp = 0.4)
    assert(java.util.Arrays.equals(Mp3Codec.encode(pcm, 44100),
      Mp3Codec.encode(pcm, 44100)))
  }

  // ----------------------------------------------------------- dispatch
  test("WavCodec magic dispatch: bare sync and ID3v2-prefixed streams") {
    val pcm = sine(600.0, 32000, 3200)
    val mp3 = Mp3Codec.encode(pcm, 32000)
    val dec = WavCodec.decode(mp3)
    assert(dec.sampleRate == 32000 && dec.channels == 1 &&
      dec.samples.length == 3200)
    // ID3v2 prefix: "ID3" v2.3, 100-byte syncsafe body, then the frames
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 100) ++
      new Array[Byte](100) ++ mp3
    val dec2 = WavCodec.decode(id3)
    assert(dec2.samples.length == 3200)
    assert(java.util.Arrays.equals(dec2.samples, dec.samples),
      "ID3 prefix changed the audio")
  }

  test("CRC-protected frames decode (the 2 CRC bytes are skipped)") {
    val pcm = sine(500.0, 32000, 2500)
    val mp3 = Mp3Codec.encode(pcm, 32000)
    // rewrite each frame: clear protection bit, splice 2 bytes after the
    // header, drop 2 ancillary bytes at frame end (frame length is
    // bitrate-determined, so it must stay constant)
    val frameLen = {
      val brIdx = (mp3(2) >> 4) & 0xf
      144 * Mp3Codec.Bitrates(brIdx) * 1000 / 32000
    }
    val out = new java.io.ByteArrayOutputStream()
    var at = 0
    while (at < mp3.length) {
      val f = java.util.Arrays.copyOfRange(mp3, at, at + frameLen)
      f(1) = (f(1) & 0xfe).toByte // protection_bit = 0: CRC present
      out.write(f, 0, 4)
      out.write(0xBE); out.write(0xEF) // unverified CRC-16 placeholder
      out.write(f, 4, frameLen - 6)    // keep length: drop 2 pad bytes
      at += frameLen
    }
    val (info, got) = Mp3Codec.decode(out.toByteArray)
    assert(info.sampleRate == 32000 && got.length == 2500)
  }

  // ------------------------------------------ hand-packed frame shapes
  /** Build one mono 32 kHz frame from raw side-info fields + main bits —
    * the shapes the engine's own encoder never emits (big-values pairs,
    * straddling count1 quads, nonzero scfsi) so the decoder's handling
    * of OTHER encoders' conformant streams is pinned, not assumed. */
  private def handFrame(scfsi: Int, part23a: Int, bigValuesA: Int,
                        tables: Seq[Int], region0: Int, region1: Int,
                        mainBitsA: Seq[Int]): Array[Byte] = {
    val brIdx = 14 // 320 kbps at 32 kHz -> 1440-byte frame
    val w = new Mp3Codec.MsbWriter
    w.write(0x7FF, 11); w.write(3, 2); w.write(1, 2); w.write(1, 1)
    w.write(brIdx, 4); w.write(2, 2) // srIdx 2 = 32000
    w.write(0, 1); w.write(0, 1); w.write(3, 2)
    w.write(0, 2); w.write(0, 1); w.write(0, 1); w.write(0, 2)
    w.write(0, 9); w.write(0, 5); w.write(scfsi, 4)
    def granule(p23: Int, bv: Int): Unit = {
      w.write(p23, 12); w.write(bv, 9); w.write(210, 8); w.write(15, 4)
      w.write(0, 1)
      tables.foreach(t => w.write(t, 5))
      w.write(region0, 4); w.write(region1, 3)
      w.write(0, 1); w.write(0, 1); w.write(1, 1)
    }
    granule(part23a, bigValuesA)
    granule(74, 0) // granule 1: all-zero scalefactors, empty spectrum
    // main data: granule 0 = 74 scalefactor zeros + the caller's bits,
    // granule 1 = 74 zeros; bit-contiguous, zero ancillary fill
    (0 until 74).foreach(_ => w.write(0, 1))
    mainBitsA.foreach(b => w.write(b, 1))
    (0 until 74).foreach(_ => w.write(0, 1))
    val body = w.toBytes
    val frameLen = 144 * 320000 / 32000
    require(body.length <= frameLen, s"hand frame too big: ${body.length}")
    body ++ new Array[Byte](frameLen - body.length)
  }

  test("big-values regions decode with THEIR OWN table_select (hand frame)") {
    // two pairs, both inside region0 (region0_count=0 -> boundary at
    // sfb edge 1 = line 4): values (1,0)+ and (0,1)+ via table 1
    // codes: "01" x=1 sign 0, then "001" y=1 sign 0  -> 7 bits
    val bits = Seq(0, 1, 0, 0, 0, 1, 0)
    val frame = handFrame(scfsi = 0, part23a = 74 + bits.length,
      bigValuesA = 2, tables = Seq(1, 0, 0), region0 = 0, region1 = 0,
      mainBitsA = bits)
    val (info, pcm) = Mp3Codec.decode(frame)
    assert(info.frames == 1 && info.sampleRate == 32000)
    // nonzero spectrum must survive to the (delay-trimmed) tail output
    assert(pcm.exists(v => math.abs(v) > 1e-4), "big-values content lost")
    // an OFF-SCOPE table in a populated region refuses BY NUMBER...
    val e = intercept[IllegalArgumentException](Mp3Codec.decode(
      handFrame(0, 74 + bits.length, 2, Seq(24, 0, 0), 0, 0, bits)))
    assert(e.getMessage.contains("table 24"))
    // ...but an off-scope table in an EMPTY region is never consulted
    val (info2, _) = Mp3Codec.decode(
      handFrame(0, 74 + bits.length, 2, Seq(1, 24, 24), 0, 0, bits))
    assert(info2.frames == 1)
  }

  test("count1 quadruple straddling part2_3_length is discarded; alignment holds") {
    // part23 = 74 + 2: two bits of a quad ("11...") cross the boundary —
    // the decoder must discard it and start granule 1 at EXACTLY
    // start + part23, not at the overhang
    val frame = handFrame(scfsi = 0, part23a = 76, bigValuesA = 0,
      tables = Seq(0, 0, 0), region0 = 0, region1 = 0, mainBitsA = Seq(1, 1))
    val (info, pcm) = Mp3Codec.decode(frame)
    assert(info.frames == 1)
    assert(pcm.forall(v => math.abs(v) < 1e-3),
      "discarded straddle quad must leave silence")
  }

  test("straddling quad at the frame's LAST main-data byte decodes " +
       "(fit-check, no phantom truncation)") {
    // 32 kbps at 32 kHz -> 144-byte frame, 984 main-data bits; granule 1's
    // part2_3_length ends EXACTLY at the frame's final bit with a quad
    // whose sign bits would cross it. The overhang bits don't physically
    // exist — a read-then-discard decoder aborts this conformant stream;
    // the fit-check decoder discards without reading.
    val w = new Mp3Codec.MsbWriter
    w.write(0x7FF, 11); w.write(3, 2); w.write(1, 2); w.write(1, 1)
    w.write(1, 4); w.write(2, 2) // brIdx 1 = 32 kbps, srIdx 2 = 32 kHz
    w.write(0, 1); w.write(0, 1); w.write(3, 2)
    w.write(0, 2); w.write(0, 1); w.write(0, 1); w.write(0, 2)
    w.write(0, 9); w.write(0, 5); w.write(0, 4)
    val frameLen = 144 * 32000 / 32000
    val mainBits = (frameLen - 21) * 8 // 984
    def granule(p23: Int): Unit = {
      w.write(p23, 12); w.write(0, 9); w.write(210, 8); w.write(15, 4)
      w.write(0, 1); (0 until 3).foreach(_ => w.write(0, 5))
      w.write(0, 4); w.write(0, 3)
      w.write(0, 1); w.write(0, 1); w.write(1, 1)
    }
    granule(mainBits - 84); granule(84)
    (0 until mainBits - 84).foreach(_ => w.write(0, 1)) // g0: sf + count1, all zero
    (0 until 74).foreach(_ => w.write(0, 1))                 // g1 scalefactors
    // g1 count1: one all-zero-mag quad (1111), then a quad needing 8 bits
    // with only 6 left in part23 — and ZERO left in the frame
    Seq(1, 1, 1, 1, 0, 0, 0, 0, 0, 0).foreach(b => w.write(b, 1))
    val frame = w.toBytes
    assert(frame.length == frameLen, s"fixture is ${frame.length} bytes")
    val (info, _) = Mp3Codec.decode(frame)
    assert(info.frames == 1 && info.sampleRate == 32000)
  }

  test("oversized big_values refuses by name (hand frame)") {
    val e2 = intercept[IllegalArgumentException](Mp3Codec.decode(
      handFrame(scfsi = 0, part23a = 74, bigValuesA = 300,
        tables = Seq(1, 1, 1), region0 = 0, region1 = 0, mainBitsA = Nil)))
    assert(e2.getMessage.contains("big_values"))
  }

  test("scfsi reuse: granule 1 omits reused bands' bits and carries " +
       "granule 0's VALUES (hand-frame pair decodes identically)") {
    // sf bits for one granule at sfc=15: bands 0-10 4 bits, 11-20 3 bits
    // = 74; band 0 carries sf=5, the rest 0 — the reused value must
    // scale granule 1's quad, or the outputs diverge
    def sfBits(w: Mp3Codec.MsbWriter): Unit = {
      w.write(5, 4); (1 until 11).foreach(_ => w.write(0, 4))
      (11 until 21).foreach(_ => w.write(0, 3))
    }
    // one count1-B quad, all four mags 1, all signs + : "0000" + "0000"
    def quadBits(w: Mp3Codec.MsbWriter): Unit = w.write(0, 8)
    def frame(scfsi: Int, g1HasSf: Boolean): Array[Byte] = {
      val w = new Mp3Codec.MsbWriter
      w.write(0x7FF, 11); w.write(3, 2); w.write(1, 2); w.write(1, 1)
      w.write(14, 4); w.write(2, 2) // 320 kbps, 32 kHz
      w.write(0, 1); w.write(0, 1); w.write(3, 2)
      w.write(0, 2); w.write(0, 1); w.write(0, 1); w.write(0, 2)
      w.write(0, 9); w.write(0, 5); w.write(scfsi, 4)
      def granule(p23: Int): Unit = {
        w.write(p23, 12); w.write(0, 9); w.write(210, 8); w.write(15, 4)
        w.write(0, 1); (0 until 3).foreach(_ => w.write(0, 5))
        w.write(0, 4); w.write(0, 3)
        w.write(0, 1); w.write(0, 1); w.write(1, 1)
      }
      granule(74)                            // g0: sfs only, silence
      granule((if (g1HasSf) 74 else 0) + 8)  // g1: [sfs +] one quad
      sfBits(w)                              // g0 main
      if (g1HasSf) sfBits(w)                 // g1 explicit sfs
      quadBits(w)
      val body = w.toBytes
      val frameLen = 144 * 320000 / 32000
      body ++ new Array[Byte](frameLen - body.length)
    }
    val (iA, a) = Mp3Codec.decode(frame(scfsi = 0, g1HasSf = true))
    val (iB, b) = Mp3Codec.decode(frame(scfsi = 15, g1HasSf = false))
    assert(iA.frames == 1 && iB.frames == 1)
    assert(a.exists(v => math.abs(v) > 1e-5), "quad content lost")
    assert(java.util.Arrays.equals(a, b),
      "scfsi-reused scalefactors must reproduce the explicit decode")
  }

  test("trailing ID3v1 tag ('TAG' + 125 bytes) is tolerated, not a lost sync") {
    val pcm = sine(650.0, 32000, 3000)
    val mp3 = Mp3Codec.encode(pcm, 32000)
    val tagged = mp3 ++ ("TAG".getBytes("ASCII") ++ new Array[Byte](125))
    val (info, got) = Mp3Codec.decode(tagged)
    assert(got.length == 3000)
    val (_, ref) = Mp3Codec.decode(mp3)
    assert(java.util.Arrays.equals(got, ref), "trailer changed the audio")
    // anything else after the frames still refuses loudly
    val e = intercept[IllegalArgumentException](
      Mp3Codec.decode(mp3 ++ Array[Byte](1, 2, 3, 4, 5)))
    assert(e.getMessage.contains("sync"))
  }

  // ----------------------------------------------------------- refusals
  test("scope refusals are loud and name the field") {
    val mp3 = Mp3Codec.encode(sine(400.0, 44100, 2000), 44100)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = mp3.clone(); f(c); c
    }
    // layer I (bits 11)
    val e1 = intercept[IllegalArgumentException](Mp3Codec.decode(
      mut(c => c(1) = ((c(1) & ~0x06) | 0x06).toByte)))
    assert(e1.getMessage.contains("layer"))
    // MPEG-2.5 (version bits 00) refuses with grounds; MPEG-2 (bits 10)
    // now DECODES (the round-14 LSF profile), so the mutation targets 00
    val e2 = intercept[IllegalArgumentException](Mp3Codec.decode(
      mut(c => c(1) = (c(1) & ~0x18).toByte)))
    assert(e2.getMessage.contains("MPEG-2.5"))
    // free-format bitrate
    val e3 = intercept[IllegalArgumentException](Mp3Codec.decode(
      mut(c => c(2) = (c(2) & 0x0f).toByte)))
    assert(e3.getMessage.contains("bitrate"))
    // truncation mid-frame
    val e5 = intercept[IllegalArgumentException](
      Mp3Codec.decode(mp3.take(mp3.length - 30)))
    assert(e5.getMessage.contains("truncated"))
    // garbage after a valid prefix: lost sync refuses by position
    val e6 = intercept[IllegalArgumentException](
      Mp3Codec.decode(mp3 ++ Array[Byte](1, 2, 3, 4, 5)))
    assert(e6.getMessage.contains("sync"))
    // an ID3 tag that swallows the file
    val e7 = intercept[IllegalArgumentException](Mp3Codec.decode(
      Array[Byte]('I', 'D', '3', 4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f) ++
        new Array[Byte](4)))
    assert(e7.getMessage != null)
  }
}
