package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Mp3Codec
import graft.io.Mp3Codec.EncOpts

/** The round-14 general MP3 profile: structural validation of the
  * restated ISO Huffman tables (complete prefix codes), short-block
  * MDCT perfect reconstruction, encode→decode round trips across every
  * new surface (stereo modes, window switching, big-values tables 2/3,
  * count1 table A, scalefac_scale), and hand-packed conformant frames
  * for the decode-only surfaces our encoder never emits (bit reservoir,
  * preflag, intensity stereo). */
class Mp3GeneralSpec extends AnyFunSuite {

  // ----------------------------------------------------- table structure
  private def checkComplete(name: String, codes: Seq[(Int, Int)]): Unit = {
    val kraft = codes.map { case (l, _) => math.pow(2.0, -l) }.sum
    assert(math.abs(kraft - 1.0) < 1e-12, s"$name Kraft sum $kraft")
    def bits(c: (Int, Int)) =
      c._2.toBinaryString.reverse.padTo(c._1, '0').reverse
    val strs = codes.map(bits)
    assert(strs.distinct.length == strs.length, s"$name duplicate codes")
    for (a <- strs; b <- strs if a != b)
      assert(!b.startsWith(a), s"$name: $a prefixes $b")
  }

  test("tables 2, 3 and count1 A are COMPLETE prefix codes (Kraft = 1)") {
    checkComplete("tab2",
      for (x <- 0 to 2; y <- 0 to 2) yield Mp3Codec.Tab2(x)(y))
    checkComplete("tab3",
      for (x <- 0 to 2; y <- 0 to 2) yield Mp3Codec.Tab3(x)(y))
    checkComplete("count1A", Mp3Codec.Count1A.toSeq)
  }

  test("short-block spec constants: sfb edges ascend 0→192, pretab shape") {
    for (sr <- Seq(32000, 44100, 48000)) {
      val t = Mp3Codec.SfbShort(sr)
      assert(t.length == 14 && t.head == 0 && t.last == 192)
      assert(t.sliding(2).forall(p => p(1) > p(0)), s"$sr not ascending")
      assert(t.take(5).toSeq == Seq(0, 4, 8, 12, 16))
    }
    assert(Mp3Codec.Pretab.length == 22)
    assert(Mp3Codec.Pretab.take(11).forall(_ == 0))
    assert(Mp3Codec.Pretab(21) == 0)
    assert(Mp3Codec.Pretab.max == 3)
  }

  test("12-point MDCT window satisfies Princen-Bradley; MDCT12→IMDCT12 chain") {
    val w = Mp3Codec.WinShort
    (0 until 6).foreach { i =>
      assert(math.abs(w(i) * w(i) + w(i + 6) * w(i + 6) - 1.0) < 1e-12)
    }
    // three overlapping 6-sample hops through the lapped 12-transform:
    // the middle hop must reconstruct
    var s = 11L
    def blk(): Array[Double] = Array.fill(6) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 40).toDouble / (1L << 23).toDouble - 0.5
    }
    val (b0, b1, b2) = (blk(), blk(), blk())
    val t1 = Mp3Codec.imdct12(Mp3Codec.mdct12(b0 ++ b1))
    val t2 = Mp3Codec.imdct12(Mp3Codec.mdct12(b1 ++ b2))
    (0 until 6).foreach { i =>
      val rec = t1(6 + i) + t2(i)
      assert(math.abs(rec - b1(i)) < 1e-9, s"OLA sample $i: $rec vs ${b1(i)}")
    }
  }

  test("start/stop windows splice against long and short (PB at every seam)") {
    val L = Mp3Codec.MdctWin; val St = Mp3Codec.WinStart
    val Sp = Mp3Codec.WinStop; val Sh = Mp3Codec.WinShort
    // long tail + start head
    (0 until 18).foreach(t =>
      assert(math.abs(L(18 + t) * L(18 + t) + St(t) * St(t) - 1.0) < 1e-12))
    // start tail (short fall at 24-29) + first short window's rise
    (0 until 6).foreach(t =>
      assert(math.abs(St(24 + t) * St(24 + t) + Sh(t) * Sh(t) - 1.0) < 1e-12))
    // last short window's fall + stop rise at 6-11
    (0 until 6).foreach(t =>
      assert(math.abs(Sh(6 + t) * Sh(6 + t) + Sp(6 + t) * Sp(6 + t) - 1.0) < 1e-12))
    // stop tail + long head
    (0 until 18).foreach(t =>
      assert(math.abs(Sp(18 + t) * Sp(18 + t) + L(t) * L(t) - 1.0) < 1e-12))
  }

  // ------------------------------------------------------- round trips
  private def sine(freqHz: Double, rate: Int, n: Int,
                   amp: Double = 0.4, phase: Double = 0.0): Array[Float] =
    Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * freqHz * i / rate + phase)).toFloat)

  private def corr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    dot / math.sqrt(na * nb + 1e-30)
  }

  private def deinterleave(x: Array[Float], nch: Int): Array[Array[Float]] =
    Array.tabulate(nch)(c =>
      Array.tabulate(x.length / nch)(i => x(i * nch + c)))

  private def roundTrip(opts: EncOpts, rate: Int = 32000, n: Int = 6000,
                        minCorr: Double = 0.85): Unit = {
    val nch = if (opts.stereoMode == 3) 1 else 2
    val chans = (0 until nch).map(c =>
      sine(440.0 * (c + 1), rate, n, phase = 0.3 * c))
    val mp3 = Mp3Codec.encodeEx(chans, rate, opts)
    val (info, got) = Mp3Codec.decode(mp3)
    assert(info.sampleRate == rate && info.channels == nch)
    assert(got.length == n * nch,
      s"$opts: got ${got.length} samples, want ${n * nch}")
    val chGot = deinterleave(got, nch)
    (0 until nch).foreach { c =>
      val cc = corr(chGot(c), chans(c))
      assert(cc > minCorr, s"$opts channel $c correlation $cc")
    }
  }

  test("L/R stereo round-trips per channel") {
    roundTrip(EncOpts(stereoMode = 0))
  }

  test("M/S joint stereo round-trips per channel (decoder undoes the rotation)") {
    roundTrip(EncOpts(stereoMode = 1))
  }

  test("dual-channel round-trips per channel") {
    roundTrip(EncOpts(stereoMode = 2))
  }

  test("correlated program through M/S beats nothing lost: mid carries it") {
    // L == R: the side channel is silent; round trip must still be clean
    val rate = 32000; val n = 5000
    val l = sine(700.0, rate, n)
    val mp3 = Mp3Codec.encodeEx(Seq(l, l.clone()), rate, EncOpts(stereoMode = 1))
    val (info, got) = Mp3Codec.decode(mp3)
    assert(info.channels == 2)
    val ch = deinterleave(got, 2)
    assert(corr(ch(0), l) > 0.9 && corr(ch(1), l) > 0.9)
    // and the two outputs agree with each other sample-for-sample
    val diff = ch(0).zip(ch(1)).map { case (a, b) => math.abs(a - b) }.max
    assert(diff < 0.05, s"L/R diverged by $diff on a mid-only program")
  }

  test("short-block window switching (long→start→short→short→stop) round-trips") {
    roundTrip(EncOpts(shortBlocks = true), minCorr = 0.8)
  }

  test("2-bit magnitudes through big-values tables 2/3 round-trip " +
       "(and beat the 1-bit profile on a two-tone program)") {
    val rate = 32000; val n = 6000
    val pcm = Array.tabulate(n)(i =>
      (0.35 * math.sin(2 * math.Pi * 440.0 * i / rate) +
       0.15 * math.sin(2 * math.Pi * 1310.0 * i / rate)).toFloat)
    val one = Mp3Codec.decode(Mp3Codec.encodeEx(Seq(pcm), rate, EncOpts()))._2
    val two = Mp3Codec.decode(
      Mp3Codec.encodeEx(Seq(pcm), rate, EncOpts(maxMag = 2)))._2
    assert(two.length == n && one.length == n)
    val c1 = corr(one, pcm); val c2 = corr(two, pcm)
    assert(c2 > 0.9, s"maxMag=2 correlation $c2")
    assert(c2 >= c1 - 0.02, s"2-bit ($c2) should not lose to 1-bit ($c1)")
  }

  test("count1 table A round-trips (variable-length quads, same audio)") {
    val rate = 32000; val n = 5000
    val pcm = sine(550.0, rate, n)
    val viaB = Mp3Codec.decode(Mp3Codec.encodeEx(Seq(pcm), rate, EncOpts()))._2
    val viaA = Mp3Codec.decode(
      Mp3Codec.encodeEx(Seq(pcm), rate, EncOpts(count1TableA = true)))._2
    assert(viaA.length == n)
    assert(corr(viaA, pcm) > 0.8)
    // identical quantization decisions → identical audio, different bits
    assert(java.util.Arrays.equals(viaA, viaB),
      "table A and table B carry the same quadruples")
  }

  test("scalefac_scale = 1 (coarser 2^sf ladder) round-trips") {
    roundTrip(EncOpts(scalefacScale = 1), minCorr = 0.8)
  }

  test("stereo + short blocks + tables 2/3 compose") {
    roundTrip(EncOpts(stereoMode = 0, maxMag = 2, shortBlocks = true),
      minCorr = 0.75)
  }

  // ------------------------------------------ hand-packed decode shapes
  /** Mono 32 kHz 320 kbps frame from explicit per-granule fields. */
  private def monoFrame(mdb: Int, preflag: Seq[Int], sfBand11: Seq[Int],
                        granuleBits: Seq[Seq[Int]],
                        mainOverride: Option[Array[Byte]] = None,
                        frameBr: Int = 14): Array[Byte] = {
    val w = new Mp3Codec.MsbWriter
    w.write(0x7FF, 11); w.write(3, 2); w.write(1, 2); w.write(1, 1)
    w.write(frameBr, 4); w.write(2, 2)
    w.write(0, 1); w.write(0, 1); w.write(3, 2)
    w.write(0, 2); w.write(0, 1); w.write(0, 1); w.write(0, 2)
    w.write(mdb, 9); w.write(0, 5); w.write(0, 4)
    granuleBits.zipWithIndex.foreach { case (bits, g) =>
      w.write(74 + bits.length, 12); w.write(0, 9); w.write(210, 8)
      w.write(15, 4)
      w.write(0, 1); (0 until 3).foreach(_ => w.write(0, 5))
      w.write(0, 4); w.write(0, 3)
      w.write(preflag(g), 1); w.write(0, 1); w.write(1, 1)
    }
    val main = mainOverride.getOrElse {
      val m = new Mp3Codec.MsbWriter
      granuleBits.zipWithIndex.foreach { case (bits, g) =>
        // scalefactors: band 11 carries the caller's value, others 0
        (0 until 11).foreach(_ => m.write(0, 4))
        m.write(sfBand11(g), 3)
        (12 until 21).foreach(_ => m.write(0, 3))
        bits.foreach(b => m.write(b, 1))
      }
      m.toBytes
    }
    val frameLen = 144 * Mp3Codec.Bitrates(frameBr) * 1000 / 32000
    val body = w.toBytes ++ main
    require(body.length <= frameLen, s"hand frame ${body.length} > $frameLen")
    body ++ new Array[Byte](frameLen - body.length)
  }

  test("preflag adds the pretab: sf=2 plain equals sf=1 + pretab(11)=1") {
    // 17 all-zero quads walk count1 to line 64; quad 17 puts ±1 at lines
    // 66-67 inside band 11 (32 kHz long edges 66..82)
    val quadZeros = Seq.fill(16)(Seq(1, 1, 1, 1)).flatten
    val lastQuad = Seq(0, 0, 1, 1) ++ Seq(0, 0) // mags 0011, signs ++
    val bits = quadZeros ++ lastQuad
    val plain = Mp3Codec.decode(monoFrame(0, Seq(0, 0), Seq(2, 0),
      Seq(bits, Nil)))._2
    val pre = Mp3Codec.decode(monoFrame(0, Seq(1, 0), Seq(1, 0),
      Seq(bits, Nil)))._2
    assert(plain.exists(v => math.abs(v) > 1e-5), "band-11 content lost")
    assert(java.util.Arrays.equals(plain, pre),
      "preflag + pretab must equal the explicit scalefactor")
  }

  test("bit reservoir: main_data_begin > 0 reads back into the previous " +
       "frame's ancillary space; equals the reservoir-free stream") {
    // identical granule content packed two ways. 32 kbps at 32 kHz →
    // 144-byte frames, 123 main bytes each.
    val quad = Seq(0, 0, 1, 1) ++ Seq(0, 0) // one quad, lines 2-3 = +1
    def granuleMainBits(bits: Seq[Int]): Seq[Int] = {
      val sf = Seq.fill(44)(0) ++ Seq.fill(30)(0) // 74 zero sf bits
      sf ++ bits
    }
    val g = granuleMainBits(quad) // 80 bits per granule
    // reservoir-free: each frame carries its own two granules
    def packBits(allBits: Seq[Int]): Array[Byte] = {
      val m = new Mp3Codec.MsbWriter
      allBits.foreach(b => m.write(b, 1))
      m.toBytes
    }
    val f0Plain = monoFrame(0, Seq(0, 0), Seq(0, 0), Seq(quad, quad),
      Some(packBits(g ++ g).padTo(123, 0.toByte)), frameBr = 1)
    val f1Plain = monoFrame(0, Seq(0, 0), Seq(0, 0), Seq(quad, quad),
      Some(packBits(g ++ g).padTo(123, 0.toByte)), frameBr = 1)
    val (iP, plain) = Mp3Codec.decode(f0Plain ++ f1Plain)
    assert(iP.frames == 2)
    // reservoir form: frame 1's granules start 10 bytes BEFORE its main
    // region — the last 10 bytes of frame 0's main space
    val f1Bits = g ++ g // 160 bits = 20 bytes
    val f1Bytes = packBits(f1Bits)
    val f0Main = (packBits(g ++ g) ++
      new Array[Byte](123 - 20 - 10) ++ f1Bytes.take(10))
    assert(f0Main.length == 123)
    val f1Main = (f1Bytes.drop(10) ++ new Array[Byte](113)).take(123)
    val f0 = monoFrame(0, Seq(0, 0), Seq(0, 0), Seq(quad, quad),
      Some(f0Main), frameBr = 1)
    val f1 = monoFrame(10, Seq(0, 0), Seq(0, 0), Seq(quad, quad),
      Some(f1Main), frameBr = 1)
    val (iR, viaRes) = Mp3Codec.decode(f0 ++ f1)
    assert(iR.frames == 2)
    assert(plain.exists(v => math.abs(v) > 1e-5), "quad content lost")
    assert(java.util.Arrays.equals(plain, viaRes),
      "reservoir-packed stream must decode identically")
    // underrun refuses loudly
    val e = intercept[IllegalArgumentException](Mp3Codec.decode(f1))
    assert(e.getMessage.contains("reservoir"))
  }

  test("intensity stereo: is_pos positions the image; is_pos=6 hard-pans left") {
    // joint stereo, mode_extension = 01 (intensity only). The right
    // channel codes NOTHING (empty spectrum) so the intensity region
    // starts at line 0; its scalefactors carry is_pos per band.
    def jointFrame(isPos: Int): Array[Byte] = {
      val w = new Mp3Codec.MsbWriter
      w.write(0x7FF, 11); w.write(3, 2); w.write(1, 2); w.write(1, 1)
      w.write(14, 4); w.write(2, 2)
      w.write(0, 1); w.write(0, 1)
      w.write(1, 2) // mode: joint stereo
      w.write(1, 2) // mode_extension: intensity on, M/S off
      w.write(0, 1); w.write(0, 1); w.write(0, 2)
      w.write(0, 9); w.write(0, 3)
      w.write(0, 4); w.write(0, 4) // scfsi both channels
      val quadBitsLen = 8 // one quad "0000" + 4 sign bits? no: mags 0011 → 6
      def granule(ch: Int, g: Int): Unit = {
        // ch0 g0 carries one quad (lines 2-3 = +1): 74 sf + 6 bits
        val p23 = if (ch == 0 && g == 0) 80 else 74
        w.write(p23, 12); w.write(0, 9); w.write(210, 8); w.write(15, 4)
        w.write(0, 1); (0 until 3).foreach(_ => w.write(0, 5))
        w.write(0, 4); w.write(0, 3)
        w.write(0, 1); w.write(0, 1); w.write(1, 1)
      }
      granule(0, 0); granule(1, 0); granule(0, 1); granule(1, 1)
      def sfs(v: Int): Unit = {
        (0 until 11).foreach(_ => w.write(v, 4))
        (11 until 21).foreach(_ => w.write(math.min(v, 7), 3))
      }
      // g0 ch0: zero sfs + quad (mags 0011, signs ++)
      sfs(0); Seq(0, 0, 1, 1, 0, 0).foreach(b => w.write(b, 1))
      // g0 ch1: is_pos in every band, no spectrum
      sfs(isPos)
      // g1 both channels: zero sfs, empty
      sfs(0); sfs(0)
      val body = w.toBytes
      val frameLen = 144 * 320000 / 32000
      body ++ new Array[Byte](frameLen - body.length)
    }
    // is_pos = 3: tan(π/4) = 1 → equal split
    val (i3, eq) = Mp3Codec.decode(jointFrame(3))
    assert(i3.channels == 2)
    val ch = deinterleave(eq, 2)
    assert(ch(0).exists(v => math.abs(v) > 1e-5), "intensity content lost")
    val dmax = ch(0).zip(ch(1)).map { case (a, b) => math.abs(a - b) }.max
    assert(dmax < 1e-4, s"is_pos=3 must split equally, diverged $dmax")
    // is_pos = 6: tan(π/2) → all left
    val (_, hard) = Mp3Codec.decode(jointFrame(6))
    val ch6 = deinterleave(hard, 2)
    val lPow = ch6(0).map(v => v * v).sum
    val rPow = ch6(1).map(v => v * v).sum
    assert(lPow > 1e-6 && rPow < lPow * 1e-6,
      s"is_pos=6 must hard-pan left (L $lPow vs R $rPow)")
  }

  test("intensity bound is trailing-zero based: zero-mag quads inside the " +
       "right channel's coded span do not push the boundary up") {
    // two frames differing only in the RIGHT channel's part2_3_length:
    // one codes nothing, the other codes two all-zero count1-B quads
    // ("1111" twice — li advances to 8, values all zero). ISO puts the
    // intensity region at/above the highest NONZERO line, so both must
    // decode identically; a Huffman-end bound would skip bands 0-7.
    def jointFrame(rightZeroQuads: Int): Array[Byte] = {
      val w = new Mp3Codec.MsbWriter
      w.write(0x7FF, 11); w.write(3, 2); w.write(1, 2); w.write(1, 1)
      w.write(14, 4); w.write(2, 2)
      w.write(0, 1); w.write(0, 1)
      w.write(1, 2) // joint stereo
      w.write(1, 2) // intensity on, M/S off
      w.write(0, 1); w.write(0, 1); w.write(0, 2)
      w.write(0, 9); w.write(0, 3)
      w.write(0, 4); w.write(0, 4)
      def granule(p23: Int): Unit = {
        w.write(p23, 12); w.write(0, 9); w.write(210, 8); w.write(15, 4)
        w.write(0, 1); (0 until 3).foreach(_ => w.write(0, 5))
        w.write(0, 4); w.write(0, 3)
        w.write(0, 1); w.write(0, 1); w.write(1, 1)
      }
      granule(80); granule(74 + 4 * rightZeroQuads) // g0 ch0, ch1
      granule(74); granule(74)                      // g1 empty
      def sfs(v: Int): Unit = {
        (0 until 11).foreach(_ => w.write(v, 4))
        (11 until 21).foreach(_ => w.write(math.min(v, 7), 3))
      }
      sfs(0); Seq(0, 0, 1, 1, 0, 0).foreach(b => w.write(b, 1)) // ch0: one quad
      sfs(3); (0 until rightZeroQuads).foreach(_ => w.write(0xF, 4)) // ch1
      sfs(0); sfs(0)
      val body = w.toBytes
      val frameLen = 144 * 320000 / 32000
      body ++ new Array[Byte](frameLen - body.length)
    }
    val (_, a) = Mp3Codec.decode(jointFrame(0))
    val (_, b) = Mp3Codec.decode(jointFrame(2))
    assert(a.exists(v => math.abs(v) > 1e-5))
    assert(java.util.Arrays.equals(a, b),
      "zero-valued coded lines must not move the intensity boundary")
  }

  test("short-block intensity bound is PER WINDOW: right content in window 2 " +
       "must not suppress intensity in windows 0/1 (ISO 11172-3)") {
    // g0 both channels SHORT. Left codes ±1 at lines 0-7 (band 0, windows
    // 0 and 1); right codes lines 8-11 (band 0, window 2 ONLY) in frame A
    // and nothing in frame B. is_pos = 3 in every right-channel band
    // (tan(π/4) = 1 → exact equal split). A granule-wide bound would see
    // the right channel's nzEnd at line 12 and skip intensity for windows
    // 0/1 of band 0; the per-window bound applies it there and leaves
    // window 2 untouched — so the LEFT output of A and B must be
    // bit-identical, while A's right keeps its own window-2 content.
    def jointShortFrame(rightHasWin2: Boolean): Array[Byte] = {
      val w = new Mp3Codec.MsbWriter
      w.write(0x7FF, 11); w.write(3, 2); w.write(1, 2); w.write(1, 1)
      w.write(14, 4); w.write(2, 2) // 320 kbps, 32 kHz
      w.write(0, 1); w.write(0, 1)
      w.write(1, 2) // mode: joint stereo
      w.write(1, 2) // mode_extension: intensity on, M/S off
      w.write(0, 1); w.write(0, 1); w.write(0, 2)
      w.write(0, 9); w.write(0, 3) // main_data_begin, private bits
      w.write(0, 4); w.write(0, 4) // scfsi (must be 0 with short blocks)
      def shortGranule(p23: Int, sfc: Int): Unit = {
        w.write(p23, 12); w.write(0, 9); w.write(210, 8); w.write(sfc, 4)
        w.write(1, 1) // window_switching_flag
        w.write(2, 2) // block_type 2 (short)
        w.write(0, 1) // mixed off
        w.write(0, 5); w.write(0, 5)                // table_select ×2
        w.write(0, 3); w.write(0, 3); w.write(0, 3) // subblock_gain
        w.write(0, 1); w.write(0, 1); w.write(1, 1) // preflag, sfscale, count1 B
      }
      def longGranule(p23: Int): Unit = {
        w.write(p23, 12); w.write(0, 9); w.write(210, 8); w.write(0, 4)
        w.write(0, 1) // wsf = 0: long block
        w.write(0, 5); w.write(0, 5); w.write(0, 5)
        w.write(0, 4); w.write(0, 3)
        w.write(0, 1); w.write(0, 1); w.write(1, 1)
      }
      shortGranule(16, 0)                               // g0 ch0
      shortGranule(126 + (if (rightHasWin2) 16 else 0), 15) // g0 ch1
      longGranule(0); longGranule(0)                    // g1 empty
      // main data — g0 ch0: no scalefactors (sfc 0 → slen 0/0), two
      // count1-B quads (code 0x0 → mags 1111, four '+' signs each)
      (0 until 2).foreach { _ => w.write(0x0, 4); w.write(0, 4) }
      // g0 ch1: is_pos = 3 in all 12 band triples (4-bit low, 3-bit high)
      (0 until 6).foreach(_ => (0 until 3).foreach(_ => w.write(3, 4)))
      (6 until 12).foreach(_ => (0 until 3).foreach(_ => w.write(3, 3)))
      if (rightHasWin2) {
        w.write(0xF, 4); w.write(0xF, 4) // lines 0-7: zero quads
        w.write(0x0, 4); w.write(0, 4)   // lines 8-11: band 0 window 2
      }
      val body = w.toBytes
      val frameLen = 144 * 320000 / 32000
      body ++ new Array[Byte](frameLen - body.length)
    }
    val (ia, a) = Mp3Codec.decode(jointShortFrame(true))
    val (_, b) = Mp3Codec.decode(jointShortFrame(false))
    assert(ia.channels == 2)
    val chA = deinterleave(a, 2); val chB = deinterleave(b, 2)
    assert(chA(0).exists(v => math.abs(v) > 1e-5), "left content lost")
    assert(java.util.Arrays.equals(chA(0), chB(0)),
      "window-2-only right content must not change the LEFT intensity " +
        "result in windows 0/1 (granule-wide bound regression)")
    val extra = chA(1).zip(chB(1)).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(extra > 1e-9, "right channel must keep its own window-2 content")
    assert(chB(1).map(v => v * v).sum > 1e-9,
      "intensity must map left content into the right channel")
  }

  // ------------------------------------------------------ MPEG-2 LSF
  test("LSF spec constants: sfb tables, slen derivation, bitrates") {
    for (sr <- Seq(16000, 22050, 24000)) {
      val t = Mp3Codec.SfbLong(sr)
      assert(t.length == 23 && t.head == 0 && t.last == 576)
      assert(t.sliding(2).forall(p => p(1) > p(0)), s"$sr not ascending")
      assert(t.take(7).toSeq == Seq(0, 6, 12, 18, 24, 30, 36)) // 6-wide lows
    }
    // the encoder's sfc=399: slens (4,4,3,3) over (6,5,5,5), preflag 0 —
    // the same per-band widths as MPEG-1's sfc=15
    val (slens, groups, pre) = Mp3Codec.lsfSlens(399)
    assert(slens.toSeq == Seq(4, 4, 3, 3) && groups.toSeq == Seq(6, 5, 5, 5)
      && pre == 0)
    assert(groups.sum == 21)
    // the ≥500 branch implies preflag and covers 21 bands in two groups
    val (_, g500, p500) = Mp3Codec.lsfSlens(503)
    assert(p500 == 1 && g500.sum == 21)
    val (_, g400, p400) = Mp3Codec.lsfSlens(450)
    assert(p400 == 0 && g400.sum == 21)
    assert(Mp3Codec.BitratesLsf(1) == 8 && Mp3Codec.BitratesLsf(14) == 160)
  }

  test("MPEG-2 LSF mono round-trips at all three rates (one granule/frame)") {
    for (rate <- Seq(16000, 22050, 24000)) {
      val pcm = sine(300.0, rate, 4000)
      val mp3 = Mp3Codec.encodeEx(Seq(pcm), rate, EncOpts())
      val (info, got) = Mp3Codec.decode(mp3)
      assert(info.sampleRate == rate && info.channels == 1)
      assert(got.length == 4000, s"$rate: got ${got.length}")
      assert(corr(got, pcm) > 0.8, s"$rate correlation ${corr(got, pcm)}")
    }
  }

  test("LSF M/S stereo and count1-A compose; WavCodec dispatches .mp3 LSF") {
    val rate = 16000; val n = 4000
    val l = sine(250.0, rate, n); val r = sine(410.0, rate, n, phase = 0.7)
    val mp3 = Mp3Codec.encodeEx(Seq(l, r), rate,
      EncOpts(stereoMode = 1, count1TableA = true))
    val dec = graft.io.WavCodec.decode(mp3)
    assert(dec.sampleRate == rate && dec.channels == 2)
    val ch = deinterleave(dec.samples, 2)
    assert(corr(ch(0), l) > 0.8 && corr(ch(1), r) > 0.8)
  }

  test("MPEG-2.5 refuses by name with grounds; LSF short blocks refuse") {
    val mp3 = Mp3Codec.encodeEx(Seq(sine(300.0, 16000, 2000)), 16000, EncOpts())
    // flip version bits 10 → 00 (MPEG-2.5)
    val c = mp3.clone(); c(1) = (c(1) & ~0x10).toByte
    val e = intercept[IllegalArgumentException](Mp3Codec.decode(c))
    assert(e.getMessage.contains("MPEG-2.5"))
    val e2 = intercept[IllegalArgumentException](
      Mp3Codec.encodeEx(Seq(sine(300.0, 16000, 2000)), 16000,
        EncOpts(shortBlocks = true)))
    assert(e2.getMessage.contains("LSF"))
  }

  test("mixed_block_flag keeps refusing by name") {
    val e1 = intercept[IllegalArgumentException] {
      // wsf=1, block_type 2, mixed=1 in a hand frame
      val w = new Mp3Codec.MsbWriter
      w.write(0x7FF, 11); w.write(3, 2); w.write(1, 2); w.write(1, 1)
      w.write(14, 4); w.write(2, 2)
      w.write(0, 1); w.write(0, 1); w.write(3, 2)
      w.write(0, 2); w.write(0, 1); w.write(0, 1); w.write(0, 2)
      w.write(0, 9); w.write(0, 5); w.write(0, 4)
      def granule(): Unit = {
        w.write(200, 12); w.write(0, 9); w.write(210, 8); w.write(15, 4)
        w.write(1, 1)       // window_switching_flag
        w.write(2, 2)       // block_type: short
        w.write(1, 1)       // mixed_block_flag
        w.write(0, 5); w.write(0, 5)
        w.write(0, 3); w.write(0, 3); w.write(0, 3)
        w.write(0, 1); w.write(0, 1); w.write(1, 1)
      }
      granule(); granule()
      val frameLen = 144 * 320000 / 32000
      Mp3Codec.decode(w.toBytes ++ new Array[Byte](frameLen - w.toBytes.length))
    }
    assert(e1.getMessage.contains("mixed_block_flag"))
  }

  // --------------------------------------------- refusal conformance census
  // The decode boundary's regression guard (round-15 verdict item 5): the
  // general profile shares code paths with every refusing surface, so each
  // named refusal is pinned by a fixture DECLARING that table/mode. A future
  // change that silently routes a refused shape through the wrong decoder
  // breaks these before it breaks found data.

  test("refusal census: every refused big-values table (4-15, ESC 16-31) " +
       "names its number") {
    // mono MPEG-1 frame whose first granule declares `tbl` for region 0
    // with big_values > 0 — decode must refuse at the table dispatch,
    // BEFORE consuming any codeword bits
    def frameDeclaringTable(tbl: Int): Array[Byte] = {
      val w = new Mp3Codec.MsbWriter
      w.write(0x7FF, 11); w.write(3, 2); w.write(1, 2); w.write(1, 1)
      w.write(14, 4); w.write(2, 2) // 320 kbps, 32 kHz
      w.write(0, 1); w.write(0, 1)
      w.write(3, 2) // mode: single channel
      w.write(0, 2); w.write(0, 1); w.write(0, 1); w.write(0, 2)
      w.write(0, 9); w.write(0, 5); w.write(0, 4) // mdb, private, scfsi
      def granule(bigValues: Int, t: Int): Unit = {
        w.write(40, 12); w.write(bigValues, 9); w.write(210, 8); w.write(0, 4)
        w.write(0, 1) // long block
        w.write(t, 5); w.write(0, 5); w.write(0, 5)
        w.write(0, 4); w.write(0, 3)
        w.write(0, 1); w.write(0, 1); w.write(1, 1)
      }
      granule(2, tbl); granule(0, 0)
      val body = w.toBytes
      val frameLen = 144 * 320000 / 32000
      body ++ new Array[Byte](frameLen - body.length)
    }
    for (tbl <- 4 to 31) {
      val e = intercept[IllegalArgumentException](
        Mp3Codec.decode(frameDeclaringTable(tbl)))
      assert(e.getMessage != null && e.getMessage.contains(s"Huffman table $tbl"),
        s"table $tbl must refuse BY NUMBER, got: ${e.getMessage}")
    }
    // the implemented tables must NOT trip the dispatch refusal on the
    // same fixture shape (they decode the zero main data instead)
    for (tbl <- Seq(1, 2, 3)) {
      val (info, _) = Mp3Codec.decode(frameDeclaringTable(tbl))
      assert(info.channels == 1, s"implemented table $tbl must decode")
    }
  }

  test("refusal census: LSF intensity stereo refuses by name") {
    // MPEG-2 (LSF) joint-stereo header with mode_extension = 01
    // (intensity on) — the is_pos coding differs in LSF, so the header
    // parse must refuse before any side info is consumed
    val w = new Mp3Codec.MsbWriter
    w.write(0x7FF, 11)
    w.write(2, 2) // version: MPEG-2 (LSF)
    w.write(1, 2); w.write(1, 1)
    w.write(14, 4) // 160 kbps (LSF table)
    w.write(0, 2)  // 22050 Hz
    w.write(0, 1); w.write(0, 1)
    w.write(1, 2) // mode: joint stereo
    w.write(1, 2) // mode_extension: intensity on
    w.write(0, 1); w.write(0, 1); w.write(0, 2)
    val frameLen = 72 * 160000 / 22050
    val bytes = w.toBytes ++ new Array[Byte](frameLen - w.toBytes.length)
    val e = intercept[IllegalArgumentException](Mp3Codec.decode(bytes))
    assert(e.getMessage.contains("LSF intensity"),
      s"LSF intensity must refuse by name, got: ${e.getMessage}")
  }
}
