package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Ogg, OggBitReader, OggBitWriter, VorbisCodec, WavCodec}

/** The Vorbis codec's contracts: bitpacking order, Ogg page/CRC layer,
  * canonical huffman assignment, the spec constants, encode→decode
  * round trips with bounded error, byte-level golden determinism,
  * container dispatch, and malformed-stream refusals. */
class VorbisCodecSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- bits
  test("bitpacking is LSB-first and round-trips mixed widths") {
    val bw = new OggBitWriter
    bw.write(5, 3); bw.write(1, 1); bw.write(0x1234, 16); bw.write(7, 5)
    val bytes = bw.toBytes
    // first byte: bits 0-2 = 5, bit 3 = 1, bits 4-7 = low nibble of 0x34
    assert((bytes(0) & 0x07) == 5 && ((bytes(0) >> 3) & 1) == 1)
    val br = new OggBitReader(bytes)
    assert(br.read(3) == 5 && br.read(1) == 1 && br.read(16) == 0x1234 && br.read(5) == 7)
    intercept[IllegalArgumentException](br.read(32)) // exhausted
  }

  // ---------------------------------------------------------------- ogg
  test("Ogg CRC is the unreflected 0x04C11DB7 variant, not zlib") {
    // known vector: CRC of "123456789" under this polynomial spec
    // (poly 0x04C11DB7, init 0, no reflection, no final xor) = 0x89A1897F
    val v = "123456789".getBytes("ASCII")
    assert(Ogg.crc(v, 0, v.length) == 0x89a1897f)
    // zlib's reflected CRC32 of the same vector is 0xCBF43926 — different
    val z = new java.util.zip.CRC32(); z.update(v)
    assert(z.getValue.toInt != Ogg.crc(v, 0, v.length))
  }

  test("Ogg pages round-trip packets and refuse corruption") {
    val p1 = Array.tabulate(300)(i => (i * 7).toByte) // spans 2 lacing values
    val p2 = Array[Byte](1, 2, 3)
    val stream = Ogg.page(p1, 2, 0L, 42, 0) ++ Ogg.page(p2, 4, 999L, 42, 1)
    val (pkts, lastGranule, serial) = Ogg.packets(stream)
    assert(pkts.map(_._1.toSeq) == Vector(p1.toSeq, p2.toSeq))
    assert(lastGranule == 999L && serial == 42)
    // flip one payload byte: CRC must catch it
    val bad = stream.clone()
    bad(40) = (bad(40) ^ 1).toByte
    intercept[IllegalArgumentException](Ogg.packets(bad))
    // truncated stream refuses
    intercept[IllegalArgumentException](Ogg.packets(stream.take(stream.length - 2)))
  }

  // ------------------------------------------------------------- tables
  test("floor inverse-dB table matches the spec's published endpoints") {
    val t = VorbisCodec.inverseDbTable
    assert(t.length == 256)
    assert(t(255) == 1.0f)
    // spec §7.2.2 first entry: 1.0649863e-07
    assert(math.abs(t(0) - 1.0649863e-7f) / 1.0649863e-7f < 1e-5,
      s"table[0] = ${t(0)}")
    // strictly increasing exponential
    (1 until 256).foreach(i => assert(t(i) > t(i - 1)))
  }

  test("ilog and lookup1_values match the spec definitions") {
    assert(VorbisCodec.ilog(0) == 0 && VorbisCodec.ilog(1) == 1 &&
      VorbisCodec.ilog(2) == 2 && VorbisCodec.ilog(7) == 3 && VorbisCodec.ilog(8) == 4)
    assert(VorbisCodec.lookup1Values(625, 4) == 5)
    assert(VorbisCodec.lookup1Values(624, 4) == 4) // 5^4 = 625 > 624
    assert(VorbisCodec.lookup1Values(16, 4) == 2)
  }

  test("window satisfies the Princen-Bradley power condition") {
    val n = 512
    val w = VorbisCodec.window(n)
    (0 until n / 2).foreach { i =>
      val s = w(i) * w(i) + w(i + n / 2) * w(i + n / 2)
      assert(math.abs(s - 1.0) < 1e-12, s"w²[i]+w²[i+n/2] = $s at $i")
    }
  }

  // ------------------------------------------------------- round trips
  private def sine(freqHz: Double, rate: Int, n: Int, amp: Double = 0.5): Array[Float] =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * freqHz * i / rate)).toFloat)

  test("encode→decode round-trips a sine with bounded error and exact length") {
    val rate = 16000
    val pcm = sine(440.0, rate, 5000)
    val ogg = VorbisCodec.encode(pcm, rate)
    val (info, got) = VorbisCodec.decode(ogg)
    assert(info.sampleRate == rate && info.channels == 1 && info.blocksize == 512)
    assert(got.length == pcm.length, s"granule trim: ${got.length} vs ${pcm.length}")
    // lossy, but the quantizer is 2 bits against a per-frame flat floor:
    // error bounded by half a quantization step of the loudest bin
    val maxErr = pcm.indices.map(i => math.abs(got(i) - pcm(i))).max
    assert(maxErr < 0.2, s"round-trip error $maxErr")
    // and the signal must actually survive: correlation near 1
    val dot = pcm.indices.map(i => got(i).toDouble * pcm(i)).sum
    val na = math.sqrt(pcm.map(v => v.toDouble * v).sum)
    val nb = math.sqrt(got.map(v => v.toDouble * v).sum)
    assert(dot / (na * nb) > 0.95, s"correlation ${dot / (na * nb)}")
  }

  test("silence encodes through the zero-floor path and decodes to silence") {
    val pcm = new Array[Float](2000)
    val (info, got) = VorbisCodec.decode(VorbisCodec.encode(pcm, 8000))
    assert(got.length == 2000 && got.forall(_ == 0.0f))
    assert(info.packets == 2000 / 256 + 2) // ceil(2000/256) + priming
  }

  test("odd lengths and mixed content round-trip at exact length") {
    val rate = 16000
    for (len <- Seq(1, 255, 256, 257, 1000, 4097)) {
      val pcm = Array.tabulate(len)(i =>
        (0.3 * math.sin(2 * math.Pi * 700 * i / rate) +
          0.1 * math.sin(2 * math.Pi * 63 * i / rate)).toFloat)
      val (_, got) = VorbisCodec.decode(VorbisCodec.encode(pcm, rate))
      assert(got.length == len, s"length $len decoded to ${got.length}")
    }
  }

  test("encode is deterministic: byte-identical across calls") {
    val pcm = sine(300.0, 8000, 3000, amp = 0.7)
    val a = VorbisCodec.encode(pcm, 8000)
    val b = VorbisCodec.encode(pcm, 8000)
    assert(java.util.Arrays.equals(a, b))
  }

  test("golden: a frozen 16-sample stream's layout and digest") {
    // pins the whole serialization chain — header packets, codebook
    // serialization, huffman assignment, floor/residue packing, page
    // lacing, CRC. Any bit-level change breaks this loudly.
    val pcm = Array.tabulate(16)(i => ((i % 4) - 1.5f) / 4f)
    val ogg = VorbisCodec.encode(pcm, 8000)
    assert(new String(ogg.take(4), "ASCII") == "OggS")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(ogg).map(b => f"${b & 0xff}%02x").mkString
    val (_, got) = VorbisCodec.decode(ogg)
    assert(got.length == 16)
    // freeze: re-derive with GoldenDump-style println if the format
    // legitimately changes
    assert(hex == golden16Md5, s"stream md5 $hex")
    assert(ogg.length == golden16Len, s"stream length ${ogg.length}")
  }
  private val golden16Len = 758
  private val golden16Md5 = "a8cdb1b049c9105095e473aa26740904"

  // -------------------------------------------- decoder-only machinery
  // paths a conformant FOREIGN stream exercises that our encoder never
  // emits: the spec's own huffman worked example, sparse codebooks, VQ
  // lookup type 2 with the sequence flag, packed float32.

  test("canonical huffman assignment matches the spec's worked example (§3.2.1)") {
    // Vorbis I spec, decision-tree example: lengths [2,4,4,4,4,2,3,3]
    // must assign 00, 0100, 0101, 0110, 0111, 10, 110, 111
    val cb = new graft.io.VorbisCodec.Codebook(1, 8,
      Array(2, 4, 4, 4, 4, 2, 3, 3), 0, 0f, 0f, false, Array.empty)
    val want = Seq("00", "0100", "0101", "0110", "0111", "10", "110", "111")
    (0 until 8).foreach { e =>
      val got = (cb.codeLens(e) - 1 to 0 by -1)
        .map(j => ((cb.codes(e) >> j) & 1L).toString).mkString
      assert(got == want(e), s"entry $e: $got != ${want(e)}")
    }
    // and the tree decodes its own codewords (bit-by-bit walk)
    val bw = new graft.io.OggBitWriter
    Seq(5, 0, 7, 2).foreach(cb.writeEntry(bw, _))
    val br = new graft.io.OggBitReader(bw.toBytes)
    assert(Seq.fill(4)(cb.decodeEntry(br)) == Seq(5, 0, 7, 2))
  }

  test("sparse codebooks: unused entries never decode, used ones round-trip") {
    // lengths 0 mark unused entries (the sparse form foreign setup
    // headers carry); Kraft-complete over the used set {1,3}: both len 1
    val cb = new graft.io.VorbisCodec.Codebook(1, 4,
      Array(0, 1, 0, 1), 0, 0f, 0f, false, Array.empty)
    assert(cb.codeLens(0) == 0 && cb.codeLens(2) == 0)
    val bw = new graft.io.OggBitWriter
    Seq(1, 3, 3, 1).foreach(cb.writeEntry(bw, _))
    val br = new graft.io.OggBitReader(bw.toBytes)
    assert(Seq.fill(4)(cb.decodeEntry(br)) == Seq(1, 3, 3, 1))
    intercept[IllegalArgumentException](cb.writeEntry(new graft.io.OggBitWriter, 0))
  }

  test("over-specified codebooks refuse at construction") {
    // three length-1 entries cannot fit a binary tree
    intercept[IllegalArgumentException](new graft.io.VorbisCodec.Codebook(
      1, 3, Array(1, 1, 1), 0, 0f, 0f, false, Array.empty))
  }

  test("VQ lookup type 2 with sequence_p: explicit table, cascading offsets") {
    // §3.3: type 2 reads multiplicands per (entry, dim); sequence_p makes
    // each component accumulate onto the previous one
    val cb = new graft.io.VorbisCodec.Codebook(3, 2, Array(1, 1),
      2, -1.0f, 0.5f, true, Array(0, 1, 2, 3, 4, 5))
    // entry 0: v0 = 0*0.5 + (-1) = -1; v1 = 1*0.5 - 1 + v0 = -1.5; v2 = 2*0.5 - 1 + v1 = -1.5
    assert(cb.vq(0).toSeq == Seq(-1.0f, -1.5f, -1.5f))
    // entry 1: v0 = 3*0.5 - 1 = 0.5; v1 = 4*0.5 - 1 + 0.5 = 1.5; v2 = 5*0.5 - 1 + 1.5 = 3.0
    assert(cb.vq(1).toSeq == Seq(0.5f, 1.5f, 3.0f))
  }

  test("float32_unpack: 21-bit mantissa, exponent bias 788, sign bit (§9.2.2)") {
    val V = graft.io.VorbisCodec
    assert(V.float32Unpack((788 << 21) | 1) == 1.0f)
    assert(V.float32Unpack((788 << 21) | 5) == 5.0f)
    assert(V.float32Unpack(0x80000000 | (788 << 21) | 2) == -2.0f)
    assert(V.float32Unpack((787 << 21) | 1) == 0.5f) // exponent below bias
    assert(V.float32Unpack(0) == 0.0f)
  }

  // --------------------------------------------------------- dispatch
  test("WavCodec.decode dispatches OggS magic to the Vorbis decoder") {
    val rate = 16000
    val pcm = sine(440.0, rate, 3000)
    val ogg = VorbisCodec.encode(pcm, rate)
    val d = WavCodec.decode(ogg)
    assert(d.sampleRate == rate && d.channels == 1 && d.samples.length == 3000)
  }

  // --------------------------------------------------------- refusals
  test("malformed streams refuse loudly") {
    val good = VorbisCodec.encode(sine(200.0, 8000, 1000), 8000)
    // bad capture pattern
    val b1 = good.clone(); b1(0) = 'X'.toByte
    intercept[IllegalArgumentException](VorbisCodec.decode(b1))
    // header-packet corruption that survives repair of the page CRC:
    // flip a byte in the id header payload and re-CRC the page
    val b2 = good.clone()
    b2(28 + 7) = 0x7f.toByte // inside "vorbis" tag of the id packet
    locally {
      val nSegs = b2(26) & 0xff
      val pageLen = 27 + nSegs + (0 until nSegs).map(i => b2(27 + i) & 0xff).sum
      b2(22) = 0; b2(23) = 0; b2(24) = 0; b2(25) = 0
      val c = Ogg.crc(b2, 0, pageLen)
      b2(22) = (c & 0xff).toByte; b2(23) = ((c >> 8) & 0xff).toByte
      b2(24) = ((c >> 16) & 0xff).toByte; b2(25) = ((c >> 24) & 0xff).toByte
    }
    intercept[IllegalArgumentException](VorbisCodec.decode(b2))
    // empty input
    intercept[IllegalArgumentException](VorbisCodec.decode(Array.emptyByteArray))
  }

  test("foreign Ogg codecs refuse BY NAME: Opus, FLAC-in-Ogg, Speex, Theora") {
    // Ogg is a container: an Opus (voice-note/VoIP class) or FLAC/Speex/
    // Theora stream rides identical pages with its own first-packet
    // magic — the boundary must be a NAMED refusal, not a generic
    // header mismatch (round-12 verdict item 8)
    def oggWith(firstPacket: Array[Byte]): Array[Byte] =
      Ogg.page(firstPacket, 2, 0L, 7, 0) // BOS page, serial 7
    val cases = Seq(
      ("OpusHead".getBytes("ASCII") ++ Array[Byte](1, 1, 0, 0), "Opus"),
      (Array[Byte](0x7f) ++ "FLAC".getBytes("ASCII") ++ Array[Byte](1, 0), "FLAC"),
      ("Speex   ".getBytes("ASCII"), "Speex"),
      (Array[Byte](0x80.toByte) ++ "theora".getBytes("ASCII"), "Theora"))
    for ((pkt, name) <- cases) {
      val e = intercept[IllegalArgumentException](
        VorbisCodec.decode(oggWith(pkt)))
      assert(e.getMessage.contains(name) && e.getMessage.contains("off-scope"),
        s"$name: ${e.getMessage}")
      // and through the front-door dispatch too
      val e2 = intercept[IllegalArgumentException](WavCodec.decode(oggWith(pkt)))
      assert(e2.getMessage.contains(name))
    }
  }
}
