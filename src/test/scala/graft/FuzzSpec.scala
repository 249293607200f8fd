package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Adversarial container-demux fuzzing (round-4 verdict advice: OpsSpec
  * builds only well-formed containers). Random garbage, truncations, and
  * single-byte corruptions of valid AVI/MP4 files go through the probe and
  * both demux walks — the contract under attack is: never throw, never
  * allocate unboundedly (counts clamp to payload bounds), return None (or a
  * well-formed probe) on garbage. Raw ScalaCheck generators with a fixed
  * seed walk, the SegmentationSpec pattern (no scalatest bridge dep). */
class FuzzSpec extends AnyFunSuite {

  private def forAllSampled[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  /** The full demux surface under test; asserts each function's declared
    * garbage contract on ANY input:
    *   - probeContainer: returns a probe OR throws an Exception (the
    *     operator wrapper's per-item error-skip catches Exception) — but
    *     never an Error (OOM/StackOverflow would kill the executor);
    *   - aviMoviFrames / mp4Samples: NEVER throw — None on garbage, and
    *     any Some is bounded by the input's physical capacity. */
  private def drive(bytes: Array[Byte]): Unit = {
    try {
      val p = Multimodal.probeContainer(bytes)
      assert(p.format != null && p.chunks != null)
    } catch { case _: Exception => () } // error-skip contract; Errors propagate
    Multimodal.aviMoviFrames(bytes).foreach { frames =>
      // every frame is a slice of the input; chunk headers cost 8 bytes each
      assert(frames.forall(_.length <= bytes.length))
      assert(frames.size <= bytes.length / 8 + 1)
    }
    Multimodal.mp4Samples(bytes).foreach { samples =>
      // sample count clamps to what stsz's payload can hold (4 bytes/entry);
      // each sample is a copy of an in-bounds byte range
      assert(samples.forall(_.length <= bytes.length))
      assert(samples.size <= bytes.length / 4 + 1)
    }
    // the PCM-decode surface (round 6) has the same never-throw contract:
    // None on garbage; any decoded sample array is bounded by the payload
    Multimodal.aviAudioChunks(bytes).foreach { chunks =>
      assert(chunks.forall(_.length <= bytes.length))
    }
    Multimodal.aviAudioFormat(bytes).foreach { f => assert(f.channels >= 0) }
    Multimodal.decodeAviPcm(bytes).foreach { case (_, samples) =>
      assert(samples.length <= bytes.length / 2 + 1)
    }
  }

  // minimal local MP4 builder (independent of OpsSpec's): ftyp + a real
  // moov/trak/mdia/minf/stbl with stsz/stsc/stco + mdat
  private def be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def cc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private def box(id: String, payload: Array[Byte]): Array[Byte] =
    be(8L + payload.length) ++ cc(id) ++ payload

  private def validMp4(sampleSizes: Seq[Int]): Array[Byte] = {
    val stsz = box("stsz", be(0) ++ be(0) ++ be(sampleSizes.length.toLong) ++
      sampleSizes.flatMap(s => be(s.toLong)).toArray)
    val stsc = box("stsc", be(0) ++ be(1) ++ (be(1) ++ be(sampleSizes.length.toLong) ++ be(1)))
    def moovWith(off: Long): Array[Byte] =
      box("moov", box("mvhd", new Array[Byte](100)) ++
        box("trak", box("mdia", box("minf", box("stbl",
          stsz ++ stsc ++ box("stco", be(0) ++ be(1) ++ be(off)))))))
    val ftyp = box("ftyp", cc("isom") ++ be(0) ++ cc("isom"))
    val dataOff = ftyp.length + moovWith(0L).length + 8L
    val payload = sampleSizes.zipWithIndex.flatMap { case (n, i) =>
      Array.fill[Byte](n)(i.toByte) }.toArray
    ftyp ++ moovWith(dataOff) ++ box("mdat", payload)
  }

  test("random bytes never throw and never demux to unbounded output") {
    val garbage = Gen.chooseNum(0, 256).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte)))
    forAllSampled(garbage)(drive)
  }

  test("random bytes behind valid magics walk the chunk parsers safely") {
    val magics = Gen.oneOf(
      cc("RIFF") ++ be(0xffffffffL).reverse ++ cc("AVI "),
      be(32) ++ cc("ftyp") ++ cc("isom"),
      cc("RIFF"), cc("LIST"))
    val withMagic = for {
      m <- magics
      n <- Gen.chooseNum(0, 200)
      tail <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield m ++ tail
    forAllSampled(withMagic)(drive)
  }

  test("truncations of valid containers never throw") {
    val avi = Multimodal.synthesizeAvi(320, 240, 4, 33)
    val mp4 = validMp4(Seq(10, 17, 5))
    val truncated = for {
      base <- Gen.oneOf(avi, mp4)
      cut <- Gen.chooseNum(0, base.length)
    } yield base.take(cut)
    forAllSampled(truncated)(drive)
  }

  test("single-byte corruptions of valid containers never throw or over-read") {
    val avi = Multimodal.synthesizeAvi(320, 240, 4, 33)
    val mp4 = validMp4(Seq(10, 17, 5))
    val corrupted = for {
      base <- Gen.oneOf(avi, mp4)
      pos <- Gen.chooseNum(0, base.length - 1)
      b <- Gen.chooseNum(-128, 127).map(_.toByte)
    } yield { val c = base.clone(); c(pos) = b; c }
    forAllSampled(corrupted, n = 600)(drive)
  }

  test("adversarial declared counts clamp instead of allocating") {
    // stsz declaring 2^31-ish samples over a tiny payload must clamp to the
    // payload's capacity, not allocate gigabytes
    val mp4 = validMp4(Seq(10, 17, 5))
    // find the stsz sample-count field and inflate it
    val idx = mp4.indexOfSlice(cc("stsz"))
    assert(idx > 0)
    val evil = mp4.clone()
    System.arraycopy(be(0x7fffffffL), 0, evil, idx + 4 + 8, 4)
    drive(evil)
    // same attack on stco's entry count
    val coIdx = mp4.indexOfSlice(cc("stco"))
    val evil2 = mp4.clone()
    System.arraycopy(be(0x7fffffffL), 0, evil2, coIdx + 4 + 4, 4)
    drive(evil2)
  }

  test("the valid fixtures themselves still demux (fuzz baseline sanity)") {
    val avi = Multimodal.synthesizeAvi(320, 240, 4, 33)
    assert(Multimodal.aviMoviFrames(avi).exists(_.size == 4))
    val mp4 = validMp4(Seq(10, 17, 5))
    val s = Multimodal.mp4Samples(mp4)
    assert(s.exists(_.map(_.length).toSeq == Seq(10, 17, 5)))
  }

  test("PCM AVI round-trips: format parsed, chunks concatenated, samples exact") {
    val n = 437
    def pcm(i: Int): Short = ((i * 37 + 5) % 2001 - 1000).toShort
    val avi = Multimodal.synthesizeAviPcm(320, 240, 3, 33, n, pcm)
    val fmt = Multimodal.aviAudioFormat(avi)
    assert(fmt.contains(Multimodal.PcmFormat(1, 1, 16000, 16)))
    // three uneven chunks, sample-aligned
    assert(Multimodal.aviAudioChunks(avi).exists(_.size == 3))
    val decoded = Multimodal.decodeAviPcm(avi)
    assert(decoded.isDefined)
    assert(decoded.get._2.toSeq == (0 until n).map(pcm))
    // video demux unaffected by the audio stream's presence
    assert(Multimodal.aviMoviFrames(avi).exists(_.size == 3))
    // the video-only builder has no audio stream -> stand-in path (None)
    assert(Multimodal.decodeAviPcm(Multimodal.synthesizeAvi(320, 240, 3, 33)).isEmpty)
  }

  test("truncations/corruptions of the PCM AVI never throw") {
    val avi = Multimodal.synthesizeAviPcm(320, 240, 3, 33, 437,
      i => ((i * 37 + 5) % 2001 - 1000).toShort)
    val mutated = for {
      cut <- Gen.chooseNum(0, avi.length)
      corrupt <- Gen.option(Gen.zip(Gen.chooseNum(0, avi.length - 1),
        Gen.chooseNum(-128, 127).map(_.toByte)))
    } yield {
      val c = avi.take(cut)
      corrupt.foreach { case (p, b) => if (p < c.length) c(p) = b }
      c
    }
    forAllSampled(mutated, n = 400)(drive)
  }

  test("JPEG decode under truncation/corruption: loud Exception or a sane image, never an Error") {
    // the decoder's garbage contract differs from the demuxers': it may
    // THROW (the pipeline's per-item error-skip catches Exception), but it
    // must never hang, never allocate unboundedly (the SOF dimension
    // sanity bound), and never return an image violating its own header —
    // across BASELINE, RESTART-INTERVAL, and PROGRESSIVE streams
    val fixtures = Seq(
      graft.io.JpegCodec.encode(graft.ops.ImageOps.synth(24, 16, 3)),
      graft.io.JpegCodec.encode(graft.ops.ImageOps.synth(17, 23, 3),
        subsample = true, restartInterval = 2),
      graft.io.JpegCodec.encode(graft.ops.ImageOps.synth(24, 16, 3),
        progressive = true),
      graft.io.JpegCodec.encode12(graft.io.PngCodec.Image16(15, 11, 3,
        Array.tabulate[Short](15 * 11 * 3)(i => ((i * 997) % 4096).toShort))))
    def driveJpeg(bytes: Array[Byte]): Unit =
      try {
        val img = graft.io.JpegCodec.decode(bytes)
        assert(img.width > 0 && img.height > 0 &&
          img.pixels.length == img.width * img.height * img.channels)
        assert(img.width.toLong * img.height <= (1L << 24))
      } catch { case _: Exception =>
        // loud refusal is in-contract; a 12-bit stream refuses HERE and
        // decodes through the deep surface — drive it too
        try {
          val d = graft.io.JpegCodec.decode12(bytes)
          assert(d.samples.length == d.width * d.height * d.channels)
        } catch { case _: Exception => () }
      }
    fixtures.foreach { fx =>
      val mutated = for {
        cut <- Gen.chooseNum(2, fx.length)
        corrupt <- Gen.option(Gen.zip(Gen.chooseNum(2, fx.length - 1),
          Gen.chooseNum(-128, 127).map(_.toByte)))
      } yield {
        val c = fx.take(cut)
        corrupt.foreach { case (p, b) => if (p < c.length) c(p) = b }
        c
      }
      forAllSampled(mutated, n = 250)(driveJpeg)
    }
    // pure garbage behind the SOI magic
    val garbage = Gen.containerOf[Array, Byte](
      Gen.chooseNum(-128, 127).map(_.toByte))
      .map(b => Array[Byte](0xff.toByte, 0xd8.toByte) ++ b)
    forAllSampled(garbage, n = 200)(driveJpeg)
  }

  test("MP3 decode under truncation/corruption: loud Exception or sane PCM, never an Error") {
    // decode may THROW (the pipeline error-skips per file) but must never
    // hang, never allocate unboundedly (the frame-length bound comes from
    // the header's own bitrate/rate fields, validated against the file),
    // and never return PCM longer than frames × 1152
    def sine(n: Int): Array[Float] =
      Array.tabulate(n)(i => (0.4 * math.sin(2 * math.Pi * 500 * i / 32000.0)).toFloat)
    val fixtures = Seq(
      graft.io.Mp3Codec.encode(sine(4000), 32000),
      graft.io.Mp3Codec.encode(sine(2000), 48000),
      Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 16) ++
        new Array[Byte](16) ++ graft.io.Mp3Codec.encode(sine(2500), 44100))
    def drive(bytes: Array[Byte]): Unit = {
      // decode either throws (Exception only) or returns; the bound
      // check runs OUTSIDE the catch — a swallowed TestFailedException
      // would silently unenforce the allocation guard (round-14 review)
      val ok =
        try Some(graft.io.Mp3Codec.decode(bytes))
        catch { case _: Exception => None }
      ok.foreach { case (info, pcm) =>
        assert(info.frames > 0)
        // stereo decodes interleave two channels; LSF frames carry one
        // granule (576) but frames*1152 still bounds them
        assert(pcm.length <= info.frames * 1152 * info.channels)
      }
    }
    fixtures.foreach { fx =>
      val mutated = for {
        cut <- Gen.chooseNum(2, fx.length)
        corrupt <- Gen.option(Gen.zip(Gen.chooseNum(0, fx.length - 1),
          Gen.chooseNum(-128, 127).map(_.toByte)))
      } yield {
        val c = fx.take(cut)
        corrupt.foreach { case (p, b) => if (p < c.length) c(p) = b }
        c
      }
      forAllSampled(mutated, n = 250)(drive)
    }
    // garbage behind a plausible frame-sync prefix
    val garbage = Gen.containerOf[Array, Byte](
      Gen.chooseNum(-128, 127).map(_.toByte))
      .map(b => Array[Byte](0xff.toByte, 0xfb.toByte) ++ b)
    forAllSampled(garbage, n = 200)(drive)
  }

  test("TIFF decode under truncation/corruption: loud Exception or a sane image, never an Error") {
    val fixtures = Seq(
      graft.io.TiffCodec.encode(graft.ops.ImageOps.synth(24, 40, 3)),
      graft.io.TiffCodec.encode(graft.ops.ImageOps.synth(17, 33, 2),
        deflate = true),
      graft.io.TiffCodec.encode(graft.ops.ImageOps.synth(24, 16, 0),
        bigEndian = true),
      graft.io.TiffCodec.encode16(graft.io.PngCodec.Image16(11, 21, 1,
        Array.tabulate[Short](11 * 21)(i => (i * 911).toShort)), deflate = true),
      graft.io.TiffCodec.encode(graft.ops.ImageOps.synth(25, 19, 1),
        lzw = true, predictor = true),
      graft.io.TiffCodec.encode16(graft.io.PngCodec.Image16(13, 17, 3,
        Array.tabulate[Short](13 * 17 * 3)(i => (i * 601).toShort)),
        lzw = true, predictor = true, bigEndian = true),
      graft.io.TiffCodec.encode(graft.ops.ImageOps.synth(33, 20, 3),
        lzw = true, predictor = true, tileSize = 16),
      graft.io.TiffCodec.encode(graft.ops.ImageOps.synth(29, 22, 3),
        packbits = true, bigEndian = true),
      graft.io.TiffCodec.encode16(graft.io.PngCodec.Image16(15, 18, 1,
        Array.tabulate[Short](15 * 18)(i => (i * 499).toShort)),
        packbits = true, predictor = true, tileSize = 16))
    def driveTiff(bytes: Array[Byte]): Unit =
      try {
        val img = graft.io.TiffCodec.decode(bytes)
        assert(img.width > 0 && img.height > 0 &&
          img.pixels.length == img.width * img.height * img.channels)
        assert(img.width.toLong * img.height <= (1L << 24))
      } catch { case _: Exception =>
        try {
          val d = graft.io.TiffCodec.decode16(bytes)
          assert(d.samples.length == d.width * d.height * d.channels)
        } catch { case _: Exception => () } // loud refusal is in-contract
      }
    fixtures.foreach { fx =>
      val mutated = for {
        cut <- Gen.chooseNum(2, fx.length)
        corrupt <- Gen.option(Gen.zip(Gen.chooseNum(0, fx.length - 1),
          Gen.chooseNum(-128, 127).map(_.toByte)))
      } yield {
        val c = fx.take(cut)
        corrupt.foreach { case (p, b) => if (p < c.length) c(p) = b }
        c
      }
      forAllSampled(mutated, n = 250)(driveTiff)
    }
    // pure garbage behind a valid order mark
    val garbage = Gen.containerOf[Array, Byte](
      Gen.chooseNum(-128, 127).map(_.toByte))
      .map(b => Array[Byte]('I', 'I', 42, 0) ++ b)
    forAllSampled(garbage, n = 200)(driveTiff)
  }

  test("PNG decode under truncation/corruption: loud Exception or a sane image, never an Error") {
    val img = graft.ops.ImageOps.synth(24, 16, 3)
    // an RGBA image with real transparency: its palette encode carries a
    // tRNS chunk, so the fuzz walks the transparency machinery too
    val rgbaPx = Array.tabulate[Byte](16 * 16 * 4)(i =>
      if (i % 4 == 3) (if ((i / 4) % 5 == 0) 0 else 255).toByte
      else ((i * 7) % 6 * 40).toByte)
    val grayAlpha = graft.io.PngCodec.Image(12, 12, 2,
      Array.tabulate[Byte](12 * 12 * 2)(i => (i * 31).toByte))
    // sub-byte and 16-bit fixtures walk the bit-unpack machinery
    val gray4 = graft.io.PngCodec.Image(14, 10,
      1, Array.tabulate[Byte](140)(i => ((i % 16) * 17).toByte))
    val deep = graft.io.PngCodec.Image16(11, 9, 3,
      Array.tabulate[Short](11 * 9 * 3)(i => (i * 4111).toShort))
    val fixtures = Seq(
      graft.io.PngCodec.encode(img),
      graft.io.PngCodec.encode(img, interlaced = true),
      graft.io.PngCodec.encode(graft.ops.ImageOps.synth(24, 24, 2),
        interlaced = true, palette = true),
      graft.io.PngCodec.encode(graft.io.PngCodec.Image(16, 16, 4, rgbaPx),
        palette = true),
      graft.io.PngCodec.encode(grayAlpha, interlaced = true),
      graft.io.PngCodec.encode(gray4, interlaced = true, bitDepth = 4),
      graft.io.PngCodec.encode(graft.io.PngCodec.Image(14, 10, 1,
        Array.tabulate[Byte](140)(i => ((i % 4) * 85).toByte)),
        palette = true, bitDepth = 2),
      graft.io.PngCodec.encode16(deep),
      graft.io.PngCodec.encode16(deep, interlaced = true))
    def drivePng(bytes: Array[Byte]): Unit =
      try {
        val out = graft.io.PngCodec.decode(bytes)
        assert(out.width > 0 && out.height > 0 &&
          out.pixels.length == out.width * out.height * out.channels)
        assert(out.width.toLong * out.height <= (1L << 24))
      } catch { case _: Exception =>
        // loud refusal is in-contract; a 16-bit stream may refuse HERE
        // and still decode through the deep surface — drive it too
        try {
          val o16 = graft.io.PngCodec.decode16(bytes)
          assert(o16.samples.length == o16.width * o16.height * o16.channels)
        } catch { case _: Exception => () }
      }
    fixtures.foreach { fx =>
      val mutated = for {
        cut <- Gen.chooseNum(8, fx.length)
        corrupt <- Gen.option(Gen.zip(Gen.chooseNum(8, fx.length - 1),
          Gen.chooseNum(-128, 127).map(_.toByte)))
      } yield {
        val c = fx.take(cut)
        corrupt.foreach { case (p, b) => if (p < c.length) c(p) = b }
        c
      }
      forAllSampled(mutated, n = 250)(drivePng)
    }
  }
}
