package graft.io

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (decode + conformant encode) — the IMAGE half of
  * the multimodal-column story, next to the audio family ([[WavCodec]],
  * [[FlacCodec]], [[VorbisCodec]], ...). The reference pipeline treats
  * media as opaque bytes decoded at the edge (`process_audio.py`'s
  * pydub ingest); an LLM training-data pipeline does the same to image
  * corpora, so the engine carries a real codec rather than a stub.
  * Everything here derives from the public PNG specification (W3C
  * PNG / RFC 2083): the byte-level container (length-type-data-CRC32
  * chunks), zlib datastream (`java.util.zip`, the JDK's own
  * implementation), and the five scanline filters with their exact
  * integer arithmetic — there are no memorized tables; CRC32 is the
  * JDK's.
  *
  * Decoder scope (documented like [[AdpcmCodec]]/[[VorbisCodec]]):
  * ALL FIVE color types — 0 (grayscale), 2 (RGB), 3 (PALETTE — the
  * web-graphics layout: PLTE lookup), 4 (gray+alpha) and 6 (RGBA) —
  * at EVERY legal bit depth (spec §11.2.2): gray 1/2/4/8/16, palette
  * 1/2/4/8 (sub-byte indices pack MSB-first within scanline bytes),
  * RGB/GA/RGBA 8/16. Sub-byte gray expands by LEFT-BIT REPLICATION
  * (the spec's sample-scaling: d-bit value v reads as v·255/(2^d−1) —
  * exact and invertible, so the expansion is lossless); 16-bit
  * streams decode through the separate [[decode16]] surface into
  * [[Image16]] (full 16-bit samples as stored — the 8-bit [[decode]]
  * REFUSES them rather than silently halving precision; the lossy
  * display downsample is the caller's explicit [[Image16.toEight]]).
  * Filtering is byte-oriented at every depth (spec §9: the filter
  * offset is max(1, bytes-per-pixel), so sub-byte rows filter at
  * 1-byte granularity and 16-bit rows at 2·channels) — ONE shared
  * filter implementation serves all depths. BOTH
  * interlace methods (none and ADAM7 — seven sub-image passes, each
  * filtered independently, scattered back on the 8×8 lattice), single
  * zlib stream over any number of IDAT chunks, and tRNS transparency
  * in every position the spec allows it (per-palette-entry alpha on
  * type 3 — the transparent-web-graphic layout — and the color-key
  * form on types 0/2, where the keyed sample value reads as fully
  * transparent; tRNS on 4/6 is refused as the spec forbids it).
  * Transparency EXPANDS on decode: type-3+tRNS reads as RGBA,
  * type-0+tRNS as gray+alpha, type-2+tRNS as RGBA — alpha is data,
  * never dropped. Within that scope the decode path is the real spec
  * machinery — signature check, per-chunk CRC verification, IHDR
  * validation, IDAT concatenation, inflate, and the full five-filter
  * reconstruction (None/Sub/Up/Average/Paeth, including Paeth's exact
  * tie-breaking order). 16-bit streams are refused with a descriptive
  * error, never mis-decoded.
  *
  * Encoder: writes the same scope (`interlaced`/`palette` options),
  * choosing each row's filter by the spec's recommended minimum-sum-
  * of-absolute-differences heuristic over all five filters — so decode
  * exercises every filter type on realistic data, and a decoder that
  * botches any filter fails the roundtrip. PNG is LOSSLESS, so every
  * scope combination gates BIT-EXACTLY: interlaced and palette streams
  * must decode to the identical pixels the plain stream carries. */
object PngCodec {

  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte]) {
    require(channels >= 1 && channels <= 4, // 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA
      s"unsupported channel count: $channels")
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
  }

  /** 16-bit-per-sample image — the deep-color surface ([[decode16]]/
    * [[encode16]]). Samples are UNSIGNED 16-bit stored in shorts
    * (mask with 0xffff); [[toEight]] is the spec's display downsample
    * (top byte) — explicitly lossy, never on a bit-exact gate path. */
  final case class Image16(width: Int, height: Int, channels: Int,
                           samples: Array[Short]) {
    require(channels >= 1 && channels <= 4,
      s"unsupported channel count: $channels")
    require(samples.length == width * height * channels,
      s"sample buffer ${samples.length} != $width*$height*$channels")
    def toEight: Image =
      Image(width, height, channels,
        samples.map(s => ((s & 0xffff) >>> 8).toByte))
  }

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  /** The Adam7 pass lattice: (xStart, yStart, xStep, yStep) per pass. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
  private def passDims(w: Int, h: Int, p: (Int, Int, Int, Int)): (Int, Int) = {
    val (x0, y0, dx, dy) = p
    (if (w > x0) (w - x0 + dx - 1) / dx else 0,
     if (h > y0) (h - y0 + dy - 1) / dy else 0)
  }

  /** `bitDepth` < 8 packs sub-byte samples MSB-first (spec §7.2):
    * grayscale inputs must be EXACT left-bit-replication multiples
    * (255/(2^d−1) steps — the invertibility condition that keeps the
    * roundtrip bit-exact; anything else refuses rather than quantizes)
    * and palette images must fit 2^d entries. */
  def encode(img: Image, interlaced: Boolean = false,
             palette: Boolean = false, bitDepth: Int = 8): Array[Byte] = {
    require(!palette || img.channels != 2,
      "palette encode carries gray/RGB/RGBA images (gray+alpha is type 4)")
    require(bitDepth == 8 || bitDepth == 4 || bitDepth == 2 || bitDepth == 1,
      s"encode bit depth must be 1/2/4/8, got $bitDepth (16 is encode16)")
    require(bitDepth == 8 || palette || img.channels == 1,
      s"sub-byte depth $bitDepth carries grayscale or palette images only " +
        "(spec §11.2.2)")
    // palette mode: indices stream at 1 byte/px through a PLTE lookup;
    // RGBA input additionally emits per-entry alpha as a tRNS chunk —
    // the transparent-web-graphic layout. The spec's recommended
    // ordering (transparent entries FIRST) lets tRNS truncate after the
    // last non-opaque entry, so decode also exercises the
    // shorter-than-PLTE case with implied 255s.
    val (colorType, bpp, data, plte, trns) =
      if (palette) {
        val lut = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
        val keys = new Array[Int](img.width * img.height)
        var p = 0
        while (p < img.width * img.height) {
          val base = p * img.channels
          val key =
            if (img.channels == 1) {
              val g = img.pixels(base) & 0xff
              (255 << 24) | (g << 16) | (g << 8) | g
            } else {
              val a = if (img.channels == 4) img.pixels(base + 3) & 0xff else 255
              (a << 24) |
                ((img.pixels(base) & 0xff) << 16) |
                ((img.pixels(base + 1) & 0xff) << 8) |
                (img.pixels(base + 2) & 0xff)
            }
          lut.getOrElseUpdate(key, lut.size)
          require(lut.size <= 256,
            "palette encode needs <= 256 distinct colors")
          keys(p) = key
          p += 1
        }
        // transparent-first entry order (alpha ascending, stable)
        val order = lut.keys.toArray.sortBy(k => ((k >>> 24), lut(k)))
        val rank = order.zipWithIndex.toMap
        val idx = new Array[Byte](img.width * img.height)
        p = 0
        while (p < img.width * img.height) {
          idx(p) = rank(keys(p)).toByte; p += 1
        }
        val pl = new Array[Byte](order.length * 3)
        order.zipWithIndex.foreach { case (k, j) =>
          pl(j * 3) = (k >> 16).toByte
          pl(j * 3 + 1) = (k >> 8).toByte
          pl(j * 3 + 2) = k.toByte
        }
        val lastNonOpaque = order.lastIndexWhere(k => (k >>> 24) != 255)
        val tr =
          if (lastNonOpaque < 0) None
          else Some(Array.tabulate[Byte](lastNonOpaque + 1)(j =>
            (order(j) >>> 24).toByte))
        (3, 1, idx, Some(pl), tr)
      } else
        (img.channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 },
          img.channels, img.pixels, None, None)
    // byte samples → raw sample VALUES at the target depth: palette
    // indices must fit, sub-byte gray must sit exactly on the
    // replication lattice (v = raw·255/(2^d−1))
    val samples = new Array[Int](data.length)
    if (bitDepth == 8) {
      var i = 0
      while (i < data.length) { samples(i) = data(i) & 0xff; i += 1 }
    } else if (palette) {
      var i = 0
      while (i < data.length) {
        val idx = data(i) & 0xff
        require(idx < (1 << bitDepth),
          s"palette encode at depth $bitDepth fits ${1 << bitDepth} " +
            s"entries, image uses index $idx")
        samples(i) = idx; i += 1
      }
    } else {
      val step = 255 / ((1 << bitDepth) - 1)
      var i = 0
      while (i < data.length) {
        val v = data(i) & 0xff
        require(v % step == 0,
          s"gray value $v is not representable at depth $bitDepth " +
            s"(needs a multiple of $step) — quantize explicitly first")
        samples(i) = v / step; i += 1
      }
    }
    val raw = packFiltered(samples, img.width, img.height, bpp, bitDepth,
      interlaced)
    assemble(img.width, img.height, bitDepth, colorType, interlaced,
      plte, trns, raw)
  }

  /** Depth-16 encode — all four sample layouts (gray / gray+alpha /
    * RGB / RGBA), plain or Adam7. Roundtrips [[decode16]] bit-exactly
    * (PNG is lossless at every depth). */
  def encode16(img: Image16, interlaced: Boolean = false): Array[Byte] = {
    val colorType = img.channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val samples = new Array[Int](img.samples.length)
    var i = 0
    while (i < samples.length) { samples(i) = img.samples(i) & 0xffff; i += 1 }
    val raw = packFiltered(samples, img.width, img.height, img.channels, 16,
      interlaced)
    assemble(img.width, img.height, 16, colorType, interlaced, None, None, raw)
  }

  private def assemble(w: Int, h: Int, depth: Int, colorType: Int,
                       interlaced: Boolean, plte: Option[Array[Byte]],
                       trns: Option[Array[Byte]],
                       raw: Array[Byte]): Array[Byte] = {
    val ihdr = new Array[Byte](13)
    writeBE(ihdr, 0, w)
    writeBE(ihdr, 4, h)
    ihdr(8) = depth.toByte
    ihdr(9) = colorType.toByte
    ihdr(10) = 0           // compression: deflate
    ihdr(11) = 0           // filter method 0
    ihdr(12) = if (interlaced) 1 else 0
    val idat = deflate(raw)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    writeChunk(out, "IHDR", ihdr)
    plte.foreach(writeChunk(out, "PLTE", _))
    trns.foreach(writeChunk(out, "tRNS", _)) // spec: after PLTE, before IDAT
    writeChunk(out, "IDAT", idat)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Scanline serialization shared by every depth: pack one
    * (sub-)image's sample values into spec §7.2 scanlines (sub-byte
    * samples MSB-first within a byte, 16-bit big-endian, rows padded
    * to a byte boundary), then filter. Interlaced images pack each
    * Adam7 pass as an independent sub-image. `spp` = samples/pixel. */
  private def packFiltered(samples: Array[Int], w: Int, h: Int, spp: Int,
                           depth: Int, interlaced: Boolean): Array[Byte] = {
    def pack(sub: Array[Int], pw: Int, ph: Int): Array[Byte] = {
      val rb = (pw * spp * depth + 7) / 8
      val packed = new Array[Byte](rb * ph)
      var y = 0
      while (y < ph) {
        val rowBase = y * rb
        var bitPos = 0
        var s = y * pw * spp
        val rowEnd = (y + 1) * pw * spp
        while (s < rowEnd) {
          val v = sub(s)
          if (depth == 16) {
            packed(rowBase + bitPos / 8) = (v >>> 8).toByte
            packed(rowBase + bitPos / 8 + 1) = v.toByte
          } else if (depth == 8) {
            packed(rowBase + bitPos / 8) = v.toByte
          } else {
            val bi = rowBase + bitPos / 8
            val shift = 8 - depth - (bitPos % 8)
            packed(bi) = ((packed(bi) & 0xff) | (v << shift)).toByte
          }
          bitPos += depth
          s += 1
        }
        y += 1
      }
      filterRows(packed, rb, ph, math.max(1, spp * depth / 8))
    }
    if (!interlaced) pack(samples, w, h)
    else {
      // each Adam7 pass filters (and byte-packs) as an INDEPENDENT
      // sub-image — sub-byte passes pad at the PASS row boundary
      val o = new java.io.ByteArrayOutputStream()
      Adam7.foreach { pass =>
        val (x0, y0, dx, dy) = pass
        val (pw, ph) = passDims(w, h, pass)
        if (pw > 0 && ph > 0) {
          val sub = new Array[Int](pw * ph * spp)
          var j = 0
          while (j < ph) {
            var i = 0
            while (i < pw) {
              var ch = 0
              while (ch < spp) {
                sub((j * pw + i) * spp + ch) =
                  samples(((y0 + j * dy) * w + (x0 + i * dx)) * spp + ch)
                ch += 1
              }
              i += 1
            }
            j += 1
          }
          o.write(pack(sub, pw, ph))
        }
      }
      o.toByteArray
    }
  }

  /** Per-row adaptive filtering: the spec's minimum-sum-of-absolute-
    * differences heuristic over all five filter types. `stride` is the
    * packed scanline width in BYTES; `bpp` the filter offset
    * (max(1, bytes-per-pixel) — spec §9.2), so one implementation
    * serves sub-byte, 8-bit and 16-bit layouts. */
  private def filterRows(pixels: Array[Byte], stride: Int, height: Int,
                         bpp: Int): Array[Byte] = {
    val out = new Array[Byte]((stride + 1) * height)
    val prior = new Array[Byte](stride) // zero row above the first
    val cand = Array.ofDim[Byte](5, stride)
    var y = 0
    while (y < height) {
      val row = java.util.Arrays.copyOfRange(
        pixels, y * stride, (y + 1) * stride)
      var best = 0
      var bestSum = Long.MaxValue
      var f = 0
      while (f < 5) {
        var sum = 0L
        var x = 0
        while (x < stride) {
          val left = if (x >= bpp) row(x - bpp) & 0xff else 0
          val up = prior(x) & 0xff
          val ul = if (x >= bpp) prior(x - bpp) & 0xff else 0
          val v = row(x) & 0xff
          val filtered = f match {
            case 0 => v
            case 1 => (v - left) & 0xff
            case 2 => (v - up) & 0xff
            case 3 => (v - (left + up) / 2) & 0xff
            case 4 => (v - paeth(left, up, ul)) & 0xff
          }
          cand(f)(x) = filtered.toByte
          // the heuristic treats filtered bytes as signed deltas
          sum += math.abs(filtered.toByte.toInt)
          x += 1
        }
        if (sum < bestSum) { bestSum = sum; best = f }
        f += 1
      }
      out(y * (stride + 1)) = best.toByte
      System.arraycopy(cand(best), 0, out, y * (stride + 1) + 1, stride)
      System.arraycopy(row, 0, prior, 0, stride)
      y += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** `maxPixels` bounds w×h BEFORE the pixel buffer allocates (a
    * corrupted IHDR declaring 2³¹-pixel dims would OOM the executor
    * before the datastream refutes it). The default admits a 4096×4096
    * still; callers with legitimately larger inputs raise it per call —
    * the [[JpegCodec.decode]] contract. Depths 1–8 decode here
    * (sub-byte gray expands losslessly by left-bit replication);
    * 16-bit streams REFUSE — [[decode16]] is the precision-preserving
    * surface. */
  def decode(bytes: Array[Byte], maxPixels: Long = 1L << 24): Image = {
    val d = decodeCore(bytes, maxPixels)
    require(d.bitDepth <= 8,
      "16-bit stream: decode() would silently halve sample precision — " +
        "decode16() preserves it (then Image16.toEight if 8 bits suffice)")
    val width = d.width; val height = d.height
    val samples = d.samples; val trns = d.trns
    if (d.paletted) {
      // PLTE lookup: indices → RGB triples; with tRNS, → RGBA (per-entry
      // alpha, entries past the tRNS length implied fully opaque —
      // spec §11.3.2 lets tRNS truncate after the last non-opaque entry)
      val plte = d.plte
      val n = plte.length / 3
      require(trns == null || trns.length <= n,
        s"tRNS carries ${trns.length} alphas for $n palette entries")
      val outCh = if (trns == null) 3 else 4
      val out = new Array[Byte](width * height * outCh)
      var p = 0
      while (p < width * height) {
        val idx = samples(p)
        require(idx < n, s"palette index $idx outside PLTE ($n entries)")
        out(p * outCh) = plte(idx * 3)
        out(p * outCh + 1) = plte(idx * 3 + 1)
        out(p * outCh + 2) = plte(idx * 3 + 2)
        if (outCh == 4)
          out(p * outCh + 3) =
            if (idx < trns.length) trns(idx) else 255.toByte
        p += 1
      }
      Image(width, height, outCh, out)
    } else {
      // sub-byte gray scales by left-bit replication: v·255/(2^d−1) —
      // exact (the divisor divides 255 for every legal d)
      val step = 255 / ((1 << d.bitDepth) - 1)
      if (trns != null && d.colorTyp == 0) {
        // gray color key: the keyed RAW sample reads fully transparent —
        // expansion carries the alpha as data (gray → gray+alpha)
        require(trns.length == 2, s"bad tRNS length ${trns.length} for gray")
        val key = (((trns(0) & 0xff) << 8) | (trns(1) & 0xff)) &
          ((1 << d.bitDepth) - 1)
        val out = new Array[Byte](width * height * 2)
        var p = 0
        while (p < width * height) {
          out(p * 2) = (samples(p) * step).toByte
          out(p * 2 + 1) = if (samples(p) == key) 0 else 255.toByte
          p += 1
        }
        Image(width, height, 2, out)
      } else if (trns != null && d.colorTyp == 2) {
        // RGB color key → RGBA (depth 8 here; depth 16 is decode16's)
        require(trns.length == 6, s"bad tRNS length ${trns.length} for RGB")
        val kr = trns(1) & 0xff; val kg = trns(3) & 0xff; val kb = trns(5) & 0xff
        val out = new Array[Byte](width * height * 4)
        var p = 0
        while (p < width * height) {
          val r = samples(p * 3); val g = samples(p * 3 + 1)
          val b = samples(p * 3 + 2)
          out(p * 4) = r.toByte
          out(p * 4 + 1) = g.toByte
          out(p * 4 + 2) = b.toByte
          out(p * 4 + 3) = if (r == kr && g == kg && b == kb) 0 else 255.toByte
          p += 1
        }
        Image(width, height, 4, out)
      } else {
        val out = new Array[Byte](samples.length)
        var i = 0
        while (i < samples.length) { out(i) = (samples(i) * step).toByte; i += 1 }
        Image(width, height, d.channels, out)
      }
    }
  }

  /** Deep-color decode: 16-bit streams only (lower depths are
    * [[decode]]'s). tRNS color keys expand exactly like the 8-bit
    * path, with full 16-bit key comparison and 0/65535 alpha. */
  def decode16(bytes: Array[Byte], maxPixels: Long = 1L << 24): Image16 = {
    val d = decodeCore(bytes, maxPixels)
    require(d.bitDepth == 16,
      s"depth-${d.bitDepth} stream: decode() is the 8-bit surface")
    val width = d.width; val height = d.height
    val samples = d.samples; val trns = d.trns
    def be16(a: Array[Byte], off: Int): Int =
      ((a(off) & 0xff) << 8) | (a(off + 1) & 0xff)
    if (trns != null && d.colorTyp == 0) {
      require(trns.length == 2, s"bad tRNS length ${trns.length} for gray")
      val key = be16(trns, 0)
      val out = new Array[Short](width * height * 2)
      var p = 0
      while (p < width * height) {
        out(p * 2) = samples(p).toShort
        out(p * 2 + 1) = if (samples(p) == key) 0 else 0xffff.toShort
        p += 1
      }
      Image16(width, height, 2, out)
    } else if (trns != null && d.colorTyp == 2) {
      require(trns.length == 6, s"bad tRNS length ${trns.length} for RGB")
      val kr = be16(trns, 0); val kg = be16(trns, 2); val kb = be16(trns, 4)
      val out = new Array[Short](width * height * 4)
      var p = 0
      while (p < width * height) {
        val r = samples(p * 3); val g = samples(p * 3 + 1)
        val b = samples(p * 3 + 2)
        out(p * 4) = r.toShort
        out(p * 4 + 1) = g.toShort
        out(p * 4 + 2) = b.toShort
        out(p * 4 + 3) =
          if (r == kr && g == kg && b == kb) 0 else 0xffff.toShort
        p += 1
      }
      Image16(width, height, 4, out)
    } else {
      val out = new Array[Short](samples.length)
      var i = 0
      while (i < samples.length) { out(i) = samples(i).toShort; i += 1 }
      Image16(width, height, d.channels, out)
    }
  }

  /** Everything depth-independent: container walk, IHDR validation,
    * inflate, de-filter (byte-oriented at every depth), bit-unpack to
    * one Int per SAMPLE (palette: the index, pre-lookup). */
  private final case class Decoded(width: Int, height: Int, channels: Int,
                                   colorTyp: Int, bitDepth: Int,
                                   paletted: Boolean, plte: Array[Byte],
                                   trns: Array[Byte], samples: Array[Int])

  private def decodeCore(bytes: Array[Byte], maxPixels: Long): Decoded = {
    require(bytes.length >= 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not a PNG: bad signature")
    var pos = 8
    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    var interlaced = false
    var paletted = false
    var colorTyp = -1
    var depth = 0
    var plte: Array[Byte] = null
    var trns: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (pos < bytes.length && !seenIend) {
      require(pos + 8 <= bytes.length, "truncated chunk header")
      val len = readBE(bytes, pos)
      require(len >= 0 && pos + 12 + len <= bytes.length,
        s"truncated chunk (declared $len bytes)")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      // CRC32 covers type + data (spec §5.3)
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      val stored = readBE(bytes, pos + 8 + len)
      require(crc.getValue.toInt == stored,
        f"CRC mismatch in $typ chunk (got ${stored}%08x, computed ${crc.getValue.toInt}%08x)")
      typ match {
        case "IHDR" =>
          require(!seenIhdr && len == 13, "bad IHDR")
          seenIhdr = true
          width = readBE(bytes, pos + 8)
          height = readBE(bytes, pos + 12)
          val bitDepth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val compression = bytes(pos + 18) & 0xff
          val filterMethod = bytes(pos + 19) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          // dimension sanity bound — caller-tunable, see decode()'s doc
          require(width.toLong * height <= maxPixels,
            s"unreasonable dimensions ${width}x$height (limit $maxPixels " +
              "px; raise decode(bytes, maxPixels = ...) for larger inputs)")
          colorTyp = colorType
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case 3 => paletted = true; 1 // indices: 1 sample/px pre-lookup
            case 4 => 2 // gray+alpha
            case 6 => 4
            case c => throw new IllegalArgumentException(s"bad color type $c")
          }
          // spec §11.2.2's legal (color type, depth) matrix — anything
          // else refuses loudly, never mis-decodes
          val legal = colorType match {
            case 0 => Set(1, 2, 4, 8, 16)
            case 3 => Set(1, 2, 4, 8)
            case _ => Set(8, 16)
          }
          require(legal(bitDepth),
            s"illegal bit depth $bitDepth for color type $colorType " +
              s"(spec allows ${legal.toSeq.sorted.mkString("/")})")
          depth = bitDepth
          require(compression == 0, s"bad compression method $compression")
          require(filterMethod == 0, s"bad filter method $filterMethod")
          require(interlace == 0 || interlace == 1,
            s"bad interlace method $interlace")
          interlaced = interlace == 1
        case "PLTE" =>
          require(seenIhdr, "PLTE before IHDR")
          require(len % 3 == 0 && len >= 3 && len <= 768, s"bad PLTE size $len")
          plte = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case "tRNS" =>
          require(seenIhdr, "tRNS before IHDR")
          // spec §11.3.2: forbidden on color types that already carry an
          // alpha channel; the payload shape depends on the color type
          // (validated at expansion below, once PLTE is known too)
          require(colorTyp != 4 && colorTyp != 6,
            s"tRNS is forbidden on color type $colorTyp (alpha already present)")
          trns = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      pos += 12 + len
    }
    require(seenIhdr && seenIend, "missing IHDR or IEND")
    require(!paletted || plte != null, "palette image without a PLTE chunk")
    val spp = channels // samples per pixel (palette: 1 index)
    def rowBytesOf(wpx: Int): Int = (wpx * spp * depth + 7) / 8
    val fbpp = math.max(1, spp * depth / 8) // filter offset, spec §9.2
    // expected raw size: one filter byte per PACKED scanline — per
    // Adam7 pass sub-image when interlaced (sub-byte rows pad to a
    // byte boundary at each pass's own width; empty passes contribute
    // nothing)
    val expected =
      if (!interlaced) (rowBytesOf(width) + 1) * height
      else Adam7.map { p =>
        val (pw, ph) = passDims(width, height, p)
        if (pw > 0 && ph > 0) ph * (1 + rowBytesOf(pw)) else 0
      }.sum
    val raw = inflate(idat.toByteArray, expected)
    require(raw.length == expected,
      s"decompressed ${raw.length} bytes, expected $expected")
    val samples = new Array[Int](width * height * spp)
    if (!interlaced) {
      val rb = rowBytesOf(width)
      val px = defilter(raw, 0, rb, height, fbpp)
      var y = 0
      while (y < height) {
        unpackRow(px, y * rb, width * spp, depth, samples, y * width * spp)
        y += 1
      }
    } else {
      // each pass de-filters and unpacks as an independent sub-image,
      // then its SAMPLES scatter back onto the 8×8 lattice
      var off = 0
      Adam7.foreach { pass =>
        val (x0, y0, dx, dy) = pass
        val (pw, ph) = passDims(width, height, pass)
        if (pw > 0 && ph > 0) {
          val rb = rowBytesOf(pw)
          val sub = defilter(raw, off, rb, ph, fbpp)
          off += ph * (1 + rb)
          val rowBuf = new Array[Int](pw * spp)
          var j = 0
          while (j < ph) {
            unpackRow(sub, j * rb, pw * spp, depth, rowBuf, 0)
            var i = 0
            while (i < pw) {
              var ch = 0
              while (ch < spp) {
                samples(((y0 + j * dy) * width + (x0 + i * dx)) * spp + ch) =
                  rowBuf(i * spp + ch)
                ch += 1
              }
              i += 1
            }
            j += 1
          }
        }
      }
    }
    Decoded(width, height, channels, colorTyp, depth, paletted, plte, trns,
      samples)
  }

  /** Spec §7.2 scanline deserialization: sub-byte samples MSB-first
    * within a byte, 16-bit big-endian — one Int per sample. */
  private def unpackRow(row: Array[Byte], base: Int, n: Int, depth: Int,
                        out: Array[Int], outBase: Int): Unit = {
    var s = 0
    var bitPos = 0
    while (s < n) {
      out(outBase + s) =
        if (depth == 16) {
          val bi = base + bitPos / 8
          ((row(bi) & 0xff) << 8) | (row(bi + 1) & 0xff)
        } else if (depth == 8) row(base + bitPos / 8) & 0xff
        else ((row(base + bitPos / 8) & 0xff) >>>
          (8 - depth - bitPos % 8)) & ((1 << depth) - 1)
      bitPos += depth
      s += 1
    }
  }

  /** Reconstruct one (sub-)image's scanlines from `raw` at `off` — the
    * five-filter inverse, shared by the plain path and each Adam7 pass.
    * `stride` = packed scanline bytes; `bpp` = the filter offset. */
  private def defilter(raw: Array[Byte], off: Int, stride: Int, height: Int,
                       bpp: Int): Array[Byte] = {
    val px = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = raw(off + y * (stride + 1)) & 0xff
      require(f <= 4, s"bad filter type $f in row $y")
      var x = 0
      while (x < stride) {
        val v = raw(off + y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) px((y - 1) * stride + x - bpp) & 0xff else 0
        val recon = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case 4 => v + paeth(left, up, ul)
        }
        px(y * stride + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** Paeth predictor, spec §9.4 — the tie-break order (left, up, upper-
    * left) is normative. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ------------------------------------------------------------------
  // container plumbing
  // ------------------------------------------------------------------

  private def writeBE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }
  private def readBE(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  private def writeChunk(out: java.io.ByteArrayOutputStream,
                         typ: String, data: Array[Byte]): Unit = {
    val lenB = new Array[Byte](4); writeBE(lenB, 0, data.length)
    out.write(lenB)
    val typB = typ.getBytes("US-ASCII")
    out.write(typB)
    out.write(data)
    val crc = new CRC32()
    crc.update(typB); crc.update(data)
    val crcB = new Array[Byte](4); writeBE(crcB, 0, crc.getValue.toInt)
    out.write(crcB)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z)
    val out = new java.io.ByteArrayOutputStream(expected)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished() || !inf.needsInput,
        "truncated zlib stream in IDAT")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }
}
