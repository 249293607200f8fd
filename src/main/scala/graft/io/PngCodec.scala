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
  * bit depth 8, ALL FIVE color types — 0 (grayscale), 2 (RGB), 3
  * (PALETTE — the web-graphics layout: PLTE lookup, indices filtered
  * at 1 byte/px), 4 (gray+alpha, 2 bytes/px) and 6 (RGBA) — BOTH
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

  def encode(img: Image, interlaced: Boolean = false,
             palette: Boolean = false): Array[Byte] = {
    require(!palette || img.channels != 2,
      "palette encode carries gray/RGB/RGBA images (gray+alpha is type 4)")
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
    val ihdr = new Array[Byte](13)
    writeBE(ihdr, 0, img.width)
    writeBE(ihdr, 4, img.height)
    ihdr(8) = 8            // bit depth
    ihdr(9) = colorType.toByte
    ihdr(10) = 0           // compression: deflate
    ihdr(11) = 0           // filter method 0
    ihdr(12) = if (interlaced) 1 else 0
    val raw =
      if (!interlaced) filterRows(data, img.width, img.height, bpp)
      else {
        // each Adam7 pass filters as an INDEPENDENT sub-image
        val o = new java.io.ByteArrayOutputStream()
        Adam7.foreach { pass =>
          val (x0, y0, dx, dy) = pass
          val (pw, ph) = passDims(img.width, img.height, pass)
          if (pw > 0 && ph > 0) {
            val sub = new Array[Byte](pw * ph * bpp)
            var j = 0
            while (j < ph) {
              var i = 0
              while (i < pw) {
                var ch = 0
                while (ch < bpp) {
                  sub((j * pw + i) * bpp + ch) =
                    data(((y0 + j * dy) * img.width + (x0 + i * dx)) * bpp + ch)
                  ch += 1
                }
                i += 1
              }
              j += 1
            }
            o.write(filterRows(sub, pw, ph, bpp))
          }
        }
        o.toByteArray
      }
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

  /** Per-row adaptive filtering: the spec's minimum-sum-of-absolute-
    * differences heuristic over all five filter types. */
  private def filterRows(pixels: Array[Byte], width: Int, height: Int,
                         bpp: Int): Array[Byte] = {
    val stride = width * bpp
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
    * the [[JpegCodec.decode]] contract. */
  def decode(bytes: Array[Byte], maxPixels: Long = 1L << 24): Image = {
    require(bytes.length >= 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not a PNG: bad signature")
    var pos = 8
    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    var interlaced = false
    var paletted = false
    var colorTyp = -1
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
          require(bitDepth == 8, s"unsupported bit depth $bitDepth (only 8)")
          colorTyp = colorType
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case 3 => paletted = true; 1 // indices: 1 byte/px pre-lookup
            case 4 => 2 // gray+alpha
            case 6 => 4
            case c => throw new IllegalArgumentException(s"bad color type $c")
          }
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
    val bpp = channels
    val stride = width * bpp
    // expected raw size: one filter byte per scanline — per Adam7 pass
    // sub-image when interlaced (empty passes contribute nothing)
    val expected =
      if (!interlaced) (stride + 1) * height
      else Adam7.map { p =>
        val (pw, ph) = passDims(width, height, p)
        if (pw > 0 && ph > 0) ph * (1 + pw * bpp) else 0
      }.sum
    val raw = inflate(idat.toByteArray, expected)
    require(raw.length == expected,
      s"decompressed ${raw.length} bytes, expected $expected")
    val px =
      if (!interlaced) defilter(raw, 0, width, height, bpp)
      else {
        // each pass de-filters as an independent sub-image, then its
        // pixels scatter back onto the 8×8 lattice
        val full = new Array[Byte](stride * height)
        var off = 0
        Adam7.foreach { pass =>
          val (x0, y0, dx, dy) = pass
          val (pw, ph) = passDims(width, height, pass)
          if (pw > 0 && ph > 0) {
            val sub = defilter(raw, off, pw, ph, bpp)
            off += ph * (1 + pw * bpp)
            var j = 0
            while (j < ph) {
              var i = 0
              while (i < pw) {
                var ch = 0
                while (ch < bpp) {
                  full(((y0 + j * dy) * width + (x0 + i * dx)) * bpp + ch) =
                    sub((j * pw + i) * bpp + ch)
                  ch += 1
                }
                i += 1
              }
              j += 1
            }
          }
        }
        full
      }
    if (paletted) {
      // PLTE lookup: indices → RGB triples; with tRNS, → RGBA (per-entry
      // alpha, entries past the tRNS length implied fully opaque —
      // spec §11.3.2 lets tRNS truncate after the last non-opaque entry)
      val n = plte.length / 3
      require(trns == null || trns.length <= n,
        s"tRNS carries ${trns.length} alphas for $n palette entries")
      val outCh = if (trns == null) 3 else 4
      val out = new Array[Byte](width * height * outCh)
      var p = 0
      while (p < width * height) {
        val idx = px(p) & 0xff
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
    } else if (trns != null && colorTyp == 0) {
      // gray color key: the keyed sample value reads fully transparent —
      // expansion carries the alpha as data (gray → gray+alpha)
      require(trns.length == 2, s"bad tRNS length ${trns.length} for gray")
      val key = trns(1) & 0xff // depth 8: low byte of the 2-byte sample
      val out = new Array[Byte](width * height * 2)
      var p = 0
      while (p < width * height) {
        val g = px(p) & 0xff
        out(p * 2) = px(p)
        out(p * 2 + 1) = if (g == key) 0 else 255.toByte
        p += 1
      }
      Image(width, height, 2, out)
    } else if (trns != null && colorTyp == 2) {
      // RGB color key → RGBA
      require(trns.length == 6, s"bad tRNS length ${trns.length} for RGB")
      val kr = trns(1) & 0xff; val kg = trns(3) & 0xff; val kb = trns(5) & 0xff
      val out = new Array[Byte](width * height * 4)
      var p = 0
      while (p < width * height) {
        val r = px(p * 3) & 0xff; val g = px(p * 3 + 1) & 0xff
        val b = px(p * 3 + 2) & 0xff
        out(p * 4) = px(p * 3)
        out(p * 4 + 1) = px(p * 3 + 1)
        out(p * 4 + 2) = px(p * 3 + 2)
        out(p * 4 + 3) = if (r == kr && g == kg && b == kb) 0 else 255.toByte
        p += 1
      }
      Image(width, height, 4, out)
    } else Image(width, height, channels, px)
  }

  /** Reconstruct one (sub-)image's scanlines from `raw` at `off` — the
    * five-filter inverse, shared by the plain path and each Adam7 pass. */
  private def defilter(raw: Array[Byte], off: Int, width: Int, height: Int,
                       bpp: Int): Array[Byte] = {
    val stride = width * bpp
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
