package graft.io

import java.util.zip.{Deflater, Inflater}

/** Pure-JVM TIFF codec (decode + conformant encode) — the ARCHIVAL /
  * scanned-document image class, next to [[PngCodec]] (web lossless) and
  * [[JpegCodec]] (transform-coded): real corpora of scans, scientific
  * captures and print masters arrive as TIFF, and a curation pipeline
  * that can't open them loses the class entirely. Everything derives
  * from the public TIFF 6.0 specification: the II/MM byte-order header,
  * the IFD tag walk, strip-based sample storage, and (for compression 8,
  * the zlib/"AdobeDeflate" form) the JDK's own inflater — no memorized
  * tables anywhere.
  *
  * Decoder scope (documented like the other codecs):
  *   - BOTH byte orders (II little-endian / MM big-endian) — the order
  *     governs every IFD field AND 16-bit sample bytes;
  *   - bit depths 8 and 16 (all samples equal width), 1 or 3 samples
  *     per pixel (grayscale min-is-black / RGB), CHUNKY planar layout;
  *   - compression 1 (none), 5 (LZW — TIFF 6.0 §13: MSB-first codes,
  *     Clear=256/EOI=257, the spec's EARLY code-width change at table
  *     sizes 511/1023/2047, table reset at 4094), 8 (zlib deflate) and
  *     32773 (PackBits — TIFF 6.0 §9: the byte-RLE fax/scan encoders
  *     emit; literal runs 0..127 → n+1 bytes, replicate runs −1..−127
  *     → 1−n copies, −128 a no-op; rows packed separately per spec) —
  *     per STRIP, any RowsPerStrip (strips are TIFF's parallelism/IO
  *     unit: each strip decompresses independently, which is what would
  *     make a tiled 100 TB scan corpus splittable);
  *   - predictor 2 (tag 317, horizontal differencing — the dominant
  *     archival-scan companion to LZW): per-row per-channel deltas on
  *     SAMPLE values (16-bit lanes difference as 16-bit values, then
  *     pack in the file's byte order);
  *   - TILED layout (tags 322/323/324/325 — TIFF 6.0 §15, the layout
  *     large scans/geo rasters actually use): tile dims multiples of
  *     16 per spec, edge tiles PADDED to full tile size in the file
  *     (decode discards the padding), each tile (de)compresses
  *     independently with the predictor resetting per tile row —
  *     tiles are the 2-D splittability unit the way strips are 1-D;
  *   - planar=2, palettes, sub-byte depths, the floating-point
  *     predictor (317=3), and other compressions (CCITT/JPEG-in-TIFF)
  *     are REFUSED with a descriptive error, never mis-decoded.
  *
  * TIFF is LOSSLESS in this scope, so every gate is BIT-EXACT: 8-bit
  * images roundtrip through [[PngCodec.Image]], 16-bit through
  * [[PngCodec.Image16]] — the same two-surface split PNG and JPEG use
  * (the 8-bit [[decode]] refuses 16-bit streams by name). */
object TiffCodec {

  import PngCodec.{Image, Image16}

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  def encode(img: Image, deflate: Boolean = false,
             bigEndian: Boolean = false, lzw: Boolean = false,
             predictor: Boolean = false, tileSize: Int = 0,
             packbits: Boolean = false): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"TIFF encode carries gray or RGB (got ${img.channels} channels)")
    require(Seq(deflate, lzw, packbits).count(identity) <= 1,
      "pick ONE compression (deflate, lzw or packbits)")
    val samples = new Array[Int](img.pixels.length)
    var i = 0
    while (i < samples.length) { samples(i) = img.pixels(i) & 0xff; i += 1 }
    encodeImpl(img.width, img.height, img.channels, 8, samples,
      if (lzw) 5 else if (deflate) 8 else if (packbits) 32773 else 1,
      predictor, bigEndian, tileSize)
  }

  def encode16(img: Image16, deflate: Boolean = false,
               bigEndian: Boolean = false, lzw: Boolean = false,
               predictor: Boolean = false, tileSize: Int = 0,
               packbits: Boolean = false): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"TIFF encode carries gray or RGB (got ${img.channels} channels)")
    require(Seq(deflate, lzw, packbits).count(identity) <= 1,
      "pick ONE compression (deflate, lzw or packbits)")
    val samples = new Array[Int](img.samples.length)
    var i = 0
    while (i < samples.length) { samples(i) = img.samples(i) & 0xffff; i += 1 }
    encodeImpl(img.width, img.height, img.channels, 16, samples,
      if (lzw) 5 else if (deflate) 8 else if (packbits) 32773 else 1,
      predictor, bigEndian, tileSize)
  }

  /** One IFD; strip-based layout by default (RowsPerStrip = 16 — several
    * strips on ordinary fixtures, so the strip walk is really exercised)
    * or TILED when `tile` > 0 (must be a multiple of 16 per §15; edge
    * tiles pad to full size, row-major tile order); sample bytes in the
    * FILE's byte order. `comp`: 1 none / 5 LZW / 8 deflate; `predictor`:
    * horizontal differencing on sample values (resets at every row of
    * the strip/tile; 16-bit lanes difference before byte-packing). */
  private def encodeImpl(w: Int, h: Int, spp: Int, bits: Int,
                         samples: Array[Int], comp: Int, predictor: Boolean,
                         bigEndian: Boolean, tile: Int): Array[Byte] = {
    require(tile == 0 || (tile > 0 && tile % 16 == 0),
      s"tile size must be a positive multiple of 16 (got $tile)")
    val mask = (1 << bits) - 1
    def compress(raw: Array[Byte], rowBytes: Int): Array[Byte] = comp match {
      case 5 => lzwCompress(raw)
      case 8 => zip(raw)
      case 32773 => packbitsCompress(raw, rowBytes)
      case _ => raw
    }
    // pack one rectangular region [x0, x0+rw) × [y0, y0+rh) of the image
    // into a (padW × rh)-shaped buffer (padW ≥ rw pads with zeros — the
    // tiled layout's full-tile file shape); predictor resets per row and
    // runs over the PACKED row (padding included, as a real writer's does)
    def pack(x0: Int, y0: Int, rw: Int, rh: Int, padW: Int,
             padH: Int): Array[Byte] = {
      val rowBytes = padW * spp * (bits / 8)
      val raw = new Array[Byte](padH * rowBytes)
      val row = new Array[Int](padW * spp)
      var r = 0
      while (r < padH) {
        java.util.Arrays.fill(row, 0)
        var c = 0
        while (r < rh && c < rw * spp) {
          row(c) = samples((y0 + r) * w * spp + x0 * spp + c)
          c += 1
        }
        c = 0
        while (c < padW * spp) {
          val v =
            if (predictor && c >= spp) (row(c) - row(c - spp)) & mask
            else row(c)
          if (bits == 8) raw(r * rowBytes + c) = v.toByte
          else {
            val o = r * rowBytes + c * 2
            if (bigEndian) { raw(o) = (v >>> 8).toByte; raw(o + 1) = v.toByte }
            else { raw(o) = v.toByte; raw(o + 1) = (v >>> 8).toByte }
          }
          c += 1
        }
        r += 1
      }
      raw
    }
    val rowsPerStrip = 16
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val tilesAcross = if (tile > 0) (w + tile - 1) / tile else 0
    val tilesDown = if (tile > 0) (h + tile - 1) / tile else 0
    val strips: IndexedSeq[Array[Byte]] =
      if (tile > 0)
        for (ty <- 0 until tilesDown; tx <- 0 until tilesAcross) yield {
          val y0 = ty * tile; val x0 = tx * tile
          compress(pack(x0, y0, math.min(tile, w - x0),
            math.min(tile, h - y0), tile, tile), tile * spp * (bits / 8))
        }
      else
        (0 until nStrips).map { s =>
          val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
          compress(pack(0, s * rowsPerStrip, w, rows, w, rows),
            w * spp * (bits / 8))
        }
    // layout: 8-byte header, IFD, [out-of-line value arrays], strip data
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Seq[Long])]
    // (tag, type, count, values) — type 3 = SHORT, 4 = LONG
    entries += ((256, 4, 1, Seq(w.toLong)))                    // ImageWidth
    entries += ((257, 4, 1, Seq(h.toLong)))                    // ImageLength
    entries += ((258, 3, spp, Seq.fill(spp)(bits.toLong)))     // BitsPerSample
    entries += ((259, 3, 1, Seq(comp.toLong)))                 // Compression
    entries += ((262, 3, 1, Seq(if (spp == 1) 1L else 2L)))    // Photometric
    entries += ((277, 3, 1, Seq(spp.toLong)))                  // SamplesPerPixel
    if (tile > 0) {
      entries += ((322, 4, 1, Seq(tile.toLong)))               // TileWidth
      entries += ((323, 4, 1, Seq(tile.toLong)))               // TileLength
      entries += ((324, 4, strips.length, Seq.fill(strips.length)(0L))) // TileOffsets (patched)
      entries += ((325, 4, strips.length, strips.map(_.length.toLong))) // TileByteCounts
    } else {
      entries += ((273, 4, nStrips, Seq.fill(nStrips)(0L)))    // StripOffsets (patched)
      entries += ((278, 4, 1, Seq(rowsPerStrip.toLong)))       // RowsPerStrip
      entries += ((279, 4, nStrips, strips.map(_.length.toLong))) // StripByteCounts
    }
    if (predictor) entries += ((317, 3, 1, Seq(2L)))           // Predictor
    val sorted = entries.sortBy(_._1) // spec: ascending tag order
    val ifdAt = 8
    val ifdSize = 2 + sorted.length * 12 + 4
    // out-of-line arrays land right after the IFD
    var extraAt = ifdAt + ifdSize
    val extraOffsets = sorted.map { case (_, typ, count, _) =>
      val sz = count * (if (typ == 3) 2 else 4)
      if (sz > 4) { val at = extraAt; extraAt += sz; at } else -1
    }
    val dataAt = extraAt
    val stripOffsets = strips.scanLeft(dataAt.toLong)(_ + _.length).init
    val patched = sorted.map { case e @ (tag, typ, count, _) =>
      if (tag == 273 || tag == 324) (tag, typ, count, stripOffsets) else e
    }
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { out.write(v >>> 8); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write(v >>> 8) }
    def w32(v: Long): Unit =
      if (bigEndian) { out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
        out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt) }
      else { out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
        out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt) }
    // header
    out.write(if (bigEndian) 'M' else 'I'); out.write(if (bigEndian) 'M' else 'I')
    w16(42); w32(ifdAt.toLong)
    // IFD
    w16(patched.length)
    patched.zipWithIndex.foreach { case ((tag, typ, count, values), i) =>
      w16(tag); w16(typ); w32(count.toLong)
      val sz = count * (if (typ == 3) 2 else 4)
      if (sz <= 4) {
        // inline values, padded to 4 bytes (written value-by-value in
        // the file's byte order, left-justified per spec)
        val before = out.size()
        values.foreach(v => if (typ == 3) w16(v.toInt) else w32(v))
        while (out.size() - before < 4) out.write(0)
      } else w32(extraOffsets(i).toLong)
    }
    w32(0L) // next IFD: none
    // out-of-line arrays
    patched.zipWithIndex.foreach { case ((_, typ, count, values), i) =>
      if (count * (if (typ == 3) 2 else 4) > 4)
        values.foreach(v => if (typ == 3) w16(v.toInt) else w32(v))
    }
    strips.foreach(out.write(_))
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  def decode(bytes: Array[Byte], maxPixels: Long = 1L << 24): Image = {
    val (w, h, spp, bits, samples) = decodeImpl(bytes, maxPixels)
    require(bits == 8,
      "16-bit TIFF: decode() would halve sample precision silently — " +
        "decode16() preserves it")
    Image(w, h, spp, samples.map(_.toByte))
  }

  /** Cheap dispatch probe: BitsPerSample (tag 258) from the first IFD —
    * byte-order-aware tag walk, no strip touched. Answers 8 when the
    * walk can't conclude (the routed decode re-validates everything), so
    * [[ImageCodecs.decodeAny]] picks its surface WITHOUT
    * exception-message matching. */
  def bitsProbe(bytes: Array[Byte]): Int = try {
    if (bytes.length < 8) return 8
    val le = bytes(0) == 'I'
    def u16(p: Int): Int =
      if (le) (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      else ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    def u32(p: Int): Long =
      if (le) (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
      else ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    val ifd = u32(4).toInt
    val n = u16(ifd)
    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12
      if (u16(e) == 258) {
        val typ = u16(e + 2); val count = u32(e + 4)
        val width = if (typ == 3) 2 else 4
        val vp = if (count * width <= 4) e + 8 else u32(e + 8).toInt
        return if (typ == 3) u16(vp) else u32(vp).toInt
      }
      i += 1
    }
    8
  } catch { case _: Exception => 8 }

  def decode16(bytes: Array[Byte], maxPixels: Long = 1L << 24): Image16 = {
    val (w, h, spp, bits, samples) = decodeImpl(bytes, maxPixels)
    require(bits == 16, s"$bits-bit TIFF: decode() is the 8-bit surface")
    Image16(w, h, spp, samples.map(_.toShort))
  }

  private def decodeImpl(bytes: Array[Byte],
                         maxPixels: Long): (Int, Int, Int, Int, Array[Int]) = {
    require(bytes.length >= 8, "not a TIFF: too short")
    val le = (bytes(0) & 0xff, bytes(1) & 0xff) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException(
        "not a TIFF: bad byte-order mark")
    }
    def u16(p: Int): Int = {
      require(p >= 0 && p + 2 <= bytes.length, "truncated TIFF")
      if (le) (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      else ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    }
    def u32(p: Int): Long = {
      require(p >= 0 && p + 4 <= bytes.length, "truncated TIFF")
      if (le) (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
      else ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    }
    require(u16(2) == 42, s"not a TIFF: bad magic ${u16(2)}")
    val ifdAt = u32(4)
    require(ifdAt >= 8 && ifdAt < bytes.length, "bad IFD offset")
    val n = u16(ifdAt.toInt)
    require(n > 0 && n < 4096, s"unreasonable IFD entry count $n")
    // tag -> (type, count, value position)
    var w = 0L; var h = 0L; var spp = 1; var bits = -1
    var compression = 1; var photometric = -1; var rowsPerStrip = Long.MaxValue
    var planar = 1; var predictor = 1
    var stripOff: Vector[Long] = Vector.empty
    var stripLen: Vector[Long] = Vector.empty
    var tileW = 0; var tileL = 0
    var tileOff: Vector[Long] = Vector.empty
    var tileLen: Vector[Long] = Vector.empty
    var i = 0
    while (i < n) {
      val e = ifdAt.toInt + 2 + i * 12
      val tag = u16(e); val typ = u16(e + 2); val count = u32(e + 4)
      require(count >= 0 && count < (1L << 24), s"unreasonable tag count $count")
      def width = if (typ == 3) 2 else if (typ == 4) 4 else
        throw new IllegalArgumentException(
          s"unsupported value type $typ for tag $tag (SHORT/LONG)")
      def valPos: Int =
        if (count * width <= 4) e + 8 else u32(e + 8).toInt
      def value(j: Int): Long = {
        val p = valPos + j * width
        if (typ == 3) u16(p).toLong else u32(p)
      }
      tag match {
        case 256 => w = value(0)
        case 257 => h = value(0)
        case 258 =>
          bits = value(0).toInt
          var j = 1
          while (j < count) {
            require(value(j).toInt == bits,
              "unsupported: mixed per-sample bit depths")
            j += 1
          }
        case 259 => compression = value(0).toInt
        case 262 => photometric = value(0).toInt
        case 273 => stripOff = (0 until count.toInt).map(value(_)).toVector
        case 277 => spp = value(0).toInt
        case 278 => rowsPerStrip = value(0)
        case 279 => stripLen = (0 until count.toInt).map(value(_)).toVector
        case 284 => planar = value(0).toInt
        case 317 => predictor = value(0).toInt
        case 322 => tileW = value(0).toInt
        case 323 => tileL = value(0).toInt
        case 324 => tileOff = (0 until count.toInt).map(value(_)).toVector
        case 325 => tileLen = (0 until count.toInt).map(value(_)).toVector
        case _ => () // ancillary tags skipped (resolution, software, ...)
      }
      i += 1
    }
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(w * h <= maxPixels,
      s"unreasonable dimensions ${w}x$h (limit $maxPixels px; raise " +
        "decode(bytes, maxPixels = ...) for larger inputs)")
    require(bits == 8 || bits == 16, s"unsupported bit depth $bits (8/16)")
    require(spp == 1 || spp == 3,
      s"unsupported samples-per-pixel $spp (gray or RGB)")
    require(compression == 1 || compression == 5 || compression == 8 ||
      compression == 32773,
      s"unsupported compression $compression (1 = none, 5 = LZW, 32773 = PackBits, " +
        "8 = deflate; CCITT/JPEG-in-TIFF are off-scope)")
    require(planar == 1, "unsupported: planar configuration 2 (chunky only)")
    require(predictor == 1 || predictor == 2,
      s"unsupported predictor $predictor (1 = none, 2 = horizontal; " +
        "the floating-point predictor 3 is off-scope)")
    require(photometric == (if (spp == 1) 1 else 2) || photometric < 0,
      s"unsupported photometric $photometric for $spp sample(s)")
    val tiled = tileW > 0 || tileL > 0 || tileOff.nonEmpty || tileLen.nonEmpty
    require(!tiled || stripOff.isEmpty,
      "malformed: both strip and tile location tags present")
    val wi = w.toInt; val hi = h.toInt
    val samples = new Array[Int](wi * hi * spp)
    val mask = (1 << bits) - 1
    def decompressed(idx: Int, off: Long, len: Long, expect: Int,
                     what: String): Array[Byte] = {
      require(off >= 0 && len >= 0 && off + len <= bytes.length,
        s"$what $idx [$off, ${off + len}) outside the file")
      val raw = compression match {
        case 1 => java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
        case 5 => lzwDecompress(bytes, off.toInt, len.toInt, expect)
        case 32773 => packbitsDecompress(bytes, off.toInt, len.toInt, expect)
        case _ => unzip(bytes, off.toInt, len.toInt, expect)
      }
      require(raw.length == expect,
        s"$what $idx carries ${raw.length} bytes, expected $expect")
      raw
    }
    // one region of `regW`-wide packed rows lands at (x0, y0); predictor
    // accumulates within the PACKED row (padding included — the writer's
    // convention), and only the image intersection is kept
    def unpackRegion(raw: Array[Byte], x0: Int, y0: Int, regW: Int,
                     regH: Int): Unit = {
      val rowBytes = regW * spp * (bits / 8)
      val row = new Array[Int](regW * spp)
      var r = 0
      while (r < regH) {
        var c = 0
        while (c < regW * spp) {
          val v =
            if (bits == 8) raw(r * rowBytes + c) & 0xff
            else {
              val o = r * rowBytes + c * 2
              if (le) (raw(o) & 0xff) | ((raw(o + 1) & 0xff) << 8)
              else ((raw(o) & 0xff) << 8) | (raw(o + 1) & 0xff)
            }
          row(c) =
            if (predictor == 2 && c >= spp) (v + row(c - spp)) & mask
            else v
          c += 1
        }
        val y = y0 + r
        if (y < hi) {
          val keep = math.min(regW, wi - x0) * spp
          var k = 0
          while (k < keep) {
            samples(y * wi * spp + x0 * spp + k) = row(k)
            k += 1
          }
        }
        r += 1
      }
    }
    if (tiled) {
      require(tileW > 0 && tileW % 16 == 0 && tileL > 0 && tileL % 16 == 0,
        s"bad tile dims ${tileW}x$tileL (positive multiples of 16, §15)")
      // a corrupt tile header must not allocate past the caller's pixel
      // budget (the same pre-allocation bound the image dims carry)
      require(tileW.toLong * tileL <= maxPixels,
        s"unreasonable tile dims ${tileW}x$tileL (limit $maxPixels px)")
      require(tileOff.nonEmpty && tileOff.length == tileLen.length,
        s"tile offsets (${tileOff.length}) and counts (${tileLen.length}) disagree")
      val across = (wi + tileW - 1) / tileW
      val down = (hi + tileL - 1) / tileL
      require(tileOff.length == across * down,
        s"tile count ${tileOff.length} does not cover ${across}x$down tiles")
      val tileBytes = tileW * tileL * spp * (bits / 8)
      var t = 0
      while (t < tileOff.length) {
        val raw = decompressed(t, tileOff(t), tileLen(t), tileBytes, "tile")
        unpackRegion(raw, (t % across) * tileW, (t / across) * tileL,
          tileW, tileL)
        t += 1
      }
    } else {
      require(stripOff.nonEmpty && stripOff.length == stripLen.length,
        s"strip offsets (${stripOff.length}) and counts (${stripLen.length}) disagree")
      val rps = math.min(rowsPerStrip, h).toInt
      require(rps > 0, "bad RowsPerStrip")
      require(stripOff.length.toLong == (hi + rps - 1) / rps,
        s"strip count ${stripOff.length} does not cover $hi rows at $rps/strip")
      val rowBytes = wi * spp * (bits / 8)
      var s = 0
      while (s < stripOff.length) {
        val rows = math.min(rps, hi - s * rps)
        val raw = decompressed(s, stripOff(s), stripLen(s), rows * rowBytes,
          "strip")
        unpackRegion(raw, 0, s * rps, wi, rows)
        s += 1
      }
    }
    (wi, hi, spp, bits, samples)
  }

  // ------------------------------------------------------------------
  // PackBits (TIFF 6.0 §9) — the byte-oriented RLE of the fax/scan
  // world. Header byte n signed: 0..127 → copy the next n+1 bytes
  // literally; −1..−127 → replicate the next byte 1−n times; −128 →
  // no-op. The spec packs EACH ROW separately (never a run across a
  // row boundary) — the encoder honors that; the decoder is row-
  // agnostic by construction (the stream concatenates losslessly).
  // private[graft] so the spec can pin hand-built vectors directly.
  // ------------------------------------------------------------------

  private[graft] def packbitsCompress(raw: Array[Byte], rowBytes: Int): Array[Byte] = {
    require(rowBytes > 0, s"rowBytes must be positive: $rowBytes")
    val out = new java.io.ByteArrayOutputStream(raw.length + raw.length / 127 + 8)
    var rs = 0
    while (rs < raw.length) {
      val re = math.min(rs + rowBytes, raw.length)
      var i = rs
      while (i < re) {
        var j = i + 1
        while (j < re && raw(j) == raw(i) && j - i < 128) j += 1
        if (j - i >= 2) { // replicate run: header 1−n for n copies
          out.write(1 - (j - i))
          out.write(raw(i))
          i = j
        } else { // literal run: stop at a ≥3-byte replicate or 128 bytes
          val start = i
          var k = i + 1
          while (k < re && k - start < 128 &&
                 !(k + 2 < re && raw(k) == raw(k + 1) && raw(k) == raw(k + 2)))
            k += 1
          out.write(k - start - 1)
          out.write(raw, start, k - start)
          i = k
        }
      }
      rs = re
    }
    out.toByteArray
  }

  private[graft] def packbitsDecompress(z: Array[Byte], off: Int, len: Int,
                                        expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = off; val end = off + len; var o = 0
    while (i < end && o < expect) {
      val n = z(i); i += 1
      if (n >= 0) {
        require(i + n + 1 <= end, "PackBits literal overruns the strip")
        require(o + n + 1 <= expect, "PackBits literal overruns the region")
        System.arraycopy(z, i, out, o, n + 1); i += n + 1; o += n + 1
      } else if (n != -128) { // −128 is the spec's explicit no-op
        require(i < end, "PackBits run overruns the strip")
        require(o + (1 - n) <= expect, "PackBits run overruns the region")
        java.util.Arrays.fill(out, o, o + 1 - n, z(i)); i += 1; o += 1 - n
      }
    }
    require(o == expect, s"PackBits stream produced $o of $expect bytes")
    out
  }

  // ------------------------------------------------------------------
  // LZW (TIFF 6.0 §13) — MSB-first code packing, Clear=256 / EOI=257,
  // first table code 258, the spec's EARLY code-width change (9→10 bits
  // when the next free code reaches 511, →11 at 1023, →12 at 2047 —
  // one code earlier than GIF), table reset via Clear at 4094.
  // private[graft] so the spec can pin the bitstream and the reset path
  // directly, independent of the strip plumbing.
  // ------------------------------------------------------------------

  private[graft] def lzwCompress(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 16)
    var acc = 0L; var nAcc = 0
    var bits = 9
    def put(code: Int): Unit = {
      acc = (acc << bits) | code; nAcc += bits
      while (nAcc >= 8) { out.write(((acc >>> (nAcc - 8)) & 0xff).toInt); nAcc -= 8 }
    }
    // dictionary: key = (prefixCode << 8) | nextByte  (codes < 4096)
    val dict = new java.util.HashMap[Integer, Integer](4096)
    var nextCode = 258
    put(256) // spec: every strip's code stream begins with Clear
    if (raw.nonEmpty) {
      var prefix = raw(0) & 0xff
      var i = 1
      while (i < raw.length) {
        val k = raw(i) & 0xff
        val key = (prefix << 8) | k
        val e = dict.get(key)
        if (e != null) prefix = e.intValue()
        else {
          put(prefix)
          dict.put(key, nextCode); nextCode += 1
          if (nextCode == (1 << bits) - 1 && bits < 12) bits += 1
          if (nextCode == 4094) { // table full: reset mid-stream
            put(256)
            dict.clear(); nextCode = 258; bits = 9
          }
          prefix = k
        }
        i += 1
      }
      put(prefix)
    }
    put(257) // EOI
    if (nAcc > 0) out.write(((acc << (8 - nAcc)) & 0xff).toInt) // flush, zero-pad
    out.toByteArray
  }

  private[graft] def lzwDecompress(z: Array[Byte], off: Int, len: Int,
                                   expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outAt = 0
    var acc = 0L; var nAcc = 0; var at = off
    var bits = 9
    def next(): Int = {
      while (nAcc < bits) {
        require(at < off + len && at < z.length, "truncated LZW strip (no EOI)")
        acc = (acc << 8) | (z(at) & 0xff); at += 1; nAcc += 8
      }
      nAcc -= bits
      ((acc >>> nAcc) & ((1 << bits) - 1)).toInt
    }
    // table: code -> (prefix code, final byte); strings emit via walk-back
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var nextCode = 258
    def emit(code: Int): Byte = { // returns the string's FIRST byte
      var c = code; var top = 0
      while (c >= 258) {
        require(top < stack.length, "corrupt LZW table chain")
        stack(top) = suffix(c); top += 1; c = prefix(c)
      }
      val first = c.toByte
      require(outAt + top + 1 <= expected,
        "LZW strip inflates past its declared row span")
      out(outAt) = first; outAt += 1
      while (top > 0) { top -= 1; out(outAt) = stack(top); outAt += 1 }
      first
    }
    var old = -1
    var code = next()
    while (code != 257) {
      if (code == 256) { // Clear: reset table and width, re-prime
        nextCode = 258; bits = 9; old = -1
        code = next()
        if (code != 257) {
          require(code < 256, s"LZW code $code right after Clear")
          emit(code); old = code
          code = next()
        }
      } else {
        require(old >= 0, s"LZW stream must start with Clear (got $code)")
        // the decoder's table lags the encoder's by ONE entry (it learns
        // entry n only from the code AFTER the one that created it), so
        // its width change fires one entry earlier: at (1<<bits)-2 where
        // the encoder fires at (1<<bits)-1
        if (code < nextCode && code != 256 && code != 257) {
          val first = emit(code)
          if (nextCode < 4096) {
            prefix(nextCode) = old; suffix(nextCode) = first; nextCode += 1
            if (nextCode == (1 << bits) - 2 && bits < 12) bits += 1
          }
          old = code
        } else if (code == nextCode) { // the KwKwK case
          // string = table[old] + firstByte(table[old])
          var c = old
          while (c >= 258) c = prefix(c)
          prefix(nextCode) = old; suffix(nextCode) = c.toByte
          emit(nextCode)
          nextCode += 1
          if (nextCode == (1 << bits) - 2 && bits < 12) bits += 1
          old = code
        } else throw new IllegalArgumentException(
          s"LZW code $code beyond table size $nextCode")
        code = next()
      }
    }
    require(outAt == expected,
      s"LZW strip carries $outAt bytes, expected $expected")
    out
  }

  private def zip(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def unzip(z: Array[Byte], off: Int, len: Int,
                    expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z, off, len)
    val out = new java.io.ByteArrayOutputStream(expected)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished() || !inf.needsInput,
        "truncated zlib stream in TIFF strip")
      // a strip cannot legally inflate past its declared row span —
      // bound the allocation before trusting the stream
      require(out.size() + n <= expected + 8192,
        "TIFF strip inflates past its declared size")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }
}
