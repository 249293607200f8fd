package graft.io

/** Pure-JVM Ogg Vorbis I codec (decode + conformant encode) — the
  * MP3/Vorbis-class LOSSY format family the reference receives
  * transparently through pydub/ffmpeg (`README.md:3` "could easily be
  * reconfigured for other formats"), next to [[FlacCodec]] (lossless),
  * [[AdpcmCodec]] and [[G711Codec]] (telephony). Vorbis was chosen over
  * MP3 deliberately: Vorbis I is SELF-DESCRIBING — huffman codebooks
  * ship in the stream's setup header (canonically assigned by the spec
  * algorithm, §3.2.1), windows are closed-form (§4.3.1), and the MDCT is
  * plain math — so a faithful implementation carries no multi-thousand-
  * entry memorized spec tables the way MPEG layers do (their huffman +
  * synthesis-window tables), which keeps every line derivable from the
  * public Vorbis I specification.
  *
  * Decoder scope (documented like ADPCM's mono scope): mono, single
  * logical stream, equal blocksizes (all-long-block streams — the
  * blocksize_0 == blocksize_1 case, so no long/short window transition
  * machinery), floor type 1, residue types 1 and 2 (type 2 degenerates
  * to type 1 at one channel), mapping type 0 without coupling. Within
  * that scope the decode path is the REAL spec machinery: Ogg CRC
  * pages, LSB-first bitpacking, canonical huffman assignment over
  * in-band codebooks (sparse + ordered forms, VQ lookup types 1 and 2,
  * packed float32), floor-1 integer curve synthesis (render_point /
  * render_line error accumulation exactly as specified), cascade-driven
  * residue partitioning, IMDCT + windowed overlap-add, granule-position
  * trimming. Everything a conformant mono long-block stream from
  * another encoder would exercise.
  *
  * The one reconstructed constant: floor1_inverse_dB_table (§7.2.2's
  * 256-entry table) is generated from its closed form
  * `table[x] = 10^(7·(x−255)/256)` — the published endpoints
  * (1.0649863e-07 … 1.0) pin the exponential's base to exactly
  * 7·ln(10)/256 per step.
  *
  * Encoder: a minimal but SPEC-CONFORMANT mono encoder (what
  * [[FlacCodec]]/[[AdpcmCodec]] do for their formats): blocksize 512,
  * one flat floor-1 segment per frame (partitions = 0, the amplitude
  * level picked per frame), residue type 1 with a 2-class cascade
  * (zero / coded partitions) and one dim-4 lookup-type-1 VQ book over
  * quantized values {−2..2}. Lossy by design — the fixtures'
  * round-trip error is bounded and deterministic, so pipeline metadata
  * freezes into golden oracles exactly like q30/q259's. */
object VorbisCodec {

  // ------------------------------------------------------------------
  // shared constants
  // ------------------------------------------------------------------

  /** §7.2.2: floor decibel amplitude table, closed form (see header). */
  private[graft] val inverseDbTable: Array[Float] =
    Array.tabulate(256)(x => math.pow(10.0, 7.0 * (x - 255) / 256.0).toFloat)

  /** ilog per spec §9.2.1: position of the highest set bit, ilog(0)=0. */
  private[graft] def ilog(x: Int): Int = {
    var v = x
    var r = 0
    while (v > 0) { r += 1; v >>= 1 }
    r
  }

  /** §9.2.2 float32_unpack: 21-bit mantissa, 10-bit exponent bias 788. */
  private[graft] def float32Unpack(x: Int): Float = {
    val mant = x & 0x1fffff
    val exp = (x >>> 21) & 0x3ff
    val v = mant.toDouble * math.pow(2.0, exp - 788)
    (if ((x & 0x80000000) != 0) -v else v).toFloat
  }

  /** Pack an integer-valued float (all this encoder needs): exponent
    * 788 makes the mantissa the literal magnitude. */
  private def float32PackInt(v: Int): Int = {
    val neg = v < 0
    val mag = math.abs(v)
    require(mag < (1 << 21), s"float32 pack out of mantissa range: $v")
    (if (neg) 0x80000000 else 0) | (788 << 21) | mag
  }

  // ------------------------------------------------------------------
  // codebooks
  // ------------------------------------------------------------------

  private[graft] final class Codebook(val dims: Int, val entries: Int,
                                   val lengths: Array[Int], // 0 = unused
                                   val lookupType: Int, val minVal: Float,
                                   val deltaVal: Float, val sequenceP: Boolean,
                                   val multiplicands: Array[Int]) {
    // Canonical codeword assignment (§3.2.1): entries in order, each
    // taking the numerically smallest unused codeword of its length.
    // Trie with an occupancy bit; DFS preferring the 0 branch yields
    // exactly that smallest codeword.
    private val treeL = scala.collection.mutable.ArrayBuffer[Int](-1) // child on 0-bit
    private val treeR = scala.collection.mutable.ArrayBuffer[Int](-1) // child on 1-bit
    private val leaf = scala.collection.mutable.ArrayBuffer[Int](-1)  // entry at node
    private val full = scala.collection.mutable.ArrayBuffer[Boolean](false)
    val codes: Array[Long] = new Array[Long](entries)   // MSB-first value
    val codeLens: Array[Int] = new Array[Int](entries)

    private def newNode(): Int = {
      treeL += -1; treeR += -1; leaf += -1; full += false
      treeL.length - 1
    }

    private def place(node: Int, len: Int, code: Long): Long = {
      if (full(node)) return -1L
      if (len == 0) {
        if (treeL(node) != -1 || treeR(node) != -1 || leaf(node) != -1) return -1L
        full(node) = true
        return code
      }
      if (leaf(node) != -1) return -1L
      if (treeL(node) == -1) treeL(node) = newNode()
      var got = place(treeL(node), len - 1, code << 1)
      if (got < 0) {
        if (treeR(node) == -1) treeR(node) = newNode()
        got = place(treeR(node), len - 1, (code << 1) | 1)
      }
      if (got >= 0 && treeL(node) != -1 && treeR(node) != -1 &&
          full(treeL(node)) && full(treeR(node)))
        full(node) = true
      got
    }

    locally {
      var i = 0
      while (i < entries) {
        if (lengths(i) > 0) {
          val code = place(0, lengths(i), 0L)
          require(code >= 0, s"over-specified codebook: entry $i len ${lengths(i)} unplaceable")
          codes(i) = code
          codeLens(i) = lengths(i)
          // record the leaf for decode: re-walk to mark entry id
          var node = 0
          var j = lengths(i) - 1
          while (j >= 0) {
            node = if (((code >> j) & 1L) == 0L) treeL(node) else treeR(node)
            j -= 1
          }
          leaf(node) = i
        }
        i += 1
      }
    }

    /** Walk the tree one stream bit at a time (§3.2.1 decode). */
    def decodeEntry(br: OggBitReader): Int = {
      var node = 0
      while (leaf(node) == -1) {
        val next = if (br.read(1) == 0) treeL(node) else treeR(node)
        require(next != -1, "huffman walk hit an unassigned branch")
        node = next
      }
      leaf(node)
    }

    def writeEntry(bw: OggBitWriter, entry: Int): Unit = {
      val len = codeLens(entry)
      require(len > 0, s"entry $entry has no codeword")
      var j = len - 1
      while (j >= 0) { bw.write(((codes(entry) >> j) & 1L).toInt, 1); j -= 1 }
    }

    /** §3.3 VQ vector for an entry (lookup types 1/2). */
    def vq(entry: Int): Array[Float] = {
      val v = new Array[Float](dims)
      var last = 0.0f
      if (lookupType == 1) {
        val lv = lookup1Values(entries, dims)
        var idxDiv = 1
        var j = 0
        while (j < dims) {
          val off = (entry / idxDiv) % lv
          v(j) = multiplicands(off) * deltaVal + minVal + last
          if (sequenceP) last = v(j)
          idxDiv *= lv
          j += 1
        }
      } else {
        var j = 0
        while (j < dims) {
          v(j) = multiplicands(entry * dims + j) * deltaVal + minVal + last
          if (sequenceP) last = v(j)
          j += 1
        }
      }
      v
    }
  }

  /** §3.2 lookup1_values: largest v with v^dims <= entries. */
  private[graft] def lookup1Values(entries: Int, dims: Int): Int = {
    var v = 1
    while (math.pow(v + 1, dims).toLong <= entries) v += 1
    v
  }

  private def readCodebook(br: OggBitReader): Codebook = {
    require(br.read(24) == 0x564342, "bad codebook sync pattern")
    val dims = br.read(16)
    val entries = br.read(24)
    val ordered = br.flag()
    val lengths = new Array[Int](entries)
    if (!ordered) {
      val sparse = br.flag()
      var i = 0
      while (i < entries) {
        if (sparse) {
          if (br.flag()) lengths(i) = br.read(5) + 1
        } else lengths(i) = br.read(5) + 1
        i += 1
      }
    } else {
      var cur = br.read(5) + 1
      var i = 0
      while (i < entries) {
        val num = br.read(ilog(entries - i))
        require(num <= entries - i, "ordered codebook overruns entries")
        var j = 0
        while (j < num) { lengths(i + j) = cur; j += 1 }
        i += num
        cur += 1
        require(cur <= 32 || i >= entries, "ordered codebook length overflow")
      }
    }
    val lookupType = br.read(4)
    require(lookupType <= 2, s"reserved codebook lookup type $lookupType")
    if (lookupType == 0) {
      new Codebook(dims, entries, lengths, 0, 0f, 0f, sequenceP = false, Array.empty)
    } else {
      val minV = float32Unpack(br.read(32))
      val deltaV = float32Unpack(br.read(32))
      val valueBits = br.read(4) + 1
      val seqP = br.flag()
      val count = if (lookupType == 1) lookup1Values(entries, dims) else entries * dims
      val mults = Array.fill(count)(br.read(valueBits))
      new Codebook(dims, entries, lengths, lookupType, minV, deltaV, seqP, mults)
    }
  }

  private def writeCodebook(bw: OggBitWriter, cb: Codebook, valueBits: Int): Unit = {
    bw.write(0x564342, 24)
    bw.write(cb.dims, 16)
    bw.write(cb.entries, 24)
    bw.writeFlag(false) // unordered
    bw.writeFlag(false) // non-sparse
    var i = 0
    while (i < cb.entries) { bw.write(cb.lengths(i) - 1, 5); i += 1 }
    bw.write(cb.lookupType, 4)
    if (cb.lookupType != 0) {
      bw.write(float32PackInt(math.round(cb.minVal)), 32)
      bw.write(float32PackInt(math.round(cb.deltaVal)), 32)
      bw.write(valueBits - 1, 4)
      bw.writeFlag(cb.sequenceP)
      cb.multiplicands.foreach(m => bw.write(m, valueBits))
    }
  }

  // ------------------------------------------------------------------
  // setup-header component configs
  // ------------------------------------------------------------------

  private final case class Floor1(partitionClasses: Array[Int],
                                  classDims: Array[Int], classSubclasses: Array[Int],
                                  classMasterbooks: Array[Int], subclassBooks: Array[Array[Int]],
                                  multiplier: Int, rangebits: Int, xList: Array[Int])

  private final case class Residue(tpe: Int, begin: Int, end: Int, partitionSize: Int,
                                   classifications: Int, classbook: Int,
                                   cascade: Array[Int], books: Array[Array[Int]])

  private final case class Mapping(submapFloor: Array[Int], submapResidue: Array[Int],
                                   mux: Array[Int])

  private final case class Mode(blockflag: Int, mapping: Int)

  private final case class Setup(books: Array[Codebook], floors: Array[Floor1],
                                 residues: Array[Residue], mappings: Array[Mapping],
                                 modes: Array[Mode])

  private final case class Id(channels: Int, rate: Int, bs0: Int, bs1: Int)

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  final case class Info(sampleRate: Int, channels: Int, blocksize: Int, packets: Int)

  /** First-packet magic of the OTHER codecs that ride Ogg pages. */
  private def foreignOggName(p0: Array[Byte]): Option[String] = {
    def starts(s: String): Boolean =
      p0.length >= s.length && s.indices.forall(i => p0(i) == s(i).toByte)
    if (starts("OpusHead")) Some("Opus")
    else if (starts("\u007fFLAC")) Some("FLAC")
    else if (starts("Speex   ")) Some("Speex")
    else if (starts("\u0080theora")) Some("Theora")
    else None
  }

  private def readHeaderPrefix(br: OggBitReader, expectType: Int): Unit = {
    require(br.read(8) == expectType, s"expected header packet type $expectType")
    "vorbis".foreach(c => require(br.read(8) == c.toInt, "missing 'vorbis' tag"))
  }

  private def readId(packet: Array[Byte]): Id = {
    val br = new OggBitReader(packet)
    readHeaderPrefix(br, 1)
    require(br.read(32) == 0, "unsupported vorbis version")
    val channels = br.read(8)
    val rate = br.read(32)
    br.read(32); br.read(32); br.read(32) // bitrate max/nominal/min
    val bs0 = 1 << br.read(4)
    val bs1 = 1 << br.read(4)
    require(bs0 >= 64 && bs1 <= 8192 && bs0 <= bs1, s"illegal blocksizes $bs0/$bs1")
    require(br.flag(), "missing framing bit in id header")
    require(channels == 1, s"decoder is mono-scoped, got $channels channels")
    require(bs0 == bs1, s"decoder scope is equal blocksizes, got $bs0/$bs1")
    Id(channels, rate, bs0, bs1)
  }

  private def readSetup(packet: Array[Byte]): Setup = {
    val br = new OggBitReader(packet)
    readHeaderPrefix(br, 5)
    val books = Array.fill(br.read(8) + 1)(readCodebook(br))
    // time domain transforms: placeholders, must read as zero
    val times = br.read(6) + 1
    (0 until times).foreach(_ => require(br.read(16) == 0, "nonzero time transform"))
    val floors = Array.fill(br.read(6) + 1) {
      val tpe = br.read(16)
      require(tpe == 1, s"only floor type 1 supported, got $tpe")
      val partitions = br.read(5)
      val partClasses = Array.fill(partitions)(br.read(4))
      val maxClass = if (partitions == 0) -1 else partClasses.max
      val cDims = new Array[Int](maxClass + 1)
      val cSub = new Array[Int](maxClass + 1)
      val cMaster = Array.fill(maxClass + 1)(-1)
      val sBooks = new Array[Array[Int]](maxClass + 1)
      var c = 0
      while (c <= maxClass) {
        cDims(c) = br.read(3) + 1
        cSub(c) = br.read(2)
        if (cSub(c) > 0) cMaster(c) = br.read(8)
        sBooks(c) = Array.fill(1 << cSub(c))(br.read(8) - 1)
        c += 1
      }
      val multiplier = br.read(2) + 1
      val rangebits = br.read(4)
      val xs = Array.newBuilder[Int]
      xs += 0
      xs += (1 << rangebits)
      var p = 0
      while (p < partitions) {
        var d = 0
        while (d < cDims(partClasses(p))) { xs += br.read(rangebits); d += 1 }
        p += 1
      }
      Floor1(partClasses, cDims, cSub, cMaster, sBooks, multiplier, rangebits, xs.result())
    }
    val residues = Array.fill(br.read(6) + 1) {
      val tpe = br.read(16)
      require(tpe == 1 || tpe == 2, s"only residue types 1/2 supported, got $tpe")
      val begin = br.read(24)
      val end = br.read(24)
      val psz = br.read(24) + 1
      val cls = br.read(6) + 1
      val classbook = br.read(8)
      val cascade = Array.fill(cls) {
        val low = br.read(3)
        if (br.flag()) low | (br.read(5) << 3) else low
      }
      val rbooks = cascade.map(cas => Array.tabulate(8)(p =>
        if ((cas & (1 << p)) != 0) br.read(8) else -1))
      Residue(tpe, begin, end, psz, cls, classbook, cascade, rbooks)
    }
    val mappings = Array.fill(br.read(6) + 1) {
      require(br.read(16) == 0, "only mapping type 0 exists")
      val submaps = if (br.flag()) br.read(4) + 1 else 1
      if (br.flag()) { // coupling steps — mono streams have none
        throw new IllegalArgumentException("channel coupling unsupported at 1 channel")
      }
      require(br.read(2) == 0, "nonzero reserved mapping bits")
      val mux = if (submaps > 1) Array.fill(1)(br.read(4)) else Array(0)
      val sf = new Array[Int](submaps)
      val sr = new Array[Int](submaps)
      var s = 0
      while (s < submaps) {
        br.read(8) // unused time config
        sf(s) = br.read(8)
        sr(s) = br.read(8)
        s += 1
      }
      Mapping(sf, sr, mux)
    }
    val modes = Array.fill(br.read(6) + 1) {
      val bf = br.read(1)
      require(br.read(16) == 0 && br.read(16) == 0, "nonzero window/transform type")
      Mode(bf, br.read(8))
    }
    require(br.flag(), "missing framing bit in setup header")
    Setup(books, floors, residues, mappings, modes)
  }

  /** §7.2.4 render_point: integer-exact interpolation. */
  private def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  /** §7.2.4 render_line into `v` (already multiplier-scaled y). */
  private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int, v: Array[Int]): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    val base = dy / adx // C-style truncation toward zero
    val sy = if (dy < 0) base - 1 else base + 1
    var ady = math.abs(dy) - math.abs(base) * adx
    var x = x0
    var y = y0
    var err = 0
    if (x < v.length) v(x) = y
    x = x0 + 1
    while (x < x1) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      if (x < v.length) v(x) = y
      x += 1
    }
  }

  /** Floor-1 packet decode + curve synthesis (§7.2.3-7.2.4). Returns
    * null when the "nonzero" flag is unset (unused channel). */
  private def decodeFloor1(br: OggBitReader, f: Floor1, books: Array[Codebook],
                           n2: Int): Array[Float] = {
    if (!br.flag()) return null
    val range = Array(256, 128, 86, 64)(f.multiplier - 1)
    val values = f.xList.length
    val y = new Array[Int](values)
    y(0) = br.read(ilog(range - 1))
    y(1) = br.read(ilog(range - 1))
    var off = 2
    var p = 0
    while (p < f.partitionClasses.length) {
      val cls = f.partitionClasses(p)
      val cdim = f.classDims(cls)
      val csub = f.classSubclasses(cls)
      val csubMask = (1 << csub) - 1
      var cval = 0
      if (csub > 0) cval = books(f.classMasterbooks(cls)).decodeEntry(br)
      var j = 0
      while (j < cdim) {
        val book = f.subclassBooks(cls)(cval & csubMask)
        cval >>= csub
        y(off + j) = if (book >= 0) books(book).decodeEntry(br) else 0
        j += 1
      }
      off += cdim
      p += 1
    }
    // amplitude value synthesis (§7.2.3): predict and apply residuals
    val step2 = new Array[Boolean](values)
    val finalY = new Array[Int](values)
    step2(0) = true; step2(1) = true
    finalY(0) = y(0); finalY(1) = y(1)
    // neighbor search needs X sort order; precompute sorted index
    val order = f.xList.zipWithIndex.sortBy(_._1).map(_._2)
    var i = 2
    while (i < values) {
      // low/high neighbors: nearest already-decoded X below/above
      var lo = 0
      var hi = 1
      var k = 0
      while (k < i) {
        if (f.xList(k) < f.xList(i) && f.xList(k) > f.xList(lo)) lo = k
        if (f.xList(k) > f.xList(i) && f.xList(k) < f.xList(hi)) hi = k
        k += 1
      }
      val predicted = renderPoint(f.xList(lo), finalY(lo), f.xList(hi), finalY(hi), f.xList(i))
      val v = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = math.min(highroom, lowroom) * 2
      if (v != 0) {
        step2(lo) = true; step2(hi) = true; step2(i) = true
        finalY(i) =
          if (v >= room) { if (highroom > lowroom) v - lowroom + predicted
                           else predicted - (v - highroom) - 1 }
          else if ((v & 1) == 1) predicted - ((v + 1) >> 1)
          else predicted + (v >> 1)
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      i += 1
    }
    // curve synthesis (§7.2.4): render lines between step2 points
    val curveY = new Array[Int](n2)
    var hx = 0
    var hy = 0
    var lx = 0
    var ly = finalY(order(0)) * f.multiplier
    var oi = 1
    while (oi < values) {
      val idx = order(oi)
      if (step2(idx)) {
        hx = f.xList(idx)
        hy = math.max(0, math.min(range - 1, finalY(idx))) * f.multiplier
        renderLine(lx, ly, hx, hy, curveY)
        lx = hx
        ly = hy
      }
      oi += 1
    }
    if (hx < n2) { // flat extension past the last point
      var x = hx
      while (x < n2) { curveY(x) = ly; x += 1 }
    }
    val out = new Array[Float](n2)
    i = 0
    while (i < n2) {
      out(i) = inverseDbTable(math.max(0, math.min(255, curveY(i))))
      i += 1
    }
    out
  }

  /** Residue type 1/2 decode for one mono vector (§8.6.2). */
  private def decodeResidue(br: OggBitReader, r: Residue, books: Array[Codebook],
                            n2: Int, doDecode: Boolean): Array[Float] = {
    val v = new Array[Float](n2)
    if (!doDecode) return v
    val begin = math.min(r.begin, n2)
    val end = math.min(r.end, n2)
    val toRead = end - begin
    if (toRead <= 0) return v
    val classbook = books(r.classbook)
    val cwDim = classbook.dims
    val partitions = toRead / r.partitionSize
    val classifs = new Array[Int](partitions + cwDim)
    var pass = 0
    while (pass < 8) {
      var part = 0
      while (part < partitions) {
        if (pass == 0) {
          var temp = classbook.decodeEntry(br)
          var j = cwDim - 1
          while (j >= 0) {
            classifs(part + j) = temp % r.classifications
            temp /= r.classifications
            j -= 1
          }
        }
        var j = 0
        while (j < cwDim && part < partitions) {
          val cls = classifs(part)
          val book = r.books(cls)(pass)
          if (book >= 0) {
            val b = books(book)
            val off0 = begin + part * r.partitionSize
            var k = 0
            while (k < r.partitionSize) {
              val vec = b.vq(b.decodeEntry(br))
              var d = 0
              while (d < b.dims) { v(off0 + k + d) += vec(d); d += 1 }
              k += b.dims
            }
          }
          part += 1
          j += 1
        }
      }
      // stop early once no class has books in later passes
      pass += 1
      var anyLater = false
      var c = 0
      while (c < r.classifications && !anyLater) {
        var p2 = pass
        while (p2 < 8 && !anyLater) { if (r.books(c)(p2) >= 0) anyLater = true; p2 += 1 }
        c += 1
      }
      if (!anyLater) pass = 8
    }
    v
  }

  /** §4.3.1 window: sin(π/2 · sin²((x+0.5)/n · π)). */
  private[graft] def window(n: Int): Array[Double] =
    Array.tabulate(n) { i =>
      val s = math.sin(math.Pi * (i + 0.5) / n)
      math.sin(0.5 * math.Pi * s * s)
    }

  /** IMDCT (§4.3.6), naive O(n²) — frames are <= 8192 by spec. */
  private def imdct(spec: Array[Float], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    val n2 = n / 2
    var i = 0
    while (i < n) {
      var acc = 0.0
      var k = 0
      while (k < n2) {
        acc += spec(k) * math.cos(2.0 * math.Pi / n * (i + 0.5 + n2 / 2.0) * (k + 0.5))
        k += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }

  /** Decode an Ogg Vorbis stream to mono float PCM. */
  def decode(bytes: Array[Byte]): (Info, Array[Float]) = {
    val (pkts, lastGranule, _) = Ogg.packets(bytes)
    // Ogg is a CONTAINER: Opus/FLAC/Speex ride the same pages with their
    // own first-packet magic — refuse those BY NAME (the voice-note /
    // VoIP class boundary, pinned in spec) instead of a generic header
    // mismatch
    pkts.headOption.map(_._1).foreach { p0 =>
      foreignOggName(p0).foreach(name =>
        throw new IllegalArgumentException(
          s"Ogg $name is off-scope: this Ogg surface decodes Vorbis " +
            "streams only (the documented compressed-audio boundary)"))
    }
    require(pkts.length >= 3, s"need 3 header packets, got ${pkts.length}")
    val id = readId(pkts(0)._1)
    locally { // comment header: validate frame, ignore content
      val br = new OggBitReader(pkts(1)._1)
      readHeaderPrefix(br, 3)
      val vlen = br.read(32)
      (0 until vlen).foreach(_ => br.read(8))
      val ncom = br.read(32)
      (0 until ncom).foreach { _ =>
        val l = br.read(32)
        (0 until l).foreach(_ => br.read(8))
      }
      require(br.flag(), "missing framing bit in comment header")
    }
    val setup = readSetup(pkts(2)._1)
    val n = id.bs0
    val n2 = n / 2
    val w = window(n)
    val pcm = Array.newBuilder[Float]
    var prevRight: Array[Double] = null
    var audioPackets = 0
    pkts.drop(3).foreach { case (packet, _) =>
      val br = new OggBitReader(packet)
      require(br.read(1) == 0, "header packet type in audio position")
      val modeIdx = if (setup.modes.length > 1) br.read(ilog(setup.modes.length - 1)) else 0
      val mode = setup.modes(modeIdx)
      require(mode.blockflag == 0, "long/short transitions out of decoder scope")
      val mapping = setup.mappings(mode.mapping)
      val submap = mapping.mux(0)
      val floorCfg = setup.floors(mapping.submapFloor(submap))
      val resCfg = setup.residues(mapping.submapResidue(submap))
      val floorCurve = decodeFloor1(br, floorCfg, setup.books, n2)
      val residue = decodeResidue(br, resCfg, setup.books, n2, floorCurve != null)
      val spec = new Array[Float](n2)
      if (floorCurve != null) {
        var i = 0
        while (i < n2) { spec(i) = floorCurve(i) * residue(i); i += 1 }
      }
      val y = imdct(spec, n)
      val wy = Array.tabulate(n)(i => y(i) * w(i))
      if (prevRight != null) {
        var i = 0
        while (i < n2) { pcm += (prevRight(i) + wy(i)).toFloat; i += 1 }
      }
      prevRight = java.util.Arrays.copyOfRange(wy, n2, n)
      audioPackets += 1
    }
    var samples = pcm.result()
    if (lastGranule >= 0 && lastGranule < samples.length)
      samples = java.util.Arrays.copyOf(samples, lastGranule.toInt)
    (Info(id.rate, 1, n, audioPackets), samples)
  }

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  private val EncN = 512
  private val EncN2 = EncN / 2
  private val PartSize = 16
  private val VqDim = 4

  /** The encoder's two codebooks: a dim-4 2-class classification book
    * (16 entries, uniform length 4 — complete) and a dim-4 lookup-1 VQ
    * book over {−2..2}⁴ (625 entries; 399×len-9 + 226×len-10 makes the
    * Kraft sum exactly one, so the huffman tree is fully specified). */
  private def encoderBooks(): (Codebook, Codebook) = {
    val classbook = new Codebook(VqDim, 16, Array.fill(16)(4), 0, 0f, 0f, false, Array.empty)
    val lens = Array.tabulate(625)(i => if (i < 399) 9 else 10)
    val vq = new Codebook(VqDim, 625, lens, 1, -2.0f, 1.0f, false, Array(0, 1, 2, 3, 4))
    (classbook, vq)
  }

  private def writeHeaderPrefix(bw: OggBitWriter, tpe: Int): Unit = {
    bw.write(tpe, 8)
    "vorbis".foreach(c => bw.write(c.toInt, 8))
  }

  private def idPacket(rate: Int): Array[Byte] = {
    val bw = new OggBitWriter
    writeHeaderPrefix(bw, 1)
    bw.write(0, 32)       // version
    bw.write(1, 8)        // channels
    bw.write(rate, 32)
    bw.write(0, 32); bw.write(0, 32); bw.write(0, 32) // bitrates
    bw.write(9, 4)        // blocksize_0 = 512
    bw.write(9, 4)        // blocksize_1 = 512
    bw.writeFlag(true)
    bw.toBytes
  }

  private def commentPacket(): Array[Byte] = {
    val bw = new OggBitWriter
    writeHeaderPrefix(bw, 3)
    val vendor = "graft vorbis 1".getBytes("UTF-8")
    bw.write(vendor.length, 32)
    vendor.foreach(b => bw.write(b & 0xff, 8))
    bw.write(0, 32) // no user comments
    bw.writeFlag(true)
    bw.toBytes
  }

  private def setupPacket(classbook: Codebook, vq: Codebook): Array[Byte] = {
    val bw = new OggBitWriter
    writeHeaderPrefix(bw, 5)
    bw.write(1, 8) // codebook_count - 1 = 1 → 2 books
    writeCodebook(bw, classbook, 0)
    writeCodebook(bw, vq, 3)
    bw.write(0, 6)  // time_count - 1
    bw.write(0, 16) // the zero time transform
    bw.write(0, 6)  // floor_count - 1
    bw.write(1, 16) // floor type 1
    bw.write(0, 5)  // partitions = 0 → flat two-point floor
    bw.write(0, 2)  // multiplier - 1 → 1 (range 256)
    bw.write(8, 4)  // rangebits → X domain [0, 256) == n/2
    bw.write(0, 6)  // residue_count - 1
    bw.write(1, 16) // residue type 1
    bw.write(0, 24)          // begin
    bw.write(EncN2, 24)      // end
    bw.write(PartSize - 1, 24)
    bw.write(1, 6)  // classifications - 1 → 2 classes
    bw.write(0, 8)  // classbook = book 0
    // class 0: cascade 0 (silent partitions); class 1: pass-0 bit set
    bw.write(0, 3); bw.writeFlag(false)
    bw.write(1, 3); bw.writeFlag(false)
    bw.write(1, 8)  // class 1 pass 0 book = book 1 (the VQ book)
    bw.write(0, 6)  // mapping_count - 1
    bw.write(0, 16) // mapping type 0
    bw.writeFlag(false) // one submap
    bw.writeFlag(false) // no coupling
    bw.write(0, 2)      // reserved
    bw.write(0, 8)      // time placeholder
    bw.write(0, 8)      // floor 0
    bw.write(0, 8)      // residue 0
    bw.write(0, 6)  // mode_count - 1
    bw.write(0, 1)  // blockflag 0
    bw.write(0, 16) // windowtype
    bw.write(0, 16) // transformtype
    bw.write(0, 8)  // mapping 0
    bw.writeFlag(true)
    bw.toBytes
  }

  /** Forward MDCT of a windowed frame, scaled 4/n so that windowed
    * IMDCT overlap-add reconstructs at unit gain (Princen-Bradley:
    * w²(i) + w²(i + n/2) = 1 for the Vorbis window). */
  private def forwardMdct(x: Array[Double], n: Int): Array[Float] = {
    val n2 = n / 2
    val out = new Array[Float](n2)
    var k = 0
    while (k < n2) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x(i) * math.cos(2.0 * math.Pi / n * (i + 0.5 + n2 / 2.0) * (k + 0.5))
        i += 1
      }
      out(k) = (acc * 4.0 / n).toFloat
      k += 1
    }
    out
  }

  /** Encode mono float PCM to an Ogg Vorbis stream. */
  def encode(samples: Array[Float], sampleRate: Int): Array[Byte] = {
    val (classbook, vq) = encoderBooks()
    val n = EncN
    val n2 = EncN2
    val w = window(n)
    val total = samples.length
    val frames = (total + n2 - 1) / n2 + 1 // +1 priming frame
    val packets = Vector.newBuilder[(Array[Byte], Long)]
    var f = 0
    while (f < frames) {
      // frame f analyzes padded[(f-1)*n2, (f+1)*n2): half-frame lookback
      val x = new Array[Double](n)
      var i = 0
      while (i < n) {
        val src = (f - 1) * n2 + i
        x(i) = (if (src >= 0 && src < total) samples(src) else 0f) * w(i)
        i += 1
      }
      val spec = forwardMdct(x, n)
      val bw = new OggBitWriter
      bw.write(0, 1) // audio packet; mode number is ilog(0)=0 bits
      var maxAbs = 0.0f
      i = 0
      while (i < n2) { maxAbs = math.max(maxAbs, math.abs(spec(i))); i += 1 }
      if (maxAbs == 0.0f) {
        bw.writeFlag(false) // floor nonzero = 0: silent frame, no residue
      } else {
        // flat floor: smallest table level with 2·level >= maxAbs
        var yIdx = 0
        while (yIdx < 255 && inverseDbTable(yIdx) * 2.0f < maxAbs) yIdx += 1
        val level = inverseDbTable(yIdx)
        bw.writeFlag(true)
        bw.write(yIdx, 8) // y0 (ilog(255) = 8 bits)
        bw.write(yIdx, 8) // y1 — flat
        // quantize: q = round(spec/level) clamped to the book range
        val q = new Array[Int](n2)
        i = 0
        while (i < n2) {
          q(i) = math.max(-2, math.min(2, math.round(spec(i) / level)))
          i += 1
        }
        // residue type 1: classify 16-sample partitions, emit classwords
        // (pass 0) then vq codes for coded partitions
        val partitions = n2 / PartSize
        val cls = Array.tabulate(partitions) { p =>
          var any = false
          var k = 0
          while (k < PartSize) { if (q(p * PartSize + k) != 0) any = true; k += 1 }
          if (any) 1 else 0
        }
        var part = 0
        while (part < partitions) {
          // classword covers classbook.dims partitions
          var entry = 0
          var j = 0
          while (j < VqDim) {
            val c = if (part + j < partitions) cls(part + j) else 0
            entry = entry * 2 + c
            j += 1
          }
          classbook.writeEntry(bw, entry)
          j = 0
          while (j < VqDim && part < partitions) {
            if (cls(part) == 1) {
              val off0 = part * PartSize
              var k = 0
              while (k < PartSize) {
                var e = 0
                var d = VqDim - 1
                while (d >= 0) { e = e * 5 + (q(off0 + k + d) + 2); d -= 1 }
                vq.writeEntry(bw, e)
                k += VqDim
              }
            }
            part += 1
            j += 1
          }
        }
      }
      val granule = math.min(f.toLong * n2, total.toLong)
      packets += ((bw.toBytes, granule))
      f += 1
    }
    // lay out pages: BOS page carries the id header alone; page 1 the
    // comment + setup packets; then one audio packet per page
    val out = new java.io.ByteArrayOutputStream()
    val serial = 0x67726674 // "grft"
    out.write(Ogg.page(idPacket(sampleRate), 2, 0L, serial, 0))
    val hdr2 = {
      val c = commentPacket()
      val s = setupPacket(classbook, vq)
      // two packets on one page: concatenated payload with lacing from
      // each packet's own length — Ogg.page segments a SINGLE packet, so
      // build this page by re-segmenting manually
      val payload = c ++ s
      val lacings = segmentLacings(c.length) ++ segmentLacings(s.length)
      pageRaw(payload, lacings, 0, 0L, serial, 1)
    }
    out.write(hdr2)
    var seq = 2
    val pk = packets.result()
    pk.zipWithIndex.foreach { case ((p, g), idx) =>
      val eos = if (idx == pk.length - 1) 4 else 0
      out.write(Ogg.page(p, eos, g, serial, seq))
      seq += 1
    }
    out.toByteArray
  }

  private def segmentLacings(len: Int): Array[Int] = {
    val full = len / 255
    Array.fill(full)(255) :+ (len - full * 255)
  }

  /** A page with an explicit lacing layout (multi-packet pages). */
  private def pageRaw(payload: Array[Byte], lacings: Array[Int], headerType: Int,
                      granule: Long, serial: Int, seq: Int): Array[Byte] = {
    require(lacings.length <= 255, "too many segments for one page")
    val header = new Array[Byte](27 + lacings.length)
    header(0) = 'O'; header(1) = 'g'; header(2) = 'g'; header(3) = 'S'
    header(4) = 0
    header(5) = headerType.toByte
    var g = granule
    var i = 0
    while (i < 8) { header(6 + i) = (g & 0xff).toByte; g >>= 8; i += 1 }
    var s = serial
    i = 0
    while (i < 4) { header(14 + i) = (s & 0xff).toByte; s >>= 8; i += 1 }
    var q = seq
    i = 0
    while (i < 4) { header(18 + i) = (q & 0xff).toByte; q >>= 8; i += 1 }
    header(26) = lacings.length.toByte
    i = 0
    while (i < lacings.length) { header(27 + i) = lacings(i).toByte; i += 1 }
    val all = new Array[Byte](header.length + payload.length)
    System.arraycopy(header, 0, all, 0, header.length)
    System.arraycopy(payload, 0, all, header.length, payload.length)
    val c = Ogg.crc(all, 0, all.length)
    all(22) = (c & 0xff).toByte
    all(23) = ((c >> 8) & 0xff).toByte
    all(24) = ((c >> 16) & 0xff).toByte
    all(25) = ((c >> 24) & 0xff).toByte
    all
  }
}
