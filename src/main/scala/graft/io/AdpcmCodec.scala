package graft.io

/** Pure-JVM IMA/DVI ADPCM codec in the WAV container (wFormatTag 0x11) —
  * the second REAL compressed format next to [[FlacCodec]], closing more
  * of the reference's "could easily be reconfigured for other formats"
  * surface (reference README.md:3; its pydub/ffmpeg path decodes ADPCM
  * WAVs transparently). The algorithm is the public IMA DAFTWG spec
  * (1992): 4-bit differential coding against an 89-entry step table,
  * 4:1 over int16 PCM.
  *
  * Container layout (mono, the codec's scope here):
  *   RIFF/WAVE, `fmt ` with wFormatTag=0x11 + cbSize=2 extension
  *   (wSamplesPerBlock), `fact` (true sample count — REQUIRED for
  *   compressed WAV, and what lets the decoder truncate the final
  *   block's padding), `data` of fixed-size blocks:
  *     block = predictor:int16 LE, stepIndex:uint8, reserved:0,
  *             then 2 samples/byte, LOW nibble first.
  *   The header predictor IS the block's first sample (stored verbatim);
  *   a block therefore carries (blockAlign-4)*2 + 1 samples.
  *
  * ADPCM is lossy in general, but the quantizer is EXACT whenever every
  * successive difference is representable at the current step — in
  * particular any {−1, 0, +1}-difference signal starting at step index 0
  * round-trips sample-exact (step 7: nibble 0 decodes diff 0, nibble 1
  * decodes 7>>2 = 1, and both keep the index at 0). q235 exploits
  * exactly that class for a hash-tight oracle; arbitrary signals get the
  * spec's bounded-error treatment instead.
  *
  * Decode cost is per-row, shuffle-free — the 100 TB posture matches the
  * WAV/FLAC paths.
  */
object AdpcmCodec {

  private val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val indexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def clampS16(v: Int): Int = math.max(-32768, math.min(32767, v))
  private def clampIdx(v: Int): Int = math.max(0, math.min(88, v))

  /** Samples one block of `blockAlign` bytes carries (mono). */
  def samplesPerBlock(blockAlign: Int): Int = (blockAlign - 4) * 2 + 1

  /** One quantize step: returns (nibble, new predictor, new index).
    * The predictor update MUST mirror the decoder bit-for-bit — that
    * shared reconstruction is what keeps encoder and decoder state in
    * lockstep (and what makes the exact-signal class exact). */
  private def quantize(sample: Int, pred: Int, index: Int): (Int, Int, Int) = {
    val step = stepTable(index)
    var diff = sample - pred
    var nibble = if (diff < 0) { diff = -diff; 8 } else 0
    var d = diff
    if (d >= step) { nibble |= 4; d -= step }
    if (d >= (step >> 1)) { nibble |= 2; d -= step >> 1 }
    if (d >= (step >> 2)) { nibble |= 1 }
    val (p2, i2) = reconstruct(nibble, pred, index)
    (nibble, p2, i2)
  }

  /** The decoder's state transition for one nibble. */
  private def reconstruct(nibble: Int, pred: Int, index: Int): (Int, Int) = {
    val step = stepTable(index)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p2 = clampS16(if ((nibble & 8) != 0) pred - diff else pred + diff)
    (p2, clampIdx(index + indexTable(nibble)))
  }

  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }

  /** Encode mono int16 PCM as a complete IMA-ADPCM WAV file. Encoder
    * state (predictor, step index) carries ACROSS blocks and each block
    * header snapshots it — the standard streaming-writer behavior. The
    * final block is zero-nibble padded to `blockAlign`; `fact` records
    * the true count so decode truncates the padding. */
  def encodeWav(pcm: Array[Short], sampleRate: Int, blockAlign: Int = 256): Array[Byte] = {
    require(pcm.nonEmpty, "empty signal")
    require(blockAlign >= 8 && blockAlign % 4 == 0, s"bad blockAlign $blockAlign")
    val spb = samplesPerBlock(blockAlign)
    val nBlocks = (pcm.length + spb - 1) / spb
    val data = new java.io.ByteArrayOutputStream()
    var pred = 0
    var index = 0
    var pos = 0
    while (pos < pcm.length) {
      // block header snapshots the state; the first sample goes in verbatim
      pred = pcm(pos).toInt
      le16(data, pred & 0xffff); data.write(index); data.write(0)
      var lo = -1 // pending low nibble
      var i = pos + 1
      val end = math.min(pos + spb, pcm.length)
      while (i < end) {
        val (nib, p2, i2) = quantize(pcm(i).toInt, pred, index)
        pred = p2; index = i2
        if (lo < 0) lo = nib
        else { data.write(lo | (nib << 4)); lo = -1 }
        i += 1
      }
      if (lo >= 0) data.write(lo)
      // zero-pad to blockAlign (decoder truncates via fact)
      val written = 4 + (end - pos - 1 + 1) / 2
      (written until blockAlign).foreach(_ => data.write(0))
      pos += spb
    }
    val dataBytes = data.toByteArray
    require(dataBytes.length == nBlocks * blockAlign, "block layout error")
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4 + (8 + 20) + (8 + 4) + (8 + dataBytes.length))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(out, 20)
    le16(out, 0x11)                       // wFormatTag = IMA ADPCM
    le16(out, 1)                          // channels (mono scope)
    le32(out, sampleRate)
    le32(out, sampleRate * blockAlign / spb) // nominal byte rate
    le16(out, blockAlign)
    le16(out, 4)                          // bits per (coded) sample
    le16(out, 2)                          // cbSize
    le16(out, spb)                        // wSamplesPerBlock
    out.write("fact".getBytes("US-ASCII")); le32(out, 4)
    le32(out, pcm.length)
    out.write("data".getBytes("US-ASCII")); le32(out, dataBytes.length)
    out.write(dataBytes)
    out.toByteArray
  }

  final case class AdpcmInfo(sampleRate: Int, blockAlign: Int,
                             samplesPerBlock: Int, totalSamples: Int)

  /** Decode an IMA-ADPCM WAV produced by [[encodeWav]] (or any conformant
    * mono 0x11 stream with a fact chunk). Fails loudly on a non-ADPCM
    * format tag, missing chunks, or a truncated data section. */
  def decodeWav(bytes: Array[Byte]): (AdpcmInfo, Array[Short]) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def s16(i: Int): Int = u16(i).toShort.toInt
    def u32(i: Int): Long = (u16(i) | (u16(i + 2).toLong << 16)) & 0xffffffffL
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE stream")
    var p = 12
    var fmtAt = -1; var factSamples = -1; var dataAt = -1; var dataLen = -1
    while (p + 8 <= bytes.length) {
      val t = tag(p); val len = u32(p + 4).toInt
      // a corrupt length must fail LOUDLY, not loop forever (negative
      // advance) or read past the buffer
      require(len >= 0 && p + 8 + len <= bytes.length,
        s"chunk '$t' overruns the stream at offset $p (len $len)")
      t match {
        case "fmt " => fmtAt = p + 8
        case "fact" => factSamples = u32(p + 8).toInt
        case "data" => dataAt = p + 8; dataLen = len
        case _      => ()
      }
      p += 8 + len + (len & 1)
    }
    require(fmtAt >= 0 && dataAt >= 0, "missing fmt/data chunk")
    require(u16(fmtAt) == 0x11, f"not IMA ADPCM (fmt tag 0x${u16(fmtAt)}%02x)")
    require(u16(fmtAt + 2) == 1, "only mono ADPCM is in scope")
    val rate = u32(fmtAt + 4).toInt
    val blockAlign = u16(fmtAt + 12)
    val spb = u16(fmtAt + 18)
    require(spb == samplesPerBlock(blockAlign),
      s"inconsistent samplesPerBlock $spb for blockAlign $blockAlign")
    require(factSamples >= 0, "missing fact chunk (required for ADPCM)")
    require(dataAt + dataLen <= bytes.length, "truncated data chunk")
    val out = new Array[Short](factSamples)
    var outPos = 0
    var bp = dataAt
    while (outPos < factSamples) {
      require(bp + blockAlign <= dataAt + dataLen, "data ends mid-block")
      var pred = s16(bp)
      var index = u8(bp + 2)
      require(index <= 88, s"corrupt step index $index")
      out(outPos) = pred.toShort; outPos += 1
      var i = bp + 4
      var inBlock = 1
      while (inBlock < spb && outPos < factSamples) {
        val byte = u8(i + (inBlock - 1) / 2)
        val nib = if ((inBlock & 1) == 1) byte & 0xf else byte >> 4
        val (p2, i2) = reconstruct(nib, pred, index)
        pred = p2; index = i2
        out(outPos) = pred.toShort; outPos += 1
        inBlock += 1
      }
      bp += blockAlign
    }
    (AdpcmInfo(rate, blockAlign, spb, factSamples), out)
  }
}
