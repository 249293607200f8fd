package graft.io

/** G.711 µ-law / A-law codecs in the WAV container (wFormatTag 7 / 6) —
  * the telephony formats every transcription corpus eventually contains
  * (call-center audio), and the third/fourth REAL compressed formats
  * next to [[FlacCodec]] and [[AdpcmCodec]]. Pure table-free integer
  * arithmetic from the ITU-T G.711 spec:
  *
  *   µ-law decode: u = ~b; mag = (((u&0xF)<<3 | 0x84) << ((u>>4)&7)) − 0x84;
  *                 pcm = (u&0x80) != 0 ? −mag : mag       (bias 0x84 = 132)
  *   A-law decode: a = b ^ 0x55; seg = (a>>4)&7;
  *                 mag = seg==0 ? (a&0xF)<<4 | 8
  *                             : ((a&0xF)<<4 | 0x108) << (seg−1);
  *                 pcm = (a&0x80) != 0 ? mag : −mag
  *
  * Both expansions are pure integer expressions — which is what lets a
  * SQL oracle recompute decoded samples EXACTLY (q243), unlike codecs
  * whose state machines need replication. Encode is the standard
  * segment search; encode∘decode is the identity on the codec's 8-bit
  * code space (idempotence-pinned in spec). 2:1 over int16; 8 kHz is
  * the canonical rate but any rate rides the container. Decode cost is
  * per-row and shuffle-free like the WAV/FLAC/ADPCM paths.
  */
object G711Codec {

  /** µ-law byte → PCM16 (ITU-T G.711 expansion). */
  def muLawDecodeSample(b: Byte): Short = {
    val u = (~b) & 0xff
    val mag = ((((u & 0xf) << 3) | 0x84) << ((u >> 4) & 7)) - 0x84
    (if ((u & 0x80) != 0) -mag else mag).toShort
  }

  /** PCM16 → µ-law byte (standard segment encoder, bias 132, clip 0x7FFB). */
  def muLawEncodeSample(pcm: Short): Byte = {
    val sign = if (pcm < 0) 0x80 else 0
    var mag = math.min(if (pcm < 0) -pcm.toInt else pcm.toInt, 32635) + 0x84
    var seg = 7
    var probe = 0x4000
    while (seg > 0 && (mag & probe) == 0) { seg -= 1; probe >>= 1 }
    val mant = (mag >> (seg + 3)) & 0xf
    ((~(sign | (seg << 4) | mant)) & 0xff).toByte
  }

  /** A-law byte → PCM16. */
  def aLawDecodeSample(b: Byte): Short = {
    val a = (b ^ 0x55) & 0xff
    val seg = (a >> 4) & 7
    val mag =
      if (seg == 0) ((a & 0xf) << 4) | 8
      else (((a & 0xf) << 4) | 0x108) << (seg - 1)
    (if ((a & 0x80) != 0) mag else -mag).toShort
  }

  /** PCM16 → A-law byte. Segment 0 covers magnitudes [0, 256); segment
    * s ≥ 1 covers [2^(s+7), 2^(s+8)) — found by shifting mag>>8 down. */
  def aLawEncodeSample(pcm: Short): Byte = {
    val sign = if (pcm >= 0) 0x80 else 0
    val mag = math.min(if (pcm < 0) -pcm.toInt else pcm.toInt, 32767)
    var seg = 0
    var m = mag >> 8
    while (m > 0 && seg < 7) { seg += 1; m >>= 1 }
    val mant = if (seg == 0) (mag >> 4) & 0xf else (mag >> (seg + 3)) & 0xf
    (((sign | (seg << 4) | mant) ^ 0x55) & 0xff).toByte
  }

  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }

  /** Wrap raw G.711 bytes in a mono WAV container (fmt 7 = µ-law,
    * 6 = A-law; 8 bits/sample, blockAlign 1, fact = sample count). */
  def wrapWav(codes: Array[Byte], sampleRate: Int, aLaw: Boolean): Array[Byte] = {
    require(codes.nonEmpty, "empty signal")
    // RIFF chunks are word-aligned: an odd data chunk carries one pad
    // byte (excluded from the declared chunk size, included in the RIFF
    // size) — external consumers enforce this even when lenient readers
    // don't
    val pad = codes.length & 1
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4 + (8 + 18) + (8 + 4) + (8 + codes.length + pad))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(out, 18)
    le16(out, if (aLaw) 6 else 7)
    le16(out, 1)
    le32(out, sampleRate)
    le32(out, sampleRate)          // byte rate = rate × blockAlign(1)
    le16(out, 1)                   // blockAlign
    le16(out, 8)                   // bits per sample
    le16(out, 0)                   // cbSize
    out.write("fact".getBytes("US-ASCII")); le32(out, 4)
    le32(out, codes.length)
    out.write("data".getBytes("US-ASCII")); le32(out, codes.length)
    out.write(codes)
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  /** Encode PCM16 as a complete µ-law or A-law WAV. */
  def encodeWav(pcm: Array[Short], sampleRate: Int, aLaw: Boolean = false): Array[Byte] =
    wrapWav(pcm.map(s => if (aLaw) aLawEncodeSample(s) else muLawEncodeSample(s)),
      sampleRate, aLaw)
}
