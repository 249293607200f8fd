package graft.io

import java.io.ByteArrayOutputStream

/** Vorbis bitpacking (Vorbis I spec §2): LSB-first within each byte,
  * bytes in stream order — the OPPOSITE bit order of FLAC's big-endian
  * reader, which is why this is its own pair of classes. Fields up to
  * 32 bits; reads past the end throw (a truncated packet is a decode
  * error, mapped by callers to the reference's per-file skip,
  * `process_audio.py:91-92`). */
final class OggBitReader(bytes: Array[Byte]) {
  private var bitPos: Long = 0L
  def position: Long = bitPos
  def remaining: Long = bytes.length.toLong * 8 - bitPos

  def read(n: Int): Int = {
    require(n >= 0 && n <= 32, s"read width $n out of range")
    require(remaining >= n, s"bitstream exhausted: want $n, have $remaining")
    var v = 0L
    var got = 0
    while (got < n) {
      val byteIdx = (bitPos >> 3).toInt
      val bitIdx = (bitPos & 7).toInt
      val take = math.min(n - got, 8 - bitIdx)
      val chunk = ((bytes(byteIdx) & 0xff) >> bitIdx) & ((1 << take) - 1)
      v |= chunk.toLong << got
      got += take
      bitPos += take
    }
    v.toInt
  }

  /** One bit as a boolean flag. */
  def flag(): Boolean = read(1) == 1
}

/** LSB-first bit writer (the encode twin). */
final class OggBitWriter {
  private val out = new ByteArrayOutputStream()
  private var cur = 0
  private var curBits = 0

  def write(v: Int, n: Int): Unit = {
    require(n >= 0 && n <= 32, s"write width $n out of range")
    var got = 0
    while (got < n) {
      val take = math.min(n - got, 8 - curBits)
      cur |= (((v >>> got) & ((1 << take) - 1)) << curBits)
      curBits += take
      got += take
      if (curBits == 8) { out.write(cur); cur = 0; curBits = 0 }
    }
  }

  def writeFlag(b: Boolean): Unit = write(if (b) 1 else 0, 1)

  /** Pad the final partial byte with zero bits and return the packet. */
  def toBytes: Array[Byte] = {
    val res = new ByteArrayOutputStream()
    out.writeTo(res)
    if (curBits > 0) res.write(cur)
    res.toByteArray
  }
}

/** Ogg page layer (RFC 3533): capture pattern, lacing-value
  * packetization, and the Ogg CRC32 (polynomial 0x04C11DB7, MSB-first,
  * zero init, no reflection, no final xor — NOT zlib's reflected
  * variant). Scope: single logical stream, one packet per page on
  * encode (legal; packets here are far below the 64 KB continuation
  * threshold), continuation-aware on decode. */
object Ogg {

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  def crc(bytes: Array[Byte], from: Int, len: Int): Int = {
    var r = 0
    var i = from
    val end = from + len
    while (i < end) {
      r = (r << 8) ^ crcTable(((r >>> 24) ^ (bytes(i) & 0xff)) & 0xff)
      i += 1
    }
    r
  }

  /** One page: returns the serialized bytes. `headerType`: 1 =
    * continuation, 2 = beginning-of-stream, 4 = end-of-stream. */
  def page(payload: Array[Byte], headerType: Int, granule: Long,
           serial: Int, seq: Int): Array[Byte] = {
    // nSegs must fit the single-byte segment-count field: payload == 255*255
    // would need 256 lacing values (255 full + one terminating <255), which
    // truncates to 0 and emits a corrupt page — hence strictly-less-than.
    require(payload.length < 255 * 255, s"page payload too large: ${payload.length}")
    val nSegs = payload.length / 255 + 1 // final lacing < 255 ends the packet
    val header = new Array[Byte](27 + nSegs)
    header(0) = 'O'; header(1) = 'g'; header(2) = 'g'; header(3) = 'S'
    header(4) = 0 // version
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
    // bytes 22-25: CRC, filled below
    header(26) = nSegs.toByte
    var rem = payload.length
    i = 0
    while (i < nSegs) {
      header(27 + i) = math.min(rem, 255).toByte
      rem -= math.min(rem, 255)
      i += 1
    }
    val all = new Array[Byte](header.length + payload.length)
    System.arraycopy(header, 0, all, 0, header.length)
    System.arraycopy(payload, 0, all, header.length, payload.length)
    val c = crc(all, 0, all.length)
    all(22) = (c & 0xff).toByte
    all(23) = ((c >> 8) & 0xff).toByte
    all(24) = ((c >> 16) & 0xff).toByte
    all(25) = ((c >> 24) & 0xff).toByte
    all
  }

  /** Parse a physical stream: CRC-verified pages → packets, with the
    * granule position of the page each packet ENDS on (-1 while a page
    * carries no packet end — spec value for "no granule"). Returns
    * (packets, lastGranule, serial). */
  def packets(bytes: Array[Byte]): (Vector[(Array[Byte], Long)], Long, Int) = {
    val out = Vector.newBuilder[(Array[Byte], Long)]
    var pos = 0
    var pending = new ByteArrayOutputStream()
    var lastGranule = -1L
    var serial = 0
    var sawBos = false
    while (pos < bytes.length) {
      require(pos + 27 <= bytes.length, s"truncated page header at $pos")
      require(bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
        bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S', s"missing OggS capture at $pos")
      require(bytes(pos + 4) == 0, s"unsupported Ogg version ${bytes(pos + 4)}")
      var granule = 0L
      var i = 7
      while (i >= 0) { granule = (granule << 8) | (bytes(pos + 6 + i) & 0xff); i -= 1 }
      var ser = 0
      i = 3
      while (i >= 0) { ser = (ser << 8) | (bytes(pos + 14 + i) & 0xff); i -= 1 }
      if (!sawBos) { serial = ser; sawBos = true }
      else require(ser == serial, "multiplexed streams unsupported")
      val nSegs = bytes(pos + 27 - 1) & 0xff
      require(pos + 27 + nSegs <= bytes.length, s"truncated segment table at $pos")
      var payloadLen = 0
      i = 0
      while (i < nSegs) { payloadLen += bytes(pos + 27 + i) & 0xff; i += 1 }
      require(pos + 27 + nSegs + payloadLen <= bytes.length, s"truncated page body at $pos")
      // CRC check: recompute with the CRC field zeroed
      val stored = (bytes(pos + 22) & 0xff) | ((bytes(pos + 23) & 0xff) << 8) |
        ((bytes(pos + 24) & 0xff) << 16) | ((bytes(pos + 25) & 0xff) << 24)
      val pageLen = 27 + nSegs + payloadLen
      val copy = java.util.Arrays.copyOfRange(bytes, pos, pos + pageLen)
      copy(22) = 0; copy(23) = 0; copy(24) = 0; copy(25) = 0
      require(crc(copy, 0, copy.length) == stored, s"Ogg CRC mismatch on page at $pos")
      // walk lacing values: each value < 255 ends a packet
      var segOff = pos + 27 + nSegs
      i = 0
      while (i < nSegs) {
        val lace = bytes(pos + 27 + i) & 0xff
        pending.write(bytes, segOff, lace)
        segOff += lace
        if (lace < 255) {
          out += ((pending.toByteArray, granule))
          pending = new ByteArrayOutputStream()
        }
        i += 1
      }
      if (granule != -1L) lastGranule = granule
      pos += pageLen
    }
    require(pending.size() == 0, "stream ends mid-packet")
    (out.result(), lastGranule, serial)
  }
}
