package graft.io

import java.io.ByteArrayOutputStream

/** WARC (ISO 28500 / WARC-1.0) — THE web-corpus container: Common
  * Crawl ships as WARC, and a training-data engine whose web story
  * starts at loose HTML strings cannot open the archives the field
  * actually trains on. With [[graft.ops.HtmlExtract]] (q335) and
  * [[graft.ops.UrlOps]] (q336) this closes the chain: WARC → HTTP
  * response → HTML → text → canonical-URL dedup, all in-engine (q337).
  *
  * == Format (all public) ==
  * A record is `WARC/1.0\r\n`, then `Name: value\r\n` headers, a blank
  * line, `Content-Length` block bytes, and `\r\n\r\n`. Response
  * records carry a raw HTTP/1.x message as their block. The CC layout
  * gzips EACH RECORD as its own member and concatenates — which is
  * what makes a 100 TB crawl splittable: a reader can start at any
  * member boundary (the CDX index hands out offsets). [[decode]]
  * accepts both plain and (multi-member) gzip input — the JDK inflater
  * walks concatenated members natively.
  *
  * == HTTP payload handling ==
  * For `WARC-Type: response` records the HTTP message is split and
  * decoded: status code parsed, headers exposed (case-insensitive),
  * `Transfer-Encoding: chunked` DECHUNKED (hex size lines per RFC
  * 9112 §7.1), `Content-Encoding: gzip` INFLATED. Other transfer or
  * content encodings refuse BY NAME. Truncated records, bad
  * Content-Length, and malformed chunk framing refuse loudly. */
object WarcCodec {

  final case class Record(warcType: String, targetUri: String, date: String,
                          headers: Map[String, String], block: Array[Byte])
  final case class HttpResponse(status: Int, headers: Map[String, String],
                                body: Array[Byte])

  // ------------------------------------------------------------ decode

  def decode(bytes: Array[Byte]): Vector[Record] = {
    val raw =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        gunzipAll(bytes)
      else bytes
    val out = Vector.newBuilder[Record]
    var pos = 0
    while (pos < raw.length) {
      val (headerText, blockStart) = readHeaderBlock(raw, pos, "WARC record")
      val lines = headerText.split("\r\n")
      require(lines.head.startsWith("WARC/1."),
        s"bad WARC version line '${lines.head}' at byte $pos")
      val hdrs = parseHeaders(lines.drop(1), s"WARC record at $pos")
      val len = hdrs.getOrElse("content-length",
        throw new IllegalArgumentException(
          s"WARC record at $pos missing Content-Length")).trim.toInt
      require(len >= 0 && blockStart + len <= raw.length,
        s"WARC block [$blockStart, ${blockStart + len}) overruns the file")
      val block = java.util.Arrays.copyOfRange(raw, blockStart, blockStart + len)
      require(blockStart + len + 4 <= raw.length &&
        raw(blockStart + len) == '\r' && raw(blockStart + len + 1) == '\n' &&
        raw(blockStart + len + 2) == '\r' && raw(blockStart + len + 3) == '\n',
        s"WARC record at $pos missing the trailing CRLFCRLF")
      out += Record(
        hdrs.getOrElse("warc-type", "unknown"),
        hdrs.getOrElse("warc-target-uri", ""),
        hdrs.getOrElse("warc-date", ""),
        hdrs, block)
      pos = blockStart + len + 4
    }
    out.result()
  }

  /** Decode a response record's HTTP message: status, headers, body
    * (dechunked and inflated as declared). */
  def httpResponse(block: Array[Byte]): HttpResponse = {
    val (headerText, bodyStart) = readHeaderBlock(block, 0, "HTTP message")
    val lines = headerText.split("\r\n")
    val status = lines.head.split(" ")
    require(status.length >= 2 && status(0).startsWith("HTTP/1."),
      s"bad HTTP status line '${lines.head}'")
    val hdrs = parseHeaders(lines.drop(1), "HTTP message")
    var body = java.util.Arrays.copyOfRange(block, bodyStart, block.length)
    hdrs.get("transfer-encoding").map(_.trim.toLowerCase).foreach {
      case "chunked" => body = dechunk(body)
      case "identity" => ()
      case other => throw new IllegalArgumentException(
        s"HTTP transfer-encoding '$other' unsupported (chunked/identity)")
    }
    hdrs.get("content-encoding").map(_.trim.toLowerCase).foreach {
      case "gzip" => body = gunzipAll(body)
      case "identity" => ()
      case other => throw new IllegalArgumentException(
        s"HTTP content-encoding '$other' unsupported (gzip/identity)")
    }
    HttpResponse(status(1).toInt, hdrs, body)
  }

  // ------------------------------------------------------------ encode

  /** Conformant writer; `gzipPerRecord = true` emits the Common-Crawl
    * layout (each record its own gzip member, concatenated). */
  def encode(records: Seq[Record], gzipPerRecord: Boolean = false): Array[Byte] = {
    // CR/LF in any header field would inject extra header lines and
    // corrupt the record framing the decoder depends on — refuse
    def field(s: String, what: String): String = {
      require(!s.exists(c => c == '\r' || c == '\n'),
        s"WARC $what contains CR/LF (header-framing injection): '$s'")
      s
    }
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val one = new ByteArrayOutputStream()
      val sb = new StringBuilder("WARC/1.0\r\n")
      sb ++= s"WARC-Type: ${field(r.warcType, "type")}\r\n"
      if (r.targetUri.nonEmpty)
        sb ++= s"WARC-Target-URI: ${field(r.targetUri, "target URI")}\r\n"
      if (r.date.nonEmpty) sb ++= s"WARC-Date: ${field(r.date, "date")}\r\n"
      r.headers.foreach { case (k, v) =>
        // caller-supplied extras; the canonical four are ours
        if (!Set("warc-type", "warc-target-uri", "warc-date", "content-length")(k.toLowerCase))
          sb ++= s"${field(k, "header name")}: ${field(v, "header value")}\r\n"
      }
      sb ++= s"Content-Length: ${r.block.length}\r\n\r\n"
      one.write(sb.toString.getBytes("US-ASCII"))
      one.write(r.block)
      one.write("\r\n\r\n".getBytes("US-ASCII"))
      if (gzipPerRecord) {
        val gz = new ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(gz)
        g.write(one.toByteArray); g.close()
        out.write(gz.toByteArray)
      } else out.write(one.toByteArray)
    }
    out.toByteArray
  }

  /** Build an HTTP/1.1 200 response block. `chunked` uses RFC 9112
    * chunked framing; `gzipBody` compresses (Content-Encoding: gzip). */
  def httpBlock(body: Array[Byte], contentType: String,
                chunked: Boolean = false, gzipBody: Boolean = false): Array[Byte] = {
    val payload0 =
      if (gzipBody) {
        val gz = new ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(gz)
        g.write(body); g.close()
        gz.toByteArray
      } else body
    val payload =
      if (chunked) {
        val c = new ByteArrayOutputStream()
        // split into two chunks so real framing (not one degenerate
        // chunk) is exercised
        val cut = math.max(1, payload0.length / 2)
        Seq(payload0.take(cut), payload0.drop(cut)).filter(_.nonEmpty).foreach { part =>
          c.write(s"${part.length.toHexString}\r\n".getBytes("US-ASCII"))
          c.write(part); c.write("\r\n".getBytes("US-ASCII"))
        }
        c.write("0\r\n\r\n".getBytes("US-ASCII"))
        c.toByteArray
      } else payload0
    val sb = new StringBuilder("HTTP/1.1 200 OK\r\n")
    sb ++= s"Content-Type: $contentType\r\n"
    if (gzipBody) sb ++= "Content-Encoding: gzip\r\n"
    if (chunked) sb ++= "Transfer-Encoding: chunked\r\n"
    else sb ++= s"Content-Length: ${payload.length}\r\n"
    sb ++= "\r\n"
    val out = new ByteArrayOutputStream()
    out.write(sb.toString.getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }

  // ----------------------------------------------------------- helpers

  private def readHeaderBlock(b: Array[Byte], from: Int,
                              what: String): (String, Int) = {
    var i = from
    while (i + 3 < b.length &&
           !(b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n'))
      i += 1
    require(i + 3 < b.length, s"$what: no header terminator (CRLFCRLF)")
    (new String(b, from, i - from, "ISO-8859-1"), i + 4)
  }

  private def parseHeaders(lines: Array[String], what: String): Map[String, String] =
    lines.filter(_.nonEmpty).map { l =>
      val c = l.indexOf(':')
      require(c > 0, s"$what: malformed header line '$l'")
      l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim
    }.toMap

  private[graft] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    var done = false
    while (!done) {
      var j = i
      while (j + 1 < body.length && !(body(j) == '\r' && body(j + 1) == '\n')) j += 1
      require(j + 1 < body.length, "chunked body: missing size-line CRLF")
      val sizeLine = new String(body, i, j - i, "US-ASCII")
      val size = Integer.parseInt(sizeLine.split(";")(0).trim, 16) // ext ignored
      if (size == 0) done = true
      else {
        require(j + 2 + size + 2 <= body.length, "chunked body: chunk overruns")
        out.write(body, j + 2, size)
        require(body(j + 2 + size) == '\r' && body(j + 2 + size + 1) == '\n',
          "chunked body: missing chunk-data CRLF")
        i = j + 2 + size + 2
      }
    }
    out.toByteArray
  }

  /** Member-by-member gunzip with EXACT position accounting. The JDK's
    * GZIPInputStream treats an invalid next-member header as clean EOF
    * — a corrupted middle member of a gzip-per-record WARC would
    * silently truncate the archive. Here every member's header is
    * parsed (RFC 1952: magic, CM=8, FLG extras), the deflate stream
    * inflated raw, and the trailer's CRC32 and ISIZE VERIFIED; any
    * leftover bytes that are not a valid next member refuse loudly. */
  private[graft] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 10 <= bytes.length &&
        (bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
        s"gzip: invalid member header at byte $pos (corrupted member boundary)")
      require((bytes(pos + 2) & 0xff) == 8, s"gzip: unsupported CM at $pos")
      val flg = bytes(pos + 3) & 0xff
      var p = pos + 10
      if ((flg & 4) != 0) { // FEXTRA: u16le length + payload
        require(p + 2 <= bytes.length, "gzip: truncated FEXTRA")
        val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (p < bytes.length && bytes(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (p < bytes.length && bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      require(p <= bytes.length, s"gzip: truncated member header at $pos")
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, p, bytes.length - p)
      val crc = new java.util.zip.CRC32()
      val buf = new Array[Byte](8192)
      var memberOut = 0L
      while (!inf.finished()) {
        val n = try inf.inflate(buf) catch { case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(s"gzip: corrupt deflate data at member $pos: ${e.getMessage}")
        }
        require(n > 0 || inf.finished(),
          s"gzip: truncated deflate stream in member at $pos")
        out.write(buf, 0, n); crc.update(buf, 0, n); memberOut += n
      }
      val tr = p + inf.getBytesRead.toInt
      inf.end()
      require(tr + 8 <= bytes.length, s"gzip: truncated trailer for member at $pos")
      def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      require(le32(tr) == crc.getValue,
        s"gzip: CRC mismatch in member at $pos")
      require(le32(tr + 4) == (memberOut & 0xffffffffL),
        s"gzip: ISIZE mismatch in member at $pos")
      pos = tr + 8
    }
    out.toByteArray
  }
}
