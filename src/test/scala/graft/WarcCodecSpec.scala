package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.WarcCodec
import WarcCodec.{Record, HttpResponse}

/** WARC: record walk (plain + gzip-per-record), header parsing, HTTP
  * payload decode (identity/chunked/gzip), chunk framing details, and
  * the refusal surface (foreign encodings, truncation, framing). */
class WarcCodecSpec extends AnyFunSuite {

  private val date = "2024-01-01T00:00:00Z"

  private def sampleRecords(body: Array[Byte]): Seq[Record] = Seq(
    Record("warcinfo", "", date, Map.empty, "software: x\r\n".getBytes("US-ASCII")),
    Record("response", "http://a.io/p", date, Map.empty,
      WarcCodec.httpBlock(body, "text/html")),
    Record("response", "http://a.io/q", date, Map.empty,
      WarcCodec.httpBlock(body, "text/html", chunked = true)),
    Record("response", "http://a.io/r", date, Map.empty,
      WarcCodec.httpBlock(body, "text/html", gzipBody = true)))

  test("plain and gzip-per-record containers walk identically") {
    val body = "<p>hello corpus</p>".getBytes("UTF-8")
    val recs = sampleRecords(body)
    for (gz <- Seq(false, true)) {
      val decoded = WarcCodec.decode(WarcCodec.encode(recs, gzipPerRecord = gz))
      assert(decoded.length == 4, s"gz=$gz")
      assert(decoded.map(_.warcType) == Vector("warcinfo", "response", "response", "response"))
      assert(decoded(1).targetUri == "http://a.io/p" && decoded(1).date == date)
      // all three transfer shapes reconstruct the SAME body bytes
      decoded.drop(1).foreach { r =>
        val resp = WarcCodec.httpResponse(r.block)
        assert(resp.status == 200)
        assert(java.util.Arrays.equals(resp.body, body), s"gz=$gz uri=${r.targetUri}")
      }
    }
  }

  test("chunk framing: sizes in hex, extensions ignored, exact terminator") {
    val chunked = ("a\r\n0123456789\r\n" + "3;ext=1\r\nabc\r\n" + "0\r\n\r\n")
      .getBytes("US-ASCII")
    assert(new String(WarcCodec.dechunk(chunked), "US-ASCII") == "0123456789abc")
    assert(intercept[IllegalArgumentException](WarcCodec.dechunk(
      "5\r\nab".getBytes("US-ASCII"))).getMessage.contains("overruns"))
    assert(intercept[IllegalArgumentException](WarcCodec.dechunk(
      "3\r\nabcXY0\r\n\r\n".getBytes("US-ASCII"))).getMessage.contains("CRLF"))
  }

  test("refusals: foreign encodings by name, truncation, missing length") {
    val block = WarcCodec.httpBlock("x".getBytes, "text/plain")
    val br = new String(block, "ISO-8859-1")
      .replace("Content-Length", "Content-Encoding: br\r\nContent-Length")
    assert(intercept[IllegalArgumentException](
      WarcCodec.httpResponse(br.getBytes("ISO-8859-1")))
      .getMessage.contains("'br'"))
    val te = new String(block, "ISO-8859-1")
      .replace("Content-Length", "Transfer-Encoding: deflate\r\nContent-Length")
    assert(intercept[IllegalArgumentException](
      WarcCodec.httpResponse(te.getBytes("ISO-8859-1")))
      .getMessage.contains("'deflate'"))
    val whole = WarcCodec.encode(sampleRecords("y".getBytes))
    assert(intercept[IllegalArgumentException](
      WarcCodec.decode(whole.take(whole.length - 6))).getMessage
      .matches(".*(overruns|CRLFCRLF|terminator).*"))
    // a record whose headers lack Content-Length refuses by name
    val noLen = ("WARC/1.0\r\nWARC-Type: metadata\r\n\r\nbody\r\n\r\n")
      .getBytes("US-ASCII")
    assert(intercept[IllegalArgumentException](WarcCodec.decode(noLen))
      .getMessage.contains("Content-Length"))
  }

  test("a corrupted middle gzip member refuses loudly, never truncates") {
    val recs = sampleRecords("q".getBytes)
    val gz = WarcCodec.encode(recs, gzipPerRecord = true)
    // find the SECOND member's magic and break it — the JDK stream
    // would treat this as clean EOF and silently drop records 2..n
    var second = -1
    var i = 2
    while (second < 0 && i < gz.length - 1) {
      if ((gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b &&
          (gz(i + 2) & 0xff) == 8) second = i
      else i += 1
    }
    assert(second > 0)
    val broken = gz.clone(); broken(second) = 0x00
    val e = intercept[IllegalArgumentException](WarcCodec.decode(broken))
    assert(e.getMessage.contains("member"))
    // a flipped byte INSIDE a member trips the CRC check
    val flipped = gz.clone()
    flipped(second - 12) = (flipped(second - 12) ^ 0x01).toByte
    assert(intercept[IllegalArgumentException](WarcCodec.decode(flipped))
      .getMessage.matches(".*(CRC|deflate|ISIZE|member).*"))
  }

  test("encode refuses CR/LF header injection in every field") {
    def rec(uri: String) = Seq(Record("response", uri, date, Map.empty,
      WarcCodec.httpBlock("x".getBytes, "text/plain")))
    assert(intercept[IllegalArgumentException](
      WarcCodec.encode(rec("http://x/\r\nContent-Length: 0")))
      .getMessage.contains("injection"))
    assert(intercept[IllegalArgumentException](
      WarcCodec.encode(Seq(Record("response\nX: y", "http://x/", date,
        Map.empty, Array[Byte]())))).getMessage.contains("injection"))
    assert(intercept[IllegalArgumentException](
      WarcCodec.encode(Seq(Record("response", "http://x/", date,
        Map("X-Extra" -> "a\rb"), Array[Byte]())))).getMessage.contains("injection"))
  }

  test("multi-member gzip input: members concatenate transparently") {
    val recs = sampleRecords("z".getBytes)
    val gz = WarcCodec.encode(recs, gzipPerRecord = true)
    // sanity: the container really is multiple members
    var members = 0
    (0 until gz.length - 1).foreach { i =>
      if ((gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b) members += 1
    }
    assert(members >= recs.length) // one magic per member (none in deflate noise is possible but ≥ is what we assert)
    assert(WarcCodec.decode(gz).length == recs.length)
  }
}
