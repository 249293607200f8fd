package graft.io

import java.io.ByteArrayOutputStream

/** YUV4MPEG2 (.y4m) codec — the RAW-VIDEO interchange format of the
  * mjpegtools/ffmpeg world: a one-line ASCII header, then uncompressed
  * planar YUV frames each behind a `FRAME` marker. Vision-pipeline
  * relevance: it is the format frame-accurate tooling hands around
  * when codecs must stay out of the loop, and it completes this
  * engine's video story (AVI/MP4 carry MJPEG through [[JpegCodec]];
  * Y4M carries the uncompressed class). Everything derives from the
  * public mjpegtools y4m specification.
  *
  * == Scope ==
  *
  *  - Colorspaces: `C420jpeg`/`C420mpeg2`/`C420paldv` (decoded as the
  *    same 4:2:0 samples — the tags differ only in chroma SITING,
  *    which raw sample access does not re-interpolate), `C444`, and
  *    `Cmono`. `C422`/`C411`/10-bit tags refuse BY NAME.
  *  - Interlacing: progressive (`Ip` or absent). `It`/`Ib`/`Im`
  *    refuse by name — field weaving is an editing concern.
  *  - Frame-level parameters after `FRAME` are tolerated and ignored
  *    (the spec allows per-frame X params); a truncated final frame
  *    refuses loudly, never yields a short plane.
  *
  * Every frame is FIXED SIZE once the header is read, so frame k
  * lives at a closed-form byte offset — at 100 TB that is a ranged
  * read per sampled frame, not a scan (the same property the MP4
  * stco/stsz tables provide for MJPEG).
  *
  * [[yuvToRgb]] is the standard INTEGER BT.601 limited-range
  * approximation (the published fixed-point form: R = clip((298·(Y−16)
  * + 409·(V−128) + 128) >> 8) …) — pure integer, so q333 restates it
  * relationally with zero float drift. */
object Y4mCodec {

  final case class Frame(y: Array[Byte], u: Array[Byte], v: Array[Byte])
  final case class Clip(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                        colorspace: String, frames: Vector[Frame])

  private val MaxPixels = 1 << 24 // same sanity cap as the image codecs

  def decode(bytes: Array[Byte]): Clip = {
    val nl0 = bytes.indexOf('\n'.toByte)
    require(nl0 > 0, "no Y4M header line")
    val header = new String(bytes, 0, nl0, "US-ASCII")
    val tokens = header.split(" ")
    require(tokens(0) == "YUV4MPEG2", s"missing YUV4MPEG2 magic: '${tokens(0)}'")
    var w = -1; var h = -1; var fn = 25; var fd = 1
    var cs = "C420jpeg" // the spec's default when C is absent
    tokens.drop(1).filter(_.nonEmpty).foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.drop(1).toInt
        case 'H' => h = t.drop(1).toInt
        case 'F' =>
          val p = t.drop(1).split(":")
          require(p.length == 2, s"bad frame rate '$t'")
          fn = p(0).toInt; fd = p(1).toInt
        case 'I' =>
          require(t == "Ip", s"interlaced Y4M unsupported ('$t' — progressive only)")
        case 'C' => cs = t
        case 'A' | 'X' => () // aspect + extensions: tolerated
        case other => throw new IllegalArgumentException(
          s"unknown Y4M header parameter '$t'")
      }
    }
    require(w > 0 && h > 0, s"missing/bad dimensions W$w H$h")
    require(fn > 0 && fd > 0, s"bad frame rate $fn:$fd")
    require(w.toLong * h <= MaxPixels, s"frame $w x $h exceeds the pixel cap")
    val (ySize, cSize) = cs match {
      case "C420jpeg" | "C420mpeg2" | "C420paldv" =>
        require(w % 2 == 0 && h % 2 == 0, s"4:2:0 needs even dims, got $w x $h")
        (w * h, (w / 2) * (h / 2))
      case "C444" => (w * h, w * h)
      case "Cmono" => (w * h, 0)
      case other => throw new IllegalArgumentException(
        s"Y4M colorspace '$other' unsupported (C420*/C444/Cmono)")
    }
    val frames = Vector.newBuilder[Frame]
    var pos = nl0 + 1
    while (pos < bytes.length) {
      // FRAME marker + optional parameters up to newline
      require(pos + 5 <= bytes.length &&
        new String(bytes, pos, 5, "US-ASCII") == "FRAME",
        s"expected FRAME marker at byte $pos")
      var nl = pos + 5
      while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
      require(nl < bytes.length, "unterminated FRAME header")
      val data = nl + 1
      require(data + ySize + 2 * cSize <= bytes.length,
        s"truncated Y4M frame at byte $data")
      frames += Frame(
        java.util.Arrays.copyOfRange(bytes, data, data + ySize),
        java.util.Arrays.copyOfRange(bytes, data + ySize, data + ySize + cSize),
        java.util.Arrays.copyOfRange(bytes, data + ySize + cSize,
          data + ySize + 2 * cSize))
      pos = data + ySize + 2 * cSize
    }
    Clip(w, h, fn, fd, cs, frames.result())
  }

  def encode(clip: Clip): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(
      s"YUV4MPEG2 W${clip.width} H${clip.height} F${clip.fpsNum}:${clip.fpsDen} Ip A1:1 ${clip.colorspace}\n"
        .getBytes("US-ASCII"))
    clip.frames.foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(f.y); out.write(f.u); out.write(f.v)
    }
    out.toByteArray
  }

  /** Integer BT.601 limited-range YUV → full-range RGB (the published
    * fixed-point form). Inputs 0..255; output each 0..255. The >>8 on a
    * possibly-negative sum differs between floor and truncate semantics
    * only where the result clips to 0 anyway, so floor-division
    * restatements (DuckDB `//`) hash-match exactly. */
  def yuvToRgb(y: Int, u: Int, v: Int): (Int, Int, Int) = {
    val c = 298 * (y - 16)
    def clip(x: Int): Int = math.max(0, math.min(255, x))
    (clip((c + 409 * (v - 128) + 128) >> 8),
     clip((c - 100 * (u - 128) - 208 * (v - 128) + 128) >> 8),
     clip((c + 516 * (u - 128) + 128) >> 8))
  }

  /** Temporal sampling: indices of every `step`-th frame starting at
    * `offset` — the frame-sample verb of a vision curation pipeline.
    * Pure index arithmetic so callers can turn it into RANGED reads. */
  def sampleIndices(nFrames: Int, step: Int, offset: Int = 0): Seq[Int] = {
    require(step >= 1 && offset >= 0, s"bad sampling: step=$step offset=$offset")
    offset.until(nFrames, step)
  }
}
