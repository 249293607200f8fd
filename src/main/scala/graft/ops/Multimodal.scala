package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque BINARY columns + typed
  * metadata structs (SURVEY north star). Image decode and resize are REAL
  * codecs (javax.imageio — JDK-built-in, so offline-safe: PNG/BMP/GIF/JPEG);
  * video frame-sampling keeps a byte-window stand-in at the demux layer
  * (no container demuxer ships with the JDK) behind the real flatMap
  * plumbing. The Spark-side contracts — schema, partition-parallel
  * execution, per-item error-skip — are identical for all three.
  */
object Multimodal {

  final case class MediaMeta(nBytes: Long, magic: String, width: Int, height: Int,
                             checksum: Long)
  final case class MediaRow(docId: Long, content: Array[Byte])
  final case class DecodedMedia(docId: Long, meta: MediaMeta)

  /** Real image decode via javax.imageio: width/height from the decoded
    * raster, checksum = CRC32 over the ARGB pixel values (encoding-invariant:
    * the same picture re-encoded losslessly checksums identically). Unknown
    * formats / malformed payloads throw, exercising the error-skip path
    * (the reference's per-item skip idiom, pa.py:91-92). */
  def decodeImage(bytes: Array[Byte]): MediaMeta = {
    if (bytes.isEmpty) throw new IllegalArgumentException("empty payload")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException("undecodable payload")
    val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    val crc = new java.util.zip.CRC32()
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        crc.update(p >>> 24); crc.update((p >>> 16) & 0xff)
        crc.update((p >>> 8) & 0xff); crc.update(p & 0xff)
        x += 1
      }
      y += 1
    }
    MediaMeta(bytes.length.toLong, magic, img.getWidth, img.getHeight, crc.getValue)
  }

  /** Partition-parallel featurize: binary column → metadata struct, failures
    * → row dropped. Batching shape matches the inference operator so a
    * vectorized codec can reuse it. */
  def featurize(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try Some(DecodedMedia(r.docId, decodeImage(r.content)))
        catch { case _: Exception => None }
      }
    }
  }

  /** documents.text reinterpreted as UTF-8 payload bytes — the oracle-checkable
    * end of the multimodal path (byte length + md5 checksum are codec-free). */
  def bytesView(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      length(col("text")).cast("long").as("n_chars"),
      md5(col("text")).as("payload_md5"))

  // ------------------------------------------------------------------
  // Resize (real codec) / frame-sample (demux stub). Resize is a genuine
  // decode → bilinear scale → PNG re-encode; frame sampling keeps a
  // byte-window stand-in at the demux layer only.
  // ------------------------------------------------------------------

  final case class ResizedMedia(docId: Long, width: Int, height: Int,
                                content: Array[Byte])
  final case class Frame(docId: Long, frameIdx: Int, content: Array[Byte])

  /** Real image resize: javax.imageio decode → Graphics2D bilinear scale to
    * (w, h) → PNG re-encode. The JDK PNG writer is timestamp-free, so the
    * output bytes are deterministic for identical input. Malformed payloads
    * throw (error-skip in the operator). */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"target dims must be positive, got ($w, $h)")
    if (bytes.isEmpty) throw new IllegalArgumentException("empty payload")
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (src == null) throw new IllegalArgumentException("undecodable payload")
    val dst = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      try Some(ResizedMedia(r.docId, w, h, resizeImage(r.content, w, h)))
      catch { case _: Exception => None }
    })
  }

  /** Frame sampling with a STUB demux: production = container demux →
    * every-Nth-frame decode (no demuxer in the JDK, so frames are fixed-size
    * byte windows here); one output row per sampled frame (the flatMap row
    * explosion is the real contract). */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int, everyNth: Int): Dataset[Frame] = {
    require(frameBytes > 0 && everyNth > 0,
      s"frameBytes and everyNth must be positive, got ($frameBytes, $everyNth)")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      if (r.content.isEmpty) Iterator.empty
      else r.content.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % everyNth == 0 => Frame(r.docId, i, f) }
    })
  }
}
