package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque BINARY columns + typed
  * metadata structs (SURVEY north star). The decode kernel is a clearly
  * marked deterministic STUB (the real image/audio codecs are not in this
  * container); the Spark-side plumbing — schema, batch iteration, null-safe
  * error handling, partition-parallel execution — is real and tested, so
  * swapping in a real codec is a one-function change.
  */
object Multimodal {

  final case class MediaMeta(nBytes: Long, magic: String, width: Int, height: Int,
                             checksum: Long)
  final case class MediaRow(docId: Long, content: Array[Byte])
  final case class DecodedMedia(docId: Long, meta: MediaMeta)

  /** STUB decode: in production this is an image/audio codec call (e.g.
    * javax.imageio / ffmpeg). Here: deterministic pseudo-metadata derived
    * from the bytes so tests can assert exact values. Malformed (empty)
    * payloads throw, exercising the error path. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes.isEmpty) throw new IllegalArgumentException("empty payload")
    val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    var ck = 17L
    var i = 0
    while (i < bytes.length) { ck = ck * 31 + (bytes(i) & 0xff); i += 1 }
    MediaMeta(bytes.length.toLong, magic,
      width = 1 + math.floorMod(ck, 1920L).toInt,
      height = 1 + math.floorMod(ck >> 11, 1080L).toInt,
      checksum = ck)
  }

  /** Partition-parallel featurize: binary column → metadata struct, failures
    * → null row dropped (the reference's per-item error-skip idiom,
    * pa.py:91-92). Batching shape matches the inference operator so a real
    * vectorized codec can reuse it. */
  def featurize(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try Some(DecodedMedia(r.docId, decodeStub(r.content)))
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
  // Resize / frame-sample (the remaining multimodal checklist ops). Both are
  // STUBS at the codec layer — the byte-level transforms are deterministic
  // placeholders — but the operator contracts (schema in/out, partition
  // parallelism, error-skip) are the real Spark plumbing a production codec
  // drops into.
  // ------------------------------------------------------------------

  final case class ResizedMedia(docId: Long, width: Int, height: Int,
                                content: Array[Byte])
  final case class Frame(docId: Long, frameIdx: Int, content: Array[Byte])

  /** STUB resize: production = image decode → scale → re-encode. Here the
    * payload is deterministically downsampled (every k-th byte) and the
    * target dims recorded — asserting the contract that resize changes both
    * metadata and payload consistently. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes.isEmpty) throw new IllegalArgumentException("empty payload")
    val k = math.max(1, bytes.length / math.max(1, w * h / 64))
    bytes.indices.collect { case i if i % k == 0 => bytes(i) }.toArray
  }

  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      try Some(ResizedMedia(r.docId, w, h, resizeStub(r.content, w, h)))
      catch { case _: Exception => None }
    })
  }

  /** STUB frame sampling: production = container demux → every-Nth-frame
    * decode. Here frames are fixed-size byte windows; one output row per
    * sampled frame (flatMap shape — the row explosion is the real contract). */
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
