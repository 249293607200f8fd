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
      octet_length(col("text")).as("n_bytes"),
      length(col("text")).as("n_chars"),
      md5(col("text")).as("payload_md5"))
}
