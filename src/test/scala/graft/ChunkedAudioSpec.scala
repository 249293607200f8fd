package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.io.WavCodec
import graft.ops.ChunkedAudio

/** The chunked decode path must reproduce the whole-file path EXACTLY —
  * same segment boundaries, same padded sample arrays — on a long file with
  * many chunk-boundary crossings, at more than one chunk size, including a
  * chunk size that divides nothing evenly. */
class ChunkedAudioSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** ~3 min of alternating tone bursts and silences at 44.1 kHz (exercises
    * downmix-free mono decode, normalization, resampling to 16 kHz, and VAD
    * across dozens of chunk boundaries). Deterministic. */
  private def longWav(totalSec: Double = 185.0): Array[Byte] = {
    val rate = 44100
    val n = (totalSec * rate).toInt
    val samples = new Array[Float](n)
    var i = 0
    var k = 0
    while (i < n) {
      val burstLen = ((1.5 + (k % 7) * 0.8) * rate).toInt
      val silLen = ((0.35 + 0.05 * (k % 4)) * rate).toInt
      val freq = 180.0 + 37.0 * (k % 11)
      var j = 0
      while (j < burstLen && i < n) {
        // gentle fade at the edges keeps the burst boundary unambiguous
        val env = math.min(1.0, math.min(j, burstLen - j) / (0.02 * rate))
        samples(i) = (0.35 * env * math.sin(2 * math.Pi * freq * j / rate)).toFloat
        i += 1; j += 1
      }
      i += silLen // silence = zeros
      k += 1
    }
    // one short transient owns the global peak, so post-normalization the
    // tones sit near 0.39 amplitude — comfortably under the 0.98 clipping
    // threshold of the audio-quality filter
    samples(1000) = 0.9f
    WavCodec.encodeMono16(samples, rate)
  }

  private def segKey(r: Pipeline.SegmentRow) = (r.originalName, r.startMs)

  test("chunked segmentation is bit-identical to whole-file segmentation") {
    import spark.implicits._
    val wav = longWav()
    val shortWav = WavCodec.encodeMono16(
      Array.tabulate((4.2 * 44100).toInt)(j =>
        (0.3 * math.sin(2 * math.Pi * 220 * j / 44100.0)).toFloat), 44100)
    val rows = Seq(
      ("dir/long.wav", wav),
      ("dir/short.wav", shortWav),
      ("dir/garbage.wav", "not a wav at all".getBytes("UTF-8"))
    ).toDF("path", "content")

    val whole = Pipeline.segmentFiles(Pipeline.decodeWavRows(rows))
      .collect().sortBy(segKey)
    assert(whole.length >= 10, s"expected a rich segment set, got ${whole.length}")
    assert(whole.map(_.originalName).distinct.sorted.toSeq ==
      Seq("long.wav", "short.wav")) // garbage skipped in both paths

    for (chunkSec <- Seq(60, 7)) {
      val chunked = ChunkedAudio.segments(rows, chunkSec).collect().sortBy(segKey)
      assert(chunked.length == whole.length, s"chunkSec=$chunkSec row count")
      whole.zip(chunked).foreach { case (w, c) =>
        assert((c.originalName, c.startMs, c.endMs, c.padStartMs, c.padEndMs,
                c.frameRate) ==
               (w.originalName, w.startMs, w.endMs, w.padStartMs, w.padEndMs,
                w.frameRate), s"chunkSec=$chunkSec boundaries")
        assert(c.samples.length == w.samples.length &&
               c.samples.sameElements(w.samples),
          s"chunkSec=$chunkSec samples of ${w.originalName}@${w.startMs}")
      }
    }
  }

  test("chunk rows are bounded and segments feed the downstream pipeline") {
    import spark.implicits._
    val rows = Seq(("dir/long.wav", longWav())).toDF("path", "content")
    val chunks = ChunkedAudio.decodeChunked(rows, chunkSec = 60).collect()
    // 185 s -> 4 chunks; every row bounded by chunkSec (+ lookahead) at 16 kHz
    assert(chunks.length == 4)
    assert(chunks.forall(c => c.res.length <= 60 * 16000 + 16000))
    assert(chunks.forall(c => c.look.length <= 300 * 16))
    // the chunked front end composes with the unchanged downstream stages
    val metrics = Pipeline.audioQuality(ChunkedAudio.segments(rows, 60))
    assert(metrics.count() > 0)
  }
}
