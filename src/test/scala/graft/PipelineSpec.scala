package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Inference

/** End-to-end audio pipeline tests over the deterministic fixture corpus
  * (SURVEY §5.4): which files produce which segments, which filter rejects
  * which fixture, overlap-flag semantics with controlled transcribers,
  * first-writer-wins metadata dedup. */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = Files.createTempDirectory("graft_pipeline_spec")
  private def wavDir = base.resolve("wavs").toString
  private def outDir = base.resolve("out").toString

  override def beforeAll(): Unit = {
    graft.fixtures.AudioSynth.writeCorpus(wavDir)
  }
  override def afterAll(): Unit = spark.stop()

  test("decode skips the garbage file, keeps the 8 valid wavs") {
    assert(Pipeline.decodeWavDir(spark, wavDir).count() == 8)
  }

  test("segmentation: expected per-file segment sets") {
    val segs = Pipeline.segmentFiles(Pipeline.decodeWavDir(spark, wavDir))
      .collect().map(s => (s.originalName, s.startMs, s.endMs)).toSet
    val byFile = segs.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byFile("long_utterance.wav") == 3)       // 40 s split 15/15/10
    assert(byFile("tone_speechlike.wav") == 2)      // merge caps at 15 s span
    assert(byFile("short_utterances.wav") == 1)     // all shorts merged
    assert(byFile("whisper_quiet.wav") == 1)        // quiet but detected
    assert(byFile("stereo_speech_441.wav") == 1)    // stereo 44.1k: downmixed+resampled
    assert(!byFile.contains("silence_only.wav"))    // VAD empty
    // long_utterance split boundaries are exact
    assert(segs.filter(_._1 == "long_utterance.wav").map(s => (s._2, s._3)) ==
      Set((507L, 15507L), (15507L, 30507L), (30507L, 40493L)))
  }

  test("audio-quality filter rejects by RMS / clipping / music ratio respectively") {
    val segs = Pipeline.segmentFiles(Pipeline.decodeWavDir(spark, wavDir))
    val ok = Pipeline.audioQuality(segs).select("originalName").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!ok.contains("whisper_quiet.wav"))      // rms ~242 < 250
    assert(!ok.contains("clipped_square.wav"))     // clipping ~96% > 1%
    assert(!ok.contains("bass_treble_music.wav"))  // music ratio ~4.6 > 2.0
    assert(ok == Set("long_utterance.wav", "tone_speechlike.wav",
                     "short_utterances.wav", "stereo_speech_441.wav"))
  }

  test("overlap flag: constant boundary words flag all adjacent pairs, post-filter") {
    Inference.Transcribers.register("const", () => new Inference.Transcriber {
      def transcribe(b: Seq[Inference.AsrInput]): Seq[String] = b.map(_ => "alpha beta alpha")
    })
    val segs = Pipeline.segmentFiles(Pipeline.decodeWavDir(spark, wavDir))
    val flagged = Pipeline.textQualityAndOverlap(
      Pipeline.transcribe(Pipeline.audioQuality(segs), "const"))
    val byFile = flagged.select("originalName", "startMs", "overlap_flag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .groupBy(_._1)
    // files with >=2 surviving segments: all rows flagged (lag + lead)
    assert(byFile("long_utterance.wav").forall(_._3))
    assert(byFile("tone_speechlike.wav").forall(_._3))
    // singleton files: no neighbor, not flagged
    assert(byFile("short_utterances.wav").forall(!_._3))
    assert(byFile("stereo_speech_441.wav").forall(!_._3))
  }

  test("overlap flag: distinct texts produce no flags") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    Inference.Transcribers.register("distinct", () => new Inference.Transcriber {
      def transcribe(b: Seq[Inference.AsrInput]): Seq[String] =
        b.map(_ => { val i = counter.incrementAndGet(); s"unique$i words number$i" })
    })
    val segs = Pipeline.segmentFiles(Pipeline.decodeWavDir(spark, wavDir))
    val flagged = Pipeline.textQualityAndOverlap(
      Pipeline.transcribe(Pipeline.audioQuality(segs), "distinct"))
    assert(flagged.collect().forall(!_.getAs[Boolean]("overlap_flag")))
  }

  test("full run: stub transcriber end-to-end produces the golden metadata rows") {
    val meta = Pipeline.run(spark, wavDir, outDir).collect()
    val names = meta.map(_.getAs[String]("wav_path"))
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    // stub texts drop some segments (content-addressed); the survivors are
    // stable because the corpus and the stub are deterministic
    assert(names == Set(
      "long_utterance_0015s_0030s.wav",
      "short_utterances_0000s_0009s.wav",
      "tone_speechlike_0000s_0010s.wav",
      "stereo_speech_441_0000s_0004s.wav"))
    // exported files exist and are valid wavs
    names.foreach { n =>
      val f = Paths.get(outDir, n)
      assert(Files.exists(f))
      val dec = graft.io.WavCodec.decode(Files.readAllBytes(f))
      assert(dec.sampleRate == 16000 && dec.channels == 1)
    }
    // metrics columns populated, flags boolean
    meta.foreach { r =>
      assert(r.getAs[Double]("rms") > 250.0)
      assert(r.getAs[Double]("clipping_percent") <= 1.0)
      assert(r.getAs[Double]("music_ratio") <= 2.0)
    }
  }

  test("metadata dedup: colliding wav names keep the first writer") {
    import spark.implicits._
    val df = Seq(
      ("a.wav", 1000L, 2000L, "text one", "p/x.wav"),
      ("a.wav", 1400L, 2400L, "text two", "p/x.wav"), // same rounded name
      ("a.wav", 5000L, 9000L, "text three", "p/y.wav"))
      .toDF("originalName", "startMs", "endMs", "text", "wav_path")
      .withColumn("rms", org.apache.spark.sql.functions.lit(300.0))
      .withColumn("clippingPercent", org.apache.spark.sql.functions.lit(0.0))
      .withColumn("musicRatio", org.apache.spark.sql.functions.lit(0.1))
      .withColumn("overlap_flag", org.apache.spark.sql.functions.lit(false))
    val out = Pipeline.metadata(df).collect()
    assert(out.length == 2)
    val x = out.find(_.getAs[String]("wav_path") == "p/x.wav").get
    assert(x.getAs[String]("text") == "text one") // first writer (startMs 1000)
  }

  test("transcribe preserves row-text alignment across micro-batches") {
    val rows = (1 to 20).map(i => s"row$i").iterator
    val out = Inference.transcribePartition[String](
      rows,
      r => Inference.AsrInput(Array(r.length.toFloat), 16000),
      (r, t) => s"$r:$t",
      "stub", batchSize = 8).toSeq
    assert(out.size == 20)
    assert(out.zipWithIndex.forall { case (s, i) => s.startsWith(s"row${i + 1}:") })
  }

  test("runCounted: per-stage counters match the fixture design (O25 summary)") {
    val out2 = base.resolve("out2").toString
    val (rows, counters) = Pipeline.runCounted(spark, wavDir, out2)
    assert(counters("segments") == 10)   // 3+2+1+1+1 speech/quiet/stereo + clip + music
    assert(counters("audio_pass") == 7)  // quiet/clipped/music rejected
    assert(counters("text_pass") == 4)   // stub text drops 3 of 7
    assert(counters("exported") == 4)
    assert(counters("metadata_rows") == 4 && rows.length == 4)
  }

  test("streaming audio ingest: two micro-batches converge to the batch-run metadata") {
    import org.apache.spark.sql.functions.col
    val streamSrc = base.resolve("stream_src")
    val streamWavs = base.resolve("stream_wavs").toString
    val metaPath = base.resolve("stream_meta").toString
    Files.createDirectories(streamSrc)
    // stage the corpus as (path, content) parquet rows, split into 2 batches
    import spark.implicits._
    val files = Files.list(Paths.get(wavDir)).toArray.map(_.toString).sorted
    val rows = files.map(f => (f, Files.readAllBytes(Paths.get(f))))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    // write each batch as one parquet file, moved atomically into the source
    // dir so the file stream only ever sees complete files
    def stageDirect(batch: Array[(String, Array[Byte])], sub: String): Unit = {
      val tmp = base.resolve(s"tmp_$sub").toString
      batch.toSeq.toDF("path", "content").coalesce(1).write.mode("overwrite").parquet(tmp)
      Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
        .foreach(f => Files.move(Paths.get(f), streamSrc.resolve(s"$sub.parquet")))
    }
    stageDirect(b1, "batch1")
    val q = graft.streaming.Streaming.audioIngest(
      spark, streamSrc.toString, streamWavs, metaPath, queryName = "spec_audio_ingest")
    try {
      q.processAllAvailable()
      stageDirect(b2, "batch2")
      q.processAllAvailable()
      // replay batch1 (duplicate files) — INSERT OR IGNORE must not add rows
      stageDirect(b1, "batch1_replay")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(metaPath)
      .select("original_name", "wav_path", "text", "overlap_flag")
      .collect()
      .map(r => (r.getString(0), r.getString(1).substring(r.getString(1).lastIndexOf('/') + 1),
                 r.getString(2), r.getBoolean(3))).toSet
    val batchRun = Pipeline.run(spark, wavDir, base.resolve("batch_out").toString)
      .select("original_name", "wav_path", "text", "overlap_flag")
      .collect()
      .map(r => (r.getString(0), r.getString(1).substring(r.getString(1).lastIndexOf('/') + 1),
                 r.getString(2), r.getBoolean(3))).toSet
    assert(streamed == batchRun && streamed.nonEmpty)
  }
}
