package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints per-stage survivor counts of the audio pipeline over the fixture
  * corpus — the Spark analog of the reference's per-stage log lines
  * (pa.py:163, 237, 332). */
object AudioDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), "graft_audio_fixture")
    val wavDir = base.resolve("wavs").toString
    val outDir = base.resolve("out").toString
    graft.fixtures.AudioSynth.writeCorpus(wavDir)
    // direct (non-Spark) probe of the quiet fixture's VAD chain
    locally {
      val bytes = java.nio.file.Files.readAllBytes(base.resolve("wavs/whisper_quiet.wav"))
      val dec = graft.io.WavCodec.decode(bytes)
      val norm = graft.ops.Dsp.peakNormalize(graft.ops.Dsp.downmixMono(dec.samples, dec.channels))
      val res = graft.ops.Dsp.resampleLinear(norm, dec.sampleRate, 16000)
      println(s"[probe] whisper_quiet: n=${res.length} peak=${res.map(math.abs).max}")
      for (w <- Seq(1000, 1050, 1100, 5000, 5050)) {
        val a = w * 16; val b = (w + 300) * 16
        val seg = res.slice(a, b)
        val rms = math.sqrt(seg.map(x => x.toDouble * 32767 * x * 32767).sum / seg.length)
        println(f"[probe] window@$w rms=$rms%.1f dbfs=${graft.ops.Dsp.dbfs(rms)}%.2f")
      }
      val ns = graft.ops.Segmentation.detectNonSilent(res, 16000)
      println(s"[probe] nonsilent=$ns")
      println(s"[probe] merged=${graft.ops.Segmentation.segment(res, 16000)}")
    }
    val decoded = graft.Pipeline.decodeWavDir(spark, wavDir).cache()
    println(s"[stage] decoded files: ${decoded.count()}")
    val segments = graft.Pipeline.segmentFiles(decoded).cache()
    println(s"[stage] segments:")
    segments.groupBy(col("originalName")).agg(count(lit(1)), collect_list(struct(col("startMs"), col("endMs"))))
      .orderBy(col("originalName")).show(20, false)
    val audioOk = graft.Pipeline.audioQuality(segments).cache()
    println(s"[stage] audio-quality metrics (all segments):")
    graft.Pipeline.audioQuality(segments).select(col("originalName"), col("startMs"), col("endMs"),
      round(col("rms"),1), round(col("clipping_percent"),3), round(col("music_ratio"),3)).orderBy(col("originalName"), col("startMs")).show(30, false)
    // metrics BEFORE filter for the rejected ones:
    val metricsAll = {
      val m = segments.toDF()
      val mr = udf { (s: Seq[Float], r: Int) => try graft.ops.Dsp.musicRatio(s.toArray, r) catch { case _: Exception => -1.0 } }
      m.withColumn("rms", sqrt(expr("aggregate(samples, 0D, (a, x) -> a + (x * 32767D) * (x * 32767D))") / size(col("samples"))))
        .withColumn("clip", lit(100.0) * size(expr("filter(samples, x -> abs(x) >= 0.98)")) / size(col("samples")))
        .withColumn("music", mr(col("samples"), col("frameRate")))
    }
    metricsAll.select(col("originalName"), col("startMs"), col("endMs"), round(col("rms"),1), round(col("clip"),3), round(col("music"),3))
      .orderBy(col("originalName"), col("startMs")).show(30, false)
    val withText = graft.Pipeline.transcribe(audioOk, "stub").cache()
    println("[stage] transcribed:")
    withText.select(col("originalName"), col("startMs"), col("text")).orderBy(col("originalName"), col("startMs")).show(30, false)
    val flagged = graft.Pipeline.textQualityAndOverlap(withText)
    println(s"[stage] text-filtered: ${flagged.count()}")
    spark.stop()
  }
}
