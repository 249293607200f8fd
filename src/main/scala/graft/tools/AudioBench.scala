package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Audio-pipeline throughput benchmark: replicates the fixture corpus N times
  * (distinct file names → distinct pipeline keys) and measures end-to-end
  * wall-clock of Pipeline.run. Prints one JSON line.
  *
  * Context for the number: the reference processes files serially in one
  * Python process with Whisper dominating (seconds-to-minutes per file even
  * on GPU); this pipeline's non-ASR stages parallelize across all cores and
  * the stub isolates engine throughput from model cost.
  * Run: sbt "runMain graft.tools.AudioBench [copies]" (default 8 → 56 files).
  */
object AudioBench {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Files.createTempDirectory("graft_audio_bench")
    val seed = base.resolve("seed")
    val wavDir = base.resolve("wavs")
    Files.createDirectories(wavDir)
    graft.fixtures.AudioSynth.writeCorpus(seed.toString)
    val seedFiles = Files.list(seed).toArray.map(_.toString).filter(_.endsWith(".wav"))
    (0 until copies).foreach { c =>
      seedFiles.foreach { f =>
        val name = Paths.get(f).getFileName.toString
        Files.copy(Paths.get(f), wavDir.resolve(f"c$c%03d_$name"))
      }
    }
    val nFiles = Files.list(wavDir).count()
    val totalBytes = Files.list(wavDir).toArray
      .map(p => Files.size(p.asInstanceOf[java.nio.file.Path])).sum

    // warm up the session, then measure
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    val t0 = System.nanoTime()
    val rows = graft.Pipeline.run(spark, wavDir.toString, base.resolve("out").toString).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"audio_pipeline","files":$nFiles,"mb":${totalBytes / 1e6}%.1f,"metadata_rows":$rows,"sec":$sec%.2f,"files_per_sec":${nFiles / sec}%.1f,"mb_per_sec":${totalBytes / 1e6 / sec}%.1f}""")
    spark.stop()
  }
}
