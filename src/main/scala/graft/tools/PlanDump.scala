package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named board queries to files — the
  * round-17 optimization deliverable (`plans/r17/<query>_{before,after}.txt`).
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]
  * Plans are captured at the bench's session shape (local[32], AQE on,
  * shuffle.partitions=32) so the dumped plan is the one the bench executes.
  * NOTE: this prints the PRE-EXECUTION plan (isFinalPlan=false under AQE);
  * join-strategy pins that depend on runtime stats are asserted by
  * PlanCheck, which inspects the executed plan instead. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, names) = args.take(3)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.split(",").foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${q}_$suffix.txt"), plan)
        println(s"[plandump] wrote $outDir/${q}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $q failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
