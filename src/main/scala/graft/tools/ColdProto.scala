package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone replay of Bench's cold-protocol pass (round-11 verdict item 1:
  * the r01proto ratio drifted 1.074x -> 1.412x on untouched query code, and a
  * single-rep cold measurement can't distinguish drift from noise). This main
  * reproduces EXACTLY the pass Bench runs first — genuinely cold JVM, the 57
  * r01 queries in name order, single rep, no warmup — and exits, so min-of-N
  * across N FRESH JVM LAUNCHES becomes a ~30 s/run measurement instead of a
  * ~250 s full-board run. Session confs mirror Bench's.
  */
object ColdProto {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val perQ = graft.Bench.r01Baseline.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = perQ.map(_._2).sum
    val base = graft.Bench.r01Baseline.values.sum
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      java.lang.Double.valueOf(v))
    // top contributors, for diagnosing where cold cost concentrates
    perQ.sortBy(-_._2).take(8).foreach { case (n, t) =>
      System.err.println(f"[coldproto] $n ${t}%.3f")
    }
    println(s"""{"metric":"r01_subset_r01proto","value":${f(total)},"r01_value":${f(base)},"ratio":${f(total / base)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
