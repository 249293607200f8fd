package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale spot-check runner (round-6 verdict item 2): times a named subset of
  * board queries against an arbitrary data dir — used to face the top-cost
  * queries at a synthesized ~sf1 slice (scripts/scalegen.py) and verify
  * near-linear growth vs sf0.1. Same session confs + min-of-N protocol as
  * Bench; results land in SCALECHECK_r*.md.
  *
  * Usage: runMain graft.tools.ScaleBench <sfDir> <q1,q2,...> [reps]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    // "ALL" = the complete board in name order (full-board SCALECHECK pass);
    // otherwise a comma list of exact names.
    val wanted =
      if (names == "ALL") qs.keys.toSeq.sorted else names.split(",").toSeq
    // compile-warmup pass at sf0.001 (Bench protocol: measure execution,
    // not Janino/C2 latency)
    val warmDir = "/root/testdata/sf0.001"
    wanted.foreach { n =>
      try qs(n)(spark, warmDir).count() catch { case _: Throwable => () }
    }
    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (_ <- 1 to reps) {
      graft.queries.DedupSim.invalidateSessionCaches(spark, sfDir)
      wanted.foreach { n =>
        val t0 = System.nanoTime()
        val cnt = try qs(n)(spark, sfDir).count() catch { case e: Throwable =>
          System.err.println(s"[scalebench] $n failed: ${e.getMessage}"); -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        mins(n) = math.min(mins.getOrElse(n, Double.MaxValue), dt)
        System.err.println(f"[scalebench] $n rows=$cnt dt=$dt%.2f")
      }
    }
    val qjson = mins.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f",
        java.lang.Double.valueOf(v))
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_subset","unit":"sec","reps":$reps,"queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
