package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeated per-query timing (noise-resistant: reports min/median over N
  * reps in one warmed JVM). Usage:
  *   sbt "runMain graft.tools.QTime <sfDir> <reps> <query...>"
  * A query name of "all" times every SparkEntry query. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val wanted = args.drop(2).toSeq match {
      case Seq() | Seq("all") => graft.SparkEntry.queries.keys.toSeq.sorted
      case qs => qs
    }
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    var total = 0.0
    wanted.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val mn = ts.head
      val med = ts(ts.length / 2)
      total += mn
      println(f"[qtime] $q%-32s min=$mn%7.3f med=$med%7.3f reps=$reps")
    }
    println(f"[qtime] TOTAL(min)=$total%.3f over ${wanted.length} queries")
    spark.stop()
  }
}
