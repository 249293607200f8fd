package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock breakdown of one board query (guide §1: find where the
  * time goes before touching anything). Registers a listener, runs the query
  * once warmed, and prints every Spark job's duration + description — serial
  * fixture lifecycles (txn commits, streaming drives) show up as long chains
  * of small jobs; compute-bound queries as a few large ones.
  * Usage: runMain graft.tools.JobProfile <q1,q2,...> [sfDir] [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val qNames = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Double, String)]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties.getProperty("spark.job.description"))
          .orElse(Option(e.properties.getProperty("callSite.short"))).getOrElse("?")
        starts.put(e.jobId, (e.time, desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (t0, desc) =>
          rows.add((e.jobId, (e.time - t0) / 1e3, desc))
        }
      }
    })
    qNames.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      // warm pass at sf0.001 (Bench protocol: codegen/JIT out of the timing)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      for (r <- 1 to reps) {
        rows.clear()
        graft.queries.DedupSim.invalidateSessionCaches(spark, sfDir)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain
        import scala.jdk.CollectionConverters._
        val snap = rows.asScala.toVector.sortBy(_._1)
        val sum = snap.map(_._2).sum
        val big = snap.filter(_._2 >= 0.2)
        println(f"[jobprofile] rep=$r $q rows=$n wall=$dt%.3f s, jobs=${snap.size}, " +
          f"sum(job)=$sum%.3f s, jobs>=0.2s: ${big.size}")
        big.foreach { case (id, s, d) =>
          println(f"[jobprofile]   job $id%4d $s%8.3f s  ${d.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
