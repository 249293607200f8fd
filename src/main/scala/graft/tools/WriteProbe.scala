package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probes for the txn block's per-write overhead: what part of a
  * tiny `df.write.parquet` costs 0.2s — source task count, committer FS
  * ceremony, or planning? (guide §1: measure before changing). */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String, n: Int = 5)(f: Int => A): Unit = {
      val ts = (1 to n).map { i =>
        val t0 = System.nanoTime(); f(i); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-52s min=${ts.min}%6.3f med=${ts.sorted.apply(n / 2)}%6.3f")
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_wp").toString
    val base = graft.core.Tables.lineitem(spark, sfDir).select(
      col("l_orderkey").as("ok"), col("l_partkey").as("x"), col("l_suppkey").as("y"))
      .filter(expr("ok % 2 = 0")).localCheckpoint()
    println(s"[probe] base partitions = ${base.rdd.getNumPartitions}, rows = ${base.count()}")
    val base1 = base.coalesce(1).localCheckpoint()
    // warm all shapes
    base.filter("ok % 8 = 0").repartition(1).write.mode("overwrite").parquet(s"$tmp/w")
    t("filter+repartition(1).write (from 32-part cp)")(i =>
      base.filter("ok % 8 = 0").repartition(1).write.mode("overwrite").parquet(s"$tmp/a$i"))
    t("filter+coalesce(1).write  (from 32-part cp)")(i =>
      base.filter("ok % 8 = 0").coalesce(1).write.mode("overwrite").parquet(s"$tmp/b$i"))
    t("filter+repartition(1).write (from 1-part cp)")(i =>
      base1.filter("ok % 8 = 0").repartition(1).write.mode("overwrite").parquet(s"$tmp/c$i"))
    t("filter only .write (from 1-part cp)")(i =>
      base1.filter("ok % 8 = 0").write.mode("overwrite").parquet(s"$tmp/d$i"))
    val tiny = spark.range(100).selectExpr("id as ok", "id as x", "id as y")
      .coalesce(1).localCheckpoint()
    t("100-row 1-part cp .write")(i =>
      tiny.write.mode("overwrite").parquet(s"$tmp/e$i"))
    t("100-row 1-part cp .count")(i => tiny.count())
    // committer ceremony: marksuccessfuljobs=false + algo v2
    spark.conf.set("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    spark.conf.set("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    t("100-row write, no _SUCCESS + committer v2")(i =>
      tiny.write.mode("overwrite").parquet(s"$tmp/f$i"))
    t("32p filter+repartition(1), no _SUCCESS + v2")(i =>
      base.filter("ok % 8 = 0").repartition(1).write.mode("overwrite").parquet(s"$tmp/g$i"))
    spark.stop()
  }
}
