package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-timings for the TxnLog primitives the txn-block queries chain
  * (guide §1: find where the time goes before touching anything). Times
  * tiny commits, reads, pruned scans and optimize passes in a warmed JVM
  * so the per-OPERATION overhead is visible separately from real compute.
  * Usage: runMain graft.tools.TxnMicro [sfDir]
  */
object TxnMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.io.TxnLog
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[txnmicro] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // warm
    val base = graft.core.Tables.lineitem(spark, sfDir).select(
      col("l_orderkey").as("ok"), col("l_linenumber").cast("long").as("ln"),
      col("l_partkey").as("x"), col("l_suppkey").as("y"))
      .filter(expr("ok % 2 = 0")).localCheckpoint()
    base.count()
    val warmDir = java.nio.file.Files.createTempDirectory("graft_micro_warm").toString
    TxnLog.commit(base.limit(10).repartition(1), warmDir)
    TxnLog.read(spark, warmDir).count()

    val dir = java.nio.file.Files.createTempDirectory("graft_micro").toString
    t("checkpointed base count")(base.count())
    (1 to 4).foreach { i =>
      t(s"commit tiny (filter+repartition(1)) #$i")(
        TxnLog.commit(base.filter(expr(s"ok % 8 = ${2 * (i % 4)}")).repartition(1), dir))
    }
    t("read.count (4 files)")(TxnLog.read(spark, dir).count())
    t("read.count again")(TxnLog.read(spark, dir).count())
    t("clusterBy meta")(TxnLog.clusterBy(dir, "x", "y", tieCols = Seq("ok", "ln")))
    t("optimizeClustered 8")(TxnLog.optimizeClustered(spark, dir, numFiles = 8))
    t("optimizeClustered 4 (noop-ish)")(TxnLog.optimizeClustered(spark, dir, numFiles = 4))
    t("scanPruned x 500-700")(TxnLog.scanPruned(spark, dir, "x", 500L, 700L).df.count())
    t("fileScanPlan")(TxnLog.fileScanPlan(dir))
    // decompose one commit: write vs claim
    val df1 = base.filter(expr("ok % 8 = 0")).repartition(1)
    t("bare df.write.parquet tmp")(
      df1.write.mode("overwrite").parquet(s"$dir/_probe"))
    val one = spark.range(1).selectExpr("id as ok", "id as ln", "id as x", "id as y")
    t("commit 1-row df")(TxnLog.commit(one.repartition(1), dir))
    t("commit 1-row df again")(TxnLog.commit(one.repartition(1), dir))

    // decompose the optimizeClustered FULL pass step by step
    val dir2 = java.nio.file.Files.createTempDirectory("graft_micro2").toString
    (0 until 2).foreach(i =>
      TxnLog.commit(base.filter(expr(s"ok % 8 = ${2 * i}")).repartition(1), dir2))
    val cur = t("opt: read+localCheckpoint")(
      TxnLog.read(spark, dir2).localCheckpoint())
    val row = t("opt: countAndBounds agg")(
      cur.agg(count(lit(1)),
        min(col("x").cast("long")), max(col("x").cast("long")),
        min(col("y").cast("long")), max(col("y").cast("long"))).head())
    val n = row.getLong(0)
    val (mnX, mxX, mnY, mxY) = (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    def norm(c: String, mn: Long, mx: Long) =
      expr(s"((least(greatest($c, $mn), $mx) - $mn) * 65536) div (${mx - mn} + 1)")
    val zc = graft.queries.LayoutOps.zInterleave(norm("x", mnX, mxX), norm("y", mnY, mxY))
    val key = struct(zc.as("__z"), col("ok"), col("ln"))
    val dataCols = cur.columns.toSeq
    val ranged = t("opt: ranged rdd build")(
      cur.select((key.as("__k") +: dataCols.map(col)): _*)
        .repartitionByRange(8, col("__k")).sortWithinPartitions(col("__k")).rdd)
    val counts = t("opt: counts job")(
      ranged.mapPartitionsWithIndex { (i, it) =>
        Iterator.single(i -> it.foldLeft(0L)((a, _) => a + 1L))
      }.collect().sortBy(_._1).map(_._2))
    val offsets = counts.scanLeft(0L)(_ + _)
    val part = new org.apache.spark.Partitioner {
      override def numPartitions: Int = 8
      override def getPartition(k: Any): Int = k.asInstanceOf[Long].toInt
    }
    val rows = ranged.mapPartitionsWithIndex { (i, it) =>
      var ord = offsets(i)
      it.map { r =>
        ord += 1
        ((ord - 1) * 8 / n, org.apache.spark.sql.Row.fromSeq(r.toSeq.drop(1)))
      }
    }.partitionBy(part).values
    val out = spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(cur.schema.fields))
    t("opt: write z-tiled")(out.write.mode("errorifexists").parquet(s"$dir2/part-zz"))
    val files = new java.io.File(s"$dir2/part-zz").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => s"part-zz/${f.getName}").sorted.toVector
    t("opt: zone stats read+agg")({
      val withRel = spark.read.parquet(files.map(f => s"$dir2/$f"): _*)
        .withColumn("__rel", substring_index(input_file_name(), "/", -2))
      withRel.groupBy(col("__rel")).agg(
        min(col("x").cast("long")), max(col("x").cast("long")),
        min(col("y").cast("long")), max(col("y").cast("long"))).collect()
    })

    // second full pass on a FRESH dir in the same JVM: is the 3.8s JIT?
    val dir3 = java.nio.file.Files.createTempDirectory("graft_micro3").toString
    (0 until 2).foreach(i =>
      TxnLog.commit(base.filter(expr(s"ok % 8 = ${2 * i}")).repartition(1), dir3))
    TxnLog.clusterBy(dir3, "x", "y", tieCols = Seq("ok", "ln"))
    t("optimizeClustered FULL (2nd, fresh dir)")(
      TxnLog.optimizeClustered(spark, dir3, numFiles = 8))
    TxnLog.commit(base.filter(expr("ok % 8 = 4")).repartition(1), dir3)
    t("optimizeClustered INCR (fresh dir)")(
      TxnLog.optimizeClustered(spark, dir3, numFiles = 4))
    spark.stop()
  }
}
