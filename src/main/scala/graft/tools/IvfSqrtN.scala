package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scale measurement for q345's EXACT layout (round 15): cells = round(√N)
  * seeded from the corpus and refined by ONE deterministic Lloyd round,
  * index written as cell-partitioned parquet, search through the LITERAL
  * probe-cell INSET pruned read — the same building blocks the board entry
  * runs ([[graft.queries.DedupSim.q345]]), split the way a deployment is
  * split:
  *
  *  - INDEX BUILD (one-time, amortized): Lloyd round + assignment +
  *    partitioned write — O(N·√N), paid once per corpus version;
  *  - SEARCH (per-query serving): probe 4 cells per query against the
  *    prebuilt index via partition pruning — O(N·probes/cells) = O(√N);
  *  - RECALL@3 vs exact brute-force cosine over the same 5 queries.
  *
  * Usage: runMain graft.tools.IvfSqrtN <sfDir> [reps]
  * Prints one JSON line (SCALECHECK_r15 consumes it). */
object IvfSqrtN {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val cells = math.max(16L, math.round(math.sqrt(n.toDouble)))

    // ---- build: Lloyd round + assignment + cell-partitioned write
    val idxDir = java.nio.file.Files.createTempDirectory("graft_ivfsqrtn").toString
    val tB0 = System.nanoTime()
    val code = graft.queries.DedupSim.trainedCodebookFrom(spark, sfDir,
      graft.queries.DedupSim.seedCodebookN(spark, sfDir, cells), rounds = 1)
    // the board entry's own assignment path — this tool must measure
    // q345's EXACT building blocks, never a drifted copy (size-gated:
    // literal projection ≤ ivfLiteralMaxCells, broadcast-kernel above;
    // the join alternative measured 3.2x slower and was rejected —
    // SCALECHECK_r15 §1; the gate itself is adjudicated in
    // SCALECHECK_r16 §1)
    graft.queries.DedupSim.ivfAssignAuto(emb, code)
      .withColumn("cell", col("cell").cast("long"))
      .write.mode("overwrite").partitionBy("cell").parquet(idxDir)
    val buildSec = (System.nanoTime() - tB0) / 1e9

    // ---- probe cells driver-side from the literal codebook (q345's
    // helpers verbatim: probePairsFor = dotSeqD fold + IvfProbes budget)
    val probes4 = graft.queries.DedupSim.IvfProbes
    val qVecs = graft.queries.DedupSim.probeVectors(spark, sfDir)
    val probePairs = graft.queries.DedupSim.probePairsFor(qVecs, code)
    val probeCells = probePairs.map(_._2).distinct.sorted
    val qs = qVecs.toSeq.toDF("q_id", "qe")
    val probes = probePairs.toDF("q_id", "cell").join(broadcast(qs), Seq("q_id"))

    // ---- search: pruned partitioned read (the serving cost)
    def searchOnce(): Array[(Long, Long, Double)] = {
      val index = spark.read.parquet(idxDir)
        .filter(col("cell").isin(probeCells: _*))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      index.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine",
          graft.functions.GraftFunctions.cosineF32(col("qe"), col("embedding")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("q_id").cast("long"), col("vec_id").cast("long"),
          col("cosine").cast("double"))
        .as[(Long, Long, Double)].collect()
    }
    searchOnce() // compile warmup
    var searchSec = Double.MaxValue
    var ivfTop: Array[(Long, Long, Double)] = null
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      ivfTop = searchOnce()
      searchSec = math.min(searchSec, (System.nanoTime() - t0) / 1e9)
    }

    // ---- recall@3 vs exact (untimed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    val exact = emb.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        graft.functions.GraftFunctions.cosineF32(col("qe"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id").cast("long"), col("vec_id").cast("long"))
      .as[(Long, Long)].collect()
    val exactSet = exact.groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val got = ivfTop.groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val recalls = exactSet.map { case (q, truth) =>
      got.getOrElse(q, Set.empty[Long]).intersect(truth).size.toDouble / truth.size
    }
    val recall = if (recalls.isEmpty) 0.0 else recalls.sum / recalls.size

    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      java.lang.Double.valueOf(v))
    graft.io.FsUtil.deleteRecursively(new java.io.File(idxDir)): Unit
    println(s"""{"metric":"ivf_sqrtn_q345","sf":"$sfDir","n":$n,"cells":$cells,"probes":$probes4,"build_sec":${f(buildSec)},"search_sec":${f(searchSec)},"recall_at3":${f(recall)}}""")
    spark.stop()
  }
}
