package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** IVF √N cell-scaling measurement (round-13 verdict item 3): q59's
  * board entry keeps a FIXED 16-cell codebook, so its search cost grows
  * linearly with the corpus (SCALECHECK_r13: 34.6× at 100×). The
  * production mitigation is cells ∝ √N — this tool measures it at any
  * tier, split the way a real deployment is split:
  *
  *  - INDEX BUILD (one-time, amortized): assign every vector to its
  *    nearest of `cells` centroids and WRITE the inverted file to
  *    parquet. Cost is O(N·cells) = O(N^1.5) under √N cells — paid once
  *    per corpus version, exactly like any ANN index build.
  *  - SEARCH (per-query, the serving cost): probe the 4 nearest cells
  *    per query against the PREBUILT index — O(N·probes/cells) =
  *    O(√N) per query under √N cells.
  *  - RECALL@3: IVF top-3 vs exact brute-force cosine top-3 over the
  *    same 5 probe queries — the stated accuracy boundary of the trade.
  *
  * Usage: runMain graft.tools.IvfScale <sfDir> <scale> [reps]
  * (scale: 1 for sf0.1, 10 for /tmp/graft_sf1, 100 for /tmp/graft_sf10;
  * cells = 16·√scale, probes fixed at 4.) Prints one JSON line. */
object IvfScale {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, scaleS) = args.take(2)
    val scale = scaleS.toInt
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cells = math.max(16, math.round(16.0 * math.sqrt(scale.toDouble)).toInt)
    val probes = 4
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
    val vecIdType = emb.schema("vec_id").dataType
    // codebook: first `cells` vectors as centroids (the q59 seed
    // convention — k-means training is orthogonal to the scaling law)
    val codebook = emb.filter(col("vec_id") < cells)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(codebook.length == cells, s"corpus has < $cells seed vectors")
    def cellScores(embCol: Column): Column =
      array(codebook.map { case (sid, ce) =>
        val ceL = typedLit(ce)
        struct(
          (graft.functions.GraftFunctions.dotF32(ceL, ceL) -
           lit(2.0) * graft.functions.GraftFunctions.dotF32(embCol, ceL)).as("score"),
          lit(sid).cast(vecIdType).as("seed_id"))
      }: _*)

    // ---- index build: one-time O(N·cells), written as the inverted file
    val idxDir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    val tB0 = System.nanoTime()
    emb.select(col("vec_id"), col("embedding"),
        array_min(cellScores(col("embedding"))).getField("seed_id").as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(idxDir)
    val buildSec = (System.nanoTime() - tB0) / 1e9

    // ---- search: per-query O(N·probes/cells) against the prebuilt index
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    def searchOnce(): Array[(Long, Long, Double)] = {
      val index = spark.read.parquet(idxDir)
      val probe = queries
        .select(col("q_id"), col("qe"),
          explode(slice(array_sort(cellScores(col("qe"))), 1, probes)
            .getField("seed_id")).as("cell"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      index.join(broadcast(probe), Seq("cell"))
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

    // ---- recall@3 vs exact brute force (not part of the timed path)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    val exact = emb.crossJoin(broadcast(queries))
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
    println(s"""{"metric":"ivf_sqrtn","sf":"$sfDir","scale":$scale,"cells":$cells,"probes":$probes,"build_sec":${f(buildSec)},"search_sec":${f(searchSec)},"recall_at3":${f(recall)}}""")
    spark.stop()
  }
}
