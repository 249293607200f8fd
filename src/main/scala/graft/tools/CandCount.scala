package graft.tools

import org.apache.spark.sql.SparkSession

/** Candidate-set instrumentation for the PPJoin stages (SCALECHECK
  * evidence): prints the q128 candidate-pair count after prefix+length
  * filtering vs after the positional stage, for each sf dir argument. */
object CandCount {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CandCount <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      val (pre, pos) = graft.queries.DedupSim.q128CandidateCounts(spark, d)
      println(s"""{"sf_dir":"$d","prefix_length_candidates":$pre,"plus_positional":$pos}""")
    }
    spark.stop()
  }
}
