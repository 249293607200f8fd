package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot helper: runs q30 and prints its rows as a DuckDB VALUES literal,
  * used to (re)freeze the golden oracle in PipelineQueries.q30Sql whenever
  * the fixture corpus or a DSP kernel intentionally changes. */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows =
      (if (args.contains("--q259")) graft.queries.PipelineQueries.q259(spark, "unused")
       else if (args.contains("--q268")) graft.queries.PipelineQueries.q268(spark, "unused")
       else if (args.contains("--q323")) graft.queries.PipelineQueries.q323(spark, "unused")
       else if (args.contains("--q326")) graft.queries.PipelineQueries.q326(spark, "unused")
       else if (args.contains("--q342")) graft.queries.PipelineQueries.q342(spark, "unused")
       else graft.queries.PipelineQueries.q30(spark, "unused")).collect()
    def lit(v: Any): String = v match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case b: Boolean => if (b) "TRUE" else "FALSE"
      case l: Long => s"CAST($l AS BIGINT)"
      case x => x.toString
    }
    println("=== q30 VALUES ===")
    rows.foreach { r =>
      println("  (" + (0 until r.length).map(i => lit(r.get(i))).mkString(", ") + "),")
    }
    println("=== end ===")
    spark.stop()
  }
}
