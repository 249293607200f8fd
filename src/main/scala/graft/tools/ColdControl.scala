package graft.tools
import org.apache.spark.sql.SparkSession
object ColdControl {
  def main(args: Array[String]): Unit = {
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[ctl] $label ${(System.nanoTime()-t0)/1e9}%.3f"); r
    }
    val withExt = args.contains("--ext")
    val spark = t(if (withExt) "session WITH extensions" else "session BARE") {
      val b = SparkSession.builder()
        .master("local[4]").config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
      val s = (if (withExt)
        b.config("spark.sql.extensions", "graft.functions.GraftExtensions")
      else b).getOrCreate()
      s.sparkContext.setLogLevel("WARN"); s
    }
    t("first job")(spark.range(10).count())
    spark.stop()
  }
}
