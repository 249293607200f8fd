package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Footer-statistics reader: answers metadata questions (column min/max)
  * from parquet row-group statistics WITHOUT reading a single row — the
  * thing a "metadata-sized" claim must actually do (round-17 review:
  * q366's group-width derivation claimed column statistics but ran an
  * O(N) aggregate scan). Both Spark's and DuckDB's writers emit these
  * stats by default; a file without them makes the caller fall back to
  * the aggregate. */
object ParquetStats {

  private object NoStats extends scala.util.control.ControlThrowable

  private def listParquet(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory)
      Option(f.listFiles()).toSeq.flatten.flatMap(listParquet)
    else if (f.getName.endsWith(".parquet") && f.length() > 0) Seq(f)
    else Seq.empty

  /** min/max of an INT64 column across every row group of every parquet
    * file under `path` (file or directory), from footer statistics only.
    * None when any populated row group lacks stats for the column (the
    * caller falls back to an aggregate scan) or no value exists. */
  def minMaxLong(path: String, column: String): Option[(Long, Long)] = {
    val files = listParquet(new java.io.File(path))
    if (files.isEmpty) return None
    val conf = new Configuration()
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var any = false
    try {
      files.foreach { f =>
        val in = HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val reader = ParquetFileReader.open(in)
        try {
          reader.getFooter.getBlocks.asScala.foreach { bg =>
            val cc = bg.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .getOrElse(throw NoStats)
            val st = cc.getStatistics
            if (st == null) throw NoStats
            if (st.hasNonNullValue) {
              (st.genericGetMin, st.genericGetMax) match {
                case (lo: java.lang.Long, hi: java.lang.Long) =>
                  if (lo < mn) mn = lo
                  if (hi > mx) mx = hi
                  any = true
                case _ => throw NoStats // not an INT64 column
              }
            } else if (bg.getRowCount > 0 && st.getNumNulls != bg.getRowCount) {
              throw NoStats // populated group with absent stats
            }
          }
        } finally reader.close()
      }
      if (any) Some((mn, mx)) else None
    } catch { case NoStats => None }
  }
}
