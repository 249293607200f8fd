package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-LAYOUT governance — the write-side discipline that makes 100 TB
  * readable: multi-dimensional clustering (Z-order) and range-partitioned
  * file layout. The reference writes one flat output directory
  * (/root/reference/process_audio.py:335-352); at scale the layout IS the
  * index — parquet min/max footer stats prune files only if the writer
  * clustered values into disjoint ranges.
  */
object Layout {

  /** Morton/Z-value: interleave the low `bits` bits of two non-negative
    * integer columns — points close in (x, y) land close on the Z-curve,
    * so ONE sort column clusters BOTH dimensions. Pure bit arithmetic
    * (shift/and/or), codegen-friendly, and exactly stateable in ANSI SQL,
    * which is what lets q151 hash-check the layout arithmetic against
    * DuckDB. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** The same interleave as ANSI SQL text (DuckDB-compatible), for oracle
    * statements. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")

  /** Range-clustered write: globally range-partition on `sortCols` into
    * `files` partitions, sort within each, and write parquet capped at
    * `maxRecordsPerFile`. Result: each file covers a DISJOINT sort-key
    * range, so any reader predicate on the sort key prunes by footer
    * min/max instead of scanning — the at-scale contract LayoutSpec
    * asserts (non-overlapping per-file ranges). */
  def writeRangeLayout(df: DataFrame, sortCols: Seq[Column], files: Int,
                       maxRecordsPerFile: Long, path: String): Unit =
    df.repartitionByRange(files, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
