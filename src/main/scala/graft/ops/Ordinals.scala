package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global dense ordinals (stable row numbers over a total key order) WITHOUT
  * the single-partition global sort that `row_number() OVER (ORDER BY k)`
  * plans — the classic way to assign stable example IDs to a 100 TB corpus.
  *
  * Three partition-parallel steps:
  *   1. range exchange on the key (`repartitionByRange`: sampled, balanced
  *      boundaries — partition i holds keys strictly below partition i+1),
  *   2. local sort within each partition,
  *   3. `zipWithIndex`'s two-pass offset assignment: one lightweight job
  *      counts rows per partition, the cumulative counts become per-partition
  *      starting offsets, and a map pass adds offset + local index.
  *
  * The result equals the window formulation for any TOTAL key order — range
  * boundaries only split the order between partitions, never reorder it —
  * and is invariant to the partition count (OpsSpec proves 4-way = 9-way =
  * window). Cost: one range exchange + one count job over the sorted data,
  * versus the window's all-to-one exchange that serializes the entire
  * dataset through a single task's sort.
  */
object Ordinals {
  def globalOrdinal(df: DataFrame, key: Column, partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(partitions, key).sortWithinPartitions(key)
    val schema = ranged.schema.add("ordinal", LongType, nullable = false)
    val rows = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rows, schema)
  }

  /** The exchange stage `globalOrdinal` rides, exposed for plan audits: the
    * contract is `rangepartitioning(key, n)` with NO SinglePartition. */
  def rangedStage(df: DataFrame, key: Column, partitions: Int): DataFrame =
    df.repartitionByRange(partitions, key).sortWithinPartitions(key)

  /** Global INCLUSIVE prefix sum of a long column in total key order — the
    * `SUM(v) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)` semantics without
    * the window's all-to-one exchange. Same two-pass scheme as
    * `globalOrdinal`: range exchange + local sort, a lightweight job reduces
    * each partition to ONE subtotal, the scanned subtotals become
    * per-partition starting offsets, and a map pass folds offset + local
    * running sum. Requires a TOTAL key order (unique keys), as any
    * order-dependent scan does. Appends `running` (LongType). */
  def globalPrefixSum(df: DataFrame, key: Column, valueCol: String, partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(partitions, key).sortWithinPartitions(key)
    val idx = ranged.schema.fieldIndex(valueCol)
    val rdd = ranged.rdd
    val partSums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(idx)); Iterator.single(i -> s)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = ranged.schema.add("running", LongType, nullable = false)
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r => acc += r.getLong(idx); Row.fromSeq(r.toSeq :+ acc) }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Global EXCLUSIVE prefix max of a long column in total key order —
    * `MAX(v) OVER (ORDER BY key ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    * PRECEDING)` semantics without the window's all-to-one exchange. Same
    * two-pass scheme as `globalPrefixSum`, with the max monoid: the range
    * exchange orders partitions by `key`, each partition reduces to ONE
    * local max, the scanned maxes become per-partition incoming maxes, and
    * a map pass emits the running max BEFORE folding in the current row
    * (exclusive — a row never sees its own value). Rows before any value is
    * seen get NULL (the window's empty-frame semantics). `key` may carry
    * `.desc` to fold in descending order — 2-D skyline's "best score among
    * strictly better rows" is exactly this op on the desc-grouped axis.
    * Appends `run_max` (LongType, nullable). */
  def globalPrefixMaxExclusive(df: DataFrame, key: Column, valueCol: String,
      partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(partitions, key).sortWithinPartitions(key)
    val idx = ranged.schema.fieldIndex(valueCol)
    val rdd = ranged.rdd
    val partMaxes = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var m = Option.empty[Long]
        it.foreach { r =>
          val v = r.getLong(idx)
          if (m.forall(_ < v)) m = Some(v)
        }
        Iterator.single(i -> m)
      }
      .collect().sortBy(_._1).map(_._2)
    // incoming(i) = max of all partitions before i (None until one exists)
    val incoming = partMaxes.scanLeft(Option.empty[Long]) { (acc, m) =>
      (acc, m) match {
        case (Some(a), Some(b)) => Some(math.max(a, b))
        case (a, b)             => a.orElse(b)
      }
    }
    val schema = ranged.schema.add("run_max", LongType, nullable = true)
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = incoming(i)
      it.map { r =>
        val before = acc
        val v = r.getLong(idx)
        if (acc.forall(_ < v)) acc = Some(v)
        Row.fromSeq(r.toSeq :+ before.map(Long.box).orNull)
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
