package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 connector — the engine surface the reference's
  * hardcoded directory walk (/root/reference/process_audio.py:79-92,396)
  * stands in for: a custom TABLE the optimizer can negotiate with, not a
  * function call. The table is a deterministic synthetic corpus
  * (id BIGINT, h STRING = md5(id), bucket BIGINT = id % 64) of
  * `rows` rows split into `slices` independent input partitions, which
  * makes every correctness claim cross-checkable: DuckDB's range() can
  * state the exact same table, so a query THROUGH the connector faces
  * the same oracle as any parquet scan (q141).
  *
  * What it implements (and PlanCheck asserts on the live plan):
  *   - SupportsPushDownFilters: id range/equality predicates FOLD INTO
  *     the generator's [lo, hi) bounds — pushed filters never generate a
  *     row, exactly how a real connector turns predicates into I/O
  *     elision. Handled filters are consumed (not re-evaluated);
  *     anything else stays a Spark-side residual.
  *   - SupportsPushDownRequiredColumns: the reader materializes ONLY the
  *     pruned schema — md5 is never computed when `h` isn't read.
  *   - Batch planning: `slices` contiguous [start, end) splits, each a
  *     serializable InputPartition — the multi-executor contract (no
  *     driver state reaches the reader).
  *
  * At 100 TB the same three hooks are what make a connector viable:
  *     splits ≈ cluster parallelism, predicate → partition elision,
  *     projection → column elision. */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GenTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      slices = Option(properties.get("slices")).map(_.toInt).getOrElse(4),
      batchRows = Option(properties.get("batchRows")).map(_.toLong).getOrElse(8192L),
      keyGrouped = Option(properties.get("keyGrouped")).exists(_.toBoolean))
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("h", StringType, nullable = false),
    StructField("bucket", LongType, nullable = false)))

  private[sources] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}

private[sources] class GenTable(rows: Long, slices: Int, batchRows: Long,
                                keyGrouped: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_gen(rows=$rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, slices, batchRows, keyGrouped)
}

private[sources] class GenScanBuilder(rows: Long, slices: Int, batchRows: Long = 8192L,
                                      keyGrouped: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var lo = 0L          // inclusive
  private var hi = rows        // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = GenSource.schema
  private var aggFuncs: Seq[String] = Nil

  // COMPLETE aggregate pushdown: COUNT(*)/MIN(id)/MAX(id) with no GROUP BY
  // are closed-form over the folded [lo, hi) bounds — the source answers
  // the whole query from metadata, zero rows generated (the DSv2 analog of
  // parquet footer-stats aggregation). Anything else is declined and Spark
  // aggregates normally.
  private def translate(a: Aggregation): Option[Seq[String]] = {
    if (a.groupByExpressions.nonEmpty) return None
    val fs = a.aggregateExpressions.map {
      case _: CountStar => Some("count")
      case m: Min => m.column match {
        case nr: NamedReference if nr.fieldNames.sameElements(Array("id")) => Some("min")
        case _ => None
      }
      case m: Max => m.column match {
        case nr: NamedReference if nr.fieldNames.sameElements(Array("id")) => Some("max")
        case _ => None
      }
      case _ => None
    }
    if (fs.nonEmpty && fs.forall(_.isDefined)) Some(fs.toSeq.map(_.get)) else None
  }
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    translate(aggregation).isDefined
  override def pushAggregation(aggregation: Aggregation): Boolean =
    translate(aggregation) match {
      case Some(fs) => aggFuncs = fs; true
      case None     => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = ArrayBuffer.empty[Filter]
    val accepted = ArrayBuffer.empty[Filter]
    // Long.MaxValue guards: v + 1 would overflow to MinValue and silently
    // flip the fold (accepted filters are consumed, so a wrong fold is a
    // wrong ANSWER, not a slow plan). id > MaxValue is unsatisfiable; id
    // <= MaxValue and = MaxValue need no upper narrowing (ids are < rows).
    def markEmpty(): Unit = { lo = 1; hi = 0 }
    filters.foreach {
      case f @ GreaterThan("id", v: Long) =>
        if (v == Long.MaxValue) markEmpty() else lo = math.max(lo, v + 1); accepted += f
      case f @ GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); accepted += f
      case f @ LessThan("id", v: Long)           => hi = math.min(hi, v); accepted += f
      case f @ LessThanOrEqual("id", v: Long) =>
        if (v != Long.MaxValue) hi = math.min(hi, v + 1); accepted += f
      case f @ EqualTo("id", v: Long) =>
        lo = math.max(lo, v)
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
        accepted += f
      case other => residual += other
    }
    pushed = accepted.toArray
    residual.toArray
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan =
    if (aggFuncs.nonEmpty) new GenAggScan(lo, math.max(lo, hi), aggFuncs)
    else new GenScan(lo, math.max(lo, hi), slices, required, pushed, batchRows, keyGrouped)
}

/** Closed-form scan for a completely-pushed aggregation: one partition,
  * one row, computed from the folded bounds — no data generated. */
private[sources] class GenAggScan(lo: Long, hi: Long, funcs: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(funcs.zipWithIndex.map { case (f, i) =>
      StructField(s"agg_$i($f)", LongType, nullable = f != "count")
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"GenAggScan(range=[$lo,$hi), agg=${funcs.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GenAggPartition(lo, hi, funcs))
  override def createReaderFactory(): PartitionReaderFactory = GenAggReaderFactory
}

private[sources] case class GenAggPartition(lo: Long, hi: Long,
                                            funcs: Seq[String]) extends InputPartition

private[sources] object GenAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenAggPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = { val r = !done; done = true; r }
      override def get(): InternalRow =
        new GenericInternalRow(p.funcs.map {
          case "count" => (math.max(0L, p.hi - p.lo)): java.lang.Long
          case "min"   => if (p.hi > p.lo) (p.lo: java.lang.Long) else null
          case "max"   => if (p.hi > p.lo) ((p.hi - 1): java.lang.Long) else null
        }.toArray.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}

private[sources] class GenScan(lo: Long, hi: Long, slices: Int,
                               required: StructType, pushed: Array[Filter],
                               batchRows: Long = 8192L,
                               keyGrouped: Boolean = false)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Storage-partitioned-join face: with keyGrouped=true the scan plans ONE
    * partition per distinct `bucket` value (each tagged via HasPartitionKey)
    * and REPORTS KeyGroupedPartitioning(identity(bucket), 64) — so a join of
    * two such tables on `bucket` needs no exchange on either side: the
    * storage layout IS the distribution, negotiated through the connector
    * API instead of assumed (the DSv2 analog of q114's bucketed tables; at
    * 100 TB this is Iceberg-style co-located fact-fact joins). Reported only
    * while `bucket` survives column pruning — a clustering key the reader
    * won't emit cannot satisfy any distribution. */
  private def keyGroupedActive: Boolean =
    keyGrouped && required.fieldNames.contains("bucket")
  override def outputPartitioning(): partitioning.Partitioning =
    if (keyGroupedActive)
      new partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.identity("bucket")), 64)
    else new partitioning.UnknownPartitioning(math.max(1, slices))
  /** The same generator as a STREAMING source: the id line is the offset
    * axis — each trigger admits the next `batchRows` ids as one
    * micro-batch until the table is exhausted, after which latestOffset
    * stops advancing and processAllAvailable returns. Pruning/pushdown
    * negotiated by the ScanBuilder apply to the stream exactly as to the
    * batch scan. Restart semantics: offsets restored from a checkpoint
    * ratchet the cursor forward (see GenMicroBatchStream), so a restarted
    * query resumes at the committed position; the deterministic generator
    * makes any replayed batch idempotent. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenMicroBatchStream(lo, hi, slices, batchRows, required)
  // surfaced in explain() — PlanCheck greps for the folded bounds and the
  // pruned column list
  override def description(): String =
    s"GenScan(range=[$lo,$hi), cols=${required.fieldNames.mkString(",")}, " +
      s"pushed=${pushed.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    if (keyGroupedActive) {
      // one partition per bucket value, ALL 64 present (possibly empty) so
      // both sides of a co-located join expose identical partition values
      return (0L until 64L).map(b =>
        GenBucketPartition(b, lo, hi, required.fieldNames): InputPartition).toArray
    }
    val n = math.max(1, slices)
    val span = hi - lo
    (0 until n).map { i =>
      GenPartition(lo + span * i / n, lo + span * (i + 1) / n,
        required.fieldNames)
    }.filter(p => p.end > p.start).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = GenReaderFactory
}

private[sources] case class GenPartition(start: Long, end: Long,
                                         cols: Array[String]) extends InputPartition

/** A key-grouped split: every id in [start, end) with id % 64 == bucket.
  * `partitionKey` is how the engine learns which bucket this split holds —
  * the contract KeyGroupedPartitioning grouping rides on. */
private[sources] case class GenBucketPartition(bucket: Long, start: Long, end: Long,
                                               cols: Array[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

private[sources] case class GenOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

private[sources] class GenMicroBatchStream(lo: Long, hi: Long, slices: Int,
                                           batchRows: Long, required: StructType)
    extends MicroBatchStream {
  // The cursor lives in memory, but every offset the engine hands BACK to
  // the stream (checkpoint restore goes through deserializeOffset; each
  // completed batch through commit) ratchets it forward — so a query
  // restarted from a real checkpoint resumes AT the committed offset
  // instead of emitting empty batches until the cursor catches up
  // (round-5 ADVICE item 1).
  private var cursor = lo
  private def ratchet(pos: Long): Unit =
    cursor = math.min(hi, math.max(cursor, pos))
  override def initialOffset(): Offset = GenOffset(lo)
  override def latestOffset(): Offset = {
    cursor = math.min(hi, cursor + batchRows)
    GenOffset(cursor)
  }
  override def deserializeOffset(json: String): Offset = {
    val pos = json.toLong
    ratchet(pos)
    GenOffset(pos)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[GenOffset].pos
    val e0 = end.asInstanceOf[GenOffset].pos
    val n = math.max(1, slices)
    val span = e0 - s0
    (0 until n).map { i =>
      GenPartition(s0 + span * i / n, s0 + span * (i + 1) / n, required.fieldNames)
    }.filter(p => p.end > p.start).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = GenReaderFactory
  override def commit(end: Offset): Unit = ratchet(end.asInstanceOf[GenOffset].pos)
  override def stop(): Unit = ()
}

private[sources] object GenReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: GenPartition       => rangeReader(p.start, p.end, step = 1L, p.cols)
      case p: GenBucketPartition =>
        // first id >= start on this bucket's residue line, then stride 64
        val first = p.start + java.lang.Math.floorMod(p.bucket - p.start, 64L)
        rangeReader(first, p.end, step = 64L, p.cols)
    }

  private def rangeReader(start: Long, end: Long, step: Long,
                          cols: Array[String]): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var cur = start - step
      override def next(): Boolean = { cur += step; cur < end }
      override def get(): InternalRow =
        new GenericInternalRow(cols.map {
          case "id"     => cur: java.lang.Long
          case "h"      => UTF8String.fromString(GenSource.md5Hex(cur.toString))
          case "bucket" => (cur % 64): java.lang.Long
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
}
