package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 STREAMING SINK for the txn log — `writeStream.format("graft.sources.TxnSink")`
  * — the write-path twin of [[TxnStreamSource]]: micro-batch data files are
  * written BY THE EXECUTORS (each task streams its partition's rows into
  * one parquet file via the parquet-mr writer — rows never collect to the
  * driver), and the epoch commits ATOMICALLY through the log under the
  * `T <queryId> <epochId>` exactly-once marker:
  *
  *   - task success → a commit message carrying the staged file's relative
  *     path; task retry/failure → the half-written file stays an ORPHAN,
  *     invisible to every reader (manifest-only visibility) until vacuum;
  *   - `StreamingWrite.commit(epoch, msgs)` registers the named files in
  *     ONE manifest claim — readers see all of an epoch or none of it;
  *   - a REPLAYED epoch (driver restart between sink-commit and offset
  *     checkpoint — the at-least-once window every streaming engine has)
  *     finds its txn marker and registers NOTHING: exactly-once table
  *     delivery on top of replayed input, the Delta-sink txn discipline,
  *     proven by q285's forced replay.
  *
  * Supported sink schema: flat LONG / INT / DOUBLE / STRING / BOOLEAN /
  * TIMESTAMP columns plus ARRAY&lt;STRING&gt; (refused loudly otherwise) —
  * the executor-side writer maps them onto standard parquet primitives
  * (timestamps as µs-adjusted INT64; arrays as the standard 3-level LIST
  * group, so any engine reads them back as lists). The array case is the
  * q367 shard payload: packed token sequences flow through the
  * exactly-once path without driver-side re-encoding. */
class TxnSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException("graft txn sink is write-only: " +
      "supply the schema via the stream being written")

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val dir = properties.get("path")
    require(dir != null && dir.nonEmpty, "graft txn sink needs .option(\"path\", dir)")
    new TxnSinkTable(dir, schema)
  }
}

private[sources] class TxnSinkTable(dir: String, sinkSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-txnlog-sink($dir)"
  override def schema(): StructType = sinkSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE, TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new TxnStreamingWrite(dir, info.schema(), info.queryId())
        override def toBatch: BatchWrite =
          new TxnBatchWrite(dir, info.schema())
      }
    }
}

private[sources] class TxnStreamingWrite(dir: String, schema: StructType,
                                         queryId: String) extends StreamingWrite {
  TxnSinkWriter.toParquetType(schema) // refuse unsupported schemas at plan time

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new TxnSinkWriterFactory(dir, schema, queryId)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case TxnSinkFile(rel) if rel.nonEmpty => rel }
    graft.io.TxnLog.commitFilesIdempotent(dir, s"dsv2-$queryId", epochId, files.toSeq)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case TxnSinkFile(rel) if rel.nonEmpty => rel }.foreach { rel =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, rel))
    }
}

/** Batch twin: `df.write.format("graft.sources.TxnSink").option("path", dir)
  * .save()` — same executor-side writers, the commit is one plain append
  * claim (`A`): all of the write's files become visible atomically or none
  * do. Batch writes carry no replay identity, so no txn marker. */
private[sources] class TxnBatchWrite(dir: String, schema: StructType) extends BatchWrite {
  TxnSinkWriter.toParquetType(schema)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TxnBatchWriterFactory(dir, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case TxnSinkFile(rel) if rel.nonEmpty => rel }
    graft.io.TxnLog.commitFiles(dir, files.toSeq.sorted)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case TxnSinkFile(rel) if rel.nonEmpty => rel }.foreach { rel =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, rel))
    }
}

private[sources] class TxnBatchWriterFactory(dir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TxnSinkWriter(dir, schema, partitionId, taskId, epochId = -1L)
}

private[sources] case class TxnSinkFile(rel: String) extends WriterCommitMessage

private[sources] class TxnSinkWriterFactory(dir: String, schema: StructType,
                                            queryId: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new TxnSinkWriter(dir, schema, partitionId, taskId, epochId,
      queryTag = queryId.replaceAll("[^0-9a-zA-Z]", "").take(8))
}

object TxnSinkWriter {
  /** Spark → parquet schema for the supported flat primitive columns.
    * Everything nullable (OPTIONAL) — Spark's writer contract. */
  def toParquetType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t: Type = f.dataType match {
        case LongType    => Types.optional(PrimitiveTypeName.INT64).named(f.name)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32).named(f.name)
        case DoubleType  => Types.optional(PrimitiveTypeName.DOUBLE).named(f.name)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN).named(f.name)
        case StringType  => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case ArrayType(StringType, _) =>
          // standard 3-level LIST: optional group (LIST) { repeated group
          // list { optional binary element (STRING) } } — what Spark's own
          // parquet writer emits, so the read path needs no special case
          Types.optionalList()
            .optionalElement(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType())
            .named(f.name)
        case other => throw new IllegalArgumentException(
          s"graft txn sink supports flat long/int/double/string/boolean/" +
            s"timestamp/array<string> columns; got ${f.name}: $other")
      }
      b.addField(t)
    }
    b.named("graft_txnsink")
  }
}

/** One task's writer: streams its partition into a single staged parquet
  * file. The file is named by (epoch, partition, task) so a RETRIED task
  * stages a different path and only the committed attempt's file enters
  * the manifest. */
private[sources] class TxnSinkWriter(dir: String, schema: StructType,
                                     partitionId: Int, taskId: Long,
                                     epochId: Long, queryTag: String = "")
    extends DataWriter[InternalRow] {
  private val rel = // batch writes (epoch −1) stage under a uuid instead
    // Streaming stages under (queryId, epoch): two queries (or two apps)
    // writing the same table dir at the same epoch/partition must not
    // collide on a staged path or cross-delete in abort(). Vacuum's
    // orphan matcher keys on the `txnsink-` prefix, which both forms keep.
    if (epochId >= 0)
      f"txnsink-e$epochId%05d-q$queryTag/part-$partitionId%05d-t$taskId.parquet"
    else s"txnsink-b${java.util.UUID.randomUUID().toString.take(8)}/" +
      f"part-$partitionId%05d-t$taskId.parquet"
  private var writer: org.apache.parquet.hadoop.ParquetWriter[
    org.apache.parquet.example.data.Group] = _
  private lazy val factory = new SimpleGroupFactory(TxnSinkWriter.toParquetType(schema))

  private def ensureOpen(): Unit = if (writer == null) {
    val conf = new Configuration()
    GroupWriteSupport.setSchema(TxnSinkWriter.toParquetType(schema), conf)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, rel).getParent)
    writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/$rel"))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val g = factory.newGroup()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case LongType | TimestampType => g.add(f.name, row.getLong(i))
        case IntegerType              => g.add(f.name, row.getInt(i))
        case DoubleType               => g.add(f.name, row.getDouble(i))
        case BooleanType              => g.add(f.name, row.getBoolean(i))
        case StringType               => g.add(f.name, row.getUTF8String(i).toString)
        case ArrayType(StringType, _) =>
          val arr = row.getArray(i)
          val lg = g.addGroup(f.name)
          var j = 0
          while (j < arr.numElements()) {
            val el = lg.addGroup("list")
            if (!arr.isNullAt(j)) el.add("element", arr.getUTF8String(j).toString)
            j += 1
          }
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage =
    if (writer == null) TxnSinkFile("") // empty partition: no file staged
    else { writer.close(); TxnSinkFile(rel) }

  override def abort(): Unit = if (writer != null) {
    writer.close()
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, rel))
  }

  override def close(): Unit = ()
}
