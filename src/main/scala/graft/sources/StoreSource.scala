package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The WRITE face of the DSv2 surface (round-6 verdict item 8) — the
  * connector counterpart of [[GenSource]]'s read face: a directory-backed
  * store TABLE with the full two-phase batch-write commit protocol.
  *
  * What it implements (q177 drives it against a relational oracle):
  *   - `SupportsWrite` + BATCH_WRITE: executors write their partition's
  *     rows to UNCOMMITTED temp files (`_tmp_<queryId>/`), the driver's
  *     `commit` publishes all of them atomically-enough (rename into the
  *     table directory) only after every task succeeded — failed/aborted
  *     writes leave no visible rows, exactly the contract a real cluster
  *     sink needs (files land on shared storage there; the protocol is
  *     identical).
  *   - `SupportsTruncate`: `mode("overwrite")` plans as truncate + append
  *     (OverwriteByExpression with a literal-true filter), so "refresh"
  *     (q171's DDL analog) is a first-class connector operation.
  *   - `SupportsRead` + column pruning on the way back out.
  *
  * Row format is deterministic TSV over [[GenSource.schema]]'s
  * (id BIGINT, h STRING, bucket BIGINT) — fixed schema keeps the codec
  * honest and the oracle exact; a general store would persist its schema
  * alongside the data. */
class StoreSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "StoreSource needs a 'path' option")
    new StoreTable(path)
  }
}

private[sources] class StoreTable(path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_store($path)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StoreScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fieldNames.sameElements(GenSource.schema.fieldNames),
      s"StoreSource writes the fixed schema ${GenSource.schema.simpleString}, " +
        s"got ${info.schema().simpleString}")
    new StoreWriteBuilder(path, info.queryId(), truncate = false)
  }
}

private[sources] class StoreWriteBuilder(path: String, queryId: String,
                                         truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new StoreWriteBuilder(path, queryId, truncate = true)
  override def build(): Write = new StoreWrite(path, queryId, truncate)
}

private[sources] final case class StoreCommitMessage(tmpFile: String)
    extends WriterCommitMessage

private[sources] class StoreWrite(path: String, queryId: String, truncate: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def description(): String =
    s"StoreWrite(path=$path, truncate=$truncate)"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    StoreWriterFactory(path, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncate) {
      val old = Files.list(dir).toArray.map(_.asInstanceOf[java.nio.file.Path])
      old.filter(_.getFileName.toString.endsWith(".tsv")).foreach(Files.delete)
    }
    messages.foreach {
      case StoreCommitMessage(tmp) if tmp.nonEmpty =>
        val src = Paths.get(tmp)
        Files.move(src, dir.resolve(src.getFileName),
          StandardCopyOption.REPLACE_EXISTING)
      case _ => ()
    }
    cleanupTmp()
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanupTmp()

  private def cleanupTmp(): Unit = {
    import java.nio.file.{Files, Paths}
    val tmpDir = Paths.get(path, s"_tmp_$queryId")
    if (Files.isDirectory(tmpDir)) {
      Files.list(tmpDir).toArray
        .map(_.asInstanceOf[java.nio.file.Path]).foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(tmpDir)
    }
  }
}

private[sources] final case class StoreWriterFactory(path: String, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import java.nio.file.{Files, Paths}
      private val tmpDir = Paths.get(path, s"_tmp_$queryId")
      // queryId in the published name keeps append batches collision-free;
      // partitionId alone (not taskId) keeps speculative retries idempotent
      private val file = tmpDir.resolve(s"part-$queryId-$partitionId.tsv")
      private var out: java.io.BufferedWriter = null
      private var committed = false

      override def write(row: InternalRow): Unit = {
        if (out == null) {
          Files.createDirectories(tmpDir)
          out = Files.newBufferedWriter(file, java.nio.charset.StandardCharsets.UTF_8)
        }
        out.write(s"${row.getLong(0)}\t${row.getUTF8String(1)}\t${row.getLong(2)}\n")
      }
      override def commit(): WriterCommitMessage = {
        if (out == null) StoreCommitMessage("") // empty partition: no file
        else {
          out.close(); out = null; committed = true
          StoreCommitMessage(file.toString)
        }
      }
      override def abort(): Unit = close()
      // close() runs AFTER commit() on the success path too — only an
      // uncommitted temp file is discarded here (abort/failure cleanup);
      // a committed one belongs to the driver's publish step
      override def close(): Unit = {
        if (out != null) { out.close(); out = null }
        if (!committed) Files.deleteIfExists(file)
        ()
      }
    }
}

private[sources] class StoreScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GenSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(path)
    val files: Array[String] =
      if (!Files.isDirectory(dir)) Array.empty
      else Files.list(dir).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".tsv"))
        .map(_.toString).sorted
    new StoreScan(files, required)
  }
}

private[sources] class StoreScan(files: Array[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"StoreScan(files=${files.length}, cols=${required.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => StorePartition(f, required.fieldNames))
  override def createReaderFactory(): PartitionReaderFactory = StoreReaderFactory
}

private[sources] final case class StorePartition(file: String,
                                                 cols: Array[String]) extends InputPartition

private[sources] object StoreReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StorePartition]
    new PartitionReader[InternalRow] {
      private val lines = java.nio.file.Files.newBufferedReader(
        java.nio.file.Paths.get(p.file), java.nio.charset.StandardCharsets.UTF_8)
      private var cur: Array[String] = null
      override def next(): Boolean = {
        val l = lines.readLine()
        if (l == null) false else { cur = l.split("\t", -1); true }
      }
      override def get(): InternalRow =
        new GenericInternalRow(p.cols.map {
          case "id"     => cur(0).toLong: java.lang.Long
          case "h"      => UTF8String.fromString(cur(1))
          case "bucket" => cur(2).toLong: java.lang.Long
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = lines.close()
    }
  }
}
