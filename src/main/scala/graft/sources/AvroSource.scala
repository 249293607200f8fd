package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => ASchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** An Apache AVRO container-file source, DSv2 — the row-oriented ingest
  * format next to the columnar ones already on the board (parquet/ORC
  * natively, CSV/JSON q83/q84). Built directly on avro-core (which ships
  * with Spark's jars) with no connector dependency: schema inference reads
  * the FIRST file's embedded writer schema, and the scan maps one
  * InputPartition per container file.
  *
  * The piece worth having at 100 TB is PROJECTION PUSHDOWN THROUGH THE
  * CODEC: `SupportsPushDownRequiredColumns` narrows a READER SCHEMA to the
  * required fields, and Avro's resolving decoder then SKIPS the bytes of
  * every unprojected field instead of materializing them (for a wide
  * record with a fat `text` field, a 2-column aggregate decodes a small
  * fraction of the stream). That is the Avro-native analog of parquet
  * column pruning, and AvroSourceSpec pins both the narrowed schema and
  * the row-identical result.
  *
  * Type mapping (the subset the corpus needs; nullable via the usual
  * `union {null, T}`): long→LONG, int→INT, string→STRING, double→DOUBLE,
  * float→FLOAT, boolean→BOOLEAN, bytes→BINARY. Container-level
  * deflate/null codecs are handled by avro-core transparently.
  *
  * Scale notes: Avro containers are internally SPLITTABLE on sync markers;
  * this scan keeps file granularity (the fixture writes one file per
  * upstream partition, so parallelism == layout) and documents block
  * splitting as the refinement a petabyte single-file layout would need.
  * Reference tie-in: `process_audio.py` reads only WAV directories — Avro
  * is part of the §2.1 "other formats" extension surface
  * (reference README.md:3).
  */
class AvroSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null && path.nonEmpty, "AvroSource needs a 'path' option")
    val files = AvroSource.listAvro(path)
    require(files.nonEmpty, s"no .avro files under $path")
    val r = new DataFileReader[GenericRecord](
      new java.io.File(files.head), new GenericDatumReader[GenericRecord]())
    try AvroSource.toSpark(r.getSchema) finally r.close()
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema)
}

object AvroSource {
  private[sources] def listAvro(path: String): Array[String] = {
    val dir = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(dir)) Array.empty
    else {
      val s = java.nio.file.Files.list(dir)
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".avro"))
        .map(_.toString).sorted
      finally s.close()
    }
  }

  /** Avro writer schema → Spark schema (unions {null,T} become nullable). */
  private[sources] def toSpark(s: ASchema): StructType = {
    def field(f: ASchema.Field): StructField = {
      val (t, nullable) = f.schema().getType match {
        case ASchema.Type.UNION =>
          val branches = f.schema().getTypes.asScala.toSeq
          val nonNull = branches.filter(_.getType != ASchema.Type.NULL)
          require(nonNull.size == 1, s"unsupported union ${f.schema()}")
          (prim(nonNull.head), branches.size != nonNull.size)
        case _ => (prim(f.schema()), false)
      }
      StructField(f.name(), t, nullable)
    }
    StructType(s.getFields.asScala.map(field).toArray)
  }

  private def prim(s: ASchema): DataType = s.getType match {
    case ASchema.Type.LONG    => LongType
    case ASchema.Type.INT     => IntegerType
    case ASchema.Type.STRING  => StringType
    case ASchema.Type.DOUBLE  => DoubleType
    case ASchema.Type.FLOAT   => FloatType
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.BYTES   => BinaryType
    case t => throw new IllegalArgumentException(s"unsupported avro type $t")
  }

  /** Spark → Avro schema (for the reader projection and the fixture
    * writer); nullable fields become `union {null, T}`. */
  private[sources] def toAvro(s: StructType, name: String): ASchema = {
    val fields = s.fields.map { f =>
      val base = f.dataType match {
        case LongType    => ASchema.create(ASchema.Type.LONG)
        case IntegerType => ASchema.create(ASchema.Type.INT)
        case StringType  => ASchema.create(ASchema.Type.STRING)
        case DoubleType  => ASchema.create(ASchema.Type.DOUBLE)
        case FloatType   => ASchema.create(ASchema.Type.FLOAT)
        case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
        case BinaryType  => ASchema.create(ASchema.Type.BYTES)
        case t => throw new IllegalArgumentException(s"unsupported spark type $t")
      }
      val sch = if (f.nullable)
        ASchema.createUnion(util.Arrays.asList(ASchema.create(ASchema.Type.NULL), base))
      else base
      new ASchema.Field(f.name, sch, null, if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
    }
    ASchema.createRecord(name, null, "graft.avro", false, util.Arrays.asList(fields: _*))
  }

  /** Fixture/sink helper: write `rows` as ONE Avro container file (used
    * per-partition from executors — each upstream partition lands as one
    * file, so write parallelism == partitioning, the same layout contract
    * as a parquet write). */
  private[graft] def writeFile(file: String, schema: StructType,
                               rows: Iterator[org.apache.spark.sql.Row]): Unit = {
    val aschema = toAvro(schema, "GraftRecord")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](aschema))
    w.create(aschema, new java.io.File(file))
    try rows.foreach { r =>
      val rec = new GenericData.Record(aschema)
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        val v = if (r.isNullAt(i)) null else f.dataType match {
          case BinaryType => java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](i))
          case _          => r.get(i).asInstanceOf[AnyRef]
        }
        rec.put(f.name, v)
      }
      w.append(rec)
    } finally w.close()
  }
}

private[sources] class AvroTable(path: String, schema0: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_avro($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, schema0)
}

private[sources] class AvroScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new AvroScan(AvroSource.listAvro(path), required)
}

private[sources] class AvroScan(files: Array[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"AvroScan(files=${files.length}, cols=${required.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => AvroPartition(f, required.json))
  override def createReaderFactory(): PartitionReaderFactory = AvroReaderFactory
}

private[sources] final case class AvroPartition(file: String,
                                                requiredJson: String) extends InputPartition

private[sources] object AvroReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroPartition]
    val required = DataType.fromJson(p.requiredJson).asInstanceOf[StructType]
    new PartitionReader[InternalRow] {
      // the pushdown mechanism: a reader schema holding ONLY the required
      // fields makes Avro's resolving decoder skip every other field's
      // bytes — never materializing the unprojected columns
      private val readerSchema = AvroSource.toAvro(required, "GraftRecordProj")
      private val reader = new DataFileReader[GenericRecord](
        new java.io.File(p.file),
        new GenericDatumReader[GenericRecord](null, readerSchema))
      override def next(): Boolean = reader.hasNext
      override def get(): InternalRow = {
        val rec = reader.next()
        val vals = required.fields.map { f =>
          val v = rec.get(f.name)
          if (v == null) null
          else f.dataType match {
            case StringType => UTF8String.fromString(v.toString)
            case BinaryType =>
              val bb = v.asInstanceOf[java.nio.ByteBuffer]
              val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
            case _ => v
          }
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = reader.close()
    }
  }
}
