package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AvroSource contracts beyond q224's hash gate: type fidelity across the
  * full supported surface (incl. nulls and binary), projection pushdown
  * reaching the codec's reader schema, and file-per-partition layout. */
class AvroSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_avrospec").toString

  private val wideSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false),
    StructField("ratio", FloatType, nullable = false),
    StructField("flag", BooleanType, nullable = false),
    StructField("small", IntegerType, nullable = false),
    StructField("blob", BinaryType, nullable = true)))

  private val wideRows = Seq(
    Row(1L, "alpha", 1.5, 0.25f, true, 7, Array[Byte](1, 2, 3)),
    Row(2L, null, -2.25, 1.75f, false, -1, null),
    Row(3L, "gamma", 0.0, 0.0f, true, 0, Array[Byte]()))

  test("round-trips every supported type, nulls and binary included") {
    val dir = tmp()
    AvroSource.writeFile(s"$dir/one.avro", wideSchema, wideRows.iterator)
    val back = spark.read.format("graft.sources.AvroSource")
      .option("path", dir).load()
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == wideSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length == 3)
    assert(got(0).getString(1) == "alpha" && got(1).isNullAt(1))
    assert(got(0).getDouble(2) == 1.5 && got(1).getDouble(2) == -2.25)
    assert(got(0).getFloat(3) == 0.25f)
    assert(got(0).getBoolean(4) && !got(1).getBoolean(4))
    assert(got(1).getInt(5) == -1)
    assert(got(0).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert(got(1).isNullAt(6))
    assert(got(2).getAs[Array[Byte]](6).toSeq == Seq.empty)
  }

  test("projection pushdown narrows the scan to the required columns") {
    val dir = tmp()
    AvroSource.writeFile(s"$dir/one.avro", wideSchema, wideRows.iterator)
    val projected = spark.read.format("graft.sources.AvroSource")
      .option("path", dir).load().select("id", "flag")
    // the DSv2 scan's readSchema IS the pushed projection — assert it via
    // the physical plan's scan description (AvroScan prints its columns)
    val plan = projected.queryExecution.executedPlan.toString()
    assert(plan.contains("cols=id,flag") || plan.contains("AvroScan"),
      s"projection did not reach the scan:\n$plan")
    val scanLine = plan.linesIterator.find(_.contains("AvroScan")).getOrElse("")
    assert(!scanLine.contains("text") && !scanLine.contains("blob"),
      s"unprojected columns still in the scan: $scanLine")
    assert(projected.collect().map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
      == Seq((1L, true), (2L, false), (3L, true)))
  }

  test("one partition per container file; files are independent splits") {
    val dir = tmp()
    (0 until 3).foreach { i =>
      AvroSource.writeFile(s"$dir/part-$i.avro", wideSchema,
        wideRows.map(r => Row((r.getLong(0) + i * 10).asInstanceOf[AnyRef],
          r.get(1), r.get(2), r.get(3), r.get(4), r.get(5), r.get(6))).iterator)
    }
    val back = spark.read.format("graft.sources.AvroSource").option("path", dir).load()
    assert(back.rdd.getNumPartitions == 3)
    assert(back.count() == 9)
  }
}
