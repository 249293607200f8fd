package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnLog

/** SQL schema evolution through the catalog (q297's machinery): ALTER
  * TABLE ADD/RENAME/DROP COLUMN semantics, the metadata-only claims, and
  * the reader-version refusals. */
class CatalogEvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("catalog-evolution-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.SqlDml.ensure(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def freshTable(tag: String): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_evo_$tag").toString
    spark.conf.set("spark.sql.catalog.ge", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ge.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ge.db")
    spark.sql(s"CREATE TABLE ge.db.$tag (k BIGINT, v DOUBLE)")
    (s"ge.db.$tag", s"$wh/db/$tag")
  }

  test("ADD COLUMNS is metadata-only: zero files move, old rows read NULL") {
    val (t, dir) = freshTable("addcol")
    spark.sql(s"INSERT INTO $t VALUES (1, 1.0), (2, 2.0)")
    val before = TxnLog.fileScanPlan(dir)._2.toSet
    val vBefore = TxnLog.currentVersion(dir)
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (tag STRING)")
    assert(TxnLog.fileScanPlan(dir)._2.toSet == before, "ADD COLUMN moved files")
    assert(TxnLog.currentVersion(dir) == vBefore, "ADD COLUMN committed data")
    val rows = spark.sql(s"SELECT k, tag FROM $t ORDER BY k").collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(1)))
  }

  test("UPDATE backfills a metadata-added column; later INSERTs write it") {
    val (t, dir) = freshTable("backfill")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 200.0)")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (tier STRING)")
    spark.sql(s"UPDATE $t SET tier = CASE WHEN v >= 100 THEN 'hi' ELSE 'lo' END")
    spark.sql(s"INSERT INTO $t VALUES (3, 30.0, 'new')")
    val rows = spark.sql(s"SELECT k, tier FROM $t ORDER BY k").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("lo", "hi", "new"))
    // the backfill was a real rewrite: the committed files now STORE tier
    val last = TxnLog.read(spark, dir)
    assert(last.schema.fieldNames.contains("tier"))
  }

  test("RENAME COLUMN commits metadata only; SQL scan refuses until compact") {
    val (t, dir) = freshTable("rename")
    spark.sql(s"INSERT INTO $t VALUES (1, 1.5)")
    val before = TxnLog.fileScanPlan(dir)._2.toSet
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO amount")
    // zero data files moved (the M commit is a manifest)
    val (_, filesNow, plain) = TxnLog.fileScanPlan(dir)
    assert(filesNow.toSet == before && !plain)
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $t").collect())
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(m => m.contains("pending") || m.contains("compact")))
    TxnLog.compact(spark, dir)
    val r = spark.sql(s"SELECT amount FROM $t").head()
    assert(r.getDouble(0) == 1.5)
    assert(!spark.table(t).schema.fieldNames.contains("v"))
  }

  test("time travel serves the snapshot's OWN schema, not the evolved one") {
    val (t, dir) = freshTable("ttschema")
    spark.sql(s"INSERT INTO $t VALUES (1, 2.5)")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO amount")
    TxnLog.compact(spark, dir) // materialize: head now reads `amount`
    assert(spark.sql(s"SELECT amount FROM $t").head().getDouble(0) == 2.5)
    // the pinned snapshot predates the rename: its files store `v`, and
    // the DATA must come back under that era's name — never NULL
    val old = spark.sql(s"SELECT * FROM $t VERSION AS OF 1").collect()
    assert(old.length == 1 && old.head.schema.fieldNames.contains("v"))
    assert(old.head.getDouble(old.head.fieldIndex("v")) == 2.5)
    // ADD COLUMN likewise: old versions serve the narrow schema
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (tag STRING)")
    assert(!spark.sql(s"SELECT * FROM $t VERSION AS OF 1")
      .schema.fieldNames.contains("tag"))
    assert(spark.table(t).schema.fieldNames.contains("tag"))
  }

  test("DROP COLUMN through SQL, materialized by compact") {
    val (t, dir) = freshTable("dropcol")
    spark.sql(s"INSERT INTO $t VALUES (7, 9.0)")
    spark.sql(s"ALTER TABLE $t DROP COLUMN v")
    TxnLog.compact(spark, dir)
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("k"))
    assert(spark.sql(s"SELECT k FROM $t").head().getLong(0) == 7L)
  }

  test("invalid evolution is refused loudly") {
    val (t, _) = freshTable("refuse")
    spark.sql(s"INSERT INTO $t VALUES (1, 1.0)")
    val dup = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (v STRING)"))
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(dup).exists(m =>
      m.contains("already exists") || m.contains("ALREADY_EXISTS")))
    intercept[Exception](
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (nested STRUCT<a: INT>.b INT)"))
    // NOT NULL add must refuse: existing rows cannot fill it
    val nn = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (req STRING NOT NULL)"))
    assert(msgs(nn).exists(m => m.contains("nullable") || m.contains("NOT NULL")))
  }
}
