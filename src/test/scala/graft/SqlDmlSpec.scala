package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnLog

/** SQL row-level DML ([[graft.plans.SqlDml]]): statement lowering, the
  * file-granular at-scale contract, and the loud refusals. */
class SqlDmlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("sqldml-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.SqlDml.ensure(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** Fresh catalog table under a temp warehouse; returns (sqlName, dir). */
  private def freshTable(tag: String): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_sqldml_$tag").toString
    spark.conf.set("spark.sql.catalog.gt", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gt.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS gt.db")
    spark.sql(s"CREATE TABLE gt.db.$tag (k BIGINT, v DOUBLE, grp STRING)")
    (s"gt.db.$tag", s"$wh/db/$tag")
  }

  test("DELETE rewrites ONLY the files containing a matching row") {
    val (t, dir) = freshTable("delgran")
    // two single-file commits with disjoint key ranges
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id AS DOUBLE), 'lo' FROM range(0, 100)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id AS DOUBLE), 'hi' FROM range(1000, 1100)")
    val before = TxnLog.fileScanPlan(dir)._2 // resolved absolute paths
    assert(before.size >= 2)
    // per-file key ranges: a file is TOUCHED iff it holds a matching row
    def rel(p: String) = p.split('/').takeRight(2).mkString("/")
    val minByRel = spark.read.parquet(before: _*)
      .withColumn("__f", input_file_name())
      .groupBy("__f").agg(min("k").as("mn")).collect()
      .map(r => rel(r.getString(0)) -> r.getLong(1)).toMap
    val (touchedFiles, untouchedFiles) = before.partition(f => minByRel(rel(f)) < 50)
    assert(touchedFiles.nonEmpty && untouchedFiles.nonEmpty)

    spark.sql(s"DELETE FROM $t WHERE k < 50")
    val after = TxnLog.fileScanPlan(dir)._2.toSet
    // every file WITHOUT a matching row survives by PATH — bytes untouched
    untouchedFiles.foreach(f => assert(after.contains(f), s"untouched file $f was moved"))
    // every file WITH a matching row was exchanged out
    touchedFiles.foreach(f => assert(!after.contains(f), s"touched file $f still visible"))
    // the commit is an exchange, not a replace
    val actions = TxnLog.history(spark, dir)
      .orderBy("version").select("action").collect().map(_.getString(0))
    assert(actions.last.startsWith("X"), s"expected X exchange, got ${actions.last}")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $t").head().getLong(0) == 150L)
  }

  test("UPDATE applies SETs simultaneously and keeps column types") {
    val (t, dir) = freshTable("updsim")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0, 'a'), (2, 20.0, 'b')")
    // simultaneous: v sees pre-update k, k sees pre-update v
    spark.sql(s"UPDATE $t SET v = k * 100.0, k = CAST(v AS BIGINT) WHERE grp = 'a'")
    val r = spark.sql(s"SELECT k, v FROM $t WHERE grp = 'a'").head()
    assert(r.getLong(0) == 10L && r.getDouble(1) == 100.0)
    // value exprs cast back to the column type: schema never widens
    val sch = TxnLog.read(spark, dir).schema
    assert(sch("k").dataType.typeName == "long")
    assert(sch("v").dataType.typeName == "double")
  }

  test("MERGE refuses duplicate source keys loudly") {
    val (t, _) = freshTable("dupsrc")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0, 'a')")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $t USING (
        SELECT * FROM VALUES (1, 1.0), (1, 2.0) AS s(k, nv)) src
        ON $t.k = src.k
        WHEN MATCHED THEN UPDATE SET v = src.nv""")
    }
    assert(e.getMessage.contains("duplicate keys") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate keys")))
  }

  test("DML against a time-travel resolution is refused") {
    val (t, dir) = freshTable("ttrefuse")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0, 'a')")
    spark.sql(s"INSERT INTO $t VALUES (2, 20.0, 'b')")
    // the parser itself forbids `DELETE ... VERSION AS OF` text, so the
    // grammar can never reach the rule with a pinned snapshot from SQL —
    // pin both layers: the parse refusal, and the rule's own guard
    // (defense against a future API that hands it a pinned relation)
    intercept[Exception] {
      spark.sql(s"DELETE FROM $t VERSION AS OF 1 WHERE k = 1")
    }
    val pinned = new graft.sources.GraftSqlTable(dir, "t@v1", Some(1L))
    val e = intercept[IllegalArgumentException] {
      graft.plans.SqlDml.requireWritable(pinned, "DELETE")
    }
    assert(e.getMessage.contains("time-travel"))
    // and the table is still intact
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $t").head().getLong(0) == 2L)
  }

  test("MERGE clause order is honored (update-first shields the delete)") {
    val (t, _) = freshTable("clauseord")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0, 'a'), (2, 20.0, 'a'), (3, 30.0, 'a')")
    // update-first: k=1 (bump>0) updates; k=2 (bump<=0) falls to delete;
    // k=9 inserts with explicit projection leaving grp NULL-filled
    spark.sql(s"""MERGE INTO $t USING (
      SELECT * FROM VALUES (1, 5.0), (2, -1.0), (9, 7.0) AS s(k, bump)) src
      ON $t.k = src.k
      WHEN MATCHED AND src.bump > 0 THEN UPDATE SET v = v + src.bump
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.bump)""")
    val rows = spark.sql(s"SELECT k, v, grp FROM $t ORDER BY k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L, 9L))
    assert(rows(0).getDouble(1) == 15.0)            // updated
    assert(rows(2).getDouble(1) == 7.0 && rows(2).isNullAt(2)) // inserted, grp NULL
  }

  test("full-table DELETE empties the table; the state survives and refills") {
    val (t, dir) = freshTable("fullwipe")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id AS DOUBLE), 'a' FROM range(0, 20)")
    spark.sql(s"DELETE FROM $t") // removes-only exchange: empty visible set
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $t").head().getLong(0) == 0L)
    // the Scala reader serves ZERO ROWS at the last known schema
    val empty = TxnLog.read(spark, dir)
    assert(empty.count() == 0L)
    assert(empty.schema.fieldNames.toSeq == Seq("k", "v", "grp"))
    // and the table refills normally
    spark.sql(s"INSERT INTO $t VALUES (7, 7.0, 'b')")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $t").head().getLong(0) == 1L)
    // full delete with PENDING VECTORS takes the replace fallback and
    // lands the same empty state
    TxnLog.deleteVector(spark, dir, "k = 99", Seq("k"))
    spark.sql(s"DELETE FROM $t")
    assert(TxnLog.read(spark, dir).count() == 0L)
  }

  test("deleteWhere/updateWhere are no-ops when nothing matches") {
    val (t, dir) = freshTable("noop")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0, 'a')")
    val v1 = TxnLog.currentVersion(dir)
    spark.sql(s"DELETE FROM $t WHERE k > 100")
    spark.sql(s"UPDATE $t SET v = 0.0 WHERE k > 100")
    assert(TxnLog.currentVersion(dir) == v1, "no-match DML must not commit")
  }
}
