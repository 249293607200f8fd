package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The io/TxnLog commit protocol's contracts, beyond q212's hash gate:
  * versions are linear, time travel sees exactly the prefix, crashed
  * writers stay invisible, and RACING commits both land (optimistic
  * concurrency through the atomic hard-link claim) without ever losing
  * or duplicating a row. */
class TxnLogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_txnspec").toString

  test("commits are linear versions; time travel reads exactly the prefix") {
    val dir = freshTable()
    import spark.implicits._
    assert(graft.io.TxnLog.commit(Seq(1L, 2L).toDF("v"), dir) == 1L)
    assert(graft.io.TxnLog.commit(Seq(3L).toDF("v"), dir) == 2L)
    assert(graft.io.TxnLog.commit(Seq(4L, 5L).toDF("v"), dir) == 3L)
    assert(graft.io.TxnLog.currentVersion(dir) == 3L)
    def vals(asOf: Option[Long]) = graft.io.TxnLog.read(spark, dir, asOf)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(vals(None) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(vals(Some(1L)) == Seq(1L, 2L))
    assert(vals(Some(2L)) == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException](graft.io.TxnLog.read(spark, dir, Some(0L)))
  }

  test("a writer that died before its manifest is invisible") {
    val dir = freshTable()
    import spark.implicits._
    graft.io.TxnLog.commit(Seq(1L).toDF("v"), dir)
    // crash simulation: data fully written, no manifest
    Seq(99L, 98L).toDF("v").write.parquet(s"$dir/part-crashed-writer")
    assert(graft.io.TxnLog.read(spark, dir).collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(graft.io.TxnLog.currentVersion(dir) == 1L)
  }

  test("racing commits both land with distinct versions; no loss, no dupes") {
    val dir = freshTable()
    import spark.implicits._
    graft.io.TxnLog.commit(Seq(0L).toDF("v"), dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            graft.io.TxnLog.commit(Seq(i.toLong * 10, i.toLong * 10 + 1).toDF("v"), dir)
        })
      }
      val versions = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(versions.toSet.size == 4, s"version collision: $versions")
      assert(versions.toSet == Set(2L, 3L, 4L, 5L))
    } finally pool.shutdown()
    val got = graft.io.TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(0L, 10L, 11L, 20L, 21L, 30L, 31L, 40L, 41L))
  }

  test("compaction replaces the visible file set, preserves rows and history") {
    val dir = freshTable()
    import spark.implicits._
    graft.io.TxnLog.commit(Seq(1L, 2L).toDF("v"), dir)
    graft.io.TxnLog.commit(Seq(3L).toDF("v"), dir)
    val cv = graft.io.TxnLog.compact(spark, dir)
    assert(cv == 3L)
    // rowset unchanged
    assert(graft.io.TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
    // latest view plans ONLY the compacted files: its input paths all share
    // the one replace-commit's part dir
    val inputs = graft.io.TxnLog.read(spark, dir).inputFiles
    assert(inputs.nonEmpty && inputs.map(_.split("/part-")(1).split("/")(0)).toSet.size == 1,
      s"latest view must read one part dir, got ${inputs.toSeq}")
    // time travel to the pre-compaction chain still works
    assert(graft.io.TxnLog.read(spark, dir, Some(1L)).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))
    // appends after compaction stack on top of the replace
    graft.io.TxnLog.commit(Seq(9L).toDF("v"), dir)
    assert(graft.io.TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L, 9L))
  }

  test("vacuum reclaims pre-compaction files; vacuumed versions refuse loudly") {
    val dir = freshTable()
    import spark.implicits._
    graft.io.TxnLog.commit(Seq(1L, 2L).toDF("v"), dir)
    graft.io.TxnLog.commit(Seq(3L).toDF("v"), dir)
    // A-only chain: every file referenced — vacuum is a no-op
    assert(graft.io.TxnLog.vacuum(dir).isEmpty)
    graft.io.TxnLog.compact(spark, dir) // v3 replaces
    val deleted = graft.io.TxnLog.vacuum(dir, retainVersions = 1)
    assert(deleted.nonEmpty, "pre-compaction files must be reclaimed")
    assert(graft.io.TxnLog.minVersion(dir) == 3L)
    // latest still reads fully
    assert(graft.io.TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
    // vacuumed as-of fails at PLANNING time, loudly
    val e = intercept[IllegalArgumentException](graft.io.TxnLog.read(spark, dir, Some(1L)))
    assert(e.getMessage.contains("vacuumed"))
    // only the compacted part dir survives on disk
    val partDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("part-"))
    assert(partDirs.length == 1, s"expected 1 surviving part dir, got ${partDirs.length}")
  }

  test("delete is copy-on-write: rows gone at latest, recoverable until vacuum") {
    val dir = freshTable()
    import spark.implicits._
    graft.io.TxnLog.commit(Seq(1L, 2L, 3L, 4L).toDF("v"), dir)
    graft.io.TxnLog.delete(spark, dir, "v % 2 = 0")
    assert(graft.io.TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    // the recovery window: pre-delete version still fully readable
    assert(graft.io.TxnLog.read(spark, dir, Some(1L)).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
    // vacuum closes the window — deleted rows become unrecoverable
    assert(graft.io.TxnLog.vacuum(dir).nonEmpty)
    intercept[IllegalArgumentException](graft.io.TxnLog.read(spark, dir, Some(1L)))
    assert(graft.io.TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
  }

  test("reading a non-table or empty version range fails loudly") {
    val dir = freshTable()
    intercept[IllegalArgumentException](graft.io.TxnLog.read(spark, dir))
  }
}
