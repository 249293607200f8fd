package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.io.TxnLog

/** Round-8 txn-log table-format extensions on the oracle board: MERGE INTO
  * with file-granular rewrites (q221), the change-data-feed (q222), and
  * manifest-stats file skipping (q223). Reference tie-in: the reference's
  * only table op is SQLite INSERT OR IGNORE (`process_audio.py:354-391`);
  * these queries are the lakehouse surface a 100 TB corpus needs in its
  * place — upserts that move one file's bytes instead of the table,
  * row-level change streams derived from the commit ledger, and
  * metadata-level scan pruning before any parquet footer is opened.
  */
object TxnOps {

  // ---------------------------------------------------------------- q221
  /** MERGE INTO (upsert) on the txn-log table, FILE-GRANULAR: v1 commits
    * the even-custkey half, v2 the odd half (one file each), v3 merges a
    * source of whole-row updates (every even BUILDING customer, segment
    * rewritten to 'UPSERTED', balance negated — both IEEE-exact ops) plus
    * 25 brand-new 'INSERTED' rows keyed off nation. The merge semi-joins
    * the source keys against the visible files, finds that ONLY the even
    * file contains a match, and commits an `X` exchange that removes that
    * one file and adds its rewrite — the odd file's bytes are never
    * touched (TxnLogSpec pins the file-level claim; the board pins the
    * semantics). Faces: as-of 2 = the pre-merge table, as-of 3 = the
    * upserted table — exactly target-anti-source ∪ source — and the
    * face-0 ledger row pins the action chain AAX. */
  def q221(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_q221_tbl").toString
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    TxnLog.commit(cust.filter(expr("c_custkey % 2 = 0")).coalesce(1), dir)
    TxnLog.commit(cust.filter(expr("c_custkey % 2 = 1")).coalesce(1), dir)
    val source = cust
      .filter(expr("c_custkey % 2 = 0 AND c_mktsegment = 'BUILDING'"))
      .select(col("c_custkey"), lit("UPSERTED").as("c_mktsegment"),
        (-col("c_acctbal")).as("c_acctbal"))
      .unionByName(Tables.nation(s, d).select(
        (lit(9000000L) + col("n_nationkey")).as("c_custkey"),
        lit("INSERTED").as("c_mktsegment"),
        (col("n_nationkey").cast("double") * lit(1.5)).as("c_acctbal")))
    TxnLog.merge(s, dir, source, Seq("c_custkey"))
    def face(asOf: Option[Long], tag: Long) =
      TxnLog.read(s, dir, asOf)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("sum_bal"))
        .withColumn("as_of", lit(tag))
    val actions = TxnLog.history(s, dir).collect()
      .sortBy(_.getLong(0)).map(_.getString(1)).mkString
    val ledger = s.range(1).select(lit(0L).as("as_of"), lit(actions).as("c_mktsegment"),
      lit(TxnLog.currentVersion(dir)).as("n"), lit(0.0).as("sum_bal"))
    ledger.unionByName(face(Some(2L), 2L)).unionByName(face(None, 3L))
      .select(col("as_of"), col("c_mktsegment"), col("n"), col("sum_bal"))
      .orderBy(col("as_of"), col("c_mktsegment"))
  }
  val q221Sql: String =
    """WITH target AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
      |src AS (
      |  SELECT c_custkey, 'UPSERTED' AS c_mktsegment, -c_acctbal AS c_acctbal
      |  FROM customer WHERE c_custkey % 2 = 0 AND c_mktsegment = 'BUILDING'
      |  UNION ALL
      |  SELECT 9000000 + n_nationkey, 'INSERTED', CAST(n_nationkey AS DOUBLE) * 1.5
      |  FROM nation),
      |merged AS (
      |  SELECT t.* FROM target t
      |  WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.c_custkey = t.c_custkey)
      |  UNION ALL SELECT * FROM src),
      |faces AS (
      |  SELECT 2 AS as_of, c_mktsegment, COUNT(*) AS n,
      |         SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal
      |  FROM target GROUP BY 2
      |  UNION ALL
      |  SELECT 3, c_mktsegment, COUNT(*), SUM(CAST(c_acctbal AS DECIMAL(18,2)))
      |  FROM merged GROUP BY 2)
      |SELECT CAST(0 AS BIGINT) AS as_of, 'AAX' AS c_mktsegment,
      |       CAST(3 AS BIGINT) AS n, CAST(0 AS DOUBLE) AS sum_bal
      |UNION ALL
      |SELECT CAST(as_of AS BIGINT), c_mktsegment, CAST(n AS BIGINT),
      |       CAST(sum_bal AS DOUBLE)
      |FROM faces
      |ORDER BY as_of, c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q222
  /** CHANGE DATA FEED over a five-version lifecycle: v1/v2 append the two
    * custkey halves, v3 MERGEs (X: updates negate-and-retag the even
    * BUILDING rows, inserts add nation-keyed rows — CDF derives them
    * file-bounded from the exchanged files), v4 delete-vectors the
    * AUTOMOBILE segment (D: the deletes are the rows visible at v3
    * matching the vector keys), v5 compacts (R: the generic snapshot diff,
    * which must come out EMPTY — compaction materializes the vector the
    * reader was already applying, so no logical change). The feed is
    * aggregated per (version, change_type) with an exact custkey checksum;
    * version 5 is absent from the output, which IS the compaction claim. */
  def q222(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_q222_tbl").toString
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    TxnLog.commit(cust.filter(expr("c_custkey % 2 = 0")).coalesce(1), dir)
    TxnLog.commit(cust.filter(expr("c_custkey % 2 = 1")).coalesce(1), dir)
    val source = cust
      .filter(expr("c_custkey % 2 = 0 AND c_mktsegment = 'BUILDING'"))
      .select(col("c_custkey"), lit("UPSERTED").as("c_mktsegment"),
        (-col("c_acctbal")).as("c_acctbal"))
      .unionByName(Tables.nation(s, d).select(
        (lit(9000000L) + col("n_nationkey")).as("c_custkey"),
        lit("INSERTED").as("c_mktsegment"),
        (col("n_nationkey").cast("double") * lit(1.5)).as("c_acctbal")))
    TxnLog.merge(s, dir, source, Seq("c_custkey"))
    TxnLog.deleteVector(s, dir, "c_mktsegment = 'AUTOMOBILE'", Seq("c_custkey"))
    TxnLog.compact(s, dir)
    TxnLog.changes(s, dir, 0L, TxnLog.currentVersion(dir))
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("key_sum"))
      .select(col("_commit_version").as("version"), col("_change_type").as("change_type"),
        col("n"), col("key_sum"))
      .orderBy(col("version"), col("change_type"))
  }
  val q222Sql: String =
    """WITH target AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
      |src AS (
      |  SELECT c_custkey, 'UPSERTED' AS c_mktsegment, -c_acctbal AS c_acctbal
      |  FROM customer WHERE c_custkey % 2 = 0 AND c_mktsegment = 'BUILDING'
      |  UNION ALL
      |  SELECT 9000000 + n_nationkey, 'INSERTED', CAST(n_nationkey AS DOUBLE) * 1.5
      |  FROM nation),
      |merged AS (
      |  SELECT t.* FROM target t
      |  WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.c_custkey = t.c_custkey)
      |  UNION ALL SELECT * FROM src),
      |feed AS (
      |  SELECT 1 AS version, 'insert' AS change_type, c_custkey
      |  FROM target WHERE c_custkey % 2 = 0
      |  UNION ALL
      |  SELECT 2, 'insert', c_custkey FROM target WHERE c_custkey % 2 = 1
      |  UNION ALL
      |  SELECT 3, 'insert', c_custkey FROM src
      |  UNION ALL
      |  SELECT 3, 'delete', c_custkey FROM target
      |  WHERE c_custkey % 2 = 0 AND c_mktsegment = 'BUILDING'
      |  UNION ALL
      |  SELECT 4, 'delete', c_custkey FROM merged WHERE c_mktsegment = 'AUTOMOBILE')
      |SELECT CAST(version AS BIGINT) AS version, change_type,
      |       CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
      |FROM feed
      |GROUP BY 1, 2
      |ORDER BY version, change_type""".stripMargin

  // ---------------------------------------------------------------- q223
  /** MANIFEST-STATS FILE SKIPPING (the Iceberg zone-map slot): orders land
    * year-partitioned — one [[TxnLog.commitWithStats]] append per order
    * year, each carrying a (file, o_oyear, min, max) sidecar line — and
    * the 1997–1998 revenue query plans through [[TxnLog.scanPruned]],
    * which drops every other year's file at PLANNING time from metadata
    * alone (no parquet footer opened). The face-0 ledger row pins the
    * pruning arithmetic: files planned = years intersecting [1997,1998],
    * files total = distinct order years — both stated independently by
    * the oracle from the data. The rowset face proves pruning soundness:
    * the pruned scan aggregates to exactly the full-table filter. */
  def q223(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_q223_tbl").toString
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast("long").as("o_oyear"))
    val years = ord.select(col("o_oyear")).distinct().collect()
      .map(_.getLong(0)).sorted
    years.foreach { y =>
      TxnLog.commitWithStats(ord.filter(col("o_oyear") === y).coalesce(1),
        dir, Seq("o_oyear"))
    }
    val scan = TxnLog.scanPruned(s, dir, "o_oyear", 1997L, 1998L)
    val face = scan.df.groupBy(col("o_oyear"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("rev"))
    val ledger = s.range(1).select(lit(0L).as("o_oyear"),
      lit(scan.plannedFiles.toLong).as("n"), lit(scan.totalFiles.toDouble).as("rev"))
    ledger.unionByName(face).orderBy(col("o_oyear"))
  }
  val q223Sql: String =
    """WITH yrs AS (SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS y FROM orders)
      |SELECT CAST(0 AS BIGINT) AS o_oyear,
      |       (SELECT COUNT(*) FROM yrs WHERE y BETWEEN 1997 AND 1998) AS n,
      |       CAST((SELECT COUNT(*) FROM yrs) AS DOUBLE) AS rev
      |UNION ALL
      |SELECT CAST(year(o_orderdate) AS BIGINT), CAST(COUNT(*) AS BIGINT),
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |FROM orders
      |WHERE year(o_orderdate) BETWEEN 1997 AND 1998
      |GROUP BY 1
      |ORDER BY o_oyear""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q221_txn_merge_upsert" -> ((q221 _, Some(q221Sql))),
    "q222_change_data_feed" -> ((q222 _, Some(q222Sql))),
    "q223_stats_file_skipping" -> ((q223 _, Some(q223Sql))))
}
