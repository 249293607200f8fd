package graft.plans

import scala.util.matching.Regex

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StructType}

import graft.io.TxnLog
import graft.sources.{GraftCatalog, GraftSqlTable}

/** MAINTENANCE SQL — `OPTIMIZE` and `VACUUM` statements (the Delta
  * parser-extension pattern: a thin front parser claims ONLY the two
  * statements Spark's grammar doesn't have, everything else delegates to
  * the session parser untouched):
  *
  *   OPTIMIZE <cat>.<db>.<t>                      → clustered tables
  *     re-cluster INCREMENTALLY (q291's new-files-only rewrite);
  *     unclustered tables compact (content-identity replace)
  *   OPTIMIZE <cat>.<db>.<t> ZORDER BY (x, y)     → the q267 Morton
  *     rewrite + stats sidecar, from SQL text
  *   VACUUM <cat>.<db>.<t> RETAIN <n> VERSIONS    → reclaim files below
  *     the retention watermark; returns the reclaimed count. The RETAIN
  *     clause is REQUIRED: a bare VACUUM would silently destroy all time
  *     travel (the Delta default-retention guard, version-count form)
  *   DESCRIBE HISTORY / DESCRIBE DETAIL <t>       → the commit ledger /
  *     the current-state card, both metadata-only
  *   SHOW PARTITIONS <cat>.<db>.<t>               → live partitions from
  *     the manifest's dir-encoded paths (no file opened; three-part
  *     names only — the session catalog's own grammar keeps bare names)
  *
  * Parsers are session-BUILD-time configuration (unlike optimizer rules
  * there is no post-build hook), so the engine's own mains build their
  * sessions with `spark.sql.extensions=graft.functions.GraftExtensions`;
  * `newSession()` children inherit it. Table names resolve through the
  * session's catalog manager at RUN time and must land on a graft
  * catalog (three-part names; the statements are meaningless elsewhere). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeZorder(t, x, y) =>
      GraftOptimizeCommand(split(t), Some((x, y)))
    case Optimize(t) =>
      GraftOptimizeCommand(split(t), None)
    case VacuumRetain(t, n) =>
      GraftVacuumCommand(split(t), Some(n.toInt))
    case Vacuum(t) =>
      GraftVacuumCommand(split(t), None)
    case DescribeHistory(t) =>
      GraftDescribeHistoryCommand(split(t))
    case DescribeDetail(t) =>
      GraftDescribeDetailCommand(split(t))
    case ShowPartitions(t) if claims(t) =>
      // graft-catalog three-part names only — a bare `SHOW PARTITIONS t`
      // or any session-catalog name stays with Spark's own grammar
      GraftShowPartitionsCommand(split(t))
    case RestoreVersion(t, v) =>
      GraftRestoreCommand(split(t), Left(v.toLong))
    case RestoreTimestamp(t, ts) =>
      GraftRestoreCommand(split(t), Right(ts))
    case ShallowCloneVersion(dst, src, v) =>
      GraftCloneCommand(split(dst), split(src), Some(v.toLong))
    case ShallowClone(dst, src) =>
      GraftCloneCommand(split(dst), split(src), None)
    case ConvertPart(t, cols) =>
      GraftConvertCommand(split(t),
        cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    case Convert(t) =>
      GraftConvertCommand(split(t), Nil)
    case Checkpoint(t) if t.contains('.') =>
      GraftCheckpointCommand(split(t))
    case AnalyzeStats(t, cols) if claims(t) =>
      // graft-catalog three-part names only — Spark's own ANALYZE TABLE
      // keeps session-catalog names AND other catalogs' tables untouched
      GraftAnalyzeCommand(split(t),
        cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    case _ => delegate.parsePlan(sqlText)
  }

  private def split(name: String): Seq[String] = name.split('.').toSeq

  /** Statements that shadow GENUINE Spark grammar (ANALYZE TABLE, SHOW
    * PARTITIONS) are claimed only when the name is three-part AND its
    * catalog resolves to a graft catalog — anything else falls through
    * to the session parser so Spark's own semantics keep working. */
  private def claims(name: String): Boolean =
    name.split('.').length == 3 && GraftSqlParser.isGraftCatalog(name.split('.').head)

  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
}

object GraftSqlParser {
  // anchored, case-insensitive, whitespace-tolerant; identifiers stay
  // [A-Za-z0-9_] per the catalog's own path-safety constraint
  private val id = """([\w.]+)"""
  private[plans] val OptimizeZorder: Regex =
    ("""(?is)^\s*OPTIMIZE\s+""" + id +
      """\s+ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)\s*;?\s*$""").r
  private[plans] val Optimize: Regex =
    ("""(?is)^\s*OPTIMIZE\s+""" + id + """\s*;?\s*$""").r
  private[plans] val VacuumRetain: Regex =
    ("""(?is)^\s*VACUUM\s+""" + id + """\s+RETAIN\s+(\d+)\s+VERSIONS\s*;?\s*$""").r
  private[plans] val Vacuum: Regex =
    ("""(?is)^\s*VACUUM\s+""" + id + """\s*;?\s*$""").r
  private[plans] val DescribeHistory: Regex =
    ("""(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+""" + id + """\s*;?\s*$""").r
  private[plans] val DescribeDetail: Regex =
    ("""(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+""" + id + """\s*;?\s*$""").r
  private[plans] val ShowPartitions: Regex =
    ("""(?is)^\s*SHOW\s+PARTITIONS\s+""" + id + """\s*;?\s*$""").r
  private[plans] val RestoreVersion: Regex =
    ("""(?is)^\s*RESTORE\s+TABLE\s+""" + id +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private[plans] val RestoreTimestamp: Regex =
    ("""(?is)^\s*RESTORE\s+TABLE\s+""" + id +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""").r
  private[plans] val ShallowCloneVersion: Regex =
    ("""(?is)^\s*CREATE\s+TABLE\s+""" + id + """\s+SHALLOW\s+CLONE\s+""" + id +
      """\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private[plans] val ShallowClone: Regex =
    ("""(?is)^\s*CREATE\s+TABLE\s+""" + id + """\s+SHALLOW\s+CLONE\s+""" + id +
      """\s*;?\s*$""").r
  private[plans] val ConvertPart: Regex =
    ("""(?is)^\s*CONVERT\s+TO\s+GRAFT\s+""" + id +
      """\s+PARTITIONED\s+BY\s*\(\s*([\w,\s]+?)\s*\)\s*;?\s*$""").r
  private[plans] val Convert: Regex =
    ("""(?is)^\s*CONVERT\s+TO\s+GRAFT\s+""" + id + """\s*;?\s*$""").r
  private[plans] val Checkpoint: Regex =
    ("""(?is)^\s*CHECKPOINT\s+""" + id + """\s*;?\s*$""").r
  private[plans] val AnalyzeStats: Regex =
    ("""(?is)^\s*ANALYZE\s+TABLE\s+""" + id +
      """\s+COMPUTE\s+STATISTICS\s+FOR\s+COLUMNS\s+\(?\s*([\w,\s]+?)\s*\)?\s*;?\s*$""").r

  /** Does `name` resolve to a [[GraftCatalog]] in the active session?
    * Used at PARSE time to keep the front parser from claiming Spark's
    * own statements over other catalogs (a non-graft `ANALYZE TABLE
    * spark_catalog.db.t ...` must reach Spark's native command, not fail
    * in [[dirOf]] at run time). Resolution failures — unknown catalog,
    * no active session — answer false: the delegate owns those. */
  private[graft] def isGraftCatalog(catName: String): Boolean =
    SparkSession.getActiveSession.exists { s =>
      try s.sessionState.catalogManager.catalog(catName).isInstanceOf[GraftCatalog]
      catch { case scala.util.control.NonFatal(_) => false }
    }

  /** Resolve a three-part name through the session's catalog manager to
    * the graft table's storage dir (shared with the `table_changes` TVF). */
  private[graft] def dirOf(session: SparkSession, name: Seq[String]): String = {
    require(name.length == 3,
      s"maintenance statements need a fully-qualified <catalog>.<db>.<table> " +
        s"name, got ${name.mkString(".")}")
    val cat = session.sessionState.catalogManager.catalog(name.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"'${name.head}' is not a graft catalog (${other.getClass.getSimpleName}): " +
          "OPTIMIZE/VACUUM apply to graft txn-log tables")
    }
    cat.loadTable(Identifier.of(Array(name(1)), name(2))) match {
      case t: GraftSqlTable => t.tableDir
      case other => throw new IllegalStateException(s"unexpected table $other")
    }
  }
}

/** `OPTIMIZE t [ZORDER BY (x, y)]` — returns the version won. */
case class GraftOptimizeCommand(name: Seq[String],
                                zorder: Option[(String, String)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(session, name)
    val v = zorder match {
      case Some((x, y)) =>
        TxnLog.optimizeZorder(session, dir, x, y, numFiles = 16, tieCols = Nil)
      case None => TxnLog.clusteringOf(dir) match {
        case Some(_) => TxnLog.optimizeClustered(session, dir, numFiles = 8)
        case None    => TxnLog.compact(session, dir)
      }
    }
    Seq(Row(v))
  }
}

/** `DESCRIBE HISTORY t` — the commit ledger (version, action class,
  * manifest body size), newest first, as a statement. */
case class GraftDescribeHistoryCommand(name: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("action", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(session, name)
    TxnLog.history(session, dir).collect()
      .sortBy(-_.getLong(0))
      .map(r => Row(r.getLong(0), r.getString(1), r.getLong(2))).toSeq
  }
}

/** `DESCRIBE DETAIL t` — the table's current-state card, METADATA-ONLY
  * (no data file is opened: version, retention floor and the visible
  * file list come from the manifest chain; sizes are filesystem stat
  * calls; partition/clustering specs are catalog metadata). The Delta
  * statement of the same name, in this format's terms. */
case class GraftDescribeDetailCommand(name: Seq[String])
    extends LeafRunnableCommand {
  private def str = org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", str, nullable = false)(),
    AttributeReference("location", str, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("min_version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("partition_cols", str, nullable = false)(),
    AttributeReference("cluster_by", str, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(session, name)
    val (v, files, _) = TxnLog.fileScanPlan(dir) // resolved absolute paths
    val size = files.map(f =>
      java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum
    val partCols = GraftSqlTable.storedPartCols(dir)
    val cluster = TxnLog.clusteringOf(dir)
      .map { case (x, y, _, _) => s"$x,$y" }.getOrElse("")
    Seq(Row("graft", dir, v, TxnLog.minVersion(dir), files.size.toLong,
      size, partCols.mkString(","), cluster))
  }
}

/** `SHOW PARTITIONS <cat>.<db>.<t>` — one row per live partition of the
  * CURRENT snapshot, METADATA-ONLY: partition values are dir-encoded in
  * the manifest paths (`col=val` segments), so the listing never opens a
  * file — the property that makes it viable on a 100 TB table. Emits the
  * hive-style spec string plus the partition's visible file count. */
case class GraftShowPartitionsCommand(name: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(session, name)
    val partCols = GraftSqlTable.storedPartCols(dir)
    require(partCols.nonEmpty,
      s"${name.mkString(".")} is not a partitioned table")
    val (_, files, _) = TxnLog.fileScanPlan(dir)
    files
      .map { rel =>
        val kv = rel.split('/').filter(_.contains('='))
          .map { seg =>
            val i = seg.indexOf('=')
            (seg.take(i), java.net.URLDecoder.decode(seg.drop(i + 1), "UTF-8"))
          }.toMap
        partCols.map(c => s"$c=${kv.getOrElse(c,
          throw new IllegalStateException(
            s"file $rel lacks a dir-encoded value for partition column $c"))}")
          .mkString("/")
      }
      .groupBy(identity).toSeq.sortBy(_._1)
      .map { case (p, fs) => Row(p, fs.size.toLong) }
  }
}

/** `RESTORE TABLE t TO VERSION AS OF n` (and the `TO TIMESTAMP AS OF
  * '<ts>'` form — the literal is interpreted in UTC, matching the
  * engine's session timezone convention and the log's in-commit UTC
  * stamps) — roll the table back AS A NEW COMMIT ([[TxnLog.restore]]):
  * history stays linear, nothing is erased, and when the target snapshot
  * carries no pending vectors the restore is METADATA-ONLY (one `R`
  * manifest re-listing files that still exist — zero bytes moved at
  * 100 TB). Emits (restored_version, new_version). */
case class GraftRestoreCommand(name: Seq[String],
                               target: Either[Long, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(session, name)
    val toVersion = target match {
      case Left(v) => v
      case Right(ts) =>
        val micros = java.time.LocalDateTime
          .parse(ts.trim.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC)
        TxnLog.versionAtTimestamp(dir,
          micros.getEpochSecond * 1000000L + micros.getNano / 1000L)
    }
    val v = TxnLog.restore(session, dir, toVersion)
    Seq(Row(toVersion, v))
  }
}

/** `CREATE TABLE t2 SHALLOW CLONE t1 [VERSION AS OF n]` — fork the
  * source's (optionally version-pinned) snapshot as a NEW catalog table
  * in ONE metadata write ([[TxnLog.clone]]): the clone's initial
  * manifest references the source's data files by absolute path, zero
  * data bytes copied — a 100 TB table forks in O(manifest). Afterward
  * the tables diverge independently; a clone-side OPTIMIZE/compact
  * localizes the data. Scope: flat sources only (a hive-layout source's
  * partition values live in ITS directory tree — external references
  * would break the clone's basePath partition discovery; Delta clones
  * carry per-file partition tuples in the log, this format keeps them
  * path-encoded — refused loudly), and the clone takes the source's
  * CURRENT catalog schema (the documented contract: schema lives in the
  * catalog, data is what's versioned). Emits (version, n_files). */
case class GraftCloneCommand(dst: Seq[String], src: Seq[String],
                             asOf: Option[Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val srcDir = GraftSqlParser.dirOf(session, src)
    require(GraftSqlTable.storedPartCols(srcDir).isEmpty,
      s"SHALLOW CLONE of a partitioned table is not supported: " +
        s"${src.mkString(".")}'s partition values are dir-encoded in its " +
        "own tree and external references cannot join the clone's basePath " +
        "— compact the source to a flat layout first")
    require(dst.length == 3, s"clone destination needs a fully-qualified " +
      s"<catalog>.<db>.<table> name, got ${dst.mkString(".")}")
    val cat = session.sessionState.catalogManager.catalog(dst.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"'${dst.head}' is not a graft catalog (${other.getClass.getSimpleName})")
    }
    val ident = Identifier.of(Array(dst(1)), dst(2))
    require(!cat.tableExists(ident),
      s"clone destination ${dst.mkString(".")} already exists")
    val dstDir = cat.tableDirFor(ident)
    val v = TxnLog.clone(session, srcDir, dstDir, asOf)
    // the clone serves the source's CURRENT catalog schema; fall back to
    // the physical schema when the source predates stored-DDL metadata.
    // (No stored-schema HISTORY exists to pin a `VERSION AS OF` clone to
    // the schema as of that version — and without column mapping, which
    // clone refuses, evolution is additive: later-ADDed columns serve
    // NULL over the pinned files, same as on the source itself.)
    val schema = GraftSqlTable.storedSchema(srcDir).getOrElse(
      session.read.parquet(TxnLog.fileScanPlan(srcDir)._2.head).schema)
    cat.persistCloneMeta(dstDir, schema)
    // TBLPROPERTIES travel with the clone: a source whose DML policy or
    // vacuum retention lives in properties (graft.dml.useVectors,
    // graft.vacuum.retainVersions) must not silently lose it on fork
    val props = GraftSqlTable.storedProps(srcDir)
    if (props.nonEmpty) GraftSqlTable.persistProps(dstDir, props)
    Seq(Row(v, TxnLog.fileScanPlan(dstDir)._2.size.toLong))
  }
}

/** `CONVERT TO GRAFT <cat>.<db>.<t> [PARTITIONED BY (cols)]` — Delta's
  * CONVERT TO DELTA: turn a directory of EXISTING parquet (already at
  * the identifier's warehouse path — dropped there by a copy, a rename,
  * or a historical pipeline) into a catalog table by LISTING the files
  * into the first manifest ([[TxnLog.convertInPlace]]) — zero bytes
  * rewritten, the only viable migration for 100 TB of historical
  * parquet. Hive layouts convert with PARTITIONED BY: the top-level
  * `col=val` dirs move under `pdata/` (one rename each), landing the
  * EXACT tree the catalog's partitioned commits use — post-convert
  * INSERTs, pruning, SHOW PARTITIONS and time travel all compose as if
  * the engine had written the data. Emits (version, n_files). */
case class GraftConvertCommand(name: Seq[String], partCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    require(name.length == 3, s"CONVERT needs a fully-qualified " +
      s"<catalog>.<db>.<table> name, got ${name.mkString(".")}")
    val cat = session.sessionState.catalogManager.catalog(name.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"'${name.head}' is not a graft catalog (${other.getClass.getSimpleName})")
    }
    val ident = Identifier.of(Array(name(1)), name(2))
    require(!cat.tableExists(ident),
      s"${name.mkString(".")} is already a table")
    val dir = cat.tableDirFor(ident)
    val v = TxnLog.convertInPlace(dir, partCols)
    // register catalog metadata off the files themselves (hive reads
    // through pdata so the partition column lands in the schema)
    val schema =
      if (partCols.isEmpty) session.read.parquet(dir).schema
      else session.read.parquet(s"$dir/pdata").schema
    cat.persistMetaFor(dir, schema, partCols)
    Seq(Row(v, TxnLog.fileScanPlan(dir)._2.size.toLong))
  }
}

/** `CHECKPOINT t` — write a log checkpoint at the current version
  * ([[TxnLog.checkpoint]]): planning then reads ONE checkpoint plus the
  * commits after it instead of folding the whole manifest chain — the
  * O(commits-since-checkpoint) bound that keeps a 10⁵-commit table's
  * planning metadata-sized. Any cadence is correct; correctness never
  * depends on whether one exists. Emits the checkpointed version. */
case class GraftCheckpointCommand(name: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(session, name)
    Seq(Row(TxnLog.checkpoint(dir)))
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS c1[, c2...]` — build
  * min/max zone maps for the CURRENT snapshot's files without rewriting
  * a byte ([[TxnLog.analyzeStats]]): the statement that gives an
  * inherited/migrated 100 TB table manifest-level file skipping. One
  * metadata-sized job per call; partition columns refuse (their values
  * already prune from the path). Emits (version, n_entries). */
case class GraftAnalyzeCommand(name: Seq[String], cols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_entries", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(session, name)
    val partCols = GraftSqlTable.storedPartCols(dir).toSet
    val bad = cols.filter(partCols)
    require(bad.isEmpty,
      s"partition column(s) ${bad.mkString(", ")} prune from the file " +
        "path already — ANALYZE covers data columns")
    val n = TxnLog.analyzeStats(session, dir, cols)
    Seq(Row(TxnLog.currentVersion(dir), n))
  }
}

/** `VACUUM t RETAIN n VERSIONS` — returns the reclaimed-file count. The
  * retention clause is mandatory: a defaulted bare VACUUM would advance
  * the watermark to the head and irreversibly delete every historical
  * file — the explicitness IS the safety (Delta's retention-duration
  * guard, in this format's version-count terms). */
case class GraftVacuumCommand(name: Seq[String], retainVersions: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("reclaimed", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(session, name)
    // bare VACUUM consults the table's own retention property first —
    // the Delta `deletedFileRetentionDuration` pattern in version-count
    // terms: a table can carry its policy, and only a table with NEITHER
    // an explicit clause NOR a stored policy refuses
    val stored = GraftSqlTable.storedProps(dir)
      .get("graft.vacuum.retainVersions").map(_.toInt)
    val retain = retainVersions.orElse(stored).getOrElse(
      throw new IllegalArgumentException(
        "bare VACUUM would drop ALL history below the head: state the " +
          "retention explicitly — VACUUM <table> RETAIN <n> VERSIONS — or " +
          "store a policy: ALTER TABLE ... SET TBLPROPERTIES" +
          "('graft.vacuum.retainVersions'='<n>')"))
    require(retain >= 1, s"RETAIN must be >= 1 version, got $retain")
    Seq(Row(TxnLog.vacuum(dir, retain).size.toLong))
  }
}
