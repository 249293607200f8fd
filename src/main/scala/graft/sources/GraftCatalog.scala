package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, StagedTable, StagingTableCatalog, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.TxnLog

/** The SQL FRONT DOOR to the engine's txn-log tables (round-9 verdict
  * item 1): a DSv2 `TableCatalog`, registered as
  *
  * {{{
  *   spark.sql.catalog.<name>           = graft.sources.GraftCatalog
  *   spark.sql.catalog.<name>.warehouse = /path/to/warehouse
  * }}}
  *
  * after which every feature built on the txn log is reachable from plain
  * SQL instead of Scala calls:
  *
  *   - `SELECT ... FROM <name>.db.t` — the scan DELEGATES to Spark's own
  *     DSv2 parquet table over the snapshot's visible file list, so
  *     filter pushdown, column pruning, partition-value pruning (hive
  *     `col=val` commit layouts) and aggregate pushdown are the native
  *     engine paths, not re-implementations. The plan is the same pruned
  *     parquet scan the Scala API path (`TxnLog.read`) produces —
  *     PlanCheck pins the parity.
  *   - `... VERSION AS OF v` / `... TIMESTAMP AS OF ts` — time travel
  *     resolves through the same snapshot fold / monotone in-commit
  *     timestamp axis as the API path (q277).
  *   - `INSERT INTO` / `INSERT OVERWRITE` — writes bridge to
  *     [[TxnLog.commit]] through the connector's V1Write fallback: the
  *     full type surface (decimals, timestamps, arrays) and the atomic
  *     claim protocol are reused verbatim; OVERWRITE maps to a replace
  *     commit. The executor-parquet DSv2 write path exists too
  *     ([[TxnSink]], q285/q288) — the catalog favors the commit bridge
  *     because INSERT must accept every type the engine stores, not the
  *     sink's flat-primitive subset.
  *   - `CREATE TABLE` / `DROP TABLE` / namespace DDL — directories under
  *     the warehouse; a pre-data table persists its DDL schema in the
  *     log dir and becomes version 0 (empty scan, correct schema).
  *
  * Scan-ability contract: a snapshot with PENDING merge-on-read actions
  * (delete vectors, scoped update vectors, column renames/drops) refuses
  * the RAW file scan with an actionable error — never serve a scan that
  * silently includes deleted rows. Sessions built with the engine's
  * extensions lift the VECTOR half from SQL: [[graft.plans.MorScan]]
  * (analysis rule) inlines [[TxnLog.read]]'s anti-join plan in place of
  * the relation, so vectored tables stay readable without a compact;
  * pending column mappings still take the compact-first contract.
  *
  * The warehouse root is re-resolved from the session conf on every
  * table operation (falling back to the initialize-time option), so one
  * long-lived session can point the same catalog name at different
  * warehouses — and, at scale, so the catalog object carries no mutable
  * state beyond its name (table identity lives entirely on storage).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog {

  private var catName: String = "graft"
  private var initOpts: Map[String, String] = Map.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    initOpts = options.asScala.toMap
  }
  override def name(): String = catName

  private def warehouse: String =
    SparkSession.active.conf.getOption(s"spark.sql.catalog.$catName.warehouse")
      .orElse(initOpts.get("warehouse"))
      .getOrElse(throw new IllegalArgumentException(
        s"GraftCatalog needs spark.sql.catalog.$catName.warehouse"))

  /** Identifier segments become directory names — constrain them so an
    * identifier can never traverse outside the warehouse. */
  private def seg(s: String): String = {
    require(s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_'),
      s"identifier segment must be [A-Za-z0-9_]+: '$s'")
    s
  }
  private def dirOf(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name()).map(seg)).mkString("/")
  /** Storage dir a (possibly not-yet-existing) identifier maps to —
    * the seam `CREATE TABLE ... SHALLOW CLONE` needs: the clone command
    * materializes the destination OUTSIDE the DSv2 createTable path
    * (its initial version is a manifest of external references, not a
    * write), then registers metadata via [[persistCloneMeta]]. */
  private[graft] def tableDirFor(ident: Identifier): String = dirOf(ident)
  private[graft] def persistCloneMeta(dir: String, schema: StructType): Unit =
    persistMeta(dir, schema, Nil)
  /** Metadata registration for tables materialized OUTSIDE the DSv2
    * createTable path (SHALLOW CLONE, CONVERT TO GRAFT). */
  private[graft] def persistMetaFor(dir: String, schema: StructType,
                                    partCols: Seq[String]): Unit =
    persistMeta(dir, schema, partCols)
  private def nsDir(namespace: Array[String]): java.nio.file.Path =
    java.nio.file.Paths.get((warehouse +: namespace.map(seg)).mkString("/"))

  override def tableExists(ident: Identifier): Boolean =
    java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dirOf(ident), "_txnlog"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!java.nio.file.Files.isDirectory(d))
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    val s = java.nio.file.Files.list(d)
    try s.iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p.resolve("_txnlog")))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftSqlTable(dirOf(ident), s"$catName.${ident.toString}", None)
  }

  /** `VERSION AS OF v` (Spark hands the literal as a string). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$catName table versions are numeric commit versions, got '$version'")
    }
    new GraftSqlTable(dirOf(ident), s"$catName.${ident.toString}@v$v", Some(v))
  }

  /** `TIMESTAMP AS OF ts` (micros since epoch) — resolved on the monotone
    * in-commit timestamp axis, exactly like the API path (q277). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = dirOf(ident)
    val v = TxnLog.versionAtTimestamp(dir, timestamp)
    new GraftSqlTable(dir, s"$catName.${ident.toString}@v$v", Some(v))
  }

  /** IDENTITY partition transforms on top-level schema columns (the hive
    * layout) — everything else refused loudly. Shared by CREATE TABLE and
    * the staged CREATE/REPLACE paths. */
  private def identityPartCols(partitions: Array[Transform],
                               schema: StructType): Seq[String] =
    partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        val fn = t.references()(0).fieldNames()
        require(fn.length == 1,
          s"nested partition column not supported: ${t.describe}")
        val n = fn(0)
        require(schema.fieldNames.contains(n),
          s"partition column $n is not in the table schema")
        seg(n) // partition values become path segments — same safety rule
      case t => throw new IllegalArgumentException(
        s"only identity partition transforms are supported, got ${t.describe}")
    }

  /** Persist the catalog-owned table metadata (DDL schema + partition
    * spec) into the table's log dir. REPLACE overwrites both — including
    * REMOVING a stale partition spec when the new table is flat, so
    * later INSERTs don't route through a partition column the new
    * schema may not even hold. */
  private[sources] def persistMeta(dir: String, schema: StructType,
                                   partCols: Seq[String]): Unit = {
    val ld = java.nio.file.Paths.get(dir, "_txnlog")
    java.nio.file.Files.createDirectories(ld)
    java.nio.file.Files.write(ld.resolve("_schema.json"),
      schema.json.getBytes("UTF-8"))
    if (partCols.nonEmpty)
      java.nio.file.Files.write(ld.resolve("_partition-cols"),
        partCols.mkString("", "\n", "\n").getBytes("UTF-8"))
    else
      java.nio.file.Files.deleteIfExists(ld.resolve("_partition-cols"))
    ()
  }

  /** `CREATE TABLE [PARTITIONED BY (cols)]` — and therefore partitioned
    * CTAS: Spark drives CTAS on a non-staging catalog as createTable +
    * INSERT, and the write bridge routes partitioned tables through
    * [[TxnLog.commitPartitioned]], so the data lands in q265's hive
    * `col=val` layout and partition-pruned scans are the native DSv2
    * parquet path. (Atomic CTAS/RTAS go through the staging methods
    * below instead.) */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val partCols = identityPartCols(partitions, schema)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val dir = dirOf(ident)
    persistMeta(dir, schema, partCols)
    GraftSqlTable.persistProps(dir, userProps(properties))
    new GraftSqlTable(dir, s"$catName.${ident.toString}", None)
  }

  /** The DSv2 properties map mixes the user's TBLPROPERTIES with Spark's
    * implementation details (provider/location/owner/...) — persist only
    * the user's. */
  private def userProps(properties: util.Map[String, String]): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    properties.asScala.toMap.filter { case (k, _) =>
      !GraftSqlTable.SparkInternalProps(k) && !k.startsWith("option.")
    }
  }

  // ---- StagingTableCatalog: atomic CTAS / REPLACE / CREATE OR REPLACE ----
  //
  // Spark drives `[CREATE OR] REPLACE TABLE [AS SELECT]` on a staging
  // catalog as stage → write → commitStagedChanges (abort on any
  // failure). The txn log already has the exact primitive this needs:
  // staged data files are UNREFERENCED (invisible by protocol) until a
  // manifest claim, so the entire swap — data AND the schema/partition
  // spec — becomes visible at the single claim, and readers see the
  // pre-replace table until that instant. REPLACE commits through the
  // SAME log (an R action), so time travel back across the replace
  // works like any other replace commit; old-version reads serve their
  // own era's physical schema ([[GraftSqlTable.schema]]).

  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    stage(ident, schema, partitions, existedBefore = false, properties)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String]): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    stage(ident, schema, partitions, existedBefore = true, properties)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, existedBefore = tableExists(ident), properties)

  private def stage(ident: Identifier, schema: StructType,
                    partitions: Array[Transform], existedBefore: Boolean,
                    properties: util.Map[String, String]): StagedTable = {
    val partCols = identityPartCols(partitions, schema)
    val dir = dirOf(ident)
    // the staging write needs a directory to land files in; for a NEW
    // table this creates it (abort removes it wholly — no litter), for
    // REPLACE the existing dir is untouched until commit
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    new StagedGraftTable(this, s"$catName.${ident.toString}", dir, schema,
      partCols, existedBefore, userProps(properties))
  }

  /** SQL schema evolution (round 10):
    *
    *   - `ADD COLUMNS` is METADATA-ONLY: the served schema (persisted as
    *     `_txnlog/_schema.json`) widens; existing files simply don't
    *     store the column and reconcile to NULL by name on read — the
    *     Delta/autoMerge property that adding a column never rewrites
    *     100 TB. Scope: top-level nullable columns; the schema lives in
    *     the CATALOG (not versioned through the log), the documented
    *     Hive-metastore-style contract — time travel pins DATA, the
    *     widened schema serves every version (old snapshots read NULL).
    *   - `RENAME/DROP COLUMN` delegate to the txn log's column mapping
    *     (`M rename`/`M drop` commits — metadata-only, zero files move);
    *     the SQL scan then refuses until a rewrite materializes the
    *     mapping (`TxnLog.compact` — the reader-version discipline), and
    *     the stored DDL schema is kept in sync so the post-compact
    *     catalog schema is the renamed one. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = dirOf(ident)
    def persist(s: StructType): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "_txnlog", "_schema.json"),
        s.json.getBytes("UTF-8")); ()
    }
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "nested ADD COLUMN is not supported (top-level columns only)")
        require(a.isNullable,
          "ADD COLUMN must be nullable: existing rows fill NULL")
        val name = a.fieldNames()(0)
        val cur = new GraftSqlTable(dir, ident.toString, None).schema
        require(!cur.fieldNames.exists(_.equalsIgnoreCase(name)),
          s"column $name already exists")
        persist(cur.add(name, a.dataType(), nullable = true))
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1, "nested RENAME COLUMN is not supported")
        val old = r.fieldNames()(0)
        TxnLog.renameColumn(dir, old, r.newName)
        GraftSqlTable.storedSchema(dir).foreach(s => persist(StructType(
          s.fields.map(f => if (f.name == old) f.copy(name = r.newName) else f))))
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1, "nested DROP COLUMN is not supported")
        TxnLog.dropColumn(dir, d.fieldNames()(0))
        GraftSqlTable.storedSchema(dir).foreach(s => persist(StructType(
          s.fields.filterNot(_.name == d.fieldNames()(0)))))
      case s: TableChange.SetProperty => // ALTER TABLE ... SET TBLPROPERTIES
        GraftSqlTable.persistProps(dir,
          GraftSqlTable.storedProps(dir) + (s.property -> s.value))
      case r: TableChange.RemoveProperty => // ... UNSET TBLPROPERTIES
        GraftSqlTable.persistProps(dir,
          GraftSqlTable.storedProps(dir) - r.property)
      case c => throw new UnsupportedOperationException(
        s"ALTER TABLE change not supported: $c")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    graft.io.FsUtil.deleteRecursively(new java.io.File(dirOf(ident)))
    true
  }

  /** `ALTER TABLE ... RENAME TO ...` — a DIRECTORY-level move: table
    * identity lives entirely on storage (the log, data, DDL schema and
    * partition spec all ride inside the table dir), so the rename is one
    * atomic filesystem move, zero data bytes copied — even at 100 TB.
    * (On an object store this becomes the metastore pointer swap.) */
  override def renameTable(old: Identifier, to: Identifier): Unit = {
    // Spark hands RENAME TO's target as the user-typed multipart name —
    // which may still carry this catalog's name as its head segment, or
    // no namespace at all (unqualified target keeps the source namespace)
    val toNs = to.namespace() match {
      case ns if ns.nonEmpty && ns(0) == catName => ns.drop(1)
      case ns if ns.isEmpty                      => old.namespace()
      case ns                                    => ns
    }
    val target = Identifier.of(toNs, to.name())
    if (!tableExists(old)) throw new NoSuchTableException(old)
    if (tableExists(target)) throw new TableAlreadyExistsException(target)
    val dst = java.nio.file.Paths.get(dirOf(target))
    require(java.nio.file.Files.isDirectory(dst.getParent),
      s"target namespace ${toNs.mkString(".")} does not exist")
    java.nio.file.Files.move(java.nio.file.Paths.get(dirOf(old)), dst,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  // ---- namespaces: one directory level each under the warehouse ----

  override def listNamespaces(): Array[Array[String]] = {
    val root = java.nio.file.Paths.get(warehouse)
    if (!java.nio.file.Files.isDirectory(root)) return Array.empty
    val s = java.nio.file.Files.list(root)
    try s.iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        !java.nio.file.Files.isDirectory(p.resolve("_txnlog")))
      .map(p => Array(p.getFileName.toString))
      .toArray
    finally s.close()
  }
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(catName +: namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || java.nio.file.Files.isDirectory(nsDir(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(catName +: namespace.toSeq)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    java.nio.file.Files.createDirectories(nsDir(namespace)); ()
  }
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!java.nio.file.Files.isDirectory(d)) return false
    if (!cascade) {
      val s = java.nio.file.Files.list(d)
      val empty = try !s.iterator().hasNext finally s.close()
      require(empty, s"namespace ${namespace.mkString(".")} is not empty")
    }
    graft.io.FsUtil.deleteRecursively(d.toFile)
    true
  }
}

private[graft] object GraftSqlTable {
  /** Inferred physical schema per (dir, resolved version) — a manifest
    * chain is immutable below its current version, so the footer-derived
    * schema of a snapshot never changes and re-inferring it on EVERY
    * statement's table resolution (a fresh GraftSqlTable per loadTable)
    * was pure driver overhead on multi-statement DML lifecycles
    * (guide §7.3: planning/metadata time is driver-side, single-threaded).
    * LRU-bounded: fixture tables are temp dirs that never return. */
  private val inferredSchemaCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long), StructType](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long), StructType]): Boolean =
          size() > 256
      })

  def inferredSchemaAt(spark: org.apache.spark.sql.SparkSession, dir: String,
                       asOf: Option[Long], v: Long): StructType = {
    val k = (dir, v)
    val hit = inferredSchemaCache.get(k)
    if (hit != null) hit
    else {
      val s = graft.io.TxnLog.read(spark, dir, asOf).schema
      inferredSchemaCache.put(k, s)
      s
    }
  }

  /** DDL schema persisted by CREATE TABLE — served until the first commit
    * gives the table real files to infer from. */
  def storedSchema(dir: String): Option[StructType] = {
    val p = java.nio.file.Paths.get(dir, "_txnlog", "_schema.json")
    if (!java.nio.file.Files.exists(p)) None
    else Some(DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      .asInstanceOf[StructType])
  }

  /** Partition spec persisted by `CREATE TABLE ... PARTITIONED BY` —
    * routes every INSERT through the hive-layout commit. */
  def storedPartCols(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir, "_txnlog", "_partition-cols")
    if (!java.nio.file.Files.exists(p)) Nil
    else new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq
  }

  /** Table properties (`TBLPROPERTIES` at CREATE, `ALTER TABLE ...
    * SET/UNSET TBLPROPERTIES` after) — catalog-owned metadata like the
    * DDL schema, persisted as a java.util.Properties file (JDK escaping
    * handles arbitrary values; atomic move on write). Spark's own
    * `SHOW TBLPROPERTIES` statement serves straight from these via
    * [[GraftSqlTable.properties]]; the engine reads
    * `graft.vacuum.retainVersions` as the bare-VACUUM default. */
  def storedProps(dir: String): Map[String, String] = {
    val p = java.nio.file.Paths.get(dir, "_txnlog", "_properties")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else {
      val props = new java.util.Properties()
      val in = java.nio.file.Files.newInputStream(p)
      try props.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      props.asScala.toMap
    }
  }

  /** Spark feeds DSv2 implementation details through the same map the
    * user's TBLPROPERTIES travel in — keep only the user's. */
  private[sources] val SparkInternalProps: Set[String] =
    Set("provider", "location", "owner", "external", "is_managed_location")

  def persistProps(dir: String, props: Map[String, String]): Unit = {
    val ld = java.nio.file.Paths.get(dir, "_txnlog")
    java.nio.file.Files.createDirectories(ld)
    val target = ld.resolve("_properties")
    if (props.isEmpty) { java.nio.file.Files.deleteIfExists(target); () }
    else {
      val jp = new java.util.Properties()
      props.foreach { case (k, v) => jp.setProperty(k, v) }
      val tmp = java.nio.file.Files.createTempFile(ld, ".props-", ".tmp")
      val out = java.nio.file.Files.newOutputStream(tmp)
      try jp.store(out, null) finally out.close()
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    }
  }
}

/** One resolved (table dir, optional time-travel version). Reads delegate
  * to Spark's native DSv2 parquet table over the snapshot's file list;
  * writes bridge to the txn log's atomic commit. */
private[graft] class GraftSqlTable(dir: String, ident: String,
                                   asOf: Option[Long])
    extends Table with SupportsRead with SupportsWrite {

  private def spark = SparkSession.active

  /** Storage location — what the SQL DML rewrites ([[graft.plans.SqlDml]])
    * hand to the TxnLog primitives. */
  private[graft] def tableDir: String = dir
  /** Time-travel pin, if this resolution came from `VERSION/TIMESTAMP AS
    * OF` — DML against a pinned snapshot is refused. */
  private[graft] def timeTravel: Option[Long] = asOf

  /** Pending vectors, no mapping: [[graft.plans.MorScan]] (analysis
    * rule, sessions built with GraftExtensions) serves this resolution
    * as a merge-on-read plan instead of the raw-scan refusal below. */
  private[graft] def vectorMergeOnRead: Boolean =
    TxnLog.pendingVectorsOnly(dir, asOf)

  override def name(): String = ident

  /** Served straight from the persisted catalog metadata — Spark's own
    * `SHOW TBLPROPERTIES` statement reads this map for DSv2 tables. */
  override def properties(): util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    GraftSqlTable.storedProps(dir).asJava
  }

  /** HEAD resolutions serve the files-inferred schema reconciled with
    * the stored DDL schema: stored fields lead (in DDL order — they may
    * include metadata-only ADDed columns no file stores yet), physical
    * fields the DDL doesn't know (e.g. a Scala-side
    * `merge(evolveSchema)` widened past the catalog) append after.
    * TIME-TRAVEL resolutions serve their own era's PHYSICAL schema
    * instead: the catalog schema is current-state metadata, and applying
    * it to a pinned snapshot would silently NULL a column the old files
    * store under its pre-rename name. */
  override lazy val schema: StructType = {
    val (v, files, _) = TxnLog.fileScanPlan(dir, asOf)
    val inferred =
      if (files.nonEmpty)
        Some(GraftSqlTable.inferredSchemaAt(spark, dir, asOf, v))
      else None
    if (asOf.isDefined)
      inferred.orElse(GraftSqlTable.storedSchema(dir)).getOrElse(new StructType())
    else (GraftSqlTable.storedSchema(dir), inferred) match {
      case (Some(st), Some(inf)) =>
        StructType(st.fields ++
          inf.fields.filterNot(f => st.fieldNames.contains(f.name)))
      case (Some(st), None) => st
      case (None, Some(inf)) => inf
      case (None, None) => new StructType()
    }
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  /** The declared partition spec (identity transforms — the hive
    * layout), surfaced so DESCRIBE/SHOW and Spark's write-distribution
    * planning see the table as partitioned. */
  override def partitioning(): Array[Transform] =
    GraftSqlTable.storedPartCols(dir).toArray.map(
      org.apache.spark.sql.connector.expressions.Expressions.identity)

  /** Batch scans delegate to Spark's DSv2 parquet builder untouched (the
    * bridge wrapper forwards every pushdown mixin), and the SAME built
    * scan serves `spark.readStream.table(...)`: `toMicroBatchStream`
    * hands the pruned schema to the txn-log micro-batch source (appends
    * per commit version; `maxVersionsPerTrigger`/`startingVersion`/
    * `ignoreChanges` read options apply; the change-feed mode stays on
    * the format-based source — its extra `_change_*` columns don't fit a
    * catalog table's fixed resolution schema). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val (v, files, plain) = TxnLog.fileScanPlan(dir, asOf)
    require(plain,
      s"$ident@v$v has pending merge-on-read actions (delete vectors / " +
        "column mapping): materialize them (TxnLog.compact) before SQL " +
        "scans, or read through TxnLog.read")
    // hive-style commit layouts (the shared `pdata/col=val/...` tree the
    // catalog writes, or a single `part-<uuid>/col=val/...` commit, q265)
    // need a basePath for partition-column inference; a snapshot mixing
    // partitioned and flat files (spec evolution mid-table), or multiple
    // per-commit partition roots, is the Scala reader's domain — Spark's
    // discovery refuses conflicting bases
    val parted = files.filter(f => f.split('/').exists(_.contains('=')))
    require(parted.isEmpty || parted.sizeIs == files.size,
      s"$ident@v$v mixes partitioned and flat commits (partition-spec " +
        "evolution): read through TxnLog.read")
    val bases = parted.map { f =>
      val segs = f.split('/')
      segs.take(segs.indexWhere(_.contains('='))).mkString("/")
    }.distinct
    require(bases.sizeIs <= 1,
      s"$ident@v$v spreads partitioned files over ${bases.size} commit " +
        "roots (Scala-API commitPartitioned layout): read through " +
        "TxnLog.read, or write through the catalog (shared pdata tree)")
    val opts: Map[String, String] =
      options.asScala.toMap ++
        bases.headOption.map("basePath" -> _).toMap
    val csm = new CaseInsensitiveStringMap(opts.asJava)
    val parquetBuilder = ParquetTable(ident, spark, csm, files.toList,
      Some(schema), classOf[ParquetFileFormat]).newScanBuilder(csm)
    new org.apache.spark.sql.graftbridge.StreamCapableScanBuilder(
      parquetBuilder,
      (prunedSchema, _) => {
        require(asOf.isEmpty, s"cannot stream from time-travel snapshot $ident")
        new TxnMicroBatchStream(dir, prunedSchema,
          Option(options.get("startingVersion")).map(_.toLong).getOrElse(0L),
          Option(options.get("maxVersionsPerTrigger")).map(_.toLong)
            .getOrElse(Long.MaxValue),
          Option(options.get("ignoreChanges")).exists(_.toBoolean),
          readChangeFeed = false,
          maxFiles = Option(options.get("maxFilesPerTrigger"))
            .map(_.toLong).getOrElse(0L),
          maxBytes = Option(options.get("maxBytesPerTrigger"))
            .map(_.toLong).getOrElse(0L))
      })
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty, s"cannot write to time-travel snapshot $ident")
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write {
        // The V1 bridge hands the INSERT's query as a DataFrame (already
        // cast to the table schema by Spark's output resolution); the txn
        // log's distributed write + atomic claim does the rest. OVERWRITE
        // = replace commit (the visible set resets to this write).
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val partCols = GraftSqlTable.storedPartCols(dir)
              if (partCols.nonEmpty)
                // the SHARED hive tree: any number of commits keep one
                // basePath, so the catalog's own scan stays native
                TxnLog.commitPartitionedShared(data, dir, partCols,
                  replace = replace || overwrite)
              else TxnLog.commit(data, dir, replace = replace || overwrite)
              ()
            }
          }
        // `writeStream.toTable(...)`: the executor-parquet streaming sink
        // with atomic epoch commits under exactly-once txn markers — the
        // q285/q288 machinery, reached by table NAME instead of format +
        // path. (Streaming writes carry the sink's flat-primitive type
        // scope; the V1 batch bridge above keeps the full type surface.)
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          require(!replace, "streaming writes append; OVERWRITE is batch-only")
          new TxnStreamingWrite(dir, info.schema(), info.queryId())
        }
      }
    }
  }
}

/** The in-flight half of an atomic `[CREATE OR] REPLACE TABLE [AS
  * SELECT]` ([[GraftCatalog.stageCreate]]/`stageReplace`): the CTAS/RTAS
  * query writes THROUGH this table into unreferenced staging (the txn
  * log's ordinary invisibility window), and `commitStagedChanges` makes
  * the whole swap — data, DDL schema, partition spec — visible at one
  * manifest claim. `abortStagedChanges` deletes the staged files (and,
  * for a table that didn't exist before, the whole directory), so a
  * failed CTAS/RTAS leaves no litter and NEVER a half-visible table.
  *
  * The schema/partition-spec files land immediately before the claim
  * (the catalog's documented Hive-metastore-style contract: the DDL
  * schema is current-state metadata, data visibility is the claim); a
  * crash in that instant leaves metadata ahead of data by one commit —
  * the same window every ALTER TABLE has, and re-running the REPLACE
  * heals it. */
private[sources] class StagedGraftTable(cat: GraftCatalog, ident: String,
                                        dir: String, newSchema: StructType,
                                        partCols: Seq[String],
                                        existedBefore: Boolean,
                                        props: Map[String, String])
    extends StagedTable with SupportsWrite {

  @volatile private var staged: Vector[String] = Vector.empty
  @volatile private var wrote = false

  override def name(): String = ident
  override def schema(): StructType = newSchema
  override def partitioning(): Array[Transform] =
    partCols.toArray.map(
      org.apache.spark.sql.connector.expressions.Expressions.identity)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // RTAS plans arrive as truncate+append; the staged claim is a
      // replace commit either way, so truncate is inherently satisfied
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              staged = TxnLog.stageOnly(data, dir, partCols)
              wrote = true
            }
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    // metadata + claim back-to-back: the new DDL schema/partition spec
    // and the staged visible set become the table in one commit
    // boundary. A bare REPLACE TABLE (no AS SELECT) stages nothing and
    // commits an empty R — the truncate-to-new-schema semantics.
    cat.persistMeta(dir, newSchema, partCols)
    // REPLACE resets properties to the new statement's TBLPROPERTIES
    // (Delta's REPLACE semantics) — stale knobs must not survive a swap
    GraftSqlTable.persistProps(dir, props)
    TxnLog.claimStagedReplace(dir, staged)
    ()
  }

  override def abortStagedChanges(): Unit = {
    staged.foreach { rel =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, rel))
      // flat staging leaves an empty part-<uuid> dir; drop it too
      val parent = java.nio.file.Paths.get(dir, rel).getParent
      if (java.nio.file.Files.isDirectory(parent)) {
        val s = java.nio.file.Files.list(parent)
        val empty = try !s.iterator().hasNext finally s.close()
        if (empty) java.nio.file.Files.deleteIfExists(parent)
      }
      ()
    }
    if (!existedBefore)
      graft.io.FsUtil.deleteRecursively(new java.io.File(dir))
    ()
  }
}
