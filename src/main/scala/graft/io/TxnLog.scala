package graft.io

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal TRANSACTION-LOG table format — the commit protocol that turns
  * a directory of parquet files into a table with atomic commits, crash
  * isolation, optimistic concurrency, and time travel (the Delta/Iceberg
  * core, reduced to its essentials):
  *
  *   <dir>/part-<uuid>/ *.parquet      data files, written FIRST
  *   <dir>/_txnlog/v00001.manifest     one committed version: the list of
  *                                     data files (relative paths) this
  *                                     commit ADDS
  *
  * Readers list the manifest chain and read exactly the union of listed
  * files — a data directory with no manifest entry (a writer that died
  * between data write and commit) is INVISIBLE, which is the crash-safety
  * contract. Commit claims its version by HARD-LINKING the fully-written
  * manifest into place: link(2) is atomic and fails with EEXIST if the
  * version is taken, so two racing writers serialize optimistically — the
  * loser retries under the next version number, never overwriting. (On
  * object stores the link step becomes the store's put-if-absent /
  * conditional-write primitive; everything else is unchanged.)
  *
  * Manifest format: first line is the action marker — `A` (this commit
  * ADDS its files to the visible set) or `R` (this commit REPLACES the
  * visible set with its files: the compaction/rewrite action) — followed
  * by one relative file path per line. Readers fold the manifest chain in
  * version order: A appends, R resets. Compaction is therefore just
  * `commit(read(latest), replace = true)` — old versions stay readable
  * (time travel is unaffected) while the latest view plans only the
  * compacted files.
  *
  * Scale notes: manifests are metadata-sized (file LISTS, not data); the
  * reader's planning cost is O(committed files), exactly a parquet
  * multi-path scan afterward — pushdown/pruning reach the files as usual
  * since the result IS spark.read.parquet(files).
  */
object TxnLog {

  private def logDir(dir: String): Path = Paths.get(dir, "_txnlog")

  private def manifestPath(dir: String, v: Long): Path =
    logDir(dir).resolve(f"v$v%05d.manifest")

  /** Directory listing that CLOSES the underlying stream — Files.list
    * leaks a DirectoryStream handle until GC otherwise, which a
    * long-lived executor calling this per query would exhaust. */
  private def listDir(p: Path): Array[Path] = {
    val s = Files.list(p)
    try s.toArray.map(_.asInstanceOf[Path]) finally s.close()
  }

  /** Largest committed version, 0 if none. */
  def currentVersion(dir: String): Long = {
    val ld = logDir(dir)
    if (!Files.exists(ld)) 0L
    else {
      val vs = listDir(ld).map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
      if (vs.isEmpty) 0L else vs.max
    }
  }

  /** Atomically commit `df` as the next version; returns the version won.
    * Data lands fully before any manifest is visible; the manifest is
    * hard-linked into place so readers never observe a partial one.
    * `replace = true` makes this version RESET the visible set to its own
    * files (the compaction action) instead of appending. */
  def commit(df: DataFrame, dir: String, replace: Boolean = false): Long = {
    val uuid = java.util.UUID.randomUUID().toString
    val rel = s"part-$uuid"
    df.write.mode("errorifexists").parquet(s"$dir/$rel")
    val files = new java.io.File(s"$dir/$rel").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => s"$rel/${f.getName}").sorted
    require(files.nonEmpty, "commit of an empty dataframe writes no files")
    Files.createDirectories(logDir(dir))
    val tmp = Files.createTempFile(logDir(dir), ".pending-", ".tmp")
    val marker = if (replace) "R" else "A"
    Files.write(tmp, (marker + "\n" + files.mkString("\n") + "\n").getBytes("UTF-8"))
    try {
      var v = currentVersion(dir) + 1
      while (true) {
        try {
          Files.createLink(manifestPath(dir, v), tmp) // atomic claim (EEXIST on loss)
          return v
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => v += 1 // lost the race; retry
        }
      }
      v
    } finally Files.deleteIfExists(tmp)
  }

  /** Visible file set (relative paths) at version `upto`: fold the chain —
    * A appends, R resets (legacy marker-less manifests read as adds). */
  private def visibleAt(dir: String, upto: Long): Vector[String] = {
    val ld = logDir(dir)
    require(Files.exists(ld), s"not a txnlog table (no ${ld})")
    val manifests = listDir(ld)
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n.endsWith(".manifest") &&
          n.stripPrefix("v").stripSuffix(".manifest").toLong <= upto
      }
      .sortBy(_.getFileName.toString)
    require(manifests.nonEmpty, s"no committed version <= $upto")
    manifests.foldLeft(Vector.empty[String]) { (acc, p) =>
      val lines = new String(Files.readAllBytes(p), "UTF-8").split("\n")
        .filter(_.nonEmpty).toVector
      lines.headOption match {
        case Some("R") => lines.tail
        case Some("A") => acc ++ lines.tail
        case _         => acc ++ lines
      }
    }
  }

  /** Oldest version whose data files are still on disk (advanced by
    * vacuum); reads below it fail loudly instead of hitting deleted
    * files mid-scan. */
  def minVersion(dir: String): Long = {
    val p = logDir(dir).resolve("min-version")
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").trim.toLong else 1L
  }

  /** Read the table at `asOf` (default: latest). Only manifest-listed files
    * are visible; orphaned data directories (crashed writers) are not. */
  def read(spark: SparkSession, dir: String, asOf: Option[Long] = None): DataFrame = {
    val upto = asOf.getOrElse(Long.MaxValue)
    require(upto >= minVersion(dir),
      s"version $upto was vacuumed (oldest retained: ${minVersion(dir)})")
    spark.read.parquet(visibleAt(dir, upto).map(rel => s"$dir/$rel"): _*)
  }

  /** Compact: rewrite the current visible set as one replace-commit.
    * Prior versions remain time-travel-readable; the latest view plans
    * only the compacted files (the small-file maintenance pass — q186
    * plans WHICH files to bin, this executes the rewrite). `numFiles > 0`
    * coalesces the rewrite to that many files (the OPTIMIZE target-size
    * dial, reduced to a count). */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 0): Long = {
    val cur = read(spark, dir).localCheckpoint()
    commit(if (numFiles > 0) cur.coalesce(numFiles) else cur, dir, replace = true)
  }

  /** Row-level DELETE, copy-on-write: rewrite the visible set without the
    * matching rows as one replace-commit. The pre-delete version stays
    * time-travel-readable until vacuumed — exactly the recovery story
    * real formats sell. (Merge-on-read — delete vectors — is the
    * documented at-scale refinement; copy-on-write is the semantics.) */
  def delete(spark: SparkSession, dir: String, predicate: String): Long =
    commit(read(spark, dir)
      .filter(org.apache.spark.sql.functions.not(
        org.apache.spark.sql.functions.expr(predicate)))
      .localCheckpoint(), dir, replace = true)

  /** DESCRIBE HISTORY: one row per committed version — (version, action,
    * n_files) parsed from the manifest chain. Metadata-only (no data file
    * is opened), so it works on vacuumed prefixes too. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val ld = logDir(dir)
    require(Files.exists(ld), s"not a txnlog table (no ${ld})")
    val rows = listDir(ld)
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n.endsWith(".manifest")
      }
      .sortBy(_.getFileName.toString)
      .map { p =>
        val n = p.getFileName.toString
        val v = n.stripPrefix("v").stripSuffix(".manifest").toLong
        val lines = new String(Files.readAllBytes(p), "UTF-8").split("\n")
          .filter(_.nonEmpty).toVector
        val (action, files) = lines.headOption match {
          case Some("R") => ("R", lines.tail)
          case Some("A") => ("A", lines.tail)
          case _         => ("A", lines)
        }
        (v, action, files.length.toLong)
      }
    import spark.implicits._
    rows.toSeq.toDF("version", "action", "n_files")
  }

  /** Vacuum: delete data files no retained version references, advancing
    * the min-version watermark so vacuumed as-of reads fail LOUDLY at
    * planning time rather than mid-scan on a missing file. Retains the
    * newest `retainVersions` versions' visible sets (manifests — metadata
    * — are kept forever; only data files are reclaimed). After an A-only
    * chain this is a no-op (every file is still referenced); after a
    * replace-commit it reclaims the pre-compaction files. Single-writer
    * maintenance op by contract, and it must NOT run concurrently with an
    * in-flight commit: a commit's data files land before its manifest, so
    * a racing vacuum would reclaim them as orphans (real formats close
    * this with a file-age retention threshold; the contract here keeps
    * the essential-protocol scope). Returns the deleted relative paths. */
  def vacuum(dir: String, retainVersions: Int = 1): Seq[String] = {
    require(retainVersions >= 1, "must retain at least the current version")
    val cur = currentVersion(dir)
    require(cur > 0, "nothing committed")
    val newMin = math.max(minVersion(dir), cur - retainVersions + 1)
    val keep = (newMin to cur).flatMap(v => visibleAt(dir, v)).toSet
    val partDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("part-"))
    val victims = partDirs.flatMap { pd =>
      pd.listFiles()
        .filter(f => f.getName.endsWith(".parquet") &&
          !keep.contains(s"${pd.getName}/${f.getName}"))
        .map(f => s"${pd.getName}/${f.getName}")
    }.toSeq
    // watermark FIRST: a reader that races the deletes already sees the
    // new floor and refuses vacuumed versions
    val tmp = Files.createTempFile(logDir(dir), ".minv-", ".tmp")
    Files.write(tmp, (newMin.toString + "\n").getBytes("UTF-8"))
    Files.move(tmp, logDir(dir).resolve("min-version"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    victims.foreach(rel => Files.deleteIfExists(Paths.get(dir, rel)))
    partDirs.foreach(pd => if (pd.listFiles().forall(f =>
      f.getName.startsWith("_") || f.getName.startsWith("."))) {
      pd.listFiles().foreach(_.delete()); pd.delete()
    })
    victims
  }
}
