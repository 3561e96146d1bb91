package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.File
import java.nio.file.{Files, Paths, FileAlreadyExistsException}
import java.util.UUID

/** Minimal manifest-committed parquet table — the commit protocol
  * behind Delta/Iceberg, reduced to its load-bearing core:
  *
  *  - WRITERS stage part files into `data/txn-<uuid>/` (never visible
  *    by path), then COMMIT by atomically creating
  *    `_manifest/v<N>.manifest` listing every live file. The manifest
  *    create is rename-based (no REPLACE_EXISTING), so two writers
  *    racing to the same version see exactly one winner — the loser
  *    gets FileAlreadyExistsException, re-reads the new latest, and
  *    retries at N+1 with ITS OWN files still staged (append never
  *    loses data to a conflict, it just re-sequences).
  *  - READERS list `_manifest/`, take the highest version (or a
  *    requested one — time travel), and plan EXACTLY the listed files.
  *    Data files from crashed or in-flight writers are invisible until
  *    a manifest names them: no half-written table states, ever.
  *
  * Scale shape: a commit is O(live files) metadata, independent of row
  * count; readers never LIST the data directory (the object-store
  * eventual-consistency trap), they read the manifest. On a real
  * object store the atomic-create primitive would be a conditional PUT
  * (If-None-Match) — the protocol is unchanged.
  *
  * Maintenance completes the protocol: [[compact]] rewrites the
  * snapshot as a REPLACING commit pinned to the version it read
  * (a concurrent append aborts and restarts the rewrite — it is never
  * erased), and [[vacuum]] bounds time travel and deletes every data
  * file no surviving manifest names (compacted-away files and
  * crashed-writer orphans alike).
  *
  * Manifest format (line-oriented, no parser dependencies):
  * line 1 `version=<N>`, then one data-relative file path or
  * `txn=<writer>:<batch>` idempotence marker per line.
  */
object ManifestTable {

  private def manifestDir(dir: String) = new File(dir, "_manifest")
  private def dataDir(dir: String) = new File(dir, "data")

  private def versionOf(f: File): Option[Long] = {
    val n = f.getName
    if (n.startsWith("v") && n.endsWith(".manifest"))
      n.stripPrefix("v").stripSuffix(".manifest").toLongOption
    else None
  }

  /** Highest committed version, if any commit exists. */
  def latestVersion(dir: String): Option[Long] = {
    val fs = Option(manifestDir(dir).listFiles()).getOrElse(Array.empty)
    fs.flatMap(versionOf).sorted.lastOption
  }

  /** All manifest body lines of a snapshot: data-relative file paths
    * plus `txn=<writer>:<batch>` idempotence markers. */
  private def snapshotLines(dir: String, version: Option[Long]): Seq[String] = {
    val v = version.orElse(latestVersion(dir)).getOrElse(
      throw new IllegalStateException(s"no committed version in $dir"))
    val mf = new File(manifestDir(dir), s"v$v.manifest")
    val lines = Files.readAllLines(mf.toPath)
    require(!lines.isEmpty && lines.get(0) == s"version=$v",
      s"corrupt manifest ${mf.getPath}")
    (1 until lines.size).map(lines.get(_))
  }

  /** Live file list of a snapshot (latest unless `version` given). */
  def snapshotFiles(dir: String, version: Option[Long] = None): Seq[String] =
    snapshotLines(dir, version).filterNot(_.startsWith("txn="))

  /** Batch ids a writer has already committed (latest snapshot). */
  def committedBatches(dir: String, writer: String): Set[Long] =
    latestVersion(dir) match {
      case None => Set.empty
      case Some(v) => snapshotLines(dir, Some(v))
        .filter(_.startsWith(s"txn=$writer:"))
        .map(_.stripPrefix(s"txn=$writer:").toLong).toSet
    }

  /** Read a snapshot: exactly the manifest-listed files, nothing else. */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): DataFrame = {
    val paths = snapshotFiles(dir, version)
      .map(rel => new File(dataDir(dir), rel).getPath)
    spark.read.parquet(paths: _*)
  }

  /** Stage `df` as parquet and commit it appended to the latest
    * snapshot. Returns the committed version. Retries on version
    * conflicts; the staged files are written exactly once. */
  def append(spark: SparkSession, df: DataFrame, dir: String): Long = {
    val txn = s"txn-${UUID.randomUUID()}"
    val stage = new File(dataDir(dir), txn)
    df.write.parquet(stage.getPath)
    val mine = Option(stage.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => s"$txn/${f.getName}").toSeq.sorted
    commit(dir, mine, Nil).get // no skip condition: always commits
  }

  /** Exactly-once streaming append (the Delta `txn` appId/version
    * pattern): commit `df` tagged `txn=<writer>:<batchId>`; if the
    * latest snapshot already carries that marker — a foreachBatch
    * RETRY of a batch whose commit landed before the failure — skip,
    * leaving the table unchanged. The check re-runs inside the commit
    * retry loop, so a concurrent duplicate of the same batch cannot
    * slip past a version conflict. Returns the version, None if
    * skipped as already-committed. */
  def appendIdempotent(spark: SparkSession, df: DataFrame, dir: String,
                       writer: String, batchId: Long): Option[Long] = {
    if (committedBatches(dir, writer).contains(batchId)) return None
    val txn = s"txn-${UUID.randomUUID()}"
    val stage = new File(dataDir(dir), txn)
    df.write.parquet(stage.getPath)
    val mine = Option(stage.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => s"$txn/${f.getName}").toSeq.sorted
    commit(dir, mine, Seq(s"txn=$writer:$batchId"),
      skipIfTxn = Some((writer, batchId)))
  }

  /** Rewrite the current snapshot into `targetFiles` files and commit
    * a REPLACING manifest — the compaction half of the protocol. The
    * replace must not erase a concurrent append, so the commit is
    * pinned to the exact version that was read: if any other commit
    * lands first, the attempt aborts and the whole rewrite restarts
    * from the new latest (optimistic concurrency, the same rule Delta
    * applies to full-table rewrites). Older versions keep their file
    * lists — time travel is intact until [[vacuum]] — and txn
    * idempotence markers are carried forward, so a streaming writer's
    * retried batch stays a no-op across compactions. */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 1): Long = {
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val parent = latestVersion(dir).getOrElse(
        throw new IllegalStateException(s"nothing to compact in $dir"))
      val txns = snapshotLines(dir, Some(parent)).filter(_.startsWith("txn="))
      val txn = s"txn-${UUID.randomUUID()}"
      val stage = new File(dataDir(dir), txn)
      read(spark, dir, Some(parent)).repartition(targetFiles)
        .write.parquet(stage.getPath)
      val mine = Option(stage.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(f => s"$txn/${f.getName}").toSeq.sorted
      val next = parent + 1L
      val body = (s"version=$next" +: (mine ++ txns)).mkString("\n") + "\n"
      val tmp = Paths.get(manifestDir(dir).getPath, s".tmp-${UUID.randomUUID()}")
      Files.write(tmp, body.getBytes("UTF-8"))
      val target = Paths.get(manifestDir(dir).getPath, s"v$next.manifest")
      try {
        Files.createLink(target, tmp)
        Files.deleteIfExists(tmp)
        return next
      } catch {
        case _: FileAlreadyExistsException =>
          // someone committed on top of `parent` — replacing now would
          // erase their rows; drop the stale rewrite, restart from the
          // new latest
          Files.deleteIfExists(tmp)
          deleteRec(stage)
      }
    }
    throw new IllegalStateException(s"gave up compacting $dir after 20 conflicts")
  }

  /** Garbage-collect unreferenced data files. Keeps the newest
    * `keepVersions` manifests (≥1): older manifests are deleted first
    * (bounding time travel), then every data file referenced by NO
    * surviving manifest goes — which covers both compacted-away files
    * and crashed-writer orphans that never made a manifest. Returns
    * (files deleted, manifests deleted). Safe against the read path:
    * readers only ever open files their manifest names, and surviving
    * manifests' files are never touched. */
  def vacuum(dir: String, keepVersions: Int = 1): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val versions = Option(manifestDir(dir).listFiles()).getOrElse(Array.empty)
      .flatMap(f => versionOf(f).map(_ -> f)).sortBy(_._1)
    if (versions.isEmpty) return (0, 0)
    val (drop, keep) = versions.splitAt(math.max(0, versions.length - keepVersions))
    drop.foreach { case (_, f) => f.delete(): Unit }
    val live: Set[String] = keep.flatMap { case (v, _) =>
      snapshotFiles(dir, Some(v))
    }.toSet
    var removed = 0
    for {
      txnDir <- Option(dataDir(dir).listFiles()).getOrElse(Array.empty)
      if txnDir.isDirectory
      f <- Option(txnDir.listFiles()).getOrElse(Array.empty)
    } {
      val rel = s"${txnDir.getName}/${f.getName}"
      if (!live.contains(rel)) { if (f.delete()) removed += 1 }
    }
    // drop now-empty txn dirs
    Option(dataDir(dir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && Option(d.listFiles()).exists(_.isEmpty))
      .foreach(_.delete(): Unit)
    (removed, drop.length)
  }

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }

  /** Commit `newFiles` (data-relative) + `newTxns` markers on top of
    * the current snapshot, retrying past concurrent committers. */
  private def commit(dir: String, newFiles: Seq[String], newTxns: Seq[String],
                     skipIfTxn: Option[(String, Long)] = None): Option[Long] = {
    manifestDir(dir).mkdirs()
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      // re-check idempotence EVERY attempt: the committer we just lost
      // a version race to may have been a duplicate of this very batch
      skipIfTxn.foreach { case (wtr, b) =>
        if (committedBatches(dir, wtr).contains(b)) return None
      }
      val base = latestVersion(dir)
      val prior = base.map(v => snapshotLines(dir, Some(v))).getOrElse(Nil)
      val next = base.getOrElse(-1L) + 1L
      val body = (s"version=$next" +: (prior ++ newFiles ++ newTxns)).mkString("\n") + "\n"
      val tmp = Paths.get(manifestDir(dir).getPath, s".tmp-${UUID.randomUUID()}")
      Files.write(tmp, body.getBytes("UTF-8"))
      val target = Paths.get(manifestDir(dir).getPath, s"v$next.manifest")
      try {
        // atomic create-if-absent: hard-link the fully-written temp to
        // the version name. NOT a rename — POSIX rename(2) silently
        // REPLACES an existing target, which would let two committers
        // both "win" a version; link(2) fails with EEXIST, giving
        // exactly one winner. Readers never see a partial manifest
        // because the link appears fully formed. On an object store
        // this maps to a conditional PUT (If-None-Match: *).
        Files.createLink(target, tmp)
        Files.deleteIfExists(tmp)
        return Some(next)
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race: re-read, retry at N+1
      }
    }
    throw new IllegalStateException(s"gave up committing to $dir after 50 conflicts")
  }
}
