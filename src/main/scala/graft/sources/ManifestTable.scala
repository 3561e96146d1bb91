package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption, FileAlreadyExistsException}
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
  * Manifest format (line-oriented, no parser dependencies):
  * line 1 `version=<N>`, then one data-relative file path per line.
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

  /** Live file list of a snapshot (latest unless `version` given). */
  def snapshotFiles(dir: String, version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(latestVersion(dir)).getOrElse(
      throw new IllegalStateException(s"no committed version in $dir"))
    val mf = new File(manifestDir(dir), s"v$v.manifest")
    val lines = Files.readAllLines(mf.toPath)
    require(!lines.isEmpty && lines.get(0) == s"version=$v",
      s"corrupt manifest ${mf.getPath}")
    (1 until lines.size).map(lines.get(_))
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
    commit(dir, mine)
  }

  /** Commit `newFiles` (data-relative) on top of the current snapshot,
    * retrying past concurrent committers. */
  private def commit(dir: String, newFiles: Seq[String]): Long = {
    manifestDir(dir).mkdirs()
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      val base = latestVersion(dir)
      val prior = base.map(v => snapshotFiles(dir, Some(v))).getOrElse(Nil)
      val next = base.getOrElse(-1L) + 1L
      val body = (s"version=$next" +: (prior ++ newFiles)).mkString("\n") + "\n"
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
        return next
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race: re-read, retry at N+1
      }
    }
    throw new IllegalStateException(s"gave up committing to $dir after 50 conflicts")
  }
}
