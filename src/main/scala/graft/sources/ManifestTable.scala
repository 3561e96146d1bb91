package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.File
import java.nio.file.{Files, Paths, FileAlreadyExistsException}
import java.util.UUID

/** Minimal manifest-committed parquet table — the commit protocol
  * behind Delta/Iceberg, reduced to its load-bearing core, with the
  * DELTA-LOG structure that makes it hold at warehouse scale:
  *
  *  - WRITERS stage part files into `data/txn-<uuid>/` (never visible
  *    by path), then COMMIT by atomically creating
  *    `_manifest/v<N>.manifest` carrying ONLY that commit's actions
  *    (`add=` lines, `txn=` idempotence markers, or a `reset` for a
  *    replacing rewrite) — commit metadata is **O(this batch)**, not
  *    O(table). A full-snapshot rewrite per commit would make the
  *    millionth-file table pay its whole history on every append;
  *    that is the design this replaces.
  *  - The manifest create is link-based (no overwrite), so two writers
  *    racing to the same version see exactly one winner — the loser
  *    gets FileAlreadyExistsException, re-reads the new latest, and
  *    retries at N+1 with ITS OWN files still staged (append never
  *    loses data to a conflict, it just re-sequences).
  *  - READERS reconstruct a snapshot by folding the log — from the
  *    newest `v<K>.checkpoint` at or below the target version (a full
  *    snapshot the writer drops every [[CheckpointInterval]] commits),
  *    then each manifest up to the target. Fold cost is O(one
  *    checkpoint + ≤interval manifests), never O(history). Data files
  *    from crashed or in-flight writers are invisible until a manifest
  *    names them: no half-written table states, ever.
  *
  * Scale shape: appends are O(batch) metadata; reads are O(snapshot +
  * interval); readers never LIST the data directory (the object-store
  * eventual-consistency trap). On a real object store the atomic
  * create primitive maps to a conditional PUT (If-None-Match: *) —
  * the protocol is unchanged.
  *
  * Maintenance completes the protocol: [[compact]] rewrites the
  * snapshot as a `reset`+adds commit pinned to the version it read
  * (a concurrent append aborts and restarts the rewrite — it is never
  * erased), and [[vacuum]] bounds time travel and deletes every data
  * file no surviving version references (compacted-away files and
  * crashed-writer orphans alike).
  *
  * Log format (line-oriented, no parser dependencies): line 1
  * `version=<N>`, then per line `add=<data-relative path>`,
  * `remove=<data-relative path>` (drops that file from the folded
  * set — the O(affected) half of copy-on-write DELETE/MERGE),
  * `txn=<writer>:<batch>`, `cdf=<data-relative path>` (a CHANGE-DATA
  * file the commit wrote alongside its rewrite — rows + a baked-in
  * `_change_type` column; never part of the folded snapshot, served
  * only by [[readChanges]]), `op=<NAME>` (writer-stamped commitInfo,
  * served by [[history]] — DESCRIBE HISTORY; never snapshot state),
  * or `reset` (clears the folded file set;
  * txn markers always survive — a streaming writer's retried batch
  * must stay a no-op across compactions). A `v<N>.checkpoint` holds
  * the FOLDED state at N in the same format (removes already
  * applied; cdf entries are interval-scoped and never checkpointed),
  * so checkpoints stay the only O(table) metadata writes.
  */
object ManifestTable {

  /** Write a full checkpoint every this many commits. */
  val CheckpointInterval = 10

  private def manifestDir(dir: String) = new File(dir, "_manifest")
  private def dataDir(dir: String) = new File(dir, "data")

  private def versionOf(f: File, suffix: String): Option[Long] = {
    val n = f.getName
    if (n.startsWith("v") && n.endsWith(suffix))
      n.stripPrefix("v").stripSuffix(suffix).toLongOption
    else None
  }

  /** Highest committed version, if any commit exists. */
  def latestVersion(dir: String): Option[Long] = {
    val fs = Option(manifestDir(dir).listFiles()).getOrElse(Array.empty)
    fs.flatMap(versionOf(_, ".manifest")).sorted.lastOption
  }

  private case class State(files: Vector[String], txns: Set[String],
                           schema: Option[String])

  private def readLog(f: File, expectVersion: Long): Seq[String] = {
    val lines = Files.readAllLines(f.toPath)
    require(!lines.isEmpty && lines.get(0) == s"version=$expectVersion",
      s"corrupt log file ${f.getPath}")
    (1 until lines.size).map(lines.get(_))
  }

  /** Fold the log into the snapshot state at `target`: newest
    * checkpoint ≤ target, then each manifest up to target. Every
    * version in (checkpoint, target] must exist — [[vacuum]] preserves
    * this invariant by checkpointing before it drops history. */
  private def fold(dir: String, target: Long): State = {
    val md = manifestDir(dir)
    val ckpt = Option(md.listFiles()).getOrElse(Array.empty)
      .flatMap(versionOf(_, ".checkpoint")).filter(_ <= target).sorted.lastOption
    var files = Vector.empty[String]
    var txns = Set.empty[String]
    var schema = Option.empty[String]
    def apply(lines: Seq[String]): Unit = lines.foreach {
      case "reset" => files = Vector.empty
      case l if l.startsWith("add=") => files :+= l.stripPrefix("add=")
      case l if l.startsWith("remove=") =>
        // match on the bare path: the live entry may carry a stats suffix
        val rel = l.stripPrefix("remove=")
        files = files.filterNot(_.takeWhile(_ != '|') == rel)
      case l if l.startsWith("txn=") => txns += l.stripPrefix("txn=")
      case l if l.startsWith("schema=") => schema = Some(l.stripPrefix("schema="))
      case l if l.startsWith("cdf=") => () // change-data files: feed-only, never snapshot state
      case l if l.startsWith("op=") => ()  // commitInfo: introspection-only, never snapshot state
      case l => throw new IllegalStateException(s"unknown log action: $l")
    }
    ckpt.foreach { c => apply(readLog(new File(md, s"v$c.checkpoint"), c)) }
    val from = ckpt.map(_ + 1).getOrElse(0L)
    (from to target).foreach { v =>
      val mf = new File(md, s"v$v.manifest")
      if (!mf.isFile)
        throw new IllegalStateException(
          s"version $v missing from the log of $dir (vacuumed past it?)")
      apply(readLog(mf, v))
    }
    State(files, txns, schema)
  }

  private def resolved(dir: String, version: Option[Long]): Long =
    version.orElse(latestVersion(dir)).getOrElse(
      throw new IllegalStateException(s"no committed version in $dir"))

  /** Live file list of a snapshot (latest unless `version` given).
    * Paths only — any `|stat=..` stats suffix is stripped. */
  def snapshotFiles(dir: String, version: Option[Long] = None): Seq[String] =
    fold(dir, resolved(dir, version)).files.map(_.takeWhile(_ != '|'))

  /** Live files with their per-column (min, max) stats recorded at
    * [[appendWithStats]] time (Iceberg-style per-column bounds; empty
    * map for files committed without stats). Entry format:
    * `<rel>` followed by metadata segments in any order:
    * `|rows=<n>` (exact row count), `|stat=<col>:<min>:<max>`,
    * `|bloom=<col>:<m>:<k>:<hex>` (a per-file Bloom filter for
    * point-lookup skipping — see [[BloomIndex]]). Unknown segments are
    * ignored by every reader, so the format is forward-extensible. */
  private def parseStatsEntry(entry: String): (String, Map[String, (Long, Long)]) = {
    val parts = entry.split('|')
    val stats = parts.iterator.drop(1).collect {
      case p if p.startsWith("stat=") =>
        p.stripPrefix("stat=").split(':') match {
          case Array(c, mn, mx) => c -> ((mn.toLong, mx.toLong))
          case bad => throw new IllegalStateException(
            s"corrupt stat segment '${bad.mkString(":")}' in $entry")
        }
    }.toMap
    (parts(0), stats)
  }

  /** (rel, exact row count) per live file — Some only for entries that
    * recorded `rows=` at commit time ([[appendWithStats]] /
    * [[appendEvolving]]-with-stats / stats-carrying rewrites). */
  def snapshotRowCounts(dir: String, version: Option[Long] = None)
      : Seq[(String, Option[Long])] =
    fold(dir, resolved(dir, version)).files.map { e =>
      val parts = e.split('|')
      val rows = parts.iterator.drop(1)
        .find(_.startsWith("rows=")).map(_.stripPrefix("rows=").toLong)
      (parts(0), rows)
    }

  /** COUNT(*) answered purely from manifest metadata — zero data-file
    * reads (the Iceberg/Delta metadata-only aggregate): the sum of the
    * per-file `rows=` counts, defined only when EVERY live file
    * recorded one (a stats-less append in the history makes the count
    * unknowable without a scan → None, caller falls back to a read).
    * Row counts are exact at write time and copy-on-write keeps them
    * exact: DELETE/MERGE rewrite affected files with fresh counts and
    * never mutate a counted file in place. */
  def countMeta(dir: String, version: Option[Long] = None): Option[Long] = {
    val counts = snapshotRowCounts(dir, version)
    if (counts.forall(_._2.isDefined)) Some(counts.iterator.map(_._2.get).sum)
    else None
  }

  /** Global (min, max) of `statCol` answered purely from manifest
    * metadata — defined only when EVERY live file carries bounds for
    * the column (one unknown file could widen either end). Per-file
    * bounds are the exact min/max of the file's rows at write time,
    * so folding them is the exact table min/max, not an estimate.
    * None also for the zero-file snapshot (no rows → no extrema). */
  def rangeMeta(dir: String, statCol: String,
                version: Option[Long] = None): Option[(Long, Long)] = {
    val statted = snapshotFilesWithStats(dir, version)
    if (statted.isEmpty || !statted.forall(_._2.contains(statCol))) None
    else Some((statted.iterator.map(_._2(statCol)._1).min,
      statted.iterator.map(_._2(statCol)._2).max))
  }

  def snapshotFilesWithStats(dir: String, version: Option[Long] = None)
      : Seq[(String, Map[String, (Long, Long)])] =
    fold(dir, resolved(dir, version)).files.map(parseStatsEntry)

  /** Batch ids a writer has already committed (latest snapshot). */
  def committedBatches(dir: String, writer: String): Set[Long] =
    latestVersion(dir) match {
      case None => Set.empty
      case Some(v) => fold(dir, v).txns
        .filter(_.startsWith(s"$writer:"))
        .map(_.stripPrefix(s"$writer:").toLong)
    }

  /** The table schema RECORDED at `version` (latest if omitted) by
    * [[appendEvolving]]'s `schema=` actions — None for tables that
    * never evolved (their files all share one schema). Time travel
    * resolves to the schema as of that version: reading v3 of a table
    * that evolved at v5 presents v3's columns. Every column comes back
    * NULLABLE regardless of how the recording batch declared it: any
    * column can predate some live file and NULL-backfill, and a
    * non-nullable long read through a null-blind path would silently
    * surface as 0. */
  def tableSchema(dir: String, version: Option[Long] = None)
      : Option[org.apache.spark.sql.types.StructType] =
    fold(dir, resolved(dir, version)).schema.map(j =>
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .fields.map(_.copy(nullable = true))))

  /** Parquet reader pinned to the schema recorded at `version`, plain
    * reader when none — EVERY path that reads committed data files
    * (snapshot read, change feed, delete/merge rewrites) must come
    * through here: an unpinned read of files spanning a schema
    * evolution takes whichever footer parquet samples first, silently
    * dropping (or crashing on) the evolved column. */
  private def pinnedReader(spark: SparkSession, dir: String,
                           version: Option[Long]): org.apache.spark.sql.DataFrameReader =
    tableSchema(dir, version) match {
      case Some(st) => spark.read.schema(st)
      case None => spark.read
    }

  /** Resolve a wall-clock timestamp to a version — Delta's
    * `timestampAsOf` rule: the LATEST version whose commit time is ≤
    * `tsMillis`. Commit time is the manifest file's mtime (what Delta
    * itself uses), repaired to be non-decreasing the way Delta's
    * history reconstruction does (clock skew between writers can
    * stamp v5 older than v4 — the later VERSION still wins, so a
    * non-monotonic mtime is lifted to its predecessor's + 1 ms).
    * Throws when `tsMillis` predates the first commit (no snapshot
    * existed yet — silently serving v0 would fabricate history). */
  def versionAtTimestamp(dir: String, tsMillis: Long): Long = {
    val md = manifestDir(dir)
    val byVersion = Option(md.listFiles()).getOrElse(Array.empty)
      .flatMap(f => versionOf(f, ".manifest").map(_ -> f.lastModified()))
      .sortBy(_._1)
    if (byVersion.isEmpty)
      throw new IllegalStateException(s"no committed version in $dir")
    var last = Long.MinValue
    val adjusted = byVersion.map { case (v, ts) =>
      val t = math.max(ts, if (last == Long.MinValue) ts else last + 1)
      last = t
      (v, t)
    }
    val at = adjusted.filter(_._2 <= tsMillis)
    if (at.isEmpty)
      throw new IllegalStateException(
        s"timestamp $tsMillis predates the first commit of $dir " +
          s"(earliest ${adjusted.head._2})")
    at.last._1
  }

  /** [[read]] pinned to the snapshot as of a wall-clock timestamp. */
  def readAsOf(spark: SparkSession, dir: String, tsMillis: Long): DataFrame =
    read(spark, dir, Some(versionAtTimestamp(dir, tsMillis)))

  /** One commit's audit row — see [[history]]. */
  final case class CommitInfo(version: Long, op: String,
                              adds: Int, removes: Int, changeFiles: Int,
                              reset: Boolean, schemaChange: Boolean,
                              txns: Seq[String], timestampMs: Long)

  /** DESCRIBE HISTORY — the commit log as data, newest first: every
    * SURVIVING version's operation (the writer-stamped `op=` action;
    * commits from before the stamp — or hand-written logs — classify
    * from their action shape: reset → REPLACE, removes → REWRITE,
    * adds → APPEND, else MARKERS), its action census, and its
    * wall-clock time (manifest mtime, the [[versionAtTimestamp]]
    * clock). Metadata-only: O(surviving manifests) small files, zero
    * data reads — what an operator pages through before trusting a
    * RESTORE target or auditing who deleted what, when. */
  def history(dir: String, limit: Int = Int.MaxValue): Seq[CommitInfo] = {
    val md = manifestDir(dir)
    Option(md.listFiles()).getOrElse(Array.empty)
      .flatMap(f => versionOf(f, ".manifest").map(_ -> f))
      .sortBy(-_._1).take(limit)
      .map { case (v, f) =>
        val lines = readLog(f, v)
        val adds = lines.count(_.startsWith("add="))
        val removes = lines.count(_.startsWith("remove="))
        val cdfs = lines.count(_.startsWith("cdf="))
        val reset = lines.contains("reset")
        val op = lines.find(_.startsWith("op=")).map(_.stripPrefix("op="))
          .getOrElse(
            if (reset) "REPLACE"
            else if (removes > 0) "REWRITE"
            else if (adds > 0) "APPEND"
            else "MARKERS")
        CommitInfo(v, op, adds, removes, cdfs, reset,
          lines.exists(_.startsWith("schema=")),
          lines.collect { case l if l.startsWith("txn=") => l.stripPrefix("txn=") },
          f.lastModified())
      }.toSeq
  }

  /** Read a snapshot: exactly the manifest-listed files, nothing else.
    * When the log records a schema ([[appendEvolving]]), the read is
    * pinned to the schema AS OF the target version: columns a file
    * predates resolve to NULL (parquet schema evolution), columns a
    * later version added are absent from an older snapshot. */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): DataFrame = {
    val paths = snapshotFiles(dir, version)
      .map(rel => new File(dataDir(dir), rel).getPath)
    pinnedReader(spark, dir, version).parquet(paths: _*)
  }

  /** Stage `df` as parquet under a fresh txn dir; returns the
    * data-relative part-file paths. */
  private def stageFiles(df: DataFrame, dir: String): Seq[String] = {
    val txn = s"txn-${UUID.randomUUID()}"
    val stage = new File(dataDir(dir), txn)
    df.write.parquet(stage.getPath)
    Option(stage.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => s"$txn/${f.getName}").toSeq.sorted
  }

  /** Stage `df` as parquet and commit it appended to the latest
    * snapshot. Returns the committed version. Retries on version
    * conflicts; the staged files are written exactly once. */
  def append(spark: SparkSession, df: DataFrame, dir: String): Long =
    commit(dir, stageFiles(df, dir).map("add=" + _) :+ "op=APPEND").get

  /** Compute `add=` actions for freshly staged files, recording
    * per-file per-column (min, max) of the given long columns —
    * Iceberg-style multi-column bounds. One aggregation pass over the
    * staged batch (grouped by input file), O(batch) like the commit.
    * Zero-row part files are DROPPED from the actions: they carry no
    * data, and a stats-less entry would never be pruned out of any
    * future plan. */
  /** Legal stats-column names: anything else could collide with the
    * log's own `|` / `:` delimiters and write an entry that only
    * fails at snapshot-read time as "corrupt stat segment". */
  private val StatColName = "[A-Za-z0-9_]+".r

  private def statAddActions(spark: SparkSession, dir: String,
                             rels: Seq[String], statCols: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    if (rels.isEmpty) return Nil
    statCols.foreach { c =>
      require(StatColName.matches(c),
        s"stats column name '$c' must match [A-Za-z0-9_]+ — " +
          "'|' or ':' would corrupt the manifest entry")
    }
    // ONE reader over the staged paths serves both the up-front type
    // validation (a non-long stats column would ClassCastException
    // mid-collect otherwise) and the min/max aggregation
    val staged = spark.read.parquet(
      rels.map(r => new File(dataDir(dir), r).getPath): _*)
    statCols.foreach { c =>
      val f = staged.schema.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"stats column '$c' is not in the staged batch's schema " +
            s"(${staged.schema.fieldNames.mkString(", ")})"))
      require(f.dataType == org.apache.spark.sql.types.LongType,
        s"stats column '$c' must be LongType, found ${f.dataType.simpleString}")
    }
    import org.apache.spark.sql.functions.{count, lit}
    // row count first, then per-column bounds — the exact count feeds
    // [[countMeta]]'s metadata-only aggregates at zero extra passes
    val aggs = count(lit(1)).as("_rows") +: statCols.flatMap(c =>
      Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c")))
    val byFile = staged
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per non-empty staged part file — batch-bounded
      .map { r =>
        val name = new File(r.getString(0)).getName
        // an all-NULL column in a part file has null bounds — record
        // no stat for that (file, column); unknown ranges never prune
        val stats = statCols.zipWithIndex.collect {
          case (c, i) if !r.isNullAt(2 + 2 * i) && !r.isNullAt(3 + 2 * i) =>
            s"stat=$c:${r.getLong(2 + 2 * i)}:${r.getLong(3 + 2 * i)}"
        }
        name -> (s"rows=${r.getLong(1)}" +: stats).mkString("|")
      }.toMap
    rels.flatMap { rel =>
      // absent from byFile ⇒ the part file holds zero rows: skip it
      byFile.get(rel.split('/').last).map(meta => s"add=$rel|$meta")
    }
  }

  /** [[append]] that also records the batch's schema as the table's
    * CURRENT schema (`schema=` action) — the add-column evolution
    * commit (Delta's mergeSchema shape). Readers at or past this
    * version resolve every file against the recorded schema: files
    * from BEFORE the evolution read their missing columns as NULL;
    * time travel to an older version presents the older schema.
    * Evolution must be additive on the shared columns (same name ⇒
    * same type) — enforced here against the previous recorded or
    * inferred schema, so an incompatible batch fails BEFORE it
    * commits, not at some later read. Optional `statCols` record
    * per-file bounds exactly like [[appendWithStats]] — stats on a
    * freshly added column start at this commit (earlier files carry
    * no bounds for it and are never pruned by it). */
  def appendEvolving(spark: SparkSession, df: DataFrame, dir: String,
                     statCols: String*): Long = {
    val prior: Option[org.apache.spark.sql.types.StructType] =
      if (latestVersion(dir).isEmpty) None
      else tableSchema(dir).orElse {
        // non-evolved table: infer from the live files — but a
        // delete-everything can leave a ZERO-file snapshot, which is
        // schema-fresh (parquet would throw 'unable to infer schema')
        val files = snapshotFiles(dir)
        if (files.isEmpty) None else Some(read(spark, dir).schema)
      }
    prior.foreach { p =>
      p.fields.foreach { f =>
        df.schema.find(_.name == f.name).foreach { g =>
          require(g.dataType == f.dataType,
            s"schema evolution must not change types: column '${f.name}' " +
              s"is ${f.dataType.simpleString}, batch has ${g.dataType.simpleString}")
        }
        require(df.schema.fieldNames.contains(f.name),
          s"schema evolution is additive: batch drops column '${f.name}'")
      }
    }
    val staged = stageFiles(df, dir)
    val adds =
      if (statCols.nonEmpty) statAddActions(spark, dir, staged, statCols)
      else staged.map("add=" + _)
    commit(dir, adds ++ Seq("schema=" + df.schema.json, "op=APPEND")).get
  }

  /** [[append]] that also records per-file (min, max) of one or more
    * long columns in the manifest — Iceberg-style data skipping:
    * [[readRange]] plans only the files whose recorded range on the
    * queried column overlaps the predicate. Stats cost one pass over
    * the freshly staged batch, O(batch) like the commit itself. */
  def appendWithStats(spark: SparkSession, df: DataFrame, dir: String,
                      statCols: String*): Long = {
    require(statCols.nonEmpty, "appendWithStats needs at least one stats column")
    commit(dir, statAddActions(spark, dir, stageFiles(df, dir), statCols) :+ "op=APPEND").get
  }

  /** Files the latest snapshot plans for a `[lo, hi]` range predicate
    * on `statCol`: files whose recorded range on that column overlaps,
    * plus every file with no stats FOR THAT COLUMN (unknown ranges are
    * never skipped). */
  def plannedFilesForRange(dir: String, statCol: String,
                           lo: Long, hi: Long): Seq[String] =
    snapshotFilesWithStats(dir).collect {
      case (f, stats) if stats.get(statCol)
        .forall { case (mn, mx) => mx >= lo && mn <= hi } => f
    }

  /** Range read with file skipping: plan only [[plannedFilesForRange]]
    * and apply the residual row filter (file pruning is a superset —
    * the predicate still runs, exactly like parquet row-group skip). */
  def readRange(spark: SparkSession, dir: String, statCol: String,
                lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val paths = plannedFilesForRange(dir, statCol, lo, hi)
      .map(rel => new File(dataDir(dir), rel).getPath)
    if (paths.nonEmpty)
      return spark.read.parquet(paths: _*)
        .filter(col(statCol) >= lo && col(statCol) <= hi)
    // every file pruned out: an empty frame in the table's schema.
    // A zero-file snapshot has no schema to offer — fail loudly
    // rather than let parquet throw an opaque path error.
    val all = snapshotFiles(dir)
    if (all.isEmpty)
      throw new IllegalStateException(
        s"readRange on $dir: snapshot holds no data files at all")
    spark.read.parquet(new File(dataDir(dir), all.head).getPath)
      .filter(org.apache.spark.sql.functions.lit(false))
  }

  /** Per-file Bloom segments of a snapshot: file → (col → (m, k,
    * hex)), empty map for files committed without a bloom. */
  def snapshotFilesWithBloom(dir: String, version: Option[Long] = None)
      : Seq[(String, Map[String, (Int, Int, String)])] =
    fold(dir, resolved(dir, version)).files.map { e =>
      val parts = e.split('|')
      val blooms = parts.iterator.drop(1).collect {
        case p if p.startsWith("bloom=") =>
          p.stripPrefix("bloom=").split(':') match {
            case Array(c, m, k, hex) => c -> ((m.toInt, k.toInt, hex))
            case bad => throw new IllegalStateException(
              s"corrupt bloom segment '${bad.mkString(":")}' in $e")
          }
      }.toMap
      (parts(0), blooms)
    }

  /** [[appendWithStats]] that ALSO records a per-file Bloom filter on
    * `bloomCol` (see [[BloomIndex]]) — the point-lookup index for keys
    * whose min/max bounds cannot prune (high-cardinality values
    * scattered across every file). Bloom build cost is one more
    * codegen'd pass over the staged batch; the filter rides the `add=`
    * entry, so it survives exactly as long as the file does (a
    * copy-on-write rewrite drops it with the entry — rewritten files
    * simply carry no bloom until appended through this path again,
    * and an unknown bloom is never used to skip). `statCols` may be
    * empty: the entry then carries `rows=` + the bloom alone. */
  def appendWithBloom(spark: SparkSession, df: DataFrame, dir: String,
                      bloomCol: String, statCols: String*): Long = {
    require(StatColName.matches(bloomCol),
      s"bloom column name '$bloomCol' must match [A-Za-z0-9_]+")
    val f = df.schema.find(_.name == bloomCol).getOrElse(
      throw new IllegalArgumentException(
        s"bloom column '$bloomCol' is not in the batch's schema"))
    require(f.dataType == org.apache.spark.sql.types.LongType,
      s"bloom column '$bloomCol' must be LongType, found ${f.dataType.simpleString}")
    val staged = stageFiles(df, dir)
    val adds = statAddActions(spark, dir, staged, statCols)
    val blooms = BloomIndex.buildPerFile(
      spark.read.parquet(staged.map(r => new File(dataDir(dir), r).getPath): _*),
      bloomCol)
    val withBloom = adds.map { a =>
      val rel = a.stripPrefix("add=").takeWhile(_ != '|')
      blooms.get(rel.split('/').last) match {
        case Some(spec) => s"$a|bloom=$bloomCol:$spec"
        case None => a // all-NULL key in this file: no bloom, never skipped
      }
    }
    commit(dir, withBloom :+ "op=APPEND").get
  }

  /** Files the snapshot plans for an equality lookup `col = value`:
    * files whose Bloom filter says maybe, plus every file with no
    * bloom FOR THAT COLUMN (unknown is never skipped). No false
    * negatives by the [[BloomIndex]] contract, so the planned set is
    * always a superset of the files that actually hold the value. */
  def plannedFilesForPoint(dir: String, colName: String, value: Long,
                           version: Option[Long] = None): Seq[String] =
    snapshotFilesWithBloom(dir, version).collect {
      case (f, blooms) if blooms.get(colName).forall {
        case (m, _, hex) => BloomIndex.maybeContains(hex, m, value)
      } => f
    }

  /** Point-lookup read with Bloom file skipping: plan only
    * [[plannedFilesForPoint]] and apply the residual equality filter
    * (bloom false positives are filtered out here, exactly like
    * readRange's residual). */
  def readPoint(spark: SparkSession, dir: String, colName: String,
                value: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val paths = plannedFilesForPoint(dir, colName, value)
      .map(rel => new File(dataDir(dir), rel).getPath)
    if (paths.nonEmpty)
      return spark.read.parquet(paths: _*).filter(col(colName) === value)
    val all = snapshotFiles(dir)
    if (all.isEmpty)
      throw new IllegalStateException(
        s"readPoint on $dir: snapshot holds no data files at all")
    spark.read.parquet(new File(dataDir(dir), all.head).getPath)
      .filter(org.apache.spark.sql.functions.lit(false))
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
    commit(dir, stageFiles(df, dir).map("add=" + _) ++
        Seq(s"txn=$writer:$batchId", "op=APPEND"),
      skipIfTxn = Some((writer, batchId)))
  }

  /** Rewrite the current snapshot into `targetFiles` files and commit
    * a REPLACING (`reset`+adds) manifest — the compaction half of the
    * protocol. The replace must not erase a concurrent append, so the
    * commit is pinned to the exact version that was read: if any other
    * commit lands first, the attempt aborts and the whole rewrite
    * restarts from the new latest (optimistic concurrency, the same
    * rule Delta applies to full-table rewrites). Older versions keep
    * folding to their own file lists — time travel is intact until
    * [[vacuum]] — and txn idempotence markers survive by construction
    * (`reset` clears files, never markers). */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 1): Long =
    compactClustered(spark, dir, targetFiles, Nil)

  /** [[compact]] that also CLUSTERS the rewrite and re-records column
    * stats — the Delta OPTIMIZE ZORDER shape: rows are range-
    * partitioned then sorted within files on `statCols`, so the
    * rewritten files carry tight disjoint per-column bounds and
    * [[readRange]] pruning SURVIVES (plain compaction leaves unknown
    * ranges — correct but never skippable). Same optimistic-
    * concurrency rule as compact. */
  def compactClustered(spark: SparkSession, dir: String, targetFiles: Int,
                       statCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val parent = latestVersion(dir).getOrElse(
        throw new IllegalStateException(s"nothing to compact in $dir"))
      val stage = new File(dataDir(dir), s"txn-${UUID.randomUUID()}")
      val snap = read(spark, dir, Some(parent))
      val clustered =
        if (statCols.isEmpty) snap.repartition(targetFiles)
        else snap.repartitionByRange(targetFiles, statCols.map(col): _*)
          .sortWithinPartitions(statCols.map(col): _*)
      clustered.write.parquet(stage.getPath)
      val mine = Option(stage.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(f => s"${stage.getName}/${f.getName}").toSeq.sorted
      val adds =
        if (statCols.isEmpty) mine.map("add=" + _)
        else statAddActions(spark, dir, mine, statCols)
      tryCommitAt(dir, parent + 1L, ("reset" +: adds) :+ "op=COMPACT") match {
        case Some(v) => return v
        case None =>
          // someone committed on top of `parent` — replacing now would
          // erase their rows; drop the stale rewrite, restart from the
          // new latest
          deleteRec(stage)
      }
    }
    throw new IllegalStateException(s"gave up compacting $dir after 20 conflicts")
  }

  /** True iff every committed manifest in `[from, to]` holds only
    * `add=`/`txn=` lines — the commits COMMUTE with a copy-on-write
    * rewrite of files that predate them (they can't have touched
    * those files), so a conflicted delete/merge may re-commit its own
    * actions on top instead of redoing the scan+rewrite (Delta's
    * append/delete conflict-resolution rule). */
  /** INCREMENTAL compaction — the real Delta/Iceberg OPTIMIZE shape:
    * bin-pack ONLY the live files smaller than `minBytes` into
    * `targetFiles` outputs and commit per-file `remove=` + `add=`
    * actions; files already at a healthy size are NOT touched (their
    * entries, stats and bytes survive verbatim). [[compact]]'s
    * full-snapshot `reset` rewrite costs O(table) data movement every
    * time — correct for a one-off re-layout, wrong for the steady
    * state, where a streaming sink drips small files forever and
    * maintenance must stay O(small files). A `reset`-free commit also
    * keeps the CHANGE FEED alive: readers of [[readSince]]/
    * [[readChanges]] refuse reset commits, but a remove+add rewrite
    * that moves no rows is data-preserving... and still refused
    * (feeds cannot verify that claim from metadata) — so run
    * compaction BETWEEN feed polls, exactly as Delta documents.
    * Optimistic concurrency: pinned to the planned version, rebased
    * over concurrent pure appends, re-planned after another rewrite.
    * Returns None when fewer than 2 files qualify (nothing to pack —
    * an empty OPTIMIZE must not advance the log). `statCols` re-record
    * bounds on the packed output so pruning survives. */
  def compactSmall(spark: SparkSession, dir: String, minBytes: Long,
                   targetFiles: Int = 1,
                   statCols: Seq[String] = Nil): Option[Long] = {
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val parent = resolved(dir, None)
      val small = fold(dir, parent).files
        .map(_.takeWhile(_ != '|'))
        .filter(rel => new File(dataDir(dir), rel).length() < minBytes)
      if (small.size < 2) return None
      val packed = pinnedReader(spark, dir, Some(parent)).parquet(
          small.map(rel => new File(dataDir(dir), rel).getPath): _*)
        .repartition(targetFiles)
      val staged = stageFiles(packed, dir)
      val adds =
        if (statCols.nonEmpty) statAddActions(spark, dir, staged, statCols)
        else staged.map("add=" + _)
      val actions = small.sorted.map("remove=" + _) ++ adds :+ "op=OPTIMIZE"
      commitRewriteRebasing(dir, parent, actions) match {
        case RewriteCommitted(v) => return Some(v)
        case _ =>
          staged.map(_.takeWhile(_ != '/')).distinct
            .foreach(t => deleteRec(new File(dataDir(dir), t)))
      }
    }
    throw new IllegalStateException(s"gave up bin-packing $dir after 20 conflicts")
  }

  private def pureAppends(dir: String, from: Long, to: Long): Boolean =
    (from to to).forall { v =>
      val mf = new File(manifestDir(dir), s"v$v.manifest")
      mf.isFile && readLog(mf, v).forall(l =>
        l.startsWith("add=") || l.startsWith("txn=") || l.startsWith("cdf=") ||
          l.startsWith("op="))
    }

  private[graft] sealed trait RewriteResult
  private[graft] case class RewriteCommitted(version: Long) extends RewriteResult
  private[graft] case object RewriteSkippedTxn extends RewriteResult
  private[graft] case object RewriteConflict extends RewriteResult

  /** Commit copy-on-write rewrite actions (`remove=` + `add=`) first
    * at `parent + 1`, then — as long as every commit that beat us is a
    * pure append, which commutes with a rewrite of pre-`parent` files —
    * rebased onto each new latest. `skipIfTxn` is re-checked after
    * every lost race (the commit that beat us may be a duplicate of
    * this very batch). Returns [[RewriteConflict]] only when a
    * NON-commuting commit (reset/remove) intervened: the caller must
    * re-plan from the new snapshot. Package-visible for the
    * deterministic rebase spec. */
  private[graft] def commitRewriteRebasing(dir: String, parent: Long,
                                           actions: Seq[String],
                                           skipIfTxn: Option[(String, Long)] = None)
      : RewriteResult = {
    var at = parent + 1L
    while (true) {
      tryCommitAt(dir, at, actions) match {
        case Some(v) => return RewriteCommitted(v)
        case None =>
          skipIfTxn.foreach { case (w, b) =>
            if (committedBatches(dir, w).contains(b)) return RewriteSkippedTxn
          }
          val latest = resolved(dir, None)
          if (!pureAppends(dir, at, latest)) return RewriteConflict
          at = latest + 1L
      }
    }
    RewriteConflict // unreachable
  }

  /** [[compact]] that Z-ORDER clusters the rewrite — the Delta
    * OPTIMIZE ZORDER maintenance op on a LIVE table (the layout
    * `compactClustered`'s hierarchical sort cannot give): each row's
    * (`colA`, `colB`) values are min/max-normalized against the
    * snapshot's global bounds and Morton-interleaved into one Z-value
    * ([[graft.operators.Layout.zValue]] — the overflow-safe,
    * separately-spec'd machinery); the rewrite range-partitions and
    * sorts on that Z-value and re-records stats on BOTH columns.
    * Files then carry bounds that are tight in EVERY clustered
    * dimension simultaneously, so multi-predicate range plans prune
    * in all of them — a hierarchical sort is tight only in its
    * leading column. Global bounds come straight from the manifest's
    * per-file stats when every live file records them (a
    * metadata-only plan, even across concurrency retries). NULLs
    * bucket at the low edge (they cluster together and never widen
    * another file's bounds). Same replacing-commit +
    * optimistic-concurrency rule as [[compact]]. */
  def compactZorder(spark: SparkSession, dir: String, targetFiles: Int,
                    colA: String, colB: String): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, max, min}
    val zCols = Seq(colA, colB)
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val parent = latestVersion(dir).getOrElse(
        throw new IllegalStateException(s"nothing to compact in $dir"))
      val snap = read(spark, dir, Some(parent))
      zCols.foreach { c =>
        require(snap.schema(c).dataType == org.apache.spark.sql.types.LongType,
          s"z column '$c' must be LongType")
      }
      // global bounds come from the MANIFEST when every live file
      // carries stats for both columns (zero Spark jobs — and retries
      // under contention stay metadata-only); one scan otherwise
      val statted = fold(dir, parent).files.map(parseStatsEntry)
      val bounds: Option[(Long, Long, Long, Long)] =
        if (statted.nonEmpty &&
            statted.forall(e => zCols.forall(e._2.contains))) Some((
          statted.map(_._2(colA)._1).min, statted.map(_._2(colA)._2).max,
          statted.map(_._2(colB)._1).min, statted.map(_._2(colB)._2).max))
        else {
          val b = snap.agg(min(col(colA)), max(col(colA)),
            min(col(colB)), max(col(colB))).head()
          if (b.isNullAt(0) || b.isNullAt(2)) None // a column is all-NULL
          else Some((b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3)))
        }
      // a helper name that cannot clobber table data
      var zName = "_z"
      while (snap.columns.contains(zName)) zName += "_"
      val clustered = bounds match {
        case Some((aLo, aHi, bLo, bHi)) =>
          // overflow-safe normalize + Morton interleave from the
          // spec'd Layout machinery (double-cast before the multiply;
          // constant-dimension guard); NULLs bucket at the low edge
          snap.withColumn(zName, graft.operators.Layout.zValue(
              coalesce(col(colA), lit(aLo)), lit(aLo), lit(aHi),
              coalesce(col(colB), lit(bLo)), lit(bLo), lit(bHi)))
            .repartitionByRange(targetFiles, col(zName))
            .sortWithinPartitions(col(zName))
            .drop(zName)
        case None => snap.repartition(targetFiles) // degenerate: no usable axis
      }
      val stage = new File(dataDir(dir), s"txn-${UUID.randomUUID()}")
      clustered.write.parquet(stage.getPath)
      val mine = Option(stage.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(f => s"${stage.getName}/${f.getName}").toSeq.sorted
      val adds = statAddActions(spark, dir, mine, zCols)
      tryCommitAt(dir, parent + 1L, ("reset" +: adds) :+ "op=ZORDER") match {
        case Some(v) => return v
        case None => deleteRec(stage) // a commit beat us: re-cluster the new latest
      }
    }
    throw new IllegalStateException(s"gave up z-ordering $dir after 20 conflicts")
  }

  /** RESTORE the table to the state it had at `toVersion` — the Delta
    * RESTORE lifecycle op (the undo for a bad delete/merge/compaction):
    * commits a NEW replacing version whose file list is the target
    * snapshot's entries VERBATIM (column stats, row counts and bloom
    * segments ride along untouched — pruning survives the restore),
    * so the log stays strictly forward (nothing is rewound or erased;
    * an auditor still sees the bad commit and its undo). No data
    * moves: the target's files are still on disk because [[vacuum]]
    * only deletes files unreferenced by SURVIVING versions, and a
    * vacuumed-away target fails loudly in the fold ("version missing")
    * before anything commits.
    *
    * Schema: the restored version presents the schema AS OF the
    * target. A later `schema=` evolution action would survive a bare
    * `reset` (reset clears files, never schema), so the restore
    * explicitly reinstates the target's schema — recorded if the
    * target had one, re-inferred from the target's files when the
    * table evolved only after the target (ambiguous only for a
    * zero-file target, which throws).
    *
    * Txn idempotence markers survive (they always do): a streaming
    * batch that committed before the restored-away range stays a
    * no-op on retry — Delta's rule; the writer must use fresh batch
    * ids to re-deliver.
    *
    * Concurrency: pinned to the version that was read (a replacing
    * commit must never erase a concurrent append — same rule as
    * [[compact]]); on a lost race the restore re-reads and re-commits,
    * metadata-only every time. Metadata is O(target snapshot) — the
    * checkpoint cost, inherent to a replacing commit. Restoring to
    * the current version is a no-op and commits nothing. */
  def restore(spark: SparkSession, dir: String, toVersion: Long): Long = {
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val parent = resolved(dir, None)
      require(toVersion >= 0 && toVersion <= parent,
        s"restore target v$toVersion is outside the committed log (latest v$parent)")
      if (toVersion == parent) return parent
      val target = fold(dir, toVersion)
      val current = fold(dir, parent)
      val schemaAction: Seq[String] = target.schema match {
        case Some(j) => Seq("schema=" + j)
        case None if current.schema.isDefined =>
          // the evolution happened after the target: pin the target's
          // effective (file) schema so post-restore reads don't resolve
          // against the later evolution's surviving schema= action
          if (target.files.isEmpty)
            throw new IllegalStateException(
              s"restore of $dir to v$toVersion: the target snapshot holds no " +
                "files and recorded no schema, but the table evolved later — " +
                "the restored schema is undefined")
          Seq("schema=" + spark.read.parquet(
            target.files.map(e =>
              new File(dataDir(dir), e.takeWhile(_ != '|')).getPath): _*)
            .schema.json)
        case None => Nil
      }
      val actions = ("reset" +: (schemaAction ++ target.files.map("add=" + _))) :+
        s"op=RESTORE(v$toVersion)"
      tryCommitAt(dir, parent + 1L, actions) match {
        case Some(v) => return v
        case None => // a commit beat us: re-pin against the new latest
      }
    }
    throw new IllegalStateException(s"gave up restoring $dir after 20 conflicts")
  }

  /** Row-level DELETE, copy-on-write (the Delta/Iceberg shape — the
    * GDPR/takedown primitive a training-data warehouse cannot ship
    * without): plan the files that hold matching rows, rewrite ONLY
    * those files minus the matches, and commit per-file `remove=`
    * actions plus the survivors' `add=`s — metadata is **O(affected
    * files)**, never O(live files); a millionth-file table's
    * single-file delete writes a three-line manifest. Untouched files
    * are never mentioned, so their entries (column stats included)
    * survive verbatim in the fold; rewritten files get fresh stats on
    * `statCols` so [[readRange]] pruning survives the delete. Time
    * travel to pre-delete versions still folds to the old file list —
    * physical erasure is [[vacuum]]'s job, exactly as in Delta.
    *
    * Concurrency: the commit is pinned to the version that was read;
    * a concurrent PURE APPEND commutes (it cannot reference the
    * rewritten files) and the delete rebases on top without redoing
    * the scan, while a concurrent reset/remove forces a full re-plan
    * from the new snapshot — a concurrent append is never erased.
    *
    * Scale shape: the affected-file scan is one pass with the
    * predicate pushed to parquet; the rewrite touches only affected
    * files' rows; commit metadata is O(affected). With `cdf = true`
    * the commit also records the deleted rows as change-data files
    * (`cdf=` actions, `_change_type = 'delete'`) so [[readChanges]]
    * can serve the delete to downstream consumers — GDPR erasure then
    * PROPAGATES instead of stranding derived tables. Returns the
    * committed version, or None when nothing matched (no commit —
    * a delete of nothing must not advance the log). */
  def deleteWhere(spark: SparkSession, dir: String,
                  predicate: org.apache.spark.sql.Column,
                  statCols: Seq[String] = Nil,
                  cdf: Boolean = false): Option[Long] = {
    import org.apache.spark.sql.functions.input_file_name
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val parent = resolved(dir, None)
      val entries = fold(dir, parent).files // raw, stats suffix intact
      val relOf = entries.map { e =>
        val rel = e.takeWhile(_ != '|')
        new File(dataDir(dir), rel).getCanonicalPath -> rel
      }.toMap
      // one predicate-pushed scan finds the files that hold matches —
      // result is bounded by the file count, never the row count
      val affected: Set[String] = read(spark, dir, Some(parent))
        .filter(predicate)
        .select(input_file_name().as("f")).distinct().collect()
        .map(r => new File(new java.net.URI(r.getString(0)).getPath).getCanonicalPath)
        .map(p => relOf.getOrElse(p, throw new IllegalStateException(
          s"matched file $p is not in the snapshot"))).toSet
      if (affected.isEmpty) return None
      // rewrite the affected files' survivors into fresh staged files.
      // DELETE semantics: only predicate-IS-TRUE rows go; a NULL
      // predicate keeps the row (so !pred alone would over-delete)
      // pinned read: affected files may span a schema evolution, and
      // the rewrite must preserve the evolved column (not let parquet
      // infer from whichever footer it samples)
      val survivors = pinnedReader(spark, dir, Some(parent)).parquet(
          affected.toSeq.map(rel => new File(dataDir(dir), rel).getPath): _*)
        .filter(!org.apache.spark.sql.functions.coalesce(
          predicate, org.apache.spark.sql.functions.lit(false)))
      val staged = stageFiles(survivors, dir)
      // change-data feed (opt-in, the Delta enableChangeDataFeed
      // shape): the DELETED rows are written at commit time with a
      // baked-in `_change_type` — O(changed rows), one more
      // predicate-pushed pass over the SAME affected files; read-time
      // diffing of removed-vs-added files would pay an anti-join per
      // feed poll instead
      val cdfStaged: Seq[String] =
        if (!cdf) Nil
        else stageFiles(
          pinnedReader(spark, dir, Some(parent)).parquet(
              affected.toSeq.map(rel => new File(dataDir(dir), rel).getPath): _*)
            .filter(org.apache.spark.sql.functions.coalesce(
              predicate, org.apache.spark.sql.functions.lit(false)))
            .withColumn("_change_type", org.apache.spark.sql.functions.lit("delete")),
          dir)
      val adds =
        if (statCols.nonEmpty) statAddActions(spark, dir, staged, statCols)
        else staged.map("add=" + _)
      val actions = affected.toSeq.sorted.map("remove=" + _) ++ adds ++
        cdfStaged.map("cdf=" + _) :+ "op=DELETE"
      commitRewriteRebasing(dir, parent, actions) match {
        case RewriteCommitted(v) => return Some(v)
        case _ =>
          // a non-commuting commit landed; the rewrite may have read
          // rows that commit removed — drop it and re-plan
          (staged ++ cdfStaged).map(_.takeWhile(_ != '/')).distinct
            .foreach(t => deleteRec(new File(dataDir(dir), t)))
      }
    }
    throw new IllegalStateException(s"gave up deleting from $dir after 20 conflicts")
  }

  /** Files of snapshot `parent` that may hold rows whose `key` is in
    * `keys` — the MERGE/CDC planning scan: ONE semi-join pass,
    * file-count bounded, and when the table records stats on the key
    * the scan is PRE-PRUNED to files whose key range overlaps the
    * keys' [min, max] (files without key stats always scan — unknown
    * ranges are never skipped). A narrow CDC batch against a
    * key-clustered table then plans its files without touching the
    * rest of the snapshot. */
  private def affectedByKeys(spark: SparkSession, dir: String, parent: Long,
                             keys: DataFrame, key: String,
                             keyType: org.apache.spark.sql.types.DataType): Set[String] = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    if (parent < 0) return Set.empty
    val entries = fold(dir, parent).files
    val relOf = entries.map { e =>
      val rel = e.takeWhile(_ != '|')
      new File(dataDir(dir), rel).getCanonicalPath -> rel
    }.toMap
    val statted = entries.map(parseStatsEntry)
    // the pruning path needs long bounds; non-long keys scan all
    val hasKeyStats = statted.exists(_._2.contains(key)) &&
      keyType == org.apache.spark.sql.types.LongType
    val scanRels: Seq[String] =
      if (!hasKeyStats) statted.map(_._1)
      else {
        val bounds = keys.agg(
          org.apache.spark.sql.functions.min(col(key)),
          org.apache.spark.sql.functions.max(col(key))).head()
        if (bounds.isNullAt(0)) Seq.empty // all-NULL keys match nothing
        else {
          val (bMin, bMax) = (bounds.getLong(0), bounds.getLong(1))
          statted.collect {
            case (rel, stats) if stats.get(key)
              .forall { case (mn, mx) => mx >= bMin && mn <= bMax } => rel
          }
        }
      }
    if (scanRels.isEmpty) Set.empty
    else
      // pinned reader: the scanned files may span a schema evolution
      // and the key column must NULL-backfill, not vanish with a
      // sampled pre-evolution footer. File name is attached BEFORE
      // the join: input_file_name() only resolves against a single
      // source, and the semi-join's other side may itself be
      // file-backed
      pinnedReader(spark, dir, Some(parent)).parquet(
          scanRels.map(rel => new File(dataDir(dir), rel).getPath): _*)
        .withColumn("_m_file", input_file_name())
        .join(keys, Seq(key), "left_semi")
        .select(col("_m_file").as("f")).distinct().collect()
        .map(r => new File(new java.net.URI(r.getString(0)).getPath).getCanonicalPath)
        .map(p => relOf.getOrElse(p, throw new IllegalStateException(
          s"matched file $p is not in the snapshot"))).toSet
  }

  /** UPDATE ... SET ... WHERE — the third DML verb (Delta UPDATE),
    * copy-on-write like [[deleteWhere]]: one predicate-pushed scan
    * plans the affected files, ONLY those files rewrite — matched rows
    * with the `set` expressions applied, survivors verbatim — and the
    * commit carries per-file `remove=` + `add=`, O(affected). SQL
    * UPDATE semantics: a NULL predicate leaves the row unchanged.
    * `set` columns must already exist (UPDATE never evolves schema —
    * that is [[appendEvolving]]'s job) and may reference the row's own
    * columns (`n_chars -> col("n_chars") + 7`). With `cdf = true` the
    * commit records update_preimage/update_postimage change rows for
    * [[readChanges]]. Returns None when nothing matched (no commit). */
  def updateWhere(spark: SparkSession, dir: String,
                  predicate: org.apache.spark.sql.Column,
                  set: Map[String, org.apache.spark.sql.Column],
                  statCols: Seq[String] = Nil,
                  cdf: Boolean = false): Option[Long] = {
    import org.apache.spark.sql.functions.{coalesce, input_file_name, lit, when}
    require(set.nonEmpty, "updateWhere needs at least one SET column")
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val parent = resolved(dir, None)
      val entries = fold(dir, parent).files
      val relOf = entries.map { e =>
        val rel = e.takeWhile(_ != '|')
        new File(dataDir(dir), rel).getCanonicalPath -> rel
      }.toMap
      val affected: Set[String] = read(spark, dir, Some(parent))
        .filter(predicate)
        .select(input_file_name().as("f")).distinct().collect()
        .map(r => new File(new java.net.URI(r.getString(0)).getPath).getCanonicalPath)
        .map(p => relOf.getOrElse(p, throw new IllegalStateException(
          s"matched file $p is not in the snapshot"))).toSet
      if (affected.isEmpty) return None
      val base = pinnedReader(spark, dir, Some(parent)).parquet(
        affected.toSeq.map(rel => new File(dataDir(dir), rel).getPath): _*)
      set.keys.foreach { c =>
        require(base.columns.contains(c),
          s"UPDATE SET column '$c' is not in the table (schema evolution is appendEvolving's job)")
      }
      // matched rows take the SET expressions, others pass verbatim;
      // NULL predicate = unchanged (SQL UPDATE), hence the coalesce.
      // ONE projection, every RHS evaluated against the OLD row — a
      // sequential withColumn fold would let `SET a = b, b = a` read
      // a's NEW value, which SQL UPDATE forbids
      val hit = coalesce(predicate, lit(false))
      def applied(df: DataFrame, conditional: Boolean): DataFrame =
        df.select(df.columns.map { c =>
          set.get(c) match {
            case Some(expr) if conditional => when(hit, expr).otherwise(df(c)).as(c)
            case Some(expr) => expr.as(c)
            case None => df(c)
          }
        }.toSeq: _*)
      val rewritten = applied(base, conditional = true)
      val staged = stageFiles(rewritten, dir)
      val cdfStaged: Seq[String] =
        if (!cdf) Nil
        else {
          val matched = base.filter(hit)
          stageFiles(
            matched.withColumn("_change_type", lit("update_preimage"))
              .unionByName(applied(matched, conditional = false)
                .withColumn("_change_type", lit("update_postimage"))),
            dir)
        }
      val adds =
        if (statCols.nonEmpty) statAddActions(spark, dir, staged, statCols)
        else staged.map("add=" + _)
      val actions = affected.toSeq.sorted.map("remove=" + _) ++ adds ++
        cdfStaged.map("cdf=" + _) :+ "op=UPDATE"
      commitRewriteRebasing(dir, parent, actions) match {
        case RewriteCommitted(v) => return Some(v)
        case _ =>
          (staged ++ cdfStaged).map(_.takeWhile(_ != '/')).distinct
            .foreach(t => deleteRec(new File(dataDir(dir), t)))
      }
    }
    throw new IllegalStateException(s"gave up updating $dir after 20 conflicts")
  }

  /** MERGE INTO (keyed upsert), copy-on-write — the Delta MERGE shape
    * restricted to whole-row `WHEN MATCHED THEN UPDATE SET *` /
    * `WHEN NOT MATCHED THEN INSERT *`: batch rows whose `key` matches
    * a live row REPLACE that row wholesale; the rest are inserted.
    * Planning reuses the delete machinery: one semi-join scan finds
    * the files holding matched rows, ONLY those files are rewritten
    * (their non-matched survivors), the batch lands alongside as
    * fresh rows, and the single commit carries per-file `remove=` +
    * `add=` actions — **O(affected + batch)** metadata, never
    * O(table). Rewritten files get fresh stats on `statCols` so
    * [[readRange]] pruning survives the merge.
    *
    * Concurrency: the [[deleteWhere]] optimistic rule — pinned to the
    * planned version, rebased over concurrent pure appends (they
    * commute with a rewrite of files that predate them), re-planned
    * after a reset/remove. A `txn` (writer, batchId) marker makes a
    * retried streaming MERGE batch a no-op (the [[appendIdempotent]]
    * contract); it is checked before planning and after every lost
    * race, so a concurrent duplicate cannot double-apply.
    *
    * Duplicate keys IN the batch are an error (MERGE's own rule —
    * which copy would win?), raised distributedly during the staged
    * write, before anything commits. With `cdf = true` the commit
    * also records its row changes (`update_preimage` /
    * `update_postimage` / `insert`) as change-data files for
    * [[readChanges]]. Returns the committed version, or None when
    * `txn` says this batch already landed. */
  def mergeInto(spark: SparkSession, dir: String, batch: DataFrame, key: String,
                statCols: Seq[String] = Nil,
                txn: Option[(String, Long)] = None,
                cdf: Boolean = false): Option[Long] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, raise_error, when}
    // the duplicate-batch-key guard rides the key column itself, so it
    // cannot be pruned away before the staged write evaluates it
    val guarded = batch
      .withColumn("_m_n", count(lit(1)).over(Window.partitionBy(col(key))))
      .withColumn(key,
        when(col("_m_n") > 1,
          raise_error(lit(s"mergeInto: multiple batch rows share one $key"))
            .cast(batch.schema(key).dataType))
          .otherwise(col(key)))
      .drop("_m_n")
    val keys = batch.select(col(key)).distinct()
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      // a retried streaming batch that already landed must be a no-op
      txn.foreach { case (w, b) =>
        if (committedBatches(dir, w).contains(b)) return None
      }
      val parent = latestVersion(dir).getOrElse(-1L)
      val affected: Set[String] =
        affectedByKeys(spark, dir, parent, keys, key, batch.schema(key).dataType)
      // one staged write: affected files' NON-matched survivors, then
      // every batch row (update and insert alike land as fresh files)
      val rewritten =
        if (affected.isEmpty) guarded
        else pinnedReader(spark, dir, Some(parent)).parquet(
            affected.toSeq.map(rel => new File(dataDir(dir), rel).getPath): _*)
          .join(keys, Seq(key), "left_anti")
          // strict by-name union: the pinned read gives pre-evolution
          // survivors the full recorded schema (NULL backfill), so a
          // column mismatch here means the BATCH doesn't carry the
          // table's current schema — an error, not something to pad
          .unionByName(guarded)
      val staged = stageFiles(rewritten, dir)
      // change-data feed (opt-in): MERGE's row changes recorded at
      // commit time — matched old rows as `update_preimage`, their
      // batch replacements as `update_postimage`, unmatched batch rows
      // as `insert`. One staged write of O(batch + matched) rows; the
      // feed then carries the exact signed delta an incremental view
      // needs (postimage − preimage), which added-files-only feeds
      // cannot express for an upsert.
      val cdfStaged: Seq[String] =
        if (!cdf) Nil
        else {
          val typed =
            if (affected.isEmpty)
              guarded.withColumn("_change_type",
                org.apache.spark.sql.functions.lit("insert"))
            else {
              val oldMatched = pinnedReader(spark, dir, Some(parent)).parquet(
                  affected.toSeq.map(rel => new File(dataDir(dir), rel).getPath): _*)
                .join(keys, Seq(key), "left_semi")
              val matchedKeys = oldMatched.select(col(key)).distinct()
              oldMatched
                .withColumn("_change_type",
                  org.apache.spark.sql.functions.lit("update_preimage"))
                .unionByName(guarded.join(matchedKeys, Seq(key), "left_semi")
                  .withColumn("_change_type",
                    org.apache.spark.sql.functions.lit("update_postimage")))
                .unionByName(guarded.join(matchedKeys, Seq(key), "left_anti")
                  .withColumn("_change_type",
                    org.apache.spark.sql.functions.lit("insert")))
            }
          stageFiles(typed, dir)
        }
      val adds =
        if (statCols.nonEmpty) statAddActions(spark, dir, staged, statCols)
        else staged.map("add=" + _)
      val actions = affected.toSeq.sorted.map("remove=" + _) ++ adds ++
        cdfStaged.map("cdf=" + _) ++
        txn.map { case (w, b) => s"txn=$w:$b" } :+ "op=MERGE"
      commitRewriteRebasing(dir, parent, actions, skipIfTxn = txn) match {
        case RewriteCommitted(v) => return Some(v)
        case other =>
          (staged ++ cdfStaged).map(_.takeWhile(_ != '/')).distinct
            .foreach(t => deleteRec(new File(dataDir(dir), t)))
          if (other == RewriteSkippedTxn) return None
        // RewriteConflict: a reset/remove landed — re-plan from the
        // new snapshot
      }
    }
    throw new IllegalStateException(s"gave up merging into $dir after 20 conflicts")
  }

  /** MERGE with a DELETE clause — the FULL Delta MERGE shape a CDC
    * stream needs (`WHEN MATCHED AND op='D' THEN DELETE / WHEN
    * MATCHED THEN UPDATE SET * / WHEN NOT MATCHED AND op!='D' THEN
    * INSERT *`): `batch` carries `opCol` ∈ {I, U, D}; matched D rows
    * are dropped, matched I/U rows replaced, unmatched I/U rows
    * inserted, unmatched D rows are silent no-ops (the delete already
    * happened upstream). ONE planning semi-join over ALL batch keys
    * (stats-pruned like [[mergeInto]]), ONE staged rewrite, ONE
    * commit: O(affected + batch), never O(table). Duplicate keys in
    * the batch are an error exactly as in [[mergeInto]] — a key both
    * updated and deleted in one batch has no defined winner. `txn`
    * gives exactly-once streaming apply; `cdf = true` records the
    * full typed change set (update_preimage / update_postimage /
    * insert / delete) so downstream [[readChanges]] consumers see the
    * deletes a CDC apply produces. A batch with no upserts and no
    * matched rows commits nothing (None) unless a `txn` marker must
    * be recorded. */
  def mergeIntoCdc(spark: SparkSession, dir: String, batch: DataFrame,
                   key: String, opCol: String = "op",
                   statCols: Seq[String] = Nil,
                   txn: Option[(String, Long)] = None,
                   cdf: Boolean = false): Option[Long] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, count, lit, raise_error, when}
    require(batch.columns.contains(opCol), s"CDC batch needs an '$opCol' column")
    val guarded = batch
      .withColumn("_m_n", count(lit(1)).over(Window.partitionBy(col(key))))
      .withColumn(key,
        when(col("_m_n") > 1,
          raise_error(lit(s"mergeIntoCdc: multiple batch rows share one $key"))
            .cast(batch.schema(key).dataType))
          .otherwise(col(key)))
      .withColumn(opCol,
        when(!col(opCol).isin("I", "U", "D"),
          raise_error(lit(s"mergeIntoCdc: $opCol must be I, U or D")))
          .otherwise(col(opCol)))
      .drop("_m_n")
    val upserts = guarded.filter(col(opCol) =!= "D").drop(opCol)
    val delKeys = batch.filter(col(opCol) === "D").select(col(key)).distinct()
    val allKeys = batch.select(col(key)).distinct()
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      txn.foreach { case (w, b) =>
        if (committedBatches(dir, w).contains(b)) return None
      }
      val parent = latestVersion(dir).getOrElse(-1L)
      val affected: Set[String] =
        affectedByKeys(spark, dir, parent, allKeys, key, batch.schema(key).dataType)
      if (affected.isEmpty && upserts.isEmpty)
        // nothing matched, nothing to insert: only a txn marker may
        // need recording (a retried empty CDC batch must stay no-op)
        return txn.flatMap { case (w, b) =>
          commit(dir, Seq(s"txn=$w:$b", "op=MERGE"), skipIfTxn = txn)
        }
      def affectedRead: DataFrame =
        pinnedReader(spark, dir, Some(parent)).parquet(
          affected.toSeq.map(rel => new File(dataDir(dir), rel).getPath): _*)
      val rewritten =
        if (affected.isEmpty) upserts
        else affectedRead.join(allKeys, Seq(key), "left_anti").unionByName(upserts)
      val staged = stageFiles(rewritten, dir)
      val cdfStaged: Seq[String] =
        if (!cdf) Nil
        else {
          val typed =
            if (affected.isEmpty) upserts.withColumn("_change_type", lit("insert"))
            else {
              val upsertKeys = upserts.select(col(key)).distinct()
              val oldUpMatched = affectedRead.join(upsertKeys, Seq(key), "left_semi")
              val matchedKeys = oldUpMatched.select(col(key)).distinct()
              oldUpMatched.withColumn("_change_type", lit("update_preimage"))
                .unionByName(upserts.join(matchedKeys, Seq(key), "left_semi")
                  .withColumn("_change_type", lit("update_postimage")))
                .unionByName(upserts.join(matchedKeys, Seq(key), "left_anti")
                  .withColumn("_change_type", lit("insert")))
                .unionByName(affectedRead.join(delKeys, Seq(key), "left_semi")
                  .withColumn("_change_type", lit("delete")))
            }
          stageFiles(typed, dir)
        }
      val adds =
        if (statCols.nonEmpty) statAddActions(spark, dir, staged, statCols)
        else staged.map("add=" + _)
      val actions = affected.toSeq.sorted.map("remove=" + _) ++ adds ++
        cdfStaged.map("cdf=" + _) ++
        txn.map { case (w, b) => s"txn=$w:$b" } :+ "op=MERGE"
      commitRewriteRebasing(dir, parent, actions, skipIfTxn = txn) match {
        case RewriteCommitted(v) => return Some(v)
        case other =>
          (staged ++ cdfStaged).map(_.takeWhile(_ != '/')).distinct
            .foreach(t => deleteRec(new File(dataDir(dir), t)))
          if (other == RewriteSkippedTxn) return None
      }
    }
    throw new IllegalStateException(s"gave up CDC-merging into $dir after 20 conflicts")
  }

  /** The change feed (Delta CDF shape, append-only): data files ADDED
    * by commits in `(sinceVersion, toVersion]`, stats suffixes
    * stripped. Pure log fold over exactly the interval's manifests —
    * O(commits polled), never O(history) — which is what a downstream
    * incremental pipeline polls instead of re-reading the table. A
    * ROW-REMOVING commit in the interval (`reset` from compact, or
    * `remove=` from deleteWhere/mergeInto) means the delta is not
    * expressible as added rows; the fold throws so the consumer falls
    * back to a full re-read. */
  def addedFilesSince(dir: String, sinceVersion: Long,
                      toVersion: Option[Long] = None): Seq[String] = {
    val to = resolved(dir, toVersion)
    require(to >= sinceVersion, s"change feed interval ($sinceVersion, $to] is negative")
    val md = manifestDir(dir)
    (sinceVersion + 1 to to).flatMap { v =>
      val mf = new File(md, s"v$v.manifest")
      if (!mf.isFile)
        throw new IllegalStateException(
          s"version $v missing from the log of $dir (vacuumed past it?)")
      val lines = readLog(mf, v)
      if (lines.contains("reset") || lines.exists(_.startsWith("remove=")))
        throw new IllegalStateException(
          s"change feed ($sinceVersion, $to] crosses a row-removing commit at v$v; " +
            "re-read the snapshot instead")
      lines.collect { case l if l.startsWith("add=") =>
        l.stripPrefix("add=").takeWhile(_ != '|')
      }
    }
  }

  /** Read the rows appended in `(sinceVersion, toVersion]` — the
    * incremental-consumption read. Empty interval (markers-only
    * commits, or nothing new) returns an empty frame in the table's
    * schema. */
  def readSince(spark: SparkSession, dir: String, sinceVersion: Long,
                toVersion: Option[Long] = None): DataFrame = {
    val rels = addedFilesSince(dir, sinceVersion, toVersion)
    // pin the feed to the target version's recorded schema (if the
    // table evolved): an interval spanning the evolution commit holds
    // files of BOTH shapes, and an unpinned read would take whichever
    // footer parquet sampled first — this applies equally to the
    // empty-interval fallback, whose frame must carry the CURRENT
    // schema, not a sampled pre-evolution one
    if (rels.nonEmpty)
      return pinnedReader(spark, dir, toVersion).parquet(
        rels.map(rel => new File(dataDir(dir), rel).getPath): _*)
    val all = snapshotFiles(dir, toVersion)
    if (all.isEmpty)
      throw new IllegalStateException(
        s"readSince on $dir: nothing added and the snapshot holds no files")
    pinnedReader(spark, dir, toVersion)
      .parquet(new File(dataDir(dir), all.head).getPath)
      .filter(org.apache.spark.sql.functions.lit(false))
  }

  /** The ROW-LEVEL change feed over `(sinceVersion, toVersion]` — the
    * full Delta CDF contract, superseding [[readSince]] wherever the
    * interval may contain deletes or merges: every row change in the
    * interval comes back tagged `_change_type` ∈ {insert,
    * update_preimage, update_postimage, delete} and `_commit_version`.
    * Per commit the classification is pure log metadata:
    *
    *  - a pure-append commit's `add=` files ARE its inserted rows —
    *    served directly, no change files needed (Delta does the same);
    *  - a commit carrying `cdf=` actions (a cdf-enabled DELETE/MERGE)
    *    serves exactly its change files — the rewritten survivor files
    *    it also adds are NOT row changes and are skipped;
    *  - a row-removing commit WITHOUT change data (`remove=`/`reset`
    *    from a cdf-less delete, compact, restore) is not expressible
    *    as a row feed: throws, consumer falls back to a snapshot
    *    re-read — the Delta rule when CDF wasn't enabled at write time.
    *
    * Feed cost: O(manifests polled) metadata + O(changed rows) data.
    * Applying inserts − deletes + (postimages − preimages) to a
    * downstream copy reconstructs the upstream snapshot exactly —
    * incremental view maintenance rides this (see
    * `sink_manifest_cdf_propagate`). */
  /** One commit's feed classification: (insert add= rels, cdf= rels).
    * A cdf-carrying commit serves ONLY its change files; a
    * row-removing commit without change data throws (not expressible
    * as a row feed). Shared by [[readChanges]] and the streaming
    * source's change-feed mode. */
  private[graft] def classifyChangeCommit(dir: String, v: Long,
                                          intervalDesc: String): (Seq[String], Seq[String]) = {
    val mf = new File(manifestDir(dir), s"v$v.manifest")
    if (!mf.isFile)
      throw new IllegalStateException(
        s"version $v missing from the log of $dir (vacuumed past it?)")
    val lines = readLog(mf, v)
    val cdfRels = lines.collect { case l if l.startsWith("cdf=") => l.stripPrefix("cdf=") }
    if (cdfRels.nonEmpty) (Nil, cdfRels)
    else if (lines.contains("reset") || lines.exists(_.startsWith("remove=")))
      throw new IllegalStateException(
        s"change feed $intervalDesc crosses a row-removing commit at v$v " +
          "written without change data; re-read the snapshot instead")
    else (lines.collect { case l if l.startsWith("add=") =>
      l.stripPrefix("add=").takeWhile(_ != '|')
    }, Nil)
  }

  def readChanges(spark: SparkSession, dir: String, sinceVersion: Long,
                  toVersion: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val to = resolved(dir, toVersion)
    require(to >= sinceVersion, s"change feed interval ($sinceVersion, $to] is negative")
    // change files carry the table schema AS OF their commit plus the
    // baked-in type column; pin to the target version's schema (when
    // the table evolved) so pre-evolution change files NULL-backfill
    val cdfReader = tableSchema(dir, Some(to)) match {
      case Some(st) => spark.read.schema(st.add(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = true)))
      case None => spark.read
    }
    val frames: Seq[DataFrame] = (sinceVersion + 1 to to).flatMap { v =>
      val (adds, cdfRels) = classifyChangeCommit(dir, v, s"($sinceVersion, $to]")
      if (cdfRels.nonEmpty)
        Some(cdfReader.parquet(
            cdfRels.map(rel => new File(dataDir(dir), rel).getPath): _*)
          .withColumn("_commit_version", lit(v)))
      else if (adds.isEmpty) None // markers-only commit: no row changes
      else Some(pinnedReader(spark, dir, Some(to)).parquet(
          adds.map(rel => new File(dataDir(dir), rel).getPath): _*)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(v)))
    }
    if (frames.nonEmpty)
      return frames.reduce(_.unionByName(_))
    // empty interval: an empty frame in the feed's schema
    val all = snapshotFiles(dir, Some(to))
    if (all.isEmpty)
      throw new IllegalStateException(
        s"readChanges on $dir: no changes and the snapshot holds no files")
    pinnedReader(spark, dir, Some(to))
      .parquet(new File(dataDir(dir), all.head).getPath)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(-1L))
      .filter(org.apache.spark.sql.functions.lit(false))
  }

  /** Default [[vacuum]] grace period: unreferenced files younger than
    * this survive, protecting a concurrent writer's staged-but-not-
    * yet-committed part files (the same race Delta's VACUUM retention
    * window exists for — its default is 7 days). */
  val DefaultVacuumGraceMs: Long = 24L * 60 * 60 * 1000

  /** Garbage-collect history. Keeps the newest `keepVersions` versions
    * (≥1): a checkpoint is first forced at the oldest KEPT version (so
    * later folds never need the dropped range), older manifests and
    * checkpoints are deleted (bounding time travel), then every data
    * file referenced by NO surviving version goes — which covers both
    * compacted-away files and crashed-writer orphans that never made a
    * manifest. Returns (files deleted, manifests deleted). Safe
    * against the read path: surviving versions' files are never
    * touched. Safe against WRITERS via `minAgeMs`: an in-flight
    * append's staged `txn-*` files are unreferenced until its commit
    * lands, so the sweep spares anything younger than the grace
    * period (mtime). Pass 0 only when no writer can be in flight. */
  def vacuum(dir: String, keepVersions: Int = 1,
             minAgeMs: Long = DefaultVacuumGraceMs): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val md = manifestDir(dir)
    val manifests = Option(md.listFiles()).getOrElse(Array.empty)
      .flatMap(f => versionOf(f, ".manifest").map(_ -> f)).sortBy(_._1)
    if (manifests.isEmpty) return (0, 0)
    val (drop, keep) = manifests.splitAt(math.max(0, manifests.length - keepVersions))
    val oldestKept = keep.head._1
    writeCheckpoint(dir, oldestKept) // folds BEFORE history is dropped
    // live = surviving versions' files, stats suffix STRIPPED — the
    // raw fold entries carry `|stat=..` for stats-commits and would
    // never string-match an on-disk relative path. Change-data files
    // named by a SURVIVING manifest stay too ([[readChanges]] over the
    // kept interval must still serve them); cdf files referenced only
    // by dropped history go with it — CDF retention = time-travel
    // retention, Delta's rule.
    val live: Set[String] =
      keep.flatMap { case (v, _) => fold(dir, v).files.map(_.takeWhile(_ != '|')) }.toSet ++
        keep.flatMap { case (v, f) => readLog(f, v).collect {
          case l if l.startsWith("cdf=") => l.stripPrefix("cdf=") } }
    drop.foreach { case (_, f) => f.delete(): Unit }
    // checkpoints strictly below the oldest kept version are useless now
    Option(md.listFiles()).getOrElse(Array.empty)
      .filter(f => versionOf(f, ".checkpoint").exists(_ < oldestKept))
      .foreach(_.delete(): Unit)
    val cutoff = System.currentTimeMillis() - minAgeMs
    var removed = 0
    for {
      txnDir <- Option(dataDir(dir).listFiles()).getOrElse(Array.empty)
      if txnDir.isDirectory
      f <- Option(txnDir.listFiles()).getOrElse(Array.empty)
    } {
      val rel = s"${txnDir.getName}/${f.getName}"
      if (!live.contains(rel) && f.lastModified() <= cutoff) {
        if (f.delete()) removed += 1
      }
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

  /** Atomically create the log file for exactly version `next` with
    * the given action lines. None if that version already exists. */
  private def tryCommitAt(dir: String, next: Long,
                          actions: Seq[String]): Option[Long] = {
    manifestDir(dir).mkdirs()
    val body = (s"version=$next" +: actions).mkString("\n") + "\n"
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
      if (next > 0 && next % CheckpointInterval == 0) writeCheckpoint(dir, next)
      Some(next)
    } catch {
      case _: FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        None
    }
  }

  /** Materialize the folded state at `v` as `v<v>.checkpoint`.
    * Idempotent and derived — losing the race to another checkpointer
    * is fine (the content is identical). */
  private def writeCheckpoint(dir: String, v: Long): Unit = {
    val target = Paths.get(manifestDir(dir).getPath, s"v$v.checkpoint")
    if (Files.exists(target)) return
    val st = fold(dir, v)
    val body = (s"version=$v" +:
      (st.schema.map("schema=" + _).toSeq ++
        st.files.map("add=" + _) ++ st.txns.toSeq.sorted.map("txn=" + _)))
      .mkString("\n") + "\n"
    val tmp = Paths.get(manifestDir(dir).getPath, s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, body.getBytes("UTF-8"))
    try {
      Files.createLink(target, tmp)
      Files.deleteIfExists(tmp)
    } catch {
      case _: FileAlreadyExistsException => Files.deleteIfExists(tmp)
    }
  }

  /** Commit `actions` on top of the current snapshot, retrying past
    * concurrent committers. */
  private def commit(dir: String, actions: Seq[String],
                     skipIfTxn: Option[(String, Long)] = None): Option[Long] = {
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      // re-check idempotence EVERY attempt: the committer we just lost
      // a version race to may have been a duplicate of this very batch
      skipIfTxn.foreach { case (wtr, b) =>
        if (committedBatches(dir, wtr).contains(b)) return None
      }
      val next = latestVersion(dir).getOrElse(-1L) + 1L
      tryCommitAt(dir, next, actions) match {
        case some @ Some(_) => return some
        case None => // lost the race: re-read, retry at N+1
      }
    }
    throw new IllegalStateException(s"gave up committing to $dir after 50 conflicts")
  }
}
