package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable
import java.nio.file.Files

/** Round-13 engine layer: the manifest-committed parquet table — the
  * Delta/Iceberg commit protocol reduced to its core. Pins the four
  * properties the protocol exists for: atomic exactly-one-winner
  * version commits, append losing nothing across conflicts, orphan
  * (crashed-writer) file invisibility, and time travel. */
class ManifestSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-mt-spec").toFile.getPath

  test("append + read round-trips across multiple commits") {
    val dir = freshDir()
    val v1 = ManifestTable.append(spark, (0 until 10).map(i => (i, s"a$i")).toDF("id", "v"), dir)
    val v2 = ManifestTable.append(spark, (10 until 25).map(i => (i, s"b$i")).toDF("id", "v"), dir)
    assert(v1 == 0 && v2 == 1)
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 25)
    assert(back.agg(sum($"id")).as[Long].head() == (0 until 25).sum)
  }

  test("orphan data files from a crashed writer are invisible to readers") {
    val dir = freshDir()
    ManifestTable.append(spark, (0 until 5).map(i => (i, "live")).toDF("id", "v"), dir)
    // a real parquet directory inside data/ that no manifest names
    (100 until 200).map(i => (i, "orphan")).toDF("id", "v")
      .write.parquet(s"$dir/data/txn-orphan")
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 5)
    assert(back.filter($"v" === "orphan").count() == 0)
  }

  test("time travel: old versions stay readable and exact") {
    val dir = freshDir()
    ManifestTable.append(spark, Seq((1, "x")).toDF("id", "v"), dir)
    ManifestTable.append(spark, Seq((2, "y"), (3, "z")).toDF("id", "v"), dir)
    assert(ManifestTable.read(spark, dir, Some(0L)).count() == 1)
    assert(ManifestTable.read(spark, dir, Some(1L)).count() == 3)
    assert(ManifestTable.latestVersion(dir).contains(1L))
  }

  test("version conflict has exactly one winner; the loser re-sequences without losing data") {
    val dir = freshDir()
    ManifestTable.append(spark, Seq((0, "base")).toDF("id", "v"), dir)
    // simulate two committers racing for v1: pre-create v1 by hand (the
    // "other" writer won), then append — our commit must land at v2
    // with both the base and its own rows live
    val mdir = new java.io.File(dir, "_manifest")
    val stolen = new java.io.File(mdir, "v1.manifest")
    // the "other" writer's commit carries only its own actions (here:
    // none — a marker-only commit is legal in the delta-log format)
    Files.write(stolen.toPath, "version=1\n".getBytes("UTF-8"))
    val got = ManifestTable.append(spark, Seq((9, "mine")).toDF("id", "v"), dir)
    assert(got == 2L, s"loser should re-sequence to v2, got v$got")
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 2)
    assert(back.filter($"v" === "mine").count() == 1)
  }

  test("idempotent batch append: a retried batch is a no-op, even after a conflict") {
    val dir = freshDir()
    val b0 = Seq((1, "b0")).toDF("id", "v")
    assert(ManifestTable.appendIdempotent(spark, b0, dir, "w", 0L).contains(0L))
    // post-commit-crash retry: same writer+batch → skipped, table unchanged
    assert(ManifestTable.appendIdempotent(spark, b0, dir, "w", 0L).isEmpty)
    assert(ManifestTable.read(spark, dir).count() == 1)
    // a DIFFERENT writer's batch 0 is independent
    assert(ManifestTable.appendIdempotent(spark, b0, dir, "w2", 0L).contains(1L))
    assert(ManifestTable.read(spark, dir).count() == 2)
    // markers survive unrelated commits: w's batch 0 still skipped
    ManifestTable.append(spark, Seq((9, "plain")).toDF("id", "v"), dir)
    assert(ManifestTable.appendIdempotent(spark, b0, dir, "w", 0L).isEmpty)
    assert(ManifestTable.committedBatches(dir, "w") == Set(0L))
  }

  test("compact rewrites the snapshot, keeps time travel, and carries txn markers") {
    val dir = freshDir()
    ManifestTable.append(spark, (0 until 10).map(i => (i, "a")).toDF("id", "v"), dir)
    ManifestTable.append(spark, (10 until 20).map(i => (i, "b")).toDF("id", "v"), dir)
    assert(ManifestTable.appendIdempotent(spark,
      Seq((20, "s")).toDF("id", "v"), dir, "w", 7L).isDefined)
    val preFiles = ManifestTable.snapshotFiles(dir).size
    val cv = ManifestTable.compact(spark, dir, targetFiles = 1)
    assert(cv == 3L)
    assert(ManifestTable.snapshotFiles(dir).size < preFiles)
    assert(ManifestTable.read(spark, dir).count() == 21)
    // time travel to the pre-compaction version still works
    assert(ManifestTable.read(spark, dir, Some(1L)).count() == 20)
    // a streaming writer's retried batch is STILL a no-op post-compaction
    assert(ManifestTable.appendIdempotent(spark,
      Seq((20, "s")).toDF("id", "v"), dir, "w", 7L).isEmpty)
    assert(ManifestTable.read(spark, dir).count() == 21)
  }

  test("compact aborted by a concurrent append never erases the appended rows") {
    val dir = freshDir()
    ManifestTable.append(spark, (0 until 8).map(i => (i, "a")).toDF("id", "v"), dir)
    // steal the version the compactor will want: simulate a concurrent
    // append landing between its read and its commit by pre-creating
    // v1 that adds a file (hand-built from a real staged write)
    val stagedDir = new java.io.File(dir, "data/txn-racer")
    Seq((99, "racer")).toDF("id", "v").write.parquet(stagedDir.getPath)
    val racerFiles = stagedDir.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => s"txn-racer/${f.getName}").sorted
    Files.write(new java.io.File(dir, "_manifest/v1.manifest").toPath,
      ("version=1" +: racerFiles.toSeq.map("add=" + _))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val cv = ManifestTable.compact(spark, dir)
    assert(cv == 2L, "compactor should restart from the racer's version")
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 9, "concurrent append erased by compaction")
    assert(back.filter($"v" === "racer").count() == 1)
  }

  test("vacuum deletes compacted-away files and orphans but never live ones") {
    val dir = freshDir()
    ManifestTable.append(spark, (0 until 10).map(i => (i, "a")).toDF("id", "v"), dir)
    ManifestTable.append(spark, (10 until 20).map(i => (i, "b")).toDF("id", "v"), dir)
    (100 until 110).map(i => (i, "orphan")).toDF("id", "v")
      .write.parquet(s"$dir/data/txn-crashed")
    ManifestTable.compact(spark, dir)
    val (files, manifests) = ManifestTable.vacuum(dir, keepVersions = 1, minAgeMs = 0)
    assert(manifests == 2, s"expected v0,v1 dropped, got $manifests")
    assert(files > 0, "nothing vacuumed")
    // the live snapshot is intact and orphans are gone from disk
    assert(ManifestTable.read(spark, dir).count() == 20)
    val onDisk = Option(new java.io.File(dir, "data").listFiles()).get
      .filter(_.isDirectory).flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .count(_.getName.endsWith(".parquet"))
    assert(onDisk == ManifestTable.snapshotFiles(dir).size,
      "disk carries files the manifest does not name")
    // time travel to vacuumed versions is gone — by design
    intercept[Exception](ManifestTable.read(spark, dir, Some(0L)).count())
  }

  test("commit metadata is O(batch), not O(table): manifests stay flat, checkpoints appear on schedule") {
    val dir = freshDir()
    for (i <- 0 until 25)
      ManifestTable.append(spark, Seq((i, s"r$i")).toDF("id", "v"), dir)
    val md = new java.io.File(dir, "_manifest")
    val manifests = md.listFiles().filter(_.getName.endsWith(".manifest")).sortBy(_.getName)
    assert(manifests.length == 25)
    // every manifest carries only ITS batch (1 part file => ~1 line):
    // growth with table size would show as later manifests dwarfing
    // early ones. 512 bytes bounds a 1-file commit with headroom.
    val sizes = manifests.map(_.length())
    assert(sizes.max <= 512,
      s"a manifest grew with table size: max ${sizes.max} bytes")
    // checkpoints at every CheckpointInterval-th version
    val ckpts = md.listFiles().filter(_.getName.endsWith(".checkpoint")).map(_.getName).sorted
    assert(ckpts.contains("v10.checkpoint") && ckpts.contains("v20.checkpoint"),
      s"missing scheduled checkpoints: ${ckpts.mkString(",")}")
    // and the fold off the newest checkpoint reads the same table
    assert(ManifestTable.read(spark, dir).count() == 25)
    assert(ManifestTable.read(spark, dir, Some(12L)).count() == 13)
  }

  test("file skipping: stats prune non-overlapping files, stats-less files are never skipped") {
    val dir = freshDir()
    ManifestTable.appendWithStats(spark,
      (0 until 10).map(i => (i.toLong, s"a$i")).toDF("k", "v").coalesce(1), dir, "k")
    ManifestTable.appendWithStats(spark,
      (100 until 110).map(i => (i.toLong, s"b$i")).toDF("k", "v").coalesce(1), dir, "k")
    // a plain append carries no stats: unknown range, always planned
    ManifestTable.append(spark, Seq((55L, "nostat")).toDF("k", "v"), dir)
    assert(ManifestTable.plannedFilesForRange(dir, "k", 0, 5).size == 2,
      "expected the [0,9] file + the stats-less file")
    assert(ManifestTable.plannedFilesForRange(dir, "k", 200, 300).size == 1,
      "only the stats-less file can overlap [200,300]")
    val got = ManifestTable.readRange(spark, dir, "k", 3, 104)
      .select($"k").as[Long].collect().sorted
    assert(got.sameElements((3L to 9L) ++ Seq(55L) ++ (100L to 104L)),
      s"residual filter wrong: ${got.mkString(",")}")
    // compaction rewrites without stats: correct, just not prunable
    ManifestTable.compact(spark, dir)
    assert(ManifestTable.readRange(spark, dir, "k", 3, 4).count() == 2)
    assert(ManifestTable.plannedFilesForRange(dir, "k", 1000, 2000).size ==
      ManifestTable.snapshotFiles(dir).size, "post-compaction files have unknown ranges")
  }

  test("vacuum never deletes the live files of a stats-carrying table") {
    // regression: the live set must strip the |stat=.. suffix from
    // fold entries, or every appendWithStats file looks like an orphan
    val dir = freshDir()
    ManifestTable.appendWithStats(spark,
      (0 until 10).map(i => (i.toLong, s"a$i")).toDF("k", "v").coalesce(1), dir, "k")
    ManifestTable.appendWithStats(spark,
      (100 until 110).map(i => (i.toLong, s"b$i")).toDF("k", "v").coalesce(1), dir, "k")
    val live = ManifestTable.snapshotFiles(dir)
    ManifestTable.vacuum(dir, keepVersions = 1, minAgeMs = 0)
    assert(live.forall(r => new java.io.File(dir, s"data/$r").isFile),
      "vacuum deleted LIVE stats-carrying data files")
    assert(ManifestTable.read(spark, dir).count() == 20)
    // and the stats still prune
    assert(ManifestTable.plannedFilesForRange(dir, "k", 0, 5).size == 1)
  }

  test("vacuum grace period: young unreferenced files survive (in-flight writer race), old ones die") {
    val dir = freshDir()
    ManifestTable.append(spark, (0 until 5).map(i => (i, "live")).toDF("id", "v"), dir)
    // an in-flight writer's staged-but-uncommitted files (young mtime)
    val staged = new java.io.File(dir, "data/txn-inflight")
    Seq((99, "inflight")).toDF("id", "v").write.parquet(staged.getPath)
    val stagedRels = staged.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => s"txn-inflight/${f.getName}").sorted
    // a crashed writer's orphan from long ago (old mtime)
    val old = new java.io.File(dir, "data/txn-ancient")
    Seq((50, "ancient")).toDF("id", "v").write.parquet(old.getPath)
    old.listFiles().foreach(f => assert(f.setLastModified(
      System.currentTimeMillis() - 48L * 3600 * 1000)))
    val (removed, _) = ManifestTable.vacuum(dir, keepVersions = 1)
    assert(stagedRels.forall(r => new java.io.File(dir, s"data/$r").isFile),
      "vacuum destroyed an in-flight writer's staged files")
    assert(!new java.io.File(dir, "data/txn-ancient").exists(),
      s"old orphan survived (removed=$removed)")
    // the race completes: the in-flight writer now COMMITS its staged
    // files, and the table reads back whole
    Files.write(new java.io.File(dir, "_manifest/v1.manifest").toPath,
      ("version=1" +: stagedRels.toSeq.map("add=" + _))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 6, "committed-after-vacuum rows lost")
    assert(back.filter($"v" === "inflight").count() == 1)
  }

  test("multi-column stats: each stated column prunes independently") {
    val dir = freshDir()
    // file A: k in [0,9], m in [1000,1009]; file B: k in [100,109], m in [0,9]
    ManifestTable.appendWithStats(spark,
      (0 until 10).map(i => (i.toLong, 1000L + i, "a")).toDF("k", "m", "v").coalesce(1),
      dir, "k", "m")
    ManifestTable.appendWithStats(spark,
      (100 until 110).map(i => (i.toLong, i.toLong - 100, "b")).toDF("k", "m", "v").coalesce(1),
      dir, "k", "m")
    assert(ManifestTable.plannedFilesForRange(dir, "k", 0, 5).size == 1)
    assert(ManifestTable.plannedFilesForRange(dir, "m", 0, 5).size == 1)
    assert(ManifestTable.readRange(spark, dir, "m", 1000, 1003).count() == 4)
    // a column with no recorded stats is never skipped
    assert(ManifestTable.plannedFilesForRange(dir, "nope", 0, 0).size == 2)
    // zero-row slices are dropped at commit: no stats-less debris
    ManifestTable.appendWithStats(spark,
      (0 until 10).map(i => (i.toLong, i.toLong, "c")).toDF("k", "m", "v")
        .filter($"k" < 0).coalesce(1), dir, "k", "m")
    assert(ManifestTable.snapshotFiles(dir).size == 2,
      "an empty slice committed a zero-row file")
  }

  test("clustered compaction preserves prunability: tight disjoint per-file bounds") {
    val dir = freshDir()
    // interleaved ranges: plain compaction would leave unknown ranges
    ManifestTable.appendWithStats(spark,
      Seq(0L, 100L, 7L, 103L, 2L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1), dir, "k")
    ManifestTable.appendWithStats(spark,
      Seq(5L, 108L, 1L, 101L, 9L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1), dir, "k")
    val cv = ManifestTable.compactClustered(spark, dir, targetFiles = 2, statCols = Seq("k"))
    assert(cv == 2L)
    assert(ManifestTable.read(spark, dir).count() == 10)
    val stats = ManifestTable.snapshotFilesWithStats(dir)
    assert(stats.size == 2 && stats.forall(_._2.contains("k")),
      "clustered compaction dropped the column stats")
    // clustering makes the two files' ranges disjoint: a low probe
    // plans exactly one file (pre-compaction both files overlapped)
    assert(ManifestTable.plannedFilesForRange(dir, "k", 0, 3).size == 1,
      s"ranges not disjoint after clustering: ${stats.map(_._2("k"))}")
    assert(ManifestTable.readRange(spark, dir, "k", 0, 3).count() == 3)
    // plain compact still degrades to unknown ranges (correct, unpruned)
    ManifestTable.compact(spark, dir)
    assert(ManifestTable.plannedFilesForRange(dir, "k", 1000, 2000).size ==
      ManifestTable.snapshotFiles(dir).size)
  }

  test("deleteWhere: copy-on-write delete, time travel intact, untouched stats preserved") {
    val dir = freshDir()
    ManifestTable.appendWithStats(spark,
      (0 until 10).map(i => (i.toLong, s"a$i")).toDF("k", "v").coalesce(1), dir, "k")
    ManifestTable.appendWithStats(spark,
      (100 until 110).map(i => (i.toLong, s"b$i")).toDF("k", "v").coalesce(1), dir, "k")
    val dv = ManifestTable.deleteWhere(spark, dir, $"k" >= 104, Seq("k"))
    assert(dv.contains(2L))
    val back = ManifestTable.read(spark, dir).select($"k").as[Long].collect().sorted
    assert(back.sameElements((0L to 9L) ++ (100L to 103L)), back.mkString(","))
    // time travel: the pre-delete snapshot still folds whole
    assert(ManifestTable.read(spark, dir, Some(1L)).count() == 20)
    // the untouched file kept its stats verbatim; the rewritten file
    // got fresh bounds covering only its survivors
    assert(ManifestTable.plannedFilesForRange(dir, "k", 0, 5).size == 1)
    assert(ManifestTable.plannedFilesForRange(dir, "k", 105, 200).isEmpty,
      "rewritten file's stats still cover deleted rows")
    // a delete matching nothing commits nothing
    assert(ManifestTable.deleteWhere(spark, dir, $"k" > 9999).isEmpty)
    assert(ManifestTable.latestVersion(dir).contains(2L))
  }

  test("deleteWhere: NULL-predicate rows survive (SQL DELETE semantics)") {
    val dir = freshDir()
    ManifestTable.append(spark,
      Seq((1L, Some("x")), (2L, None), (3L, Some("kill"))).toDF("k", "v"), dir)
    ManifestTable.deleteWhere(spark, dir, $"v" === "kill")
    val back = ManifestTable.read(spark, dir).select($"k").as[Long].collect().sorted
    assert(back.sameElements(Seq(1L, 2L)), s"NULL row deleted: ${back.mkString(",")}")
  }

  test("deleteWhere aborted by a concurrent append restarts and never erases the appended rows") {
    val dir = freshDir()
    ManifestTable.append(spark, (0 until 8).map(i => (i, "a")).toDF("id", "v"), dir)
    // steal v1 with a hand-committed concurrent append (the compact-race recipe)
    val stagedDir = new java.io.File(dir, "data/txn-racer2")
    Seq((99, "racer")).toDF("id", "v").write.parquet(stagedDir.getPath)
    val racerFiles = stagedDir.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => s"txn-racer2/${f.getName}").sorted
    Files.write(new java.io.File(dir, "_manifest/v1.manifest").toPath,
      ("version=1" +: racerFiles.toSeq.map("add=" + _))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val dv = ManifestTable.deleteWhere(spark, dir, $"id" < 4)
    assert(dv.contains(2L), "delete should restart on top of the racer's commit")
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 5, "concurrent append erased by delete")
    assert(back.filter($"v" === "racer").count() == 1)
  }

  test("change feed: readSince returns exactly the interval's added rows; resets refuse") {
    val dir = freshDir()
    ManifestTable.append(spark, (0 until 10).map(i => (i, "a")).toDF("id", "v"), dir)
    ManifestTable.append(spark, (10 until 15).map(i => (i, "b")).toDF("id", "v"), dir)
    ManifestTable.append(spark, (15 until 18).map(i => (i, "c")).toDF("id", "v"), dir)
    // (0, 2]: versions 1 and 2 only
    val feed = ManifestTable.readSince(spark, dir, 0L)
      .select($"id").as[Int].collect().sorted
    assert(feed.sameElements(10 until 18), feed.mkString(","))
    // bounded upper end
    assert(ManifestTable.readSince(spark, dir, 0L, Some(1L)).count() == 5)
    // full table from the epoch
    assert(ManifestTable.readSince(spark, dir, -1L).count() == 18)
    // empty interval: empty frame, table schema
    val empty = ManifestTable.readSince(spark, dir, 2L)
    assert(empty.count() == 0 && empty.columns.sameElements(Array("id", "v")))
    // a replacing commit is not expressible as added rows
    ManifestTable.compact(spark, dir)
    intercept[IllegalStateException](ManifestTable.readSince(spark, dir, 2L))
    // …but the feed AFTER the reset works again
    ManifestTable.append(spark, Seq((99, "d")).toDF("id", "v"), dir)
    assert(ManifestTable.readSince(spark, dir, 3L).count() == 1)
  }

  private def manifestLines(dir: String, v: Long): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(
      new java.io.File(dir, s"_manifest/v$v.manifest").toPath).asScala.toSeq
  }

  test("deleteWhere commit metadata is O(affected files), not O(live files)") {
    val dir = freshDir()
    // 8 live single-file commits; the predicate matches rows in exactly one
    for (s <- 0 until 8)
      ManifestTable.appendWithStats(spark,
        (s * 10 until s * 10 + 10).map(i => (i.toLong, s"s$s")).toDF("k", "v")
          .coalesce(1), dir, "k")
    val dv = ManifestTable.deleteWhere(spark, dir, $"k" >= 32 && $"k" < 35, Seq("k"))
    assert(dv.contains(8L))
    val lines = manifestLines(dir, 8L).drop(1) // drop version= header
    assert(!lines.contains("reset"), "delete wrote a replacing commit")
    assert(lines.count(_.startsWith("remove=")) == 1,
      s"expected exactly 1 remove, got:\n${lines.mkString("\n")}")
    // header-free line budget: 1 remove + the survivors' adds (1 staged
    // file here) — never the 8 live files
    assert(lines.size <= 3, s"delete commit is O(live files):\n${lines.mkString("\n")}")
    // untouched files never re-listed, their stats still prune
    assert(ManifestTable.plannedFilesForRange(dir, "k", 70, 79).size == 1)
    assert(ManifestTable.read(spark, dir).count() == 77)
  }

  test("rewrite rebase: a concurrent pure append commutes — no re-plan, no lost rows") {
    val dir = freshDir()
    ManifestTable.append(spark,
      (0 until 6).map(i => (i, "a")).toDF("id", "v").coalesce(1), dir)
    // plan a rewrite against v0: remove v0's (single) file, add a replacement
    val victim = ManifestTable.snapshotFiles(dir).head
    val stagedDir = new java.io.File(dir, "data/txn-rebase")
    Seq((100, "rw")).toDF("id", "v").write.parquet(stagedDir.getPath)
    val mine = stagedDir.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => s"txn-rebase/${f.getName}").toSeq.sorted
    // a concurrent append steals v1 BEFORE the rewrite commits
    ManifestTable.append(spark, Seq((200, "race")).toDF("id", "v"), dir)
    val res = ManifestTable.commitRewriteRebasing(dir, parent = 0L,
      actions = s"remove=$victim" +: mine.map("add=" + _))
    assert(res == ManifestTable.RewriteCommitted(2L),
      s"rewrite should rebase onto the append, got $res")
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 2, "rebased rewrite lost the concurrent append")
    assert(back.filter($"v" === "race").count() == 1)
    assert(back.filter($"v" === "rw").count() == 1)
  }

  test("rewrite rebase: DISJOINT concurrent removes commute; OVERLAPPING ones conflict") {
    val dir = freshDir()
    ManifestTable.append(spark,
      (0 until 6).map(i => (i.toLong, "a")).toDF("k", "v").coalesce(1), dir)
    ManifestTable.append(spark,
      (10 until 16).map(i => (i.toLong, "b")).toDF("k", "v").coalesce(1), dir)
    val files = ManifestTable.snapshotFiles(dir)
    // a concurrent DELETE rewrites file B (remove-carrying commit at v2)
    assert(ManifestTable.deleteWhere(spark, dir, $"k" >= 12).isDefined)
    // the Delta disjoint-file-set rule: OUR rewrite touches only file
    // A, so the concurrent remove of file B commutes — both land
    // without either redoing its scan
    val disjoint = ManifestTable.commitRewriteRebasing(dir, parent = 1L,
      actions = Seq(s"remove=${files(0)}"))
    assert(disjoint == ManifestTable.RewriteCommitted(3L), s"got $disjoint")
    // an OVERLAPPING remove still conflicts: file B was rewritten at
    // v2, so a rebase that touches it must re-plan
    val overlap = ManifestTable.commitRewriteRebasing(dir, parent = 1L,
      actions = Seq(s"remove=${files(1)}"))
    assert(overlap == ManifestTable.RewriteConflict, s"got $overlap")
    // a DELETION-VECTOR mask counts as touching its file too
    val dir2 = freshDir()
    ManifestTable.appendWithStats(spark,
      (0L until 50L).map(i => (i, "x")).toDF("k", "v").coalesce(1), dir2, "k")
    val f2 = ManifestTable.snapshotFiles(dir2).head
    ManifestTable.deleteWhere(spark, dir2, $"k" === 1L, dvFraction = 0.1)
    val dvOverlap = ManifestTable.commitRewriteRebasing(dir2, parent = 0L,
      actions = Seq(s"remove=$f2"))
    assert(dvOverlap == ManifestTable.RewriteConflict, s"got $dvOverlap")
  }

  test("mergeInto: matched rows replaced, unmatched inserted, commit is O(affected)") {
    val dir = freshDir()
    for (s <- 0 until 4)
      ManifestTable.appendWithStats(spark,
        (s * 10 until s * 10 + 10).map(i => (i.toLong, s"old$i", 1L))
          .toDF("k", "v", "gen").coalesce(1), dir, "k")
    val preV = ManifestTable.latestVersion(dir).get
    // batch: updates hit file 2 only (k=25..27), inserts are fresh keys
    val batch = ((25 until 28).map(i => (i.toLong, s"new$i", 2L)) ++
      Seq((100L, "ins100", 2L), (101L, "ins101", 2L))).toDF("k", "v", "gen")
    val mv = ManifestTable.mergeInto(spark, dir, batch, "k", statCols = Seq("k"))
    assert(mv.contains(preV + 1), "merge must be ONE commit")
    val lines = manifestLines(dir, preV + 1).drop(1)
    assert(lines.count(_.startsWith("remove=")) == 1,
      s"expected 1 remove (one affected file):\n${lines.mkString("\n")}")
    assert(!lines.contains("reset"))
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 42, s"40 - 3 matched + 3 updates + 2 inserts")
    assert(back.filter($"gen" === 2L).count() == 5)
    assert(back.filter($"k" === 26L).select($"v").as[String].head() == "new26")
    assert(back.filter($"k" === 5L).select($"v").as[String].head() == "old5")
    // untouched files' stats survive; time travel to pre-merge intact
    assert(ManifestTable.plannedFilesForRange(dir, "k", 0, 5).size == 1)
    assert(ManifestTable.read(spark, dir, Some(preV)).count() == 40)
    // a merge with no matches is a pure insert — still one commit
    val mv2 = ManifestTable.mergeInto(spark, dir,
      Seq((200L, "ins200", 3L)).toDF("k", "v", "gen"), "k")
    assert(mv2.contains(preV + 2))
    assert(ManifestTable.read(spark, dir).count() == 43)
  }

  test("mergeInto plans via key stats: disjoint batch inserts without touching a file") {
    val dir = freshDir()
    ManifestTable.appendWithStats(spark,
      (0 until 10).map(i => (i.toLong, "a")).toDF("k", "v").coalesce(1), dir, "k")
    ManifestTable.appendWithStats(spark,
      (100 until 110).map(i => (i.toLong, "b")).toDF("k", "v").coalesce(1), dir, "k")
    // batch range [500, 501] overlaps NO file: pure insert, zero removes
    val mv = ManifestTable.mergeInto(spark, dir,
      Seq((500L, "x"), (501L, "y")).toDF("k", "v"), "k", statCols = Seq("k"))
    assert(mv.contains(2L))
    assert(manifestLines(dir, 2L).drop(1).count(_.startsWith("remove=")) == 0,
      "disjoint merge rewrote a file")
    assert(ManifestTable.read(spark, dir).count() == 22)
    // batch inside ONE file's range rewrites exactly that file
    val mv2 = ManifestTable.mergeInto(spark, dir,
      Seq((105L, "upd")).toDF("k", "v"), "k", statCols = Seq("k"))
    assert(mv2.contains(3L))
    assert(manifestLines(dir, 3L).drop(1).count(_.startsWith("remove=")) == 1,
      "narrow merge rewrote more than its one matched file")
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 22)
    assert(back.filter($"v" === "upd").count() == 1)
    assert(ManifestTable.plannedFilesForRange(dir, "k", 0, 5).size == 1,
      "merge dropped the untouched file's stats")
  }

  test("mergeInto: txn marker makes the retried batch a no-op") {
    val dir = freshDir()
    ManifestTable.append(spark,
      (0 until 10).map(i => (i.toLong, s"a$i")).toDF("k", "v"), dir)
    val batch = Seq((3L, "upd3"), (50L, "ins50")).toDF("k", "v")
    val first = ManifestTable.mergeInto(spark, dir, batch, "k",
      txn = Some(("merger", 7L)))
    assert(first.isDefined)
    val dup = ManifestTable.mergeInto(spark, dir, batch, "k",
      txn = Some(("merger", 7L)))
    assert(dup.isEmpty, "retried MERGE batch applied twice")
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 11)
    assert(back.filter($"v" === "upd3").count() == 1)
  }

  test("mergeInto: duplicate keys in the batch are an error, nothing commits") {
    val dir = freshDir()
    ManifestTable.append(spark, Seq((1L, "a")).toDF("k", "v"), dir)
    val bad = Seq((2L, "x"), (2L, "y")).toDF("k", "v")
    val e = intercept[Exception](
      ManifestTable.mergeInto(spark, dir, bad, "k"))
    assert(e.getMessage != null)
    assert(ManifestTable.latestVersion(dir).contains(0L),
      "failed merge advanced the log")
    assert(ManifestTable.read(spark, dir).count() == 1)
  }

  test("mergeInto aborted by a concurrent append rebases and never erases the appended rows") {
    val dir = freshDir()
    ManifestTable.append(spark, (0 until 8).map(i => (i.toLong, "a")).toDF("k", "v"), dir)
    // steal v1 with a hand-committed concurrent append
    val stagedDir = new java.io.File(dir, "data/txn-mracer")
    Seq((99L, "racer")).toDF("k", "v").write.parquet(stagedDir.getPath)
    val racerFiles = stagedDir.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => s"txn-mracer/${f.getName}").sorted
    Files.write(new java.io.File(dir, "_manifest/v1.manifest").toPath,
      ("version=1" +: racerFiles.toSeq.map("add=" + _))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val mv = ManifestTable.mergeInto(spark, dir,
      Seq((3L, "upd")).toDF("k", "v"), "k")
    assert(mv.contains(2L))
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 9, "concurrent append erased by merge")
    assert(back.filter($"v" === "racer").count() == 1)
    assert(back.filter($"v" === "upd").count() == 1)
  }

  test("change feed refuses an interval crossing a remove-carrying delete commit") {
    val dir = freshDir()
    ManifestTable.append(spark, (0 until 10).map(i => (i.toLong, "a")).toDF("k", "v"), dir)
    ManifestTable.deleteWhere(spark, dir, $"k" >= 5)
    intercept[IllegalStateException](ManifestTable.readSince(spark, dir, -1L))
    // …but the feed after the delete works again
    ManifestTable.append(spark, Seq((99L, "b")).toDF("k", "v"), dir)
    assert(ManifestTable.readSince(spark, dir, 1L).count() == 1)
  }

  test("compactZorder: live-table OPTIMIZE re-clusters for multi-dimension pruning, data intact") {
    val dir = freshDir()
    // k ascending, y deliberately uncorrelated with k — appended in 4
    // k-ordered slices, so pre-OPTIMIZE files are tight in k only
    val rows = (0 until 256).map(i => (i.toLong, ((i * 37) % 256).toLong, s"r$i"))
    for (s4 <- 0 until 4)
      ManifestTable.appendWithStats(spark,
        rows.slice(s4 * 64, s4 * 64 + 64).toDF("k", "y", "v").coalesce(1),
        dir, "k", "y")
    def planned2d(kLo: Long, kHi: Long, yLo: Long, yHi: Long): Int =
      ManifestTable.snapshotFilesWithStats(dir).count { case (_, st) =>
        st.get("k").forall { case (mn, mx) => mx >= kLo && mn <= kHi } &&
          st.get("y").forall { case (mn, mx) => mx >= yLo && mn <= yHi }
      }
    // the mixed workload a multi-tenant table actually serves: one
    // k-rectangle and one y-rectangle. Pre-OPTIMIZE the y query reads
    // EVERYTHING (each k-slice spans ~the full y range).
    def workloadFraction(): Double = {
      val live = ManifestTable.snapshotFiles(dir).size.toDouble
      (planned2d(64, 127, Long.MinValue, Long.MaxValue) +
        planned2d(Long.MinValue, Long.MaxValue, 0, 63)) / (2 * live)
    }
    val preFrac = workloadFraction()
    val v = ManifestTable.compactZorder(spark, dir, targetFiles = 16, "k", "y")
    assert(ManifestTable.latestVersion(dir).contains(v))
    // data survives the rewrite byte-for-byte
    val back = ManifestTable.read(spark, dir)
      .select($"k", $"y", $"v").as[(Long, Long, String)].collect().sorted
    assert(back.sameElements(rows.sorted), "OPTIMIZE lost or mutated rows")
    // time travel to the pre-rewrite layout still folds
    assert(ManifestTable.read(spark, dir, Some(v - 1)).count() == 256)
    val live = ManifestTable.snapshotFiles(dir).size
    assert(live > 4, s"expected a multi-file rewrite, got $live")
    // the 2-D rectangle prunes in BOTH dimensions post-OPTIMIZE
    val post2d = planned2d(64, 127, 64, 127)
    assert(post2d < live, s"2-D rectangle read the whole table: $post2d of $live")
    // a y-only predicate now prunes too — impossible pre-OPTIMIZE…
    val yOnly = planned2d(Long.MinValue, Long.MaxValue, 0, 63)
    assert(yOnly < live, s"y-only range read the whole table: $yOnly of $live")
    // …and the mixed workload's planned FRACTION drops (z-order trades
    // a little leading-column tightness for pruning in every dimension)
    val postFrac = workloadFraction()
    assert(postFrac < preFrac,
      f"workload fraction did not improve: $postFrac%.3f vs $preFrac%.3f")
  }

  test("schema evolution: NULL backfill, time travel to old schema, checkpoint carries schema") {
    val dir = freshDir()
    ManifestTable.appendEvolving(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), dir)
    ManifestTable.appendEvolving(spark,
      Seq((3L, "c", 30L)).toDF("k", "v", "extra").coalesce(1), dir)
    val latest = ManifestTable.read(spark, dir)
    assert(latest.columns.sameElements(Array("k", "v", "extra")))
    assert(latest.filter($"extra".isNull).count() == 2, "legacy rows not NULL-backfilled")
    assert(latest.filter($"extra" === 30L).count() == 1)
    // time travel presents the pre-evolution schema
    assert(ManifestTable.read(spark, dir, Some(0L)).columns.sameElements(Array("k", "v")))
    assert(ManifestTable.tableSchema(dir, Some(0L)).get.fieldNames.sameElements(Array("k", "v")))
    // dropping a column is not additive
    intercept[IllegalArgumentException](
      ManifestTable.appendEvolving(spark, Seq((4L, 40L)).toDF("k", "extra"), dir))
    // the recorded schema survives a checkpoint + readSince pins to it
    for (i <- 0 until 10)
      ManifestTable.append(spark, Seq((100L + i, s"x$i", i.toLong)).toDF("k", "v", "extra"), dir)
    assert(new java.io.File(dir, "_manifest/v10.checkpoint").isFile)
    assert(ManifestTable.read(spark, dir).columns.sameElements(Array("k", "v", "extra")))
    val feed = ManifestTable.readSince(spark, dir, 0L, Some(1L))
    assert(feed.columns.sameElements(Array("k", "v", "extra")))
  }

  test("concurrent appends from many threads: every row survives, versions are dense") {
    val dir = freshDir()
    val threads = (0 until 6).map { t =>
      new Thread(() => {
        ManifestTable.append(spark,
          (0 until 10).map(i => (t * 100 + i, s"t$t")).toDF("id", "v"), dir): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 60, "a conflicting append lost rows")
    assert(back.select($"id").distinct().count() == 60)
    assert(ManifestTable.latestVersion(dir).contains(5L), "versions not dense 0..5")
  }
}
