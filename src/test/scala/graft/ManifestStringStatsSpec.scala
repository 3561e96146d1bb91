package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable
import java.nio.file.Files

/** Round-16 engine layer: NON-LONG column stats — truncated string
  * bounds (the Iceberg truncate(16) + upper-bound-bump shape) in the
  * manifest, pruning string-range reads and string-keyed MERGE
  * planning. Pins the codec's bound contract (a truncated min is ≤
  * everything it bounds, a bumped max is ≥ everything it bounds, in
  * UTF-8 byte order), the degenerate cases (shared >16-byte prefix,
  * all-0xFF prefix), and end-to-end pruning census correctness. */
class ManifestStringStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-sstat-spec").toFile.getPath

  test("truncation codec: min prefix and bumped max bound every value") {
    val vals = Seq("alpha", "a" * 40, "zulu-very-long-string-tail", "Ω≤≥-unicode-suffix-padding-x",
      "prefix-shared-prefix-shared-A", "prefix-shared-prefix-shared-B")
    vals.foreach { v =>
      val mn = ManifestTable.truncMinUtf8(v)
      assert(mn.length <= 16)
      assert(ManifestTable.utf8Lex(mn, v.getBytes("UTF-8")) <= 0,
        s"truncated min must lower-bound '$v'")
      ManifestTable.truncMaxUtf8(v).foreach { mx =>
        assert(ManifestTable.utf8Lex(mx, v.getBytes("UTF-8")) >= 0,
          s"bumped max must upper-bound '$v'")
      }
    }
    // short strings round-trip untruncated
    assert(new String(ManifestTable.truncMinUtf8("abc"), "UTF-8") == "abc")
    assert(new String(ManifestTable.truncMaxUtf8("abc").get, "UTF-8") == "abc")
    // an all-0xFF 16-byte prefix cannot be bumped: no upper bound
    val ff = new String(Array.fill(17)(0xff.toByte).map(_ => 'ÿ'))
    // 'ÿ' is 0xc3 0xbf in UTF-8 — build a REAL all-0xFF prefix via bytes
    assert(ManifestTable.truncMaxUtf8(ff).isDefined) // ÿ* is fine (0xc3 < 0xff)
    assert(ManifestTable.utf8Lex(Array[Byte](0x01), Array[Byte](0x01, 0x02)) < 0)
    assert(ManifestTable.utf8Lex(
      Array(0xff.toByte), Array(0x01.toByte)) > 0) // unsigned compare
  }

  test("string-range read plans only overlapping files and stays exact") {
    val dir = freshDir()
    // 4 disjoint alphabetic slices
    val slices = Seq("a" -> "c", "d" -> "f", "g" -> "m", "n" -> "z")
    slices.zipWithIndex.foreach { case ((lo, hi), i) =>
      val rows = (0 until 50).map { j =>
        val c = (lo(0) + (j % (hi(0) - lo(0) + 1))).toChar
        (i * 50L + j, s"$c-key-$j")
      }
      ManifestTable.appendWithStats(spark,
        rows.toDF("id", "k").coalesce(1), dir, "k")
    }
    // a range inside slice 1 plans exactly 1 file
    assert(ManifestTable.plannedFilesForStringRange(dir, "k", "d", "e~").size == 1)
    val got = ManifestTable.readRangeString(spark, dir, "k", "d", "e~")
      .select($"k").as[String].collect()
    assert(got.nonEmpty && got.forall(k => k >= "d" && k <= "e~"))
    // full-alphabet range plans all 4; an impossible range plans 0
    assert(ManifestTable.plannedFilesForStringRange(dir, "k", "a", "zz").size == 4)
    assert(ManifestTable.plannedFilesForStringRange(dir, "k", "0", "1").isEmpty)
  }

  test("a shared >16-byte prefix degrades pruning but never correctness") {
    val dir = freshDir()
    val p = "shared-very-long-common-prefix-"
    ManifestTable.appendWithStats(spark,
      (0 until 20).map(i => (i.toLong, f"$p$i%03d")).toDF("id", "k").coalesce(1),
      dir, "k")
    ManifestTable.appendWithStats(spark,
      (20 until 40).map(i => (i.toLong, f"$p$i%03d")).toDF("id", "k").coalesce(1),
      dir, "k")
    // truncated bounds collapse to the prefix: both files plan (superset,
    // correct) and the residual filter still returns exact rows
    val res = ManifestTable.readRangeString(spark, dir, "k", s"${p}005", s"${p}007")
      .select($"id").as[Long].collect().sorted
    assert(res.sameElements(Array(5L, 6L, 7L)))
  }

  test("string-keyed MERGE plans through sstat bounds") {
    val dir = freshDir()
    for (i <- 0 until 4)
      ManifestTable.appendWithStats(spark,
        (0 until 25).map(j => (f"k${i * 25 + j}%05d", (i * 25 + j).toLong))
          .toDF("k", "v").coalesce(1), dir, "k")
    // a narrow batch keyed in slice 2: merge must touch slice 2's rows
    val v = ManifestTable.mergeInto(spark, dir,
      Seq(("k00060", 6000L), ("k99999", 1L)).toDF("k", "v"), "k",
      statCols = Seq("v"))
    assert(v.nonEmpty)
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 101L)
    assert(back.filter($"k" === "k00060").select($"v").as[Long].head() == 6000L)
    assert(back.filter($"k" === "k99999").count() == 1L)
    // untouched slices keep their entries verbatim (stats suffix intact)
    val entries = ManifestTable.snapshotFilesWithStringStats(dir)
    assert(entries.count(_._2.contains("k")) >= 3,
      "merge must not strip sstat bounds from untouched files")
  }

  test("mixed long + string stats ride one entry") {
    val dir = freshDir()
    ManifestTable.appendWithStats(spark,
      (0L until 30L).map(i => (i, f"s$i%04d", i * 2)).toDF("id", "k", "v")
        .coalesce(1), dir, "id", "k", "v")
    val longStats = ManifestTable.snapshotFilesWithStats(dir).head._2
    val strStats = ManifestTable.snapshotFilesWithStringStats(dir).head._2
    assert(longStats.keySet == Set("id", "v"))
    assert(strStats.keySet == Set("k"))
    assert(longStats("id") == ((0L, 29L)))
    assert(new String(strStats("k")._1, "UTF-8") == "s0000")
    assert(new String(strStats("k")._2, "UTF-8") == "s0029")
  }
}
