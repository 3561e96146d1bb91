package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.JsonLogScan

/** The DataSourceV2 noisy-JSON-log source (SURVEY.md §2-G): tolerant
  * parse semantics, PHYSICAL column pruning and filter pushdown
  * (asserted on the planned scan, not just results), and line-aligned
  * byte-range splits that neither lose nor duplicate rows. */
class JsonLogSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("referrer", StringType), StructField("adId", StringType),
    StructField("n", LongType)))

  private def write(lines: Seq[String]): String = {
    val f = Files.createTempFile("jsonlog", ".log")
    Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  private def read(path: String, opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format("graft-jsonlog").schema(schema)
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(path)
  }

  test("tolerant parse: noise prefixes stripped, poison lines dropped, unicode survives") {
    val path = write(Seq(
      """{"referrer":"r1","adId":"a1","n":1}""",
      """garbage-before{"referrer":"r2","adId":"ü2","n":2}""", // ClickThru.java:97-98 semantics
      "no brace at all",
      """{"truncated": """,
      "",
      """{"other":"field only"}""", // parses but all-null for our schema -> dropped
      """{"referrer":"r3","extra":{"nested":[1,2]},"n":3}"""))
    val rows = read(path).orderBy($"n").collect()
    assert(rows.map(_.getAs[Long]("n")).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getAs[String]("adId") == "ü2")
    assert(rows(2).getAs[String]("adId") == null) // missing field -> null, row kept
  }

  test("column pruning reaches the scan; filter pushdown splits supported/unsupported") {
    val path = write((1 to 50).map(i => s"""{"referrer":"r${i % 5}","adId":"a$i","n":$i}"""))
    val df = read(path).filter($"referrer" === "r1" && $"n" > 10).select($"adId")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.asInstanceOf[JsonLogScan]
    }
    assert(scans.size == 1)
    // pruned to the surviving columns: referrer is NOT read at all —
    // its EqualTo was fully pushed, so only adId (projection) and n
    // (residual filter) are parsed
    val readCols = scans.head.readSchema().fieldNames.toSet
    assert(readCols == Set("adId", "n"))
    // EqualTo(referrer) and IsNotNull are pushable; GreaterThan(n) is not
    val pushed = scans.head.pushed.map(_.toString).mkString(",")
    assert(pushed.contains("EqualTo(referrer,r1)"), pushed)
    assert(!pushed.contains("GreaterThan"), pushed)
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a11", "a16", "a21", "a26", "a31", "a36", "a41", "a46"))
    // pure projection prunes the parse to one field
    val proj = read(path).select($"n")
    val projScan = proj.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.asInstanceOf[JsonLogScan] }.head
    assert(projScan.readSchema().fieldNames.toSeq == Seq("n"))
  }

  test("byte-range splits: many small partitions, zero lost or duplicated rows") {
    val lines = (1 to 997).map(i => s"""{"referrer":"r$i","adId":"a$i","n":$i}""")
    val path = write(lines)
    val df = read(path, Map("maxSplitBytes" -> "256")) // ~7 lines per split
    assert(df.rdd.getNumPartitions > 20, s"expected many splits, got ${df.rdd.getNumPartitions}")
    val ns = df.select($"n").as[Long].collect().sorted
    assert(ns.toSeq == (1L to 997L)) // exactly-once across split boundaries
  }
}
