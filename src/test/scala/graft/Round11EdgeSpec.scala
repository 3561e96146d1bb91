package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-11 items: the band-bucket width cap (r10 VERDICT #4).
  * A degenerate LSH bucket — millions of byte-identical boilerplate
  * docs, the normal web-crawl case — previously made the candidate
  * self-joins in dedup_source_matrix / dedup_minhash_pairs O(W²).
  * Buckets wider than 64 are now excluded from pair generation on both
  * engines; this spec plants a 200-doc mega-bucket plus one genuine
  * cross-source duplicate pair and asserts the cap removes the former
  * and keeps the latter, with the DuckDB oracle in lock-step. */
class Round11EdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plant(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-megabucket").toString
    val boiler = "terms of service all rights reserved contact us privacy " +
      "policy cookie notice subscribe to the newsletter follow our page"
    val dup = "graft shuffles fixed width signature keys so document text " +
      "never rides a shuffle and bucket joins stay bounded by design"
    val rows =
      (0L until 200L).map(i => (i, boiler, "mirror")) ++
        Seq((1000L, dup, "s1"), (1001L, dup, "s2"))
    rows.toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("width cap: mega-bucket excluded from dedup_source_matrix, real pair kept") {
    val dir = plant()
    val m = SparkEntry.queries("dedup_source_matrix")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the 200-doc boilerplate family would be 19,900 mirror–mirror pairs
    // without the cap; with it the only surviving pair is the s1–s2 dup
    assert(m.toSeq == Seq(("s1", "s2", 1L)), s"got ${m.toSeq}")
  }

  test("width cap: dedup_minhash_pairs keeps only the narrow-bucket pair") {
    val dir = plant()
    val p = SparkEntry.queries("dedup_minhash_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p.toSeq == Seq((1000L, 1001L, 32L)), s"got ${p.toSeq}")
  }

  test("width cap: DuckDB oracle applies the identical cap on the planted corpus") {
    val dir = plant()
    val duckOk = try {
      new ProcessBuilder("python3", "-c", "import duckdb").start().waitFor() == 0
    } catch { case _: Throwable => false }
    assume(duckOk, "python3+duckdb not available on this box")
    def oracleRows(key: String): Seq[String] = {
      val tmp = java.nio.file.Files.createTempFile("oracle", ".sql")
      java.nio.file.Files.writeString(tmp, SparkEntry.oracleSql(key))
      val py =
        s"""import duckdb
           |con = duckdb.connect()
           |con.execute("CREATE VIEW documents AS SELECT * FROM '$dir/documents.parquet/*.parquet'")
           |for row in con.sql(open('$tmp').read()).fetchall():
           |    print('|'.join(str(v) for v in row))
           |""".stripMargin
      val pf = java.nio.file.Files.createTempFile("oracle", ".py")
      java.nio.file.Files.writeString(pf, py)
      val pb = new ProcessBuilder("python3", pf.toString)
      pb.redirectErrorStream(true)
      val pr = pb.start()
      val out = new String(pr.getInputStream.readAllBytes(), "UTF-8")
      assert(pr.waitFor() == 0, s"oracle run failed:\n${out.take(1500)}")
      out.linesIterator.toSeq
    }
    assert(oracleRows("dedup_source_matrix") == Seq("s1|s2|1"))
    assert(oracleRows("dedup_minhash_pairs") == Seq("1000|1001|32|1.0"))
  }
}
