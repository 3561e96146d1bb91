package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Scale probe for the round-16 manifest surfaces — drives the DSv2
  * write, deletion-vector vs copy-on-write DELETE, and the pushed-
  * filter DSv2 read against a large documents corpus, printing the
  * numbers the 100 TB story rests on: commit metadata bytes, data
  * bytes moved, files planned.
  *
  * Usage: ManifestScaleProbe [sfDir] (default benchdata/sf10)
  */
object ManifestScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("benchdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def dirBytes(d: java.io.File): Long =
      Option(d.listFiles()).map(_.map(f =>
        if (f.isDirectory) dirBytes(f) else f.length()).sum).getOrElse(0L)

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"n_chars")
    val n = docs.count()
    println(s"PROBE corpus rows              $n")

    // 1. DSv2 batch write, range-partitioned → 16 stats-carrying files
    val root = java.nio.file.Files
      .createTempDirectory("graft-scale-probe").toFile
    timed("dsv2_write_16files") {
      docs.repartitionByRange(16, $"doc_id")
        .write.format("graft-manifest")
        .option("writeSchema", "doc_id BIGINT, source STRING, n_chars BIGINT")
        .mode("append").save(root.getPath)
    }
    require(ManifestTable.countMeta(root.getPath).contains(n), "rows= stats broken")
    val dataBytesAfterWrite = dirBytes(new java.io.File(root, "data"))
    println(s"PROBE table data bytes         $dataBytesAfterWrite")

    // 2. deletion-vector DELETE of ~n/10000 scattered rows
    val preManifest = dirBytes(new java.io.File(root, "_manifest"))
    timed("dv_delete_scattered") {
      ManifestTable.deleteWhere(spark, root.getPath,
        $"doc_id" % 9973 === 0, dvFraction = 0.01)
    }
    val dvManifestBytes = dirBytes(new java.io.File(root, "_manifest")) - preManifest
    val dvDataBytes = dirBytes(new java.io.File(root, "data")) - dataBytesAfterWrite
    val masked = ManifestTable.snapshotDeletionVectors(root.getPath)
      .values.map(_.size).sum
    println(s"PROBE dv masked rows           $masked")
    println(s"PROBE dv manifest bytes        $dvManifestBytes")
    println(s"PROBE dv data bytes written    $dvDataBytes (must be 0)")

    // 3. the SAME delete copy-on-write (fresh table) for contrast
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-scale-probe-cow").toFile
    docs.repartitionByRange(16, $"doc_id")
      .write.format("graft-manifest")
      .option("writeSchema", "doc_id BIGINT, source STRING, n_chars BIGINT")
      .mode("append").save(root2.getPath)
    val cowBase = dirBytes(new java.io.File(root2, "data"))
    timed("cow_delete_scattered") {
      ManifestTable.deleteWhere(spark, root2.getPath,
        $"doc_id" % 9973 === 0) // dvFraction = 0: rewrite
    }
    val cowDataBytes = dirBytes(new java.io.File(root2, "data")) - cowBase
    println(s"PROBE cow data bytes written   $cowDataBytes")
    println(f"PROBE write amplification      ${cowDataBytes.toDouble / math.max(1, masked)}%.0f bytes/deleted-row (CoW) vs ~${dvManifestBytes.toDouble / math.max(1, masked)}%.1f (DV)")

    // 4. pushed-filter DSv2 read: 1 of 16 files planned
    val schema = ManifestTable.read(spark, root.getPath).schema
    val w = n / 16
    val ranged = spark.read.format("graft-manifest").schema(schema)
      .load(root.getPath)
      .filter($"doc_id" >= 0L && $"doc_id" < w / 2)
    println(s"PROBE pushed-read partitions   ${ranged.rdd.getNumPartitions} of 16")
    timed("pushed_read_1_slice") { ranged.agg(sum($"n_chars")).head() }
    timed("full_scan_16_slices") {
      spark.read.format("graft-manifest").schema(schema)
        .load(root.getPath).agg(sum($"n_chars")).head()
    }

    // 5. stats-pruned MERGE: a 100-key batch against the 16-file table
    timed("merge_narrow_batch") {
      ManifestTable.mergeInto(spark, root.getPath,
        docs.filter($"doc_id" < 100).select($"doc_id", $"source",
          ($"n_chars" + 1).as("n_chars")), "doc_id")
    }
    println("PROBE done")
    spark.stop()
    sys.exit(0)
  }
}
