package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (QueryDef.bench) against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are written to
  * the `noop` sink — the whole pipeline executes (a bare .count() would
  * let Catalyst prune scans/projections and flatter the numbers).
  */
object Bench {

  /** Warm-up data: the smallest sibling sf dir of the bench dir (so the
    * warm-up pass is cheap), falling back to the bench dir itself. Only
    * dirs that parse as sf<number> AND actually hold the dataset count —
    * a stray sibling must not silently defeat the warm-up (which would
    * fold codegen-compile time back into the timed runs). */
  private def warmupDir(sfDir: String): String = {
    val p = Paths.get(sfDir)
    val siblings = Option(p.getParent).filter(Files.isDirectory(_)).map { parent =>
      val stream = Files.list(parent)
      try {
        scala.jdk.CollectionConverters.IteratorHasAsScala(stream.iterator).asScala
          .filter(d => Files.isDirectory(d) &&
            Files.exists(d.resolve("lineitem.parquet")))
          .flatMap(d => d.getFileName.toString.stripPrefix("sf").toDoubleOption
            .map(_ -> d))
          .toSeq.sortBy(_._1)
      } finally stream.close()
    }.getOrElse(Seq.empty)
    siblings.headOption.map(_._2.toString).getOrElse(sfDir)
  }

  /** Accumulates stage-level execution metrics between resets, so each
    * bench query's shuffle/spill/task footprint lands in the JSON
    * artifact — an anomalous wall-time (like r8's unexplained 13.8s
    * ctr_referrer) is then diagnosable from the artifact alone: CPU
    * blip (same bytes, more time) vs plan change (different bytes). */
  private final class StageMetrics extends SparkListener {
    private var stages, tasks = 0L
    private var shufRead, shufWrite, spillMem, spillDisk, inBytes = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufRead += m.shuffleReadMetrics.totalBytesRead
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          spillMem += m.memoryBytesSpilled
          spillDisk += m.diskBytesSpilled
          inBytes += m.inputMetrics.bytesRead
        }
        stages += 1
        tasks += sc.stageInfo.numTasks
      }
    def snapshotAndReset(): Seq[(String, Long)] = synchronized {
      val r = Seq("stages" -> stages, "tasks" -> tasks,
        "input_bytes" -> inBytes, "shuffle_read" -> shufRead,
        "shuffle_write" -> shufWrite, "spill_mem" -> spillMem,
        "spill_disk" -> spillDisk)
      stages = 0; tasks = 0; shufRead = 0; shufWrite = 0
      spillMem = 0; spillDisk = 0; inBytes = 0
      r
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // SPARK_GRAFT_BENCH_KEYS=k1,k2 benches an explicit key list (any
    // registered query, not just the headline set) — the targeted
    // scale sweeps (sf10/sf100) measure the newest operators without
    // re-running the whole headline suite at that scale.
    val benched: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      sys.env.get("SPARK_GRAFT_BENCH_KEYS") match {
        case Some(ks) =>
          val want = ks.split(",").map(_.trim).filter(_.nonEmpty)
          want.map(k => k -> SparkEntry.queries.getOrElse(k,
            sys.error(s"unknown bench key: $k"))).toMap
        case None => SparkEntry.benchQueries
      }
    val spark = GraftSession.local(cpus)
    val metrics = new StageMetrics
    spark.sparkContext.addSparkListener(metrics)

    // JVM + codegen warm-up: run every headline query once at the
    // smallest available sf (excluded from timings) so measurements
    // reflect steady-state executor throughput, not Janino compile time.
    val warm = warmupDir(sfDir)
    System.err.println(s"[bench] warm-up dir: $warm")
    benched.foreach { case (_, fn) =>
      try fn(spark, warm).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }

    // median-of-3 per query (plus the min, recorded separately):
    // the median is robust to one GC/compaction hiccup in either
    // direction, so a single noisy run can neither fake nor mask a
    // regression — the protocol the r6 q17 ±90% swing called for.
    // A run that throws is dropped; a query with no successful run is
    // reported as the sentinel -1 and excluded from the total rather
    // than flattering the headline with a near-zero elapsed time.
    val results = benched.toSeq.sortBy(_._1).map { case (name, fn) =>
      var lastStages: Seq[(String, Long)] = Seq.empty
      val times = (1 to 3).flatMap { _ =>
        org.apache.spark.graft.ListenerBusWait.drain(spark.sparkContext)
        // GC before EVERY run, not just every query: checkpoint blocks
        // from an iterative query's previous run are only released
        // after the ContextCleaner sees their RDDs collected, and three
        // un-GC'd generations of LPA label/edge checkpoints at sf10
        // squeezed execution memory into spilling, then OOM'd run 3 of
        // q_graph_modularity. Untimed (outside the measured window).
        System.gc()
        metrics.snapshotAndReset() // drop events from the previous query
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          org.apache.spark.graft.ListenerBusWait.drain(spark.sparkContext)
          lastStages = metrics.snapshotAndReset() // steady-state (last) run
          Some(dt)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
        }
      }
      val sorted = times.sorted
      val median = if (sorted.isEmpty) -1.0 else sorted(sorted.size / 2)
      // Nudge ContextCleaner between queries: shuffle files are only
      // deleted once their ShuffleDependency is GC'd, and a large
      // (24-48g) heap may not GC for many queries — at sf10 the dead
      // shuffle files of completed queries accumulated 62 GB and
      // ENOSPC'd the run. One explicit GC per query bounds temp-dir
      // growth to the live query's working set (untimed: runs outside
      // the measured window).
      System.gc()
      (name, median, sorted.headOption.getOrElse(-1.0), lastStages)
    }
    def jmap(f: ((String, Double, Double, Seq[(String, Long)])) => Double) =
      results.map(r => "\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val qs = jmap(_._2)
    val qsMin = jmap(_._3)
    val stageJson = results.map { r =>
      "\"" + r._1 + "\":" +
        r._4.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Stage metrics + per-query minima ride a SIDECAR file, not stdout:
    // the driver keeps only a bounded tail of the final line, and the
    // ~10 KB stage payload previously truncated the per-query timings
    // out of the round artifact (r10 VERDICT #5). The stdout line stays
    // timings-only (< 2 KB for the 26-query headline set).
    val sidecar = s"""{"queries_min":$qsMin,"stage_metrics":$stageJson,""" +
      s""""sf":"$sfDir"}"""
    // best-effort: an unwritable sidecar path must not lose the whole
    // bench result after all timed runs completed (r11 ADVICE)
    try {
      val scPath = Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_SIDECAR", "benchdata/bench_sidecar.json"))
      Option(scPath.getParent).foreach(Files.createDirectories(_))
      Files.writeString(scPath, sidecar)
      System.err.println(s"[bench] stage metrics sidecar: $scPath")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] sidecar write failed (continuing): $e")
    }
    // The driver parses the LAST stdout line as JSON: quiet Spark's
    // shutdown INFO chatter, stop the session first, THEN print — so
    // nothing (not even teardown logs in a merged capture) can land
    // after the timings line. build.sbt passes the forked stdout
    // through unprefixed and suppresses sbt's [success] banner.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""runs_per_query":3,"stat":"median","sf":"$sfDir"}""")
  }
}
