package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (QueryDef.bench) against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are written to
  * the `noop` sink — the whole pipeline executes (a bare .count() would
  * let Catalyst prune scans/projections and flatter the numbers).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)

    // JVM + codegen warm-up: run every headline query once at the
    // smallest sf (excluded from timings) so measurements reflect
    // steady-state executor throughput, not Janino compile time.
    SparkEntry.benchQueries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }

    // best-of-2: steady-state throughput, not GC/compilation jitter
    val results = SparkEntry.benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
