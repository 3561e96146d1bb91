package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Measure, don't guess: per-query shuffle volume + spill at sf0.1.
  * sbt "runMain graft.tools.ShuffleAudit"
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleWrite = new AtomicLong; val spill = new AtomicLong
    val input = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
    })

    // default: the bench set; args: audit those query names instead
    val targets =
      if (args.nonEmpty) graft.SparkEntry.queries.view.filterKeys(args.toSet).toMap
      else graft.SparkEntry.benchQueries
    println(f"${"query"}%-24s ${"input_mb"}%9s ${"shuffle_mb"}%10s ${"spill_mb"}%9s ${"sec"}%7s")
    targets.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      shuffleWrite.set(0); spill.set(0); input.set(0)
      try {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800) // let the listener bus drain
        println(f"$name%-24s ${input.get / 1e6}%9.1f ${shuffleWrite.get / 1e6}%10.2f ${spill.get / 1e6}%9.1f $sec%7.2f")
      } catch { case e: Throwable => println(s"$name FAILED ${e.getMessage}") }
    }
    spark.stop()
  }
}
