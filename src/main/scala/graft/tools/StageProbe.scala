package graft.tools

/** Per-stage wall/run-time probe for one query: runs it twice (warm),
  * prints each stage of the second run with task count and times.
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StageProbe <key>"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val key = args(0)
    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(2)
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(key)
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Long, Long, Long, String)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val si = sc.stageInfo
          val wall = (for {
            a <- si.completionTime; b <- si.submissionTime
          } yield a - b).getOrElse(-1L)
          val rt = Option(si.taskMetrics).map(_.executorRunTime).getOrElse(-1L)
          stages += ((si.stageId, si.numTasks, wall, rt,
            si.submissionTime.getOrElse(-1L), si.name.take(90)))
        }
    }
    for (r <- 1 to reps) {
      if (r == reps) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"PROBE $key run$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    org.apache.spark.graft.ListenerBusWait.drain(spark.sparkContext)
    val snap = stages.synchronized(stages.toVector).sortBy(_._5)
    var prevEnd = -1L
    for ((id, n, wall, rt, sub, name) <- snap) {
      val gap = if (prevEnd < 0) 0L else sub - prevEnd
      prevEnd = sub + wall
      println(f"STAGE $id%4d tasks=$n%4d wall=${wall}%5dms run=${rt}%6dms gap=${gap}%5dms  $name")
    }
    spark.stop()
  }
}
