package graft.tools

/** Time individual SparkEntry queries end-to-end (noop sink), e.g.
  *   SPARK_GRAFT_SF_DIR=benchdata/sf10 sbt "runMain graft.tools.RunOne dedup_ngram_jaccard 2"
  * Args: query names, with an optional trailing integer repeat count.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (names, reps) = args.lastOption.flatMap(_.toIntOption) match {
      case Some(n) => (args.dropRight(1).toSeq, n)
      case None    => (args.toSeq, 1)
    }
    val spark = graft.GraftSession.local(32)
    for (name <- names; r <- 1 to reps) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"RUNONE $name run$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
