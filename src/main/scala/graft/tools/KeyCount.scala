package graft.tools

/** Print registered key counts (coverage bookkeeping). */
object KeyCount {
  def main(args: Array[String]): Unit = {
    val all = graft.SparkEntry.all
    println(s"total=${all.size} oracle=${all.count(_._2.oracle.isDefined)} bench=${all.count(_._2.bench)}")
    if (args.contains("-l")) all.keys.toSeq.sorted.foreach(println)
  }
}
