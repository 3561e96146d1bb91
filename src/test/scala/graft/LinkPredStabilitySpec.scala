package graft

import org.scalatest.funsuite.AnyFunSuite

/** r8 VERDICT next #8: the link-prediction subgraph (%50 orderkey
  * sample + deg<=64 hub filter) derives every bound from VALUES, never
  * from physical layout — so the candidate set and the ranked output
  * must be bit-stable across partitionings. Asserted by running the
  * two link-prediction keys under different shuffle-partition counts
  * and comparing full result sets. */
class LinkPredStabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def runTwice(key: String): Unit = {
    val fn = SparkEntry.queries(key)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = fn(spark, TestSpark.sf).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = fn(spark, TestSpark.sf).collect().toSeq
      assert(a.nonEmpty, s"$key returned no rows")
      assert(a == b,
        s"$key differs across partitionings: ${a.size} vs ${b.size} rows")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("graph_jaccard_links is identical under different partitionings") {
    runTwice("graph_jaccard_links")
  }

  test("q_graph_adamic_adar is identical under different partitionings") {
    runTwice("q_graph_adamic_adar")
  }
}
