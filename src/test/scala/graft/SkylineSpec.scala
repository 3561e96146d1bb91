package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("skyline keeps the frontier, drops dominated rows, keeps exact ties") {
    import spark.implicits._
    // frontier: (10,10),(15,15)x2 tie,(20,20),(30,30)
    // dominated: (20,10) by (10,10); (30,5) by (10,10); (20,15) by (20,20)
    val df = Seq(
      (1L, 10L, 10L), (2L, 20L, 20L), (3L, 30L, 30L),
      (4L, 20L, 10L), (5L, 30L, 5L),
      (6L, 15L, 15L), (7L, 15L, 15L), (8L, 20L, 15L))
      .toDF("id", "cost", "gain")
    val got = Skyline.skyline2d(spark, df).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L, 3L, 6L, 7L)))
  }

  test("the global window resolve reads the partition-pruned set, not the raw table") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toLong, i.toLong)).toDF("id", "cost", "gain")
    val plan = Skyline.skyline2d(spark, df).queryExecution.executedPlan.toString
    // phase 1 (mapPartitions sweep) must sit below the window exchange
    assert(plan.contains("MapPartitions"), s"local prune missing:\n$plan")
    assert(plan.contains("Window"), s"global resolve missing:\n$plan")
  }

  test("skyline equals the quadratic dominance definition across partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val df = pts.toDF("id", "cost", "gain").repartition(7)
    val got = Skyline.skyline2d(spark, df).collect().map(_.getLong(0)).sorted
    val want = pts.filter(a => !pts.exists(b =>
      b._2 <= a._2 && b._3 >= a._3 && (b._2 < a._2 || b._3 > a._3))).map(_._1).toArray.sorted
    assert(got.sameElements(want))
  }
}
