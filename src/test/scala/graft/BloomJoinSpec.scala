package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomJoin
import graft.sources.Tables

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloom-pruned join equals the plain join") {
    import spark.implicits._
    val big = Tables.lineitem(spark, TestSpark.sf)
      .select($"l_orderkey".as("o_orderkey"), $"l_extendedprice")
    val small = Tables.orders(spark, TestSpark.sf)
      .filter($"o_totalprice" > 450000.0) // selective dim
      .select($"o_orderkey", $"o_totalprice")
    val plain = big.join(small, "o_orderkey")
    val pruned = BloomJoin.prunedJoin(big, small, "o_orderkey")
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).count() == 0 && plain.exceptAll(pruned).count() == 0)
  }

  test("the bloom predicate actually prunes the big side") {
    import spark.implicits._
    val big = (1L to 100000L).map(i => (i, i % 7)).toDF("k", "v")
    val small = Seq((5L, "a"), (17L, "b")).toDF("k", "name")
    val bf = small.stat.bloomFilter("k", 100, 0.01)
    val kept = big.filter(
      org.apache.spark.sql.graft.Bridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal({
            val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
          }),
          org.apache.spark.sql.graft.Bridge.expression($"k".cast("long"))))).count()
    assert(kept >= 2 && kept < 2000, s"kept=$kept") // fpp 1% of 100k ≈ ≤~1000 + 2 true
    assert(BloomJoin.prunedJoin(big, small, "k").count() == 2)
  }
}
