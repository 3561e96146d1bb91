package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("saltedJoin equals the plain join on a skewed dataset") {
    import spark.implicits._
    // 90% of rows share one key — the classic hot-key shape
    val left = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val right = (1L to 10000L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = left.join(right, "k")
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedAgg two-phase sum equals the direct aggregation") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy($"k").agg(sum($"v").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedAgg(df, "k", salts = 8,
      partial = Map("v" -> "sum"), merge = Map("sum(v)" -> "sum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted rows actually spread across salt values") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (7L, i)).toDF("k", "payload")
    val right = Seq((7L, "x")).toDF("k", "attr")
    // count distinct salts used internally by re-deriving them
    val salts = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(8L)))
      .select(countDistinct($"_salt")).as[Long].head()
    assert(salts >= 6, s"expected near-uniform salt spread, got $salts")
    assert(Skew.saltedJoin(left, right, "k", 8).count() == 1000)
  }
}
