package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  val base = "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door"
  val nearDup = base.replace("warm", "cold") // 1-word edit
  val other = "completely different content about spark catalyst optimizer rules and physical plan strategies here now"

  test("exactSurvivors keeps the lowest doc_id per duplicate group") {
    val d = docs(Seq((1L, base), (2L, base), (3L, other), (7L, base)))
    val got = Dedup.exactSurvivors(d).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 3L -> 1L))
  }

  test("minhashPairs finds planted near-duplicates, not unrelated docs") {
    val d = docs(Seq((1L, base), (2L, nearDup), (3L, other)))
    val pairs = Dedup.minhashPairs(d, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getAs[Double]("est_jaccard") > 0.5)
  }

  test("simhashPairs finds hamming-close docs only") {
    val d = docs(Seq((1L, base), (2L, nearDup), (3L, other)))
    val pairs = Dedup.simhashPairs(d, maxDist = 16).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("ngramJaccardPairs computes exact jaccard") {
    // a: shingles of "w1 w2 w3 w4" = {w1 w2 w3, w2 w3 w4}
    // b: "w1 w2 w3 w5" = {w1 w2 w3, w2 w3 w5} → inter=1, union=3 → 1/3
    val d = docs(Seq((1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w5")))
    val got = Dedup.ngramJaccardPairs(spark, d).collect()
    assert(got.length == 1)
    assert(math.abs(got(0).getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-9)
  }

  test("clusters: chains merge into one component, min doc_id wins") {
    import spark.implicits._
    // chain 1-2, 2-3 plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("minhash est_jaccard approximates true jaccard") {
    val d = docs(Seq((1L, base), (2L, nearDup)))
    val est = Dedup.minhashPairs(d, threshold = 0.0).collect()(0).getAs[Double]("est_jaccard")
    val exact = Dedup.ngramJaccardPairs(spark, d).collect()(0).getAs[Double]("jaccard")
    assert(math.abs(est - exact) < 0.25, s"est=$est exact=$exact") // 128 perms → ~±0.09 stddev
  }
}
