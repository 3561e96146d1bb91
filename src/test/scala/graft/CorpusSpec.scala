package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Corpus
import graft.sources.Tables

class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("splits are deterministic and near the requested ratios") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf).select($"doc_id")
    val a = Corpus.assignSplits(docs, "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val b = Corpus.assignSplits(docs, "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
    assert(a.exceptAll(b).count() == 0) // stable across runs
    val counts = a.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(math.abs(counts("train") / n - 0.9) < 0.06, counts.toString)
    assert(counts.keySet == Set("train", "val", "test"))
  }

  test("packing respects the token budget and covers every doc once") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf)
    val packed = Corpus.packGreedy(spark, docs, maxTokens = 200, shards = 4).collect()
    assert(packed.length == docs.count())
    assert(packed.map(_.doc_id).distinct.length == packed.length)
    // no bin over budget (unless a single doc exceeds it alone)
    val over = packed.groupBy(p => (p.shard, p.bin))
      .filter { case (_, ds) => ds.map(_.n_tokens).sum > 200 && ds.length > 1 }
    assert(over.isEmpty, s"over-budget bins: ${over.keys.take(3)}")
    // packing actually packs: fewer bins than docs
    val bins = packed.map(p => (p.shard, p.bin)).distinct.length
    assert(bins < packed.length / 2, s"bins=$bins docs=${packed.length}")
  }
}
