package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

class KmeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("kmeans returns k centroids of the right dimension, deterministically") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val c1 = Similarity.kmeans(spark, emb, k = 4, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1)
    val c2 = Similarity.kmeans(spark, emb, k = 4, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1)
    assert(c1.length == 4 && c1.forall(_._2.length == 64))
    assert(c1.map(_._2).zip(c2.map(_._2)).forall { case (a, b) => a == b })
  }

  test("ivf with trained centroids still finds a planted duplicate") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val clone = emb.filter($"vec_id" === 0).withColumn("vec_id", lit(9999L))
    val corpus = emb.unionByName(clone.select(emb.columns.map(col): _*))
    val trained = Similarity.kmeans(spark, corpus, k = 4, iters = 2)
    val top = Similarity.ivfTopK(spark, corpus, corpus.filter($"vec_id" === 9999L),
      k = 1, nCells = 4, nProbe = 2, trainedCentroids = Some(trained)).collect()
    assert(top.length == 1 && top(0).getAs[Long]("neighbor_id") == 0L)
  }

  test("lsh and ivf recall against brute force on real embeddings") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val probes = emb.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs(Similarity.bruteForce(spark, emb, probes, k = 5))
    val lsh = pairs(Similarity.lshTopK(spark, emb, probes, k = 5, numPlanes = 4))
    val ivf = pairs(Similarity.ivfTopK(spark, emb, probes, k = 5, nCells = 4, nProbe = 2))
    val lshRecall = (lsh & brute).size.toDouble / brute.size
    val ivfRecall = (ivf & brute).size.toDouble / brute.size
    info(f"recall@5: lsh=$lshRecall%.2f ivf=$ivfRecall%.2f")
    assert(lshRecall > 0.05 && ivfRecall > 0.2,
      s"lsh=$lshRecall ivf=$ivfRecall") // random gaussian corpus: loose floors
  }
}
