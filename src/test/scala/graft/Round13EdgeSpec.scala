package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 beyond-verdict keys: hybrid RRF fusion and graph beam
  * search. The oracle gate proves value equality; these pin the
  * PROPERTIES that make the answers right — fusion arithmetic and
  * leg-consistency for RRF, genuine-score and recall-floor behavior
  * for the best-first beam search. */
class Round13EdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("hybrid RRF: fused score IS the integer RRF of the emitted leg ranks") {
    val rows = SparkEntry.queries("retrieval_hybrid_rrf")(spark, dir)
      .select($"query_id", $"doc_id", $"rk", $"rrf_score", $"lex_rk", $"vec_rk")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    def pts(rk: Long): Long = if (rk == 0) 0L else 1000000000000L / (rk + 60)
    rows.foreach { case (q, d, _, rrf, lex, vec) =>
      assert(rrf == pts(lex) + pts(vec),
        s"q=$q d=$d: rrf=$rrf != pts($lex)+pts($vec)")
      assert(lex > 0 || vec > 0, s"q=$q d=$d: doc in NEITHER leg fused in")
    }
    // fused ranking is rrf-desc, doc-asc within each query
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(r => (-r._4, r._2)).map(_._3)
      assert(sorted.sameElements(g.sortBy(_._3).map(_._3)), "rank order broken")
    }
  }

  test("hybrid RRF: a doc near the top of BOTH legs outranks single-leg docs with equal-or-worse ranks") {
    val rows = SparkEntry.queries("retrieval_hybrid_rrf")(spark, dir)
      .select($"query_id", $"rk", $"lex_rk", $"vec_rk")
      .as[(Long, Long, Long, Long)].collect()
    for ((_, g) <- rows.groupBy(_._1)) {
      val both = g.filter(r => r._3 > 0 && r._4 > 0)
      // dominance: a both-legs doc must outrank any doc whose single
      // leg rank is >= both of its leg ranks
      for (b <- both; s <- g if s._3 == 0 || s._4 == 0) {
        val singleRank = math.max(s._3, s._4)
        if (singleRank >= math.max(b._3, b._4))
          assert(b._2 < s._2, s"both-legs doc $b outranked by single-leg $s")
      }
    }
  }

  test("beam search: emitted scores are the true cosines, ranked correctly") {
    val beam = SparkEntry.queries("ann_beam_search")(spark, dir)
      .select($"query_id", $"neighbor_id", $"rk", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect()
    assert(beam.nonEmpty)
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap // 50 vectors at sf0.001 — spec-scale only
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    beam.foreach { case (q, n, _, s) =>
      assert(n != q, s"probe $q returned itself")
      assert(math.abs(cos(emb(q), emb(n)) - s) < 1e-12,
        s"q=$q n=$n: emitted $s != true cosine")
    }
    // ranks are score-desc, id-asc within each probe
    beam.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._3)
      assert(byRank.sameElements(g.sortBy(r => (-r._4, r._2))), "beam rank order broken")
    }
  }

  test("beam search: recall floor holds at spec scale") {
    val hits = SparkEntry.queries("ann_beam_recall")(spark, dir)
      .agg(sum($"n_hit")).as[Long].head()
    // sf0.001 = 50 vectors, 10 probes x top-5: best-first at B=32
    // explores most of a 50-node graph — expect near-exhaustive recall.
    // Floor at 60% so graph-construction jitter can't flake the suite
    // while a real navigability regression (fixed-point bug: ~40%)
    // still fails.
    assert(hits >= 30, s"beam recall collapsed: $hits/50 hits")
  }
}
