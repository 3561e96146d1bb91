package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Round-14: the trained hashed-feature logistic classifier. The
  * oracle gate proves the GD trajectory is bit-identical across
  * engines; this pins that the trajectory actually LEARNS — a
  * planted linearly-separable corpus must be classified perfectly on
  * the held-out slice — plus the fixed-point edge behavior. */
class ClassifierSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted-separable corpus: held-out slice classified perfectly") {
    // label-1 docs speak only {alpha,beta,gamma}; label-0 docs only
    // {delta,epsilon,zeta}. Any non-degenerate learner separates this.
    val docs = (0L until 60L).map { id =>
      val words =
        if (id % 2 == 0) Seq("alpha", "beta", "gamma", "alpha")
        else Seq("delta", "epsilon", "zeta", "delta", "epsilon")
      val reps = (id % 3 + 1).toInt
      (id, Seq.fill(reps)(words).flatten.mkString(" "), if (id % 2 == 0) 1L else 0L)
    }.toDF("doc_id", "text", "label")
    val out = Classifier.trainAndScore(spark, docs, nBuckets = 32, iters = 4,
      evalMod = 5, evalRem = 4)
      .select($"doc_id", $"label", $"p_micro", $"pred")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 12, s"expected 12 held-out docs, got ${out.length}")
    out.foreach { case (id, label, p, pred) =>
      assert(pred == label, s"doc $id misclassified: label=$label p_micro=$p")
    }
    // scores must be polarized, not hugging the decision boundary
    out.foreach { case (id, label, p, _) =>
      if (label == 1L) assert(p > 750000, s"doc $id: weak positive score $p")
      else assert(p < 250000, s"doc $id: weak negative score $p")
    }
  }

  test("held-out docs never influence the weights (train/eval isolation)") {
    // two corpora differing ONLY in eval-slice content must learn the
    // same weights, hence produce identical scores for a shared eval doc
    def corpus(evalText: String) = (0L until 20L).map { id =>
      val t =
        if (id % 5 == 4) { if (id == 19) "alpha beta" else evalText }
        else if (id % 2 == 0) "alpha beta alpha"
        else "delta epsilon delta"
      (id, t, if (id % 2 == 0) 1L else 0L)
    }.toDF("doc_id", "text", "label")
    def scoreOf(evalText: String): Long =
      Classifier.trainAndScore(spark, corpus(evalText), 32, 3, 5, 4)
        .filter($"doc_id" === 19L).select($"p_micro").as[Long].head()
    assert(scoreOf("zeta zeta") == scoreOf("epsilon gamma gamma delta"),
      "changing held-out text changed a learned score: leakage")
  }

  test("all-one-class training degenerates to the bias, not a crash") {
    val docs = (0L until 10L).map(id => (id, s"tok$id common", 1L))
      .toDF("doc_id", "text", "label")
    val out = Classifier.trainAndScore(spark, docs, 16, 3, 5, 4)
      .select($"pred").as[Long].collect()
    assert(out.nonEmpty && out.forall(_ == 1L),
      "uniform positive corpus must predict positive")
  }
}
