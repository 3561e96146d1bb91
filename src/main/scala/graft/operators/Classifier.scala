package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the FineWeb-edu-style distillation
  * loop closed: nothing in the repo LEARNED weights until this;
  * `text_classifier_score` applies a fixed hashed model, this trains
  * one (hashed-feature logistic regression, Weinberger et al. 2009
  * feature hashing / Joulin et al. 2016 fastText shape) and scores
  * HELD-OUT documents with the learned weights.
  *
  * Everything is fixed-point integer arithmetic so the full gradient-
  * descent trajectory is bit-identical across engines (the
  * events_markov_attribution discipline — the DuckDB oracle replays
  * training as an unrolled CTE chain and must reproduce every weight
  * exactly):
  *
  *  - features: per-mille-normalized hashed unigram frequencies,
  *    x_k = (count_k · 1000) div n_tokens (md5-derived bucket hash,
  *    the house 60-bit convention) + an always-on bias x = 1000 —
  *    normalization keeps long documents from owning the gradient;
  *  - probabilities in micro-units through the hard-sigmoid link
  *    (Collobert): p̂ = clamp(500000 + z div 4000, 0, 1e6) where
  *    z = Σ w_k·x_k;
  *  - batch GD: err = p̂ − y·1e6; grad_k = Σ_docs err·x_k;
  *    w_k ← w_k − truncdiv(grad_k, N·damp). Truncating division
  *    toward zero on both engines (Java semantics; the oracle spells
  *    the sign-safe CASE form so a floor-dividing engine cannot
  *    silently drift).
  *
  * Scale shape: the training matrix is built ONCE (a map-side-
  * combined (doc, bucket) count shuffle, then one doc_id repartition
  * whose window derives per-doc totals — no separate total scan or
  * join; cached doc_id-partitioned and -sorted for the loop);
  * each iteration is two aggregations over it; the model state is
  * K+1 longs broadcast as a literal array (indexed via element_at)
  * — never a driver structure
  * that grows with the corpus. Per-iteration driver traffic is the
  * K+1-row gradient collect, corpus-size independent. */
object Classifier {

  val PMax = 1000000L // probability scale: micro-units
  val PHalf = 500000L
  val ZDiv = 4000L // hard-sigmoid slope: p̂ = ½ + z/(4·1000-scale)

  /** Truncating (toward-zero) division — Java/Spark semantics, made
    * explicit so the oracle can mirror it sign-safely. */
  private def tdiv(a: Long, b: Long): Long = a / b

  /** Train on `docs` rows NOT in the eval slice, then score the eval
    * slice with the learned weights. `docs` needs (doc_id, text,
    * label∈{0,1}); eval slice = doc_id % evalMod == evalRem.
    * Returns (doc_id, label, p_micro, pred) for the eval docs. */
  def trainAndScore(spark: SparkSession, docs: DataFrame, nBuckets: Int,
                    iters: Int, evalMod: Int, evalRem: Int,
                    damp: Long = 128L): DataFrame = {
    import spark.implicits._
    val bias = nBuckets.toLong
    val counts = docs
      .select($"doc_id", explode(split($"text", " ")).as("f"))
      .select($"doc_id",
        (conv(substring(md5($"f"), 1, 15), 16, 10).cast("long") % nBuckets).as("k"))
      .groupBy($"doc_id", $"k").agg(count(lit(1)).as("c"))
    val lab = docs.select($"doc_id", $"label".cast("long").as("y"))
    // Normalized feature matrix with the per-doc token total derived
    // IN the matrix pipeline: tot = Σ_k c over the count rows, an
    // exchange-free window after the single repartition(doc_id) — not
    // a separate text scan joined back on doc_id (that was a third
    // corpus pass + a join). Bias rows ride the same window with c=0
    // so they leave tot untouched, then take their fixed 1000 in the
    // normalizing projection.
    val x = counts
      .unionAll(docs.select($"doc_id", lit(bias).as("k"), lit(0L).as("c")))
      .repartition($"doc_id")
      .withColumn("tot", sum($"c").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      .select($"doc_id", $"k",
        when($"k" === bias, lit(1000L))
          .otherwise(expr("(c * 1000) div tot")).as("c"))
    // Pre-partition the cached TRAIN matrix by doc_id: every GD
    // iteration's per-doc logit window requires hashpartitioning on
    // doc_id, and InMemoryTableScan preserves the cached partitioning
    // AND ordering (the tot-window's sort leaves rows doc_id-sorted
    // through the broadcast lab join) — so the 4 iteration windows run
    // exchange-free and sort-free over the cache (guide §2.4;
    // verified in plans/r17/text_classifier_train_iteration.txt —
    // Window sits directly on Filter+InMemoryTableScan, no Exchange,
    // no Sort). Caching ONLY the train slice was MEASURED against
    // caching both slices and scoring eval off the cache: the shared
    // cache cost ~0.3-0.5 s/run (25% more cached rows through 4
    // iteration scans, plus the eager checkpoint the unpersist-safety
    // then requires) while the eval rebuild below is one pushed-down
    // 20%-slice tokenize.
    val xTrain = x.filter($"doc_id" % evalMod =!= evalRem)
      .join(lab, "doc_id")
      .persist()
    try {
      val n = docs.filter($"doc_id" % evalMod =!= evalRem).count()
      require(n > 0, "empty training slice")
      var w = Array.fill(nBuckets + 1)(0L)
      // Weights ride as a LITERAL ARRAY indexed by bucket, not a literal
      // map: GetMapValue on a map literal is a LINEAR scan of all K+1
      // keys per row (Spark MapData has no hash), which put an O(K)
      // factor on every (doc, bucket) row of every GD iteration and the
      // eval scoring. element_at(array, k+1) is O(1); k ∈ [0, nBuckets]
      // by construction (% nBuckets, bias = nBuckets), so the 1-based
      // index is always in range.
      def wAt(k: Column): Column = {
        val arr = array(w.map(lit(_)).toIndexedSeq: _*)
        element_at(arr, (k + 1L).cast("int"))
      }
      // hard sigmoid over the passed logit column. Truncating division
      // of z by ZDiv in Column algebra: z - z%d is an exact multiple
      // (Spark % keeps the dividend's sign, so the subtraction rounds
      // toward zero exactly like `div`), and the double division is
      // exact because |z| < 2^53 (bounded weights × per-mille counts)
      def pMicro(z: Column): Column = {
        val zdiv = ((z - (z % ZDiv)) / ZDiv).cast("long")
        greatest(lit(0L), least(lit(PMax), lit(PHalf) + zdiv))
      }
      for (_ <- 0 until iters) {
        val grad = xTrain
          .select($"doc_id", $"y", (wAt($"k") * $"c").as("zz"),
            $"k", $"c")
          .withColumn("z", sum($"zz").over(
            org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
          .select($"k", ((pMicro($"z") - $"y" * PMax) * $"c").as("gc"))
          .groupBy($"k").agg(sum($"gc").as("g"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        w = w.zipWithIndex.map { case (wv, k) =>
          wv - tdiv(grad.getOrElse(k.toLong, 0L), n * damp)
        }
      }
      // Eval scores from the UNCACHED matrix (the doc_id % filter
      // pushes below the tokenize, so this is a 1/evalMod-slice pass):
      // the returned lazy plan must not reference a cache the finally
      // block unpersists, and keeping the matrix cached past return
      // would leak (and silently serve) state across invocations.
      x.filter($"doc_id" % evalMod === evalRem)
        .select($"doc_id", (wAt($"k") * $"c").as("zz"))
        .groupBy($"doc_id").agg(sum($"zz").as("z"))
        .select($"doc_id", pMicro($"z").as("p_micro"))
        .join(lab, "doc_id")
        .select($"doc_id", $"y".as("label"), $"p_micro",
          when($"p_micro" >= PHalf, 1L).otherwise(0L).as("pred"))
        .orderBy($"doc_id")
    } finally {
      xTrain.unpersist(): Unit
    }
  }
}
