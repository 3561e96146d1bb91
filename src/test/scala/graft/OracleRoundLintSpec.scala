package graft

import org.scalatest.funsuite.AnyFunSuite

/** r8 VERDICT next #3: the driver's DuckDB version can drift, and
  * `ROUND(double, k)` half-edges are the one place two engines can
  * disagree on otherwise bit-identical values (the r8
  * corpus_line_dedup / text_bpe_fertility hash reds). This lint walks
  * every oracle's SQL and enforces the repo rule:
  *
  *  - a ROUND site with NO division is integer quantization
  *    (ROUND(x*100) AS BIGINT etc.) — safe, both engines round the
  *    same exact decimal;
  *  - a ROUND site whose every division is by a literal d with
  *    d | 10^15 (powers of ten, small powers of two, 100, ...) is
  *    exact decimal scaling of an integer — the true value has <= 15
  *    decimal digits, so rounding at <= 9 digits returns it verbatim
  *    in both engines;
  *  - anything else (a data-dependent denominator, ln/exp/sqrt
  *    algebra) must be in the explicit allowlist below, where the
  *    ROUND is a deliberate cross-libm tolerance with documented
  *    residual half-edge risk.
  *
  * Integer-ratio columns must instead use the exact form
  * `(num * 10^k) div den` (Spark) / `(num * 10^k) // den` (DuckDB) —
  * see keep_ratio_ppb, jaccard, p_control, density, ...
  */
class OracleRoundLintSpec extends AnyFunSuite {

  /** Keys whose surviving ROUND sites round TRANSCENDENTAL or
    * fixed-shape IEEE float algebra (ln/log10/exp/sqrt chains over
    * exact integer inputs). No exact integer form exists for these;
    * the round is the tolerance. */
  private val allowlist: Map[String, String] = {
    val cosine = "cosine: inner-product/sqrt chain over identical " +
      "float inputs; ROUND(,9) is the cross-libm tolerance"
    Map(
      "text_tfidf" -> "tf * LN(n_docs/df) — transcendental",
      "q_ab_test" -> "pooled two-proportion z: sqrt algebra",
      "q_benford" -> "chi-square terms over LOG10-derived expectations",
      "q_corr" -> "Pearson r: sqrt of integer moment algebra",
      "q_autocorr" -> "lag-1 Pearson r: sqrt of integer moment algebra",
      "text_zipf" -> "log-log regression slope/r2",
      "q_entropy" -> "Shannon entropy: ln over exact nano sums",
      "q_gini" -> "2*sim/(n*sum) float algebra over >2^53 integers",
      "text_classifier_score" -> "logistic 1/(1+exp(-x))",
      "emb_separation" -> "cosine margin: sqrt-normalized nano sums",
      "text_ndcg_eval" -> "LN(2)/LN(i+1) discount quantization",
      "corpus_dsir" -> "ln-ratio importance weights",
      "q_seasonality" -> "trig/float seasonal index",
      "q_psi_drift" -> "PSI: ln-ratio terms (nano-quantized both sides)",
      "q_movers" -> "pct change float algebra",
      "emb_kmeans" -> "centroid means: micro-quantized exact scaling",
      "q_equidepth" -> "bucket boundary floats from exact quantiles",
      "corpus_weighted_sample" -> "LN(u)/n_chars Efraimidis-Spirakis key",
      "text_bm25" -> "BM25: ln-idf x saturation float algebra",
      "text_perplexity" -> "nano quantization of LN probabilities (avg is exact)",
      "text_kn_perplexity" -> "nano quantization of KN LN terms (avg is exact)",
      "q_graph_adamic_adar" -> "micro quantization of 1/ln(deg)",
      "ann_ivf_trained" -> "k-means centroid mean: nearest-int of micro sums",
      "ann_ivf_manifest" -> ("k-means centroid mean + cosine chain " +
        "(ivfScoredCtes, same sites as ann_ivf_trained); the census " +
        "columns are exact BIGINT counts"),
      "ann_ivfpq_manifest" -> ("k-means centroid mean + cosine chain " +
        "(ivfScoredCtes, same sites as ann_ivf_trained) + the exact " +
        "re-rank/brute-force cosines (round(cos,9), the top-k family " +
        "convention); census and recall columns are exact BIGINT counts"),
      "ann_ivfpq_residual" -> ("same cosine-chain sites as " +
        "ann_ivfpq_manifest; residual/ADC arithmetic is exact int² on " +
        "the micro grid, recall column an exact BIGINT count"),
      "ann_sq8" -> "SQ8 quantizer: (v-mn)*255/(mx-mn) float grid",
      "ann_recall_sq8" -> "SQ8 quantizer + cosine chain",
      "q_disorder" -> "quantile_cont interpolation / 60000.0 minutes",
      "q_time_to_convert" -> "quantile_cont interpolation / 60000.0 minutes",
      "ann_bruteforce" -> cosine, "ann_bq_hamming" -> cosine,
      "ann_bq_recall" -> cosine, "ann_ivf" -> cosine,
      "ann_filtered" -> cosine,
      "ann_beam_search" -> cosine,
      "ann_beam_recall" -> (cosine + "; plus recall n_hit/5 — exact " +
        "BIGINT count over the constant k on both sides"),
      "ann_beam_curve" -> (cosine + "; plus recall n_hit/50 — exact " +
        "BIGINT count over the constant probe-total on both sides"),
      "retrieval_hybrid_rrf" -> ("BM25 ln-idf nano units (lexical leg) + " +
        cosine + " (vector leg); the FUSED score is exact integer div"),
      "retrieval_hybrid_ivf" -> ("BM25 ln-idf nano units (lexical leg) + " +
        cosine + " over the trained-IVF cells (vector leg); fused score " +
        "exact integer div"),
      "ann_filtered_recall" -> (cosine + "; plus recall n_hit/5.0 — one " +
        "exact BIGINT count over a constant k on both sides"),
      "ann_ivfpq" -> cosine, "ann_lsh" -> cosine, "ann_mrr" -> cosine,
      "ann_pq_adc" -> cosine, "ann_range_search" -> cosine,
      "ann_recall" -> cosine, "ann_recall_lsh" -> cosine,
      "ann_probe_curve" -> (cosine + "; plus hit-ratio n_hit/nb — both " +
        "sides divide the same two exact BIGINT counts"),
      "dedup_embedding" -> cosine, "dedup_semantic" -> cosine,
      "emb_hard_negatives" -> cosine, "emb_label_noise" -> cosine,
      "emb_matryoshka_eval" -> cosine, "emb_mmr" -> cosine,
      "knn_graph" -> cosine, "knn_graph_recall" -> cosine,
      "emb_knn_classify" -> cosine,
      "knn_graph_refine" -> cosine, "ann_vamana_prune" -> cosine,
      "knn_refine_recall" -> cosine,
      "emb_nmi" -> "k-means centroid mean: nearest-int of micro sums (kmeansCtes)",
      "emb_split_drift" -> "centroid cosine: dot/sqrt chain over exact DECIMAL(38) sums"
    )
  }

  /** Every balanced `ROUND(...)` call body in `sql`. */
  private def roundSites(sql: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    val u = sql.toUpperCase
    var i = u.indexOf("ROUND(")
    while (i >= 0) {
      var depth = 1
      var j = i + 6
      while (j < sql.length && depth > 0) {
        if (sql(j) == '(') depth += 1
        else if (sql(j) == ')') depth -= 1
        j += 1
      }
      out += sql.substring(i, j)
      i = u.indexOf("ROUND(", j)
    }
    out.toSeq
  }

  /** True when every single-slash division in `site` is by an exact
    * decimal-scaling literal (d divides 10^15). `//` integer division
    * is always fine and skipped. */
  private def onlyExactScalingDivisions(site: String): Boolean = {
    val tenPow15 = BigInt(10).pow(15)
    var i = 0
    var ok = true
    while (i < site.length) {
      if (site(i) == '/') {
        if (i + 1 < site.length && site(i + 1) == '/') i += 1 // // is exact
        else {
          var j = i + 1
          while (j < site.length && site(j) == ' ') j += 1
          val lit = site.drop(j).takeWhile(c => c.isDigit || c == '.' ||
            c == 'e' || c == 'E' || c == '+')
          val d = try {
            if (lit.isEmpty) None
            else Some(BigDecimal(lit.toDouble))
          } catch { case _: Throwable => None }
          val exact = d.exists { v =>
            v > 0 && v.isWhole && tenPow15 % v.toBigInt == 0
          }
          if (!exact) ok = false
        }
      }
      i += 1
    }
    ok
  }

  test("divide-then-ROUND oracle sites are exact-scaling or allowlisted") {
    val offenders = for {
      (key, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      if !allowlist.contains(key)
      site <- roundSites(sql)
      if !onlyExactScalingDivisions(site)
    } yield s"$key: ${site.replaceAll("\\s+", " ").take(100)}"
    assert(offenders.isEmpty,
      s"""unguarded ROUND over a data-dependent quotient (convert to
         |(num*10^k) div den, or allowlist with justification):
         |${offenders.mkString("\n")}""".stripMargin)
  }

  test("allowlist entries still exist and still contain a ROUND") {
    val stale = allowlist.keys.filter { k =>
      SparkEntry.oracleSql.get(k) match {
        case None => true
        case Some(sql) => roundSites(sql).isEmpty
      }
    }
    assert(stale.isEmpty, s"stale allowlist entries: ${stale.mkString(", ")}")
  }
}
