package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY.md §2-E (round 5 additions): retrieval + LM-statistics
  * operators over `documents` — BM25 ranked retrieval, bigram-LM
  * perplexity scoring, count-min-sketch frequency estimation, and
  * benchmark decontamination.
  *
  * Determinism pattern shared by all four: any float that is SUMMED
  * across rows is first quantized to integer nano-units in the column
  * plane (`round(x*1e9)` as long), so aggregation ORDER can never
  * change the result. Caveat: quantizing removes order-dependence but
  * not cross-engine libm divergence — a 1-ulp difference between JVM
  * Math.log and DuckDB LN could flip round(x*1e9) by ±1 and reorder a
  * rank near an exact tie. The workloads here keep score gaps well
  * above 1 nano; algorithms needing exact cross-engine invariance
  * (BFS, k-means) use all-integer state instead.
  */
object Retrieval {

  /** 60-bit md5 prefix as a long — portable across engines. */
  private def md5_60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // ---------------------------------------------------------------
  // text_bm25 — BM25 ranked retrieval (k1 = 1.2, b = 0.75)
  // ---------------------------------------------------------------

  /** The fixed query workload: 3 multi-term queries over the corpus
    * vocabulary. Broadcast-joined against the token stream. */
  private val Bm25Queries: Seq[(Int, String)] = Seq(
    1 -> "hash", 1 -> "join",
    2 -> "window", 2 -> "agg",
    3 -> "vector", 3 -> "scan")

  /** BM25 top-10 docs per query (Lucene idf form:
    * ln(1 + (N - df + 0.5)/(df + 0.5))).
    *
    * Scale shape: the token stream is filtered to query terms INSIDE
    * the scan stage (an `isin` over a literal set — predicate on the
    * exploded stream, never a full-vocabulary aggregation), so shuffle
    * volume is O(matching tokens), not O(corpus tokens). Corpus stats
    * (N, Σdl) and per-term df are single scalar / |terms|-row
    * aggregates, broadcast to the scorer. Per-term partial scores are
    * quantized to nano-units before the per-(query,doc) sum, so the
    * float sum order of a 1000-executor shuffle cannot flip ranks. */
  /** BM25 ranked leg shared by [[textBm25]] and the hybrid-RRF fusion:
    * (query_id, doc_id, rk, nano_sum), top `k` docs per query. */
  private def bm25Ranked(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val terms = Bm25Queries.map(_._2).distinct
    val q = s.createDataFrame(Bm25Queries).toDF("query_id", "term")
    // ONE tokenize pass feeds tf, dl and df (guide §1.2/§2.3 — the old
    // shape tokenized the corpus 4×: tf, a second full explode for df,
    // a dl scan, a stats scan):
    //  - dl (doc length in whitespace tokens; split keeps trailing
    //    empties — same in DuckDB) is computed BEFORE the explode and
    //    carried on each token row, so the tf⋈dl join disappears;
    //  - df rides the `stats` pass as one conditional counter per
    //    literal query term (df(t) = #docs whose token array contains
    //    t — exactly the tf-row count per term), folded into the same
    //    single-row scalar aggregate as n_docs/sum_dl. Map-side
    //    combined, broadcast as a 1-row map, attached by element_at —
    //    no second corpus explode, no window. NOT a window over tf:
    //    partitionBy on a 6-value term key colocates every tf row of a
    //    common term in one task (a skewed giant task at corpus
    //    scale); and NOT a groupBy over tf either: the df branch
    //    prunes `dl`, so its canonicalized exchange differs from the
    //    scorer's and Catalyst re-tokenizes the whole corpus for it
    //    (measured: 3 scans in the plan vs 2 for this shape).
    // Only `stats` still needs its own full-docs pass (docs with no
    // query term must count in n_docs/sum_dl). 2 text passes total.
    val stats = docs.select(split($"text", " ").as("ws")) // split ONCE per row
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size($"ws").cast("long")).as("sum_dl") +:
          terms.map(t => sum(when(
            array_contains($"ws", t), 1L).otherwise(0L)).as(s"df_$t")): _*)
      .select($"n_docs", $"sum_dl",
        map(terms.flatMap(t => Seq(lit(t), col(s"df_$t"))): _*).as("df_map"))
    val tok = docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", size($"ws").cast("long").as("dl"),
        explode($"ws").as("term"))
      .filter($"term".isin(terms: _*))
    val tf = tok.groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"), max($"dl").as("dl")) // dl is per-doc constant
    val scored = tf
      .crossJoin(broadcast(stats))
      .withColumn("df", element_at($"df_map", $"term"))
      .join(broadcast(q), "term")
      .withColumn("idf", log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))))
      .withColumn("nrm", lit(0.25) + lit(0.75) * ($"dl".cast("double") / ($"sum_dl".cast("double") / $"n_docs")))
      .withColumn("tfn", ($"tf" * lit(2.2)) / ($"tf" + lit(1.2) * $"nrm"))
      .withColumn("nano", round($"idf" * $"tfn" * lit(1e9)).cast("long"))
    val perDoc = scored.groupBy($"query_id", $"doc_id")
      .agg(sum($"nano").as("nano_sum"))
    val w = Window.partitionBy($"query_id").orderBy($"nano_sum".desc, $"doc_id")
    perDoc.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
  }

  private def textBm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bm25Ranked(s, dir, 10)
      .select($"query_id", $"doc_id", $"rk",
        ($"nano_sum".cast("double") / lit(1e9)).as("bm25"))
      .orderBy($"query_id", $"rk")
  }

  private val textBm25Sql = {
    val vals = Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH q AS (SELECT * FROM (VALUES $vals) v(query_id, term)),
       |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
       |stats AS (SELECT COUNT(*) AS n_docs, SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS sum_dl FROM documents),
       |tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
       |  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT q.query_id AS query_id, tf.doc_id AS doc_id,
       |    ROUND(LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
       |      * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))
       |      * 1e9) AS nano
       |  FROM tf JOIN dfreq ON tf.term = dfreq.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  JOIN q ON tf.term = q.term),
       |perdoc AS (
       |  SELECT query_id, doc_id, CAST(SUM(nano) AS BIGINT) AS nano_sum
       |  FROM scored GROUP BY query_id, doc_id),
       |r AS (
       |  SELECT query_id, doc_id, nano_sum,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY nano_sum DESC, doc_id) AS rk
       |  FROM perdoc)
       |SELECT query_id, doc_id, rk, CAST(nano_sum AS DOUBLE) / 1e9 AS bm25
       |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
  }

  // ---------------------------------------------------------------
  // retrieval_hybrid_rrf — lexical + vector fusion (the RAG shape)
  // ---------------------------------------------------------------

  /** Hybrid retrieval with reciprocal-rank fusion: the production RAG
    * retriever is BM25 ∪ vector-ANN with the two rankings fused by
    * RRF(d) = Σ_legs 1/(60 + rank_leg(d)), which needs no score
    * calibration between the incomparable BM25 and cosine scales
    * (Cormack et al., SIGIR'09). Query q's vector is the corpus
    * embedding vec_id = q; doc_id ≡ vec_id is the shared corpus id.
    *
    * Determinism: each leg's rank comes from its own exact ordering
    * (BM25 nano-units; cosine rounded to 9dp, vec_id tiebreak), and
    * the fusion score is INTEGER — 1e12 div (60+rk), summed as longs —
    * so no float sum order anywhere in the fused ranking.
    *
    * Scale shape: the lexical leg shuffles only term-matching tokens
    * (see [[bm25Ranked]]); the vector leg is a broadcast of |Q| probes
    * against one corpus scan with the top-k window planned as the
    * partial-heap GroupTopKExec (AutoTopK), so per-leg shuffle is
    * O(|Q| × k), not O(|Q| × corpus); the fusion join touches 2·|Q|·k
    * rows. On 100 TB the vector leg swaps to the IVF tier
    * (ann_filtered's during-probe path) without touching the fusion. */
  /** RRF fusion core shared by both hybrid retrievers: `lex`
    * (query_id, doc_id, lex_rk) ⊕ `vec` (query_id, doc_id, vec_rk),
    * integer-exact scoring. */
  private def hybridFuse(s: SparkSession, lex: DataFrame, vec: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("lex_pts",
        when($"lex_rk".isNotNull, expr("cast(1000000000000 as bigint) div (lex_rk + 60)"))
          .otherwise(0L))
      .withColumn("vec_pts",
        when($"vec_rk".isNotNull, expr("cast(1000000000000 as bigint) div (vec_rk + 60)"))
          .otherwise(0L))
      .withColumn("rrf_score", $"lex_pts" + $"vec_pts")
    val wf = Window.partitionBy($"query_id").orderBy($"rrf_score".desc, $"doc_id")
    fused.withColumn("rk", row_number().over(wf)).filter($"rk" <= 10)
      .select($"query_id", $"doc_id", $"rk".cast("long").as("rk"), $"rrf_score",
        coalesce($"lex_rk".cast("long"), lit(0L)).as("lex_rk"),
        coalesce($"vec_rk".cast("long"), lit(0L)).as("vec_rk"))
      .orderBy($"query_id", $"rk")
  }

  private def lexLeg(s: SparkSession, dir: String, legK: Int): DataFrame = {
    import s.implicits._
    bm25Ranked(s, dir, legK)
      .select($"query_id".cast("long"), $"doc_id", $"rk".as("lex_rk"))
  }

  private def probeIds: Seq[Long] = Bm25Queries.map(_._1).distinct.map(_.toLong)

  private def retrievalHybridRrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val legK = 20
    val emb = Tables.embeddings(s, dir)
    val probes = emb.filter($"vec_id".isin(probeIds: _*))
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    val vec = emb
      .crossJoin(broadcast(probes))
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(graft.functions.Fns.cosine_sim($"qe", $"embedding"), 9).as("cos_sim"))
      .withColumn("vec_rk", row_number().over(w)).filter($"vec_rk" <= legK)
      .select($"query_id", $"neighbor_id".as("doc_id"), $"vec_rk")
    hybridFuse(s, lexLeg(s, dir, legK), vec)
  }

  /** The hybrid retriever with its vector leg on the TRAINED-IVF tier —
    * the scale path the brute-leg key's scaladoc promises: candidates
    * come from the probes' nProbe nearest trained cells (never the
    * whole corpus), and the fusion is untouched — exactly the swap a
    * production retriever makes when the corpus outgrows a scan.
    * Self is excluded by the IVF convention; leg depth is whatever the
    * probed cells hold (RRF fuses partial legs by design). */
  private def retrievalHybridIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val probes = emb.filter($"vec_id".isin(probeIds: _*))
    val vec = Similarity.ivfTrainedTopK(s, dir, probes, k = 20)
      .select($"query_id", $"neighbor_id".as("doc_id"), $"rk".as("vec_rk"))
    hybridFuse(s, lexLeg(s, dir, 20), vec)
  }

  /** BM25 lexical CTE chain ending in lex(query_id, doc_id, lex_rk). */
  private val bm25LexCtes = {
    val vals = Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""q AS (SELECT * FROM (VALUES $vals) v(query_id, term)),
       |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
       |stats AS (SELECT COUNT(*) AS n_docs, SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS sum_dl FROM documents),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
       |  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT q.query_id AS query_id, tf.doc_id AS doc_id,
       |    ROUND(LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
       |      * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))
       |      * 1e9) AS nano
       |  FROM tf JOIN dfreq ON tf.term = dfreq.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  JOIN q ON tf.term = q.term),
       |perdoc AS (SELECT query_id, doc_id, CAST(SUM(nano) AS BIGINT) AS nano_sum
       |  FROM scored GROUP BY query_id, doc_id),
       |lex AS (
       |  SELECT query_id, doc_id, rk AS lex_rk FROM (
       |    SELECT query_id, doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY nano_sum DESC, doc_id) AS rk
       |    FROM perdoc) WHERE rk <= 20)""".stripMargin
  }

  /** Fusion oracle shared by both hybrid keys: `vecCtes` must end in
    * vec(query_id, doc_id, vec_rk). */
  private def hybridFusionSql(vecCtes: String): String =
    s"""WITH $bm25LexCtes,
       |$vecCtes,
       |fused AS (
       |  SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
       |    COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
       |    lex.lex_rk AS lex_rk, vec.vec_rk AS vec_rk,
       |    CAST(COALESCE(1000000000000 // (lex.lex_rk + 60), 0)
       |       + COALESCE(1000000000000 // (vec.vec_rk + 60), 0) AS BIGINT) AS rrf_score
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, rrf_score, lex_rk, vec_rk,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rk
       |  FROM fused)
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |  CAST(rk AS BIGINT) AS rk, rrf_score,
       |  CAST(COALESCE(lex_rk, 0) AS BIGINT) AS lex_rk,
       |  CAST(COALESCE(vec_rk, 0) AS BIGINT) AS vec_rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin

  private val retrievalHybridRrfSql = hybridFusionSql(
    """probes AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      |  WHERE vec_id IN (SELECT DISTINCT query_id FROM q)),
      |sc AS (
      |  SELECT probes.query_id, e.vec_id AS doc_id,
      |    ROUND(list_inner_product(qe::DOUBLE[], e.embedding::DOUBLE[])
      |      / (SQRT(list_inner_product(qe::DOUBLE[], qe::DOUBLE[]))
      |         * SQRT(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 9) AS cos_sim
      |  FROM probes CROSS JOIN embeddings e),
      |vec AS (
      |  SELECT query_id, doc_id, rk AS vec_rk FROM (
      |    SELECT query_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, doc_id) AS rk
      |    FROM sc) WHERE rk <= 20)""".stripMargin)

  private val retrievalHybridIvfSql = hybridFusionSql(
    s"""${Similarity.ivfScoredCtes(s"e.vec_id IN (${probeIds.mkString(", ")})", 2)},
       |vec AS (
       |  SELECT query_id, neighbor_id AS doc_id, rk AS vec_rk FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
       |    FROM ivfsc) WHERE rk <= 20)""".stripMargin)

  // ---------------------------------------------------------------
  // text_perplexity — add-one-smoothed bigram LM self-scoring
  // ---------------------------------------------------------------

  /** Per-document mean bigram log-probability under an add-one-smoothed
    * bigram LM trained on the corpus itself (the classic
    * quality-filter signal: low avg_logp ⇒ atypical text).
    * p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V).
    *
    * Scale shape: the model is two aggregates over one exploded token
    * stream (bigram + unigram counts, both map-side combinable). The
    * scoring joins carry NO broadcast hint: the bigram/unigram count
    * tables are vocabulary-sized (billions of rows on a 100 TB corpus),
    * so the scale-safe plan is a shuffled join on (w1,w2)/(w1) — AQE
    * downgrades to broadcast at runtime only when the measured model
    * side is actually small (as it is on the test corpus). Only the
    * 1-row vocab scalar is hint-broadcast. Per-bigram LN is
    * nano-quantized before the per-doc mean; note the residual
    * cross-engine libm dependence — a 1-ulp JVM-vs-DuckDB LN gap can
    * flip the 1e-9 quantum, so ties within ±1 nano are not guaranteed
    * stable across engines (scores here are well-separated). */
  private def textPerplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val bg = docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] as w1, ws[i+1] as w2))")).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    // Type-level scoring (same restructure as textKnPerplexity, guide
    // §2.3): nano is a pure function of the bigram type, so the model
    // joins fold into one |types|-row table and the occurrence stream
    // makes a single attach join — exact identity with the
    // per-occurrence formulation.
    val c2 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val tokens = docs.select(explode(split($"text", " ")).as("w"))
    val c1 = tokens.groupBy($"w").agg(count(lit(1)).as("c1"))
      .localCheckpoint() // feeds the score join AND the vocab count
    // |vocab| = COUNT(DISTINCT w) over the token stream ≡ row count of
    // c1 — derived from the checkpoint instead of a second full
    // tokenize pass of the corpus.
    val vocab = c1.agg(count(lit(1)).as("v"))
    val typeNano = c2
      .join(c1, c2("w1") === c1("w"))
      .crossJoin(broadcast(vocab))
      .withColumn("nano",
        round(log(($"c2" + lit(1.0)) / ($"c1" + $"v")) * lit(1e9)).cast("long"))
      .select($"w1", $"w2", $"nano")
    bg.join(typeNano, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"nano").as("nano_sum"))
      .select($"doc_id", $"n_bigrams",
        (expr("sign(nano_sum) * (abs(nano_sum) div n_bigrams)")
          .cast("double") / 1e9).as("avg_logp"))
      .orderBy($"doc_id")
  }

  private val textPerplexitySql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
      |    unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
      |  FROM tok WHERE len(ws) >= 2),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
      |alltok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |c1 AS (SELECT w, COUNT(*) AS c1 FROM alltok GROUP BY w),
      |vocab AS (SELECT COUNT(DISTINCT w) AS v FROM alltok),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(ROUND(LN((c2 + 1.0) / (c1 + v)) * 1e9) AS BIGINT) AS nano
      |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 ON bg.w1 = c1.w CROSS JOIN vocab)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SIGN(CAST(SUM(nano) AS BIGINT))
      |    * (ABS(CAST(SUM(nano) AS BIGINT)) // COUNT(*)) AS DOUBLE) / 1e9 AS avg_logp
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // text_kn_perplexity — interpolated Kneser-Ney bigram LM scoring
  // ---------------------------------------------------------------

  /** Per-document mean bigram log-probability under an interpolated
    * Kneser-Ney bigram LM (absolute discount d = 0.75) trained on the
    * corpus itself — the standard LM quality filter, one smoothing
    * class up from `text_perplexity`'s add-one:
    *
    *   p(w2|w1) = (c(w1,w2) − d)/cL(w1)
    *            + d·N1+(w1,•)/cL(w1) · N1+(•,w2)/B
    *
    * where cL(w1) = Σ_w2 c(w1,w2), N1+(w1,•)/N1+(•,w2) are distinct
    * continuation/context counts and B = distinct bigram types. Every
    * scored bigram is observed (self-scoring), so the discounted term
    * never clips at zero.
    *
    * Scale shape: ALL model statistics derive from the single bigram
    * count table `c2` (localCheckpoint'd — it feeds the score join
    * plus three re-aggregations; aliasing would otherwise defeat
    * exchange reuse): left stats (cL, N1+fwd) are one groupBy(w1) over
    * c2, context counts one groupBy(w2), B one 1-row count — nothing
    * re-reads the corpus. Model joins carry NO broadcast hint (the
    * count tables are vocabulary-sized at 100 TB; AQE broadcasts only
    * when the measured side is small). Per-bigram LN nano-quantized
    * before the mean, same caveat as text_perplexity. */
  private def textKnPerplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = 0.75
    val bg = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] as w1, ws[i+1] as w2))")).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    // Scored at bigram-TYPE level (guide §2.3 — shuffle fewer bytes):
    // nano is a pure function of the bigram type, so the model joins
    // (c2⋈left⋈right⋈btot) fold into ONE |types|-row table BEFORE
    // touching the occurrence stream, and the occurrence side makes a
    // single attach join on (w1,w2) instead of riding through a 3-way
    // join chain (the old shape reshuffled O(corpus-bigrams) rows on
    // (w1,w2), then w1, then w2). Exact identity: every occurrence
    // joins exactly one type row carrying the same nano it computed
    // inline before. (A variant that also pre-aggregated occurrences
    // to (doc, w1, w2, cnt) was MEASURED and rejected: on this corpus
    // bigram types-per-doc ≈ occurrences-per-doc, so the extra
    // aggregation + checkpoint cost more than the recomputed explode
    // it saved — see OPTIMIZATION_r16.md.)
    val c2 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val left = c2.groupBy($"w1")
      .agg(sum($"c2").as("cl"), count(lit(1)).as("nfwd"))
    val right = c2.groupBy($"w2").agg(count(lit(1)).as("nbwd"))
    val btot = c2.agg(count(lit(1)).as("btot"))
    val typeNano = c2
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(btot))
      .withColumn("nano",
        round(log(($"c2" - lit(d)) / $"cl"
          + (lit(d) * $"nfwd" * $"nbwd") / ($"cl".cast("double") * $"btot")) * lit(1e9))
          .cast("long"))
      .select($"w1", $"w2", $"nano")
    bg.join(typeNano, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"nano").as("nano_sum"))
      .select($"doc_id", $"n_bigrams",
        (expr("sign(nano_sum) * (abs(nano_sum) div n_bigrams)")
          .cast("double") / 1e9).as("avg_logp"))
      .orderBy($"doc_id")
  }

  private val textKnPerplexitySql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
      |    unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
      |  FROM tok WHERE len(ws) >= 2),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
      |lft AS (SELECT w1, SUM(c2) AS cl, COUNT(*) AS nfwd FROM c2 GROUP BY w1),
      |rgt AS (SELECT w2, COUNT(*) AS nbwd FROM c2 GROUP BY w2),
      |bt AS (SELECT COUNT(*) AS btot FROM c2),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(ROUND(LN((c2 - 0.75) / cl
      |      + (0.75 * nfwd * nbwd) / (CAST(cl AS DOUBLE) * btot)) * 1e9) AS BIGINT) AS nano
      |  FROM bg JOIN c2 USING (w1, w2) JOIN lft USING (w1) JOIN rgt USING (w2)
      |    CROSS JOIN bt)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SIGN(CAST(SUM(nano) AS BIGINT))
      |    * (ABS(CAST(SUM(nano) AS BIGINT)) // COUNT(*)) AS DOUBLE) / 1e9 AS avg_logp
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // text_cms_topk — count-min sketch estimates vs exact counts
  // ---------------------------------------------------------------

  /** Count-min sketch (d = 4 rows × w = 8 buckets, md5 hash family)
    * next to exact counts for the top-20 tokens. `w` is deliberately
    * tiny so collisions are guaranteed and the one-sided error
    * (cms_est ≥ exact, reported as `err`) is visible.
    *
    * Scale shape: the sketch is built FROM the per-token frequency
    * vector (bucket assignment is a pure token function, so CMS over
    * the stream ≡ CMS over the frequency table); at 100 TB the
    * frequency table itself is the expensive part and is one
    * map-side-combinable aggregation — the sketch adds d tiny
    * re-aggregations of a |vocab|-row table. */
  private def textCmsTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = 4
    val w = 8
    val counts = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("exact_cnt"))
    val rows = s.createDataFrame((0 until d).map(Tuple1(_))).toDF("i")
    // bucket_i(t) = md5_60("cms" i ":" t) mod w — portable both engines
    val bucketed = counts.crossJoin(broadcast(rows))
      .withColumn("bucket",
        pmod(md5_60(concat(lit("cms"), $"i".cast("string"), lit(":"), $"token")), lit(w.toLong)))
    val sketch = bucketed.groupBy($"i", $"bucket").agg(sum($"exact_cnt").as("cell"))
    val est = bucketed
      .join(sketch, Seq("i", "bucket"))
      .groupBy($"token", $"exact_cnt")
      .agg(min($"cell").as("cms_est"))
    est.select($"token", $"exact_cnt", $"cms_est",
        ($"cms_est" - $"exact_cnt").as("err"))
      .orderBy($"exact_cnt".desc, $"token")
      .limit(20)
  }

  private val textCmsTopkSql =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      |counts AS (SELECT token, COUNT(*) AS exact_cnt FROM tok GROUP BY token),
      |bucketed AS (
      |  SELECT token, exact_cnt, i,
      |    CAST('0x' || substring(md5('cms' || i::VARCHAR || ':' || token), 1, 15) AS BIGINT) % 8 AS bucket
      |  FROM counts CROSS JOIN (SELECT unnest(range(0, 4)) AS i) rows),
      |sketch AS (SELECT i, bucket, SUM(exact_cnt) AS cell FROM bucketed GROUP BY i, bucket),
      |est AS (
      |  SELECT token, exact_cnt, MIN(cell) AS cms_est
      |  FROM bucketed JOIN sketch USING (i, bucket)
      |  GROUP BY token, exact_cnt)
      |SELECT token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
      |  CAST(cms_est AS BIGINT) AS cms_est,
      |  CAST(cms_est - exact_cnt AS BIGINT) AS err
      |FROM est ORDER BY exact_cnt DESC, token LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // corpus_decontam — benchmark n-gram decontamination
  // ---------------------------------------------------------------

  /** Benchmark decontamination: flag training docs sharing any word
    * 4-gram with the held-out eval set (doc_id ≡ 0 mod 41 plays the
    * benchmark role). Output per contaminated train doc: how many
    * distinct eval grams it hit and how many eval docs those grams
    * span — the evidence table a filtering pass consumes.
    *
    * Scale shape: grams travel as 60-bit md5 hashes (fixed-width
    * shuffle keys, never the gram text). The eval side carries NO
    * broadcast hint: here it is carved out of the corpus itself
    * (doc_id % 41) and therefore grows with the corpus, so forcing a
    * broadcast would OOM at the 100 TB design point. AQE broadcasts at
    * runtime when the measured eval side is small (a real benchmark
    * suite is), and falls back to a shuffled hash join otherwise. */
  private def corpusDecontam(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = 4
    val grams = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= n)
      .select($"doc_id", explode(expr(
        s"transform(sequence(0, size(ws) - $n), i -> concat_ws(' ', slice(ws, i + 1, $n)))")).as("g"))
      .select($"doc_id", md5_60($"g").as("gh"))
      .distinct()
    val eval_ = grams.filter($"doc_id" % 41 === 0)
      .select($"doc_id".as("eval_doc"), $"gh")
    val train = grams.filter($"doc_id" % 41 =!= 0)
    train.join(eval_, "gh")
      .groupBy($"doc_id")
      .agg(countDistinct($"gh").as("n_grams_hit"),
        countDistinct($"eval_doc").as("n_eval_docs"))
      .orderBy($"doc_id")
  }

  private val corpusDecontamSql =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE len(string_split(text, ' ')) >= 4),
      |g AS (
      |  SELECT DISTINCT doc_id,
      |    CAST('0x' || substring(md5(array_to_string(ws[i:i+3], ' ')), 1, 15) AS BIGINT) AS gh
      |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 3)) AS i FROM tok) t),
      |ev AS (SELECT doc_id AS eval_doc, gh FROM g WHERE doc_id % 41 = 0),
      |tr AS (SELECT doc_id, gh FROM g WHERE doc_id % 41 != 0)
      |SELECT tr.doc_id AS doc_id,
      |  COUNT(DISTINCT tr.gh) AS n_grams_hit,
      |  COUNT(DISTINCT ev.eval_doc) AS n_eval_docs
      |FROM tr JOIN ev ON tr.gh = ev.gh
      |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin

  /** Ranked-retrieval EVALUATION (nDCG@10, precision@10, first
    * relevant rank) — the metric layer the BM25/TF-IDF keys feed in a
    * real IR pipeline. Queries are carved from the corpus
    * (doc_id % 97), each represented by its 5 RAREST terms (global df
    * ascending — rare terms carry the signal); candidates are ranked
    * by Σ tf·idf_micro with idf micro-quantized per term BEFORE the
    * sum (order-proof); relevance is same-source (binary), self
    * excluded. DCG discounts 1/log2(i+1) are micro-quantized per rank
    * (i ≤ 10 scalars), so DCG/IDCG are exact integer sums and nDCG is
    * one double division — both engines replay it bit-for-bit.
    *
    * Scale shape: query-term selection is a per-query window over the
    * query doc's own vocabulary; scoring joins the corpus tf table to
    * the 5·|Q| query-term table on the term key (AQE broadcasts while
    * small); top-10 is a per-query window. No corpus×corpus work. */
  private def textNdcgEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select($"doc_id", $"text")
      .repartition(s.sparkContext.defaultParallelism) // past the 1-task scan cap
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .filter(length($"t") > 0)
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds df, query terms, and scoring
    val df = tf.groupBy($"t").agg(count(lit(1)).as("df"))
    // BOUNDED query set (≤ 100 queries at ANY corpus size) — the
    // standard eval shape (cf. the fixed Bm25Queries / vec_id < 10 ANN
    // probes). An unbounded carve (every 97th doc) blew up at sf10 on
    // this tiny-vocabulary corpus: ~5k queries × near-zero term
    // selectivity made the score join quadratic-ish and term-skewed.
    // Bounded queries also make the query-term side provably
    // broadcastable below.
    val qdocs = docs.filter($"doc_id" % 97 === 0 && $"doc_id" < 9700)
      .select($"doc_id".as("qid"), $"source".as("qsrc"))
    val qterms = tf.join(qdocs.select($"qid"), $"doc_id" === $"qid")
      .join(df, "t")
      .withColumn("trk", row_number().over(
        Window.partitionBy($"qid").orderBy($"df", $"t")))
      .filter($"trk" <= 5)
      .crossJoin(broadcast(stats))
      .select($"qid", $"t",
        round(log($"n_docs".cast("double") / $"df") * 1e6).cast("long").as("idfm"))
    val top = tf.join(broadcast(qterms), "t") // ≤ 500 rows by construction
      .filter($"doc_id" =!= $"qid")
      .groupBy($"qid", $"doc_id").agg(sum($"tf" * $"idfm").as("score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid").orderBy($"score".desc, $"doc_id")))
      .filter($"rk" <= 10)
    val rel = top
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .join(broadcast(qdocs), "qid")
      .withColumn("rel", when($"source" === $"qsrc", 1L).otherwise(0L))
      .withColumn("disc", expr("CAST(round(1000000 * ln(2) / ln(rk + 1)) AS BIGINT)"))
    val perQ = rel.groupBy($"qid").agg(
      sum($"rel" * $"disc").as("dcgm"),
      sum($"rel").as("n_rel10"),
      min(when($"rel" === 1L, $"rk")).as("frank"))
    val srcN = docs.groupBy($"source").agg(count(lit(1)).as("nsrc"))
    val nrel = qdocs.join(broadcast(srcN), $"qsrc" === $"source")
      .select($"qid", ($"nsrc" - 1).as("n_rel_total"))
    perQ.join(nrel, "qid")
      .withColumn("idcgm", expr(
        """CASE WHEN n_rel_total >= 1 THEN
          |  aggregate(sequence(1, CAST(least(10, n_rel_total) AS INT)), CAST(0 AS BIGINT),
          |    (acc, i) -> acc + CAST(round(1000000 * ln(2) / ln(i + 1)) AS BIGINT))
          |ELSE CAST(0 AS BIGINT) END""".stripMargin))
      .select($"qid".as("query_doc"), $"n_rel_total",
        coalesce($"frank".cast("long"), lit(-1L)).as("first_rel_rank"),
        ($"n_rel10".cast("double") / 10).as("precision10"),
        when($"idcgm" > 0, $"dcgm".cast("double") / $"idcgm")
          .otherwise(lit(0.0)).as("ndcg10"))
      .orderBy($"query_doc")
  }

  private val textNdcgEvalSql =
    """WITH tf AS (
      |  SELECT doc_id, t, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) x
      |  WHERE len(t) > 0 GROUP BY doc_id, t),
      |dfr AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
      |st AS (SELECT COUNT(*) AS n_docs FROM documents),
      |qd AS (SELECT doc_id AS qid, source AS qsrc FROM documents
      |  WHERE doc_id % 97 = 0 AND doc_id < 9700),
      |qt AS (SELECT qid, t, idfm FROM (
      |    SELECT qd.qid, tf.t,
      |      CAST(ROUND(ln(CAST(n_docs AS DOUBLE) / df) * 1e6) AS BIGINT) AS idfm,
      |      ROW_NUMBER() OVER (PARTITION BY qd.qid ORDER BY df, tf.t) AS trk
      |    FROM tf JOIN qd ON tf.doc_id = qd.qid
      |    JOIN dfr ON tf.t = dfr.t CROSS JOIN st) y WHERE trk <= 5),
      |top AS (SELECT qid, doc_id, rk FROM (
      |    SELECT s.qid, s.doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY s.qid ORDER BY s.score DESC, s.doc_id) AS rk
      |    FROM (SELECT qt.qid, tf.doc_id, SUM(tf.tf * qt.idfm) AS score
      |          FROM tf JOIN qt ON tf.t = qt.t WHERE tf.doc_id <> qt.qid
      |          GROUP BY qt.qid, tf.doc_id) s) z WHERE rk <= 10),
      |rl AS (SELECT top.qid, top.rk,
      |    CASE WHEN d.source = qd.qsrc THEN 1 ELSE 0 END AS rel,
      |    CAST(ROUND(1000000 * ln(2) / ln(top.rk + 1)) AS BIGINT) AS disc
      |  FROM top JOIN documents d ON top.doc_id = d.doc_id
      |  JOIN qd ON top.qid = qd.qid),
      |pq AS (SELECT qid, SUM(rel * disc) AS dcgm, SUM(rel) AS n_rel10,
      |    MIN(CASE WHEN rel = 1 THEN rk END) AS frank
      |  FROM rl GROUP BY qid),
      |srcn AS (SELECT source, COUNT(*) AS nsrc FROM documents GROUP BY source),
      |nr AS (SELECT qid, nsrc - 1 AS n_rel_total FROM qd JOIN srcn ON qd.qsrc = srcn.source),
      |idc AS (SELECT pq.qid, dcgm, n_rel10, frank, n_rel_total,
      |    CASE WHEN n_rel_total >= 1 THEN
      |      COALESCE(list_sum(list_transform(range(1, CAST(LEAST(10, n_rel_total) AS BIGINT) + 1),
      |        i -> CAST(ROUND(1000000 * ln(2) / ln(i + 1)) AS BIGINT))), 0)
      |    ELSE 0 END AS idcgm
      |  FROM pq JOIN nr ON pq.qid = nr.qid)
      |SELECT qid AS query_doc, CAST(n_rel_total AS BIGINT) AS n_rel_total,
      |  CAST(COALESCE(frank, -1) AS BIGINT) AS first_rel_rank,
      |  CAST(n_rel10 AS DOUBLE) / 10 AS precision10,
      |  CASE WHEN idcgm > 0 THEN CAST(dcgm AS DOUBLE) / idcgm ELSE 0.0 END AS ndcg10
      |FROM idc ORDER BY query_doc""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "text_ndcg_eval" -> QueryDef(textNdcgEval, Some(textNdcgEvalSql)),
    "text_bm25" -> QueryDef(textBm25, Some(textBm25Sql), bench = true),
    "retrieval_hybrid_rrf" -> QueryDef(retrievalHybridRrf, Some(retrievalHybridRrfSql), bench = true),
    "retrieval_hybrid_ivf" -> QueryDef(retrievalHybridIvf, Some(retrievalHybridIvfSql)),
    "text_perplexity" -> QueryDef(textPerplexity, Some(textPerplexitySql)),
    "text_kn_perplexity" -> QueryDef(textKnPerplexity, Some(textKnPerplexitySql), bench = true),
    "text_cms_topk" -> QueryDef(textCmsTopk, Some(textCmsTopkSql)),
    "corpus_decontam" -> QueryDef(corpusDecontam, Some(corpusDecontamSql))
  )
}
