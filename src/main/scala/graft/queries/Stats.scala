package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-6 statistics batch: exact cross-engine correlation /
  * regression stats, categorical entropy + mode, robust (median/MAD)
  * outlier detection, and DSIR-style hashed-n-gram importance
  * resampling (Xie et al. 2023) for domain-matched corpus selection.
  *
  * Cross-engine exactness strategy (same as QueryDef's money rules):
  * quantize inputs to integers up front (cents / micro-log units),
  * aggregate exactly (int128 / DECIMAL(38,0) sums), and run the final
  * double arithmetic on bit-identical operands with an identical
  * expression shape on both engines. libm calls (LN) are per-row
  * scalars quantized to integers immediately, so aggregation order
  * can never leak into the hash.
  */
object Stats {

  /** 60-bit md5 word hash — same convention as operators.Dedup grams:
    * DuckDB mirrors it as CAST('0x' || substring(md5(w),1,15) AS BIGINT). */
  private def hash60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // ---------------------------------------------------------------- q_corr

  /** Pearson correlation + OLS slope of extendedprice vs quantity per
    * returnflag, computed from EXACT integer co-moments: cents-quantized
    * inputs, DECIMAL(38,0) sums (DuckDB: int128 SUM(BIGINT)), then one
    * closed-form double expression over bit-identical operands. Spark's
    * built-in `corr` is a streaming co-moment whose low bits depend on
    * partition order — this formulation is deterministic at any
    * parallelism, and the sums stay map-side combinable (one shuffle of
    * 6 numbers per group). */
  private def qCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = DecimalType(38, 0)
    val li = Tables.lineitem(s, dir).select($"l_returnflag",
      round($"l_quantity" * 100).cast("long").as("x"),
      round($"l_extendedprice" * 100).cast("long").as("y"))
    val a = li.groupBy("l_returnflag").agg(
      count(lit(1)).cast("double").as("n"),
      sum($"x".cast(d38)).cast("double").as("sx"),
      sum($"y".cast(d38)).cast("double").as("sy"),
      sum(($"x" * $"x").cast(d38)).cast("double").as("sxx"),
      sum(($"y" * $"y").cast(d38)).cast("double").as("syy"),
      sum(($"x" * $"y").cast(d38)).cast("double").as("sxy"))
    a.select($"l_returnflag",
        $"n".cast("long").as("n_rows"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")), 9)
          .as("corr_qty_price"),
        round(($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx"), 9)
          .as("beta_price_per_qty"))
      .orderBy("l_returnflag")
  }

  private val qCorrSql =
    """WITH t AS (SELECT l_returnflag,
      |    CAST(ROUND(l_quantity*100) AS BIGINT) AS x,
      |    CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y FROM lineitem),
      |a AS (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(x*x) AS DOUBLE) AS sxx, CAST(SUM(y*y) AS DOUBLE) AS syy,
      |    CAST(SUM(x*y) AS DOUBLE) AS sxy FROM t GROUP BY 1)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  ROUND((n*sxy - sx*sy)/SQRT((n*sxx - sx*sx)*(n*syy - sy*sy)), 9) AS corr_qty_price,
      |  ROUND((n*sxy - sx*sy)/(n*sxx - sx*sx), 9) AS beta_price_per_qty
      |FROM a ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------- q_entropy

  /** Per-language source-distribution stats: Shannon entropy (bits) and
    * the modal source. H = ln(N) - Σ c·ln(c)/N, with each per-source
    * ln(c) nano-quantized to an integer BEFORE the sum so aggregation
    * order cannot perturb low bits. Mode ties break lexicographically.
    * Two tiny aggregates over a (lang, source) count table — the only
    * full-data pass is the first groupBy. */
  private def qEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.documents(s, dir).groupBy("lang", "source").count()
      .withColumn("lnc", round(log($"count".cast("double")) * 1e9).cast("long"))
    val a = c.groupBy("lang").agg(
      sum($"count").as("n"),
      count(lit(1)).as("ns"),
      sum($"count" * $"lnc").as("slc"))
    val m = c.withColumn("rn",
        row_number().over(Window.partitionBy($"lang").orderBy($"count".desc, $"source")))
      .filter($"rn" === 1).select($"lang", $"source".as("mode_source"))
    a.join(m, "lang")
      .select($"lang", $"n".cast("long").as("n_docs"), $"ns".cast("long").as("n_sources"),
        round((log($"n".cast("double")) - $"slc".cast("double") / 1e9 / $"n") / log(lit(2.0)), 6)
          .as("entropy_bits"),
        $"mode_source")
      .orderBy("lang")
  }

  private val qEntropySql =
    """WITH c AS (SELECT lang, source, COUNT(*) AS cnt FROM documents GROUP BY 1, 2),
      |q AS (SELECT lang, source, cnt,
      |    CAST(ROUND(LN(CAST(cnt AS DOUBLE))*1e9) AS BIGINT) AS lnc FROM c),
      |a AS (SELECT lang, SUM(cnt) AS n, COUNT(*) AS ns, SUM(cnt*lnc) AS slc
      |    FROM q GROUP BY 1),
      |m AS (SELECT lang, source AS mode_source,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, source) AS rn FROM c)
      |SELECT a.lang AS lang, CAST(n AS BIGINT) AS n_docs, CAST(ns AS BIGINT) AS n_sources,
      |  ROUND((LN(CAST(n AS DOUBLE)) - CAST(slc AS DOUBLE)/1e9/n) / LN(2.0), 6) AS entropy_bits,
      |  mode_source
      |FROM a JOIN m USING (lang) WHERE rn = 1 ORDER BY lang""".stripMargin

  // -------------------------------------------------------- q_mad_outliers

  /** Robust outlier detection per event type: median + MAD (median
    * absolute deviation), flagging |v - med| > 3·MAD. Values are
    * cents-quantized so both engines' linear-interpolated medians land
    * on an exact binary grid (halves/quarters) — bit-identical with no
    * libm involved. Three scans of events, but every joined stat table
    * is #event_types rows (broadcast by construction at any scale);
    * exact medians shuffle per-group sorted values, the scale knob is
    * swapping percentile→approx_percentile when exactness isn't required. */
  private def qMadOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"event_type", round($"value" * 100).cast("long").as("vc"))
    val med = e.groupBy("event_type").agg(expr("percentile(vc, 0.5)").as("med"))
    val d = e.join(broadcast(med), "event_type").withColumn("dev", abs($"vc" - $"med"))
    val mad = d.groupBy("event_type").agg(expr("percentile(dev, 0.5)").as("mad"))
    val o = d.join(broadcast(mad), "event_type").groupBy("event_type").agg(
      count(lit(1)).as("n_events"),
      sum(when($"dev" > lit(3) * $"mad", 1L).otherwise(0L)).as("n_outliers"))
    o.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .select($"event_type", $"n_events",
        ($"med" / 100.0).as("median_value"), ($"mad" / 100.0).as("mad_value"),
        $"n_outliers",
        ($"n_outliers".cast("double") / $"n_events").as("outlier_frac"))
      .orderBy("event_type")
  }

  private val qMadOutliersSql =
    """WITH e AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events),
      |m AS (SELECT event_type, quantile_cont(vc, 0.5) AS med FROM e GROUP BY 1),
      |d AS (SELECT e.event_type, vc, ABS(vc - med) AS dev FROM e JOIN m USING (event_type)),
      |s AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1),
      |o AS (SELECT d.event_type, COUNT(*) AS n,
      |    SUM(CASE WHEN dev > 3*mad THEN 1 ELSE 0 END) AS n_out
      |    FROM d JOIN s USING (event_type) GROUP BY 1)
      |SELECT o.event_type AS event_type, CAST(n AS BIGINT) AS n_events,
      |  med/100.0 AS median_value, mad/100.0 AS mad_value,
      |  CAST(n_out AS BIGINT) AS n_outliers,
      |  CAST(n_out AS DOUBLE)/n AS outlier_frac
      |FROM o JOIN m USING (event_type) JOIN s USING (event_type)
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------- corpus_dsir

  /** DSIR-style importance resampling (Data Selection via Importance
    * Resampling): score every document by how much its hashed-unigram
    * distribution looks like the target domain (here: the English
    * slice), then keep the top quartile by score.
    *
    * wm(b) = round(1e6 · ln( ((t_b+1)/(T+B)) / ((c_b+1)/(C+B)) )) —
    * add-1-smoothed log importance ratio per hash bucket, micro-
    * quantized so doc scores are EXACT integer sums. B is fixed at
    * 1024, so the weight table broadcasts by construction at any
    * corpus size (unlike corpus-derived join sides). Selection uses a
    * percentile threshold, not a global sort — one aggregate instead
    * of a single-partition row_number at 100 TB. */
  private def corpusDsir(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // Per-(doc, bucket) token counts come from ONE native text walk
    // (Fns.dsir_buckets: tokenize + md5-bucket + count inside codegen,
    // sparse output) — no per-token row explosion, no first-level hash
    // aggregate; the stream is bounded by min(tokens, 1024) rows per
    // doc. Materialized because both the bucket totals and the scoring
    // join read it; at cluster scale the same table would be
    // persisted/checkpointed to executor-local storage.
    val dt = docs
      .select($"doc_id", ($"lang" === "en").cast("long").as("is_t"),
        explode(graft.functions.Fns.dsir_buckets($"text", 1024)).as("bc"))
      .select($"doc_id", $"is_t", $"bc.b".as("b"), $"bc.c".as("c"))
      .localCheckpoint()
    val bk = dt.groupBy("b").agg(sum($"c").as("cb"), sum($"is_t" * $"c").as("tb"))
    val tot = bk.agg(sum($"cb").as("ct"), sum($"tb").as("tt"))
    val w = bk.crossJoin(broadcast(tot)).select($"b",
      round(log((($"tb" + 1.0) / ($"tt" + 1024.0)) / (($"cb" + 1.0) / ($"ct" + 1024.0))) * 1e6)
        .cast("long").as("wm"))
    val sc = dt.join(broadcast(w), "b").groupBy("doc_id")
      .agg(sum($"wm" * $"c").as("score_micro"))
    val s2 = docs.select($"doc_id").join(sc, Seq("doc_id"), "left")
      .withColumn("score_micro", coalesce($"score_micro", lit(0L)))
    val thr = s2.agg(expr("percentile(score_micro, 0.75)").as("thr"))
    s2.crossJoin(broadcast(thr))
      .select($"doc_id", round($"score_micro" / 1e6, 6).as("score"),
        ($"score_micro" > $"thr").as("selected"))
      .orderBy("doc_id")
  }

  private val corpusDsirSql =
    """WITH t0 AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
      |toks AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
      |    CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % 1024 AS b
      |    FROM t0 WHERE length(w) > 0),
      |bk AS (SELECT b, COUNT(*) AS cb, SUM(is_t) AS tb FROM toks GROUP BY 1),
      |tot AS (SELECT SUM(cb) AS ct, SUM(tb) AS tt FROM bk),
      |w AS (SELECT b,
      |    CAST(ROUND(LN(((tb + 1.0)/(tt + 1024.0))/((cb + 1.0)/(ct + 1024.0)))*1e6) AS BIGINT) AS wm
      |    FROM bk CROSS JOIN tot),
      |sc AS (SELECT doc_id, SUM(wm) AS score_micro FROM toks JOIN w USING (b) GROUP BY 1),
      |s2 AS (SELECT d.doc_id, COALESCE(score_micro, 0) AS score_micro
      |    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
      |thr AS (SELECT quantile_cont(score_micro, 0.75) AS thr FROM s2)
      |SELECT doc_id, ROUND(score_micro/1e6, 6) AS score, score_micro > thr AS selected
      |FROM s2 CROSS JOIN thr ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ q_equidepth

  /** Exact equi-depth (equal-count) histogram of extendedprice: decile
    * edges from ONE exact-percentile aggregate, then a map-side bucket
    * classification against the broadcast 9-edge array — no ntile, no
    * global sort (the classic equi-depth formulation needs a full sort;
    * this is two scans and a 1-row broadcast). Cents grid keeps the
    * interpolated edges on exact binary fractions in both engines. */
  private def qEquidepth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.lineitem(s, dir)
      .select(round($"l_extendedprice" * 100).cast("long").as("v"))
    val ed = e.agg(
      expr("percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("edges"))
    e.crossJoin(broadcast(ed))
      .withColumn("bucket",
        expr("aggregate(edges, 0, (acc, x) -> acc + IF(v > round(x, 6), 1, 0))").cast("long"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_rows"),
        (min($"v") / 100.0).as("min_value"),
        (max($"v") / 100.0).as("max_value"))
      .orderBy("bucket")
  }

  private val qEquidepthSql =
    """WITH e AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v FROM lineitem),
      |ed AS (SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges FROM e),
      |b AS (SELECT v, CAST(len(list_filter(edges, x -> v > ROUND(x, 6))) AS BIGINT) AS bucket
      |    FROM e CROSS JOIN ed)
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(v)/100.0 AS min_value, MAX(v)/100.0 AS max_value
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------- corpus_weighted_sample

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-ES): per-doc uniform u derived from a 60-bit md5 hash
    * of the doc id, rank key ln(u)/w (monotone in u^(1/w)), keep docs
    * above the 0.8 key quantile — longer documents (w = n_chars) are
    * proportionally likelier to survive, yet the sample is exactly
    * reproducible on both engines. Keys are micro-quantized AFTER the
    * single per-row ln, and selection is a percentile threshold, not a
    * global top-k sort. */
  private def corpusWeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .filter($"n_chars" > 0) // ln(u)/0 would be -Inf -> ANSI cast error
      .select($"doc_id", $"n_chars",
        ((hash60($"doc_id".cast("string")) + 1).cast("double") /
          lit(math.pow(2, 60))).as("u"))
    val k = d.withColumn("key_micro",
      round(log($"u") / $"n_chars".cast("double") * 1e6).cast("long"))
    val thr = k.agg(expr("percentile(key_micro, 0.8)").as("thr"))
    k.crossJoin(broadcast(thr))
      .select($"doc_id", $"n_chars", $"key_micro", ($"key_micro" > $"thr").as("sampled"))
      .orderBy("doc_id")
  }

  private val corpusWeightedSampleSql =
    """WITH d AS (SELECT doc_id, n_chars,
      |    CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1 AS DOUBLE)
      |      / 1152921504606846976 AS u
      |    FROM documents WHERE n_chars > 0),
      |k AS (SELECT doc_id, n_chars,
      |    CAST(ROUND(LN(u) / CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS key_micro FROM d),
      |t AS (SELECT quantile_cont(key_micro, 0.8) AS thr FROM k)
      |SELECT doc_id, n_chars, key_micro, key_micro > thr AS sampled
      |FROM k CROSS JOIN t ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- text_bpe_pairs

  /** Tokenizer induction, step one of BPE: corpus-frequency of every
    * adjacent character pair inside words (the argmax is the first BPE
    * merge). Map-only explode → one count shuffle on 2-char keys →
    * TakeOrdered top-50 (per-partition heads, no global sort). */
  private def textBpePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w)-1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"pair").limit(50)
  }

  private val textBpePairsSql =
    """WITH w AS (SELECT w FROM
      |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      |    WHERE length(w) >= 2),
      |i AS (SELECT w, unnest(generate_series(1, length(w)-1)) AS i FROM w),
      |p AS (SELECT substring(w, i, 2) AS pair FROM i)
      |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY pair
      |ORDER BY n DESC, pair LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q_kanon

  /** k-anonymity audit (k=5) over the quasi-identifier tuple
    * (event_type, hour-of-day, user bucket): per event type, how many
    * QI groups are small enough to identify members and how many rows
    * a suppression pass would drop. Two aggregations, keys only —
    * the standard privacy gate before exporting behavioral data. */
  private def qKanon(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = Tables.events(s, dir)
      .groupBy($"event_type", hour($"ts").as("hod"), ($"user_id" % 50).as("ub"))
      .agg(count(lit(1)).as("c"))
    g.groupBy("event_type").agg(
        count(lit(1)).as("n_groups"),
        sum(when($"c" < 5, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when($"c" < 5, $"c").otherwise(0L)).as("n_suppressed"),
        sum($"c").as("n_rows"))
      .select($"event_type", $"n_groups", $"n_small_groups", $"n_suppressed", $"n_rows",
        ($"n_suppressed".cast("double") / $"n_rows").as("suppressed_frac"))
      .orderBy("event_type")
  }

  private val qKanonSql =
    """WITH g AS (SELECT event_type, hour(ts) AS hod, user_id % 50 AS ub, COUNT(*) AS c
      |    FROM events GROUP BY 1, 2, 3),
      |a AS (SELECT event_type, COUNT(*) AS n_groups,
      |    SUM(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS n_small_groups,
      |    SUM(CASE WHEN c < 5 THEN c ELSE 0 END) AS n_suppressed,
      |    SUM(c) AS n_rows FROM g GROUP BY 1)
      |SELECT event_type, CAST(n_groups AS BIGINT) AS n_groups,
      |  CAST(n_small_groups AS BIGINT) AS n_small_groups,
      |  CAST(n_suppressed AS BIGINT) AS n_suppressed, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(n_suppressed AS DOUBLE)/n_rows AS suppressed_frac
      |FROM a ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------ q_basket_lift

  /** Market-basket association rules over co-purchased parts: support,
    * confidence and lift for part pairs appearing in the same order.
    * No order sampling needed (unlike q_triangles' 3-way join): the
    * pair explosion is C(k,2) per basket — bounded by basket width,
    * linear in orders. All metrics are single double divisions of
    * exact integer counts; the pair join is the standard key-sorted
    * self-join (pa < pb), one shuffle on the order key. */
  private def qBasketLift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val tot = li.select($"l_orderkey").distinct().agg(count(lit(1)).as("n"))
    val item = li.groupBy($"l_partkey").agg(count(lit(1)).as("ni"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("nab"))
      .filter($"nab" >= 3)
    pairs
      .join(item.select($"l_partkey".as("pa"), $"ni".as("na")), "pa")
      .join(item.select($"l_partkey".as("pb"), $"ni".as("nb")), "pb")
      .crossJoin(broadcast(tot))
      .select($"pa", $"pb", $"nab",
        ($"nab".cast("double") / $"n").as("support"),
        ($"nab".cast("double") / $"na").as("confidence"),
        (($"nab" * $"n").cast("double") / ($"na" * $"nb")).as("lift"))
      .orderBy($"lift".desc, $"pa", $"pb").limit(20)
  }

  private val qBasketLiftSql =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM li),
      |item AS (SELECT l_partkey, COUNT(*) AS ni FROM li GROUP BY 1),
      |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS nab
      |    FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |    GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |SELECT pa, pb, CAST(nab AS BIGINT) AS nab,
      |  CAST(nab AS DOUBLE)/n AS support,
      |  CAST(nab AS DOUBLE)/na.ni AS confidence,
      |  CAST(nab*n AS DOUBLE)/(na.ni*nb.ni) AS lift
      |FROM pairs
      |JOIN item na ON na.l_partkey = pa
      |JOIN item nb ON nb.l_partkey = pb
      |CROSS JOIN tot
      |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q_markov

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next event type | current), from lag-1 windows
    * ordered by (ts, event_id) — the deterministic total order both
    * engines share. Counts are exact; probabilities are single double
    * divisions. One window shuffle on user_id, one count shuffle on
    * the 25-cell transition key. */
  private def qMarkov(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables.events(s, dir)
      .withColumn("prev", lag($"event_type", 1).over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .filter($"prev".isNotNull)
      .groupBy($"prev".as("from_type"), $"event_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = t.groupBy("from_type").agg(sum($"n").as("nf"))
    t.join(broadcast(tot), "from_type")
      .select($"from_type", $"to_type", $"n",
        ($"n".cast("double") / $"nf").as("p"))
      .orderBy("from_type", "to_type")
  }

  private val qMarkovSql =
    """WITH s AS (SELECT user_id, event_type, ts, event_id,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |    FROM events),
      |t AS (SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
      |    FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
      |f AS (SELECT from_type, SUM(n) AS nf FROM t GROUP BY 1)
      |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
      |  CAST(n AS DOUBLE)/nf AS p
      |FROM t JOIN f USING (from_type) ORDER BY from_type, to_type""".stripMargin

  // ------------------------------------------------------------- q_autocorr

  /** Lag-k autocorrelation (k = 1..7) of the daily revenue series —
    * order seasonality detection. Daily totals are exact integer
    * cents; per-lag Pearson runs on exact DECIMAL(38,0) co-moments
    * (the q_corr machinery), so the correlogram is deterministic at
    * any parallelism. The series table is day-keyed (tiny); the lag
    * join is a self-join on day arithmetic. */
  private def qAutocorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = DecimalType(38, 0)
    val rev = Tables.orders(s, dir)
      .groupBy(floor(unix_timestamp($"o_orderdate").cast("double") / 86400)
        .cast("long").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("v"))
      .localCheckpoint()
    val ks = s.range(1, 8).select($"id".as("k"))
    val lagged = rev.as("a")
      .crossJoin(broadcast(ks))
      .join(rev.as("b"), col("b.day") === col("a.day") - col("k"))
      .select($"k", col("a.v").as("x"), col("b.v").as("y"))
    // products in DECIMAL (not long*long): daily-total cents squared
    // would overflow int64 somewhere past sf1
    val m = lagged.groupBy("k").agg(
      count(lit(1)).cast("double").as("n"),
      sum($"x".cast(d38)).cast("double").as("sx"),
      sum($"y".cast(d38)).cast("double").as("sy"),
      sum($"x".cast(d38) * $"x".cast(d38)).cast("double").as("sxx"),
      sum($"y".cast(d38) * $"y".cast(d38)).cast("double").as("syy"),
      sum($"x".cast(d38) * $"y".cast(d38)).cast("double").as("sxy"))
    m.select($"k".cast("long").as("lag_days"), $"n".cast("long").as("n_pairs"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")), 9)
          .as("autocorr"))
      .orderBy("lag_days")
  }

  private val qAutocorrSql =
    """WITH rev AS (SELECT CAST(FLOOR(CAST(epoch(o_orderdate) AS DOUBLE)/86400) AS BIGINT) AS day,
      |    SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS v
      |    FROM orders GROUP BY 1),
      |lg AS (SELECT k, a.v AS x, b.v AS y
      |    FROM rev a CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS k) ks
      |    JOIN rev b ON b.day = a.day - k),
      |m AS (SELECT k, CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x AS HUGEINT)*x) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(y AS HUGEINT)*y) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(x AS HUGEINT)*y) AS DOUBLE) AS sxy FROM lg GROUP BY 1)
      |SELECT CAST(k AS BIGINT) AS lag_days, CAST(n AS BIGINT) AS n_pairs,
      |  ROUND((n*sxy - sx*sy)/SQRT((n*sxx - sx*sx)*(n*syy - sy*sy)), 9) AS autocorr
      |FROM m ORDER BY lag_days""".stripMargin

  // ------------------------------------------------------------ q_skew_audit

  /** Join-key skew diagnostics for lineitem.partkey — the audit a
    * 100 TB job reads before picking salt counts / AQE settings.
    * HHI (key concentration) is Σc²/N² — an exact integer sum and ONE
    * division, no per-key double accumulation; top-10 share uses
    * TakeOrdered over the counts table (never the data). Single-row
    * output: rows, keys, max key, skew ratio (max/avg), HHI, top-10
    * share. */
  private def qSkewAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = DecimalType(38, 0)
    val c = Tables.lineitem(s, dir).groupBy($"l_partkey").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val top = c.orderBy($"c".desc, $"l_partkey").limit(10).agg(sum($"c").as("t10"))
    c.agg(sum($"c").as("n"), count(lit(1)).as("k"), max($"c").as("mx"),
        sum(($"c" * $"c").cast(d38)).cast("double").as("sc2"))
      .crossJoin(broadcast(top))
      .select($"n", $"k", $"mx",
        (($"mx" * $"k").cast("double") / $"n").as("skew_ratio"),
        ($"sc2" / ($"n" * $"n").cast("double")).as("hhi"),
        ($"t10".cast("double") / $"n").as("top10_share"))
      .orderBy($"n")
  }

  private val qSkewAuditSql =
    """WITH c AS (SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
      |t AS (SELECT SUM(c) AS t10 FROM
      |    (SELECT c FROM c ORDER BY c DESC, l_partkey LIMIT 10) x),
      |a AS (SELECT SUM(c) AS n, COUNT(*) AS k, MAX(c) AS mx, SUM(c*c) AS sc2 FROM c)
      |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k, CAST(mx AS BIGINT) AS mx,
      |  CAST(mx*k AS DOUBLE)/n AS skew_ratio,
      |  CAST(sc2 AS DOUBLE)/CAST(n*n AS DOUBLE) AS hhi,
      |  CAST(t10 AS DOUBLE)/n AS top10_share
      |FROM a CROSS JOIN t ORDER BY n""".stripMargin

  // -------------------------------------------------------- corpus_interleave

  /** Deterministic training-order interleave: shuffle WITHIN each
    * source by a hash key, then place source s's i-th doc at global
    * position i·S + rank(s) — a strict round-robin over sources with
    * no global sort (each window partitions by source; the position is
    * arithmetic). The property a trainer wants: any prefix of the
    * order has near-proportional source representation. */
  private def corpusInterleave(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val srcs = docs.select($"source").distinct()
      .withColumn("srank",
        row_number().over(Window.orderBy($"source")).cast("long") - 1)
    val nSrc = srcs.agg(count(lit(1)).as("ns"))
    docs.select($"doc_id", $"source",
        hash60(concat(lit("il:"), $"doc_id".cast("string"))).as("h"))
      .withColumn("i",
        row_number().over(Window.partitionBy($"source").orderBy($"h", $"doc_id"))
          .cast("long") - 1)
      .join(broadcast(srcs), "source")
      .crossJoin(broadcast(nSrc))
      .select($"doc_id", $"source", ($"i" * $"ns" + $"srank").as("position"))
      .orderBy("position")
  }

  private val corpusInterleaveSql =
    """WITH srcs AS (SELECT source,
      |    ROW_NUMBER() OVER (ORDER BY source) - 1 AS srank
      |    FROM (SELECT DISTINCT source FROM documents) t),
      |ns AS (SELECT COUNT(*) AS ns FROM srcs),
      |d AS (SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
      |      CAST('0x' || substring(md5('il:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
      |      doc_id) - 1 AS i
      |    FROM documents)
      |SELECT doc_id, d.source AS source, CAST(i * ns + srank AS BIGINT) AS position
      |FROM d JOIN srcs ON d.source = srcs.source CROSS JOIN ns
      |ORDER BY position""".stripMargin

  // ------------------------------------------------------- text_vocab_growth

  /** Vocabulary statistics per source: total tokens, distinct types,
    * type-token ratio, and hapax share (words seen once) — the Heaps'-
    * law corpus diagnostics. One token explode, two key-only
    * aggregations. */
  private def textVocabGrowth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Tables.documents(s, dir)
      .select($"source", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
    w.groupBy($"source").agg(
        sum($"c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select($"source", $"n_tokens", $"n_types",
        ($"n_types".cast("double") / $"n_tokens").as("ttr"),
        ($"n_hapax".cast("double") / $"n_types").as("hapax_share"))
      .orderBy("source")
  }

  private val textVocabGrowthSql =
    """WITH w AS (SELECT source, w, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) t
      |    WHERE length(w) > 0 GROUP BY 1, 2)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_types,
      |  CAST(COUNT(*) AS DOUBLE)/SUM(c) AS ttr,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS hapax_share
      |FROM w GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q_cusum

  /** CUSUM change-point detection over the hourly revenue series per
    * event type — ALL-INTEGER: the classic C_i = Σ_{j<=i}(x_j - mean)
    * is scaled by n (C_i·n = n·Σx_j - i·S), removing the division, so
    * the argmax hour is exact cross-engine with no float anywhere
    * until the final report columns. One windowed running sum
    * partitioned per event type (never a global window). */
  private def qCusum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, dir)
      .groupBy($"event_type",
        (floor(unix_millis($"ts").cast("double") / 3600000)).cast("long").as("hr"))
      .agg(sum(round($"value" * 100).cast("long")).as("x"))
    val w = Window.partitionBy($"event_type").orderBy($"hr")
    val tot = hourly.groupBy("event_type")
      .agg(sum($"x").as("stot"), count(lit(1)).as("n"))
    val c = hourly.join(broadcast(tot), "event_type")
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("run", sum($"x").over(w))
      .withColumn("cn", $"n" * $"run" - $"i" * $"stot") // CUSUM * n, exact
    c.withColumn("rk", row_number().over(Window.partitionBy($"event_type")
        .orderBy(abs($"cn").desc, $"hr")))
      .filter($"rk" === 1)
      .select($"event_type", $"hr".as("peak_hr"),
        ($"cn".cast("double") / $"n" / 100.0).as("peak_cusum"),
        $"n".as("n_hours"))
      .orderBy("event_type")
  }

  private val qCusumSql =
    """WITH h AS (SELECT event_type,
      |    CAST(FLOOR(CAST(epoch_ns(ts)//1000000 AS DOUBLE)/3600000) AS BIGINT) AS hr,
      |    SUM(CAST(ROUND(value*100) AS BIGINT)) AS x
      |    FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, SUM(x) AS stot, COUNT(*) AS n FROM h GROUP BY 1),
      |c AS (SELECT h.event_type, hr, n,
      |    n * SUM(x) OVER (PARTITION BY h.event_type ORDER BY hr)
      |      - ROW_NUMBER() OVER (PARTITION BY h.event_type ORDER BY hr) * stot AS cn
      |    FROM h JOIN t ON h.event_type = t.event_type),
      |r AS (SELECT event_type, hr, cn, n,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ABS(cn) DESC, hr) AS rk
      |    FROM c)
      |SELECT event_type, hr AS peak_hr,
      |  CAST(cn AS DOUBLE)/n/100.0 AS peak_cusum, CAST(n AS BIGINT) AS n_hours
      |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------ q_rfm

  /** RFM (recency/frequency/monetary) customer segmentation WITHOUT
    * ntile: quintile edges come from one exact-percentile aggregate
    * and each customer classifies against the broadcast 4-edge arrays
    * (same no-global-sort idiom as q_equidepth). Scores are 1..5;
    * monetary/recency tie handling is deterministic because edges are
    * exact binary-grid doubles on both engines. */
  private def qRfm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val cust = o.groupBy($"o_custkey").agg(
      max(floor(unix_timestamp($"o_orderdate").cast("double") / 86400).cast("long")).as("rday"),
      count(lit(1)).as("f"),
      sum(round($"o_totalprice" * 100).cast("long")).as("m"))
    val edges = cust.agg(
      expr("percentile(rday, array(0.2,0.4,0.6,0.8))").as("re"),
      expr("percentile(f, array(0.2,0.4,0.6,0.8))").as("fe"),
      expr("percentile(m, array(0.2,0.4,0.6,0.8))").as("me"))
    def score(v: String, e: String) =
      expr(s"aggregate($e, 1, (acc, x) -> acc + IF($v > round(x, 6), 1, 0))").cast("long")
    cust.crossJoin(broadcast(edges))
      .select($"o_custkey",
        score("rday", "re").as("r_score"),
        score("f", "fe").as("f_score"),
        score("m", "me").as("m_score"))
      .withColumn("segment",
        when($"r_score" >= 4 && $"f_score" >= 4 && $"m_score" >= 4, "champion")
          .when($"r_score" <= 2 && $"f_score" >= 4, "at_risk_loyal")
          .when($"r_score" >= 4 && $"f_score" <= 2, "new")
          .otherwise("regular"))
      .orderBy("o_custkey")
  }

  private val qRfmSql =
    """WITH cust AS (SELECT o_custkey,
      |    MAX(CAST(FLOOR(CAST(epoch(o_orderdate) AS DOUBLE)/86400) AS BIGINT)) AS rday,
      |    COUNT(*) AS f,
      |    SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS m
      |    FROM orders GROUP BY 1),
      |e AS (SELECT quantile_cont(rday, [0.2,0.4,0.6,0.8]) AS re,
      |    quantile_cont(f, [0.2,0.4,0.6,0.8]) AS fe,
      |    quantile_cont(m, [0.2,0.4,0.6,0.8]) AS me FROM cust),
      |sc AS (SELECT o_custkey,
      |    1 + len(list_filter(re, x -> rday > ROUND(x, 6))) AS r_score,
      |    1 + len(list_filter(fe, x -> f > ROUND(x, 6))) AS f_score,
      |    1 + len(list_filter(me, x -> m > ROUND(x, 6))) AS m_score
      |    FROM cust CROSS JOIN e)
      |SELECT o_custkey, CAST(r_score AS BIGINT) AS r_score,
      |  CAST(f_score AS BIGINT) AS f_score, CAST(m_score AS BIGINT) AS m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
      |    WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
      |    WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
      |    ELSE 'regular' END AS segment
      |FROM sc ORDER BY o_custkey""".stripMargin

  // --------------------------------------------------------------- q_pareto

  /** Revenue concentration (the 80/20 audit): what share of total
    * revenue comes from customers above the 90th revenue percentile.
    * Exact cents + one percentile threshold — no customer-level sort,
    * single-row output. */
  private def qPareto(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.orders(s, dir).groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("m"))
    val thr = cust.agg(expr("percentile(m, 0.9)").as("thr"))
    cust.crossJoin(broadcast(thr))
      .agg(count(lit(1)).as("n_customers"),
        sum(when($"m" > $"thr", 1L).otherwise(0L)).as("n_top"),
        sum($"m").as("total_cents"),
        sum(when($"m" > $"thr", $"m").otherwise(0L)).as("top_cents"))
      .select($"n_customers", $"n_top",
        ($"total_cents" / 100.0).as("total_revenue"),
        ($"top_cents".cast("double") / $"total_cents").as("top_decile_share"))
      .orderBy("n_customers")
  }

  private val qParetoSql =
    """WITH cust AS (SELECT o_custkey, SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS m
      |    FROM orders GROUP BY 1),
      |t AS (SELECT quantile_cont(m, 0.9) AS thr FROM cust)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(CASE WHEN m > thr THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
      |  SUM(m)/100.0 AS total_revenue,
      |  CAST(SUM(CASE WHEN m > thr THEN m ELSE 0 END) AS DOUBLE)/SUM(m) AS top_decile_share
      |FROM cust CROSS JOIN t ORDER BY n_customers""".stripMargin

  // ------------------------------------------------------------ q_degree_dist

  /** Degree distribution of the co-purchase part graph — the
    * structural audit before any graph algorithm (pagerank, CC,
    * triangles all scale with the degree tail). Per-order pair
    * explosion is C(k,2)-bounded; two key-only aggregations after. */
  private def qDegreeDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // aliasing defeats Catalyst's exchange reuse: checkpoint so the
    // scan+distinct computes once for both join sides
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey").distinct().localCheckpoint()
    val deg = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("p"), col("b.l_partkey").as("q"))
      .distinct()
      .groupBy($"p").agg(count(lit(1)).as("degree"))
    deg.groupBy($"degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")
  }

  private val qDegreeDistSql =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |deg AS (SELECT p, COUNT(*) AS degree FROM (
      |    SELECT DISTINCT a.l_partkey AS p, b.l_partkey AS q
      |    FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey) e
      |    GROUP BY 1)
      |SELECT CAST(degree AS BIGINT) AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
      |FROM deg GROUP BY degree ORDER BY degree""".stripMargin

  // -------------------------------------------------------- q_time_to_convert

  /** View→purchase conversion-delay distribution per user: each
    * purchase pairs with the user's latest prior view (as-of
    * semantics via one lag-style window over the merged stream), then
    * exact delay percentiles on the shared ms grid. The product
    * funnel-latency metric. */
  private def qTimeToConvert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter($"event_type".isin("view", "purchase"))
      .select($"user_id", $"event_type", unix_millis($"ts").as("ms"), $"event_id")
    val w = Window.partitionBy($"user_id")
      .orderBy($"ms", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val delays = ev
      .withColumn("last_view_ms",
        last(when($"event_type" === "view", $"ms"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase" && $"last_view_ms".isNotNull)
      .select(($"ms" - $"last_view_ms").as("delay_ms"))
    // percentiles over INTEGER ms (exact interpolation grid); minutes
    // only at the report edge
    delays.agg(
        count(lit(1)).as("n_conversions"),
        round(expr("percentile(delay_ms, 0.5)") / 60000.0, 6).as("p50_min"),
        round(expr("percentile(delay_ms, 0.9)") / 60000.0, 6).as("p90_min"))
      .orderBy("n_conversions")
  }

  private val qTimeToConvertSql =
    """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts)//1000000 AS ms, event_id
      |    FROM events WHERE event_type IN ('view', 'purchase')),
      |d AS (SELECT ms - MAX(CASE WHEN event_type = 'view' THEN ms END)
      |      OVER (PARTITION BY user_id ORDER BY ms, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS delay_ms,
      |    event_type
      |    FROM ev)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
      |  ROUND(quantile_cont(delay_ms, 0.5) / 60000.0, 6) AS p50_min,
      |  ROUND(quantile_cont(delay_ms, 0.9) / 60000.0, 6) AS p90_min
      |FROM d WHERE event_type = 'purchase' AND delay_ms IS NOT NULL
      |ORDER BY n_conversions""".stripMargin

  // --------------------------------------------------------------- text_zipf

  /** Zipf's-law fit over the top-100 word frequencies: regress
    * ln(freq) on ln(rank) and report the slope (a natural corpus is
    * near −1) plus r². Ranks come from a TakeOrdered top-100 — the
    * only window runs over those 100 rows. ln values are nano-
    * quantized per row and the regression runs on exact DECIMAL
    * co-moments (the q_corr machinery), so the fit is bit-stable
    * cross-engine. */
  private def textZipf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = DecimalType(38, 0)
    val top = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"w").limit(100)
    val xy = top
      .withColumn("rk", row_number().over(Window.orderBy($"c".desc, $"w")).cast("long"))
      .select(
        round(log($"rk".cast("double")) * 1e9).cast("long").as("x"),
        round(log($"c".cast("double")) * 1e9).cast("long").as("y"))
    val m = xy.agg(
      count(lit(1)).cast("double").as("n"),
      sum($"x".cast(d38)).cast("double").as("sx"),
      sum($"y".cast(d38)).cast("double").as("sy"),
      sum($"x".cast(d38) * $"x".cast(d38)).cast("double").as("sxx"),
      sum($"y".cast(d38) * $"y".cast(d38)).cast("double").as("syy"),
      sum($"x".cast(d38) * $"y".cast(d38)).cast("double").as("sxy"))
    m.select($"n".cast("long").as("n_words"),
        round(($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx"), 6)
          .as("zipf_slope"),
        round(($"n" * $"sxy" - $"sx" * $"sy") * ($"n" * $"sxy" - $"sx" * $"sy") /
          (($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")), 6)
          .as("zipf_r2"))
      .orderBy("n_words")
  }

  private val textZipfSql =
    """WITH w AS (SELECT w, COUNT(*) AS c FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      |    WHERE length(w) > 0 GROUP BY w ORDER BY c DESC, w LIMIT 100),
      |r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk FROM w),
      |xy AS (SELECT CAST(ROUND(LN(CAST(rk AS DOUBLE))*1e9) AS BIGINT) AS x,
      |    CAST(ROUND(LN(CAST(c AS DOUBLE))*1e9) AS BIGINT) AS y FROM r),
      |m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x AS HUGEINT)*x) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(y AS HUGEINT)*y) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(x AS HUGEINT)*y) AS DOUBLE) AS sxy FROM xy)
      |SELECT CAST(n AS BIGINT) AS n_words,
      |  ROUND((n*sxy - sx*sy)/(n*sxx - sx*sx), 6) AS zipf_slope,
      |  ROUND((n*sxy - sx*sy)*(n*sxy - sx*sy)/((n*sxx - sx*sx)*(n*syy - sy*sy)), 6) AS zipf_r2
      |FROM m ORDER BY n_words""".stripMargin

  // --------------------------------------------------------------- q_ab_test

  /** Two-proportion A/B comparison (deterministic arms via
    * user_id % 2): per-arm heavy-purchaser rates (>= 14 purchases —
    * every user on this dense corpus purchases at least once, so the
    * raw any-purchase rate is degenerately 1.0), lift, and the pooled
    * two-proportion z statistic. Rates and z are single double
    * expressions over exact integer counts; the z denominator is
    * NULLIF-guarded so a degenerate pooled rate reads as NULL, not a
    * crash. */
  private def qAbTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val u = Tables.events(s, dir).groupBy($"user_id")
      .agg(when(sum(when($"event_type" === "purchase", 1L).otherwise(0L)) >= 14, 1L)
        .otherwise(0L).as("conv"))
      .select(($"user_id" % 2).as("arm"), $"conv")
    val a = u.groupBy($"arm").agg(count(lit(1)).as("n"), sum($"conv").as("c"))
    val wide = a.agg(
      sum(when($"arm" === 0, $"n")).as("n0"), sum(when($"arm" === 0, $"c")).as("c0"),
      sum(when($"arm" === 1, $"n")).as("n1"), sum(when($"arm" === 1, $"c")).as("c1"))
    wide.select(
        $"n0".as("n_control"), $"c0".as("conv_control"),
        $"n1".as("n_treat"), $"c1".as("conv_treat"),
        (expr("(c0 * 1000000000L) div n0").cast("double") / 1e9).as("p_control"),
        (expr("(c1 * 1000000000L) div n1").cast("double") / 1e9).as("p_treat"),
        round(($"c1".cast("double") / $"n1" - $"c0".cast("double") / $"n0") /
          expr("""nullif(sqrt((cast(c0 + c1 as double) / (n0 + n1)) *
            (1d - cast(c0 + c1 as double) / (n0 + n1)) *
            (1d / n0 + 1d / n1)), 0d)"""), 6).as("z_score"))
      .orderBy("n_control")
  }

  private val qAbTestSql =
    """WITH u AS (SELECT user_id % 2 AS arm,
      |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
      |      THEN 1 ELSE 0 END AS conv
      |    FROM events GROUP BY user_id),
      |a AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS c FROM u GROUP BY 1),
      |w AS (SELECT SUM(CASE WHEN arm = 0 THEN n END) AS n0,
      |    SUM(CASE WHEN arm = 0 THEN c END) AS c0,
      |    SUM(CASE WHEN arm = 1 THEN n END) AS n1,
      |    SUM(CASE WHEN arm = 1 THEN c END) AS c1 FROM a)
      |SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
      |  CAST(n1 AS BIGINT) AS n_treat, CAST(c1 AS BIGINT) AS conv_treat,
      |  CAST((c0 * 1000000000) // n0 AS DOUBLE)/1e9 AS p_control,
      |  CAST((c1 * 1000000000) // n1 AS DOUBLE)/1e9 AS p_treat,
      |  ROUND((CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0) /
      |    NULLIF(SQRT((CAST(c0 + c1 AS DOUBLE)/(n0 + n1)) *
      |      (1e0 - CAST(c0 + c1 AS DOUBLE)/(n0 + n1)) *
      |      (1e0/n0 + 1e0/n1)), 0e0), 6) AS z_score
      |FROM w ORDER BY n_control""".stripMargin

  // ---------------------------------------------------------------- q_benford

  /** Benford's-law audit of order totals: observed leading-digit
    * distribution vs log10(1+1/d), with the chi-square statistic —
    * the classic fabricated-numbers screen. The leading digit comes
    * from the exact cents integer's decimal string (no float
    * formatting); expected probabilities are nano-quantized scalars,
    * so chi-square is one double expression over exact counts. */
  private def qBenford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.orders(s, dir)
      .select(round($"o_totalprice" * 100).cast("long").as("cents"))
      .filter($"cents" > 0) // Benford is defined on positive magnitudes
      .select(substring($"cents".cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("obs"))
    val tot = d.agg(sum($"obs").as("n"))
    d.crossJoin(broadcast(tot))
      .withColumn("p_nano",
        round(log10(lit(1.0) + lit(1.0) / $"digit") * 1e9).cast("long"))
      .select($"digit", $"obs",
        round($"p_nano".cast("double") / 1e9, 9).as("p_benford"),
        ((expr("(obs * 1000000000L) div n").cast("double") -
          $"p_nano".cast("double")) / 1e9).as("deviation"),
        round(($"obs".cast("double") - $"n" * ($"p_nano".cast("double") / 1e9)) *
          ($"obs".cast("double") - $"n" * ($"p_nano".cast("double") / 1e9)) /
          ($"n" * ($"p_nano".cast("double") / 1e9)), 6).as("chi2_term"))
      .orderBy("digit")
  }

  private val qBenfordSql =
    """WITH p AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
      |    FROM orders),
      |d AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |    COUNT(*) AS obs FROM p WHERE cents > 0 GROUP BY 1),
      |t AS (SELECT SUM(obs) AS n FROM d),
      |q AS (SELECT digit, obs, n,
      |    CAST(ROUND(LOG10(1e0 + 1e0/digit)*1e9) AS BIGINT) AS p_nano
      |    FROM d CROSS JOIN t)
      |SELECT digit, CAST(obs AS BIGINT) AS obs,
      |  ROUND(CAST(p_nano AS DOUBLE)/1e9, 9) AS p_benford,
      |  (CAST((obs * 1000000000) // n AS DOUBLE) - CAST(p_nano AS DOUBLE))/1e9 AS deviation,
      |  ROUND((CAST(obs AS DOUBLE) - n * (CAST(p_nano AS DOUBLE)/1e9)) *
      |    (CAST(obs AS DOUBLE) - n * (CAST(p_nano AS DOUBLE)/1e9)) /
      |    (n * (CAST(p_nano AS DOUBLE)/1e9)), 6) AS chi2_term
      |FROM q ORDER BY digit""".stripMargin

  // ---------------------------------------------------------------- q_heatmap

  /** Day-of-week × hour-of-day activity matrix — the ops dashboard
    * heatmap. Day-of-week is pure integer epoch math ((days+4) % 7,
    * Sunday=0; 1970-01-01 was a Thursday) so neither engine's
    * calendar/locale semantics can leak in. */
  private def qHeatmap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select((floor(unix_millis($"ts").cast("double") / 86400000).cast("long")).as("days"),
        (floor(unix_millis($"ts").cast("double") / 3600000).cast("long") % 24).as("hod"))
      .groupBy((($"days" + 4) % 7).as("dow"), $"hod")
      .agg(count(lit(1)).as("n"))
      .orderBy("dow", "hod")
  }

  private val qHeatmapSql =
    """WITH e AS (SELECT
      |    CAST(FLOOR(CAST(epoch_ns(ts)//1000000 AS DOUBLE)/86400000) AS BIGINT) AS days,
      |    CAST(FLOOR(CAST(epoch_ns(ts)//1000000 AS DOUBLE)/3600000) AS BIGINT) % 24 AS hod
      |    FROM events)
      |SELECT (days + 4) % 7 AS dow, hod, CAST(COUNT(*) AS BIGINT) AS n
      |FROM e GROUP BY 1, 2 ORDER BY dow, hod""".stripMargin

  // ------------------------------------------------------------------ q_gini

  /** Gini coefficient of customer revenue — the inequality readout
    * next to q_pareto's top-decile share. G = (2·Σ i·xᵢ)/(n·Σx) −
    * (n+1)/n over ascending-sorted revenues; Σ i·xᵢ runs in exact
    * DECIMAL. The global rank i is EXACT but fully distributed — a
    * two-pass range rank, never a single-partition window: (1) each
    * customer aggregate is classified into one of 32 revenue-range
    * buckets against broadcast percentile edges (strict m > edge, so
    * tied revenues never straddle a bucket and the per-bucket
    * (m, custkey) order composes into the global total order);
    * (2) row_number PARTITIONED by bucket plus a prefix-count offset
    * from the 32-row bucket spine (the only orderBy-without-partition
    * window runs over that constant-size spine). The rank being a
    * pure function of the data, Σ i·xᵢ is bit-identical to the
    * oracle's single-node ROW_NUMBER. */
  private def qGini(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = DecimalType(38, 0)
    val cust = Tables.orders(s, dir).groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("m"))
    val ed = cust.agg(expr("percentile(m, array(" +
      (1 to 31).map(i => (i / 32.0).toString).mkString(",") + "))").as("edges"))
    val bucketed = cust.crossJoin(broadcast(ed))
      .withColumn("b", expr("aggregate(edges, 0, (acc, x) -> acc + IF(m > x, 1, 0))"))
      .drop("edges")
    val offs = bucketed.groupBy($"b").agg(count(lit(1)).as("cnt"))
      .withColumn("off", sum($"cnt").over(Window.orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"cnt")
    val ranked = bucketed.join(broadcast(offs.select($"b", $"off")), "b")
      .withColumn("i", row_number().over(
        Window.partitionBy($"b").orderBy($"m", $"o_custkey")).cast("long") + $"off")
    ranked.agg(
        count(lit(1)).as("nl"),
        sum($"m".cast(d38)).cast("double").as("sm"),
        sum(($"i".cast(d38) * $"m".cast(d38))).cast("double").as("sim"))
      .select($"nl".as("n_customers"),
        round(lit(2.0) * $"sim" / ($"nl".cast("double") * $"sm") -
          ($"nl" + 1).cast("double") / $"nl", 9).as("gini"))
      .orderBy("n_customers")
  }

  private val qGiniSql =
    """WITH cust AS (SELECT o_custkey, SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS m
      |    FROM orders GROUP BY 1),
      |r AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m, o_custkey) AS i FROM cust),
      |a AS (SELECT COUNT(*) AS nl, CAST(SUM(m) AS DOUBLE) AS sm,
      |    CAST(SUM(CAST(i AS HUGEINT) * m) AS DOUBLE) AS sim FROM r)
      |SELECT CAST(nl AS BIGINT) AS n_customers,
      |  ROUND(2e0 * sim / (CAST(nl AS DOUBLE) * sm) - CAST(nl + 1 AS DOUBLE)/nl, 9) AS gini
      |FROM a ORDER BY n_customers""".stripMargin

  // ------------------------------------------------------------ q_order_gaps

  /** Inter-purchase interval stats: per-customer day gaps between
    * consecutive orders (lag window on the integer day grid), then
    * exact median/p90 over all gaps — the repeat-purchase cadence
    * metric behind retention planning. */
  private def qOrderGaps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).select($"o_custkey", $"o_orderkey",
      floor(unix_timestamp($"o_orderdate").cast("double") / 86400).cast("long").as("day"))
    val gaps = o.withColumn("prev",
        lag($"day", 1).over(Window.partitionBy($"o_custkey").orderBy($"day", $"o_orderkey")))
      .filter($"prev".isNotNull)
      .select(($"day" - $"prev").as("gap_days"))
    gaps.agg(
        count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap_days, 0.5)"), 6).as("p50_days"),
        round(expr("percentile(gap_days, 0.9)"), 6).as("p90_days"),
        max($"gap_days").as("max_days"))
      .orderBy("n_gaps")
  }

  private val qOrderGapsSql =
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |    CAST(FLOOR(CAST(epoch(o_orderdate) AS DOUBLE)/86400) AS BIGINT) AS day
      |    FROM orders),
      |g AS (SELECT day - LAG(day, 1) OVER (PARTITION BY o_custkey
      |      ORDER BY day, o_orderkey) AS gap_days FROM o)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  ROUND(quantile_cont(gap_days, 0.5), 6) AS p50_days,
      |  ROUND(quantile_cont(gap_days, 0.9), 6) AS p90_days,
      |  CAST(MAX(gap_days) AS BIGINT) AS max_days
      |FROM g WHERE gap_days IS NOT NULL ORDER BY n_gaps""".stripMargin

  // ------------------------------------------------------------ q_stickiness

  /** DAU/MAU stickiness per calendar month — the engagement ratio.
    * Months come from integer epoch-day arithmetic only where display
    * needs them; grouping keys are (year, month) derived from the ms
    * grid both engines share via date_format/strftime parity (already
    * proven by q_hourly_stats). Exact distinct counts; the ratio is
    * one double division. */
  private def qStickiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select(
      date_format($"ts", "yyyy-MM").as("month"),
      date_format($"ts", "yyyy-MM-dd").as("day"),
      $"user_id")
    val dau = e.groupBy($"month", $"day")
      .agg(countDistinct($"user_id").as("dau"))
      .groupBy($"month").agg(sum($"dau").as("dau_sum"), count(lit(1)).as("n_days"))
    val mau = e.groupBy($"month").agg(countDistinct($"user_id").as("mau"))
    dau.join(mau, "month")
      .select($"month", $"n_days", $"mau",
        (expr("(dau_sum * 1000000L) div n_days").cast("double") / 1e6)
          .as("avg_dau"),
        (expr("(dau_sum * 1000000L) div (n_days * mau)").cast("double") / 1e6)
          .as("stickiness"))
      .orderBy("month")
  }

  private val qStickinessSql =
    """WITH e AS (SELECT strftime(ts, '%Y-%m') AS month,
      |    strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
      |d AS (SELECT month, day, COUNT(DISTINCT user_id) AS dau FROM e GROUP BY 1, 2),
      |ds AS (SELECT month, SUM(dau) AS dau_sum, COUNT(*) AS n_days FROM d GROUP BY 1),
      |m AS (SELECT month, COUNT(DISTINCT user_id) AS mau FROM e GROUP BY 1)
      |SELECT month, CAST(n_days AS BIGINT) AS n_days, CAST(mau AS BIGINT) AS mau,
      |  CAST((dau_sum * 1000000) // n_days AS DOUBLE)/1e6 AS avg_dau,
      |  CAST((dau_sum * 1000000) // (n_days * mau) AS DOUBLE)/1e6 AS stickiness
      |FROM ds JOIN m USING (month) ORDER BY month""".stripMargin

  // ------------------------------------------------------------ q_cohort_ltv

  /** Cohort LTV curve: customers grouped by first-order month, then
    * cumulative revenue per customer by month offset — the lifetime-
    * value triangle next to q_retention's activity triangle. Month
    * arithmetic is integer (epoch months = year*12+month from the
    * shared ms grid); revenue is exact cents; the running sum windows
    * per cohort (never globally). */
  private def qCohortLtv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).select($"o_custkey",
      (year($"o_orderdate") * 12 + month($"o_orderdate")).cast("long").as("em"),
      round($"o_totalprice" * 100).cast("long").as("cents"))
    val cohort = o.groupBy($"o_custkey").agg(min($"em").as("c0"))
    val sized = cohort.groupBy($"c0").agg(count(lit(1)).as("n_cust"))
    val rev = o.join(cohort, "o_custkey")
      .groupBy($"c0", ($"em" - $"c0").as("month_offset"))
      .agg(sum($"cents").as("rev"))
    val cum = rev.withColumn("cum_rev",
      sum($"rev").over(Window.partitionBy($"c0").orderBy($"month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.join(broadcast(sized), "c0")
      .filter($"month_offset" <= 6)
      .select($"c0".as("cohort_month"), $"month_offset", $"n_cust",
        (expr("(cum_rev * 10000L) div n_cust").cast("double") / 1e6)
          .as("ltv_per_customer"))
      .orderBy("cohort_month", "month_offset")
  }

  private val qCohortLtvSql =
    """WITH o AS (SELECT o_custkey,
      |    CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT) AS em,
      |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents FROM orders),
      |c AS (SELECT o_custkey, MIN(em) AS c0 FROM o GROUP BY 1),
      |sz AS (SELECT c0, COUNT(*) AS n_cust FROM c GROUP BY 1),
      |r AS (SELECT c0, em - c0 AS month_offset, SUM(cents) AS rev
      |    FROM o JOIN c USING (o_custkey) GROUP BY 1, 2),
      |cm AS (SELECT c0, month_offset,
      |    SUM(rev) OVER (PARTITION BY c0 ORDER BY month_offset
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
      |    FROM r)
      |SELECT c0 AS cohort_month, month_offset, CAST(n_cust AS BIGINT) AS n_cust,
      |  CAST((cum_rev * 10000) // n_cust AS DOUBLE)/1e6 AS ltv_per_customer
      |FROM cm JOIN sz USING (c0) WHERE month_offset <= 6
      |ORDER BY cohort_month, month_offset""".stripMargin

  // ----------------------------------------------------------- q_power_curve

  /** Power-user curve: distribution of distinct active days per user —
    * the engagement histogram behind DAU composition analysis. Two
    * key-only aggregations over (user, day) pairs. */
  private def qPowerCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id",
        floor(unix_millis($"ts").cast("double") / 86400000).cast("long").as("day"))
      .distinct()
      .groupBy($"user_id").agg(count(lit(1)).as("active_days"))
      .groupBy($"active_days").agg(count(lit(1)).as("n_users"))
      .orderBy("active_days")
  }

  private val qPowerCurveSql =
    """WITH d AS (SELECT DISTINCT user_id,
      |    CAST(FLOOR(CAST(epoch_ns(ts)//1000000 AS DOUBLE)/86400000) AS BIGINT) AS day
      |    FROM events),
      |a AS (SELECT user_id, COUNT(*) AS active_days FROM d GROUP BY 1)
      |SELECT CAST(active_days AS BIGINT) AS active_days,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM a GROUP BY active_days ORDER BY active_days""".stripMargin

  // ----------------------------------------------------- corpus_source_overlap

  /** Cross-source vocabulary overlap: exact Jaccard of the word sets
    * for every source pair — the redundancy matrix that tells a data
    * mixer which domains duplicate each other. The join keys on words
    * (never source pairs), so work scales with shared-vocabulary mass,
    * not #sources². Top-20 most-overlapping pairs. */
  private def corpusSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one explode+distinct for all three consumers (sz + both join legs)
    val sw = Tables.documents(s, dir)
      .select($"source", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .distinct().localCheckpoint()
    val sz = sw.groupBy($"source").agg(count(lit(1)).as("n"))
    val inter = sw.as("a").join(sw.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select($"source".as("src_a"), $"n".as("na")), "src_a")
      .join(sz.select($"source".as("src_b"), $"n".as("nb")), "src_b")
      .select($"src_a", $"src_b",
        (expr("(inter * 1000000000L) div (na + nb - inter)")
          .cast("double") / 1e9).as("vocab_jaccard"))
      .orderBy($"vocab_jaccard".desc, $"src_a", $"src_b").limit(20)
  }

  private val corpusSourceOverlapSql =
    """WITH sw AS (SELECT DISTINCT source, w FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) t
      |    WHERE length(w) > 0),
      |sz AS (SELECT source, COUNT(*) AS n FROM sw GROUP BY 1),
      |i AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
      |    FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
      |    GROUP BY 1, 2)
      |SELECT src_a, src_b,
      |  CAST((inter * 1000000000) // (na.n + nb.n - inter) AS DOUBLE)/1e9 AS vocab_jaccard
      |FROM i JOIN sz na ON na.source = src_a JOIN sz nb ON nb.source = src_b
      |ORDER BY vocab_jaccard DESC, src_a, src_b LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q_disorder

  /** Out-of-order arrival audit: treating event_id as arrival order,
    * how many events arrive with an event time BEHIND the running max
    * already seen for that user, and by how much (p50/p99/max
    * lateness)? This is the measurement that SIZES the streaming
    * watermark delay — EventStream's 30-minute default should cover
    * ~p99 of observed lateness. Per-user running max windows; exact
    * integer-ms lateness percentiles. */
  private def qDisorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"))
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val lateness = e.withColumn("prior_max", max($"ms").over(w))
      .withColumn("late_ms",
        when($"prior_max".isNotNull && $"ms" < $"prior_max", $"prior_max" - $"ms"))
    lateness.agg(
        count(lit(1)).as("n_events"),
        sum(when($"late_ms".isNotNull, 1L).otherwise(0L)).as("n_late"),
        (sum(when($"late_ms".isNotNull, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("late_frac"),
        round(expr("percentile(late_ms, 0.5)") / 60000.0, 6).as("p50_late_min"),
        round(expr("percentile(late_ms, 0.99)") / 60000.0, 6).as("p99_late_min"),
        (max($"late_ms") / 60000.0).as("max_late_min"))
      .orderBy("n_events")
  }

  private val qDisorderSql =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000000 AS ms FROM events),
      |l AS (SELECT ms,
      |    MAX(ms) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
      |    FROM e),
      |d AS (SELECT CASE WHEN prior_max IS NOT NULL AND ms < prior_max
      |      THEN prior_max - ms END AS late_ms FROM l)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN late_ms IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(SUM(CASE WHEN late_ms IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS late_frac,
      |  ROUND(quantile_cont(late_ms, 0.5) / 60000.0, 6) AS p50_late_min,
      |  ROUND(quantile_cont(late_ms, 0.99) / 60000.0, 6) AS p99_late_min,
      |  MAX(late_ms) / 60000.0 AS max_late_min
      |FROM d ORDER BY n_events""".stripMargin

  // ------------------------------------------------------------ q_user_growth

  /** New-user and cumulative-user growth curve: first-activity day per
    * user (one aggregate), then daily new-user counts with a running
    * total over the tiny day spine. */
  private def qUserGrowth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val first = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(min(floor(unix_millis($"ts").cast("double") / 86400000).cast("long")).as("day"))
    val daily = first.groupBy($"day").agg(count(lit(1)).as("n_new"))
    daily.withColumn("cum_users",
        sum($"n_new").over(Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("day")
  }

  private val qUserGrowthSql =
    """WITH f AS (SELECT user_id,
      |    MIN(CAST(FLOOR(CAST(epoch_ns(ts)//1000000 AS DOUBLE)/86400000) AS BIGINT)) AS day
      |    FROM events GROUP BY 1),
      |d AS (SELECT day, COUNT(*) AS n_new FROM f GROUP BY 1)
      |SELECT day, CAST(n_new AS BIGINT) AS n_new,
      |  CAST(SUM(n_new) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM d ORDER BY day""".stripMargin

  // --------------------------------------------------------------- q_funnel3

  /** Strict three-step ordered funnel (view → click → purchase): the
    * first click must follow the user's FIRST view, and the first
    * purchase must follow that click — sequential-pattern semantics,
    * not mere co-occurrence. One per-user aggregate computes all three
    * stage timestamps via conditional minima (no joins, no windows on
    * the fact table). */
  private def qFunnel3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_type", unix_millis($"ts").as("ms"))
    val stages = e.groupBy($"user_id").agg(
      min(when($"event_type" === "view", $"ms")).as("v"))
      .join(e.groupBy($"user_id").agg(collect_list(struct($"ms", $"event_type")).as("evs")),
        "user_id")
      .withColumn("c", array_min(expr(
        "transform(filter(evs, x -> x.event_type = 'click' AND x.ms >= v), x -> x.ms)")))
      .withColumn("p", array_min(expr(
        "transform(filter(evs, x -> x.event_type = 'purchase' AND x.ms >= c), x -> x.ms)")))
    stages.agg(
        count(lit(1)).as("n_users"),
        sum(when($"v".isNotNull, 1L).otherwise(0L)).as("n_viewed"),
        sum(when($"c".isNotNull, 1L).otherwise(0L)).as("n_clicked_after_view"),
        sum(when($"p".isNotNull, 1L).otherwise(0L)).as("n_purchased_after_click"))
      .select($"n_users", $"n_viewed", $"n_clicked_after_view", $"n_purchased_after_click",
        ($"n_clicked_after_view".cast("double") / $"n_viewed").as("view_to_click"),
        ($"n_purchased_after_click".cast("double") / $"n_clicked_after_view")
          .as("click_to_purchase"))
      .orderBy("n_users")
  }

  private val qFunnel3Sql =
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000000 AS ms FROM events),
      |s AS (SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ms END) AS v FROM e GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(ms) AS c FROM e JOIN s USING (user_id)
      |    WHERE event_type = 'click' AND v IS NOT NULL AND ms >= v GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(ms) AS p FROM e JOIN c USING (user_id)
      |    WHERE event_type = 'purchase' AND ms >= c.c GROUP BY 1),
      |u AS (SELECT s.user_id, v, c.c AS c, p.p AS p FROM s
      |    LEFT JOIN c ON s.user_id = c.user_id
      |    LEFT JOIN p ON s.user_id = p.user_id)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
      |  CAST(SUM(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
      |  CAST(SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after_click,
      |  CAST(SUM(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS view_to_click,
      |  CAST(SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / SUM(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS click_to_purchase
      |FROM u ORDER BY n_users""".stripMargin

  // ---------------------------------------------------- q_sessions_concurrency

  /** Peak concurrent sessions per hour — the capacity-planning
    * number. Sessions (30-min gap) become ±1 boundary events; the
    * classic prefix-sum sweep is decomposed scale-cleanly: per-hour
    * running sums (windows partitioned by hour, bounded rows) plus a
    * carry-in from the tiny hour-spine running total — no global
    * window ever touches the boundary table (the only orderBy-hr
    * window runs over the densified hour spine, bounded by #hours,
    * not #events). The within-hour running max is clamped at 0:
    * an hour whose first boundaries are session ends never reports
    * below the concurrency already held at the hour start. The
    * spine is densified min..max hour, so hours fully covered by
    * long sessions (no boundary events at all) still report
    * peak = carry_in. Tie order (end before start at the same ms)
    * is explicit, so back-to-back sessions never read as
    * overlapping. */
  private def qSessionsConcurrency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", unix_millis($"ts").as("ms"), $"event_id")
    val sid = e.withColumn("new_s",
        when(($"ms" - lag($"ms", 1).over(
          Window.partitionBy($"user_id").orderBy($"ms", $"event_id"))) > 1800000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("sid", sum($"new_s").over(
        Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sess = sid.groupBy($"user_id", $"sid")
      .agg(min($"ms").as("st"), max($"ms").as("en"))
    val bnd = sess.select($"st".as("t"), lit(1L).as("delta"))
      .unionByName(sess.select(($"en" + 1L).as("t"), lit(-1L).as("delta")))
    val hr = bnd.withColumn("hr", floor($"t".cast("double") / 3600000).cast("long"))
    val net = hr.groupBy($"hr").agg(sum($"delta").as("net"))
    val dense = net.agg(min($"hr").as("mn"), max($"hr").as("mx"))
      .select(explode(sequence($"mn", $"mx")).as("hr"))
    val spine = dense.join(net, Seq("hr"), "left")
      .na.fill(0L, Seq("net"))
      .withColumn("carry_in",
        sum($"net").over(Window.orderBy($"hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"net")
    val peaks = hr.withColumn("run",
        sum($"delta").over(Window.partitionBy($"hr").orderBy($"t", $"delta")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"hr").agg(max($"run").as("peak_in_hr"))
    spine.join(peaks, Seq("hr"), "left")
      .select($"hr".as("hour_bucket"),
        ($"carry_in" + greatest(coalesce($"peak_in_hr", lit(0L)), lit(0L)))
          .as("peak_sessions"))
      .filter($"peak_sessions" > 0)
      .orderBy("hour_bucket")
  }

  private val qSessionsConcurrencySql =
    """WITH e AS (SELECT user_id, epoch_ns(ts)//1000000 AS ms, event_id FROM events),
      |l AS (SELECT user_id, ms, event_id,
      |    CASE WHEN ms - LAG(ms, 1) OVER (PARTITION BY user_id ORDER BY ms, event_id)
      |      > 1800000 THEN 1 ELSE 0 END AS new_s FROM e),
      |sd AS (SELECT user_id, ms,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM l),
      |sess AS (SELECT user_id, sid, MIN(ms) AS st, MAX(ms) AS en
      |    FROM sd GROUP BY 1, 2),
      |bnd AS (SELECT st AS t, 1 AS delta FROM sess
      |    UNION ALL SELECT en + 1, -1 FROM sess),
      |h AS (SELECT t, delta,
      |    CAST(FLOOR(CAST(t AS DOUBLE)/3600000) AS BIGINT) AS hr FROM bnd),
      |n AS (SELECT hr, SUM(delta) AS net FROM h GROUP BY 1),
      |d AS (SELECT UNNEST(generate_series(mn, mx)) AS hr
      |    FROM (SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM n) b),
      |sp AS (SELECT d.hr, COALESCE(net, 0) AS net,
      |    SUM(COALESCE(net, 0)) OVER (ORDER BY d.hr
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - COALESCE(net, 0)
      |      AS carry_in
      |    FROM d LEFT JOIN n ON d.hr = n.hr),
      |pk AS (SELECT hr, MAX(run) AS peak_in_hr FROM (
      |    SELECT hr, SUM(delta) OVER (PARTITION BY hr ORDER BY t, delta
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM h) y
      |    GROUP BY 1)
      |SELECT sp.hr AS hour_bucket,
      |  CAST(carry_in + GREATEST(COALESCE(peak_in_hr, 0), 0) AS BIGINT)
      |    AS peak_sessions
      |FROM sp LEFT JOIN pk ON sp.hr = pk.hr
      |WHERE carry_in + GREATEST(COALESCE(peak_in_hr, 0), 0) > 0
      |ORDER BY hour_bucket""".stripMargin

  /** Period-over-period mover detection: per-part discounted revenue
    * before vs after a boundary date, top-20 absolute swings — the
    * "what changed this quarter" audit. One conditional aggregate over
    * one lineitem scan (exact integer 1e-4-dollar units, map-side
    * combinable) + TakeOrdered on the |delta| — no window, no second
    * pass, no global sort. */
  private def qMovers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import QueryDef.{cents, pct}
    val rev = cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))
    Tables.lineitem(s, dir)
      .groupBy($"l_partkey")
      .agg(
        sum(when($"l_shipdate" < "1998-07-01", rev).otherwise(0L)).as("rb"),
        sum(when($"l_shipdate" >= "1998-07-01", rev).otherwise(0L)).as("ra"))
      .orderBy(abs($"ra" - $"rb").desc, $"l_partkey")
      .limit(20)
      .select($"l_partkey",
        ($"rb".cast("double") / 10000.0).as("revenue_before"),
        ($"ra".cast("double") / 10000.0).as("revenue_after"),
        (($"ra" - $"rb").cast("double") / 10000.0).as("delta"))
  }

  private val qMoversSql =
    """WITH a AS (SELECT l_partkey,
      |  SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-07-01'
      |    THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |         * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) ELSE 0 END) AS rb,
      |  SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-07-01'
      |    THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |         * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) ELSE 0 END) AS ra
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT l_partkey,
      |  CAST(rb AS DOUBLE)/10000.0 AS revenue_before,
      |  CAST(ra AS DOUBLE)/10000.0 AS revenue_after,
      |  CAST(ra - rb AS DOUBLE)/10000.0 AS delta
      |FROM a ORDER BY ABS(ra - rb) DESC, l_partkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------- q_causal_did

  /** Difference-in-differences estimator — the workhorse quasi-
    * experimental readout next to q_ab_test's randomized one: mean
    * purchase value per (arm × period) cell around a boundary date,
    * effect = (T_post − T_pre) − (C_post − C_pre). Arms are the
    * deterministic user_id % 2 split (q_ab_test convention).
    *
    * ONE conditional-aggregate pass over purchases (8 exact integer
    * cent sums/counts, map-side combinable, ~0-byte shuffle); the four
    * cell means are single double divisions of exact integers, and the
    * DiD is fixed-shape IEEE arithmetic on those — bit-identical on
    * both engines at any parallelism. */
  private def qCausalDid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import QueryDef.cents
    val p = Tables.events(s, dir).filter($"event_type" === "purchase")
      .select(($"user_id" % 2).as("arm"),
        when($"ts" < "2024-01-16", 0L).otherwise(1L).as("post"),
        cents($"value").as("v"))
    def cell(a: Int, t: Int, c: org.apache.spark.sql.Column) =
      sum(when($"arm" === a && $"post" === t, c).otherwise(0L))
    val w = p.agg(
      cell(0, 0, $"v").as("s00"), cell(0, 0, lit(1L)).as("n00"),
      cell(0, 1, $"v").as("s01"), cell(0, 1, lit(1L)).as("n01"),
      cell(1, 0, $"v").as("s10"), cell(1, 0, lit(1L)).as("n10"),
      cell(1, 1, $"v").as("s11"), cell(1, 1, lit(1L)).as("n11"))
    w.select(
      $"n00".as("n_control_pre"), $"n01".as("n_control_post"),
      $"n10".as("n_treat_pre"), $"n11".as("n_treat_post"),
      ($"s00".cast("double") / $"n00" / 100).as("mean_control_pre"),
      ($"s01".cast("double") / $"n01" / 100).as("mean_control_post"),
      ($"s10".cast("double") / $"n10" / 100).as("mean_treat_pre"),
      ($"s11".cast("double") / $"n11" / 100).as("mean_treat_post"),
      (($"s11".cast("double") / $"n11" / 100 - $"s10".cast("double") / $"n10" / 100) -
        ($"s01".cast("double") / $"n01" / 100 - $"s00".cast("double") / $"n00" / 100))
        .as("did"))
  }

  private val qCausalDidSql =
    """WITH p AS (SELECT user_id % 2 AS arm,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS post,
      |    CAST(ROUND(value * 100) AS BIGINT) AS v
      |  FROM events WHERE event_type = 'purchase'),
      |w AS (SELECT
      |    SUM(CASE WHEN arm = 0 AND post = 0 THEN v ELSE 0 END) AS s00,
      |    SUM(CASE WHEN arm = 0 AND post = 0 THEN 1 ELSE 0 END) AS n00,
      |    SUM(CASE WHEN arm = 0 AND post = 1 THEN v ELSE 0 END) AS s01,
      |    SUM(CASE WHEN arm = 0 AND post = 1 THEN 1 ELSE 0 END) AS n01,
      |    SUM(CASE WHEN arm = 1 AND post = 0 THEN v ELSE 0 END) AS s10,
      |    SUM(CASE WHEN arm = 1 AND post = 0 THEN 1 ELSE 0 END) AS n10,
      |    SUM(CASE WHEN arm = 1 AND post = 1 THEN v ELSE 0 END) AS s11,
      |    SUM(CASE WHEN arm = 1 AND post = 1 THEN 1 ELSE 0 END) AS n11
      |  FROM p)
      |SELECT CAST(n00 AS BIGINT) AS n_control_pre, CAST(n01 AS BIGINT) AS n_control_post,
      |  CAST(n10 AS BIGINT) AS n_treat_pre, CAST(n11 AS BIGINT) AS n_treat_post,
      |  CAST(s00 AS DOUBLE) / n00 / 100 AS mean_control_pre,
      |  CAST(s01 AS DOUBLE) / n01 / 100 AS mean_control_post,
      |  CAST(s10 AS DOUBLE) / n10 / 100 AS mean_treat_pre,
      |  CAST(s11 AS DOUBLE) / n11 / 100 AS mean_treat_post,
      |  (CAST(s11 AS DOUBLE) / n11 / 100 - CAST(s10 AS DOUBLE) / n10 / 100)
      |    - (CAST(s01 AS DOUBLE) / n01 / 100 - CAST(s00 AS DOUBLE) / n00 / 100) AS did
      |FROM w""".stripMargin

  // ---------------------------------------------------------- q_decile_lift

  /** Propensity-model lift/gains table with a TEMPORAL holdout — the
    * standard churn/conversion model eval: score users on the feature
    * period (activity count before Jan 21), label them on the holdout
    * (any purchase after), decile by score, and read lift and
    * cumulative gains off the deciles. Leakage-safe by construction:
    * the score touches only pre-boundary events, the label only
    * post-boundary ones (same contract as q_feature_store_pit).
    *
    * Scale shape: deciles via the q_equidepth percentile-edge
    * classification (one exact-percentile aggregate broadcast back,
    * NO ntile / global sort over users); the cumulative window runs
    * over the 10-row decile table. lift = (n_pos·tu)/(n_users·tp) as
    * one double division of exact integer operands — bit-identical on
    * both engines. */
  private def qDecileLift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val feat = ev.filter($"ts" < "2024-01-21")
      .groupBy($"user_id").agg(count(lit(1)).as("score"))
    val lab = ev.filter($"ts" >= "2024-01-21" && $"event_type" === "purchase")
      .select($"user_id").distinct().withColumn("p", lit(1L))
    val scored = feat.join(lab, Seq("user_id"), "left")
      .select($"score", coalesce($"p", lit(0L)).as("pos"))
    val ed = scored.agg(
      expr("percentile(score, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("edges"))
    val a = scored.crossJoin(broadcast(ed))
      .withColumn("decile",
        expr("aggregate(edges, 0, (acc, x) -> acc + IF(score > round(x, 6), 1, 0))").cast("long"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_users"), sum($"pos").as("n_pos"))
    val tot = a.agg(sum($"n_users").as("tu"), sum($"n_pos").as("tp"))
    a.crossJoin(broadcast(tot))
      .withColumn("cum_pos", sum($"n_pos").over( // ≤ 10 decile rows
        Window.orderBy($"decile".desc).rowsBetween(Window.unboundedPreceding, 0)))
      .select($"decile", $"n_users", $"n_pos",
        ($"n_pos".cast("double") / $"n_users").as("pos_rate"),
        (($"n_pos" * $"tu").cast("double") / ($"n_users" * $"tp")).as("lift"),
        ($"cum_pos".cast("double") / $"tp").as("cum_gain"))
      .orderBy($"decile".desc)
  }

  private val qDecileLiftSql =
    """WITH f AS (SELECT user_id, COUNT(*) AS score FROM events
      |  WHERE ts < TIMESTAMP '2024-01-21' GROUP BY user_id),
      |p AS (SELECT DISTINCT user_id FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-21' AND event_type = 'purchase'),
      |sc AS (SELECT f.score, CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS pos
      |  FROM f LEFT JOIN p ON f.user_id = p.user_id),
      |ed AS (SELECT quantile_cont(score, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges FROM sc),
      |b AS (SELECT score, pos,
      |    CAST(len(list_filter(edges, x -> score > ROUND(x, 6))) AS BIGINT) AS decile
      |  FROM sc CROSS JOIN ed),
      |a AS (SELECT decile, COUNT(*) AS n_users, SUM(pos) AS n_pos FROM b GROUP BY decile),
      |t AS (SELECT SUM(n_users) AS tu, SUM(n_pos) AS tp FROM a),
      |c AS (SELECT decile, n_users, n_pos,
      |    SUM(n_pos) OVER (ORDER BY decile DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
      |  FROM a)
      |SELECT decile, CAST(n_users AS BIGINT) AS n_users,
      |  CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(n_pos AS DOUBLE) / n_users AS pos_rate,
      |  CAST(n_pos * tu AS DOUBLE) / (n_users * tp) AS lift,
      |  CAST(cum_pos AS DOUBLE) / tp AS cum_gain
      |FROM c CROSS JOIN t ORDER BY decile DESC""".stripMargin

  // ---------------------------------------------------------- q_bootstrap_ci

  /** Percentile-bootstrap confidence interval for mean purchase value
    * via the deterministic ONLINE Poisson bootstrap (Chamandy et al.
    * 2012 — the resampling scheme that works on unbounded/streaming
    * data): each row's multiplicity in resample r is a Poisson(1) draw
    * read off md5(event_id, r) against EXACT integer CDF thresholds in
    * 2⁶⁰-units, so every engine reproduces every resample bit-for-bit
    * (no RNG state, no sequential sampling pass).
    *
    * Scale shape: the B×n explode is the bootstrap's inherent cost,
    * map-side combined down to B partial sums per task — the only
    * shuffle carries B=100 rows per task; the CI is rank-based (3rd /
    * 98th of the 100 resample means — a bounded 100-row window), not
    * an interpolated quantile, so there is no float interpolation to
    * drift cross-engine. */
  private def qBootstrapCi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = 100
    // round(P(Poisson(1) <= j) * 2^60), j = 0..4; weight 5 beyond
    val t = Seq(424136118829305344L, 848272237658610688L,
      1060340297073263360L, 1131029650211480960L, 1148701988496035328L)
    val purchases = Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id", QueryDef.cents($"value").as("cents"))
    val weighted = purchases
      .select($"event_id", $"cents", explode(sequence(lit(0), lit(b - 1))).as("r"))
      .withColumn("h",
        conv(substring(md5(concat($"event_id".cast("string"), lit(":"),
          $"r".cast("string"))), 1, 15), 16, 10).cast("long"))
      .withColumn("w",
        when($"h" < t(0), 0L).when($"h" < t(1), 1L).when($"h" < t(2), 2L)
          .when($"h" < t(3), 3L).when($"h" < t(4), 4L).otherwise(5L))
    val means = weighted.groupBy($"r")
      .agg(sum($"w" * $"cents").as("swc"), sum($"w").as("sw"))
      .select($"r", ($"swc".cast("double") / $"sw" / 100.0).as("m"))
      .withColumn("rk", row_number().over(Window.orderBy($"m", $"r"))) // bounded: B=100 rows
    val point = purchases.agg(count(lit(1)).as("n"),
      (sum($"cents").cast("double") / count(lit(1)) / 100.0).as("mean"))
    point.crossJoin(
        means.filter($"rk" === 3).select($"m".as("ci_lo")))
      .crossJoin(means.filter($"rk" === b - 2).select($"m".as("ci_hi")))
      .select(lit("purchase_value_mean").as("metric"), $"n", $"mean",
        $"ci_lo", $"ci_hi")
      .orderBy($"metric")
  }

  private val qBootstrapCiSql =
    """WITH p AS (SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |w AS (SELECT r.r, p.cents,
      |    CASE WHEN h < 424136118829305344 THEN 0
      |         WHEN h < 848272237658610688 THEN 1
      |         WHEN h < 1060340297073263360 THEN 2
      |         WHEN h < 1131029650211480960 THEN 3
      |         WHEN h < 1148701988496035328 THEN 4 ELSE 5 END AS w
      |  FROM p CROSS JOIN range(0, 100) r(r),
      |  LATERAL (SELECT CAST('0x' || substring(md5(
      |    CAST(p.event_id AS VARCHAR) || ':' || CAST(r.r AS VARCHAR)), 1, 15)
      |    AS BIGINT) AS h) x),
      |m AS (SELECT r, CAST(SUM(w * cents) AS DOUBLE) / SUM(w) / 100.0 AS m
      |  FROM w GROUP BY r),
      |rk AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m, r) AS rk FROM m),
      |pt AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS mean FROM p)
      |SELECT 'purchase_value_mean' AS metric, CAST(n AS BIGINT) AS n, mean,
      |  (SELECT m FROM rk WHERE rk = 3) AS ci_lo,
      |  (SELECT m FROM rk WHERE rk = 98) AS ci_hi
      |FROM pt ORDER BY metric""".stripMargin

  // ---------------------------------------------------------- q_survival_km

  /** Kaplan–Meier survival (right-censored time-to-event — the churn /
    * conversion-lag model): time from a user's first signup to their
    * first purchase at or after it, in days; users with no purchase
    * are censored at the observation horizon. The product-limit
    * estimator runs as an EXACT integer nano recurrence
    * s_t = ⌊s_{t−1}·(n_t−d_t)/n_t⌋ (s_0 = 10⁹) — no libm, no float
    * product order, a last-day zero factor lands exactly on 0 — so
    * both engines produce identical curves by construction.
    *
    * Scale shape: per-user times are one shuffle on user_id; the risk
    * table is bounded by DISTINCT EVENT DAYS (the observation horizon,
    * not the user count), so the n_at_risk theta-join broadcasts the
    * day table into the user scan and the recurrence runs on the
    * driver over that bounded table (power-iteration precedent). */
  private def qSurvivalKm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayMs = 86400000L
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_type", unix_millis($"ts").as("ms"))
    val maxMs = e.agg(max($"ms")).head.getLong(0) // bounded scalar
    val su = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ms").as("sms"))
    val pu = su.as("s")
      .join(e.filter($"event_type" === "purchase").as("p"),
        $"p.user_id" === $"s.user_id" && $"p.ms" >= $"s.sms", "left")
      .groupBy($"s.user_id", $"s.sms").agg(min($"p.ms").as("pms"))
    val obs = pu.select(
      when($"pms".isNotNull, expr(s"(pms - sms) div $dayMs"))
        .otherwise(expr(s"($maxMs - sms) div $dayMs")).as("t"),
      $"pms".isNotNull.as("ev"))
    val days = obs.filter($"ev").groupBy($"t".as("d")).agg(count(lit(1)).as("dev"))
    val risk = obs.join(broadcast(days), $"t" >= $"d")
      .groupBy($"d", $"dev").agg(count(lit(1)).as("nrisk"))
      .orderBy($"d")
      .collect() // bounded: one row per distinct event day
    var sNano = BigInt(1000000000L)
    val rows = risk.map { r =>
      val (d, dev, nrisk) = (r.getLong(0), r.getLong(1), r.getLong(2))
      sNano = sNano * BigInt(nrisk - dev) / BigInt(nrisk)
      (d, nrisk, dev, sNano.toLong)
    }.toSeq
    s.createDataFrame(rows).toDF("d", "n_risk", "d_events", "s_nano")
      .select($"d", $"n_risk", $"d_events",
        round($"s_nano".cast("double") / 1e9, 9).as("surv"))
      .orderBy($"d")
  }

  private val qSurvivalKmSql =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
      |mx AS (SELECT MAX(ms) AS maxms FROM e),
      |su AS (SELECT user_id, MIN(ms) AS sms FROM e
      |  WHERE event_type = 'signup' GROUP BY 1),
      |pu AS (SELECT s.user_id, s.sms, MIN(p.ms) AS pms
      |  FROM su s LEFT JOIN e p ON p.user_id = s.user_id
      |    AND p.event_type = 'purchase' AND p.ms >= s.sms
      |  GROUP BY 1, 2),
      |obs AS (SELECT
      |    CASE WHEN pms IS NOT NULL THEN (pms - sms) // 86400000
      |         ELSE (maxms - sms) // 86400000 END AS t,
      |    pms IS NOT NULL AS ev
      |  FROM pu, mx),
      |days AS (SELECT t AS d, COUNT(*) AS dev FROM obs WHERE ev GROUP BY 1),
      |risk AS (SELECT d, dev,
      |    (SELECT COUNT(*) FROM obs WHERE obs.t >= days.d) AS nrisk
      |  FROM days),
      |r AS (SELECT d, dev, nrisk, ROW_NUMBER() OVER (ORDER BY d) AS i FROM risk),
      |km(i, sn) AS (
      |  SELECT 0, CAST(1000000000 AS HUGEINT)
      |  UNION ALL
      |  SELECT r.i, (km.sn * (r.nrisk - r.dev)) // r.nrisk
      |  FROM km JOIN r ON r.i = km.i + 1)
      |SELECT r.d, CAST(r.nrisk AS BIGINT) AS n_risk, CAST(r.dev AS BIGINT) AS d_events,
      |  ROUND(CAST(CAST(km.sn AS BIGINT) AS DOUBLE) / 1e9, 9) AS surv
      |FROM r JOIN km ON km.i = r.i
      |ORDER BY r.d""".stripMargin

  // ------------------------------------------------------ q_stratified_neyman

  /** Neyman-optimal stratified sample allocation (survey sampling /
    * eval-set design): a budget of 1000 samples split across customer
    * market segments ∝ Nh·Sh — big AND high-variance strata get more.
    * Nh·Sh = √(n·Σx²−(Σx)²) with the radicand an EXACT integer
    * (cents co-moments in DECIMAL(38,0)); IEEE sqrt is correctly
    * rounded, so unlike ln/exp it cannot drift cross-engine. Weights
    * are micro-quantized before the cross-strata total (integer sum —
    * no float summation order), and the per-stratum allocation is one
    * double division of identical operands. One scan, one
    * stratum-keyed aggregate, bounded stratum table. */
  private def qStratifiedNeyman(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = DecimalType(38, 0)
    val agg = Tables.customer(s, dir)
      .select($"c_mktsegment".as("segment"), QueryDef.cents($"c_acctbal").as("x"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_pop"),
        sum($"x".cast(d38)).as("sx"),
        sum(($"x".cast(d38) * $"x".cast(d38)).cast(d38)).as("sxx"))
      .select($"segment", $"n_pop",
        round(sqrt(($"n_pop".cast(d38) * $"sxx" - $"sx" * $"sx").cast("double")) * 1e6)
          .cast("long").as("whq"))
    agg
      .withColumn("tot", sum($"whq").over(Window.partitionBy())) // bounded: one row per stratum
      .select($"segment", $"n_pop",
        (expr("(whq + 50L) div 100").cast("double") / 1e6).as("nh_sh"),
        expr("(2 * whq * 1000L + tot) div (2 * tot)").cast("long").as("alloc"))
      .orderBy($"segment")
  }

  private val qStratifiedNeymanSql =
    """WITH c AS (SELECT c_mktsegment AS segment,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x FROM customer),
      |a AS (SELECT segment, COUNT(*) AS n_pop,
      |    SUM(CAST(x AS HUGEINT)) AS sx,
      |    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
      |  FROM c GROUP BY 1),
      |w AS (SELECT segment, n_pop,
      |    CAST(ROUND(SQRT(CAST(n_pop * sxx - sx * sx AS DOUBLE)) * 1e6) AS BIGINT) AS whq
      |  FROM a),
      |t AS (SELECT *, SUM(whq) OVER () AS tot FROM w)
      |SELECT segment, CAST(n_pop AS BIGINT) AS n_pop,
      |  CAST((whq + 50) // 100 AS DOUBLE) / 1e6 AS nh_sh,
      |  CAST((2 * whq * 1000 + tot) // (2 * tot) AS BIGINT) AS alloc
      |FROM t ORDER BY segment""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_stratified_neyman" -> QueryDef(qStratifiedNeyman, Some(qStratifiedNeymanSql)),
    "q_survival_km" -> QueryDef(qSurvivalKm, Some(qSurvivalKmSql)),
    "q_bootstrap_ci" -> QueryDef(qBootstrapCi, Some(qBootstrapCiSql)),
    "q_movers" -> QueryDef(qMovers, Some(qMoversSql)),
    "q_decile_lift" -> QueryDef(qDecileLift, Some(qDecileLiftSql)),
    "q_causal_did" -> QueryDef(qCausalDid, Some(qCausalDidSql)),
    "q_sessions_concurrency" ->
      QueryDef(qSessionsConcurrency, Some(qSessionsConcurrencySql)),
    "q_user_growth" -> QueryDef(qUserGrowth, Some(qUserGrowthSql)),
    "q_funnel3" -> QueryDef(qFunnel3, Some(qFunnel3Sql)),
    "q_disorder" -> QueryDef(qDisorder, Some(qDisorderSql)),
    "q_cohort_ltv" -> QueryDef(qCohortLtv, Some(qCohortLtvSql)),
    "q_power_curve" -> QueryDef(qPowerCurve, Some(qPowerCurveSql)),
    "corpus_source_overlap" -> QueryDef(corpusSourceOverlap, Some(corpusSourceOverlapSql)),
    "q_stickiness" -> QueryDef(qStickiness, Some(qStickinessSql)),
    "q_gini" -> QueryDef(qGini, Some(qGiniSql)),
    "q_order_gaps" -> QueryDef(qOrderGaps, Some(qOrderGapsSql)),
    "q_benford" -> QueryDef(qBenford, Some(qBenfordSql)),
    "q_heatmap" -> QueryDef(qHeatmap, Some(qHeatmapSql)),
    "q_ab_test" -> QueryDef(qAbTest, Some(qAbTestSql)),
    "text_zipf" -> QueryDef(textZipf, Some(textZipfSql)),
    "q_degree_dist" -> QueryDef(qDegreeDist, Some(qDegreeDistSql)),
    "q_time_to_convert" -> QueryDef(qTimeToConvert, Some(qTimeToConvertSql)),
    "q_cusum" -> QueryDef(qCusum, Some(qCusumSql)),
    "q_rfm" -> QueryDef(qRfm, Some(qRfmSql)),
    "q_pareto" -> QueryDef(qPareto, Some(qParetoSql)),
    "corpus_interleave" -> QueryDef(corpusInterleave, Some(corpusInterleaveSql)),
    "text_vocab_growth" -> QueryDef(textVocabGrowth, Some(textVocabGrowthSql)),
    "q_skew_audit" -> QueryDef(qSkewAudit, Some(qSkewAuditSql)),
    "q_markov" -> QueryDef(qMarkov, Some(qMarkovSql)),
    "q_autocorr" -> QueryDef(qAutocorr, Some(qAutocorrSql)),
    "q_basket_lift" -> QueryDef(qBasketLift, Some(qBasketLiftSql)),
    "text_bpe_pairs" -> QueryDef(textBpePairs, Some(textBpePairsSql)),
    "q_kanon" -> QueryDef(qKanon, Some(qKanonSql)),
    "q_equidepth" -> QueryDef(qEquidepth, Some(qEquidepthSql)),
    "corpus_weighted_sample" -> QueryDef(corpusWeightedSample, Some(corpusWeightedSampleSql)),
    "q_corr" -> QueryDef(qCorr, Some(qCorrSql)),
    "q_entropy" -> QueryDef(qEntropy, Some(qEntropySql)),
    "q_mad_outliers" -> QueryDef(qMadOutliers, Some(qMadOutliersSql)),
    "corpus_dsir" -> QueryDef(corpusDsir, Some(corpusDsirSql), bench = true)
  )
}
