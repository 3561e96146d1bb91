package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Pipeline observability + governance keys (round 10): EWMA anomaly
  * control chart, curation attrition funnel, differentially-private
  * release counts. All exact-integer-core — the cross-engine float
  * class of bug cannot occur. */
object Monitoring {

  // --------------------------------------------------------- q_ewma_anomaly

  /** EWMA control chart over daily revenue (the metric-monitoring
    * primitive behind data-volume / revenue anomaly alerts): exponential
    * smoothing s_t = 0.2·x_t + 0.8·s_{t−1} run as the exact integer
    * recurrence s_t = (2·x_t + 8·s_{t−1}) div 10 over the day spine,
    * flagging days that deviate ±30% from the prior smoothed level
    * (10·x_t > 13·s_{t−1} or 10·x_t < 7·s_{t−1} — integer cross-multiply,
    * no division).
    *
    * Scale shape: the corpus-sized work is ONE map-side-combinable
    * daily aggregate; the recurrence runs on the driver over the
    * DATE-DIMENSION-bounded day table (q_survival_km precedent — a day
    * spine is a few thousand rows at any corpus scale). BigInt state so
    * daily totals can't overflow the fold. */
  private def qEwmaAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.orders(s, dir)
      .groupBy(floor(unix_timestamp($"o_orderdate").cast("double") / 86400)
        .cast("long").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("v"))
      .orderBy($"day")
      .collect() // bounded: one row per distinct order day (date dimension)
    var sPrev: BigInt = null
    val rows = rev.map { r =>
      val (day, v) = (r.getLong(0), BigInt(r.getLong(1)))
      val anom = sPrev != null &&
        (10 * v > 13 * sPrev || 10 * v < 7 * sPrev)
      val sCur = if (sPrev == null) v else (2 * v + 8 * sPrev) / 10
      sPrev = sCur
      (day, v.toLong, sCur.toLong, anom)
    }.toSeq
    s.createDataFrame(rows).toDF("day", "rev_cents", "ewma_cents", "is_anomaly")
      .orderBy($"day")
  }

  private val qEwmaAnomalySql =
    """WITH RECURSIVE rev AS (
      |  SELECT CAST(FLOOR(CAST(epoch(o_orderdate) AS DOUBLE)/86400) AS BIGINT) AS day,
      |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
      |  FROM orders GROUP BY 1),
      |r AS (SELECT day, v, ROW_NUMBER() OVER (ORDER BY day) AS i FROM rev),
      |ew(i, sn) AS (
      |  SELECT 1, CAST(v AS HUGEINT) FROM r WHERE i = 1
      |  UNION ALL
      |  SELECT r.i, (2 * r.v + 8 * ew.sn) // 10
      |  FROM ew JOIN r ON r.i = ew.i + 1)
      |SELECT r.day, CAST(r.v AS BIGINT) AS rev_cents, CAST(ew.sn AS BIGINT) AS ewma_cents,
      |  CASE WHEN prev.sn IS NULL THEN FALSE
      |       WHEN 10 * r.v > 13 * prev.sn OR 10 * r.v < 7 * prev.sn THEN TRUE
      |       ELSE FALSE END AS is_anomaly
      |FROM r JOIN ew ON ew.i = r.i
      |LEFT JOIN ew prev ON prev.i = r.i - 1
      |ORDER BY r.day""".stripMargin

  // ------------------------------------------------------------ q_holt_trend

  /** Holt's double exponential smoothing (level + trend) over daily
    * revenue — the forecasting companion to q_ewma_anomaly's control
    * chart: l_t = (2·x_t + 8·(l′+b′)) div 10, b_t = (3·(l_t−l′) +
    * 7·b′) div 10 (α=0.2, β=0.3 as exact integer recurrences), with
    * the one-step-ahead forecast l′+b′ and its signed error emitted
    * per day. Same scale shape as EWMA: one daily aggregate scan, the
    * recurrence folds over the date-dimension-bounded day table on
    * the driver; the oracle walks the identical trajectory in a
    * recursive CTE. */
  private def qHoltTrend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.orders(s, dir)
      .groupBy(floor(unix_timestamp($"o_orderdate").cast("double") / 86400)
        .cast("long").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("v"))
      .orderBy($"day")
      .collect() // bounded: one row per distinct order day
    var lPrev: BigInt = null
    var bPrev: BigInt = BigInt(0)
    // BigInt `/` truncates toward zero — exactly DuckDB's integer `//`
    // (measured: CAST(-7 AS HUGEINT) // 2 = -3), which matters here
    // because trend deltas go negative
    val rows = rev.map { r =>
      val (day, v) = (r.getLong(0), BigInt(r.getLong(1)))
      val (forecast, err, l, b) =
        if (lPrev == null) (v, BigInt(0), v, BigInt(0))
        else {
          val f = lPrev + bPrev
          val lc = (2 * v + 8 * f) / 10
          val bc = (3 * (lc - lPrev) + 7 * bPrev) / 10
          (f, v - f, lc, bc)
        }
      lPrev = l; bPrev = b
      (day, v.toLong, l.toLong, b.toLong, forecast.toLong, err.toLong)
    }.toSeq
    s.createDataFrame(rows)
      .toDF("day", "rev_cents", "level_cents", "trend_cents",
        "forecast_cents", "err_cents")
      .orderBy($"day")
  }

  private val qHoltTrendSql =
    """WITH RECURSIVE rev AS (
      |  SELECT CAST(FLOOR(CAST(epoch(o_orderdate) AS DOUBLE)/86400) AS BIGINT) AS day,
      |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
      |  FROM orders GROUP BY 1),
      |r AS (SELECT day, v, ROW_NUMBER() OVER (ORDER BY day) AS i FROM rev),
      |hw(i, l, b) AS (
      |  SELECT 1, CAST(v AS HUGEINT), CAST(0 AS HUGEINT) FROM r WHERE i = 1
      |  UNION ALL
      |  SELECT r.i,
      |    (2 * r.v + 8 * (hw.l + hw.b)) // 10,
      |    (3 * ((2 * r.v + 8 * (hw.l + hw.b)) // 10 - hw.l) + 7 * hw.b) // 10
      |  FROM hw JOIN r ON r.i = hw.i + 1)
      |SELECT r.day, CAST(r.v AS BIGINT) AS rev_cents,
      |  CAST(hw.l AS BIGINT) AS level_cents,
      |  CAST(hw.b AS BIGINT) AS trend_cents,
      |  CAST(CASE WHEN prev.l IS NULL THEN r.v
      |            ELSE prev.l + prev.b END AS BIGINT) AS forecast_cents,
      |  CAST(CASE WHEN prev.l IS NULL THEN 0
      |            ELSE r.v - (prev.l + prev.b) END AS BIGINT) AS err_cents
      |FROM r
      |JOIN hw ON hw.i = r.i
      |LEFT JOIN hw prev ON prev.i = r.i - 1
      |ORDER BY r.day""".stripMargin

  // ----------------------------------------------------- corpus_filter_funnel

  /** Curation attrition funnel — the observability report every
    * filtering pipeline ships: how many docs survive each sequential
    * gate (non-empty → ≥5 words → word-shape band → exact dedup), with
    * exact-ppm retention per stage. The corpus-sized work is ONE scan
    * computing all gate flags (conditional counts map-side combine) plus
    * one count-distinct for the dedup survivor count; the funnel itself
    * is a 4-row pivot of that single aggregate row.
    *
    * Word-shape gate: mean word length in [2,12] as the integer
    * cross-multiply 2·words ≤ chars ≤ 12·words (chars = non-space
    * length), the repo's no-division rule. */
  private def corpusFilterFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val flags = Tables.documents(s, dir).select(
      $"text",
      (length(trim($"text")) > 0).as("g1"),
      (size(split($"text", " ")) >= 5).as("g2"),
      (length(regexp_replace($"text", " ", "")) >= size(split($"text", " ")) * 2 &&
        length(regexp_replace($"text", " ", "")) <= size(split($"text", " ")) * 12).as("g3"))
    val agg = flags.agg(
      count(lit(1)).as("c0"),
      sum(when($"g1", 1L).otherwise(0L)).as("c1"),
      sum(when($"g1" && $"g2", 1L).otherwise(0L)).as("c2"),
      sum(when($"g1" && $"g2" && $"g3", 1L).otherwise(0L)).as("c3"),
      // distinct over the 60-bit md5 hash, not the text: the dedup
      // stage's shuffle carries 8-byte keys at any corpus size
      // (the repo's standard hash convention); computed in-scan
      countDistinct(when($"g1" && $"g2" && $"g3",
        conv(substring(md5($"text"), 1, 15), 16, 10).cast("long"))).as("c4"))
    val stages = Seq(
      (1L, "nonempty", "c0", "c1"), (2L, "min_words", "c1", "c2"),
      (3L, "word_shape", "c2", "c3"), (4L, "exact_dedup", "c3", "c4"))
    stages.map { case (i, nm, in, kept) =>
      agg.select(lit(i).as("stage_idx"), lit(nm).as("stage"),
        col(in).as("docs_in"), col(kept).as("docs_kept"),
        when(col(in) > 0L, expr(s"($kept * 1000000L) div $in"))
          .otherwise(0L).as("kept_ppm"))
    }.reduce(_ unionAll _).orderBy($"stage_idx")
  }

  private val corpusFilterFunnelSql =
    """WITH flags AS (
      |  SELECT text,
      |    len(trim(text)) > 0 AS g1,
      |    len(string_split(text, ' ')) >= 5 AS g2,
      |    len(replace(text, ' ', '')) >= len(string_split(text, ' ')) * 2
      |      AND len(replace(text, ' ', '')) <= len(string_split(text, ' ')) * 12 AS g3
      |  FROM documents),
      |agg AS (
      |  SELECT COUNT(*) AS c0,
      |    SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS c2,
      |    SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS c3,
      |    COUNT(DISTINCT CASE WHEN g1 AND g2 AND g3
      |      THEN CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) END) AS c4
      |  FROM flags)
      |SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS stage_idx, 'nonempty' AS stage,
      |    CAST(c0 AS BIGINT) AS docs_in, CAST(c1 AS BIGINT) AS docs_kept,
      |    CAST(CASE WHEN c0 > 0 THEN (c1 * 1000000) // c0 ELSE 0 END AS BIGINT) AS kept_ppm FROM agg
      |  UNION ALL
      |  SELECT 2, 'min_words', CAST(c1 AS BIGINT), CAST(c2 AS BIGINT),
      |    CAST(CASE WHEN c1 > 0 THEN (c2 * 1000000) // c1 ELSE 0 END AS BIGINT) FROM agg
      |  UNION ALL
      |  SELECT 3, 'word_shape', CAST(c2 AS BIGINT), CAST(c3 AS BIGINT),
      |    CAST(CASE WHEN c2 > 0 THEN (c3 * 1000000) // c2 ELSE 0 END AS BIGINT) FROM agg
      |  UNION ALL
      |  SELECT 4, 'exact_dedup', CAST(c3 AS BIGINT), CAST(c4 AS BIGINT),
      |    CAST(CASE WHEN c3 > 0 THEN (c4 * 1000000) // c3 ELSE 0 END AS BIGINT) FROM agg)
      |ORDER BY stage_idx""".stripMargin

  // ------------------------------------------------------------- q_dp_counts

  /** ε-differentially-private release counts (ε=1 two-sided geometric /
    * discrete-Laplace mechanism — the integer-valued DP noise used for
    * count releases): per-event-type counts plus noise drawn by INVERSE
    * CDF over a precomputed exact integer threshold table (2⁶⁰-scaled
    * CDF of p(k) ∝ e^−|k|, k ∈ [−8,8], tail mass closed into ±8), with
    * the uniform read off the repo's 60-bit md5 convention — fully
    * deterministic, bit-identical in both engines (q_bootstrap_ci's
    * CDF-threshold pattern). Emits the true count beside the noisy one
    * as the UTILITY AUDIT; an actual release drops the true column.
    *
    * Scale shape: one map-side-combinable count aggregate; the noise
    * join is group-cardinality rows × a broadcast 17-row CDF table. */
  private val dpCdf: Seq[(Long, Long)] = Seq(
    (-8L, 178729391883036L), (-7L, 664566250050231L), (-6L, 1985207753201750L),
    (-5L, 5575083553127363L), (-4L, 15333377706490036L), (-3L, 41859171380333936L),
    (-2L, 113963754309397696L), (-1L, 309964331834089984L), (0L, 842749140086939392L),
    (1L, 1038749717611631616L), (2L, 1110854300540695424L), (3L, 1137380094214539264L),
    (4L, 1147138388367901952L), (5L, 1150728264167827584L), (6L, 1152048905670979072L),
    (7L, 1152534742529146240L), (8L, 1152921504606846976L))

  private def qDpCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.events(s, dir)
      .groupBy($"event_type").agg(count(lit(1)).as("true_count"))
      .select($"event_type", $"true_count",
        conv(substring(md5(concat(lit("dp:"), $"event_type")), 1, 15), 16, 10)
          .cast("long").as("u60"))
    val cdf = dpCdf.toDF("k", "thr")
    counts.join(broadcast(cdf), $"u60" < $"thr")
      .groupBy($"event_type", $"true_count").agg(min($"k").as("noise"))
      .select($"event_type", $"true_count", $"noise",
        greatest($"true_count" + $"noise", lit(0L)).as("noisy_count"))
      .orderBy($"event_type")
  }

  private val qDpCountsSql = {
    val cdfRows = dpCdf.map { case (k, t) => s"($k, $t)" }.mkString(", ")
    s"""WITH counts AS (
       |  SELECT event_type, COUNT(*) AS true_count,
       |    CAST('0x' || substring(md5('dp:' || event_type), 1, 15) AS BIGINT) AS u60
       |  FROM events GROUP BY 1),
       |cdf(k, thr) AS (VALUES $cdfRows)
       |SELECT event_type, true_count, CAST(MIN(k) AS BIGINT) AS noise,
       |  CAST(GREATEST(true_count + MIN(k), 0) AS BIGINT) AS noisy_count
       |FROM counts JOIN cdf ON u60 < thr
       |GROUP BY event_type, true_count
       |ORDER BY event_type""".stripMargin
  }

  // ----------------------------------------------------------- text_jsd_drift

  /** Jensen–Shannon vocabulary drift per source vs the whole corpus —
    * the text analog of q_psi_drift's numeric PSI: unigram mass over
    * 1024 md5 hash buckets (the DSIR convention — bounded distribution
    * state at any corpus size), JSD(P_source, Q_corpus) with M the
    * midpoint. Exactness: p/m and q/m reduce to ratios of EXACT
    * integers (2·c_s·N vs c_s·N + c·N_s), each ln nano-quantized per
    * distinct operand before the per-source integer sums; the final
    * jsd = s1/(2e9·N_s) + s2/(2e9·N) is two double divisions + one
    * add of fixed shape. Products ride DECIMAL(38)/HUGEINT so token
    * counts can reach 1e13 without overflow. Zero-in-source buckets
    * contribute only the q-side term (ln 2 shape); the p-side term
    * carries a c_s multiplier and is gated on c_s > 0. */
  private def textJsdDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def lq(c: org.apache.spark.sql.Column) =
      round(log(c.cast("double")) * 1e9).cast("long")
    val tok = Tables.documents(s, dir)
      .select($"source", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .select($"source",
        (conv(substring(md5($"w"), 1, 15), 16, 10).cast("long") % 1024L).as("b"))
    val cs = tok.groupBy($"source", $"b").agg(count(lit(1)).as("cs"))
      .localCheckpoint() // bounded: sources × 1024 buckets
    val cb = cs.groupBy($"b").agg(sum($"cs").as("c"))
    val ns = cs.groupBy($"source").agg(sum($"cs").as("nstok"),
      sum(when($"cs" > 0, 1L).otherwise(0L)).as("n_buckets"))
    val ntot = cb.agg(sum($"c").as("n"))
    val grid = ns.crossJoin(broadcast(cb)).crossJoin(broadcast(ntot))
      .join(cs.select($"source".as("s2"), $"b".as("b2"), $"cs"),
        $"source" === $"s2" && $"b" === $"b2", "left")
      .select($"source", $"nstok", $"n_buckets", $"n",
        coalesce($"cs", lit(0L)).as("csv"), $"c")
    // t1/t2 products ride DECIMAL(38,0), not LongType: at the 1e13-token
    // scale the docstring promises, csv·Δln·1e9 terms (~7e21) and their
    // sums exceed Long.MaxValue. The oracle widens the same products to
    // HUGEINT before the multiply (not just the SUM — a BIGINT*BIGINT
    // product would raise an overflow error there), so both engines
    // carry the full-width terms end to end.
    val terms = grid.select($"source", $"nstok", $"n_buckets", $"n",
      when($"csv" > 0,
        $"csv".cast(d38) * (lq(($"csv" * 2).cast(d38) * $"n") -
          lq($"csv".cast(d38) * $"n" + $"c".cast(d38) * $"nstok")).cast(d38))
        .otherwise(lit(0L).cast(d38)).as("t1"),
      ($"c".cast(d38) * (lq(($"c" * 2).cast(d38) * $"nstok") -
        lq($"csv".cast(d38) * $"n" + $"c".cast(d38) * $"nstok")).cast(d38)).as("t2"))
    terms.groupBy($"source", $"nstok", $"n_buckets", $"n")
      .agg(sum($"t1").as("s1"), sum($"t2").as("s2"))
      .select($"source", $"nstok".as("n_tokens"), $"n_buckets",
        $"s1".cast("long").as("s1_nano"), $"s2".cast("long").as("s2_nano"),
        ($"s1".cast("double") / (lit(2e9) * $"nstok") +
          $"s2".cast("double") / (lit(2e9) * $"n")).as("jsd"))
      .orderBy($"source")
  }

  private val textJsdDriftSql =
    """WITH tok AS (
      |  SELECT source,
      |    CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % 1024 AS b
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) t
      |  WHERE len(w) > 0),
      |cs AS (SELECT source, b, COUNT(*) AS cs FROM tok GROUP BY 1, 2),
      |cb AS (SELECT b, SUM(cs) AS c FROM cs GROUP BY 1),
      |ns AS (SELECT source, SUM(cs) AS nstok, COUNT(*) AS n_buckets
      |  FROM cs GROUP BY 1),
      |ntot AS (SELECT SUM(c) AS n FROM cb),
      |grid AS (
      |  SELECT ns.source, ns.nstok, ns.n_buckets, ntot.n,
      |    COALESCE(s2.cs, 0) AS csv, cb.c
      |  FROM ns CROSS JOIN cb CROSS JOIN ntot
      |  LEFT JOIN cs s2 ON s2.source = ns.source AND s2.b = cb.b),
      |terms AS (
      |  SELECT source, nstok, n_buckets, n,
      |    -- csv/c widened to HUGEINT BEFORE the multiply: at the 1e13-token
      |    -- scale the per-row count·Δln-nano product (~7e21) overflows a
      |    -- BIGINT*BIGINT multiply — only the SUM was HUGEINT before
      |    CASE WHEN csv > 0 THEN csv::HUGEINT * (
      |        CAST(ROUND(LN(CAST(2::HUGEINT * csv * n AS DOUBLE))*1e9) AS BIGINT)
      |      - CAST(ROUND(LN(CAST(csv::HUGEINT * n + c::HUGEINT * nstok AS DOUBLE))*1e9) AS BIGINT))
      |      ELSE 0::HUGEINT END AS t1,
      |    c::HUGEINT * (CAST(ROUND(LN(CAST(2::HUGEINT * c * nstok AS DOUBLE))*1e9) AS BIGINT)
      |      - CAST(ROUND(LN(CAST(csv::HUGEINT * n + c::HUGEINT * nstok AS DOUBLE))*1e9) AS BIGINT)) AS t2
      |  FROM grid)
      |SELECT source, CAST(nstok AS BIGINT) AS n_tokens,
      |  CAST(n_buckets AS BIGINT) AS n_buckets,
      |  CAST(SUM(t1) AS BIGINT) AS s1_nano, CAST(SUM(t2) AS BIGINT) AS s2_nano,
      |  CAST(SUM(t1) AS DOUBLE) / (2e9 * nstok)
      |    + CAST(SUM(t2) AS DOUBLE) / (2e9 * MAX(n)) AS jsd
      |FROM terms GROUP BY source, nstok, n_buckets
      |ORDER BY source""".stripMargin

  // --------------------------------------------------------- emb_split_drift

  /** Embedding drift between deterministic hash halves — the vector
    * analog of text_jsd_drift: per-label centroid cosine between the
    * md5-split A/B halves (a healthy pipeline scores ≈1; ingestion or
    * model drift pulls a label's halves apart). Components are
    * micro-quantized once (round(v·1e6) — the emb_label_centroid
    * convention); cosine is scale-invariant so the integer SUM vectors
    * stand in for the means and the only doubles are one dot /
    * (√·√) of exact DECIMAL(38) sums. One posexplode scan, one
    * (label, split, pos) aggregate — dim-bounded state per label. */
  private def embSplitDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val comp = Tables.embeddings(s, dir)
      .select($"vec_id", $"label".cast("long").as("label"),
        (conv(substring(md5($"vec_id".cast("string")), 1, 15), 16, 10)
          .cast("long") % 2L).as("split"),
        posexplode($"embedding").as(Seq("pos", "v")))
      .select($"label", $"split", $"pos",
        round($"v".cast("double") * 1e6).cast("long").as("q"))
    val cent = comp.groupBy($"label", $"split", $"pos")
      .agg(sum($"q").as("sq"), count(lit(1)).as("n"))
    val a = cent.filter($"split" === 0)
      .select($"label", $"pos", $"sq".as("sa"), $"n".as("na"))
    val b = cent.filter($"split" === 1)
      .select($"label".as("lb"), $"pos".as("pb"), $"sq".as("sb"), $"n".as("nb"))
    a.join(b, $"label" === $"lb" && $"pos" === $"pb")
      .groupBy($"label")
      .agg(
        max($"na").cast("long").as("n_a"),
        max($"nb").cast("long").as("n_b"),
        sum(($"sa".cast(d38) * $"sb".cast(d38)).cast(d38)).as("dot"),
        sum(($"sa".cast(d38) * $"sa".cast(d38)).cast(d38)).as("naa"),
        sum(($"sb".cast(d38) * $"sb".cast(d38)).cast(d38)).as("nbb"))
      .select($"label", $"n_a", $"n_b",
        round($"dot".cast("double") /
          (sqrt($"naa".cast("double")) * sqrt($"nbb".cast("double"))), 9)
          .as("drift_cos"))
      .orderBy($"label")
  }

  private val embSplitDriftSql =
    """WITH comp AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) % 2 AS split,
      |    i AS pos,
      |    CAST(ROUND(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000.0) AS BIGINT) AS q
      |  FROM (SELECT vec_id, label, embedding,
      |          unnest(generate_series(1, len(embedding))) AS i FROM embeddings) t),
      |cent AS (
      |  SELECT label, split, pos, SUM(q) AS sq, COUNT(*) AS n
      |  FROM comp GROUP BY 1, 2, 3),
      |j AS (
      |  SELECT a.label, a.pos, a.sq AS sa, a.n AS na, b.sq AS sb, b.n AS nb
      |  FROM cent a JOIN cent b
      |    ON a.label = b.label AND a.pos = b.pos AND a.split = 0 AND b.split = 1)
      |SELECT label,
      |  CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
      |  ROUND(CAST(SUM(sa::HUGEINT * sb) AS DOUBLE)
      |    / (SQRT(CAST(SUM(sa::HUGEINT * sa) AS DOUBLE))
      |       * SQRT(CAST(SUM(sb::HUGEINT * sb) AS DOUBLE))), 9) AS drift_cos
      |FROM j GROUP BY label
      |ORDER BY label""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_holt_trend" -> QueryDef(qHoltTrend, Some(qHoltTrendSql)),
    "emb_split_drift" -> QueryDef(embSplitDrift, Some(embSplitDriftSql)),
    "text_jsd_drift" -> QueryDef(textJsdDrift, Some(textJsdDriftSql)),
    "q_ewma_anomaly" -> QueryDef(qEwmaAnomaly, Some(qEwmaAnomalySql)),
    "corpus_filter_funnel" -> QueryDef(corpusFilterFunnel, Some(corpusFilterFunnelSql)),
    "q_dp_counts" -> QueryDef(qDpCounts, Some(qDpCountsSql))
  )
}
