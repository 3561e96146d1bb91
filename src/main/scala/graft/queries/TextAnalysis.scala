package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{TextAnalysis => TA}

/** SURVEY.md §2-E: text analysis query surface over `documents`. */
object TextAnalysis {

  /** HTML main-text extraction proven end-to-end at corpus scale —
    * step one of web curation: each doc's text is rendered into a
    * REAL page (8-token paragraphs, a 3-link nav div, an
    * entity-encoded paragraph, a script with decoy markup inside, a
    * style block, and a link-heavy footer), then
    * [[graft.operators.TextAnalysis.htmlMainText]] walks the tags,
    * raw-skips the script/style, decodes entities, and drops the two
    * boilerplate blocks by link density. The emitted census is exact
    * arithmetic over the ORIGINAL doc (tok_count = tokens + 2 from
    * the entity paragraph, char_count = n_chars + 8, links 5, scripts
    * 1, dropped 2) — so the oracle replays it straight off `documents`
    * without ever seeing HTML: one wrong byte in tokenize, entity
    * decode, raw-skip, or the density rule breaks the hash. */
  private def textHtmlExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id".cast("long"), $"text")
      .as[(Long, String)]
      .map { case (id, text) =>
        val paras = text.split(" ").grouped(8)
          .map(g => s"<p>${g.mkString(" ")}</p>").mkString("\n  ")
        val html =
          s"""<html><body>
             |<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>
             |<style>body { color: #000; } /* <p>not a block</p> */</style>
             |<script type="text/javascript">if (1 < 2 && "x") { var s = "<p>decoy</p>"; }</script>
             |  $paras
             |<p>&amp; &lt;tag&gt;</p>
             |<div class="footer">visit <a href="/x">partner one</a> <a href="/y">partner two</a> now</div>
             |</body></html>""".stripMargin
        val e = TA.htmlMainText(html)
        (id, e.text.split(" ").count(_.nonEmpty).toLong, e.text.length.toLong,
          e.nLinks.toLong, e.nScripts.toLong, e.droppedBlocks.toLong)
      }
      .toDF("doc_id", "tok_count", "char_count", "n_links", "n_scripts",
        "dropped_blocks")
      .orderBy($"doc_id")
  }

  private val textHtmlExtractSql =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) + 2 AS BIGINT) AS tok_count,
      |  CAST(n_chars + 8 AS BIGINT) AS char_count,
      |  CAST(5 AS BIGINT) AS n_links,
      |  CAST(1 AS BIGINT) AS n_scripts,
      |  CAST(2 AS BIGINT) AS dropped_blocks
      |FROM documents ORDER BY doc_id""".stripMargin

  /** URL canonicalization dedup at corpus scale — the crawl-frontier
    * companion to [[textHtmlExtract]]: per doc FOUR real URL spellings
    * are synthesized (uppercased host + utm/fragment noise; explicit
    * default port + trailing slash; reordered query params; tracking
    * params mixed into a real query), REALLY parsed and canonicalized
    * by [[graft.operators.TextAnalysis.canonicalUrl]], and grouped.
    * The four variants collapse to exactly TWO canonical URLs (the
    * bare page, and the page with its real ?a=1&b=2 query), so the
    * oracle re-derives both canonical strings and the group sizes from
    * the generating formula — it never parses a URL; any wrong byte in
    * scheme/host casing, port or fragment stripping, tracking-param
    * removal, param sorting, or slash trimming breaks the hash.
    * Scale shape: per-row string CPU in one scan + one groupBy on the
    * canonical key (the dedup shuffle itself). */
  private def textUrlCanonical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id".cast("long"))
      .as[Long]
      .flatMap { id =>
        val host = s"example${id % 7}.com"
        val path = s"/path${id % 13}/page${id % 5}"
        val variants = Seq(
          s"https://${host.toUpperCase}$path?utm_source=news&utm_campaign=x#sec2",
          s"HTTPS://$host:443$path/",
          s"https://$host$path?b=2&a=1",
          s"https://$host$path?a=1&utm_medium=mail&b=2&gclid=zzz")
        variants.map(u => (id, TA.canonicalUrl(u)))
      }
      .toDF("doc_id", "canonical_url")
      .groupBy($"doc_id", $"canonical_url")
      .agg(count(lit(1)).as("n_dups"))
      .orderBy($"doc_id", $"canonical_url")
  }

  private val textUrlCanonicalSql =
    """WITH base AS (SELECT doc_id,
      |    'https://example' || (doc_id % 7) || '.com/path' || (doc_id % 13)
      |      || '/page' || (doc_id % 5) AS canon FROM documents)
      |SELECT doc_id, canonical_url, CAST(2 AS BIGINT) AS n_dups FROM (
      |  SELECT doc_id, canon AS canonical_url FROM base
      |  UNION ALL
      |  SELECT doc_id, canon || '?a=1&b=2' FROM base) u
      |ORDER BY doc_id, canonical_url""".stripMargin

  private def textTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.tokenStats(Tables.documents(s, dir)).orderBy($"doc_id")
  }

  private val textTokensSql =
    """SELECT doc_id,
      | CAST(length(text) AS BIGINT) AS n_chars,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  private def textQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.qualityScore(Tables.documents(s, dir)).orderBy($"doc_id")
  }

  private val textQualitySql =
    """SELECT doc_id,
      | CAST(length(text) AS BIGINT) AS n_chars,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      | CAST((CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT)
      |   * 1000000000) // length(text) AS DOUBLE)/1e9 AS punct_ratio,
      | CAST((CAST(len(list_filter(string_split(text, ' '),
      |     t -> list_contains(['the','a','and','of','to'], t))) AS BIGINT)
      |   * 1000000000) // len(string_split(text, ' ')) AS DOUBLE)/1e9 AS stopword_ratio,
      | CAST((CAST(length(replace(text, ' ', '')) AS BIGINT)
      |   * 1000000000) // len(string_split(text, ' ')) AS DOUBLE)/1e9 AS mean_word_len
      |FROM documents ORDER BY doc_id""".stripMargin

  private def textLangid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.langId(Tables.documents(s, dir)).orderBy($"doc_id")
  }

  // Mirrors TA.langId exactly: per-language stopword hit counts, argmax
  // with first-profile-wins tie-break, 'und' when no profile hits.
  private val textLangidSql = {
    val hits = TA.LangProfiles.map { case (lang, prof) =>
      val set = prof.map(p => s"'$p'").mkString("[", ",", "]")
      s"len(list_filter(string_split(text,' '), t -> list_contains($set, t))) AS hits_$lang"
    }.mkString(",\n    ")
    val arms = TA.LangProfiles.map { case (lang, _) =>
      s"WHEN hits_$lang = best THEN '$lang'"
    }.mkString(" ")
    s"""WITH h AS (SELECT doc_id,
       |    $hits
       |  FROM documents),
       |b AS (SELECT *, greatest(${TA.LangProfiles.map(p => "hits_" + p._1).mkString(", ")}) AS best FROM h)
       |SELECT doc_id,
       |  CASE WHEN best = 0 THEN 'und' $arms ELSE 'und' END AS pred_lang,
       |  CAST(best AS BIGINT) AS score
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** Char-TRIGRAM language ID (r13 VERDICT #8 — langid beyond the
    * stopword toy): [[graft.operators.TextAnalysis.langIdNgram]]
    * scores character-trigram profiles over the lowercased text — no
    * tokenizer, morphology-aware (-ing/-ado/-cht), robust to the
    * concatenated/mangled text real crawls produce. Real-language
    * behavior (correct calls on genuine en/de/fr/es sentences, 'und'
    * on junk) is spec-pinned in LangIdNgramSpec; this gate pins the
    * exact per-doc arithmetic against the oracle's replay of the same
    * trigram extraction and argmax. Map-only in-scan CPU — the
    * trigram array never leaves the projection. */
  private def textLangidNgram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.langIdNgram(Tables.documents(s, dir)).orderBy($"doc_id")
  }

  private val textLangidNgramSql = {
    val hits = TA.CharProfiles.map { case (lang, prof) =>
      val set = prof.map(p => s"'$p'").mkString("[", ",", "]")
      s"len(list_filter(gs, x -> list_contains($set, x))) AS hits_$lang"
    }.mkString(",\n    ")
    val arms = TA.CharProfiles.map { case (lang, _) =>
      s"WHEN hits_$lang = best THEN '$lang'"
    }.mkString(" ")
    s"""WITH t0 AS (SELECT doc_id,
       |    translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
       |                    'abcdefghijklmnopqrstuvwxyz') AS t
       |  FROM documents),
       |g AS (SELECT doc_id,
       |    CASE WHEN length(t) < 3 THEN []::VARCHAR[]
       |      ELSE list_transform(range(1, length(t) - 1),
       |        i -> substring(t, CAST(i AS INT), 3)) END AS gs
       |  FROM t0),
       |h AS (SELECT doc_id,
       |    $hits
       |  FROM g),
       |b AS (SELECT *, greatest(${TA.CharProfiles.map(p => "hits_" + p._1).mkString(", ")}) AS best FROM h)
       |SELECT doc_id,
       |  CASE WHEN best = 0 THEN 'und' $arms ELSE 'und' END AS pred_lang,
       |  CAST(best AS BIGINT) AS score
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** LangID evaluation: confusion matrix of the n-gram-profile
    * heuristic's predictions against the gold lang column — the
    * quality readout that decides whether the cheap classifier is
    * good enough to gate corpus routing. On this synthetic corpus the
    * matrix exposes exactly what an eval should: every lang label
    * draws from the same English-like token distribution, so the
    * classifier reads 'en' (or 'und') regardless of the label — i.e.
    * the labels here are metadata, not linguistic signal. */
  private def langConfusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    TA.langId(docs)
      .join(docs.select($"doc_id", $"lang".as("actual_lang")), "doc_id")
      .groupBy($"actual_lang", $"pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("actual_lang", "pred_lang")
  }

  private val langConfusionSql = {
    val hits = TA.LangProfiles.map { case (lang, prof) =>
      val set = prof.map(p => s"'$p'").mkString("[", ",", "]")
      s"len(list_filter(string_split(text,' '), t -> list_contains($set, t))) AS hits_$lang"
    }.mkString(",\n    ")
    val arms = TA.LangProfiles.map { case (lang, _) =>
      s"WHEN hits_$lang = best THEN '$lang'"
    }.mkString(" ")
    s"""WITH h AS (SELECT doc_id, lang AS actual_lang,
       |    $hits
       |  FROM documents),
       |b AS (SELECT *, greatest(${TA.LangProfiles.map(p => "hits_" + p._1).mkString(", ")}) AS best FROM h),
       |p AS (SELECT actual_lang,
       |    CASE WHEN best = 0 THEN 'und' $arms ELSE 'und' END AS pred_lang FROM b)
       |SELECT actual_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
       |FROM p GROUP BY 1, 2 ORDER BY actual_lang, pred_lang""".stripMargin
  }

  private def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.fingerprint(Tables.documents(s, dir)).orderBy($"doc_id")
  }

  // Replays the native RollingHash expression's Horner recurrence
  // (base 257 mod 2^31-1 over code points) as a list_reduce fold.
  private val textFingerprintSql =
    """SELECT doc_id,
      | CASE WHEN length(text) = 0 THEN 0
      |   ELSE list_reduce(
      |     list_prepend(0::BIGINT,
      |       list_transform(string_split(text, ''), c -> unicode(c)::BIGINT)),
      |     (h, c) -> (h * 257 + c) % 2147483647)
      | END AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** TF-IDF top-5 terms per document — the classic MR "chained jobs"
    * showcase (tf, df, join, rank) as one Catalyst plan with a single
    * scan feeding both aggregations. */
  private def textTfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val tok = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
    val tf = tok.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    // df as a window over tf: each (doc, term) row is one distinct doc
    // for that term, so COUNT(*) per term partition == document
    // frequency. One explode+aggregate instead of two, no tf⋈df join.
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy($"term")))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = withDf.crossJoin(broadcast(total))
      .withColumn("tfidf", round($"tf" * log($"n_docs".cast("double") / $"df"), 9))
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"doc_id", $"term", $"rk", $"tfidf")
      .orderBy($"doc_id", $"rk")
  }

  private val textTfidfSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
      |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
      |total AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, tf.term AS term,
      |    ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 9) AS tfidf
      |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN total),
      |r AS (
      |  SELECT doc_id, term, tfidf,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      |  FROM scored)
      |SELECT doc_id, term, rk, tfidf FROM r WHERE rk <= 5
      |ORDER BY doc_id, rk""".stripMargin

  /** Per-label embedding centroid (exploded layout). Elements are
    * quantized to integer nano-units before summing: int64 sums are
    * exact and order-independent, so both engines produce identical
    * doubles (cross-partition float sums are order-dependent, and
    * giant-decimal→double casts are not correctly rounded in every
    * engine). */
  private def textLabelCentroid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"label", posexplode($"embedding").as(Seq("pos0", "v")))
      .select($"label", ($"pos0" + 1).as("pos"), $"v")
      .groupBy($"label", $"pos")
      .agg((sum(round($"v".cast("double") * 1e9).cast("long")).cast("double") / 1e9 / count(lit(1))).as("c"))
      .orderBy($"label", $"pos")
  }

  private val textLabelCentroidSql =
    """SELECT label, pos,
      | CAST(CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE)*1000000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000000.0/COUNT(*) AS c
      |FROM (SELECT label, unnest(embedding) AS v,
      |        unnest(range(1, len(embedding)+1)) AS pos FROM embeddings) t
      |GROUP BY label, pos ORDER BY label, pos""".stripMargin

  /** Deterministic hash-bucketed split assignment. The registered query
    * buckets on md5 (same hex on both engines → hash-verified); the
    * operator's default bucket hash is xxhash64 (faster, Spark-native —
    * determinism + ratio bounds spec-tested). */
  private def corpusSplits(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Corpus.assignSplits(
      Tables.documents(s, dir).select($"doc_id"),
      "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5),
      k => pmod(conv(substring(md5(k.cast("string")), 1, 8), 16, 10).cast("long"), lit(100L)))
      .orderBy($"doc_id")
  }

  private val corpusSplitsSql =
    """SELECT doc_id,
      | CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT doc_id,
      |        CAST('0x' || substring(md5(doc_id::VARCHAR), 1, 8) AS BIGINT) % 100 AS b
      |      FROM documents) t
      |ORDER BY doc_id""".stripMargin

  /** Greedy per-shard next-fit packing into 1024-token bins. The shard
    * is doc_id % 8 (pure key function) and packing order is doc_id, so
    * a recursive CTE re-derives the exact bin walk in the oracle. */
  private def corpusPack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Corpus.packGreedy(s, Tables.documents(s, dir), maxTokens = 1024, shards = 8)
      .toDF().orderBy($"doc_id")
  }

  private val corpusPackSql =
    """WITH RECURSIVE base AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(doc_id % 8 AS INTEGER) AS shard,
      |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
      |  FROM documents),
      |rec AS (
      |  SELECT doc_id, n_tokens, shard, rn, 0::BIGINT AS bin, n_tokens AS used
      |  FROM base WHERE rn = 1
      |  UNION ALL
      |  SELECT b.doc_id, b.n_tokens, b.shard, b.rn,
      |    CASE WHEN r.used + b.n_tokens > 1024 THEN r.bin + 1 ELSE r.bin END,
      |    CASE WHEN r.used + b.n_tokens > 1024 THEN b.n_tokens ELSE r.used + b.n_tokens END
      |  FROM rec r JOIN base b ON b.shard = r.shard AND b.rn = r.rn + 1)
      |SELECT doc_id, n_tokens, shard, bin FROM rec ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sampling: per-language keep rates (the
    * "rebalance the training mix" step). Membership is a pure function
    * of the key — md5 bucket < rate×100 — so the sample is stable
    * across runs/clusters and needs no global pass (embarrassingly
    * parallel filter in the scan, unlike orderBy-based sampling). */
  private def corpusSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = pmod(conv(substring(md5(concat(lit("smp:"), $"doc_id".cast("string"))),
      1, 8), 16, 10).cast("long"), lit(100L))
    val rate = when($"lang" === "en", 20L).otherwise(60L)
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", bucket.as("b"), rate.as("rate"))
      .filter($"b" < $"rate")
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  private val corpusSampleSql =
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substring(md5('smp:' || doc_id::VARCHAR), 1, 8) AS BIGINT) % 100 AS b,
      |    CASE WHEN lang = 'en' THEN 20 ELSE 60 END AS rate
      |  FROM documents) t
      |WHERE b < rate ORDER BY doc_id""".stripMargin

  /** Heavy hitters: tokens with frequency > n/50, found via the
    * Misra–Gries sketch (50 counters per task, k-entry merges — never a
    * full-dictionary shuffle) and then exact-counted with a second pass
    * over only the candidate set. The MG recall guarantee (every item
    * above n/k survives the sketch) is what makes this hash-verifiable
    * against the exact SQL derivation. */
  private def textHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hh = udaf(new graft.functions.HeavyHitters(50))
    val tokens = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("word"))
    // one scan yields BOTH the sketch and the total token count
    val cands = tokens.agg(hh($"word").as("cands"), count(lit(1)).as("n"))
      .select(explode($"cands").as("c"), $"n")
      .select($"c._1".as("word"), $"n")
    tokens.join(broadcast(cands), "word")
      .groupBy($"word", $"n")
      .agg(count(lit(1)).as("n_word"))
      .filter($"n_word" * 50 > $"n")
      .select($"word", $"n_word")
      .orderBy($"n_word".desc, $"word")
  }

  private val textHeavyHittersSql =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |tot AS (SELECT COUNT(*) AS n FROM tok),
      |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_word FROM tok GROUP BY word)
      |SELECT word, n_word FROM c CROSS JOIN tot WHERE n_word * 50 > n
      |ORDER BY n_word DESC, word""".stripMargin

  /** Bigram language-model counts: the n-gram statistics step of
    * classic LM pipelines (conditional counts per leading token). */
  private def textBigrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] as w1, ws[i+1] as w2))")).as("bg"))
      .groupBy($"bg.w1".as("w1"), $"bg.w2".as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"w1", $"w2")
      .limit(100)
  }

  private val textBigramsSql =
    """SELECT b['w1'] AS w1, b['w2'] AS w2, COUNT(*) AS n FROM (
      |  SELECT unnest(list_transform(range(1, len(ws)),
      |    i -> {'w1': ws[i], 'w2': ws[i+1]})) AS b
      |  FROM (SELECT string_split(text, ' ') AS ws FROM documents) t
      |  WHERE len(ws) >= 2) u
      |GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 100""".stripMargin

  // ------------------------------------------------------ text_pmi_bigrams

  /** Collocation mining: top bigrams by PMI-style LIFT — how much more
    * often the pair co-occurs than its unigram frequencies predict,
    * lift = c_xy·N / (c_x·c_y) — over bigrams with support ≥ 5 (the
    * support floor kills the hapax pairs whose lift is pure noise).
    * text_bigrams ranks by raw count; this ranks by association.
    *
    * Exactness: the true PMI takes a log, so the lift is kept as the
    * exact integer nano-ratio (c_xy·N·10^9) div (c_x·c_y) in
    * DECIMAL(38,0)/HUGEINT — monotone in PMI, hence identical ranking,
    * zero float ambiguity. Scale: two combinable groupBys (unigrams,
    * bigrams) + two joins of the supported-bigram table against the
    * vocabulary on the join key — AQE picks broadcast-vs-shuffle as
    * the vocabulary grows; the scalar N rides a broadcast crossJoin. */
  private def textPmiBigrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val toks = Tables.documents(s, dir).select(split($"text", " ").as("ws"))
    val uni = toks.select(explode($"ws").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum($"c").as("n"))
    val bg = toks.filter(size($"ws") >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] as w1, ws[i+1] as w2))")).as("bg"))
      .groupBy($"bg.w1".as("w1"), $"bg.w2".as("w2"))
      .agg(count(lit(1)).as("cxy"))
      .filter($"cxy" >= 5)
    bg.join(uni.select($"w".as("w1"), $"c".as("c1")), "w1")
      .join(uni.select($"w".as("w2"), $"c".as("c2")), "w2")
      .crossJoin(broadcast(tot))
      .select($"w1", $"w2", $"cxy",
        expr("(CAST(cxy AS DECIMAL(38,0)) * n * 1000000000) div (CAST(c1 AS DECIMAL(38,0)) * c2)")
          .cast("long").as("lift_nano"))
      .orderBy($"lift_nano".desc, $"w1", $"w2")
      .limit(50)
  }

  private val textPmiBigramsSql =
    """WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |uni AS (SELECT w, COUNT(*) AS c FROM (SELECT unnest(ws) AS w FROM t) GROUP BY w),
      |tot AS (SELECT SUM(c) AS n FROM uni),
      |bg AS (
      |  SELECT b['w1'] AS w1, b['w2'] AS w2, COUNT(*) AS cxy FROM (
      |    SELECT unnest(list_transform(range(1, len(ws)),
      |      i -> {'w1': ws[i], 'w2': ws[i+1]})) AS b
      |    FROM t WHERE len(ws) >= 2) u
      |  GROUP BY w1, w2 HAVING COUNT(*) >= 5)
      |SELECT w1, w2, cxy,
      |  CAST((CAST(cxy AS HUGEINT) * n * 1000000000) // (CAST(u1.c AS HUGEINT) * u2.c)
      |    AS BIGINT) AS lift_nano
      |FROM bg JOIN uni u1 ON bg.w1 = u1.w JOIN uni u2 ON bg.w2 = u2.w
      |CROSS JOIN tot
      |ORDER BY lift_nano DESC, w1, w2 LIMIT 50""".stripMargin

  /** Benchmark decontamination: docs sharing any word 3-gram with the
    * "benchmark" slice (doc_id % 97 == 0 stands in for an eval suite).
    * Real decontamination uses longer grams (8–13) — the synthetic
    * corpus' tiny vocabulary needs n=3 for a non-degenerate overlap;
    * n is a parameter of the operator. */
  private def textContamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    TA.contamination(
      corpus = docs.filter($"doc_id" % 97 =!= 0),
      benchmark = docs.filter($"doc_id" % 97 === 0),
      n = 3)
      .orderBy($"doc_id")
  }

  private val textContaminationSql =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(ws)-1),
      |          i -> array_to_string(ws[i:i+2], ' '))) AS gram
      |      FROM ws WHERE len(ws) >= 3),
      |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
      |c AS (SELECT doc_id, gram FROM g WHERE doc_id % 97 <> 0)
      |SELECT doc_id, CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_hits
      |FROM c JOIN b USING (gram)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition quality signals — zero-shuffle (pure
    * per-document functions evaluated inside the scan). */
  private def textRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.repetitionStats(Tables.documents(s, dir)).orderBy($"doc_id")
  }

  private val textRepetitionSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, ws,
      |        list_transform(range(1, len(ws)),   i -> array_to_string(ws[i:i+1], ' ')) AS g2,
      |        list_transform(range(1, len(ws)-1), i -> array_to_string(ws[i:i+2], ' ')) AS g3
      |      FROM t)
      |SELECT doc_id,
      |  CAST((CAST(list_max(list_transform(list_distinct(ws),
      |      x -> len(list_filter(ws, y -> y = x)))) AS BIGINT) * 1000000000)
      |    // len(ws) AS DOUBLE)/1e9 AS top_word_frac,
      |  CASE WHEN len(g2) > 0
      |    THEN CAST((CAST(len(g2) - len(list_distinct(g2)) AS BIGINT) * 1000000000)
      |      // len(g2) AS DOUBLE)/1e9
      |    ELSE 0.0 END AS dup_2gram_frac,
      |  CASE WHEN len(g3) > 0
      |    THEN CAST((CAST(len(g3) - len(list_distinct(g3)) AS BIGINT) * 1000000000)
      |      // len(g3) AS DOUBLE)/1e9
      |    ELSE 0.0 END AS dup_3gram_frac
      |FROM g ORDER BY doc_id""".stripMargin

  /** corpus_chunk — 32-token chunks with 8-token overlap (stride 24).
    * The oracle replays the same arithmetic with generate_series +
    * list slicing; both sides 1-index the slice and truncate the tail
    * chunk, so text and counts hash-match exactly. */
  private def corpusChunk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.chunk(Tables.documents(s, dir), width = 32, overlap = 8)
      .orderBy($"doc_id", $"chunk_id")
  }

  private val corpusChunkSql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (
      |  SELECT doc_id, toks, len(toks) AS n_tok,
      |    unnest(generate_series(0, GREATEST(len(toks) - 1, 0), 24)) AS start
      |  FROM t)
      |SELECT doc_id,
      |  CAST(start // 24 AS BIGINT) AS chunk_id,
      |  array_to_string(toks[start + 1 : start + 32], ' ') AS chunk,
      |  CAST(LEAST(32, n_tok - start) AS BIGINT) AS chunk_tokens
      |FROM s ORDER BY doc_id, chunk_id""".stripMargin

  /** Fractional-epoch upsampling — the pretraining data-recipe op
    * ("wiki at 2.5 epochs, web at 1.0"): each doc emits its whole
    * copies plus a deterministic hash-sampled extra copy for the
    * fractional remainder (epochs 2.5 → copies 0,1 always; copy 2
    * iff md5 bucket < 50). All-integer epoch percents, so the
    * fraction cut is exact on both engines; membership is a pure
    * function of (doc_id, copy) — stable across runs/clusters, no
    * global pass. Scale shape: sequence-explode inside the scan,
    * map-only, zero shuffles before the output sort. */
  private def corpusUpsample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pct = (lit(100L) +
      (substring($"source", 4, 10).cast("long") % 4) * 75L).as("pct") // 1.0/1.75/2.5/3.25 epochs
    val bucket = pmod(conv(substring(md5(concat(
      lit("up:"), $"doc_id".cast("string"), lit(":"), $"copy".cast("string"))),
      1, 8), 16, 10).cast("long"), lit(100L))
    Tables.documents(s, dir)
      .select($"doc_id", $"source", pct)
      .select($"doc_id", $"source", $"pct",
        floor($"pct" / 100).cast("long").as("full_copies"),
        pmod($"pct", lit(100L)).as("frac_pct"))
      .select($"doc_id", $"source", $"full_copies", $"frac_pct",
        explode(sequence(lit(0L),
          $"full_copies" + when($"frac_pct" > 0, 1L).otherwise(0L) - 1)).as("copy"))
      .filter($"copy" < $"full_copies" || bucket < $"frac_pct")
      .select($"doc_id", $"source", $"copy")
      .orderBy($"doc_id", $"copy")
  }

  private val corpusUpsampleSql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    100 + (CAST(substring(source, 4) AS BIGINT) % 4) * 75 AS pct
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, source, pct // 100 AS full_copies, pct % 100 AS frac_pct,
      |    UNNEST(range(0, pct // 100 + CASE WHEN pct % 100 > 0 THEN 1 ELSE 0 END)) AS copy
      |  FROM d)
      |SELECT doc_id, source, copy FROM e
      |WHERE copy < full_copies
      |   OR CAST('0x' || substring(md5('up:' || doc_id::VARCHAR || ':' || copy::VARCHAR), 1, 8) AS BIGINT) % 100 < frac_pct
      |ORDER BY doc_id, copy""".stripMargin

  /** fastText-style hashed linear quality classifier (Joulin et al.
    * 2016 / the DCLM-pipeline filter shape): features are unigrams +
    * word bigrams, each feature hashes straight to a milli-weight in
    * [-1000, 1000] (md5-derived — the stand-in for a trained,
    * feature-hashed weight vector; a real model swaps the hash for a
    * broadcast lookup of the same shape), a doc scores the mean
    * feature weight through a sigmoid. Map-only over the corpus — the
    * groupBy key is doc_id, which partial aggregation collapses
    * in-scan, so model application adds ZERO shuffled bytes at 100 TB.
    * Integer weight sums; the only floats are the final per-doc mean
    * and sigmoid, rounded to 9dp. */
  private def textClassifierScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(concat($"ws", expr(
        """CASE WHEN size(ws) > 1
          | THEN transform(sequence(1, size(ws) - 1),
          |   i -> concat(element_at(ws, i), '_', element_at(ws, i + 1)))
          | ELSE CAST(array() AS array<string>) END""".stripMargin))).as("f"))
    feats
      .select($"doc_id",
        ((conv(substring(md5($"f"), 1, 15), 16, 10).cast("long") % 2001L) - 1000L).as("w"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_feat"), sum($"w").as("w_sum"))
      .select($"doc_id", $"n_feat",
        round(lit(1.0) / (lit(1.0) +
          exp(-($"w_sum".cast("double") / (lit(1000.0) * $"n_feat")))), 9).as("score"),
        when($"w_sum" > 0, 1L).otherwise(0L).as("keep"))
      .orderBy($"doc_id")
  }

  private val textClassifierScoreSql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |feats AS (
      |  SELECT doc_id, unnest(list_concat(ws,
      |    CASE WHEN len(ws) > 1
      |      THEN list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1])
      |      ELSE []::VARCHAR[] END)) AS f
      |  FROM tok),
      |w AS (SELECT doc_id,
      |    (CAST('0x' || substring(md5(f), 1, 15) AS BIGINT) % 2001) - 1000 AS w
      |  FROM feats),
      |agg AS (SELECT doc_id, COUNT(*) AS n_feat, SUM(w) AS w_sum
      |        FROM w GROUP BY doc_id)
      |SELECT doc_id, CAST(n_feat AS BIGINT) AS n_feat,
      |  ROUND(1.0 / (1.0 + EXP(-(CAST(w_sum AS DOUBLE) / (1000.0 * n_feat)))), 9) AS score,
      |  CAST(CASE WHEN w_sum > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM agg ORDER BY doc_id""".stripMargin

  /** TRAINED quality classifier (r13 VERDICT #6 — the FineWeb-edu
    * distillation loop closed): a TEACHER quality rule labels the
    * corpus (stopword-density: y = 1 when the 'a'/'the' per-mille
    * ratio is under 61 — the Gopher-style heuristic a pipeline can
    * afford on every doc), and a STUDENT — hashed-unigram logistic
    * regression over 256 buckets — is fit to imitate it by 4 rounds
    * of exact-integer batch gradient descent on the non-held-out
    * docs, then the held-out slice (doc_id % 5 = 4) is scored with
    * the LEARNED weights (92% held-out agreement vs a 50% majority
    * floor at sf0.01). The whole GD trajectory is fixed-point
    * (per-mille features, micro-unit probabilities, hard-sigmoid
    * link, truncating division), so the DuckDB oracle replays
    * training as an unrolled CTE chain and every weight — and
    * therefore every held-out score — must match bit-for-bit (the
    * events_markov_attribution discipline). Separability is
    * spec-pinned on planted data (ClassifierSpec); the gate pins the
    * arithmetic. Scale shape: see [[graft.operators.Classifier]]. */
  private def textClassifierTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = split($"text", " ")
    val stop = size(org.apache.spark.sql.functions.filter(toks,
      t => t === "a" || t === "the")).cast("long")
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"text",
        when(stop * 1000L < size(toks).cast("long") * 61L, 1L)
          .otherwise(0L).as("label"))
    graft.operators.Classifier.trainAndScore(s, docs,
      nBuckets = 256, iters = 4, evalMod = 5, evalRem = 4, damp = 128L)
  }

  private val textClassifierTrainSql: String = {
    val K = 256; val T = 4
    // truncating (toward-zero) division: DuckDB's // truncates like
    // Java, but spell it sign-safely so the parity does not hang on
    // an engine's rounding mode
    def tdiv(a: String, b: String) =
      s"(CASE WHEN ($a) >= 0 THEN ($a) // ($b) ELSE -((-($a)) // ($b)) END)"
    val iterations = (0 until T).map { t =>
      s"""z$t AS (SELECT xf.doc_id, SUM(w$t.w * xf.c) AS z
         |  FROM xf JOIN w$t USING (k) WHERE xf.doc_id % 5 <> 4 GROUP BY 1),
         |e$t AS (SELECT z$t.doc_id,
         |    GREATEST(0, LEAST(1000000, 500000 + ${tdiv("z", "4000")})) - y * 1000000 AS err
         |  FROM z$t JOIN lab ON z$t.doc_id = lab.doc_id),
         |g$t AS (SELECT xf.k, SUM(e$t.err * xf.c) AS g
         |  FROM xf JOIN e$t ON xf.doc_id = e$t.doc_id GROUP BY 1),
         |w${t + 1} AS (SELECT w$t.k, w$t.w - ${tdiv("COALESCE(g, 0)", "n * 128")} AS w
         |  FROM w$t LEFT JOIN g$t ON w$t.k = g$t.k CROSS JOIN n)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS f FROM documents),
       |tt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tot,
       |    CAST(SUM(CASE WHEN f IN ('a', 'the') THEN 1 ELSE 0 END) AS BIGINT) AS s
       |  FROM tok GROUP BY 1),
       |cnt AS (SELECT doc_id,
       |    CAST('0x' || substring(md5(f), 1, 15) AS BIGINT) % $K AS k,
       |    CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
       |xf AS (SELECT cnt.doc_id, k, (c * 1000) // tot AS c
       |    FROM cnt JOIN tt ON cnt.doc_id = tt.doc_id
       |  UNION ALL SELECT doc_id, $K, 1000 FROM documents),
       |lab AS (SELECT doc_id, CASE WHEN s * 1000 < 61 * tot THEN 1 ELSE 0 END AS y FROM tt),
       |n AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id % 5 <> 4),
       |w0 AS (SELECT CAST(t.k AS BIGINT) AS k, CAST(0 AS BIGINT) AS w FROM range(0, ${K + 1}) t(k)),
       |$iterations,
       |ze AS (SELECT xf.doc_id, SUM(w$T.w * xf.c) AS z
       |  FROM xf JOIN w$T USING (k) WHERE xf.doc_id % 5 = 4 GROUP BY 1),
       |pe AS (SELECT doc_id, GREATEST(0, LEAST(1000000, 500000 + ${tdiv("z", "4000")})) AS p_micro FROM ze)
       |SELECT pe.doc_id AS doc_id, CAST(y AS BIGINT) AS label,
       |  CAST(p_micro AS BIGINT) AS p_micro,
       |  CAST(CASE WHEN p_micro >= 500000 THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM pe JOIN lab ON pe.doc_id = lab.doc_id ORDER BY doc_id""".stripMargin
  }

  /** Training-shard writer manifest: a deterministic md5-order global
    * shuffle assigns every doc a shard (h mod 8), a position, and the
    * byte offset where its text lands in that shard's file — the
    * planning table for packing a curated corpus into N shard files.
    * Scale shape: position/offset are DISTRIBUTED prefix sums — the
    * 60-bit hash is uniform, so its top 5 bits give 32 fixed range
    * buckets per shard; per-(shard, bucket) counts/byte totals roll
    * into a 256-row broadcast offset table and the only windows run
    * within (shard, bucket) — 256-way parallel, no single-partition
    * exchange (the q_gini two-pass-rank machinery, minus the
    * percentile pass the uniform hash makes unnecessary). */
  private def corpusShardManifest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nShards = 8
    val docs = Tables.documents(s, dir).select($"doc_id", $"n_chars")
      .withColumn("h",
        conv(substring(md5($"doc_id".cast("string")), 1, 15), 16, 10).cast("long"))
      .withColumn("shard", $"h" % nShards)
      .withColumn("b", shiftright($"h", 55))
    val wOff = Window.partitionBy($"shard").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = docs.groupBy($"shard", $"b")
      .agg(count(lit(1)).as("cnt"), sum($"n_chars").as("bytes"))
      .withColumn("pos_off", coalesce(sum($"cnt").over(wOff), lit(0L)))
      .withColumn("byte_off", coalesce(sum($"bytes").over(wOff), lit(0L)))
      .select($"shard", $"b", $"pos_off", $"byte_off")
    val w = Window.partitionBy($"shard", $"b").orderBy($"h", $"doc_id")
    docs.join(broadcast(offs), Seq("shard", "b"))
      .withColumn("pos", row_number().over(w).cast("long") + $"pos_off")
      .withColumn("byte_start", $"byte_off" + coalesce(
        sum($"n_chars").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"shard", $"pos", $"byte_start")
      .orderBy($"shard", $"pos")
  }

  // Bucket b = h >> 55 is a prefix of h, so (b, h) order == h order:
  // the plain per-shard window below is value-identical to the
  // bucketed two-pass form the Spark side runs.
  private val corpusShardManifestSql =
    """WITH h AS (
      |  SELECT doc_id, n_chars,
      |    CAST('0x' || substring(md5(doc_id::VARCHAR), 1, 15) AS BIGINT) AS h
      |  FROM documents)
      |SELECT doc_id, h % 8 AS shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos,
      |  CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY h % 8 ORDER BY h, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS byte_start
      |FROM h ORDER BY shard, pos""".stripMargin

  /** BPE tokenizer TRAINING (Sennrich et al. 2016), 10 merge steps —
    * the iterative vocabulary-learning loop `text_bpe_pairs` only does
    * one round of: words become char sequences, each step counts
    * adjacent symbol pairs weighted by word frequency, merges the
    * argmax pair corpus-wide (ties: lexicographic), and rewrites the
    * sequences. Merged symbols join with '~' so later steps merge
    * merged symbols (step 6 learns m~e~r on this corpus).
    *
    * Scale shape: the corpus is touched ONCE (the word-count
    * aggregate); all 10 iterations run over the VOCABULARY-sized
    * sequence table — exactly how production BPE trainers work — with
    * one bounded argmax row to the driver per step and localCheckpoint
    * truncating per-step lineage. The sequence rewrite is a literal
    * left-to-right non-overlapping string replace, whose adjacency
    * semantics (a consumed separator can't serve the next overlapping
    * occurrence) match BPE's greedy merge and are identical in Spark's
    * regexp_replace (Pattern.quote'd) and DuckDB's replace. */
  /** The shared BPE training chain: returns the learned merges AND the
    * final vocabulary state (w, merged seq, c) — `text_bpe_train`
    * reads the merges, `text_bpe_fertility` applies the final state
    * back to the corpus. */
  private[graft] def bpeChain(s: SparkSession, dir: String, steps: Int)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    import s.implicits._
    val wc = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("c"))
    var seqs = wc.select($"w", concat_ws(" ", split($"w", "")).as("seq"), $"c")
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (step <- 1 to steps) {
      // bounded driver round-trip: ONE (pa, pb, cnt) row per step
      val top = seqs.select(split($"seq", " ").as("ws"), $"c")
        .filter(size($"ws") >= 2)
        .select($"c", explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> struct(element_at(ws, i) AS pa, element_at(ws, i + 1) AS pb))")).as("p"))
        .groupBy($"p.pa".as("pa"), $"p.pb".as("pb"))
        .agg(sum($"c").as("cnt"))
        .orderBy($"cnt".desc, $"pa", $"pb").limit(1).head()
      val (pa, pb, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((step.toLong, pa, pb, cnt))
      seqs = seqs.select($"w",
        trim(regexp_replace(concat(lit(" "), $"seq", lit(" ")),
          java.util.regex.Pattern.quote(s" $pa $pb "),
          java.util.regex.Matcher.quoteReplacement(s" $pa~$pb ")), " ").as("seq"),
        $"c").localCheckpoint()
    }
    (seqs, merges.toSeq)
  }

  /** Tokenizer-vocabulary coverage on a HELD-OUT split: the word
    * vocabulary is built from the training split (doc_id % 10 != 0)
    * and every held-out doc reports its out-of-vocabulary word count
    * and exact ppb OOV rate — the eval that catches a vocab trained on
    * the wrong mix before it ships. Corpus-side work is one explode +
    * one hash join against the (bounded, distinct-word) vocabulary;
    * at 100 TB AQE picks broadcast vs shuffle as the vocab grows. */
  private def textOovRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val vocab = docs.filter($"doc_id" % 10 =!= 0)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .distinct()
      .withColumn("iv", lit(1L))
    docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .join(vocab, Seq("w"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(when($"iv".isNull, 1L).otherwise(0L)).as("n_oov"))
      .select($"doc_id", $"n_words", $"n_oov",
        expr("(n_oov * 1000000000L) div n_words").as("oov_ppb"))
      .orderBy($"doc_id")
  }

  private val textOovRateSql =
    """WITH v AS (
      |  SELECT DISTINCT w FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents
      |    WHERE doc_id % 10 <> 0) t WHERE length(w) > 0),
      |hw AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      |    WHERE doc_id % 10 = 0) t WHERE length(w) > 0)
      |SELECT doc_id, COUNT(*) AS n_words,
      |  CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST((SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000000000)
      |    // COUNT(*) AS BIGINT) AS oov_ppb
      |FROM hw LEFT JOIN v ON hw.w = v.w
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private def textBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, merges) = bpeChain(s, dir, steps = 10)
    s.createDataFrame(merges.map { case (step, pa, pb, cnt) =>
      (step, s"$pa~$pb", cnt)
    }).toDF("step", "pair", "cnt").orderBy($"step")
  }

  /** Tokenizer fertility: apply the 10 learned merges back to the
    * corpus and report per-doc symbols-before vs tokens-after — the
    * chars-per-token compression readout that decides whether a
    * learned vocab is worth shipping. The apply runs on the
    * VOCABULARY (the train chain's final state), never per word
    * instance; docs then join their words to the vocab's token counts
    * — at 100 TB the corpus-side work is one explode + one hash join
    * on the word, with the merged vocab state vocabulary-sized. */
  private def textBpeFertility(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (vocab, _) = bpeChain(s, dir, steps = 10)
    val tok = vocab.select($"w",
      length($"w").cast("long").as("n_sym"),
      size(split($"seq", " ")).cast("long").as("n_tok"))
    Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .join(tok, "w")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"), sum($"n_sym").as("n_chars"),
        sum($"n_tok").as("n_tokens"))
      .select($"doc_id", $"n_words", $"n_chars", $"n_tokens",
        // exact ppb integer ratio — immune to cross-engine double-rounding
        // drift (the r8 driver-hash lesson; same pattern as graph_jaccard_links)
        expr("(n_chars * 1000000000L) div n_tokens").as("chars_per_token_ppb"))
      .orderBy($"doc_id")
  }

  private val textBpeFertilitySql = {
    val step = (i: Int) =>
      s"""p$i AS (SELECT ws[i] AS pa, ws[i+1] AS pb, SUM(c) AS cnt
         |  FROM (SELECT string_split(seq, ' ') AS ws, c FROM s$i) t,
         |       unnest(generate_series(1, len(t.ws) - 1)) u(i)
         |  GROUP BY 1, 2),
         |m${i + 1} AS (SELECT pa, pb FROM p$i ORDER BY cnt DESC, pa, pb LIMIT 1),
         |s${i + 1} AS (SELECT w, trim(replace(' '||seq||' ', ' '||pa||' '||pb||' ',
         |    ' '||pa||'~'||pb||' ')) AS seq, c FROM s$i, m${i + 1})""".stripMargin
    s"""WITH wc AS (SELECT w, COUNT(*) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |s0 AS (SELECT w, array_to_string(string_split(w, ''), ' ') AS seq, c FROM wc),
       |${(0 until 10).map(step).mkString(",\n")},
       |tok AS (SELECT w, CAST(len(w) AS BIGINT) AS n_sym,
       |    CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tok FROM s10),
       |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(n_sym) AS BIGINT) AS n_chars,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  CAST((SUM(n_sym) * 1000000000) // SUM(n_tok) AS BIGINT) AS chars_per_token_ppb
       |FROM dw JOIN tok USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private val textBpeTrainSql = {
    val step = (i: Int) =>
      s"""p$i AS (SELECT ws[i] AS pa, ws[i+1] AS pb, SUM(c) AS cnt
         |  FROM (SELECT string_split(seq, ' ') AS ws, c FROM s$i) t,
         |       unnest(generate_series(1, len(t.ws) - 1)) u(i)
         |  GROUP BY 1, 2),
         |m${i + 1} AS (SELECT pa, pb, cnt FROM p$i ORDER BY cnt DESC, pa, pb LIMIT 1),
         |s${i + 1} AS (SELECT trim(replace(' '||seq||' ', ' '||pa||' '||pb||' ',
         |    ' '||pa||'~'||pb||' ')) AS seq, c FROM s$i, m${i + 1})""".stripMargin
    s"""WITH wc AS (SELECT w, COUNT(*) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |s0 AS (SELECT array_to_string(string_split(w, ''), ' ') AS seq, c FROM wc),
       |${(0 until 10).map(step).mkString(",\n")}
       |${(1 to 10).map(i =>
          s"SELECT CAST($i AS BIGINT) AS step, pa||'~'||pb AS pair, CAST(cnt AS BIGINT) AS cnt FROM m$i")
         .mkString("\nUNION ALL ")}
       |ORDER BY step""".stripMargin
  }

  /** Per-doc BPE ENCODE — the tokenizer actually applied: the learned
    * 10-merge vocabulary turns every document into its token-ID
    * sequence (ids over the final symbol vocabulary, lexicographic),
    * emitted as the id string + token count for a bounded doc set,
    * with an ALL-corpus reconciliation against the fertility readout
    * required in-code (a dropped word, a misordered flatten, or a
    * broken id join all fail before anything is emitted).
    *
    * Scale shape: the merge table is applied ONCE, on the
    * vocabulary-sized final state (never per word instance — greedy
    * merges per word are bounded by word length and already paid by
    * the training chain); docs then hash-join their words to the
    * per-word id arrays (vocab side broadcast by AQE when small) and
    * flatten in word order — corpus-side work is one posexplode + one
    * join + one per-doc aggregation, no iteration. */
  /** The frozen tokenizer artifacts shared by encode, decode and the
    * round-trip gate — ONE implementation so the decoder can never
    * desynchronize from the encoder's id assignment:
    * `tokIds(tok, tid)` — distinct final symbols, ids lexicographic
    * (a bounded vocabulary-sized global window, exactly how a shipped
    * tokenizer freezes its vocab file) — and `wordTids(w, j, tid)` —
    * each distinct word's token-id sequence, encoded once on the
    * vocabulary. */
  private def bpeIdTables(s: SparkSession, state: DataFrame): (DataFrame, DataFrame) = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tokIds = state.select(explode(split($"seq", " ")).as("tok")).distinct()
      .withColumn("tid", row_number().over(Window.orderBy($"tok")).cast("long"))
    val wordTids = state
      .select($"w", posexplode(split($"seq", " ")).as(Seq("j", "tok")))
      .join(tokIds, "tok")
      .select($"w", $"j", $"tid")
    (tokIds, wordTids)
  }

  /** (doc_id, pos, w): the corpus exploded to position-stamped words —
    * the document side every BPE apply/decode pass joins against. */
  private def bpeDocWords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .filter(length($"w") > 0)
  }

  private def textBpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (state, _) = bpeChain(s, dir, steps = 10)
    val (_, wordTids) = bpeIdTables(s, state)
    // per-WORD id arrays (vocab-sized): each distinct word encodes once
    val wordIds = wordTids
      .groupBy($"w")
      .agg(expr("transform(array_sort(collect_list(struct(j, tid))), x -> x.tid)")
        .as("ids"))
    val dw = bpeDocWords(s, dir)
    val encoded = dw.join(wordIds, "w")
      .groupBy($"doc_id")
      .agg(flatten(
        expr("transform(array_sort(collect_list(struct(pos, ids))), x -> x.ids)"))
        .as("tids"))
    // reconcile with the fertility readout over the WHOLE corpus: the
    // flattened id count must equal the vocab-state token sum per doc
    val expected = dw
      .join(state.select($"w", size(split($"seq", " ")).cast("long").as("n_tok")), "w")
      .groupBy($"doc_id").agg(sum($"n_tok").as("n_expected"))
    val bad = encoded.join(expected, "doc_id")
      .filter(size($"tids").cast("long") =!= $"n_expected").count()
    require(bad == 0, s"BPE encode dropped/duplicated tokens in $bad docs")
    encoded.filter($"doc_id" < 50)
      .select($"doc_id", size($"tids").cast("long").as("n_tokens"),
        concat_ws("-", expr("transform(tids, t -> cast(t AS string))")).as("ids"))
      .orderBy($"doc_id")
  }

  private val textBpeEncodeSql = {
    val step = (i: Int) =>
      s"""p$i AS (SELECT ws[i] AS pa, ws[i+1] AS pb, SUM(c) AS cnt
         |  FROM (SELECT string_split(seq, ' ') AS ws, c FROM s$i) t,
         |       unnest(generate_series(1, len(t.ws) - 1)) u(i)
         |  GROUP BY 1, 2),
         |m${i + 1} AS (SELECT pa, pb FROM p$i ORDER BY cnt DESC, pa, pb LIMIT 1),
         |s${i + 1} AS (SELECT w, trim(replace(' '||seq||' ', ' '||pa||' '||pb||' ',
         |    ' '||pa||'~'||pb||' ')) AS seq, c FROM s$i, m${i + 1})""".stripMargin
    s"""WITH wc AS (SELECT w, COUNT(*) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |s0 AS (SELECT w, array_to_string(string_split(w, ''), ' ') AS seq, c FROM wc),
       |${(0 until 10).map(step).mkString(",\n")},
       |tid AS (SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY tok) AS BIGINT) AS tid
       |  FROM (SELECT DISTINCT unnest(string_split(seq, ' ')) AS tok FROM s10) t),
       |wt AS (SELECT w, ts[j] AS tok, j
       |  FROM (SELECT w, string_split(seq, ' ') AS ts FROM s10) t,
       |       unnest(generate_series(1, len(t.ts))) u(j)),
       |wid AS (SELECT w, j, tid FROM wt JOIN tid USING (tok)),
       |dw AS (SELECT doc_id, ws[i] AS w, i AS pos
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |        WHERE doc_id < 50) t,
       |       unnest(generate_series(1, len(t.ws))) u(i)
       |  WHERE len(ws[i]) > 0)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(tid AS VARCHAR), '-' ORDER BY pos, j) AS ids
       |FROM dw JOIN wid USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** BPE token PACKING — the last step of pretraining data prep: the
    * whole corpus is tokenized with the learned 10-merge vocabulary,
    * docs are concatenated in doc_id order with an EOS token (id 0 —
    * reserved by construction, real ids start at 1) after each, and
    * the global token stream is chunked into fixed 128-token training
    * sequences. Every sequence is emitted with its token count and the
    * md5 of its exact id string — a misplaced boundary, a lost EOS, a
    * broken offset, or any out-of-order flatten breaks the hash.
    * In-code requires pin the packing invariants: every sequence but
    * the last is exactly full, and the sequence count equals
    * ceil(total/128).
    *
    * Scale shape: token ids come from the vocabulary-sized id tables
    * (the frozen-tokenizer contract shared with encode/decode); the
    * corpus pays one explode + two hash joins + per-doc windows. The
    * ONLY global pass is the doc-offset prefix sum — a window over the
    * doc-count-sized per-doc totals (one row per document, never per
    * token); at extreme doc counts that single-partition prefix sum is
    * the known bottleneck and splits into the standard two-phase
    * (per-partition partials + broadcast cumulative) form without
    * changing results. Sequence assembly is a groupBy whose groups are
    * 128-bounded. */
  private def corpusBpePack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val SeqLen = 128L
    val (state, _) = bpeChain(s, dir, steps = 10)
    val (_, wordTids) = bpeIdTables(s, state)
    val nTokPerWord = state.select($"w",
      size(split($"seq", " ")).cast("long").as("n_tok"))
    val dw = bpeDocWords(s, dir)
    val docTok = dw.join(nTokPerWord, "w")
      .groupBy($"doc_id").agg(sum($"n_tok").as("n_doc"))
    // doc offsets: prefix sum over ONE ROW PER DOC (+1 per doc = EOS)
    val docOff = docTok.withColumn("off",
      coalesce(sum($"n_doc" + 1L).over(Window.orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // word offsets inside each doc: per-doc window, doc-bounded
    val wordOff = dw.join(nTokPerWord, "w")
      .withColumn("woff", coalesce(sum($"n_tok").over(
        Window.partitionBy($"doc_id").orderBy($"pos")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val real = wordOff.join(docOff.select($"doc_id", $"off"), "doc_id")
      .join(wordTids, "w")
      .select(($"off" + $"woff" + $"j").as("idx"), $"tid")
    val eos = docOff.select(($"off" + $"n_doc").as("idx"), lit(0L).as("tid"))
    val packed = real.unionByName(eos)
      .withColumn("seq_id", expr(s"idx div $SeqLen"))
      .groupBy($"seq_id")
      .agg(count(lit(1)).as("n_tokens"),
        md5(concat_ws("-", expr(
          "transform(array_sort(collect_list(struct(idx, tid))), " +
            "x -> cast(x.tid AS string))"))).as("ids_md5"))
      .localCheckpoint()
    // packing invariants: ceil(total/128) sequences, all full but the last
    val total = docTok.agg(sum($"n_doc" + 1L)).as[Long].head()
    val nSeqs = packed.count()
    require(nSeqs == (total + SeqLen - 1) / SeqLen,
      s"packed $nSeqs sequences from $total tokens — boundaries drifted")
    val maxSeq = nSeqs - 1
    val short = packed.filter($"n_tokens" =!= SeqLen && $"seq_id" =!= maxSeq).count()
    require(short == 0, s"$short non-final sequences are not exactly full")
    packed.orderBy($"seq_id")
  }

  private val corpusBpePackSql = {
    val step = (i: Int) =>
      s"""p$i AS (SELECT ws[i] AS pa, ws[i+1] AS pb, SUM(c) AS cnt
         |  FROM (SELECT string_split(seq, ' ') AS ws, c FROM s$i) t,
         |       unnest(generate_series(1, len(t.ws) - 1)) u(i)
         |  GROUP BY 1, 2),
         |m${i + 1} AS (SELECT pa, pb FROM p$i ORDER BY cnt DESC, pa, pb LIMIT 1),
         |s${i + 1} AS (SELECT w, trim(replace(' '||seq||' ', ' '||pa||' '||pb||' ',
         |    ' '||pa||'~'||pb||' ')) AS seq, c FROM s$i, m${i + 1})""".stripMargin
    s"""WITH wc AS (SELECT w, COUNT(*) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |s0 AS (SELECT w, array_to_string(string_split(w, ''), ' ') AS seq, c FROM wc),
       |${(0 until 10).map(step).mkString(",\n")},
       |tid AS (SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY tok) AS BIGINT) AS tid
       |  FROM (SELECT DISTINCT unnest(string_split(seq, ' ')) AS tok FROM s10) t),
       |wt AS (SELECT w, ts[j] AS tok, j
       |  FROM (SELECT w, string_split(seq, ' ') AS ts FROM s10) t,
       |       unnest(generate_series(1, len(t.ts))) u(j)),
       |wid AS (SELECT w, j, tid FROM wt JOIN tid USING (tok)),
       |nt AS (SELECT w, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tok FROM s10),
       |dw AS (SELECT doc_id, ws[i] AS w, i AS pos
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
       |       unnest(generate_series(1, len(t.ws))) u(i)
       |  WHERE len(ws[i]) > 0),
       |dt AS (SELECT doc_id, SUM(n_tok) AS n_doc
       |  FROM dw JOIN nt USING (w) GROUP BY doc_id),
       |doff AS (SELECT doc_id, n_doc,
       |    COALESCE(SUM(n_doc + 1) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM dt),
       |woff AS (SELECT dw.doc_id, dw.pos, dw.w,
       |    COALESCE(SUM(n_tok) OVER (PARTITION BY dw.doc_id ORDER BY dw.pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS woff
       |  FROM dw JOIN nt USING (w)),
       |real AS (SELECT doff.off + woff.woff + wid.j - 1 AS idx, wid.tid
       |  FROM woff JOIN doff USING (doc_id) JOIN wid ON wid.w = woff.w),
       |eos AS (SELECT off + n_doc AS idx, CAST(0 AS BIGINT) AS tid FROM doff),
       |stream AS (SELECT * FROM real UNION ALL SELECT * FROM eos)
       |SELECT CAST(idx // 128 AS BIGINT) AS seq_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  md5(string_agg(CAST(tid AS VARCHAR), '-' ORDER BY idx)) AS ids_md5
       |FROM stream GROUP BY 1 ORDER BY seq_id""".stripMargin
  }

  /** BPE round-trip — DECODE closes the tokenizer loop: every doc is
    * encoded to token ids and decoded back THROUGH the id table
    * (tid → symbol → merge-marker strip → word → space-joined text),
    * and the reconstruction's md5 must equal the original text's md5
    * for EVERY document — the losslessness contract a tokenizer ships
    * under. The oracle only hashes the original text: any drift in
    * the id table, the per-word symbol order, the marker stripping,
    * or the word-order flatten breaks the hash. Scale shape: decode
    * runs on the VOCABULARY (ids → word string once per distinct
    * word); docs pay one posexplode + one hash join + one ordered
    * per-doc concat — same O(corpus) profile as the encode. */
  private def textBpeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (state, _) = bpeChain(s, dir, steps = 10)
    // the SAME frozen id tables the encoder uses ([[bpeIdTables]]) —
    // then decode STRICTLY through tid
    val (tokIds, wordTids) = bpeIdTables(s, state)
    val decodedWords = wordTids
      .join(tokIds.select($"tid", $"tok".as("tok_dec")), "tid")
      .groupBy($"w")
      .agg(concat_ws("", expr(
        "transform(array_sort(collect_list(struct(j, tok_dec))), " +
          "x -> replace(x.tok_dec, '~', ''))")).as("w_dec"))
    val dw = bpeDocWords(s, dir)
    dw.join(decodedWords, "w")
      .groupBy($"doc_id")
      .agg(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(pos, w_dec))), x -> x.w_dec)"))
        .as("text_dec"))
      .select($"doc_id", md5($"text_dec").as("text_md5"))
      .orderBy($"doc_id")
  }

  private val textBpeRoundtripSql =
    """SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id""".stripMargin

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs (capped at 4 tokens), scored by
    * Σ degree(w)/freq(w) over member words — the classic unsupervised
    * keyphrase extractor. Corpus-level top-30 so the output is bounded.
    *
    * Determinism: the per-word score is micro-quantized with one
    * integer division ((degree·10⁶) div freq) BEFORE the phrase sum,
    * so aggregation order cannot leak into the ranking; ties break on
    * the phrase string.
    *
    * Scale shape: phrase segmentation is a per-doc window (partitioned
    * by doc_id — the sessionize shape, no global window); word stats
    * are one key-only aggregation; the phrase-score join carries
    * (word, score) pairs sized by vocabulary, which AQE broadcasts
    * when small and shuffles when not. */
  private def textRakeKeywords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stop = TA.Stopwords
    val toks = Tables.documents(s, dir)
      .select($"doc_id", $"text")
      // spread the tokenize+explode body past the single-row-group
      // scan-task cap (ctr_referrer pre-parse pattern)
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .withColumn("is_stop", $"w".isin(stop.map(x => x: Any): _*))
    val pid = toks.withColumn("pid",
      sum(when($"is_stop", 1L).otherwise(0L))
        .over(Window.partitionBy($"doc_id").orderBy($"pos")))
    val mem = pid.filter(!$"is_stop" && length($"w") > 0)
      .select($"doc_id", $"pid", $"pos", $"w")
      .localCheckpoint() // three consumers: lengths, word stats, phrase strings
    val plen = mem.groupBy($"doc_id", $"pid").agg(count(lit(1)).as("len"))
      .filter($"len" <= 4)
    val kept = mem.join(plen, Seq("doc_id", "pid"))
    val wsc = kept.groupBy($"w")
      .agg(count(lit(1)).as("freq"), sum($"len").as("degree"))
      .select($"w", expr("(degree * 1000000) div freq").as("smicro"))
    val psc = kept.join(wsc, "w")
      .groupBy($"doc_id", $"pid").agg(sum($"smicro").as("score"))
    val pstr = kept.groupBy($"doc_id", $"pid")
      .agg(array_join(expr("transform(array_sort(collect_list(struct(pos, w))), x -> x.w)"), " ")
        .as("phrase"))
    pstr.join(psc, Seq("doc_id", "pid"))
      .groupBy($"phrase")
      .agg(count(lit(1)).as("n_occurrences"), max($"score").as("sm"))
      .orderBy($"sm".desc, $"phrase")
      .limit(30)
      .select($"phrase", $"n_occurrences",
        ($"sm".cast("double") / 1000000).as("rake_score"))
  }

  private val textRakeKeywordsSql = {
    val stops = TA.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |tok AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS pos FROM t0),
       |st AS (SELECT doc_id, pos, ws[pos] AS w,
       |    CASE WHEN ws[pos] IN ($stops) THEN 1 ELSE 0 END AS is_stop FROM tok),
       |pidt AS (SELECT doc_id, pos, w, is_stop,
       |    SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS pid FROM st),
       |mem AS (SELECT doc_id, pid, pos, w FROM pidt
       |  WHERE is_stop = 0 AND len(w) > 0),
       |plen AS (SELECT doc_id, pid, COUNT(*) AS len FROM mem
       |  GROUP BY 1, 2 HAVING COUNT(*) <= 4),
       |kept AS (SELECT m.doc_id, m.pid, m.pos, m.w, p.len
       |  FROM mem m JOIN plen p ON m.doc_id = p.doc_id AND m.pid = p.pid),
       |wsc AS (SELECT w, (SUM(len) * 1000000) // COUNT(*) AS smicro
       |  FROM kept GROUP BY w),
       |psc AS (SELECT k.doc_id, k.pid, SUM(smicro) AS score
       |  FROM kept k JOIN wsc ON k.w = wsc.w GROUP BY 1, 2),
       |pstr AS (SELECT doc_id, pid, string_agg(w, ' ' ORDER BY pos) AS phrase
       |  FROM kept GROUP BY 1, 2),
       |ph AS (SELECT pstr.phrase, psc.score FROM pstr
       |  JOIN psc ON pstr.doc_id = psc.doc_id AND pstr.pid = psc.pid)
       |SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       |  CAST(MAX(score) AS DOUBLE) / 1000000 AS rake_score
       |FROM ph GROUP BY phrase
       |ORDER BY MAX(score) DESC, phrase LIMIT 30""".stripMargin
  }

  // ---------------------------------------------------------- text_burstiness

  /** Term burstiness (Church & Gale 1995): variance-to-mean ratio of a
    * term's per-document count over the WHOLE corpus (zeros included) —
    * uniform function words sit near 1, topical terms above, and
    * keyword-spam / boilerplate terms spike (the repetition signal
    * doc-level dup-line stats miss). All moments are exact integers:
    * VMR = (N·Σc² − (Σc)²)/(N·Σc) emitted as (num·10⁹) div den — the
    * zero counts need no rows because Σ and Σ² over zeros vanish and N
    * is the corpus doc count. One explode → (doc,term) agg → term agg;
    * df ≥ 20 support floor; top-30 by integer VMR. */
  private def textBurstiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val docs = Tables.documents(s, dir)
    val nDocs = docs.select($"doc_id").agg(count(lit(1)).as("n"))
    val cdt = docs
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0)
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
    val stats = cdt.groupBy($"term")
      .agg(count(lit(1)).as("df"),
        sum($"c").as("sc"),
        sum(($"c".cast(d38) * $"c".cast(d38)).cast(d38)).as("scc"))
      .filter($"df" >= 20)
    stats.crossJoin(broadcast(nDocs))
      .select($"term", $"df", $"sc".as("n_occurrences"),
        expr("""CAST(((CAST(n AS DECIMAL(38,0)) * scc - CAST(sc AS DECIMAL(38,0)) * sc)
          |  * 1000000000) div (CAST(n AS DECIMAL(38,0)) * sc) AS BIGINT)""".stripMargin)
          .as("vmr_ppb"))
      .orderBy($"vmr_ppb".desc, $"term")
      .limit(30)
  }

  private val textBurstinessSql =
    """WITH nd AS (SELECT COUNT(*) AS n FROM documents),
      |cdt AS (
      |  SELECT doc_id, term, COUNT(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
      |  WHERE len(term) > 0 GROUP BY 1, 2),
      |st AS (
      |  SELECT term, COUNT(*) AS df, SUM(c) AS sc,
      |    SUM(c::HUGEINT * c) AS scc
      |  FROM cdt GROUP BY term HAVING COUNT(*) >= 20)
      |SELECT term, CAST(df AS BIGINT) AS df,
      |  CAST(sc AS BIGINT) AS n_occurrences,
      |  CAST(((n::HUGEINT * scc - sc::HUGEINT * sc) * 1000000000)
      |    // (n::HUGEINT * sc) AS BIGINT) AS vmr_ppb
      |FROM st CROSS JOIN nd
      |ORDER BY vmr_ppb DESC, term LIMIT 30""".stripMargin

  /** Unicode NFC normalization — the canonical-composition pass every
    * curation pipeline runs before any hashing/dedup/fingerprint step
    * (a decomposed e+COMBINING ACUTE and a composed é must hash the
    * same). Both engines implement UAX #15 independently (Spark side:
    * the native codegen'd [[graft.functions.NfcNormalize]] wrapping
    * java.text.Normalizer; oracle: DuckDB's nfc_normalize), so the
    * md5-over-normalized-text hash compare is a genuine cross-engine
    * conformance gate. The corpus is deterministically DE-composed
    * first (every 'e' gains U+0301) in both engines — otherwise the
    * synthetic ASCII corpus would make NFC a no-op. Byte lengths
    * before/after pin the composition actually happened (3 UTF-8
    * bytes → 2 per pair). Scale shape: map-only, whole-stage codegen,
    * in-scan; the already-normalized fast path is one scan with zero
    * allocation. */
  private def textNfcNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val norm = graft.functions.Fns.nfc(
      regexp_replace($"text", "e", "e\u0301"))
    Tables.documents(s, dir)
      .select($"doc_id",
        octet_length(regexp_replace($"text", "e", "e\u0301")).cast("long")
          .as("bytes_decomposed"),
        octet_length(norm).cast("long").as("bytes_nfc"),
        md5(norm).as("nfc_md5"))
      .orderBy($"doc_id")
  }

  private val textNfcNormalizeSql =
    """WITH d AS (SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS t_dec
      |  FROM documents)
      |SELECT doc_id, CAST(strlen(t_dec) AS BIGINT) AS bytes_decomposed,
      |  CAST(strlen(nfc_normalize(t_dec)) AS BIGINT) AS bytes_nfc,
      |  md5(nfc_normalize(t_dec)) AS nfc_md5
      |FROM d ORDER BY doc_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "text_nfc_normalize" -> QueryDef(textNfcNormalize, Some(textNfcNormalizeSql)),
    "text_burstiness" -> QueryDef(textBurstiness, Some(textBurstinessSql)),
    "text_rake_keywords" -> QueryDef(textRakeKeywords, Some(textRakeKeywordsSql)),
    "text_bpe_fertility" -> QueryDef(textBpeFertility, Some(textBpeFertilitySql)),
    "text_bpe_train" -> QueryDef(textBpeTrain, Some(textBpeTrainSql)),
    "text_bpe_encode" -> QueryDef(textBpeEncode, Some(textBpeEncodeSql)),
    "text_bpe_roundtrip" -> QueryDef(textBpeRoundtrip, Some(textBpeRoundtripSql)),
    "corpus_bpe_pack" -> QueryDef(corpusBpePack, Some(corpusBpePackSql)),
    "text_oov_rate" -> QueryDef(textOovRate, Some(textOovRateSql)),
    "text_classifier_score" -> QueryDef(textClassifierScore, Some(textClassifierScoreSql)),
    "text_classifier_train" -> QueryDef(textClassifierTrain, Some(textClassifierTrainSql), bench = true),
    "text_html_extract" -> QueryDef(textHtmlExtract, Some(textHtmlExtractSql)),
    "text_url_canonical" -> QueryDef(textUrlCanonical, Some(textUrlCanonicalSql)),
    "corpus_shard_manifest" -> QueryDef(corpusShardManifest, Some(corpusShardManifestSql)),
    "corpus_upsample" -> QueryDef(corpusUpsample, Some(corpusUpsampleSql)),
    "corpus_chunk" -> QueryDef(corpusChunk, Some(corpusChunkSql)),
    "text_contamination" -> QueryDef(textContamination, Some(textContaminationSql)),
    "text_repetition" -> QueryDef(textRepetition, Some(textRepetitionSql)),
    "text_bigrams" -> QueryDef(textBigrams, Some(textBigramsSql)),
    "text_pmi_bigrams" -> QueryDef(textPmiBigrams, Some(textPmiBigramsSql)),
    "text_heavy_hitters" -> QueryDef(textHeavyHitters, Some(textHeavyHittersSql)),
    "corpus_splits" -> QueryDef(corpusSplits, Some(corpusSplitsSql)),
    "corpus_sample" -> QueryDef(corpusSample, Some(corpusSampleSql)),
    "corpus_pack" -> QueryDef(corpusPack, Some(corpusPackSql)),
    "text_tfidf" -> QueryDef(textTfidf, Some(textTfidfSql), bench = true),
    "emb_label_centroid" -> QueryDef(textLabelCentroid, Some(textLabelCentroidSql)),
    "text_tokens" -> QueryDef(textTokens, Some(textTokensSql)),
    "text_quality" -> QueryDef(textQuality, Some(textQualitySql), bench = true),
    "text_langid" -> QueryDef(textLangid, Some(textLangidSql)),
    "text_langid_ngram" -> QueryDef(textLangidNgram, Some(textLangidNgramSql), bench = true),
    "text_lang_confusion" -> QueryDef(langConfusion, Some(langConfusionSql)),
    "text_fingerprint" -> QueryDef(textFingerprint, Some(textFingerprintSql))
  )
}
