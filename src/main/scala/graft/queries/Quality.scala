package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.DataQuality
import graft.operators.DataQuality.Rule

/** SURVEY.md §2 (round 8 additions): production data-quality gates and
  * a distributed-linear-algebra showcase.
  *
  *  - `q_dq_rules`      — Deequ-style declarative rule audit, ONE
  *                        aggregate pass per table.
  *  - `q_referential_integrity` — orphan-FK audit across the star
  *                        schema, one outer join per relation.
  *  - `corpus_split_leakage` — n-gram contamination ACROSS the
  *                        train/test hash-split boundary (the QA gate
  *                        for `corpus_splits`).
  *  - `emb_pca`         — top principal component via exact-integer
  *                        power iteration on the Gram matrix; the
  *                        corpus-scale work is one map-side-combined
  *                        Gram aggregate + one map-only projection.
  */
object Quality {

  /** 60-bit md5 prefix as a long — portable across engines. */
  private def md5_60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // ---------------------------------------------------------------
  // q_dq_rules — declarative data-quality rule engine
  // ---------------------------------------------------------------

  /** Twelve constraints over four tables, each table audited in one
    * aggregate scan (SUM(CASE) per rule + count-distinct uniqueness —
    * the shuffle carries one counter row per task). Violations are
    * real findings in this corpus: negative customer balances,
    * `error` event rows, discounts above the 8% policy cap. */
  private def qDqRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = DataQuality.audit(
      Tables.lineitem(s, dir), "lineitem",
      Seq(
        Rule("discount_max008", $"l_discount" > 0.08),
        Rule("price_positive", $"l_extendedprice" <= 0),
        Rule("quantity_range", !$"l_quantity".between(1, 50)),
        Rule("returnflag_domain", !$"l_returnflag".isin("A", "N", "R"))))
    val ord = DataQuality.audit(
      Tables.orders(s, dir), "orders",
      Seq(
        Rule("priority_format", !$"o_orderpriority".rlike("^[1-5]-")),
        Rule("status_domain", !$"o_orderstatus".isin("O", "F", "P")),
        Rule("totalprice_positive", $"o_totalprice" <= 0)),
      uniqueKeys = Seq("orderkey_unique" -> $"o_orderkey"))
    val cust = DataQuality.audit(
      Tables.customer(s, dir), "customer",
      Seq(
        Rule("acctbal_nonneg", $"c_acctbal" < 0),
        Rule("mktsegment_complete", $"c_mktsegment".isNull)),
      uniqueKeys = Seq("custkey_unique" -> $"c_custkey"))
    val ev = DataQuality.audit(
      Tables.events(s, dir), "events",
      Seq(
        Rule("type_domain", !$"event_type".isin("view", "click", "purchase", "signup")),
        Rule("value_positive", $"value" <= 0)))
    li.unionAll(ord).unionAll(cust).unionAll(ev).orderBy($"tbl", $"rule")
  }

  private val qDqRulesSql =
    """WITH li AS (SELECT COUNT(*) AS total,
      |  SUM(CASE WHEN COALESCE(l_discount > 0.08, TRUE) THEN 1 ELSE 0 END) AS v_discount_max008,
      |  SUM(CASE WHEN COALESCE(l_extendedprice <= 0, TRUE) THEN 1 ELSE 0 END) AS v_price_positive,
      |  SUM(CASE WHEN COALESCE(NOT (l_quantity BETWEEN 1 AND 50), TRUE) THEN 1 ELSE 0 END) AS v_quantity_range,
      |  SUM(CASE WHEN COALESCE(l_returnflag NOT IN ('A','N','R'), TRUE) THEN 1 ELSE 0 END) AS v_returnflag_domain
      |  FROM lineitem),
      |ord AS (SELECT COUNT(*) AS total,
      |  SUM(CASE WHEN COALESCE(NOT regexp_matches(o_orderpriority, '^[1-5]-'), TRUE) THEN 1 ELSE 0 END) AS v_priority_format,
      |  SUM(CASE WHEN COALESCE(o_orderstatus NOT IN ('O','F','P'), TRUE) THEN 1 ELSE 0 END) AS v_status_domain,
      |  SUM(CASE WHEN COALESCE(o_totalprice <= 0, TRUE) THEN 1 ELSE 0 END) AS v_totalprice_positive,
      |  COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_orderkey_unique
      |  FROM orders),
      |cust AS (SELECT COUNT(*) AS total,
      |  SUM(CASE WHEN COALESCE(c_acctbal < 0, TRUE) THEN 1 ELSE 0 END) AS v_acctbal_nonneg,
      |  SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS v_mktsegment_complete,
      |  COUNT(*) - COUNT(DISTINCT c_custkey) AS v_custkey_unique
      |  FROM customer),
      |ev AS (SELECT COUNT(*) AS total,
      |  SUM(CASE WHEN COALESCE(event_type NOT IN ('view','click','purchase','signup'), TRUE) THEN 1 ELSE 0 END) AS v_type_domain,
      |  SUM(CASE WHEN COALESCE(value <= 0, TRUE) THEN 1 ELSE 0 END) AS v_value_positive
      |  FROM events),
      |u AS (
      |  SELECT 'lineitem' AS tbl, 'discount_max008' AS rule, total, v_discount_max008 AS violations FROM li
      |  UNION ALL SELECT 'lineitem', 'price_positive', total, v_price_positive FROM li
      |  UNION ALL SELECT 'lineitem', 'quantity_range', total, v_quantity_range FROM li
      |  UNION ALL SELECT 'lineitem', 'returnflag_domain', total, v_returnflag_domain FROM li
      |  UNION ALL SELECT 'orders', 'priority_format', total, v_priority_format FROM ord
      |  UNION ALL SELECT 'orders', 'status_domain', total, v_status_domain FROM ord
      |  UNION ALL SELECT 'orders', 'totalprice_positive', total, v_totalprice_positive FROM ord
      |  UNION ALL SELECT 'orders', 'orderkey_unique', total, v_orderkey_unique FROM ord
      |  UNION ALL SELECT 'customer', 'acctbal_nonneg', total, v_acctbal_nonneg FROM cust
      |  UNION ALL SELECT 'customer', 'mktsegment_complete', total, v_mktsegment_complete FROM cust
      |  UNION ALL SELECT 'customer', 'custkey_unique', total, v_custkey_unique FROM cust
      |  UNION ALL SELECT 'events', 'type_domain', total, v_type_domain FROM ev
      |  UNION ALL SELECT 'events', 'value_positive', total, v_value_positive FROM ev)
      |SELECT tbl, rule, CAST(total AS BIGINT) AS total,
      |  CAST(violations AS BIGINT) AS violations, violations = 0 AS pass
      |FROM u ORDER BY tbl, rule""".stripMargin

  // ---------------------------------------------------------------
  // q_referential_integrity — orphan-FK audit across the star schema
  // ---------------------------------------------------------------

  /** Five FK relations, each one left join + conditional count. Dim
    * parents broadcast via AQE; the fact-fact relation
    * (lineitem→orders) hash-joins on the key. The child table streams
    * exactly once per relation and only the parent KEY column is ever
    * built. */
  private def qReferentialIntegrity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val checks = Seq(
      DataQuality.orphans("customer.c_nationkey->nation",
        Tables.customer(s, dir), $"c_nationkey",
        Tables.nation(s, dir), $"n_nationkey"),
      DataQuality.orphans("lineitem.l_orderkey->orders",
        li, $"l_orderkey", Tables.orders(s, dir), $"o_orderkey"),
      DataQuality.orphans("lineitem.l_partkey->part",
        li, $"l_partkey", Tables.part(s, dir), $"p_partkey"),
      DataQuality.orphans("lineitem.l_suppkey->supplier",
        li, $"l_suppkey", Tables.supplier(s, dir), $"s_suppkey"),
      DataQuality.orphans("orders.o_custkey->customer",
        Tables.orders(s, dir), $"o_custkey",
        Tables.customer(s, dir), $"c_custkey"))
    checks.reduce(_ unionAll _).orderBy($"relation")
  }

  private val qReferentialIntegritySql =
    """WITH u AS (
      |  SELECT 'customer.c_nationkey->nation' AS relation,
      |    (SELECT COUNT(*) FROM customer) AS child_rows,
      |    (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
      |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS orphans
      |  UNION ALL SELECT 'lineitem.l_orderkey->orders',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL SELECT 'lineitem.l_partkey->part',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
      |  UNION ALL SELECT 'lineitem.l_suppkey->supplier',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
      |  UNION ALL SELECT 'orders.o_custkey->customer',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)))
      |SELECT relation, CAST(child_rows AS BIGINT) AS child_rows,
      |  CAST(orphans AS BIGINT) AS orphans, orphans = 0 AS intact
      |FROM u ORDER BY relation""".stripMargin

  // ---------------------------------------------------------------
  // q_psi_drift — population-stability-index drift monitor
  // ---------------------------------------------------------------

  /** PSI drift monitor between a baseline and a current period — the
    * standard "did the feature distribution move" production check
    * (PSI > 0.2 ⇒ drifted). Two monitored features (event_type
    * categorical, value in fixed 50-unit bins) histogrammed from ONE
    * events scan (in-row feature array + explode), Laplace-smoothed
    * proportions pᵢ = (cᵢ+1)/(N+K) so no bucket is ever zero.
    *
    * Scale shape: the only corpus-wide shuffle carries
    * (feature, bucket) keys — bucket-cardinality rows per task after
    * map-side combine; per-feature totals re-aggregate the tiny bucket
    * table. Per-bucket PSI terms are nano-quantized before the sum;
    * the drift verdict compares the EXACT integer nano sum. */
  private def qPsiDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cut = "2024-01-16"
    val feats = Tables.events(s, dir)
      .select(($"ts" >= cut).as("cur"), array(
        struct(lit("event_type").as("feature"), $"event_type".as("bucket")),
        struct(lit("value_bin").as("feature"),
          least(floor($"value" / 50.0).cast("long"), lit(9L))
            .cast("string").as("bucket"))).as("fs"))
      .select($"cur", explode($"fs").as("f"))
      .select($"cur", $"f.feature".as("feature"), $"f.bucket".as("bucket"))
    val counts = feats.groupBy($"feature", $"bucket")
      .agg(sum(when(!$"cur", 1L).otherwise(0L)).as("c1"),
        sum(when($"cur", 1L).otherwise(0L)).as("c2"))
    val tot = counts.groupBy($"feature")
      .agg(sum($"c1").as("n1"), sum($"c2").as("n2"), count(lit(1)).as("k"))
    counts.join(tot, "feature")
      .withColumn("p1", ($"c1" + lit(1.0)) / ($"n1" + $"k"))
      .withColumn("p2", ($"c2" + lit(1.0)) / ($"n2" + $"k"))
      .withColumn("nano",
        round((($"p2" - $"p1") * log($"p2" / $"p1")) * lit(1e9)).cast("long"))
      .groupBy($"feature")
      .agg(count(lit(1)).as("n_buckets"), sum($"nano").as("nano_sum"))
      .select($"feature", $"n_buckets",
        round($"nano_sum".cast("double") / 1e9, 9).as("psi"),
        ($"nano_sum" > lit(200000000L)).as("drifted"))
      .orderBy($"feature")
  }

  private val qPsiDriftSql =
    """WITH f AS (
      |  SELECT ts >= TIMESTAMP '2024-01-16' AS cur,
      |    'event_type' AS feature, event_type AS bucket FROM events
      |  UNION ALL
      |  SELECT ts >= TIMESTAMP '2024-01-16',
      |    'value_bin', CAST(LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS VARCHAR)
      |  FROM events),
      |c AS (SELECT feature, bucket,
      |    SUM(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS c2
      |  FROM f GROUP BY 1, 2),
      |t AS (SELECT feature, SUM(c1) AS n1, SUM(c2) AS n2, COUNT(*) AS k
      |  FROM c GROUP BY 1),
      |sc AS (SELECT c.feature,
      |    (c1 + 1.0) / (n1 + k) AS p1, (c2 + 1.0) / (n2 + k) AS p2
      |  FROM c JOIN t ON c.feature = t.feature),
      |n AS (SELECT feature, COUNT(*) AS n_buckets,
      |    SUM(CAST(ROUND(((p2 - p1) * LN(p2 / p1)) * 1e9) AS BIGINT)) AS nano_sum
      |  FROM sc GROUP BY 1)
      |SELECT feature, n_buckets, ROUND(CAST(nano_sum AS DOUBLE) / 1e9, 9) AS psi,
      |  nano_sum > 200000000 AS drifted
      |FROM n ORDER BY feature""".stripMargin

  // ---------------------------------------------------------------
  // corpus_split_leakage — n-gram leakage across the train/test split
  // ---------------------------------------------------------------

  /** The QA gate for `corpus_splits`: word-4-grams shared between a
    * test doc and ANY train doc are leakage (near-dup families that
    * the hash split scattered across the boundary). Same scale shape
    * as `corpus_decontam`: grams travel as 60-bit hashes, the join is
    * an equi-join on the gram hash, and neither side is force-
    * broadcast (the test split is 5% of the corpus and GROWS with it,
    * so AQE must pick the strategy). */
  private def corpusSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = 4
    val grams = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= n)
      .select($"doc_id",
        pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(100L)).as("b"),
        explode(expr(
          s"transform(sequence(0, size(ws) - $n), i -> concat_ws(' ', slice(ws, i + 1, $n)))")).as("g"))
      .select($"doc_id", $"b", md5_60($"g").as("gh"))
      .distinct()
    val train = grams.filter($"b" < 90).select($"doc_id".as("train_doc"), $"gh")
    val test = grams.filter($"b" >= 95)
    test.join(train, "gh")
      .groupBy($"doc_id")
      .agg(countDistinct($"gh").as("n_grams_leaked"),
        countDistinct($"train_doc").as("n_train_docs"))
      .orderBy($"doc_id")
  }

  private val corpusSplitLeakageSql =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |    CAST('0x' || substring(md5(doc_id::VARCHAR), 1, 8) AS BIGINT) % 100 AS b
      |  FROM documents WHERE len(string_split(text, ' ')) >= 4),
      |g AS (
      |  SELECT DISTINCT doc_id, b,
      |    CAST('0x' || substring(md5(array_to_string(ws[i:i+3], ' ')), 1, 15) AS BIGINT) AS gh
      |  FROM (SELECT doc_id, b, ws, unnest(generate_series(1, len(ws) - 3)) AS i FROM tok) t),
      |tr AS (SELECT doc_id AS train_doc, gh FROM g WHERE b < 90),
      |te AS (SELECT doc_id, gh FROM g WHERE b >= 95)
      |SELECT te.doc_id AS doc_id,
      |  COUNT(DISTINCT te.gh) AS n_grams_leaked,
      |  COUNT(DISTINCT tr.train_doc) AS n_train_docs
      |FROM te JOIN tr ON te.gh = tr.gh
      |GROUP BY te.doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // emb_pca — top principal component via exact-integer power iteration
  // ---------------------------------------------------------------

  /** Distributed PCA, scale-shaped: the only corpus-wide passes are
    * (1) the Gram matrix EᵀE — one map-side-combined Aggregator, a
    * single dim² (32 KB) buffer per task crossing the wire — and
    * (2) a map-only projection of every vector onto the principal
    * axis. The power iteration itself runs on the DRIVER over the
    * bounded dim×dim matrix (like k-means centroid init: k·dim²
    * floats, never data-sized) in EXACT BigInt arithmetic with an
    * integer renormalization step, so DuckDB replays it bit-for-bit
    * with HUGEINT math — no float matvec, no cross-engine drift.
    *
    * Renormalization per step: v' = round(1e6·w / max|w|) computed as
    * sign(w)·((2e6·|w| + m) div 2m) — integer half-away-from-zero
    * rounding, exact in both engines. */
  private def embPca(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = 64
    val steps = 8
    val gramAgg = udaf(new graft.functions.GramMatrix(dim))
    val qv = Tables.embeddings(s, dir)
      .select($"vec_id", $"label",
        transform($"embedding",
          x => round(x.cast("double") * 1e6).cast("long")).as("qv"))
    // Bounded driver-side collect: dim² longs (32 KB), not data-sized.
    val g: IndexedSeq[BigInt] =
      qv.agg(gramAgg($"qv").as("g")).head.getAs[scala.collection.Seq[Long]](0)
        .map(BigInt(_)).toIndexedSeq
    val v = graft.operators.LinAlg.powerIteration(g, dim, steps)
    val vLit = array(v.map(x => lit(x.toLong)): _*)
    qv.select($"label",
        aggregate(zip_with($"qv", vLit, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("proj"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"), sum($"proj").as("sum_proj"))
      .select($"label".cast("int").as("label"), $"n_vecs",
        $"sum_proj".cast("long").as("sum_proj"),
        (expr("sign(sum_proj) * (abs(sum_proj) div n_vecs)")
          .cast("double") / 1e12).as("mean_proj"))
      .orderBy($"label")
  }

  /** DuckDB replay: same quantized Gram, same 8 HUGEINT power steps
    * (unrolled CTEs), same integer renormalization, same projection. */
  private val embPcaSql = {
    val step = (k: Int) =>
      s"""w$k AS (SELECT g.i, SUM(g.g * v${k - 1}.v) AS w FROM g JOIN v${k - 1} ON g.j = v${k - 1}.i GROUP BY g.i),
         |m$k AS (SELECT MAX(ABS(w)) AS m FROM w$k),
         |v$k AS (SELECT i, CASE WHEN w >= 0
         |    THEN (2000000 * w + m) // (2 * m)
         |    ELSE -((2000000 * (-w) + m) // (2 * m)) END AS v
         |  FROM w$k, m$k),""".stripMargin
    s"""WITH q AS (SELECT vec_id, label, list_transform(embedding,
       |    x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |g AS (SELECT i, j, CAST(SUM(qv[i]*qv[j]) AS HUGEINT) AS g
       |  FROM q, range(1, 65) r1(i), range(1, 65) r2(j)
       |  GROUP BY i, j),
       |v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS v FROM range(1, 65) r(i)),
       |${(1 to 8).map(step).mkString("\n")}
       |p AS (SELECT t.vec_id, t.label, SUM(t.qv[v8.i] * v8.v) AS proj
       |  FROM q t, v8 GROUP BY t.vec_id, t.label)
       |SELECT CAST(label AS INTEGER) AS label, COUNT(*) AS n_vecs,
       |  CAST(SUM(proj) AS BIGINT) AS sum_proj,
       |  CAST(SIGN(CAST(SUM(proj) AS BIGINT))
       |    * (ABS(CAST(SUM(proj) AS BIGINT)) // COUNT(*)) AS DOUBLE)
       |    / 1000000000000.0 AS mean_proj
       |FROM p GROUP BY label ORDER BY label""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "q_dq_rules" -> QueryDef(qDqRules, Some(qDqRulesSql)),
    "q_referential_integrity" ->
      QueryDef(qReferentialIntegrity, Some(qReferentialIntegritySql)),
    "q_psi_drift" -> QueryDef(qPsiDrift, Some(qPsiDriftSql)),
    "corpus_split_leakage" ->
      QueryDef(corpusSplitLeakage, Some(corpusSplitLeakageSql)),
    "emb_pca" -> QueryDef(embPca, Some(embPcaSql), bench = true)
  )
}
