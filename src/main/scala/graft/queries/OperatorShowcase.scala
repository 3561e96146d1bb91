package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.QueryDef.{cents, pct}
import graft.sources.Tables

/** Gate-level correctness checks for the scale operators (SURVEY.md
  * §2-G): salted and bloom-pruned joins must return EXACTLY the plain
  * join's rows — the oracle is the plain SQL join, so any skew/pruning
  * artifact (lost rows, duplicated rows) fails the hash compare. */
object OperatorShowcase {

  /** Skew.saltedJoin against a replicated dim: result must equal the
    * plain equi-join (salting spreads hot keys over `salts` reducers;
    * it must never change the output). */
  private def qSkewJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val left = Tables.lineitem(s, dir)
      .filter($"l_extendedprice" > 90000.0)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey".as("partkey"))
    val right = Tables.part(s, dir).select($"p_partkey".as("partkey"), $"p_brand")
    graft.operators.Skew.saltedJoin(left, right, "partkey", salts = 8)
      .select($"l_orderkey", $"l_linenumber", $"partkey", $"p_brand")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val qSkewJoinSql =
    """SELECT l_orderkey, l_linenumber, l_partkey AS partkey, p_brand
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_extendedprice > 90000.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** BloomJoin.prunedJoin: big side pre-filtered by a broadcast bloom
    * filter of the dim keys before the join — false positives are
    * removed by the join itself, so the result must equal the plain
    * join; here rolled up per brand. */
  private def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables.lineitem(s, dir)
      .select($"l_partkey".as("partkey"), $"l_extendedprice", $"l_discount")
    val small = Tables.part(s, dir).filter($"p_type" === "PROMO")
      .select($"p_partkey".as("partkey"), $"p_brand")
    graft.operators.BloomJoin.prunedJoin(big, small, "partkey", expectedKeys = 100000L)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"),
        (sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount")))
          .cast("double") / 10000.0).as("revenue"))
      .orderBy($"p_brand")
  }

  private val qBloomJoinSql =
    """SELECT p_brand, COUNT(*) AS n_lines,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'PROMO'
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** PII redaction over the event props payload via the
    * TextAnalysis.redactPii operator — the standard pre-training scrub
    * step, pure codegen'd regex (runs inside the scan stage at 100 TB). */
  private def textPiiRedact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_id",
        graft.operators.TextAnalysis.redactPii($"props").as("redacted"),
        regexp_count($"props",
          lit(graft.operators.TextAnalysis.DigitRunPattern)).as("n_num"))
      .orderBy($"event_id")
  }

  private val textPiiRedactSql =
    """SELECT event_id,
      | regexp_replace(
      |   regexp_replace(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |   '[0-9]{3,}', '[NUM]', 'g') AS redacted,
      | CAST(len(regexp_extract_all(props, '[0-9]{3,}')) AS BIGINT) AS n_num
      |FROM events ORDER BY event_id""".stripMargin

  /** Two-phase distributed skyline over part (minimize price, maximize
    * size): per-partition sweep prunes to the local frontier with no
    * shuffle, then a frontier-sized exact window resolve — the oracle
    * is the quadratic NOT-EXISTS dominance definition, so any pruning
    * error (dropped frontier point, surviving dominated point) fails
    * the hash compare. Money quantized to cents so dominance is exact
    * integer comparison on both engines. */
  private def qSkyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = Tables.part(s, dir).select(
      $"p_partkey".as("id"),
      cents($"p_retailprice").as("cost"),
      $"p_size".cast("long").as("gain"))
    graft.operators.Skyline.skyline2d(s, pts)
      .select($"id".as("p_partkey"), $"cost", $"gain")
      .orderBy($"p_partkey")
  }

  private val qSkylineSql =
    """WITH t AS (
      |  SELECT p_partkey, CAST(ROUND(p_retailprice*100) AS BIGINT) AS cost,
      |         CAST(p_size AS BIGINT) AS gain FROM part)
      |SELECT p_partkey, cost, gain FROM t a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM t b
      |  WHERE b.cost <= a.cost AND b.gain >= a.gain
      |    AND (b.cost < a.cost OR b.gain > a.gain))
      |ORDER BY p_partkey""".stripMargin

  /** Z-order layout audit: orders on the Morton curve of
    * (o_custkey, order-day), cut into 64 equal-width curve segments
    * (NO global sort — segment = z·64 div (zmax+1)), then per-segment
    * min/max of both dimensions. The span fractions are the file-skip
    * story: each segment covers a small window of BOTH columns, which
    * is exactly what parquet footer min/max pruning needs. Integer
    * bit-interleave math is reproduced verbatim by the oracle. */
  private def qZorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Layout
    val o = Tables.orders(s, dir).select($"o_custkey",
      floor(unix_timestamp($"o_orderdate").cast("double") / 86400).cast("long").as("day"))
    val bounds = o.agg(min($"o_custkey").as("ck_lo"), max($"o_custkey").as("ck_hi"),
      min($"day").as("d_lo"), max($"day").as("d_hi"))
    val z = o.crossJoin(broadcast(bounds)).withColumn("z",
      Layout.zValue($"o_custkey", $"ck_lo", $"ck_hi", $"day", $"d_lo", $"d_hi"))
    val zm = z.agg(max($"z").as("zmax"))
    z.crossJoin(broadcast(zm))
      .withColumn("bucket", floor($"z".cast("double") * 64 / ($"zmax" + 1)).cast("long"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_rows"),
        min($"o_custkey").as("ck_min"), max($"o_custkey").as("ck_max"),
        min($"day").as("day_min"), max($"day").as("day_max"))
      .crossJoin(broadcast(bounds))
      .select($"bucket", $"n_rows", $"ck_min", $"ck_max", $"day_min", $"day_max",
        // same degenerate-span guard as norm16: a constant dimension
        // reports span 0, not NaN/Infinity (which hash differently
        // across engines)
        when($"ck_hi" === $"ck_lo", lit(0.0))
          .otherwise(expr("((ck_max - ck_min) * 1000000000L) div (ck_hi - ck_lo)")
            .cast("double") / 1e9).as("ck_span_frac"),
        when($"d_hi" === $"d_lo", lit(0.0))
          .otherwise(expr("((day_max - day_min) * 1000000000L) div (d_hi - d_lo)")
            .cast("double") / 1e9).as("day_span_frac"))
      .orderBy("bucket")
  }

  private val qZorderSql =
    """WITH o AS (SELECT o_custkey AS ck,
      |    CAST(FLOOR(CAST(epoch(o_orderdate) AS DOUBLE)/86400) AS BIGINT) AS day FROM orders),
      |b AS (SELECT MIN(ck) AS ck_lo, MAX(ck) AS ck_hi,
      |    MIN(day) AS d_lo, MAX(day) AS d_hi FROM o),
      |n AS (SELECT ck, day,
      |    CASE WHEN ck_hi = ck_lo THEN 0
      |      ELSE CAST(FLOOR(CAST(ck - ck_lo AS DOUBLE)*65535/(ck_hi - ck_lo)) AS BIGINT)
      |    END AS na,
      |    CASE WHEN d_hi = d_lo THEN 0
      |      ELSE CAST(FLOOR(CAST(day - d_lo AS DOUBLE)*65535/(d_hi - d_lo)) AS BIGINT)
      |    END AS nb
      |    FROM o CROSS JOIN b),
      |s1 AS (SELECT ck, day, ((na | (na << 8)) & 16711935) AS a1,
      |    ((nb | (nb << 8)) & 16711935) AS b1 FROM n),
      |s2 AS (SELECT ck, day, ((a1 | (a1 << 4)) & 252645135) AS a2,
      |    ((b1 | (b1 << 4)) & 252645135) AS b2 FROM s1),
      |s3 AS (SELECT ck, day, ((a2 | (a2 << 2)) & 858993459) AS a3,
      |    ((b2 | (b2 << 2)) & 858993459) AS b3 FROM s2),
      |s4 AS (SELECT ck, day, ((a3 | (a3 << 1)) & 1431655765) AS a4,
      |    ((b3 | (b3 << 1)) & 1431655765) AS b4 FROM s3),
      |zt AS (SELECT ck, day, (a4 | (b4 << 1)) AS z FROM s4),
      |zm AS (SELECT MAX(z) AS zmax FROM zt),
      |g AS (SELECT CAST(FLOOR(CAST(z AS DOUBLE)*64/(zmax + 1)) AS BIGINT) AS bucket, ck, day
      |    FROM zt CROSS JOIN zm)
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(ck) AS ck_min, MAX(ck) AS ck_max, MIN(day) AS day_min, MAX(day) AS day_max,
      |  CASE WHEN (SELECT ck_hi - ck_lo FROM b) = 0 THEN 0.0
      |    ELSE CAST(((MAX(ck) - MIN(ck)) * 1000000000)
      |      // (SELECT ck_hi - ck_lo FROM b) AS DOUBLE)/1e9
      |  END AS ck_span_frac,
      |  CASE WHEN (SELECT d_hi - d_lo FROM b) = 0 THEN 0.0
      |    ELSE CAST(((MAX(day) - MIN(day)) * 1000000000)
      |      // (SELECT d_hi - d_lo FROM b) AS DOUBLE)/1e9
      |  END AS day_span_frac
      |FROM g GROUP BY bucket ORDER BY bucket""".stripMargin

  /** The z-order claim as a measured number: under a fixed custkey
    * range predicate (the middle 10% of the key span), what fraction
    * of 64 equal-width buckets could footer min/max stats skip — for
    * the Morton layout vs natural (orderkey/insertion) order? The
    * z-layout should prune most buckets; the natural layout almost
    * none (every arrival bucket spans the whole custkey range). Both
    * layouts and the prune test are replayed exactly by the oracle. */
  private def qZorderPruning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Layout
    val o = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey",
      floor(unix_timestamp($"o_orderdate").cast("double") / 86400).cast("long").as("day"))
    val bounds = o.agg(
      min($"o_custkey").as("ck_lo"), max($"o_custkey").as("ck_hi"),
      min($"day").as("d_lo"), max($"day").as("d_hi"),
      min($"o_orderkey").as("ok_lo"), max($"o_orderkey").as("ok_hi"))
    val z = o.crossJoin(broadcast(bounds))
      .withColumn("z", Layout.zValue($"o_custkey", $"ck_lo", $"ck_hi",
        $"day", $"d_lo", $"d_hi"))
    val zm = z.agg(max($"z").as("zmax"))
    val b = z.crossJoin(broadcast(zm))
      .withColumn("zb", floor($"z".cast("double") * 64 / ($"zmax" + 1)).cast("long"))
      .withColumn("nb", floor(($"o_orderkey" - $"ok_lo").cast("double") * 64 /
        ($"ok_hi" - $"ok_lo" + 1)).cast("long"))
      // predicate: middle 10% of the custkey span
      .withColumn("plo", $"ck_lo" + floor(($"ck_hi" - $"ck_lo").cast("double") * 45 / 100)
        .cast("long"))
      .withColumn("phi", $"ck_lo" + floor(($"ck_hi" - $"ck_lo").cast("double") * 55 / 100)
        .cast("long"))
    def layout(bucketCol: String, name: String) = b
      .groupBy(col(bucketCol).as("bucket"))
      .agg(min($"o_custkey").as("mn"), max($"o_custkey").as("mx"),
        max($"plo").as("plo"), max($"phi").as("phi"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when($"mx" < $"plo" || $"mn" > $"phi", 1L).otherwise(0L)).as("n_prunable"))
      .select(lit(name).as("layout"), $"n_buckets", $"n_prunable",
        ($"n_prunable".cast("double") / $"n_buckets").as("prune_frac"))
    layout("zb", "zorder").unionByName(layout("nb", "natural"))
      .orderBy("layout")
  }

  private val qZorderPruningSql =
    """WITH o AS (SELECT o_orderkey, o_custkey AS ck,
      |    CAST(FLOOR(CAST(epoch(o_orderdate) AS DOUBLE)/86400) AS BIGINT) AS day FROM orders),
      |b0 AS (SELECT MIN(ck) AS ck_lo, MAX(ck) AS ck_hi,
      |    MIN(day) AS d_lo, MAX(day) AS d_hi,
      |    MIN(o_orderkey) AS ok_lo, MAX(o_orderkey) AS ok_hi FROM o),
      |n AS (SELECT o_orderkey, ck, day, ck_lo, ck_hi, ok_lo, ok_hi,
      |    CASE WHEN ck_hi = ck_lo THEN 0
      |      ELSE CAST(FLOOR(CAST(ck - ck_lo AS DOUBLE)*65535/(ck_hi - ck_lo)) AS BIGINT)
      |    END AS na,
      |    CASE WHEN d_hi = d_lo THEN 0
      |      ELSE CAST(FLOOR(CAST(day - d_lo AS DOUBLE)*65535/(d_hi - d_lo)) AS BIGINT)
      |    END AS nb
      |    FROM o CROSS JOIN b0),
      |s1 AS (SELECT *, ((na | (na << 8)) & 16711935) AS a1,
      |    ((nb | (nb << 8)) & 16711935) AS b1 FROM n),
      |s2 AS (SELECT *, ((a1 | (a1 << 4)) & 252645135) AS a2,
      |    ((b1 | (b1 << 4)) & 252645135) AS b2 FROM s1),
      |s3 AS (SELECT *, ((a2 | (a2 << 2)) & 858993459) AS a3,
      |    ((b2 | (b2 << 2)) & 858993459) AS b3 FROM s2),
      |s4 AS (SELECT *, ((a3 | (a3 << 1)) & 1431655765) AS a4,
      |    ((b3 | (b3 << 1)) & 1431655765) AS b4 FROM s3),
      |zt AS (SELECT o_orderkey, ck, ck_lo, ck_hi, ok_lo, ok_hi,
      |    (a4 | (b4 << 1)) AS z FROM s4),
      |zm AS (SELECT MAX(z) AS zmax FROM zt),
      |g AS (SELECT ck,
      |    CAST(FLOOR(CAST(z AS DOUBLE)*64/(zmax + 1)) AS BIGINT) AS zb,
      |    CAST(FLOOR(CAST(o_orderkey - ok_lo AS DOUBLE)*64/(ok_hi - ok_lo + 1)) AS BIGINT) AS nb,
      |    ck_lo + CAST(FLOOR(CAST(ck_hi - ck_lo AS DOUBLE)*45/100) AS BIGINT) AS plo,
      |    ck_lo + CAST(FLOOR(CAST(ck_hi - ck_lo AS DOUBLE)*55/100) AS BIGINT) AS phi
      |    FROM zt CROSS JOIN zm),
      |zl AS (SELECT 'zorder' AS layout, COUNT(*) AS n_buckets,
      |    SUM(CASE WHEN mx < plo OR mn > phi THEN 1 ELSE 0 END) AS n_prunable
      |    FROM (SELECT zb, MIN(ck) AS mn, MAX(ck) AS mx,
      |          MAX(plo) AS plo, MAX(phi) AS phi FROM g GROUP BY zb) t),
      |nl AS (SELECT 'natural' AS layout, COUNT(*) AS n_buckets,
      |    SUM(CASE WHEN mx < plo OR mn > phi THEN 1 ELSE 0 END) AS n_prunable
      |    FROM (SELECT nb, MIN(ck) AS mn, MAX(ck) AS mx,
      |          MAX(plo) AS plo, MAX(phi) AS phi FROM g GROUP BY nb) t)
      |SELECT layout, CAST(n_buckets AS BIGINT) AS n_buckets,
      |  CAST(n_prunable AS BIGINT) AS n_prunable,
      |  CAST(n_prunable AS DOUBLE)/n_buckets AS prune_frac
      |FROM (SELECT * FROM zl UNION ALL SELECT * FROM nl) u
      |ORDER BY layout""".stripMargin

  /** KMV (bottom-k) distinct-count sketch next to the exact count —
    * the mergeable-sketch alternative to COUNT(DISTINCT) whose shuffle
    * is one ≤k-long array per (task, group) instead of one row per
    * distinct value. Unlike HLL the sketch state is an exact function
    * of the hash values, so DuckDB replays it verbatim ("the 64
    * smallest distinct hashes per group") and the estimate — Beyer et
    * al. 2007's (k−1)·2⁶⁰/h₍ₖ₎, integer division — hash-matches
    * bit-for-bit. Groups under k distinct values report exactly. */
  private def qKmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 64
    val kmv = udaf(new graft.functions.KmvSketch(k))
    Tables.events(s, dir)
      .select($"event_type",
        conv(substring(md5($"user_id".cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy($"event_type")
      .agg(kmv($"h").as("sk"), countDistinct($"h").as("n_exact"))
      .select($"event_type", $"n_exact",
        when(size($"sk") < k, size($"sk").cast("long"))
          .otherwise(expr(s"(CAST(${k - 1} AS DECIMAL(38,0)) * " +
            s"CAST(1152921504606846976 AS DECIMAL(38,0))) div element_at(sk, $k)"))
          .as("n_est"))
      .select($"event_type", $"n_exact", $"n_est",
        (expr("(abs(n_est - n_exact) * 1000000000L) div n_exact")
          .cast("double") / 1e9).as("rel_err"))
      .orderBy($"event_type")
  }

  private val qKmvDistinctSql =
    """WITH h AS (SELECT DISTINCT event_type,
      |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM events),
      |r AS (SELECT event_type, h,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS nd
      |  FROM h),
      |s AS (SELECT event_type, MIN(nd) AS n_exact,
      |    COUNT(CASE WHEN rn <= 64 THEN 1 END) AS n_kept,
      |    MAX(CASE WHEN rn = 64 THEN h END) AS h64
      |  FROM r GROUP BY event_type),
      |e AS (SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
      |    CAST(CASE WHEN n_kept < 64 THEN n_kept
      |      ELSE (63::HUGEINT * (1::HUGEINT << 60)) // h64 END AS BIGINT) AS n_est
      |  FROM s)
      |SELECT event_type, n_exact, n_est,
      |  CAST((ABS(n_est - n_exact) * 1000000000) // n_exact AS DOUBLE)/1e9 AS rel_err
      |FROM e ORDER BY event_type""".stripMargin

  /** KMV sketch SET ALGEBRA (Beyer et al. 2007 §4): pairwise
    * union/intersection/Jaccard estimates between event-type audiences
    * computed ONLY from the bounded bottom-64 sketches — the 100 TB
    * audience-overlap story, where re-scanning the fact table per pair
    * is off the table. bottom-k(A ∪ B) = bottom-k(sk_A ∪ sk_B) exactly,
    * so the union sketch (and its (k−1)·2⁶⁰/h₍ₖ₎ estimate) needs no
    * second data pass; Jaccard is the fraction of the union sketch
    * present in BOTH input sketches (the theta-sketch estimator), and
    * the intersection estimate is jaccard × union in exact integer
    * arithmetic. The exact companions (countDistinct + one
    * distinct-hash self-join) ride along as the audit columns, same
    * pattern as q_kmv_distinct's n_exact. All estimator inputs are
    * exact functions of the hash values, so DuckDB replays the whole
    * pipeline verbatim and the output hash-matches bit-for-bit. */
  private def qKmvSetops(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 64
    val kmv = udaf(new graft.functions.KmvSketch(k))
    // ONE distinct pass feeds sketch build, exact counts, and the
    // exact-intersection self-join (checkpointed: three consumers).
    // Post-distinct, n_exact is a plain count and the sketch of the
    // distinct hashes equals the sketch of the raw stream.
    val d = Tables.events(s, dir)
      .select($"event_type",
        conv(substring(md5($"user_id".cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
      .localCheckpoint()
    val sk = d.groupBy($"event_type")
      .agg(kmv($"h").as("sk"), count(lit(1)).as("n_exact"))
      .localCheckpoint() // #event-types rows
    val ex = d.as("a").join(d.as("b"),
        col("a.h") === col("b.h") && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("inter_exact"))
    val pairs = sk.as("a").join(broadcast(sk.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.sk").as("ska"), col("b.sk").as("skb"),
        col("a.n_exact").as("n_a"), col("b.n_exact").as("n_b"))
      .withColumn("u", expr(s"slice(array_sort(array_union(ska, skb)), 1, $k)"))
      .withColumn("ku", size($"u"))
      .withColumn("union_est", when($"ku" < k, $"ku".cast("long"))
        .otherwise(expr(s"(CAST(${k - 1} AS DECIMAL(38,0)) * " +
          s"CAST(1152921504606846976 AS DECIMAL(38,0))) div element_at(u, $k)")))
      .withColumn("matches", size(array_intersect(array_intersect($"u", $"ska"), $"skb")))
    pairs.join(ex, Seq("type_a", "type_b"), "left")
      .select($"type_a", $"type_b", $"n_a", $"n_b",
        coalesce($"inter_exact", lit(0L)).as("inter_exact"),
        ($"n_a" + $"n_b" - coalesce($"inter_exact", lit(0L))).as("union_exact"),
        $"union_est",
        expr("(CAST(union_est AS DECIMAL(38,0)) * matches) div ku").as("inter_est"),
        (expr("(CAST(matches AS BIGINT) * 1000000000L) div ku")
          .cast("double") / 1e9).as("jacc_est"))
      .orderBy($"type_a", $"type_b")
  }

  private val qKmvSetopsSql =
    """WITH h AS (SELECT DISTINCT event_type,
      |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM events),
      |nd AS (SELECT event_type, COUNT(*) AS n FROM h GROUP BY event_type),
      |r AS (SELECT event_type, h,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
      |sk AS (SELECT event_type, h FROM r WHERE rn <= 64),
      |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    a.n AS n_a, b.n AS n_b
      |  FROM nd a JOIN nd b ON a.event_type < b.event_type),
      |ex AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    COUNT(*) AS inter_exact
      |  FROM h a JOIN h b ON a.h = b.h AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |uh AS (SELECT DISTINCT p.type_a, p.type_b, s.h
      |  FROM pr p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)),
      |um AS (SELECT type_a, type_b, h FROM (
      |    SELECT type_a, type_b, h,
      |      ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
      |    FROM uh) u WHERE rn <= 64),
      |uk AS (SELECT type_a, type_b, COUNT(*) AS ku, MAX(h) AS hk
      |  FROM um GROUP BY 1, 2),
      |mt AS (SELECT um.type_a, um.type_b, COUNT(*) AS matches
      |  FROM um
      |  JOIN sk sa ON sa.event_type = um.type_a AND sa.h = um.h
      |  JOIN sk sb ON sb.event_type = um.type_b AND sb.h = um.h
      |  GROUP BY 1, 2),
      |fin AS (SELECT p.type_a, p.type_b, p.n_a, p.n_b,
      |    COALESCE(e.inter_exact, 0) AS inter_exact,
      |    p.n_a + p.n_b - COALESCE(e.inter_exact, 0) AS union_exact,
      |    CASE WHEN k.ku < 64 THEN k.ku
      |      ELSE CAST((63::HUGEINT * (1::HUGEINT << 60)) // k.hk AS BIGINT) END AS union_est,
      |    COALESCE(m.matches, 0) AS matches, k.ku AS ku
      |  FROM pr p JOIN uk k USING (type_a, type_b)
      |  LEFT JOIN ex e USING (type_a, type_b)
      |  LEFT JOIN mt m USING (type_a, type_b))
      |SELECT type_a, type_b, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(inter_exact AS BIGINT) AS inter_exact,
      |  CAST(union_exact AS BIGINT) AS union_exact,
      |  CAST(union_est AS BIGINT) AS union_est,
      |  CAST((CAST(union_est AS HUGEINT) * matches) // ku AS BIGINT) AS inter_est,
      |  CAST((CAST(matches AS BIGINT) * 1000000000) // ku AS DOUBLE)/1e9 AS jacc_est
      |FROM fin ORDER BY type_a, type_b""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_kmv_distinct" -> QueryDef(qKmvDistinct, Some(qKmvDistinctSql)),
    "q_kmv_setops" -> QueryDef(qKmvSetops, Some(qKmvSetopsSql)),
    "q_zorder" -> QueryDef(qZorder, Some(qZorderSql)),
    "q_zorder_pruning" -> QueryDef(qZorderPruning, Some(qZorderPruningSql)),
    "q_skyline" -> QueryDef(qSkyline, Some(qSkylineSql)),
    "q_skew_join" -> QueryDef(qSkewJoin, Some(qSkewJoinSql)),
    "q_bloom_join" -> QueryDef(qBloomJoin, Some(qBloomJoinSql)),
    "text_pii_redact" -> QueryDef(textPiiRedact, Some(textPiiRedactSql))
  )
}
