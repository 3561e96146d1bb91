package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-9 hypothesis-test batch: the classical nonparametric /
  * categorical tests an experimentation or data-quality platform runs
  * at warehouse scale — Mann-Whitney U (rank-sum), two-sample
  * Kolmogorov-Smirnov, and the chi-square independence table.
  *
  * All three are RANK- or COUNT-based, which makes them ideal for the
  * repo's cross-engine exactness strategy: every statistic reduces to
  * integer value-histograms (counts per distinct value / per cell), so
  * the whole computation stays in exact integer arithmetic
  * (DECIMAL(38,0) in Spark ↔ HUGEINT in DuckDB) until one final
  * fixed-shape double chain (+, −, ×, ÷, sqrt — all IEEE
  * correctly-rounded, hence bit-identical across engines on identical
  * operands; no libm transcendentals).
  *
  * Scale shape (the 100 TB story): each test aggregates the raw table
  * down to a VALUE HISTOGRAM first — one map-side-combinable groupBy
  * whose output is bounded by the value domain (50 quantity levels, ≤31
  * ship-delay days, 6 flag×status cells), NOT by the data size. The
  * rank/CDF windows then run over that bounded spine, so there is no
  * data-sized single-partition window and exactly one small shuffle per
  * test regardless of input rows. Integer headroom: co-moments are
  * DECIMAL(38,0); products of two data-sized counts (n², n·rank) stay
  * exact to n ≈ 10^12 rows — beyond 100 TB of lineitem.
  */
object Hypothesis {

  private val d38 = DecimalType(38, 0)

  // -------------------------------------------------------- q_mann_whitney

  /** Mann-Whitney U (Wilcoxon rank-sum) comparing l_quantity between
    * returned ('R') and acknowledged ('A') lines, with midrank tie
    * handling and tie-corrected normal approximation.
    *
    * Exactness: ranks come from the value histogram — for a tied block
    * of c rows after cumBefore smaller rows, the midrank is
    * cumBefore + (c+1)/2, so DOUBLED midranks (2·cumBefore + c + 1) are
    * integers and the doubled rank-sum r1x2 = Σ c1·midrank2 is exact in
    * DECIMAL(38,0). U1 = (r1x2 − 2·n1(n1+1)/2)/2 and the common-language
    * effect size AUC = U1/(n1·n2) are emitted as an exact nano integer
    * via the repo's `(num·10^9) div den` pattern. The z-score is one
    * fixed-shape +−×÷/sqrt chain over those exact integers (sqrt is
    * IEEE correctly-rounded, unlike ln/exp — bit-identical cross-engine).
    */
  private def qMannWhitney(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .filter($"l_returnflag".isin("R", "A"))
      .select(round($"l_quantity" * 100).cast("long").as("v"),
        when($"l_returnflag" === "R", 1L).otherwise(0L).as("is1"))
    // value histogram: ≤50 rows (quantity levels), one combinable shuffle
    val byV = li.groupBy($"v")
      .agg(sum($"is1").as("c1"), (count(lit(1)) - sum($"is1")).as("c2"))
    val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byV
      .withColumn("cumb", coalesce(sum($"c1" + $"c2").over(w), lit(0L)))
      .withColumn("midrank2", lit(2L) * $"cumb" + $"c1" + $"c2" + 1L)
    ranked
      .agg(
        sum($"c1").as("n1"), sum($"c2").as("n2"),
        sum($"c1".cast(d38) * $"midrank2".cast(d38)).as("r1x2"),
        sum(($"c1" + $"c2").cast(d38) * ($"c1" + $"c2").cast(d38) *
          ($"c1" + $"c2").cast(d38) - ($"c1" + $"c2").cast(d38)).as("tsum"))
      .select($"n1", $"n2",
        // u1x2 = 2·U1 (exact integer)
        ($"r1x2" - $"n1".cast(d38) * ($"n1" + 1L).cast(d38)).as("u1x2"),
        $"tsum")
      .select($"n1", $"n2",
        ($"u1x2".cast("double") / 2.0).as("u_stat"),
        expr("(u1x2 * 1000000000) div (2 * CAST(n1 AS DECIMAL(38,0)) * CAST(n2 AS DECIMAL(38,0)))")
          .cast("long").as("auc_nano"),
        (($"u1x2".cast("double") / 2.0 -
          $"n1".cast("double") * $"n2".cast("double") / 2.0) /
          sqrt($"n1".cast("double") * $"n2".cast("double") / 12.0 *
            (($"n1" + $"n2" + 1L).cast("double") -
              $"tsum".cast("double") /
                (($"n1" + $"n2").cast("double") * ($"n1" + $"n2" - 1L).cast("double")))))
          .as("z_score"))
  }

  private val qMannWhitneySql =
    """WITH li AS (
      |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS v,
      |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is1
      |  FROM lineitem WHERE l_returnflag IN ('R','A')),
      |byv AS (
      |  SELECT v, SUM(is1) AS c1, COUNT(*) - SUM(is1) AS c2
      |  FROM li GROUP BY v),
      |rk AS (
      |  SELECT c1, c2,
      |    COALESCE(SUM(c1 + c2) OVER
      |      (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM byv),
      |ag AS (
      |  SELECT SUM(c1) AS n1, SUM(c2) AS n2,
      |    SUM(CAST(c1 AS HUGEINT) * (2 * cumb + c1 + c2 + 1)) AS r1x2,
      |    SUM(CAST(c1 + c2 AS HUGEINT) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS tsum
      |  FROM rk),
      |u AS (
      |  SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |    r1x2 - n1 * (n1 + 1) AS u1x2, tsum
      |  FROM ag)
      |SELECT n1, n2,
      |  CAST(u1x2 AS DOUBLE) / 2.0 AS u_stat,
      |  CAST((u1x2 * 1000000000) // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS auc_nano,
      |  (CAST(u1x2 AS DOUBLE) / 2.0 -
      |     CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) /
      |  sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
      |    (CAST(n1 + n2 + 1 AS DOUBLE) -
      |      CAST(tsum AS DOUBLE) /
      |        (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))) AS z_score
      |FROM u""".stripMargin

  // ------------------------------------------------------------- q_ks_test

  /** Two-sample Kolmogorov-Smirnov D between the l_quantity
    * distributions of open ('O') and fulfilled ('F') lines.
    *
    * Exactness: D = max_v |F1(v) − F2(v)| over the ≤50-value quantity
    * domain is computed as the exact integer
    * d_scaled = max |cum1·n2 − cum2·n1| (cross-multiplied CDFs — no
    * division until the end), then emitted as d_nano =
    * (d_scaled·10^9) div (n1·n2). The asymptotic statistic
    * λ = D·sqrt(n1·n2/(n1+n2)) is one fixed-shape double chain. */
  private def qKsTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .filter($"l_linestatus".isin("O", "F"))
      .select(round($"l_quantity" * 100).cast("long").as("v"),
        when($"l_linestatus" === "O", 1L).otherwise(0L).as("is1"))
    val byV = li.groupBy($"v")
      .agg(sum($"is1").as("c1"), (count(lit(1)) - sum($"is1")).as("c2"))
    val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)
    val cdf = byV
      .withColumn("cum1", sum($"c1").over(w))
      .withColumn("cum2", sum($"c2").over(w))
    val tot = cdf.agg(max($"cum1").as("n1"), max($"cum2").as("n2"))
    cdf.crossJoin(broadcast(tot))
      .select($"n1", $"n2",
        abs($"cum1".cast(d38) * $"n2".cast(d38) -
          $"cum2".cast(d38) * $"n1".cast(d38)).as("diff"))
      .groupBy($"n1", $"n2").agg(max($"diff").as("d_scaled"))
      .select($"n1", $"n2",
        expr("(d_scaled * 1000000000) div (CAST(n1 AS DECIMAL(38,0)) * CAST(n2 AS DECIMAL(38,0)))")
          .cast("long").as("d_nano"),
        ($"d_scaled".cast("double") /
          ($"n1".cast("double") * $"n2".cast("double"))).as("d_stat"),
        ($"d_scaled".cast("double") /
          ($"n1".cast("double") * $"n2".cast("double")) *
          sqrt($"n1".cast("double") * $"n2".cast("double") /
            ($"n1" + $"n2").cast("double"))).as("ks_lambda"))
  }

  private val qKsTestSql =
    """WITH li AS (
      |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS v,
      |         CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS is1
      |  FROM lineitem WHERE l_linestatus IN ('O','F')),
      |byv AS (
      |  SELECT v, SUM(is1) AS c1, COUNT(*) - SUM(is1) AS c2
      |  FROM li GROUP BY v),
      |cdf AS (
      |  SELECT
      |    SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
      |    SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
      |  FROM byv),
      |tot AS (SELECT MAX(cum1) AS n1, MAX(cum2) AS n2 FROM cdf),
      |dd AS (
      |  SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |    MAX(ABS(CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1)) AS d_scaled
      |  FROM cdf CROSS JOIN tot GROUP BY 1, 2)
      |SELECT n1, n2,
      |  CAST((d_scaled * 1000000000) // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS d_nano,
      |  CAST(d_scaled AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS d_stat,
      |  CAST(d_scaled AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) *
      |    sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) AS ks_lambda
      |FROM dd""".stripMargin

  // --------------------------------------------------------- q_chi_square

  /** Chi-square independence table for l_returnflag × l_linestatus:
    * one row per contingency cell with its observed count, expected
    * count, and chi-square contribution (the qBenford per-term pattern
    * — emitting per-cell terms keeps every row derived from exact
    * integers with a fixed-shape IEEE chain; summing 6 doubles would
    * reintroduce engine-dependent aggregation order).
    *
    * Marginals come from window sums over the ≤6-row cell table (a
    * bounded spine — the data-sized work is the one combinable groupBy
    * producing the cells). */
  private def qChiSquare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("obs"))
    val rowW = Window.partitionBy($"l_returnflag")
    val colW = Window.partitionBy($"l_linestatus")
    val allW = Window.partitionBy()
    cells
      .withColumn("r", sum($"obs").over(rowW))
      .withColumn("c", sum($"obs").over(colW))
      .withColumn("n", sum($"obs").over(allW))
      .withColumn("expected",
        $"r".cast("double") * $"c".cast("double") / $"n".cast("double"))
      .select($"l_returnflag", $"l_linestatus", $"obs", $"expected",
        (($"obs".cast("double") - $"expected") *
          ($"obs".cast("double") - $"expected") / $"expected").as("chi2_term"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val qChiSquareSql =
    """WITH cells AS (
      |  SELECT l_returnflag, l_linestatus, COUNT(*) AS obs
      |  FROM lineitem GROUP BY 1, 2),
      |marg AS (
      |  SELECT l_returnflag, l_linestatus, obs,
      |    SUM(obs) OVER (PARTITION BY l_returnflag) AS r,
      |    SUM(obs) OVER (PARTITION BY l_linestatus) AS c,
      |    SUM(obs) OVER () AS n
      |  FROM cells),
      |e AS (
      |  SELECT l_returnflag, l_linestatus, obs,
      |    CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS expected
      |  FROM marg)
      |SELECT l_returnflag, l_linestatus, obs, expected,
      |  (CAST(obs AS DOUBLE) - expected) * (CAST(obs AS DOUBLE) - expected)
      |    / expected AS chi2_term
      |FROM e
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_mann_whitney" -> QueryDef(qMannWhitney, Some(qMannWhitneySql)),
    "q_ks_test" -> QueryDef(qKsTest, Some(qKsTestSql)),
    "q_chi_square" -> QueryDef(qChiSquare, Some(qChiSquareSql))
  )
}
