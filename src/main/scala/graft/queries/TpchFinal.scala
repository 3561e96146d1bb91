package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDef.cents
import graft.sources.Tables

/** TPC-H completion batch: Q2 and Q11 — the two shapes that need a
  * `partsupp` table, proxied (as in Q16/Q20) by the distinct lineitem
  * (part, supplier) pairs with exact-integer derived attributes:
  * supplycost = MIN extendedprice cents over the pair's lines,
  * availqty = SUM of rounded quantities. Both engines derive the table
  * identically, so every downstream comparison is exact. This closes
  * the inventory at 22/22 TPC-H query shapes.
  */
object TpchFinal {

  /** Derived partsupp (oracle side): one pair groupBy; attributes are
    * exact int64 so later arithmetic is bit-identical. The Spark side
    * derives the same pairs inline with its filters pushed below the
    * aggregation (filter keys ⊆ group keys ⇒ same result). */
  private val partsuppSql =
    """SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |  CAST(MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cost_c,
      |  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS availqty
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** Q2 shape: min-cost European supplier per LARGE/size-15 part.
    * The part filter pushes below the pair aggregation (the join key is
    * a group key, so per-part minima are unchanged) — only the widget
    * of interest ever shuffles; suppliers+nations broadcast; the
    * per-part min is a window over the aggregation's own key. */
  private def q2MinCost(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parts = Tables.part(s, dir)
      .filter($"p_size" <= 15 && $"p_type" === "LARGE")
      .select($"p_partkey", $"p_name")
    val eurSup = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(s, dir).filter($"r_name" === "EUROPE"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val ps = Tables.lineitem(s, dir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .groupBy($"p_partkey", $"p_name", $"l_suppkey")
      .agg(min(cents($"l_extendedprice")).as("cost_c"))
      .join(broadcast(eurSup), $"l_suppkey" === $"s_suppkey")
    ps.withColumn("min_c", min($"cost_c").over(Window.partitionBy($"p_partkey")))
      .filter($"cost_c" === $"min_c")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name",
        ($"cost_c".cast("double") / 100.0).as("supplycost"))
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
  }

  private val q2Sql =
    s"""WITH ps AS ($partsuppSql),
      |eps AS (
      |  SELECT ps_partkey, cost_c, s_name, s_acctbal, n_name
      |  FROM ps
      |  JOIN supplier ON ps_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
      |mn AS (SELECT ps_partkey, MIN(cost_c) AS min_c FROM eps GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  CAST(cost_c AS DOUBLE)/100.0 AS supplycost
      |FROM eps
      |JOIN mn USING (ps_partkey)
      |JOIN part ON ps_partkey = p_partkey
      |WHERE cost_c = min_c AND p_size <= 15 AND p_type = 'LARGE'
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  /** Q11 shape: parts whose NATION_1 stock value exceeds 0.1% of the
    * national total. Exact integer value units (cents × qty); the
    * threshold compare is integer (×1000), so no float drift. The
    * per-part aggregate is localCheckpoint'd — it feeds both the total
    * and the HAVING filter, and Catalyst would otherwise recompute the
    * whole lineitem aggregation twice. */
  private def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir).filter($"n_name" === "NATION_1"),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    // nation filter pushed BELOW the pair aggregation (the supplier key
    // is a group key, so per-pair attributes are unchanged): only
    // NATION_1's lineitem rows ever shuffle (~1/25), 12 MB → <1 MB.
    val per = Tables.lineitem(s, dir)
      .join(broadcast(n1), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey".as("ps_partkey"), $"l_suppkey".as("ps_suppkey"))
      .agg(min(cents($"l_extendedprice")).as("cost_c"),
        sum(round($"l_quantity").cast("long")).as("availqty"))
      .groupBy($"ps_partkey")
      .agg(sum($"cost_c" * $"availqty").as("v_c"))
      .localCheckpoint()
    val tot = per.agg(sum($"v_c").as("t_c"))
    per.crossJoin(broadcast(tot))
      .filter($"v_c" * 1000L > $"t_c")
      .select($"ps_partkey", ($"v_c".cast("double") / 100.0).as("stock_value"))
      .orderBy($"stock_value".desc, $"ps_partkey")
  }

  private val q11Sql =
    s"""WITH ps AS ($partsuppSql),
      |nps AS (
      |  SELECT ps_partkey, cost_c * availqty AS v
      |  FROM ps
      |  JOIN supplier ON ps_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'),
      |tot AS (SELECT SUM(v) AS t FROM nps)
      |SELECT ps_partkey, CAST(SUM(v) AS DOUBLE)/100.0 AS stock_value
      |FROM nps, tot
      |GROUP BY ps_partkey, t
      |HAVING SUM(v) * 1000 > t
      |ORDER BY stock_value DESC, ps_partkey""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q2_min_cost" -> QueryDef(q2MinCost, Some(q2Sql)),
    "q11_important_stock" -> QueryDef(q11ImportantStock, Some(q11Sql))
  )
}
