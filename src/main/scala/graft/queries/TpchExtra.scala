package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.QueryDef.{cents, pct}
import graft.sources.Tables

/** Second TPC-H batch (SURVEY.md §2-B): the decision-support shapes the
  * first batch didn't cover — correlated EXISTS with a date offset (Q4),
  * multi-dim profit rollup (Q9), group-on-big-key reporting (Q10),
  * conditional line counts (Q12), outer-join count distribution (Q13),
  * HAVING-subquery semijoin (Q18), sole-late-supplier double
  * correlation (Q21) — plus the classic total-order sort (TeraSort
  * shape). Columns absent from the synthetic schema (commit/receipt
  * dates, shipmode, comments) are adapted to ship-vs-order-date logic.
  */
object TpchExtra {

  /** Q4 shape: orders with at least one line shipped >30 days after the
    * order date, counted per priority. EXISTS → left_semi with a
    * non-equi conjunct; the date window prunes the orders scan. */
  private def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
    val l = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
    o.join(l, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q9 shape: profit by supplier nation × ship year for one part
    * family. Fact⋈fact on orderkey is avoided — every dim (part,
    * supplier, nation) broadcasts; one shuffle for the final rollup. */
  private def q9Profit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir).filter($"p_name".contains("widget")).select($"p_partkey")
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
    val n = Tables.nation(s, dir).select($"n_nationkey", $"n_name")
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), year($"l_shipdate").as("o_year"))
      .agg((sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount")))
        .cast("double") / 10000.0).as("profit"))
      .orderBy($"nation", $"o_year")
  }

  private val q9Sql =
    """SELECT n_name AS nation, YEAR(l_shipdate) AS o_year,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/10000.0 AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name, o_year ORDER BY n_name, o_year""".stripMargin

  /** Q10 shape: top returned-item revenue per customer. Group key is
    * the big-side key (custkey) — partial aggregation collapses the
    * shuffle to one row per customer before the top-20 heap. */
  private def q10Returned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir).select($"c_custkey", $"c_name")
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-07-01")
      .select($"o_orderkey", $"o_custkey")
    val l = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg((sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount")))
        .cast("double") / 10000.0).as("revenue"))
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"revenue")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  private val q10Sql =
    """SELECT c_custkey, c_name,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q12 shape (adapted: linestatus stands in for shipmode): lines
    * shipped within 90 days of ordering, split into high/low priority
    * counts — the canonical conditional-aggregation pattern. */
  private def q12PriorityClass(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val l = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate", $"l_linestatus")
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" >= $"o_orderdate" &&
        $"l_shipdate" < $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"l_linestatus")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  private val q12Sql =
    """SELECT l_linestatus,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= o_orderdate
      |  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Q13 shape: order-count distribution over ALL customers (zero
    * included) — left outer join + double aggregation. */
  private def q13CustDistribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir).select($"c_custkey")
    val o = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q18 shape: large-volume orders — HAVING subquery as a semijoin
    * against the re-aggregated fact (the per-order quantity rollup is
    * one shuffle, reused as the probe side). */
  private def q18LargeVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, dir)
    val big = l.groupBy($"l_orderkey")
      .agg(sum(round($"l_quantity").cast("long")).as("sum_qty"))
      .filter($"sum_qty" > 250)
    val o = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val c = Tables.customer(s, dir).select($"c_custkey", $"c_name")
    big.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice,
      | CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
      |HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 250
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Q21 shape (adapted: "late" = shipped >60 days after order date):
    * suppliers who were the SOLE late shipper on a finished
    * multi-supplier order — the semijoin + antijoin double correlation.
    */
  private def q21Waiting(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val l = Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    // Single-pass formulation of the EXISTS/NOT-EXISTS pair: an order
    // qualifies iff it has ≥2 distinct suppliers and EXACTLY ONE late
    // one — per-order counts replace the semi+anti join pair, so the
    // late set is derived once and nothing needs caching/checkpointing.
    val late = l.join(o, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .select($"l_orderkey", $"l_suppkey").distinct()
    val latePerOrder = late.groupBy($"l_orderkey")
      .agg(count(lit(1)).as("late_supps"), min($"l_suppkey").as("sole_supp"))
      .filter($"late_supps" === 1)
    val totalPerOrder = l.select($"l_orderkey".as("t_orderkey"), $"l_suppkey").distinct()
      .groupBy($"t_orderkey").agg(count(lit(1)).as("total_supps"))
      .filter($"total_supps" >= 2)
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_name")
    latePerOrder
      .join(totalPerOrder, $"l_orderkey" === $"t_orderkey")
      .join(broadcast(sup), $"sole_supp" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  private val q21Sql =
    """WITH late AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY),
      |sole AS (
      |  SELECT t.l_orderkey, t.l_suppkey FROM late t
      |  WHERE EXISTS (SELECT 1 FROM lineitem x
      |                WHERE x.l_orderkey = t.l_orderkey AND x.l_suppkey <> t.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM late y
      |                    WHERE y.l_orderkey = t.l_orderkey AND y.l_suppkey <> t.l_suppkey))
      |SELECT s_name, COUNT(*) AS numwait
      |FROM sole JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** Q6 shape: the forecasting-revenue-change scan — single filtered
    * aggregation, no joins; the whole query is one codegen'd scan pass
    * with every predicate pushed to parquet. */
  private def q6Forecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01" &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg((sum(cents($"l_extendedprice") * pct($"l_discount"))
        .cast("double") / 10000.0).as("revenue"))
  }

  private val q6Sql =
    """SELECT CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |   * CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** Q8 shape: one nation's market share of a part family's revenue per
    * order year — a conditional-sum ratio (two exact cents sums, one
    * double division). */
  private def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate")
    val p = Tables.part(s, dir).filter($"p_name".contains("widget")).select($"p_partkey")
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
    val n = Tables.nation(s, dir).select($"n_nationkey", $"n_name")
    val rev = cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg((sum(when($"n_name" === "NATION_3", rev).otherwise(0L)).cast("double") /
        sum(rev).cast("double")).as("mkt_share"))
      .orderBy($"o_year")
  }

  private val q8Sql =
    """SELECT YEAR(o_orderdate) AS o_year,
      | CAST(CAST(SUM(CASE WHEN n_name = 'NATION_3'
      |     THEN CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
      |     ELSE 0 END) AS BIGINT) AS DOUBLE)
      |  / CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |     * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** Q15 shape: top supplier(s) by windowed revenue — aggregate view +
    * scalar-subquery max, matched on EXACT integer cents (double
    * equality would be fragile). */
  private def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // localCheckpoint: the per-supplier aggregate is tiny, but Catalyst
    // would otherwise recompute it (two lineitem scans) for rev and max.
    val rev = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
      .groupBy($"l_suppkey")
      .agg(sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))).as("rev_c"))
      .localCheckpoint()
    val top = rev.agg(max($"rev_c").as("max_c"))
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_name")
    rev.crossJoin(broadcast(top))
      .filter($"rev_c" === $"max_c")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        ($"rev_c".cast("double") / 10000.0).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  private val q15Sql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(rev_c AS DOUBLE)/10000.0 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_c = (SELECT MAX(rev_c) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q16 shape (partsupp proxied by distinct lineitem part-supplier
    * pairs): supplier counts per part attribute triple, excluding one
    * brand — distinct-aggregation over a derived relationship table. */
  private def q16PartsSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, dir)
      .filter($"p_brand" =!= "Brand#1" && $"p_size" <= 25)
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    // broadcast-filter BEFORE the distinct: pairs for excluded parts
    // never reach the shuffle (Catalyst won't push an inner join below
    // the distinct's Aggregate on its own)
    Tables.lineitem(s, dir)
      .select($"l_partkey".as("ps_partkey"), $"l_suppkey".as("ps_suppkey"))
      .join(broadcast(p), $"ps_partkey" === $"p_partkey")
      .select($"ps_partkey", $"ps_suppkey", $"p_brand", $"p_type", $"p_size")
      .distinct()
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"ps_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      | CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      |      FROM lineitem) ps
      |JOIN part ON p_partkey = ps_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size <= 25
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q20 shape (availqty proxied by each supplier's all-time shipped
    * quantity per part): suppliers holding more than half of a part's
    * 1996 shipped volume for the widget family — per-group threshold
    * subquery + semijoin, all integer quantities. */
  private def q20PromotionStock(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val widgets = Tables.part(s, dir).filter($"p_name".contains("widget"))
      .select($"p_partkey")
    // widget filter pushed BELOW both aggregates (join key is a group
    // key, so this is semantics-identical): only widget-family rows
    // ever shuffle
    val l = Tables.lineitem(s, dir)
      .join(broadcast(widgets), $"l_partkey" === $"p_partkey")
    val avail = l.groupBy($"l_partkey", $"l_suppkey")
      .agg(sum(round($"l_quantity").cast("long")).as("avail"))
    val y96 = l.filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01")
      .groupBy($"l_partkey".as("y_partkey"))
      .agg(sum(round($"l_quantity").cast("long")).as("qty96"))
    val qualifying = avail
      .join(y96, $"l_partkey" === $"y_partkey")
      .filter($"avail" * 2 > $"qty96")
      .select($"l_suppkey").distinct()
    Tables.supplier(s, dir)
      .join(qualifying, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  private val q20Sql =
    """WITH avail AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS avail
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |y96 AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty96
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_partkey)
      |SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (
      |  SELECT 1 FROM avail
      |  JOIN part ON avail.l_partkey = p_partkey AND p_name LIKE '%widget%'
      |  JOIN y96 ON avail.l_partkey = y96.l_partkey
      |  WHERE avail.l_suppkey = s_suppkey AND avail.avail * 2 > y96.qty96)
      |ORDER BY s_suppkey""".stripMargin

  /** Full outer join: per-nation customer/supplier presence — keeps
    * nations with only customers, only suppliers, or both (the one join
    * type the rest of the suite doesn't exercise). */
  private def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir).groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, dir).groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, $"c_nationkey" === $"s_nationkey", "full_outer")
      .select(
        coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
        coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp"))
      .orderBy($"nationkey")
  }

  private val qFullOuterSql =
    """SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
      | COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust
      |      FROM customer GROUP BY c_nationkey) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_supp
      |      FROM supplier GROUP BY s_nationkey) s
      |  ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  /** TeraSort shape: global total-order sort. Spark plans this as
    * range-partition (sampled boundaries) + per-partition sort — the
    * scalable distributed sort; no single-reducer bottleneck. */
  private def qSort(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
  }

  private val qSortSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q4_order_priority" -> QueryDef(q4OrderPriority, Some(q4Sql)),
    "q6_forecast" -> QueryDef(q6Forecast, Some(q6Sql)),
    "q8_market_share" -> QueryDef(q8MarketShare, Some(q8Sql)),
    "q15_top_supplier" -> QueryDef(q15TopSupplier, Some(q15Sql)),
    "q9_profit" -> QueryDef(q9Profit, Some(q9Sql), bench = true),
    "q10_returned" -> QueryDef(q10Returned, Some(q10Sql)),
    "q12_priority_class" -> QueryDef(q12PriorityClass, Some(q12Sql)),
    "q13_cust_distribution" -> QueryDef(q13CustDistribution, Some(q13Sql)),
    "q18_large_volume" -> QueryDef(q18LargeVolume, Some(q18Sql)),
    "q21_waiting" -> QueryDef(q21Waiting, Some(q21Sql)),
    "q_sort" -> QueryDef(qSort, Some(qSortSql), bench = true),
    "q_full_outer" -> QueryDef(qFullOuter, Some(qFullOuterSql)),
    "q16_parts_suppliers" -> QueryDef(q16PartsSuppliers, Some(q16Sql)),
    "q20_promotion_stock" -> QueryDef(q20PromotionStock, Some(q20Sql))
  )
}
