package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDef.{dec, dbl, cents, pct}
import graft.sources.Tables

/** The relational core: the complete MapReduce analytics vocabulary
  * (map/filter/join/group/aggregate/sort/count/explode) the reference
  * family expresses, re-expressed as Catalyst plans. SURVEY.md §2-B.
  */
object Relational {

  /** TPC-H Q1 shape: scan-filter → partial agg → final agg. One shuffle,
    * map-side combine; filter + 7-column pruning pushed to parquet. */
  private def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Money math in exact integer cents (see QueryDef.cents): all sums
    // are int64, codegen'd, exact; converted to double identically in
    // the oracle. Units: cents*pct = 1e-4 dollars; charge = 1e-6.
    val q = round($"l_quantity").cast("long")
    val p = cents($"l_extendedprice")
    val d = pct($"l_discount")
    val t = pct($"l_tax")
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= "2000-01-01")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(q).cast("double").as("sum_qty"),
        (sum(p).cast("double") / 100.0).as("sum_base_price"),
        (sum(p * (lit(100L) - d)).cast("double") / 10000.0).as("sum_disc_price"),
        (sum(p * (lit(100L) - d) * (lit(100L) + t)).cast("double") / 1000000.0).as("sum_charge"),
        (sum(q).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(p).cast("double") / 100.0 / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS DOUBLE) AS sum_qty,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_base_price,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/10000.0 AS sum_disc_price,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_charge,
      | CAST(CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS DOUBLE)/COUNT(*) AS avg_qty,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0/COUNT(*) AS avg_price,
      | COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Predicate + projection pushdown: the scan must read 4 columns and
    * carry PushedFilters (asserted in RelationalSpec via explain). */
  private def qFilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_returnflag" === "R" && $"l_extendedprice" > 50000.0)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val qFilterProjectSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |WHERE l_returnflag = 'R' AND l_extendedprice > 50000.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q3 shape: dim-filtered customer broadcast into orders,
    * shuffle join to lineitem on orderkey, agg, top-10
    * (TakeOrderedAndProject — no global sort). */
  private def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(s, dir).filter($"o_orderdate" < "1998-01-01")
    val li = Tables.lineitem(s, dir).filter($"l_shipdate" > "1998-01-01")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey")
      .agg((sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))).cast("double") / 10000.0).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
      |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: 6-table star join. region/nation/supplier are tiny
    * → broadcast; the two fact joins shuffle on their keys once. */
  private def q5RegionalRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = Tables.region(s, dir).filter($"r_name" === "ASIA")
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1998-01-01")
    val l = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg((sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))).cast("double") / 10000.0).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val q5Sql =
    """SELECT n_name,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  private def qDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select($"c_nationkey", $"c_mktsegment")
      .distinct()
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  private val qDistinctSql =
    "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer ORDER BY c_nationkey, c_mktsegment"

  /** Global top-k: orderBy+limit planned as TakeOrderedAndProject —
    * per-partition heaps, no total sort, no single-reducer bottleneck. */
  private def qTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(25)
  }

  private val qTopkSql =
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"

  private def qSemijoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  private val qSemijoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** NOT EXISTS → left_anti: customers who never placed a >400k order
    * (plain no-orders is empty in this corpus at every sf). */
  private def qAntijoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigOrders = Tables.orders(s, dir).filter($"o_totalprice" > 400000.0)
    Tables.customer(s, dir)
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  private val qAntijoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  private def qUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir).select($"c_nationkey".as("nationkey"))
      .union(Tables.supplier(s, dir).select($"s_nationkey".as("nationkey")))
      .distinct()
      .orderBy($"nationkey")
  }

  private val qUnionSql =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  /** Rank-per-group window: top-2 orders per customer. Single shuffle on
    * the partition key; row_number with a total tiebreak for determinism. */
  private def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 2)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
      .orderBy($"o_custkey", $"rk")
  }

  private val qWindowRankSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      | FROM orders) t WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin

  /** Running (prefix) sum per user over event time — exact decimal in
    * the frame so both engines agree bitwise. */
  private def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("running", dbl(sum(dec($"value")).over(w)))
      .select($"user_id", $"event_id", $"running")
      .orderBy($"user_id", $"event_id")
  }

  private val qWindowRunningSql =
    """SELECT user_id, event_id,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |   PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** ROLLUP grouping sets; NULL markers folded to 'ALL' so both engines
    * order identically. */
  private def qRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dbl(sum(dec($"o_totalprice"))).as("total"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  private val qRollupSql =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      | COALESCE(o_orderpriority, 'ALL') AS priority,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Pivot event_type → columns (explicit value list so the output
    * schema is static — required for both Catalyst and the oracle). */
  private def qPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "view", "purchase", "signup", "error")
    Tables.events(s, dir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)
      .select($"user_id" +: types.map(t => col(t).as(s"n_$t")): _*)
      .orderBy($"user_id")
  }

  private val qPivotSql =
    """SELECT user_id,
      | COUNT(CASE WHEN event_type='click' THEN 1 END) AS n_click,
      | COUNT(CASE WHEN event_type='view' THEN 1 END) AS n_view,
      | COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS n_purchase,
      | COUNT(CASE WHEN event_type='signup' THEN 1 END) AS n_signup,
      | COUNT(CASE WHEN event_type='error' THEN 1 END) AS n_error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** JSON field extraction from a string column (the reference's core
    * parsing step, as a codegen'd path expression). */
  private def qJsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_id", get_json_object($"props", "$.k").cast("long").as("k"))
      .orderBy($"event_id")
  }

  private val qJsonExtractSql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** Canonical MapReduce word-count: explode → partial agg → top-100. */
  private def qWordcount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word")
      .limit(100)
  }

  private val qWordcountSql =
    """SELECT w AS word, COUNT(*) AS n FROM (
      | SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      |GROUP BY w ORDER BY n DESC, word LIMIT 100""".stripMargin

  /** Inverted-index document frequency: term → #docs containing it. */
  private def qDocFrequency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .groupBy($"word")
      .agg(countDistinct($"doc_id").as("df"))
      .orderBy($"word")
  }

  private val qDocFrequencySql =
    """SELECT w AS word, COUNT(DISTINCT doc_id) AS df FROM (
      | SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
      |GROUP BY w ORDER BY word""".stripMargin

  /** Full inverted index: term → sorted postings list. Postings are
    * emitted as a comma-joined string (numerically sorted doc_ids) so the
    * result is a flat scalar row the oracle can hash-compare — an array
    * column crashes the external compare harness. */
  private def qInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .groupBy($"word")
      .agg(
        array_join(sort_array(collect_set($"doc_id")).cast("array<string>"), ",")
          .as("postings"),
        countDistinct($"doc_id").as("df"))
      .orderBy($"word")
  }

  private val qInvertedIndexSql =
    """SELECT word, string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings,
      |       CAST(COUNT(*) AS BIGINT) AS df
      |FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
      |      FROM documents) t
      |GROUP BY word ORDER BY word""".stripMargin

  /** Event-time hourly aggregate (string-keyed hour for oracle parity). */
  private def qHourlyStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(date_format($"ts", "yyyy-MM-dd HH:00:00").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), dbl(sum(dec($"value"))).as("sum_value"))
      .orderBy($"hour", $"event_type")
  }

  private val qHourlyStatsSql =
    """SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour, event_type,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin

  /** Rolling 1-hour per-user event features via a RANGE-frame window —
    * the time-series velocity op (fraud counts, rate limits, feature
    * engineering). RANGE (not ROWS) so microsecond-tied peers all
    * enter the frame and the result is set-deterministic under any
    * executor order. Both engines window over the SAME integer (µs
    * epoch: Spark's ts is already ns floor-divided to µs, the oracle
    * replays epoch_ns//1000), so frame membership is bit-identical.
    * One shuffle on user_id; money summed in integer cents. */
  private def qRollingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"ts", QueryDef.cents($"value").as("_cents"))
      .select($"user_id", $"event_id",
        count(lit(1)).over(w).as("n_1h"),
        (sum($"_cents").over(w) / 100.0).as("value_1h"))
      .orderBy($"user_id", $"event_id")
  }

  private val qRollingWindowSql =
    """SELECT user_id, event_id,
      | COUNT(*) OVER w AS n_1h,
      | SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w / 100.0 AS value_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** Shared 30-min gap sessionization (window formulation): events with
    * an event-level `session_id` column. ONE shuffle on user_id serves
    * the windows and any downstream per-session aggregate. */
  private[queries] def sessionizedEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_s",
        when($"prev_ts".isNull || $"ts" > $"prev_ts" + expr("INTERVAL 30 MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum($"new_s").over(wRun))
      .drop("prev_ts", "new_s")
  }

  /** Gap-based sessionization (30-min): lag → new-session flag →
    * prefix-sum session ordinal → per-session rollup. */
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sessionizedEvents(s, dir)
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
           min($"event_id").as("first_event"),
           max($"event_id").as("last_event"))
      .orderBy($"user_id", $"session_id")
  }

  private val qSessionizeSql =
    """WITH x AS (
      | SELECT user_id, event_id, ts,
      |   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      | FROM events),
      |y AS (
      | SELECT user_id, event_id,
      |   CAST(SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
      |     OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM x)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      | MIN(event_id) AS first_event, MAX(event_id) AS last_event
      |FROM y GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** Same sessionization, via the custom SessionizePlan/Exec operator
    * (graft.plans) — one shuffle + one sort + single pass, no Window
    * buffers. Hash-verified against the identical oracle. */
  private def qSessionizePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"user_id", $"ts", $"event_id")
    graft.plans.Sessionize.withSessionIds(ev, "user_id", "ts", gapMinutes = 30)
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
           min($"event_id").as("first_event"),
           max($"event_id").as("last_event"))
      .orderBy($"user_id", $"session_id")
  }

  /** GROUP BY + HAVING: high-volume customers. */
  private def qHaving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
           (sum(cents($"o_totalprice")).cast("double") / 100.0).as("total_spent"))
      .filter($"n_orders" >= 15)
      .orderBy($"o_custkey")
  }

  private val qHavingSql =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      | CAST(CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS total_spent
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15 ORDER BY o_custkey""".stripMargin

  /** TPC-H Q17 shape: correlated per-part average via a self-aggregated
    * join (the MR "two-pass" pattern, as one reused-shuffle plan). */
  private def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val avgQ = li.groupBy($"l_partkey".as("p_key"))
      .agg((sum(round($"l_quantity").cast("long")).cast("double") / count(lit(1))).as("avg_qty"))
    li.join(avgQ, $"l_partkey" === $"p_key")
      .filter($"l_quantity" < $"avg_qty" * 0.5)
      .groupBy($"l_partkey")
      .agg(count(lit(1)).as("n_small"),
           (sum(cents($"l_extendedprice")).cast("double") / 100.0).as("small_revenue"))
      .filter($"n_small" >= 3)
      .orderBy($"l_partkey")
  }

  private val q17Sql =
    """WITH a AS (
      | SELECT l_partkey AS p_key,
      |  CAST(CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS DOUBLE)/COUNT(*) AS avg_qty
      | FROM lineitem GROUP BY l_partkey)
      |SELECT l_partkey, COUNT(*) AS n_small,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS small_revenue
      |FROM lineitem JOIN a ON l_partkey = p_key
      |WHERE l_quantity < avg_qty * 0.5
      |GROUP BY l_partkey HAVING COUNT(*) >= 3 ORDER BY l_partkey""".stripMargin

  /** Exact distributed median/p90 per group (sort-based percentile). */
  private def qPercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("med"),
           round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
      .orderBy($"o_orderpriority")
  }

  private val qPercentileSql =
    """SELECT o_orderpriority,
      | ROUND(quantile_cont(o_totalprice, 0.5), 4) AS med,
      | ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Sketch aggregates: HLL distinct next to exact. The raw HLL estimate
    * is not oracle-reproducible, so the query emits the exact count plus
    * a boolean "estimate within 5% of exact" — deterministic on both
    * sides (Spark's HLL at rsd=0.01 is far inside the 5% bound), so the
    * whole row hash-compares. */
  private def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact_parts"),
           approx_count_distinct($"l_partkey", 0.01).as("approx"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"approx" - $"exact_parts") <= $"exact_parts" * 0.05).as("approx_ok"))
      .orderBy($"l_returnflag")
  }

  private val qApproxDistinctSql =
    """SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      | TRUE AS approx_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Sketch quantiles: approx_percentile (the distributed quantile
    * sketch) next to the exact value, with a "within 2% relative
    * error" boolean — same oracle trick as q_approx_distinct. */
  private def qApproxQuantile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("exact_med"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_med"))
      .select($"o_orderpriority",
        round($"exact_med", 4).as("exact_med"),
        (abs($"approx_med" - $"exact_med") <= $"exact_med" * 0.02).as("approx_ok"))
      .orderBy($"o_orderpriority")
  }

  private val qApproxQuantileSql =
    """SELECT o_orderpriority,
      | ROUND(quantile_cont(o_totalprice, 0.5), 4) AS exact_med,
      | TRUE AS approx_ok
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** SCD type-2 interval build: each user's events become validity
    * ranges [valid_from, valid_to) via lead() — the standard
    * dimension-history construction, one shuffle on the entity key. */
  private def qScd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .withColumn("is_current", $"valid_to".isNull)
      .select($"user_id", $"event_id", $"ts".as("valid_from"), $"valid_to",
        $"is_current", dbl(dec($"value")).as("value"))
      .orderBy($"user_id", $"valid_from", $"event_id")
  }

  private val qScd2Sql =
    """SELECT user_id, event_id, ts AS valid_from,
      | LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      | LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current,
      | CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
      |FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  /** Window-function suite: lead, ntile, percent_rank, cume_dist,
    * first_value over one shuffle-shared window spec. */
  private def qWindowSuite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(s, dir)
      .filter($"o_custkey" < 20)
      .select(
        $"o_orderpriority", $"o_orderkey", $"o_totalprice",
        lead($"o_orderkey", 1).over(w).as("next_order"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 9).as("pct_rank"),
        round(cume_dist().over(w), 9).as("cume"),
        first_value($"o_orderkey").over(w).as("cheapest"))
      .orderBy($"o_orderpriority", $"o_orderkey")
  }

  private val qWindowSuiteSql =
    """SELECT o_orderpriority, o_orderkey, o_totalprice,
      | LEAD(o_orderkey, 1) OVER w AS next_order,
      | NTILE(4) OVER w AS quartile,
      | ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
      | ROUND(CUME_DIST() OVER w, 9) AS cume,
      | FIRST_VALUE(o_orderkey) OVER w AS cheapest
      |FROM orders WHERE o_custkey < 20
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Funnel: per-user view→purchase conversion within 30-min sessions —
    * sessionize → per-session flags → per-user rates. The composite
    * the reference family would need 3 chained MR jobs for. */
  private def qFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sess = sessionizedEvents(s, dir)
      .groupBy($"user_id", $"session_id")
      .agg(
        max(when($"event_type" === "view", 1).otherwise(0)).as("has_view"),
        max(when($"event_type" === "purchase", 1).otherwise(0)).as("has_purchase"))
    sess.groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        count(when($"has_view" === 1, 1)).as("view_sessions"),
        count(when($"has_view" === 1 && $"has_purchase" === 1, 1)).as("converted"))
      .withColumn("conv_rate",
        when($"view_sessions" === 0, lit(null).cast("double"))
          .otherwise($"converted".cast("double") / $"view_sessions"))
      .orderBy($"user_id")
  }

  private val qFunnelSql =
    """WITH x AS (
      | SELECT user_id, event_id, ts, event_type,
      |   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      | FROM events),
      |y AS (
      | SELECT user_id, event_type,
      |   CAST(SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
      |     OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM x),
      |sess AS (
      | SELECT user_id, session_id,
      |   MAX(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS has_view,
      |   MAX(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS has_purchase
      | FROM y GROUP BY user_id, session_id)
      |SELECT user_id, COUNT(*) AS n_sessions,
      | COUNT(CASE WHEN has_view=1 THEN 1 END) AS view_sessions,
      | COUNT(CASE WHEN has_view=1 AND has_purchase=1 THEN 1 END) AS converted,
      | CAST(COUNT(CASE WHEN has_view=1 AND has_purchase=1 THEN 1 END) AS DOUBLE)
      |   / NULLIF(COUNT(CASE WHEN has_view=1 THEN 1 END), 0) AS conv_rate
      |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Custom typed Aggregator (UDAF): quantity-weighted mean price per
    * return flag. Exact integer accumulation → oracle-identical. */
  private def qWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.udf.register("graft_wavg",
      org.apache.spark.sql.functions.udaf(graft.functions.WeightedMean))
    Tables.lineitem(s, dir)
      .select($"l_returnflag",
        cents($"l_extendedprice").as("pc"),
        round($"l_quantity").cast("long").as("w"))
      .groupBy($"l_returnflag")
      .agg(expr("graft_wavg(pc, w)").as("wavg_price"))
      .orderBy($"l_returnflag")
  }

  private val qWeightedAvgSql =
    """SELECT l_returnflag,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |   / CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) / 100.0 AS wavg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Set operations: INTERSECT / EXCEPT. */
  private def qIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir).select($"c_nationkey".as("nationkey")).distinct()
      .intersect(Tables.supplier(s, dir).select($"s_nationkey".as("nationkey")).distinct())
      .orderBy($"nationkey")
  }

  private val qIntersectSql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  /** EXCEPT: orders with no returned lineitem (non-empty at every sf). */
  private def qExcept(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir).select($"o_orderkey".as("orderkey"))
      .except(Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
        .select($"l_orderkey".as("orderkey")))
      .orderBy($"orderkey")
  }

  private val qExceptSql =
    """SELECT o_orderkey AS orderkey FROM orders
      |EXCEPT SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY orderkey""".stripMargin

  /** Full CUBE grouping sets. */
  private def qCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .cube($"event_type", ($"user_id" % 10).as("user_bucket"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce($"event_type", lit("ALL")).as("event_type"),
        coalesce($"user_bucket".cast("string"), lit("ALL")).as("user_bucket"), $"n")
      .orderBy($"event_type", $"user_bucket")
  }

  private val qCubeSql =
    """SELECT COALESCE(event_type, 'ALL') AS event_type,
      | COALESCE(CAST(user_bucket AS VARCHAR), 'ALL') AS user_bucket,
      | COUNT(*) AS n
      |FROM (SELECT event_type, user_id % 10 AS user_bucket FROM events) t
      |GROUP BY CUBE(event_type, user_bucket)
      |ORDER BY event_type, user_bucket""".stripMargin

  /** TPC-H Q14 shape: conditional-aggregate ratio over a fact⋈dim join. */
  private def q14PromoRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1998-01-01")
    val rev = sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount")))
    val promoRev = sum(when($"p_type" === "PROMO",
      cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))).otherwise(0L))
    li.join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
      .agg((promoRev.cast("double") * 100.0 / rev.cast("double")).as("promo_pct"))
  }

  private val q14Sql =
    """SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
      |   THEN CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
      |   ELSE 0 END) AS BIGINT) AS DOUBLE) * 100.0
      | / CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)
      | AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'""".stripMargin

  /** Argmin-per-group (TPC-H Q2 shape): cheapest supplier per nation. */
  private def qArgmin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal", $"s_suppkey")
    Tables.supplier(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"s_nationkey", $"s_suppkey", $"s_acctbal")
      .orderBy($"s_nationkey")
  }

  private val qArgminSql =
    """SELECT s_nationkey, s_suppkey, s_acctbal FROM (
      | SELECT s_nationkey, s_suppkey, s_acctbal,
      |  ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS rk
      | FROM supplier) t WHERE rk = 1 ORDER BY s_nationkey""".stripMargin

  /** TPC-H Q7 shape: bidirectional nation-pair trade volume by year. */
  private def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = Tables.nation(s, dir).select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(s, dir).select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"sk")
      .join(broadcast(n2), $"c_nationkey" === $"ck")
      .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
              ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
      .agg((sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))).cast("double") / 10000.0).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  private val q7Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      | YEAR(l_shipdate) AS l_year,
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q19 shape: disjunctive multi-column predicates (exercises
    * OR-pushdown and join-condition hoisting). */
  private def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 20)) ||
        ($"p_brand" === "Brand#2" && $"p_size".between(10, 30) && $"l_quantity".between(10, 30)) ||
        ($"p_type" === "PROMO" && $"l_quantity" >= 25))
      .agg(
        (sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))).cast("double") / 10000.0).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q19Sql =
    """SELECT
      | CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/10000.0 AS revenue,
      | COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_type = 'PROMO' AND l_quantity >= 25)""".stripMargin

  /** TPC-H Q22 shape: scalar-subquery threshold + anti-join. */
  private def q22RichIdle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
    val avgBal = cust.filter($"c_acctbal" > 0.0)
      .agg((sum(cents($"c_acctbal")).cast("double") / 100.0 / count(lit(1))).as("avg_bal"))
    val bigOrders = Tables.orders(s, dir).filter($"o_totalprice" > 400000.0)
    cust.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
           (sum(cents($"c_acctbal")).cast("double") / 100.0).as("total_bal"))
      .orderBy($"c_mktsegment")
  }

  private val q22Sql =
    """WITH t AS (
      |  SELECT CAST(CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0/COUNT(*) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c_mktsegment, COUNT(*) AS numcust,
      | CAST(CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS total_bal
      |FROM customer, t
      |WHERE c_acctbal > avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Same result as q_window_rank via the heap-based GroupTopK custom
    * operator: no sort, no Window — one exchange + bounded heaps. */
  private def qGroupTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.GroupTopK.topK(
      Tables.orders(s, dir).select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      groupCols = Seq("o_custkey"),
      orderBy = Seq(graft.plans.GroupTopK.Sort("o_totalprice", desc = true), graft.plans.GroupTopK.Sort("o_orderkey")),
      k = 2)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
      .orderBy($"o_custkey", $"rk")
  }

  /** Interval join: events ⋈ their own session windows via the
    * bucketized RangeJoin. Self-validating — counts must equal the
    * sessionizer's n_events (sessions are time-disjoint per user). */
  private def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sess = sessionizedEvents(s, dir)
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("start_ts"), max($"ts").as("end_ts"))
    val pts = Tables.events(s, dir).select($"user_id", $"ts", $"event_id")
    graft.operators.RangeJoin.intervalJoin(pts, sess, "user_id", "ts", "start_ts", "end_ts")
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_points"))
      .orderBy($"user_id", $"session_id")
  }

  private val qIntervalJoinSql =
    """WITH x AS (
      | SELECT user_id, event_id, ts,
      |   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      | FROM events),
      |y AS (
      | SELECT user_id, ts,
      |   CAST(SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
      |     OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM x),
      |s AS (
      | SELECT user_id, session_id, MIN(ts) AS start_ts, MAX(ts) AS end_ts
      | FROM y GROUP BY user_id, session_id)
      |SELECT s.user_id AS user_id, s.session_id AS session_id, COUNT(*) AS n_points
      |FROM s JOIN events e ON e.user_id = s.user_id
      |  AND e.ts >= s.start_ts AND e.ts <= s.end_ts
      |GROUP BY s.user_id, s.session_id ORDER BY user_id, session_id""".stripMargin

  /** Distributed grep — the other canonical MR example: regex filter
    * over documents, with match counts. */
  private def qGrep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter($"text".rlike("hash (join|agg)"))
      .select($"doc_id", regexp_count($"text", lit("hash (join|agg)")).as("matches"))
      .orderBy($"doc_id")
  }

  private val qGrepSql =
    """SELECT doc_id, CAST(len(regexp_extract_all(text, 'hash (join|agg)')) AS BIGINT) AS matches
      |FROM documents WHERE regexp_matches(text, 'hash (join|agg)')
      |ORDER BY doc_id""".stripMargin

  /** Histogram: fixed-width value buckets over events. */
  private def qHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(floor($"value" / 25.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"bucket")
  }

  private val qHistogramSql =
    """SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bucket, COUNT(*) AS n
      |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Date-dimension aggregation: seasonality by order month. */
  private def qSeasonality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("y"), month($"o_orderdate").as("m"))
      .agg(count(lit(1)).as("n_orders"),
           (sum(cents($"o_totalprice")).cast("double") / 100.0).as("revenue"))
      .orderBy($"y", $"m")
  }

  private val qSeasonalitySql =
    """SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
      | COUNT(*) AS n_orders,
      | CAST(CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS revenue
      |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin

  /** String-function suite: upper/substr/concat/length/trim parity. */
  private def qStringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select(
        $"c_custkey",
        upper($"c_name").as("uname"),
        substring($"c_name", 1, 8).as("prefix"),
        concat($"c_mktsegment", lit(":"), $"c_nationkey".cast("string")).as("seg_nat"),
        length($"c_name").cast("long").as("name_len"),
        trim(lpad($"c_custkey".cast("string"), 8, "0")).as("padded_key"))
      .orderBy($"c_custkey")
  }

  private val qStringFuncsSql =
    """SELECT c_custkey,
      | UPPER(c_name) AS uname,
      | SUBSTR(c_name, 1, 8) AS prefix,
      | c_mktsegment || ':' || CAST(c_nationkey AS VARCHAR) AS seg_nat,
      | CAST(LENGTH(c_name) AS BIGINT) AS name_len,
      | TRIM(LPAD(CAST(c_custkey AS VARCHAR), 8, '0')) AS padded_key
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Wide→long melt (the inverse of q_pivot): per-returnflag measure
    * columns unpivoted into (measure, value) rows via the native
    * UNPIVOT operator (an Expand node — each input row emits one row
    * per measure INSIDE the stage, no exchange added). At 100 TB the
    * melt itself is free: the only shuffle is the feeding aggregate,
    * and Expand widens rows after the partial/final agg has already
    * collapsed cardinality. Money math follows the q1 convention:
    * exact integer cents, converted to double identically on both
    * engines. */
  private def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = cents($"l_extendedprice")
    val d = pct($"l_discount")
    val wide = Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        sum(round($"l_quantity").cast("long")).cast("double").as("sum_qty"),
        (sum(p).cast("double") / 100.0).as("sum_price"),
        (sum(p * d).cast("double") / 10000.0).as("sum_disc"))
    wide.unpivot(
        Array($"l_returnflag"),
        Array($"sum_qty", $"sum_price", $"sum_disc"),
        "measure", "value")
      .orderBy($"l_returnflag", $"measure")
  }

  private val qUnpivotSql =
    """WITH a AS (
      |  SELECT l_returnflag,
      |   CAST(CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS DOUBLE) AS sum_qty,
      |   CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_price,
      |   CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/10000.0 AS sum_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, measure, value FROM (
      |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
      |  UNION ALL SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM a
      |  UNION ALL SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS value FROM a) u
      |ORDER BY l_returnflag, measure""".stripMargin

  /** Grouped ordered list-aggregation (LISTAGG/string_agg): per
    * segment, the numerically-sorted csv of member keys. Sorting
    * inside the aggregate makes the result set-deterministic (executor
    * arrival order can never leak into the string). Scale note:
    * list-agg output is inherently group-sized — at 100 TB you bound
    * it (filter first, as here, or cap with slice) or the single
    * group row becomes the straggler; the aggregation itself stays
    * map-side partial. */
  private def qStringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir).filter($"c_custkey" <= 100)
      .groupBy($"c_mktsegment")
      .agg(
        array_join(transform(array_sort(collect_list($"c_custkey")),
          x => x.cast("string")), ",").as("keys"),
        count(lit(1)).as("n"))
      .orderBy($"c_mktsegment")
  }

  private val qStringAggSql =
    """SELECT c_mktsegment,
      | string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) AS keys,
      | COUNT(*) AS n
      |FROM customer WHERE c_custkey <= 100
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Time-series gap filling: generate the full hourly spine between
    * the corpus' first and last event hour (sequence-explode of a
    * 1-row bounds aggregate — no driver loop), left-join the hourly
    * counts onto it, and zero-fill missing hours. The spine side is
    * O(hours) — tiny — so at scale it broadcasts into the join and
    * the only real cost is the hourly pre-aggregate's single shuffle.
    * Hours surface as formatted strings (the q_hourly_stats
    * convention) so both engines hash identical values. */
  private def qGapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, dir)
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"))
    val spine = hourly.agg(min($"h").as("h0"), max($"h").as("h1"))
      .select(explode(sequence($"h0", $"h1", expr("interval 1 hour"))).as("h"))
    spine.join(hourly, Seq("h"), "left")
      .select(date_format($"h", "yyyy-MM-dd HH:00:00").as("hour"),
        coalesce($"n", lit(0L)).as("n"))
      .orderBy($"hour")
  }

  private val qGapFillSql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n FROM events GROUP BY h),
      |spine AS (
      |  SELECT UNNEST(generate_series((SELECT MIN(h) FROM hourly),
      |                                (SELECT MAX(h) FROM hourly),
      |                                INTERVAL 1 HOUR)) AS h)
      |SELECT strftime(spine.h, '%Y-%m-%d %H:00:00') AS hour,
      |  COALESCE(hourly.n, 0) AS n
      |FROM spine LEFT JOIN hourly ON spine.h = hourly.h
      |ORDER BY hour""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_gap_fill" -> QueryDef(qGapFill, Some(qGapFillSql)),
    "q_string_agg" -> QueryDef(qStringAgg, Some(qStringAggSql)),
    "q_unpivot" -> QueryDef(qUnpivot, Some(qUnpivotSql)),
    "q_seasonality" -> QueryDef(qSeasonality, Some(qSeasonalitySql)),
    "q_string_funcs" -> QueryDef(qStringFuncs, Some(qStringFuncsSql)),
    "q_grep" -> QueryDef(qGrep, Some(qGrepSql)),
    "q_histogram" -> QueryDef(qHistogram, Some(qHistogramSql)),
    "q_interval_join" -> QueryDef(qIntervalJoin, Some(qIntervalJoinSql)),
    "q_group_topk" -> QueryDef(qGroupTopk, Some(qWindowRankSql), bench = true),
    "q7_volume_shipping" -> QueryDef(q7VolumeShipping, Some(q7Sql)),
    "q19_disjunctive" -> QueryDef(q19Disjunctive, Some(q19Sql)),
    "q22_rich_idle" -> QueryDef(q22RichIdle, Some(q22Sql)),
    "q14_promo_ratio" -> QueryDef(q14PromoRatio, Some(q14Sql)),
    "q_argmin" -> QueryDef(qArgmin, Some(qArgminSql)),
    "q_weighted_avg" -> QueryDef(qWeightedAvg, Some(qWeightedAvgSql)),
    "q_intersect" -> QueryDef(qIntersect, Some(qIntersectSql)),
    "q_except" -> QueryDef(qExcept, Some(qExceptSql)),
    "q_cube" -> QueryDef(qCube, Some(qCubeSql)),
    "q_window_suite" -> QueryDef(qWindowSuite, Some(qWindowSuiteSql)),
    "q_rolling_window" -> QueryDef(qRollingWindow, Some(qRollingWindowSql)),
    "q_scd2" -> QueryDef(qScd2, Some(qScd2Sql)),
    "q_funnel" -> QueryDef(qFunnel, Some(qFunnelSql), bench = true),
    "q_having" -> QueryDef(qHaving, Some(qHavingSql)),
    "q17_small_quantity" -> QueryDef(q17SmallQuantity, Some(q17Sql), bench = true),
    "q_percentile" -> QueryDef(qPercentile, Some(qPercentileSql)),
    "q_approx_distinct" -> QueryDef(qApproxDistinct, Some(qApproxDistinctSql)),
    "q_approx_quantile" -> QueryDef(qApproxQuantile, Some(qApproxQuantileSql)),
    "q_sessionize_plan" -> QueryDef(qSessionizePlan, Some(qSessionizeSql), bench = true),
    "q1_pricing_summary" -> QueryDef(q1PricingSummary, Some(q1Sql), bench = true),
    "q_filter_project" -> QueryDef(qFilterProject, Some(qFilterProjectSql)),
    "q3_top_orders" -> QueryDef(q3TopOrders, Some(q3Sql), bench = true),
    "q5_regional_revenue" -> QueryDef(q5RegionalRevenue, Some(q5Sql), bench = true),
    "q_distinct" -> QueryDef(qDistinct, Some(qDistinctSql)),
    "q_topk" -> QueryDef(qTopk, Some(qTopkSql)),
    "q_semijoin" -> QueryDef(qSemijoin, Some(qSemijoinSql)),
    "q_antijoin" -> QueryDef(qAntijoin, Some(qAntijoinSql)),
    "q_union" -> QueryDef(qUnion, Some(qUnionSql)),
    "q_window_rank" -> QueryDef(qWindowRank, Some(qWindowRankSql), bench = true),
    "q_window_running" -> QueryDef(qWindowRunning, Some(qWindowRunningSql), bench = true),
    "q_rollup" -> QueryDef(qRollup, Some(qRollupSql)),
    "q_pivot" -> QueryDef(qPivot, Some(qPivotSql)),
    "q_json_extract" -> QueryDef(qJsonExtract, Some(qJsonExtractSql)),
    "q_wordcount" -> QueryDef(qWordcount, Some(qWordcountSql), bench = true),
    "q_doc_frequency" -> QueryDef(qDocFrequency, Some(qDocFrequencySql)),
    "q_inverted_index" -> QueryDef(qInvertedIndex, Some(qInvertedIndexSql)),
    "q_hourly_stats" -> QueryDef(qHourlyStats, Some(qHourlyStatsSql)),
    "q_sessionize" -> QueryDef(qSessionize, Some(qSessionizeSql), bench = true)
  )
}
