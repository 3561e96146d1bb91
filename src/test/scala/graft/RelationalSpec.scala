package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  def run(name: String) = SparkEntry.all(name).fn(spark, sf)

  test("q1 aggregates the full filtered lineitem") {
    val rows = run("q1_pricing_summary").collect()
    assert(rows.nonEmpty && rows.length <= 9) // |returnflag| x |linestatus|
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter("l_shipdate <= '2000-01-01'").count()
    assert(total == expected)
  }

  test("q_unpivot melts each wide row into exactly one row per measure") {
    val rows = run("q_unpivot").collect()
    val flags = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag").distinct().count()
    assert(rows.length == 3 * flags)
    // melt preserves values: sum_qty rows must equal the wide aggregate
    val wideQty = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_returnflag", "CAST(ROUND(l_quantity) AS LONG) AS q")
      .groupBy("l_returnflag").sum("q")
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble)).toMap
    val meltQty = rows.filter(_.getAs[String]("measure") == "sum_qty")
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Double]("value"))).toMap
    assert(meltQty == wideQty)
    // no exchange introduced above the aggregate by the melt
    val plan = run("q_unpivot").queryExecution.optimizedPlan.toString
    assert(plan.contains("Expand"), s"unpivot did not plan as Expand:\n$plan")
  }

  test("filter+projection are pushed into the parquet scan") {
    val plan = run("q_filter_project").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert(plan.contains("l_returnflag"), "filter column not pushed")
    // pruned read schema: only the 3 needed columns + filter column
    assert(!plan.contains("l_comment") && !plan.contains("l_tax"))
  }

  test("q_rolling_window: 1-hour RANGE frame includes the boundary, drops older") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted: user 1 at t=0s, 3599s, 3600s, 7200s; user 2 at t=0s
    val ev = Seq(
      (1L, 10L, 0L, 1.00), (1L, 11L, 3599L, 2.00),
      (1L, 12L, 3600L, 4.00), (1L, 13L, 7200L, 8.00),
      (2L, 20L, 0L, 16.00))
      .toDF("user_id", "event_id", "secs", "value")
      .withColumn("ts", timestamp_seconds($"secs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600000000L, 0L)
    val got = ev.select($"user_id", $"event_id",
        count(lit(1)).over(w).as("n_1h"),
        (sum(graft.queries.QueryDef.cents($"value")).over(w) / 100.0).as("value_1h"))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got(10L) == (1L, 1.00))
    assert(got(11L) == (2L, 3.00)) // 3599s ago: in frame
    assert(got(12L) == (3L, 7.00)) // exactly 3600s ago: boundary included
    assert(got(13L) == (2L, 12.00)) // 0s and 3599s dropped, 3600s+7200s in
    assert(got(20L) == (1L, 16.00)) // partitioned per user
  }

  test("global top-k plans as TakeOrderedAndProject (no total sort)") {
    val plan = run("q_topk").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("q5 broadcasts the dimension tables") {
    val plan = run("q5_regional_revenue").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q9 profit rollup joins every dim by broadcast (no sort-merge)") {
    val plan = run("q9_profit").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ (dim not broadcast):\n$plan")
  }

  test("q_sort plans as a range-partitioned distributed sort") {
    val plan = run("q_sort").queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"no range partitioning:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-reducer sort:\n$plan")
  }

  test("q16 filters parts before the distinct shuffle") {
    // the broadcast join must sit BELOW the distinct's aggregate, so
    // excluded parts never shuffle
    // compare against the BOTTOM-most aggregate (the distinct): the
    // topmost/final groupBy always prints before the join either way
    val plan = run("q16_parts_suppliers").queryExecution.executedPlan.toString
    val joinAt = plan.indexOf("BroadcastHashJoin")
    val lastAggAt = plan.lastIndexOf("HashAggregate")
    assert(joinAt >= 0 && lastAggAt >= 0 && joinAt > lastAggAt,
      s"join must sit under the distinct aggregate (print after it):\n$plan")
  }

  test("semijoin + antijoin partition the big-spender customer set") {
    // semijoin: customers with orders; antijoin variant uses >400k filter
    val semi = run("q_semijoin").count()
    val anti = run("q_antijoin").count()
    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(semi <= total && anti <= total)
    assert(anti > 0, "antijoin should be non-empty on this corpus")
  }

  test("sessionize: session ids are dense per user and gaps split sessions") {
    import spark.implicits._
    val sess = run("q_sessionize")
    val bad = sess.groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max($"session_id").as("mx"),
           org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .filter($"mx" =!= $"n").count()
    assert(bad == 0, "session ids must be dense 1..n per user")
  }

  test("wordcount totals equal token count") {
    import spark.implicits._
    val n = run("q_wordcount").agg(org.apache.spark.sql.functions.sum($"n")).as[Long].head()
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("sum(size(split(text, ' '))) s").as[Long].head()
    assert(n == toks) // vocab is small → top-100 covers all words
  }
}
