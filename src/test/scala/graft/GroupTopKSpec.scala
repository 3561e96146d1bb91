package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GroupTopK

class GroupTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("matches the window-function formulation exactly") {
    val win = queries.Relational.defs("q_window_rank").fn(spark, TestSpark.sf)
    val heap = queries.Relational.defs("q_group_topk").fn(spark, TestSpark.sf)
    assert(win.exceptAll(heap).count() == 0 && heap.exceptAll(win).count() == 0)
  }

  test("plan has no Sort and no Window, exactly one exchange") {
    import spark.implicits._
    val df = GroupTopK.topK(
      graft.sources.Tables.orders(spark, TestSpark.sf)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      Seq("o_custkey"), Seq(GroupTopK.Sort("o_totalprice", desc = true), GroupTopK.Sort("o_orderkey")), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("TopKRewrite: window row_number filter plans as GroupTopKExec with equal results") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    def windowTopK = graft.sources.Tables.orders(spark, TestSpark.sf)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")))
      .filter($"rk" <= 2)
    val expected = windowTopK.collect().toSet // rule off: plain window plan
    graft.plans.AutoTopK.enable(spark)
    try {
      val rewritten = windowTopK
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("GroupTopK"), plan)
      assert(!plan.contains("Window"), plan)
      assert(rewritten.collect().toSet == expected)
    } finally graft.plans.AutoTopK.disable(spark)
    // rule off again: back to the window plan
    assert(windowTopK.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("GraftSession.enableExtensions makes q_window_rank-shaped filters plan as the heap exec") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the default-on path Verify/Bench/Smoke run through — not the
    // test-only AutoTopK toggle
    graft.GraftSession.enableExtensions(spark)
    try {
      val q = graft.sources.Tables.orders(spark, TestSpark.sf)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .withColumn("rk", row_number().over(
          Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")))
        .filter($"rk" <= 3)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("GroupTopK"), s"rewrite did not fire:\n$plan")
      assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    } finally graft.plans.AutoTopK.disable(spark)
  }

  test("TopKRewrite leaves rank()/mismatched filters alone") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    graft.plans.AutoTopK.enable(spark)
    try {
      val ranked = graft.sources.Tables.orders(spark, TestSpark.sf)
        .select($"o_custkey", $"o_orderkey")
        .withColumn("rk", rank().over(
          Window.partitionBy($"o_custkey").orderBy($"o_orderkey")))
        .filter($"rk" <= 2)
      assert(ranked.queryExecution.executedPlan.toString.contains("Window"))
      val wrongFilter = graft.sources.Tables.orders(spark, TestSpark.sf)
        .select($"o_custkey", $"o_orderkey")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"o_custkey").orderBy($"o_orderkey")))
        .filter($"rn" >= 2) // bottom-k is not top-k
      assert(wrongFilter.queryExecution.executedPlan.toString.contains("Window"))
    } finally graft.plans.AutoTopK.disable(spark)
  }

  test("ties + small groups + k larger than group") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), // all tied → id order
      (2L, 20L, 1.0)                                    // group smaller than k
    ).toDF("g", "id", "v")
    val got = GroupTopK.topK(df, Seq("g"), Seq(GroupTopK.Sort("v", desc = true), GroupTopK.Sort("id")), 2)
      .select($"g", $"id", $"rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(got.toSeq == Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1)))
  }

  test("partial-pass overflow: a cap of 1 group still yields the exact top-k") {
    import spark.implicits._
    // 500 groups x 10 rows spread over 8 partitions: with the map-side
    // heap map capped at ONE group, almost every row takes the
    // pass-through branch — the final pass must still produce exactly
    // the window answer.
    val df = spark.range(5000).repartition(8)
      .select(($"id" % 500).as("g"), $"id", ($"id" % 7).cast("double").as("v"))
    def reference = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      df.withColumn("rk", row_number().over(
          Window.partitionBy($"g").orderBy($"v".desc, $"id")))
        .filter($"rk" <= 3).collect().toSet
    }
    val expected = reference
    val saved = graft.plans.GroupTopKExec.MaxPartialGroups
    try {
      graft.plans.GroupTopKExec.MaxPartialGroups = 1
      val got = GroupTopK.topK(df, Seq("g"),
        Seq(GroupTopK.Sort("v", desc = true), GroupTopK.Sort("id")), 3)
        .select($"g", $"id", $"v", $"rk").collect().toSet
      assert(got == expected)
    } finally graft.plans.GroupTopKExec.MaxPartialGroups = saved
  }
}
