package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc perf breakdown for hot queries: sbt "runMain graft.tools.Perf". */
object Perf {
  def time(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"PERF $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
  }

  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    import spark.implicits._

    val ev = graft.sources.Tables.events(spark, dir)
    // warm
    noop(ev.groupBy($"event_type").count())

    time("events_scan")(noop(ev))
    // the REAL ctr_referrer sub-pipeline (shared builders from Ctr)
    val impLines = graft.queries.Ctr.impressionLines(spark, dir)
    time("imp_to_json")(noop(impLines))
    val parsed = graft.sources.JsonLogs.parse(impLines, graft.queries.Ctr.impSchema)
    time("imp_parse")(noop(parsed))
    time("full_ctr")(noop(graft.queries.Ctr.defs("ctr_referrer").fn(spark, dir)))
    time("full_ctr_again")(noop(graft.queries.Ctr.defs("ctr_referrer").fn(spark, dir)))

    time("q1")(noop(graft.queries.Relational.defs("q1_pricing_summary").fn(spark, dir)))
    time("q1_again")(noop(graft.queries.Relational.defs("q1_pricing_summary").fn(spark, dir)))

    // GroupTopK vs Window at a size where the sort matters (5M rows,
    // 1k groups of 5k rows each, top-3)
    import org.apache.spark.sql.expressions.Window
    val big = spark.range(5000000L)
      .select(($"id" % 1000).as("g"), (($"id" * 2654435761L) % 1000000).as("v"), $"id")
    big.persist(); big.count()
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    time("topk_window_5m")(noop(
      big.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)))
    time("topk_window_5m_2")(noop(
      big.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)))
    time("topk_heap_5m")(noop(graft.plans.GroupTopK.topK(
      big, Seq("g"), Seq(graft.plans.GroupTopK.Sort("v", desc = true),
        graft.plans.GroupTopK.Sort("id")), 3)))
    time("topk_heap_5m_2")(noop(graft.plans.GroupTopK.topK(
      big, Seq("g"), Seq(graft.plans.GroupTopK.Sort("v", desc = true),
        graft.plans.GroupTopK.Sort("id")), 3)))
    big.unpersist()

    // Misra-Gries sketch vs full groupBy on a wide-dictionary skewed
    // stream (10M items, ~1M distinct): the sketch shuffles k-entry
    // maps; the groupBy shuffles every distinct key
    val zipfy = spark.range(10000000L)
      .select(concat(lit("t"),
        when(($"id" % 10) < 3, ($"id" % 7))             // hot keys
          .otherwise(($"id" * 2654435761L) % 1000000)   // long tail
          .cast("string")).as("w"))
    zipfy.persist(); zipfy.count()
    val hh = udaf(new graft.functions.HeavyHitters(50))
    time("hh_sketch_10m")(noop(zipfy.agg(hh($"w").as("c"))))
    time("hh_sketch_10m_2")(noop(zipfy.agg(hh($"w").as("c"))))
    time("hh_groupby_10m")(noop(
      zipfy.groupBy($"w").count().orderBy($"count".desc).limit(50)))
    time("hh_groupby_10m_2")(noop(
      zipfy.groupBy($"w").count().orderBy($"count".desc).limit(50)))
    zipfy.unpersist()
    spark.stop()
  }
}
