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
    spark.stop()
  }
}
