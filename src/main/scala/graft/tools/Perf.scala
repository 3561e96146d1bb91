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
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ev = graft.sources.Tables.events(spark, dir)
    // warm
    noop(ev.groupBy($"event_type").count())

    time("events_scan")(noop(ev))
    val impLines = ev.select(concat(
      lit("ts="), $"event_id".cast("string"), lit(" "),
      to_json(struct(
        $"event_id".cast("string").as("impressionId"),
        concat(lit("r"), ($"user_id" % 7).cast("string")).as("referrer"),
        concat(lit("ad"), ($"event_id" % 13).cast("string")).as("adId")))).as("value"))
    time("imp_to_json")(noop(impLines))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("impressionId", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("referrer", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("adId", org.apache.spark.sql.types.StringType)))
    val parsed = graft.sources.JsonLogs.parse(impLines, schema)
    time("imp_parse")(noop(parsed))
    time("full_ctr")(noop(graft.queries.Ctr.defs("ctr_referrer").fn(spark, dir)))
    time("full_ctr_again")(noop(graft.queries.Ctr.defs("ctr_referrer").fn(spark, dir)))
    time("full_ctr_3")(noop(graft.queries.Ctr.defs("ctr_referrer").fn(spark, dir)))

    time("q1_decimal")(noop(graft.queries.Relational.defs("q1_pricing_summary").fn(spark, dir)))
    time("q1_again")(noop(graft.queries.Relational.defs("q1_pricing_summary").fn(spark, dir)))
    val li = graft.sources.Tables.lineitem(spark, dir)
    time("q1_double_sums")(noop(
      li.filter($"l_shipdate" <= "2000-01-01")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity"), sum($"l_extendedprice"), count(lit(1)))))
    time("q1_cents_sums")(noop(
      li.filter($"l_shipdate" <= "2000-01-01")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum(round($"l_quantity").cast("long")),
             sum(round($"l_extendedprice" * 100).cast("long")),
             sum(round($"l_extendedprice" * 100).cast("long") * (lit(100L) - round($"l_discount" * 100).cast("long"))),
             count(lit(1)))))
    spark.stop()
  }
}
