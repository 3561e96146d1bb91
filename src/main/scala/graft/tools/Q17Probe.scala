package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B probe for the TPC-H Q17 shape (r6 verdict watch item): the
  * self-aggregated join (two lineitem scans; AQE broadcasts the
  * per-part average at small sf, sort-merge at large) versus a single
  * window over l_partkey (one scan, one exchange, the post-window
  * aggregate reuses the partitioning). Run at sf0.1 and sf1:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Q17Probe"
  */
object Q17Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    import spark.implicits._

    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
    def li = graft.sources.Tables.lineitem(spark, dir)

    def joinVariant: DataFrame = {
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

    def windowVariant: DataFrame = {
      val w = Window.partitionBy($"l_partkey")
      li.withColumn("avg_qty",
          sum(round($"l_quantity").cast("long")).over(w).cast("double") /
            count(lit(1)).over(w))
        .filter($"l_quantity" < $"avg_qty" * 0.5)
        .groupBy($"l_partkey")
        .agg(count(lit(1)).as("n_small"),
             (sum(cents($"l_extendedprice")).cast("double") / 100.0).as("small_revenue"))
        .filter($"n_small" >= 3)
        .orderBy($"l_partkey")
    }

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    // warm both plans once (codegen), then median-of-3 each
    noop(joinVariant); noop(windowVariant)
    def bench(name: String, f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"Q17PROBE $name median=${ts(1)}%.3f min=${ts(0)}%.3f")
    }
    bench("join", joinVariant)
    bench("window", windowVariant)
    // same rows?
    val a = joinVariant.collect().toSeq
    val b = windowVariant.collect().toSeq
    println(s"Q17PROBE rows_equal=${a == b} n=${a.size}")
    spark.stop()
  }
}
