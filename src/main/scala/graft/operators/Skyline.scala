package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows no other row dominates,
  * where `b` dominates `a` iff b.cost <= a.cost AND b.gain >= a.gain
  * with at least one strict inequality. Ties on BOTH coordinates
  * dominate in neither direction, so exact duplicates all survive.
  *
  * Distributed shape (the textbook two-phase skyline): dominance is
  * transitive, so a globally non-dominated row is also non-dominated
  * within its partition — phase 1 computes each partition's local
  * skyline with an in-memory sweep (`mapPartitions`, no shuffle),
  * which collapses n rows to O(frontier) candidates; phase 2 resolves
  * the survivors exactly with two window passes. The global window
  * sorts only the pruned candidate set (frontier-sized — for
  * independent dimensions E|skyline| = O(log n)), so the single-task
  * final sort that would disqualify a naive global-window plan never
  * sees the raw table. At 100 TB the cost is one scan + a
  * frontier-sized exchange.
  */
object Skyline {

  /** Skyline of (id, cost, gain) rows: minimize cost, maximize gain.
    * Input columns must be named exactly (id, cost, gain), integral
    * cost/gain (exact comparisons — callers quantize money to cents
    * first). Output keeps the same three columns, unordered. */
  def skyline2d(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    val pruned = df.select($"id".cast("long"), $"cost".cast("long"), $"gain".cast("long"))
      .as[(Long, Long, Long)]
      .mapPartitions(localSkyline)
      .toDF("id", "cost", "gain")
    // Exact resolve over candidates: a row survives iff it has the max
    // gain among its exact-cost peers AND beats every strictly-cheaper
    // row's gain. RANGE frame to (cost-1) = "cost strictly smaller".
    val wCost = Window.partitionBy($"cost")
    val wSweep = Window.orderBy($"cost").rangeBetween(Window.unboundedPreceding, -1)
    pruned
      .withColumn("gmax", max($"gain").over(wCost))
      .withColumn("bstrict", max($"gain").over(wSweep))
      .filter($"gain" === $"gmax" && ($"bstrict".isNull || $"gain" > $"bstrict"))
      .select($"id", $"cost", $"gain")
  }

  /** In-memory sweep: sort by (cost asc, gain desc), keep a row iff it
    * leads its cost group (ties kept) and strictly beats the best gain
    * of all cheaper rows seen so far. O(n log n) time, O(n) heap per
    * partition — the input is one partition's rows, not the table. */
  private def localSkyline(it: Iterator[(Long, Long, Long)]): Iterator[(Long, Long, Long)] = {
    val arr = it.toArray
    java.util.Arrays.sort(arr, (a: (Long, Long, Long), b: (Long, Long, Long)) => {
      val c = java.lang.Long.compare(a._2, b._2)
      if (c != 0) c else java.lang.Long.compare(b._3, a._3)
    })
    val out = Array.newBuilder[(Long, Long, Long)]
    var bestStrict = Long.MinValue // max gain over rows with cost < current
    var curCost = Long.MinValue
    var groupMax = Long.MinValue   // max gain within the current cost group
    var i = 0
    while (i < arr.length) {
      val r = arr(i)
      if (r._2 != curCost) {
        if (groupMax > bestStrict) bestStrict = groupMax
        curCost = r._2
        groupMax = r._3 // first row of the group carries its max gain
      }
      if (r._3 == groupMax && r._3 > bestStrict) out += r
      i += 1
    }
    out.result().iterator
  }
}
