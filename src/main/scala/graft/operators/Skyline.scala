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
  * the survivors exactly WITHOUT a single-partition window: the
  * candidates are range-partitioned by cost (equal costs colocate, so
  * cross-partition costs are strictly ordered), each partition sweeps
  * its own cost range with windows PARTITIONED by partition id, and
  * the only cross-partition state is a broadcast prefix-max of gain
  * over strictly-cheaper partitions — a spine bounded by the
  * partition count, never by the frontier. Even the anti-correlated
  * worst case (frontier ≈ n) splits the resolve across all P
  * partitions; raise P with scale. The result is exact and
  * independent of where the range boundaries fall.
  */
object Skyline {

  /** Skyline of (id, cost, gain) rows: minimize cost, maximize gain.
    * Input columns must be named exactly (id, cost, gain), integral
    * cost/gain (exact comparisons — callers quantize money to cents
    * first). Output keeps the same three columns, unordered. */
  def skyline2d(spark: SparkSession, df: DataFrame, resolveParts: Int = 32): DataFrame = {
    import spark.implicits._
    val pruned = df.select($"id".cast("long"), $"cost".cast("long"), $"gain".cast("long"))
      .as[(Long, Long, Long)]
      .mapPartitions(localSkyline)
      .toDF("id", "cost", "gain")
    // Exact resolve over candidates: a row survives iff it has the max
    // gain among its exact-cost peers AND beats every strictly-cheaper
    // row's gain. Cost-range buckets via broadcast percentile edges
    // (strict cost > edge): equal costs share a bucket, so
    // cross-bucket costs are strictly ordered, and "beats every
    // cheaper row" factors into (beats in-bucket sweep) ∧ (beats the
    // broadcast carry = prefix-max gain of cheaper buckets).
    // Deterministic bucket ids (pure function of the data) — unlike
    // spark_partition_id after repartitionByRange, which could differ
    // between the two plan branches that consume the candidates.
    // localCheckpoint pins the frontier-sized candidate set so the
    // base table is scanned once, not once per consumer.
    val cand = pruned.localCheckpoint()
    val ed = cand.agg(expr("percentile(cost, array(" +
      (1 to resolveParts - 1).map(i => (i.toDouble / resolveParts).toString)
        .mkString(",") + "))").as("edges"))
    val ranged = cand.crossJoin(broadcast(ed))
      .withColumn("pid", expr("aggregate(edges, 0, (acc, x) -> acc + IF(cost > x, 1, 0))"))
      .drop("edges")
    val spine = ranged.groupBy($"pid").agg(max($"gain").as("gmax"))
      .withColumn("carry", max($"gmax").over( // ≤ resolveParts rows: constant-size spine
        Window.orderBy($"pid").rowsBetween(Window.unboundedPreceding, -1)))
    val wCost = Window.partitionBy($"pid", $"cost")
    val wSweep = Window.partitionBy($"pid").orderBy($"cost")
      .rangeBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(spine.select($"pid", $"carry")), Seq("pid"), "left")
      .withColumn("gmax", max($"gain").over(wCost))
      .withColumn("bstrict", greatest(
        coalesce(max($"gain").over(wSweep), lit(Long.MinValue)),
        coalesce($"carry", lit(Long.MinValue))))
      .filter($"gain" === $"gmax" && $"gain" > $"bstrict")
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
