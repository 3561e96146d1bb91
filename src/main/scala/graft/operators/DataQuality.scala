package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing (Deequ-style), Spark-first.
  *
  * A rule set over one table is evaluated in ONE aggregate scan:
  * every row-level constraint becomes a conditional-count aggregate
  * and every uniqueness constraint a `count - count_distinct` pair,
  * all computed side by side in a single partial-aggregating pass.
  * The scan's shuffle payload is one row of counters per task — at
  * 100 TB the audit costs exactly one read of the table, never one
  * pass per rule.
  *
  * Referential-integrity audits are one outer join per relation: the
  * child streams once, the parent's key set is the build side (AQE
  * broadcasts real dimension tables; a fact-fact relation falls back
  * to a shuffled hash join on the key — never a cartesian).
  */
object DataQuality {

  /** A named row-level constraint; `violated` must be true exactly on
    * rows that break the rule (nulls count as violations via the
    * explicit `coalesce`). */
  final case class Rule(name: String, violated: Column)

  /** Evaluate `rules` (+ optional uniqueness constraints on `uniqueKeys`)
    * over `df` in one aggregate pass.
    * Output: (tbl, rule, total, violations, pass) — one row per rule. */
  def audit(
      df: DataFrame,
      table: String,
      rules: Seq[Rule],
      uniqueKeys: Seq[(String, Column)] = Nil): DataFrame = {
    val ruleAggs = rules.map(r =>
      sum(when(coalesce(r.violated, lit(true)), 1L).otherwise(0L)).as(s"v_${r.name}"))
    val uniqueAggs = uniqueKeys.map { case (n, k) =>
      (count(lit(1)) - count_distinct(k)).as(s"v_$n")
    }
    val aggs = ruleAggs ++ uniqueAggs
    val one = df.agg(count(lit(1)).as("total"), aggs: _*)
    val names = rules.map(_.name) ++ uniqueKeys.map(_._1)
    val asRows = names.map(n =>
      struct(lit(n).as("rule"), col(s"v_$n").cast("long").as("violations")))
    one
      .select(lit(table).as("tbl"), col("total"),
        explode(array(asRows: _*)).as("r"))
      .select(col("tbl"), col("r.rule").as("rule"), col("total"),
        col("r.violations").as("violations"),
        (col("r.violations") === 0L).as("pass"))
  }

  /** Orphan-count audit for one FK relation: rows of `child` whose
    * `childKey` has no match among `parent`'s `parentKey`. One left
    * join (single child pass); the parent side is reduced to its
    * distinct key column before the join so the build side carries
    * keys only, never payload. */
  def orphans(
      relation: String,
      child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame = {
    val keys = parent.select(parentKey.as("__pk")).distinct()
    child
      .join(keys, childKey === col("__pk"), "left")
      .agg(
        count(lit(1)).as("child_rows"),
        sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("orphans"))
      .select(lit(relation).as("relation"), col("child_rows"),
        col("orphans").cast("long").as("orphans"),
        (col("orphans") === 0L).as("intact"))
  }
}
