package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: `Filter(rn <= k)` over a single-function
  * `Window(row_number() OVER (PARTITION BY p ORDER BY o))` becomes the
  * heap-based [[GroupTopKPlan]] — users keep writing the standard SQL
  * window idiom and get the O(n log k), sort-free physical operator
  * (Spark's own WindowGroupLimit pushdown still fully sorts each
  * partition; the heap exec does not sort at all).
  *
  * Fires only when the shapes match exactly: one window expression,
  * it is row_number, the partition keys are plain attributes, and the
  * filter is a lone `rn <= k` / `rn < k` (or the flipped literal
  * forms) on the row-number output. Ties: row_number and the heap both
  * break order-spec ties arbitrarily — as with any row_number query,
  * results are only deterministic when the order spec is total.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  // Long arithmetic: `rn < Int.MinValue` must not wrap to a huge k
  private def limitOf(cond: Expression, rn: Attribute): Option[Long] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k.toLong)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k.toLong - 1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k.toLong)
    case GreaterThan(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k.toLong - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
          partitionSpec, orderSpec, child, _))
        if partitionSpec.nonEmpty &&
          partitionSpec.forall(_.isInstanceOf[Attribute]) &&
          spec.partitionSpec == partitionSpec && spec.orderSpec == orderSpec =>
      val rn = alias.toAttribute
      limitOf(cond, rn) match {
        case Some(kL) if kL > 0 && kL <= Int.MaxValue =>
          val k = kL.toInt
          // Spark's InferWindowGroupLimit has already run (extra
          // optimizations are a final batch) and may have inserted a
          // WindowGroupLimit below the Window; the heap exec needs
          // neither the pre-limit nor its sorts — strip it.
          val bare = child match {
            case WindowGroupLimit(ps, os, _, _, grandchild)
                if ps == partitionSpec && os == orderSpec => grandchild
            case other => other
          }
          GroupTopKPlan(bare, partitionSpec.map(_.asInstanceOf[Attribute]),
            orderSpec, k, rn.asInstanceOf[AttributeReference])
        case _ => f
      }
  }
}

object AutoTopK {
  /** Enable the rewrite (rule + strategy) on a session. */
  def enable(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(GroupTopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GroupTopKStrategy
    if (!exp.extraOptimizations.contains(TopKRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ TopKRewrite
  }

  def disable(spark: SparkSession): Unit = synchronized {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == TopKRewrite)
  }
}
