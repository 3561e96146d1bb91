package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions: register graft's planner strategies via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), for deployments that
  * can't call the programmatic APIs. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.SessionizeStrategy)
    e.injectPlannerStrategy(_ => graft.plans.GroupTopKStrategy)
    // standard row_number-top-k window queries plan as the heap exec
    e.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}
