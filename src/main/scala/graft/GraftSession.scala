package graft

import org.apache.spark.sql.SparkSession

/** One-stop session factory: the configs this engine needs (UTC, AQE,
  * nanos-as-long for ns-parquet, right-sized shuffle partitions) plus
  * native-function registration. Library users call
  * `GraftSession.local(...)` or apply `configure` to their own builder.
  */
object GraftSession {

  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // AQE can only MERGE shuffle partitions, never split them (skew
      // joins aside), so the initial number is the ceiling on shuffle
      // parallelism AND the floor on per-partition size. Start 8×
      // finer than the target and let AQE coalesce small shuffles
      // back down: at 10× data the big shuffles keep 8× more, smaller
      // partitions (the sf10 probe hit GC thrash from 32 oversized
      // ones), while tiny shuffles still collapse to a handful of
      // tasks. This is the knob that scales with data volume — the
      // plans themselves don't change.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (shufflePartitions * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Programmatic equivalent of `new GraftExtensions` for an already-
    * built session: graft planner strategies plus the TopKRewrite
    * optimizer rule, so standard row_number-top-k window SQL plans as
    * the heap exec. Idempotent. */
  def enableExtensions(s: SparkSession): Unit = {
    val exp = s.experimental
    if (!exp.extraStrategies.contains(graft.plans.SessionizeStrategy))
      exp.extraStrategies = exp.extraStrategies :+ graft.plans.SessionizeStrategy
    graft.plans.AutoTopK.enable(s)
  }

  def local(cores: Int): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.Fns.registerAll(s)
    // extensions are ON by default: the driver-contract surfaces
    // (Verify/Bench/Smoke) exercise the optimizer rule on every query
    enableExtensions(s)
    s
  }
}
