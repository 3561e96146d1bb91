package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (SURVEY.md §2-G): exact weighted mean over
  * (value, weight) pairs, accumulating in integer cents so the result
  * is order-independent and oracle-exact.
  *
  * IN  = (valueCents, weight)   — pre-quantized by the caller
  * BUF = (Σ value*weight, Σ weight)
  * OUT = weighted mean in dollars (double)
  *
  * Registered as a SQL UDAF via `spark.udf.register("wavg", udaf(WeightedMean))`.
  * Note: Aggregator-backed UDAFs run in ObjectHashAggregate (no
  * whole-stage codegen) — use for semantics Spark lacks, not for sums
  * the built-ins already do faster.
  */
object WeightedMean extends Aggregator[(Long, Long), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  // exact ops: overflow fails loudly instead of silently wrapping
  override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
    (Math.addExact(b._1, Math.multiplyExact(a._1, a._2)), Math.addExact(b._2, a._2))
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (Math.addExact(x._1, y._1), Math.addExact(x._2, y._2))
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1.toDouble / r._2 / 100.0
  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
