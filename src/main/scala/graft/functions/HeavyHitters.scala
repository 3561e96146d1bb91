package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy hitters (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012): finds every item
  * whose frequency exceeds n/k using k counters of state — the
  * bounded-memory alternative to a full groupBy when the dictionary is
  * huge (at 100 TB: each task carries ≤k entries, merges move k-entry
  * maps instead of shuffling every distinct term).
  *
  * Guarantee: the output (candidate, lower-bound count) pairs contain
  * EVERY item with true frequency > n/k; counts are undercounts by at
  * most the total decrement. Exact counts for the (small) candidate set
  * come from a cheap second pass — see q_heavy_hitters, which is
  * hash-verified against the exact SQL derivation precisely because of
  * this recall guarantee.
  */
class HeavyHitters(k: Int)
  extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] = {
    val cur = b.getOrElse(item, 0L)
    if (cur > 0L || b.size < k) b.updated(item, cur + 1L)
    else b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap // decrement-all step
  }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // mergeable-summaries rule: subtract the (k+1)-th largest count
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
