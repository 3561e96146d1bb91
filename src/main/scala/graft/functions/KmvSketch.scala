package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values / bottom-k) distinct sketch (SURVEY.md §2-G):
  * the buffer is the k smallest DISTINCT 60-bit hashes seen, kept as a
  * sorted array. Beyer et al. 2007's unbiased estimator
  * (k−1)·H / h₍ₖ₎ then reads the distinct count off the kth minimum.
  *
  * Unlike HLL this sketch is EXACTLY reproducible from the hash values
  * alone — an engine-independent oracle can replay it as "the k
  * smallest distinct hashes per group" in plain SQL, so the estimate
  * is hash-verifiable, not merely approximately-right.
  *
  * IN  = 60-bit hash (md5-derived in the Column plane, uniform on
  *       [0, 2⁶⁰) — portable across engines)
  * BUF/OUT = sorted long[≤k] of the smallest distinct hashes
  *
  * Scale: map-side-combinable — each task folds its rows into one
  * ≤k-long array; the shuffle moves one bounded array per
  * (task, group) instead of one row per distinct value, which is what
  * COUNT(DISTINCT) shuffles. Insertion keeps the buffer sorted
  * (binary search + arraycopy); merge is a linear two-pointer merge of
  * two sorted arrays capped at k.
  */
final class KmvSketch(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 1, s"KMV needs k > 1, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) return b // already present
    val ins = -pos - 1
    if (b.length >= k && ins >= k) return b // not among the k smallest
    val n = math.min(b.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(b, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
    out
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (y.isEmpty) return x
    if (x.isEmpty) return y
    val out = new Array[Long](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < x.length || j < y.length)) {
      val takeX = j >= y.length || (i < x.length && x(i) <= y(j))
      val v = if (takeX) x(i) else y(j)
      if (takeX) i += 1 else j += 1
      if (i < x.length && x(i) == v) i += 1 // cross-array duplicate
      if (j < y.length && y(j) == v) j += 1
      out(o) = v; o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
