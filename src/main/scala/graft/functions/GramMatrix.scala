package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Gram-matrix aggregator (SURVEY.md §2-G): Σ over rows of the outer
  * product vᵀv for an integer-quantized embedding column — the blocked
  * matrix-multiply EᵀE that whitening / PCA / covariance pipelines run
  * over an embedding table.
  *
  * IN  = quantized vector (micro-units, pre-quantized in the Column
  *       plane so Spark/oracle rounding agree)
  * BUF/OUT = dim×dim row-major Σ qᵢ·qⱼ (exact int64)
  *
  * Scale: this is a classic map-side-combinable aggregation — each task
  * folds its rows into ONE dim² buffer, and the shuffle moves one
  * buffer per task instead of n·dim² product rows (at 100 TB the
  * relational formulation shuffles ~10¹³ rows; this shuffles
  * #tasks × 32 KB). Overflow fails loudly via addExact: |q| < 10⁶ ⇒
  * each product < 10¹², safe for ~10⁶ rows per task × merge fan-in.
  */
final class GramMatrix(dim: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](dim * dim)
  override def reduce(b: Array[Long], v: Seq[Long]): Array[Long] = {
    require(v.length == dim, s"expected dim=$dim, got ${v.length}")
    val q = v.toArray
    var i = 0
    while (i < dim) {
      val qi = q(i)
      var j = 0
      while (j < dim) {
        val k = i * dim + j
        b(k) = Math.addExact(b(k), Math.multiplyExact(qi, q(j)))
        j += 1
      }
      i += 1
    }
    b
  }
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var k = 0
    while (k < x.length) { x(k) = Math.addExact(x(k), y(k)); k += 1 }
    x
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
