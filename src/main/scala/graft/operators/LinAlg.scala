package graft.operators

/** Driver-side exact-integer linear-algebra kernels for BOUNDED
  * (dim×dim) state — the distributed halves live in the queries that
  * call them (Gram aggregation, map-only projections).
  *
  * Everything is BigInt so an SQL oracle replays it bit-for-bit in
  * HUGEINT arithmetic: no float matvec, no libm, no rounding-mode
  * ambiguity. */
object LinAlg {

  /** Power iteration for the dominant eigenvector of a symmetric
    * `dim`×`dim` matrix `g` (row-major). Exact integer state: each
    * step computes w = G·v in BigInt, then renormalizes to the
    * ±`unit` grid via integer half-away-from-zero rounding
    *   v'ᵢ = sign(wᵢ) · ((2·unit·|wᵢ| + m) div (2m)),  m = max|wⱼ|,
    * so two engines replaying the same integers agree exactly.
    * Returns the unit-grid eigenvector after `steps` iterations
    * (sign fixed by the all-ones start). */
  def powerIteration(
      g: IndexedSeq[BigInt], dim: Int, steps: Int,
      unit: Long = 1000000L): IndexedSeq[BigInt] = {
    require(g.length == dim * dim, s"gram length ${g.length} != $dim^2")
    val two = BigInt(2)
    val scale2 = BigInt(2 * unit)
    var v = IndexedSeq.fill(dim)(BigInt(unit))
    for (_ <- 1 to steps) {
      val w = IndexedSeq.tabulate(dim) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < dim) { acc += g(i * dim + j) * v(j); j += 1 }
        acc
      }
      val m = w.map(_.abs).max
      if (m.signum != 0)
        v = w.map { wi =>
          val q = (scale2 * wi.abs + m) / (two * m)
          if (wi.signum < 0) -q else q
        }
    }
    v
  }
}
