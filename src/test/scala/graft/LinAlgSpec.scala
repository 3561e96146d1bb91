package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LinAlg

class LinAlgSpec extends AnyFunSuite {

  private def bi(xs: Long*): IndexedSeq[BigInt] = xs.map(BigInt(_)).toIndexedSeq

  test("power iteration converges to the dominant axis") {
    // diag(9, 1): dominant eigenvector is e1
    val v = LinAlg.powerIteration(bi(9, 0, 0, 1), dim = 2, steps = 8)
    assert(v(0) == BigInt(1000000L))
    assert(v(1).abs < BigInt(10L)) // (1/9)^8 of the unit grid
  }

  test("off-diagonal coupling: converges to (1,1)/sqrt2 direction") {
    // [[2,1],[1,2]] → dominant eigenvector (1,1), eigenvalue 3
    val v = LinAlg.powerIteration(bi(2, 1, 1, 2), dim = 2, steps = 8)
    assert(v(0) == BigInt(1000000L) && v(1) == BigInt(1000000L))
  }

  test("sign is fixed by the all-ones start and renormalization is exact") {
    // [[0,-3],[-3,0]]: eigenpairs (3, (1,-1)) and (-3, (1,1)).
    // From (1,1) the first matvec gives (-3,-3) → sign flips follow
    // the exact integer rule, deterministically.
    val v1 = LinAlg.powerIteration(bi(0, -3, -3, 0), 2, 7)
    val v2 = LinAlg.powerIteration(bi(0, -3, -3, 0), 2, 7)
    assert(v1 == v2)
    assert(v1.map(_.abs) == bi(1000000, 1000000))
  }

  test("zero matrix does not divide by zero") {
    val v = LinAlg.powerIteration(bi(0, 0, 0, 0), 2, 3)
    assert(v == bi(1000000, 1000000))
  }
}
