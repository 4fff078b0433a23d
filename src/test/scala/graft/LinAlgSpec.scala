package graft

import graft.operators.Similarity.LinAlg
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side dense linear algebra behind [[Similarity.pqCodebooksOpq]]
  * — dim×dim model artifacts only, so these run Spark-free. */
class LinAlgSpec extends AnyFunSuite {

  test("jacobiEig matches the closed form on a known symmetric matrix") {
    // A = [[2,1],[1,2]] -> eigenvalues 3, 1 (descending)
    val (ev, v) = LinAlg.jacobiEig(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    // eigenvector of 3 is ±[1,1]/√2
    assert(math.abs(math.abs(v(0)(0)) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(v(0)(0) - v(1)(0)) < 1e-12)
  }

  test("procrustesRotation recovers a planted rotation exactly") {
    // M = Σ x·(Qx)ᵀ for random x ⇒ the tr(R·M)-maximizing R is Q itself
    val rnd = new scala.util.Random(7)
    val n = 6
    val q = graft.operators.Similarity.rotationMatrix(n, 3L)
    val m = Array.ofDim[Double](n, n)
    for (_ <- 1 to 200) {
      val x = Array.fill(n)(rnd.nextGaussian())
      val y = Array.tabulate(n)(i => (0 until n).map(k => q(i)(k) * x(k)).sum)
      for (i <- 0 until n; j <- 0 until n) m(i)(j) += x(i) * y(j)
    }
    val r = LinAlg.procrustesRotation(m)
    for (i <- 0 until n; j <- 0 until n)
      assert(math.abs(r(i)(j) - q(i)(j)) < 1e-8,
        s"R[$i][$j]=${r(i)(j)} vs Q=${q(i)(j)}")
  }

  test("procrustesRotation stays orthogonal on noisy and rank-deficient M") {
    val rnd = new scala.util.Random(11)
    def worstDev(m: Array[Array[Double]]): Double = {
      val n = m.length
      val r = LinAlg.procrustesRotation(m)
      (for (i <- 0 until n; j <- 0 until n) yield {
        val p = (0 until n).map(k => r(i)(k) * r(j)(k)).sum
        math.abs(p - (if (i == j) 1.0 else 0.0))
      }).max
    }
    for (_ <- 1 to 5)
      assert(worstDev(Array.fill(16)(Array.fill(16)(rnd.nextGaussian()))) < 1e-9)
    // rank-1 M: 15 singular directions need the identity completion
    val u = Array.fill(16)(rnd.nextGaussian())
    val rank1 = Array.tabulate(16, 16)((i, j) => u(i) * u(j) * 0.5)
    assert(worstDev(rank1) < 1e-9)
    // zero M: fully degenerate — any rotation is optimal, must not crash
    assert(worstDev(Array.fill(16)(Array.fill(16)(0.0))) < 1e-9)
  }
}
