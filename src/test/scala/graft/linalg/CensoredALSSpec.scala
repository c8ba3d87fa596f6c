package graft.linalg

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite

class CensoredALSSpec extends AnyFunSuite {

  private def lowRank(n: Int, m: Int, r: Int, seed: Long): DenseMatrix[Double] = {
    val rng = new scala.util.Random(seed)
    val a = DenseMatrix.fill(n, r)(rng.nextDouble())
    val b = DenseMatrix.fill(m, r)(rng.nextDouble())
    a * b.t
  }

  test("observed cells pass through exactly") {
    val x0 = lowRank(30, 12, 3, 7)
    val rng = new scala.util.Random(11)
    val mask = DenseMatrix.fill(30, 12)(if (rng.nextDouble() < 0.6) 1.0 else 0.0)
    val x = x0 *:* mask
    val done = new CensoredALS(3, 50, 0.05, 1).complete(x, mask, DenseMatrix.zeros[Double](30, 12))
    for (i <- 0 until 30; j <- 0 until 12 if mask(i, j) == 1.0)
      assert(done(i, j) == x(i, j), s"observed cell ($i,$j) modified")
  }

  test("recovers a low-rank matrix at unobserved cells") {
    val x0 = lowRank(40, 20, 3, 3)
    val rng = new scala.util.Random(5)
    val mask = DenseMatrix.fill(40, 20)(if (rng.nextDouble() < 0.7) 1.0 else 0.0)
    val x = x0 *:* mask
    val done = new CensoredALS(3, 200, 0.01, 2).complete(x, mask, DenseMatrix.zeros[Double](40, 20))
    val errs = for {
      i <- 0 until 40; j <- 0 until 20 if mask(i, j) == 0.0
    } yield math.abs(done(i, j) - x0(i, j)) / math.max(0.1, math.abs(x0(i, j)))
    val sorted = errs.sorted
    val medianErr = sorted(sorted.size / 2)
    assert(medianErr < 0.15, s"median relative error $medianErr")
  }

  test("deterministic for a fixed seed; output non-negative given nonneg input") {
    val x0 = lowRank(20, 10, 2, 9)
    val rng = new scala.util.Random(13)
    val mask = DenseMatrix.fill(20, 10)(if (rng.nextDouble() < 0.5) 1.0 else 0.0)
    val x = x0 *:* mask
    val zeros = DenseMatrix.zeros[Double](20, 10)
    val d1 = new CensoredALS(2, 50, 0.2, 42).complete(x, mask, zeros)
    val d2 = new CensoredALS(2, 50, 0.2, 42).complete(x, mask, zeros)
    assert(d1 == d2)
    assert(d1.toArray.forall(_ >= 0.0))
  }

  test("censoring pushes completed values toward the cutoff") {
    // all observed values 1.0; one unobserved cell censored at 5.0 —
    // with the clamp the model must explain a larger target there than the
    // uncensored fit would produce
    val n = 12; val m = 8
    val x = DenseMatrix.fill(n, m)(1.0)
    val mask = DenseMatrix.fill(n, m)(1.0)
    mask(3, 4) = 0.0; x(3, 4) = 0.0
    val cut = DenseMatrix.zeros[Double](n, m); cut(3, 4) = 5.0
    val withCensor = new CensoredALS(2, 100, 0.1, 1).complete(x, mask, cut)
    val without = new CensoredALS(2, 100, 0.1, 1).complete(x, mask, DenseMatrix.zeros[Double](n, m))
    assert(withCensor(3, 4) > without(3, 4),
      s"censored ${withCensor(3, 4)} should exceed uncensored ${without(3, 4)}")
  }
}
