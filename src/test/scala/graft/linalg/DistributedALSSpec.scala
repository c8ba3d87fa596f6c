package graft.linalg

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** The distributed ALS must match the driver kernel given identical
  * initial factors (same normal equations, row-wise vs batched solves). */
class DistributedALSSpec extends AnyFunSuite with SharedSpark {

  test("distributed completion matches driver kernel from shared init") {
    val n = 60; val m = 12; val rank = 3
    val rng = new scala.util.Random(17)
    val truth = DenseMatrix.fill(n, rank)(rng.nextDouble()) *
      DenseMatrix.fill(m, rank)(rng.nextDouble()).t
    val mask = DenseMatrix.fill(n, m)(if (rng.nextDouble() < 0.6) 1.0 else 0.0)
    val x = truth *:* mask
    val cut = DenseMatrix.zeros[Double](n, m)
    cut(5, 3) = 0.8 // one censored cell to exercise the clamp path

    val a0 = DenseMatrix.fill(n, rank)(rng.nextDouble())
    val b0 = DenseMatrix.fill(m, rank)(rng.nextDouble())

    val driver = new CensoredALS(rank, 15, 0.1, 0)
      .completeFrom(x, mask, cut, a0, b0)
    val dist = new DistributedCensoredALS(spark, rank, 15, 0.1, 0, numPartitions = 4)
      .completeFrom(x, mask, cut, a0, b0)

    var worst = 0.0
    for (i <- 0 until n; j <- 0 until m) {
      val d = math.abs(driver(i, j) - dist(i, j)) / math.max(1.0, math.abs(driver(i, j)))
      if (d > worst) worst = d
    }
    assert(worst < 1e-8, s"worst relative diff $worst")
  }
}
