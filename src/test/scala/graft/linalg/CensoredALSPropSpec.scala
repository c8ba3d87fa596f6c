package graft.linalg

import breeze.linalg.DenseMatrix
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based ALS checks (SURVEY §5.2-2): invariants must hold across
  * generated shapes, mask densities, and seeds, not just hand fixtures.
  * (Raw scalacheck Gen sampling — the scalatestplus bridge isn't in the
  * offline dependency cache, so cases are drawn explicitly.)
  */
class CensoredALSPropSpec extends AnyFunSuite {

  private val cases: Gen[(Int, Int, Double, Long)] = for {
    n <- Gen.choose(8, 24)
    m <- Gen.choose(4, 12)
    density <- Gen.choose(0.4, 0.9)
    seed <- Gen.choose(1L, 1000L)
  } yield (n, m, density, seed)

  private def draw[A](g: Gen[A], k: Int): A =
    g.apply(Gen.Parameters.default, Seed(k.toLong))
      .getOrElse(fail(s"generator produced no value for seed $k"))

  test("observed pass-through, non-negativity, and determinism for any mask density") {
    (1 to 15).foreach { k =>
      val (n, m, density, seed) = draw(cases, k)
      val rng = new scala.util.Random(seed)
      val r = 2
      val a = DenseMatrix.fill(n, r)(rng.nextDouble())
      val b = DenseMatrix.fill(m, r)(rng.nextDouble())
      val full = a * b.t
      val mask = DenseMatrix.fill(n, m)(if (rng.nextDouble() < density) 1.0 else 0.0)
      // column 0 always observed (the reference's init invariant)
      (0 until n).foreach(i => mask(i, 0) = 1.0)
      val x = full *:* mask
      val zeros = DenseMatrix.zeros[Double](n, m)

      val d1 = new CensoredALS(r, 30, 0.1, seed).complete(x, mask, zeros)
      val d2 = new CensoredALS(r, 30, 0.1, seed).complete(x, mask, zeros)

      assert(d1 == d2, s"case $k: nondeterministic")
      for (i <- 0 until n; j <- 0 until m if mask(i, j) == 1.0)
        assert(d1(i, j) == x(i, j), s"case $k: observed cell ($i,$j) modified")
      assert(d1.toArray.forall(_ >= 0.0), s"case $k: negative completion")
    }
  }

  test("censored cells complete at or above the uncensored fit") {
    (1 to 10).foreach { k =>
      val seed = draw(Gen.choose(1L, 500L), k)
      val rng = new scala.util.Random(seed)
      val n = 10; val m = 6
      val x = DenseMatrix.fill(n, m)(0.5 + rng.nextDouble())
      val mask = DenseMatrix.fill(n, m)(1.0)
      val (ci, cj) = (rng.nextInt(n), 1 + rng.nextInt(m - 1))
      mask(ci, cj) = 0.0
      val hidden = x(ci, cj); x(ci, cj) = 0.0
      val cut = DenseMatrix.zeros[Double](n, m)
      cut(ci, cj) = hidden * 4.0 // censor well above the low-rank fit
      val censored = new CensoredALS(2, 60, 0.1, seed).complete(x, mask, cut)
      val plain = new CensoredALS(2, 60, 0.1, seed).complete(x, mask,
        DenseMatrix.zeros[Double](n, m))
      assert(censored(ci, cj) >= plain(ci, cj) - 1e-9,
        s"case $k: censored ${censored(ci, cj)} < plain ${plain(ci, cj)}")
    }
  }
}
