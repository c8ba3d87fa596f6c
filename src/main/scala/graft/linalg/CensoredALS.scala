package graft.linalg

import breeze.linalg.DenseMatrix

/** Non-negative censored ALS matrix completion — the reference's one custom
  * numeric kernel (`/root/reference/src/models/matrix_factorization.py:3-72`,
  * SURVEY §4.3). Exact semantics preserved:
  *
  *  - impute-full-target formulation: target = X + (1−mask)∘(ABᵀ)
  *  - censor clamp BEFORE each solve: target[t<cutoff ∧ cutoff>0] = cutoff
  *  - ridge normal equations (BᵀB + λI) \ (target·B)ᵀ, then
  *  - non-negativity clamp AFTER each solve (A[A<0]=0)
  *  - returns X + (1−mask)∘(ABᵀ) (observed cells pass through exactly)
  *
  * Cannot reuse spark.ml ALS: it regresses observed entries only, has no
  * censoring, and setNonnegative solves NNLS instead of clamp-after-solve.
  *
  * Scale note: the reference matrices are ≤6191×49 (2.4 MB) so this runs on
  * the driver between Spark jobs in ~0.1 s. For matrices that outgrow the
  * driver, the same alternating solve distributes as broadcast-factor
  * row-block solves (the spark.ml ALS design): B (m×r, tiny) is broadcast,
  * each partition solves its row block independently — no all-to-all
  * shuffle. That variant lives behind [[MatrixCompletion]] when needed.
  */
trait MatrixCompletion {
  /** Complete X given observation mask (1=observed) and per-cell censoring
    * cutoffs (0 = uncensored). */
  def complete(x: DenseMatrix[Double], mask: DenseMatrix[Double],
               cutoffs: DenseMatrix[Double]): DenseMatrix[Double]
}

final class CensoredALS(rank: Int, iters: Int, lambda: Double, seed: Long)
    extends MatrixCompletion {

  override def complete(x: DenseMatrix[Double], mask: DenseMatrix[Double],
                        cutoffs: DenseMatrix[Double]): DenseMatrix[Double] = {
    val rng = new scala.util.Random(seed)
    // uniform [0,1) init, matching np.random.rand's distribution (bit-level
    // RNG parity with NumPy MT19937 is an explicit non-goal, SURVEY §5.4)
    val a0 = DenseMatrix.fill(x.rows, rank)(rng.nextDouble())
    val b0 = DenseMatrix.fill(x.cols, rank)(rng.nextDouble())
    completeFrom(x, mask, cutoffs, a0, b0)
  }

  /** Completion from explicit initial factors (shared with the distributed
    * variant for equivalence testing). */
  def completeFrom(x: DenseMatrix[Double], mask: DenseMatrix[Double],
                   cutoffs: DenseMatrix[Double],
                   a0: DenseMatrix[Double], b0: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n = x.rows; val m = x.cols
    var a = a0.copy
    var b = b0.copy
    val eye = DenseMatrix.eye[Double](rank) * lambda

    // one reused buffer for the imputed+clamped target — the elementwise
    // Breeze formulation (x + (1−mask)∘ABᵀ then clamp) allocated ~6 full
    // matrices per iteration; the fused loop is bit-identical arithmetic
    // (same per-element expression, GEMM unchanged) at ~half the runtime
    val target = DenseMatrix.zeros[Double](n, m)
    def fillTarget(): Unit = {
      val ab = a * b.t
      var j = 0
      while (j < m) {
        var i = 0
        while (i < n) {
          var v = x(i, j) + (1.0 - mask(i, j)) * ab(i, j)
          val c = cutoffs(i, j)
          if (c > 0 && v < c) v = c
          target(i, j) = v
          i += 1
        }
        j += 1
      }
    }

    def clampNonNegInPlace(mtx: DenseMatrix[Double]): DenseMatrix[Double] = {
      val d = mtx.data
      var i = 0
      while (i < d.length) { if (d(i) < 0.0) d(i) = 0.0; i += 1 }
      mtx
    }

    var it = 0
    while (it < iters) {
      // update A: solve (BᵀB + λI) Aᵀ = (target·B)ᵀ  ⇒  A
      fillTarget()
      a = clampNonNegInPlace(((b.t * b + eye) \ (target * b).t).t)
      // update B symmetrically (target re-imputed with the fresh A)
      fillTarget()
      b = clampNonNegInPlace(((a.t * a + eye) \ (target.t * a).t).t)
      it += 1
    }
    // final return: X + (1−mask)∘ABᵀ, NO censor clamp (`matrix_factorization.py:72`)
    val ab = a * b.t
    val out = DenseMatrix.zeros[Double](n, m)
    var j = 0
    while (j < m) {
      var i = 0
      while (i < n) {
        out(i, j) = x(i, j) + (1.0 - mask(i, j)) * ab(i, j)
        i += 1
      }
      j += 1
    }
    out
  }
}

object CensoredALS {
  /** Reference defaults: rank 5, 50 iterations, λ 0.2
    * (`src/strategies/limeqo.py:11,44`). */
  def default(seed: Long): CensoredALS = new CensoredALS(5, 50, 0.2, seed)

  /** Plain (uncensored) ALS = censored ALS with all-zero cutoffs. */
  def uncensored(rank: Int, iters: Int, lambda: Double, seed: Long): MatrixCompletion =
    new MatrixCompletion {
      private val inner = new CensoredALS(rank, iters, lambda, seed)
      def complete(x: DenseMatrix[Double], mask: DenseMatrix[Double],
                   cutoffs: DenseMatrix[Double]): DenseMatrix[Double] =
        inner.complete(x, mask, DenseMatrix.zeros[Double](x.rows, x.cols))
    }
}
