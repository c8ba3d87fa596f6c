package graft.linalg

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

/** Distributed censored ALS for workload matrices that outgrow the driver
  * (SURVEY §4.3's scale path; the reference's own matrices never need it).
  *
  * Design — the spark.ml ALS shape specialized to this kernel's semantics:
  * the column-factor matrix B is m×rank (49×5 for the reference hint space:
  * tiny, and still tiny for any plausible hint space), so B is BROADCAST
  * and only the row side distributes:
  *
  *  - the STATIC row data (X, mask, cutoffs — ~1.2 KB/row at m=49) is
  *    cached ONCE and never re-cached; only the row FACTORS (rank doubles
  *    per row) churn between iterations, co-partitioned with the statics
  *    via `zipPartitions`. Re-caching the statics every iteration was the
  *    1M-row soak's dominant cost (GB-scale cache churn per round for a
  *    40 B/row state change);
  *  - each partition solves its rows' ridge systems locally against the
  *    broadcast B, with the per-partition invariants (BᵀB+λI, Bᵀ) hoisted
  *    out of the row loop — embarrassingly parallel, no shuffle;
  *  - the B update needs Σ_i targetᵢᵀ·Aᵢ (m×r) and AᵀA (r×r): ONE partial
  *    per partition (m·r + r² doubles — KBs), reduced on the driver, so
  *    per-iteration network cost is independent of row count;
  *  - per-row censor clamp and nonneg clamp happen partition-locally with
  *    identical ordering to [[CensoredALS]] (censor before solve, nonneg
  *    after).
  *
  * Semantics match [[CensoredALS]] given the same initial factors
  * (row-wise vs batched solves of the same normal equations): verified in
  * DistributedALSSpec by seeding both with identical A₀/B₀.
  */
final class DistributedCensoredALS(
    spark: SparkSession, rank: Int, iters: Int, lambda: Double, seed: Long,
    numPartitions: Int = 0) extends MatrixCompletion {

  import DistributedCensoredALS.StaticRow

  override def complete(x: DenseMatrix[Double], mask: DenseMatrix[Double],
                        cutoffs: DenseMatrix[Double]): DenseMatrix[Double] = {
    val rng = new scala.util.Random(seed)
    val a0 = DenseMatrix.fill(x.rows, rank)(rng.nextDouble())
    val b0 = DenseMatrix.fill(x.cols, rank)(rng.nextDouble())
    completeFrom(x, mask, cutoffs, a0, b0)
  }

  /** Completion from explicit initial factors (enables equivalence tests
    * against the driver kernel). */
  def completeFrom(x: DenseMatrix[Double], mask: DenseMatrix[Double],
                   cutoffs: DenseMatrix[Double],
                   a0: DenseMatrix[Double], b0: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n = x.rows; val m = x.cols
    val rk = rank
    val sc = spark.sparkContext
    val parts = if (numPartitions > 0) numPartitions else sc.defaultParallelism

    val static = sc.parallelize(
      (0 until n).map(i => StaticRow(i,
        Array.tabulate(m)(j => x(i, j)),
        Array.tabulate(m)(j => mask(i, j)),
        Array.tabulate(m)(j => cutoffs(i, j)))),
      parts).cache()
    static.count()
    val factors0 = static.map(st => Array.tabulate(rk)(k => a0(st.i, k))).cache()
    val (factors, b) = runIters(static, factors0, m, b0)

    // assemble completion X + (1−mask)∘ABᵀ
    val aFinal = DenseMatrix.zeros[Double](n, rk)
    static.zipPartitions(factors, preservesPartitioning = true) { (sit, fit) =>
      sit.zip(fit).map { case (st, ar) => (st.i, ar) }
    }.collect().foreach { case (i, ar) =>
      (0 until rk).foreach(k => aFinal(i, k) = ar(k))
    }
    factors.unpersist(false)
    static.unpersist(false)
    val out = x.copy
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        if (mask(i, j) == 0.0) {
          var dot = 0.0; var k = 0
          while (k < rk) { dot += aFinal(i, k) * b(j, k); k += 1 }
          out(i, j) = x(i, j) + dot
        }
        j += 1
      }
      i += 1
    }
    out
  }

  /** Scale entry point: rows are GENERATED ON EXECUTORS from the row index
    * — at 1M×49 the matrix-in API above would build ~1.2 GB of driver
    * DenseMatrix and serialize all of it through `parallelize`, which is
    * exactly the regime this class exists to escape. `rowGen(i)` returns
    * (xRow, maskRow, cutoffRow); `a0Gen(i)` the row's initial factors;
    * both must be pure (deterministic from i — the same contract as the
    * engine's seeded generators). Returns the row factors as (i, aᵢ)
    * pairs (still cached — caller unpersists) plus B; callers predict
    * cells on demand via aᵢ·bⱼ, because at this scale a completed n×m
    * matrix wouldn't fit a driver. */
  private[graft] def factorsFromRowGen(nRows: Int, m: Int,
      rowGen: Int => (Array[Double], Array[Double], Array[Double]),
      a0Gen: Int => Array[Double],
      b0: DenseMatrix[Double]): (RDD[(Int, Array[Double])], DenseMatrix[Double]) = {
    val rk = rank
    val sc = spark.sparkContext
    val parts = if (numPartitions > 0) numPartitions else sc.defaultParallelism
    val static = sc.range(0, nRows.toLong, 1, parts).map { iL =>
      val i = iL.toInt
      val (xr, mr, cr) = rowGen(i)
      StaticRow(i, xr, mr, cr)
    }.cache()
    static.count() // materialize generation apart from the first iteration
    val factors0 = static.map(st => a0Gen(st.i)).cache()
    val (factors, b) = runIters(static, factors0, m, b0)
    val out = static.zipPartitions(factors, preservesPartitioning = true) { (sit, fit) =>
      sit.zip(fit).map { case (st, ar) => (st.i, ar) }
    }.cache()
    out.count()
    factors.unpersist(false)
    static.unpersist(false)
    (out, b)
  }

  /** The shared ALS loop: statics cached once, factors re-derived (and
    * re-cached — rank doubles per row, not the row data) each iteration.
    * Returns the final cached factors RDD (caller unpersists) and B. */
  private def runIters(static: RDD[StaticRow], factors0: RDD[Array[Double]],
                       m: Int, b0: DenseMatrix[Double]): (RDD[Array[Double]], DenseMatrix[Double]) = {
    // local copies so Spark closures don't capture `this` (which holds the
    // non-serializable SparkSession)
    val rk = rank; val lam = lambda
    val sc = spark.sparkContext
    var factors = factors0
    var b = b0.copy

    def clampedTarget(st: StaticRow, ar: Array[Double],
                      bLocal: DenseMatrix[Double]): DenseVector[Double] = {
      val t = new Array[Double](m)
      var j = 0
      while (j < m) {
        var dot = 0.0; var k = 0
        while (k < rk) { dot += ar(k) * bLocal(j, k); k += 1 }
        var v = st.xr(j) + (1.0 - st.mr(j)) * dot
        if (st.cr(j) > 0 && v < st.cr(j)) v = st.cr(j)
        t(j) = v
        j += 1
      }
      DenseVector(t)
    }

    var it = 0
    while (it < iters) {
      val bBc = sc.broadcast(b)
      val lambdaEye = DenseMatrix.eye[Double](rk) * lam

      // --- A update: per-row ridge solve against broadcast B, with the
      // per-partition invariants (BᵀB+λI, Bᵀ) hoisted out of the row loop
      val newFactors = static.zipPartitions(factors, preservesPartitioning = true) {
        (sit, fit) =>
          val bL = bBc.value
          val btb = bL.t * bL + lambdaEye
          val bT = bL.t
          sit.zip(fit).map { case (st, ar) =>
            val t = clampedTarget(st, ar, bL)
            val rhs = bT * t
            val sol = btb \ rhs
            Array.tabulate(rk)(k => math.max(0.0, sol(k)))
          }
      }.cache()
      newFactors.count() // materialize before unpersisting parent
      factors.unpersist(false)
      factors = newFactors

      // --- B update: one (AᵀA, TᵀA) partial per partition, reduced ---
      val (ata, tta) = static.zipPartitions(factors, preservesPartitioning = true) {
        (sit, fit) =>
          val bL = bBc.value
          val ataAcc = DenseMatrix.zeros[Double](rk, rk)
          val ttaAcc = DenseMatrix.zeros[Double](m, rk)
          sit.zip(fit).foreach { case (st, ar) =>
            val t = clampedTarget(st, ar, bL)
            var k = 0
            while (k < rk) {
              var k2 = 0
              while (k2 < rk) { ataAcc(k, k2) += ar(k) * ar(k2); k2 += 1 }
              var j = 0
              while (j < m) { ttaAcc(j, k) += t(j) * ar(k); j += 1 }
              k += 1
            }
          }
          Iterator((ataAcc, ttaAcc))
      }.reduce { case ((a1, t1), (a2, t2)) => (a1 + a2, t1 + t2) }
      val solB = ((ata + lambdaEye) \ tta.t).t // m×r
      b = solB.map(v => math.max(0.0, v))
      it += 1
    }
    (factors, b)
  }
}

object DistributedCensoredALS {
  /** Row-partitioned immutable static data: (rowIdx, xRow, maskRow, cutRow).
    * Top-level so Spark closures don't drag an `$outer` reference along. */
  private[graft] final case class StaticRow(
      i: Int, xr: Array[Double], mr: Array[Double], cr: Array[Double])
}
