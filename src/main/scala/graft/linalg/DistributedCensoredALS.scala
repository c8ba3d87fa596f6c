package graft.linalg

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.SparkSession

/** Distributed censored ALS for workload matrices that outgrow the driver
  * (SURVEY §4.3's scale path; the reference's own matrices never need it).
  *
  * Design — the spark.ml ALS shape specialized to this kernel's semantics:
  * the column-factor matrix B is m×rank (49×5 for the reference hint space:
  * tiny, and still tiny for any plausible hint space), so B is BROADCAST
  * and only the row side distributes:
  *
  *  - rows of (X, mask, cutoffs) are partitioned by row id; each partition
  *    solves its rows' ridge systems locally against the broadcast B —
  *    embarrassingly parallel, no shuffle;
  *  - the B update needs Σ_i targetᵢᵀ·Aᵢ (m×r) and AᵀA (r×r): both are
  *    TREE-AGGREGATED partial sums (m·r + r² doubles per partition — KBs),
  *    so per-iteration network cost is independent of row count;
  *  - per-row censor clamp and nonneg clamp happen partition-locally with
  *    identical ordering to [[CensoredALS]] (censor before solve, nonneg
  *    after).
  *
  * Semantics match [[CensoredALS]] exactly given the same initial factors:
  * verified in DistributedALSSpec by seeding both with identical A₀/B₀.
  */
final class DistributedCensoredALS(
    spark: SparkSession, rank: Int, iters: Int, lambda: Double, seed: Long,
    numPartitions: Int = 0) extends MatrixCompletion {

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

    import DistributedCensoredALS.RowState
    val rows0 = sc.parallelize(
      (0 until n).map(i => RowState(i,
        Array.tabulate(m)(j => x(i, j)),
        Array.tabulate(m)(j => mask(i, j)),
        Array.tabulate(m)(j => cutoffs(i, j)),
        Array.tabulate(rk)(k => a0(i, k)))),
      parts).cache()
    val (rows, b) = runIters(rows0, m, b0)

    // assemble completion X + (1−mask)∘ABᵀ
    val aFinal = DenseMatrix.zeros[Double](n, rk)
    rows.collect().foreach(st => (0 until rk).foreach(k => aFinal(st.i, k) = st.ar(k)))
    rows.unpersist(false)
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
    * engine's seeded generators). Returns the FACTORS (row-factor RDD,
    * still cached, plus B) rather than a completed n×m matrix: at this
    * scale the completion itself wouldn't fit a driver, so callers
    * predict cells on demand via aᵢ·bⱼ and must unpersist the returned
    * RDD when done. */
  private[graft] def factorsFromRowGen(nRows: Int, m: Int,
      rowGen: Int => (Array[Double], Array[Double], Array[Double]),
      a0Gen: Int => Array[Double],
      b0: DenseMatrix[Double]): (org.apache.spark.rdd.RDD[DistributedCensoredALS.RowState], DenseMatrix[Double]) = {
    import DistributedCensoredALS.RowState
    val sc = spark.sparkContext
    val parts = if (numPartitions > 0) numPartitions else sc.defaultParallelism
    val rows0 = sc.range(0, nRows.toLong, 1, parts).map { iL =>
      val i = iL.toInt
      val (xr, mr, cr) = rowGen(i)
      RowState(i, xr, mr, cr, a0Gen(i))
    }.cache()
    rows0.count() // materialize generation apart from the first iteration
    runIters(rows0, m, b0)
  }

  /** The shared ALS loop over a cached row RDD; returns the final cached
    * row RDD (caller unpersists) and B. */
  private def runIters(rows0: org.apache.spark.rdd.RDD[DistributedCensoredALS.RowState],
                       m: Int, b0: DenseMatrix[Double]): (org.apache.spark.rdd.RDD[DistributedCensoredALS.RowState], DenseMatrix[Double]) = {
    import DistributedCensoredALS.RowState
    // local copies so Spark closures don't capture `this` (which holds the
    // non-serializable SparkSession)
    val rk = rank; val lam = lambda
    val sc = spark.sparkContext
    var rows = rows0
    var b = b0.copy

    def clampedTargetRow(st: RowState, bLocal: DenseMatrix[Double]): DenseVector[Double] = {
      val aRow = DenseVector(st.ar)
      val t = new Array[Double](m)
      var j = 0
      while (j < m) {
        var dot = 0.0; var k = 0
        while (k < rk) { dot += aRow(k) * bLocal(j, k); k += 1 }
        var v = st.xr(j) + (1.0 - st.mr(j)) * dot
        if (st.cr(j) > 0 && v < st.cr(j)) v = st.cr(j)
        t(j) = v
        j += 1
      }
      DenseVector(t)
    }

    var it = 0
    while (it < iters) {
      // --- A update: per-row ridge solve against broadcast B ---
      val bBc = sc.broadcast(b)
      val lambdaEye = DenseMatrix.eye[Double](rk) * lam
      val rowsA = rows.map { st =>
        val bL = bBc.value
        val btb = bL.t * bL + lambdaEye
        val t = clampedTargetRow(st, bL)
        val rhs = bL.t * t
        val sol = btb \ rhs
        val ar = Array.tabulate(rk)(k => math.max(0.0, sol(k)))
        st.copy(ar = ar)
      }.cache()
      rowsA.count() // materialize before unpersisting parent
      rows.unpersist(false)
      rows = rowsA

      // --- B update: tree-aggregate AᵀA (r×r) and TᵀA (m×r) ---
      val (ata, tta) = rows.treeAggregate(
        (DenseMatrix.zeros[Double](rk, rk), DenseMatrix.zeros[Double](m, rk)))(
        seqOp = { case ((ataAcc, ttaAcc), st) =>
          val bL = bBc.value
          val aRow = DenseVector(st.ar)
          val t = clampedTargetRow(st, bL)
          var k = 0
          while (k < rk) {
            var k2 = 0
            while (k2 < rk) { ataAcc(k, k2) += aRow(k) * aRow(k2); k2 += 1 }
            var j = 0
            while (j < m) { ttaAcc(j, k) += t(j) * aRow(k); j += 1 }
            k += 1
          }
          (ataAcc, ttaAcc)
        },
        combOp = { case ((a1, t1), (a2, t2)) => (a1 + a2, t1 + t2) })
      val solB = ((ata + lambdaEye) \ tta.t).t // m×r
      b = solB.map(v => math.max(0.0, v))
      // NOT destroyed: the cached row RDD's lineage still references the
      // broadcast; B is m×rank doubles (KBs), GC reclaims it after the run
      it += 1
    }
    (rows, b)
  }
}

object DistributedCensoredALS {
  /** Row-partitioned immutable state: (rowIdx, xRow, maskRow, cutRow, aRow).
    * Top-level so Spark closures don't drag an `$outer` reference along. */
  private[graft] final case class RowState(
      i: Int, xr: Array[Double], mr: Array[Double],
      cr: Array[Double], ar: Array[Double])
}
