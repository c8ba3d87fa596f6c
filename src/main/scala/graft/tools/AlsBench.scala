package graft.tools

import breeze.linalg.DenseMatrix
import graft.linalg.CensoredALS
import graft.sources.Workloads

/** Kernel micro-bench: censored-ALS round time on the real CEB matrix,
  * against the reference's recorded ~0.134 s/round
  * (`experiment/ceb/limeqo/1.json` records 2-3, BASELINE.md).
  */
object AlsBench {
  def main(args: Array[String]): Unit = {
    val w = Workloads.matrixFromCsv("/root/reference/dataset/ceb-matrix.csv")
    val mask = Workloads.initMask("/root/reference/dataset/init_ceb_mask.npy", w)
    val logM = DenseMatrix.tabulate(w.nRows, w.nCols)((r, c) =>
      if (mask(r)(c)) math.log1p(w.values(r)(c)) else 0.0)
    val maskM = DenseMatrix.tabulate(w.nRows, w.nCols)((r, c) => if (mask(r)(c)) 1.0 else 0.0)
    val zeros = DenseMatrix.zeros[Double](w.nRows, w.nCols)
    (1 to 3).foreach(_ => new CensoredALS(5, 50, 0.2, 42).complete(logM, maskM, zeros))
    val times = (1 to 10).map { i =>
      val t0 = System.nanoTime()
      new CensoredALS(5, 50, 0.2, i).complete(logM, maskM, zeros)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"CEB 3133x49 rank5 50iter censored ALS: min=${times.min}%.4f s  " +
      f"mean=${times.sum / times.size}%.4f s  (reference ~0.134 s/round)")
  }
}
