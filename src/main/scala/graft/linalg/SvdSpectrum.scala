package graft.linalg

import breeze.linalg.{svd, DenseMatrix}
import org.apache.spark.mllib.linalg.Vectors
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Singular-value spectrum of a workload matrix — the reference's low-rank
  * evidence figure (K3, `draw/draw_svd.ipynb · cell 4`: np.linalg.svd
  * singular values of the workload matrix vs a random matrix).
  *
  * Two paths behind one surface:
  *  - [[local]]: Breeze LAPACK svd on the driver — right for every
  *    reference matrix (≤6191×49).
  *  - [[distributed]]: spark.mllib RowMatrix.computeSVD for matrices that
  *    outgrow the driver — rows stay distributed; only the k×k factor and
  *    singular values come back. Correct tool at 100 TB row counts since
  *    the column count (hint sets) stays small: the Gramian is nCols²..
  */
object SvdSpectrum {

  /** All singular values, descending (np.linalg.svd compute_uv=False). */
  def local(m: DenseMatrix[Double]): Array[Double] =
    svd(m).singularValues.toArray

  /** Top-k singular values of a long-format (rowIdx, colIdx, value) frame,
    * densified per row — distributed Gramian path. */
  def distributed(spark: SparkSession, cells: DataFrame, nCols: Int, k: Int): Array[Double] = {
    val rows = cells.select("rowIdx", "colIdx", "value").rdd
      .map(r => (r.getInt(0), (r.getInt(1), r.getDouble(2))))
      .groupByKey()
      .map { case (_, cols) =>
        val arr = new Array[Double](nCols)
        cols.foreach { case (c, v) => arr(c) = v }
        Vectors.dense(arr)
      }
    new RowMatrix(rows).computeSVD(k, computeU = false).s.toArray
  }
}
