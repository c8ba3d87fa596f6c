package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.WorkloadMatrix

/** Ingest for the reference's workload artifacts (SURVEY §2.1 S1/S2).
  *
  * Two paths, by design:
  *  - `matrixFromCsv`: driver-side parse into the dense [[WorkloadMatrix]].
  *    Row order is load-bearing (the NPY mask aligns to CSV row position,
  *    `src/data/dataset.py:29-31`), and the matrices are ≤2.4 MB — a
  *    distributed scan would have to re-sort to recover file order.
  *  - `cellsDF` / `maskToDF`: the long-format relational form
  *    `(query_id, hint_id, runtime)` used by Spark-side metrics and any
  *    at-scale variant (FIXTURES.md §1 schema).
  */
object Workloads {

  /** Parse `<ds>-matrix.csv` (header `filename,0,...,48`) preserving row
    * order. No quoting/escapes appear in the reference CSVs. */
  def matrixFromCsv(path: String): WorkloadMatrix = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    require(!lines.isEmpty, s"$path: empty")
    val header = lines.get(0).split(",", -1)
    require(header(0) == "filename", s"$path: expected filename header, got ${header(0)}")
    val nCols = header.length - 1
    val ids = new Array[String](lines.size - 1)
    val values = new Array[Array[Double]](lines.size - 1)
    var i = 1
    while (i < lines.size) {
      val parts = lines.get(i).split(",", -1)
      ids(i - 1) = parts(0)
      val row = new Array[Double](nCols)
      var j = 0
      while (j < nCols) { row(j) = parts(j + 1).toDouble; j += 1 }
      values(i - 1) = row
      i += 1
    }
    new WorkloadMatrix(ids, values)
  }

  /** Distributed S1 path: scan the matrix CSV with Spark and melt the 49
    * hint columns to long form with one `stack` expression — no driver
    * materialization, so it scales to workload matrices of any size (the
    * driver-side [[matrixFromCsv]] exists because the reference matrices
    * are tiny and row-order-aligned with the NPY masks). */
  def cellsFromCsvDistributed(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("header", true).option("inferSchema", false).csv(path)
    val hintCols = df.columns.filter(_ != "filename")
    val pairs = hintCols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    df.selectExpr("filename AS query_id",
        s"stack(${hintCols.length}, $pairs) AS (hint_id_s, runtime)")
      .selectExpr("query_id", "CAST(hint_id_s AS INT) AS hint_id", "runtime")
  }

  /** Long-format cells DataFrame from a dense matrix:
    * (query_id, hint_id, runtime, hint_group) where hint_group is the
    * dense-rank-by-value group id within the query (SURVEY §1.1). */
  def cellsDF(spark: SparkSession, w: WorkloadMatrix): DataFrame = {
    import spark.implicits._
    val rows = for {
      i <- w.queryIds.indices.iterator
      j <- 0 until w.nCols
    } yield (w.queryIds(i), j, w.values(i)(j))
    val df = rows.toSeq.toDF("query_id", "hint_id", "runtime")
    // hint_group via dense_rank of runtime within query — value-equality
    // groups, computed relationally (scales to any matrix size).
    import org.apache.spark.sql.expressions.Window
    df.withColumn("hint_group",
      dense_rank().over(Window.partitionBy("query_id").orderBy("runtime")))
  }

  /** Observed-cells DataFrame from an NPY mask aligned to `w`'s row order. */
  def maskToDF(spark: SparkSession, w: WorkloadMatrix, npyPath: String): DataFrame = {
    import spark.implicits._
    val m = Npy.read(npyPath)
    require(m.rows == w.nRows && m.cols == w.nCols,
      s"mask shape ${m.rows}x${m.cols} != matrix ${w.nRows}x${w.nCols}")
    val rows = for {
      i <- (0 until m.rows).iterator
      j <- 0 until m.cols
      if m(i, j) != 0.0
    } yield (w.queryIds(i), j)
    rows.toSeq.toDF("query_id", "hint_id")
  }

  /** Init mask as driver booleans (col-0-observed invariant asserted). */
  def initMask(npyPath: String, w: WorkloadMatrix): Array[Array[Boolean]] = {
    val m = Npy.read(npyPath)
    require(m.rows == w.nRows && m.cols == w.nCols,
      s"mask shape ${m.rows}x${m.cols} != matrix ${w.nRows}x${w.nCols}")
    val out = Array.tabulate(m.rows, m.cols)((i, j) => m(i, j) != 0.0)
    var i = 0
    while (i < m.rows) {
      require(out(i)(0), s"row $i: default plan (col 0) must be observed")
      i += 1
    }
    out
  }
}
