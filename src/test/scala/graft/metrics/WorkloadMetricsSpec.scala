package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.core.RoundState
import graft.sources.Workloads

/** The Spark-side (long-format) metrics must equal the driver-side
  * RoundState metrics on the real JOB workload + init mask. */
class WorkloadMetricsSpec extends AnyFunSuite with SharedSpark {

  test("relational round metrics equal driver metrics on JOB init mask") {
    val w = Workloads.matrixFromCsv("/root/reference/dataset/job-matrix.csv")
    val maskPath = "/root/reference/dataset/init_job_mask.npy"

    // driver side
    val st = new RoundState(w)
    val init = Workloads.initMask(maskPath, w)
    for (i <- 0 until w.nRows; j <- 0 until w.nCols if init(i)(j)) st.mask(i)(j) = true
    val driver = st.metrics()

    // Spark side
    val cells = Workloads.cellsDF(spark, w)
    val observed = Workloads.maskToDF(spark, w, maskPath)
    val rel = WorkloadMetrics.roundMetrics(cells, observed)

    def close(a: Double, b: Double, what: String): Unit =
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)), s"$what: $a vs $b")
    close(rel.totalLatency, driver.totalLatency, "total_latency")
    close(rel.execTime, driver.execTime, "exec_time")
    close(rel.p50, driver.p50, "p50")
    close(rel.p90, driver.p90, "p90")
    close(rel.p95, driver.p95, "p95")
    close(rel.p99, driver.p99, "p99")
  }

  test("argMinPerQuery: deterministic lowest-hint tie-break") {
    import spark.implicits._
    val pred = Seq(
      ("q1", 0, 5.0), ("q1", 1, 2.0), ("q1", 2, 2.0),
      ("q2", 0, 1.0), ("q2", 1, 3.0)).toDF("query_id", "hint_id", "pred")
    val best = WorkloadMetrics.argMinPerQuery(pred).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(best("q1") == (1, 2.0)) // tie on pred → lowest hint_id
    assert(best("q2") == (0, 1.0))
  }
}
