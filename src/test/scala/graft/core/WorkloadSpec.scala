package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Workloads

class WorkloadSpec extends AnyFunSuite with graft.SharedSpark {
  private val ref = "/root/reference/dataset"
  private lazy val job = Workloads.matrixFromCsv(s"$ref/job-matrix.csv")

  // shared session: drop cached plans so they can't be substituted into
  // other suites' physical plans by CacheManager
  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  test("distributed CSV melt agrees with the driver-side parse") {
    import org.apache.spark.sql.functions._
    val cells = Workloads.cellsFromCsvDistributed(spark, s"$ref/job-matrix.csv").cache()
    assert(cells.count() == 113L * 49)
    val stats = cells.agg(
      sum(when(col("hint_id") === 0, col("runtime"))),
      countDistinct("query_id")).head()
    assert(math.abs(stats.getDouble(0) - job.defaultTime) < 1e-9)
    assert(stats.getLong(1) == 113)
    // spot-check one cell against the dense matrix
    val c7 = cells.filter(col("query_id") === job.queryIds(7) && col("hint_id") === 13)
      .head().getDouble(2)
    assert(c7 == job.values(7)(13))
  }

  test("JOB matrix shape and §1.4 numeric goldens") {
    assert(job.nRows == 113 && job.nCols == 49)
    // goldens computed with NumPy from the shipped CSV
    // (np.sum(m[:,0]) / np.sum(np.min(m, axis=1)), dataset.py:34-35)
    assert(math.abs(job.defaultTime - 181.0845799446106) < 1e-6, s"default ${job.defaultTime}")
    assert(math.abs(job.optTime - 68.0623927116394) < 1e-6, s"opt ${job.optTime}")
  }

  test("CEB matrix numeric goldens (§1.4)") {
    val ceb = Workloads.matrixFromCsv(s"$ref/ceb-matrix.csv")
    assert(ceb.nRows == 3133 && ceb.nCols == 49)
    assert(math.abs(ceb.defaultTime - 10587.7) < 0.1, s"default ${ceb.defaultTime}")
    assert(math.abs(ceb.optTime - 3688.5) < 0.1, s"opt ${ceb.optTime}")
  }

  test("hint groups: value-equality, reflexive and symmetric") {
    val w = job
    for (i <- 0 until w.nRows; j <- 0 until w.nCols) {
      val g = w.sameHints(i, j)
      assert(g.contains(j))
      assert(g.forall(k => w.values(i)(k) == w.values(i)(j)))
      g.foreach(k => assert(w.sameHints(i, k).sameElements(g)))
    }
  }

  test("percentile matches NumPy linear interpolation") {
    val a = Array(1.0, 2.0, 3.0, 4.0)
    assert(Percentile(a, 50) == 2.5)
    assert(math.abs(Percentile(a, 90) - 3.7) < 1e-12)
    assert(Percentile(a, 100) == 4.0)
    assert(Percentile(a, 0) == 1.0)
    assert(Percentile(Array(5.0), 99) == 5.0)
  }

  test("RoundState metrics on a hand matrix (FIXTURES §7 shape)") {
    // 3 queries × 4 hints; row 0 has an equal-value pair (cols 1,2)
    val w = new WorkloadMatrix(
      Array("q0", "q1", "q2"),
      Array(
        Array(10.0, 4.0, 4.0, 9.0),
        Array(5.0, 6.0, 1.0, 2.0),
        Array(3.0, 3.0, 3.0, 3.0)))
    val st = new RoundState(w)
    (0 until 3).foreach(i => st.observe(i, 0))
    // row 2: col 0's group is the whole row
    assert(st.mask(2).forall(identity))
    assert(st.minObserved.sameElements(Array(10.0, 5.0, 3.0)))
    assert(st.execTime == 18.0) // 10 + 5 + 3 (row-2 group counted once)

    st.observe(0, 1) // observes group {1,2}
    assert(st.mask(0)(2))
    assert(st.minObserved.sameElements(Array(4.0, 5.0, 3.0)))
    assert(st.execTime == 22.0) // 10+4 + 5 + 3
    val m = st.metrics()
    assert(m.totalLatency == 12.0)
    assert(m.p50 == 4.0)
  }
}
