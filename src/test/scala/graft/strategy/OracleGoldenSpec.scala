package graft.strategy

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.sources.Workloads

/** The primary e2e golden gate (SURVEY §5.3, BASELINE.md): the Oracle
  * strategy on JOB must reproduce `experiment/job/oracle.json` — all 70
  * rounds — within 1e-6.
  */
class OracleGoldenSpec extends AnyFunSuite {

  private def loadGolden(path: String): Vector[Map[String, Double]] = {
    val json = JsonMethods.parse(new java.io.File(path))
    json.asInstanceOf[JArray].arr.map { rec =>
      rec.asInstanceOf[JObject].obj.map {
        case (k, JDouble(v)) => k -> v
        case (k, JInt(v)) => k -> v.toDouble
        case (k, v) => k -> 0.0
      }.toMap
    }.toVector
  }

  private def check(dataset: String): Unit = {
    val w = Workloads.matrixFromCsv(s"/root/reference/dataset/$dataset-matrix.csv")
    val ours = new OracleStrategy().run(w, None, None)
    val golden = loadGolden(s"/root/reference/experiment/$dataset/oracle.json")
    assert(ours.length == golden.length,
      s"$dataset: ${ours.length} rounds vs golden ${golden.length}")
    ours.zip(golden).zipWithIndex.foreach { case ((m, g), i) =>
      def eq(name: String, v: Double): Unit =
        assert(math.abs(v - g(name)) <= 1e-6 * math.max(1.0, math.abs(g(name))),
          s"$dataset round $i $name: $v vs ${g(name)}")
      eq("exec_time", m.execTime)
      eq("total_latency", m.totalLatency)
      eq("p50", m.p50); eq("p90", m.p90); eq("p95", m.p95); eq("p99", m.p99)
      // the DSB trace predates the explore_queries_cnt field — optional
      g.get("explore_queries_cnt").foreach { cnt =>
        assert(m.exploreQueriesCnt == cnt.toInt,
          s"$dataset round $i explore_cnt: ${m.exploreQueriesCnt} vs $cnt")
      }
    }
  }

  test("Oracle on JOB reproduces the stored reference trace (70 rounds)") {
    check("job")
  }

  test("Oracle on DSB reproduces the stored reference trace") {
    check("dsb")
  }
}
