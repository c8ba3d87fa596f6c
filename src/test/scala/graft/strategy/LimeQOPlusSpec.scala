package graft.strategy

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.core.WorkloadMatrix
import graft.plans.{PlanFeaturizer, PlanNode, PlanRecord}

class LimeQOPlusSpec extends AnyFunSuite {

  /** Synthetic workload + one plan per (row, hint-group), tree costs
    * correlated with runtime (FIXTURES.md §3). */
  private def mkWorkload(nRows: Int, nCols: Int, seed: Long)
      : (WorkloadMatrix, Seq[PlanRecord], Map[String, Int]) = {
    val rng = new Random(seed)
    val values = Array.tabulate(nRows, nCols) { (i, j) =>
      val base = 1.0 + (i % 5) * 2.0
      val factor = 0.3 + 0.4 * ((i * 7 + j * 3) % 5)
      math.rint(base * factor * 100) / 100.0
    }
    val ids = Array.tabulate(nRows)(i => f"q$i%03d")
    val w = new WorkloadMatrix(ids, values)
    val plans = (0 until nRows).flatMap { i =>
      // one plan per distinct hint group of row i
      val groups = (0 until nCols).map(j => w.sameHints(i, j).toList).distinct
      groups.map { cols =>
        val rt = values(i)(cols.head)
        PlanRecord(ids(i), cols, List(rt * (0.98 + rng.nextDouble() * 0.04), rt, rt * 1.01),
          PlanNode("Hash Join", rt * 100.0, rt * 10.0, 8.0,
            List(PlanNode("Seq Scan", rt * 40.0, rt * 5.0, 4.0, Nil),
                 PlanNode("Seq Scan", rt * 60.0, rt * 5.0, 4.0, Nil))))
      }
    }
    (w, plans, ids.zipWithIndex.toMap)
  }

  test("LimeQO+ runs to completion with sane, monotone metrics") {
    val (w, plans, idx) = mkWorkload(24, 6, seed = 42)
    val fz = PlanFeaturizer.fit(plans)
    val trace = Files.createTempFile("limeqo_plus", ".json")
    val strat = new LimeQOPlusStrategy(plans, fz, idx,
      rank = 3, newObserveSize = 8, maxEpochs = 15, seed = 42, maxRounds = 25)
    val res = strat.run(w, None, Some(trace))

    assert(res.nonEmpty)
    // total latency (Σ min observed) is monotone non-increasing
    res.sliding(2).foreach {
      case Vector(a, b) => assert(b.totalLatency <= a.totalLatency + 1e-9)
      case _ =>
    }
    // exec time (cumulative exploration cost) is monotone non-decreasing
    res.sliding(2).foreach {
      case Vector(a, b) => assert(b.execTime >= a.execTime - 1e-9)
      case _ =>
    }
    // round 0 reflects the init mask (only column 0 observed)
    val defaultTotal = (0 until w.nRows).map(i => w.values(i)(0)).sum
    assert(math.abs(res.head.totalLatency - defaultTotal) < 1e-9)
    // it explored something and improved
    assert(res.last.exploreQueriesCnt > 0)
    assert(res.last.totalLatency < res.head.totalLatency)
    // trace file is valid JSON array with one record per round
    val body = Files.readString(trace)
    assert(body.trim.startsWith("[") && body.trim.endsWith("]"))
    assert(body.linesIterator.count(_.contains("\"total_latency\"")) == res.length)
  }

  test("kill/resume: the serialized TCNN continues training mid-stream, trace bit-identical") {
    val (w, plans, idx) = mkWorkload(24, 6, seed = 42)
    val fz = PlanFeaturizer.fit(plans)
    def strat(maxRounds: Int) = new LimeQOPlusStrategy(plans, fz, idx,
      rank = 3, newObserveSize = 8, maxEpochs = 15, seed = 7, maxRounds = maxRounds)
    def noTimes(m: graft.core.RoundMetrics) =
      m.copy(trainingTime = 0.0, inferenceTime = 0.0)

    val fullDir = Files.createTempDirectory("lqp_full")
    val full = strat(20).run(w, None,
      Some(fullDir.resolve("t.json")), Some(fullDir.resolve("t.state.json")))
    assert(full.length > 2, "need rounds beyond the kill point")

    val dir = Files.createTempDirectory("lqp_kill")
    val (trace, snap) = (dir.resolve("t.json"), dir.resolve("t.state.json"))
    val killed = strat(2).run(w, None, Some(trace), Some(snap))
    assert(killed.length == 2)
    val s = RunSnapshot.load(snap).get
    assert(!s.done && s.extra.contains("tcnn"),
      "capped run must leave a resumable snapshot carrying the model")

    val resumed = strat(20).run(w, None, Some(trace), Some(snap))
    assert(resumed.map(noTimes) == full.map(noTimes),
      "resumed limeqo+ trace diverged — model/RNG state not restored exactly")
  }
}
