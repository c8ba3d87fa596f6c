package graft.strategy

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.report.Report
import graft.sources.Workloads

/** SURVEY §5.3 envelope golden: a seeded LimeQO run on the real JOB
  * workload must land inside the stored 20-run cross-run band at the
  * reference's checkpoints (stochastic traces don't replay bit-exactly —
  * RNG streams differ — but the trajectory must be statistically
  * indistinguishable from the reference's own runs). */
class LimeQOEnvelopeSpec extends AnyFunSuite with graft.SharedSpark {

  test("seeded LimeQO on JOB stays inside the stored-trace envelope") {
    spark.sparkContext.setLogLevel("ERROR")
    val w = Workloads.matrixFromCsv("/root/reference/dataset/job-matrix.csv")
    val mask = Workloads.initMask("/root/reference/dataset/init_job_mask.npy", w)
    val pgTotal = w.defaultTime
    // late checkpoints only: a SINGLE run's early-checkpoint latency is
    // dominated by the ALS init draw — replaying the reference's own
    // round-1 selection 12× in NumPy gives post-round-1 latencies ranging
    // 90–164 s, so a 45/90/180 s single-run check would be vacuous. By
    // 360/720 s the trajectories converge tightly (stored cross-run std
    // ≈ 1–3 s) and the comparison is meaningful.
    val checkpoints = Seq(360.0, 720.0)

    // stored envelope: mean ± std across the reference's 20 LimeQO runs
    val traj = Report.trajectories(
      Report.loadTraces(spark, "/root/reference/experiment/job/limeqo/*.json"), pgTotal)
    val envelope = Report.sampleCheckpoints(Report.interpolated(traj), checkpoints)

    // our seeded run, with the exploration-budget stop the stored traces
    // used (they run far past the current +20 rule — see LimeQOStrategy
    // doc); bounded rounds keep the spec finite when late-round progress
    // crawls
    // batch 32 = the limeqo.py ctor default the stored traces were
    // generated with (run_experiment.py now passes 8 — SURVEY §5.3 notes
    // stored artifacts predate current defaults)
    val res = new LimeQOStrategy(seed = 42, newObserveSize = 32,
      budgetSeconds = Some(1000.0), maxRounds = 100).run(w, Some(mask), None)
    assert(res.length > 5)
    val xs = res.map(_.execTime - pgTotal)
    val ys = res.map(_.totalLatency)
    assert(xs.last > 750, s"run too short: explored ${xs.last}s")

    def interpAt(t: Double): Double = {
      val i = xs.indexWhere(_ >= t)
      assert(i > 0, s"checkpoint $t before first round")
      ys(i - 1) + (ys(i) - ys(i - 1)) * (t - xs(i - 1)) / (xs(i) - xs(i - 1))
    }

    envelope.zip(checkpoints).filter(_._1._1 <= xs.last).foreach { case ((g, mean, std), t) =>
      val ours = interpAt(g)
      val tol = 4.0 * std + 0.05 * mean
      assert(math.abs(ours - mean) <= tol,
        f"checkpoint ${t}s (grid $g%.1f): ours=$ours%.2f mean=$mean%.2f std=$std%.2f tol=$tol%.2f")
    }
  }

  test("seeded LimeQO on CEB stays inside the stored-trace envelope (0.75h checkpoint)") {
    spark.sparkContext.setLogLevel("ERROR")
    val w = Workloads.matrixFromCsv("/root/reference/dataset/ceb-matrix.csv")
    val mask = Workloads.initMask("/root/reference/dataset/init_ceb_mask.npy", w)
    val pgTotal = w.defaultTime
    // the paper's first CEB checkpoint (BASELINE.md: 0.75 h exploration)
    val checkpoints = Seq(0.75 * 3600)

    val traj = Report.trajectories(
      Report.loadTraces(spark, "/root/reference/experiment/ceb/limeqo/*.json"), pgTotal)
    val envelope = Report.sampleCheckpoints(Report.interpolated(traj), checkpoints)

    val res = new LimeQOStrategy(seed = 42, newObserveSize = 8,
      budgetSeconds = Some(3000.0), maxRounds = 400).run(w, Some(mask), None)
    val xs = res.map(_.execTime - pgTotal)
    val ys = res.map(_.totalLatency)
    assert(xs.last > 2700, s"run too short: explored ${xs.last}s")

    def interpAt(t: Double): Double = {
      val i = xs.indexWhere(_ >= t)
      assert(i > 0, s"checkpoint $t before first round")
      ys(i - 1) + (ys(i) - ys(i - 1)) * (t - xs(i - 1)) / (xs(i) - xs(i - 1))
    }

    envelope.zip(checkpoints).foreach { case ((g, mean, std), t) =>
      val ours = interpAt(g)
      val tol = 4.0 * std + 0.05 * mean
      assert(math.abs(ours - mean) <= tol,
        f"checkpoint ${t}s (grid $g%.1f): ours=$ours%.2f mean=$mean%.2f std=$std%.2f tol=$tol%.2f")
    }
  }
}
