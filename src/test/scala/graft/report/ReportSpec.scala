package graft.report

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.sources.Workloads

/** Golden: the Spark report pipeline must reproduce the reference's
  * checkpoint table `result/job.csv` (written by draw_job_fig1.ipynb from
  * the stored 20-run traces) for Random/Greedy/LimeQO. */
class ReportSpec extends AnyFunSuite with SharedSpark {

  private val checkpoints = Seq(45.0, 90.0, 180.0, 360.0, 720.0)
  // result/job.csv rows 45s..720s
  private val golden = Map(
    "random" -> Seq(151.54156285823274, 138.35613634601367, 119.16345701773753, 89.93160318262412, 73.75393586959035),
    "greedy" -> Seq(143.8505288755763, 120.40824827328822, 96.81831637903878, 81.77329953633604, 73.21055792139133),
    "limeqo" -> Seq(132.08518752095495, 112.43901799898114, 99.3709527077904, 85.31266575035245, 71.83074532274945))

  test("reproduces result/job.csv checkpoints from stored traces") {
    val w = Workloads.matrixFromCsv("/root/reference/dataset/job-matrix.csv")
    golden.foreach { case (strat, expected) =>
      val traces = Report.loadTraces(spark, s"/root/reference/experiment/job/$strat/*.json")
      val traj = Report.trajectories(traces, w.defaultTime)
      val stats = Report.interpolated(traj)
      val got = Report.sampleCheckpoints(stats, checkpoints).map(_._2)
      got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) <= 1e-6 * math.max(1.0, math.abs(e)),
          s"$strat checkpoint ${checkpoints(i)}: $g vs $e")
      }
    }
  }
}
