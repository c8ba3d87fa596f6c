package graft.report

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Workloads

/** Golden: regenerate the reference's `result/job.csv` checkpoint table
  * from its stored traces (`draw/draw_job_fig1.ipynb · cells 2-6`,
  * SURVEY §3.3/§7 step 6) through the Spark report pipeline. */
class ReportSpec extends AnyFunSuite with graft.SharedSpark {

  test("reproduces result/job.csv checkpoints from stored traces") {
    spark.sparkContext.setLogLevel("ERROR")
    val w = Workloads.matrixFromCsv("/root/reference/dataset/job-matrix.csv")
    val pgTotal = w.defaultTime
    val checkpoints = Seq(45.0, 90.0, 180.0, 360.0, 720.0)

    // stored result/job.csv (written by the notebook cell 6)
    val stored = scala.io.Source.fromFile("/root/reference/result/job.csv").getLines().toSeq
    val header = stored.head.split(",")
    val rows = stored.tail.map(_.split(","))

    val globs = Map(
      "Random" -> "/root/reference/experiment/job/random/*.json",
      "Greedy" -> "/root/reference/experiment/job/greedy/*.json",
      "LimeQO" -> "/root/reference/experiment/job/limeqo/*.json",
      "LimeQO+" -> "/root/reference/experiment/job/limeqo+/tcnn_embedding_tcnnratio_timeout1_beta10_rank5_*.json")

    header.zipWithIndex.foreach { case (name, ci) =>
      val traj = Report.trajectories(Report.loadTraces(spark, globs(name)), pgTotal)
      val ours = Report.sampleCheckpoints(Report.interpolated(traj), checkpoints).map(_._2)
      rows.zipWithIndex.foreach { case (row, ri) =>
        val want = row(ci + 1).toDouble
        val got = ours(ri)
        assert(math.abs(got - want) / want < 1e-6,
          s"$name @ ${row(0)}: got $got want $want")
      }
    }
  }

  test("new-query trajectories re-base exploration cost at the latency jump") {
    val sp = spark
    import sp.implicits._
    // latency decreases, then jumps at round 2 (new queries arrive), then decreases
    val traces = Seq(
      ("r1", 0, 100.0, 50.0, 0.0, 0.0),
      ("r1", 1, 110.0, 45.0, 0.0, 0.0),
      ("r1", 2, 130.0, 70.0, 0.0, 0.0), // jump: 70 > 45
      ("r1", 3, 150.0, 60.0, 0.0, 0.0))
      .toDF("run", "round", "exec_time", "total_latency", "training_time", "inference_time")
    val out = Report
      .trajectoriesWithNewQueries(traces, pgTotalBefore = 10.0, pgTotalAfter = 30.0)
      .select("round", "x").as[(Int, Double)].collect().toMap
    assert(out(0) == 90.0 && out(1) == 100.0) // minus old default (10)
    assert(out(2) == 100.0 && out(3) == 120.0) // minus full total (30)
  }
}
