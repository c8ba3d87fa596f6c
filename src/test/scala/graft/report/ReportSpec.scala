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

  test("reproduces result/{ceb,dsb,stack}.csv checkpoints from stored traces") {
    spark.sparkContext.setLogLevel("ERROR")
    // these three notebooks interpolate in HOURS with a tight (0.99, 1.01)
    // get_y band (`draw_<ds>_fig1.ipynb · cells 2-3`), unlike JOB's
    // seconds + (0.6, 1.4). stack's matrix CSV is absent upstream
    // (dataset/.MISSING_LARGE_BLOBS), so its pg_total is recovered from the
    // traces: round 0 of every no-init-mask strategy records
    // exec_time == pg_total (random/greedy/qo_advisor all agree).
    // globs mirror the notebooks' `"{}.json".format(i)` loops EXACTLY:
    // `[0-9]*.json` excludes the wocensored_* / beta10_* ablation traces
    // and the rank* subdirs that share these directories (including them
    // shifts LimeQO@0.75h by 1.7% — measured)
    val e = "/root/reference/experiment"
    val datasets = Seq(
      // (name, pgTotal, checkpoints h, per-column globs)
      ("ceb", Workloads.matrixFromCsv("/root/reference/dataset/ceb-matrix.csv").defaultTime,
        Seq(0.75, 1.5, 3.0, 6.0, 12.0),
        Seq("Random" -> s"$e/ceb/random/[0-9]*.json",
            "Greedy" -> s"$e/ceb/greedy/[0-9]*.json",
            "LimeQO" -> s"$e/ceb/limeqo/[0-9]*.json",
            "LimeQO+" -> s"$e/ceb/limeqo+/[0-9]*.json")),
      ("dsb", Workloads.matrixFromCsv("/root/reference/dataset/dsb-matrix.csv").defaultTime,
        Seq(1.1875, 2.375, 4.75, 7.5, 15.0),
        Seq("Random" -> s"$e/dsb/random/[0-9]*.json",
            "Greedy" -> s"$e/dsb/greedy/[0-9]*.json",
            "LimeQO" -> s"$e/dsb/limeqo/[0-9]*.json",
            "LimeQO+" -> s"$e/dsb/limeqo+/[0-9]*.json")),
      ("stack", 5272.4370493888855,
        Seq(0.375, 0.75, 1.5, 3.0, 6.0),
        Seq("Random" -> s"$e/stack/random/[0-9]*.json",
            "Greedy" -> s"$e/stack/greedy/[0-9]*.json",
            "LimeQO" -> s"$e/stack/limeqo/[0-9]*.json",
            "LimeQO (Datashift)" -> s"$e/stack-datashift/stack_[0-9]*.json")))

    datasets.foreach { case (ds, pgTotal, checkpoints, columns) =>
      val stored = scala.io.Source.fromFile(s"/root/reference/result/$ds.csv").getLines().toSeq
      val header = stored.head.split(",")
      val rows = stored.tail.map(_.split(","))
      header.zipWithIndex.foreach { case (name, ci) =>
        val glob = columns.find(_._1 == name)
          .getOrElse(fail(s"$ds: no glob for column $name"))._2
        val traj = Report.inHours(
          Report.trajectories(Report.loadTraces(spark, glob), pgTotal))
        val ours = Report.sampleCheckpoints(Report.interpolated(traj), checkpoints,
          bandLo = 0.99, bandHi = 1.01).map(_._2)
        rows.zipWithIndex.foreach { case (row, ri) =>
          val want = row(ci + 1).toDouble
          val got = ours(ri)
          assert(math.abs(got - want) / want < 1e-6,
            s"$ds $name @ ${row(0)}: got $got want $want")
        }
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
