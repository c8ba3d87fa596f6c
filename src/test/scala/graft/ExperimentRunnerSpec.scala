package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.report.Report
import graft.sources.Workloads

/** End-to-end grid parity (VERDICT r3 ask #4): one ExperimentRunner
  * invocation on the real JOB workload must regenerate the reference's
  * artifact tree — per-strategy trace JSONs plus the `result/<ds>.csv`
  * checkpoint table — with the Oracle trace matching the stored
  * `experiment/job/oracle.json` exactly and the stochastic strategies'
  * checkpoints inside the stored cross-run envelope (SURVEY §5.3: RNG
  * streams differ from NumPy, so stochastic runs compare statistically,
  * not bit-wise).
  *
  * A reduced grid (3 seeds vs the reference's 20) keeps the spec under a
  * couple of minutes; the full-size grid is the CLI default.
  */
class ExperimentRunnerSpec extends AnyFunSuite with SharedSpark {

  test("grid run regenerates oracle-exact traces and in-envelope checkpoints") {
    spark.sparkContext.setLogLevel("ERROR")
    val out = Files.createTempDirectory("graft_experiment").toString
    ExperimentRunner.main(Array(
      "/root/reference/dataset/job-matrix.csv", out,
      "--mask", "/root/reference/dataset/init_job_mask.npy",
      "--seeds", "3",
      "--limeqo-budget", "1000", "--limeqo-max-rounds", "120",
      "--checkpoints", "45,90,180,360"))

    // --- artifact tree in the reference layout
    assert(Files.exists(java.nio.file.Paths.get(s"$out/oracle.json")))
    assert(Files.exists(java.nio.file.Paths.get(s"$out/qo_advisor/1.json")))
    for (s <- Seq("random", "greedy", "limeqo"); i <- 1 to 3)
      assert(Files.exists(java.nio.file.Paths.get(s"$out/$s/$i.json")), s"$s/$i.json missing")

    // --- Oracle: deterministic, must match the stored reference trace
    // round-for-round (same check as OracleGoldenSpec, but through the
    // runner's own artifact)
    def rounds(path: String): Array[(Long, Double, Double)] =
      Report.loadTraces(spark, path)
        .select("round", "exec_time", "total_latency")
        .collect().map(r => (r.getInt(0).toLong, r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
    val ours = rounds(s"$out/oracle.json")
    val ref = rounds("/root/reference/experiment/job/oracle.json")
    assert(ours.length == ref.length, s"oracle rounds ${ours.length} != ${ref.length}")
    ours.zip(ref).foreach { case ((r, oe, ol), (_, re, rl)) =>
      assert(math.abs(oe - re) <= 1e-9 * math.max(1.0, math.abs(re)), s"round $r exec_time $oe vs $re")
      assert(math.abs(ol - rl) <= 1e-9 * math.max(1.0, math.abs(rl)), s"round $r total_latency $ol vs $rl")
    }

    // --- checkpoint CSV: same layout as result/job.csv, values inside the
    // envelope. 45/90s are dominated by single-run init variance (see
    // LimeQOEnvelopeSpec) — compare the converged 180/360s rows; a 3-seed
    // mean vs the stored 20-run mean gets a 15% band.
    val csv = Files.readString(java.nio.file.Paths.get(s"$out/result.csv")).linesIterator.toSeq
    assert(csv.head == "Random,Greedy,LimeQO", csv.head)
    val rows = csv.tail.map(_.split(",")).map(r => r(0) -> r.tail.map(_.toDouble)).toMap
    assert(rows.keySet == Set("45s", "90s", "180s", "360s"), rows.keySet.toString)

    val stored = scala.io.Source.fromFile("/root/reference/result/job.csv")
      .getLines().toSeq
    val storedCols = stored.head.split(",").zipWithIndex.toMap // Random,Greedy,LimeQO,LimeQO+
    val storedRows = stored.tail.map(_.split(",")).map(r => r(0) -> r.tail.map(_.toDouble)).toMap
    for (label <- Seq("180s", "360s"); (name, ci) <- Seq("Random" -> 0, "Greedy" -> 1, "LimeQO" -> 2)) {
      val got = rows(label)(ci)
      val want = storedRows(label)(storedCols(name))
      assert(math.abs(got - want) / want < 0.15,
        f"$name @ $label: regenerated $got%.2f vs stored $want%.2f (>15%%)")
    }

    // sanity: workload bounds hold at every checkpoint
    val w = Workloads.matrixFromCsv("/root/reference/dataset/job-matrix.csv")
    rows.values.flatten.foreach { v =>
      assert(v >= w.optTime - 1e-6 && v <= w.defaultTime + 1e-6, s"latency $v outside [opt, default]")
    }
  }

  test("limeqo+ stage runs from synthetic plan-tree files") {
    // the reference ships without its dataset zips, so the runner's
    // LimeQO+ stage can only be driven with generated artifacts: a tiny
    // matrix CSV plus one reference-format plan JSON per (query,
    // hint-group), same fixture shape as LimeQOPlusSpec (FIXTURES.md §3)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft_plus")
    val nRows = 12
    val nCols = 4
    val values = Array.tabulate(nRows, nCols) { (i, j) =>
      math.rint((1.0 + (i % 5) * 2.0) * (0.3 + 0.4 * ((i * 7 + j * 3) % 5)) * 100) / 100.0
    }
    val ids = Array.tabulate(nRows)(i => f"q$i%03d")
    val csv = ("filename" +: (0 until nCols).map(_.toString)).mkString(",") + "\n" +
      ids.zip(values).map { case (id, row) => (id +: row.map(_.toString)).mkString(",") }.mkString("\n")
    Files.writeString(dir.resolve("matrix.csv"), csv)

    val plansDir = Files.createDirectory(dir.resolve("plans"))
    val w = new graft.core.WorkloadMatrix(ids, values)
    for (i <- 0 until nRows; cols <- (0 until nCols).map(j => w.sameHints(i, j).toList).distinct) {
      val rt = values(i)(cols.head)
      val node = (c: Double, r: Double) =>
        s"""{"Node Type": "Seq Scan", "Total Cost": $c, "Plan Rows": $r, "Plan Width": 4.0}"""
      val json =
        s"""{"filename": "${ids(i)}", "hint_list": [${cols.mkString(",")}],
           |"runtime_list": [${rt * 0.99}, $rt, ${rt * 1.01}],
           |"plan": [[[{"Plan": {"Node Type": "Hash Join", "Total Cost": ${rt * 100},
           |"Plan Rows": ${rt * 10}, "Plan Width": 8.0,
           |"Plans": [${node(rt * 40, rt * 5)}, ${node(rt * 60, rt * 5)}]}}]]]}""".stripMargin
      Files.writeString(plansDir.resolve(s"${ids(i)}_${cols.head}.json"), json)
    }

    ExperimentRunner.main(Array(
      dir.resolve("matrix.csv").toString, dir.resolve("out").toString,
      "--plans", s"$plansDir/*.json",
      "--seeds", "1", "--plus-seeds", "2", "--plus-batch", "4",
      "--limeqo-max-rounds", "30",
      "--skip", "oracle,qo_advisor,random,greedy,limeqo,report"))

    for (i <- 1 to 2) {
      val p = dir.resolve(s"out/limeqo+/$i.json")
      assert(Files.exists(p), s"limeqo+/$i.json missing")
      val traces = Report.loadTraces(spark, p.toString)
        .select("round", "total_latency").collect().sortBy(_.getInt(0))
      assert(traces.nonEmpty)
      // total latency is monotone non-increasing across rounds
      traces.map(_.getDouble(1)).sliding(2).foreach {
        case Array(a, b) => assert(b <= a + 1e-9, s"latency rose: $a -> $b")
        case _ =>
      }
    }
  }

  test("--resume: a killed grid continues from its snapshots, completed runs skip") {
    // kill the grid mid-limeqo by capping rounds; the rerun with --resume
    // must (a) leave the completed oracle trace untouched, (b) continue
    // limeqo from its persisted RoundState to a trace bit-identical
    // (modulo measured training/inference times — compared through the
    // derived fields) to an uninterrupted run's
    spark.sparkContext.setLogLevel("ERROR")
    val interrupted = Files.createTempDirectory("graft_resume_grid").toString
    val common = Array(
      "/root/reference/dataset/job-matrix.csv",
      "--mask", "/root/reference/dataset/init_job_mask.npy",
      "--seeds", "1", "--limeqo-budget", "1000",
      "--skip", "random,greedy,limeqo_plus,report")
    ExperimentRunner.main(Array(common(0), interrupted) ++ common.drop(1) ++
      Array("--limeqo-max-rounds", "5"))

    val oracleBytes = Files.readString(java.nio.file.Paths.get(s"$interrupted/oracle.json"))
    val killedLimeqo = Files.readString(java.nio.file.Paths.get(s"$interrupted/limeqo/1.json"))

    ExperimentRunner.main(Array(common(0), interrupted) ++ common.drop(1) ++
      Array("--limeqo-max-rounds", "120", "--resume", "true"))

    assert(Files.readString(java.nio.file.Paths.get(s"$interrupted/oracle.json")) == oracleBytes,
      "completed oracle run was not skipped on --resume")
    val resumedLimeqo = Files.readString(java.nio.file.Paths.get(s"$interrupted/limeqo/1.json"))
    assert(resumedLimeqo != killedLimeqo, "limeqo trace did not grow past the kill point")

    // uninterrupted control run
    val control = Files.createTempDirectory("graft_resume_ctl").toString
    ExperimentRunner.main(Array(common(0), control) ++ common.drop(1) ++
      Array("--limeqo-max-rounds", "120", "--skip", "oracle,qo_advisor,random,greedy,limeqo_plus,report"))

    def derived(path: String): Seq[(Double, Double, Long)] =
      graft.report.Report.loadTraces(spark, path)
        .select("round", "exec_time", "total_latency", "explore_queries_cnt")
        .collect().sortBy(_.getInt(0))
        .map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(derived(s"$interrupted/limeqo/1.json") == derived(s"$control/limeqo/1.json"),
      "resumed limeqo grid run diverged from the uninterrupted control")
  }

  test("--resume refuses snapshots from a different config (fingerprint mismatch)") {
    // run the oracle to completion under budget A, then rerun with
    // --resume under budget B: the done snapshot must NOT be skipped (its
    // config fingerprint differs), and the fresh rerun must still land
    // the deterministic oracle trace. A same-config rerun DOES skip —
    // proven by mtime staying put.
    spark.sparkContext.setLogLevel("ERROR")
    val out = Files.createTempDirectory("graft_cfg_guard").toString
    val base = Array(
      "/root/reference/dataset/job-matrix.csv", out,
      "--mask", "/root/reference/dataset/init_job_mask.npy",
      "--seeds", "1",
      "--skip", "qo_advisor,random,greedy,limeqo,limeqo_plus,report")
    ExperimentRunner.main(base ++ Array("--budget", "300", "--resume", "true"))
    val trace = java.nio.file.Paths.get(s"$out/oracle.json")
    val snap = graft.strategy.RunSnapshot.pathFor(trace)
    assert(Files.exists(snap))

    // same config: the completed run is skipped (snapshot untouched)
    val t1 = Files.getLastModifiedTime(snap)
    ExperimentRunner.main(base ++ Array("--budget", "300", "--resume", "true"))
    assert(Files.getLastModifiedTime(snap) == t1,
      "same-config rerun should have skipped the completed run")

    // changed budget: fingerprint differs -> rerun fresh, not skip
    ExperimentRunner.main(base ++ Array("--budget", "600", "--resume", "true"))
    assert(Files.getLastModifiedTime(snap) != t1,
      "changed-config rerun must not skip the stale done snapshot")
    val rounds = graft.report.Report.loadTraces(spark, trace.toString).count()
    assert(rounds > 0)
  }

  test("--resume fingerprints the mask BYTES: an in-place mask edit invalidates the snapshot") {
    // Round-12 advice: the fingerprint hashed the matrix bytes but only
    // the mask's PATH string, so editing the mask file in place left the
    // fingerprint unchanged and a stale done snapshot was still skipped
    // — the exact failure the guard exists to prevent.
    spark.sparkContext.setLogLevel("ERROR")
    val out = Files.createTempDirectory("graft_mask_guard").toString
    val mask = java.nio.file.Paths.get(out, "mask.npy")
    Files.copy(java.nio.file.Paths.get("/root/reference/dataset/init_job_mask.npy"), mask)
    val base = Array(
      "/root/reference/dataset/job-matrix.csv", out,
      "--mask", mask.toString, "--seeds", "1", "--budget", "300",
      "--skip", "qo_advisor,random,greedy,limeqo,limeqo_plus,report",
      "--resume", "true")
    ExperimentRunner.main(base)
    val snap = graft.strategy.RunSnapshot.pathFor(
      java.nio.file.Paths.get(s"$out/oracle.json"))
    assert(Files.exists(snap))
    val t1 = Files.getLastModifiedTime(snap)

    // flip one data byte of the mask IN PLACE: same path, different bytes
    val bytes = Files.readAllBytes(mask)
    bytes(bytes.length - 1) = (if (bytes.last == 0) 1 else 0).toByte
    Files.write(mask, bytes)
    ExperimentRunner.main(base)
    assert(Files.getLastModifiedTime(snap) != t1,
      "in-place mask edit must invalidate the config fingerprint and rerun fresh")
  }
}
