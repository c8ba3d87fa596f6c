package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Measurement notes:
  *  - results go to the `noop` sink, not `count()`: count() lets Spark
  *    collapse the plan to a row count (parquet count pushdown) and skip
  *    the projections entirely — noop forces every column to materialize.
  *  - one warmup pass first (JVM/codegen/broadcast warm), then the
  *    measured pass; reported numbers are steady-state.
  */
object Bench {
  /** JSON-bound number formatting MUST be locale-independent: `f"$v%.2f"`
    * uses the default locale, and a comma-decimal locale would emit
    * `1,42` and corrupt the machine-parsed line. */
  private def fmt(v: Double, dp: Int): String =
    String.format(java.util.Locale.ROOT, "%." + dp + "f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.catalyst.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_QUERIES=q01_...,q02_... restricts the set (debug aid);
    // SPARK_GRAFT_WARMUP=0 skips the warmup pass
    val names = sys.env.get("SPARK_GRAFT_QUERIES") match {
      case Some(qs) => qs.split(",").toSeq.filter(SparkEntry.queries.contains)
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0")
      names.foreach { n =>
        ()
        runOnce(n, SparkEntry.queries(n))
      }
    // best of 5 measured passes: this host shows sporadic multi-second
    // whole-JVM stalls (futex storms, system-time waves) unrelated to the
    // query; min-of-k reports steady-state per standard bench practice.
    // Reps are taken as whole-suite PASSES (every query once, then every
    // query again), not back-to-back: a stall wave lasting minutes
    // blankets consecutive runs, so adjacent reps would both land inside
    // it — separating a query's reps by a full pass lets the min escape
    // any wave shorter than the suite (observed: the same suite run twice
    // put 12-22 s on q73-q75 once and on q12-q22/q37 the other time).
    // Default raised 2 → 5 (round-13 verdict task 3): the per-round
    // driver run uses these defaults while the committed close-gate
    // artifact was min-of-6, and the two disagreed by ~13 % every round
    // purely from stall-wave exposure — at 5 separated passes the driver
    // number lands within the committed artifact's noise floor, so both
    // methodologies report the same engine.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val passes = (1 to reps).map(_ => names.map(n => runOnce(n, SparkEntry.queries(n))))
    val results = names.zipWithIndex.map { case (n, i) =>
      val ts = passes.map(_(i))
      val ok = ts.filter(_ >= 0)
      val t = if (ok.nonEmpty) ok.min else -1.0
      System.err.println(f"[bench] $n: $t%.2f s (${ts.map(x => f"$x%.2f").mkString("/")})")
      n -> t
    }

    val total = results.map(_._2).filter(_ >= 0).sum
    // The driver keeps only the LAST 2000 chars of stdout; the full-name
    // 123-query map is ~5 KB, so a full-name final line gets its head cut
    // off mid-JSON and the round artifact records "parsed": null (the
    // round-11 failure mode). The final stdout line therefore uses SHORT
    // keys (the qNN prefix, the contract's own example form) and
    // 2-decimal values — ~1.7 KB at 123 queries, inside the window. Full
    // names + 3-decimal values live in the committed bench/ file below
    // and on stderr.
    // Short keys must stay unique: two SparkEntry names sharing a qNN
    // prefix would silently collapse to one JSON key (last wins). Fail
    // loudly instead — the fix is renaming the offending query.
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    require(shortKeys.distinct.size == results.size,
      "duplicate qNN prefixes in SparkEntry.queries: " +
        shortKeys.diff(shortKeys.distinct).distinct.mkString(","))
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v, 2) }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    System.err.println("[bench] full-name map: " + results.map {
      case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}"))
    // Durable copy of the FULL per-query map: the driver's BENCH_r*.json
    // keeps only the tail of stdout, which truncated q01–q29 out of the
    // round-8 artifact and cost round 7 a noise-vs-regression fight. The
    // committed file (overwritten per run, one pretty line per query for
    // reviewable diffs) makes every timing recoverable from the repo.
    val benchDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench"))
    try {
      java.nio.file.Files.createDirectories(benchDir)
      // A SPARK_GRAFT_QUERIES-filtered debug run must not clobber the
      // committed full-suite artifact with a 2-query map.
      val suffix = if (sys.env.contains("SPARK_GRAFT_QUERIES")) "_partial" else ""
      val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString + suffix
      val pretty = new StringBuilder()
      pretty.append("{\n  \"metric\": \"total\",\n")
      pretty.append(s"""  "value": ${fmt(total, 3)},""" + "\n")
      pretty.append("  \"unit\": \"sec\",\n")
      pretty.append(s"""  "sf": "$sfDir",\n""")
      pretty.append("  \"queries\": {\n")
      pretty.append(results.map { case (k, v) =>
        s"""    "$k": ${fmt(v, 3)}"""
      }.mkString(",\n"))
      pretty.append("\n  }\n}\n")
      java.nio.file.Files.writeString(
        benchDir.resolve(s"bench_$sfName.json"), pretty.toString)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] durable artifact write failed: $e")
    }
    // the driver contract: the compact JSON line is the LAST stdout line —
    // stop Spark FIRST so no shutdown chatter can land after it
    spark.stop()
    println(line)
  }
}
