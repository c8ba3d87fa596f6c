package graft.tools

import org.apache.spark.sql.SparkSession
import graft.catalyst.{LearnedSteering, SteeringLoop}

/** Runnable end-to-end of the north-star loop: LimeQO+ (TCNN over this
  * engine's own live Catalyst plan trees) steers real queries on the
  * testdata through the join-strategy hint space with tolerance-bounded
  * measurement, and records the run as BOTH artifacts: the resumable
  * steering trace and a reference-layout per-round trace
  * (`experiment/steering/learned*.json` — the same artifact tree the
  * offline strategies populate).
  *
  * Usage: graft.tools.LearnedSteeringDemo [sfDir] [rounds] [outDir]
  */
object LearnedSteeringDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val outDir = java.nio.file.Paths.get(args.lift(2).getOrElse("experiment/steering"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.catalyst.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.operators.Relational
    val queries: Seq[(String, SparkSession => org.apache.spark.sql.DataFrame)] = Seq(
      "q02_top_revenue" -> ((s: SparkSession) => Relational.q02TopRevenue(s, sfDir)),
      "q03_broadcast_join" -> ((s: SparkSession) => Relational.q03BroadcastJoin(s, sfDir)),
      "q04_semi_join" -> ((s: SparkSession) => Relational.q04SemiJoin(s, sfDir)),
      "q05_anti_join" -> ((s: SparkSession) => Relational.q05AntiJoin(s, sfDir)))

    // one unsteered warmup pass (JVM/codegen/broadcast warm) so the
    // round-0 default observations measure the query, not the cold JVM
    queries.foreach { case (_, fn) =>
      fn(spark).write.format("noop").mode("overwrite").save()
    }

    val res = LearnedSteering.steerLearned(spark, queries,
      configs = SteeringLoop.defaultConfigs, batch = 3, rounds = rounds,
      tracePath = Some(outDir.resolve("learned.json")),
      referenceTracePath = Some(outDir.resolve("learned_trace.json")))

    println(f"explored ${res.observations.length} cells, " +
      f"${res.totalExplorationSeconds}%.2f s total exploration")
    println("learned recommendations:")
    res.recommendations.foreach { r =>
      println(f"  ${r.queryName}%-18s -> ${r.configName}%-12s " +
        f"(${r.observedSeconds}%.3f s vs default ${r.defaultSeconds}%.3f s)")
    }
    println(s"traces written under $outDir")
    spark.stop()
  }
}
