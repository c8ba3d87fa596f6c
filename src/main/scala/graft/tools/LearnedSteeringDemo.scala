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
  * Usage: graft.tools.LearnedSteeringDemo [sfDir] [rounds] [outDir] [wide]
  *
  * The default query set is the 4-join slice the round-12 artifacts were
  * recorded over. `wide` (round-12 verdict task 7) steers a 16-query
  * slice of the engine's own bench suite — joins, aggregations, windows,
  * text, dedup, ANN — through the join-strategy × AQE config space
  * (broadcast/merge/shuffle-hash/no-broadcast crossed with AQE on/off:
  * the strategy axis IS the broadcast-threshold dimension — `broadcast`
  * forces what a raised threshold would, `no_broadcast` what -1 would),
  * and reports the learned frontier against the default-config total.
  */
object LearnedSteeringDemo {
  /** The wide slice: every family whose plans the hint space can move —
    * join-shaped queries first (steering's home turf), plus agg/window/
    * text/dedup/ANN templates so the TCNN sees the full operator
    * vocabulary. All cheap at sf0.001 (sub-second), so a full exploration
    * fits a demo run. */
  val wideQueryNames: Seq[String] = Seq(
    "q02_top_revenue", "q03_broadcast_join", "q04_semi_join", "q05_anti_join",
    "q37_range_join", "q53_full_outer", "q75_promo_revenue", "q113_snapshot_diff",
    "q10_count_distinct", "q13_group_stats", "q38_salted_agg", "q19_event_windows",
    "q20_token_stats", "q24_dedup_exact", "q28_simhash", "q33_ann_native")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val outDir = java.nio.file.Paths.get(args.lift(2).getOrElse("experiment/steering"))
    val wide = args.lift(3).contains("wide")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.catalyst.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.operators.Relational
    val queries: Seq[(String, SparkSession => org.apache.spark.sql.DataFrame)] =
      if (wide) wideQueryNames.map(n =>
        n -> ((s: SparkSession) => graft.SparkEntry.queries(n)(s, sfDir)))
      else Seq(
        "q02_top_revenue" -> ((s: SparkSession) => Relational.q02TopRevenue(s, sfDir)),
        "q03_broadcast_join" -> ((s: SparkSession) => Relational.q03BroadcastJoin(s, sfDir)),
        "q04_semi_join" -> ((s: SparkSession) => Relational.q04SemiJoin(s, sfDir)),
        "q05_anti_join" -> ((s: SparkSession) => Relational.q05AntiJoin(s, sfDir)))
    val configs =
      if (wide) SteeringLoop.crossed(SteeringLoop.defaultConfigs, SteeringLoop.aqeAxis)
      else SteeringLoop.defaultConfigs
    val prefix = if (wide) "learned16" else "learned"

    // one unsteered warmup pass (JVM/codegen/broadcast warm) so the
    // round-0 default observations measure the query, not the cold JVM
    queries.foreach { case (_, fn) =>
      fn(spark).write.format("noop").mode("overwrite").save()
    }

    val res = LearnedSteering.steerLearned(spark, queries,
      configs = configs, batch = if (wide) 8 else 3, rounds = rounds,
      tracePath = Some(outDir.resolve(s"$prefix.json")),
      referenceTracePath = Some(outDir.resolve(s"${prefix}_trace.json")))

    println(f"explored ${res.observations.length} cells, " +
      f"${res.totalExplorationSeconds}%.2f s total exploration")
    println("learned recommendations:")
    res.recommendations.foreach { r =>
      println(f"  ${r.queryName}%-18s -> ${r.configName}%-16s " +
        f"(${r.observedSeconds}%.3f s vs default ${r.defaultSeconds}%.3f s)")
    }
    val defTotal = res.recommendations.map(_.defaultSeconds).sum
    val frontier = res.recommendations.map(r => math.min(r.observedSeconds, r.defaultSeconds)).sum
    println(f"frontier total ${frontier}%.3f s vs default-config total ${defTotal}%.3f s " +
      f"(${(defTotal - frontier) / defTotal * 100}%.1f%% saved)")
    println(s"traces written under $outDir")
    spark.stop()
  }
}
