package graft.tools

import org.apache.spark.sql.SparkSession
import graft.catalyst.{SteeringLoop, Steered}

/** Runnable demo of the learned-optimizer loop: steer a handful of join
  * queries over the testdata through Catalyst's join-strategy hint space,
  * print the explored workload matrix and the learned per-query hints.
  *
  * Usage: graft.tools.SteeringDemo [sfDir] [rounds]
  */
object SteeringDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
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

    // warm-start from a previous demo run's registry, if present
    val registryPath = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_STEERING_REGISTRY", "/tmp/graft_steering.json"))
    if (java.nio.file.Files.exists(registryPath)) {
      val n = Steered.load(registryPath)
      println(s"loaded $n learned hints from $registryPath")
    }

    val res = SteeringLoop.steer(spark, queries,
      configs = SteeringLoop.defaultConfigs, batch = 3, rounds = rounds, learn = true)

    println(f"\nexplored ${res.observations.length} cells, " +
      f"${res.totalExplorationSeconds}%.2f s total exploration")
    println("round  query               config        seconds")
    res.observations.foreach { o =>
      println(f"${o.round}%5d  ${queries(o.query)._1}%-18s ${SteeringLoop.defaultConfigs(o.config).name}%-12s  ${o.seconds}%.3f")
    }
    println("\nlearned recommendations (auto-applied via Steered.run):")
    res.recommendations.foreach { r =>
      println(f"  ${r.queryName}%-18s -> ${r.configName}%-12s " +
        f"(${r.observedSeconds}%.3f s vs default ${r.defaultSeconds}%.3f s)")
    }
    Steered.save(registryPath)
    println(s"registry saved to $registryPath")
    spark.stop()
  }
}
