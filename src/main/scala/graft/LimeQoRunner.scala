package graft

import java.nio.file.Paths
import graft.sources.Workloads
import graft.strategy._

/** CLI entry for the strategy programs — the Spark-native equivalent of the
  * reference's `src/run_experiment.py` (SURVEY §3.1).
  *
  * Usage:
  *   graft.LimeQoRunner <strategy> <matrix.csv> <out.json> [--mask m.npy]
  *                      [--batch 8] [--seed 42] [--rank 5] [--alpha 1]
  *                      [--beta 15] [--lambda 0.2] [--max-rounds N]
  *
  * strategies: oracle | qo_advisor | random | greedy | limeqo
  * Writes the per-round JSON trace (reference artifact format, S4) to
  * <out.json> after every round.
  */
object LimeQoRunner {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: LimeQoRunner <oracle|qo_advisor|random|greedy|limeqo> <matrix.csv> <out.json> " +
        "[--mask m.npy] [--batch 8] [--seed 42] [--rank 5] [--alpha 1.0] [--beta 15.0] " +
        "[--lambda 0.2] [--max-rounds N]")
      sys.exit(2)
    }
    val Array(stratName, matrixPath, outPath) = args.take(3)
    val opts = args.drop(3).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

    val batch = opts.getOrElse("batch", "8").toInt
    val seed = opts.getOrElse("seed", "42").toLong
    val rank = opts.getOrElse("rank", "5").toInt
    val alpha = opts.getOrElse("alpha", "1.0").toDouble
    val beta = opts.getOrElse("beta", "15.0").toDouble
    val lambda = opts.getOrElse("lambda", "0.2").toDouble
    val maxRounds = opts.get("max-rounds").map(_.toInt).getOrElse(Int.MaxValue)

    val w = Workloads.matrixFromCsv(matrixPath)
    val mask = opts.get("mask").map(Workloads.initMask(_, w))

    val strategy: Strategy = stratName match {
      case "oracle" => new OracleStrategy
      case "qo_advisor" => new QOAdvisorStrategy(batch)
      case "random" => new RandomStrategy(batch, seed)
      case "greedy" => new GreedyStrategy(batch, seed)
      case "limeqo" => new LimeQOStrategy(rank, lambda, alpha, beta, batch,
        seed = seed, maxRounds = maxRounds)
      case other =>
        System.err.println(s"unknown strategy: $other"); sys.exit(2); null
    }

    val t0 = System.nanoTime()
    val results = strategy.run(w, mask, Some(Paths.get(outPath)))
    val secs = (System.nanoTime() - t0) / 1e9
    val last = results.lastOption
    println(f"${strategy.name}: ${results.length} rounds in $secs%.2f s; " +
      f"final total_latency ${last.map(_.totalLatency).getOrElse(Double.NaN)}%.3f " +
      f"(default ${w.defaultTime}%.3f, optimal ${w.optTime}%.3f)")
  }
}
