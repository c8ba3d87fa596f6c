package graft.catalyst

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.linalg.CensoredALS

/** The online LimeQO loop over Spark itself: queries × join-strategy hints
  * form the workload matrix, Catalyst (steered by [[HintSteeringRule]]) is
  * the optimizer being explored, and censored ALS completes the matrix to
  * decide which (query, hint) cell to actually execute next.
  *
  * This is the reference's architecture with the offline trace swapped for
  * live execution: the reference selects cells from a pre-measured matrix
  * (`src/strategies/limeqo.py:18-123`); here selecting a cell RUNS the
  * query under that hint and the measured wall time becomes the
  * observation. Column 0 is the unsteered default plan, observed for every
  * query up front — the same "default plan always observed" invariant as
  * the reference's init mask (`src/data/dataset.py:31`).
  *
  * Deviation (documented): the offline strategies implement the full
  * timeout/censoring bookkeeping (SURVEY §2.13); online, a timeout
  * requires cancelling a running job at the tolerance cutoff
  * (`sparkContext.cancelJobGroup` after α·minObs) — environment-specific
  * plumbing that this loop omits. Every execution is observed uncensored;
  * the ALS cutoff matrix is all-zero.
  */
object SteeringLoop {

  /** One hint-set column: a join-strategy value for
    * [[HintSteeringRule.ConfKey]] plus any extra session confs to pin
    * while the cell executes (the second steering dimension — AQE on/off,
    * shuffle-partition tier, ...). */
  final case class SteeringConfig(name: String, strategy: String,
                                  confs: Map[String, String] = Map.empty)

  /** Default hint space — the Spark analogue of the reference's 49
    * PostgreSQL hint sets, at the granularity Catalyst exposes. */
  val defaultConfigs: Seq[SteeringConfig] = Seq(
    SteeringConfig("default", ""),
    SteeringConfig("broadcast", "broadcast"),
    SteeringConfig("merge", "merge"),
    SteeringConfig("shuffle_hash", "shuffle_hash"),
    SteeringConfig("no_broadcast", "no_broadcast"))

  /** Cross the join-strategy axis with a second conf axis, enlarging the
    * workload matrix's column space exactly like the reference enlarges
    * its hint sets (49 = the cross product of PostgreSQL enable_* flags,
    * `/root/reference/README.md:10-12`). The first axis entry should be
    * the empty tier so column 0 stays the unsteered default plan (the
    * always-observed LimeQO init column). */
  def crossed(base: Seq[SteeringConfig],
              axis: Seq[(String, Map[String, String])]): Seq[SteeringConfig] =
    for {
      b <- base
      (aName, confs) <- axis
    } yield SteeringConfig(
      if (aName.isEmpty) b.name else s"${b.name}+$aName",
      b.strategy, b.confs ++ confs)

  /** AQE axis: runtime re-planning on (session default) vs off. */
  val aqeAxis: Seq[(String, Map[String, String])] = Seq(
    ("", Map.empty),
    ("noaqe", Map("spark.sql.adaptive.enabled" -> "false")))

  /** Shuffle-partition tiers: the knob whose best value is query-shaped
    * (small dims want few partitions, big facts want many). */
  def partitionTiers(ns: Int*): Seq[(String, Map[String, String])] =
    ("", Map.empty[String, String]) +:
      ns.toSeq.map(n => (s"p$n", Map("spark.sql.shuffle.partitions" -> n.toString)))

  final case class Observation(query: Int, config: Int, seconds: Double, round: Int)
  final case class Recommendation(queryName: String, configName: String,
                                  observedSeconds: Double, defaultSeconds: Double)
  final case class SteeringResult(observations: Vector[Observation],
                                  recommendations: Vector[Recommendation]) {
    def totalExplorationSeconds: Double = observations.map(_.seconds).sum
  }

  /** Measure one query under one steering config: set the session's
    * steering strategy plus the config's extra confs, force a full
    * materialization (noop sink), restore every touched conf.
    * Requires the session to carry [[GraftExtensions]]. */
  def measure(spark: SparkSession, fn: SparkSession => DataFrame,
              config: SteeringConfig): Double = {
    val keys = HintSteeringRule.ConfKey +: config.confs.keys.toSeq
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set(HintSteeringRule.ConfKey, config.strategy)
    config.confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t0 = System.nanoTime()
      fn(spark).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  /** Run the online loop with a pluggable executor (tests inject a synthetic
    * cost function; production passes [[measure]] partially applied).
    *
    * Each round: censored-ALS-complete the observed matrix in log1p space
    * (rank/λ per the reference defaults), rank unobserved cells by the
    * predicted improvement ratio over the query's current best
    * (`limeqo.py:71`), execute the top `batch` cells, observe.
    */
  def run(queryNames: Seq[String], configNames: Seq[String],
          exec: (Int, Int) => Double,
          batch: Int = 2, rounds: Int = 3, rank: Int = 2,
          lambda: Double = 0.2, alsIters: Int = 50, seed: Long = 42): SteeringResult = {
    val nQ = queryNames.length
    val nC = configNames.length
    val values = Array.fill(nQ, nC)(0.0)
    val mask = Array.fill(nQ, nC)(false)
    val obs = Vector.newBuilder[Observation]

    // round 0: default plan for every query (column 0 always observed)
    var q = 0
    while (q < nQ) {
      values(q)(0) = exec(q, 0); mask(q)(0) = true
      obs += Observation(q, 0, values(q)(0), 0)
      q += 1
    }

    val rng = new scala.util.Random(seed)
    var round = 1
    while (round <= rounds && mask.exists(_.contains(false))) {
      val logM = DenseMatrix.tabulate(nQ, nC)((r, c) =>
        if (mask(r)(c)) math.log1p(values(r)(c)) else 0.0)
      val maskM = DenseMatrix.tabulate(nQ, nC)((r, c) => if (mask(r)(c)) 1.0 else 0.0)
      val zeros = DenseMatrix.zeros[Double](nQ, nC)
      val als = new CensoredALS(rank, alsIters, lambda, rng.nextLong())
      val completed = als.complete(logM, maskM, zeros)

      val minObs = Array.tabulate(nQ)(r =>
        (0 until nC).filter(mask(r)).map(values(r)).min)
      // best unobserved prediction per query + improvement ratio
      val candidates = for {
        r <- 0 until nQ
        c <- 0 until nC if !mask(r)(c)
        pred = math.expm1(completed(r, c)) if pred > 0.0
      } yield (r, c, (minObs(r) - pred) / pred)
      val picks = candidates.sortBy { case (r, c, imp) => (-imp, r, c) }.take(batch)
      // no eligible cell (every unobserved prediction collapsed to ≤0):
      // further rounds would refit ALS without ever observing — stop
      if (picks.isEmpty) round = rounds

      picks.foreach { case (r, c, _) =>
        values(r)(c) = exec(r, c); mask(r)(c) = true
        obs += Observation(r, c, values(r)(c), round)
      }
      round += 1
    }

    val recs = (0 until nQ).map { r =>
      val best = (0 until nC).filter(mask(r)).minBy(c => (values(r)(c), c))
      Recommendation(queryNames(r), configNames(best), values(r)(best), values(r)(0))
    }
    SteeringResult(obs.result(), recs.toVector)
  }

  /** End-to-end convenience: steer a set of DataFrame-producing queries on
    * a live (extension-carrying) session. With `learn = true` each query's
    * recommendation is recorded in the [[Steered]] registry under the
    * query's template fingerprint, so future executions of the same
    * template via [[Steered.run]] automatically use the learned hint. */
  def steer(spark: SparkSession, queries: Seq[(String, SparkSession => DataFrame)],
            configs: Seq[SteeringConfig] = defaultConfigs,
            batch: Int = 2, rounds: Int = 3, learn: Boolean = false): SteeringResult = {
    val res = run(queries.map(_._1), configs.map(_.name),
      (q, c) => measure(spark, queries(q)._2, configs(c)),
      batch = batch, rounds = rounds)
    if (learn) {
      val byName = queries.toMap
      res.recommendations.foreach { r =>
        val cfg = configs.find(_.name == r.configName)
          .getOrElse(SteeringConfig(r.configName, ""))
        // the FULL config is learned — second-dimension confs included
        Steered.learn(byName(r.queryName)(spark), cfg.strategy, cfg.confs)
      }
    }
    res
  }
}
