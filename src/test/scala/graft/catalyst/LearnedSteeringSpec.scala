package graft.catalyst

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.plans.{PlanNode, PlanTrees, SparkPlanTrees}

/** The north-star loop closed (round-11 verdict task 1): LimeQO+'s
  * Tree-CNN consumes THIS engine's live Catalyst plans and steers the
  * engine itself through [[SteeringLoop.runWith]]. Pins: the
  * SparkPlan→PlanNode bridge (steering visibly changes the tree the model
  * sees, wrappers dissolve, the reference binarizer consumes it), and the
  * headline claim — at equal exploration budget on the live config space,
  * TCNN-steered selection reaches a lower total-latency frontier than
  * matrix-only (ALS) steering, because the TCNN reads every unexplored
  * cell's plan tree while ALS sees only a (row, column) position.
  */
class LearnedSteeringSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  import graft.Tables._

  // eight real queries with varied join shapes over the testdata
  private def queries: Seq[(String, SparkSession => DataFrame)] = Seq(
    "cust_orders" -> ((s: SparkSession) => {
      val c = customer(s, sf); val o = orders(s, sf)
      c.join(o, c("c_custkey") === o("o_custkey")).groupBy("c_mktsegment").count()
    }),
    "orders_lineitem" -> ((s: SparkSession) => {
      val o = orders(s, sf); val l = lineitem(s, sf)
      o.join(l, o("o_orderkey") === l("l_orderkey")).groupBy("o_orderpriority").count()
    }),
    "nation_supplier" -> ((s: SparkSession) => {
      val n = nation(s, sf); val su = supplier(s, sf)
      n.join(su, n("n_nationkey") === su("s_nationkey")).groupBy("n_name").count()
    }),
    "part_lineitem" -> ((s: SparkSession) => {
      val p = part(s, sf); val l = lineitem(s, sf)
      p.join(l, p("p_partkey") === l("l_partkey")).groupBy("p_brand").count()
    }),
    "cust_nation" -> ((s: SparkSession) => {
      val c = customer(s, sf); val n = nation(s, sf)
      c.join(n, c("c_nationkey") === n("n_nationkey")).groupBy("n_name").count()
    }),
    "supp_lineitem" -> ((s: SparkSession) => {
      val su = supplier(s, sf); val l = lineitem(s, sf)
      su.join(l, su("s_suppkey") === l("l_suppkey")).groupBy("s_nationkey").count()
    }),
    "region_nation" -> ((s: SparkSession) => {
      val r = region(s, sf); val n = nation(s, sf)
      r.join(n, r("r_regionkey") === n("n_regionkey")).groupBy("r_name").count()
    }),
    "orders_cust_nation" -> ((s: SparkSession) => {
      val o = orders(s, sf); val c = customer(s, sf); val n = nation(s, sf)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name").count()
    }))

  private def countType(t: PlanNode, sub: String): Int =
    (if (t.nodeType.contains(sub)) 1 else 0) + t.children.map(countType(_, sub)).sum

  test("live physical plans map to the reference data model; steering changes the tree") {
    val (_, fn) = queries.head
    val merged = LearnedSteering.planFor(spark, fn, SteeringLoop.SteeringConfig("merge", "merge"))
    val bcast = LearnedSteering.planFor(spark, fn, SteeringLoop.SteeringConfig("broadcast", "broadcast"))
    assert(countType(merged, "SortMergeJoin") >= 1, merged.allNodeTypes.toString)
    assert(countType(bcast, "BroadcastHashJoin") >= 1, bcast.allNodeTypes.toString)
    assert(merged.allNodeTypes != bcast.allNodeTypes,
      "steering must change the operator tree the model sees")
    // wrapper nodes dissolved — the model sees operator shape only
    for (t <- Seq(merged, bcast); bad <- Seq("WholeStageCodegen", "InputAdapter", "AdaptiveSparkPlan"))
      assert(countType(t, bad) == 0, s"wrapper $bad leaked into the plan tree")
    // numerics present and sane (log1p-able)
    def walk(t: PlanNode): Unit = {
      assert(t.totalCost >= 0.0 && t.planRows >= 0.0 && t.planWidth >= 0.0)
      t.children.foreach(walk)
    }
    walk(merged); walk(bcast)
    // the reference binarizer + tcnn indexing consume the live tree
    val idx = PlanTrees.tcnnIndexes(merged)
    assert(idx.length % 3 == 0 && idx.length >= 6)
  }

  test("TCNN steering beats matrix-only steering at equal budget on the live config space") {
    val configs = SteeringLoop.defaultConfigs // default/broadcast/merge/shuffle_hash/no_broadcast
    val names = queries.map(_._1)
    val plans = LearnedSteering.planSpace(spark, queries, configs)
    val nQ = names.length
    val nC = configs.length

    // deterministic cost oracle derived from the REAL live plan trees: a
    // weighted operator count, with broadcast builds made expensive for
    // the odd queries (the classic mis-broadcast: a "small" side that
    // isn't). The signal is fully present in (plan tree, query id) — the
    // TCNN's exact input — while the matrix model sees only positions.
    def planCost(q: Int, t: PlanNode): Double = {
      val bWeight = if (q % 2 == 0) 0.15 else 1.5
      0.1 + 0.35 * countType(t, "SortMergeJoin") + 0.30 * countType(t, "ShuffledHashJoin") +
        bWeight * countType(t, "BroadcastHashJoin") +
        0.25 * countType(t, "Sort") + 0.15 * countType(t, "ShuffleExchange")
    }
    val cost = Array.tabulate(nQ, nC)((q, c) => planCost(q, plans(q)(c)))
    val perfect = (0 until nQ).map(q => cost(q).min).sum
    val defaultSum = (0 until nQ).map(q => cost(q)(0)).sum
    assert(defaultSum > perfect + 0.5,
      s"construction must leave steering headroom (default $defaultSum vs perfect $perfect)")

    def frontier(res: SteeringLoop.SteeringResult): Double =
      (0 until nQ).map { q =>
        res.observations.filter(o => o.query == q && !o.censored)
          .map(_.seconds).min
      }.sum

    val seeds = Seq(7L, 21L, 42L)
    val results = seeds.map { seed =>
      val exec = (q: Int, c: Int, _: Double) => SteeringLoop.Completed(cost(q)(c))
      val als = SteeringLoop.runCensored(names, configs.map(_.name), exec,
        batch = 3, rounds = 4, seed = seed,
        alpha = Double.PositiveInfinity, beta = Double.PositiveInfinity)
      val tcnn = LearnedSteering.runLearned(names, configs.map(_.name), plans, exec,
        batch = 3, rounds = 4, seed = seed,
        alpha = Double.PositiveInfinity, beta = Double.PositiveInfinity)
      // equal exploration budget, enforced not assumed
      assert(als.observations.length == tcnn.observations.length,
        s"budgets diverged: als=${als.observations.length} tcnn=${tcnn.observations.length}")
      (frontier(als), frontier(tcnn))
    }
    val alsTotal = results.map(_._1).sum
    val tcnnTotal = results.map(_._2).sum
    info(f"frontiers per seed (als vs tcnn): ${results.map { case (a, t) => f"$a%.2f/$t%.2f" }.mkString(", ")}")
    info(f"perfect=$perfect%.2f default=$defaultSum%.2f")
    assert(tcnnTotal < alsTotal,
      f"learned steering must reach a lower frontier: tcnn=$tcnnTotal%.3f vs als=$alsTotal%.3f")
    // and it never does WORSE than the matrix on any seed beyond noise
    results.foreach { case (a, t) =>
      assert(t <= a + 1e-9, f"tcnn frontier $t%.3f worse than als $a%.3f on a seed")
    }
  }

  test("steerLearned records both trace artifacts; reference trace is report-readable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-learned-steer")
    val steerPath = dir.resolve("learned.json")
    val refPath = dir.resolve("learned_trace.json")
    val qs = queries.take(3)
    val res = LearnedSteering.steerLearned(spark, qs,
      configs = SteeringLoop.defaultConfigs.take(3),
      batch = 2, rounds = 2,
      tracePath = Some(steerPath), referenceTracePath = Some(refPath))
    assert(res.observations.nonEmpty && res.recommendations.length == qs.length)

    // the steering trace round-trips (the warm-start artifact)
    val (qn, cn, loaded) = SteeringLoop.loadTrace(steerPath)
    assert(qn == qs.map(_._1) && cn == SteeringLoop.defaultConfigs.take(3).map(_.name))
    assert(loaded.observations == res.observations)

    // the reference-layout trace feeds the SAME report pipeline as the
    // offline strategies, with monotone non-increasing total latency
    val rows = graft.report.Report.loadTraces(spark, refPath.toString)
      .select("round", "total_latency").collect().sortBy(_.getInt(0))
    assert(rows.nonEmpty)
    rows.map(_.getDouble(1)).sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, s"total latency rose: $a -> $b")
      case _ =>
    }
  }
}
