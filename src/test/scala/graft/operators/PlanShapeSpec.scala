package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Physical-plan shape assertions — the "would this survive a 100× scale-
  * up" checks (builder prompt): filters and projections must reach the
  * parquet scan, small dims must broadcast, and count() must not be the
  * only thing keeping a plan cheap.
  */
class PlanShapeSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed to the parquet scan") {
    val plan = physicalPlan(Relational.q01PricingSummary(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$plan")
  }

  test("q01: scan reads only the referenced columns") {
    val plan = physicalPlan(Relational.q01PricingSummary(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_tax"),
      s"column pruning failed: $readSchema")
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_returnflag"))
  }

  test("q03: nation and region joins are broadcast, never shuffled") {
    val plan = physicalPlan(Relational.q03BroadcastJoin(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q02: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = physicalPlan(Relational.q02TopRevenue(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort for top-10:\n$plan")
  }

  test("q04: semi join stays a semi join (no row explosion)") {
    val plan = physicalPlan(Relational.q04SemiJoin(spark, sf))
    assert(plan.contains("LeftSemi"), s"semi join lost:\n$plan")
  }

  test("aggregations use partial (map-side) aggregation") {
    val plan = physicalPlan(Relational.q06RowMinSum(spark, sf))
    // HashAggregate appears twice per level: partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
  }

  test("q48: all four window functions evaluate in one Window operator") {
    val plan = physicalPlan(PipelineOps.q48WindowSuite(spark, sf))
    // lag/lead/ntile/percent_rank share a window spec → ONE WindowExec
    // (a second would mean a second sort or shuffle of the fact table)
    assert("(?m)^(?!.*Sort).*Window\\b".r.findAllIn(plan).size == 1,
      s"window functions split across operators:\n$plan")
  }

  test("q49: decontamination probe has no join and no agg exchange") {
    val plan = physicalPlan(DedupOps.q49Decontaminate(spark, sf))
    assert(!plan.contains("Join"), s"probe joins instead of broadcast set:\n$plan")
    // only exchanges: the parallelize repartition + the output sort
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"unexpected shuffles ($exchanges):\n$plan")
  }

  test("q54: EXISTS/NOT EXISTS decorrelate to existence hash joins") {
    val plan = physicalPlan(PipelineOps.q54ExistsSubquery(spark, sf))
    // EXISTS under a projection decorrelates to ExistenceJoin (a hash join
    // emitting an exists flag) — the point is that NO per-row subquery
    // survives; both subqueries become joins
    assert("ExistenceJoin".r.findAllIn(plan).size == 2,
      s"correlated subqueries not decorrelated to joins:\n$plan")
    assert(!plan.toLowerCase.contains("subqueryexec"),
      s"per-row subquery survived:\n$plan")
  }

  test("q55: array lambdas run on the unexploded array (no Generate)") {
    val plan = physicalPlan(PipelineOps.q55ArrayFuncs(spark, sf))
    assert(!plan.contains("Generate"), s"array ops exploded:\n$plan")
    // one narrow pass: no exchange before the output sort
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"unexpected aggregation shuffle:\n$plan")
  }

  test("q52: histogram aggregates map-side before the 10-key exchange") {
    val plan = physicalPlan(PipelineOps.q52TokenHistogram(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
  }

  test("whole-stage codegen covers the scan→filter→project pipeline") {
    // AQE's executedPlan string hides codegen until execution — inspect the
    // codegen explain mode instead
    val df = Relational.q16ScalarFuncs(spark, sf)
    val codegen = df.queryExecution
      .explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen subtree"), s"no codegen span:\n${codegen.take(2000)}")
  }
}
