package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** This engine's OWN physical plans in the reference's [[PlanNode]] data
  * model — the bridge that closes the north-star loop: the reference
  * trains its Tree-CNN on PostgreSQL EXPLAIN trees
  * (`/root/reference/src/data/dataset.py:50-186`); here the SAME model
  * consumes Catalyst's executed plans, so LimeQO+ can steer the engine it
  * runs inside instead of a recorded workload.
  *
  * Mapping (public Spark APIs only):
  *  - `nodeType`   ← `SparkPlan.nodeName` (the class name minus `Exec` —
  *    "BroadcastHashJoin", "SortMergeJoin", "FileSourceScan", ... — the
  *    exact vocabulary the steering decision changes);
  *  - `totalCost`  ← the linked logical node's `stats.sizeInBytes`
  *    (Catalyst's own cost driver; physical nodes carry no cost, but
  *    every one links back to the logical node it implements);
  *  - `planRows`   ← `stats.rowCount` when CBO has one, else
  *    sizeInBytes / rowWidth;
  *  - `planWidth`  ← the node's output schema default byte size.
  *
  * Wrapper nodes that carry no plan semantics (WholeStageCodegen,
  * InputAdapter) are dissolved so the tree the model sees is the
  * OPERATOR shape, stable across codegen-fusion differences. An
  * AdaptiveSparkPlanExec contributes its current physical plan — before
  * execution that is the AQE initial plan, which is exactly what a
  * predict-before-run model can know (documented approximation: AQE may
  * re-plan mid-flight; the observation the loop records is still the
  * true executed time).
  *
  * Arity: the reference's binarizer errors past two children
  * (`dataset.py:148-165`); Spark allows n-ary nodes (Union, expand
  * shapes), so n > 2 children fold right-associatively under carrier
  * nodes of the same nodeType before handoff — the tree convolution sees
  * the same operator multiset, in a deterministic shape.
  */
object SparkPlanTrees {

  def toPlanNode(plan: SparkPlan): PlanNode = plan match {
    case a: AdaptiveSparkPlanExec => toPlanNode(a.executedPlan)
    case w: WholeStageCodegenExec => toPlanNode(w.child)
    case i: InputAdapter => toPlanNode(i.child)
    case p =>
      val width = p.output.map(_.dataType.defaultSize).sum.toDouble
      val stats = p.logicalLink.map(_.stats)
      val size = stats.map(_.sizeInBytes.toDouble).getOrElse(0.0)
      val rows = stats.flatMap(_.rowCount).map(_.toDouble)
        .getOrElse(if (width > 0) size / width else 0.0)
      val kids = p.children.map(toPlanNode).toList
      val folded = kids match {
        case Nil => Nil
        case one :: Nil => List(one)
        case l :: r :: Nil => List(l, r)
        case many => List(many.head,
          many.tail.reduceRight((a, b) => PlanNode(p.nodeName, 0.0, 0.0, 0.0, List(a, b))))
      }
      PlanNode(p.nodeName, size, rows, width, folded)
  }

  /** Featurize a query WITHOUT running it: `executedPlan` plans (and with
    * AQE wraps) the query but launches no job. */
  def ofQuery(df: DataFrame): PlanNode = toPlanNode(df.queryExecution.executedPlan)
}
