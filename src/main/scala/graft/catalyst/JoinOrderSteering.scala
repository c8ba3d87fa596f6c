package graft.catalyst

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** The join-ORDER steering dimension (BASELINE.json's north star names
  * join ordering explicitly; the strategy dimension alone —
  * [[HintSteeringRule]] — spans HOW each join executes but not WHICH
  * shape the join tree takes).
  *
  * `spark.graft.steering.joinorder` holds a permutation ("2,0,1,3") of
  * the CANONICALLY-SORTED leaves of the query's inner-join chain; the
  * rule re-flattens the chain and rebuilds it left-deep in that order.
  * Each permutation is one more hint-set column of the LimeQO workload
  * matrix — the Spark analogue of the reference steering PostgreSQL's
  * join order through `enable_*`/`Leading` hint sets
  * (`/root/reference/README.md:10-12`) — and the censored loop learns
  * which order wins per query exactly as it learns strategies.
  *
  * Why a PRE-CBO rule (`injectPreCBORule`), not an operator-optimization
  * rule like [[HintSteeringRule]]: the operator batch runs to FIXPOINT,
  * and a tree-rewriting rule there must prove convergence against every
  * other rule in the batch (Spark's own ReorderJoin included); the
  * Pre-CBO batch runs ONCE, after the operator fixpoint has settled and
  * before physical planning reads the tree. Running after the operator
  * batch also means [[HintSteeringRule]] has already stamped the
  * session's strategy hint on every join — the flattener therefore
  * accepts exactly that uniform hint (or none) and re-applies it to the
  * rebuilt joins, so the two dimensions compose: a `merge+jo_2013` cell
  * yields the permuted tree with sort-merge forced on every join.
  *
  * Safety contract (each clause falls back to the untouched plan, so a
  * non-viable permutation column degenerates to the default plan rather
  * than a broken one):
  *  - only Inner joins flatten (outer/semi/cross orders are not
  *    interchangeable);
  *  - manual per-join hints (`broadcast(df)`) mark the chain boundary —
  *    the user's hint stays on the user's join;
  *  - a permutation is applied only where the chain's leaf count equals
  *    its length;
  *  - an order that would force a condition-less intermediate join (a
  *    cartesian blow-up at 100 TB) is rejected outright — the loop
  *    explores plan SHAPES, never semantics-preserving disasters;
  *  - the rebuilt subtree is wrapped in a Project restoring the original
  *    positional output when the leaf order changed (downstream
  *    operators bind by exprId, but the root schema's column order is
  *    part of the query contract).
  *
  * Canonical leaf order (sort by `canonicalized.toString`, exprIds
  * normalized) makes a permutation name mean the same tree regardless of
  * the order Catalyst's own heuristics happened to leave the leaves in —
  * the column named `jo_2013` is the same plan on every run of every
  * session, which is what lets [[Steered]] replay a learned order cold.
  */
object JoinOrderSteeringRule extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.steering.joinorder"

  /** "2,0,1,3" → Some(Seq(2,0,1,3)) iff it is a permutation of 0..n-1. */
  private[catalyst] def parse(spec: String): Option[Seq[Int]] = {
    val parts = spec.split(",", -1).toSeq.map(_.trim)
    if (parts.exists(p => p.isEmpty || !p.forall(_.isDigit))) None
    else Some(parts.map(_.toInt)).filter(_.sorted == parts.indices)
  }

  /** Flatten a maximal Inner-join chain whose hints `accept`; returns the
    * leaves left-to-right plus every split join conjunct. Attribute-only
    * Projects (the pruning projections ColumnPruning has inserted between
    * the joins by pre-CBO time) are transparent: dropping them is
    * semantics-free (operators bind by exprId) and [[reorder]] re-prunes
    * the rebuilt tree so no dead column rides a shuffle. */
  private def flatten(plan: LogicalPlan, accept: JoinHint => Boolean)
      : (Seq[LogicalPlan], Seq[Expression]) = plan match {
    case Join(l, r, Inner, cond, hint) if accept(hint) =>
      val (ll, lc) = flatten(l, accept)
      val (rl, rc) = flatten(r, accept)
      (ll ++ rl, lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[Attribute]) =>
      flatten(child, accept)
    case other => (Seq(other), Nil)
  }

  /** Left-deep rebuild in permuted canonical order; every condition
    * attaches at the first join where its references are bound, and the
    * tree is re-pruned as it grows (per-leaf and after every join — the
    * manual equivalent of the ColumnPruning pass that will not run
    * again): an attribute survives only while the final output or an
    * unplaced condition still needs it. None when the order is non-viable
    * (cartesian step / unbindable condition) or a no-op. */
  private def reorder(orig: Join, leaves: Seq[LogicalPlan], conds: Seq[Expression],
                      perm: Seq[Int], hint: JoinHint): Option[LogicalPlan] = {
    val finalNeeded = orig.outputSet
    val condRefs = AttributeSet(conds.flatMap(_.references))
    def pruneLeaf(p: LogicalPlan): LogicalPlan = {
      val keep = p.output.filter(a => finalNeeded.contains(a) || condRefs.contains(a))
      if (keep.length == p.output.length) p else Project(keep, p)
    }
    val ordered = perm.map(leaves.sortBy(_.canonicalized.toString)).map(pruneLeaf)
    var joined: LogicalPlan = ordered.head
    var remaining = conds
    var viable = true
    ordered.tail.foreach { next =>
      if (viable) {
        val bound = joined.outputSet ++ next.outputSet
        val (applicable, rest) = remaining.partition(_.references.subsetOf(bound))
        if (applicable.isEmpty) viable = false // condition-less join: cartesian
        else {
          var j: LogicalPlan = Join(joined, next, Inner,
            applicable.sortBy(_.canonicalized.toString).reduceLeftOption(And), hint)
          remaining = rest
          val keep = j.output.filter(a =>
            finalNeeded.contains(a) || remaining.exists(_.references.contains(a)))
          if (keep.length < j.output.length) j = Project(keep, j)
          joined = j
        }
      }
    }
    if (!viable || remaining.nonEmpty) None
    else {
      val out = if (joined.output == orig.output) joined
                else Project(orig.output, joined)
      Option.when(!out.fastEquals(orig))(out)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spec = conf.getConfString(ConfKey, "")
    if (spec.isEmpty) return plan
    parse(spec) match {
      case None => plan
      case Some(perm) =>
        // compose with the strategy dimension: accept the uniform hint the
        // already-ran HintSteeringRule stamped (or none), re-stamp rebuilt
        // joins with it; any OTHER hint is a manual user hint = boundary
        val steerHint = HintSteeringRule.hintFor(
          conf.getConfString(HintSteeringRule.ConfKey, ""))
        val accept = (h: JoinHint) => h == JoinHint.NONE || steerHint.contains(h)
        plan.transformDown {
          case j @ Join(_, _, Inner, _, hint) if accept(hint) =>
            val (leaves, conds) = flatten(j, accept)
            if (leaves.length != perm.length) j
            else reorder(j, leaves, conds, perm,
              steerHint.getOrElse(JoinHint.NONE)).getOrElse(j)
        }
    }
  }
}
