package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Plan-tree parse / binarize / index edge cases (`dataset.py:144-186`,
  * FIXTURES.md §3): leaf, 1-child chain, 2-child, >2-child error, and the
  * preorder tcnn indexing with dummy = 0. */
class PlanTreesSpec extends AnyFunSuite {

  private val leaf = """{"Node Type": "Seq Scan", "Total Cost": 10.0, "Plan Rows": 100, "Plan Width": 8}"""
  private val chain =
    """{"Node Type": "Limit", "Total Cost": 30.0, "Plan Rows": 10, "Plan Width": 8,
      | "Plans": [{"Node Type": "Sort", "Total Cost": 25.0, "Plan Rows": 100, "Plan Width": 8,
      |   "Plans": [{"Node Type": "Seq Scan", "Total Cost": 10.0, "Plan Rows": 100, "Plan Width": 8}]}]}""".stripMargin
  private val join =
    """{"Node Type": "Hash Join", "Total Cost": 50.0, "Plan Rows": 20, "Plan Width": 16,
      | "Plans": [
      |   {"Node Type": "Seq Scan", "Total Cost": 10.0, "Plan Rows": 100, "Plan Width": 8},
      |   {"Node Type": "Hash", "Total Cost": 12.0, "Plan Rows": 50, "Plan Width": 8,
      |    "Plans": [{"Node Type": "Index Scan", "Total Cost": 11.0, "Plan Rows": 50, "Plan Width": 8}]}]}""".stripMargin

  test("parse + binarize: leaf gets two dummies, chain gets dummy sibling") {
    val t = PlanTrees.binarize(PlanTrees.parseTree(leaf))
    assert(t.children.map(_.nodeType) == List("Dummy", "Dummy"))
    val c = PlanTrees.binarize(PlanTrees.parseTree(chain))
    assert(c.children.map(_.nodeType) == List("Sort", "Dummy"))
    assert(c.children.head.children.map(_.nodeType) == List("Seq Scan", "Dummy"))
  }

  test(">2 children raises (dataset.py:165 ValueError)") {
    val bad = PlanNode("Append", 1, 1, 1,
      List(PlanTrees.dummyNode, PlanTrees.dummyNode, PlanTrees.dummyNode)
        .map(_.copy(nodeType = "Seq Scan")))
    assertThrows[IllegalArgumentException](PlanTrees.binarize(bad))
  }

  test("tcnn indexes: preorder with dummy triple prefix and dummy = 0") {
    // join tree binarized:
    //   HashJoin(1) -> SeqScan(2)[D,D], Hash(3) -> IndexScan(4)[D,D], D
    val idx = PlanTrees.tcnnIndexes(PlanTrees.parseTree(join))
    assert(idx.take(3).sameElements(Array(0, 0, 0)))
    assert(idx.drop(3).sameElements(Array(
      1, 2, 3,   // HashJoin, children SeqScan(2), Hash(3)
      2, 0, 0,   // SeqScan, dummy children
      3, 4, 0,   // Hash, child IndexScan(4), dummy sibling
      4, 0, 0))) // IndexScan
  }

  test("identical sibling subtrees get distinct indexes") {
    val t = PlanNode("Merge Join", 9, 9, 9, List(
      PlanNode("Seq Scan", 1, 1, 1, Nil), PlanNode("Seq Scan", 1, 1, 1, Nil)))
    val idx = PlanTrees.tcnnIndexes(t)
    assert(idx.drop(3).sameElements(Array(1, 2, 3, 2, 0, 0, 3, 0, 0)))
  }

  test("featurizer: one-hot + scaled cost features, invertible label") {
    val recs = Seq(
      PlanRecord("q1", List(0, 3), List(2.0, 4.0, 3.0), PlanTrees.parseTree(join)),
      PlanRecord("q2", List(1), List(10.0), PlanTrees.parseTree(chain)))
    val fz = PlanFeaturizer.fit(recs)
    // vocab: sorted ops + Dummy
    assert(fz.vocab.keySet == Set("Dummy", "Hash Join", "Seq Scan", "Hash",
      "Index Scan", "Limit", "Sort"))
    val feats = fz.transformFeatures(recs.head.tree)
    assert(feats.length == 5) // dummy + 4 real nodes
    assert(feats.forall(_.length == fz.numFeatures))
    assert(feats.flatten.forall(v => v >= -1e-12 && v <= 1 + 1e-12))
    // dummy row one-hot position
    assert(feats(0)(fz.vocab("Dummy")) > 0.0)
    // label: median of (2,3,4)=3 → transform/inverse round-trips
    val y = fz.transformLabel(recs.head.runtimeList)
    assert(math.abs(fz.inverseLabel(y) - 3.0) < 1e-9)
  }

  test("full record parse (plan[0][0][0] nesting)") {
    val rec = PlanTrees.parseRecord(
      s"""{"filename": "abc123", "hint_list": [0, 7], "runtime_list": [1.5, 2.5],
         | "plan": [[[{"Plan": $join}]]]}""".stripMargin)
    assert(rec.filename == "abc123")
    assert(rec.hintList == List(0, 7))
    assert(rec.tree.nodeType == "Hash Join")
    assert(rec.tree.size == 4)
  }
}
