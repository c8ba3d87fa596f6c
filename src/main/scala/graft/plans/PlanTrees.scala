package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** PostgreSQL EXPLAIN (FORMAT JSON) plan trees — the reference's plan data
  * model (`/root/reference/src/data/dataset.py:50-186`, FIXTURES.md §3).
  *
  * The tree is recursive, which Spark cannot express as a static
  * StructType (SURVEY §7.4): plans travel as JSON strings in DataFrames
  * and parse into [[PlanNode]] at the typed boundary (jackson — already on
  * the Spark classpath).
  */
final case class PlanNode(
    nodeType: String,
    totalCost: Double,
    planRows: Double,
    planWidth: Double,
    children: List[PlanNode]) {

  def allNodeTypes: Set[String] =
    children.foldLeft(Set(nodeType))((acc, c) => acc ++ c.allNodeTypes)

  def size: Int = 1 + children.map(_.size).sum
}

/** One plan file: query id, the hint ids sharing this physical plan,
  * repeated runtime measurements (label = median), and the tree. */
final case class PlanRecord(
    filename: String,
    hintList: List[Int],
    runtimeList: List[Double],
    tree: PlanNode)

object PlanTrees {
  val Dummy = "Dummy"
  private val mapper = new ObjectMapper()

  private def nodeFromJson(n: JsonNode): PlanNode = PlanNode(
    nodeType = n.path("Node Type").asText(),
    totalCost = n.path("Total Cost").asDouble(0.0),
    planRows = n.path("Plan Rows").asDouble(0.0),
    planWidth = n.path("Plan Width").asDouble(0.0),
    children =
      if (n.has("Plans")) n.get("Plans").elements().asScala.map(nodeFromJson).toList
      else Nil)

  /** Parse one plan-file JSON (the `{"filename":…, "hint_list":…,
    * "runtime_list":…, "plan":[[[{"Plan":…}]]]}` wrapper,
    * `dataset.py:50-58`). */
  def parseRecord(json: String): PlanRecord = {
    val root = mapper.readTree(json)
    val tree = nodeFromJson(root.get("plan").get(0).get(0).get(0).get("Plan"))
    PlanRecord(
      filename = root.path("filename").asText(),
      hintList = root.get("hint_list").elements().asScala.map(_.asInt()).toList,
      runtimeList = root.get("runtime_list").elements().asScala.map(_.asDouble()).toList,
      tree = tree)
  }

  /** Parse a bare plan-tree JSON (`{"Node Type": …}`). */
  def parseTree(json: String): PlanNode = nodeFromJson(mapper.readTree(json))

  /** Binarize: leaves get two Dummy children, 1-child nodes a Dummy right
    * sibling; >2 children is an error (`dataset.py:148-165`). */
  def binarize(tree: PlanNode): PlanNode = tree.children match {
    case Nil =>
      if (tree.nodeType == Dummy) tree
      else tree.copy(children = List(dummyNode, dummyNode))
    case List(only) => tree.copy(children = List(binarize(only), dummyNode))
    case List(l, r) => tree.copy(children = List(binarize(l), binarize(r)))
    case cs => throw new IllegalArgumentException(s"Tree with ${cs.length} children")
  }

  val dummyNode: PlanNode = PlanNode(Dummy, 0.0, 0.0, 0.0, Nil)

  /** Preorder "tcnn index" per node: dummies are 0, real nodes numbered
    * 1..n in preorder (`dataset.py:167-180`). Returns the flattened
    * preorder list of (node, index) for real nodes. */
  def preorderIndex(tree: PlanNode): List[(PlanNode, Int)] = {
    def walk(t: PlanNode, next: Int): (List[(PlanNode, Int)], Int) =
      if (t.nodeType == Dummy) (Nil, next)
      else {
        val self = (t, next)
        t.children match {
          case List(l, r) =>
            val (ls, n1) = walk(l, next + 1)
            val (rs, n2) = walk(r, n1)
            (self :: ls ::: rs, n2)
          case Nil => (List(self), next + 1)
          case other => throw new IllegalStateException(s"binarize first: ${other.length} children")
        }
      }
    walk(tree, 1)._1
  }

  /** The TCNN gather indexes: for each real node in preorder, the triple
    * (self, left, right) of tcnn indexes (dummy = 0), prefixed by the dummy
    * triple (0,0,0) — the reference's `get_plan_data` (`dataset.py`).
    * Computed in one counter-carrying walk (no node-identity maps: case
    * classes compare structurally and identical subtrees would collide). */
  def tcnnIndexes(tree: PlanNode): Array[Int] = {
    def walk(t: PlanNode, next: Int): (Int, List[Int], Int) =
      if (t.nodeType == Dummy) (0, Nil, next)
      else {
        val self = next
        val List(l, r) = t.children
        val (li, lt, n1) = walk(l, next + 1)
        val (ri, rt, n2) = walk(r, n1)
        (self, List(self, li, ri) ::: lt ::: rt, n2)
      }
    val (_, triples, _) = walk(binarizedOf(tree), 1)
    (List(0, 0, 0) ::: triples).toArray
  }

  private def binarizedOf(t: PlanNode): PlanNode = if (isBinary(t)) t else binarize(t)
  // a bare (non-Dummy) leaf is NOT binary: it still needs Dummy children
  // added by binarize
  private def isBinary(t: PlanNode): Boolean =
    t.nodeType == Dummy ||
      (t.children.length == 2 && t.children.forall(isBinary))

  /** Per-node raw feature vector: one-hot(node type over vocab) ++
    * [totalCost, planRows, planWidth] (`dataset.py:100-112`). */
  def nodeFeatures(n: PlanNode, vocab: Map[String, Int]): Array[Double] = {
    val f = new Array[Double](vocab.size + 3)
    f(vocab(n.nodeType)) = 1.0
    f(vocab.size) = n.totalCost
    f(vocab.size + 1) = n.planRows
    f(vocab.size + 2) = n.planWidth
    f
  }

  /** Preorder features of the real nodes of the binarized tree, prefixed by
    * the dummy vector — row i aligns with tcnn index i. */
  def planFeatures(tree: PlanNode, vocab: Map[String, Int]): Array[Array[Double]] = {
    val bin = binarizedOf(tree)
    val dummyVec = {
      val f = new Array[Double](vocab.size + 3)
      f(vocab(Dummy)) = 1.0
      f
    }
    (dummyVec :: preorderIndex(bin).map { case (n, _) => nodeFeatures(n, vocab) }).toArray
  }

  /** Operator vocabulary: sorted distinct node types across plans plus
    * Dummy (`dataset.py:83-88`). */
  def vocabulary(plans: Seq[PlanRecord]): Map[String, Int] = {
    val ops = plans.foldLeft(Set(Dummy))((acc, p) => acc ++ p.tree.allNodeTypes)
    ops.toSeq.sorted.zipWithIndex.toMap
  }
}
