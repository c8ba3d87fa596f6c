package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** The two-level coarse quantizer ([[ProductQuantization.trainSuper]] /
  * [[ProductQuantization.probeExprHier]]) — the scale answer to the flat
  * O(nList)-per-vector scan at adaptive nList ∝ N. Pins the contract that
  * makes it safe to deploy: at full super-fan-out the hierarchy is
  * BIT-IDENTICAL to the flat probe (pure pruning, same tie rules), below
  * it recall degrades gracefully while the scanned-candidate count drops
  * by ~nSuperProbe/nSuper.
  */
class HierarchicalIvfSpec extends AnyFunSuite with SharedSpark {

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")

  test("exhaustive super-probe reduces bit-for-bit to the flat probeExpr") {
    val cents = SemanticDedup.refinedCentroids(emb, 16)
    val (sup, c2s) = ProductQuantization.trainSuper(cents, nSuper = 4)
    assert(c2s.length == 16 && c2s.forall(s => s >= 0 && s < 4))
    for (nProbe <- Seq(1, 2, 5)) {
      val flat = ProductQuantization.probeExpr(spark, cents, nProbe)
      val hier = ProductQuantization
        .probeExprHier(spark, cents, sup, c2s, nProbe, nSuperProbe = 4)
      val rows = emb.select(col("vec_id"),
        flat(col("embedding")).as("f"), hier(col("embedding")).as("h"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"nProbe=$nProbe vec ${r.getLong(0)}: flat=${r.getSeq[Int](1)} hier=${r.getSeq[Int](2)}")
      }
    }
  }

  test("pruned super-probe keeps high top-1 agreement at a fraction of the scan") {
    val cents = SemanticDedup.refinedCentroids(emb, 16)
    val (sup, c2s) = ProductQuantization.trainSuper(cents, nSuper = 4)
    val flat = ProductQuantization.probeExpr(spark, cents, 1)
    val hier = ProductQuantization.probeExprHier(spark, cents, sup, c2s, 1, 2)
    val rows = emb.select(flat(col("embedding")).as("f"),
      hier(col("embedding")).as("h")).collect()
    val agree = rows.count(r => r.getSeq[Int](0) == r.getSeq[Int](1))
    info(s"top-1 cell agreement at nSuperProbe=2/4: $agree/${rows.length}")
    // the nearest cell's super is among the 2 nearest supers for the
    // overwhelming majority of vectors on a real manifold
    assert(agree >= (rows.length * 0.9).toInt, s"$agree of ${rows.length}")
    // candidate accounting: 2 of 4 supers ⇒ at most ~everything minus the
    // smallest super; on balanced supers ≈ half the cells scanned
    val members = c2s.zipWithIndex.groupBy(_._1).view.mapValues(_.length).toMap
    val worstScan = members.values.toSeq.sorted.takeRight(2).sum
    info(s"super sizes ${members.toSeq.sortBy(_._1)}; worst 2-super scan $worstScan of 16 cells")
    assert(worstScan < 16, "pruning must scan strictly fewer cells than flat")
  }

  test("trainSuper is deterministic and tolerates nSuper edge values") {
    val cents = SemanticDedup.refinedCentroids(emb, 16)
    val a = ProductQuantization.trainSuper(cents, 4)
    val b = ProductQuantization.trainSuper(cents, 4)
    assert(a._2.toSeq == b._2.toSeq)
    assert(a._1.map(_.toSeq).toSeq == b._1.map(_.toSeq).toSeq)
    // nSuper = 1: one super holds everything; hier == flat trivially
    val (s1, m1) = ProductQuantization.trainSuper(cents, 1)
    assert(s1.length == 1 && m1.forall(_ == 0))
    // nSuper = nList: every cell its own super (seeds are the cells)
    val (sN, mN) = ProductQuantization.trainSuper(cents, 16)
    assert(sN.length == 16 && mN.distinct.length == 16)
  }
}
