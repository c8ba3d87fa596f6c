package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Semantics of SemDeDup (q102): the within-cell drop rule verified
  * against an independent brute-force evaluation of the SAME rule over
  * the operator's own (cell, rk) assignment, the keep-most-central
  * invariant, determinism across runs, and non-degeneracy on the real
  * sf0.001 table. Learned centroids aren't SQL-portable, so this spec IS
  * the correctness evidence (rows-only in the driver gate).
  */
class SemanticDedupSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // two well-separated blobs with exact dups and near-dups inside each
  private def blob(base: Array[Float], jitter: Float, id: Long) =
    (id, base.zipWithIndex.map { case (v, i) => v + (if (i == 0) jitter else 0f) }, 0)
  private val e1 = Array(10f, 0f, 0f, 1f)
  private val e2 = Array(0f, 10f, 0f, 1f)
  private val vecs = Seq(
    blob(e1, 0f, 1L), blob(e1, 0f, 2L),      // exact dup pair
    blob(e1, 0.05f, 3L),                      // near dup
    blob(e1, 8f, 4L),                         // same halfspace, far
    blob(e2, 0f, 11L), blob(e2, 0.02f, 12L),  // near-dup pair
    blob(e2, 9f, 13L), blob(e2, -3f, 14L))
  private def embDF = vecs.toDF("vec_id", "embedding", "label")

  test("drop rule: brute-force within-cell evaluation agrees exactly") {
    val tau = 0.995
    val out = SemanticDedup.verdicts(embDF, nList = 2, tau = tau).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    val byId = vecs.map(v => v._1 -> v._2).toMap
    val byCell = out.groupBy(_._2)
    out.foreach { case (id, cell, rk, dropped) =>
      val mates = byCell(cell).filter(_._3 < rk)
      val expected = mates.exists(m => cos(byId(m._1), byId(id)) >= tau)
      assert(dropped == expected,
        s"vec $id cell $cell rk $rk: dropped=$dropped, brute-force=$expected")
    }
    // the construction has dups in both blobs: something must drop, and
    // something must survive, in every cell
    byCell.values.foreach { cell =>
      assert(cell.exists(_._4) && cell.exists(!_._4))
    }
  }

  test("rank 1 (most central) is never dropped; ranks are contiguous per cell") {
    val out = SemanticDedup.verdicts(embDF, nList = 2, tau = 0.9).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    out.groupBy(_._2).values.foreach { cell =>
      val ranks = cell.map(_._3).sorted.toList
      assert(ranks == (1 to cell.length).toList)
      assert(!cell.find(_._3 == 1).get._4, "the cell medoid must survive")
    }
  }

  test("deterministic across runs") {
    val a = SemanticDedup.verdicts(embDF, nList = 2, tau = 0.99).collect()
      .map(_.toSeq).sortBy(_.toString)
    val b = SemanticDedup.verdicts(embDF, nList = 2, tau = 0.99).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  // --- cross-cell escape hatch (round-11 verdict task 2) ---

  // boundary-straddling corpus: two centroids 23° apart; each planted
  // near-dup pair sits on the bisector with one member quantizing to each
  // cell (cos(a,b) ≈ 0.997 ≥ τ), plus per-cell fillers that are NOT
  // near-dups of the planted members (cos ≈ 0.987 < τ = 0.99)
  private val xCents = Array(Array(1f, 0f, 0f, 0f), Array(0.92f, 0.39f, 0f, 0f))
  private def unit(x: Double, y: Double) = {
    val n = math.sqrt(x * x + y * y)
    Array((x / n).toFloat, (y / n).toFloat, 0f, 0f)
  }
  private val xVecs = Seq(
    1L -> unit(0.985, 0.170), // planted pair member, cell 0 side
    2L -> unit(0.970, 0.240), // planted pair member, cell 1 side
    3L -> unit(1.0, 0.010),   // cell-0 filler (near centroid)
    4L -> unit(1.0, -0.020),  // cell-0 filler
    5L -> unit(0.92, 0.400),  // cell-1 filler
    6L -> unit(0.91, 0.380))  // cell-1 filler
  private def xDF = xVecs.toDF("vec_id", "embedding")
  private val xTau = 0.99

  /** Independent brute-force evaluation of the multi-probe drop rule with
    * the cell scope REMOVED: v drops iff any u with globally higher
    * (round(csim,6), -vec_id) priority has cos(u,v) ≥ τ. */
  private def bruteDropped(vecs: Seq[(Long, Array[Float])],
                           cents: Array[Array[Float]], tau: Double): Set[Long] = {
    def cell(v: Array[Float]): Int =
      cents.indices.minBy(c => (cents(c).zip(v).map { case (a, b) =>
        (a.toDouble - b) * (a.toDouble - b) }.sum, c))
    val prio = vecs.map { case (id, v) =>
      id -> math.rint(cos(v, cents(cell(v))) * 1e6) / 1e6 }.toMap
    val byId = vecs.toMap
    vecs.collect { case (vid, vv) if vecs.exists { case (uid, uv) =>
      (prio(uid) > prio(vid) || (prio(uid) == prio(vid) && uid < vid)) &&
        cos(uv, vv) >= tau } => vid }.toSet
  }

  private def droppedSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.filter(col("dropped")).select("vec_id").collect().map(_.getLong(0)).toSet

  test("multi-probe at nProbe=1 reduces exactly to the single-probe verdicts") {
    for ((corpus, cents, tau) <- Seq(
        (xDF, xCents, xTau),
        (embDF.select("vec_id", "embedding"),
          ProductQuantization.trainCoarse(embDF, 2), 0.99))) {
      val single = SemanticDedup.verdictsWithCents(corpus, cents, tau)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val multi1 = SemanticDedup.verdictsMultiProbe(corpus, cents, tau, nProbe = 1)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(multi1 == single)
    }
  }

  test("planted boundary pair: single-probe misses it, nProbe=2 matches brute force") {
    val brute = bruteDropped(xVecs, xCents, xTau)
    val single = droppedSet(SemanticDedup.verdictsWithCents(xDF, xCents, xTau))
    val multi = droppedSet(SemanticDedup.verdictsMultiProbe(xDF, xCents, xTau, nProbe = 2))
    assert(brute.nonEmpty, "construction must plant at least one cross-cell drop")
    // the straddling member is invisible to the cell-scoped rule...
    val missedSingle = (brute -- single).size.toDouble / brute.size
    val missedMulti = (brute -- multi).size.toDouble / brute.size
    assert(missedSingle > 0.0, "planted corpus must expose the single-probe blind spot")
    assert(missedMulti < missedSingle, "multi-probe must beat single-probe recall")
    // ...and with nProbe = nList every cell is probed, so the operator IS
    // the brute-force rule (drops can only be added, never invented)
    assert(multi == brute)
    assert(single.subsetOf(multi), "extra probes may only ADD drops")
  }

  test("q124 on real sf0.001 embeddings: partitions corpus, drops ⊇ q102's") {
    val dir = "/root/testdata/sf0.001"
    val total = graft.Tables.embeddings(spark, dir).count()
    val rows = SemanticDedup.queries("q124_semdedup_xcell")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == total, "cells must partition all vectors")
    val q102Drops = SemanticDedup.queries("q102_semantic_dedup")(spark, dir)
      .agg(sum("n_dropped")).collect()(0).getLong(0)
    val q124Drops = rows.map(_.getLong(2)).sum
    assert(q124Drops >= q102Drops,
      s"cross-cell probing can only add drops: $q124Drops vs $q102Drops")
  }

  test("q102 on real sf0.001 embeddings: cells partition the corpus, keep_frac sane") {
    val dir = "/root/testdata/sf0.001"
    val total = graft.Tables.embeddings(spark, dir).count()
    val rows = SemanticDedup.queries("q102_semantic_dedup")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == total, "cells must partition all vectors")
    rows.foreach { r =>
      val (n, d, kf) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d < n && kf > 0.0 && kf <= 1.0)
    }
  }
}
