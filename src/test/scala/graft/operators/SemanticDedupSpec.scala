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
