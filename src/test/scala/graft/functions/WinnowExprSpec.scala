package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.operators.DedupOps

/** Pins the fused native winnow kernel ([[WinnowMd5Expr]]) bit-identical —
  * array-for-array, ORDER INCLUDED — to the Catalyst HOF chain it replaces
  * ([[DedupOps.winnowFingerprintsHof]]). The HOF chain is what q134's
  * DuckDB oracle replays, so this equality is the proof the fusion didn't
  * move the gate's semantics.
  */
class WinnowExprSpec extends AnyFunSuite with SharedSpark {

  private def parity(df: org.apache.spark.sql.DataFrame, k: Int, w: Int): Unit = {
    val hof = DedupOps.winnowFingerprintsHof(df, k, w).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](2).toList)).toMap
    val fused = DedupOps.winnowFingerprints(df, k, w).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](2).toList)).toMap
    assert(fused.keySet == hof.keySet,
      s"k=$k w=$w: doc survivor sets differ: ${fused.keySet} vs ${hof.keySet}")
    hof.foreach { case (id, fps) =>
      assert(fused(id) == fps,
        s"k=$k w=$w doc $id: fused=${fused(id)} hof=$fps")
    }
  }

  test("fused winnow == HOF chain on the sf0.001 corpus, exact arrays") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    parity(docs, k = 3, w = 4) // the q134 gate shape
  }

  test("fused winnow == HOF chain across (k, w) shapes and edge docs") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "web", "a b c d e f g h i j"),
      (2L, "web", "x x x x x x x x"),          // heavy duplicate minima
      (3L, "web", "one two three four five six"), // exactly k+w-1 tokens
      (4L, "web", "too short"),                  // below threshold: drops
      (5L, "web", "   padded   with    runs   of spaces   here now  "),
      (6L, "web", ""),                            // empty text: drops
      (7L, "web", (1 to 300).map(i => s"t${i % 7}").mkString(" "))
    ).toDF("doc_id", "source", "text")
    for ((k, w) <- Seq((3, 4), (2, 5), (4, 2), (1, 3), (5, 1)))
      parity(docs, k, w)
  }

  test("the fused kernel inlines into WholeStageCodegen") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = DedupOps.winnowFingerprints(docs)
      .queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the simple plan string —
    // the Project carrying winnowmd5expr must sit inside a span
    val projLine = plan.linesIterator.find(_.contains("winnowmd5expr"))
    assert(projLine.exists(_.contains("*(")),
      s"winnow projection must stay inside a codegen span:\n$plan")
  }
}
