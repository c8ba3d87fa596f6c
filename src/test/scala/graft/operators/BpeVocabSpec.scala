package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** BPE induction against a hand-computed corpus (the classic
  * low/lower/newest/widest example, merge sequence derived by hand for
  * THIS algorithm's tie-break and greedy-application rules), plus the
  * overlapping-run and segmentation edge cases.
  */
class BpeVocabSpec extends AnyFunSuite with SharedSpark {

  private def corpus(rows: Seq[(String, Int)]) = {
    import spark.implicits._
    rows.flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("text")
  }

  test("hand-computed merge sequence on the classic corpus") {
    // freqs: low×5 lower×2 newest×6 widest×3
    // round 1: (e,s)=9 ties (s,t)=9 → left-asc picks (e,s)
    // round 2: (es,t)=9
    // round 3: (l,o)=7 ties (o,w)=7 → (l,o)
    // round 4: (lo,w)=7
    val m = BpeVocab.train(
      corpus(Seq("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)),
      "text", nMerges = 4)
    assert(m.map(x => (x.rank, x.left, x.right, x.pairCount)) == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("overlapping runs merge greedily left-to-right") {
    assert(BpeVocab.applyMerge("a", "a", Seq("a", "a", "a")) == Seq("aa", "a"))
    assert(BpeVocab.applyMerge("a", "a", Seq("a", "a", "a", "a")) == Seq("aa", "aa"))
    // pair counting counts overlaps: "aaa"×2 → (a,a) weight 4
    val m = BpeVocab.train(corpus(Seq("aaa" -> 2)), "text", nMerges = 1)
    assert(m == Seq(BpeVocab.Merge(1, "a", "a", 4L)))
  }

  test("segment applies merges in rank order (unseen word)") {
    val m = BpeVocab.train(
      corpus(Seq("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)),
      "text", nMerges = 4)
    // lowest: (e,s)→es, (es,t)→est, (l,o)→lo, (lo,w)→low ⇒ [low, est]
    assert(BpeVocab.segment("lowest", m) == Seq("low", "est"))
    assert(BpeVocab.segment("xyz", m) == Seq("x", "y", "z"))
  }

  test("minCount stops training; deterministic re-run") {
    val rows = Seq("ab" -> 3, "cd" -> 1)
    // (a,b)=3 passes minCount=2; after merging, remaining pair (c,d)=1 stops
    val m = BpeVocab.train(corpus(rows), "text", nMerges = 10)
    assert(m == Seq(BpeVocab.Merge(1, "a", "b", 3L)))
    assert(BpeVocab.train(corpus(rows), "text", nMerges = 10) == m)
  }

  test("local and distributed merge loops produce bit-identical merge tables") {
    // localTypeCap=0 forces the distributed per-round-job path; the default
    // cap routes the same corpus through the driver-local loop. Both must
    // agree exactly — same weighted counts, same (cnt desc, l, r) UTF-8
    // tie-break, same greedy application.
    val rows = Seq("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3,
      "aaa" -> 2, "ab" -> 3)
    val viaLocal = BpeVocab.train(corpus(rows), "text", nMerges = 8)
    val viaDistributed = BpeVocab.train(corpus(rows), "text", nMerges = 8,
      localTypeCap = 0L)
    assert(viaLocal == viaDistributed)
    assert(viaLocal.nonEmpty)
  }

  test("q67 on testdata: ranks contiguous, counts non-increasing within ties broken") {
    val df = BpeVocab.q67BpeMerges(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 20))
    // merged pair frequency can only decrease or stay equal as merges consume pairs
    val counts = rows.map(_.getLong(3)).toSeq
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("q99 encode: hand-computed token accounting on the classic corpus") {
    import spark.implicits._
    val docs = Seq("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
      .flatMap { case (w, n) => Seq.fill(n)(("a", w)) }.toDF("source", "text")
    // 4 merges: es, est, lo, low ⇒ low→[low](1), lower→[low,e,r](3),
    // newest→[n,e,w,est](4), widest→[w,i,d,est](4)
    val out = BpeVocab.encodeStats(docs, "text", nMerges = 4).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (("a", 16L, 4L, 5L * 1 + 2 * 3 + 6 * 4 + 3 * 4)))
  }

  test("q99 encode: distributed totals equal driver-side segment() on real data") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val merges = BpeVocab.train(docs, "text", nMerges = 20)
    val expected = docs
      .select(org.apache.spark.sql.functions.explode(
        TextOps.tokens(org.apache.spark.sql.functions.col("text"))).as("word"))
      .collect().map(_.getString(0))
      .map(w => BpeVocab.segment(w, merges).length.toLong).sum
    val got = BpeVocab.q99BpeEncode(spark, sf).collect().map(_.getLong(3)).sum
    assert(got == expected)
  }
}
