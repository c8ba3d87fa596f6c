package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Round-13 operators: Bloom-prefiltered decontamination (q127),
  * Misra-Gries exact heavy hitters (q128), and kNN-graph label
  * propagation (q129). Each test pins the property that makes the
  * operator's sketch/summary INVISIBLE in its output — the contract all
  * three gates rely on.
  */
class Round13OpsSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  // ---------------------------------------------------------------- q127

  private def docsDf: DataFrame = graft.Tables.documents(spark, sf)

  test("q127: bloom output == exact decontaminate's contaminated rows, at any fpp") {
    val exact = DedupOps.decontaminate(docsDf, _ % 89 === 0)
      .filter(col("contaminated"))
      .select("doc_id", "n_sh", "n_hits")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "test corpus must have contaminated docs")
    // fpp 0.5 floods the prefilter with false positives; 0.0001 starves
    // it — the verify stage must erase the difference entirely
    for (fpp <- Seq(0.5, 0.03, 0.0001)) {
      val bloom = DedupOps.bloomDecontaminate(docsDf, _ % 89 === 0, fpp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(bloom == exact, s"fpp=$fpp diverged from the exact path")
    }
  }

  test("q127: a bloom false positive never reaches the output") {
    val sp = spark
    import sp.implicits._
    // bench doc 0 and one train doc sharing NO shingle with it: under
    // fpp=0.5 the train doc is very likely a prefilter candidate across
    // the 8 shingles, yet must verify to zero hits and vanish
    val docs = Seq(
      (0L, "b", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "t", "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "source", "text")
    val out = DedupOps.bloomDecontaminate(docs, _ === 0L, fpp = 0.5)
    assert(out.count() == 0, "clean doc leaked through the exact-verify stage")
  }

  // ---------------------------------------------------------------- q128

  test("q128: output equals the exact GROUP BY/HAVING answer under any partitioning") {
    val sp = spark
    import sp.implicits._
    // Zipf-ish corpus: token_i appears ~1000/i times, spread across docs
    // so partition-local frequencies differ from global ones
    val occurrences = (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"tok$i"))
    val docs = occurrences.zipWithIndex
      .groupBy(_._2 % 97).toSeq
      .map { case (g, toks) => (g.toLong, toks.map(_._1).mkString(" ")) }
      .toDF("doc_id", "text")
    val n = occurrences.size
    val rel = 0.01
    val threshold = math.ceil(n * rel).toLong
    val expected = occurrences.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= threshold).toMap
    for (parts <- Seq(1, 3, 17)) {
      val got = TextOps.heavyHitters(docs.repartition(parts), rel, mgK = 200)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts: got ${got.size} vs ${expected.size} expected")
    }
  }

  test("q128: tokens exactly at threshold are kept; tiny mgK still misses nothing it guarantees") {
    val sp = spark
    import sp.implicits._
    // 100 tokens total: "hot" 25 times (exactly rel=0.25 threshold),
    // "warm" 24 (below), filler unique. mgK=4 with rel=0.25 satisfies
    // rel > 1/(mgK+1) = 0.2, so "hot" MUST survive the summaries.
    val occurrences = Seq.fill(25)("hot") ++ Seq.fill(24)("warm") ++
      (1 to 51).map(i => s"u$i")
    val docs = occurrences.zipWithIndex
      .groupBy(_._2 % 13).toSeq
      .map { case (g, toks) => (g.toLong, toks.map(_._1).mkString(" ")) }
      .toDF("doc_id", "text")
    val got = TextOps.heavyHitters(docs.repartition(7), rel = 0.25, mgK = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 25L))
    // and the guard refuses an unsound (rel, mgK) pairing
    intercept[IllegalArgumentException] {
      TextOps.heavyHitters(docs, rel = 0.1, mgK = 4)
    }
  }

  // ---------------------------------------------------------------- q129

  test("q129: seeds stay clamped and a hand-computed 2-round propagation matches") {
    val sp = spark
    import sp.implicits._
    // path graph 0—1—2 with weights: seed 0 positive, seed 2 negative,
    // vertex 1 unlabeled. Round 1: s(1) = (0.8*1 + 0.4*0)/(0.8+0.4)
    // = 0.666667 (6dp). Round 2 recomputes from the SAME clamped seeds:
    // unchanged. Vertices 0 and 2 keep their seeds both rounds.
    val emb = Seq((0L, Array(1f), 0), (1L, Array(1f), 5), (2L, Array(1f), 1))
      .toDF("vec_id", "embedding", "label")
    val edges = Seq((1L, 0L, 0.8, 1), (1L, 2L, 0.4, 2))
      .toDF("src_id", "nbr_id", "sim", "rk")
    val out = KnnGraph.labelPropagate(emb, edges,
        isSeed = v => v =!= 1L, isPos = _ === 0, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(0L) == ((true, 1.0, true)), "positive seed must stay clamped at 1.0")
    assert(out(2L) == ((false, 0.0, false)) || out(2L) == ((true, 0.0, false)))
    assert(out(2L)._1, "vec 2 is a seed")
    assert(out(1L)._2 == 0.666667, s"hand-computed weighted mean, got ${out(1L)._2}")
    assert(out(1L)._3, "0.666667 >= 0.5 must predict positive")
  }

  test("q129: propagation is deterministic and scores stay in [0, 1]") {
    val emb = graft.Tables.embeddings(spark, sf)
    val run = () => KnnGraph.q129LabelProp()(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val a = run()
    val b = run()
    assert(a == b, "two runs diverged")
    assert(a.forall { case (_, s) => s >= 0.0 && s <= 1.0 })
    // propagation must actually move mass: some unlabeled vertex nonzero
    val unlabeledNonzero = KnnGraph.q129LabelProp()(spark, sf)
      .filter(!col("labeled") && col("score") > 0).count()
    assert(unlabeledNonzero > 0, "no label mass propagated to any unlabeled vertex")
  }
}
