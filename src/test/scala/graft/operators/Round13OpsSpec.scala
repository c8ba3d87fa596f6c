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

  // ---------------------------------------------------------------- q130

  test("q130: one hand-computed damped iteration on a weighted path graph") {
    val sp = spark
    import sp.implicits._
    // path 0—1—2, weights 0.5 and 1.0. Shares: 0→1: 1.0; 1→0: 0.333333;
    // 1→2: 0.666667; 2→1: 1.0. p0 = round6(1/3) = 0.333333 each.
    // score(v) = round6(0.15/3 + 0.85·Σ share·p0):
    //   0: 0.05 + 0.85·(0.333333·0.333333)             = 0.144444
    //   1: 0.05 + 0.85·(1.0·0.333333 + 1.0·0.333333)   = 0.616666
    //   2: 0.05 + 0.85·(0.666667·0.333333)             = 0.238889
    val emb = Seq((0L, Array(1f)), (1L, Array(1f)), (2L, Array(1f)))
      .toDF("vec_id", "embedding")
    val edges = Seq((0L, 1L, 0.5, 1), (1L, 2L, 1.0, 1))
      .toDF("src_id", "nbr_id", "sim", "rk")
    val out = KnnGraph.pageRank(emb, edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) == 0.144444, s"got ${out(0L)}")
    assert(out(1L) == 0.616666, s"got ${out(1L)}")
    assert(out(2L) == 0.238889, s"got ${out(2L)}")
  }

  test("q130: deterministic, positive, and mass-conserving within rounding on real embeddings") {
    val a = KnnGraph.q130PageRank()(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = KnnGraph.q130PageRank()(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, "two runs diverged")
    assert(a.forall(_._2 > 0.0), "teleport mass makes every score positive")
    // no dangling vertices and shares summing to ~1 per source conserve
    // total mass at ~1 (up to the 6dp share/score rounding drift)
    val total = a.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-3, s"PageRank mass drifted: $total")
    // the walk must actually differentiate vertices
    assert(a.map(_._2).distinct.size > 1)
  }

  // ---------------------------------------------------------------- q131

  test("q131: hand-computed unigram log-probs on a two-doc corpus") {
    val sp = spark
    import sp.implicits._
    // tokens: a a b | b c — T=5; lp(a)=lp(b)=round6(ln(2/5))=-0.916291,
    // lp(c)=round6(ln(1/5))=-1.609438.
    // d0 = (3·-0.916291)/3 = -0.916291
    // d1 = (-0.916291 + -1.609438)/2 = -1.2628645 → HALF_UP → -1.262865
    val docs = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("token"))
    // run the operator body via the query on a registered-table-free path:
    // build the same frame the query builds
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val total = toks.count()
    val lm = toks.groupBy("token").agg(count(lit(1)).as("tf"))
      .select(col("token"), round(log(col("tf") / lit(total.toDouble)), 6).as("lp"))
    val out = toks.join(lm, Seq("token"))
      .groupBy("doc_id")
      .agg(round(sum(col("lp").cast(DecimalType(18, 6))).cast(DoubleType)
        / count(lit(1)), 6).as("mean_logprob"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) == -0.916291, s"got ${out(0L)}")
    assert(out(1L) == -1.262865, s"got ${out(1L)}")
  }

  test("q131: deterministic; rare-token docs score strictly below common-token docs") {
    val sp = spark
    import sp.implicits._
    val docs = (Seq.fill(9)("the cat sat") :+ "zyzzyva qwyjibo xylotomy")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("dummy") // not used by the op; keep sf path
    val run = () => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val toks = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("token"))
      val total = toks.count()
      val lm = toks.groupBy("token").agg(count(lit(1)).as("tf"))
        .select(col("token"), round(log(col("tf") / lit(total.toDouble)), 6).as("lp"))
      toks.join(lm, Seq("token")).groupBy("doc_id")
        .agg(round(sum(col("lp").cast(DecimalType(18, 6))).cast(DoubleType)
          / count(lit(1)), 6).as("mean_logprob"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val m = run()
    assert(m == run(), "two runs diverged")
    assert(m(9L) < m(0L), "the all-rare-token doc must score below the common one")
    // and the real-table query runs end to end, deterministically
    val g = () => TextOps.q131UnigramLogprob(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(g() == g())
  }

  // ---------------------------------------------------------------- q132

  test("q132: exhaustive probing pins nDCG to 1.0; partial probing keeps dcg <= idcg") {
    val emb = graft.Tables.embeddings(spark, sf)
    val nl = ProductQuantization.adaptiveNList(emb)
    val full = SimilarityOps.q132NdcgAudit(nProbe = nl)(spark, sf).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getAs[Double]("ndcg") == 1.0,
        s"exhaustive probe must return the exact ranking: $r")
      assert(r.getAs[Double]("dcg") == r.getAs[Double]("idcg"))
    }
    val partial = SimilarityOps.q132NdcgAudit(nProbe = 1)(spark, sf).collect()
    partial.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getAs[Double]("dcg"), r.getAs[Double]("idcg"),
        r.getAs[Double]("ndcg"))
      assert(dcg <= idcg + 1e-9 && ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"$r")
    }
    // the audit is deterministic
    val again = SimilarityOps.q132NdcgAudit(nProbe = 1)(spark, sf).collect()
    assert(partial.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  // ---------------------------------------------------------------- q133

  test("q133: containment catches a short quote inside a long page that Jaccard misses") {
    val sp = spark
    import sp.implicits._
    val quote = (1 to 10).map(i => s"q$i").mkString(" ") // 8 shingles
    val filler = (1 to 62).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, "web", quote), // the contained quote
      (2L, "web", s"$quote $filler"), // the container page
      (3L, "web", (1 to 12).map(i => s"z$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "source", "text")
    // symmetric Jaccard at the q25 threshold is blind to the pair:
    // J = 8 / (8 + 70 - 8) = 0.114 < 0.2
    val j = DedupOps.jaccardPairs(docs, minJaccard = 0.2).collect()
    assert(!j.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "Jaccard at 0.2 should NOT pair the quote with its container")
    // containment sees it from the quote's side: |A∩B|/|A| = 1.0
    val c = DedupOps.containmentPairs(docs, minContainment = 0.8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b")))).toMap
    assert(c.contains((1L, 2L)), s"containment must pair quote and container, got ${c.keys}")
    assert(c((1L, 2L))._1 == 1.0, "the quote is fully contained")
    assert(c((1L, 2L))._2 < 0.2, "the container is NOT contained in the quote")
    assert(!c.keys.exists { case (a, b) => a == 3L || b == 3L },
      "the unrelated doc must not pair with anything")
  }

  // ---------------------------------------------------------------- q134

  test("q134: the winnowing guarantee — a shared run of >= w+k-1 tokens shares a fingerprint") {
    val sp = spark
    import sp.implicits._
    // two docs sharing an 8-token run (> w+k-1 = 6) inside entirely
    // different surroundings: MOSS's guarantee says the winnowed sets
    // MUST intersect, however the windows land
    val run = (1 to 8).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, "web", s"alpha beta gamma $run delta epsilon zeta"),
      (2L, "web", s"one two three four $run five six seven eight"),
      (3L, "web", (1 to 15).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val fps = DedupOps.winnowFingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "a shared 8-token run must produce at least one shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "no token in common => no fingerprint in common")
    // density: the fingerprint set is a sparse subset of the gram set
    val counts = docs.collect().map { r =>
      r.getLong(0) -> (r.getString(2).split("\\s+").length - 2)
    }.toMap
    fps.foreach { case (id, f) =>
      assert(f.nonEmpty && f.size <= counts(id),
        s"doc $id: ${f.size} fps vs ${counts(id)} grams")
    }
  }

  test("q134: exact copies pair at wjaccard 1.0; sparsity vs the full gram set is real") {
    val sp = spark
    import sp.implicits._
    val body = (1 to 40).map(i => s"tok${i % 17} w$i").mkString(" ")
    val docs = Seq(
      (1L, "web", body), (2L, "web", body), // exact copies
      (3L, "web", (1 to 80).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val out = DedupOps.winnowPairs(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("wjaccard"))).toMap
    assert(out.get((1L, 2L)).contains(1.0),
      s"identical docs must pair at winnowed Jaccard 1.0, got $out")
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L })
    // sparsity: winnowed sets are measurably smaller than gram sets
    val nFps = DedupOps.winnowFingerprints(docs)
      .select(explode(col("fps"))).count()
    val nGrams = docs.collect().map(_.getString(2).split("\\s+").length - 2).sum
    info(s"fingerprints $nFps vs grams $nGrams")
    assert(nFps < nGrams / 2, "winnowing must thin the key mass (expected ~2/(w+1))")
    // deterministic
    val again = DedupOps.winnowPairs(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("wjaccard"))).toMap
    assert(out == again)
  }

  // ---------------------------------------------------------------- q135

  test("q135: identical docs calibrate at est=exact=1.0; shared-nothing pairs never appear") {
    val sp = spark
    import sp.implicits._
    val body = (1 to 30).map(i => s"c${i % 11} v$i").mkString(" ")
    val docs = Seq(
      (1L, "web", body), (2L, "web", body),
      (3L, "web", (1 to 40).map(i => s"x$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val rows = DedupOps.sketchCalibration(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Double]("exact_j"), r.getLong(3), r.getAs[Double]("est_j"),
          r.getAs[Double]("abs_err")))).toMap
    assert(rows.get((1L, 2L)).contains((1.0, 16L, 1.0, 0.0)),
      s"identical docs must calibrate exactly, got ${rows.get((1L, 2L))}")
    assert(!rows.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("q135: sketch error on the real corpus is bounded and the audit is deterministic") {
    val run = () => DedupOps.q135SketchCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("exact_j"),
        r.getLong(3), r.getAs[Double]("est_j"), r.getAs[Double]("abs_err")))
    val rows = run()
    assert(rows.nonEmpty, "the sf0.001 corpus has near-dup pairs above J=0.1")
    rows.foreach { case (_, _, ex, nm, est, err) =>
      assert(nm >= 0 && nm <= 16)
      assert(est >= 0.0 && est <= 1.0 && ex >= 0.1)
      assert(math.abs(err - math.abs(est - ex)) < 2e-6, "err must be |est - exact|")
    }
    // the statistical content: with 16 seeds the MEAN absolute error
    // must sit well under the sketch's single-pair standard deviation
    // bound (sqrt(J(1-J)/16) <= 0.125)
    val mean = rows.map(_._6).sum / rows.size
    info(f"pairs ${rows.size}, mean |est-exact| = $mean%.4f")
    assert(mean < 0.15, f"sketch calibration off: mean abs err $mean%.4f")
    assert(run().toSeq == rows.toSeq)
  }

  test("q133: direction and bounds are well-formed on the real corpus") {
    val rows = DedupOps.q133Containment(spark, sf).collect()
    rows.foreach { r =>
      val (ca, cb) = (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b"))
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0)
      assert(math.max(ca, cb) >= 0.8, s"pair below threshold leaked: $r")
      assert(r.getLong(0) < r.getLong(1), "pairs are doc_a < doc_b by the window order")
    }
    val again = DedupOps.q133Containment(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
