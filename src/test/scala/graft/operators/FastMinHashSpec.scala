package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Contract of the production MinHash family
  * ([[graft.functions.HashKernels.minhashFast]] / [[DedupOps.lshCandidatePairsFast]])
  * against the oracle-gated md5 family: signatures differ (different hash
  * family by design — that is what buys the ~10× kernel), but the
  * DEDUP BEHAVIOR must match:
  *  - determinism: same corpus → bit-identical candidates, every run;
  *  - exact duplicates collide on all four bands with probability 1
  *    (identical text → identical signature → identical band keys);
  *  - near-dup LSH recall on an adversarial template corpus tracks the
  *    md5 family (both are uniform families over the same shingle sets,
  *    so the banding theory gives them the same expected recall).
  */
class FastMinHashSpec extends AnyFunSuite with SharedSpark {

  private val vocab = (0 until 120).map(i => s"w${i}x")

  /** Deterministic corpus: nTpl template docs each with a one-word-
    * perturbed near-dup twin (ground-truth pairs (2t, 2t+1)), plus
    * nNoise unique background docs. No RNG — seeded index arithmetic. */
  private def corpus(nTpl: Int, nNoise: Int): DataFrame = {
    val sp = spark
    import sp.implicits._
    val rows = (0 until nTpl).flatMap { t =>
      val words = Seq.tabulate(40)(i => vocab((t * 31 + i * 7) % vocab.size))
      val twin = words.updated(t % 40, s"uniq$t")
      Seq((2L * t, words.mkString(" ")), (2L * t + 1, twin.mkString(" ")))
    } ++ (0 until nNoise).map { u =>
      (10000L + u, Seq.tabulate(40)(i => vocab((u * 13 + i * 11 + 5) % vocab.size)).mkString(" "))
    }
    rows.toDF("doc_id", "text")
  }

  test("fused token-array MinHash is bit-identical to shingles3 -> fast kernel") {
    import graft.functions.{HashKernels, MinHashTokensExpr}
    // adversarial token shapes: empty tokens from double spaces, repeated
    // shingles (dedup invariance of MIN), multi-byte UTF-8, single shingle
    val sp = spark
    import sp.implicits._
    val docs = corpus(40, 100).select(col("doc_id"), col("text"))
      .union(Seq(
        (90001L, "a b c"),
        (90002L, "a a a a a a"),
        (90003L, "héllo wörld ünïcode ünïcode héllo wörld"),
        (90004L, "x  y   z  x  y")).toDF("doc_id", "text"))
    val toks = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("l"))
      .filter(size(col("l")) >= 3)
    val viaShingles = toks.select(col("doc_id"),
      graft.functions.HashKernels.minhashFast(16)(HashKernels.shingles3(col("l"))).as("sig"))
    val fused = toks.select(col("doc_id"), MinHashTokensExpr(col("l"), 16).as("sig"))
    assert(viaShingles.exceptAll(fused).count() == 0 &&
      fused.exceptAll(viaShingles).count() == 0)
  }

  private def recallOf(cands: DataFrame, nTpl: Int): Double = {
    val found = cands.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until nTpl).count(t => found.contains((2L * t, 2L * t + 1))).toDouble / nTpl
  }

  test("fast minhash is deterministic across runs") {
    val docs = corpus(nTpl = 20, nNoise = 40)
    val a = DedupOps.lshCandidatePairsFast(docs).orderBy("doc_a", "doc_b").collect()
    val b = DedupOps.lshCandidatePairsFast(docs).orderBy("doc_a", "doc_b").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("exact duplicates collide on all four bands deterministically") {
    val sp = spark
    import sp.implicits._
    val text = vocab.take(30).mkString(" ")
    val docs = Seq((1L, text), (2L, text),
      (3L, vocab.drop(60).take(30).mkString(" "))).toDF("doc_id", "text")
    val out = DedupOps.lshCandidatePairsFast(docs)
      .filter(col("doc_a") === 1 && col("doc_b") === 2).collect()
    assert(out.length == 1 && out.head.getLong(2) == 4,
      s"exact-dup pair must share all 4 bands: ${out.mkString(", ")}")
  }

  test("fast-chain clusters: exact-dup groups land in one component, parity with md5 chain") {
    val sp = spark
    import sp.implicits._
    // five exact-dup groups of 4 docs plus unique noise: both chains MUST
    // put every group into a single component (exact dups collide with
    // probability 1 in any minhash family), and on this corpus — where
    // every true pair is an exact dup — the two chains' cluster maps
    // should agree entirely
    val groups = (0 until 5).flatMap { g =>
      // group tokens carry the group id → shingle sets disjoint ACROSS
      // groups (no probabilistic cross-group band collisions), identical
      // WITHIN a group
      val text = Seq.tabulate(35)(i => s"g${g}t$i").mkString(" ")
      (0 until 4).map(m => (100L * g + m, text))
    }
    // noise tokens carry the doc id, so shingle sets are pairwise DISJOINT
    // across noise docs — no accidental near-dups whose (probabilistic,
    // family-dependent) band collisions could differ between chains
    val noise = (0 until 50).map { u =>
      (5000L + u, Seq.tabulate(35)(i => s"n${u}w$i").mkString(" "))
    }
    val docs = (groups ++ noise).toDF("doc_id", "text")
    def clustersOf(df: DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = clustersOf(DedupOps.dedupClustersFast(docs))
    val md5c = clustersOf(DedupOps.connectedComponents(
      docs.select("doc_id"), DedupOps.lshCandidatePairs(docs).select("doc_a", "doc_b")))
    assert(fast.keySet == md5c.keySet)
    for (g <- 0 until 5) {
      val ids = (0 until 4).map(m => 100L * g + m)
      assert(ids.map(fast).distinct.size == 1, s"fast chain split exact-dup group $g")
      assert(ids.map(fast).head == ids.min, s"fast component label != min doc_id for group $g")
    }
    assert(fast == md5c,
      "fast and md5 chains disagree on a corpus whose only true pairs are exact dups")
  }

  test("near-dup LSH recall tracks the md5 family on the template corpus") {
    val nTpl = 60
    val docs = corpus(nTpl, nNoise = 120)
    val rMd5 = recallOf(DedupOps.lshCandidatePairs(docs), nTpl)
    val rFast = recallOf(DedupOps.lshCandidatePairsFast(docs), nTpl)
    // one perturbed word in 40 → shingle Jaccard ≈ 0.85 → banding theory
    // expects ~0.95 recall for ANY uniform family; allow generous slack
    // but pin both floors and the family gap
    assert(rMd5 >= 0.6, s"md5 recall $rMd5")
    assert(rFast >= 0.6, s"fast recall $rFast")
    assert(math.abs(rFast - rMd5) <= 0.25,
      s"family recall gap too wide: md5 $rMd5 vs fast $rFast")
  }
}
