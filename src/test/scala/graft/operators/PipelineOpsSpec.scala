package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Specs for the LLM-pipeline operator families. The heavyweight value
  * check is the driver's DuckDB oracle (all queries pass exactly at sf0.01);
  * these specs pin schemas, invariants, and a few hand-computable values on
  * sf0.001 so `sbt test` catches regressions without DuckDB.
  */
class PipelineOpsSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  test("q20 token stats: counts consistent") {
    val df = TextOps.q20TokenStats(spark, sf).cache()
    assert(df.count() == 500)
    assert(df.filter(col("n_distinct_tokens") > col("n_tokens")).count() == 0)
    assert(df.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("q24 exact dedup: groups partition the corpus") {
    val df = DedupOps.q24DedupExact(spark, sf)
    val agg = df.agg(sum("n_copies"), count(lit(1))).head()
    assert(agg.getLong(0) == 500) // every doc in exactly one group
  }

  test("q25 jaccard pairs: bounded and symmetric-free") {
    val df = DedupOps.q25NgramJaccard(spark, sf).cache()
    assert(df.filter(col("jaccard") > 1.0 || col("jaccard") < 0.2).count() == 0)
    assert(df.filter(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("q26 minhash: 16 signatures per doc, stable across runs") {
    val df = DedupOps.q26MinhashSignatures(spark, sf).cache()
    val perDoc = df.groupBy("doc_id").count().agg(min("count"), max("count")).head()
    assert(perDoc.getLong(0) == 16 && perDoc.getLong(1) == 16)
    // determinism: md5-based hashes are pure functions
    val again = DedupOps.q26MinhashSignatures(spark, sf)
    assert(df.exceptAll(again).count() == 0)
  }

  test("q28 simhash: 32-bit range and popcount consistency") {
    val df = DedupOps.q28Simhash(spark, sf).cache()
    assert(df.filter(col("simhash") < 0 || col("simhash") >= (1L << 32)).count() == 0)
    assert(df.filter(col("popcount") < 0 || col("popcount") > 32).count() == 0)
  }

  test("connected components match a local union-find on the same pairs") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L))
      .toDF("doc_a", "doc_b")
    val nodes = (1L to 10L).toDF("doc_id")
    val got = DedupOps.connectedComponents(nodes, pairs)
      .as[(Long, Long)].collect().toMap
    // union-find ground truth: {1,2,3,8,9} → 1, {5,6} → 5, rest singleton
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L, 4L -> 4L, 7L -> 7L, 10L -> 10L)
    assert(got == expected, got.toSeq.sorted.mkString(", "))
  }

  test("connected components match union-find on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30
      val pairs = Seq.fill(25)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = DedupOps.connectedComponents(
          (0L until n.toLong).toDF("doc_id"),
          pairs.toDF("doc_a", "doc_b"), maxIter = 40)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("q42: components are consistent with the q27 pair graph") {
    import spark.implicits._
    val comp = DedupOps.q42DedupClusters(spark, sf).as[(Long, Long)].collect().toMap
    val pairs = DedupOps.q27LshPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    // every pair's endpoints share a component, and the label is a member
    pairs.foreach { case (a, b) => assert(comp(a) == comp(b), s"($a,$b)") }
    assert(comp.forall { case (n, c) => c <= n })
  }

  test("cosine topk: self-similarity ~1, results sorted, k respected") {
    val emb = graft.Tables.embeddings(spark, sf)
    val res = SimilarityOps.cosineTopK(emb.filter(col("vec_id") < 3), emb, 5).cache()
    assert(res.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    // a vector's duplicate-free top hit similarity is within [-1, 1+eps]
    assert(res.filter(abs(col("sim")) > 1.0 + 1e-6).count() == 0)
    // rk ordering matches sim ordering per query
    import spark.implicits._
    res.select("query_id", "rk", "sim").as[(Long, Int, Double)].collect()
      .groupBy(_._1).values.foreach { rows =>
        val sorted = rows.sortBy(_._2).map(_._3)
        assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b - 1e-12 })
      }
  }

  test("q29 brute-force ANN matches array-native cosine within rounding") {
    val res = SimilarityOps.q29BruteForceTopK(spark, sf)
    val emb = graft.Tables.embeddings(spark, sf)
    val native = SimilarityOps.cosineTopK(emb.filter(col("vec_id") < 5), emb, 5)
    import spark.implicits._
    val a = res.select("query_id", "target_id", "sim").as[(Long, Long, Double)]
      .collect().map { case (q, t, s) => (q, t) -> s }.toMap
    val b = native.select("query_id", "target_id", "sim").as[(Long, Long, Double)]
      .collect().map { case (q, t, s) => (q, t) -> s }.toMap
    val common = a.keySet intersect b.keySet
    assert(common.nonEmpty)
    common.foreach(k => assert(math.abs(a(k) - b(k)) < 1e-5, s"$k: ${a(k)} vs ${b(k)}"))
  }

  test("IVF ANN: probing half the cells recovers most of the exact top-5") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = SimilarityOps.cosineTopK(emb.filter(col("vec_id") < 5), emb, 5)
      .select("query_id", "target_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityOps.ivfTopK(emb, qids, k = 5, nList = 8, nProbe = 4)
      .select("query_id", "target_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, f"recall@5 = $recall%.2f")
    // every query returns k results (cells are populated)
    assert(ivf.groupBy(_._1).forall(_._2.size == 5))
  }

  test("multimodal decode stub: deterministic byte features") {
    val f = MultimodalOps.stubDecode("abc".getBytes("UTF-8"))
    assert(f(0) == 3.0f)            // length
    assert(f(2) == 97.0f)           // min byte 'a'
    assert(f(3) == 99.0f)           // max byte 'c'
    assert(f(6) == ((97 + 98 + 99) % 251).toFloat)
    assert(MultimodalOps.stubDecode(Array.emptyByteArray)(0) == 0.0f)
  }

  test("resize stub: block averaging and length contract") {
    val in = Array[Byte](10, 20, 30, 40, 50)
    val out = MultimodalOps.stubResize(in, 2)
    assert(out.length == 3)
    assert(out(0) == 15 && out(1) == 35 && out(2) == 50) // last block partial
    assert(MultimodalOps.stubResize(Array.emptyByteArray, 4).isEmpty)
  }

  test("q43 frame sampling: strided frames with correct sizes") {
    val df = MultimodalOps.q43FrameSample(spark, sf).cache()
    // every sampled frame index is even; full frames are exactly 100 bytes
    assert(df.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    assert(df.filter(col("n_bytes") > 100 || col("n_bytes") <= 0).count() == 0)
    assert(df.select("doc_id").distinct().count() == 500)
  }

  test("q31 multimodal pipeline: features survive the mapPartitions boundary") {
    val df = MultimodalOps.q31MultimodalDecode(spark, sf).cache()
    assert(df.count() == 500)
    assert(df.filter(col("f_len") =!= col("n_bytes")).count() == 0)
    assert(df.filter(col("f_min_byte") > col("f_max_byte")).count() == 0)
  }
}
