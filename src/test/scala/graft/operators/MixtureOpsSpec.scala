package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Structural invariants for the round-8 mixture/scheduling family
  * (q85–q87) on sf0.001; value-level parity is the driver's DuckDB gate.
  */
class MixtureOpsSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  test("q85 temperature mix: smallest source keeps rate 1, rates anti-monotone in size") {
    val df = MixtureOps.q85TemperatureMix(spark, sf).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    // kept is a subsample, and every source survives (rate >= sqrt(nMin/nMax) > 0)
    rows.foreach { r =>
      val (n, kept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(kept >= 0 && kept <= n)
    }
    val bySize = rows.sortBy(_.getAs[Long]("n_docs"))
    val rates = bySize.map(_.getAs[Double]("keep_rate"))
    assert(rates.head == 1.0, "smallest source anchors at keep-rate 1")
    assert(rates.zip(rates.tail).forall { case (a, b) => a >= b },
      "bigger sources never keep a higher rate")
    // deterministic: identical on re-run
    val again = MixtureOps.q85TemperatureMix(spark, sf)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
  }

  test("q86 shard assign: 16 shards partition the corpus exactly") {
    val df = MixtureOps.q86ShardAssign(spark, sf).cache()
    val rows = df.collect()
    assert(rows.map(_.getAs[Int]("shard")).toSet.subsetOf((0 until 16).toSet))
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "every document lands in exactly one shard")
    // md5 routing is roughly balanced: no shard more than 3x the mean
    val mean = total.toDouble / rows.length
    assert(rows.forall(_.getAs[Long]("n_docs") <= 3 * mean))
  }

  test("q87 novelty: a verbatim copy of an earlier doc has novelty 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "web", 29L),
      (1L, "alpha beta gamma delta epsilon", "en", "web", 29L), // copy of 0
      (2L, "zeta eta theta iota kappa", "en", "web", 25L)       // all new
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = MixtureOps.q87NgramNovelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    assert(out(0L) == 1.0 && out(1L) == 0.0 && out(2L) == 1.0)
  }

  test("q90 winsorize: clamp counts bounded, winsorized sum within [lo*n, hi*n]") {
    val df = MixtureOps.q90Winsorize(spark, sf).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getAs[Long]("n_docs"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      val (cl, ch) = (r.getAs[Long]("n_clamped_low"), r.getAs[Long]("n_clamped_high"))
      val w = r.getAs[Double]("winsorized_tokens")
      assert(lo <= hi)
      // at p05/p95, each tail clamps at most ~5% of the source (+1 slack)
      assert(cl <= n / 20 + 1 && ch <= n / 20 + 1, s"$cl/$ch of $n")
      assert(w >= lo * n - 1e-6 && w <= hi * n + 1e-6)
    }
  }

  test("q87 novelty on testdata: ratios consistent, first doc fully novel") {
    val df = MixtureOps.q87NgramNovelty(spark, sf).cache()
    assert(df.filter(col("n_novel") > col("n_shingles")).count() == 0)
    assert(df.filter(col("novelty") < 0 || col("novelty") > 1).count() == 0)
    // doc_id 0 (if it has >= 3 tokens) can only own first occurrences
    val d0 = df.filter(col("doc_id") === 0).collect()
    d0.foreach(r => assert(r.getAs[Double]("novelty") == 1.0))
  }

  test("q156 effective tokens: repeats never add value, no repeats means full value, epochs shared with q154") {
    val rows = MixtureOps.q156EffectiveTokens(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Double]("epochs")
      val seen = r.getAs[Double]("tokens_seen")
      val eff = r.getAs[Double]("effective_tokens")
      val vr = r.getAs[Double]("value_ratio")
      // R*(1 - exp(-x/R*)) <= x: effective value never exceeds tokens seen
      assert(eff <= seen + 1e-3, s"${r.getAs[String]("source")}: eff $eff > seen $seen")
      assert(vr >= 0.0 && vr <= 1.0 + 1e-9)
      if (e <= 1.0) assert(eff == seen, "below one epoch nothing repeats")
      else {
        // beyond one epoch the first full pass is always worth itself
        assert(eff + 1e-3 >= r.getAs[Long]("n_tokens").toDouble)
        assert(vr < 1.0, "repeating must cost value")
      }
    }
    // the allocation is the q154 one, bit for bit
    val eps = MixtureOps.q154UnimaxBudget(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("epochs")).toMap
    rows.foreach(r =>
      assert(r.getAs[Double]("epochs") == eps(r.getAs[String]("source"))))
  }

  test("q154 UniMax: degenerate empty/whitespace sources never yield NaN epochs") {
    // round-15 ADVICE guard: epochs is CASE-guarded on n_tokens > 0 on
    // both engines. (With the shared whitespace tokenizer an empty text
    // still counts 1 token — split('') = [''] on Spark and DuckDB alike —
    // so n_tokens = 0 needs the guard only for degenerate/null corpora;
    // the assertion here is NaN-freedom plus determinism on the edge.)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-unimax-empty").toString
    Seq(
      (0L, "alpha beta gamma", "en", "web", 16L),
      (1L, "delta epsilon zeta eta theta iota kappa", "en", "web", 39L),
      (2L, "", "en", "empty", 0L),
      (3L, "   ", "en", "empty", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = MixtureOps.q154UnimaxBudget(spark, dir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(!r.getAs[Double]("epochs").isNaN, s"NaN epochs for ${r.getAs[String]("source")}")
      assert(!r.getAs[Double]("allocated").isNaN)
    }
    val again = MixtureOps.q154UnimaxBudget(spark, dir).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("q154 UniMax: caps respected, budget conserved, unsaturated sources share evenly") {
    val rows = MixtureOps.q154UnimaxBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    val totTokens = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val budget = totTokens * 2.0
    val alloc = rows.map(_.getAs[Double]("allocated"))
    val caps = rows.map(_.getAs[Double]("capacity"))
    val sat = rows.map(_.getAs[Long]("saturated") == 1L)
    // nobody exceeds its epoch cap; epochs bounded by 1.5
    rows.foreach { r =>
      assert(r.getAs[Double]("allocated") <= r.getAs[Double]("capacity") + 1e-3)
      assert(r.getAs[Double]("epochs") <= 1.5 + 1e-6)
    }
    // saturated sources get exactly their capacity
    rows.zipWithIndex.filter { case (_, i) => sat(i) }
      .foreach { case (r, i) => assert(math.abs(alloc(i) - caps(i)) < 1e-3) }
    if (sat.forall(identity)) {
      // every source capped: the corpus can't absorb the budget
      assert(alloc.sum <= budget + 1e-3)
    } else {
      // water-filling conserves the budget exactly
      assert(math.abs(alloc.sum - budget) < 1e-2,
        s"allocated ${alloc.sum} vs budget $budget")
      // all unsaturated sources receive the SAME share, and that share is
      // at least as large as any saturated source's capacity (else the
      // saturated one wouldn't have capped out)
      val shares = alloc.zipWithIndex.filterNot { case (_, i) => sat(i) }.map(_._1)
      assert(shares.distinct.length == 1)
      val capsSat = caps.zipWithIndex.filter { case (_, i) => sat(i) }.map(_._1)
      capsSat.foreach(c => assert(c <= shares.head + 1e-3))
    }
  }
}
