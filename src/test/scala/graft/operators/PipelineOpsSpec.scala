package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Specs for the round-3 surface widening (q48–q56). Value-level parity is
  * the driver's DuckDB gate; these pin structural invariants on sf0.001
  * plus the plan-shape claims the Scaladocs make (decorrelation, exchange
  * reuse).
  */
class PipelineOpsSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  // The session is shared across suites: anything cached here would be
  // substituted (as InMemoryRelation) into OTHER suites' physical plans by
  // CacheManager — the round-3 PlanShapeSpec order-dependent failure.
  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  test("q48 windows: one row per order, quartile in 1..4, pr in [0,1]") {
    val df = PipelineOps.q48WindowSuite(spark, sf).cache()
    assert(df.count() == graft.Tables.orders(spark, sf).count())
    assert(df.filter(col("quartile") < 1 || col("quartile") > 4).count() == 0)
    assert(df.filter(col("pr") < 0 || col("pr") > 1).count() == 0)
    // first order per customer has no prev, pr = 0
    assert(df.filter(col("prev_price").isNull && col("pr") =!= 0).count() == 0)
  }

  test("q50 stratified sample: subset of corpus, en rate highest") {
    val df = PipelineOps.q50StratifiedSample(spark, sf).cache()
    val n = df.count()
    assert(n > 0 && n < 500)
    // deterministic: re-running yields the identical sample
    val again = PipelineOps.q50StratifiedSample(spark, sf)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
  }

  test("q51 repetition: 0 <= n_repeated < n_ngrams, ratio consistent") {
    val df = PipelineOps.q51Repetition(spark, sf).cache()
    assert(df.filter(col("n_repeated") < 0 || col("n_repeated") >= col("n_ngrams")).count() == 0)
    assert(df.filter(col("n_distinct") + col("n_repeated") =!= col("n_ngrams")).count() == 0)
  }

  test("q52 histogram: doc counts total the corpus, buckets ordered") {
    val df = PipelineOps.q52TokenHistogram(spark, sf).cache()
    assert(df.agg(sum("n_docs")).head().getLong(0) == 500)
    assert(df.filter(col("min_tokens") > col("max_tokens")).count() == 0)
  }

  test("q53 full outer: covers the union of both sides' nation keys") {
    val df = PipelineOps.q53FullOuter(spark, sf).cache()
    val supN = graft.Tables.supplier(spark, sf)
      .select(col("s_nationkey").cast("long")).distinct()
    val custN = graft.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long")).distinct()
    val expected = supN.union(custN).distinct().count()
    assert(df.count() == expected)
    assert(df.filter(col("n_suppliers") === 0 && col("n_customers") === 0).count() == 0)
  }

  test("q54 exists: decorrelated to semi/anti joins, counts consistent") {
    val df = PipelineOps.q54ExistsSubquery(spark, sf).cache()
    // Catalyst must rewrite the correlated EXISTS into joins — no
    // per-row subquery survives in the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("subquery exists"),
      s"correlated subquery not decorrelated:\n$plan")
    val bad = df.filter(
      col("n_with_big_order") > col("n_customers") ||
        col("n_inactive") > col("n_customers")).count()
    assert(bad == 0)
    assert(df.agg(sum("n_customers")).head().getLong(0) ==
      graft.Tables.customer(spark, sf).count())
  }

  test("q55 array funcs: n_pos <= dim, sum matches explode-based decimal sum") {
    val df = PipelineOps.q55ArrayFuncs(spark, sf).cache()
    assert(df.filter(col("n_pos") < 0 || col("n_pos") > col("dim")).count() == 0)
    // the higher-order decimal fold must agree bitwise with the exploded
    // decimal aggregation (order-free exactness is the claim)
    val exploded = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), explode(col("embedding")).as("x"))
      .groupBy("vec_id")
      .agg(sum(col("x").cast("double").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
        .cast("double").as("sum_val"))
    val joined = df.select("vec_id", "sum_val")
      .join(exploded.withColumnRenamed("sum_val", "sum2"), "vec_id")
    assert(joined.filter(col("sum_val") =!= col("sum2")).count() == 0)
  }

  test("q56 funnel: stages monotone, timestamps ordered") {
    val df = PipelineOps.q56Funnel(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("stage") < 1 || col("stage") > 3).count() == 0)
    assert(df.filter(col("c_us").isNotNull && col("c_us") < col("v_us")).count() == 0)
    assert(df.filter(col("p_us").isNotNull && col("p_us") < col("c_us")).count() == 0)
    // stage encodes exactly which timestamps exist
    assert(df.filter(col("stage") === 3 && col("p_us").isNull).count() == 0)
    assert(df.filter(col("stage") === 1 && col("c_us").isNotNull).count() == 0)
  }

  test("q49 decontaminate: hits bounded, benchmark docs absent") {
    val df = DedupOps.q49Decontaminate(spark, sf).cache()
    assert(df.filter(col("doc_id") % 97 === 0).count() == 0)
    assert(df.filter(col("n_hits") > col("n_sh")).count() == 0)
    assert(df.filter(col("contaminated") =!= (col("n_hits") > 0)).count() == 0)
  }
}
