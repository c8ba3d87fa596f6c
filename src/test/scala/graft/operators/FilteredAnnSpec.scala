package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Filtered vector search (q114 + ivfTopKFiltered): predicate semantics,
  * exhaustive-probe exactness, and the scan-level filter pushdown that
  * makes the filter free at rest.
  */
class FilteredAnnSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  test("q114: every hit shares its query's label; k bounded; deterministic") {
    val df = SimilarityOps.q114FilteredAnn(spark, sf).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    val labels = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Int]("label") == labels(r.getAs[Long]("query_id")))
      assert(labels(r.getAs[Long]("target_id")) == r.getAs[Int]("label"),
        "a hit outside the predicate scope escaped the filter")
      assert(r.getAs[Int]("rk") <= 5)
    }
    val again = SimilarityOps.q114FilteredAnn(spark, sf)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
  }

  test("ivfTopKFiltered at exhaustive probes equals the filtered brute force") {
    val emb = graft.Tables.embeddings(spark, sf)
    val qids = Seq(0L, 1L, 2L)
    val pred = col("label") === 2
    val nList = 8
    val ivf = SimilarityOps
      .ivfTopKFiltered(emb, qids, k = 5, nList = nList, nProbe = nList, pred)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // brute force under the same predicate (query side unfiltered, as in the op)
    val q = broadcast(emb.filter(col("vec_id").isInCollection(qids))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val t = emb.filter(pred)
      .select(col("vec_id").as("target_id"), col("embedding").as("tv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("sim"), col("target_id"))
    val bf = q.join(t, col("query_id") =!= col("target_id"))
      .withColumn("sim",
        round(graft.functions.CosineSimilarity(col("qv"), col("tv")), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("query_id"), col("target_id"), col("sim"), col("rk"))
      .orderBy("query_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(ivf.toSeq == bf.toSeq,
      "exhaustive probing must make the filtered IVF exact")
  }

  test("ivfTopKFiltered pushes the predicate to the parquet scan") {
    val emb = graft.Tables.embeddings(spark, sf)
    val plan = SimilarityOps
      .ivfTopKFiltered(emb, Seq(0L), k = 3, nList = 8, nProbe = 2,
        col("label") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(label,1)"),
      s"label predicate must reach the scan:\n${plan.take(2000)}")
  }

  test("ivfTopK is the pred=true special case (delegation is lossless)") {
    val emb = graft.Tables.embeddings(spark, sf)
    val a = SimilarityOps.ivfTopK(emb, Seq(0L, 1L), k = 4, nList = 8, nProbe = 3)
    val b = SimilarityOps.ivfTopKFiltered(emb, Seq(0L, 1L), k = 4, nList = 8,
      nProbe = 3, lit(true))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
