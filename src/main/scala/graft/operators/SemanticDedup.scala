package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Semantic deduplication over embeddings — the SemDeDup recipe (Abbas et
  * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication"): cluster the corpus embeddings with a k-means
  * coarse quantizer, then deduplicate WITHIN each cluster by pairwise
  * cosine, keeping the member closest to the centroid from every
  * near-duplicate group. This catches paraphrase-level duplication that
  * the lexical family (q24–q28, q98) cannot see: two docs with disjoint
  * token sets but near-identical embeddings are one semantic document.
  *
  * Distributed shape (and why it scales):
  *  1. centroids come from the engine's own deterministic sampled-Lloyd's
  *     trainer ([[ProductQuantization.trainCoarse]] — content-addressed
  *     sample, no RNG, no Spark-ML surface) and are broadcast;
  *  2. cell assignment is one narrow codegen pass
  *     ([[ProductQuantization.cellExpr]]);
  *  3. the deterministic intra-cell priority is (cosine-to-centroid desc,
  *     vec_id) — SemDeDup's "keep the most central" rule with a total
  *     tie-break, computed by a per-cell window whose task size is the
  *     CELL size, which the operator's one tuning rule keeps bounded:
  *     nList grows with the corpus so |cell| ≈ N/nList stays fixed
  *     (SemDeDup itself runs k = 100k clusters at web scale);
  *  4. the pairwise test is a self-join ON CELL with rank(u) < rank(v) —
  *     O(Σ|cell|²) = O(N·|cell|) total work, never a corpus-level pair
  *     set, and a vector is dropped iff some higher-priority cell-mate
  *     clears the cosine threshold. Cross-cell near-dups are out of scope
  *     BY DESIGN (that is SemDeDup's documented approximation; the
  *     lexical family and q32's sign-LSH cover the global modalities).
  *
  * Not SQL-portable (learned centroids), so q102 is rows-only in the gate;
  * SemanticDedupSpec pins exact within-cell parity against an independent
  * brute-force implementation, determinism across runs, and the
  * keep-most-central invariant.
  */
object SemanticDedup {

  type Q = (SparkSession, String) => DataFrame

  /** Per-vector verdicts: (cell, vec_id, rk, dropped). `rk` is the
    * intra-cell priority (1 = most central = never dropped); a vector is
    * dropped iff a cell-mate with smaller rk has cosine ≥ tau to it. */
  def verdicts(emb: DataFrame, nList: Int, tau: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = ProductQuantization.trainCoarse(emb, nList)
    val assigned = emb.select(col("vec_id"), col("embedding"),
      ProductQuantization.cellExpr(spark, cents)(col("embedding")).as("cell"))
    val centDF = broadcast(
      cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid"))
    val ranked = assigned.join(centDF, Seq("cell"))
      .withColumn("csim",
        round(graft.functions.CosineSimilarity(col("embedding"), col("centroid")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("cell").orderBy(desc("csim"), col("vec_id"))))
      .drop("centroid", "csim")
    val u = ranked.select(col("cell"), col("embedding").as("u_emb"),
      col("rk").as("u_rk"))
    val v = ranked.select(col("cell"), col("vec_id").as("v_id"),
      col("embedding").as("v_emb"), col("rk").as("v_rk"))
    val droppedIds = u.join(v, Seq("cell"))
      .filter(col("u_rk") < col("v_rk"))
      .filter(graft.functions.CosineSimilarity(col("u_emb"), col("v_emb")) >= tau)
      .select(col("v_id")).distinct()
      .withColumn("dropped", lit(true))
    ranked.select(col("cell"), col("vec_id"), col("rk"))
      .join(droppedIds.withColumnRenamed("v_id", "vec_id"), Seq("vec_id"), "left")
      .na.fill(false, Seq("dropped"))
  }

  /** q102: per-cell semantic-dedup summary — cluster size, dropped count,
    * keep fraction. The curation-dashboard view of [[verdicts]]. */
  /** nList ≤ 0 → sized by [[ProductQuantization.adaptiveNList]] (the IVF
    * contract: cell size stays fixed as the corpus grows; at the sf0.01
    * gate the adaptive value IS 16, so gate outputs are unchanged). */
  def q102SemanticDedup(nList: Int = -1, tau: Double = 0.45): Q = (s, d) => {
    val emb = embeddings(s, d)
    val nl = if (nList > 0) nList else ProductQuantization.adaptiveNList(emb)
    val vs = verdicts(emb, nl, tau)
    vs.groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"))
      .select(col("cell"), col("n_vecs"), col("n_dropped"),
        round((col("n_vecs") - col("n_dropped")).cast("double") / col("n_vecs"), 6)
          .as("keep_frac"))
      .orderBy("cell")
  }

  val queries: Map[String, Q] = Map(
    "q102_semantic_dedup" -> q102SemanticDedup(),
  )
  // Learned centroids aren't SQL-portable — rows-only in the gate;
  // SemanticDedupSpec carries the exact within-cell parity evidence.
  val oracle: Map[String, String] = Map.empty
}
