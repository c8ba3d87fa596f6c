package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Full-corpus kNN graph: every vector's top-k nearest neighbors by
  * cosine — the workhorse behind kNN-graph clustering, graph label
  * propagation, SemDeDup-style curation, and NN-descent seeding. The
  * existing ANN surface (q29/q30/q33, q81/q83, `ivfTopK`) answers a
  * bounded QUERY PANEL (collected to the driver); here the query set IS
  * the corpus, so nothing may collect and the probe lists must be
  * computed row-wise.
  *
  * Shape (IVF multi-probe self-join):
  *  1. coarse centroids from the engine's own deterministic sampled-
  *     Lloyd's trainer, broadcast (nList × dim — tiny at any scale);
  *  2. index side: every vector assigned to its ONE nearest cell
  *     ([[ProductQuantization.cellExpr]], narrow);
  *  3. probe side: every vector exploded to its nProbe nearest cells
  *     ([[ProductQuantization.probeExpr]] — the per-row twin of the
  *     driver-side probe list, same tie-break);
  *  4. equi-join ON CELL (each target lives in exactly one cell, so no
  *     candidate dedup is needed), native codegen'd cosine rescoring,
  *     per-source top-k via a rank window that Spark 4 pushes down to a
  *     map-side WindowGroupLimit before the src_id exchange.
  *
  * Cost: Σ_probes |cell| ≈ N · nProbe · |cell| — linear in N when nList
  * grows with the corpus (the IVF contract everywhere in this engine);
  * never an N² pair set. Recall is the standard IVF trade: misses only
  * neighbors whose cell the source didn't probe (KnnGraphSpec measures
  * it against the exact graph and pins a floor; raising nProbe buys
  * recall linearly in cost).
  *
  * Learned centroids aren't SQL-portable → rows-only in the gate;
  * KnnGraphSpec carries exact-recall, determinism, degree and
  * self-exclusion evidence.
  */
object KnnGraph {

  type Q = (SparkSession, String) => DataFrame

  /** Top-k cosine neighbor edges (src_id, nbr_id, sim, rk) for every
    * vector in `emb`. */
  def knnEdges(emb: DataFrame, k: Int, nList: Int, nProbe: Int): DataFrame = {
    val spark = emb.sparkSession
    val cents = ProductQuantization.trainCoarse(emb, nList)
    val index = emb.select(col("vec_id"), col("embedding"),
      ProductQuantization.cellExpr(spark, cents)(col("embedding")).as("cell"))
    val probes = emb.select(col("vec_id").as("src_id"),
      col("embedding").as("src_emb"),
      explode(ProductQuantization.probeExpr(spark, cents, nProbe)(col("embedding")))
        .as("cell"))
    // project the embeddings AWAY before the rank window: the candidate
    // set is the big intermediate (N·nProbe·|cell| rows), and dragging
    // two dim-sized float arrays per row through the window exchange
    // multiplies the shuffle by ~30× (soaked: 100k vecs, 200M candidates
    // — the 3-column form shuffles ~5 GB, the with-vectors form ~150 GB)
    val cand = probes.join(index, Seq("cell"))
      .filter(col("src_id") =!= col("vec_id"))
      .select(col("src_id"), col("vec_id"),
        round(graft.functions.CosineSimilarity(col("src_emb"), col("embedding")), 6)
          .as("sim"))
    val w = Window.partitionBy("src_id").orderBy(desc("sim"), col("vec_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("src_id"), col("vec_id").as("nbr_id"), col("sim"), col("rk"))
  }

  /** q103: the kNN-graph edge list over the embeddings table, ordered for
    * the gate. nList ≤ 0 → sized by
    * [[ProductQuantization.adaptiveNList]] (fixed cell size as the
    * corpus grows — the contract all the O(N·|cell|) claims rest on; at
    * the sf0.01 gate the adaptive value IS 16, so outputs are
    * unchanged). */
  def q103KnnGraph(k: Int = 5, nList: Int = -1, nProbe: Int = 4): Q = (s, d) => {
    val emb = embeddings(s, d)
    val nl = if (nList > 0) nList else ProductQuantization.adaptiveNList(emb)
    knnEdges(emb, k, nl, nProbe).orderBy("src_id", "rk")
  }

  /** Semantic clusters: connected components over the kNN graph's
    * τ-thresholded edges — the grouping form of the graph (SemDeDup's
    * "semantic cluster" unit, and the embedding twin of q42's lexical
    * dedup clusters). Reuses the dedup engine's component machinery
    * ([[DedupOps.connectedComponents]]: bounded driver union-find under
    * the edge cap, pointer-jumped label propagation above it), so the
    * scale story is already soak-proven; the edge set is the kNN graph's
    * (≤ k·N rows) filtered by similarity — never a pair enumeration.
    * Labels are the component's minimum vec_id (deterministic). */
  def semanticClusters(emb: DataFrame, k: Int, nList: Int, nProbe: Int,
                       tau: Double): DataFrame = {
    val edges = knnEdges(emb, k, nList, nProbe)
      .filter(col("sim") >= tau)
      .select(col("src_id").as("doc_a"), col("nbr_id").as("doc_b"))
    DedupOps.connectedComponents(emb.select(col("vec_id").as("doc_id")), edges)
      .select(col("doc_id").as("vec_id"), col("component"))
  }

  /** q105: per-vector semantic-cluster assignment over the embeddings
    * table, ordered for the gate. nProbe defaults lower than q103's:
    * cluster edges only need the τ-thresholded HIGH-similarity
    * neighbors, which are overwhelmingly same-cell (SemDeDup itself
    * probes one cell) — extra probes buy tail recall the τ filter
    * discards anyway. */
  def q105SemanticClusters(k: Int = 5, nList: Int = -1, nProbe: Int = 2,
                           tau: Double = 0.40): Q = (s, d) => {
    val emb = embeddings(s, d)
    val nl = if (nList > 0) nList else ProductQuantization.adaptiveNList(emb)
    semanticClusters(emb, k, nl, nProbe, tau).orderBy("vec_id")
  }

  /** q107: diversity-preserving subset — at most `m` vectors per
    * semantic cluster, selected by the content-addressed uniform key
    * (q106's construction with unit weight: rank by md5₃₂(vec_id), so
    * the within-cluster choice is deterministic, engine-portable, and
    * stable under corpus growth). This is the cluster-balanced pruning
    * step of the SemDeDup/DataComp line: dropping whole near-duplicate
    * neighborhoods down to m representatives bounds how much any one
    * semantic template can dominate the training mix — the
    * embedding-space complement of q85's source-level temperature
    * reweighting. One rank window over q105's assignment; the cluster
    * key is component-min vec_id, high-cardinality, so the window
    * parallelizes and WindowGroupLimit prunes map-side. */
  def q107DiversitySample(m: Int = 3, k: Int = 5, nList: Int = -1,
                          nProbe: Int = 2, tau: Double = 0.40): Q = (s, d) => {
    val emb = embeddings(s, d)
    val nl = if (nList > 0) nList else ProductQuantization.adaptiveNList(emb)
    val u = conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val w = Window.partitionBy("component").orderBy(col("key"), col("vec_id"))
    semanticClusters(emb, k, nl, nProbe, tau)
      .select(col("vec_id"), col("component"), u.as("key"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= m)
      .select(col("vec_id"), col("component"), col("rk"))
      .orderBy("component", "rk")
  }

  val queries: Map[String, Q] = Map(
    "q103_knn_graph" -> q103KnnGraph(),
    "q105_semantic_clusters" -> q105SemanticClusters(),
    "q107_diversity_sample" -> q107DiversitySample(),
  )
  // Learned centroids aren't SQL-portable — rows-only in the gate;
  // KnnGraphSpec pins recall vs the exact graph, determinism, and shape.
  val oracle: Map[String, String] = Map.empty
}
