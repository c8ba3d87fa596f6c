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
  * Correctness evidence is two-layered: the q102 GATE runs the operator
  * under the SQL-expressible [[refinedCentroids]] and is hash-exact vs a DuckDB
  * oracle that replays the full verdict machinery (cell argmin, centroid-
  * cosine ranking, rank-ordered pairwise drop) term-for-term; the TRAINED
  * quantizer path ([[verdicts]]) keeps SemanticDedupSpec's exact
  * within-cell parity against an independent brute-force implementation,
  * determinism across runs, and the keep-most-central invariant.
  */
object SemanticDedup {

  type Q = (SparkSession, String) => DataFrame

  /** Per-vector verdicts: (cell, vec_id, rk, dropped). `rk` is the
    * intra-cell priority (1 = most central = never dropped); a vector is
    * dropped iff a cell-mate with smaller rk has cosine ≥ tau to it. */
  def verdicts(emb: DataFrame, nList: Int, tau: Double): DataFrame =
    verdictsWithCents(emb, ProductQuantization.trainCoarse(emb, nList), tau)

  /** [[verdicts]] under EXTERNALLY supplied centroids — the same operator
    * body (the quantizer is an input everywhere downstream of training),
    * which is what lets the q102 gate run on the SQL-expressible
    * sampled+refined centroids and be hash-exact while the trained path
    * keeps its spec parity evidence. */
  def verdictsWithCents(emb: DataFrame, cents: Array[Array[Float]],
                        tau: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
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

  /** Cross-cell escape hatch for SemDeDup's documented approximation: a
    * near-duplicate pair that STRADDLES a cell boundary is invisible to
    * [[verdictsWithCents]] (its pairwise test is scoped to one cell).
    * Here the CANDIDATE side probes its `nProbe` nearest cells (the
    * per-row [[ProductQuantization.probeExpr]] list — q103's machinery)
    * while the index side stays one cell per vector, so cost is
    * O(N·nProbe·|cell|), the kNN-graph contract, never a pair set.
    *
    * The drop rule generalizes the intra-cell rank to a GLOBAL priority:
    * u beats v iff (u.csim > v.csim) or (tie on csim and u.vec_id <
    * v.vec_id), where csim is each vector's cosine to ITS OWN assigned
    * centroid (rounded to 6dp like the ranking). Within one cell this
    * ordering IS the rk order, so at nProbe = 1 the verdicts reduce to
    * [[verdictsWithCents]] exactly (spec-pinned); extra probes can only
    * ADD drops — each a boundary-straddling near-dup the single-probe
    * form misses (SemanticDedupSpec measures the missed-duplicate
    * fraction against brute force on a planted boundary corpus). */
  def verdictsMultiProbe(emb: DataFrame, cents: Array[Array[Float]],
                         tau: Double, nProbe: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val assigned = emb.select(col("vec_id"), col("embedding"),
      ProductQuantization.cellExpr(spark, cents)(col("embedding")).as("cell"))
    val centDF = broadcast(
      cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid"))
    val ranked = assigned.join(centDF, Seq("cell"))
      .withColumn("csim",
        round(graft.functions.CosineSimilarity(col("embedding"), col("centroid")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("cell").orderBy(desc("csim"), col("vec_id"))))
      .drop("centroid")
    val u = ranked.select(col("cell"), col("vec_id").as("u_id"),
      col("embedding").as("u_emb"), col("csim").as("u_csim"))
    val v = ranked.select(col("vec_id").as("v_id"),
      col("embedding").as("v_emb"), col("csim").as("v_csim"),
      explode(ProductQuantization.probeExpr(spark, cents, nProbe)(col("embedding")))
        .as("cell"))
    val droppedIds = v.join(u, Seq("cell"))
      .filter(col("u_csim") > col("v_csim") ||
        (col("u_csim") === col("v_csim") && col("u_id") < col("v_id")))
      .filter(graft.functions.CosineSimilarity(col("u_emb"), col("v_emb")) >= tau)
      .select(col("v_id")).distinct()
      .withColumn("dropped", lit(true))
    ranked.select(col("cell"), col("vec_id"), col("rk"))
      .join(droppedIds.withColumnRenamed("v_id", "vec_id"), Seq("vec_id"), "left")
      .na.fill(false, Seq("dropped"))
  }

  /** Deterministic SAMPLED quantizer: centroid c = the embedding of the
    * corpus vector with the (c+1)-th smallest md5(vec_id) — the engine's
    * content-addressed sampling (the same selection trainCoarse's
    * training sample uses) with Lloyd's iterations REMOVED. Three
    * properties at once:
    *  - SQL-expressible: the identical centroid table is one ORDER BY
    *    md5 LIMIT nList CTE over the same parquet, so the DuckDB oracle
    *    replays cell assignment bit-for-bit (stored floats are exact in
    *    both engines) and the gates are hash-checkable;
    *  - data-adaptive: centroids are drawn FROM the corpus, so cell
    *    sizes track the data's cluster mass (k-means-init quality — a
    *    round-11 fixed arbitrary grid was tried first and collapsed the
    *    cell balance at soak scale: >10 min for q103 at 100k vectors vs
    *    ~30 s trained, because the data manifold ignored the grid);
    *  - deterministic and stable under corpus growth, like every other
    *    content-addressed selection in the engine.
    * What the gate proves exactly is the whole verdict MACHINERY (argmin
    * cell assignment with tie-to-lowest, centroid-cosine ranking, the
    * rank-ordered pairwise drop rule); the TRAINED quantizer (Lloyd's on
    * the sample) stays the production path, spec-gated in
    * SemanticDedupSpec/KnnGraphSpec. */
  def sampledCentroids(emb: DataFrame, nList: Int): Array[Array[Float]] =
    emb.select(col("vec_id"), col("embedding"))
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h").limit(nList)
      .collect().map(_.getSeq[Float](1).toArray)

  /** [[sampledCentroids]] plus ONE distributed Lloyd refinement step:
    * assign every vector to its nearest seed, replace each centroid by
    * its cell's per-dimension mean. The means go through DECIMAL(38,12)
    * sums (the q61 pattern), so they are ORDER-FREE and the whole step —
    * unlike full Lloyd's, whose float means depend on accumulation
    * order — replays exactly in the DuckDB oracle. One step closes most
    * of the balance gap between raw corpus seeds and the trained
    * quantizer (measured at 100k soak vectors: q103 74.5 s on raw seeds
    * vs ~30 s trained; a refined single step sits close to trained), and
    * the Spark side is one narrow assignment pass + one
    * (nList·dim)-group aggregate — nothing corpus-sized shuffles. A cell
    * that catches no vectors keeps its seed. */
  def refinedCentroids(emb: DataFrame, nList: Int): Array[Array[Float]] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val seeds = sampledCentroids(emb, nList)
    val assigned = emb.select(col("embedding"),
      ProductQuantization.cellExpr(emb.sparkSession, seeds)(col("embedding")).as("cell"))
    val means = assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("x", col("x").cast(DoubleType))
      .groupBy("cell", "pos")
      .agg((sum(col("x").cast(DecimalType(38, 12))).cast(DoubleType) /
        count(lit(1))).as("m"))
      .collect()
    val out = seeds.map(_.clone())
    means.foreach(r => out(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat)
    out
  }

  /** q102: per-cell semantic-dedup summary — cluster size, dropped count,
    * keep fraction. The curation-dashboard view of [[verdicts]], run over
    * the SQL-expressible [[refinedCentroids]] so the gate is hash-exact
    * (round-10 verdict stretch task); [[verdicts]] with TRAINED centroids
    * is the production form, spec-gated (SemanticDedupSpec brute-force
    * parity + determinism) and exercised by q103/q105/q107. */
  def q102SemanticDedup(nList: Int = -1, tau: Double = 0.45): Q = (s, d) => {
    val emb = embeddings(s, d)
    // nList ≤ 0 → adaptiveNList, preserving the fixed-cell-size scale
    // contract when the same wrapper runs on a soak corpus; the oracle
    // SQL re-derives nList from COUNT(embeddings) with the same formula
    val nl = if (nList > 0) nList else ProductQuantization.adaptiveNList(emb)
    val vs = verdictsWithCents(emb, refinedCentroids(emb, nl), tau)
    vs.groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"))
      .select(col("cell"), col("n_vecs"), col("n_dropped"),
        round((col("n_vecs") - col("n_dropped")).cast("double") / col("n_vecs"), 6)
          .as("keep_frac"))
      .orderBy("cell")
  }

  /** The refined-sampled-centroid CTE chain shared by every converted
    * gate oracle (q102 here, q103/q105/q107 in [[KnnGraph]], q83 in
    * [[SimilarityOps]]): content-addressed seeds → assignment under the
    * seeds → per-cell DECIMAL(38,12) means (order-free, the q61 pattern)
    * → `cents` = refined centroids, seeds kept for empty cells. Mirrors
    * [[refinedCentroids]] term for term. */
  /** `nList <= 0` → the oracle derives the seed count from the corpus
    * itself, replaying [[ProductQuantization.adaptiveNList]]'s
    * min(4096, max(16, ceil(N/500))) formula as a LIMIT expression —
    * so gate parity holds at ANY scale factor, not only while the
    * engine's adaptive value sits at its 16 floor (N ≤ 8000 vectors;
    * the round-13 ADVICE divergence on q144). A positive `nList` stays
    * a literal for callers that pin the seed count explicitly. */
  private[operators] def refinedCentsSql(nList: Int): String = {
    val limitExpr =
      if (nList > 0) nList.toString
      else "LEAST(4096, GREATEST(16, CAST(CEIL(" +
        "(SELECT COUNT(*) FROM embeddings) / 500.0) AS BIGINT)))"
    s"""seeds AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS c,
       |         embedding AS cent
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $limitExpr) sd),
       |sdist AS (
       |  SELECT e.vec_id, s.c,
       |    list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cent[i] AS DOUBLE))
       |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cent[i] AS DOUBLE)))) AS d
       |  FROM embeddings e CROSS JOIN seeds s),
       |sassign AS (
       |  SELECT vec_id, c FROM (
       |    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |    FROM sdist) sx WHERE rn = 1),
       |selem AS (
       |  SELECT a.c,
       |    CAST(unnest(range(len(e.embedding))) AS INT) AS pos,
       |    CAST(unnest(e.embedding) AS DOUBLE) AS x
       |  FROM sassign a JOIN embeddings e USING (vec_id)),
       |cmeans AS (
       |  SELECT c, pos,
       |    CAST(CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS FLOAT) AS m
       |  FROM selem GROUP BY c, pos),
       |refined AS (SELECT c, list(m ORDER BY pos) AS cent FROM cmeans GROUP BY c),
       |cents AS (
       |  SELECT s.c, COALESCE(r.cent, s.cent) AS cent
       |  FROM seeds s LEFT JOIN refined r USING (c))"""
  }

  private val q102Sql: String = {
    val (nList, tau) = (-1, 0.45)
    // the exact arithmetic of the Spark side, term for term: distances and
    // cosines accumulate left-to-right in doubles over float inputs (the
    // q114-established parity pattern); ties on distance break to the
    // lowest cell id like cellExpr's strict < scan
    def cos(a: String, b: String) =
      s"""(list_sum(list_transform(range(1, len($a) + 1),
         |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
         |  / (SQRT(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |     * SQRT(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))"""
    s"""WITH ${refinedCentsSql(nList)},
       |dist AS (
       |  SELECT e.vec_id, c.c,
       |    list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE))
       |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE)))) AS d
       |  FROM embeddings e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, c AS cell FROM (
       |    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |    FROM dist) x WHERE rn = 1),
       |ranked AS (
       |  SELECT a.cell, e.vec_id, e.embedding,
       |    ROW_NUMBER() OVER (PARTITION BY a.cell
       |      ORDER BY ROUND(${cos("e.embedding", "c.cent")}, 6) DESC, e.vec_id) AS rk
       |  FROM embeddings e JOIN assigned a USING (vec_id) JOIN cents c ON c.c = a.cell),
       |dropped AS (
       |  SELECT DISTINCT v.vec_id FROM ranked u JOIN ranked v
       |    ON u.cell = v.cell AND u.rk < v.rk
       |  WHERE ${cos("u.embedding", "v.embedding")} >= $tau)
       |SELECT cell, COUNT(*) AS n_vecs,
       |  CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped,
       |  ROUND(CAST(COUNT(*) - COUNT(d.vec_id) AS DOUBLE) / COUNT(*), 6) AS keep_frac
       |FROM ranked r LEFT JOIN dropped d USING (vec_id)
       |GROUP BY cell ORDER BY cell""".stripMargin
  }

  /** q124: the cross-cell escape hatch as a gate — q102's per-cell
    * summary computed from [[verdictsMultiProbe]] (nProbe = 2) under the
    * SQL-expressible [[refinedCentroids]], so the boundary-straddling
    * drop rule itself is hash-checked against an oracle that replays the
    * probe lists (drank rn ≤ nProbe — q103's CTE) and the global
    * (csim, vec_id) priority term for term. q102 stays the single-probe
    * reference gate, unchanged. */
  def q124SemanticDedupXcell(nList: Int = -1, tau: Double = 0.45,
                             nProbe: Int = 2): Q = (s, d) => {
    val emb = embeddings(s, d)
    val nl = if (nList > 0) nList else ProductQuantization.adaptiveNList(emb)
    val vs = verdictsMultiProbe(emb, refinedCentroids(emb, nl), tau, nProbe)
    vs.groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"))
      .select(col("cell"), col("n_vecs"), col("n_dropped"),
        round((col("n_vecs") - col("n_dropped")).cast("double") / col("n_vecs"), 6)
          .as("keep_frac"))
      .orderBy("cell")
  }

  private val q124Sql: String = {
    val (nList, tau, nProbe) = (-1, 0.45, 2)
    def cos(a: String, b: String) =
      s"""(list_sum(list_transform(range(1, len($a) + 1),
         |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
         |  / (SQRT(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |     * SQRT(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))"""
    s"""WITH ${refinedCentsSql(nList)},
       |dist AS (
       |  SELECT e.vec_id, c.c,
       |    list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE))
       |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE)))) AS d
       |  FROM embeddings e CROSS JOIN cents c),
       |drank AS (
       |  SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |  FROM dist),
       |assigned AS (SELECT vec_id, c AS cell FROM drank WHERE rn = 1),
       |probes AS (SELECT vec_id AS src_id, c AS cell FROM drank WHERE rn <= $nProbe),
       |ranked AS (
       |  SELECT a.cell, e.vec_id, e.embedding,
       |    ROUND(${cos("e.embedding", "c.cent")}, 6) AS csim
       |  FROM embeddings e JOIN assigned a USING (vec_id) JOIN cents c ON c.c = a.cell),
       |dropped AS (
       |  SELECT DISTINCT v.vec_id
       |  FROM probes p
       |  JOIN ranked v ON v.vec_id = p.src_id
       |  JOIN ranked u ON u.cell = p.cell
       |  WHERE (u.csim > v.csim OR (u.csim = v.csim AND u.vec_id < v.vec_id))
       |    AND ${cos("u.embedding", "v.embedding")} >= $tau)
       |SELECT cell, COUNT(*) AS n_vecs,
       |  CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped,
       |  ROUND(CAST(COUNT(*) - COUNT(d.vec_id) AS DOUBLE) / COUNT(*), 6) AS keep_frac
       |FROM ranked r LEFT JOIN dropped d USING (vec_id)
       |GROUP BY cell ORDER BY cell""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q102_semantic_dedup" -> q102SemanticDedup(),
    "q124_semdedup_xcell" -> q124SemanticDedupXcell(),
  )
  val oracle: Map[String, String] = Map(
    "q102_semantic_dedup" -> q102Sql,
    "q124_semdedup_xcell" -> q124Sql,
  )
}
