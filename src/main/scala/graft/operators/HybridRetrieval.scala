package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** q117: hybrid lexical + vector retrieval with reciprocal-rank fusion —
  * the standard two-tower RAG serving shape: a lexical ranker (token-set
  * Jaccard against the query document) and a semantic ranker (cosine over
  * the id-aligned embedding) each produce a top-N list, and the final
  * order is RRF: score(d) = Σ_rankers 1/(60 + rank_r(d)) (Cormack et al.
  * 2009's k = 60), which needs no score calibration between rankers.
  *
  * Scale shape: BOTH rankers are broadcast-panel passes (|queries| tiny):
  * the lexical side distinct-tokenizes the corpus once and scores
  * |queries|×|docs| set overlaps in one codegen'd pass; the semantic side
  * is q33's broadcast cosine. Each ranker top-N's via a per-query rank
  * window (WindowGroupLimit-pruned), the two lists full-outer join on
  * (query, candidate) — ≤ 2N rows per query — and fusion arithmetic is
  * exact: ranks are integers, 1/(60+rk) is rounded to 6dp before the
  * (at-most-two-term) sum, so cross-engine order is bit-stable.
  *
  * The fused list is deliberately computed from ranks, not raw scores —
  * the property RRF exists for: a ranker whose score scale drifts (new
  * embedding model, different lexical weighting) cannot dominate fusion.
  */
object HybridRetrieval {

  type Q = (SparkSession, String) => DataFrame

  val q117HybridRrf: Q = (s, d) => {
    val topN = 20
    val docs = documents(s, d)
    val emb = embeddings(s, d)
    val qIds = Seq(0L, 1L, 2L)

    // --- lexical ranker: distinct-token Jaccard vs the query document
    val toks = docs.select(col("doc_id"),
      array_distinct(TextOps.tokens(col("text"))).as("ts"))
    val qTok = broadcast(toks.filter(col("doc_id").isInCollection(qIds))
      .select(col("doc_id").as("query_id"), col("ts").as("qts")))
    val lexScored = qTok.join(toks, col("query_id") =!= col("doc_id"))
      .select(col("query_id"), col("doc_id").as("cand"),
        round(size(array_intersect(col("qts"), col("ts"))).cast("double") /
          size(array_union(col("qts"), col("ts"))), 6).as("lex_sim"))
    val wl = Window.partitionBy("query_id").orderBy(desc("lex_sim"), col("cand"))
    val lex = lexScored.withColumn("rk_lex", row_number().over(wl))
      .filter(col("rk_lex") <= topN).select("query_id", "cand", "rk_lex")

    // --- semantic ranker: cosine over the id-aligned embeddings
    val qv = broadcast(emb.filter(col("vec_id").isInCollection(qIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val vecScored = qv.join(
      emb.select(col("vec_id").as("cand"), col("embedding").as("tv")),
      col("query_id") =!= col("cand"))
      .select(col("query_id"), col("cand"),
        round(graft.functions.CosineSimilarity(col("qv"), col("tv")), 6)
          .as("vec_sim"))
    val wv = Window.partitionBy("query_id").orderBy(desc("vec_sim"), col("cand"))
    val vec = vecScored.withColumn("rk_vec", row_number().over(wv))
      .filter(col("rk_vec") <= topN).select("query_id", "cand", "rk_vec")

    // --- reciprocal-rank fusion over the union of the two lists
    val fusedScore =
      round(coalesce(round(lit(1.0) / (lit(60) + col("rk_lex")), 6), lit(0.0)) +
        coalesce(round(lit(1.0) / (lit(60) + col("rk_vec")), 6), lit(0.0)), 6)
    val wf = Window.partitionBy("query_id").orderBy(desc("rrf"), col("cand"))
    lex.join(vec, Seq("query_id", "cand"), "full_outer")
      .withColumn("rrf", fusedScore)
      .withColumn("rk", row_number().over(wf))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("cand"), col("rk_lex"), col("rk_vec"),
        col("rrf"), col("rk"))
      .orderBy("query_id", "rk")
  }

  val q117Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_distinct(string_split_regex(TRIM(text), '\s+')) AS ts
      |  FROM documents),
      |qtok AS (SELECT doc_id AS query_id, ts AS qts FROM toks WHERE doc_id < 3),
      |lexs AS (
      |  SELECT query_id, t.doc_id AS cand,
      |    ROUND(len(list_intersect(qts, ts))
      |          / CAST(len(list_distinct(list_concat(qts, ts))) AS DOUBLE), 6)
      |      AS lex_sim
      |  FROM qtok JOIN toks t ON query_id <> t.doc_id),
      |lex AS (SELECT query_id, cand, rk_lex FROM (
      |  SELECT query_id, cand,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY lex_sim DESC, cand) AS rk_lex
      |  FROM lexs) WHERE rk_lex <= 20),
      |qv AS (SELECT vec_id AS query_id, embedding AS qv
      |       FROM embeddings WHERE vec_id < 3),
      |vecs AS (
      |  SELECT query_id, t.vec_id AS cand,
      |    ROUND(
      |      list_sum(list_transform(range(1, len(qv) + 1),
      |               i -> CAST(qv[i] AS DOUBLE) * CAST(t.embedding[i] AS DOUBLE)))
      |      / (SQRT(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |         * SQRT(list_sum(list_transform(t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
      |      AS vec_sim
      |  FROM qv JOIN embeddings t ON query_id <> t.vec_id),
      |vec AS (SELECT query_id, cand, rk_vec FROM (
      |  SELECT query_id, cand,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY vec_sim DESC, cand) AS rk_vec
      |  FROM vecs) WHERE rk_vec <= 20),
      |fused AS (
      |  SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
      |    COALESCE(lex.cand, vec.cand) AS cand, rk_lex, rk_vec,
      |    ROUND(COALESCE(ROUND(1.0 / (60 + rk_lex), 6), 0.0)
      |        + COALESCE(ROUND(1.0 / (60 + rk_vec), 6), 0.0), 6) AS rrf
      |  FROM lex FULL OUTER JOIN vec USING (query_id, cand))
      |SELECT query_id, cand, rk_lex, rk_vec, rrf, rk FROM (
      |  SELECT query_id, cand, rk_lex, rk_vec, rrf,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY rrf DESC, cand) AS rk
      |  FROM fused) WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  val queries: Map[String, Q] = Map("q117_hybrid_rrf" -> q117HybridRrf)
  val oracle: Map[String, String] = Map("q117_hybrid_rrf" -> q117Sql)
}
