package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** q82: the end-to-end corpus-preparation pipeline as ONE composed plan —
  * the actual program a training-data user runs, where every stage is an
  * operator the engine already gates individually:
  *
  *   clean (q47 normalize) → exact dedup (q24 content hash, first doc_id
  *   wins) → quality keep-rule (q47) → stratified content-addressed
  *   sample (q50 rates) → sequence packing (q76 bins over CLEANED tokens)
  *
  * Gate value is the COMPOSITION: stage order changes the answer (dedup
  * before sampling, packing over the cleaned token stream), so a
  * hash-exact cross-engine match proves the stages compose without
  * hidden re-ordering or double-counting — the property a user relies on
  * when they chain the library's operators.
  *
  * Plan shape at scale: stages 1–4 are narrow (projection + filter) except
  * the dedup window (one hash exchange on the 128-bit content key); the
  * packing stage is the two-level prefix sum (PackingOps.packSummary):
  * one high-cardinality (source, doc_id-group) exchange plus constant-size
  * subtotal/offset exchanges — no per-source single-task window; the final
  * aggregation is map-side combinable. Two FULL-data shuffles + the output
  * sort, total, for a five-stage pipeline — what the declarative
  * composition buys.
  */
object CorpusPipeline {

  type Q = (SparkSession, String) => DataFrame

  // single-sourced from the q76 operator so the composed pipeline can't
  // drift from the stage it claims to compose
  private def budget = PackingOps.SeqBudget

  val q82E2ePipeline: Q = (s, d) => {
    // 1. clean: lowercase, non-alnum → space, collapse; cleaned tokens
    val cleaned = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val base = documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), cleaned.as("ct"))
      .withColumn("tok", size(split(col("ct"), " ")))
      .withColumn("alpha",
        length(regexp_replace(col("ct"), "[^a-z]", "")).cast("double")
          / greatest(length(col("ct")), lit(1)))
    // 2. exact dedup on cleaned content: lowest doc_id per hash survives
    val wDedup = Window.partitionBy("chash").orderBy("doc_id")
    val deduped = base
      .withColumn("chash", md5(col("ct")))
      .withColumn("rn", row_number().over(wDedup))
      .filter(col("rn") === 1)
    // 3. quality keep-rule (q47): ≥10 cleaned tokens, ≥25% alphabetic
    val kept = deduped.filter(col("tok") >= 10 && col("alpha") >= 0.25)
    // 4. stratified content-addressed sample (q50 rates)
    val h1 = substring(md5(col("doc_id").cast("string")), 1, 1)
    val thr = when(col("lang") === "en", "8")
      .when(col("lang").isin("zh", "es"), "4").otherwise("2")
    val sampled = kept.filter(h1 < thr)
    // 5. pack the survivors' cleaned tokens (the SAME stage q76 runs —
    //    shared code, shared budget)
    PackingOps.packSummary(sampled.select(col("doc_id"), col("source"), col("tok")))
  }

  val q82Sql: String =
    s"""WITH base AS (
       |  SELECT doc_id, lang, source,
       |    TRIM(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g')) AS ct
       |  FROM documents),
       |feat AS (
       |  SELECT doc_id, lang, source, ct,
       |    LEN(string_split(ct, ' ')) AS tok,
       |    CAST(LENGTH(regexp_replace(ct, '[^a-z]', '', 'g')) AS DOUBLE)
       |      / GREATEST(LENGTH(ct), 1) AS alpha
       |  FROM base),
       |dedup AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(ct) ORDER BY doc_id) AS rn
       |  FROM feat),
       |kept AS (
       |  SELECT doc_id, lang, source, tok FROM dedup
       |  WHERE rn = 1 AND tok >= 10 AND alpha >= 0.25),
       |sampled AS (
       |  SELECT doc_id, source, tok FROM kept
       |  WHERE SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 1) <
       |    CASE WHEN lang = 'en' THEN '8'
       |         WHEN lang IN ('zh', 'es') THEN '4' ELSE '2' END),
       |packed AS (
       |  SELECT source, tok,
       |    COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
       |  FROM sampled)
       |SELECT source, CAST(prev // $budget AS BIGINT) AS bin,
       |  COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tok_sum
       |FROM packed GROUP BY source, bin ORDER BY source, bin""".stripMargin

  val queries: Map[String, Q] = Map("q82_e2e_pipeline" -> q82E2ePipeline)
  val oracle: Map[String, String] = Map("q82_e2e_pipeline" -> q82Sql)
}
