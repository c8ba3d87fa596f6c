package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Exact substring-span deduplication: the sliding-window twin of the
  * shingle/MinHash family. A doc's K-token gram at position i duplicates
  * another doc iff the SAME K tokens appear contiguously in BOTH — the
  * "exact substring" dedup modality (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better"), which catches verbatim
  * boilerplate/quotation overlap that whole-doc hashing (q24) misses and
  * near-dup sketches (q26–q28) only approximate. Instead of a suffix
  * array (inherently sequential), the distributed shape is positional
  * gram counting:
  *
  *   1. explode each doc into its size−K+1 sliding K-grams — rows ∝
  *      total token count, the same budget as the shingle family;
  *   2. collapse to one row per (gram, doc) carrying the within-doc
  *      position count — the FIRST shuffle keys on (gram, doc_id), so a
  *      boilerplate gram shared by a million docs still spreads over the
  *      cluster instead of hot-keying one reducer;
  *   3. per-gram distinct-doc count via a second, map-side-collapsing
  *      aggregate (reducers see per-mapper partials, not raw rows);
  *   4. join the (small — only cross-doc-duplicated grams survive the
  *      nd>1 filter) dup set back onto the collapsed rows. AQE can
  *      broadcast it at runtime; a skewed probe side splits cleanly
  *      because the build side has exactly one row per gram;
  *   5. re-aggregate per doc, then per source: span coverage as pure
  *      longs (position counts), hash-exact across engines.
  *
  * No pair set is ever materialized — coverage is a per-position
  * property, so an N-doc template cluster costs O(N·positions), never
  * O(N²).
  *
  * The gate path keys steps 2–4 on the gram STRING (DuckDB-replayable);
  * production sets `hashedKeys=true` and shuffles 8-byte xxhash64 keys
  * instead of ~80-byte strings — the same oracle-path/fast-path split as
  * q26/q84 (md5 vs fused MinHash).
  */
object SubstrDedup {

  type Q = (SparkSession, String) => DataFrame

  /** Span width in tokens. 12 is small enough that the sf0.01 synthetic
    * corpus has real cross-doc spans to find, large enough that chance
    * 12-gram collisions in natural text are negligible (Lee et al. use
    * 50 BPE tokens ≈ this order of magnitude in words). */
  val DefaultSpanTokens = 12

  /** One row per sliding K-gram position: (doc_id, source, gram).
    * Same repartition contract as [[DedupOps]]' shingle views: a small
    * corpus arrives as one parquet split, and without the explicit count
    * AQE would coalesce the whole gram pipeline onto one core. */
  private def gramPositions(docs: DataFrame, k: Int, hashedKeys: Boolean): DataFrame = {
    require(k >= 2, s"span width $k too small: a 1-token 'span' is just q52's token histogram")
    val nPar = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs
      .repartition(nPar, col("doc_id"))
      .select(col("doc_id"), col("source"), split(trim(col("text")), "\\s+").as("l"))
      .filter(size(col("l")) >= k)
    // The token array is a materialized column (not inlined in the lambda)
    // for the same CSE reason as DedupOps.docShinglesOf.
    val gramsCol = expr(
      s"transform(sequence(1, size(l) - ${k - 1}), i -> concat_ws(' ', slice(l, i, $k)))")
    val g = toks.select(col("doc_id"), col("source"), explode(gramsCol).as("gram"))
    if (hashedKeys) g.withColumn("gram", xxhash64(col("gram"))) else g
  }

  /** Per-source span-coverage audit over any (doc_id, source, text) frame:
    * (source, n_docs, docs_with_dup_span, sum_dup_pos, sum_total_pos).
    * `n_docs` counts docs with ≥k tokens (shorter docs have no spans);
    * `dup_pos` counts gram positions whose gram appears in ≥2 distinct
    * docs. All-long output → hash-exact across engines. */
  def substrSpanCoverage(docs: DataFrame, k: Int = DefaultSpanTokens,
                         hashedKeys: Boolean = false): DataFrame = {
    val g = gramPositions(docs, k, hashedKeys)
    // One row per (gram, doc): shuffle keys include doc_id, so hot grams
    // distribute; n_pos preserves within-doc repetition for the coverage sum.
    val perGramDoc = g.groupBy("gram", "doc_id", "source")
      .agg(count(lit(1)).as("n_pos"))
    // Cross-doc duplicated grams only: input already collapsed to one row
    // per (gram, doc), so count(*) IS the distinct-doc count and the
    // partial aggregate bounds any reducer at ≤ #mappers rows per gram.
    val dupGrams = perGramDoc.groupBy("gram")
      .agg(count(lit(1)).as("nd"))
      .where(col("nd") > 1)
      .select(col("gram"), lit(1).as("isdup"))
    perGramDoc.join(dupGrams, Seq("gram"), "left")
      .groupBy("doc_id", "source")
      .agg(sum("n_pos").as("total_pos"),
           sum(when(col("isdup").isNotNull, col("n_pos")).otherwise(lit(0L))).as("dup_pos"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           count(when(col("dup_pos") > 0, lit(1))).as("docs_with_dup_span"),
           sum("dup_pos").as("sum_dup_pos"),
           sum("total_pos").as("sum_total_pos"))
      .orderBy("source")
  }

  /** q98: exact substring-span dedup audit on the documents table (gate
    * path: gram-string keys, DuckDB-replayable). */
  val q98SubstrSpans: Q = (s, d) => substrSpanCoverage(documents(s, d))

  private val q98Sql: String = {
    val k = DefaultSpanTokens
    s"""WITH t AS (SELECT doc_id, source, string_split_regex(TRIM(text), '\\s+') AS toks
       |           FROM documents),
       |p AS (SELECT doc_id, source, unnest(range(1, len(toks) - ${k - 2})) AS i, toks
       |      FROM t WHERE len(toks) >= $k),
       |g AS (SELECT doc_id, source, array_to_string(toks[i:i+${k - 1}], ' ') AS gram FROM p),
       |d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1),
       |c AS (SELECT g.doc_id, g.source, COUNT(*) AS total_pos, COUNT(d.gram) AS dup_pos
       |      FROM g LEFT JOIN d USING (gram) GROUP BY g.doc_id, g.source)
       |SELECT source, COUNT(*) AS n_docs,
       |  COUNT(*) FILTER (dup_pos > 0) AS docs_with_dup_span,
       |  CAST(SUM(dup_pos) AS BIGINT) AS sum_dup_pos,
       |  CAST(SUM(total_pos) AS BIGINT) AS sum_total_pos
       |FROM c GROUP BY source ORDER BY source""".stripMargin
  }

  val queries: Map[String, Q] = Map("q98_substr_spans" -> q98SubstrSpans)
  val oracle: Map[String, String] = Map("q98_substr_spans" -> q98Sql)
}
