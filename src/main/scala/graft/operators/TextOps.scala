package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, language-ID heuristic, and document
  * fingerprinting — all over the `documents` table.
  *
  * Everything here is narrow (per-row, no shuffle) → embarrassingly parallel
  * at 100 TB: each operator is a single codegen'd projection over the scan,
  * with column pruning down to (doc_id, text).
  */
object TextOps {

  type Q = (SparkSession, String) => DataFrame

  /** Normalized whitespace tokens of `text` (trim + split on runs of
    * whitespace) — the shared tokenizer for all text ops.
    *
    * Empty/whitespace-only input yields `[""]` in BOTH engines (Spark's
    * split keeps the single empty field, same as DuckDB's
    * string_split_regex — pinned by PackingOpsSpec's degenerate-doc case),
    * so token counts stay oracle-consistent on adversarial corpora. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** q20: token counting (SURVEY "token counting" op): whitespace tokens,
    * distinct tokens, char length, and a BPE-ish subword proxy count
    * (runs of letters/digits/punctuation as separate units). */
  val q20TokenStats: Q = (s, d) => {
    documents(s, d).select(
      col("doc_id"),
      length(col("text")).as("n_chars_actual"),
      size(tokens(col("text"))).as("n_tokens"),
      size(array_distinct(tokens(col("text")))).as("n_distinct_tokens"),
      regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).as("n_subwords"))
      .orderBy("doc_id")
  }
  val q20Sql: String =
    """SELECT doc_id,
      |  LENGTH(text) AS n_chars_actual,
      |  LEN(string_split_regex(TRIM(text), '\s+')) AS n_tokens,
      |  LEN(list_distinct(string_split_regex(TRIM(text), '\s+'))) AS n_distinct_tokens,
      |  LEN(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_subwords
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q21: quality scoring — length/punctuation/stopword ratios with a
    * composite score; ratios rounded to 6dp for cross-engine parity. */
  val q21QualityScore: Q = (s, d) => {
    val toks = size(tokens(col("text")))
    val stop = regexp_count(col("text"), lit("\\b(the|a|of|and|to|in|is|it)\\b"))
    val punct = regexp_count(col("text"), lit("[.!?,;:]"))
    documents(s, d).select(
      col("doc_id"),
      toks.as("n_tokens"),
      stop.as("n_stopwords"),
      punct.as("n_punct"),
      round(stop.cast("double") / toks, 6).as("stopword_ratio"),
      round(length(col("text")).cast("double") / toks, 6).as("avg_token_len"),
      round(
        when(toks >= 5 && stop.cast("double") / toks <= 0.5, 1.0).otherwise(0.0) * 0.5
          + when(punct === 0, 0.0).otherwise(0.25)
          + when(length(col("text")) >= 50, 0.25).otherwise(0.0), 6).as("quality"))
      .orderBy("doc_id")
  }
  val q21Sql: String =
    """SELECT doc_id,
      |  LEN(string_split_regex(TRIM(text), '\s+')) AS n_tokens,
      |  LEN(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it)\b')) AS n_stopwords,
      |  LEN(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
      |  ROUND(CAST(LEN(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it)\b')) AS DOUBLE)
      |        / LEN(string_split_regex(TRIM(text), '\s+')), 6) AS stopword_ratio,
      |  ROUND(CAST(LENGTH(text) AS DOUBLE)
      |        / LEN(string_split_regex(TRIM(text), '\s+')), 6) AS avg_token_len,
      |  ROUND(CASE WHEN LEN(string_split_regex(TRIM(text), '\s+')) >= 5
      |              AND CAST(LEN(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it)\b')) AS DOUBLE)
      |                  / LEN(string_split_regex(TRIM(text), '\s+')) <= 0.5
      |             THEN 0.5 ELSE 0.0 END
      |      + CASE WHEN LEN(regexp_extract_all(text, '[.!?,;:]')) = 0 THEN 0.0 ELSE 0.25 END
      |      + CASE WHEN LENGTH(text) >= 50 THEN 0.25 ELSE 0.0 END, 6) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q22: language-ID n-gram/marker heuristic: per-language marker-word hit
    * counts and an argmax prediction with deterministic tie-break (score
    * desc, language name asc). The marker sets are tiny by design — the
    * production path swaps in larger n-gram tables broadcast to executors.
    */
  val q22LangId: Q = (s, d) => {
    val en = regexp_count(col("text"), lit("\\b(the|a|of|join|group|order)\\b"))
    val dataish = regexp_count(col("text"), lit("\\b(data|table|row|value|key)\\b"))
    val sparkish = regexp_count(col("text"), lit("\\b(spark|query|filter|stream|batch)\\b"))
    documents(s, d).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      en.as("score_en"), dataish.as("score_data"), sparkish.as("score_spark"),
      when(en >= dataish && en >= sparkish, "en")
        .when(dataish >= sparkish, "data").otherwise("spark").as("predicted"))
      .orderBy("doc_id")
  }
  val q22Sql: String =
    """SELECT doc_id, lang AS labeled_lang,
      |  LEN(regexp_extract_all(text, '\b(the|a|of|join|group|order)\b')) AS score_en,
      |  LEN(regexp_extract_all(text, '\b(data|table|row|value|key)\b')) AS score_data,
      |  LEN(regexp_extract_all(text, '\b(spark|query|filter|stream|batch)\b')) AS score_spark,
      |  CASE WHEN LEN(regexp_extract_all(text, '\b(the|a|of|join|group|order)\b'))
      |            >= LEN(regexp_extract_all(text, '\b(data|table|row|value|key)\b'))
      |        AND LEN(regexp_extract_all(text, '\b(the|a|of|join|group|order)\b'))
      |            >= LEN(regexp_extract_all(text, '\b(spark|query|filter|stream|batch)\b'))
      |       THEN 'en'
      |       WHEN LEN(regexp_extract_all(text, '\b(data|table|row|value|key)\b'))
      |            >= LEN(regexp_extract_all(text, '\b(spark|query|filter|stream|batch)\b'))
      |       THEN 'data' ELSE 'spark' END AS predicted
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q23: document fingerprinting — md5 over whitespace-normalized text
    * (the exact-dedup key) plus a 64-bit-prefix short fingerprint. */
  val q23Fingerprint: Q = (s, d) => {
    val norm = concat_ws(" ", tokens(col("text")))
    documents(s, d).select(
      col("doc_id"),
      md5(norm).as("fp_md5"),
      substring(md5(norm), 1, 16).as("fp64"),
      length(norm).as("norm_len"))
      .orderBy("doc_id")
  }
  val q23Sql: String =
    """SELECT doc_id,
      |  md5(array_to_string(string_split_regex(TRIM(text), '\s+'), ' ')) AS fp_md5,
      |  SUBSTR(md5(array_to_string(string_split_regex(TRIM(text), '\s+'), ' ')), 1, 16) AS fp64,
      |  LENGTH(array_to_string(string_split_regex(TRIM(text), '\s+'), ' ')) AS norm_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q39: vocabulary building — corpus-wide token frequency with document
    * frequency, top 100 by count. The canonical two-level aggregation: the
    * (doc, token) dedup for doc-frequency happens inside one shuffle on the
    * token key (count(distinct doc_id) expands to a two-stage agg), and the
    * top-100 is TakeOrderedAndProject — no global sort. At 100 TB the token
    * key is high-cardinality and near-uniform (natural-language Zipf head
    * is handled by partial aggregation map-side: each task emits one row
    * per distinct token, so "the" costs |tasks| rows, not |occurrences|).
    */
  val q39VocabTopK: Q = (s, d) => {
    documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("tf"), col("token"))
      .limit(100)
  }
  val q39Sql: String =
    """SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(string_split_regex(TRIM(text), '\s+')) AS token
      |      FROM documents)
      |GROUP BY token ORDER BY tf DESC, token LIMIT 100""".stripMargin

  /** q40: deterministic hash split — train/val/test assignment from the
    * first hex digit of md5(doc_id): 0..b → train (12/16), c..d → val,
    * e..f → test. Content-addressed splits are the training-pipeline
    * standard: adding data never reshuffles old assignments, and the split
    * is reproducible on any engine with md5. Pure projection + tiny agg. */
  val q40HashSplit: Q = (s, d) => {
    val h1 = substring(md5(col("doc_id").cast("string")), 1, 1)
    documents(s, d)
      .select(col("source"), col("n_chars"),
        when(h1 < "c", "train").when(h1 < "e", "val").otherwise("test").as("split"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("source", "split")
  }
  val q40Sql: String =
    """SELECT source,
      |  CASE WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
      |       WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  /** q47: corpus cleaning — the canonical pre-training normalization pass:
    * lowercase, strip non-alphanumerics to spaces, collapse whitespace,
    * then keep-filter on minimum token count and alphabetic ratio. One
    * narrow codegen'd projection + filter over the scan; at 100 TB this is
    * the first stage of every text pipeline and runs at scan speed. */
  val q47CleanCorpus: Q = (s, d) => {
    val cleaned = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val nTok = size(split(cleaned, " "))
    val alphaChars = length(regexp_replace(cleaned, "[^a-z]", ""))
    documents(s, d)
      .select(col("doc_id"),
        length(cleaned).as("clean_len"),
        nTok.as("n_clean_tokens"),
        round(alphaChars.cast("double") / greatest(length(cleaned), lit(1)), 6)
          .as("alpha_ratio"),
        (nTok >= 10 &&
          alphaChars.cast("double") / greatest(length(cleaned), lit(1)) >= 0.25)
          .as("kept"))
      .orderBy("doc_id")
  }
  val q47Sql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    TRIM(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g')) AS cleaned
      |  FROM documents)
      |SELECT doc_id,
      |  LENGTH(cleaned) AS clean_len,
      |  LEN(string_split(cleaned, ' ')) AS n_clean_tokens,
      |  ROUND(CAST(LENGTH(regexp_replace(cleaned, '[^a-z]', '', 'g')) AS DOUBLE)
      |        / GREATEST(LENGTH(cleaned), 1), 6) AS alpha_ratio,
      |  (LEN(string_split(cleaned, ' ')) >= 10
      |   AND CAST(LENGTH(regexp_replace(cleaned, '[^a-z]', '', 'g')) AS DOUBLE)
      |       / GREATEST(LENGTH(cleaned), 1) >= 0.25) AS kept
      |FROM c ORDER BY doc_id""".stripMargin

  /** q100: repetition signals — the Gopher-rule family (Rae et al. 2021,
    * "Scaling Language Models", table A1): per-document duplicate-word
    * fraction, duplicate-bigram fraction, and TOP-bigram concentration,
    * with a keep/flag verdict. q51 already covers the dup-n-gram-fraction
    * half of the rule set; the new signal here is the concentration one
    * ("fraction of the doc inside its single most frequent n-gram" —
    * Gopher's top-2-gram rule), which needs a per-doc MAX COUNT, not just
    * a distinct count.
    *
    * Scale shape: one explode + TWO map-side-collapsing shuffles, both
    * keyed to include doc_id. The per-(doc, bigram) count collapses
    * map-side (a boilerplate gram repeated inside a doc costs one partial
    * row per task), and the key carries doc_id so a corpus-wide hot gram
    * can never funnel one reducer — the same first-shuffle discipline as
    * q98. The tempting shuffle-free alternative (sort the doc's own
    * bigram array, take the longest equal-run with the `aggregate` HOF)
    * measured 21.5 s vs 1.5 s at sf0.1: higher-order functions drop the
    * projection out of whole-stage codegen into interpreted eval with no
    * common-subexpression elimination, so every output column re-derives
    * the token pipeline — the collapsed-shuffle shape is the honest
    * 100 TB plan as well as the fast one here. */
  val q100Repetition: Q = (s, d) => {
    val base = documents(s, d)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("source"), col("w"),
        size(col("w")).as("n"), size(array_distinct(col("w"))).as("nd"))
    val grams = base.filter(col("n") >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, n - 2), i -> concat(w[i], ' ', w[i + 1]))"))
        .as("bg"))
    val gs = grams.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("nb"), count(lit(1)).as("ndb"),
        max(col("c")).as("topc"))
    val nb = coalesce(col("nb"), lit(0L))
    val safeNb = greatest(nb, lit(1L)).cast("double")
    val dupWordFrac = round((col("n") - col("nd")).cast("double") / col("n"), 6)
    val dupBigramFrac =
      round((nb - coalesce(col("ndb"), lit(0L))).cast("double") / safeNb, 6)
    val topBigramFrac =
      round(coalesce(col("topc"), lit(0L)).cast("double") / safeNb, 6)
    base.join(gs, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("source"),
        col("n").as("n_tokens"),
        dupWordFrac.as("dup_word_frac"),
        dupBigramFrac.as("dup_bigram_frac"),
        topBigramFrac.as("top_bigram_frac"),
        (topBigramFrac > 0.18 || dupBigramFrac > 0.60).as("flagged"))
      .orderBy("doc_id")
  }
  val q100Sql: String =
    """WITH w AS (
      |  SELECT doc_id, source,
      |    string_split_regex(TRIM(text), '\s+') AS words
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, source, LEN(words) AS n,
      |    LEN(list_distinct(words)) AS nd,
      |    CASE WHEN LEN(words) >= 2
      |         THEN list_transform(range(1, LEN(words)),
      |                             i -> words[i] || ' ' || words[i + 1])
      |         ELSE [] END AS grams
      |  FROM w),
      |g AS (SELECT doc_id, unnest(grams) AS bg FROM b),
      |gc AS (SELECT doc_id, bg, COUNT(*) AS c FROM g GROUP BY 1, 2),
      |gs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb, COUNT(*) AS ndb,
      |              MAX(c) AS topc
      |       FROM gc GROUP BY doc_id)
      |SELECT b.doc_id, b.source, b.n AS n_tokens,
      |  ROUND((b.n - b.nd) / CAST(b.n AS DOUBLE), 6) AS dup_word_frac,
      |  ROUND((COALESCE(gs.nb, 0) - COALESCE(gs.ndb, 0))
      |        / CAST(GREATEST(COALESCE(gs.nb, 0), 1) AS DOUBLE), 6)
      |    AS dup_bigram_frac,
      |  ROUND(COALESCE(gs.topc, 0)
      |        / CAST(GREATEST(COALESCE(gs.nb, 0), 1) AS DOUBLE), 6)
      |    AS top_bigram_frac,
      |  (ROUND(COALESCE(gs.topc, 0)
      |         / CAST(GREATEST(COALESCE(gs.nb, 0), 1) AS DOUBLE), 6) > 0.18
      |   OR ROUND((COALESCE(gs.nb, 0) - COALESCE(gs.ndb, 0))
      |            / CAST(GREATEST(COALESCE(gs.nb, 0), 1) AS DOUBLE), 6) > 0.60)
      |    AS flagged
      |FROM b LEFT JOIN gs ON b.doc_id = gs.doc_id
      |ORDER BY b.doc_id""".stripMargin

  /** The fixed English stopword core the funnel's spam rule counts —
    * the same 10-word set the soak generator's spam shard draws from. */
  val FunnelStopwords: Seq[String] =
    Seq("the", "of", "and", "a", "to", "in", "is", "it", "on", "for")

  /** SQL string literal with embedded single quotes escaped — every CTE
    * builder that splices a Scala constant (stopword, source name) into
    * generated oracle SQL must go through this, so a future constant
    * containing a quote can't break the oracle text. */
  def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** q112: filter-funnel attribution — the observability table every
    * cleaning pipeline publishes: run the standard heuristic quality
    * rules (Gopher/C4 family) in a FIXED order and attribute each
    * document to its FIRST failing rule, so per-source loss is explained,
    * not just counted. Rules, in order:
    *   1. too_short      — fewer than 10 tokens
    *   2. low_alpha      — alphabetic chars < 25 % of non-space chars
    *   3. stopword_spam  — stopword occurrences > 60 % of tokens
    *   4. repetitive     — top bigram covers > 20 % of bigrams (Gopher)
    *   5. word_length    — mean word length outside [2, 12] chars
    *   else kept
    *
    * Every threshold compares EXACT INTEGERS (4·alpha < len, 5·stop >
    * 3·n, 5·top > nb, len < 2n / len > 12n) — no float ratio ever enters
    * a branch, so the attribution is bit-stable across engines and
    * roundings. Scale shape: ZERO corpus-sized shuffles — every stat
    * (counts, stopword hits, char masses, top-bigram run) folds inside
    * the doc's own token array map-side, so the only shuffle in q112 is
    * the final |sources|×6 aggregate. A document is the unit of work; the
    * task skew bound is the longest single document, same as any per-doc
    * map. */
  /** Per-document funnel verdict: (doc_id, source, n, rule) — q112's
    * rule engine factored out so composed pipelines (q118) can gate on
    * the verdict without re-deriving the rules. */
  def funnelRuled(docs: DataFrame): DataFrame = {
    val stops = FunnelStopwords
    // Per-doc counting stats fold INSIDE the token array — no explode, no
    // occurrence-level shuffle (the row count never leaves |docs|). The
    // bigram branch below keeps its (doc, gram)-keyed aggregate because a
    // per-doc multiset count is not expressible as a linear array fold.
    // Integer sums are order-free, so values are bit-identical to the
    // former explode + groupBy form. NULL text is filtered (the explode
    // form dropped such docs implicitly; size(NULL) would not).
    // The top-bigram multiset count is ALSO a per-doc local computation:
    // sort the doc's gram array and take the longest equal-adjacent run
    // (identical to the former explode → count-per-(doc, gram) → max —
    // sorting only has to group equal grams). One O(m log m) local fold
    // per doc instead of an occurrence-level shuffle; a document is the
    // natural unit of work for Gopher-style stats at any corpus size.
    val grams = expr(
      "transform(sequence(0, size(l) - 2), i -> concat(l[i], ' ', l[i + 1]))")
    val topcCol = when(size(col("l")) >= 2,
      aggregate(array_sort(grams),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc("best"), run).as("best"))
        },
        acc => acc("best"))).otherwise(lit(0L))
    val nbCol = when(size(col("l")) >= 2,
      (size(col("l")) - 1).cast("long")).otherwise(lit(0L))
    val perDoc = docs
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("l"))
      .select(col("doc_id"), col("source"),
        size(col("l")).cast("long").as("n"),
        size(filter(col("l"), w => w.isin(stops: _*))).cast("long").as("n_stop"),
        aggregate(col("l"), lit(0L), (a, w) => a + length(w)).as("len"),
        aggregate(col("l"), lit(0L),
          (a, w) => a + length(regexp_replace(w, "[^a-zA-Z]", ""))).as("alpha"),
        nbCol.as("nb"),
        topcCol.as("topc"))
    val rule = when(col("n") < 10, lit("1_too_short"))
      .when(col("alpha") * 4 < col("len"), lit("2_low_alpha"))
      .when(col("n_stop") * 5 > col("n") * 3, lit("3_stopword_spam"))
      .when(col("topc") * 5 > col("nb"), lit("4_repetitive"))
      .when(col("len") < col("n") * 2 || col("len") > col("n") * 12,
        lit("5_word_length"))
      .otherwise(lit("kept"))
    perDoc
      .select(col("doc_id"), col("source"), col("n"), rule.as("rule"))
  }

  val q112FilterFunnel: Q = (s, d) =>
    funnelRuled(documents(s, d))
      .groupBy("source", "rule")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "rule")
  /** DuckDB CTE chain ending in `ruled(doc_id, source, n, rule)` — the
    * oracle twin of [[funnelRuled]]. SHARED by q112's oracle and the
    * composed q118 oracle, so the rule thresholds live in exactly one
    * place per engine (the q67CteChain policy). `docsCte` parameterizes
    * the input pool like the QualityModels CTE builders, so a composed
    * oracle funneling a filtered pool can't silently read the full table. */
  def funnelRuledCte(docsCte: String = "documents"): String = {
    val stopsList = FunnelStopwords.map(sqlLit).mkString(", ")
    s"""f_tok AS (
       |  SELECT doc_id, source,
       |         unnest(string_split_regex(TRIM(text), '\\s+')) AS w
       |  FROM $docsCte),
       |f_perdoc AS (
       |  SELECT doc_id, source, COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN w IN ($stopsList) THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_stop,
       |    CAST(SUM(len(w)) AS BIGINT) AS len,
       |    CAST(SUM(len(regexp_replace(w, '[^a-zA-Z]', '', 'g'))) AS BIGINT)
       |      AS alpha
       |  FROM f_tok GROUP BY 1, 2),
       |f_l AS (SELECT doc_id, string_split_regex(TRIM(text), '\\s+') AS l
       |        FROM $docsCte),
       |f_g AS (SELECT doc_id,
       |          unnest(list_transform(range(1, len(l)),
       |                                i -> l[i] || ' ' || l[i + 1])) AS bg
       |        FROM f_l WHERE len(l) >= 2),
       |f_gc AS (SELECT doc_id, bg, COUNT(*) AS c FROM f_g GROUP BY 1, 2),
       |f_gs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb, MAX(c) AS topc
       |         FROM f_gc GROUP BY doc_id),
       |ruled AS (
       |  SELECT p.doc_id, p.source, p.n,
       |    CASE WHEN p.n < 10 THEN '1_too_short'
       |         WHEN p.alpha * 4 < p.len THEN '2_low_alpha'
       |         WHEN p.n_stop * 5 > p.n * 3 THEN '3_stopword_spam'
       |         WHEN COALESCE(f_gs.topc, 0) * 5 > COALESCE(f_gs.nb, 0)
       |           THEN '4_repetitive'
       |         WHEN p.len < p.n * 2 OR p.len > p.n * 12 THEN '5_word_length'
       |         ELSE 'kept' END AS rule
       |  FROM f_perdoc p LEFT JOIN f_gs USING (doc_id))""".stripMargin
  }

  val q112Sql: String =
    s"""WITH ${funnelRuledCte()}
       |SELECT source, rule, COUNT(*) AS n_docs
       |FROM ruled GROUP BY 1, 2 ORDER BY source, rule""".stripMargin

  /** q121: train/test split-leakage audit — exact-duplicate content that
    * crosses the q40 content-addressed split boundary. The eval-integrity
    * check every corpus release runs: a benchmark answer sitting
    * verbatim in train inflates eval scores no matter how good the
    * decontamination list is. Groups documents by normalized content
    * hash (q24's key), keeps groups spanning >1 split, and reports per
    * split-pair how many duplicate groups and documents leak across.
    *
    * Scale shape: one narrow projection (hash + split are both pure
    * functions of the row), one map-side-collapsing groupBy on the
    * 128-bit content key, and a ≤3-splits array fold per group —
    * shuffle ∝ distinct hashes, the q24 bound. */
  val q121SplitLeakage: Q = (s, d) => {
    val h1 = substring(md5(col("doc_id").cast("string")), 1, 1)
    val split = when(h1 < "c", "train").when(h1 < "e", "val").otherwise("test")
    val hashed = documents(s, d).select(
      md5(concat_ws(" ", tokens(col("text")))).as("content_hash"),
      split.as("split"))
    val groups = hashed.groupBy("content_hash")
      .agg(sort_array(collect_set(col("split"))).as("splits"),
        count(lit(1)).as("n_docs"))
      .filter(size(col("splits")) >= 2)
    groups
      .select(concat_ws("+", col("splits")).as("split_pair"),
        col("n_docs"))
      .groupBy("split_pair")
      .agg(count(lit(1)).as("n_leaky_groups"),
        sum(col("n_docs")).as("n_docs_involved"))
      .orderBy("split_pair")
  }
  val q121Sql: String =
    """WITH tagged AS (
      |  SELECT md5(array_to_string(string_split_regex(TRIM(text), '\s+'), ' '))
      |           AS content_hash,
      |    CASE WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
      |         WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |groups AS (
      |  SELECT content_hash,
      |    list_sort(list_distinct(list(split))) AS splits,
      |    COUNT(*) AS n_docs
      |  FROM tagged GROUP BY content_hash
      |  HAVING len(list_distinct(list(split))) >= 2)
      |SELECT array_to_string(splits, '+') AS split_pair,
      |  COUNT(*) AS n_leaky_groups,
      |  CAST(SUM(n_docs) AS BIGINT) AS n_docs_involved
      |FROM groups GROUP BY 1 ORDER BY split_pair""".stripMargin

  /** q128: exact corpus heavy hitters WITHOUT a full-vocab shuffle — the
    * scale-out form of q39's vocabulary count. q39's groupBy shuffles one
    * row per (task, distinct token); fine for word vocabularies, but a
    * production pipeline runs this over n-grams/BPE-pieces where the
    * vocabulary is billions of keys and the shuffle dwarfs the answer.
    * Heavy hitters bound the state instead:
    *  1. per-partition Misra-Gries summaries (`mgK` counters of FIXED
    *     size per task, amortized O(1)/token — the decrement pass is
    *     paid for by prior increments): every token with global count
    *     > N/(mgK+1) is guaranteed to survive in at least one
    *     partition's summary, because Σf_p = f > Σ n_p/(mgK+1) forces
    *     some partition over its local bar;
    *  2. the candidate union (≤ mgK × tasks rows — never the vocabulary)
    *     is dedup'd and BROADCAST back, never collected to the driver;
    *  3. one exact recount restricted to candidates — the groupBy now
    *     shuffles only candidate tokens — then the `threshold` cut.
    * With threshold = ceil(N·rel) and rel > 1/(mgK+1), step 1's guarantee
    * makes the output EXACTLY the tokens with count ≥ threshold — the
    * sketch can only add candidates, and the recount is exact — so the
    * oracle is a plain GROUP BY ... HAVING with no sketch at all.
    * Candidate-set CONTENTS depend on partitioning; the output does not. */
  def heavyHitters(docs: DataFrame, rel: Double = 0.001,
                   mgK: Int = 2000): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    require(rel * (mgK + 1) > 1.0,
      s"rel=$rel too small for mgK=$mgK: completeness needs rel > 1/(mgK+1)")
    val toks = docs.select(explode(tokens(col("text"))).as("token"))
    val n = toks.count()
    val threshold = math.ceil(n * rel).toLong
    val cands = toks.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < mgK => counters.update(t, 1L)
          case None =>
            val ks = counters.keys.toArray
            var i = 0
            while (i < ks.length) {
              val vv = counters(ks(i)) - 1
              if (vv == 0L) counters.remove(ks(i))
              else counters.update(ks(i), vv)
              i += 1
            }
        }
      }
      counters.keysIterator
    }.toDF("token").distinct()
    toks.join(broadcast(cands), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= threshold)
      .orderBy(desc("tf"), col("token"))
  }

  val q128HeavyHitters: Q = (s, d) => heavyHitters(documents(s, d))
  val q128Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(TRIM(text), '\s+')) AS token
      |  FROM documents),
      |-- CAST matters: DuckDB parses a bare 0.001 as DECIMAL(4,3) and the
      |-- product stays exact, while the Spark side computes the threshold
      |-- in IEEE double (math.ceil(n * rel)); at an exact-boundary corpus
      |-- size (n*rel representable only as x.000...004) the two ceils
      |-- would differ by 1. Forcing DOUBLE makes both engines run the
      |-- identical FP multiply.
      |th AS (SELECT CEIL(COUNT(*) * CAST(0.001 AS DOUBLE)) AS t FROM toks)
      |SELECT token, COUNT(*) AS tf
      |FROM toks GROUP BY token
      |HAVING COUNT(*) >= (SELECT t FROM th)
      |ORDER BY tf DESC, token""".stripMargin

  /** q131: per-document mean token log-probability under the corpus's
    * own unigram LM — the classic cheap perplexity proxy for quality
    * scoring/curation (a document of rare/garbled tokens scores far
    * below fluent text; the Gopher/FineWeb filter families all carry a
    * variant). Two stages, both plain relational:
    *  1. the LM: token → ln(tf/T), one groupBy over the token stream
    *     (shuffle ∝ distinct tokens; a production run over n-grams
    *     bounds this with the q128 heavy-hitter vocabulary + an OOV
    *     bucket, or broadcasts the vocab when it fits);
    *  2. the score: tokens ⋈ LM on token (shuffle ∝ token mass, the
    *     same join shape as q52), then one per-doc aggregate.
    * Numerics: ln at 6dp (the transcendental contract), DECIMAL-exact
    * per-doc sums, one double division, 6dp out — DuckDB replays both
    * stages exactly. */
  val q131UnigramLogprob: Q = (s, d) => {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val toks = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val total = toks.count()
    val lm = toks.groupBy("token").agg(count(lit(1)).as("tf"))
      .select(col("token"),
        round(log(col("tf") / lit(total.toDouble)), 6).as("lp"))
    toks.join(lm, Seq("token"))
      .groupBy("doc_id")
      .agg(
        round(sum(col("lp").cast(DecimalType(18, 6))).cast(DoubleType)
          / count(lit(1)), 6).as("mean_logprob"),
        count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")
  }
  val q131Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(TRIM(text), '\s+')) AS token
      |  FROM documents),
      |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM toks),
      |lm AS (
      |  SELECT token, ROUND(LN(COUNT(*) / (SELECT t FROM tot)), 6) AS lp
      |  FROM toks GROUP BY token)
      |SELECT k.doc_id,
      |  ROUND(CAST(SUM(CAST(lm.lp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
      |    AS mean_logprob,
      |  COUNT(*) AS n_tokens
      |FROM toks k JOIN lm ON lm.token = k.token
      |GROUP BY k.doc_id
      |ORDER BY doc_id""".stripMargin

  /** q143: Count-Min sketch frequency estimation with an exact error
    * audit — the merge-friendly complement to q128's Misra-Gries. MG
    * answers "which tokens are heavy" with bounded state but needs the
    * exact recount pass; a Count-Min sketch (Cormode & Muthukrishnan
    * 2005) answers point frequency queries from CONSTANT state
    * (depth × width counters, here 4 × 16 — width shrunk to the gate corpus
    * the way q125 starves its base: the synthetic vocabulary is ~31
    * types, so a production-sized 2^20-cell sketch would never collide
    * and the audit would pin nothing; at width 16 the collision error
    * the sketch trades for constant state is actually exercised) that merges by cell-wise
    * addition — the shape a 1000-executor pipeline wants, since every
    * shard's sketch folds into the global one with no candidate
    * exchange, and the same sketch later serves any ad-hoc token probe
    * without re-reading the corpus.
    *
    * Construction collapses to relational algebra: fold the OCCURRENCE
    * stream to the vocabulary-sized type table first (map-side partial
    * agg — hashing once per type, not per occurrence, is the classic
    * CMS-over-aggregates trick and is mathematically the identical
    * sketch), explode each type into its `depth` (row, bucket) cells,
    * and sum counts per cell: the sketch IS a 2048-row DataFrame.
    * Estimation: est(t) = min over rows of that row's bucket sum —
    * always ≥ the true count (cells only ever over-count via
    * collisions), within ε·N (ε = e/width) with probability
    * 1 − e^−depth. The audit joins the estimates back against the
    * exact counts for the top-25 tokens and reports the per-token
    * overestimate — all BIGINT arithmetic, hash-exact by construction.
    * Bucket hashing is the md5₃₂ idiom (identical hex in both engines):
    * row j's hash of token t is md5("j#t") mod width. */
  def countMinSketch(toks: DataFrame, depth: Int = 4, width: Int = 16): DataFrame = {
    val tc = toks.groupBy("token").agg(count(lit(1)).as("c_true"))
    tc.select(col("token"), col("c_true"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("rw"))
      .select(col("rw"),
        (conv(substring(md5(concat(col("rw").cast("string"), lit("#"),
          col("token"))), 1, 8), 16, 10).cast("long") % width).as("bucket"),
        col("c_true"))
      .groupBy("rw", "bucket").agg(sum(col("c_true")).as("cell_sum"))
  }

  def countMinAudit(docs: DataFrame, depth: Int = 4, width: Int = 16,
                    topK: Int = 25): DataFrame = {
    val toks = docs.select(explode(tokens(col("text"))).as("token"))
    val sketch = countMinSketch(toks, depth, width)
    val tc = toks.groupBy("token").agg(count(lit(1)).as("c_true"))
    // top-K via orderBy+limit FIRST (TakeOrderedAndProject: per-partition
    // heaps, no global sort) so the rank window runs over topK rows — the
    // type table is vocabulary-sized, i.e. unbounded at corpus scale, and
    // a global row_number over it would funnel the whole vocabulary
    // through one WindowExec task (the HybridRetrieval.bm25 rule). The
    // deterministic (c_true desc, token) order makes the post-cut ranks
    // identical to ranks assigned over the full table.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("c_true"), col("token"))
    val top = tc.orderBy(desc("c_true"), col("token")).limit(topK)
      .withColumn("rk", row_number().over(w))
    val probes = top.select(col("token"), col("c_true"), col("rk"),
      explode(expr(s"sequence(0, ${depth - 1})")).as("rw"))
      .select(col("token"), col("c_true"), col("rk"), col("rw"),
        (conv(substring(md5(concat(col("rw").cast("string"), lit("#"),
          col("token"))), 1, 8), 16, 10).cast("long") % width).as("bucket"))
    probes.join(sketch, Seq("rw", "bucket"))
      .groupBy("token", "c_true", "rk")
      .agg(min(col("cell_sum")).as("c_est"))
      .select(col("token"), col("c_true"), col("c_est"),
        (col("c_est") - col("c_true")).as("overestimate"), col("rk"))
      .orderBy("rk")
  }
  val q143CountMinAudit: Q = (s, d) => countMinAudit(documents(s, d))
  val q143Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(TRIM(text), '\s+')) AS token
      |  FROM documents),
      |tc AS (SELECT token, COUNT(*) AS c_true FROM toks GROUP BY token),
      |cells AS (
      |  SELECT r.range AS rw,
      |    CAST(concat('0x', substr(md5(concat(CAST(r.range AS VARCHAR), '#',
      |      token)), 1, 8)) AS BIGINT) % 16 AS bucket,
      |    c_true
      |  FROM tc CROSS JOIN range(0, 4) r),
      |sketch AS (SELECT rw, bucket, SUM(c_true) AS cell_sum
      |           FROM cells GROUP BY 1, 2),
      |top AS (
      |  SELECT token, c_true,
      |    ROW_NUMBER() OVER (ORDER BY c_true DESC, token) AS rk
      |  FROM tc QUALIFY rk <= 25),
      |probes AS (
      |  SELECT token, c_true, rk, r.range AS rw,
      |    CAST(concat('0x', substr(md5(concat(CAST(r.range AS VARCHAR), '#',
      |      token)), 1, 8)) AS BIGINT) % 16 AS bucket
      |  FROM top CROSS JOIN range(0, 4) r)
      |SELECT token, c_true, CAST(MIN(cell_sum) AS BIGINT) AS c_est,
      |  CAST(MIN(cell_sum) - c_true AS BIGINT) AS overestimate, rk
      |FROM probes JOIN sketch USING (rw, bucket)
      |GROUP BY token, c_true, rk
      |ORDER BY rk""".stripMargin

  val queries: Map[String, Q] = Map(
    "q20_token_stats" -> q20TokenStats,
    "q21_quality_score" -> q21QualityScore,
    "q22_lang_id" -> q22LangId,
    "q23_fingerprint" -> q23Fingerprint,
    "q39_vocab_topk" -> q39VocabTopK,
    "q40_hash_split" -> q40HashSplit,
    "q47_clean_corpus" -> q47CleanCorpus,
    "q100_repetition" -> q100Repetition,
    "q112_filter_funnel" -> q112FilterFunnel,
    "q121_split_leakage" -> q121SplitLeakage,
    "q128_heavy_hitters" -> q128HeavyHitters,
    "q131_unigram_logprob" -> q131UnigramLogprob,
    "q143_countmin_audit" -> q143CountMinAudit,
  )
  val oracle: Map[String, String] = Map(
    "q20_token_stats" -> q20Sql,
    "q21_quality_score" -> q21Sql,
    "q22_lang_id" -> q22Sql,
    "q23_fingerprint" -> q23Sql,
    "q39_vocab_topk" -> q39Sql,
    "q40_hash_split" -> q40Sql,
    "q47_clean_corpus" -> q47Sql,
    "q100_repetition" -> q100Sql,
    "q112_filter_funnel" -> q112Sql,
    "q121_split_leakage" -> q121Sql,
    "q128_heavy_hitters" -> q128Sql,
    "q131_unigram_logprob" -> q131Sql,
    "q143_countmin_audit" -> q143Sql,
  )
}
