package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (SURVEY.md §2 inventory plus the
  * LLM-data-pipeline extensions); `oracleSql` carries the DuckDB-dialect
  * equivalent for each SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way star join with broadcast dims + aggregate — exercises scan,
    * broadcast join, shuffle join, partial aggregation in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03BroadcastJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * LLM-data-pipeline extensions (dedup, similarity, text, multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ DedupOps.queries ++
      SimilarityOps.queries ++ MultimodalOps.queries ++ EventOps.queries ++
      PipelineOps.queries ++ CorpusOps.queries ++ BpeVocab.queries ++
      PackingOps.queries ++ CorpusPipeline.queries ++ MixtureOps.queries ++
      SubstrDedup.queries ++ SemanticDedup.queries ++ KnnGraph.queries ++
      QualityModels.queries ++ HybridRetrieval.queries ++ DataLayout.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextOps.oracle ++ DedupOps.oracle ++
      SimilarityOps.oracle ++ MultimodalOps.oracle ++ EventOps.oracle ++
      PipelineOps.oracle ++ CorpusOps.oracle ++ BpeVocab.oracle ++
      PackingOps.oracle ++ CorpusPipeline.oracle ++ MixtureOps.oracle ++
      SubstrDedup.oracle ++ SemanticDedup.oracle ++ KnnGraph.oracle ++
      QualityModels.oracle ++ HybridRetrieval.oracle ++ DataLayout.oracle
}
