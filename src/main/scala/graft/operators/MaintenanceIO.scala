package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the partition-surgical maintenance operators
  * ([[CorpusMaintenance]] over the doc shards, [[EmbeddingMaintenance]]
  * over the IVF cells). */
private[operators] object MaintenanceIO {

  /** Spark refuses to overwrite a path its own input plan still reads
    * (rightly — a mid-write failure would destroy the input). The rewrite
    * set is the affected partitions only, so materializing it first
    * (eager localCheckpoint: lineage truncated to stored blocks) both
    * satisfies the check and bounds the exposure window to a pure write. */
  def materialized(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Run `body` with dynamic partition-overwrite mode, restoring the
    * previous setting afterwards. */
  def withDynamicOverwrite[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
