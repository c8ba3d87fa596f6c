package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table plumbing — the co-located join path for 100 TB facts.
  *
  * A shuffle-free join needs both sides hash-partitioned the same way ON
  * DISK: `bucketBy(n, key)` + `sortBy(key)` writes each file pre-hashed and
  * pre-sorted, so a later join between two tables bucketed on the join key
  * with the same bucket count compiles to a SortMergeJoin with NO Exchange
  * (and with sortBy, no Sort either) — the scan IS the shuffle. At 100 TB
  * this converts every recurring fact⋈fact join from a full-network
  * all-to-all into a local merge, which is the single biggest cost lever
  * for repeated pipelines (dedup joins, session⋈orders, ANN candidate
  * rescoring against a bucketed corpus).
  *
  * Bucket count guidance: pick so each bucket file is 128 MB–1 GB at the
  * target scale (100 TB / 1 GB ≈ 100k buckets), and keep it a multiple of
  * the executor-core count so every core gets whole buckets.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket key — planner
    * emits a zero-Exchange sort-merge join when bucket counts match. */
  def cooperativeJoin(spark: SparkSession, left: String, right: String,
                      leftKey: String, rightKey: String): DataFrame = {
    // resolve each table once: the join condition must reference the SAME
    // Dataset instances that are the join's children, not fresh
    // spark.table() resolutions whose attribute ids only coincide while
    // the catalog's relation cache is warm
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Hive-style partitioned parquet sink: one directory per distinct value
    * of the partition columns. The matching read-side win is partition
    * PRUNING: a filter on a partition column never opens non-matching
    * directories (shows as `PartitionFilters` on the scan node, with the
    * data filters in `PushedFilters`). At 100 TB this is the first-order
    * data-layout decision — partition by low-cardinality routing keys
    * (date, source, event_type), bucket by high-cardinality join keys. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.format("parquet").mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).save(path)
}
