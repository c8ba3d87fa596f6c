package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus lifecycle maintenance over the sharded at-rest layout — the
  * operations that keep a 100 TB training corpus correct BETWEEN pipeline
  * runs: surgical deletes (takedowns, GDPR erasure), shard rebuilds
  * (late-arriving corrections), and small-file compaction. All three
  * exploit the same property: the shard id is a PURE FUNCTION of doc_id
  * ([[MixtureOps.shardCol]], the q86 router), so the set of affected
  * partitions is computable FROM THE KEYS ALONE — no corpus scan decides
  * what to rewrite, and every rewrite touches only the affected shard
  * directories (dynamic partition overwrite; untouched shards' files are
  * bit-identical afterwards, which CorpusMaintenanceSpec pins at the
  * file-listing level).
  *
  * At 100 TB this is the difference between an erasure request costing a
  * full-corpus rewrite (hours, cluster-wide) and costing a rewrite of
  * `|affected shards| / 16` of the data — and the file-level "untouched
  * partitions stay bit-identical" contract is what makes downstream
  * incremental consumers (caches, manifests, bucketed readers) safe.
  */
object CorpusMaintenance {

  /** Write (or fully rebuild) the corpus in the sharded at-rest layout:
    * one directory per deterministic shard. */
  def writeSharded(docs: DataFrame, path: String): Unit =
    docs.withColumn("shard", MixtureOps.shardCol)
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)

  /** The shards a set of doc ids routes to — computed from the ids alone
    * (the router is a pure function), never from the stored corpus. */
  def shardsOf(spark: SparkSession, ids: Seq[Long]): Seq[Int] = {
    import spark.implicits._
    ids.toDF("doc_id").select(MixtureOps.shardCol.as("shard"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
  }

  import MaintenanceIO.{materialized, withDynamicOverwrite}

  /** Surgical delete: remove `ids` from the sharded corpus by rewriting
    * ONLY the shards they route to. A shard left EMPTY by the delete is
    * removed at the directory level (dynamic overwrite cannot express "no
    * rows for this partition" — absent data would silently leave the old
    * files, resurrecting the deleted documents). */
  def deleteDocs(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    val affected = shardsOf(spark, ids)
    val corpus = spark.read.parquet(path)
    val remaining = materialized(corpus
      .filter(col("shard").isInCollection(affected))
      .filter(!col("doc_id").isInCollection(ids)))
    val keptShards = remaining.select("shard").distinct()
      .collect().map(_.getInt(0)).toSet
    withDynamicOverwrite(spark) {
      remaining.write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
    }
    // directories whose every document was deleted
    val emptied = affected.filterNot(keptShards)
    if (emptied.nonEmpty) {
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { s =>
        fs.delete(new Path(path, s"shard=$s"), true)
      }
    }
  }

  /** Rebuild the shards containing `changed` documents (late corrections,
    * re-scored quality fields …): the affected shards are recomputed from
    * the union of their surviving rows and the changed rows, then
    * dynamically overwritten — other shards untouched. `changed` must
    * carry the corpus schema (minus the shard column). */
  def upsertDocs(spark: SparkSession, path: String, changed: DataFrame): Unit = {
    val changedIds = changed.select("doc_id").collect().map(_.getLong(0)).toSeq
    if (changedIds.isEmpty) return
    val affected = shardsOf(spark, changedIds)
    val corpus = spark.read.parquet(path)
    val kept = corpus
      .filter(col("shard").isInCollection(affected))
      .filter(!col("doc_id").isInCollection(changedIds))
    val incoming = changed.withColumn("shard", MixtureOps.shardCol)
      .select(kept.columns.map(col): _*)
    val next = materialized(kept.unionByName(incoming))
    withDynamicOverwrite(spark) {
      next.write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
    }
  }

  /** Compact the named shards (or all) to ONE file each — the small-file
    * repair after many incremental appends. Rows are unchanged
    * post-compaction; only the file layout shrinks. At real scale run
    * this in shard batches (the materialization holds the batch's rows),
    * which the `shards` parameter is for. */
  def compactShards(spark: SparkSession, path: String,
                    shards: Seq[Int] = Seq.empty): Unit = {
    val corpus = spark.read.parquet(path)
    val target = materialized(
      if (shards.isEmpty) corpus else corpus.filter(col("shard").isInCollection(shards)))
    withDynamicOverwrite(spark) {
      target.repartition(col("shard"))
        .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
    }
  }
}
