package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-index lifecycle maintenance over the IVF cell-partitioned
  * at-rest layout ([[SimilarityOps.writeIvfPartitioned]]'s directory
  * structure) — the vector-side twin of [[CorpusMaintenance]], keeping a
  * deployed ANN index correct between pipeline runs: vector erasure
  * (takedowns propagate to derived indexes, not just the corpus),
  * re-embedding upserts (a model refresh or doc edit changes the
  * vector), and small-file compaction.
  *
  * The structural difference from the doc shards: a CELL IS NOT A PURE
  * FUNCTION OF THE ID — it depends on the embedding and the frozen
  * centroid table. Two consequences, both handled here:
  *  - deletes must LOOK UP the victims' cells in the stored layout (a
  *    column-pruned scan of vec_id + the cell partition column — no
  *    embedding bytes are read);
  *  - an upserted vector may MOVE between cells (its new embedding
  *    quantizes elsewhere), so the affected set is the union of the old
  *    cells (looked up) and the new cells (computed from the incoming
  *    vectors via [[ProductQuantization.cellExpr]] under the SAME frozen
  *    centroids — centroids are never retrained here, exactly as a
  *    serving index holds its quantizer fixed between rebuilds).
  *
  * Everything else inherits the [[CorpusMaintenance]] contract: dynamic
  * partition overwrite rewrites ONLY affected cell directories, emptied
  * directories are reclaimed at the filesystem level (dynamic overwrite
  * cannot express an empty partition — stale files would resurrect
  * deleted vectors), and untouched cells stay bit-identical at the
  * file-listing level (spec-pinned).
  */
object EmbeddingMaintenance {

  import MaintenanceIO.{materialized, withDynamicOverwrite}

  /** Write (or fully rebuild) the index layout: one directory per coarse
    * cell under the given frozen centroids. */
  def writeCellLayout(emb: DataFrame, cents: Array[Array[Float]],
                      path: String): Unit =
    emb.withColumn("cell",
        ProductQuantization.cellExpr(emb.sparkSession, cents)(col("embedding")))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(path)

  /** The cells a set of vec ids lives in — looked up from the stored
    * layout with a column-pruned scan (vec_id + the cell partition
    * column; embeddings are never read). */
  def cellsOf(spark: SparkSession, path: String, ids: Seq[Long]): Seq[Int] =
    spark.read.parquet(path)
      .filter(col("vec_id").isInCollection(ids))
      .select("cell").distinct().collect().map(_.getInt(0)).toSeq.sorted

  /** Surgical delete: remove `ids` by rewriting only the cells they live
    * in; cells left empty are reclaimed at the directory level. */
  def deleteVecs(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    val affected = cellsOf(spark, path, ids)
    if (affected.isEmpty) return
    val remaining = materialized(spark.read.parquet(path)
      .filter(col("cell").isInCollection(affected))
      .filter(!col("vec_id").isInCollection(ids)))
    val keptCells = remaining.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    withDynamicOverwrite(spark) {
      remaining.write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(path)
    }
    val emptied = affected.filterNot(keptCells)
    if (emptied.nonEmpty) {
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach(c => fs.delete(new Path(path, s"cell=$c"), true))
    }
  }

  /** Re-embedding upsert: replace the stored vectors for `changed`'s ids
    * (and insert new ids). Affected cells = the victims' OLD cells
    * (looked up) ∪ the incoming vectors' NEW cells (quantized under the
    * frozen `cents`), so a vector that moves cells is erased from its
    * old directory and written to its new one in the same dynamic
    * overwrite. `changed` must carry (vec_id, embedding, …) — the corpus
    * schema minus the cell column. */
  def upsertVecs(spark: SparkSession, path: String,
                 cents: Array[Array[Float]], changed: DataFrame): Unit = {
    val changedIds = changed.select("vec_id").collect().map(_.getLong(0)).toSeq
    if (changedIds.isEmpty) return
    val oldCells = cellsOf(spark, path, changedIds)
    val incoming = changed.withColumn("cell",
      ProductQuantization.cellExpr(spark, cents)(col("embedding")))
    val newCells = incoming.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val affected = (oldCells ++ newCells).distinct.sorted
    val corpus = spark.read.parquet(path)
    val kept = corpus
      .filter(col("cell").isInCollection(affected))
      .filter(!col("vec_id").isInCollection(changedIds))
    val next = materialized(
      kept.unionByName(incoming.select(kept.columns.map(col): _*)))
    val keptCells = next.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    withDynamicOverwrite(spark) {
      next.write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(path)
    }
    // an old cell fully vacated by moves (and not re-filled) is reclaimed
    val emptied = affected.filterNot(keptCells)
    if (emptied.nonEmpty) {
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach(c => fs.delete(new Path(path, s"cell=$c"), true))
    }
  }

  /** Compact the named cells (or all) to one file each — rows unchanged,
    * file layout shrunk. Run in cell batches at real scale. */
  def compactCells(spark: SparkSession, path: String,
                   cells: Seq[Int] = Seq.empty): Unit = {
    val corpus = spark.read.parquet(path)
    val target = materialized(
      if (cells.isEmpty) corpus else corpus.filter(col("cell").isInCollection(cells)))
    withDynamicOverwrite(spark) {
      target.repartition(col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(path)
    }
  }
}
