package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The kNN graph as a MAINTAINED AT-REST ARTIFACT — the round-13 verdict's
  * top ask. Four gate queries (q105/q129/q130/q144) and the cluster
  * pipeline each consume the same edge list, and until now each rebuilt it
  * inline per run: correct, but at 100 TB the graph build is the dominant
  * cost (O(N·nProbe·|cell|) cosine work), so a deployment builds it ONCE,
  * persists it next to the IVF index, and maintains it incrementally as
  * vectors arrive — exactly the lifecycle already proven for the cells
  * themselves ([[EmbeddingMaintenance]]).
  *
  * Layout (rooted at `graphPath`):
  *  - `edges/`  — (src_id, nbr_id, sim, rk) partitioned by `src_cell`
  *    (the source's coarse cell): the graph family's joins key on vec_id,
  *    and cell-partitioning keeps each source's list in one directory so
  *    maintenance rewrites ∝ touched cells, never the graph;
  *  - `probes/` — (vec_id, own_cell) partitioned by `cell` (each PROBED
  *    cell): the REVERSE-PROBE index. This is the structure that makes
  *    incremental insert batch-proportional: an arrival lands in cell c,
  *    and the only existing sources whose top-k can change are exactly
  *    the vectors that probe c — one partition-pruned read of `probes/
  *    cell=c`, never a corpus scan (a source u sees candidate w iff
  *    w's cell ∈ u's probe list, which is fixed under frozen centroids);
  *  - `<graphPath>.graph.json` — (k, nProbe) sidecar, so any maintainer
  *    (a restarted stream, another job) recovers the build discipline.
  *    The CENTROIDS deliberately live in ONE place — the embedding
  *    layout's own quantizer sidecar ([[EmbeddingMaintenance]]) — so the
  *    graph and the index it derives from cannot drift apart.
  *
  * Incremental-insert exactness (the parity the spec pins bit-for-bit):
  * with centroids frozen, an arrival only ADDS candidates, and
  * top-k(A ∪ B) = top-k(top-k(A) ∪ B) — so merging each displaced
  * source's STORED top-k with its new arrival candidates and re-ranking
  * reproduces the full rebuild exactly, at cost ∝ batch. The two cases
  * that invalidate stored rows — a re-embedded or deleted neighbor, whose
  * k-th-place successor was never stored — fall back to a full re-probe
  * of just the affected sources (cost ∝ affected × nProbe·|cell|; finding
  * them is one column-pruned (src_id, nbr_id) scan of the edge list,
  * 16 bytes/row — the metadata read is corpus-linear, the cosine work is
  * not, and insert-only ingest skips it entirely).
  */
object GraphMaintenance {

  import MaintenanceIO.{materialized, withDynamicOverwrite}

  private def edgesPath(graphPath: String) = graphPath + "/edges"
  private def probesPath(graphPath: String) = graphPath + "/probes"
  private def sidecar(graphPath: String) = new Path(graphPath + ".graph.json")

  /** (k, nProbe) sidecar — atomic write-then-rename like the quantizer
    * sidecar, so a maintainer never sees a torn config. */
  def saveGraphMeta(spark: SparkSession, graphPath: String,
                    k: Int, nProbe: Int): Unit = {
    val fs = sidecar(graphPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(graphPath + ".graph.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"k":$k,"nProbe":$nProbe}""".getBytes("UTF-8"))
    finally out.close()
    fs.delete(sidecar(graphPath), false)
    require(fs.rename(tmp, sidecar(graphPath)),
      s"could not promote graph sidecar for $graphPath")
  }

  def loadGraphMeta(spark: SparkSession, graphPath: String): (Int, Int) = {
    val fs = sidecar(graphPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(sidecar(graphPath)),
      s"no graph sidecar at $graphPath — create the layout with writeKnnGraph")
    val in = fs.open(sidecar(graphPath))
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val m = JsonMethods.parse(raw).asInstanceOf[JObject].obj.toMap
    def int(v: JValue): Int = v match {
      case JInt(i) => i.toInt
      case JLong(l) => l.toInt
      case other => sys.error(s"bad number in graph sidecar: $other")
    }
    (int(m("k")), int(m("nProbe")))
  }

  private def centroidsOf(spark: SparkSession, embPath: String): Array[Array[Float]] =
    EmbeddingMaintenance.loadQuantizer(spark, embPath).getOrElse(sys.error(
      s"no quantizer sidecar at $embPath — create the index with " +
        "writeCellLayoutPersistent"))._1

  /** Shared rank step — the exact [[KnnGraph.knnEdgesWithCents]] top-k
    * discipline ((sim DESC, nbr_id) row_number ≤ k), applied to any
    * candidate set that carries (src_id, src_cell, nbr_id, sim). */
  private def rankTopK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("src_id").orderBy(desc("sim"), col("nbr_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("src_id"), col("src_cell"), col("nbr_id"), col("sim"), col("rk"))
  }

  /** Candidate edges for the given probe side against the given index
    * side — the [[KnnGraph.knnEdgesWithCents]] body with the index cell
    * read from the STORED layout column instead of recomputed (identical
    * values: the layout was written under the same frozen centroids).
    * The probe side carries (src_id, src_emb, src_cell, cell). */
  private def candidates(probeSide: DataFrame, index: DataFrame): DataFrame =
    probeSide.join(index, Seq("cell"))
      .filter(col("src_id") =!= col("vec_id"))
      .select(col("src_id"), col("src_cell"), col("vec_id").as("nbr_id"),
        round(graft.functions.CosineSimilarity(col("src_emb"), col("embedding")), 6)
          .as("sim"))

  private def probeSideOf(layout: DataFrame, cents: Array[Array[Float]],
                          nProbe: Int): DataFrame = {
    val probeUdf = ProductQuantization.probeExpr(layout.sparkSession, cents, nProbe)
    layout.select(col("vec_id").as("src_id"), col("embedding").as("src_emb"),
      col("cell").as("src_cell"), explode(probeUdf(col("embedding"))).as("cell"))
  }

  /** Build (or fully rebuild) the at-rest graph from the at-rest
    * embedding layout: edges partitioned by source cell, the
    * reverse-probe index partitioned by probed cell, and the (k, nProbe)
    * sidecar. Bit-identical to [[KnnGraph.knnEdgesWithCents]] under the
    * layout's frozen centroids (spec-pinned). */
  def writeKnnGraph(spark: SparkSession, embPath: String, graphPath: String,
                    k: Int, nProbe: Int): Unit = {
    val cents = centroidsOf(spark, embPath)
    val layout = spark.read.parquet(embPath).select("vec_id", "embedding", "cell")
    val index = layout.select(col("cell"), col("vec_id"), col("embedding"))
    rankTopK(candidates(probeSideOf(layout, cents, nProbe), index), k)
      .write.mode(SaveMode.Overwrite).partitionBy("src_cell")
      .parquet(edgesPath(graphPath))
    val probeUdf = ProductQuantization.probeExpr(spark, cents, nProbe)
    layout.select(col("vec_id"), col("cell").as("own_cell"),
        explode(probeUdf(col("embedding"))).as("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(probesPath(graphPath))
    saveGraphMeta(spark, graphPath, k, nProbe)
  }

  /** The stored edge list in the shape every graph-family consumer takes
    * ([[KnnGraph.labelPropagate]], [[KnnGraph.pageRank]],
    * [[KnnGraph.mutualEdges]], [[clustersFromEdges]]): one read, no
    * cosine work. */
  def edgesAtRest(spark: SparkSession, graphPath: String): DataFrame =
    spark.read.parquet(edgesPath(graphPath))
      .select(col("src_id"), col("nbr_id"), col("sim"), col("rk"))

  /** The cluster tail of [[KnnGraph.semanticClustersWithCents]] factored
    * over an EXISTING edge list, so the at-rest graph feeds the same
    * component machinery the inline path uses. `ids` is the vector-id
    * universe (isolated vectors are their own components). */
  def clustersFromEdges(ids: DataFrame, edges: DataFrame, tau: Double): DataFrame = {
    val e = edges.filter(col("sim") >= tau)
      .select(col("src_id").as("doc_a"), col("nbr_id").as("doc_b"))
    DedupOps.connectedComponents(ids.select(col("vec_id").as("doc_id")), e)
      .select(col("doc_id").as("vec_id"), col("component"))
  }

  /** Full re-probe of the given sources against the current layout — the
    * repair path for sources whose stored lists went stale (a neighbor
    * was re-embedded or deleted, so the stored top-k no longer bounds the
    * candidate set). `srcs` carries (src_id, src_cell); cost ∝
    * |srcs| · nProbe · |cell|. */
  private def rebuildSources(spark: SparkSession, layout: DataFrame,
                             srcs: DataFrame, cents: Array[Array[Float]],
                             k: Int, nProbe: Int): DataFrame = {
    val srcCells = srcs.select("src_cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (srcCells.isEmpty)
      return spark.emptyDataFrame.select(lit(0L).as("src_id"),
        lit(0).as("src_cell"), lit(0L).as("nbr_id"),
        lit(0.0).as("sim"), lit(0).as("rk")).limit(0)
    val srcRows = layout.filter(col("cell").isInCollection(srcCells))
      .join(srcs.select(col("src_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val probeSide = materialized(probeSideOf(srcRows, cents, nProbe))
    val pCells = probeSide.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val index = layout.filter(col("cell").isInCollection(pCells))
      .select(col("cell"), col("vec_id"), col("embedding"))
    rankTopK(candidates(probeSide, index), k)
  }

  /** Incrementally fold a batch of arrivals (new vectors AND re-embeds)
    * into BOTH layouts: the embedding cells via
    * [[EmbeddingMaintenance.upsertVecs]], then the graph — each arrival
    * gets its own freshly probed top-k list, and every existing source
    * it can displace (found through the reverse-probe partitions of the
    * arrival cells — partition-pruned, batch-proportional) has its
    * stored top-k merged with the new candidates and re-ranked, which
    * equals the full rebuild exactly (see the object doc). Sources
    * holding a stale edge to a re-embedded id take the
    * [[rebuildSources]] repair path instead. Rewrites only the affected
    * edge/probe partitions via dynamic overwrite; untouched partitions
    * stay bit-identical at the file-listing level (the
    * [[CorpusMaintenance]] contract). */
  def upsertGraph(spark: SparkSession, embPath: String, graphPath: String,
                  changed: DataFrame): Unit = {
    val changedIds = changed.select("vec_id").collect().map(_.getLong(0)).toSeq
    if (changedIds.isEmpty) return
    val cents = centroidsOf(spark, embPath)
    val (k, nProbe) = loadGraphMeta(spark, graphPath)

    // pre-upsert facts about re-embedded ids (old rows must be surgically
    // replaced): their old source cells and old probe partitions
    val preLayout = spark.read.parquet(embPath)
    val present = preLayout.filter(col("vec_id").isInCollection(changedIds))
      .select("vec_id", "cell").collect()
    val reEmbedIds = present.map(_.getLong(0)).toSeq
    val oldSrcCells = present.map(_.getInt(1)).distinct.toSeq
    val oldProbeCells =
      if (reEmbedIds.isEmpty) Seq.empty[Int]
      else spark.read.parquet(probesPath(graphPath))
        .filter(col("vec_id").isInCollection(reEmbedIds))
        .select("cell").distinct().collect().map(_.getInt(0)).toSeq

    EmbeddingMaintenance.upsertVecs(spark, embPath, cents, changed)
    val layout = spark.read.parquet(embPath).select("vec_id", "embedding", "cell")

    val probeUdf = ProductQuantization.probeExpr(spark, cents, nProbe)
    val cellUdf = ProductQuantization.cellExpr(spark, cents)
    val arr = materialized(changed.select(col("vec_id"), col("embedding"))
      .withColumn("cell", cellUdf(col("embedding")))
      .withColumn("probes", probeUdf(col("embedding"))))
    val arrCells = arr.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val arrProbeCells = arr.select(explode(col("probes")).as("c"))
      .distinct().collect().map(_.getInt(0)).toSeq

    // displaced existing sources: exactly the vectors probing an arrival
    // cell (partition-pruned read of the reverse-probe index)
    val rev = spark.read.parquet(probesPath(graphPath))
      .filter(col("cell").isInCollection(arrCells))
      .filter(!col("vec_id").isInCollection(changedIds))

    // sources with a stale stored edge into a re-embedded id → repair
    // path (their stored sims no longer bound the candidate set)
    val repairSrcs = materialized(
      if (reEmbedIds.isEmpty)
        spark.emptyDataFrame.select(lit(0L).as("src_id"), lit(0).as("src_cell")).limit(0)
      else spark.read.parquet(edgesPath(graphPath))
        .filter(col("nbr_id").isInCollection(reEmbedIds))
        .filter(!col("src_id").isInCollection(changedIds))
        .select(col("src_id"), col("src_cell")).distinct())

    val mergeSrcs = materialized(rev.select(col("vec_id"), col("own_cell")).distinct()
      .join(repairSrcs.select(col("src_id").as("vec_id")), Seq("vec_id"), "left_anti"))
    val mergeOwnCells = mergeSrcs.select("own_cell").distinct()
      .collect().map(_.getInt(0)).toSeq

    // new candidates for merge sources: (source probing cell c) × (arrival
    // in cell c), cosine under the source embedding read from its own cell
    val srcEmb = layout
      .filter(if (mergeOwnCells.isEmpty) lit(false)
              else col("cell").isInCollection(mergeOwnCells))
      .join(mergeSrcs.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("src_id"), col("embedding").as("src_emb"),
        col("cell").as("src_cell"))
    val newCand = rev
      .join(mergeSrcs.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("src_id"), col("cell"))
      .join(arr.select(col("cell"), col("vec_id").as("nbr_id"),
        col("embedding").as("nbr_emb")), Seq("cell"))
      .join(srcEmb, Seq("src_id"))
      .select(col("src_id"), col("src_cell"), col("nbr_id"),
        round(graft.functions.CosineSimilarity(col("src_emb"), col("nbr_emb")), 6)
          .as("sim"))

    // stored top-k of merge sources (≤ k rows each — the merge identity)
    val oldEdges = spark.read.parquet(edgesPath(graphPath))
      .filter(if (mergeOwnCells.isEmpty) lit(false)
              else col("src_cell").isInCollection(mergeOwnCells))
      .join(mergeSrcs.select(col("vec_id").as("src_id")), Seq("src_id"), "left_semi")
      .select(col("src_id"), col("src_cell"), col("nbr_id"), col("sim"))
    val mergedEdges = rankTopK(oldEdges.unionByName(newCand), k)

    // the arrivals' own lists against the post-upsert layout (includes
    // arrival↔arrival edges — the index side already holds the batch)
    val arrProbeSide = arr.select(col("vec_id").as("src_id"),
      col("embedding").as("src_emb"), col("cell").as("src_cell"),
      explode(col("probes")).as("cell"))
    val arrIndex = layout
      .filter(if (arrProbeCells.isEmpty) lit(false)
              else col("cell").isInCollection(arrProbeCells))
      .select(col("cell"), col("vec_id"), col("embedding"))
    val arrEdges = rankTopK(candidates(arrProbeSide, arrIndex), k)

    val repairedEdges = rebuildSources(spark, layout, repairSrcs, cents, k, nProbe)
    val repairCells = repairSrcs.select("src_cell").distinct()
      .collect().map(_.getInt(0)).toSeq

    // affected edge partitions: merge-source cells, arrival cells (new
    // AND pre-move), repair cells; replaced sources drop, everything
    // else in those partitions is carried through the dynamic overwrite
    val affectedCells =
      (mergeOwnCells ++ arrCells ++ oldSrcCells ++ repairCells).distinct
    val replaced = mergeSrcs.select(col("vec_id").as("src_id"))
      .unionByName(repairSrcs.select("src_id"))
      .unionByName(arr.select(col("vec_id").as("src_id")))
    val untouchedRows = spark.read.parquet(edgesPath(graphPath))
      .filter(col("src_cell").isInCollection(affectedCells))
      .join(replaced, Seq("src_id"), "left_anti")
      .select("src_id", "src_cell", "nbr_id", "sim", "rk")
    val finalEdges = materialized(untouchedRows
      .unionByName(mergedEdges).unionByName(arrEdges).unionByName(repairedEdges))
    withDynamicOverwrite(spark) {
      finalEdges.write.mode(SaveMode.Overwrite).partitionBy("src_cell")
        .parquet(edgesPath(graphPath))
    }
    reclaimEmpty(spark, edgesPath(graphPath), "src_cell", affectedCells,
      finalEdges.select("src_cell").distinct().collect().map(_.getInt(0)).toSet)

    // probe index: arrival rows replace any old rows of the same ids in
    // the affected probe partitions
    val affectedProbeCells = (arrProbeCells ++ oldProbeCells).distinct
    val probeUntouched = spark.read.parquet(probesPath(graphPath))
      .filter(col("cell").isInCollection(affectedProbeCells))
      .filter(!col("vec_id").isInCollection(changedIds))
      .select("vec_id", "own_cell", "cell")
    val probeNew = arr.select(col("vec_id"), col("cell").as("own_cell"),
      explode(col("probes")).as("cell"))
    val finalProbes = materialized(probeUntouched.unionByName(probeNew))
    withDynamicOverwrite(spark) {
      finalProbes.write.mode(SaveMode.Overwrite).partitionBy("cell")
        .parquet(probesPath(graphPath))
    }
    reclaimEmpty(spark, probesPath(graphPath), "cell", affectedProbeCells,
      finalProbes.select("cell").distinct().collect().map(_.getInt(0)).toSet)
  }

  /** Remove vectors from BOTH layouts. The stored top-k of a source
    * pointing at a victim cannot be patched (its (k+1)-th candidate was
    * never stored), so those sources take the full re-probe repair
    * against the post-delete layout — found by one column-pruned
    * (src_id, nbr_id) scan of the edge list. */
  def deleteFromGraph(spark: SparkSession, embPath: String, graphPath: String,
                      ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    val cents = centroidsOf(spark, embPath)
    val (k, nProbe) = loadGraphMeta(spark, graphPath)
    val victimCells = EmbeddingMaintenance.cellsOf(spark, embPath, ids)
    val reverseSrcs = materialized(spark.read.parquet(edgesPath(graphPath))
      .filter(col("nbr_id").isInCollection(ids))
      .filter(!col("src_id").isInCollection(ids))
      .select(col("src_id"), col("src_cell")).distinct())
    val victimProbeCells = spark.read.parquet(probesPath(graphPath))
      .filter(col("vec_id").isInCollection(ids))
      .select("cell").distinct().collect().map(_.getInt(0)).toSeq

    EmbeddingMaintenance.deleteVecs(spark, embPath, ids)
    val layout = spark.read.parquet(embPath).select("vec_id", "embedding", "cell")

    val repairedEdges = rebuildSources(spark, layout, reverseSrcs, cents, k, nProbe)
    val repairCells = reverseSrcs.select("src_cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val affectedCells = (victimCells ++ repairCells).distinct
    if (affectedCells.nonEmpty) {
      val replaced = reverseSrcs.select("src_id")
      val untouchedRows = spark.read.parquet(edgesPath(graphPath))
        .filter(col("src_cell").isInCollection(affectedCells))
        .filter(!col("src_id").isInCollection(ids))
        .join(replaced, Seq("src_id"), "left_anti")
        .select("src_id", "src_cell", "nbr_id", "sim", "rk")
      val finalEdges = materialized(untouchedRows.unionByName(repairedEdges))
      withDynamicOverwrite(spark) {
        finalEdges.write.mode(SaveMode.Overwrite).partitionBy("src_cell")
          .parquet(edgesPath(graphPath))
      }
      reclaimEmpty(spark, edgesPath(graphPath), "src_cell", affectedCells,
        finalEdges.select("src_cell").distinct().collect().map(_.getInt(0)).toSet)
    }
    if (victimProbeCells.nonEmpty) {
      val finalProbes = materialized(spark.read.parquet(probesPath(graphPath))
        .filter(col("cell").isInCollection(victimProbeCells))
        .filter(!col("vec_id").isInCollection(ids))
        .select("vec_id", "own_cell", "cell"))
      withDynamicOverwrite(spark) {
        finalProbes.write.mode(SaveMode.Overwrite).partitionBy("cell")
          .parquet(probesPath(graphPath))
      }
      reclaimEmpty(spark, probesPath(graphPath), "cell", victimProbeCells,
        finalProbes.select("cell").distinct().collect().map(_.getInt(0)).toSet)
    }
  }

  /** Dynamic overwrite cannot express an emptied partition — stale files
    * would resurrect dropped rows ([[EmbeddingMaintenance]]'s rule). */
  private def reclaimEmpty(spark: SparkSession, path: String, colName: String,
                           affected: Seq[Int], kept: Set[Int]): Unit = {
    val emptied = affected.filterNot(kept)
    if (emptied.nonEmpty) {
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach(c => fs.delete(new Path(path, s"$colName=$c"), true))
    }
  }

  /** One sidecar-backed self-healing cycle over BOTH artifacts — the
    * graph twin of [[EmbeddingMaintenance.maintainPersistent]]: fold the
    * batch into the cells and the edges incrementally, then (at the
    * caller's audit cadence) check the index's drift/recall triggers.
    * When one fires the quantizer is retrained — which moves cell
    * boundaries, so the graph's candidate discipline changes wholesale
    * and the edge list is REBUILT under the fresh centroids (the same
    * reasoning as the index's own full rewrite: after recluster there is
    * nothing surgical to preserve). Returns the trigger reasons (empty =
    * incremental only). */
  def maintainGraphPersistent(spark: SparkSession, embPath: String,
                              graphPath: String, changed: DataFrame,
                              audit: Boolean, targetCell: Int = 500,
                              recallFloor: Double = 0.0, recallK: Int = 5,
                              recallNProbe: Int = 1,
                              recallPanelN: Int = 16): Seq[String] = {
    upsertGraph(spark, embPath, graphPath, changed)
    if (!audit) Seq.empty
    else {
      val (cents, baseline) = EmbeddingMaintenance.loadQuantizer(spark, embPath)
        .getOrElse(sys.error(s"no quantizer sidecar at $embPath"))
      var reasons = EmbeddingMaintenance.driftReasons(baseline,
        EmbeddingMaintenance.layoutStats(spark, embPath, cents))
      if (reasons.isEmpty && recallFloor > 0.0) {
        val r = EmbeddingMaintenance.recallAudit(spark, embPath, cents,
          recallK, recallNProbe, recallPanelN)
        if (r < recallFloor)
          reasons = Seq(f"recall@$recallK%d $r%.4f below floor $recallFloor%.4f at nProbe=$recallNProbe%d")
      }
      if (reasons.nonEmpty) {
        val fresh = EmbeddingMaintenance.recluster(spark, embPath, targetCell)
        EmbeddingMaintenance.saveQuantizer(spark, embPath, fresh,
          EmbeddingMaintenance.layoutStats(spark, embPath, fresh))
        val (k, nProbe) = loadGraphMeta(spark, graphPath)
        writeKnnGraph(spark, embPath, graphPath, k, nProbe)
      }
      reasons
    }
  }
}
