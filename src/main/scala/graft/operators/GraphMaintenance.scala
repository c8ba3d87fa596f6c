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
  * persists it next to the IVF index, and folds arrivals in incrementally.
  *
  * Layout (rooted at `graphPath`):
  *  - `edges/`  — partitioned by `src_cell` (the source's coarse cell),
  *    rows carry a GENERATION and a KIND in `rk`:
  *      rk ≥ 1  a full top-k list row (authoritative for its source at
  *              its generation — a newer full list supersedes older rows);
  *      rk = 0  a CHALLENGER row — an arrival candidate for an existing
  *              source, additive since that source's last full list;
  *      rk = −1 a tombstone (the source left this graph);
  *  - `probes/` — the REVERSE-PROBE index partitioned by each PROBED
  *    cell: (vec_id, own_cell, alive, gen). An arrival lands in cell c
  *    and the only existing sources whose top-k can change are exactly
  *    the vectors that probe c — one partition-pruned read, never a
  *    corpus scan (a source u sees candidate w iff w's cell ∈ u's probe
  *    list, which is fixed under frozen centroids);
  *  - `<graphPath>.graph.json` — (k, nProbe, gen) sidecar. The CENTROIDS
  *    deliberately live in ONE place — the embedding layout's own
  *    quantizer sidecar ([[EmbeddingMaintenance]]) — so the graph and
  *    the index it derives from cannot drift apart.
  *
  * WHY merge-on-read (the round-14 lesson, measured): the first cut
  * rewrote affected `src_cell` partitions per batch, and a soak showed a
  * 1000-vector batch spread across a 50-center corpus touches EVERY cell
  * — the "incremental" pass rewrote the whole layout and came out SLOWER
  * than a full rebuild (41 s vs 25 s at 50 k). Partition-granular
  * rewrites cannot be batch-proportional for spread arrivals; the
  * structure that can is the LSM one every production vector/graph store
  * uses: the batch APPENDS (new sources' full lists + challenger rows
  * for displaced sources), existing files are never touched, and the
  * reader resolves per source — which is EXACT, because with frozen
  * centroids an arrival only ADDS candidates and
  * top-k(A ∪ B) = top-k(top-k(A) ∪ B): the stored full list plus its
  * challengers re-ranked IS the full rebuild, bit for bit (spec-pinned).
  * [[compactGraph]] folds the log back to one generation at maintenance
  * cadence, amortized like any compaction.
  *
  * Re-embeds and deletes invalidate stored rows (a stale neighbor's
  * (k+1)-th-place successor was never kept), so the sources holding one
  * take a full re-probe repair appended as fresh full lists; finding
  * them is one column-pruned (src_id, nbr_id) scan — corpus-linear
  * METADATA at 16 bytes/row, while the cosine work stays proportional
  * to the affected set. Insert-only ingest never pays it.
  */
object GraphMaintenance {

  import MaintenanceIO.materialized

  private def edgesPath(graphPath: String) = graphPath + "/edges"
  private def probesPath(graphPath: String) = graphPath + "/probes"
  private def sidecar(graphPath: String) = new Path(graphPath + ".graph.json")

  /** (k, nProbe, gen) sidecar — atomic write-then-rename like the
    * quantizer sidecar, so a maintainer never sees a torn config. */
  def saveGraphMeta(spark: SparkSession, graphPath: String,
                    k: Int, nProbe: Int, gen: Long): Unit = {
    val fs = sidecar(graphPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(graphPath + ".graph.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"k":$k,"nProbe":$nProbe,"gen":$gen}""".getBytes("UTF-8"))
    finally out.close()
    fs.delete(sidecar(graphPath), false)
    require(fs.rename(tmp, sidecar(graphPath)),
      s"could not promote graph sidecar for $graphPath")
  }

  def loadGraphMeta(spark: SparkSession, graphPath: String): (Int, Int, Long) = {
    val fs = sidecar(graphPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(sidecar(graphPath)),
      s"no graph sidecar at $graphPath — create the layout with writeKnnGraph")
    val in = fs.open(sidecar(graphPath))
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val m = JsonMethods.parse(raw).asInstanceOf[JObject].obj.toMap
    def long(v: JValue): Long = v match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case other => sys.error(s"bad number in graph sidecar: $other")
    }
    (long(m("k")).toInt, long(m("nProbe")).toInt, long(m("gen")))
  }

  /** Step profiler for the maintenance paths (SPARK_GRAFT_PROFILE=1 →
    * one stderr line per materialization/write) — the soak's first stop
    * when an "incremental" number fails to track the batch. */
  private def prof[A](what: String)(body: => A): A =
    if (sys.env.get("SPARK_GRAFT_PROFILE").contains("1")) {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[graph-prof] $what%-20s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    } else body

  private def centroidsOf(spark: SparkSession, embPath: String): Array[Array[Float]] =
    EmbeddingMaintenance.loadQuantizer(spark, embPath).getOrElse(sys.error(
      s"no quantizer sidecar at $embPath — create the index with " +
        "writeCellLayoutPersistent"))._1

  /** The exact [[KnnGraph.knnEdgesWithCents]] top-k discipline
    * ((sim DESC, nbr_id) row_number ≤ k) over any candidate set carrying
    * (src_id, src_cell, nbr_id, sim). */
  private def rankTopK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("src_id").orderBy(desc("sim"), col("nbr_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("src_id"), col("src_cell"), col("nbr_id"), col("sim"), col("rk"))
  }

  /** Candidate edges: probe side × stored index side — the
    * [[KnnGraph.knnEdgesWithCents]] body with the index cell read from
    * the STORED layout column (identical values: the layout was written
    * under the same frozen centroids). */
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

  private def writeEdges(df: DataFrame, graphPath: String, gen: Long,
                         append: Boolean): Unit =
    df.withColumn("gen", lit(gen))
      .write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .partitionBy("src_cell").parquet(edgesPath(graphPath))

  /** Build (or fully rebuild) the at-rest graph from the at-rest
    * embedding layout: generation-0 edges, the reverse-probe index, and
    * the sidecar. Bit-identical to [[KnnGraph.knnEdgesWithCents]] under
    * the layout's frozen centroids (spec-pinned). */
  def writeKnnGraph(spark: SparkSession, embPath: String, graphPath: String,
                    k: Int, nProbe: Int): Unit = {
    val cents = centroidsOf(spark, embPath)
    val layout = spark.read.parquet(embPath).select("vec_id", "embedding", "cell")
    val index = layout.select(col("cell"), col("vec_id"), col("embedding"))
    // one file per cell partition: a cell holds ≈ targetCell·k edge rows
    // under the adaptive contract, so per-cell files stay bounded at any
    // corpus size while the file COUNT tracks nList (scattering every
    // task across every partition value would multiply it by the task
    // count — the small-file debt every later read pays)
    writeEdges(rankTopK(candidates(probeSideOf(layout, cents, nProbe), index), k)
        .repartition(col("src_cell")),
      graphPath, gen = 0L, append = false)
    val probeUdf = ProductQuantization.probeExpr(spark, cents, nProbe)
    layout.select(col("vec_id"), col("cell").as("own_cell"), lit(true).as("alive"),
        lit(0L).as("gen"), explode(probeUdf(col("embedding"))).as("cell"))
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(probesPath(graphPath))
    saveGraphMeta(spark, graphPath, k, nProbe, gen = 0L)
  }

  /** Resolve the edge log into the CURRENT graph — the merge-on-read
    * step. Per source: its newest full list (rk ≥ 1 rows of the max
    * authoritative generation) plus every challenger appended SINCE that
    * list, re-ranked top-k — exactly the rebuild by the merge identity.
    * Tombstoned sources resolve to nothing. One src-keyed window pass
    * over base + delta rows; [[compactGraph]] keeps the delta short. */
  def edgesAtRest(spark: SparkSession, graphPath: String): DataFrame = {
    val (k, _, _) = loadGraphMeta(spark, graphPath)
    resolveEdges(spark.read.parquet(edgesPath(graphPath)), k)
  }

  private def resolveEdges(raw: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("src_id")
    // authoritative generations: the newest full list and the newest
    // tombstone. A tombstone kills the source only when STRICTLY newer
    // than any full list (a re-embed writes its fresh list and the
    // old-cell tombstone in the SAME generation — the list wins); a
    // deleted id can't accrue later challengers because its probe rows
    // are tombstoned in the same batch.
    val withAuth = raw
      .withColumn("full_gen", max(when(col("rk") >= 1, col("gen"))).over(w))
      .withColumn("tomb_gen", max(when(col("rk") === -1, col("gen"))).over(w))
    val live = withAuth
      .filter(col("tomb_gen").isNull ||
        col("tomb_gen") <= coalesce(col("full_gen"), lit(-1L)))
      .filter((col("rk") >= 1 && col("gen") === col("full_gen")) ||
        (col("rk") === 0 && col("gen") > coalesce(col("full_gen"), lit(-1L))))
    rankTopK(live.select(col("src_id"), col("src_cell"), col("nbr_id"), col("sim")), k)
      .select(col("src_id"), col("nbr_id"), col("sim"), col("rk"))
  }

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
    * repair path for stale stored lists (a neighbor was re-embedded or
    * deleted). `srcs` carries (src_id, src_cell); cost ∝
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

  /** Live reverse-probe rows for the given probed cells — a
    * partition-pruned read with per-(vec, cell) latest-generation
    * resolution (re-embeds tombstone their old probe rows IN PLACE, so
    * the pruned read never needs other partitions to decide liveness). */
  private def liveProbes(spark: SparkSession, graphPath: String,
                         cells: Seq[Int]): DataFrame = {
    val w = Window.partitionBy("vec_id", "cell")
    spark.read.parquet(probesPath(graphPath))
      .filter(if (cells.isEmpty) lit(false) else col("cell").isInCollection(cells))
      .withColumn("mg", max("gen").over(w)).filter(col("gen") === col("mg"))
      .filter(col("alive"))
      .select("vec_id", "own_cell", "cell")
  }

  /** Incrementally fold a batch of arrivals (new vectors AND re-embeds)
    * into BOTH layouts, append-only on the graph side:
    *  - brand-new vectors append into the embedding cells (new files
    *    only), get their own freshly probed full lists, and become
    *    CHALLENGER rows for every existing source that probes their
    *    cells (found through the reverse-probe partitions —
    *    partition-pruned); nothing existing is rewritten, and the
    *    reader's merge equals the full rebuild exactly;
    *  - re-embeds go through the index's surgical upsert, their old
    *    edge/probe rows are tombstoned, their own lists and the lists of
    *    every source that held a stale edge to them are re-probed and
    *    appended as fresh full lists. */
  def upsertGraph(spark: SparkSession, embPath: String, graphPath: String,
                  changed: DataFrame): Unit = {
    val changedIds = changed.select("vec_id").collect().map(_.getLong(0)).toSeq
    if (changedIds.isEmpty) return
    val cents = centroidsOf(spark, embPath)
    val (k, nProbe, gen) = loadGraphMeta(spark, graphPath)
    val thisGen = gen + 1

    // pre-upsert facts about re-embedded ids
    val present = prof("present-lookup")(spark.read.parquet(embPath)
      .filter(col("vec_id").isInCollection(changedIds))
      .select("vec_id", "cell").collect())
    val reEmbedIds = present.map(_.getLong(0)).toSeq
    val oldCellOf = present.map(r => r.getLong(0) -> r.getInt(1)).toMap

    // index side: pure inserts APPEND (new files only); re-embeds take
    // the surgical rewrite for exactly their rows
    val cellUdf = ProductQuantization.cellExpr(spark, cents)
    val newRows = if (reEmbedIds.isEmpty) changed
      else changed.filter(!col("vec_id").isInCollection(reEmbedIds))
    val reRows = if (reEmbedIds.isEmpty) changed.limit(0)
      else changed.filter(col("vec_id").isInCollection(reEmbedIds))
    if (reEmbedIds.size < changedIds.size)
      prof("index-append")(newRows.withColumn("cell", cellUdf(col("embedding")))
        .write.mode(SaveMode.Append).partitionBy("cell").parquet(embPath))
    if (reEmbedIds.nonEmpty)
      EmbeddingMaintenance.upsertVecs(spark, embPath, cents, reRows)
    val layout = spark.read.parquet(embPath).select("vec_id", "embedding", "cell")

    val probeUdf = ProductQuantization.probeExpr(spark, cents, nProbe)
    val arr = prof("arr-materialize")(materialized(changed.select(col("vec_id"), col("embedding"))
      .withColumn("cell", cellUdf(col("embedding")))
      .withColumn("probes", probeUdf(col("embedding")))))
    val arrCells = arr.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val arrProbeCells = arr.select(explode(col("probes")).as("c"))
      .distinct().collect().map(_.getInt(0)).toSeq

    // the arrivals' own full lists against the post-upsert layout
    // (includes arrival↔arrival edges — the index already holds the batch)
    val arrProbeSide = arr.select(col("vec_id").as("src_id"),
      col("embedding").as("src_emb"), col("cell").as("src_cell"),
      explode(col("probes")).as("cell"))
    val arrIndex = layout
      .filter(if (arrProbeCells.isEmpty) lit(false)
              else col("cell").isInCollection(arrProbeCells))
      .select(col("cell"), col("vec_id"), col("embedding"))
    val arrEdges = rankTopK(candidates(arrProbeSide, arrIndex), k)

    // challenger rows: (existing source probing an arrival cell) ×
    // (arrival in that cell) — rk = 0, folded in by the reader
    val rev = liveProbes(spark, graphPath, arrCells)
      .filter(!col("vec_id").isInCollection(changedIds))
    val revSrcs = prof("rev-sources")(materialized(rev.select(col("vec_id"), col("own_cell")).distinct()))
    val srcCells = revSrcs.select("own_cell").distinct().collect().map(_.getInt(0)).toSeq
    val srcEmb = layout
      .filter(if (srcCells.isEmpty) lit(false)
              else col("cell").isInCollection(srcCells))
      .join(revSrcs.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("src_id"), col("embedding").as("src_emb"),
        col("cell").as("src_cell"))
    val challengersAll = rev
      .select(col("vec_id").as("src_id"), col("cell"))
      .join(arr.select(col("cell"), col("vec_id").as("nbr_id"),
        col("embedding").as("nbr_emb")), Seq("cell"))
      .join(srcEmb, Seq("src_id"))
      .select(col("src_id"), col("src_cell"), col("nbr_id"),
        round(graft.functions.CosineSimilarity(col("src_emb"), col("nbr_emb")), 6)
          .as("sim"))
    // EXACT pre-cut before anything is appended — without it every
    // affected source logs ~nProbe·batch/nList rows per batch and the
    // log grows with the corpus (measured: the uncut form's append was
    // the remaining corpus-proportional term):
    //  1. kth-sim floor: a challenger below the source's LATEST FULL
    //     LIST's k-th sim can never enter top-k (candidates only raise
    //     the true k-th; ties kept — (sim, nbr_id) can still displace on
    //     the id tiebreak). The floor is one column-pruned read of the
    //     rk = k rows at each source's newest full generation; sources
    //     with < k edges have no floor and keep everything.
    //  2. per-source top-k cap: top-k(old ∪ C) = top-k(old ∪ top-k(C)).
    // Appended volume is then ∝ actual displacements, not candidates.
    val wf = Window.partitionBy("src_id")
    val kthFloor = spark.read.parquet(edgesPath(graphPath))
      // partition-pruned to the affected sources' cells: at production
      // nList >> batch this is batch-bounded; only a source resident in
      // one of these cells can appear in the challenger set
      .filter(if (srcCells.isEmpty) lit(false)
              else col("src_cell").isInCollection(srcCells))
      .filter(col("rk") >= 1)
      .withColumn("fg", max("gen").over(wf)).filter(col("gen") === col("fg"))
      .filter(col("rk") === k)
      .select(col("src_id"), col("sim").as("kth_sim"))
    val wc = Window.partitionBy("src_id").orderBy(desc("sim"), col("nbr_id"))
    val challengers = challengersAll
      .join(kthFloor, Seq("src_id"), "left")
      .filter(col("kth_sim").isNull || col("sim") >= col("kth_sim"))
      .withColumn("crk", row_number().over(wc)).filter(col("crk") <= k)
      .select(col("src_id"), col("src_cell"), col("nbr_id"), col("sim"),
        lit(0).as("rk"))

    // stale-pointer repairs: sources holding an edge to a re-embedded id
    // get fresh full lists (their stored sims no longer bound anything)
    // (current cell looked up from the LAYOUT, the single source of
    // truth — a probes row's own_cell can be stale for sources
    // re-embedded in EARLIER batches)
    val repairSrcs = materialized(
      if (reEmbedIds.isEmpty)
        spark.emptyDataFrame.select(lit(0L).as("src_id"), lit(0).as("src_cell")).limit(0)
      else resolveEdges(spark.read.parquet(edgesPath(graphPath)), k)
        .filter(col("nbr_id").isInCollection(reEmbedIds))
        .filter(!col("src_id").isInCollection(changedIds))
        .select("src_id").distinct()
        .join(layout.select(col("vec_id").as("src_id"),
          col("cell").as("src_cell")), Seq("src_id"), "inner"))
    val repairedEdges = rebuildSources(spark, layout, repairSrcs, cents, k, nProbe)
    // a repaired source's fresh list supersedes its older challengers,
    // so challengers for repair sources this batch are dropped to keep
    // the log unambiguous (their candidates are already in the re-probe)
    val challengersClean = challengers
      .join(repairSrcs.select("src_id"), Seq("src_id"), "left_anti")

    // tombstones for re-embedded ids' OLD rows (their fresh lists land in
    // arrEdges at this generation; old-cell rows must stop resolving)
    import spark.implicits._
    val edgeTombs =
      if (reEmbedIds.isEmpty) None
      else Some(reEmbedIds.map(id => (id, oldCellOf(id), 0L, 0.0, -1))
        .toDF("src_id", "src_cell", "nbr_id", "sim", "rk"))

    // one file per touched partition per batch: a 32-task append across
    // ~nList partition values would otherwise create tasks × cells tiny
    // files per batch (measured as the dominant incremental overhead at
    // 50 k — file creation, then listing on every later read)
    val allEdges = Seq(Some(arrEdges), Some(challengersClean),
      Some(repairedEdges), edgeTombs).flatten.reduce(_ unionByName _)
    val allEdgesM = prof("edge-delta-compute")(materialized(allEdges))
    prof("edge-delta-write")(writeEdges(allEdgesM.repartition(col("src_cell")),
      graphPath, thisGen, append = true))

    // probe index: arrivals append their live rows; re-embeds tombstone
    // their old probe rows in place (same partitions, append-only)
    val probeNew = arr.select(col("vec_id"), col("cell").as("own_cell"),
      lit(true).as("alive"), explode(col("probes")).as("cell"))
    val probeTombs =
      if (reEmbedIds.isEmpty) None
      else Some(spark.read.parquet(probesPath(graphPath))
        .filter(col("vec_id").isInCollection(reEmbedIds))
        .select("vec_id", "own_cell", "cell").distinct()
        .withColumn("alive", lit(false)))
    prof("probe-delta-write")(
      materialized(Seq(Some(probeNew), probeTombs).flatten.reduce(_ unionByName _)
          .select(col("vec_id"), col("own_cell"), col("alive"),
            lit(thisGen).as("gen"), col("cell")))
        .repartition(col("cell"))
        .write.mode(SaveMode.Append).partitionBy("cell").parquet(probesPath(graphPath)))

    saveGraphMeta(spark, graphPath, k, nProbe, thisGen)
  }

  /** Remove vectors from BOTH layouts: edge + probe tombstones for the
    * victims (append-only), fresh full lists for every source that
    * pointed at one (the repair path, against the post-delete layout). */
  def deleteFromGraph(spark: SparkSession, embPath: String, graphPath: String,
                      ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    val cents = centroidsOf(spark, embPath)
    val (k, nProbe, gen) = loadGraphMeta(spark, graphPath)
    val thisGen = gen + 1
    val victimCells = spark.read.parquet(embPath)
      .filter(col("vec_id").isInCollection(ids))
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1))
    val reverseIds = materialized(resolveEdges(
        spark.read.parquet(edgesPath(graphPath)), k)
      .filter(col("nbr_id").isInCollection(ids))
      .filter(!col("src_id").isInCollection(ids))
      .select("src_id").distinct())

    EmbeddingMaintenance.deleteVecs(spark, embPath, ids)
    val layout = spark.read.parquet(embPath).select("vec_id", "embedding", "cell")
    // survivors' cells from the post-delete layout (the source of truth)
    val reverseSrcs = materialized(reverseIds.join(
      layout.select(col("vec_id").as("src_id"), col("cell").as("src_cell")),
      Seq("src_id"), "inner"))
    val repairedEdges = rebuildSources(spark, layout, reverseSrcs, cents, k, nProbe)

    import spark.implicits._
    val edgeTombs = victimCells.toSeq.map { case (id, c) => (id, c, 0L, 0.0, -1) }
      .toDF("src_id", "src_cell", "nbr_id", "sim", "rk")
    writeEdges(materialized(repairedEdges.unionByName(edgeTombs)),
      graphPath, thisGen, append = true)

    val probeTombs = spark.read.parquet(probesPath(graphPath))
      .filter(col("vec_id").isInCollection(ids))
      .select("vec_id", "own_cell", "cell").distinct()
      .withColumn("alive", lit(false)).withColumn("gen", lit(thisGen))
      .select("vec_id", "own_cell", "alive", "gen", "cell")
    materialized(probeTombs)
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(probesPath(graphPath))
    saveGraphMeta(spark, graphPath, k, nProbe, thisGen)
  }

  /** Fold the edge/probe logs back to one generation — the LSM
    * compaction, run at maintenance cadence (rows resolved exactly as
    * [[edgesAtRest]] reads them, so the compacted graph is bit-identical
    * to the pre-compaction view; spec-pinned). */
  def compactGraph(spark: SparkSession, embPath: String, graphPath: String): Unit = {
    val (k, nProbe, _) = loadGraphMeta(spark, graphPath)
    val layout = spark.read.parquet(embPath).select(
      col("vec_id").as("src_id"), col("cell").as("src_cell"))
    val resolved = materialized(edgesAtRest(spark, graphPath)
      .join(layout, Seq("src_id"))
      .select("src_id", "src_cell", "nbr_id", "sim", "rk"))
    writeEdges(resolved, graphPath, gen = 0L, append = false)
    val w = Window.partitionBy("vec_id", "cell")
    val probes = materialized(spark.read.parquet(probesPath(graphPath))
      .withColumn("mg", max("gen").over(w)).filter(col("gen") === col("mg"))
      .filter(col("alive"))
      .select(col("vec_id"), col("own_cell"), lit(true).as("alive"),
        lit(0L).as("gen"), col("cell")))
    // STATIC overwrite: the whole directory is replaced, so partitions
    // whose every probe row died disappear with it
    probes.write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(probesPath(graphPath))
    saveGraphMeta(spark, graphPath, k, nProbe, gen = 0L)
  }

  /** One sidecar-backed self-healing cycle over BOTH artifacts — the
    * graph twin of [[EmbeddingMaintenance.maintainPersistent]]: fold the
    * batch in append-only, then (at the caller's audit cadence) check
    * the index's drift/recall triggers. When one fires the quantizer is
    * retrained — which moves cell boundaries, so the graph's candidate
    * discipline changes wholesale and the edge list is REBUILT under the
    * fresh centroids. Returns the trigger reasons (empty = incremental
    * only). */
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
        val (k, nProbe, _) = loadGraphMeta(spark, graphPath)
        writeKnnGraph(spark, embPath, graphPath, k, nProbe)
      }
      reasons
    }
  }
}
