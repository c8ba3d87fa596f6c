package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.HashKernels

/** Structured Streaming forms of the corpus-pipeline operators — the
  * ingest-time path of the same ops the batch queries run over stored
  * corpora (q24 exact dedup, q47 quality filtering, q49 decontamination,
  * q69 token-budget admission). Like [[EventStreams]], every transform is
  * a source-agnostic DataFrame→DataFrame function that runs identically on
  * a static frame (CorpusStreamsSpec asserts batch parity on both).
  *
  * Scale/state notes:
  *  - decontamination and quality filtering are STATELESS (narrow map +
  *    filter), so they need no watermark and restart trivially; the
  *    benchmark shingle set is fixed at query start — redeploy the
  *    stream to pick up a new eval corpus, exactly like production
  *    decontamination filters.
  *  - streaming exact dedup keys on the 128-bit content hash (never the
  *    text) within the watermark horizon; state is bounded by the horizon
  *    and entries are evicted by `dropDuplicatesWithinWatermark`.
  *  - token-budget admission keeps ONE long per source as state (the
  *    tokens consumed so far) — constant-size state per group forever,
  *    no watermark needed.
  */
object CorpusStreams {

  /** Normalized-content md5 — the q24 dedup key (whitespace-collapsed). */
  private def contentHash = md5(concat_ws(" ", split(trim(col("text")), "\\s+")))

  /** Streaming exact dedup on document content within the watermark
    * horizon: first arrival of each distinct content wins, duplicates are
    * dropped. `ts` is the document's ingest event-time column. */
  def dedupDocs(docs: DataFrame, horizon: String = "2 hours"): DataFrame =
    docs
      .withColumn("content_hash", contentHash)
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming NEAR-dup admission — the ingest-time form of q28/q64's
    * signature collapse: key on the 64-bit SimHash of the token set, admit
    * the first document per signature within the watermark horizon. Docs
    * that differ only in token order / repetition / whitespace collide on
    * the signature and are dropped even when their content hash differs —
    * the cheap near-dup tier between exact [[dedupDocs]] and an offline
    * Hamming-banded pass (q64), which stays a batch job by design (banding
    * needs a self-join over the accumulated corpus, not per-row state).
    * State per signature is one 8-byte key in the dedup map, horizon-
    * bounded like [[dedupDocs]]. */
  def nearDupAdmission(docs: DataFrame, horizon: String = "2 hours"): DataFrame =
    docs
      .withColumn("sh",
        HashKernels.simhash64(split(trim(col("text")), "\\s+")).getField("_1"))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("sh")

  /** Streaming decontamination: annotate (and filter) a document stream
    * against the benchmark's distinct shingle set — the streaming form of
    * the q49 set-probe plan (`DedupOps.decontaminate`). Emits the clean
    * documents with the same (n_sh, n_hits) accounting as the batch
    * operator. */
  def decontaminate(docs: DataFrame, benchShingles: Set[String]): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(benchShingles)
    val nHits = udf { shs: Seq[String] => shs.count(bc.value.contains).toLong }
    docs
      .withColumn("l", split(trim(col("text")), "\\s+"))
      .filter(size(col("l")) >= 3)
      .withColumn("shs", HashKernels.shingles3(col("l")))
      .withColumn("n_sh", size(col("shs")).cast("long"))
      .withColumn("n_hits", nHits(col("shs")))
      .filter(col("n_hits") === 0)
      .drop("l", "shs")
  }

  /** Streaming corpus quality filter — q47's keep-rule (≥10 cleaned
    * tokens, ≥25 % alphabetic) applied at ingest. Stateless narrow
    * projection + filter: runs at scan speed on a static frame and with
    * zero state in a stream. */
  def qualityFilter(docs: DataFrame): DataFrame = {
    val cleaned = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val alpha = length(regexp_replace(cleaned, "[^a-z]", ""))
    docs
      .withColumn("n_clean_tokens", size(split(cleaned, " ")))
      .withColumn("alpha_ratio",
        alpha.cast("double") / greatest(length(cleaned), lit(1)))
      .filter(col("n_clean_tokens") >= 10 && col("alpha_ratio") >= 0.25)
  }

  /** Streaming language-mix monitor — the ingest-time form of q79's drift
    * audit: per event-time window, per (source, lang) document counts,
    * watermarked so state is horizon-bounded. ONE stateful aggregation
    * (append-safe); the drift statistic itself (TVD vs the global mix) is
    * a stateless batch post-process over the emitted counts, exactly like
    * the batch operator's window-totals stage — run it on the sink table
    * ([[PackingOps.q79LangDrift]] semantics) per closed window. */
  def langMixByWindow(docs: DataFrame, windowLen: String = "10 minutes",
                      horizon: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", horizon)
      .groupBy(window(col("ts"), windowLen), col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("source"), col("lang"), col("n_docs"))

  /** Streaming Count-Min sketch — the ingest-time twin of q143's
    * [[graft.operators.TextOps.countMinSketch]]: every arriving
    * document's tokens hash into the same depth×width cell grid and the
    * running aggregation keeps ONE count per cell. This is the sketch's
    * whole point as streaming state: the store holds exactly
    * depth × width rows FOREVER — no watermark, no eviction policy, no
    * per-key growth — while still answering any point frequency query
    * over everything ever ingested (est = min over rows of the cell
    * count, one-sided error, Round13cOpsSpec). The batch operator folds
    * occurrences through the vocabulary-sized type table first; the
    * stream counts occurrences directly (update-mode aggregations do
    * not cascade) — cell values are identical either way, pinned by the
    * batch-parity spec. */
  def frequencySketch(docs: DataFrame, depth: Int = 4,
                      width: Int = 16): DataFrame =
    docs
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("token"))
      .select(explode(expr(s"sequence(0, ${depth - 1})")).as("rw"), col("token"))
      .select(col("rw"),
        (conv(substring(md5(concat(col("rw").cast("string"), lit("#"),
          col("token"))), 1, 8), 16, 10).cast("long") % width).as("bucket"))
      .groupBy("rw", "bucket")
      .agg(count(lit(1)).as("cell_sum"))

  final case class PackedDoc(doc_id: Long, source: String,
                             n_tokens: Long, bin: Long)

  /** Streaming sequence packing — the ingest-time form of q76: each
    * arriving document is assigned the bin where its first token lands in
    * the source's concatenated stream. State per source is ONE long (tokens
    * consumed so far) — constant forever, no watermark needed. Within a
    * micro-batch documents are processed in doc_id order, so a
    * single-batch run reproduces the batch operator's assignment exactly
    * (CorpusStreamsSpec); across batches the stream packs in arrival
    * order, and per-source bins stay non-decreasing regardless (not
    * necessarily dense — an over-budget document spans several bins and
    * the next document legally skips ahead). */
  def packingAssignment(spark: SparkSession, docs: DataFrame,
                        budget: Long = graft.operators.PackingOps.SeqBudget): DataFrame = {
    import spark.implicits._
    val typed = docs.select(col("doc_id"), col("source"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .as[(Long, String, Long)]
    typed.groupByKey(_._2)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (source, rows, state: GroupState[Long]) =>
          var prev = state.getOption.getOrElse(0L)
          val out = Vector.newBuilder[PackedDoc]
          rows.toVector.sortBy(_._1).foreach { case (id, _, n) =>
            out += PackedDoc(id, source, n, prev / budget)
            prev += n
          }
          state.update(prev)
          out.result().iterator
      }.toDF()
  }

  final case class Admission(doc_id: Long, source: String,
                             n_tokens: Long, cum_tokens: Long)

  /** Streaming token-budget admission — the ingest-time form of q69's
    * mixture rule: per source, admit documents until the cumulative token
    * count passes `budget`, then drop the rest. State per source is a
    * single long (tokens seen so far, admitted or not — the same PREFIX
    * rule as the batch operator, where one oversized doc ends the
    * source's intake).
    *
    * Within a micro-batch, documents are processed in the batch
    * operator's content-addressed (md5, doc_id) order, so a single-batch
    * run reproduces q69 exactly (CorpusStreamsSpec); across batches the
    * order is arrival order — the budget invariant (never admit past
    * `budget`) holds regardless. */
  def tokenBudgetAdmission(spark: SparkSession, docs: DataFrame,
                           budget: Long = 500L): DataFrame = {
    import spark.implicits._
    val typed = docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
      .as[(Long, String, Long, String)]
    typed.groupByKey(_._2)
      .flatMapGroupsWithState[Long, Admission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (source, rows, state: GroupState[Long]) =>
          var consumed = state.getOption.getOrElse(0L)
          val out = Vector.newBuilder[Admission]
          rows.toVector.sortBy(r => (r._4, r._1)).foreach { case (id, _, n, _) =>
            consumed += n
            if (consumed <= budget) out += Admission(id, source, n, consumed)
          }
          state.update(consumed)
          out.result().iterator
      }.toDF()
  }

  /** Build the static LSH signature index a streaming ingest probes — the
    * (idx_doc, band, band_key) table of the accumulated corpus, bucket-
    * capped exactly like [[graft.operators.DedupOps.dedupAgainstIndex]]'s
    * index side (production kernel). In a deployment this is a parquet
    * table bucketed BY band_key, rebuilt/appended by the batch pipeline;
    * here it is the static side of the stream-static join below. */
  def signatureIndex(corpus: DataFrame,
                     bucketCap: Int = graft.operators.DedupOps.DefaultCandidateCap): DataFrame = {
    val bands = corpus
      .withColumn("l", split(trim(col("text")), "\\s+"))
      .filter(size(col("l")) >= 3)
      .select(col("doc_id"),
        posexplode(HashKernels.bandKeysFast(nBands = 4, rowsPerBand = 4)(
          graft.functions.MinHashTokensExpr(col("l"), 16))).as(Seq("band", "band_key")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "band_key").orderBy("doc_id")
    bands.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= bucketCap)
      .select(col("doc_id").as("idx_doc"), col("band"), col("band_key"))
  }

  /** Streaming incremental dedup probe — the ingest-time form of
    * [[graft.operators.DedupOps.dedupAgainstIndex]]: each arriving
    * document's band keys stream-static join the corpus's
    * [[signatureIndex]]; a collision row (doc_id, idx_doc, band) marks a
    * candidate duplicate for the sink's rescore/reject stage. STATELESS
    * on the stream side (the index IS the state, maintained by the batch
    * pipeline), so restarts and replays route identically, and the
    * per-micro-batch cost is scan + broadcast/bucketed probe — never a
    * corpus re-hash. */
  def dedupProbeAgainstIndex(docs: DataFrame, index: DataFrame): DataFrame =
    docs
      .withColumn("l", split(trim(col("text")), "\\s+"))
      .filter(size(col("l")) >= 3)
      .select(col("doc_id"),
        posexplode(HashKernels.bandKeysFast(nBands = 4, rowsPerBand = 4)(
          graft.functions.MinHashTokensExpr(col("l"), 16))).as(Seq("band", "band_key")))
      .join(index, Seq("band", "band_key"))
      .filter(col("doc_id") =!= col("idx_doc"))
      .select(col("doc_id"), col("idx_doc"), col("band"))

  /** Build the static IVF cell index a streaming SEMANTIC probe hits —
    * the accumulated corpus's (idx_vec, cell, idx_emb) table under the
    * engine's own deterministic coarse quantizer. In a deployment this is
    * exactly [[graft.operators.SimilarityOps.writeIvfPartitioned]]'s
    * at-rest layout (partitioned by cell, so a probe's stream-static join
    * prunes to the probed cells' files); here it is the static side of
    * the stream-static join below. */
  def semanticIndex(corpus: DataFrame, cents: Array[Array[Float]]): DataFrame =
    corpus.select(col("vec_id").as("idx_vec"),
      col("embedding").as("idx_emb"),
      graft.operators.ProductQuantization
        .cellExpr(corpus.sparkSession, cents)(col("embedding")).as("cell"))

  /** Ingest-time IVF self-healing (round-11 verdict task 3): the
    * `foreachBatch` sink that keeps a LIVE at-rest cell layout healthy
    * under continuous vector churn without manual intervention. Each
    * micro-batch of (vec_id, embedding) rows is upserted into the layout
    * under the frozen quantizer
    * ([[graft.operators.EmbeddingMaintenance.upsertVecs]] — only the
    * affected cell directories rewrite); every `auditEvery`-th batch runs
    * the drift audit (one column-pruned scan), and when it fires the
    * cycle reclusters and refreshes the quantizer sidecar — exactly the
    * batch [[graft.operators.EmbeddingMaintenance.maintain]] loop, but
    * with the quantizer state persisted IN the layout
    * (`<path>.quantizer.json`) instead of driver memory, so a
    * checkpoint-restarted stream resumes the cycle with the exact
    * centroids the stored cells were assigned under. Batch replays are
    * idempotent (same ids, same vectors → same layout), so
    * foreachBatch's at-least-once delivery is safe; the audit cadence
    * keys off the checkpointed batchId, so it is stable across restarts
    * too. Create the layout with
    * [[graft.operators.EmbeddingMaintenance.writeCellLayoutPersistent]]
    * before starting the stream.
    *
    * `recallFloor > 0` arms the RECALL trigger (round-12 verdict task
    * 3): each audit batch also runs
    * [[graft.operators.EmbeddingMaintenance.recallAudit]] (recall@`recallK`
    * of the `recallNProbe`-probe search vs exact, over a content-addressed
    * panel) and reclusters when it sinks below the floor — catching the
    * boundary-straddling arrivals the drift proxies are blind to. */
  def selfHealingVectorSink(path: String, auditEvery: Int = 4,
                            targetCell: Int = 500,
                            recallFloor: Double = 0.0, recallK: Int = 5,
                            recallNProbe: Int = 1,
                            recallPanelN: Int = 16): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      graft.operators.EmbeddingMaintenance.maintainPersistent(
        batch.sparkSession, path, batch.select("vec_id", "embedding"),
        audit = (batchId + 1) % auditEvery == 0, targetCell,
        recallFloor, recallK, recallNProbe, recallPanelN)

  /** Ingest-time self-healing for the at-rest kNN GRAPH (round-14 verdict
    * task 2) — the graph twin of [[selfHealingVectorSink]]. Each
    * micro-batch of (vec_id, embedding) rows folds into BOTH artifacts
    * through [[graft.operators.GraphMaintenance.maintainGraphPersistent]]:
    * append-only edge/probe/redge/dir deltas, the index drift/recall
    * audit at `auditEvery` cadence (the graph is REBUILT under fresh
    * centroids when it fires — cell boundaries moved, so the candidate
    * discipline changed wholesale), and the edge-log compaction trigger
    * otherwise.
    *
    * Replay idempotence: unlike the vector sink — whose upsert is
    * naturally idempotent (same ids, same vectors, same cells) — the
    * graph fold APPENDS, so foreachBatch's at-least-once delivery needs a
    * cursor. The checkpointed batchId is persisted in the graph sidecar
    * (`lastBatch`), an already-folded batchId is skipped entirely, and a
    * checkpoint-restarted stream resumes from the sidecar cursor alone
    * (the cursor survives audit-triggered rebuilds too). Create the
    * layouts with [[graft.operators.EmbeddingMaintenance
    * .writeCellLayoutPersistent]] +
    * [[graft.operators.GraphMaintenance.writeKnnGraph]] before starting
    * the stream. */
  def selfHealingGraphSink(embPath: String, graphPath: String,
                           auditEvery: Int = 4, targetCell: Int = 500,
                           recallFloor: Double = 0.0, recallK: Int = 5,
                           recallNProbe: Int = 1, recallPanelN: Int = 16,
                           compactMaxGens: Int = 8,
                           compactMaxFrac: Double = 0.5): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      graft.operators.GraphMaintenance.maintainGraphPersistent(
        batch.sparkSession, embPath, graphPath,
        batch.select("vec_id", "embedding"),
        audit = (batchId + 1) % auditEvery == 0, targetCell,
        recallFloor, recallK, recallNProbe, recallPanelN,
        compactMaxGens, compactMaxFrac, batchId)

  /** Streaming semantic near-dup probe — the ingest-time form of q102
    * (SemDeDup) and the embedding twin of [[dedupProbeAgainstIndex]]:
    * each arriving embedding probes its nProbe nearest cells of the
    * static [[semanticIndex]]; a collision with cosine ≥ tau marks a
    * semantic duplicate for the sink's reject stage. STATELESS on the
    * stream side (the index is the state, maintained by the batch
    * pipeline), so restarts and replays route identically; per-batch
    * cost is scan + nProbe cell probes per vector — never a corpus
    * re-scan. */
  def semanticProbeAgainstIndex(vecs: DataFrame, index: DataFrame,
                                cents: Array[Array[Float]],
                                nProbe: Int = 4, tau: Double = 0.45): DataFrame =
    vecs.select(col("vec_id"), col("embedding"),
        explode(graft.operators.ProductQuantization
          .probeExpr(vecs.sparkSession, cents, nProbe)(col("embedding"))).as("cell"))
      .join(index, Seq("cell"))
      .filter(col("vec_id") =!= col("idx_vec"))
      .withColumn("sim", round(
        graft.functions.CosineSimilarity(col("embedding"), col("idx_emb")), 6))
      .filter(col("sim") >= tau)
      .select(col("vec_id"), col("idx_vec"), col("sim"))

  /** The q123 signature kernel (bitmap render → aHash + dHash) exploded
    * into its 8×8-bit pigeonhole bands — one long-form row per
    * (doc, hash kind, band). Shared by [[perceptualIndex]] and
    * [[perceptualProbeAgainstIndex]] so both sides of the stream-static
    * join hash identically. The render is the q123 once-per-doc kernel;
    * everything after it is 16 rows of 8-byte keys per document —
    * payload bytes never reach an exchange. */
  private def perceptualBands(docs: DataFrame): DataFrame = {
    val bmU = udf { (ts: Seq[String]) => graft.operators.MultimodalOps.bitmap32(ts) }
    val aU = udf { (p: Array[Byte]) => graft.operators.MultimodalOps.aHash64(p) }
    val dU = udf { (p: Array[Byte]) => graft.operators.MultimodalOps.dHash64(p) }
    docs.withColumn("pl", bmU(split(trim(col("text")), "\\s+")))
      .select(col("doc_id"), aU(col("pl")).as("ah"), dU(col("pl")).as("dh"))
      .selectExpr("doc_id", "stack(2, 'ahash', ah, 'dhash', dh) AS (kind, sig)")
      .select(col("doc_id"), col("kind"), col("sig"),
        explode(sequence(lit(0), lit(7))).as("band"))
      // arithmetic >> then & 255 == logical band extract (mask drops the
      // sign extension), so band 7 of a negative signature is still exact
      .withColumn("band_key", expr("CAST((sig >> (band * 8)) & 255 AS INT)"))
  }

  /** Build the static perceptual-signature index a streaming near-dup
    * probe hits — the ingest-time counterpart of q123's corpus audit and
    * the pixel-space sibling of [[signatureIndex]] (MinHash) and
    * [[semanticIndex]] (embeddings). Rows are (idx_doc, idx_sig, kind,
    * band, band_key), collapsed to ONE representative doc (min doc_id)
    * per DISTINCT signature in each band bucket - the same collapse the
    * q123 batch audit uses. This is the only sound way to bound a
    * perceptual band bucket: Hamming distance depends on the signature
    * alone, so identical-signature docs are interchangeable as probe
    * targets, while a raw per-bucket doc cap is NOT sound - band_key has
    * only 256 values, buckets hold ~N/256 docs for any real corpus, and a
    * capped-out doc (which merely shares one 8-bit band byte with the
    * kept rows - nothing near-duplication implies) would be evicted from
    * all 16 of its buckets, silently admitting its streaming near-dups
    * and breaking the documented maxDist <= 7 exact-recall guarantee.
    * Viral distance-0 mass still collapses (identical docs => identical
    * signatures => one row per band); index size is
    * O(16 x distinct signatures), independent of duplication factor. */
  def perceptualIndex(corpus: DataFrame): DataFrame =
    perceptualBands(corpus)
      .groupBy(col("kind"), col("band"), col("band_key"), col("sig"))
      .agg(min(col("doc_id")).as("idx_doc"))
      .select(col("idx_doc"), col("sig").as("idx_sig"), col("kind"),
        col("band"), col("band_key"))

  /** Streaming perceptual near-dup probe — the ingest-time form of q123
    * and the pixel-space twin of [[dedupProbeAgainstIndex]]: each
    * arriving document's 16 (kind, band, key) rows stream-static join
    * the corpus's [[perceptualIndex]]; colliding candidates are rescored
    * with the EXACT Hamming distance (codegen'd `bit_count(sig ^
    * idx_sig)` — never a UDF on the join output) and kept at ≤ maxDist.
    * The 8-band pigeonhole makes recall exact at maxDist ≤ 7: a pair
    * differing in ≤7 bits cannot differ in all 8 disjoint bands, so at
    * least one band key collides. STATELESS on the stream side (the
    * index is the state, maintained by the batch pipeline), so restarts
    * and replays route identically; per-batch cost is the once-per-doc
    * render plus 16 indexed probes — never a corpus re-hash. Emits one
    * row per colliding band (like [[dedupProbeAgainstIndex]]) so the
    * plan stays append-only stateless; the sink dedupes per micro-batch
    * if it needs pair-level verdicts. */
  def perceptualProbeAgainstIndex(docs: DataFrame, index: DataFrame,
                                  maxDist: Int = 7): DataFrame =
    perceptualBands(docs)
      .join(index, Seq("kind", "band", "band_key"))
      .filter(col("doc_id") =!= col("idx_doc"))
      .withColumn("hamming", expr("CAST(bit_count(sig ^ idx_sig) AS INT)"))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_id"), col("idx_doc"), col("kind"), col("band"), col("hamming"))

  /** Build the fixed-size DSIR bucket→llr model from the accumulated
    * corpus — ≤[[graft.operators.QualityModels.DsirBuckets]] entries by
    * construction, so the collect is bounded regardless of corpus size
    * (the whole point of hashed features: the model is O(buckets), not
    * O(vocab), and ships to every ingest worker as one literal map). */
  def dsirModelMap(corpus: DataFrame): Map[Long, Double] =
    graft.operators.QualityModels.dsirModel(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Streaming DSIR admission — the ingest-time form of q109. Batch DSIR
    * Gumbel-top-k needs the whole pool; the streaming equivalent is
    * Bernoulli importance admission: admit with probability
    * min(1, exp(log_weight − logZ)) using the same content-addressed
    * uniform as the batch sampler, so the decision is a pure function of
    * (model, doc) — STATELESS, replay-safe, identical across restarts
    * and batch backfills. The per-document log-weight reproduces
    * [[graft.operators.QualityModels.dsirLogWeights]] bit-for-bit: the
    * same 6dp llr terms accumulated in exact DECIMAL, just folded over
    * the token array in-row (no shuffle, no join — the model is a
    * 4096-entry literal map probed by `element_at`). Bigrams the training
    * corpus never saw fall in unoccupied buckets and contribute zero —
    * the same weight the batch path assigns them (left join + coalesce),
    * so a doc of entirely-unseen features is a weight-0 candidate on both
    * paths, never silently dropped from one of them. */
  def dsirAdmission(docs: DataFrame, model: Map[Long, Double],
                    logZ: Double): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val mapCol = typedLit(model)
    val buckets = expr(
      "transform(sequence(0, size(l) - 2), i -> " +
        "CAST(conv(substring(md5(concat(l[i], ' ', l[i + 1])), 1, 8), 16, 10) " +
        s"AS BIGINT) % ${graft.operators.QualityModels.DsirBuckets})")
    val lwDec = aggregate(buckets,
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 6)),
      (acc, b) => acc +
        coalesce(element_at(mapCol, b), lit(0.0)).cast(DecimalType(18, 6)))
    docs
      .withColumn("l", split(trim(col("text")), "\\s+"))
      .filter(size(col("l")) >= 2)
      .withColumn("log_weight", round(lwDec.cast(DoubleType), 6))
      .withColumn("admit_prob",
        round(least(lit(1.0), exp(col("log_weight") - logZ)), 6))
      .withColumn("admitted",
        graft.operators.QualityModels.dsirUniform(col("doc_id")) <
          col("admit_prob"))
      .select(col("doc_id"), col("source"), col("log_weight"),
        col("admit_prob"), col("admitted"))
  }

  /** Streaming funnel admission — the ingest-time form of q112's
    * heuristic rule engine. Every rule statistic is recomputed IN-ROW
    * from the document's own token array (higher-order folds — no
    * explode, no shuffle, no state), so the verdict is a pure function of
    * the document and replays identically. The top-bigram count uses a
    * sort-then-longest-equal-run fold — the formulation the BATCH q112
    * deliberately avoids (q100's finding: HOFs leave whole-stage codegen,
    * and batch re-derives the pipeline per consumer), but at ingest the
    * per-row cost is the right trade against carrying shuffle machinery
    * into a micro-batch. CorpusStreamsSpec's "funnel admission" tests pin
    * the verdict bit-equal to [[graft.operators.TextOps.funnelRuled]] —
    * all thresholds compare exact integers, so the two formulations
    * cannot drift. */
  def funnelAdmission(docs: DataFrame): DataFrame = {
    val stops = graft.operators.TextOps.FunnelStopwords
      .map(s => s"'$s'").mkString(", ")
    val verdict = expr(
      s"""CASE
         |  WHEN n < 10 THEN '1_too_short'
         |  WHEN alpha * 4 < len THEN '2_low_alpha'
         |  WHEN n_stop * 5 > n * 3 THEN '3_stopword_spam'
         |  WHEN topc * 5 > nb THEN '4_repetitive'
         |  WHEN len < n * 2 OR len > n * 12 THEN '5_word_length'
         |  ELSE 'kept' END""".stripMargin)
    docs
      .withColumn("l", split(trim(col("text")), "\\s+"))
      .withColumn("n", size(col("l")).cast("long"))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(l, t -> t IN ($stops))) AS BIGINT)"))
      .withColumn("len",
        expr("aggregate(l, 0L, (acc, t) -> acc + length(t))"))
      .withColumn("alpha",
        expr("aggregate(l, 0L, (acc, t) -> acc + length(regexp_replace(t, '[^a-zA-Z]', '')))"))
      // longest equal run over the SORTED bigram array = max in-doc
      // bigram count; fold state = (prev gram, current run, best run)
      // guard n < 2 BEFORE building the index sequence: sequence(0, -1)
      // yields [0, -1] and ANSI mode makes l[-1] a fatal
      // INVALID_ARRAY_INDEX — the batch path's size(l) >= 2 filter,
      // mirrored here as an empty bigram array (verdict: 1_too_short)
      .withColumn("bgs", expr(
        "IF(n < 2, array(), " +
          "array_sort(transform(sequence(0, int(n) - 2), i -> concat(l[i], ' ', l[i + 1]))))"))
      .withColumn("nb", greatest(col("n") - 1, lit(0L)))
      .withColumn("topc", expr(
        """CASE WHEN n < 2 THEN 0L ELSE aggregate(bgs,
          |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
          |  (acc, g) -> named_struct(
          |    'prev', g,
          |    'run', IF(acc.prev IS NOT NULL AND acc.prev = g, acc.run + 1, 1L),
          |    'best', GREATEST(acc.best,
          |      IF(acc.prev IS NOT NULL AND acc.prev = g, acc.run + 1, 1L))),
          |  acc -> acc.best) END""".stripMargin))
      .withColumn("rule", verdict)
      .withColumn("admitted", col("rule") === "kept")
      .select(col("doc_id"), col("source"), col("n"), col("rule"),
        col("admitted"))
  }

  /** Build the static k-gram index a streaming SUBSTRING probe hits —
    * the accumulated corpus's DISTINCT xxhash64'd sliding k-grams
    * (membership is all removal needs, so no doc ids and no bucket cap:
    * one row per distinct gram, ≤ total token mass and in practice far
    * below it). In a deployment this is a parquet table bucketed by
    * gram, appended by the batch pipeline after each rebuild — the
    * substring twin of [[signatureIndex]]. */
  def gramIndex(corpus: DataFrame,
                k: Int = graft.operators.SubstrDedup.DefaultSpanTokens): DataFrame =
    corpus
      .withColumn("l", split(trim(col("text")), "\\s+"))
      .filter(size(col("l")) >= k)
      .select(explode(expr(
        s"transform(sequence(1, size(l) - ${k - 1}), i -> concat_ws(' ', slice(l, i, $k)))"))
        .as("g"))
      .select(xxhash64(col("g")).as("gram")).distinct()

  /** Streaming substring-span probe — the ingest-time form of q122's
    * detection half: each arriving document's k-gram positions
    * stream-static join the corpus [[gramIndex]]; a collision row
    * (doc_id, pos) marks a span the corpus already contains. STATELESS
    * on the stream side (the index is the state, maintained by the batch
    * pipeline), so restarts and replays route identically — the sink
    * aggregates or rewrites as it pleases. */
  def substrSpanProbe(docs: DataFrame, index: DataFrame,
                      k: Int = graft.operators.SubstrDedup.DefaultSpanTokens): DataFrame =
    docs
      .withColumn("l", split(trim(col("text")), "\\s+"))
      .filter(size(col("l")) >= k)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, size(l) - ${k - 1}), i -> xxhash64(concat_ws(' ', slice(l, i, $k))))"))
          .as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("gram"))
      .join(index, Seq("gram"))
      .select(col("doc_id"), col("pos"))

  /** Build the static CDC chunk index a streaming chunk-dedup probe
    * hits — the accumulated corpus's DISTINCT content-defined chunk keys
    * under the production kernel
    * ([[graft.operators.DedupOps.cdcChunksFast]], xxhash64 boundaries and
    * keys). Membership is all the probe needs, so no doc ids and no
    * bucket cap: one row per distinct (chunk_hash, chunk_len), ≤ token
    * mass / E[chunk] and collapsing further under duplication. In a
    * deployment this is a parquet table bucketed by chunk_hash, appended
    * by the batch pipeline after each rebuild — the CDC twin of
    * [[gramIndex]]. Unlike the k-gram index, CDC keys survive INSERTIONS
    * in the arriving copy: boundaries re-synchronize at the next
    * content-defined cut, so a shifted re-crawl still collides. */
  def chunkIndex(corpus: DataFrame, modulus: Int = 16): DataFrame =
    graft.operators.DedupOps.cdcChunksFast(corpus, modulus)
      .select(col("chunk_hash"), col("chunk_len")).distinct()

  /** Streaming CDC chunk probe — the ingest-time form of q137's
    * detection half: each arriving document is chunked by the SAME
    * content-defined rule and its chunk keys stream-static join the
    * corpus [[chunkIndex]]; a collision row (doc_id, chunk_hash,
    * chunk_len) marks a chunk the corpus already holds. STATELESS on the
    * stream side (the index is the state, maintained by the batch
    * pipeline), so restarts and replays route identically. */
  def chunkProbeAgainstIndex(docs: DataFrame, index: DataFrame,
                             modulus: Int = 16): DataFrame =
    graft.operators.DedupOps.cdcChunksFast(docs, modulus)
      .join(index, Seq("chunk_hash", "chunk_len"))
      .select(col("doc_id"), col("chunk_hash"), col("chunk_len"))

  /** The ADMISSION half of ingest-time chunk dedup, for `foreachBatch`
    * (it aggregates per document): score each arriving doc by the
    * token-weighted fraction of its chunks the corpus already holds, and
    * admit below `maxDupFrac`. A doc that is a shifted copy of a corpus
    * doc scores near 1 (CDC re-sync) and is rejected; a doc quoting one
    * boilerplate paragraph scores ≈ paragraph/doc mass and passes — the
    * chunk-granular middle ground between q95's whole-doc MinHash
    * admission and q122's span-level rewrite. */
  def chunkDupAdmission(docs: DataFrame, index: DataFrame,
                        maxDupFrac: Double = 0.5,
                        modulus: Int = 16): DataFrame = {
    val ch = graft.operators.DedupOps.cdcChunksFast(docs, modulus)
      .join(index.select(col("chunk_hash"), lit(true).as("dup")),
        Seq("chunk_hash"), "left")
    ch.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("dup"), 1)).as("n_dup"),
        sum(col("chunk_len")).as("n_tokens"),
        coalesce(sum(when(col("dup"), col("chunk_len"))), lit(0L))
          .as("dup_tokens"))
      .withColumn("dup_frac",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
      .withColumn("admitted", col("dup_frac") <= maxDupFrac)
  }

  /** The REWRITE half of ingest-time substring removal, for
    * `foreachBatch` (it aggregates per document, so it runs on each
    * micro-batch's DataFrame, not on the unbounded stream): drop every
    * span the corpus index already contains, via the same gap-slice
    * array rewrite as the batch transform
    * ([[graft.operators.SubstrDedup.keptTokensExpr]]). Semantics vs
    * q122: the index docs are the canonical keepers (they arrived
    * first), so EVERY colliding span in the arriving doc is removed;
    * intra-batch duplicate spans are deliberately left to the next index
    * rebuild — the same incremental contract as [[dedupProbeAgainstIndex]]
    * (q95). CorpusStreamsSpec pins parity: for a batch whose duplicate
    * spans all point at index docs, the cleaned output equals
    * [[graft.operators.SubstrDedup.removeDuplicateSpans]] run on
    * index ∪ batch and restricted to the batch docs. */
  def substrRemovalAtIngest(docs: DataFrame, index: DataFrame,
                            k: Int = graft.operators.SubstrDedup.DefaultSpanTokens): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      split(trim(col("text")), "\\s+").as("l"))
    val starts = substrSpanProbe(docs, index, k)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    toks.join(starts, Seq("doc_id"), "left")
      .withColumn("kept", when(col("starts").isNull, col("l"))
        .otherwise(graft.operators.SubstrDedup.keptTokensExpr(k)))
      .select(col("doc_id"), col("source"),
        concat_ws(" ", col("kept")).as("text_clean"),
        size(col("l")).cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"))
  }

  /** Stateless shard router — the ingest-time form of q86's assignment
    * ([[graft.operators.MixtureOps.shardCol]], same expression): adds the
    * deterministic shard id so the stream sink can `partitionBy("shard")`
    * into the same layout a batch rebuild would produce. Stateless by
    * construction (pure function of doc_id), so restarts, replays, and
    * batch backfills route every document identically — the property that
    * makes incremental shard maintenance safe. */
  def shardRouter(docs: DataFrame): DataFrame =
    docs.withColumn("shard", graft.operators.MixtureOps.shardCol)

  /** Rendezvous shard router — the resize-stable ingest routing q148
    * prices: each arriving doc routes to its highest-random-weight shard
    * via the pure per-row expression
    * ([[graft.operators.MixtureOps.rendezvousCol]] — no window, no
    * state), so changing `nShards` mid-deployment re-routes ONLY the
    * docs whose hash crowns a new shard (~(new−old)/new of traffic, the
    * HRW minimum) instead of mod-N's near-total scatter; everything
    * already at rest stays where a batch rebuild would put it, because
    * stream and batch share the hash. */
  def rendezvousRouter(docs: DataFrame, nShards: Int = 16): DataFrame =
    docs.withColumn("shard",
      graft.operators.MixtureOps.rendezvousCol(org.apache.spark.sql.functions.col("doc_id"), nShards))
}
