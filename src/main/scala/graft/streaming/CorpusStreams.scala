package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashKernels

/** Structured Streaming forms of the corpus-pipeline operators — the
  * ingest-time path of the same ops the batch queries run over stored
  * corpora (q24 exact dedup, q49 decontamination). Like
  * [[EventStreams]], every transform is a source-agnostic
  * DataFrame→DataFrame function that runs identically on a static frame
  * (CorpusStreamsSpec asserts batch parity on both).
  *
  * Scale/state notes:
  *  - decontamination is STATELESS (narrow map + filter against a
  *    broadcast set), so it needs no watermark and restarts trivially;
  *    the benchmark shingle set is fixed at query start — redeploy the
  *    stream to pick up a new eval corpus, exactly like production
  *    decontamination filters.
  *  - streaming exact dedup keys on the 128-bit content hash (never the
  *    text) within the watermark horizon; state is bounded by the horizon
  *    and entries are evicted by `dropDuplicatesWithinWatermark`.
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
}
