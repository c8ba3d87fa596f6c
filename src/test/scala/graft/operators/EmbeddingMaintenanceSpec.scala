package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import scala.jdk.CollectionConverters._

/** The embedding-index maintenance contract at the FILE level: deletes
  * and upserts rewrite only the cells the vectors live in (or move to) —
  * untouched cell directories keep byte-identical listings — and the
  * cell-moving upsert (the structural difference from the doc shards:
  * cells are functions of the VECTOR, not the id) erases the victim
  * from its old directory while writing its replacement to the new one.
  */
class EmbeddingMaintenanceSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // two well-separated blobs -> two stable cells under nList=2 training
  private def blobVec(base: Array[Float], jitter: Float): Array[Float] =
    base.zipWithIndex.map { case (v, i) => v + (if (i == 1) jitter else 0f) }
  private val b1 = Array(10f, 0f, 0f, 0f)
  private val b2 = Array(0f, 0f, 10f, 0f)
  private def corpusDF = ((1L to 6L).map(i => (i, blobVec(b1, 0.01f * i), 0)) ++
    (11L to 16L).map(i => (i, blobVec(b2, 0.01f * i), 1)))
    .toDF("vec_id", "embedding", "label")

  private def listing(path: String): Map[String, Set[(String, Long, Long)]] =
    Files.list(Paths.get(path)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("cell="))
      .map { dir =>
        dir.getFileName.toString -> Files.list(dir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => (f.getFileName.toString, Files.size(f),
            Files.getLastModifiedTime(f).toMillis)).toSet
      }.toMap

  private def fresh(tag: String): (String, Array[Array[Float]]) = {
    val path = Files.createTempDirectory(s"graft-emaint-$tag").toString + "/index"
    val cents = ProductQuantization.trainCoarse(corpusDF, nList = 2)
    EmbeddingMaintenance.writeCellLayout(corpusDF, cents, path)
    (path, cents)
  }

  private def ids(path: String): Set[Long] =
    spark.read.parquet(path).select("vec_id").collect().map(_.getLong(0)).toSet

  test("deleteVecs rewrites only the victims' cell; the other cell stays bit-identical") {
    val (path, _) = fresh("del")
    val before = listing(path)
    assert(before.size == 2, before.keySet.toString)
    val blob1Cell = spark.read.parquet(path).filter(col("vec_id") === 1L)
      .select("cell").head().getInt(0)
    EmbeddingMaintenance.deleteVecs(spark, path, Seq(1L, 2L))
    val after = listing(path)
    assert(ids(path) == (Set(3L, 4L, 5L, 6L) ++ (11L to 16L)))
    assert(after(s"cell=${1 - blob1Cell}") == before(s"cell=${1 - blob1Cell}"),
      "untouched cell was rewritten")
    assert(after(s"cell=$blob1Cell") != before(s"cell=$blob1Cell"))
  }

  test("deleting a cell's every vector removes its directory (no resurrection)") {
    val (path, _) = fresh("empty")
    val blob2Cell = spark.read.parquet(path).filter(col("vec_id") === 11L)
      .select("cell").head().getInt(0)
    EmbeddingMaintenance.deleteVecs(spark, path, (11L to 16L).toSeq)
    assert(ids(path) == (1L to 6L).toSet)
    assert(!Files.exists(Paths.get(path, s"cell=$blob2Cell")),
      "emptied cell directory must be reclaimed")
  }

  test("a re-embedding upsert MOVES a vector between cells; both directories rewritten, content exact") {
    val (path, cents) = fresh("move")
    val before = spark.read.parquet(path).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // vec 3 re-embeds from blob1 to blob2's neighborhood
    val moved = Seq((3L, blobVec(b2, 0.5f), 0)).toDF("vec_id", "embedding", "label")
    EmbeddingMaintenance.upsertVecs(spark, path, cents, moved)
    val after = spark.read.parquet(path).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(after.keySet == before.keySet, "upsert must not change membership")
    assert(after(3L) == before(11L), "vec 3 must now live in blob2's cell")
    assert(after(3L) != before(3L), "vec 3 must have left its old cell")
    assert((after - 3L) == (before - 3L), "no other vector moved")
    // the stored embedding really is the new one
    val stored = spark.read.parquet(path).filter(col("vec_id") === 3L)
      .select("embedding").head().getSeq[Float](0).toArray
    assert(stored.sameElements(blobVec(b2, 0.5f)))
  }

  test("upsert of a brand-new id inserts; compactCells preserves content at one file per cell") {
    val (path, cents) = fresh("ins")
    val novel = Seq((99L, blobVec(b1, 0.33f), 0)).toDF("vec_id", "embedding", "label")
    EmbeddingMaintenance.upsertVecs(spark, path, cents, novel)
    assert(ids(path).contains(99L))
    val contentBefore = spark.read.parquet(path)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    EmbeddingMaintenance.compactCells(spark, path)
    val contentAfter = spark.read.parquet(path)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(contentAfter == contentBefore)
    listing(path).foreach { case (dir, files) =>
      assert(files.size == 1, s"$dir not compacted to one file")
    }
  }

  // --- drift detection + recluster (round-10 verdict task 3) ---

  private val b3 = Array(0f, 10f, 0f, 10f) // a region the frozen quantizer never saw

  test("drift audit: healthy layout reports no reasons; skewed churn fires; recluster restores") {
    val (path, cents) = fresh("drift")
    val baseline = EmbeddingMaintenance.layoutStats(spark, path, cents)
    assert(EmbeddingMaintenance.driftReasons(baseline, baseline).isEmpty,
      "an unchurned layout must audit healthy")

    // sustained churn: 24 upserts into a region the frozen centroids never
    // saw — they all quantize into ONE existing cell (nearest frozen
    // centroid), so that cell balloons while the other stays put
    val churn = (100L to 123L).map(i => (i, blobVec(b3, 0.01f * i), 2))
      .toDF("vec_id", "embedding", "label")
    EmbeddingMaintenance.upsertVecs(spark, path, cents, churn)
    val after = EmbeddingMaintenance.layoutStats(spark, path, cents)
    val reasons = EmbeddingMaintenance.driftReasons(baseline, after)
    assert(reasons.nonEmpty, s"churned layout must audit drifted (stats: $after)")
    assert(after.meanSqErr > 10 * baseline.meanSqErr,
      "off-manifold churn must blow up the quantization error")

    // recluster: fresh centroids from the current vectors, adaptive nList
    val fresh2 = EmbeddingMaintenance.recluster(spark, path, targetCell = 6)
    val restored = EmbeddingMaintenance.layoutStats(spark, path, fresh2)
    assert(restored.n == after.n, "recluster must not change membership")
    assert(restored.meanSqErr < after.meanSqErr / 10,
      s"recluster must restore quantizer fit (${after.meanSqErr} -> ${restored.meanSqErr})")
    assert(restored.maxCell < after.maxCell,
      "recluster must break up the ballooned cell")
  }

  test("maintain: healthy batch keeps the quantizer; off-manifold churn triggers a rebuild") {
    val (path, cents0) = fresh("maint")
    val base0 = EmbeddingMaintenance.layoutStats(spark, path, cents0)

    // an on-manifold batch: more vectors near the existing blobs, with
    // the SAME jitter envelope as the original corpus (0.01–0.06) so the
    // quantization-error audit sees the distribution it was trained on
    val tame = (300L to 305L).map(i => (i, blobVec(b1, 0.01f * (i - 299)), 0))
      .toDF("vec_id", "embedding", "label")
    val (cents1, base1) =
      EmbeddingMaintenance.maintain(spark, path, cents0, base0, tame, targetCell = 6)
    assert(cents1 eq cents0, "healthy batch must not retrain the quantizer")
    assert(base1 eq base0, "healthy batch must keep the baseline")

    // sustained off-manifold churn: drift fires, the cycle rebuilds
    val churn = (400L to 423L).map(i => (i, blobVec(b3, 0.01f * i), 2))
      .toDF("vec_id", "embedding", "label")
    val (cents2, base2) =
      EmbeddingMaintenance.maintain(spark, path, cents1, base1, churn, targetCell = 6)
    assert(!(cents2 eq cents1), "churn batch must trigger a recluster")
    assert(EmbeddingMaintenance.driftReasons(base2,
      EmbeddingMaintenance.layoutStats(spark, path, cents2)).isEmpty,
      "the refreshed baseline must audit healthy against the rebuilt layout")
    assert(EmbeddingMaintenance.layoutStats(spark, path, cents2).n == base2.n)
  }

  test("recluster parity: exhaustive-probe ivfTopKAtRest identical before and after") {
    val (path, cents) = fresh("repar")
    val churn = (200L to 217L).map(i => (i, blobVec(b3, 0.02f * i), 2))
      .toDF("vec_id", "embedding", "label")
    EmbeddingMaintenance.upsertVecs(spark, path, cents, churn)

    val queries = Seq(1L -> blobVec(b1, 0.05f), 2L -> blobVec(b3, 0.03f))
    def exhaustive(cs: Array[Array[Float]]) =
      SimilarityOps.ivfTopKAtRest(spark, path, cs, queries, k = 5, nProbe = cs.length)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq

    val before = exhaustive(cents)
    val fresh2 = EmbeddingMaintenance.recluster(spark, path, targetCell = 6)
    val afterR = exhaustive(fresh2)
    assert(afterR == before,
      "recluster changed retrieval results at exhaustive probe — it must only move vectors between cells")
  }
}
