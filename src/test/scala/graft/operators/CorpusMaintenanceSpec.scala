package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import scala.jdk.CollectionConverters._

/** The corpus-maintenance contract at the FILE level: deletes/upserts/
  * compaction rewrite only the shards their keys route to — untouched
  * shard directories keep byte-identical file listings (names, sizes,
  * modification times), which is what makes incremental consumers of the
  * sharded layout safe. */
class CorpusMaintenanceSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  /** (file name, size, mtime) per shard directory. */
  private def listing(path: String): Map[String, Set[(String, Long, Long)]] =
    Files.list(Paths.get(path)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("shard="))
      .map { dir =>
        dir.getFileName.toString -> Files.list(dir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => (f.getFileName.toString, Files.size(f),
            Files.getLastModifiedTime(f).toMillis)).toSet
      }.toMap

  private def freshCorpus(tag: String): String = {
    val path = Files.createTempDirectory(s"graft-maint-$tag").toString + "/corpus"
    CorpusMaintenance.writeSharded(
      graft.Tables.documents(spark, sf).select("doc_id", "text", "source"), path)
    path
  }

  test("deleteDocs rewrites only the routed shards; others stay bit-identical") {
    val path = freshCorpus("del")
    val before = listing(path)
    assert(before.size == 16, s"expected 16 shard dirs, got ${before.keySet}")
    val all = spark.read.parquet(path).select("doc_id").collect().map(_.getLong(0))
    val victims = all.sorted.take(5).toSeq
    val affected = CorpusMaintenance.shardsOf(spark, victims).map(s => s"shard=$s").toSet
    assert(affected.nonEmpty && affected.size < 16)

    CorpusMaintenance.deleteDocs(spark, path, victims)

    val after = listing(path)
    val remaining = spark.read.parquet(path).select("doc_id").collect().map(_.getLong(0))
    assert(victims.forall(v => !remaining.contains(v)), "deleted ids still present")
    assert(remaining.length == all.length - victims.length)
    for ((dir, files) <- before if !affected(dir))
      assert(after(dir) == files, s"untouched $dir was rewritten")
    for (dir <- affected)
      assert(after.get(dir).forall(_ != before(dir)), s"affected $dir unchanged")
  }

  test("deleting a shard's every document removes its directory (no resurrection)") {
    val path = freshCorpus("empty")
    val byShard = spark.read.parquet(path).select("doc_id", "shard").collect()
      .groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(0)).toSeq).toMap
    val (shard, ids) = byShard.minBy(_._2.length)
    CorpusMaintenance.deleteDocs(spark, path, ids)
    assert(!listing(path).contains(s"shard=$shard"),
      "emptied shard directory survived — its old files would resurrect the deleted docs")
    val remaining = spark.read.parquet(path)
    assert(remaining.filter(col("shard") === shard).count() == 0)
    assert(remaining.count() == byShard.values.map(_.length).sum - ids.length)
  }

  test("upsertDocs replaces changed rows in place, leaves other shards untouched") {
    val path = freshCorpus("upsert")
    val before = listing(path)
    val sp = spark
    import sp.implicits._
    val all = spark.read.parquet(path).select("doc_id").collect().map(_.getLong(0))
    val targets = all.sorted.take(3).toSeq
    val changed = targets.map(id => (id, s"REWRITTEN $id", "corrected"))
      .toDF("doc_id", "text", "source")
    val affected = CorpusMaintenance.shardsOf(spark, targets).map(s => s"shard=$s").toSet

    CorpusMaintenance.upsertDocs(spark, path, changed)

    val after = spark.read.parquet(path)
    assert(after.count() == all.length) // replaced, not appended
    val got = after.filter(col("doc_id").isInCollection(targets))
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == targets.map(id => (id, s"REWRITTEN $id", "corrected")).toSet)
    for ((dir, files) <- before if !affected(dir))
      assert(listing(path)(dir) == files, s"untouched $dir was rewritten")
  }

  test("compactShards collapses files without changing rows") {
    val path = Files.createTempDirectory("graft-maint-compact").toString + "/corpus"
    // fragment each shard into many small files first
    graft.Tables.documents(spark, sf).select("doc_id", "text", "source")
      .withColumn("shard", MixtureOps.shardCol)
      .repartition(24)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val before = spark.read.parquet(path).orderBy("doc_id").collect()
    val filesBefore = listing(path).values.map(_.size).sum
    assert(filesBefore > 16, s"fixture not fragmented: $filesBefore files")

    CorpusMaintenance.compactShards(spark, path)

    val filesAfter = listing(path).values.map(_.size).sum
    assert(filesAfter == 16, s"expected one file per shard, got $filesAfter")
    assert(spark.read.parquet(path).orderBy("doc_id").collect().toSeq == before.toSeq)
  }
}
