package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Pins [[SimilarityOps.ivfTopK]]'s contract now that its coarse quantizer
  * is the engine's own deterministic sampled-Lloyd's
  * ([[ProductQuantization.trainCoarse]]) instead of a Spark-ML fit:
  * determinism of the cells, pruning really happening (every returned
  * target lives in a probed cell), and recall bounded against the exact
  * cosine top-k. */
class IvfRecallSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = graft.Tables.embeddings(spark, sf).cache()

  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  private def queryPanel(n: Int): Seq[Long] =
    emb.select(col("vec_id"))
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h").limit(n).collect().map(_.getLong(0)).toSeq

  test("coarse quantizer: deterministic, every vector assigned a valid cell") {
    val c1 = ProductQuantization.trainCoarse(emb, nList = 8)
    val c2 = ProductQuantization.trainCoarse(emb, nList = 8)
    assert(c1.length == 8)
    for (i <- c1.indices) assert(c1(i).sameElements(c2(i)))
    val cells = ProductQuantization.assignCells(emb, c1)
    assert(cells.count() == emb.count())
    val range = cells.agg(min("cell"), max("cell")).head
    assert(range.getInt(0) >= 0 && range.getInt(1) < 8)
    // the trainer must actually spread the corpus (a collapsed quantizer
    // would put everything in one cell and pruning would be a no-op)
    assert(cells.select("cell").distinct().count() >= 4)
  }

  test("ivfTopK: probed-cell pruning with bounded recall vs exact cosine") {
    val qids = queryPanel(5)
    val got = SimilarityOps.ivfTopK(emb, qids, k = 10, nList = 8, nProbe = 4)
      .collect()

    // exact oracle, driver-side (sf0.001 is small)
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val byId = all.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    // pruning contract: every returned target shares a probed cell with
    // its query
    val cents = ProductQuantization.trainCoarse(emb, nList = 8)
    val cellOf = ProductQuantization.assignCells(emb, cents).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probed = ProductQuantization
      .probeCells(qids.map(q => (q, byId(q))), cents, nProbe = 4)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (r <- got)
      assert(probed(r.getLong(0)).contains(cellOf(r.getLong(1))),
        s"target ${r.getLong(1)} outside query ${r.getLong(0)}'s probed cells")

    var hit = 0
    for (q <- qids) {
      val truth = all.filter(_._1 != q)
        .map { case (id, v) => (id, cos(byId(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val mine = got.filter(_.getLong(0) == q).map(_.getLong(1)).toSet
      assert(mine.size == 10, s"query $q under-filled: ${mine.size}")
      hit += truth.intersect(mine).size
    }
    val recall = hit.toDouble / (qids.size * 10)
    assert(recall >= 0.4, s"IVF recall@10 $recall below 0.4")
  }

  test("at-rest layout: cell partitioning prunes the probe scan, results match ivfTopK") {
    val qids = queryPanel(2)
    val nList = 8; val nProbe = 2; val k = 5
    val cents = ProductQuantization.trainCoarse(emb, nList)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/emb"
    SimilarityOps.writeIvfPartitioned(emb, cents, path)

    val byId = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val queryVecs = qids.map(q => (q, byId(q)))
    val got = SimilarityOps.ivfTopKAtRest(spark, path, cents, queryVecs,
      k = k, nProbe = nProbe)

    // the probe must PRUNE: the scan carries a partition filter on cell
    // and reads at most the probed directories, never all nList
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning on the cell layout:\n$plan")
    val probedCells = ProductQuantization.probeCells(queryVecs, cents, nProbe)
      .map(_._2).distinct.toSet
    assert(probedCells.size < nList, "panel probed every cell — pruning untestable")

    // and the pruned scan returns exactly what the inline-cell ivfTopK
    // computes for the same quantizer and panel
    val atRest = got.collect().map(_.toSeq)
    val inline = SimilarityOps.ivfTopK(emb, qids, k = k, nList = nList,
      nProbe = nProbe).collect().map(_.toSeq)
    assert(atRest.toSeq == inline.toSeq)
  }

  test("ivfTopK: output is deterministic across invocations") {
    val qids = queryPanel(3)
    def rows = SimilarityOps.ivfTopK(emb, qids, k = 5, nList = 8, nProbe = 2)
      .collect().map(_.toSeq).toSeq
    assert(rows == rows)
  }

  test("q126 recall audit: exhaustive probing reports recall exactly 1.0; partial probing stays in [0,1]") {
    // nProbe = nList ⇒ the IVF candidate set is the whole corpus ⇒ the
    // probed top-k IS the exact top-k ⇒ every panel query must audit at
    // hits = k. This pins the audit's own correctness (an audit that
    // can't reach 1.0 under exhaustive probing is measuring itself, not
    // the index).
    val full = SimilarityOps.q126IvfRecallAudit(k = 5, nList = 8, nProbe = 8)(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(full.nonEmpty)
    assert(full.forall { case (_, h, rec) => h == 5L && rec == 1.0 },
      full.mkString(", "))
    // starved probing: well-formed, bounded, deterministic
    def starved = SimilarityOps.q126IvfRecallAudit(k = 5, nList = 8, nProbe = 1)(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val s1 = starved
    assert(s1.forall { case (_, h, rec) => h >= 0L && h <= 5L && rec >= 0.0 && rec <= 1.0 })
    assert(s1.map(_._1) == full.map(_._1).toSeq.sorted)
    assert(s1 == starved)
    // starved recall cannot exceed exhaustive recall per query
    val fullBy = full.map(t => t._1 -> t._2).toMap
    assert(s1.forall { case (q, h, _) => h <= fullBy(q) })
  }
}
