package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** q120 export-order manifest: bijection, one-window-oracle parity,
  * append stability, and the no-shard-wide-window plan pin.
  */
class ExportOrderSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  test("q120: positions are a bijection 0..n-1 within every shard") {
    val rows = PackingOps.q120ExportOrder(spark, sf).collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (sh, rs) =>
      val ps = rs.map(_.getAs[Long]("position")).sorted
      assert(ps.toSeq == (0L until rs.length).toSeq,
        s"shard $sh positions must be exactly 0..${rs.length - 1}")
    }
  }

  test("q120: two-level rank equals the single-window formulation") {
    val base = graft.Tables.documents(spark, sf).select(col("doc_id"))
      .withColumn("shard", MixtureOps.shardCol)
      .withColumn("okey",
        md5(concat(lit("order:"), col("doc_id").cast("string"))))
    val w = Window.partitionBy("shard").orderBy("okey", "doc_id")
    val oneLevel = base
      .select(col("doc_id"), col("shard"),
        (row_number().over(w) - 1).cast("long").as("position"))
    val twoLevel = PackingOps.q120ExportOrder(spark, sf)
    assert(twoLevel.exceptAll(oneLevel).count() == 0 &&
      oneLevel.exceptAll(twoLevel).count() == 0)
  }

  test("q120: growing the corpus never reorders an existing shard's relative order") {
    // content addressing: a doc's order key is independent of the corpus,
    // so the RELATIVE order of any fixed doc set is stable under growth
    val sp = spark
    val full = PackingOps.q120ExportOrder(sp, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("shard"), r.getAs[Long]("position"))).toMap
    // recompute on the halved corpus through the same operator shape
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_export").toString
    graft.Tables.documents(sp, sf).filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val half = PackingOps.q120ExportOrder(sp, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("shard"), r.getAs[Long]("position"))).toMap
    half.keys.groupBy(id => half(id)._1).values.foreach { ids =>
      val sorted = ids.toSeq.sortBy(half(_)._2)
      val fullOrder = sorted.sortBy(full(_)._2)
      assert(sorted == fullOrder,
        "relative order of surviving docs must match the full corpus")
    }
  }

  test("q120 plan: no shard-wide window — ranks computed per (shard, grp)") {
    val plan = PackingOps.q120ExportOrder(spark, sf)
      .queryExecution.executedPlan.toString
    // every Window node must partition on grp too (the two-level contract);
    // the offsets window runs on the ≤4096-row aggregate, also grp-keyed
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty)
    val rankWindows = windowLines.filter(_.contains("row_number"))
    assert(rankWindows.nonEmpty && rankWindows.forall(_.contains("grp")),
      s"the corpus-sized rank window must include grp in its partition key:\n${rankWindows.mkString("\n")}")
  }
}
