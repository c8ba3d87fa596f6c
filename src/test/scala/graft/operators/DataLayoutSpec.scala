package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Z-order layout: bit-interleave correctness against hand values, and the
  * data-skipping property itself — per-file bounding boxes under the
  * Z-curve layout must be small in BOTH dimensions, where a 1-D sort only
  * bounds its leading column.
  */
class DataLayoutSpec extends AnyFunSuite with SharedSpark {

  test("zvalue interleaves bits (hand cases)") {
    val sp = spark
    import sp.implicits._
    val df = Seq((3L, 2L), (0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFL, 0L))
      .toDF("x", "y")
      .select(DataLayout.zvalue(col("x"), col("y")).as("z"))
    // x→even bits, y→odd: (3,2)→1101=13; (1,0)→1; (0,1)→2; (0xFFFF,0)→0x55555555
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(13L, 0L, 1L, 2L, 0x55555555L))
  }

  test("z-curve files are boxes in both dimensions; range sort only bounds one") {
    val sp = spark
    import sp.implicits._
    // 64×64 uniform grid — every (x, y) cell once
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val nFiles = 16

    def avgBoxArea(laidOut: org.apache.spark.sql.DataFrame): Double = {
      val boxes = laidOut
        .select(col("x"), col("y"), spark_partition_id().as("pid"))
        .groupBy("pid")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .collect().map(_.getLong(1).toDouble)
      boxes.sum / boxes.length
    }

    val zArea = avgBoxArea(DataLayout.zorderBy(grid, "x", "y", nFiles, bits = 6))
    val xSorted = avgBoxArea(grid.repartitionByRange(nFiles, col("x")))

    // perfect: 16 files × 256 cells each → box area 256. The Z-layout must
    // land near that; an x-range sort bounds x tightly but leaves y at the
    // full 64 extent (box ≈ 4×64 = 256 too — BUT a y-filter then hits every
    // file; assert the real pruning proxy below instead of area alone)
    assert(zArea <= 1024, s"z boxes too large: $zArea")

    // pruning proxy: fraction of files whose box overlaps a 8×8 query
    // window, for a filter on y alone (the non-leading dimension)
    def filesHit(laidOut: org.apache.spark.sql.DataFrame, lo: Long, hi: Long): Long = {
      laidOut.select(col("y"), spark_partition_id().as("pid"))
        .groupBy("pid").agg(min("y").as("ymin"), max("y").as("ymax"))
        .filter(col("ymin") <= hi && col("ymax") >= lo)
        .count()
    }
    val zHit = filesHit(DataLayout.zorderBy(grid, "x", "y", nFiles, bits = 6), 8, 15)
    val xHit = filesHit(grid.repartitionByRange(nFiles, col("x")), 8, 15)
    // x-sorted layout: every file spans all y → all 16 files hit.
    // z-layout: only files whose y-box overlaps [8,15] — must prune most.
    assert(xHit == nFiles, s"x-sorted should hit every file, hit $xHit")
    assert(zHit <= nFiles / 2, s"z-layout pruned too little: $zHit of $nFiles files")
  }
}
