package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * technique behind data skipping at 100 TB: sort the table by the
  * interleaved bits of several columns before writing, and every file's
  * min/max footer stats become a small box in ALL of those dimensions at
  * once, so a selective filter on ANY of them prunes most files at scan
  * time (single-column sorts only skip on the leading column).
  *
  * The bit-spreading is pure built-in shift/mask arithmetic on longs —
  * whole-stage-codegen'd Column expressions, no UDF — so computing the key
  * is a narrow map over the scan. The layout write itself is
  * `repartitionByRange` on the key (one range-exchange, Spark samples the
  * key distribution) + `sortWithinPartitions`, which is exactly how
  * OPTIMIZE ZORDER runs in lakehouse engines.
  */
object DataLayout {

  /** Spread the low 32 bits of `c` to the even bit positions of a long
    * (the classic Morton spread: 5 shift-or-mask rounds). */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 2-D Morton key: interleaves the low 32 bits of `x` (even positions)
    * and `y` (odd positions). Inputs must already be non-negative bucket
    * ordinals (see [[rankBuckets]]). */
  def zvalue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Map an arbitrarily-distributed column to dense bucket ordinals in
    * [0, 2^bits) via ntile — rank-based normalization, the same trick
    * lakehouse ZORDER uses so skewed columns still fill the curve evenly.
    * (One window pass; for a production write this is sampled instead.) */
  def rankBuckets(c: Column, bits: Int = 16): Column =
    (ntile(1 << bits)
      .over(org.apache.spark.sql.expressions.Window.orderBy(c)) - 1).cast("long")

  /** Lay out `df` on the 2-D Z-curve of (`xCol`, `yCol`) across `nFiles`
    * output partitions: each partition then covers a compact box in both
    * dimensions, so file-level min/max stats prune on either column. */
  def zorderBy(df: DataFrame, xCol: String, yCol: String, nFiles: Int,
               bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("__z",
      zvalue(rankBuckets(col(xCol), bits), rankBuckets(col(yCol), bits)))
    keyed.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
