package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Semantics of the per-source Zipf fit (q104): exact slopes on
  * constructed frequency profiles (uniform → 0, two-point geometric →
  * −1 under the rounding policy), and shape sanity on the real corpus.
  * Value parity at sf0.01 is the driver's DuckDB gate. */
class ZipfSlopeSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def run(rows: (Long, String, String)*) = {
    val df = rows.toDF("doc_id", "source", "text").select(
      col("doc_id"), col("text"), lit("en").as("lang"), col("source"),
      length(col("text")).as("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("zipf").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    CorpusOps.q104ZipfSlope(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
  }

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("uniform frequencies fit slope ~0 with intercept ~ln(freq)") {
    // every token appears exactly twice -> y constant -> slope 0 up to
    // the 6dp per-term rounding of the xy products
    val (n, slope, icept) = run((1L, "u", "a b c a b c"))("u")
    assert(n == 3L)
    assert(math.abs(slope) < 1e-4)
    assert(math.abs(icept - r6(math.log(2))) < 1e-4)
  }

  test("two-point geometric profile: slope exactly -1 under the rounding policy") {
    // counts 4 and 2 at ranks 1 and 2: slope = (ln2 - ln4)/(ln2 - 0) = -1
    val out = run((1L, "g", "x x x x y y"))("g")
    val (n, slope, icept) = out
    assert(n == 2L)
    // reproduce the engine's exact arithmetic: 6dp terms, decimal sums
    val x = Seq(r6(math.log(1)), r6(math.log(2)))
    val y = Seq(r6(math.log(4)), r6(math.log(2)))
    val sx = x.sum; val sy = y.sum
    val sxy = x.zip(y).map { case (a, b) => r6(a * b) }.sum
    val sxx = x.map(a => r6(a * a)).sum
    val expSlope = r6((2 * sxy - sx * sy) / (2 * sxx - sx * sx))
    assert(slope == expSlope)
    assert(math.abs(slope - (-1.0)) < 1e-3)
    assert(icept == r6((sy - expSlope * sx) / 2))
  }

  test("real corpus: every source fits a negative slope from 40 points") {
    val out = CorpusOps.q104ZipfSlope(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= 10L, "enough rank points for a meaningful fit")
      assert(r.getDouble(2) < 0.0, s"source ${r.getString(0)} slope must be negative")
    }
  }
}
