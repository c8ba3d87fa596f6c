package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Semantics of the per-source KL divergence (q101): exact hand-computed
  * divergences on constructed corpora, the zero law for identically
  * distributed sources, and finiteness by vocabulary inclusion. Value
  * parity at sf0.01 is the driver's DuckDB gate.
  */
class SourceDivergenceSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def run(rows: (Long, String, String)*) = {
    val df = rows.toDF("doc_id", "source", "text").select(
      col("doc_id"), col("text"), lit("en").as("lang"), col("source"),
      length(col("text")).as("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("kld").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    CorpusOps.q101SourceDivergence(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("disjoint single-token sources: KL = ln 2 for both") {
    // corpus = {x, y}; q(x) = q(y) = 1/2; each source is a point mass
    // -> KL = 1 * ln(1 / 0.5) = ln 2, rounded to 6dp per the term policy
    val out = run((1L, "a", "x"), (2L, "b", "y"))
    val ln2 = BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a") == ((1L, 1L, ln2)))
    assert(out("b") == ((1L, 1L, ln2)))
  }

  test("identically distributed sources: KL = 0 exactly") {
    val out = run((1L, "a", "x x y z"), (2L, "b", "x x y z"))
    assert(out("a")._3 == 0.0 && out("b")._3 == 0.0)
    assert(out("a")._1 == 4L && out("a")._2 == 3L)
  }

  test("hand-computed asymmetric case matches the rounding policy") {
    // source a = [x x y] (p: x 2/3, y 1/3), source b = [y] (point mass)
    // corpus: x 2/4, y 2/4
    val out = run((1L, "a", "x x y"), (2L, "b", "y"))
    def term(p: Double, q: Double): BigDecimal =
      BigDecimal(p * math.log(p / q)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val klA = (term(2.0 / 3, 0.5) + term(1.0 / 3, 0.5)).toDouble
    val klB = term(1.0, 0.5).toDouble
    assert(math.abs(out("a")._3 - klA) < 1e-9)
    assert(math.abs(out("b")._3 - klB) < 1e-9)
  }

  test("KL is finite and near-nonnegative on skewed multi-doc sources") {
    val out = run(
      (1L, "a", "x x x x x x x x y"), (2L, "a", "x x x z"),
      (3L, "b", "y y z w w w"), (4L, "c", "x y z w"))
    out.values.foreach { case (_, _, kl) =>
      assert(!kl.isNaN && !kl.isInfinite)
      // per-term 6dp rounding can push a true-zero slightly negative
      assert(kl >= -1e-4, s"KL must be nonnegative up to rounding, got $kl")
    }
  }
}
