package graft.linalg

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class SvdSpectrumSpec extends AnyFunSuite with graft.SharedSpark {

  test("local spectrum of an exact rank-2 matrix has 2 nonzero values") {
    val rng = new Random(1)
    val a = DenseMatrix.tabulate(30, 2)((_, _) => rng.nextDouble())
    val b = DenseMatrix.tabulate(2, 8)((_, _) => rng.nextDouble())
    val s = SvdSpectrum.local(a * b)
    assert(s.length == 8)
    assert(s(0) >= s(1) && s(1) > 1e-8)
    s.drop(2).foreach(v => assert(v < 1e-10, s"expected rank 2, got tail value $v"))
  }

  test("distributed top-k matches the local spectrum") {
    import spark.implicits._
    val rng = new Random(2)
    val m = DenseMatrix.tabulate(40, 6)((_, _) => rng.nextDouble())
    val cells = (for (i <- 0 until 40; j <- 0 until 6) yield (i, j, m(i, j)))
      .toDF("rowIdx", "colIdx", "value")
    val dist = SvdSpectrum.distributed(spark, cells, nCols = 6, k = 3)
    val loc = SvdSpectrum.local(m).take(3)
    dist.zip(loc).foreach { case (d, l) => assert(math.abs(d - l) < 1e-6, s"$d vs $l") }
  }
}
