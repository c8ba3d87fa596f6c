package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class NpySpec extends AnyFunSuite {
  private val ref = "/root/reference/dataset"

  test("parses init_job_mask.npy: shape, col-0 invariant, observed fraction") {
    val m = Npy.read(s"$ref/init_job_mask.npy")
    assert(m.rows == 113 && m.cols == 49)
    assert((0 until m.rows).forall(i => m(i, 0) == 1.0))
    val frac = m.data.sum / m.data.length
    assert(math.abs(frac - 0.110) < 0.005, s"observed fraction $frac")
  }

  test("parses all four reference masks with documented shapes") {
    val shapes = Map("ceb" -> 3133, "job" -> 113, "dsb" -> 964, "stack" -> 6191)
    shapes.foreach { case (ds, rows) =>
      val m = Npy.read(s"$ref/init_${ds}_mask.npy")
      assert(m.rows == rows && m.cols == 49, s"$ds: ${m.rows}x${m.cols}")
      assert(m.data.forall(v => v == 0.0 || v == 1.0), s"$ds: non-binary mask")
    }
  }
}
