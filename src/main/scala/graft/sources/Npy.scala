package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal NumPy `.npy` reader for the reference's mask files
  * (`/root/reference/src/data/dataset.py:31`): v1/v2 header, C-order,
  * little-endian float64 2-D arrays only — which is exactly what
  * `dataset/init_*_mask.npy` contain (FIXTURES.md §2).
  *
  * Spark has no NPY codec; this is the one-time ingest boundary. The parsed
  * matrix is either used driver-side (masks are ≤6191×49) or converted to a
  * long DataFrame by [[Workloads.maskToDF]].
  */
object Npy {

  final case class Matrix2D(rows: Int, cols: Int, data: Array[Double]) {
    def apply(i: Int, j: Int): Double = data(i * cols + j)
    def toArrays: Array[Array[Double]] =
      Array.tabulate(rows)(i => Array.tabulate(cols)(j => apply(i, j)))
  }

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  def read(path: String): Matrix2D = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length > 10 && bytes.take(6).sameElements(Magic), s"$path: not an NPY file")
    val major = bytes(6)
    val (headerLen, headerStart) =
      if (major == 1) ((bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8), 10)
      else {
        val b = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
        (b.getInt, 12)
      }
    val header = new String(bytes, headerStart, headerLen, "ASCII")
    require(header.contains("'descr': '<f8'"), s"$path: unsupported dtype in $header")
    require(header.contains("'fortran_order': False"), s"$path: fortran order unsupported")
    val shapeRe = """'shape':\s*\((\d+),\s*(\d+)\)""".r
    val (rows, cols) = shapeRe.findFirstMatchIn(header) match {
      case Some(m) => (m.group(1).toInt, m.group(2).toInt)
      case None => throw new IllegalArgumentException(s"$path: cannot parse shape from $header")
    }
    val body = ByteBuffer.wrap(bytes, headerStart + headerLen, rows * cols * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    val data = new Array[Double](rows * cols)
    var i = 0
    while (i < data.length) { data(i) = body.getDouble(); i += 1 }
    Matrix2D(rows, cols, data)
  }
}
