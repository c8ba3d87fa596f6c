package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Compiled hash kernels for the dedup/similarity operators.
  *
  * These exist for one reason: evaluating md5 per array element through
  * Catalyst higher-order-function lambdas runs on the INTERPRETED expression
  * path (HOFs are CodegenFallback), which measured ~1 ms per hash at sf0.1 —
  * 147 s for the MinHash query. The same arithmetic as a compiled Scala
  * function over the whole array, with a reused MessageDigest, is ~1 µs per
  * hash. Each kernel is a narrow per-document function: no shuffle, called
  * once per row, embarrassingly parallel at 100 TB.
  *
  * Hex output is lowercase, over UTF-8 bytes — identical to Spark's `md5`
  * and DuckDB's `md5`, so every consumer stays oracle-checkable.
  */
object HashKernels {

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HEX(b >>> 4)
      out(i * 2 + 1) = HEX(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** md5 hex of a string's UTF-8 bytes, reusing the digest instance. */
  private def md5Hex(md: MessageDigest, s: String): String = {
    md.reset()
    hex(md.digest(s.getBytes(UTF_8)))
  }

  /** Distinct word 3-gram shingles, first-occurrence order. */
  val shingles3: Column => Column = {
    val f = udf { (tokens: Seq[String]) =>
      if (tokens == null || tokens.length < 3) Array.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + 2 < tokens.length) {
          seen.add(tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2))
          i += 1
        }
        seen.toArray(Array.empty[String])
      }
    }
    (c: Column) => f(c)
  }

  /** MinHash signature: element s of the output = min over shingles of
    * md5(s + ":" + shingle), for s in 0 until nSeeds. */
  def minhash(nSeeds: Int): Column => Column = {
    val f = udf { (shs: Seq[String]) =>
      val md = MessageDigest.getInstance("MD5")
      val out = new Array[String](nSeeds)
      var s = 0
      while (s < nSeeds) {
        var best: String = null
        val prefix = s.toString + ":"
        val it = shs.iterator
        while (it.hasNext) {
          val h = md5Hex(md, prefix + it.next())
          if (best == null || h < best) best = h
        }
        out(s) = best
        s += 1
      }
      out
    }
    (c: Column) => f(c)
  }

  /** LSH band keys over a MinHash signature: band b (of nBands, each
    * rowsPerBand entries) = md5 of the band's "SS=hash" entries (seed
    * zero-padded to 2 digits), sorted lexicographically, joined with '|'. */
  def bandKeys(nBands: Int, rowsPerBand: Int): Column => Column = {
    val f = udf { (mh: Seq[String]) =>
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(nBands) { b =>
        val entries = Array.tabulate(rowsPerBand) { r =>
          val seed = b * rowsPerBand + r
          (if (seed < 10) "0" + seed else seed.toString) + "=" + mh(seed)
        }
        java.util.Arrays.sort(entries.asInstanceOf[Array[AnyRef]])
        md5Hex(md, entries.mkString("|"))
      }
    }
    (c: Column) => f(c)
  }

  /** SimHash over distinct tokens: bit b of the 32-bit signature votes
    * +1/−1 by the parity of hex digit b of md5(token); bit set iff the vote
    * sum is positive. Returns (simhash, popcount). */
  val simhash32: Column => Column = {
    val f = udf { (tokens: Seq[String]) =>
      val md = MessageDigest.getInstance("MD5")
      val votes = new Array[Int](32)
      val seen = new java.util.HashSet[String]()
      val it = tokens.iterator
      while (it.hasNext) {
        val t = it.next()
        if (seen.add(t)) {
          val h = md5Hex(md, t)
          var b = 0
          while (b < 32) {
            // '0'..'9' have even ascii parity ⇔ digit parity; 'a'..'f'
            // alternate — parity of the ascii code, matching SQL ascii(...)%2
            votes(b) += (h.charAt(b) % 2) * 2 - 1
            b += 1
          }
        }
      }
      var sim = 0L
      var pop = 0L
      var b = 0
      while (b < 32) {
        if (votes(b) > 0) { sim |= 1L << b; pop += 1 }
        b += 1
      }
      (sim, pop)
    }
    (c: Column) => f(c)
  }
}
