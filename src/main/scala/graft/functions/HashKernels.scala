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

  /** Production MinHash: long signatures from ONE base hash per shingle.
    *
    * The md5 [[minhash]] kernel above is the ORACLE path — its per-seed
    * hex strings are reproducible in DuckDB SQL, which is what the q26
    * gate checks. But it pays nSeeds full md5 digests per shingle, and at
    * soak scale that is the entire cost of the MinHash family (~153 s per
    * 100k docs ≈ 160M md5 calls). Production MinHash needs only a UNIFORM
    * hash family, not a portable one: hash each shingle once (FNV-1a 64
    * over UTF-8 bytes), then derive seed s's value with a splitmix64
    * finalizer of (base ^ s·golden) — two multiplies and three shifts
    * instead of an md5 digest, the standard k-permutation construction
    * (Broder's minwise hashing with splitmix-derived permutations).
    * ~10× less work per (shingle, seed); same collision statistics, NOT
    * the same signatures — so the md5 kernel keeps the gate and this one
    * takes the 100 TB corpus (FastMinHashSpec pins the exchange-rate:
    * exact dups collide on every band deterministically, and near-dup
    * LSH recall on the adversarial corpus matches the md5 family). */
  def minhashFast(nSeeds: Int): Column => Column =
    (c: Column) => MinHashFastExpr(c, nSeeds)

  /** Band keys over a long MinHash signature ([[minhashFast]]): band b =
    * order-dependent mix of its rowsPerBand signature entries (seed order
    * is fixed, so no sort is needed — unlike the md5 variant, whose
    * string entries are sorted only to match the oracle SQL's list_sort). */
  def bandKeysFast(nBands: Int, rowsPerBand: Int): Column => Column =
    (c: Column) => BandKeysFastExpr(c, nBands, rowsPerBand)

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

  /** Sign-bit LSH bucket id over a float-array embedding: plane p's weight
    * for dimension i is ±1 by the parity of hex digit (i mod 32) of
    * md5("p:<p>:<i>"); bit p of the bucket = sign of the plane projection.
    *
    * Compiled replacement for the interpreted HOF formulation (nPlanes
    * CodegenFallback `aggregate` lambdas per row — measured 2-3 s/query at
    * sf0.1; this kernel is one narrow pass). Accumulation is EXACT decimal
    * (each product rounded to scale 12 half-up, matching both Spark's and
    * DuckDB's double→DECIMAL(38,12) cast, then summed exactly), so the
    * sign of a near-zero projection is order-independent and identical to
    * the oracle's SUM(CAST(x*w AS DECIMAL(38,12))). The ±1 weight table is
    * precomputed once per executor from the same md5 recipe the oracle SQL
    * spells out. */
  def signBuckets(nPlanes: Int, dims: Int): Column => Column = {
    // weight table w(p)(i) — tiny (nPlanes × dims), computed ONCE here and
    // captured by the serialized closure (inside the lambda it would be
    // rebuilt per ROW: nPlanes·dims md5 calls each — the exact cost this
    // kernel exists to remove)
    val w: Array[Array[Int]] = {
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(nPlanes, dims) { (p, i) =>
        val h = md5Hex(md, "p:" + p + ":" + i)
        (h.charAt(i % 32) % 2) * 2 - 1 // ascii parity, as ascii(substr)%2
      }
    }
    val f = udf { (emb: Seq[Float]) =>
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var acc = java.math.BigDecimal.ZERO
        var i = 0
        val n = math.min(dims, emb.length)
        while (i < n) {
          val prod = emb(i).toDouble * w(p)(i)
          // valueOf (shortest decimal string), matching Spark's
          // Cast(double→decimal) path exactly — NOT new BigDecimal(d),
          // whose full binary expansion can round digit 12 differently
          acc = acc.add(java.math.BigDecimal.valueOf(prod)
            .setScale(12, java.math.RoundingMode.HALF_UP))
          i += 1
        }
        if (acc.signum() > 0) bucket |= 1L << p
        p += 1
      }
      bucket
    }
    (c: Column) => f(c)
  }

  /** SimHash over distinct tokens, full 64-bit signature: bit b (0..63)
    * reads hex digit (b mod 32) of md5(token) and votes +1/−1 by bit
    * (b div 32) of that digit's VALUE — the low bit for b < 32, the second
    * bit for b ≥ 32 — i.e. 64 independent coin flips drawn from the
    * 128-bit digest. Bit b of the signature is set iff the vote sum is
    * positive. Returns (simhash, popcount).
    *
    * 64-bit (not 32) because the signature space must outlive the corpus:
    * a 32-bit space saturates by birthday collision near 10⁹ documents and
    * every banding scheme over it re-quadratizes; 64 bits pushes that past
    * 10¹⁸ — the 100 TB regime. The formula is reproducible in portable SQL
    * (hex-digit value = ascii-based CASE, shift, mask), so the signature
    * stays oracle-checkable cross-engine.
    */
  val simhash64: Column => Column = {
    val f = udf { (tokens: Seq[String]) =>
      val md = MessageDigest.getInstance("MD5")
      val votes = new Array[Int](64)
      val seen = new java.util.HashSet[String]()
      val it = tokens.iterator
      while (it.hasNext) {
        val t = it.next()
        if (seen.add(t)) {
          val h = md5Hex(md, t)
          var b = 0
          while (b < 64) {
            val hv = Character.digit(h.charAt(b % 32), 16)
            votes(b) += (((hv >>> (b / 32)) & 1) * 2) - 1
            b += 1
          }
        }
      }
      var sim = 0L
      var pop = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) { sim |= 1L << b; pop += 1 }
        b += 1
      }
      (sim, pop)
    }
    (c: Column) => f(c)
  }
}
