package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Perceptual near-dup semantics (q123): planted exact/near/far triples
  * through the bitmap → aHash/dHash → banded-profile chain, plus the
  * generalized pigeonhole's worst-case recall contract. Value-level
  * parity at sf0.01 is the driver's DuckDB gate.
  */
class PerceptualHashSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def toks(seed: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$seed${i}w${(i * 7) % 13}")

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("exact duplicate payloads hash identically; near-dup lands within the ≤7 window; unrelated far") {
    val base = toks("t", 100)
    val near = base.updated(50, "ZZZZZZZZZZ").updated(51, "QQQQQQQQ")
    val far = toks("other", 100)
    val hBase = MultimodalOps.aHash64(MultimodalOps.bitmap32(base))
    val hDup = MultimodalOps.aHash64(MultimodalOps.bitmap32(base))
    val hNear = MultimodalOps.aHash64(MultimodalOps.bitmap32(near))
    val hFar = MultimodalOps.aHash64(MultimodalOps.bitmap32(far))
    assert(hBase == hDup, "exact dup must hash identically")
    val dNear = hamming(hBase, hNear)
    assert(dNear >= 1 && dNear <= 7,
      s"planted 2-token near-dup must land in the banded window, got $dNear")
    assert(hamming(hBase, hFar) > 7,
      s"unrelated doc must be far, got ${hamming(hBase, hFar)}")
    // dHash agrees on the exact-dup property and keeps the near-dup close
    val dBase = MultimodalOps.dHash64(MultimodalOps.bitmap32(base))
    val dNearH = MultimodalOps.dHash64(MultimodalOps.bitmap32(near))
    assert(dBase == MultimodalOps.dHash64(MultimodalOps.bitmap32(base)))
    assert(hamming(dBase, dNearH) <= 7)
  }

  test("bitmap locality: a changed token perturbs only its own pixel run") {
    val base = toks("t", 64)
    val changed = base.updated(10, "XXXXXX")
    val b1 = MultimodalOps.bitmap32(base)
    val b2 = MultimodalOps.bitmap32(changed)
    val diffIdx = b1.indices.filter(i => b1(i) != b2(i))
    assert(diffIdx.nonEmpty)
    // token 10 of 64 owns pixel run [10*1024/64, 11*1024/64) = [160, 176)
    assert(diffIdx.forall(i => i >= 160 && i < 176),
      s"pixels outside token 10's run changed: ${diffIdx.filterNot(i => i >= 160 && i < 176)}")
  }

  test("planted triple flows through the gate query's banded profile") {
    val base = toks("t", 100)
    val near = base.updated(50, "ZZZZZZZZZZ").updated(51, "QQQQQQQQ")
    val docs = Seq(
      (1L, base.mkString(" ")), (2L, base.mkString(" ")), // exact pair
      (3L, near.mkString(" ")), (4L, toks("other", 100).mkString(" ")))
      .toDF("doc_id", "text")
    val bmU = udf { (ts: Seq[String]) => MultimodalOps.bitmap32(ts) }
    val aU = udf { (p: Array[Byte]) => MultimodalOps.aHash64(p) }
    val sigs = docs.select(aU(bmU(split(col("text"), " "))).as("simhash"))
      .groupBy("simhash").agg(count(lit(1)).as("n"))
    val prof = DedupOps.hammingProfile(sigs, nPar = 4, nBands = 8, maxDist = 7)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(prof(0) == 1L, s"one exact pair expected, got $prof")
    // docs 1/2 vs 3: two near pairs at the same distance; doc 4 out of range
    assert(prof.filterKeys(_ > 0).values.sum == 2L, s"two near pairs expected, got $prof")
  }

  test("pigeonhole worst case: distance-7 pair with flips in 7 distinct bands is still found") {
    val s0 = 0x0123456789abcdefL
    // flip the low bit of bands 0..6 — only band 7 agrees
    val s7 = (0 until 7).foldLeft(s0)((s, b) => s ^ (1L << (8 * b)))
    assert(hamming(s0, s7) == 7)
    // distance-8 control: one flip in EVERY band — no chunk agrees
    val s8 = (0 until 8).foldLeft(s0)((s, b) => s ^ (1L << (8 * b)))
    val sigs = Seq(s0 -> 1L, s7 -> 1L, s8 -> 1L).toDF("simhash", "n")
    val prof = DedupOps.hammingProfile(sigs, nPar = 4, nBands = 8, maxDist = 7)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(prof.getOrElse(7, 0L) == 1L, s"worst-case ≤7 pair missed: $prof")
    // s7 vs s8 differ only in band 7's bit: distance 1, found via the
    // seven agreeing bands; s0 vs s8 (distance 8) must NOT appear
    assert(prof.getOrElse(1, 0L) == 1L, s"distance-1 pair missed: $prof")
    assert(!prof.contains(8), s"distance-8 pair must be filtered: $prof")
    assert(prof.getOrElse(0, 0L) == 0L)
  }
}
