package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Property-based check of the q122 removal transform against an
  * INDEPENDENT driver-side reference implementation of the spec'd
  * semantics (duplicated-gram detection by total occurrence count,
  * canonical = min (doc_id, pos), covered-interval union, order-preserving
  * complement). Random corpora draw from a tiny vocabulary so k-gram
  * collisions are common (including within-doc repeats, overlapping
  * duplicated runs, and whole-doc copies) — the shapes the fixed-case
  * spec can't enumerate. (Raw scalacheck Gen sampling, same pattern as
  * PackingPropSpec: the scalatestplus bridge isn't in the offline cache.)
  */
class SubstrRemovalPropSpec extends AnyFunSuite with SharedSpark {

  private val K = 4 // small span width → plenty of real collisions

  /** Independent reference: nothing shared with the Spark implementation
    * (no sort_array/gap-slice — plain Scala maps and sets). */
  private def reference(docs: Seq[(Long, Vector[String])]): Map[Long, Vector[String]] = {
    val occ = scala.collection.mutable.LinkedHashMap
      .empty[Vector[String], scala.collection.mutable.ArrayBuffer[(Long, Int)]]
    for ((id, toks) <- docs; i <- 0 to toks.length - K)
      occ.getOrElseUpdate(toks.slice(i, i + K),
        scala.collection.mutable.ArrayBuffer.empty) += ((id, i + 1))
    val removable = occ.values.filter(_.size > 1)
      .flatMap(os => os.sortBy(identity).drop(1)) // keep min (doc_id, pos)
    val covered: Map[Long, Set[Int]] = removable.toSeq.groupBy(_._1)
      .map { case (id, ps) => id -> ps.flatMap(p => p._2 until p._2 + K).toSet }
    docs.map { case (id, toks) =>
      id -> toks.zipWithIndex.collect {
        case (t, i0) if !covered.getOrElse(id, Set.empty).contains(i0 + 1) => t
      }
    }.toMap
  }

  private val corpora: Gen[Seq[(Long, Vector[String])]] = for {
    n <- Gen.choose(2, 12)
    rows <- Gen.listOfN(n, for {
      len <- Gen.frequency(6 -> Gen.choose(K, 25), 1 -> Gen.choose(0, K - 1))
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield toks.toVector)
    // plant one whole-doc copy so exact dups always occur
    dupOf <- Gen.choose(0, n - 1)
  } yield (rows :+ rows(dupOf)).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def draw[A](g: Gen[A], k: Int): A =
    g.apply(Gen.Parameters.default, Seed(k.toLong))
      .getOrElse(fail(s"generator produced no value for seed $k"))

  test("random small-vocab corpora: Spark removal equals the independent reference") {
    val sp = spark
    import sp.implicits._
    (1 to 15).foreach { seed =>
      val corpus = draw(corpora, seed)
      val df = corpus.map { case (id, toks) => (id, "s", toks.mkString(" ")) }
        .toDF("doc_id", "source", "text")
      val got = SubstrDedup.removeDuplicateSpans(df, k = K)
        .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3), r.getLong(4)))
        .toMap
      val want = reference(corpus)
      corpus.foreach { case (id, toks) =>
        val exp = want(id)
        val (text, n, kept) = got(id)
        // split("") of an empty doc yields [""], so a 0-token doc reports
        // n_tokens = 1 — the whitespace-tokenizer convention both engines
        // share (q98)
        assert(n == math.max(1, toks.length), s"seed $seed doc $id token count")
        assert(text == exp.mkString(" "),
          s"seed $seed doc $id text: got '$text' want '${exp.mkString(" ")}'")
        assert(kept == (if (toks.isEmpty) 1L else exp.length.toLong),
          s"seed $seed doc $id kept count (got $kept, want ${exp.length})")
      }
    }
  }
}
