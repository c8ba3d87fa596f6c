package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Semantics of the Gopher-rule repetition signals (q100): hand-computed
  * fractions on constructed docs, the run-length fold's agreement with a
  * naive group-count, and the degenerate-length guards. Value-level parity
  * at sf0.01 is the driver's DuckDB gate (which derives top-bigram count
  * via groupBy instead of the sorted-run fold — an independent oracle for
  * the fold).
  */
class RepetitionSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def run(texts: (Long, String)*) = {
    val df = texts.toDF("doc_id", "text").select(
      col("doc_id"), col("text"), lit("en").as("lang"), lit("s").as("source"),
      length(col("text")).as("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextOps.q100Repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6)))).toMap
  }

  test("template doc: 'a b' repeated — top bigram dominates, flagged") {
    // "a b a b a b": 6 tokens, 5 bigrams: [a b]×3, [b a]×2 -> top 3/5
    // distinct words 2/6 -> dup_word 4/6; distinct bigrams 2/5 -> dup 3/5
    val out = run(1L -> "a b a b a b")
    val (n, dw, db, tb, fl) = out(1L)
    assert(n == 6)
    assert(math.abs(dw - 0.666667) < 1e-9)
    assert(math.abs(db - 0.6) < 1e-9)
    assert(math.abs(tb - 0.6) < 1e-9)
    assert(fl, "top_bigram_frac 0.6 > 0.18 must flag")
  }

  test("all-distinct doc: every fraction at its floor, not flagged") {
    val out = run(1L -> "one two three four five six")
    val (n, dw, db, tb, fl) = out(1L)
    assert(n == 6 && dw == 0.0 && db == 0.0)
    assert(math.abs(tb - 0.2) < 1e-9, "5 distinct bigrams -> top run 1/5")
    assert(fl, "1/5 = 0.2 > 0.18 flags even unique text at this length")
  }

  test("long distinct doc clears the flag threshold") {
    val words = (1 to 20).map(i => s"w$i").mkString(" ")
    val (_, dw, db, tb, fl) = run(1L -> words)(1L)
    assert(dw == 0.0 && db == 0.0 && math.abs(tb - 1.0 / 19) < 1e-6 && !fl)
  }

  test("degenerate docs: single token and whitespace-only take the guard path") {
    val out = run(1L -> "solo", 2L -> "   ")
    val (n1, dw1, db1, tb1, _) = out(1L)
    assert(n1 == 1 && dw1 == 0.0 && db1 == 0.0 && tb1 == 0.0)
    // whitespace-only trims to "" -> one empty token (shared tokenizer pin)
    val (n2, dw2, db2, tb2, _) = out(2L)
    assert(n2 == 1 && dw2 == 0.0 && db2 == 0.0 && tb2 == 0.0)
  }

  test("sorted-run fold == naive per-bigram groupBy max on a mixed doc") {
    val text = "x y z x y x y z q r x y"
    val toks = text.split("\\s+").toSeq
    val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
    val naiveTop = grams.groupBy(identity).values.map(_.size).max
    val (_, _, _, tb, _) = run(1L -> text)(1L)
    assert(math.abs(tb - naiveTop.toDouble / grams.size) < 1e-6)
  }
}
