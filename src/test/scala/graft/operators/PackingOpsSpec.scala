package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Specs for the round-6 sequence-assembly surface (q76–q80). Value-level
  * parity is the driver's DuckDB gate; these pin the semantic invariants
  * that the hash compare can't express — conservation laws (packing loses
  * no tokens, chunking covers every token), error bounds (quantization err
  * ≤ half a step), and metric ranges (TVD and Gini in their closed forms).
  */
class PackingOpsSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  private def docTokens = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("source"),
      size(TextOps.tokens(col("text"))).as("tok"))

  test("q76 packing: conserves tokens and docs; summary equals the prefix-sum replay") {
    val df = PackingOps.q76SeqPacking(spark, sf).cache()
    val exp = docTokens.groupBy("source")
      .agg(sum("tok").as("tok_exp"), count(lit(1)).as("n_exp"))
    val got = df.groupBy("source")
      .agg(sum("tok_sum").as("tok_got"), sum("n_docs").as("n_got"))
    assert(exp.join(got, "source")
      .filter(col("tok_exp") =!= col("tok_got") || col("n_exp") =!= col("n_got"))
      .count() == 0)
    // the summary equals an exact driver-side replay of the prefix-sum
    // rule (bins need not be dense in general — an oversized doc spans
    // several bins — so the check is equality, not gap-freedom)
    val replay = docTokens.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong))
      .groupBy(_._2)
      .flatMap { case (src, docs) =>
        docs.sortBy(_._1).foldLeft((0L, Map.empty[(String, Long), (Long, Long)])) {
          case ((prev, acc), (_, _, tok)) =>
            val key = (src, prev / PackingOps.SeqBudget)
            val (n0, t0) = acc.getOrElse(key, (0L, 0L))
            (prev + tok, acc + (key -> (n0 + 1, t0 + tok)))
        }._2
      }.toMap
    val summary = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(summary == replay, s"summary $summary vs replay $replay")
  }

  test("q77 chunking: every token covered; stride/width arithmetic holds") {
    val df = PackingOps.q77ChunkWindows(spark, sf).cache()
    // per doc: chunk 0 starts at token 1; the LAST chunk ends at token n
    // (coverage), and every non-final chunk is exactly the full width
    val toks = docTokens
    val perDoc = df.groupBy("doc_id")
      .agg(max("ci").as("last_ci"), count(lit(1)).as("n_chunks"))
      .join(toks, "doc_id")
    // chunk count formula: 1 if n<=64 else ceil((n-64)/48)+1
    val expChunks = when(col("tok") <= 64, lit(1L))
      .otherwise(ceil((col("tok") - 64).cast("double") / 48).cast("long") + 1L)
    assert(perDoc.filter(col("n_chunks") =!= expChunks ||
      col("last_ci") =!= col("n_chunks") - 1).count() == 0)
    // non-final chunks are full-width; final chunk reaches the last token:
    // 48*ci + chunk_tok == n for the final chunk (start + len = end)
    val joined = df.join(toks, "doc_id")
      .join(perDoc.select(col("doc_id"), col("last_ci")), "doc_id")
    assert(joined.filter(col("ci") < col("last_ci") && col("chunk_tok") =!= 64)
      .count() == 0)
    assert(joined.filter(col("ci") === col("last_ci") &&
      col("ci") * 48 + col("chunk_tok") =!= col("tok")).count() == 0)
  }

  test("q77 chunking: first/last tokens match a direct slice of the doc") {
    val sample = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
    val df = PackingOps.q77ChunkWindows(spark, sf).join(sample, "doc_id")
    val bad = df.filter(
      col("first_tok") =!= element_at(col("ts"), col("ci").cast("int") * 48 + 1) ||
        col("last_tok") =!= element_at(col("ts"),
          col("ci").cast("int") * 48 + col("chunk_tok").cast("int")))
    assert(bad.count() == 0)
  }

  test("q78 quantization: mean abs error bounded by half an int8 step") {
    val df = PackingOps.q78EmbedQuantize(spark, sf)
    // |v - deq| <= step/2 pointwise, so the mean must obey the same bound
    // (plus 6dp-rounding slack on dmin6/dmax6 used to reconstruct the step)
    val bad = df.filter(
      col("mean_abs_err") > (col("dmax6") - col("dmin6")) / 255.0 / 2.0 + 1e-5)
    assert(bad.count() == 0)
    assert(df.count() == 64)
    assert(df.filter(col("mean_abs_err") < 0).count() == 0)
  }

  test("q79 drift: TVD in [0,1]; doc counts conserved") {
    val df = PackingOps.q79LangDrift(spark, sf).cache()
    assert(df.filter(col("tv_dist") < 0 || col("tv_dist") > 1).count() == 0)
    val total = graft.Tables.documents(spark, sf).count()
    assert(df.agg(sum("n_docs")).head.getLong(0) == total)
  }

  test("q79 drift: absent languages count (single-lang source vs 60/40 mix)") {
    import spark.implicits._
    // source A: 6 en; source B: 4 fr → global {en: 0.6, fr: 0.4}
    // TVD(A) = 0.5·(|1−0.6| + |0−0.4|) = 0.4 — the |0−p_glob| term for fr
    // must be included (the subset formula would report 0.2)
    val docs = ((1 to 6).map(i => (i.toLong, "x", "en", "A")) ++
      (7 to 10).map(i => (i.toLong, "y", "fr", "B")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-q79").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = PackingOps.q79LangDrift(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("A") == 0.4, got.toString)
    assert(got("B") == 0.6, got.toString) // 0.5·(|1−0.4| + 0.6)
  }

  test("empty and whitespace-only docs: Spark matches the DuckDB split convention") {
    import spark.implicits._
    // doc 2 is whitespace-only, doc 3 empty: the shared tokenizer must
    // yield [''] (1 token) like DuckDB's string_split_regex, so packing
    // and chunking count them identically on both engines
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "A"),
      (2L, "   ", "en", "A"),
      (3L, "", "en", "A"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // q76: tokens = 3 + 1 + 1 = 5, one bin, all three docs packed
    val packed = PackingOps.q76SeqPacking(spark, tmp).collect()
    assert(packed.length == 1 &&
      packed(0).getAs[Long]("n_docs") == 3 &&
      packed(0).getAs[Long]("tok_sum") == 5, packed.mkString(","))
    // q77: the degenerate docs each produce exactly one 1-token chunk
    val chunks = PackingOps.q77ChunkWindows(spark, tmp)
      .filter(col("doc_id") >= 2).collect()
    assert(chunks.length == 2 &&
      chunks.forall(r => r.getAs[Int]("chunk_tok") == 1
        && r.getAs[String]("first_tok") == ""), chunks.mkString(","))
    // q80: a charless doc degenerates to one '' "char" on BOTH engines
    // (Spark split keeps the single empty field, like DuckDB) — row with
    // n=1, gini=0, not a dropped doc
    val gini = PackingOps.q80CharDiversity(spark, tmp).collect()
    assert(gini.length == 3, gini.mkString(","))
    gini.filter(_.getLong(0) >= 2).foreach { r =>
      assert(r.getAs[Long]("n_chars_nonws") == 1
        && r.getAs[Double]("gini") == 0.0, r.toString)
    }
  }

  test("q80 gini: closed-form range [0, 1 - 1/distinct]") {
    val df = PackingOps.q80CharDiversity(spark, sf).cache()
    assert(df.filter(col("gini") < 0).count() == 0)
    // gini = 1 - sum(c^2)/T^2 maximizes at 1 - 1/k for k distinct chars
    assert(df.filter(
      col("gini") > lit(1.0) - lit(1.0) / col("n_distinct_chars") + 1e-6)
      .count() == 0)
    // a doc that is a single repeated char has gini exactly 0
    import spark.implicits._
    val one = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-q80").toString
    one.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val g = PackingOps.q80CharDiversity(spark, tmp).head
    assert(g.getAs[Long]("n_chars_nonws") == 8L)
    assert(g.getAs[Long]("n_distinct_chars") == 1L)
    assert(g.getAs[Double]("gini") == 0.0)
  }
}
