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

  test("q76 packing: conserves tokens and docs; bins dense from 0 per source") {
    val df = PackingOps.q76SeqPacking(spark, sf).cache()
    val exp = docTokens.groupBy("source")
      .agg(sum("tok").as("tok_exp"), count(lit(1)).as("n_exp"))
    val got = df.groupBy("source")
      .agg(sum("tok_sum").as("tok_got"), sum("n_docs").as("n_got"))
    assert(exp.join(got, "source")
      .filter(col("tok_exp") =!= col("tok_got") || col("n_exp") =!= col("n_got"))
      .count() == 0)
    // bins are exactly 0..floor((total - last_doc_tok) / budget): dense, no gaps
    val w = Window.partitionBy("source").orderBy("bin")
    assert(df.select(col("source"), col("bin"), lag("bin", 1).over(w).as("p"))
      .filter((col("p").isNull && col("bin") =!= 0) ||
        (col("p").isNotNull && col("bin") =!= col("p") + 1))
      .count() == 0)
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
