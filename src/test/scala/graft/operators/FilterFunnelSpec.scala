package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Rule-activation evidence for the round-9 audit operators. The driver
  * corpus is clean (q112 reports every document kept there — correct,
  * but it exercises only the fall-through), so each rule and the
  * first-fail precedence are pinned here on crafted documents, and
  * q111/q113's accounting identities on the real sf0.001 tables.
  */
class FilterFunnelSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  /** Write a crafted documents.parquet and return its directory. */
  private def corpusDir(docs: Seq[(Long, String, String)]): String = {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("graft_funnel").toString
    docs.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q112: every rule fires on its crafted document, first-fail precedence holds") {
    val dir = corpusDir(Seq(
      (1L, "s_short", "only three tokens"),
      (2L, "s_alpha", "1234 5678 9012 3456 7890 1234 5678 9012 3456 7890 1234 5678"),
      // all-stopword doc ALSO maxes the top-bigram rule — rule 3 must
      // claim it first (fixed attribution order)
      (3L, "s_stop", "the the the the the the the the the the the the"),
      (4L, "s_rep", "x1 y1 x1 y1 x1 y1 x1 y1 x1 y1 x1 y1"),
      (5L, "s_len", "b c d e f g h j k l m p"),
      (6L, "s_kept", "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima")))
    val out = TextOps.q112FilterFunnel(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("rule")).toMap
    assert(out("s_short") == "1_too_short")
    assert(out("s_alpha") == "2_low_alpha")
    assert(out("s_stop") == "3_stopword_spam", "stopword rule must outrank repetition")
    assert(out("s_rep") == "4_repetitive")
    assert(out("s_len") == "5_word_length")
    assert(out("s_kept") == "kept")
  }

  test("q112: attribution partitions the corpus and is deterministic") {
    val df = TextOps.q112FilterFunnel(spark, sf).cache()
    val total = graft.Tables.documents(spark, sf).count()
    assert(df.agg(sum("n_docs")).head().getLong(0) == total,
      "every document is attributed to exactly one rule")
    val again = TextOps.q112FilterFunnel(spark, sf)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
  }

  test("q111 fertility: at least one BPE token per word, occurrences conserved") {
    val df = BpeVocab.q111Fertility(spark, sf).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0,
        "a word can never segment to fewer than one BPE token")
      assert(r.getAs[Double]("chars_per_bpe") >= 1.0 - 1e-9)
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("n_word_occurrences"))
    }
    val totalWords = graft.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+"))).count()
    assert(rows.map(_.getAs[Long]("n_word_occurrences")).sum == totalWords,
      "fertility table must account for every word occurrence")
  }

  test("q112/q113 plan shapes: no rank window in the funnel; the diff shuffles hashes, not bodies") {
    val funnel = TextOps.q112FilterFunnel(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!funnel.contains("Window"),
      "funnel attribution is pure aggregation — a window would buffer per-doc state")
    val diff = PipelineOps.q113SnapshotDiff(spark, sf).queryExecution
    val exchanges = diff.executedPlan.toString.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).mkString("\n")
    assert(!exchanges.contains("text"),
      s"document bodies must be hashed BEFORE the join shuffle:\n$exchanges")
    diff.executedPlan // full-outer join present on doc_id
    assert(diff.executedPlan.toString.contains("FullOuter"))
  }

  test("q121: a cross-split duplicate is reported, a same-split duplicate is not") {
    def splitOf(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val c = "%02x".format(h(0) & 0xff).charAt(0)
      if (c < 'c') "train" else if (c < 'e') "val" else "test"
    }
    val ids = (0L until 200L)
    val train = ids.filter(splitOf(_) == "train").take(3)
    val test = ids.filter(splitOf(_) == "test").take(1)
    assert(train.size == 3 && test.size == 1)
    // leak: one train doc and one test doc share content;
    // benign: two TRAIN docs share content (must NOT be reported)
    val docs = Seq(
      (train(0), "s", "leaked benchmark answer text here"),
      (test(0), "s", "leaked  benchmark   answer text here"), // same modulo ws
      (train(1), "s", "duplicated but only inside train"),
      (train(2), "s", "duplicated but only inside train"))
    val dir = corpusDir(docs)
    val out = TextOps.q121SplitLeakage(spark, dir).collect()
    assert(out.length == 1, s"exactly the cross-split group: ${out.mkString}")
    assert(out.head.getAs[String]("split_pair") == "test+train")
    assert(out.head.getAs[Long]("n_leaky_groups") == 1L)
    assert(out.head.getAs[Long]("n_docs_involved") == 2L)
  }

  test("q113 snapshot diff: change classes match the content-addressed simulation") {
    val sp = spark
    val df = PipelineOps.q113SnapshotDiff(sp, sf).cache()
    val byChange = df.collect()
      .groupBy(_.getAs[String]("change"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val h1 = substring(md5(concat(lit("snap:"), col("doc_id").cast("string"))), 1, 1)
    val tagged = graft.Tables.documents(sp, sf).select(h1.as("h"))
    val n = (d: String) => tagged.filter(col("h") === d).count()
    val total = tagged.count()
    assert(byChange.getOrElse("added", 0L) == n("0"))
    assert(byChange.getOrElse("removed", 0L) == n("1"))
    assert(byChange.getOrElse("changed", 0L) == n("f"))
    assert(byChange.getOrElse("unchanged", 0L) == total - n("0") - n("1") - n("f"))
  }
}
