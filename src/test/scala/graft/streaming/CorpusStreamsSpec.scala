package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

final case class Doc(doc_id: Long, ts: Timestamp, text: String)
final case class Vec(vec_id: Long, embedding: Array[Float])
final case class SourcedDoc(doc_id: Long, source: String, text: String)
final case class LangDoc(doc_id: Long, ts: Timestamp, source: String, lang: String)

class CorpusStreamsSpec extends AnyFunSuite with SharedSpark {

  private def t(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("streaming content dedup drops duplicates across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val stream = MemoryStream[Doc]
    val q = CorpusStreams.dedupDocs(stream.toDF())
      .writeStream.format("memory").queryName("docdedup").outputMode("append").start()
    stream.addData(
      Doc(1, t(0), "the quick brown fox jumps"),
      Doc(2, t(1), "a different document entirely here"))
    q.processAllAvailable()
    stream.addData(
      Doc(3, t(2), "the  quick   brown fox jumps"), // same content modulo whitespace
      Doc(4, t(3), "a third distinct document text"))
    q.processAllAvailable()
    q.stop()
    val ids = sp.table("docdedup").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L), ids.toString)
  }

  test("streaming near-dup admission collapses SimHash-equal docs across batches") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val stream = MemoryStream[Doc]
    val q = CorpusStreams.nearDupAdmission(stream.toDF())
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    stream.addData(
      Doc(1, t(0), "the quick brown fox jumps"),
      Doc(2, t(1), "a wholly different document text"))
    q.processAllAvailable()
    stream.addData(
      // same token SET as doc 1 (order + repetition changed): different
      // content hash, IDENTICAL SimHash signature → near-dup, dropped
      Doc(3, t(2), "jumps the fox quick brown the the"),
      Doc(4, t(3), "yet another novel document entirely"))
    q.processAllAvailable()
    q.stop()
    val ids = sp.table("neardup").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L), ids.toString)

    // the admitted signature column matches the batch q28 kernel's output
    val batch = Seq(Doc(1, t(0), "the quick brown fox jumps")).toDF()
      .select(graft.functions.HashKernels
        .simhash64(split(trim(col("text")), "\\s+")).getField("_1").as("sh"))
      .head.getLong(0)
    val streamedSh = sp.table("neardup").filter(col("doc_id") === 1)
      .select("sh").head.getLong(0)
    assert(streamedSh == batch)
  }

  test("streaming decontamination matches the batch set-probe accounting") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val docs = Seq(
      Doc(1, t(0), "alpha beta gamma delta epsilon"),
      Doc(2, t(1), "zeta eta theta iota kappa"),
      Doc(3, t(2), "alpha beta gamma nothing shared"), // shares 'alpha beta gamma'
      Doc(4, t(3), "totally clean text goes here"))
    val bench = Set("alpha beta gamma") // one benchmark shingle

    // batch execution of the SAME transform
    val batch = CorpusStreams.decontaminate(docs.toDF(), bench)
      .select("doc_id", "n_sh", "n_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.map(_._1) == Set(2L, 4L), batch.toString) // 1 and 3 contaminated

    val stream = MemoryStream[Doc]
    val q = CorpusStreams.decontaminate(stream.toDF(), bench)
      .select("doc_id", "n_sh", "n_hits")
      .writeStream.format("memory").queryName("decontam").outputMode("append").start()
    stream.addData(docs.take(2): _*)
    q.processAllAvailable()
    stream.addData(docs.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("decontam").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }

  test("windowed language-mix counts match the batch aggregation after watermark close") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val docs = Seq(
      LangDoc(1, t(0), "A", "en"), LangDoc(2, t(2), "A", "en"),
      LangDoc(3, t(4), "A", "fr"), LangDoc(4, t(6), "B", "fr"),
      LangDoc(5, t(12), "A", "en")) // second 10-min window
    val batch = CorpusStreams.langMixByWindow(docs.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getString(3), r.getLong(4))).toSet

    val stream = MemoryStream[LangDoc]
    val q = CorpusStreams.langMixByWindow(stream.toDF())
      .writeStream.format("memory").queryName("langmix").outputMode("append").start()
    stream.addData(docs.take(3): _*)
    q.processAllAvailable()
    stream.addData(docs.drop(3): _*)
    q.processAllAvailable()
    // advance the watermark far past both windows so they close and emit
    stream.addData(LangDoc(99, t(600), "Z", "xx"))
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("langmix")
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getString(3), r.getLong(4))).toSet
    assert(batch.subsetOf(streamed), s"streamed $streamed missing batch rows $batch")
  }

  test("streaming quality filter matches the batch q47 keep-set") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val docs = Seq(
      Doc(1, t(0), "one two three four five six seven eight nine ten eleven"),
      Doc(2, t(1), "too short"),
      Doc(3, t(2), "1 2 3 4 5 6 7 8 9 10 11 12")) // enough tokens, no alpha
    val batchKept = CorpusStreams.qualityFilter(docs.toDF())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == Set(1L), batchKept.toString)

    val stream = MemoryStream[Doc]
    val q = CorpusStreams.qualityFilter(stream.toDF()).select("doc_id")
      .writeStream.format("memory").queryName("qual").outputMode("append").start()
    stream.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    assert(sp.table("qual").collect().map(_.getLong(0)).toSet == batchKept)
  }

  test("streaming packing: single batch matches q76 bins; state carries across batches") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    // budget 4: doc1 (3 tok) → bin 0 (prev 0); doc2 (2) → bin 0 (prev 3);
    // doc3 (4) → bin 1 (prev 5); doc4 on source B → bin 0
    val docs = Seq(
      SourcedDoc(1, "A", "a b c"),
      SourcedDoc(2, "A", "d e"),
      SourcedDoc(3, "A", "f g h i"),
      SourcedDoc(4, "B", "x y"))
    val single = CorpusStreams.packingAssignment(sp, docs.toDF(), budget = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(single == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L), single.toString)

    // REAL batch/stream parity: the same corpus through the shared batch
    // packing stage (q76/q82's packSummary) at the same budget must yield
    // the identical per-(source, bin) summary
    val batchSummary = graft.operators.PackingOps.packSummary(
      docs.toDF().select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).as("tok")),
      binBudget = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val fromStream = CorpusStreams.packingAssignment(sp, docs.toDF(), budget = 4)
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tok_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fromStream == batchSummary, s"stream $fromStream != batch $batchSummary")
    assert(batchSummary == Set(("A", 0L, 2L, 5L), ("A", 1L, 1L, 4L), ("B", 0L, 1L, 2L)))

    // cross-batch: source A's consumed-token state carries
    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.packingAssignment(sp, stream.toDF(), budget = 4)
      .writeStream.format("memory").queryName("spack").outputMode("append").start()
    stream.addData(docs.take(2): _*) // A consumes 5 tokens
    q.processAllAvailable()
    stream.addData(SourcedDoc(5, "A", "z")) // prev=5 → bin 1
    q.processAllAvailable()
    q.stop()
    val got = sp.table("spack").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(5L) == 1L, got.toString)
  }

  test("token-budget admission: single batch matches the prefix rule; budget never exceeded") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    // md5(doc_id) order for 1..4: md5('3')=ecc... md5('1')=c4..., md5('2')=c8...,
    // md5('4')=a8... → order: 4, 1, 2, 3. Tokens: 4→4, 1→5, 2→3, 3→6.
    // budget 10: cum 4, 9, 12(drop, and prefix ends), 18(drop).
    val docs = Seq(
      SourcedDoc(1, "A", "a b c d e"),
      SourcedDoc(2, "A", "a b c"),
      SourcedDoc(3, "A", "a b c d e f"),
      SourcedDoc(4, "A", "a b c d"))
    val single = CorpusStreams.tokenBudgetAdmission(sp, docs.toDF(), budget = 10)
    val got = single.collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got == Set((4L, 4L), (1L, 9L)), got.toString)

    // cross-batch: state carries; second batch's docs see the consumed total
    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.tokenBudgetAdmission(sp, stream.toDF(), budget = 10)
      .writeStream.format("memory").queryName("budget").outputMode("append").start()
    stream.addData(docs.take(2): _*) // arrival batch 1: md5 order 1,2 → cum 5, 8
    q.processAllAvailable()
    stream.addData(docs.drop(2): _*) // batch 2: 4 then 3 → cum 12 (drop), 18 (drop)
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("budget").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(streamed == Set((1L, 5L), (2L, 8L)), streamed.toString)
    assert(streamed.forall(_._2 <= 10))
  }

  test("shard router: streamed routing equals the q86 batch assignment") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val docs = (0L until 64L).map(i => SourcedDoc(i, s"src${i % 3}", s"doc $i text"))
    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.shardRouter(stream.toDF())
      .writeStream.format("memory").queryName("shards").outputMode("append").start()
    stream.addData(docs.take(32): _*)
    q.processAllAvailable()
    stream.addData(docs.drop(32): _*) // restart-shaped second batch
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("shards").select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = docs.toDF().select(col("doc_id"),
        graft.operators.MixtureOps.shardCol.as("shard")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed == batch)
    assert(streamed.values.forall(s => s >= 0 && s < 16))
  }

  test("streaming dedup probe: arrivals collide with the static index like the batch op") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    // corpus: three distinct docs (disjoint token sets); arrivals: one
    // exact dup of corpus doc 1, one novel doc
    val mk = (g: Int) => (0 until 30).map(i => s"c${g}w$i").mkString(" ")
    val corpus = Seq((1L, mk(1)), (2L, mk(2)), (3L, mk(3))).toDF("doc_id", "text")
    val index = CorpusStreams.signatureIndex(corpus)

    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.dedupProbeAgainstIndex(
        stream.toDF().select(col("doc_id"), col("text")), index)
      .writeStream.format("memory").queryName("dedupprobe").outputMode("append").start()
    stream.addData(SourcedDoc(100, "web", mk(1))) // dup of corpus doc 1
    q.processAllAvailable()
    stream.addData(SourcedDoc(101, "web", mk(99))) // novel
    q.processAllAvailable()
    q.stop()

    val got = sp.table("dedupprobe").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(identity).view.mapValues(_.length).toMap
    // the dup collides with its twin on all 4 bands; the novel doc on none
    assert(got == Map((100L, 1L) -> 4), got.toString)

    // and the streamed collisions match the batch operator's shared-band
    // counts on the same union corpus
    val union = corpus.union(Seq((100L, mk(1)), (101L, mk(99))).toDF("doc_id", "text"))
    val batch = graft.operators.DedupOps
      .dedupAgainstIndex(union, id => id >= 100, useFastKernel = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2).toInt)).toMap
    assert(batch == got.map { case (k, v) => k -> v })
  }

  test("checkpoint restart: packing state survives a kill and resumes exactly") {
    // The durability contract behind every stateful stream here: stop the
    // query mid-corpus, restart FROM THE CHECKPOINT (same sink, same state
    // store), feed the rest — final output must equal an uninterrupted run
    // over the same batches. Uses the parquet file sink (exactly-once via
    // its metadata log); the memory sink can't test this — it starts empty
    // on every restart.
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val batch1 = Seq(SourcedDoc(1, "A", "a b c"), SourcedDoc(2, "A", "d e"),
      SourcedDoc(3, "B", "x y z"))
    val batch2 = Seq(SourcedDoc(4, "A", "f"), // A resumed at 5 tokens → bin 1
      SourcedDoc(5, "B", "p q"), SourcedDoc(6, "C", "m n o"))

    def runWith(tag: String, interrupted: Boolean): Map[Long, (String, Long, Long)] = {
      val stream = MemoryStream[SourcedDoc]
      val out = s"$base/$tag-out"
      val ck = s"$base/$tag-ck"
      def start() = CorpusStreams.packingAssignment(sp, stream.toDF(), budget = 4)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).outputMode("append").start()
      val q1 = start()
      stream.addData(batch1: _*)
      q1.processAllAvailable()
      if (interrupted) {
        q1.stop() // the kill: state is only in the checkpoint now
        stream.addData(batch2: _*)
        val q2 = start() // resume from checkpoint
        q2.processAllAvailable()
        q2.stop()
      } else {
        stream.addData(batch2: _*)
        q1.processAllAvailable()
        q1.stop()
      }
      sp.read.parquet(out).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    }

    val resumed = runWith("resumed", interrupted = true)
    val straight = runWith("straight", interrupted = false)
    assert(resumed == straight,
      s"restart diverged from the uninterrupted run:\n$resumed\nvs\n$straight")
    // and the state really carried: source A consumed 5 tokens before the
    // kill, so doc 4 must land in bin 1, not restart at bin 0
    assert(resumed(4L)._3 == 1L, resumed.toString)
    assert(resumed(6L)._3 == 0L) // a new source starts fresh post-restart
  }

  test("streaming semantic probe: exact copy collides at sim 1.0, output == batch twin") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val corpus = graft.Tables.embeddings(sp, "/root/testdata/sf0.001")
    val cents = graft.operators.ProductQuantization.trainCoarse(corpus, nList = 8)
    val index = CorpusStreams.semanticIndex(corpus, cents).cache()

    // probe vectors: 9001 is an exact copy of corpus vec 0; 9002 reuses
    // corpus vec 3's embedding (guaranteed in-distribution collisions)
    val byId = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val probes = Seq(Vec(9001L, byId(0L)), Vec(9002L, byId(3L)))

    val stream = MemoryStream[Vec]
    val q = CorpusStreams.semanticProbeAgainstIndex(stream.toDF(), index, cents)
      .writeStream.format("memory").queryName("semprobe").outputMode("append").start()
    stream.addData(probes.head)
    q.processAllAvailable()
    stream.addData(probes(1)) // second micro-batch: same stateless route
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("semprobe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // the batch twin on the same probe frame must produce the same set
    val batch = CorpusStreams.semanticProbeAgainstIndex(probes.toDF(), index, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, s"stream/batch diverged:\n$streamed\nvs\n$batch")
    // each probe is a verbatim corpus member: its own source row collides at 1.0
    assert(streamed.contains((9001L, 0L, 1.0)))
    assert(streamed.contains((9002L, 3L, 1.0)))
  }

  test("streaming perceptual probe: exact + near dup land within ≤7 bits, far doc silent, output == batch twin") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    // corpus: three perceptually distant docs (PerceptualHashSpec's
    // planted-triple construction); arrivals: an exact pixel copy of
    // corpus doc 1, a 2-token near-dup of it, and an unrelated doc
    def toks(seed: String, n: Int) = (0 until n).map(i => s"$seed${i}w${(i * 7) % 13}")
    val base = toks("t", 100)
    val near = base.updated(50, "ZZZZZZZZZZ").updated(51, "QQQQQQQQ")
    val corpus = Seq((1L, base.mkString(" ")), (2L, toks("other", 100).mkString(" ")),
      (3L, toks("third", 100).mkString(" "))).toDF("doc_id", "text")
    val index = CorpusStreams.perceptualIndex(corpus).cache()

    val arrivals = Seq(SourcedDoc(100, "web", base.mkString(" ")),
      SourcedDoc(101, "web", near.mkString(" ")),
      SourcedDoc(102, "web", toks("novel", 100).mkString(" ")))
    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.perceptualProbeAgainstIndex(
        stream.toDF().select(col("doc_id"), col("text")), index)
      .writeStream.format("memory").queryName("pxprobe").outputMode("append").start()
    stream.addData(arrivals.head)
    q.processAllAvailable()
    stream.addData(arrivals.tail: _*) // second micro-batch: same stateless route
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("pxprobe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3), r.getInt(4))).toSet

    // pair-level verdicts (band-deduped): the exact copy collides at 0 on
    // BOTH hash kinds; the near-dup within the ≤7 window on both; the
    // novel doc and the far corpus docs never appear
    val pairs = streamed.map { case (d, i, k, _, h) => (d, i, k) -> h }.toMap
    assert(pairs((100L, 1L, "ahash")) == 0)
    assert(pairs((100L, 1L, "dhash")) == 0)
    assert(pairs.contains((101L, 1L, "ahash")) && pairs((101L, 1L, "ahash")) >= 1
      && pairs((101L, 1L, "ahash")) <= 7)
    assert(pairs.keySet.map(_._1) == Set(100L, 101L))
    assert(pairs.keySet.map(_._2) == Set(1L))
    // exact copy collides on all 8 bands of both kinds (distance 0)
    assert(streamed.count { case (d, _, _, _, _) => d == 100L } == 16)

    // the batch twin on the same arrival frame must produce the same set
    val batch = CorpusStreams.perceptualProbeAgainstIndex(
        arrivals.toDF().select(col("doc_id"), col("text")), index)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3), r.getInt(4))).toSet
    assert(streamed == batch, s"stream/batch diverged:\n$streamed\nvs\n$batch")
  }

  test("perceptual index: band bucket with far more than 32 distinct-sig docs still flags a near-dup of the LATEST doc") {
    val sp = spark
    import sp.implicits._
    // Regression pin for the round-12 advice: the index used to cap each
    // (kind, band, band_key) bucket at 32 docs by doc_id. band_key has
    // only 256 values, so real buckets hold ~N/256 docs; a late doc
    // sharing a band byte with 32 earlier docs (which implies NOTHING
    // about near-duplication) was evicted and its streaming near-dups
    // silently admitted. The fix collapses buckets to one representative
    // per DISTINCT signature — sound because Hamming distance is a
    // function of the signature alone. This spec brute-forces >40 docs
    // with DISTINCT ahash signatures that all share one band-0 byte, puts
    // the target doc LAST by doc_id, and asserts (a) every distinct
    // signature survives in the index bucket and (b) an exact copy of the
    // late doc is still flagged at distance 0.
    def toks(i: Int) = (0 until 30).map(j => s"v${i}_${j}q${(i * 31 + j * 7) % 97}")
    val cands = (0 until 12000).iterator.map { i =>
      val tk = toks(i)
      val sig = graft.operators.MultimodalOps.aHash64(
        graft.operators.MultimodalOps.bitmap32(tk))
      (i, tk.mkString(" "), sig, (sig & 255L).toInt)
    }.toSeq
    val (bandKey, hits) = cands.groupBy(_._4).maxBy(_._2.size)
    // distinct full signatures only — identical-sig docs are MEANT to collapse
    val distinctSig = hits.groupBy(_._3).map(_._2.head).toSeq.sortBy(_._1).take(41)
    assert(distinctSig.size > 32, s"brute force found only ${distinctSig.size} distinct-sig collisions")
    val corpus = distinctSig.zipWithIndex
      .map { case ((_, text, _, _), k) => (k.toLong, text) }
      .toDF("doc_id", "text")
    val target = distinctSig.last
    val targetId = distinctSig.size - 1L

    val index = CorpusStreams.perceptualIndex(corpus).cache()
    // (a) the hot bucket retains EVERY distinct signature, incl. the target's
    val bucketSigs = index
      .filter(col("kind") === "ahash" && col("band") === 0 && col("band_key") === bandKey)
      .select("idx_sig").collect().map(_.getLong(0)).toSet
    assert(bucketSigs.size == distinctSig.size,
      s"bucket collapsed to ${bucketSigs.size} of ${distinctSig.size} distinct sigs")
    assert(bucketSigs.contains(target._3), "latest doc's signature evicted from its band bucket")

    // (b) an exact copy of the late doc must be flagged at distance 0
    // (batch form of the probe — stream==batch parity is pinned above)
    val probe = Seq((9000L, target._2)).toDF("doc_id", "text")
    val flagged = CorpusStreams.perceptualProbeAgainstIndex(probe, index)
      .filter(col("hamming") === 0 && col("kind") === "ahash").collect()
    assert(flagged.nonEmpty, "near-dup of the late doc was silently admitted")
    assert(flagged.map(_.getLong(1)).toSet == Set(targetId),
      "distance-0 match must resolve to the late doc's signature representative")
    index.unpersist()
  }

  test("checkpoint restart: budget admission and content dedup resume exactly") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt2").toString

    // token-budget admission: A consumes 9 of 10 before the kill; the
    // post-restart doc must be rejected by the RECOVERED counter
    val stream = MemoryStream[SourcedDoc]
    val out = s"$base/adm-out"
    def startAdm() = CorpusStreams.tokenBudgetAdmission(sp, stream.toDF(), budget = 10)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$base/adm-ck").outputMode("append").start()
    val q1 = startAdm()
    stream.addData(SourcedDoc(1, "A", "a b c d e"), SourcedDoc(2, "A", "a b c d"))
    q1.processAllAvailable()
    q1.stop()
    stream.addData(SourcedDoc(3, "A", "a b")) // cum 11 > 10: must be dropped
    val q2 = startAdm()
    q2.processAllAvailable()
    q2.stop()
    val admitted = sp.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(admitted == Set((1L, 5L), (2L, 9L)), admitted.toString)

    // content dedup: the dropDuplicatesWithinWatermark state must survive —
    // a duplicate of a PRE-kill document arriving post-restart is dropped
    val dstream = MemoryStream[Doc]
    val dout = s"$base/dedup-out"
    def startDedup() = CorpusStreams.dedupDocs(dstream.toDF())
      .writeStream.format("parquet").option("path", dout)
      .option("checkpointLocation", s"$base/dedup-ck").outputMode("append").start()
    val d1 = startDedup()
    dstream.addData(Doc(1, t(0), "the quick brown fox"), Doc(2, t(1), "something else"))
    d1.processAllAvailable()
    d1.stop()
    dstream.addData(Doc(3, t(2), "the  quick brown   fox"), // dup of pre-kill doc 1
      Doc(4, t(3), "a genuinely new document"))
    val d2 = startDedup()
    d2.processAllAvailable()
    d2.stop()
    val ids = sp.read.parquet(dout).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L), ids.toString)
  }

  test("funnel admission: streamed verdicts equal the batch rule engine bit-for-bit") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val corpus = graft.Tables.documents(sp, "/root/testdata/sf0.001")
    val docs = corpus.select("doc_id", "source", "text").as[SourcedDoc].collect() ++
      // degenerate shapes a crawl stream WILL contain: one-token and
      // empty documents (the n<2 path that must not build bigrams —
      // sequence(0,-1) would index l[-1], fatal under ANSI mode)
      Seq(SourcedDoc(900001L, "edge", "solo"), SourcedDoc(900002L, "edge", "  "))
    val batchAll = graft.operators.TextOps.funnelRuled(
      sp.createDataFrame(docs.toSeq.map(d => (d.doc_id, d.source, d.text)))
        .toDF("doc_id", "source", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("rule")).toMap
    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.funnelAdmission(stream.toDF())
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    stream.addData(docs.take(docs.length / 2): _*)
    q.processAllAvailable()
    stream.addData(docs.drop(docs.length / 2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("funnel").collect()
    assert(streamed.length == docs.length)
    streamed.filter(_.getAs[String]("source") == "edge").foreach { r =>
      assert(r.getAs[String]("rule") == batchAll(r.getAs[Long]("doc_id")))
      assert(r.getAs[String]("rule") == "1_too_short")
    }
    streamed.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("rule") == batchAll(id),
        s"doc $id: stream ${r.getAs[String]("rule")} != batch ${batchAll(id)}")
      assert(r.getAs[Boolean]("admitted") == (batchAll(id) == "kept"))
    }
  }

  test("funnel admission: crafted rule-trigger docs verdict identically to q112's spec") {
    val sp = spark
    import sp.implicits._
    // the same six crafted docs FilterFunnelSpec pins for the batch engine
    val crafted = Seq(
      SourcedDoc(1, "s_short", "only three tokens"),
      SourcedDoc(2, "s_alpha", "1234 5678 9012 3456 7890 1234 5678 9012 3456 7890 1234 5678"),
      SourcedDoc(3, "s_stop", "the the the the the the the the the the the the"),
      SourcedDoc(4, "s_rep", "x1 y1 x1 y1 x1 y1 x1 y1 x1 y1 x1 y1"),
      SourcedDoc(5, "s_len", "b c d e f g h j k l m p"),
      SourcedDoc(6, "s_kept", "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"))
    val out = CorpusStreams.funnelAdmission(crafted.toDF())
      .collect().map(r => r.getAs[String]("source") -> r.getAs[String]("rule")).toMap
    assert(out == Map(
      "s_short" -> "1_too_short", "s_alpha" -> "2_low_alpha",
      "s_stop" -> "3_stopword_spam", "s_rep" -> "4_repetitive",
      "s_len" -> "5_word_length", "s_kept" -> "kept"))
  }

  test("DSIR admission: streamed log-weights equal the batch path bit-for-bit") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val corpus = graft.Tables.documents(sp, "/root/testdata/sf0.001")
    val model = CorpusStreams.dsirModelMap(corpus)
    assert(model.nonEmpty &&
      model.size <= graft.operators.QualityModels.DsirBuckets)
    val batchLw = graft.operators.QualityModels
      .dsirLogWeights(corpus, graft.operators.QualityModels.dsirModel(corpus))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

    val docs = corpus.select("doc_id", "source", "text").as[SourcedDoc].collect() ++
      // a doc of entirely out-of-vocabulary bigrams: unseen buckets must
      // contribute 0 on BOTH paths (the old-model ingest/backfill case),
      // not drop the doc from one of them
      Seq(SourcedDoc(900001L, "edge", "zzqx1 zzqx2 zzqx3 zzqx4"))
    val oov = sp.createDataFrame(Seq((900001L, "edge",
      "zzqx1 zzqx2 zzqx3 zzqx4"))).toDF("doc_id", "source", "text")
    val batchOov = graft.operators.QualityModels
      .dsirLogWeights(oov, graft.operators.QualityModels.dsirModel(corpus))
      .collect()
    assert(batchOov.length == 1,
      "batch scoring under an older model must keep the unseen-feature doc")
    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.dsirAdmission(stream.toDF(), model, logZ = 2.0)
      .writeStream.format("memory").queryName("dsir").outputMode("append").start()
    stream.addData(docs.take(docs.length / 2): _*)
    q.processAllAvailable()
    stream.addData(docs.drop(docs.length / 2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("dsir").collect()
    assert(streamed.nonEmpty)
    // every batch-scored doc streams through with the identical log-weight
    // (same 6dp llr terms, exact DECIMAL fold — no float drift allowed)
    val streamedLw = streamed.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight")).toMap
    batchLw.foreach { case (id, lw) =>
      assert(streamedLw(id) == lw, s"doc $id: stream ${streamedLw(id)} != batch $lw")
    }
    // the unseen-feature doc: identical weight (0-contribution) on both paths
    assert(streamedLw(900001L) == batchOov.head.getDouble(2),
      s"OOV doc: stream ${streamedLw(900001L)} != batch ${batchOov.head.getDouble(2)}")
    // admission decision is exactly u < admit_prob (pure function of the row)
    streamed.foreach { r =>
      val u = corpus.sparkSession.range(1).select(
        graft.operators.QualityModels.dsirUniform(lit(r.getAs[Long]("doc_id")))
      ).head().getDouble(0)
      assert(r.getAs[Boolean]("admitted") == (u < r.getAs[Double]("admit_prob")))
    }
  }

  test("DSIR admission: logZ is a monotone throttle and replays are identical") {
    val sp = spark
    val corpus = graft.Tables.documents(sp, "/root/testdata/sf0.001")
    val model = CorpusStreams.dsirModelMap(corpus)
    // calibrate the throttle from the weight distribution, as a deployment
    // would (logZ is the normalizer estimate, not an absolute constant)
    val lws = graft.operators.QualityModels
      .dsirLogWeights(corpus, graft.operators.QualityModels.dsirModel(corpus))
      .select("log_weight").collect().map(_.getDouble(0)).sorted
    val (p10, p90) = (lws((lws.length * 0.1).toInt), lws((lws.length * 0.9).toInt))
    // stateless column logic — exercising it on a batch frame is exact
    val loose = CorpusStreams.dsirAdmission(corpus, model, logZ = p10)
    val tight = CorpusStreams.dsirAdmission(corpus, model, logZ = p90)
    val nLoose = loose.filter(col("admitted")).count()
    val nTight = tight.filter(col("admitted")).count()
    assert(nLoose >= nTight, s"raising logZ must not admit more ($nLoose < $nTight)")
    assert(nLoose > 0, "zero admissions at logZ=p10 — weights degenerate")
    // replay-safe: the same frame admits the same set
    val again = CorpusStreams.dsirAdmission(corpus, model, logZ = p10)
    assert(loose.exceptAll(again).count() == 0 && again.exceptAll(loose).count() == 0)
  }

  test("streaming substring probe: corpus spans collide positionally; ingest rewrite equals batch removal") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val span = (1 to 14).map(i => s"s$i").mkString(" ") // 14 tokens → 3 colliding 12-gram starts
    val fill = (tag: String, n: Int) => (1 to n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (1L, s"${fill("a", 5)} $span ${fill("b", 5)}"),
      (2L, fill("c", 30))).toDF("doc_id", "text")
    val index = CorpusStreams.gramIndex(corpus)

    // stream side: one doc embedding the corpus span, one novel doc
    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.substrSpanProbe(
        stream.toDF().select(col("doc_id"), col("text")), index)
      .writeStream.format("memory").queryName("substrprobe").outputMode("append").start()
    stream.addData(SourcedDoc(100, "web", s"${fill("x", 4)} $span ${fill("y", 4)}"))
    q.processAllAvailable()
    stream.addData(SourcedDoc(101, "web", fill("z", 30)))
    q.processAllAvailable()
    q.stop()
    val hits = sp.table("substrprobe").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toSet
    // doc 100's span occupies token positions 5..18 → 12-gram starts 5, 6, 7
    assert(hits == Set((100L, 5L), (100L, 6L), (100L, 7L)), hits.toString)

    // foreachBatch rewrite: equals the batch transform on index ∪ batch,
    // restricted to the batch docs (all duplicate spans are cross-index)
    val batchDocs = Seq(
      (100L, "web", s"${fill("x", 4)} $span ${fill("y", 4)}"),
      (101L, "web", fill("z", 30))).toDF("doc_id", "source", "text")
    val got = CorpusStreams.substrRemovalAtIngest(batchDocs, index)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4))).toSet
    val union = corpus.select(col("doc_id"), lit("corpus").as("source"), col("text"))
      .unionByName(batchDocs)
    val expect = graft.operators.SubstrDedup.removeDuplicateSpans(union)
      .filter(col("doc_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expect, s"ingest rewrite diverged:\n got=$got\n exp=$expect")
    // the span is really gone and conservation holds
    val cleaned = got.find(_._1 == 100L).get
    assert(!cleaned._2.contains("s1 s2") && cleaned._4 == cleaned._3 - 14)
  }

  test("streaming CDC chunk probe flags a shifted re-crawl; admission rejects it") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val body = (1 to 150).map(i => s"c${i * 13 % 101}v$i").mkString(" ")
    val corpus = Seq((1L, "web", body)).toDF("doc_id", "source", "text")
    val index = CorpusStreams.chunkIndex(corpus).cache()
    assert(index.count() > 2, "the corpus doc must produce several CDC chunks")

    // stream side: a shifted copy (head insertion) and a novel doc
    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.chunkProbeAgainstIndex(
        stream.toDF().select(col("doc_id"), col("text")), index)
      .writeStream.format("memory").queryName("chunkprobe").outputMode("append").start()
    stream.addData(SourcedDoc(100, "web", s"INSERTED $body"))
    q.processAllAvailable()
    stream.addData(SourcedDoc(101, "web", (1 to 150).map(i => s"n$i").mkString(" ")))
    q.processAllAvailable()
    q.stop()
    val hits = sp.table("chunkprobe").collect().map(_.getLong(0)).toSet
    assert(hits == Set(100L),
      s"the shifted copy must collide (CDC re-sync), the novel doc must not: $hits")
    val nHits = sp.table("chunkprobe").count()
    assert(nHits >= index.count() - 1,
      s"all but the head chunk re-sync: $nHits of ${index.count()}")

    // foreachBatch admission: shifted copy rejected, novel admitted, and a
    // doc quoting ONE corpus chunk scores its token share, not 0 or 1
    val batch = Seq(
      (100L, "web", s"INSERTED $body"),
      (101L, "web", (1 to 150).map(i => s"n$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val adm = CorpusStreams.chunkDupAdmission(batch, index).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Double]("dup_frac"), r.getAs[Boolean]("admitted"))).toMap
    assert(adm(100L)._1 > 0.8 && !adm(100L)._2,
      s"shifted copy must be token-dominated by known chunks: ${adm(100L)}")
    assert(adm(101L)._1 == 0.0 && adm(101L)._2, s"novel doc admits: ${adm(101L)}")
  }

  test("CDC production kernel: lossless partition, re-sync, determinism") {
    val sp = spark
    import sp.implicits._
    val body = (1 to 120).map(i => s"p${i * 29 % 89}q$i").mkString(" ")
    val docs = Seq((1L, "web", body), (2L, "web", s"HEAD $body"))
      .toDF("doc_id", "source", "text")
    val ch = graft.operators.DedupOps.cdcChunksFast(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // lossless: chunk lengths sum to the token count per doc
    val sums = ch.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(sums == Map(1L -> 120, 2L -> 121), sums.toString)
    // re-sync: the shifted copy shares all but its head chunk
    val h1 = ch.filter(_._1 == 1L).map(_._2).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._2).toSet
    assert((h1 & h2).size >= h1.size - 1, s"${(h1 & h2).size} of ${h1.size}")
    // deterministic
    val again = graft.operators.DedupOps.cdcChunksFast(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(ch.sortBy(x => (x._1, x._2)).toSeq == again.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("streaming CMS: state stays depth*width and matches the batch sketch") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val (depth, width) = (4, 8)
    val d1 = Seq(
      SourcedDoc(1, "web", "aa aa bb cc dd"),
      SourcedDoc(2, "web", "ee ff gg aa bb"))
    val d2 = Seq(
      SourcedDoc(3, "web", "hh ii jj aa"),
      SourcedDoc(4, "web", "bb bb kk ll mm"))
    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.frequencySketch(stream.toDF(), depth, width)
      .writeStream.format("memory").queryName("cms").outputMode("complete").start()
    stream.addData(d1: _*); q.processAllAvailable()
    stream.addData(d2: _*); q.processAllAvailable()
    q.stop()
    val got = sp.table("cms").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size <= depth * width,
      s"sketch state is bounded by the grid: ${got.size}")
    val batch = graft.operators.TextOps.countMinSketch(
      (d1 ++ d2).toDF("doc_id", "source", "text")
        .select(explode(graft.operators.TextOps.tokens(col("text"))).as("token")),
      depth, width).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == batch, "streamed cells must equal the batch sketch")
  }

  test("rendezvous router: stream equals the batch window form; resize is minimal") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val ids = (1L to 200L)
    // expression form == batch window form on the same ids
    val viaCol = ids.toDF("doc_id")
      .withColumn("s", graft.operators.MixtureOps.rendezvousCol(col("doc_id"), 16))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaWindow = graft.operators.MixtureOps
      .rendezvousShard(ids.toDF("doc_id"), 16, "s")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaCol == viaWindow, "per-row argmax must equal the window pick")

    // streamed routing equals the batch expression, across micro-batches
    val stream = MemoryStream[SourcedDoc]
    val q = CorpusStreams.rendezvousRouter(stream.toDF(), 16)
      .select("doc_id", "shard")
      .writeStream.format("memory").queryName("rdvroute").outputMode("append").start()
    stream.addData(SourcedDoc(1, "web", "x"), SourcedDoc(2, "web", "y"))
    q.processAllAvailable()
    stream.addData(SourcedDoc(3, "web", "z"))
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("rdvroute").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed == Map(1L -> viaCol(1L), 2L -> viaCol(2L), 3L -> viaCol(3L)))

    // resize 16 -> 20 re-routes only to NEW shards (HRW monotonicity)
    val via20 = ids.toDF("doc_id")
      .withColumn("s", graft.operators.MixtureOps.rendezvousCol(col("doc_id"), 20))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val moved = ids.filter(i => viaCol(i) != via20(i))
    assert(moved.nonEmpty && moved.forall(i => via20(i) >= 16))
  }
}
