package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

final case class Doc(doc_id: Long, ts: Timestamp, text: String)

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
}
