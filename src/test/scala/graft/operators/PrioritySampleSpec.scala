package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Semantics of weighted priority sampling (q106): the exact-integer
  * priority formula, the content-addressed stability property (adding a
  * new source never changes another source's sample), and the quota
  * shape. Value parity at sf0.01 is the driver's DuckDB gate. */
class PrioritySampleSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def write(rows: Seq[(Long, String, Long)]): String = {
    val df = rows.toDF("doc_id", "source", "n_chars").select(
      col("doc_id"), lit("x").as("text"), lit("en").as("lang"),
      col("source"), col("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("pri").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5u32(id: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h.substring(0, 8), 16)
  }

  test("priority is exactly w*2^32/(v+1) from the content-addressed uniform") {
    val dir = write(Seq((7L, "a", 100L), (8L, "a", 100L), (9L, "a", 1L)))
    val out = PipelineOps.q106PrioritySample(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    Seq(7L, 8L, 9L).foreach { id =>
      val w = if (id == 9L) 1.0 else 100.0
      val exp = BigDecimal(w * 4294967296.0 / (md5u32(id) + 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(id) == exp, s"doc $id")
    }
  }

  test("content-addressed stability: a new source never perturbs existing samples") {
    val base = (1L to 40L).map(i => (i, if (i <= 20) "a" else "b", 50 + i))
    val dirA = write(base)
    val dirB = write(base ++ (100L to 120L).map(i => (i, "c", 200L)))
    def sample(dir: String) = PipelineOps.q106PrioritySample(spark, dir).collect()
      .map(r => (r.getString(1), r.getInt(4), r.getLong(0)))
      .filter(t => t._1 == "a" || t._1 == "b").toSet
    assert(sample(dirA) == sample(dirB))
  }

  test("quota shape: at most 5 per source, contiguous ranks, priority non-increasing") {
    val out = PipelineOps.q106PrioritySample(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(3), r.getInt(4)))
    out.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(g.length <= 5)
      assert(sorted.map(_._4).toList == (1 to g.length).toList)
      assert(sorted.map(_._3).zip(sorted.map(_._3).drop(1)).forall { case (a, b) => a >= b })
    }
  }
}
