package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite with graft.SharedSpark {

  test("native expression matches the HOF formulation and hand values") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f), 0.0),
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f), 1.0),
      (Array(1f, 0f), Array(1f, 1f), 1.0 / math.sqrt(2.0)),
      (Array(-1f, 2f, 0.5f), Array(3f, -0.25f, 8f), {
        val dot = -3.0 + -0.5 + 4.0
        dot / (math.sqrt(1 + 4 + 0.25) * math.sqrt(9 + 0.0625 + 64))
      })
    ).toDF("a", "b", "expected")
    val hof = {
      val dot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (s, v) => s + v)
      val na = sqrt(aggregate(col("a"), lit(0.0d), (s, v) => s + v * v))
      val nb = sqrt(aggregate(col("b"), lit(0.0d), (s, v) => s + v * v))
      dot / (na * nb)
    }
    val rows = df.select(CosineSimilarity(col("a"), col("b")).as("native"),
      hof.as("hof"), col("expected")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-12)
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("stays inside whole-stage codegen") {
    // a real scan (local Seqs constant-fold to LocalTableScan)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(CosineSimilarity(col("embedding"), col("embedding")).as("sim"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("cosinesimilarity")), plan)
    // sanity: self-similarity is 1
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("null arrays propagate null") {
    import spark.implicits._
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(CosineSimilarity(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }
}
