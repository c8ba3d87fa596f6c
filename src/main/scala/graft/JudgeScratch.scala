package graft

import org.apache.spark.sql.SparkSession
import graft.operators._

object JudgeScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    DedupOps.q28Simhash(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet("/tmp/judge/q28")
    SimilarityOps.q30IvfTopK(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet("/tmp/judge/q30")

    println("===Q27 PLAN===")
    DedupOps.q27LshPairs(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
