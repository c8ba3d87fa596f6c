package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.HashKernels

/** Dev-only minimal repro: identical noop saves slowing down. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[scratch2] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val nPar = spark.sparkContext.defaultParallelism
    val mh = documents(spark, d).repartition(nPar, col("doc_id"))
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("l"))
      .filter(size(col("l")) >= 3)
      .select(col("doc_id"), HashKernels.shingles3(col("l")).as("shs"))
      .select(col("doc_id"), HashKernels.minhash(16)(col("shs")).as("mh"))
    if (args.headOption.contains("loop")) {
      (1 to 60).foreach(i => t(s"minhash noop run$i")(mh.write.format("noop").mode("overwrite").save()))
      spark.stop(); return
    }
    val control = documents(spark, d).repartition(nPar, col("doc_id"))
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("l"))
      .filter(size(col("l")) >= 3)
      .select(col("doc_id"), md5(concat_ws(" ", col("l"))).as("h"))
    (1 to 4).foreach(i => t(s"control(no-udf) run$i")(control.write.format("noop").mode("overwrite").save()))
    (1 to 6).foreach(i => t(s"minhash noop run$i")(mh.write.format("noop").mode("overwrite").save()))
    (1 to 4).foreach(i => t(s"control(no-udf) after-udf run$i")(control.write.format("noop").mode("overwrite").save()))
    spark.stop()
  }
}
