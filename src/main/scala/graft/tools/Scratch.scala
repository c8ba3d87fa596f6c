package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.HashKernels

/** Dev-only micro-profiler for operator pipelines (not part of the driver
  * contract; safe to delete). */
object Scratch {
  def main(args: Array[String]): Unit = {
    // pure-JVM throughput stability probe (no Spark): 32 threads × repeated
    // fixed-size md5 workloads; prints per-round wall time.
    {
      val rounds = 12
      for (r <- 1 to rounds) {
        val t0 = System.nanoTime()
        val threads = (0 until 32).map { _ =>
          val th = new Thread(() => {
            val mdig = java.security.MessageDigest.getInstance("MD5")
            val input = "3:word1 word2 word3".getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var i = 0; var sink = 0
            while (i < 500000) { mdig.reset(); sink += mdig.digest(input)(0); i += 1 }
            if (sink == Int.MinValue) println("")
          })
          th.start(); th
        }
        threads.foreach(_.join())
        System.err.println(f"[probe] round $r: ${(System.nanoTime() - t0) / 1e9}%.2f s (32 threads x 500k md5)")
      }
    }
    if (args.headOption.contains("probe-only")) return
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        System.err.println(f"[stage] id=${si.stageId} name=${si.name.take(60)} tasks=${si.numTasks} " +
          f"runTime=${si.taskMetrics.executorRunTime}ms cpuTime=${si.taskMetrics.executorCpuTime / 1000000}ms " +
          f"deserTime=${si.taskMetrics.executorDeserializeTime}ms gc=${si.taskMetrics.jvmGCTime}ms " +
          f"wall=${si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)}ms")
      }
    })

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val nPar = spark.sparkContext.defaultParallelism
    t("scan+count")(documents(spark, d).count())
    t("repartition+count")(documents(spark, d).repartition(nPar, col("doc_id")).count())
    val toks = documents(spark, d).repartition(nPar, col("doc_id"))
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("l"))
    t("tokens noop")(toks.write.format("noop").mode("overwrite").save())
    val shs = toks.filter(size(col("l")) >= 3).select(col("doc_id"), HashKernels.shingles3(col("l")).as("shs"))
    t("shingles noop")(shs.write.format("noop").mode("overwrite").save())
    val mh = shs.select(col("doc_id"), HashKernels.minhash(16)(col("shs")).as("mh"))
    t("minhash noop")(mh.write.format("noop").mode("overwrite").save())
    t("minhash noop 2nd")(mh.write.format("noop").mode("overwrite").save())
    val sig = shs.select(col("doc_id"), posexplode(HashKernels.minhash(16)(col("shs"))).as(Seq("seed", "minhash")))
    t("posexplode noop")(sig.write.format("noop").mode("overwrite").save())
    t("orderBy noop")(sig.orderBy("doc_id", "seed").write.format("noop").mode("overwrite").save())
    val bands = shs.select(col("doc_id"),
      posexplode(HashKernels.bandKeys(4, 4)(HashKernels.minhash(16)(col("shs")))).as(Seq("band", "band_key")))
      .repartition(nPar, col("band_key"))
    t("bands noop")(bands.write.format("noop").mode("overwrite").save())
    val pairs = bands.as("x").join(bands.as("y"),
      col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key")
        && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
    t("pairs noop")(pairs.write.format("noop").mode("overwrite").save())
    pairs.explain("formatted")
    spark.stop()
  }
}
