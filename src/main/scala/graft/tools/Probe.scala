package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HashKernels

/** TEMPORARY diagnostic (not part of the library): stage-level timings for
  * the q25 capped self-join superlinearity found in the r7 soak
  * (45.2 s @100k docs -> 396.7 s @200k). Times each stage of the OLD
  * (rank-window + non-equi self-join) shape against a NEW (lead-array
  * window, join-free) shape at both scales to locate the blowup.
  *
  *   graft.tools.Probe <dir1> [dir2 ...]
  */
object Probe {
  private val Cap = 32

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  private def shingled(spark: SparkSession, dir: String): DataFrame = {
    val nPar = spark.sparkContext.defaultParallelism
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(nPar, col("doc_id"))
      .select(col("doc_id"), col("source"), split(trim(col("text")), "\\s+").as("l"))
      .filter(size(col("l")) >= 3)
      .select(col("doc_id"), col("source"), explode(HashKernels.shingles3(col("l"))).as("sh"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.foreach { dir =>
      println(s"== $dir ==")
      val w = Window.partitionBy("source", "sh").orderBy("doc_id")
      val sh = shingled(spark, dir).withColumn("rn", row_number().over(w).cast("long"))

      time("pipeline+window (sum rn)") {
        sh.agg(sum(col("rn"))).collect()
      }

      val joined = sh.as("a").join(sh.as("b"),
        col("a.source") === col("b.source") && col("a.sh") === col("b.sh")
          && col("a.doc_id") < col("b.doc_id")
          && col("b.rn") <= col("a.rn") + lit(Cap.toLong))
      time("OLD capped join (count)") {
        println("    rows=" + joined.count())
      }
      time("OLD join+groupBy pairs (count)") {
        println("    pairs=" + joined
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("n_common")).count())
      }

      val wf = Window.partitionBy("source", "sh").orderBy("doc_id")
      val nbrs = array((1 to Cap).map(j => lead(col("doc_id"), j).over(wf)): _*)
      val led = shingled(spark, dir)
        .withColumn("nbrs", nbrs)
        .select(col("doc_id").as("doc_a"), explode(col("nbrs")).as("doc_b"))
        .filter(col("doc_b").isNotNull)
      time("NEW lead expand (count)") {
        println("    rows=" + led.count())
      }
      time("NEW lead+groupBy pairs (count)") {
        println("    pairs=" + led.groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("n_common")).count())
      }
    }
    spark.stop()
  }
}
