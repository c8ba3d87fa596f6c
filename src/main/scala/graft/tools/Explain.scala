package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints `explain("formatted")` for the named queries
  * (or all) — the "is this the plan you'd want at 100 TB" review loop.
  *
  * Usage: graft.Explain [sfDir] [q01_...,q02_...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.catalyst.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.lift(1) match {
      case Some(qs) => qs.split(",").toSeq.filter(graft.SparkEntry.queries.contains)
      case None => graft.SparkEntry.queries.keys.toSeq.sorted
    }
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
