package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All operators take the sf directory as a parameter so the same code runs
  * at sf0.001 (smoke), sf0.01 (DuckDB-oracle correctness) and sf0.1+ (bench).
  * At cluster scale the same `spark.read.parquet` path works unchanged against
  * object-store URIs; partition discovery and filter/column pushdown are
  * handled by the parquet DataSource V2.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read nanos as long and convert to a microsecond timestamp
    * (truncation — matches DuckDB's ns→us cast in the oracle).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // `div` (integer division), not `/` (floating point — loses precision
    // above 2^53, and epoch-nanos are ~1.7e18)
    t(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
