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
  /** events.ts has shipped in two parquet encodings across testdata
    * regenerations: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts via the nanosAsLong legacy flag) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ); a plain un-annotated
    * int64 in nanos/micros/millis is the remaining plausible drift and is
    * disambiguated by magnitude (misreading micros as nanos would be
    * silently wrong by 1000×, not an error). Sniff the decoded type
    * and normalize to TimestampType so every downstream operator sees one
    * stable type regardless of which encoding the driver generated. The
    * session timezone is UTC in every entrypoint, so the NTZ→TZ cast is a
    * value-preserving reinterpretation, matching DuckDB's
    * `CAST(ts AS TIMESTAMP)` in the oracles.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Harmless when no NANOS columns exist; required to even read the old
    // encoding (it surfaces as LongType epoch-nanos instead of a read error).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        // A LongType ts is either TIMESTAMP(NANOS) surfaced by the legacy
        // flag OR a plain int64 with no logical type (a third encoding the
        // driver could plausibly emit — misreading micros as nanos would be
        // silently wrong by 1000×, not an error). Disambiguate by
        // magnitude from ONE row — 2020s epochs are ~1.7e18 ns, ~1.7e15 µs,
        // ~1.7e12 ms, three decades apart, and one encoding covers the
        // whole column. The limit(1) probe reads a single row group.
        // Null-safe probe: a null ts in the sampled row would NPE the
        // loader; filter to a non-null row first (same single-row-group
        // cost). An all-null column defaults to the nanos branch —
        // timestamp_micros(null div 1000) stays null either way.
        // Supported epoch range for the magnitude sniff: |epoch| within
        // ~1979–2065 (3e14 µs / 3e17 ns pivots); driver testdata is 2020s.
        import org.apache.spark.sql.functions.timestamp_millis
        val probe = df.select(col("ts")).where(col("ts").isNotNull).limit(1).collect()
        val v = probe.headOption.map(_.getLong(0).abs).getOrElse(2000000000000000000L)
        if (v > 300000000000000000L) // nanos: `div`, not `/` (float loses
          // precision above 2^53, and epoch-nanos are ~1.7e18)
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else if (v > 300000000000000L) // micros
          df.withColumn("ts", timestamp_micros(col("ts")))
        else // millis
          df.withColumn("ts", timestamp_millis(col("ts")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
