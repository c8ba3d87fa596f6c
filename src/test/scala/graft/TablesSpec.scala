package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** The events loader must normalize every plausible driver encoding of
  * `ts` to the same TimestampType values — round 7 was lost to exactly
  * this class of drift (the testdata regenerated from TIMESTAMP(NANOS) to
  * timestamp[us] under the repo). Plain un-annotated int64 columns are
  * disambiguated by magnitude: misreading micros as nanos would be
  * silently wrong by 1000×, which no analysis error would catch.
  */
class TablesSpec extends AnyFunSuite with SharedSpark {

  // 2023-11-14T22:13:20Z — the soak/test epoch anchor
  private val baseS = 1700000000L

  private def writeEvents(dir: String, tsExpr: String): Unit = {
    val sp = spark
    import sp.implicits._
    Seq((1L, baseS, 10L), (2L, baseS + 95L, 20L), (3L, baseS + 7200L, 30L))
      .toDF("event_id", "s", "k")
      .selectExpr("event_id", s"$tsExpr AS ts", "cast(event_id as bigint) AS user_id",
        "'view' AS event_type", "cast(k as double) AS value",
        "concat('{\"k\": ', k, '}') AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("plain int64 ts in nanos, micros, and millis all decode identically") {
    val root = java.nio.file.Files.createTempDirectory("graft-tables").toString
    writeEvents(s"$root/nanos", "s * 1000000000L")
    writeEvents(s"$root/micros", "s * 1000000L")
    writeEvents(s"$root/millis", "s * 1000L")
    val decoded = Seq("nanos", "micros", "millis").map { enc =>
      val df = Tables.events(spark, s"$root/$enc")
      assert(df.schema("ts").dataType == TimestampType, s"$enc type")
      enc -> df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }.toMap
    val expected = Map(1L -> baseS * 1000000L, 2L -> (baseS + 95L) * 1000000L,
      3L -> (baseS + 7200L) * 1000000L)
    decoded.foreach { case (enc, got) => assert(got == expected, s"$enc values") }
  }

  test("driver testdata still decodes to TimestampType with sane epochs") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    val us = df.select(min(unix_micros(col("ts")))).head().getLong(0)
    // any sane testdata epoch lands between 2001 and 2286 in micros
    assert(us > 1000000000L * 1000000L && us < 10000000000L * 1000000L, us)
  }
}
