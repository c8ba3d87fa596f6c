package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Specs for the event-pipeline operators (q34–q38) and the text-pipeline
  * additions (q39/q40). Value-level parity is the driver's DuckDB gate;
  * these pin invariants on sf0.001 so `sbt test` catches regressions.
  */
class EventOpsSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  // shared session: cached gate-query plans leak into other suites'
  // physical plans via CacheManager unless dropped here
  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  test("q34 sessionize: sessions partition events, durations non-negative") {
    val sess = EventOps.q34Sessionize(spark, sf).cache()
    val nEvents = graft.Tables.events(spark, sf).count()
    assert(sess.agg(sum("n_events")).head().getLong(0) == nEvents)
    assert(sess.filter(col("duration_us") < 0).count() == 0)
    // session indices are 1..k contiguous per user
    val bad = sess.groupBy("user_id")
      .agg(max("session_idx").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad == 0)
  }

  test("sessionize operator: gap rule splits exactly at the threshold") {
    import spark.implicits._
    val ts = Seq(0L, 10L, 2000L, 2010L).map(s => new java.sql.Timestamp(s * 1000))
    val df = ts.zipWithIndex
      .map { case (t, i) => (1L, i.toLong, t) }.toDF("user_id", "event_id", "ts")
    val out = EventOps.sessionize(df, gapSeconds = 60)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out(0L) == 1 && out(1L) == 1 && out(2L) == 2 && out(3L) == 2)
  }

  test("q35 asof: every matched purchase precedes its click") {
    val df = EventOps.q35AsofJoin(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("purchase_id").isNotNull && col("lag_us") < 0).count() == 0)
    // click count preserved (left join semantics)
    val clicks = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(df.count() == clicks)
  }

  test("generic asofJoin: latest right row at-or-before each left row") {
    import spark.implicits._
    val right = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 200L))
      .toDF("user_id", "us", "purchase_id")
    val left = Seq((1L, 15L, 1L), (1L, 25L, 2L), (1L, 5L, 3L), (2L, 5L, 4L), (3L, 9L, 5L))
      .toDF("user_id", "us", "click_id")
    val out = EventOps.asofJoin(left, right, "user_id", "us", Seq("purchase_id"))
      .select("click_id", "_r_purchase_id").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      1L -> Some(100L), 2L -> Some(101L),
      3L -> None,          // click precedes every purchase
      4L -> Some(200L),    // equal timestamps are inclusive
      5L -> None))         // user with no purchases at all
  }

  test("generic asofJoin: carried fields all come from the SAME right row") {
    import spark.implicits._
    // latest purchase has a null value — it must stay null, not backfill
    // from the older purchase's non-null value
    val right = Seq((1L, 10L, Some(100L), Some(5.0)), (1L, 20L, Some(101L), None))
      .toDF("user_id", "us", "purchase_id", "pvalue")
    val left = Seq((1L, 25L, 1L)).toDF("user_id", "us", "click_id")
    val row = EventOps.asofJoin(left, right, "user_id", "us", Seq("purchase_id", "pvalue"))
      .select("_r_purchase_id", "_r_pvalue").head()
    assert(row.getLong(0) == 101L)
    assert(row.isNullAt(1), s"pvalue backfilled: $row")
  }

  test("q37 range join: every order lands in exactly one band") {
    val df = EventOps.q37RangeJoin(spark, sf)
    val orders = graft.Tables.orders(spark, sf).count()
    assert(df.agg(sum("n_orders")).head().getLong(0) == orders)
  }

  test("q38 salted agg equals plain groupBy") {
    val salted = EventOps.q38SaltedAgg(spark, sf)
      .select("event_type", "n", "sum_value").cache()
    val plain = graft.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .cast("double").as("sum_value"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("q39 vocab: df <= tf, top list sorted by tf desc") {
    import spark.implicits._
    val rows = TextOps.q39VocabTopK(spark, sf)
      .select("tf", "df").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (tf, df) => df <= tf && df >= 1 })
    assert(rows.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("q40 hash split: deterministic, covers all docs") {
    val df = TextOps.q40HashSplit(spark, sf).cache()
    assert(df.agg(sum("n_docs")).head().getLong(0) == 500)
    val splits = df.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  test("q73 event paths: prefix capped at 10, counts cover all events") {
    val df = EventOps.q73EventPaths(spark, sf).cache()
    val pathLen = size(split(col("path"), ">"))
    assert(df.filter(pathLen > 10).count() == 0)
    // path shorter than 10 only when the user has fewer events than the cap
    assert(df.filter(pathLen < 10 && col("n_events") >= 10).count() == 0)
    assert(df.filter(pathLen =!= least(col("n_events"), lit(10))).count() == 0)
    // totals reconcile with the raw table
    val total = graft.Tables.events(spark, sf).count()
    assert(df.agg(sum("n_events")).head().getLong(0) == total)
  }
}
