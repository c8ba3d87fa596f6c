package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Property-based parity for the two-level sessionizer: for ANY event set
  * — random users, timestamps clustered tightly around bucket edges,
  * exact timestamp ties (ordering then falls to event_id), gaps at/around
  * the threshold — `sessionizeScalable` must equal the sequential gap
  * rule row for row, across several bucket widths including degenerate
  * ones. (Raw scalacheck Gen sampling, same pattern as PackingPropSpec:
  * the scalatestplus bridge isn't in the offline dependency cache.)
  *
  * The generator is adversarial by construction: timestamps are drawn as
  * small multiples of the gap and bucket widths plus {-1, 0, +1} jitter,
  * so a large fraction of inter-event deltas land EXACTLY on the
  * session-gap threshold and of events EXACTLY on bucket boundaries —
  * the two places the boundary-merge arithmetic could be off by one.
  */
class SessionizePropSpec extends AnyFunSuite with SharedSpark {

  private val gapS = 60L // session gap: 60 s

  private val corpora: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      user <- Gen.frequency(4 -> Gen.const(0L), 2 -> Gen.choose(1L, 3L))
      // seconds on a lattice of gap/bucket multiples with ±1 jitter
      k <- Gen.choose(0L, 40L)
      jit <- Gen.oneOf(-1L, 0L, 1L)
    } yield (user, math.max(0L, k * gapS + jit)))
  } yield rows.zipWithIndex.map { case ((u, s), i) => (i.toLong, u, s) }

  private def draw[A](g: Gen[A], k: Int): A =
    g.apply(Gen.Parameters.default, Seed(k.toLong))
      .getOrElse(fail(s"generator produced no value for seed $k"))

  test("segmented as-of (q91) == classic as-of (q35) on random tie-heavy corpora") {
    val sp = spark
    import sp.implicits._
    // purchases and clicks on the SAME second lattice, so exact
    // click-ts == purchase-ts ties (the inclusive-<= pick) and
    // bucket-edge purchases are frequent
    val gen: Gen[Seq[(Long, Long, String, Long)]] = for {
      n <- Gen.choose(4, 80)
      rows <- Gen.listOfN(n, for {
        user <- Gen.frequency(3 -> Gen.const(0L), 2 -> Gen.choose(1L, 2L))
        typ <- Gen.frequency(3 -> Gen.const("click"), 1 -> Gen.const("purchase"),
          1 -> Gen.const("view"))
        k <- Gen.choose(0L, 30L)
        jit <- Gen.oneOf(-1L, 0L, 1L)
      } yield (user, typ, math.max(0L, k * 21600L + jit)))
    } yield rows.zipWithIndex.map { case ((u, ty, s), i) => (i.toLong, u, ty, s) }
    (1 to 6).foreach { k =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-asof-$k").toString
      draw(gen, k).toDF("event_id", "user_id", "event_type", "s")
        .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
          col("user_id"), col("event_type"),
          (col("event_id") % 7).cast("double").as("value"),
          lit("{\"k\": 1}").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val a = EventOps.q35AsofJoin(spark, dir)
      val b = EventOps.q91AsofScaled(spark, dir)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0, s"seed $k")
    }
  }

  test("sessionizeScalable == sessionize on adversarial random corpora") {
    val sp = spark
    import sp.implicits._
    val buckets = Seq(1L, 59L, 60L, 61L, 3600L) // incl. degenerate + = gap
    (1 to 10).foreach { k =>
      val ev = draw(corpora, k).toDF("event_id", "user_id", "s")
        .select(col("event_id"), col("user_id"),
          timestamp_seconds(col("s")).as("ts"), lit(1.0).as("value"))
      val base = EventOps.sessionize(ev, gapS)
        .select("event_id", "user_id", "session_idx")
      buckets.foreach { b =>
        val two = EventOps.sessionizeScalable(ev, gapS, b)
          .select("event_id", "user_id", "session_idx")
        assert(base.exceptAll(two).count() == 0 && two.exceptAll(base).count() == 0,
          s"seed $k bucket $b")
      }
    }
  }
}
