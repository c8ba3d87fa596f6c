package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** q41 is rows-only at the driver gate (sketch internals are engine-
  * specific) — this spec supplies the missing value-level check by bounding
  * the sketches against their exact counterparts on the same input:
  * HLL++ at rsd=0.02 must land within 10 % of the true distinct count
  * (5 σ), and the approximate median must sit between the exact p25 and
  * p75 of its group. */
class ApproxStatsSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  test("q41 sketches bounded by exact counterparts per group") {
    val approx = Relational.q41ApproxStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("orders"),
        percentile(col("l_extendedprice"),
          array(lit(0.25), lit(0.75))).as("ps"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Double](2).head, r.getSeq[Double](2).last)).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, (aOrders, aP50)) <- approx) {
      val (eOrders, p25, p75) = exact(flag)
      assert(math.abs(aOrders - eOrders) <= eOrders * 0.10,
        s"$flag: HLL $aOrders vs exact $eOrders")
      assert(aP50 >= p25 && aP50 <= p75,
        s"$flag: approx p50 $aP50 outside exact [$p25, $p75]")
    }
  }
}
