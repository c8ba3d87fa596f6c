package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Runtime bloom-filter injection: the optimized plan must carry a
  * `might_contain(bloom_filter_agg(...))` pre-filter on the probe side,
  * and results must be identical with the rewrite on and off.
  */
class RuntimeFiltersSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  private def join() = {
    val l = graft.Tables.lineitem(spark, sf)
    val o = graft.Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  test("selective big-join side injects a bloom pre-filter on the probe side") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a shuffle join (broadcast joins don't need runtime filters)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      RuntimeFilters.enable(spark)
      val withFilter = join()
      val plan = withFilter.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no bloom runtime filter injected:\n$plan")
      val on = withFilter.collect()

      RuntimeFilters.disable(spark)
      val off = join()
      assert(!off.queryExecution.optimizedPlan.toString.contains("might_contain"))
      assert(on.toSeq == off.collect().toSeq, "bloom filter changed results")
    } finally {
      RuntimeFilters.disable(spark)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }
}
