package graft.operators

import org.apache.spark.sql.SparkSession

/** Runtime bloom-filter join pruning — the third leg of the join-pruning
  * stool next to static partition pruning (Bucketing's partitioned sink)
  * and broadcast joins: when a big⋈big shuffle join has a selective filter
  * on one side, Catalyst builds a bloom filter of that side's join keys at
  * runtime and injects a `might_contain` pre-filter into the OTHER side's
  * scan, cutting the shuffle volume before it happens. At 100 TB this is
  * the difference between shuffling the full fact table and shuffling only
  * the ~matching fraction.
  *
  * Spark gates the rewrite behind size thresholds tuned for clusters (the
  * probe side must scan ≥ 10 GB by default), so small local runs never see
  * it; [[enable]] sets the thresholds explicitly. RuntimeFiltersSpec
  * asserts both the plan rewrite (`might_contain` over a bloom aggregate
  * of the filtered side) and result equality with the filter off.
  */
object RuntimeFilters {

  /** Turn on bloom-filter injection with explicit thresholds.
    * `appSideScanBytes` = minimum bytes the probe side must scan (0 to
    * always inject); `creationSideBytes` = maximum estimated size of the
    * filtered build side. */
  def enable(spark: SparkSession, appSideScanBytes: Long = 0L,
             creationSideBytes: String = "100MB"): Unit = {
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      appSideScanBytes.toString)
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      creationSideBytes)
  }

  def disable(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
}
