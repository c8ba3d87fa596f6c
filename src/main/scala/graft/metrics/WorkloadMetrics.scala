package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.RoundMetrics

/** Relational (Spark-side) implementation of the reference's per-round
  * workload metrics (SURVEY §2.4 A3/A4/A5/A6) over the long-format cells
  * schema — the scale path for workload matrices that outgrow the driver.
  *
  * Input contract:
  *   cells(query_id STRING, hint_id INT, runtime DOUBLE)   — dense
  *   observed(query_id STRING, hint_id INT)                — mask rows
  *
  * Plan shape at scale: one shuffle on query_id for the per-query
  * aggregates (min-observed A3 and distinct-runtime sum A4 share it), then
  * a single-pass global aggregate for Σ/percentiles. The percentile buffer
  * is one double per query — 6191 for stack, ~80 MB at 10M queries; beyond
  * that switch the trait to approx_percentile with a documented tolerance.
  */
object WorkloadMetrics {

  /** Per-query min observed runtime (A3): join mask, min per query.
    * 0-valued runtimes count as unobserved (reference 0→∞ sentinel). */
  def minObserved(cells: DataFrame, observed: DataFrame): DataFrame =
    cells.join(observed, Seq("query_id", "hint_id"))
      .filter(col("runtime") =!= 0.0)
      .groupBy("query_id").agg(min("runtime").as("min_observed"))

  /** Hint-group-deduplicated total exec time (A4): one runtime per distinct
    * observed value per query (value-equality groups), then Σ. */
  def execTime(cells: DataFrame, observed: DataFrame): Double =
    cells.join(observed, Seq("query_id", "hint_id"))
      .select("query_id", "runtime").distinct()
      .agg(coalesce(sum("runtime"), lit(0.0))).head().getDouble(0)

  /** Full round metrics from the long-format state (A3+A5+A6). Exact
    * percentiles via Spark SQL `percentile` — same linear interpolation as
    * NumPy (SURVEY A5). */
  def roundMetrics(cells: DataFrame, observed: DataFrame,
                   timeout: Double = 0.0, exploreCnt: Int = 0,
                   trainingTime: Double = 0.0, inferenceTime: Double = 0.0): RoundMetrics = {
    val mo = minObserved(cells, observed)
    // coalesce: sum/percentile over ZERO observed rows return null and
    // getDouble would NPE (empty mask is reachable pre-round-0)
    val row = mo.agg(
      coalesce(sum("min_observed"), lit(0.0)),
      coalesce(percentile(col("min_observed"), lit(0.5)), lit(0.0)),
      coalesce(percentile(col("min_observed"), lit(0.9)), lit(0.0)),
      coalesce(percentile(col("min_observed"), lit(0.95)), lit(0.0)),
      coalesce(percentile(col("min_observed"), lit(0.99)), lit(0.0))).head()
    RoundMetrics(
      trainingTime, inferenceTime,
      execTime(cells, observed) + timeout,
      row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3), row.getDouble(4),
      exploreCnt)
  }

  /** Best predicted hint per query (A7 arg-min) with deterministic lowest-
    * hint-id tie-break, via struct-min (no window, single agg). */
  def argMinPerQuery(pred: DataFrame): DataFrame =
    pred.groupBy("query_id")
      .agg(min(struct(col("pred"), col("hint_id"))).as("m"))
      .select(col("query_id"), col("m.hint_id").as("best_hint"), col("m.pred").as("best_pred"))
}
