package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trajectory reporting — the Spark equivalent of the reference's
  * `draw/draw_<ds>_fig1.ipynb` pipeline (SURVEY §3.3): per-run exploration
  * trajectories → common-grid linear interpolation (F8) → cross-run
  * mean/std/quartiles (A9) → checkpoint table (S5).
  *
  * Reproduces `result/job.csv` from the stored reference traces to ~1e-6
  * (ReportSpec golden). Fully relational: the interpolation is a
  * grid×segment range join, cross-run stats are one groupBy over grid
  * points — scales to arbitrarily many runs/rounds, no driver loops until
  * the final ≤5000-row checkpoint sampling.
  */
object Report {

  /** Load per-round trace JSONs (reference artifact format, one JSON array
    * per run) into (run, round, exec_time, total_latency, ...). */
  def loadTraces(spark: SparkSession, pathGlob: String): DataFrame = {
    val w = Window.partitionBy("run").orderBy("rid")
    spark.read.option("multiLine", "true").json(pathGlob)
      .withColumn("run", input_file_name())
      .withColumn("rid", monotonically_increasing_id())
      .withColumn("round", row_number().over(w) - 1)
      .drop("rid")
  }

  /** Per-run trajectory: x = exploration cost (exec_time − pgTotal),
    * y = total workload latency; plus the cumulative overhead CDF (A8). */
  def trajectories(traces: DataFrame, pgTotal: Double): DataFrame = {
    val w = Window.partitionBy("run").orderBy("round")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    traces.select(
      col("run"), col("round"),
      (col("exec_time") - lit(pgTotal)).as("x"),
      col("total_latency").as("y"),
      sum(col("training_time") + col("inference_time")).over(w).as("overhead_cdf"))
  }

  /** New-query-arrival variant (`draw/draw_newquery.ipynb · cell 2`,
    * `new=True`): exploration cost re-bases at the first round where
    * total_latency INCREASES over the previous round — the moment the new
    * queries joined the workload. Rounds before the jump subtract the old
    * workload's default total, rounds from the jump on subtract the full
    * one. Window `lag` finds the jump; a running max flags everything
    * after it. */
  def trajectoriesWithNewQueries(traces: DataFrame, pgTotalBefore: Double,
                                 pgTotalAfter: Double): DataFrame = {
    val w = Window.partitionBy("run").orderBy("round")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    traces
      .withColumn("jump",
        when(col("round") > 0 &&
          col("total_latency") > lag("total_latency", 1).over(w), 1).otherwise(0))
      .withColumn("met_new", max("jump").over(wCum))
      .select(
        col("run"), col("round"),
        (col("exec_time") -
          when(col("met_new") === 1, lit(pgTotalAfter)).otherwise(lit(pgTotalBefore))).as("x"),
        col("total_latency").as("y"),
        sum(col("training_time") + col("inference_time")).over(wCum).as("overhead_cdf"))
  }

  /** Interpolate every run's (x, y) trajectory onto a shared nGrid-point
    * uniform grid spanning [max of per-run min x, min of per-run max x]
    * (the reference's `combine_plot`), then aggregate across runs:
    * mean, population std, p25/p75. */
  def interpolated(traj: DataFrame, nGrid: Int = 5000): DataFrame = {
    val spark = traj.sparkSession
    val bounds = traj.groupBy("run").agg(min("x").as("lo"), max("x").as("hi"))
      .agg(max("lo").as("start"), min("hi").as("end")).head()
    val (start, end) = (bounds.getDouble(0), bounds.getDouble(1))
    val step = (end - start) / (nGrid - 1)
    val grid = spark.range(0, nGrid)
      .select(col("id").cast("int").as("gi"), (lit(start) + col("id") * lit(step)).as("g"))

    // bracketing segments per run via lead() — [x0, x1] inclusive on both
    // ends; interior grid points exactly on a knot match two segments with
    // the same interpolated value, deduped by avg below
    val w = Window.partitionBy("run").orderBy("round")
    val seg = traj.select(col("run"), col("x").as("x0"), col("y").as("y0"),
        lead("x", 1).over(w).as("x1"), lead("y", 1).over(w).as("y1"))
      .filter(col("x1").isNotNull && col("x1") > col("x0"))
    val perRun = grid.join(seg, col("g") >= col("x0") && col("g") <= col("x1"))
      .select(col("gi"), col("g"), col("run"),
        (col("y0") + (col("y1") - col("y0")) * (col("g") - col("x0")) / (col("x1") - col("x0"))).as("yi"))
      .groupBy("gi", "g", "run").agg(avg("yi").as("yi"))

    perRun.groupBy("gi", "g")
      .agg(avg("yi").as("y_mean"),
           stddev_pop("yi").as("y_std"),
           percentile(col("yi"), lit(0.25)).as("y_p25"),
           percentile(col("yi"), lit(0.75)).as("y_p75"),
           count(lit(1)).as("n_runs"))
      .orderBy("gi")
  }

  /** The reference's `get_y` checkpoint sampler: within the band
    * (bandLo·t, bandHi·t) of grid points, take the middle one. The JOB
    * notebook uses (0.6, 1.4) — the default here; the ceb/dsb/stack
    * notebooks tightened it to (0.99, 1.01) (`draw_<ds>_fig1.ipynb ·
    * get_y`). */
  def sampleCheckpoints(gridStats: DataFrame, checkpoints: Seq[Double],
                        bandLo: Double = 0.6, bandHi: Double = 1.4): Seq[(Double, Double, Double)] = {
    val pts = gridStats.select("g", "y_mean", "y_std").orderBy("gi").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    checkpoints.map { t =>
      val band = pts.filter { case (g, _, _) => g > t * bandLo && g < t * bandHi }
      require(band.nonEmpty, s"no grid points near checkpoint $t")
      val (g, y, sd) = band(band.length / 2)
      (g, y, sd)
    }
  }

  /** Hour-scaled view of a trajectory frame (x and y seconds → hours) —
    * the unit the ceb/dsb/stack notebooks interpolate in. Linear
    * interpolation commutes with the scaling, so sampling in hours matches
    * the notebooks bit-for-bit up to float rounding. */
  def inHours(traj: DataFrame): DataFrame =
    traj.withColumn("x", col("x") / 3600).withColumn("y", col("y") / 3600)

  /** End-to-end: traces glob per strategy → checkpoint CSV in the
    * reference's `result/<ds>.csv` layout. Defaults reproduce the JOB
    * notebook (seconds, (0.6, 1.4) band); pass `hours = true` and
    * `(0.99, 1.01)` for the ceb/dsb/stack notebooks (checkpoints then in
    * hours — see ReportSpec's cross-dataset golden). */
  def checkpointCsv(spark: SparkSession, strategies: Seq[(String, String)],
                    pgTotal: Double, checkpoints: Seq[Double],
                    labels: Seq[String],
                    bandLo: Double = 0.6, bandHi: Double = 1.4,
                    hours: Boolean = false): String = {
    val cols = strategies.map { case (_, glob) =>
      val traj0 = trajectories(loadTraces(spark, glob), pgTotal)
      val traj = if (hours) inHours(traj0) else traj0
      sampleCheckpoints(interpolated(traj), checkpoints, bandLo, bandHi).map(_._2)
    }
    val header = strategies.map(_._1).mkString(",")
    val rows = checkpoints.indices.map { i =>
      labels(i) + "," + cols.map(c => c(i).toString).mkString(",")
    }
    (header +: rows).mkString("\n") + "\n"
  }
}
