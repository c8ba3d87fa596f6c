package graft.strategy

import java.nio.file.Path
import scala.util.Random
import graft.core.{RoundMetrics, RoundState, WorkloadMatrix}
import graft.model.{PlanSample, TCNN}
import graft.plans.{PlanFeaturizer, PlanRecord}

/** LimeQO+ (`src/strategies/limeqo_plus.py:10-148`): the learned variant —
  * a Tree-CNN over PostgreSQL EXPLAIN plans plus row/column embeddings
  * replaces the ALS completion; selection/timeout bookkeeping matches
  * LimeQO; stop condition is 95 % of the perfect improvement
  * (`limeqo_plus.py:41-44`); budget default 32 (`run_experiment.py:61-63`).
  *
  * Parity is statistical by nature (torch RNG streams are not
  * reproducible here — SURVEY §5.4). Two deliberate semantic deviations
  * from the reference code, both documented:
  *  - the censoring threshold fed to the loss is transformed into label
  *    space (log1p + min-max) so the `pred >= censor` comparison is
  *    scale-consistent; the reference compares a scaled prediction against
  *    raw seconds (`limeqo_plus.py:212-216`), which effectively disables
  *    censoring for sub-second cells.
  *  - the MSE is per-element; the reference inherits torch's (B,1)-vs-(B)
  *    broadcast, which averages over B² pairs.
  */
final class LimeQOPlusStrategy(
    plans: Seq[PlanRecord],
    featurizer: PlanFeaturizer,
    filenameToRow: Map[String, Int],
    rank: Int = 5, alpha: Double = 1.0, beta: Double = 15.0,
    newObserveSize: Int = 32, maxEpochs: Int = 200, seed: Long = 42,
    maxRounds: Int = Int.MaxValue) extends Strategy {

  val name = "limeqo_plus"

  /** Resumable like the core strategies, with one addition: the TCNN is
    * cross-round state (weights, Adam moments, dropout RNG), so the
    * per-round [[RunSnapshot]] carries the whole Java-serialized model in
    * its `extra` map alongside the exploration matrices and the strategy
    * RNG — a resumed run continues training the SAME model mid-stream,
    * bit-identically (LimeQOPlusSpec kill/resume test). */
  def run(w: WorkloadMatrix, init: Option[Array[Array[Boolean]]],
          tracePath: Option[Path], snapshotPath: Option[Path]): Vector[RoundMetrics] = {
    val resumed = Loop.resumable(snapshotPath, name, seed)
    val rng = resumed.flatMap(_.rng).map(RunSnapshot.rngFrom)
      .getOrElse(new Random(seed))
    val st = new RoundState(w)
    resumed match {
      case Some(s) => s.restore(st)
      case None =>
        val initMask = init.getOrElse(Array.tabulate(w.nRows, w.nCols)((_, j) => j == 0))
        var i = 0
        while (i < w.nRows) {
          var j = 0
          while (j < w.nCols) { if (initMask(i)(j)) st.mask(i)(j) = true; j += 1 }
          i += 1
        }
    }

    // featurize the corpus once (driver-resident; the Spark path for a
    // corpus that outgrows the driver is PlanFeaturizer.featuresDF +
    // broadcast-weight scoring via mapPartitions)
    val corpus: IndexedSeq[PlanSample] = plans.flatMap { p =>
      filenameToRow.get(p.filename).map { row =>
        PlanSample(
          feats = featurizer.transformFeatures(p.tree),
          idxes = featurizer.indexes(p.tree),
          row = row,
          cols = p.hintList.toArray,
          label = featurizer.transformLabel(p.runtimeList))
      }
    }.toIndexedSeq

    // fresh run: the model seed is the strategy RNG's next draw (so the
    // stream stays aligned across resume); resumed run: deserialize the
    // persisted model instead of drawing — the restored RNG is already
    // past that draw
    // tolerant read: a snapshot missing the model blob (older format)
    // falls back to a fresh model rather than crashing the resume
    val tcnn = resumed.flatMap(_.extra.get("tcnn")).map(RunSnapshot.unblob[TCNN])
      .getOrElse(new TCNN(featurizer.numFeatures, rank, w.nRows, w.nCols, rng.nextLong()))
    val results = scala.collection.mutable.ArrayBuffer.empty[RoundMetrics]
    resumed.foreach(results ++= _.results)

    var minObs = resumed.map(_.minObs).getOrElse(st.minObserved)
    val perfect = resumed.flatMap(_.extra.get("perfect")).map(_.toDouble)
      .getOrElse(minObs.sum - w.optTime)
    var round = resumed.map(_.round).getOrElse(0)
    def snap(done: Boolean): Unit = Loop.snap(snapshotPath,
      RunSnapshot.capture(name, seed, st, round, minObs, results.toSeq,
        rng = Some(rng),
        extra = Map("tcnn" -> RunSnapshot.blob(tcnn), "perfect" -> perfect.toString),
        done = done))
    while (minObs.sum - w.optTime > perfect * 0.05 && round < maxRounds) {
      minObs = st.minObserved

      val (trainS, testS) = corpus.partition(s => st.mask(s.row)(s.cols(0)))
      // censoring threshold in label space (see class doc)
      val censors = trainS.map { s =>
        val c = st.timeoutM(s.row)(s.cols(0))
        if (c == 0.0) 0.0 else featurizer.transformLabel(Seq(c))
      }

      val t0 = System.nanoTime()
      tcnn.train(trainS, censors, batchSize = 32, maxEpochs = maxEpochs,
        shuffleSeed = rng.nextLong())
      val trainingTime = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      // predict test cells, inverse latency transform, scatter over the
      // plan's whole hint group (`limeqo_plus.py:236-261`)
      val predM = Array.fill(w.nRows, w.nCols)(0.0)
      testS.foreach { s =>
        val p = featurizer.inverseLabel(tcnn.predict(s))
        s.cols.foreach(c => predM(s.row)(c) = p)
      }
      val inferenceTime = (System.nanoTime() - t1) / 1e9

      Loop.emit(results, st.metrics(trainingTime, inferenceTime), tracePath)

      // keep only unobserved predictions; 0 ⇒ ∞ sentinel (`:92-93`)
      val pred = Array.tabulate(w.nRows, w.nCols) { (r, c) =>
        val v = if (st.mask(r)(c)) 0.0 else predM(r)(c)
        if (v == 0.0) Double.PositiveInfinity else v
      }
      val select = Array.tabulate(w.nRows) { r =>
        var best = 0; var c = 1
        while (c < w.nCols) { if (pred(r)(c) < pred(r)(best)) best = c; c += 1 }
        best
      }
      val improve = Array.tabulate(w.nRows) { r =>
        val m = pred(r)(select(r))
        (minObs(r) - m) / m
      }
      val order = (0 until w.nRows).sortBy(r => (-improve(r), r))

      var cnt = 0
      val it = order.iterator
      while (it.hasNext && cnt < newObserveSize) {
        val row = it.next()
        val hint = select(row)
        val p = pred(row)(hint)
        val tolerance = math.min(alpha * minObs(row), beta * p)
        val skip = p.isInfinite || st.explored(row)(hint) || p >= tolerance
        if (!skip) {
          if (w.values(row)(hint) >= minObs(row)) st.markExplored(row, hint)
          if (w.values(row)(hint) >= tolerance) {
            st.markTimeout(row, hint, tolerance)
            st.timeout += tolerance
          } else {
            st.observe(row, hint)
            st.markExplored(row, hint)
            cnt += 1
            st.exploreQueries += row
          }
        }
      }

      // random top-up (`limeqo_plus.py:127-148`)
      var done = false
      while (cnt < newObserveSize && !done) {
        val mo = st.minObserved
        if (mo.sum <= w.optTime + 50) done = true
        else {
          val row = rng.nextInt(w.nRows)
          val col = rng.nextInt(w.nCols)
          if (!st.mask(row)(col) && !st.explored(row)(col)) {
            if (w.values(row)(col) >= mo(row)) {
              st.timeout += mo(row)
              st.markExplored(row, col)
              st.markTimeout(row, col, mo(row))
            } else {
              st.markExplored(row, col)
              st.observe(row, col)
              cnt += 1
              st.exploreQueries += row
            }
          }
        }
      }

      minObs = st.minObserved
      round += 1
      snap(done = false)
    }
    if (minObs.sum - w.optTime <= perfect * 0.05) snap(done = true)
    results.toVector
  }
}
