package graft.strategy

import java.nio.file.{Files, Paths, Path}
import scala.util.Random
import breeze.linalg.DenseMatrix
import graft.core.{RoundMetrics, RoundState, WorkloadMatrix}
import graft.linalg.CensoredALS

/** The six reference strategy programs (SURVEY §2.13), driver loops over the
  * dense [[WorkloadMatrix]] (≤2.4 MB — SURVEY §1.3 collect boundary).
  * Semantics per the reference's `src/strategies/` modules, including the
  * timeout/explored/hint-group bookkeeping that the trace goldens depend on.
  */
trait Strategy {
  def name: String
  /** Run to completion, optionally rewriting the JSON trace each round
    * (artifact parity with the reference: whole-file rewrite, S4). */
  def run(w: WorkloadMatrix, init: Option[Array[Array[Boolean]]],
          tracePath: Option[Path]): Vector[RoundMetrics] =
    run(w, init, tracePath, None)

  /** As above, plus per-round state persistence: with `snapshotPath` set
    * the strategy writes a [[RunSnapshot]] after every round (atomic
    * replace) and, when the file already holds an unfinished run of the
    * SAME strategy (and seed), resumes from it bit-identically
    * (ResumeSpec). [[LimeQOPlusStrategy]] additionally persists its TCNN
    * (weights + Adam moments + dropout RNG) as a serialized blob in the
    * snapshot's `extra` map, so even the learned strategy resumes
    * mid-training-stream. */
  def run(w: WorkloadMatrix, init: Option[Array[Array[Boolean]]],
          tracePath: Option[Path], snapshotPath: Option[Path]): Vector[RoundMetrics]
}

object Trace {
  def write(path: Path, results: Seq[RoundMetrics]): Unit = {
    val body = results.map(_.toJson.linesIterator.map("    " + _).mkString("\n"))
      .mkString("[\n", ",\n", "\n]")
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.writeString(path, body)
  }
}

private object Loop {
  def emit(results: scala.collection.mutable.ArrayBuffer[RoundMetrics],
           m: RoundMetrics, tracePath: Option[Path]): Unit = {
    results += m
    tracePath.foreach(p => Trace.write(p, results.toSeq))
  }

  /** The snapshot to resume from, if one exists and belongs to an
    * UNFINISHED run of the same strategy (a done snapshot means the trace
    * is complete — callers that want skip-if-done check at their level;
    * run() itself restarts fresh and overwrites). */
  def resumable(snapshotPath: Option[Path], strategy: String,
                seed: Long = 0L): Option[RunSnapshot] =
    snapshotPath.flatMap(RunSnapshot.load)
      .filter(s => s.strategy == strategy && s.seed == seed && !s.done)

  def snap(snapshotPath: Option[Path], s: => RunSnapshot): Unit =
    snapshotPath.foreach(p => s.save(p))
}

/** Oracle: knows the true matrix; explores each query's true argmin in
  * descending-true-gain order, stopping at the first zero-gain row
  * (`oracle.py:9-59`). Deterministic — the primary e2e golden (SURVEY §5.3).
  */
final class OracleStrategy(maxRounds: Int = Int.MaxValue) extends Strategy {
  val name = "oracle"
  def run(w: WorkloadMatrix, init: Option[Array[Array[Boolean]]],
          tracePath: Option[Path], snapshotPath: Option[Path]): Vector[RoundMetrics] = {
    val resumed = Loop.resumable(snapshotPath, name)
    val st = new RoundState(w)
    resumed match {
      case Some(s) => s.restore(st)
      case None =>
        var i = 0
        while (i < w.nRows) { st.observe(i, 0); i += 1 }
    }

    // gain/order are pure functions of w (min-observed over the col-0-only
    // mask), so a resumed run re-derives them identically to the original
    val argmin = w.rowArgMin
    val rowMin = w.rowMin
    val mo0 = {
      val init0 = new RoundState(w)
      var i = 0
      while (i < w.nRows) { init0.observe(i, 0); i += 1 }
      init0.minObserved
    }
    val gain = Array.tabulate(w.nRows)(r => mo0(r) - rowMin(r))
    // np.argsort(-gain): descending; stable (ties keep row order) — gains
    // tie only at 0 where the loop breaks anyway
    val order = (0 until w.nRows).sortBy(r => (-gain(r), r))

    val results = scala.collection.mutable.ArrayBuffer.empty[RoundMetrics]
    resumed.foreach(results ++= _.results)
    // iterator position = rounds emitted so far (one pick per emit)
    // tolerant read (mirrors Loop.resumable): a snapshot from an older
    // format missing the key restarts the loop-local flag fresh instead
    // of crashing the run with NoSuchElementException
    var pos = resumed.flatMap(_.extra.get("pos")).map(_.toInt).getOrElse(0)
    var stop = false
    while (pos < order.length && !stop && results.length < maxRounds) {
      val row = order(pos)
      if (gain(row) == 0.0) stop = true
      else {
        Loop.emit(results, st.metrics(), tracePath)
        val col = argmin(row)
        if (!st.mask(row)(col)) {
          st.observe(row, col)
          st.exploreQueries += row
        }
        pos += 1
        Loop.snap(snapshotPath, RunSnapshot.capture(name, 0L, st, pos,
          Array.empty, results.toSeq, extra = Map("pos" -> pos.toString)))
      }
    }
    if (stop || pos >= order.length)
      Loop.snap(snapshotPath, RunSnapshot.capture(name, 0L, st, pos,
        Array.empty, results.toSeq, extra = Map("pos" -> pos.toString), done = true))
    results.toVector
  }
}

/** QO-Advisor: worst queries by current min-observed; first unexplored hint
  * in column order; timeout bookkeeping with tolerance = min_observed
  * (`qo_advisor.py:12-78`). Deterministic. */
final class QOAdvisorStrategy(newObserveSize: Int = 8,
    maxRounds: Int = Int.MaxValue) extends Strategy {
  val name = "qo_advisor"
  def run(w: WorkloadMatrix, init: Option[Array[Array[Boolean]]],
          tracePath: Option[Path], snapshotPath: Option[Path]): Vector[RoundMetrics] = {
    val resumed = Loop.resumable(snapshotPath, name)
    val st = new RoundState(w)
    resumed match {
      case Some(s) => s.restore(st)
      case None =>
        var i = 0
        while (i < w.nRows) { st.observe(i, 0); i += 1 }
    }
    val results = scala.collection.mutable.ArrayBuffer.empty[RoundMetrics]
    resumed.foreach(results ++= _.results)

    // reference loop shape (`qo_advisor.py`): the while condition tests the
    // min-observed computed at the TOP of the previous body — i.e. the
    // PRE-pick value — so after the picks cross the threshold one more
    // round still runs, emitting the converged record. A resumed run
    // restores that stale vector from the snapshot for the same reason.
    var minObs = resumed.map(_.minObs).getOrElse(st.minObserved)
    var round = resumed.map(_.round).getOrElse(0)
    while (minObs.sum > w.optTime + 20 && round < maxRounds) {
      minObs = st.minObserved
      Loop.emit(results, st.metrics(), tracePath)
      val order = (0 until w.nRows).sortBy(r => (-minObs(r), r))
      var cnt = 0
      val it = order.iterator
      while (it.hasNext && cnt < newObserveSize) {
        val row = it.next()
        var hint = 0
        var done = false
        while (hint < w.nCols && !done) {
          if (!st.mask(row)(hint) && !st.explored(row)(hint)) {
            if (w.values(row)(hint) >= minObs(row)) {
              st.timeout += minObs(row)
              st.markExplored(row, hint)
              st.markTimeout(row, hint, minObs(row))
              // continue scanning further hints for this row
            } else {
              st.observe(row, hint)
              st.markExplored(row, hint)
              cnt += 1
              st.exploreQueries += row
              done = true
            }
          }
          hint += 1
        }
      }
      round += 1
      Loop.snap(snapshotPath,
        RunSnapshot.capture(name, 0L, st, round, minObs, results.toSeq))
    }
    if (minObs.sum <= w.optTime + 20)
      Loop.snap(snapshotPath,
        RunSnapshot.capture(name, 0L, st, round, minObs, results.toSeq, done = true))
    results.toVector
  }
}

/** Random: uniform unobserved (row, col) picks with the min-observed
  * timeout rule (`random.py:12-67`). Seeded.
  *
  * Stop condition: by default the code's `Σ min_observed ≤ opt + 20`
  * (`random.py:32`); with `budgetSeconds` set, the exploration-time budget
  * the STORED experiment traces were generated with — they keep exploring
  * well below opt+20 (e.g. JOB random runs end at total 70.0 with opt+20 =
  * 88.1) and all end near x ≈ 720–800 s, the budget signature. */
final class RandomStrategy(newObserveSize: Int = 8, seed: Long = 42,
    maxRounds: Int = Int.MaxValue, budgetSeconds: Option[Double] = None) extends Strategy {
  val name = "random"
  def run(w: WorkloadMatrix, init: Option[Array[Array[Boolean]]],
          tracePath: Option[Path], snapshotPath: Option[Path]): Vector[RoundMetrics] = {
    val resumed = Loop.resumable(snapshotPath, name, seed)
    val rng = resumed.flatMap(_.rng).map(RunSnapshot.rngFrom)
      .getOrElse(new Random(seed))
    val st = new RoundState(w)
    resumed match {
      case Some(s) => s.restore(st)
      case None =>
        var i = 0
        while (i < w.nRows) { st.observe(i, 0); i += 1 }
    }
    val results = scala.collection.mutable.ArrayBuffer.empty[RoundMetrics]
    resumed.foreach(results ++= _.results)

    def anyAvailable: Boolean = {
      var r = 0
      while (r < w.nRows) {
        var c = 0
        while (c < w.nCols) {
          if (!st.mask(r)(c) && st.timeoutM(r)(c) == 0.0) return true
          c += 1
        }
        r += 1
      }
      false
    }

    // while condition tests the PRE-pick value from the previous body top
    // (`random.py:32-35`) — one extra converged round, as the reference;
    // a resumed run restores the stale vector (and loop flags) verbatim
    var minObs = resumed.map(_.minObs).getOrElse(st.minObserved)
    var round = resumed.map(_.round).getOrElse(0)
    def keepGoing: Boolean = budgetSeconds match {
      case Some(b) => st.execTime + st.timeout - w.defaultTime < b
      case None => minObs.sum > w.optTime + 20
    }
    // tolerant read: missing key (older snapshot format) = fresh default
    var exhausted = resumed.flatMap(_.extra.get("exhausted")).exists(_.toBoolean)
    while (keepGoing && round < maxRounds && !exhausted) {
      minObs = st.minObserved
      Loop.emit(results, st.metrics(), tracePath)
      var cnt = 0
      // reference quirk: `while cnt <= size` observes size+1 per round
      // (`random.py:55`) — preserved for envelope parity. The availability
      // check (not in the reference) keeps a budget-stopped run from
      // spinning forever once every cell is observed or timed out; it is
      // a full-matrix scan, so it only runs after a long streak of missed
      // random picks (misses reset on any hit) instead of per draw.
      var misses = 0
      def stillPickable: Boolean =
        misses <= 4 * w.nRows * w.nCols || { misses = 0; anyAvailable }
      while (cnt <= newObserveSize && stillPickable) {
        val row = rng.nextInt(w.nRows)
        val col = rng.nextInt(w.nCols)
        if (!st.mask(row)(col) && st.timeoutM(row)(col) == 0.0) {
          misses = 0
          // reference compares against the round-top min_observed, not a
          // per-pick recompute (`random.py:60`)
          if (w.values(row)(col) >= minObs(row)) {
            st.timeout += minObs(row)
            st.markTimeout(row, col, 1.0)
          } else {
            st.observe(row, col)
            cnt += 1
            st.exploreQueries += row
          }
        } else misses += 1
      }
      exhausted = cnt <= newObserveSize // only anyAvailable can break early
      round += 1
      Loop.snap(snapshotPath, RunSnapshot.capture(name, seed, st, round, minObs,
        results.toSeq, rng = Some(rng), extra = Map("exhausted" -> exhausted.toString)))
    }
    if (!keepGoing || exhausted)
      Loop.snap(snapshotPath, RunSnapshot.capture(name, seed, st, round, minObs,
        results.toSeq, rng = Some(rng),
        extra = Map("exhausted" -> exhausted.toString), done = true))
    results.toVector
  }
}

/** Greedy: worst queries by min-observed, random unexplored hint within the
  * row, timeout rule as Random (`greedy.py:12-82`). Seeded.
  *
  * Stop condition: default `Σ min_observed ≤ opt + 20`; `budgetSeconds`
  * selects the exploration-budget variant the stored traces used (see
  * [[RandomStrategy]]). */
final class GreedyStrategy(newObserveSize: Int = 8, seed: Long = 42,
    maxRounds: Int = Int.MaxValue, budgetSeconds: Option[Double] = None) extends Strategy {
  val name = "greedy"
  def run(w: WorkloadMatrix, init: Option[Array[Array[Boolean]]],
          tracePath: Option[Path], snapshotPath: Option[Path]): Vector[RoundMetrics] = {
    val resumed = Loop.resumable(snapshotPath, name, seed)
    val rng = resumed.flatMap(_.rng).map(RunSnapshot.rngFrom)
      .getOrElse(new Random(seed))
    val st = new RoundState(w)
    resumed match {
      case Some(s) => s.restore(st)
      case None =>
        var i = 0
        while (i < w.nRows) { st.observe(i, 0); i += 1 }
    }
    val results = scala.collection.mutable.ArrayBuffer.empty[RoundMetrics]
    resumed.foreach(results ++= _.results)

    def maskCount(r: Int): Int = st.mask(r).count(identity)
    def timeoutCount(r: Int): Int = st.timeoutM(r).count(_ != 0.0)

    // while condition tests the PRE-pick value from the previous body top
    // (`greedy.py`) — one extra converged round, as the reference
    var minObs = resumed.map(_.minObs).getOrElse(st.minObserved)
    var round = resumed.map(_.round).getOrElse(0)
    def keepGoing: Boolean = budgetSeconds match {
      case Some(b) => st.execTime + st.timeout - w.defaultTime < b
      case None => minObs.sum > w.optTime + 20
    }
    // false once a full pass picks nothing: exhausted
    // tolerant read: missing key (older snapshot format) = fresh default
    var progressed = resumed.flatMap(_.extra.get("progressed")).forall(_.toBoolean)
    while (keepGoing && round < maxRounds && progressed) {
      minObs = st.minObserved
      Loop.emit(results, st.metrics(), tracePath)
      val timeoutBefore = st.timeout
      var cnt = 0
      val order = (0 until w.nRows).sortBy(r => (-minObs(r), r))
      val it = order.iterator
      while (it.hasNext && cnt < newObserveSize) {
        val row = it.next()
        if (maskCount(row) != w.nCols) {
          var break = false
          while (!break) {
            val col = rng.nextInt(w.nCols)
            if (maskCount(row) + timeoutCount(row) == w.nCols) break = true
            else if (!st.mask(row)(col) && st.timeoutM(row)(col) == 0.0) {
              if (w.values(row)(col) >= minObs(row)) {
                st.markTimeout(row, col, 1.0)
                st.timeout += minObs(row)
                break = true
              } else {
                st.observe(row, col)
                cnt += 1
                st.exploreQueries += row
                break = true
              }
            }
          }
        }
      }
      progressed = cnt > 0 || st.timeout != timeoutBefore
      round += 1
      Loop.snap(snapshotPath, RunSnapshot.capture(name, seed, st, round, minObs,
        results.toSeq, rng = Some(rng), extra = Map("progressed" -> progressed.toString)))
    }
    if (!keepGoing || !progressed)
      Loop.snap(snapshotPath, RunSnapshot.capture(name, seed, st, round, minObs,
        results.toSeq, rng = Some(rng),
        extra = Map("progressed" -> progressed.toString), done = true))
    results.toVector
  }
}

/** LimeQO: censored ALS completion in log1p space, improvement-ratio
  * selection with α/β timeout tolerance, random top-up to the budget
  * (`limeqo.py:18-123`). Seeded; envelope-parity (SURVEY §5.3).
  *
  * Stop condition: by default the current code's `Σ min_observed ≤
  * opt + 20` (`limeqo.py:35`); with `budgetSeconds` set, the demo
  * notebook's exploration-time budget instead (`limeqo.ipynb · cell 7` —
  * the variant the stored experiment traces were generated with, which
  * run far past the +20 rule). */
final class LimeQOStrategy(
    rank: Int = 5, lambda: Double = 0.2, alpha: Double = 1.0, beta: Double = 15.0,
    newObserveSize: Int = 8, alsIters: Int = 50, seed: Long = 42,
    maxRounds: Int = Int.MaxValue, budgetSeconds: Option[Double] = None,
    // false = the reference's `wocensored_*` ablation: plain ALS ignores
    // the timeout cutoffs (all-zero cutoff matrix fed to the kernel)
    censored: Boolean = true,
    // pluggable completion kernel: default driver-local Breeze; pass
    // (r, i, l, s) => new DistributedCensoredALS(spark, r, i, l, s) for
    // workload matrices that outgrow the driver
    alsFactory: (Int, Int, Double, Long) => graft.linalg.MatrixCompletion =
      new CensoredALS(_, _, _, _)) extends Strategy {
  val name = "limeqo"

  def run(w: WorkloadMatrix, init: Option[Array[Array[Boolean]]],
          tracePath: Option[Path], snapshotPath: Option[Path]): Vector[RoundMetrics] = {
    val resumed = Loop.resumable(snapshotPath, name, seed)
    val rng = resumed.flatMap(_.rng).map(RunSnapshot.rngFrom)
      .getOrElse(new Random(seed))
    val st = new RoundState(w)
    resumed match {
      case Some(s) => s.restore(st)
      case None =>
        val initMask = init.getOrElse(
          Array.tabulate(w.nRows, w.nCols)((_, j) => j == 0))
        var i = 0
        while (i < w.nRows) {
          var j = 0
          while (j < w.nCols) {
            if (initMask(i)(j)) { st.mask(i)(j) = true; st.explored(i)(j) = true }
            j += 1
          }
          i += 1
        }
    }
    val results = scala.collection.mutable.ArrayBuffer.empty[RoundMetrics]
    resumed.foreach(results ++= _.results)

    var minObs = resumed.map(_.minObs).getOrElse(st.minObserved)
    var round = resumed.map(_.round).getOrElse(0)
    def keepGoing: Boolean = budgetSeconds match {
      case Some(b) => st.execTime + st.timeout - w.defaultTime < b
      case None => minObs.sum > w.optTime + 20
    }
    while (keepGoing && round < maxRounds) {
      minObs = st.minObserved

      // ALS in log space over the masked matrix
      val logM = DenseMatrix.tabulate(w.nRows, w.nCols)((r, c) =>
        if (st.mask(r)(c)) math.log1p(w.values(r)(c)) else 0.0)
      val maskM = DenseMatrix.tabulate(w.nRows, w.nCols)((r, c) =>
        if (st.mask(r)(c)) 1.0 else 0.0)
      val logCut =
        if (censored)
          DenseMatrix.tabulate(w.nRows, w.nCols)((r, c) => math.log1p(st.timeoutM(r)(c)))
        else DenseMatrix.zeros[Double](w.nRows, w.nCols)

      val t0 = System.nanoTime()
      val als = alsFactory(rank, alsIters, lambda, rng.nextLong())
      val completedLog = als.complete(logM, maskM, logCut)
      val trainingTime = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      // expm1 back; keep only unobserved predictions (0 ⇒ ∞ sentinel)
      val pred = Array.tabulate(w.nRows, w.nCols) { (r, c) =>
        if (st.mask(r)(c)) Double.PositiveInfinity
        else {
          val v = math.expm1(completedLog(r, c))
          if (v == 0.0) Double.PositiveInfinity else v
        }
      }
      val mcSelect = Array.tabulate(w.nRows) { r =>
        var best = 0; var c = 1
        while (c < w.nCols) { if (pred(r)(c) < pred(r)(best)) best = c; c += 1 }
        best
      }
      val inferenceTime = (System.nanoTime() - t1) / 1e9

      Loop.emit(results, st.metrics(trainingTime, inferenceTime), tracePath)

      val improve = Array.tabulate(w.nRows) { r =>
        val mcMin = pred(r)(mcSelect(r))
        (minObs(r) - mcMin) / mcMin
      }
      val order = (0 until w.nRows).sortBy(r => (-improve(r), r))

      var cnt = 0
      val it = order.iterator
      while (it.hasNext && cnt < newObserveSize) {
        val row = it.next()
        val hint = mcSelect(row)
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

      // random top-up to the budget (`limeqo.py:102-123`); NOTE the
      // reference REBINDS min_observed here (`limeqo.py:104`), so when the
      // top-up runs, the outer stop condition tests the refreshed value —
      // mirrored by assigning the outer minObs each top-up iteration
      var topUpDone = false
      while (cnt < newObserveSize && !topUpDone) {
        val mo = st.minObserved
        minObs = mo
        if (mo.sum <= w.optTime + 50) topUpDone = true
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

      // no trailing recompute: keepGoing's +20 branch tests the body-top
      // value (per `limeqo.py:35-40`) unless the top-up above refreshed it
      // (`limeqo.py:104`) — matching the reference in both paths
      round += 1
      Loop.snap(snapshotPath, RunSnapshot.capture(name, seed, st, round, minObs,
        results.toSeq, rng = Some(rng)))
    }
    if (!keepGoing)
      Loop.snap(snapshotPath, RunSnapshot.capture(name, seed, st, round, minObs,
        results.toSeq, rng = Some(rng), done = true))
    results.toVector
  }
}
