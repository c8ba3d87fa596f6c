package graft.model

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.plans.{PlanFeaturizer, PlanNode, PlanRecord, PlanTrees}

class TCNNSpec extends AnyFunSuite {

  /** Synthetic plan: Hash Join over two Seq Scans; costs encode `runtime`
    * so the net has signal to learn (FIXTURES.md §3 vocabulary). */
  private def mkTree(runtime: Double): PlanNode =
    PlanNode("Hash Join", totalCost = runtime * 100.0, planRows = runtime * 10.0, planWidth = 8.0,
      List(
        PlanNode("Seq Scan", runtime * 40.0, runtime * 5.0, 4.0, Nil),
        PlanNode("Seq Scan", runtime * 60.0, runtime * 5.0, 4.0, Nil)))

  private def mkCorpus(n: Int, seed: Long): (Seq[PlanRecord], PlanFeaturizer) = {
    val rng = new Random(seed)
    val recs = (0 until n).map { i =>
      val rt = 0.5 + rng.nextDouble() * 9.5
      PlanRecord(f"q$i%03d", List(i % 7), List(rt, rt * 1.05, rt * 0.95), mkTree(rt))
    }
    (recs, PlanFeaturizer.fit(recs))
  }

  private def sample(p: PlanRecord, fz: PlanFeaturizer, row: Int): PlanSample =
    PlanSample(fz.transformFeatures(p.tree), fz.indexes(p.tree), row,
      p.hintList.toArray, fz.transformLabel(p.runtimeList))

  test("backprop matches numerical gradients (dropout off)") {
    val (recs, fz) = mkCorpus(4, seed = 1)
    val s = sample(recs.head, fz, row = 0)
    val net = new TCNN(fz.numFeatures, rank = 3, nRows = 4, nCols = 7, seed = 11, dropP = 0.0)

    net.forwardBackwardMse(s)
    // snapshot analytic grads, then compare a handful of coordinates per
    // tensor against central differences
    val tensors = net.parameterTensors
    val analytic = tensors.map(_.g.copy)
    val rng = new Random(5)
    val h = 1e-5
    var checked = 0
    tensors.zipWithIndex.foreach { case (p, ti) =>
      val coords = Seq.fill(3)((rng.nextInt(p.w.rows), rng.nextInt(p.w.cols)))
      coords.foreach { case (r, c) =>
        val orig = p.w(r, c)
        p.w(r, c) = orig + h
        val lp = { val e = net.predict(s) - s.label; e * e }
        p.w(r, c) = orig - h
        val lm = { val e = net.predict(s) - s.label; e * e }
        p.w(r, c) = orig
        val numeric = (lp - lm) / (2 * h)
        val ana = analytic(ti)(r, c)
        val denom = math.max(1e-6, math.max(math.abs(numeric), math.abs(ana)))
        assert(math.abs(numeric - ana) / denom < 1e-3,
          s"tensor $ti ($r,$c): numeric=$numeric analytic=$ana")
        checked += 1
      }
    }
    assert(checked > 30)
  }

  test("training reduces loss on a learnable synthetic corpus") {
    val (recs, fz) = mkCorpus(40, seed = 2)
    val samples = recs.zipWithIndex.map { case (p, i) => sample(p, fz, i) }.toIndexedSeq
    val censors = IndexedSeq.fill(samples.size)(0.0)
    val net = new TCNN(fz.numFeatures, rank = 3, nRows = 40, nCols = 7, seed = 3, dropP = 0.0)
    val srng = new Random(4)
    val first = net.trainEpoch(samples, censors, 8, srng)
    (1 to 30).foreach(_ => net.trainEpoch(samples, censors, 8, srng))
    val last = net.trainEpoch(samples, censors, 8, srng)
    assert(last < first * 0.5, s"loss did not halve: first=$first last=$last")
  }

  test("censored samples with exceeded cutoffs contribute zero gradient") {
    val (recs, fz) = mkCorpus(4, seed = 6)
    val s = sample(recs.head, fz, 0)
    val net = new TCNN(fz.numFeatures, rank = 2, nRows = 4, nCols = 7, seed = 7, dropP = 0.0)
    val pred = net.predict(s)
    // censor below the prediction ⇒ (censor≠0 ∧ pred ≥ censor) ⇒ no loss:
    // one epoch on only-censored data must not move the parameters
    val before = net.parameterTensors.map(_.w.copy)
    net.trainEpoch(IndexedSeq(s), IndexedSeq(pred - 1.0), 1, new Random(8))
    val after = net.parameterTensors.map(_.w)
    before.zip(after).foreach { case (b, a) => assert(b == a) }
  }
}
