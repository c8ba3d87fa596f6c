package graft.operators

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the maintenance fork/join plumbing — in particular the
  * round-16 ADVICE contract: a fold aborting mid-overlap must leave NO
  * stray forked write completing after the scope closes (an orphaned
  * directory overwrite would race a caller's retry on the same paths). */
class MaintenanceIOSpec extends AnyFunSuite {

  test("Overlap.close cancels and awaits an in-flight fork when the serial chain aborts") {
    val started = new CountDownLatch(1)
    val finished = new AtomicBoolean(false)
    val interrupted = new AtomicBoolean(false)
    val ex = intercept[RuntimeException] {
      val ov = new MaintenanceIO.Overlap(2)
      try {
        ov.fork {
          started.countDown()
          try { Thread.sleep(60000); finished.set(true) }
          catch { case _: InterruptedException => interrupted.set(true) }
        }
        started.await()
        throw new RuntimeException("serial chain failure")
      } finally ov.close()
    }
    // the serial chain's own exception propagates, not a secondary one
    assert(ex.getMessage == "serial chain failure")
    // close() blocked until the fork exited — by the time the exception
    // reaches us the forked body has been interrupted and is GONE, so a
    // retry can never race it
    assert(interrupted.get, "forked body must be interrupted by close()")
    assert(!finished.get, "forked body must not run to completion after close()")
  }

  test("Overlap normal path: joined forks return values; close is a no-op afterwards") {
    val ov = new MaintenanceIO.Overlap(2)
    try {
      val a = ov.fork(21 * 2)
      val b = ov.fork("ok")
      assert(a.join() == 42)
      assert(b.join() == "ok")
    } finally ov.close()
  }

  test("Overlap.join rethrows the fork's own exception") {
    val ov = new MaintenanceIO.Overlap(1)
    try {
      val f = ov.fork[Int](throw new IllegalStateException("boom"))
      val ex = intercept[IllegalStateException](f.join())
      assert(ex.getMessage == "boom")
    } finally ov.close()
  }
}
