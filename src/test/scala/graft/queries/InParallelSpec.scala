package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Failure semantics of the overlap-independent-jobs device (r20; the
  * r19 verdict's finding #4 against the fire-and-forget pool):
  *
  *  (a) a [[graft.sources.SnapshotStore.ConcurrentCommitException]]
  *      thrown inside an arm surfaces TYPED — not wrapped in the
  *      pool's ExecutionException — so a caller honoring the store's
  *      documented retry-on-ConcurrentCommit doctrine still catches it
  *      under inParallel;
  *  (b) the sibling arm is cancelled (interrupted) when an arm fails,
  *      instead of running to completion fire-and-forget;
  *  (c) the success path returns both results.
  *
  * Pure threading — no SparkSession needed. */
class InParallelSpec extends AnyFunSuite {

  test("(a) ConcurrentCommitException surfaces typed through inParallel") {
    val boom = intercept[graft.sources.SnapshotStore.ConcurrentCommitException] {
      DedupQueries.inParallel(
        { Thread.sleep(30)
          throw new graft.sources.SnapshotStore.ConcurrentCommitException(
            "lost the race") },
        { Thread.sleep(200); 42 })
    }
    assert(boom.getMessage.contains("lost the race"))
  }

  test("(b) a failing arm interrupts its sibling") {
    val interrupted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[IllegalStateException] {
      DedupQueries.inParallel(
        { Thread.sleep(30); throw new IllegalStateException("arm a died") },
        try { Thread.sleep(5000); finished.set(true); 1 }
        catch { case _: InterruptedException => interrupted.set(true); 0 })
    }
    // the sibling had ~5s left; the interrupt must beat it by a mile
    val deadline = System.nanoTime() + 2000000000L
    while (!interrupted.get() && !finished.get() &&
           System.nanoTime() < deadline) Thread.sleep(10)
    assert(interrupted.get() && !finished.get(),
      "sibling ran to completion instead of being cancelled")
  }

  test("(c) both results return on success") {
    assert(DedupQueries.inParallel(1 + 1, "x" * 2) === ((2, "xx")))
  }
}
