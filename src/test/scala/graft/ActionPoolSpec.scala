package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared cached action pool (r14 verdict #8) — pinned to actually
  * schedule concurrently (wall < sum of the parts), to survive NESTED
  * composition without deadlock (the failure mode the global-EC +
  * Await idiom risked), and to rethrow a thunk's failure with its
  * original cause. */
class ActionPoolSpec extends AnyFunSuite {

  test("inParallel overlaps its two thunks and inParallelSeq its batch") {
    val t0 = System.nanoTime()
    val (a, b) = Graft.inParallel({ Thread.sleep(400); 1 },
      { Thread.sleep(400); 2 })
    val dt = (System.nanoTime() - t0) / 1e6
    assert((a, b) == (1, 2))
    assert(dt < 750, s"pair did not overlap: $dt ms")
    val t1 = System.nanoTime()
    val xs = Graft.inParallelSeq((1 to 8).map(i => () => {
      Thread.sleep(300); i * i
    }))
    val dt1 = (System.nanoTime() - t1) / 1e6
    assert(xs == (1 to 8).map(i => i * i))
    assert(dt1 < 1800, s"batch did not overlap: $dt1 ms")
  }

  test("nested composition cannot deadlock: an inParallel whose thunks " +
      "each run their own inParallelSeq completes") {
    val (x, y) = Graft.inParallel(
      Graft.inParallelSeq(Seq(() => { Thread.sleep(100); 1 },
        () => { Thread.sleep(100); 2 })).sum,
      Graft.inParallelSeq(Seq(() => { Thread.sleep(100); 3 },
        () => { Thread.sleep(100); 4 })).sum)
    assert((x, y) == (3, 7))
  }

  test("a failing thunk rethrows its original cause") {
    val boom = intercept[IllegalStateException] {
      Graft.inParallel({ throw new IllegalStateException("boom"); 1 }, 2)
    }
    assert(boom.getMessage == "boom")
    val boom2 = intercept[IllegalStateException] {
      Graft.inParallelSeq(Seq(() => 1,
        () => throw new IllegalStateException("boom2")))
    }
    assert(boom2.getMessage == "boom2")
  }
}
