package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-coverage contract (r11 verdict #4): every oracle query is
  * either benched (in [[Bench.headline]], so it gets BENCH_r{N} numbers
  * and ExplainProbe plan evidence) or carries an explicit one-line
  * exclusion reason in [[Bench.excluded]]. A new query cannot land
  * unbenched without a recorded reason — this spec fails the build. */
class BenchCoverageSpec extends AnyFunSuite {

  test("headline ∪ excluded partitions SparkEntry.queries exactly") {
    val all = SparkEntry.queries.keySet
    val head = Bench.headline.toSet
    val excl = Bench.excluded.keySet
    assert(Bench.headline.distinct.size == Bench.headline.size,
      "duplicate headline entries")
    val overlap = head.intersect(excl)
    assert(overlap.isEmpty, s"benched AND excluded: $overlap")
    val unknownHead = head.diff(all)
    assert(unknownHead.isEmpty, s"headline names unknown queries: $unknownHead")
    val unknownExcl = excl.diff(all)
    assert(unknownExcl.isEmpty, s"excluded names unknown queries: $unknownExcl")
    val uncovered = all.diff(head.union(excl))
    assert(uncovered.isEmpty,
      s"oracle queries with neither a bench entry nor an exclusion " +
        s"reason: ${uncovered.toSeq.sorted}")
  }

  test("every exclusion reason is substantive (kind-prefixed)") {
    val kinds = Set("family:", "map-only:", "composition:", "fixture:",
      "harness:")
    val bad = Bench.excluded.filterNot { case (_, r) =>
      kinds.exists(r.startsWith) && r.length > 20 }
    assert(bad.isEmpty, s"non-substantive exclusion reasons: ${bad.keys}")
  }
}
