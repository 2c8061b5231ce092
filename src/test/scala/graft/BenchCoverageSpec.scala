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

  test("adjudication modes (r15 verdict #1): median for a trustworthy " +
      "clean sample, fastest-clean for a <3-run dispersed sample (the " +
      "r15 dd_minhash_lsh record shape), min for no clean run at all") {
    import Bench.adjudicateTimes
    // standard path: 5 clean runs, median wins even when one stalls
    assert(adjudicateTimes(Seq(1.0, 1.1, 1.2, 1.3, 9.0),
      Seq(1.0, 1.1, 1.2, 1.3, 9.0)) == (1.2, "median_clean"))
    // the r15 record shape: 2 clean runs [2.23, 3.99] median to the
    // UPPER value (even-count median), 3.99 > 1.5 * the 1.80 completed
    // min → adjudicate the fastest CLEAN run, disclosed
    assert(adjudicateTimes(Seq(1.80, 3.99, 2.23, 3.11, 2.9),
      Seq(2.23, 3.99)) == (2.23, "min_clean_low_evidence"))
    // 1 clean run far above the min → that run is still the fastest
    // clean; the mode says low-evidence
    assert(adjudicateTimes(Seq(1.0, 5.0, 6.0), Seq(5.0)) ==
      (5.0, "min_clean_low_evidence"))
    // <3 clean runs but TIGHT against the min: median path (no guard)
    assert(adjudicateTimes(Seq(1.0, 1.2, 7.0), Seq(1.0, 1.2)) ==
      (1.2, "median_clean"))
    // 3+ clean runs: median even when dispersed (the sample can reject
    // a stall by itself)
    assert(adjudicateTimes(Seq(1.0, 4.0, 4.1, 4.2), Seq(4.0, 4.1, 4.2)) ==
      (4.1, "median_clean"))
    // no clean run: fastest completed lower-bounds true cost
    assert(adjudicateTimes(Seq(3.0, 2.0, 4.0), Nil) ==
      (2.0, "min_fallback"))
    // nothing completed at all
    assert(adjudicateTimes(Seq(-1.0), Nil) == (-1.0, "min_fallback"))
  }
}
