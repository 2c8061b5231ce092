package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SweepLine

/** W2/W3 against a brute-force interval-overlap oracle (SURVEY §5.1). */
class SweepLineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute force: for every adjacent boundary pair (p,q) of a feature, the
    * active weight is the sum of w over intervals with lo <= p and hi >= q;
    * positive gaps are consensus intervals. */
  private def oracle(conds: Seq[(String, Long, Long, Long)])
      : Set[(String, Long, Long, Long)] =
    conds.groupBy(_._1).flatMap { case (name, cs) =>
      val points = cs.flatMap(c => Seq(c._2, c._3)).distinct.sorted
      points.zip(points.drop(1)).flatMap { case (p, q) =>
        val w = cs.filter(c => c._2 <= p && c._3 >= q).map(_._4).sum
        if (w > 0) Some((name, p, q, w)) else None
      }
    }.toSet

  private def run(conds: Seq[(String, Long, Long, Long)])
      : Set[(String, Long, Long, Long)] =
    SweepLine.consensus(conds.toDF("name", "lo", "hi", "w"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("hand case: overlapping + touching intervals") {
    val conds = Seq(("a", 1L, 5L, 2L), ("a", 5L, 9L, 3L), ("a", 3L, 7L, 1L))
    assert(run(conds) == oracle(conds))
  }

  test("randomized against brute force") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val conds = (1 to 8).map { _ =>
        val lo = rnd.nextInt(100).toLong
        val hi = lo + 1 + rnd.nextInt(50)
        (s"f${rnd.nextInt(3)}", lo, hi, (1 + rnd.nextInt(5)).toLong)
      }
      assert(run(conds) == oracle(conds), s"trial $trial: $conds")
    }
  }

  test("renderKept: threshold, sentinel forms, adjacent nudge") {
    val cons = Seq(
      ("a", 0L, 10L, 5L),        // touches domain min -> '<10'
      ("a", 10L, 20L, 5L),       // adjacent to previous -> lo nudged to 11
      ("a", 30L, 40L, 1L),       // below threshold -> dropped
      ("b", 50L, 9999999999L, 9L) // touches domain max -> '>50'
    ).toDF("name", "lo", "hi", "score")
    val out = SweepLine.renderKept(cons, threshold = 3.0,
        domainMin = 0L, domainMax = 9999999999L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "<10"), ("a", "11~20"), ("b", ">50")))
  }

  test("date axis round-trips yyyyMMdd") {
    val conds = Seq(
      ("d", "20240101", "20240301", 2L),
      ("d", "20240201", "20240401", 3L)).toDF("name", "lo_d", "hi_d", "w")
    val out = SweepLine.consensusDates(conds)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(out == Set(
      ("20240101", "20240201", 2L),
      ("20240201", "20240301", 5L),
      ("20240301", "20240401", 3L)))
  }
}
