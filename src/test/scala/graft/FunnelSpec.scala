package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

/** Boundary + semantic pinning for the first-touch anchored funnel. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Double): Timestamp =
    new Timestamp((h * 3600 * 1000).toLong)

  private def counts(events: Seq[(String, String, Timestamp)]): Map[Int, Long] =
    Funnel.funnel(events.toDF("user_id", "event_type", "ts"),
        Seq("view", "click", "purchase"), withinHours = 24)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

  test("happy path: all three steps within window") {
    val c = counts(Seq(
      ("u1", "view", ts(0)), ("u1", "click", ts(1)), ("u1", "purchase", ts(2))))
    assert(c == Map(0 -> 1L, 1 -> 1L, 2 -> 1L))
  }

  test("step must be STRICTLY after the previous match: same-ts click " +
      "does not count") {
    val c = counts(Seq(("u1", "view", ts(0)), ("u1", "click", ts(0))))
    assert(c == Map(0 -> 1L, 1 -> 0L, 2 -> 0L))
  }

  test("window is inclusive at exactly +24h and closed just past it") {
    val c = counts(Seq(
      ("in", "view", ts(0)), ("in", "click", ts(24)),
      ("out", "view", ts(0)), ("out", "click", ts(24.001))))
    assert(c == Map(0 -> 2L, 1 -> 1L, 2 -> 0L))
  }

  test("each window anchors on the previous MATCH, not the first event: " +
      "a chain can stretch to 48h total") {
    val c = counts(Seq(
      ("u1", "view", ts(0)), ("u1", "click", ts(23)),
      ("u1", "purchase", ts(46))))
    assert(c == Map(0 -> 1L, 1 -> 1L, 2 -> 1L))
  }

  test("FIRST-TOUCH pinning: a user converting only via a later view does " +
      "not count (anchor is the earliest view; its window closes first)") {
    // view@0 anchors; click@40 is outside (0, 24] even though it is inside
    // the 30h-view's window — the documented anchored-semantics divergence
    // from any-chain reachability.
    val c = counts(Seq(
      ("u1", "view", ts(0)), ("u1", "view", ts(30)), ("u1", "click", ts(40))))
    assert(c == Map(0 -> 1L, 1 -> 0L, 2 -> 0L))
  }

  test("greedy match is the EARLIEST eligible event of each step") {
    // two clicks in window: the 1h one anchors step 2, so a purchase at
    // 26h (inside the 23h click's window, outside the 1h click's) misses.
    val c = counts(Seq(
      ("u1", "view", ts(0)), ("u1", "click", ts(1)), ("u1", "click", ts(23)),
      ("u1", "purchase", ts(26))))
    assert(c == Map(0 -> 1L, 1 -> 1L, 2 -> 0L))
  }

  test("users are independent; counts are per-step reach") {
    val c = counts(Seq(
      ("a", "view", ts(0)), ("a", "click", ts(1)), ("a", "purchase", ts(2)),
      ("b", "view", ts(0)), ("b", "click", ts(5)),
      ("c", "view", ts(0)),
      ("d", "click", ts(0)))) // no view: never enters the funnel
    assert(c == Map(0 -> 3L, 1 -> 2L, 2 -> 1L))
  }
}
