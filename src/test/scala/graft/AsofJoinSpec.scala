package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** As-of join on a hand fixture: inclusive vs strict boundary, no-match
  * nulls, per-key independence, later-rows invisibility — plus the
  * determinism precondition ((user, ts) unique) on the driver query's
  * real table. */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Double): Timestamp =
    new Timestamp((h * 3600 * 1000).toLong)

  private val views = Seq(
    ("u1", ts(1), 10.0), ("u1", ts(5), 50.0),
    ("u3", ts(9), 90.0)).toDF("user_id", "ts", "value")
  private val purchases = Seq(
    ("u1", ts(0.5), 1L), ("u1", ts(3), 2L), ("u1", ts(5), 3L),
    ("u2", ts(10), 4L)).toDF("user_id", "ts", "event_id")

  private def run(inclusive: Boolean): Map[Long, Option[Double]] =
    AsofJoin.lastEarlier(purchases, views, Seq("user_id"), "ts",
        payload = Seq("value"), prefix = "view_", inclusive = inclusive)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("view_value")).map(_.asInstanceOf[Double]))
      .toMap

  test("inclusive: latest view at-or-before each purchase; none -> null") {
    assert(run(inclusive = true) == Map(
      1L -> None,        // before any view
      2L -> Some(10.0),  // view@1h, not the later view@5h
      3L -> Some(50.0),  // exactly-equal ts matches
      4L -> None))       // u2 has no views; u3's are invisible
  }

  test("strict: an equal-ts view does not match") {
    assert(run(inclusive = false) == Map(
      1L -> None, 2L -> Some(10.0),
      3L -> Some(10.0),  // view@5h excluded, falls back to view@1h
      4L -> None))
  }

  test("left columns and row count survive unchanged (left outer)") {
    val out = AsofJoin.lastEarlier(purchases, views, Seq("user_id"), "ts",
      payload = Seq("value"))
    assert(out.count() == 4)
    assert(out.columns.toSeq ==
      Seq("user_id", "ts", "event_id", "r_value"))
  }

  test("determinism precondition on the driver query's table: " +
      "(user_id, ts) unique in events") {
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
    assert(ev.groupBy("user_id", "ts").count()
      .filter($"count" > 1).isEmpty)
  }
}
