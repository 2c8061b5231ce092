package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binned interval join: half-open boundaries, multi-bin spans, and " +
      "key isolation — equals the naive range join") {
    val intervals = Seq(
      // [10:00, 10:10) — starts mid-bin
      (1L, 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      // [10:59, 11:31) — spans several ten-minute bins
      (1L, 101L, ts("2024-01-01 10:59:00"), ts("2024-01-01 11:31:00")),
      // other key, same times as interval 100
      (2L, 102L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"))
    ).toDF("user_id", "iv_id", "w_start", "w_end")
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start: IN (closed start)
      (1L, ts("2024-01-01 10:09:59")), // inside
      (1L, ts("2024-01-01 10:10:00")), // == end: OUT (open end)
      (1L, ts("2024-01-01 11:30:59")), // inside the long interval
      (1L, ts("2024-01-01 11:31:00")), // == its end: OUT
      (1L, ts("2024-01-01 09:59:59")), // before everything
      (2L, ts("2024-01-01 10:05:00")), // other key, inside 102 only
      (3L, ts("2024-01-01 10:05:00"))  // key with no interval
    ).toDF("user_id", "ts")

    val got = RangeJoin.binnedIntervalJoin(intervals, points,
        Seq("user_id"), "w_start", "w_end", "ts", binSeconds = 600)
      .select(col("iv_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet

    // naive independent derivation
    val naive = intervals.as("i").join(points.as("p"),
        col("i.user_id") === col("p.user_id") &&
          col("p.ts") >= col("i.w_start") && col("p.ts") < col("i.w_end"))
      .select(col("iv_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet

    assert(got == naive)
    assert(got == Set(
      (100L, ts("2024-01-01 10:00:00")),
      (100L, ts("2024-01-01 10:09:59")),
      (101L, ts("2024-01-01 11:30:59")),
      (102L, ts("2024-01-01 10:05:00"))))
  }

  test("binned plan is an equi-join (shuffle/broadcast HASH join), never " +
      "a nested loop; the naive predicate IS a nested loop") {
    val intervals = Seq((1L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:10:00"))).toDF("user_id", "w_start", "w_end")
    val points = Seq((1L, ts("2024-01-01 10:05:00"))).toDF("user_id", "ts")
    val binnedPlan = RangeJoin.binnedIntervalJoin(intervals, points,
        Seq("user_id"), "w_start", "w_end", "ts", 600)
      .queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("BroadcastNestedLoopJoin"), binnedPlan)
    assert(binnedPlan.contains("HashJoin") || binnedPlan.contains("SortMergeJoin"),
      binnedPlan)
    val naivePlan = intervals.as("i").join(points.as("p"),
        col("i.user_id") === col("p.user_id") &&
          col("p.ts") >= col("i.w_start") && col("p.ts") < col("i.w_end"))
      .queryExecution.executedPlan.toString
    // the equi-key keeps even the naive form a hash join; drop the key to
    // show what a pure range predicate costs
    val pure = intervals.crossJoin(points.drop("user_id"))
    assert(naivePlan.contains("Join"))
    assert(pure.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }
}
