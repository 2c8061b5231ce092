package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval–point range join without a nested-loop:
  * `points.ts ∈ [intervals.start, intervals.end)` on shared equi-keys.
  *
  * A raw range predicate plans as BroadcastNestedLoopJoin — O(|I|·|P|)
  * compares and a broadcast of a whole side, the classic 100 TB
  * scale-killer. The standard fix (the "banded join" engines like
  * Databricks' range-join optimization implement) is binning:
  *
  *  - every interval is exploded to the time bins it overlaps
  *    (≈ len/binWidth + 1 rows — pick `binSeconds` near the typical
  *    interval length so the blow-up is ~2×),
  *  - every point lands in exactly ONE bin,
  *  - the join becomes a plain shuffled EQUI-join on (keys…, bin) —
  *    partitioned, codegen, AQE-skew-splittable — and the exact range
  *    predicate filters the within-bin candidates.
  *
  * Each (interval, point) match shares exactly one bin (the point's), so
  * the output needs no dedup. Intervals are half-open `[start, end)`. */
object RangeJoin {

  /** `intervals ⋈ points` — one output row per (interval row, point row)
    * pair with equal `keys`, `points.tsCol ∈ [startCol, endCol)`. Both
    * inputs keep all their other columns (names must not collide). */
  def binnedIntervalJoin(intervals: DataFrame, points: DataFrame,
      keys: Seq[String], startCol: String, endCol: String, tsCol: String,
      binSeconds: Long): DataFrame = {
    val binMicros = binSeconds * 1000000L
    def bin(c: Column): Column = floor(unix_micros(c) / binMicros)
    val iv = intervals.withColumn("_bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    val pt = points.withColumn("_bin", bin(col(tsCol)))
    iv.join(pt, keys :+ "_bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bin")
  }
}
