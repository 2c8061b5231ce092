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
    * inputs keep all their other columns (names must not collide).
    *
    * Data-quality guards on the explode (one pathological row must not be
    * able to blow up the bin fan-out):
    *  - intervals with `end < start` are dropped — no `ts` can satisfy
    *    the half-open range predicate, so the result is unchanged, and
    *    without the filter `sequence(binHi, binLo)` would fan out a
    *    DESCENDING bin array of nonsense rows;
    *  - an interval spanning more than `maxBinsPerInterval` bins fails
    *    the job LOUDLY (`raise_error`) instead of silently materializing
    *    a multi-million-row array per input row — that many bins means
    *    `binSeconds` is mis-sized for the data (pick it near the typical
    *    interval length) or the row is corrupt. */
  def binnedIntervalJoin(intervals: DataFrame, points: DataFrame,
      keys: Seq[String], startCol: String, endCol: String, tsCol: String,
      binSeconds: Long, maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val binMicros = binSeconds * 1000000L
    def bin(c: Column): Column = floor(unix_micros(c) / binMicros)
    val nBins = bin(col(endCol)) - bin(col(startCol)) + 1
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("_bin", explode(
        when(nBins <= maxBinsPerInterval,
          sequence(bin(col(startCol)), bin(col(endCol))))
        .otherwise(raise_error(concat(
          lit("binnedIntervalJoin: interval spans "), nBins.cast("string"),
          lit(s" bins > maxBinsPerInterval=$maxBinsPerInterval at " +
            s"binSeconds=$binSeconds — widen binSeconds or fix the row"))))))
    val pt = points.withColumn("_bin", bin(col(tsCol)))
    iv.join(pt, keys :+ "_bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bin")
  }
}
