package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single latest right row at or
  * before (optionally strictly before) the left row's timestamp, per key.
  * The time-series primitive Spark has no native operator for (feature
  * lookup, last-touch attribution, quote-at-trade).
  *
  * Implementation is the scale-correct union trick, NOT a range join: tag
  * both sides, union them, and take `last(right_payload, ignoreNulls)`
  * over a per-key window ordered by (ts, side) with an unbounded-
  * preceding frame. One shuffle of (|L|+|R|) rows by key, one sort, one
  * forward pass — versus the O(|L|·|R|) blowup of the naive inequality
  * join Catalyst would otherwise plan (BroadcastNestedLoop at best).
  * Spark 3.5+ sorts the window partition once for both the tag order and
  * the frame, so the whole operator is a single Exchange + Window.
  *
  * Determinism: right rows must be unique per (keys, ts) — `last()` over
  * ties in the sort order would pick an arbitrary survivor. The driver
  * query's data satisfies this (spec-checked); pre-dedupe otherwise.
  */
object AsofJoin {

  /** Left-outer as-of: left columns plus `prefix`-renamed right payload
    * columns (null when no earlier right row exists).
    *
    * @param inclusive true = a right row at exactly left.ts matches
    *                  (sorted before the left row at equal ts);
    *                  false = strictly earlier rows only. */
  def lastEarlier(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String], prefix: String = "r_",
      inclusive: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    val pay = payload.map(c => prefix + c)
    // align schemas: keys ++ ts ++ left-only ++ payload ++ side tag
    val rightSide = if (inclusive) 0 else 2
    val taggedRight = right.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        leftCols.filterNot(keys.contains).filterNot(_ == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.zip(pay).map { case (c, p) => col(c).as(p) } :+
        lit(rightSide).as("_side"): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        leftCols.filterNot(keys.contains).filterNot(_ == tsCol).map(col) ++
        payload.zip(pay).map { case (c, p) =>
          lit(null).cast(right.schema(c).dataType).as(p) } :+
        lit(1).as("_side"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionAll(taggedLeft)
      .select((keys.map(col) ++ Seq(col(tsCol)) ++
        leftCols.filterNot(keys.contains).filterNot(_ == tsCol).map(col) ++
        pay.map(p => last(col(p), ignoreNulls = true).over(w).as(p)) :+
        col("_side")): _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
