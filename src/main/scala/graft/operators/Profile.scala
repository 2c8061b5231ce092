package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the pre-training data-validation pass (a Deequ-style
  * "data card" input): per column, null count, distinct count, and
  * stringified min/max, as one long-format relation.
  *
  * Scale design: ONE scan — every metric for every column is computed in
  * a single aggregate (all partial-aggregable except the exact distinct
  * counts, which shuffle one hash-distinct per column), and the 1-row
  * wide result is unpivoted driver-light with `stack`. The exact
  * `count_distinct` keeps the driver's DuckDB gate bit-exact; at 100 TB
  * swap in `approx_count_distinct` (the tx_lengths_approx precedent —
  * one pass, no distinct shuffle, ±2% HLL error).
  */
object Profile {

  /** Profile `cols` of `df`: `(col_name, n_null, n_distinct, vmin,
    * vmax)` per column, min/max cast to string so heterogeneous column
    * types share one schema. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = count(lit(1)).as("_n_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        count_distinct(col(c)).as(s"${c}__d"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', _n_rows - `${c}__n`, `${c}__d`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, vmin, vmax)")
  }
}
