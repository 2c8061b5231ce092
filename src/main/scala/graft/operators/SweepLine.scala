package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line interval-overlap consensus (SURVEY W2/W3) — the reference's
  * most interesting operator, reimplemented as window functions.
  *
  * Reference semantics (`/root/reference/camp_vec_rcmn.py:109-212`): each
  * targeting condition contributes a weighted interval [lo, hi]; per
  * feature, every boundary becomes a ±weight event; events sort by
  * `(point, start-before-end)`; a running weight sum scores every gap
  * between consecutive points; gaps with positive (later: ≥ threshold)
  * scores are the consensus intervals, rendered `<hi` / `>lo` / `lo~hi`
  * against sentinel domain bounds
  * (`/root/reference/camp_vec_rcmn.py:113-130,187-212`).
  *
  * The Python original is a driver-side loop over sorted dicts; here it is
  * three window passes over `partitionBy(name)` — each feature's events stay
  * in one partition, so the running sum never crosses a partition boundary,
  * and F features parallelize F-wide on a cluster. No collect, no loops.
  */
object SweepLine {

  /** Integer/epoch-axis consensus.
    *
    * @param conditions columns: `name: string, lo: long, hi: long, w: long`
    * @return           columns: `name, lo, hi, score` — every maximal gap
    *                   between event points with positive running weight.
    */
  def consensus(conditions: DataFrame): DataFrame = {
    val starts = conditions.select(col("name"), col("lo").as("point"),
      lit(0).as("tie"), col("w").as("delta"))
    val ends = conditions.select(col("name"), col("hi").as("point"),
      lit(1).as("tie"), (-col("w")).as("delta"))
    // Coalesce simultaneous events first: zero-length gaps carry no
    // information and pre-aggregation keeps the window input minimal.
    val events = starts.union(ends)
      .groupBy(col("name"), col("point"), col("tie"))
      .agg(sum(col("delta")).as("delta"))
    val w = Window.partitionBy(col("name")).orderBy(col("point"), col("tie"))
    events
      .withColumn("running",
        sum(col("delta")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_point", lead(col("point"), 1).over(w))
      .filter(col("next_point").isNotNull &&
        col("next_point") > col("point") && col("running") > 0)
      .select(col("name"), col("point").as("lo"),
        col("next_point").as("hi"), col("running").as("score"))
  }

  /** W3 selection + rendering: keep intervals with score ≥ threshold,
    * nudge starts that reuse the previous kept interval's end boundary
    * (+1 axis unit — the reference's adjacent-interval nudge,
    * `/root/reference/camp_vec_rcmn.py:177-178`, intent per SURVEY F11/B8),
    * then render with one-sided sentinel forms. */
  def renderKept(intervals: DataFrame, threshold: Double,
      domainMin: Long, domainMax: Long): DataFrame = {
    val w = Window.partitionBy(col("name")).orderBy(col("lo"))
    intervals
      .filter(col("score") >= threshold)
      .withColumn("prev_hi", lag(col("hi"), 1).over(w))
      .withColumn("lo_adj",
        when(col("prev_hi").isNotNull && col("prev_hi") === col("lo"),
          col("lo") + 1).otherwise(col("lo")))
      .select(col("name"),
        when(col("lo_adj") <= domainMin, concat(lit("<"), col("hi")))
          .when(col("hi") >= domainMax, concat(lit(">"), col("lo_adj")))
          .otherwise(concat(col("lo_adj"), lit("~"), col("hi"))).as("rendered"),
        col("score"))
  }

  /** Date-axis variant: conditions carry `yyyyMMdd` strings
    * (`lo_d`, `hi_d`); axis = epoch seconds (the reference converts through
    * `Epoch_date`, `/root/reference/camp_vec_rcmn.py:131-132`), output
    * rendered back to `yyyyMMdd` (`/root/reference/camp_vec_rcmn.py:204-209`). */
  def consensusDates(conditions: DataFrame): DataFrame = {
    val asEpoch = conditions.select(col("name"),
      unix_timestamp(to_date(col("lo_d"), "yyyyMMdd")).as("lo"),
      unix_timestamp(to_date(col("hi_d"), "yyyyMMdd")).as("hi"),
      col("w"))
    consensus(asEpoch)
      .select(col("name"),
        date_format(to_timestamp(col("lo")), "yyyyMMdd").as("lo_d"),
        date_format(to_timestamp(col("hi")), "yyyyMMdd").as("hi_d"),
        col("score"))
  }
}
