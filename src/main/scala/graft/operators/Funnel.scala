package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel over an event log — the standard product-analytics
  * conversion query (did the user do A, then B, then C, each within a
  * bounded time of the previous step?).
  *
  * Semantics — FIRST-TOUCH ANCHORED (the common product-analytics
  * definition): a user's step-0 match is their EARLIEST step-0 event;
  * step i matches the earliest event of its type STRICTLY after the
  * step i-1 match and at most `withinHours` after it. Each window is
  * measured from the previous MATCH, so a user who abandons their first
  * touch and converts via a later one does NOT count (view@0h,
  * view@30h, click@40h → step 1 unmatched: the anchor is the 0h view
  * and its 24h window closes before the click). That divergence from
  * any-chain reachability is deliberate and spec-pinned — "did the
  * first touch convert" is the question this funnel answers, and the
  * anchored rule keeps the operator one frontier per user per step
  * instead of a per-user set of feasible anchors.
  *
  * Scale shape: one hash-aggregate per step over the step's type-filtered
  * slice (the filter prunes at the scan), joined to the previous step's
  * per-user frontier — a per-user relation, orders of magnitude smaller
  * than the event log. No window over the full log, no per-user
  * collection; `steps.size` sequential shuffles total.
  */
object Funnel {

  /** Per-step reach counts: `(step, step_name, n_users)`, one row per
    * funnel step. */
  def funnel(events: DataFrame, steps: Seq[String], withinHours: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val frontiers = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val slice = events.filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol))
        Some(prev match {
          case None =>
            slice.groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
          case Some(front) =>
            slice.join(front.select(col(userCol), col("t").as("t_prev")),
                Seq(userCol))
              .filter(col(tsCol) > col("t_prev") &&
                col(tsCol) <= col("t_prev") +
                  expr(s"INTERVAL $withinHours HOURS"))
              .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
        })
    }.flatten
    frontiers.zip(steps).zipWithIndex.map { case ((front, name), i) =>
      front.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step"), lit(name).as("step_name"), col("n_users"))
    }.reduce(_.unionAll(_))
  }
}
