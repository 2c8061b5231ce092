package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event log: bucket users by first-seen day,
  * then count how many of each cohort were active again k days later —
  * the standard retention triangle.
  *
  * Scale shape: one groupBy(user) for first-seen, one distinct over
  * (user, activity-day) — both partial-aggregable, so each shuffles only
  * its combined partials, and the per-user first-seen side joins back on
  * user (sort-merge at scale; the distinct side's extra day key means the
  * exchanges don't co-partition — the cost of expressing "distinct days"
  * relationally, and still one bounded-width pass over the log). The
  * final (cohort, offset) aggregate is cohort-cardinality sized (days²,
  * tiny). All arithmetic is integer date math — no floats anywhere, so
  * the result is exactly reproducible in any engine. */
object Retention {

  /** `(cohort_day, day_offset, n_users)` — for each first-seen cohort,
    * distinct users active `day_offset` days after their first day
    * (offset 0 is the cohort size itself). */
  def cohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val active = events
      .select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    active.join(firstSeen, Seq(userCol))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
