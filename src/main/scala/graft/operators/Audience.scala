package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audience counting (E1 tail, `/root/reference/camp_vec_rcmn.py:284-293`):
  * the union of per-campaign audience queries, then
  * `COUNT(DISTINCT cust_id)`.
  *
  * Scale notes: the interval side is a range join of orders against a
  * handful of consensus intervals — the interval side is broadcast, so the
  * "range join" is a map-side `BETWEEN` filter, not a shuffle. countDistinct
  * shuffles once on cust_id; [[countApprox]] is the 100TB variant (HLL,
  * no exact-distinct shuffle).
  */
object Audience {

  /** Members matching any kept string value (semi join on the attribute)
    * unioned with members whose numeric attribute falls in any kept
    * interval; exact distinct count. */
  def count(customers: DataFrame, orders: DataFrame,
      keptSegments: DataFrame, keptIntervals: DataFrame): DataFrame = {
    val bySegment = customers
      .join(broadcast(keptSegments.select(col("value"))),
        col("c_mktsegment") === col("value"), "left_semi")
      .select(col("c_custkey").as("cust_id"))
    val byInterval = orders
      .join(broadcast(keptIntervals.select(col("lo"), col("hi"))),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .select(col("o_custkey").as("cust_id"))
    bySegment.union(byInterval)
      .agg(countDistinct(col("cust_id")).as("audience"))
  }

  /** HLL variant for 100TB-scale audience estimates. */
  def countApprox(members: DataFrame, rsd: Double = 0.01): DataFrame =
    members.agg(approx_count_distinct(col("cust_id"), rsd).as("audience_approx"))

  /** Heavy-hitter gate over a key column: Spark's `stat.freqItems`
    * implements the Karp–Shenker–Papadimitriou one-pass frequent-items
    * sketch (bounded 1/support state per partition, partial-mergeable —
    * the 100 TB shape for "who dominates this stream"). The sketch may
    * return false POSITIVES but never misses an item with exact
    * frequency > support·N; this surfaces that published guarantee the
    * same way the HLL/percentile gates do — one row per EXACT heavy
    * hitter with `in_sketch`, which the oracle requires to be TRUE (a
    * missed hitter breaks the row hash). Driver state is bounded: the
    * sketch array (≤ 1/support items) and one count scalar. */
  def heavyHitters(df: DataFrame, keyCol: String,
      support: Double): DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount, sum => fsum}
    val items = df.stat.freqItems(Array(keyCol), support)
      .head.getSeq[Any](0)
    // two full scans total (freqItems + the groupBy) — the threshold's
    // total count re-aggregates the SMALL per-key relation and rides a
    // broadcast 1-row frame, not a third corpus scan via df.count()
    val grouped = df.groupBy(col(keyCol))
      .agg(fcount(lit(1)).as("n_rows"))
    val total = grouped.agg(fsum(col("n_rows")).as("n_total"))
    grouped.crossJoin(broadcast(total))
      .filter(col("n_rows") > lit(support) * col("n_total"))
      .withColumn("in_sketch", col(keyCol).isin(items: _*))
      .select(col(keyCol), col("n_rows"), col("in_sketch"))
      .orderBy(col(keyCol))
  }

  /** Execute compiled audience SQL statements (see [[graft.TemplateSql]])
    * against registered temp views and UNION-distinct them — the Spark form
    * of the reference's `' UNION '.join(query_list)`
    * (`/root/reference/camp_vec_rcmn.py:284`). */
  def fromCompiledSql(spark: SparkSession, sqls: Seq[String]): DataFrame = {
    require(sqls.nonEmpty, "no audience queries")
    sqls.map(spark.sql).reduce(_ union _).distinct()
      .agg(countDistinct(col("cust_id")).as("audience"))
  }
}
