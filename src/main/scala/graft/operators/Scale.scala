package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities: skew salting and bucketed co-located joins — the
  * knobs a 100TB deployment reaches for when a shuffle key is pathological.
  */
object Scale {

  /** Two-phase salted aggregation for skewed group keys: deterministic
    * salt from a secondary column spreads one hot key over `nSalts`
    * reducers in phase 1; phase 2 combines the partials. Results are
    * identical to a direct groupBy-sum (spec-verified); use when one key
    * holds a large fraction of all rows and AQE skew handling isn't enough.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltFrom: String, nSalts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(hash(col(saltFrom)), lit(nSalts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"),
        sum(col("_n")).as("n_rows"))

  /** Broadcast-replicated salt join for a skewed fact⋈dim join where the
    * dim is too big to broadcast outright but each key's rows are few:
    * replicate the dim `nSalts` ways, salt the fact side, join on
    * (key, salt). Spreads a hot fact key across reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFrom: String, nSalts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(col(saltFrom)), lit(nSalts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Exact per-group top-k under a TOTAL order, without funneling any
    * group's whole row set into one task (the window-only form does —
    * the r9 `searchSq8Batch` advisory): stage 1 ranks within
    * (group, input-partition) and keeps each partition's local top-k —
    * exact, because a row in the global top-k is in its partition's
    * top-k — so stage 2's global window sorts at most
    * `k · partitions` rows per group. Works for ANY key/order types
    * (where [[graft.operators.Knn.groupedTopK]] is the long-id/double-
    * score fast path). `order` must be a total order or ranks are
    * nondeterministic. */
  def topKByGroup(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "topKByGroup needs k > 0")
    val w1 = Window
      .partitionBy((groupCols.map(col) :+ col("__pid")): _*)
      .orderBy(order: _*)
    val pruned = df.withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k).drop("__rn", "__pid")
    val w2 = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    pruned.withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= k).drop("__rn")
  }
}
