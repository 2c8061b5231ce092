package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Exact K-nearest-neighbor retrieval + score fusion.
  *
  * Spark-first form of the reference's per-query KNN SQL
  * (`SELECT …, 1-VEC_DISTANCE_COSINE(vec, q) ORDER BY 3 DESC LIMIT 10`,
  * `/root/reference/camp_vec_rcmn.py:44`) and driver-side score fusion
  * (`/root/reference/camp_vec_rcmn.py:52-73`).
  *
  * Scale design:
  *  - The query side is tiny (5 LLM expansions in the reference) and is
  *    ALWAYS broadcast — scoring is a map-only pass over the vector table,
  *    no shuffle of the big side.
  *  - Single-query top-k compiles to `TakeOrderedAndProject`: each partition
  *    keeps its local k, the driver merges k·numPartitions rows.
  *  - Multi-query top-k uses `row_number` over a per-query window; Spark
  *    3.5+'s WindowGroupLimit rewrites it to partial per-partition limits
  *    before the (queries-sized, trivial) shuffle.
  *  - Cosine is the codegen'd native expression ([[graft.Graft.cosine]]),
  *    so the scan stays inside one whole-stage-codegen loop.
  */
object Knn {

  /** Top-k by cosine for a single broadcast query vector.
    * `queryVec` must be a 1-row DataFrame with column `qvec: array<float>`. */
  def topK(emb: DataFrame, queryVec: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.crossJoin(broadcast(queryVec))
      .select(col(idCol), Graft.cosine(col(vecCol), col("qvec")).as("simil"))
      .orderBy(desc("simil"), col(idCol))
      .limit(k)

  /** Top-k per query for a small set of query vectors
    * (`qid: long, qvec: array<float>`). One scan of `emb` total. */
  def topKPerQuery(emb: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = emb.crossJoin(broadcast(queries))
      .select(col("qid"), col(idCol),
        Graft.cosine(col(vecCol), col("qvec")).as("simil"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("simil"), col(idCol))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Score fusion: sum similarity per candidate across query expansions,
    * normalize to percent-of-max (`round(sum/nQueries*100, 2)`,
    * `/root/reference/camp_vec_rcmn.py:71`), keep the top `topN`. */
  def fuse(hits: DataFrame, nQueries: Int, topN: Int,
      idCol: String = "vec_id"): DataFrame =
    hits.groupBy(col(idCol))
      .agg(sum(col("simil")).as("fused"))
      .select(col(idCol),
        round(col("fused") / nQueries * 100, 2).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(topN)
}
