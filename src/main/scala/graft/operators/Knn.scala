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
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    groupedTopK(
      emb.crossJoin(broadcast(queries))
        .select(col("qid"), col(idCol),
          Graft.cosine(col(vecCol), col("qvec")).as("simil")),
      k, idCol, "simil")

  /** Grouped top-k over `(qid, idCol, scoreCol)` rows as a PARTIAL-
    * aggregable bounded-heap aggregate ([[graft.functions.TopKAggregator]])
    * instead of a `row_number` window: each map partition reduces to ≤k
    * rows per qid BEFORE the shuffle, and the per-qid reducer merges
    * partitions·k candidates — so no single task ever sorts a query's
    * whole corpus scan (the window form funnels |corpus| rows per qid
    * into one task; r9 advisory). Shuffle volume is k·|Q|·partitions,
    * independent of corpus size. Ordering contract matches the window
    * form exactly: score desc, id asc (spec-checked equal).
    *
    * Output: `(qid, idCol, scoreCol)` with idCol/scoreCol types restored
    * to the input's. */
  def groupedTopK(scored: DataFrame, k: Int, idCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, functions => F}
    val idType = scored.schema(idCol).dataType
    val scoreType = scored.schema(scoreCol).dataType
    val topk = F.udaf(new graft.functions.TopKAggregator(k),
      Encoders.product[(Long, Double)])
    scored
      .groupBy(col("qid"))
      .agg(topk(col(idCol).cast("long"), col(scoreCol).cast("double")).as("tops"))
      .select(col("qid"), explode(col("tops")).as("p"))
      .select(col("qid"), col("p._1").cast(idType).as(idCol),
        col("p._2").cast(scoreType).as(scoreCol))
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
