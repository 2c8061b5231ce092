package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Graft, Tables}
import graft.operators.Knn

/** Vector-search queries: exact KNN (J6/T1), threshold search + best-per-
  * group (P6/A1), multi-query score fusion (A6/T2/T3).
  *
  * Fixture mapping: `embeddings.parquet` plays `camp_summary_vec` /
  * `condition_vec`; low vec_ids play the query vectors the reference gets
  * from the external embedder. The similarity floor is 0.2 here (the
  * reference's 0.5, `/root/reference/nl_targeting.py:55`, is a knob; the
  * synthetic 64-dim vectors top out ≈0.37 so 0.5 would select nothing).
  */
object VectorSearchPack extends QueryPack {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J6/T1: single-query exact KNN, top-10 by cosine.
    "knn_topk" -> ((s, dir) => {
      Graft.init(s)
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      Knn.topK(e.filter(col("vec_id") =!= 0), q, 10)
        .select(col("vec_id"), round(col("simil"), 4).as("simil"))
    }),

    // P6+A1: similarity floor then best score per group (the reference's
    // `max(simil) GROUP BY cond WHERE simil >= floor`, nl_targeting.py:56).
    "knn_threshold_groupmax" -> ((s, dir) => {
      Graft.init(s)
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("label"), Graft.cosine(col("embedding"), col("qvec")).as("simil"))
        .filter(col("simil") >= 0.2)
        .groupBy(col("label"))
        .agg(round(max(col("simil")), 4).as("best_simil"))
        .orderBy(col("label"))
    }),

    // A6+T2+T3: 5 query expansions -> top-10 each -> fused top-5.
    "knn_fusion" -> ((s, dir) => {
      Graft.init(s)
      val e = emb(s, dir)
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val hits = Knn.topKPerQuery(e, qs, 10)
      Knn.fuse(hits, nQueries = 5, topN = 5)
    })
  )

  override def oracle: Map[String, String] = Map(
    "knn_topk" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec), 4) AS simil
        |FROM embeddings e CROSS JOIN q
        |WHERE e.vec_id <> 0
        |ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) DESC, e.vec_id
        |LIMIT 10""".stripMargin,

    "knn_threshold_groupmax" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
        |SELECT e.label, round(max(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec)), 4) AS best_simil
        |FROM embeddings e CROSS JOIN q
        |WHERE e.vec_id <> 0 AND list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) >= 0.2
        |GROUP BY e.label
        |ORDER BY e.label""".stripMargin,

    "knn_fusion" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |         list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS simil,
        |         row_number() OVER (
        |           PARTITION BY q.qid
        |           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) DESC, e.vec_id) AS rn
        |  FROM embeddings e CROSS JOIN q)
        |SELECT vec_id, round(sum(simil) / 5 * 100, 2) AS score
        |FROM scored WHERE rn <= 10
        |GROUP BY vec_id
        |ORDER BY score DESC, vec_id
        |LIMIT 5""".stripMargin
  )
}
