package graft.queries

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Graft, Tables}
import graft.operators.{Ann, Knn}

/** Approximate-nearest-neighbor scale paths. The IVF index is built from
  * md5-deterministic centroids, so the ENTIRE pipeline (centroid pick →
  * nearest-centroid assignment → probe → brute-force within buckets) is
  * reproduced by the DuckDB oracle; MLlib LSH hashes are engine-specific,
  * so those stay rows-only driver checks + recall specs. */
object AnnPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // IVF: probe the 4 nearest of 32 fixed centroid buckets, top-10.
    "ann_ivf_topk" -> ((s, dir) => {
      Graft.init(s)
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      Ann.searchIvf(Ann.buildIvf(e), q, nprobe = 4, k = 10)
        .select(col("vec_id"), round(col("simil"), 4).as("simil"))
        .orderBy(col("simil").desc, col("vec_id"))
    }),

    // Batch LSH: ONE approxSimilarityJoin for all 5 query vectors —
    // the scale path (no driver-side per-query loop).
    "ann_lsh_join" -> ((s, dir) => {
      Graft.init(s)
      val e = Tables.load(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.lshBatchTopK(e.filter(col("vec_id") >= 5), qs, k = 10)
        .select(col("qid"), col("vec_id"), round(col("dist"), 4).as("dist"))
        .orderBy(col("qid"), col("dist"), col("vec_id"))
    }),

    // MLlib BucketedRandomProjectionLSH approxNearestNeighbors (euclidean).
    "ann_lsh_topk" -> ((s, dir) => {
      Graft.init(s)
      val e = Tables.load(s, dir, "embeddings")
      val (model, withVec) = Ann.lshModel(e)
      val key = Vectors.dense(
        e.filter(col("vec_id") === 0).head.getSeq[Float](1).map(_.toDouble).toArray)
      model.approxNearestNeighbors(withVec.filter(col("vec_id") =!= 0), key, 10)
        .select(col("vec_id"), round(col("distCol"), 4).as("dist"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "ann_ivf_topk" ->
      """WITH c AS (
        |  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
        |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
        |asg AS (
        |  SELECT vec_id, embedding FROM (
        |    SELECT e.vec_id, e.embedding, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) DESC,
        |                 c.centroid_id DESC) AS rn
        |    FROM embeddings e CROSS JOIN c)
        |  WHERE centroid_id IN (
        |    SELECT centroid_id FROM c CROSS JOIN q
        |    ORDER BY list_cosine_similarity(cvec, qvec) DESC, centroid_id
        |    LIMIT 4) AND rn = 1),
        |topk AS (
        |  SELECT vec_id, list_cosine_similarity(embedding::DOUBLE[], qvec) AS s
        |  FROM asg CROSS JOIN q
        |  ORDER BY s DESC, vec_id LIMIT 10)
        |SELECT vec_id, round(s, 4) AS simil FROM topk
        |ORDER BY simil DESC, vec_id""".stripMargin
  )
}
