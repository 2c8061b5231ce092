package graft.queries

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Graft, Tables}
import graft.operators.{Ann, Knn}

/** Approximate-nearest-neighbor scale paths. xxhash-free but inherently
  * engine-specific (IVF assignment / MLlib LSH hashes), so these are
  * rows-only driver checks; AnnSpec asserts recall against the exact
  * brute-force oracle. */
object AnnPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // IVF: probe the 4 nearest centroid buckets (of ~|emb|/37), top-10.
    "ann_ivf_topk" -> ((s, dir) => {
      Graft.init(s)
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      Ann.searchIvf(Ann.buildIvf(e), q, nprobe = 4, k = 10)
        .select(col("vec_id"), round(col("simil"), 4).as("simil"))
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

  override def oracle: Map[String, String] = Map()
}
