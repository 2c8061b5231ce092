package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAggregator
import graft.operators.Knn

class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("single-pass aggregator equals the window-form grouped top-k") {
    import spark.implicits._
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // window form (production path)
    val expected = Knn.topKPerQuery(e, qs, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (q, hits) => q -> hits.map(h => (h._2, h._3)).sortBy(h => (-h._2, h._1)).toSeq }
    // aggregator form: one pass, partial-aggregated bounded heaps
    val scored = e.crossJoin(broadcast(qs))
      .select(col("qid"),  col("vec_id"),
        Graft.cosine(col("embedding"), col("qvec")).as("simil"))
      .as[(Long, Long, Double)]
    val got = scored
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAggregator(10).toColumn)
      .collect()
      .map { case (q, hits) => q -> hits }
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (q, hits) =>
      assert(got(q).map(_._1) == hits.map(_._1), s"qid $q ids differ")
      got(q).zip(hits).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-12) }
    }
  }
}
