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

  test("TopWeightedStringsAggregator equals the window-form top-k by " +
      "(weight DESC, value ASC) on a skewed fixture, truncates groups " +
      "over k, and keeps whole groups under k") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.{Encoders, functions => F}
    // one hot group with 40 distinct values (power-law-ish weights and
    // deliberate weight TIES), one small group under k
    val rows = (0 until 40).map(i =>
        ("hot", f"v$i%02d", (40 - i) / 3 + 1L)) ++
      Seq(("cold", "x", 5L), ("cold", "y", 5L))
    val df = spark.createDataFrame(rows).toDF("g", "v", "w")
    val k = 7
    val w = Window.partitionBy(col("g"))
      .orderBy(col("w").desc, col("v"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(_.getString(1)).toSeq)
      .toMap
    val topk = F.udaf(
      new graft.functions.TopWeightedStringsAggregator(k),
      Encoders.product[(String, Long)])
    val got = df.groupBy(col("g")).agg(topk(col("v"), col("w")).as("t"))
      .select(col("g"),
        transform(col("t"), x => x.getField("_1")).as("vs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got == want, s"got $got\nwant $want")
    assert(got("hot").size == k && got("cold").size == 2)
  }
}
