package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("E2 NL targeting: polarity subtraction removes negated codes") {
    val triples = Seq(
      ("세그먼트", "긍정", "BUILDING"),
      ("세그먼트", "긍정", "MACHINERY"),
      ("세그먼트", "부정", "BUILDING"),
      ("우선순위", "긍정", "1-URGENT")).toDF("attr", "polarity", "value")
    val out = NlTargeting.targetCodes(triples,
        IndexBuild.conditionIndex(spark, TestSpark.sfDir), floor = 0.99)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[String](2).toList))
      .toSet
    assert(out == Set(
      ("세그먼트", "긍정", List("MACHINERY")),
      ("세그먼트", "부정", List("BUILDING")),
      ("우선순위", "긍정", List("1-URGENT"))))
  }

  test("E1 audience count is positive and stable across runs") {
    val a = CampaignRecommend.audienceCount(spark, TestSpark.sfDir).head.getLong(0)
    val b = CampaignRecommend.audienceCount(spark, TestSpark.sfDir).head.getLong(0)
    assert(a == b && a > 0)
  }

  test("E3 campaign index: only [AI] campaigns, 64-dim vectors, deterministic") {
    val ix = IndexBuild.campaignIndex(spark, TestSpark.sfDir).cache()
    val n = ix.count()
    assert(n > 0)
    assert(ix.filter(!col("camp_sentence").contains("[AI]")).count() == 0)
    assert(ix.filter(size(col("camp_vec")) =!= 64).count() == 0)
    // determinism across evaluations (embedCol is pure)
    val v1 = ix.orderBy("camp_id").head.getSeq[Float](2)
    val v2 = IndexBuild.campaignIndex(spark, TestSpark.sfDir)
      .orderBy("camp_id").head.getSeq[Float](2)
    assert(v1 == v2)
  }

  test("Knn.topK returns the exact brute-force neighbors") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val q = e.filter(col("vec_id") === 7).select(col("embedding").as("qvec"))
    val got = Knn.topK(e.filter(col("vec_id") =!= 7), q, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // brute force on the driver
    val all = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qv = all.find(_._1 == 7L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = all.filter(_._1 != 7L)
      .map { case (id, v) => (id, cos(v, qv)) }
      .sortBy { case (id, s) => (-s, id) }.take(5)
    assert(got.map(_._1).toSeq == expect.map(_._1).toSeq)
    got.zip(expect).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-12) }
  }

  test("production-shaped mapPartitions embedder keeps schema and determinism") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(50)
    val out = Embeddings.embedPartitions(docs, new StubEmbedder(16), "text", "vec")
    assert(out.schema.fieldNames.last == "vec")
    val rows = out.select("doc_id", "vec").collect()
    assert(rows.length == 50 && rows.forall(_.getSeq[Float](1).length == 16))
    val again = Embeddings.embedPartitions(docs, new StubEmbedder(16), "text", "vec")
      .select("doc_id", "vec").collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Float](1))).toMap ==
      again.map(r => (r.getLong(0), r.getSeq[Float](1))).toMap)
  }
}
