package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cosOracle(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def run(a: Array[Float], b: Array[Float]): (Double, Double) = {
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
    val native = df.select(Graft.cosine(col("a"), col("b"))).head.getDouble(0)
    val sqlExpr = df.select(VectorFunctions.cosineSim(col("a"), col("b"))).head.getDouble(0)
    (native, sqlExpr)
  }

  test("self-similarity is 1, zero vector is 0") {
    val v = Array(0.5f, -1.5f, 2.0f)
    val (n, s) = run(v, v)
    assert(math.abs(n - 1.0) < 1e-12 && math.abs(s - 1.0) < 1e-12)
    val (nz, _) = run(Array(0f, 0f, 0f), v)
    assert(nz == 0.0)
  }

  test("native expression, SQL-expr form, and Scala oracle agree on random vectors") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val expect = cosOracle(a, b)
      val (n, s) = run(a, b)
      assert(math.abs(n - expect) < 1e-12, s"native $n vs oracle $expect")
      assert(math.abs(s - expect) < 1e-9, s"sql-expr $s vs oracle $expect")
    }
  }

  test("scale invariance and symmetry") {
    val a = Array(1f, 2f, 3f, 4f)
    val b = Array(-2f, 0.5f, 1f, 3f)
    val (ab, _) = run(a, b)
    val (ba, _) = run(b, a)
    val (scaled, _) = run(a.map(_ * 7f), b)
    assert(math.abs(ab - ba) < 1e-12)
    assert(math.abs(ab - scaled) < 1e-7)
  }

  test("SQL registration path works and matches") {
    Graft.init(spark)
    Tables.load(spark, TestSpark.sfDir, "embeddings").limit(10)
      .createOrReplaceTempView("emb_t")
    val viaSql = spark.sql(
      "SELECT vec_id, cosine_sim(embedding, embedding) c FROM emb_t").collect()
    viaSql.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }

  test("simhash60 and fingerprint64 are SQL-registered and match the " +
      "Column forms") {
    Graft.init(spark)
    Tables.load(spark, TestSpark.sfDir, "documents").limit(20)
      .createOrReplaceTempView("docs_t")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash60(split(trim(text), '\\s+')) sh,
        |       fingerprint64(split(trim(text), '\\s+')) fp
        |FROM docs_t""".stripMargin)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val viaCol = Tables.load(spark, TestSpark.sfDir, "documents").limit(20)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.operators.Dedup.simhash(
          org.apache.spark.sql.functions.col("text")).as("sh"),
        graft.operators.TextAnalysis.fingerprint(
          org.apache.spark.sql.functions.col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }
}
