package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("impossible cosine threshold collapses the plan to an empty relation") {
    Graft.init(spark)
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val impossible = e.crossJoin(broadcast(q))
      .filter(Graft.cosine(col("embedding"), col("qvec")) >= 1.5)
    val optimized = impossible.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LocalRelation <empty>"),
      s"expected empty relation, got:\n$optimized")
    assert(impossible.count() == 0)
    // control: a feasible threshold still scans and returns rows
    val feasible = e.crossJoin(broadcast(q))
      .filter(Graft.cosine(col("embedding"), col("qvec")) >= 0.99)
    assert(feasible.count() >= 1) // the query vector itself
    assert(!feasible.queryExecution.optimizedPlan.toString
      .contains("LocalRelation <empty>"))
  }
}
