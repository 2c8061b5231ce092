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

  test("NOT(impossible cosine) over nullable inputs keeps 3-valued semantics") {
    Graft.init(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(1f, 0f)), Some(Seq(1f, 0f))),
      (2L, Option.empty[Seq[Float]], Some(Seq(1f, 0f)))
    ).toDF("id", "a", "b")
    // NOT(NULL) is NULL → row 2 must be dropped, not kept; folding the
    // nullable predicate to FALSE would have returned both rows.
    val out = df.filter(!(Graft.cosine(col("a"), col("b")) >= 1.5))
    assert(out.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // projection position: the NULL outcome must survive as NULL.
    val proj = df
      .select(col("id"), (Graft.cosine(col("a"), col("b")) >= 1.5).as("p"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .toMap
    assert(proj(1L).contains(false) && proj(2L).isEmpty)
  }

  test("impossible-cosine collapse preserves isStreaming on streaming plans") {
    Graft.init(spark)
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float], Seq[Float])]
    val sdf = ms.toDF.toDF("id", "a", "b")
      .filter(Graft.cosine(col("a"), col("b")) >= 1.5)
    val analyzed = sdf.queryExecution.analyzed
    assert(analyzed.isStreaming)
    val collapsed = graft.plans.ImpossibleCosineFilter(analyzed)
    assert(collapsed.isStreaming,
      s"collapse dropped isStreaming:\n$collapsed")
  }

  test("freeLocalCheckpoint frees a single-leaf checkpoint, no-ops on " +
      "plain plans, and REFUSES multi-leaf derived plans (r12 advice)") {
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlBridge
    val a = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    val b = Seq(2, 3, 4).toDF("x").localCheckpoint(true)
    // a derived two-leaf plan must throw, not silently free BOTH inputs
    // (lineage is truncated — freed blocks are unrecoverable)
    intercept[IllegalArgumentException] {
      GraftSqlBridge.freeLocalCheckpoint(a.join(b, Seq("x")))
    }
    // the refused call must leave both inputs fully usable
    assert(a.join(b, Seq("x")).count() == 2)
    GraftSqlBridge.freeLocalCheckpoint(a)
    GraftSqlBridge.freeLocalCheckpoint(b)
    // no LogicalRDD leaf at all: documented no-op, not an error
    GraftSqlBridge.freeLocalCheckpoint(Seq(1).toDF("x"))
  }
}
