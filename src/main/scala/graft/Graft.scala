package graft

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}

import graft.functions.{CosineSimilarity, Fingerprint64, Simhash60}

/** Session bootstrap: registers graft's native Catalyst functions so they
  * are usable both as Columns and from `spark.sql`. Idempotent and cheap —
  * every public entry point calls it. */
object Graft {
  def init(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    GraftSqlBridge.registerFunction(spark, "simhash60",
      exprs => Simhash60(exprs(0)))
    GraftSqlBridge.registerFunction(spark, "fingerprint64",
      exprs => Fingerprint64(exprs(0)))
    // per-session optimizer rule (cluster-wide form: GraftExtensions)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.ImpossibleCosineFilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ImpossibleCosineFilter
  }

  /** Whole-stage-codegen cosine similarity (see CosineSimilarityExpr.scala). */
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
