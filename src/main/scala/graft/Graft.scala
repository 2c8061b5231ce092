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

  /** Engine-agnostic `round(x, scale)` for RATIO-like doubles (ratios of
    * small integers, weighted sums of such): route through a decimal(28,12)
    * cast so both engines round the same decimal value HALF_UP. Plain
    * `round` on a double diverges between engines exactly when the true
    * rational sits on a rounding boundary (e.g. 0.65875: Spark rounds the
    * shortest decimal string → 0.6588, DuckDB rounds the binary value
    * 0.65874999… → 0.6587 — observed at sf0.1 on tx_quality). The oracle
    * twin is `round(CAST(x AS DECIMAL(28,12)), scale)::DOUBLE`. Generic
    * irrational-ish doubles (cosines, fused scores) never present short
    * boundary representations, so plain round stays fine there. */
  def roundExact(c: Column, scale: Int): Column =
    org.apache.spark.sql.functions
      .round(c.cast("decimal(28,12)"), scale).cast("double")
}
