package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar functions over `array<float>` embedding columns.
  *
  * The reference delegates cosine distance to MariaDB's native
  * `VEC_DISTANCE_COSINE` (`/root/reference/nl_targeting.py:56`,
  * `/root/reference/camp_vec_rcmn.py:44`); Spark has no built-in array
  * cosine, so we provide two implementations:
  *
  *  1. [[cosineSim]] — pure `functions._` composition (zip_with/aggregate
  *     higher-order functions). Correct everywhere, no session setup, but
  *     higher-order functions are interpreted (not whole-stage-codegen'd).
  *  2. [[CosineSimilarity]] (see CosineSimilarityExpr.scala) — a native
  *     Catalyst `BinaryExpression` with `doGenCode`, registered by
  *     [[graft.Graft.init]]; this is the hot-path form used by KNN.
  *
  * All math is double-precision accumulated in element order, matching the
  * DuckDB oracle (`list_cosine_similarity` over `DOUBLE[]`).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ in double precision. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity = 1 − VEC_DISTANCE_COSINE (reference semantics,
    * `/root/reference/camp_vec_rcmn.py:44`). Portable higher-order-function
    * form; see [[graft.functions.CosineSimilarity]] for the codegen form. */
  def cosineSim(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    // zero-norm guard: ANSI mode (Spark 4 default) raises DIVIDE_BY_ZERO;
    // match the native expression's 0.0-for-degenerate-input semantics.
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dotProduct(a, b) / (na * nb))
  }

  /** Parse the reference's textual vector form `'[f1,f2,…]'`
    * (`str(embedding)` → `VEC_FromText`, `/root/reference/nl_targeting_save.py:135`,
    * `/root/reference/camp_vec_save.py:68`) into `array<float>`. */
  def vecFromText(s: Column): Column =
    transform(
      split(regexp_replace(s, "[\\[\\]\\s]", ""), ","),
      x => x.cast("float"))

  /** Serialize `array<float>` to the reference's text form. */
  def vecToText(a: Column): Column =
    concat(lit("["), array_join(a, ","), lit("]"))
}
