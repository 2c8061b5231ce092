package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a linear classifier by full-batch gradient
  * descent — the quality-filter seam of a training-data pipeline made
  * REAL and deterministic (the reference delegates scoring to an
  * external model API, `camp_vec_rcmn.py`; pipeline-side filters like
  * CCNet/Gopher-style quality models are linear probes over surface
  * features, trained exactly like this).
  *
  * Determinism is the whole design: the activation is the HARD sigmoid
  * `clamp(0.25·z + 0.5, 0, 1)` — piecewise-linear, so the forward pass,
  * the derivative indicator, and the squared-loss gradient are all
  * `+ · < clamp` IEEE operations both engines execute identically (a
  * `exp`-based sigmoid differs in the last ulp across libm
  * implementations and would break the cross-engine hash). Per-row
  * gradient contributions are floor-scaled to 1e12 longs before
  * summing (the [[Graph]] PageRank convention), so the reduction is
  * associative bit-for-bit and the learned weights are
  * partitioning-invariant — the DuckDB oracle re-derives every
  * iteration's weights EXACTLY, a hash gate most distributed training
  * loops cannot offer.
  *
  * Scale shape: one partial-aggregable scan per iteration (the only
  * shuffle is |features| longs), weights are driver-side scalars
  * broadcast into the next iteration's expressions; iteration count is
  * fixed and small. At 100 TB this is the standard "linear probe over
  * cheap features" loop — each epoch costs one codegen pass over the
  * corpus, nothing materializes.
  */
object LinearModel {

  /** The hard-sigmoid forward pass for a fixed weight vector:
    * `z = ((x0·w0 + x1·w1) + x2·w2) …` (left fold — the association
    * order is part of the cross-engine contract). */
  def forward(featureCols: Seq[String], w: Seq[Double]): Column = {
    require(featureCols.length == w.length, "weights/features mismatch")
    val z = featureCols.zip(w).map { case (c, wj) => col(c) * lit(wj) }
      .reduceLeft(_ + _)
    hardSigmoid(z)
  }

  /** `clamp(0.25·z + 0.5, 0, 1)`. */
  def hardSigmoid(z: Column): Column =
    greatest(least(z * lit(0.25) + lit(0.5), lit(1.0)), lit(0.0))

  /** Train by `iters` full-batch GD steps on squared loss
    * `Σ (σ(z) − y)²` with the hard-sigmoid σ; `labelCol` must be
    * 0.0/1.0 doubles, features non-null doubles. Returns the learned
    * weights (init 0, so iteration 0's forward pass is the 0.5
    * constant — every run reproduces the identical trajectory). */
  def trainHardSigmoidGd(df: DataFrame, featureCols: Seq[String],
      labelCol: String, lr: Double = 0.5, iters: Int = 4): Array[Double] = {
    require(iters >= 1 && featureCols.nonEmpty, "bad training shape")
    val n = df.count().toDouble
    require(n > 0, "training on an empty relation")
    var w = Array.fill(featureCols.length)(0.0)
    for (_ <- 1 to iters) {
      val z = featureCols.zip(w).map { case (c, wj) => col(c) * lit(wj) }
        .reduceLeft(_ + _)
      val a = z * lit(0.25) + lit(0.5)
      val p = greatest(least(a, lit(1.0)), lit(0.0))
      // σ' = 0.25 strictly inside the ramp, 0 on the saturated flats —
      // folded with the squared-loss 2 into the 0.5 factor below
      val active = (a > lit(0.0) && a < lit(1.0)).cast("double")
      val base = (p - col(labelCol)) * lit(0.5) * active
      val aggs = featureCols.zipWithIndex.map { case (c, j) =>
        sum(floor(base * col(c) * lit(1e12)).cast("long")).as(s"g$j") }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      w = w.indices.map { j =>
        val g = row.getLong(j).toDouble / 1e12
        w(j) - lr * (g / n)
      }.toArray
    }
    w
  }

  /** Squared loss of a weight vector over the relation, floor-scaled
    * the same way (bit-reproducible) — the training-curve probe. */
  def loss(df: DataFrame, featureCols: Seq[String], labelCol: String,
      w: Seq[Double]): Double = {
    val p = forward(featureCols, w)
    val e = p - col(labelCol)
    df.agg(sum(floor(e * e * lit(1e12)).cast("long")).as("l"))
      .head().getLong(0).toDouble / 1e12
  }
}
