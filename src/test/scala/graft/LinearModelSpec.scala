package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinearModel

/** Bit-reproducible GD training: plain-Scala reference equality,
  * partitioning invariance, a genuinely decreasing training curve, and
  * hard-sigmoid boundary behavior. */
class LinearModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The trainer, independently coded on driver-side doubles — same
    * floor-scaled-long fold, sequential. */
  private def bruteGd(rows: Seq[(Double, Double, Double, Double)],
      lr: Double, iters: Int): Array[Double] = {
    val n = rows.length.toDouble
    var w = Array(0.0, 0.0, 0.0)
    for (_ <- 1 to iters) {
      val sums = Array(0L, 0L, 0L)
      rows.foreach { case (x0, x1, x2, y) =>
        val a = (x0 * w(0) + x1 * w(1) + x2 * w(2)) * 0.25 + 0.5
        val p = math.max(math.min(a, 1.0), 0.0)
        val act = if (a > 0.0 && a < 1.0) 1.0 else 0.0
        val base = (p - y) * 0.5 * act
        sums(0) += math.floor(base * x0 * 1e12).toLong
        sums(1) += math.floor(base * x1 * 1e12).toLong
        sums(2) += math.floor(base * x2 * 1e12).toLong
      }
      w = w.indices.map { j =>
        w(j) - lr * ((sums(j).toDouble / 1e12) / n)
      }.toArray
    }
    w
  }

  private def fixtureFeats(ids: Boolean = false) = {
    val ntok = size(split(trim(col("text")), "\\s+"))
    Tables.load(spark, TestSpark.sfDir, "documents").select(
      lit(1.0).as("x0"),
      (least(ntok, lit(100)).cast("double") / lit(100.0)).as("x1"),
      least(length(col("text")).cast("double") /
        (ntok * lit(10)).cast("double"), lit(2.0)).as("x2"),
      when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"))
  }

  test("distributed GD equals the sequential plain-Scala reference " +
      "bit-for-bit, and is partitioning-invariant") {
    val f = fixtureFeats()
    val rows = f.collect().map(r =>
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val ref = bruteGd(rows, lr = 0.5, iters = 4)
    val w32 = LinearModel.trainHardSigmoidGd(f.repartition(32),
      Seq("x0", "x1", "x2"), "y", lr = 0.5, iters = 4)
    val w1 = LinearModel.trainHardSigmoidGd(f.coalesce(1),
      Seq("x0", "x1", "x2"), "y", lr = 0.5, iters = 4)
    assert(w32.toSeq == ref.toSeq, s"${w32.toSeq} != ref ${ref.toSeq}")
    assert(w1.toSeq == w32.toSeq, "partitioning changed the weights")
  }

  test("training genuinely trains: loss decreases monotonically over " +
      "the unrolled steps on a separable synthetic set") {
    // y = 1 iff x1 large — linearly separable, so GD must make progress
    val rows = (0 until 400).map { i =>
      val x1 = (i % 20) / 20.0
      (1.0, x1, 0.5, if (x1 >= 0.5) 1.0 else 0.0)
    }
    val df = rows.toDF("x0", "x1", "x2", "y").repartition(8)
    val losses = (0 to 4).map { it =>
      val w = if (it == 0) Array(0.0, 0.0, 0.0)
        else LinearModel.trainHardSigmoidGd(df, Seq("x0", "x1", "x2"),
          "y", lr = 0.5, iters = it)
      LinearModel.loss(df, Seq("x0", "x1", "x2"), "y", w.toSeq)
    }
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss did not decrease: $losses")
    }
    // and the learned direction is the right one: weight on x1 positive
    val w = LinearModel.trainHardSigmoidGd(df, Seq("x0", "x1", "x2"),
      "y", lr = 0.5, iters = 4)
    assert(w(1) > 0, s"x1 weight should be positive, got ${w.toSeq}")
  }

  test("hard sigmoid clamps exactly at the ramp edges and hits the " +
      "0.5 midpoint") {
    val df = Seq(-3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0).toDF("z")
    val got = df.orderBy(col("z"))
      .select(LinearModel.hardSigmoid(col("z")).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.0, 0.0, 0.25, 0.5, 0.75, 1.0, 1.0),
      s"unexpected ramp values: $got")
  }
}
