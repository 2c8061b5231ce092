package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** PCA rotation (OPQ non-parametric init): orthogonality + cosine
  * preservation, covariance diagonalization, codegen participation of
  * the MatVec kernel, and build determinism. */
class PcaPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def collectVecs(df: org.apache.spark.sql.DataFrame,
      vecCol: String): Array[Array[Float]] =
    df.select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  test("Lloyd builders free their fit-slice checkpoint blocks eagerly " +
      "(no persistent-RDD leak per build — the r11 GC-churn suspect)") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Ann.buildPqCodebookLloyd(e, m = 16, ksub = 16, maxIter = 2)
    Ann.buildIvfKMeansLloyd(e, numCentroids = 8, maxIter = 2)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty,
      s"fit-slice checkpoint blocks leaked: RDD ids $leaked")
  }

  test("JL projection: deterministic Rademacher entries, bounded norm " +
      "distortion on real vectors, and full-overfetch search equals " +
      "exact top-k") {
    val dIn = 64; val dOut = 16
    val p1 = Ann.buildJlProjection(dIn, dOut)
    val p2 = Ann.buildJlProjection(dIn, dOut)
    assert(p1.sameElements(p2), "projection not deterministic")
    val s = (1.0 / math.sqrt(dOut.toDouble)).toFloat
    assert(p1.forall(v => v == s || v == -s), "non-Rademacher entry")
    assert(p1.count(_ > 0) > p1.length / 4 &&
      p1.count(_ < 0) > p1.length / 4, "signs badly unbalanced")
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    // norm preservation in expectation: per-vector squared-norm ratio
    // should concentrate around 1 (JL lemma); generous gate at d'=16
    val vecs = collectVecs(e.limit(50), "embedding")
    val proj = collectVecs(
      Ann.projectJl(e.limit(50), p1, dIn, dOut)
        .select(col("jlvec").as("v")), "v")
    val ratios = vecs.zip(proj).map { case (x, px) =>
      val nx = x.map(v => v.toDouble * v).sum
      val np = px.map(v => v.toDouble * v).sum
      if (nx == 0) 1.0 else np / nx
    }
    val medianRatio = ratios.sorted.apply(ratios.length / 2)
    assert(medianRatio > 0.5 && medianRatio < 2.0,
      s"median norm ratio $medianRatio way off 1")
    // candidates ⊇ corpus -> the exact rescore IS exact top-k
    val n = e.count().toInt
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val idx = Ann.projectJl(e, p1, dIn, dOut)
      .select(col("vec_id"), col("jlvec"))
    val all = Ann.searchJl(e, idx, p1, dIn, dOut, q, k = 10,
        overfetch = n / 10 + 1)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val exact = graft.operators.Knn.topK(e, q, k = 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(all == exact, "full-overfetch JL search != exact top-k")
  }

  test("buildPcaRotation is orthogonal, cosine-preserving, and " +
      "deterministic across builds") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val rot = Ann.buildPcaRotation(e, m = 16)
    val d = 64
    assert(rot.length == d * d)
    // R·Rᵀ = I within float tolerance
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      for (t <- 0 until d) s += rot(i * d + t).toDouble * rot(j * d + t)
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(s - want) < 2e-3, s"RRt[$i,$j] = $s")
    }
    // cosine invariance on real pairs
    val orig = collectVecs(e.orderBy(col("vec_id")).limit(6), "embedding")
    val rotd = collectVecs(Ann.rotate(e, rot).orderBy(col("vec_id"))
      .limit(6), "embedding")
    for (i <- 0 until 5) {
      val c0 = cos(orig(i), orig(i + 1))
      val c1 = cos(rotd(i), rotd(i + 1))
      assert(math.abs(c0 - c1) < 1e-4, s"cos drifted: $c0 vs $c1")
    }
    // determinism: decimal-summed covariance + LAPACK on the same
    // matrix + a deterministic greedy — bit-identical rotation
    val rot2 = Ann.buildPcaRotation(e, m = 16)
    assert(rot.sameElements(rot2), "rotation not deterministic")
  }

  test("the rotation diagonalizes the corpus covariance (off-diagonal " +
      "mass collapses — the property that decorrelates PQ subspaces)") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val rot = Ann.buildPcaRotation(e, m = 16)
    def covStats(vecs: Array[Array[Float]]): (Double, Double) = {
      val d = vecs.head.length; val n = vecs.length
      val mu = Array.tabulate(d)(i => vecs.map(_(i).toDouble).sum / n)
      var diag = 0.0; var off = 0.0
      for (i <- 0 until d; j <- i until d) {
        var s = 0.0
        vecs.foreach(v => s += (v(i) - mu(i)) * (v(j) - mu(j)))
        val c = math.abs(s / n)
        if (i == j) diag += c else off += c
      }
      (diag, off)
    }
    val (d0, o0) = covStats(collectVecs(e, "embedding"))
    val (d1, o1) = covStats(collectVecs(Ann.rotate(e, rot), "embedding"))
    // total variance is rotation-invariant; off-diagonal mass must drop
    // to numerical noise (float rotation: well under 2% of the original)
    assert(math.abs(d0 - d1) / d0 < 1e-3, s"trace drifted: $d0 vs $d1")
    assert(o1 < o0 * 0.02, s"off-diagonal mass $o1 vs original $o0")
  }

  test("MatVecFloat participates in whole-stage codegen and equals a " +
      "driver-side matvec") {
    import org.apache.spark.sql.execution.debug._
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val rot = Ann.buildPcaRotation(e, m = 16)
    val scan = Ann.rotate(e, rot).select(col("embedding"))
    val gen = codegenString(scan.queryExecution.executedPlan)
    assert(gen.contains("graft.functions.MatVecUtil.apply"), gen.take(500))
    val d = 64
    val orig = collectVecs(e.orderBy(col("vec_id")).limit(3), "embedding")
    val got = collectVecs(Ann.rotate(e, rot).orderBy(col("vec_id"))
      .limit(3), "embedding")
    for (r <- 0 until 3; i <- 0 until d) {
      var acc = 0.0
      for (j <- 0 until d) acc += rot(i * d + j).toDouble * orig(r)(j)
      assert(got(r)(i) == acc.toFloat, s"row $r dim $i: ${got(r)(i)} vs $acc")
    }
  }
}
