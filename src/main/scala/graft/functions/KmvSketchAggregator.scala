package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** k-minimum-values (bottom-k / theta-style) distinct-value sketch over
  * long keys — the set-INTERSECTION sketch the HLL family cannot be
  * (public algorithm: Beyer et al., "On Synopses for Distinct Value
  * Estimation under Multiset Operations", SIGMOD 2007; the theta-sketch
  * generalization is Dasgupta et al. 2016). Each key hashes to a
  * uniform 63-bit value; the sketch keeps the k smallest DISTINCT
  * hashes. Because the retained region [0, θ) is a uniform sample of
  * the key space shared by every sketch built with the same hash,
  * sketches INTERSECT meaningfully: count the common hashes below the
  * smaller θ and divide by θ — an estimate whose error is RELATIVE TO
  * THE OVERLAP (∝ √(overlap·θ)⁻¹), where HLL inclusion-exclusion error
  * is absolute in the big-set sizes. Below k distinct values the
  * sketch holds every hash and all estimates are EXACT.
  *
  * Merge is set-union-then-truncate — associative and commutative, so
  * the aggregation is partial-aggregable map-side like any monoid.
  * The hash is a fixed splitmix64 finalizer: deterministic across
  * runs, sessions, and engines, which makes sketch-gated oracles
  * reproducible. Sketch size is k longs (32 KB at k = 4096) —
  * persistable next to the data like any manifest. */
class KmvSketchAggregator(k: Int)
    extends Aggregator[Long, KmvSketchAggregator.Buf, Array[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: KmvSketchAggregator.Buf =
    new KmvSketchAggregator.Buf(k)

  override def reduce(b: KmvSketchAggregator.Buf,
      key: Long): KmvSketchAggregator.Buf = {
    b.add(KmvSketchAggregator.hash63(key)); b
  }

  override def merge(a: KmvSketchAggregator.Buf,
      b: KmvSketchAggregator.Buf): KmvSketchAggregator.Buf = {
    a.addAll(b); a
  }

  override def finish(b: KmvSketchAggregator.Buf): Array[Long] =
    b.sortedValues

  override def bufferEncoder: Encoder[KmvSketchAggregator.Buf] =
    Encoders.javaSerialization[KmvSketchAggregator.Buf]

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketchAggregator {

  /** Bounded buffer: the k smallest distinct 63-bit hashes seen. */
  final class Buf(val k: Int) extends Serializable {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def add(h: Long): Unit =
      if (set.size < k) { set.add(h); () }
      else if (h < set.last) { set.add(h); if (set.size > k) set.pollLast(); () }

    def addAll(o: Buf): Unit = {
      val it = o.set.iterator()
      while (it.hasNext) add(it.next())
    }

    def sortedValues: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  private val TwoTo63 = math.pow(2.0, 63)

  /** splitmix64 finalizer — fixed, uniform, engine-independent; top bit
    * cleared so natural signed ordering equals unsigned ordering. */
  def hash63(key: Long): Long = {
    var z = key + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) >>> 1
  }

  /** Normalized threshold θ ∈ (0, 1]: the sketch retains every hash in
    * [0, θ·2⁶³). A sketch holding fewer than k values retains ALL of
    * its set's hashes (θ = 1 — estimates are exact). */
  def theta(sketch: Seq[Long], k: Int): Double =
    if (sketch.length < k) 1.0 else sketch.last.toDouble / TwoTo63

  /** Distinct-count estimate: exact below k, else the standard
    * (k−1)/u₍ₖ₎ unbiased KMV estimator. */
  def estimateDistinct(sketch: Seq[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / theta(sketch, k)

  /** Intersection estimate: common hashes below min(θ_a, θ_b), scaled
    * by 1/θ — unbiased, with error relative to the overlap. */
  def estimateIntersection(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val th = math.min(theta(a, k), theta(b, k))
    val cut = th * TwoTo63
    val bs = b.toSet
    val common = a.count(h => h < cut && bs.contains(h))
    common.toDouble / th
  }

  /** Union estimate: bottom-k of the merged distinct hash sets. */
  def estimateUnion(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val merged = (a ++ b).distinct.sorted.take(k)
    estimateDistinct(merged, k)
  }
}
