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
  * persisted per segment by [[graft.operators.Sketches.kmvSketch]] and
  * merged/intersected FROM STORAGE, the same save-then-maintain
  * contract the HLL path (`tx_profile_sketch`) honors.
  *
  * Input is boxed (`java.lang.Long`) so SQL NULL keys reach [[reduce]]
  * as `null` and are SKIPPED — the unboxed form would default NULL to
  * `0L` and insert a phantom member (r11 advice). The buffer is an
  * amortized flat `Array[Long]` (kryo-encoded primitives, ~2k·8 bytes)
  * rather than a java-serialized boxed TreeSet: adds are O(1) amortized
  * with an O(2k·log 2k) sort-dedupe-truncate compaction when the
  * scratch region fills, so many-segment fan-outs pay array copies, not
  * per-element boxing + comparator hops. */
class KmvSketchAggregator(k: Int)
    extends Aggregator[java.lang.Long, KmvSketchAggregator.Buf, Array[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: KmvSketchAggregator.Buf =
    new KmvSketchAggregator.Buf(k)

  override def reduce(b: KmvSketchAggregator.Buf,
      key: java.lang.Long): KmvSketchAggregator.Buf = {
    if (key != null) b.add(KmvSketchAggregator.hash63(key.longValue))
    b
  }

  override def merge(a: KmvSketchAggregator.Buf,
      b: KmvSketchAggregator.Buf): KmvSketchAggregator.Buf = {
    a.addAll(b); a
  }

  override def finish(b: KmvSketchAggregator.Buf): Array[Long] =
    b.sortedValues

  override def bufferEncoder: Encoder[KmvSketchAggregator.Buf] =
    Encoders.kryo[KmvSketchAggregator.Buf]

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketchAggregator {

  /** Bounded buffer: the k smallest distinct 63-bit hashes seen.
    *
    * Layout: `arr[0, kept)` is sorted distinct (the survivors of the
    * last compaction, ≤ k of them); `arr[kept, n)` is an unsorted
    * scratch region of candidates, each strictly below the admission
    * threshold (= the kth smallest distinct at last compaction, or +∞
    * until k distincts have been seen). Compaction sorts, dedupes and
    * truncates to k; candidates it discards were ≥ the true kth
    * smallest distinct, so the sketch is exact vs the TreeSet form. */
  final class Buf(val k: Int) extends Serializable {
    private var arr = new Array[Long](math.max(4, 2 * k))
    private var kept = 0 // sorted-distinct prefix length
    private var n = 0 // total occupied length (prefix + scratch)
    private var threshold = Long.MaxValue // admit h iff h < threshold

    def add(h: Long): Unit = if (h < threshold) {
      if (n == arr.length) compact()
      if (h < threshold) { arr(n) = h; n += 1 }
    }

    def addAll(o: Buf): Unit = {
      var i = 0
      while (i < o.n) { add(o.arr(i)); i += 1 }
    }

    private def compact(): Unit = {
      java.util.Arrays.sort(arr, 0, n)
      var w = 0
      var i = 0
      while (i < n && w < k) {
        if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
        i += 1
      }
      kept = w
      n = w
      if (w == k) threshold = arr(k - 1)
    }

    def sortedValues: Array[Long] = {
      compact()
      java.util.Arrays.copyOfRange(arr, 0, n)
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

  /** Merge persisted sketch ARRAYS (union-then-truncate) — the
    * storage-side twin of [[Buf.addAll]]: feeding saved bottom-k arrays
    * back through this equals having sketched the union directly
    * (mergeable-summaries contract), so per-segment sketches written at
    * batch time answer cross-batch overlap questions with no re-scan. */
  def mergeSketch(a: Seq[Long], b: Seq[Long], k: Int): Array[Long] =
    (a ++ b).distinct.sorted.take(k).toArray
}
