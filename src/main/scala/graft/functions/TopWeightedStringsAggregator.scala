package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k STRING selection by weight — the hot-key-safe
  * replacement for `collect_set` over a power-law key (r18 verdict #2:
  * `tx_anchor_corpus` collected every distinct anchor text per
  * destination URL into one aggregation buffer; in-link distributions
  * are power-law, so the hottest page's buffer is millions of strings —
  * the exact state bomb `Dedup.capBuckets` kills elsewhere).
  *
  * Keeps the k best `(value, weight)` pairs under the deterministic
  * total order (weight desc, value asc) — the [[TopKAggregator]]
  * discipline, values as strings. As a true Aggregator it runs with
  * map-side PARTIAL aggregation: each input partition reduces to ≤k
  * pairs per group before the shuffle and `merge` combines two k-lists,
  * so per-group state is O(k · max-string) regardless of how many
  * distinct values the group carries. Feed it EXACT per-(group, value)
  * weights (a prior count aggregation) and the selected top-k is exact.
  *
  * CONTRACT: input values are NON-NULL (the tiebreak compares them
  * with the string ordering, which has no null). `Web.anchorCorpus` —
  * the operator that feeds this — filters null anchors before its
  * count agg (r19 ADVICE #2); any new caller must do the same.
  */
class TopWeightedStringsAggregator(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: (String, Long), b: (String, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insert(buf: Seq[(String, Long)],
      x: (String, Long)): Seq[(String, Long)] =
    if (buf.size < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  override def zero: Seq[(String, Long)] = Vector.empty

  override def reduce(buf: Seq[(String, Long)],
      in: (String, Long)): Seq[(String, Long)] = insert(buf, in)

  override def merge(a: Seq[(String, Long)],
      b: Seq[(String, Long)]): Seq[(String, Long)] = b.foldLeft(a)(insert)

  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    Encoders.kryo[Seq[(String, Long)]]

  // structural encoder: the untyped-udaf form yields a real
  // array<struct<_1,_2>> column that transform/getField can consume
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
