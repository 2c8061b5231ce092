package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass grouped top-k (SURVEY §4: the custom `TopKByScore`
  * aggregator): keeps a bounded best-k list per group with deterministic
  * (score desc, id asc) ordering.
  *
  * Versus the `row_number over window` form: this is a true aggregate, so
  * Spark runs it with map-side PARTIAL aggregation — each input partition
  * reduces to ≤k rows per group before the shuffle, and merge combines two
  * k-lists. No per-group sort, no WindowExec buffering; the shuffle volume
  * is k·groups·partitions at worst, independent of input rows. The window
  * form stays the default in [[graft.operators.Knn]] (WindowGroupLimit
  * gets close and keeps everything in untyped codegen land); this is the
  * drop-in for very hot grouped-top-k paths and a reference implementation
  * of a typed Aggregator.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insert(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] =
    if (buf.size < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    insert(buf, in)

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    Encoders.kryo[Seq[(Long, Double)]]

  // a structural (not kryo) encoder so the untyped-udaf form yields a
  // real array<struct<_1,_2>> column that explode/getField can consume
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
