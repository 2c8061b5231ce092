package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable bloom-filter aggregation over long keys, built on Spark's
  * public sketch library (`org.apache.spark.util.sketch.BloomFilter` —
  * the same filter `DataFrameStatFunctions.bloomFilter` and the
  * runtime row-level-filtering rewrite use; the `bloom_filter_agg` SQL
  * function those use internally is not registered for user queries, so
  * the typed [[Aggregator]] is the public-API way to get a PER-GROUP
  * bloom). Output is the filter's serialized bytes — persistable next
  * to the data like any manifest, readable back with
  * `BloomFilter.readFrom`.
  *
  * Merge is bitwise OR (the sketch library's `mergeInPlace`), so the
  * aggregation is associative+commutative — partial-aggregable
  * map-side like any monoid. */
class BloomFilterAggregator(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(b: BloomFilter, key: Long): BloomFilter = {
    b.putLong(key); b
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }

  override def finish(b: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomFilterAggregator {
  /** Deserialize a [[finish]]ed filter. */
  def fromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
