package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode/feature-extract as
  * batched partition-local transforms.
  *
  * The media codecs themselves are NOT in this container, so [[StubDecoder]]
  * is a clearly-marked deterministic fake — but everything Spark-side is
  * real and tested: the schema contract, the binary column handling, the
  * batched mapPartitions shape (the Scala analog of a Pandas-UDF
  * `mapInPandas` pipeline), and the partitioning story (payload bytes never
  * shuffle: decode is map-only; only the small extracted features flow into
  * joins/aggregations downstream).
  */
object Multimodal {

  /** Media row contract: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),    // image|audio|video
    StructField("payload", BinaryType, nullable = false), // opaque bytes
    StructField("meta_format", StringType, nullable = true)))

  /** Extracted-feature contract appended by [[extractFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Decoder boundary — a real implementation would wrap an image/audio
    * library here. Batched like an inference client would be. */
  trait Decoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float])
  }

  /** STUB: deterministic fake decode (dimensions and features derived from
    * the payload bytes only — no codec in this container). The Spark
    * plumbing around it is production-shaped. */
  class StubDecoder(featDim: Int = 8) extends Decoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val h = java.util.Arrays.hashCode(payload)
      val w = 16 + math.abs(h % 512)
      val ht = 16 + math.abs((h / 512) % 512)
      val frames = if (kind == "video") 1 + math.abs(h % 30) else 1
      val feat = Array.tabulate(featDim)(i =>
        ((math.abs(h * 31 + i * 7) % 1000) / 500.0f) - 1.0f)
      (w, ht, frames, feat)
    }
  }

  /** Derive a deterministic media table from `documents` (payload = utf-8
    * bytes of the text — a stand-in for real blobs, keeping everything
    * fixture-driven). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("stub/v1").as("meta_format"))

  /** Batched partition-local decode: the mapInPandas shape — one decoder
    * per partition, rows processed in batches, features appended columnar.
    * Payload bytes stay where they are; no shuffle. */
  def extractFeatures(media: DataFrame, decoder: Decoder,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ featureSchema.fields)
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, f, feat) = decoder.decode(
            r.getString(kindIdx), r.getAs[Array[Byte]](payloadIdx))
          Row.fromSeq(r.toSeq ++ Seq(w, h, f, feat.toSeq))
        }
      }
    }
    media.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Deterministic frame sampling plan for video rows: every `stride`-th
    * frame index, capped — pure column math, no decode needed. */
  def frameSamplePlan(media: DataFrame, stride: Int = 5, maxFrames: Int = 4): Column =
    when(col("kind") === "video",
      slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), lit(1), lit(maxFrames)))
      .otherwise(array(lit(0)))

  /** Overlapping-window chunk plan for audio rows — the fan-out plan a
    * transcription pipeline runs BEFORE any decode: `chunkSec`-second
    * windows advancing by `chunkSec − overlapSec`, covering
    * `[0, durationSec)`; the last chunk is clipped to the duration.
    * Pure column math (`sequence` + `transform` over a handful of chunk
    * indices per row — the plan, not the audio, so the per-row array is
    * bounded by duration/stride); the decode stays behind the external
    * [[Decoder]] boundary. Returns `array<struct<start:int, end:int>>`;
    * durations ≤ `overlapSec` still get one `[0, duration)` chunk. */
  def chunkPlan(durationSec: Column, chunkSec: Int = 30,
      overlapSec: Int = 5): Column = {
    val stride = chunkSec - overlapSec
    // ceil((dur - overlap) / stride) via floor((x + stride - 1) / stride);
    // integer inputs are exact in double
    val n = greatest(
      floor((durationSec - overlapSec + stride - 1).cast("double") / stride)
        .cast("int"),
      lit(1))
    transform(sequence(lit(0), n - 1), i =>
      struct((i * stride).as("start"),
        least(i * stride + chunkSec, durationSec).cast("int").as("end")))
  }
}
