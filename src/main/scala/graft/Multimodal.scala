package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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

  /** Real media-lake ingestion: a directory (or lake prefix) of media
    * files through Spark's `binaryFile` source, normalized to the
    * [[mediaSchema]] contract. media_id is the 64-bit xxhash of the full
    * path (stable across runs/executors — re-ingesting the same lake
    * yields the same ids, so downstream dedup/phash indexes stay
    * incremental); kind is derived from the extension.
    *
    * ID width: a 64-bit id collides at the birthday bound (~50% once the
    * lake holds ~2³² files) — at billions-of-files crawl scale that
    * silently merges distinct media in downstream dedup/phash state. The
    * `media_uid` column (128-bit: md5 of path + size) is emitted
    * alongside for lake-scale pipelines to key on; `media_id` stays the
    * compact join key for bounded corpora. Both are PATH-derived: a
    * moved/renamed file changes identity — content-addressed identity is
    * what [[phash]] / the dedup family provide downstream.
    *
    * Scale shape: `binaryFile` splits by FILE (each row is one whole
    * file, large files never straddle partitions), the glob prunes at
    * LISTING time (files that don't match are never opened), and the
    * payload column stays map-local — composing with [[extractFeatures]]
    * or [[phash]] adds no shuffle, exactly like the fixture-driven media
    * relations. Decode failures on a dirty lake are row-local when the
    * decoder uses the `*Opt` forms (see [[MediaCodecs.decodeImageOpt]]). */
  def readMediaDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame = {
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        // NUL separator between the hashed fields: without one,
        // ("img1", 23) and ("img", 123) both hash "img123" — a
        // concatenation-ambiguity collision in the very column meant
        // to be collision-resistant (paths cannot contain NUL)
        md5(concat(encode(col("path"), "UTF-8"),
          lit(Array[Byte](0)),
          encode(col("length").cast("string"), "UTF-8"))).as("media_uid"),
        when(ext.isin("png", "jpg", "jpeg", "bmp", "gif"), lit("image"))
          .when(ext.isin("wav"), lit("audio"))
          .otherwise(lit("binary")).as("kind"),
        col("content").as("payload"),
        ext.as("meta_format"))
  }

  /** The shared batched partition-local decode core of the strict and
    * `*Safe` forms: one decoder per partition, rows in batches, payload
    * bytes never leave their partition. `tolerant = true` drops a row
    * whose decode throws (NonFatal) instead of failing the task. */
  private def decodeRows(media: DataFrame, outSchema: StructType,
      batchSize: Int, tolerant: Boolean)(
      one: Row => Row): DataFrame = {
    val rdd = media.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          if (!tolerant) Some(one(r))
          else try Some(one(r))
          catch { case scala.util.control.NonFatal(_) => None }
        }
      }
    }
    media.sparkSession.createDataFrame(rdd, outSchema)
  }

  private def featureRow(media: DataFrame, decoder: Decoder): Row => Row = {
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    r => {
      val (w, h, f, feat) = decoder.decode(
        r.getString(kindIdx), r.getAs[Array[Byte]](payloadIdx))
      Row.fromSeq(r.toSeq ++ Seq(w, h, f, feat.toSeq))
    }
  }

  private def phashRow(media: DataFrame,
      decoder: PixelDecoder): Row => Row = {
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    r => Row(r.get(idIdx), dHash(decoder.decodeGray(
      r.getString(kindIdx), r.getAs[Array[Byte]](payloadIdx))))
  }

  private def phashSchema(media: DataFrame): StructType = StructType(Seq(
    media.schema("media_id"),
    StructField("phash", LongType, nullable = false)))

  /** Batched partition-local decode: the mapInPandas shape — one decoder
    * per partition, rows processed in batches, features appended columnar.
    * Payload bytes stay where they are; no shuffle. */
  def extractFeatures(media: DataFrame, decoder: Decoder,
      batchSize: Int = 64): DataFrame =
    decodeRows(media,
      StructType(media.schema.fields ++ featureSchema.fields),
      batchSize, tolerant = false)(featureRow(media, decoder))

  /** Perceptual-hash grid contract: [[PixelDecoder]] emits a row-major
    * `PhashGridRows × PhashGridCols` grayscale grid; [[dHash]] compares
    * horizontally-adjacent pixels, giving `rows · (cols − 1)` = 60 bits —
    * 60 (not 64) for the same reason as [[graft.operators.Dedup.SimhashBits]]:
    * the value stays a non-negative BIGINT both engines parse identically. */
  val PhashGridRows = 6
  val PhashGridCols = 11
  val PhashBits: Int = PhashGridRows * (PhashGridCols - 1)

  /** Grayscale decode boundary for perceptual hashing — a real
    * implementation wraps an image codec + resize-to-grid here. */
  trait PixelDecoder extends Serializable {
    /** @return row-major `PhashGridRows × PhashGridCols` pixel grid */
    def decodeGray(kind: String, payload: Array[Byte]): Array[Int]
  }

  /** STUB grayscale decode: the payload (utf-8 text in the fixture) is cut
    * into `rows·cols` even code-point slices and each cell's "pixel" is the
    * first-4-hex-digit value of its md5 — deterministic, locality-preserving
    * (an in-place byte edit perturbs exactly the cells covering it, the
    * stub analog of re-encode noise touching a few pixels), and re-derivable
    * bit-for-bit by the DuckDB oracle as
    * `('0x' || substr(md5(substr(text, …)), 1, 4))::BIGINT`. Slicing is by
    * code points to match DuckDB `substr` semantics beyond ASCII. */
  class StubPixelDecoder extends PixelDecoder {
    def decodeGray(kind: String, payload: Array[Byte]): Array[Int] = {
      val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      val n = PhashGridRows * PhashGridCols
      val cp = s.codePointCount(0, s.length)
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(n) { i =>
        val a = s.offsetByCodePoints(0, ((i.toLong * cp) / n).toInt)
        val b = s.offsetByCodePoints(0, (((i + 1).toLong * cp) / n).toInt)
        md.reset()
        val d = md.digest(s.substring(a, b)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        ((d(0) & 0xff) << 8) | (d(1) & 0xff) // == first 4 hex digits
      }
    }
  }

  /** 60-bit difference hash (dHash) of a decoded grid: bit `r·10 + c` is
    * set iff `px(r, c+1) > px(r, c)` — the standard gradient-sign
    * perceptual hash (row-wise brightness deltas survive re-encoding;
    * hamming distance between hashes ≈ fraction of gradients that
    * flipped). */
  def dHash(px: Array[Int]): Long = {
    require(px.length == PhashGridRows * PhashGridCols,
      s"expected ${PhashGridRows * PhashGridCols} pixels, got ${px.length}")
    var h = 0L
    var r = 0
    while (r < PhashGridRows) {
      var c = 0
      while (c < PhashGridCols - 1) {
        if (px(r * PhashGridCols + c + 1) > px(r * PhashGridCols + c))
          h |= 1L << (r * (PhashGridCols - 1) + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Content-derived perceptual hash over the binary payload: batched
    * partition-local decode → [[dHash]], same map-only shape as
    * [[extractFeatures]] — payload bytes never shuffle; only the 8-byte
    * hash (with the id) flows downstream into the banded pair join. */
  def phash(media: DataFrame, decoder: PixelDecoder,
      batchSize: Int = 64): DataFrame =
    decodeRows(media, phashSchema(media), batchSize, tolerant = false)(
      phashRow(media, decoder))

  /** Decode-tolerant twin of [[phash]] for dirty lakes: a payload whose
    * decode throws is DROPPED (row-local failure — a truncated JPEG in a
    * 100 TB crawl must cost one row, not a task retry storm; Spark
    * retries the whole task on an escaped exception, and four failures
    * kill the job). Same map-only shape; the survivors' hashes are
    * byte-identical to [[phash]]'s. */
  def phashSafe(media: DataFrame, decoder: PixelDecoder,
      batchSize: Int = 64): DataFrame =
    decodeRows(media, phashSchema(media), batchSize, tolerant = true)(
      phashRow(media, decoder))

  /** Decode-tolerant twin of [[extractFeatures]] — same row-drop contract
    * as [[phashSafe]]. */
  def extractFeaturesSafe(media: DataFrame, decoder: Decoder,
      batchSize: Int = 64): DataFrame =
    decodeRows(media,
      StructType(media.schema.fields ++ featureSchema.fields),
      batchSize, tolerant = true)(featureRow(media, decoder))

  /** Image near-dup pairs: banded pigeonhole join over [[phash]] values —
    * `bands > maxHamming` makes recall exact with NO all-pairs stage (see
    * [[graft.operators.Dedup.bandedHammingPairs]]); the default 4 bands of
    * 15 bits admit ~4·2⁻¹⁵ random-pair collisions, so candidate volume
    * stays ~|near-dups| even at corpus scale. Returns
    * (id_a, id_b, hamming). */
  def phashPairs(hashed: DataFrame, maxHamming: Int = 3, bands: Int = 4,
      idCol: String = "media_id", hashCol: String = "phash"): DataFrame =
    graft.operators.Dedup.bandedHammingPairs(
      hashed, idCol, hashCol, PhashBits, maxHamming, bands)

  /** Pure column-math twin of [[StubPixelDecoder]].decodeGray + [[dHash]]
    * over the payload TEXT: per-cell pixel = first-4-hex md5 of the cell's
    * text slice, bit r·(C−1)+c set when px(r,c+1) > px(r,c). This is the
    * engine-reproducibility contract the DuckDB oracles re-derive
    * (StreamingMultimodalSpec pins it equal to the JVM decoder on every
    * fixture row); use it when the hash must ride a codegen plan — e.g.
    * per-frame hashing after an explode — instead of a mapPartitions
    * decode pass. */
  def phashColumn(txt: Column): Column = {
    val n = PhashGridRows * PhashGridCols
    val len = length(txt)
    val pxArr = transform(sequence(lit(0), lit(n - 1)), i => {
      val start = floor(i * len / n).cast("int")
      val fin = floor((i + lit(1)) * len / n).cast("int")
      conv(substring(md5(encode(txt.substr(start + 1, fin - start), "UTF-8")),
        1, 4), 16, 10).cast("long")
    })
    val powers = array((0 until PhashBits).map(i => lit(1L << i)): _*)
    val bools = (px: Column) =>
      transform(sequence(lit(0), lit(PhashBits - 1)), i => {
        val base = floor(i / (PhashGridCols - 1)).cast("int") *
          PhashGridCols + pmod(i, lit(PhashGridCols - 1)).cast("int")
        element_at(px, base + 2) > element_at(px, base + 1)
      })
    // single expression: bind px via a one-element transform (no
    // intermediate column needed at call sites)
    element_at(transform(array(pxArr), px =>
      aggregate(zip_with(bools(px), powers,
          (b, p) => when(b, p).otherwise(0L)),
        lit(0L), (a, b) => a + b)), 1)
  }

  /** Deterministic per-(frame-scene) variant of a payload text: replace
    * ONE char at a scene-dependent position (same length — the
    * [[midCharVariant]] contract generalized), so frames inside a scene
    * decode identically and scene boundaries move a bounded number of
    * dHash cells. The fixture analog of a video whose content holds for a
    * few frames and then cuts. */
  def frameVariant(text: Column, scene: Column): Column = {
    val pos = pmod(scene * 7, greatest(length(text) - 1, lit(1))).cast("int")
    when(length(text) < 2, text)
      .otherwise(concat(text.substr(lit(1), pos), lit("~"),
        text.substr(pos + lit(2), length(text))))
  }

  /** Scene-change keyframe selection — the standard shot-boundary pass a
    * video ingestion pipeline runs before captioning/embedding: hash
    * every sampled frame (here the [[phashColumn]] stub-decode twin so
    * the whole pass is one codegen plan), compare each frame to its
    * predecessor per media (lag window), and flag frames whose hamming
    * distance jumps. Frame 0 is always a keyframe (hamming reported −1).
    *
    * Scale shape: bounded explode (n_frames per video), map-side
    * per-frame hashing — the payload column never shuffles; only
    * (media_id, frame, 8-byte hash) enters the lag window's single
    * media-partitioned shuffle. Input: `(media_id, text, n_frames)`.
    * Returns `(media_id, f, hamming, is_key)`. */
  def keyframes(videos: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = videos
      .repartition(videos.sparkSession.sparkContext.defaultParallelism)
      .select(col("media_id"), col("text"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("f"))
      .withColumn("scene", floor(col("f") / 5).cast("int"))
      .withColumn("ph", phashColumn(frameVariant(col("text"), col("scene"))))
    val w = Window.partitionBy(col("media_id")).orderBy(col("f"))
    frames.withColumn("prev", lag(col("ph"), 1).over(w))
      .select(col("media_id"), col("f"),
        when(col("prev").isNull, lit(-1))
          .otherwise(bit_count(col("ph").bitwiseXOR(col("prev"))))
          .cast("int").as("hamming"),
        (col("prev").isNull ||
          col("ph").bitwiseXOR(col("prev")) =!= 0L).as("is_key"))
  }

  /** Deterministic re-encode-noise variant of a payload text: one
    * code-point substitution at the midpoint — same length, so the
    * [[StubPixelDecoder]] cell boundaries are unchanged and exactly one
    * cell's pixel moves (≤ 2 dHash bits). The fixture analog of saving the
    * same image twice with different encoder settings.
    *
    * The same-length/≤2-bit contract needs at least 2 chars to substitute
    * around; empty and 1-char payloads pass through unchanged (r8
    * advisory: the naive concat would GROW an empty string to "~"). */
  def midCharVariant(text: Column): Column = {
    val half = floor(length(text) / 2).cast("int")
    when(length(text) < 2, text)
      .otherwise(concat(text.substr(lit(1), half), lit("~"),
        text.substr(half + lit(2), length(text))))
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
