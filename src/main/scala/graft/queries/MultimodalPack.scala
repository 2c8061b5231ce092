package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Multimodal, Tables}

/** Multimodal-column plumbing as driver-checkable queries. The decode step
  * itself is the stubbed external boundary (see [[graft.Multimodal]]); what
  * IS relational — binary payload handling, typed metadata, deterministic
  * frame-sample planning — runs here as pure column math with a full DuckDB
  * oracle. Payload bytes never shuffle: every derived column is map-only.
  */
object MultimodalPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Media metadata + frame-sampling plan: payloads as opaque binary,
    // byte-length metadata, every-5th-frame sampling capped at 4 — all
    // codegen'd column expressions over the binary column.
    "mm_frame_plan" -> ((s, dir) => {
      val media = Multimodal
        .mediaFromDocuments(Tables.load(s, dir, "documents"))
        .withColumn("n_bytes", length(col("payload")))
        // stand-in frame count from metadata only (a real pipeline reads
        // this from the container header; the decode stub stays external)
        .withColumn("n_frames",
          when(col("kind") === "video", (pmod(col("n_bytes"), lit(30)) + 1))
            .otherwise(lit(1)).cast("int"))
      media.select(col("media_id"), col("kind"), col("n_bytes"),
          col("n_frames"),
          array_join(transform(
            Multimodal.frameSamplePlan(media),
            f => f.cast("string")), "|").as("frame_plan"))
        .orderBy(col("media_id"))
    }),

    // Audio chunking plan: overlapping 30s windows (5s overlap) over a
    // metadata-derived duration — the fan-out plan a transcription
    // pipeline distributes on, as pure column math; chunks render as
    // "start-end|start-end" for the oracle.
    "mm_chunk_plan" -> ((s, dir) => {
      val media = Multimodal
        .mediaFromDocuments(Tables.load(s, dir, "documents"))
        .filter(col("kind") === "audio")
        .withColumn("duration_sec",
          (pmod(length(col("payload")), lit(120)) + 1).cast("int"))
      media.select(col("media_id"), col("duration_sec"),
          array_join(transform(
            Multimodal.chunkPlan(col("duration_sec")),
            c => concat_ws("-", c.getField("start"), c.getField("end"))),
            "|").as("chunks"))
        .orderBy(col("media_id"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "mm_frame_plan" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
        |    octet_length(encode(text)) AS n_bytes
        |  FROM documents),
        |m AS (
        |  SELECT *, CASE WHEN kind = 'video'
        |    THEN CAST(n_bytes % 30 + 1 AS INTEGER) ELSE 1 END AS n_frames
        |  FROM media)
        |SELECT media_id, kind, CAST(n_bytes AS INTEGER) AS n_bytes, n_frames,
        |  CASE WHEN kind = 'video'
        |    THEN array_to_string(list_transform(
        |      range(0, n_frames, 5), x -> CAST(x AS VARCHAR))[1:4], '|')
        |    ELSE '0' END AS frame_plan
        |FROM m ORDER BY media_id""".stripMargin,

    // Same window arithmetic re-derived: n = max(ceil((dur-5)/25), 1)
    // chunks, start = 25·i, end clipped to the duration.
    "mm_chunk_plan" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
        |    octet_length(encode(text)) AS n_bytes
        |  FROM documents),
        |a AS (
        |  SELECT media_id, CAST(n_bytes % 120 + 1 AS INTEGER) AS duration_sec,
        |    greatest(CAST(floor((n_bytes % 120 + 1 - 5 + 24) / 25.0) AS INTEGER), 1) AS n
        |  FROM media WHERE kind = 'audio')
        |SELECT media_id, duration_sec,
        |  array_to_string(list_transform(range(0, n),
        |    i -> CAST(25 * i AS VARCHAR) || '-' ||
        |         CAST(least(25 * i + 30, duration_sec) AS VARCHAR)), '|')
        |    AS chunks
        |FROM a ORDER BY media_id""".stripMargin
  )
}
