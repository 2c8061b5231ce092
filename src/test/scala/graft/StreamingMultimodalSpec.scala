package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

class StreamingMultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming hourly counts equal the batch rollup on the same data") {
    import spark.implicits._
    val batch = Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("ts"), col("event_type"), col("value"))
    val expected = EventStream.hourlyCounts(batch)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet

    val input = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val streamDf = input.toDF().toDF("ts", "event_type", "value")
    val query = EventStream.hourlyCounts(streamDf)
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("complete").start()
    try {
      input.addData(batch.collect().map(r =>
        (r.getTimestamp(0), r.getString(1), r.getDouble(2))).toSeq)
      query.processAllAvailable()
      val got = spark.table("hourly_test")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == expected && got.nonEmpty)
    } finally query.stop()
  }

  test("foreachBatch ingestion dedup: the stream really runs in multiple " +
      "micro-batches and its final state equals the batch GROUP BY twin") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_spec").toString
    d.repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(tmp)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = EventStream.ingestDedupExact(spark, tmp, d.schema,
        onBatch = batches += _)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // maxFilesPerTrigger=1 over 4 files → one micro-batch per file; a
    // single-batch run would make the fold trivially correct without
    // testing cross-batch state merging
    assert(batches.distinct.size >= 4,
      s"expected >=4 micro-batches, saw ${batches.distinct.size}")
    val want = d.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("streaming media ingest: real PNG decodes run per micro-batch " +
      "(>=4 batches) and the phash-dedup fixed point equals the batch " +
      "twin computed with the same codec in one shot") {
    val media = spark.createDataFrame(
      (0L until 40L).map { i =>
        // 10 distinct grids, 4 copies each → n_copies = 4 per hash. The
        // contents must differ EVERYWHERE (every token carries the group
        // tag): dHash is locality-preserving by design, so texts that
        // differ in one character legitimately hash equal — near-dup
        // recall, not a bug — and a 1-char fixture collapses groups.
        val g = i % 10
        val grid = MediaCodecs.mdGrid256(
          (0 until 70).map(j => s"w${g * 71 + j * 13}").mkString(" "))
        (i, "image", MediaCodecs.encodeGrayPng(
          Multimodal.PhashGridCols, Multimodal.PhashGridRows, grid))
      }).toDF("media_id", "kind", "payload")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_media_spec").toString
    media.repartitionByRange(4, col("media_id"))
      .write.mode("overwrite").parquet(tmp)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      val got = EventStream.ingestMediaPhash(spark, tmp, media.schema,
          onBatch = batches += _)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(batches.distinct.size >= 4,
        s"expected >=4 micro-batches, saw ${batches.distinct.size}")
      val want = Multimodal
        .phash(media, new MediaCodecs.ImageIoPixelDecoder)
        .groupBy(col("phash"))
        .agg(min(col("media_id")).as("media_id"),
          count(lit(1)).as("n_copies"))
        .select(col("media_id"), col("phash"), col("n_copies"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == want && got.nonEmpty)
      // the dedup really deduped: 10 hashes, 4 copies each, reps 0..9
      assert(got.size == 10 && got.forall(_._3 == 4L))
      assert(got.map(_._1) == (0L until 10L).toSet)
    } finally EventStream.deleteDir(tmp)
  }

  test("streamFoldExact: the summary fold really crosses micro-batches, " +
      "its fixed point equals the one-shot batch histogram, and zero " +
      "batches returns the init unchanged") {
    import spark.implicits._
    import graft.operators.Sketches
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("lang"), col("doc_id"), (col("n_chars") % 100).as("n"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_fold_spec").toString
    d.repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(tmp)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      val got = EventStream.streamFoldExact(spark, tmp, d.schema, None,
          (st, b) => {
            val bh = Sketches.histogram(b, Seq("lang"), "n", 0L, 10L, 10)
            st.fold(bh)(Sketches.mergeHistograms(_, bh, Seq("lang")))
          }, onBatch = batches += _)
        .get.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(batches.distinct.size >= 4,
        s"expected >=4 micro-batches, saw ${batches.distinct.size}")
      val want = Sketches.histogram(d, Seq("lang"), "n", 0L, 10L, 10)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want && got.nonEmpty)
      // zero-batch source: init passes through; no-init returns None
      val empty = java.nio.file.Files
        .createTempDirectory("graft_stream_fold_empty").toString
      try {
        val init = Seq(("xx", 0L, 1L)).toDF("lang", "bin", "cnt")
        val out = EventStream.streamFoldExact(spark, empty, d.schema,
          Some(init), (st, b) => st.get)
        assert(out.get.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
          Seq(("xx", 0L, 1L)))
        assert(EventStream.streamFoldExact(spark, empty, d.schema,
          None, (st, b) => b).isEmpty)
      } finally EventStream.deleteDir(empty)
    } finally EventStream.deleteDir(tmp)
  }

  test("streamed KMV sketch state: the 4-micro-batch fold's final state " +
      "bit-equals the one-shot sketch of the whole stream (merge = " +
      "sketch-of-union), and state stays k-longs-per-group") {
    import graft.operators.Sketches
    // k below the per-segment distinct count (~128 custkeys at this
    // fixture), so the stream genuinely exercises truncation at k
    val k = 64
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
      .select(col("o_orderpriority").as("seg"), col("o_custkey"),
        col("o_orderkey"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_kmv_spec").toString
    o.repartitionByRange(4, col("o_orderkey"))
      .write.mode("overwrite").parquet(tmp)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      val st = EventStream.streamFoldExact(spark, tmp, o.schema, None,
          (prev, b) => {
            val bs = Sketches.kmvSketch(b, Seq("seg"), "o_custkey", k)
            prev.fold(bs)(Sketches.mergeKmvSketches(_, bs, Seq("seg"),
              "sk_o_custkey", k))
          }, onBatch = batches += _).get
      assert(batches.distinct.size >= 4,
        s"expected >=4 micro-batches, saw ${batches.distinct.size}")
      val got = st.collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val want = Sketches.kmvSketch(o, Seq("seg"), "o_custkey", k)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(got == want,
        "streamed state diverged from the one-shot sketch")
      // boundedness: never more than k hashes per group, however long
      // the stream ran
      assert(got.values.forall(_.length <= k))
      assert(got.nonEmpty && got.values.exists(_.length == k),
        "fixture too small to exercise truncation at k")
    } finally EventStream.deleteDir(tmp)
  }

  test("stream-maintained IVF: the 4-micro-batch appendIvf fold's " +
      "assignments equal the one-shot append row-for-row (frozen " +
      "quantizer makes the fold associative)") {
    import graft.operators.Ann
    Graft.init(spark)
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val even = e.filter(pmod(col("vec_id"), lit(2)) === 0)
    val odd = e.filter(pmod(col("vec_id"), lit(2)) === 1)
    val base = Ann.buildIvf(even)
    val centroids = base.centroids.localCheckpoint(true)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_ivf_spec").toString
    odd.repartitionByRange(4, col("vec_id"))
      .write.mode("overwrite").parquet(tmp)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      val streamed = EventStream.streamFoldExact(spark, tmp, odd.schema,
        Some(base.assignments),
        (st, b) => Ann.appendIvf(Ann.Ivf(st.get, centroids), b)
          .assignments, onBatch = batches += _).get
      assert(batches.distinct.size >= 4,
        s"expected >=4 micro-batches, saw ${batches.distinct.size}")
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select(col("vec_id"), col("centroid_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val oneShot = Ann.appendIvf(
        Ann.Ivf(base.assignments, centroids), odd).assignments
      assert(key(streamed) == key(oneShot),
        "streamed index diverged from the one-shot append")
      // every vector of the corpus is served exactly once
      assert(key(streamed).map(_._1) ==
        e.select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq)
    } finally EventStream.deleteDir(tmp)
  }

  test("stream-maintained SCD-2: the time-ordered 4-micro-batch " +
      "scd2Apply fold equals the one-shot interval build row-for-row") {
    import graft.operators.Cdc
    val e = Tables.load(spark, TestSpark.sfDir, "events")
      .filter(col("user_id") < 5)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") / 20.0).cast("long").as("band"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_scd2_spec").toString
    EventStream.writeTimeOrderedBatches(e, Seq("ts", "event_id"), 4, tmp)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      val streamed = EventStream.streamFoldExact(spark, tmp, e.schema,
        None,
        (st, b) => st.fold(
          Cdc.scd2Intervals(b, "user_id", "band", "ts", "event_id"))(
          prev => Cdc.scd2Apply(prev, b, "user_id", "band", "ts",
            "event_id")), onBatch = batches += _).get
      assert(batches.distinct.size >= 4,
        s"expected >=4 micro-batches, saw ${batches.distinct.size}")
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select(col("user_id"), col("band"),
          unix_micros(col("valid_from")).as("f"),
          unix_micros(col("valid_to")).as("t"), col("is_current"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
        .sorted.toSeq
      val oneShot = Cdc.scd2Intervals(e, "user_id", "band", "ts",
        "event_id")
      assert(key(streamed) == key(oneShot),
        "streamed interval table diverged from the one-shot build")
    } finally EventStream.deleteDir(tmp)
  }

  test("streamAnomalyExact: multiple time-ordered micro-batches, state " +
      "bounded by user count, flags equal the batch rolling detector") {
    import graft.operators.Conditions
    val e = Tables.load(spark, TestSpark.sfDir, "events")
      .filter(col("user_id") < 40)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_anom_spec").toString
    try {
      EventStream.writeTimeOrderedBatches(e, Seq("ts", "event_id"), 4, tmp)
      var progressBatches = 0
      var maxStateRows = 0L
      val got = EventStream.streamAnomalyExact(spark, tmp, e.schema,
          onDrained = q => {
            val ps = q.recentProgress.filter(_.numInputRows > 0)
            progressBatches = ps.length
            maxStateRows = ps.flatMap(_.stateOperators.map(_.numRowsTotal))
              .foldLeft(0L)(math.max)
          })
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(progressBatches >= 4,
        s"expected >=4 micro-batches, saw $progressBatches")
      assert(maxStateRows > 0 && maxStateRows <= 40,
        s"ring state not bounded by user count: $maxStateRows")
      val want = Conditions.rollingOutliers(e, "user_id",
          Seq("ts", "event_id"), "value")
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want && got.nonEmpty)
    } finally EventStream.deleteDir(tmp)
  }

  test("mapGroupsWithState accumulates per-user state across batches") {
    import spark.implicits._
    val input = MemoryStream[EventStream.UserEvent](spark)
    val query = EventStream.userRunningTotals(input.toDS())
      .writeStream.format("memory").queryName("user_state_test")
      .outputMode("update").start()
    try {
      input.addData(EventStream.UserEvent(1, "click", 2.0),
        EventStream.UserEvent(1, "click", 3.0))
      query.processAllAvailable()
      input.addData(EventStream.UserEvent(1, "buy", 5.0))
      query.processAllAvailable()
      val rows = spark.table("user_state_test")
        .orderBy(col("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.last == ((1L, 3L, 10.0)))
    } finally query.stop()
  }

  test("streaming sessionize merges in-gap events into one session and " +
      "emits it once the watermark passes the session end") {
    import spark.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)](spark)
    val query = EventStream.sessionize(
        input.toDF().toDF("ts", "user_id", "value"),
        gap = "2 hours", watermark = "1 hour")
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      // two events 1h apart -> one session [10:00, 13:00)
      input.addData((ts(10), 1L, 1.0), (ts(11), 1L, 2.0))
      query.processAllAvailable()
      // an event far later advances the watermark (19:00) past the first
      // session's end, forcing it to close and emit
      input.addData((ts(20), 1L, 5.0))
      query.processAllAvailable()
      val rows = spark.table("session_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains((1L, ts(10).getTime / 1000, 2L, 3.0)))
    } finally query.stop()
  }

  test("watermarked streaming dedup drops in-horizon duplicates") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val query = EventStream.dedupStream(
        input.toDF().toDF("ts", "k"), "1 hour", Seq("k"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData((t0, "a"), (t0, "a"), (t0, "b"))
      query.processAllAvailable()
      input.addData((t0, "a")) // duplicate again, same micro-batch horizon
      query.processAllAvailable()
      val got = spark.table("dedup_test").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)))
      assert(got.toSet == Set((t0, "a"), (t0, "b")) && got.length == 2)
    } finally query.stop()
  }

  test("streaming near-dup suppression keeps one doc per simhash " +
      "fingerprint inside the horizon") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val query = EventStream.nearDupSuppressStream(
        input.toDF().toDF("ts", "text"), "1 hour")
      .writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").start()
    try {
      input.addData(
        (t0, "alpha beta gamma delta"),
        (t0, "alpha beta gamma delta"), // exact dup: same simhash
        (t0, "one two three four"))
      query.processAllAvailable()
      input.addData((t0, "alpha beta gamma delta")) // dup again, in horizon
      query.processAllAvailable()
      val kept = spark.table("neardup_test").collect().map(_.getString(1))
      assert(kept.count(_ == "alpha beta gamma delta") == 1)
      assert(kept.count(_ == "one two three four") == 1)
      assert(kept.length == 2)
    } finally query.stop()
  }

  test("near-dup suppression dedups the same text at DIFFERENT event times " +
      "inside the watermark (state keyed on sh alone — r5 regression)") {
    import spark.implicits._
    // the exact case the r5 fix exists for: identical text arriving at two
    // different timestamps within the horizon. State keyed on (sh, ts)
    // would pass both; keyed on sh alone, only the first survives.
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 10:20:00")
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val query = EventStream.nearDupSuppressStream(
        input.toDF().toDF("ts", "text"), "1 hour")
      .writeStream.format("memory").queryName("neardup_ts_test")
      .outputMode("append").start()
    try {
      input.addData((t0, "alpha beta gamma delta"))
      query.processAllAvailable()
      input.addData((t1, "alpha beta gamma delta")) // later ts, same text
      query.processAllAvailable()
      val kept = spark.table("neardup_ts_test").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)))
      assert(kept.length == 1 && kept.head._1 == t0)
    } finally query.stop()
  }

  test("near-dup batch twin keeps the earliest-ts survivor per fingerprint") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 10:20:00")
    val batch = Seq((t1, "alpha beta gamma delta"),
      (t0, "alpha beta gamma delta"), (t0, "one two three four"))
      .toDF("ts", "text")
    val kept = EventStream.nearDupSuppressStream(batch, "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    // earliest EVENT time — matches the streaming survivor when arrival
    // order is event-time order (the divergence spec below pins the rest)
    assert(kept == Set((t0, "alpha beta gamma delta"),
      (t0, "one two three four")))
  }

  test("near-dup suppression KNOWN DIVERGENCE: out-of-order arrival keeps " +
      "first ARRIVAL in streaming but earliest EVENT TIME in batch") {
    import spark.implicits._
    // dropDuplicatesWithinWatermark keeps the first row in PROCESSING
    // (arrival) order; the batch twin keeps the minimum event-time row.
    // Feed the LATER-ts copy first: the streaming side keeps t1, the batch
    // twin keeps t0. This pins the divergence as chosen and documented
    // (EventStream.nearDupSuppressStream), not drift.
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 10:20:00")
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val query = EventStream.nearDupSuppressStream(
        input.toDF().toDF("ts", "text"), "1 hour")
      .writeStream.format("memory").queryName("neardup_ooo_test")
      .outputMode("append").start()
    try {
      input.addData((t1, "alpha beta gamma delta")) // later ts arrives first
      query.processAllAvailable()
      input.addData((t0, "alpha beta gamma delta")) // earlier ts, in horizon
      query.processAllAvailable()
      val streamKept = spark.table("neardup_ooo_test").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)))
      assert(streamKept.length == 1 && streamKept.head._1 == t1)
    } finally query.stop()
    val batchKept = EventStream.nearDupSuppressStream(
        Seq((t1, "alpha beta gamma delta"), (t0, "alpha beta gamma delta"))
          .toDF("ts", "text"), "1 hour")
      .collect().map(_.getTimestamp(0))
    assert(batchKept.length == 1 && batchKept.head == t0)
  }

  test("stream-stream interval join matches only in-window pairs") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val lIn = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val rIn = MemoryStream[(java.sql.Timestamp, String, String)](spark)
    val joined = EventStream.streamStreamJoin(
      lIn.toDF().toDF("ts", "k", "value"),
      rIn.toDF().toDF("rts", "k", "label"))
    val query = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      lIn.addData((ts(0), "x", 1.0), (ts(0), "y", 2.0))
      rIn.addData((ts(10), "x", "in-window"), (ts(50), "y", "too-late"))
      query.processAllAvailable()
      val got = spark.table("ssj_test").collect()
        .map(r => (r.getString(1), r.getString(4))).toSet
      assert(got == Set(("x", "in-window")))
    } finally query.stop()
  }

  test("streamJoinExact stays batch-exact with >=3 micro-batches per side " +
      "(r9 advisory: the fixed 2h watermark dropped cross-batch matches)") {
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("ts"), col("user_id"), col("value"), col("event_type"))
    val l = ev.filter(col("event_type") === "purchase").drop("event_type")
    val r = ev.filter(col("event_type") === "click").drop("event_type")
    val lDir = java.nio.file.Files.createTempDirectory("graft_sj_l").toString
    val rDir = java.nio.file.Files.createTempDirectory("graft_sj_r").toString
    try {
      // 4 time-ranged left batches x 3 user-split right batches: matches
      // cross batch boundaries in BOTH directions, and right user-shards
      // span the whole time axis — the shape the old watermark lost 6 of
      // 23 sf0.01 matches on once a third batch advanced it
      l.repartitionByRange(4, col("ts")).write.mode("overwrite").parquet(lDir)
      r.repartitionByRange(3, col("user_id")).write.mode("overwrite").parquet(rDir)
      val got = EventStream.streamJoinExact(spark, lDir, rDir, l.schema)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      val lb = l.select(col("ts"), col("user_id"), col("value"))
      val rb = r.select(col("ts").as("rts"), col("user_id").as("ruid"))
      val want = lb.join(rb,
          col("user_id") === col("ruid") &&
            col("rts") >= col("ts") - expr("INTERVAL 30 minutes") &&
            col("rts") <= col("ts"))
        .select(col("user_id"), unix_timestamp(col("ts")),
          unix_timestamp(col("rts")))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(want.nonEmpty, "fixture produced no matches — spec is vacuous")
      assert(got == want,
        s"stream join diverged from batch: missing ${(want -- got).size}, " +
          s"extra ${(got -- want).size} of ${want.size}")
    } finally {
      EventStream.deleteDir(lDir); EventStream.deleteDir(rDir)
    }
  }

  test("streamJoinExact with a finite watermark and time-ordered sources " +
      "keeps join state BOUNDED: the state store evicts as batches drain") {
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("ts"), col("user_id"), col("value"), col("event_type"))
    val l = ev.filter(col("event_type") === "purchase").drop("event_type")
    val r = ev.filter(col("event_type") === "click").drop("event_type")
    val lDir = java.nio.file.Files.createTempDirectory("graft_sb_l").toString
    val rDir = java.nio.file.Files.createTempDirectory("graft_sb_r").toString
    try {
      // BOTH sides time-ranged (roughly ordered arrival) — the production
      // configuration the finite watermark is for
      l.repartitionByRange(6, col("ts")).write.mode("overwrite").parquet(lDir)
      r.repartitionByRange(6, col("ts")).write.mode("overwrite").parquet(rDir)
      val nInput = l.count() + r.count()
      var progresses: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] =
        Seq.empty
      val got = EventStream.streamJoinExact(spark, lDir, rDir, l.schema,
        watermark = Some("1 hour"),
        onDrained = q => progresses = q.recentProgress.toSeq)
      val stateTotals = progresses.flatMap(p =>
        Option(p.stateOperators).toSeq.flatMap(_.map(_.numRowsTotal)))
      val removed = progresses.flatMap(p =>
        Option(p.stateOperators).toSeq.flatMap(_.map(_.numRowsRemoved))).sum
      assert(stateTotals.nonEmpty, "no state-operator progress recorded")
      // eviction fired AND the buffered state never approached the
      // full-stream footprint (each side's span/6 per batch vs a 1h+30m
      // retention horizon)
      assert(removed > 0, "watermark eviction never removed a state row")
      assert(stateTotals.max < nInput / 2,
        s"state peaked at ${stateTotals.max} rows of $nInput streamed — " +
          "watermark is not bounding the join buffers")
      // and the production config still emits only true pairs
      val want = l.select(col("ts"), col("user_id"), col("value"))
        .join(r.select(col("ts").as("rts"), col("user_id").as("ruid")),
          col("user_id") === col("ruid") &&
            col("rts") >= col("ts") - expr("INTERVAL 30 minutes") &&
            col("rts") <= col("ts"))
        .select(col("user_id"), unix_timestamp(col("ts")),
          unix_timestamp(col("rts")))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      val gotSet = got.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(gotSet.subsetOf(want),
        s"bounded config emitted ${(gotSet -- want).size} non-matches")
    } finally {
      EventStream.deleteDir(lDir); EventStream.deleteDir(rDir)
    }
  }

  // ---- pluggable-decoder seam (r9 verdict #9) -------------------------
  // A REAL pixel decoder — minimal uncompressed 24-bit BMP with
  // area-average resize to the phash grid — implemented test-side against
  // the public PixelDecoder trait, proving a JVM codec drops into
  // phash/phashPairs without touching the hash/band plumbing or the plan.

  /** Writes a w×h 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up,
    * 4-byte row padding) with per-pixel RGB from `px(x, y)` (top-down). */
  private def bmpBytes(w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowSize * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835)
    b.putInt(0).putInt(0)
    for (y <- h - 1 to 0 by -1) {
      for (x <- 0 until w) {
        val (r, g, bl) = px(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
      }
      (0 until rowSize - w * 3).foreach(_ => b.put(0.toByte))
    }
    b.array()
  }

  test("pluggable decoder seam: a real BMP decoder slots into phash/" +
      "phashPairs unchanged — map-only plan, re-encode noise stays near, " +
      "distinct content stays far") {
    def tex(x: Int, y: Int): Int = (x * x * 7 + y * 13 * x + y * y * 3) % 251
    val base = bmpBytes(33, 18, (x, y) => { val v = tex(x, y); (v, v, v) })
    // re-encode analog: +4 brightness on a sparse pixel subset — most
    // horizontal gradient signs survive
    val noisy = bmpBytes(33, 18, (x, y) => {
      val v = math.min(tex(x, y) + (if ((x + 3 * y) % 13 == 0) 4 else 0), 255)
      (v, v, v)
    })
    val other = bmpBytes(33, 18, (x, y) => { val v = tex(y * 2, x); (v, v, v) })
    val media = spark.createDataFrame(Seq(
      (1L, "image", base), (2L, "image", noisy), (3L, "image", other)))
      .toDF("media_id", "kind", "payload")
    val hashed = Multimodal.phash(media, new BmpPixelDecoder)
    // the seam contract: same entry point, same output schema, and the
    // decode stays MAP-ONLY — no shuffle anywhere in the hash lineage,
    // payload bytes never leave their partition
    def hasShuffle(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
      rdd.dependencies.exists {
        case _: org.apache.spark.ShuffleDependency[_, _, _] => true
        case d => hasShuffle(d.rdd)
      }
    assert(!hasShuffle(hashed.rdd), "phash decode lineage contains a shuffle")
    val hs = hashed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs.size == 3)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) <= 8,
      s"re-encode noise moved ${ham(hs(1L), hs(2L))} of 60 bits")
    assert(ham(hs(1L), hs(3L)) > 8,
      s"distinct content only ${ham(hs(1L), hs(3L))} bits apart")
    // and the banded pair join consumes the real-decoder hashes as-is
    val pairs = Multimodal.phashPairs(hashed, maxHamming = 8, bands = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the (base, noisy) pair, got $pairs")
  }

  test("multimodal: stubbed decode keeps schema, determinism, no payload loss") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(30)
    val media = Multimodal.mediaFromDocuments(docs)
    // compare names+types (nullability flows from the source parquet)
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val feats = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(8))
    val rows = feats.collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getSeq[Float](7).length == 8))
    assert(rows.forall(r => r.getInt(4) >= 16 && r.getInt(5) >= 16))
    // videos have frames, images/audio exactly 1
    rows.foreach { r =>
      if (r.getString(1) == "video") assert(r.getInt(6) >= 1)
      else assert(r.getInt(6) == 1)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(8))
      .select("media_id", "width").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getInt(4)))
    // frame sampling plan is pure column math
    val plan = feats.withColumn("frames", Multimodal.frameSamplePlan(feats))
      .select("kind", "frames").collect()
    plan.foreach { r =>
      val fs = r.getSeq[Int](1)
      if (r.getString(0) != "video") assert(fs == Seq(0)) else assert(fs.nonEmpty && fs.length <= 4)
    }
  }

  /** The mm_phash_pairs media relation: fixture images plus the
    * deterministic midpoint-variant "re-encode" of every 3rd image. */
  private def phashMedia(dir: String) = {
    val docs = Tables.load(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
    val orig = docs.select(col("doc_id").as("media_id"), col("text"))
    val reenc = docs.filter(pmod(col("doc_id"), lit(9)) === 0)
      .select((col("doc_id") + lit(1000000L)).as("media_id"),
        Multimodal.midCharVariant(col("text")).as("text"))
    orig.union(reenc).select(
      col("media_id"), lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("stub/v1").as("meta_format"))
  }

  test("midCharVariant: same length always (empty and 1-char pass through " +
      "unchanged, the substitution starts at 2 chars)") {
    import spark.implicits._
    val got = Seq("", "x", "xy", "xyz", "abcdef").toDF("text")
      .select(col("text"), Multimodal.midCharVariant(col("text")).as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("" -> "", "x" -> "x", "xy" -> "x~",
      "xyz" -> "x~z", "abcdef" -> "abc~ef"))
    got.foreach { case (t, v) => assert(t.length == v.length) }
  }

  test("phash column twin: StubPixelDecoder decode + dHash equals the pure " +
      "md5 column math (the engine-reproducibility contract the DuckDB " +
      "oracle relies on)") {
    val media = phashMedia(TestSpark.sfDir)
    val viaDecoder = Multimodal.phash(media, new Multimodal.StubPixelDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // twin: the SAME column expression production code ships
    // (Multimodal.phashColumn — the mm_keyframes per-frame hash path)
    val viaColumns = media
      .select(col("media_id"),
        Multimodal.phashColumn(decode(col("payload"), "UTF-8")).as("phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaDecoder.nonEmpty && viaDecoder == viaColumns)
  }

  test("phashPairs banded join reproduces the brute-force all-pairs answer; " +
      "every re-encoded variant pairs with its original at hamming <= 2") {
    val hashed = Multimodal.phash(phashMedia(TestSpark.sfDir),
      new Multimodal.StubPixelDecoder).localCheckpoint(true)
    val banded = Multimodal.phashPairs(hashed, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = hashed.toDF("id_a", "ph_a")
    val b = hashed.toDF("id_b", "ph_b")
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute && banded.nonEmpty)
    // construction guarantee: one substituted cell flips at most the two
    // adjacent gradient bits, so (orig, orig+1e6) is always found
    val variantIds = hashed.filter(col("media_id") >= 1000000L)
      .collect().map(_.getLong(0)).toSet
    variantIds.foreach { v =>
      val hit = banded.find(p => p._1 == v - 1000000L && p._2 == v)
      assert(hit.exists(_._3 <= 2), s"variant $v not paired: $hit")
    }
    // pairs → groups through the shared connected-components path: every
    // variant lands in its original's cluster, represented by the original
    val clusters = graft.operators.Dedup.duplicateClusters(
        Multimodal.phashPairs(hashed, maxHamming = 3)
          .select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    variantIds.foreach { v =>
      assert(clusters(v) == v - 1000000L &&
        clusters(v - 1000000L) == v - 1000000L)
    }
  }

  test("audio chunkPlan: covers [0, duration) with the configured overlap; " +
      "short durations get exactly one clipped chunk") {
    import spark.implicits._
    val plans = (1 to 150).map(d => (d.toLong, d))
      .toDF("media_id", "duration_sec")
      .select(col("duration_sec"),
        Multimodal.chunkPlan(col("duration_sec")).as("chunks"))
      .collect()
      .map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(c => (c.getInt(0), c.getInt(1))))
    plans.foreach { case (dur, chunks) =>
      assert(chunks.head._1 == 0, s"dur=$dur")
      assert(chunks.last._2 == dur, s"dur=$dur: last chunk must end at dur")
      // contiguous coverage: each next chunk starts before the prior ends
      chunks.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          assert(s2 < e1, s"dur=$dur: gap between chunks")
        case _ =>
      }
      chunks.foreach { case (s, e) =>
        assert(e - s <= 30 && s % 25 == 0, s"dur=$dur chunk ($s,$e)") }
      if (dur <= 30) assert(chunks == Seq((0, dur)), s"dur=$dur")
    }
  }

  test("foreachBatch ANN ingestion: appendIvf per micro-batch equals one " +
      "append of the union, and every streamed vector becomes searchable") {
    import spark.implicits._
    import graft.operators.Ann
    def vec(xs: Double*) = xs.map(_.toFloat).toArray
    val seed = Seq((0L, vec(1, 0, 0, 0)), (1L, vec(0, 1, 0, 0)),
      (2L, vec(0, 0, 1, 0)), (3L, vec(0, 0, 0, 1)))
    val batch1 = Seq((10L, vec(0.9, 0.1, 0, 0)), (11L, vec(0, 0.9, 0.1, 0)))
    val batch2 = Seq((12L, vec(0, 0, 0.9, 0.1)), (13L, vec(0.1, 0, 0, 0.9)))
    val input = MemoryStream[(Long, Array[Float])](spark)
    // the ANN ingestion loop: each micro-batch is assigned against the
    // FROZEN seed centroids and appended; state lives in the index
    // relation (localCheckpoint pins it), not executor memory
    var ivf = Ann.buildIvf(seed.toDF("vec_id", "embedding"), numCentroids = 4)
    val query = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val appended = Ann.appendIvf(ivf, batch)
        ivf = Ann.Ivf(appended.assignments.localCheckpoint(true),
          appended.centroids)
      }
      .outputMode("update").start()
    try {
      input.addData(batch1: _*); query.processAllAvailable()
      input.addData(batch2: _*); query.processAllAvailable()
    } finally query.stop()
    val oneShot = Ann.appendIvf(
      Ann.buildIvf(seed.toDF("vec_id", "embedding"), numCentroids = 4),
      (batch1 ++ batch2).toDF("vec_id", "embedding"))
    def asSet(i: Ann.Ivf) = i.assignments.select("vec_id", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asSet(ivf) == asSet(oneShot) && asSet(ivf).size == 8)
    val q = Seq(Tuple1(vec(0, 0, 0.95, 0.05))).toDF("qvec")
    val top = Ann.searchIvf(ivf, q, nprobe = 2, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top.contains(12L), s"streamed vector not searchable: $top")
  }

  test("foreachBatch ingestion: dedupIncremental per micro-batch equals " +
      "applying it sequentially batch-by-batch") {
    import spark.implicits._
    import graft.operators.Dedup
    // two micro-batches of docs ingested against a growing corpus
    val seed = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"))
    val batch1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of seed
      (3L, "one two three four five six seven eight"))       // fresh
    val batch2 = Seq(
      (5L, "one two three four five six seven NINE"), // near-dup of 3
      (7L, "red orange yellow green blue indigo violet pink")) // fresh
    val input = MemoryStream[(Long, String)](spark)
    // the ingestion loop a production stream runs: survivors of each
    // micro-batch are appended to the corpus the NEXT batch dedupes
    // against (state lives in the corpus table, not executor memory)
    var corpus = seed.toDF("doc_id", "text")
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val kept = Dedup.dedupIncremental(corpus, batch, "doc_id", "text",
          minJ = 0.6)
        corpus = corpus.unionByName(
          batch.join(kept, Seq("doc_id"), "left_semi")).localCheckpoint(true)
      }
      .outputMode("update").start()
    try {
      input.addData(batch1: _*); query.processAllAvailable()
      input.addData(batch2: _*); query.processAllAvailable()
    } finally query.stop()
    val streamed = corpus.collect().map(_.getLong(0)).toSet
    // sequential batch application — same operator, no streaming
    var ref = seed.toDF("doc_id", "text")
    Seq(batch1, batch2).foreach { b =>
      val kept = Dedup.dedupIncremental(ref, b.toDF("doc_id", "text"),
        "doc_id", "text", minJ = 0.6)
      ref = ref.unionByName(
        b.toDF("doc_id", "text").join(kept, Seq("doc_id"), "left_semi"))
    }
    val sequential = ref.collect().map(_.getLong(0)).toSet
    assert(streamed == sequential)
    assert(streamed == Set(0L, 3L, 7L), s"got $streamed")
  }
}

/** Test-side REAL decoder for the pluggable seam spec: minimal
  * uncompressed 24-bit BMP parse + area-average resize to the phash grid.
  * Top-level (not an inner class) so the mapPartitions closure serializes
  * without dragging the suite along. */
private class BmpPixelDecoder extends Multimodal.PixelDecoder {
  def decodeGray(kind: String, payload: Array[Byte]): Array[Int] = {
    val b = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(payload(0) == 'B'.toByte && payload(1) == 'M'.toByte, "not BMP")
    val off = b.getInt(10); val w = b.getInt(18); val h = b.getInt(22)
    require(b.getShort(28) == 24 && b.getInt(30) == 0,
      "need 24-bit uncompressed BMP")
    val rowSize = ((w * 3 + 3) / 4) * 4
    def gray(x: Int, y: Int): Int = {
      val p = off + (h - 1 - y) * rowSize + x * 3
      ((payload(p) & 0xff) + (payload(p + 1) & 0xff) +
        (payload(p + 2) & 0xff)) / 3
    }
    val (rr, cc) = (Multimodal.PhashGridRows, Multimodal.PhashGridCols)
    Array.tabulate(rr * cc) { i =>
      val r = i / cc; val c = i % cc
      val y0 = r * h / rr; val y1 = math.max((r + 1) * h / rr, y0 + 1)
      val x0 = c * w / cc; val x1 = math.max((c + 1) * w / cc, x0 + 1)
      var s = 0; var n = 0
      for (y <- y0 until y1; x <- x0 until x1) { s += gray(x, y); n += 1 }
      s / n
    }
  }
}
