package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cdc, IncrementalAgg, Layout, Profile, Retrieval}
import graft.queries.MaintenancePack

/** Table maintenance: CDC merge-apply (latest-wins, deletes, inserts,
  * idempotence, and the snapshot-never-shuffles plan shape), SCD-2
  * interval properties (contiguous half-open timeline per key, one open
  * run, collapsed attribute runs), chunking arithmetic vs a plain-Scala
  * reference, and column profiling. */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------- CDC

  private def snap() = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "v")

  private def changes() = Seq(
    // k=1: two updates, seq 2 must win
    (1L, "a1", 11.0, "U", 1L), (1L, "a2", 12.0, "U", 2L),
    // k=2: update then delete — delete wins
    (2L, "b1", 21.0, "U", 1L), (2L, "b1", 21.0, "D", 2L),
    // k=3: delete then re-insert — the re-insert wins
    (3L, "c0", 30.0, "D", 1L), (3L, "c2", 33.0, "U", 2L),
    // k=9: pure insert
    (9L, "i", 90.0, "U", 1L)
  ).toDF("k", "s", "v", "op", "seq")

  test("applyBatch: latest-wins per key, deletes drop, inserts land, " +
      "untouched rows pass through") {
    val out = Cdc.applyBatch(snap(), changes(), "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "a2", 12.0),  // seq-2 image
      (3L, "c2", 33.0),  // delete then re-insert
      (4L, "d", 40.0),   // untouched
      (9L, "i", 90.0)))  // insert; k=2 deleted
  }

  test("applyBatch is idempotent: re-applying the same batch to the " +
      "applied snapshot changes nothing") {
    val once = Cdc.applyBatch(snap(), changes(), "k")
    val twice = Cdc.applyBatch(once, changes(), "k")
    assert(twice.orderBy("k").collect().toSeq ==
      once.orderBy("k").collect().toSeq)
  }

  test("q39 plan: the snapshot flows through a broadcast LeftAnti hash " +
      "join — no sort-merge join anywhere (the big side never shuffles " +
      "for the merge)") {
    val df = MaintenancePack.queries("q39_merge_upsert")(
      spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  private def versioned(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("op", lit("U")).withColumn("seq", lit(0L))

  test("foldChanges: out-of-seq-order batch delivery (seq-2 images " +
      "arriving BEFORE seq-1) still reaches the one-shot applyBatch " +
      "snapshot, in either batch order") {
    val all = changes()
    val batchNewer = all.filter(col("seq") === 2)
    val batchOlder = all.filter(col("seq") === 1)
    val oneShot = Cdc.applyBatch(snap(), all, "k")
      .orderBy("k").collect().toSeq
    for (batches <- Seq(Seq(batchNewer, batchOlder),
        Seq(batchOlder, batchNewer))) {
      val folded = batches.foldLeft(versioned(snap())) { (st, b) =>
        Cdc.foldChanges(st, b, "k")
      }
      assert(Cdc.materialize(folded).orderBy("k").collect().toSeq == oneShot)
    }
  }

  test("foldChanges is idempotent under at-least-once redelivery: " +
      "folding the same batch twice equals once") {
    val b = changes().filter(col("seq") === 1)
    val once = Cdc.foldChanges(versioned(snap()), b, "k")
    val twice = Cdc.foldChanges(once, b, "k")
    assert(twice.orderBy("k", "seq").collect().toSeq ==
      once.orderBy("k", "seq").collect().toSeq)
  }

  test("streamCdcExact: the change stream really folds across multiple " +
      "micro-batches and fixes to the batch apply") {
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
    val ch = queries.MaintenancePack.changeBatch(o)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_cdc_spec").toString
    ch.repartitionByRange(4, pmod(col("o_orderkey") + col("seq"), lit(4L)))
      .write.mode("overwrite").parquet(tmp)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    try {
      val streamed = graft.streaming.EventStream.streamCdcExact(
        spark, tmp, ch.schema, versioned(o), "o_orderkey",
        _ => { seen.incrementAndGet(); () })
      assert(seen.get() >= 3, s"expected >=3 micro-batches, saw ${seen.get()}")
      val want = Cdc.applyBatch(o, ch, "o_orderkey")
        .orderBy("o_orderkey").collect().toSeq
      assert(streamed.select(want.head.schema.fieldNames.map(col): _*)
        .orderBy("o_orderkey").collect().toSeq == want)
    } finally graft.streaming.EventStream.deleteDir(tmp)
  }

  // -------------------------------------------------------------- SCD-2

  test("scd2Intervals: per key the intervals are contiguous half-open " +
      "([from, to) chains), exactly one is open/current, and consecutive " +
      "runs differ in attribute (runs collapsed)") {
    val e = Tables.load(spark, TestSpark.sfDir, "events")
      .filter(col("user_id") < 5)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") / 20.0).cast("long").as("band"))
    val iv = Cdc.scd2Intervals(e, "user_id", "band", "ts", "event_id")
      .select(col("user_id"), col("band"),
        unix_micros(col("valid_from")).as("f"),
        unix_micros(col("valid_to")).as("t"),
        col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3),
        r.getBoolean(4)))
    assert(iv.nonEmpty)
    iv.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      // exactly one open interval, and it is the last
      assert(rows.count(_._5) == 1)
      assert(sorted.last._5 && sorted.last._4 == Long.MaxValue)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, "intervals must chain: a.to == b.from")
          assert(a._2 != b._2, "consecutive runs must differ in band")
        case _ =>
      }
    }
    // interval count never exceeds event count
    val nEvents = e.count()
    assert(iv.length <= nEvents)
  }

  test("scd2Apply equals the full scd2Intervals rebuild over any " +
      "in-contract time split, and re-applying the batch is a no-op") {
    val e = Tables.load(spark, TestSpark.sfDir, "events")
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") / 20.0).cast("long").as("band"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("band"),
        unix_micros(col("valid_from")).as("f"),
        unix_micros(col("valid_to")).as("t"), col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3),
        r.getBoolean(4))).toSet
    val full = canon(Cdc.scd2Intervals(e, "user_id", "band", "ts",
      "event_id"))
    // several split points — early (most keys rebuilt), late (most
    // keys untouched): apply must equal the rebuild at each
    val mm = e.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    Seq(0.25, 0.5, 0.9).foreach { frac =>
      val cut = lo + ((hi - lo) * frac).toLong
      val existing = Cdc.scd2Intervals(
        e.filter(unix_micros(col("ts")) <= cut),
        "user_id", "band", "ts", "event_id")
      val batch = e.filter(unix_micros(col("ts")) > cut)
      val applied = Cdc.scd2Apply(existing, batch,
        "user_id", "band", "ts", "event_id")
      assert(canon(applied) == full, s"apply != rebuild at frac=$frac")
      // idempotence: the same batch again changes nothing
      val again = Cdc.scd2Apply(applied, batch,
        "user_id", "band", "ts", "event_id")
      assert(canon(again) == full, s"re-apply not a no-op at frac=$frac")
    }
    // an empty batch leaves history untouched (all keys pass through)
    val none = Cdc.scd2Apply(
      Cdc.scd2Intervals(e, "user_id", "band", "ts", "event_id"),
      e.filter(lit(false)), "user_id", "band", "ts", "event_id")
    assert(canon(none) == full)
  }

  test("scd2Apply is tie-type agnostic: string and int ties whose " +
      "values sort below any typed sentinel still order head rows " +
      "first") {
    import spark.implicits._
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("attr"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .collect().map(_.toSeq).toSet
    // STRING ties: the old Long.MinValue sentinel rendered as
    // "-9223372036854775808"; a batch tie like "!" sorts BELOW it and
    // would have reordered against the head row at a shared timestamp.
    val srcS = Seq((1L, "a", 100L, "m1"), (1L, "b", 200L, "m2"))
      .toDF("k", "attr", "ts", "tie")
    val existingS = Cdc.scd2Intervals(srcS, "k", "attr", "ts", "tie")
    val batchS = Seq((1L, "c", 200L, "!")).toDF("k", "attr", "ts", "tie")
    val appliedS = Cdc.scd2Apply(existingS, batchS, "k", "attr", "ts",
      "tie")
    // expectation: the batch row lands AFTER the existing head at the
    // shared ts — same result as a full rebuild with a tie that sorts
    // after every existing tie
    val expectS = Cdc.scd2Intervals(
      Seq(("a", 100L, "m1"), ("b", 200L, "m2"), ("c", 200L, "zz"))
        .map { case (a, t, m) => (1L, a, t, m) }
        .toDF("k", "attr", "ts", "tie"), "k", "attr", "ts", "tie")
    assert(canon(appliedS) == canon(expectS),
      "string-tie batch reordered against the head row")
    // INT ties: the old sentinel cast wrapped Long.MinValue to 0, so a
    // negative batch tie (−5 < 0) sorted before the head row.
    val srcI = Seq((1L, "a", 100L, 7), (1L, "b", 200L, 8))
      .toDF("k", "attr", "ts", "tie")
    val existingI = Cdc.scd2Intervals(srcI, "k", "attr", "ts", "tie")
    val batchI = Seq((1L, "c", 200L, -5)).toDF("k", "attr", "ts", "tie")
    val appliedI = Cdc.scd2Apply(existingI, batchI, "k", "attr", "ts",
      "tie")
    val expectI = Cdc.scd2Intervals(
      Seq((1L, "a", 100L, 7), (1L, "b", 200L, 8), (1L, "c", 200L, 99))
        .toDF("k", "attr", "ts", "tie"), "k", "attr", "ts", "tie")
    assert(canon(appliedI) == canon(expectI),
      "int-tie batch reordered against the head row")
  }

  test("scd2Apply plan: untouched history passes through a broadcast " +
      "anti-join — the interval table never key-shuffles for a small " +
      "batch") {
    val e = Tables.load(spark, TestSpark.sfDir, "events")
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") / 20.0).cast("long").as("band"))
    val existing = Cdc.scd2Intervals(e, "user_id", "band", "ts",
      "event_id").localCheckpoint(true) // pin: plan shows ONLY the apply
    val batch = e.filter(col("user_id") === 3).limit(10)
    val applied = Cdc.scd2Apply(existing, batch,
      "user_id", "band", "ts", "event_id")
    val plan = applied.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"),
      s"untouched side is not a broadcast anti-join:\n$plan")
  }

  // ----------------------------------------------------------- chunking

  test("chunkDocs equals a plain-Scala chunker on the fixture docs: " +
      "count formula, ids, and every chunk's text") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val got = Retrieval.chunkDocs(d, "doc_id", "text", 30, 20)
      .collect()
      .map(r => (r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val want = d.select("doc_id", "text").collect().flatMap { r =>
      val id = r.getLong(0)
      val toks = r.getString(1).trim.split("\\s+").toSeq
      val n = toks.length
      val nc = if (n <= 30) 1 else 1 + ((n - 30) + 19) / 20
      (0 until nc).map { ci =>
        (id * 1000 + ci, toks.slice(ci * 20, ci * 20 + 30).mkString(" "))
      }
    }.sortBy(_._1)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("chunkDocs covers every token position and overlaps consecutive " +
      "chunks by chunk-stride") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val withN = d.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n"))
    val perDoc = Retrieval.chunkDocs(d, "doc_id", "text", 30, 20)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nc"))
      .join(withN, Seq("doc_id")).collect()
    perDoc.foreach { r =>
      val (nc, n) = (r.getLong(1), r.getInt(2))
      // last chunk starts at (nc-1)*20 and spans 30 → covers n iff
      // (nc-1)*20 + 30 >= n; minimality: the previous chunk must NOT
      // already cover n (nc == 1 excepted)
      assert((nc - 1) * 20 + 30 >= n, s"uncovered tail: nc=$nc n=$n")
      if (nc > 1) assert((nc - 2) * 20 + 30 < n, s"overshoot: nc=$nc n=$n")
    }
  }

  test("bm25Scores is the un-truncated relation bm25TopK heads: " +
      "top-10 of scores == bm25TopK(10)") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val terms = Retrieval.seedTerms(d, "doc_id", "text", 0L, 4)
    val viaScores = Retrieval.bm25Scores(d, terms)
      .orderBy(col("score").desc, col("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaTopK = Retrieval.bm25TopK(d, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaScores == viaTopK)
  }

  // ---------------------------------------------------------- profiling

  // ------------------------------------------------- bucketed layout

  test("bucketed co-located join: two tables bucketed on the join key " +
      "with equal bucket counts join with NO exchange on either side " +
      "(forced sort-merge so broadcast can't mask it)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bucket_spec").toString
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = Layout.writeBucketed(
        Tables.load(spark, TestSpark.sfDir, "orders"),
        "graft_bkt_spec_o", s"$tmp/o", "o_orderkey", 4)
      val l = Layout.writeBucketed(
        Tables.load(spark, TestSpark.sfDir, "lineitem"),
        "graft_bkt_spec_l", s"$tmp/l", "l_orderkey", 4)
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and the data is actually all there
      val n = joined.count()
      val want = Tables.load(spark, TestSpark.sfDir, "lineitem").count()
      assert(n == want) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.sql("DROP TABLE IF EXISTS `graft_bkt_spec_o`")
      spark.sql("DROP TABLE IF EXISTS `graft_bkt_spec_l`")
      graft.streaming.EventStream.deleteDir(tmp)
    }
  }

  test("rcmn_audience_sketch builds its sketch artifacts ONCE per dir " +
      "and reuses them — the maintain-incrementally/serve-cheap contract") {
    val q = graft.queries.PipelinePack.queries("rcmn_audience_sketch")
    val r1 = q(spark, TestSpark.sfDir).collect().map(_.toString).toSeq
    val after1 = graft.queries.PipelinePack.audienceSketchDirs.size
    assert(after1 >= 1, "first call must populate the artifact cache")
    val r2 = q(spark, TestSpark.sfDir).collect().map(_.toString).toSeq
    assert(graft.queries.PipelinePack.audienceSketchDirs.size == after1,
      "second call rebuilt the artifacts instead of reusing them")
    assert(r1 == r2, "reused artifacts changed the answer")
  }

  test("q41_bucket_join builds its bucketed layout ONCE per dir and " +
      "reuses it — the pay-once contract the bench number now reflects") {
    val q = graft.queries.MaintenancePack.queries("q41_bucket_join")
    val r1 = q(spark, TestSpark.sfDir).collect().map(_.toString).toSeq
    val after1 = graft.queries.MaintenancePack.bucketedLayouts.size
    assert(after1 >= 1, "first call must populate the layout cache")
    val r2 = q(spark, TestSpark.sfDir).collect().map(_.toString).toSeq
    assert(graft.queries.MaintenancePack.bucketedLayouts.size == after1,
      "second call rebuilt the layout instead of reusing it")
    assert(r1 == r2, "reused layout changed the answer")
  }

  // --------------------------------------------- incremental stats

  test("incremental stats maintenance: merge(stats(A), stats(B)) equals " +
      "stats(A ∪ B) exactly, and merging is associative across 3 batches") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    def part(m: Int) = d.filter(pmod(col("doc_id"), lit(3)) === m)
    val full = IncrementalAgg.corpusStats(d)
      .orderBy("lang", "source").collect().toSeq
    val merged2 = IncrementalAgg.mergeStats(
      IncrementalAgg.corpusStats(d.filter(pmod(col("doc_id"), lit(3)) < 2)),
      IncrementalAgg.corpusStats(part(2)))
      .orderBy("lang", "source").collect().toSeq
    val merged3a = IncrementalAgg.mergeStats(
      IncrementalAgg.mergeStats(
        IncrementalAgg.corpusStats(part(0)), IncrementalAgg.corpusStats(part(1))),
      IncrementalAgg.corpusStats(part(2)))
      .orderBy("lang", "source").collect().toSeq
    val merged3b = IncrementalAgg.mergeStats(
      IncrementalAgg.corpusStats(part(0)),
      IncrementalAgg.mergeStats(
        IncrementalAgg.corpusStats(part(1)), IncrementalAgg.corpusStats(part(2))))
      .orderBy("lang", "source").collect().toSeq
    assert(merged2 == full)
    assert(merged3a == full)
    assert(merged3b == full)
  }

  test("profile: null/distinct/min/max per column in long format, " +
      "nulls counted, types stringified") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "x"), (2L, null), (2L, "y"), (null, "x")
    ).toDF("num", "s")
    val rows = Profile.profile(df, Seq("num", "s")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    assert(rows("num") == ((1L, 2L, "1", "2")))
    assert(rows("s") == ((1L, 2L, "x", "y")))
  }

  // ------------------------------------------- incremental join view

  private def ivmFixture() = {
    val li = (1 to 300).map { i =>
      (i.toLong, (i % 7 + 1).toLong, 100.0 + (i % 50) * 0.37,
        (i % 10) * 0.01)
    }.toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = (1 to 7).map(i => (i.toLong, (i % 3).toLong))
      .toDF("s_suppkey", "s_nationkey")
    val nat = (0 to 2).map(i => (i.toLong, s"NATION_$i"))
      .toDF("n_nationkey", "n_name")
    (li, sup, nat)
  }

  test("join-view maintenance: merge(view(base), view(delta)) equals the " +
      "full recompute exactly, any split, empty delta is a no-op") {
    val (li, sup, nat) = ivmFixture()
    def view(part: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.revenueView(part, sup, nat)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"n_name", $"n_items", $"revenue".cast("string"))
        .orderBy("n_name").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val full = key(view(li))
    // 3-way split, merged in two different associations
    val parts = Seq(li.filter($"l_orderkey" % 3 === 0),
      li.filter($"l_orderkey" % 3 === 1), li.filter($"l_orderkey" % 3 === 2))
      .map(view)
    def m(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.merge(a, b, Seq("n_name"), Seq("n_items", "revenue"))
    assert(key(m(m(parts(0), parts(1)), parts(2))) == full)
    assert(key(m(parts(0), m(parts(1), parts(2)))) == full)
    // empty delta: merging an empty batch changes nothing
    assert(key(m(view(li), view(li.filter($"l_orderkey" < 0)))) == full)
  }

  test("join-view delta plan: the dimensions broadcast — no shuffle on " +
      "the fact side beyond the final aggregation") {
    val (li, sup, nat) = ivmFixture()
    val plan = IncrementalAgg.revenueView(li, sup, nat)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dims did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"fact side hit a shuffle join:\n$plan")
  }
}
