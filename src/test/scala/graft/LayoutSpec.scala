package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: the written files must give NARROW per-file ranges on
  * every participating column at once — the property parquet footer
  * pruning needs — where a single-column sort gives it for one column and
  * destroys it for the rest. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nFiles = 16

  /** 20k rows over two INDEPENDENT uniform dimensions — the layout can't
    * ride a correlation; it has to interleave. */
  private def data() = {
    val rnd = new scala.util.Random(1207)
    (0 until 20000).map { i =>
      (i.toLong, rnd.nextInt(100000).toLong, rnd.nextInt(100000).toLong)
    }.toDF("id", "a", "b")
  }

  private def meanSpread(written: org.apache.spark.sql.DataFrame,
      c: String): Double =
    Layout.fileSpread(written, c).agg(avg(col("spread"))).head().getDouble(0)

  test("zorderKey is deterministic, non-negative, and fits bits*cols bits") {
    val df = data()
    val k1 = df.select(Layout.zorderKey(df, Seq("a", "b"), bits = 8).as("z"))
      .agg(min(col("z")), max(col("z"))).head()
    assert(k1.getLong(0) >= 0L)
    assert(k1.getLong(1) < (1L << 16))
    val again = df.select(Layout.zorderKey(df, Seq("a", "b"), bits = 8).as("z"))
      .agg(sum(col("z"))).head().getLong(0)
    val first = df.select(Layout.zorderKey(df, Seq("a", "b"), bits = 8).as("z"))
      .agg(sum(col("z"))).head().getLong(0)
    assert(again == first)
  }

  test("z-order layout keeps BOTH columns' per-file spread narrow; " +
      "single-column sort leaves the other column at full spread") {
    val df = data()
    val tmpZ = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val tmpS = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    Layout.zorderBy(df, Seq("a", "b"), numFiles = nFiles)
      .write.mode("overwrite").parquet(tmpZ)
    df.repartitionByRange(nFiles, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(tmpS)
    val z = spark.read.parquet(tmpZ)
    val s = spark.read.parquet(tmpS)
    val (za, zb) = (meanSpread(z, "a"), meanSpread(z, "b"))
    val (sa, sb) = (meanSpread(s, "a"), meanSpread(s, "b"))
    // single-column layout: perfect on a, useless on b
    assert(sa < 0.15, s"sorted layout spread on a = $sa")
    assert(sb > 0.8, s"sorted layout spread on b = $sb (expected ~1)")
    // z-order: materially narrow on BOTH (16 files over an 8-bit x 8-bit
    // Morton curve -> each file covers ~1/4 of each axis)
    assert(za < 0.5, s"zorder spread on a = $za")
    assert(zb < 0.5, s"zorder spread on b = $zb")
    // and the layout didn't lose or duplicate rows
    assert(z.count() == df.count())
    assert(z.agg(sum(col("id"))).head().getLong(0) ==
      df.agg(sum(col("id"))).head().getLong(0))
  }

  test("degenerate columns are safe: constant column contributes zero " +
      "bits, nulls bin to zero, single-column zorder equals range layout") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "c")
      .withColumn("n", when(col("x") === 2L, null.asInstanceOf[java.lang.Long])
        .otherwise(col("x")))
    // constant + nullable columns: key still computes, stays bounded
    val k = df.select(Layout.zorderKey(df, Seq("c", "n"), bits = 4).as("z"))
      .agg(min(col("z")), max(col("z"))).head()
    assert(k.getLong(0) >= 0L && k.getLong(1) < (1L << 8))
    // one column: the key is just the column's own bin — monotone in x
    val ks = df.orderBy(col("x"))
      .select(Layout.zorderKey(df, Seq("x"), bits = 4).as("z"))
      .collect().map(_.getLong(0))
    assert(ks.sameElements(ks.sorted), "single-column key must be monotone")
  }

  test("non-finite values: NaN/Inf rows bin to 0 and do NOT poison the " +
      "finite rows' stats (r9 advisory: one NaN degenerated every bin)") {
    val df = Seq(0.0, 25.0, 50.0, 75.0, 100.0,
        Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("x").withColumn("id", monotonically_increasing_id())
    val keyed = df.select(col("x"),
      Layout.zorderKey(df, Seq("x"), bits = 4).as("z")).collect()
    val finiteBins = keyed.filter(r => java.lang.Double.isFinite(r.getDouble(0)))
      .map(r => r.getDouble(0) -> r.getLong(1)).sortBy(_._1).map(_._2)
    // stats come from the finite values only: 0..100 spreads over the
    // full 4-bit range, monotone — a NaN-poisoned stats pass would
    // collapse every bin to 0
    assert(finiteBins.head == 0L && finiteBins.last == 15L,
      s"finite rows did not span the bin range: ${finiteBins.toSeq}")
    assert(finiteBins.sameElements(finiteBins.sorted))
    assert(finiteBins.distinct.length == finiteBins.length,
      s"expected distinct bins for spread finite values: ${finiteBins.toSeq}")
    // every non-finite row lands in bin 0 — including +Inf (used to hit
    // the max bin through the Long cast)
    keyed.filter(r => !java.lang.Double.isFinite(r.getDouble(0)))
      .foreach(r => assert(r.getLong(1) == 0L,
        s"non-finite ${r.getDouble(0)} binned to ${r.getLong(1)}, not 0"))
  }

  test("manifest-pruned range read skips files AND equals the full-scan " +
      "filter; disjoint predicate reads zero files") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_prune_spec").toString
    try {
      Layout.zorderBy(data(), Seq("a", "b"), nFiles)
        .write.mode("overwrite").parquet(dir)
      val written = spark.read.parquet(dir)
      val manifest = Layout.fileManifest(written, Seq("a"))
      assert(manifest.count() == nFiles.toLong)
      val (pruned, kept, total) =
        Layout.prunedRead(spark, manifest, "a", 10000L, 20000L)
      assert(total == nFiles)
      assert(kept < total,
        s"range covering 10% of 'a' pruned nothing ($kept of $total)")
      val got = pruned.orderBy("id").collect().map(_.getLong(0)).toSeq
      val want = written.filter(col("a").between(10000L, 20000L))
        .orderBy("id").collect().map(_.getLong(0)).toSeq
      assert(got == want)
      // a range outside every file's interval keeps zero files but
      // still yields a well-formed empty frame with the data's schema
      val (none, kept0, _) =
        Layout.prunedRead(spark, manifest, "a", 900000L, 990000L)
      assert(kept0 == 0 && none.count() == 0L)
      assert(none.columns.toSeq == written.columns.toSeq)
    } finally graft.streaming.EventStream.deleteDir(dir)
  }

  test("clustered compaction keeps the Z-order layout the round-robin " +
      "form destroys, at the same file-count target") {
    val in = java.nio.file.Files
      .createTempDirectory("graft_cc_in").toString
    val outRR = java.nio.file.Files
      .createTempDirectory("graft_cc_rr").toString
    val outCl = java.nio.file.Files
      .createTempDirectory("graft_cc_cl").toString
    try {
      Layout.zorderBy(data(), Seq("a", "b"), 64)
        .write.mode("overwrite").parquet(in)
      val target = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(in))
          .iterator().asScala
          .filter(p => p.toString.endsWith(".parquet"))
          .map(java.nio.file.Files.size(_)).sum / 8
      }
      val nRR = Layout.compact(spark, in, outRR, target)
      val nCl = Layout.compactClustered(spark, in, outCl, target,
        Seq("a", "b"))
      assert(nRR == nCl && nCl >= 4)
      val key = (d: String) => spark.read.parquet(d)
        .orderBy("id").collect().map(_.getLong(0)).toSeq
      assert(key(outCl) == key(in))
      // the clustered output keeps narrow per-file ranges on both
      // columns; round-robin spreads every file over ~the full range
      // with ~8 output files the top 3 key bits split across 2 columns,
      // so one column keeps only 1-2 range bits → spread ~0.5-0.6;
      // round-robin spreads every file over ~the full range
      val clA = meanSpread(spark.read.parquet(outCl), "a")
      val rrA = meanSpread(spark.read.parquet(outRR), "a")
      assert(clA < 0.75 && rrA > 0.9 && clA < rrA / 1.4,
        s"clustered spread $clA vs round-robin $rrA")
    } finally Seq(in, outRR, outCl)
      .foreach(graft.streaming.EventStream.deleteDir)
  }

  test("bloom-manifest point lookup skips files, equals the direct IN " +
      "scan, and false positives never surface wrong rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloom_spec").toString
    try {
      // cluster by (a, b): an `id` point lookup gets nothing from
      // min/max zone maps — the bloom is what prunes
      Layout.zorderBy(data(), Seq("a", "b"), nFiles)
        .write.mode("overwrite").parquet(dir)
      val written = spark.read.parquet(dir)
      val bm = Layout.bloomManifest(written, "id", itemsPerFile = 10000L)
      assert(bm.count() == nFiles.toLong)
      val keys = Seq(3L, 777L, 12345L)
      val (hit, kept, total) = Layout.bloomPrunedRead(spark, bm, "id", keys)
      assert(total == nFiles)
      assert(kept < total, s"3-key lookup pruned nothing ($kept of $total)")
      val got = hit.select("id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == keys.sorted)
      // absent keys: blooms may keep files (false positives) but the
      // exact re-filter returns zero rows
      val (miss, _, _) =
        Layout.bloomPrunedRead(spark, bm, "id", Seq(999999991L))
      assert(miss.count() == 0L)
    } finally graft.streaming.EventStream.deleteDir(dir)
  }

  test("bloomPrunedRead ships only file paths to the driver — bloom " +
      "payloads are membership-tested in executors (r10 weak)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloom_driver_spec").toString
    try {
      Layout.zorderBy(data(), Seq("a", "b"), nFiles)
        .write.mode("overwrite").parquet(dir)
      val written = spark.read.parquet(dir)
      // oversized blooms: ~1.2 MB each at 1M expected items — the
      // payload the OLD implementation collected wholesale
      val bm = Layout.bloomManifest(written, "id",
        itemsPerFile = 1000000L).localCheckpoint(true)
      val bloomBytes = bm.select(sum(length(col("bloom"))))
        .head().getLong(0)
      assert(bloomBytes > 5L * 1000 * 1000,
        s"fixture blooms too small to discriminate: $bloomBytes bytes")
      val resultBytes = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            resultBytes.addAndGet(t.taskMetrics.resultSize)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val (hit, kept, total) =
          Layout.bloomPrunedRead(spark, bm, "id", Seq(3L, 777L))
        assert(kept <= total)
        assert(hit.select("id").collect().map(_.getLong(0)).sorted
          .sameElements(Array(3L, 777L)))
        org.apache.spark.graftutil.BusDrain
          .waitUntilEmpty(spark.sparkContext, 10000)
        // every task result of the prune + read, summed, must stay far
        // below the bloom payload — paths and result rows only
        assert(resultBytes.get() < bloomBytes / 4,
          s"driver received ${resultBytes.get()} bytes vs $bloomBytes " +
            "of bloom payload — blooms are being collected")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally graft.streaming.EventStream.deleteDir(dir)
  }

  test("compaction bin-packs small files to the byte target and keeps " +
      "the data bit-identical") {
    val in = java.nio.file.Files
      .createTempDirectory("graft_compact_in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_compact_out").toString
    try {
      // 64 deliberately-tiny files
      data().repartition(64).write.mode("overwrite").parquet(in)
      import scala.jdk.CollectionConverters._
      def parquetFiles(d: String) = java.nio.file.Files
        .walk(java.nio.file.Paths.get(d)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          java.nio.file.Files.isRegularFile(p)).toSeq
      val inFiles = parquetFiles(in)
      assert(inFiles.size == 64)
      val totalBytes = inFiles.map(java.nio.file.Files.size(_)).sum
      val target = totalBytes / 4
      val n = Layout.compact(spark, in, out, target)
      assert(n == math.ceil(totalBytes.toDouble / target).toInt)
      assert(parquetFiles(out).size == n)
      val key = (d: String) => spark.read.parquet(d)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(key(out) == key(in))
    } finally {
      graft.streaming.EventStream.deleteDir(in)
      graft.streaming.EventStream.deleteDir(out)
    }
  }
}
