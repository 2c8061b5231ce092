package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}. A table-scan warmup
  * precedes timing so JVM/JIT startup doesn't land in query 1's number. */
object Bench {

  /** Headline set: one per operator family (scan-agg, join-agg, window,
    * KNN, fusion, full E1, sweep-line, minhash LSH, jaccard pairs,
    * lang-ID, IVF ANN, embed near-dup). */
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_join_agg", "q17_running_window", "q20_sweepline_consensus",
    "knn_topk", "knn_fusion", "q22_recommend_audience",
    "dd_minhash_lsh", "dd_jaccard_pairs", "dd_embed_pairs",
    "tx_langid", "ann_ivf_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // shuffle/broadcast state is cleaned by the ContextCleaner, which is
      // GC-triggered — on a 32g driver heap that never GCs, hundreds of
      // registered shuffles accumulate and the session slows down
      // minutes in; force the cleanup cycle
      .config("spark.cleaner.periodicGC.interval", "1min")
      // shuffle to tmpfs: this VM's /tmp disk has multi-second writeback
      // stalls that turned the shuffle-heaviest query bimodal (2s vs 50s
      // runs); RAM-backed local dirs take the disk out of the measurement
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    // warmup: touch every table, then run each headline query once at the
    // smallest scale factor. This compiles the whole-stage-codegen classes
    // and JITs the operator paths (measured: cold codegen compile dominated
    // complex queries ~10:1 at sf0.1), so the timed numbers below measure
    // steady-state data throughput — the quantity that extrapolates to a
    // large cluster — not one-time Janino compilation.
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")

    val qs = SparkEntry.queries
    // dev knob: SPARK_GRAFT_BENCH_ONLY=q1_agg,knn_topk limits the set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val selected = only.fold(headline)(f => headline.filter(f))
    selected.filter(qs.contains).foreach { name =>
      try qs(name)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    // median-of-N timed runs per query (default 5), with the per-query
    // [min,max] spread reported alongside — this box shows ±3-4x
    // scheduler/steal-time variance between runs, so a single (or min-of-2)
    // number is not adjudicable; the median is robust to one stolen run in
    // either direction and the spread makes the noise visible in the JSON.
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val results = selected.filter(qs.contains).map { name =>
      // deterministic cleanup OUTSIDE the timed path: flushes the
      // ContextCleaner's reference queue (shuffles/broadcasts of previous
      // queries) so neither the accumulation nor the periodic GC's own
      // pause lands inside a timed run
      System.gc()
      def once(): Double = {
        // cold-cache per run: operators may cache() intra-query (their own
        // design); leaking those entries across runs/queries makes AQE
        // re-plan later joins around stale 1-partition InMemoryRelations
        // (measured: a leaked cache turned a 4s run into 59s and slowed
        // every subsequent query) and the number stops being a query cost.
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name run: $dt%.3f s")
        dt
      }
      val times = try (1 to runsPerQuery).map(_ => once()).sorted
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Vector(-1.0) }
      name -> times
    }
    def fmt(d: Double) = f"$d%.3f"
    val qJson = results.map { case (k, ts) =>
      "\"" + k + "\":" + fmt(ts(ts.length / 2)) }.mkString("{", ",", "}")
    val spreadJson = results.map { case (k, ts) =>
      "\"" + k + "\":[" + fmt(ts.head) + "," + fmt(ts.last) + "]" }
      .mkString("{", ",", "}")
    val total = results.map { case (_, ts) => ts(ts.length / 2) }
      .filter(_ >= 0).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"spread":$spreadJson,"runs":$runsPerQuery,"sf":"$sfDir"}"""
    println(json)
    // Also drop the line in a bare file: the driver invokes this through
    // sbt, whose `[info] ` prefix breaks JSON parsing of stdout (every
    // BENCH_r*.json so far has "parsed": null). A file has no prefix.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (json + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    spark.stop()
  }
}
