package graft

import scala.collection.mutable

import org.apache.spark.graftutil.BusDrain
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, pmod}

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}. A table-scan warmup
  * precedes timing so JVM/JIT startup doesn't land in query 1's number. */
object Bench {

  /** Headline set: one per operator family (scan-agg, join-agg, window,
    * KNN, fusion, full E1, sweep-line, minhash LSH, jaccard pairs,
    * lang-ID, IVF ANN, quantized/learned/1-bit ANN tiers with batch
    * forms, filtered search, BM25 lexical retrieval, hybrid RRF fusion,
    * rerankers, embed near-dup, and the end-to-end corpus-prep
    * capstone). */
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_join_agg", "q17_running_window", "q20_sweepline_consensus",
    "knn_topk", "knn_fusion", "q22_recommend_audience",
    "dd_minhash_lsh", "dd_jaccard_pairs", "dd_embed_pairs", "dd_span_scrub",
    "dd_winnow_overlap",
    "tx_langid", "ann_ivf_topk", "ann_ivf_append_topk", "ann_ivf_batch_topk",
    "ann_ivf_kmeans_topk", "ann_sq8_topk", "ann_sq8_batch_topk",
    "ann_pq_topk", "ann_pq_batch_topk", "ann_pq_kmeans_topk",
    "ann_pq_pca_topk", "ann_ivfpq_topk",
    "ann_ivfpq_kmeans_topk", "ann_ivfpq_batch_topk",
    "ann_bq_topk", "ann_bq_batch_topk",
    "ann_ivf_filtered_topk", "ann_mmr_rerank",
    "tx_bm25_topk", "tx_bm25_batch_topk", "tx_hard_negatives",
    "ann_hybrid_rrf", "ann_hybrid_batch_rrf",
    "tx_retrieve_rerank",
    "ann_eval_mrr", "emb_align_filter", "emb_diverse_sample",
    "emb_bitext_mine", "emb_bitext_ivf",
    "mm_phash_pairs", "tx_corpus_stats",
    "tx_mix_epochs", "tx_pack_sequences", "tx_bpe_tokens",
    "tx_chunk_retrieve", "q39_merge_upsert", "q42_ivm_join",
    "q43_pruned_scan", "q44_pagerank", "tx_hist_quantiles",
    "tx_top_ngrams", "q46_anomaly", "q47_rollup", "q50_bloom_lookup",
    // r10 verdict #2: the 15 oracle queries that had no bench entry and
    // therefore no plan-probe evidence (ExplainProbe derives from this
    // list) — the lake-maintenance, graph-iteration, window-family, and
    // built-index paths a user would actually run
    "q40_scd2", "q41_bucket_join", "q45_ppr_expand", "q48_pivot",
    "q49_time_travel", "q51_scd2_lookup", "q52_dq_checks",
    "q53_window_family", "q54_fuzzy_match", "q55_recursive_agg",
    "q56_setops", "q57_audience_overlap", "q58_scd2_apply",
    "q59_rank_twopass", "q60_exact_quantiles", "q61_group_median",
    "tx_bm25_built_index", "rcmn_top5_built_index",
    "tx_corpus_ready",
    // r11 verdict #4: promoted — the unbenched queries with genuinely
    // independent perf surfaces (iterative connected components ×2,
    // IVF-bucketed semantic dedup, incremental-index append, session
    // windows, as-of join, range join, video keyframe selection,
    // BPE-costed sequence packing, tf-idf's two-pass doc-term shape)
    "dd_clusters", "dd_clusters_star", "dd_semantic", "dd_incremental",
    "q27_sessionize", "q30_asof_attribution", "q31_range_join",
    "mm_keyframes", "tx_pack_sequences_bpe", "tx_tfidf",
    // r12: persisted-KMV artifact pipeline (build x2, write, merge from
    // storage, pairwise intersect); ExactSubstr span dedup (gram-count
    // + bloom-prefiltered string confirm + island merge)
    "q62_kmv_persisted", "dd_exact_substr", "tx_cms_counts",
    "tx_train_classifier", "dd_split_leakfree", "ann_jl_topk",
    // r13: the compound JL-prune x SQ8-rescore tier and the persisted-
    // KMV set-algebra closure
    "ann_jl_sq8_topk", "q63_kmv_setops",
    // r14: q41's write path as its own timed entry (the co-located join
    // no longer re-pays the build), and the flagship audience served
    // from persisted KMV segment sketches
    "q41_bucket_build", "rcmn_audience_sketch",
    // r18: redirect-chain resolution — a genuinely new physical shape
    // (ceil(log2 maxHops) path-doubling self-joins, per-round
    // materialization), nothing else in the headline set irons it
    "tx_redirect_resolve",
    // r19: the full graph-consolidation composition (edge list
    // hash-joined against BOTH path-doubled closure maps + the
    // two-stage bounded anchor aggregation) — the end-to-end shape a
    // crawl graph runs before PageRank, not covered by the parts —
    // and the WARC→corpus capstone (container + sniff/detect +
    // compliance + canonical-onto-redirect consolidation in one plan)
    "tx_graph_consolidate", "tx_crawl_corpus")

  /** Every oracle query NOT in [[headline]], each with the one-line
    * reason it is not benched (r11 verdict #4 — makes the exclusion
    * claim checkable: `BenchCoverageSpec` asserts headline ∪ excluded
    * partitions `SparkEntry.queries` exactly, so a new query cannot
    * land unbenched without a recorded reason). Reasons fall into five
    * kinds: map-only (no shuffle — wall time is the scan), family
    * (same physical plan family as a benched representative, named),
    * composition (an alias that just chains benched plans), fixture
    * (reference-schema parity fixture with no data-scale surface), and
    * harness (streaming micro-batch loop — wall time measures trigger
    * scheduling; state-update cost is spec-gated instead). */
  val excluded: Map[String, String] = Map(
    "ann_lsh_topk" -> "family: superseded ANN tier; banded-bucket probe benched as ann_ivf_topk, banding join as dd_minhash_lsh",
    "ann_lsh_join" -> "family: same banded equi-join machinery benched as dd_minhash_lsh",
    "dd_contamination" -> "family: broadcast anti-join vs benchmark set; join machinery benched via dd_semantic/dd_minhash_lsh",
    "dd_contamination_bloom" -> "family: dd_contamination with a broadcast bloom prefilter; membership distribution spec-pinned",
    "dd_corpus" -> "composition: chains benched dd_exact-family + dd_minhash_lsh plans; 10x scale-probe gate asserts its ratio",
    "dd_exact_substr_scrub" -> "composition: benched dd_exact_substr's spans + a map-side token filter",
    "dd_eval_lsh" -> "harness: recall evaluation of the benched dd_minhash_lsh plan against a fixture-scale exact join",
    "dd_exact" -> "family: sub-second partial-aggregable hash agg (q1_agg shape on documents)",
    "dd_keep_first" -> "family: dd_exact's hash agg with max_by payload",
    "dd_keep_best" -> "family: dd_exact's hash agg with max_by payload",
    "dd_simhash" -> "map-only: codegen simhash projection, no shuffle",
    "dd_split_append" -> "composition: dd_split_leakfree's benched cluster+slot path run for two rounds plus two hash joins",
    "dd_simhash_pairs" -> "family: bandedHammingPairs benched as mm_phash_pairs",
    "emb_normalize" -> "map-only: per-row vector scale, no shuffle",
    "ix_campaign_index" -> "fixture: reference E3 index build over tiny reference-schema dims (broadcast joins + concat, q4/q6 family)",
    "ix_condition_index" -> "fixture: reference E3 parity build, fixture-scale",
    "ix_condition_meta" -> "fixture: stored-SQL metadata parse over a fixture catalog",
    "knn_threshold_groupmax" -> "composition: knn_topk's scored plan + one hash agg (both benched via knn_topk/knn_fusion)",
    "layout_zorder" -> "family: the z-order write is paid and benched inside q50_bloom_lookup and read-side in q43_pruned_scan",
    "mm_chunk_plan" -> "map-only: metadata plan generator, payload untouched",
    "mm_frame_plan" -> "map-only: metadata plan generator, payload untouched",
    "mm_phash_clusters" -> "family: label-propagation clustering benched as dd_clusters on the same machinery",
    "mm_png_roundtrip" -> "map-only: JDK PNG encode→decode per row (codec-bound, not engine work); the hash/band plumbing downstream is benched as mm_phash_pairs",
    "mm_wav_features" -> "map-only: RIFF/WAV container round trip per row (codec-bound); no shuffle beyond the final orderBy",
    "mm_mp3_meta" -> "map-only: MP3 frame-header synth+walk per row (codec-bound); no shuffle beyond the final orderBy",
    "mm_flac_meta" -> "map-only: FLAC STREAMINFO synth+walk per row (codec-bound); no shuffle beyond the final orderBy",
    "mm_mp4_meta" -> "map-only: ISO BMFF box-tree synth+walk per row (codec-bound); no shuffle beyond the final orderBy",
    "mm_gif_keyframes" -> "map-only: JDK animated-GIF encode→decode per row (codec-bound); frame comparisons are container-local, the shuffled twin is benched as mm_keyframes",
    "stream_media_phash" -> "harness: micro-batch loop; per-trigger work is batch-sized map-only codec decode + a hash-keyed fold (the batch twin's machinery is benched as mm_phash_pairs)",
    "nl_target_codes" -> "fixture: reference E2 grammar normalization, fixture-scale",
    "nl_target_from_text" -> "fixture: reference E2 parity, fixture-scale",
    "q2_filter_pushdown" -> "family: pushdown evidence is ExplainProbe's job (q43_pruned_scan); sub-second scan",
    "tx_html_extract" -> "map-only: codegen regex strip/decode projection, no shuffle beyond the final orderBy",
    "tx_url_canonical" -> "map-only: codegen regex normalization projection, no shuffle beyond the final orderBy",
    "tx_url_domain_psl" -> "fixture: literal-host PSL resolve (broadcast semi-join + tiny longest-match agg)",
    "tx_robots_filter" -> "map-only: broadcast per-host rule arrays + higher-order regex-match projection over the URL table, no shuffle beyond the final orderBy",
    "tx_robots_agent" -> "family: tx_robots_filter's plan under a different user-agent group selection (same broadcast rule-array filter)",
    "tx_robots_meta" -> "fixture: per-host directive extraction over the 4-host robots VALUES relation, no data-scale surface",
    "tx_url_frontier" -> "composition: sitemap build/parse/unescape/canonicalize projections + the tx_robots_filter broadcast filter + one keep-first group (tx_web_corpus family)",
    "tx_frontier_discover" -> "composition: tx_url_frontier's funnel with robots-announced fetch (tiny per-host join), a gzip codec hop (codec-bound, partition-local), and the w3cEpoch projection",
    "tx_frontier_final" -> "composition: map-only canonicalization + the benched tx_redirect_resolve closure + one keep-first hash group keyed on final URLs (tx_graph_consolidate's benched join shape over the frontier relation)",
    "tx_frontier_schedule" -> "family: two-pass composite-key bucketed per-host rank (the q59_rank_twopass shape) over the tx_url_frontier funnel + a broadcast delay join; skew behavior gated by the frontier_schedule_skew AND frontier_schedule_tieskew scale probes",
    "tx_link_edges" -> "map-only: codegen anchor extraction + RFC resolution + canonicalization projection, no shuffle beyond the final orderBy",
    "tx_frontier_recrawl" -> "family: tx_frontier_schedule's two-pass politeness rank with a freshness-compound priority over the same funnel; skew behavior gated by the frontier_schedule_skew and frontier_schedule_tieskew scale probes",
    "tx_canonical_collapse" -> "family: tx_web_corpus's codegen-regex-extract + the tx_redirect_resolve path-doubling closure (here over the declaration map — resolveCanonicals) + one keep-first hash shuffle keyed on the TRANSITIVE canonical URL",
    "tx_anchor_corpus" -> "family: the tx_link_edges map-only extraction plus two partial-aggregable hash groups on dst — (dst, anchor) counts then the bounded-heap top-k (tx_web_corpus's shuffle shape; the hot-dst scale story is the anchor_corpus_hotdst probe)",
    "stream_url_frontier" -> "harness: micro-batch loop; per-trigger work is batch-sized canonicalize + broadcast robots filter + a keyed (sum, min) monoid fold, state one row per frontier URL (fixed point shares tx_url_frontier's oracle)",
    "tx_warc_roundtrip" -> "map-only: partition-local WARC+gzip container round trip (codec-bound); no shuffle beyond the final orderBy",
    "tx_warc_charset" -> "map-only: partition-local WARC container + charset-sniffed byte decode per row (codec-bound); no shuffle beyond the final orderBy",
    "tx_warc_media" -> "map-only: partition-local WARC parse + Content-Type route + PNG decode (codec-bound); payloads never leave the iterator, no shuffle beyond the final orderBy",
    "tx_web_corpus" -> "composition: codegen regex projections + one keep-first group (dd_exact/q1_agg families) over the tx_html_extract/tx_url_canonical fixtures",
    "q4_dim_broadcast" -> "family: broadcast-dim join inside the benched q3_join_agg family",
    "q5_latest_order" -> "family: row_number-per-key window, q17_running_window family",
    "q6_group_concat" -> "family: sub-second hash agg with collect_list",
    "q7_distinct_pairs" -> "family: sub-second distinct (hash agg)",
    "q8_union_distinct" -> "family: union + distinct hash agg, q1_agg shape",
    "q9_semijoin_topk" -> "family: broadcast semi-join + TakeOrderedAndProject (spec-pinned operator)",
    "q10_antijoin" -> "family: broadcast anti-join, q9 family",
    "q11_stat_threshold" -> "family: two-pass mean+sigma agg inside benched q22_recommend_audience",
    "q12_audience_count" -> "family: distinct-count agg inside benched q22_recommend_audience",
    "q12_audience_approx" -> "family: HLL expression over the q12 plan",
    "q13_topk_orders" -> "family: TakeOrderedAndProject, knn_topk shape",
    "q14_scalar_funcs" -> "map-only: codegen string/scalar projection",
    "q15_json_events" -> "map-only: JSON field extraction projection",
    "q16_event_hourly" -> "family: time-bucket hash agg, q1_agg shape",
    "q18_vec_roundtrip" -> "map-only: vector codec projection",
    "q19_polarity_subtract" -> "family: collect_set + array_except agg, q6/q8 family",
    "q21_interval_render" -> "composition: q20_sweepline_consensus plan + a render projection",
    "q23_sweepline_dates" -> "composition: q20's sweep-line on date-typed input",
    "q24_literal_lists" -> "map-only: literal-list parse projection",
    "q25_operator_scan" -> "map-only: operator-token scan projection",
    "q26_condition_codec" -> "map-only: sentinel widening codec projection",
    "q28_funnel" -> "family: per-key ordered window shared with promoted q27_sessionize",
    "q29_retention" -> "family: cohort join-agg, q3_join_agg shape",
    "q32_pivot" -> "family: pivot benched as q48_pivot",
    "q33_rollup" -> "family: rollup benched as q47_rollup",
    "q34_heavy_hitters" -> "family: two-stage per-group top-k benched as tx_top_ngrams",
    "q35_anomaly" -> "family: benched as q46_anomaly",
    "q36_correlated" -> "family: decorrelates to the benched q3_join_agg shape",
    "q37_cube" -> "family: grouping-sets agg benched as q47_rollup/q48_pivot",
    "q38_range_window" -> "family: range-frame window, q17_running_window family",
    "stream_hourly" -> "harness: micro-batch loop wall time measures trigger scheduling; state cost spec-gated",
    "stream_ingest_dedup" -> "harness: micro-batch loop; dedup state cost spec-gated",
    "stream_ingest_upsert_delete" -> "harness: micro-batch loop; upsert+delete fold is tombstone-union + batch-append (∝ batch), fixed point oracle-gated",
    "dd_incremental_delete" -> "composition: dd_incremental's benched probe over the tombstoned live view; delete cost probe-gated (index_delete_tomb)",
    "ann_ivf_delete_topk" -> "family: ann_ivf_topk's benched plan plus a broadcast tombstone anti-join; delete cost probe-gated (index_delete_tomb)",
    "stream_join" -> "harness: micro-batch loop; join state cost spec-gated",
    "stream_sessionize" -> "harness: micro-batch loop; session state cost spec-gated",
    "stream_topk" -> "harness: micro-batch loop; top-k state cost spec-gated",
    "stream_cdc" -> "harness: micro-batch loop; fold cost ∝ batch spec-gated",
    "stream_hist" -> "harness: micro-batch loop; histogram merge state-sized",
    "stream_kmv_sketch" -> "harness: micro-batch loop; KMV merge is k-longs-per-group state-sized (merge=rebuild spec-gated in SketchesSpec)",
    "stream_cms" -> "harness: micro-batch loop; CMS merge is depth*width state-sized (merge=rebuild spec-gated in SketchesSpec; batch twin benched as tx_cms_counts)",
    "stream_ivf_append" -> "harness: micro-batch loop; per-trigger append work is batch-sized map-only assignment (streamed==one-shot spec-gated; batch twin benched as ann_ivf_append_topk)",
    "stream_scd2" -> "harness: micro-batch loop; per-trigger scd2Apply work is batch+touched-runs sized (apply==rebuild spec-gated; batch twins benched as q40_scd2/q58_scd2_apply)",
    "stream_anomaly" -> "harness: micro-batch loop; benched batch twin q46_anomaly",
    "tx_bm25_append" -> "family: append work ∝ batch (spec-pinned); query path benched as tx_bm25_built_index",
    "tx_bm25_delete_topk" -> "family: the benched tx_bm25_built_index scoring plan plus broadcast tombstone anti-joins; delete cost probe-gated (index_delete_tomb)",
    "tx_bpe_vocab" -> "composition: the vocab fold is built and paid inside benched tx_bpe_tokens",
    "tx_curriculum" -> "map-only: difficulty-score sort key projection over doc stats",
    "tx_dedup_funnel" -> "composition: chains benched dd_* stages with count taps",
    "tx_fingerprint" -> "map-only: codegen rolling-hash projection",
    "tx_lengths" -> "family: sub-second length agg, q1_agg shape",
    "tx_lengths_approx" -> "family: approx-quantile expression over tx_lengths' scan",
    "tx_lm_score" -> "map-only: codegen char-ngram scoring, benched inside tx_corpus_ready",
    "tx_model_score" -> "map-only: batched scoring seam, benched inside tx_corpus_ready",
    "tx_mix_temperature" -> "family: mixing weights benched as tx_mix_epochs",
    "tx_pii_scrub" -> "map-only: regex scrub projection",
    "tx_prep_pipeline" -> "composition: alias of the benched tx_corpus_ready chain",
    "tx_profile" -> "family: one-pass partial agg over documents, q1_agg shape",
    "tx_profile_sketch" -> "family: HLL sketch agg; union is state-sized (spec-gated)",
    "tx_quality" -> "map-only: codegen quality-feature projection, benched inside tx_corpus_ready",
    "tx_repetition" -> "map-only: codegen repetition-ratio projection",
    "tx_sample_stratified" -> "map-only: hash-based sampling filter",
    "tx_sample_weighted" -> "map-only: hash-based weighted sampling filter",
    "tx_shard_pack" -> "family: shard assignment shares the benched tx_pack_sequences plan",
    "tx_stats_incremental" -> "family: state-sized monoid merge, spec-gated; build pass is q1_agg-shaped",
    "tx_tokens" -> "map-only: token-count projection")

  /** One completed stage's metrics, captured by the bench listener. A slow
    * run with low executorRunTime means tasks were PARKED (host scheduler /
    * steal-time stall — environment, not the plan); high runTime means the
    * compute itself degraded (plan problem). */
  private case class St(name: String, wallMs: Long, runMs: Long, gcMs: Long,
    tasks: Int, shuffleWriteMs: Long, fetchWaitMs: Long) {
    def json: String = {
      def esc(s: String) =
        s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                    case c if c < ' ' => " "; case c => c.toString }
      s"""{"name":"${esc(name)}","wall_ms":$wallMs,"run_ms":$runMs,""" +
        s""""gc_ms":$gcMs,"tasks":$tasks,"shuffle_write_ms":$shuffleWriteMs,""" +
        s""""fetch_wait_ms":$fetchWaitMs}"""
    }
  }

  private[graft] def medianOf(ts: Seq[Double]): Double =
    if (ts.isEmpty) -1.0 else ts.sorted.apply(ts.length / 2)

  /** Per-query adjudication (r15 verdict #1) over (all completed run
    * times, clean-bracketed run times) — object-level so the rule is
    * SPEC-TESTABLE (BenchCoverageSpec pins all three modes on the r15
    * record's own numbers):
    *  - `median_clean`: ≥1 clean run and the sample is trustworthy —
    *    the median of clean runs (the standard path);
    *  - `min_clean_low_evidence`: FEWER than 3 clean runs whose median
    *    sits >1.5× above the query's fastest completed run — every run
    *    executes identical deterministic work, so wall time cannot go
    *    below compute and the fast run proves the stall; adjudicate to
    *    the fastest CLEAN run (still bracket-certified) instead of
    *    laundering a mid-window stall through a 1-2 sample median;
    *  - `min_fallback`: no clean run at all — the fastest completed
    *    run lower-bounds true cost. */
  private[graft] def adjudicateTimes(all: Seq[Double],
      clean: Seq[Double]): (Double, String) = {
    val minAll = all.filter(_ >= 0).minOption.getOrElse(-1.0)
    if (clean.isEmpty) (minAll, "min_fallback")
    else {
      val med = medianOf(clean)
      if (clean.size < 3 && minAll > 0 && med > 1.5 * minAll)
        (clean.min, "min_clean_low_evidence")
      else (med, "median_clean")
    }
  }

  /** One timed run with its four bracketing canaries: `c`/`cPost` are
    * the scan-shaped q1_agg canaries before this run and before the next
    * (or the closing one), `ci`/`ciPost` the iteration-shaped pair.
    * `epoch` is the floor-measurement window the run executed in (r14
    * verdict #1b: adjudication compares canaries against the floor of
    * the run's OWN window, not the minute-one session floor). */
  private case class Run(c: Double, cPost: Double, ci: Double,
    ciPost: Double, sec: Double, snap: Vector[St], epoch: Int)

  /** Resolve a file name to an absolute path at the repo root (first parent
    * of user.dir holding build.sbt) — sbt may fork the main in a JVM whose
    * cwd differs from the invocation dir, so a relative path is not provable.
    */
  private def repoRootFile(name: String): String = {
    def repoRoot(p: java.nio.file.Path): java.nio.file.Path =
      if (p == null) java.nio.file.Paths.get(sys.props("user.dir"))
      else if (java.nio.file.Files.exists(p.resolve("build.sbt"))) p
      else repoRoot(p.getParent)
    repoRoot(java.nio.file.Paths.get(sys.props("user.dir")).toAbsolutePath)
      .resolve(name).toString
  }

  private def writeFile(path: String, content: String): Unit =
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        content.getBytes("UTF-8"))
      System.err.println(s"[bench] wrote $path")
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $path: ${e.getMessage}") }

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
    // the between-run teardown unpersists localCheckpointed RDDs, and
    // RDD.unpersist WARNs once per truncated-lineage RDD — hundreds of
    // lines that would flood the captured tail the contract lines must
    // survive in. The warning is expected here by construction (nothing
    // references the previous run's results), so silence the rdd logger.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    Graft.init(spark)

    // per-stage timing capture (SPARK_GRAFT_BENCH_STAGES=0 disables): the
    // listener is always cheap; the dump below only fires for runs >3x the
    // per-query minimum, so a clean bench prints nothing extra while a
    // stolen/stalled run leaves stderr evidence naming the slow stage and
    // whether its time was executor compute or parked wall-clock.
    val stagesOn = sys.env.getOrElse("SPARK_GRAFT_BENCH_STAGES", "1") != "0"
    val stageBuf = mutable.ArrayBuffer.empty[St]
    if (stagesOn) spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        // taskMetrics is nullable (stages that complete without metrics,
        // e.g. on failure) — an NPE here would be swallowed by the listener
        // bus and the evidence would silently vanish on exactly the runs
        // being diagnosed.
        // the call-site stage name is useless under AQE (every stage reads
        // "$anonfun$withThreadLocalCaptured…"); the RDD operation scopes
        // name the actual operators (Exchange, WholeStageCodegen, …)
        val scopes = si.rddInfos.flatMap(_.scope).map(_.name).distinct
        val label = if (scopes.isEmpty) si.name.takeWhile(_ != '\n')
          else s"${scopes.take(5).mkString(">")} @ ${si.name.takeWhile(_ != '\n')}"
        Option(si.taskMetrics).foreach { m =>
          stageBuf.synchronized {
            stageBuf += St(label.take(90), wall,
              m.executorRunTime, m.jvmGCTime, si.numTasks,
              m.shuffleWriteMetrics.writeTime / 1000000,
              m.shuffleReadMetrics.fetchWaitTime)
          }
        }
      }
    })

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
    // dev knob: SPARK_GRAFT_BENCH_ONLY=q1_agg,knn_topk limits the set —
    // any SparkEntry.queries name works (headline order first, so
    // non-headline components can be profiled in isolation)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val benchable = headline ++ qs.keys.toSeq.sorted.filterNot(headline.contains)
    val selected = only.fold(headline)(f => benchable.filter(f))
    selected.filter(qs.contains).foreach { name =>
      try qs(name)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    // build-once artifacts warm at the BENCH dir too: these queries'
    // contract is pay-the-artifact-once/query-many, so the build
    // belongs outside the timed runs (run 1 otherwise pays it, and on a
    // box that stalls mid-query it can end up the only clean-bracketed
    // run, poisoning the adjudicated median with exactly the cost the
    // design amortizes away; the build paths have their own timed
    // entries — q41_bucket_build for the layout write,
    // q62_kmv_persisted for the sketch-artifact build)
    Seq("q41_bucket_join", "rcmn_audience_sketch")
      .filter(selected.contains).foreach { name =>
        try qs(name)(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
    // median-of-N timed runs per query (default 5), with the per-query
    // [min,max] spread reported alongside — this box shows ±3-4x
    // scheduler/steal-time variance between runs, so a single (or min-of-2)
    // number is not adjudicable; the median is robust to one stolen run in
    // either direction and the spread makes the noise visible in the JSON.
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    // canary protocol — make each run's number adjudicable WITHOUT stage
    // dumps: immediately before every timed run, time one fixed cheap
    // query (q1_agg, plan never changes round-over-round). A slow canary
    // means the BOX was degraded (scheduler steal) during that window, so
    // the paired run's wall time is environment, not plan; the
    // adjudicated per-query number below is the median over runs whose
    // BRACKETING canaries (before and after) were both clean. The canary
    // costs ~0.3 s per timed run plus one closer per query.
    val canaryName = "q1_agg"
    val canaryOn = sys.env.getOrElse("SPARK_GRAFT_BENCH_CANARY", "1") != "0"
    val canaryQ = if (canaryOn) qs.get(canaryName) else None
    // SECOND canary, shaped like the victim (r12 verdict #1): three
    // rounds of evidence show a scan-shaped canary staying CLEAN while
    // the iterative family (q44/q45, dd_incremental) degrades — whatever
    // penalizes multi-job checkpoint-per-round queries (GC pressure,
    // block-manager state, scheduler backlog) is invisible to one scan.
    // This canary IS a mini-iteration: shuffle → localCheckpoint(true)
    // → consume → free over a fixed 4096-row range, i.e. the exact
    // mechanics of a pagerank/dedupIncremental round at toy size
    // (checkpoint job + shuffle job + block-manager churn). Fixed plan,
    // fixed data, ~0.3 s warm; a run whose iteration canary is degraded
    // while q1_agg is clean is the previously-unarbitrable state, now
    // measured per run.
    def iterCanary(): Double = {
      if (!canaryOn) return -1.0
      try {
        val t0 = System.nanoTime()
        val cur = spark.range(0, 4096)
          .select(col("id"), pmod(col("id"), lit(97)).as("k"),
            lit(1.0).as("v"))
          .groupBy(col("k"))
          .agg(org.apache.spark.sql.functions.sum(col("v")).as("sv"))
          .localCheckpoint(true)
        cur.groupBy(pmod(col("k"), lit(7)).as("k7"))
          .agg(org.apache.spark.sql.functions.sum(col("sv")).as("s"))
          .count()
        org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(cur)
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] iter canary failed: ${e.getMessage}")
        -1.0
      }
    }
    // structural teardown between timed runs (r12 verdict #1):
    // clearCache frees only SQL-cached relations, but operators'
    // localCheckpoint pins and intra-query persists are PERSISTED RDDS
    // that outlive their query until GC + the async ContextCleaner get
    // around to them — and the driver-shaped 91-query session showed the
    // iterative family paying for OTHER queries' leaked blocks (an 86 s
    // GC stage inside dd_incremental run 1). Between runs nothing
    // references the previous run's results, so dropping every
    // still-registered RDD is safe and makes each run's storage state
    // reproducible regardless of which queries ran before it.
    def teardown(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // the canary gets its OWN try: a canary failure must not record the
    // query under test as failed (-1) when that query never ran — it
    // reports -1 canary (= unadjudicable run) and the timed run proceeds
    def canary(): Double = canaryQ.fold(-1.0) { f =>
      try {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] canary failed: ${e.getMessage}")
        -1.0
      }
    }
    // FLOOR EPOCHS (r14 verdict #1b): the box drifts — GC/allocator
    // state minutes in is not minute-one state, and a sustained stall
    // can cover whole query windows. A single session-wide canary
    // floor therefore misclassifies: against a minute-one floor, a
    // late steady-state run reads degraded (and real stalls flood the
    // retry queue); against a stall-window observation, a degraded
    // floor would launder stalled runs as clean. Floors are instead
    // re-measured in dedicated blocks (3 scan + 3 iter canaries, min)
    // at session start, every [[floorEvery]] queries, and at the head
    // of every retry pass; each run adjudicates against the floor of
    // its OWN epoch (block min, further lowered by any faster canary
    // observed inside the epoch — a fast observation is proof of box
    // capability in that window). An epoch whose floor is itself
    // degraded (> 1 s for the ~0.2-0.4 s canaries) is flagged in the
    // JSON so its "clean" runs carry a visible caveat.
    val floorEvery = sys.env.getOrElse("SPARK_GRAFT_BENCH_FLOOR_EVERY", "20").toInt
    val retryRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY_RUNS", "3").toInt
    val retryMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY_MAX", "25").toInt
    val retryPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY_PASSES", "2").toInt
    val floorScanBlocks = mutable.ArrayBuffer.empty[Double]
    val floorIterBlocks = mutable.ArrayBuffer.empty[Double]
    def newEpoch(): Unit = {
      if (!canaryOn) { floorScanBlocks += -1.0; floorIterBlocks += -1.0 }
      else {
        teardown()
        val cs = (1 to 3).map(_ => canary())
        val cis = (1 to 3).map(_ => iterCanary())
        floorScanBlocks += cs.filter(_ >= 0).minOption.getOrElse(-1.0)
        floorIterBlocks += cis.filter(_ >= 0).minOption.getOrElse(-1.0)
        System.err.println(f"[bench] floor epoch ${floorScanBlocks.size - 1}: " +
          f"scan ${floorScanBlocks.last}%.3f s, iter ${floorIterBlocks.last}%.3f s")
      }
    }
    var sinceFloor = Int.MaxValue // forces a block before query 1
    def maybeNewEpoch(): Unit =
      if (sinceFloor >= floorEvery) { newEpoch(); sinceFloor = 0 }
    def curEpoch: Int = floorScanBlocks.size - 1
    // evidence collected for bench_stages.json: per-run wall times (run
    // order, not sorted) and the full stage breakdown of every slow run
    val slowRunsJson = mutable.ArrayBuffer.empty[String]
    def timeQuery(name: String, nRuns: Int): Vector[Run] = {
      val epoch = curEpoch
      def once(): (Double, Vector[St]) = {
        // cold-cache per run: operators may cache() intra-query (their own
        // design); leaking those entries across runs/queries makes AQE
        // re-plan later joins around stale 1-partition InMemoryRelations
        // (measured: a leaked cache turned a 4s run into 59s and slowed
        // every subsequent query) and the number stops being a query cost.
        spark.catalog.clearCache()
        stageBuf.synchronized(stageBuf.clear())
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events post async; drain the bus deterministically
        // before snapshot (a fixed sleep was a race on a busy bus)
        val snap = if (stagesOn) {
          BusDrain.waitUntilEmpty(spark.sparkContext, 5000L)
          stageBuf.synchronized(stageBuf.toVector)
        } else Vector.empty[St]
        (dt, snap)
      }
      val runsRaw = try (1 to nRuns).map { _ =>
          // deterministic cleanup OUTSIDE the timed path, before EVERY
          // run (not once per query): localCheckpoint blocks and
          // intra-query persists of the PREVIOUS runs/queries otherwise
          // accumulate until storage eviction + GC thrash degrade the
          // session's tail — BENCH_r09's last-query canaries hit 2.4 s
          // against a 0.169 s floor, and r12's dd_incremental run 1 paid
          // an 86 s GC stage, exactly this way.
          teardown()
          val c = canary()
          val ci = iterCanary()
          val (dt, snap) = once()
          System.err.println(
            f"[bench] $name run: $dt%.3f s (canary $c%.3f s, iter $ci%.3f s)")
          (c, ci, dt, snap)
        }.toVector
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Vector((-1.0, -1.0, -1.0, Vector.empty[St])) }
      // CLOSING canary: contention that starts DURING a run is invisible
      // to that run's (pre-)canary and only shows in the NEXT one — a
      // clean-pre + degraded-mid run then pollutes the clean median (one
      // 16 s dd_minhash_lsh run adjudicated in exactly this way). Each
      // run is therefore BRACKETED: its post-canaries are the next run's
      // pre-canaries, and the last run gets these dedicated closers.
      val anyRan = runsRaw.exists(_._3 >= 0) && canaryQ.nonEmpty
      val closingC = if (anyRan) canary() else -1.0
      val closingCi = if (anyRan) iterCanary() else -1.0
      val runs = runsRaw.zipWithIndex.map { case ((c, ci, dt, snap), i) =>
        val (cPost, ciPost) =
          if (i + 1 < runsRaw.length) (runsRaw(i + 1)._1, runsRaw(i + 1)._2)
          else (closingC, closingCi)
        Run(c, cPost, ci, ciPost, dt, snap, epoch)
      }
      // stage-evidence dump: any run >3x the query's fastest run gets its
      // top stages printed AND persisted so a bad median is attributable
      // (low run_ms vs wall = tasks parked → environment; high run_ms =
      // compute degraded → plan) instead of adjudicated on faith.
      val minT = runs.map(_.sec).filter(_ >= 0).minOption.getOrElse(-1.0)
      if (stagesOn && minT > 0) runs.zipWithIndex.foreach { case (r, i) =>
        if (r.sec > 3 * minT && r.sec > 1.0) {
          System.err.println(
            f"[bench-stages] $name run ${i + 1} SLOW: ${r.sec}%.3f s (min $minT%.3f s)")
          val top = r.snap.sortBy(-_.wallMs).take(8)
          top.foreach { s =>
            System.err.println(
              f"[bench-stages]   wall=${s.wallMs}%6d ms run=${s.runMs}%6d " +
              f"gc=${s.gcMs}%5d tasks=${s.tasks}%3d shufW=${s.shuffleWriteMs}%5d " +
              f"fetchWait=${s.fetchWaitMs}%5d  ${s.name}")
          }
          slowRunsJson +=
            f"""{"query":"$name","run":${i + 1},"sec":${r.sec}%.3f,""" +
            f""""min_sec":$minT%.3f,"stages":[${top.map(_.json).mkString(",")}]}"""
        }
      }
      runs
    }
    // main pass, floor blocks interleaved every floorEvery queries
    val order = selected.filter(qs.contains)
    val resultsMap = mutable.LinkedHashMap.empty[String, Vector[Run]]
    order.foreach { name =>
      maybeNewEpoch()
      resultsMap(name) = timeQuery(name, runsPerQuery)
      sinceFloor += 1
    }
    def cOk(c: Double, floor: Double): Boolean =
      floor < 0 || (c >= 0 && c <= 2 * floor)
    // per-epoch floors: the dedicated block min, lowered by any faster
    // canary observation made inside the epoch (extra floor evidence
    // for free); -1 (no evidence) classifies everything clean, as
    // before. Recomputed after every pass since later observations
    // can lower an epoch's floor only if made IN that epoch — they
    // can't, so strictly this is stable per epoch once its window
    // closes; recomputing is just the simplest correct form.
    def epochFloors(): (Int => Double, Int => Double) = {
      val nE = floorScanBlocks.size
      val scanF = Array.fill(nE)(Double.MaxValue)
      val iterF = Array.fill(nE)(Double.MaxValue)
      def upd(a: Array[Double], e: Int, v: Double): Unit =
        if (v >= 0 && e >= 0 && e < nE && v < a(e)) a(e) = v
      for (rs <- resultsMap.values; r <- rs) {
        upd(scanF, r.epoch, r.c); upd(scanF, r.epoch, r.cPost)
        upd(iterF, r.epoch, r.ci); upd(iterF, r.epoch, r.ciPost)
      }
      for (e <- 0 until nE) {
        upd(scanF, e, floorScanBlocks(e)); upd(iterF, e, floorIterBlocks(e))
      }
      def get(a: Array[Double])(e: Int): Double =
        if (e >= 0 && e < nE && a(e) != Double.MaxValue) a(e) else -1.0
      (get(scanF), get(iterF))
    }
    def bracketClean(r: Run, sF: Int => Double, iF: Int => Double): Boolean =
      cOk(r.c, sF(r.epoch)) && cOk(r.cPost, sF(r.epoch)) &&
        cOk(r.ci, iF(r.epoch)) && cOk(r.ciPost, iF(r.epoch))
    // INTRA-RUN dispersion guard: brackets miss a steal window that
    // starts and ends INSIDE one run (measured: a 48 s dd_exact_substr
    // run between 0.3 s canaries, its explode stage showing 1500 s of
    // executorRunTime on a 32-thread box — threads descheduled
    // mid-stage, not plan work). Every run executes IDENTICAL
    // deterministic work on identical data, so >3x dispersion above
    // the query's own fastest COMPLETED run is environment by
    // construction — the reference deliberately includes non-clean
    // runs, because a fast run lower-bounds the query's true cost no
    // matter what its canaries read (wall cannot go below compute),
    // while a session whose ONLY bracket-clean run is a stalled one
    // would otherwise adjudicate that stall as the answer (measured:
    // dd_exact_substr adjudicated 7.50 s from one "clean" run against
    // a 1.61 s same-session min). Guarded runs are excluded from the
    // adjudicated median (and the retry machinery re-queues the query
    // if too few survive; the min-fallback then reports the floor-true
    // number).
    def cleanWith(rs: Vector[Run], sF: Int => Double,
        iF: Int => Double): Vector[Run] = {
      val bc = rs.filter(r => r.sec >= 0 && bracketClean(r, sF, iF))
      rs.map(_.sec).filter(_ >= 0).minOption match {
        case Some(m) => bc.filter(_.sec <= 3 * m)
        case None => bc
      }
    }
    // RETRY BLOCKS (r14 verdict #1a): a query whose timed window was
    // degraded must not have that window's number accepted — it is
    // re-queued for a retry block at session end (by then an acute
    // stall has typically passed; r14's per-run evidence shows stall
    // windows of minutes, not the whole session). A query retries
    // while it has fewer than min(3, runsPerQuery) clean-bracketed
    // runs; up to retryPasses passes, at most retryMax queries per
    // pass (slowest first — the queries that dominate the total and
    // the per-query bars), retryRuns runs each, each pass opening
    // with a fresh floor block so retry runs adjudicate against the
    // box state that actually hosted them.
    val retried = mutable.ArrayBuffer.empty[String]
    val cleanTarget = math.min(3, runsPerQuery)
    var pass = 0
    while (pass < retryPasses) {
      val (sF, iF) = epochFloors()
      val needing = resultsMap.toSeq
        .filter { case (_, rs) => cleanWith(rs, sF, iF).size < cleanTarget }
        .sortBy { case (_, rs) =>
          -rs.map(_.sec).filter(_ >= 0).minOption.getOrElse(0.0) }
        .take(retryMax).map(_._1)
      if (needing.isEmpty) pass = retryPasses
      else {
        System.err.println(s"[bench] retry pass ${pass + 1}: " +
          s"${needing.size} queries with degraded windows: ${needing.mkString(",")}")
        // RECOVERY WAIT: a stall that outlasts the main pass also
        // poisons an immediate retry (measured: both retry passes of a
        // session ran at 2.2 s canaries against a 0.22 s floor — every
        // retried run inherited the degraded window). Before each
        // pass, poll the scan canary until it returns to ≤2× the best
        // floor this session has seen, sleeping between polls, bounded
        // by SPARK_GRAFT_BENCH_RETRY_WAIT_SEC (default 600 s; 0
        // disables). If the box never recovers inside the cap the pass
        // proceeds anyway — a degraded retry still adds runs the
        // min-fallback can use.
        val waitCap = sys.env
          .getOrElse("SPARK_GRAFT_BENCH_RETRY_WAIT_SEC", "600").toLong
        if (canaryOn && waitCap > 0) {
          val best = (0 until floorScanBlocks.size).map(sF)
            .filter(_ >= 0).minOption.getOrElse(-1.0)
          if (best > 0) {
            val deadline = System.nanoTime() + waitCap * 1000000000L
            var c = canary()
            var waited = false
            while (c >= 0 && c > 2 * best && System.nanoTime() < deadline) {
              if (!waited) System.err.println(
                f"[bench] retry pass ${pass + 1}: box degraded " +
                f"(canary $c%.3f vs floor $best%.3f) — waiting for recovery")
              waited = true
              Thread.sleep(30000)
              c = canary()
            }
            if (waited) System.err.println(
              f"[bench] retry pass ${pass + 1}: proceeding at canary $c%.3f")
          }
        }
        sinceFloor = Int.MaxValue
        needing.foreach { name =>
          maybeNewEpoch()
          resultsMap(name) = resultsMap(name) ++ timeQuery(name, retryRuns)
          sinceFloor += 1
        }
        retried ++= needing.filterNot(retried.contains)
        pass += 1
      }
    }
    val results = resultsMap.toSeq
    val allRunsJson = results.map { case (name, runs) =>
      "\"" + name + "\":[" + runs.map(r => f"${r.sec}%.3f").mkString(",") + "]"
    }
    val runEpochsJson = results.map { case (name, runs) =>
      "\"" + name + "\":[" + runs.map(_.epoch).mkString(",") + "]"
    }
    def fmt(d: Double) = f"$d%.3f"
    def median(ts: Seq[Double]): Double = medianOf(ts)
    // box-state classification: a run is CLEAN if all FOUR bracketing
    // canaries (scan-shaped q1_agg and the iteration-shaped mini-loop,
    // each before the run and before the NEXT run / the closing pair)
    // stayed within 2x the floors of the run's OWN epoch — a degraded
    // post-canary means contention started mid-run and the wall time is
    // environment, not plan; a degraded ITER canary with a clean scan
    // canary is the state that penalized q44/dd_incremental invisibly
    // for three rounds. With no canary every run counts as clean.
    val (scanFloorOf, iterFloorOf) = epochFloors()
    val canaryFloor = (0 until floorScanBlocks.size)
      .map(scanFloorOf).filter(_ >= 0).minOption.getOrElse(-1.0)
    val iterFloor = (0 until floorIterBlocks.size)
      .map(iterFloorOf).filter(_ >= 0).minOption.getOrElse(-1.0)
    val cleanOf: Map[String, Vector[Run]] = results.map { case (k, rs) =>
      k -> cleanWith(rs, scanFloorOf, iterFloorOf) }.toMap
    // ADJUDICATION (r15 verdict #1): [[adjudicateTimes]] — the r14
    // median-of-clean rule plus the low-evidence guard (r15 record:
    // dd_minhash_lsh adjudicated a 3.11 s 2-clean-run median while a
    // 1.80 s run existed; dd_exact_substr 2.87 vs a 1.37 min — both
    // inside the 3x guard, both stalls by construction). The mode each
    // query adjudicated under is disclosed in "adjudication" so the
    // record says which rule produced every number.
    val adjOf: Map[String, (Double, String)] = results.map { case (k, rs) =>
      k -> adjudicateTimes(rs.map(_.sec), cleanOf(k).map(_.sec)) }.toMap
    val qJson = results.map { case (k, rs) =>
      "\"" + k + "\":" + fmt(median(rs.map(_.sec))) }.mkString("{", ",", "}")
    val qAdjJson = results.map { case (k, _) =>
      "\"" + k + "\":" + fmt(adjOf(k)._1) }.mkString("{", ",", "}")
    val adjModeJson = results.map { case (k, _) =>
      "\"" + k + "\":\"" + adjOf(k)._2 + "\"" }.mkString("{", ",", "}")
    val qMinJson = results.map { case (k, rs) =>
      "\"" + k + "\":" + fmt(rs.map(_.sec).filter(_ >= 0).minOption.getOrElse(-1.0)) }
      .mkString("{", ",", "}")
    val spreadJson = results.map { case (k, rs) =>
      val ts = rs.map(_.sec).sorted
      "\"" + k + "\":[" + fmt(ts.head) + "," + fmt(ts.last) + "]" }
      .mkString("{", ",", "}")
    // pre-canaries of the 5 runs plus the closing canary (6 values/query)
    val canaryJson = results.map { case (k, rs) =>
      "\"" + k + "\":[" +
        (rs.map(r => fmt(r.c)) :+ fmt(rs.last.cPost)).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val canaryIterJson = results.map { case (k, rs) =>
      "\"" + k + "\":[" +
        (rs.map(r => fmt(r.ci)) :+ fmt(rs.last.ciPost)).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val total = results.map { case (_, rs) => median(rs.map(_.sec)) }
      .filter(_ >= 0).sum
    val totalAdj = results.map { case (k, _) => adjOf(k)._1 }
      .filter(_ >= 0).sum
    // per-epoch floor evidence: the windows adjudication compared
    // against, plus a per-epoch degraded flag (floor > 1 s for a
    // ~0.2-0.4 s canary means the whole window was stalled and its
    // "clean" classifications carry that caveat)
    val nEpochs = floorScanBlocks.size
    val floorsScanJson = (0 until nEpochs).map(e => fmt(scanFloorOf(e)))
      .mkString("[", ",", "]")
    val floorsIterJson = (0 until nEpochs).map(e => fmt(iterFloorOf(e)))
      .mkString("[", ",", "]")
    val epochDegradedJson = (0 until nEpochs)
      .map(e => scanFloorOf(e) > 1.0 || iterFloorOf(e) > 1.0)
      .mkString("[", ",", "]")
    val cleanRunsJson = results.map { case (k, _) =>
      "\"" + k + "\":" + cleanOf(k).size }.mkString("{", ",", "}")
    val retriedJson = retried.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,""" +
      f""""total_adjudicated":$totalAdj%.3f,"queries_adjudicated":$qAdjJson,""" +
      f""""queries_min":$qMinJson,"spread":$spreadJson,""" +
      f""""canary":{"name":"$canaryName","floor":${fmt(canaryFloor)},""" +
      // a session degraded THROUGHOUT has an inflated floor, which would
      // silently classify every run as clean — flag it so the adjudicated
      // numbers carry a visible caveat (q1_agg floor is ~0.2-0.4 s here)
      s""""floor_degraded":${canaryFloor > 1.0},"floors":$floorsScanJson,""" +
      s""""times":$canaryJson},""" +
      f""""canary_iter":{"name":"iter2round","floor":${fmt(iterFloor)},""" +
      s""""floor_degraded":${iterFloor > 1.0},"floors":$floorsIterJson,""" +
      s""""times":$canaryIterJson},""" +
      s""""epoch_degraded":$epochDegradedJson,""" +
      s""""adjudication":$adjModeJson,""" +
      s""""clean_runs":$cleanRunsJson,"retried":$retriedJson,""" +
      f""""runs":$runsPerQuery,"sf":"$sfDir"}"""
    // stdout contract (r11 What's-wrong #4): the full-evidence line is
    // ~10 KB and the driver's captured stdout tail truncates it mid-line
    // (BENCH_r10/r11 "parsed": null) — so stdout gets the COMPACT line
    // (the documented {"metric",…,"queries"} contract, ~2.3 KB) and the
    // full evidence (spread/canaries/adjudicated/min maps) lives only in
    // bench_out.json. Human logs stay on stderr.
    val compactJson =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      f""""queries":$qJson,"runs":$runsPerQuery,"sf":"$sfDir"}"""
    // TAIL-WINDOW-SAFE final line (r12 verdict #4): the driver records
    // only the last ~2000 chars of combined output, and at 91 queries
    // even the compact line outgrows that window (BENCH_r12's tail
    // starts mid-line). The LAST stdout line is therefore one built to
    // fit: the same summary fields plus as many per-query medians as
    // fit a 1400-byte budget, slowest first (the entries a plan audit
    // reads first), with an explicit omission count and a pointer to
    // the full map. Any parser — first-JSON-line over full stdout (gets
    // the compact line), last-JSON-line, or tail-window (gets this one)
    // — now finds a complete parseable object.
    val byCost = results.map { case (k, rs) => k -> median(rs.map(_.sec)) }
      .sortBy(-_._2)
    val slimBudget = 1400
    val slimEntries = mutable.ArrayBuffer.empty[String]
    var slimLen = 0
    byCost.foreach { case (k, v) =>
      val e = "\"" + k + "\":" + fmt(v)
      if (slimLen + e.length + 1 <= slimBudget) {
        slimEntries += e; slimLen += e.length + 1
      }
    }
    val slimJson =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      s""""queries":${slimEntries.mkString("{", ",", "}")},""" +
      s""""queries_omitted":${byCost.length - slimEntries.length},""" +
      s""""queries_full":"bench_out.json","order":"slowest_first",""" +
      f""""runs":$runsPerQuery,"sf":"$sfDir"}"""
    // Drop the FULL line in a bare file first, so the contract lines are
    // the LAST thing on the streams. Default to an ABSOLUTE path at the
    // repo root — sbt may run the main in a forked JVM whose cwd differs
    // from the invocation dir, so a relative default is not provable.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      repoRootFile("bench_out.json"))
    writeFile(outFile, json + "\n")
    // Stage evidence beside it — stderr alone dies in the handoff's
    // 2000-char tail truncation (two rounds of unadjudicable spikes), so
    // the same slow-run stage lines plus every per-run wall time go to a
    // parsable file. Always written: an empty slow_runs array is itself
    // evidence (no run exceeded 3x its query minimum).
    val stagesFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_STAGES_OUT",
      repoRootFile("bench_stages.json"))
    writeFile(stagesFile,
      s"""{"runs_per_query":$runsPerQuery,"sf":"$sfDir",""" +
      s""""runs":${allRunsJson.mkString("{", ",", "}")},""" +
      s""""run_epochs":${runEpochsJson.mkString("{", ",", "}")},""" +
      s""""floors_scan":$floorsScanJson,"floors_iter":$floorsIterJson,""" +
      s""""slow_runs":${slowRunsJson.mkString("[", ",", "]")}}""" + "\n")
    println(compactJson)
    println(slimJson)
    System.out.flush()
    spark.stop()
  }
}
