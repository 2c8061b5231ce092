package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Cdc, IncrementalAgg, Layout, Profile, Sketches,
  TextAnalysis}

/** Table-maintenance and data-validation queries: CDC merge-apply
  * (latest-wins upsert/delete), SCD-2 dimension-history intervals, and
  * column profiling — the keep-the-lake-healthy operations around the
  * analytics engine (the reference refreshes its serving tables by
  * truncate-and-reload, `/root/reference/nl_targeting_save.py:52-66`;
  * at 100 TB these run incrementally).
  *
  * The CDC change batch is DERIVED deterministically from the orders
  * fixture (key-mod selections; decimal-path price arithmetic) so the
  * DuckDB oracle re-derives batch, resolution, and application exactly.
  */
object MaintenancePack extends QueryPack {

  /** Decimal-path 2-digit rounding (the repo's cross-engine rounding
    * convention: cast the double to DECIMAL(28,12) first so both engines
    * round the same decimal, then round at 2). */
  private def dround2(c: org.apache.spark.sql.Column) =
    round(c.cast("decimal(28,12)"), 2).cast("double")

  /** Process-lifetime bucketed-layout cache for q41_bucket_join (r13
    * verdict #1): orders and lineitem hash-bucketed+sorted on the join
    * key, built ONCE per (process, sf dir) and reused by every
    * subsequent call — the build-once/query-many contract bucketing
    * exists for (the rcmn_top5_built_index convention applied to the
    * write path). Table names carry a dir tag so warmup-dir and
    * bench-dir layouts coexist in one catalog; the temp dirs live for
    * the process (bounded: one layout per sf dir touched). */
  private[graft] val bucketedLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame)]()

  private def bucketedLayout(s: SparkSession,
      dir: String): (DataFrame, DataFrame) =
    bucketedLayouts.computeIfAbsent(dir, _ => {
      // collision-proof per-dir tag (r14 advice): two sf dirs with
      // colliding String.hashCode would share catalog table names and
      // clobber each other's definitions — a SHA-256 prefix of the
      // full path makes the name unique per dir for all practical
      // purposes (64-bit prefix, handful of dirs per process)
      val tag = java.security.MessageDigest.getInstance("SHA-256")
        .digest(dir.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString
      // failure-atomic like audienceSketchArtifacts: if the second
      // table's build throws, nothing is cached, so drop the
      // half-written RAM-backed dir before rethrowing
      val tmp = graft.Graft.scratchDir("graft_bucket_ix")
      try {
        val o = Layout.writeBucketed(Tables.load(s, dir, "orders"),
          s"graft_bkt_orders_$tag", s"$tmp/o", "o_orderkey", 8)
        val l = Layout.writeBucketed(Tables.load(s, dir, "lineitem"),
          s"graft_bkt_lineitem_$tag", s"$tmp/l", "l_orderkey", 8)
        (o, l)
      } catch { case e: Throwable =>
        graft.Graft.dropScratch(tmp); throw e }
    })

  /** The derived CDC change batch over the orders snapshot (shared by
    * q39_merge_upsert and stream_cdc; the oracle re-derives it as CTEs):
    * 2% updates (keys ≡0 mod 50, +10% price) with a second-wave seq-2
    * overwrite on half (≡0 mod 100, +20%), 2% deletes (≡1), 2% inserts
    * under a new 'N' status (≡2, key+10M). */
  private[graft] def changeBatch(o: DataFrame): DataFrame = {
    val m50 = pmod(col("o_orderkey"), lit(50L))
    def change(df: DataFrame, op: String, seq: Long): DataFrame =
      df.withColumn("op", lit(op)).withColumn("seq", lit(seq))
    val upd1 = change(
      o.filter(m50 === 0)
        .withColumn("o_totalprice", dround2(col("o_totalprice") * 1.1))
        .withColumn("o_orderpriority", lit("X-UPD")), "U", 1L)
    val upd2 = change(
      o.filter(pmod(col("o_orderkey"), lit(100L)) === 0)
        .withColumn("o_totalprice", dround2(col("o_totalprice") * 1.2))
        .withColumn("o_orderpriority", lit("X-UPD2")), "U", 2L)
    val dels = change(o.filter(m50 === 1), "D", 1L)
    val ins = change(
      o.filter(m50 === 2)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
        .withColumn("o_orderstatus", lit("N")), "U", 1L)
    upd1.unionByName(upd2).unionByName(dels).unionByName(ins)
  }

  /** DuckDB twin of the CMS build + exact-top-20 point queries, shared
    * by tx_cms_counts and stream_cms (the streamed fixed point equals
    * the one-shot build bucket-for-bucket). */
  private val cmsCountsOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
      |    AS w
      |  FROM documents),
      |rr AS (SELECT unnest(range(0, 3)) AS r),
      |cms AS (
      |  SELECT r, b, count(*) AS cnt FROM (
      |    SELECT rr.r,
      |      ('0x' || substr(md5('cms:' || CAST(rr.r AS VARCHAR) ||
      |        ':' || t.w), 1, 15))::BIGINT % 1024 AS b
      |    FROM tok t CROSS JOIN rr)
      |  GROUP BY r, b),
      |top AS (
      |  SELECT w, count(*) AS exact_cnt FROM tok GROUP BY w
      |  ORDER BY exact_cnt DESC, w LIMIT 20)
      |SELECT tp.w, tp.exact_cnt,
      |  min(coalesce(c.cnt, 0)) AS est_cnt,
      |  min(coalesce(c.cnt, 0)) >= tp.exact_cnt AS ok
      |FROM top tp CROSS JOIN rr
      |LEFT JOIN cms c ON c.r = rr.r AND
      |  c.b = ('0x' || substr(md5('cms:' || CAST(rr.r AS VARCHAR) ||
      |    ':' || tp.w), 1, 15))::BIGINT % 1024
      |GROUP BY tp.w, tp.exact_cnt
      |ORDER BY tp.exact_cnt DESC, tp.w""".stripMargin

  /** DuckDB twin of the SCD-2 full-history interval build, shared by
    * q40_scd2 and stream_scd2 (the streamed scd2Apply fold's fixed
    * point equals the one-shot build exactly). */
  private val scd2Oracle: String =
    """WITH src AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(floor(value / 20.0) AS BIGINT) AS band
      |  FROM events WHERE user_id < 5),
      |marked AS (
      |  SELECT user_id, ts, event_id, band,
      |    CASE WHEN lag(band) OVER w IS NULL OR lag(band) OVER w <> band
      |         THEN 1 ELSE 0 END AS chg
      |  FROM src
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |islands AS (
      |  SELECT user_id, ts, band,
      |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS island
      |  FROM marked),
      |runs AS (
      |  SELECT user_id, island, min(band) AS band,
      |    min(ts) AS valid_from
      |  FROM islands GROUP BY user_id, island),
      |iv AS (
      |  SELECT user_id, band, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
      |      AS valid_to
      |  FROM runs)
      |SELECT user_id, band, epoch_us(valid_from) AS valid_from,
      |  epoch_us(valid_to) AS valid_to,
      |  valid_to IS NULL AS is_current
      |FROM iv""".stripMargin

  /** The per-status audit both CDC queries emit: row count, decimal
    * price sum, max key (pins the inserts). */
  private def audit(snapshot: DataFrame): DataFrame =
    snapshot.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(28,2)"))
          .cast("double").as("tot"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CDC merge-apply: a derived change batch (2% updates with a
    // second-wave seq-2 overwrite on half of them, 2% deletes, 2%
    // inserts under a new 'N' status) resolved latest-wins per key and
    // merged into the orders snapshot via a broadcast anti-join — the
    // snapshot never shuffles. Audited per status: row count, decimal
    // price sum, max key (pins the inserts' presence).
    "q39_merge_upsert" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      audit(Cdc.applyBatch(o, changeBatch(o), "o_orderkey"))
    }),

    // Streaming CDC ingestion — the 6th streaming state kind under the
    // gate: the SAME change set arrives as a 4-micro-batch file stream
    // DELIBERATELY split out of sequence order (the range partitioner
    // below groups by (key+seq) mod 4, so a key's seq-2 image can land
    // in an earlier micro-batch than its seq-1), and folds into a
    // versioned snapshot per batch. The fold is assoc+comm+idempotent
    // latest-by-seq, so the materialized result ≡ the one-shot batch
    // apply — q39's oracle gates it.
    "stream_cdc" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val changes = changeBatch(o)
      val snap0 = o.withColumn("op", lit("U")).withColumn("seq", lit(0L))
      val tmp = graft.Graft.scratchDir("graft_stream_cdc")
      changes
        .repartitionByRange(4,
          pmod(col("o_orderkey") + col("seq"), lit(4L)))
        .write.mode("overwrite").parquet(tmp)
      try audit(graft.streaming.EventStream.streamCdcExact(
          s, tmp, changes.schema, snap0, "o_orderkey"))
        .localCheckpoint(true)
      finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // Time travel over snapshot versions: the orders table written as
    // immutable version 1, its CDC apply committed as version 2 —
    // readers pin a version (asOf) or resolve the latest from the
    // directory listing, so the refresh is atomic-by-visibility and
    // history stays queryable (vs the reference's truncate-and-reload).
    // Both versions audited; the oracle re-derives v1 from the raw
    // snapshot and v2 through the shared CDC CTEs.
    "q49_time_travel" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val root = graft.Graft.scratchDir("graft_time_travel") + "/t"
      try {
        graft.operators.Versioned.write(o, root, 1L)
        graft.operators.Versioned.write(
          Cdc.applyBatch(o, changeBatch(o), "o_orderkey"), root, 2L)
        val v1 = audit(graft.operators.Versioned.read(s, root, Some(1L)))
          .withColumn("v", lit(1L))
        val v2 = audit(graft.operators.Versioned.read(s, root, None))
          .withColumn("v", lit(2L))
        v1.unionByName(v2)
          .select(col("v"), col("o_orderstatus"), col("n"), col("tot"),
            col("max_key"))
          .orderBy(col("v"), col("o_orderstatus"))
          .localCheckpoint(true) // pin before the version dirs vanish
      } finally graft.streaming.EventStream.deleteDir(
        root.stripSuffix("/t"))
    }),

    // SCD-2 history build: each user's coarse value band (floor(v/20))
    // collapsed into [valid_from, valid_to) validity intervals, NULL
    // valid_to + is_current on the open run — one key-partitioned
    // window pass. Microsecond epochs keep the timestamps engine-exact.
    "q40_scd2" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .filter(col("user_id") < 5)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") / 20.0).cast("long").as("band"))
      Cdc.scd2Intervals(e, "user_id", "band", "ts", "event_id")
        .select(col("user_id"), col("band"),
          unix_micros(col("valid_from")).as("valid_from"),
          unix_micros(col("valid_to")).as("valid_to"),
          col("is_current"))
    }),

    // INCREMENTAL SCD-2 maintenance (r10 missing item): the first
    // (time-wise) half of each user's band track builds the interval
    // table, the second half applies as a change batch via
    // Cdc.scd2Apply — untouched keys pass through a broadcast
    // anti-join unread, touched keys rebuild from interval HEADS +
    // batch (work ∝ batch). The oracle is the FULL-history rebuild
    // over all rows (q40's SQL shape over the same filter), so the
    // hash gate IS the apply ≡ rebuild equivalence; the idempotence
    // half of the contract is spec-pinned in MaintenanceSpec.
    "q58_scd2_apply" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .filter(col("user_id") < 5)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") / 20.0).cast("long").as("band"))
      // midpoint split: one bounded stats row — every change is later
      // than every existing row, the append-only contract
      val mm = e.agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi")).head()
      val mid = (mm.getLong(0) + mm.getLong(1)) / 2
      val existing = Cdc.scd2Intervals(
        e.filter(unix_micros(col("ts")) <= mid),
        "user_id", "band", "ts", "event_id")
      val batch = e.filter(unix_micros(col("ts")) > mid)
      Cdc.scd2Apply(existing, batch, "user_id", "band", "ts", "event_id")
        .select(col("user_id"), col("band"),
          unix_micros(col("valid_from")).as("valid_from"),
          unix_micros(col("valid_to")).as("valid_to"),
          col("is_current"))
    }),

    // Streaming SCD-2 maintenance — the 12th streaming state kind under
    // the gate, and the second ORDER-SENSITIVE one (stream_anomaly is
    // the first): the dimension-history intervals maintained under a
    // live event stream by folding `Cdc.scd2Apply` per micro-batch
    // (state ← apply(state, batch); the first batch builds). The
    // time-ordered source (writeTimeOrderedBatches — micro-batch
    // arrival pinned to event time, the CDC-ingest regime) satisfies
    // scd2Apply's append-only contract, under which apply ≡ the full
    // rebuild over (history ∪ batch) EXACTLY — so the streamed fixed
    // point is the one-shot q40 build and shares its oracle verbatim.
    // Per-trigger work is ∝ batch + touched keys' run counts (untouched
    // keys pass through a broadcast anti-join, never re-read); state is
    // the interval table itself — the artifact being maintained. This
    // is the streaming form of the dimension refresh the reference does
    // by truncate-and-reload (nl_targeting_save.py:52-66).
    "stream_scd2" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .filter(col("user_id") < 5)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") / 20.0).cast("long").as("band"))
      val tmp = graft.Graft.scratchDir("graft_stream_scd2")
      graft.streaming.EventStream.writeTimeOrderedBatches(
        e, Seq("ts", "event_id"), 4, tmp)
      try {
        val iv = graft.streaming.EventStream.streamFoldExact(
          s, tmp, e.schema, None,
          (st, b) => st.fold(
            Cdc.scd2Intervals(b, "user_id", "band", "ts", "event_id"))(
            prev => Cdc.scd2Apply(prev, b, "user_id", "band", "ts",
              "event_id"))).get
        iv.select(col("user_id"), col("band"),
            unix_micros(col("valid_from")).as("valid_from"),
            unix_micros(col("valid_to")).as("valid_to"),
            col("is_current"))
          .localCheckpoint(true)
      } finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // SCD-2 dimension lookup AT EVENT TIME — how SCD-2 history is
    // consumed: the even events build the band-interval dimension
    // (q40's machinery), and each ODD event is enriched with the band
    // VALID AT ITS TIMESTAMP via the as-of join (latest valid_from ≤
    // ts per user — intervals are contiguous per key, so the as-of
    // pick IS the containing interval; one |L|+|R| shuffle, no range
    // join). Facts before any history get NULL (left-outer). Oracle:
    // DuckDB's native ASOF LEFT JOIN over the re-derived intervals.
    "q51_scd2_lookup" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .filter(col("user_id") < 5)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") / 20.0).cast("long").as("band"))
      val dim = Cdc.scd2Intervals(
          e.filter(pmod(col("event_id"), lit(2)) === 0),
          "user_id", "band", "ts", "event_id")
        .select(col("user_id"), col("valid_from").as("ts"), col("band"))
      val facts = e.filter(pmod(col("event_id"), lit(2)) === 1)
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.operators.AsofJoin.lastEarlier(facts, dim, Seq("user_id"),
          "ts", Seq("band"), prefix = "dim_")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("dim_band"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),

    // Column profiling (data-validation pass): null/distinct counts and
    // stringified min/max for three documents columns in ONE scan.
    "tx_profile" -> ((s, dir) =>
      Profile.profile(Tables.load(s, dir, "documents"),
        Seq("lang", "source", "n_chars"))),

    // Bucketed co-located join over the BUILT layout: orders and
    // lineitem written hash-bucketed+sorted on the join key (8 buckets
    // each) ONCE per process+dir — the bucket layout replaces the
    // per-query exchange, and that is the pay-once artifact the design
    // exists for (r13 verdict #1: the old form re-paid both table
    // writes inside every timed run, so the headline number measured
    // the write, not the operator; at 100× data that misrepresentation
    // compounds 100×). The write path stays visible as its own timed
    // entry, q41_bucket_build. The spec pins the no-shuffle plan; at
    // this SF the optimizer may still broadcast, which is also
    // shuffle-free. Result ≡ the plain join, which the oracle runs.
    "q41_bucket_join" -> ((s, dir) => {
      val (o, l) = bucketedLayout(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0) - col("l_discount")).cast("decimal(4,2)"))
            .cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // The bucketed-layout WRITE path, timed on its own (r13 verdict #1's
    // counterpart): lineitem — the big side — written hash-bucketed+
    // sorted on the join key each run, then read back through the table
    // definition and aggregated, so the number is the build cost plus a
    // round-trip proof the layout holds the data intact (the oracle runs
    // the same aggregate over the raw table). One data-sized write, no
    // driver-side choke — the 10× probe asserts the ∝-data scaling.
    "q41_bucket_build" -> ((s, dir) => {
      val tmp = graft.Graft.scratchDir("graft_bucket_build")
      try {
        val l = Layout.writeBucketed(Tables.load(s, dir, "lineitem"),
          "graft_bkt_build", s"$tmp/l", "l_orderkey", 8)
        l.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sum_qty"))
          .orderBy(col("l_returnflag"))
          .localCheckpoint(true) // pin before the table def drops
      } finally {
        s.sql("DROP TABLE IF EXISTS `graft_bkt_build`")
        graft.streaming.EventStream.deleteDir(tmp)
      }
    }),

    // Incremental aggregate maintenance (materialized-view refresh):
    // per-(lang, source) corpus stats built on the even docs, refreshed
    // by merging ONLY the odd batch's stats — the corpus is never
    // re-read. merge(stats(A), stats(B)) == stats(A ∪ B) exactly
    // (commutative-monoid sums), so the full-recompute oracle gates the
    // incremental path.
    "tx_stats_incremental" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      IncrementalAgg.mergeStats(
        IncrementalAgg.corpusStats(
          d.filter(pmod(col("doc_id"), lit(2)) === 0)),
        IncrementalAgg.corpusStats(
          d.filter(pmod(col("doc_id"), lit(2)) === 1)))
        .orderBy(col("lang"), col("source"))
    }),

    // Incremental JOIN-view maintenance: the per-nation revenue view
    // (lineitem ⋈ supplier ⋈ nation, aggregated) refreshed by joining
    // ONLY the delta batch (keys ≡7 mod 10) against the broadcast dims
    // and monoid-merging into the base view — Δview = γ(Δfact ⋈ dims),
    // the delta-propagation rule for a fact-only change. Revenue stays
    // an exact decimal through the merge; the full-recompute oracle
    // gates it.
    "q42_ivm_join" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      def view(part: DataFrame) = IncrementalAgg.revenueView(part, sup, nat)
      IncrementalAgg.merge(
          view(l.filter(pmod(col("l_orderkey"), lit(10L)) =!= 7)),
          view(l.filter(pmod(col("l_orderkey"), lit(10L)) === 7)),
          Seq("n_name"), Seq("n_items", "revenue"))
        .select(col("n_name"), col("n_items"),
          col("revenue").cast("double").as("revenue"))
        .orderBy(col("n_name"))
    }),

    // Manifest-pruned scan: documents Z-ordered on (n_chars, doc_id)
    // into 16 range-clustered files, a file-level min/max manifest built
    // at write time, then a range predicate answered by reading ONLY the
    // files whose manifest interval intersects it (the spec pins that
    // files were actually skipped). Result ≡ the full-scan filter, which
    // the oracle runs.
    "q43_pruned_scan" -> ((s, dir) => {
      val tmp = graft.Graft.scratchDir("graft_prune")
      try {
        Layout.zorderBy(Tables.load(s, dir, "documents"),
            Seq("n_chars", "doc_id"), 16)
          .write.mode("overwrite").parquet(tmp)
        val written = s.read.parquet(tmp)
        val manifest = Layout.fileManifest(written, Seq("n_chars"))
        val (pruned, _, _) = Layout.prunedRead(s, manifest, "n_chars",
          200L, 400L)
        pruned.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .orderBy(col("lang"))
          .localCheckpoint(true) // pin before the temp files vanish
      } finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // Bloom-manifest point lookup: the documents files are clustered by
    // the Z-order key, so a doc_id POINT lookup gets nothing from
    // min/max zone maps alone — the per-file bloom prunes the file
    // listing for equality predicates instead (false positives cost an
    // extra file read, never a wrong row; the exact IN filter re-runs
    // on the survivors). Result ≡ the direct IN scan, which the oracle
    // runs; the spec pins that files were actually skipped.
    "q50_bloom_lookup" -> ((s, dir) => {
      val keys = Seq(11L, 55L, 222L, 333L, 444L)
      val tmp = graft.Graft.scratchDir("graft_bloom")
      try {
        Layout.zorderBy(Tables.load(s, dir, "documents"),
            Seq("n_chars", "doc_id"), 16)
          .write.mode("overwrite").parquet(tmp)
        val bm = Layout.bloomManifest(s.read.parquet(tmp), "doc_id",
          itemsPerFile = 100000L)
        val (hit, _, _) = Layout.bloomPrunedRead(s, bm, "doc_id", keys)
        hit.select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
          .localCheckpoint(true) // pin before the temp files vanish
      } finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // Audience-overlap estimation from sketches: |A∩B| from per-segment
    // KMV (bottom-k / theta-style) sketches — the segment-overlap
    // question the reference's audience counter (q12) answers exactly,
    // here answered from PERSISTABLE per-segment sketches with no
    // re-scan of either segment. Unlike the r10 HLL inclusion-exclusion
    // form (error ABSOLUTE in |A|,|B| — gated at ±5%·(|A|+|B|)), KMV
    // sketches intersect directly: common hashes below the shared
    // threshold θ, scaled by 1/θ, give an estimate whose error is
    // RELATIVE TO THE OVERLAP — so the gate here is ±5%·overlap, the
    // bound the reference's audience counter actually needs at segment
    // scale. k = 4096 (32 KB per segment): exact below 4096 distinct
    // members (this SF), ~7%·overlap expected error at 100× these
    // segment sizes (spec-measured in SketchesSpec — error stays
    // proportional to the overlap as the segments grow, which is the
    // whole point). Exact sizes and overlap ride
    // along hash-checked; the deterministic splitmix64 hash makes the
    // gate reproducible run-to-run.
    "q57_audience_overlap" -> ((s, dir) => {
      val k = 4096
      val kmvAgg = udaf(new graft.functions.KmvSketchAggregator(k))
      val interEst = udf { (a: Seq[Long], b: Seq[Long]) =>
        graft.functions.KmvSketchAggregator.estimateIntersection(a, b, k)
      }
      val o = Tables.load(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 480000)
        .select(col("o_custkey"))
      val b = o.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 17)
        .select(col("o_custkey"))
      val exact = a.intersect(b).agg(count(lit(1)).as("exact_overlap"))
        .crossJoin(broadcast(a.distinct().agg(count(lit(1)).as("n_a"))))
        .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
      exact
        .crossJoin(broadcast(a.agg(kmvAgg(col("o_custkey")).as("sk_a"))))
        .crossJoin(broadcast(b.agg(kmvAgg(col("o_custkey")).as("sk_b"))))
        .select(col("n_a"), col("n_b"), col("exact_overlap"),
          (abs(interEst(col("sk_a"), col("sk_b")) -
            col("exact_overlap").cast("double")) <=
            col("exact_overlap").cast("double") * 0.05).as("ok"))
    }),

    // Persisted KMV sketches (r11 verdict #5): per-segment bottom-k
    // sketches built in TWO independent batches (orderkey parity),
    // WRITTEN to parquet as artifacts, read back, merged FROM STORAGE
    // (union-then-truncate = sketch-of-union, the mergeable-summaries
    // contract the HLL path honors), and intersected pairwise across
    // all 5 priority segments — the segment-overlap question answered
    // with no re-scan of any segment. At this SF every segment holds
    // fewer than k = 4096 distinct customers, so the merged sketches
    // are exhaustive and est_overlap HASH-MATCHES the exact overlap
    // (a stronger gate than q57's ±5% boolean); at estimating scale
    // the ok column carries the ±5%·overlap contract. Exact
    // sizes/overlaps ride along hash-checked.
    "q62_kmv_persisted" -> ((s, dir) => {
      val k = 4096
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("seg"), col("o_custkey"),
          col("o_orderkey"))
      val tmp = graft.Graft.scratchDir("graft_kmv")
      try {
        // two batch builds, persisted independently — the artifact face
        Sketches.kmvSketch(o.filter(pmod(col("o_orderkey"), lit(2)) === 0),
          Seq("seg"), "o_custkey", k).write.parquet(s"$tmp/b0")
        Sketches.kmvSketch(o.filter(pmod(col("o_orderkey"), lit(2)) === 1),
          Seq("seg"), "o_custkey", k).write.parquet(s"$tmp/b1")
        val merged = Sketches.mergeKmvSketches(
          s.read.parquet(s"$tmp/b0"), s.read.parquet(s"$tmp/b1"),
          Seq("seg"), "sk_o_custkey", k)
        val a = merged.select(col("seg").as("seg_a"),
          col("sk_o_custkey").as("sk_a"))
        val b = merged.select(col("seg").as("seg_b"),
          col("sk_o_custkey").as("sk_b"))
        // 5x5 sketch relation: broadcast cartesian of bounded metadata
        val est = a.crossJoin(broadcast(b))
          .filter(col("seg_a") < col("seg_b"))
          .select(col("seg_a"), col("seg_b"),
            Sketches.kmvIntersectEstimate(col("sk_a"), col("sk_b"), k)
              .as("est"))
        val segs = o.select(col("seg"), col("o_custkey")).distinct()
        val sizes = segs.groupBy(col("seg")).agg(count(lit(1)).as("n"))
        val exact = segs.toDF("seg_a", "ka")
          .join(segs.toDF("seg_b", "kb"),
            col("ka") === col("kb") && col("seg_a") < col("seg_b"))
          .groupBy(col("seg_a"), col("seg_b"))
          .agg(count(lit(1)).as("exact_overlap"))
        exact
          .join(broadcast(sizes.toDF("seg_a", "n_a")), "seg_a")
          .join(broadcast(sizes.toDF("seg_b", "n_b")), "seg_b")
          .join(broadcast(est), Seq("seg_a", "seg_b"))
          .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
            col("exact_overlap"),
            round(col("est")).cast("long").as("est_overlap"),
            (abs(col("est") - col("exact_overlap").cast("double")) <=
              col("exact_overlap").cast("double") * 0.05).as("ok"))
          .orderBy(col("seg_a"), col("seg_b"))
          .localCheckpoint(true) // pin before the temp artifacts vanish
      } finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // KMV set ALGEBRA over sketch relations (r12 verdict #8): q62
    // covers build/persist/merge/intersect; this closes union and
    // difference — |A∪B| off the union-then-truncate sketch, |A\B| =
    // est|A| − est|A∩B| — so segment arithmetic (the reference's
    // audience composition, camp_vec_rcmn.py:236-263, at sketch scale)
    // needs no re-scan of any segment; the sketches are the same
    // persistable arrays q62 round-trips through parquet. At the oracle
    // SF every pairwise union holds fewer than k = 4096 distinct
    // customers, so both estimates HASH-MATCH the exact sizes; the ok
    // columns carry the estimating-regime gates (±5% of the union size;
    // ±5% of |A| for the difference, whose error compounds est|A|'s and
    // the intersection's — SketchesSpec pins both regimes).
    "q63_kmv_setops" -> ((s, dir) => {
      val k = 4096
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("seg"), col("o_custkey"))
      val sk = Sketches.kmvSketch(o, Seq("seg"), "o_custkey", k)
      val a = sk.select(col("seg").as("seg_a"),
        col("sk_o_custkey").as("sk_a"))
      val b = sk.select(col("seg").as("seg_b"),
        col("sk_o_custkey").as("sk_b"))
      val est = a.crossJoin(broadcast(b))
        .filter(col("seg_a") < col("seg_b"))
        .select(col("seg_a"), col("seg_b"),
          Sketches.kmvUnionEstimate(col("sk_a"), col("sk_b"), k)
            .as("est_u"),
          Sketches.kmvDifferenceEstimate(col("sk_a"), col("sk_b"), k)
            .as("est_d"))
      val segs = o.distinct()
      val sizes = segs.groupBy(col("seg")).agg(count(lit(1)).as("n"))
      val overlap = segs.toDF("seg_a", "ka")
        .join(segs.toDF("seg_b", "kb"),
          col("ka") === col("kb") && col("seg_a") < col("seg_b"))
        .groupBy(col("seg_a"), col("seg_b"))
        .agg(count(lit(1)).as("ov"))
      overlap
        .join(broadcast(sizes.toDF("seg_a", "n_a")), "seg_a")
        .join(broadcast(sizes.toDF("seg_b", "n_b")), "seg_b")
        .join(broadcast(est), Seq("seg_a", "seg_b"))
        .select(col("seg_a"), col("seg_b"),
          (col("n_a") + col("n_b") - col("ov")).as("exact_union"),
          round(col("est_u")).cast("long").as("est_union"),
          (col("n_a") - col("ov")).as("exact_diff"),
          round(col("est_d")).cast("long").as("est_diff"),
          (abs(col("est_u") -
            (col("n_a") + col("n_b") - col("ov")).cast("double")) <=
            (col("n_a") + col("n_b") - col("ov")).cast("double") * 0.05)
            .as("ok_union"),
          (abs(col("est_d") - (col("n_a") - col("ov")).cast("double")) <=
            col("n_a").cast("double") * 0.05).as("ok_diff"))
        .orderBy(col("seg_a"), col("seg_b"))
    }),

    // Mergeable Count-Min term-frequency sketch (Cormode 2005): built
    // per batch (doc parity), merged (counts are a commutative monoid —
    // merge ≡ rebuild exactly), then point-queried for the exact top-20
    // words. The md5 bucket hash is the repo's cross-engine convention,
    // so the ESTIMATES THEMSELVES hash-match DuckDB's re-derivation —
    // no probabilistic gate needed; the `ok` column additionally pins
    // the CMS never-underestimate guarantee. depth·width longs of
    // state answer frequency queries over any batch union with no
    // re-scan — the heavy-hitter counterpart of the KMV/HLL artifacts.
    "tx_cms_counts" -> ((s, dir) => {
      val depth = 3; val width = 1024
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("w"))
      val cms = Sketches.mergeCms(
        Sketches.cmsBuild(toks.filter(pmod(col("doc_id"), lit(2)) === 0)
          .select(col("w")), "w", depth, width),
        Sketches.cmsBuild(toks.filter(pmod(col("doc_id"), lit(2)) === 1)
          .select(col("w")), "w", depth, width))
      val top = toks.groupBy(col("w")).agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("w")).limit(20)
      Sketches.cmsEstimate(top, cms, "w", depth, width)
        .select(col("w"), col("exact_cnt"), col("est").as("est_cnt"),
          (col("est") >= col("exact_cnt")).as("ok"))
        .orderBy(col("exact_cnt").desc, col("w"))
    }),

    // Mergeable-histogram quantiles: per-lang token-length p50/p90/p99
    // read off a fixed-bin histogram (width 8, 64 bins) built per batch
    // (even/odd split) and MERGED — the incremental form of an exact
    // percentile, with integer bin math both engines reproduce exactly.
    // Refresh cost at 100 TB: one pass over the batch + a 64-rows-per-
    // group merge; the corpus-wide percentile sort never happens.
    "tx_hist_quantiles" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      def h(part: DataFrame) =
        Sketches.histogram(part, Seq("lang"), "n", 0L, 8L, 64)
      val merged = Sketches.mergeHistograms(
        h(d.filter(pmod(col("doc_id"), lit(2)) === 0)),
        h(d.filter(pmod(col("doc_id"), lit(2)) === 1)), Seq("lang"))
      Sketches.histQuantiles(merged, Seq("lang"),
          Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)), 0L, 8L)
        .orderBy(col("lang"))
    }),

    // Heavy hitters for the corpus datasheet: top-10 word BIGRAMS per
    // language by exact count. The count is one partial-aggregable
    // pass; the per-group top-k is the partition-pruned two-stage form
    // (Scale.topKByGroup) — no task ever sorts a language's whole
    // bigram vocabulary (the funnel the window-only form has).
    "tx_top_ngrams" -> ((s, dir) => {
      val cnt = Tables.load(s, dir, "documents")
        .select(col("lang"),
          explode(graft.operators.Dedup.ngrams(col("text"), 2)).as("g"))
        .groupBy(col("lang"), col("g"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Scale.topKByGroup(cnt, Seq("lang"),
          Seq(col("cnt").desc, col("g").asc), 10)
        .orderBy(col("lang"), col("cnt").desc, col("g"))
    }),

    // Streaming summary maintenance — the 7th streaming state kind
    // under the gate: per-lang token-length HISTOGRAMS maintained
    // across a 4-micro-batch file stream by the generic fold harness
    // (state ← mergeHistograms(state, histogram(batch))). The merge is
    // a commutative monoid, so the fixed point ≡ the one-shot batch
    // histogram for ANY micro-batch split — tx_hist_quantiles' oracle
    // gates the streamed state read out through the same quantile pick.
    // State is groups×bins rows FOREVER (never ∝ stream length); each
    // fold's work is ∝ the micro-batch.
    "stream_hist" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      val tmp = graft.Graft.scratchDir("graft_stream_hist")
      d.repartitionByRange(4, col("doc_id"))
        .write.mode("overwrite").parquet(tmp)
      try {
        val hist = graft.streaming.EventStream.streamFoldExact(
          s, tmp, d.schema, None,
          (st, b) => {
            val bh = Sketches.histogram(b, Seq("lang"), "n", 0L, 8L, 64)
            st.fold(bh)(Sketches.mergeHistograms(_, bh, Seq("lang")))
          }).get
        Sketches.histQuantiles(hist, Seq("lang"),
            Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)), 0L, 8L)
          .orderBy(col("lang"))
          .localCheckpoint(true)
      } finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // Streaming SKETCH maintenance — the 9th streaming state kind
    // under the gate: per-segment KMV (bottom-k) audience sketches
    // maintained across a 4-micro-batch order stream by the generic
    // fold harness (state ← mergeKmvSketches(state, kmvSketch(batch))).
    // merge(sk(A), sk(B)) = sk(A ∪ B) EXACTLY (the mergeable-summaries
    // contract), so the fixed point is micro-batch-split-independent
    // and the batch oracle re-derives the distinct estimates — which in
    // the exhaustive regime ARE the exact per-segment audience counts
    // (hash-matched, the q62 convention). State is #segments × k longs
    // FOREVER (never ∝ stream length); each fold is one partial-
    // aggregable batch sketch build + a k-longs-per-group merge — the
    // continuously-refreshed audience counter the reference recomputes
    // from scratch per campaign run (camp_vec_rcmn.py:272-293).
    "stream_kmv_sketch" -> ((s, dir) => {
      val k = 4096
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("seg"), col("o_custkey"),
          col("o_orderkey"))
      val tmp = graft.Graft.scratchDir("graft_stream_kmv")
      o.repartitionByRange(4, col("o_orderkey"))
        .write.mode("overwrite").parquet(tmp)
      try {
        val st = graft.streaming.EventStream.streamFoldExact(
          s, tmp, o.schema, None,
          (prev, b) => {
            val bs = Sketches.kmvSketch(b, Seq("seg"), "o_custkey", k)
            prev.fold(bs)(Sketches.mergeKmvSketches(_, bs, Seq("seg"),
              "sk_o_custkey", k))
          }).get
        st.select(col("seg"),
            round(Sketches.kmvDistinctEstimate(col("sk_o_custkey"), k))
              .cast("long").as("est_audience"))
          .orderBy(col("seg"))
          .localCheckpoint(true)
      } finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // Streaming CMS maintenance — the 10th streaming state kind under
    // the gate, completing the stream-maintained mergeable-summary
    // family (histograms: stream_hist; KMV: stream_kmv_sketch; CMS:
    // here): the term-frequency sketch folds across a 4-micro-batch
    // document stream (state ← mergeCms(state, cmsBuild(batch)) —
    // counts are a commutative monoid, so merge ≡ rebuild EXACTLY and
    // the fixed point is split-independent), then answers the same
    // exact-top-20 point queries as tx_cms_counts, whose oracle it
    // shares: the streamed estimates hash-match DuckDB's ONE-SHOT
    // re-derivation, which is only possible because the streamed state
    // equals the batch build bucket-for-bucket. State is depth×width
    // longs forever; each fold is one partial-aggregable batch pass +
    // a ≤depth·width-group merge.
    "stream_cms" -> ((s, dir) => {
      val depth = 3; val width = 1024
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      def toks(df: DataFrame) = df.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      val tmp = graft.Graft.scratchDir("graft_stream_cms")
      d.repartitionByRange(4, col("doc_id"))
        .write.mode("overwrite").parquet(tmp)
      try {
        val cms = graft.streaming.EventStream.streamFoldExact(
          s, tmp, d.schema, None,
          (prev, b) => {
            val bs = Sketches.cmsBuild(toks(b).select(col("w")), "w",
              depth, width)
            prev.fold(bs)(Sketches.mergeCms(_, bs))
          }).get
        val top = toks(d).groupBy(col("w"))
          .agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("w")).limit(20)
        Sketches.cmsEstimate(top, cms, "w", depth, width)
          .select(col("w"), col("exact_cnt"), col("est").as("est_cnt"),
            (col("est") >= col("exact_cnt")).as("ok"))
          .orderBy(col("exact_cnt").desc, col("w"))
          .localCheckpoint(true)
      } finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // HLL distinct-count maintenance: per-lang distinct sources and
    // doc_ids estimated from PERSISTABLE DataSketches binaries built per
    // batch and UNIONED (register-wise max ⇒ union-of-sketches ≡
    // sketch-of-union, so append-time maintenance loses nothing vs a
    // rebuild). Gated boolean like q12_audience_approx: the estimate
    // must land within ±5% of the exact count (lgK=14 ⇒ ~0.8% standard
    // error — the gate sits >6σ out), which holds regardless of
    // partition merge order where the raw estimate would not be
    // hash-stable.
    "tx_profile_sketch" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      def sk(part: DataFrame) =
        Sketches.distinctSketch(part, Seq("lang"),
          Seq("source", "doc_id"))
      val merged = Sketches.mergeSketches(
        sk(d.filter(pmod(col("doc_id"), lit(2)) === 0)),
        sk(d.filter(pmod(col("doc_id"), lit(2)) === 1)),
        Seq("lang"), Seq("sk_source", "sk_doc_id"))
      val est = Sketches.estimates(merged, Seq("sk_source", "sk_doc_id"))
      val exact = d.groupBy(col("lang")).agg(
        count_distinct(col("source")).as("x_source"),
        count_distinct(col("doc_id")).as("x_doc"))
      est.join(exact, "lang")
        .select(col("lang"),
          (abs(col("est_source") - col("x_source")) <=
            col("x_source") * 0.05).as("ok_source"),
          (abs(col("est_doc_id") - col("x_doc")) <=
            col("x_doc") * 0.05).as("ok_doc"))
        .orderBy(col("lang"))
    })
  )

  /** The CDC apply re-derived end to end: the four change CTEs, the
    * latest-by-seq resolution window, anti-join + union application,
    * and the per-status audit. Gates BOTH the one-shot batch apply
    * (q39_merge_upsert) and the out-of-order streaming fold
    * (stream_cdc), whose fixed point is the same snapshot. */
  private val cdcOracle: String =  // CTE chain only, ends at `applied`
      """WITH upd1 AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    round(CAST(o_totalprice * 1.1 AS DECIMAL(28,12)), 2)::DOUBLE
        |      AS o_totalprice,
        |    o_orderdate, 'X-UPD' AS o_orderpriority, 'U' AS op, 1 AS seq
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |upd2 AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    round(CAST(o_totalprice * 1.2 AS DECIMAL(28,12)), 2)::DOUBLE
        |      AS o_totalprice,
        |    o_orderdate, 'X-UPD2' AS o_orderpriority, 'U' AS op, 2 AS seq
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |dels AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority, 'D' AS op, 1 AS seq
        |  FROM orders WHERE o_orderkey % 50 = 1),
        |ins AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice, o_orderdate,
        |    o_orderpriority, 'U' AS op, 1 AS seq
        |  FROM orders WHERE o_orderkey % 50 = 2),
        |changes AS (
        |  SELECT * FROM upd1 UNION ALL SELECT * FROM upd2
        |  UNION ALL SELECT * FROM dels UNION ALL SELECT * FROM ins),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY seq DESC) AS rn
        |    FROM changes)
        |  WHERE rn = 1),
        |applied AS (
        |  SELECT o.* FROM orders o
        |  LEFT JOIN latest l ON o.o_orderkey = l.o_orderkey
        |  WHERE l.o_orderkey IS NULL
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM latest WHERE op <> 'D')""".stripMargin

  /** The audit select over a relation (shared tail of the CDC oracles). */
  private def auditSql(rel: String, extraCols: String = ""): String =
    s"""SELECT ${extraCols}o_orderstatus, count(*) AS n,
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS tot,
       |  max(o_orderkey) AS max_key
       |FROM $rel GROUP BY o_orderstatus""".stripMargin

  private val cdcOracleFull: String =
    cdcOracle + "\n" + auditSql("applied") + "\nORDER BY o_orderstatus"

  /** Time travel: version 1 = the raw snapshot, version 2 = the CDC
    * apply — both audited from the SAME change-derivation CTEs. */
  private val timeTravelOracle: String =
    cdcOracle + "\n" +
      auditSql("orders", "CAST(1 AS BIGINT) AS v, ") + "\nUNION ALL\n" +
      auditSql("applied", "CAST(2 AS BIGINT) AS v, ") +
      "\nORDER BY v, o_orderstatus"

  /** Token-length histogram quantiles re-derived end to end — exact
    * integer math, so both the batch merge (tx_hist_quantiles) and the
    * streamed fold (stream_hist) hash-match it. */
  private val histQuantOracle: String =
    raw"""WITH d AS (
         |  SELECT lang, len(string_split_regex(trim(text), '\s+')) AS n
         |  FROM documents),
         |h AS (
         |  SELECT lang,
         |    least(63, greatest(0,
         |      CAST(floor((CAST(n AS DOUBLE) - 0.0) / 8.0) AS BIGINT)))
         |      AS bin,
         |    count(*) AS cnt
         |  FROM d GROUP BY lang, bin),
         |c AS (
         |  SELECT lang, bin,
         |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin
         |      ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(cnt) OVER (PARTITION BY lang) AS total
         |  FROM h)
         |SELECT lang,
         |  min(CASE WHEN cum >= ceil(total * 0.5) THEN bin * 8 END) AS p50,
         |  min(CASE WHEN cum >= ceil(total * 0.9) THEN bin * 8 END) AS p90,
         |  min(CASE WHEN cum >= ceil(total * 0.99) THEN bin * 8 END) AS p99
         |FROM c GROUP BY lang ORDER BY lang""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q39_merge_upsert" -> cdcOracleFull,
    "stream_cdc" -> cdcOracleFull,
    "q49_time_travel" -> timeTravelOracle,

    "q40_scd2" -> scd2Oracle,

    // the streamed fold's fixed point IS the one-shot interval build
    // (scd2Apply ≡ rebuild under the append-only regime the
    // time-ordered source guarantees), so the stream shares q40's
    // full-history oracle verbatim
    "stream_scd2" -> scd2Oracle,

    // the oracle is the FULL-history rebuild — the hash gate proves
    // incremental apply ≡ rebuild over (existing rows ∪ batch)
    "q58_scd2_apply" ->
      """WITH src AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(floor(value / 20.0) AS BIGINT) AS band
        |  FROM events WHERE user_id < 5),
        |marked AS (
        |  SELECT user_id, ts, event_id, band,
        |    CASE WHEN lag(band) OVER w IS NULL OR lag(band) OVER w <> band
        |         THEN 1 ELSE 0 END AS chg
        |  FROM src
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |islands AS (
        |  SELECT user_id, ts, band,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM marked),
        |runs AS (
        |  SELECT user_id, island, min(band) AS band,
        |    min(ts) AS valid_from
        |  FROM islands GROUP BY user_id, island),
        |iv AS (
        |  SELECT user_id, band, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
        |      AS valid_to
        |  FROM runs)
        |SELECT user_id, band, epoch_us(valid_from) AS valid_from,
        |  epoch_us(valid_to) AS valid_to,
        |  valid_to IS NULL AS is_current
        |FROM iv""".stripMargin,

    "q41_bucket_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // round-trip gate: the aggregate over the bucketed+sorted layout
    // must equal the same aggregate over the raw table — a lost or
    // duplicated row in the write breaks the hash
    "q41_bucket_build" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "tx_stats_incremental" ->
      raw"""SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
         |    AS n_tokens
         |FROM documents GROUP BY lang, source
         |ORDER BY lang, source""".stripMargin,

    // full recompute of the maintained join view — the incremental
    // merge must land on this exactly (decimal-exact revenue)
    "q42_ivm_join" ->
      """SELECT n_name, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // intervals re-derived from the even half (q40's CTEs), the as-of
    // pick via DuckDB's native ASOF LEFT JOIN
    "q51_scd2_lookup" ->
      """WITH src AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(floor(value / 20.0) AS BIGINT) AS band
        |  FROM events WHERE user_id < 5),
        |hist AS (SELECT * FROM src WHERE event_id % 2 = 0),
        |marked AS (
        |  SELECT user_id, ts, event_id, band,
        |    CASE WHEN lag(band) OVER w IS NULL OR lag(band) OVER w <> band
        |         THEN 1 ELSE 0 END AS chg
        |  FROM hist
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |islands AS (
        |  SELECT user_id, ts, band,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM marked),
        |runs AS (
        |  SELECT user_id, island, min(band) AS band,
        |    min(ts) AS valid_from
        |  FROM islands GROUP BY user_id, island),
        |facts AS (
        |  SELECT user_id, ts, event_id FROM src WHERE event_id % 2 = 1)
        |SELECT f.user_id, epoch_us(f.ts) AS ts_us, f.event_id,
        |  r.band AS dim_band
        |FROM facts f ASOF LEFT JOIN runs r
        |  ON f.user_id = r.user_id AND f.ts >= r.valid_from
        |ORDER BY f.user_id, ts_us, f.event_id""".stripMargin,

    // the bloom-pruned lookup must equal the direct IN scan
    "q50_bloom_lookup" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (11, 55, 222, 333, 444)
        |ORDER BY doc_id""".stripMargin,

    // the pruned read must equal the full-scan filter
    "q43_pruned_scan" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE n_chars BETWEEN 200 AND 400
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // the histogram, cumulative, and rank-pick arithmetic re-derived in
    // full — exact integer math end to end, so this hash-matches;
    // stream_hist's folded state must land on the same rows
    "tx_hist_quantiles" -> histQuantOracle,
    "stream_hist" -> histQuantOracle,

    // exhaustive regime: the streamed KMV state's estimates ARE the
    // exact per-segment distinct counts (q62/q63 convention)
    "stream_kmv_sketch" ->
      """SELECT o_orderpriority AS seg,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS est_audience
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // bigram derivation, counts, and the rank-pick re-derived; ties
    // broken by the (cnt DESC, g ASC) total order on both sides
    "tx_top_ngrams" ->
      raw"""WITH base AS (
         |  SELECT lang, string_split_regex(trim(text), '\s+') AS w
         |  FROM documents),
         |gr AS (
         |  SELECT lang, unnest(list_transform(range(1, len(w)),
         |    i -> w[i] || ' ' || w[i+1])) AS g
         |  FROM base),
         |cnt AS (SELECT lang, g, count(*) AS cnt FROM gr GROUP BY lang, g),
         |r AS (
         |  SELECT lang, g, cnt,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY cnt DESC, g) AS rn
         |  FROM cnt)
         |SELECT lang, g, CAST(cnt AS BIGINT) AS cnt FROM r WHERE rn <= 10
         |ORDER BY lang, cnt DESC, g""".stripMargin,

    // exact sizes + overlap hash-checked; the sketch estimate gated
    "q57_audience_overlap" ->
      """WITH a AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_totalprice > 480000),
        |b AS (
        |  SELECT o_custkey FROM orders
        |  GROUP BY o_custkey HAVING count(*) >= 17)
        |SELECT
        |  CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
        |  CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
        |  CAST((SELECT count(*) FROM
        |    (SELECT * FROM a INTERSECT SELECT * FROM b)) AS BIGINT)
        |    AS exact_overlap,
        |  TRUE AS ok""".stripMargin,

    // the whole sketch re-derived: every bucket count, every min-over-
    // rows estimate — integer/md5 arithmetic, hash-exact
    "tx_cms_counts" -> cmsCountsOracle,

    // IDENTICAL output by construction: the streamed CMS fixed point
    // equals the one-shot build bucket-for-bucket (counts are a
    // commutative monoid), so the same one-shot re-derivation gates
    // the streaming path — the dd_contamination_bloom shared-oracle
    // convention.
    "stream_cms" -> cmsCountsOracle,

    // exhaustive-sketch regime at oracle SF: est_overlap hash-matches
    // the exact overlap (stronger than a boolean gate); ok carries the
    // ±5%·overlap contract for estimating scale
    "q62_kmv_persisted" ->
      """WITH seg AS (
        |  SELECT DISTINCT o_orderpriority AS seg, o_custkey FROM orders),
        |sz AS (SELECT seg, CAST(count(*) AS BIGINT) AS n
        |       FROM seg GROUP BY seg)
        |SELECT a.seg AS seg_a, b.seg AS seg_b, sa.n AS n_a, sb.n AS n_b,
        |  CAST(count(*) AS BIGINT) AS exact_overlap,
        |  CAST(count(*) AS BIGINT) AS est_overlap,
        |  TRUE AS ok
        |FROM seg a
        |JOIN seg b ON a.o_custkey = b.o_custkey AND a.seg < b.seg
        |JOIN sz sa ON sa.seg = a.seg
        |JOIN sz sb ON sb.seg = b.seg
        |GROUP BY 1, 2, 3, 4
        |ORDER BY 1, 2""".stripMargin,

    // exhaustive-regime closure: union/difference estimates hash-match
    // the exact sizes; gates TRUE by the same argument as q62
    "q63_kmv_setops" ->
      """WITH seg AS (
        |  SELECT DISTINCT o_orderpriority AS seg, o_custkey FROM orders),
        |sz AS (SELECT seg, CAST(count(*) AS BIGINT) AS n
        |       FROM seg GROUP BY seg),
        |ov AS (
        |  SELECT a.seg AS seg_a, b.seg AS seg_b,
        |    CAST(count(*) AS BIGINT) AS ov
        |  FROM seg a JOIN seg b
        |    ON a.o_custkey = b.o_custkey AND a.seg < b.seg
        |  GROUP BY 1, 2)
        |SELECT ov.seg_a, ov.seg_b,
        |  sa.n + sb.n - ov.ov AS exact_union,
        |  sa.n + sb.n - ov.ov AS est_union,
        |  sa.n - ov.ov AS exact_diff,
        |  sa.n - ov.ov AS est_diff,
        |  TRUE AS ok_union, TRUE AS ok_diff
        |FROM ov
        |JOIN sz sa ON sa.seg = ov.seg_a
        |JOIN sz sb ON sb.seg = ov.seg_b
        |ORDER BY 1, 2""".stripMargin,

    // boolean-oracled like q12_audience_approx / tx_lengths_approx: the
    // oracle asserts the ±5% gate held for every lang
    "tx_profile_sketch" ->
      """SELECT DISTINCT lang, TRUE AS ok_source, TRUE AS ok_doc
        |FROM documents ORDER BY lang""".stripMargin,

    "tx_profile" ->
      """SELECT 'lang' AS col_name, count(*) - count(lang) AS n_null,
        |  count(DISTINCT lang) AS n_distinct,
        |  CAST(min(lang) AS VARCHAR) AS vmin,
        |  CAST(max(lang) AS VARCHAR) AS vmax
        |FROM documents
        |UNION ALL
        |SELECT 'source', count(*) - count(source), count(DISTINCT source),
        |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*) - count(n_chars),
        |  count(DISTINCT n_chars),
        |  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |FROM documents""".stripMargin
  )
}
