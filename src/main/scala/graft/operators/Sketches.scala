package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable statistical summaries — the sketch layer that keeps corpus
  * statistics maintainable at 100 TB. Exact distinct counts and exact
  * percentiles each need a full shuffle over the corpus per refresh; a
  * MERGEABLE summary (Agarwal 2012's "mergeable summaries" contract:
  * `summary(A ∪ B) = merge(summary(A), summary(B))`) is built once per
  * batch and merged in state-sized work, the
  * [[IncrementalAgg]] monoid contract extended to approximate and
  * distribution-shaped statistics:
  *
  *  - '''HLL distinct sketches''' ([[distinctSketch]]/[[mergeSketches]]):
  *    Spark's DataSketches HLL binaries as a persisted, group-keyed
  *    artifact. Union-of-sketches has the same register array as
  *    sketch-of-union (register-wise max), so append-time maintenance
  *    loses nothing vs a rebuild — and the 1.5 KB/group binary replaces
  *    the per-refresh `count_distinct` shuffle of the raw corpus.
  *  - '''Fixed-bin histograms''' ([[histogram]]/[[histQuantiles]]): exact
  *    long bin counts (clamped integral-division binning — engine-exact
  *    integer math, so the DuckDB gate hash-matches, unlike a
  *    float-binned or sketched quantile), merged by re-summing; rank
  *    quantiles read off the merged cumulative in one tiny window pass.
  *    `nBins` rows per group of state vs the corpus-wide sort an exact
  *    percentile costs.
  *
  * Semantics reference: the reference's serving refresh recomputes its
  * statistics from scratch each build (`nl_targeting_save.py:52-66`);
  * these summaries are the incremental form of that contract.
  */
object Sketches {

  /** Per-group HLL distinct sketches of each of `valueCols` as binary
    * columns `sk_<valueCol>`: a persistable, mergeable summary (lgK=14 →
    * ~0.8% relative standard error in dense mode; exact below ~k/4
    * distincts while the sketch is still a coupon set). All sketches
    * ride ONE pass. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String], lgK: Int = 14): DataFrame = {
    require(valueCols.nonEmpty, "distinctSketch of zero columns")
    val aggs = valueCols.map(c => hll_sketch_agg(col(c), lgK).as(s"sk_$c"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge sketch relations (state + batch): union + per-group HLL
    * union. Register-wise max, so merge order never changes the result —
    * batches can land in any grouping, the same associativity contract
    * as [[IncrementalAgg.mergeStats]]. */
  def mergeSketches(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      sketchCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCols.head)).as(sketchCols.head),
        sketchCols.tail.map(c => hll_union_agg(col(c)).as(c)): _*)

  /** Read estimates off sketch columns: each `sk_x` gains an `est_x`. */
  def estimates(sketches: DataFrame, sketchCols: Seq[String]): DataFrame =
    sketchCols.foldLeft(sketches) { (df, c) =>
      df.withColumn(s"est_${c.stripPrefix("sk_")}",
        hll_sketch_estimate(col(c)))
    }

  // ------------------------------------------------ KMV (bottom-k)

  private val TwoTo63 = math.pow(2.0, 63)

  /** Per-group KMV (bottom-k) sketches of `keyCol` as a sorted
    * `array<long>` column `sk_<keyCol>` — the INTERSECTABLE member of
    * the sketch family ([[graft.functions.KmvSketchAggregator]]), now a
    * persisted artifact like the HLL binaries: write the result next to
    * the data, read it back in any later session, and
    * [[mergeKmvSketches]]/[[kmvIntersectEstimate]] answer cross-batch
    * overlap questions with NO re-scan of either segment. One
    * partial-aggregable pass (map-side partials are the aggregator's
    * bounded 2k-long buffers); k longs per group of output. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    val agg = udaf(new graft.functions.KmvSketchAggregator(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(col(keyCol)).as(s"sk_$keyCol"))
  }

  /** Merge persisted KMV sketch relations (state + batch): union +
    * per-group union-then-truncate — `merge(sk(A), sk(B)) = sk(A ∪ B)`
    * exactly (the mergeable-summaries contract, same as the HLL path),
    * so append-time maintenance loses nothing vs a rebuild. Pure
    * column functions (flatten → distinct → sort → slice) over
    * batch-count·k longs per group — state-sized, never the corpus. */
  def mergeKmvSketches(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      sketchCol: String, k: Int): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(array_distinct(
        flatten(collect_list(col(sketchCol))))), 1, k).as(sketchCol))

  /** Merge EVERY sketch row of `df` into one global sketch (one row,
    * column `sketchCol`) — the query-time serving merge: pick the
    * relevant segment sketches with a semi-join, fold them here, read
    * the estimate off the result. Union-then-truncate nests
    * associatively, so this equals the sketch of the union of all
    * selected segments; the input is sketch rows (k longs each), never
    * the corpus, and zero selected rows fold to the empty sketch
    * (estimate 0). */
  def mergeAllKmv(df: DataFrame, sketchCol: String, k: Int): DataFrame =
    df.agg(slice(array_sort(array_distinct(
      flatten(collect_list(col(sketchCol))))), 1, k).as(sketchCol))

  /** Normalized retention threshold θ of a sketch column (1.0 while the
    * sketch is exhaustive — fewer than k values — else kth/2⁶³). */
  def kmvTheta(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(1.0))
      .otherwise(element_at(sk, k).cast("double") / lit(TwoTo63))

  /** Distinct-count estimate off a sketch column: exact below k, else
    * the (k−1)/u₍ₖ₎ estimator — column-native, codegen-friendly. */
  def kmvDistinctEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) / kmvTheta(sk, k))

  /** Column-native union of two sketch columns — union-then-truncate,
    * the pairwise expression form of [[mergeKmvSketches]]: the result
    * IS the sketch of A ∪ B (bottom-k of the united hash sets), so it
    * nests — (A ∪ B) ∪ C composes associatively like the relation-level
    * merge. */
  def kmvUnionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Union-size estimate |A ∪ B|: the distinct estimate of the union
    * sketch. Exact while the UNION is exhaustive (< k distinct hashes
    * across both); else the same (k−1)/θ estimator as any single
    * sketch — error relative to the union size. */
  def kmvUnionEstimate(a: Column, b: Column, k: Int): Column =
    kmvDistinctEstimate(kmvUnionSketch(a, b, k), k)

  /** Difference-size estimate |A \ B| = est|A| − est|A ∩ B| (r12
    * verdict #8) — composes the two existing estimators, closing KMV
    * set algebra (∩ / ∪ / \) over persisted sketches: segment
    * arithmetic with no re-scan of either segment. Exact while both
    * sketches are exhaustive; in the estimating regime the error is
    * bounded by est|A|'s (relative to |A|) plus the intersection's
    * (relative to the overlap), so gate against ~5% of |A|. Clamped at
    * zero (r13 advice): the two estimators carry independent noise, so
    * when A is nearly a subset of B the raw difference can dip
    * negative — a set size never can. */
  def kmvDifferenceEstimate(a: Column, b: Column, k: Int): Column =
    greatest(lit(0.0),
      kmvDistinctEstimate(a, k) - kmvIntersectEstimate(a, b, k))

  /** Intersection estimate between two sketch columns: common hashes
    * below the shared threshold, scaled by 1/θ — the column-native twin
    * of [[graft.functions.KmvSketchAggregator.estimateIntersection]]
    * (same double-cut comparison, so the two agree bit-for-bit). Error
    * is relative to the OVERLAP; exact while both sketches are
    * exhaustive. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val th = least(kmvTheta(a, k), kmvTheta(b, k))
    val cut = th * lit(TwoTo63)
    val common = size(filter(array_intersect(a, b),
      x => x.cast("double") < cut))
    common.cast("double") / th
  }

  // ------------------------------------------- Count-Min (CM sketch)

  /** Count-Min sketch of an item column as a RELATION `(r, b, cnt)` —
    * Cormode & Muthukrishnan 2005: `depth` independent hash rows, each
    * `width` buckets; an item's count estimate is the MIN over its
    * `depth` buckets, never an underestimate. The hash is the repo's
    * md5 convention (`shingleHash` of a row-salted item), so the DuckDB
    * oracle re-derives every bucket and the sketch is HASH-EXACT across
    * engines — unlike a float sketch there is nothing to gate, the
    * estimates themselves match.
    *
    * Build is one partial-aggregable pass (items fan out ×depth
    * map-side, the exchange carries ≤ depth·width groups); the sketch
    * is depth·width longs of state — persistable parquet like the
    * KMV/HLL artifacts, mergeable by [[mergeCms]] (counts are a
    * commutative monoid: merge ≡ rebuild exactly). Zero-count buckets
    * are absent (sparse). */
  def cmsBuild(df: DataFrame, itemCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape $depth x $width")
    val rows = (0 until depth).map { r =>
      struct(lit(r).as("r"),
        pmod(graft.operators.Dedup.shingleHash(
          concat(lit(s"cms:$r:"), col(itemCol))), lit(width.toLong))
          .as("b"))
    }
    df.select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge CMS relations (state + batch): union + re-sum per bucket —
    * exact, any split, any order. */
  def mergeCms(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("r"), col("b"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query a CMS for each row of `items`: min over the depth
    * buckets (absent bucket = 0). The sketch side is depth·width
    * bounded — broadcast — so the probe is a map-side join however
    * large the query relation is.
    *
    * Row semantics (r12 advice): the probe keys on a generated
    * per-row id, NOT on the items' column values — duplicate query
    * rows each get their own output row, and items relations that
    * already carry columns named `r`/`b`/`cnt` cannot collide with the
    * probe's internals (those are uniquely prefixed and the sketch's
    * columns renamed before the join). Reserved names — the OUTPUT
    * column `est` and every `_graft_cms_*` internal — are rejected up
    * front with a clear message (r13 advice: a `_graft_cms_r` items
    * column used to surface later as an opaque ambiguous-reference
    * AnalysisException instead). Returns `items.* + est`, one row per
    * input row. */
  def cmsEstimate(items: DataFrame, sketch: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    require(!items.columns.contains("est"),
      "cmsEstimate appends an `est` column; rename the existing one")
    val rid = "_graft_cms_rid"
    Seq(rid, "_graft_cms_r", "_graft_cms_b", "_graft_cms_cnt").foreach(n =>
      require(!items.columns.contains(n),
        s"$n is reserved by cmsEstimate; rename the items column"))
    val probes = items
      .withColumn(rid, monotonically_increasing_id())
      .select(col("*"),
        posexplode(array((0 until depth).map(r =>
          pmod(graft.operators.Dedup.shingleHash(
            concat(lit(s"cms:$r:"), col(itemCol))), lit(width.toLong))): _*))
          .as(Seq("_graft_cms_r", "_graft_cms_b")))
    val sk = sketch.select(col("r").as("_graft_cms_r"),
      col("b").as("_graft_cms_b"), col("cnt").as("_graft_cms_cnt"))
    val aggs = items.columns.map(c => first(col(c)).as(c)) :+
      min(coalesce(col("_graft_cms_cnt"), lit(0L))).as("est")
    probes
      .join(broadcast(sk), Seq("_graft_cms_r", "_graft_cms_b"), "left_outer")
      .groupBy(col(rid))
      .agg(aggs.head, aggs.tail: _*)
      .drop(rid)
  }

  /** Clamped equi-width bin of a long value:
    * `floor((v - lo) / width)` into `[0, nBins)`, under/overflow pinned
    * to the edge bins. The double division is EXACT floor division for
    * `|v - lo| < 2^53` (the numerator's fractional remainder `r/width ≥
    * 1/width` dwarfs the quotient's half-ulp, so rounding can never
    * cross the integer boundary) — the same value DuckDB's float `/` +
    * `floor` computes, so the bin ids hash-match across engines. */
  def binOf(v: Column, lo: Long, width: Long, nBins: Int): Column = {
    require(width > 0 && nBins > 0, s"bad histogram shape $width x $nBins")
    least(lit(nBins - 1L),
      greatest(lit(0L),
        floor((v.cast("double") - lit(lo.toDouble)) / lit(width.toDouble))
          .cast("long")))
  }

  /** Exact per-group fixed-bin histogram of `valueCol`:
    * `(groupCols…, bin, cnt)`. One partial-aggregable pass; mergeable by
    * [[mergeHistograms]] re-summing. Empty bins are absent (sparse). */
  def histogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Long, width: Long, nBins: Int): DataFrame =
    df.groupBy((groupCols.map(col) :+
        binOf(col(valueCol), lo, width, nBins).as("bin")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge histogram relations (state + batch): union + re-sum — the
    * commutative-monoid merge, exact by construction. */
  def mergeHistograms(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Rank quantiles from a histogram: for each `(name, p)`, the LEFT
    * EDGE (`lo + bin·width`, a long) of the first bin whose cumulative
    * count reaches `ceil(p·total)` — the histogram's resolution-bounded
    * answer, exact integer output so the DuckDB gate hash-matches.
    * One window pass over `nBins` rows per group, nothing touches the
    * corpus. */
  def histQuantiles(hist: DataFrame, groupCols: Seq[String],
      ps: Seq[(String, Double)], lo: Long, width: Long): DataFrame = {
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("cum",
        sum(col("cnt")).over(byGroup.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cnt")).over(byGroup))
    val picks = ps.map { case (name, p) =>
      min(when(col("cum") >= ceil(col("total") * lit(p)),
        lit(lo) + col("bin") * lit(width))).as(name)
    }
    cum.groupBy(groupCols.map(col): _*).agg(picks.head, picks.tail: _*)
  }
}
