package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword (BM25) retrieval and hybrid rank fusion — the lexical
  * counterpart of the vector search the reference is built around
  * (`/root/reference/camp_vec_rcmn.py:44` scores by embedding only; a
  * production retrieval deployment runs BOTH modalities and fuses).
  *
  * Scale design:
  *  - The query-term set is tiny and ALWAYS broadcast; the posting
  *    explode filters to query terms BEFORE any shuffle, so the grouped
  *    term-frequency work is ∝ matching tokens, not corpus tokens.
  *  - Document length (`dl`) is `size(tokens)` — a map-only pass, no
  *    explode; corpus stats (N, avgdl) are a 1-row broadcast.
  *  - Per-term contributions are cast to DECIMAL(28,12) before the
  *    per-doc sum, so the score is order-independent (the repo's
  *    decimal-sum convention) and the whole ranking hash-matches.
  *  - Final top-k is `orderBy.limit` → TakeOrderedAndProject (partial
  *    per-partition top-k, driver merges k·partitions rows).
  *
  * BM25 per Robertson–Spärck Jones with the +1 idf form (as used by
  * Lucene): `idf = ln(1 + (N − df + ½)/(df + ½))`,
  * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`.
  */
object Retrieval {

  /** "More-like-this" query terms from a seed document: the first `n`
    * DISTINCT tokens in order of first appearance. Bounded output
    * (`limit n`), meant to be broadcast into [[bm25TopK]]. */
  def seedTerms(docs: DataFrame, idCol: String, textCol: String,
      seedId: Long, n: Int): DataFrame =
    docs.filter(col(idCol) === seedId)
      .select(posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "term")))
      .groupBy(col("term")).agg(min(col("pos")).as("first_pos"))
      .orderBy(col("first_pos"), col("term"))
      .limit(n)
      .select(col("term"))

  /** [[seedTerms]] for a SET of seed documents at once: `(qid, term)`,
    * `n` first-appearance-distinct terms per seed, the rank window
    * partitioned by seed. The batch-retrieval twin of the single form. */
  def seedTermsBatch(docs: DataFrame, idCol: String, textCol: String,
      seedIds: Seq[Long], n: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("first_pos"), col("term"))
    docs.filter(col(idCol).isin(seedIds: _*))
      .select(col(idCol).as("qid"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy(col("qid"), col("term")).agg(min(col("pos")).as("first_pos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select(col("qid"), col("term"))
  }

  /** Per-(qid, doc) BM25 scores for a (small, broadcast) query-term
    * relation `(qid, term)`. The per-(doc, term) tf/df work happens ONCE
    * over the DISTINCT term set regardless of how many queries share a
    * term; the bounded `(qid, term)` relation then fans contributions out
    * to query ids — so a whole query batch costs one corpus pass plus
    * broadcast joins. Returns `(qid, idCol, score)` (decimal-summed,
    * rounded — hash-stable). */
  private def bm25Scored(docs: DataFrame, qterms: DataFrame,
      k1: Double, b: Double, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.spread(docs)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol)))
        .as("term"))
    val dl = docs.select(col(idCol),
      size(TextAnalysis.tokens(col(textCol))).as("dl"))
    val uniq = qterms.select(col("term")).distinct()
    val tf = toks.join(broadcast(uniq), Seq("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    scoreTf(tf, dl, qterms, k1, b, idCol)
  }

  /** Persisted inverted-index form of the BM25 corpus state: the posting
    * relation `(term, idCol, tf)` and the document-length relation
    * `(idCol, dl)`. Everything a query needs — per-term df, corpus N,
    * avgdl — derives from these two with bounded aggregations, so the
    * index is built ONCE (one tokenize+group pass over the corpus) and
    * serves any number of queries that never touch the raw text again
    * (the `saveIvf` build-once/serve-many shape, lexical edition).
    *
    * `tombs` (one id column, named as the index's id column) records
    * pending deletes ([[deleteFromBm25Index]]) — the r15 tombstone
    * family's lexical member. BOTH index relations are viewed through
    * the tombstones at query time, and because df, N and avgdl are all
    * DERIVED from those two relations inside the scorer, deleted
    * documents leave the corpus statistics too: delete-then-search
    * scores equal a from-scratch rebuild on the survivors exactly
    * (spec-pinned) — the subtle half of lexical deletion, since a
    * tombstone filter on results alone would leave every surviving
    * score drifted by the ghosts' df/avgdl mass. */
  case class Bm25Index(postings: DataFrame, docLens: DataFrame,
      tombs: Option[DataFrame] = None)

  /** Delete documents from a BM25 index by id — work ∝ tombstones (a
    * distinct + union recording the ids; no posting row moves until
    * [[compactBm25Index]]). Incremental counterpart of the reference's
    * truncate-and-reload refresh
    * (/root/reference/nl_targeting_save.py:52-66), the `deleteFromIvf`
    * convention applied to the lexical index. */
  def deleteFromBm25Index(index: Bm25Index, ids: DataFrame,
      idCol: String = "doc_id"): Bm25Index = {
    val t = ids.select(col(idCol)).distinct()
    // distinct across CALLS too: an idempotent re-crawl pipeline may
    // delete the same ids twice, and duplicated tombstones would
    // inflate bm25TombstoneFraction (even past 1.0) and fire spurious
    // compactions
    index.copy(tombs =
      Some(index.tombs.fold(t)(_.unionByName(t).distinct())))
  }

  /** The live (tombstones-applied) views every query reads. The
    * tombstone relation is tiny relative to the corpus — both
    * anti-joins broadcast. */
  private[graft] def livePostings(index: Bm25Index): DataFrame =
    index.tombs.fold(index.postings)(t =>
      index.postings.join(broadcast(t), t.columns.toSeq, "left_anti"))

  private[graft] def liveDocLens(index: Bm25Index): DataFrame =
    index.tombs.fold(index.docLens)(t =>
      index.docLens.join(broadcast(t), t.columns.toSeq, "left_anti"))

  /** Fold pending tombstones into both relations — the threshold-
    * triggered maintenance pass (each query pays the anti-joins until
    * compaction). */
  def compactBm25Index(index: Bm25Index): Bm25Index =
    Bm25Index(livePostings(index), liveDocLens(index), None)

  /** Pending-tombstone fraction — the compaction trigger (two counts;
    * compact when it crosses the deployment's threshold, ~0.1). Only
    * tombstones that actually HIT the index count (semi-join against
    * docLens — the rows the query-time anti-joins pay for): deletes of
    * absent ids are free debt and must not fire compaction, and an
    * empty index reads 0.0, not 1.0 (r16 ADVICE). */
  def bm25TombstoneFraction(index: Bm25Index): Double = index.tombs match {
    case None => 0.0
    case Some(t) =>
      val total = index.docLens.count()
      if (total == 0) 0.0
      else t.join(index.docLens, t.columns.toSeq, "left_semi")
        .count().toDouble / total
  }

  /** Persist ONLY the tombstones — the delete path's write (load →
    * [[deleteFromBm25Index]] → this): work ∝ tombstones, the
    * term-range-clustered posting files on disk are untouched. */
  def saveBm25Tombstones(index: Bm25Index, dir: String): Unit =
    index.tombs match {
      case Some(t) => t.write.mode("overwrite").parquet(s"$dir/tombs")
      case None =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/tombs")
        val fs = p.getFileSystem(index.docLens.sparkSession
          .sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true): Unit
    }

  /** One corpus pass: explode → (idCol, term, tf) postings + map-only
    * doc lengths. */
  def buildBm25Index(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Bm25Index =
    Bm25Index(
      TextAnalysis.spread(docs)
        .select(col(idCol), explode(TextAnalysis.tokens(col(textCol)))
          .as("term"))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")),
      docs.select(col(idCol),
        size(TextAnalysis.tokens(col(textCol))).as("dl")))

  /** Ingestion append: tokenize ONLY the new batch and union — work ∝
    * batch, the corpus postings are never rebuilt (the `appendIvf`
    * contract). Caller guarantees the batch's ids are new (in
    * particular, not a tombstoned id — re-adding a deleted id needs
    * [[compactBm25Index]] first). Pending tombstones CARRY OVER:
    * dropping them here would silently resurrect deleted documents on
    * the next ingest (spec-pinned in TombstoneSpec). */
  def appendBm25Index(index: Bm25Index, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Bm25Index = {
    val b = buildBm25Index(newDocs, idCol, textCol)
    Bm25Index(index.postings.unionByName(b.postings),
      index.docLens.unionByName(b.docLens), index.tombs)
  }

  /** Persist the index term-range-clustered: postings sorted by term
    * within term-range files, so a query-term probe prunes to the files
    * whose [min, max] term ranges cover its terms (parquet footer
    * stats) — the on-disk analog of a posting-list seek. */
  def saveBm25Index(index: Bm25Index, dir: String): Unit = {
    index.postings
      .repartitionByRange(col("term"))
      .sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$dir/postings")
    index.docLens.write.mode("overwrite").parquet(s"$dir/doclens")
    saveBm25Tombstones(index, dir)
  }

  def loadBm25Index(spark: org.apache.spark.sql.SparkSession,
      dir: String): Bm25Index = {
    val tombsPath = new org.apache.hadoop.fs.Path(s"$dir/tombs")
    val fs = tombsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Bm25Index(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclens"),
      if (fs.exists(tombsPath)) Some(spark.read.parquet(s"$dir/tombs"))
      else None)
  }

  /** Score from a prebuilt [[Bm25Index]]: the query-term filter prunes
    * the postings scan (term-range files when loaded from
    * [[saveBm25Index]]); df/stats are bounded aggregations over the
    * LIVE (tombstones-applied) views, so pending deletes leave both the
    * result set and the statistics. Identical scores to [[bm25TopK]]
    * over the live corpus by construction (spec-pinned). */
  def bm25IndexTopK(index: Bm25Index, terms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id"): DataFrame = {
    val qterms = terms.select(lit(0L).as("qid"), col("term"))
    val uniq = qterms.select(col("term")).distinct()
    val tf = livePostings(index).join(broadcast(uniq), Seq("term"))
    scoreTf(tf, liveDocLens(index), qterms, k1, b, idCol)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** The shared BM25 scoring tail over a pre-filtered `(idCol, term,
    * tf)` relation — the arithmetic both the ad-hoc and the
    * index-backed paths route through (one association order, one
    * oracle). */
  private def scoreTf(tf: DataFrame, dl: DataFrame, qterms: DataFrame,
      k1: Double, b: Double, idCol: String): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val df = tf.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"))
    val contrib = tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), Seq("term"))
      .select(col("qid"), col(idCol),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1)
            * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("c"))
    contrib.groupBy(col("qid"), col(idCol))
      .agg(sum(col("c").cast("decimal(28,12)")).as("sdec"))
      .select(col("qid"), col(idCol),
        round(col("sdec"), 4).cast("double").as("score"))
  }

  /** BM25 top-`k` documents for a (small, broadcast) query-term relation
    * `(term: string)`. Returns `(idCol, score)` ordered score desc, id —
    * only documents containing ≥1 query term appear. Final top-k is
    * `orderBy.limit` → TakeOrderedAndProject. */
  def bm25TopK(docs: DataFrame, terms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bm25Scored(docs, terms.select(lit(0L).as("qid"), col("term")),
        k1, b, idCol, textCol)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Every matching document's BM25 score, un-truncated — `(idCol,
    * score)` for each document containing ≥1 query term (the relation
    * [[bm25TopK]] takes its top-k of). Output is bounded by the query
    * terms' posting sizes, never the corpus, so a downstream aggregation
    * (e.g. [[chunkDocs]] passage scores max-reduced per parent document)
    * stays proportional to matches. */
  def bm25Scores(docs: DataFrame, terms: DataFrame,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bm25Scored(docs, terms.select(lit(0L).as("qid"), col("term")),
      k1, b, idCol, textCol).drop("qid")

  /** Fixed-size overlapping token-window chunks — the RAG passage split.
    * Each document becomes `ceil((n − chunk)/stride) + 1` chunks (one
    * when `n ≤ chunk`); chunk `i` holds tokens `[i·stride+1, i·stride
    * +chunk]`, so consecutive chunks overlap by `chunk − stride` tokens
    * and every token position is covered. Returns `(idCol, chunk_id,
    * textCol)` with `chunk_id = id·idScale + i` (caller guarantees
    * per-doc chunk counts stay under `idScale`).
    *
    * Scale design: pure column math — one bounded `sequence` explode
    * (fan-out ≤ n/stride per doc, spread across the cluster first per
    * the repo's Generate convention) and closed-form slicing; no
    * shuffles beyond the spread, no per-row UDFs. The chunk relation
    * feeds any retriever unchanged (BM25 here; an embedding index would
    * encode the same rows). */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int, idScale: Long = 1000L): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      s"need 0 < stride <= chunkTokens, got ($chunkTokens, $stride)")
    TextAnalysis.spread(docs)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")).cast("long"))
      .withColumn("_nc",
        when(col("_n") <= chunkTokens, lit(1L))
          .otherwise(lit(1L) + floor(
            (col("_n") - lit(chunkTokens.toLong) + lit(stride - 1L))
              .cast("double") / lit(stride.toDouble)).cast("long")))
      .select(col(idCol),
        explode(sequence(lit(0L), col("_nc") - 1)).as("_ci"),
        col("_toks"))
      .select(col(idCol),
        (col(idCol) * idScale + col("_ci")).as("chunk_id"),
        array_join(
          slice(col("_toks"), (col("_ci") * stride + 1).cast("int"),
            lit(chunkTokens)),
          " ").as(textCol))
  }

  /** Batch BM25: top-`k` per query for a `(qid, term)` relation — one
    * corpus pass for the whole query set, per-query top-k via the
    * partial-aggregable [[Knn.groupedTopK]] (score desc, id asc — no
    * task ever sorts a query's whole match set). The lexical twin of the
    * batch ANN tiers. */
  def bm25BatchTopK(docs: DataFrame, qterms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Knn.groupedTopK(
      bm25Scored(docs, qterms, k1, b, idCol, textCol), k, idCol, "score")

  /** DPR-style HARD-NEGATIVE mining (Karpukhin et al. 2020, "Dense
    * Passage Retrieval" §4.2 — "BM25 negatives"): for each training
    * query, the top-ranked lexical hits that are NOT a known positive.
    * Random negatives are trivially separable; the negatives that
    * actually move a dual encoder are the ones a strong lexical
    * retriever ranks high — exactly this relation. `positives` is a
    * `(qid, idCol)` relation (multiple positives per query supported);
    * candidates overfetch `kNeg + overfetch` per query so dropping the
    * positives cannot starve a query of negatives.
    *
    * Scale shape: one [[bm25BatchTopK]] pass (one corpus scan for the
    * whole query batch, partial-aggregable grouped top-k), a broadcast
    * anti-join against the positives (|positives| ≈ |queries| — label
    * data, always broadcastable), and a result-sized re-rank window.
    * Returns `(qid, neg_id, rank: long, score)`. */
  def hardNegatives(docs: DataFrame, qterms: DataFrame,
      positives: DataFrame, kNeg: Int, overfetch: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cand = bm25BatchTopK(docs, qterms, kNeg + overfetch,
      idCol = idCol, textCol = textCol)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col(idCol))
    cand
      .join(broadcast(positives.select(col("qid"), col(idCol))),
        Seq("qid", idCol), "left_anti")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kNeg)
      .select(col("qid"), col(idCol).as("neg_id"), col("rank"),
        col("score"))
  }

  /** Batch twin of [[rrfFuse]]: every input list carries `(qid, idCol,
    * score)` rows for a whole query set; ranks are per (list, qid) —
    * the window partitions by both — and the fused per-(qid, doc) sums
    * reduce to top-k per query through the partial-aggregable
    * [[Knn.groupedTopK]]. One plan fuses the entire batch. */
  def rrfFuseBatch(lists: Seq[(String, DataFrame)], k: Int, c: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    val tagged = lists.map { case (tag, df) =>
      df.select(lit(tag).as("src"), col("qid"), col(idCol),
        col("score").cast("double").as("s"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("src"), col("qid"))
      .orderBy(col("s").desc, col(idCol))
    val summed = tagged.withColumn("rank", row_number().over(w))
      .groupBy(col("qid"), col(idCol))
      .agg(sum((lit(1.0) / (lit(c.toDouble) + col("rank")))
        .cast("decimal(28,12)")).as("rdec"))
      .select(col("qid"), col(idCol),
        round(col("rdec"), 6).cast("double").as("rrf"))
    Knn.groupedTopK(summed, k, idCol, "rrf")
      .select(col("qid"), col(idCol), col("rrf"))
  }

  /** Maximal-marginal-relevance diversified reranking (Carbonell &
    * Goldstein 1998): greedily select `argmax_d λ·rel(d) − (1−λ)·
    * max_{s∈S} sim(d, s)` for `k` steps — relevance traded against
    * redundancy with what is already selected.
    *
    * Candidates are a bounded top-m list (k·overfetch of an upstream
    * retriever), so the m² pairwise-sim relation and the k greedy steps
    * are all bounded-size plans; each step's 1-row pick is eagerly
    * localCheckpoint-ed so lineage stays linear in k. MMR scores go
    * through [[graft.Graft.roundExact]] before each argmax: λ·rel with
    * short-decimal rel lands exactly ON round-half boundaries, where
    * plain double rounding diverges between engines. Use a λ whose
    * `1−λ` is binary-exact (0.75, 0.5, 0.25…) so the oracle's literals
    * mean the same doubles.
    *
    * @param cands `(idCol, relCol, vecCol)` — relevance already rounded
    * @return `(rank, idCol, mmr)` — the k picks in selection order */
  def mmrRerank(cands: DataFrame, k: Int, lam: Double = 0.75,
      idCol: String = "doc_id", relCol: String = "rel",
      vecCol: String = "embedding"): DataFrame = {
    val sims = cands.select(col(idCol).as("ia"), col(vecCol).as("va"))
      .join(broadcast(cands.select(col(idCol).as("ib"), col(vecCol).as("vb"))),
        col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        round(graft.Graft.cosine(col("va"), col("vb")), 4).as("sim"))
      .localCheckpoint(true) // m² rows, computed once, reused k times
    // pin the m-row (id, rel) base too: without this every greedy step's
    // pick and anti-join re-derives `cands` — i.e. re-runs the upstream
    // retriever's corpus scan — once or twice per step
    var rest = cands.select(col(idCol), col(relCol)).localCheckpoint(true)
    var selected: Option[DataFrame] = None
    for (t <- 1 to k) {
      val withPen = selected match {
        case None => rest.withColumn("pen", lit(0.0d))
        case Some(sel) =>
          val penTbl = sims
            .join(broadcast(sel.select(col(idCol).as("ib"))), Seq("ib"))
            .groupBy(col("ia")).agg(max(col("sim")).as("pen"))
            .withColumnRenamed("ia", idCol)
          rest.join(penTbl, Seq(idCol), "left")
            .withColumn("pen", coalesce(col("pen"), lit(0.0d)))
      }
      val pick = withPen
        .select(col(idCol), graft.Graft.roundExact(
          lit(lam) * col(relCol) - lit(1.0 - lam) * col("pen"), 4).as("mmr"))
        .orderBy(col("mmr").desc, col(idCol)).limit(1)
        .withColumn("rank", lit(t))
        .localCheckpoint(true)
      selected = Some(selected.fold(pick)(_ unionByName pick))
      rest = rest.join(pick.select(col(idCol)), Seq(idCol), "left_anti")
    }
    selected.get.select(col("rank"), col(idCol), col("mmr"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of several
    * already-truncated result lists: each `(tag, df)` holds `(idCol,
    * score)` rows with higher-is-better scores; every list is re-ranked
    * by `(score desc, id)` under a window PARTITIONED by its tag (never
    * unpartitioned — the lists are the partitions), then
    * `rrf(d) = Σ_lists 1/(c + rank_list(d))`, decimal-summed so list
    * order never matters. Input lists are bounded (top-m each), so the
    * whole fusion is driver-light and the output hash-matches. */
  def rrfFuse(lists: Seq[(String, DataFrame)], k: Int, c: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    val tagged = lists.map { case (tag, df) =>
      df.select(lit(tag).as("src"), col(idCol),
        col("score").cast("double").as("s"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("src"))
      .orderBy(col("s").desc, col(idCol))
    tagged.withColumn("rank", row_number().over(w))
      .groupBy(col(idCol))
      .agg(sum((lit(1.0) / (lit(c.toDouble) + col("rank")))
        .cast("decimal(28,12)")).as("rdec"))
      .select(col(idCol), round(col("rdec"), 6).cast("double").as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
