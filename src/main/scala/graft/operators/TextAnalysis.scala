package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: quality scoring,
  * token counting, document fingerprinting, profile-based language ID.
  * Everything is a codegen-friendly column expression — no UDFs — and each
  * has an exact DuckDB twin for the oracle. */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Spread a frame across the cluster before a Generate (explode) stage.
    * A small/consolidated parquet source is often ONE input split; without
    * this the whole explode + downstream hash-map work serializes onto a
    * single task (the trap documented at [[Dedup.minhashNearDups]] —
    * bench_stages showed 5–18 s single-task scan+Generate stages in
    * tx_corpus_ready before this was applied here). At 100 TB a many-split
    * scan usually masks it, but a compacted partition or single ingest
    * file re-serializes — so every fan-out below pays the one cheap
    * round-robin shuffle unconditionally. */
  private[operators] def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Quality features + composite score: token count, unique-token ratio,
    * stopword ratio, capped-length factor. */
  def qualityFeatures(text: Column): Seq[(String, Column)] =
    qualityFeaturesOf(tokens(text))

  /** [[qualityFeatures]] over an already-tokenized array column. */
  def qualityFeaturesOf(toks: Column): Seq[(String, Column)] = {
    val n = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double") / n
    val stop = size(array_intersect(toks, array(Stopwords.map(lit): _*)))
      .cast("double") // distinct stopwords present, of 6
    val stopRatio = size(filter(toks,
      t => array_contains(array(Stopwords.map(lit): _*), t))).cast("double") / n
    val lenFactor = least(n / 100.0, lit(1.0))
    // ratios of small integers sit on round() knife edges — use the
    // engine-agnostic decimal-path rounding (Graft.roundExact scaladoc)
    Seq(
      "n_tokens" -> size(toks),
      "uniq_ratio" -> graft.Graft.roundExact(uniq, 4),
      "stop_ratio" -> graft.Graft.roundExact(stopRatio, 4),
      "quality" -> graft.Graft.roundExact(
        uniq * 0.4 + (lit(1.0) - stopRatio) * 0.3 + lenFactor * 0.3, 4))
  }

  /** Rolling polynomial fingerprint of the token stream:
    * h = fold(tokens, 0, (h, w) → (h·131 + len(w)·31 + ascii(w)) mod 1e9+7).
    * Order-sensitive (unlike a bag-of-words hash) and cheap to reproduce
    * anywhere — the mod keeps every intermediate in i64. Native
    * whole-stage-codegen expression ([[graft.functions.Fingerprint64]]);
    * the interpreted HOF twin below is the executable spec. */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.Fingerprint64(
        org.apache.spark.sql.GraftSqlBridge.expression(tokens(text))))

  /** HOF twin of [[fingerprint]] (spec-checked equal). */
  def fingerprintHof(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (h, w) => (h * 131L + length(w).cast("long") * 31L + ascii(w)) % 1000000007L)

  /** Deterministic stratified quota sample: the `quota` pseudo-randomly
    * smallest documents per stratum, ranked by `md5(id)` (id tie-break) —
    * the corpus-balancing step of a training pipeline (cap each language/
    * source at N docs) with none of `sampleBy`'s run-to-run drift, and
    * md5-ordering is reproducible in any engine, so the sample itself is
    * oracle-checkable.
    *
    * Scale shape: the rank-filter compiles to WindowGroupLimit (Spark 4
    * pushes a per-partition partial top-k below the stratum shuffle), so
    * each map task forwards at most `quota` rows per stratum it sees —
    * the shuffle carries O(partitions·quota), not the corpus, and a hot
    * stratum never concentrates more than its quota on one reducer's
    * output. */
  def stratifiedSample(docs: DataFrame, strataCol: String, idCol: String,
      quota: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Corpus-trained bigram language-model score per document — the
    * relational analog of the LM-perplexity quality filter CCNet-style
    * pipelines use (Wenzek et al. 2020, public method): score(doc) =
    * mean over its bigrams of `ln P(w2|w1)` with add-one smoothing,
    * `P(w2|w1) = (c(w1 w2)+1)/(c(w1)+V)`. Low score = improbable word
    * sequences = low-quality text.
    *
    * Shapes: bigram/unigram count tables are two hash aggregates over the
    * exploded corpus; V is a 1-row frame broadcast (never a driver
    * scalar); the per-doc mean sums `DECIMAL(28,12)`-cast log-probs so
    * the aggregate is order-independent — the float work is one ln per
    * DISTINCT bigram occurrence, the summation is exact decimal (the
    * engine-agnostic trick the money sums use). Docs with <2 tokens have
    * no bigrams and drop out. Returns (idCol, n_bigrams, lm_score). */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    lmScoreOf(spread(docs)
      .select(col(idCol), Dedup.tokens(col(textCol)).as("__toks")),
      idCol, "__toks")

  /** [[lmScore]] over an already-tokenized (and already-spread) frame —
    * the form tx_corpus_ready shares one materialized token array with
    * quality scoring and shard packing instead of re-splitting the corpus
    * three times. Caller owns the partitioning of `tokenized`. */
  def lmScoreOf(tokenized: DataFrame, idCol: String,
      toksCol: String): DataFrame = {
    val toks = tokenized.select(col(idCol), col(toksCol).as("w"))
    val uniCounts = toks.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c1"))
    val vocab = uniCounts.agg(count(lit(1)).as("v"))
    val bi = tokenized.select(col(idCol),
      explode(Dedup.ngramsOf(col(toksCol), 2)).as("g"))
    val biCounts = bi.groupBy(col("g")).agg(count(lit(1)).as("c12"))
    // score each DISTINCT bigram once against the count tables, then join
    // the instance stream to the scored dictionary — the instance frame
    // (corpus-sized) crosses ONE hash join on `g` instead of two chained
    // joins (g then w1); the dictionary side is |distinct bigrams| rows,
    // the quantity that stays small relative to the corpus at scale
    val dict = biCounts
      .withColumn("t", split(col("g"), " ").getItem(0))
      .join(uniCounts, Seq("t"))
      .crossJoin(broadcast(vocab))
      .select(col("g"),
        log((col("c12") + lit(1.0d)) / (col("c1") + col("v")))
          .cast("decimal(28,12)").as("lp"))
    bi.join(dict, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        graft.Graft.roundExact(
          sum(col("lp")).cast("double") / count(lit(1)), 4).as("lm_score"))
  }

  /** Deterministic weighted sample without replacement — Efraimidis &
    * Spirakis (2006, "Weighted random sampling with a reservoir", public
    * algorithm): each row gets key `u^(1/w)` for uniform `u`, and the
    * sample is the n largest keys; ranking by `ln(u)/w` descending is the
    * same order with better conditioning. Training pipelines use this for
    * quality-weighted corpus mixing (sample ∝ quality, not uniformly).
    *
    * `u ∈ (0,1]` comes from the 60-bit md5 prefix of the id — the same
    * engine-reproducible trick as [[stratifiedSample]], so the SAMPLE
    * ITSELF is oracle-checkable, with none of `rand()`'s run-to-run
    * drift. `weight` must be strictly positive (zero-weight rows would
    * key to -∞ and simply never be sampled).
    *
    * Scale shape: one codegen map pass to key; top-n is
    * TakeOrderedAndProject (per-partition partial top-n, no global
    * sort) — the driver sees n rows, the shuffle carries
    * O(partitions·n). */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column,
      n: Int): DataFrame = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") + 1.0d) / 1152921504606846976.0d // 2^60
    docs.withColumn("__k", log(u) / weight)
      .orderBy(col("__k").desc, col(idCol))
      .limit(n)
      .drop("__k")
  }

  /** Source-weight corpus mixing with deterministic fractional epochs —
    * the Dolma/Pile "mixing recipe" step: source `s` is traversed
    * `epochs(s)` times per training pass (2.5 = every doc twice, half the
    * docs a third time; 0.5 = downsample to half). The fractional part is
    * realized PER DOCUMENT with the md5-uniform trick (`u < frac` keeps
    * the extra epoch), so the expected per-source share matches the recipe
    * exactly and the materialization is a pure function of doc_id —
    * re-running the plan yields the identical mixture, and the oracle
    * re-derives it row-for-row.
    *
    * Scale shape: one codegen map pass (map-literal lookup + md5 + the
    * bounded `posexplode(sequence)` fan-out — max ⌈epochs⌉ rows per doc);
    * no shuffle, no stored copies — upsampling happens at read time.
    * Sources absent from the recipe default to one epoch.
    *
    * @return (idCol, sourceCol, epoch) — one row per (document, epoch) */
  def mixEpochs(docs: DataFrame, idCol: String, sourceCol: String,
      epochs: Map[String, Double]): DataFrame = {
    require(epochs.values.forall(_ >= 0.0), "epochs must be >= 0")
    val recipe = map(epochs.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val ep = coalesce(element_at(recipe, col(sourceCol)), lit(1.0d))
    val u = conv(substring(md5(concat(lit("mix:"),
        col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long").cast("double") / 1152921504606846976.0d // 2^60
    val n = (floor(ep) + when(u < ep - floor(ep), 1).otherwise(0)).cast("int")
    spread(docs).select(col(idCol), col(sourceCol), n.as("n_epochs"))
      .filter(col("n_epochs") > 0)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(0), col("n_epochs") - 1)).as("epoch"))
  }

  /** Temperature-based source weights (the Pile/Dolma α-sampling recipe):
    * source s with `T_s` tokens samples with probability `p_s ∝ T_s^α`
    * (α < 1 upweights small sources), realized as fractional EPOCHS
    * `e_s = p_s · B / T_s` for a token budget `B` — computed here, fed
    * through [[mixEpochs]]'s md5-uniform realization by
    * [[mixTemperature]].
    *
    * Determinism contract (what makes the result oracle-checkable): the
    * per-source totals are exact longs; the α-power uses `sqrt` when
    * α = 0.5 (IEEE correctly-rounded in every engine, unlike general
    * `pow`); and the normalizer folds the totals in SOURCE-NAME ORDER,
    * so another engine repeating the same IEEE ops in the same order
    * reproduces the epochs bit-for-bit. The driver-side collect is one
    * row per SOURCE (bounded metadata, the zorderKey-stats class). */
  def temperatureEpochs(docs: DataFrame, sourceCol: String,
      textCol: String, alpha: Double, budgetTokens: Long): Map[String, Double] = {
    val totals = docs.groupBy(col(sourceCol))
      .agg(sum(size(tokens(col(textCol)))).cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    def powA(t: Double): Double =
      if (alpha == 0.5) math.sqrt(t) else math.pow(t, alpha)
    val denom = totals.foldLeft(0.0d) { case (a, (_, t)) => a + powA(t.toDouble) }
    totals.map { case (s, t) =>
      s -> powA(t.toDouble) / denom * budgetTokens / t.toDouble }.toMap
  }

  /** [[temperatureEpochs]] composed with [[mixEpochs]] — the full
    * α-temperature mixing pass. */
  def mixTemperature(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, alpha: Double, budgetTokens: Long): DataFrame =
    mixEpochs(docs, idCol, sourceCol,
      temperatureEpochs(docs, sourceCol, textCol, alpha, budgetTokens))

  /** Token-budgeted shard packing — the sharding step before training:
    * within each stream (e.g. language), documents in `idCol` order are
    * assigned `shard_id = floor(preceding_cum_tokens / budget)` (the
    * cumulative count EXCLUDES the current document, so an empty prefix is
    * shard 0 and an oversized document still lands somewhere). Shards are
    * contiguous runs of ~budget tokens; a shard may overflow by up to its
    * last document's length — the closed-form prefix-sum rule, chosen over
    * true greedy (close-when-next-would-overflow) because greedy is a
    * prefix-dependent recurrence that needs a stateful per-stream scan,
    * while this is one window pass and equally deterministic. Returns
    * `(streamCol, idCol, n_tokens, shard_id)`.
    *
    * Scale shape: one shuffle on the stream column, then a single
    * running-sum window pass per stream — no self-join, no driver state.
    * Packing is inherently sequential per stream; at 100 TB the stream key
    * is (lang, date-bucket) so each window partition stays executor-sized,
    * and shard ids are made globally unique by prefixing the stream key. */
  def packShards(docs: DataFrame, streamCol: String, idCol: String,
      textCol: String, tokenBudget: Long): DataFrame =
    packShardsOf(docs.withColumn("__toks", tokens(col(textCol))),
      streamCol, idCol, "__toks", tokenBudget)

  /** [[packShards]] over an already-tokenized frame. */
  def packShardsOf(tokenized: DataFrame, streamCol: String, idCol: String,
      toksCol: String, tokenBudget: Long): DataFrame = {
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    tokenized.select(col(streamCol), col(idCol),
        size(col(toksCol)).cast("long").as("n_tokens"))
      .withColumn("shard_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / tokenBudget))
  }

  /** Sequence packing — the step below [[packShards]] in a pretraining
    * pipeline: concatenate each stream's documents (in id order) into
    * fixed-length training sequences of `seqLen` tokens, documents
    * SPANNING sequence boundaries (GPT-style packing, no padding waste).
    * Each output row is one document slice landing in one sequence:
    * `(streamCol, idCol, seq_id, begin_pos, end_pos, doc_offset)` —
    * `[begin_pos, end_pos)` the slice's position inside the sequence,
    * `doc_offset` where the slice starts inside the document. Empty
    * documents (0 tokens) pack nowhere and are dropped.
    *
    * Scale shape: one shuffle on the stream column, one running-sum
    * window pass for the global token offset, then a BOUNDED explode
    * (a document overlaps at most n_tokens/seqLen + 1 sequences). At
    * 100 TB the stream key is (lang, shard) so each window partition
    * stays executor-sized — same contract as [[packShardsOf]]. */
  def packSequences(docs: DataFrame, streamCol: String, idCol: String,
      textCol: String, seqLen: Long): DataFrame =
    packSequencesOf(
      spread(docs).select(col(streamCol), col(idCol),
        size(tokens(col(textCol))).cast("long").as("__n")),
      streamCol, idCol, "__n", seqLen)

  /** [[packSequences]] parameterized by the TOKENIZER: packs from a
    * precomputed per-document token-count column instead of the
    * whitespace count — the entry the BPE accounting ([[Bpe]]) plugs
    * into. Same window + bounded-explode machinery. */
  def packSequencesOf(counted: DataFrame, streamCol: String, idCol: String,
      nTokensCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = counted
      .select(col(streamCol), col(idCol),
        col(nTokensCol).cast("long").as("n_tokens"))
      .withColumn("b", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("n_tokens") > 0)
    val L = lit(seqLen)
    // seq ids this doc touches: floor(b/L) .. floor((b+n-1)/L) — integer
    // `div` (not `/`: double division) keeps offsets exact at any scale
    withOff
      .withColumn("seq_id",
        explode(sequence(expr(s"b div $seqLen"),
          expr(s"(b + n_tokens - 1) div $seqLen"))))
      .select(col(streamCol), col(idCol), col("seq_id"),
        (greatest(col("b"), col("seq_id") * L) - col("seq_id") * L)
          .as("begin_pos"),
        (least(col("b") + col("n_tokens"), (col("seq_id") + 1) * L)
          - col("seq_id") * L).as("end_pos"),
        (greatest(col("b"), col("seq_id") * L) - col("b")).as("doc_offset"))
  }

  /** Hashed-feature linear classifier inference — the fasttext-style
    * quality-model pass production pipelines run over every document
    * (score with a trained linear model over hashed bag-of-words
    * features, keep above a margin). The MODEL here is a fixed
    * deterministic weight table (this library ships engines, not
    * weights): feature j's weight is the integer
    * `((j·37 + 11) mod 201) − 100 ∈ [−100, 100]`, feature index is the
    * md5 token hash mod `dim` — both closed-form and engine-exact, so
    * the whole inference is DuckDB-oracle-checkable (a trained model
    * drops in by replacing the weight expression with a broadcast
    * lookup; the plan shape is identical).
    *
    * Score is the mean feature weight scaled to [−1, 1] — integer sums,
    * one exact double division, NO transcendental link function (a
    * sigmoid is monotone, so the keep margin is the same decision
    * boundary) — and `keep` is `score ≥ 0`.
    *
    * Scale shape: pure per-row column math riding the scan (one
    * `aggregate` HOF over the token array — sequential, order-exact);
    * no shuffle, no UDF, no driver state. Returns
    * `(idCol, model_score, keep)`. */
  def modelScore(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 1024): DataFrame = {
    val toks = tokens(col(textCol))
    val wsum = aggregate(toks, lit(0L), (acc, t) => {
      val h = pmod(conv(substring(md5(t), 1, 15), 16, 10).cast("long"), lit(dim))
      acc + (pmod(h * 37 + 11, lit(201)) - 100)
    })
    val raw = wsum.cast("double") / (lit(100.0) * size(toks))
    // integer/100n rationals land exactly on round-half knife edges —
    // decimal-path rounding (Graft.roundExact) keeps both engines on the
    // same side, as in qualityFeaturesOf
    docs.select(col(idCol),
      graft.Graft.roundExact(raw, 4).as("model_score"),
      (raw >= 0.0).as("keep"))
  }

  /** Repetition/shape quality signals per document, after the published
    * large-corpus filter rules (word-count bounds, mean-word-length band,
    * max-repeated-unigram fraction): returns
    * `(idCol, n_words, mean_word_len, top_word_frac, keep)`.
    *
    * The repetition signal needs per-(doc, word) counts, so the shape is
    * one explode into two stacked partial-aggregations — (doc, word) then
    * (doc) — both map-side combinable; nothing is per-pair or driver-side.
    * Thresholds follow the common published bands (50–100k words,
    * mean length 3–10, top unigram ≤ 0.2) scaled down to the fixture's
    * short documents via the parameters. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, maxWords: Int = 100000,
      minMeanLen: Double = 1.0, maxMeanLen: Double = 12.0,
      maxTopFrac: Double = 0.5): DataFrame = {
    val words = spread(docs).select(col(idCol),
      explode(tokens(col(textCol))).as("word"))
    val perWord = words.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("cnt"), sum(length(col("word"))).as("chars"))
    val perDoc = perWord.groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_words"),
        graft.Graft.roundExact(
          sum(col("chars")).cast("double") / sum(col("cnt")), 4)
          .as("mean_word_len"),
        graft.Graft.roundExact(
          max(col("cnt")).cast("double") / sum(col("cnt")), 4)
          .as("top_word_frac"))
    perDoc.select(col(idCol), col("n_words"), col("mean_word_len"),
      col("top_word_frac"),
      (col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(minMeanLen, maxMeanLen) &&
        col("top_word_frac") <= maxTopFrac).as("keep"))
  }

  /** Top-N keywords per document by tf·(N/df) — tf-idf with a RATIONAL
    * idf (document-count ratio, no logarithm): every score is an integer
    * product followed by one IEEE double division, so the value is
    * bit-identical in any engine and the ranking is oracle-checkable —
    * a log-damped idf ranks identically per document whenever df ties
    * break the same way, but its transcendental values are not
    * cross-engine hash-stable.
    *
    * Shape: one explode into a (doc, term) partial-aggregable count, a
    * vocabulary-sized df aggregate joined back ON TERM (both sides
    * already term-partitioned after their aggs), a broadcast scalar for
    * N, and a per-doc WindowGroupLimit for the top-N — no driver-side
    * vocabulary, no per-pair work. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      topN: Int = 3): DataFrame = {
    val terms = spread(docs)
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select(col(idCol), col("rn").as("rank"), col("term"),
        graft.Graft.roundExact(col("score"), 4).as("score"))
  }

  /** Per-language top-k word profiles learned from a labeled corpus:
    * (lang, word) frequency ranking, deterministic ties by word. */
  def langProfiles(docs: DataFrame, langCol: String, textCol: String,
      topK: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("word"))
    spread(docs).select(col(langCol).as("lang"),
        explode(tokens(col(textCol))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("lang").as("profile_lang"), col("word"))
  }

  /** Language ID: score = |doc words ∩ profile(lang)|, predict argmax
    * (ties → lexicographically first lang); returns per-true-lang accuracy.
    * The profile side is tiny (langs × topK rows) — broadcast join; the
    * document side streams through one explode + two aggregations. */
  def langIdAccuracy(docs: DataFrame, idCol: String, langCol: String,
      textCol: String, topK: Int = 10): DataFrame = {
    val profiles = langProfiles(docs, langCol, textCol, topK)
    val docWords = spread(docs).select(col(idCol).as("doc_id"),
        col(langCol).as("true_lang"),
        explode(array_distinct(tokens(col(textCol)))).as("word"))
    val scores = docWords.join(broadcast(profiles), Seq("word"))
      .groupBy(col("doc_id"), col("true_lang"), col("profile_lang"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("profile_lang"))
    val predicted = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("true_lang"),
        col("profile_lang").as("pred_lang"))
    predicted.groupBy(col("true_lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("pred_lang") === col("true_lang"), 1)).as("n_correct"))
      .orderBy(col("true_lang"))
  }
}
