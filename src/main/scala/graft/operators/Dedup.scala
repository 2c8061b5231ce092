package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Deduplication suite for large-scale text/training-data pipelines:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design notes:
  *  - Exact dedup is one hash shuffle on the normalized text (or its md5 —
  *    shuffle 16 bytes, not documents).
  *  - MinHash+LSH: signatures are computed in a single codegen'd map pass
  *    (md5-based so the DuckDB oracle can reproduce them bit-for-bit);
  *    banding turns the quadratic all-pairs problem into a groupBy on
  *    (band, key) — only documents sharing a band bucket are joined.
  *    Candidate verification re-checks true Jaccard, so precision is exact.
  *  - SimHash packs a document into one i64; near-dup = hamming ≤ r over
  *    block-local pairs (bit_count(xor)) — cheap enough to run pairwise
  *    inside blocks.
  *  - All pair generation is blocked (lang/source/bucket) — never an
  *    unblocked cross join.
  */
object Dedup {

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word 3-gram shingles, `"w1 w2 w3"` strings.
    * Built from three shifted copies of the token array zipped together —
    * O(n) per document. (The naive `transform(sequence, i => slice(toks,
    * i, 3))` form is O(n²): every lambda call re-slices the array; at sf0.1
    * that was minutes of interpreted array copying.) `arrays_zip` pads to
    * the LONGEST input with nulls (it does not truncate), so the zipped
    * array is sliced to the first `n−2` entries — exactly the full
    * 3-grams; a document with fewer than 3 tokens yields no shingles. */
  def shingles(text: Column): Column = {
    val toks = tokens(text)
    val t2 = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
    val t3 = slice(toks, lit(3), greatest(size(toks) - 2, lit(0)))
    slice(
      transform(
        arrays_zip(toks.as("a"), t2.as("b"), t3.as("c")),
        s => concat_ws(" ", s.getField("a"), s.getField("b"), s.getField("c"))),
      lit(1), greatest(size(toks) - 2, lit(0)))
  }

  /** k MinHash values: element s = min over shingles of md5("s:shingle").
    * Hex-string min == unsigned 128-bit min; md5 matches DuckDB exactly. */
  def minhashSignature(shinglesCol: Column, k: Int = 12): Column =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(shinglesCol,
        sh => md5(concat(s.cast("string"), lit(":"), sh)))))

  /** LSH banding: k-element signature → `bands` buckets of `k/bands` rows;
    * key = md5 of the band slice. Returns (idCol, band, key) exploded. */
  def lshBuckets(df: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws("|",
            slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .toDF(idCol, "band", "key")

  /** Exact word-set Jaccard between two DISTINCT token-array columns.
    * One intersect pass; |A∪B| = |A|+|B|−|A∩B| (inputs are de-duped), which
    * halves the per-pair array work vs an explicit array_union. Fine for
    * verifying a bounded candidate set; for all-pairs work use
    * [[jaccardPairs]] instead. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** All-pairs set-similarity with EXACT prefix filtering (PPJoin-style):
    *
    *  1. explode distinct words, compute per-(block, word) document
    *     frequency;
    *  2. order each document's words rarest-first (df asc, word) and keep
    *     only its PREFIX of `sz − ⌈minJ·sz⌉ + 1` words — the prefix-filter
    *     theorem guarantees any pair with `J(A,B) ≥ minJ` shares at least
    *     one PREFIX word under a consistent global word order;
    *  3. self-join prefixes on (block, word) → candidate pairs;
    *  4. verify candidates against the full word sets (exact Jaccard).
    *
    * The join key is now (block, rare-prefix-word): a hot word — df near
    * the block size — enters a document's prefix only when the document has
    * almost no rarer words, so the quadratic hot-key blowup of the naive
    * (block, word) join is bounded by the prefix length `(1−minJ)·sz + 1`
    * per document (at minJ = 0.95: ~5% of its words). Output is identical
    * to the unpruned join — the filter only drops pairs that cannot reach
    * minJ. Verification is per-candidate array work, fine because the
    * candidate set is prefix-bounded, not all-pairs. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, minJ: Double): DataFrame = {
    val spark = docs.sparkSession
    val base = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), col(blockCol).as("block"),
        array_distinct(tokens(col(textCol))).as("w"))
      .withColumn("sz", size(col("w")))
    val words = base.select(col("id"), col("block"), col("sz"),
      explode(col("w")).as("word"))
    val dfreq = words.groupBy(col("block"), col("word"))
      .agg(count(lit(1)).as("df"))
    val rankW = Window.partitionBy(col("block"), col("id"))
      .orderBy(col("df"), col("word"))
    val prefix = words.join(dfreq, Seq("block", "word"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= col("sz") - ceil(lit(minJ) * col("sz")) + 1)
      .select(col("block"), col("id"), col("word"))
    val cands = prefix.toDF("block", "id_a", "word")
      .join(prefix.toDF("block", "id_b", "word"), Seq("block", "word"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"))
      .distinct()
    verifyJaccard(cands, base.select(col("id"), col("w")), minJ,
      keepCols = Seq("block"))
  }

  /** Exact-Jaccard verification of a candidate-pair set, the scale shape:
    * size-compatibility prefilter (`J ≥ t ⇒ min(sa,sb) ≥ t·max(sa,sb)` —
    * drops pairs that cannot qualify before any word work), then
    * co-occurrence COUNTING via two hash joins + partial aggregation.
    * Everything stays in whole-stage codegen; no per-pair interpreted
    * array_intersect (one such pair-at-a-time pass pinned a whole bench
    * query to a single task for minutes at sf0.1). The explicit
    * repartition spreads candidates across the cluster — AQE otherwise
    * coalesces the small candidate relation to one partition and the
    * entire verify runs single-threaded.
    *
    * @param cands    candidate pairs: `id_a, id_b` (+ `keepCols`)
    * @param idWords  `(id, w: array<string>)` — DISTINCT word sets
    */
  private def verifyJaccard(cands: DataFrame, idWords: DataFrame,
      minJ: Double, keepCols: Seq[String]): DataFrame = {
    val np = cands.sparkSession.sparkContext.defaultParallelism
    val sizes = idWords.select(col("id"), size(col("w")).as("sz"))
    val candsSz = cands
      .join(sizes.toDF("id_a", "sa"), "id_a")
      .join(sizes.toDF("id_b", "sb"), "id_b")
      .filter(least(col("sa"), col("sb")) >=
        lit(minJ) * greatest(col("sa"), col("sb")))
      .repartition(np, col("id_a"), col("id_b"))
    val wa = idWords.select(col("id").as("id_a"), explode(col("w")).as("word"))
    val wb = idWords.select(col("id").as("id_b"), explode(col("w")).as("word"))
    val keep = keepCols.map(col) ++ Seq(col("id_a"), col("id_b"))
    candsSz
      .join(wa, Seq("id_a"))
      .join(wb, Seq("id_b", "word"))
      .groupBy(keep :+ col("sa") :+ col("sb"): _*)
      .agg(count(lit(1)).as("inter"))
      .select(keep :+
        round(col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter")), 4).as("jac"): _*)
      .filter(col("jac") >= minJ)
  }

  /** MinHash+LSH near-duplicate pairs, verified with true Jaccard ≥ minJ.
    * Returns (id_a, id_b, jac). */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, minJ: Double = 0.6): DataFrame = {
    val rows = k / bands
    // Signature via explode + k codegen'd min-aggregates, NOT the
    // higher-order-function form: HOFs are interpreted (nested lambdas ×
    // k permutations was ~100x slower at sf0.1), while md5 over flat
    // exploded rows stays inside whole-stage codegen and the k mins get
    // map-side partial aggregation. Same md5 math, identical signatures.
    // The repartition spreads the md5 map work: a small parquet source is
    // one input split, which would otherwise serialize the whole scan.
    val exploded = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), explode(shingles(col(textCol))).as("g"))
    val aggs = (0 until k).map(s =>
      min(md5(concat(lit(s.toString), lit(":"), col("g")))).as(s"sig_$s"))
    val sigs = exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until k).map(s => col(s"sig_$s")): _*).as("sig"))
    val wsets = docs.select(col(idCol).as("id"),
      array_distinct(tokens(col(textCol))).as("w")).cache()
    val buckets = lshBuckets(sigs, idCol, "sig", bands, rows)
    val a = buckets.toDF("id_a", "band", "key")
    val b = buckets.toDF("id_b", "band", "key")
    val cands = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyJaccard(cands, wsets, minJ, keepCols = Seq.empty)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** 64-bit SimHash of the token stream (xxhash64 per token, ±1 vote per
    * bit, sign → bit). One codegen'd expression, no shuffle. */
  def simhash64(text: Column): Column = {
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    val bitsum = aggregate(
      tokens(text),
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(powers, p =>
          when(xxhash64(t).bitwiseAND(p) =!= 0, 1L).otherwise(-1L)),
        (a, b) => a + b))
    // sum of selected distinct powers == OR of the sign bits
    aggregate(zip_with(bitsum, powers,
      (s, p) => when(s > 0, p).otherwise(0L)), lit(0L), (a, b) => a + b)
  }

  /** SimHash near-dup pairs within blocks: hamming distance ≤ maxHamming. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, maxHamming: Int = 12): DataFrame = {
    val h = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), col(blockCol), simhash64(col(textCol)).as("sh"))
    val a = h.toDF("id_a", "block", "sh_a")
    val b = h.toDF("id_b", "block", "sh_b")
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup: top `perBlock` most-similar pairs per
    * block (label) — blocked pairwise, ranked, deterministic tie-breaks. */
  def embeddingTopPairs(emb: DataFrame, idCol: String, vecCol: String,
      blockCol: String, perBlock: Int = 3): DataFrame = {
    val a = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col(blockCol).as("block"), col(idCol).as("id_a"),
        col(vecCol).as("va"))
    val b = emb.select(col(blockCol).as("block"), col(idCol).as("id_b"),
      col(vecCol).as("vb"))
    val pairs = a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        Graft.cosine(col("va"), col("vb")).as("cos"))
    val w = Window.partitionBy(col("block"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perBlock)
      .select(col("block"), col("id_a"), col("id_b"),
        round(col("cos"), 4).as("cos"))
  }
}
