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

  /** Word n-gram shingles, `"w1 w2 w3"` strings. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
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

  /** Exact word-set Jaccard between two token-array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash+LSH near-duplicate pairs, verified with true Jaccard ≥ minJ.
    * Returns (id_a, id_b, jac). */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, minJ: Double = 0.6): DataFrame = {
    val rows = k / bands
    val withSig = docs.select(col(idCol),
        array_distinct(tokens(col(textCol))).as("wset"),
        minhashSignature(shingles(col(textCol)), k).as("sig"))
      .cache()
    val buckets = lshBuckets(withSig, idCol, "sig", bands, rows)
    val a = buckets.toDF("id_a", "band", "key")
    val b = buckets.toDF("id_b", "band", "key")
    val cands = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cands
      .join(withSig.select(col(idCol).as("id_a"), col("wset").as("wa")), "id_a")
      .join(withSig.select(col(idCol).as("id_b"), col("wset").as("wb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("wa"), col("wb")), 4).as("jac"))
      .filter(col("jac") >= minJ)
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
    val h = docs.select(col(idCol), col(blockCol),
      simhash64(col(textCol)).as("sh"))
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
    val a = emb.select(col(blockCol).as("block"), col(idCol).as("id_a"),
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
