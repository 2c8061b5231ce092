package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer for TOKEN ACCOUNTING
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — the public BPE training algorithm).
  *
  * Every token budget in the packing/mixing operators counted
  * whitespace-regex tokens; real training-data pipelines budget in
  * TOKENIZER tokens, which differ per document by the subword fan-out.
  * This module trains a merge table and counts subword tokens with both
  * sides of the oracle able to re-derive everything:
  *
  *  - TRAIN ([[train]]): word-frequency dictionary (one distributed
  *    pass, top-`maxVocab` by (count desc, word asc) — bounded, the same
  *    driver boundary as the ANN codebooks; Sennrich's reference
  *    implementation trains on exactly this word-count dict), then
  *    `numMerges` rounds of: count adjacent symbol pairs weighted by
  *    word count, merge the (count desc, pair lex asc) argmax everywhere
  *    it occurs. Ties and iteration order are total, so the merge list
  *    is deterministic — and re-derivable in SQL by unrolling the rounds
  *    ([[oracleRoundsSql]]).
  *
  *  - APPLY ([[wordTokenCount]]): a word becomes the symbol string
  *    `␟c␟␟c␟…␟</w>␟` (every symbol wrapped in U+001F separators — the
  *    wrapping makes `replace("␟a␟␟b␟" → "␟ab␟")` exactly the BPE merge:
  *    separator-anchored on both sides, so no cross-symbol or
  *    symbol-prefix false matches, and adjacent occurrences merge in one
  *    left-to-right pass with the SAME non-overlapping semantics in
  *    Spark's `replace` and DuckDB's `replace`). Applying the merge
  *    table is a chain of `numMerges` codegen string replaces riding the
  *    scan — no UDF, no shuffle; the token count is
  *    `(len(s) − len(s without ␟)) / 2`.
  *
  * Scale shape: training collects only the bounded word dictionary;
  * encoding is map-side column math over the corpus; the merge table
  * (a few dozen strings) broadcasts as literals inside the plan.
  */
object Bpe {

  /** Symbol separator (U+001F unit separator — `chr(31)` in DuckDB). */
  val Sep = "\u001f"

  /** End-of-word symbol (a separate symbol, per the original paper). */
  val EndWord = "</w>"

  /** Bounded word-frequency dictionary: top `maxVocab` whitespace words
    * by (count desc, word asc). One distributed pass; only the dict is
    * collected. */
  def wordCounts(docs: DataFrame, textCol: String,
      maxVocab: Int): Seq[(String, Long)] =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** One merge applied to a symbol sequence, greedy left-to-right,
    * non-overlapping — the plain-Scala reference for the `replace`
    * column form (spec-compared). */
  def applyMerge(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b =>
        (a + b) :: applyMerge(rest, a, b)
      case x :: rest => x :: applyMerge(rest, a, b)
      case Nil => Nil
    }

  /** Train `numMerges` merges on the corpus' word dictionary. Returns
    * the ordered merge list [(a, b), …]; merges stop early if no pair
    * repeats. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1000): Seq[(String, String)] = {
    var words: Seq[(List[String], Long)] = wordCounts(docs, textCol, maxVocab)
      .map { case (w, c) => (w.split("").filter(_.nonEmpty).toList :+ EndWord, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        words = words.map { case (syms, c) => (applyMerge(syms, a, b), c) }
      }
    }
    merges.toSeq
  }

  private def rep(c: Column, find: String, to: String): Column =
    call_function("replace", c, lit(find), lit(to))

  /** Separator-wrapped symbol string of a word:
    * `␟h␟␟i␟␟</w>␟` for "hi". (Spark's `split(w, "")` appends one empty
    * trailing element; it is filtered to match DuckDB `string_split`.) */
  def symbolString(word: Column): Column =
    concat(
      array_join(transform(
        filter(split(word, ""), c => c =!= ""),
        c => concat(lit(Sep), c, lit(Sep))), ""),
      lit(Sep + EndWord + Sep))

  /** The merge chain applied to a word's symbol string — `numMerges`
    * codegen replaces. */
  def mergedString(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbolString(word)) { case (c, (a, b)) =>
      rep(c, Sep + a + Sep + Sep + b + Sep, Sep + a + b + Sep)
    }

  /** BPE token count of one word: symbols = separator chars / 2. */
  def wordTokenCount(word: Column, merges: Seq[(String, String)]): Column = {
    val m = mergedString(word, merges)
    ((length(m) - length(rep(m, Sep, ""))) / 2).cast("long")
  }

  /** Per-document BPE token counts: `(idCol…, n_bpe_tokens)`. One
    * bounded explode (words per doc) + a hash agg back to documents;
    * `keep` columns ride along (grouped — must be functionally dependent
    * on idCol, e.g. lang). */
  def docTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], keep: Seq[String] = Nil): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select((col(idCol) +: keep.map(col)) :+
        explode(TextAnalysis.tokens(col(textCol))).as("w"): _*)
      .filter(col("w") =!= "")
      .groupBy(col(idCol) +: keep.map(col): _*)
      .agg(sum(wordTokenCount(col("w"), merges)).as("n_bpe_tokens"))

  /** The trained merge table as a relation `(rank, a, b, merged)` — the
    * tokenizer ARTIFACT a pipeline persists next to its corpus (the
    * merges.txt of a Sennrich BPE run). Rank is 1-based merge order. */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)]): DataFrame =
    spark.createDataFrame(merges.zipWithIndex.map { case ((a, b), i) =>
      (i + 1L, a, b, a + b) })
      .toDF("rank", "a", "b", "merged")

  // ---------------------------------------------------------------- SQL

  /** DuckDB re-derivation of the whole train+apply pipeline, rounds
    * UNROLLED (`numMerges` CTE blocks): the oracle side of the gate.
    * Produces CTEs `words`, `t0`…`tN`, `m1`…`mN` (one row each: that
    * round's argmax pair) and `bpe_counts(doc_id, lang, n_bpe_tokens)`.
    * Callers append their own SELECT over `bpe_counts`. */
  def oracleRoundsSql(numMerges: Int, maxVocab: Int = 1000): String = {
    val sep = "chr(31)"
    def wrapped(expr: String) =
      s"array_to_string(list_transform(string_split($expr, ''), " +
        s"c -> $sep||c||$sep), '') || $sep||'</w>'||$sep"
    val head =
      s"""words AS (
         |  SELECT w, count(*)::BIGINT AS cnt FROM (
         |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
         |    FROM documents)
         |  WHERE w <> '' GROUP BY w ORDER BY cnt DESC, w LIMIT $maxVocab),
         |t0 AS (SELECT cnt, ${wrapped("w")} AS s FROM words)""".stripMargin
    val rounds = (1 to numMerges).map { i =>
      val prev = s"t${i - 1}"
      s"""p$i AS (
         |  SELECT p[1] AS a, p[2] AS b, sum(cnt) AS c FROM (
         |    SELECT cnt, unnest(list_zip(l, l[2:])) AS p FROM (
         |      SELECT cnt, string_split(trim(s, $sep), $sep||$sep) AS l
         |      FROM $prev))
         |  WHERE p[2] IS NOT NULL GROUP BY 1, 2),
         |m$i AS (SELECT a, b FROM p$i ORDER BY c DESC, a, b LIMIT 1),
         |t$i AS (
         |  SELECT cnt, replace(s, $sep||m.a||$sep||$sep||m.b||$sep,
         |    $sep||m.a||m.b||$sep) AS s
         |  FROM $prev, m$i m)""".stripMargin
    }
    // apply the merge chain to every document word; merge i's pair comes
    // from its one-row CTE via the cross join
    val mJoins = (1 to numMerges).map(i => s"m$i").mkString(", ")
    val chain = (1 to numMerges).foldLeft("s0") { (acc, i) =>
      s"replace($acc, $sep||m$i.a||$sep||$sep||m$i.b||$sep, " +
        s"$sep||m$i.a||m$i.b||$sep)"
    }
    val apply =
      s"""doc_words AS (
         |  SELECT doc_id, lang, w FROM (
         |    SELECT doc_id, lang,
         |      unnest(string_split_regex(trim(text), '\\s+')) AS w
         |    FROM documents) WHERE w <> ''),
         |enc AS (
         |  SELECT doc_id, lang, $chain AS s
         |  FROM (SELECT doc_id, lang, ${wrapped("w")} AS s0
         |        FROM doc_words), $mJoins),
         |bpe_counts AS (
         |  SELECT doc_id, lang,
         |    sum((length(s) - length(replace(s, $sep, ''))) // 2)::BIGINT
         |      AS n_bpe_tokens
         |  FROM enc GROUP BY doc_id, lang)""".stripMargin
    (Seq(head) ++ rounds ++ Seq(apply)).mkString("WITH ", ",\n", "")
  }
}
