package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Plain-Scala reference of the WHOLE pipeline (train on a word-count
    * dict + count tokens per doc) over driver-collected rows. */
  private def referenceCounts(rows: Seq[(Long, String)], numMerges: Int,
      maxVocab: Int): (Seq[(String, String)], Map[Long, Long]) = {
    def words(t: String): Seq[String] =
      t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val dict = rows.flatMap(r => words(r._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(maxVocab)
    var vocab: Seq[(List[String], Long)] = dict.map { case (w, c) =>
      (w.split("").filter(_.nonEmpty).toList :+ Bpe.EndWord, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (merges.size < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + c) }
      val (a, b) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
      merges += ((a, b))
      vocab = vocab.map { case (s, c) => (Bpe.applyMerge(s, a, b), c) }
    }
    val table = merges.toSeq
    def encode(w: String): Int =
      table.foldLeft(w.split("").filter(_.nonEmpty).toList :+ Bpe.EndWord) {
        case (s, (a, b)) => Bpe.applyMerge(s, a, b)
      }.length
    val perDoc = rows.map { case (id, t) =>
      id -> words(t).map(w => encode(w).toLong).sum }.toMap
    (table, perDoc)
  }

  test("distributed BPE train + replace-chain counts equal the plain-" +
      "Scala reference on the fixture corpus") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val merges = Bpe.train(d, "text", numMerges = 8, maxVocab = 1000)
    val rows = d.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (refMerges, refCounts) = referenceCounts(rows, 8, 1000)
    assert(merges == refMerges,
      s"merge tables diverge:\n got $merges\n ref $refMerges")
    val got = Bpe.docTokenCounts(d, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refCounts,
      s"${got.count { case (k, v) => refCounts(k) != v }} docs diverge")
    // subword accounting is real: some word must compress below its
    // character count, so totals differ from the whitespace count
    val ws = rows.map { case (id, t) =>
      id -> t.trim.split("\\s+").count(_.nonEmpty).toLong }.toMap
    assert(got.exists { case (k, v) => v != ws(k) * 1 && v > ws(k) },
      "BPE counts degenerate: every doc equals its whitespace count")
  }

  test("golden micro-corpus: merges follow (count desc, pair asc) and " +
      "the wrapped-replace merge equals the list form on adjacent runs") {
    import spark.implicits._
    // "ababab": pairs (a,b)x3 (b,a)x2 per word occurrence; 2 copies make
    // (a,b) the clear first merge, then (ab,ab) chains adjacent merges —
    // exactly the shared-boundary case the wrapped replace must handle
    val d = Seq((1L, "ababab ababab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = Bpe.train(d, "text", numMerges = 3, maxVocab = 10)
    assert(merges.head == ("a", "b"), s"first merge was ${merges.head}")
    assert(merges.contains(("ab", "ab")),
      s"adjacent-run merge (ab,ab) missing from $merges")
    val counts = Bpe.docTokenCounts(d, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference-check both docs against hand-derivable encodings
    val (_, ref) = referenceCounts(
      Seq((1L, "ababab ababab"), (2L, "ab")), 3, 10)
    assert(counts == ref, s"got $counts, ref $ref")
  }

  test("oracleRoundsSql structure: one merge CTE per round, chain applied " +
      "once per document word") {
    val sql = Bpe.oracleRoundsSql(numMerges = 8, maxVocab = 1000)
    (1 to 8).foreach(i => assert(sql.contains(s"m$i AS "), s"round $i CTE"))
    assert(sql.contains("bpe_counts"))
    assert(!sql.contains(s"m9 AS "))
  }
}
