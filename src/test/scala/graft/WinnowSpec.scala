package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Winnowing fingerprints: brute-force equivalence on real documents,
  * the detection guarantee (shared runs of ≥ w+n−1 tokens always share
  * a fingerprint), and containment scoring on an embedded document. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 3
  private val w = 4

  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Driver-side winnow: the definition, independently coded. */
  private def bruteWinnow(text: String): Set[(Long, Int)] = {
    val t = text.trim.split("\\s+")
    val grams = (0 to t.length - n).map(p => t.slice(p, p + n).mkString(" "))
    if (grams.isEmpty) return Set.empty
    val keys = grams.zipWithIndex.map { case (g, p) =>
      (md5Hash60(g) % (1L << 40)) * (1L << 20) + p
    }
    val starts = 0 to math.max(0, keys.length - w)
    starts.map(s => keys.slice(s, math.min(s + w, keys.length)).min)
      .toSet.map((k: Long) => (k >> 20, (k & ((1L << 20) - 1)).toInt))
  }

  test("winnowFingerprints equals the driver-side definition on real " +
      "documents") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(40)
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", n, w)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val exp = bruteWinnow(text)
      assert(got.getOrElse(id, Set.empty) == exp,
        s"doc $id: got ${got.getOrElse(id, Set.empty).size} vs ${exp.size}")
    }
  }

  test("detection guarantee: two docs sharing a run of >= w+n-1 tokens " +
      "share a fingerprint VALUE; disjoint docs share none") {
    val run = "alpha beta gamma delta epsilon zeta" // w+n-1 = 6 tokens
    val docs = Seq(
      (1L, s"one two three $run four five six"),
      (2L, s"seven eight $run nine ten eleven twelve"),
      (3L, "completely different words with nothing in common here"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", n, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared run produced no shared fp")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs share a fingerprint")
  }

  test("containment: a document embedded verbatim in a larger one " +
      "scores overlap 1.0; fingerprints compress the gram stream") {
    val inner = (1 to 30).map(i => s"w$i").mkString(" ")
    val outer = s"pre amble tokens here $inner post amble tail tokens"
    val docs = Seq((10L, inner), (20L, outer)).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, "doc_id", "text", n, w,
      minOverlap = 0.0).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getLong(0) == 10L && r.getLong(1) == 20L)
    assert(r.getDouble(3) == 1.0,
      s"embedded doc should be fully contained, got ${r.getDouble(3)}")
    // compression: selected fingerprints ≪ grams (expected ~2/(w+1))
    val nGrams = 30 - n + 1
    val nFp = Dedup.winnowFingerprints(docs.filter(col("doc_id") === 10L),
      "doc_id", "text", n, w).count()
    assert(nFp < nGrams * 0.75, s"$nFp fingerprints for $nGrams grams")
  }

  test("position-packing bound is enforced in-plan: exactly 2^20 grams " +
      "passes, one more raises instead of silently corrupting the key") {
    // gram count = tokens − n + 1; single-char tokens keep the fixture
    // ~2 MB, and the default small w keeps the bounded-frame window
    // pass O(n·w) at 1M rows.
    def doc(grams: Int): String =
      Array.fill(grams + n - 1)("a").mkString(" ")
    val atBound = Seq((1L, doc(1 << 20))).toDF("doc_id", "text")
    // green at the bound: max position is 2^20 − 1, still addressable
    assert(Dedup.winnowFingerprints(atBound, "doc_id", "text", n, w)
      .count() > 0)
    val pastBound = Seq((2L, doc((1 << 20) + 1))).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.winnowFingerprints(pastBound, "doc_id", "text", n, w).count()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: causes(t.getCause)
    assert(causes(e).exists(m => m != null && m.contains("2^20 grams")),
      s"expected the packing-bound error, got: ${e.getMessage}")
  }
}
