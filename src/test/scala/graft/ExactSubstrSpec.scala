package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** ExactSubstr dedup (Lee et al. 2021 semantics): brute-force
  * equivalence of the gram-count/bloom/island plan against a
  * driver-side definition, span-merge behavior on planted duplicates,
  * and the scrub step's keep-exactly-the-uncovered-tokens contract. */
class ExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The definition, independently coded: duplicated-L-gram window
    * union, merged per doc into maximal spans. */
  private def bruteSpans(docs: Seq[(Long, String)],
      minLen: Int): Set[(Long, Int, Int, Long)] = {
    val grams = docs.flatMap { case (id, text) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty)
      (0 to t.length - minLen).map(p =>
        (id, p, t.slice(p, p + minLen).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = grams.filter(g => counts(g._3) >= 2)
    dup.groupBy(_._1).flatMap { case (id, sites) =>
      val ps = sites.map(_._2).sorted
      val islands = ps.foldLeft(List.empty[List[Int]]) {
        case (acc, p) => acc match {
          case head :: tail if p - head.head <= minLen =>
            (p :: head) :: tail // head.head is the island's max-so-far
          case _ => List(p) :: acc
        }
      }
      islands.map(i =>
        (id, i.min, i.max + minLen, i.length.toLong))
    }.toSet
  }

  private def collectSpans(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet

  test("planted duplicates: cross-doc and within-doc runs produce " +
      "maximal merged spans; unique text produces none") {
    val run = (1 to 12).map(i => s"d$i").mkString(" ") // 12 shared tokens
    val docs = Seq(
      // doc 1 carries the run once, doc 2 twice (within-doc dup also
      // counts), doc 3 is clean
      (1L, s"u1 u2 u3 $run u4 u5"),
      (2L, s"v1 $run v2 v3 v4 v5 v6 $run v7"),
      (3L, (1 to 40).map(i => s"w$i").mkString(" ")))
    val L = 5
    val got = collectSpans(
      Dedup.exactSubstrSpans(docs.toDF("doc_id", "text"), "doc_id",
        "text", minLen = L))
    assert(got == bruteSpans(docs, L), s"got $got")
    // doc 3 contributes nothing; docs 1 and 2 each cover the full run
    assert(!got.exists(_._1 == 3L))
    val d1 = got.filter(_._1 == 1L)
    assert(d1.size == 1)
    val (_, s1, e1, _) = d1.head
    assert(e1 - s1 == 12, s"span [$s1,$e1) should cover the 12-token run")
  }

  test("nearby duplicated runs merge into one span iff their windows " +
      "overlap or touch") {
    val a = (1 to 6).map(i => s"a$i").mkString(" ")
    val b = (1 to 6).map(i => s"b$i").mkString(" ")
    val L = 4
    // adjacent runs in doc 1: the a-windows cover [0,6), the b-windows
    // [6,12) — touching intervals merge into one span. doc 10/11 carry
    // the same runs far apart → separate spans there.
    val docs = Seq(
      (1L, s"$a $b"),
      (10L, s"$a " + (1 to 30).map(i => s"p$i").mkString(" ") + s" $b"),
      (11L, s"$b " + (1 to 30).map(i => s"q$i").mkString(" ") + s" $a"))
    val got = collectSpans(
      Dedup.exactSubstrSpans(docs.toDF("doc_id", "text"), "doc_id",
        "text", minLen = L))
    assert(got == bruteSpans(docs, L), s"got $got")
    assert(got.count(_._1 == 1L) == 1, "close runs did not merge")
    assert(got.count(_._1 == 10L) == 2, "far runs wrongly merged")
  }

  test("equals the brute-force definition on the real fixture corpus") {
    val rows = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val L = 20
    val got = collectSpans(Dedup.exactSubstrSpans(
      Tables.load(spark, TestSpark.sfDir, "documents"),
      "doc_id", "text", minLen = L))
    assert(got == bruteSpans(rows, L))
    assert(got.nonEmpty, "fixture corpus should contain duplicated runs")
  }

  test("scrub keeps exactly the uncovered tokens in order and leaves " +
      "untouched documents text-identical") {
    val run = (1 to 9).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"k1 k2 $run k3 k4"),
      (2L, s"m1 $run m2"),
      (3L, "n1 n2 n3 n4 n5 n6 n7 n8"))
    val L = 4
    val df = docs.toDF("doc_id", "text")
    val spans = collectSpans(
      Dedup.exactSubstrSpans(df, "doc_id", "text", minLen = L))
    val scrubbed = Dedup.exactSubstrScrub(df, "doc_id", "text",
        minLen = L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text) =>
      val t = text.trim.split("\\s+")
      val covered = spans.filter(_._1 == id)
        .flatMap { case (_, s, e, _) => s until e }
      val expect = t.zipWithIndex.collect {
        case (tok, i) if !covered.contains(i) => tok }.mkString(" ")
      assert(scrubbed(id) == expect, s"doc $id scrub mismatch")
    }
    assert(scrubbed(3L) == docs.find(_._1 == 3L).get._2,
      "untouched doc rewritten")
  }

  test("boilerplate corpus: the exact-confirm stage is partial-" +
      "aggregable, never a gram-partitioned window (r12 verdict #3)") {
    // one licence-boilerplate gram duplicated across N docs — the hot
    // key ExactSubstr exists to find. The old plan's
    // `count() OVER (PARTITION BY g)` serialized all N sites into ONE
    // window task; the fixed plan must carry NO window partitioned on
    // the gram — only the per-document islands window — and aggregate
    // gram counts through a partial (map-side) HashAggregate.
    val boiler = (1 to 6).map(i => s"lic$i").mkString(" ")
    val docs = (0L until 64L).map(id =>
      (id, s"h${id}a h${id}b $boiler t${id}x t${id}y"))
    val df = docs.toDF("doc_id", "text")
    val q = Dedup.exactSubstrSpans(df, "doc_id", "text", minLen = 6)
    // result first: every doc's boilerplate run is found
    assert(q.count() == 64)
    // plan shape: every window in the optimized plan partitions on the
    // doc id (the islands pass); none on the gram string (the logical
    // plan is used because AQE hides physical subtrees behind
    // AdaptiveSparkPlanExec until stages materialize)
    val windows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.sql).mkString(",")
    }
    assert(windows.nonEmpty, "expected the per-doc islands window")
    windows.foreach { spec =>
      assert(spec.contains("id") && !spec.contains("`g`"),
        s"window partitioned on the gram string: $spec")
    }
    // the duplicated-gram decision is a two-phase hash aggregate over
    // (h, g) — a partial (map-side) count collapses hot grams to one
    // row per partition before any exchange. Asserted on the dictionary
    // relation ITSELF (r14: exactSubstrSpans pins the dictionary, so
    // the final plan only shows its checkpoint scan)
    val dictPlan = Dedup.dupGramsOf(df, "text", 6)
      .queryExecution.executedPlan.toString
    assert(dictPlan.contains("partial_count"),
      s"no partial count in:\n$dictPlan")
    // and no window anywhere in the dictionary pass
    assert(!dictPlan.contains("Window"),
      s"dictionary pass must not window:\n$dictPlan")
  }

  test("dupGramsOfHashFirst equals the single-pass dictionary on a " +
      "planted-duplicate corpus and on a zero-dup corpus (r14 advice: " +
      "the low-duplication regime's measured alternative)") {
    val run = (1 to 12).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 $run u4 u5"),
      (2L, s"v1 $run v2 v3 v4 v5 v6 $run v7"),
      (3L, (1 to 40).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    def dict(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = dict(Dedup.dupGramsOf(docs, "text", 5))
    assert(want.nonEmpty)
    assert(dict(Dedup.dupGramsOfHashFirst(docs, "text", 5)) == want)
    // zero-dup corpus: both empty, and hash-first's empty-dictionary
    // short-circuit must not NPE (stat.bloomFilter over zero rows)
    val unique = Seq((1L, (1 to 30).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    assert(dict(Dedup.dupGramsOfHashFirst(unique, "text", 5)).isEmpty)
    assert(Dedup.exactSubstrSpans(unique, "doc_id", "text", 5).count() == 0)
  }

  test("BloomMightContain participates in whole-stage codegen and " +
      "matches direct filter probes (no false negatives)") {
    import org.apache.spark.sql.execution.debug._
    val members = (0L until 512L).map(_ * 7919L)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(512, 0.01)
    members.foreach(bloom.putLong)
    val bc = spark.sparkContext.broadcast(bloom)
    val probe = spark.range(0, 6000)
      .select((col("id") * 7919L).as("h"))
      .filter(graft.functions.BloomMightContain(bc, col("h")))
    // codegen participation (the Md5Embed convention): the generated
    // Java probes the resolved filter directly — no Scala-udf boundary
    val gen = codegenString(probe.queryExecution.executedPlan)
    assert(gen.contains("mightContainLong"), gen.take(500))
    assert(!gen.contains("ScalaUDF"), gen.take(500))
    val kept = probe.collect().map(_.getLong(0)).toSet
    // bloom contract: every member survives; non-members only as fpp
    assert(members.toSet.subsetOf(kept))
    // 5488 non-members at fpp 0.01 → ~55 expected; 3x headroom for the
    // sketch's actual bit/hash rounding
    val extras = kept -- members.toSet
    assert(extras.size <= 165, s"fpp blowout: ${extras.size} of 5488")
    // interpreted path (eval) agrees with the generated path
    members.take(16).foreach(h => assert(bc.value.mightContainLong(h)))
  }
}
