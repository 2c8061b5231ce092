package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Leakage-free splitting: cluster atomicity, append stability, weight
  * shares, and the no-pairs-across-splits guarantee. */
class SplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val weights = Seq(("train", 8), ("val", 1), ("test", 1))

  test("every near-dup pair lands in ONE split; singletons distribute " +
      "by weight; assignment is deterministic") {
    // 300 singletons + 3 planted clusters (chains of 4)
    val docs = (0L until 312L).toDF("doc_id")
    val pairs = Seq(
      (300L, 301L), (301L, 302L), (302L, 303L),
      (304L, 305L), (305L, 306L), (306L, 307L),
      (308L, 309L), (309L, 310L), (310L, 311L))
      .toDF("id_a", "id_b")
    val a = Dedup.leakFreeSplit(docs, "doc_id", pairs, weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.size == 312)
    // atomicity: each planted cluster is single-split
    Seq(300L to 303L, 304L to 307L, 308L to 311L).foreach { cl =>
      assert(cl.map(a).toSet.size == 1, s"cluster $cl split across: " +
        cl.map(a).toSet)
    }
    // weight shares on the singletons: train should dominate ~80%
    val singles = (0L until 300L).map(a)
    val trainShare = singles.count(_ == "train") / 300.0
    assert(trainShare > 0.6 && trainShare < 0.95, s"train $trainShare")
    assert(singles.toSet == Set("train", "val", "test"),
      "some split got no singleton at 300 draws")
    // determinism
    val b = Dedup.leakFreeSplit(docs, "doc_id", pairs, weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("append stability: new docs joining an existing cluster inherit " +
      "its split; disjoint new docs never move old assignments") {
    val docs1 = (0L until 100L).toDF("doc_id")
    val pairs1 = Seq((10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    val before = Dedup.leakFreeSplit(docs1, "doc_id", pairs1, weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // batch 2: doc 200 is a near-dup of 12 (joins the 10-cluster);
    // docs 201..209 are fresh singletons
    val docs2 = ((0L until 100L) ++ (200L until 210L)).toDF("doc_id")
    val pairs2 = (Seq((10L, 11L), (11L, 12L)) :+ (12L, 200L))
      .toDF("id_a", "id_b")
    val after = Dedup.leakFreeSplit(docs2, "doc_id", pairs2, weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // old assignments unchanged (cluster rep = min id = 10 either way)
    before.foreach { case (id, sp) =>
      assert(after(id) == sp, s"doc $id moved $sp -> ${after(id)}")
    }
    // the joiner inherits the cluster's split
    assert(after(200L) == after(10L))
  }

  test("leakFreeSplitAppend is append-stable under REP CHANGES: a " +
      "smaller-id joiner and a cluster bridge flip nobody (r12 advice)") {
    val docs1 = (10L until 100L).toDF("doc_id")
    val pairs1 = Seq((20L, 21L), (50L, 51L)).toDF("id_a", "id_b")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "split")
    val prior = Dedup.leakFreeSplitAppend(docs1, "doc_id", pairs1,
      weights, empty)
    val before = prior.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // first round with empty prior == the one-shot form exactly
    val oneShot = Dedup.leakFreeSplit(docs1, "doc_id", pairs1, weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == oneShot)
    // batch 2 delivers the one-shot form's two failure modes:
    //  - doc 2 (SMALLER id) joins the 20-cluster: its rep becomes 2,
    //    so the one-shot slot for 20/21 is redrawn (md5 slot of rep 2
    //    is 'val' where rep 20's was 'train' — a REAL flip);
    //  - doc 5 BRIDGES the 20- and 50-clusters into one component.
    val docs2 = ((10L until 100L) ++ Seq(2L, 5L)).toDF("doc_id")
    val pairs2 = Seq((20L, 21L), (50L, 51L), (2L, 20L), (5L, 21L),
      (5L, 50L)).toDF("id_a", "id_b")
    val after = Dedup.leakFreeSplitAppend(docs2, "doc_id", pairs2,
        weights, prior)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // absolute stability: every shipped assignment survives verbatim
    before.foreach { case (id, sp) =>
      assert(after(id) == sp, s"doc $id flipped $sp -> ${after(id)}")
    }
    // the one-shot form DOES flip here — the spec is not vacuous
    val naive = Dedup.leakFreeSplit(docs2, "doc_id", pairs2, weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before.exists { case (id, sp) => naive(id) != sp },
      "fixture failed to exercise the rep-drift failure mode")
    // new members inherit deterministically: the smallest-id assigned
    // member of the merged component (20, whose prior split rules)
    assert(after(2L) == before(20L))
    assert(after(5L) == before(20L))
  }
}
