package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Knn, Retrieval}

/** The 1-bit ANN tier and the BM25 / RRF retrieval operators, each
  * checked against a plain-Scala reference on small inputs plus the
  * standing fixture. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def packRef(v: Seq[Float]): Seq[Long] =
    v.grouped(32).map(_.zipWithIndex.foldLeft(0L) { case (acc, (x, b)) =>
      acc | (if (x >= 0f) 1L << b else 0L)
    }).toSeq

  test("binarize packs sign bits 32 per word, LSB = lowest dim; " +
      "non-multiple-of-32 dims pad with zeros") {
    val rows = Seq(
      (1L, Seq.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)),
      (2L, Seq.fill(64)(0.0f)),                  // +0 binarizes to 1
      (3L, Seq.tabulate(64)(i => i - 32.0f)),    // sign flip mid-vector
      (4L, Seq.tabulate(40)(i => -i - 1.0f))     // 40 dims → 2 words, pad 0
    ).toDF("vec_id", "embedding")
    val got = Ann.binarize(rows)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val in = Seq(
      1L -> Seq.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f),
      2L -> Seq.fill(64)(0.0f),
      3L -> Seq.tabulate(64)(i => i - 32.0f),
      4L -> Seq.tabulate(40)(i => -i - 1.0f)).toMap
    in.foreach { case (id, v) => assert(got(id) == packRef(v), s"id=$id") }
    // every word fits 32 bits — the sign-bit-overflow guard the 32-bit
    // packing exists for
    got.values.flatten.foreach(w => assert(w >= 0L && w < (1L << 32)))
  }

  test("hammingWords equals the per-dim sign-disagreement count") {
    val a = Seq.tabulate(64)(i => if (i < 20) 1.0f else -1.0f)
    val b = Seq.tabulate(64)(i => if (i < 28) 1.0f else -1.0f)
    // cross two 1-row frames — the broadcast shape searchBq uses
    val bits1 = Ann.binarize(Seq((1L, a)).toDF("vec_id", "embedding"))
      .select(col("bits"))
    val bits2 = Ann.binarize(Seq((2L, b)).toDF("vec_id", "embedding"))
      .select(col("bits").as("qbits"))
    val ham = bits1.crossJoin(bits2)
      .select(Ann.hammingWords(col("bits"), col("qbits")).as("h"))
      .head().getLong(0)
    assert(ham == 8L) // dims 20..27 disagree
  }

  test("searchBq == exact cosine ranking restricted to the Hamming " +
      "candidate set; batch form equals per-query singles (fixture)") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val bin = Ann.binarize(e).cache()
    val qs = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Ann.searchBqBatch(e, bin, qs, k = 5, overfetch = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val singles = (0L until 3L).flatMap { q =>
      Ann.searchBq(e, bin,
          e.filter(col("vec_id") === q).select(col("embedding").as("qvec")),
          k = 5, overfetch = 4)
        .collect().map(r => (q, r.getLong(0)))
    }.toSet
    assert(batch == singles)
    // the single-query result is the exact top-5 of its own candidate set
    val q0 = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val qbits = Ann.binarize(
        q0.select(lit(0L).as("vec_id"), col("qvec").as("embedding")))
      .select(col("bits").as("qbits"))
    val cands = bin.crossJoin(broadcast(qbits))
      .select(col("vec_id"),
        Ann.hammingWords(col("bits"), col("qbits")).as("ham"))
      .orderBy(col("ham"), col("vec_id")).limit(20).select(col("vec_id"))
    val expect = Knn.topK(e.join(cands, Seq("vec_id"), "left_semi"), q0, 5)
      .collect().map(_.getLong(0)).toSeq
    val got = Ann.searchBq(e, bin, q0, k = 5, overfetch = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expect)
    bin.unpersist()
  }

  test("Bm25Index: save/load round trip and even+odd append both equal " +
      "the ad-hoc bm25TopK") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val terms = Retrieval.seedTerms(d, "doc_id", "text", 0L, 4)
    val adhoc = Retrieval.bm25TopK(d, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bm25_spec").toString
    try {
      Retrieval.saveBm25Index(Retrieval.buildBm25Index(d), tmp)
      val loaded = Retrieval.bm25IndexTopK(
          Retrieval.loadBm25Index(spark, tmp), terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(loaded == adhoc)
    } finally graft.streaming.EventStream.deleteDir(tmp)
    val appended = Retrieval.bm25IndexTopK(
        Retrieval.appendBm25Index(
          Retrieval.buildBm25Index(d.filter(col("doc_id") % 2 === 0)),
          d.filter(col("doc_id") % 2 === 1)),
        terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(appended == adhoc)
  }

  test("streaming BM25 index maintenance: 4 foreachBatch appends build " +
      "the same index as one batch build (ingest-forever, lexical)") {
    import org.apache.spark.sql.streaming.Trigger
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val terms = Retrieval.seedTerms(d, "doc_id", "text", 0L, 4)
    val adhoc = Retrieval.bm25TopK(d, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bm25_stream").toString
    d.repartitionByRange(4, col("doc_id")).write.mode("overwrite").parquet(tmp)
    try {
      // empty index seeded from a 0-row slice; each micro-batch appends
      // (tokenize work ∝ batch, postings never rebuilt)
      var ix = Retrieval.buildBm25Index(d.filter(lit(false)))
      val q = spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            ix = Retrieval.appendBm25Index(ix, batch)
            // pin each increment: state must be source-independent by
            // the time the next batch lands (the ingestDedupExact shape)
            ix = Retrieval.Bm25Index(ix.postings.localCheckpoint(true),
              ix.docLens.localCheckpoint(true))
            ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = Retrieval.bm25IndexTopK(ix, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(streamed == adhoc)
    } finally graft.streaming.EventStream.deleteDir(tmp)
  }

  test("streamTopKExact: 4-micro-batch bounded-heap fold equals the " +
      "batch exact top-k; n_seen proves every batch folded") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val total = e.count()
    val qs = e.filter(col("vec_id") < 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_topk_spec").toString
    e.repartitionByRange(4, col("vec_id")).write.mode("overwrite").parquet(tmp)
    try {
      val got = graft.streaming.EventStream
        .streamTopKExact(spark, tmp, e.schema, qs, k = 5)
      // every corpus row passed through the fold (a last-batch-only
      // result would carry seen ≈ |batch|)
      assert(got.select(col("n_seen")).distinct().collect()
        .map(_.getLong(0)).toSeq == Seq(total))
      // bounded state: ≤ k rows per query survive
      val perQ = got.groupBy(col("qid")).count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(perQ.values.forall(_ <= 5) && perQ.keySet == Set(0L, 1L))
      val gotSet = got.select(col("qid"), col("vec_id"), col("simil"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = graft.operators.Knn.topKPerQuery(e,
          e.filter(col("vec_id") < 2)
            .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
          k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(gotSet == batch)
    } finally graft.streaming.EventStream.deleteDir(tmp)
  }

  test("seedTerms: first-n distinct tokens in order of first appearance") {
    val d = Seq((0L, "b a b c a d e"), (1L, "z z z")).toDF("doc_id", "text")
    val got = Retrieval.seedTerms(d, "doc_id", "text", 0L, 3)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("b", "a", "c"))
  }

  test("bm25TopK equals a plain-Scala BM25 reference on a tiny corpus") {
    val corpus = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana durian"),
      (3L, "cherry durian elder fig grape"),
      (4L, "apple apple apple apple"),
      (5L, "elder fig"))
    val terms = Seq("apple", "durian")
    val d = corpus.toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(d, terms.map(Tuple1(_)).toDF("term"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: same formula, straight doubles, rounded at the end
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val df = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    val expect = toks.flatMap { case (id, ws) =>
      val s = terms.map { t =>
        val tf = ws.count(_ == t)
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ws.size / avgdl))
      }.sum
      if (s > 0) Some(id -> math.rint(s * 1e4) / 1e4) else None
    }
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expect(id)) < 1e-9, s"doc $id: $s vs ${expect(id)}")
    }
  }

  test("bm25BatchTopK equals per-seed bm25TopK singles; seedTermsBatch " +
      "equals per-seed seedTerms") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val seeds = Seq(0L, 1L, 2L)
    val qtBatch = Retrieval.seedTermsBatch(d, "doc_id", "text", seeds, n = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val qtSingles = seeds.flatMap { id =>
      Retrieval.seedTerms(d, "doc_id", "text", id, 4)
        .collect().map(r => (id, r.getString(0)))
    }.toSet
    assert(qtBatch == qtSingles)
    val batch = Retrieval.bm25BatchTopK(d,
        Retrieval.seedTermsBatch(d, "doc_id", "text", seeds, n = 4), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val singles = seeds.flatMap { id =>
      Retrieval.bm25TopK(d,
          Retrieval.seedTerms(d, "doc_id", "text", id, 4), k = 5)
        .collect().map(r => (id, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == singles)
  }

  test("retrieve-then-rerank: the model scorer sees ONLY the bm25 " +
      "candidate set, and the final order is by model score") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val terms = Retrieval.seedTerms(d, "doc_id", "text", 0L, 4)
    val cands = Retrieval.bm25TopK(d, terms, k = 20)
    val candIds = cands.collect().map(_.getLong(0)).toSet
    val reranked = cands
      .join(broadcast(operators.TextAnalysis.modelScore(
        d.join(broadcast(cands.select(col("doc_id"))), Seq("doc_id"),
          "left_semi"), "doc_id", "text", dim = 1024)), Seq("doc_id"))
      .select(col("doc_id"), col("model_score"))
      .orderBy(col("model_score").desc, col("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(reranked.map(_._1).toSet.subsetOf(candIds))
    assert(reranked.map(_._2).toSeq == reranked.map(_._2).sorted.reverse.toSeq)
  }

  test("bm25TopK equals a plain-Scala BM25 reference on 200 seeded " +
      "random docs (randomized property)") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "cd", "efg", "hij", "k", "lm", "nop", "q9")
    val corpus = (0L until 200L).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val terms = Seq("cd", "nop", "a")
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        terms.map(Tuple1(_)).toDF("term"), k = 200)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val df = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    corpus.foreach { case (id, _) =>
      val ws = toks(id)
      val s = terms.map { t =>
        val tf = ws.count(_ == t)
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ws.size / avgdl))
      }.sum
      if (s > 0)
        assert(math.abs(got(id) - s) < 1e-4, s"doc $id: ${got(id)} vs $s")
      else assert(!got.contains(id))
    }
  }

  test("binarize equals the pack reference on 100 seeded random vectors " +
      "including NaN/Inf components (randomized property)") {
    val rnd = new scala.util.Random(77)
    val rows = (0L until 100L).map { i =>
      (i, Seq.tabulate(64) { _ =>
        rnd.nextInt(20) match {
          case 0 => Float.NaN
          case 1 => Float.PositiveInfinity
          case 2 => Float.NegativeInfinity
          case _ => (rnd.nextFloat() - 0.5f) * 4f
        }
      })
    }
    val got = Ann.binarize(rows.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, v) =>
      // SQL comparison semantics, NOT Scala's IEEE: both Spark and
      // DuckDB order NaN GREATER than every value, so NaN >= 0 is true
      // and a NaN component binarizes to bit 1 (cross-engine consistent,
      // which is what the hash-matched oracle needs); ±Inf follow sign
      val ref = packRef(v.map(x => if (x.isNaN) 1.0f else x))
      assert(got(id) == ref, s"id=$id")
    }
  }

  test("rrfFuseBatch equals per-qid rrfFuse singles on the fixture") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val qs = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val vec = Knn.topKPerQuery(e, qs, k = 8)
      .select(col("qid"), col("vec_id").as("doc_id"), col("simil").as("score"))
    val bm = Retrieval.bm25BatchTopK(d,
      Retrieval.seedTermsBatch(d, "doc_id", "text", Seq(0L, 1L, 2L), 4), k = 8)
    val batch = Retrieval.rrfFuseBatch(Seq(("vec", vec), ("bm25", bm)), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val singles = (0L until 3L).flatMap { q =>
      val v1 = vec.filter(col("qid") === q).select(col("doc_id"), col("score"))
      val b1 = bm.filter(col("qid") === q).select(col("doc_id"), col("score"))
      Retrieval.rrfFuse(Seq(("vec", v1), ("bm25", b1)), k = 5)
        .collect().map(r => (q, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == singles)
  }

  test("mmrRerank equals a plain-Scala greedy MMR reference on the " +
      "fixture candidates") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val cands = Knn.topK(e, q, k = 12)
      .select(col("vec_id"), round(col("simil"), 4).as("rel"))
      .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val got = Retrieval.mmrRerank(cands, k = 4, lam = 0.75,
        idCol = "vec_id", relCol = "rel", vecCol = "embedding")
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    // plain-Scala reference over the same collected candidates
    val cs = cands.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i).toDouble * b(i)
        na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    var sel = Vector.empty[(Int, Long, Double)]
    var pool = cs.toVector
    for (t <- 1 to 4) {
      val scored = pool.map { case (id, rel, v) =>
        // BigDecimal(double) = valueOf semantics = Spark round's base
        val pen = if (sel.isEmpty) 0.0
          else sel.map(s => BigDecimal(cos(v, cs.find(_._1 == s._2).get._3))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).max
        (id, r4(0.75 * rel - 0.25 * pen))
      }
      val best = scored.minBy { case (id, m) => (-m, id) }
      sel :+= ((t, best._1, best._2))
      pool = pool.filterNot(_._1 == best._1)
    }
    assert(got == sel)
  }

  test("filtered IVF search: every hit satisfies the predicate, and an " +
      "all-buckets probe equals the exact filtered top-k") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val keep = d.filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val ivf = operators.Ann.buildIvf(e)
    val filtered = operators.Ann.Ivf(
      ivf.assignments.join(keep, Seq("vec_id"), "left_semi"), ivf.centroids)
    val hits = operators.Ann.searchIvf(filtered, q, nprobe = 32, k = 10)
      .collect().map(_.getLong(0)).toSeq
    val enIds = keep.collect().map(_.getLong(0)).toSet
    assert(hits.forall(enIds.contains))
    val exact = Knn.topK(e.join(keep, Seq("vec_id"), "left_semi"), q, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(hits == exact, "all-buckets filtered probe must equal exact")
  }

  test("rrfFuse: ranks are per-list (partitioned window), fused score is " +
      "Σ 1/(c+rank); items on one list only still fuse") {
    val la = Seq((10L, 0.9), (11L, 0.8), (12L, 0.7)).toDF("doc_id", "score")
    val lb = Seq((11L, 5.0), (13L, 4.0)).toDF("doc_id", "score")
    val got = Retrieval.rrfFuse(Seq(("a", la), ("b", lb)), k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def rr(r: Int) = 1.0 / (60 + r)
    val expect = Map(
      10L -> rr(1), 11L -> (rr(2) + rr(1)), 12L -> rr(3), 13L -> rr(2))
      .map { case (k, v) => k -> math.rint(v * 1e6) / 1e6 }
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expect(id)) < 1e-9, s"doc $id") }
    // the ranking window must be partitioned (by list tag) — the probe
    // in PipelineSpec enforces this for headline queries; pin it here
    // for the operator itself
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = Retrieval.rrfFuse(Seq(("a", la), ("b", lb)), k = 4)
      .queryExecution.sparkPlan
    val unpart = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(unpart.isEmpty, "rrfFuse planned an unpartitioned window")
  }

  test("hardNegatives: no positive survives, ranks are contiguous 1..k " +
      "per query, and the set equals filter-then-rerank of the " +
      "overfetched candidates") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val qt = Retrieval.seedTermsBatch(d, "doc_id", "text",
      seedIds = Seq(0L, 1L, 2L), n = 4)
    // two positives for query 0 (its own doc AND doc 1) — the
    // multi-positive contract
    val pos = Seq((0L, 0L), (0L, 1L), (1L, 1L), (2L, 2L))
      .toDF("qid", "doc_id")
    val kNeg = 5
    val got = Retrieval.hardNegatives(d, qt, pos, kNeg, overfetch = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val posSet = Set((0L, 0L), (0L, 1L), (1L, 1L), (2L, 2L))
    assert(got.nonEmpty)
    got.foreach { case (q, neg, _) =>
      assert(!posSet.contains((q, neg)), s"positive ($q, $neg) leaked") }
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length),
        s"ranks not contiguous for qid $q")
      assert(rows.length == kNeg, s"qid $q short of negatives")
    }
    // brute force: overfetched candidates minus positives, re-ranked
    val cand = Retrieval.bm25BatchTopK(d, qt, kNeg + 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = cand.filter(c => !posSet.contains((c._1, c._2)))
      .groupBy(_._1).toSeq.flatMap { case (q, xs) =>
        xs.sortBy(x => (-x._3, x._2)).take(kNeg).zipWithIndex
          .map { case (x, i) => (q, x._2, i + 1L) }.toSeq
      }.toSet
    assert(got.toSet == expect, "hardNegatives diverges from brute force")
  }
}
