package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Randomized (seeded, deterministic) property coverage for the columnar
  * primitives, checked against independent plain-Scala reference
  * implementations. Hundreds of generated documents go through ONE
  * DataFrame pass per property — the breadth of property testing without
  * per-case Spark job overhead. The generator leans on the edges the
  * hand-written specs can't enumerate: token counts straddling the n-gram
  * boundary (len < n, == n, > n), single-char and longer words, repeated
  * words, empty-ish docs.
  */
class RandomizedPrimitiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 400 random docs of 0–12 clean words (joined by single spaces so the
    * Spark-side regexp tokenizer and Scala's split agree by construction). */
  private def randomDocs(seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("a", "b", "cd", "efg", "hij", "k", "lm", "nop", "q9", "r")
    (0L until 400L).map { i =>
      val n = rnd.nextInt(13)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  test("ngrams equals a sliding-window reference on 400 random docs, " +
      "n in {1, 2, 3, 8}") {
    val docs = randomDocs(seed = 101)
    val df = docs.toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3, 8)) {
      val got = df.select(col("doc_id"), Dedup.ngrams(col("text"), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      docs.foreach { case (id, text) =>
        // the engine's tokens() contract: splitting "" yields ONE empty
        // token (identically in Spark split, Scala split, and DuckDB
        // string_split_regex — which is why the oracles hash-match), so an
        // empty doc has a single 1-gram "" and no higher grams
        val words = text.split("\\s+").toList
        val want =
          if (words.length < n) Nil
          else words.sliding(n).map(_.mkString(" ")).toList
        assert(got(id) == want, s"n=$n doc=$id text='$text'")
      }
    }
  }

  test("jaccard column equals set arithmetic on 400 random word-set pairs") {
    val rnd = new scala.util.Random(202)
    val vocab = Vector("w1", "w2", "w3", "w4", "w5", "w6")
    val pairs = (0L until 400L).map { i =>
      def set() = rnd.shuffle(vocab).take(1 + rnd.nextInt(vocab.size)).toList
      (i, set(), set())
    }
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"), Dedup.jaccard(col("a"), col("b")).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pairs.foreach { case (id, a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val want = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(got(id) - want) < 1e-12, s"pair $id: $a vs $b")
    }
  }

  test("native codegen simhash/fingerprint equal their interpreted HOF " +
      "twins on 400 random docs") {
    val df = randomDocs(seed = 303).toDF("doc_id", "text")
    val diff = df.select(
        Dedup.simhash(col("text")).as("s_native"),
        Dedup.simhashHof(col("text")).as("s_hof"),
        TextAnalysis.fingerprint(col("text")).as("f_native"),
        TextAnalysis.fingerprintHof(col("text")).as("f_hof"))
      .filter(col("s_native") =!= col("s_hof") ||
        col("f_native") =!= col("f_hof"))
    assert(diff.count() == 0)
  }

  test("native codegen md5 embedding equals its interpreted HOF twin " +
      "bit-for-bit on 400 random docs (incl. empty text) at two dims") {
    val df = randomDocs(seed = 307).toDF("doc_id", "text")
      .union(Seq((9999999L, "")).toDF("doc_id", "text"))
    Seq(8, 64).foreach { dim =>
      val diff = df.select(
          Embeddings.embedCol(col("text"), dim).as("native"),
          Embeddings.embedColHof(col("text"), dim).as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(diff.count() == 0, s"dim=$dim diverged")
    }
    // codegen participation (the DedupAnnSpec ANN-kernel pattern): over
    // a real parquet scan the generated Java calls the static helper —
    // no interpreted fallback sneaking the embed pass out of
    // whole-stage codegen (a local-relation plan reports no codegen
    // subtrees at all, so the fixture scan is the right probe)
    import org.apache.spark.sql.execution.debug._
    val gen = codegenString(
      Tables.load(spark, TestSpark.sfDir, "documents")
        .select(Embeddings.embedCol(col("text"), 64).as("v"))
        .queryExecution.executedPlan)
    assert(gen.contains("graft.functions.Md5EmbedUtil.embed"),
      gen.take(500))
  }

  test("stratifiedSample: exact quota per stratum, subset of input, " +
      "rank filter compiles to WindowGroupLimit") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val sampled = TextAnalysis.stratifiedSample(docs, "lang", "doc_id", 20)
    val counts = sampled.groupBy(col("lang")).count()
      .collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ == 20L))
    assert(sampled.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    // the scale claim: the per-stratum top-k is a WindowGroupLimit (partial
    // limit below the shuffle), not a full sort+filter of the corpus
    assert(sampled.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
  }

  test("weightedSample equals a plain-Scala Efraimidis-Spirakis reference " +
      "on random weights; an overwhelming weight is always sampled; the " +
      "top-n is TakeOrdered, not a global sort") {
    val rnd = new scala.util.Random(707)
    val rows = (0L until 400L).map(i => (i, 0.05 + rnd.nextDouble()))
    val df = rows.toDF("doc_id", "w")
    val n = 50
    val got = TextAnalysis.weightedSample(df, "doc_id", col("w"), n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // plain-Scala twin of the md5-uniform E-S key
    def key(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val u = (java.lang.Long.parseLong(md, 16).toDouble + 1.0) /
        1152921504606846976.0d
      math.log(u) / w
    }
    val want = rows.sortBy { case (id, w) => (-key(id, w), id) }
      .take(n).map(_._1).toSet
    assert(got == want)
    // dominance: one huge weight among tiny ones is always in a 1-sample
    val skew = (0L until 10L).map(i => (i, if (i == 7L) 1e6 else 1e-6))
      .toDF("doc_id", "w")
    val one = TextAnalysis.weightedSample(skew, "doc_id", col("w"), 1)
      .select("doc_id").head.getLong(0)
    assert(one == 7L)
    // scale claim: limit-after-order is TakeOrderedAndProject
    assert(TextAnalysis.weightedSample(df, "doc_id", col("w"), n)
      .queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("bandedHammingPairs equals brute-force all-pairs popcount across " +
      "random hash corpora and (bands, maxHamming) geometries — the " +
      "pigeonhole exactness property behind simhash AND phash near-dup") {
    val rnd = new scala.util.Random(42)
    // random 60-bit hashes plus planted near-pairs at controlled distances
    val base = (0L until 150L).map(i => (i, rnd.nextLong() >>> 4))
    val planted = base.take(30).zipWithIndex.map { case ((id, h), i) =>
      val flips = i % 8 // hamming 0..7 from the partner
      var v = h
      (0 until flips).foreach { _ => v = v ^ (1L << rnd.nextInt(60)) }
      (id + 1000L, v)
    }
    val hashed = (base ++ planted).toDF("id", "h")
    for ((bands, maxH) <- Seq((15, 12), (4, 3), (10, 5), (6, 4))) {
      val banded = Dedup.bandedHammingPairs(hashed, "id", "h",
          bits = 60, maxHamming = maxH, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val a = hashed.toDF("id_a", "ha")
      val brute = a.crossJoin(hashed.toDF("id_b", "hb"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
        .filter(col("hamming") <= maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == brute,
        s"bands=$bands maxH=$maxH: banded ${banded.size} vs brute ${brute.size}")
      assert(brute.nonEmpty, "planted pairs must exercise the join")
    }
  }

  test("mixEpochs: whole epochs are exact, fractional epochs realize as " +
      "floor/ceil per document with both outcomes present, unlisted " +
      "sources default to one epoch, and the plan is deterministic") {
    val docs = (0L until 300L).map(i =>
      (i, if (i < 100) "up" else if (i < 200) "down" else "other"))
      .toDF("doc_id", "source")
    val recipe = Map("up" -> 2.5, "down" -> 0.5)
    val out = TextAnalysis.mixEpochs(docs, "doc_id", "source", recipe)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    // epochs are always the contiguous prefix 0..n-1
    perDoc.foreach { case (_, es) => assert(es == (0 until es.length)) }
    val bySource = out.groupBy(_._2).view
      .mapValues(_.groupBy(_._1).map(_._2.length)).toMap
    assert(bySource("up").forall(n => n == 2 || n == 3) &&
      bySource("up").exists(_ == 2) && bySource("up").exists(_ == 3))
    assert(bySource("down").forall(_ == 1)) // 0-epoch docs emit no rows
    assert(bySource("down").size < 100 && bySource("down").size > 0)
    assert(bySource("other").size == 100 && bySource("other").forall(_ == 1))
    val again = TextAnalysis.mixEpochs(docs, "doc_id", "source", recipe)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("binnedIntervalJoin equals the naive range join on 300 random " +
      "intervals x 500 random points, several bin widths") {
    val rnd = new scala.util.Random(909)
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val intervals = (0L until 300L).map { i =>
      val s = t0 + rnd.nextInt(86400) * 1000L
      (rnd.nextInt(5).toLong, i, new java.sql.Timestamp(s),
        new java.sql.Timestamp(s + (60 + rnd.nextInt(7200)) * 1000L))
    }.toDF("k", "iv_id", "w_start", "w_end")
    val points = (0L until 500L).map { i =>
      (rnd.nextInt(5).toLong,
        new java.sql.Timestamp(t0 + rnd.nextInt(90000) * 1000L))
    }.toDF("k", "ts")
    val naive = intervals.as("i").join(points.as("p"),
        col("i.k") === col("p.k") &&
          col("p.ts") >= col("i.w_start") && col("p.ts") < col("i.w_end"))
      .select(col("iv_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
      .sortBy(p => (p._1, p._2.getTime)).toList
    for (binSec <- Seq(60L, 600L, 3600L, 100000L)) {
      val got = graft.operators.RangeJoin.binnedIntervalJoin(
          intervals, points, Seq("k"), "w_start", "w_end", "ts", binSec)
        .select(col("iv_id"), col("ts"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
        .sortBy(p => (p._1, p._2.getTime)).toList
      assert(got == naive, s"binSeconds=$binSec")
    }
  }

  test("lmScore equals a plain-Scala bigram-LM reference on 400 random " +
      "docs (counts, smoothing, decimal-sum mean); short docs drop out") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val docs = randomDocs(seed = 404)
    val got = TextAnalysis.lmScore(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toList }
    val uni = toks.flatMap(_._2).groupBy(identity).map { case (w, l) =>
      w -> l.size }
    val v = uni.size
    val bigrams = toks.map { case (id, ws) =>
      id -> (if (ws.length < 2) Nil else ws.sliding(2).map(_.mkString(" ")).toList)
    }
    val bc = bigrams.flatMap(_._2).groupBy(identity).map { case (g, l) =>
      g -> l.size }
    val want = bigrams.filter(_._2.nonEmpty).map { case (id, gs) =>
      val lps = gs.map { g =>
        val c12 = bc(g); val c1 = uni(g.split(" ")(0))
        BigDecimal(math.log((c12 + 1.0) / (c1 + v))).setScale(12, HALF_UP)
      }
      val mean = (lps.sum.toDouble / gs.length)
      id -> (gs.length.toLong,
        BigDecimal(mean).setScale(12, HALF_UP).setScale(4, HALF_UP).toDouble)
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (n, s)) =>
      assert(got(id) == ((n, s)), s"doc $id: got ${got(id)}, want ($n, $s)")
    }
  }

  test("packShards equals a per-stream prefix-sum reference on random " +
      "docs; shards are contiguous and overflow-bounded") {
    val rnd = new scala.util.Random(505)
    val docs = (0L until 300L).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(30))("w").mkString(" ")
      (i, s"s${rnd.nextInt(3)}", words)
    }
    val budget = 40L
    val got = TextAnalysis
      .packShards(docs.toDF("doc_id", "stream", "text"), "stream", "doc_id",
        "text", budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference: walk each stream in id order, shard = floor(prefix/budget)
    val byStream = docs.groupBy(_._2)
    got.groupBy(_._1).foreach { case (stream, rows) =>
      val ordered = byStream(stream).sortBy(_._1)
      var prefix = 0L
      val want = ordered.map { case (id, _, text) =>
        val n = text.split("\\s+").length.toLong
        val shard = prefix / budget
        prefix += n
        (id, n, shard)
      }
      assert(rows.sortBy(_._2).map(r => (r._2, r._3, r._4)).toList ==
        want.toList, s"stream $stream")
      // contiguity: shard ids are non-decreasing in id order
      val shards = rows.sortBy(_._2).map(_._4)
      assert(shards.zip(shards.drop(1)).forall { case (a, b) => a <= b })
    }
  }

  test("temperatureEpochs conserves the token budget, upweights small " +
      "sources at alpha < 1, and degenerates to uniform epochs at alpha = 1") {
    val rnd = new scala.util.Random(808)
    val docs = (0L until 400L).map { i =>
      val src = s"s${i % 4}"
      val n = 1 + (if (src == "s0") rnd.nextInt(5) else 20 + rnd.nextInt(40))
      (i, src, Seq.fill(n)("w").mkString(" "))
    }
    val df = docs.toDF("doc_id", "source", "text")
    val totals = docs.groupBy(_._2)
      .map { case (s, rows) =>
        s -> rows.map(_._3.split("\\s+").length.toLong).sum }
    val B = 10000L
    val eps = TextAnalysis.temperatureEpochs(df, "source", "text",
      alpha = 0.5, budgetTokens = B)
    // sum over sources of epochs*tokens = the budget (p_s sums to 1)
    val spent = eps.map { case (s, e) => e * totals(s) }.sum
    assert(math.abs(spent - B) < 1e-6 * B, s"spent $spent of $B")
    // the small source gets MORE epochs than every big one at alpha<1
    assert(Seq("s1", "s2", "s3").forall(s => eps("s0") > eps(s)), eps.toString)
    // alpha=1: every source runs the same fraction of an epoch
    val e1 = TextAnalysis.temperatureEpochs(df, "source", "text",
      alpha = 1.0, budgetTokens = B).values.toSeq
    assert(e1.forall(v => math.abs(v - e1.head) < 1e-12), e1.toString)
  }

  test("modelScore equals a plain-Scala md5-hash + weight-table reference " +
      "on 400 random docs; keep flips exactly at the zero margin") {
    val docs = randomDocs(seed = 707).filter(_._2.nonEmpty)
    val got = TextAnalysis
      .modelScore(docs.toDF("doc_id", "text"), "doc_id", "text", dim = 1024)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(t: String): Long = {
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    docs.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val wsum = toks.map(t => ((h(t) % 1024) * 37 + 11) % 201 - 100).sum
      val raw = wsum.toDouble / (100.0 * toks.size)
      // mirror Graft.roundExact: decimal(28,12) first, then round to 4
      val want = BigDecimal(raw).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == ((want, raw >= 0.0)), s"doc $id text '$text'")
    }
  }

  test("packSequences tiles each stream's token stream exactly: slices " +
      "cover every doc contiguously and sequences fill back-to-back") {
    val rnd = new scala.util.Random(606)
    val docs = (0L until 300L).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(30))("w").mkString(" ")
      (i, s"s${rnd.nextInt(3)}", words)
    }
    val L = 32L
    val got = TextAnalysis.packSequences(
        docs.toDF("doc_id", "stream", "text"), "stream", "doc_id", "text", L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // reference: walk each stream in id order with a global token cursor,
    // slicing each doc at every sequence boundary it crosses
    val byStream = docs.groupBy(_._2)
    got.groupBy(_._1).foreach { case (stream, rows) =>
      val ordered = byStream(stream).sortBy(_._1)
      var cursor = 0L
      val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
      ordered.foreach { case (id, _, text) =>
        val n = text.split("\\s+").length.toLong
        var off = 0L
        while (off < n) {
          val pos = cursor + off
          val seq = pos / L
          val endOff = math.min(n, (seq + 1) * L - cursor)
          want += ((id, seq, pos - seq * L, cursor + endOff - seq * L, off))
          off = endOff
        }
        cursor += n
      }
      assert(rows.sortBy(r => (r._2, r._3))
        .map(r => (r._2, r._3, r._4, r._5, r._6)).toList ==
        want.sortBy(r => (r._1, r._2)).toList, s"stream $stream")
    }
    // sequences fill back-to-back: per (stream, seq) the slices tile
    // [0, x) with no gaps (x = L except possibly the stream's last seq)
    got.groupBy(r => (r._1, r._3)).foreach { case ((stream, seq), slices) =>
      val sorted = slices.sortBy(_._4).map(r => (r._4, r._5))
      assert(sorted.head._1 == 0L, s"$stream seq $seq starts at ${sorted.head._1}")
      sorted.zip(sorted.drop(1)).foreach { case ((_, e), (b2, _)) =>
        assert(e == b2, s"$stream seq $seq gap at $e")
      }
      assert(sorted.forall { case (b, e) => b < e && e <= L })
    }
  }

  test("minhash HOF signature equals the explode+min-agg signature on " +
      "random docs with >= 3 tokens") {
    // the exploded path only emits rows for docs that HAVE shingles; the
    // HOF form yields nulls/empties there, so compare on docs of >= 3 words
    val df = randomDocs(seed = 404).toDF("doc_id", "text")
      .filter(size(split(trim(col("text")), "\\s+")) >= 3)
    val k = 12
    val hof = df.select(col("doc_id"),
      Dedup.minhashSignature(Dedup.shingles(col("text")), k).as("sig"))
    val exploded = df
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("g"))
      .select(col("doc_id"), Dedup.shingleHash(col("g")).as("h"))
    val aggs = (0 until k).map(s =>
      min(col("h").bitwiseXOR(Dedup.permKey(s))).as(s"sig_$s"))
    val agg = exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(s => col(s"sig_$s")): _*).as("sig"))
    val a = hof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = agg.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a.nonEmpty && a == b)
  }

  test("exactSubstrSpans equals a brute-force gram-count + island-merge " +
      "reference on 200 random docs over a 4-word vocabulary (covers the " +
      "r14 single-pass dictionary restructure on dup-heavy input)") {
    val rnd = new scala.util.Random(303)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (0L until 200L).map { i =>
      val n = rnd.nextInt(13)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val L = 3
    val got = Dedup.exactSubstrSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sorted.toList
    // reference: global gram-string counts -> duplicated start sites ->
    // per-doc islands merged while the next start is within L
    val grams = docs.flatMap { case (id, text) =>
      val w = text.split("\\s+").toList
      if (w.length < L) Nil
      else w.sliding(L).zipWithIndex
        .map { case (g, p) => (id, p, g.mkString(" ")) }.toList
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val want = grams.filter(g => counts(g._3) >= 2)
      .groupBy(_._1).toList.flatMap { case (id, sites) =>
        val ps = sites.map(_._2).sorted
        val islands = scala.collection.mutable.ListBuffer
          .empty[scala.collection.mutable.ListBuffer[Int]]
        ps.foreach { p =>
          if (islands.nonEmpty && p - islands.last.last <= L)
            islands.last += p
          else islands += scala.collection.mutable.ListBuffer(p)
        }
        islands.toList.map(is =>
          (id, is.head, is.last + L, is.size.toLong))
      }.sorted
    assert(want.nonEmpty, "fixture produced no duplicated grams")
    assert(got == want)
  }

  test("scd2Apply folded over random time-split batches equals the " +
      "one-shot interval build (the stream_scd2 contract at random " +
      "split points)") {
    import graft.operators.Cdc
    val rnd = new scala.util.Random(404)
    // 6 keys x ~40 events with SMALL band domain (forces real runs and
    // run-extensions across split points) and strictly increasing ts
    val events = (0L until 240L).map { i =>
      (i % 6, // key
        java.sql.Timestamp.valueOf(
          f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        i, // tie
        rnd.nextInt(3).toLong) // band
    }
    val df = events.toDF("user_id", "ts", "event_id", "band")
    val oneShot = Cdc.scd2Intervals(df, "user_id", "band", "ts", "event_id")
    def key(d: org.apache.spark.sql.DataFrame) = d
      .select(col("user_id"), col("band"),
        unix_micros(col("valid_from")).as("f"),
        unix_micros(col("valid_to")).as("t"), col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .sorted.toSeq
    val want = key(oneShot)
    // three random 3-way time splits, each folded sequentially
    for (trial <- 1 to 3) {
      val cut1 = 40 + rnd.nextInt(80)
      val cut2 = cut1 + 20 + rnd.nextInt(120 - cut1 / 2)
      val parts = Seq(
        df.filter(col("event_id") < cut1),
        df.filter(col("event_id") >= cut1 && col("event_id") < cut2),
        df.filter(col("event_id") >= cut2)).filter(_.count() > 0)
      val folded = parts.tail.foldLeft(
        Cdc.scd2Intervals(parts.head, "user_id", "band", "ts", "event_id")) {
        (st, b) => Cdc.scd2Apply(st, b, "user_id", "band", "ts", "event_id")
      }
      assert(key(folded) == want, s"trial $trial (cuts $cut1/$cut2)")
    }
  }
}
