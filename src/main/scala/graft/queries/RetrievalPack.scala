package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Graft, Tables}
import graft.operators.{Knn, Retrieval, TextAnalysis}

/** Lexical (BM25) retrieval, hybrid lexical+vector rank fusion, and
  * retrieve-then-rerank — the production-retrieval surface around the
  * reference's vector-only search (`/root/reference/camp_vec_rcmn.py:44`):
  * real deployments answer a query from BOTH an inverted-index ranking
  * and an embedding ranking, fuse by reciprocal rank, and often rerank a
  * bounded candidate list with an expensive model. Everything here is
  * decimal-summed or integer-ranked, so every query hash-matches. */
object RetrievalPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 top-10 for a "more-like-this" query: the first 4 distinct
    // tokens of document 0. Posting explode filters to the broadcast
    // query terms BEFORE any shuffle; dl is a map-only size(); the
    // decimal-summed per-doc score hash-matches.
    "tx_bm25_topk" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val terms = Retrieval.seedTerms(d, "doc_id", "text", seedId = 0L, n = 4)
      Retrieval.bm25TopK(d, terms, k = 10)
        .select(col("doc_id"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // Batch BM25: 3 more-like-this queries (seeds 0,1,2 × 4 terms) in
    // ONE corpus pass — tf/df computed once over the distinct term set,
    // contributions fanned to qids by the bounded (qid, term) broadcast,
    // per-query top-k partial-aggregable. The lexical twin of
    // ann_ivf_batch_topk.
    "tx_bm25_batch_topk" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val qt = Retrieval.seedTermsBatch(d, "doc_id", "text",
        seedIds = Seq(0L, 1L, 2L), n = 4)
      Retrieval.bm25BatchTopK(d, qt, k = 10)
        .select(col("qid"), col("doc_id"), col("score"))
        .orderBy(col("qid"), col("score").desc, col("doc_id"))
    }),

    // Hard-negative mining (Karpukhin 2020): per training query, the
    // top BM25 hits that are NOT the known positive (here the query's
    // own seed doc), overfetched so dropping positives cannot starve
    // the negative set — the relation a dual-encoder trainer consumes.
    "tx_hard_negatives" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val qt = Retrieval.seedTermsBatch(d, "doc_id", "text",
        seedIds = Seq(0L, 1L, 2L), n = 4)
      val pos = qt.select(col("qid")).distinct()
        .select(col("qid"), col("qid").as("doc_id"))
      Retrieval.hardNegatives(d, qt, pos, kNeg = 5, overfetch = 3)
        .orderBy(col("qid"), col("rank"))
    }),

    // Hybrid retrieval: exact-cosine top-20 for doc 0's embedding and
    // BM25 top-20 for doc 0's seed terms, fused by reciprocal rank
    // (1/(60+rank), Cormack 2009). Rank-only fusion makes the hybrid
    // MORE oracle-stable than either score space: only the orderings
    // cross the engine boundary.
    "ann_hybrid_rrf" -> ((s, dir) => {
      Graft.init(s)
      val e = Tables.load(s, dir, "embeddings")
      val d = Tables.load(s, dir, "documents")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val vec = Knn.topK(e, q, k = 20)
        .select(col("vec_id").as("doc_id"), col("simil").as("score"))
      val terms = Retrieval.seedTerms(d, "doc_id", "text", seedId = 0L, n = 4)
      val bm = Retrieval.bm25TopK(d, terms, k = 20)
      Retrieval.rrfFuse(Seq(("vec", vec), ("bm25", bm)), k = 10)
        .orderBy(col("rrf").desc, col("doc_id"))
    }),

    // Build-once / serve-many: the BM25 inverted index is BUILT, SAVED
    // term-range-clustered, LOADED back, and searched — the full
    // persistence round trip (the rcmn_top5_built_index convention,
    // lexical edition). Scores ≡ the ad-hoc path by construction, so
    // the tx_bm25_topk oracle gates the whole trip.
    "tx_bm25_built_index" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val terms = Retrieval.seedTerms(d, "doc_id", "text", seedId = 0L, n = 4)
      val tmp = graft.Graft.scratchDir("graft_bm25_ix")
      try {
        Retrieval.saveBm25Index(Retrieval.buildBm25Index(d), tmp)
        Retrieval.bm25IndexTopK(Retrieval.loadBm25Index(s, tmp), terms,
            k = 10)
          .select(col("doc_id"), col("score"))
          .orderBy(col("score").desc, col("doc_id"))
          // the index files are deleted on return — pin the result first
          .localCheckpoint(true)
      } finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // Index DELETION (r15 missing #1): the full-corpus index with the
    // doc_id % 7 == 3 documents tombstoned out — the GDPR-delete /
    // recrawled-page path. The subtle half is statistical: deleted docs
    // must leave df/N/avgdl too, or every surviving score drifts; both
    // index relations are viewed through the tombstones and the stats
    // DERIVE from those views, so the oracle is simply the bm25
    // re-derivation over the survivor corpus — delete-then-search ≡
    // rebuild, gated by hash.
    "tx_bm25_delete_topk" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val terms = Retrieval.seedTerms(d, "doc_id", "text", seedId = 0L, n = 4)
      val ix = Retrieval.deleteFromBm25Index(
        Retrieval.buildBm25Index(d),
        d.filter(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
      Retrieval.bm25IndexTopK(ix, terms, k = 10)
        .select(col("doc_id"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // Ingestion append: index built on the EVEN docs, the odd half
    // APPENDED (tokenize work ∝ batch, corpus postings never rebuilt —
    // the appendIvf contract) — then searched. Union stats ≡ full-corpus
    // stats, so the tx_bm25_topk oracle gates the append path too.
    "tx_bm25_append" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val terms = Retrieval.seedTerms(d, "doc_id", "text", seedId = 0L, n = 4)
      val ix = Retrieval.appendBm25Index(
        Retrieval.buildBm25Index(d.filter(pmod(col("doc_id"), lit(2)) === 0)),
        d.filter(pmod(col("doc_id"), lit(2)) === 1))
      Retrieval.bm25IndexTopK(ix, terms, k = 10)
        .select(col("doc_id"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // Streaming TOP-K retrieval — the 5th streaming state kind under the
    // gate and the first with ARBITRARY keyed state (mapGroupsWithState
    // bounded heap; the others ride built-in agg/dedup/join/session
    // state): the corpus streams in 4 micro-batches, each vector is
    // cosine-scored inline against 3 broadcast queries, and a ≤k-row
    // per-query heap folds across batches. Final state ≡ the batch
    // exact top-k (top-k under a total order is assoc+comm), which the
    // oracle re-derives; n_seen pins that all rows passed the fold.
    "stream_topk" -> ((s, dir) => {
      Graft.init(s)
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") < 3).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      val tmp = graft.Graft.scratchDir("graft_stream_topk")
      e.repartitionByRange(4, col("vec_id"))
        .write.mode("overwrite").parquet(tmp)
      try graft.streaming.EventStream
        .streamTopKExact(s, tmp, e.schema, qs, k = 10)
        .select(col("qid"), col("n_seen"), col("vec_id"),
          round(col("simil"), 4).as("simil"))
        .orderBy(col("qid"), col("simil").desc, col("vec_id"))
      finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // MMR diversified reranking (Carbonell 1998): exact-cosine top-20
    // candidates, then 5 greedy picks trading relevance against
    // redundancy (λ=0.75). The k steps are bounded 20-row plans; the
    // whole greedy trajectory — pairwise sims, per-step penalties,
    // every argmax — is re-derived by the oracle's 5 unrolled step
    // CTEs (the BPE-rounds convention), so one divergent pick anywhere
    // breaks the hash.
    "ann_mmr_rerank" -> ((s, dir) => {
      Graft.init(s)
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val cands = Knn.topK(e, q, k = 20)
        .select(col("vec_id"), round(col("simil"), 4).as("rel"))
        .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      Retrieval.mmrRerank(cands, k = 5, lam = 0.75, idCol = "vec_id",
          relCol = "rel", vecCol = "embedding")
        .orderBy(col("rank"))
    }),

    // BATCH hybrid retrieval: 3 queries' vector top-20s (one corpus
    // scan via topKPerQuery) and 3 BM25 top-20s (one corpus pass via
    // bm25BatchTopK) fused per query in ONE plan — ranks windowed per
    // (list, qid), fused sums reduced through the partial-aggregable
    // grouped top-k. The batch-family completion of ann_hybrid_rrf.
    "ann_hybrid_batch_rrf" -> ((s, dir) => {
      Graft.init(s)
      val e = Tables.load(s, dir, "embeddings")
      val d = Tables.load(s, dir, "documents")
      val qs = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val vec = Knn.topKPerQuery(e, qs, k = 20)
        .select(col("qid"), col("vec_id").as("doc_id"),
          col("simil").as("score"))
      val bm = Retrieval.bm25BatchTopK(d,
        Retrieval.seedTermsBatch(d, "doc_id", "text",
          seedIds = Seq(0L, 1L, 2L), n = 4), k = 20)
      Retrieval.rrfFuseBatch(Seq(("vec", vec), ("bm25", bm)), k = 10)
        .orderBy(col("qid"), col("rrf").desc, col("doc_id"))
    }),

    // Retrieve-then-rerank: BM25 generates 20 candidates, the (stub)
    // model scorer — tx_model_score's deterministic hashed linear model,
    // standing in for a cross-encoder — scores ONLY the candidate set
    // (left-semi prune before the scorer: the expensive stage touches
    // k·overfetch docs, never the corpus), final order by model score.
    "tx_retrieve_rerank" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val terms = Retrieval.seedTerms(d, "doc_id", "text", seedId = 0L, n = 4)
      val cands = Retrieval.bm25TopK(d, terms, k = 20)
      val ms = TextAnalysis.modelScore(
        d.join(broadcast(cands.select(col("doc_id"))), Seq("doc_id"),
          "left_semi"),
        "doc_id", "text", dim = 1024)
      cands.join(broadcast(ms), Seq("doc_id"))
        .select(col("doc_id"), col("score").as("bm25"), col("model_score"))
        .orderBy(col("model_score").desc, col("doc_id"))
        .limit(10)
    }),

    // Chunked passage retrieval (the RAG split): documents become
    // overlapping 30-token/stride-20 chunks (pure column math, bounded
    // explode), BM25 scores the CHUNK corpus for doc 0's seed terms,
    // and per-document evidence is the best chunk score — passage-level
    // precision with document-level results. The un-truncated chunk
    // score relation is bounded by the query terms' postings, never the
    // corpus.
    "tx_chunk_retrieve" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val terms = Retrieval.seedTerms(d, "doc_id", "text", seedId = 0L, n = 4)
      val ch = Retrieval.chunkDocs(d, "doc_id", "text",
        chunkTokens = 30, stride = 20)
      Retrieval.bm25Scores(ch.select(col("chunk_id"), col("text")), terms,
          idCol = "chunk_id")
        .withColumn("doc_id", floor(col("chunk_id") / 1000).cast("long"))
        .groupBy(col("doc_id")).agg(max(col("score")).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(10)
    })
  )

  /** The BM25 pipeline as DuckDB CTEs ending in `bm25(qid, doc_id,
    * score)` — callers define `qt(qid, term)` first. Query terms,
    * document lengths, corpus stats, per-(doc, term) tf, per-term df,
    * and the decimal-summed score are each re-derived; the arithmetic
    * is written in the exact association order of the Spark column
    * expressions so the doubles match bitwise before the decimal
    * cast. */
  private def bm25Ctes(rel: String = "documents",
      id: String = "doc_id"): String =
    raw"""dl AS (
       |  SELECT $id, len(string_split_regex(trim(text), '\s+')) AS dl
       |  FROM $rel),
       |stats AS (
       |  SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl
       |  FROM dl),
       |uq AS (SELECT DISTINCT term FROM qt),
       |tf AS (
       |  SELECT $id, term, count(*) AS tf
       |  FROM (SELECT $id,
       |          unnest(string_split_regex(trim(text), '\s+')) AS term
       |        FROM $rel) t
       |  JOIN uq USING (term)
       |  GROUP BY $id, term),
       |dfreq AS (SELECT term, count(DISTINCT $id) AS df FROM tf GROUP BY term),
       |contrib AS (
       |  SELECT qt.qid, tf.$id,
       |    ln(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS c
       |  FROM tf JOIN dfreq USING (term) JOIN dl USING ($id)
       |  CROSS JOIN stats s
       |  JOIN qt ON qt.term = tf.term),
       |bm25 AS (
       |  SELECT qid, $id,
       |    CAST(round(sum(CAST(c AS DECIMAL(28,12))), 4) AS DOUBLE) AS score
       |  FROM contrib GROUP BY qid, $id)""".stripMargin

  /** Per-seed `qt(qid, term)` for seeds 0..2: first-appearance-distinct
    * top-4 tokens per seed, rank window partitioned by seed (the
    * seedTermsBatch twin). */
  private def batchQtCte: String =
    raw"""qt AS (
       |  SELECT qid, term FROM (
       |    SELECT qid, term, row_number() OVER (PARTITION BY qid
       |      ORDER BY first_pos, term) AS rn
       |    FROM (
       |      SELECT doc_id AS qid, term, min(pos) AS first_pos FROM (
       |        SELECT doc_id, unnest(toks) AS term,
       |          unnest(range(1, len(toks) + 1)) AS pos
       |        FROM (SELECT doc_id,
       |                string_split_regex(trim(text), '\s+') AS toks
       |              FROM documents WHERE doc_id < 3))
       |      GROUP BY doc_id, term))
       |  WHERE rn <= 4)""".stripMargin

  /** The 30-token/stride-20 chunk relation as a CTE — `chunks(doc_id,
    * chunk_id, text)`, the chunkDocs arithmetic re-derived: chunk count
    * `1 + ceil((n−30)/20)` (1 when n ≤ 30), chunk i = tokens
    * [i·20+1, i·20+30] (DuckDB `list_slice` is inclusive-1-based and
    * clamps, ≡ Spark `slice(arr, start, 30)`). */
  private def chunksCte: String =
    raw"""chunks AS (
       |  SELECT doc_id, doc_id * 1000 + ci AS chunk_id,
       |    array_to_string(list_slice(toks, ci * 20 + 1, ci * 20 + 30),
       |      ' ') AS text
       |  FROM (
       |    SELECT doc_id, toks,
       |      unnest(range(0, CASE WHEN n <= 30 THEN 1
       |        ELSE 1 + CAST(floor((n - 30 + 19) / 20.0) AS BIGINT) END))
       |        AS ci
       |    FROM (SELECT doc_id,
       |            string_split_regex(trim(text), '\s+') AS toks,
       |            len(string_split_regex(trim(text), '\s+')) AS n
       |          FROM documents)))""".stripMargin

  /** Single-seed `qt` (constant qid 0): the first-appearance-distinct
    * top-4 tokens of document 0. */
  private def seedQtCte: String =
    raw"""qt AS (
       |  SELECT CAST(0 AS BIGINT) AS qid, term FROM (
       |    SELECT unnest(toks) AS term, unnest(range(1, len(toks) + 1)) AS pos
       |    FROM (SELECT string_split_regex(trim(text), '\s+') AS toks
       |          FROM documents WHERE doc_id = 0))
       |  GROUP BY term ORDER BY min(pos), term LIMIT 4)""".stripMargin

  /** MMR greedy steps 2..k as unrolled CTEs (the BPE-rounds convention):
    * step t's penalty is max sim to the union of picks 1..t−1, its
    * candidate pool excludes them, and its argmax is decimal-path
    * rounded — literals 0.75/0.25 are binary-exact doubles in both
    * engines. */
  private def mmrStepCtes(k: Int): String =
    (2 to k).map { t =>
      val selUnion = (1 until t).map(i => s"SELECT vec_id FROM s$i")
        .mkString(" UNION ALL ")
      s"""s$t AS (
         |  SELECT vec_id, mmr, $t AS rank FROM (
         |    SELECT c.vec_id,
         |      round(CAST(0.75 * c.rel - 0.25 * COALESCE(p.pen, 0.0)
         |        AS DECIMAL(28,12)), 4)::DOUBLE AS mmr
         |    FROM cands c LEFT JOIN (
         |      SELECT ia AS vec_id, max(sim) AS pen FROM sims
         |      WHERE ib IN ($selUnion) GROUP BY ia) p USING (vec_id)
         |    WHERE c.vec_id NOT IN ($selUnion))
         |  ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")

  override def oracle: Map[String, String] = Map(
    // Identical scores to the ad-hoc path by construction: the same
    // tx_bm25_topk re-derivation gates the save/load round trip…
    "tx_bm25_built_index" ->
      s"""WITH $seedQtCte,
         |${bm25Ctes()}
         |SELECT doc_id, score FROM bm25
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // Deletion: seed terms from the FULL corpus (the query is fixed;
    // doc 0 survives 0 % 7), scores re-derived over the SURVIVOR corpus
    // only — tombstoned docs gone from results AND from df/N/avgdl.
    "tx_bm25_delete_topk" ->
      s"""WITH $seedQtCte,
         |docs_live AS (SELECT * FROM documents WHERE doc_id % 7 <> 3),
         |${bm25Ctes("docs_live")}
         |SELECT doc_id, score FROM bm25
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // …and the even-build + odd-append composition (union stats ≡
    // full-corpus stats).
    "tx_bm25_append" ->
      s"""WITH $seedQtCte,
         |${bm25Ctes()}
         |SELECT doc_id, score FROM bm25
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // The streaming fold's fixed point: per-query exact top-10 over the
    // whole corpus, plus the total row count every fold step summed to.
    "stream_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
        |  FROM embeddings WHERE vec_id < 3),
        |n AS (SELECT count(*) AS n_seen FROM embeddings),
        |topk AS (
        |  SELECT q.qid, e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS s,
        |    row_number() OVER (PARTITION BY q.qid
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qvec)
        |        DESC, e.vec_id) AS rn
        |  FROM embeddings e CROSS JOIN q)
        |SELECT qid, n.n_seen, vec_id, round(s, 4) AS simil
        |FROM topk CROSS JOIN n
        |WHERE rn <= 10 ORDER BY qid, simil DESC, vec_id""".stripMargin,

    "ann_mmr_rerank" ->
      (s"""WITH q AS (
         |  SELECT embedding::DOUBLE[] AS qvec FROM embeddings
         |  WHERE vec_id = 0),
         |cands AS (
         |  SELECT vec_id, round(s, 4) AS rel, embedding FROM (
         |    SELECT e.vec_id, e.embedding,
         |      list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS s
         |    FROM embeddings e CROSS JOIN q
         |    ORDER BY s DESC, e.vec_id LIMIT 20)),
         |sims AS (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    round(list_cosine_similarity(a.embedding::DOUBLE[],
         |      b.embedding::DOUBLE[]), 4) AS sim
         |  FROM cands a JOIN cands b ON a.vec_id <> b.vec_id),
         |s1 AS (
         |  SELECT vec_id, mmr, 1 AS rank FROM (
         |    SELECT vec_id,
         |      round(CAST(0.75 * rel - 0.25 * 0.0 AS DECIMAL(28,12)), 4)::DOUBLE
         |        AS mmr
         |    FROM cands)
         |  ORDER BY mmr DESC, vec_id LIMIT 1),
         |""".stripMargin + mmrStepCtes(5) + """
        |SELECT rank, vec_id, mmr FROM (
        |  SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |  UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
        |  UNION ALL SELECT * FROM s5)
        |ORDER BY rank""".stripMargin),
    "tx_bm25_topk" ->
      s"""WITH $seedQtCte,
         |${bm25Ctes()}
         |SELECT doc_id, score FROM bm25
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // The chunk arithmetic + the bm25 pipeline RETARGETED at the chunk
    // relation (same CTEs, chunk_id for doc_id) + the per-document
    // best-chunk reduction.
    "tx_chunk_retrieve" ->
      s"""WITH $seedQtCte,
         |$chunksCte,
         |${bm25Ctes("chunks", "chunk_id")}
         |SELECT CAST(floor(chunk_id / 1000) AS BIGINT) AS doc_id,
         |  max(score) AS score
         |FROM bm25 GROUP BY 1
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // Batch form: per-seed qt via a seed-partitioned rank window, then
    // a per-qid top-10 window over the shared bm25 relation.
    "tx_bm25_batch_topk" ->
      (s"""WITH $batchQtCte,
         |""".stripMargin + bm25Ctes() +
      """
        |SELECT qid, doc_id, score FROM (
        |  SELECT qid, doc_id, score, row_number() OVER (PARTITION BY qid
        |    ORDER BY score DESC, doc_id) AS rn
        |  FROM bm25)
        |WHERE rn <= 10 ORDER BY qid, score DESC, doc_id""".stripMargin),

    // Top-8 BM25 candidates per qid, the self-positive removed, re-ranked
    // to the 5 negatives — the same decimal-summed bm25 CTEs.
    "tx_hard_negatives" ->
      (s"""WITH $batchQtCte,
         |""".stripMargin + bm25Ctes() +
      """,
        |cand AS (
        |  SELECT qid, doc_id, score FROM (
        |    SELECT qid, doc_id, score, row_number() OVER (PARTITION BY qid
        |      ORDER BY score DESC, doc_id) AS rn
        |    FROM bm25)
        |  WHERE rn <= 8),
        |negs AS (
        |  SELECT qid, doc_id AS neg_id, score,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |  FROM cand WHERE doc_id <> qid)
        |SELECT qid, neg_id, rank, score FROM negs
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),

    // Batch hybrid: per-qid BM25 and vector rankings (both limit-20 per
    // query) re-derived, decimal-summed 1/(60+rank) fusion, per-qid
    // top-10.
    "ann_hybrid_batch_rrf" ->
      (s"""WITH $batchQtCte,
         |""".stripMargin + bm25Ctes() +
      """,
        |bmr AS (
        |  SELECT qid, doc_id, rn AS rank FROM (
        |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
        |      ORDER BY score DESC, doc_id) AS rn
        |    FROM bm25)
        |  WHERE rn <= 20),
        |qv AS (
        |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
        |  FROM embeddings WHERE vec_id < 3),
        |vecr AS (
        |  SELECT qid, vec_id AS doc_id, rn AS rank FROM (
        |    SELECT qv.qid, e.vec_id, row_number() OVER (PARTITION BY qv.qid
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qv.qvec)
        |        DESC, e.vec_id) AS rn
        |    FROM embeddings e CROSS JOIN qv)
        |  WHERE rn <= 20),
        |uni AS (
        |  SELECT qid, doc_id, rank FROM vecr
        |  UNION ALL SELECT qid, doc_id, rank FROM bmr),
        |fused AS (
        |  SELECT qid, doc_id,
        |    CAST(round(sum(CAST(1.0 / (60 + rank) AS DECIMAL(28,12))), 6)
        |      AS DOUBLE) AS rrf
        |  FROM uni GROUP BY qid, doc_id)
        |SELECT qid, doc_id, rrf FROM (
        |  SELECT qid, doc_id, rrf, row_number() OVER (PARTITION BY qid
        |    ORDER BY rrf DESC, doc_id) AS rn
        |  FROM fused)
        |WHERE rn <= 10 ORDER BY qid, rrf DESC, doc_id""".stripMargin),

    // Both rankings re-derived (BM25 ranks over the rounded scores with
    // doc_id ties, vector ranks over the exact cosine ordering), then
    // the decimal-summed 1/(60+rank) fusion.
    "ann_hybrid_rrf" ->
      s"""WITH $seedQtCte,
         |${bm25Ctes()},
         |bmr AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
         |    AS rank
         |  FROM (SELECT doc_id, score FROM bm25
         |        ORDER BY score DESC, doc_id LIMIT 20)),
         |qv AS (
         |  SELECT embedding::DOUBLE[] AS qvec FROM embeddings
         |  WHERE vec_id = 0),
         |vecr AS (
         |  SELECT vec_id AS doc_id, rn AS rank FROM (
         |    SELECT e.vec_id, row_number() OVER (
         |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qv.qvec)
         |        DESC, e.vec_id) AS rn
         |    FROM embeddings e CROSS JOIN qv)
         |  WHERE rn <= 20),
         |uni AS (
         |  SELECT doc_id, rank FROM vecr
         |  UNION ALL SELECT doc_id, rank FROM bmr),
         |fused AS (
         |  SELECT doc_id,
         |    CAST(round(sum(CAST(1.0 / (60 + rank) AS DECIMAL(28,12))), 6)
         |      AS DOUBLE) AS rrf
         |  FROM uni GROUP BY doc_id)
         |SELECT doc_id, rrf FROM fused
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    // BM25 candidates + the tx_model_score arithmetic restricted to the
    // candidate set, final order by model score.
    "tx_retrieve_rerank" ->
      s"""WITH $seedQtCte,
         |${bm25Ctes()},
         |cands AS (
         |  SELECT doc_id, score FROM bm25
         |  ORDER BY score DESC, doc_id LIMIT 20),
         |t AS (
         |  SELECT d.doc_id, string_split_regex(trim(d.text), '\\s+') AS toks
         |  FROM documents d JOIN cands USING (doc_id)),
         |ms AS (
         |  SELECT doc_id,
         |    round(CAST(
         |      list_reduce(list_prepend(0::BIGINT, list_transform(toks,
         |        t -> (((('0x' || substr(md5(t), 1, 15))::BIGINT % 1024)
         |               * 37 + 11) % 201 - 100)::BIGINT)),
         |        (a, x) -> a + x)::DOUBLE / (100.0 * len(toks))
         |      AS DECIMAL(28,12)), 4)::DOUBLE AS model_score
         |  FROM t)
         |SELECT c.doc_id, c.score AS bm25, ms.model_score
         |FROM cands c JOIN ms USING (doc_id)
         |ORDER BY model_score DESC, doc_id LIMIT 10""".stripMargin
  )
}
