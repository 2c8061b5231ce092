package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Graft, IndexBuild, StubLlm, Tables, Embeddings}
import graft.operators._

/** Reference-pipeline queries: polarity subtraction (SET3), sweep-line
  * interval consensus (W2/W3), and the full E1 campaign-recommendation →
  * audience-count pipeline — each with a DuckDB oracle where expressible.
  * Index-build and stub-LLM variants (xxhash64 embeddings are not
  * reproducible in DuckDB) carry rows-only checks. */
object PipelinePack extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** rcmn_audience_sketch's sketch parameters: bottom-k size (k=16384
    * exceeds every customer count at oracle SFs → exhaustive regime)
    * and the price-band width of the pre-computable interval artifact. */
  private val AudK = 16384
  private val AudBandW = 50000L

  /** Process-lifetime audience-sketch artifact cache: per-segment and
    * per-price-band KMV sketches of customer ids, each built in two
    * independent batches and merged (merge ≡ rebuild exactly — the
    * incremental-maintenance face, q62's convention), written once per
    * (process, sf dir), served many times. Pay-once like
    * [[MaintenancePack.bucketedLayouts]]; the artifact BUILD path is
    * benched by q62_kmv_persisted. Returns the artifact directory
    * (holding `seg/` and `band/`). */
  private[graft] val audienceSketchDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def audienceSketchArtifacts(s: SparkSession,
      dir: String): String =
    audienceSketchDirs.computeIfAbsent(dir, _ => {
      // failure-atomic (r14 advice): if the seg write succeeds and the
      // band write throws, computeIfAbsent caches nothing, so the next
      // call would build a FRESH dir while the half-written RAM-backed
      // one leaks — delete the scratch dir before rethrowing so a
      // failed attempt leaves no tmpfs residue
      val tmp = graft.Graft.scratchDir("graft_aud_sketch_ix")
      try buildAudienceSketch(s, dir, tmp)
      catch { case e: Throwable =>
        graft.Graft.dropScratch(tmp); throw e }
      tmp
    })

  private def buildAudienceSketch(s: SparkSession, dir: String,
      tmp: String): Unit = {
      val cust = t(s, dir, "customer")
        .select(col("c_mktsegment").as("seg"),
          col("c_custkey").as("cust_id"))
      val ord = t(s, dir, "orders")
        .select(floor(col("o_totalprice") / lit(AudBandW.toDouble))
            .cast("long").as("band"),
          col("o_custkey").as("cust_id"), col("o_orderkey"))
      def segSk(p: DataFrame) =
        Sketches.kmvSketch(p, Seq("seg"), "cust_id", AudK)
      Sketches.mergeKmvSketches(
          segSk(cust.filter(pmod(col("cust_id"), lit(2)) === 0)),
          segSk(cust.filter(pmod(col("cust_id"), lit(2)) === 1)),
          Seq("seg"), "sk_cust_id", AudK)
        .write.parquet(s"$tmp/seg")
      def bandSk(p: DataFrame) =
        Sketches.kmvSketch(p, Seq("band"), "cust_id", AudK)
      Sketches.mergeKmvSketches(
          bandSk(ord.filter(pmod(col("o_orderkey"), lit(2)) === 0)),
          bandSk(ord.filter(pmod(col("o_orderkey"), lit(2)) === 1)),
          Seq("band"), "sk_cust_id", AudK)
        .write.parquet(s"$tmp/band")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SET3: positive codes minus negated codes per attribute
    // (/root/reference/nl_targeting.py:112-123) on relational data.
    "q19_polarity_subtract" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      val pos = joined.filter(col("o_totalprice") > 200000)
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(array_sort(collect_set(col("o_orderpriority"))).as("pos_codes"))
      val neg = joined.filter(col("o_totalprice") > 450000)
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(array_sort(collect_set(col("o_orderpriority"))).as("neg_codes"))
      pos.join(neg, Seq("seg"), "left_outer")
        .select(col("seg"),
          concat_ws(",", array_sort(array_except(col("pos_codes"),
            coalesce(col("neg_codes"), array())))).as("codes"),
          size(array_except(col("pos_codes"),
            coalesce(col("neg_codes"), array()))).as("n_codes"))
        .filter(col("n_codes") > 0)
        .orderBy(col("seg"))
    }),

    // W2: sweep-line interval-overlap consensus on an integer axis
    // (/root/reference/camp_vec_rcmn.py:143-160). Intervals = per
    // (priority, status) price ranges, weight = row count (exact longs).
    "q20_sweepline_consensus" -> ((s, dir) => {
      val conds = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("name"), col("o_orderstatus"))
        .agg(floor(min(col("o_totalprice"))).cast("long").as("lo"),
          ceil(max(col("o_totalprice"))).cast("long").as("hi"),
          count(lit(1)).as("w"))
        .select(col("name"), col("lo"), col("hi"), col("w"))
      SweepLine.consensus(conds).orderBy(col("name"), col("lo"))
    }),

    // W3: threshold + adjacent-boundary nudge + sentinel rendering
    // (/root/reference/camp_vec_rcmn.py:169-212). One-sided conditions are
    // widened to the integer sentinel domain [0, 9999999999]
    // (camp_vec_rcmn.py:113-119) so the '<hi' / '>lo' forms appear.
    "q21_interval_render" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val twoSided = o
        .groupBy(col("o_orderpriority").as("name"), col("o_orderstatus"))
        .agg(floor(min(col("o_totalprice"))).cast("long").as("lo"),
          ceil(max(col("o_totalprice"))).cast("long").as("hi"),
          count(lit(1)).as("w"))
        .select(col("name"), col("lo"), col("hi"), col("w"))
      val oneSided = o.groupBy(col("o_orderpriority").as("name"))
        .agg(floor(avg(col("o_totalprice"))).cast("long").as("mid"))
        .select(col("name"), lit(0L).as("lo"), col("mid").as("hi"), lit(500L).as("w"))
        .union(o.groupBy(col("o_orderpriority").as("name"))
          .agg(floor(avg(col("o_totalprice"))).cast("long").as("mid"))
          .select(col("name"), col("mid"), lit(9999999999L), lit(500L)))
      val cons = SweepLine.consensus(twoSided.union(oneSided))
      SweepLine.renderKept(cons, threshold = 1500.0,
          domainMin = 0L, domainMax = 9999999999L)
        .orderBy(col("name"), col("rendered"), col("score"))
    }),

    // E1 end-to-end: expansions → KNN → fusion → top-5 → conditions →
    // mean+0.5σ threshold → string + interval consensus → audience count
    // (/root/reference/camp_vec_rcmn.py, whole file). One row out.
    "q22_recommend_audience" -> ((s, dir) => {
      Graft.init(s)
      CampaignRecommend.audienceCount(s, dir)
    }),

    // E1 AT SKETCH SCALE (r13 missing #2): the flagship audience served
    // FROM persisted KMV sketches — the 100 TB serving shape where the
    // segment sketches are maintained incrementally (built here in two
    // batches and merged, the q62 convention, then WRITTEN and read
    // back) and the audience is a query-time merge of sketch rows, not
    // a corpus scan. The recommend front half (top-5 → conditions →
    // mean+0.5σ threshold → string + interval consensus) runs verbatim;
    // the tail swaps q22's countDistinct-over-members for: semi-join
    // the kept segments/bands against the sketch relations (sketch-
    // sized), fold the selected sketches (union-then-truncate), read
    // off one estimate. The interval side serves from per-price-BAND
    // sketches (width 50 000 — the discretization a pre-computable
    // artifact needs; a band serves when it intersects a kept
    // interval), so the served quantity is the band-resolution
    // audience, which the oracle re-derives exactly. k = 16384 exceeds
    // every customer count at oracle SFs, so the estimate is in the
    // exhaustive regime and HASH-MATCHES the exact distinct count.
    // The sketch artifacts are built ONCE per (process, sf dir) — the
    // maintain-incrementally/serve-cheap contract they exist for (the
    // q41_bucket_join treatment; sketch-artifact BUILD cost is benched
    // by q62_kmv_persisted) — so the timed number is the serve path:
    // recommend front half + sketch-row semi-joins + one fold.
    "rcmn_audience_sketch" -> ((s, dir) => {
      val artifacts = audienceSketchArtifacts(s, dir)
      // recommend front half — identical to q22 up to the kept sets
      val t5 = CampaignRecommend.top5(s, dir).cache()
      val (strConds, intConds) =
        Conditions.synthesize(t5, CampaignRecommend.segments(s, dir))
      val thr = Conditions.threshold(t5)
      val keptSegs = Conditions.stringConsensus(strConds, thr)
        .select(col("value"))
      val keptInts = SweepLine.consensus(
          intConds.select(col("name"), col("lo"), col("hi"), col("w")))
        .crossJoin(broadcast(thr))
        .filter(col("score") >= col("thr"))
        .select(col("lo"), col("hi"))
      // serve: pick sketch rows (bounded), fold, estimate — the
      // customer/orders tables are never touched at query time
      val segPick = s.read.parquet(s"$artifacts/seg")
        .join(broadcast(keptSegs), col("seg") === col("value"),
          "left_semi")
        .select(col("sk_cust_id"))
      val bandPick = s.read.parquet(s"$artifacts/band")
        .join(broadcast(keptInts),
          col("band") * lit(AudBandW) < col("hi") &&
            (col("band") + 1) * lit(AudBandW) > col("lo"), "left_semi")
        .select(col("sk_cust_id"))
      val served = Sketches.mergeAllKmv(segPick.unionByName(bandPick),
          "sk_cust_id", AudK)
        .select(round(Sketches.kmvDistinctEstimate(col("sk_cust_id"), AudK))
          .cast("long").as("audience"))
      // materialize the one-row answer eagerly so t5's cache can be
      // released HERE (r14 advice) — otherwise the pin outlives the
      // query until the caller's teardown; the collect is a single
      // bounded row, not row data
      val row = served.collect().toSeq
      t5.unpersist(blocking = false)
      s.createDataFrame(s.sparkContext.parallelize(row, 1), served.schema)
    }),

    // ---- index-build / stub-LLM path. The stub embedder is md5-derived
    // (Embeddings.embedCol), so even the vector math has a DuckDB twin. ----

    // E3 campaign index build: 5-way join → '[AI]%' filter → F6 sentence →
    // distributed stub embedding (/root/reference/camp_vec_save.py).
    "ix_campaign_index" -> ((s, dir) => {
      IndexBuild.campaignIndex(s, dir)
        .select(col("camp_id"), col("camp_sentence"),
          size(col("camp_vec")).as("vec_dim"))
        .orderBy(col("camp_id"))
    }),

    // E3 condition index build (/root/reference/nl_targeting_save.py):
    // 3 paraphrase rows per condition code.
    "ix_condition_index" -> ((s, dir) => {
      IndexBuild.conditionIndex(s, dir)
        .select(col("cond_id"), col("cond_nm"), col("code_nm"),
          col("cond_desc"), size(col("cond_vec")).as("vec_dim"))
        .orderBy(col("cond_id"))
    }),

    // E2: NL triples → condition search (coded + L2 value routes) →
    // polarity subtraction (/root/reference/nl_targeting.py). Triples are
    // literal rows (the LLM-extraction boundary); 부정 BUILDING must vanish
    // from 긍정 codes; the free-text amounts/dates normalize to operator
    // forms; the date-looking amount ('19950101' on 구매금액) scrubs to
    // nothing (P8).
    "nl_target_codes" -> ((s, dir) => {
      val triples = s.createDataFrame(Seq(
        ("세그먼트", "긍정", "BUILDING"),
        ("세그먼트", "긍정", "MACHINERY"),
        ("세그먼트", "부정", "BUILDING"),
        ("우선순위", "긍정", "1-URGENT"),
        ("구매금액", "긍정", "100만원 이상"),
        ("구매금액", "긍정", "19950101"),
        ("주문일자", "긍정", "19950101 ~ 19961231"),
        ("주문일자", "부정", "19970615 이후")
      )).toDF("attr", "polarity", "value")
      Graft.init(s)
      NlTargeting.targetCodes(triples, IndexBuild.conditionIndex(s, dir), floor = 0.99)
        .select(col("attr"), col("polarity"),
          concat_ws(",", col("codes")).as("codes"))
        .orderBy(col("attr"), col("polarity"))
    }),

    // E3 condition index composed the reference's way: 4-way metadata join
    // (inner prompt, left dimension, left latest-ML_SEQ hierarchy) + F15
    // operator scan + catalog table resolution + stored-SQL code
    // resolution + paraphrase/embed tail, as ONE flow
    // (/root/reference/nl_targeting_save.py:11-104).
    "ix_condition_meta" -> ((s, dir) => {
      IndexBuild.conditionIndexFromMeta(s, dir, IndexBuild.metaFixture(s))
        .select(col("cond_id"), col("cond_nm"), col("code"), col("code_nm"),
          col("cond_type"), col("column_nm"), col("table_nm"), col("cond_desc"),
          size(col("cond_vec")).as("vec_dim"))
        .orderBy(col("cond_id"))
    }),

    // E2 FRONT DOOR: raw Korean request → L1 triple extraction (stub chat
    // call, /root/reference/nl_targeting.py:8-46) → bracket-contract parse
    // → condition search → polarity subtraction. The whole reference
    // pipeline from the user's first input in one flow.
    "nl_target_from_text" -> ((s, dir) => {
      Graft.init(s)
      val raw = new StubLlm().complete(NlTargeting.L1Prompt, Request)
      val triples = NlTargeting.parseTriples(
        s.createDataFrame(Seq(Tuple1(raw))).toDF("llm_out"), "llm_out")
      NlTargeting.targetCodes(triples, IndexBuild.conditionIndex(s, dir),
          floor = 0.99)
        .select(col("attr"), col("polarity"),
          concat_ws(",", col("codes")).as("codes"))
        .orderBy(col("attr"), col("polarity"))
    }),

    // E1 front half on the BUILT index with stub-LLM query expansion
    // (L5 grammar, /root/reference/camp_vec_rcmn.py:11-38). The index
    // is built, WRITTEN, and read back before searching — the full
    // persistence round trip (tx_bm25_built_index convention; the
    // reference stores camp_summary_vec and reads it at recommend
    // time, camp_vec_save.py:66-68 / camp_vec_rcmn.py:44). Besides
    // being the honest serve shape, the write is the materialization
    // barrier that keeps the embed pass SINGLE: composed lazily, the
    // optimizer defers the camp_vec projection past the 5-query cross
    // join and re-embeds every sentence once per expansion (measured
    // 5x the embed cost at sf0.1).
    "rcmn_top5_built_index" -> ((s, dir) => {
      Graft.init(s)
      val expansions = new StubLlm()
        .complete("expand", "봄 시즌 VIP 고객 대상 캠페인").split("!!!!")
      val qs = s.createDataFrame(expansions.toSeq.zipWithIndex.map {
          case (q, i) => (i.toLong, q)
        }).toDF("qid", "qtext")
        .select(col("qid"), Embeddings.embedCol(col("qtext")).as("qvec"))
      val tmp = graft.Graft.scratchDir("graft_camp_ix")
      try {
        IndexBuild.campaignIndex(s, dir)
          .select(col("camp_id").as("vec_id"),
            col("camp_vec").as("embedding"))
          .write.parquet(s"$tmp/ix")
        Knn.fuse(
            Knn.topKPerQuery(s.read.parquet(s"$tmp/ix"), qs,
              CampaignRecommend.K),
            CampaignRecommend.NQueries, CampaignRecommend.TopN)
          // the index files are deleted on return — pin the result
          .localCheckpoint(true)
      } finally graft.streaming.EventStream.deleteDir(tmp)
    })
  )

  /** The fixture NL request for the E2 front door: one coded positive, one
    * amount with a comparison particle, one coded negation, one date range. */
  private val Request: String =
    "세그먼트가 BUILDING 인 고객 중 구매금액이 100만원 넘는 사람들, " +
      "우선순위가 1-URGENT 이 아닌, 주문일자가 19950101 부터 19961231 까지 인 " +
      "고객 찾아줘"

  /** DuckDB twin of [[graft.Embeddings.embedCol]] for key column `k`. */
  private def embSql(k: String): String =
    s"""CAST(list_transform(range(0,64),
       |    i -> CAST((('0x' || substr(md5(i || ':' || $k), 1, 8))::BIGINT
       |      % 1000) / 500.0 - 1.0 AS FLOAT)) AS DOUBLE[])""".stripMargin

  /** DuckDB twin of IndexBuild.campaignTable + sentence (F6). */
  private val campSql: String =
    """offers AS (
      |  SELECT l_partkey, array_to_string(list_sort(list(DISTINCT s_name)), ',') AS offer_nm
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY l_partkey),
      |camp AS (
      |  SELECT p_partkey AS camp_id,
      |    '캠페인명은 ' || ('[AI] ' || p_name) || ' 입니다. ' ||
      |    '캠페인유형은 ' || p_brand || ' 입니다. ' ||
      |    '성공유형은 ' || p_type || ' 입니다. ' ||
      |    '오퍼명은 ' || coalesce(o.offer_nm, '없음') || ' 입니다. ' ||
      |    '예산은 ' || CAST(p_retailprice AS VARCHAR) || ' 입니다.' AS camp_sentence
      |  FROM part LEFT JOIN offers o ON p_partkey = o.l_partkey
      |  WHERE p_partkey % 2 = 0)""".stripMargin

  /** E2 oracle body downstream of a `triples(attr, polarity, value)` CTE
    * — shared by nl_target_codes (literal triple rows) and
    * nl_target_from_text (triples extracted from the raw request by the
    * L1 grammar: both front doors must land on identical code sets). */
  private def nlCodesSql(triplesCte: String): String =
    s"""WITH $triplesCte,
         |conds AS (
         |  SELECT DISTINCT '세그먼트' AS cond_nm, c_mktsegment AS code_nm, 'string' AS cond_type FROM customer
         |  UNION ALL SELECT DISTINCT '우선순위', o_orderpriority, 'string' FROM orders
         |  UNION ALL SELECT * FROM (VALUES ('구매금액','','integer'), ('주문일자','','datePopup'))),
         |keys AS (
         |  SELECT DISTINCT CASE WHEN code_nm = '' THEN cond_nm
         |                       ELSE cond_nm || ':' || code_nm END AS k FROM conds
         |  UNION SELECT attr || ':' || value FROM triples
         |  UNION SELECT attr FROM triples),
         |vecs AS (SELECT k, ${embSql("k")} AS v FROM keys),
         |coded_hits AS (
         |  SELECT t.attr, t.polarity, c.code_nm
         |  FROM conds c
         |  JOIN vecs cv ON cv.k = c.cond_nm || ':' || c.code_nm
         |  CROSS JOIN triples t
         |  JOIN vecs qv ON qv.k = t.attr || ':' || t.value
         |  WHERE c.code_nm <> '' AND list_cosine_similarity(cv.v, qv.v) >= 0.99),
         |vraw AS (
         |  SELECT t.attr, t.polarity, trim(replace(t.value, ',', '')) AS v, c.cond_type
         |  FROM conds c
         |  JOIN vecs cv ON cv.k = c.cond_nm AND c.code_nm = ''
         |  CROSS JOIN triples t
         |  JOIN vecs av ON av.k = t.attr
         |  WHERE list_cosine_similarity(cv.v, av.v) >= 0.99),
         |value_hits AS (
         |  SELECT attr, polarity,
         |    CASE WHEN cond_type = 'integer' THEN
         |      CASE WHEN regexp_matches(v, '^(19|20)[0-9]{6}$$') THEN ''
         |           WHEN regexp_extract(v, '^([0-9]+)(만)?원?\\s*(~|부터)\\s*([0-9]+)(만)?원?(\\s*까지)?$$', 1) <> ''
         |             THEN 'BETWEEN ' ||
         |               (regexp_extract(v, '^([0-9]+)(만)?원?\\s*(~|부터)\\s*([0-9]+)(만)?원?(\\s*까지)?$$', 1)::BIGINT *
         |                CASE WHEN regexp_extract(v, '^([0-9]+)(만)?원?\\s*(~|부터)\\s*([0-9]+)(만)?원?(\\s*까지)?$$', 2) = '만' THEN 10000 ELSE 1 END)::VARCHAR ||
         |               ' AND ' ||
         |               (regexp_extract(v, '^([0-9]+)(만)?원?\\s*(~|부터)\\s*([0-9]+)(만)?원?(\\s*까지)?$$', 4)::BIGINT *
         |                CASE WHEN regexp_extract(v, '^([0-9]+)(만)?원?\\s*(~|부터)\\s*([0-9]+)(만)?원?(\\s*까지)?$$', 5) = '만' THEN 10000 ELSE 1 END)::VARCHAR
         |           WHEN regexp_extract(v, '^([0-9]+)(만)?원?\\s*(이상|이하|초과|미만|넘는)?$$', 1) <> ''
         |             THEN CASE regexp_extract(v, '^([0-9]+)(만)?원?\\s*(이상|이하|초과|미만|넘는)?$$', 3)
         |                    WHEN '이상' THEN '>=' WHEN '이하' THEN '<='
         |                    WHEN '초과' THEN '>' WHEN '넘는' THEN '>'
         |                    WHEN '미만' THEN '<' ELSE '=' END ||
         |                  (regexp_extract(v, '^([0-9]+)(만)?원?\\s*(이상|이하|초과|미만|넘는)?$$', 1)::BIGINT *
         |                   CASE WHEN regexp_extract(v, '^([0-9]+)(만)?원?\\s*(이상|이하|초과|미만|넘는)?$$', 2) = '만' THEN 10000 ELSE 1 END)::VARCHAR
         |           ELSE '' END
         |    WHEN cond_type = 'datePopup' THEN
         |      CASE WHEN regexp_extract(v, '^([0-9]{8})\\s*(~|부터)\\s*([0-9]{8})(\\s*까지)?$$', 1) <> ''
         |             THEN 'BETWEEN ' || regexp_extract(v, '^([0-9]{8})\\s*(~|부터)\\s*([0-9]{8})(\\s*까지)?$$', 1) ||
         |                  ' AND ' || regexp_extract(v, '^([0-9]{8})\\s*(~|부터)\\s*([0-9]{8})(\\s*까지)?$$', 3)
         |           WHEN regexp_extract(v, '^([0-9]{8})\\s*(이후|이전)?$$', 1) <> ''
         |             THEN CASE regexp_extract(v, '^([0-9]{8})\\s*(이후|이전)?$$', 2)
         |                    WHEN '이후' THEN '>=' WHEN '이전' THEN '<=' ELSE '=' END ||
         |                  regexp_extract(v, '^([0-9]{8})\\s*(이후|이전)?$$', 1)
         |           ELSE '' END
         |    ELSE '' END AS code_nm
         |  FROM vraw),
         |all_hits AS (
         |  SELECT * FROM coded_hits
         |  UNION ALL SELECT * FROM value_hits WHERE code_nm <> ''),
         |grouped AS (
         |  SELECT attr, polarity, list_sort(list(DISTINCT code_nm)) AS codes
         |  FROM all_hits GROUP BY attr, polarity),
         |pos AS (SELECT attr, codes FROM grouped WHERE polarity = '긍정'),
         |neg AS (SELECT attr, codes AS neg_codes FROM grouped WHERE polarity = '부정'),
         |subbed AS (
         |  SELECT pos.attr, '긍정' AS polarity,
         |    list_sort(list_filter(pos.codes,
         |      x -> NOT coalesce(list_contains(neg.neg_codes, x), false))) AS codes
         |  FROM pos LEFT JOIN neg ON pos.attr = neg.attr
         |  UNION ALL
         |  SELECT attr, '부정', neg_codes FROM neg)
         |SELECT attr, polarity, array_to_string(codes, ',') AS codes
         |FROM subbed WHERE len(codes) > 0
         |ORDER BY attr, polarity""".stripMargin

  /** The L1 extraction as DuckDB CTEs over the literal [[Request]] —
    * the same [[graft.operators.NlTargeting.triplePattern]] regex the
    * Spark side compiles (RE2 and java.util.regex agree on it). */
  private def nlExtractCte: String = {
    val p = graft.operators.NlTargeting.triplePattern(
      graft.TripleExtract.DefaultAttrs)
    s"""req(s) AS (VALUES ('$Request')),
       |m AS (SELECT unnest(regexp_extract_all(s, '$p')) AS m FROM req),
       |triples AS (
       |  SELECT regexp_extract(m, '$p', 1) AS attr,
       |    CASE WHEN regexp_extract(m, '$p', 5) <> '' THEN '부정'
       |         ELSE '긍정' END AS polarity,
       |    regexp_extract(m, '$p', 2) ||
       |      CASE WHEN regexp_extract(m, '$p', 3) <> ''
       |             THEN ' ' || regexp_extract(m, '$p', 3)
       |           WHEN regexp_extract(m, '$p', 4) <> ''
       |             THEN ' ~ ' || regexp_extract(m, '$p', 4)
       |           ELSE '' END AS value
       |  FROM m)""".stripMargin
  }

  override def oracle: Map[String, String] = Map(
    "ix_campaign_index" ->
      s"""WITH $campSql
         |SELECT camp_id, camp_sentence, 64 AS vec_dim
         |FROM camp ORDER BY camp_id""".stripMargin,

    "ix_condition_index" ->
      """WITH base AS (
        |  SELECT DISTINCT '세그먼트' AS cond_nm, c_mktsegment AS code_nm FROM customer
        |  UNION ALL SELECT DISTINCT '우선순위', o_orderpriority FROM orders
        |  UNION ALL SELECT * FROM (VALUES ('구매금액',''), ('주문일자',''))),
        |x AS (SELECT cond_nm, code_nm, unnest(range(1,4)) AS seq FROM base)
        |SELECT concat_ws('_', cond_nm, code_nm, seq) AS cond_id,
        |  cond_nm, code_nm,
        |  printf('%s이(가) %s 인것 표현%d', cond_nm, code_nm, seq) AS cond_desc,
        |  64 AS vec_dim
        |FROM x ORDER BY cond_id""".stripMargin,

    // The metadata join, latest-seq resolution, F15 scan, and catalog
    // table resolution are replayed relationally; the two stored dimension
    // SQLs are inlined in the `codes` CTE (dynamic SQL execution is the
    // driver-side S4 boundary in both engines) — the 우선순위 codes MUST be
    // the latest hierarchy row's output, so a broken latest-seq window
    // would surface as OLD rows here.
    "ix_condition_meta" ->
      """WITH ql(qry_id, qry_meta) AS (VALUES
        |  ('Q1', 'SELECT c_custkey, c_mktsegment FROM customer'),
        |  ('Q2', 'SELECT o_custkey, o_orderpriority, o_totalprice, o_orderdate FROM orders')),
        |qp(qry_id, prmp_kwd, prmp_string, prmp_json_info) AS (VALUES
        |  ('Q1', 'seg', 'AND c_mktsegment = ::op::',
        |    '{"label":{"kr":"세그먼트"},"input":"select","values":[]}'),
        |  ('Q2', 'prio', 'AND o_orderpriority IN ::op::',
        |    '{"label":{"kr":"우선순위"},"input":"select","values":[]}'),
        |  ('Q2', 'amount', 'AND o_totalprice = ::op::',
        |    '{"label":{"kr":"구매금액"},"input":"text","field":"o_totalprice"}'),
        |  ('Q2', 'odate', 'AND o_orderdate = ::op::',
        |    '{"label":{"kr":"주문일자"},"input":"datePopup","field":"o_orderdate"}'),
        |  ('Q1', 'legacy', 'AND c_name = ::op::', NULL)),
        |dl(prmp_kwd, ml_ds_div_cd, dbms_id, ds_sql) AS (VALUES
        |  ('seg', 'DS', 'QUADMAX_SDZ', 'SELECT 1'),
        |  ('prio', 'ML', 'ML01', NULL)),
        |hl(ml_id, ml_seq, ml_dbms_id, ml_qry) AS (VALUES
        |  ('ML01', 1, 'QUADMAX_SDZ', 'SELECT 1 OLD'),
        |  ('ML01', 2, 'QUADMAX_SDZ', 'SELECT 1 LATEST')),
        |latest AS (
        |  SELECT ml_id, ml_dbms_id, ml_qry FROM (
        |    SELECT *, row_number() OVER (PARTITION BY ml_id
        |      ORDER BY ml_seq DESC) AS rn FROM hl)
        |  WHERE rn = 1),
        |joined AS (
        |  SELECT qry_meta, prmp_string,
        |    regexp_extract(prmp_json_info, '"kr":"([^"]+)"', 1) AS cond_nm,
        |    regexp_extract(prmp_json_info, '"input":"([^"]+)"', 1) AS input,
        |    nullif(regexp_extract(prmp_json_info, '"field":"([^"]+)"', 1), '') AS field,
        |    CASE WHEN dl.ml_ds_div_cd = 'DS' THEN dl.ds_sql
        |         ELSE latest.ml_qry END AS sql_qry
        |  FROM ql JOIN qp USING (qry_id)
        |  LEFT JOIN dl USING (prmp_kwd)
        |  LEFT JOIN latest ON dl.dbms_id = latest.ml_id
        |  WHERE prmp_json_info IS NOT NULL),
        |colnm AS (
        |  SELECT *, coalesce(field, array_to_string(toks[2:j-1], ' ')) AS column_nm
        |  FROM (
        |    SELECT *,
        |      least(
        |        coalesce(nullif(list_position(toks, '='), 0), 9223372036854775807),
        |        coalesce(nullif(list_position(toks, 'BETWEEN'), 0), 9223372036854775807),
        |        coalesce(nullif(list_position(toks, 'IN'), 0), 9223372036854775807),
        |        coalesce(nullif(list_position(toks, '::op::'), 0), 9223372036854775807)) AS j
        |    FROM (SELECT *, string_split(prmp_string, ' ') AS toks FROM joined))),
        |inv AS (
        |  SELECT table_name AS inv_table, column_name AS inv_col
        |  FROM information_schema.columns
        |  WHERE table_name IN ('region','nation','customer','supplier','part',
        |    'orders','lineitem','events','documents','embeddings')),
        |with_tables AS (
        |  SELECT cond_nm, input, column_nm, sql_qry,
        |    coalesce(array_to_string(list_sort(
        |      list(DISTINCT inv_table || ' ' || inv_col)), ','), '') AS table_nm
        |  FROM colnm LEFT JOIN inv
        |    ON contains(inv.inv_col, colnm.column_nm)
        |   AND list_contains(string_split_regex(qry_meta, '[^A-Za-z0-9_]+'), inv_col)
        |  GROUP BY cond_nm, input, column_nm, sql_qry),
        |codes AS (
        |  SELECT '세그먼트' AS cond_nm, c_mktsegment AS code, c_mktsegment AS code_nm
        |  FROM customer GROUP BY c_mktsegment
        |  UNION ALL
        |  SELECT '우선순위', o_orderpriority, o_orderpriority
        |  FROM orders GROUP BY o_orderpriority),
        |coded AS (
        |  SELECT w.cond_nm, c.code, c.code_nm, 'string' AS cond_type,
        |    w.column_nm, w.table_nm
        |  FROM with_tables w JOIN codes c ON w.cond_nm = c.cond_nm
        |  WHERE w.input = 'select' AND w.sql_qry IS NOT NULL),
        |valuer AS (
        |  SELECT cond_nm, '' AS code, '' AS code_nm,
        |    CASE WHEN input = 'text' THEN 'integer' ELSE 'datePopup' END AS cond_type,
        |    column_nm, table_nm
        |  FROM with_tables WHERE input IN ('text', 'datePopup')),
        |all_rows AS (SELECT * FROM coded UNION ALL SELECT * FROM valuer),
        |x AS (SELECT *, unnest(range(1,4)) AS seq FROM all_rows)
        |SELECT concat_ws('_', cond_nm, code, code_nm, seq) AS cond_id,
        |  cond_nm, code, code_nm, cond_type, column_nm, table_nm,
        |  printf('%s이(가) %s 인것 표현%d', cond_nm, code_nm, seq) AS cond_desc,
        |  64 AS vec_dim
        |FROM x ORDER BY cond_id""".stripMargin,

    "nl_target_codes" -> nlCodesSql(
      """triples(attr, polarity, value) AS (VALUES
        |  ('세그먼트','긍정','BUILDING'),
        |  ('세그먼트','긍정','MACHINERY'),
        |  ('세그먼트','부정','BUILDING'),
        |  ('우선순위','긍정','1-URGENT'),
        |  ('구매금액','긍정','100만원 이상'),
        |  ('구매금액','긍정','19950101'),
        |  ('주문일자','긍정','19950101 ~ 19961231'),
        |  ('주문일자','부정','19970615 이후'))""".stripMargin),

    "nl_target_from_text" -> nlCodesSql(nlExtractCte),

    "rcmn_top5_built_index" ->
      s"""WITH $campSql,
         |qk AS (SELECT unnest(range(0,5)) AS qid),
         |qs AS (SELECT qid, '봄 시즌 VIP 고객 대상 캠페인 확장' || (qid+1)::VARCHAR AS k FROM qk),
         |cvec AS (SELECT camp_id, ${embSql("camp_sentence")} AS v FROM camp),
         |qvec AS (SELECT qid, ${embSql("k")} AS v FROM qs),
         |scored AS (
         |  SELECT q.qid, c.camp_id, list_cosine_similarity(c.v, q.v) AS simil,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.camp_id) AS rn
         |  FROM cvec c CROSS JOIN qvec q)
         |SELECT camp_id AS vec_id, round(sum(simil)/5*100, 2) AS score
         |FROM scored WHERE rn <= 10 GROUP BY camp_id
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin,

    "q19_polarity_subtract" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS seg, o_orderpriority AS prio, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |pos AS (
        |  SELECT seg, list_sort(list(DISTINCT prio)) AS pos_codes
        |  FROM j WHERE o_totalprice > 200000 GROUP BY seg),
        |neg AS (
        |  SELECT seg, list_sort(list(DISTINCT prio)) AS neg_codes
        |  FROM j WHERE o_totalprice > 450000 GROUP BY seg)
        |SELECT pos.seg,
        |  array_to_string(list_sort(list_filter(pos.pos_codes,
        |    x -> NOT coalesce(list_contains(neg.neg_codes, x), false))), ',') AS codes,
        |  len(list_filter(pos.pos_codes,
        |    x -> NOT coalesce(list_contains(neg.neg_codes, x), false))) AS n_codes
        |FROM pos LEFT JOIN neg ON pos.seg = neg.seg
        |WHERE len(list_filter(pos.pos_codes,
        |    x -> NOT coalesce(list_contains(neg.neg_codes, x), false))) > 0
        |ORDER BY pos.seg""".stripMargin,

    "q20_sweepline_consensus" ->
      """WITH conds AS (
        |  SELECT o_orderpriority AS name,
        |    CAST(floor(min(o_totalprice)) AS BIGINT) AS lo,
        |    CAST(ceil(max(o_totalprice)) AS BIGINT) AS hi,
        |    count(*) AS w
        |  FROM orders GROUP BY o_orderpriority, o_orderstatus),
        |events AS (
        |  SELECT name, lo AS point, 0 AS tie, w AS delta FROM conds
        |  UNION ALL SELECT name, hi, 1, -w FROM conds),
        |eagg AS (SELECT name, point, tie, sum(delta) AS delta
        |         FROM events GROUP BY name, point, tie),
        |run AS (SELECT name, point, tie,
        |  sum(delta) OVER (PARTITION BY name ORDER BY point, tie
        |    ROWS UNBOUNDED PRECEDING) AS running,
        |  lead(point) OVER (PARTITION BY name ORDER BY point, tie) AS next_point
        |  FROM eagg)
        |SELECT name, point AS lo, next_point AS hi,
        |  CAST(running AS BIGINT) AS score
        |FROM run
        |WHERE next_point IS NOT NULL AND next_point > point AND running > 0
        |ORDER BY name, lo""".stripMargin,

    "q21_interval_render" ->
      """WITH two_sided AS (
        |  SELECT o_orderpriority AS name,
        |    CAST(floor(min(o_totalprice)) AS BIGINT) AS lo,
        |    CAST(ceil(max(o_totalprice)) AS BIGINT) AS hi,
        |    count(*) AS w
        |  FROM orders GROUP BY o_orderpriority, o_orderstatus),
        |mids AS (
        |  SELECT o_orderpriority AS name,
        |    CAST(floor(avg(o_totalprice)) AS BIGINT) AS mid
        |  FROM orders GROUP BY o_orderpriority),
        |conds AS (
        |  SELECT * FROM two_sided
        |  UNION ALL SELECT name, 0, mid, 500 FROM mids
        |  UNION ALL SELECT name, mid, 9999999999, 500 FROM mids),
        |events AS (
        |  SELECT name, lo AS point, 0 AS tie, w AS delta FROM conds
        |  UNION ALL SELECT name, hi, 1, -w FROM conds),
        |eagg AS (SELECT name, point, tie, sum(delta) AS delta
        |         FROM events GROUP BY name, point, tie),
        |run AS (SELECT name, point, tie,
        |  sum(delta) OVER (PARTITION BY name ORDER BY point, tie
        |    ROWS UNBOUNDED PRECEDING) AS running,
        |  lead(point) OVER (PARTITION BY name ORDER BY point, tie) AS next_point
        |  FROM eagg),
        |cons AS (
        |  SELECT name, point AS lo, next_point AS hi, running AS score
        |  FROM run
        |  WHERE next_point IS NOT NULL AND next_point > point AND running > 0),
        |kept AS (
        |  SELECT name, lo, hi, score,
        |    lag(hi) OVER (PARTITION BY name ORDER BY lo) AS prev_hi
        |  FROM cons WHERE score >= 1500),
        |adj AS (
        |  SELECT name, score, hi,
        |    CASE WHEN prev_hi IS NOT NULL AND prev_hi = lo THEN lo + 1 ELSE lo END AS lo_adj
        |  FROM kept)
        |SELECT name,
        |  CASE WHEN lo_adj <= 0 THEN '<' || hi
        |       WHEN hi >= 9999999999 THEN '>' || lo_adj
        |       ELSE lo_adj || '~' || hi END AS rendered,
        |  CAST(score AS BIGINT) AS score
        |FROM adj
        |ORDER BY name, rendered, score""".stripMargin,

    "q22_recommend_audience" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
        |  FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS simil,
        |    row_number() OVER (PARTITION BY q.qid
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) DESC,
        |               e.vec_id) AS rn
        |  FROM embeddings e CROSS JOIN q),
        |top5 AS (
        |  SELECT vec_id, round(sum(simil)/5*100, 2) AS score
        |  FROM scored WHERE rn <= 10 GROUP BY vec_id
        |  ORDER BY score DESC, vec_id LIMIT 5),
        |segs AS (
        |  SELECT seg_val, row_number() OVER (ORDER BY seg_val) - 1 AS seg_idx
        |  FROM (SELECT DISTINCT c_mktsegment AS seg_val FROM customer)),
        |str_conds AS (
        |  SELECT t.vec_id AS camp, 'c_mktsegment' AS name, s.seg_val AS value,
        |         t.score AS w
        |  FROM top5 t JOIN segs s ON (t.vec_id % 5) = s.seg_idx),
        |int_conds AS (
        |  SELECT vec_id AS camp, 'o_totalprice' AS name,
        |         vec_id*500 AS lo, vec_id*500+200000 AS hi, score AS w FROM top5
        |  UNION ALL
        |  SELECT vec_id, 'o_totalprice',
        |         vec_id*300+50000, vec_id*300+250000, score FROM top5),
        |thr AS (SELECT avg(score) + 0.5*stddev_samp(score) AS thr FROM top5),
        |kept_segs AS (
        |  SELECT name, value, sum(w) AS total_w FROM str_conds GROUP BY name, value
        |  HAVING sum(w) > (SELECT thr FROM thr)),
        |events AS (
        |  SELECT name, lo AS point, 0 AS tie, w AS delta FROM int_conds
        |  UNION ALL SELECT name, hi, 1, -w FROM int_conds),
        |eagg AS (SELECT name, point, tie, sum(delta) AS delta
        |         FROM events GROUP BY name, point, tie),
        |run AS (SELECT name, point, tie,
        |  sum(delta) OVER (PARTITION BY name ORDER BY point, tie
        |    ROWS UNBOUNDED PRECEDING) AS running,
        |  lead(point) OVER (PARTITION BY name ORDER BY point, tie) AS next_point
        |  FROM eagg),
        |kept_ints AS (
        |  SELECT point AS lo, next_point AS hi, running AS score FROM run
        |  WHERE next_point IS NOT NULL AND next_point > point AND running > 0
        |    AND running >= (SELECT thr FROM thr)),
        |aud AS (
        |  SELECT c_custkey AS cust_id FROM customer
        |  WHERE c_mktsegment IN (SELECT value FROM kept_segs)
        |  UNION ALL
        |  SELECT o_custkey AS cust_id
        |  FROM orders o JOIN kept_ints k
        |    ON o.o_totalprice >= k.lo AND o.o_totalprice < k.hi)
        |SELECT count(DISTINCT cust_id) AS audience FROM aud""".stripMargin,

    // q22's full pipeline re-derivation with the BAND-RESOLUTION tail:
    // an order serves when its price band (width 50 000) intersects a
    // kept interval — the discretized membership the persisted band
    // sketches answer; in the exhaustive regime the sketch estimate IS
    // this exact distinct count
    "rcmn_audience_sketch" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
        |  FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS simil,
        |    row_number() OVER (PARTITION BY q.qid
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) DESC,
        |               e.vec_id) AS rn
        |  FROM embeddings e CROSS JOIN q),
        |top5 AS (
        |  SELECT vec_id, round(sum(simil)/5*100, 2) AS score
        |  FROM scored WHERE rn <= 10 GROUP BY vec_id
        |  ORDER BY score DESC, vec_id LIMIT 5),
        |segs AS (
        |  SELECT seg_val, row_number() OVER (ORDER BY seg_val) - 1 AS seg_idx
        |  FROM (SELECT DISTINCT c_mktsegment AS seg_val FROM customer)),
        |str_conds AS (
        |  SELECT t.vec_id AS camp, 'c_mktsegment' AS name, s.seg_val AS value,
        |         t.score AS w
        |  FROM top5 t JOIN segs s ON (t.vec_id % 5) = s.seg_idx),
        |int_conds AS (
        |  SELECT vec_id AS camp, 'o_totalprice' AS name,
        |         vec_id*500 AS lo, vec_id*500+200000 AS hi, score AS w FROM top5
        |  UNION ALL
        |  SELECT vec_id, 'o_totalprice',
        |         vec_id*300+50000, vec_id*300+250000, score FROM top5),
        |thr AS (SELECT avg(score) + 0.5*stddev_samp(score) AS thr FROM top5),
        |kept_segs AS (
        |  SELECT name, value, sum(w) AS total_w FROM str_conds GROUP BY name, value
        |  HAVING sum(w) > (SELECT thr FROM thr)),
        |events AS (
        |  SELECT name, lo AS point, 0 AS tie, w AS delta FROM int_conds
        |  UNION ALL SELECT name, hi, 1, -w FROM int_conds),
        |eagg AS (SELECT name, point, tie, sum(delta) AS delta
        |         FROM events GROUP BY name, point, tie),
        |run AS (SELECT name, point, tie,
        |  sum(delta) OVER (PARTITION BY name ORDER BY point, tie
        |    ROWS UNBOUNDED PRECEDING) AS running,
        |  lead(point) OVER (PARTITION BY name ORDER BY point, tie) AS next_point
        |  FROM eagg),
        |kept_ints AS (
        |  SELECT point AS lo, next_point AS hi, running AS score FROM run
        |  WHERE next_point IS NOT NULL AND next_point > point AND running > 0
        |    AND running >= (SELECT thr FROM thr)),
        |aud AS (
        |  SELECT c_custkey AS cust_id FROM customer
        |  WHERE c_mktsegment IN (SELECT value FROM kept_segs)
        |  UNION ALL
        |  SELECT o_custkey AS cust_id
        |  FROM orders o JOIN kept_ints k
        |    ON floor(o.o_totalprice/50000)*50000 < k.hi
        |   AND (floor(o.o_totalprice/50000)+1)*50000 > k.lo)
        |SELECT count(DISTINCT cust_id) AS audience FROM aud""".stripMargin
  )
}
