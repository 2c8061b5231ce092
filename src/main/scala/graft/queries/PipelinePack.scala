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

    // ---- index-build / stub-LLM path (no DuckDB twin for xxhash64:
    // rows-only checks) ----

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

    // E2: NL triples → condition search → polarity subtraction
    // (/root/reference/nl_targeting.py). Triples are literal rows (the
    // LLM-extraction boundary); 부정 BUILDING must vanish from 긍정 codes.
    "nl_target_codes" -> ((s, dir) => {
      val triples = s.createDataFrame(Seq(
        ("세그먼트", "긍정", "BUILDING"),
        ("세그먼트", "긍정", "MACHINERY"),
        ("세그먼트", "부정", "BUILDING"),
        ("우선순위", "긍정", "1-URGENT")
      )).toDF("attr", "polarity", "value")
      Graft.init(s)
      NlTargeting.targetCodes(triples, IndexBuild.conditionIndex(s, dir), floor = 0.99)
        .select(col("attr"), col("polarity"),
          concat_ws(",", col("codes")).as("codes"))
        .orderBy(col("attr"), col("polarity"))
    }),

    // E1 front half on the BUILT index with stub-LLM query expansion
    // (L5 grammar, /root/reference/camp_vec_rcmn.py:11-38).
    "rcmn_top5_built_index" -> ((s, dir) => {
      Graft.init(s)
      val expansions = new StubLlm()
        .complete("expand", "봄 시즌 VIP 고객 대상 캠페인").split("!!!!")
      val qs = s.createDataFrame(expansions.toSeq.zipWithIndex.map {
          case (q, i) => (i.toLong, q)
        }).toDF("qid", "qtext")
        .select(col("qid"), Embeddings.embedCol(col("qtext")).as("qvec"))
      val index = IndexBuild.campaignIndex(s, dir)
        .select(col("camp_id").as("vec_id"), col("camp_vec").as("embedding"))
      Knn.fuse(Knn.topKPerQuery(index, qs, CampaignRecommend.K),
        CampaignRecommend.NQueries, CampaignRecommend.TopN)
    })
  )

  override def oracle: Map[String, String] = Map(
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
        |SELECT count(DISTINCT cust_id) AS audience FROM aud""".stripMargin
  )
}
