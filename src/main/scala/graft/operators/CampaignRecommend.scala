package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The flagship E1 pipeline (`/root/reference/camp_vec_rcmn.py`, end to
  * end): query expansions → per-expansion KNN → score fusion → top-5 →
  * targeting conditions → statistical threshold → string + interval
  * consensus → audience count. DataFrames at every stage; the only action
  * is the caller's.
  *
  * This variant uses the `embeddings` fixture as the campaign vector index
  * and vec_ids 0..4 as the five "expanded query" vectors, which makes every
  * stage pure relational/arithmetic — and therefore DuckDB-oracle-checkable
  * (see PipelinePack.q22). The stub-embedder variant that exercises the
  * index *build* path too lives in [[graft.IndexBuild]].
  */
object CampaignRecommend {

  val K = 10        // LIMIT 10 per expansion, camp_vec_rcmn.py:44
  val NQueries = 5  // 5 expansions, camp_vec_rcmn.py:17
  val TopN = 5      // fused top-5, camp_vec_rcmn.py:68

  /** Stage 1-2: fused top-5 campaigns with percent scores. */
  def top5(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    val qs = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Knn.fuse(Knn.topKPerQuery(e, qs, K), NQueries, TopN)
  }

  /** Distinct string-attribute values with dense index, for condition
    * synthesis (small; broadcast by callers).
    *
    * The index comes from `array_sort(collect_set(...))` + `posexplode`,
    * not a global `row_number` window: collect_set partial-aggregates
    * map-side, so no single-partition WindowExec sort ever materializes —
    * the only requirement is that the DISTINCT VALUE DOMAIN (not the rows)
    * fits one array, which holds for any dimension attribute. */
  def segments(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_mktsegment").as("seg_val"))
      .agg(array_sort(collect_set(col("seg_val"))).as("segs"))
      .select(posexplode(col("segs")))
      .select(col("col").as("seg_val"), col("pos").as("seg_idx"))

  /** E1 tail in the reference's own shape: compile each kept condition set
    * into the parameterized SQL template (F5), run the compiled statements
    * via spark.sql, UNION and count distinct
    * (`/root/reference/camp_vec_rcmn.py:240-293`). Semantically equal to
    * [[audienceCount]] (spec-verified) — that one stays on the pure
    * DataFrame path; this one proves the template route end-to-end. */
  def audienceCountViaTemplates(spark: SparkSession, dir: String): DataFrame = {
    import graft.TemplateSql
    graft.Tables.registerAll(spark, dir)
    val t5 = top5(spark, dir).cache()
    val (strConds, intConds) = Conditions.synthesize(t5, segments(spark, dir))
    val thr = Conditions.threshold(t5)
    val keptSegs = Conditions.stringConsensus(strConds, thr)
      .select("value").collect().map(_.getString(0)).toSeq.sorted
    val keptInts = SweepLine.consensus(
        intConds.select(col("name"), col("lo"), col("hi"), col("w")))
      .crossJoin(broadcast(thr))
      .filter(col("score") >= col("thr"))
      .select("lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // The collects above materialize only the handful of consensus
    // conditions (the reference's condition dict) — never row data.
    val segTemplate =
      """/* audience by segment */
        |SELECT @@SELECT_STRING@@ FROM customer
        |WHERE [ c_mktsegment ::op:: seg ]""".stripMargin
    val intTemplate =
      """/* audience by price interval */
        |SELECT @@SELECT_STRING@@ FROM orders
        |WHERE [ o_totalprice ::op:: price_lo ] AND [ o_totalprice ::op:: price_hi ]""".stripMargin
    val segSql = if (keptSegs.isEmpty) Nil else Seq(TemplateSql.compile(
      segTemplate, "c_custkey AS cust_id",
      Map("seg" -> TemplateSql.InList(keptSegs))))
    val intSqls = keptInts.map { case (lo, hi) => TemplateSql.compile(
      intTemplate, "o_custkey AS cust_id",
      Map("price_lo" -> TemplateSql.Compare(">=", lo.toString),
        "price_hi" -> TemplateSql.Compare("<", hi.toString)))
    }
    Audience.fromCompiledSql(spark, segSql ++ intSqls)
  }

  /** Full pipeline → 1-row audience count. */
  def audienceCount(spark: SparkSession, dir: String): DataFrame = {
    val t5 = top5(spark, dir).cache() // read 3×: conds, threshold (A8+T2 reuse)
    val (strConds, intConds) = Conditions.synthesize(t5, segments(spark, dir))
    val thr = Conditions.threshold(t5)
    val keptSegments = Conditions.stringConsensus(strConds, thr)
    val keptIntervals = SweepLine.consensus(
        intConds.select(col("name"), col("lo"), col("hi"), col("w")))
      .crossJoin(broadcast(thr))
      .filter(col("score") >= col("thr"))
      .select(col("name"), col("lo"), col("hi"), col("score"))
    Audience.count(
      Tables.load(spark, dir, "customer"), Tables.load(spark, dir, "orders"),
      keptSegments, keptIntervals)
  }
}
