package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector index builders (E3): the Spark form of the two reference
  * indexing scripts.
  *
  *  - Campaign index (`/root/reference/camp_vec_save.py`): join campaign
  *    metadata, serialize each row to a Korean sentence (F6), embed, store
  *    (CAMP_ID, CAMP_VEC). The reference loops rows on the driver and
  *    INSERTs one at a time (`camp_vec_save.py:49-79`) — here the whole
  *    build is one distributed pipeline ending in a parquet write.
  *  - Condition index (`/root/reference/nl_targeting_save.py`): per
  *    condition code, 3 NL paraphrases (stub L4), embed each, store
  *    9-column rows with COND_ID = "{nm}_{code}_{seq}"
  *    (`nl_targeting_save.py:133-146`).
  *
  * Embedding is [[Embeddings.embedCol]] (deterministic, codegen'd, fully
  * distributed). Fixture mapping: `part` plays `t_campaign` (campaign
  * catalog), suppliers-per-part plays the offers subquery, customer
  * segments / order priorities play condition dimensions.
  */
object IndexBuild {

  /** F6: `"{col}은 {val} 입니다."` per non-id column, space-joined
    * (`/root/reference/camp_vec_save.py:49-56`; NULL → '없음' per the
    * IFNULL convention, `camp_vec_save.py:10-12`). */
  def sentence(cols: Seq[(String, Column)]): Column =
    concat_ws(" ", cols.map { case (name, c) =>
      format_string("%s은 %s 입니다.", lit(name),
        coalesce(c.cast("string"), lit("없음")))
    }: _*)

  /** The joined campaign source table (5-way join shape of
    * `camp_vec_save.py:6-45`): campaigns = parts, offers = aggregated
    * supplier names (J4 pre-aggregated derived table), '[AI]%' prefix
    * filter (P5). */
  def campaignTable(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
    val li = Tables.load(spark, dir, "lineitem")
    val supp = Tables.load(spark, dir, "supplier")
    // offers: GROUP_CONCAT of the suppliers seen for each part — aggregate
    // BEFORE the join (the reference pre-aggregates too; Catalyst would not
    // invent this rewrite, SURVEY §4).
    val offers = li.join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(concat_ws(",", array_sort(collect_set(col("s_name")))).as("offer_nm"))
    part
      // the fixture has no '[AI]' names; campaigns are the even parts,
      // branded like the reference's AI campaigns (camp_vec_save.py:39).
      .withColumn("camp_nm",
        when(pmod(col("p_partkey"), lit(2)) === 0,
          concat(lit("[AI] "), col("p_name"))).otherwise(col("p_name")))
      .filter(col("camp_nm").startsWith("[AI]"))
      .join(offers, part("p_partkey") === offers("l_partkey"), "left_outer")
      .select(
        col("p_partkey").as("camp_id"),
        col("camp_nm"),
        col("p_brand").as("camp_type_nm"),
        col("p_type").as("success_type_nm"),
        coalesce(col("offer_nm"), lit("없음")).as("offer_nm"),
        col("p_retailprice").as("budget"))
  }

  /** Campaign vector index: (camp_id, camp_vec, camp_sentence). */
  def campaignIndex(spark: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    val ct = campaignTable(spark, dir)
    val sent = sentence(Seq(
      "캠페인명" -> col("camp_nm"),
      "캠페인유형" -> col("camp_type_nm"),
      "성공유형" -> col("success_type_nm"),
      "오퍼명" -> col("offer_nm"),
      "예산" -> col("budget")))
    ct.select(col("camp_id"), sent.as("camp_sentence"))
      .withColumn("camp_vec", Embeddings.embedCol(col("camp_sentence"), dim))
  }

  /** The four metadata tables of the reference's condition-index build
    * (`/root/reference/nl_targeting_save.py:11-36`), as literal fixtures:
    * query catalog, per-query prompt rows (JSON info carries label/input/
    * field), the dimension routing table (DS rows carry their own code
    * SQL; ML rows route through the hierarchy), and the versioned
    * hierarchy whose LATEST `ml_seq` row per `ml_id` wins (J5). */
  case class ConditionMeta(queryList: DataFrame, queryPrompt: DataFrame,
      dimensionList: DataFrame, hierarchyList: DataFrame)

  def metaFixture(spark: SparkSession): ConditionMeta = {
    val ql = spark.createDataFrame(Seq(
      ("Q1", "SELECT c_custkey, c_mktsegment FROM customer"),
      ("Q2", "SELECT o_custkey, o_orderpriority, o_totalprice, o_orderdate FROM orders")
    )).toDF("qry_id", "qry_meta")
    val qp = spark.createDataFrame(Seq(
      ("Q1", "seg", "AND c_mktsegment = ::op::",
        """{"label":{"kr":"세그먼트"},"input":"select","values":[]}"""),
      ("Q2", "prio", "AND o_orderpriority IN ::op::",
        """{"label":{"kr":"우선순위"},"input":"select","values":[]}"""),
      ("Q2", "amount", "AND o_totalprice = ::op::",
        """{"label":{"kr":"구매금액"},"input":"text","field":"o_totalprice"}"""),
      ("Q2", "odate", "AND o_orderdate = ::op::",
        """{"label":{"kr":"주문일자"},"input":"datePopup","field":"o_orderdate"}"""),
      ("Q1", "legacy", "AND c_name = ::op::", null) // filtered: NULL json
    )).toDF("qry_id", "prmp_kwd", "prmp_string", "prmp_json_info")
    val dl = spark.createDataFrame(Seq(
      ("seg", "DS", "QUADMAX_SDZ",
        "/* seg codes */ SELECT c_mktsegment AS code, c_mktsegment AS code_nm " +
          "FROM customer GROUP BY c_mktsegment ;"),
      ("prio", "ML", "ML01", null)
    )).toDF("prmp_kwd", "ml_ds_div_cd", "dbms_id", "ds_sql")
    val hl = spark.createDataFrame(Seq(
      ("ML01", 1, "QUADMAX_SDZ", "SELECT 'OLD' AS code, 'OLD' AS code_nm"),
      ("ML01", 2, "QUADMAX_SDZ",
        "-- latest\nSELECT o_orderpriority AS code, o_orderpriority AS code_nm " +
          "FROM orders GROUP BY o_orderpriority ;")
    )).toDF("ml_id", "ml_seq", "ml_dbms_id", "ml_qry")
    ConditionMeta(ql, qp, dl, hl)
  }

  /** The condition index composed the reference's way
    * (`/root/reference/nl_targeting_save.py:11-104`): 4-way metadata join
    * (inner prompt, left dimension, left latest-hierarchy) + NULL-json
    * filter, JSON label/input/field extraction, F15 operator scan for
    * field-less prompts, table resolution from the query catalog ∩ column
    * inventory, per-dimension stored-SQL code resolution, then the L4
    * paraphrase ×3 + embed tail. Output = the 9-column INSERT shape with
    * the reference's 4-part COND_ID `{nm}_{code}_{code_nm}_{seq}`
    * (`nl_targeting_save.py:133-136`).
    *
    * The stored-SQL step collects the METADATA rows (bounded by catalog
    * size, same driver boundary as the reference's per-dimension cursor
    * loop) and runs each dimension SQL as a distributed Spark job; the
    * data-sized work — code scans, paraphrase explode, embedding — never
    * touches the driver. */
  def conditionIndexFromMeta(spark: SparkSession, dir: String,
      meta: ConditionMeta, dim: Int = 64): DataFrame = {
    // J5 latest-seq via max_by: one partial-aggregable pass, no window.
    val latest = meta.hierarchyList.groupBy(col("ml_id"))
      .agg(max_by(struct(col("ml_dbms_id"), col("ml_qry")), col("ml_seq")).as("d"))
      .select(col("ml_id"), col("d.ml_dbms_id").as("ml_dbms_id"),
        col("d.ml_qry").as("ml_qry"))
    val joined = meta.queryList
      .join(meta.queryPrompt, Seq("qry_id")) // J1
      .join(broadcast(meta.dimensionList), Seq("prmp_kwd"), "left_outer") // J2
      .join(broadcast(latest), col("dbms_id") === col("ml_id"), "left_outer")
      .filter(col("prmp_json_info").isNotNull) // P4
      .select(col("qry_meta"), col("prmp_string"),
        get_json_object(col("prmp_json_info"), "$.label.kr").as("cond_nm"),
        get_json_object(col("prmp_json_info"), "$.input").as("input"),
        get_json_object(col("prmp_json_info"), "$.field").as("field"),
        when(col("ml_ds_div_cd") === "DS", col("ds_sql"))
          .otherwise(col("ml_qry")).as("sql_qry"))
      .withColumn("column_nm",
        coalesce(col("field"), Catalog.columnFromPrmp(col("prmp_string"))))
    // Table resolution (table_search ∩ column_search): a broadcast join
    // against the (table, column) inventory — the inventory is schema
    // metadata, bounded, and the join is the relational form of the
    // reference's per-row dict lookups.
    val inv = spark.createDataFrame(Catalog.columnInventory(spark, dir))
      .toDF("inv_table", "inv_col")
    val withTables = joined
      .join(broadcast(inv),
        col("inv_col").contains(col("column_nm")) &&
          array_contains(split(col("qry_meta"), "[^A-Za-z0-9_]+"), col("inv_col")),
        "left_outer")
      .groupBy(col("cond_nm"), col("input"), col("column_nm"), col("sql_qry"))
      .agg(concat_ws(",", array_sort(collect_set(
        concat_ws(" ", col("inv_table"), col("inv_col"))))).as("table_nm"))
    // Value-typed conditions need no codes; coded ones resolve theirs by
    // executing the routed dimension SQL (stored-SQL S4 boundary).
    val valueRows = withTables.filter(col("input").isin("text", "datePopup"))
      .select(col("cond_nm"), lit("").as("code"), lit("").as("code_nm"),
        when(col("input") === "text", "integer").otherwise("datePopup")
          .as("cond_type"),
        col("column_nm"), col("table_nm"))
    Tables.registerAll(spark, dir)
    // The collect is bounded METADATA (catalog-sized — the reference's own
    // per-dimension cursor boundary), but the plan is built per DISTINCT
    // routed SQL, not per condition: conditions sharing a dimension source
    // ride one scan via a broadcast cross join with their bounded metadata
    // rows, so union width — and planner/lineage cost — is the number of
    // distinct sources, constant in condition count (r9 verdict #5; the
    // prior shape folded one spark.sql subplan per condition).
    val codedMeta = withTables
      .filter(col("input") === "select" && col("sql_qry").isNotNull)
      .select("cond_nm", "column_nm", "table_nm", "sql_qry").collect()
    val codedRows = codedMeta
      .groupBy(_.getString(3)).toSeq.sortBy(_._1)
      .map { case (sql, rs) =>
        val conds = spark.createDataFrame(rs.toSeq.map(r =>
          (r.getString(0), r.getString(1), r.getString(2))))
          .toDF("cond_nm", "column_nm", "table_nm")
        spark.sql(Catalog.refineQuery(sql)).toDF("code", "code_nm")
          .crossJoin(broadcast(conds))
          .select(col("cond_nm"), col("code").cast("string"),
            col("code_nm").cast("string"),
            lit("string").as("cond_type"),
            col("column_nm"), col("table_nm"))
      }.reduceOption(_ unionAll _)
    val rows = codedRows.fold(valueRows)(valueRows.unionAll)
    rows
      .withColumn("seq", explode(sequence(lit(1), lit(3))))
      .withColumn("cond_desc",
        format_string("%s이(가) %s 인것 표현%d",
          col("cond_nm"), col("code_nm"), col("seq")))
      .withColumn("cond_id", concat_ws("_",
        col("cond_nm"), col("code"), col("code_nm"), col("seq")))
      .withColumn("cond_vec",
        Embeddings.embedCol(
          when(col("code_nm") === "", col("cond_nm"))
            .otherwise(concat_ws(":", col("cond_nm"), col("code_nm"))), dim))
      .select(col("cond_id"), col("cond_nm"), col("code"), col("code_nm"),
        col("cond_type"), col("column_nm"), col("table_nm"), col("cond_desc"),
        col("cond_vec"))
  }

  /** Condition vector index: one row per (condition, code, paraphrase-seq),
    * COND_ID = "{nm}_{code}_{seq}" (`nl_targeting_save.py:133-136`). The 3
    * paraphrases are the stub-L4 grammar: deterministic suffixed variants.
    *
    * Two condition classes, as in the reference's condition table:
    *  - coded (`cond_type = 'string'`): every distinct code value is its
    *    own row — E2 matches `attr:value` against `cond_nm:code_nm`;
    *  - value-typed (`cond_type = 'integer' | 'datePopup'`, `code_nm =
    *    ''`): the raw request value is normalized to an operator form by
    *    the L2 stage (`/root/reference/nl_targeting.py:62-80`) — E2
    *    matches the attribute alone, so these embed just `cond_nm`. */
  def conditionIndex(spark: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    val segs = Tables.load(spark, dir, "customer")
      .select(lit("세그먼트").as("cond_nm"), lit("c_mktsegment").as("column_nm"),
        lit("customer").as("table_nm"), col("c_mktsegment").as("code_nm"),
        lit("string").as("cond_type"))
      .distinct()
    val prios = Tables.load(spark, dir, "orders")
      .select(lit("우선순위").as("cond_nm"), lit("o_orderpriority").as("column_nm"),
        lit("orders").as("table_nm"), col("o_orderpriority").as("code_nm"),
        lit("string").as("cond_type"))
      .distinct()
    val valueConds = spark.createDataFrame(Seq(
        ("구매금액", "o_totalprice", "orders", "", "integer"),
        ("주문일자", "o_orderdate", "orders", "", "datePopup")))
      .toDF("cond_nm", "column_nm", "table_nm", "code_nm", "cond_type")
    segs.union(prios).union(valueConds)
      .withColumn("seq", explode(sequence(lit(1), lit(3))))
      .withColumn("cond_desc",
        format_string("%s이(가) %s 인것 표현%d", col("cond_nm"), col("code_nm"), col("seq")))
      .withColumn("cond_id",
        concat_ws("_", col("cond_nm"), col("code_nm"), col("seq")))
      // The stub embedder is a hash — it has no semantics, so paraphrases
      // of one condition would land nowhere near each other. Embedding the
      // canonical key instead (`cond_nm:code_nm` for coded rows, bare
      // `cond_nm` for value-typed rows) gives the stub "ideal embedder"
      // behavior (same condition ⇒ cosine 1, else ≈0); the paraphrase text
      // stays in cond_desc as the production field.
      .withColumn("cond_vec",
        Embeddings.embedCol(
          when(col("code_nm") === "", col("cond_nm"))
            .otherwise(concat_ws(":", col("cond_nm"), col("code_nm"))), dim))
      .select(col("cond_id"), col("cond_nm"), col("code_nm"), col("cond_type"),
        col("column_nm"), col("table_nm"), col("cond_desc"), col("cond_vec"))
  }
}
