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
