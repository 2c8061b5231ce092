package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Graft, IndexBuild, Embeddings}

/** E2: NL request → targeting conditions (`/root/reference/nl_targeting.py`).
  *
  * Pipeline: per extracted (attribute, polarity, value) triple, build the
  * query sentence (F7), embed it, similarity-search the condition index
  * keeping the best hit per condition above the floor (P6+A1), group the
  * matched codes per (attribute, polarity) (A10), then subtract negated
  * codes from positive ones (SET3,
  * `/root/reference/nl_targeting.py:112-123`).
  *
  * The LLM extraction/refinement steps (L1-L3) sit OUTSIDE this operator —
  * triples arrive as a DataFrame (in tests: literal rows; in production:
  * whatever NL layer feeds it). Everything here is relational.
  */
object NlTargeting {

  /** F7: query sentence per triple — positive/negative particle templating
    * (`/root/reference/nl_targeting.py:48-53`). */
  def querySentence(attr: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column,
      polarity: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(polarity === "긍정",
      format_string("%s이(가) %s 인것 찾아줘", attr, value))
      .otherwise(format_string("%s이(가) %s 이(가) 아닌것 찾아줘", attr, value))

  /** Per-triple condition search + code grouping + polarity subtraction.
    *
    * @param triples columns `attr: string, polarity: string (긍정|부정),
    *                value: string`
    * @param condIndex [[graft.IndexBuild.conditionIndex]] shape
    * @param floor the similarity floor (`standard_simil_score` = 0.5 in the
    *              reference, `/root/reference/nl_targeting.py:55`; the stub
    *              embedder's score distribution peaks lower, so callers
    *              pass a fixture-appropriate floor).
    * @return columns `attr, polarity, codes: array<string>` (sorted), with
    *         positive rows already minus their negated codes and empty
    *         groups dropped (P8).
    */
  def targetCodes(triples: DataFrame, condIndex: DataFrame,
      floor: Double, dim: Int = 64): DataFrame = {
    // Embed the canonical attr:value key (the stub-embedder convention of
    // IndexBuild.conditionIndex); production would embed querySentence().
    val qs = triples.select(col("attr"), col("polarity"),
      Embeddings.embedCol(concat_ws(":", col("attr"), col("value")), dim).as("qvec"))
    // best score per (triple, condition code): A1's max-per-group over the
    // ≥floor hits. The triple side is tiny — broadcast; the index scan is
    // one codegen'd pass.
    val hits = condIndex.crossJoin(broadcast(qs))
      .select(col("attr"), col("polarity"), col("cond_nm"), col("code_nm"),
        Graft.cosine(col("cond_vec"), col("qvec")).as("simil"))
      .filter(col("simil") >= floor)
      .groupBy(col("attr"), col("polarity"), col("cond_nm"), col("code_nm"))
      .agg(max(col("simil")).as("best"))
    // A10: dedup'd code set per (attr, polarity).
    val grouped = hits
      .groupBy(col("attr"), col("polarity"))
      .agg(array_sort(collect_set(col("code_nm"))).as("codes"))
    // SET3: positive := positive − negative for the same attribute.
    val pos = grouped.filter(col("polarity") === "긍정")
      .select(col("attr"), col("codes").as("pos_codes"))
    val neg = grouped.filter(col("polarity") === "부정")
      .select(col("attr"), col("codes").as("neg_codes"))
    val subtracted = pos.join(neg, Seq("attr"), "left_outer")
      .select(col("attr"), lit("긍정").as("polarity"),
        array_sort(array_except(col("pos_codes"),
          coalesce(col("neg_codes"), array()))).as("codes"))
    subtracted.union(
        neg.select(col("attr"), lit("부정").as("polarity"), col("neg_codes")))
      .filter(size(col("codes")) > 0)
  }
}
