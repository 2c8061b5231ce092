package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-compat codec for the reference's encoded targeting-condition
  * strings (`/root/reference/camp_vec_rcmn.py:79,103-130`).
  *
  * Wire format (one string per campaign, `TARGET_CONDI`):
  * conditions joined by `" !@#$ "`, each condition four fields joined by
  * `" %^ "`: `(PRMP_DATA_TYPE, PRMP_NM, PRMP_OP, PRMP_VAL)`; values are
  * Python literals — `['A','B']` for string conditions, `[lo,hi]` or a
  * bare scalar for integer/date. The reference widens one-sided operators
  * against sentinel domains: integer `less` → `[0, v]`, `greater` →
  * `[v, 9999999999]` (`camp_vec_rcmn.py:113-119`); datePopup `less` →
  * `['20200101', v]`, `greater` → `[v, '20301231']`
  * (`camp_vec_rcmn.py:124-130`).
  *
  * Everything is codegen'd string/array expressions — decode of a billion
  * campaign rows is a map-only pass, and the exploded output is exactly
  * the `(name, lo, hi, w)` shape [[SweepLine.consensus]] consumes.
  */
object ConditionCodec {

  val IntMin = 0L
  val IntMax = 9999999999L
  val DateMin = "20200101"
  val DateMax = "20301231"

  /** One row per encoded condition: `(…, cond_form, feature, op,
    * value_str)`. Fields are trimmed like the reference's `p.strip()`. */
  def decode(df: DataFrame, condiCol: String): DataFrame = {
    val parts = split(col("cond_raw"), "\\s*%\\^\\s*")
    df.withColumn("cond_raw", explode(split(col(condiCol), "\\s*!@#\\$\\s*")))
      .withColumn("cond_form", trim(element_at(parts, 1)))
      .withColumn("feature", trim(element_at(parts, 2)))
      .withColumn("op", trim(element_at(parts, 3)))
      .withColumn("value_str", trim(element_at(parts, 4)))
      .drop("cond_raw")
  }

  /** Python-literal list → string array (F13: bare scalars wrap to
    * 1-element lists — `camp_vec_rcmn.py:107-112`). */
  def parseList(valueStr: Column): Column =
    split(regexp_replace(valueStr, "[\\[\\]' ]", ""), ",")

  /** Operator/sentinel widening for interval conditions: `(lo, hi)` as
    * strings (cast by the caller per cond_form). */
  private def widen(op: Column, vals: Column, minV: String, maxV: String)
      : (Column, Column) = {
    // try_element_at: a bare scalar parses to a 1-element list and ANSI
    // element_at would throw on index 2
    val v0 = element_at(vals, 1)
    val v1 = coalesce(try_element_at(vals, lit(2)), v0)
    val lo = when(op === "less", lit(minV)).otherwise(v0)
    val hi = when(op === "less", v0)
      .when(op === "greater", lit(maxV))
      .otherwise(v1)
    (lo, hi)
  }

  /** Decoded conditions → weighted rows for the consensus stages:
    *  - string conditions: one row per listed value (`kind='string'`,
    *    `value`, lo/hi null);
    *  - integer/datePopup: one widened interval row (`kind`, lo, hi as
    *    strings — datePopup keeps `yyyyMMdd`).
    * `weightCol` is carried through (the campaign's fused score). */
  def conditionRows(decoded: DataFrame, weightCol: String): DataFrame = {
    val vals = parseList(col("value_str"))
    val strRows = decoded.filter(col("cond_form") === "string")
      .select(col("feature").as("name"), lit("string").as("kind"),
        explode(vals).as("value"),
        lit(null: String).as("lo"), lit(null: String).as("hi"),
        col(weightCol).as("w"))
    val (ilo, ihi) = widen(col("op"), vals, IntMin.toString, IntMax.toString)
    val intRows = decoded.filter(col("cond_form") === "integer")
      .select(col("feature").as("name"), lit("integer").as("kind"),
        lit(null: String).as("value"), ilo.as("lo"), ihi.as("hi"),
        col(weightCol).as("w"))
    val (dlo, dhi) = widen(col("op"), vals, DateMin, DateMax)
    val dateRows = decoded.filter(col("cond_form") === "datePopup")
      .select(col("feature").as("name"), lit("datePopup").as("kind"),
        lit(null: String).as("value"), dlo.as("lo"), dhi.as("hi"),
        col(weightCol).as("w"))
    strRows.union(intRows).union(dateRows)
  }

  /** Inverse: re-encode per-campaign condition rows into the reference's
    * `TARGET_CONDI` string — `GROUP_CONCAT(CONCAT(form,' %^ ',nm,' %^ ',
    * op,' %^ ',val) ORDER BY PRMP_NM SEPARATOR ' !@#$ ')`
    * (`camp_vec_rcmn.py:79`). Sorting happens in the collected array
    * (struct sort on (feature, encoded)), not a WindowExec. */
  def encode(decoded: DataFrame, keyCol: String): DataFrame =
    decoded
      .select(col(keyCol),
        struct(col("feature"),
          concat_ws(" %^ ", col("cond_form"), col("feature"), col("op"),
            col("value_str")).as("enc")).as("fe"))
      .groupBy(col(keyCol))
      .agg(concat_ws(" !@#$ ",
        transform(array_sort(collect_list(col("fe"))), f => f.getField("enc")))
        .as("target_condi"))
}
