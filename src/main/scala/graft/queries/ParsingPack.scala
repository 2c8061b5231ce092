package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ConditionCodec, SweepLine}

/** Metadata-parsing + date-axis operators that close the SURVEY §2 gaps:
  * F9 (date↔epoch) + W2-date (sweep-line on a date axis), F13
  * (Python-literal list parsing with scalar wrap), F15 (operator-token
  * scan over PRMP_STRING). Literal-input queries use identical VALUES rows
  * in the DuckDB oracle. */
object ParsingPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F9 + W2-date: interval consensus on a yyyyMMdd date axis — convert
    // through epoch seconds and back (/root/reference/camp_vec_rcmn.py:
    // 122-132, 204-209).
    "q23_sweepline_dates" -> ((s, dir) => {
      val conds = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("name"), col("o_orderstatus"))
        .agg(date_format(min(col("o_orderdate")), "yyyyMMdd").as("lo_d"),
          date_format(max(col("o_orderdate")), "yyyyMMdd").as("hi_d"),
          count(lit(1)).as("w"))
        .select(col("name"), col("lo_d"), col("hi_d"), col("w"))
      SweepLine.consensusDates(conds).orderBy(col("name"), col("lo_d"))
    }),

    // F13: Python-literal list parse "['A','B']" / "[lo,hi]" with the
    // reference's scalar-or-list coercion (/root/reference/nl_targeting.py:46,
    // camp_vec_rcmn.py:107-112 — bare scalars wrap to 1-element lists).
    "q24_literal_lists" -> ((s, dir) => {
      val raw = s.createDataFrame(Seq(
        ("segs", "['BUILDING','MACHINERY']"),
        ("range", "[100, 250]"),
        ("single", "['SINGLE']"),
        ("scalar", "42"))).toDF("name", "raw")
      raw.select(col("name"),
          split(regexp_replace(col("raw"), "[\\[\\]' ]", ""), ",").as("parsed"))
        .select(col("name"),
          array_join(col("parsed"), "|").as("vals"),
          size(col("parsed")).as("n"))
        .orderBy(col("name"))
    }),

    // Reference-encoded condition-string codec: ' %^ '-separated fields
    // joined by ' !@#$ ' (/root/reference/camp_vec_rcmn.py:79,103-130),
    // decoded + operator/sentinel-widened into consensus-ready rows.
    "q26_condition_codec" -> ((s, dir) => {
      val raw = s.createDataFrame(Seq(
        ("C1", 85.5, "string %^ c_mktsegment %^ in %^ ['BUILDING','MACHINERY'] !@#$ integer %^ o_totalprice %^ between %^ [100000, 300000]"),
        ("C2", 62.25, "integer %^ o_totalprice %^ greater %^ 250000 !@#$ datePopup %^ o_orderdate %^ less %^ 19970101"),
        ("C3", 40.0, "datePopup %^ o_orderdate %^ between %^ ['19950101','19961231'] !@#$ string %^ o_orderpriority %^ in %^ ['1-URGENT']")
      )).toDF("camp_id", "score", "target_condi")
      ConditionCodec
        .conditionRows(ConditionCodec.decode(raw, "target_condi"), "score")
        .select(col("name"), col("kind"),
          coalesce(col("value"), lit("")).as("value"),
          coalesce(col("lo"), lit("")).as("lo"),
          coalesce(col("hi"), lit("")).as("hi"), col("w"))
        .orderBy(col("name"), col("kind"), col("value"), col("lo"), col("w"))
    }),

    // F15: operator-token scan — split PRMP_STRING on spaces, find the
    // first token in {=, BETWEEN, IN, ::op::}, column name = tokens before
    // it (/root/reference/nl_targeting_save.py:41,52-56).
    "q25_operator_scan" -> ((s, dir) => {
      val df = s.createDataFrame(Seq(
        ("seg_cond", "c_mktsegment = @v"),
        ("price_cond", "o_totalprice BETWEEN @lo @hi"),
        ("prio_cond", "o_orderpriority IN @list"),
        ("custom", "doc n_chars ::op:: kwd"))).toDF("name", "prmp")
      val toks = split(col("prmp"), " ")
      def posOf(op: String) =
        when(array_position(toks, op) === 0, lit(Long.MaxValue))
          .otherwise(array_position(toks, op))
      val j = least(posOf("="), posOf("BETWEEN"), posOf("IN"), posOf("::op::"))
      df.select(col("name"),
          concat_ws(" ", slice(toks, lit(1), (j - 1).cast("int"))).as("column_nm"),
          element_at(toks, j.cast("int")).as("op"))
        .orderBy(col("name"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q23_sweepline_dates" ->
      """WITH conds AS (
        |  SELECT o_orderpriority AS name,
        |    strftime(min(o_orderdate), '%Y%m%d') AS lo_d,
        |    strftime(max(o_orderdate), '%Y%m%d') AS hi_d,
        |    count(*) AS w
        |  FROM orders GROUP BY o_orderpriority, o_orderstatus),
        |ec AS (
        |  SELECT name, epoch(strptime(lo_d, '%Y%m%d'))::BIGINT AS lo,
        |    epoch(strptime(hi_d, '%Y%m%d'))::BIGINT AS hi, w
        |  FROM conds),
        |events AS (
        |  SELECT name, lo AS point, 0 AS tie, w AS delta FROM ec
        |  UNION ALL SELECT name, hi, 1, -w FROM ec),
        |eagg AS (SELECT name, point, tie, sum(delta) AS delta
        |         FROM events GROUP BY name, point, tie),
        |run AS (SELECT name, point, tie,
        |  sum(delta) OVER (PARTITION BY name ORDER BY point, tie
        |    ROWS UNBOUNDED PRECEDING) AS running,
        |  lead(point) OVER (PARTITION BY name ORDER BY point, tie) AS next_point
        |  FROM eagg)
        |SELECT name,
        |  strftime(to_timestamp(point), '%Y%m%d') AS lo_d,
        |  strftime(to_timestamp(next_point), '%Y%m%d') AS hi_d,
        |  CAST(running AS BIGINT) AS score
        |FROM run
        |WHERE next_point IS NOT NULL AND next_point > point AND running > 0
        |ORDER BY name, lo_d""".stripMargin,

    "q24_literal_lists" ->
      """WITH t(name, raw) AS (VALUES
        |  ('segs', '[''BUILDING'',''MACHINERY'']'),
        |  ('range', '[100, 250]'),
        |  ('single', '[''SINGLE'']'),
        |  ('scalar', '42'))
        |SELECT name,
        |  array_to_string(string_split(regexp_replace(raw, '[\[\]'' ]', '', 'g'), ','), '|') AS vals,
        |  len(string_split(regexp_replace(raw, '[\[\]'' ]', '', 'g'), ',')) AS n
        |FROM t ORDER BY name""".stripMargin,

    "q26_condition_codec" ->
      """WITH raw(camp_id, score, target_condi) AS (VALUES
        |  ('C1', 85.5, 'string %^ c_mktsegment %^ in %^ [''BUILDING'',''MACHINERY''] !@#$ integer %^ o_totalprice %^ between %^ [100000, 300000]'),
        |  ('C2', 62.25, 'integer %^ o_totalprice %^ greater %^ 250000 !@#$ datePopup %^ o_orderdate %^ less %^ 19970101'),
        |  ('C3', 40.0, 'datePopup %^ o_orderdate %^ between %^ [''19950101'',''19961231''] !@#$ string %^ o_orderpriority %^ in %^ [''1-URGENT'']')),
        |conds AS (
        |  SELECT camp_id, score, unnest(string_split(target_condi, '!@#$')) AS cond
        |  FROM raw),
        |parts AS (
        |  SELECT camp_id, CAST(score AS DOUBLE) AS score,
        |    trim(string_split(cond, '%^')[1]) AS cond_form,
        |    trim(string_split(cond, '%^')[2]) AS feature,
        |    trim(string_split(cond, '%^')[3]) AS op,
        |    trim(string_split(cond, '%^')[4]) AS value_str
        |  FROM conds),
        |vals AS (
        |  SELECT *, string_split(regexp_replace(value_str, '[\[\]'' ]', '', 'g'), ',') AS v
        |  FROM parts),
        |str_rows AS (
        |  SELECT feature AS name, 'string' AS kind, unnest(v) AS value,
        |    '' AS lo, '' AS hi, score AS w
        |  FROM vals WHERE cond_form = 'string'),
        |int_rows AS (
        |  SELECT feature AS name, 'integer' AS kind, '' AS value,
        |    CASE WHEN op = 'less' THEN '0' ELSE v[1] END AS lo,
        |    CASE WHEN op = 'less' THEN v[1]
        |         WHEN op = 'greater' THEN '9999999999'
        |         ELSE coalesce(v[2], v[1]) END AS hi,
        |    score AS w
        |  FROM vals WHERE cond_form = 'integer'),
        |date_rows AS (
        |  SELECT feature AS name, 'datePopup' AS kind, '' AS value,
        |    CASE WHEN op = 'less' THEN '20200101' ELSE v[1] END AS lo,
        |    CASE WHEN op = 'less' THEN v[1]
        |         WHEN op = 'greater' THEN '20301231'
        |         ELSE coalesce(v[2], v[1]) END AS hi,
        |    score AS w
        |  FROM vals WHERE cond_form = 'datePopup')
        |SELECT * FROM (
        |  SELECT * FROM str_rows UNION ALL SELECT * FROM int_rows
        |  UNION ALL SELECT * FROM date_rows)
        |ORDER BY name, kind, value, lo, w""".stripMargin,

    "q25_operator_scan" ->
      """WITH t(name, prmp) AS (VALUES
        |  ('seg_cond', 'c_mktsegment = @v'),
        |  ('price_cond', 'o_totalprice BETWEEN @lo @hi'),
        |  ('prio_cond', 'o_orderpriority IN @list'),
        |  ('custom', 'doc n_chars ::op:: kwd')),
        |x AS (SELECT name, string_split(prmp, ' ') AS toks FROM t),
        |p AS (SELECT name, toks,
        |  least(
        |    coalesce(nullif(list_position(toks, '='), 0), 9223372036854775807),
        |    coalesce(nullif(list_position(toks, 'BETWEEN'), 0), 9223372036854775807),
        |    coalesce(nullif(list_position(toks, 'IN'), 0), 9223372036854775807),
        |    coalesce(nullif(list_position(toks, '::op::'), 0), 9223372036854775807)) AS j
        |  FROM x)
        |SELECT name, array_to_string(toks[1:j-1], ' ') AS column_nm,
        |  toks[j] AS op
        |FROM p ORDER BY name""".stripMargin
  )
}
