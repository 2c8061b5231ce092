package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConditionCodec

class ConditionCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val condi1 =
    "integer %^ o_totalprice %^ between %^ [100, 300] !@#$ string %^ c_mktsegment %^ in %^ ['A','B']"

  private def fields(d: org.apache.spark.sql.DataFrame) =
    d.select("cond_form", "feature", "op", "value_str").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet

  test("decode splits fields and trims like the reference") {
    val d = ConditionCodec.decode(
      Seq(("C1", condi1)).toDF("camp_id", "condi"), "condi")
    assert(fields(d) == Set(
      ("integer", "o_totalprice", "between", "[100, 300]"),
      ("string", "c_mktsegment", "in", "['A','B']")))
  }

  test("encode(decode(x)) round-trips, conditions sorted by feature") {
    val df = Seq(("C1", condi1)).toDF("camp_id", "condi")
    val once = ConditionCodec.decode(df, "condi")
    val re = ConditionCodec.encode(once, "camp_id")
    assert(fields(ConditionCodec.decode(re, "target_condi")) == fields(once))
    // the reference's GROUP_CONCAT ... ORDER BY PRMP_NM
    assert(re.head.getString(1) ==
      "string %^ c_mktsegment %^ in %^ ['A','B'] !@#$ " +
        "integer %^ o_totalprice %^ between %^ [100, 300]")
  }

  test("operator widening against the sentinel domains") {
    val raw = Seq(
      ("C1", 1.0, "integer %^ p %^ greater %^ 500"),
      ("C2", 1.0, "integer %^ p %^ less %^ 500"),
      ("C3", 1.0, "datePopup %^ d %^ greater %^ 19970101"),
      ("C4", 1.0, "datePopup %^ d %^ less %^ 19970101")
    ).toDF("camp_id", "w0", "condi")
    val out = ConditionCodec
      .conditionRows(ConditionCodec.decode(raw, "condi"), "w0")
      .select("name", "lo", "hi").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      ("p", "500", "9999999999"), ("p", "0", "500"),
      ("d", "19970101", "20301231"), ("d", "20200101", "19970101")))
  }
}
