package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tableSearch resolves referenced columns to their tables") {
    val m = Catalog.tableSearch(spark, TestSpark.sfDir,
      "SELECT c_mktsegment, o_totalprice FROM x WHERE l_quantity > 1")
    assert(m("c_mktsegment") == "customer")
    assert(m("o_totalprice") == "orders")
    assert(m("l_quantity") == "lineitem")
    assert(!m.contains("nonexistent_col"))
  }

  test("columnSearch finds physical columns by fragment") {
    val hits = Catalog.columnSearch(spark, TestSpark.sfDir, "custkey")
    assert(hits.toSet == Set(("customer", "c_custkey"), ("orders", "o_custkey")))
  }

  test("refineQuery strips comments, semicolons, whitespace") {
    val refined = Catalog.refineQuery(
      "/* header */ SELECT a,\n  b -- trailing\nFROM t ;")
    assert(refined == "SELECT a, b FROM t")
    // refined SQL actually runs
    Tables.registerAll(spark, TestSpark.sfDir)
    val n = spark.sql(Catalog.refineQuery(
      "/* dim scan */ SELECT DISTINCT c_mktsegment FROM customer;")).count()
    assert(n == 5)
  }

  test("columnFromPrmp degradations: no operator, operator at position 1, " +
      "first-operator divergence (F15 regression)") {
    import spark.implicits._
    val got = Seq(
      ("normal", "AND o_totalprice BETWEEN ::op::"),
      // r5 overflow fix: no operator token anywhere — must return the FULL
      // string (reference leaves column_name_base untouched), not throw or
      // wrap to a negative slice length under ANSI.
      ("no_op", "SOMEKEYWORD colname extra"),
      // operator in position 1: tokens[1:0] — empty name, not an error.
      ("op_first", "= trailing tokens"),
      // two operator tokens: the reference's non-breaking loop would keep
      // the LAST ('::op::' → "c_mktsegment ="); we deliberately keep the
      // FIRST ('=' → "c_mktsegment"). Pinned so the divergence is chosen,
      // not drifted into.
      ("two_ops", "AND c_mktsegment = ::op::"))
      .toDF("k", "prmp")
      .select(col("k"), Catalog.columnFromPrmp(col("prmp")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("normal") == "o_totalprice")
    assert(got("no_op") == "SOMEKEYWORD colname extra")
    assert(got("op_first") == "")
    assert(got("two_ops") == "c_mktsegment")
  }

  test("source registry routes named tables by physical source (S1/S2)") {
    val viaRegistry = Tables.loadSource(spark,
      Tables.registry(TestSpark.sfDir)("region"))
    val direct = spark.read.parquet(TestSpark.sfDir + "/region.parquet")
    assert(viaRegistry.collect().toSet == direct.collect().toSet)
    // the JDBC route is the production S1 analog — same reader contract
    // (connection-time behavior is not testable offline)
    val j = Tables.JdbcSource("jdbc:mysql://host/db", "t_campaign",
      partitionColumn = Some("camp_id"))
    assert(j.numPartitions == 32 && j.partitionColumn.contains("camp_id"))
  }

  test("conditionIndexFromMeta builds ONE subplan per distinct routed " +
      "source: plan size is constant in condition count (r9 verdict #5)") {
    def metaWith(n: Int): IndexBuild.ConditionMeta = {
      val ql = spark.createDataFrame(Seq(
        ("Q1", "SELECT c_custkey, c_mktsegment FROM customer")))
        .toDF("qry_id", "qry_meta")
      val qp = spark.createDataFrame((1 to n).map(i =>
        ("Q1", s"c$i", "AND c_mktsegment = ::op::",
          s"""{"label":{"kr":"조건$i"},"input":"select","values":[]}""")))
        .toDF("qry_id", "prmp_kwd", "prmp_string", "prmp_json_info")
      // every condition routes to the SAME stored dimension SQL
      val dl = spark.createDataFrame((1 to n).map(i =>
        (s"c$i", "DS", "QUADMAX_SDZ",
          "SELECT c_mktsegment AS code, c_mktsegment AS code_nm " +
            "FROM customer GROUP BY c_mktsegment ;")))
        .toDF("prmp_kwd", "ml_ds_div_cd", "dbms_id", "ds_sql")
      val hl = spark.createDataFrame(Seq(
        ("ML01", 1, "QUADMAX_SDZ", "SELECT 'X' AS code, 'X' AS code_nm")))
        .toDF("ml_id", "ml_seq", "ml_dbms_id", "ml_qry")
      IndexBuild.ConditionMeta(ql, qp, dl, hl)
    }
    def build(n: Int) =
      IndexBuild.conditionIndexFromMeta(spark, TestSpark.sfDir, metaWith(n))
    val (small, big) = (build(2), build(8))
    // correctness: 5 segments x n conditions x 3 paraphrases
    assert(small.count() == 5 * 2 * 3)
    assert(big.count() == 5 * 8 * 3)
    // scale: the stored-SQL subplan appears ONCE regardless of how many
    // conditions route to it — leaf count (scans) must not grow with n
    def leaves(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collectLeaves().size
    assert(leaves(big) == leaves(small),
      s"plan leaves grew with condition count: ${leaves(small)} -> " +
        s"${leaves(big)} (per-condition subplans are back)")
  }

  test("parquet sink round-trip (S5): index write + read back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ix = IndexBuild.campaignIndex(spark, TestSpark.sfDir)
    ix.write.mode("overwrite").parquet(s"$dir/camp_summary_vec")
    val back = spark.read.parquet(s"$dir/camp_summary_vec")
    assert(back.count() == ix.count())
    assert(back.schema.fieldNames.toSet == ix.schema.fieldNames.toSet)
  }
}
