package graft

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

  test("parquet sink round-trip (S5): index write + read back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ix = IndexBuild.campaignIndex(spark, TestSpark.sfDir)
    ix.write.mode("overwrite").parquet(s"$dir/camp_summary_vec")
    val back = spark.read.parquet(s"$dir/camp_summary_vec")
    assert(back.count() == ix.count())
    assert(back.schema.fieldNames.toSet == ix.schema.fieldNames.toSet)
  }
}
