package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TemplateSql._

class TemplateSqlSpec extends AnyFunSuite {

  private val template =
    """/* audience query v2
      |   do not edit */
      |SELECT @@SELECT_STRING@@ FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE [ c.c_mktsegment ::op:: seg ] AND [ o.o_totalprice ::op:: price ]
      |  AND [ o.o_orderpriority ::op:: prio ] AND @@EXTRA_FILTER@@""".stripMargin

  test("full instantiation: IN, BETWEEN, comment strip, placeholder cleanup") {
    val sql = compile(template, "o.o_custkey AS cust_id", Map(
      "seg" -> InList(Seq("BUILDING", "MACHINERY")),
      "price" -> Between("1000", "2000")))
    assert(sql ==
      "SELECT o.o_custkey AS cust_id FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
      "WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY') AND o.o_totalprice BETWEEN 1000 AND 2000 " +
      "AND 1=1 AND 1=1")
  }

  test("equal / compare forms and quote escaping") {
    val sql = compile("SELECT @@SELECT_STRING@@ FROM t WHERE [ a ::op:: x ] AND [ b ::op:: y ]",
      "cust_id", Map(
        "x" -> Equal("o'neil"),
        "y" -> Compare(">=", "42")))
    assert(sql == "SELECT cust_id FROM t WHERE a = 'o''neil' AND b >= 42")
  }

  test("MySQL-literal LIKE '[AI]%' brackets survive compilation (P5 dialect)") {
    val sql = compile(
      "SELECT @@SELECT_STRING@@ FROM t WHERE nm LIKE '[AI]%' AND [ seg ::op:: s ]",
      "id", Map("s" -> Equal("BUILDING")))
    assert(sql == "SELECT id FROM t WHERE nm LIKE '[AI]%' AND seg = 'BUILDING'")
    // and an unused parameter block still collapses
    val sql2 = compile(
      "SELECT @@SELECT_STRING@@ FROM t WHERE nm LIKE '[AI]%' AND [ seg ::op:: s ]",
      "id", Map.empty)
    assert(sql2 == "SELECT id FROM t WHERE nm LIKE '[AI]%' AND 1=1")
  }

  test("compiled SQL actually runs on Spark views (E1 tail)") {
    val spark = TestSpark.spark
    Tables.registerAll(spark, TestSpark.sfDir)
    val sql = compile(
      """SELECT @@SELECT_STRING@@ FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE [ c_mktsegment ::op:: seg ] AND [ o_totalprice ::op:: price ]""".stripMargin,
      "o_custkey AS cust_id",
      Map("seg" -> InList(Seq("BUILDING")), "price" -> Compare(">", "100000")))
    val n = graft.operators.Audience.fromCompiledSql(spark, Seq(sql))
      .head.getLong(0)
    val expect = spark.sql(
      """SELECT count(DISTINCT o_custkey) FROM orders JOIN customer
        |ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_totalprice > 100000""".stripMargin)
      .head.getLong(0)
    assert(n == expect && n > 0)
  }
}
