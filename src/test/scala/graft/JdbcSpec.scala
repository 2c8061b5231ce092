package graft

import java.util.Properties

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Live S1/S2 coverage: the [[Tables.JdbcSource]] registry entry executed
  * against a real (embedded, in-JVM) Derby database — the same
  * `spark.read.format("jdbc")` path a MariaDB/MSSQL deployment takes
  * (`/root/reference/nl_targeting_save.py:77-90`), with zero egress.
  *
  * Identifiers are UPPERCASE because the registry's one-time min/max
  * bound-discovery query interpolates them unquoted (DB-canonical form);
  * Derby, like most DBMSes, folds unquoted identifiers to upper case while
  * Spark's writer CREATEs them quoted.
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:graftdb;create=true"

  /** Fixture rows pushed through the JDBC WRITE path (the S5 batch-INSERT
    * sink against a live DBMS) once per suite. */
  private lazy val seeded: Unit = {
    System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")
    val cust = spark.read.parquet(TestSpark.sfDir + "/customer.parquet")
      .select(col("c_custkey").as("C_CUSTKEY"),
        col("c_name").as("C_NAME"),
        col("c_mktsegment").as("C_MKTSEGMENT"),
        col("c_acctbal").cast("double").as("C_ACCTBAL"))
    cust.write.mode("overwrite").jdbc(url, "CUSTOMER_J", new Properties)
    val region = spark.read.parquet(TestSpark.sfDir + "/region.parquet")
      .select(col("r_regionkey").as("R_REGIONKEY"),
        col("r_name").as("R_NAME"))
    region.write.mode("overwrite").jdbc(url, "REGION_J", new Properties)
  }

  test("partitioned JDBC read: discovered bounds, numPartitions tasks, " +
      "parquet-identical rows (S1)") {
    seeded
    val src = Tables.JdbcSource(url, "CUSTOMER_J",
      partitionColumn = Some("C_CUSTKEY"), numPartitions = 4)
    val df = Tables.loadSource(spark, src)
    // the scan is sharded: one input task per stride of the discovered
    // [min, max] range — the multi-executor contract
    assert(df.rdd.getNumPartitions == 4)
    val parquet = spark.read.parquet(TestSpark.sfDir + "/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal").cast("double"))
    assert(df.count() == parquet.count())
    assert(df.select("C_CUSTKEY", "C_NAME", "C_MKTSEGMENT", "C_ACCTBAL")
      .collect().map(_.toSeq).toSet == parquet.collect().map(_.toSeq).toSet)
  }

  test("explicit bounds via options skip the discovery round-trip " +
      "and lose no rows") {
    seeded
    val src = Tables.JdbcSource(url, "CUSTOMER_J",
      partitionColumn = Some("C_CUSTKEY"), numPartitions = 3,
      options = Map("lowerBound" -> "1", "upperBound" -> "150"))
    val df = Tables.loadSource(spark, src)
    assert(df.rdd.getNumPartitions == 3)
    // stride partitioning is a routing decision, never a filter: rows at
    // and beyond the bounds land in the edge partitions
    assert(df.count() ==
      spark.read.parquet(TestSpark.sfDir + "/customer.parquet").count())
  }

  test("unpartitioned dim read routes through the same registry (S2)") {
    seeded
    val viaJdbc = Tables.loadSource(spark, Tables.JdbcSource(url, "REGION_J"))
    val parquet = spark.read.parquet(TestSpark.sfDir + "/region.parquet")
    assert(viaJdbc.select("R_REGIONKEY", "R_NAME").collect().map(_.toSeq).toSet
      == parquet.select("r_regionkey", "r_name").collect().map(_.toSeq).toSet)
  }

  test("empty table with a partition column: bound discovery returns " +
      "NULLs and the read degrades to a single task, zero rows") {
    seeded
    val cust = spark.read.parquet(TestSpark.sfDir + "/customer.parquet")
      .select(col("c_custkey").as("C_CUSTKEY"))
      .filter(lit(false))
    cust.write.mode("overwrite").jdbc(url, "EMPTY_J", new Properties)
    val df = Tables.loadSource(spark, Tables.JdbcSource(url, "EMPTY_J",
      partitionColumn = Some("C_CUSTKEY"), numPartitions = 4))
    assert(df.count() == 0)
    assert(df.rdd.getNumPartitions == 1)
  }

  test("mixed registry: JDBC fact joins parquet dim identically to " +
      "all-parquet (S2 routing)") {
    seeded
    val sources: Map[String, Tables.Source] = Map(
      "customer" -> Tables.JdbcSource(url, "CUSTOMER_J",
        partitionColumn = Some("C_CUSTKEY"), numPartitions = 4),
      "orders" -> Tables.ParquetSource(TestSpark.sfDir + "/orders.parquet"))
    val cust = Tables.loadSource(spark, sources("customer"))
      .select(col("C_CUSTKEY").as("c_custkey"),
        col("C_MKTSEGMENT").as("c_mktsegment"))
    val orders = Tables.loadSource(spark, sources("orders"))
    val viaJdbc = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val allParquet = orders.join(
        spark.read.parquet(TestSpark.sfDir + "/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaJdbc == allParquet)
  }
}
