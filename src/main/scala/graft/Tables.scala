package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table registry.
  *
  * The reference reads live MariaDB / MSSQL tables
  * (`/root/reference/camp_vec_save.py:42-45`,
  * `/root/reference/camp_vec_rcmn.py:287-291`); our engine reads columnar
  * Parquet. Multi-DBMS routing by `DBMS_ID`
  * (`/root/reference/nl_targeting_save.py:77-90`) becomes a source registry:
  * every table is just a named DataFrame, wherever it physically lives.
  *
  * Scale note: `spark.read.parquet` yields one task per ~128MB split
  * (`spark.sql.files.maxPartitionBytes`), so these scans parallelize across
  * a real cluster unchanged. Column pruning + predicate pushdown reach the
  * Parquet reader automatically because callers use the DataFrame API.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always broadcast-join these. */
  val dims: Set[String] = Set("region", "nation", "supplier", "part")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a
    // nanos-since-epoch long (spark.sql.legacy.parquet.nanosAsLong=true —
    // set by Verify/Bench/Smoke/tests). Normalize to a micros timestamp so
    // downstream code sees a plain TimestampType column.
    // Integer division: `/` on longs is double division, and nanos
    // (~1.7e18) exceed double's 2^53 exact range — `div` stays exact.
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every fixture as a temp view so `spark.sql` works too
    * (the Spark analog of the reference executing stored SQL text,
    * `/root/reference/nl_targeting_save.py:72-90`). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
