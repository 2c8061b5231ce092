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

  /** Physical source of a table — the Spark form of the reference's
    * `DBMS_ID` routing (`/root/reference/nl_targeting_save.py:77-90`):
    * the registry decides WHERE a named table lives; readers don't care. */
  sealed trait Source
  final case class ParquetSource(path: String) extends Source
  /** Production analog of S1/S2 (MariaDB/MSSQL scans): partitioned JDBC
    * reads. `partitionColumn`+`numPartitions` shard the scan across
    * executors — without them a JDBC read is one task, which at 100TB-side
    * dimensions is fine but for facts is the classic single-reader trap. */
  final case class JdbcSource(url: String, table: String,
      partitionColumn: Option[String] = None, numPartitions: Int = 32,
      options: Map[String, String] = Map.empty) extends Source

  def loadSource(spark: SparkSession, src: Source): DataFrame = src match {
    case ParquetSource(path) => spark.read.parquet(path)
    case JdbcSource(url, table, partCol, nParts, opts) =>
      val r = spark.read.format("jdbc")
        .option("url", url).option("dbtable", table).options(opts)
      partCol.fold(r.load()) { c =>
        // Spark's JDBC reader requires all four of partitionColumn /
        // numPartitions / lowerBound / upperBound. Callers may pass bounds
        // via options; otherwise discover them with the one-time min/max
        // round-trip (runs DB-side, returns a single row).
        val (lo, hi) =
          if (opts.contains("lowerBound") && opts.contains("upperBound"))
            (opts("lowerBound"), opts("upperBound"))
          else {
            val row = spark.read.format("jdbc").option("url", url)
              .options(opts - "lowerBound" - "upperBound")
              .option("query", s"SELECT MIN($c) AS lo, MAX($c) AS hi FROM $table")
              .load().head()
            (String.valueOf(row.get(0)), String.valueOf(row.get(1)))
          }
        if (lo == "null" || hi == "null") r.load() // empty table: one task
        else r.option("partitionColumn", c).option("numPartitions", nParts)
          .option("lowerBound", lo).option("upperBound", hi).load()
      }
  }

  /** Default registry: every fixture table as parquet under `sfDir`. A
    * deployment pointing some names at [[JdbcSource]] changes nothing
    * downstream — that is the S2 multi-DBMS routing re-expressed. */
  def registry(sfDir: String): Map[String, Source] =
    all.map(n => n -> (ParquetSource(s"$sfDir/$n.parquet"): Source)).toMap

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = loadSource(spark, registry(sfDir)(name))
    // Normalize events.ts to a plain TimestampType column whatever the
    // fixture's physical type is — the generator has shipped it both ways:
    //  - TIMESTAMP(NANOS): Spark only reads it as a nanos-since-epoch long
    //    (spark.sql.legacy.parquet.nanosAsLong=true — set by
    //    Verify/Bench/Smoke/tests). Integer division: `/` on longs is
    //    double division, and nanos (~1.7e18) exceed double's 2^53 exact
    //    range — `div` stays exact.
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): read as TIMESTAMP_NTZ;
    //    a cast under the fixed UTC session timezone keeps the wall-clock
    //    value and gives downstream code the same TimestampType.
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => df
        case _ => df.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else df
  }

  /** Register every fixture as a temp view so `spark.sql` works too
    * (the Spark analog of the reference executing stored SQL text,
    * `/root/reference/nl_targeting_save.py:72-90`). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
