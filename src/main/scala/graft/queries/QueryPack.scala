package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-verifiable queries.
  *
  * Each entry in [[queries]] is a Spark pipeline `(session, sfDir) => df`;
  * each entry in [[oracle]] is the equivalent ANSI SQL the driver runs in
  * DuckDB on the same parquet tables. Column names/aliases MUST match
  * between the two (the driver sorts columns by name before hashing).
  * Queries with no DuckDB-expressible oracle simply omit the oracle entry
  * (driver falls back to a rows-only check).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
