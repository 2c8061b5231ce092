package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[graft.queries]] packs; this object is the aggregation
  * point the driver calls. */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalPack,
    VectorSearchPack,
    PipelinePack,
    DedupTextPack,
    AnnPack,
    RetrievalPack,
    ParsingPack,
    MultimodalPack,
    MaintenancePack,
    GraphPack
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full E1 pipeline: expansions → KNN → fusion → conditions →
    * consensus → audience count (`/root/reference/camp_vec_rcmn.py`). */
  def entry(spark: SparkSession): DataFrame = {
    Graft.init(spark)
    graft.operators.CampaignRecommend.audienceCount(
      spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
