package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition of rcmn_top5_built_index (not a driver gate):
  * separates the campaign-table relational build, the stub embedding
  * pass, and the KNN+fusion stage so the dominant cost is attributable
  * before optimizing any of them. */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { i =>
      time(s"campaignTable only [$i]")(
        IndexBuild.campaignTable(spark, sfDir).count())
      time(s"campaignIndex (table + embed) [$i]")(
        IndexBuild.campaignIndex(spark, sfDir).count())
      val idx = IndexBuild.campaignIndex(spark, sfDir)
        .select(col("camp_id").as("vec_id"), col("camp_vec").as("embedding"))
        .localCheckpoint(true)
      val expansions = new StubLlm()
        .complete("expand", "봄 시즌 VIP 고객 대상 캠페인").split("!!!!")
      val qs = spark.createDataFrame(expansions.toSeq.zipWithIndex.map {
          case (q, j) => (j.toLong, q)
        }).toDF("qid", "qtext")
        .select(col("qid"), Embeddings.embedCol(col("qtext")).as("qvec"))
      time(s"qs embed+collect [$i]")(qs.count())
      time(s"topKPerQuery on pinned index [$i]")(
        graft.operators.Knn.topKPerQuery(idx, qs,
          graft.operators.CampaignRecommend.K).count())
      time(s"fuse(topK) on pinned index [$i]")(
        graft.operators.Knn.fuse(
          graft.operators.Knn.topKPerQuery(idx, qs,
            graft.operators.CampaignRecommend.K),
          graft.operators.CampaignRecommend.NQueries,
          graft.operators.CampaignRecommend.TopN).count())
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(idx)
      time(s"rcmn_top5_built_index total [$i]")(
        graft.queries.PipelinePack.queries("rcmn_top5_built_index")(
          spark, sfDir).count())
    }
    spark.stop()
  }
}
