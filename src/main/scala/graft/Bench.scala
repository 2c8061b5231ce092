package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}. A table-scan warmup
  * precedes timing so JVM/JIT startup doesn't land in query 1's number. */
object Bench {

  /** Headline set: one per operator family (scan-agg, join-agg, window,
    * KNN, fusion, full E1, sweep-line, minhash LSH, jaccard pairs,
    * lang-ID, IVF ANN, embed near-dup). */
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_join_agg", "q17_running_window", "q20_sweepline_consensus",
    "knn_topk", "knn_fusion", "q22_recommend_audience",
    "dd_minhash_lsh", "dd_jaccard_pairs", "dd_embed_pairs",
    "tx_langid", "ann_ivf_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    // warmup: touch every table + JIT the read path
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())

    val qs = SparkEntry.queries
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      val ok = try { qs(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
