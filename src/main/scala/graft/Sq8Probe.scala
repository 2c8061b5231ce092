package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Knn}

/** Dev-only decomposition of ann_sq8_topk's wall time (single-query
  * form reads ~2.5 s while the 5-query batch reads ~0.9 s — find the
  * stage that differs). */
object Sq8Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding").as("qvec"))
    def t(name: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"[sq8probe] $name%-28s ${best._1}%.3f s (${best._2} rows)")
    }
    // warm
    e.count(); q.count()
    t("exactSingle (Knn.topK)") {
      Knn.topK(e, q.select(col("qvec")), k = 10).count() }
    t("quantize only") { Ann.quantizeSq8(e).count() }
    val quantized = Ann.quantizeSq8(e)
    t("coarse TakeOrdered") {
      quantized.crossJoin(broadcast(q.select(col("qvec"))))
        .select(col("vec_id"),
          Ann.sq8Cosine(col("q8"), col("scale"), col("qvec")).as("qsim"))
        .orderBy(col("qsim").desc, col("vec_id")).limit(40).count() }
    t("coarse groupedTopK") {
      Knn.groupedTopK(
        quantized.crossJoin(broadcast(
            q.select(col("qid"), col("qvec"))))
          .select(col("qid"), col("vec_id"),
            Ann.sq8Cosine(col("q8"), col("scale"), col("qvec")).as("qsim")),
        40, "vec_id", "qsim").count() }
    t("searchSq8 full") {
      Ann.searchSq8(e, Ann.quantizeSq8(e), q.select(col("qvec")),
        k = 10, overfetch = 4).count() }
    t("searchSq8Batch 1q") {
      Ann.searchSq8Batch(e, Ann.quantizeSq8(e), q, k = 10,
        overfetch = 4).count() }
    t("crossJoin no expr") {
      quantized.crossJoin(broadcast(q.select(col("qvec"))))
        .select(col("vec_id")).count() }
    t("coarse w/ HOF cosine") {
      quantized.crossJoin(broadcast(q.select(col("qvec"))))
        .select(col("vec_id"),
          Graft.cosine(Ann.dequantizeSq8(col("q8"), col("scale")),
            col("qvec")).as("qsim"))
        .orderBy(col("qsim").desc, col("vec_id")).limit(40).count() }
    t("coarse on PINNED quantized") {
      val qz = Ann.quantizeSq8(e).localCheckpoint(true)
      val n = qz.crossJoin(broadcast(q.select(col("qvec"))))
        .select(col("vec_id"),
          Ann.sq8Cosine(col("q8"), col("scale"), col("qvec")).as("qsim"))
        .orderBy(col("qsim").desc, col("vec_id")).limit(40).count()
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(qz)
      n }
    t("expr only, no order") {
      quantized.crossJoin(broadcast(q.select(col("qvec"))))
        .select(Ann.sq8Cosine(col("q8"), col("scale"), col("qvec"))
          .as("qsim"))
        .agg(sum(col("qsim"))).count() }
    t("read q8 only, no expr") {
      quantized.crossJoin(broadcast(q.select(col("qvec"))))
        .select(size(col("q8")).as("n")).agg(sum(col("n"))).count() }
    // same DataFrame instance, two consecutive counts — separates
    // plan/codegen setup from steady-state execution
    val df1 = quantized.crossJoin(broadcast(q.select(col("qvec"))))
      .select(col("vec_id"),
        Ann.sq8Cosine(col("q8"), col("scale"), col("qvec")).as("qsim"))
      .orderBy(col("qsim").desc, col("vec_id")).limit(40)
    val ta = System.nanoTime(); df1.count()
    val tb = System.nanoTime(); df1.count()
    val tc = System.nanoTime()
    println(f"[sq8probe] same-df 1st ${(tb - ta) / 1e9}%.3f s, " +
      f"2nd ${(tc - tb) / 1e9}%.3f s")
    println("[sq8probe] slow plan:\n" + df1.queryExecution.executedPlan)
    t("exact topK limit 40") {
      Knn.topK(e, q.select(col("qvec")), k = 40).count() }
    val df2 = Knn.topK(e, q.select(col("qvec")), k = 40)
    df2.count()
    println("[sq8probe] fast plan:\n" + df2.queryExecution.executedPlan)
    spark.stop()
  }
}
