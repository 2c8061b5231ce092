package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only strategy comparison for jaccardPairs (not a driver gate):
  * times cooccur vs prefix on the fixture corpus and on a synthetic
  * Zipfian large-vocab corpus, and prints the df-skew stats an auto
  * selector could use. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    def stats(docs: org.apache.spark.sql.DataFrame, idCol: String,
        textCol: String, blockCol: String): Unit = {
      val words = docs.select(col(blockCol).as("block"),
          explode(array_distinct(Dedup.tokens(col(textCol)))).as("word"))
      val df = words.groupBy("block", "word").count()
      val r = df.agg(
        sum(col("count") * col("count")).as("sum_df2"),
        sum(col("count")).as("tot_words"),
        count(lit(1)).as("n_block_words")).head()
      val nDocs = docs.count()
      val kappa = r.getLong(2).toDouble * r.getLong(0) /
        (r.getLong(1).toDouble * r.getLong(1))
      println(s"[probe]   nDocs=$nDocs volume(sum_df2)=${r.getLong(0)} " +
        s"tot_words=${r.getLong(1)} distinct(block,word)=${r.getLong(2)} " +
        f"joinFan=${r.getLong(0).toDouble / r.getLong(1)}%.1f " +
        f"vocabRatio=${r.getLong(2).toDouble / nDocs}%.3f kappa=$kappa%.1f " +
        s"autoRoutes=${if (r.getLong(0) > graft.operators.Dedup.DefaultCooccurBudget) "prefix" else "cooccur"}")
    }

    // fixture corpus
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()
    println("[probe] === fixture documents ===")
    stats(docs, "doc_id", "text", "lang")
    (1 to 3).foreach { i =>
      time(s"fixture cooccur $i")(Dedup.jaccardPairs(
        docs, "doc_id", "text", "lang", 0.95, "cooccur").count())
      time(s"fixture prefix  $i")(Dedup.jaccardPairs(
        docs, "doc_id", "text", "lang", 0.95, "prefix").count())
    }

    // synthetic Zipfian corpus: 4000 docs, ~40 tokens each, vocab 20000
    // with df ~ 1/rank (a few very hot words + a long rare tail), plus
    // planted near-dups (pairs sharing 95% of tokens).
    val zipf = spark.range(4000).select(col("id").as("doc_id"),
        lit("z").as("lang"),
        concat_ws(" ", (0 until 40).map { j =>
          // rank ~ Zipf via inverse-CDF on a deterministic hash u in (0,1):
          // rank = floor(V^u) spreads mass 1/rank over V=20000 ranks
          concat(lit("w"), floor(pow(lit(20000.0),
            pmod(xxhash64(col("id") * 1000 + j), lit(10000L)).cast("double") / 10000.0))
            .cast("long"))
        }: _*).as("text"))
      .union(spark.range(200).select((col("id") + 10000).as("doc_id"),
        lit("z").as("lang"),
        concat_ws(" ", (0 until 40).map { j =>
          concat(lit("w"), floor(pow(lit(20000.0),
            pmod(xxhash64((col("id") % 100) * 1000 + j), lit(10000L)).cast("double") / 10000.0))
            .cast("long"))
        }: _*).as("text")))
    zipf.cache().count()
    println("[probe] === synthetic Zipfian ===")
    stats(zipf, "doc_id", "text", "lang")
    (1 to 3).foreach { i =>
      time(s"zipf cooccur $i")(Dedup.jaccardPairs(
        zipf, "doc_id", "text", "lang", 0.8, "cooccur").count())
      time(s"zipf prefix  $i")(Dedup.jaccardPairs(
        zipf, "doc_id", "text", "lang", 0.8, "prefix").count())
    }
    spark.stop()
  }
}
