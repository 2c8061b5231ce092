package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only stage profiler (not a driver gate). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    time("docs count")(docs.count())

    val rep = docs.repartition(spark.sparkContext.defaultParallelism)
    val toksOnly = rep.select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
    time("tokens only")(toksOnly.select(sum(size(col("t")))).head())

    val sh = rep.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("g"))
    time("shingles exploded")(sh.count())

    val oneMd5 = sh.select(col("doc_id"), md5(concat(lit("0:"), col("g"))).as("h"))
    time("1 md5 pass")(oneMd5.select(max(col("h"))).head())

    // simhash cost: nested interpreted HOFs (aggregate+zip_with over
    // 60-element arrays per token) vs queries that must stay cheap
    val simq = rep.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
    time("simhash all docs")(simq.select(max(col("sh"))).head())
    time("simhash banded pairs")(
      Dedup.simhashNearDupsBanded(docs, "doc_id", "text",
        maxHamming = 8, bands = 10).count())

    val aggs = (0 until 12).map(s =>
      min(md5(concat(lit(s.toString), lit(":"), col("g")))).as(s"sig_$s"))
    val sigs = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    time("12-perm signatures")(sigs.count())

    // replicate minhashNearDups stage by stage
    val sigsFull = sigs.select(col("doc_id"),
      array((0 until 12).map(s => col(s"sig_$s")): _*).as("sig"))
    val wsets = rep.select(col("doc_id"),
      array_distinct(Dedup.tokens(col("text"))).as("wset"))
    val withSig = sigsFull.join(wsets, "doc_id").cache()
    time("withSig cache")(withSig.count())
    val buckets = Dedup.lshBuckets(withSig, "doc_id", "sig", 4, 3).cache()
    time("buckets")(buckets.count())
    val a = buckets.toDF("id_a", "band", "key")
    val b = buckets.toDF("id_b", "band", "key")
    val cands = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().cache()
    time("cands")(cands.count())
    val verified = cands
      .join(withSig.select(col("doc_id").as("id_a"), col("wset").as("wa")), "id_a")
      .join(withSig.select(col("doc_id").as("id_b"), col("wset").as("wb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(Dedup.jaccard(col("wa"), col("wb")), 4).as("jac"))
      .filter(col("jac") >= 0.6)
    time("verified")(verified.count())
    time("full minhashNearDups")(
      Dedup.minhashNearDups(docs, "doc_id", "text").count())

    // dd_incremental decomposition (r12: the promoted query's 10 s)
    val corpus = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val ix = Dedup.buildCorpusIndex(corpus, "doc_id", "text", 12, 4)
    time("index texts")(ix.texts.count())
    time("index buckets")(ix.buckets.count())
    time("index wsets")(ix.wsets.count())
    val pinned = Dedup.CorpusIndex(ix.texts.localCheckpoint(true),
      ix.buckets.localCheckpoint(true), ix.wsets.localCheckpoint(true))
    time("dedupIncremental vs PINNED index")(
      Dedup.dedupIncremental(pinned, batch, "doc_id", "text",
        12, 4, 0.6).count())
    time("dedupIncremental convenience (lazy index)")(
      Dedup.dedupIncremental(corpus, batch, "doc_id", "text").count())
    spark.stop()
  }
}
