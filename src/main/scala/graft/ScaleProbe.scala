package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic 10× scale probe for the ITERATIVE paths (r9 verdict #7):
  * the two fixed-overhead suspects — connected-components rounds in the
  * dedup capstone and the k-means fits in the learned IVF-PQ build —
  * need a measured point above sf0.1 to show their round overhead
  * amortizes (sub-linear wall growth) instead of compounding.
  *
  * The probe explodes the sf0.1 fixtures ×`factor` IN MEMORY with
  * content perturbed per copy (docs get a per-copy suffix token so the
  * near-dup structure replicates instead of going quadratic across
  * copies; embeddings get a per-copy component offset so centroids
  * spread), times each path at 1× and at `factor`×, and prints one JSON
  * line per probe: {"probe":…,"base_sec":…,"scaled_sec":…,"factor":…,
  * "ratio":…}. ratio ≪ factor ⇒ the fixed per-round/job overhead
  * dominates at sf0.1 and amortizes with data — the scale story the
  * bench alone cannot show. Results land in `scale_probe.json` at the
  * repo root (same pathing rules as Bench).
  */
object ScaleProbe {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Union of `factor` perturbed copies, ids offset per copy. */
  private def explodeDocs(d: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      d.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("lang"),
        concat(col("text"), lit(s" probecopy$i")).as("text"))
    }.reduce(_ unionByName _)

  private def explodeEmb(e: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      e.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, j) => when(j === 0, x + lit(i * 0.01f)).otherwise(x))
          .as("embedding"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val emb = Tables.load(spark, sfDir, "embeddings")
    // materialize the exploded inputs OUTSIDE the timed region — the
    // probe measures the operators, not the synthetic explode
    val docsX = explodeDocs(docs, factor).localCheckpoint(true)
    val embX = explodeEmb(emb, factor).localCheckpoint(true)
    val docs1 = explodeDocs(docs, 1).localCheckpoint(true)
    val emb1 = explodeEmb(emb, 1).localCheckpoint(true)

    import graft.operators.{Ann, Dedup}
    def ivfpqBuild(e: DataFrame): Unit = {
      val (_, index, _) = Ann.buildIvfPq(e, numCentroids = 32,
        m = 16, ksub = 32,
        coarse = Ann.buildIvfKMeans(_, _, _, _, maxIter = 5),
        codebook = Ann.buildPqCodebookLloyd(_, _, _, _, _, maxIter = 5))
      index.count()
    }
    val probes: Seq[(String, DataFrame => Unit)] = Seq(
      ("dd_corpus", (d: DataFrame) =>
        Dedup.dedupCorpus(d, "doc_id", "text",
          k = 12, bands = 4, minJ = 0.6).count(): Unit),
      ("tx_corpus_ready", (d: DataFrame) =>
        graft.queries.DedupTextPack.corpusReady(spark, d).count(): Unit),
      ("ann_ivfpq_kmeans_build", (e: DataFrame) => ivfpqBuild(e)),
      // scan-shaped newcomers: expected ~linear in data (no iterative
      // fixed overhead) — the probe pins that the batch forms' wall is
      // data-proportional, not query-set-proportional
      ("ann_bq_batch_topk", (e: DataFrame) => {
        val qs = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Ann.searchBqBatch(e, Ann.binarize(e), qs, k = 10, overfetch = 8)
          .count(): Unit
      }),
      ("tx_bm25_batch_topk", (d: DataFrame) => {
        val qt = graft.operators.Retrieval.seedTermsBatch(
          d, "doc_id", "text", seedIds = Seq(0L, 1L, 2L), n = 4)
        graft.operators.Retrieval.bm25BatchTopK(d, qt, k = 10)
          .count(): Unit
      }),
      // iterated-join newcomer: 3 unrolled PageRank rounds over a
      // synthetic doc→bucket bipartite graph (997 fixed hub buckets, so
      // the 10x corpus grows hub degrees 10x — the skew shape a real
      // reference graph has); per-round cost is the |V|-shuffle + the
      // adjacency join, so the ratio pins that round overhead stays
      // data-proportional, not round-count-blown
      ("q44_pagerank", (d: DataFrame) => {
        val e = d.select(concat(lit("d"), col("doc_id")).as("src"),
          concat(lit("b"), pmod(col("doc_id"), lit(997L))).as("dst"))
        graft.operators.Graph.pagerank(e, iters = 3).count(): Unit
      }),
      ("tx_chunk_retrieve", (d: DataFrame) => {
        val terms = graft.operators.Retrieval.seedTerms(
          d, "doc_id", "text", seedId = 0L, n = 4)
        val ch = graft.operators.Retrieval.chunkDocs(
          d, "doc_id", "text", chunkTokens = 30, stride = 20)
        graft.operators.Retrieval.bm25Scores(
            ch.select(col("chunk_id"), col("text")), terms,
            idCol = "chunk_id")
          .withColumn("doc_id", floor(col("chunk_id") / 1000).cast("long"))
          .groupBy(col("doc_id")).agg(max(col("score")).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(10)
          .count(): Unit
      }))

    // min-of-N per point: this box shows intermittent multi-second
    // scheduler stalls (the bench adjudicates them away with bracketing
    // canaries); a single timed run here produced a 35× dd_corpus
    // "ratio" and a base slower than its own 10× run. The MINIMUM is the
    // stall-robust statistic for a scaling ratio.
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    def best(f: => Unit): Double =
      (1 to reps).map { _ => System.gc(); time(f) }.min
    val results = probes.map { case (name, f) =>
      val (base, scaled) =
        if (name.startsWith("ann")) (emb1, embX) else (docs1, docsX)
      f(base) // warm the operator path once (codegen/JIT)
      val b = best(f(base))
      val x = best(f(scaled))
      val line = f"""{"probe":"$name","base_sec":$b%.3f,""" +
        f""""scaled_sec":$x%.3f,"factor":$factor,"ratio":${x / b}%.2f}"""
      println(line)
      line
    }
    val out = "[" + results.mkString(",") + "]"
    def repoRoot(p: java.nio.file.Path): java.nio.file.Path =
      if (p == null) java.nio.file.Paths.get(sys.props("user.dir"))
      else if (java.nio.file.Files.exists(p.resolve("build.sbt"))) p
      else repoRoot(p.getParent)
    val path = repoRoot(java.nio.file.Paths.get(sys.props("user.dir"))
      .toAbsolutePath).resolve("scale_probe.json")
    java.nio.file.Files.write(path, (out + "\n").getBytes("UTF-8"))
    System.err.println(s"[scale-probe] wrote $path")
    spark.stop()
  }
}
