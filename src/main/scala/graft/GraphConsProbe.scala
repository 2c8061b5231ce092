package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the tx_graph_consolidate composition —
  * attributes its wall time to fixture construction, the soft-redirect
  * parse, the closure loop, the consolidation joins, and the anchor
  * aggregation (not a driver gate; the r20 40→6 s diagnosis tool). */
object GraphConsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
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

    import graft.operators.Web
    (1 to 2).foreach { round =>
      println(s"[probe] ---- round $round ----")
      def variants(kCol: org.apache.spark.sql.Column) = {
        val kS = kCol.cast("string")
        val hk = pmod(kCol, lit(4)).cast("string")
        (concat(lit("https://site"), hk, lit(".com/art/"), kS),
          concat(lit("https://old"), hk, lit(".com/r/"), kS),
          concat(lit("https://older.com/rr/"), kS),
          concat(lit("https://m.site"), hk, lit(".com/art/"), kS, lit("m")),
          concat(lit("https://amp.site"), hk, lit(".com/amp/"), kS),
          concat(lit("https://go"), hk, lit(".com/f/"), kS))
      }
      val docs = Tables.load(spark, sfDir, "documents")
      val fam = docs.select(pmod(col("doc_id"), lit(25)).as("k")).distinct()
      val (fm, fr1, fr2, fd, fa, ff) = variants(col("k"))
      val cyc = pmod(col("k"), lit(10)) === 7
      val redirects = fam.select(explode(array(
          struct(fr1.as("src"), when(cyc, fr2).otherwise(fm).as("dst")),
          struct(fr2.as("src"), fr1.as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val refreshPages = time("refreshPages ckpt")(fam.select(ff.as("page"),
        concat(
          lit("<html><head><meta http-equiv=\"refresh\" " +
            "content=\"0; url="), fr1,
          lit("\"></head><body>moved</body></html>")).as("html"))
        .localCheckpoint(true))
      val softRedirects = time("metaRefreshRedirects build")(
        Web.metaRefreshRedirects(refreshPages, "page", "html"))
      val softCk = time("softRedirects ckpt")(
        softRedirects.localCheckpoint(true))
      val canonPages = fam.select(explode(array(
          struct(fd.as("url"), fm.as("canon_url")),
          struct(fa.as("url"), fd.as("canon_url")))).as("p"))
        .select(col("p.url").as("url"), col("p.canon_url").as("canon_url"))
      val (em, er1, er2, ed, ea, ef) = variants(pmod(col("doc_id"), lit(25)))
      val w = pmod(floor(col("doc_id") / lit(25)).cast("long"), lit(6))
      val edges = docs.select(col("doc_id"),
        when(w === 0, em).when(w === 1, er1).when(w === 2, er2)
          .when(w === 3, ed).when(w === 4, ea).otherwise(ef).as("dst"),
        element_at(array(lit("main link"), lit("old link"),
          lit("older link"), lit("mobile link"), lit("amp link"),
          lit("refresh link")),
          w.cast("int") + 1).as("anchor"))
      val consolidated = time("consolidateEdges (closures run here)")(
        Web.consolidateEdges(edges, "dst",
          redirects.unionByName(softCk), canonPages)
          .localCheckpoint(true))
      val ac = time("anchorCorpus build")(
        Web.anchorCorpus(consolidated).orderBy(col("dst")))
      time("count()")(ac.count())
    }
    spark.stop()
  }
}
