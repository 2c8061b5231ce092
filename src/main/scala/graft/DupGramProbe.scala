package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only A/B for the exactSubstr gram-dictionary pass (r14 advice):
  * single-pass `(hash, gram)` aggregation vs hash-first two-pass, on
  * BOTH duplication regimes — the fixture corpus (dup-moderate) and a
  * near-unique corpus (every token doc-prefixed, so no gram repeats
  * across docs and map-side combine collapses nothing). Prints
  * min-of-3 wall per (variant, regime) plus output parity. */
object DupGramProbe {
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

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    // near-unique regime: prefix every token with its doc id — gram
    // spaces disjoint across docs, duplicated mass ~zero
    val unique = docs.select(col("doc_id"),
      array_join(transform(split(trim(col("text")), "\\s+"),
        t => concat(col("doc_id").cast("string"), lit("_"), t)), " ")
        .as("text"))
      .localCheckpoint(true)

    def best(f: => Long): (Double, Long) = {
      var n = 0L
      val t = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); n = f
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, n)
    }
    Seq(("fixture", docs), ("unique", unique)).foreach { case (reg, d) =>
      // warm
      Dedup.dupGramsOf(d, "text", 50).count()
      Dedup.dupGramsOfHashFirst(d, "text", 50).count()
      val (t1, n1) = best(Dedup.dupGramsOf(d, "text", 50).count())
      val (t2, n2) = best(Dedup.dupGramsOfHashFirst(d, "text", 50).count())
      println(f"[dupgram] regime=$reg single_pass=$t1%.3f s ($n1 grams) " +
        f"hash_first=$t2%.3f s ($n2 grams) parity=${n1 == n2}")
    }
    spark.stop()
  }
}
