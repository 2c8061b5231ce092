package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition of q44_pagerank's wall time (not a driver
  * gate): times the edge derivation, the graph-side materializations,
  * and the unrolled-round chain separately, twice each, so fixed
  * overhead (codegen, AQE scheduling) separates from data cost. */
object GraphProbe {
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

    def edges = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

    val mode = sys.env.getOrElse("SPARK_GRAFT_GRAPH_PROBE", "decompose")
    if (mode == "bench") {
      // bench-harness mimic: teardown + q1-shaped canary between runs,
      // exactly like Bench — isolates whether the harness itself (and
      // not session/box state) doubles q44's steady state
      def q44 = graft.queries.GraphPack.queries("q44_pagerank")(spark, sfDir)
      q44.count() // warm
      val steps = sys.env.getOrElse("SPARK_GRAFT_TEARDOWN_STEPS", "cug")
      (1 to 4).foreach { i =>
        if (steps.contains('c')) spark.catalog.clearCache()
        if (steps.contains('u'))
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        if (steps.contains('g')) System.gc()
        time(s"q44 bench-style steps=$steps [$i]")(q44.count())
      }
    } else (1 to 2).foreach { i =>
      time(s"edges distinct count [$i]")(edges.count())
      time(s"pagerank 3 iters total [$i]")(
        graft.operators.Graph.pagerank(edges, iters = 3,
          distinctDirected = true).count())
      time(s"pagerank 1 iter total [$i]")(
        graft.operators.Graph.pagerank(edges, iters = 1,
          distinctDirected = true).count())
      // rounds-only: pre-pin the edge list so the graph-side cost is
      // isolated from the relational derivation
      val pinned = edges.localCheckpoint(true)
      time(s"pagerank 3 iters on pinned edges [$i]")(
        graft.operators.Graph.pagerank(pinned, iters = 3,
          distinctDirected = true).count())
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(pinned)
      // r20: edge-derivation variants — where does its ~1.4 s go?
      val np = spark.sparkContext.defaultParallelism
      def lod(n: String) = Tables.load(spark, sfDir, n)
      time(s"edges spread-lineitem [$i]")(
        lod("orders").join(
            lod("lineitem").repartition(np),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct().count())
      time(s"lineitem scan only [$i]")(
        lod("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          .agg(count(lit(1))).head())
      time(s"join no distinct [$i]")(
        lod("orders").join(lod("lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .agg(count(lit(1))).head())
    }
    spark.stop()
  }
}
