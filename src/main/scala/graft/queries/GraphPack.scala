package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Graph-centrality queries over the customer–supplier bipartite graph
  * (an order line is an edge between its customer and its supplier) —
  * the link-analysis quality/affinity signals a curation pipeline
  * derives from reference structure. Both queries are the
  * unrolled-iteration oracle convention (BPE/MMR precedent): every
  * PageRank round is a chained CTE, so one divergent sum anywhere
  * breaks the hash. */
object GraphPack extends QueryPack {

  /** Distinct (customer, supplier) edges with type-TAGGED LONG node ids
    * (customer `2k`, supplier `2k+1` — longs shuffle/hash/compare ~2-3×
    * cheaper than string-prefixed ids, the encoding a 100 TB graph job
    * would use) — distinct AND orientation-disjoint (the tag bit), so
    * pagerank's symmetrize-dedup shuffle is skipped
    * (`distinctDirected`). */
  private def edges(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Global PageRank, 3 unrolled iterations, top-20 nodes: the
    // centrality weighting of the reference graph (adjacency
    // partitioned once and reused; per-round shuffles are |V|-sized).
    "q44_pagerank" -> ((s, dir) =>
      Graph.pagerank(edges(s, dir), iters = 3, distinctDirected = true)
        .orderBy(desc("rank"), asc("node")).limit(20)),

    // Personalized PageRank: teleport pinned to nation-3's customers,
    // read out the top-20 SUPPLIER nodes — seed-set expansion
    // ("suppliers affine to these customers"), the graph form of the
    // reference's audience-expansion recommendation.
    "q45_ppr_expand" -> ((s, dir) => {
      val seed = Tables.load(s, dir, "customer")
        .filter(col("c_nationkey") === 3)
        .select((col("c_custkey") * 2).as("node"))
      Graph.pagerank(edges(s, dir), iters = 3, seed = Some(seed),
          distinctDirected = true)
        .filter(col("node") % 2 === 1) // supplier nodes carry the tag bit
        .orderBy(desc("rank"), asc("node")).limit(20)
    })
  )

  /** Shared oracle CTE prefix: edge derivation, symmetrization,
    * degrees, |V|. */
  private val graphCtes: String =
    """WITH pairs AS (
      |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |sym AS (
      |  SELECT src, dst FROM pairs
      |  UNION
      |  SELECT dst AS src, src AS dst FROM pairs),
      |deg AS (SELECT src, count(*) AS outdeg FROM sym GROUP BY src),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg)""".stripMargin

  /** One PageRank round as two CTEs: scaled-integer-summed
    * contributions, then `(1 - 0.85)·reset + 0.85·s` — the literal
    * forms mirror the Spark expressions operation for operation (NOT
    * `0.15`, which is a different double than `1 - 0.85`; `floor`
    * scaling, NOT a decimal cast, whose tie rounding is
    * engine-dependent at the final digit). */
  private def round(i: Int): String =
    s"""s$i AS (
       |  SELECT e.dst AS node,
       |    CAST(sum(CAST(floor(r.rank / d.outdeg * 1e15) AS BIGINT))
       |      AS DOUBLE) / 1e15 AS s
       |  FROM sym e
       |  JOIN r${i - 1} r ON e.src = r.node
       |  JOIN deg d ON e.src = d.src
       |  GROUP BY e.dst),
       |r$i AS (
       |  SELECT t.node,
       |    (1 - CAST(0.85 AS DOUBLE)) * t.reset +
       |      CAST(0.85 AS DOUBLE) * coalesce(s.s, CAST(0 AS DOUBLE))
       |      AS rank
       |  FROM reset t LEFT JOIN s$i s ON t.node = s.node)""".stripMargin

  override def oracle: Map[String, String] = Map(

    "q44_pagerank" -> (graphCtes + ",\n" +
      """reset AS (
        |  SELECT src AS node, CAST(1 AS DOUBLE) / n AS reset
        |  FROM deg, nn),
        |r0 AS (SELECT node, reset AS rank FROM reset),""".stripMargin +
      "\n" + round(1) + ",\n" + round(2) + ",\n" + round(3) + "\n" +
      """SELECT node, rank FROM r3
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin),

    "q45_ppr_expand" -> (graphCtes + ",\n" +
      """seed AS (
        |  SELECT DISTINCT c_custkey * 2 AS node
        |  FROM customer WHERE c_nationkey = 3),
        |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM seed),
        |reset AS (
        |  SELECT d.src AS node,
        |    CASE WHEN s.node IS NULL THEN CAST(0 AS DOUBLE)
        |         ELSE CAST(1 AS DOUBLE) / k END AS reset
        |  FROM deg d LEFT JOIN seed s ON d.src = s.node, kk),
        |r0 AS (SELECT node, reset AS rank FROM reset),""".stripMargin +
      "\n" + round(1) + ",\n" + round(2) + ",\n" + round(3) + "\n" +
      """SELECT node, rank FROM r3
        |WHERE node % 2 = 1
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin)
  )
}
