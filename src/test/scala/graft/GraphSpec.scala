package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank as iterated joins: agreement with a plain-Scala reference
  * power iteration, mass conservation, bit-exact partitioning
  * invariance (the scaled-integer sum contract), and personalized
  * teleport localization. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Small deterministic graph: a 6-node path + a triangle + a hub. */
  private val edgeList: Seq[(String, String)] = Seq(
    "a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "e" -> "f",
    "x" -> "y", "y" -> "z", "z" -> "x",
    "h" -> "a", "h" -> "c", "h" -> "e", "h" -> "x")

  private def edges() = edgeList.toDF("src", "dst")

  /** Plain-Scala reference: same symmetrize/dedup, same floor-scaled
    * contribution sums, same update rule. */
  private def referencePagerank(iters: Int, damping: Double = 0.85,
      seed: Option[Set[String]] = None): Map[String, Double] = {
    val sym = (edgeList ++ edgeList.map(_.swap)).distinct
    val out = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = out.keySet.toSeq.sorted
    val reset: Map[String, Double] = seed match {
      case None => nodes.map(_ -> 1.0 / nodes.size).toMap
      case Some(ss) =>
        val k = ss.size
        nodes.map(n => n -> (if (ss(n)) 1.0 / k else 0.0)).toMap
    }
    var r = reset
    for (_ <- 1 to iters) {
      val sums = sym.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) =>
          math.floor(r(src) / out(src) * 1e15).toLong
        }.sum
      }
      r = nodes.map { n =>
        n -> ((1.0 - damping) * reset(n) +
          damping * (sums.getOrElse(n, 0L).toDouble / 1e15))
      }.toMap
    }
    r
  }

  private def run(seed: Option[Seq[String]] = None, parts: Int = 4) = {
    val e = edges().repartition(parts)
    Graph.pagerank(e, iters = 3,
        seed = seed.map(_.toDF("node")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("3-iteration pagerank equals the plain-Scala power iteration " +
      "bit for bit") {
    val got = run()
    val want = referencePagerank(3)
    assert(got.keySet == want.keySet)
    got.foreach { case (n, v) =>
      assert(v == want(n), s"node $n: $v vs ${want(n)}")
    }
  }

  test("rank mass is conserved (no dangling leakage) and the hub " +
      "outranks the path tail") {
    val got = run()
    assert(math.abs(got.values.sum - 1.0) < 1e-9,
      s"mass ${got.values.sum}")
    assert(got("h") > got("f"), s"hub ${got("h")} vs tail ${got("f")}")
  }

  test("result is partitioning-invariant bit for bit (scaled-integer " +
      "sums make the fold associative)") {
    assert(run(parts = 1) == run(parts = 7))
  }

  test("distinctDirected fast path equals the general symmetrize-dedup " +
      "path on a distinct, orientation-disjoint edge list") {
    val fast = Graph.pagerank(edges(), iters = 3, distinctDirected = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fast == run())
  }

  test("iteration plan: the persisted adjacency feeds the join straight " +
      "from the cache — no fresh Exchange above the InMemoryTableScan") {
    val e = edges()
    val shuffle = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sym = e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val adj = sym.join(deg, "src").repartition(shuffle, col("src")).persist()
    try {
      adj.count()
      val ranks = deg.select(col("src").as("node"), lit(0.1).as("rank"))
      val one = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst").as("node"),
          floor(col("rank") / col("outdeg") * lit(1e15)).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      one.collect()
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), s"no cache scan:\n$plan")
      // the cached adjacency must not be re-shuffled on its key: in the
      // FINAL plan (everything above the InMemoryRelation's stored build
      // lineage) no shuffle Exchange re-partitions src — the cache's
      // partitioning (or a broadcast of it, at this toy size) feeds the
      // join as-is; the only shuffles allowed sit on the ranks/agg path
      val finalPlan = plan.take(plan.indexOf("InMemoryRelation"))
      assert(!finalPlan.contains("Exchange hashpartitioning(src"),
        s"adjacency re-shuffled above the cache:\n$plan")
    } finally adj.unpersist()
  }

  test("personalized teleport localizes mass around the seed and zeroes " +
      "nothing reachable") {
    val got = run(seed = Some(Seq("x")))
    val want = referencePagerank(3, seed = Some(Set("x")))
    got.foreach { case (n, v) =>
      assert(v == want(n), s"node $n: $v vs ${want(n)}")
    }
    // triangle neighbors of the seed hold more mass than the far path end
    assert(got("y") > got("f") && got("z") > got("f"))
    // out-of-graph seed entries contribute nothing but don't crash
    val withGhost = run(seed = Some(Seq("x", "ghost")))
    assert(!withGhost.contains("ghost"))
    assert(withGhost("x") < got("x")) // mass split with the ghost is lost
  }
}
