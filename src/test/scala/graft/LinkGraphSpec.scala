package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkGraph

/** Integer-micro-unit PageRank: exact fixpoints on symmetric graphs,
  * teleport floors, dangling-mass semantics, duplicate-edge dedup.
  */
class LinkGraphSpec extends SparkSpec {

  private def ranksOf(edges: Seq[(String, String)], iters: Int = 10): Map[String, Long] = {
    import spark.implicits._
    LinkGraph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = iters)
      .as[(String, Long)].collect().toMap
  }

  test("a cycle is an exact integer fixpoint at 1,000,000 per node") {
    // r = 150000 + (r * 850000 div 1e6) div 1 → r = 1e6 exactly, every iteration
    val r = ranksOf(Seq("a" -> "b", "b" -> "c", "c" -> "a"), iters = 7)
    assert(r == Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
  }

  test("hubs outrank leaves; no-inlink nodes floor at the teleport constant") {
    // star: l1..l4 all point at hub; hub points at l1. The hub/l1
    // two-cycle oscillates, so run to convergence (0.85³⁰ ≈ 0.8%
    // residual ≪ the ~200k fixpoint separation)
    val r = ranksOf(Seq("l1" -> "hub", "l2" -> "hub", "l3" -> "hub", "l4" -> "hub",
      "hub" -> "l1"), iters = 30)
    assert(r("hub") > r("l1"), s"hub must outrank its leaf: $r")
    assert(r("l2") == 150000L && r("l3") == 150000L && r("l4") == 150000L,
      s"leaves without inlinks sit at teleport: $r")
    assert(r("l1") > r("l2"), "the hub's outlink target must beat bare leaves")
  }

  test("dangling hosts absorb but do not redistribute; duplicate edges vote once") {
    import spark.implicits._
    // a → sink (dangling), duplicated edge must count once
    val edges = Seq("a" -> "sink", "a" -> "sink", "b" -> "a").toDF("src", "dst")
    val r = LinkGraph.pageRank(edges, "src", "dst", iterations = 3)
      .as[(String, Long)].collect().toMap
    // exact hand-computed fixpoints after 3 iterations (these values
    // DISCRIMINATE dedup: with the duplicate edge honored, outdeg(a)=2
    // halves-then-doubles each contribution and the iter-3 truncation
    // lands sink at 385874, one micro-unit off):
    //   iter1: a = 150000+850000(b) = 1000000; sink = 1000000; b = 150000
    //   iter2: a = 150000+floor(150000·17/20) = 277500; sink = 1000000
    //   iter3: sink = 150000+floor(277500·17/20) = 385875
    assert(r == Map("a" -> 277500L, "b" -> 150000L, "sink" -> 385875L), s"got $r")
  }

  test("deterministic under repartitioning (integer sums are order-free)") {
    import spark.implicits._
    val edges = (0 until 300).map(i => (s"h${i % 17}", s"h${(i * 7 + 3) % 17}"))
    val r1 = LinkGraph.pageRank(edges.toDF("src", "dst").repartition(32), "src", "dst", 6)
      .as[(String, Long)].collect().toMap
    val r2 = LinkGraph.pageRank(edges.toDF("src", "dst").repartition(3), "src", "dst", 6)
      .as[(String, Long)].collect().toMap
    assert(r1 == r2)
  }
}
