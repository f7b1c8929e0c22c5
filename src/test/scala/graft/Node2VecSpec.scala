package graft

import graft.algos._
import graft.core._
import org.apache.spark.sql.functions._

/** node2vec-biased random walks (RandomWalk.java:45, Grover-Leskovec p,q). */
class Node2VecSpec extends SparkSpec {

  // 1 — 2 — {0, 3}; 0 — 3 (so from 2 with prev 1: 0 and 3 are "explore")
  private def walkGraph = graphOf(4,
    Seq((1L, 2L), (2L, 0L), (2L, 3L), (0L, 3L)))

  /** second-step choices of walks starting at node 1 (first hop is forced
    * to 2 — node 1's only neighbor). */
  private def secondSteps(p: Double, q: Double, n: Int): Seq[Long] = {
    val r = RandomWalk.run(walkGraph, RandomWalk.Config(steps = 2,
      walksPerNode = n, returnParam = p, inOutParam = q,
      orientation = Orientation.Undirected))
    r.where(col("start") === 1L)
      .select(element_at(col("path"), 3)).collect().map(_.getLong(0)).toSeq
  }

  test("tiny p strongly prefers returning to the previous node") {
    val back = secondSteps(p = 0.001, q = 1.0, n = 40)
    assert(back.count(_ == 1L) >= 36, s"returns: ${back.count(_ == 1L)}/40")
  }

  test("tiny q strongly prefers exploring distance-2 nodes") {
    val out = secondSteps(p = 1.0, q = 0.001, n = 40)
    // from 2 with prev=1: both 0 and 3 are non-adjacent-to-1 "explore" moves
    assert(out.count(x => x == 0L || x == 3L) >= 36, s"explores: $out")
  }

  test("huge p and q avoid both returning and exploring — stays put on 0/3? no: no distance-1 option exists, draw falls in the explore mass") {
    // with the triangle 0-2-3, from 2 (prev 1) there is no neighbor adjacent
    // to 1, so weights are 1/p for node 1, 1/q for 0 and 3: p huge, q=1
    val out = secondSteps(p = 1e6, q = 1.0, n = 40)
    assert(out.count(_ != 1L) >= 38, s"non-returns: $out")
  }

  test("biased walks deterministic across parallelism") {
    val cfg = RandomWalk.Config(steps = 4, walksPerNode = 3,
      returnParam = 0.5, inOutParam = 2.0, orientation = Orientation.Undirected)
    val a = RandomWalk.run(walkGraph, cfg).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](2))).sortBy(_._1).toSeq
    val g2 = PropertyGraph(walkGraph.nodes.repartition(3), walkGraph.edges.repartition(5))
    val b = RandomWalk.run(g2, cfg).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](2))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("uniform fast path unchanged: p=q=1 matches explicit 1.0 config") {
    val a = RandomWalk.run(walkGraph, RandomWalk.Config(steps = 3)).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](2))).sortBy(_._1).toSeq
    assert(a.nonEmpty && a.forall(_._2.nonEmpty))
  }
}
