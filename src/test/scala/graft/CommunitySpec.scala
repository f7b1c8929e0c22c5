package graft

import graft.algos._
import graft.core._
import org.apache.spark.sql.functions._

/** K1Coloring, ModularityOptimization, Louvain — community-family suite. */
class CommunitySpec extends SparkSpec {

  test("K1Coloring: proper coloring on K4 uses 4 colors (K1Coloring.java:145-226)") {
    val edges = for { i <- 0 until 4; j <- (i + 1) until 4 } yield (i.toLong, j.toLong)
    val g = graphOf(4, edges)
    val colors = longs(K1Coloring.run(g))
    // proper: adjacent nodes differ
    for ((a, b) <- edges) assert(colors(a) != colors(b), s"edge $a-$b same color")
    assert(colors.values.toSet.size == 4)
  }

  test("K1Coloring: path is properly colored within Δ+1 colors, deterministic") {
    // The reference's own K1ColoringTest pins properness and a loose color
    // bound (colorsUsed.size() < 20 on a random graph), not 2-colorings of
    // bipartite graphs — the ranked multi-color step (see K1Coloring.scala)
    // trades a color or two on sparse structures for clique convergence in
    // O(1) rounds instead of O(clique size).
    val g = graphOf(6, (0 until 5).map(i => (i.toLong, i.toLong + 1)))
    val colors = longs(K1Coloring.run(g))
    (0 until 5).foreach(i => assert(colors(i) != colors(i + 1)))
    assert(colors.values.toSet.subsetOf(Set(0L, 1L, 2L))) // Δ+1 = 3 on a path
    val g2 = PropertyGraph(g.nodes.repartition(5), g.edges.repartition(3))
    assert(longs(K1Coloring.run(g2)) == colors)
  }

  test("ModularityOptimization: two cliques joined by a bridge split into two communities (Lu et al. scheme, ModularityOptimization.java:131-146)") {
    val cliqueA = for { i <- 0 until 4; j <- (i + 1) until 4 } yield (i.toLong, j.toLong)
    val cliqueB = for { i <- 4 until 8; j <- (i + 1) until 8 } yield (i.toLong, j.toLong)
    val g = graphOf(8, cliqueA ++ cliqueB ++ Seq((3L, 4L)))
    val r = ModularityOptimization.run(g)
    val comm = longs(r.communities)
    assert(comm(0L) == comm(1L) && comm(1L) == comm(2L) && comm(2L) == comm(3L))
    assert(comm(4L) == comm(5L) && comm(5L) == comm(6L) && comm(6L) == comm(7L))
    assert(comm(0L) != comm(4L))
    assert(r.modularity > 0.3, s"modularity ${r.modularity}")
  }

  test("Louvain: contracts levels and improves modularity (Louvain.java:49-295)") {
    // 3 triangles chained by single bridges
    val tri = (0 until 3).flatMap { t =>
      val b = (t * 3).toLong
      Seq((b, b + 1), (b + 1, b + 2), (b, b + 2))
    }
    val bridges = Seq((2L, 3L), (5L, 6L))
    val g = graphOf(9, tri ++ bridges)
    val r = Louvain.run(g)
    val comm = longs(r.communities)
    // each triangle is one community
    for (t <- 0 until 3) {
      val b = (t * 3).toLong
      assert(comm(b) == comm(b + 1) && comm(b + 1) == comm(b + 2), s"triangle $t")
    }
    assert(comm.values.toSet.size == 3)
    assert(r.modularities.nonEmpty && r.modularities.last > 0.4)
  }

  test("Louvain: determinism across parallelism") {
    val tri = (0 until 3).flatMap { t =>
      val b = (t * 3).toLong
      Seq((b, b + 1), (b + 1, b + 2), (b, b + 2))
    }
    val g = graphOf(9, tri ++ Seq((2L, 3L), (5L, 6L)))
    val a = longs(Louvain.run(g).communities)
    val g2 = PropertyGraph(g.nodes.repartition(7), g.edges.repartition(5))
    assert(longs(Louvain.run(g2).communities) == a)
  }
}
