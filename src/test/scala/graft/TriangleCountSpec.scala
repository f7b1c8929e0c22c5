package graft

import graft.algos.TriangleCount
import graft.core._

/**
 * Fixtures from the reference's IntersectingTriangleCountTest
 * (algo/src/test/java/org/neo4j/graphalgo/triangle/IntersectingTriangleCountTest.java:37-95)
 * and LocalClusteringCoefficient.java:85-128. Input graphs are undirected;
 * we feed canonical (a<b) edges — the implementation treats them as
 * undirected simple edges either way.
 */
class TriangleCountSpec extends SparkSpec {

  test("no triangles: 3-node path / isolated / single edge / back-and-forth") {
    assert(TriangleCount.globalCount(graphOf(3, Seq((0L, 1L), (1L, 2L)))) == 0)
    assert(TriangleCount.globalCount(graphOf(3, Seq.empty)) == 0)
    assert(TriangleCount.globalCount(graphOf(3, Seq((0L, 1L)))) == 0)
    // parallel edge both directions is still one simple edge
    assert(TriangleCount.globalCount(graphOf(2, Seq((0L, 1L), (1L, 0L)))) == 0)
  }

  test("N independent triangles (N in 1,2,4,8,100)") {
    for (n <- Seq(1, 2, 4, 8, 100)) {
      val edges = (0 until n).flatMap { t =>
        val b = (t * 3).toLong
        Seq((b, b + 1), (b + 1, b + 2), (b, b + 2))
      }
      val g = graphOf(n * 3, edges)
      assert(TriangleCount.globalCount(g) == n, s"n=$n")
      val per = longs(TriangleCount.run(g))
      assert(per.values.forall(_ == 1L), s"n=$n per-node")
    }
  }

  test("clique5: global=10, every node local=6") {
    val edges = for {
      i <- 0 until 5; j <- (i + 1) until 5
    } yield (i.toLong, j.toLong)
    val g = graphOf(5, edges)
    assert(TriangleCount.globalCount(g) == 10)
    val per = longs(TriangleCount.run(g))
    assert(per.values.forall(_ == 6L))
  }

  test("LCC formula: 2*t/(deg*(deg-1)), 0 when deg<2 (LocalClusteringCoefficient.java:118-128)") {
    // triangle 0-1-2 plus pendant 3 attached to 0, isolate 4
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L)))
    val lcc = scores(TriangleCount.localClusteringCoefficient(g))
    assert(math.abs(lcc(0L) - 2.0 * 1 / (3 * 2)) < 1e-12) // deg 3, 1 triangle
    assert(lcc(1L) == 1.0 && lcc(2L) == 1.0)
    assert(lcc(3L) == 0.0 && lcc(4L) == 0.0)
    val avg = TriangleCount.averageClusteringCoefficient(
      TriangleCount.localClusteringCoefficient(g))
    assert(math.abs(avg - (1.0 / 3 + 1 + 1 + 0 + 0) / 5) < 1e-12)
  }

  test("maxDegree excludes hubs with count -1 (IntersectingTriangleCount.java:127-137)") {
    // triangle {1,2,3}; hub 0 connected to 1..8 (degree 8 > maxDegree 5).
    // Triangles through the hub (0-1-2 etc.) must NOT be counted; the
    // 1-2-3 triangle survives. Nodes 1..3 keep degree 3 ≤ 5.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val hubEdges = (1 until 9).map(i => (0L, i.toLong))
    val g = graphOf(9, tri ++ hubEdges)
    val per = longs(TriangleCount.run(g, TriangleCount.Config(maxDegree = Some(5L))))
    assert(per(0L) == -1L)
    assert(Seq(1L, 2L, 3L).forall(per(_) == 1L))
    assert(Seq(4L, 5L, 6L, 7L, 8L).forall(per(_) == 0L))
  }

  test("triangle stream yields sorted distinct triples (TriangleStream.java:47-188)") {
    val edges = for { i <- 0 until 4; j <- (i + 1) until 4 } yield (i.toLong, j.toLong)
    val g = graphOf(4, edges) // K4 → 4 triangles
    val tris = TriangleCount.triangles(g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tris == Set((0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 3L), (1L, 2L, 3L)))
  }

  test("determinism across parallelism") {
    val edges = (0 until 20).flatMap { t =>
      val b = (t * 3).toLong
      Seq((b, b + 1), (b + 1, b + 2), (b, b + 2))
    }
    val g = graphOf(60, edges)
    val a = longs(TriangleCount.run(g))
    val g2 = PropertyGraph(g.nodes.repartition(7), g.edges.repartition(11))
    assert(longs(TriangleCount.run(g2)) == a)
  }
}
