package graft

import graft.algos._
import graft.core._
import org.apache.spark.sql.functions._

/** Dijkstra / A* / Yen's — fixture from YensTest.java:67-84 (undirected). */
class ShortestPathsSpec extends SparkSpec {

  // a=0,b=1,c=2,d=3,e=4,f=5
  private def yensGraph = graphOf(6,
    Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 3L), (0L, 4L),
      (0L, 5L), (1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)),
    Map((0L, 1L) -> 1.0, (1L, 2L) -> 1.0, (2L, 3L) -> 1.0, (4L, 3L) -> 1.0,
      (0L, 4L) -> 1.0, (0L, 5L) -> 5.0, (1L, 5L) -> 4.0, (2L, 5L) -> 1.0,
      (3L, 5L) -> 1.0, (4L, 5L) -> 4.0))

  test("Dijkstra a->f costs 3 on the Yens fixture") {
    val r = ShortestPaths.dijkstra(yensGraph, 0L, 5L, Orientation.Undirected)
    assert(r.isDefined && r.get.cost == 3.0)
    assert(r.get.path.head == 0L && r.get.path.last == 5L && r.get.path.length == 4)
  }

  test("filtered Dijkstra reproduces YensTest.test04325: path a,e,d,c,f cost 4") {
    val r = ShortestPaths.filteredDijkstra(yensGraph, 0L, 5L,
      excludedEdges = Set((0L, 5L), (4L, 5L), (3L, 5L), (0L, 1L)),
      excludedNodes = Set.empty, orientation = Orientation.Undirected)
    assert(r.isDefined)
    assert(r.get.cost == 4.0)
    assert(r.get.path == Seq(0L, 4L, 3L, 2L, 5L))
  }

  test("filtered Dijkstra reproduces YensTest.test01235: path a,b,c,d,f cost 4") {
    val r = ShortestPaths.filteredDijkstra(yensGraph, 0L, 5L,
      excludedEdges = Set((0L, 5L), (1L, 5L), (2L, 5L), (0L, 4L)),
      excludedNodes = Set.empty, orientation = Orientation.Undirected)
    assert(r.isDefined)
    assert(r.get.cost == 4.0)
    assert(r.get.path == Seq(0L, 1L, 2L, 3L, 5L))
  }

  test("Yen's k=5 returns loopless paths with costs 3,3,4,4,5 (YensTest cost multiset prefix)") {
    val paths = ShortestPaths.yens(yensGraph, 0L, 5L, k = 5, Orientation.Undirected)
    assert(paths.length == 5)
    assert(paths.map(_.cost) == Seq(3.0, 3.0, 4.0, 4.0, 5.0), paths.map(_.cost))
    // loopless + distinct
    paths.foreach(p => assert(p.path.distinct == p.path))
    assert(paths.map(_.path).distinct.length == 5)
  }

  test("A* with admissible heuristic equals Dijkstra (ShortestPathAStar.java:40)") {
    import spark.implicits._
    // straight-line lower bound toward f: h = 0 at f, 1 elsewhere (admissible)
    val h = Seq((0L, 1.0), (1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0), (5L, 0.0))
      .toDF("id", "h")
    val a = ShortestPaths.aStar(yensGraph, 0L, 5L, h, Orientation.Undirected)
    val d = ShortestPaths.dijkstra(yensGraph, 0L, 5L, Orientation.Undirected)
    assert(a.isDefined && a.get.cost == d.get.cost)
  }

  test("unreachable target returns None") {
    val g = graphOf(3, Seq((0L, 1L)))
    assert(ShortestPaths.dijkstra(g, 0L, 2L).isEmpty)
  }
}
