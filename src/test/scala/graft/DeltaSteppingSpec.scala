package graft

import graft.algos._
import graft.core._
import org.apache.spark.sql.functions._

/** Delta-stepping (ShortestPathDeltaStepping.java:53) and the all-pairs
  * shortest-path stream (MSBFSAllShortestPaths / WeightedAllShortestPaths). */
class DeltaSteppingSpec extends SparkSpec {

  private def wGraph = graphOf(6,
    Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 3L), (0L, 4L),
      (0L, 5L), (1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)),
    Map((0L, 1L) -> 1.0, (1L, 2L) -> 1.0, (2L, 3L) -> 1.0, (4L, 3L) -> 1.0,
      (0L, 4L) -> 1.0, (0L, 5L) -> 5.0, (1L, 5L) -> 4.0, (2L, 5L) -> 1.0,
      (3L, 5L) -> 1.0, (4L, 5L) -> 4.0))

  test("delta-stepping equals synchronous relaxation for any delta") {
    val reference = scores(Traversal.sssp(wGraph, 0L, Orientation.Undirected))
    for (delta <- Seq(0.5, 1.0, 2.0, 10.0)) {
      val ds = scores(Traversal.deltaStepping(wGraph, 0L, delta, Orientation.Undirected))
      assert(ds == reference, s"delta=$delta")
    }
  }

  test("delta-stepping handles mixed light/heavy edges and disconnected nodes") {
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (0L, 2L)),
      Map((0L, 1L) -> 0.5, (1L, 2L) -> 0.5, (0L, 2L) -> 10.0))
    val d = scores(Traversal.deltaStepping(g, 0L, 1.0))
    assert(d(0L) == 0.0 && d(1L) == 0.5 && d(2L) == 1.0)
    assert(d(3L).isPosInfinity && d(4L).isPosInfinity)
  }

  test("allShortestPaths unweighted: hop distances for every reachable pair") {
    val g = graphOf(4, Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val r = Traversal.allShortestPaths(g, orientation = Orientation.Undirected)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(r((0L, 3L)) == 3.0 && r((3L, 0L)) == 3.0)
    assert(r((1L, 2L)) == 1.0 && r((0L, 0L)) == 0.0)
    assert(r.size == 16) // path graph: all pairs reachable undirected
  }

  test("allShortestPaths weighted matches per-source relaxation") {
    import spark.implicits._
    val srcs = Seq(0L, 5L).toDF("id")
    val r = Traversal.allShortestPaths(wGraph, sources = Some(srcs),
      weighted = true, orientation = Orientation.Undirected)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val ref0 = scores(Traversal.sssp(wGraph, 0L, Orientation.Undirected))
    val ref5 = scores(Traversal.sssp(wGraph, 5L, Orientation.Undirected))
    ref0.foreach { case (t, d) => assert(r((0L, t)) == d, s"0->$t") }
    ref5.foreach { case (t, d) => assert(r((5L, t)) == d, s"5->$t") }
  }
}
