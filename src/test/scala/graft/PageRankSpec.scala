package graft

import graft.algos.PageRank
import graft.core._

/**
 * Golden fixture from the reference's PageRankTest
 * (algo/src/test/java/org/neo4j/graphalgo/pagerank/PageRankTest.java:53-121):
 * 10 nodes a..j = 0..9, edges b→c, c→b, d→a, d→b, e→b, e→d, e→f, f→b, f→e;
 * damping 0.85, 40 fixed iterations, golden scores at 1e-2.
 */
class PageRankSpec extends SparkSpec {

  // a=0 b=1 c=2 d=3 e=4 f=5 g=6 h=7 i=8 j=9
  val fixtureEdges: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 1L), (3L, 0L), (3L, 1L), (4L, 1L),
    (4L, 3L), (4L, 5L), (5L, 1L), (5L, 4L))

  def fixture: PropertyGraph = graphOf(10, fixtureEdges)

  test("matches reference goldens, NATURAL orientation (PageRankTest.java:89-103)") {
    val expected = Map(
      0L -> 0.243007, 1L -> 1.9183995, 2L -> 1.7806315, 3L -> 0.21885,
      4L -> 0.243007, 5L -> 0.21885, 6L -> 0.15, 7L -> 0.15, 8L -> 0.15, 9L -> 0.15)
    val got = scores(PageRank.run(fixture,
      PageRank.Config(maxIterations = 40, tolerance = 0.0)))
    expected.foreach { case (id, exp) =>
      assert(math.abs(got(id) - exp) < 1e-2, s"node $id: got ${got(id)} want $exp")
    }
  }

  test("matches reference goldens, REVERSE orientation (PageRankTest.java:107-121)") {
    val expected = Map(
      0L -> 0.15, 1L -> 0.3386727, 2L -> 0.2219679, 3L -> 0.3494679,
      4L -> 2.5463981, 5L -> 2.3858317, 6L -> 0.15, 7L -> 0.15, 8L -> 0.15, 9L -> 0.15)
    val got = scores(PageRank.run(fixture,
      PageRank.Config(maxIterations = 40, tolerance = 0.0,
        orientation = Orientation.Reverse)))
    expected.foreach { case (id, exp) =>
      assert(math.abs(got(id) - exp) < 1e-2, s"node $id: got ${got(id)} want $exp")
    }
  }

  test("converges under tolerance and stops early") {
    val r = PageRank.runWithMetrics(fixture,
      PageRank.Config(maxIterations = 100, tolerance = 1e-7))
    assert(r.converged, "should converge before 100 iterations")
    assert(r.supersteps < 100)
    // converged scores still match the fixed-40-iteration goldens at 1e-2
    val got = r.vertices.select("id", "rank").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(got(1L) - 1.9183995) < 1e-2)
  }

  test("personalized: only source nodes get init mass (BaseComputeStep.java:173-185)") {
    val got = scores(PageRank.run(fixture,
      PageRank.Config(maxIterations = 40, tolerance = 0.0, sourceNodes = Seq(4L))))
    // isolated non-source nodes score 0
    assert(got(6L) == 0.0 && got(9L) == 0.0)
    // source keeps at least part of its mass
    assert(got(4L) > 0.0)
    // downstream of e gets mass, a (only reachable via d) too
    assert(got(1L) > 0.0 && got(3L) > 0.0)
  }

  test("weighted: scatter proportional to weight/sumOfWeights (WeightedComputeStep.java:61-97)") {
    // two targets with 3:1 weights from a single source
    val g = graphOf(3, Seq((0L, 1L), (0L, 2L)),
      Map((0L, 1L) -> 3.0, (0L, 2L) -> 1.0))
    val got = scores(PageRank.run(g,
      PageRank.Config(maxIterations = 40, tolerance = 0.0, weighted = true)))
    // node1 receives 3x node2's inbound mass
    val in1 = got(1L) - 0.15
    val in2 = got(2L) - 0.15
    assert(math.abs(in1 / in2 - 3.0) < 1e-9, s"got ratio ${in1 / in2}")
  }

  test("determinism: same scores at different parallelism") {
    val a = scores(PageRank.run(fixture, PageRank.Config(maxIterations = 20)))
    val g2 = PropertyGraph(fixture.nodes.repartition(7), fixture.edges.repartition(5))
    val b = scores(PageRank.run(g2, PageRank.Config(maxIterations = 20)))
    a.foreach { case (id, v) => assert(math.abs(v - b(id)) < 1e-12) }
  }
}
