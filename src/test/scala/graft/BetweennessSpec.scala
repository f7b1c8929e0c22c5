package graft

import graft.algos._
import graft.core._

/** Brandes betweenness vs the reference's golden fixtures
  * (algo/src/test/java/org/neo4j/graphalgo/betweenness/BetweennessCentralityTest.java:119-131,
  * the no-sampling rows). */
class BetweennessSpec extends SparkSpec {

  private def bc(g: PropertyGraph, o: Orientation = Orientation.Natural): Map[Long, Double] =
    scores(Betweenness.run(g, Betweenness.Config(orientation = o)))

  test("LINE: a->b->c->d->e gives 0,3,4,3,0 (BetweennessCentralityTest LINE golden)") {
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    assert(bc(g) == Map(0L -> 0.0, 1L -> 3.0, 2L -> 4.0, 3L -> 3.0, 4L -> 0.0))
  }

  test("CYCLE: each node carries 1.0") {
    val g = graphOf(3, Seq((0L, 1L), (1L, 2L), (2L, 0L)))
    assert(bc(g) == Map(0L -> 1.0, 1L -> 1.0, 2L -> 1.0))
  }

  test("DIAMOND directed golden: b=8, c=d=3, e=5") {
    val g = graphOf(7, Seq((0L, 2L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (4L, 5L), (5L, 6L)))
    assert(bc(g) == Map(0L -> 0.0, 1L -> 0.0, 2L -> 8.0, 3L -> 3.0, 4L -> 3.0, 5L -> 5.0, 6L -> 0.0))
  }

  test("DIAMOND undirected golden: b=9.5, e=5.5 (divisor 2, BetweennessCentrality.java:71)") {
    val g = graphOf(7, Seq((0L, 2L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (4L, 5L), (5L, 6L)))
    assert(bc(g, Orientation.Undirected) ==
      Map(0L -> 0.0, 1L -> 0.0, 2L -> 9.5, 3L -> 3.0, 4L -> 3.0, 5L -> 5.5, 6L -> 0.0))
  }

  test("CONNECTED_CYCLES golden: a=d=13, rest 4") {
    val g = graphOf(6, Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L),
      (0L, 3L), (3L, 0L)))
    assert(bc(g) == Map(0L -> 13.0, 1L -> 4.0, 2L -> 4.0, 3L -> 13.0, 4L -> 4.0, 5L -> 4.0))
  }

  test("CLIQUE_5 undirected: all zero") {
    val edges = for { i <- 0 until 5; j <- (i + 1) until 5 } yield (i.toLong, j.toLong)
    val g = graphOf(5, edges)
    assert(bc(g, Orientation.Undirected).values.forall(_ == 0.0))
  }

  test("sampled sources: LINE with sources {a} only counts s=a dependencies") {
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    import spark.implicits._
    val srcs = Seq(0L).toDF("id")
    val r = scores(Betweenness.run(g, Betweenness.Config(sources = Some(srcs))))
    // from a: delta(b)=3 (paths to c,d,e), delta(c)=2, delta(d)=1
    assert(r == Map(0L -> 0.0, 1L -> 3.0, 2L -> 2.0, 3L -> 1.0, 4L -> 0.0))
  }

  test("determinism across parallelism") {
    val g = graphOf(7, Seq((0L, 2L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (4L, 5L), (5L, 6L)))
    val a = bc(g, Orientation.Undirected)
    val g2 = PropertyGraph(g.nodes.repartition(5), g.edges.repartition(3))
    assert(bc(g2, Orientation.Undirected) == a)
  }
}
