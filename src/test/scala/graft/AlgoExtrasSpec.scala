package graft

import graft.algos._
import graft.core._
import graft.sources.RandomGraph
import org.apache.spark.sql.functions._

/** NodeSimilarity, Traversal, centrality variants, link prediction,
 *  random generator. */
class AlgoExtrasSpec extends SparkSpec {

  test("NodeSimilarity: bipartite person→instrument fixture (NodeSimilarity.java docs example)") {
    // persons 0..2 -> instruments 10,11,12; 0:{10,11}, 1:{10,11}, 2:{10,12}
    val g = graphOf(13, Seq((0L, 10L), (0L, 11L), (1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L)))
    val r = NodeSimilarity.run(g, NodeSimilarity.Config(topK = Some(10)))
    val sims = r.collect().map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    assert(sims((0L, 1L)) == 1.0) // identical sets
    assert(math.abs(sims((0L, 2L)) - 1.0 / 3) < 1e-12) // {10} of {10,11,12}
    assert(math.abs(sims((2L, 0L)) - 1.0 / 3) < 1e-12)
    // instruments have no out-edges → not sources
    assert(!sims.contains((10L, 11L)))
  }

  test("NodeSimilarity: topK bounds and rank ordering (TopKMap.java:38)") {
    // star: 1..5 each share neighbor 100 with everyone
    val edges = (1 to 5).map(i => (i.toLong, 100L)) ++ Seq((1L, 101L))
    val g = graphOf(102, edges)
    val r = NodeSimilarity.run(g, NodeSimilarity.Config(topK = Some(2)))
    val byNode = r.collect().groupBy(_.getLong(0))
    byNode.foreach { case (_, rows) => assert(rows.length <= 2) }
    // node 2's top: nodes 3,4,5 have sim 1.0, node 1 sim 0.5; ties → smaller id
    val n2 = byNode(2L).sortBy(_.getInt(3) match { case x => x }).map(_.getLong(1)).toSeq
    assert(n2 == Seq(3L, 4L))
  }

  test("BFS levels from source (BFSLevelPregel)") {
    // 0-1-2-3 path + isolated 4
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val lv = longs(Traversal.bfsLevels(g, 0L))
    assert(lv == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> -1L))
  }

  test("SSSP distances with weights (SingleSourceShortestPathPregel)") {
    // 0→1 (1.0), 1→2 (2.0), 0→2 (5.0): dist(2) = 3.0 via 1
    val g = graphOf(3, Seq((0L, 1L), (1L, 2L), (0L, 2L)),
      Map((0L, 1L) -> 1.0, (1L, 2L) -> 2.0, (0L, 2L) -> 5.0))
    val d = scores(Traversal.sssp(g, 0L))
    assert(d(0L) == 0.0 && d(1L) == 1.0 && d(2L) == 3.0)
  }

  test("ArticleRank: damped scatter over deg+avgDeg keeps ordering but compresses hubs (ArticleRankComputeStep.java:58-81)") {
    val g = graphOf(4, Seq((0L, 3L), (1L, 3L), (2L, 3L))) // 3 is the hub sink
    val ar = scores(ArticleRank.run(g, ArticleRank.Config(maxIterations = 20)))
    val pr = scores(PageRank.run(g, PageRank.Config(maxIterations = 20)))
    assert(ar(3L) > ar(0L))
    assert(ar(3L) < pr(3L)) // compression vs plain PageRank
  }

  test("Eigenvector: L2-normalized power iteration finds the dominant direction (EigenvectorCentralityComputeStep.java)") {
    // directed cycle 0→1→2→0: symmetric structure → equal scores, L2 norm 1
    val g = graphOf(3, Seq((0L, 1L), (1L, 2L), (2L, 0L)))
    val ev = scores(Eigenvector.run(g, Eigenvector.Config(maxIterations = 50)))
    val vals = ev.values.toSeq
    assert(math.abs(vals.map(v => v * v).sum - 1.0) < 1e-6)
    assert(vals.forall(v => math.abs(v - vals.head) < 1e-9))
  }

  test("LinkPrediction kernels match hand computation (LinkPredictionFunc.java)") {
    import spark.implicits._
    // square 0-1-2-3-0: N(0)={1,3}, N(2)={1,3} → common {1,3}, deg 2 each
    val g = graphOf(4, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    val pairs = Seq((0L, 2L)).toDF("node1", "node2")
    val r = LinkPrediction.scores(g, pairs).head()
    assert(r.getAs[Long]("commonNeighbors") == 2L)
    assert(r.getAs[Long]("totalNeighbors") == 2L)
    assert(r.getAs[Double]("preferentialAttachment") == 4.0)
    assert(math.abs(r.getAs[Double]("adamicAdar") - 2.0 / math.log(2.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("resourceAllocation") - 1.0) < 1e-12)
  }

  test("sameCommunity flag (LinkPredictionFunc sameCommunity)") {
    import spark.implicits._
    val comm = Seq((0L, 7L), (1L, 7L), (2L, 9L)).toDF("id", "community")
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("node1", "node2")
    val r = LinkPrediction.sameCommunity(pairs, comm).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    assert(r((0L, 1L)) == 1.0 && r((0L, 2L)) == 0.0)
  }

  test("RandomGraph: deterministic, respects node count and distribution shape (RandomGraphGenerator.java:39)") {
    val g1 = RandomGraph.generate(spark, 200, 4, RandomGraph.PowerLaw, seed = 7)
    val g2 = RandomGraph.generate(spark, 200, 4, RandomGraph.PowerLaw, seed = 7)
    assert(g1.edges.count() == g2.edges.count())
    assert(g1.edges.except(g2.edges).count() == 0)
    val degs = g1.degrees().select("degree").collect().map(_.getLong(0))
    assert(degs.max > degs.sum / degs.length, "power law has hubs above mean")
    val u = RandomGraph.generate(spark, 100, 3, RandomGraph.Uniform, seed = 1)
    // uniform: every node emits exactly averageDegree raw edges (minus self hits)
    assert(u.edges.count() >= 250 && u.edges.count() <= 300)
  }
}
