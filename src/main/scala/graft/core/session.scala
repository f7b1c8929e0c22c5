package graft.core

import graft.algos._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Execution modes — the reference ships every algorithm as 4 procedures
 * (stream/stats/mutate/write, proc/common/{Stream,Stats,Mutate,Write}Proc.java,
 * AlgoBaseProc.java:409-481). Spark mapping (SURVEY.md §2.D):
 *
 *  - stream: return the lazy result DataFrame;
 *  - stats:  aggregate-only summary (counts, histogram, timings);
 *  - mutate: write the result back into the cached GraphStore as a new
 *            node property (GraphStore.addNodeProperty, api/GraphStore.java:88);
 *  - write:  persist to the lakehouse (parquet dir) with write metrics.
 */
object ExecutionModes {

  final case class StatsResult(
      rows: Long,
      computeMillis: Long,
      histogram: Map[String, Double])

  final case class WriteResult(
      rowsWritten: Long,
      writeMillis: Long,
      path: String)

  /** stats mode over a community assignment: community count + size
   *  histogram (AbstractCommunityResultBuilder percentiles). */
  def communityStats(result: DataFrame, valueCol: String,
      computeMillis: Long = -1): StatsResult = {
    val sizes = result.groupBy(col(valueCol)).count()
      .select(col("count").cast("double").as("s")).persist()
    try {
      val n = sizes.count()
      val probes = Array(0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999)
      val qs =
        if (n == 0) Array.fill(probes.length)(0.0)
        else sizes.stat.approxQuantile("s", probes, 0.001)
      val mm =
        if (n == 0) (0.0, 0.0, 0.0)
        else {
          val r = sizes.agg(min("s"), max("s"), avg("s")).head()
          (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        }
      StatsResult(n, computeMillis,
        probes.map(p => s"p${(p * 1000).toInt}" -> 0.0).toMap ++
          probes.zip(qs).map { case (p, v) => s"p${(p * 1000).toInt}" -> v }.toMap ++
          Map("min" -> mm._1, "max" -> mm._2, "mean" -> mm._3))
    } finally { sizes.unpersist(); () }
  }

  /** mutate mode: attach (id, value) as a property column on the named
   *  graph's nodes and refresh the catalog entry. */
  def mutate(graphName: String, result: DataFrame, valueCol: String,
      asProperty: String): PropertyGraph = {
    val g = GraphCatalog.get(graphName)
    val newNodes = g.nodes
      .join(result.select(col("id"), col(valueCol).as(asProperty)), Seq("id"), "left_outer")
    val updated = PropertyGraph(newNodes, g.edges)
    GraphCatalog.drop(graphName)
    val created = GraphCatalog.create(graphName, updated)
    // Materialize the refreshed node frame NOW. create() persists lazily,
    // so chained mutates stack persisted-but-uncomputed layers; the first
    // multi-branch consumer (e.g. a streamNodeProperties union) then
    // computes the whole algorithm chain once PER BRANCH — concurrent
    // tasks of one job don't see each other's in-flight cache blocks
    // (measured: 17.7s/434 CPU-s -> 7.7s/160 on the catalog round-trip
    // gate query). A mutate's result is always consumed, so eager
    // materialization is never wasted work.
    created.nodes.count()
    created
  }

  /** write mode: durable parquet write + metrics. */
  def write(result: DataFrame, path: String): WriteResult = {
    val t0 = System.currentTimeMillis()
    result.write.mode("overwrite").parquet(path)
    val rows = result.sparkSession.read.parquet(path).count()
    WriteResult(rows, System.currentTimeMillis() - t0, path)
  }

  /** Seeded-only write — the reference's LongIfChanged property translator
   *  (core/.../write/LongIfChangedNodeProperties.java): with a seed
   *  property configured, persist ONLY the rows whose computed value
   *  differs from the seed (unchanged seeded nodes are skipped). */
  def writeIfChanged(g: PropertyGraph, result: DataFrame, valueCol: String,
      seedProperty: String, path: String): WriteResult = {
    val changed = result
      .join(g.nodes.select(col("id"), col(seedProperty).cast("long").as("_seed")),
        Seq("id"), "left_outer")
      .where(col("_seed").isNull || col(valueCol).cast("long") =!= col("_seed"))
      .drop("_seed")
    write(changed, path)
  }
}

/**
 * User-facing facade — the Spark stand-in for `CALL gds.<algo>.<mode>`
 * (SURVEY.md §3.1 "GdsSession"): resolve the named graph from the
 * catalog, run the algorithm, hand the result to a mode adapter.
 *
 * {{{
 * val s = GdsSession(spark)
 * s.create("g", PropertyGraph.fromEdges(edges))
 * s.graph("g").pageRank()                      // stream
 * s.graph("g").wccStats()                      // stats
 * s.graph("g").wccMutate("component")          // mutate
 * s.graph("g").pageRankWrite("/out/pr")        // write
 * }}}
 */
final case class GdsSession(spark: SparkSession) {

  def create(name: String, graph: PropertyGraph): PropertyGraph =
    GraphCatalog.create(name, graph)

  def list(): Seq[String] = GraphCatalog.list()
  def exists(name: String): Boolean = GraphCatalog.exists(name)
  def drop(name: String): Boolean = GraphCatalog.drop(name)

  def graph(name: String): GraphOps = GraphOps(name, GraphCatalog.get(name))
}

final case class GraphOps(name: String, g: PropertyGraph) {
  import ExecutionModes._

  // stream mode
  def pageRank(config: PageRank.Config = PageRank.Config()): DataFrame =
    PageRank.run(g, config)
  def wcc(config: Wcc.Config = Wcc.Config()): DataFrame = Wcc.run(g, config)
  def labelPropagation(config: LabelPropagation.Config = LabelPropagation.Config()): DataFrame =
    LabelPropagation.run(g, config)
  def triangleCount(config: TriangleCount.Config = TriangleCount.Config()): DataFrame =
    TriangleCount.run(g, config)
  def localClusteringCoefficient(): DataFrame =
    TriangleCount.localClusteringCoefficient(g)
  def degree(config: DegreeCentrality.Config = DegreeCentrality.Config()): DataFrame =
    DegreeCentrality.run(g, config)
  def nodeSimilarity(config: NodeSimilarity.Config = NodeSimilarity.Config()): DataFrame =
    NodeSimilarity.run(g, config)
  def louvain(config: Louvain.Config = Louvain.Config()): DataFrame =
    Louvain.run(g, config).communities
  def bfs(source: Long): DataFrame = Traversal.bfsLevels(g, source)
  def sssp(source: Long): DataFrame = Traversal.sssp(g, source)
  def betweenness(config: Betweenness.Config = Betweenness.Config()): DataFrame =
    Betweenness.run(g, config)
  def closeness(config: Closeness.Config = Closeness.Config()): DataFrame =
    Closeness.run(g, config)
  def articleRank(config: ArticleRank.Config = ArticleRank.Config()): DataFrame =
    ArticleRank.run(g, config)
  def eigenvector(config: Eigenvector.Config = Eigenvector.Config()): DataFrame =
    Eigenvector.run(g, config)
  def scc(config: Scc.Config = Scc.Config()): DataFrame = Scc.run(g, config)
  def k1coloring(): DataFrame = K1Coloring.run(g)
  def randomWalk(config: RandomWalk.Config = RandomWalk.Config()): DataFrame =
    RandomWalk.run(g, config)
  def fastRP(config: graft.pipeline.FastRP.Config = graft.pipeline.FastRP.Config()): DataFrame =
    graft.pipeline.FastRP.run(g, config)
  def spanningTree(startNode: Long): DataFrame = SpanningTree.spanningTree(g, startNode)
  def shortestPath(source: Long, target: Long): Option[ShortestPaths.PathResult] =
    ShortestPaths.dijkstra(g, source, target)
  def kShortestPaths(source: Long, target: Long, k: Int): Seq[ShortestPaths.PathResult] =
    ShortestPaths.yens(g, source, target, k)

  // estimate mode (F5)
  def pageRankEstimate(): MemoryEstimation.Estimate = MemoryEstimation.pageRank(g)
  def wccEstimate(): MemoryEstimation.Estimate = MemoryEstimation.wcc(g)
  def nodeSimilarityEstimate(): MemoryEstimation.Estimate =
    MemoryEstimation.nodeSimilarity(g)
  def labelPropagationEstimate(): MemoryEstimation.Estimate =
    MemoryEstimation.labelPropagation(g)
  def triangleCountEstimate(): MemoryEstimation.Estimate =
    MemoryEstimation.triangleCount(g)
  def louvainEstimate(maxLevels: Int = 10): MemoryEstimation.Estimate =
    MemoryEstimation.louvain(g, maxLevels)
  def betweennessEstimate(sources: Option[Long] = None): MemoryEstimation.Estimate =
    MemoryEstimation.betweenness(g, sources)
  def closenessEstimate(sources: Option[Long] = None): MemoryEstimation.Estimate =
    MemoryEstimation.closeness(g, sources)
  def fastRPEstimate(embeddingSize: Int = 128): MemoryEstimation.Estimate =
    MemoryEstimation.fastRP(g, embeddingSize)
  def eigenvectorEstimate(): MemoryEstimation.Estimate =
    MemoryEstimation.eigenvector(g)
  def k1ColoringEstimate(): MemoryEstimation.Estimate =
    MemoryEstimation.k1Coloring(g)
  def spanningTreeEstimate(): MemoryEstimation.Estimate =
    MemoryEstimation.spanningTree(g)
  def randomWalkEstimate(walksPerNode: Int = 10,
      walkLength: Int = 80): MemoryEstimation.Estimate =
    MemoryEstimation.randomWalk(g, walksPerNode, walkLength)

  // stats mode
  def wccStats(): StatsResult = {
    val t0 = System.currentTimeMillis()
    val r = Wcc.run(g)
    communityStats(r, "component", System.currentTimeMillis() - t0)
  }
  def labelPropagationStats(): StatsResult = {
    val t0 = System.currentTimeMillis()
    val r = LabelPropagation.run(g)
    communityStats(r, "label", System.currentTimeMillis() - t0)
  }
  def degreeHistogram(): Map[String, Double] = g.degreeHistogram()

  // mutate mode
  def wccMutate(asProperty: String): PropertyGraph =
    mutate(name, Wcc.run(g), "component", asProperty)
  def pageRankMutate(asProperty: String,
      config: PageRank.Config = PageRank.Config()): PropertyGraph =
    mutate(name, PageRank.run(g, config), "score", asProperty)

  // write mode
  def pageRankWrite(path: String,
      config: PageRank.Config = PageRank.Config()): WriteResult =
    write(PageRank.run(g, config), path)
  def wccWrite(path: String): WriteResult = write(Wcc.run(g), path)
}
