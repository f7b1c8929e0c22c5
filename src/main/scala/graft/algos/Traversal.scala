package graft.algos

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BFS levels and single-source shortest paths as Pregel computations —
 * the reference ships both as Pregel examples
 * (examples/pregel-example/.../bfs/BFSLevelPregel.java,
 * sssp/SingleSourceShortestPathPregel.java) and as alpha procs
 * (gds.alpha.bfs, gds.alpha.shortestPath).
 */
object Traversal {

  /**
   * BFS levels from `source`: level = superstep at first visit. Min-level
   * propagation: unvisited = null; message = level + 1; combine = min.
   * @return (id, level) — unreached nodes have level -1
   */
  def bfsLevels(graph: PropertyGraph, source: Long,
      orientation: Orientation = Orientation.Natural,
      maxDepth: Int = 50,
      pregel: PregelConfig = PregelConfig()): DataFrame = {
    import Pregel._
    val edges = graph.oriented(orientation)
    val initial = graph.nodes.select(
      col("id"),
      when(col("id") === source, 0L).otherwise(lit(Long.MaxValue)).as("level"),
      (col("id") === source).as(ACTIVE),
      (col("id") === source).as(CHANGED),
      lit(0.0).as(DELTA))

    val result = Pregel.run(
      initial = initial,
      edges = edges,
      msgExpr = col("level") + 1L,
      combine = Combiners.min,
      updateExprs = Seq(
        least(col("level"), coalesce(col(MSG), col("level"))).as("level"),
        (coalesce(col(MSG), col("level")) < col("level")).as(ACTIVE),
        (coalesce(col(MSG), col("level")) < col("level")).as(CHANGED),
        lit(0.0).as(DELTA)),
      config = pregel.copy(maxIterations = maxDepth))

    result.vertices.select(col("id"),
      when(col("level") === Long.MaxValue, -1L).otherwise(col("level")).as("level"))
  }

  /**
   * SSSP by distributed Bellman-Ford relaxation (the superstep form of the
   * reference's delta-stepping/Dijkstra family — exact distances, no
   * bucketing needed under synchronous relaxation).
   * @return (id, distance) — unreached = Infinity
   */
  def sssp(graph: PropertyGraph, source: Long,
      orientation: Orientation = Orientation.Natural,
      maxIterations: Int = 100,
      pregel: PregelConfig = PregelConfig()): DataFrame = {
    import Pregel._
    val edges = graph.oriented(orientation)
    val initial = graph.nodes.select(
      col("id"),
      when(col("id") === source, 0.0).otherwise(lit(Double.PositiveInfinity)).as("dist"),
      (col("id") === source).as(ACTIVE),
      (col("id") === source).as(CHANGED),
      lit(0.0).as(DELTA))

    val result = Pregel.run(
      initial = initial,
      edges = edges,
      msgExpr = col("dist") + col("weight"),
      combine = Combiners.min,
      updateExprs = Seq(
        least(col("dist"), coalesce(col(MSG), col("dist"))).as("dist"),
        (coalesce(col(MSG), col("dist")) < col("dist")).as(ACTIVE),
        (coalesce(col(MSG), col("dist")) < col("dist")).as(CHANGED),
        lit(0.0).as(DELTA)),
      config = pregel.copy(maxIterations = maxIterations))

    result.vertices.select(col("id"), col("dist").as("distance"))
  }

  /** Exit-predicate outcomes — reference Traverse.ExitPredicate.Result. */
  sealed trait Exit
  object Exit {
    case object Follow   extends Exit // visit + expand
    case object Continue extends Exit // skip, keep traversing
    case object Break    extends Exit // visit, stop the whole traversal
  }

  /**
   * DFS / BFS visit-order traversal with exit predicate — gds.alpha.dfs /
   * gds.alpha.bfs (alpha/.../impl/traverse/Traverse.java:34-77,110-155).
   * Faithful to the reference's exact order: `visited` is marked at PUSH
   * time, DFS pushes neighbors front-first in ascending adjacency order
   * (so the largest neighbor pops first), BFS appends (FIFO, ascending).
   *
   * A visit ORDER is a sequential contract — the reference runs this
   * single-threaded too — so the adjacency is collected to the driver,
   * guarded by `maxCollectNodes`. At 100 TB scale use the distributed
   * level/distance operators (bfsLevels / sssp); this operator exists for
   * the reference's bounded exploratory API.
   *
   * @param targets   BREAK when popping one of these (it is included last)
   * @param maxDepth  CONTINUE past nodes deeper than this (hop count)
   * @return (id, visitOrder) in visit sequence, visitOrder 0-based
   */
  def traverse(graph: PropertyGraph, source: Long, dfs: Boolean,
      targets: Set[Long] = Set.empty,
      maxDepth: Long = Long.MaxValue,
      orientation: Orientation = Orientation.Natural,
      maxCollectNodes: Long = 5000000L): DataFrame = {
    val spark = graph.spark
    val nodeCount = graph.nodes.count()
    require(nodeCount <= maxCollectNodes,
      s"traverse() is a sequential visit-order operator; $nodeCount nodes exceeds " +
        s"maxCollectNodes=$maxCollectNodes — use bfsLevels/sssp at scale")
    val adj: Map[Long, Array[Long]] = graph.adjacency(orientation).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

    val visited = scala.collection.mutable.Set(source)
    val inResult = scala.collection.mutable.Set[Long]()
    val result = scala.collection.mutable.ArrayBuffer[Long]()
    // deque of (node, depth); DFS = push front, BFS = push back
    val deque = new java.util.ArrayDeque[(Long, Long)]()
    deque.addFirst((source, 0L))
    var break = false
    while (!deque.isEmpty && !break) {
      val (node, depth) = deque.removeFirst()
      val exit: Exit =
        if (targets.contains(node)) Exit.Break
        else if (depth > maxDepth) Exit.Continue
        else Exit.Follow
      exit match {
        case Exit.Break =>
          if (inResult.add(node)) result += node
          break = true
        case Exit.Continue => () // skip expansion
        case Exit.Follow =>
          if (inResult.add(node)) result += node
          for (t <- adj.getOrElse(node, Array.empty)) {
            if (visited.add(t)) {
              if (dfs) deque.addFirst((t, depth + 1))
              else deque.addLast((t, depth + 1))
            }
          }
      }
    }
    import spark.implicits._
    result.toSeq.zipWithIndex.map { case (id, i) => (id, i.toLong) }
      .toDF("id", "visitOrder")
  }
}
