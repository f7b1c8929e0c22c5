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
}
