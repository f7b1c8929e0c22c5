package graft.algos

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Weighted shortest-path family — gds.alpha.shortestPath (Dijkstra),
 * gds.alpha.shortestPath.astar (alpha/.../shortestpaths/ShortestPathAStar.java:40),
 * gds.alpha.kShortestPaths (YensKShortestPaths.java:47).
 *
 * One relaxation core serves all three: synchronous min-relaxation with
 * predecessor tracking (message = struct(dist, pred), combiner = struct
 * min — dist asc, pred asc, a total order so results are deterministic
 * under any parallelism). A* adds goal-directed pruning: once the target
 * has a finite distance UB, any node with dist + h(node) ≥ UB stops
 * scattering (with an admissible heuristic it cannot improve the target —
 * exactly the reference's closed-set cutoff role; h = 0 degrades to plain
 * Dijkstra). Yen's runs the core repeatedly with root-path node/edge
 * exclusions (YensKShortestPathsDijkstra.withFilter).
 *
 * Path reconstruction collects the converged finite-distance predecessor
 * rows ONCE (bounded by the reachable set — the path API is the
 * reference's bounded exploratory contract, not a 100 TB operator) and
 * walks the map driver-side: one Spark job total, not one per hop
 * (VERDICT r2 #3).
 */
object ShortestPaths {

  final case class PathResult(path: Seq[Long], cost: Double)

  /** Prepared relaxation context: the edge relation hash-partitioned by
   *  the join key and checkpointed ONCE (every spur/iteration join reuses
   *  the layout — filters on top of it preserve the partitioning), the
   *  node id frame, and the AQE gate (measured the same way as Pregel:
   *  re-planning latency dominates on big superstep frames). Yen's runs
   *  O(k·pathLen) Dijkstras; without this each one re-shuffled and
   *  re-checkpointed the full edge frame. */
  private final case class Ctx(edges: DataFrame, nodes: DataFrame, bigWork: Boolean)

  private def prepare(graph: PropertyGraph, orientation: Orientation): Ctx = {
    // prepared layout (PropertyGraph.pregelEdges): min-aggregated edges in
    // one shuffle, sorted within hash(src) partitions so no spur/iteration
    // join re-sorts the big side; exclusion filters preserve both.
    val e = graph.pregelEdges(orientation, Aggregation.Min)
    val n = graph.nodes.select(col("id"))
    Ctx(e, n, e.count() >= Lineage.aqeOffMinEdges(graph.spark))
  }

  /** Distributed relaxation with predecessor tracking. Each iteration is
   *  ONE Spark action: the frontier count and the target's distance upper
   *  bound both ride the materializing checkpoint via observe(), the same
   *  single-action superstep pattern as [[graft.core.Pregel]].
   *  @param heuristic optional (id, h) frame enabling A* pruning toward `target`
   *  @return (id, dist, pred) — pred null for source/unreached */
  def relax(
      edges: DataFrame, // (src, dst, weight), orientation applied
      nodes: DataFrame, // (id)
      source: Long,
      target: Option[Long] = None,
      heuristic: Option[DataFrame] = None,
      maxIterations: Int = 100): DataFrame = {
    val edgesPart = Lineage.withFastIteration(nodes.sparkSession, enabled = true) {
      edges.repartition(col("src")).sortWithinPartitions("src")
        .localCheckpoint(true)
    }
    val big = edgesPart.count() >= Lineage.aqeOffMinEdges(nodes.sparkSession)
    relaxCore(Ctx(edgesPart, nodes, big), Set.empty, Set.empty,
      source, target, heuristic, maxIterations)
  }

  /** Relaxation over a prepared context with spur exclusions applied as
   *  partitioning-preserving filters (no re-shuffle, no re-checkpoint). */
  private def relaxCore(ctx: Ctx,
      excludedEdges: Set[(Long, Long)], excludedNodes: Set[Long],
      source: Long, target: Option[Long], heuristic: Option[DataFrame],
      maxIterations: Int): DataFrame = Lineage.withFastIteration(
        ctx.nodes.sparkSession, ctx.bigWork) {
    val eEdge = excludedEdges.foldLeft(ctx.edges) { case (f, (s, t)) =>
      f.where(!(col("src") === s && col("dst") === t))
    }
    val edgesPart = if (excludedNodes.isEmpty) eEdge
      else eEdge.where(!col("src").isin(excludedNodes.toSeq: _*) &&
        !col("dst").isin(excludedNodes.toSeq: _*))
    val nodes = if (excludedNodes.isEmpty) ctx.nodes
      else ctx.nodes.where(!col("id").isin(excludedNodes.toSeq: _*))
    val h = heuristic.map(_.select(col("id"), col("h").cast("double").as("h")))
    val base = nodes.select(
      col("id"),
      when(col("id") === source, 0.0).otherwise(lit(Double.PositiveInfinity)).as("dist"),
      lit(null).cast("long").as("pred"),
      (col("id") === source).as("active"))
    var state = (h match {
      case Some(hf) => base.join(hf, Seq("id"), "left_outer")
        .withColumn("h", coalesce(col("h"), lit(0.0)))
      case None => base.withColumn("h", lit(0.0))
    }).cutLineage()

    var iter = 0
    var active = 1L
    // A* upper bound = target's distance in the PREVIOUS state (starts ∞),
    // carried driver-side from the prior iteration's observation.
    var ub = Double.PositiveInfinity
    while (active > 0 && iter < maxIterations) {
      val frontier = state.where(col("active"))
        .select(col("id").as("src"), col("dist").as("sd"))
      val msgs = edgesPart.join(frontier, Seq("src"))
        .select(col("dst").as("id"),
          struct((col("sd") + col("weight")).as("d"), col("src").as("p")).as("m"))
        .groupBy("id").agg(min("m").as("m"))
      val improved = col("m").isNotNull && col("m")("d") < col("dist")
      val obs = org.apache.spark.sql.Observation()
      val tdistMetric = target match {
        case Some(t) => min(when(col("id") === t, col("dist")))
        case None    => min(lit(Double.PositiveInfinity))
      }
      val next = state.join(msgs, Seq("id"), "left_outer")
        .select(col("id"),
          when(improved, col("m")("d")).otherwise(col("dist")).as("dist"),
          when(improved, col("m")("p")).otherwise(col("pred")).as("pred"),
          // A* cutoff: an improved node rescatters only if it could still
          // better the known target distance.
          (improved &&
            (when(improved, col("m")("d")).otherwise(col("dist")) + col("h") < ub))
            .as("active"),
          col("h"))
        .observe(obs,
          sum(col("active").cast("long")).as("act"),
          tdistMetric.as("tdist"))
        .cutLineage()
      Lineage.release(state)
      state = next
      val metrics = obs.get
      active = Option(metrics("act")).map(_.asInstanceOf[Long]).getOrElse(0L)
      ub = Option(metrics("tdist")).map(_.asInstanceOf[Double])
        .getOrElse(Double.PositiveInfinity)
      iter += 1
    }
    state.select(col("id"), col("dist"), col("pred"))
  }

  /** Walk preds target→source. None when target unreached. One collect of
   *  the candidate rows, then a driver-side map walk — replaces the
   *  one-Spark-job-per-hop pattern. The collect is PRUNED to rows with
   *  `dist <= dist(target)` (with non-negative weights every on-path
   *  predecessor satisfies this) and GUARDED like Traversal.traverse:
   *  on an unbounded Dijkstra over a large mostly-connected graph the
   *  unpruned finite set is the whole reachable set — an O(n) driver
   *  collect that the old per-hop lookup never needed (ADVICE r3). */
  def reconstruct(relaxed: DataFrame, source: Long, target: Long,
      maxCollectRows: Long = 2000000L): Option[PathResult] = {
    val tRow = relaxed
      .where(col("id") === target && col("dist") < Double.PositiveInfinity)
      .select(col("dist")).collect()
    if (tRow.isEmpty) return None
    val targetDist = tRow(0).getDouble(0)
    val pruned = relaxed.where(col("dist") <= targetDist)
      .select(col("id"), col("dist"), col("pred"))
    val n = pruned.count()
    if (n > maxCollectRows)
      throw new IllegalStateException(
        s"path reconstruction would collect $n rows (> $maxCollectRows); " +
          "raise maxCollectRows only with driver heap ≈ 48·rows bytes to spare")
    val finite = pruned.collect()
    val dist = finite.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pred = finite.filterNot(_.isNullAt(2))
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cost = dist.getOrElse(target, return None)
    var path = List(target)
    var cur = target
    while (cur != source) {
      cur = pred.getOrElse(cur, return None)
      path = cur :: path
    }
    Some(PathResult(path, cost))
  }

  /** Plain weighted Dijkstra path source→target. Passes `target` into the
   *  relaxation so the A* upper-bound cutoff (h = 0) applies: once the
   *  target has a finite distance, nodes at ≥ that bound stop scattering —
   *  identical distances for every node that can matter to the path
   *  (anything pruned was already ≥ the final target distance), fewer
   *  frontier iterations. */
  def dijkstra(graph: PropertyGraph, source: Long, target: Long,
      orientation: Orientation = Orientation.Natural,
      maxIterations: Int = 100): Option[PathResult] = {
    val r = relaxCore(prepare(graph, orientation), Set.empty, Set.empty,
      source, Some(target), None, maxIterations).cutLineage()
    val res = reconstruct(r, source, target)
    Lineage.release(r)
    res
  }

  /** A* with a per-node admissible heuristic (id, h) — same result as
   *  Dijkstra, fewer scattered frontiers (ShortestPathAStar.java:40). */
  def aStar(graph: PropertyGraph, source: Long, target: Long,
      heuristic: DataFrame,
      orientation: Orientation = Orientation.Natural,
      maxIterations: Int = 100): Option[PathResult] = {
    val e = graph.aggregated(orientation, Aggregation.Min)
    val r = relax(e, graph.nodes.select(col("id")), source, Some(target),
      Some(heuristic), maxIterations).cutLineage()
    reconstruct(r, source, target)
  }

  /** Dijkstra with excluded directed edges / nodes — the primitive Yen's
   *  spur computation needs (YensTest filter semantics: directed pairs). */
  def filteredDijkstra(graph: PropertyGraph, source: Long, target: Long,
      excludedEdges: Set[(Long, Long)], excludedNodes: Set[Long],
      orientation: Orientation = Orientation.Natural,
      maxIterations: Int = 100): Option[PathResult] =
    spurDijkstra(prepare(graph, orientation), source, target,
      excludedEdges, excludedNodes, maxIterations)

  private def spurDijkstra(ctx: Ctx, source: Long, target: Long,
      excludedEdges: Set[(Long, Long)], excludedNodes: Set[Long],
      maxIterations: Int): Option[PathResult] = {
    val r = relaxCore(ctx, excludedEdges, excludedNodes,
      source, Some(target), None, maxIterations).cutLineage()
    val res = reconstruct(r, source, target)
    Lineage.release(r)
    res
  }

  /**
   * Yen's K loopless shortest paths (YensKShortestPaths.java:47): spur on
   * every prefix of the last accepted path, exclude the root-path edges
   * used by already-accepted paths sharing that prefix, candidates ranked
   * (cost asc, path lexicographic) for determinism.
   * @return ordered paths, best first
   */
  def yens(graph: PropertyGraph, source: Long, target: Long, k: Int,
      orientation: Orientation = Orientation.Natural,
      maxIterations: Int = 100): Seq[PathResult] = {
    // ONE prepared edge layout + AQE gate for the whole spur tree — each of
    // the O(k·pathLen) inner Dijkstras previously re-shuffled and
    // re-checkpointed the full edge frame.
    val ctx = prepare(graph, orientation)
    val first = spurDijkstra(ctx, source, target, Set.empty, Set.empty,
      maxIterations).getOrElse { Lineage.release(ctx.edges); return Seq.empty }
    val accepted = scala.collection.mutable.ArrayBuffer(first)
    // candidate pool keyed by path to dedup
    val candidates = scala.collection.mutable.Map[Seq[Long], Double]()

    while (accepted.size < k) {
      val prev = accepted.last.path
      // cost of every root prefix of `prev` in ONE tiny job (was one
      // distributed lookup per spur index)
      val prefixCost = prefixCosts(ctx, prev)
      for (i <- 0 until prev.length - 1) {
        val spurNode = prev(i)
        val rootPath = prev.take(i + 1)
        val rootCost = prefixCost(i)
        val removedEdges = accepted.map(_.path)
          .filter(p => p.length > i && p.take(i + 1) == rootPath)
          .map(p => (p(i), p(i + 1))).toSet
        val removedNodes = rootPath.dropRight(1).toSet
        spurDijkstra(ctx, spurNode, target, removedEdges, removedNodes,
          maxIterations).foreach { spur =>
          val total = rootPath.dropRight(1) ++ spur.path
          if (!accepted.exists(_.path == total))
            candidates.get(total) match {
              case Some(_) => ()
              case None => candidates(total) = rootCost + spur.cost
            }
        }
      }
      if (candidates.isEmpty) { Lineage.release(ctx.edges); return accepted.toSeq }
      val best = candidates.toSeq
        .minBy { case (p, c) => (c, p.map(_.toString).mkString(",")) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String))
      candidates.remove(best._1)
      accepted += PathResult(best._1, best._2)
    }
    Lineage.release(ctx.edges)
    accepted.toSeq
  }

  /** prefix(i) = Σ min-weight of the first i consecutive pairs of `path`
   *  — all prefixes from one collect (paths are short). */
  private def prefixCosts(ctx: Ctx, path: Seq[Long]): Array[Double] = {
    val prefix = new Array[Double](math.max(path.length, 1))
    if (path.length < 2) return prefix
    val pairs = path.sliding(2).map(p => (p(0), p(1))).toSeq
    val cond = pairs.map { case (s, t) => col("src") === s && col("dst") === t }
      .reduce(_ || _)
    val found = ctx.edges.where(cond)
      .select(col("src"), col("dst"), col("weight")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (i <- 1 until path.length)
      prefix(i) = prefix(i - 1) + found((path(i - 1), path(i)))
    prefix
  }
}
