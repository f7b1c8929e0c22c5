package graft.algos

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Strongly Connected Components — gds.alpha.scc.*
 * (alpha/.../impl/scc/SccAlgorithm.java:34 is sequential iterative Tarjan;
 * SURVEY.md §2 maps it to the Spark-friendly forward/backward reachability
 * coloring). Algorithm (the "coloring/FW-BW label" scheme):
 *
 *   repeat until no unassigned vertices:
 *     1. every unassigned vertex starts with color = its id;
 *        propagate max color along FORWARD edges to fixpoint
 *        (color(v) = max(color(v), colors of in-neighbors)) — color(v)=c
 *        means "reachable from c";
 *     2. from each color root c, propagate membership along BACKWARD
 *        edges inside the color class — vertices both reachable from c
 *        and reaching c form the SCC of c; assign them component c;
 *     3. remaining vertices repeat.
 *
 * Exact SCC ids (component = max vertex id in the SCC under this scheme —
 * deterministic), each phase a min/max-label Pregel-style fixpoint.
 */
object Scc {

  /** Every outer round assigns at least one SCC (the max-color root always
   *  forms one), so the loop terminates without a cap; a finite
   *  `maxOuterIterations` is a user-supplied budget and hitting it with
   *  vertices still unassigned is an error, never a silent omission. */
  final case class Config(maxOuterIterations: Int = Int.MaxValue)

  /** @return (id, component) — component = max id in the SCC */
  def run(graph: PropertyGraph, config: Config = Config()): DataFrame =
    runImpl(graph, config)

  private def runImpl(graph: PropertyGraph, config: Config): DataFrame = {
    val fwd = graph.edges.select(col("src"), col("dst")).distinct()
      .cutLineage()
    val bwd = fwd.select(col("dst").as("src"), col("src").as("dst"))

    var unassigned = graph.nodes.select(col("id")).cutLineage()
    var result = graph.nodes.sparkSession.emptyDataFrame
    var first = true

    var outer = 0
    var remaining = unassigned.count()
    while (remaining > 0 && outer < config.maxOuterIterations) {
      outer += 1
      // phase 1: forward max-color fixpoint on the unassigned subgraph
      val sub = fwd
        .join(unassigned.withColumnRenamed("id", "src"), Seq("src"))
        .join(unassigned.withColumnRenamed("id", "dst"), Seq("dst"))
        .cutLineage()

      var colors = unassigned.select(col("id"), col("id").as("color"))
        .cutLineage()
      var changed = 1L
      while (changed > 0) {
        val better = sub
          .join(colors.select(col("id").as("src"), col("color")), Seq("src"))
          .groupBy(col("dst").as("id")).agg(max("color").as("nc"))
        val next = colors.join(better, Seq("id"), "left_outer")
          .select(col("id"),
            greatest(col("color"), coalesce(col("nc"), col("color"))).as("color"),
            (coalesce(col("nc"), col("color")) > col("color")).as("ch"))
          .cutLineage()
        changed = next.where(col("ch")).count()
        colors = next.drop("ch")
      }

      // phase 2: backward reachability of each color root within its class
      var member = colors.where(col("id") === col("color"))
        .select(col("id"), col("color")).cutLineage()
      var grew = 1L
      while (grew > 0) {
        val expand = bwd
          .join(member.select(col("id").as("src"), col("color")), Seq("src"))
          .select(col("dst").as("id"), col("color"))
          .join(colors, Seq("id", "color")) // stay within the color class
          .distinct()
        val next = member.unionByName(expand).distinct().cutLineage()
        grew = next.count() - member.count()
        member = next
      }

      val assigned = member.select(col("id"), col("color").as("component"))
      result = if (first) assigned.cutLineage()
               else result.unionByName(assigned).cutLineage()
      first = false
      unassigned = unassigned.join(assigned.select(col("id")), Seq("id"), "left_anti")
        .cutLineage()
      remaining = unassigned.count()
    }
    if (remaining > 0)
      throw new IllegalStateException(
        s"SCC did not converge within ${config.maxOuterIterations} outer rounds; " +
          s"$remaining vertices unassigned")
    result
  }
}
