package graft.algos

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * (Weighted) degree centrality — gds.alpha.degree.*
 * (alpha/alpha-algo/.../centrality/degreecentrality/DegreeCentrality.java:34).
 * Weighted sums only positive weights (reference skips weights <= 0 in the
 * weighted accumulation path).
 */
object DegreeCentrality {

  final case class Config(
      orientation: Orientation = Orientation.Natural,
      weighted: Boolean = false)

  /** @return (id, score) */
  def run(graph: PropertyGraph, config: Config = Config()): DataFrame = {
    val e = graph.oriented(config.orientation)
    val scored =
      if (config.weighted)
        e.where(col("weight") > 0.0)
          .groupBy(col("src").as("id")).agg(sum("weight").as("score"))
      else
        e.groupBy(col("src").as("id"))
          .agg(count(lit(1)).cast("double").as("score"))
    graph.nodes.select(col("id"))
      .join(scored, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("score"), lit(0.0)).as("score"))
  }
}
