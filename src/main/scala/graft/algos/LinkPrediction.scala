package graft.algos

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-prediction scalar scores — the gds.alpha.linkprediction.* function
 * family (alpha/alpha-proc/.../LinkPredictionFunc.java): adamicAdar,
 * commonNeighbors, preferentialAttachment, resourceAllocation,
 * totalNeighbors, sameCommunity. The reference computes them per node
 * pair via adjacency intersection; here a whole DataFrame of (node1,
 * node2) pairs is scored in one plan — adjacency arrays join in, the
 * intersection is a codegen'd collection expression, and the degree-sum
 * kernels (adamicAdar/resourceAllocation) explode only the intersection
 * (output-linear).
 *
 * @return pairs + columns: commonNeighbors, totalNeighbors,
 *         preferentialAttachment, adamicAdar, resourceAllocation
 */
object LinkPrediction {

  def scores(graph: PropertyGraph, pairs: DataFrame,
      orientation: Orientation = Orientation.Undirected): DataFrame = {
    val adj = graph.adjacency(orientation).cutLineage()
    val deg = adj.select(col("id"), size(col("neighbors")).cast("double").as("d"))

    val withAdj = pairs
      .join(adj.select(col("id").as("node1"), col("neighbors").as("n1")),
        Seq("node1"), "left_outer")
      .join(adj.select(col("id").as("node2"), col("neighbors").as("n2")),
        Seq("node2"), "left_outer")
      .select(col("node1"), col("node2"),
        coalesce(col("n1"), array().cast("array<long>")).as("n1"),
        coalesce(col("n2"), array().cast("array<long>")).as("n2"))
      .withColumn("common", array_intersect(col("n1"), col("n2")))

    val base = withAdj.select(col("node1"), col("node2"),
      size(col("common")).cast("long").as("commonNeighbors"),
      size(col("n1")).cast("long").as("d1"),
      size(col("n2")).cast("long").as("d2"),
      col("common"))

    // Σ over common neighbors z of 1/log(deg z) and 1/deg z
    val kernels = base
      .select(col("node1"), col("node2"), explode(col("common")).as("id"))
      .join(deg, Seq("id"))
      .groupBy("node1", "node2")
      .agg(
        sum(when(col("d") > 1.0, lit(1.0) / log(col("d"))).otherwise(0.0))
          .as("adamicAdar"),
        sum(when(col("d") > 0.0, lit(1.0) / col("d")).otherwise(0.0))
          .as("resourceAllocation"))

    base.join(kernels, Seq("node1", "node2"), "left_outer")
      .select(col("node1"), col("node2"),
        col("commonNeighbors"),
        (col("d1") + col("d2") - col("commonNeighbors")).as("totalNeighbors"),
        (col("d1") * col("d2")).cast("double").as("preferentialAttachment"),
        coalesce(col("adamicAdar"), lit(0.0)).as("adamicAdar"),
        coalesce(col("resourceAllocation"), lit(0.0)).as("resourceAllocation"))
  }

  /** gds.alpha.linkprediction.sameCommunity over a community column. */
  def sameCommunity(pairs: DataFrame, communities: DataFrame): DataFrame =
    pairs
      .join(communities.select(col("id").as("node1"), col("community").as("c1")),
        Seq("node1"), "left_outer")
      .join(communities.select(col("id").as("node2"), col("community").as("c2")),
        Seq("node2"), "left_outer")
      .select(col("node1"), col("node2"),
        when(col("c1").isNotNull && col("c1") === col("c2"), 1.0)
          .otherwise(0.0).as("sameCommunity"))
}
