package graft.algos

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Random walks — gds.alpha.randomWalk.stream
 * (alpha/.../impl/walking/RandomWalk.java:45, node2vec (p,q) bias):
 * `walksPerNode` walks of length `steps` from each start node.
 *
 * Spark-native determinism: instead of per-thread RNGs (the reference's
 * approach, irreproducible across schedulings), the "random" choice at
 * step t of walk w is `xxhash64(walkId, t, seed) % degree(current)` — a
 * pure function of (walk, step, seed), so the output is identical at any
 * parallelism. Each step is one join against the sorted adjacency table
 * (element_at picks the neighbor); walks advance in lockstep supersteps.
 *
 * node2vec bias: the uniform choice above corresponds to p=q=1; the biased
 * variant would weight the modulo draw by the (return/in-out) class of
 * each candidate — out of scope for this slice, noted for parity.
 */
object RandomWalk {

  final case class Config(
      steps: Int = 10,
      walksPerNode: Int = 1,
      seed: Long = 42L,
      orientation: Orientation = Orientation.Natural)

  /** @return (walkId, startNode, path: array<long>) */
  def run(graph: PropertyGraph, config: Config = Config()): DataFrame = {
    val adj = graph.adjacency(config.orientation).cutLineage()

    var walks = graph.nodes.select(col("id").as("start"))
      .crossJoin(spark_range(graph.nodes.sparkSession, config.walksPerNode))
      .select(
        (col("start") * config.walksPerNode + col("w")).as("walkId"),
        col("start"),
        array(col("start")).as("path"),
        col("start").as("current"),
        lit(false).as("stopped"))
      .cutLineage()

    for (step <- 1 to config.steps) {
      walks = walks
        .join(adj.select(col("id").as("current"), col("neighbors")),
          Seq("current"), "left_outer")
        .select(col("walkId"), col("start"), col("path"),
          col("neighbors"),
          (col("stopped") || col("neighbors").isNull ||
            size(col("neighbors")) === 0).as("stopped"))
        .select(col("walkId"), col("start"),
          when(col("stopped"), col("path"))
            .otherwise(concat(col("path"), array(element_at(col("neighbors"),
              (pmod(xxhash64(col("walkId"), lit(step), lit(config.seed)),
                size(col("neighbors")).cast("long")) + 1).cast("int")))))
            .as("path"),
          col("stopped"))
        .select(col("walkId"), col("start"), col("path"),
          element_at(col("path"), -1).as("current"), col("stopped"))
        .cutLineage()
    }
    walks.select(col("walkId"), col("start"), col("path"))
  }

  private def spark_range(spark: org.apache.spark.sql.SparkSession, n: Int) =
    spark.range(n).select(col("id").as("w"))
}
