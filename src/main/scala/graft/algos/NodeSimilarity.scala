package graft.algos

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Node Similarity — gds.nodeSimilarity.* (algo/.../nodesim/NodeSimilarity.java:111-436):
 * Jaccard over neighbor sets, J = |A∩B| / |A∪B| (:332-339); candidate pairs
 * are nodes sharing at least one neighbor; knobs mirror
 * NodeSimilarityBaseConfig.java:33-100 — `degreeCutoff` (min degree 1),
 * `similarityCutoff` (1e-42), `topK` per node (10).
 *
 * Spark plan: shared-neighbor equi-join generates candidates with their
 * intersection sizes in ONE aggregation (no per-pair set materialization);
 * degrees join in to finish the Jaccard; window row_number bounds topK
 * (reference uses per-node bounded heaps, TopKMap.java:38 — the window is
 * the distributed equivalent). Ties order by (similarity desc, b asc) —
 * deterministic under any partitioning.
 */
object NodeSimilarity {

  /**
   * @param sourceNodes optional (id) frame restricting which nodes appear
   *        as pair endpoints — the reference's sourceIds/targetIds knob
   *        (SimilarityAlgorithm sourceIds). Also the scale lever: the
   *        shared-neighbor candidate join is Σ_t indeg(t)² and a full run
   *        on a hub-heavy graph is genuinely quadratic; GDS answers with
   *        cutoffs/topK, we additionally allow an explicit endpoint set.
   */
  final case class Config(
      topK: Int = 10,
      degreeCutoff: Long = 1,
      similarityCutoff: Double = 1e-42,
      orientation: Orientation = Orientation.Natural,
      sourceNodes: Option[DataFrame] = None)

  /** @return (node1, node2, similarity, rank) — rank 1..topK per node1 */
  def run(graph: PropertyGraph, config: Config = Config()): DataFrame = {
    // distinct neighbor sets under the chosen orientation
    val adj0 = graph.oriented(config.orientation)
      .select(col("src"), col("dst")).distinct()
    val deg = adj0.groupBy("src").agg(count(lit(1)).as("d"))
      .where(col("d") >= config.degreeCutoff)
    // endpoint restriction applies to pair endpoints, not to the shared
    // neighbors (degrees stay full-graph, so Jaccard values are unchanged).
    val adj = config.sourceNodes match {
      case Some(s) => adj0.join(broadcast(s.select(col("id").as("src"))), Seq("src"))
      case None    => adj0
    }

    // candidates via shared neighbor; intersection size in one aggregate
    val l = adj.join(deg, Seq("src")).select(col("src").as("a"), col("dst"), col("d").as("da"))
    val r = adj.join(deg, Seq("src")).select(col("src").as("b"), col("dst"), col("d").as("db"))
    val inter = l.join(r, Seq("dst")).where(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"), first("da").as("da"), first("db").as("db"))

    val sims = inter.select(col("a").as("node1"), col("b").as("node2"),
      (col("inter").cast("double") /
        (col("da") + col("db") - col("inter"))).as("similarity"))
      .where(col("similarity") >= config.similarityCutoff)

    sims.withColumn("rank", row_number().over(
        Window.partitionBy("node1")
          .orderBy(col("similarity").desc, col("node2").asc)))
      .where(col("rank") <= config.topK)
  }
}
