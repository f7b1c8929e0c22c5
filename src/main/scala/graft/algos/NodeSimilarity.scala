package graft.algos

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Node Similarity — gds.nodeSimilarity.* (algo/.../nodesim/NodeSimilarity.java:111-436):
 * Jaccard over neighbor sets. Unweighted J = |A∩B| / |A∪B|; weighted
 * (relationshipWeightProperty set) J = Σ_c min(w_A(c), w_B(c)) /
 * Σ_c max(w_A(c), w_B(c)) over the union (NodeSimilarity.java:332-339) —
 * computed as Σmin(shared) / (Σw_A + Σw_B − Σmin(shared)), since an
 * unshared neighbor contributes its full weight to the max term and 0 to
 * the min. Candidate pairs are nodes sharing ≥1 neighbor; knobs mirror
 * NodeSimilarityBaseConfig.java:33-138 — `degreeCutoff` (min degree 1),
 * `similarityCutoff` (1e-42), per-node `topK` (10) / `bottomK`, global
 * `topN` / `bottomN` (0 = unbounded), mutually exclusive within each pair
 * exactly as the reference validates.
 *
 * Spark plan: shared-neighbor equi-join generates candidates with their
 * intersection (count or Σmin) in ONE aggregation; degrees join in to
 * finish the Jaccard; window row_number bounds topK/bottomK (reference
 * uses per-node bounded heaps, TopKMap.java:38 — the window is the
 * distributed equivalent); global topN/bottomN is an orderBy + limit over
 * the already-K-bounded frame. Ties order by (similarity, node2 asc) —
 * deterministic under any partitioning.
 */
object NodeSimilarity {

  /**
   * @param sourceNodes optional (id) frame restricting which nodes appear
   *        as pair endpoints — the reference's sourceIds/targetIds knob.
   *        Also the scale lever: the shared-neighbor candidate join is
   *        Σ_t indeg(t)² and a full run on a hub-heavy graph is genuinely
   *        quadratic; GDS answers with cutoffs/topK, we additionally allow
   *        an explicit endpoint set.
   */
  final case class Config(
      topK: Int = 10,
      bottomK: Int = 0,
      topN: Int = 0,
      bottomN: Int = 0,
      degreeCutoff: Long = 1,
      similarityCutoff: Double = 1e-42,
      weighted: Boolean = false,
      orientation: Orientation = Orientation.Natural,
      sourceNodes: Option[DataFrame] = None) {
    require(bottomK == 0 || topK == 10, // 10 = untouched default
      "Invalid parameter combination: topK and bottomK are mutually exclusive")
    require(topN == 0 || bottomN == 0,
      "Invalid parameter combination: topN and bottomN are mutually exclusive")
  }

  /** @return (node1, node2, similarity, rank) — rank 1..K per node1 */
  def run(graph: PropertyGraph, config: Config = Config()): DataFrame = {
    // neighbor multiset under the chosen orientation: distinct pairs with
    // weight 1 (unweighted) or parallel edges summed (weighted).
    val adj0 =
      if (config.weighted)
        graph.aggregated(config.orientation, Aggregation.Sum)
          .select(col("src"), col("dst"), col("weight").as("w"))
      else
        graph.oriented(config.orientation)
          .select(col("src"), col("dst")).distinct()
          .withColumn("w", lit(1.0))
    val deg = adj0.groupBy("src")
      .agg(count(lit(1)).as("d"), sum("w").as("wd"))
      .where(col("d") >= config.degreeCutoff)
    // endpoint restriction applies to pair endpoints, not to the shared
    // neighbors (degrees stay full-graph, so Jaccard values are unchanged).
    val adj = config.sourceNodes match {
      case Some(s) => adj0.join(broadcast(s.select(col("id").as("src"))), Seq("src"))
      case None    => adj0
    }

    // candidates via shared neighbor; Σ min(w_a, w_b) in one aggregate
    // (= intersection count in the unweighted case, where every w is 1).
    val l = adj.join(deg, Seq("src"))
      .select(col("src").as("a"), col("dst"), col("w").as("wa"), col("wd").as("wda"))
    val r = adj.join(deg, Seq("src"))
      .select(col("src").as("b"), col("dst"), col("w").as("wb"), col("wd").as("wdb"))
    val inter = l.join(r, Seq("dst")).where(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(sum(least(col("wa"), col("wb"))).as("smin"),
        first("wda").as("wda"), first("wdb").as("wdb"))

    val sims = inter.select(col("a").as("node1"), col("b").as("node2"),
      (col("smin") / (col("wda") + col("wdb") - col("smin"))).as("similarity"))
      .where(col("similarity") >= config.similarityCutoff)

    val perNodeOrder =
      if (config.bottomK > 0) Window.partitionBy("node1")
        .orderBy(col("similarity").asc, col("node2").asc)
      else Window.partitionBy("node1")
        .orderBy(col("similarity").desc, col("node2").asc)
    val k = if (config.bottomK > 0) config.bottomK else config.topK
    val ranked = sims
      .withColumn("rank", row_number().over(perNodeOrder))
      .where(col("rank") <= k)

    // global N bound applied AFTER the per-node K bound, like the
    // reference's topN-over-topK pipeline (NodeSimilarity.java:201-230).
    if (config.topN > 0)
      ranked.orderBy(col("similarity").desc, col("node1").asc, col("node2").asc)
        .limit(config.topN)
    else if (config.bottomN > 0)
      ranked.orderBy(col("similarity").asc, col("node1").asc, col("node2").asc)
        .limit(config.bottomN)
    else ranked
  }
}
