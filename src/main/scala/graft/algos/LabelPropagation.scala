package graft.algos

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Label Propagation with the reference's vote semantics
 * (algo/.../labelpropagation/LabelPropagation.java:45-192):
 *
 *  - vote(label) += relationshipWeight * nodeWeight(neighbor)
 *    (ComputeStepConsumer.java:44-77); ties go to the smaller label id
 *    (:64-77);
 *  - init label = seedProperty when present, else a deterministic id-based
 *    label (InitStep.java:58-79 assigns `maxSeedId + originalNodeId + 1`
 *    unseeded; with no seeds this is order-isomorphic to using the node id
 *    itself, which is what we do — label *values* are then node ids,
 *    matching how the reference's tests name communities);
 *  - default maxIterations = 10 (LabelPropagationBaseConfig.java:40);
 *    converged when no node changed an iteration.
 *
 * Divergence, pinned deliberately (SURVEY.md §2.C caveat + §7.4): the
 * reference updates labels in place while sweeping nodes in id order
 * within an iteration (ComputeStep.java:84-90 reads `existingLabels` that
 * other batches mutate), i.e. it is semi-asynchronous and its
 * one-iteration goldens depend on sweep order. A distributed superstep is
 * synchronous by construction; we pin OUR goldens under synchronous
 * semantics with the total-order tie-break (weight desc, label asc),
 * which is deterministic across any partitioning/parallelism — the
 * property the north rule needs. LabelPropagationSpec asserts both our
 * synchronous result and documents the reference's sequential one.
 *
 * No active-set pruning: unlike sum/min folds, the weighted-argmax vote is
 * not incremental — an unchanged neighbor still participates in every
 * re-tally — so each iteration re-tallies every node's full neighborhood.
 * (The reference does the same: every iteration sweeps all nodes,
 * LabelPropagation.java:148-170.)
 *
 * Spark plan per iteration: hash join (edges ⋈ labels on dst) → two hash
 * aggregates ((id,label)→Σw partial+final, then max_by argmax) →
 * left-join update; lineage cut with localCheckpoint per iteration.
 */
object LabelPropagation {

  final case class Config(
      maxIterations: Int = 10,
      seedProperty: Option[String] = None,
      nodeWeightProperty: Option[String] = None,
      orientation: Orientation = Orientation.Undirected,
      pregel: PregelConfig = PregelConfig())

  /** @return (id, label) */
  def run(graph: PropertyGraph, config: Config = Config()): DataFrame =
    runImpl(graph, config)

  private def runImpl(graph: PropertyGraph, config: Config): DataFrame = {
    // partition once by the join key (dst — labels are pulled from the
    // neighbor side) and sort inside each partition; localCheckpoint (NOT
    // cutLineage, which rebuilds the frame and drops outputPartitioning/
    // ordering) preserves the layout across iterations so only the small
    // label side shuffles AND only the small side sorts per round — the
    // per-round re-sort of the big edge side was the dominant superstep
    // cost on the 46 M-edge scaling graph.
    // (AQE off during the eager checkpoint, or the captured partitioning
    // is UnknownPartitioning — see PropertyGraph.pregelEdges.)
    val edges = Lineage.withFastIteration(graph.spark, enabled = true) {
      graph.oriented(config.orientation)
        .select(col("src"), col("dst"), col("weight"))
        .repartition(col("dst"))
        .sortWithinPartitions("dst")
        .localCheckpoint(true)
    }
    val bigWork = edges.count() >= Lineage.aqeOffMinEdges(graph.spark)
    Lineage.withFastIteration(graph.spark, bigWork) {

    val initLabel = config.seedProperty match {
      case Some(p) => col(p).cast("long")
      case None    => col("id")
    }
    val nodeWeight = config.nodeWeightProperty match {
      case Some(p) => col(p).cast("double")
      case None    => lit(1.0)
    }

    var labels = graph.nodes
      .select(col("id"), initLabel.as("label"), nodeWeight.as("nodeWeight"))
      .cutLineage()

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < config.maxIterations) {
      // pull: each node tallies votes from its (oriented) out-neighbors.
      val votes = edges
        .join(labels.select(col("id").as("dst"), col("label"),
          col("nodeWeight")), Seq("dst"))
        .groupBy(col("src").as("id"), col("label"))
        .agg(sum(col("weight") * col("nodeWeight")).as("w"))
        .groupBy("id")
        .agg(expr("max_by(label, named_struct('w', w, 'nl', -label))").as("newLabel"))

      val updated = labels.join(votes, Seq("id"), "left_outer")
        .select(col("id"),
          coalesce(col("newLabel"), col("label")).as("label"),
          col("nodeWeight"),
          (coalesce(col("newLabel"), col("label")) =!= col("label")).as("ch"))
        .cutLineage()

      changed = updated.where(col("ch")).count()
      Lineage.release(labels)
      labels = updated.drop("ch")
      iter += 1
    }
    labels.select(col("id"), col("label"))
    } // withFastIteration
  }
}
