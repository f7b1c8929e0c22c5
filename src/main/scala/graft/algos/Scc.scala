package graft.algos

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Strongly Connected Components — gds.alpha.scc.*
 * (alpha/.../impl/scc/SccAlgorithm.java:34 is sequential iterative Tarjan;
 * SURVEY.md §2 maps it to the Spark-friendly forward/backward reachability
 * coloring). Algorithm (Orzan-style coloring, hardened per VERDICT r2 #5):
 *
 *   repeat until no unassigned vertices:
 *     0. TRIM: peel vertices with zero in-degree or zero out-degree in the
 *        unassigned subgraph — each is a singleton SCC (they can't lie on
 *        any cycle). A few bounded peel rounds per outer round strip the
 *        DAG fringe for one cheap job each.
 *     1. every unassigned vertex starts with priority xxhash64(id);
 *        propagate the max (priority, id) along FORWARD edges to fixpoint
 *        — color(v) = the highest-priority vertex that reaches v;
 *     2. from each color ROOT r (color(r) = r), propagate membership along
 *        BACKWARD edges inside the color class — vertices both reachable
 *        from r and reaching r form the SCC of r; label the SCC with its
 *        MAX MEMBER id (the output contract) and remove it.
 *
 * Hash priorities (not raw ids) are the worst-case guard: with id-ordered
 * colors a descending-id chain makes every round assign a single SCC
 * (O(n) outer rounds); with a pseudo-random priority permutation the
 * expected outer-round count is O(log n) on such chains, because each
 * round's color roots are the per-class priority maxima of a random
 * permutation. Results stay exact and deterministic: xxhash64 is a fixed
 * function, and the emitted component id is always max(member id).
 */
object Scc {

  /** Every outer round assigns at least one SCC (each color root always
   *  forms one), so the loop terminates without a cap; a finite
   *  `maxOuterIterations` is a user-supplied budget and hitting it with
   *  vertices still unassigned is an error, never a silent omission.
   *  `trimRoundsPerOuter` bounds the peel fixpoint per outer round — on a
   *  long path the full peel is O(n) rounds, so trimming takes the cheap
   *  fringe and leaves deep chains to the hash-colored rounds. */
  final case class Config(
      maxOuterIterations: Int = Int.MaxValue,
      trimRoundsPerOuter: Int = 3)

  /** @return (id, component) — component = max id in the SCC */
  def run(graph: PropertyGraph, config: Config = Config()): DataFrame =
    runImpl(graph, config)._1

  /** run + outer-round count (coloring rounds, excluding trim peels) —
   *  the bound the DAG-chain regression test pins. */
  def runWithStats(graph: PropertyGraph, config: Config = Config()): (DataFrame, Int) =
    runImpl(graph, config)

  private def runImpl(graph: PropertyGraph, config: Config): (DataFrame, Int) = {
    val fwd = graph.edges.select(col("src"), col("dst")).distinct()
      .cutLineage()
    val bwd = fwd.select(col("dst").as("src"), col("src").as("dst"))

    var unassigned = graph.nodes.select(col("id")).cutLineage()
    var result = graph.nodes.sparkSession.emptyDataFrame
    var first = true
    def addAssigned(assigned: DataFrame): Unit = {
      val resultNew = if (first) assigned.cutLineage()
                      else result.unionByName(assigned).cutLineage()
      val unassignedNew = unassigned
        .join(assigned.select(col("id")), Seq("id"), "left_anti")
        .cutLineage()
      // both new frames are materialized; the superseded ones can go
      // (release is a no-op on the initial non-checkpointed frames)
      Lineage.release(result)
      Lineage.release(unassigned)
      result = resultNew
      first = false
      unassigned = unassignedNew
    }

    var outer = 0
    var remaining = unassigned.count()
    while (remaining > 0 && outer < config.maxOuterIterations) {
      outer += 1

      // phase 0: bounded trim — singleton SCCs with no in- or no out-edge
      // in the unassigned subgraph. One join + one anti-join per peel.
      var peel = 0
      var peeled = 1L
      while (peeled > 0 && peel < config.trimRoundsPerOuter && remaining > 0) {
        val sub = fwd
          .join(unassigned.withColumnRenamed("id", "src"), Seq("src"))
          .join(unassigned.withColumnRenamed("id", "dst"), Seq("dst"))
        val onCycleCandidate = sub.select(col("src").as("id"))
          .intersect(sub.select(col("dst").as("id")))
        val trivial = unassigned.join(onCycleCandidate, Seq("id"), "left_anti")
          .cutLineage()
        peeled = trivial.count()
        if (peeled > 0) {
          addAssigned(trivial.select(col("id"), col("id").as("component")))
          remaining -= peeled
        }
        // addAssigned checkpointed everything derived from it
        Lineage.release(trivial)
        peel += 1
      }
      if (remaining <= 0) {
        // trim finished the graph; outer round did no coloring work.
        outer -= 1
      } else {
        // phase 1: forward max-(priority, id) fixpoint on the unassigned
        // subgraph. The struct max is a total order (hash ties broken by
        // id), so the fixpoint is deterministic under any parallelism.
        // Prepared layout (hash(src) + sorted, AQE-off checkpoint — see
        // PropertyGraph.pregelEdges): the fixpoint joins on src every
        // iteration, so neither exchange nor sort recurs on the edge side.
        val spark = graph.nodes.sparkSession
        val sub = Lineage.withFastIteration(spark, enabled = true) {
          fwd
            .join(unassigned.withColumnRenamed("id", "src"), Seq("src"))
            .join(unassigned.withColumnRenamed("id", "dst"), Seq("dst"))
            .repartition(col("src")).sortWithinPartitions("src")
            .localCheckpoint(true)
        }

        val ownColor = struct(xxhash64(col("id")).as("prio"), col("id").as("cid"))
        var colors = unassigned.select(col("id"), ownColor.as("color"))
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
          Lineage.release(colors)
          colors = next.drop("ch")
        }

        // phase 2: backward reachability of each color root within its
        // class. The reversed subgraph suffices (member and the color
        // filter both stay inside the unassigned set), prepared the same
        // way since this loop also joins on src every iteration.
        val subBwd = Lineage.withFastIteration(spark, enabled = true) {
          sub.select(col("dst").as("src"), col("src").as("dst"))
            .repartition(col("src")).sortWithinPartitions("src")
            .localCheckpoint(true)
        }
        var member = colors.where(col("id") === col("color")("cid"))
          .select(col("id"), col("color")).cutLineage()
        var grew = 1L
        while (grew > 0) {
          val expand = subBwd
            .join(member.select(col("id").as("src"), col("color")), Seq("src"))
            .select(col("dst").as("id"), col("color"))
            .join(colors, Seq("id", "color")) // stay within the color class
            .distinct()
          val next = member.unionByName(expand).distinct().cutLineage()
          grew = next.count() - member.count()
          Lineage.release(member)
          member = next
        }
        Lineage.release(sub)
        Lineage.release(subBwd)

        // output contract: component = max member id of the SCC
        val label = member.groupBy(col("color"))
          .agg(max("id").as("component"))
        val assigned = member.join(label, Seq("color"))
          .select(col("id"), col("component"))
        addAssigned(assigned)
        // result/unassigned are re-checkpointed; this round's working
        // frames can go
        Lineage.release(colors)
        Lineage.release(member)
        remaining = unassigned.count()
      }
    }
    if (remaining > 0)
      throw new IllegalStateException(
        s"SCC did not converge within ${config.maxOuterIterations} outer rounds; " +
          s"$remaining vertices unassigned")
    // result is checkpointed and handed to the caller; the rest can go
    Lineage.release(fwd)
    Lineage.release(unassigned)
    (result, outer)
  }
}
