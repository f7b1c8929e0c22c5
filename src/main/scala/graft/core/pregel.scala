package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import java.nio.file.{Files, Paths, StandardOpenOption}

/**
 * Configuration for the superstep engine. Mirrors the knobs of the
 * reference's Pregel framework (core/.../beta/pregel/PregelConfig.java:
 * maxIterations, isAsynchronous:48 — we are always synchronous) plus the
 * checkpoint/lineage surface the reference lacks entirely (SURVEY.md §4.2:
 * "checkpoint/lineage: none — ours must add it").
 *
 * @param maxIterations   hard cap on supersteps
 * @param checkpointDir   when set, every `checkpointEvery` supersteps the
 *                        vertex state is written to
 *                        `<dir>/superstep=<k>/state` as parquet and the
 *                        in-flight plan is replaced by a re-read of that
 *                        parquet — this both cuts lineage and guarantees a
 *                        resumed run continues from byte-identical state.
 * @param checkpointEvery cadence of durable checkpoints
 * @param trackMetrics    when true, per-superstep lineage metrics
 *                        (messages, active vertices, delta norm, skew
 *                        ratio, wall ms) are computed and appended to
 *                        `<dir>/lineage.jsonl` (or kept in memory when no
 *                        dir is configured)
 * @param stopAfter       test hook: abort the loop after superstep k as if
 *                        the job died (used by resume tests)
 * @param edgesPrepared   the caller already shaped the edge frame via
 *                        [[PropertyGraph.pregelEdges]] (hash(src)-
 *                        partitioned, sorted within partitions,
 *                        checkpointed) — skip the engine's own
 *                        repartition+sort+checkpoint, avoiding a second
 *                        full shuffle and materialization of the edges
 */
final case class PregelConfig(
    maxIterations: Int = 20,
    checkpointDir: Option[String] = None,
    checkpointEvery: Int = 1,
    trackMetrics: Boolean = false, // forced on whenever checkpointDir is set
    stopAfter: Option[Int] = None,
    edgesPrepared: Boolean = false)

/** One superstep's lineage record (north rule: "every superstep writes
 *  per-partition lineage and metrics — messages sent, delta norm, skew
 *  ratio — to a checkpoint directory"). */
final case class SuperstepMetrics(
    superstep: Int,
    activeVertices: Long,
    messages: Long,
    deltaNorm: Double,
    skewRatio: Double,
    wallMillis: Long) {
  def toJson: String =
    s"""{"superstep":$superstep,"activeVertices":$activeVertices,""" +
      s""""messages":$messages,"deltaNorm":$deltaNorm,""" +
      s""""skewRatio":$skewRatio,"wallMillis":$wallMillis}"""
}

final case class PregelResult(
    vertices: DataFrame,
    supersteps: Int,
    converged: Boolean,
    metrics: Seq[SuperstepMetrics])

/** Thrown by the `stopAfter` test hook to simulate a mid-run crash. */
final class PregelKilledException(val superstep: Int)
  extends RuntimeException(s"killed after superstep $superstep (test hook)")

/**
 * Synchronous vertex-centric superstep combinator — the Spark-native
 * re-expression of the reference's Pregel loop
 * (core/.../beta/pregel/Pregel.java:60-659). The mapping:
 *
 *  - per-node message queues (Pregel.java:73,267-282)  → a shuffled,
 *    pre-combined messages DataFrame (`groupBy(id).agg(...)` gives
 *    map-side partial aggregation for free);
 *  - sender/receiver/vote-to-halt bitsets (:175-199)   → the `_active`
 *    boolean column on the vertex state;
 *  - barrier between supersteps (:241-264)             → the action that
 *    materializes the new state each iteration;
 *  - termination when no messages sent (:197-199)      → `_changed` count
 *    reaching zero.
 *
 * The reference delivers individual messages; all four tier-1 algorithms
 * only ever fold them (sum / min / weighted argmax), so a combiner-based
 * formulation is semantics-preserving (SURVEY.md §2.C).
 *
 * All hooks are Column expressions, never Scala closures, so every
 * superstep stays inside whole-stage codegen.
 */
object Pregel {

  /** Marker columns managed by the engine on the vertex state frame. */
  val ACTIVE  = "_active"   // does this vertex scatter next superstep?
  val CHANGED = "_changed"  // did this vertex change this superstep? (convergence)
  val DELTA   = "_delta"    // numeric magnitude of the change (deltaNorm metric)
  val MSG     = "_msg"      // combined inbound message column (visible to update exprs)

  /**
   * Run the superstep loop.
   *
   * @param initial   vertex frame: `id: long`, state columns, plus ACTIVE /
   *                  CHANGED / DELTA markers (init step = reference
   *                  PregelComputation.init)
   * @param edges     `src, dst, weight` (orientation already applied)
   * @param msgExpr   message value, evaluated on edge rows joined with the
   *                  *source* vertex state (all state cols visible, plus
   *                  `weight`) — reference sendToNeighbors /
   *                  applyRelationshipWeight (Pregel.java:389-407)
   * @param combine   reduces the raw `(id, _msg)` rows to one row per id —
   *                  e.g. Combiners.sum / min / weightedArgmax
   * @param updateExprs new values for the state columns (incl. markers),
   *                  evaluated on old-state LEFT JOIN combined-messages;
   *                  `MSG` is null for vertices that received nothing
   */
  def run(
      initial: DataFrame,
      edges: DataFrame,
      msgExpr: Column,
      combine: DataFrame => DataFrame,
      updateExprs: Seq[Column],
      config: PregelConfig = PregelConfig()): PregelResult = {

    val spark = initial.sparkSession
    val ckpt = config.checkpointDir.map(new CheckpointManager(_))

    // Hash-partition the (large, static) edge relation by the join key
    // ONCE and sort it by src INSIDE each partition; localCheckpoint (NOT
    // cutLineage — it must keep the partitioning and ordering, and a
    // once-carried stat can't grow) lets every superstep's edges⋈vertices
    // sort-merge join reuse BOTH: no exchange and no re-sort of the big
    // side per superstep (the re-sort was measured at ~60% of a WCC
    // superstep's wall on the 46 M-edge scaling graph). This is the
    // per-superstep shuffle-minimization the north rule calls out.
    // `edgesPrepared` callers did this themselves via pregelEdges —
    // folding the parallel-edge aggregation into the same single shuffle.
    // AQE must be OFF while the eager checkpoint materializes, or the
    // LogicalRDD snapshots the unfinalized adaptive plan's partitioning —
    // UnknownPartitioning — and every superstep silently re-shuffles AND
    // re-sorts the full edge frame (see PropertyGraph.pregelEdges).
    val edgesPart =
      if (config.edgesPrepared) edges
      else Lineage.withFastIteration(spark, enabled = true) {
        edges.repartition(col("src")).sortWithinPartitions("src")
          .localCheckpoint(true)
      }
    // AQE off only when the superstep frame is big enough that broadcast
    // conversion can't apply and re-planning latency dominates (measured
    // both ways — see Lineage.withFastIteration scaladoc). The count scans
    // the just-checkpointed blocks, not the source.
    val bigWork = edgesPart.count() >= Lineage.aqeOffMinEdges(spark)
    Lineage.withFastIteration(spark, bigWork) {

    var superstep = ckpt.flatMap(_.latestSuperstep).getOrElse(0)
    var state =
      if (superstep > 0) ckpt.get.load(spark, superstep) // resume path
      else initial.cutLineage() // cut the ingest lineage once

    var converged = false
    val history = scala.collection.mutable.ArrayBuffer[SuperstepMetrics]()

    while (!converged && superstep < config.maxIterations) {
      val t0 = System.currentTimeMillis()

      // scatter: active sources emit along their out-edges, then combine.
      val active = state.where(col(ACTIVE))
      val raw = edgesPart.join(active, edgesPart("src") === active("id"))
        .select(edgesPart("dst").as("id"), msgExpr.as(MSG))
      val track = config.trackMetrics || ckpt.isDefined
      // metrics cost one extra pass over the (small, pre-combined) message
      // frame; skip it entirely when nobody will read the lineage.
      val msgs =
        if (track) combine(raw).persist(StorageLevel.MEMORY_AND_DISK)
        else combine(raw)
      val msgCount = if (track) msgs.count() else -1L

      // gather/apply: old state LEFT JOIN messages → new state. The eager
      // localCheckpoint is both the superstep barrier and the lineage cut
      // (iterative plans would otherwise snowball — SURVEY.md §7.4).
      // Convergence stats ride the SAME materializing action via observe()
      // (CollectMetrics accumulators) — a superstep is ONE Spark action,
      // not a checkpoint action plus a stats aggregate; the removed
      // per-superstep scheduling round was a measured term of the scaling
      // floor (VERDICT r1 per-superstep overhead note).
      val joined = state.join(msgs, Seq("id"), "left_outer")
      val obs = org.apache.spark.sql.Observation()
      val newState = joined.select(col("id") +: updateExprs: _*)
        .observe(obs,
          sum(col(CHANGED).cast("long")).as("changed"),
          sum(col(ACTIVE).cast("long")).as("active"),
          coalesce(max(abs(col(DELTA))), lit(0.0)).as("deltaNorm"))
        .cutLineage()

      val statsMap = obs.get
      val changed = Option(statsMap("changed")).map(_.asInstanceOf[Long]).getOrElse(0L)
      val activeCount = Option(statsMap("active")).map(_.asInstanceOf[Long]).getOrElse(0L)
      val deltaNorm = statsMap("deltaNorm").asInstanceOf[Double]

      val skew = if (track) skewRatio(msgs) else 1.0
      if (track) msgs.unpersist()
      // release the superseded superstep's checkpoint blocks NOW — waiting
      // for GC-driven ContextCleaner cleanup lets blocks pile up one set
      // per superstep (observed: heap thrash + executor heartbeat loss on
      // a 46 M-edge run).
      Lineage.release(state)
      state = newState
      superstep += 1

      val m = SuperstepMetrics(superstep, activeCount, msgCount, deltaNorm, skew,
        System.currentTimeMillis() - t0)
      history += m

      converged = changed == 0
      ckpt.foreach { c =>
        if (superstep % config.checkpointEvery == 0 || converged) {
          // durable checkpoint: parquet round-trip cuts lineage AND is the
          // exact state a resumed run would start from.
          val reread = c.save(state, superstep, m)
          Lineage.release(state)
          state = reread.persist(StorageLevel.MEMORY_AND_DISK)
        }
      }
      config.stopAfter.filter(_ == superstep).foreach { k =>
        throw new PregelKilledException(k)
      }
    }

    Lineage.release(edgesPart)
    PregelResult(state, superstep, converged, history.toSeq)
    } // withFastIteration
  }

  /** max/mean rows per partition of the combined-message frame — the skew
   *  signal the north rule asks for (hub vertices → hot partitions). */
  private def skewRatio(msgs: DataFrame): Double = {
    val counts = msgs.groupBy(spark_partition_id().as("p")).count()
      .agg(max("count").cast("double").as("mx"), avg("count").as("mean")).head()
    if (counts.isNullAt(0) || counts.getDouble(1) == 0.0) 1.0
    else counts.getDouble(0) / counts.getDouble(1)
  }
}

/** Message combiners for the generic loop — each is a full `(id,_msg) →
 *  one row per id` reduction so Catalyst plans partial+final aggregates. */
object Combiners {
  import Pregel.MSG

  val sum: DataFrame => DataFrame =
    _.groupBy("id").agg(org.apache.spark.sql.functions.sum(col(MSG)).as(MSG))

  val min: DataFrame => DataFrame =
    _.groupBy("id").agg(org.apache.spark.sql.functions.min(col(MSG)).as(MSG))

  /**
   * LPA's vote tally: `_msg` is `struct(label: long, w: double)`; result is
   * the label with the largest summed weight, ties to the smaller label —
   * reference ComputeStepConsumer.java:44-77 (votes) + :64-77 (tie-break).
   * Two hash aggregates: (id,label)→Σw, then argmax via max_by over
   * struct(w, -label) (struct ordering: weight desc, label asc).
   */
  val weightedArgmax: DataFrame => DataFrame = { raw =>
    raw.select(col("id"), col(MSG)("label").as("label"), col(MSG)("w").as("w"))
      .groupBy("id", "label").agg(org.apache.spark.sql.functions.sum("w").as("w"))
      .groupBy("id")
      .agg(expr("max_by(label, named_struct('w', w, 'nl', -label))").as(MSG))
  }
}

/**
 * Durable checkpoint + lineage manager (north rule). Layout:
 *
 *   <dir>/superstep=<k>/state/   parquet vertex state (atomic via _SUCCESS)
 *   <dir>/superstep=<k>/metrics.json
 *   <dir>/lineage.jsonl          append-only, one line per superstep
 *
 * Resume = load the highest superstep whose parquet write completed, then
 * continue the loop; Pregel.run does this automatically when the dir is
 * non-empty.
 */
final class CheckpointManager(dir: String) {
  private val root = Paths.get(dir)
  Files.createDirectories(root)

  def statePath(k: Int): String = root.resolve(s"superstep=$k").resolve("state").toString

  def save(state: DataFrame, k: Int, m: SuperstepMetrics): DataFrame = {
    val path = statePath(k)
    state.write.mode("overwrite").parquet(path)
    Files.writeString(root.resolve(s"superstep=$k").resolve("metrics.json"), m.toJson)
    Files.writeString(root.resolve("lineage.jsonl"), m.toJson + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    state.sparkSession.read.parquet(path)
  }

  def load(spark: SparkSession, k: Int): DataFrame = spark.read.parquet(statePath(k))

  /** Highest superstep with a completed (_SUCCESS) state write. */
  def latestSuperstep: Option[Int] = {
    if (!Files.isDirectory(root)) return None
    import scala.jdk.CollectionConverters._
    val done = Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("superstep="))
      .filter(p => Files.exists(p.resolve("state").resolve("_SUCCESS")))
      .map(_.getFileName.toString.stripPrefix("superstep=").toInt)
      .toSeq
    if (done.isEmpty) None else Some(done.max)
  }

  def lineage: Seq[String] =
    if (Files.exists(root.resolve("lineage.jsonl")))
      Files.readAllLines(root.resolve("lineage.jsonl")).toArray(Array[String]()).toSeq
    else Seq.empty
}
