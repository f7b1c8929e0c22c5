package graft.sources

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Seeded random graph generator — gds.beta.graph.generate
 * (proc/.../GraphGenerateProc.java; algo/.../beta/generator/
 * RandomGraphGenerator.java:39,85-160; RelationshipDistribution.java):
 * nodeCount × averageDegree with degree distributions UNIFORM (constant),
 * RANDOM (hash-uniform in [0, 2·avg]), POWER_LAW (inverse-CDF pareto-ish,
 * min 1). Everything is a pure function of (nodeCount, averageDegree,
 * distribution, seed) built from `spark.range` + xxhash64 arithmetic — no
 * RNG state, so the output is identical at any parallelism (the
 * reference's per-thread Random cannot promise that).
 *
 * Scale: one narrow pass — per-node degree via hash, targets via
 * `sequence` + `transform` + `explode`; no shuffle until the caller
 * aggregates.
 */
object RandomGraph {

  sealed trait Distribution
  case object Uniform  extends Distribution
  case object Random   extends Distribution
  case object PowerLaw extends Distribution

  def generate(spark: SparkSession, nodeCount: Long, averageDegree: Long,
      distribution: Distribution = Uniform, seed: Long = 42L): PropertyGraph = {
    val base = spark.range(nodeCount).select(col("id"))
    val h = pmod(xxhash64(col("id"), lit(seed)), lit(1000000007L))
    val u = h.cast("double") / 1000000007.0 // uniform [0,1)

    val degree: org.apache.spark.sql.Column = distribution match {
      case Uniform => lit(averageDegree)
      case Random  => (u * (2 * averageDegree + 1)).cast("long") // [0, 2·avg]
      case PowerLaw =>
        // inverse-CDF pareto with alpha≈2.5 scaled to hit the average-ish:
        // d = min + floor((min) / (1-u)^(1/(alpha-1))) capped at nodeCount-1
        val alpha = 2.5
        least(
          (lit(math.max(1L, averageDegree / 2).toDouble) *
            pow(lit(1.0) - u, lit(-1.0 / (alpha - 1)))).cast("long"),
          lit(nodeCount - 1))
    }

    val edges = base
      .select(col("id").as("src"), degree.as("d"))
      .where(col("d") > 0)
      .select(col("src"),
        explode(transform(sequence(lit(0L), col("d") - 1),
          j => pmod(xxhash64(col("src"), j, lit(seed + 1)), lit(nodeCount))))
          .as("dst"))
      .where(col("src") =!= col("dst"))
      .withColumn("type", lit("REL"))
      .withColumn("weight", lit(1.0))

    PropertyGraph(base, edges)
  }

  /**
   * Random node properties — RandomGraphGenerator.java:85-119's
   * nodePropertyProducers: uniform doubles in [min, max) as a pure hash
   * of (id, property name, seed); identical at any parallelism where the
   * reference's per-thread Random is not.
   */
  def withRandomNodeProperty(graph: PropertyGraph, name: String,
      min: Double = 0.0, max: Double = 1.0, seed: Long = 42L): PropertyGraph = {
    val u = pmod(xxhash64(col("id"), lit(name), lit(seed)), lit(1000000007L))
      .cast("double") / 1000000007.0
    PropertyGraph(
      graph.nodes.withColumn(name, lit(min) + u * (max - min)),
      graph.edges)
  }

  /** Random relationship weight — RandomGraphGenerator.java:121-160's
   *  relationshipPropertyProducer: uniform in [min, max) hashed from
   *  (src, dst, seed); replaces the `weight` column. */
  def withRandomRelationshipWeight(graph: PropertyGraph,
      min: Double = 0.0, max: Double = 1.0, seed: Long = 42L): PropertyGraph = {
    val u = pmod(xxhash64(col("src"), col("dst"), lit(seed)), lit(1000000007L))
      .cast("double") / 1000000007.0
    PropertyGraph(
      graph.nodes,
      graph.edges.withColumn("weight", lit(min) + u * (max - min)))
  }
}
