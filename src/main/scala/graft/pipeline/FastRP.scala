package graft.pipeline

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * FastRP node embeddings — gds.alpha.randomProjection
 * (alpha/alpha-embeddings/.../randomprojections/RandomProjection.java:41-200,
 * after Chen et al. 2019):
 *
 *  - init: entry j of node i is ±(deg(i)^normalizationStrength ·
 *    √sparsity/√dim) with probability 1/(2·sparsity) each, else 0
 *    (initRandomVectors, :109-127). The reference draws from a per-thread
 *    RNG; we derive the draw from xxhash64(id, j, seed) so embeddings are
 *    identical at any parallelism — the same determinism swap as RandomWalk.
 *  - iteration k: e_k(v) = (Σ_{u ∈ N(v)} e_{k-1}(u) · w) / deg(v), then
 *    optional L2 normalization (propagateEmbeddings, :131-170);
 *  - result: Σ_k iterationWeights(k) · e_k (updateEmbeddings, :193-198).
 *
 * Spark shape: embeddings live EXPLODED as (id, pos, v) rows, so the
 * neighbor aggregation is a plain (dst, pos) hash aggregate with map-side
 * partial combine — a 10^8-degree hub never materializes a per-group list
 * (an array-typed collect_list formulation would OOM on it). Zero entries
 * are filtered before the join (sparsity 3 → 2/3 of init rows drop).
 */
object FastRP {

  final case class Config(
      embeddingSize: Int = 64,
      iterationWeights: Seq[Double] = Seq(0.0, 1.0, 1.0),
      normalizationStrength: Double = 0.0,
      normalizeL2: Boolean = true,
      sparsity: Int = 3,
      seed: Long = 42L,
      orientation: Orientation = Orientation.Undirected)

  /** @return (id, embedding: array<double>) */
  def run(graph: PropertyGraph, config: Config = Config()): DataFrame =
    runImpl(graph, config)

  private def runImpl(graph: PropertyGraph, config: Config): DataFrame = {
    val spark = graph.spark
    val dim = config.embeddingSize
    val edges = graph.aggregated(config.orientation, Aggregation.Sum).cutLineage()
    val deg = graph.nodes.select(col("id"))
      .join(edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")),
        Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
      .cutLineage()

    val posTab = spark.range(dim).select(col("id").cast("int").as("pos"))
    val prob = 1.0 / (2.0 * config.sparsity)
    val entry = (
      when(col("deg") === 0L, 1.0)
        .otherwise(pow(col("deg").cast("double"), config.normalizationStrength))
        * math.sqrt(config.sparsity.toDouble) / math.sqrt(dim.toDouble))
    val u01 = pmod(xxhash64(col("id"), col("pos"), lit(config.seed)),
      lit(1000000L)).cast("double") / 1e6

    // flat sparse representation of the current iteration's embedding
    var flat = deg.crossJoin(posTab)
      .select(col("id"), col("pos"),
        when(u01 < prob, entry)
          .when(u01 < 2 * prob, -entry)
          .otherwise(0.0).as("v"))
      .where(col("v") =!= 0.0)
      .cutLineage()

    // accumulated Σ weight_k · e_k, also flat
    var acc: DataFrame = null
    for (w <- config.iterationWeights) {
      // propagate: mean of neighbor embeddings (degreeScale, :148-150)
      val msgs = edges
        .join(flat.select(col("id").as("src"), col("pos"), col("v")), Seq("src"))
        .groupBy(col("dst").as("id"), col("pos"))
        .agg(sum(col("v") * col("weight")).as("s"))
      val averaged = msgs.join(deg, Seq("id"))
        .select(col("id"), col("pos"),
          (col("s") / greatest(col("deg").cast("double"), lit(1.0))).as("v"))
      val next =
        if (config.normalizeL2) {
          val norms = averaged.groupBy("id").agg(sqrt(sum(col("v") * col("v"))).as("n"))
          averaged.join(norms, Seq("id"))
            .select(col("id"), col("pos"),
              when(col("n") > 0.0, col("v") / col("n")).otherwise(0.0).as("v"))
        } else averaged
      flat = next.where(col("v") =!= 0.0).cutLineage()
      if (w != 0.0) {
        val weighted = flat.select(col("id"), col("pos"), (col("v") * w).as("v"))
        acc =
          if (acc == null) weighted.cutLineage()
          else acc.unionByName(weighted)
            .groupBy("id", "pos").agg(sum("v").as("v")).cutLineage()
      }
    }
    val accFinal =
      if (acc == null) flat.limit(0)
      else acc

    // densify back to arrays: every node gets a dim-length vector.
    val dense = graph.nodes.select(col("id")).crossJoin(posTab)
      .join(accFinal, Seq("id", "pos"), "left_outer")
      .select(col("id"), col("pos"), coalesce(col("v"), lit(0.0)).as("v"))
    dense.groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
        x => x("v")).as("embedding"))
  }
}
