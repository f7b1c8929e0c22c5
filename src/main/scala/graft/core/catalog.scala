package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Flexible projection — the reference's "Cypher projection"
 * (core/.../loading/CypherFactory.java:59,134-186, exposed at
 * GraphCreateProc.java:100): the user supplies an arbitrary node query and
 * relationship query; whatever they return becomes the graph. The Spark
 * equivalent is an arbitrary `spark.sql` (or DataFrame) pair:
 *
 *  - node frame: a column named `id` (ANY orderable type — string repo
 *    keys, composite hashes, …) plus optional property columns;
 *  - relationship frame: `source`, `target` (same key type), optional
 *    `type` and `weight`.
 *
 * Keys are densified with the deterministic sorted IdMap (Ids.assign) —
 * the same invariant the native projection uses, so algorithm tie-breaks
 * stay reproducible. Relationships whose endpoints are absent from the
 * node query are dropped, mirroring CypherFactory's strict id resolution.
 */
object Projections {

  /** @return (graph over dense ids, mapping(key, id)) */
  def fromSql(spark: SparkSession, nodeQuery: String,
      relationshipQuery: String): (PropertyGraph, DataFrame) =
    fromFrames(spark.sql(nodeQuery), spark.sql(relationshipQuery))

  def fromFrames(nodesRaw: DataFrame, relsRaw: DataFrame): (PropertyGraph, DataFrame) = {
    require(nodesRaw.columns.contains("id"), "node query must return an `id` column")
    require(relsRaw.columns.contains("source") && relsRaw.columns.contains("target"),
      "relationship query must return `source` and `target` columns")
    val keyed = nodesRaw.withColumnRenamed("id", "key")
    val mapping = Ids.assign(keyed.select(col("key")), "key").cutLineage()
    val props = keyed.columns.filter(_ != "key").map(col).toSeq
    val nodes = keyed.join(mapping, Seq("key"))
      .select(col("id") +: props: _*)

    val withType =
      if (relsRaw.columns.contains("type")) relsRaw
      else relsRaw.withColumn("type", lit("REL"))
    val withWeight =
      if (withType.columns.contains("weight")) withType
      else withType.withColumn("weight", lit(1.0))
    val edges = withWeight
      .join(mapping.select(col("key").as("source"), col("id").as("src")), Seq("source"))
      .join(mapping.select(col("key").as("target"), col("id").as("dst")), Seq("target"))
      .select(col("src"), col("dst"), col("type").cast("string"),
        col("weight").cast("double"))
    (PropertyGraph(nodes, edges), mapping)
  }
}

/**
 * Catalog mutation surface the round-1 build lacked:
 * gds.graph.removeNodeProperties (GraphRemoveNodePropertiesProc.java:42),
 * gds.graph.deleteRelationships (GraphDeleteRelationshipProc.java),
 * gds.graph.streamNodeProperties / streamRelationshipProperties
 * (GraphStreamNodePropertiesProc.java).
 */
object CatalogOps {

  /** Drop property columns from a catalog graph's nodes; returns the
   *  number of properties removed (proc result shape). */
  def removeNodeProperties(graphName: String, properties: Seq[String]): Long = {
    val g = GraphCatalog.get(graphName)
    val present = properties.filter(g.nodes.columns.contains)
    if (present.isEmpty) return 0L
    val updated = PropertyGraph(g.nodes.drop(present: _*), g.edges)
    GraphCatalog.drop(graphName)
    GraphCatalog.create(graphName, updated)
    present.size.toLong
  }

  /** Delete every relationship of `relType`; returns deleted count. */
  def deleteRelationships(graphName: String, relType: String): Long = {
    val g = GraphCatalog.get(graphName)
    val deleted = g.edges.where(col("type") === relType).count()
    val updated = PropertyGraph(g.nodes, g.edges.where(col("type") =!= relType))
    GraphCatalog.drop(graphName)
    GraphCatalog.create(graphName, updated)
    deleted
  }

  /** (id, property, value) long-form stream of selected node properties —
   *  the proc streams one row per (node, property). */
  def streamNodeProperties(graphName: String, properties: Seq[String]): DataFrame = {
    val g = GraphCatalog.get(graphName)
    properties.map { p =>
      g.nodes.select(col("id"), lit(p).as("property"),
        col(p).cast("double").as("value"))
    }.reduce(_ unionByName _)
  }

  /** (src, dst, type, property, value) stream of relationship properties. */
  def streamRelationshipProperties(graphName: String): DataFrame = {
    val g = GraphCatalog.get(graphName)
    g.edges.select(col("src"), col("dst"), col("type"),
      lit("weight").as("property"), col("weight").as("value"))
  }
}

/**
 * Utility functions — gds.util.* (B9):
 * NaN/infinity guards (gds.util.NaN, isFinite, isInfinite —
 * proc/.../AuxiliaryProc semantics) as codegen'd Columns, plus version().
 */
object UtilFns {
  val NaN: Column = lit(Double.NaN)
  def isFinite(c: Column): Column = !isnan(c) && c =!= Double.PositiveInfinity &&
    c =!= Double.NegativeInfinity
  def isInfinite(c: Column): Column = c === Double.PositiveInfinity ||
    c === Double.NegativeInfinity
  /** NaN-safe coalesce: first non-NaN, else NaN (gds.util.nanSafe). */
  def nanCoalesce(cs: Column*): Column =
    cs.reduceRight((c, acc) => when(isnan(c), acc).otherwise(c))
  def version(): String = "graft 0.2.0 (gds-surface 1.x)"
}

/**
 * Memory estimation — the `.estimate` mode (F5,
 * core/.../utils/mem/MemoryEstimations.java:39). The reference predicts
 * allocation from nodeCount/relationshipCount before running; here the
 * same role is played by a formula over the graph's dimensions plus the
 * per-algorithm working-set shape. Estimates describe the DISTRIBUTED
 * footprint: bytes across all executors, so dividing by the executor count
 * sizes a cluster. Formulas document the working frames (vertex state,
 * message frame, edge partition) at 8 bytes per long/double column.
 */
object MemoryEstimation {

  final case class Estimate(
      bytesMin: Long,
      bytesMax: Long,
      nodeCount: Long,
      relationshipCount: Long,
      tree: String)

  private def fmt(b: Long): String =
    if (b >= (1L << 30)) f"${b / (1L << 30).toDouble}%.1f GiB"
    else if (b >= (1L << 20)) f"${b / (1L << 20).toDouble}%.1f MiB"
    else if (b >= (1L << 10)) f"${b / (1L << 10).toDouble}%.1f KiB"
    else s"$b B"

  private def build(name: String, n: Long, r: Long,
      parts: Seq[(String, Long)]): Estimate = {
    val total = parts.map(_._2).sum
    val tree = (s"$name: ${fmt(total)}" +:
      parts.map { case (k, v) => s"  |-- $k: ${fmt(v)}" }).mkString("\n")
    Estimate(total, total, n, r, tree)
  }

  /** PageRank: vertex state (id, deg, rank, delta, 2 flags) + combined
   *  message frame + one hash-partitioned edge copy. */
  def pageRank(graph: PropertyGraph): Estimate = {
    val n = graph.nodeCount; val r = graph.edgeCount
    build("pageRank", n, r, Seq(
      "vertex state (id,deg,rank,delta,flags)" -> n * (8 * 4 + 2),
      "combined messages (id,msg)" -> n * 16,
      "edge partition (src,dst,weight)" -> r * 24))
  }

  /** WCC: vertex state (id, component, flags) + messages + edges. */
  def wcc(graph: PropertyGraph): Estimate = {
    val n = graph.nodeCount; val r = graph.edgeCount
    build("wcc", n, r, Seq(
      "vertex state (id,component,flags)" -> n * (8 * 2 + 2),
      "combined messages" -> n * 16,
      "edge partition (undirected ×2)" -> r * 48))
  }

  /** NodeSimilarity: candidate pair frame is the dominant term —
   *  Σ_t indeg(t)² upper-bounded via the degree histogram. */
  def nodeSimilarity(graph: PropertyGraph): Estimate = {
    val n = graph.nodeCount; val r = graph.edgeCount
    val candUpper = graph.degrees(Orientation.Natural)
      .agg(sum(col("degree") * col("degree"))).head().getLong(0)
    build("nodeSimilarity", n, r, Seq(
      "adjacency (src,dst,w)" -> r * 24,
      "candidate pairs upper bound (Σ deg²)" -> candUpper * 32))
  }
}
