package graft

import graft.core._
import graft.algos.Wcc
import org.apache.spark.sql.functions._

/** Cypher-projection equivalent, catalog mutation ops, util fns, estimate. */
class CatalogSpec extends SparkSpec {

  test("Projections.fromSql builds a graph from arbitrary SQL (CypherFactory.java:59)") {
    import spark.implicits._
    Seq(("alpha", 10.0), ("beta", 20.0), ("gamma", 30.0))
      .toDF("name", "size").createOrReplaceTempView("proj_nodes")
    Seq(("alpha", "beta", 2.5), ("beta", "gamma", 1.5), ("gamma", "missing", 9.9))
      .toDF("s", "t", "w").createOrReplaceTempView("proj_rels")
    val (g, mapping) = Projections.fromSql(spark,
      "SELECT name AS id, size FROM proj_nodes",
      "SELECT s AS source, t AS target, w AS weight FROM proj_rels")
    // dense ids follow sorted key order: alpha=0, beta=1, gamma=2
    val m = mapping.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("alpha" -> 0L, "beta" -> 1L, "gamma" -> 2L))
    // properties carried; dangling rel (gamma->missing) dropped
    assert(g.nodes.columns.toSet == Set("id", "size"))
    val edges = g.edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(edges == Set((0L, 1L, 2.5), (1L, 2L, 1.5)))
  }

  test("removeNodeProperties / deleteRelationships / stream ops") {
    val g = graphOf(3, Seq((0L, 1L), (1L, 2L)))
    val withProps = PropertyGraph(
      g.nodes.withColumn("score", col("id") * 2.0).withColumn("keep", lit(1L)),
      g.edges)
    GraphCatalog.drop("catspec")
    GraphCatalog.create("catspec", withProps)
    assert(CatalogOps.removeNodeProperties("catspec", Seq("score", "absent")) == 1L)
    assert(GraphCatalog.get("catspec").nodes.columns.toSet == Set("id", "keep"))

    val streamed = CatalogOps.streamNodeProperties("catspec", Seq("keep")).collect()
    assert(streamed.length == 3 && streamed.forall(_.getDouble(2) == 1.0))

    assert(CatalogOps.deleteRelationships("catspec", "REL") == 2L)
    assert(GraphCatalog.get("catspec").edgeCount == 0L)
    GraphCatalog.drop("catspec")
  }

  test("writeIfChanged skips rows equal to their seed (LongIfChangedNodeProperties)") {
    val g0 = graphOf(4, Seq((0L, 1L), (2L, 3L)))
    // seed: nodes 0,1 already carry component 0; 2,3 carry a WRONG seed 9
    val seeded = PropertyGraph(
      g0.nodes.withColumn("seed", when(col("id") <= 1, 0L).otherwise(9L)),
      g0.edges)
    val comp = Wcc.run(seeded)
    val out = java.nio.file.Files.createTempDirectory("graft-ifchanged").toString
    val w = ExecutionModes.writeIfChanged(seeded, comp, "component", "seed", out)
    // components: {0,1}->0 (unchanged for 0,1), {2,3}->2 (differs from 9)
    assert(w.rowsWritten == 2L)
  }

  test("UtilFns: isFinite/isInfinite/nanCoalesce (gds.util.*)") {
    import spark.implicits._
    val df = Seq(1.0, Double.NaN, Double.PositiveInfinity).toDF("x")
    assert(df.where(UtilFns.isFinite(col("x"))).count() == 1)
    assert(df.where(UtilFns.isInfinite(col("x"))).count() == 1)
    val v = df.select(UtilFns.nanCoalesce(col("x"), lit(7.0))).collect().map(_.getDouble(0))
    assert(v.toSeq == Seq(1.0, 7.0, Double.PositiveInfinity))
    assert(UtilFns.version().nonEmpty)
  }

  test("memory estimation scales with graph dimensions (MemoryEstimations.java:39)") {
    val small = graphOf(10, (0L until 9L).map(i => (i, i + 1)))
    val big = graphOf(1000, (0L until 999L).map(i => (i, i + 1)))
    val es = MemoryEstimation.pageRank(small)
    val eb = MemoryEstimation.pageRank(big)
    assert(es.bytesMin > 0 && eb.bytesMin > es.bytesMin)
    assert(es.tree.contains("pageRank") && es.tree.contains("vertex state"))
    assert(MemoryEstimation.wcc(small).bytesMin > 0)
    assert(MemoryEstimation.nodeSimilarity(small).bytesMin > 0)
  }
}
