package graft

import graft.core._
import graft.algos._
import graft.sources.RandomGraph
import org.apache.spark.sql.functions._

/** Round-3 scale-path additions: HyperBall sketched centralities, skew
  * utilities, random property generators, property-mapping projections. */
class ScalePathSpec extends SparkSpec {

  // ---- HyperBall ----

  private def cliqueEdges(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("hyperball estimates component sizes on disjoint cliques") {
    // clique {0..5} and clique {6..9}: reachable(v) = |component| - 1
    val g = graphOf(10, cliqueEdges(0L to 5L) ++ cliqueEdges(6L to 9L))
    val r = HyperBall.run(g, HyperBall.Config(logRegisters = 8))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    (0L to 5L).foreach { v =>
      assert(math.abs(r(v) - 5.0) <= 1.5, s"clique-6 node $v reachable=${r(v)}")
    }
    (6L to 9L).foreach { v =>
      assert(math.abs(r(v) - 3.0) <= 1.2, s"clique-4 node $v reachable=${r(v)}")
    }
  }

  test("hyperball tracks exact harmonic ordering on a star graph") {
    // star: hub 0 — leaves 1..8. harmonic(hub) = 8/8 = 1;
    // harmonic(leaf) = (1 + 7·0.5)/8 = 0.5625
    val g = graphOf(9, (1L to 8L).map(l => (0L, l)))
    val est = HyperBall.run(g, HyperBall.Config(logRegisters = 8))
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    val exact = Closeness.run(g)
      .select(col("id"), col("harmonic")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(est(0L) > est(1L), "hub ranks above leaves")
    (0L to 8L).foreach { v =>
      assert(math.abs(est(v) - exact(v)) <= 0.25 * math.max(exact(v), 0.1),
        s"node $v est=${est(v)} exact=${exact(v)}")
    }
  }

  test("hyperball is deterministic across runs and partitionings") {
    val g = graphOf(20, (0L until 19L).map(i => (i, i + 1)) ++ Seq((19L, 0L), (3L, 11L)))
    val a = HyperBall.run(g).collect().sortBy(_.getLong(0)).map(_.toSeq)
    val b = HyperBall.run(PropertyGraph(
        g.nodes.repartition(7), g.edges.repartition(5)))
      .collect().sortBy(_.getLong(0)).map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  // ---- Skew utilities ----

  test("saltedJoin produces exactly the rows of the plain join") {
    import spark.implicits._
    // hub key 1 with 500 rows, plus a normal tail
    val big = ((1 to 500).map(i => (1L, i.toLong)) ++
      (1 to 50).map(i => (2L, i.toLong))).toDF("src", "dst")
    val small = Seq((1L, 0.5), (2L, 2.0)).toDF("src", "f")
    val plain = big.join(small, Seq("src")).collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "src", col("dst"), salts = 8)
      .select("src", "dst", "f").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("frontierJoin broadcasts small frontiers and matches plain join") {
    import spark.implicits._
    val edges = (1 to 200).map(i => (i.toLong % 10, i.toLong)).toDF("src", "dst")
    val frontier = Seq((3L, 0.1), (7L, 0.9)).toDF("src", "d")
    val out = Skew.frontierJoin(edges, frontier, "src", frontierRows = 2)
    val plain = edges.join(frontier, Seq("src"))
    assert(out.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    assert(out.queryExecution.executedPlan.toString.contains("Broadcast"))
  }

  test("saltedSum equals plain groupBy sum") {
    import spark.implicits._
    val df = ((1 to 300).map(i => (1L, i.toDouble)) ++
      (1 to 30).map(i => (2L, i.toDouble))).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), "v", col("v"), salts = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, v) => assert(math.abs(salted(k) - v) < 1e-9) }
  }

  // ---- random property generators (RandomGraphGenerator.java:85-160) ----

  test("random node/relationship properties: seeded, ranged, deterministic") {
    val g0 = RandomGraph.generate(spark, 100, 4, RandomGraph.Uniform, seed = 7)
    val g1 = RandomGraph.withRandomNodeProperty(g0, "score", min = 2.0, max = 5.0, seed = 9)
    val vals = g1.nodes.select("score").collect().map(_.getDouble(0))
    assert(vals.length == 100 && vals.forall(v => v >= 2.0 && v < 5.0))
    assert(vals.distinct.length > 50, "values vary across nodes")
    val again = RandomGraph.withRandomNodeProperty(g0, "score", 2.0, 5.0, 9)
      .nodes.select("score").collect().map(_.getDouble(0))
    assert(vals.toSeq == again.toSeq)

    val gw = RandomGraph.withRandomRelationshipWeight(g0, min = 1.0, max = 3.0, seed = 11)
    val ws = gw.edges.select("weight").collect().map(_.getDouble(0))
    assert(ws.nonEmpty && ws.forall(w => w >= 1.0 && w < 3.0))
  }

  // ---- property mapping config (PropertyMapping.java) ----

  test("projection property mappings: rename, default-fill, relationship weight") {
    import spark.implicits._
    import Projections.PropertyMapping
    val nodesRaw = Seq(("a", Some(3.0)), ("b", None), ("c", Some(7.0)))
      .toDF("id", "rawScore")
    val relsRaw = Seq(("a", "b", Some(2.5)), ("b", "c", None))
      .toDF("source", "target", "cost")
    val (g, mapping) = Projections.fromFrames(nodesRaw, relsRaw,
      nodeProperties = Seq(
        PropertyMapping("score", source = Some("rawScore"), defaultValue = Some(1.0)),
        PropertyMapping("absent", defaultValue = Some(-1.0))),
      relationshipWeight = Some(PropertyMapping("weight", source = Some("cost"),
        defaultValue = Some(9.0))))
    val byKey = g.nodes.join(mapping, Seq("id"))
      .select(col("key"), col("score"), col("absent")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byKey("a") == ((3.0, -1.0)))
    assert(byKey("b") == ((1.0, -1.0)), "null rawScore takes the default")
    assert(byKey("c") == ((7.0, -1.0)))
    val weights = g.edges.select("weight").collect().map(_.getDouble(0)).sorted
    assert(weights.toSeq == Seq(2.5, 9.0), "null cost takes the default weight")
  }

  test("projection without mappings keeps legacy column passthrough") {
    import spark.implicits._
    val nodesRaw = Seq(("a", 1.0), ("b", 2.0)).toDF("id", "p")
    val relsRaw = Seq(("a", "b")).toDF("source", "target")
    val (g, _) = Projections.fromFrames(nodesRaw, relsRaw)
    assert(g.nodes.columns.toSet == Set("id", "p"))
    assert(g.edges.select("weight").head().getDouble(0) == 1.0)
  }
}
