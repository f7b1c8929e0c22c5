package graft

import graft.algos.Wcc
import graft.core._
import org.apache.spark.sql.functions._

/**
 * Golden fixtures from the reference's WccTest
 * (algo/src/test/java/org/neo4j/graphalgo/wcc/WccTest.java:53-106,213-231):
 * 16 disjoint 10-node chains → exactly 16 components under all three
 * orientations; unseeded representative = min node id in the component
 * (union-by-min, HugeAtomicDisjointSetStruct.java:185).
 */
class WccSpec extends SparkSpec {

  val chains = 16
  val chainLen = 10

  def chainEdges: Seq[(Long, Long)] =
    (0 until chains).flatMap { c =>
      val base = (c * chainLen).toLong
      (0 until chainLen - 1).map(i => (base + i, base + i + 1))
    }

  def fixture: PropertyGraph = graphOf(chains * chainLen, chainEdges)

  test("16 chains → 16 components, representative = min id (WccTest.java:53-106)") {
    val comp = longs(Wcc.run(fixture))
    assert(comp.values.toSet.size == chains)
    (0 until chains).foreach { c =>
      val base = (c * chainLen).toLong
      (0 until chainLen).foreach { i =>
        assert(comp(base + i) == base, s"node ${base + i}: got ${comp(base + i)}")
      }
    }
  }

  test("orientation-insensitive: REVERSE input gives identical partition (WccTest.java:213-231)") {
    val rev = PropertyGraph(fixture.nodes,
      fixture.edges.select(col("dst").as("src"), col("src").as("dst"),
        col("type"), col("weight")))
    assert(longs(Wcc.run(rev)) == longs(Wcc.run(fixture)))
  }

  test("threshold drops weak edges (Wcc.java:183-204, WccThresholdTest)") {
    // 0-1 strong, 1-2 weak: threshold 0.5 splits {0,1} from {2}
    val g = graphOf(3, Seq((0L, 1L), (1L, 2L)),
      Map((0L, 1L) -> 1.0, (1L, 2L) -> 0.3))
    val comp = longs(Wcc.run(g, Wcc.Config(threshold = Some(0.5))))
    assert(comp(0L) == 0L && comp(1L) == 0L && comp(2L) == 2L)
  }

  test("seeding warm-starts components (IncrementalWccTest)") {
    // two chains; seed both with the same label → one merged label space,
    // seeds propagate as minimum.
    val g0 = graphOf(4, Seq((0L, 1L), (2L, 3L)))
    val seeded = PropertyGraph(
      g0.nodes.withColumn("seed", when(col("id") < 2, lit(100L)).otherwise(lit(7L))),
      g0.edges)
    val comp = longs(Wcc.run(seeded, Wcc.Config(seedProperty = Some("seed"))))
    assert(comp(0L) == 100L && comp(1L) == 100L)
    assert(comp(2L) == 7L && comp(3L) == 7L)
  }

  test("consecutiveIds renumbers densely ascending (ConsecutiveLongNodeProperties)") {
    val comp = longs(Wcc.run(fixture, Wcc.Config(consecutiveIds = true)))
    assert(comp.values.toSet == (0L until chains.toLong).toSet)
    // order-preserving: chain c gets component c
    (0 until chains).foreach { c =>
      assert(comp((c * chainLen).toLong) == c.toLong)
    }
  }

  test("determinism across parallelism") {
    val a = longs(Wcc.run(fixture))
    val g2 = PropertyGraph(fixture.nodes.repartition(9), fixture.edges.repartition(3))
    assert(longs(Wcc.run(g2)) == a)
  }
}
