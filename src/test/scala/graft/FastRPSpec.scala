package graft

import graft.pipeline.FastRP
import graft.core._
import org.apache.spark.sql.functions._

/** FastRP / RandomProjection embeddings (RandomProjection.java:41-200). */
class FastRPSpec extends SparkSpec {

  private def embed(g: PropertyGraph, cfg: FastRP.Config): Map[Long, Seq[Double]] =
    FastRP.run(g, cfg).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("every node gets a dim-length embedding") {
    val g = graphOf(6, Seq((0L, 1L), (1L, 2L), (3L, 4L))) // node 5 isolated
    val e = embed(g, FastRP.Config(embeddingSize = 16))
    assert(e.size == 6)
    assert(e.values.forall(_.length == 16))
    // isolated node propagates nothing: all-zero final embedding
    assert(e(5L).forall(_ == 0.0))
  }

  test("nodes with identical neighborhoods embed identically") {
    // leaves 1..4 all attach only to hub 0
    val g = graphOf(5, Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    val e = embed(g, FastRP.Config(embeddingSize = 32))
    assert(e(1L) == e(2L) && e(2L) == e(3L) && e(3L) == e(4L))
    assert(e(0L) != e(1L))
  }

  test("community structure separates in cosine space") {
    // two 4-cliques joined by one bridge
    val cliqueA = for { i <- 0 until 4; j <- (i + 1) until 4 } yield (i.toLong, j.toLong)
    val cliqueB = for { i <- 4 until 8; j <- (i + 1) until 8 } yield (i.toLong, j.toLong)
    val g = graphOf(8, cliqueA ++ cliqueB ++ Seq((3L, 4L)))
    val e = embed(g, FastRP.Config(embeddingSize = 64))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val intra = cos(e(0L), e(1L))
    val inter = cos(e(0L), e(6L))
    assert(intra > inter, s"intra $intra vs inter $inter")
  }

  test("deterministic across parallelism up to fp summation order (1e-12)") {
    // the random draws are pure hash functions of (id, pos, seed); only the
    // floating-point REDUCTION order varies with partitioning, so values
    // agree to ulp-level tolerance (same contract as the 1e-6-rounded
    // oracle comparisons elsewhere).
    val g = graphOf(6, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L)))
    val cfg = FastRP.Config(embeddingSize = 16)
    val a = embed(g, cfg)
    val g2 = PropertyGraph(g.nodes.repartition(5), g.edges.repartition(3))
    val b = embed(g2, cfg)
    for (id <- a.keys) {
      a(id).zip(b(id)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-12, s"node $id: $x vs $y")
      }
    }
  }
}
