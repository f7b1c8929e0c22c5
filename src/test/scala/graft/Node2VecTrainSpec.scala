package graft

import graft.core._
import graft.pipeline.Node2Vec
import org.apache.spark.sql.functions._

/**
 * Skip-gram SGD training (Node2VecModel.java:34, PositiveSampleProducer
 * .java:31, NegativeSampleProducer.java:27): window semantics, unigram
 * table shape, loss descent, and community structure in the embeddings.
 */
class Node2VecTrainSpec extends SparkSpec {
  import spark.implicits._

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  test("positive pairs follow the reference's prefix/postfix window") {
    // windowSize = 4 ⇒ prefix = ceil(3/2) = 2, postfix = floor(3/2) = 1
    val kept = Seq((0L, 0L, 10L), (0L, 1L, 11L), (0L, 2L, 12L), (0L, 3L, 13L))
      .toDF("walkId", "i", "node")
    val pairs = Node2Vec.positivePairs(kept, windowSize = 4)
      .select("c", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // center 10 (i=0): contexts i in [-2, 1] \ {0} → 11
    // center 11 (i=1): [-1, 2] \ {1} → 10, 12
    // center 12 (i=2): [0, 3] \ {2} → 10, 11, 13
    // center 13 (i=3): [1, 4] \ {3} → 11, 12
    assert(pairs === Set(
      (10L, 11L),
      (11L, 10L), (11L, 12L),
      (12L, 10L), (12L, 11L), (12L, 13L),
      (13L, 11L), (13L, 12L)))
  }

  test("reference fixture: shouldProducePairsWithBounds (window 3 over two walks)") {
    // PositiveSampleProducerTest.shouldProducePairsWithBounds: walks
    // (0,1,2) and (3,4,5), windowSize 3 → the exact 8 ordered pairs.
    val kept = Seq(
      (0L, 0L, 0L), (0L, 1L, 1L), (0L, 2L, 2L),
      (1L, 0L, 3L), (1L, 1L, 4L), (1L, 2L, 5L))
      .toDF("walkId", "i", "node")
    val pairs = Node2Vec.positivePairs(kept, windowSize = 3)
      .select("c", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set(
      (0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L),
      (3L, 4L), (4L, 3L), (4L, 5L), (5L, 4L)))
  }

  test("reference fixture: shouldRemoveDownsampledWordFromWalk (filter then re-index)") {
    // PositiveSampleProducerTest.shouldRemoveDownsampledWordFromWalk:
    // nodes 1 and 5 have keep-probability 0; walks (0,1) → too short,
    // (0,1,2) → (0,2), (3,4,5,6) → (3,4,6), (3,4,5) → (3,4); window 3.
    val tokens = Seq(
      (0L, 0L, 0L), (0L, 1L, 1L),
      (1L, 0L, 0L), (1L, 1L, 1L), (1L, 2L, 2L),
      (2L, 0L, 3L), (2L, 1L, 4L), (2L, 2L, 5L), (2L, 3L, 6L),
      (3L, 0L, 3L), (3L, 1L, 4L), (3L, 2L, 5L))
      .toDF("walkId", "pos", "node")
    val keep = Seq((0L, 1.0), (1L, 0.0), (2L, 1.0), (3L, 1.0),
      (4L, 1.0), (5L, 0.0), (6L, 1.0)).toDF("node", "keep")
    val kept = Node2Vec.subsampleWalks(tokens, keep, seed = 7L)
    // survivors re-indexed consecutively per walk
    val byWalk = kept.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byWalk(0L) === Seq(0L))
    assert(byWalk(1L) === Seq(0L, 2L))
    assert(byWalk(2L) === Seq(3L, 4L, 6L))
    assert(byWalk(3L) === Seq(3L, 4L))
    // pairs over the filtered walks — the reference's expected multiset
    val pairs = Node2Vec.positivePairs(kept, windowSize = 3)
      .select("c", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(pairs === Map(
      (0L, 2L) -> 1, (2L, 0L) -> 1,
      (3L, 4L) -> 2, (4L, 3L) -> 2,
      (4L, 6L) -> 1, (6L, 4L) -> 1))
  }

  test("unigram table covers exactly tableSize buckets, share tracks f^alpha") {
    val freq = Seq((1L, 81L), (2L, 16L), (3L, 1L)).toDF("node", "f")
    val t = Node2Vec.unigramTable(freq, tableSize = 1024, exponent = 0.75)
    val counts = t.groupBy("node").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1024L)
    // buckets disjoint: total distinct == total
    assert(t.select("bucket").distinct().count() === 1024L)
    // f^0.75: 27 / 8 / 1 → expected shares 27/36, 8/36, 1/36 of 1024
    val e1 = 1024.0 * 27 / 36; val e2 = 1024.0 * 8 / 36; val e3 = 1024.0 / 36
    assert(math.abs(counts(1L) - e1) <= 2, s"node1 ${counts(1L)} vs $e1")
    assert(math.abs(counts(2L) - e2) <= 2, s"node2 ${counts(2L)} vs $e2")
    assert(math.abs(counts(3L) - e3) <= 2, s"node3 ${counts(3L)} vs $e3")
  }

  /** Two K5 cliques bridged by one edge: embeddings must separate them. */
  private def twoCliques: PropertyGraph = {
    val c1 = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val c2 = for (a <- 5L to 9L; b <- 5L to 9L if a < b) yield (a, b)
    graphOf(10, c1 ++ c2 ++ Seq((4L, 5L)))
  }

  // full-pass steps (1 batch/iteration), few negatives: in a 10-node
  // vocabulary ~half the unigram draws land in the SAME clique, so a high
  // negative rate actively fights the separation the test asserts.
  private val trainCfg = Node2Vec.Config(
    embeddingSize = 16, walkLength = 12, walksPerNode = 6, windowSize = 4,
    negativeSamplingRate = 2, centerSamplingFactor = 1.0, // keep all tokens
    initialLearningRate = 1.0, minLearningRate = 0.05,
    iterations = 30, batchesPerIteration = 1, unigramTableSize = 1 << 10,
    orientation = Orientation.Undirected)

  test("training reduces skip-gram loss and separates the two cliques") {
    val res = Node2Vec.runWithStats(twoCliques, trainCfg)
    assert(res.losses.size === 30)
    assert(res.losses.last < res.losses.head,
      s"loss did not descend: ${res.losses}")
    val emb = res.embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(emb.size === 10 && emb.values.forall(_.size === 16))
    val sameClique = for {
      a <- 0L to 9L; b <- 0L to 9L
      if a < b && (a < 5) == (b < 5)
    } yield cosine(emb(a), emb(b))
    val crossClique = for {
      a <- 0L to 4L; b <- 5L to 9L
    } yield cosine(emb(a), emb(b))
    val sameMean = sameClique.sum / sameClique.size
    val crossMean = crossClique.sum / crossClique.size
    assert(sameMean > crossMean + 0.05,
      f"no separation: same=$sameMean%.4f cross=$crossMean%.4f")
  }

  test("embeddings reproducible across input partitionings (1e-6)") {
    val g = twoCliques
    val cfg = trainCfg.copy(iterations = 1)
    val a = Node2Vec.run(g, cfg).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val g2 = PropertyGraph(g.nodes.repartition(3), g.edges.repartition(5))
    val b = Node2Vec.run(g2, cfg).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.keySet === b.keySet)
    for (id <- a.keySet; (x, y) <- a(id).zip(b(id)))
      assert(math.abs(x - y) <= 1e-6, s"node $id differs: $x vs $y")
  }

  test("negativeSamplingRate = 0 trains on positives only (sequence(1,0) is NOT empty)") {
    val res = Node2Vec.runWithStats(twoCliques,
      trainCfg.copy(iterations = 1, negativeSamplingRate = 0))
    // positives per step = full pair corpus; with the old sequence(1, 0)
    // descending-array bug every pair gained TWO negatives (3x the count)
    assert(res.sampleCounts.head > 0)
    val withNegs = Node2Vec.runWithStats(twoCliques,
      trainCfg.copy(iterations = 1, negativeSamplingRate = 2))
    assert(withNegs.sampleCounts.head === res.sampleCounts.head * 3)
  }

  test("SGD step plans are codegen-cache-identical across steps (lr rides a param table)") {
    import org.apache.spark.metrics.source.CodegenMetrics
    val g = twoCliques
    // marginal compilations per EXTRA step must be ~0: with (lr, iter,
    // batch) bound as a broadcast param table the step plans are
    // source-identical, so steps 2..N hit the codegen cache; with lr as a
    // plan literal each step re-generates and re-JITs the wide gradient
    // codegen (the fresh-JVM 2-3× trainer cold-start, BASELINE.md
    // calibration note). Measured as a within-run delta — two separate
    // runs would straddle the 100-entry codegen LRU (RandomWalk's
    // supersteps alone evict it) and count fixed costs, not per-step.
    def compilations(iterations: Int): Long = {
      val before = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      Node2Vec.runWithStats(g, trainCfg.copy(iterations = iterations))
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount - before
    }
    val twoSteps = compilations(2)
    val sixSteps = compilations(6)
    val perExtraStep = (sixSteps - twoSteps) / 4.0
    assert(perExtraStep <= 2.0,
      s"each extra SGD step compiled ~$perExtraStep new codegen units " +
        s"($twoSteps for 2 steps, $sixSteps for 6) — step plans are no " +
        "longer cache-identical")
    // RandomWalk's supersteps carry the same property (the step number
    // rides a param table, not a literal).
    def walkCompilations(steps: Int): Long = {
      val before = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      graft.algos.RandomWalk.run(g, graft.algos.RandomWalk.Config(
        steps = steps, walksPerNode = 2, seed = 11L,
        orientation = Orientation.Undirected)).count()
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount - before
    }
    val threeWalkSteps = walkCompilations(3)
    val nineWalkSteps = walkCompilations(9)
    val perExtraWalkStep = (nineWalkSteps - threeWalkSteps) / 6.0
    assert(perExtraWalkStep <= 2.0,
      s"each extra walk superstep compiled ~$perExtraWalkStep new codegen " +
        s"units ($threeWalkSteps for 3 steps, $nineWalkSteps for 9)")
  }

  test("graph with no edges yields untrained init embeddings for every node") {
    val g = graphOf(3, Seq.empty)
    val res = Node2Vec.runWithStats(g,
      trainCfg.copy(walkLength = 4, walksPerNode = 1))
    val emb = res.embeddings.collect()
    assert(emb.length === 3)
    // walks of length 1 produce no pairs; losses exist but may be all-zero
    assert(res.embeddings.select(size(col("embedding"))).head().getInt(0) === 16)
  }
}
