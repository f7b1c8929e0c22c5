package graft

import graft.core._
import graft.pipeline.GraphSage
import org.apache.spark.sql.functions._

/**
 * GraphSage mean aggregator + unsupervised training (MeanAggregator
 * .java:37, GraphSageLoss.java:37, GraphSageModelTrainer.java:52).
 */
class GraphSageSpec extends SparkSpec {
  import spark.implicits._

  // path 0—1—2 plus isolated 3
  private def pathGraph = graphOf(4, Seq((0L, 1L), (1L, 2L)))

  private def feats(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("id", "features")

  test("forward: one identity layer computes W · mean(self ∪ N), L2-normalized") {
    val f = feats(0L -> Seq(2.0, 0.0), 1L -> Seq(0.0, 4.0),
      2L -> Seq(6.0, 0.0), 3L -> Seq(0.0, 8.0))
    // W = identity: embedding ∝ mean state itself
    val w = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val out = GraphSage.forward(pathGraph, f, Seq((w, "identity")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // node 0: mean({(2,0),(0,4)}) = (1,2) → normalized (1,2)/√5
    val n0 = math.sqrt(5.0)
    assert(math.abs(out(0L)(0) - 1.0 / n0) < 1e-12)
    assert(math.abs(out(0L)(1) - 2.0 / n0) < 1e-12)
    // node 1: mean({(0,4),(2,0),(6,0)}) = (8/3, 4/3) → ∝ (2,1)/√5
    assert(math.abs(out(1L)(0) - 2.0 / n0) < 1e-12)
    assert(math.abs(out(1L)(1) - 1.0 / n0) < 1e-12)
    // isolated node 3: mean({self}) = (0,8) → (0,1)
    assert(out(3L) === Seq(0.0, 1.0))
  }

  test("forward: relu clamps negative linear outputs") {
    val f = feats(0L -> Seq(1.0), 1L -> Seq(1.0), 2L -> Seq(1.0), 3L -> Seq(1.0))
    val w = Array(Array(-1.0), Array(1.0)) // f0 → (-mean, mean)
    val out = GraphSage.forward(pathGraph, f, Seq((w, "relu")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // relu kills the negative channel; normalization leaves (0, 1)
    out.values.foreach(e => assert(e === Seq(0.0, 1.0)))
  }

  test("forward: inductive — identical feature/neighborhood structure ⇒ identical embeddings") {
    // path 0—1—2—3: ends 0 and 3 are isomorphic, as are 1 and 2
    val g = graphOf(4, Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val f = feats(0L -> Seq(1.0, 5.0), 1L -> Seq(2.0, 5.0),
      2L -> Seq(2.0, 5.0), 3L -> Seq(1.0, 5.0))
    val w = Array(Array(0.3, -0.2), Array(0.7, 0.1), Array(-0.4, 0.9))
    val out = GraphSage.forward(g, f, Seq((w, "relu")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(0L) === out(3L))
    assert(out(1L) === out(2L))
    assert(out(0L) !== out(1L))
  }

  test("two stacked layers change dimensionality as configured") {
    val f = feats(0L -> Seq(1.0, 2.0), 1L -> Seq(3.0, 4.0),
      2L -> Seq(5.0, 6.0), 3L -> Seq(7.0, 8.0))
    val w1 = Array(Array(1.0, 0.5), Array(-0.5, 1.0), Array(0.2, 0.2))
    val w2 = Array(Array(1.0, 1.0, 1.0), Array(0.0, 1.0, -1.0))
    val out = GraphSage.forward(pathGraph, f,
      Seq((w1, "relu"), (w2, "identity")))
    assert(out.select(size(col("embedding"))).distinct().head().getInt(0) === 2)
    assert(out.count() === 4)
  }

  test("max-pooling aggregator matches the hand-computed reference formula") {
    // path 0—1—2 (+ isolated 3), 1-dim features h = id+1
    val f = feats(0L -> Seq(1.0), 1L -> Seq(2.0), 2L -> Seq(3.0), 3L -> Seq(4.0))
    // K=1: pooled(u) = relu(1·h(u) + 0) = h(u); max over neighbors;
    // out_i(v) = self_i·h(v) + nbr_i·maxpool(v), identity output activation
    val layer = GraphSage.PoolLayer(
      poolWeights = Array(Array(1.0)), bias = Array(0.0),
      selfWeights = Array(Array(2.0), Array(0.0)),
      neighborsWeights = Array(Array(3.0), Array(1.0)),
      activation = "identity")
    val out = GraphSage.forwardLayers(pathGraph, f, Seq(layer))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // node 0: self 2·1=2, nbr max{h(1)}=2 → (2+3·2, 0+1·2) = (8, 2)
    def normd(a: Double, b: Double) = {
      val n = math.sqrt(a * a + b * b); Seq(a / n, b / n)
    }
    assert(out(0L).zip(normd(8, 2)).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    // node 1: self 2·2=4, max{h(0),h(2)}=3 → (4+9, 3) = (13, 3)
    assert(out(1L).zip(normd(13, 3)).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    // isolated node 3: no neighbors → pooled term 0 → (2·4, 0) = (8, 0) → (1, 0)
    assert(out(3L) === Seq(1.0, 0.0))
  }

  test("pool and mean layers stack") {
    val f = feats(0L -> Seq(1.0, 2.0), 1L -> Seq(3.0, 4.0),
      2L -> Seq(5.0, 6.0), 3L -> Seq(7.0, 8.0))
    val pool = GraphSage.PoolLayer(
      poolWeights = Array(Array(0.5, 0.5), Array(-1.0, 1.0)),
      bias = Array(0.1, -0.1),
      selfWeights = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0)),
      neighborsWeights = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.5, 0.5)),
      activation = "relu")
    val mean = GraphSage.MeanLayer(
      Array(Array(1.0, -1.0, 0.5), Array(0.2, 0.3, 0.4)), "identity")
    val out = GraphSage.forwardLayers(pathGraph, f, Seq(pool, mean))
    assert(out.count() === 4)
    assert(out.select(size(col("embedding"))).distinct().head().getInt(0) === 2)
  }

  test("training descends the GraphSage loss on the two-clique graph") {
    val c1 = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val c2 = for (a <- 5L to 9L; b <- 5L to 9L if a < b) yield (a, b)
    val g = graphOf(10, c1 ++ c2 ++ Seq((4L, 5L)))
    val res = GraphSage.train(g, GraphSage.degreeFeatures(g),
      GraphSage.Config(embeddingSize = 4, epochs = 10, learningRate = 0.05,
        negativeSamplingRate = 1, searchDepth = 3, unigramTableSize = 256))
    assert(res.losses.size === 10)
    assert(res.losses.last < res.losses.head,
      s"loss did not descend: ${res.losses}")
    assert(res.weights.length === 4 && res.weights.head.length === 2)
    val emb = res.embeddings.collect()
    assert(emb.length === 10)
    assert(res.embeddings.select(size(col("embedding"))).distinct()
      .head().getInt(0) === 4)
  }

  test("multi-layer backprop gradients match central finite differences") {
    // the crown-jewel correctness check for trainLayers: for every W entry
    // of a 2-layer stack, the analytic backprop gradient must agree with
    // (L(w+ε) − L(w−ε)) / 2ε on a fixed sample set — under all three
    // activations.
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L), (1L, 3L)))
    val f = feats(0L -> Seq(0.5, -0.2), 1L -> Seq(0.1, 0.7),
      2L -> Seq(-0.3, 0.4), 3L -> Seq(0.9, -0.6), 4L -> Seq(0.2, 0.2))
    val h0 = f.select(col("id"), col("features")(0).as("f0"),
      col("features")(1).as("f1"))
    val contribs = GraphSage.contribPairs(g, Orientation.Undirected)
    val cnt = contribs.groupBy(col("dst").as("id")).agg(count(lit(1)).as("cnt"))
    val samples = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 4L, 0.0),
      (3L, 0L, 1.0), (4L, 2L, 0.0), (1L, 4L, 0.0), (3L, 4L, 1.0))
      .toDF("c", "x", "label")
    val dims = Seq(2, 3, 2)
    val ws: Seq[GraphSage.Weights] = Seq(
      Array(Array(0.4, -0.3), Array(0.25, 0.6), Array(-0.5, 0.2)),
      Array(Array(0.3, -0.2, 0.5), Array(-0.4, 0.6, 0.1)))
    val cs = Seq.fill(2)(contribs)
    val cnts = Seq.fill(2)(cnt)
    for (act <- Seq("sigmoid", "relu", "identity")) {
      val (_, n, grads) =
        GraphSage.lossAndGrads(cs, cnts, h0, dims, ws, act, samples)
      assert(n === 7)
      val eps = 1e-5
      for (k <- ws.indices; i <- ws(k).indices; j <- ws(k)(i).indices) {
        def perturbed(delta: Double): Seq[GraphSage.Weights] = {
          val c = ws.map(_.map(_.clone()))
          c(k)(i)(j) += delta
          c
        }
        val up = GraphSage.lossOnly(cs, h0, dims, perturbed(eps), act, samples)
        val dn = GraphSage.lossOnly(cs, h0, dims, perturbed(-eps), act, samples)
        val fd = (up - dn) / (2 * eps)
        val an = grads(k)(i)(j)
        assert(math.abs(fd - an) <= 1e-4 * math.max(1.0, math.abs(fd)),
          s"$act W($k)($i)($j): analytic $an vs finite-difference $fd")
      }
    }
  }

  test("sampled-neighborhood gradients match finite differences of the sampled objective") {
    // sampleSizes semantics: per-layer sampled subgraphs; forward AND
    // backward must use the same sampled pair set or the gradient is
    // inexact — the FD check catches any mismatch.
    val g = graphOf(6, Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L),
      (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L), (1L, 5L)))
    val f = feats(0L -> Seq(0.5, -0.2), 1L -> Seq(0.1, 0.7),
      2L -> Seq(-0.3, 0.4), 3L -> Seq(0.9, -0.6), 4L -> Seq(0.2, 0.2),
      5L -> Seq(-0.7, 0.3))
    val h0 = f.select(col("id"), col("features")(0).as("f0"),
      col("features")(1).as("f1"))
    val full = GraphSage.contribPairs(g, Orientation.Undirected)
    // layer 0 capped at 2 neighbors, layer 1 at 1 — node 0 has degree 5,
    // so the caps genuinely bite
    val cs = Seq(
      GraphSage.sampledContribs(full, 2, 0, 99L),
      GraphSage.sampledContribs(full, 1, 1, 99L))
    val cnts = cs.map(c => c.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("cnt")))
    // caps hold: ≤ s neighbors + the self pair per dst
    val maxCnt = cnts.head.agg(max(col("cnt"))).head().getLong(0)
    assert(maxCnt <= 3, s"layer-0 sample cap violated: $maxCnt")
    assert(cnts(1).agg(max(col("cnt"))).head().getLong(0) <= 2)
    val samples = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 4L, 0.0),
      (3L, 0L, 1.0), (5L, 2L, 0.0)).toDF("c", "x", "label")
    val dims = Seq(2, 3, 2)
    val ws: Seq[GraphSage.Weights] = Seq(
      Array(Array(0.4, -0.3), Array(0.25, 0.6), Array(-0.5, 0.2)),
      Array(Array(0.3, -0.2, 0.5), Array(-0.4, 0.6, 0.1)))
    val (_, n, grads) =
      GraphSage.lossAndGrads(cs, cnts, h0, dims, ws, "sigmoid", samples)
    assert(n === 5)
    val eps = 1e-5
    for (k <- ws.indices; i <- ws(k).indices; j <- ws(k)(i).indices) {
      def perturbed(delta: Double): Seq[GraphSage.Weights] = {
        val c = ws.map(_.map(_.clone()))
        c(k)(i)(j) += delta
        c
      }
      val up = GraphSage.lossOnly(cs, h0, dims, perturbed(eps), "sigmoid", samples)
      val dn = GraphSage.lossOnly(cs, h0, dims, perturbed(-eps), "sigmoid", samples)
      val fd = (up - dn) / (2 * eps)
      val an = grads(k)(i)(j)
      assert(math.abs(fd - an) <= 1e-4 * math.max(1.0, math.abs(fd)),
        s"sampled W($k)($i)($j): analytic $an vs finite-difference $fd")
    }
  }

  test("trainLayers with sampleSizes trains and stays partition-reproducible") {
    val c1 = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val c2 = for (a <- 5L to 9L; b <- 5L to 9L if a < b) yield (a, b)
    val g = graphOf(10, c1 ++ c2 ++ Seq((4L, 5L)))
    val cfg = GraphSage.TrainLayersConfig(layerDims = Seq(4, 4),
      activation = "sigmoid", sampleSizes = Seq(2, 2), epochs = 6,
      learningRate = 0.05, negativeSamplingRate = 1, searchDepth = 3,
      unigramTableSize = 256)
    val res = GraphSage.trainLayers(g, GraphSage.degreeFeatures(g, normalized = true), cfg)
    assert(res.losses.size === 6)
    assert(res.losses.last < res.losses.head,
      s"sampled loss did not descend: ${res.losses}")
    val g2 = PropertyGraph(g.nodes.repartition(3), g.edges.repartition(5))
    val res2 = GraphSage.trainLayers(g2,
      GraphSage.degreeFeatures(g2, normalized = true), cfg)
    for (k <- res.layers.indices; i <- res.layers(k).weights.indices;
         j <- res.layers(k).weights(i).indices)
      assert(math.abs(res.layers(k).weights(i)(j) -
        res2.layers(k).weights(i)(j)) <= 1e-6,
        s"sampled W($k)($i)($j) differs across partitionings")
  }

  test("forwardLayers with the train seed reproduces sampled-trained embeddings") {
    // the stored-model contract: a model trained with sampleSizes streams
    // back through forwardLayers(sampleSizes, sampleSeed = train seed)
    // over bit-identical per-layer subgraphs
    val g = graphOf(8, Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 0L), (1L, 5L), (2L, 6L)))
    val cfg = GraphSage.TrainLayersConfig(layerDims = Seq(3, 2),
      activation = "sigmoid", sampleSizes = Seq(2, 1), epochs = 2,
      unigramTableSize = 64, seed = 7L)
    val feats = GraphSage.degreeFeatures(g, normalized = true)
    val res = GraphSage.trainLayers(g, feats, cfg)
    val trained = res.embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val streamed = GraphSage.forwardLayers(g, feats, res.layers,
      Orientation.Undirected, cfg.sampleSizes, cfg.seed).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(trained.keySet === streamed.keySet)
    for (id <- trained.keySet; (a, b) <- trained(id).zip(streamed(id)))
      assert(math.abs(a - b) <= 1e-9, s"node $id: trained $a vs streamed $b")
    // and WITHOUT the sample config the full-neighborhood stream diverges
    // (the silent-mismatch this contract exists to prevent)
    val fullStream = GraphSage.forwardLayers(g, feats, res.layers).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(trained.keySet.exists(id =>
      trained(id).zip(fullStream(id)).exists { case (a, b) => math.abs(a - b) > 1e-6 }),
      "full-neighborhood stream unexpectedly matched the sampled model")
  }

  test("trainLayers: 2-layer sigmoid stack with Adam descends the loss") {
    val c1 = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val c2 = for (a <- 5L to 9L; b <- 5L to 9L if a < b) yield (a, b)
    val g = graphOf(10, c1 ++ c2 ++ Seq((4L, 5L)))
    val res = GraphSage.trainLayers(g,
      GraphSage.degreeFeatures(g, normalized = true),
      GraphSage.TrainLayersConfig(layerDims = Seq(4, 4),
        activation = "sigmoid", epochs = 10, learningRate = 0.05,
        negativeSamplingRate = 1, searchDepth = 3, unigramTableSize = 256))
    assert(res.losses.size === 10)
    assert(res.losses.last < res.losses.head,
      s"loss did not descend: ${res.losses}")
    assert(res.layers.length === 2)
    assert(res.layers.head.weights.length === 4 &&
      res.layers.head.weights.head.length === 2)
    assert(res.layers(1).weights.length === 4 &&
      res.layers(1).weights.head.length === 4)
    val emb = res.embeddings.collect()
    assert(emb.length === 10)
    assert(res.embeddings.select(size(col("embedding"))).distinct()
      .head().getInt(0) === 4)
  }

  test("trainLayers weights reproducible across input partitionings (1e-6)") {
    val g = graphOf(6, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L)))
    val cfg = GraphSage.TrainLayersConfig(layerDims = Seq(3, 2),
      activation = "relu", epochs = 2, unigramTableSize = 128)
    val a = GraphSage.trainLayers(g, GraphSage.degreeFeatures(g), cfg).layers
    val g2 = PropertyGraph(g.nodes.repartition(3), g.edges.repartition(5))
    val b = GraphSage.trainLayers(g2, GraphSage.degreeFeatures(g2), cfg).layers
    for (k <- a.indices; i <- a(k).weights.indices; j <- a(k).weights(i).indices)
      assert(math.abs(a(k).weights(i)(j) - b(k).weights(i)(j)) <= 1e-6,
        s"W($k)($i)($j): ${a(k).weights(i)(j)} vs ${b(k).weights(i)(j)}")
  }

  test("trained weights reproducible across input partitionings (1e-6)") {
    val g = graphOf(6, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L)))
    val cfg = GraphSage.Config(embeddingSize = 3, epochs = 2,
      unigramTableSize = 128)
    val a = GraphSage.train(g, GraphSage.degreeFeatures(g), cfg).weights
    val g2 = PropertyGraph(g.nodes.repartition(3), g.edges.repartition(5))
    val b = GraphSage.train(g2, GraphSage.degreeFeatures(g2), cfg).weights
    for (i <- a.indices; j <- a(i).indices)
      assert(math.abs(a(i)(j) - b(i)(j)) <= 1e-6,
        s"W($i)($j): ${a(i)(j)} vs ${b(i)(j)}")
  }
}
