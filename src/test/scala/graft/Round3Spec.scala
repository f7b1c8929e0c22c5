package graft

import graft.core._
import graft.algos._
import graft.pipeline.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Round-3 regression suite: SCC DAG-chain outer-round bound, traverse
  * collect guard, multimodal real header codec, similarity proc surface,
  * NodeSimilarity Option-knob validation, extended memory estimates. */
class Round3Spec extends SparkSpec {

  // ---- SCC: descending-id chain must not take O(n) coloring rounds ----

  test("SCC trims/hash-colors a descending-id DAG chain in bounded outer rounds") {
    // path n-1 → n-2 → … → 0: with id-priority coloring every vertex gets
    // color n-1 and ONE SCC resolves per round (VERDICT r2 #5); with the
    // trim pre-pass + hash priorities the round count stays small.
    val n = 48
    val g = graphOf(n, (1 until n).map(i => (i.toLong, (i - 1).toLong)))
    val (comp, rounds) = Scc.runWithStats(g)
    val m = longs(comp)
    assert(m.size == n)
    assert((0 until n).forall(i => m(i.toLong) == i.toLong), "all SCCs are singletons")
    assert(rounds <= 12, s"outer coloring rounds $rounds should be ≪ n=$n")
  }

  test("SCC stays exact on mixed cycle + chain graphs under the new coloring") {
    // two cycles {0,1,2} and {5,6}, chain 3→4 between them
    val g = graphOf(7, Seq((0L,1L),(1L,2L),(2L,0L),(2L,3L),(3L,4L),(4L,5L),(5L,6L),(6L,5L)))
    val m = longs(Scc.run(g))
    assert(m(0L) == 2L && m(1L) == 2L && m(2L) == 2L)
    assert(m(3L) == 3L && m(4L) == 4L)
    assert(m(5L) == 6L && m(6L) == 6L)
  }

  // ---- traverse guard ----

  test("traverse refuses to collect more than maxCollectNodes") {
    val g = graphOf(64, (0L until 63L).map(i => (i, i + 1)))
    val e = intercept[IllegalArgumentException] {
      Traversal.traverse(g, 0L, dfs = false, maxCollectNodes = 10L)
    }
    assert(e.getMessage.contains("maxCollectNodes"))
  }

  // ---- multimodal: real BMP header round-trip + PNG parse ----

  test("multimodal payloads are valid BMP headers; dimensions parse from bytes") {
    import spark.implicits._
    val d = Seq((1L, "hello world"), (2L, "a much longer text body here"))
      .toDF("doc_id", "text")
    val p = Multimodal.synthesizePayloads(d)
    val parsed = p.select(col("doc_id"), col("media.width").as("mw"),
        col("media.height").as("mh"),
        Multimodal.imageDimensions(col("payload")).as("dims"))
      .select(col("doc_id"), col("mw"), col("mh"),
        col("dims.width").as("pw"), col("dims.height").as("ph"))
      .collect()
    assert(parsed.nonEmpty)
    parsed.foreach { r =>
      assert(r.getInt(1) == r.getInt(3), "parsed width == encoded width")
      assert(r.getInt(2) == r.getInt(4), "parsed height == encoded height")
    }
    // magic bytes really are 'BM'
    val magic = p.select(hex(substring(col("payload"), 1, 2))).head().getString(0)
    assert(magic == "424D")
  }

  test("multimodal resize re-encodes the header; re-parse sees the new dims") {
    import spark.implicits._
    val d = Seq((1L, "x" * 50), (2L, "resize me to something small"))
      .toDF("doc_id", "text")
    val resized = Multimodal.resize(Multimodal.synthesizePayloads(d), maxSide = 64)
    val rows = resized.select(col("media.width").as("mw"), col("media.height").as("mh"),
        Multimodal.imageDimensions(col("payload")).as("dims"))
      .select(col("mw"), col("mh"), col("dims.width"), col("dims.height"))
      .collect()
    rows.foreach { r =>
      assert(math.max(r.getInt(0), r.getInt(1)) <= 64, "fits maxSide")
      assert(r.getInt(0) == r.getInt(2) && r.getInt(1) == r.getInt(3),
        "payload header agrees with metadata after resize")
    }
  }

  test("imageDimensions parses PNG IHDR big-endian") {
    import spark.implicits._
    // minimal PNG prefix: 8-byte signature + IHDR length/type + w=800, h=600
    val pngHex = "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000320" + "00000258"
    val df = Seq(Tuple1(pngHex)).toDF("hx")
      .select(to_binary(col("hx"), lit("hex")).as("payload"))
    val dims = df.select(Multimodal.imageDimensions(col("payload")).as("d"))
      .select(col("d.width"), col("d.height")).head()
    assert(dims.getInt(0) == 800 && dims.getInt(1) == 600)
  }

  // ---- similarity proc surface (SimilarityAlgorithm.java:33 semantics) ----

  private def vecItems = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0)),
      (4L, Seq(1.0, 0.0, 0.1))).toDF("item", "weights")
  }

  test("similarity proc: cutoff applies BEFORE topK, ranks deterministic") {
    // cosine(1,3) = 0 < cutoff 0.5 → pair dropped, not just ranked last
    val r = Similarity.proc(vecItems,
      Similarity.ProcConfig(topK = 2, similarityCutoff = 0.5))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(3)))
    assert(!r.exists { case (a, b, _) => (a, b) == (1L, 3L) || (a, b) == (3L, 1L) })
    // item1 = 1: best neighbor is 4 (cos ≈ 0.995) then 2 (≈ 0.707)
    val one = r.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq
    assert(one == Seq(4L, 2L))
  }

  test("similarity proc: sourceIds/targetIds restrict pair endpoints") {
    import spark.implicits._
    val src = Seq(1L).toDF("id")
    val tgt = Seq(2L, 3L).toDF("id")
    val r = Similarity.proc(vecItems, Similarity.ProcConfig(
        sourceIds = Some(src), targetIds = Some(tgt)))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSet == Set((1L, 2L), (1L, 3L)))
  }

  test("similarity proc: euclidean/pearson/overlap metrics run") {
    for (m <- Seq("euclidean", "pearson")) {
      val r = Similarity.proc(vecItems, Similarity.ProcConfig(topK = 1, metric = m))
      assert(r.count() > 0, m)
    }
    import spark.implicits._
    val cats = Seq((1L, Seq("a", "b")), (2L, Seq("a", "b", "c")), (3L, Seq("c")))
      .toDF("item", "weights")
    val ov = Similarity.proc(cats, Similarity.ProcConfig(metric = "overlap"))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(math.abs(ov((1L, 2L)) - 1.0) < 1e-12) // |{a,b}∩{a,b,c}| / min(2,3)
  }

  // ---- NodeSimilarity Option-knob validation (ADVICE r2) ----

  test("nodeSimilarity rejects explicit topK combined with bottomK") {
    intercept[IllegalArgumentException] {
      NodeSimilarity.Config(topK = Some(10), bottomK = Some(3))
    }
    // defaulted topK (None) + bottomK is the valid bottom-K mode
    val c = NodeSimilarity.Config(bottomK = Some(3))
    assert(c.effectiveK == 3 && c.ascending)
    assert(NodeSimilarity.Config().effectiveK == 10)
  }

  // ---- extended memory estimates (F5) ----

  test("memory estimates cover the heavy algorithm families and scale") {
    val small = graphOf(10, (0L until 9L).map(i => (i, i + 1)))
    val big = graphOf(100, (0L until 99L).map(i => (i, i + 1)))
    def check(name: String, f: PropertyGraph => MemoryEstimation.Estimate): Unit = {
      val s = f(small); val b = f(big)
      assert(s.bytesMin > 0, name)
      assert(b.bytesMin > s.bytesMin, s"$name scales with dimensions")
      assert(s.tree.nonEmpty && s.tree.contains("|--"), s"$name tree shape")
    }
    check("louvain", g => MemoryEstimation.louvain(g))
    check("betweenness", g => MemoryEstimation.betweenness(g))
    check("closeness", g => MemoryEstimation.closeness(g))
    check("fastrp", g => MemoryEstimation.fastRP(g))
    check("lpa", g => MemoryEstimation.labelPropagation(g))
    check("triangles", g => MemoryEstimation.triangleCount(g))
    check("scc", g => MemoryEstimation.scc(g))
    check("bfsLevels", g => MemoryEstimation.traversal(g))
    check("sssp", g => MemoryEstimation.traversal(g, weighted = true))
    check("hyperball", g => MemoryEstimation.hyperBall(g))
    // weighted traversal carries the 8-byte weight on messages and edges
    assert(MemoryEstimation.traversal(small, weighted = true).bytesMin >
      MemoryEstimation.traversal(small).bytesMin)
    // register memory doubles per logRegisters step
    assert(MemoryEstimation.hyperBall(small, 7).bytesMin >
      MemoryEstimation.hyperBall(small, 6).bytesMin)
    // louvain max covers multi-level contraction
    assert(MemoryEstimation.louvain(small, 10).bytesMax >
      MemoryEstimation.louvain(small, 10).bytesMin)
    // betweenness sampled mode is linear in the source count
    val all = MemoryEstimation.betweenness(big, None)
    val sampled = MemoryEstimation.betweenness(big, Some(4L))
    assert(sampled.bytesMin < all.bytesMin)
    // r4 families: eigenvector/articleRank, k1coloring, spanning tree,
    // random walk — every remaining algorithm family has an estimate
    check("eigenvector", g => MemoryEstimation.eigenvector(g))
    check("k1coloring", g => MemoryEstimation.k1Coloring(g))
    check("spanningTree", g => MemoryEstimation.spanningTree(g))
    check("randomWalk", g => MemoryEstimation.randomWalk(g))
    // paths dominate random-walk memory: doubling walkLength ~doubles it
    assert(MemoryEstimation.randomWalk(small, 10, 160).bytesMin >
      MemoryEstimation.randomWalk(small, 10, 80).bytesMin)
    // fastRP wide rows scale with the embedding dimension
    assert(MemoryEstimation.fastRP(small, 256).bytesMin >
      MemoryEstimation.fastRP(small, 128).bytesMin)
    // r4 continuation: the trained-embedding families
    check("node2vec", g => MemoryEstimation.node2Vec(g))
    check("graphSage", g => MemoryEstimation.graphSage(g))
    // the pair corpus dominates node2vec: widening the window grows it
    assert(MemoryEstimation.node2Vec(small, windowSize = 20).bytesMin >
      MemoryEstimation.node2Vec(small, windowSize = 10).bytesMin)
    // graphSage footprint scales with the feature dimension
    assert(MemoryEstimation.graphSage(small, featureDim = 8).bytesMin >
      MemoryEstimation.graphSage(small, featureDim = 2).bytesMin)
  }
}
