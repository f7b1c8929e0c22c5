package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** Dedup / similarity / text-analysis / multimodal pipeline operators. */
class PipelineSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under the min doc_id") {
    val d = docs((1L, "hello world"), (2L, "hello world"), (3L, "different"))
    val r = Dedup.exact(d).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 1L && r(2L) == 1L && r(3L) == 3L)
  }

  test("minhash LSH finds near-duplicates and skips distinct docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely unrelated content about spark dataframes and shuffles here"
    val d = docs((1L, base), (2L, near), (3L, far))
    val pairs = Dedup.minhashLsh(d, k = 2, bands = 8, rowsPerBand = 1, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard exact pair verification") {
    val d = docs(
      (1L, "a b c d e"), (2L, "a b c d f"), (3L, "x y z w v"))
    val pairs = Dedup.ngramJaccard(d, k = 2, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // shingles(1) = {ab,bc,cd,de}, shingles(2) = {ab,bc,cd,df}: J = 3/5
    assert(math.abs(pairs((1L, 2L)) - 0.6) < 1e-12)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs equal, near docs close, far docs far") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs((1L, base), (2L, base), (3L, base + " extra"), (4L, "t o t a l l y d i f f e r e n t w o r d s"))
    val h = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L) == h(2L))
    assert(ham(h(1L), h(3L)) < ham(h(1L), h(4L)))
    val pairs = Dedup.simhashPairs(d, maxDistance = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("portable simhash: identical docs equal, near closer than far, halves 32-bit") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs((1L, base), (2L, base), (3L, base + " extra"), (4L, "t o t a l l y d i f f e r e n t w o r d s"))
    val h = Dedup.simhashPortable(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1) << 32) | r.getLong(2))).toMap
    Dedup.simhashPortable(d).collect().foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) < (1L << 32))
      assert(r.getLong(2) >= 0L && r.getLong(2) < (1L << 32))
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L) == h(2L))
    assert(ham(h(1L), h(3L)) < ham(h(1L), h(4L)))
    // deterministic across partitioning (exact integer bit-sums)
    val h2 = Dedup.simhashPortable(d.repartition(7)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1) << 32) | r.getLong(2))).toMap
    assert(h == h2)
  }

  test("document fingerprint stable under distant edits, changes locally") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docs((1L, base), (2L, base))
    val fp = Dedup.fingerprint(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L).nonEmpty)
  }

  test("brute-force cosine topK: exact neighbors on constructed vectors") {
    import spark.implicits._
    val vs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopK(vs, k = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 2L && r(2L) == 1L && r(3L) == 2L)
  }

  test("LSH topK recall on clustered vectors (scale path)") {
    import spark.implicits._
    // two tight clusters around e1 and e2 in 8 dims
    val rows = (0 until 40).map { i =>
      val cluster = i % 2
      val v = Array.tabulate(8)(d =>
        (if (d == cluster) 1.0f else 0.0f) + (i / 2 + d) % 5 * 0.01f)
      (i.toLong, v)
    }
    val vs = rows.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(vs, k = 3).where(col("rank") === 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val approx = Similarity.lshTopK(vs, k = 3, bands = 8, bitsPerBand = 4)
      .where(col("rank") === 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // top-1 must stay inside the right cluster for every query it returns
    approx.foreach { case (a, b) => assert(a % 2 == b % 2, s"$a -> $b crossed clusters") }
    assert(approx.size >= 30, s"LSH recall too low: ${approx.size}/40")
    // and for most queries the exact top-1 is recovered
    val agree = approx.count { case (a, b) => exact.get(a).contains(b) }
    assert(agree >= approx.size / 2)
  }

  test("IVF topK: cell-local, exact cosines, dense ranks on clustered vectors") {
    import spark.implicits._
    // two well-separated clusters around e1 and e2: cross-cluster cosine
    // ≈ 0, so nearest-centroid assignment can never mix clusters no matter
    // which points the deterministic hash draw picks as centroids.
    val rows = (0 until 40).map { i =>
      val cluster = i % 2
      val v = Array.tabulate(8)(d =>
        (if (d == cluster) 1.0f else 0.0f) + (i / 2 + d) % 5 * 0.01f)
      (i.toLong, v)
    }
    val vs = rows.toDF("vec_id", "embedding")
    val ivf = Similarity.ivfTopK(vs, k = 3, nCentroids = 4).collect()
    assert(ivf.nonEmpty)
    // (a) cell-restricted search never crosses the clusters
    ivf.foreach { r =>
      assert(r.getLong(0) % 2 == r.getLong(1) % 2,
        s"${r.getLong(0)} -> ${r.getLong(1)} crossed clusters")
    }
    // (b) returned cosines are the true pairwise cosines (cross-check
    // against the exhaustive brute-force list)
    val exactAll = Similarity.bruteForceTopK(vs, k = 40).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { r =>
      val e = exactAll((r.getLong(0), r.getLong(1)))
      assert(math.abs(r.getDouble(2) - e) < 1e-9)
    }
    // (c) ranks are dense 1..m per query, ordered by cosine descending
    ivf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to rs.length),
        "ranks not dense")
      assert(sorted.map(_.getDouble(2)).toSeq.sliding(2).forall {
        case Seq(x, y) => x >= y - 1e-12; case _ => true })
    }
  }

  test("NN-descent refinement recovers the exact kNN graph from a bad init " +
      "(ApproxNearestNeighborsAlgorithm.java:124-197 iteration)") {
    import spark.implicits._
    // points along an arc with quadratic spacing: cosine similarity
    // strictly decreases with index distance, so the kNN graph is
    // id-local and the NoN landscape has a gradient to climb (the regime
    // NN-descent targets; on plateaus it stalls like the reference does)
    val n = 48
    val rows = (0 until n).map { i =>
      val theta = 1.2 * i * i / (n.toDouble * n)
      (i.toLong, Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }
    val vs = rows.toDF("vec_id", "embedding")
    // adversarial init: hash-scattered partners (NOT an affine map — those
    // compose into pure translations mod n and trap the NoN closure on a
    // fixed coset, a measured stall; see the matching driver-side sim)
    def mix(i: Int, j: Int): Int = {
      var x = i * 2654435761L + j * 40503L
      x ^= x >>> 16; x *= 2246822519L; x ^= x >>> 13
      ((x % n + n) % n).toInt
    }
    val initPairs = (0 until n)
      .flatMap(i => Seq(1, 2).map(j => (i.toLong, mix(i, j).toLong)))
      .filter { case (a, b) => a != b }.distinct
    val v = vs.select(col("vec_id").as("id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val init = initPairs.toDF("a", "b")
      .join(v.select(col("id").as("a"), col("v").as("va")), Seq("a"))
      .join(v.select(col("id").as("b"), col("v").as("vb")), Seq("b"))
      .select(col("a"), col("b"),
        (Similarity.dot(col("va"), col("vb")) /
          (Similarity.norm(col("va")) * Similarity.norm(col("vb")))).as("cosine"))
    val refined = Similarity.nnDescentTopK(vs, k = 3, maxIterations = 10,
      sampleRate = 1.0, init = Some(init))
      .where(col("rank") === 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val exact = Similarity.bruteForceTopK(vs, k = 3).where(col("rank") === 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val initAgree = initPairs.count { case (a, b) => exact.get(a).contains(b) }
    val agree = refined.count { case (a, b) => exact.get(a).contains(b) }
    assert(agree >= 44, s"only $agree/$n exact top-1 recovered (init had $initAgree)")
    assert(agree > initAgree + 20, s"refinement barely improved: $initAgree -> $agree")
  }

  test("text quality: clean prose scores above junk") {
    val good = "The quick brown fox jumps over the lazy dog and it was a fine day for that in the park."
    val junk = "!!!??? ;;; ### 000 1111 ..... ,,,,,"
    val d = docs((1L, good), (2L, junk))
    val q = TextAnalysis.qualityScore(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(q(1L) > q(2L))
  }

  test("language id picks the marker-dominant language") {
    val d = docs(
      (1L, "the cat and the dog went to the house with a ball"),
      (2L, "der hund und die katze ist nicht mit der maus"),
      (3L, "zzz qqq www"))
    val r = TextAnalysis.languageId(d).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "en" && r(2L) == "de" && r(3L) == "und")
  }

  test("multimodal plumbing: payload synthesis, real raster features, resize caps dims") {
    val d = docs((1L, "image one content"), (2L, "image two content"))
    val withP = Multimodal.synthesizePayloads(d)
    // 54-byte real BMP header + 64 stand-in pixel bytes (sha512)
    val payload = withP.select("payload").head().getAs[Array[Byte]](0)
    assert(payload.length == 54 + 64)
    assert(payload(0) == 'B'.toByte && payload(1) == 'M'.toByte)
    val f1 = Multimodal.extractFeatures(withP).select("doc_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val f2 = Multimodal.extractFeatures(withP).select("doc_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(f1 == f2)
    assert(f1(1L).size == 11 && f1(1L) != f1(2L)) // 3 channel means + 8 bins
    // histogram bins sum to 1 over the triplets actually present
    assert(math.abs(f1(1L).drop(3).sum - 1.0) < 1e-9)
    val resized = Multimodal.resize(withP, 256)
      .select(col("media.width"), col("media.height")).collect()
    resized.foreach { r => assert(r.getInt(0) <= 256 && r.getInt(1) <= 256) }
    // non-GVID payloads keep the schedule contract with a null frame
    val frames = Multimodal.sampleFrames(withP, 4, "doc_id")
    assert(frames.count() == 8)
    assert(frames.where(col("frame").isNotNull).count() == 0)
  }

  test("GVID video container: sampleFrames slices real BMP frames; " +
      "each frame decodes through the raster feature path") {
    val d = docs((1L, "clip one"), (2L, "clip two"))
    val vids = Multimodal.synthesizeVideoPayloads(d, frames = 6, fps = 25)
    assert(vids.select("media.duration_ms").head().getLong(0) == 240L)
    val fr = Multimodal.sampleFrames(vids, 3, "doc_id")
    val rows = fr.collect()
    assert(rows.length == 6)
    // every sliced frame is a standalone 118-byte BMP
    rows.foreach { r =>
      val frame = r.getAs[Array[Byte]]("frame")
      assert(frame.length == 54 + 64)
      assert(frame(0) == 'B'.toByte && frame(1) == 'M'.toByte)
    }
    // evenly-spaced source indices with the true timestamps
    val sched = rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(sched == Set((1L, 0, 0L), (1L, 2, 80L), (1L, 4, 160L),
      (2L, 0, 0L), (2L, 2, 80L), (2L, 4, 160L)))
    // sliced frames parse to the video's dims via the real header decode
    val dims = vids.select(col("doc_id"), col("media.width"), col("media.height"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    fr.select(col("doc_id"), Multimodal.imageDimensions(col("frame")).as("d"))
      .collect().foreach { r =>
        assert((r.getStruct(1).getInt(0), r.getStruct(1).getInt(1)) ==
          dims(r.getLong(0)))
      }
    // and run the full raster feature math (11-dim, unit histogram)
    val feats = Multimodal.extractFeatures(fr, payloadCol = "frame")
      .select("features").collect().map(_.getSeq[Double](0))
    feats.foreach(f => assert(f.size == 11 && math.abs(f.drop(3).sum - 1.0) < 1e-9))
    // per-frame pixel salt: the three sampled frames differ
    val f1 = rows.filter(_.getLong(0) == 1L).map(_.getAs[Array[Byte]]("frame").toSeq)
    assert(f1.distinct.length == 3)
  }

  test("extractFeatures: hand-computed raster fixture (2x2 24bpp BMP, padded rows)") {
    // Hand-built 2×2 BMP: stride = 8 (3·2 rounded up to 4 B), two rows of
    // two BGR triplets + 2 pad bytes each.
    def le32(v: Int): Seq[Byte] =
      Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def le16(v: Int): Seq[Byte] = Seq(v, v >> 8).map(x => (x & 0xff).toByte)
    val pixels = Seq[Int](
      10, 20, 30, 40, 50, 60, 0, 0,    // row 1: (B10 G20 R30)(B40 G50 R60) pad
      70, 80, 90, 100, 110, 120, 0, 0  // row 2: (B70 G80 R90)(B100 G110 R120) pad
    ).map(_.toByte)
    val header: Seq[Byte] =
      Seq('B'.toByte, 'M'.toByte) ++ le32(54 + 16) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
        le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    val bmp = (header ++ pixels).toArray
    assert(bmp.length == 70)
    val df = spark.createDataFrame(Seq((1L, bmp))).toDF("doc_id", "payload")
    val f = Multimodal.extractFeatures(df).select("features")
      .head().getSeq[Double](0)
    // means: R (30+60+90+120)/4, G (20+50+80+110)/4, B (10+40+70+100)/4 —
    // pad bytes excluded by the stride math.
    assert(math.abs(f(0) - 75.0) < 1e-9 && math.abs(f(1) - 65.0) < 1e-9 &&
      math.abs(f(2) - 55.0) < 1e-9)
    // luminances 21.85 / 51.85 / 81.85 / 111.85 → bins 0,1,2,3 (width 32)
    assert(f.drop(3) == Seq(0.25, 0.25, 0.25, 0.25, 0.0, 0.0, 0.0, 0.0))
    // non-BMP payload → null features (quarantine semantics)
    val junk = spark.createDataFrame(Seq((2L, Array[Byte](1, 2, 3))))
      .toDF("doc_id", "payload")
    assert(Multimodal.extractFeatures(junk).select("features").head().isNullAt(0))
  }
}
