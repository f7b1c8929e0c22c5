package graft.queries

import graft.pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Driver-facing training-data pipeline queries over documents/embeddings.
 * Output shapes/rounding match OracleSql exactly (column names included —
 * the driver's compare hashes values sorted by column name).
 */
object PipelineQueries {

  /** A small single-file parquet scans as ONE split, which serializes the
   *  per-row hash pipelines (minhash = numHashes sha2 per shingle; simhash;
   *  raster decode) onto one core (measured: dedup_lsh_pairs wall ≈ CPU/2
   *  at local[32]; 45.4 s → 11.8 s same-window A/B after the re-spread).
   *  Re-spread ONLY when the scan has fewer splits than cores — at
   *  production scale the scan itself provides the parallelism and this
   *  branch never fires, so no shuffle is added to the 100 TB plan.
   *
   *  Deliberately NOT applied to the embeddings table: its consumers are
   *  crossJoin-shaped (brute-force topK, LSH plane projection, configured
   *  proc), and a 32-partition operand turns each CartesianProduct into
   *  32×32 tiny tasks (measured: similarity_proc process-CPU 2.8 s → 58 s,
   *  bruteForce 11 s → 129 s). Cartesian task count is p·q — operand
   *  partitioning must stay O(√cores), which the single-split scan already
   *  satisfies. */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spread(spark, spark.read.parquet(s"$dir/documents.parquet"))

  private def embs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(spark, dir))

  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    d.select(col("doc_id"),
      TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_ws_tokens"),
      TextAnalysis.tokenCountBpe(col("text")).cast("long").as("n_bpe_tokens"))
  }

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(docs(spark, dir))

  def langId(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(docs(spark, dir))
      .select(col("doc_id"), col("detected_lang"),
        col("marker_hits").cast("long").as("marker_hits"))

  /** Exact brute-force top-5 on the shared id range — the value surface of
   *  ann_cosine AND the ground truth both recall checks compare against.
   *  Memoized like the other algorithm/check twins (GraphQueries
   *  .cachedResult): the O(n²) pair scan is the expensive part of three
   *  separate queries (measured 3×~25 s at sf0.1). */
  private def cachedExactTopK(spark: SparkSession, dir: String): DataFrame =
    GraphQueries.cachedResult(spark, s"annexact|$dir") {
      Similarity.bruteForceTopK(embs(spark, dir).where(col("vec_id") < 2000), k = 5)
    }

  def annCosine(spark: SparkSession, dir: String): DataFrame =
    cachedExactTopK(spark, dir)
      .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    Dedup.shingleFrame(docs(spark, dir), "doc_id", "text", 3)
      .select(col("doc_id"),
        Dedup.minhashFromShingles(col("sh"), 4).as("sig"))
      .select(col("doc_id"),
        col("sig")(0).as("h0"), col("sig")(1).as("h1"),
        col("sig")(2).as("h2"), col("sig")(3).as("h3"))
      .where(col("h0").isNotNull) // docs with < k tokens have no shingles
  }

  /** Configured similarity proc: user vectors = embeddings, sources
   *  vec_id < 200, targets vec_id < 1000, cutoff 0.0 applied before
   *  topK=4 — the reference's sourceIds/targetIds/topK stream shape. */
  def similarityProc(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val src = e.where(col("vec_id") < 200).select(col("vec_id").as("id"))
    val tgt = e.where(col("vec_id") < 1000).select(col("vec_id").as("id"))
    Similarity.proc(e, Similarity.ProcConfig(topK = 4, similarityCutoff = 0.0,
        sourceIds = Some(src), targetIds = Some(tgt)),
      idCol = "vec_id", weightsCol = "embedding")
      .select(col("item1"), col("item2"),
        round(col("similarity"), 6).as("similarity"),
        col("rank").cast("long").as("rank"))
  }

  // --- rows-only checks (no portable oracle: xxhash64 / murmur based) ---

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(spark, dir))

  /** Oracle-bearing twin of dedup_simhash (the one remaining rows-only
   *  query without one): the identical sign-of-weighted-bit-sum fingerprint
   *  under an engine-portable sha256 bit source, fully recomputed by the
   *  DuckDB oracle as a value check. */
  def simhashCheck(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPortable(docs(spark, dir))

  def dedupNgramPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(spark, dir), k = 5, threshold = 0.3)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))

  def dedupLshPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(docs(spark, dir), k = 3, bands = 4, rowsPerBand = 2,
      threshold = 0.3)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))

  def knnLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(embs(spark, dir), k = 5, bands = 8, bitsPerBand = 6)

  /** Property oracle for knn_lsh (reference ANN quality contract —
   *  ApproxNearestNeighborsAlgorithm.java:59): recall@5 of the LSH top-k
   *  against the exact brute-force top-k on the shared id range
   *  (vec_id < 2000, the `ann_cosine` oracle surface). Spark computes the
   *  ACTUAL recall at knn_lsh's own operating point (bands=8, bits=6);
   *  the DuckDB oracle pins (queries = |range|, recall_ge_0_25 = true).
   *  Measured: 0.37 at sf0.01, 0.47 at sf0.001 — the synthetic embeddings
   *  are near-uniform, so hyperplane-LSH recall is modest by nature; the
   *  0.25 floor is a regression guard (a broken banding/bucket join would
   *  drop it to ~k/n ≈ 0.003), not a quality target. */
  def knnRecall(spark: SparkSession, dir: String): DataFrame = {
    val vs = embs(spark, dir).where(col("vec_id") < 2000)
    val exact = cachedExactTopK(spark, dir).select(col("a"), col("b"))
    // top-5 of the memoized width-15 LSH list ≡ lshTopK(k=5): identical
    // candidate set (same bands/bits/seed), identical (cosine desc, b asc)
    // ranking — so rank ≤ 5 of the wider list IS the k=5 result.
    val approx = cachedLshInit(spark, dir).where(col("rank") <= 5)
      .select(col("a"), col("b"))
    val hits = exact.join(approx, Seq("a", "b")).count()
    val total = exact.count()
    val recall = if (total == 0) 1.0 else hits.toDouble / total
    System.err.println(f"[knn_recall] recall@5 = $recall%.4f ($hits/$total)")
    import spark.implicits._
    Seq((vs.count(), recall >= 0.25)).toDF("queries", "recall_ge_0_25")
  }

  /** IVF coarse-quantized top-k on the shared id range — memoized across
   *  the ivf_topk/ivf_recall twins (one cell-local pair scan serves both).
   *  nCentroids = 8 at the gate scales so cells hold enough candidates for
   *  a meaningful recall floor; the 100 TB shape raises nCentroids with
   *  the corpus (cells stay fixed-size, the pair scan stays cell-local). */
  private def cachedIvfTopK(spark: SparkSession, dir: String): DataFrame =
    GraphQueries.cachedResult(spark, s"ivf|$dir") {
      Similarity.ivfTopK(embs(spark, dir).where(col("vec_id") < 2000),
        k = 5, nCentroids = 8)
    }

  /** IVF cell-pruned ANN surface (rows-only: the deterministic centroid
   *  draw is xxhash64-ordered, not portable to the oracle engine; the
   *  quality contract is ivf_recall's property oracle). */
  def ivfTopk(spark: SparkSession, dir: String): DataFrame =
    cachedIvfTopK(spark, dir)
      .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))

  /** Property oracle for ivf_topk: recall@5 of the cell-restricted search
   *  against the exact brute-force top-k on the shared id range. The floor
   *  is a regression guard like knn_recall's — a broken cell assignment or
   *  pair scan collapses recall to ~k/n ≈ 0.003, while the correct
   *  8-cell layout measures 0.27 at sf0.001 / 0.25 at sf0.01 (near-uniform
   *  synthetic embeddings cap cell-pruned recall by nature; real corpora
   *  cluster and recall rises with them). */
  def ivfRecall(spark: SparkSession, dir: String): DataFrame = {
    val vs = embs(spark, dir).where(col("vec_id") < 2000)
    val exact = cachedExactTopK(spark, dir).select(col("a"), col("b"))
    val approx = cachedIvfTopK(spark, dir).select(col("a"), col("b"))
    val hits = exact.join(approx, Seq("a", "b")).count()
    val total = exact.count()
    val recall = if (total == 0) 1.0 else hits.toDouble / total
    System.err.println(f"[ivf_recall] recall@5 = $recall%.4f ($hits/$total)")
    import spark.implicits._
    Seq((vs.count(), recall >= 0.10)).toDF("queries", "recall_ge_0_10")
  }

  /** NN-descent refinement over the LSH init (the reference's actual ANN
   *  loop, `ApproxNearestNeighborsAlgorithm.java:124-197`): rows-only
   *  bench surface at the shared id range. */
  /** NN-descent search width: lists of 3k are maintained during the
   *  iteration and truncated to k on output — on these near-uniform
   *  synthetic embeddings the wider frontier is what carries recall@5 from
   *  ~0.52 (k-width search) to ≥0.9 (measured: 0.948 at 8 iterations),
   *  mirroring the reference's decoupled sampleSize = p·topK draw. */
  private val DescentSearchK = 15
  private val DescentIters = 8

  /** Width-15 LSH lists on the shared id range — the NN-descent init AND
   *  (rank ≤ 5) knn_recall's approximate side. Memoized: same operating
   *  point, same candidate ranking. */
  private def cachedLshInit(spark: SparkSession, dir: String): DataFrame =
    GraphQueries.cachedResult(spark, s"annlsh|$dir") {
      val vs = embs(spark, dir).where(col("vec_id") < 2000)
      Similarity.lshTopK(vs, k = DescentSearchK, bands = 8, bitsPerBand = 6)
    }

  /** The refined lists are shared by ann_nn_descent and its recall check —
   *  memoized like the other algorithm/check twins (GraphQueries). */
  private def cachedDescent(spark: SparkSession, dir: String): DataFrame =
    GraphQueries.cachedResult(spark, s"nnd|$dir") {
      val vs = embs(spark, dir).where(col("vec_id") < 2000)
      Similarity.nnDescentTopK(vs, k = DescentSearchK, maxIterations = DescentIters,
        init = Some(cachedLshInit(spark, dir)))
        .where(col("rank") <= 5)
        .select(col("a"), col("b"), col("cosine"), col("rank"))
    }

  def annNnDescent(spark: SparkSession, dir: String): DataFrame =
    cachedDescent(spark, dir)
      .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))

  /** Property oracle for the NN-descent loop: recall@5 vs the exact
   *  brute-force top-k on the shared id range must clear 0.8 — far above
   *  the raw LSH init (knn_recall's measured 0.35-0.47); the refinement is
   *  the whole point of the reference's iteration. Measured 0.92-0.96 at
   *  both gate scales. DuckDB pins (queries = |range|, recall_ge_0_80). */
  def annDescentRecall(spark: SparkSession, dir: String): DataFrame = {
    val vs = embs(spark, dir).where(col("vec_id") < 2000)
    val exact = cachedExactTopK(spark, dir).select(col("a"), col("b"))
    val refined = cachedDescent(spark, dir).select(col("a"), col("b"))
    val hits = exact.join(refined, Seq("a", "b")).count()
    val total = exact.count()
    val recall = if (total == 0) 1.0 else hits.toDouble / total
    System.err.println(f"[ann_descent_recall] recall@5 = $recall%.4f ($hits/$total)")
    import spark.implicits._
    Seq((vs.count(), recall >= 0.8)).toDF("queries", "recall_ge_0_80")
  }

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Dedup.fingerprint(docs(spark, dir))

  /** Near-dup threshold calibrated to the synthetic embeddings: the
   *  corpus has no true duplicates (top pairwise cosine ≈ 0.48-0.51), so
   *  τ = 0.35 exercises the machinery with a few hundred pairs at both
   *  gate scales (257 at sf0.001, 271 at sf0.01). */
  private val NearDupTau = 0.35

  /** Exact pairs on the shared id range — the value surface of
   *  dedup_embedding AND the ground truth for the LSH check + canonical
   *  assignment. Memoized like the other algorithm/check twins. */
  private def cachedNearDupExact(spark: SparkSession, dir: String): DataFrame =
    GraphQueries.cachedResult(spark, s"embdup|$dir") {
      Dedup.embeddingNearDupExact(
        embs(spark, dir).where(col("vec_id") < 2000), NearDupTau)
    }

  /** Embedding-cosine near-dup pairs (exact form, full DuckDB value
   *  oracle — list_inner_product recomputes every cosine). */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    cachedNearDupExact(spark, dir)
      .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"))

  /** Canonical assignment: near-dup pairs → the engine's own WCC →
   *  (vec_id, canonical_id = min id of the component). DuckDB recomputes
   *  the components independently with a recursive min-label CTE — a full
   *  value oracle over a two-module composition (Dedup × Wcc). */
  def dedupEmbeddingCanon(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingCanonical(
        embs(spark, dir).where(col("vec_id") < 2000),
        cachedNearDupExact(spark, dir))
      .select(col("id").as("vec_id"), col("canonical_id"))

  /** Property oracle for the LSH-bucketed scale path: its verified pairs
   *  must be an exact SUBSET of the brute-force pairs (false_positives=0 —
   *  candidates are verified with the true cosine, so any extra row is a
   *  bug) and recall the exact set above a floor. Hyperplane collision
   *  odds at τ=0.35 / 64-dim with 16 bands × 4 bits give ~0.9 expected
   *  recall on these near-uniform vectors (measured 0.93 at sf0.001,
   *  0.92 at sf0.01); the 0.6 floor is a regression guard — a broken
   *  band join drops it to ~0. DuckDB pins (exact_pairs by recomputation,
   *  false_positives=0, recall_ge_0_60=true). */
  def dedupEmbeddingCheck(spark: SparkSession, dir: String): DataFrame = {
    val exact = cachedNearDupExact(spark, dir).select(col("a"), col("b"))
    val lsh = Dedup.embeddingNearDup(
        embs(spark, dir).where(col("vec_id") < 2000), NearDupTau)
      .select(col("a"), col("b"))
    val falsePos = lsh.join(exact, Seq("a", "b"), "left_anti").count()
    val hits = lsh.join(exact, Seq("a", "b")).count()
    val total = exact.count()
    val recall = if (total == 0) 1.0 else hits.toDouble / total
    System.err.println(f"[dedup_embedding] recall = $recall%.4f ($hits/$total)")
    import spark.implicits._
    Seq((total, falsePos, recall >= 0.6))
      .toDF("exact_pairs", "false_positives", "recall_ge_0_60")
  }

  /** Shared by multimodal and multimodal_check (twins). */
  private def cachedMultimodal(spark: SparkSession, dir: String): DataFrame =
    GraphQueries.cachedResult(spark, s"multimodal|$dir") {
      val withPayload = Multimodal.synthesizePayloads(docs(spark, dir))
      val resized = Multimodal.resize(withPayload, maxSide = 512)
      // width/height come from PARSING the resized payload's header bytes —
      // the de-stubbed decode path — not from the metadata struct.
      val dims = Multimodal.imageDimensions(col("payload"))
      Multimodal.extractFeatures(resized)
        .select(col("doc_id"), dims.getField("width").as("width"),
          dims.getField("height").as("height"),
          length(col("payload")).as("payload_bytes"),
          col("features"))
    }

  def multimodal(spark: SparkSession, dir: String): DataFrame =
    cachedMultimodal(spark, dir)

  /** Shared by video_frames and video_frames_check (twins): GVID
   *  containers synthesized at 6 BMP frames per document, 3 evenly-spaced
   *  frames sliced back out by sampleFrames' offset math, each run
   *  through the real raster feature path. */
  private def cachedVideoFrames(spark: SparkSession, dir: String): DataFrame =
    GraphQueries.cachedResult(spark, s"video|$dir") {
      val vids = Multimodal.synthesizeVideoPayloads(docs(spark, dir), frames = 6)
      val fr = Multimodal.sampleFrames(vids, n = 3, idCol = "doc_id")
      Multimodal.extractFeatures(fr, payloadCol = "frame")
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("ts_ms"), length(col("frame")).cast("long").as("frame_bytes"),
          col("features"))
    }

  /** Value oracle surface for the frame-sampling math: with 6 frames at
   *  fps 25 (duration 240 ms) and n = 3, the sampled indices are exactly
   *  ⌊i·6/3⌋ = {0,2,4}, timestamps idx·40 ms, and every sliced frame is
   *  the constant 118-byte BMP (54-byte header + 64 sha512 pixel bytes) —
   *  all portable, so DuckDB recomputes the whole schedule. */
  def videoFrames(spark: SparkSession, dir: String): DataFrame =
    cachedVideoFrames(spark, dir)
      .select("doc_id", "frame_idx", "ts_ms", "frame_bytes")

  /** Property oracle for the sliced frames' decodability: every sampled
   *  frame must run the full raster feature path (11-dim vector, unit
   *  histogram) — a broken slice offset or header would null the features
   *  or break the histogram. The oracle pins docs, frames = 3·docs, and
   *  zero violations. */
  def videoFramesCheck(spark: SparkSession, dir: String): DataFrame = {
    val m = cachedVideoFrames(spark, dir)
    val histSum = aggregate(slice(col("features"), 4, 8), lit(0.0), _ + _)
    val bad = m.where(col("features").isNull
      .or(size(col("features")) =!= 11)
      .or(abs(histSum - 1.0) > 1e-9)).count()
    import spark.implicits._
    Seq((m.count() / 3, m.count(), bad)).toDF("docs", "frames", "violations")
  }

  /** Property oracle for the raster feature math: every document decodes
   *  to an 11-dim vector ([meanR,meanG,meanB] ++ 8-bin luminance
   *  histogram), channel means live in [0,255], and each histogram — a
   *  vector of per-bin FRACTIONS — sums to exactly 1. The oracle pins the
   *  document count from the raw table and zero violations. */
  def multimodalCheck(spark: SparkSession, dir: String): DataFrame = {
    val m = cachedMultimodal(spark, dir)
    val histSum = aggregate(slice(col("features"), 4, 8), lit(0.0), _ + _)
    val means = slice(col("features"), 1, 3)
    val bad = m.where(col("features").isNull
      .or(size(col("features")) =!= 11)
      .or(abs(histSum - 1.0) > 1e-9)
      .or(exists(means, v => v < 0.0 || v > 255.0))).count()
    import spark.implicits._
    Seq((m.count(), bad)).toDF("docs", "violations")
  }
}
