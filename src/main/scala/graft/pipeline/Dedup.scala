package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Document deduplication for large-scale training-data pipelines, over a
 * `documents(doc_id: long, text: string, ...)` table.
 *
 * Scale design notes (100 TB intent):
 *  - exact dedup is one hash aggregate on a digest — never groupBy the
 *    full text (shuffle would carry the corpus); sha256 reduces shuffle
 *    width to 64 bytes/row;
 *  - MinHash/LSH: shingle → per-band minhash signature → band bucket join.
 *    Signatures are built with built-in codegen'd expressions only
 *    (sha2/min/concat_ws) — no UDFs in the shuffle path. Banding keeps the
 *    candidate join equi (bucket key), so Catalyst plans a plain shuffled
 *    hash join; hub buckets (boilerplate shingles) are bounded by
 *    `maxBucketSize`;
 *  - n-gram Jaccard verifies candidates only (output-linear);
 *  - SimHash gives a 64-bit near-dup fingerprint with hamming-band
 *    grouping.
 */
object Dedup {

  /** Normalized word tokens: lowercase, split on non-alphanumerics. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** k-shingles from an ALREADY-PROJECTED tokens column. `ts` must be an
   *  attribute reference, not an expression: inside the `transform`
   *  lambda the tokens subtree is re-evaluated per element, so an inlined
   *  `split` would make shingling O(tokens²) per document. */
  def shinglesFromTokens(ts: Column, k: Int): Column = {
    val n = size(ts)
    when(n >= k,
      array_distinct(
        transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(ts, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** (idCol, sh) — one row per doc with its distinct k-shingle array.
   *  Two separate projections keep `tokens` an attribute when shingling
   *  (CollapseProject won't inline a non-cheap multi-referenced alias). */
  def shingleFrame(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), shinglesFromTokens(col("__toks"), k).as("sh"))

  /** Word k-shingles as strings ("a b c"), distinct per document; empty
   *  array when the document has fewer than k tokens. Convenience form for
   *  small inputs — prefer shingleFrame on large tables (see above). */
  def shingles(text: Column, k: Int): Column = shinglesFromTokens(tokens(text), k)

  /**
   * Exact duplicates: group by content digest, keep the smallest doc_id as
   * the canonical representative.
   * @return (doc_id, canonical_id, digest) — one row per input doc.
   */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val digested = docs.select(col(idCol), sha2(col(textCol), 256).as("digest"))
    val canon = digested.groupBy("digest").agg(min(col(idCol)).as("canonical_id"))
    digested.join(canon, Seq("digest"))
      .select(col(idCol), col("canonical_id"), col("digest"))
  }

  /**
   * MinHash signature as an array of `numHashes` string minima: hash_i(s) =
   * sha2(i || ':' || s); min over the document's shingles. String-min of a
   * cryptographic hash is an unbiased permutation-min estimator and — being
   * pure built-in expressions — is reproducible by any engine (the DuckDB
   * oracle recomputes it bit-identically). `sh` must be an attribute
   * column (see shingleFrame).
   */
  def minhashFromShingles(sh: Column, numHashes: Int): Column = {
    val hashes = (0 until numHashes).map { i =>
      array_min(transform(sh, s => sha2(concat(lit(i + ":"), s), 256)))
    }
    array(hashes: _*)
  }

  /**
   * MinHash + LSH banding: signature of `bands*rowsPerBand` hashes; docs
   * sharing any band bucket are candidates; candidates are verified with
   * exact shingle Jaccard >= threshold.
   *
   * @return candidate pairs (a, b, jaccard) with a < b, jaccard >= threshold
   */
  def minhashLsh(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, bands: Int = 4, rowsPerBand: Int = 2,
      threshold: Double = 0.5, maxBucketSize: Int = 50): DataFrame = {

    // shingle sets computed once; only (id, bucket) travels through the
    // candidate shuffle — the fat shingle arrays join back per verified
    // candidate side (candidates are output-scale, not corpus-scale).
    val withSh = graft.core.Lineage.cut(
      shingleFrame(docs, idCol, textCol, k)
        .select(col(idCol).as("id"), col("sh"))
        .where(size(col("sh")) > 0))
    val withSig = withSh.select(col("id"),
      minhashFromShingles(col("sh"), bands * rowsPerBand).as("sig"))

    // band key = hash of the band's slice of the signature
    val banded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => sha2(concat_ws("|", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), 256))))
      .select(col("id"), concat(col("pos"), lit("_"), col("col")).as("bucket"))

    // bound hub buckets (boilerplate shingles → giant buckets → quadratic)
    val bucketSizes = banded.groupBy("bucket").agg(count(lit(1)).as("bs"))
    val bounded = banded.join(bucketSizes.where(col("bs") <= maxBucketSize), Seq("bucket"))

    val l = bounded.select(col("bucket"), col("id").as("a"))
    val r = bounded.select(col("bucket"), col("id").as("b"))
    val candidates = l.join(r, Seq("bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b"))
      .dropDuplicates("a", "b")

    candidates
      .join(withSh.select(col("id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(withSh.select(col("id").as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /**
   * All-pairs n-gram Jaccard with PREFIX FILTERING (the PPJoin family,
   * Xiao et al. 2011): shingles are 64-bit-hashed and globally ordered
   * rarest-first (document frequency asc, hash asc); each document indexes
   * only its prefix of length |A| − ⌈t·|A|⌉ + 1. Any pair with J ≥ t
   * shares its globally-smallest common shingle inside BOTH prefixes
   * (if A∩B missed A's prefix, all ≥⌈t·|A|⌉ shared shingles would sit in
   * A's last ⌈t·|A|⌉ − 1 positions — impossible), so joining prefix
   * postings against prefix postings is EXACT while the quadratic
   * candidate join runs only over rare shingles — hot boilerplate
   * shingles sort last and fall out of the prefixes. Survivors are
   * verified exactly on the full hashed-shingle arrays (integer
   * intersection, not ~25-char string compares). `maxPostings` remains a
   * worst-case hub cap on a single prefix-posting list (a corpus of
   * near-identical docs is quadratic by NATURE); results are exact
   * whenever no list exceeds it.
   * @return (a, b, jaccard) with a < b, jaccard >= threshold
   */
  def ngramJaccard(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, threshold: Double = 0.5, maxPostings: Int = 1000): DataFrame = {
    // hashed shingle sets, used by the posting index and both verify
    // joins — checkpointed so the tokenize+shingle scan runs once
    val withSh = graft.core.Lineage.cut(
      shingleFrame(docs, idCol, textCol, k)
        .select(col(idCol).as("id"),
          sort_array(array_distinct(transform(col("sh"), s => xxhash64(s)))).as("sh"))
        .where(size(col("sh")) > 0))
    val posting = withSh.select(col("id"), size(col("sh")).as("len"),
      explode(col("sh")).as("g"))
    val freq = posting.groupBy("g").agg(count(lit(1)).as("df"))
    val pref = posting.join(freq, Seq("g"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("id").orderBy(col("df").asc, col("g").asc)))
      .where(col("rnk") <= col("len") - ceil(col("len") * threshold) + lit(1))
      .select(col("g"), col("id"), col("df"))
      .where(col("df") <= maxPostings)
    val cand = pref.select(col("g"), col("id").as("a"))
      .join(pref.select(col("g"), col("id").as("b")), Seq("g"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    // |A∪B| = |A| + |B| − |A∩B|; the intersection count is a codegen'd
    // two-pointer merge over the sorted hashed sets (no per-pair hashing).
    val inter = graft.functions.VectorFunctions
      .sortedIntersectSize(col("sha"), col("shb")).cast("double")
    cand
      .join(withSh.select(col("id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(withSh.select(col("id").as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"),
        (inter / (size(col("sha")) + size(col("shb")) - inter)).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /**
   * SimHash: 64-bit fingerprint; bit j is the sign of the weighted sum of
   * token-hash bits. Built from xxhash64 + bitwise expressions (codegen'd).
   * @return (doc_id, simhash)
   */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("w"))
      .withColumn("h", xxhash64(col("tok")))
    // per (doc, bit): sum +w when bit set else -w; then assemble the word.
    val bits = tf.select(col(idCol), col("w"), col("h"),
      explode(sequence(lit(0), lit(63))).as("bit"))
      .select(col(idCol), col("bit"),
        when(expr("shiftright(h, bit)").bitwiseAND(1) === 1,
          col("w")).otherwise(-col("w")).as("contrib"))
      .groupBy(col(idCol), col("bit")).agg(sum("contrib").as("s"))
    bits.groupBy(col(idCol))
      .agg(sum(when(col("s") > 0, expr("shiftleft(cast(1 as bigint), bit)"))
        .otherwise(0L)).as("simhash"))
  }

  /** Near-dup pairs by simhash hamming distance <= maxDistance, candidate
   *  generation by 4×16-bit band equality (covers distance ≤ 3 exactly). */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxDistance: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val banded = sh.select(col(idCol).as("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .select(col("id"), col("simhash"),
        concat(col("pos"), lit("_"), col("col")).as("bucket"))
    val l = banded.select(col("bucket"), col("id").as("a"), col("simhash").as("ha"))
    val r = banded.select(col("bucket"), col("id").as("b"), col("simhash").as("hb"))
    l.join(r, Seq("bucket")).where(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .where(col("hamming") <= maxDistance)
  }

  /**
   * Engine-portable SimHash twin (`simhash_check`): identical math to
   * `simhash`, but bit j of the fingerprint comes from the parity of hex
   * digit j of sha256(token) (64 hex chars ↔ 64 bits) instead of xxhash64
   * bit j — sha2 hex is byte-identical across engines, so DuckDB recomputes
   * the exact signature (OracleSql.simhashCheck). Emitted as two unsigned
   * 32-bit halves (`hi` = bits 32..63, `lo` = bits 0..31) so neither engine
   * needs the 1<<63 shift that overflows a signed bigint. Weights are
   * integer token counts, so the per-bit sum `s` and its sign are exact —
   * no float-order portability hazard.
   * @return (doc_id, hi, lo); docs with zero tokens are absent
   */
  def simhashPortable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val odd = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("w"))
      .withColumn("h", sha2(col("tok"), 256))
    val bits = tf.select(col(idCol), col("w"), col("h"),
        explode(sequence(lit(0), lit(63))).as("bit"))
      .select(col(idCol), col("bit"),
        when(expr("substring(h, bit + 1, 1)").isin(odd: _*), col("w"))
          .otherwise(-col("w")).as("contrib"))
      .groupBy(col(idCol), col("bit")).agg(sum("contrib").as("s"))
    bits.groupBy(col(idCol)).agg(
      sum(when(col("s") > 0 && col("bit") >= 32,
        expr("shiftleft(cast(1 as bigint), bit - 32)")).otherwise(0L)).as("hi"),
      sum(when(col("s") > 0 && col("bit") < 32,
        expr("shiftleft(cast(1 as bigint), bit)")).otherwise(0L)).as("lo"))
  }

  /**
   * Embedding-cosine near-duplicate pairs — EXACT baseline: every pair
   * (a < b) whose embedding cosine clears `threshold`. O(n²) by design;
   * the correctness surface the LSH-bucketed scale path below is measured
   * against, for bounded id ranges only (like Similarity.bruteForceTopK).
   * Norms are precomputed per VECTOR (one array pass each), so the pair
   * expression is a single codegen'd dot product.
   * @return (a, b, cosine) with a < b, cosine >= threshold
   */
  def embeddingNearDupExact(vectors: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("n", Similarity.norm(col("v")))
    val l = v.select(col("id").as("a"), col("v").as("va"), col("n").as("na"))
    val r = v.select(col("id").as("b"), col("v").as("vb"), col("n").as("nb"))
    l.crossJoin(r).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /**
   * Embedding-cosine near-dup — the 100 TB path: hyperplane-LSH band
   * buckets generate candidates (ids-only shuffle, exactly like
   * `minhashLsh`'s band join), then candidates are verified with the EXACT
   * cosine — so false positives are zero BY CONSTRUCTION and the only
   * approximation is recall (a τ-similar pair missed by every band).
   * Collision odds per band rise steeply with cosine: near-dups at
   * τ ≈ 0.9 are all but guaranteed to collide somewhere, which is why
   * banding is the standard near-dup design at corpus scale.
   * @return (a, b, cosine) with a < b — a subset of the exact result
   */
  def embeddingNearDup(vectors: DataFrame, threshold: Double,
      bands: Int = 16, bitsPerBand: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val buckets = Similarity.lshBuckets(vectors, bands, bitsPerBand, seed, idCol, vecCol)
    val cand = buckets.select(col("bucket"), col("id").as("a"))
      .join(buckets.select(col("bucket"), col("id").as("b")), Seq("bucket"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"))
      .dropDuplicates("a", "b")
    val v = vectors.select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("n", Similarity.norm(col("v")))
    cand
      .join(v.select(col("id").as("a"), col("v").as("va"), col("n").as("na")), Seq("a"))
      .join(v.select(col("id").as("b"), col("v").as("vb"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /**
   * Canonical assignment over near-dup PAIRS: treat pairs as an undirected
   * graph, run the engine's own WCC, and map every id to the smallest id
   * of its component — the embedding twin of `exact`'s (doc, canonical)
   * contract. Ids absent from every pair are their own canonical.
   * Composes `graft.algos.Wcc` (same Pregel machinery as the graph
   * surface), so the near-dup clustering inherits WCC's scale shape.
   * @return (id, canonical_id) — one row per input vector
   */
  def embeddingCanonical(vectors: DataFrame, pairs: DataFrame,
      idCol: String = "vec_id"): DataFrame = {
    val nodes = vectors.select(col(idCol).as("id"))
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .withColumn("type", lit("NEAR_DUP")).withColumn("weight", lit(1.0))
    val comp = graft.algos.Wcc.run(graft.core.PropertyGraph(nodes, edges))
    // component labels are min-propagated ids already, but derive the
    // canonical explicitly so the contract never depends on WCC's label
    // choice: canonical_id = min(id) over the component.
    val canon = comp.groupBy("component").agg(min("id").as("canonical_id"))
    comp.join(broadcast(canon), Seq("component"))
      .select(col("id"), col("canonical_id"))
  }

  /**
   * Rolling-hash document fingerprint (winnowing-lite): the `n` smallest
   * k-shingle digests, concatenated — robust to local edits, built from
   * the same engine-portable sha2 primitive.
   * @return (doc_id, fingerprint)
   */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, n: Int = 4): DataFrame =
    shingleFrame(docs, idCol, textCol, k)
      .select(col(idCol),
        concat_ws("", slice(sort_array(transform(col("sh"),
          s => sha2(s, 256))), 1, n)).as("fingerprint"))
}
