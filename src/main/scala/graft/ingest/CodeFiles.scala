package graft.ingest

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Ingest for the engine's input table (BASELINE.json input_hint):
 *
 *   code_files(repo: string, path: string, commit: string,
 *              lang: string, content: string)
 *
 * The reference ingests from a Neo4j store (NativeFactory.java:146-217);
 * our source is a lakehouse table. Responsibilities:
 *
 *  - carry the per-row `sha256(content)` invariant through ingest
 *    (computed with the built-in codegen'd sha2 expression at scan time, so
 *    it rides the same pass as the projection — no extra job);
 *  - derive the link graph: vertices are repos, edges come from
 *    (a) commit co-occurrence — two repos touched by the same commit — and
 *    (b) shared paths — two repos containing the same path;
 *  - cap pair generation per group: a hub commit/path touching R repos
 *    would otherwise emit R² pairs (SURVEY.md §7.4 "skew at 10^12-file
 *    intent"). We sort the group's repos and connect each to its next
 *    `windowCap` successors — deterministic, linear in R·windowCap, and
 *    connectivity-preserving (the group stays one connected component,
 *    which is the information co-occurrence actually carries).
 *
 * Scale notes: both derivations are `row_number` windows partitioned by
 * the group key (commit / path) followed by a self-equi-join on the group
 * key with a band predicate on row numbers — shuffles partition by group,
 * AQE handles group-size skew; no driver-side state anywhere.
 */
object CodeFiles {

  val Columns = Seq("repo", "path", "commit", "lang", "content")

  /** Config for edge derivation. */
  final case class DeriveConfig(
      windowCap: Int = 8,
      commitEdges: Boolean = true,
      sharedPathEdges: Boolean = true)

  /** Read a code_files table and attach the sha256 invariant column. */
  def withSha(codeFiles: DataFrame): DataFrame =
    codeFiles.withColumn("content_sha256", sha2(col("content"), 256))

  /**
   * Verify the invariant: every row's carried sha equals a recomputation.
   * @return number of violating rows (0 = invariant holds)
   */
  def verifySha(ingested: DataFrame): Long =
    ingested.where(col("content_sha256") =!= sha2(col("content"), 256)).count()

  /**
   * Dense repo-vertex table: (repo, id). Deterministic (sorted
   * zipWithIndex — Ids.assign), independent of partitioning.
   */
  def repoVertices(codeFiles: DataFrame): DataFrame =
    Ids.assign(codeFiles.select(col("repo")), "repo")

  /**
   * Derive the repo-level edge table: (src, dst, type, weight) with
   * src < dst, weight = number of co-occurrence groups linking the pair
   * under that mechanism. `type` ∈ {co_commit, shared_path} so algorithms
   * can union/filter relationship types (reference UnionGraph semantics).
   */
  def deriveEdges(codeFiles: DataFrame, vertices: DataFrame,
      config: DeriveConfig = DeriveConfig()): DataFrame = {
    val withId = codeFiles
      .join(vertices, Seq("repo"))
      .select(col("id"), col("path"), col("commit"))

    val parts = Seq(
      if (config.commitEdges)
        Some(groupPairs(withId.select(col("commit").as("g"), col("id").as("r")),
          config.windowCap, "co_commit"))
      else None,
      if (config.sharedPathEdges)
        Some(groupPairs(withId.select(col("path").as("g"), col("id").as("r")),
          config.windowCap, "shared_path"))
      else None).flatten

    parts.reduce(_ unionByName _)
  }

  /**
   * Windowed pair generation inside each group: distinct members, sorted,
   * each linked to its next `cap` successors. SQL-shape: row_number window
   * + band self-join — both shuffle on the group key only.
   */
  private def groupPairs(grouped: DataFrame, cap: Int, edgeType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val members = grouped.distinct()
    val numbered = members.withColumn("rn",
      row_number().over(Window.partitionBy(col("g")).orderBy(col("r"))))
    // distinct column names on each side: a self-join on `g === g` would
    // resolve both sides to the same attribute (trivially true → cartesian).
    val a = numbered.select(col("g").as("ga"), col("r").as("src"), col("rn").as("rna"))
    val b = numbered.select(col("g").as("gb"), col("r").as("dst"), col("rn").as("rnb"))
    a.join(b, col("ga") === col("gb") &&
        col("rnb") > col("rna") && col("rnb") <= col("rna") + cap)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("double").as("weight"))
      .withColumn("type", lit(edgeType))
      .select(col("src"), col("dst"), col("type"), col("weight"))
  }

  /** Full ingest: code_files → PropertyGraph over repo vertices. */
  def ingest(codeFiles: DataFrame, config: DeriveConfig = DeriveConfig()): PropertyGraph = {
    val vertices = repoVertices(codeFiles)
    val edges = deriveEdges(codeFiles, vertices, config)
    PropertyGraph(vertices.select(col("id"), col("repo").as("originalId")), edges)
  }

  // -------------------------------------------------------------------
  // Deterministic synthesis (FIXTURES.md §1): pure function of
  // (rows, seed) — hub skew built in via Zipf-ish group sizes.
  // -------------------------------------------------------------------

  /**
   * Synthesize a code_files table. Everything derives from `spark.range`
   * plus arithmetic on the row index — no RNG object, so the result is a
   * pure function of (rows, seed) regardless of partitioning.
   *
   * Hub skew: repo r appears in ~rows/(r+1) rows (harmonic sizes), so a
   * few repos/paths/commits are hubs — exercising the windowCap and the
   * skew handling the north rule calls out.
   */
  def synthesize(spark: SparkSession, rows: Long, seed: Long = 42L): DataFrame = {
    val base = spark.range(rows).select(col("id").as("i"))
    val h = abs(xxhash64(col("i"), lit(seed)))
    // NB: Column `/` is double division — shift via integer-safe ops only.
    val h7 = (h / lit(7)).cast("long")
    val h11 = (h / lit(11)).cast("long")
    val h13 = (h / lit(13)).cast("long")
    base.select(
      concat(lit("org"), format_string("%03d", (h % 97)),
        lit("/repo"), format_string("%04d", pmod(col("i") * col("i") + h, lit(211)))).as("repo"),
      concat(lit("src/"),
        format_string("%02d", h7 % 23),
        lit("/file"), format_string("%03d", h11 % 131),
        lit(".scala")).as("path"),
      sha2(concat(lit("c"), (col("i") / lit(3)).cast("long").cast("string"),
        lit(":"), lit(seed)), 256).substr(1, 40).as("commit"),
      element_at(array(lit("scala"), lit("java"), lit("py"), lit("md"), lit("rs")),
        (h13 % 5 + 1).cast("int")).as("lang"),
      concat(lit("// synthetic content "), col("i").cast("string"),
        lit(" :: "), lit(seed), lit("\nobject X { val v = "),
        (h % 100000).cast("string"), lit(" }\n")).as("content"))
  }
}
