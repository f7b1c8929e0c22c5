package graft

import graft.ingest.CodeFiles
import graft.core._
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/**
 * Ingest invariants (FIXTURES.md §1, §3): sha256 pass-through, deterministic
 * synthesis, edge derivation verified against an independent in-memory
 * recomputation, windowCap skew guard.
 */
class IngestSpec extends SparkSpec {

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("sha256 invariant: ingest-computed sha equals independent recomputation") {
    val cf = CodeFiles.withSha(CodeFiles.synthesize(spark, 500))
    assert(CodeFiles.verifySha(cf) == 0)
    // spot-check against java.security on the driver
    val rows = cf.select("content", "content_sha256").limit(20).collect()
    rows.foreach { r =>
      assert(r.getString(1) == sha256Hex(r.getString(0)))
    }
  }

  test("synthesis is a pure function of (rows, seed), independent of partitioning") {
    val a = CodeFiles.synthesize(spark, 300, seed = 7).orderBy("repo", "path", "commit")
      .collect().toSeq
    val b = CodeFiles.synthesize(spark, 300, seed = 7).repartition(13)
      .orderBy("repo", "path", "commit").collect().toSeq
    assert(a == b)
    val c = CodeFiles.synthesize(spark, 300, seed = 8).orderBy("repo", "path", "commit")
      .collect().toSeq
    assert(a != c)
  }

  test("edge derivation matches independent recomputation (windowed pairs)") {
    val cf = CodeFiles.synthesize(spark, 400).cache()
    val verts = CodeFiles.repoVertices(cf)
    val cap = 4
    val got = CodeFiles.deriveEdges(cf, verts, CodeFiles.DeriveConfig(windowCap = cap))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet

    // independent recomputation on the driver
    val idOf = verts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = cf.select("repo", "path", "commit").collect()
      .map(r => (idOf(r.getString(0)), r.getString(1), r.getString(2)))
    def pairs(groups: Map[String, Set[Long]]): Map[(Long, Long), Int] = {
      val m = scala.collection.mutable.Map[(Long, Long), Int]().withDefaultValue(0)
      groups.values.foreach { members =>
        val sorted = members.toSeq.sorted
        for {
          i <- sorted.indices
          j <- (i + 1) until math.min(i + 1 + cap, sorted.size)
        } m((sorted(i), sorted(j))) += 1
      }
      m.toMap
    }
    val byCommit = pairs(rows.groupBy(_._3).map { case (k, v) => k -> v.map(_._1).toSet })
    val byPath = pairs(rows.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet })
    val expected =
      byCommit.map { case ((s, d), w) => (s, d, "co_commit", w.toDouble) }.toSet ++
        byPath.map { case ((s, d), w) => (s, d, "shared_path", w.toDouble) }.toSet
    assert(got == expected)
    cf.unpersist()
  }

  test("windowCap bounds per-group pair fan-out (hub skew guard, SURVEY.md §7.4)") {
    // one hub commit shared by 100 repos: quadratic would be 4950 pairs,
    // capped emits sum over window = 100*3 - (3+2+1) = 294
    import spark.implicits._
    val cf = (0 until 100).map(i => (f"repo$i%03d", s"p$i", "HUB", "scala", s"c$i"))
      .toDF("repo", "path", "commit", "lang", "content")
    val verts = CodeFiles.repoVertices(cf)
    val edges = CodeFiles.deriveEdges(cf, verts,
      CodeFiles.DeriveConfig(windowCap = 3, sharedPathEdges = false))
    assert(edges.count() == 294)
    // connectivity preserved: one component over the hub group
    val g = PropertyGraph(verts.select(col("id")), edges)
    val comps = graft.algos.Wcc.run(g).select("component").distinct().count()
    assert(comps == 1)
  }

  test("ingest end-to-end builds a usable graph (dense ids, types)") {
    val cf = CodeFiles.synthesize(spark, 1000)
    val g = CodeFiles.ingest(cf)
    val n = g.nodeCount
    assert(n > 0)
    // ids dense [0, n)
    val ids = g.nodes.agg(min("id"), max("id")).head()
    assert(ids.getLong(0) == 0L && ids.getLong(1) == n - 1)
    assert(g.edges.select("type").distinct().collect().map(_.getString(0)).toSet ==
      Set("co_commit", "shared_path"))
    // graph is consumable by an algorithm
    assert(graft.algos.Wcc.run(g).count() == n)
  }
}
