package graft

import graft.core._
import graft.pipeline.{GraphSage, Node2Vec, Similarity}
import org.apache.spark.sql.functions._

/** Round-5 contract fixes: the similarity-proc all-pairs guard, the
 *  exact-integer unigram prefix scan, and the GraphSage empty-feature
 *  guard (VERDICT/ADVICE r4 residuals). */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) =
    (0 until n).map(i => (i.toLong, Seq(i.toDouble, 1.0, -i.toDouble)))
      .toDF("item", "weights")

  test("similarity.proc refuses an unrestricted all-pairs call past the bound") {
    val e = intercept[IllegalArgumentException] {
      Similarity.proc(vecs(10),
        Similarity.ProcConfig(topK = 2, maxUnrestrictedItems = 5L))
    }
    assert(e.getMessage.contains("all-pairs"))
    // a sourceIds restriction re-enables it regardless of n
    val src = Seq(0L, 1L).toDF("id")
    val out = Similarity.proc(vecs(10),
      Similarity.ProcConfig(topK = 2, sourceIds = Some(src),
        maxUnrestrictedItems = 5L))
    assert(out.select("item1").distinct().count() === 2)
    // under the bound the unrestricted call still runs
    assert(Similarity.proc(vecs(4),
      Similarity.ProcConfig(topK = 1, maxUnrestrictedItems = 5L)).count() === 4)
  }

  test("unigram table is bit-identical across input partitionings (scaled-long scan)") {
    // f^0.75 weights summed as DOUBLES depend on how repartitionByRange
    // groups the additions; the scaled-long scan is exact, so ANY
    // partitioning must yield the exact same (bucket → node) table.
    val freq = (1L to 400L).map(i => (i, i % 17 + 1)).toDF("node", "f")
    def tableOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Node2Vec.unigramTable(df, tableSize = 1 << 12, exponent = 0.75)
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val a = tableOf(freq.repartition(1))
    val b = tableOf(freq.repartition(13))
    val c = tableOf(freq.repartitionByRange(5, col("f")))
    assert(a.size === (1 << 12))
    assert(a === b)
    assert(a === c)
  }

  test("GraphSage fails with a contract message on an empty feature frame") {
    val g = graphOf(3, Seq((0L, 1L)))
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "features")
    val e = intercept[IllegalArgumentException] {
      GraphSage.train(g, empty)
    }
    assert(e.getMessage.contains("non-empty feature frame"))
    val e2 = intercept[IllegalArgumentException] {
      GraphSage.trainLayers(g, empty)
    }
    assert(e2.getMessage.contains("non-empty feature frame"))
  }
}
