package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Round-4 codegen kernels: sorted-merge intersection expressions
 *  (GraphIntersect.java:60-130 is the reference's sorted-CSR twin). */
class Round4Spec extends SparkSpec {

  private def arrays(n: Int, seed: Int): Seq[Array[Long]] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(12)
      Array.fill(len)(rnd.nextInt(20).toLong).distinct.sorted
    }
  }

  test("sortedIntersect / sortedIntersectSize match array_intersect on sorted sets") {
    val left = arrays(60, 1)
    val right = arrays(60, 2)
    import spark.implicits._
    val df = left.zip(right).toDF("xs", "ys")
    val rows = df.select(
      VectorFunctions.sortedIntersect(col("xs"), col("ys")).as("mi"),
      VectorFunctions.sortedIntersectSize(col("xs"), col("ys")).as("ms"),
      sort_array(array_intersect(col("xs"), col("ys"))).as("ref")).collect()
    rows.foreach { r =>
      val mi = r.getSeq[Long](0)
      val ref = r.getSeq[Long](2)
      assert(mi == ref, s"merge $mi vs builtin $ref")
      assert(r.getInt(1) == ref.size)
    }
  }

  test("sorted intersect edge cases: empty, disjoint, identical, null") {
    import spark.implicits._
    val df = Seq(
      (Array.empty[Long], Array(1L, 2L)),
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L)),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L))).toDF("xs", "ys")
    val got = df.select(
      VectorFunctions.sortedIntersect(col("xs"), col("ys")).as("mi"),
      VectorFunctions.sortedIntersectSize(col("xs"), col("ys")).as("ms"))
      .collect().map(r => (r.getSeq[Long](0), r.getInt(1)))
    assert(got(0) == (Seq.empty[Long], 0))
    assert(got(1) == (Seq.empty[Long], 0))
    assert(got(2) == (Seq(1L, 2L, 3L), 3))
    val withNull = spark.sql(
      "SELECT CAST(null AS array<bigint>) AS xs, array(1L, 2L) AS ys")
    assert(withNull.select(
      VectorFunctions.sortedIntersectSize(col("xs"), col("ys"))).head().isNullAt(0))
  }
}
