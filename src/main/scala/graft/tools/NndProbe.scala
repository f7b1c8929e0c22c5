package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Operating-point probe for the NN-descent ANN loop: recall@5 vs the
  * exact brute-force top-k at a given (search width, iterations) point.
  * `runMain graft.tools.NndProbe <sfDir> [iters] [searchK]` — used to pick
  * the DescentSearchK/DescentIters defaults in PipelineQueries (measured
  * grid at sf0.001: k=5→0.52, k=10→0.84, k=15→0.95-0.96 recall@5). */
object NndProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val iters = args.lift(1).map(_.toInt).getOrElse(15)
    val kSearch = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vs = spark.read.parquet(s"$dir/embeddings.parquet").where(col("vec_id") < 2000).cache()
    val exact = Similarity.bruteForceTopK(vs, k = 5).select(col("a"), col("b")).cache()
    val total = exact.count()
    val refined = Similarity.nnDescentTopK(vs, k = kSearch, maxIterations = iters,
      init = Some(Similarity.lshTopK(vs, k = kSearch, bands = 8, bitsPerBand = 6)))
      .where(col("rank") <= 5).select(col("a"), col("b"))
    val hits = exact.join(refined, Seq("a", "b")).count()
    println(f"RECALL k=$kSearch iters=$iters: ${hits.toDouble / total}%.4f ($hits/$total)")
    spark.stop()
  }
}
