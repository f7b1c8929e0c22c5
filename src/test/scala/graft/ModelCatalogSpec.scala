package graft

import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

/** gds.beta.model.{list,exists,drop} semantics (ModelCatalog.java:33,
 *  ModelCatalogProc tests) + the parquet save/load roundtrip. */
class ModelCatalogSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  override def beforeEach(): Unit = ModelCatalog.removeAllLoadedModels()

  private def embeddings = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("id", "embedding")

  test("store / exists / algoType / list") {
    assert(!ModelCatalog.exists("alice", "m1"))
    ModelCatalog.store("alice", "m1", "node2vec", embeddings,
      Map("embeddingSize" -> "2", "iterations" -> "3"))
    ModelCatalog.store("alice", "m2", "fastrp", embeddings)
    ModelCatalog.store("bob", "m1", "fastrp", embeddings)
    assert(ModelCatalog.exists("alice", "m1"))
    assert(ModelCatalog.algoType("alice", "m1") === Some("node2vec"))
    assert(ModelCatalog.algoType("alice", "nope") === None)
    assert(ModelCatalog.list("alice").map(_.name) === Seq("m1", "m2"))
    assert(ModelCatalog.list("bob").map(_.name) === Seq("m1"))
    assert(ModelCatalog.get("alice", "m1").trainConfig("iterations") === "3")
  }

  test("duplicate (user, name) rejected; same name across users allowed") {
    ModelCatalog.store("alice", "m1", "node2vec", embeddings)
    val e = intercept[IllegalArgumentException] {
      ModelCatalog.store("alice", "m1", "fastrp", embeddings)
    }
    assert(e.getMessage.contains("already exists"))
    ModelCatalog.store("carol", "m1", "fastrp", embeddings) // fine
  }

  test("drop returns the model; dropping a missing name is an error") {
    ModelCatalog.store("alice", "m1", "node2vec", embeddings)
    val dropped = ModelCatalog.drop("alice", "m1")
    assert(dropped.algoType === "node2vec")
    assert(!ModelCatalog.exists("alice", "m1"))
    val e = intercept[IllegalArgumentException](ModelCatalog.drop("alice", "m1"))
    assert(e.getMessage.contains("does not exist"))
    intercept[NoSuchElementException](ModelCatalog.get("alice", "m1"))
  }

  test("save / load roundtrip preserves metadata and data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    val m = ModelCatalog.store("alice", "n2v", "node2vec", embeddings,
      Map("embeddingSize" -> "2", "windowSize" -> "3",
        "note" -> "line1\nline2\ttab \"quoted\" back\\slash"))
    ModelCatalog.save(m, dir)
    val loaded = ModelCatalog.load(spark, dir)
    assert(loaded.username === "alice" && loaded.name === "n2v" &&
      loaded.algoType === "node2vec")
    assert(loaded.trainConfig === Map("embeddingSize" -> "2", "windowSize" -> "3",
      "note" -> "line1\nline2\ttab \"quoted\" back\\slash"))
    assert(loaded.creationTime === m.creationTime)
    val rows = loaded.data.orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
    assert(rows === Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0)))
  }

  test("a multi-layer GraphSage train stores, saves and reloads through the catalog") {
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L)))
    val res = graft.pipeline.GraphSage.trainLayers(g,
      graft.pipeline.GraphSage.degreeFeatures(g, normalized = true),
      graft.pipeline.GraphSage.TrainLayersConfig(layerDims = Seq(3, 2),
        activation = "relu", sampleSizes = Seq(2, 1), epochs = 2,
        unigramTableSize = 64))
    // weights serialize into the train-config contract (small driver-side
    // matrices — the embedding frame is the model DATA)
    val wJson = res.layers.zipWithIndex.map { case (l, k) =>
      s"layer$k" -> l.weights.map(_.mkString(",")).mkString(";")
    }.toMap
    val m = ModelCatalog.store("alice", "sage2", "graphsage", res.embeddings,
      wJson ++ Map("activation" -> "relu", "layerDims" -> "3,2",
        "sampleSizes" -> "2,1"))
    val dir = java.nio.file.Files.createTempDirectory("modelcat").toString + "/m"
    ModelCatalog.save(m, dir)
    val loaded = ModelCatalog.load(spark, dir)
    assert(loaded.algoType === "graphsage")
    assert(loaded.trainConfig("layerDims") === "3,2")
    assert(loaded.trainConfig("sampleSizes") === "2,1")
    // weights roundtrip value-exactly through the JSON sidecar
    val w0 = loaded.trainConfig("layer0").split(";").map(_.split(",").map(_.toDouble))
    assert(w0.length === 3 && w0.head.length === 2)
    for (i <- 0 until 3; j <- 0 until 2)
      assert(w0(i)(j) === res.layers.head.weights(i)(j))
    assert(loaded.data.count() === 5L)
    assert(loaded.data.select(size(col("embedding"))).distinct()
      .head().getInt(0) === 2)
    ModelCatalog.drop("alice", "sage2")
  }

  test("a trained Node2Vec run stores and streams back through the catalog") {
    val g = graphOf(4, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    val emb = graft.pipeline.Node2Vec.run(g, graft.pipeline.Node2Vec.Config(
      embeddingSize = 4, walkLength = 4, walksPerNode = 1, windowSize = 3,
      negativeSamplingRate = 1, iterations = 1, batchesPerIteration = 1,
      unigramTableSize = 64, orientation = Orientation.Undirected))
    ModelCatalog.store("alice", "ring", "node2vec", emb,
      Map("embeddingSize" -> "4"))
    val streamed = ModelCatalog.get("alice", "ring").data
    assert(streamed.count() === 4L)
    assert(streamed.select(size(col("embedding"))).distinct().head().getInt(0) === 4)
  }
}
