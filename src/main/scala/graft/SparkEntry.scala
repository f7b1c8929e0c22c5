package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{GraphQueries => G, PipelineQueries => P, OracleSql}

/**
 * Driver contract (see SURVEY.md §7 + builder prompt): `queries` maps
 * every implemented operator to a DataFrame job over the testdata dir;
 * `oracleSql` carries the DuckDB-checkable equivalent (OracleSql recomputes
 * the whole pipeline — ingest, edge derivation, algorithm — independently).
 * Entries without SQL (xxhash/murmur-based, approximate, or Map-shaped
 * results) get the driver's weaker rows-only check.
 */
object SparkEntry {

  /** Flagship: WCC over the repo link graph derived from sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    G.wcc(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // graph engine (oracle-checked end to end)
    "ingest_sha" -> (G.ingestSha _),
    "graph_edges" -> (G.graphEdges _),
    "graph_degree" -> (G.degree _),
    "degree_centrality" -> (G.degreeCentralityWeighted _),
    "pagerank" -> (G.pagerank _),
    "pagerank_weighted" -> (G.pagerankWeighted _),
    "pagerank_personalized" -> (G.pagerankPersonalized _),
    "wcc" -> (G.wcc _),
    "wcc_consecutive" -> (G.wccConsecutive _),
    "lpa" -> (G.lpa _),
    "triangle_count" -> (G.triangleCount _),
    "lcc" -> (G.lcc _),
    "node_similarity" -> (G.nodeSimilarity _),
    "bfs" -> (G.bfs _),
    "article_rank" -> (G.articleRank _),
    "eigenvector" -> (G.eigenvector _),
    "link_prediction" -> (G.linkPrediction _),
    "scc" -> (G.scc _),
    "closeness" -> (G.closeness _),
    "betweenness" -> (G.betweenness _),
    "sssp" -> (G.sssp _),
    "all_shortest_paths" -> (G.allShortestPaths _),
    "node_similarity_weighted" -> (G.nodeSimilarityWeighted _),
    "louvain" -> (G.louvain _),
    "k1coloring" -> (G.k1coloring _),
    "random_walks" -> (G.randomWalks _),
    "dfs" -> (G.dfs _),
    "mst" -> (G.mst _),
    "fastrp" -> (G.fastrp _),
    "node2vec" -> (G.node2vec _),
    "graphsage" -> (G.graphsage _),
    "graphsage_train" -> (G.graphsageTrain _),
    "embedding_losses" -> (G.embeddingLosses _),
    // training-data pipeline (oracle-checked)
    "dedup_exact" -> (P.dedupExact _),
    "dedup_minhash" -> (P.dedupMinhash _),
    "text_tokens" -> (P.textTokens _),
    "text_quality" -> (P.textQuality _),
    "lang_id" -> (P.langId _),
    "ann_cosine" -> (P.annCosine _),
    "similarity_proc" -> (P.similarityProc _),
    "doc_fingerprint" -> (P.fingerprint _),
    "dedup_embedding" -> (P.dedupEmbedding _),
    "dedup_embedding_canon" -> (P.dedupEmbeddingCanon _),
    "dedup_embedding_check" -> (P.dedupEmbeddingCheck _),
    "video_frames" -> (P.videoFrames _),
    "astar" -> (G.astar _),
    "delta_stepping" -> (G.deltaStepping _),
    "one_hot" -> (G.oneHot _),
    "stream_node_properties" -> (G.streamNodeProps _),
    "yens" -> (G.yens _),
    "hyperball" -> (G.hyperball _),
    // property oracles (structural invariants checked end to end)
    "k1coloring_check" -> (G.k1coloringCheck _),
    "dfs_check" -> (G.dfsCheck _),
    "multimodal_check" -> (P.multimodalCheck _),
    "video_frames_check" -> (P.videoFramesCheck _),
    "mst_check" -> (G.mstCheck _),
    "fastrp_check" -> (G.fastrpCheck _),
    "node2vec_check" -> (G.node2vecCheck _),
    "graphsage_check" -> (G.graphsageCheck _),
    "graphsage_train_check" -> (G.graphsageTrainCheck _),
    "random_walk_check" -> (G.randomWalkCheck _),
    "hyperball_check" -> (G.hyperballCheck _),
    "knn_recall" -> (P.knnRecall _),
    "ivf_recall" -> (P.ivfRecall _),
    "ann_descent_recall" -> (P.annDescentRecall _),
    "louvain_check" -> (G.louvainCheck _),
    "yens_check" -> (G.yensCheck _),
    "dedup_ngram_pairs" -> (P.dedupNgramPairs _),
    "simhash_check" -> (P.simhashCheck _),
    // rows-only (non-portable hashing / approximate)
    "dedup_simhash" -> (P.dedupSimhash _),
    "dedup_lsh_pairs" -> (P.dedupLshPairs _),
    "knn_lsh" -> (P.knnLsh _),
    "ivf_topk" -> (P.ivfTopk _),
    "ann_nn_descent" -> (P.annNnDescent _),
    "multimodal_features" -> (P.multimodal _))

  def oracleSql: Map[String, String] = OracleSql.all

  /** Execution order for Verify/Bench: cheapest first (measured at the
    * gate scales), so a wall-clock kill truncates the expensive tail
    * instead of zeroing the whole round, and bench logs are comparable
    * across rounds. Names absent from `queries` are ignored; queries not
    * listed here run last in alphabetical order. */
  val orderedQueryNames: Seq[String] = Seq(
    // per-row pipeline ops over documents (no graph derivation needed)
    "text_tokens", "lang_id", "text_quality", "dedup_exact",
    "doc_fingerprint", "dedup_minhash", "dedup_simhash", "simhash_check",
    "multimodal_features", "multimodal_check",
    "video_frames", "video_frames_check",
    // pair-scale pipeline ops
    "knn_lsh", "similarity_proc", "dedup_lsh_pairs", "ann_cosine",
    "ivf_topk", "ivf_recall",
    "ann_nn_descent", "ann_descent_recall", "dedup_ngram_pairs",
    "dedup_embedding", "dedup_embedding_canon", "dedup_embedding_check",
    // ingest + graph derivation (first of these pays the shared cache)
    "ingest_sha", "graph_edges", "graph_degree", "degree_centrality",
    "one_hot", "stream_node_properties",
    // cheap full-graph algorithms
    "wcc", "wcc_consecutive", "bfs", "triangle_count", "lcc",
    "pagerank", "article_rank", "eigenvector", "pagerank_personalized",
    "link_prediction",
    // heavier full-graph / weighted algorithms
    "pagerank_weighted", "lpa", "sssp", "scc", "closeness",
    "all_shortest_paths", "astar", "delta_stepping", "hyperball",
    "hyperball_check",
    // bounded-subgraph / quadratic-candidate operators
    "node_similarity", "node_similarity_weighted", "mst", "mst_check",
    "knn_recall", "dfs", "dfs_check", "random_walks", "random_walk_check",
    "yens", "yens_check",
    // most expensive tail
    "betweenness", "fastrp", "fastrp_check", "node2vec", "node2vec_check",
    "graphsage", "graphsage_check",
    "graphsage_train", "graphsage_train_check", "embedding_losses",
    "louvain", "louvain_check", "k1coloring", "k1coloring_check")
}
